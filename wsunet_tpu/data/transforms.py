"""Batched image transforms (pure jnp; jit-safe).

Parity: the reference composes torchvision transforms
(src/unet/data/loader.py:32-64, src/detector/data/loader.py,
src/_defs/loader.py).  Here each transform is a function on NHWC batches
in [0, 1]; augmentation randomness is explicit via PRNG keys.
"""

import jax
import jax.numpy as jnp


def center_crop(x: jnp.ndarray, size: int = 512) -> jnp.ndarray:
    """CenterCrop on [..., H, W, C] (torchvision CenterCrop parity for
    even overhang; fixture images are already 512x512)."""
    h, w = x.shape[-3], x.shape[-2]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return x[..., top:top + size, left:left + size, :]


def grayscale(x: jnp.ndarray) -> jnp.ndarray:
    """Parity: _defs/loader.py:51-58 — 1-channel passthrough, channel 3 of
    4-channel [R,G,B,Y] stacks, ITU-R 601 otherwise."""
    c = x.shape[-1]
    if c == 1:
        return x
    if c == 4:
        return x[..., 3:]
    weights = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * weights, axis=-1, keepdims=True)


def lsbr_reference(x: jnp.ndarray) -> jnp.ndarray:
    """Append the zeroed-LSB reference plane
    (parity: _defs/loader.py:61-70)."""
    ref = jnp.bitwise_and(
        jnp.round(x * 255.0).astype(jnp.int32), ~1).astype(x.dtype) / 255.0
    return jnp.concatenate([x, ref], axis=-1)


def parity_oracle(x: jnp.ndarray) -> jnp.ndarray:
    """Append the LSB parity plane (parity: _defs/loader.py:73-82)."""
    par = jnp.bitwise_and(
        jnp.round(x * 255.0).astype(jnp.int32), 1).astype(x.dtype)
    return jnp.concatenate([x, par], axis=-1)


def demosaic_oracle(x: jnp.ndarray) -> jnp.ndarray:
    """Append 3 Bayer-position planes (parity: _defs/loader.py:85-103)."""
    h, w = x.shape[-3], x.shape[-2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    r = ((rows % 2 == 0) & (cols % 2 == 0)).astype(x.dtype)
    g = ((rows % 2) != (cols % 2)).astype(x.dtype)
    b = ((rows % 2 == 1) & (cols % 2 == 1)).astype(x.dtype)
    planes = jnp.stack([r, g, b], axis=-1)
    planes = jnp.broadcast_to(planes, x.shape[:-1] + (3,))
    return jnp.concatenate([x, planes], axis=-1)


def normalize(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def random_rot90(x: jnp.ndarray, key) -> jnp.ndarray:
    """Rotate each batch element by an independent random multiple of 90deg
    (parity: _defs/loader.py:12-32, batched)."""
    ks = jax.random.randint(key, (x.shape[0],), 0, 4)

    def rot(img, k):
        return jax.lax.switch(k, [
            lambda v: v,
            lambda v: jnp.rot90(v, 1, axes=(0, 1)),
            lambda v: jnp.rot90(v, 2, axes=(0, 1)),
            lambda v: jnp.rot90(v, 3, axes=(0, 1)),
        ], img)

    return jax.vmap(rot)(x, ks)


def random_flip(x: jnp.ndarray, key) -> jnp.ndarray:
    """Independent random horizontal + vertical flips per batch element."""
    kh, kv = jax.random.split(key)
    fh = jax.random.bernoulli(kh, shape=(x.shape[0], 1, 1, 1))
    fv = jax.random.bernoulli(kv, shape=(x.shape[0], 1, 1, 1))
    x = jnp.where(fh, x[:, :, ::-1, :], x)
    x = jnp.where(fv, x[:, ::-1, :, :], x)
    return x
