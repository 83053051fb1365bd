"""Batched transform parity with the reference's torchvision modules."""

import numpy as np

import jax
import jax.numpy as jnp

from wsunet_tpu.data.transforms import (
    center_crop,
    demosaic_oracle,
    grayscale,
    lsbr_reference,
    normalize,
    parity_oracle,
    random_flip,
    random_rot90,
)


def _img(shape=(2, 8, 8, 1), seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 256, shape).astype("float32") / 255.0)


def test_lsbr_reference_zeroes_lsb():
    """Parity: _defs/loader.py:61-70 — appended plane == (round(x*255)&~1)/255."""
    x = _img()
    out = np.asarray(lsbr_reference(x))
    assert out.shape[-1] == 2
    want = (np.round(np.asarray(x) * 255).astype(int) & ~1) / 255.0
    np.testing.assert_allclose(out[..., 1:], want, atol=1e-7)


def test_parity_oracle_is_lsb():
    x = _img()
    out = np.asarray(parity_oracle(x))
    want = np.round(np.asarray(x) * 255).astype(int) & 1
    np.testing.assert_allclose(out[..., 1:], want, atol=1e-7)


def test_demosaic_oracle_planes():
    """Parity: _defs/loader.py:85-103 — R at even/even, G at mixed,
    B at odd/odd."""
    x = _img((1, 4, 4, 1))
    out = np.asarray(demosaic_oracle(x))
    assert out.shape[-1] == 4
    r, g, b = out[0, :, :, 1], out[0, :, :, 2], out[0, :, :, 3]
    assert r[0, 0] == 1 and r[1, 1] == 0
    assert g[0, 1] == 1 and g[1, 0] == 1 and g[0, 0] == 0
    assert b[1, 1] == 1 and b[0, 0] == 0
    np.testing.assert_array_equal(r + g + b, np.ones((4, 4)))


def test_grayscale_channel_selection():
    x4 = _img((1, 4, 4, 4))
    np.testing.assert_array_equal(
        np.asarray(grayscale(x4)), np.asarray(x4[..., 3:]))
    x1 = _img((1, 4, 4, 1))
    np.testing.assert_array_equal(np.asarray(grayscale(x1)), np.asarray(x1))


def test_center_crop():
    x = _img((1, 10, 12, 1))
    out = center_crop(x, 8)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(x[:, 1:9, 2:10, :]))


def test_normalize():
    x = _img()
    out = np.asarray(normalize(x, 0.456, 0.224))
    np.testing.assert_allclose(out, (np.asarray(x) - 0.456) / 0.224,
                               rtol=1e-6)


def test_random_rot90_and_flip_preserve_content():
    x = _img((4, 8, 8, 1), seed=1)
    r = np.asarray(random_rot90(x, jax.random.PRNGKey(0)))
    f = np.asarray(random_flip(x, jax.random.PRNGKey(1)))
    # content-preserving: same multiset of values per image
    for i in range(4):
        np.testing.assert_allclose(
            np.sort(r[i].flatten()), np.sort(np.asarray(x)[i].flatten()))
        np.testing.assert_allclose(
            np.sort(f[i].flatten()), np.sort(np.asarray(x)[i].flatten()))
