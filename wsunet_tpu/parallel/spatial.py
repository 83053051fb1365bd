"""Spatially-sharded WS attack (explicit halo exchange over ICI).
SURVEY.md §5.7 notes the idiomatic TPU equivalent of "context scaling" for
this workload: halo-exchanged spatial partitioning of the conv grid.  This
module implements it with ``shard_map``: the image's row dimension is
sharded over a mesh axis, each device exchanges one boundary row with its
ring neighbors via ``ppermute``, computes its local slice of the 3x3
prediction and WS contribution, and the per-image estimate is reduced
with ``psum`` — all inside one jitted program, collectives riding ICI.

This is how images too large for one chip's HBM (or conv grids too large
for one chip's useful occupancy) scale across a slice.  Numerics match the
single-device ``ops.ws.ws_attack`` exactly up to reduction order.
"""


import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.filters import conv2d_valid


def ws_attack_spatial(
    x_u8: jnp.ndarray,
    kernel,
    mesh: Mesh,
    axis: str = "data",
    weighted: int = 0,
) -> jnp.ndarray:
    """WS attack with image rows sharded over ``axis`` of ``mesh``.

    x_u8: [B, H, W] uint8, H divisible by the axis size.
    Returns beta_hat [B] (replicated).
    """
    k = np.asarray(kernel, dtype="float32")[::-1, ::-1]
    n_shards = mesh.shape[axis]
    B, H, W = x_u8.shape
    assert H % n_shards == 0, (H, n_shards)

    def local(x_blk):
        # x_blk: [B, H/n, W] on this device
        idx = jax.lax.axis_index(axis)
        x = x_blk.astype(jnp.float32)
        # ring halo exchange: my last row -> next device's top halo,
        # my first row -> previous device's bottom halo
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        top_halo = jax.lax.ppermute(x[:, -1:, :], axis, fwd)
        bot_halo = jax.lax.ppermute(x[:, :1, :], axis, bwd)
        x_ext = jnp.concatenate([top_halo, x, bot_halo], axis=1)

        # 3x3 valid conv over the extended rows: output rows line up with
        # this shard's owned rows; columns lose the usual 1-px border
        x_hat = jax.vmap(lambda img: conv2d_valid(img, k))(x_ext)
        x_own = x[:, :, 1:-1]
        sign = 2.0 * (x_own - 2.0 * jnp.floor(x_own * 0.5)) - 1.0

        # global interior mask for rows: first shard masks global row 0,
        # last shard masks global row H-1
        h_local = x.shape[1]
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (h_local, 1), 0) + idx * h_local
        row_mask = ((rows >= 1) & (rows < H - 1)).astype(jnp.float32)

        contrib = sign * (x_own - x_hat) * row_mask[None]
        if weighted == 0:
            n = (H - 2) * (W - 2)
            beta = jnp.sum(contrib, axis=(1, 2)) / n
            beta = jax.lax.psum(beta, axis)
        else:
            from ..ops.filters import NAMED_FILTERS_2D
            avg = np.asarray(NAMED_FILTERS_2D["AVG"])[::-1, ::-1]
            mu = jax.vmap(lambda img: conv2d_valid(img, avg))(x_ext)
            mu2 = jax.vmap(lambda img: conv2d_valid(img, avg))(x_ext ** 2)
            var = mu2 - mu * mu
            w = 1.0 / (5.0 + var) if weighted == 1 else (5.0 + var)
            w = w * row_mask[None]
            num = jax.lax.psum(jnp.sum(contrib * w, axis=(1, 2)), axis)
            den = jax.lax.psum(jnp.sum(w, axis=(1, 2)), axis)
            beta = num / den
        return jnp.maximum(beta, 0.0)

    shard_fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(),
    )
    x_sharded = jax.device_put(
        x_u8, NamedSharding(mesh, P(None, axis, None)))
    return jax.jit(shard_fn)(x_sharded)


def infer_unet_spatial(
    model,
    variables,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """U-Net inference with the image rows sharded over a mesh axis.

    Uses XLA's automatic spatial partitioning: annotating the input with a
    row-sharded NamedSharding makes the compiler partition every conv /
    pool / transpose-conv with halo exchanges over ICI — no manual
    communication code.  This is the scale-out path for images whose
    activations exceed one chip (the 64-channel 512x512 f32 encoder
    activation alone is 64 MB/image).

    x: [B, H, W] f32 pixels (0..255); returns [B, H-2, W-2] predictions.
    """
    from ..ws.unet_eval import infer_unet

    sharded = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    fn = jax.jit(lambda v: infer_unet(model, variables, v))
    return fn(sharded)
