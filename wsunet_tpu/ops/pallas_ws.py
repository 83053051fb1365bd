"""Fused WS attack as a Pallas TPU kernel.

The jnp path (ops/ws.py) lowers to: conv (reads x, writes x_hat to HBM),
then an elementwise+reduce pass (reads x, x_hat).  This kernel does the
whole estimate in ONE pass per image — uint8 pixels are read from HBM
once, and the 3x3 prediction, LSB-parity sign, weighting and reduction all
happen in VMEM:

    sign      = 2*(x & 1) - 1              # == x - (x ^ 1), the LSB flip
    x_hat     = sum_taps k[di,dj] * shift(x)   (cyclic shifts; borders are
                                                masked out of the sum, so
                                                wrap-around values never
                                                contribute)
    beta_hat  = relu( sum_interior w * sign * (x - x_hat) )

Identities used (exact, not approximations):
- x - (x^1) = +1 if x odd else -1  ->  no flipped image is materialized;
- conv(x/255)*255 == conv(x) by linearity (float rounding differs at the
  1e-7 level, covered by tests against the reference formula);
- weighted==1: w = 1/(5 + var), var from the same shifted-sum machinery
  with the AVG kernel, normalized per image inside the kernel.

Grid: one program per image; a 512x512 f32 image plus a few accumulators
fits comfortably in ~16MB VMEM.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import NAMED_FILTERS_2D


def _shifted(x, di, dj):
    """x shifted so that result[i,j] = x[i+di-1, j+dj-1] (cyclic).

    pltpu.roll requires non-negative shifts, so shifts are taken mod the
    axis length (cyclic semantics are unchanged)."""
    h, w = x.shape
    return pltpu.roll(pltpu.roll(x, (1 - di) % h, axis=0),
                      (1 - dj) % w, axis=1)


def _ws_kernel(x_ref, out_ref, *, kernel, weighted, H, W):
    # Mosaic lacks a direct u8->f32 cast; hop through int32 (free on VPU)
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)
    # LSB parity sign: x - (x^1) = 2*(x&1) - 1 ; exact via floor in f32
    parity = x - 2.0 * jnp.floor(x * 0.5)
    sign = 2.0 * parity - 1.0

    def conv_same(img, k):
        acc = None
        for di in range(3):
            for dj in range(3):
                c = float(k[di, dj])
                if c == 0.0:
                    continue
                term = c * _shifted(img, di, dj)
                acc = term if acc is None else acc + term
        return acc

    x_hat = conv_same(x, kernel)

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((rows >= 1) & (rows < H - 1) &
                (cols >= 1) & (cols < W - 1)).astype(jnp.float32)

    contrib = sign * (x - x_hat) * interior
    if weighted == 0:
        n = (H - 2) * (W - 2)
        beta = jnp.sum(contrib) * (1.0 / n)
    else:
        avg = NAMED_FILTERS_2D["AVG"]
        mu = conv_same(x, avg)
        mu2 = conv_same(x * x, avg)
        var = mu2 - mu * mu
        w = 1.0 / (5.0 + var) if weighted == 1 else (5.0 + var)
        w = w * interior
        beta = jnp.sum(contrib * w) / jnp.sum(w)
    out_ref[:, :, :] = jnp.full((1, 8, 128), jnp.maximum(beta, 0.0))


@functools.partial(jax.jit,
                   static_argnames=("kernel_name", "weighted", "interpret"))
def ws_attack_fused(x_u8: jnp.ndarray, kernel_name: str = "KB",
                    weighted: int = 0, interpret: bool = False) -> jnp.ndarray:
    """Fused WS attack: uint8 [B, H, W] -> beta_hat [B].

    Numerically equivalent to ops.ws.ws_attack with the same named filter
    (weighted in {0, 1, -1}); one HBM read per image instead of four
    array passes.
    """
    kernel = np.asarray(NAMED_FILTERS_2D[kernel_name], dtype="float32")
    B, H, W = x_u8.shape
    kfn = functools.partial(
        _ws_kernel, kernel=kernel, weighted=weighted, H=H, W=W)
    out = pl.pallas_call(
        kfn,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        # scalar-per-program output padded to a full (8, 128) f32 tile:
        # TPU blocks must be sublane x lane aligned; 4KB/image is noise
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(B * H * W * 30),
            bytes_accessed=int(B * H * W + B * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_u8)
    return out[:, 0, 0]
