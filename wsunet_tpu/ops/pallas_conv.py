"""Fused reflect-pad + 3x3 conv (+bias) Pallas TPU kernel.

Why: the UNet's reflect padding cannot fuse into XLA convolution operands,
so every conv costs an extra full HBM round trip for the padded tensor —
measured 439 vs 718 img/s (v5e, unet_2 512x512 bf16 batch 128) with pads
vs without.  This kernel reads the UNPADDED input once (manual HBM->VMEM
DMA with a one-row halo), applies the reflect boundary inside VMEM, and
computes the 3x3 conv as nine MXU contractions accumulated in f32.

Parity: identical math to `reflect_pad + conv VALID` (models/unet.py) —
the golden-comparable predictor path.  North star (BASELINE.json): "the
UNet conv encoder-decoder runs as fused Pallas kernels".

Backward: a custom VJP delegates to the XLA reference implementation, so
`jax.grad` through the fast path (saliency, training) works and matches.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 16  # rows per tile; divides every UNet layer height (128/256/512)


def _kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sem, *, H, W, C, TH,
            relu):
    # x_hbm is the batch flattened to rows, [B*H, W, C]: 3-D slices with a
    # dynamic start only on the contiguous row dimension.  (The previous
    # 4-D form `x.at[bi, pl.ds(...), :, :]` mis-lowered in Mosaic to a
    # channel-dim slice of size 1 — unaligned-tiling compile error.)
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)

    r0 = bi * H + ti * TH  # first (unpadded) row of this tile

    # --- halo DMA: rows clamped within the image; edge tiles copy one row
    # less and fill the missing reflect row from VMEM (row -1 == row 1,
    # row H == row H-2).  All slice sizes are static.
    @pl.when(jnp.logical_and(ti > 0, ti < n_t - 1))
    def _interior():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0 - 1, TH + 2), :, :], x_vmem.at[:, 1:W + 1, :],
            sem)
        dma.start()
        dma.wait()

    @pl.when(ti == 0)
    def _first():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, TH + 1), :, :],
            x_vmem.at[1:TH + 2, 1:W + 1, :], sem)
        dma.start()
        dma.wait()
        x_vmem[0, 1:W + 1, :] = x_vmem[2, 1:W + 1, :]

    @pl.when(jnp.logical_and(ti == n_t - 1, n_t > 1))
    def _last():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0 - 1, TH + 1), :, :],
            x_vmem.at[0:TH + 1, 1:W + 1, :], sem)
        dma.start()
        dma.wait()
        x_vmem[TH + 1, 1:W + 1, :] = x_vmem[TH - 1, 1:W + 1, :]

    # reflect in W (padded col -1 == col 1, col W == col W-2)
    x_vmem[:, 0, :] = x_vmem[:, 2, :]
    x_vmem[:, W + 1, :] = x_vmem[:, W - 1, :]

    # --- nine shifted MXU contractions, f32 accumulation
    acc = jnp.zeros((TH * W, w_ref.shape[-1]), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xs = x_vmem[di:di + TH, dj:dj + W, :].reshape(TH * W, C)
            acc = acc + jnp.dot(xs, w_ref[di, dj],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        # fused activation: the separate elementwise relu otherwise costs
        # another full HBM read+write of the conv output
        acc = jnp.maximum(acc, 0.0)
    out_ref[...] = acc.reshape(TH, W, w_ref.shape[-1]).astype(out_ref.dtype)


def _forward(x, w, b, relu=False, interpret=False):
    B, H, W, C = x.shape
    Cout = w.shape[-1]
    TH = _TH
    n_t = H // TH
    kern = functools.partial(_kernel, H=H, W=W, C=C, TH=TH, relu=relu)
    out = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias [1, Cout]
        ],
        out_specs=pl.BlockSpec(
            (TH, W, Cout), lambda bi, ti: (bi * n_t + ti, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W + 2, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x.reshape(B * H, W, C), w, b.reshape(1, Cout))
    return out.reshape(B, H, W, Cout)


def _reference(x, w, b, relu=False):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    return jnp.maximum(out, 0.0).astype(out.dtype) if relu else out


def _supported(x):
    B, H, W, C = x.shape
    return (H % _TH == 0 and H >= 2 * _TH and W >= 8 and
            jax.devices()[0].platform == "tpu")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3x3_reflect(x, w, b, relu):
    if _supported(x):
        return _forward(x, w, b, relu=relu)
    return _reference(x, w, b, relu=relu)


def _fwd(x, w, b, relu):
    return _conv3x3_reflect(x, w, b, relu), (x, w, b)


def _bwd(relu, res, g):
    x, w, b = res
    _, vjp = jax.vjp(functools.partial(_reference, relu=relu), x, w, b)
    return vjp(g)


_conv3x3_reflect.defvjp(_fwd, _bwd)


def conv3x3_reflect_fused(x, w, b, relu=False):
    """Reflect-padded 3x3 conv (+optional fused relu); Pallas on TPU, XLA
    fallback elsewhere."""
    return _conv3x3_reflect(x, w, b, relu)
