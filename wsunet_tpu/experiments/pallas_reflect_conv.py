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

Status: RETIRED (round 4 — VERDICT r3 weak-point 5, decided).  The
kernel is parity-correct on hardware (BENCH_r03.fast_conv_parity,
max |err| 1.4e-6) but the shipping throughput path is the pure-XLA
border-corrected SAME conv (ops/reflect_conv.py), measured at 700.5
img/s = 97.6% of the pad-free ceiling (results/perf_traces/ANALYSIS.md).
That leaves <2.4% theoretical headroom for ANY fused conv — below the
measurement noise — so hand-scheduling cannot pay for itself here; the
TPU-first answer is to let XLA fuse.  A double-buffered variant (halo
DMA of tile g+1 overlapping tile g's contractions; commit 175d735)
lowered correctly in interpret mode but could not be compile-iterated on
the tunneled remote-compile transport (>10 min per shape, HTTP 500 on
the full model).  The module stays importable with its interpret-mode
suite (tests/test_pallas_conv.py) and TPU-gated parity test
(tests/test_tpu_pallas_parity.py); no library path dispatches to it.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8  # rows per tile; divides every UNet layer height (128/256/512).
# 8 (not 16) keeps the f32 roll temporaries inside VMEM at W=512.


def _kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sem, *, H, W, C, TH,
            relu):
    # x_hbm is the batch flattened to rows, [B*H, W, C]: every DMA slices
    # only the untiled leading row dimension (dynamic start, static size)
    # with the tiled (W, C) dims copied whole.  Mosaic constraints that
    # shaped this design (all reproduced on v5e):
    #   - `.at[]` with explicit trailing `:` slices mis-lowers the LAST
    #     dim to size 1 ("Slice shape along dimension N must be aligned
    #     to tiling (128), but is 1") — leading-dim-only `.at[pl.ds(...)]`
    #     is the working spelling;
    #   - a W-padded VMEM destination (`x_vmem[:, 1:W+1, :]`) puts an
    #     offset-1 slice on the SUBLANE dim — unaligned.
    # So the scratch is unpadded in W and the reflect boundary is applied
    # at matmul time with sublane rolls + iota selects (vector ops only).
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
            x_hbm.at[pl.ds(r0 - 1, TH + 2)], x_vmem, sem)
        dma.start()
        dma.wait()

    @pl.when(ti == 0)
    def _first():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, TH + 1)], x_vmem.at[1:TH + 2], sem)
        dma.start()
        dma.wait()
        x_vmem[0] = x_vmem[2]

    @pl.when(jnp.logical_and(ti == n_t - 1, n_t > 1))
    def _last():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0 - 1, TH + 1)], x_vmem.at[0:TH + 1], sem)
        dma.start()
        dma.wait()
        x_vmem[TH + 1] = x_vmem[TH - 1]

    # --- nine shifted MXU contractions, f32 accumulation.  Column shifts
    # are rolls along the sublane (W) dim; the reflect boundary replaces
    # the wrapped column via an iota select of the opposite roll:
    #   left neighbor  (dj=0): col 0 must be x[:, 1]  == roll(-1) there
    #   right neighbor (dj=2): col W-1 must be x[:, W-2] == roll(+1) there
    col = jax.lax.broadcasted_iota(jnp.int32, (TH, W, C), 1)
    # tpu.dynamic_rotate only handles 32-bit data: bf16 tiles are rolled
    # (and contracted) in f32.  The HBM traffic stays bf16 — only VMEM
    # temporaries widen — and for bf16 inputs DEFAULT dot precision keeps
    # the native single-pass MXU path.  f32 inputs pin HIGHEST (otherwise
    # the MXU's bf16 passes cost ~1e-2 relative error vs the XLA
    # reference the golden suite compares against).
    hi_prec = x_vmem.dtype == jnp.float32
    prec = (jax.lax.Precision.HIGHEST if hi_prec
            else jax.lax.Precision.DEFAULT)
    acc = jnp.zeros((TH * W, w_ref.shape[-1]), jnp.float32)
    for di in range(3):
        rows = x_vmem[di:di + TH].astype(jnp.float32)
        r_plus = pltpu.roll(rows, 1, axis=1)
        r_minus = pltpu.roll(rows, W - 1, axis=1)  # pltpu.roll: shift >= 0
        shifted = (
            jnp.where(col == 0, r_minus, r_plus),        # dj=0
            rows,                                        # dj=1
            jnp.where(col == W - 1, r_plus, r_minus),    # dj=2
        )
        for dj in range(3):
            xs = shifted[dj].reshape(TH * W, C)
            acc = acc + jnp.dot(xs, w_ref[di, dj].astype(jnp.float32),
                                preferred_element_type=jnp.float32,
                                precision=prec)
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
            pltpu.VMEM((TH + 2, W, C), x.dtype),
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


def _supported(x, w):
    """Shapes the kernel compiles for on this Mosaic version (v5e-probed
    truth table over every eligible unet_2 layer, 2026-08-17):

    - C % 128 == 0: the halo DMA slices rows of the [B*H, W, C] memref;
      Mosaic requires lane-dim (C) slices aligned to the 128-lane tile,
      so C = 1/64 inputs cannot use the manual-DMA path at all.
    - bf16: every C%128 layer up to W=512 compiles and matches XLA
      (<=2.5e-3 rel; rolls+dots run in f32, DMA stays bf16).
    - f32: W <= 256 (HIGHEST-precision dot splits double the VMEM
      temporaries; C128->64 @ W=512 over-allocates the stack).
    Ineligible layers fall back to the XLA reference (reflect pad+conv).
    """
    B, H, W, C = x.shape
    max_w = 512 if x.dtype == jnp.bfloat16 else 256
    return (H % _TH == 0 and H >= 2 * _TH and 8 <= W <= max_w and
            C % 128 == 0 and jax.devices()[0].platform == "tpu")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3x3_reflect(x, w, b, relu):
    if _supported(x, w):
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
