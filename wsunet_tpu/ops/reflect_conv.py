"""Reflect-padded 3x3 conv as SAME-conv + border corrections (pure XLA).

The UNet's reflect pads cannot fuse into XLA conv operands, so the naive
`pad(reflect) -> conv VALID` materializes a padded copy of every
activation tensor — measured ~40% of UNet inference time on v5e (439 vs
718 img/s with pads vs without).  ZERO pads DO fuse (conv SAME), and a
reflect conv differs from a zero-pad conv only through the ghost cells,
which touch a 1-px output border:

  row -1 == row 1, row H == row H-2, col -1 == col 1, col W == col W-2
  (corners reflect both axes: (-1,-1) == (1,1), ...)

So: out = conv_SAME(x) + corrections on out[0,:], out[H-1,:], out[:,0],
out[:,W-1].  Top/bottom corrections are 1-D convs of rows 1 / H-2 with
kernel rows k[0] / k[2] over the reflect-extended W axis (these also
carry the corner ghosts); left/right corrections use cols 1 / W-2 with
kernel cols k[:,0] / k[:,2] over REAL rows only (row ghosts already
counted by top/bottom — zero-padded row windows avoid double counting).

Exact (identical operand math, f32), differentiable through standard XLA
ops, and layer-shape independent — unlike the retired Pallas kernel
(experiments/pallas_reflect_conv.py) it covers the C=1/64 full-resolution layers where
most of the pad bytes live.
"""

import jax
import jax.numpy as jnp


def _win3(v, axis):
    """Stack the three 1-shifted views of ``v`` along a new trailing-axis
    window dim: (..., N, C) -> (..., N, 3, C) for a length-N axis already
    padded by one element on each side."""
    n = v.shape[axis] - 2
    sl = [slice(None)] * v.ndim
    outs = []
    for d in range(3):
        sl[axis] = slice(d, d + n)
        outs.append(v[tuple(sl)])
    return jnp.stack(outs, axis=-2)


def conv3x3_reflect_borderfix(x, w, b, relu=False,
                              precision=jax.lax.Precision.HIGHEST):
    """NHWC reflect-padded 3x3 conv without materializing the pad."""
    B, H, W, C = x.shape
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision) + b

    # top/bottom: reflect-extend the W axis (carries the corner ghosts)
    def row_corr(row, krow):  # row (B,W,C), krow (3,C,Cout)
        ext = jnp.concatenate(
            [row[:, 1:2], row, row[:, W - 2:W - 1]], axis=1)
        win = _win3(ext, axis=1)                       # (B,W,3,C)
        return jnp.einsum("bwdc,dco->bwo", win, krow,
                          precision=precision)

    top = row_corr(x[:, 1], w[0])
    bottom = row_corr(x[:, H - 2], w[2])

    # left/right: zero-extend the H axis (row ghosts excluded — the
    # top/bottom corrections already counted them)
    def col_corr(colv, kcol):  # colv (B,H,C), kcol (3,C,Cout)
        ext = jnp.pad(colv, ((0, 0), (1, 1), (0, 0)))
        win = _win3(ext, axis=1)                       # (B,H,3,C)
        return jnp.einsum("bhdc,dco->bho", win, kcol,
                          precision=precision)

    left = col_corr(x[:, :, 1], w[:, 0])
    right = col_corr(x[:, :, W - 2], w[:, 2])

    # apply all four border corrections as ONE fused elementwise add of
    # zero-padded strips: dynamic-update-slice chains (`.at[].add`) do
    # not fuse on TPU — each costs a full-tensor copy, ~4 extra HBM
    # round trips per conv.  Zero pads fuse into the add epilogue.
    corr = (
        jnp.pad(top[:, None], ((0, 0), (0, H - 1), (0, 0), (0, 0))) +
        jnp.pad(bottom[:, None], ((0, 0), (H - 1, 0), (0, 0), (0, 0))) +
        jnp.pad(left[:, :, None], ((0, 0), (0, 0), (0, W - 1), (0, 0))) +
        jnp.pad(right[:, :, None], ((0, 0), (0, 0), (W - 1, 0), (0, 0))))
    out = out + corr
    return jnp.maximum(out, 0.0).astype(out.dtype) if relu else out
