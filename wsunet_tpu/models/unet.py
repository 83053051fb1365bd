"""U-Net cover-pixel predictor (Flax/NHWC).

Parity: reference src/unet/model/unet.py:54-199 —
- encoder: per step, two [3x3 reflect-padded conv + ReLU], then 2x2 maxpool;
  widths 64 -> 1024, ``nsteps`` in 0..4
- decoder: 2x2 stride-2 transposed conv (zero "padding" semantics, exactly
  torch ConvTranspose2d(kernel=2, stride=2)), concat with the encoder skip,
  then two [3x3 reflect conv + ReLU]
- head: 1x1 conv + sigmoid
- ``disable_center`` zeroes the center tap of the very first conv so the
  predictor cannot copy the pixel it predicts (reference
  ``disable_center_pixels``, unet.py:196-199).  Implemented as a
  multiplicative kernel mask, which also zeroes the corresponding gradients.
- ``UniformDropout`` (unet.py:15-51): Bernoulli-masked pixels are replaced
  by their KB-filter prediction rather than zeros.

TPU notes: NHWC layout; convs run on the MXU via XLA.  ``compute_dtype``
may be bfloat16 for inference/training throughput (params stay f32); the
default is float32 for bit-comparability with the golden CSVs.
"""

import typing

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

_KB = np.array(
    [[-1, 2, -1],
     [2, 0, 2],
     [-1, 2, -1]], dtype="float32") / 4.0


def reflect_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv3x3_reflect(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray = None,
                    precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Reflect-padded 3x3 conv without materializing the padded tensor.

    ``jnp.pad(mode='reflect')`` cannot fuse into a convolution operand, so
    the naive pad+VALID path costs a full extra HBM round trip per conv —
    measured 439 -> 718 img/s on the v5e UNet benchmark when removed.
    Here the interior uses the conv's own (free) zero-padding config and
    the four border strips are recomputed exactly with tiny 3-row/col
    convs + in-place dynamic_update_slice.  Numerically identical to
    pad+VALID (same conv kernels, same windows).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        precision=precision)

    def valid(v):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "VALID", dimension_numbers=dn,
            precision=precision)

    def pad_w(v):  # reflect in W only
        return jnp.pad(v, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")

    def pad_h(v):  # reflect in H only
        return jnp.pad(v, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")

    H, W = x.shape[1], x.shape[2]
    # row strips: padded row -1 == row 1, padded row H == row H-2
    top = valid(pad_w(x[:, (1, 0, 1), :, :]))          # [B,1,W,Co]
    bot = valid(pad_w(x[:, (H - 2, H - 1, H - 2), :, :]))
    # col strips (corners handled exactly: reflect pads see the same
    # mirrored values the full padded tensor would)
    left = valid(pad_h(x[:, :, (1, 0, 1), :]))         # [B,H,1,Co]
    right = valid(pad_h(x[:, :, (W - 2, W - 1, W - 2), :]))

    out = jax.lax.dynamic_update_slice(out, top, (0, 0, 0, 0))
    out = jax.lax.dynamic_update_slice(out, bot, (0, H - 1, 0, 0))
    out = jax.lax.dynamic_update_slice(out, left, (0, 0, 0, 0))
    out = jax.lax.dynamic_update_slice(out, right, (0, 0, W - 1, 0))
    if b is not None:
        out = out + b
    return out


def kb_predict_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """KB-filter prediction with reflect padding, per channel, NHWC."""
    c = x.shape[-1]
    k = jnp.asarray(_KB, x.dtype)[:, :, None, None] * jnp.eye(c, dtype=x.dtype)
    xp = reflect_pad(x, 1)
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


class UniformDropout(nn.Module):
    """Replace dropped pixels with their KB prediction (reference
    UniformDropout, unet.py:15-51).  Active only when ``deterministic`` is
    False; the mask is shared across channels."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(
            rng, p=1.0 - self.rate, shape=(x.shape[0], x.shape[1], x.shape[2], 1))
        keep = keep.astype(x.dtype)
        return x * keep + kb_predict_nhwc(x) * (1.0 - keep)


class _Conv3x3Reflect(nn.Module):
    """One reflect-padded 3x3 conv.  Parameter names/shapes identical to
    nn.Conv's (kernel, bias), so existing checkpoints restore unchanged.

    ``fast="borderfix"`` (the TPU shipping path) computes conv-SAME plus
    an exact 1-px border correction, avoiding pad materialization — the
    pads cost ~40% of UNet inference throughput (439 vs 718 img/s on
    v5e).  ``fast=True`` dispatches to the RETIRED fused Pallas kernel
    (experiments/pallas_reflect_conv.py) — kept only as the hook for its
    archived parity tests; no library path sets it."""

    features: int
    dtype: typing.Any = jnp.float32
    precision: typing.Any = jax.lax.Precision.HIGHEST
    fast: bool = False
    relu: bool = False  # fused into the Pallas kernel on the fast path

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        if self.fast == "borderfix":
            from ..ops.reflect_conv import conv3x3_reflect_borderfix
            out = conv3x3_reflect_borderfix(
                x, k, b, relu=self.relu, precision=self.precision)
            return out
        if self.fast:
            from ..experiments.pallas_reflect_conv import (
                conv3x3_reflect_fused)
            return conv3x3_reflect_fused(x, k, b, relu=self.relu)
        out = jax.lax.conv_general_dilated(
            reflect_pad(x), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision) + b
        return nn.relu(out) if self.relu else out


class _ConvBlock(nn.Module):
    """Two reflect-padded 3x3 convs with ReLU (fused in-kernel on the
    fast path — the separate elementwise relu costs a full HBM round
    trip of the conv output otherwise)."""

    features: int
    dtype: typing.Any = jnp.float32
    precision: typing.Any = jax.lax.Precision.HIGHEST
    fast: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = _Conv3x3Reflect(self.features, dtype=self.dtype,
                                precision=self.precision, fast=self.fast,
                                relu=True, name=f"conv{i + 1}")(x)
        return x


class UNet(nn.Module):
    """nsteps-deep U-Net, sigmoid head, optional center-tap disabling."""

    in_channels: int = 1
    out_channels: int = 1
    nsteps: int = 2
    drop_rate: typing.Optional[float] = None
    disable_center: bool = False
    compute_dtype: typing.Any = jnp.float32
    # fast_conv: False = reflect-pad XLA conv, "borderfix" = SAME conv +
    # exact border correction (TPU shipping path), True = retired Pallas
    # experiment (archived-test hook only)
    fast_conv: bool = False
    # f32 inputs at DEFAULT precision decompose to bf16 passes on this
    # stack (TPU and CPU alike); pin HIGHEST so the predictor feeding the
    # WS estimator is true f32.  For throughput runs set
    # compute_dtype=bfloat16 instead (native MXU path).
    precision: typing.Any = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert 0 <= self.nsteps <= 4
        widths = [64, 128, 256, 512, 1024]
        in_dtype = x.dtype
        x = x.astype(self.compute_dtype)

        if self.drop_rate is not None:
            x = UniformDropout(self.drop_rate, name="input_dropout")(
                x, deterministic=deterministic)

        # --- first encoder block; e11 is explicit so the center tap can be
        # masked out (masking the kernel also zeroes its gradient, matching
        # the reference's weight+grad zeroing in disable_center_pixels).
        k11 = self.param(
            "e1_conv1_kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_channels, widths[0]), jnp.float32)
        b11 = self.param("e1_conv1_bias", nn.initializers.zeros,
                         (widths[0],), jnp.float32)
        if self.disable_center:
            mask = np.ones((3, 3, 1, 1), dtype="float32")
            mask[1, 1, 0, 0] = 0.0
            k11 = k11 * jnp.asarray(mask, k11.dtype)
        k11c = k11.astype(self.compute_dtype)
        b11c = b11.astype(self.compute_dtype)
        if self.fast_conv == "borderfix":
            from ..ops.reflect_conv import conv3x3_reflect_borderfix
            h = conv3x3_reflect_borderfix(
                x.astype(self.compute_dtype), k11c, b11c, relu=True,
                precision=self.precision)
        elif self.fast_conv:
            from ..experiments.pallas_reflect_conv import (
                conv3x3_reflect_fused)
            h = conv3x3_reflect_fused(
                x.astype(self.compute_dtype), k11c, b11c, relu=True)
        else:
            h = jax.lax.conv_general_dilated(
                reflect_pad(x.astype(self.compute_dtype)), k11c, (1, 1),
                "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self.precision) + b11c
            h = nn.relu(h)
        h = _Conv3x3Reflect(widths[0], dtype=self.compute_dtype,
                            precision=self.precision, fast=self.fast_conv,
                            relu=True, name="e1_conv2")(h)

        skips = [h]
        for step in range(1, self.nsteps + 1):
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = _ConvBlock(widths[step], dtype=self.compute_dtype,
                           precision=self.precision, fast=self.fast_conv,
                           name=f"e{step + 1}")(h)
            skips.append(h)

        for step in range(self.nsteps, 0, -1):
            h = nn.ConvTranspose(widths[step - 1], (2, 2), strides=(2, 2),
                                 padding="VALID", dtype=self.compute_dtype,
                                 precision=self.precision,
                                 name=f"up{step}")(h)
            h = jnp.concatenate([h, skips[step - 1]], axis=-1)
            h = _ConvBlock(widths[step - 1], dtype=self.compute_dtype,
                           precision=self.precision, fast=self.fast_conv,
                           name=f"d{step}")(h)

        out = nn.Conv(self.out_channels, (1, 1), dtype=self.compute_dtype,
                      precision=self.precision, name="outconv")(h)
        return nn.sigmoid(out).astype(in_dtype)


def get_model(
    name: str,
    in_channels: int = 1,
    out_channels: int = 1,
    drop_rate: float = None,
    disable_center: bool = False,
    compute_dtype=jnp.float32,
    fast_conv: bool = False,
) -> UNet:
    """Model factory (parity: src/unet/model/__init__.py:8-49 — names are
    ``unet_<nsteps>``)."""
    if not name.lower().startswith("unet"):
        raise NotImplementedError(name)
    nsteps = int(name.split("_")[1])
    return UNet(
        in_channels=in_channels,
        out_channels=out_channels,
        nsteps=nsteps,
        drop_rate=drop_rate,
        disable_center=disable_center,
        compute_dtype=compute_dtype,
        fast_conv=fast_conv,
    )
