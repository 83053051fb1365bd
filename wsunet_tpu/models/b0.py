"""EfficientNet-B0 binary stego detector (Flax/NHWC, own implementation).

The reference pulls ``timm.create_model('efficientnet_b0')`` plus ImageNet
hub weights (src/detector/models.py:14-66).  Hub downloads are neither
possible nor desirable here; this is a from-scratch B0 (Tan & Le 2019)
with the two reference-specific switches:

- ``no_stem_stride``: stem conv stride (1,1) instead of (2,2)
  (detector/models.py:38-39) — keeps full 512x512 resolution into the
  first stage, which matters for +-1 LSB signals.
- arbitrary ``in_channels`` (1 for grayscale, 2 with the LSBr-reference
  plane appended by the transform; detector/evaluate.py:195).

Layout NHWC; BatchNorm carries running stats in the ``batch_stats``
collection.  ``compute_dtype=bfloat16`` is safe for this classifier.
"""

import typing

import jax.numpy as jnp
from flax import linen as nn

# (expand_ratio, channels, repeats, stride, kernel)
_B0_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


class _SqueezeExcite(nn.Module):
    reduced: int
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


def _make_norm(kind: str, dtype, train: bool):
    """Normalization factory: ``batch`` (EfficientNet spec, running stats)
    or ``group`` (per-image statistics, identical in train and eval).

    Group norm exists for the tiny-corpus from-scratch regime: with
    cover/stego pairs in every batch, batch statistics let the network
    normalize contrastively during training — a signal that evaporates
    under eval-time running averages (observed: plain-B0 train p_e 0.31,
    eval exactly at chance).  Per-image group stats close that gap.
    All B0 channel widths here are multiples of 8, so group_size=8.
    """
    if kind == "group":
        return lambda name: nn.GroupNorm(
            num_groups=None, group_size=8, epsilon=1e-3, dtype=dtype,
            name=name)
    return lambda name: nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-3,
        dtype=dtype, name=name)


class _MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand_ratio: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    norm_kind: str = "batch"
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _make_norm(self.norm_kind, self.dtype, train)
        h = x
        mid = self.in_ch * self.expand_ratio
        if self.expand_ratio != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(h)
            h = nn.silu(norm("expand_bn")(h))
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="dw_conv")(h)
        h = nn.silu(norm("dw_bn")(h))
        h = _SqueezeExcite(max(1, int(self.in_ch * self.se_ratio)),
                           dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(h)
        h = norm("project_bn")(h)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x
        return h


# steganalysis high-pass kernels: KB predictor residual, 2nd differences,
# diagonals, laplacian-like — the classic SRM fixed-filter bank
_HP_KERNELS = [
    [[-1, 2, -1], [2, -4, 2], [-1, 2, -1]],   # KB residual (x4)
    [[0, 0, 0], [1, -2, 1], [0, 0, 0]],        # d2 horizontal
    [[0, 1, 0], [0, -2, 0], [0, 1, 0]],        # d2 vertical
    [[1, 0, 0], [0, -2, 0], [0, 0, 1]],        # diagonal
    [[0, 0, 1], [0, -2, 0], [1, 0, 0]],        # anti-diagonal
    [[1, 1, 1], [1, -8, 1], [1, 1, 1]],        # laplacian ring
    [[0, -1, 0], [-1, 4, -1], [0, -1, 0]],     # 4-neighbor residual
    [[-1, -1, -1], [2, 2, 2], [-1, -1, -1]],   # row detector
]

_QUAD_PAIRS = 8  # product channels appended by the quadratic stem


def _highpass_stem_init(key, shape, dtype=jnp.float32):
    """Stem initializer seeding filters with steganalysis extractors.

    The reference compensates for the weak from-scratch signal by loading
    ImageNet hub weights (detector/models.py:42-62) — not possible here
    (zero egress), so the detector gets its low-level extractors directly:

    - channels 0..7: the cross-channel CENTER DIFFERENCE (with the
      LSBr-reference plane the input is [x, x & ~1], so channel0 - channel1
      is the LSB plane, i.e. (x - x_bar + 1)/2 up to affine) — 8 copies so
      the quadratic stem can pair each with a distinct residual;
    - channels 8..15: the high-pass bank on the pixel channel.
    The quadratic stem multiplies the halves pairwise: LSB * residual IS
    the per-pixel WS product — the only statistic that separates cover
    from LSBr stego (cover LSB planes are themselves near-random).
    For single-channel inputs the first half falls back to the high-pass
    bank (products become SRM-style co-occurrence energies).
    """
    import numpy as np

    kh, kw, cin, cout = shape
    base = nn.initializers.lecun_normal()(key, shape, dtype)
    if (kh, kw) != (3, 3):
        return base
    kernels = [np.asarray(k, np.float32) / 4.0 for k in _HP_KERNELS]
    center = np.zeros((3, 3), np.float32)
    center[1, 1] = 1.0
    fixed = np.zeros(shape, np.float32)
    mask = np.zeros(shape, bool)
    n_seed = min(2 * _QUAD_PAIRS, cout)
    for o in range(n_seed):
        if o < _QUAD_PAIRS:
            if cin >= 2:  # LSB-plane extractor (scaled for visibility)
                fixed[:, :, 0, o] = center * 8.0
                fixed[:, :, 1, o] = -center * 8.0
            else:
                fixed[:, :, 0, o] = kernels[o % len(kernels)]
        else:
            fixed[:, :, 0, o] = kernels[(o - _QUAD_PAIRS) % len(kernels)]
        mask[:, :, :, o] = True
    return jnp.where(jnp.asarray(mask), jnp.asarray(fixed, dtype), base)


class EfficientNetB0(nn.Module):
    num_classes: int = 2
    in_channels: int = 1
    no_stem_stride: bool = False
    drop_rate: float = 0.2
    stem_init: str = "default"  # "default" | "highpass"
    # quadratic stem: append pairwise PRODUCTS of stem-feature halves.
    # Steganalysis is a multiplicative problem — the separating statistic
    # is the per-pixel WS product (x - x_bar)(x - x_hat); silu-gated
    # conv stacks take very long to synthesize per-pixel products from
    # scratch (the reference sidesteps this with ImageNet hub weights).
    # With the highpass init the products start as LSB x residual planes.
    quadratic_stem: bool = False
    # parity features: append cos(pi * x_255) = (-1)^x = x - x_bar as an
    # input channel — a fixed periodic featurization (Fourier-feature
    # flavor of the reference's own ParityOracle transform,
    # _defs/loader.py:73-82) that lets the PLAIN grayscale detector reach
    # the parity statistic a conv stem cannot express (sawtooth in
    # intensity).  The pixel input contract is unchanged.
    parity_features: bool = False
    norm: str = "batch"  # "batch" | "group" (see _make_norm)
    compute_dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype
        norm = _make_norm(self.norm, dt, train)
        if self.parity_features:
            # inputs are ImageNet-green normalized (detect/b0_eval.py);
            # recover the 0..255 scale for the parity cosine.  Computed in
            # f32 BEFORE any bf16 cast: parity needs exact integer phase.
            x255 = (x[..., :1].astype(jnp.float32) * 0.224 + 0.456) * 255.0
            x = jnp.concatenate(
                [x, jnp.cos(jnp.pi * x255).astype(x.dtype)], axis=-1)
        x = x.astype(dt)
        stem_stride = (1, 1) if self.no_stem_stride else (2, 2)
        stem_kernel_init = (_highpass_stem_init if self.stem_init == "highpass"
                            else nn.initializers.lecun_normal())
        h = nn.Conv(32, (3, 3), strides=stem_stride, padding="SAME",
                    use_bias=False, dtype=dt, name="conv_stem",
                    kernel_init=stem_kernel_init)(x)
        if self.quadratic_stem:
            prod = h[..., :_QUAD_PAIRS] * h[..., _QUAD_PAIRS:2 * _QUAD_PAIRS]
            h = jnp.concatenate([h, prod], axis=-1)
        h = nn.silu(norm("bn_stem")(h))
        in_ch = h.shape[-1]
        for si, (t, c, n, s, k) in enumerate(_B0_STAGES):
            for bi in range(n):
                h = _MBConv(
                    in_ch=in_ch, out_ch=c, expand_ratio=t,
                    stride=s if bi == 0 else 1, kernel=k,
                    norm_kind=self.norm, dtype=dt,
                    name=f"stage{si}_block{bi}")(h, train=train)
                in_ch = c
        h = nn.Conv(1280, (1, 1), use_bias=False, dtype=dt, name="conv_head")(h)
        h = nn.silu(norm("bn_head")(h))
        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="classifier")(h.astype(jnp.float32))
        return logits


def get_b0(
    in_channels: int,
    num_classes: int = 2,
    no_stem_stride: bool = False,
    drop_rate: float = 0.2,
    stem_init: str = "default",
    quadratic_stem: bool = False,
    parity_features: bool = False,
    norm: str = "batch",
    compute_dtype=jnp.float32,
    **_ignored,
) -> EfficientNetB0:
    """Factory (parity: src/detector/models.py:14-66, minus hub weights)."""
    return EfficientNetB0(
        num_classes=num_classes,
        in_channels=in_channels,
        no_stem_stride=no_stem_stride,
        drop_rate=drop_rate,
        stem_init=stem_init,
        quadratic_stem=quadratic_stem,
        parity_features=parity_features,
        norm=norm,
        compute_dtype=compute_dtype,
    )
