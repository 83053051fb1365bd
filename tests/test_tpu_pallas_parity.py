"""On-TPU parity of the fused Pallas WS kernel (skips off-TPU).

The golden-CSV suite exercises the XLA path (the CPU platform check in
ws/estimate.attack_sweep bypasses the kernel), and the interpret-mode test
(tests/test_pallas_ws.py) runs on CPU — so the kernel that actually
dispatches on TPU hardware is numerics-checked HERE, on real fixture
images, for every weight mode and both named kernels.

Run with:  WSUNET_TEST_TPU=1 python -m pytest tests/test_tpu_pallas_parity.py
(the default conftest pins the suite to a virtual CPU mesh).
The same check also runs inside every TPU `bench` invocation
(wsunet_tpu/bench.py ws_fused field), so BENCH_r*.json records the parity
artifact each round.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="fused-kernel parity runs on real TPU (WSUNET_TEST_TPU=1)")


@pytest.mark.parametrize("kname", ["KB", "AVG"])
@pytest.mark.parametrize("weighted", [0, 1, -1])
def test_fused_ws_matches_xla_on_tpu(data_root, kname, weighted):
    from wsunet_tpu.data import iterate_batches, stego_spatial
    from wsunet_tpu.ops import NAMED_FILTERS_2D, ws_attack
    from wsunet_tpu.ops.pallas_ws import ws_attack_fused

    df = stego_spatial(data_root, stego_method="LSBR", alpha=0.4)
    batch = next(iter(iterate_batches(data_root, df, 8)))
    pixels = jnp.asarray(batch.pixels)

    fused = np.asarray(ws_attack_fused(pixels, kname, weighted=weighted))
    xla = np.asarray(jax.jit(
        lambda p: ws_attack(p, pixel_kernel=NAMED_FILTERS_2D[kname],
                            weighted=weighted))(pixels))
    np.testing.assert_allclose(fused, xla, rtol=1e-5, atol=1e-6)


def test_fast_conv_unet_matches_xla_on_tpu(data_root):
    """UNet(fast_conv=True) — fused Pallas reflect-conv (+relu) blocks —
    must reproduce the XLA reference path on real fixture pixels."""
    from wsunet_tpu.data import iterate_batches, precovers
    from wsunet_tpu.models import get_model

    df = precovers(data_root)
    batch = next(iter(iterate_batches(data_root, df, 4)))
    x = jnp.asarray(batch.pixels, jnp.float32)[..., None] / 255.0

    model = get_model("unet_2")
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    slow = model.apply(variables, x)
    fast = get_model("unet_2", fast_conv=True).apply(variables, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-4, atol=2e-4)
