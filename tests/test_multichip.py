"""Multi-chip sharding: the graft entry's training step on a virtual mesh."""

import sys
import pathlib

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(n)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None


def test_sharded_ws_attack_matches_single_device(data_root):
    """ws_attack over a 1-D data mesh gives identical results to
    single-device execution (psum-free batch parallelism)."""
    import numpy as np
    import jax.numpy as jnp
    from wsunet_tpu.io import imread_gray_u8
    from wsunet_tpu.ops import NAMED_FILTERS_2D, ws_attack
    from wsunet_tpu.parallel import get_mesh, shard_batch

    xs = np.stack([
        imread_gray_u8(data_root / "images" / f"{i}.png")
        for i in (6, 7, 8, 9, 10)] + [
        imread_gray_u8(data_root / "images" / "6.png")
        for _ in range(3)])
    single = np.asarray(ws_attack(
        jnp.asarray(xs), pixel_kernel=NAMED_FILTERS_2D["KB"]))

    mesh = get_mesh()
    sharded_in = shard_batch(mesh, jnp.asarray(xs))
    sharded = np.asarray(jax.jit(
        lambda p: ws_attack(p, pixel_kernel=NAMED_FILTERS_2D["KB"]))(sharded_in))
    # sharded layouts reassociate the reduction; values near the clip-at-0
    # boundary differ by O(1e-8)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("weighted", [0, 1])
def test_spatial_sharded_ws_matches_single_device(weighted, data_root):
    """Halo-exchanged spatially-sharded WS == single-device ws_attack."""
    import numpy as np
    import jax.numpy as jnp
    from wsunet_tpu.io import imread_gray_u8
    from wsunet_tpu.ops import NAMED_FILTERS_2D, ws_attack
    from wsunet_tpu.parallel import get_mesh
    from wsunet_tpu.parallel.spatial import ws_attack_spatial

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    xs = np.stack([
        imread_gray_u8(data_root / "images" / f"{i}.png") for i in (6, 7)])
    x = jnp.asarray(xs)
    single = np.asarray(ws_attack(
        x, pixel_kernel=NAMED_FILTERS_2D["KB"], weighted=weighted))
    mesh = get_mesh(8, axis="spatial")
    sharded = np.asarray(ws_attack_spatial(
        x, NAMED_FILTERS_2D["KB"], mesh, axis="spatial", weighted=weighted))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-6)


def test_distributed_helpers_single_host(data_root):
    import numpy as np
    from wsunet_tpu.data import precovers
    from wsunet_tpu.parallel import get_mesh
    from wsunet_tpu.parallel.distributed import (
        distributed_init, global_batch, process_local_rows)

    assert distributed_init() is False  # single host
    df = precovers(data_root)
    assert len(process_local_rows(df)) == len(df)
    mesh = get_mesh()
    x = np.zeros((8, 16, 16), dtype=np.uint8)
    arr = global_batch(mesh, x)
    assert arr.shape == (8, 16, 16)
    assert len(arr.sharding.device_set) == len(jax.devices())


def test_spatially_sharded_unet_matches_single_device():
    """XLA auto-partitioned (halo-exchanged) U-Net inference over a
    spatial mesh axis == single-device inference."""
    import numpy as np
    import jax.numpy as jnp
    from wsunet_tpu.models.unet import UNet
    from wsunet_tpu.parallel import get_mesh
    from wsunet_tpu.parallel.spatial import infer_unet_spatial
    from wsunet_tpu.ws.unet_eval import infer_unet

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    model = UNet(nsteps=1)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1), jnp.float32))
    rng = np.random.default_rng(0)
    # 512-row images sharded 8 ways; use 128x128 to keep CPU time sane
    x = jnp.asarray(rng.integers(0, 256, (2, 128, 128)).astype("float32"))
    single = np.asarray(infer_unet(model, variables, x))
    mesh = get_mesh(8, axis="spatial")
    sharded = np.asarray(infer_unet_spatial(
        model, variables, x, mesh, axis="spatial"))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-3)
