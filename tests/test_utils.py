"""Utility subsystems: profiling hooks, run names, registry, seeding."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsunet_tpu.utils import create_run_name, filename_to_image_seed
from wsunet_tpu.utils.profiling import log_compiles, nan_check, profile
from wsunet_tpu.utils.registry import get_model_name, scan_models


def test_filename_seed_matches_reference_scheme():
    """sha256(stem) % 2**31 (fabrika.py:276-291)."""
    import hashlib
    assert filename_to_image_seed("a/b/6.png") == \
        int(hashlib.sha256(b"6").hexdigest(), 16) % 2 ** 31


def test_run_name_encoding():
    name = create_run_name(dict(
        network="unet_2", alpha="0.400", grayscale=True, loss="l1ws",
        loss_lambda=0.25, learning_rate=1e-4, drop_rate=None))
    assert name.startswith("unet_2-alpha_0.400_grayscale_l1ws_0.25_lr_0.0001")
    nostride = create_run_name(dict(
        network="b0", no_stem_stride=True, alpha=0.01, grayscale=True,
        loss="crossentropy", learning_rate=1e-4))
    assert nostride.startswith("b0-nostride-")


def test_registry_filters(tmp_path):
    for i, (alpha, ns) in enumerate([(0.01, False), (0.01, True)]):
        exp = tmp_path / "LSBR" / f"exp{i}"
        (exp / "model" / "best").mkdir(parents=True)
        with open(exp / "config.json", "w") as f:
            json.dump({"stego_method": "LSBR", "alpha": alpha,
                       "loss": "crossentropy", "network": "b0",
                       "drop_rate": 0.2, "no_stem_stride": ns,
                       "lsbr_reference": False}, f)
    assert len(scan_models(tmp_path, "LSBR")) == 2
    assert get_model_name(tmp_path, "LSBR", no_stem_stride=True) == "exp1"
    with pytest.raises(RuntimeError, match="no model"):
        get_model_name(tmp_path, "HILLR")
    with pytest.raises(RuntimeError, match="multiple"):
        get_model_name(tmp_path, "LSBR", alpha=0.01)


def test_nan_check_raises_inside_jit():
    with nan_check(True):
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(
                jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)))
    # and restores the previous setting
    jax.block_until_ready(jax.jit(lambda x: x * 0)(jnp.asarray(np.inf)))


def test_profile_writes_trace(tmp_path):
    with profile(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert any(tmp_path.rglob("*")), "no trace files written"


def test_log_compiles_context():
    with log_compiles(True):
        jax.jit(lambda x: x + 1)(jnp.zeros(4))
    assert jax.config.jax_log_compiles is False


def test_typed_config_rejects_unknown_keys():
    import pytest
    from wsunet_tpu.train.config import B0TrainConfig, UNetTrainConfig

    cfg = UNetTrainConfig.validate({"alpha": 0.2, "loss": "l1"})
    assert cfg["alpha"] == 0.2 and cfg["network"] == "unet_2"
    with pytest.raises(ValueError, match="unknown"):
        UNetTrainConfig.validate({"alhpa": 0.2})  # typo must fail fast
    b0 = B0TrainConfig.validate({"alpha": [0.1, 0.01], "val_steps": 5})
    assert b0["alpha"] == [0.1, 0.01]
    with pytest.raises(ValueError, match="unknown"):
        B0TrainConfig.validate({"steps": 5})
