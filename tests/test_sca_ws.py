"""Selection-channel-aware WS (ops.ws_attack_sca / the 'KB-sca' row).

Mechanism + wiring tests on NON-fixture synthetic images only: the
detector's definition (statistic + frac=0.05) was pre-committed on
non-fixture tuning data per the leak-free protocol
(docs/EVAL_PROTOCOL.md), and this suite reproduces that mechanism check
so a regression in hill_cost / the restricted mean breaks loudly.

No reference counterpart: the reference WS sweep (src/ws/estimate.py)
is selection-blind.
"""

import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from wsunet_tpu.data.simulate import hillr_simulate
from wsunet_tpu.ops import NAMED_FILTERS_2D, ws_attack, ws_attack_sca


def _sensor_like_covers(n=4, size=128, seed=11):
    """Smooth scene + sensor-ish noise, uint8 [n, size, size] — the same
    construction family as the pre-commitment tuning set."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        base = gaussian_filter(rng.normal(size=(size, size)), 3 + 2 * i)
        base = (base - base.min()) / (np.ptp(base) + 1e-9) * 180 + 40
        img = base + rng.normal(0, 1.0 + 0.5 * i, (size, size))
        out.append(np.clip(np.round(img), 0, 255).astype(np.uint8))
    return np.stack(out)


def test_sca_separates_hillr_where_global_ws_is_blind():
    covers = jnp.asarray(_sensor_like_covers())
    kb = NAMED_FILTERS_2D["KB"]

    cov = np.asarray(ws_attack_sca(covers, pixel_kernel=kb))
    stego_scores = []
    for alpha in (0.01, 0.05, 0.1):
        st = hillr_simulate(covers, alpha)
        stego_scores.append(np.asarray(ws_attack_sca(st, pixel_kernel=kb)))
    pos = np.concatenate(stego_scores)

    # perfect separation on the synthetic set: every stego score above
    # every cover score (the tuning-set result the frac=0.05 choice was
    # committed on)
    assert pos.min() > cov.max()

    # amplification: the restricted score at alpha=0.1 estimates
    # (alpha/2)/frac = 1.0 region change rate, ~20x the global estimate
    st = hillr_simulate(covers, 0.1)
    glob = np.asarray(ws_attack(st, pixel_kernel=kb, weighted=1))
    assert stego_scores[-1].mean() > 0.5
    assert stego_scores[-1].mean() > 5 * glob.mean()


def test_sca_batched_matches_per_image():
    covers = jnp.asarray(_sensor_like_covers(n=3, seed=5))
    kb = NAMED_FILTERS_2D["KB"]
    batched = np.asarray(ws_attack_sca(covers, pixel_kernel=kb))
    single = np.array([
        float(ws_attack_sca(covers[i:i + 1], pixel_kernel=kb)[0])
        for i in range(3)])
    np.testing.assert_allclose(batched, single, rtol=1e-6)


def test_sca_registry_dispatch(tmp_path):
    """ws.run('KB-sca') resolves the suffix, sweeps through attack_sweep,
    and labels rows 'KB-sca' — on a synthetic temp dataset."""
    from PIL import Image
    from wsunet_tpu.ws import ws_run

    root = tmp_path / "data"
    (root / "images").mkdir(parents=True)
    covers = _sensor_like_covers(n=3, size=96, seed=3)
    rows = []
    for i, img in enumerate(covers):
        Image.fromarray(img, "L").save(root / "images" / f"{i}.png")
        rows.append({"name": f"images/{i}.png", "height": 96, "width": 96,
                     "stego_method": np.nan, "alpha": np.nan})
    pd.DataFrame(rows).to_csv(root / "images" / "files.csv", index=False)

    sdir = root / "stego_HILLr_alpha_0.1_independent_images"
    sdir.mkdir()
    st = np.asarray(hillr_simulate(jnp.asarray(covers), 0.1))
    rows = []
    for i, img in enumerate(st):
        Image.fromarray(img, "L").save(sdir / f"{i}.png")
        rows.append({"name": f"{sdir.name}/{i}.png", "height": 96,
                     "width": 96, "stego_method": "HILLR", "alpha": 0.1})
    pd.DataFrame(rows).to_csv(sdir / "files.csv", index=False)

    res_c = ws_run(input_dir=root, stego_method=None, alpha=None,
                   model_name="KB-sca", batch_size=4)
    res_s = ws_run(input_dir=root, stego_method="HILLR", alpha=0.1,
                   model_name="KB-sca", batch_size=4)
    assert set(res_c["model_name"]) == {"KB-sca"}
    assert set(res_s["model_name"]) == {"KB-sca"}
    assert res_s["beta_hat"].min() > res_c["beta_hat"].max()


def test_sca_unknown_filter_suffix_rejected():
    """'NOPE-sca' must not silently fall through to the UNet registry
    with a confusing message; it raises the same unknown-model error
    path as any unknown name."""
    from wsunet_tpu.ws import ws_run
    with pytest.raises(Exception):
        ws_run(input_dir="/nonexistent", stego_method=None, alpha=None,
               model_name="NOPE-sca")
