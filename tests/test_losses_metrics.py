"""Losses vs torch-reference oracle formulas; meters vs sklearn."""

import numpy as np
import pytest

import jax.numpy as jnp

from wsunet_tpu.detect import metrics as M
from wsunet_tpu.train import get_loss, l1ws_loss, ws_loss


def test_ws_loss_oracle():
    """WSLoss parity (reference _defs/losses.py:45-89): x255, round->xor,
    uniform 1/(HWC) weights, per-image sum, relu, |beta_hat - alpha/2|."""
    rng = np.random.default_rng(0)
    inputs = rng.integers(0, 256, (3, 16, 16, 1)).astype("float32") / 255.0
    outputs = np.clip(inputs + rng.normal(scale=0.01, size=inputs.shape), 0, 1).astype("float32")
    alphas = np.array([0.0, 0.2, 0.4], dtype="float32")

    x = inputs * 255.0
    y = outputs * 255.0
    x_bar = (np.round(x).astype(int) ^ 1).astype("float32")
    w = 1.0 / (16 * 16 * 1)
    bh = np.maximum((w * (x - x_bar) * (x - y)).sum(axis=(1, 2, 3)), 0.0)
    want = np.mean(np.abs(bh - alphas / 2.0))

    got = ws_loss(jnp.asarray(outputs), jnp.asarray(inputs),
                  jnp.asarray(inputs), jnp.asarray(alphas))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_l1ws_is_sum():
    rng = np.random.default_rng(1)
    inputs = rng.uniform(size=(2, 8, 8, 1)).astype("float32")
    outputs = rng.uniform(size=(2, 8, 8, 1)).astype("float32")
    covers = rng.uniform(size=(2, 8, 8, 1)).astype("float32")
    alphas = np.array([0.4, 0.4], dtype="float32")
    l1 = get_loss("l1")(jnp.asarray(outputs), jnp.asarray(covers))
    ws = ws_loss(jnp.asarray(outputs), jnp.asarray(covers),
                 jnp.asarray(inputs), jnp.asarray(alphas))
    both = l1ws_loss(jnp.asarray(outputs), jnp.asarray(covers),
                     jnp.asarray(inputs), jnp.asarray(alphas))
    np.testing.assert_allclose(float(both), float(l1) + float(ws), rtol=1e-6)


def test_l1ws_weighted_anchor_form():
    """The reference anchor's lambda composite 2*(lam*L1 + (1-lam)*WS)
    (losses.py:117, recorded as loss_lambda=0.25 in every shipped UNet
    config).  lam=0.5 must reduce exactly to the live unweighted sum."""
    rng = np.random.default_rng(2)
    inputs = rng.uniform(size=(2, 8, 8, 1)).astype("float32")
    outputs = rng.uniform(size=(2, 8, 8, 1)).astype("float32")
    covers = rng.uniform(size=(2, 8, 8, 1)).astype("float32")
    alphas = np.array([0.0, 0.4], dtype="float32")
    args = (jnp.asarray(outputs), jnp.asarray(covers),
            jnp.asarray(inputs), jnp.asarray(alphas))
    l1 = get_loss("l1", per_image=True)(*args)
    ws = get_loss("ws", per_image=True)(*args)
    w25 = get_loss("l1ws", per_image=True, loss_lambda=0.25)(*args)
    np.testing.assert_allclose(
        np.asarray(w25), 2 * (0.25 * np.asarray(l1) + 0.75 * np.asarray(ws)),
        rtol=1e-6)
    w50 = get_loss("l1ws", per_image=True, loss_lambda=0.5)(*args)
    unw = get_loss("l1ws", per_image=True)(*args)
    np.testing.assert_allclose(np.asarray(w50), np.asarray(unw), rtol=1e-6)
    # scalar variant reduces over the batch
    s = get_loss("l1ws", loss_lambda=0.25)(*args)
    np.testing.assert_allclose(float(s), float(np.mean(np.asarray(w25))),
                               rtol=1e-6)


def test_unknown_loss_raises():
    with pytest.raises(NotImplementedError):
        get_loss("focal")


def test_pe_meter():
    m = M.PEMeter()
    m.update(np.array([0, 0, 1, 1]), np.array([0.1, 0.6, 0.7, 0.9]))
    # threshold between .6 and .7: fpr=.5,tpr=1 -> P=.25 ; between .1/.6:
    # fpr .5 tpr 1 ... min positive P
    assert 0 < m.avg <= 0.5


def test_auc_meter_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, 50)
    s = rng.uniform(size=50)
    m = M.AUCMeter()
    m.update(y[:25], s[:25])
    m.update(y[25:], s[25:])
    np.testing.assert_allclose(m.avg, roc_auc_score(y, s))


def test_ws_meter_tracks_beta():
    m = M.WSMeter()
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (2, 32, 32, 1)).astype("float32") / 255.0
    m.update(x, x.copy(), alphas=np.array([0.0, 0.0]))
    assert m.avg == pytest.approx(0.0, abs=1e-6)


def test_progress_meter_format():
    lm = M.LossMeter()
    lm.update(0.5, 2)
    p = M.ProgressMeter(10, [lm], prefix="Epoch: [0]")
    assert "loss" in p.to_str(3)


def test_wauc_meter_reasonable():
    """wAUC (ALASKA-style) between 0 and 1, higher for a better detector."""
    rng = np.random.default_rng(4)
    y = rng.integers(0, 2, 200)
    good = y + rng.normal(scale=0.3, size=200)
    bad = rng.uniform(size=200)
    mg, mb = M.wAUCMeter(), M.wAUCMeter()
    mg.update(y, good)
    mb.update(y, bad)
    assert 0 <= mb.avg <= 1.001
    assert mg.avg > mb.avg


def test_corr_meter_detects_correlation():
    rng = np.random.default_rng(5)
    y_true = rng.normal(size=(4, 16, 16, 1))
    m = M.CorrMeter()
    m.update(y_true, y_true * 0.5)  # residual perfectly correlated with pred
    assert m.avg > 0.9


def test_mae_meter_masked():
    m = M.MAEMeter(masked=True)
    y = np.array([1.0, 2.0, 3.0])
    p = np.array([0.0, 0.0, 0.0])
    m.update(y, p, mask=np.array([True, False, True]))
    assert m.avg == pytest.approx(2.0)


def test_pmd5fp_meter():
    m = M.PMD5FPMeter()
    y = np.array([0] * 100 + [1] * 100)
    s = np.concatenate([np.linspace(0, .4, 100), np.linspace(.6, 1, 100)])
    m.update(y, s)
    assert m.avg == pytest.approx(0.0)  # perfectly separable


def test_produce_roc_reports_wauc_and_pmd(data_root):
    """ROC tables surface the training-time meter statistics
    (wAUC, PMD@5%FP) alongside auc/p_e."""
    import numpy as np
    import pandas as pd
    from wsunet_tpu.detect.roc import produce_roc
    from wsunet_tpu.detect.metrics import PMD5FPMeter, wAUCMeter

    rng = np.random.default_rng(0)
    rows = []
    for i in range(40):
        stego = i % 2
        rows.append({
            "stego_method": "LSBR" if stego else "Cover",
            "alpha": 0.1 if stego else 0.0,
            "model_name": "KB",
            "beta_hat": rng.normal(0.05 if stego else 0.0, 0.02),
        })
    df = produce_roc(pd.DataFrame(rows))
    assert {"wauc", "pmd_5fp"} <= set(df.columns)
    w, p = df["wauc"].iloc[0], df["pmd_5fp"].iloc[0]
    # independent recompute through the meters
    sub = pd.DataFrame(rows)
    y = (sub["alpha"] > 0).astype(int).to_numpy()
    s = np.clip(sub["beta_hat"].to_numpy(), 0, None)
    wm, pm = wAUCMeter(), PMD5FPMeter()
    wm.update(y, s)
    pm.update(y, s)
    assert abs(w - wm.avg) < 1e-12
    assert abs(p - pm.avg) < 1e-12


def test_wauc_degenerate_split_is_nan_not_crash():
    # a tiny eval set can leave <2 ROC points on one side of the
    # beta=0.4 split; sklearn.auc needs 2 (the reference meter raises
    # here) — the meter must report NaN instead of crashing the sweep
    m = M.wAUCMeter()
    m.update(np.array([0, 1]), np.array([0.9, 0.1]))  # inverted 1v1
    assert np.isnan(m.avg)
    m2 = M.wAUCMeter()  # perfect 1v1: first threshold already tpr>=0.4
    m2.update(np.array([0, 1]), np.array([0.1, 0.9]))
    assert np.isnan(m2.avg)
