"""Color / 4-channel path tests.

Covers the reference's color surface rebuilt here:
- imread4 [R,G,B,Y] batched decode feeding the pipeline
- channel-selected filter residuals (filters-eval --channels 0..2)
- Bayer-phase subsampling (_defs/filters.py:44-50 semantics)
- color4/color8 OLS tap layouts vs a numpy least-squares oracle
- WS attack routed to an R/G/B plane and the color OLS predictor
"""

import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from PIL import Image


@pytest.fixture(scope="module")
def color_root(tmp_path_factory):
    """Tiny color fixture: 4 RGB covers + LSBr-in-green stego dir."""
    root = tmp_path_factory.mktemp("colorfix")
    (root / "images").mkdir()
    rng = np.random.default_rng(7)
    covers = []
    for i in range(4):
        # smooth natural-ish content: blurred noise + gradient, per channel
        base = rng.normal(0, 40, (68, 68, 3)).cumsum(0).cumsum(1)
        base = base / np.abs(base).max() * 90 + 120
        img = np.clip(base + rng.normal(0, 2, base.shape), 0, 255)
        img = img[2:66, 2:66].astype("uint8")
        Image.fromarray(img, "RGB").save(root / "images" / f"{i}.png")
        covers.append(img)

    pd.DataFrame([
        {"name": f"images/{i}.png", "height": 64, "width": 64,
         "stego_method": np.nan, "alpha": np.nan}
        for i in range(4)
    ]).to_csv(root / "images" / "files.csv", index=False)

    # LSBr at alpha=1.0 in the green channel only
    sdir = root / "stego_LSBR_alpha_1.0_independent_images"
    sdir.mkdir()
    rows = []
    for i, img in enumerate(covers):
        stego = img.copy()
        g = stego[..., 1]
        bits = rng.integers(0, 2, g.shape, dtype="uint8")
        stego[..., 1] = (g & 0xFE) | bits
        Image.fromarray(stego, "RGB").save(sdir / f"{i}.png")
        rows.append({"name": f"{sdir.name}/{i}.png", "height": 64,
                     "width": 64, "stego_method": "LSBR", "alpha": 1.0})
    pd.DataFrame(rows).to_csv(sdir / "files.csv", index=False)
    return root


def _ring_matrix(x):
    """Reference-style N x 9 neighborhood matrix (_defs/filters.py:53-67)."""
    return np.stack([
        x[:-2, :-2].ravel(), x[:-2, 1:-1].ravel(), x[:-2, 2:].ravel(),
        x[1:-1, 2:].ravel(), x[2:, 2:].ravel(), x[2:, 1:-1].ravel(),
        x[2:, :-2].ravel(), x[1:-1, :-2].ravel(), x[1:-1, 1:-1].ravel(),
    ], axis=-1)


def test_imread4_channels(color_root):
    from wsunet_tpu.io.imread import imread4_u8, imread_gray_u8
    x4 = imread4_u8(color_root / "images" / "0.png")
    assert x4.shape == (64, 64, 4)
    y = imread_gray_u8(color_root / "images" / "0.png")
    np.testing.assert_array_equal(x4[..., 3], y)  # same BT.601 rounding


def test_filters_eval_color_channels(color_root):
    """filters-eval on R and G matches the reference N x 9 matmul oracle."""
    from wsunet_tpu.io.imread import imread4_u8
    from wsunet_tpu.ops import NAMED_FILTERS
    from wsunet_tpu.ws import filters_run

    res = filters_run(color_root, filter_names=["KB", "KB"],
                      channels=[(0,), (1,)], batch_size=2)
    for c in (0, 1):
        col = f"mae_{c}_KB"
        got = res[col].dropna().reset_index(drop=True)
        for i in range(4):
            x = imread4_u8(color_root / "images" / f"{i}.png")
            m = _ring_matrix(x[..., c].astype("float64"))
            resid = m[:, 8] - m[:, :8] @ NAMED_FILTERS["KB"].ravel()
            np.testing.assert_allclose(got.iloc[i], np.abs(resid).mean(),
                                       rtol=1e-5)


@pytest.mark.parametrize("inbayer", ["00", "01", "10", "11"])
def test_bayer_subsample_matches_reference_processor(color_root, inbayer):
    """bayer_slices reproduces the reference's crop+step processor."""
    from wsunet_tpu.io.imread import imread4_u8
    from wsunet_tpu.ops import NAMED_FILTERS, filter_residuals
    from wsunet_tpu.ops.filters import taps_to_kernel2d
    from wsunet_tpu.ws.filters_eval import bayer_slices

    x = imread4_u8(color_root / "images" / "1.png")[..., 1].astype("float32")

    # reference semantics: crop one ring for digit '0', then step 2
    b1 = slice(1, -1) if inbayer[0] == "0" else slice(None)
    b2 = slice(1, -1) if inbayer[1] == "0" else slice(None)
    xc = x[b1, b2]
    m = _ring_matrix(xc.astype("float64"))
    taps = NAMED_FILTERS["KB"].ravel()
    resid_full = (m[:, 8] - m[:, :8] @ taps).reshape(
        xc.shape[0] - 2, xc.shape[1] - 2)
    want = resid_full[::2, ::2]

    s1, s2 = bayer_slices(inbayer)
    got = np.asarray(filter_residuals(
        jnp.asarray(x[None]), taps_to_kernel2d(NAMED_FILTERS["KB"])))[0]
    got = got[s1, s2]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("channels", [(1, 0), (2, 1, 0)])
def test_color_ols_matches_lstsq_oracle(color_root, channels):
    """color4/color8 OLS fit == numpy lstsq over the stacked design."""
    from wsunet_tpu.io.imread import imread4_u8
    from wsunet_tpu.ops.ols import fit_ols_color

    xs = np.stack([
        imread4_u8(color_root / "images" / f"{i}.png") for i in range(4)
    ]).astype("float32")
    theta = fit_ols_color(xs, channels)
    assert theta.shape == (9 * (len(channels) - 1) + 8,)

    X_rows, y_rows = [], []
    for img in xs.astype("float64"):
        cols = [_ring_matrix(img[..., c]) for c in channels[:-1]]
        m_t = _ring_matrix(img[..., channels[-1]])
        X_rows.append(np.concatenate(cols + [m_t[:, :8]], axis=-1))
        y_rows.append(m_t[:, 8])
    X = np.concatenate(X_rows)
    y = np.concatenate(y_rows)
    want = np.linalg.lstsq(X, y, rcond=None)[0]
    np.testing.assert_allclose(theta, want, rtol=5e-3, atol=5e-3)

    # optimality: OLS SSE <= KB SSE on the target channel
    from wsunet_tpu.ops import NAMED_FILTERS
    kb = np.zeros(theta.shape)
    kb[-8:] = NAMED_FILTERS["KB"].ravel()
    assert ((y - X @ theta) ** 2).sum() <= ((y - X @ kb) ** 2).sum() * (
        1 + 1e-6)


def test_ws_attack_color_channel(color_root):
    """WS attack routed to the green plane sees the embedding; the red
    plane (untouched) does not."""
    from wsunet_tpu.ws.estimate import run as ws_run

    res_g = ws_run(color_root, "LSBR", 1.0, "KB", channels=(1,),
                   batch_size=2)
    assert np.isfinite(res_g["beta_hat"]).all()
    assert abs(res_g["beta_hat"].mean() - 0.5) < 0.1

    res_r = ws_run(color_root, "LSBR", 1.0, "KB", channels=(0,),
                   batch_size=2)
    assert res_r["beta_hat"].mean() < 0.05


def test_ws_color_ols(color_root):
    """color4 OLS estimator drives the WS attack end-to-end."""
    from wsunet_tpu.ws.estimate import run as ws_run

    res = ws_run(color_root, "LSBR", 1.0, "OLS", channels=(0, 1),
                 batch_size=2)
    assert (res["model_name"] == "OLS").all()
    assert np.isfinite(res["beta_hat"]).all()
    assert abs(res["beta_hat"].mean() - 0.5) < 0.1

    cov = ws_run(color_root, None, None, "OLS", channels=(0, 1),
                 batch_size=2)
    assert abs(cov["beta_hat"].mean()) < 0.05
