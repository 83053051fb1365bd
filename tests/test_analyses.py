"""Analyses vs golden CSVs (weight-free paths)."""

import numpy as np
import pandas as pd

from wsunet_tpu.analyses import run_correlation, run_error_boxes
from wsunet_tpu.analyses.saliency import sobel_locations


def test_correlation_matches_golden(data_root, results_root):
    """Filter rows of results/estimation/correlation.csv (incl. the
    reference's xhat-std normalization quirk)."""
    _, agg = run_correlation(data_root, model_dir=None, unet_methods=())
    golden = pd.read_csv(
        results_root / "estimation" / "correlation.csv", index_col=0)
    for name in ["1", "AVG9", "AVG", "KB"]:
        np.testing.assert_allclose(
            agg[name]["correlation"], float(golden[name]["correlation"]),
            rtol=1e-4, atol=1e-8)
        np.testing.assert_allclose(
            agg[name]["p-value"], float(golden[name]["p-value"]),
            rtol=1e-3)


def test_error_boxes_match_golden(data_root, results_root):
    """KB/AVG box quantiles of results/prediction/ae_boxes_3.csv."""
    out = run_error_boxes(data_root, model_dir=None, unet_models=())
    golden = pd.read_csv(results_root / "prediction" / "ae_boxes_3.csv")
    cols = ["min", "q_25_iqr", "q_25", "q_50", "q_75", "q_75_iqr", "max"]
    for t in ["KB", "AVG"]:
        got = out[out.Type == t].sort_values("edge_interval")
        want = golden[golden.Type == t].sort_values("edge_interval")
        for c in cols:
            np.testing.assert_allclose(
                got[c].to_numpy(), want[c].to_numpy(), rtol=1e-5,
                err_msg=f"{t}:{c}")


def test_sobel_locations_match_reference_points(data_root):
    """The saliency interesting points on image 6 are the hard-coded ones
    used by the reference (saliency.py:220-225)."""
    locs = sobel_locations(data_root / "images" / "6.png")
    assert locs["gh_max"][:2] == (307, 10)
    assert locs["gv_max"][:2] == (261, 64)
    assert locs["g_max"][:2] == (155, 381)
    assert locs["g_min"][:2] == (9, 25)


def test_saliency_dots_artifact_matches_golden(data_root, results_root,
                                               tmp_path):
    """saliency_image_dots.png (VERDICT r4 item 8): the interesting-points
    overlay must match the reference artifact pixel-for-pixel
    (saliency.py:89-96)."""
    import numpy as np
    from PIL import Image
    from wsunet_tpu.analyses.saliency import render_dots

    out = render_dots(data_root / "images" / "6.png",
                      tmp_path / "saliency_image_dots.png")
    got = np.asarray(Image.open(out).convert("RGB"))
    want = np.asarray(Image.open(
        results_root / "prediction" / "saliency_image_dots.png"
    ).convert("RGB"))
    np.testing.assert_array_equal(got, want)
