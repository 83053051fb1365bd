"""Regenerate the full results/ tree with the framework CLI.

Mirrors the reference's README run-book (filters, unet-eval, ws sweep,
detector, roc, correlation, error boxes, contour, saliency) using the
fixture data and the locally-trained model zoo.  Run after
scripts/train_fixture_models.py.
"""

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA = "/root/reference/data"


def main(results_dir=None):
    """Regenerate into ``results_dir`` (default: the committed
    results/).  An out-of-tree dir gives a non-destructive end-to-end
    validation: regenerate to a temp dir, diff against the committed
    artifacts."""
    from wsunet_tpu.cli import main as cli

    results = str(results_dir or REPO / "results")
    unet_dir = str(REPO / "models/unet")
    b0_dir = str(REPO / "models/b0")

    steps = [
        ["filters-eval", "--data", DATA, "--results", results],
        ["unet-eval", "--data", DATA, "--results", results,
         "--model-dir", unet_dir, "--stego-method", "LSBR"],
        ["unet-eval", "--data", DATA, "--results", results,
         "--model-dir", unet_dir, "--stego-method", "dropout"],
        ["unet-eval", "--data", DATA, "--results", results,
         "--model-dir", unet_dir, "--stego-method", "HILLR"],
        # four-predictor sweep (AVG, KB, UNet_l1, UNet_l1ws_LSBR) + OLS;
        # writes ws_sweep_LSBR.csv (never the unet-eval golden file)
        ["ws-eval", "--data", DATA, "--results", results,
         "--model-dir", unet_dir, "--models", "AVG", "KB", "KB-w", "OLS",
         "UNet"],
        ["detector-eval", "--data", DATA, "--results", results,
         "--model-dir", b0_dir],
        # HILLR curves land in the committed artifacts alongside LSBR
        # (VERDICT r2 #4): the LSBR-trained detectors are evaluated on
        # HILLR stego like the reference sweep, and the HILLR-trained
        # UNet joins as its own "UNet_HILLR" rows (with cover passes)
        ["roc", "--data", DATA, "--results", results,
         "--unet-model-dir", unet_dir, "--b0-model-dir", b0_dir, "--b0",
         "--stego-methods", "LSBR", "HILLR"],
        ["correlation", "--data", DATA, "--results", results,
         "--model-dir", unet_dir],
        ["error-boxes", "--data", DATA, "--results", results,
         "--model-dir", unet_dir],
        ["contour", "--data", DATA, "--results", results,
         "--model-dir", unet_dir],
        ["saliency", "--data", DATA, "--results", results,
         "--model-dir", unet_dir, "--stego-method", "LSBR"],
        ["saliency", "--data", DATA, "--results", results,
         "--model-dir", unet_dir, "--stego-method", "dropout"],
    ]
    failures = []
    for argv in steps:
        print(f"\n$ python -m wsunet_tpu {' '.join(argv)}", flush=True)
        try:
            cli(argv)
        except Exception as e:  # keep going; report at the end
            print(f"FAILED: {type(e).__name__}: {e}", flush=True)
            failures.append((argv[0], str(e)))

    # leak-free holdout tables (train/eval cover-disjoint protocol) —
    # needs the fold-B zoo (models_foldb/); skipped when absent
    if (REPO / "models_foldb").exists():
        print("\n$ python scripts/round3_holdout.py", flush=True)
        try:
            from scripts.round3_holdout import main as holdout_main
            holdout_main(results_dir=pathlib.Path(results))
        except Exception as e:
            print(f"FAILED: {type(e).__name__}: {e}", flush=True)
            failures.append(("holdout", str(e)))
    print("\n=== done;", len(failures), "failures ===")
    for name, err in failures:
        print(" -", name, err)
    return 1 if failures else 0


if __name__ == "__main__":
    out = None
    if "--results" in sys.argv:
        out = pathlib.Path(sys.argv[sys.argv.index("--results") + 1])
    raise SystemExit(main(results_dir=out))
