"""Swap winning round-3 staged models (models_r3/) into the committed
zoos: fold-A models into models/ (the primary registry), fold-B models
into models_foldb/ (consumed only by the holdout protocol,
scripts/round3_holdout.py).

Same rules as round2_swap: a swapped run replaces any existing run with
the same registry signature in its destination method dir (keeps the
unique-match rule), and checkpoints are slimmed (optimizer state +
'latest' dropped).

Usage:
    python scripts/round3_swap.py a b0 LSBR <run_name> [...]
    python scripts/round3_swap.py b unet LSBR <run_name>
"""
import json
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.export_demo_models import export          # noqa: E402
from scripts.round2_swap import signature              # noqa: E402

DST = {"a": "models", "b": "models_foldb"}


def swap(fold: str, family: str, method: str, run_name: str):
    src = REPO / "models_r3" / family / method / run_name
    dst_root = REPO / DST[fold] / family / method
    assert (src / "config.json").exists(), f"no staged run at {src}"
    with open(src / "config.json") as f:
        sig = signature(json.load(f), family)
    dst_root.mkdir(parents=True, exist_ok=True)
    for old_cfg in dst_root.glob("*/config.json"):
        with open(old_cfg) as f:
            if signature(json.load(f), family) == sig:
                print(f"remove superseded: {old_cfg.parent}")
                shutil.rmtree(old_cfg.parent)
    dst = dst_root / run_name
    if dst.exists():
        shutil.rmtree(dst)
    print(f"copy {src} -> {dst}")
    shutil.copytree(src, dst)


if __name__ == "__main__":
    fold, family, method, names = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:])
    for name in names:
        swap(fold, family, method, name)
    export(REPO / DST[fold] / family)
