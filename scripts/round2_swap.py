"""Swap winning round-2 staged models (models_r2/) into the zoo (models/).

For each staged run named on the command line, copies the experiment dir
into models/<family>/<method>/, removes any pre-existing run in that
method dir with the SAME registry signature (so the unique-match rule
keeps holding), and slims the copied checkpoint (drops optimizer state +
'latest') via scripts/export_demo_models.export.

Usage:
    python scripts/round2_swap.py b0 LSBR <run_name> [<run_name> ...]
    python scripts/round2_swap.py unet LSBR <run_name>
"""
import json
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.export_demo_models import export  # noqa: E402


def signature(cfg: dict, family: str):
    if family == "b0":
        return (cfg.get("no_stem_stride", False),
                cfg.get("lsbr_reference", False))
    return (cfg.get("loss"), cfg.get("drop_rate"))


def swap(family: str, method: str, run_name: str):
    src = REPO / "models_r2" / family / method / run_name
    dst_root = REPO / "models" / family / method
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
    family, method, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    for name in names:
        swap(family, method, name)
    export(REPO / "models" / family)
