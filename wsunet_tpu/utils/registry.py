"""Experiment/model registry.

The reference treats the experiment-dir tree (config.json beside
checkpoints) as a queryable model registry
(src/unet/evaluate.py:55-105, src/detector/evaluate.py:100-166).
Same convention here: ``<model_dir>/<stego_method>/<run_name>/config.json``
plus ``model/best``.
"""

import glob
import json
import pathlib
import typing

import pandas as pd

from .errors import UserError


def scan_models(
    model_dir: pathlib.Path,
    stego_method: str,
) -> pd.DataFrame:
    """Collect config rows for experiments that have a best checkpoint."""
    model_path = pathlib.Path(model_dir) / stego_method
    rows = []
    for cfg_file in map(pathlib.Path, glob.glob(str(model_path / "*" / "config.json"))):
        with open(cfg_file) as f:
            config = json.load(f)
        if config.get("debug", False):
            continue
        if not (cfg_file.parent / "model" / "best").exists():
            continue
        alpha = config.get("alpha")
        if isinstance(alpha, (list, tuple)):  # rate-mixture run
            alpha = "mix" + "-".join(str(a) for a in alpha)
        elif alpha:
            alpha = float(alpha)
        rows.append({
            "model_name": cfg_file.parent.name,
            "stego_method": config.get("stego_method"),
            "alpha": alpha,
            "loss": config.get("loss"),
            "network": config.get("network"),
            "drop_rate": config.get("drop_rate"),
            "lsbr_reference": config.get("lsbr_reference", False),
            "no_stem_stride": config.get("no_stem_stride", False),
        })
    return pd.DataFrame(rows)


def get_model_name(
    model_dir: pathlib.Path,
    stego_method: str,
    **filters: typing.Any,
) -> str:
    """Return the unique experiment name matching the filters.

    Parity: raises when zero or multiple models match, exactly as
    unet/evaluate.py:101-105 / detector/evaluate.py:162-166.
    """
    df = scan_models(model_dir, stego_method)
    if len(df):
        df = df[df.stego_method == stego_method]
        for key, value in filters.items():
            if value is None:
                df = df[df[key].isna()]
            else:
                df = df[df[key] == value]
    if len(df) < 1:
        raise UserError(f"no model for {stego_method=} {filters} found")
    if len(df) > 1:
        raise UserError(f"multiple models for {stego_method=} {filters} found")
    return df["model_name"].iloc[0]
