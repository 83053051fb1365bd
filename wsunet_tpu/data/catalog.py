"""Dataset catalog — the TPU-native replacement for the reference "fabrika".

The reference (src/fabrika.py:28-273) wraps a per-image callback into a
dataset sweep dispatched serially or over a joblib process pool.  Here the
catalog is *data only*: it produces a pandas DataFrame of selected rows
(same predicates, same sort order, same metadata columns), and the batched
pipeline (wsunet_tpu.data.pipeline) turns rows into padded device arrays.
Per-image python callbacks never appear on the hot path.

Predicate parity (reference line refs):
- precovers:            fabrika.py:133-154 (demosaic filter, stego/quality NaN)
- covers (jpeg):        fabrika.py:157-172 (quality / samp_factor)
- stego_spatial:        fabrika.py:175-205
- cover_stego pairing:  fabrika.py:208-273 (merge by stem, sort by stem)
- sort/shuffle/take:    fabrika.py:73-79

Additionally fixes the reference's case-sensitivity hazard: files.csv rows
say ``stego_LSBR_...`` while directories on disk are ``stego_LSBr_...``
(works only on case-insensitive filesystems).  ``resolve_path`` matches
path components case-insensitively.
"""

import glob
import pathlib
import typing

import pandas as pd


def resolve_path(root: pathlib.Path, name: str) -> pathlib.Path:
    """Resolve ``root/name``, matching components case-insensitively.

    Fixes the LSBr/LSBR mismatch between files.csv entries and on-disk
    directory names in the reference fixture set.
    """
    path = pathlib.Path(root) / name
    if path.exists():
        return path
    cur = pathlib.Path(root)
    for part in pathlib.Path(name).parts:
        nxt = cur / part
        if not nxt.exists() and cur.is_dir():
            matches = [p for p in cur.iterdir() if p.name.lower() == part.lower()]
            if len(matches) == 1:
                nxt = matches[0]
        cur = nxt
    # a truly-missing component resolves to the literal join so callers
    # (the batched decode path) can treat it as a per-image read failure
    return cur


def collect_files(
    dataset: pathlib.Path,
    patterns: typing.Sequence[str],
    split: str = None,
    ignore_missing: bool = False,
) -> pd.DataFrame:
    """Gather files.csv rows under ``dataset`` for the given glob patterns,
    or read a split CSV (parity: fabrika.py:49-64)."""
    dataset = pathlib.Path(dataset)
    if split is not None:
        return pd.read_csv(dataset / split, dtype={"device": str})
    frames = []
    for pattern in patterns:
        for path in glob.glob(str(dataset / pattern)):
            try:
                frames.append(pd.read_csv(pathlib.Path(path) / "files.csv"))
            except Exception:
                if not ignore_missing:
                    raise
    if not frames:
        raise FileNotFoundError(
            f"no files.csv found under {dataset} for patterns {patterns}")
    return pd.concat(frames)


def order_rows(
    df: pd.DataFrame,
    shuffle_seed: int = None,
    skip_num_images: int = None,
    take_num_images: int = None,
) -> pd.DataFrame:
    """Deterministic sort-by-name then optional shuffle/skip/take
    (parity: fabrika.py:73-79)."""
    df = df.sort_values("name").reset_index(drop=True)
    if shuffle_seed is not None:  # seed 0 is a valid shuffle seed
        df = df.sample(frac=1.0, random_state=shuffle_seed)
    if skip_num_images is not None:
        df = df[skip_num_images:]
    if take_num_images is not None:
        df = df[:take_num_images]
    return df


def _filter_demosaic(df: pd.DataFrame, demosaic) -> pd.DataFrame:
    if demosaic is None:
        return df
    if isinstance(demosaic, str):
        return df[df["demosaic"] == demosaic]
    return df[df["demosaic"].isin(demosaic)]


def precovers(
    dataset: pathlib.Path,
    demosaic=None,
    split: str = None,
    ignore_missing: bool = False,
    **order_kw,
) -> pd.DataFrame:
    """Uncompressed cover images (parity: fabrika.precovers)."""
    df = collect_files(dataset, ["images*"], split=split,
                       ignore_missing=ignore_missing)
    df = _filter_demosaic(df, demosaic)
    if "stego_method" in df:
        df = df[df["stego_method"].isna()]
    if "quality" in df:
        df = df[df["quality"].isna()]
    return order_rows(df, **order_kw)


def covers(
    dataset: pathlib.Path,
    quality: int = None,
    samp_factor: str = None,
    split: str = None,
    ignore_missing: bool = False,
    **order_kw,
) -> pd.DataFrame:
    """JPEG cover images (parity: fabrika.covers)."""
    df = collect_files(dataset, ["jpegs*"], split=split,
                       ignore_missing=ignore_missing)
    if quality is not None:
        df = df[df["quality"] == f"q{quality}"]
    if samp_factor is not None:
        df = df[df["samp_factor"] == samp_factor]
    return order_rows(df, **order_kw)


def stego_spatial(
    dataset: pathlib.Path,
    stego_method: str = None,
    alpha: float = None,
    color_strategy: str = None,
    simulator: str = None,
    demosaic=None,
    split: str = None,
    ignore_missing: bool = False,
    **order_kw,
) -> pd.DataFrame:
    """Spatial-domain stego images (parity: fabrika.stego_spatial)."""
    df = collect_files(dataset, ["stego*"], split=split,
                       ignore_missing=ignore_missing)
    df = _filter_demosaic(df, demosaic)
    if stego_method is not None:
        df = df[df["stego_method"] == stego_method]
    if alpha is not None:
        df = df[df["alpha"] == alpha]
    if color_strategy is not None:
        df = df[df["color_strategy"] == color_strategy]
    if simulator is not None:
        df = df[df["simulator"] == simulator]
    if "quality" in df:
        df = df[df["quality"].isna()]
    return order_rows(df, **order_kw)


def cover_stego_pairs(
    dataset: pathlib.Path,
    stego_method: str = None,
    alpha: float = None,
    color_strategy: str = None,
    simulator: str = None,
    demosaic=None,
    split: str = None,
    ignore_missing: bool = False,
    **order_kw,
) -> pd.DataFrame:
    """Cover-stego pairs joined by filename stem (parity:
    fabrika.cover_stego_spatial, incl. the post-sort by stem)."""
    df = collect_files(dataset, ["images*", "stego*"], split=split,
                       ignore_missing=ignore_missing)
    df = _filter_demosaic(df, demosaic)
    if "quality" in df:
        df = df[df["quality"].isna()]

    df_c = df[df["stego_method"].isna()].copy()
    df_s = df[~df["stego_method"].isna()].copy()
    if stego_method is not None:
        df_s = df_s[df_s["stego_method"] == stego_method]
    if alpha is not None:
        df_s = df_s[df_s["alpha"] == alpha]
    if color_strategy is not None:
        df_s = df_s[df_s["color_strategy"] == color_strategy]
    if simulator is not None:
        df_s = df_s[df_s["simulator"] == simulator]

    df_c["stem"] = df_c["name"].apply(lambda f: pathlib.Path(f).stem)
    df_s["stem"] = df_s["name"].apply(lambda f: pathlib.Path(f).stem)
    df = df_c.merge(df_s, how="left", on=["stem"], suffixes=("_c", "_s"))
    df["name"] = df["name_c"]
    df = order_rows(df.drop("stem", axis=1), **order_kw)
    # post_fn parity: sort by stem of the cover name
    df["stem"] = df["name_c"].apply(lambda f: pathlib.Path(f).stem)
    df = df.sort_values(["stem", "name_c"]).drop("stem", axis=1)
    return df
