"""Filter prediction-error evaluation (MAE + HILL-weighted MAE).

Parity: reference src/filters/evaluate.py:79-206 — per cover image, the
residual of the 9-tap filter prediction and its plain / lowest-HILL-decile
MAE, written in the results/prediction/filters.csv schema.  The conseal
dependency is replaced by the in-framework HILL kernel (ops/hill.py).

Color routing: a channel tuple selecting R/G/B (0-2) reads the 4-channel
[R,G,B,Y] stack and evaluates on that plane; channel 3 keeps the
single-decode luminance fast path.  The ``inbayer`` option reproduces the
reference's Bayer-phase subsampling (_defs/filters.py:44-50: phase digit
'0' crops one ring then steps by two, '1' steps from the first interior
pixel), applied to the residual and cost maps.
"""

import pathlib
import typing

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from ..data import iterate_batches, precovers
from ..io.imread import imread4_u8, imread_gray_u8
from ..ops import NAMED_FILTERS, filter_residuals, hill_cost
from ..ops.filters import taps_to_kernel2d


def bayer_slices(inbayer: str):
    """Valid-grid slices implementing the reference's Bayer-phase
    subsample.  In center coordinates the reference keeps rows
    2,4,... (digit '0') or 1,3,... (digit '1'); on the [H-2, W-2] valid
    residual grid that is [1:-1:2] and [::2] respectively."""
    if not inbayer:
        return slice(None), slice(None)

    def ax(digit):
        return slice(1, -1, 2) if digit == "0" else slice(None, None, 2)

    return ax(inbayer[0]), ax(inbayer[1])


def _mae_wmae_batch(kernel2d, channel: int = None, inbayer: str = None):
    """Jitted per-image (mae, wmae) over a pixel batch.

    The wMAE decile threshold is a per-image order statistic; computed via
    a device-side sort (jnp.quantile's linear interpolation matches
    np.quantile, the reference's mode).
    """
    s1, s2 = bayer_slices(inbayer)

    @jax.jit
    def step(pixels):
        x = pixels.astype(jnp.float32)
        if x.ndim == 4:
            x = x[..., channel if channel is not None else 3]
        resid = jnp.abs(filter_residuals(x, kernel2d))[:, s1, s2]
        mae = jnp.mean(resid, axis=(1, 2))
        rho = hill_cost(x, wet_cost=1e10)[:, 1:-1, 1:-1][:, s1, s2]
        B = rho.shape[0]
        q = jnp.quantile(rho.reshape(B, -1), 0.1, axis=1)
        sel = rho <= q[:, None, None]
        wmae = (jnp.sum(resid * sel, axis=(1, 2))
                / jnp.sum(sel, axis=(1, 2)))
        return mae, wmae

    return step


def run(
    input_dir: pathlib.Path,
    filter_names: typing.Sequence[str] = ("AVG", "KB"),
    channels: typing.Sequence[typing.Tuple[int, ...]] = ((3,), (3,)),
    inbayer: str = None,
    batch_size: int = 8,
    threads: int = 8,
    split: str = None,
    **order_kw,
) -> pd.DataFrame:
    """Evaluate each (filter, channel) pair over all precovers
    (parity: filters/evaluate.py:149-179 + __main__ schema)."""
    frames = []
    for channel, filter_name in zip(channels, filter_names):
        kernel2d = taps_to_kernel2d(NAMED_FILTERS[filter_name])
        c = channel[0]
        reader = imread_gray_u8 if c == 3 else imread4_u8
        step = _mae_wmae_batch(kernel2d, channel=c, inbayer=inbayer)
        cname = "".join(map(str, channel))
        df = precovers(input_dir, split=split, **order_kw)
        rows = []
        for batch in iterate_batches(input_dir, df, batch_size,
                                     reader=reader, threads=threads,
                                     prefetch=2, cache=True,
                                     device_cache=True):
            mae, wmae = step(jnp.asarray(batch.pixels))
            mae, wmae = np.asarray(mae), np.asarray(wmae)
            for i, (_, row) in enumerate(batch.rows.iterrows()):
                if not batch.mask[i]:
                    continue
                rows.append({
                    "fname": str(pathlib.Path(input_dir) / row["name"]),
                    f"mae_{cname}_{filter_name}": mae[i],
                    f"wmae_{cname}_{filter_name}": wmae[i],
                    **row.to_dict(),
                })
        frames.append(pd.DataFrame(rows))
    return pd.concat(frames).reset_index(drop=True)
