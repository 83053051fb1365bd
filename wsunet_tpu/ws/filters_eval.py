"""Filter prediction-error evaluation (MAE + HILL-weighted MAE).

Parity: reference src/filters/evaluate.py:79-206 — per cover image, the
residual of the 9-tap filter prediction and its plain / lowest-HILL-decile
MAE, written in the results/prediction/filters.csv schema.  The conseal
dependency is replaced by the in-framework HILL kernel (ops/hill.py).
"""

import pathlib
import typing

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from ..data import iterate_batches, precovers
from ..ops import NAMED_FILTERS, filter_residuals, hill_cost
from ..ops.filters import taps_to_kernel2d


def _mae_wmae_batch(kernel2d):
    """Jitted per-image (mae, wmae) over a pixel batch.

    The wMAE decile threshold is a per-image order statistic; computed via
    a device-side sort (quantile with 'lower'-neighbor interpolation parity
    is handled by np.quantile's default linear mode on 510*510 points whose
    0.1-quantile index is integral, so jnp.quantile matches).
    """

    @jax.jit
    def step(pixels):
        x = pixels.astype(jnp.float32)
        resid = jnp.abs(filter_residuals(x, kernel2d))
        mae = jnp.mean(resid, axis=(1, 2))
        rho = hill_cost(x, wet_cost=1e10)[:, 1:-1, 1:-1]
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
        step = _mae_wmae_batch(kernel2d)
        cname = "".join(map(str, channel))
        df = precovers(input_dir, split=split, **order_kw)
        rows = []
        for batch in iterate_batches(input_dir, df, batch_size,
                                     threads=threads):
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
