"""ROC / AUC / P_E builder.

Parity: reference src/ws/roc.py:198-283 — per (stego_method, model_name)
group: scores are clipped beta_hat (WS detectors) or softmax score (B0
detectors, identified by 'B0' in the name); labels y = alpha/2 > 0; manual
501-threshold sweep tau in reversed(linspace(0, 1, 501)); AUC from
fpr-bin-normalized tpr sums; P_E = min (1 - tpr + fpr)/2; operating points
at tau0 and tau = 0.5.

The threshold sweep is vectorized (501 x N broadcast instead of a python
loop) but numerically identical.
"""

import numpy as np
import pandas as pd

from .metrics import PMD5FPMeter, wAUCMeter


# the reference's threshold grid (src/ws/roc.py:236): shared with the
# bootstrap-CI module so the intervals are computed on the exact grid
# the published point estimates use
TAUS = np.linspace(0, 1, 501, endpoint=True)[::-1]


def iter_detector_groups(df_ws: pd.DataFrame):
    """(stego_method, model_name, group frame) triples — one per
    detector row of the published tables.  Each group holds that
    model's rows for the method plus ALL cover rows; shared by
    produce_roc and the CI module so they condition on identical
    data."""
    for (stego_method, model_name), _ in df_ws.groupby(
            ["stego_method", "model_name"]):
        if stego_method == "Cover":
            continue
        df_i = df_ws[df_ws["model_name"] == model_name]
        yield (stego_method, model_name,
               df_i[df_i["stego_method"].isin([stego_method, "Cover"])])


def _roc_curve_manual(y_hat: np.ndarray, y: np.ndarray):
    taus = TAUS
    pos = y > 0.0
    neg = ~pos
    above = y_hat[None, :] > taus[:, None]  # [501, N]
    TP = np.sum(above & pos[None, :], axis=1)
    FP = np.sum(above & neg[None, :], axis=1)
    FN = pos.sum() - TP
    TN = neg.sum() - FP
    tpr = TP / (TP + FN)
    fpr = FP / (FP + TN)
    return taus, tpr, fpr


def scores_and_labels(df_i: pd.DataFrame, model_name: str):
    """Detector scores + soft labels for one (method, model) group —
    the reference's convention (src/ws/roc.py:216-224): B0 detectors
    (identified by 'B0' in the name) score with their softmax column,
    WS detectors with clipped beta_hat; labels are alpha (B0) or
    alpha/2 (WS) so y > 0 marks stego rows either way."""
    if "B0" in model_name:
        return df_i["score"].to_numpy(), df_i["alpha"].to_numpy()
    return (np.clip(df_i["beta_hat"].to_numpy(), 0, None),
            df_i["alpha"].to_numpy() / 2)


def produce_roc(df_ws: pd.DataFrame) -> pd.DataFrame:
    """Build per-detector ROC tables from a sweep result frame."""
    out = []
    for stego_method, model_name, df_i in iter_detector_groups(df_ws):
        y_hat, y = scores_and_labels(df_i, model_name)

        taus, tpr, fpr = _roc_curve_manual(y_hat, y)

        bins = np.diff(fpr, prepend=fpr[0])
        bins_sum = bins.sum()
        if bins_sum > 0:
            bins = bins / bins_sum
            auc = np.sum(bins * tpr)
        elif len(np.unique(y > 0)) < 2:
            # single-class group (e.g. no cover rows selected): both the
            # reference formula and the rank AUC are undefined
            auc = float("nan")
        else:
            # The reference formula (ws/roc.py:198-283) is undefined when
            # the FPR never moves across the tau sweep — strictly-greater
            # thresholding never flags a cover whose clipped beta_hat is
            # exactly 0, so a detector that zeroes EVERY cover (perfect
            # separation) would report NaN.  Fall back to the tie-aware
            # rank statistic (Mann-Whitney), which the formula converges
            # to in non-degenerate cases.
            from sklearn.metrics import roc_auc_score
            auc = float(roc_auc_score((y > 0).astype(int), y_hat))
        tau0_idx = np.argmin((1 - tpr + fpr) / 2)
        p_e = ((1 - tpr + fpr) / 2)[tau0_idx]
        # operating point at tau = 0.5
        pos, neg = y > 0.0, y <= 0.0
        TP = np.sum((y_hat > .5) & pos)
        FP = np.sum((y_hat > .5) & neg)
        TN = np.sum((y_hat <= .5) & neg)
        FN = np.sum((y_hat <= .5) & pos)
        fpr50, tpr50 = FP / (FP + TN), TP / (TP + FN)

        # training-time meter statistics surfaced in the report
        # (reference computed these only during training,
        # _defs/metrics.py:228-246,276-304)
        wauc_m, pmd_m = wAUCMeter(), PMD5FPMeter()
        wauc_m.update((y > 0).astype(int), y_hat)
        pmd_m.update((y > 0).astype(int), y_hat)
        wauc, pmd5fp = wauc_m.avg, pmd_m.avg

        label = model_name if "B0" in model_name else f"WS-{model_name}"
        out.append(pd.DataFrame({
            "stego_method": stego_method,
            "model_name": model_name,
            "tau": taus,
            "tpr": tpr,
            "fpr": fpr,
            "p_e": p_e,
            "tau0": taus[tau0_idx],
            "fpr_tau0": fpr[tau0_idx],
            "tpr_tau0": tpr[tau0_idx],
            "auc": auc,
            "fpr_50": fpr50,
            "tpr_50": tpr50,
            "wauc": wauc,
            "pmd_5fp": pmd5fp,
            "label": label,
        }))
    return pd.concat(out)
