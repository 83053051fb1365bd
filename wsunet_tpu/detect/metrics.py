"""Metric meters for training/evaluation.

Parity: reference src/_defs/metrics.py — streaming AverageMeter family and
the accumulate-all PerformanceMeter family (Accuracy, Misclassification,
Precision, Recall, P_E, P_MD@5%FP, AUC, weighted AUC, PredictionWriter),
plus the ProgressMeter formatter.  Formulas ported 1:1 (sklearn ROC with
drop_intermediate=False, min over positive P for P_E, the ALASKA-style
two-segment weighted AUC normalization, unet-variant WS meter with 1-px
border crop).
"""

from enum import Enum

import numpy as np
from sklearn import metrics as _skm


class Summary(Enum):
    NONE = 0
    AVERAGE = 1
    SUM = 2
    COUNT = 3


class AverageMeter:
    """Streaming average (parity: metrics.py:19-61)."""

    name = None

    def __init__(self, fmt=":.5f", summary_type=Summary.AVERAGE):
        self.fmt = fmt
        self.summary_type = summary_type
        self.reset()

    def reset(self):
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def update_vector(self, vals):
        vals = np.asarray(vals)
        self.sum += np.nansum(vals)
        self.count += vals.shape[0]
        self.avg = self.sum / self.count

    def __str__(self):
        if self.summary_type is Summary.NONE:
            return ""
        field = {Summary.AVERAGE: "avg", Summary.SUM: "sum",
                 Summary.COUNT: "count"}[self.summary_type]
        return f"{self.name} {getattr(self, field):.3f}"


class LossMeter(AverageMeter):
    name = "loss"


class MAEMeter(AverageMeter):
    """Masked mean absolute error (parity: metrics.py:64-88)."""

    name = "mae"

    def __init__(self, *args, multiplier: int = 1, masked: bool = None, **kw):
        super().__init__(*args, **kw)
        self.multiplier = multiplier
        self.masked = masked

    def update(self, y_true, y_pred, mask=None):
        if self.masked is True:
            y_true, y_pred = y_true[mask], y_pred[mask]
        elif self.masked is False:
            y_true, y_pred = y_true[~mask], y_pred[~mask]
        resid = (np.asarray(y_true) - np.asarray(y_pred)) * self.multiplier
        super().update(np.nanmean(np.abs(resid)))


class CorrMeter(AverageMeter):
    """Normalized residual-prediction correlation (parity:
    metrics.py:91-113)."""

    name = "corr"

    def update(self, y_true, y_pred):
        y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
        dhat = y_pred - y_true
        a = {"axis": tuple(range(1, y_pred.ndim))}
        dn = (dhat - dhat.mean(**a, keepdims=True)) / dhat.std(**a, keepdims=True)
        pn = (y_pred - y_pred.mean(**a, keepdims=True)) / y_pred.std(**a, keepdims=True)
        corr = np.sum(dn * pn, **a) / (np.prod(y_pred.shape[1:]) - 1)
        super().update_vector(np.abs(corr))


class WSMeter(AverageMeter):
    """beta_hat MAE on [B, H, W, C] batches in [0, 1]
    (parity: metrics.py:116-142 — 1-px border crop, round-then-XOR)."""

    name = "ws"

    def update(self, x, x_hat, alphas):
        x = np.asarray(x)[:, 1:-1, 1:-1] * 255.0
        x_hat = np.asarray(x_hat)[:, 1:-1, 1:-1] * 255.0
        x_bar = np.round(x).astype("int") ^ 1
        weights = np.ones_like(x) / np.prod(x.shape[1:])
        axes = tuple(range(1, x.ndim))
        betas_hat = np.sum(weights * (x - x_bar) * (x - x_hat), axis=axes)
        betas_hat = np.clip(betas_hat, 0, None)
        betas = np.asarray(alphas) / 2.0
        super().update(np.mean(np.abs(betas_hat - betas)))


class PerformanceMeter:
    """Accumulate-all meter base (parity: metrics.py:145-169)."""

    name = None

    def __init__(self, fmt=":4.3f"):
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.y_pred = np.array([])
        self.y_true = np.array([])

    def update(self, y_true, y_pred):
        self.y_pred = np.concatenate((self.y_pred, np.asarray(y_pred)))
        self.y_true = np.concatenate((self.y_true, np.asarray(y_true)))

    @property
    def avg(self):
        raise NotImplementedError

    def __str__(self):
        return f"{self.name}: {self.avg:4.3f}"

    def to_dict(self):
        return {self.name: self.avg}


class AccuracyMeter(PerformanceMeter):
    name = "accuracy"

    @property
    def avg(self):
        return np.mean(self.y_pred == self.y_true)


class MisclassificationMeter(PerformanceMeter):
    name = "misclassification"

    @property
    def avg(self):
        return np.mean(self.y_pred != self.y_true)


class PrecisionMeter(PerformanceMeter):
    name = "precision"

    @property
    def avg(self):
        return ((self.y_pred == 1) & (self.y_true == 1)).sum() / (self.y_pred == 1).sum()


class RecallMeter(PerformanceMeter):
    name = "recall"

    @property
    def avg(self):
        return ((self.y_pred == 1) & (self.y_true == 1)).sum() / (self.y_true == 1).sum()


class PEMeter(PerformanceMeter):
    """Minimum-error P_E from the ROC (parity: metrics.py:204-225)."""

    name = "p_e"

    @property
    def avg(self):
        fpr, tpr, _ = _skm.roc_curve(
            self.y_true, self.y_pred, pos_label=1, drop_intermediate=False)
        if np.isnan(fpr).any() or np.isnan(tpr).any():
            return np.nan
        P = 0.5 * (fpr + (1 - tpr))
        return min(P[P > 0])


class PMD5FPMeter(PerformanceMeter):
    """Missed detection at 5% FPR (parity: metrics.py:228-246)."""

    name = "p_md^5fp"

    @property
    def avg(self):
        fpr, tpr, _ = _skm.roc_curve(
            self.y_true, self.y_pred, pos_label=1, drop_intermediate=False)
        tau_idx = np.argmax(fpr > .05)
        if fpr[tau_idx] > .05:
            tau_idx -= 1
        return 1 - tpr[tau_idx]


class AUCMeter(PerformanceMeter):
    name = "auc"

    @property
    def avg(self):
        return _skm.roc_auc_score(self.y_true, self.y_pred)


class wAUCMeter(PerformanceMeter):
    """ALASKA-style weighted AUC (parity: metrics.py:276-304)."""

    name = "wauc"

    @property
    def avg(self):
        fpr, tpr, _ = _skm.roc_curve(
            self.y_true, self.y_pred, pos_label=1, drop_intermediate=False)
        if np.isnan(fpr).any() or np.isnan(tpr).any():
            return np.nan
        idx = np.argmin(tpr < .4)
        alpha_beta_p4 = fpr[idx]
        if idx < 2 or len(fpr) - idx < 2:
            # degenerate split: sklearn.metrics.auc needs >=2 points per
            # segment. The reference meter raises here (metrics.py:297-298
            # via sklearn); reachable only on tiny eval sets (per-fold
            # holdout ROCs), where the weighted AUC is undefined — report
            # NaN like the meter's existing NaN-input branch.
            return np.nan
        aucA = _skm.auc(fpr[:idx], tpr[:idx])
        aucB = _skm.auc(fpr[idx:], tpr[idx:])
        return (aucA * 2 + aucB) / (1 + alpha_beta_p4)


class PredictionWriter(PerformanceMeter):
    """CSV dump of accumulated scores (parity: metrics.py:249-265)."""

    def __init__(self):
        super().__init__(fmt=None)

    @property
    def avg(self):
        raise RuntimeError("prediction writer has no value")

    def write(self, path):
        with open(path, "w") as fp:
            fp.write("y_true,y_pred\n")
            for t, p in zip(self.y_true, self.y_pred):
                fp.write(f"{t},{p}\n")

    def __str__(self):
        raise RuntimeError("prediction writer cannot be printed")


class ProgressMeter:
    """Batch-progress line formatter (parity: metrics.py:365-379)."""

    def __init__(self, num_batches, meters, prefix=""):
        num_digits = len(str(num_batches // 1))
        fmt = "{:" + str(num_digits) + "d}"
        self.batch_fmtstr = "[" + fmt + "/" + fmt.format(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def to_str(self, batch):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        return "\t".join(entries)
