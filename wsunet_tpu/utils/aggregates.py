"""Named pandas aggregators (parity: reference src/_defs/defs.py:77-92)."""


def quantile(n):
    def q_(x):
        return x.quantile(n)

    q_.__name__ = f"q_{n * 100:.0f}"
    return q_


def iqr_interval(n, sign=1):
    def iqr(x):
        return x.quantile(.75) - x.quantile(.25)

    def iqr_interval_(x):
        return (x.quantile(n) + sign * iqr(x)).clip(x.min(), x.max())

    iqr_interval_.__name__ = f"q_{n * 100:.0f}_iqr"
    return iqr_interval_
