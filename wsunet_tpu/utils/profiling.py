"""Tracing / profiling / debugging aids.

The reference has none of these (SURVEY.md §5.1-5.2: tqdm bars only).
TPU-native equivalents:

- ``profile(...)``: context manager around ``jax.profiler`` writing an
  XPlane trace viewable in TensorBoard / xprof; every CLI command accepts
  ``WSUNET_PROFILE=<dir>`` to wrap its run.
- ``nan_check()``: enables jax_debug_nans — the functional-purity analogue
  of a race/sanitizer pass: any NaN produced inside a jitted computation
  raises at the producing op.
- ``log_compiles()``: surface recompilations (the silent perf killer on
  TPU: a shape/dtype drift recompiles the step).
"""

import contextlib
import os

import jax


@contextlib.contextmanager
def profile(log_dir: str = None):
    """Trace device execution to ``log_dir`` (TensorBoard-compatible)."""
    log_dir = log_dir or os.environ.get("WSUNET_PROFILE")
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_check(enable: bool = True):
    """Raise on NaNs produced inside jitted computations."""
    if not enable:
        yield
        return
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


@contextlib.contextmanager
def log_compiles(enable: bool = True):
    """Log every XLA compilation (recompile spotting)."""
    old = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", enable)
    try:
        yield
    finally:
        jax.config.update("jax_log_compiles", old)
