"""Deterministic seeding helpers.

Parity notes
------------
``filename_to_image_seed`` reproduces the reference's per-image seed
derivation exactly (src/fabrika.py:276-291): sha256 of the file stem,
reduced mod 2**31, so deterministic pixel subsampling in analyses matches
the golden CSVs bit-for-bit.

``seed_everything`` is the JAX-native analogue of src/_defs/defs.py:37-44:
there is no global torch/cudnn state to pin — JAX PRNG is explicit — so we
seed python/numpy and return a root ``jax.random.PRNGKey``.
"""

import hashlib
import os
import pathlib
import random

import numpy as np


def filename_to_image_seed(filename) -> int:
    """Derive a deterministic 31-bit seed from a filename stem."""
    stem = pathlib.Path(filename).stem
    sha256 = hashlib.sha256(stem.encode("utf-8")).hexdigest()
    return int(sha256, base=16) % (2 ** 31)


def seed_everything(seed: int):
    """Seed python/numpy global RNGs and return a JAX PRNG key."""
    import jax

    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
