"""wsunet_tpu — TPU-native weighted-stego (WS) steganalysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
uibk-uncover/ws-unet (reference layout documented in SURVEY.md):

- spatial-domain LSB-replacement steganalysis via the WS estimator,
- classic linear pixel predictors (KB/AVG filters) and a learned U-Net
  cover-pixel predictor,
- an EfficientNet-B0 binary detector baseline,
- ROC / AUC / P_E evaluation and side analyses (error boxes, correlation,
  contours, saliency).

Unlike the reference (per-image CPU callbacks fanned out with joblib), every
compute path here is batched, jitted and mesh-shardable: images stream
HBM-resident through fused Pallas kernels / XLA convs, and multi-chip
scaling rides a ``jax.sharding.Mesh`` — batch data-parallelism as the
primary axis plus spatial sharding of the image grid (manual ppermute
halo exchange for WS, XLA auto-partitioned convs) as the second.
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
