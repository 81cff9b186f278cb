"""alego_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the full A-LeGO-LOAM pipeline
(reference: jyakaranda/A-LeGO-LOAM, C++/ROS1): range-image projection, ground
removal, cloud segmentation, corner/surf feature extraction, two-step
scan-to-scan odometry, scan-to-map matching, and an ICP loop-closure pose
graph — every stage a jit-compiled function over fixed-shape arrays.
"""

import jax as _jax

# Geometry math must be f32-accurate: TPU matmuls default to bf16 products,
# and the KNN distance matrices / Kabsch covariances contract map-frame
# coordinates (~1e2 m) where bf16's 2^-8 relative error is METERS of
# squared-distance noise — measured as loop-ICP fitness diverging across
# iterations (0.25 -> 0.44) and 4x ATE spread between CPU and TPU runs of
# the same program.  Every matmul in this package has a tiny contraction
# dim (3 or 6), so MXU passes are not where the time goes; force f32.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import PipelineConfig, LaserType, DEFAULT_CONFIG, tiny_config

__version__ = "0.1.0"

__all__ = [
    "PipelineConfig",
    "LaserType",
    "DEFAULT_CONFIG",
    "tiny_config",
]
