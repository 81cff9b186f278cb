"""alego_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the full A-LeGO-LOAM pipeline
(reference: jyakaranda/A-LeGO-LOAM, C++/ROS1): range-image projection, ground
removal, cloud segmentation, corner/surf feature extraction, two-step
scan-to-scan odometry, scan-to-map matching, and an ICP loop-closure pose
graph — every stage a jit-compiled function over fixed-shape arrays.
"""

from .config import PipelineConfig, LaserType, DEFAULT_CONFIG, tiny_config

__version__ = "0.1.0"

__all__ = [
    "PipelineConfig",
    "LaserType",
    "DEFAULT_CONFIG",
    "tiny_config",
]
