"""Stage 1: raw scan -> segmented ring-major cloud (C8/C9 equivalent).

Composition of the projection and segmentation kernels; one jittable function
standing in for the whole ``IP`` node (``/root/reference/src/IP.cpp:106-304``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops.projection import project_scan
from ..ops.segmentation import segment_scan, SegmentedScan


def image_projection(points: jnp.ndarray, mask: jnp.ndarray,
                     cfg: PipelineConfig) -> SegmentedScan:
    """points [N, 3] padded raw scan + validity mask -> SegmentedScan."""
    img = project_scan(points, mask, cfg)
    return segment_scan(img, cfg)
