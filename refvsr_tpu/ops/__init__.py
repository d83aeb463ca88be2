from refvsr_tpu.ops.resize import resize, avg_pool_2x2
from refvsr_tpu.ops.warp import warp, flow_warp
from refvsr_tpu.ops.patches import (
    extract_patches, fold_non_overlapping, gather_patches, same_pad_reflect)
from refvsr_tpu.ops.image import (
    pixel_shuffle, refine_to_multiple, gaussian_lowpass, clamp01)

__all__ = [
    "resize", "avg_pool_2x2", "warp", "flow_warp",
    "extract_patches", "fold_non_overlapping", "gather_patches",
    "same_pad_reflect", "pixel_shuffle", "refine_to_multiple",
    "gaussian_lowpass", "clamp01",
]
