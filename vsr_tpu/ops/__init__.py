from vsr_tpu.ops.upsample import upsample_bilinear_2x_align_corners
from vsr_tpu.ops.patch_attention import multi_scale_patch_attention

__all__ = [
    "upsample_bilinear_2x_align_corners",
    "multi_scale_patch_attention",
]
