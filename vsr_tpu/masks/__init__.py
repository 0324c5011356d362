from vsr_tpu.masks.mask import create_mask
from vsr_tpu.masks.solver import get_inpaint_area_by_mask
from vsr_tpu.masks.intervals import (
    batch_generator,
    expand_frame_ranges,
    filter_and_merge_intervals,
    find_continuous_ranges,
    find_continuous_ranges_with_same_mask,
    is_frame_number_in_ab_sections,
    split_range_by_scene,
    unify_regions,
)

__all__ = [
    "create_mask",
    "get_inpaint_area_by_mask",
    "batch_generator",
    "expand_frame_ranges",
    "filter_and_merge_intervals",
    "find_continuous_ranges",
    "find_continuous_ranges_with_same_mask",
    "is_frame_number_in_ab_sections",
    "split_range_by_scene",
    "unify_regions",
]
