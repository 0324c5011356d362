from vsr_tpu.scenes.content import (
    ContentDetectorParams,
    detect_scene_cuts,
    get_scene_div_frame_no,
)

__all__ = ["ContentDetectorParams", "detect_scene_cuts", "get_scene_div_frame_no"]
