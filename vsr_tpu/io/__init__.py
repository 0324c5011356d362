from vsr_tpu.io.video import (
    FramePrefetcher,
    VideoReader,
    VideoWriter,
    read_video_info,
)
from vsr_tpu.io.ffmpeg import find_ffmpeg
from vsr_tpu.io.audio import merge_audio_to_video

__all__ = [
    "FramePrefetcher",
    "VideoReader",
    "VideoWriter",
    "read_video_info",
    "find_ffmpeg",
    "merge_audio_to_video",
]
