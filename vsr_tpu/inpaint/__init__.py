from vsr_tpu.inpaint.engine import STTNWindowEngine, build_window_index
from vsr_tpu.inpaint.sttn_auto import STTNAutoInpainter

__all__ = ["STTNWindowEngine", "build_window_index", "STTNAutoInpainter"]
