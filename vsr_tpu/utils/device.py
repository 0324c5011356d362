"""Device capability reporting.

The TPU-native answer to the reference's HardwareAccelerator probe
(backend/tools/hardware_accelerator.py:8-155): a singleton snapshot of the
JAX backend — platform, device kinds, device count, and per-device memory —
used for logging and for memory-adaptive chunk sizing (the analog of the
reference's free-VRAM-based clip_gap clamp, sttn_auto_inpaint.py:229-238).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import List, Optional


@dataclass
class DeviceInfo:
    platform: str
    device_kind: str
    num_devices: int
    memory_bytes: Optional[int]  # per device, None if unreported


class Accelerator:
    _instance = None
    _lock = threading.Lock()

    def __init__(self) -> None:
        import jax

        devices = jax.devices()
        first = devices[0]
        mem = None
        try:
            stats = first.memory_stats()
            if stats:
                mem = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        except Exception:
            pass
        self.info = DeviceInfo(
            platform=first.platform,
            device_kind=getattr(first, "device_kind", first.platform),
            num_devices=len(devices),
            memory_bytes=mem,
        )

    @classmethod
    def instance(cls) -> "Accelerator":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
        return cls._instance

    @property
    def name(self) -> str:
        return f"{self.info.device_kind} x{self.info.num_devices}"

    def is_accelerated(self) -> bool:
        return self.info.platform not in ("cpu",)

    def free_memory_bytes(self) -> Optional[int]:
        """Current free HBM on device 0, when the backend reports it."""
        import jax

        try:
            stats = jax.devices()[0].memory_stats()
            if stats and "bytes_limit" in stats and "bytes_in_use" in stats:
                return stats["bytes_limit"] - stats["bytes_in_use"]
        except Exception:
            pass
        return None

    def adaptive_clip_len(
        self, requested: int, frame_h: int, frame_w: int,
        bytes_per_pixel_frame: float = 24.0, minimum: int = 10,
    ) -> int:
        """Clamp a chunk length to what device memory supports (the
        reference's VRAM heuristic, scaled for bf16 activations)."""
        free = self.free_memory_bytes()
        if free is None:
            return requested
        per_frame = frame_h * frame_w * bytes_per_pixel_frame
        max_frames = int(free * 0.6 / max(per_frame, 1))
        return max(min(requested, max_frames), minimum)
