"""PP-OCRv5 DBNet text detectors in flax — the TPU replacement for the
reference's Paddle-runtime det models (backend/tools/subtitle_detect.py:41-54,
configs backend/models/V5/ch_det*/inference.yml, selection in
backend/tools/model_config.py:17-23).

These are the *exact* PP-OCRv5 graphs (weight-level reconstructions of the
public PaddleOCR architecture), so converted reference checkpoints reproduce
reference probability maps:

  * preset "server" — PP-OCRv5_server_det:
      PPHGNetV2-B4 (det) -> LKPAN(256, mode=large, intracl) ->
      PFHeadLocal(mode=large)
  * preset "mobile" — PP-OCRv5_mobile_det:
      PPLCNetV3(scale=0.75, det) -> RSEFPN(96, shortcut) ->
      PFHeadLocal(mode=small)

Contract (unchanged from round 1): BGR image, ImageNet normalization,
resize_long=960 buckets (detect/preprocess.py), probability map in [0,1] at
input resolution, DBPostProcess thresh=0.3/box_thresh=0.6/unclip_ratio=1.5
(detect/postprocess.py).

``backbone_override``/``fpn_channels`` shrink the graph for unit tests; the
defaults are the production programs the Paddle converter maps onto
(convert/paddle_dbnet.py, tests/test_convert_dbnet.py).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vsr_tpu.detect.backbones import PPHGNetV2B4, PPLCNetV3
from vsr_tpu.detect.heads import PFHeadLocal
from vsr_tpu.detect.necks import LKPAN, RSEFPN


class DBNet(nn.Module):
    preset: str = "server"  # "server" | "mobile"
    fpn_channels: Optional[int] = None  # default: 256 server / 96 mobile
    k: float = 50.0  # DB steepness (training)
    lcnet_scale: float = 0.75
    hg_stages: Optional[Tuple[Tuple, ...]] = None  # test-size override
    dtype: Any = jnp.float32

    def setup(self):
        if self.preset == "server":
            nc = self.fpn_channels or 256
            self.backbone = PPHGNetV2B4(
                dtype=self.dtype, stages_override=self.hg_stages)
            self.neck = LKPAN(nc, intracl=True, dtype=self.dtype)
            self.head = PFHeadLocal(nc, mode="large", k=self.k,
                                    dtype=self.dtype)
        elif self.preset == "mobile":
            nc = self.fpn_channels or 96
            self.backbone = PPLCNetV3(self.lcnet_scale, dtype=self.dtype)
            self.neck = RSEFPN(nc, shortcut=True, dtype=self.dtype)
            self.head = PFHeadLocal(nc, mode="small", k=self.k,
                                    dtype=self.dtype)
        else:
            raise ValueError(f"unknown DBNet preset: {self.preset}")

    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images: [B, H, W, 3] normalized, H and W multiples of 32.

        Returns the probability map [B, H, W, 1]; in train mode also the
        base/calibration/threshold/approx-binary maps (heads.PFHeadLocal).
        """
        feats = self.backbone(images.astype(self.dtype))
        fused = self.neck(feats)
        return self.head(fused, train=train)
