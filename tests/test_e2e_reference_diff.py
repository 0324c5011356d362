"""End-to-end wrapper differentials vs the *executed* reference wrappers.

VERDICT r2 item 4: activation parity (<=1e-3 per net) and mask/interval fuzz
can't see composition bugs — windowing order, cv2 resizes, 0.5/0.5 blending
and paste-back must *compose* to the same pixels. Here the reference's full
mode wrappers (backend/inpaint/{sttn_auto,sttn_det,lama,propainter}_inpaint.py)
run on CPU torch with seeded random weights, our inpainters load the SAME
weights through the production converters, and the final uint8 frames are
compared.

Geometries are chosen so band->model resizes are either the identity
(sttn-auto: W=640 -> split_h=120 == model height, band width == 640) or map
the mask cleanly (sttn-det: mask x-edges on even columns so the 2x cv2
downsample produces a pure 0/255 mask — the reference thresholds the resized
mask at >0.5 for compositing but >127.5 for the attention tensor, and only a
clean mask makes those agree). Tolerance is 1 uint8 step: fp32 torch-vs-XLA
activation noise (~1e-4) can flip a truncation boundary, nothing more.

Documented divergences honored here:
* sttn-det: the reference channel-swaps non-hole band pixels
  (sttn_det_inpaint.py:89+168) and resamples the whole band; we compare only
  the mask interior (eroded by the resize support) where both paths agree,
  and additionally assert our non-hole pixels pass through untouched.
* propainter: static window scheduling diverges at boundary windows, so the
  exact ragged reference scheduling (VSR_PP_DYNAMIC_WINDOWS=1) is used.
"""

from __future__ import annotations

import os
import sys

import cv2
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_compat import (  # noqa: E402
    build_torch_lama,
    install_backend_config,
    install_reference,
)

install_reference()
install_backend_config()


def _video(rng, n, h, w):
    """Smooth-ish moving content (pure noise makes inpainting degenerate)."""
    base = rng.integers(0, 256, (h + 64, w + 64, 3), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (0, 0), 3)
    return [np.ascontiguousarray(base[8 + 2 * i : 8 + 2 * i + h,
                                      8 + 3 * i : 8 + 3 * i + w])
            for i in range(n)]


def _mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 255
    return m


def _diff_stats(a_frames, b_frames, where=None):
    deltas = []
    for a, b in zip(a_frames, b_frames):
        d = np.abs(a.astype(np.int16) - b.astype(np.int16))
        if where is not None:
            d = d[where]
        deltas.append(d)
    d = np.stack(deltas)
    return int(d.max()), float(d.mean())


class TestSTTNAutoE2E:
    def test_wrapper_diff(self, tmp_path):
        """Reference STTNInpaint.__call__ (sttn_auto_inpaint.py:43-97) vs
        STTNAutoInpainter.__call__ with identical converted weights."""
        from backend.inpaint.sttn_auto_inpaint import STTNInpaint

        from vsr_tpu.config import Config
        from vsr_tpu.inpaint.sttn_auto import STTNAutoInpainter

        torch.manual_seed(7)
        from backend.inpaint.sttn.auto_sttn import InpaintGenerator

        net = InpaintGenerator()
        net.eval()
        ckpt = tmp_path / "sttn_auto.pth"
        torch.save({"netG": net.state_dict()}, ckpt)

        ref = STTNInpaint(torch.device("cpu"), str(ckpt))

        cfg = Config()
        cfg.compute_dtype = "float32"
        ours = STTNAutoInpainter(checkpoint_path=str(ckpt), config=cfg)

        rng = np.random.default_rng(0)
        # W=640 -> split_h = 120 == model input height and band width == 640:
        # the band<->model resizes are the identity, isolating windowing,
        # blending and paste-back from resampling-kernel differences.
        h, w, t = 360, 640, 11
        frames = _video(rng, t, h, w)
        mask = _mask(h, w, 280, 330, 96, 560)

        ref_out = ref([f.copy() for f in frames], mask.copy())
        our_out = ours([f.copy() for f in frames], mask.copy())

        assert len(ref_out) == len(our_out) == t
        dmax, dmean = _diff_stats(ref_out, our_out)
        assert dmax <= 1, f"sttn-auto e2e max delta {dmax} (mean {dmean:.4f})"


class TestSTTNDetE2E:
    def test_wrapper_diff(self, tmp_path):
        """Reference STTNDetInpaint.__call__ (sttn_det_inpaint.py:38-101) vs
        STTNDetInpainter with the same weights, compared on the mask interior
        (the documented non-hole divergences are excluded)."""
        from backend.inpaint.sttn_det_inpaint import STTNDetInpaint

        from vsr_tpu.config import Config
        from vsr_tpu.inpaint.sttn_det import STTNDetInpainter

        torch.manual_seed(11)
        from backend.inpaint.sttn.network_sttn import InpaintGenerator

        net = InpaintGenerator()
        net.eval()
        ckpt = tmp_path / "sttn_det.pth"
        torch.save({"netG": net.state_dict()}, ckpt)

        ref = STTNDetInpaint(torch.device("cpu"), str(ckpt))

        cfg = Config()
        cfg.compute_dtype = "float32"
        # apply_attention_mask=False reproduces the reference's no-op
        # masked_fill (network_sttn.py:148) — required for numeric parity.
        ours = STTNDetInpainter(checkpoint_path=str(ckpt), config=cfg,
                                apply_attention_mask=False)

        rng = np.random.default_rng(1)
        # W=864 -> split_h = 240 == model height (y identity) and the x-axis
        # downsamples exactly 2x; mask x-edges on even columns keep the
        # resized mask binary (see module docstring).
        h, w, t = 480, 864, 11
        frames = _video(rng, t, h, w)
        mask = _mask(h, w, 300, 380, 128, 736)

        ref_out = ref([f.copy() for f in frames], mask.copy())
        our_out = ours([f.copy() for f in frames], mask.copy())

        # interior: erode by the bilinear support of the 2x band upsample
        # plus a safety row so every compared pixel is hole-only on both paths
        interior = cv2.erode(mask, np.ones((9, 9), np.uint8)) > 0
        dmax, dmean = _diff_stats(ref_out, our_out, where=interior)
        assert dmax <= 1, f"sttn-det hole delta {dmax} (mean {dmean:.4f})"

        # our documented improvement: non-hole pixels pass through exactly
        outside = mask == 0
        for f_in, f_out in zip(frames, our_out):
            assert np.array_equal(f_in[outside], f_out[outside])


class TestLamaE2E:
    def test_wrapper_diff(self, tmp_path, monkeypatch):
        """Reference LamaInpaint band path (lama_inpaint.py:30-114) driving a
        torch.jit blob vs LamaInpainter with converted weights.

        The blob is the torch FFC generator traced at exactly the band shape
        the wrapper produces (tracing burns the FFT sizes in, which is fine
        for a single-shape comparison)."""
        from backend.inpaint.lama_inpaint import LamaInpaint

        from vsr_tpu.config import Config
        from vsr_tpu.convert.torch_lama import convert_lama_state_dict
        from vsr_tpu.inpaint.lama import LamaInpainter
        from vsr_tpu.models.lama import LamaGenerator

        torch.manual_seed(3)
        # full big-lama structure: the converter's key mapping is pinned to
        # its exact Sequential indices (smaller variants shift them)
        gen = build_torch_lama()
        gen.eval()

        class Blob(torch.nn.Module):
            """forward(image, mask) like the real big-lama TorchScript."""

            def __init__(self, inner):
                super().__init__()
                self.model = inner.model

            def forward(self, image, mask):
                x = torch.cat([image * (1 - mask), mask], dim=1)
                return self.model(x)

        h, w, t = 240, 320, 4  # -> split_h = 60, pad-to-8 -> 64 rows
        ex_img = torch.zeros(t, 3, 64, w)
        ex_mask = torch.zeros(t, 1, 64, w)
        with torch.no_grad():
            traced = torch.jit.trace(Blob(gen), (ex_img, ex_mask))
        blob = tmp_path / "big-lama.pt"
        traced.save(str(blob))

        ref = LamaInpaint(torch.device("cpu"), str(blob))

        cfg = Config()
        cfg.compute_dtype = "float32"
        ours = LamaInpainter(config=cfg)
        ours.model = LamaGenerator()
        ours.params = convert_lama_state_dict(gen.state_dict())

        rng = np.random.default_rng(2)
        frames = _video(rng, t, h, w)
        mask = _mask(h, w, 190, 225, 40, 280)

        ref_out = ref([f.copy() for f in frames], mask.copy())
        # reference semantics (full-band overwrite) under the compat flag
        monkeypatch.setenv("VSR_LAMA_BAND_D2H", "full")
        our_out = ours([f.copy() for f in frames], mask.copy())

        assert len(ref_out) == len(our_out) == t
        dmax, dmean = _diff_stats(ref_out, our_out)
        assert dmax <= 1, f"lama e2e max delta {dmax} (mean {dmean:.4f})"

        # default (masked D2H composite): mask interior still matches the
        # reference; every pixel OUTSIDE the mask is bit-exact to the input
        # (the documented divergence — the reference rewrites the whole band
        # with the autoencoder reconstruction, lama_inpaint.py:105)
        monkeypatch.setenv("VSR_LAMA_BAND_D2H", "masked")
        monkeypatch.setenv("VSR_LAMA_H2D", "bgr")  # exact uploads: the ±1
        # i420 input perturbation is a separate documented knob (test_lama)
        our_masked = ours([f.copy() for f in frames], mask.copy())
        hole = mask > 0
        dmax_in, _ = _diff_stats(ref_out, our_masked,
                                 where=np.broadcast_to(hole[..., None],
                                                       frames[0].shape))
        assert dmax_in <= 1, f"lama masked-mode interior delta {dmax_in}"
        keep = ~hole
        for src, got in zip(frames, our_masked):
            np.testing.assert_array_equal(src[keep], got[keep])


class TestProPainterE2E:
    def test_wrapper_diff(self, tmp_path, monkeypatch):
        """Reference PropainterInpaint.__call__ (propainter_inpaint.py:363-418)
        vs PropainterInpainter under the exact ragged window scheduling."""
        from backend.inpaint.propainter_inpaint import PropainterInpaint
        from backend.inpaint.video.model.modules.flow_comp_raft import RAFT_bi  # noqa: F401
        from backend.inpaint.video.model.propainter import (
            InpaintGenerator as TorchPPGen,
        )
        from backend.inpaint.video.model.recurrent_flow_completion import (
            RecurrentFlowCompleteNet as TorchFlowNet,
        )
        from backend.inpaint.video.raft import RAFT as TorchRAFT

        from vsr_tpu.config import Config
        from vsr_tpu.convert.params_io import save_params
        from vsr_tpu.convert.torch_propainter import (
            convert_flow_completion,
            convert_propainter_generator,
        )
        from vsr_tpu.convert.torch_raft import convert_raft_state_dict
        from vsr_tpu.inpaint.propainter import PropainterInpainter

        monkeypatch.setenv("VSR_PP_DYNAMIC_WINDOWS", "1")
        # bit-parity vs torch needs the fp32 correlation pyramid (the shipped
        # default is bf16, parity-gated separately by TestBF16CorrParityGate)
        monkeypatch.setenv("VSR_PP_CORR_DTYPE", "float32")

        import argparse

        torch.manual_seed(5)
        raft_args = argparse.Namespace(small=False, mixed_precision=False,
                                       alternate_corr=False)
        t_raft = TorchRAFT(raft_args)
        t_flow = TorchFlowNet(None)
        t_gen = TorchPPGen(init_weights=True, model_path=None)
        for m in (t_raft, t_flow, t_gen):
            m.eval()
        # random-init RAFT can drift over 20 GRU iterations; damp the flow
        # delta head so the shared checkpoint stays numerically tame (both
        # sides load the identical damped weights)
        with torch.no_grad():
            t_raft.update_block.flow_head.conv2.weight *= 0.01
            t_raft.update_block.flow_head.conv2.bias *= 0.01

        # reference checkpoint formats: RAFT carries the nn.DataParallel
        # 'module.' prefix (flow_comp_raft.py:18-20); the others are plain.
        torch.save({f"module.{k}": v for k, v in t_raft.state_dict().items()},
                   tmp_path / "raft-things.pth")
        torch.save(t_flow.state_dict(),
                   tmp_path / "recurrent_flow_completion.pth")
        torch.save(t_gen.state_dict(), tmp_path / "ProPainter.pth")

        ref = PropainterInpaint(torch.device("cpu"), str(tmp_path),
                                use_fp16=False)

        ours_dir = tmp_path / "converted"
        ours_dir.mkdir()
        save_params(str(ours_dir / "raft.npz"),
                    convert_raft_state_dict(t_raft.state_dict()))
        save_params(str(ours_dir / "flow_completion.npz"),
                    convert_flow_completion(t_flow.state_dict()))
        save_params(str(ours_dir / "propainter.npz"),
                    convert_propainter_generator(t_gen.state_dict()))

        cfg = Config()
        cfg.compute_dtype = "float32"
        ours = PropainterInpainter(checkpoint_dir=str(ours_dir), config=cfg)

        rng = np.random.default_rng(4)
        # W=688 -> split_h = 129, rounded to a /8 band >= 136 rows: RAFT's
        # coarsest corr-pyramid level must stay >= 2px (band_h/64), or the
        # torch bilinear grid normalization divides by (size-1)==0 -> NaN
        # (same gotcha as test_activation_parity's RAFT case). T=8 keeps
        # 20-iteration CPU RAFT affordable.
        h, w, t = 360, 688, 8
        frames = _video(rng, t, h, w)
        mask = _mask(h, w, 280, 320, 64, 624)

        ref_out = ref([f.copy() for f in frames], mask.copy())
        our_out = ours([f.copy() for f in frames], mask.copy())

        assert len(ref_out) == len(our_out) == t
        dmax, dmean = _diff_stats(ref_out, our_out)
        # more float work than the STTN paths (20 GRU iters, flow warps,
        # deformable alignment): allow one extra truncation flip but require
        # the frames to be essentially identical on average
        assert dmax <= 2, f"propainter e2e max delta {dmax} (mean {dmean:.4f})"
        assert dmean < 0.05, f"propainter e2e mean delta {dmean:.4f}"
