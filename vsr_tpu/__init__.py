"""vsr_tpu — TPU-native video subtitle / watermark removal framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
YaoFANGUK/video-subtitle-remover (reference layout surveyed in SURVEY.md):
decode video -> detect subtitle text boxes (DBNet) -> build masks ->
temporal-window inpainting (STTN / LaMa / ProPainter / OpenCV-Telea) ->
re-encode + audio remux — with the compute path compiled once per static
window shape and streamed against double-buffered host I/O.

Package map (see SURVEY.md §7):
  config     — typed config + JSON persistence (ref: backend/config.py)
  cli        — argparse parity (ref: backend/tools/args_handler.py)
  pipeline   — orchestrator (ref: backend/main.py SubtitleRemover)
  io/        — video decode/encode + prefetch + audio remux (ref: backend/tools/video_io.py)
  masks/     — mask construction, band solver, interval algebra (ref: backend/tools/inpaint_tools.py)
  detect/    — DBNet-JAX text detection + timeline (ref: backend/tools/subtitle_detect.py)
  scenes/    — content-based scene cuts (ref: backend/scenedetect)
  models/    — flax model zoo: STTN, LaMa FFC, ProPainter/RAFT
  ops/       — Pallas/XLA kernels: patch attention, deform conv, flow warp, FFC
  inpaint/   — uniform inpainter wrappers (ref: backend/inpaint/*.py)
  parallel/  — device mesh, shardings, halo exchange
  convert/   — torch/paddle checkpoint -> vsr_tpu params
  train/     — STTN GAN trainer on a pjit mesh (ref: backend/tools/train)
  utils/     — metrics (PSNR/SSIM), progress, logging
"""

from vsr_tpu.version import __version__  # noqa: F401
