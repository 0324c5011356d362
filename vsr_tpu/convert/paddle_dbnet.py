"""PP-OCRv5 DBNet Paddle checkpoint conversion.

Status: interface + layout plumbing. The reference ships Paddle inference
blobs (`backend/models/V5/ch_det*/inference.pdiparams`, LFS-stripped in this
tree) whose weights belong to Paddle's PP-HGNetV2-B4 (server) / PP-LCNetV3
(mobile) backbones. Our DBNet (vsr_tpu/detect/dbnet.py) is an idiomatic-JAX
DB architecture with the same pre/post-processing contract; weight-level
parity therefore requires either (a) reimplementing those exact backbone
variants and mapping their parameter programs, or (b) distilling the Paddle
model's probability maps into our backbone. Both need the actual .pdiparams
blobs, unavailable here; tracked for a future round.

What exists now:
* ``load_pdiparams`` — parse a .pdiparams file into {name: ndarray} using the
  paddle package when available (falls back to a clear error otherwise);
* ``convert_named_conv`` — Paddle conv (OIHW, same as torch) / bn / linear
  layout conversion helpers shared with the mapping engine.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

import jax.numpy as jnp


def load_pdiparams(path: str) -> Dict[str, np.ndarray]:
    """Load a Paddle inference .pdiparams blob into a name->array dict."""
    try:
        import paddle  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "Paddle is required to parse .pdiparams blobs; install paddlepaddle "
            "or export the model to ONNX and convert from there."
        ) from e
    import paddle

    program = paddle.jit.load(path.rsplit(".", 1)[0])
    return {
        var.name: np.asarray(var.value().get_tensor())
        for var in program.parameters()
    }


def convert_conv_weight(arr: np.ndarray) -> jnp.ndarray:
    """Paddle conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return jnp.asarray(np.asarray(arr).transpose(2, 3, 1, 0))


def convert_linear_weight(arr: np.ndarray) -> jnp.ndarray:
    """Paddle linear weight is already (in, out) — pass through."""
    return jnp.asarray(np.asarray(arr))
