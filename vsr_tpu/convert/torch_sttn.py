"""Convert reference STTN torch checkpoints to vsr_tpu flax params.

Checkpoint layouts (ref):
* auto: ``torch.load('sttn-auto/infer_model.pth')['netG']``
  (backend/inpaint/sttn_auto_inpaint.py:34)
* det:  ``torch.load('sttn-det/sttn.pth')['netG']``
  (backend/inpaint/sttn_det_inpaint.py — same nesting)

Key mapping (torch module path -> flax param path):
  encoder.{0,2,4,6}                       -> encoder/conv{0..3}
  transformer.{i}.attention.query_embedding -> block{i}/attention/query
  transformer.{i}.attention.key_embedding   -> block{i}/attention/key
  transformer.{i}.attention.value_embedding -> block{i}/attention/value
  transformer.{i}.attention.output_linear.0 -> block{i}/attention/out
  transformer.{i}.feed_forward.conv.{0,2}   -> block{i}/ffn/conv{0,1}
  decoder.0.conv / decoder.2 / decoder.4.conv / decoder.6
                                          -> decoder/{deconv0,conv1,deconv1,conv2}

Conv kernels transpose OIHW -> HWIO. Convention validated against
torch.nn.functional.conv2d in tests/test_ops.py.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

import jax.numpy as jnp
from flax import traverse_util

_ENCODER = {f"encoder.{i * 2}": f"encoder/conv{i}" for i in range(4)}
_DECODER = {
    "decoder.0.conv": "decoder/deconv0",
    "decoder.2": "decoder/conv1",
    "decoder.4.conv": "decoder/deconv1",
    "decoder.6": "decoder/conv2",
}
_ATTN = {
    "query_embedding": "query",
    "key_embedding": "key",
    "value_embedding": "value",
    "output_linear.0": "out",
}


def _map_module(torch_path: str) -> str:
    if torch_path in _ENCODER:
        return _ENCODER[torch_path]
    if torch_path in _DECODER:
        return _DECODER[torch_path]
    m = re.fullmatch(r"transformer\.(\d+)\.attention\.(.+)", torch_path)
    if m and m.group(2) in _ATTN:
        return f"block{m.group(1)}/attention/{_ATTN[m.group(2)]}"
    m = re.fullmatch(r"transformer\.(\d+)\.feed_forward\.conv\.([02])", torch_path)
    if m:
        return f"block{m.group(1)}/ffn/conv{int(m.group(2)) // 2}"
    raise KeyError(f"unrecognized STTN checkpoint module: {torch_path}")


def convert_sttn_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torch state dict (tensor or ndarray values) -> flax {'params': ...}."""
    flat: Dict[str, jnp.ndarray] = {}
    for key, value in state_dict.items():
        if not (key.endswith(".weight") or key.endswith(".bias")):
            continue
        module_path, kind = key.rsplit(".", 1)
        arr = np.asarray(getattr(value, "detach", lambda: value)().cpu().numpy()
                         if hasattr(value, "detach") else value)
        flax_module = _map_module(module_path)
        if kind == "weight":
            flat[f"{flax_module}/kernel"] = jnp.asarray(arr.transpose(2, 3, 1, 0))
        else:
            flat[f"{flax_module}/bias"] = jnp.asarray(arr)
    return {"params": traverse_util.unflatten_dict(flat, sep="/")}


def load_sttn_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint (requires torch) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    state_dict = ckpt.get("netG", ckpt)
    return convert_sttn_state_dict(state_dict)
