"""Parameter loading with graceful fallback.

Checkpoint search order: vsr_tpu npz -> reference torch .pth (converted on the
fly) -> deterministic random initialization (dev/bench mode — this repo ships
no trained weights; the reference's are LFS-stripped in this environment)."""

from __future__ import annotations

import os
import warnings
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def load_or_init_params(
    model,
    init_args: Sequence[Any],
    checkpoint_path: Optional[str] = None,
    seed: int = 0,
) -> Dict[str, Any]:
    if checkpoint_path and os.path.exists(checkpoint_path):
        if checkpoint_path.endswith(".npz"):
            from vsr_tpu.convert.params_io import load_params

            return load_params(checkpoint_path)
        if checkpoint_path.endswith((".pth", ".pt", ".ckpt")):
            from vsr_tpu.convert.torch_sttn import load_sttn_checkpoint

            return load_sttn_checkpoint(checkpoint_path)
        raise ValueError(f"unknown checkpoint format: {checkpoint_path}")
    if checkpoint_path:
        warnings.warn(
            f"checkpoint not found at {checkpoint_path}; "
            "using random initialization (outputs will not be meaningful)"
        )
    return model.init(jax.random.PRNGKey(seed), *init_args)
