"""Parameter loading with graceful fallback.

Checkpoint search order: vsr_tpu npz -> reference torch .pth (converted on the
fly) -> deterministic random initialization (dev/bench mode — this repo ships
no trained weights; the reference's are LFS-stripped in this environment)."""

from __future__ import annotations

import os
import warnings
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def load_or_init_params(
    model,
    init_args: Sequence[Any],
    checkpoint_path: Optional[str] = None,
    seed: int = 0,
    torch_converter: Optional[Callable[[str], Dict[str, Any]]] = None,
) -> Dict[str, Any]:
    """Load converted (.npz) params, convert a torch checkpoint via the
    model-specific ``torch_converter``, or fall back to random init.

    Raw torch checkpoints need a per-model key mapping — callers that support
    them pass their converter (e.g. convert.torch_sttn.load_sttn_checkpoint);
    for the rest a .pth path is a clear error, not a silent misparse.
    """
    if checkpoint_path and os.path.exists(checkpoint_path):
        if checkpoint_path.endswith(".npz"):
            from vsr_tpu.convert.params_io import load_params

            return load_params(checkpoint_path)
        if checkpoint_path.endswith((".pth", ".pt", ".ckpt")):
            if torch_converter is None:
                raise ValueError(
                    f"{checkpoint_path}: raw torch checkpoints need a "
                    "model-specific converter (see vsr_tpu.convert) — "
                    "convert to .npz first or pass torch_converter"
                )
            return torch_converter(checkpoint_path)
        raise ValueError(f"unknown checkpoint format: {checkpoint_path}")
    if checkpoint_path:
        warnings.warn(
            f"checkpoint not found at {checkpoint_path}; "
            "using random initialization (outputs will not be meaningful)"
        )
    # Init on the host CPU backend: eager init on the (remote) TPU dispatches
    # hundreds of tiny compiles (~2 min of cold-start for nothing). One jitted
    # CPU init program is seconds; params then move to the accelerator in a
    # single transfer so downstream jits place on the accelerator, not CPU.
    init_model = model
    if getattr(model, "use_pallas", False):
        init_model = model.clone(use_pallas=False)  # pallas can't lower on CPU
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    # Only bare arrays become jit arguments; ints (static slice bounds, e.g.
    # ProPainter's num_local) and containers are closed over so they stay
    # python values during tracing.
    import numpy as _np

    def _is_array(a):
        return isinstance(a, (jnp.ndarray, _np.ndarray, jax.Array))

    array_args = [a for a in init_args if _is_array(a)]

    def _init(rng, *arrs):
        it = iter(arrs)
        full = [next(it) if _is_array(a) else a for a in init_args]
        return init_model.init(rng, *full)

    if cpu is None or jax.default_backend() == "cpu":
        return jax.jit(_init)(jax.random.PRNGKey(seed), *array_args)
    with jax.default_device(cpu):
        variables = jax.jit(_init)(jax.random.PRNGKey(seed), *array_args)
    return jax.device_put(variables, jax.devices()[0])
