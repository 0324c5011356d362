"""Generic torch-state-dict -> flax-params mapping engine.

Each model ships a table of (regex over torch module path -> flax path
template) plus a layer kind that fixes the tensor layout conversion:

  conv2d     weight OIHW  -> kernel HWIO
  conv3d     weight OIDHW -> kernel DHWIO
  linear     weight OI    -> kernel IO
  layernorm  weight/bias  -> scale/bias
  batchnorm  weight/bias/running_mean/running_var -> scale/bias (+batch_stats)
  raw        copied as-is (e.g. deform-conv kernels already stored OIHW ->
             mapped like conv2d but to a bare "kernel" param)

convert() walks the state dict, applies the first matching rule, and builds
the {'params': ..., 'batch_stats': ...} variable tree. Unmatched keys raise
(or collect, with strict=False) so silent drops can't happen.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp
from flax import traverse_util

Rule = Tuple[str, str, str]  # (regex, flax path template, kind)


def _to_np(value) -> np.ndarray:
    if hasattr(value, "detach"):
        return value.detach().cpu().numpy()
    return np.asarray(value)


def convert_state_dict(
    state_dict: Mapping[str, Any],
    rules: Sequence[Rule],
    strict: bool = True,
) -> Dict[str, Any]:
    params: Dict[str, jnp.ndarray] = {}
    stats: Dict[str, jnp.ndarray] = {}
    unmatched: List[str] = []

    compiled = [(re.compile(rx), tmpl, kind) for rx, tmpl, kind in rules]

    for key, value in state_dict.items():
        module_path, leaf = key.rsplit(".", 1)
        if leaf in ("num_batches_tracked",):
            continue
        hit = None
        for rx, tmpl, kind in compiled:
            m = rx.fullmatch(module_path)
            if m:
                hit = (m.expand(tmpl), kind)
                break
        if hit is None:
            unmatched.append(key)
            continue
        flax_path, kind = hit
        arr = _to_np(value)
        if kind == "conv2d":
            if leaf == "weight":
                params[f"{flax_path}/kernel"] = jnp.asarray(arr.transpose(2, 3, 1, 0))
            else:
                params[f"{flax_path}/bias"] = jnp.asarray(arr)
        elif kind == "conv3d":
            if leaf == "weight":
                params[f"{flax_path}/kernel"] = jnp.asarray(arr.transpose(2, 3, 4, 1, 0))
            else:
                params[f"{flax_path}/bias"] = jnp.asarray(arr)
        elif kind == "convtranspose2d":
            # torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose
            # kernel (kh, kw, O, I) with transpose_kernel=True
            if leaf == "weight":
                params[f"{flax_path}/kernel"] = jnp.asarray(arr.transpose(2, 3, 1, 0))
            else:
                params[f"{flax_path}/bias"] = jnp.asarray(arr)
        elif kind == "linear":
            if leaf == "weight":
                params[f"{flax_path}/kernel"] = jnp.asarray(arr.T)
            else:
                params[f"{flax_path}/bias"] = jnp.asarray(arr)
        elif kind == "layernorm":
            name = "scale" if leaf == "weight" else "bias"
            params[f"{flax_path}/{name}"] = jnp.asarray(arr)
        elif kind == "batchnorm":
            if leaf == "weight":
                params[f"{flax_path}/scale"] = jnp.asarray(arr)
            elif leaf == "bias":
                params[f"{flax_path}/bias"] = jnp.asarray(arr)
            elif leaf == "running_mean":
                stats[f"{flax_path}/mean"] = jnp.asarray(arr)
            elif leaf == "running_var":
                stats[f"{flax_path}/var"] = jnp.asarray(arr)
        elif kind == "affine":
            # bare scale/bias parameter pair (paddle LearnableAffineBlock)
            params[f"{flax_path}/{leaf}"] = jnp.asarray(arr)
        elif kind == "deform_kernel":
            # ModulatedDeformConv2d's own weight (O, I, kh, kw) -> bare
            # "kernel" param [kh, kw, I, O]
            if leaf == "weight":
                params[f"{flax_path}/kernel"] = jnp.asarray(arr.transpose(2, 3, 1, 0))
            else:
                params[f"{flax_path}/bias"] = jnp.asarray(arr)
        elif kind == "depthwise2d":
            # torch depthwise conv weight (C, 1, kh, kw) -> [kh, kw, 1, C]
            if leaf == "weight":
                params[f"{flax_path}"] = jnp.asarray(arr.transpose(2, 3, 1, 0))
            else:
                params[f"{flax_path.rsplit('/', 1)[0]}/pool_bias"] = jnp.asarray(arr)
        else:
            raise ValueError(f"unknown mapping kind: {kind}")

    if unmatched and strict:
        raise KeyError(f"unmapped checkpoint keys: {unmatched[:8]}"
                       f"{'...' if len(unmatched) > 8 else ''}")

    out: Dict[str, Any] = {
        "params": traverse_util.unflatten_dict(params, sep="/")
    }
    if stats:
        out["batch_stats"] = traverse_util.unflatten_dict(stats, sep="/")
    return out


def validate_against(variables: Dict[str, Any], reference: Dict[str, Any]) -> List[str]:
    """Compare a converted tree to model.init output; returns mismatch list."""
    flat_a = traverse_util.flatten_dict(variables, sep="/")
    flat_b = traverse_util.flatten_dict(reference, sep="/")
    problems = []
    for k in sorted(set(flat_a) | set(flat_b)):
        if k not in flat_a:
            problems.append(f"missing: {k}")
        elif k not in flat_b:
            problems.append(f"extra: {k}")
        elif tuple(flat_a[k].shape) != tuple(flat_b[k].shape):
            problems.append(
                f"shape {k}: {tuple(flat_a[k].shape)} != {tuple(flat_b[k].shape)}")
    return problems
