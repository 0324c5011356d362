"""Flat npz persistence for flax param trees.

A deliberately simple on-disk format (np.savez of '/'-joined paths) so
converted checkpoints carry no framework dependency; orbax is reserved for
training state (see train/).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax.numpy as jnp
from flax import traverse_util


def save_params(path: str, params: Dict[str, Any]) -> None:
    flat = traverse_util.flatten_dict(params, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        flat = {k: jnp.asarray(data[k]) for k in data.files}
    return traverse_util.unflatten_dict(flat, sep="/")
