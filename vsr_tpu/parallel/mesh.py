"""Device mesh and sharding helpers.

Replaces the reference's NCCL/DDP distribution (train_sttn.py:33-40,
trainer_sttn.py:75-88, video/core/dist.py) with jax.sharding over a device
mesh: batch ("data") sharding for DP, output-channel ("model") sharding for
TP. GSPMD inserts the ICI collectives (all-reduce for DP grads, all-gather /
reduce-scatter around channel-sharded convs) — there is no hand-written
communication here by design.

Inference additionally shards the *window* axis of the STTN sweep ("data"
axis again: windows are embarrassingly parallel after encode) — the
CP-analog noted in SURVEY.md §2c.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_inference_mesh() -> Optional[Mesh]:
    """Window-sharding mesh for inference when several accelerator devices
    are visible; None on a single chip or host-CPU backends (virtual CPU
    meshes are for explicit sharding tests, not the default path)."""
    devices = jax.devices()
    if len(devices) > 1 and devices[0].platform != "cpu":
        return create_mesh(model=1)
    return None


def create_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ("data", "model") mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard one array dimension over the 'data' mesh axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(path: Tuple[str, ...], value) -> P:
    """Tensor-parallel rules for conv params: shard the output-channel dim.

    Conv kernels are HWIO -> shard O ("model"); biases shard their only dim.
    GSPMD propagates the activation sharding and inserts the collectives.
    Small tensors (O not divisible by the axis) fall back to replication at
    sharding-constraint time via jax's auto-sharding relaxation.
    """
    if value.ndim == 4:
        return P(None, None, None, "model")
    if value.ndim == 1:
        return P("model")
    return P()


def shard_params(params: Dict[str, Any], mesh: Mesh, tp: bool = False):
    """Place a param tree on the mesh (replicated, or TP-sharded when tp)."""
    def place(path, x):
        spec = param_sharding_rules(path, x) if tp else P()
        try:
            return jax.device_put(x, NamedSharding(mesh, spec))
        except ValueError:
            return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
