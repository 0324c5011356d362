"""I3D converter activation parity vs the executed reference net.

The reference evaluates VFID with InceptionI3d features
(backend/inpaint/video/core/metrics.py:62-67, extract_features at :560-569).
We randomly initialize the reference torch net, convert its state_dict with
the production converter (convert/torch_i3d.py), and assert the flax
InceptionI3d reproduces extract_features('Logits') — the exact tensor VFID
consumes — plus the logits head.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.reference_compat import install_reference  # noqa: E402

install_reference()


def _import_ref_metrics():
    # metrics.py pulls in skimage + core.utils.to_tensors at module scope;
    # neither is needed by the I3D class — stub them (never copied code).
    for name in ("skimage", "skimage.measure"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    if "core.utils" not in sys.modules:
        cu = types.ModuleType("core.utils")
        cu.to_tensors = lambda: None
        c = types.ModuleType("core")
        c.utils = cu
        sys.modules["core"] = c
        sys.modules["core.utils"] = cu
    import importlib

    return importlib.import_module("backend.inpaint.video.core.metrics")


@pytest.fixture(scope="module")
def ref_net():
    m = _import_ref_metrics()
    torch.manual_seed(0)
    net = m.InceptionI3d(400, in_channels=3, final_endpoint="Logits")
    net.eval()
    return net


@pytest.fixture(scope="module")
def converted(ref_net):
    from vsr_tpu.convert.torch_i3d import convert_i3d_state_dict

    return convert_i3d_state_dict(ref_net.state_dict())


def test_tree_identity(ref_net, converted):
    from flax import traverse_util

    from vsr_tpu.models.i3d import InceptionI3d

    model = InceptionI3d()
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 9, 32, 32, 3)), False, False)
    from vsr_tpu.convert.mapping import validate_against

    problems = validate_against(converted, init)
    assert not problems, problems[:10]
    # every checkpoint tensor mapped (344 keys incl. num_batches_tracked)
    n_leaves = len(traverse_util.flatten_dict(converted["params"])) + len(
        traverse_util.flatten_dict(converted["batch_stats"]))
    n_torch = sum(1 for k in ref_net.state_dict()
                  if not k.endswith("num_batches_tracked"))
    assert n_leaves == n_torch


def test_vfid_feature_parity(ref_net, converted):
    from vsr_tpu.models.i3d import InceptionI3d

    rng = np.random.default_rng(1)
    # [B, T, H, W, 3]; T=16 exercises all temporal strides/pads
    video = rng.uniform(-1, 1, (1, 16, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref_feat = ref_net.extract_features(
            torch.from_numpy(video).permute(0, 4, 1, 2, 3), "Logits")

    model = InceptionI3d()
    feat = model.apply(converted, jnp.asarray(video), False, True)
    err = np.max(np.abs(np.asarray(feat) - ref_feat.numpy()))
    assert err < 1e-4, f"VFID feature max abs err {err}"


def test_logits_parity(ref_net, converted):
    """Torch: avg_pool(2,7,7) -> 1x1x1 conv, per-time logits; flax: global
    mean -> Dense. With a 7x7 spatial map and T=2*n the torch time axis
    averages to the flax value when T pools to one step."""
    from vsr_tpu.models.i3d import InceptionI3d

    rng = np.random.default_rng(2)
    video = rng.uniform(-1, 1, (1, 16, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        ref_logits = ref_net(torch.from_numpy(video).permute(0, 4, 1, 2, 3))
    # [B, classes, time] -> average over time to compare with the pooled head
    ref_avg = ref_logits.numpy().mean(axis=-1)

    model = InceptionI3d()
    ours = model.apply(converted, jnp.asarray(video), False, False)
    err = np.max(np.abs(np.asarray(ours) - ref_avg))
    assert err < 1e-4, f"logits max abs err {err}"
