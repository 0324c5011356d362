"""RAFT converter test: a synthetic checkpoint with the torch module naming
and shapes must convert into exactly the tree RAFT.init produces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.convert.mapping import validate_against
from vsr_tpu.convert.torch_raft import convert_raft_state_dict
from vsr_tpu.models.propainter.raft import RAFT


def conv(sd, name, cout, cin, kh, kw=None, bias=True):
    kw = kw if kw is not None else kh
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    sd[f"{name}.weight"] = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
    if bias:
        sd[f"{name}.bias"] = rng.standard_normal((cout,)).astype(np.float32)


def bn(sd, name, c):
    sd[f"{name}.weight"] = np.ones((c,), np.float32)
    sd[f"{name}.bias"] = np.zeros((c,), np.float32)
    sd[f"{name}.running_mean"] = np.zeros((c,), np.float32)
    sd[f"{name}.running_var"] = np.ones((c,), np.float32)
    sd[f"{name}.num_batches_tracked"] = np.zeros((), np.int64)


def build_raft_things_state_dict():
    """Torch-layout RAFT-things keys (raft/extractor.py, update.py naming),
    with the DataParallel 'module.' prefix the reference checkpoints carry."""
    sd = {}
    # encoders: fnet instance-norm (no params), cnet batch-norm
    for net, has_bn, out_dim in (("fnet", False, 256), ("cnet", True, 256)):
        conv(sd, f"{net}.conv1", 64, 3, 7)
        if has_bn:
            bn(sd, f"{net}.norm1", 64)
        in_planes = 64
        for layer, planes in ((1, 64), (2, 96), (3, 128)):
            for blk in (0, 1):
                stride = 2 if (layer > 1 and blk == 0) else 1
                base = f"{net}.layer{layer}.{blk}"
                conv(sd, f"{base}.conv1", planes, in_planes, 3)
                conv(sd, f"{base}.conv2", planes, planes, 3)
                if has_bn:
                    bn(sd, f"{base}.norm1", planes)
                    bn(sd, f"{base}.norm2", planes)
                if stride != 1 or in_planes != planes:
                    conv(sd, f"{base}.downsample.0", planes, in_planes, 1)
                    if has_bn:
                        bn(sd, f"{base}.norm3", planes)
                in_planes = planes
        conv(sd, f"{net}.conv2", out_dim, 128, 1)
    # update block
    cor_planes = 4 * (2 * 4 + 1) ** 2
    conv(sd, "update_block.encoder.convc1", 256, cor_planes, 1)
    conv(sd, "update_block.encoder.convc2", 192, 256, 3)
    conv(sd, "update_block.encoder.convf1", 128, 2, 7)
    conv(sd, "update_block.encoder.convf2", 64, 128, 3)
    conv(sd, "update_block.encoder.conv", 126, 256, 3)
    for g in ("z", "r", "q"):
        conv(sd, f"update_block.gru.conv{g}1", 128, 384, 1, 5)
        conv(sd, f"update_block.gru.conv{g}2", 128, 384, 5, 1)
    conv(sd, "update_block.flow_head.conv1", 256, 128, 3)
    conv(sd, "update_block.flow_head.conv2", 2, 256, 3)
    conv(sd, "update_block.mask.0", 256, 128, 3)
    conv(sd, "update_block.mask.2", 576, 256, 1)
    return {f"module.{k}": v for k, v in sd.items()}


def test_raft_conversion_tree_identity():
    sd = build_raft_things_state_dict()
    converted = convert_raft_state_dict(sd)

    raft = RAFT(iters=2)
    img = jnp.zeros((1, 64, 96, 3))
    reference = raft.init(jax.random.PRNGKey(0), img, img)

    problems = validate_against(converted, reference)
    assert not problems, problems

    # converted weights must run
    out = raft.apply(converted, img, img)
    assert np.isfinite(np.asarray(out)).all()


def test_unknown_key_rejected():
    with pytest.raises(KeyError, match="unmapped"):
        convert_raft_state_dict({"module.surprise.weight": np.zeros((1, 1, 3, 3))})
