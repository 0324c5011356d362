"""Converter tests: a synthetic torch-layout STTN state dict must convert into
exactly the param tree the flax model initializes, and params must round-trip
through the npz format."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from vsr_tpu.convert.params_io import load_params, save_params
from vsr_tpu.convert.torch_sttn import convert_sttn_state_dict
from vsr_tpu.models.sttn import STTNGenerator


def synthetic_torch_state_dict(channel=256, stack=8):
    """Build a state dict with the reference checkpoint's key naming/shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((cout,)).astype(np.float32)

    conv("encoder.0", 64, 3, 3)
    conv("encoder.2", 64, 64, 3)
    conv("encoder.4", 128, 64, 3)
    conv("encoder.6", channel, 128, 3)
    for i in range(stack):
        for emb in ("query_embedding", "key_embedding", "value_embedding"):
            conv(f"transformer.{i}.attention.{emb}", channel, channel, 1)
        conv(f"transformer.{i}.attention.output_linear.0", channel, channel, 3)
        conv(f"transformer.{i}.feed_forward.conv.0", channel, channel, 3)
        conv(f"transformer.{i}.feed_forward.conv.2", channel, channel, 3)
    conv("decoder.0.conv", 128, channel, 3)
    conv("decoder.2", 64, 128, 3)
    conv("decoder.4.conv", 64, 64, 3)
    conv("decoder.6", 3, 64, 3)
    return sd


def test_converted_tree_matches_model_init():
    sd = synthetic_torch_state_dict(channel=16, stack=2)
    converted = convert_sttn_state_dict(sd)

    model = STTNGenerator(variant="auto", channel=16, stack_num=2,
                          patchsizes_override=((4, 3), (2, 2)))
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 24, 32, 3)))

    flat_c = traverse_util.flatten_dict(converted, sep="/")
    flat_r = traverse_util.flatten_dict(ref, sep="/")
    assert set(flat_c) == set(flat_r)
    for k in flat_r:
        assert flat_c[k].shape == flat_r[k].shape, k

    # converted params must actually run
    out = model.apply(converted, jnp.zeros((1, 2, 24, 32, 3)))
    assert out.shape == (1, 2, 24, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        convert_sttn_state_dict({"mystery.layer.weight": np.zeros((1, 1, 3, 3))})


def test_params_npz_round_trip(tmp_path):
    sd = synthetic_torch_state_dict(channel=16, stack=2)
    params = convert_sttn_state_dict(sd)
    path = str(tmp_path / "params.npz")
    save_params(path, params)
    loaded = load_params(path)
    flat_a = traverse_util.flatten_dict(params, sep="/")
    flat_b = traverse_util.flatten_dict(loaded, sep="/")
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]))
