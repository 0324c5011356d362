"""Paddle PP-OCRv5 det converter tests: the full name mapping is exercised
against synthetic checkpoints that enumerate the exact Paddle parameter
program (convert.paddle_dbnet.paddle_state_spec), at production sizes.

Bar set by VERDICT round 1 item 2: zero-unmapped-keys conversion +
tree-identity against DBNet.init, same rigor as test_convert_propainter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.convert.mapping import validate_against
from vsr_tpu.convert.paddle_dbnet import (
    convert_paddle_det_state_dict,
    paddle_state_spec,
    validate_state_dict,
)
from vsr_tpu.detect.dbnet import DBNet


def _random_state_dict(spec, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in spec.items():
        if key.endswith("._variance"):
            sd[key] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("preset", ["mobile", "server"])
def test_full_program_tree_identity(preset):
    """Convert a synthetic full-size Paddle checkpoint; the resulting tree is
    identical (names + shapes) to DBNet.init's."""
    spec = paddle_state_spec(preset)
    sd = _random_state_dict(spec)
    variables = convert_paddle_det_state_dict(sd, preset)

    model = DBNet(preset=preset)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                     train=True)
    problems = validate_against(variables, ref)
    assert problems == [], problems[:10]

    # converted weights drive a real forward
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_unmapped_key_raises():
    spec = paddle_state_spec("mobile")
    sd = _random_state_dict(spec)
    sd["backbone.bogus_layer.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(KeyError):
        convert_paddle_det_state_dict(sd, "mobile")


@pytest.mark.parametrize("preset", ["mobile", "server"])
def test_pruned_thresh_branch_synthesized(preset):
    """Inference exports drop head.thresh.*; conversion must still produce
    the full tree (neutral defaults) and identical inference output."""
    spec = paddle_state_spec(preset)
    sd = _random_state_dict(spec, seed=1)
    full = convert_paddle_det_state_dict(sd, preset)
    pruned_sd = {k: v for k, v in sd.items()
                 if not k.startswith("head.thresh.")}
    assert len(pruned_sd) < len(sd)
    pruned = convert_paddle_det_state_dict(pruned_sd, preset)

    model = DBNet(preset=preset)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                     train=True)
    assert validate_against(pruned, ref) == []

    x = jnp.asarray(np.random.default_rng(2).normal(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(model.apply(full, x)), np.asarray(model.apply(pruned, x)),
        atol=0, rtol=0)


def test_validate_state_dict_reports_problems():
    spec = paddle_state_spec("mobile")
    sd = _random_state_dict(spec)
    assert validate_state_dict(sd, "mobile") == []
    sd.pop("backbone.conv1.conv.weight")
    sd["neck.extra.weight"] = np.zeros((1,), np.float32)
    sd["head.binarize.conv1.weight"] = np.zeros((1, 2, 3, 3), np.float32)
    problems = validate_state_dict(sd, "mobile")
    assert any(p.startswith("missing: backbone.conv1") for p in problems)
    assert any(p.startswith("unexpected: neck.extra") for p in problems)
    assert any(p.startswith("shape head.binarize") for p in problems)
