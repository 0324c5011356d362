"""ProPainter converter tests: synthetic torch-layout checkpoints convert to
exactly the trees the flax models initialize."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.convert.mapping import validate_against
from vsr_tpu.convert.torch_propainter import (
    convert_flow_completion,
    convert_propainter_generator,
)
from vsr_tpu.models.propainter.flow_completion import RecurrentFlowCompleteNet
from vsr_tpu.models.propainter.generator import ProPainterGenerator


def conv2d(sd, name, cout, cin, kh, kw=None, bias=True):
    kw = kw if kw is not None else kh
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    sd[f"{name}.weight"] = 0.02 * rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
    if bias:
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)


def conv3d(sd, name, cout, cin, kd, kh, kw, bias=True):
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    sd[f"{name}.weight"] = 0.02 * rng.standard_normal((cout, cin, kd, kh, kw)).astype(np.float32)
    if bias:
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)


def linear(sd, name, cout, cin):
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    sd[f"{name}.weight"] = 0.02 * rng.standard_normal((cout, cin)).astype(np.float32)
    sd[f"{name}.bias"] = np.zeros((cout,), np.float32)


def layernorm(sd, name, c):
    sd[f"{name}.weight"] = np.ones((c,), np.float32)
    sd[f"{name}.bias"] = np.zeros((c,), np.float32)


def deform_align(sd, base, channels, in_channels, cond_channels, groups=16):
    conv2d(sd, f"{base}.conv_offset.0", channels, cond_channels, 3)
    conv2d(sd, f"{base}.conv_offset.2", channels, channels, 3)
    conv2d(sd, f"{base}.conv_offset.4", channels, channels, 3)
    conv2d(sd, f"{base}.conv_offset.6", 27 * groups, channels, 3)
    conv2d(sd, base, channels, in_channels, 3)


def build_generator_state_dict(channel=128, hidden=512, depths=8):
    sd = {}
    widths = [64, 64, 128, 256, 384, 512, 384, 256, channel]
    ins = [5, 64, 64, 128, 256, 640, 768, 640, 512]
    groups = [1, 1, 1, 1, 1, 2, 4, 8, 1]
    for i, (cin, cout, g) in enumerate(zip(ins, widths, groups)):
        # torch grouped conv weight stores cin/groups on the input dim
        conv2d(sd, f"encoder.layers.{2 * i}", cout, cin // g, 3)
    linear(sd, "ss.embedding", hidden, 49 * channel)
    linear(sd, "sc.embedding", 49 * channel, hidden)
    conv2d(sd, "sc.bias_conv", channel, channel, 3)
    conv2d(sd, "decoder.0.conv", 128, channel, 3)
    conv2d(sd, "decoder.2", 64, 128, 3)
    conv2d(sd, "decoder.4.conv", 64, 64, 3)
    conv2d(sd, "decoder.6", 3, 64, 3)
    for d in ("backward_1", "forward_1"):
        deform_align(sd, f"feat_prop_module.deform_align.{d}",
                     channel, channel, 2 * channel + 2 + 1 + 2)
        conv2d(sd, f"feat_prop_module.backbone.{d}.0", channel, 2 * channel + 2, 3)
        conv2d(sd, f"feat_prop_module.backbone.{d}.2", channel, channel, 3)
    conv2d(sd, "feat_prop_module.fuse.0", channel, 2 * channel + 2, 3)
    conv2d(sd, "feat_prop_module.fuse.2", channel, channel, 3)
    for i in range(depths):
        b = f"transformers.transformer.{i}"
        for lin in ("query", "key", "value", "proj"):
            linear(sd, f"{b}.attention.{lin}", hidden, hidden)
        # depthwise pool conv (C, 1, 4, 4)
        sd[f"{b}.attention.pool_layer.weight"] = np.full(
            (hidden, 1, 4, 4), 1.0 / 16, np.float32)
        sd[f"{b}.attention.pool_layer.bias"] = np.zeros((hidden,), np.float32)
        layernorm(sd, f"{b}.norm1", hidden)
        layernorm(sd, f"{b}.norm2", hidden)
        linear(sd, f"{b}.mlp.fc1.0", 1960, hidden)
        linear(sd, f"{b}.mlp.fc2.1", hidden, 1960)
    return sd


def build_flow_completion_state_dict():
    sd = {}
    conv3d(sd, "downsample.0", 32, 3, 1, 5, 5)
    conv3d(sd, "encoder1.0.conv1.0", 32, 32, 1, 3, 3)
    conv3d(sd, "encoder1.0.conv2.0", 32, 32, 3, 1, 1)
    conv3d(sd, "encoder1.2.conv1.0", 64, 32, 1, 3, 3)
    conv3d(sd, "encoder1.2.conv2.0", 64, 64, 3, 1, 1)
    conv3d(sd, "encoder2.0.conv1.0", 64, 64, 1, 3, 3)
    conv3d(sd, "encoder2.0.conv2.0", 64, 64, 3, 1, 1)
    conv3d(sd, "encoder2.2.conv1.0", 128, 64, 1, 3, 3)
    conv3d(sd, "encoder2.2.conv2.0", 128, 128, 3, 1, 1)
    for i, name in ((0, "mid_dilation.0"), (2, "mid_dilation.2"), (4, "mid_dilation.4")):
        conv3d(sd, name, 128, 128, 1, 3, 3)
    for d in ("backward_", "forward_"):
        deform_align(sd, f"feat_prop_module.deform_align.{d}",
                     128, 256, 3 * 128)
        conv2d(sd, f"feat_prop_module.backbone.{d}.0", 128,
               (2 + (0 if d == "backward_" else 1)) * 128, 3)
        conv2d(sd, f"feat_prop_module.backbone.{d}.2", 128, 128, 3)
    conv2d(sd, "feat_prop_module.fusion", 128, 256, 1)
    conv2d(sd, "decoder2.0", 128, 128, 3)
    conv2d(sd, "decoder2.2.conv", 64, 128, 3)
    conv2d(sd, "decoder1.0", 64, 64, 3)
    conv2d(sd, "decoder1.2.conv", 32, 64, 3)
    conv2d(sd, "upsample.0", 32, 32, 3)
    conv2d(sd, "upsample.2.conv", 2, 32, 3)
    conv2d(sd, "edgeDetector.projection.0", 16, 2, 3)
    conv2d(sd, "edgeDetector.mid_layer_1.0", 16, 16, 3)
    conv2d(sd, "edgeDetector.mid_layer_2.0", 16, 16, 3)
    conv2d(sd, "edgeDetector.out_layer", 1, 16, 1)
    return sd


def test_generator_conversion_tree_identity():
    sd = build_generator_state_dict()
    converted = convert_propainter_generator(sd)
    gen = ProPainterGenerator()
    # smallest legal shapes: H,W div by 4; token grid matches
    frames = jnp.zeros((1, 3, 64, 64, 3))
    masks = jnp.zeros((1, 3, 64, 64, 1))
    flows = (jnp.zeros((1, 1, 64, 64, 2)), jnp.zeros((1, 1, 64, 64, 2)))
    reference = gen.init(jax.random.PRNGKey(0), frames, flows, masks, masks, 2)
    problems = validate_against(converted, reference)
    assert not problems, problems[:10]


def test_flow_completion_conversion_tree_identity():
    sd = build_flow_completion_state_dict()
    converted = convert_flow_completion(sd)
    net = RecurrentFlowCompleteNet()
    mf = jnp.zeros((1, 2, 64, 64, 2))
    mm = jnp.zeros((1, 2, 64, 64, 1))
    reference = net.init(jax.random.PRNGKey(0), mf, mm, train=True)
    problems = validate_against(converted, reference)
    assert not problems, problems[:10]
