"""LR schedulers and flow-loss tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from vsr_tpu.train.flow_losses import (
    flow_warp_loss,
    second_order_smoothness_loss,
    smoothness_loss,
    ternary_loss,
)
from vsr_tpu.train.lr_schedulers import (
    cosine_annealing_restart_lr,
    multi_step_restart_lr,
)


class TestMultiStepRestart:
    def test_step_decay(self):
        s = multi_step_restart_lr(1.0, milestones=[10, 20], gamma=0.1)
        assert float(s(0)) == pytest.approx(1.0)
        assert float(s(10)) == pytest.approx(0.1)
        assert float(s(25)) == pytest.approx(0.01)

    def test_restart_resets(self):
        s = multi_step_restart_lr(1.0, milestones=[10], gamma=0.1,
                                  restarts=[0, 50], restart_weights=[1.0, 0.5])
        assert float(s(30)) == pytest.approx(0.1)
        # at restart, counter resets and weight applies
        assert float(s(50)) == pytest.approx(0.5)
        assert float(s(65)) == pytest.approx(0.05)


class TestCosineRestart:
    def test_endpoints(self):
        s = cosine_annealing_restart_lr(1.0, periods=[100], eta_min=0.0)
        assert float(s(0)) == pytest.approx(1.0)
        assert float(s(50)) == pytest.approx(0.5, abs=1e-6)
        assert float(s(99)) == pytest.approx(0.0, abs=1e-3)

    def test_restart_weight(self):
        s = cosine_annealing_restart_lr(
            1.0, periods=[100, 100], restart_weights=[1.0, 0.5], eta_min=0.0)
        assert float(s(100)) == pytest.approx(0.5)


class TestSmoothness:
    def test_constant_flow_zero(self):
        flow = jnp.ones((1, 8, 8, 2)) * 3.0
        mask = jnp.ones((1, 8, 8, 1))
        assert float(smoothness_loss(flow, mask)) == pytest.approx(0.0)
        assert float(second_order_smoothness_loss(flow, mask)) == pytest.approx(0.0)

    def test_linear_flow_second_order_zero(self):
        ramp = jnp.arange(8.0)[None, None, :, None]
        flow = jnp.broadcast_to(ramp, (1, 8, 8, 2))
        mask = jnp.ones((1, 8, 8, 1))
        assert float(smoothness_loss(flow, mask)) > 0
        assert float(second_order_smoothness_loss(flow, mask)) == pytest.approx(
            0.0, abs=1e-6)


class TestTernary:
    def test_identical_frames_zero(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
        mask = jnp.ones((1, 16, 16, 1))
        assert float(ternary_loss(img, img, mask)) == pytest.approx(0.0, abs=1e-6)

    def test_different_frames_positive(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
        mask = jnp.ones((1, 16, 16, 1))
        assert float(ternary_loss(a, b, mask)) > 0.01

    def test_flow_warp_loss_zero_flow(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
        flow = jnp.zeros((1, 16, 16, 2))
        mask = jnp.ones((1, 16, 16, 1))
        assert float(flow_warp_loss(img, img, flow, mask)) == pytest.approx(
            0.0, abs=1e-6)


class TestDeviceInfo:
    def test_accelerator_snapshot(self):
        from vsr_tpu.utils.device import Accelerator

        acc = Accelerator.instance()
        assert acc.info.num_devices >= 1
        assert isinstance(acc.name, str)
        # forced-cpu test env
        assert acc.info.platform == "cpu"
        assert acc.adaptive_clip_len(50, 120, 640) >= 10
