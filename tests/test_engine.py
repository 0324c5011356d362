"""Window-engine tests.

The load-bearing property: the static-shape batched window sweep (padding +
key masks + lax.map) must reproduce a naive reference-style ragged loop
(sequential windows, python list indexing) frame for frame.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.inpaint.engine import (
    STTNWindowEngine,
    build_window_index,
    neighbor_ids,
    ref_ids,
    window_starts,
)
from vsr_tpu.models.sttn import STTNGenerator

TINY_PATCHES = ((4, 3), (2, 2))
H, W = 24, 32


@pytest.fixture(scope="module")
def tiny_model():
    model = STTNGenerator(variant="auto", channel=16, stack_num=2,
                          patchsizes_override=TINY_PATCHES)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, H, W, 3)))
    return model, params


class TestWindowIndex:
    def test_reference_window_semantics(self):
        # T=20, stride=5, ref=10: windows at 0,5,10,15
        idx, valid, n_max = build_window_index(20, 20, 5, 10)
        assert n_max == 11
        assert idx.shape[0] == 4
        # window at f=0: neighbors 0..5, refs = multiples of 10 not in neighbors
        assert list(idx[0, :6]) == [0, 1, 2, 3, 4, 5]
        assert valid[0, :6].all() and not valid[0, 6:n_max].any()
        refs0 = idx[0, n_max:][valid[0, n_max:]]
        assert list(refs0) == [10]
        # window at f=10: neighbors 5..15, refs none (0? 0 not in 5..15 -> ref 0)
        ns = neighbor_ids(10, 20, 5)
        assert ns == list(range(5, 16))
        assert ref_ids(ns, 20, 10) == [0]

    def test_padded_tail_windows_invalid(self):
        idx, valid, n_max = build_window_index(7, 20, 5, 10)
        # windows at 0 and 5 valid; 10, 15 fully invalid
        assert valid[0].any() and valid[1].any()
        assert not valid[2].any() and not valid[3].any()
        # neighbors clamped to t_valid
        assert list(idx[1, :n_max][valid[1, :n_max]]) == [0, 1, 2, 3, 4, 5, 6]

    def test_ref_excluded_when_neighbor(self):
        ns = neighbor_ids(0, 20, 5)  # 0..5
        assert 0 not in ref_ids(ns, 20, 10)


def naive_reference_sweep(model, params, frames_bgr, stride, ref_length):
    """Ragged reference-order loop (sttn_auto_inpaint.py:122-164 semantics)."""
    t = len(frames_bgr)
    x = jnp.asarray(frames_bgr[..., ::-1].astype(np.float32) / 255.0 * 2 - 1)
    feats = model.apply(params, x, method=model.encode)
    comp = [None] * t
    for f in window_starts(t, stride):
        ns = neighbor_ids(f, t, stride)
        rs = ref_ids(ns, t, ref_length)
        sel = feats[np.asarray(ns + rs)]
        out = model.apply(params, sel[None], None, None, method=model.transform)
        dec = model.apply(params, out[0, : len(ns)], method=model.decode)
        pred = np.asarray(
            jnp.clip((dec + 1) * 0.5 * 255.0, 0, 255).astype(jnp.uint8)[..., ::-1]
        )
        for i, fi in enumerate(ns):
            img = pred[i]
            comp[fi] = (
                img
                if comp[fi] is None
                else comp[fi].astype(np.float32) * 0.5 + img.astype(np.float32) * 0.5
            )
    return np.stack([c.astype(np.uint8) for c in comp])


def assert_mostly_equal(a, b, max_off_by_one=0.01):
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() <= max_off_by_one


class TestEngineEquivalence:
    @pytest.mark.parametrize("t_valid", [20, 13, 6])
    def test_matches_naive_sweep(self, tiny_model, t_valid):
        model, params = tiny_model
        rng = np.random.default_rng(42)
        frames = rng.integers(0, 256, (t_valid, H, W, 3), dtype=np.uint8)
        engine = STTNWindowEngine(
            model, params, clip_len=20, input_hw=(H, W),
            stride=5, ref_length=10, window_batch=2,
        )
        got = engine.process_chunk(frames)
        want = naive_reference_sweep(model, params, frames, 5, 10)
        assert got.shape == want.shape
        assert_mostly_equal(got, want)

    def test_window_batch_invariance(self, tiny_model):
        model, params = tiny_model
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, (20, H, W, 3), dtype=np.uint8)
        outs = []
        for wb in (0, 1, 4):
            engine = STTNWindowEngine(
                model, params, clip_len=20, input_hw=(H, W),
                stride=5, ref_length=10, window_batch=wb,
            )
            outs.append(engine.process_chunk(frames))
        assert_mostly_equal(outs[0], outs[1])
        assert_mostly_equal(outs[0], outs[2])


class TestOutRowsSlicing:
    def test_sliced_output_matches_full(self, tiny_model):
        """out_rows returns exactly the same rows the full output would."""
        model, params = tiny_model
        rng = np.random.default_rng(11)
        frames = rng.integers(0, 256, (10, H, W, 3), dtype=np.uint8)
        full_engine = STTNWindowEngine(
            model, params, clip_len=10, input_hw=(H, W),
            stride=3, ref_length=5, window_batch=2)
        sliced_engine = STTNWindowEngine(
            model, params, clip_len=10, input_hw=(H, W),
            stride=3, ref_length=5, window_batch=2, out_rows=(6, 18))
        full = full_engine.process_chunk(frames)
        sliced = sliced_engine.process_chunk(frames)
        assert sliced.shape == (10, 12, W, 3)
        np.testing.assert_array_equal(sliced, full[:, 6:18])


class TestMeshSharding:
    def test_sharded_windows_match_single_device(self, tiny_model, cpu_mesh):
        """Window-axis (sp) sharding over the virtual mesh reproduces the
        single-device result."""
        model, params = tiny_model
        rng = np.random.default_rng(21)
        frames = rng.integers(0, 256, (20, H, W, 3), dtype=np.uint8)
        single = STTNWindowEngine(
            model, params, clip_len=20, input_hw=(H, W),
            stride=5, ref_length=10, window_batch=2)
        sharded = STTNWindowEngine(
            model, params, clip_len=20, input_hw=(H, W),
            stride=5, ref_length=10, mesh=cpu_mesh)
        a = single.process_chunk(frames)
        b = sharded.process_chunk(frames)
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() <= 0.01


class TestEquivalenceAcrossConfigs:
    @pytest.mark.parametrize("stride,ref_length,t_valid", [
        (3, 5, 18), (7, 4, 15), (2, 9, 11), (4, 4, 16),
    ])
    def test_matches_naive_sweep_configs(self, tiny_model, stride, ref_length,
                                         t_valid):
        """The static engine must track the ragged reference semantics for
        arbitrary stride/ref-length combinations, not just the defaults."""
        model, params = tiny_model
        rng = np.random.default_rng(stride * 100 + ref_length)
        frames = rng.integers(0, 256, (t_valid, H, W, 3), dtype=np.uint8)
        engine = STTNWindowEngine(
            model, params, clip_len=t_valid + 2, input_hw=(H, W),
            stride=stride, ref_length=ref_length, window_batch=3,
        )
        got = engine.process_chunk(frames)
        want = naive_reference_sweep(model, params, frames, stride, ref_length)
        assert_mostly_equal(got, want)
