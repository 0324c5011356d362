"""ProPainter stack tests: RAFT, flow completion, generator, and the staged
wrapper on tiny shapes with shrunken models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.config import Config
from vsr_tpu.models.propainter.flow_completion import RecurrentFlowCompleteNet
from vsr_tpu.models.propainter.generator import (
    ProPainterGenerator,
    fb_consistency_check,
    image_propagation,
)
from vsr_tpu.models.propainter.raft import (
    RAFT,
    build_corr_pyramid,
    convex_upsample_flow,
    lookup_corr,
    raft_bi_flows,
)


class TestRAFTComponents:
    def test_corr_pyramid_shapes(self):
        f1 = jnp.zeros((2, 8, 12, 16))
        pyr = build_corr_pyramid(f1, f1, num_levels=3)
        assert pyr[0].shape == (2 * 96, 8, 12, 1)
        assert pyr[1].shape == (2 * 96, 4, 6, 1)
        assert pyr[2].shape == (2 * 96, 2, 3, 1)

    def test_corr_self_similarity(self):
        """Identical feature maps: max correlation at zero displacement."""
        rng = np.random.default_rng(0)
        f = jnp.asarray(rng.standard_normal((1, 4, 5, 8)).astype(np.float32))
        pyr = build_corr_pyramid(f, f, num_levels=1)
        ys, xs = np.meshgrid(np.arange(4), np.arange(5), indexing="ij")
        coords = jnp.asarray(np.stack([xs, ys], -1)[None].astype(np.float32))
        corr = lookup_corr(pyr, coords, radius=1)  # [1, 4, 5, 9]
        corr = np.asarray(corr).reshape(20, 9)
        # center tap (index 4) should be the max for most positions
        assert (corr.argmax(-1) == 4).mean() > 0.8

    def test_lookup_onehot_matches_patch(self):
        """The round-3 gather-free contraction lookup ("onehot") must be
        numerically equivalent to the round-2 gather path ("patch") —
        including fractional centroids, out-of-range windows (zero-padding
        semantics), and multi-level coordinate scaling."""
        rng = np.random.default_rng(7)
        f1 = jnp.asarray(rng.standard_normal((2, 8, 12, 16)).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((2, 8, 12, 16)).astype(np.float32))
        pyr = build_corr_pyramid(f1, f2, num_levels=3)
        # centroids spanning in-bounds, fractional, and far out-of-bounds
        coords = rng.uniform(-6.0, 18.0, (2, 8, 12, 2)).astype(np.float32)
        coords = jnp.asarray(coords)
        for radius in (1, 4):
            a = lookup_corr(pyr, coords, radius=radius, method="onehot")
            b = lookup_corr(pyr, coords, radius=radius, method="patch")
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_convex_upsample_shapes(self):
        flow = jnp.zeros((1, 4, 6, 2))
        mask = jnp.zeros((1, 4, 6, 576))
        up = convex_upsample_flow(flow, mask)
        assert up.shape == (1, 32, 48, 2)

    def test_convex_upsample_uniform(self):
        """Uniform flow upsamples to 8x the value away from borders (border
        patches average in zero padding)."""
        flow = jnp.full((1, 4, 6, 2), 1.5)
        mask = jnp.zeros((1, 4, 6, 576))  # softmax -> uniform weights
        up = np.asarray(convex_upsample_flow(flow, mask))
        assert up.shape == (1, 32, 48, 2)
        np.testing.assert_allclose(up[:, 8:24, 8:40], 12.0, atol=1e-4)

    def test_encode_once_matches_call(self):
        """encode() + forward_encoded() must reproduce __call__ exactly, and
        raft_bi_flows (whole-clip encode-once) must match per-pair __call__ —
        the wrapper's flow stage relies on this equivalence."""
        raft = RAFT(iters=3, corr_levels=2, corr_radius=2)
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.uniform(-1, 1, (2, 32, 48, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (2, 32, 48, 3)).astype(np.float32))
        params = raft.init(jax.random.PRNGKey(0), a, b)
        ref = np.asarray(raft.apply(params, a, b))
        f1, net, inp = raft.apply(params, a, method="encode")
        f2, _, _ = raft.apply(params, b, method="encode")
        out = np.asarray(raft.apply(params, f1, f2, net, inp,
                                    method="forward_encoded"))
        np.testing.assert_array_equal(ref, out)

        frames = jnp.stack([a[0], b[0], a[1], b[1]])[None]  # [1, 4, H, W, 3]
        ff, fb = raft_bi_flows(raft, params, frames)
        for t in range(3):
            np.testing.assert_allclose(
                np.asarray(ff[0, t]),
                np.asarray(raft.apply(params, frames[:, t], frames[:, t + 1])
                           )[0], rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(fb[0, t]),
                np.asarray(raft.apply(params, frames[:, t + 1], frames[:, t])
                           )[0], rtol=1e-5, atol=1e-5)

    def test_raft_zero_motion(self):
        """Identical frames -> near-zero flow (even with random weights the
        correlation argmax is at zero displacement; flow stays tiny)."""
        raft = RAFT(iters=4)
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32))
        params = raft.init(jax.random.PRNGKey(0), img, img)
        flow = np.asarray(raft.apply(params, img, img))
        assert flow.shape == (1, 64, 96, 2)
        assert np.isfinite(flow).all()


class TestBF16CorrParityGate:
    def test_bf16_corr_flow_epe_bound(self):
        """Parity gate for the bf16 correlation pyramid (VERDICT r4 #3): on a
        structured translating scene the flow from corr_dtype=bfloat16 must
        stay within a tight EPE of the fp32 pyramid. Measured on this
        geometry: mean 0.022 px / max 0.072 px against ~11 px flows — the
        gate bounds at 5x that so real regressions trip it while rounding
        drift does not. This is the evidence that lets the wrapper default
        the pyramid to bf16 on TPU (half the lookup's gather bytes)."""
        import scipy.ndimage

        from vsr_tpu.models.propainter.raft import RAFT

        rng = np.random.default_rng(5)
        base = scipy.ndimage.gaussian_filter(
            rng.standard_normal((80, 96, 3)), (6, 6, 0))
        base = (base - base.min()) / (base.max() - base.min()) * 2 - 1
        x1 = jnp.asarray(base[None, 8:72, 8:88].astype(np.float32))
        x2 = jnp.asarray(np.roll(base, (-2, -3), axis=(0, 1))
                         [None, 8:72, 8:88].astype(np.float32))

        kw = dict(iters=8, corr_levels=2, corr_radius=3)
        m32 = RAFT(corr_dtype=jnp.float32, **kw)
        params = m32.init(jax.random.PRNGKey(0), x1, x2)
        f32 = np.asarray(m32.apply(params, x1, x2))
        fbf = np.asarray(RAFT(corr_dtype=jnp.bfloat16, **kw).apply(
            params, x1, x2))
        epe = np.sqrt(((f32 - fbf) ** 2).sum(-1))
        assert epe.mean() <= 0.1, epe.mean()
        assert epe.max() <= 0.35, epe.max()


class TestFBConsistency:
    def test_consistent_flows_valid(self):
        flow = jnp.full((1, 8, 8, 2), 1.0)
        valid = np.asarray(fb_consistency_check(flow, -flow))
        assert valid.mean() > 0.5

    def test_inconsistent_flows_invalid(self):
        fw = jnp.full((1, 8, 8, 2), 10.0)
        bw = jnp.full((1, 8, 8, 2), 10.0)  # not inverse -> inconsistent
        valid = np.asarray(fb_consistency_check(fw, bw))
        assert valid.mean() < 0.5


class TestImagePropagation:
    def test_hole_filled_from_neighbor(self):
        """Holes in frames 1+2 with zero flow: the backward sweep can't help
        (the next frames are masked too), so the forward sweep must carry
        frame 0's content into frame 1's hole — reference order semantics."""
        frames = np.zeros((1, 3, 16, 16, 3), np.float32)
        frames[:, 0] = 0.7  # source content
        masks = np.zeros((1, 3, 16, 16, 1), np.float32)
        masks[:, 1:, 4:12, 4:12] = 1.0  # holes in frames 1 and 2
        flows = jnp.zeros((1, 2, 16, 16, 2))
        prop, upd = image_propagation(
            jnp.asarray(frames * (1 - masks)), jnp.asarray(masks),
            flows, flows)
        prop, upd = np.asarray(prop), np.asarray(upd)
        assert prop[0, 1, 8, 8, 0] == pytest.approx(0.7, abs=1e-5)
        assert prop[0, 2, 8, 8, 0] == pytest.approx(0.7, abs=1e-5)
        # updated masks close once content arrives
        assert upd[:, 1].sum() < masks[:, 1].sum()

    def test_unmasked_frames_pass_through(self):
        rng = np.random.default_rng(3)
        frames = rng.uniform(-1, 1, (1, 3, 16, 16, 3)).astype(np.float32)
        masks = np.zeros((1, 3, 16, 16, 1), np.float32)
        flows = jnp.zeros((1, 2, 16, 16, 2))
        prop, _ = image_propagation(
            jnp.asarray(frames), jnp.asarray(masks), flows, flows)
        np.testing.assert_allclose(np.asarray(prop), frames, atol=1e-5)


class TestFlowCompletion:
    def test_combine_flow_pastes_holes_only(self):
        f = np.ones((1, 2, 8, 8, 2), np.float32)
        pred = np.full((1, 2, 8, 8, 2), 5.0, np.float32)
        masks = np.zeros((1, 3, 8, 8, 1), np.float32)
        masks[:, :, :4] = 1.0
        out_f, out_b = RecurrentFlowCompleteNet.combine_flow(
            (jnp.asarray(f), jnp.asarray(f)),
            (jnp.asarray(pred), jnp.asarray(pred)), jnp.asarray(masks))
        out_f = np.asarray(out_f)
        assert (out_f[:, :, :4] == 5.0).all()
        assert (out_f[:, :, 4:] == 1.0).all()


class TestPropainterWrapper:
    @pytest.fixture(scope="class")
    def inpainter(self):
        from vsr_tpu.inpaint.propainter import PropainterInpainter

        cfg = Config()
        cfg.compute_dtype = "float32"
        cfg.propainter_raft_iters = 2
        # corr_levels=2: the test band is only 24px high (3 feature rows),
        # too shallow for the production 4-level pyramid
        return PropainterInpainter(
            config=cfg,
            generator_kwargs=dict(channel=16, hidden=32, depths=2, n_head=2,
                                  window_size=(3, 4), pool_size=(2, 2)),
            raft_kwargs=dict(corr_levels=2, corr_radius=2),
        )

    def test_end_to_end_band(self, inpainter):
        rng = np.random.default_rng(2)
        frames = [rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
                  for _ in range(6)]
        mask = np.zeros((96, 128), np.uint8)
        mask[70:90, 20:100] = 255
        out = inpainter(frames, mask)
        assert len(out) == 6
        assert out[0].shape == (96, 128, 3)
        # untouched far above the band
        np.testing.assert_array_equal(out[1][:40], frames[1][:40])
        # the hole was rewritten
        assert np.abs(out[1][70:90, 20:100].astype(int)
                      - frames[1][70:90, 20:100].astype(int)).mean() > 1

    def test_ref_index(self):
        from vsr_tpu.inpaint.propainter import get_ref_index

        assert get_ref_index(0, [0, 1, 2], 40, ref_stride=10) == [10, 20, 30]
        refs = get_ref_index(20, list(range(15, 26)), 100, 10, 4)
        assert all(r not in range(15, 26) for r in refs)

    def test_dilate_mask(self):
        from vsr_tpu.inpaint.propainter import dilate_mask

        m = np.zeros((10, 10), np.uint8)
        m[5, 5] = 255
        d = dilate_mask(m, 2)
        assert d.sum() > 1
        assert d[5, 3] == 1.0 and d[5, 2] == 0.0


class TestOutpainting:
    def test_outpaint_extends_fov(self, inpainter=None):
        from vsr_tpu.config import Config
        from vsr_tpu.inpaint.propainter import PropainterInpainter

        cfg = Config()
        cfg.compute_dtype = "float32"
        cfg.propainter_raft_iters = 2
        inp = PropainterInpainter(
            config=cfg,
            generator_kwargs=dict(channel=16, hidden=32, depths=1, n_head=2,
                                  window_size=(3, 4), pool_size=(2, 2)),
            raft_kwargs=dict(corr_levels=2, corr_radius=2),
        )
        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
                  for _ in range(4)]
        out = inp.outpaint(frames, scale=(1.25, 1.25))
        assert len(out) == 4
        eh, ew = out[0].shape[:2]
        assert eh % 8 == 0 and ew % 8 == 0
        assert eh >= 72 and ew >= 112
        # original content preserved in the center
        y0, x0 = (eh - 64) // 2, (ew - 96) // 2
        np.testing.assert_array_equal(
            out[1][y0 : y0 + 64, x0 : x0 + 96], frames[1])


class TestStaticWindows:
    def test_static_matches_dynamic(self, monkeypatch):
        """The padded static window scheduling must reproduce the ragged
        reference scheduling frame for frame."""
        from vsr_tpu.inpaint.propainter import PropainterInpainter

        cfg = Config()
        cfg.compute_dtype = "float32"
        cfg.propainter_raft_iters = 2
        kw = dict(
            config=cfg,
            generator_kwargs=dict(channel=16, hidden=32, depths=2, n_head=2,
                                  window_size=(3, 4), pool_size=(2, 2)),
            raft_kwargs=dict(corr_levels=2, corr_radius=2),
        )
        rng = np.random.default_rng(9)
        frames = [rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
                  for _ in range(12)]
        mask = np.zeros((48, 64), np.uint8)
        mask[16:32, 16:48] = 255

        inp_static = PropainterInpainter(**kw)
        assert inp_static.static_windows
        out_static = inp_static.inpaint(frames, mask)

        monkeypatch.setenv("VSR_PP_DYNAMIC_WINDOWS", "1")
        inp_dyn = PropainterInpainter(**kw)
        assert not inp_dyn.static_windows
        out_dyn = inp_dyn.inpaint(frames, mask)

        # Interior windows are exact. Boundary windows differ slightly by
        # design: the reference's t_dilation key subsets are position-based
        # (arange(i, T, 2)), so ragged boundary selections place refs at
        # different parities than any fixed-shape padding can reproduce.
        stride = inp_static.neighbor_stride
        diffs = [np.abs(a.astype(int) - b.astype(int))
                 for a, b in zip(out_static, out_dyn)]
        for d in diffs[stride + 1 : len(diffs) - stride - 1]:
            assert d.max() <= 1
        for d in diffs:
            assert d.mean() < 1.0  # boundary windows stay close


class TestWindowSkip:
    def test_window_skip_matches_dense(self, monkeypatch):
        """The static hole-bearing window-skip (VERDICT r4 #3) must be a pure
        optimization: the masked-branch attention runs only for windows the
        host-computed set selects, and the composite equals the dense
        both-branches `where` path bit for bit (identical einsums on the
        gathered subset; the host set replicates the traced occupancy test
        for a frame-constant mask)."""
        from vsr_tpu.inpaint.propainter import PropainterInpainter

        cfg = Config()
        cfg.compute_dtype = "float32"
        cfg.propainter_raft_iters = 2
        kw = dict(
            config=cfg,
            generator_kwargs=dict(channel=16, hidden=32, depths=2, n_head=2,
                                  window_size=(3, 4), pool_size=(2, 2)),
            raft_kwargs=dict(corr_levels=2, corr_radius=2),
        )
        rng = np.random.default_rng(17)
        frames = [rng.integers(0, 256, (64, 128, 3), dtype=np.uint8)
                  for _ in range(8)]
        mask = np.zeros((64, 128), np.uint8)
        mask[40:52, 40:64] = 255  # partial: the right window column stays clean

        inp = PropainterInpainter(**kw)
        # the set must be a strict subset for this geometry or the test
        # proves nothing
        from vsr_tpu.inpaint.propainter import dilate_mask

        mw = inp._masked_window_set(dilate_mask(mask, inp.mask_dilation))
        assert mw is not None and len(mw) > 0  # strict subset, else no test

        out_skip = inp.inpaint([f.copy() for f in frames], mask)

        monkeypatch.setenv("VSR_PP_NO_WINDOW_SKIP", "1")
        inp_dense = PropainterInpainter(**kw)
        inp_dense.raft_params = inp.raft_params
        inp_dense.flow_params = inp.flow_params
        inp_dense.gen_params = inp.gen_params
        out_dense = inp_dense.inpaint([f.copy() for f in frames], mask)

        for a, b in zip(out_skip, out_dense):
            np.testing.assert_array_equal(a, b)
