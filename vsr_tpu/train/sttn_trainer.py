"""STTN GAN trainer on a pjit device mesh.

Capability parity with the reference trainer (backend/tools/train/
trainer_sttn.py:17-319, config configs_sttn/youtube-vos.json): hinge
adversarial loss against a spectral-norm 3D-conv video discriminator, hole +
valid L1 on the generator, Adam(0, 0.99) lr 1e-4 with step decay
0.1^(min(it, niter_steady)//niter), periodic orbax checkpoints with full
resume.

Distribution: instead of DDP/NCCL (train_sttn.py:33-40), the train step is
jitted with batch inputs sharded over the mesh's "data" axis and (optionally)
conv output channels sharded over "model" — GSPMD inserts the grad
all-reduces and TP collectives over ICI. One process drives any mesh shape;
multi-host would add jax.distributed.initialize() without changing the step.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsr_tpu.models.discriminator import VideoDiscriminator
from vsr_tpu.models.sttn import STTNGenerator
from vsr_tpu.train.losses import adversarial_loss, masked_l1


@dataclass
class TrainConfig:
    # losses (ref configs_sttn/youtube-vos.json)
    hole_weight: float = 1.0
    valid_weight: float = 1.0
    adversarial_weight: float = 0.01
    gan_loss: str = "hinge"
    # optimizer
    lr: float = 1e-4
    beta1: float = 0.0
    beta2: float = 0.99
    # schedule
    iterations: int = 500_000
    niter: int = 150_000
    niter_steady: int = 300_000
    # data
    batch_size: int = 8
    sample_length: int = 5
    frame_w: int = 640
    frame_h: int = 120
    # checkpoints
    save_dir: str = "release_model"
    save_freq: int = 10_000
    log_freq: int = 100
    # scalar summaries (ref trainer_sttn.py:96-128 tensorboardX writers);
    # None disables. JSONL always; tensorboard(X) when importable.
    summary_dir: Optional[str] = None


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    gen_opt: Any
    dis_params: Any
    dis_vars: Any  # spectral-norm power-iteration state
    dis_opt: Any


def lr_schedule(cfg: TrainConfig):
    def schedule(step):
        decay = 0.1 ** (jnp.minimum(step, cfg.niter_steady) // cfg.niter)
        return cfg.lr * decay

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(lr_schedule(cfg), b1=cfg.beta1, b2=cfg.beta2)


def make_train_step(
    generator: STTNGenerator,
    discriminator: VideoDiscriminator,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
):
    """Build the jitted GAN train step.

    step(state, frames [B,T,H,W,3] in [-1,1], masks [B,T,H,W,1] in {0,1})
      -> (state, metrics). With a mesh, batch inputs are constrained to the
    "data" axis so the compiler shards DP and inserts grad all-reduces.
    """
    gen_opt = make_optimizer(cfg)
    dis_opt = make_optimizer(cfg)

    def constrain_batch(x):
        if mesh is None:
            return x
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def step_fn(state: TrainState, frames: jnp.ndarray, masks: jnp.ndarray):
        frames = constrain_batch(frames)
        masks = constrain_batch(masks)
        B, T = frames.shape[:2]

        def gen_forward(gen_params):
            masked = frames * (1.0 - masks)
            pred = generator.apply(gen_params, masked, masks)
            comp = frames * (1.0 - masks) + pred * masks
            return pred, comp

        # ---- discriminator update (trainer_sttn.py:262-275) ----
        def dis_loss_fn(dis_params):
            pred, comp = gen_forward(state.gen_params)
            comp = jax.lax.stop_gradient(comp)
            variables = {"params": dis_params, **state.dis_vars}
            real_feat, new_vars = discriminator.apply(
                variables, frames, update_stats=True,
                mutable=list(state.dis_vars.keys()),
            )
            fake_feat = discriminator.apply(
                {"params": dis_params, **new_vars}, comp, update_stats=False
            )
            d_real = adversarial_loss(real_feat, True, True, cfg.gan_loss)
            d_fake = adversarial_loss(fake_feat, False, True, cfg.gan_loss)
            loss = (d_real + d_fake) / 2.0
            return loss, (new_vars, d_real, d_fake)

        (d_loss, (dis_vars, d_real, d_fake)), d_grads = jax.value_and_grad(
            dis_loss_fn, has_aux=True
        )(state.dis_params)
        d_updates, dis_opt_state = dis_opt.update(
            d_grads, state.dis_opt, state.dis_params
        )
        dis_params = optax.apply_updates(state.dis_params, d_updates)

        # ---- generator update (trainer_sttn.py:277-305) ----
        def gen_loss_fn(gen_params):
            pred, comp = gen_forward(gen_params)
            fake_feat = discriminator.apply(
                {"params": dis_params, **dis_vars}, comp, update_stats=False
            )
            gan = adversarial_loss(fake_feat, True, False, cfg.gan_loss)
            gan = gan * cfg.adversarial_weight
            flat_frames = frames.reshape(B * T, *frames.shape[2:])
            flat_masks = masks.reshape(B * T, *masks.shape[2:])
            flat_pred = pred.reshape(B * T, *pred.shape[2:])
            hole = masked_l1(flat_pred, flat_frames, flat_masks) * cfg.hole_weight
            valid = masked_l1(flat_pred, flat_frames, 1.0 - flat_masks) * cfg.valid_weight
            loss = gan + hole + valid
            return loss, (gan, hole, valid)

        (g_loss, (gan, hole, valid)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.gen_params)
        g_updates, gen_opt_state = gen_opt.update(
            g_grads, state.gen_opt, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            gen_opt=gen_opt_state,
            dis_params=dis_params,
            dis_vars=dis_vars,
            dis_opt=dis_opt_state,
        )
        metrics = {
            "dis_loss": d_loss,
            "dis_real": d_real,
            "dis_fake": d_fake,
            "gen_loss": g_loss,
            "gan_loss": gan,
            "hole_loss": hole,
            "valid_loss": valid,
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def init_train_state(
    generator: STTNGenerator,
    discriminator: VideoDiscriminator,
    cfg: TrainConfig,
    seed: int = 2020,
) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    g_rng, d_rng = jax.random.split(rng)
    dummy_frames = jnp.zeros(
        (1, cfg.sample_length, cfg.frame_h, cfg.frame_w, 3), jnp.float32
    )
    dummy_masks = jnp.zeros(
        (1, cfg.sample_length, cfg.frame_h, cfg.frame_w, 1), jnp.float32
    )
    gen_params = generator.init(g_rng, dummy_frames, dummy_masks)
    dis_variables = discriminator.init(d_rng, dummy_frames)
    dis_params = dis_variables.pop("params")
    dis_vars = dict(dis_variables)
    gen_opt = make_optimizer(cfg).init(gen_params)
    dis_opt = make_optimizer(cfg).init(dis_params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_opt=gen_opt,
        dis_params=dis_params,
        dis_vars=dis_vars,
        dis_opt=dis_opt,
    )


class STTNTrainer:
    """Host-side training loop: data in, jitted step, orbax checkpoints out.

    Resume parity with the reference (latest checkpoint restore incl. step
    and optimizer state; trainer_sttn.py:131-212).
    """

    def __init__(
        self,
        cfg: Optional[TrainConfig] = None,
        mesh: Optional[Mesh] = None,
        generator: Optional[STTNGenerator] = None,
        discriminator: Optional[VideoDiscriminator] = None,
    ):
        self.cfg = cfg or TrainConfig()
        self.mesh = mesh
        # the reference trains the sttn-auto architecture at 640x120
        # (trainer_sttn.py:12,54 with configs_sttn/youtube-vos.json w/h) —
        # the det patch sizes don't divide that geometry. Masks still shape
        # the loss and the masked encoder input; the auto attention is
        # unmasked by design.
        self.generator = generator or STTNGenerator(variant="auto")
        self.discriminator = discriminator or VideoDiscriminator(
            use_sigmoid=self.cfg.gan_loss != "hinge"
        )
        self.state = init_train_state(self.generator, self.discriminator, self.cfg)
        self.step_fn = make_train_step(
            self.generator, self.discriminator, self.cfg, mesh
        )

    # ---- checkpointing ----
    def save(self, directory: Optional[str] = None) -> str:
        import orbax.checkpoint as ocp

        directory = directory or self.cfg.save_dir
        path = os.path.abspath(os.path.join(directory, f"ckpt_{int(self.state.step)}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.state)
        ckptr.wait_until_finished()
        return path

    def restore(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        self.state = ckptr.restore(os.path.abspath(path), self.state)

    # ---- validation (ref trainer valid_freq hooks) ----
    def evaluate(self, frames: Any, masks: Any) -> Dict[str, float]:
        """PSNR/SSIM of generator composites on a held-out batch.

        frames [B, T, H, W, 3] in [-1, 1]; masks [B, T, H, W, 1]."""
        import numpy as np

        from vsr_tpu.utils.metrics import psnr_and_ssim

        frames = jnp.asarray(frames)
        masks = jnp.asarray(masks)
        pred = self.generator.apply(
            self.state.gen_params, frames * (1 - masks), masks)
        comp = frames * (1 - masks) + pred * masks
        comp_u8 = np.asarray(jnp.clip((comp + 1) * 127.5, 0, 255)).astype("uint8")
        gt_u8 = np.asarray(jnp.clip((frames + 1) * 127.5, 0, 255)).astype("uint8")
        psnrs, ssims = [], []
        for b in range(comp_u8.shape[0]):
            for t in range(comp_u8.shape[1]):
                p, s = psnr_and_ssim(gt_u8[b, t], comp_u8[b, t])
                if np.isfinite(p):
                    psnrs.append(p)
                    ssims.append(s)
        return {
            "psnr": float(np.mean(psnrs)) if psnrs else float("inf"),
            "ssim": float(np.mean(ssims)) if ssims else 1.0,
        }

    # ---- loop ----
    def train(self, data_iter, num_steps: int, log_cb=None) -> Dict[str, float]:
        writer = None
        if self.cfg.summary_dir:
            from vsr_tpu.train.scalars import ScalarWriter

            writer = ScalarWriter(self.cfg.summary_dir,
                                  interval=self.cfg.log_freq)
        metrics = {}
        try:
            for _ in range(num_steps):
                frames, masks = next(data_iter)
                self.state, metrics = self.step_fn(
                    self.state, jnp.asarray(frames), jnp.asarray(masks)
                )
                step = int(self.state.step)
                if writer is not None:
                    writer.add_dict(metrics, step)
                if log_cb and step % self.cfg.log_freq == 0:
                    log_cb(step, {k: float(v) for k, v in metrics.items()})
                if step % self.cfg.save_freq == 0:
                    self.save()
        finally:
            if writer is not None:
                writer.close()
        return {k: float(v) for k, v in metrics.items()}
