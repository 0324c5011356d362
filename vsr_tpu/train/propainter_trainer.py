"""ProPainter training: flow-completion trainer and generator GAN trainer.

Capability parity with the reference's offline trainers:
* flow completion (video/core/trainer_flow_w_edge.py): supervised L1 on
  completed flow (hole/valid split) plus a binary-cross-entropy edge loss
  against ground-truth flow edges. The reference derives gt edges with an
  in-graph differentiable Canny (model/canny/, ~1.6k LoC); targets don't
  need gradients, so here they come from a host-side Sobel-magnitude
  threshold — same supervisory signal, none of the graph weight.
* generator (video/core/trainer.py): hinge GAN against the temporal
  patch discriminator (propainter.py:384 uses nf=32) plus hole/valid L1,
  with RAFT and the flow-completion net frozen.

Both steps jit with batch sharding over the mesh's "data" axis (GSPMD
all-reduces replace DDP/NCCL) and checkpoint via orbax.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsr_tpu.models.discriminator import VideoDiscriminator
from vsr_tpu.models.propainter.flow_completion import RecurrentFlowCompleteNet
from vsr_tpu.models.propainter.generator import ProPainterGenerator, image_propagation
from vsr_tpu.train.losses import adversarial_loss, masked_l1


# --------------------------------------------------------- flow completion

@dataclass
class FlowTrainConfig:
    lr: float = 5e-5
    beta1: float = 0.0
    beta2: float = 0.99
    flow_weight: float = 0.25
    edge_weight: float = 1.0
    save_dir: str = "flow_ckpt"


class FlowTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt: Any


# Canny edge targets matching the reference trainer's get_edges exactly
# (trainer_flow_w_edge.py:261-273) — host-side since targets take no
# gradients; parity vs the executed reference torch Canny is tested
from vsr_tpu.train.canny import flow_edges_host  # noqa: F401  (re-export)


def make_flow_train_step(
    net: RecurrentFlowCompleteNet,
    cfg: FlowTrainConfig,
    mesh: Optional[Mesh] = None,
):
    opt = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)

    def constrain(x):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    def step_fn(state: FlowTrainState, gt_flows, masks, edge_targets):
        gt_flows = constrain(gt_flows)      # [B, T, H, W, 2]
        masks = constrain(masks)            # [B, T, H, W, 1]
        edge_targets = constrain(edge_targets)

        def loss_fn(params):
            masked_flows = gt_flows * (1 - masks)
            pred, edges = net.apply(params, masked_flows, masks, train=True)
            B, T, H, W, _ = pred.shape
            hole = masked_l1(pred, gt_flows, masks)
            valid = masked_l1(pred, gt_flows, 1 - masks)
            flat_edges = edges.reshape(B, T, H, W, 1)
            bce = -(edge_targets * jnp.log(flat_edges + 1e-8)
                    + (1 - edge_targets) * jnp.log(1 - flat_edges + 1e-8))
            edge = jnp.mean(bce)
            total = cfg.flow_weight * (hole + valid) + cfg.edge_weight * edge
            return total, (hole, valid, edge)

        (loss, (hole, valid, edge)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "hole_l1": hole, "valid_l1": valid,
                   "edge_bce": edge}
        return state.replace(step=state.step + 1, params=params,
                             opt=opt_state), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


class FlowCompletionTrainer:
    def __init__(self, cfg: Optional[FlowTrainConfig] = None,
                 mesh: Optional[Mesh] = None,
                 net: Optional[RecurrentFlowCompleteNet] = None,
                 sample_shape: Tuple[int, int, int] = (2, 64, 64)):
        self.cfg = cfg or FlowTrainConfig()
        self.net = net or RecurrentFlowCompleteNet()
        t, h, w = sample_shape
        params = self.net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, t, h, w, 2)),
            jnp.zeros((1, t, h, w, 1)), train=True)
        opt = optax.adam(self.cfg.lr, b1=self.cfg.beta1,
                         b2=self.cfg.beta2).init(params)
        self.state = FlowTrainState(step=jnp.zeros((), jnp.int32),
                                    params=params, opt=opt)
        self.step_fn = make_flow_train_step(self.net, self.cfg, mesh)

    def train_step(self, gt_flows: np.ndarray, masks: np.ndarray) -> Dict[str, float]:
        edges = flow_edges_host(gt_flows)
        self.state, metrics = self.step_fn(
            self.state, jnp.asarray(gt_flows), jnp.asarray(masks),
            jnp.asarray(edges))
        return {k: float(v) for k, v in metrics.items()}

    def save(self, directory: Optional[str] = None) -> str:
        import orbax.checkpoint as ocp

        directory = directory or self.cfg.save_dir
        path = os.path.abspath(
            os.path.join(directory, f"ckpt_{int(self.state.step)}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.state)
        ckptr.wait_until_finished()
        return path

    def restore(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        self.state = ckptr.restore(os.path.abspath(path), self.state)


# ------------------------------------------------------------- generator

@dataclass
class PropainterTrainConfig:
    lr: float = 1e-4
    beta1: float = 0.0
    beta2: float = 0.99
    hole_weight: float = 1.0
    valid_weight: float = 1.0
    adversarial_weight: float = 0.01
    # LPIPS perceptual term (ref trainer.py:67-68,413-417; weight 0 in the
    # published configs' default — enabled when lpips weights are supplied)
    perceptual_weight: float = 0.0
    gan_loss: str = "hinge"
    save_dir: str = "propainter_ckpt"


class PropainterTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    gen_opt: Any
    dis_params: Any
    dis_vars: Any
    dis_opt: Any


def make_propainter_train_step(
    generator: ProPainterGenerator,
    discriminator: VideoDiscriminator,
    cfg: PropainterTrainConfig,
    num_local_frames: int,
    mesh: Optional[Mesh] = None,
    lpips_params=None,
):
    """GAN step over pre-computed completed flows (RAFT + flow completion are
    frozen upstream stages, as in the reference trainer).

    lpips_params: converted LPIPS weights (convert/torch_lpips.py) enabling
    the reference's perceptual term (LPIPSLoss(use_input_norm=True,
    range_norm=True), trainer.py:67-68) when cfg.perceptual_weight > 0."""
    gen_opt = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)
    dis_opt = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)

    def constrain(x):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    def step_fn(state, frames, flows_f, flows_b, masks):
        frames = constrain(frames)  # [B, T, H, W, 3] in [-1, 1]
        masks = constrain(masks)    # [B, T, H, W, 1]
        B, T = frames.shape[:2]
        l_t = num_local_frames

        masked = frames * (1 - masks)
        prop_frames, updated_masks = image_propagation(
            masked[:, :l_t], masks[:, :l_t], flows_f, flows_b)
        updated = masked[:, :l_t] * (1 - masks[:, :l_t]) \
            + prop_frames * masks[:, :l_t]
        updated_all = jnp.concatenate([updated, masked[:, l_t:]], axis=1)
        updated_masks_all = jnp.concatenate(
            [updated_masks, masks[:, l_t:]], axis=1)

        def gen_forward(gen_params):
            pred_local = generator.apply(
                gen_params, updated_all, (flows_f, flows_b), masks,
                updated_masks_all, l_t)
            comp = frames[:, :l_t] * (1 - masks[:, :l_t]) \
                + pred_local * masks[:, :l_t]
            return pred_local, comp

        def dis_loss_fn(dis_params):
            _, comp = gen_forward(state.gen_params)
            comp = jax.lax.stop_gradient(comp)
            variables = {"params": dis_params, **state.dis_vars}
            real, new_vars = discriminator.apply(
                variables, frames[:, :l_t], update_stats=True,
                mutable=list(state.dis_vars.keys()))
            fake = discriminator.apply(
                {"params": dis_params, **new_vars}, comp, update_stats=False)
            d_loss = (adversarial_loss(real, True, True, cfg.gan_loss)
                      + adversarial_loss(fake, False, True, cfg.gan_loss)) / 2
            return d_loss, new_vars

        (d_loss, dis_vars), d_grads = jax.value_and_grad(
            dis_loss_fn, has_aux=True)(state.dis_params)
        d_updates, dis_opt_state = dis_opt.update(
            d_grads, state.dis_opt, state.dis_params)
        dis_params = optax.apply_updates(state.dis_params, d_updates)

        def gen_loss_fn(gen_params):
            pred, comp = gen_forward(gen_params)
            fake = discriminator.apply(
                {"params": dis_params, **dis_vars}, comp, update_stats=False)
            gan = adversarial_loss(fake, True, False, cfg.gan_loss) \
                * cfg.adversarial_weight
            hole = masked_l1(pred, frames[:, :l_t], masks[:, :l_t]) \
                * cfg.hole_weight
            valid = masked_l1(pred, frames[:, :l_t], 1 - masks[:, :l_t]) \
                * cfg.valid_weight
            perc = jnp.zeros(())
            if cfg.perceptual_weight > 0 and lpips_params is not None:
                from vsr_tpu.train.perceptual import lpips_loss

                h, w = pred.shape[2:4]
                perc = lpips_loss(
                    lpips_params,
                    pred.reshape(-1, h, w, 3),
                    frames[:, :l_t].reshape(-1, h, w, 3),
                    use_input_norm=True, range_norm=True,
                ) * cfg.perceptual_weight
            return gan + hole + valid + perc, (gan, hole, valid, perc)

        (g_loss, (gan, hole, valid, perc)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt_state = gen_opt.update(
            g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics = {"dis_loss": d_loss, "gen_loss": g_loss, "gan_loss": gan,
                   "hole_loss": hole, "valid_loss": valid,
                   "perc_loss": perc}
        return state.replace(
            step=state.step + 1, gen_params=gen_params, gen_opt=gen_opt_state,
            dis_params=dis_params, dis_vars=dis_vars,
            dis_opt=dis_opt_state), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def init_propainter_train_state(
    generator: ProPainterGenerator,
    discriminator: VideoDiscriminator,
    cfg: PropainterTrainConfig,
    shape: Tuple[int, int, int, int] = (1, 3, 64, 64),
    num_local_frames: int = 2,
) -> PropainterTrainState:
    B, T, H, W = shape
    l_t = num_local_frames
    gen_params = generator.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, T, H, W, 3)),
        (jnp.zeros((B, l_t - 1, H, W, 2)), jnp.zeros((B, l_t - 1, H, W, 2))),
        jnp.zeros((B, T, H, W, 1)), jnp.zeros((B, T, H, W, 1)), l_t)
    dis_variables = discriminator.init(
        jax.random.PRNGKey(1), jnp.zeros((B, l_t, H, W, 3)))
    dis_params = dis_variables.pop("params")
    gen_opt = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2).init(gen_params)
    dis_opt = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2).init(dis_params)
    return PropainterTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params, gen_opt=gen_opt,
        dis_params=dis_params, dis_vars=dict(dis_variables), dis_opt=dis_opt)
