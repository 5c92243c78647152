"""Global-batch contrastive descriptor training (InfoNCE + KoLeo entropy).

Parity target (reference, for cross-checking — original TPU design):
  D1/train/train_v106/descriptor_train.py:184-244 (losses, all-gather) and
  :247-304 (step: AMP, FGM adversarial second pass, EMA, linear warmup).

TPU-first differences from the reference's DDP design:
  - The reference all-gathers L2-normalized embeddings across ranks and each
    rank computes the loss over its own row block with *detached* remote
    embeddings (descriptor_train.py:76-92,228-234). Under jit we instead
    compute the loss over the full global similarity matrix with sharded
    batches; XLA materializes the same all-gather over ICI, but the gradient
    is the exact global-batch gradient (no detached negatives) — strictly
    tighter than DDP's approximation.
  - AMP GradScaler is unnecessary: compute runs in bf16 (no gradient scaling
    needed), parameters and optimizer state stay f32.
  - FGM's two backward passes become two `jax.grad` evaluations inside one
    jitted step; gradients accumulate functionally.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsc22_tpu.models.layers import l2_normalize
from vsc22_tpu.parallel.mesh import param_shardings

NEG_LARGE = -10000.0


@dataclasses.dataclass(frozen=True)
class ContrastiveConfig:
    temperature: float = 0.05
    margin: float = 0.0
    ici_weight: float = 1.0
    entropy_weight: float = 30.0
    product_loss: bool = False
    # Optimization (reference: transformers.AdamW + linear warmup schedule).
    learning_rate: float = 5e-5
    warmup_ratio: float = 0.1
    total_steps: int = 10000
    weight_decay: float = 0.0
    adam_eps: float = 1e-6
    clip_grad_norm: Optional[float] = None
    # Extras.
    ema_decay: Optional[float] = 0.999
    fgm_epsilon: Optional[float] = None  # e.g. 0.1 enables FGM adversarial step
    remat: bool = False  # activation checkpointing (reference --checkpointing)
    # BarlowTwins auxiliary redundancy-reduction loss on the normalized
    # embeddings (reference --bl_weight, default 0 in every winning config).
    barlow_weight: float = 0.0
    barlow_lambda: float = 5e-3


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled

    def apply_gradients(self, tx: optax.GradientTransformation, grads, ema_decay):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.ema_params is not None:
            new_ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                self.ema_params,
                new_params,
            )
        else:
            new_ema = None
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt, ema_params=new_ema
        )


def contrastive_loss(
    emb_a: jax.Array,
    emb_b: jax.Array,
    temperature: float,
    margin: float = 0.0,
) -> jax.Array:
    """InfoNCE over the 2B x 2B similarity matrix of both views.

    Row i's positive is its counterpart view (i+B / i-B); the self-similarity
    diagonal is masked to -1e4. `margin` is subtracted from the positive
    logits (the reference's --margin flag; its torch code subtracted on the
    already-masked diagonal, a no-op — here it is applied where intended).
    """
    bz = emb_a.shape[0]
    emb = jnp.concatenate([emb_a, emb_b], axis=0)
    sims = jnp.einsum("id,jd->ij", emb, emb, preferred_element_type=jnp.float32)
    n = 2 * bz
    eye = jnp.eye(n, dtype=bool)
    sims = jnp.where(eye, NEG_LARGE, sims)
    labels = jnp.concatenate([jnp.arange(bz) + bz, jnp.arange(bz)])
    if margin > 0:
        pos_mask = jax.nn.one_hot(labels, n, dtype=sims.dtype)
        sims = sims - margin * pos_mask
    logits = sims / temperature
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def entropy_loss(sims_ab: jax.Array, weight: float) -> jax.Array:
    """KoLeo-style repulsion: -log sqrt((1 - max_non_match_sim)/2).

    `sims_ab` is the B x B cross-view similarity matrix; the diagonal (the
    matching pair) is excluded from the max.
    """
    n = sims_ab.shape[0]
    eye = jnp.eye(n, dtype=bool)
    max_non_match = jnp.max(jnp.where(eye, NEG_LARGE, sims_ab), axis=1)
    closest = jnp.sqrt(jnp.clip(0.5 - max_non_match / 2.0, 1e-6, None))
    return -jnp.mean(jnp.log(closest)) * weight


def product_entropy_loss(emb_a: jax.Array, emb_b: jax.Array) -> jax.Array:
    """Alternative positive-pair pull: mean(exp(1 - sim(a_i, b_i)))."""
    match_sim = jnp.sum(emb_a * emb_b, axis=-1)
    return jnp.mean(jnp.exp(1.0 - match_sim))


def barlow_twins_loss(
    emb_a: jax.Array, emb_b: jax.Array, lambd: float = 5e-3
) -> jax.Array:
    """BarlowTwins redundancy-reduction: ||diag(C)-1||^2 + lambd*||offdiag(C)||^2.

    Parity target (reference, for cross-checking — original TPU design):
    D1/train/train_v68/descriptor_train.py:115-142. The reference
    standardizes each view with its LOCAL per-GPU batch stats, then
    all-reduces the D x D cross-correlation over ranks — so its loss value
    drifts with world size. Here both the standardization moments and the
    cross-correlation are computed over the GLOBAL batch: under jit the
    batch dim is sharded on the mesh's data axis, so the column-moment
    reductions and the `z1.T @ z2` contraction lower to the same psum /
    all-reduce collectives over ICI (the TPU-native form of the
    reference's explicit `torch.distributed.all_reduce(c)` at :128-129),
    and the value is shard-count invariant. `std` is the unbiased (ddof=1)
    estimator, clamped at 1e-5, matching torch `Tensor.std`.
    """
    n = emb_a.shape[0]
    a32 = emb_a.astype(jnp.float32)
    b32 = emb_b.astype(jnp.float32)

    def standardize(e):
        mean = e.mean(axis=0)
        centered = e - mean
        std = jnp.sqrt(centered.var(axis=0) * n / max(n - 1, 1))
        return centered / jnp.clip(std, 1e-5, None)

    z1, z2 = standardize(a32), standardize(b32)
    c = jnp.einsum("nd,ne->de", z1, z2, preferred_element_type=jnp.float32) / n
    d = c.shape[0]
    eye = jnp.eye(d, dtype=c.dtype)
    on_diag = jnp.sum((jnp.diagonal(c) - 1.0) ** 2)
    off_diag = jnp.sum((c * (1.0 - eye)) ** 2)
    return on_diag + lambd * off_diag


def make_optimizer(cfg: ContrastiveConfig) -> optax.GradientTransformation:
    warmup = int(cfg.warmup_ratio * cfg.total_steps)
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, max(warmup, 1)),
            optax.linear_schedule(
                cfg.learning_rate, 0.0, max(cfg.total_steps - warmup, 1)
            ),
        ],
        [max(warmup, 1)],
    )
    chain = []
    if cfg.clip_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    chain.append(
        optax.adamw(schedule, eps=cfg.adam_eps, weight_decay=cfg.weight_decay)
    )
    return optax.chain(*chain)


def create_train_state(
    model,
    rng: jax.Array,
    sample_batch: Dict[str, jax.Array],
    cfg: ContrastiveConfig,
    mesh: Optional[Mesh] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize params (optionally sharded over the mesh) and optimizer."""
    params = model.init(rng, sample_batch["img_a"], train=False)
    tx = make_optimizer(cfg)
    if mesh is not None:
        shardings = param_shardings(mesh, params)
        params = jax.tree.map(jax.device_put, params, shardings)
    opt_state = tx.init(params)
    # Materialize a distinct copy: aliased buffers would be donated twice.
    ema = jax.tree.map(jnp.copy, params) if cfg.ema_decay is not None else None
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state, ema_params=ema)
    if mesh is not None:
        # Commit every remaining uncommitted leaf (step counter, optax
        # counts/zeros) to the replicated mesh sharding: checkpoint restore
        # re-places leaves onto their template shardings, and a leaf that is
        # merely uncommitted here would come back committed to one device
        # and clash with the mesh-committed params under jit.
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())

        def place(x):
            if isinstance(x, jax.Array) and not isinstance(x.sharding, NamedSharding):
                return jax.device_put(x, rep)
            return x

        state = jax.tree.map(place, state)
    return state, tx


def make_train_step(model, tx: optax.GradientTransformation, cfg: ContrastiveConfig, mesh: Optional[Mesh] = None):
    """Build the jitted train step.

    batch = {"img_a": [B,H,W,3], "img_b": [B,H,W,3]}; with a mesh, the batch
    arrives sharded on the 'data' axis and the global-similarity GEMMs induce
    the cross-device all-gather.
    """

    apply_fn = model.apply
    if cfg.remat:
        # Rematerialize backbone activations in the backward pass
        # (reference --checkpointing / SwinV2 use_checkpoint).
        apply_fn = jax.checkpoint(
            lambda params, images, rng: model.apply(
                params, images, train=True, rngs={"dropout": rng}
            )
        )

    def loss_fn(params, img_a, img_b, rng):
        bz = img_a.shape[0]
        images = jnp.concatenate([img_a, img_b], axis=0)
        if cfg.remat:
            embeds = apply_fn(params, images, rng)
        else:
            embeds = model.apply(params, images, train=True, rngs={"dropout": rng})
        embeds = l2_normalize(embeds.astype(jnp.float32))
        emb_a, emb_b = embeds[:bz], embeds[bz:]

        if cfg.product_loss:
            ent = product_entropy_loss(emb_a, emb_b)
        else:
            sims_ab = jnp.einsum(
                "id,jd->ij", emb_a, emb_b, preferred_element_type=jnp.float32
            )
            ent = entropy_loss(sims_ab, cfg.entropy_weight)
        ici = contrastive_loss(emb_a, emb_b, cfg.temperature, cfg.margin) * cfg.ici_weight
        loss = ici + ent
        metrics = {"loss": loss, "ici_loss": ici, "entropy_loss": ent}
        if cfg.barlow_weight > 0.0:
            bl = barlow_twins_loss(emb_a, emb_b, cfg.barlow_lambda) * cfg.barlow_weight
            loss = loss + bl
            metrics["barlow_loss"] = bl
            metrics["loss"] = loss
        return loss, metrics

    def step_fn(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        img_a, img_b = batch["img_a"], batch["img_b"]
        if cfg.fgm_epsilon is not None:
            grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
            (gp, ga, gb), metrics = grad_fn(state.params, img_a, img_b, rng)
            # FGM: perturb inputs along the (globally normalized) gradient and
            # accumulate the adversarial gradient (reference :268-275).
            r_a = cfg.fgm_epsilon * ga / (jnp.linalg.norm(ga) + 1e-8)
            r_b = cfg.fgm_epsilon * gb / (jnp.linalg.norm(gb) + 1e-8)
            gp_adv, _ = jax.grad(loss_fn, has_aux=True)(
                state.params, img_a + r_a, img_b + r_b, rng
            )
            grads = jax.tree.map(jnp.add, gp, gp_adv)
        else:
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.params, img_a, img_b, rng
            )
        new_state = state.apply_gradients(tx, grads, cfg.ema_decay or 0.0)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)

    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        donate_argnums=0,
        in_shardings=(None, {"img_a": batch_sh, "img_b": batch_sh}, None),
    )
