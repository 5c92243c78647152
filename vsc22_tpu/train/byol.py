"""BYOL self-supervised training recipe (functional JAX).

Part of the legacy model-zoo surface: registered in the reference's factory
but absent from every final config (SURVEY §2.3). Parity target (original
implementation, for cross-checking):
  D1/train/train_v68/vsc/baseline/model_factory/backbones/byol_pytorch.py:
  89-280 — online encoder + projector + predictor, EMA target network,
  symmetric regression loss 2 - 2*cos(pred(proj_online), sg(proj_target)).

TPU design: no wrapper class mutating module state — the target network is
just a second parameter tree updated by an EMA (optax.incremental_update),
the loss/step are pure functions jitted over the mesh like every trainer
here. The backbone is any registry model returning [B, D] embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class ByolConfig:
    projection_size: int = 256
    hidden_size: int = 4096
    ema_decay: float = 0.99
    learning_rate: float = 3e-4


class ByolMLP(nn.Module):
    """Projector/predictor MLP: Dense -> BN-free LN -> ReLU -> Dense.

    The reference uses BatchNorm1d (byol_pytorch.py:93-100); LayerNorm is
    the batch-size-independent equivalent that behaves identically under
    pmap/pjit sharding without cross-device batch statistics.
    """

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.LayerNorm(name="norm")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, name="fc2")(x)


class ByolHeads(nn.Module):
    """Projector + predictor pair over backbone embeddings."""

    cfg: ByolConfig = ByolConfig()

    def setup(self):
        self.projector = ByolMLP(self.cfg.hidden_size, self.cfg.projection_size)
        self.predictor = ByolMLP(self.cfg.hidden_size, self.cfg.projection_size)

    def project(self, emb: jax.Array) -> jax.Array:
        return self.projector(emb)

    def predict(self, proj: jax.Array) -> jax.Array:
        return self.predictor(proj)

    def __call__(self, emb: jax.Array) -> jax.Array:
        return self.predict(self.project(emb))


def _regression_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """2 - 2*cosine, averaged (byol_pytorch.py:104-107)."""
    p = pred / jnp.maximum(jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12)
    t = target / jnp.maximum(jnp.linalg.norm(target, axis=-1, keepdims=True), 1e-12)
    return jnp.mean(2.0 - 2.0 * jnp.sum(p * t, axis=-1))


def byol_loss(
    apply_backbone: Callable[[Any, jax.Array], jax.Array],
    heads: ByolHeads,
    online_params: Any,  # {"backbone": ..., "heads": ...}
    target_params: Any,  # same structure; gradients never flow here
    view_a: jax.Array,
    view_b: jax.Array,
) -> jax.Array:
    """Symmetric BYOL loss over two augmented views."""

    def online_pred(images):
        emb = apply_backbone(online_params["backbone"], images)
        return heads.apply(online_params["heads"], emb)

    def target_proj(images):
        emb = apply_backbone(target_params["backbone"], images)
        return heads.apply(target_params["heads"], emb, method=ByolHeads.project)

    pa, pb = online_pred(view_a), online_pred(view_b)
    ta = jax.lax.stop_gradient(target_proj(view_a))
    tb = jax.lax.stop_gradient(target_proj(view_b))
    return 0.5 * (_regression_loss(pa, tb) + _regression_loss(pb, ta))


def make_byol_step(
    apply_backbone: Callable[[Any, jax.Array], jax.Array],
    heads: ByolHeads,
    tx: optax.GradientTransformation,
    cfg: ByolConfig = ByolConfig(),
):
    """Returns jittable (online, target, opt_state, a, b) -> updated + loss.

    The EMA target update (byol_pytorch.py:83-86 update_moving_average)
    runs inside the same jitted step.
    """

    @jax.jit
    def step(online_params, target_params, opt_state, view_a, view_b):
        loss, grads = jax.value_and_grad(
            lambda p: byol_loss(
                apply_backbone, heads, p, target_params, view_a, view_b
            )
        )(online_params)
        updates, opt_state = tx.update(grads, opt_state, online_params)
        online_params = optax.apply_updates(online_params, updates)
        target_params = optax.incremental_update(
            online_params, target_params, 1.0 - cfg.ema_decay
        )
        return online_params, target_params, opt_state, loss

    return step


def init_byol(
    backbone_init: Callable[[jax.Array], Any],
    heads: ByolHeads,
    rng: jax.Array,
    sample_emb: jax.Array,
) -> Tuple[Any, Any]:
    """Initialize online params and a target copy (byol_pytorch.py:220-227)."""
    kb, kh = jax.random.split(rng)
    online = {
        "backbone": backbone_init(kb),
        "heads": heads.init(kh, sample_emb),
    }
    target = jax.tree_util.tree_map(jnp.array, online)
    return online, target
