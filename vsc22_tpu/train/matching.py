"""Matching-track training: 2-fold classify filter + SAM refine model.

Parity target (reference, for cross-checking — original implementation):
  M1/train/train_matching.py:281-420 and M1/train/dataset.py:
  - folds: query ids shuffled with np seed 2023, split in half; model h1
    trains on fold A and predicts fold B, h2 vice versa;
  - classify: CE over 2 classes, Adam lr 1e-4 wd 5e-5, 160^2 padded sims,
    augs (Gaussian blur p.3 / uniform noise +-0.1 p.3 / sqrt-abs p.1);
  - refine: soft diagonal-band heatmap labels — for each GT segment the
    label is sqrt(1 - |d|) for perpendicular distance |d| < 1 to the
    segment's diagonal; loss = -(log_softmax(pred) * [1-y, y]).sum();
    128^2 at train with random transpose, Adam lr 1e-4 wd 5e-5.

TPU notes: both models are BatchNorm CNNs — train steps thread the
`batch_stats` collection functionally; batches are fixed-shape device
arrays; the label rasterization is vectorized numpy (the reference's python
double loop over pixels).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vsc22_tpu.matching.simmat import pad_sim_matrix


# ---------------------------------------------------------------------------
# Labels and augmentation
# ---------------------------------------------------------------------------


def soft_band_label(
    resolution: Tuple[int, int], gt_list: Sequence[Tuple[float, float, float, float]]
) -> np.ndarray:
    """Soft diagonal-band heatmap label for GT segments (qs, qe, rs, re).

    Pixels within perpendicular distance 1 of the segment's diagonal get
    value sqrt(1 - |d|); the band spans the GT bounding box.
    """
    label = np.zeros(resolution, np.float32)
    for qs, qe, rs, re in gt_list:
        v = np.array([rs - re, qe - qs], np.float32)
        norm = np.linalg.norm(v)
        if norm == 0:
            continue
        v /= norm
        i0, i1 = int(round(qs)), min(int(qe), resolution[0] - 1)
        j0, j1 = int(round(rs)), min(int(re), resolution[1] - 1)
        if i1 < i0 or j1 < j0:
            continue
        ii, jj = np.meshgrid(
            np.arange(i0, i1 + 1), np.arange(j0, j1 + 1), indexing="ij"
        )
        dist = (ii - qs) * v[0] + (jj - rs) * v[1]
        band = np.abs(dist) < 1
        vals = np.sqrt(np.clip(1 - np.abs(dist), 0, None))
        patch = label[i0 : i1 + 1, j0 : j1 + 1]
        label[i0 : i1 + 1, j0 : j1 + 1] = np.where(band, vals, patch)
    return label


def augment_sim(sim: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Reference sim-matrix augs: blur p.3 / noise p.3 / sqrt-abs p.1."""
    from scipy import ndimage

    val = rng.uniform(0, 1)
    if val > 0.7:
        sigma = rng.uniform(0.1, 0.7)
        return ndimage.gaussian_filter(sim, sigma, mode="nearest")
    if val > 0.4:
        return sim + rng.uniform(-0.1, 0.1, sim.shape).astype(np.float32)
    if val < 0.1:
        return np.sqrt(np.abs(sim))
    return sim


def split_folds(query_ids: Sequence[str], seed: int = 2023) -> set:
    """First-half query ids after the reference's seeded shuffle."""
    qid_list = sorted(set(query_ids))
    np.random.seed(seed)
    np.random.shuffle(qid_list)
    return set(qid_list[: len(qid_list) // 2])


# ---------------------------------------------------------------------------
# Train steps (BatchNorm-aware)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CNNTrainState:
    params: Dict
    batch_stats: Dict
    opt_state: object
    step: int = 0


def make_cnn_optimizer(lr: float = 1e-4, weight_decay: float = 5e-5):
    return optax.adamw(lr, weight_decay=weight_decay)


def create_cnn_state(model, tx, sample_input, rng) -> CNNTrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return CNNTrainState(params=params, batch_stats=batch_stats, opt_state=tx.init(params))


def make_classify_train_step(model, tx):
    """CE loss over 2-class logits; returns (state, loss)."""

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels, rng):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss

    def apply(state: CNNTrainState, images, labels, rng) -> Tuple[CNNTrainState, float]:
        p, s, o, loss = step(
            state.params, state.batch_stats, state.opt_state, images, labels, rng
        )
        return CNNTrainState(p, s, o, state.step + 1), float(loss)

    return apply


def make_refine_train_step(model, tx):
    """Summed soft cross-entropy over the 2-channel per-pixel logits."""

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels, rng):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )  # [B, H, W, 2]
            log_pred = jax.nn.log_softmax(logits, axis=-1)
            target = jnp.stack([1.0 - labels, labels], axis=-1)
            loss = -(log_pred * target).sum()
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss

    def apply(state: CNNTrainState, images, labels, rng) -> Tuple[CNNTrainState, float]:
        p, s, o, loss = step(
            state.params, state.batch_stats, state.opt_state, images, labels, rng
        )
        return CNNTrainState(p, s, o, state.step + 1), float(loss)

    return apply


# ---------------------------------------------------------------------------
# Fold orchestration
# ---------------------------------------------------------------------------


def _classify_batches(features, infos, resolution, batch, rng, enhance):
    order = rng.permutation(len(features)) if enhance else np.arange(len(features))
    for start in range(0, len(order), batch):
        idxs = order[start : start + batch]
        if len(idxs) < batch:
            idxs = np.concatenate([idxs, order[: batch - len(idxs)]])
        images, labels = [], []
        for i in idxs:
            sim = np.asarray(features[i], np.float32)
            if sim.ndim == 3:
                sim = sim[0]
            if enhance:
                sim = augment_sim(sim, rng)
            images.append(pad_sim_matrix(sim, resolution))
            labels.append(int(infos[i][2]))
        yield jnp.asarray(np.stack(images)), jnp.asarray(np.array(labels, np.int32))


def train_classify_model(
    model_factory,
    features: List[np.ndarray],
    infos: List[List],
    num_epochs: int = 10,
    batch: int = 64,
    resolution: int = 160,
    seed: int = 2023,
    lr: float = 1e-4,
):
    """2-fold training; returns ((state_h1, state_h2), fold-A query ids).

    h1 trains on queries outside fold A and scores fold A; h2 the reverse —
    every candidate gets an out-of-fold probability downstream.
    """
    fold_a = split_folds([info[0] for info in infos], seed)
    in_a = [i for i in range(len(infos)) if infos[i][0] in fold_a]
    out_a = [i for i in range(len(infos)) if infos[i][0] not in fold_a]

    tx = make_cnn_optimizer(lr)
    states = []
    for train_idx in (out_a, in_a):
        model = model_factory()
        rng_np = np.random.default_rng(seed)
        state = create_cnn_state(
            model, tx, jnp.zeros((1, resolution, resolution, 3)), jax.random.PRNGKey(seed)
        )
        step = make_classify_train_step(model, tx)
        feats = [features[i] for i in train_idx]
        infs = [infos[i] for i in train_idx]
        key = jax.random.PRNGKey(seed)
        for _ in range(num_epochs):
            for images, labels in _classify_batches(feats, infs, resolution, batch, rng_np, True):
                key, sub = jax.random.split(key)
                state, _ = step(state, images, labels, sub)
        states.append((model, state))
    return states, fold_a


def train_refine_model(
    model_factory,
    match_meta: List[Tuple],
    num_epochs: int = 20,
    batch: int = 8,
    resolution: int = 128,
    seed: int = 2023,
    lr: float = 1e-4,
):
    """2-fold SAM training. meta rows: (qid, rid, qfeat, rfeat, gt_list)."""
    fold_a = split_folds([m[0] for m in match_meta], seed)
    in_a = [m for m in match_meta if m[0] in fold_a]
    out_a = [m for m in match_meta if m[0] not in fold_a]

    tx = make_cnn_optimizer(lr)
    states = []
    for train_meta in (in_a, out_a):
        model = model_factory()
        rng_np = np.random.default_rng(seed)
        state = create_cnn_state(
            model, tx, jnp.zeros((1, resolution, resolution, 3)), jax.random.PRNGKey(seed)
        )
        step = make_refine_train_step(model, tx)
        key = jax.random.PRNGKey(seed)
        for _ in range(num_epochs):
            order = rng_np.permutation(len(train_meta))
            for start in range(0, len(order), batch):
                idxs = order[start : start + batch]
                if len(idxs) < batch:
                    idxs = np.concatenate([idxs, order[: batch - len(idxs)]])
                images, labels = [], []
                for i in idxs:
                    qid, rid, qf, rf, gt_list = train_meta[i]
                    sim = (qf @ rf.T).astype(np.float32)
                    label = soft_band_label((resolution, resolution), gt_list)
                    if rng_np.uniform() > 0.5:  # random transpose
                        sim, label = sim.T, label.T
                    sim = augment_sim(sim, rng_np)
                    images.append(pad_sim_matrix(sim, resolution))
                    labels.append(label)
                key, sub = jax.random.split(key)
                state, _ = step(
                    state,
                    jnp.asarray(np.stack(images)),
                    jnp.asarray(np.stack(labels)),
                    sub,
                )
        states.append((model, state))
    return states, fold_a
