"""Matching-track training tests: labels, folds, 2-fold learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Multi-minute trainer e2e on the 1-core CI host; heavy tier.
pytestmark = pytest.mark.heavy

from vsc22_tpu.train.matching import (
    augment_sim,
    create_cnn_state,
    make_classify_train_step,
    make_cnn_optimizer,
    soft_band_label,
    split_folds,
    train_classify_model,
    train_refine_model,
)


class TestSoftBandLabel:
    def test_diagonal_band(self):
        label = soft_band_label((32, 32), [(5, 15, 5, 15)])
        # On the diagonal: distance 0 -> value 1.
        assert label[10, 10] == pytest.approx(1.0)
        assert label[5, 5] == pytest.approx(1.0)
        # Off the band: zero.
        assert label[5, 20] == 0.0
        assert label[25, 5] == 0.0
        # One off-diagonal: 0 < value < 1.
        assert 0.0 < label[10, 11] < 1.0

    def test_empty_gt(self):
        assert soft_band_label((16, 16), []).sum() == 0.0

    def test_degenerate_segment_skipped(self):
        label = soft_band_label((16, 16), [(3, 3, 5, 5)])
        assert np.isfinite(label).all()


class TestAugment:
    def test_augment_preserves_shape_and_finiteness(self):
        rng = np.random.default_rng(0)
        sim = rng.standard_normal((40, 50)).astype(np.float32)
        for _ in range(20):
            out = augment_sim(sim.copy(), rng)
            assert out.shape == sim.shape
            assert np.isfinite(out).all()


def test_split_folds_deterministic():
    ids = [f"Q{i:06d}" for i in range(20)]
    a1 = split_folds(ids, seed=2023)
    a2 = split_folds(ids, seed=2023)
    assert a1 == a2
    assert len(a1) == 10


def make_planted_dataset(n_pos=8, n_neg=8, size=32, dim=8, seed=0):
    """Classify data: positives have a bright diagonal, negatives noise."""
    rng = np.random.default_rng(seed)
    features, infos = [], []
    for i in range(n_pos + n_neg):
        sim = rng.random((size, size)).astype(np.float32) * 0.1
        label = 1 if i < n_pos else 0
        if label:
            d = np.arange(5, size - 5)
            sim[d, d] = 0.95
        features.append(sim)
        infos.append([f"Q{i:06d}", f"R{i:06d}", label])
    return features, infos


def test_classify_training_learns_diagonal():
    """A tiny CNN trained on planted data should separate pos from neg."""
    import flax.linen as nn

    class TinyCNN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            x = nn.Conv(16, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = x.mean(axis=(1, 2))
            return nn.Dense(2)(x)

    features, infos = make_planted_dataset(n_pos=16, n_neg=16)
    states, fold_a = train_classify_model(
        TinyCNN, features, infos, num_epochs=30, batch=8, resolution=32, lr=3e-3
    )
    assert len(states) == 2
    # Evaluate fold-out accuracy with model h1 on fold A.
    model, state = states[0]
    from vsc22_tpu.matching.simmat import pad_sim_matrix

    images = jnp.asarray(np.stack([pad_sim_matrix(f, 32) for f in features]))
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, images, train=False
    )
    preds = np.asarray(logits).argmax(1)
    labels = np.array([i[2] for i in infos])
    acc = (preds == labels).mean()
    assert acc > 0.8


def test_refine_training_runs_and_learns_band():
    """SAM tiny model: loss decreases and heatmap fires on the band."""
    from vsc22_tpu.models.hrnet import sam_hrnet_tiny_test

    rng = np.random.default_rng(1)
    meta = []
    size = 32
    for i in range(6):
        r = rng.standard_normal((size, 8)).astype(np.float32)
        r /= np.linalg.norm(r, axis=1, keepdims=True)
        q = rng.standard_normal((size, 8)).astype(np.float32) * 0.1
        q[5:25] = r[5:25]  # diagonal copy
        meta.append((f"Q{i:06d}", f"R{i:06d}", q, r, [(5, 25, 5, 25)]))
    states, _ = train_refine_model(
        sam_hrnet_tiny_test, meta, num_epochs=6, batch=2, resolution=size
    )
    model, state = states[0]
    qid, rid, q, r, gt = meta[0]
    sim = (q @ r.T).astype(np.float32)
    x = jnp.asarray(np.stack([sim, sim, sim], axis=-1))[None]
    prob = jax.nn.softmax(
        model.apply({"params": state.params, "batch_stats": state.batch_stats}, x, train=False),
        axis=-1,
    )[0, :, :, 1]
    prob = np.asarray(prob)
    on_band = np.mean([prob[t, t] for t in range(6, 24)])
    off_band = prob[2, 28]
    assert on_band > off_band


def test_matching_training_cli_end_to_end(tmp_path):
    """Full 3-phase matching trainer on planted descriptors (tiny models)."""
    from vsc22_tpu.core.storage import store_features
    from vsc22_tpu.core.types import Match, VideoFeature
    from vsc22_tpu.train import matching_cli
    import pandas as pd

    rng = np.random.default_rng(0)
    dim = 16

    def normed(x):
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    refs, queries, gt, cands = [], [], [], []
    for i in range(8):
        refs.append(VideoFeature(
            video_id=f"R{i:06d}", feature=normed(rng.standard_normal((24, dim))),
            timestamps=np.arange(24.0)))
    for i in range(8):
        f = normed(rng.standard_normal((20, dim)))
        if i < 4:  # planted copies
            f[5:15] = refs[i].feature[3:13]
            gt.append(Match(query_id=f"Q{i:06d}", ref_id=f"R{i:06d}", score=1.0,
                            query_start=5., query_end=15., ref_start=3., ref_end=13.))
        queries.append(VideoFeature(
            video_id=f"Q{i:06d}", feature=f, timestamps=np.arange(20.0)))
        # candidates: true pair + one distractor each
        cands.append((f"Q{i:06d}", f"R{i:06d}"))
        cands.append((f"Q{i:06d}", f"R{(i+4) % 8:06d}"))

    qp, rp = tmp_path / "q.npz", tmp_path / "r.npz"
    store_features(str(qp), queries)
    store_features(str(rp), refs)
    gt_path = tmp_path / "gt.csv"
    Match.write_csv(gt, str(gt_path))
    pd.DataFrame(cands, columns=["query_id", "ref_id"]).assign(score=1.0).to_csv(
        tmp_path / "cands.csv", index=False)

    result = matching_cli.main([
        "--query_features", str(qp), "--ref_features", str(rp),
        "--candidates", str(tmp_path / "cands.csv"), "--gt", str(gt_path),
        "--work_dir", str(tmp_path / "run"), "--tiny",
        "--cls_epochs", "8", "--refine_epochs", "4",
        "--cls_resolution", "32", "--refine_resolution", "32",
        "--cls_threshold", "0.0", "--lr", "3e-3",
    ])
    assert (tmp_path / "run" / "candidate_scores.csv").exists()
    assert (tmp_path / "run" / "classify_h1.npz").exists()
    assert (tmp_path / "run" / "refine_h2.npz").exists()
    assert result["classify_ap"] > 0.3  # learned something out-of-fold
