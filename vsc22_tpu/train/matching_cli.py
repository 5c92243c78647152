"""Matching-track training orchestration (the train_matching.py entry point).

Parity target (reference, for cross-checking — original implementation):
  M1/train/train_matching.py:255-541 — three phases:
    A. per-candidate sim matrices (+ transposes) labeled by the matching GT;
       2-fold MobileNetV3 training with out-of-fold probability prediction;
    B. pairs above the classify threshold get soft-band-labeled SAM
       training (2-fold HRNet, 128^2, random transpose);
    C. out-of-fold SAM heatmaps decoded at 3 operating points and evaluated
       with the segment-AP metric.

Usage:
  python -m vsc22_tpu.train.matching_cli --query_features q.npz \
      --ref_features r.npz --candidates candidates.csv --gt gt.csv \
      --work_dir runs/matching [--tiny] [--cls_epochs 10] [--refine_epochs 20]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from vsc22_tpu.core.storage import load_features
from vsc22_tpu.core.types import Dataset, Match
from vsc22_tpu.matching.simmat import candidate_sim_matrices, pad_sim_matrix, select_best_split_segment
from vsc22_tpu.train.matching import train_classify_model, train_refine_model

logger = logging.getLogger("matching_train")


def _l2(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def cross_fold_classify_predict(
    states, features, infos, fold_a, resolution: int, batch: int = 64
) -> pd.DataFrame:
    """Every candidate scored by the fold model that did not train on it."""
    rows = []
    fns = []
    for model, state in states:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fns.append(
            jax.jit(
                lambda v, im, m=model: jax.nn.softmax(m.apply(v, im, train=False), axis=1)[:, 1]
            )
        )
    vars_list = [
        {"params": s.params, "batch_stats": s.batch_stats} for _, s in states
    ]
    # states[0] trained outside fold A -> scores fold A; states[1] reverse.
    for start in range(0, len(features), batch):
        chunk_f = features[start : start + batch]
        chunk_i = infos[start : start + batch]
        images = np.stack(
            [
                pad_sim_matrix(np.asarray(f[0] if isinstance(f, list) else f, np.float32), resolution)
                for f in chunk_f
            ]
        )
        x = jnp.asarray(images)
        p0 = np.asarray(fns[0](vars_list[0], x))
        p1 = np.asarray(fns[1](vars_list[1], x))
        for (qid, rid, label), a, b in zip(chunk_i, p0, p1):
            prob = a if qid in fold_a else b
            rows.append({"query_id": qid, "ref_id": rid, "prob": float(prob), "label": int(label)})
    return pd.DataFrame(rows)


def cross_fold_refine_predict(states, meta, fold_a, resolution: int):
    """Out-of-fold SAM heatmaps with transpose TTA; rows for decode."""
    fns = []
    for model, state in states:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fns.append(
            (
                jax.jit(
                    lambda v, im, m=model: jax.nn.softmax(m.apply(v, im, train=False), axis=-1)[..., 1]
                ),
                variables,
            )
        )
    out = []
    for qid, rid, qf, rf, gt_list in meta:
        # states[0] trained on fold A -> scores out-of-fold rows, etc.
        fn, variables = fns[1] if qid in fold_a else fns[0]
        sim = (qf @ rf.T).astype(np.float32)
        x = jnp.asarray(pad_sim_matrix(sim, resolution))[None]
        p = np.asarray(fn(variables, x))[0]
        pt = np.asarray(fn(variables, jnp.swapaxes(x, 1, 2)))[0].T
        prob = (p + pt) / 2.0
        h = min(sim.shape[0], resolution)
        w = min(sim.shape[1], resolution)
        out.append((qid, rid, prob[:h, :w], sim[:h, :w]))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--query_features", required=True)
    parser.add_argument("--ref_features", required=True)
    parser.add_argument("--candidates", required=True, help="candidates.csv (query_id,ref_id,score)")
    parser.add_argument("--gt", required=True, help="matching ground truth csv")
    parser.add_argument("--work_dir", required=True)
    parser.add_argument("--cls_epochs", type=int, default=10)
    parser.add_argument("--refine_epochs", type=int, default=20)
    parser.add_argument("--cls_threshold", type=float, default=0.1)
    parser.add_argument("--cls_resolution", type=int, default=160)
    parser.add_argument("--refine_resolution", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--seed", type=int, default=2023)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.work_dir, exist_ok=True)

    queries = {v.video_id: _l2(v.feature) for v in load_features(args.query_features, Dataset.QUERIES)}
    refs = {v.video_id: _l2(v.feature) for v in load_features(args.ref_features, Dataset.REFS)}
    len_map = {k: len(v) for k, v in queries.items()}

    gt = Match.read_csv(args.gt, is_gt=True)
    gt_pairs = {(m.query_id, m.ref_id) for m in gt}
    gt_boxes: Dict[Tuple[str, str], List] = {}
    for m in gt:
        gt_boxes.setdefault((m.query_id, m.ref_id), []).append(
            (m.query_start, m.query_end, m.ref_start, m.ref_end)
        )

    cand_df = pd.read_csv(args.candidates)
    candidates = [
        (str(q), str(r), 1.0 if (str(q), str(r)) in gt_pairs else 0.0)
        for q, r in zip(cand_df.query_id, cand_df.ref_id)
        if str(q) in queries and str(r) in refs
    ]
    logger.info("phase A: %d candidates (%d positive)", len(candidates), sum(c[2] for c in candidates))
    features, infos = candidate_sim_matrices(queries, refs, candidates, len_map)

    if args.tiny:
        import flax.linen as nn

        class TinyCNN(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                x = nn.Conv(8, (3, 3), strides=(4, 4))(x)
                x = nn.BatchNorm(use_running_average=not train)(x)
                x = nn.relu(x).mean(axis=(1, 2))
                return nn.Dense(2)(x)

        cls_factory = TinyCNN
        from vsc22_tpu.models.hrnet import sam_hrnet_tiny_test as refine_factory
    else:
        from vsc22_tpu.models.mobilenetv3 import mobilenetv3_small as cls_factory
        from vsc22_tpu.models.hrnet import sam_hrnet_w18 as refine_factory

    cls_states, fold_a = train_classify_model(
        cls_factory, features, infos,
        num_epochs=args.cls_epochs, resolution=args.cls_resolution,
        seed=args.seed, lr=args.lr,
    )
    pred_df = cross_fold_classify_predict(cls_states, features, infos, fold_a, args.cls_resolution)
    score_file = os.path.join(args.work_dir, "candidate_scores.csv")
    pred_df.to_csv(score_file, index=False)
    ap = _binary_ap(pred_df)
    logger.info("phase A done: out-of-fold classify AP %.4f -> %s", ap, score_file)

    best = pred_df.groupby(["query_id", "ref_id"]).prob.max().reset_index()
    selected = best[best.prob > args.cls_threshold]
    logger.info("phase B: %d pairs above threshold %.4g", len(selected), args.cls_threshold)
    meta = [
        (
            q,
            r,
            select_best_split_segment(queries[q], refs[r], len_map[q]),
            refs[r],
            gt_boxes.get((q, r), []),
        )
        for q, r in zip(selected.query_id, selected.ref_id)
    ]
    refine_states, fold_a2 = train_refine_model(
        refine_factory, meta,
        num_epochs=args.refine_epochs, resolution=args.refine_resolution,
        seed=args.seed, lr=args.lr,
    )

    refined = cross_fold_refine_predict(refine_states, meta, fold_a2, args.refine_resolution)
    from vsc22_tpu.matching.decode import decode_all_settings

    rows = decode_all_settings(refined)
    match_df = pd.DataFrame(
        [[q, r, float(qs), float(qe), float(rs), float(re), s] for q, r, qs, rs, qe, re, s in rows],
        columns=["query_id", "ref_id", "query_start", "query_end", "ref_start", "ref_end", "score"],
    )
    match_file = os.path.join(args.work_dir, "val_matches.csv")
    match_df.to_csv(match_file, index=False)

    from vsc22_tpu.core.metrics import evaluate_matching_track

    seg_ap = None
    if len(match_df):
        seg_ap = evaluate_matching_track(args.gt, match_file).segment_ap.ap
        logger.info("phase C: segment AP %.4f (%d matches)", seg_ap, len(match_df))

    # Save fold params for inference (loadable by pipelines.matching_cli).
    from vsc22_tpu.train.checkpoint import save_cnn_snapshot

    for tag, (model, state) in zip(("h1", "h2"), cls_states):
        save_cnn_snapshot(
            os.path.join(args.work_dir, f"classify_{tag}.npz"), state.params, state.batch_stats
        )
    for tag, (model, state) in zip(("h1", "h2"), refine_states):
        save_cnn_snapshot(
            os.path.join(args.work_dir, f"refine_{tag}.npz"), state.params, state.batch_stats
        )
    with open(os.path.join(args.work_dir, "summary.json"), "w") as f:
        json.dump({"classify_ap": ap, "segment_ap": seg_ap, "pairs": len(meta)}, f)
    return {"classify_ap": ap, "segment_ap": seg_ap, "match_file": match_file}


def _binary_ap(df: pd.DataFrame) -> float:
    from vsc22_tpu.core.metrics import _binary_average_precision

    if df.label.sum() == 0:
        return 0.0
    return float(_binary_average_precision(df.label.to_numpy(), df.prob.to_numpy()))


if __name__ == "__main__":
    main()
