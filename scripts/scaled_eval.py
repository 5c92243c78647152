"""Reference-scale descriptor-track evaluation on chip (VERDICT r1 #7).

Synthesizes a corpus at the reference's operating point — 10k query videos x
40k ref videos (~1.3M ref frames, 512-d) with planted copies — and runs the
full eval path (pipelines.descriptor_eval: score-norm -> global-1200/query
budget search -> top-25/query candidates -> TN localization -> µAP), timing
every stage with StageTimer.

Reference anchor: D1/infer/vsc/baseline/sscd_baseline.py:90-152 with the
~40k-video VSC corpus (D1/README.md). Run:

  python scripts/scaled_eval.py            # full scale (chip, ~30 min)
  python scripts/scaled_eval.py --queries 200 --refs 1000   # smoke
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(n_queries, n_refs, n_noise, frames, dim, planted=100, seed=0):
    from vsc22_tpu.core.types import VideoFeature

    rng = np.random.default_rng(seed)

    def mk(prefix, count, start=0):
        out = []
        for i in range(count):
            # float32-native generation: ~2x faster + half the memory of
            # f64-then-cast; corpus_gen is minutes on this 1-core host.
            f = rng.standard_normal((frames, dim), dtype=np.float32)
            f /= np.linalg.norm(f, axis=1, keepdims=True)
            out.append(
                VideoFeature(
                    video_id=f"{prefix}{start + i:06d}",
                    timestamps=np.arange(frames, dtype=np.float32),
                    feature=f,
                )
            )
        return out

    refs = mk("R", n_refs)
    queries = mk("Q", n_queries)
    noise = mk("R", n_noise, start=n_refs)  # disjoint ids from eval refs
    planted = min(planted, n_queries, n_refs)
    gt = []
    span = min(10, frames - 5)
    for i in range(planted):
        q, r = queries[i], refs[i]
        q.feature[5 : 5 + span] = r.feature[10 : 10 + span] + rng.normal(
            0, 0.05, (span, dim)
        ).astype(np.float32)
        q.feature /= np.linalg.norm(q.feature, axis=1, keepdims=True)
        gt.append((q.video_id, r.video_id, 5.0, 5.0 + span, 10.0, 10.0 + span))
    return queries, refs, noise, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=10_000)
    ap.add_argument("--refs", type=int, default=40_000)
    ap.add_argument("--noise", type=int, default=4_000)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--log_compiles", action="store_true",
                    help="log every XLA compile (diagnose relay compile "
                    "time vs device time in the stage walls)")
    args = ap.parse_args()

    import jax

    if args.log_compiles:
        jax.config.update("jax_log_compiles", True)

    from vsc22_tpu.core.metrics import average_precision
    from vsc22_tpu.core.types import CandidatePair, Match
    from vsc22_tpu.pipelines.descriptor_eval import localize_and_verify, search
    from vsc22_tpu.retrieval.score_norm import (
        query_score_normalize,
        ref_score_normalize,
        _min_variance_dim,
    )
    from vsc22_tpu.utils.observability import StageTimer

    print(f"backend: {jax.default_backend()}", flush=True)
    timer = StageTimer()

    with timer.stage("corpus_gen"):
        queries, refs, noise, gt = make_corpus(
            args.queries, args.refs, args.noise, args.frames, args.dim
        )
    print(
        f"corpus: {args.queries} q x {args.refs} r videos "
        f"({args.queries * args.frames} x {args.refs * args.frames} frames), "
        f"{len(gt)} planted", flush=True,
    )

    with timer.stage("score_norm"):
        low_var = _min_variance_dim(noise)
        sn_queries = query_score_normalize(
            queries, noise, low_var_dim=low_var, beta=1.2, nk=1
        )
        sn_refs = ref_score_normalize(refs, noise, beta=1.2, nk=1)

    with timer.stage("search_1200_per_query"):
        candidates = search(sn_queries, sn_refs, transfer_dtype=np.float16)
    print(f"candidates: {len(candidates)}", flush=True)

    with timer.stage("tn_localization"):
        matches = localize_and_verify(
            sn_queries, sn_refs, candidates,
            score_normalization=True, concurrency=args.concurrency,
        )
    print(f"matches: {len(matches)}", flush=True)

    with timer.stage("metrics"):
        gt_pairs = [CandidatePair(query_id=q, ref_id=r, score=1.0) for q, r, *_ in gt]
        ap_result = average_precision(gt_pairs, candidates)

    print(f"candidate µAP (planted copies): {ap_result.ap:.4f}", flush=True)
    print("stage timings:\n" + timer.report(), flush=True)
    assert ap_result.ap > 0.95, ap_result.ap
    print("SCALED EVAL PASSED", flush=True)


if __name__ == "__main__":
    main()
