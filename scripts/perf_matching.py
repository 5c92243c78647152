"""Matching-track inference throughput on the real chip (stages 2-6).

The reference runs matching inference at ~1 video/s on one A100
(M1/README.md:79) INCLUDING the shared stage-1 descriptor extraction;
bench.py measures stage 1 at ~5 videos/s. This script measures the
matching-specific remainder — query score-norm (beta=1.5, nk=10), recall
(threshold search), MobileNetV3 classify filter, HRNet SAM refinement with
transpose TTA, and RANSAC decode — over synthetic descriptors with planted
copies, and reports the combined end-to-end rate
    1 / (1/stage1 + 1/stages2_6).

  python scripts/perf_matching.py                  # full-size models (chip)
  python scripts/perf_matching.py --queries 50 --refs 500
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu" or "--tiny" in sys.argv:
    # env alone is too late when sitecustomize already imported jax with
    # the TPU relay platform; the config update still works pre-backend.
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

# bench.py's measured matching_stage1_videos_per_sec on the v5e (4 SSCD
# models, no VED gate; docs/hw_evidence.jsonl bench_pass2, 2026-08-18).
STAGE1_VIDEOS_PER_SEC = 8.29


def make_corpus(n_queries, n_refs, frames, dim, seed=0, planted_frac=0.1):
    from vsc22_tpu.core.types import VideoFeature

    rng = np.random.default_rng(seed)

    def mk(prefix, count):
        out = []
        for i in range(count):
            f = rng.standard_normal((frames, dim)).astype(np.float32)
            f /= np.linalg.norm(f, axis=1, keepdims=True)
            out.append(
                VideoFeature(
                    video_id=f"{prefix}{i:06d}",
                    timestamps=np.arange(frames, dtype=np.float32),
                    feature=f,
                )
            )
        return out

    queries, refs = mk("Q", n_queries), mk("R", n_refs)
    for i in range(int(planted_frac * n_queries)):
        q, r = queries[i], refs[i % n_refs]
        span = min(12, frames - 4)
        q.feature[2 : 2 + span] = r.feature[4 : 4 + span] + rng.normal(
            0, 0.03, (span, dim)
        ).astype(np.float32)
        q.feature /= np.linalg.norm(q.feature, axis=1, keepdims=True)
    return queries, refs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--refs", type=int, default=500)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--tiny", action="store_true", help="tiny models (CPU smoke)")
    ap.add_argument("--profile", action="store_true", help="per-stage timings to stderr")
    ap.add_argument(
        "--stage1", type=float, default=STAGE1_VIDEOS_PER_SEC,
        help="stage-1 extraction rate for the combined metric; matching's "
        "stage 1 is the 4 SSCD models WITHOUT the VED gate (bench.py "
        "reports it as matching_stage1_videos_per_sec)",
    )
    ap.add_argument("--host_sims", action="store_true",
                    help="force the host sim-matrix path (oracle)")
    ap.add_argument(
        "--keep_fraction", type=float, default=0.05,
        help="stage-5 load per recalled pair; the untrained bench filter "
        "has no selectivity, and the reference's TRAINED filter keeps ~5% "
        "of recalls (matching PDF 2.2), so 0.05 is the production point",
    )
    args = ap.parse_args()

    from vsc22_tpu.models.hrnet import sam_hrnet_tiny_test, sam_hrnet_w18
    from vsc22_tpu.models.mobilenetv3 import mobilenetv3_small
    from vsc22_tpu.pipelines.matching_infer import (
        CLS_RESOLUTION,
        REFINE_RESOLUTION,
        ClassifyEnsemble,
        RefineEnsemble,
        matching_inference,
    )
    from vsc22_tpu.retrieval.score_norm import query_score_normalize, ref_score_normalize

    queries, refs = make_corpus(args.queries, args.refs, args.frames, args.dim)
    noise_q, noise_r = make_corpus(20, 400, args.frames, args.dim, seed=9)
    del noise_q
    for i, vf in enumerate(noise_r):
        noise_r[i] = type(vf)(
            video_id=f"R{900000 + i:06d}", timestamps=vf.timestamps, feature=vf.feature
        )

    cls_models, ref_models = [], []
    for fold in range(2):
        if args.tiny:
            m = mobilenetv3_small(num_classes=2)
            h = sam_hrnet_tiny_test()
        else:
            # bf16 serving: HRNet's 18-channel convs are MXU-pad-bound in
            # f32; bf16 halves the math precision cost at ~1e-2 heatmap
            # probability error (decode thresholds are 0.35/0.1/0.001).
            m = mobilenetv3_small(num_classes=2, dtype=jnp.bfloat16)
            h = sam_hrnet_w18(dtype=jnp.bfloat16, s2d=True)
        cls_models.append(
            (m, m.init(jax.random.PRNGKey(fold), jnp.zeros((1, CLS_RESOLUTION, CLS_RESOLUTION, 3))))
        )
        ref_models.append(
            (h, h.init(jax.random.PRNGKey(10 + fold), jnp.zeros((1, REFINE_RESOLUTION, REFINE_RESOLUTION, 3))))
        )
    classify = ClassifyEnsemble(cls_models)
    refine = RefineEnsemble(ref_models)

    qlen = {v.video_id: args.frames for v in queries}

    timer = None
    if args.profile:
        from vsc22_tpu.utils.observability import StageTimer

        timer = StageTimer()

    def run():
        if timer is not None:
            with timer.stage("score_norm"):
                sn_q = query_score_normalize(queries, noise_r, beta=1.5, nk=10)
                sn_r = ref_score_normalize(refs, noise_r, beta=1.5, nk=10)
        else:
            sn_q = query_score_normalize(queries, noise_r, beta=1.5, nk=10)
            sn_r = ref_score_normalize(refs, noise_r, beta=1.5, nk=10)
        # untrained filter has no selectivity; emulate the trained
        # filter's ~95% rejection (matching PDF 2.2) for a representative
        # stage-5 load
        # reference operating point: ~25 recalled pairs per query video,
        # of which the trained filter keeps ~5% + planted matches
        return matching_inference(
            queries, refs, sn_q, sn_r, qlen, classify, refine,
            cls_keep_fraction=args.keep_fraction,
            max_candidates=25 * args.queries,
            timer=timer,
            use_device_sims=False if args.host_sims else None,
        )

    rows = run()  # warmup/compile
    if timer is not None:
        timer.totals.clear()
        timer.counts.clear()
    t0 = time.perf_counter()
    rows = run()
    elapsed = time.perf_counter() - t0
    if timer is not None:
        print("--- stage profile ---", file=sys.stderr)
        print(timer.report(), file=sys.stderr)
    s26 = args.queries / elapsed
    combined = 1.0 / (1.0 / args.stage1 + 1.0 / s26)
    print(
        json.dumps(
            {
                "matching_stages2_6_videos_per_sec": round(s26, 2),
                "combined_with_stage1_videos_per_sec": round(combined, 2),
                "vs_baseline_1vps": round(combined, 2),
                "n_matches": len(rows),
                "queries": args.queries,
                "refs": args.refs,
                "frames_per_video": args.frames,
            }
        )
    )


if __name__ == "__main__":
    main()
