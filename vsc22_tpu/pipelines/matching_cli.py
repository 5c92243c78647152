"""Matching-track inference CLI (the infer_matching.py / infer.sh entry).

Parity target: M1/infer/infer_matching.py stages 2-6, consuming descriptor
features produced by the query/ref extraction CLIs:

  python -m vsc22_tpu.pipelines.matching_cli \
      --query_features q.npz --ref_features r.npz \
      --norm_refs noise.npz --out test_matching.csv \
      [--cls_params h1.npz h2.npz] [--refine_params h1.npz h2.npz] \
      [--query_len_map lens.json]

Without trained classify/refine params the CLI runs with randomly
initialized models (useful for plumbing smoke tests only).
"""

from __future__ import annotations

import argparse
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from vsc22_tpu.core.storage import load_features
from vsc22_tpu.core.types import Dataset
from vsc22_tpu.models.hrnet import sam_hrnet_w18
from vsc22_tpu.models.mobilenetv3 import mobilenetv3_small
from vsc22_tpu.pipelines.matching_infer import (
    CLS_RESOLUTION,
    REFINE_RESOLUTION,
    ClassifyEnsemble,
    RefineEnsemble,
    matching_inference,
)
from vsc22_tpu.pipelines.query_extract import calculate_low_var_dim
from vsc22_tpu.retrieval.score_norm import query_score_normalize, ref_score_normalize
from vsc22_tpu.train.checkpoint import load_cnn_snapshot

logger = logging.getLogger("matching_cli")


def _load_cnn(model, sample_shape, params_paths):
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(sample_shape), train=False)
    out = []
    for p in params_paths:
        if p == "-":
            out.append((model, variables))
        else:
            out.append((model, load_cnn_snapshot(p, variables)))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--query_features", required=True)
    parser.add_argument("--ref_features", required=True)
    parser.add_argument("--norm_refs", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--cls_params", nargs="*", default=["-", "-"])
    parser.add_argument("--refine_params", nargs="*", default=["-", "-"])
    parser.add_argument("--query_len_map", default=None, help="json vid->num_frames")
    parser.add_argument("--beta", type=float, default=1.5)
    parser.add_argument("--nk", type=int, default=10)
    parser.add_argument("--cls_threshold", type=float, default=0.0005)
    parser.add_argument(
        "--tiny", action="store_true", help="tiny models (plumbing smoke tests)"
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    queries = load_features(args.query_features, Dataset.QUERIES)
    refs = load_features(args.ref_features, Dataset.REFS)
    noise = load_features(args.norm_refs, Dataset.REFS)

    if args.query_len_map:
        with open(args.query_len_map) as f:
            len_map = {k: int(v) for k, v in json.load(f).items()}
    else:
        len_map = {v.video_id: len(v) for v in queries}

    low_var_dim = calculate_low_var_dim(noise)
    sn_queries = query_score_normalize(
        queries, noise, video_scores=None, low_var_dim=low_var_dim,
        beta=args.beta, nk=args.nk,
    )
    sn_refs = ref_score_normalize(refs, noise, beta=args.beta, nk=args.nk)

    if args.tiny:
        from vsc22_tpu.models.hrnet import sam_hrnet_tiny_test

        cls_model = mobilenetv3_small()
        refine_model = sam_hrnet_tiny_test()
    else:
        cls_model = mobilenetv3_small()
        refine_model = sam_hrnet_w18(s2d=True)
    classify = ClassifyEnsemble(
        _load_cnn(cls_model, (1, CLS_RESOLUTION, CLS_RESOLUTION, 3), args.cls_params)
    )
    refine = RefineEnsemble(
        _load_cnn(refine_model, (1, REFINE_RESOLUTION, REFINE_RESOLUTION, 3), args.refine_params)
    )

    rows = matching_inference(
        queries, refs, sn_queries, sn_refs, len_map, classify, refine,
        cls_threshold=args.cls_threshold,
    )
    df = pd.DataFrame(
        rows,
        columns=["query_id", "ref_id", "query_start", "query_end", "ref_start", "ref_end", "score"],
    )
    for col in ("query_start", "query_end", "ref_start", "ref_end"):
        df[col] = df[col].astype(np.float64)
    df.to_csv(args.out, index=False)
    logger.info("wrote %d matches to %s", len(df), args.out)
    return args.out


if __name__ == "__main__":
    main()
