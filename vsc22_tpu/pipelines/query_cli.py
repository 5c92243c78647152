"""Query feature-extraction CLI (the extract_query_feats.py entry point).

Parity target: D1/infer/extract_query_feats.py CLI surface + infer_query.sh.

Loads exported model artifacts (utils.export) for each ensemble member,
decodes query videos, runs the flagship pipeline (VED gating when CLIP+VSM
artifacts are given, FSD, ensemble, dedup, PCA), writes per-model
sub-features plus the score-normalized fused features.

Usage:
  python -m vsc22_tpu.pipelines.query_cli \
      --videos DIR --out_dir outputs --split test \
      --model vit_v68:vit_base_patch32_384:ckpt.params.npz:384:efficientnet \
      [--model ...x4] --pca pca_model.npz --norm_refs train_refs.npz \
      [--clip clip.params.npz --vsm vsm.params.npz]
"""

from __future__ import annotations

import argparse
import logging
import os
import jax
import jax.numpy as jnp

from vsc22_tpu.core.storage import load_features, store_features
from vsc22_tpu.core.types import Dataset
from vsc22_tpu.data.frames import read_frames
from vsc22_tpu.models.registry import build_backbone
from vsc22_tpu.ops.pca import PCAModel
from vsc22_tpu.pipelines.query_extract import (
    BETA,
    NK,
    SCORE_THRESHOLD,
    DescriptorExtractor,
    QueryPipeline,
    VideoEditDetector,
    calculate_low_var_dim,
)
from vsc22_tpu.pipelines.preprocess import discover_videos
from vsc22_tpu.retrieval.score_norm import query_score_normalize
from vsc22_tpu.train.checkpoint import load_params_snapshot

logger = logging.getLogger("query_cli")


def build_extractor(spec: str) -> tuple:
    """'name:backbone_type:params.npz:size:preset' -> (name, extractor)."""
    name, backbone, params_path, size, preset = spec.split(":")
    model = build_backbone({"type": backbone})
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, int(size), int(size), 3)), train=False
    )
    params = (
        load_params_snapshot(params_path, template) if params_path != "-" else template
    )
    return name, DescriptorExtractor(model=model, params=params, size=int(size), preset=preset)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--videos", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--split", default="test")
    parser.add_argument("--model", action="append", required=True)
    parser.add_argument("--pca", default=None)
    parser.add_argument("--norm_refs", required=True)
    parser.add_argument("--clip", default=None, help="CLIP params npz ('-' = random init)")
    parser.add_argument("--vsm", default=None, help="video-score params npz")
    parser.add_argument("--fps", type=float, default=1.0)
    parser.add_argument("--no_fsd", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    names, extractors = zip(*(build_extractor(s) for s in args.model))
    pca = PCAModel.load(args.pca) if args.pca else None

    ved = None
    if args.clip and args.vsm:
        from vsc22_tpu.models.clip import clip_vit_l14
        from vsc22_tpu.models.vsm import vsm_base

        clip_model = clip_vit_l14()
        clip_template = clip_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
        )
        clip_params = (
            load_params_snapshot(args.clip, clip_template) if args.clip != "-" else clip_template
        )
        vsm_model = vsm_base()
        vsm_template = vsm_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 1024)), train=False
        )
        vsm_params = (
            load_params_snapshot(args.vsm, vsm_template) if args.vsm != "-" else vsm_template
        )
        ved = VideoEditDetector(clip_model, clip_params, vsm_model, vsm_params)

    pipe = QueryPipeline(list(extractors), pca=pca, ved=ved, use_fsd=not args.no_fsd)

    os.makedirs(args.out_dir, exist_ok=True)
    fused, subs = [], []
    for vid, path in discover_videos(args.videos):
        frames = read_frames(path, fps=args.fps)
        if not frames:
            logger.warning("skipping %s (decode failed)", vid)
            continue
        feat, sub_feats = pipe.process_video(f"Q{vid}" if not vid.startswith("Q") else vid, frames)
        fused.append(feat)
        subs.append(sub_feats)
        logger.info("%s: %d frames -> %d descriptors", vid, len(frames), len(feat))

    for i, name in enumerate(names):
        sub_dir = os.path.join(args.out_dir, name)
        os.makedirs(sub_dir, exist_ok=True)
        store_features(
            os.path.join(sub_dir, f"{args.split}_query.npz"), [s[i] for s in subs]
        )

    score_norm_refs = load_features(args.norm_refs, Dataset.REFS)
    low_var_dim = calculate_low_var_dim(score_norm_refs)
    normalized = query_score_normalize(
        fused,
        score_norm_refs,
        pipe.video_scores,
        SCORE_THRESHOLD,
        low_var_dim,
        nk=NK,
        beta=BETA,
    )
    out = os.path.join(args.out_dir, f"{args.split}_query_sn.npz")
    store_features(out, normalized)
    logger.info("wrote %s (%d videos)", out, len(normalized))
    return out


if __name__ == "__main__":
    main()
