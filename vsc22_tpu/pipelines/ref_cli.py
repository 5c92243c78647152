"""Reference feature-extraction CLI (the extract_ref_feats.py / infer_ref.sh
entry point).

Usage (run once per model, as infer_ref.sh does):
  python -m vsc22_tpu.pipelines.ref_cli \
      --videos DIR --out outputs/swinv2_v106/train_refs \
      --model swinv2_base_256:ckpt.params.npz:256:vit \
      [--process_index 0 --process_count 1] [--no_merge]

No FSD on references (reference applies scene detection to queries only);
features are per-frame, L2-unnormalized (normalization happens at fusion).
Multi-process runs write per-shard npz files; process 0 merges after all
shards exist (use parallel.distributed.barrier in multi-host launches).
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp

from vsc22_tpu.data.frames import read_frames
from vsc22_tpu.models.registry import build_backbone
from vsc22_tpu.pipelines.preprocess import discover_videos
from vsc22_tpu.pipelines.query_extract import DescriptorExtractor
from vsc22_tpu.pipelines.ref_extract import extract_references, merge_shards
from vsc22_tpu.train.checkpoint import load_params_snapshot

logger = logging.getLogger("ref_cli")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--videos", required=True)
    parser.add_argument("--out", required=True, help="output prefix (no extension)")
    parser.add_argument(
        "--model", required=True, help="backbone_type:params.npz|-:size:preset"
    )
    parser.add_argument("--fps", type=float, default=1.0)
    parser.add_argument("--process_index", type=int, default=0)
    parser.add_argument("--process_count", type=int, default=1)
    parser.add_argument("--no_merge", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    backbone, params_path, size, preset = args.model.split(":")
    model = build_backbone({"type": backbone})
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, int(size), int(size), 3)), train=False
    )
    params = (
        load_params_snapshot(params_path, template) if params_path != "-" else template
    )
    extractor = DescriptorExtractor(
        model=model, params=params, size=int(size), preset=preset
    )

    videos = []
    for vid, path in discover_videos(args.videos):
        frames = read_frames(path, fps=args.fps)
        if not frames:
            logger.warning("skipping %s (decode failed)", vid)
            continue
        videos.append((vid if vid.startswith("R") else f"R{vid}", frames))

    extract_references(
        videos,
        extractor,
        args.out,
        process_index=args.process_index,
        process_count=args.process_count,
        merge=False,
    )
    if args.process_index == 0 and not args.no_merge:
        out = merge_shards(args.out)
        logger.info("merged -> %s", out)
        return out
    return None


if __name__ == "__main__":
    main()
