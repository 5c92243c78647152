"""Device-time breakdown of the serving pipeline, one batch at a time.

Times each device stage of `pipelines.batch_query.BatchedQueryPipeline`
separately (FSD maps+profiles, CLIP preprocess/forward, VSM, per-size
crop-resize einsums, ViT extract, scanned swin ensemble) with relay-safe
synchronization (a small host fetch per timing; `block_until_ready` does
not synchronize through this environment's TPU relay).

This is the round-3 tool that located the serving bottlenecks: CLIP and
the swin ensemble are ~75% of device time; host FSD cut logic is
~13 ms/video and irrelevant. Usage:

    python scripts/perf_serving_stages.py [--videos 16] [--frames 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=16)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--smoke", action="store_true", help="tiny models (CPU check)")
    args = ap.parse_args()

    sys.argv = ["bench.py"]
    import bench as B
    from vsc22_tpu.data import fsd
    from vsc22_tpu.data.transforms import (
        clip_preprocess,
        crop_resize_normalize,
        cubic_resize_weights,
    )

    pipe, sizes = B.build_pipeline(args.smoke)
    res = (128, 128) if args.smoke else (360, 640)
    videos = B.synth_videos(args.videos, args.frames, *res)
    dev = [jax.device_put(v) for v in videos]
    stack = jnp.stack(dev)
    v, h, w = args.videos, *res
    n_frames = v * args.frames

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

    def t(name, fn, reps=3):
        fn()  # warm/compile
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best*1000:8.1f} ms", flush=True)
        return best

    t(f"fsd_maps_profiles[{v}v]",
      lambda: fsd.batch_maps_profiles_dispatch(stack)[1])

    flat_u8 = stack.reshape((-1,) + stack.shape[2:])
    clip_size = pipe.ved.clip_model.cfg.img_size
    t(f"clip_preprocess[{n_frames}f]",
      lambda: clip_preprocess(flat_u8, clip_size, out_dtype=pipe.ved.clip_model.dtype))
    pre_clip = jax.block_until_ready(
        clip_preprocess(flat_u8, clip_size, out_dtype=pipe.ved.clip_model.dtype)
    )

    ved = pipe.ved
    chunk = ved.chunk

    def clip_fwd():
        outs = []
        for s in range(0, n_frames, chunk):
            block = pre_clip[s : s + chunk]
            if block.shape[0] < chunk:
                block = jnp.concatenate(
                    [block, jnp.zeros((chunk - block.shape[0],) + block.shape[1:], block.dtype)]
                )
            outs.append(ved._clip_fwd(ved.clip_params, block))
        return jnp.concatenate(outs)[:n_frames]

    t(f"clip_fwd[{n_frames}f]", clip_fwd)
    feats = jax.block_until_ready(clip_fwd())

    vid_idx = jnp.asarray(np.repeat(np.arange(v, dtype=np.int32), args.frames))
    frame_idx = jnp.asarray(np.tile(np.arange(args.frames, dtype=np.int32), v))
    t(f"vsm[{v}v]",
      lambda: ved._vsm_fwd(ved.vsm_params, feats, vid_idx, frame_idx, v=v))

    for group, ensemble in pipe._groups:
        ext = group[0]
        wr = jnp.asarray(cubic_resize_weights(h, ext.size, 0, h))
        wc = jnp.asarray(cubic_resize_weights(w, ext.size, 0, w))

        def prep():
            return [
                crop_resize_normalize(d, wr, wc, preset=ext.preset,
                                      out_dtype=ext.model.dtype)
                for d in dev
            ]

        t(f"crop_resize_{ext.size}[{v}v]", prep)
        pre = [jax.block_until_ready(x) for x in prep()]
        target = ensemble if ensemble is not None else ext
        label = f"extract_{ext.size}" + (f"_x{len(group)}" if ensemble else "")
        t(f"{label}[{n_frames}f]", lambda: target.extract_dispatch(pre))


if __name__ == "__main__":
    main()
