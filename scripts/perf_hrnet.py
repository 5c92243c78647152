"""SAM-HRNet device timing: whole forward + per-component breakdown.

The matching track's stage-5 cost is fold x TTA = 4 SAM-HRNet@224 forwards
per refined pair (pipelines/matching_infer.RefineEnsemble). This script
measures, on the current backend:

  - the full SAMHRNet forward at the serving batch (16 images, bf16);
  - per-component walls (stem+layer1, each stage group, fuse head) by
    timing nested sub-programs and differencing;
  - the scanned 2-fold x TTA ensemble program exactly as serving runs it.

Output: one JSON line with ms/batch and refined-pairs/s. Run with the TPU
relay up; falls back to CPU shapes with --tiny.

  python scripts/perf_hrnet.py            # full size (chip)
  python scripts/perf_hrnet.py --tiny     # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tiny" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from vsc22_tpu.utils.benchmark import time_scanned


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--no_s2d", action="store_true",
                    help="disable the packed branch-0 serving path")
    args = ap.parse_args()

    from vsc22_tpu.models.hrnet import (
        HRNetFeatures,
        SAMHRNet,
        sam_hrnet_tiny_test,
        sam_hrnet_w18,
    )

    dt = jnp.float32 if args.tiny else jnp.bfloat16
    s2d = not (args.tiny or args.no_s2d)
    model = sam_hrnet_tiny_test() if args.tiny else sam_hrnet_w18(dtype=dt, s2d=s2d)
    res = 64 if args.tiny else args.res
    b = 2 if args.tiny else args.batch

    x = jax.random.normal(jax.random.PRNGKey(0), (b, res, res, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, res, res, 3)))

    report = {"batch": b, "res": res, "dtype": str(dt.__name__ if hasattr(dt, '__name__') else dt), "s2d": s2d}

    # Full forward.
    sec = time_scanned(
        lambda im, v: model.apply(v, im, train=False), (x, variables),
        iters=10, repeats=2,
    )
    report["full_ms_per_batch"] = round(sec * 1e3, 2)
    report["pairs_per_sec_4fwd"] = round(b / sec / 4.0, 2)  # 2 folds x TTA

    # Backbone only (head cost by difference).
    feats_model = HRNetFeatures(model.cfg, dtype=dt, s2d_branch0=s2d)
    fv = {"params": variables["params"]["backbone"],
          "batch_stats": variables["batch_stats"]["backbone"]}
    sec_bb = time_scanned(
        lambda im, v: feats_model.apply(v, im.astype(dt), train=False)[-1],
        (x, fv), iters=10, repeats=2,
    )
    report["backbone_ms"] = round(sec_bb * 1e3, 2)
    report["head_ms_by_diff"] = round((sec - sec_bb) * 1e3, 2)

    # Scanned 2-fold x TTA serving program.
    from vsc22_tpu.pipelines.matching_infer import RefineEnsemble

    ens = RefineEnsemble([(model, variables), (model, variables)], resolution=res, batch=b)
    if ens._scanned is not None:
        fwd, stack = ens._scanned
        im = jax.random.normal(jax.random.PRNGKey(2), (b, res, res), jnp.float32)
        sec_e = time_scanned(lambda a, s: fwd(s, a), (im, stack), iters=5, repeats=2)
        report["ensemble_tta_ms_per_batch"] = round(sec_e * 1e3, 2)
        report["refined_pairs_per_sec"] = round(b / sec_e, 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
