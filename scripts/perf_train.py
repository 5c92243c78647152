"""Training-step throughput on the real chip (images/s, fwd+bwd).

The reference trains each ensemble member for 40 epochs at ~20 min/epoch on
4x8 A100 (D1/README.md:132-138). This measures our contrastive train step
(global-batch InfoNCE + entropy, AdamW, EMA) for the two production
backbones on one v5e chip — the single-chip datapoint behind the mesh
scaling story (the step is the same pjit program at any mesh size).

  python scripts/perf_train.py --model vit --batch 48
  python scripts/perf_train.py --model swin --batch 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") != "cpu":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit", choices=["vit", "swin"])
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--fgm", action="store_true",
                    help="FGM adversarial second pass (reference v106 default)")
    ap.add_argument("--remat", action="store_true",
                    help="activation checkpointing (reference --checkpointing)")
    args = ap.parse_args()

    from vsc22_tpu.models.swinv2 import swinv2_base_256_descriptor
    from vsc22_tpu.models.vit import vit_base_patch32_384_descriptor
    from vsc22_tpu.train.contrastive import (
        ContrastiveConfig,
        create_train_state,
        make_train_step,
    )

    if args.model == "vit":
        model = vit_base_patch32_384_descriptor(dtype=jnp.bfloat16)
        size = 384
    else:
        # Per-block remat lives in the model (nn.remat on each SwinBlock):
        # it bounds the backward's peak memory, which the whole-model
        # jax.checkpoint wrap cannot (the recomputation's residuals still
        # coexist there).
        model = swinv2_base_256_descriptor(dtype=jnp.bfloat16, remat=args.remat)
        size = 256

    cfg = ContrastiveConfig(
        total_steps=1000, entropy_weight=30.0,
        fgm_epsilon=0.1 if args.fgm else None,
        remat=args.remat and args.model == "vit",
    )
    rng = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(rng)
    batch = {
        "img_a": jax.random.normal(ka, (args.batch, size, size, 3), jnp.float32),
        "img_b": jax.random.normal(kb, (args.batch, size, size, 3), jnp.float32),
    }
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, cfg)
    step = make_train_step(model, tx, cfg)

    state, metrics = step(state, batch, rng)  # compile
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    loss = float(metrics["loss"])  # host sync
    elapsed = time.perf_counter() - t0
    images_per_sec = 2 * args.batch * args.steps / elapsed  # two views per step
    # Reference anchor: each ensemble member trains ~20 min/epoch on 4x8
    # A100 (D1/README.md:132-138) over the VSC train split (~100k videos ->
    # ~100k sampled pairs/epoch with the reference's 1-pair-per-video
    # epoch definition). Projection assumes linear scaling over a v5e mesh
    # (the step is one pjit program; batch-axis collectives ride ICI).
    pairs_per_epoch = 100_000
    epoch_min_1chip = pairs_per_epoch / (images_per_sec / 2) / 60
    print(
        json.dumps(
            {
                "model": args.model,
                "train_images_per_sec": round(images_per_sec, 1),
                "step_ms": round(1e3 * elapsed / args.steps, 1),
                "batch_pairs": args.batch,
                "fgm": bool(args.fgm),
                "ema": True,
                "remat": bool(args.remat),
                "loss": round(loss, 4),
                "projected_epoch_min_1chip": round(epoch_min_1chip, 1),
                "projected_epoch_min_32chips": round(epoch_min_1chip / 32, 1),
                "reference_epoch_min_32xA100": 20,
            }
        )
    )


if __name__ == "__main__":
    main()
