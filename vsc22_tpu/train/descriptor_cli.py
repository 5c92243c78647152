"""Descriptor-training CLI: the torch.distributed.launch entry, TPU-style.

Parity target (reference, for cross-checking — original implementation):
  D1/train/train_v106/descriptor_train.py (argparse surface: batch_size, lr,
  t, epochs, warmup_ratio, entropy_weight, seed, do_ema/do_fgm, margin,
  ici_weight, product_loss, work_dir, resume) driven by train_v106.sh; model
  and dataset come from an executable config file.

Usage:
  python -m vsc22_tpu.train.descriptor_cli --config cfg.py --store frames.rec \
      --work_dir runs/v1 --batch_size 32 --epochs 2 [model.type=...]

The config file defines `model` (registry dict) and optionally `data`
(dataset kwargs). Multi-chip: one process per host, mesh over all devices,
batches sharded on the data axis (the global-batch InfoNCE all-gather is
induced by sharding).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from vsc22_tpu.data.datasets import DataLoader, FramePairDataset, LabeledFramePairDataset
from vsc22_tpu.data.store import FrameStore
from vsc22_tpu.models.registry import build_backbone
from vsc22_tpu.parallel.mesh import create_mesh
from vsc22_tpu.train.checkpoint import CheckpointManager, save_ema_snapshot
from vsc22_tpu.train.contrastive import (
    ContrastiveConfig,
    create_train_state,
    make_train_step,
)
from vsc22_tpu.utils.config import Config, parse_override_args
from vsc22_tpu.utils.observability import StageTimer, setup_logging


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--store", required=True, action="append",
                   help="frame record store path (repeatable: datasets concatenate)")
    p.add_argument("--work_dir", required=True)
    p.add_argument("--ann_path", default=None, help="matching GT csv (labeled sampler)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--t", type=float, default=0.05)
    p.add_argument("--margin", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--clip_grad_norm", type=float, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--entropy_weight", type=float, default=30.0)
    p.add_argument("--ici_weight", type=float, default=1.0)
    p.add_argument("--do_ema", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--do_fgm", action="store_true")
    p.add_argument("--product_loss", action="store_true")
    p.add_argument("--checkpointing", action="store_true", help="activation remat")
    p.add_argument("--print_freq", type=int, default=50)
    p.add_argument("--resume", action="store_true")
    p.add_argument("overrides", nargs="*", default=[])
    return p.parse_args(argv)


def build_dataset(cfg: Config, args, store: FrameStore):
    data_kwargs = cfg.get("data", Config()).to_dict() if "data" in cfg else {}
    data_kwargs.setdefault("width", cfg.get("img_width", 256))
    data_kwargs.setdefault("preset", cfg.get("preprocess", "vit"))
    if args.ann_path:
        import pandas as pd

        ann_df = pd.read_csv(args.ann_path)
        annotations = ann_df[
            ["query_id", "ref_id", "query_start", "query_end", "ref_start", "ref_end"]
        ].values.tolist()
        return LabeledFramePairDataset(store, annotations, **data_kwargs)
    return FramePairDataset(store, **data_kwargs)


def main(argv=None):
    args = parse_args(argv)
    cfg = Config.fromfile(args.config).merge_flags(parse_override_args(args.overrides))
    logger = setup_logging("descriptor_train", args.work_dir)
    logger.info("config: %s", cfg.to_dict())

    mesh = create_mesh()
    dp = mesh.shape["data"]
    if args.batch_size % dp:
        raise SystemExit(
            f"--batch_size {args.batch_size} must be divisible by the data-axis "
            f"size {dp} (devices visible to this process)"
        )
    stores = [FrameStore(path) for path in args.store]
    datasets = [build_dataset(cfg, args, store) for store in stores]
    if len(datasets) == 1:
        dataset = datasets[0]
    else:
        from vsc22_tpu.data.datasets import ConcatDataset

        dataset = ConcatDataset(datasets)
    loader = DataLoader(
        dataset,
        batch_size=args.batch_size,
        seed=args.seed,
        num_workers=args.num_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    steps_per_epoch = max(len(dataset) // (args.batch_size * jax.process_count()), 1)
    total_steps = steps_per_epoch * args.epochs

    train_cfg = ContrastiveConfig(
        temperature=args.t,
        margin=args.margin,
        ici_weight=args.ici_weight,
        entropy_weight=args.entropy_weight,
        product_loss=args.product_loss,
        learning_rate=args.lr,
        warmup_ratio=args.warmup_ratio,
        total_steps=total_steps,
        clip_grad_norm=args.clip_grad_norm,
        ema_decay=args.ema_decay if args.do_ema else None,
        fgm_epsilon=0.1 if args.do_fgm else None,
        remat=args.checkpointing,
    )
    model = build_backbone(cfg.model.to_dict())
    width = cfg.get("img_width", 256)
    sample = {
        "img_a": jnp.zeros((args.batch_size, width, width, 3), jnp.float32),
        "img_b": jnp.zeros((args.batch_size, width, width, 3), jnp.float32),
    }
    state, tx = create_train_state(model, jax.random.PRNGKey(args.seed), sample, train_cfg, mesh=mesh)
    step_fn = make_train_step(model, tx, train_cfg, mesh=mesh)

    ckpt = CheckpointManager(os.path.join(args.work_dir, "checkpoints"))
    start_epoch = 0
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_epoch = int(jax.device_get(state.step)) // steps_per_epoch
        logger.info("resumed from step %s (epoch %d)", ckpt.latest_step(), start_epoch)

    timer = StageTimer()
    rng = jax.random.PRNGKey(args.seed + jax.process_index())
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        for b, batch in enumerate(loader.epoch(epoch)):
            rng, sub = jax.random.split(rng)
            with timer.stage("train_step"):
                state, metrics = step_fn(
                    state,
                    {
                        "img_a": jnp.asarray(batch["img_a"]),
                        "img_b": jnp.asarray(batch["img_b"]),
                    },
                    sub,
                )
            if b % args.print_freq == 0:
                m = jax.device_get(metrics)
                logger.info(
                    "Epoch %d Batch %d Loss %.3f, ICI Loss %.3f, Entropy loss %.3f.",
                    epoch,
                    b,
                    float(m["loss"]),
                    float(m["ici_loss"]),
                    float(m["entropy_loss"]),
                )
        if jax.process_index() == 0:
            ckpt.save(int(jax.device_get(state.step)), state)
            save_ema_snapshot(
                os.path.join(args.work_dir, f"epoch_{epoch}_ema.npz"), state
            )
        logger.info("epoch %d done in %.1fs", epoch, time.time() - t0)
    logger.info("timing:\n%s", timer.report())
    return state


if __name__ == "__main__":
    main()
