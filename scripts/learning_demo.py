"""Training-convergence demonstration (VERDICT r1 #5).

Shows the contrastive trainer actually LEARNS: on a procedurally generated
image corpus, hard-augmented retrieval µAP after a few hundred real
`descriptor_cli` steps (EMA + FGM on, with a mid-run resume) beats the
untrained model by a wide margin, and the loss decreases.

Positives are NON-trivial: queries are hard-pipeline augmentations
(overlays, stacks, crops, mixup — data/augment.py) of held-out images, so an
injective random feature map does not solve the task (unlike the planted
exact copies in the integration tests).

Run:  python scripts/learning_demo.py --work_dir /tmp/learning_demo
Writes docs/learning_demo.md with the loss trace + µAP table.

Parity anchor: the reference trains 40 epochs of the same loss on VSC data
(D1/train/train_v68/descriptor_train.py:288-318, log in train_v68/log.txt);
no VSC data or checkpoints exist in this environment, so a synthetic corpus
driven through the same code path is the strongest available evidence.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must run on the virtual CPU mesh (multi-device InfoNCE all-gather).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def make_image(rng: np.random.Generator, size: int = 128) -> np.ndarray:
    """A structured, diverse procedural image (gradient + shapes + texture)."""
    import cv2

    c0 = rng.integers(0, 256, 3).astype(np.float32)
    c1 = rng.integers(0, 256, 3).astype(np.float32)
    ramp = np.linspace(0, 1, size, dtype=np.float32)
    axis = rng.integers(0, 2)
    grad = ramp[:, None] if axis == 0 else ramp[None, :]
    img = (c0 * (1 - grad[..., None]) + c1 * grad[..., None]).astype(np.uint8)
    img = np.ascontiguousarray(np.broadcast_to(img, (size, size, 3)))
    for _ in range(int(rng.integers(3, 8))):
        color = tuple(int(v) for v in rng.integers(0, 256, 3))
        kind = rng.integers(0, 3)
        if kind == 0:
            cv2.circle(img, tuple(int(v) for v in rng.integers(10, size - 10, 2)),
                       int(rng.integers(6, size // 3)), color, -1)
        elif kind == 1:
            p0 = rng.integers(0, size - 20, 2)
            p1 = p0 + rng.integers(10, size // 2, 2)
            cv2.rectangle(img, tuple(int(v) for v in p0), tuple(int(v) for v in p1), color, -1)
        else:
            cv2.line(img, tuple(int(v) for v in rng.integers(0, size, 2)),
                     tuple(int(v) for v in rng.integers(0, size, 2)), color,
                     int(rng.integers(2, 6)))
    noise = rng.normal(0, 8, img.shape)
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def encode_jpg(img: np.ndarray) -> bytes:
    import cv2

    ok, buf = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 92])
    assert ok
    return buf.tobytes()


def build_corpus(work_dir: str, n_train: int, n_val: int, seed: int = 0):
    from vsc22_tpu.data.store import FrameStore

    rng = np.random.default_rng(seed)
    imgs = [make_image(rng) for _ in range(n_train + n_val)]
    train_videos = [(f"T{i:06d}", [encode_jpg(imgs[i])]) for i in range(n_train)]
    store_path = os.path.join(work_dir, "train_frames.rec")
    FrameStore.build(store_path, train_videos)
    return store_path, imgs[n_train:]


def descriptors(model, params, images, width: int, batch: int = 32) -> np.ndarray:
    from vsc22_tpu.data.datasets import _resize_norm_host

    x = np.stack([_resize_norm_host(im, width, "vit") for im in images])
    outs = []
    fwd = jax.jit(lambda p, im: model.apply(p, im, train=False))
    for s in range(0, len(x), batch):
        block = x[s : s + batch]
        pad = batch - len(block)
        if pad:
            block = np.concatenate([block, np.zeros((pad,) + block.shape[1:], block.dtype)])
        outs.append(np.asarray(fwd(params, jnp.asarray(block)))[: batch - pad if pad else batch])
    f = np.concatenate(outs).astype(np.float32)
    return f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)


def retrieval_uap(q_feats, r_feats, gt_idx) -> float:
    """µAP of ranked (query, ref) cosine candidates; GT = source image."""
    from vsc22_tpu.core.metrics import average_precision
    from vsc22_tpu.core.types import CandidatePair

    sims = q_feats @ r_feats.T
    k = min(20, sims.shape[1])
    top = np.argsort(-sims, axis=1)[:, :k]
    preds = [
        CandidatePair(query_id=f"Q{q:05d}", ref_id=f"R{r:05d}", score=float(sims[q, r]))
        for q in range(sims.shape[0])
        for r in top[q]
    ]
    gt = [CandidatePair(query_id=f"Q{q:05d}", ref_id=f"R{g:05d}", score=1.0)
          for q, g in enumerate(gt_idx)]
    return average_precision(gt, preds).ap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/learning_demo")
    ap.add_argument("--n_train", type=int, default=1200)
    ap.add_argument("--n_val", type=int, default=300)
    ap.add_argument("--epochs_a", type=int, default=16, help="first run segment")
    ap.add_argument("--epochs_b", type=int, default=48, help="resumed total epochs")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--lr", default="4e-4")
    ap.add_argument(
        "--model", default="swinv2_tiny_test",
        choices=["swinv2_tiny_test", "vit_tiny_test"],
        help="swinv2 is the reference's flagship family (VERDICT r2 #8)",
    )
    ap.add_argument("--out_md", default="docs/learning_demo.md")
    args = ap.parse_args()

    os.makedirs(args.work_dir, exist_ok=True)
    store_path, val_imgs = build_corpus(args.work_dir, args.n_train, args.n_val)
    print(f"corpus: {args.n_train} train / {args.n_val} val images", flush=True)

    from vsc22_tpu.data.augment import build_hard_pipelines
    from vsc22_tpu.train import descriptor_cli

    if args.model == "swinv2_tiny_test":
        from vsc22_tpu.models.swinv2 import swinv2_tiny_test_descriptor

        width = 64  # 64² keeps the hard augs' structure visible
        model = swinv2_tiny_test_descriptor(output_dim=32, img_size=64, window_size=8)
        model_overrides = [
            "model.type=swinv2_tiny_test", "model.output_dim=32",
            "model.img_size=64", "model.window_size=8", "img_width=64",
        ]
    else:
        from vsc22_tpu.models.vit import vit_tiny_test_descriptor

        width = 64
        model = vit_tiny_test_descriptor()
        model_overrides = []

    # Hard-augmented queries from half the val refs (the non-trivial task).
    rng = np.random.default_rng(42)
    pipelines = build_hard_pipelines(width, 0.8, 0.1,
                                     lambda r: val_imgs[int(r.integers(len(val_imgs)))])
    gt_idx = list(range(0, len(val_imgs), 2))
    queries = []
    for g in gt_idx:
        pipe = pipelines[int(rng.integers(len(pipelines)))]
        queries.append(pipe(val_imgs[g], rng))

    untrained = model.init(jax.random.PRNGKey(0), jnp.zeros((1, width, width, 3)))
    q0 = descriptors(model, untrained, queries, width)
    r0 = descriptors(model, untrained, val_imgs, width)
    uap_untrained = retrieval_uap(q0, r0, gt_idx)
    print(f"untrained µAP: {uap_untrained:.4f}", flush=True)

    cli_common = [
        "--config", "configs/tiny_smoke.py",
        "--store", store_path,
        "--work_dir", args.work_dir,
        "--batch_size", str(args.batch_size),
        "--num_workers", "8",
        "--lr", str(args.lr),
        "--entropy_weight", "10",
        "--do_ema", "--do_fgm",
        "--print_freq", "5",
    ] + model_overrides
    # Segment A, then resume for segment B (exercises checkpoint/resume).
    descriptor_cli.main(cli_common + ["--epochs", str(args.epochs_a)])
    state = descriptor_cli.main(cli_common + ["--epochs", str(args.epochs_b), "--resume"])

    params = jax.device_get(state.params)
    q1 = descriptors(model, params, queries, width)
    r1 = descriptors(model, params, val_imgs, width)
    uap_trained = retrieval_uap(q1, r1, gt_idx)
    uap_ema = None
    if state.ema_params is not None:
        ema = jax.device_get(state.ema_params)
        uap_ema = retrieval_uap(
            descriptors(model, ema, queries, width),
            descriptors(model, ema, val_imgs, width), gt_idx)
    print(f"trained µAP: {uap_trained:.4f}  ema µAP: {uap_ema}", flush=True)

    # Loss trace from the CLI's own log.
    log_path = os.path.join(args.work_dir, "log.txt")
    losses = []
    for line in open(log_path):
        m = re.search(r"Epoch (\d+) Batch (\d+) Loss ([\d.]+)", line)
        if m:
            losses.append((int(m.group(1)), int(m.group(2)), float(m.group(3))))

    os.makedirs(os.path.dirname(args.out_md), exist_ok=True)
    with open(args.out_md, "w") as f:
        f.write("# Learning demonstration (synthetic corpus, real trainer)\n\n")
        f.write("Generated by `scripts/learning_demo.py` — the descriptor_cli trainer\n")
        f.write(f"(EMA+FGM on, resume at epoch {args.epochs_a}) on {args.n_train} procedural\n")
        f.write("images; queries are hard-pipeline augmentations of held-out images.\n\n")
        f.write("| model | retrieval µAP (canonical) |\n|---|---|\n")
        f.write(f"| untrained | {uap_untrained:.4f} |\n")
        f.write(f"| trained   | {uap_trained:.4f} |\n")
        if uap_ema is not None:
            f.write(f"| trained (EMA) | {uap_ema:.4f} |\n")
            # The EMA row lags by construction at this run length: decay
            # 0.999 (the reference's, tuned for its ~100k-step schedule)
            # keeps 0.999^steps of the UNTRAINED init in the average.
            steps = len(losses) * 5 if losses else 0  # log every 5th batch
            f.write(
                "\nThe EMA number is expected to sit between untrained and "
                "trained here,\nnot above trained: decay 0.999 has a "
                f"~693-step half-life, and this demo runs\nonly ~{steps} "
                "steps, so the average still carries "
                f"~{0.999**max(steps,1):.2f} weight on the\nrandom init. "
                "On the reference's real schedule (25k steps/epoch x 4+ "
                "epochs,\nD1 train_v106.sh) the init term is ~0 and EMA "
                "tracks (and smooths) the\ntrained weights — the lag is a "
                "property of the short demo, not an EMA bug.\n")
        f.write("\n## Loss trace (per logged step)\n\n```\n")
        first = losses[0][2] if losses else float("nan")
        last = losses[-1][2] if losses else float("nan")
        f.write(f"first logged loss: {first:.3f}   last: {last:.3f}\n")
        for e, b, l in losses:
            f.write(f"epoch {e:3d} batch {b:3d}  loss {l:.3f}\n")
        f.write("```\n")
    print(f"wrote {args.out_md}", flush=True)

    assert uap_trained > uap_untrained + 0.2, (
        f"training did not clearly improve retrieval: {uap_untrained} -> {uap_trained}")
    print("LEARNING DEMO PASSED", flush=True)


if __name__ == "__main__":
    main()
