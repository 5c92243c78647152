"""Per-backbone throughput measurement on the real chip (frames/s).

Measures the three serving-path backbones (ViT-B/32@384, SwinV2-Base@256,
CLIP ViT-L/14@224) with relay-safe scanned timing, reporting frames/s and
achieved MXU utilization (bf16 peak ~394 TFLOP/s on v5e). Use to track the
SwinV2 fusion work (VERDICT r1 #3: 720 -> target >=1400 f/s).

  python scripts/perf_models.py              # all models, batch 64
  python scripts/perf_models.py --model swin --batch 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 394e12


def flops_vit(img, patch, depth, width, heads, mlp_ratio=4):
    n = (img // patch) ** 2 + 1
    per_block = 4 * n * width * width * 2 + 2 * n * n * width * 2 + \
        2 * n * width * width * mlp_ratio * 2
    return depth * per_block + n * width * 3 * patch * patch * 2


def flops_swinv2_base(img=256):
    total = 0
    res = img // 4
    dims = [128, 256, 512, 1024]
    depths = [2, 2, 18, 2]
    window = 16
    for s, (c, d) in enumerate(zip(dims, depths)):
        r = res // (2**s)
        l = r * r
        n = min(window, r) ** 2
        per_block = (
            3 * l * c * c * 2      # qkv
            + 2 * l * n * c * 2    # attn logits + av
            + l * c * c * 2        # proj
            + 2 * l * c * 4 * c * 2  # mlp
        )
        total += d * per_block
    total += (img // 4) ** 2 * 128 * 3 * 16 * 2  # patch embed
    return total


def measure(name, model, params, size, batch, dtype, has_train_flag=True):
    from vsc22_tpu.utils.benchmark import time_scanned

    images = jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, 3), dtype)
    if has_train_flag:
        fwd = lambda im, p: model.apply(p, im, train=False)
    else:
        fwd = lambda im, p: model.apply(p, im)
    sec = time_scanned(fwd, (images, params), iters=10, repeats=3)
    return batch / sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all", choices=["all", "vit", "swin", "clip"])
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from vsc22_tpu.models.clip import clip_vit_l14
    from vsc22_tpu.models.swinv2 import swinv2_base_256_descriptor
    from vsc22_tpu.models.vit import vit_base_patch32_384_descriptor

    results = {}

    def init(model, size):
        return model.init(jax.random.PRNGKey(1), jnp.zeros((1, size, size, 3), jnp.float32))

    if args.model in ("all", "vit"):
        m = vit_base_patch32_384_descriptor()
        fps = measure("vit", m, init(m, 384), 384, args.batch, jnp.bfloat16)
        fl = flops_vit(384, 32, 12, 768, 12)
        results["vit_b32_384"] = {
            "frames_per_sec": round(fps, 1),
            "mxu_util": round(fps * fl / V5E_BF16_PEAK, 4),
        }
        print(json.dumps({"vit_b32_384": results["vit_b32_384"]}), flush=True)

    if args.model in ("all", "swin"):
        m = swinv2_base_256_descriptor()
        fps = measure("swin", m, init(m, 256), 256, args.batch, jnp.bfloat16)
        fl = flops_swinv2_base()
        results["swinv2_base_256"] = {
            "frames_per_sec": round(fps, 1),
            "mxu_util": round(fps * fl / V5E_BF16_PEAK, 4),
        }
        print(json.dumps({"swinv2_base_256": results["swinv2_base_256"]}), flush=True)

    if args.model in ("all", "clip"):
        m = clip_vit_l14()
        fps = measure(
            "clip", m,
            m.init(jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 3))),
            224, args.batch, jnp.bfloat16, has_train_flag=False,
        )
        fl = flops_vit(224, 14, 24, 1024, 16)
        results["clip_vit_l14_224"] = {
            "frames_per_sec": round(fps, 1),
            "mxu_util": round(fps * fl / V5E_BF16_PEAK, 4),
        }
        print(json.dumps({"clip_vit_l14_224": results["clip_vit_l14_224"]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
