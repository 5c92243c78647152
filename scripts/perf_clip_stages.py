"""Per-stage CLIP ViT-L/14 timing: where the 24-layer tower spends time.

Times, at the serving chunk (48 frames, bf16):
  - full CLIPVisual forward (frames/s + effective TFLOP/s);
  - one block through the per-op path's pieces, individually jitted:
    LN1, QKV GEMM, packed attention kernel, proj GEMM, LN2, fused MLP;
  - the patchify conv + embedding glue by difference.

  python scripts/perf_clip_stages.py
"""

from __future__ import annotations

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

from vsc22_tpu.utils.benchmark import time_scanned

B = 48
L = 257
C = 1024
HEADS = 16
HD = C // HEADS


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    x = jnp.asarray(rng.standard_normal((B, L, C)), dt)
    ln_s = jnp.ones((C,), jnp.float32)
    ln_b = jnp.zeros((C,), jnp.float32)
    qkv_w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, dt)
    qkv_b = jnp.zeros((3 * C,), jnp.float32)
    proj_w = jnp.asarray(rng.standard_normal((C, C)) * 0.02, dt)
    proj_b = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, 4 * C)) * 0.02, dt)
    b1 = jnp.zeros((4 * C,), dt)
    w2 = jnp.asarray(rng.standard_normal((4 * C, C)) * 0.02, dt)
    b2 = jnp.zeros((C,), dt)
    q = jnp.asarray(rng.standard_normal((B, L, HEADS, HD)), dt)
    k = jnp.asarray(rng.standard_normal((B, L, HEADS, HD)), dt)
    v = jnp.asarray(rng.standard_normal((B, L, HEADS, HD)), dt)

    from vsc22_tpu.models.clip import _ln
    from vsc22_tpu.ops.pallas_attn import attention
    from vsc22_tpu.ops.pallas_mlp import fused_mlp

    results = {}

    def t(name, fn, args, flops=None):
        sec = time_scanned(fn, args, iters=20, repeats=2)
        results[name] = {"ms": round(sec * 1e3, 3)}
        if flops:
            results[name]["tflops"] = round(flops / sec / 1e12, 1)
        print(name, results[name], flush=True)
        return sec

    t("ln", lambda x, s, b: _ln(x, s, b, dt), (x, ln_s, ln_b))
    t(
        "qkv_gemm",
        lambda x, w, b: (
            jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        ).astype(dt),
        (x, qkv_w, qkv_b),
        flops=2 * B * L * C * 3 * C,
    )
    t(
        "attention_kernel",
        lambda q, k, v: attention(q * (HD**-0.5), k, v),
        (q, k, v),
        flops=2 * 2 * B * L * L * C,
    )
    t(
        "proj_gemm",
        lambda x, w, b: (
            jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        ).astype(dt),
        (x, proj_w, proj_b),
        flops=2 * B * L * C * C,
    )
    t(
        "fused_mlp",
        lambda x, w1, b1, w2, b2: fused_mlp(
            x.reshape(B * L, C), w1, b1, w2, b2, "quick_gelu"
        ),
        (x, w1, b1, w2, b2),
        flops=2 * 2 * B * L * C * 4 * C,
    )

    # Whole-block kernel for comparison (the round-2 "neutral" path).
    from vsc22_tpu.ops.pallas_vit_block import vit_block

    t(
        "vit_block_fused",
        lambda x: vit_block(
            x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, ln_s, ln_b,
            w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
            HEADS, "quick_gelu", 1e-5,
        ),
        (x,),
        flops=2 * B * L * (3 * C * C + C * C + 8 * C * C) + 2 * 2 * B * L * L * C,
    )

    # Full model.
    from vsc22_tpu.models.clip import clip_vit_l14

    model = clip_vit_l14(dtype=dt)
    images = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), dt)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    layer_flops = 2 * B * L * (3 * C * C + C * C + 8 * C * C) + 2 * 2 * B * L * L * C
    total_flops = 24 * layer_flops + 2 * B * L * C * (14 * 14 * 3)
    sec = t(
        "full_model",
        lambda p, im: model.apply(p, im),
        (params, images),
        flops=total_flops,
    )
    results["full_frames_per_sec"] = round(B / sec, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
