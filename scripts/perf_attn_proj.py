"""A/B timing for the fused attention+proj(+LN/QKV) kernels at CLIP scale.

Compares, at the serving shape ([B, 257, 1024] bf16, 16 heads):
  - old per-op path: packed_attention kernel + XLA transposes/proj/residual;
  - variant A: attn_proj_residual_fused (QKV GEMM in XLA, rest fused),
    transpose modes "dot" (MXU identity) and "vpu" (vector transpose);
  - variant B: ln_attn_proj_residual_fused (LN1+QKV also in-kernel), both
    transpose modes; apples-to-apples vs XLA ln+qkv + variant A;
and the full CLIP tower forward with the current wiring.

  python scripts/perf_attn_proj.py [--batch 128]
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

from vsc22_tpu.utils.benchmark import time_scanned

L = 257
C = 1024
HEADS = 16
HD = C // HEADS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    b = args.batch
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    x = jnp.asarray(rng.standard_normal((b, L, C)), dt)
    qkv = jnp.asarray(rng.standard_normal((b, L, 3 * C)), dt)
    ln_s = jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    qkv_w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, dt)
    qkv_b = jnp.asarray(0.1 * rng.standard_normal(3 * C), jnp.float32)
    proj_w = jnp.asarray(rng.standard_normal((C, C)) * 0.02, dt)
    proj_b = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)

    results = {}
    attn_flops = 2 * 2 * b * L * L * C
    qkv_flops = 2 * b * L * C * 3 * C
    proj_flops = 2 * b * L * C * C

    def t(name, fn, a, flops=None, iters=20):
        try:
            sec = time_scanned(fn, a, iters=iters, repeats=2)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(name, results[name], flush=True)
            return None
        results[name] = {"ms": round(sec * 1e3, 3)}
        if flops:
            results[name]["tflops"] = round(flops / sec / 1e12, 1)
        print(name, results[name], flush=True)
        return sec

    # Old per-op pieces: packed attention + XLA slices/proj/residual.
    from vsc22_tpu.ops.pallas_attn import packed_attention

    def old_path(x, qkv, proj_w, proj_b):
        q, k, v = (
            qkv.reshape(b, L, 3, HEADS, HD)[:, :, i].astype(dt) for i in range(3)
        )
        out = packed_attention(q * (HD**-0.5), k, v)
        out = out.reshape(b, L, C).astype(dt)
        proj = jnp.dot(out, proj_w, preferred_element_type=jnp.float32) + proj_b
        return x + proj.astype(dt)

    t("old_attn_proj", old_path, (x, qkv, proj_w, proj_b),
      flops=attn_flops + proj_flops)

    from vsc22_tpu.ops.pallas_attn_proj import (
        attn_proj_residual_fused,
        ln_attn_proj_residual_fused,
    )

    for mode in ("dot", "vpu"):
        t(
            f"variant_a_{mode}",
            lambda x, qkv, pw, pb, m=mode: attn_proj_residual_fused(
                x, qkv, pw, pb, HEADS, transpose_mode=m
            ),
            (x, qkv, proj_w, proj_b),
            flops=attn_flops + proj_flops,
        )
    for mode in ("dot", "vpu"):
        t(
            f"variant_b_{mode}",
            lambda x, m=mode: ln_attn_proj_residual_fused(
                x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, HEADS,
                transpose_mode=m,
            ),
            (x,),
            flops=attn_flops + proj_flops + qkv_flops,
        )

    # Variant B replaces LN1 + the XLA QKV GEMM too: old total for the
    # attention half = xla_ln_qkv + old_attn_proj.
    from vsc22_tpu.models.clip import _ln

    t(
        "xla_ln_qkv",
        lambda x, w, bb: (
            jnp.dot(
                _ln(x, ln_s, ln_b, dt), w, preferred_element_type=jnp.float32
            )
            + bb
        ).astype(dt),
        (x, qkv_w, qkv_b),
        flops=qkv_flops,
    )

    # Full CLIP tower with the current wiring (serving chunk of 48).
    from vsc22_tpu.models.clip import clip_vit_l14

    model = clip_vit_l14(dtype=dt)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    imgs = jnp.asarray(rng.standard_normal((48, 224, 224, 3)), dt)
    sec = t(
        "clip48_fwd",
        lambda p, im: model.apply(p, im)[:, 0],
        (params, imgs),
        iters=6,
    )
    if sec:
        results["clip_frames_per_s"] = round(48.0 / sec, 1)

    print(json.dumps(results, indent=2, default=str))


if __name__ == "__main__":
    main()
