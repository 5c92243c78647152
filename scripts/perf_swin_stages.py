"""Per-stage SwinV2-Base timing: fused block kernels at each stage's shape.

Times one fused block per stage at the serving chunk size (48 frames),
plus patch-embed/merging/head overhead by difference vs the full model.
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

from vsc22_tpu.ops.pallas_swin_block import swin_block
from vsc22_tpu.utils.benchmark import time_scanned

FRAMES = 48
DEPTHS = {1: 2, 2: 2, 3: 18, 4: 2}


def stage_shapes(stage):
    # (windows, n, c, heads, nw_shift)
    res = 64 // (2 ** (stage - 1))
    c = 128 * (2 ** (stage - 1))
    window = min(16, res)
    nw = (res // window) ** 2
    return FRAMES * nw, window * window, c, 4 * (2 ** (stage - 1)), nw


def time_stage(stage, shifted):
    w, n, c, h, nw = stage_shapes(stage)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((w, n, c)), dt)
    f = 4 * c
    args = dict(
        qkv_w=jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, dt),
        qkv_b=jnp.asarray(np.concatenate([rng.standard_normal(c), np.zeros(c), rng.standard_normal(c)]) * 0.02, jnp.float32),
        proj_w=jnp.asarray(rng.standard_normal((c, c)) * 0.02, dt),
        proj_b=jnp.asarray(rng.standard_normal(c) * 0.02, jnp.float32),
        ln1_s=jnp.ones((c,), jnp.float32),
        ln1_b=jnp.zeros((c,), jnp.float32),
        fc1_w=jnp.asarray(rng.standard_normal((c, f)) * 0.02, dt),
        fc1_b=jnp.zeros((f,), jnp.float32),
        fc2_w=jnp.asarray(rng.standard_normal((f, c)) * 0.02, dt),
        fc2_b=jnp.zeros((c,), jnp.float32),
        ln2_s=jnp.ones((c,), jnp.float32),
        ln2_b=jnp.zeros((c,), jnp.float32),
        rpb=jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32),
        scale=jnp.ones((h,), jnp.float32),
    )
    use_mask = shifted and nw > 1
    mask = jnp.zeros((nw if use_mask else 1, n, n), jnp.float32)

    def step(x, *rest):
        return swin_block(
            x, args["qkv_w"], args["qkv_b"], args["proj_w"], args["proj_b"],
            args["ln1_s"], args["ln1_b"], args["fc1_w"], args["fc1_b"],
            args["fc2_w"], args["fc2_b"], args["ln2_s"], args["ln2_b"],
            args["rpb"], args["scale"], mask, h, nw if use_mask else 1,
        )

    sec = time_scanned(step, (x,), iters=10, repeats=3)
    return sec


def main():
    total = 0.0
    out = {}
    for stage in (1, 2, 3):
        t_plain = time_stage(stage, shifted=False)
        t_shift = time_stage(stage, shifted=True)
        d = DEPTHS[stage]
        stage_total = (d // 2) * (t_plain + t_shift)
        total += stage_total
        out[f"stage{stage}"] = {
            "ms_block_plain": round(t_plain * 1e3, 2),
            "ms_block_shifted": round(t_shift * 1e3, 2),
            "ms_total": round(stage_total * 1e3, 2),
        }
        print(json.dumps({f"stage{stage}": out[f"stage{stage}"]}), flush=True)

    # whole model for reference
    from vsc22_tpu.models.swinv2 import swinv2_base_256_descriptor

    model = swinv2_base_256_descriptor()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    images = jax.random.normal(jax.random.PRNGKey(1), (FRAMES, 256, 256, 3), jnp.bfloat16)
    sec_model = time_scanned(
        lambda im, p: model.apply(p, im, train=False), (images, params),
        iters=10, repeats=3,
    )
    out["model_ms"] = round(sec_model * 1e3, 2)
    out["blocks123_ms"] = round(total * 1e3, 2)
    out["rest_ms(stage4+embed+merge+head)"] = round((sec_model - total) * 1e3, 2)
    out["frames_per_sec"] = round(FRAMES / sec_model, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
