"""Decompose SwinV2-Base@256 serving time OUTSIDE the fused block kernels.

perf_swin_stages measures fused blocks at 24.8-ish ms per 48-frame forward
with ~8 ms unaccounted ("rest" = stage4 + patch-embed + merges + head + the
window partition/reverse/roll glue around every block). This script times
each of those pieces individually at serving shapes, plus the per-stage
block PAIR with and without its spatial glue, so the partition/reverse/roll
cost is isolated by difference. Decides whether folding the window
partition into the kernel's BlockSpecs (spatial [B,H,W,C] in/out) is worth
the cache invalidation.
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

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vsc22_tpu.models.swinv2 import (
    _shift_attn_mask,
    window_partition,
    window_reverse,
)
from vsc22_tpu.ops.pallas_swin_block import swin_block
from vsc22_tpu.utils.benchmark import time_scanned

FRAMES = int(os.environ.get("VSC22_GLUE_FRAMES", "48"))
ITERS = int(os.environ.get("VSC22_GLUE_ITERS", "10"))
DT = jnp.bfloat16
# (resolution, channels, heads) per stage of SwinV2-Base@256.
STAGES = {1: (64, 128, 4), 2: (32, 256, 8), 3: (16, 512, 16), 4: (8, 1024, 32)}
DEPTHS = {1: 2, 2: 2, 3: 18, 4: 2}


def block_args(c, h, n, rng):
    f = 4 * c
    return dict(
        qkv_w=jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, DT),
        qkv_b=jnp.asarray(
            np.concatenate([rng.standard_normal(c), np.zeros(c), rng.standard_normal(c)]) * 0.02,
            jnp.float32,
        ),
        proj_w=jnp.asarray(rng.standard_normal((c, c)) * 0.02, DT),
        proj_b=jnp.asarray(rng.standard_normal(c) * 0.02, jnp.float32),
        ln1_s=jnp.ones((c,), jnp.float32),
        ln1_b=jnp.zeros((c,), jnp.float32),
        fc1_w=jnp.asarray(rng.standard_normal((c, f)) * 0.02, DT),
        fc1_b=jnp.zeros((f,), jnp.float32),
        fc2_w=jnp.asarray(rng.standard_normal((f, c)) * 0.02, DT),
        fc2_b=jnp.zeros((c,), jnp.float32),
        ln2_s=jnp.ones((c,), jnp.float32),
        ln2_b=jnp.zeros((c,), jnp.float32),
        rpb=jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32),
        scale=jnp.ones((h,), jnp.float32),
    )


def run_block(w_in, a, mask, h, nw):
    return swin_block(
        w_in, a["qkv_w"], a["qkv_b"], a["proj_w"], a["proj_b"],
        a["ln1_s"], a["ln1_b"], a["fc1_w"], a["fc1_b"],
        a["fc2_w"], a["fc2_b"], a["ln2_s"], a["ln2_b"],
        a["rpb"], a["scale"], mask, h, nw,
    )


def time_stage_pair(stage):
    """One (unshifted, shifted) block pair: with glue vs kernels-only."""
    res, c, h = STAGES[stage]
    window = min(16, res)
    shift = window // 2 if res > window else 0
    n = window * window
    nw = (res // window) ** 2
    rng = np.random.default_rng(stage)
    a = block_args(c, h, n, rng)
    zero_mask = jnp.zeros((1, n, n), jnp.float32)
    if shift > 0:
        smask = jnp.asarray(_shift_attn_mask(res, res, window, shift))
        s_nw = smask.shape[0]
    else:
        smask, s_nw = zero_mask, 1

    x_spatial = jnp.asarray(
        np.random.default_rng(0).standard_normal((FRAMES, res, res, c)), DT
    )
    windows = window_partition(x_spatial, window)

    def pair_glue(x):
        # unshifted block, full glue
        w0 = window_partition(x, window)
        x = window_reverse(run_block(w0, a, zero_mask, h, 1), window, res, res)
        # shifted block, full glue (stage>=3: shift collapses to 0)
        if shift > 0:
            xs = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            w1 = window_partition(xs, window)
            o = window_reverse(run_block(w1, a, smask, h, s_nw), window, res, res)
            x = jnp.roll(o, shift=(shift, shift), axis=(1, 2))
        else:
            w1 = window_partition(x, window)
            x = window_reverse(run_block(w1, a, zero_mask, h, 1), window, res, res)
        return x

    def pair_kernels(w_in):
        o = run_block(w_in, a, zero_mask, h, 1)
        return run_block(o, a, smask if shift > 0 else zero_mask, h, s_nw if shift > 0 else 1)

    t_glue = time_scanned(pair_glue, (x_spatial,), iters=ITERS, repeats=3)
    t_kern = time_scanned(pair_kernels, (windows,), iters=ITERS, repeats=3)
    return t_glue, t_kern


def main():
    out = {}
    rngi = np.random.default_rng(7)

    # Patch embed (conv 4x4/4 + LN) on serving input.
    conv = nn.Conv(128, kernel_size=(4, 4), strides=(4, 4), padding="VALID", dtype=DT)
    images = jnp.asarray(rngi.standard_normal((FRAMES, 256, 256, 3)), DT)
    cparams = conv.init(jax.random.PRNGKey(0), images)
    ln = nn.LayerNorm(dtype=DT)
    lparams = ln.init(jax.random.PRNGKey(1), jnp.zeros((1, 4096, 128)))

    def embed(im):
        x = conv.apply(cparams, im).reshape(FRAMES, 4096, 128)
        return ln.apply(lparams, x)

    out["patch_embed_ms"] = round(time_scanned(embed, (images,), iters=ITERS, repeats=3) * 1e3, 2)
    print(json.dumps({"patch_embed_ms": out["patch_embed_ms"]}), flush=True)

    # Patch merges (2x2 concat + Dense 4C->2C + LN).
    merge_total = 0.0
    for stage in (1, 2, 3):
        res, c, _ = STAGES[stage]
        dense = nn.Dense(2 * c, use_bias=False, dtype=DT)
        dp = dense.init(jax.random.PRNGKey(2), jnp.zeros((1, 4 * c)))
        mln = nn.LayerNorm(dtype=DT)
        mlp_ = mln.init(jax.random.PRNGKey(3), jnp.zeros((1, 2 * c)))
        x = jnp.asarray(rngi.standard_normal((FRAMES, res, res, c)), DT)

        def merge(xs, _dp=dp, _mlp=mlp_, _dense=dense, _mln=mln, _res=res, _c=c):
            parts = [xs[:, 0::2, 0::2], xs[:, 1::2, 0::2], xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]]
            y = jnp.concatenate(parts, axis=-1).reshape(FRAMES, (_res // 2) ** 2, 4 * _c)
            return _mln.apply(_mlp, _dense.apply(_dp, y))

        t = time_scanned(merge, (x,), iters=ITERS, repeats=3)
        merge_total += t
        out[f"merge{stage - 1}_ms"] = round(t * 1e3, 2)
    out["merges_ms"] = round(merge_total * 1e3, 2)
    print(json.dumps({k: v for k, v in out.items() if k.startswith("merge")}), flush=True)

    # Head: final LN + GeM pool + Dense(512) at [48, 64, 1024].
    from vsc22_tpu.models.layers import gem_pool

    hln = nn.LayerNorm(dtype=DT)
    hlp = hln.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 1024)))
    hd = nn.Dense(512, dtype=jnp.float32)
    hdp = hd.init(jax.random.PRNGKey(5), jnp.zeros((1, 1024)))
    xh = jnp.asarray(rngi.standard_normal((FRAMES, 64, 1024)), DT)

    def head(x):
        y = hln.apply(hlp, x)
        return hd.apply(hdp, gem_pool(y, 3.0, axis=1))

    out["head_ms"] = round(time_scanned(head, (xh,), iters=ITERS, repeats=3) * 1e3, 2)
    print(json.dumps({"head_ms": out["head_ms"]}), flush=True)

    # Per-stage block pairs: glue cost by difference.
    total_glue = 0.0
    total_kern = 0.0
    for stage in (1, 2, 3, 4):
        t_glue, t_kern = time_stage_pair(stage)
        pairs = DEPTHS[stage] // 2
        stage_glue_ms = (t_glue - t_kern) * pairs * 1e3
        total_glue += stage_glue_ms
        total_kern += t_kern * pairs * 1e3
        out[f"stage{stage}"] = {
            "pair_with_glue_ms": round(t_glue * 1e3, 2),
            "pair_kernels_ms": round(t_kern * 1e3, 2),
            "glue_ms_x_pairs": round(stage_glue_ms, 2),
        }
        print(json.dumps({f"stage{stage}": out[f"stage{stage}"]}), flush=True)

    out["total_glue_ms"] = round(total_glue, 2)
    out["total_kernels_ms"] = round(total_kern, 2)
    out["accounted_ms"] = round(
        out["patch_embed_ms"] + out["merges_ms"] + out["head_ms"] + total_glue + total_kern, 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
