"""Benchmark: descriptor extraction throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's end-to-end query pipeline runs at
~1 video/s on one A100 (D1/README.md:139). Here we measure the dominating
stage — the flagship ViT-B/32@384 descriptor forward in bf16 — and convert
frames/s to videos/s at the corpus average of ~32 one-fps frames per video.

Timing notes: on this environment's TPU relay, block_until_ready does not
synchronize and host fetches cost ~30 ms; iterations are therefore amortized
inside one jitted lax.scan with a single host sync (see
vsc22_tpu.utils.benchmark). Params are jit arguments, never closures — the
remote-compile path rejects programs with >100MB of baked-in constants.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

FRAMES_PER_VIDEO = 32  # ~average VSC video length at 1 fps
BASELINE_VIDEOS_PER_SEC = 1.0  # reference: 1 A100, end-to-end (D1/README.md:139)


def main():
    from vsc22_tpu.models.vit import vit_base_patch32_384_descriptor
    from vsc22_tpu.utils.benchmark import time_scanned

    model = vit_base_patch32_384_descriptor(dtype=jnp.bfloat16)
    batch = 64  # fastest point of the measured 64..512 sweep
    images = jax.random.normal(jax.random.PRNGKey(0), (batch, 384, 384, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), images[:1], train=False)

    def step(images, params):
        return model.apply(params, images, train=False)

    sec_per_iter = time_scanned(step, (images, params), iters=20, repeats=3)
    frames_per_sec = batch / sec_per_iter
    videos_per_sec = frames_per_sec / FRAMES_PER_VIDEO
    print(
        json.dumps(
            {
                "metric": "descriptor_extraction_throughput",
                "value": round(videos_per_sec, 3),
                "unit": "videos/sec/chip",
                "vs_baseline": round(videos_per_sec / BASELINE_VIDEOS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
