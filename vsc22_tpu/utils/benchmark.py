"""Device-timing helpers that survive the axon TPU relay.

On this environment's TPU backend, `block_until_ready()` does not actually
synchronize (the relay acks dispatch, not completion) and every host fetch
pays a ~30 ms HTTP round-trip floor. Reliable kernel timing therefore:

  1. amortizes N iterations inside ONE jitted `lax.scan` whose carry makes
     each iteration data-dependent on the previous (defeats CSE/hoisting);
  2. synchronizes by fetching a scalar output to the host;
  3. subtracts the measured empty-program round-trip floor.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def roundtrip_floor(n: int = 3) -> float:
    """Measured host<->device round-trip latency for a trivial program."""

    @jax.jit
    def nop(x):
        return x + 1.0

    x = jnp.zeros((), jnp.float32)
    np.asarray(nop(x))
    t0 = time.perf_counter()
    for _ in range(n):
        x = jnp.asarray(np.asarray(nop(x)))
    return (time.perf_counter() - t0) / n


def time_scanned(step_fn: Callable, args: Tuple, iters: int = 20, repeats: int = 3) -> float:
    """Time `step_fn(*args)` amortized over `iters` in-device iterations.

    step_fn must return an array; its mean is chained into a tiny additive
    perturbation of the first argument so iterations stay sequential and
    non-foldable. Returns seconds per iteration (relay floor removed).
    """

    @jax.jit
    def loop(*args):
        def body(carry, _):
            out = step_fn(args[0] + carry.astype(args[0].dtype), *args[1:])
            # Data-dependent, numerically negligible carry.
            return jnp.mean(out).astype(jnp.float32) * 1e-24, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    np.asarray(loop(*args))  # compile + warm
    floor = roundtrip_floor()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - floor, 1e-9) / iters
