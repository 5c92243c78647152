"""Fused transformer MLP (Pallas TPU kernel): gelu(x@W1+b1)@W2 + b2.

Why: the MLP hidden activations dominate HBM traffic in both backbones —
at SwinV2 stage 1 the hidden tensor is [B*4096, 512] (268MB bf16) written
and re-read around the GELU, and the measured MLP block runs at ~32 TFLOPs
(memory-bound). This kernel streams row tiles of x through VMEM, keeps the
hidden activations on-chip, and fetches the weights once (constant block
index), cutting MLP traffic to x + out + weights.

Differentiation: a custom VJP recomputes the hidden in plain XLA for the
backward pass (same memory profile as the unfused baseline), so the kernel
is safe inside training steps.

Used by models.layers.Mlp when running on TPU with lane-aligned dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 polynomial erf (max err 1.5e-7; Mosaic has
    no native erf lowering). Inputs f32."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


_ACTIVATIONS = {"gelu": _gelu_exact, "quick_gelu": _quick_gelu}


def _make_kernel(activation: str):
    act = _ACTIVATIONS[activation]

    def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
        x = x_ref[:]
        h = jax.lax.dot_general(
            x, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        h = h + b1_ref[:].astype(jnp.float32)
        h = act(h).astype(x.dtype)
        out = jax.lax.dot_general(
            h, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        out = out + b2_ref[:].astype(jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    return _kernel


def _forward(x, w1, b1, w2, b2, *, row_tile: int, activation: str, interpret: bool):
    rows, c = x.shape
    hidden = w1.shape[1]
    padded = -(-rows // row_tile) * row_tile
    if padded != rows:
        x = jnp.concatenate([x, jnp.zeros((padded - rows, c), x.dtype)], axis=0)
    grid = (padded // row_tile,)
    return pl.pallas_call(
        _make_kernel(activation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0)),
            pl.BlockSpec((c, hidden), lambda i: (0, 0)),  # constant: fetched once
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((padded, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))[:rows]


def _pick_row_tile(rows: int, c: int, hidden: int, itemsize: int) -> int:
    """Largest row tile whose working set fits comfortably in VMEM.

    Weights are single-buffered constants; in/out tiles double-buffer; the
    hidden tile is an f32 stack temporary. v5e has 128MB of VMEM — the
    24MB budget leaves plenty of headroom under the raised compiler limit.
    """
    weights = 2 * c * hidden * itemsize + (hidden + c) * 4
    for tile in (1024, 512, 256, 128, 64):
        work = 4 * tile * c * itemsize + tile * hidden * 4 + weights
        if work < 24 * 2**20 and rows >= tile:
            return tile
    return 0


def _xla_mlp(x, w1, b1, w2, b2, activation="gelu"):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    if activation == "gelu":
        h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    else:
        h = _quick_gelu(h).astype(x.dtype)
    out = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    return out.astype(x.dtype)


def _make_ln_kernel(activation: str, eps: float):
    act = _ACTIVATIONS[activation]

    def _kernel(x_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref):
        x = x_ref[:]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        ln = (
            (xf - mean) * jax.lax.rsqrt(var + eps)
            * ln_s_ref[:].astype(jnp.float32)
            + ln_b_ref[:].astype(jnp.float32)
        ).astype(x.dtype)
        h = jax.lax.dot_general(
            ln, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:].astype(jnp.float32)
        h = act(h).astype(x.dtype)
        out = jax.lax.dot_general(
            h, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[:].astype(jnp.float32)
        out_ref[:] = (xf + out).astype(out_ref.dtype)

    return _kernel


def _ln_forward(x, ln_s, ln_b, w1, b1, w2, b2, *, row_tile, activation, eps,
                interpret):
    rows, c = x.shape
    hidden = w1.shape[1]
    padded = -(-rows // row_tile) * row_tile
    if padded != rows:
        x = jnp.concatenate([x, jnp.zeros((padded - rows, c), x.dtype)], axis=0)
    grid = (padded // row_tile,)
    return pl.pallas_call(
        _make_ln_kernel(activation, eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((padded, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(
        x, ln_s.reshape(1, -1), ln_b.reshape(1, -1),
        w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
    )[:rows]


def _xla_ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, activation="gelu", eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    ln = (
        (xf - mean) * jax.lax.rsqrt(var + eps)
        * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
    ).astype(x.dtype)
    h = jnp.dot(ln, w1, preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    if activation == "gelu":
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    else:
        h = _quick_gelu(h).astype(x.dtype)
    out = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    return (xf + out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ln_mlp_residual(x, ln_s, ln_b, w1, b1, w2, b2, activation="gelu", eps=1e-5):
    """x + act(LN(x)@W1+b1)@W2+b2 over [rows, C]: the whole MLP half of a
    pre-LN transformer block in one row-tiled kernel — LN statistics, the
    hidden activations and the residual add never touch HBM. Falls back to
    XLA off-TPU / unaligned dims. Backward = XLA recompute."""
    interpret = jax.default_backend() != "tpu"
    rows, c = x.shape
    hidden = w1.shape[1]
    tile = _pick_row_tile(rows, c, hidden, x.dtype.itemsize)
    if tile == 0 or c % 128 or hidden % 128:
        return _xla_ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, activation, eps)
    if not interpret:
        from vsc22_tpu.ops.kernel_gate import new_kernels_enabled

        if not new_kernels_enabled():
            # Round-2 proven path: XLA LayerNorm + fused_mlp kernel.
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = ((xf - mean) ** 2).mean(-1, keepdims=True)
            ln = (
                (xf - mean) * jax.lax.rsqrt(var + eps)
                * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
            ).astype(x.dtype)
            y = fused_mlp(ln, w1, b1.astype(x.dtype), w2, b2.astype(x.dtype),
                          activation)
            return (xf + y.astype(jnp.float32)).astype(x.dtype)
    return _ln_forward(x, ln_s, ln_b, w1, b1, w2, b2, row_tile=tile,
                       activation=activation, eps=eps, interpret=interpret)


def _ln_fwd(x, ln_s, ln_b, w1, b1, w2, b2, activation, eps):
    return ln_mlp_residual(x, ln_s, ln_b, w1, b1, w2, b2, activation, eps), (
        x, ln_s, ln_b, w1, b1, w2, b2,
    )


def _ln_bwd(activation, eps, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: _xla_ln_mlp(*a, activation, eps), *residuals
    )
    return vjp(g)


ln_mlp_residual.defvjp(_ln_fwd, _ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x, w1, b1, w2, b2, activation="gelu"):
    """act(x@W1+b1)@W2+b2 over [rows, C] with on-chip hidden activations.

    `activation`: "gelu" (exact, ViT/SwinV2) or "quick_gelu" (CLIP).
    Falls back to XLA when shapes don't tile (unaligned dims or tiny rows)
    or off-TPU. Backward = XLA recompute (memory parity with the baseline).
    """
    interpret = jax.default_backend() != "tpu"
    rows, c = x.shape
    hidden = w1.shape[1]
    tile = _pick_row_tile(rows, c, hidden, x.dtype.itemsize)
    if tile == 0 or c % 128 or hidden % 128:
        return _xla_mlp(x, w1, b1, w2, b2, activation)
    return _forward(x, w1, b1, w2, b2, row_tile=tile, activation=activation,
                    interpret=interpret)


def _fwd(x, w1, b1, w2, b2, activation):
    return fused_mlp(x, w1, b1, w2, b2, activation), (x, w1, b1, w2, b2)


def _bwd(activation, residuals, g):
    # Recompute in XLA; grads via jax.vjp of the plain formulation.
    _, vjp = jax.vjp(lambda *a: _xla_mlp(*a, activation), *residuals)
    return vjp(g)


fused_mlp.defvjp(_fwd, _bwd)
