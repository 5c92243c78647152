"""Model export / serialization (the torch.jit.trace -> .pt replacement).

Parity target (reference, for cross-checking — original implementation):
  D1/train/train_v106/torch2scripts.py:672-699 — strip the DDP prefix from
  the training checkpoint, trace with a dummy input, save a standalone
  inference artifact per model.

Here a model export is two artifacts:
  - `<name>.params.npz`: flat parameter snapshot (EMA weights when present);
  - `<name>.jaxexport`: a serialized `jax.export` AOT artifact of the jitted
    forward at a fixed input shape — loadable without the model code and
    runnable on any compatible device (the torchscript role).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from vsc22_tpu.train.checkpoint import load_params_snapshot, save_ema_snapshot


def export_model(
    out_prefix: str,
    model,
    params,
    input_shape: Tuple[int, ...],
    input_dtype=jnp.bfloat16,
) -> Tuple[str, str]:
    """Write params npz + AOT-serialized forward; returns both paths."""
    params_path = f"{out_prefix}.params.npz"

    class _Wrap:  # save_ema_snapshot expects .params / .ema_params
        ema_params = None

    wrap = _Wrap()
    wrap.params = params
    save_ema_snapshot(params_path, wrap)

    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    exported = jax.export.export(fwd)(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        jax.ShapeDtypeStruct(input_shape, input_dtype),
    )
    blob = exported.serialize()
    export_path = f"{out_prefix}.jaxexport"
    with open(export_path, "wb") as f:
        f.write(blob)
    return params_path, export_path


def load_exported(export_path: str) -> Callable:
    """Load a serialized forward; call as fn(params, images)."""
    with open(export_path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return exported.call


def load_exported_with_params(export_path: str, params_path: str, params_template):
    """Convenience: returns fn(images) with the snapshot params bound."""
    params = load_params_snapshot(params_path, params_template)
    call = load_exported(export_path)
    return lambda images: call(params, images)
