"""Kernel activation gate: env overrides, marker, and gated dispatch."""

import os

import numpy as np
import jax.numpy as jnp

from vsc22_tpu.ops import kernel_gate


def test_env_overrides(monkeypatch, tmp_path):
    monkeypatch.setattr(kernel_gate, "_MARKER", str(tmp_path / "m"))
    monkeypatch.delenv("VSC22_NEW_KERNELS", raising=False)
    monkeypatch.delenv("VSC22_DISABLE_NEW_KERNELS", raising=False)
    assert not kernel_gate.new_kernels_enabled()  # no marker
    (tmp_path / "m").write_text("validated\n")
    assert kernel_gate.new_kernels_enabled()  # marker opens the gate
    monkeypatch.setenv("VSC22_DISABLE_NEW_KERNELS", "1")
    assert not kernel_gate.new_kernels_enabled()  # force-off beats marker
    monkeypatch.setenv("VSC22_NEW_KERNELS", "1")
    assert kernel_gate.new_kernels_enabled()  # force-on beats force-off


def test_validate_noop_off_tpu(monkeypatch, tmp_path):
    monkeypatch.setattr(kernel_gate, "_MARKER", str(tmp_path / "m"))
    monkeypatch.delenv("VSC22_NEW_KERNELS", raising=False)
    monkeypatch.delenv("VSC22_DISABLE_NEW_KERNELS", raising=False)
    # CPU backend: no canary possible; gate stays closed, no crash.
    assert kernel_gate.validate_and_enable(verbose=False) is False
    assert not os.path.exists(str(tmp_path / "m"))


def test_legacy_formulation_matches_xla():
    """The gated fallback's math (q pre-scaled in compute dtype, attention,
    then proj + f32 residual — _attn_proj_legacy with the packed kernel
    swapped for its own XLA twin, which the kernel is parity-tested
    against) must equal the public op's XLA reference."""
    from vsc22_tpu.ops.pallas_attn import _attention_xla
    from vsc22_tpu.ops.pallas_attn_proj import _attn_proj_xla

    rng = np.random.default_rng(0)
    b, l, c, h = 2, 60, 128, 2
    hd = c // h
    x = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32)) * 0.3
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * c)).astype(np.float32)) * 0.3
    pw = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32)) * 0.09
    pb = jnp.asarray(rng.standard_normal(c).astype(np.float32)) * 0.1

    r = qkv.reshape(b, l, 3, h, hd)
    q, k, v = (r[:, :, i] for i in range(3))
    out = _attention_xla(q * (hd ** -0.5), k, v).reshape(b, l, c)
    proj = jnp.dot(out, pw, preferred_element_type=jnp.float32) + pb
    legacy = np.asarray((x.astype(jnp.float32) + proj).astype(x.dtype))

    ref = np.asarray(_attn_proj_xla(x, qkv, pw, pb, h))
    np.testing.assert_allclose(legacy, ref, atol=2e-5, rtol=1e-4)
