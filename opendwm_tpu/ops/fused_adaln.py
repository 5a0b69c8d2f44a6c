"""Fused AdaLN-modulate: LayerNorm (no affine) + per-sample scale/shift.

The MMDiT applies ``ln(x) * (1 + scale) + shift`` four times per joint
block (latent + context, attention + MLP) on (n, L, d) activations
(reference crossview_temporal_dit.py uses diffusers AdaLayerNormZero).
XLA emits LN as two passes over the tensor plus a third for the affine;
this Pallas kernel computes the whole chain in ONE VMEM round trip per
row tile — saving ~2/3 of the HBM traffic of the modulation path.

Forward-only by design: the backward falls back to the XLA composition
via custom_vjp (training keeps exact, fused-by-XLA gradients; the kernel
targets the inference hot loop, reference ctsd.py:1496-1575).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, scale_ref, shift_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)          # (bl, d)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    scale = scale_ref[0].astype(jnp.float32)   # (1, d)
    shift = shift_ref[0].astype(jnp.float32)
    o_ref[0] = (y * (1.0 + scale) + shift).astype(o_ref.dtype)


def _reference(x, scale, shift, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    out = y * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
    return out.astype(x.dtype)


def _forward(x, scale, shift, eps, block_l):
    n, l, d = x.shape
    if scale.ndim == 2:
        scale = scale[:, None, :]
    if shift.ndim == 2:
        shift = shift[:, None, :]
    lp = -(-l // block_l) * block_l
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    grid = (n, lp // block_l)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_l, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, lp, d), x.dtype),
    )(x, scale, shift)
    return out[:, :l]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def adaln_modulate(x, scale, shift, eps: float = 1e-6, block_l: int = 128):
    """``ln(x) * (1 + scale) + shift`` fused.

    x: (n, L, d); scale/shift: (n, d) or (n, 1, d) per-sample modulation.
    """
    return _forward(x, scale, shift, eps, block_l)


def _fwd(x, scale, shift, eps, block_l):
    return _forward(x, scale, shift, eps, block_l), (x, scale, shift)


def _bwd(eps, block_l, res, g):
    x, scale, shift = res
    _, vjp = jax.vjp(
        lambda x, sc, sh: _reference(x, sc, sh, eps), x, scale, shift
    )
    return vjp(g)


adaln_modulate.defvjp(_fwd, _bwd)


def supported(x) -> bool:
    platform = jax.devices()[0].platform if jax.devices() else "cpu"
    return platform == "tpu" and x.ndim == 3 and x.shape[-1] % 128 == 0


# ---------------------------------------------------------------------------
# Fused residual + AdaLN-modulate: the MMDiT joint block's between-sublayer
# chain  x' = x + gate*delta ;  y = ln(x')*(1+scale) + shift  in ONE VMEM
# round trip producing both outputs. XLA emits this pair as a tuple fusion
# measured ~16x above memory-bound in the full model (broadcast_add_fusion
# 3.9 ms vs a 0.25 ms floor at (36,448,1536) on v5e).
# ---------------------------------------------------------------------------


def _res_kernel(x_ref, d_ref, g_ref, sc_ref, sh_ref, xo_ref, yo_ref, *,
                eps: float):
    x = x_ref[0].astype(jnp.float32)            # (bl, d)
    delta = d_ref[0].astype(jnp.float32)
    gate = g_ref[0].astype(jnp.float32)          # (1, d)
    xn = x + gate * delta
    mean = jnp.mean(xn, axis=-1, keepdims=True)
    xc = xn - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    sc = sc_ref[0].astype(jnp.float32)
    sh = sh_ref[0].astype(jnp.float32)
    xo_ref[0] = xn.astype(xo_ref.dtype)
    yo_ref[0] = (y * (1.0 + sc) + sh).astype(yo_ref.dtype)


def _res_reference(x, delta, gate, scale, shift, eps):
    xn32 = x.astype(jnp.float32) + gate.astype(jnp.float32) * delta.astype(
        jnp.float32
    )
    xn = xn32.astype(x.dtype)
    # Second output must be x.dtype (matching the Pallas forward) so that
    # custom_vjp cotangent dtypes agree under bf16 inputs.
    return xn, _reference(xn, scale, shift, eps)


def _res_forward(x, delta, gate, scale, shift, eps, block_l):
    n, l, d = x.shape

    def cond(t):
        return t[:, None, :] if t.ndim == 2 else t

    gate, scale, shift = cond(gate), cond(scale), cond(shift)
    lp = -(-l // block_l) * block_l
    if lp != l:
        pad = ((0, 0), (0, lp - l), (0, 0))
        x, delta = jnp.pad(x, pad), jnp.pad(delta, pad)
    grid = (n, lp // block_l)
    row = pl.BlockSpec((1, block_l, d), lambda i, j: (i, j, 0))
    vec = pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0))
    xn, y = pl.pallas_call(
        functools.partial(_res_kernel, eps=eps),
        grid=grid,
        in_specs=[row, row, vec, vec, vec],
        out_specs=[row, row],
        out_shape=[
            jax.ShapeDtypeStruct((n, lp, d), x.dtype),
            jax.ShapeDtypeStruct((n, lp, d), x.dtype),
        ],
    )(x, delta, gate, scale, shift)
    return xn[:, :l], y[:, :l]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def residual_adaln_modulate(
    x, delta, gate, scale, shift, eps: float = 1e-6, block_l: int = 112
):
    """``x' = x + gate*delta ; ln(x')*(1+scale)+shift`` fused; returns
    ``(x', modulated)``. x/delta: (n, L, d); gate/scale/shift: (n, d) or
    (n, 1, d)."""
    return _res_forward(x, delta, gate, scale, shift, eps, block_l)


def _res_fwd(x, delta, gate, scale, shift, eps, block_l):
    out = _res_forward(x, delta, gate, scale, shift, eps, block_l)
    return out, (x, delta, gate, scale, shift)


def _res_bwd(eps, block_l, res, g):
    x, delta, gate, scale, shift = res
    _, vjp = jax.vjp(
        lambda *a: _res_reference(*a, eps), x, delta, gate, scale, shift
    )
    return vjp(g)


residual_adaln_modulate.defvjp(_res_fwd, _res_bwd)
