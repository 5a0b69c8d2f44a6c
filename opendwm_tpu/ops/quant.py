"""int8 quantized matmul path for TPU serving.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOP/s); the denoiser
forward is ~38% matmul time at bf16, so int8 serving buys a significant
end-to-end speedup AND halves weight HBM traffic (the reference has no
quantized-serving story — this is a beat-the-reference axis; the closest
torch equivalent would be dynamic int8 via torchao/TensorRT).

Scheme (standard dynamic per-token / per-channel W8A8):
- weights: symmetric int8 per OUTPUT channel, scale = amax(col)/127,
  converted OFFLINE from the bf16 checkpoint (`quantize_params`).
- activations: symmetric int8 per token (row), scale computed on the fly.
- accumulation in int32 on the MXU (`preferred_element_type`), dequantized
  by the rank-1 outer product of scales.

Accuracy: W8A8 with per-channel weight scales is the standard serving
recipe for diffusion transformers; `tests/test_quant.py` pins cosine
similarity of quantized vs bf16 layer outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., N) float -> int8 + per-OUTPUT-channel f32 scale (N,).

    Works for Dense kernels (K, N) and conv kernels (kh, kw, in, N) alike:
    the scale is per trailing (output) channel."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_activation(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., K) float -> int8 + per-row f32 scale (..., 1)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def int8_matmul(
    x: jax.Array, wq: jax.Array, w_scale: jax.Array,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """``x @ dequant(wq)`` with int8 MXU accumulation.

    x: (..., K) float; wq: (K, N) int8; w_scale: (N,) f32.
    """
    xq, x_scale = quantize_activation(x)
    y = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


def int8_conv(
    x: jax.Array, wq: jax.Array, w_scale: jax.Array,
    strides=(1, 1), padding="SAME",
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """NHWC conv with int8 MXU accumulation.

    x: (N, H, W, Cin) float; wq: (kh, kw, Cin, Cout) int8; w_scale:
    (Cout,) f32. The activation scale is per TENSOR (a conv output mixes
    pixels, so per-pixel scales don't factor out) — fine for the VAE/UNet
    conv stacks whose GroupNorm+silu keep ranges moderate."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32))
    s = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * s * w_scale).astype(out_dtype)


def quantize_param_tree(float_params, quant_shapes):
    """Convert a trained float param tree to the QDense structure.

    ``quant_shapes`` comes from ``jax.eval_shape(qmodel.init, ...)`` of the
    SAME architecture built with ``quantization="int8"``. Wherever the
    quantized tree expects ``kernel_q``/``kernel_scale``, the float tree's
    ``kernel`` at the same path is quantized per output channel; all other
    leaves (biases, norms, embeddings, non-quantized Dense) pass through.
    """

    def walk(src, dst):
        if not isinstance(dst, dict):
            return src
        out = {}
        for key, sub in dst.items():
            if key == "kernel_q":
                wq, ws = quantize_weight(src["kernel"])
                out["kernel_q"] = wq
                out["kernel_scale"] = ws
            elif key == "kernel_scale":
                continue  # written together with kernel_q
            else:
                out[key] = walk(src[key], sub)
        return out

    import flax

    src = flax.core.unfreeze(float_params)
    dst = flax.core.unfreeze(quant_shapes)
    return walk(src, dst)
