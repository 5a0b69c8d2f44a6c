"""Flagship denoiser forward ablations on the real chip.

Times the full-size DiT forward under component toggles to attribute the
missing MFU (VERDICT r1: 0.53 fwd / 0.36 train). Run under the axon TPU
tunnel:  python perf/ablate.py [names...]

Each variant reuses the bench.py model/factory so numbers are comparable
with BENCH_r*.json.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from opendwm_tpu.models.mmdit import DiTCrossviewTemporal  # noqa: E402

FULL = dict(
    patch_size=2, num_layers=24, attention_head_dim=64,
    num_attention_heads=24, in_channels=16, out_channels=16,
    joint_attention_dim=1536, caption_projection_dim=1536,
    pooled_projection_dim=2048, pos_embed_max_size=384, sample_size=128,
    qk_norm="rms_norm", dual_attention_layers=tuple(range(13)),
    enable_crossview=True, crossview_attention_type="rowwise",
    crossview_block_layers=(1, 5, 9, 13, 17, 21),
    enable_temporal=True, temporal_attention_type="pointwise",
    temporal_block_layers=(2, 3, 6, 7, 10, 11, 14, 15, 18, 19, 22, 23),
    qk_norm_on_additional_modules="rms_norm",
    perspective_modeling_type="implicit",
    projection_class_embeddings_input_dim=2816,
    dtype=jnp.bfloat16,
)

VARIANTS = {
    "baseline": {},
    "xla_attn": {"attention_backend": "xla"},
    "no_dual": {"dual_attention_layers": ()},
    "no_crossview": {"enable_crossview": False,
                     "crossview_block_layers": ()},
    "no_temporal": {"enable_temporal": False, "temporal_block_layers": ()},
    "joint_only": {"enable_crossview": False, "crossview_block_layers": (),
                   "enable_temporal": False, "temporal_block_layers": (),
                   "dual_attention_layers": ()},
}


def make_inputs(t=6, v=6, h=32, w=56, ctx_len=154, d_model=1536):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    return dict(
        sample=jax.random.normal(ks[0], (1, t, v, h, w, 16), jnp.bfloat16),
        timestep=jnp.full((1, t, v), 500.0),
        encoder_hidden_states=jax.random.normal(
            ks[1], (1, t, v, ctx_len, d_model), jnp.bfloat16
        ),
        pooled_projections=jax.random.normal(
            ks[2], (1, t, v, 2048), jnp.bfloat16
        ),
        added_time_ids=jax.random.normal(ks[3], (1, t, v, 11)),
    )


def fill_params(model, inputs):
    dev = jax.devices()[0]
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(1), **inputs)
    rng = np.random.default_rng(0)
    base = (rng.standard_normal(1 << 20, dtype=np.float32) * 0.02).astype(
        jnp.bfloat16
    )

    def fill(s):
        n = int(np.prod(s.shape))
        reps = -(-n // base.size)
        return jax.device_put(
            np.tile(base, reps)[:n].reshape(s.shape), dev
        )

    return jax.tree.map(fill, shapes, is_leaf=lambda x: hasattr(x, "shape"))


def time_variant(name, over, iters=10):
    cfg = dict(FULL, **over)
    model = DiTCrossviewTemporal(**cfg)
    inputs = make_inputs()
    params = fill_params(model, inputs)
    fwd = jax.jit(lambda p, kw: model.apply(p, **kw))
    try:
        cost = fwd.lower(params, inputs).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    float(fwd(params, inputs).astype(jnp.float32).mean())  # warm + sync
    start = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, inputs)
    float(out.astype(jnp.float32).mean())
    dt = (time.perf_counter() - start) / iters
    mfu = (flops / dt) / 197e12 if flops else 0.0
    print(
        f"{name:16s} {dt*1e3:8.1f} ms  {6/dt:6.2f} f/s  "
        f"flops {flops/1e12:6.2f} T  MFU {mfu:.3f}",
        flush=True,
    )
    return dt


def bench_adaln(iters=30):
    """Fused AdaLN kernel vs XLA at the flagship shape."""
    from opendwm_tpu.ops.fused_adaln import _reference, adaln_modulate

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (36, 448, 1536), jnp.bfloat16)
    sc = jax.random.normal(jax.random.fold_in(key, 1), (36, 1536),
                           jnp.bfloat16)
    sh = jax.random.normal(jax.random.fold_in(key, 2), (36, 1536),
                           jnp.bfloat16)
    fused = jax.jit(lambda x, a, b: adaln_modulate(x, a, b))
    ref = jax.jit(lambda x, a, b: _reference(
        x, a[:, None, :], b[:, None, :], 1e-6))
    err = float(jnp.max(jnp.abs(
        fused(x, sc, sh).astype(jnp.float32)
        - ref(x, sc, sh).astype(jnp.float32))))
    for name, fn in (("xla_adaln", ref), ("pallas_adaln", fused)):
        float(fn(x, sc, sh).astype(jnp.float32).mean())
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(x, sc, sh)
        float(out.astype(jnp.float32).mean())
        dt = (time.perf_counter() - start) / iters
        print(f"{name:16s} {dt*1e3:8.3f} ms  (err {err:.2e})", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        if n == "adaln":
            bench_adaln()
        else:
            time_variant(n, VARIANTS[n])
