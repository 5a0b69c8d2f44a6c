"""Diagnose the depth-4 train-step regression: bf16 vs f32 param residency.

Round 2 measured 10.71 f/s at depth 4 with the filler following flax's
f32 param_dtype; cb22f5b switched the filler to bf16 serving dtype and the
train number collapsed to 2.0 f/s (MFU 0.08). This times the grad and
optimizer programs separately under both dtypes.

Usage: python perf/exp_train_dtype.py [bf16|f32] [layers]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(dtype_name: str = "bf16", layers: int = 4):
    import bench
    import optax

    from opendwm_tpu.parallel.flat_optim import flat_adamw

    model, params, inputs, cfg, geom = bench.build_denoiser_setup(
        train=True, layers=layers
    )
    # train setup now fills f32 masters by default (round-4 fix); cast to
    # the requested residency so both arms stay measurable.
    cast = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    params = jax.tree.map(
        lambda p: p.astype(cast)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )
    t = geom[0]
    target = inputs["sample"]

    tx = flat_adamw(1e-4, weight_decay=0.01, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(params)

    def loss_fn(p, kw):
        pred = model.apply(p, **kw)
        return jnp.mean(
            (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        )

    gradf = jax.jit(jax.value_and_grad(loss_fn))

    @jax.jit
    def apply(p, o, grads):
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    t0 = time.perf_counter()
    loss, grads = gradf(params, inputs)
    float(loss)
    print(f"grad warm (trace+compile+run): {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    p2, o2 = apply(params, opt_state, grads)
    jax.block_until_ready(p2)
    print(f"apply warm: {time.perf_counter()-t0:.1f}s", flush=True)

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        loss, grads = gradf(params, inputs)
    float(loss)
    dt_g = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        p2, o2 = apply(params, opt_state, grads)
    jax.block_until_ready(p2)
    dt_a = (time.perf_counter() - t0) / n
    print(
        f"dtype={dtype_name} layers={layers}: grad {dt_g*1e3:.0f} ms, "
        f"apply {dt_a*1e3:.0f} ms, step {(dt_g+dt_a)*1e3:.0f} ms, "
        f"{t/(dt_g+dt_a):.2f} f/s",
        flush=True,
    )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "bf16",
        int(sys.argv[2]) if len(sys.argv) > 2 else 4,
    )
