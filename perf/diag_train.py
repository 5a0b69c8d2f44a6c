"""Stage-by-stage timing of the train bench (diagnose VERDICT r4 item 1).

Prints wall time for: setup/fill, grad-program compile, apply-program
compile, first execution, 3 steady-state steps. Run with
BENCH_TRAIN_LAYERS / TRAIN_DTYPE=f32 to vary depth and param residency.

Usage: python perf/diag_train.py [layers]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def tic(label, t0):
    t1 = time.perf_counter()
    print(f"[{t1 - t0:8.1f}s] {label}", flush=True)
    return t1


def main(layers=4):
    import optax

    import bench
    from opendwm_tpu.parallel.flat_optim import flat_adamw

    t0 = time.perf_counter()
    model, params, inputs, cfg, geom = bench.build_denoiser_setup(
        train=True, layers=layers
    )
    if os.environ.get("TRAIN_DTYPE") == "f32":
        params = jax.tree.map(
            lambda p: p.astype(jnp.float32)
            if p.dtype == jnp.bfloat16 else p, params)
    elif os.environ.get("TRAIN_DTYPE") == "bf16":
        # control: reproduce the round-3 bf16-master regression
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    t0 = tic(f"setup done ({n_params/1e6:.0f}M params, {layers} layers)", t0)

    tx = flat_adamw(1e-4, weight_decay=0.01, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(params)
    jax.block_until_ready(opt_state)
    t0 = tic("opt state init", t0)
    target = inputs["sample"]

    def loss_fn(p, kw):
        pred = model.apply(p, **kw)
        return jnp.mean(
            (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    gradf = jax.jit(jax.value_and_grad(loss_fn))
    lowered = gradf.lower(params, inputs)
    t0 = tic("grad lowered", t0)
    compiled = lowered.compile()
    t0 = tic("grad compiled", t0)
    try:
        mem = compiled.memory_analysis()
        print(f"  grad program: argument {mem.argument_size_in_bytes/2**30:.2f} "
              f"GiB, output {mem.output_size_in_bytes/2**30:.2f} GiB, "
              f"temp {mem.temp_size_in_bytes/2**30:.2f} GiB", flush=True)
    except Exception as exc:
        print(f"  (memory_analysis unavailable: {exc})")

    import functools

    # donate the grads: they are dead after the update, and freeing the
    # 2.3 GiB mid-program is the difference between fitting and OOM at
    # f32-master depths (params/opt stay undonated — donation of persistent
    # state measured slower on the axon tunnel, bench.py note).
    @functools.partial(jax.jit, donate_argnums=(2,))
    def apply(p, o, grads):
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    loss, grads = gradf(params, inputs)
    float(loss)
    t0 = tic(f"grad first exec (loss {float(loss):.4f})", t0)
    params, opt_state = apply(params, opt_state, grads)
    jax.block_until_ready(params)
    t0 = tic("apply first exec", t0)

    for i in range(3):
        loss, grads = gradf(params, inputs)
        params, opt_state = apply(params, opt_state, grads)
        float(loss)
        t0 = tic(f"step {i}", t0)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
