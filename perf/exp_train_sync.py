"""Why does bench.py --train measure 2.3 f/s when diag_train.py sees 8.6?

Round-4 diagnosis harness: the two run IDENTICAL grad/apply programs at
depth 4; the only loop difference is that diag_train reads the loss back
every step (hard sync) while bench.py dispatches 5 grad+apply pairs
asynchronously and syncs once at the end. This times the same compiled
programs under three dispatch disciplines:

  sync      — float(loss) after every step (diag_train style)
  pipelined — no readback inside the loop, one sync at the end (bench style)
  depth2    — readback every 2nd step (bounded queue depth)

If pipelined is slower, the axon tunnel's async dispatch queue is the
regression, not the programs — and the measurement loop in bench.py should
bound its queue depth (real training reads the loss back every step for
logging anyway, so sync-per-step is the honest serving discipline).

Usage: python perf/exp_train_sync.py [layers]
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main(layers=4):
    import optax

    import bench
    from opendwm_tpu.parallel.flat_optim import flat_adamw

    model, params, inputs, cfg, geom = bench.build_denoiser_setup(
        train=True, layers=layers
    )
    t = geom[0]
    target = inputs["sample"]
    tx = flat_adamw(1e-4, weight_decay=0.01, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(params)

    def loss_fn(p, kw, tgt):
        pred = model.apply(p, **kw)
        return jnp.mean(
            (pred.astype(jnp.float32) - tgt.astype(jnp.float32)) ** 2)

    gradf = jax.jit(jax.value_and_grad(loss_fn))

    @partial(jax.jit, donate_argnums=(2,))
    def apply(p, o, grads):
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    # warm both programs
    loss, grads = gradf(params, inputs, target)
    params, opt_state = apply(params, opt_state, grads)
    float(loss)
    jax.block_until_ready(params)

    n = 5
    results = {}
    for mode in ("sync", "pipelined", "depth2", "sync2"):
        t0 = time.perf_counter()
        for i in range(n):
            loss, grads = gradf(params, inputs, target)
            params, opt_state = apply(params, opt_state, grads)
            if mode.startswith("sync") or (mode == "depth2" and i % 2 == 1):
                float(loss)
        float(loss)
        jax.block_until_ready(params)
        dt = (time.perf_counter() - t0) / n
        results[mode] = dt
        print(f"{mode:>9}: {dt*1e3:7.0f} ms/step  {t/dt:6.2f} f/s",
              flush=True)
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
