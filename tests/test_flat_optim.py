"""Fused flat AdamW vs optax.adamw equivalence (parallel/flat_optim.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from opendwm_tpu.parallel.flat_optim import flat_adamw


class TestFlatAdamW:
    def test_matches_optax_adamw(self):
        rng = np.random.default_rng(0)
        params = {
            "a": jnp.asarray(rng.standard_normal((17, 3)), jnp.float32),
            "b": {"c": jnp.asarray(rng.standard_normal(5), jnp.float32)},
        }
        grads = jax.tree.map(lambda x: 0.1 * x + 0.03, params)
        ref = optax.adamw(3e-4, weight_decay=0.01)
        fla = flat_adamw(3e-4, weight_decay=0.01)
        sr, sf = ref.init(params), fla.init(params)
        pr = pf = params
        for _ in range(4):
            ur, sr = ref.update(grads, sr, pr)
            uf, sf = fla.update(grads, sf, pf)
            pr = optax.apply_updates(pr, ur)
            pf = optax.apply_updates(pf, uf)
        for a, b in zip(jax.tree.leaves(pr), jax.tree.leaves(pf)):
            np.testing.assert_allclose(a, b, atol=1e-7)

    def test_schedule_and_jit(self):
        sched = optax.cosine_decay_schedule(1e-3, 10)
        tx = flat_adamw(sched, mu_dtype=jnp.bfloat16)
        p = {"w": jnp.ones((8, 8))}
        st = tx.init(p)
        assert st.mu.dtype == jnp.bfloat16
        assert st.mu.shape == (64,)

        @jax.jit
        def step(p, st):
            u, st = tx.update(jax.tree.map(jnp.ones_like, p), st, p)
            return optax.apply_updates(p, u), st

        p2, st = step(p, st)
        p3, st = step(p2, st)
        assert float(jnp.abs(p3["w"] - p2["w"]).max()) > 0
        assert int(st.count) == 2

    def test_multisteps_composition(self):
        tx = optax.MultiSteps(flat_adamw(1e-3), every_k_schedule=2)
        p = {"w": jnp.ones((4,))}
        st = tx.init(p)
        g = {"w": jnp.ones((4,))}
        u1, st = tx.update(g, st, p)
        assert float(jnp.abs(u1["w"]).max()) == 0.0  # accumulating
        u2, st = tx.update(g, st, p)
        assert float(jnp.abs(u2["w"]).max()) > 0.0

    def test_flat_flag_in_builder(self):
        from opendwm_tpu.pipelines import optim

        tx = optim.build_optimizer({"lr": 1e-4, "flat": True}, {})
        p = {"w": jnp.ones((4, 4))}
        st = tx.init(p)
        u, st = tx.update({"w": jnp.ones((4, 4))}, st, p)
        assert u["w"].shape == (4, 4)

    def test_schedule_matches_optax_warmup_alignment(self):
        # optax evaluates the schedule at the PRE-increment count (first
        # update uses schedule(0)); the flat drop-in must match.
        sched = optax.linear_schedule(0.0, 1e-2, transition_steps=4)
        ref = optax.adamw(sched, weight_decay=0.0)
        fla = flat_adamw(sched, weight_decay=0.0)
        p = {"w": jnp.ones((8,))}
        g = {"w": jnp.full((8,), 0.5)}
        st_r, st_f = ref.init(p), fla.init(p)
        pr, pf = p, p
        for _ in range(3):
            ur, st_r = ref.update(g, st_r, pr)
            uf, st_f = fla.update(g, st_f, pf)
            np.testing.assert_allclose(
                np.asarray(ur["w"]), np.asarray(uf["w"]), atol=1e-7
            )
            pr = optax.apply_updates(pr, ur)
            pf = optax.apply_updates(pf, uf)
