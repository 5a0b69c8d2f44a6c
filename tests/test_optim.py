"""LR schedules + optimizer builder (reference lr_scheduler configs:
configs/lidar/*.json, pipelines/ctsd.py:1092-1100)."""

import jax.numpy as jnp
import numpy as np
import pytest

from opendwm_tpu.pipelines import optim


class TestSchedules:
    def test_cosine_annealing_reference_shape(self):
        s = optim.build_schedule(
            {
                "_class_name": "torch.optim.lr_scheduler.CosineAnnealingLR",
                "T_max": 100, "eta_min": 1e-5,
            },
            1e-4,
        )
        assert np.isclose(float(s(0)), 1e-4)
        assert np.isclose(float(s(100)), 1e-5)
        assert 1e-5 < float(s(50)) < 1e-4

    def test_exponential_gamma1_is_constant(self):
        s = optim.build_schedule(
            {"_class_name": "torch.optim.lr_scheduler.ExponentialLR",
             "gamma": 1},
            2e-4,
        )
        assert s == 2e-4

    def test_linear_warmup(self):
        s = optim.build_schedule(
            {"_class_name": "torch.optim.lr_scheduler.LinearLR",
             "start_factor": 0.1, "total_iters": 10},
            1e-3,
        )
        assert np.isclose(float(s(0)), 1e-4, rtol=1e-3)
        assert np.isclose(float(s(10)), 1e-3)

    def test_warmup_cosine(self):
        s = optim.build_schedule(
            {"type": "warmup_cosine", "warmup_steps": 5, "decay_steps": 50},
            3e-4,
        )
        assert float(s(0)) == 0.0
        assert np.isclose(float(s(5)), 3e-4)
        assert float(s(50)) <= float(s(25))

    def test_none_passthrough_and_unknown(self):
        assert optim.build_schedule(None, 1e-4) == 1e-4
        with pytest.raises(ValueError):
            optim.build_schedule({"type": "nope"}, 1e-4)


class TestBuildOptimizer:
    def test_full_stack_steps(self):
        tx = optim.build_optimizer(
            {"lr": 1e-3,
             "lr_scheduler": {
                 "_class_name":
                     "torch.optim.lr_scheduler.CosineAnnealingLR",
                 "T_max": 10, "eta_min": 1e-4,
             }},
            {"max_norm_for_grad_clip": 1.0,
             "gradient_accumulation_steps": 2},
        )
        p = {"w": jnp.ones((4, 4))}
        st = tx.init(p)
        g = {"w": jnp.full((4, 4), 2.0)}
        u1, st = tx.update(g, st, p)
        # first of two accumulation micro-steps: no update applied yet
        assert float(jnp.abs(u1["w"]).max()) == 0.0
        u2, st = tx.update(g, st, p)
        assert float(jnp.abs(u2["w"]).max()) > 0.0

    def test_pipeline_ctor_accepts_scheduler(self):
        from opendwm_tpu.pipelines.lidar_vae import LidarVAE

        # construction-only: checks the kwarg plumbing end to end (the
        # ctor just stores the model, so a stub suffices)
        pipe = LidarVAE(
            object(),
            optimizer_config={"lr": 1e-4},
            lr_scheduler_config={
                "_class_name":
                    "torch.optim.lr_scheduler.CosineAnnealingLR",
                "T_max": 10,
            },
        )
        assert pipe.tx is not None


class TestFreezingPattern:
    def test_frozen_leaves_get_zero_updates(self):
        import jax.numpy as jnp
        import numpy as np

        from opendwm_tpu.pipelines.optim import build_optimizer

        tx = build_optimizer(
            {"lr": 1e-2},
            {"freezing_pattern": r"^backbone\."},
        )
        params = {
            "backbone": {"w": jnp.ones((4,))},
            "head": {"w": jnp.ones((4,))},
        }
        grads = {
            "backbone": {"w": jnp.full((4,), 0.5)},
            "head": {"w": jnp.full((4,), 0.5)},
        }
        st = tx.init(params)
        u, _ = tx.update(grads, st, params)
        np.testing.assert_array_equal(np.asarray(u["backbone"]["w"]), 0.0)
        assert np.abs(np.asarray(u["head"]["w"])).max() > 0
