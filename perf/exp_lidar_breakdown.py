"""Where do the ~800 ms of a LiDAR MaskGIT generation go?

bench.py --lidar measured 1.246 frames/s at MFU 0.02 (r5) — the 20-step
gen is nowhere near FLOP-bound, so the win is in whatever dominates the
latency. This times the pieces of the jitted gen program separately:

  voxelize+tokenize   points → voxels → VQ codes (Swin encoder)
  maskgit_1step       ONE transformer forward + confidence re-mask
  maskgit_20step      the full lax.scan decode loop
  vq_decode           codes → voxel logits (Swin decoder) → gumbel vox

Each piece is its own jit; numbers are steady-state over 5 iters.
Writes perf/BENCH_LIDAR_BREAKDOWN.json.

Usage: python perf/exp_lidar_breakdown.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _time(fn, *args, iters=5, probe=None):
    out = fn(*args)
    (probe or (lambda o: jax.block_until_ready(o)))(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    (probe or (lambda o: jax.block_until_ready(o)))(out)
    return (time.perf_counter() - t0) / iters


def main():
    import bench
    from opendwm_tpu.config import create_instance_from_config
    from opendwm_tpu.pipelines.lidar_maskgit import get_maskgit_conditions

    dev = jax.devices()[0]
    full = dev.platform == "tpu"
    here = ROOT
    with open(os.path.join(
            here, "configs", "lidar", "lidar_maskgit_layout_ns.json")) as f:
        cfg = json.load(f)["pipeline"]
    bf16 = {"_class_name": "get_class", "class_name": "jnp.bfloat16"}
    if full:
        cfg["vq_point_cloud"]["lidar_encoder"]["dtype"] = dict(bf16)
        cfg["vq_point_cloud"]["lidar_decoder"]["dtype"] = dict(bf16)
        cfg["bi_directional_transformer"]["dtype"] = dict(bf16)
    else:
        vq = cfg["vq_point_cloud"]
        for part in ("lidar_encoder", "lidar_decoder"):
            vq[part].update(img_size=64, in_chans=4, embed_dim=32,
                            num_heads=2, depth=2, codebook_dim=16)
        vq["vector_quantizer"].update(n_e=64, e_dim=16)
        vq["voxelizer"].update(step=1.5625, z_step=1.4)
        cfg["bi_directional_transformer"].update(
            n_e=64, e_dim=16, img_size=[8, 8], hidden_dim=32, depth=2,
            num_heads=2)
        cfg["bi_directional_transformer"]["condition_adapter_config"].update(
            channels=[32, 32], num_res_blocks=1)
    cfg["sharding_policy"] = "ddp"
    pipe = create_instance_from_config(cfg)
    pipe.blank_code = (0,)
    pipe.inference_config["sample_steps"] = 20

    b, t, n_pts = 1, 1, 32768
    hw = 640 if full else 64
    rng = jax.random.PRNGKey(0)
    batch = {
        "lidar_points": jax.random.uniform(
            rng, (b, t, n_pts, 3), minval=-50.0, maxval=50.0),
        "lidar_points_mask": jnp.ones((b, t, n_pts), bool),
        "3dbox_bev_images": jnp.zeros((b * t, hw, hw, 3), jnp.float32),
        "hdmap_bev_images": jnp.zeros((b * t, hw, hw, 3), jnp.float32),
    }

    fill = bench._param_filler(dev)

    def filled(shapes):
        return jax.tree.map(fill, shapes,
                            is_leaf=lambda x: hasattr(x, "shape"))

    vq_shapes = jax.eval_shape(
        lambda r, p, m: pipe.vq.init(r, p, m, render_rays=False),
        jax.random.PRNGKey(1), batch["lidar_points"],
        batch["lidar_points_mask"])
    pipe.load_vq_params(filled(vq_shapes))
    voxels, code, code_indices = jax.eval_shape(
        pipe.tokenize, batch["lidar_points"], batch["lidar_points_mask"])
    ctx0 = get_maskgit_conditions(batch)
    model_shapes = jax.eval_shape(
        pipe.model.init, jax.random.PRNGKey(2),
        jnp.zeros(code.shape, jnp.float32),
        jnp.zeros(code_indices.shape, jnp.int32),
        context=ctx0, batch_size=b * t, num_frames=t)
    params = filled(model_shapes)
    vq_params = pipe.vq_params

    report = {}

    tok = jax.jit(lambda pts, m: pipe.tokenize(pts, m))
    report["tokenize_s"] = round(_time(
        tok, batch["lidar_points"], batch["lidar_points_mask"]), 4)
    voxels, code, code_indices = tok(
        batch["lidar_points"], batch["lidar_points_mask"])

    # one transformer forward at gen shapes (the scan body's compute core)
    x0 = jnp.zeros(code.shape, code.dtype)
    i0 = jnp.zeros(code_indices.shape, jnp.int32)
    fwd1 = jax.jit(lambda p, x, i: pipe.model.apply(
        p, x, i, context=ctx0, batch_size=b * t, num_frames=t))
    report["model_fwd_1step_s"] = round(_time(fwd1, params, x0, i0), 4)

    # full iterative decode (the 20-step lax.scan) WITHOUT the VQ decode
    init_idx = -jnp.ones_like(code_indices)

    @jax.jit
    def gen20(p, vp, key):
        pipe.vq_params = vp  # _lookup_codes reads it during tracing
        x_final, idx_final = pipe._iterative_decode(
            p, code.dtype, init_idx, ctx0, key, b, t)
        return x_final
    report["maskgit_20step_s"] = round(
        _time(gen20, params, vq_params, jax.random.PRNGKey(3)), 4)
    x_final = gen20(params, vq_params, jax.random.PRNGKey(3))

    # VQ decode path: final codes → voxel logits (Swin decoder)
    dec_params = {"params": vq_params["params"]["lidar_decoder"]}
    dec = jax.jit(
        lambda dp, x: pipe.vq.lidar_decoder.apply(dp, x)[1])
    report["vq_decode_s"] = round(_time(dec, dec_params, x_final), 4)

    # whole pipeline for cross-check against bench.py --lidar
    @jax.jit
    def gen(p, vp, bt, key):
        pipe.vq_params = vp
        return pipe.inference_pipeline(p, bt, key)["pred_voxels"]
    report["full_pipeline_s"] = round(_time(
        gen, params, vq_params, batch, jax.random.PRNGKey(5),
        probe=lambda o: float(o.astype(jnp.float32).mean())), 4)

    print(json.dumps(report, indent=1))
    with open(os.path.join(ROOT, "perf", "BENCH_LIDAR_BREAKDOWN.json"),
              "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
