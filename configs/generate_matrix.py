"""Generate the full training-config matrix mirroring the reference recipes.

Run from the repo root:  python configs/generate_matrix.py

One file per published reference recipe (reference configs/ctsd/*,
configs/lidar/*, configs/experimental/*), at full scale, using this repo's
registered class names/aliases. Every generated config is covered by
tests/test_config_matrix.py, which shrinks the model dims and runs one
train step on synthetic data so each recipe shape stays executable.

Hyperparameters (layer counts, dims, ratios, steps) are the published
values from the corresponding reference config files — cited per file in
its "_comment".
"""

import json
import os

ROOT = os.path.dirname(os.path.abspath(__file__))

# ---------------------------------------------------------------------------
# shared blocks
# ---------------------------------------------------------------------------

CAMERA_EMBED = {
    "camera_intrinsic_embedding_indices": [0, 4, 2, 5],
    "camera_intrinsic_denom_embedding_indices": [0, 1, 0, 1],
    "camera_transform_embedding_indices": [
        3, 7, 11, 0, 1, 2, 4, 5, 6, 8, 9, 10
    ],
}

NUSC_CAMERAS = [
    "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
    "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT",
]


def nusc_dataset(seq_len=6, layout=True, split="train"):
    d = {
        "_class_name": "dwm.datasets.nuscenes.MotionDataset",
        "fs": {
            "_class_name": "dwm.fs.czip.CombinedZipFileSystem",
            "paths": ["/data/nuscenes/v1.0-trainval.zip"],
            "enable_cached_info": True,
        },
        "dataset_name": "v1.0-trainval",
        "split": split,
        "sequence_length": seq_len,
        "fps_stride_tuples": [[2, 2.0]],
        "sensor_channels": NUSC_CAMERAS,
        "enable_camera_transforms": True,
        "enable_ego_transforms": True,
    }
    if layout:
        d["_3dbox_image_settings"] = {}
        d["hdmap_image_settings"] = {}
    return d


def waymo_dataset(seq_len=6, layout=True):
    d = {
        "_class_name": "dwm.datasets.waymo.MotionDataset",
        "fs": {
            "_class_name": "dwm.fs.dirfs.DirFileSystem",
            "path": "/data/waymo",
        },
        "info_dict_path": "/data/waymo/info.json",
        "sequence_length": seq_len,
        "fps_stride_tuples": [[2, 2]],
        "sensor_channels": ["FRONT_LEFT", "FRONT", "FRONT_RIGHT"],
        "enable_camera_transforms": True,
        "enable_ego_transforms": True,
    }
    if layout:
        d["_3dbox_image_settings"] = {}
        d["hdmap_image_settings"] = {}
    return d


def argoverse_dataset(seq_len=6, layout=True):
    d = {
        "_class_name": "dwm.datasets.argoverse.MotionDataset",
        "fs": {
            "_class_name": "dwm.fs.czip.CombinedZipFileSystem",
            "paths": ["/data/argoverse2/sensor.zip"],
            "enable_cached_info": True,
        },
        "sequence_length": seq_len,
        "fps_stride_tuples": [[2, 2.0]],
        "sensor_channels": [
            "cameras/ring_front_left", "cameras/ring_front_center",
            "cameras/ring_front_right",
        ],
        "enable_camera_transforms": True,
        "enable_ego_transforms": True,
    }
    if layout:
        d["_3dbox_image_settings"] = {}
        d["hdmap_image_settings"] = {}
    return d


def opendv_dataset(seq_len=6):
    return {
        "_class_name": "dwm.datasets.opendv.MotionDataset",
        "fs": {
            "_class_name": "dwm.fs.dirfs.DirFileSystem",
            "path": "/data/opendv",
        },
        "meta_path": "/data/opendv/meta.json",
        "sequence_length": seq_len,
        "fps_stride_tuples": [[2, 10.0]],
        "enable_fake_camera_transforms": True,
        "enable_fake_3dbox_images": True,
        "enable_fake_hdmap_images": True,
    }


def kitti360_lidar_dataset(seq_len=2):
    return {
        "_class_name": "dwm.datasets.kitti360.MotionDataset",
        "fs": {
            "_class_name": "dwm.fs.czip.CombinedZipFileSystem",
            "paths": ["/data/kitti360/data_3d_raw.zip"],
            "enable_cached_info": True,
        },
        "sequence_length": seq_len,
        "fps_stride_tuples": [[2, 2.0]],
        "sensor_channels": ["velodyne_points"],
        "enable_ego_transforms": True,
        "_3dbox_bev_settings": {},
    }


def nusc_lidar_dataset(seq_len=2, layout=True):
    d = nusc_dataset(seq_len, layout=False)
    d["sensor_channels"] = ["LIDAR_TOP"]
    if layout:
        d["_3dbox_bev_settings"] = {}
        d["hdmap_bev_settings"] = {}
    return d


def concat(datasets, ratios):
    return {
        "_class_name": "ConcatMotionDataset",
        "ratios": ratios,
        "datasets": datasets,
    }


def multi_nwao(seq_len=6, layout=True):
    return concat(
        [nusc_dataset(seq_len, layout), waymo_dataset(seq_len, layout),
         argoverse_dataset(seq_len, layout), opendv_dataset(seq_len)],
        [1.0, 1.0, 1.0, 0.2],
    )


def multi_nwa(seq_len=6, layout=True):
    return concat(
        [nusc_dataset(seq_len, layout), waymo_dataset(seq_len, layout),
         argoverse_dataset(seq_len, layout)],
        [1.0, 1.0, 1.0],
    )


def dit_model(
    layers=24, heads=24, caption_dim=1536,
    dual=13, crossview=True, temporal=True, layout=True,
    explicit=False, pos_embed_max=384, perspective=True,
):
    m = {
        "_class_name":
            "dwm.models.crossview_temporal_dit."
            "DiTCrossviewTemporalConditionModel",
        "patch_size": 2,
        "num_layers": layers,
        "attention_head_dim": 64,
        "num_attention_heads": heads,
        "in_channels": 16,
        "out_channels": 16,
        "joint_attention_dim": 4096,
        "caption_projection_dim": caption_dim,
        "pooled_projection_dim": 2048,
        "pos_embed_max_size": pos_embed_max,
        "sample_size": 128,
        "qk_norm": "rms_norm",
        "dual_attention_layers": list(range(dual)),
        "qk_norm_on_additional_modules": "rms_norm",
        "gradient_checkpointing": True,
        "dtype": {"_class_name": "get_class", "class_name": "jnp.bfloat16"},
    }
    if crossview:
        m.update(
            enable_crossview=True,
            crossview_attention_type="rowwise",
            crossview_block_layers=[
                i for i in (1, 5, 9, 13, 17, 21) if i < layers
            ],
            crossview_gradient_checkpointing=True,
        )
    if temporal:
        m.update(
            enable_temporal=True,
            temporal_attention_type="pointwise",
            temporal_block_layers=[
                i for i in (2, 3, 6, 7, 10, 11, 14, 15, 18, 19, 22, 23)
                if i < layers
            ],
            temporal_gradient_checkpointing=True,
        )
    if explicit:
        m["perspective_modeling_type"] = "explicit"
    elif perspective:
        m["perspective_modeling_type"] = "implicit"
        m["projection_class_embeddings_input_dim"] = 2816
    if layout:
        m["condition_image_adapter_config"] = {
            "in_channels": 6,
            "channels": [1536, 1536, 1536, 1536, 1536, 1536],
            "is_downblocks": [True, False, False, False, False, False],
            "num_res_blocks": 2,
            "downscale_factor": 8,
            "use_zero_convs": True,
        }
    return m


def unet_model(layout=True, temporal=True):
    m = {
        "_class_name":
            "dwm.models.crossview_temporal_unet."
            "UNetCrossviewTemporalConditionModel",
        "in_channels": 4,
        "out_channels": 4,
        "block_out_channels": [320, 640, 1280, 1280],
        "layers_per_block": 2,
        "transformer_layers_per_block": 1,
        "num_attention_heads": [5, 10, 20, 20],
        "cross_attention_dim": 1024,
        "addition_time_embed_dim": 256,
        "projection_class_embeddings_input_dim": 2816,
        "enable_crossview": True,
        "enable_rowwise_crossview": True,
        "enable_temporal": temporal,
        "enable_rowwise_temporal": temporal,
        "merge_factor": 2,
        "gradient_checkpointing": True,
        "dtype": {"_class_name": "get_class", "class_name": "jnp.bfloat16"},
    }
    if layout:
        m["condition_image_adapter_config"] = {
            "in_channels": 6,
            "channels": [320, 320, 640, 1280, 1280],
            "is_downblocks": [False, True, True, True, False],
            "num_res_blocks": 2,
            "downscale_factor": 8,
        }
    return m


def flow_schedulers():
    return {
        "train_scheduler": {
            "_class_name": "FlowMatchEulerScheduler", "shift": 3.0
        },
        "test_scheduler": {
            "_class_name": "FlowMatchEulerScheduler", "shift": 3.0
        },
    }


def ddpm_schedulers():
    return {
        "train_scheduler": {
            "_class_name": "dwm.schedulers.temporal_independent.DDPMScheduler",
            "num_train_timesteps": 1000,
            "prediction_type": "v_prediction",
        },
        "test_scheduler": {
            "_class_name": "dwm.schedulers.temporal_independent.DDIMScheduler",
            "num_train_timesteps": 1000,
            "prediction_type": "v_prediction",
        },
    }


def ctsd_common(layout=True, action=False, df=False, explicit=False):
    cc = {
        "frame_prediction_style":
            "diffusion_forcing" if df else "ctsd",
        "cat_condition": True,
        "condition_on_all_frames": True,
        "uncondition_image_color": 0.1255,
        "distribution_framework": "fsdp",
    }
    if explicit:
        cc["explicit_view_modeling"] = True
    else:
        cc["added_time_ids"] = (
            "fps_camera_transforms_action" if action
            else "fps_camera_transforms"
        )
        cc.update(CAMERA_EMBED)
        if action:
            cc["camera_ego_sensor_indices"] = [0, 1, 2, 3, 4, 5]
    return cc


def ctsd_training(layout=True, df=False, warmup=False, sd21=False):
    tc = {
        "text_prompt_condition_ratio": 0.8,
    }
    if layout:
        tc["3dbox_condition_ratio"] = 0.8
        tc["hdmap_condition_ratio"] = 0.8
    if df:
        tc.update(
            image_generation_ratio=0.1,
            reference_frame_scale_std=0.01,
            reference_frame_offset_std=0.01,
        )
    else:
        tc.update(
            generation_task_ratio=0.25,
            image_generation_ratio=0.15,
            all_reference_visible_ratio=0.5,
            reference_visible_rate=0.95,
            reference_latent_count={"1": 0.5, "3": 0.5},
            disable_reference_frame_loss=True,
        )
    if warmup:
        # Freeze the pretrained spatial backbone; train only crossview /
        # temporal / adapter modules (reference *_warmup.json
        # freezing_pattern; names follow this repo's module tree).
        tc["freezing_pattern"] = (
            r"^(transformer_blocks_\d+|pos_embed|context_embedder"
            r"|time_text_embed|norm_out|proj_out"
            r"|time_embedding|add_embedding|conv_in|conv_out"
            r"|down_blocks_\d+\.(resnets|attentions)\w*"
            r"|mid_block\.(resnets|attentions)\w*"
            r"|up_blocks_\d+\.(resnets|attentions)\w*)"
        )
    tc["max_norm_for_grad_clip"] = 1.0
    if not sd21:
        tc["weighting_scheme"] = "logit_normal"
    return tc


def ctsd_config(
    name, comment, *, sd21=False, layout=True, df=False, warmup=False,
    crossview_only=False, dataset=None, steps=40000, batch=8,
    explicit=False, xs=False, tvae=False, action=False,
    extra_common=None, informations=None,
):
    seq_len = 1 if crossview_only else 6
    if sd21:
        model = unet_model(layout=layout, temporal=not crossview_only)
        sched = ddpm_schedulers()
        model_type = "unet"
    else:
        model = dit_model(
            layers=12 if xs else 24,
            heads=20 if xs else 24,
            caption_dim=1280 if xs else 1536,
            dual=12 if xs else 13,
            temporal=not crossview_only,
            layout=layout,
            explicit=explicit,
        )
        sched = flow_schedulers()
        model_type = "sd3"
    cc = ctsd_common(layout=layout, action=action, df=df, explicit=explicit)
    if crossview_only:
        cc["disable_temporal"] = True
    if tvae:
        cc["vae"] = "CogVideoXTemporalVAE"
        cc["vae_stride"] = 4
    if extra_common:
        cc.update(extra_common)
    cfg = {
        "_comment": comment,
        "generator_seed": 0,
        "train_steps": steps,
        "batch_size": batch,
        "pipeline": {
            "_class_name": "CTSDPipeline",
            "model": model,
            **sched,
            "model_type": model_type,
            "common_config": cc,
            "training_config": ctsd_training(
                layout=layout, df=df, warmup=warmup, sd21=sd21
            ),
            "inference_config": {
                "inference_steps": 50 if sd21 else 40,
                "guidance_scale": 3.0 if sd21 else 4.0,
            },
            "optimizer_config": {"lr": 1e-4 if warmup else 5e-5,
                                 "weight_decay": 0.01},
            "sharding_policy": "fsdp",
        },
        "training_dataset": dataset or multi_nwao(seq_len, layout),
        "training_collate_fn": {"_class_name": "CollateFnIgnoring"},
        "validation_dataset": nusc_dataset(seq_len, layout, split="val"),
        "validation_collate_fn": {"_class_name": "CollateFnIgnoring"},
    }
    if informations:
        cfg["informations"] = informations
    return name, cfg


# ---------------------------------------------------------------------------
# LiDAR blocks
# ---------------------------------------------------------------------------

def voxelizer_full():
    return {
        "_class_name": "dwm.models.voxelizer.Voxelizer",
        "x_min": -50.0, "x_max": 50.0, "y_min": -50.0, "y_max": 50.0,
        "step": 0.15625, "z_min": -3.0, "z_max": 2.6, "z_step": 0.14,
    }


def vq_stack(n_e=2048, e_dim=1024, cosine=False):
    return {
        "_class_name": "dwm.models.vq_point_cloud.VQPointCloud",
        "voxelizer": voxelizer_full(),
        "vector_quantizer": {
            "_class_name": "dwm.models.vq_point_cloud.VectorQuantizer",
            "n_e": n_e, "e_dim": e_dim, "beta": 0.25,
            **({"cosine_similarity": True} if cosine else {}),
        },
        "lidar_encoder": {
            "_class_name": "dwm.models.vq_point_cloud.VQEncoder",
            "img_size": 640, "patch_size": 8, "in_chans": 40,
            "embed_dim": 512, "num_heads": 16, "depth": 12,
            "codebook_dim": e_dim,
        },
        "lidar_decoder": {
            "_class_name": "dwm.models.vq_point_cloud.VQDecoder",
            "img_size": 640, "patch_size": 8, "in_chans": 40,
            "embed_dim": 512, "num_heads": 16, "depth": 12,
            "codebook_dim": e_dim, "bias_init": -3,
        },
        "ray_stepsize": 0.05, "ray_max_steps": 768,
    }


def vae_stack():
    # encoder codebook_dim = 2 * latent_dim (mean/logvar moments)
    return {
        "_class_name": "dwm.models.vae_point_cloud.VAEPointCloud",
        "voxelizer": voxelizer_full(),
        "lidar_encoder": {
            "_class_name": "dwm.models.vq_point_cloud.VQEncoder",
            "img_size": 640, "patch_size": 8, "in_chans": 40,
            "embed_dim": 512, "num_heads": 16, "depth": 12,
            "codebook_dim": 128,
        },
        "lidar_decoder": {
            "_class_name": "dwm.models.vq_point_cloud.VQDecoder",
            "img_size": 640, "patch_size": 8, "in_chans": 40,
            "embed_dim": 512, "num_heads": 16, "depth": 12,
            "codebook_dim": 64, "density_feats": 16,
        },
        "latent_dim": 64,
        "ray_stepsize": 0.05, "ray_max_steps": 768,
    }


def maskgit_transformer(n_e=2048, e_dim=1024, temporal=False):
    return {
        "_class_name":
            "dwm.models.maskgit_model.BidirectionalTransformerWithAdapter",
        "n_e": n_e, "e_dim": e_dim, "img_size": [80, 80],
        "hidden_dim": 512, "depth": 24, "num_heads": 16, "window_size": 2,
        "use_extra_embedding": n_e >= 80000,
        "enable_temporal": temporal,
        **({"enable_perturbation": True, "perturbation_ratio": 0.1,
            "perturbation_topk": 5} if n_e >= 80000 else {}),
        "condition_adapter_config": {
            "in_channels": 6,
            "channels": [512, 512],
            "is_downblocks": [False, False],
            "num_res_blocks": 2,
            "downscale_factor": 8,
        },
    }


def lidar_vqvae_config(name, comment, datasets, informations=None):
    cfg = {
        "_comment": comment,
        "generator_seed": 0,
        "train_steps": 60000,
        "batch_size": 4,
        "pipeline": {
            "_class_name": "LidarCodebook",
            "vq_point_cloud": vq_stack(),
            "training_config": {
                "voxel_loss_coef": 1.0, "emb_loss_coef": 1.0,
                "depth_loss_coef": 0.1, "sdf_loss_coef": 0.1,
                "max_norm_for_grad_clip": 1.0,
            },
            "optimizer_config": {"lr": 5e-4},
            "lr_scheduler_config": {
                "_class_name": "torch.optim.lr_scheduler.CosineAnnealingLR",
                "T_max": 60000, "eta_min": 5e-5,
            },
            "sharding_policy": "fsdp",
        },
        "training_dataset": datasets,
        "training_collate_fn": {"_class_name": "CollateFnIgnoring"},
    }
    if informations:
        cfg["informations"] = informations
    return name, cfg


def lidar_maskgit_config(
    name, comment, dataset, *, temporal=False, n_e=2048,
    informations=None,
):
    seq = 4 if temporal else 1
    cfg = {
        "_comment": comment,
        "generator_seed": 0,
        "train_steps": 150000 if temporal else 120000,
        "batch_size": 4 if temporal else 8,
        "pipeline": {
            "_class_name": "MaskGITPipeline",
            "vq_point_cloud": vq_stack(n_e=n_e, cosine=n_e >= 80000),
            "bi_directional_transformer": maskgit_transformer(
                n_e=n_e, temporal=temporal
            ),
            "common_config": {"T": 20, "gamma_mode": "cosine",
                              "distribution_framework": "fsdp"},
            "training_config": {
                "task_type_ratio": 0.5 if temporal else 0.0,
                "max_reference_frame": 3,
                "num_training_frames": seq,
                "3dbox_condition_ratio": 0.8,
                "hdmap_condition_ratio": 0.8,
                "max_norm_for_grad_clip": 1.0,
            },
            "inference_config": {
                "sample_steps": 20, "use_blank_code": True,
                "do_classifier_free_guidance": True, "guidance_scale": 3.0,
            },
            "optimizer_config": {"lr": 1e-4, "weight_decay": 0.01},
            "sharding_policy": "fsdp",
        },
        "vq_checkpoint_path": "/checkpoints/lidar_vqvae",
        "blank_code_path": "/checkpoints/blank_code.json",
        "training_dataset": dataset,
        "training_collate_fn": {"_class_name": "CollateFnIgnoring"},
    }
    if informations:
        cfg["informations"] = informations
    return name, cfg


def lidar_diffusion_config(
    name, comment, dataset, *, backbone="dit", informations=None,
):
    if backbone == "dit":
        model = dit_model(
            layers=12, heads=16, caption_dim=1024, dual=0,
            crossview=False, temporal=True, layout=False,
            perspective=False,
        )
        model["in_channels"] = 64
        model["out_channels"] = 64
        model["joint_attention_dim"] = 1024
        model["pooled_projection_dim"] = 2048
        sched = flow_schedulers()
        model_type = "sd3"
    else:
        model = unet_model(layout=False, temporal=True)
        model["in_channels"] = 64
        model["out_channels"] = 64
        sched = ddpm_schedulers()
        model_type = "unet"
    cfg = {
        "_comment": comment,
        "generator_seed": 0,
        "train_steps": 150000,
        "batch_size": 4,
        "pipeline": {
            "_class_name": "LidarDiffusionPipeline",
            "model": model,
            "autoencoder": vae_stack(),
            **sched,
            "model_type": model_type,
            "common_config": {
                "latent_bias": 0.0, "latent_scale": 1.0,
                "text_embeddings_dim": 1024,
                "distribution_framework": "fsdp",
                "frame_prediction_style": "ctsd",
            },
            "training_config": {
                "generation_task_ratio": 0.25,
                "all_reference_visible_ratio": 1.0,
                "reference_latent_count": 1,
                "disable_reference_frame_loss": True,
                "max_norm_for_grad_clip": 1.0,
            },
            "inference_config": {
                "inference_steps": 50, "guidance_scale": 3.0,
            },
            "optimizer_config": {"lr": 1e-4, "weight_decay": 0.01},
            "sharding_policy": "fsdp",
        },
        "autoencoder_checkpoint_path": "/checkpoints/lidar_vae",
        "training_dataset": dataset,
        "training_collate_fn": {"_class_name": "CollateFnIgnoring"},
    }
    if informations:
        cfg["informations"] = informations
    return name, cfg


# ---------------------------------------------------------------------------
# the matrix
# ---------------------------------------------------------------------------

def build_all():
    out = []

    # --- ctsd multi-dataset ------------------------------------------------
    out.append(ctsd_config(
        "ctsd/multi_datasets/ctsd_21_tirda_nwao.json",
        "CTSD 2.1 text-only (ref configs/ctsd/multi_datasets/"
        "ctsd_21_tirda_nwao.json: FID 26.28 / FVD 326.90, batch 64, 30k).",
        sd21=True, layout=False, steps=30000, batch=8,
        dataset=multi_nwao(6, layout=False),
        informations={"parity_targets": {"fid": 26.28, "fvd": 326.90}},
    ))
    out.append(ctsd_config(
        "ctsd/multi_datasets/ctsd_21_tirda_nwao_warmup.json",
        "CTSD 2.1 text-only warmup: spatial backbone frozen (ref "
        "*_warmup.json freezing_pattern; FID 41.69 / FVD 537.09 at 5k).",
        sd21=True, layout=False, warmup=True, steps=5000, batch=8,
        dataset=multi_nwao(6, layout=False),
        informations={"parity_targets": {"fid": 41.69, "fvd": 537.09}},
    ))
    out.append(ctsd_config(
        "ctsd/multi_datasets/ctsd_21_tirda_bm_nwa.json",
        "CTSD 2.1 + box/map layout (ref ctsd_21_tirda_bm_nwa.json: "
        "FID 13.02 / FVD 146.42, batch 64, 30k).",
        sd21=True, layout=True, steps=30000, batch=8,
        dataset=multi_nwa(6, layout=True),
        informations={"parity_targets": {"fid": 13.02, "fvd": 146.42}},
    ))
    out.append(ctsd_config(
        "ctsd/multi_datasets/ctsd_21_tirda_bm_nwa_warmup.json",
        "CTSD 2.1 + layout warmup (ref: FID 27.17 / FVD 223.87 at 5k).",
        sd21=True, layout=True, warmup=True, steps=5000, batch=8,
        dataset=multi_nwa(6, layout=True),
        informations={"parity_targets": {"fid": 27.17, "fvd": 223.87}},
    ))
    out.append(ctsd_config(
        "ctsd/multi_datasets/ctsd_35_tirda_nwao.json",
        "CTSD 3.5 text-only (ref ctsd_35_tirda_nwao.json: FID 10.45 / "
        "FVD 90.89, batch 64, 20k).",
        layout=False, steps=20000, batch=8,
        dataset=multi_nwao(6, layout=False),
        informations={"parity_targets": {"fid": 10.45, "fvd": 90.89}},
    ))
    out.append(ctsd_config(
        "ctsd/multi_datasets/ctsd_35_tirda_nwao_warmup.json",
        "CTSD 3.5 text-only warmup (ref: FID 27.28 / FVD 389.60 at 5k).",
        layout=False, warmup=True, steps=5000, batch=8,
        dataset=multi_nwao(6, layout=False),
        informations={"parity_targets": {"fid": 27.28, "fvd": 389.60}},
    ))
    out.append(ctsd_config(
        "ctsd/multi_datasets/ctsd_35_df16_tirda_bm_nwao.json",
        "DFoT diffusion forcing on CTSD 3.5 (ref "
        "ctsd_35_df16_tirda_bm_nwao.json: FID 13.13 / FVD 98.39).",
        df=True, action=True, steps=40000, batch=6,
        dataset=multi_nwao(6, layout=True),
        informations={"parity_targets": {"fid": 13.13, "fvd": 98.39}},
    ))
    out.append(ctsd_config(
        "ctsd/multi_datasets/ctsd_35_tvae_f17_tirda_bm_nwao.json",
        "CTSD 3.5 + CogVideoX temporal VAE, 17-frame windows (ref "
        "ctsd_35_tvae_f17_tirda_bm_nwao.json: FVD 41.958 w/ 1 ref).",
        tvae=True, steps=50000, batch=4,
        dataset=multi_nwao(17, layout=True),
        informations={"parity_targets": {"fvd_1ref": 41.958}},
    ))

    # --- ctsd single-dataset -------------------------------------------------
    for sd21 in (True, False):
        tag = "21" if sd21 else "35"
        fid, fvd = (18.82, 140.38) if sd21 else (13.84, 110.18)
        out.append(ctsd_config(
            f"ctsd/single_dataset/ctsd_{tag}_tirda_bm_nusc_a.json",
            f"CTSD {tag[0]}.{tag[1]} single-dataset nuScenes + layout "
            f"(ref: FID {fid} / FVD {fvd}, batch 32, 20k).",
            sd21=sd21, steps=20000, batch=8,
            dataset=nusc_dataset(6, True),
            informations={"parity_targets": {"fid": fid, "fvd": fvd}},
        ))
        out.append(ctsd_config(
            f"ctsd/single_dataset/ctsd_{tag}_tirda_bm_nusc_a_warmup.json",
            f"CTSD {tag[0]}.{tag[1]} nuScenes warmup (backbone frozen).",
            sd21=sd21, warmup=True, steps=5000, batch=8,
            dataset=nusc_dataset(6, True),
        ))
    for tag, ds_name, ds, fid in (
        ("21", "nusc_a", nusc_dataset(1, True), 11.78),
        ("21", "waymo", waymo_dataset(1, True), 10.02),
        ("21", "argo", argoverse_dataset(1, True), 9.32),
        ("35", "nusc_a", nusc_dataset(1, True), 12.04),
    ):
        out.append(ctsd_config(
            f"ctsd/single_dataset/ctsd_{tag}_crossview_tirda_bm_"
            f"{ds_name}.json",
            f"CTSD {tag[0]}.{tag[1]} crossview-only image generation on "
            f"{ds_name} (ref: FID {fid}).",
            sd21=tag == "21", crossview_only=True, steps=30000, batch=8,
            dataset=ds,
            informations={"parity_targets": {"fid": fid}},
        ))

    # --- unimlvg stages 1-2 (stage 3 is committed by hand) -----------------
    out.append(ctsd_config(
        "unimlvg/ctsd_unimlvg_stage1_tird_o.json",
        "UniMLVG stage 1: single-frame, explicit view modeling, backbone "
        "frozen (ref configs/ctsd/unimlvg/ctsd_unimlvg_stage1_tird_o.json: "
        "FID 9.10 / FVD 132.89, batch 32, 30k).",
        explicit=True, crossview_only=False, warmup=True,
        layout=False, steps=30000, batch=8,
        dataset=opendv_dataset(3),
        informations={"parity_targets": {"fid": 9.10, "fvd": 132.89},
                      "stage_chain": ["stage1 (this)", "stage2", "stage3"]},
    ))
    out.append(ctsd_config(
        "unimlvg/ctsd_unimlvg_stage2_tirda_bm_nwa.json",
        "UniMLVG stage 2: video + layout, explicit view modeling (ref "
        "ctsd_unimlvg_stage2_tirda_bm_nwa.json: FID 5.86 / FVD 34.80).",
        explicit=True, warmup=True, steps=20000, batch=8,
        dataset=multi_nwa(6, layout=True),
        informations={"parity_targets": {"fid": 5.86, "fvd": 34.80},
                      "stage_chain": ["stage1", "stage2 (this)", "stage3"]},
    ))

    # --- experimental --------------------------------------------------------
    out.append(ctsd_config(
        "experimental/ctsd_35_xs_df6v3_tirda_bm_nwao.json",
        "Interactive XS model (12 layers, 1280 dim) with 6-frame "
        "diffusion forcing for streaming (ref configs/experimental/"
        "multi_datasets/ctsd_35_xs_df6v3_tirda_bm_nwao.json).",
        xs=True, df=True, steps=40000, batch=12,
        dataset=multi_nwao(6, layout=True),
    ))
    name, cfg = ctsd_config(
        "experimental/ctsd_35_xs_df6v3_tirda_bm_nwao_streaming.json",
        "Streaming (FIFO) variant of the interactive XS model (ref "
        "configs/experimental/streaming/"
        "ctsd_35_xs_df6v3_tirda_bm_nwao_streaming.json).",
        xs=True, df=True, steps=0, batch=1,
        dataset=multi_nwao(6, layout=True),
    )
    cfg["pipeline"]["_class_name"] = "StreamingCTSDPipeline"
    cfg["pipeline"]["inference_config"] = {
        "inference_steps": 6, "guidance_scale": 2.0,
        "text_prompt_interval": 10,
    }
    out.append((name, cfg))

    # --- lidar ---------------------------------------------------------------
    out.append(lidar_vqvae_config(
        "lidar/lidar_vqvae_nwa.json",
        "LiDAR VQVAE on nuScenes+Waymo+Argoverse (ref configs/lidar/"
        "lidar_vqvae_nwa.json: recon IoU 0.442, batch 32, 60k).",
        concat([nusc_lidar_dataset(2, layout=False)], [1.0]),
        informations={"parity_targets": {"iou": 0.442}},
    ))
    out.append(lidar_vqvae_config(
        "lidar/lidar_vqvae_nwak.json",
        "LiDAR VQVAE incl. KITTI-360 (ref configs/lidar/"
        "lidar_vqvae_nwak.json).",
        concat(
            [nusc_lidar_dataset(2, layout=False),
             kitti360_lidar_dataset(2)], [1.0, 1.0]
        ),
    ))
    # lidar VAE
    out.append((
        "lidar/lidar_vae_nwak.json",
        {
            "_comment": "LiDAR KL-VAE incl. KITTI-360 (ref configs/lidar/"
                        "lidar_vae_nwak.json).",
            "generator_seed": 0,
            "train_steps": 60000,
            "batch_size": 4,
            "pipeline": {
                "_class_name": "LidarVAE",
                "lidar_vae": vae_stack(),
                "training_config": {
                    "voxel_loss_coef": 1.0, "kl_loss_coef": 1e-6,
                    "depth_loss_coef": 0.1, "sdf_loss_coef": 0.1,
                    "max_norm_for_grad_clip": 1.0,
                },
                "optimizer_config": {"lr": 5e-4},
                "sharding_policy": "fsdp",
            },
            "training_dataset": concat(
                [nusc_lidar_dataset(2, layout=False),
                 kitti360_lidar_dataset(2)], [1.0, 1.0]
            ),
            "training_collate_fn": {"_class_name": "CollateFnIgnoring"},
        },
    ))
    out.append(lidar_maskgit_config(
        "lidar/lidar_maskgit_layout_ns.json",
        "Single-frame LiDAR MaskGIT + BEV layout on nuScenes (ref "
        "configs/lidar/lidar_maskgit_layout_ns.json: CD 3.095).",
        nusc_lidar_dataset(1), temporal=False, n_e=2048,
        informations={"parity_targets": {"chamfer": 3.095}},
    ))
    out.append(lidar_maskgit_config(
        "lidar/lidar_maskgit_vq80k_layout_ns.json",
        "Single-frame MaskGIT with the 80k codebook on nuScenes (ref: "
        "IoU 0.055 / CD 4.438).",
        nusc_lidar_dataset(1), temporal=False, n_e=80000,
        informations={"parity_targets": {"iou": 0.055, "chamfer": 4.438}},
    ))
    out.append(lidar_maskgit_config(
        "lidar/lidar_maskgit_vq80k_layout_kt.json",
        "Single-frame MaskGIT with the 80k codebook on KITTI-360 (ref: "
        "IoU 0.0449 / CD 5.838 / MMD 0.00461 / JSD 0.471).",
        kitti360_lidar_dataset(1), temporal=False, n_e=80000,
        informations={"parity_targets": {"iou": 0.0449, "chamfer": 5.838}},
    ))
    out.append(lidar_maskgit_config(
        "lidar/lidar_maskgit_temporal_vq80k_layout_kt.json",
        "Temporal MaskGIT on KITTI-360 (ref: IoU 0.117 / CD 3.347 / "
        "MMD 0.00411 / JSD 0.313).",
        kitti360_lidar_dataset(4), temporal=True, n_e=80000,
        informations={"parity_targets": {"iou": 0.117, "chamfer": 3.347}},
    ))
    out.append(lidar_diffusion_config(
        "lidar/lidar_diffusion_dit_temporal_kt.json",
        "Temporal LiDAR DiT diffusion on KITTI-360 (ref configs/lidar/"
        "lidar_diffusion_dit_temporal_kt.json: IoU 0.173 / CD 0.895).",
        kitti360_lidar_dataset(4), backbone="dit",
        informations={"parity_targets": {"iou": 0.173, "chamfer": 0.895}},
    ))
    out.append(lidar_diffusion_config(
        "lidar/lidar_diffusion_unet_temporal_ns.json",
        "Temporal LiDAR UNet diffusion on nuScenes (ref configs/lidar/"
        "lidar_diffusion_unet_temporal_ns.json).",
        nusc_lidar_dataset(4), backbone="unet",
    ))
    out.append(lidar_diffusion_config(
        "lidar/lidar_diffusion_unet_temporal_kt.json",
        "Temporal LiDAR UNet diffusion on KITTI-360 (ref configs/lidar/"
        "lidar_diffusion_unet_temporal_kt.json).",
        kitti360_lidar_dataset(4), backbone="unet",
    ))
    return out


def main():
    for rel, cfg in build_all():
        path = os.path.join(ROOT, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(cfg, f, indent=2)
            f.write("\n")
        print("wrote", rel)


if __name__ == "__main__":
    main()
