"""E2E fine-tuning CLI covering the reference's five configurations:
marigold/stable-diffusion x depth/normals (`training/train.py` + `training/scripts/*.sh`)
and the GeoWizard joint trainer (`GeoWizard/geowizard/training/train_depth_normal.py`).

Flow: load base checkpoint -> optional conv_in 4->8 surgery (when starting from raw
SD2 with a noise type) -> Hypersim + VirtualKITTI2 mixed 9:1 -> jitted train step on
a data mesh -> periodic orbax checkpoints -> final HF-layout export with trailing
scheduler spacing.
"""

from __future__ import annotations

import os

import numpy as np

from diffusion_e2e_ft_tpu.cli.common import make_parser
from diffusion_e2e_ft_tpu.utils.seeding import seed_all


def build_parser():
    p = make_parser(__doc__)
    p.add_argument("--pretrained_model_name_or_path", required=True, help="HF pipeline dir")
    p.add_argument("--modality", choices=["depth", "normals", "joint"], default="depth")
    p.add_argument("--noise_type", choices=["zeros", "pyramid", "gaussian", "none"], default="zeros")
    p.add_argument("--output_dir", default="model-finetuned")
    p.add_argument("--hypersim_root", default="data/hypersim")
    p.add_argument("--hypersim_split_csv", default=None)
    p.add_argument("--vkitti_root", default="data/virtual_kitti_2")
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--gradient_accumulation_steps", type=int, default=16)
    p.add_argument("--max_train_steps", type=int, default=20000)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--lr_warmup_steps", type=int, default=100)
    p.add_argument("--lr_total_iter_length", type=int, default=20000)
    p.add_argument("--checkpointing_steps", type=int, default=20000)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", default=None, help="path or 'latest'")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--no_e2e", action="store_true", help="standard diffusion loss (GeoWizard)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_devices", type=int, default=None, help="data-parallel degree")
    return p


def main(argv=None):
    import jax

    from diffusion_e2e_ft_tpu.data.mixer import BatchLoader, MixedLoader, Prefetcher
    from diffusion_e2e_ft_tpu.data.train_datasets import Hypersim, VirtualKITTI2
    from diffusion_e2e_ft_tpu.models.convert import replace_conv_in
    from diffusion_e2e_ft_tpu.parallel import make_mesh
    from diffusion_e2e_ft_tpu.pipelines import loading
    from diffusion_e2e_ft_tpu.training import E2ETrainer, TrainConfig
    from diffusion_e2e_ft_tpu.training import checkpoints as ckpt
    from diffusion_e2e_ft_tpu.training.loop import run_training

    args = build_parser().parse_args(argv)
    seed_all(args.seed)
    noise_type = None if args.noise_type == "none" else args.noise_type

    mesh = make_mesh(args.num_devices)
    ndp = int(mesh.devices.size)

    config = TrainConfig(
        modality=args.modality,
        noise_type=noise_type,
        learning_rate=args.learning_rate,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_total_iter_length=args.lr_total_iter_length,
        max_train_steps=args.max_train_steps,
        train_batch_size=args.train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        gradient_checkpointing=args.gradient_checkpointing,
        use_ema=args.use_ema,
        e2e=not args.no_e2e,
        num_data_parallel=ndp,
        seed=args.seed,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        output_dir=args.output_dir,
    )

    # --- models -----------------------------------------------------------
    path = args.pretrained_model_name_or_path
    unet, unet_params, ucfg = loading.load_unet(os.path.join(path, "unet"))
    vae, vae_params, vcfg = loading.load_vae(os.path.join(path, "vae"))
    sched_cfg = loading.scheduler_config_from_hf(
        loading._read_json(os.path.join(path, "scheduler", "scheduler_config.json"))
    )
    if noise_type is not None and ucfg.in_channels == 4:
        # raw SD2 start: duplicate conv_in for the concatenated noisy latent
        unet_params = replace_conv_in(unet_params, repeat=2)
        ucfg = ucfg.replace(in_channels=8)
        from diffusion_e2e_ft_tpu.models import UNet2DCondition

        unet = UNet2DCondition(ucfg)

    # --- data -------------------------------------------------------------
    hyper = Hypersim(args.hypersim_root, split_csv=args.hypersim_split_csv, seed=args.seed)
    vkitti = VirtualKITTI2(args.vkitti_root, seed=args.seed)
    global_batch = args.train_batch_size * ndp
    modality_for_collate = args.modality

    def make_epoch_iter(epoch: int):
        l1 = BatchLoader(hyper, global_batch, modality_for_collate, seed=args.seed + epoch)
        l2 = BatchLoader(vkitti, global_batch, modality_for_collate, seed=args.seed + epoch)
        return Prefetcher(MixedLoader(l1, l2, 9, 1, seed=args.seed + epoch))

    # --- trainer ----------------------------------------------------------
    if args.modality == "joint":
        from diffusion_e2e_ft_tpu.models import clip as clip_models
        from diffusion_e2e_ft_tpu.models import convert
        from diffusion_e2e_ft_tpu.training.geowizard import GeoWizardTrainer

        enc_dir = os.path.join(path, "image_encoder")
        vis_cfg = loading.vision_config_from_hf(
            loading._read_json(os.path.join(enc_dir, "config.json"))
        )
        image_encoder = clip_models.CLIPVisionModelWithProjection(vis_cfg)
        image_encoder_params = convert.clip_state_dict_to_params(
            convert.load_state_dict(loading._find_weights(enc_dir))
        )
        trainer = GeoWizardTrainer(
            config, unet, vae, vae_params, image_encoder, image_encoder_params, sched_cfg
        )
    else:
        empty = loading.compute_empty_text_embed(
            os.path.join(path, "text_encoder"), pad_to=77
        )
        trainer = E2ETrainer(config, unet, vae, vae_params, empty, sched_cfg)

    state = trainer.init_state(unet_params)
    state = run_training(
        trainer,
        state,
        make_epoch_iter,
        mesh=mesh,
        resume_from=args.resume_from_checkpoint,
    )

    # --- final export (trailing spacing baked in, frozen towers copied in) --
    final_params = state.ema_params if (args.use_ema and state.ema_params is not None) else state.params
    export_dir = os.path.join(args.output_dir, "export")
    ckpt.export_hf_pipeline(
        export_dir, ucfg, jax.device_get(final_params), vcfg, vae_params, sched_cfg,
        source_checkpoint=path, modality=args.modality,
    )
    print(f"[train] exported HF pipeline to {export_dir}", flush=True)


if __name__ == "__main__":
    main()
