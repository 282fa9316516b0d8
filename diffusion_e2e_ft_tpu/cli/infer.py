"""Eval-dataset inference CLI: run a pipeline over a benchmark dataset (RGB only)
and dump per-image `.npy` predictions for `eval_depth`.

Capability parity: `/root/reference/Marigold/infer.py:53-330` — dataset-config YAML,
RGB_ONLY mode, per-image npy dump named by the dataset's filename mode,
`arguments.txt` record; `--model_type geowizard` switches pipeline (with `--domain`).
"""

from __future__ import annotations

import os

import numpy as np

from diffusion_e2e_ft_tpu.cli.common import load_dataset_config, make_parser
from diffusion_e2e_ft_tpu.data import DatasetMode, get_depth_dataset
from diffusion_e2e_ft_tpu.evaluation.depth_bench import run_inference
from diffusion_e2e_ft_tpu.utils.seeding import seed_all


def build_parser():
    p = make_parser(__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model_type", choices=["marigold", "geowizard"], default="marigold")
    p.add_argument("--dataset_config", required=True, help="dataset YAML (name/dir/filenames)")
    p.add_argument("--base_data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--denoise_steps", type=int, default=1)
    p.add_argument("--ensemble_size", type=int, default=1)
    p.add_argument("--processing_res", type=int, default=0, help="0 = native resolution")
    p.add_argument("--noise", choices=["gaussian", "pyramid", "zeros"], default="zeros")
    p.add_argument("--timestep_spacing", choices=["trailing", "leading", "linspace"], default=None)
    p.add_argument("--domain", choices=["indoor", "outdoor", "object"], default="indoor")
    p.add_argument("--half_precision", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--resample_method", default="bilinear")
    return p


def main(argv=None):
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)
    seed_all(args.seed)
    dtype = jnp.bfloat16 if args.half_precision else jnp.float32

    cfg = load_dataset_config(args.dataset_config)
    dataset = get_depth_dataset(cfg, args.base_data_dir, DatasetMode.RGB_ONLY)

    if args.model_type == "marigold":
        from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

        pipe = MarigoldPipeline.from_hf_dir(args.checkpoint, dtype=dtype)
        if args.timestep_spacing is not None:
            pipe.scheduler_config = pipe.scheduler_config.replace(
                timestep_spacing=args.timestep_spacing
            )

        def predict(rgb):
            return pipe(
                rgb,
                denoising_steps=args.denoise_steps,
                ensemble_size=args.ensemble_size,
                processing_res=args.processing_res,
                resample_method=args.resample_method,
                noise=args.noise,
                seed=args.seed,
                color_map=None,
            ).depth_np

    else:
        from diffusion_e2e_ft_tpu.pipelines import GeoWizardPipeline

        pipe = GeoWizardPipeline.from_hf_dir(args.checkpoint, dtype=dtype)

        def predict(rgb):
            return pipe(
                rgb,
                denoising_steps=args.denoise_steps,
                ensemble_size=args.ensemble_size,
                processing_res=args.processing_res,
                noise=args.noise,
                domain=args.domain,
                seed=args.seed,
                color_map=None,
            ).depth_np

    run_inference(dataset, predict, args.output_dir, arguments=vars(args))


if __name__ == "__main__":
    main()
