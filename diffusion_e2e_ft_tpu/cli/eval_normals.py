"""Surface-normal benchmark CLI (DSINE-style).

Capability parity: `python -m DSINE.projects.dsine.test <args.txt> --mode benchmark`
(`/root/reference/DSINE/projects/dsine/test.py:150-236`): iterate the 4 benchmark
datasets at native resolution, pool angular errors, write metrics.txt per dataset;
GeoWizard gets the per-dataset auto-domain.
"""

from __future__ import annotations

import numpy as np

from diffusion_e2e_ft_tpu.cli.common import make_parser
from diffusion_e2e_ft_tpu.evaluation.normal_bench import BENCHMARK_DATASETS, run_benchmark
from diffusion_e2e_ft_tpu.utils.seeding import seed_all


def build_parser():
    p = make_parser(__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model_type", choices=["marigold", "geowizard"], default="marigold")
    p.add_argument("--base_data_dir", required=True, help="contains dsine_eval/<name>")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--eval_data", nargs="+", default=list(BENCHMARK_DATASETS))
    p.add_argument("--denoise_steps", type=int, default=1)
    p.add_argument("--ensemble_size", type=int, default=1)
    p.add_argument("--processing_res", type=int, default=0)
    p.add_argument("--noise", choices=["gaussian", "pyramid", "zeros"], default="zeros")
    p.add_argument("--timestep_spacing", default=None)
    p.add_argument("--half_precision", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    return p


def main(argv=None):
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)
    seed_all(args.seed)
    dtype = jnp.bfloat16 if args.half_precision else jnp.float32

    if args.model_type == "marigold":
        from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

        pipe = MarigoldPipeline.from_hf_dir(args.checkpoint, dtype=dtype)
        if args.timestep_spacing is not None:
            pipe.scheduler_config = pipe.scheduler_config.replace(
                timestep_spacing=args.timestep_spacing
            )

        def predict(img01, domain):
            rgb = (np.asarray(img01) * 255).astype(np.uint8)
            return pipe(
                rgb,
                denoising_steps=args.denoise_steps,
                ensemble_size=args.ensemble_size,
                processing_res=args.processing_res,
                noise=args.noise,
                normals=True,
                seed=args.seed,
                color_map=None,
            ).normal_np

    else:
        from diffusion_e2e_ft_tpu.pipelines import GeoWizardPipeline

        pipe = GeoWizardPipeline.from_hf_dir(args.checkpoint, dtype=dtype)

        def predict(img01, domain):
            rgb = (np.asarray(img01) * 255).astype(np.uint8)
            return pipe(
                rgb,
                denoising_steps=args.denoise_steps,
                ensemble_size=args.ensemble_size,
                processing_res=args.processing_res,
                noise=args.noise,
                domain=domain,
                seed=args.seed,
                color_map=None,
            ).normal_np

    results = run_benchmark(
        args.base_data_dir, predict, args.output_dir, datasets=args.eval_data
    )
    for name, m in results.items():
        print(name, {k: round(v, 3) for k, v in m.items()})


if __name__ == "__main__":
    main()
