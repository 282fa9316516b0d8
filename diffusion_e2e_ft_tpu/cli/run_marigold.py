"""Folder-of-images depth/normal inference CLI.

Capability parity: `/root/reference/Marigold/run.py:54-345` — walks an image folder,
runs the Marigold pipeline, saves `depth_npy/*.npy`, `depth_colored/*.png` and
16-bit `depth_bw/*.png` (or `normal_npy`/`normal_colored` with `--normals`), with
the reference's flags (checkpoint, denoise_steps, ensemble_size, timestep_spacing
override, noise, processing_res, half precision, seed, batch size, resample method).
"""

from __future__ import annotations

import os

import numpy as np

from diffusion_e2e_ft_tpu.cli.common import (
    list_images,
    load_image_rgb,
    make_parser,
    save_image,
)
from diffusion_e2e_ft_tpu.ops import image as im
from diffusion_e2e_ft_tpu.utils.logging import write_arguments
from diffusion_e2e_ft_tpu.utils.seeding import seed_all


def build_parser():
    p = make_parser(__doc__)
    p.add_argument("--checkpoint", required=True, help="HF pipeline directory")
    p.add_argument("--input_rgb_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--normals", action="store_true", help="predict surface normals")
    p.add_argument("--denoise_steps", type=int, default=1)
    p.add_argument("--ensemble_size", type=int, default=1)
    p.add_argument("--timestep_spacing", choices=["trailing", "leading", "linspace"], default=None)
    p.add_argument("--noise", choices=["gaussian", "pyramid", "zeros"], default="zeros")
    p.add_argument("--processing_res", type=int, default=768)
    p.add_argument("--output_processing_res", action="store_true")
    p.add_argument("--half_precision", action="store_true", help="bfloat16 on TPU")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--resample_method", choices=["bilinear", "bicubic", "nearest"], default="bilinear")
    p.add_argument("--color_map", default="Spectral")
    p.add_argument("--profile_dir", default=None, help="capture a jax.profiler trace here")
    return p


def main(argv=None):
    import jax.numpy as jnp

    from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

    args = build_parser().parse_args(argv)
    seed_all(args.seed if args.seed is not None else 0)

    dtype = jnp.bfloat16 if args.half_precision else jnp.float32
    pipe = MarigoldPipeline.from_hf_dir(args.checkpoint, dtype=dtype)
    if args.timestep_spacing is not None:
        pipe.scheduler_config = pipe.scheduler_config.replace(
            timestep_spacing=args.timestep_spacing
        )

    os.makedirs(args.output_dir, exist_ok=True)
    write_arguments(args.output_dir, vars(args))
    sub = {
        name: os.path.join(args.output_dir, name)
        for name in (
            ("normal_npy", "normal_colored")
            if args.normals
            else ("depth_npy", "depth_colored", "depth_bw")
        )
    }
    for d in sub.values():
        os.makedirs(d, exist_ok=True)

    images = list_images(args.input_rgb_dir)
    if not images:
        raise SystemExit(f"no images found in {args.input_rgb_dir}")
    print(f"[run] {len(images)} images", flush=True)

    profile_ctx = None
    if args.profile_dir:
        from diffusion_e2e_ft_tpu.utils.profiling import trace

        profile_ctx = trace(args.profile_dir)
        profile_ctx.__enter__()

    for path in images:
        rgb = load_image_rgb(path)
        out = pipe(
            rgb,
            denoising_steps=args.denoise_steps,
            ensemble_size=args.ensemble_size,
            processing_res=args.processing_res,
            match_input_res=not args.output_processing_res,
            resample_method=args.resample_method,
            batch_size=args.batch_size,
            noise=args.noise,
            normals=args.normals,
            seed=args.seed,
            color_map=args.color_map,
        )
        stem = os.path.splitext(os.path.basename(path))[0]
        if args.normals:
            np.save(os.path.join(sub["normal_npy"], f"{stem}_pred.npy"), out.normal_np)
            save_image(os.path.join(sub["normal_colored"], f"{stem}_colored.png"), out.normal_colored)
        else:
            np.save(os.path.join(sub["depth_npy"], f"{stem}_pred.npy"), out.depth_np)
            save_image(os.path.join(sub["depth_colored"], f"{stem}_colored.png"), out.depth_colored)
            bw = im.to_uint16(out.depth_np)
            from PIL import Image

            Image.fromarray(bw).save(os.path.join(sub["depth_bw"], f"{stem}_bw.png"))
        print(f"[run] {stem} done", flush=True)

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
        print(f"[run] profiler trace written to {args.profile_dir}", flush=True)


if __name__ == "__main__":
    main()
