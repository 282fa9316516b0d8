"""Whole-pipeline `pipe(image)` latency, INCLUDING host pre/post (VERDICT r3 #8/#9).

The headline bench times the jitted device path only; the reference's 121 ms /
254 ms (RTX 4090, 576x768, steps=1, ensemble=1, `/root/reference/README.md:158`)
are whole-`pipe(image)` numbers including PIL resize, normalization, ensembling
bookkeeping, resize-back, and colorization. This script closes that loophole: it
times our FULL `MarigoldPipeline.__call__` (and GeoWizard with E2EFT_PIPE=geowizard)
on a uint8 host image at the reference's exact configuration.

Run on the chip:  python perf/pipe_latency.py  ->  one PERF.md-ready table row.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    h, w = (int(v) for v in os.environ.get("E2EFT_RES", "576x768").lower().split("x"))
    which = os.environ.get("E2EFT_PIPE", "depth")
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    if which == "geowizard":
        from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
        from diffusion_e2e_ft_tpu.models.clip import CLIPVisionConfig
        from diffusion_e2e_ft_tpu.ops import scheduler as S
        from diffusion_e2e_ft_tpu.pipelines import GeoWizardPipeline

        pipe = GeoWizardPipeline.from_random(
            jax.random.key(0), unet_config=UNetConfig.geowizard(),
            vae_config=VAEConfig(), vision_config=CLIPVisionConfig(),
            scheduler_config=S.SchedulerConfig(prediction_type="v_prediction"),
            dtype=dtype,
        )
        call = lambda: pipe(image, denoising_steps=1, ensemble_size=1,
                            processing_res=0, domain="indoor", seed=0)
        ref_ms = 254.0
    else:
        from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
        from diffusion_e2e_ft_tpu.ops import scheduler as S
        from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

        pipe = MarigoldPipeline.from_random(
            jax.random.key(0), unet_config=UNetConfig(), vae_config=VAEConfig(),
            scheduler_config=S.SchedulerConfig(), dtype=dtype,
        )
        call = lambda: pipe(image, denoising_steps=1, ensemble_size=1,
                            processing_res=0, seed=0)
        ref_ms = 121.0

    call()  # compile
    for _ in range(3):
        call()
    iters = 10
    if os.environ.get("E2EFT_PIPE_PROFILE") == "1":
        import cProfile
        import pstats

        prof = cProfile.Profile()
        prof.enable()
        for _ in range(iters):
            out = call()
        prof.disable()
        pstats.Stats(prof).sort_stats("cumulative").print_stats(25)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call()
    dt = (time.perf_counter() - t0) / iters
    ms = dt * 1000.0
    print(
        f"| whole `pipe(image)` {which}, {h}x{w}, steps=1, ensemble=1, incl. host "
        f"pre/post+colorize ({platform}) | {ms:.1f} ms ({1.0 / dt:.2f} img/s) | "
        f"{ref_ms:.0f} ms (4090) | {ref_ms / ms:.2f}x |"
    )


if __name__ == "__main__":
    main()
