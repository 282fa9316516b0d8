"""Benchmark: single-step depth inference throughput on one TPU chip.

Measures the full jitted device path (VAE encode -> SD2 UNet @ t=999 -> trailing-DDIM
x0 -> VAE decode -> depth postproc) at 768x768, bf16 compute — the reference's
headline configuration (121 ms/img on an RTX 4090 => 8.26 img/s,
`/root/reference/README.md:147-158`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

BASELINE_IMG_PER_S = 1000.0 / 121.0  # RTX 4090 reference: 8.26 img/s


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline
    from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
    from diffusion_e2e_ft_tpu.ops import scheduler as S

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32

    res = 768
    pipe = MarigoldPipeline.from_random(
        jax.random.key(0),
        unet_config=UNetConfig(),  # full SD2, 8ch
        vae_config=VAEConfig(),  # full SD2 VAE
        scheduler_config=S.SchedulerConfig(),
        dtype=dtype,
    )

    rgb = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, res, res, 3)).astype(np.float32)
    )
    latent0 = jnp.zeros((1, res // 8, res // 8, 4), jnp.float32)

    run = lambda: pipe._infer_jit(pipe.params, rgb, 1, False, latent0)

    # compile + warmup
    out = run()
    out.block_until_ready()
    for _ in range(3):
        run().block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    img_per_s = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"{res}px single-step depth inference, 1 chip ({platform})",
                "value": round(img_per_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
