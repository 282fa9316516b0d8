"""Decompose the 768px inference step's GroupNorm cost IN CONTEXT (PERF.md r4).

The isolated resnet-sandwich sweep (perf/gn_stats_sweep.py) shows all
XLA-expressible stats formulations within noise of each other, yet the pipeline
trace attributes ~25 ms to GN-stats tuple fusions. This script measures the REAL
`_infer_jit` under the E2EFT_GN_ABLATE measurement hook (kernels/groupnorm.py):

    full    — production graph
    const   — normalize+affine+SiLU kept, stats pass removed
    none    — GroupNorm removed entirely

so: stats cost = full - const, apply cost = const - none, all in the exact
layout/fusion context XLA chooses for the full graph. Timing is chained
dispatches ended by a scalar fetch (the tunnel acks block_until_ready early and
profiler sessions can wedge; see gn_stats_sweep.chained_seconds).

Run on the chip: python perf/pipeline_ablate.py [HxW] (one mode per process:
E2EFT_GN_ABLATE is read at trace time, so this script re-execs itself per mode).
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODES = ("full", "const", "none")


def measure(res: str) -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gn_stats_sweep import chained_seconds

    h, w = (int(v) for v in res.lower().split("x"))
    from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
    from diffusion_e2e_ft_tpu.ops import scheduler as S
    from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    pipe = MarigoldPipeline.from_random(
        jax.random.key(0), unet_config=UNetConfig(), vae_config=VAEConfig(),
        scheduler_config=S.SchedulerConfig(), dtype=dtype,
    )
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)), dtype)
    latent0 = jnp.asarray(rng.normal(size=(1, h // 8, w // 8, 4)), dtype)

    def step(rgb):
        depth = pipe._infer_jit(pipe.params, rgb, 1, False, latent0)
        # scalar feedback keeps iterations data-dependent without reshaping
        return rgb + (0.0 * jnp.mean(depth)).astype(rgb.dtype)

    t = chained_seconds(step, rgb, iters=20)
    mode = os.environ.get("E2EFT_GN_ABLATE") or "full"
    print(f"  {mode:6s} {res}: {t*1e3:8.2f} ms/step", flush=True)


def main() -> None:
    res = sys.argv[1] if len(sys.argv) > 1 else "768x768"
    if os.environ.get("E2EFT_GN_ABLATE") is not None or "--one" in sys.argv:
        measure(res)
        return
    for mode in MODES:
        env = dict(os.environ)
        env["E2EFT_PERF"] = "1"  # the ablate hook requires this explicit opt-in
        if mode != "full":
            env["E2EFT_GN_ABLATE"] = mode
        else:
            env.pop("E2EFT_GN_ABLATE", None)
            env["E2EFT_GN_ABLATE_FULL"] = "1"  # marker only
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), res, "--one"], env=env
        )
        if r.returncode:
            print(f"  {mode} FAILED rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
