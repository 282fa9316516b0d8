"""Trace the full jitted inference path and print the op-level device budget.

This is the committed form of the round-2 trace methodology (PERF.md): run
`_infer_jit` under `jax.profiler.trace`, aggregate XLA-op device times from the
xplane, and print buckets + top ops. Use it to verify where the time goes
before/after kernel changes.

Run on the chip:
    python perf/pipeline_trace.py [depth|geowizard] [HxW]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xprof import bucket, top_ops, trace_device_times

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    which = sys.argv[1] if len(sys.argv) > 1 else "depth"
    # E2EFT_TRACE_FUSED=1 traces the fused gn_conv VAE variant (A/B evidence)
    fused = os.environ.get("E2EFT_TRACE_FUSED") == "1"
    res = sys.argv[2] if len(sys.argv) > 2 else "768x768"
    h, w = (int(v) for v in res.lower().split("x"))

    from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
    from diffusion_e2e_ft_tpu.ops import scheduler as S

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    rgb = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    latent0 = jnp.zeros((1, h // 8, w // 8, 4), jnp.float32)

    if which == "depth":
        from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

        pipe = MarigoldPipeline.from_random(
            jax.random.key(0), unet_config=UNetConfig(), vae_config=VAEConfig(fused_gn_conv=fused),
            scheduler_config=S.SchedulerConfig(), dtype=dtype,
        )
        fn = lambda: pipe._infer_jit(pipe.params, rgb, 1, False, latent0)  # noqa: E731
    else:
        from diffusion_e2e_ft_tpu.models.clip import CLIPVisionConfig
        from diffusion_e2e_ft_tpu.pipelines import GeoWizardPipeline
        from diffusion_e2e_ft_tpu.pipelines.geowizard import domain_one_hot

        pipe = GeoWizardPipeline.from_random(
            jax.random.key(0), unet_config=UNetConfig.geowizard(), vae_config=VAEConfig(fused_gn_conv=fused),
            vision_config=CLIPVisionConfig(),
            scheduler_config=S.SchedulerConfig(prediction_type="v_prediction"), dtype=dtype,
        )
        dom = jnp.asarray(domain_one_hot("indoor"))
        fn = lambda: pipe._infer_jit(pipe.params, rgb, 1, latent0, dom)[0]  # noqa: E731

    times = trace_device_times(fn, iters=5)
    total = sum(times.values())
    print(f"=== {which} {h}x{w} ({platform}) — device total {total*1e3:.2f} ms ===")
    for k, v in bucket(times).items():
        print(f"  {v*1e3:8.3f} ms  [{k}]")
    print(top_ops(times, 40))
    dump = os.environ.get("E2EFT_TRACE_DUMP")  # full per-op rows for offline analysis
    if dump:
        with open(dump, "w") as f:
            for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
                f.write(f"{v*1e3:.4f}\t{k}\n")
        print(f"wrote {len(times)} op rows to {dump}")


if __name__ == "__main__":
    main()
