"""On-chip measurements replacing two guesses (VERDICT r2 #8, #9):

1. `find_batch_size` sweep — per-image device-path time for ensemble batch
   sizes at several processing resolutions, so the v5e batching table in
   `pipelines/marigold.py` is measured, not re-derived.
2. Whole-pipeline latency — `pipe(image)` wall time INCLUDING host-side
   resize/normalize/colorize at the reference's exact 576x768 single-image,
   single-step, single-ensemble config (`/root/reference/README.md:158`
   measures the CUDA pipeline this way: 121 ms on an RTX 4090).

Run on the chip: `python perf/batch_latency_sweep.py [sweep|latency|both]`
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


def build_pipe(dtype_name="bfloat16"):
    import jax
    import jax.numpy as jnp

    from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
    from diffusion_e2e_ft_tpu.ops import scheduler as S
    from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    return MarigoldPipeline.from_random(
        jax.random.key(0), unet_config=UNetConfig(), vae_config=VAEConfig(),
        scheduler_config=S.SchedulerConfig(), dtype=dtype,
    )


def batch_sweep(pipe):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    print("=== ensemble-batch sweep (device path, ms/img) ===", flush=True)
    # Decision cells only: each table threshold (512->8, 768->4, else->2) is
    # justified by the measured pair around it. The full 12-cell grid costs
    # ~12 cold remote compiles (~30 min each through the tunnel) — the 6-cell
    # version answers the same question. E2EFT_SWEEP_FULL=1 restores the grid.
    if os.environ.get("E2EFT_SWEEP_FULL") == "1":
        cells = {512: (1, 2, 4, 8), 768: (1, 2, 4, 8), 1024: (1, 2, 4, 8)}
    else:
        cells = {512: (4, 8), 768: (2, 4), 1024: (1, 2)}
    for res, batches in cells.items():
        row = []
        for bs in batches:
            rgb = jnp.asarray(rng.uniform(-1, 1, (bs, res, res, 3)).astype(np.float32))
            lat = jnp.zeros((bs, res // 8, res // 8, 4), jnp.float32)
            try:
                # bench._timeit syncs via a device-side scalar fetch (the tunnel
                # acks block_until_ready early) and subtracts the roundtrip
                from bench import _timeit

                dt = _timeit(
                    lambda: pipe._infer_jit(pipe.params, rgb, 1, False, lat),
                    iters=max(2, 8 // bs),
                    warmup=2,
                )
                ms = dt / bs * 1e3
                row.append(f"bs{bs}: {ms:7.1f}")
            except Exception as e:
                row.append(f"bs{bs}: OOM({type(e).__name__})")
                break
        print(f"  res {res}: " + "  ".join(row), flush=True)
        mem = (jax.local_devices()[0].memory_stats() or {}).get("peak_bytes_in_use", 0)
        print(f"    peak device mem so far: {mem/2**30:.2f} GiB", flush=True)


def whole_pipeline_latency(pipe):
    import numpy as np

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (576, 768, 3))).astype(np.uint8)
    # processing_res=768 keeps the 576x768 input unresized (max edge is 768):
    # identical to the reference benchmark config
    kw = dict(denoising_steps=1, ensemble_size=1, processing_res=768, seed=0)
    pipe(img, **kw)  # compile
    for _ in range(2):
        pipe(img, **kw)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(img, **kw)
    dt = (time.perf_counter() - t0) / iters
    assert out.depth_np.shape == (576, 768) and out.depth_colored is not None
    print(
        f"=== whole pipe(image) 576x768 1-step 1-ensemble (host pre/post + colorize "
        f"included): {dt*1e3:.1f} ms/img ({1/dt:.2f} img/s) vs 4090 121 ms ===",
        flush=True,
    )
    # and without colorization (the npy-only eval path)
    kw["color_map"] = None
    pipe(img, **kw)
    t0 = time.perf_counter()
    for _ in range(iters):
        pipe(img, **kw)
    dt = (time.perf_counter() - t0) / iters
    print(f"    without colorize: {dt*1e3:.1f} ms/img ({1/dt:.2f} img/s)", flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    pipe = build_pipe()
    if mode in ("latency", "both"):
        whole_pipeline_latency(pipe)
    if mode in ("sweep", "both"):
        batch_sweep(pipe)


if __name__ == "__main__":
    main()
