"""Op-level device-time trace of the E2E train step (paper config).

The remat sweep showed the step is memory-bound at the margin (any policy that
saves more than nothing OOMs next to the 10.4 GB fp32 param+Adam state), and
whole-UNet remat at latent resolution only costs ~1.3 TFLOP of the ~35 TFLOP
step — so the ~33% MFU is lost elsewhere. This prints the bucket/op budget.

Run on the chip: `python perf/train_trace.py`
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

    from diffusion_e2e_ft_tpu.models import AutoencoderKL, UNet2DCondition, UNetConfig, VAEConfig
    from diffusion_e2e_ft_tpu.training import E2ETrainer, TrainConfig

    res, width, batch = 480, 640, 2
    platform = jax.devices()[0].platform
    dtype = "bfloat16" if platform == "tpu" else "float32"
    unet = UNet2DCondition(UNetConfig(dtype=dtype))
    vae = AutoencoderKL(VAEConfig(dtype=dtype))
    rng = np.random.default_rng(0)
    up = jax.jit(unet.init)(
        jax.random.key(0), jnp.ones((1, 8, 8, 8)), jnp.asarray([999]), jnp.ones((1, 2, 1024))
    )["params"]
    vp = jax.jit(vae.init)(jax.random.key(1), jnp.ones((1, 64, 64, 3)))["params"]
    cfg = TrainConfig(
        gradient_accumulation_steps=1, gradient_checkpointing=True,
        remat_policy=(sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] != "none" else None),
    )
    trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 1024), np.float32))
    state = trainer.init_state(up)
    batch_data = {
        "rgb": jnp.asarray(rng.uniform(-1, 1, (batch, res, width, 3)).astype(np.float32)),
        "target": jnp.asarray(rng.uniform(-1, 1, (batch, res, width)).astype(np.float32)),
        "val_mask": jnp.ones((batch, res, width), bool),
    }
    key = jax.random.key(0)
    box = [state]

    def step():
        s, m = trainer.train_step(box[0], dict(batch_data), key)
        box[0] = s
        return m["loss"]

    times = trace_device_times(step, iters=5, warmup=2)
    total = sum(times.values())
    print(f"=== train step 480x640 bs2 ({platform}) — device total {total*1e3:.2f} ms ===")
    for k, v in bucket(times).items():
        print(f"  {v*1e3:8.3f} ms  [{k}]")
    print(top_ops(times, 45))


if __name__ == "__main__":
    main()
