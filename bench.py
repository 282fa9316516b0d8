"""Benchmark on one TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Default configuration (the driver's headline): 768x768 single-step depth through the
full jitted device path (VAE encode -> SD2 UNet @ t=999 -> trailing-DDIM x0 -> VAE
decode -> depth postproc), bf16 compute — the reference does 121 ms / 576x768 image
on an RTX 4090 (`/root/reference/README.md:147-158`).

E2EFT_BENCH=geowizard measures the joint depth+normal pipeline (reference: 254 ms);
E2EFT_BENCH=train measures E2E fine-tuning step throughput.
"""

from __future__ import annotations

import json
import os
import time

BASELINE = {
    "depth": 1000.0 / 121.0,  # img/s, RTX 4090 single-task
    "geowizard": 1000.0 / 254.0,  # img/s, RTX 4090 joint
    "train": 1.0,  # no published reference number; vs_baseline reports raw img/s
}


def _sync(x):
    """True device sync: fetch ONE element via a device-side slice.

    Through the axon dev-tunnel `block_until_ready` can ack EARLY (a 4096^3
    bf16 matmul 'measured' 6464 TFLOP/s on a 197 TFLOP/s chip, PERF.md r4);
    a data-dependent scalar fetch is a real barrier in both environments.
    The device-side index keeps the fetch at 4 bytes — np.asarray(x) would
    pull the whole buffer through the ~50 MB/s tunnel."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf[(0,) * leaf.ndim]).ravel()[0])


def _timeit(fn, iters=10, warmup=3):
    out = fn()
    _sync(out)
    for _ in range(warmup):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    _sync(out)  # measure the dispatch->fetch roundtrip constant on a ready value
    roundtrip = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return max((time.perf_counter() - t0 - roundtrip) / iters, 1e-9)


def _resolution():
    """E2EFT_RES=HxW overrides the benchmark resolution (e.g. 576x768 for the
    reference's exact single-image config; default 768x768 — a HARDER config
    than the 4090 baseline's, so vs_baseline is conservative)."""
    spec = os.environ.get("E2EFT_RES", "768x768")
    h, w = (int(v) for v in spec.lower().split("x"))
    return h, w


def bench_depth():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
    from diffusion_e2e_ft_tpu.ops import scheduler as S
    from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

    h, w = _resolution()
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    # E2EFT_BENCH_FUSED=1 A/Bs the fused gn_conv VAE in the inference pipeline
    # (pair with E2EFT_GNCONV_IMPL to select the kernel generation);
    # E2EFT_BENCH_SUBPIX=1 A/Bs the sub-pixel decoder upsamplers
    fused = os.environ.get("E2EFT_BENCH_FUSED") == "1"
    subpix = os.environ.get("E2EFT_BENCH_SUBPIX") == "1"
    pipe = MarigoldPipeline.from_random(
        jax.random.key(0),
        unet_config=UNetConfig(),
        vae_config=VAEConfig(fused_gn_conv=fused, subpixel_upsample=subpix),
        scheduler_config=S.SchedulerConfig(),
        dtype=dtype,
    )
    rgb = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    )
    latent0 = jnp.zeros((1, h // 8, w // 8, 4), jnp.float32)
    dt = _timeit(lambda: pipe._infer_jit(pipe.params, rgb, 1, False, latent0))
    return {
        "metric": f"{h}x{w} single-step depth inference, 1 chip ({platform})",
        "value": round(1.0 / dt, 3),
        "unit": "img/s",
        "vs_baseline": round((1.0 / dt) / BASELINE["depth"], 3),
    }


def bench_geowizard():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
    from diffusion_e2e_ft_tpu.models.clip import CLIPVisionConfig
    from diffusion_e2e_ft_tpu.ops import scheduler as S
    from diffusion_e2e_ft_tpu.pipelines import GeoWizardPipeline
    from diffusion_e2e_ft_tpu.pipelines.geowizard import domain_one_hot

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    fused = os.environ.get("E2EFT_BENCH_FUSED") == "1"
    subpix = os.environ.get("E2EFT_BENCH_SUBPIX") == "1"
    pipe = GeoWizardPipeline.from_random(
        jax.random.key(0),
        unet_config=UNetConfig.geowizard(),
        vae_config=VAEConfig(fused_gn_conv=fused, subpixel_upsample=subpix),
        vision_config=CLIPVisionConfig(),  # full CLIP ViT-L/14
        scheduler_config=S.SchedulerConfig(prediction_type="v_prediction"),
        dtype=dtype,
    )
    h, w = _resolution()
    rgb = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    )
    latent0 = jnp.zeros((1, h // 8, w // 8, 4), jnp.float32)
    dom = jnp.asarray(domain_one_hot("indoor"))
    dt = _timeit(lambda: pipe._infer_jit(pipe.params, rgb, 1, latent0, dom)[0])
    return {
        "metric": f"{h}x{w} single-step joint depth+normals (GeoWizard), 1 chip ({platform})",
        "value": round(1.0 / dt, 3),
        "unit": "img/s",
        "vs_baseline": round((1.0 / dt) / BASELINE["geowizard"], 3),
    }


def bench_train(res=480, width=640, batch=2, **cfg_overrides):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_e2e_ft_tpu.models import (
        AutoencoderKL,
        UNet2DCondition,
        UNetConfig,
        VAEConfig,
    )
    from diffusion_e2e_ft_tpu.training import E2ETrainer, TrainConfig

    platform = jax.devices()[0].platform
    dtype = "bfloat16" if platform == "tpu" else "float32"
    unet = UNet2DCondition(UNetConfig(dtype=dtype))
    # The frozen-VAE decode (fwd + VJP at image resolution) is the r4-named
    # train-step sink; both levers are exact-math / identical-param-tree, so
    # they apply to training unchanged: E2EFT_TRAIN_SUBPIX=1 (sub-pixel decoder
    # upsamplers, 2.25x fewer conv FLOPs), E2EFT_TRAIN_FUSED=1 (+GNCONV_IMPL)
    vae = AutoencoderKL(VAEConfig(
        dtype=dtype,
        fused_gn_conv=os.environ.get("E2EFT_TRAIN_FUSED") == "1",
        subpixel_upsample=os.environ.get("E2EFT_TRAIN_SUBPIX") == "1",
    ))
    rng = np.random.default_rng(0)
    up = jax.jit(unet.init)(
        jax.random.key(0), jnp.ones((1, 8, 8, 8)), jnp.asarray([999]), jnp.ones((1, 2, 1024))
    )["params"]
    vp = jax.jit(vae.init)(jax.random.key(1), jnp.ones((1, 64, 64, 3)))["params"]
    # sweep knobs (one case per process — PERF.md: in-process case accumulation
    # flips OOM verdicts): E2EFT_TRAIN_MU=bfloat16 (Adam m dtype),
    # E2EFT_TRAIN_REMAT=dots|dots_all (UNet remat policy), E2EFT_TRAIN_VAEDC=1
    # (remat the frozen-VAE decode)
    if os.environ.get("E2EFT_TRAIN_MU"):
        cfg_overrides.setdefault("adam_mu_dtype", os.environ["E2EFT_TRAIN_MU"])
    if os.environ.get("E2EFT_TRAIN_REMAT"):
        cfg_overrides.setdefault("remat_policy", os.environ["E2EFT_TRAIN_REMAT"])
    if os.environ.get("E2EFT_TRAIN_VAEDC"):
        cfg_overrides.setdefault("vae_decode_checkpoint", True)
    cfg = TrainConfig(
        gradient_accumulation_steps=1, gradient_checkpointing=True, **cfg_overrides
    )
    trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 1024), np.float32))
    state = trainer.init_state(up)
    batch_data = {
        "rgb": jnp.asarray(rng.uniform(-1, 1, (batch, res, width, 3)).astype(np.float32)),
        "target": jnp.asarray(rng.uniform(-1, 1, (batch, res, width)).astype(np.float32)),
        "val_mask": jnp.ones((batch, res, width), bool),
    }

    state_box = [state]
    key = jax.random.key(0)

    def step():
        s, m = trainer.train_step(state_box[0], dict(batch_data), key)
        state_box[0] = s
        return m["loss"]

    dt = _timeit(step, iters=5, warmup=2)
    return {
        "metric": f"E2E fine-tune step {res}x{width} bs={batch}, 1 chip ({platform})",
        "value": round(batch / dt, 3),
        "unit": "img/s",
        "vs_baseline": round(batch / dt, 3),
    }


def main():
    import jax

    # persistent compile cache: works through the axon tunnel and turns the
    # ~10-minute first compile of the full pipeline into seconds on repeat runs
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    which = os.environ.get("E2EFT_BENCH", "depth")
    fn = {"depth": bench_depth, "geowizard": bench_geowizard, "train": bench_train}[which]
    print(json.dumps(fn()))


if __name__ == "__main__":
    main()
