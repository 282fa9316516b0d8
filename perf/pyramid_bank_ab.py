"""A/B study: in-jit pyramid-noise schedule BANK vs the reference's continuous draw.

The reference redraws the pyramid octave scale schedule from host randomness every
step (r ~ U[2,4] per octave, `/root/reference/training/util/noise.py:8-18`). Our
jitted train step cannot host-randomize, so it pre-draws a BANK of 16 schedules and
lax.switches between them per step (`training/trainer.py::_make_noisy_latents`).
This script answers VERDICT r3 weak #7: is bank=16 training-equivalent to the
continuous draw, or does the schedule quantization bias the loss trajectory?

Method: tiny UNet+VAE, pyramid-noise depth E2E config, fixed synthetic dataset.
Arm A = stock trainer (bank=16, in-jit switch). Arm B = identical trainer whose
noisy latents are computed HOST-side per step by `ops/noise.py::pyramid` — which
draws a fresh continuous schedule from the step key, i.e. exactly the reference's
semantics. N seeds per arm; the test statistic is the mean loss over the final
quarter of training, compared against the seed-to-seed spread WITHIN each arm.
Equivalence = |mean_A - mean_B| < 1 pooled std.

Run on CPU:  python perf/pyramid_bank_ab.py [--steps 300] [--seeds 3]
Writes a markdown table to stdout (paste into PERF.md).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the container sitecustomize pins the axon TPU plugin; env vars cannot override
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from diffusion_e2e_ft_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from diffusion_e2e_ft_tpu.ops import noise as noise_ops
from diffusion_e2e_ft_tpu.training import E2ETrainer, TrainConfig


class HostNoiseTrainer(E2ETrainer):
    """Arm B: per-step continuous pyramid noise computed host-side and threaded
    through the batch (reference semantics, not jit-compatible in production)."""

    def _make_noisy_latents(self, key, shape, timesteps=None):
        return self._host_noisy  # set per step before train_step

    def _loss(self, unet_params, frozen, batch, key):
        self._host_noisy = batch["noisy"]
        return super()._loss(unet_params, frozen, batch, key)


def make_batch(rng, b, h, w):
    # a LEARNABLE synthetic task (target = smooth function of rgb) so the loss
    # actually descends and schedule-quantization bias would show as a
    # trajectory gap; pure-random targets plateau at the SSI floor immediately
    rgb = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25.0
    tgt = rgb.mean(-1)
    from scipy.signal import convolve2d

    tgt = np.stack([convolve2d(t, k, mode="same", boundary="symm") for t in tgt])
    return {
        "rgb": jnp.asarray(rgb),
        "target": jnp.asarray(tgt.astype(np.float32)),
        "val_mask": jnp.ones((b, h, w), bool),
    }


def run_arm(arm: str, seed: int, steps: int, h=64, w=64, b=2, n_batches=8):
    ucfg = UNetConfig.tiny()
    vcfg = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4)
    unet, vae = UNet2DCondition(ucfg), AutoencoderKL(vcfg)
    up = unet.init(jax.random.key(seed), jnp.ones((1, h // 8, w // 8, 8)),
                   jnp.asarray(999), jnp.ones((1, 2, 32)))["params"]
    vp = vae.init(jax.random.key(100 + seed), jnp.ones((1, h, w, 3)))["params"]
    cfg = TrainConfig(
        noise_type="pyramid", gradient_accumulation_steps=1,
        gradient_checkpointing=False, learning_rate=3e-4, seed=seed,
    )
    cls = HostNoiseTrainer if arm == "continuous" else E2ETrainer
    trainer = cls(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
    state = trainer.init_state(up)

    data_rng = np.random.default_rng(7)  # SAME data across arms and seeds
    batches = [make_batch(data_rng, b, h, w) for _ in range(n_batches)]
    noise_keys = jax.random.split(jax.random.key(1000 + seed), steps)

    losses = []
    for i in range(steps):
        batch = dict(batches[i % n_batches])
        if arm == "continuous":
            batch["noisy"] = noise_ops.pyramid(
                noise_keys[i], (b, h // 8, w // 8, 4), base=2.0, spread=2.0
            )
        state, m = trainer.train_step(state, batch, noise_keys[i])
        losses.append(float(m["loss"]))
    return np.asarray(losses)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    tail = slice(-max(args.steps // 4, 10), None)
    results = {}
    for arm in ("bank16", "continuous"):
        finals = []
        for s in range(args.seeds):
            losses = run_arm(arm, s, args.steps)
            finals.append(float(losses[tail].mean()))
            print(f"  {arm} seed {s}: first10={losses[:10].mean():.6f} "
                  f"final-quarter={finals[-1]:.6f}", flush=True)
        results[arm] = np.asarray(finals)

    a, b = results["bank16"], results["continuous"]
    pooled = float(np.sqrt((a.std(ddof=1) ** 2 + b.std(ddof=1) ** 2) / 2))
    delta = float(abs(a.mean() - b.mean()))
    print("\n| arm | final-quarter loss (mean ± std over seeds) |")
    print("|---|---|")
    print(f"| bank=16 (in-jit switch) | {a.mean():.6f} ± {a.std(ddof=1):.6f} |")
    print(f"| continuous (reference semantics) | {b.mean():.6f} ± {b.std(ddof=1):.6f} |")
    print(f"\n|mean delta| = {delta:.6f}, pooled seed std = {pooled:.6f} -> "
          f"{'EQUIVALENT within noise' if delta <= max(pooled, 1e-6) else 'NOT equivalent — enlarge the bank'}")


if __name__ == "__main__":
    main()
