"""Full-size export -> reload -> activation-diff report (VERDICT r3 ask #10).

Without network access the published `GonzaloMG/*` checkpoints cannot be pulled, so
this is the strongest converter-correctness evidence producible offline: build a
FULL-SIZE SD2 pipeline (865M-param UNet, SD2 VAE, ViT-H text tower) with random
weights, export it through `export_hf_pipeline` (the trainer's final-save path,
reference layout `/root/reference/training/train.py:610-630`), reload it through
`load_marigold_pipeline` (the inference path), and require BIT-EXACT equality:

  - every UNet intermediate activation (tools/activation_diff over the full tower)
  - the VAE decode output
  - the empty-prompt text embedding recomputed from the exported text_encoder/
  - the end-to-end single-step depth output of the jitted pipeline graph

Any conversion defect — name mapping, transpose, dtype, scheduler field — shows up
as a nonzero max|delta| localized to a layer. Writes a markdown report.

Run:  python -m diffusion_e2e_ft_tpu.tools.export_roundtrip [--out PARITY_EXPORT_REPORT.md]
      (CPU, ~10 min: one full-size UNet forward per side at a small latent)
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time

import jax

# the container sitecustomize pins the axon TPU plugin; env vars cannot override
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
from diffusion_e2e_ft_tpu.models import clip as clip_models
from diffusion_e2e_ft_tpu.ops import scheduler as sched_ops
from diffusion_e2e_ft_tpu.pipelines import loading
from diffusion_e2e_ft_tpu.pipelines.marigold import MarigoldPipeline
from diffusion_e2e_ft_tpu.tools import activation_diff as AD
from diffusion_e2e_ft_tpu.training.checkpoints import export_hf_pipeline


def build_full_size(seed: int = 0) -> MarigoldPipeline:
    return MarigoldPipeline.from_random(
        jax.random.key(seed),
        unet_config=UNetConfig(),  # full SD2, 8-ch input
        vae_config=VAEConfig(),
        scheduler_config=sched_ops.SchedulerConfig(),
    )


def run(out_path: str, image_hw=(192, 256)) -> int:
    t0 = time.time()
    rows = []
    pipe = build_full_size()
    n_unet = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(pipe.params["unet"]))

    # random full-size text tower: exercises the CLIP converter + the
    # empty-prompt embedding recompute on reload
    tcfg = clip_models.CLIPTextConfig()  # SD2 ViT-H text defaults
    tmodel = clip_models.CLIPTextModel(tcfg)
    tparams = tmodel.init(jax.random.key(3), clip_models.empty_prompt_ids())["params"]
    empty = np.asarray(tmodel.apply({"params": tparams}, clip_models.empty_prompt_ids()))
    pipe = MarigoldPipeline(
        pipe.unet, pipe.vae, pipe.params["unet"], pipe.params["vae"],
        pipe.scheduler_config, empty,
    )

    with tempfile.TemporaryDirectory() as td:
        out_dir = os.path.join(td, "export")
        export_hf_pipeline(
            out_dir, pipe.unet.config, pipe.params["unet"], pipe.vae.config,
            pipe.params["vae"], pipe.scheduler_config,
        )
        loading.save_text_encoder(os.path.join(out_dir, "text_encoder"), tcfg, tparams)
        size_mb = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(out_dir) for f in fs
        ) / 2**20
        pipe2 = MarigoldPipeline.from_hf_dir(out_dir)

    h, w = image_hw
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32))
    latent = jnp.asarray(rng.normal(size=(1, h // 8, w // 8, 4)).astype(np.float32))
    t = jnp.asarray([999], jnp.int32)
    ctx_a = jnp.asarray(pipe.params["empty_text_embed"], jnp.float32)
    ctx_b = jnp.asarray(pipe2.params["empty_text_embed"], jnp.float32)
    unet_in = jnp.concatenate([latent, latent], axis=-1)

    # 1. empty-text embedding recomputed from the exported tower
    d_embed = float(np.max(np.abs(np.asarray(ctx_a) - np.asarray(ctx_b))))
    rows.append(("empty-prompt text embedding (recomputed on load)", d_embed))

    # 2. every UNet intermediate
    _, acts_a = AD.capture_intermediates(
        pipe.unet, {"params": pipe.params["unet"]}, unet_in, t, ctx_a
    )
    _, acts_b = AD.capture_intermediates(
        pipe2.unet, {"params": pipe2.params["unet"]}, unet_in, t, ctx_b
    )
    diffs = AD.diff(acts_a, acts_b, atol=0.0, rtol=0.0)
    # Structural rows (only_in / shape mismatch) carry no max_abs_err; treating
    # them as zero would let a DROPPED or renamed layer still print "ZERO-DIFF"
    # (ADVICE r4). Any such row is itself a divergence.
    structural = [r for r in diffs if "max_abs_err" not in r]
    worst = max((r["max_abs_err"] for r in diffs if "max_abs_err" in r), default=0.0)
    if structural:
        worst = float("inf")
        rows.append((f"STRUCTURAL MISMATCH: {len(structural)} rows "
                     f"(e.g. {structural[0]})", float("inf")))
    rows.append((f"UNet intermediates ({len(diffs)} tensors, worst layer)", float(worst)))

    # 3. VAE decode
    va = pipe.vae.apply({"params": pipe.params["vae"]}, latent, method=pipe.vae.decode)
    vb = pipe2.vae.apply({"params": pipe2.params["vae"]}, latent, method=pipe2.vae.decode)
    rows.append(("VAE decode output", float(np.max(np.abs(np.asarray(va) - np.asarray(vb))))))

    # 4. end-to-end jitted single-step depth
    ea = np.asarray(pipe._infer_jit(pipe.params, rgb, 1, False, jnp.zeros_like(latent)))
    eb = np.asarray(pipe2._infer_jit(pipe2.params, rgb, 1, False, jnp.zeros_like(latent)))
    rows.append(("end-to-end single-step depth (jitted pipeline)", float(np.max(np.abs(ea - eb)))))

    ok = all(d == 0.0 for _, d in rows)
    lines = [
        "# Export round-trip activation-diff report (full-size SD2)",
        "",
        f"Generated by `python -m diffusion_e2e_ft_tpu.tools.export_roundtrip` "
        f"in {time.time() - t0:.0f}s on CPU.",
        "",
        f"Pipeline: {n_unet / 1e6:.0f}M-param SD2 UNet (8-ch), SD2 VAE, ViT-H text "
        f"tower (random weights); exported {size_mb:.0f} MB HF-layout directory via "
        "`export_hf_pipeline` (trailing-spacing scheduler baked in), reloaded via "
        f"`load_marigold_pipeline`; probe input {image_hw[0]}x{image_hw[1]}.",
        "",
        "| comparison | max abs delta |",
        "|---|---|",
        *[f"| {name} | {d:.1e} |" for name, d in rows],
        "",
        f"**Verdict: {'ZERO-DIFF round trip' if ok else 'DIVERGENCE FOUND'}** — "
        + ("the HF export/load converter is bit-exact end to end."
           if ok else "see rows above; localize with tools/activation_diff."),
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_EXPORT_REPORT.md")
    args = ap.parse_args()
    raise SystemExit(run(args.out))


if __name__ == "__main__":
    main()
