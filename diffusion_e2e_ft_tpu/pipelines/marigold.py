"""Marigold-style depth / surface-normal inference pipeline, TPU-native.

Capability parity: `MarigoldPipeline.__call__` / `single_infer`
(`/root/reference/Marigold/marigold/marigold_pipeline.py:158-353,372-478`): max-edge
resize, [-1,1] normalization, per-ensemble batched denoising with zeros/gaussian/
pyramid initial latents, trailing-DDIM steps taking `pred_original_sample` on the last
iteration, channel-mean depth / unit-norm normal decoding, ensembling, min-max or
unit-norm postprocessing, resize back, colorization.

TPU-first design: the entire device path (encode -> lax.scan over the K-step plan ->
decode -> task postproc) is ONE jitted function specialized per (shape, steps, task);
steps=1 with zeros noise — the production configuration — therefore compiles to a
single feed-forward XLA graph with no host round-trips.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_e2e_ft_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from diffusion_e2e_ft_tpu.ops import ensemble as ens
from diffusion_e2e_ft_tpu.ops import image as im
from diffusion_e2e_ft_tpu.ops import noise as noise_ops
from diffusion_e2e_ft_tpu.ops import scheduler as sched_ops

Array = jax.Array


@dataclasses.dataclass
class MarigoldOutput:
    """Matches the reference's output fields (depth in [0,1]; normals in [-1,1])."""

    depth_np: Optional[np.ndarray] = None
    depth_colored: Optional[np.ndarray] = None
    uncertainty: Optional[np.ndarray] = None
    normal_np: Optional[np.ndarray] = None
    normal_colored: Optional[np.ndarray] = None


class MarigoldPipeline:
    """Depth/normal prediction from an E2E-FT (or diffusion) SD2-family checkpoint.

    Construct via `from_hf_dir` (published checkpoints) or `from_random` (tests).
    """

    latent_scale_factor = 0.18215

    def __init__(
        self,
        unet: UNet2DCondition,
        vae: AutoencoderKL,
        unet_params,
        vae_params,
        scheduler_config: sched_ops.SchedulerConfig,
        empty_text_embed: np.ndarray,  # [1, L, cross_attention_dim]
        dtype=jnp.float32,
        scheduler_type: str = "ddim",  # ddim | ddpm (identical for 1-step x0 output)
    ):
        self.scheduler_type = scheduler_type
        self.dtype = jnp.dtype(dtype)
        # propagate the compute dtype into the module configs: params in bf16 with
        # fp32 module dtype would silently run fp32 matmuls (8x slower on the MXU)
        dtype_name = self.dtype.name
        if unet.config.dtype != dtype_name:
            unet = type(unet)(unet.config.replace(dtype=dtype_name))
        if vae.config.dtype != dtype_name:
            import dataclasses as _dc

            vae = type(vae)(_dc.replace(vae.config, dtype=dtype_name))
        self.unet = unet
        self.vae = vae
        self.scheduler_config = scheduler_config
        self.schedule = sched_ops.make_schedule(scheduler_config)
        self.params = {
            "unet": jax.tree.map(lambda x: jnp.asarray(x, self.dtype), unet_params),
            "vae": jax.tree.map(lambda x: jnp.asarray(x, self.dtype), vae_params),
            "empty_text_embed": jnp.asarray(empty_text_embed, self.dtype),
        }
        self._mesh = None

    def with_mesh(self, mesh) -> "MarigoldPipeline":
        """Enable multi-chip ensemble/batch parallelism: params replicate over the
        mesh, ensemble members shard over its 'data' axis (GSPMD handles the rest).
        Batch sizes should be multiples of the data-axis size."""
        from diffusion_e2e_ft_tpu.parallel import replicated

        self._mesh = mesh
        self.params = jax.device_put(self.params, replicated(mesh))
        return self

    def _place_batch(self, *arrays):
        if self._mesh is None:
            return arrays
        from diffusion_e2e_ft_tpu.parallel import shard_batch

        return tuple(shard_batch(a, self._mesh) for a in arrays)

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @classmethod
    def from_hf_dir(cls, path: str, dtype=jnp.float32, **kw) -> "MarigoldPipeline":
        from diffusion_e2e_ft_tpu.pipelines import loading

        return loading.load_marigold_pipeline(path, dtype=dtype, **kw)

    @classmethod
    def from_random(
        cls,
        key: Optional[jax.Array] = None,
        unet_config: Optional[UNetConfig] = None,
        vae_config: Optional[VAEConfig] = None,
        scheduler_config: Optional[sched_ops.SchedulerConfig] = None,
        dtype=jnp.float32,
        scheduler_type: str = "ddim",
    ) -> "MarigoldPipeline":
        """Random-weight pipeline (tiny by default) for tests and benchmarks."""
        key = key if key is not None else jax.random.key(0)
        ucfg = unet_config or UNetConfig.tiny()
        vcfg = vae_config or VAEConfig(
            block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4
        )
        scfg = scheduler_config or sched_ops.SchedulerConfig()
        unet = UNet2DCondition(ucfg)
        vae = AutoencoderKL(vcfg)
        k1, k2 = jax.random.split(key)
        unet_params = unet.init(
            k1,
            jnp.ones((1, 8, 8, ucfg.in_channels)),
            jnp.asarray(999),
            jnp.ones((1, 2, ucfg.cross_attention_dim)),
        )["params"]
        vae_params = vae.init(k2, jnp.ones((1, 64, 64, vcfg.in_channels)))["params"]
        empty = np.zeros((1, 2, ucfg.cross_attention_dim), np.float32)
        return cls(
            unet, vae, unet_params, vae_params, scfg, empty, dtype=dtype,
            scheduler_type=scheduler_type,
        )

    # ------------------------------------------------------------------
    # Jitted device path
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _infer_jit(
        self, params, rgb: Array, num_steps: int, normals: bool, latent0: Array,
        key: Optional[jax.Array] = None,
    ) -> Array:
        """rgb [B,H,W,3] in [-1,1]; latent0 [B,h,w,4] -> depth [B,H,W] in [0,1] or
        normals [B,H,W,3] unit-norm. `key` drives DDPM ancestral noise (multi-step
        ddpm only; single-step output is the x0 estimate either way).

        Batched members run through the batch-1 graph via `lax.map`: XLA's
        layout/fusion choices for batch>=2 full-resolution conv+GN graphs
        materialize fp32 intermediates and layout copies that cost ~1.8x per image
        (measured 104 -> 189 ms/img at 768px; see PERF.md round-2 trace notes),
        while the mapped batch-1 body stays flat AND compiles once for any batch.
        The mesh path stays batched so GSPMD can split members across devices."""
        b = rgb.shape[0]
        key = key if key is not None else jax.random.key(0)
        if b == 1 or self._mesh is not None:
            return self._infer_body(params, rgb, num_steps, normals, latent0, key)

        def member(args):
            rgb_i, lat_i, idx = args
            return self._infer_body(
                params, rgb_i[None], num_steps, normals, lat_i[None],
                jax.random.fold_in(key, idx),
            )[0]

        return jax.lax.map(member, (rgb, latent0, jnp.arange(b)))

    def _infer_body(
        self, params, rgb: Array, num_steps: int, normals: bool, latent0: Array,
        key: jax.Array,
    ) -> Array:
        cfg = self.scheduler_config
        use_lcm = self.scheduler_type == "lcm"
        plan = (
            sched_ops.make_lcm_plan(cfg, num_steps)
            if use_lcm
            else sched_ops.make_plan(cfg, num_steps)
        )
        ts = jnp.asarray(plan.timesteps)
        pts = jnp.asarray(plan.prev_timesteps)
        is_last = jnp.arange(num_steps) == (num_steps - 1)
        use_ddpm = self.scheduler_type == "ddpm" and num_steps > 1
        step_keys = jax.random.split(key, num_steps)

        rgb_latent = (
            self.vae.apply({"params": params["vae"]}, rgb.astype(self.dtype), method=self.vae.encode_mean)
            * self.latent_scale_factor
        )
        b = rgb.shape[0]
        context = jnp.broadcast_to(
            params["empty_text_embed"][0][None],
            (b,) + params["empty_text_embed"].shape[1:],
        )

        def step(latent, scan_in):
            t, pt, il, k = scan_in
            unet_in = jnp.concatenate([rgb_latent, latent], axis=-1)
            model_out = self.unet.apply({"params": params["unet"]}, unet_in, t, context)
            if use_lcm:
                out = sched_ops.lcm_step(
                    cfg, self.schedule, model_out.astype(jnp.float32), t, pt, latent,
                    key=k, is_last=il,
                )
            elif use_ddpm:
                out = sched_ops.ddpm_step(
                    cfg, self.schedule, model_out.astype(jnp.float32), t, pt, latent, key=k
                )
            else:
                out = sched_ops.ddim_step(
                    cfg, self.schedule, model_out.astype(jnp.float32), t, pt, latent
                )
            return out.prev_sample.astype(latent.dtype), out.pred_original_sample

        (_, x0s) = jax.lax.scan(step, latent0.astype(self.dtype), (ts, pts, is_last, step_keys))
        final_latent = x0s[-1]

        decoded = self.vae.apply(
            {"params": params["vae"]},
            final_latent.astype(self.dtype) / self.latent_scale_factor,
            method=self.vae.decode,
        ).astype(jnp.float32)
        if normals:
            n = decoded / (jnp.linalg.norm(decoded, axis=-1, keepdims=True) + 1e-5)
            return n
        depth = jnp.clip(jnp.mean(decoded, axis=-1), -1.0, 1.0)
        return (depth + 1.0) / 2.0

    # ------------------------------------------------------------------
    # Host orchestration
    # ------------------------------------------------------------------

    def __call__(
        self,
        image: np.ndarray,  # [H, W, 3] uint8/float RGB
        denoising_steps: int = 1,
        ensemble_size: int = 1,
        processing_res: int = 768,
        match_input_res: bool = True,
        resample_method: str = "bilinear",
        batch_size: int = 0,
        noise: str = "zeros",
        normals: bool = False,
        seed: Optional[int] = None,
        color_map: Optional[str] = "Spectral",
        ensemble_kwargs: Optional[dict] = None,
    ) -> MarigoldOutput:
        if denoising_steps < 1:
            raise ValueError("denoising_steps must be >= 1")
        if ensemble_size < 1:
            raise ValueError("ensemble_size must be >= 1")

        img = np.asarray(image)
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"Expected [H, W, 3] RGB image, got {img.shape}")
        orig_hw = img.shape[:2]

        rgb = jnp.asarray(img, jnp.float32)
        if processing_res > 0:
            rgb = im.resize_max_res(rgb, processing_res, method=resample_method)
        rgb_norm = im.normalize_rgb(rgb)[None]  # [1, H, W, 3]

        h8, w8 = rgb_norm.shape[1] // 8, rgb_norm.shape[2] // 8
        latent_shape = (1, h8, w8, 4)

        key = jax.random.key(0 if seed is None else seed)
        if batch_size < 1:
            batch_size = self.find_batch_size(ensemble_size, max(rgb_norm.shape[1:3]))

        preds = []
        batch_rgb = jnp.broadcast_to(rgb_norm, (batch_size,) + rgb_norm.shape[1:])
        for start in range(0, ensemble_size, batch_size):
            n = min(batch_size, ensemble_size - start)
            keys = jax.random.split(key, ensemble_size + 1)[1 + start : 1 + start + n]
            latents = jnp.concatenate(
                [noise_ops.make_noise(noise, k, latent_shape, jnp.float32) for k in keys], axis=0
            )
            if n < batch_size:
                # pad the ragged tail to the compiled batch shape (one XLA graph
                # for any ensemble size); padded members are dropped below
                latents = jnp.concatenate(
                    [latents, jnp.broadcast_to(latents[-1:], (batch_size - n,) + latents.shape[1:])],
                    axis=0,
                )
            rgb_in, latents = self._place_batch(batch_rgb, latents)
            out = self._infer_jit(
                self.params, rgb_in, denoising_steps, normals, latents,
                jax.random.fold_in(key, start),
            )
            preds.append(np.asarray(out)[:n])
        preds = np.concatenate(preds, axis=0)  # [E, H, W(, 3)]

        uncertainty = None
        if normals:
            if ensemble_size > 1:
                normal = np.asarray(ens.ensemble_normals(jnp.asarray(preds)))
            else:
                normal = preds[0]
            normal = normal / (np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-5)
            if match_input_res and normal.shape[:2] != orig_hw:
                normal = np.asarray(im.resize(jnp.asarray(normal), orig_hw, method=resample_method))
                normal = normal / (np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-5)
            normal = np.clip(normal, -1.0, 1.0)
            colored = im.colorize_normals(normal) if color_map is not None else None
            return MarigoldOutput(normal_np=normal, normal_colored=colored)

        if ensemble_size > 1:
            depth, uncertainty = ens.ensemble_depths(preds, **(ensemble_kwargs or {}))
        else:
            depth = preds[0]
        # min-max rescale to [0, 1]
        dmin, dmax = float(depth.min()), float(depth.max())
        depth = (depth - dmin) / max(dmax - dmin, 1e-8)
        if match_input_res and depth.shape != orig_hw:
            depth = np.asarray(
                im.resize(jnp.asarray(depth)[..., None], orig_hw, method=resample_method)
            )[..., 0]
        depth = np.clip(depth, 0.0, 1.0)
        colored = None
        if color_map is not None:
            colored = (im.colorize_depth(depth, 0.0, 1.0, cmap=color_map) * 255).astype(np.uint8)
        return MarigoldOutput(depth_np=depth, depth_colored=colored, uncertainty=uncertainty)

    @staticmethod
    def find_batch_size(ensemble_size: int, max_res: int) -> int:
        """TPU v5e (16 GB HBM) ensemble batching table — the reference's VRAM lookup
        (`/root/reference/Marigold/marigold/util/batchsize.py:26-81`) re-derived for
        one chip and MEASURED on-chip (`perf/batch_latency_sweep.py`, r5
        `perf/logs/batch_sweep.log`): per-image device time is FLAT in batch at
        every resolution (512: 37.7/37.6 ms at bs 4/8; 768: 93.0 ms at bs 2-4;
        1024: 181/179 ms at bs 1/2) because ensemble members run through the
        batch-1 graph under `lax.map` — the table therefore only caps HBM, and
        every row below fits."""
        if max_res <= 512:
            bs = 8
        elif max_res <= 768:
            bs = 4
        else:
            bs = 2
        return max(1, min(bs, ensemble_size))
