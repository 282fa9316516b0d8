"""GeoWizard joint depth + surface-normal pipeline, TPU-native.

Capability parity: `DepthNormalEstimationPipeline`
(`/root/reference/GeoWizard/geowizard/models/geowizard_pipeline.py:89-344`): CLIP-vision
image conditioning, task-pair batch (latent duplicated for the depth and normal
branches), sin/cos geometric + domain switcher fed to the UNet's projection class
embedding, joint cross-task self-attention inside the UNet, trailing-DDIM denoise
with final `pred_original_sample`, depth = channel-mean / normal = unit-norm * (-1)
decoding, depth + spherical-normal ensembling, min-max depth postprocessing.

TPU-first: the device path is one jitted graph per (shape, steps, domain); the N
ensemble members run as a 2N task-paired batch ([depth-half; normal-half]) so the
joint attention is a static reshape, never a dynamic gather.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_e2e_ft_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from diffusion_e2e_ft_tpu.models import clip as clip_models
from diffusion_e2e_ft_tpu.ops import ensemble as ens
from diffusion_e2e_ft_tpu.ops import image as im
from diffusion_e2e_ft_tpu.ops import noise as noise_ops
from diffusion_e2e_ft_tpu.ops import scheduler as sched_ops

Array = jax.Array

DOMAINS = ("indoor", "outdoor", "object")


def domain_one_hot(domain: str) -> np.ndarray:
    if domain not in DOMAINS:
        raise ValueError(f"Unknown domain {domain!r}; expected one of {DOMAINS}")
    v = np.zeros((3,), np.float32)
    v[DOMAINS.index(domain)] = 1.0
    return v


def switcher_embedding(domain_vec, batch: int = 1) -> jnp.ndarray:
    """[2B, 10] class vector: sin/cos of the geometric one-hots ([0,1] depth branch,
    [1,0] normal branch) ++ sin/cos of the 3-dim domain one-hot."""
    geo = jnp.asarray([[0.0, 1.0], [1.0, 0.0]], jnp.float32)  # [depth; normal]
    geo_emb = jnp.concatenate([jnp.sin(geo), jnp.cos(geo)], axis=-1)  # [2, 4]
    geo_emb = jnp.repeat(geo_emb, batch, axis=0)  # [2B, 4]
    dom = jnp.asarray(domain_vec, jnp.float32).reshape(1, 3)
    dom_emb = jnp.concatenate([jnp.sin(dom), jnp.cos(dom)], axis=-1)  # [1, 6]
    dom_emb = jnp.broadcast_to(dom_emb, (2 * batch, 6))
    return jnp.concatenate([geo_emb, dom_emb], axis=-1)


@dataclasses.dataclass
class GeoWizardOutput:
    depth_np: Optional[np.ndarray] = None
    depth_colored: Optional[np.ndarray] = None
    normal_np: Optional[np.ndarray] = None
    normal_colored: Optional[np.ndarray] = None
    uncertainty: Optional[np.ndarray] = None


class GeoWizardPipeline:
    """Joint depth+normal prediction from a GeoWizard-family checkpoint."""

    latent_scale_factor = 0.18215

    def __init__(
        self,
        unet: UNet2DCondition,
        vae: AutoencoderKL,
        image_encoder: clip_models.CLIPVisionModelWithProjection,
        unet_params,
        vae_params,
        image_encoder_params,
        scheduler_config: sched_ops.SchedulerConfig,
        dtype=jnp.float32,
    ):
        self.dtype = jnp.dtype(dtype)
        dtype_name = self.dtype.name
        # propagate compute dtype into module configs (see MarigoldPipeline)
        import dataclasses as _dc

        if unet.config.dtype != dtype_name:
            unet = type(unet)(unet.config.replace(dtype=dtype_name))
        if vae.config.dtype != dtype_name:
            vae = type(vae)(_dc.replace(vae.config, dtype=dtype_name))
        if image_encoder.config.dtype != dtype_name:
            image_encoder = type(image_encoder)(
                _dc.replace(image_encoder.config, dtype=dtype_name)
            )
        self.unet = unet
        self.vae = vae
        self.image_encoder = image_encoder
        self.scheduler_config = scheduler_config
        self.schedule = sched_ops.make_schedule(scheduler_config)
        cast = lambda t: jax.tree.map(lambda x: jnp.asarray(x, self.dtype), t)
        self.params = {
            "unet": cast(unet_params),
            "vae": cast(vae_params),
            "image_encoder": cast(image_encoder_params),
        }
        self._mesh = None

    def with_mesh(self, mesh) -> "GeoWizardPipeline":
        """Multi-chip ensemble parallelism (see MarigoldPipeline.with_mesh). The
        task-pair axis stays inside each shard: sharding is over ensemble members."""
        from diffusion_e2e_ft_tpu.parallel import replicated

        self._mesh = mesh
        self.params = jax.device_put(self.params, replicated(mesh))
        return self

    @classmethod
    def from_hf_dir(cls, path: str, dtype=jnp.float32) -> "GeoWizardPipeline":
        from diffusion_e2e_ft_tpu.pipelines import loading

        return loading.load_geowizard_pipeline(path, dtype=dtype)

    @classmethod
    def from_random(
        cls,
        key: Optional[jax.Array] = None,
        unet_config: Optional[UNetConfig] = None,
        vae_config: Optional[VAEConfig] = None,
        vision_config: Optional[clip_models.CLIPVisionConfig] = None,
        scheduler_config: Optional[sched_ops.SchedulerConfig] = None,
        dtype=jnp.float32,
    ) -> "GeoWizardPipeline":
        key = key if key is not None else jax.random.key(0)
        ucfg = unet_config or UNetConfig.tiny(
            class_embed_proj_dim=10, joint_attention=True
        )
        vcfg = vae_config or VAEConfig(
            block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4
        )
        viscfg = vision_config or clip_models.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
            image_size=224, patch_size=32, projection_dim=ucfg.cross_attention_dim,
        )
        scfg = scheduler_config or sched_ops.SchedulerConfig(prediction_type="v_prediction")
        unet = UNet2DCondition(ucfg)
        vae = AutoencoderKL(vcfg)
        enc = clip_models.CLIPVisionModelWithProjection(viscfg)
        k1, k2, k3 = jax.random.split(key, 3)
        up = unet.init(
            k1, jnp.ones((2, 8, 8, ucfg.in_channels)), jnp.asarray(999),
            jnp.ones((2, 1, ucfg.cross_attention_dim)), jnp.ones((2, 10)),
        )["params"]
        vp = vae.init(k2, jnp.ones((1, 64, 64, 3)))["params"]
        ip = enc.init(k3, jnp.ones((1, viscfg.image_size, viscfg.image_size, 3)))["params"]
        return cls(unet, vae, enc, up, vp, ip, scfg, dtype=dtype)

    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _infer_jit(
        self, params, rgb: Array, num_steps: int, latent0: Array, domain_vec: Array
    ) -> Tuple[Array, Array]:
        """rgb [N,H,W,3] in [-1,1]; latent0 [N,h,w,4] -> (depth [N,H,W] in [0,1],
        normal [N,H,W,3] unit-norm, flipped to the GeoWizard convention).

        Ensemble members (N) map through the single-member graph (`lax.map`) on
        one chip: XLA's batched full-res conv+GN graphs cost ~1.8x per image at
        batch>=2 (PERF.md). The task PAIR inside each member stays batched — joint
        attention couples it — but its two full-res decodes are unrolled to
        batch-1 calls for the same reason. Mesh path stays batched for GSPMD."""
        n = rgb.shape[0]
        if n == 1 or self._mesh is not None:
            return self._infer_body(params, rgb, num_steps, latent0, domain_vec)

        def member(args):
            rgb_i, lat_i = args
            d, nm = self._infer_body(
                params, rgb_i[None], num_steps, lat_i[None], domain_vec
            )
            return d[0], nm[0]

        return jax.lax.map(member, (rgb, latent0))

    def _infer_body(
        self, params, rgb: Array, num_steps: int, latent0: Array, domain_vec: Array
    ) -> Tuple[Array, Array]:
        cfg = self.scheduler_config
        plan = sched_ops.make_plan(cfg, num_steps)
        ts = jnp.asarray(plan.timesteps)
        pts = jnp.asarray(plan.prev_timesteps)
        n = rgb.shape[0]

        rgb_latent = (
            self.vae.apply({"params": params["vae"]}, rgb.astype(self.dtype), method=self.vae.encode_mean)
            * self.latent_scale_factor
        )
        rgb_latent2 = jnp.concatenate([rgb_latent, rgb_latent], axis=0)  # [2N,...]

        # CLIP-vision conditioning on the [0,1] image
        pix = clip_models.clip_preprocess((rgb + 1.0) / 2.0)
        img_embed = self.image_encoder.apply(
            {"params": params["image_encoder"]}, pix
        )[:, None, :]  # [N, 1, D]
        img_embed2 = jnp.concatenate([img_embed, img_embed], axis=0).astype(self.dtype)

        class_vec = switcher_embedding(domain_vec, batch=n)  # [2N, 10]
        geo_latent = jnp.concatenate([latent0, latent0], axis=0).astype(self.dtype)

        def step(latent, t_pt):
            t, pt = t_pt
            unet_in = jnp.concatenate([rgb_latent2, latent], axis=-1)
            model_out = self.unet.apply(
                {"params": params["unet"]}, unet_in, t, img_embed2, class_vec
            )
            out = sched_ops.ddim_step(
                cfg, self.schedule, model_out.astype(jnp.float32), t, pt, latent
            )
            return out.prev_sample.astype(latent.dtype), out.pred_original_sample

        _, x0s = jax.lax.scan(step, geo_latent, (ts, pts))
        final = x0s[-1].astype(self.dtype) / self.latent_scale_factor

        if final.shape[0] == 2:
            # single member: batch-1 decodes dodge the batched-conv layout
            # regression at full resolution (see class docstring / PERF.md).
            # lax.map (not unrolling) compiles ONE decode body — the r2 trace
            # showed XLA lowering one of two unrolled copies with slow
            # conv-fusions (~11 ms) while the other got fast custom-calls.
            decoded = jax.lax.map(
                lambda z: self.vae.apply(
                    {"params": params["vae"]}, z[None], method=self.vae.decode
                )[0],
                final,
            ).astype(jnp.float32)
        else:
            decoded = self.vae.apply(
                {"params": params["vae"]}, final, method=self.vae.decode
            ).astype(jnp.float32)
        depth_dec, normal_dec = decoded[:n], decoded[n:]

        depth = jnp.clip(jnp.mean(depth_dec, axis=-1), -1.0, 1.0)
        depth = (depth + 1.0) / 2.0
        normal = normal_dec / (jnp.linalg.norm(normal_dec, axis=-1, keepdims=True) + 1e-5)
        normal = -normal
        return depth, normal

    # ------------------------------------------------------------------

    def __call__(
        self,
        image: np.ndarray,  # [H, W, 3] RGB
        denoising_steps: int = 1,
        ensemble_size: int = 1,
        processing_res: int = 768,
        match_input_res: bool = True,
        batch_size: int = 1,
        noise: str = "zeros",
        domain: str = "indoor",
        seed: Optional[int] = None,
        color_map: Optional[str] = "Spectral",
        ensemble_kwargs: Optional[dict] = None,
    ) -> GeoWizardOutput:
        if denoising_steps < 1 or ensemble_size < 1:
            raise ValueError("denoising_steps and ensemble_size must be >= 1")
        img = np.asarray(image)
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"Expected [H, W, 3] RGB image, got {img.shape}")
        orig_hw = img.shape[:2]

        rgb = jnp.asarray(img, jnp.float32)
        if processing_res > 0:
            rgb = im.resize_max_res(rgb, processing_res)
        rgb_norm = im.normalize_rgb(rgb)[None]

        h8, w8 = rgb_norm.shape[1] // 8, rgb_norm.shape[2] // 8
        dom = jnp.asarray(domain_one_hot(domain))
        key = jax.random.key(0 if seed is None else seed)
        batch_size = max(1, batch_size)

        depths, normals = [], []
        batch_rgb = jnp.broadcast_to(rgb_norm, (batch_size,) + rgb_norm.shape[1:])
        for start in range(0, ensemble_size, batch_size):
            nb = min(batch_size, ensemble_size - start)
            keys = jax.random.split(key, ensemble_size + 1)[1 + start : 1 + start + nb]
            lat = jnp.concatenate(
                [noise_ops.make_noise(noise, k, (1, h8, w8, 4), jnp.float32) for k in keys],
                axis=0,
            )
            if nb < batch_size:
                # pad the ragged tail to the compiled batch shape (one XLA graph
                # for any ensemble size); padded members are dropped below
                lat = jnp.concatenate(
                    [lat, jnp.broadcast_to(lat[-1:], (batch_size - nb,) + lat.shape[1:])],
                    axis=0,
                )
            rgb_in = batch_rgb
            if self._mesh is not None:
                from diffusion_e2e_ft_tpu.parallel import shard_batch

                rgb_in = shard_batch(rgb_in, self._mesh)
                lat = shard_batch(lat, self._mesh)
            d, nrm = self._infer_jit(self.params, rgb_in, denoising_steps, lat, dom)
            depths.append(np.asarray(d)[:nb])
            normals.append(np.asarray(nrm)[:nb])
        depth_preds = np.concatenate(depths, axis=0)
        normal_preds = np.concatenate(normals, axis=0)

        uncertainty = None
        if ensemble_size > 1:
            depth, uncertainty = ens.ensemble_depths(depth_preds, **(ensemble_kwargs or {}))
            normal = np.asarray(ens.ensemble_normals(jnp.asarray(normal_preds)))
        else:
            depth, normal = depth_preds[0], normal_preds[0]

        dmin, dmax = float(depth.min()), float(depth.max())
        depth = (depth - dmin) / max(dmax - dmin, 1e-8)

        if match_input_res and depth.shape != orig_hw:
            depth = np.asarray(
                im.resize(jnp.asarray(depth)[..., None], orig_hw, method="bicubic")
            )[..., 0]
            normal = np.asarray(im.resize(jnp.asarray(normal), orig_hw, method="nearest"))
        depth = depth.clip(0.0, 1.0)
        normal = normal.clip(-1.0, 1.0)

        depth_colored = None
        if color_map is not None:
            depth_colored = (im.colorize_depth(depth, 0, 1, cmap=color_map) * 255).astype(np.uint8)
        return GeoWizardOutput(
            depth_np=depth,
            depth_colored=depth_colored,
            normal_np=normal,
            normal_colored=im.colorize_normals(normal),
            uncertainty=uncertainty,
        )
