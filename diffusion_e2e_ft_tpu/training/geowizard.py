"""GeoWizard joint depth+normal E2E fine-tuning.

Capability parity: `/root/reference/GeoWizard/geowizard/training/train_depth_normal.py:298-875`:
CLIP-vision image conditioning, task-pair batch with joint attention, sin/cos
geometric+domain switcher to the projection class embedding (10x LR group handled by
the base optimizer), t=999 + zeros/pyramid/gaussian noise, x0 recovery, frozen-VAE
decode, combined loss 0.5*SSI(depth) + 1.0*angular(normal) with per-loss metrics,
normals flipped to the GeoWizard convention (x -1), latent-space validity via 8x
max-pool of the invalid mask, optional standard diffusion-loss mode, optional EMA.

Batch leaves: rgb [B,H,W,3] in [-1,1]; depth_target [B,H,W]; normal_target
[B,H,W,3] (standard convention — flipped internally); val_mask [B,H,W] bool;
domain [3] one-hot (per-batch, like the reference's per-batch domain).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_e2e_ft_tpu.models import AutoencoderKL, UNet2DCondition
from diffusion_e2e_ft_tpu.models import clip as clip_models
from diffusion_e2e_ft_tpu.ops import losses as L
from diffusion_e2e_ft_tpu.ops import scheduler as sched_ops
from diffusion_e2e_ft_tpu.pipelines.geowizard import switcher_embedding
from diffusion_e2e_ft_tpu.training.config import TrainConfig
from diffusion_e2e_ft_tpu.training.trainer import E2ETrainer, materialize_frozen

Array = jax.Array


def latent_valid_mask(val_mask: Array) -> Array:
    """8x max-pool of the INVALID mask -> latent-resolution validity: a latent cell
    is invalid if ANY of its 8x8 pixels is invalid."""
    invalid = (~val_mask).astype(jnp.float32)[..., None]
    pooled = jax.lax.reduce_window(
        invalid, -jnp.inf, jax.lax.max, (1, 8, 8, 1), (1, 8, 8, 1), "VALID"
    )
    return pooled[..., 0] < 0.5


class GeoWizardTrainer(E2ETrainer):
    """Joint trainer: same optimizer/step machinery, joint-task loss."""

    def __init__(
        self,
        config: TrainConfig,
        unet: UNet2DCondition,
        vae: AutoencoderKL,
        vae_params: Any,
        image_encoder: clip_models.CLIPVisionModelWithProjection,
        image_encoder_params: Any,
        scheduler_config=None,
        latent_scale: float = 0.18215,
    ):
        super().__init__(
            config.replace(modality="joint"),
            unet,
            vae,
            vae_params,
            np.zeros((1, 1, unet.config.cross_attention_dim), np.float32),
            scheduler_config,
            latent_scale,
        )
        self.image_encoder = image_encoder
        self.image_encoder_params = materialize_frozen(image_encoder_params)
        # GeoWizard's pyramid noise draws octave scales r ~ U[1.5, 3]
        # (train_depth_normal.py:290-292) vs Marigold's U[2, 4]
        self._draw_pyramid_bank(base=1.5, spread=1.5)

    def _frozen(self):
        f = super()._frozen()
        f["image_encoder"] = self.image_encoder_params
        return f

    def place_frozen(self, mesh) -> None:
        from diffusion_e2e_ft_tpu.parallel import replicated

        super().place_frozen(mesh)
        self.image_encoder_params = jax.device_put(
            self.image_encoder_params, replicated(mesh)
        )

    def _loss(self, unet_params, frozen, batch: Dict[str, Array], key: jax.Array) -> Tuple[Array, Dict[str, Array]]:
        c = self.config
        rgb = batch["rgb"].astype(jnp.float32)
        mask = batch["val_mask"]
        b = rgb.shape[0]

        rgb_latents = jax.lax.stop_gradient(
            self.vae.apply({"params": frozen["vae"]}, rgb, method=self.vae.encode_mean)
            * self.latent_scale
        )
        rgb_latents2 = jnp.concatenate([rgb_latents, rgb_latents], axis=0)

        # CLIP-vision conditioning (frozen)
        pix = clip_models.clip_preprocess((rgb + 1.0) / 2.0)
        img_embed = jax.lax.stop_gradient(
            self.image_encoder.apply({"params": frozen["image_encoder"]}, pix)
        )[:, None, :]
        img_embed2 = jnp.concatenate([img_embed, img_embed], axis=0)

        class_vec = switcher_embedding(batch.get("domain", jnp.asarray([1.0, 0.0, 0.0])), batch=b)

        key_t, key_n = jax.random.split(key)
        if c.e2e:
            # single-step regime: always the first denoising step, noise IS the input
            t2 = jnp.full((2 * b,), self.scheduler_config.num_train_timesteps - 1, jnp.int32)
            noisy = self._make_noisy_latents(key_n, rgb_latents2.shape, timesteps=t2)
        else:
            # standard diffusion training: random t, GT geo latents + added noise
            t = jax.random.randint(
                key_t, (b,), 0, self.scheduler_config.num_train_timesteps
            )
            t2 = jnp.concatenate([t, t], axis=0)
            geo_latents = jax.lax.stop_gradient(
                self.vae.apply(
                    {"params": frozen["vae"]},
                    jnp.concatenate(
                        [
                            jnp.repeat(batch["depth_target"][..., None], 3, axis=-1),
                            -batch["normal_target"].astype(jnp.float32),
                        ],
                        axis=0,
                    ),
                    method=self.vae.encode_mean,
                )
                * self.latent_scale
            )
            noise = self._make_noisy_latents(key_n, geo_latents.shape, timesteps=t2)
            noisy = sched_ops.add_noise(self.schedule, geo_latents, noise, t2)

        apply = self._remat(self.unet.apply)
        model_pred = apply(
            {"params": unet_params},
            jnp.concatenate([rgb_latents2, noisy], axis=-1),
            t2,
            img_embed2,
            class_vec,
        )

        metrics: Dict[str, Array] = {}
        if c.e2e:
            x0 = sched_ops.pred_original_sample(
                self.scheduler_config, self.schedule, model_pred.astype(jnp.float32), t2, noisy
            )
            decoded = self._vae_decode(frozen["vae"], x0).astype(jnp.float32)
            depth_dec, normal_dec = decoded[:b], decoded[b:]

            depth_est = jnp.clip(jnp.mean(depth_dec, axis=-1), -1.0, 1.0)
            nrm = jnp.linalg.norm(normal_dec, axis=-1, keepdims=True) + 1e-5
            normal_est = jnp.clip(normal_dec / nrm, -1.0, 1.0)

            # the reference flips GT normals into GeoWizard's convention (:611,751)
            normal_gt = -batch["normal_target"].astype(jnp.float32)

            ssi = L.nan_guarded(L.ssi_loss(depth_est, batch["depth_target"], mask))
            ang = L.nan_guarded(L.angular_loss(normal_est, normal_gt, mask))
            loss = c.ssi_weight * ssi + c.angular_weight * ang
            metrics.update({"loss_ssi": ssi, "loss_angular": ang})
        else:
            # standard diffusion loss in latent space, masked by the 8x-pooled
            # latent validity (train_depth_normal.py:606-609,715-717)
            if self.scheduler_config.prediction_type == "v_prediction":
                target = sched_ops.velocity(self.schedule, geo_latents, noise, t2)
            else:
                target = noise
            lmask = latent_valid_mask(mask)
            lmask2 = jnp.concatenate([lmask, lmask], axis=0)[..., None].astype(jnp.float32)
            se = (model_pred.astype(jnp.float32) - target) ** 2 * lmask2
            loss = jnp.sum(se) / jnp.maximum(jnp.sum(lmask2) * target.shape[-1], 1.0)

        any_valid = jnp.any(mask)
        loss = jnp.where(any_valid, loss, 0.0)
        metrics["loss"] = loss
        return loss, metrics
