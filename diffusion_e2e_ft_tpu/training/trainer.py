"""The end-to-end fine-tuning step, jitted and GSPMD-data-parallel.

Capability parity: the reference's hot loop (`/root/reference/training/train.py:465-607`):
frozen-VAE latent encode, t=999, zeros/pyramid/gaussian noisy latent, UNet forward,
x0 recovery from the parameterized prediction, frozen-VAE decode *inside the
differentiated graph*, channel-mean/unit-norm task postprocessing, SSI or angular
loss with NaN guard, AdamW + global-norm clip + IterExponential schedule, gradient
accumulation, EMA (GeoWizard, `train_depth_normal.py:352-353,784-786`).

TPU-first: one jitted `train_step(state, batch, key)`; gradient accumulation via
`optax.MultiSteps` (so the accumulation loop is K invocations of the same compiled
graph, matching accelerate's semantics); `jax.checkpoint` on the UNet apply for the
decoder-in-the-loop memory; data parallelism by sharding the batch leaves over a
`Mesh(('data',))` — the gradient all-reduce is a GSPMD-inserted psum, and the logged
loss is the global mean (the reference's `accelerator.gather(...).mean()`).

In-jit pyramid noise: the reference redraws the octave *scale schedule* from host
randomness every step (`training/util/noise.py:8-18`). Host randomness can't live in
a jitted graph, so we pre-draw a BANK of schedules from the config seed at trainer
build, compile one branch per distinct octave-shape sequence, and pick a branch per
step with `lax.switch` on a per-step random index — per-step schedule variation, one
compilation. Per-octave gaussians remain per-step `jax.random` draws.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusion_e2e_ft_tpu.models import AutoencoderKL, UNet2DCondition
from diffusion_e2e_ft_tpu.ops import losses as L
from diffusion_e2e_ft_tpu.ops import noise as noise_ops
from diffusion_e2e_ft_tpu.ops import scheduler as sched_ops
from diffusion_e2e_ft_tpu.parallel import replicated, shard_batch
from diffusion_e2e_ft_tpu.training.config import TrainConfig
from diffusion_e2e_ft_tpu.training.lr import iter_exponential_schedule

Array = jax.Array


def materialize_frozen(tree: Any) -> Any:
    """jnp.asarray every leaf, passing `jax.ShapeDtypeStruct`s through unchanged
    so trainers can be constructed with abstract param trees (AOT compile-only
    validation, e.g. __graft_entry__.dryrun_multichip case 4)."""
    return jax.tree.map(
        lambda l: l if isinstance(l, jax.ShapeDtypeStruct) else jnp.asarray(l), tree
    )


class TrainState(NamedTuple):
    step: Array  # optimizer (sync) step count
    micro_step: Array  # micro-batch count (step * accum + k)
    params: Any  # trainable UNet params
    opt_state: Any
    ema_params: Optional[Any] = None


class E2ETrainer:
    """Builds and runs the jitted E2E fine-tuning step for one UNet."""

    def __init__(
        self,
        config: TrainConfig,
        unet: UNet2DCondition,
        vae: AutoencoderKL,
        vae_params: Any,
        empty_text_embed: np.ndarray,  # [1, L, D] CLIP embedding of ""
        scheduler_config: Optional[sched_ops.SchedulerConfig] = None,
        latent_scale: float = 0.18215,
    ):
        self.config = config
        self.unet = unet
        # The fused GN+SiLU->conv Pallas kernel wins on the training step's
        # frozen-VAE encode/decode (494 -> 420 ms/step, PERF.md r3) but loses at
        # 768px inference decode, so it is opted into HERE, not in VAEConfig.
        # Same param tree and math; XLA fallback everywhere but TPU.
        if config.fused_vae_kernels and not vae.config.fused_gn_conv:
            vae = AutoencoderKL(dataclasses.replace(vae.config, fused_gn_conv=True))
        self.vae = vae
        # Frozen parameters are THREADED through the jitted step as arguments
        # (see _frozen / _train_step_jit) — capturing them in the jit closure
        # embeds them as ~334 MB of HLO literals, which bloats the module 30x
        # and (on the axon tunnel) exceeds the remote-compile request limit.
        # ShapeDtypeStruct leaves pass through so the constructor also accepts
        # abstract trees for AOT compile-only validation.
        self.vae_params = materialize_frozen(vae_params)
        self.empty_text_embed = (
            empty_text_embed
            if isinstance(empty_text_embed, jax.ShapeDtypeStruct)
            else jnp.asarray(empty_text_embed, jnp.float32)
        )
        self.scheduler_config = scheduler_config or sched_ops.SchedulerConfig(
            prediction_type=config.prediction_type
        )
        self.schedule = sched_ops.make_schedule(self.scheduler_config)
        self.latent_scale = latent_scale

        # per-step pyramid-noise schedule bank (see module docstring); subclasses
        # override base/spread (GeoWizard trains with r ~ U[1.5, 3])
        self._draw_pyramid_bank(base=2.0, spread=2.0)

        self.optimizer = self._build_optimizer()

    def _draw_pyramid_bank(self, base: float, spread: float, size: int = 16) -> None:
        rng = np.random.default_rng(self.config.seed)
        self._pyramid_scale_bank = rng.random((size, 10)) * spread + base

    # ------------------------------------------------------------------
    # Optimizer
    # ------------------------------------------------------------------

    def _build_optimizer(self) -> optax.GradientTransformation:
        c = self.config
        # the reference scales schedule lengths by DP degree (train.py:356)
        lr = iter_exponential_schedule(
            c.learning_rate,
            c.lr_total_iter_length * c.num_data_parallel,
            c.lr_final_ratio,
            c.lr_warmup_steps * c.num_data_parallel,
        )
        mu_dtype = jnp.dtype(c.adam_mu_dtype) if c.adam_mu_dtype else None
        base = optax.chain(
            optax.clip_by_global_norm(c.max_grad_norm),
            optax.adamw(
                lr,
                b1=c.adam_beta1,
                b2=c.adam_beta2,
                eps=c.adam_epsilon,
                weight_decay=c.adam_weight_decay,
                mu_dtype=mu_dtype,
            ),
        )
        if c.class_embedding_lr_mult != 1.0:
            # GeoWizard gives the switcher class-embedding a 10x LR group
            # (train_depth_normal.py:428-444)
            def label_fn(params):
                return jax.tree.map_with_path(
                    lambda path, _: "class_embedding"
                    if any(getattr(p, "key", None) == "class_embedding" for p in path)
                    else "base",
                    params,
                )

            boosted = optax.chain(
                optax.clip_by_global_norm(c.max_grad_norm),
                optax.adamw(
                    lambda s: lr(s) * c.class_embedding_lr_mult,
                    b1=c.adam_beta1,
                    b2=c.adam_beta2,
                    eps=c.adam_epsilon,
                    weight_decay=c.adam_weight_decay,
                    mu_dtype=mu_dtype,
                ),
            )
            base = optax.multi_transform(
                {"base": base, "class_embedding": boosted}, label_fn
            )
        if c.gradient_accumulation_steps > 1:
            base = optax.MultiSteps(base, every_k_schedule=c.gradient_accumulation_steps)
        return base

    def init_state(self, unet_params: Any) -> TrainState:
        opt_state = self.optimizer.init(unet_params)
        ema = jax.tree.map(jnp.copy, unet_params) if self.config.use_ema else None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            micro_step=jnp.zeros((), jnp.int32),
            params=unet_params,
            opt_state=opt_state,
            ema_params=ema,
        )

    # ------------------------------------------------------------------
    # Forward + loss
    # ------------------------------------------------------------------

    def _make_noisy_latents(
        self, key: jax.Array, shape, timesteps: Optional[Array] = None
    ) -> Array:
        """`timesteps` enables GeoWizard's t/1000 octave scaling
        (`train_depth_normal.py:286-296`); None is the Marigold/SD variant."""
        nt = self.config.noise_type
        if nt is None or nt == "zeros":
            return jnp.zeros(shape, jnp.float32)
        if nt == "gaussian":
            return jax.random.normal(key, shape, jnp.float32)
        if nt == "pyramid":
            b, h, w, c = shape
            ts = (
                None
                if timesteps is None
                else (jnp.asarray(timesteps, jnp.float32) / 1000.0).reshape(-1, 1, 1, 1)
            )

            def branch(sizes):
                def f(k):
                    noise = jax.random.normal(k, shape, jnp.float32)
                    keys = jax.random.split(k, len(sizes))
                    for i, (oh, ow) in enumerate(sizes):
                        octave = jax.random.normal(keys[i], (b, oh, ow, c), jnp.float32)
                        term = jax.image.resize(octave, shape, method="bilinear") * (0.9**i)
                        if ts is not None:
                            term = term * ts
                        noise = noise + term
                    return noise / jnp.std(noise, ddof=1)

                return f

            # one compiled branch per DISTINCT octave-shape sequence in the bank;
            # rows mapping to the same sequence share a branch, sampling stays
            # uniform over bank rows
            seq_to_branch: Dict[Tuple, int] = {}
            branches, row_branch = [], []
            for scales in self._pyramid_scale_bank:
                sizes = noise_ops._octave_sizes(h, w, scales)
                if sizes not in seq_to_branch:
                    seq_to_branch[sizes] = len(branches)
                    branches.append(branch(sizes))
                row_branch.append(seq_to_branch[sizes])
            idx_key, noise_key = jax.random.split(key)
            row = jax.random.randint(idx_key, (), 0, len(row_branch))
            return jax.lax.switch(
                jnp.asarray(row_branch, jnp.int32)[row], branches, noise_key
            )
        raise ValueError(f"Unknown noise type: {nt}")

    def _remat(self, apply):
        """Wrap a module apply in jax.checkpoint per config.

        Save-nothing (remat_policy=None) is the default: it is the only policy
        that fits v5e HBM at the paper config (fp32 params + Adam state ~10.4 GB
        plus frozen-VAE-decoder activations at image resolution — see
        perf/train_remat_sweep.py), and whole-UNet recompute is cheap because
        UNet activations live at latent resolution (~1.3 of ~35 TFLOP/step)."""
        c = self.config
        if not c.gradient_checkpointing:
            return apply
        policies = {
            None: None,
            "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            "dots_all": jax.checkpoint_policies.dots_saveable,
        }
        return jax.checkpoint(apply, policy=policies[c.remat_policy])

    def _vae_decode(self, vae_params, x0: Array) -> Array:
        """Frozen-VAE decode inside the differentiated graph; rematerialized by
        default so its image-resolution GN/SiLU inputs are not saved for the
        backward pass (see TrainConfig.vae_decode_checkpoint)."""

        def decode(p, z):
            return self.vae.apply({"params": p}, z, method=self.vae.decode)

        if self.config.vae_decode_checkpoint:
            decode = jax.checkpoint(decode)
        return decode(vae_params, x0 / self.latent_scale)

    def _frozen(self) -> Dict[str, Any]:
        """Non-trainable arrays passed to the jitted step as real arguments."""
        return {"vae": self.vae_params, "empty_text_embed": self.empty_text_embed}

    def place_frozen(self, mesh) -> None:
        """Replicate the frozen params over a mesh (call alongside state/batch
        sharding; single-device-committed inputs conflict with a mesh-jitted step)."""
        self.vae_params = jax.device_put(self.vae_params, replicated(mesh))
        self.empty_text_embed = jax.device_put(self.empty_text_embed, replicated(mesh))

    def _loss(self, unet_params, frozen, batch: Dict[str, Array], key: jax.Array) -> Tuple[Array, Dict[str, Array]]:
        c = self.config
        rgb = batch["rgb"].astype(jnp.float32)  # [B,H,W,3] in [-1,1]
        mask = batch["val_mask"]
        b = rgb.shape[0]

        # frozen VAE encode (no gradient needed into the encoder)
        rgb_latents = jax.lax.stop_gradient(
            self.vae.apply({"params": frozen["vae"]}, rgb, method=self.vae.encode_mean)
            * self.latent_scale
        )

        t = jnp.full((b,), self.scheduler_config.num_train_timesteps - 1, jnp.int32)
        noisy = self._make_noisy_latents(key, rgb_latents.shape)

        empty_text = frozen["empty_text_embed"]
        context = jnp.broadcast_to(empty_text[0][None], (b,) + empty_text.shape[1:])
        unet_in = (
            jnp.concatenate([rgb_latents, noisy], axis=-1)
            if c.noise_type is not None
            else rgb_latents
        )
        apply = self._remat(self.unet.apply)
        model_pred = apply({"params": unet_params}, unet_in, t, context)

        x0 = sched_ops.pred_original_sample(
            self.scheduler_config, self.schedule, model_pred.astype(jnp.float32), t, noisy
        )
        decoded = self._vae_decode(frozen["vae"], x0).astype(jnp.float32)

        if c.modality == "depth":
            est = jnp.clip(jnp.mean(decoded, axis=-1), -1.0, 1.0)  # [B,H,W]
            loss = L.nan_guarded(L.ssi_loss(est, batch["target"], mask))
        elif c.modality == "normals":
            norm = jnp.linalg.norm(decoded, axis=-1, keepdims=True) + 1e-5
            est = jnp.clip(decoded / norm, -1.0, 1.0)
            loss = L.nan_guarded(L.angular_loss(est, batch["target"], mask))
        else:
            raise ValueError(f"Unknown modality: {c.modality}")

        # an all-invalid batch contributes zero loss, as in the reference's
        # `if val_mask.any()` skip (train.py:504)
        any_valid = jnp.any(mask)
        loss = jnp.where(any_valid, loss, 0.0)
        return loss, {"loss": loss}

    # ------------------------------------------------------------------
    # Train step
    # ------------------------------------------------------------------

    def train_step(self, state: TrainState, batch: Dict[str, Array], key: jax.Array):
        """One micro-batch step. With gradient accumulation, the optimizer only
        applies updates every K-th call (optax.MultiSteps), matching
        `accelerator.accumulate`."""
        return self._train_step_jit(state, batch, key, self._frozen())

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step_jit(
        self, state: TrainState, batch: Dict[str, Array], key: jax.Array, frozen
    ):
        (loss, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, frozen, batch, key
        )
        updates, new_opt = self.optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        micro = state.micro_step + 1
        k = self.config.gradient_accumulation_steps
        synced = (micro % k) == 0
        step = state.step + jnp.asarray(synced, jnp.int32)

        ema = state.ema_params
        if ema is not None:
            d = self.config.ema_decay
            new_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, new_params)
            ema = jax.tree.map(
                lambda e, n: jnp.where(synced, n, e), ema, new_ema
            )
        new_state = TrainState(
            step=step, micro_step=micro, params=new_params, opt_state=new_opt, ema_params=ema
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["lr_step"] = step
        return new_state, metrics

    # ------------------------------------------------------------------
    # GSPMD data parallelism
    # ------------------------------------------------------------------

    def shard(self, state: TrainState, batch: Dict[str, Array], mesh):
        """Place params replicated and batch sharded over the 'data' axis; the jitted
        step then runs SPMD with GSPMD-inserted gradient reductions."""
        state = jax.device_put(state, replicated(mesh))
        batch = shard_batch(batch, mesh)
        self.place_frozen(mesh)
        return state, batch
