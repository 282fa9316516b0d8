"""Training configuration (one dataclass replacing the reference's argparse surface,
`/root/reference/training/train.py:48-226`)."""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # task
    modality: str = "depth"  # depth | normals | joint (GeoWizard)
    noise_type: Optional[str] = "zeros"  # zeros | pyramid | gaussian | None (raw SD 4ch)
    prediction_type: str = "v_prediction"
    # optimization (reference defaults: scripts/*.sh)
    learning_rate: float = 3e-5
    lr_final_ratio: float = 0.01
    lr_warmup_steps: int = 100
    lr_total_iter_length: int = 20000
    max_train_steps: int = 20000
    train_batch_size: int = 2
    gradient_accumulation_steps: int = 16
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    # DP-degree-aware schedule scaling (the reference multiplies schedule lengths by
    # the number of processes, train.py:356)
    num_data_parallel: int = 1
    # memory
    gradient_checkpointing: bool = True
    # What the UNet remat SAVES (only meaningful with gradient_checkpointing):
    #   None     — save nothing: the entire UNet forward is recomputed in the
    #              backward pass. This is the DEFAULT and the only policy that
    #              fits v5e HBM at the paper config: fp32 params + Adam state are
    #              ~10.4 GB, and the frozen-VAE-decoder activations at image
    #              resolution take the rest (sweep: perf/train_remat_sweep.py —
    #              "dots"/"dots_all"/no-remat all ResourceExhausted at 480x640
    #              bs2). Whole-UNet remat is also CHEAP here: UNet activations
    #              live at latent resolution, ~1.3 TFLOP of a ~35 TFLOP step.
    #   "dots"   — jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    #   "dots_all" — dots_saveable (also keeps batched dots)
    remat_policy: Optional[str] = None
    # Rematerialize the frozen-VAE decode (gradients flow through it, so its
    # GN/SiLU inputs at IMAGE resolution are otherwise saved for the backward
    # pass — the largest activation block in the step). Measured on v5e at the
    # paper config (perf/train_remat_sweep.py, one case per process): OFF is
    # faster — 420.2 ms/step vs 494.4 ms with the extra decode recompute — and
    # still fits HBM, so False is the default. Keep it available as a memory
    # lever for larger resolutions/batches: recomputing the decode is exact and
    # trades ~6 TFLOP for the image-resolution activation block.
    vae_decode_checkpoint: bool = False
    # Use the fused GN+SiLU->conv Pallas kernel inside the trainer's frozen VAE.
    # A measured win on the training step (494 -> 420 ms/step at 480x640 bs2 on
    # v5e) — but NOT at 768px inference decode, which is why VAEConfig defaults
    # it off and the trainer opts in here.
    fused_vae_kernels: bool = True
    # Adam first-moment dtype (optax mu_dtype). bf16 halves the m buffer
    # (~1.7 GB at 866M fp32 params) to relieve the optimizer-state HBM pressure
    # that pins the UNet remat policy to save-nothing; m is a smoothed gradient
    # average, tolerant of bf16 (v is kept fp32 — its rsqrt is precision-
    # critical). None = fp32 (reference parity).
    adam_mu_dtype: Optional[str] = None
    # GeoWizard joint trainer extras
    ssi_weight: float = 0.5
    angular_weight: float = 1.0
    class_embedding_lr_mult: float = 10.0
    use_ema: bool = False
    ema_decay: float = 0.9999
    # standard diffusion-loss mode (vs e2e task loss)
    e2e: bool = True
    # misc
    seed: int = 0
    checkpointing_steps: int = 20000
    checkpoints_total_limit: Optional[int] = None
    output_dir: str = "model-finetuned"

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "TrainConfig":
        return TrainConfig(**json.loads(s))
