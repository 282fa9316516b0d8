"""Training loop driver: epochs over the mixed loader, GSPMD sharding, periodic
checkpoints with rotation, resume, scalar logging, throughput meter.

Capability parity: the outer loop of `/root/reference/training/train.py:249-634`
(progress accounting in optimizer steps, `checkpointing_steps` saves,
`--resume_from_checkpoint latest`, loss logging averaged over the accumulation
window) — re-expressed around the jitted micro-step.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from diffusion_e2e_ft_tpu.parallel import shard_batch
from diffusion_e2e_ft_tpu.training import checkpoints as ckpt
from diffusion_e2e_ft_tpu.training.trainer import E2ETrainer, TrainState
from diffusion_e2e_ft_tpu.utils.logging import ScalarLogger, write_arguments
from diffusion_e2e_ft_tpu.utils.profiling import StepTimer


def jnp_sum(xs):
    total = xs[0]
    for x in xs[1:]:
        total = total + x
    return total


def run_training(
    trainer: E2ETrainer,
    state: TrainState,
    make_epoch_iter: Callable[[int], Iterable[Dict[str, np.ndarray]]],
    mesh=None,
    resume_from: Optional[str] = None,
    log_every: int = 10,
) -> TrainState:
    """Run until config.max_train_steps optimizer steps; returns the final state."""
    config = trainer.config
    out_dir = config.output_dir
    os.makedirs(out_dir, exist_ok=True)
    write_arguments(out_dir, {"config": config.to_json()})
    logger = ScalarLogger(os.path.join(out_dir, "logs"))

    if resume_from is not None:
        path = ckpt.latest_checkpoint(out_dir) if resume_from == "latest" else resume_from
        if path is None:
            print(f"[train] no checkpoint found in {out_dir}, starting fresh", flush=True)
        else:
            state = ckpt.restore_checkpoint(path, state)
            print(f"[train] resumed from {path} at step {int(state.step)}", flush=True)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
        trainer.place_frozen(mesh)

    key = jax.random.key(config.seed)
    timer = StepTimer()
    accum = config.gradient_accumulation_steps
    # host-side step accounting: fetching state.step every micro-batch would force a
    # device sync per step and serialize the pipeline
    step = int(jax.device_get(state.step))
    micro = int(jax.device_get(state.micro_step))
    window_losses = []  # device scalars; materialized only when logging

    epoch = 0
    while step < config.max_train_steps:
        for batch in make_epoch_iter(epoch):
            key, step_key = jax.random.split(key)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = trainer.train_step(state, batch, step_key)
            timer.tick()
            window_losses.append(metrics["loss"])

            micro += 1
            synced = micro % accum == 0
            if synced:
                step += 1
                if step % log_every == 0:
                    window = float(jnp_sum(window_losses)) / accum
                    grad_norm = float(metrics["grad_norm"])
                    # failure detection (absent in the reference): the loss itself is
                    # NaN-guarded, so divergence shows up in the raw gradient norm —
                    # dump an emergency checkpoint and abort resumably
                    if not (np.isfinite(window) and np.isfinite(grad_norm)):
                        path = ckpt.save_checkpoint(
                            out_dir, step, jax.device_get(state),
                            config.checkpoints_total_limit,
                        )
                        logger.close()
                        raise FloatingPointError(
                            f"non-finite loss/grad at step {step} "
                            f"(loss={window}, grad_norm={grad_norm}); state saved to {path}"
                        )
                    logger.log(
                        step,
                        {
                            "train_loss": window,
                            "grad_norm": grad_norm,
                            "step_time_s": timer.mean_step_time,
                            "img_per_sec": timer.items_per_sec(
                                batch["rgb"].shape[0]
                            ),
                            **{
                                k: float(v)
                                for k, v in metrics.items()
                                if k.startswith("loss_")
                            },
                        },
                    )
                window_losses = []
                if step > 0 and step % config.checkpointing_steps == 0:
                    path = ckpt.save_checkpoint(
                        out_dir, step, jax.device_get(state), config.checkpoints_total_limit
                    )
                    print(f"[train] saved {path}", flush=True)
                if step >= config.max_train_steps:
                    break
        epoch += 1

    logger.close()
    return state
