"""End-to-end training-loop driver test: tiny models, a few steps, checkpoint
rotation, resume, logging, and final HF export."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from diffusion_e2e_ft_tpu.training import E2ETrainer, TrainConfig
from diffusion_e2e_ft_tpu.training import checkpoints as C
from diffusion_e2e_ft_tpu.training.loop import run_training

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



def _setup(tmp_path, max_steps=3):
    ucfg = UNetConfig.tiny()
    vcfg = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    up = unet.init(jax.random.key(0), jnp.ones((1, 4, 4, 8)), jnp.asarray(999), jnp.ones((1, 2, 32)))["params"]
    vp = vae.init(jax.random.key(1), jnp.ones((1, 32, 32, 3)))["params"]
    cfg = TrainConfig(
        gradient_accumulation_steps=1,
        gradient_checkpointing=False,
        max_train_steps=max_steps,
        checkpointing_steps=2,
        checkpoints_total_limit=1,
        lr_warmup_steps=0,
        output_dir=str(tmp_path / "run"),
    )
    trainer = E2ETrainer(cfg, unet, vae, vp, np.zeros((1, 2, 32), np.float32))
    return trainer, up, ucfg, vcfg, vp


def _epoch_iter_factory(b=2, h=32, w=32):
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(8):
        batches.append(
            {
                "rgb": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
                "target": rng.uniform(-1, 1, (b, h, w)).astype(np.float32),
                "val_mask": np.ones((b, h, w), bool),
            }
        )

    def make(epoch):
        return list(batches)

    return make


class TestRunTraining:
    def test_runs_checkpoints_logs_and_exports(self, tmp_path):
        trainer, up, ucfg, vcfg, vp = _setup(tmp_path)
        state = trainer.init_state(up)
        final = run_training(trainer, state, _epoch_iter_factory(), log_every=1)
        assert int(jax.device_get(final.step)) == 3

        out = trainer.config.output_dir
        # rotation kept only the latest checkpoint
        ckpts = C.list_checkpoints(out)
        assert [s for s, _ in ckpts] == [2]
        # logs written
        lines = open(os.path.join(out, "logs", "metrics.jsonl")).read().splitlines()
        assert len(lines) >= 2
        rec = json.loads(lines[-1])
        assert "train_loss" in rec and np.isfinite(rec["train_loss"])
        assert os.path.exists(os.path.join(out, "arguments.txt"))

        # final HF export
        export_dir = str(tmp_path / "export")
        C.export_hf_pipeline(
            export_dir, ucfg, jax.device_get(final.params), vcfg, vp,
            trainer.scheduler_config,
        )
        sched = json.load(open(os.path.join(export_dir, "scheduler", "scheduler_config.json")))
        assert sched["timestep_spacing"] == "trailing"

        from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

        # synthetic checkpoint with no text tower: override the strict reload check
        with pytest.warns(UserWarning, match="ZEROS"):
            pipe = MarigoldPipeline.from_hf_dir(export_dir, allow_missing_text_encoder=True)
        img = np.zeros((32, 32, 3), np.uint8)
        o = pipe(img, processing_res=0, color_map=None)
        assert np.isfinite(o.depth_np).all()

    def test_failure_detection_aborts_with_emergency_checkpoint(self, tmp_path):
        trainer, up, *_ = _setup(tmp_path, max_steps=3)
        # poison the params so the first step produces non-finite gradients
        up = jax.tree.map(lambda x: x * jnp.nan, up)
        state = trainer.init_state(up)
        with pytest.raises(FloatingPointError):
            run_training(trainer, state, _epoch_iter_factory(), log_every=1)
        assert C.list_checkpoints(trainer.config.output_dir)  # emergency save exists

    def test_resume_continues_from_checkpoint(self, tmp_path):
        trainer, up, *_ = _setup(tmp_path, max_steps=2)
        state = trainer.init_state(up)
        final = run_training(trainer, state, _epoch_iter_factory())
        assert int(jax.device_get(final.step)) == 2

        # new trainer with a higher budget resumes from the saved step-2 checkpoint
        trainer2, up2, *_ = _setup(tmp_path, max_steps=4)
        state2 = trainer2.init_state(up2)
        final2 = run_training(
            trainer2, state2, _epoch_iter_factory(), resume_from="latest"
        )
        assert int(jax.device_get(final2.step)) == 4
        # resumed params differ from fresh init (training actually continued)
        d = max(
            jax.tree.leaves(
                jax.tree.map(
                    lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()),
                    jax.device_get(final2.params),
                    jax.device_get(final.params),
                )
            )
        )
        assert d > 0.0
