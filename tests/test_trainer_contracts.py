"""Constructor-level contracts of the trainers (fast — no compilation).

Pins the two round-3 regressions:
  1. `E2ETrainer.__init__` must accept ABSTRACT (`jax.ShapeDtypeStruct`) frozen
     param trees, so AOT compile-only validation (`__graft_entry__.dryrun_multichip`
     case 4) can construct a full-size trainer without materializing 334 MB of VAE
     weights (round 3 crashed here: `jnp.asarray` on a ShapeDtypeStruct).
  2. The fused GN+SiLU->conv Pallas kernel is opt-IN per path: OFF in
     `VAEConfig()` (it loses at 768px inference decode, 10.24 -> 6.26 img/s) and
     ON inside the trainers (it wins on the train step, 494 -> 420 ms/step).
"""

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


def _tiny_modules():
    ucfg = UNetConfig.tiny()
    vcfg = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4)
    return UNet2DCondition(ucfg), AutoencoderKL(vcfg)


def _abstract_vae_params(vae):
    return jax.eval_shape(vae.init, jax.random.key(0), jnp.ones((1, 64, 64, 3)))["params"]


def test_vae_config_defaults_unfused():
    assert VAEConfig().fused_gn_conv is False


def test_trainer_accepts_abstract_param_trees():
    unet, vae = _tiny_modules()
    v_shapes = _abstract_vae_params(vae)
    cfg = TrainConfig(gradient_accumulation_steps=1, gradient_checkpointing=False)
    trainer = E2ETrainer(cfg, unet, vae, v_shapes, np.zeros((1, 2, 32), np.float32))
    # abstract leaves pass through unmaterialized
    assert all(
        isinstance(l, jax.ShapeDtypeStruct) for l in jax.tree.leaves(trainer.vae_params)
    )
    # and the step still lowers via eval_shape against abstract state
    u_shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.ones((1, 8, 8, 8)), jnp.asarray(999),
        jnp.ones((1, 2, 32)),
    )["params"]
    state_shapes = jax.eval_shape(trainer.init_state, u_shapes)
    assert int(jax.tree.leaves(state_shapes.step)[0].size) == 1


def test_trainer_accepts_abstract_empty_text_embed():
    unet, vae = _tiny_modules()
    cfg = TrainConfig(gradient_accumulation_steps=1, gradient_checkpointing=False)
    emb = jax.ShapeDtypeStruct((1, 2, 32), jnp.float32)
    trainer = E2ETrainer(cfg, unet, vae, _abstract_vae_params(vae), emb)
    assert isinstance(trainer.empty_text_embed, jax.ShapeDtypeStruct)


def test_trainer_opts_into_fused_vae_kernels():
    unet, vae = _tiny_modules()
    assert vae.config.fused_gn_conv is False
    cfg = TrainConfig(gradient_accumulation_steps=1, gradient_checkpointing=False)
    trainer = E2ETrainer(cfg, unet, vae, _abstract_vae_params(vae), np.zeros((1, 2, 32), np.float32))
    assert trainer.vae.config.fused_gn_conv is True
    # param tree layout is unchanged by the rebind (same module names/shapes)
    ref = jax.eval_shape(vae.init, jax.random.key(0), jnp.ones((1, 32, 32, 3)))
    got = jax.eval_shape(trainer.vae.init, jax.random.key(0), jnp.ones((1, 32, 32, 3)))
    assert jax.tree.structure(ref) == jax.tree.structure(got)


@pytest.mark.slow  # the one compile-heavy test in this module
def test_aot_compile_abstract_trainer():
    """Tiny-model version of dryrun_multichip case 4: construct the trainer from
    ABSTRACT trees and AOT-compile the sharded step without materializing params."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffusion_e2e_ft_tpu.parallel import make_train_mesh
    from diffusion_e2e_ft_tpu.parallel.sharding import batch_spec, state_sharding

    unet, vae = _tiny_modules()
    v_shapes = _abstract_vae_params(vae)
    cfg = TrainConfig(gradient_accumulation_steps=1, gradient_checkpointing=False)
    trainer = E2ETrainer(cfg, unet, vae, v_shapes, np.zeros((1, 2, 32), np.float32))
    u_shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.ones((1, 8, 8, 8)), jnp.asarray(999),
        jnp.ones((1, 2, 32)),
    )["params"]
    mesh = make_train_mesh(len(jax.devices()), fsdp=2)
    state_shapes = jax.eval_shape(trainer.init_state, u_shapes)
    st_sh = state_sharding(state_shapes, mesh, min_size=1 << 10)
    state = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_shapes, st_sh,
    )
    repl = NamedSharding(mesh, P())
    b = len(jax.devices())

    def bspec(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=NamedSharding(mesh, batch_spec(len(shape))))

    batch = {
        "rgb": bspec((b, 32, 32, 3), jnp.float32),
        "target": bspec((b, 32, 32), jnp.float32),
        "val_mask": bspec((b, 32, 32), jnp.bool_),
    }
    frozen = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl),
        {"vae": v_shapes,
         "empty_text_embed": jax.ShapeDtypeStruct((1, 2, 32), jnp.float32)},
    )
    key_shape = jax.eval_shape(lambda: jax.random.key(0))
    compiled = E2ETrainer._train_step_jit.lower(
        trainer, state, batch,
        jax.ShapeDtypeStruct(key_shape.shape, key_shape.dtype, sharding=repl),
        frozen,
    ).compile()
    assert compiled is not None


def test_trainer_fused_opt_out():
    unet, vae = _tiny_modules()
    cfg = TrainConfig(
        gradient_accumulation_steps=1, gradient_checkpointing=False, fused_vae_kernels=False
    )
    trainer = E2ETrainer(cfg, unet, vae, _abstract_vae_params(vae), np.zeros((1, 2, 32), np.float32))
    assert trainer.vae.config.fused_gn_conv is False
