"""Converter key-inventory contract: every HF tensor, both directions, no silence.

Round-trip tests can't catch a key the converter never produced or consumed
(VERDICT r2 #3a). These tests pin the converter + model topology against the
frozen first-principles inventories in `tests/fixtures/hf_keys/` (names + shapes
of the full SD2 UNet / VAE / GeoWizard UNet / CLIP state dicts — see
`tools/hf_key_inventory.py` for provenance):

  HF -> flax: every fixture key must map to a leaf that EXISTS in our model's
  init tree with the converted shape; every leaf of our tree must be hit exactly
  once (nothing silently dropped either way).
  flax -> HF: exporting our tree must produce exactly the fixture key set.

Shape trees come from `jax.eval_shape` + `np.empty` so the 865M-param towers are
validated without materializing weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_e2e_ft_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
    convert,
)
from diffusion_e2e_ft_tpu.tools import hf_key_inventory as HK

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min


FIXTURE_DIR = "tests/fixtures/hf_keys"


def _flatten(tree, path=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, path + (k,)))
    else:
        out[path] = tuple(tree.shape)
    return out


def _unet_shape_tree(cfg: UNetConfig):
    unet = UNet2DCondition(cfg)
    b = 2 if cfg.joint_attention else 1  # joint attention pairs the task batch
    kwargs = {}
    if cfg.class_embed_proj_dim is not None:
        kwargs["class_labels"] = jnp.zeros((b, cfg.class_embed_proj_dim))
    shapes = jax.eval_shape(
        unet.init,
        jax.random.key(0),
        jnp.zeros((b, 8, 8, cfg.in_channels)),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, 2, cfg.cross_attention_dim)),
        **kwargs,
    )["params"]
    return _flatten(shapes)


def _vae_shape_tree(cfg: VAEConfig):
    vae = AutoencoderKL(cfg)
    shapes = jax.eval_shape(vae.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)))[
        "params"
    ]
    return _flatten(shapes)


def _assert_bijection(fixture_name: str, flax_shapes: dict):
    """HF inventory <-> flax tree must be a bijection with converted shapes."""
    inv = HK.load_fixture(FIXTURE_DIR, fixture_name)
    hit = {}
    for key, shape in inv.items():
        arr = np.empty(shape, np.float32)  # transposes below stay views
        path = convert.torch_key_to_flax_path(key, arr.ndim)
        conv_shape = tuple(convert._to_flax_value(path, arr).shape)
        assert path in flax_shapes, f"{fixture_name}: {key} -> {path} missing from model tree"
        assert flax_shapes[path] == conv_shape, (
            f"{fixture_name}: {key} shape {conv_shape} != model {flax_shapes[path]}"
        )
        assert path not in hit, f"{fixture_name}: {key} collides with {hit[path]}"
        hit[path] = key
    extra = set(flax_shapes) - set(hit)
    assert not extra, f"{fixture_name}: model leaves never consumed from HF: {sorted(extra)[:5]}"

    # and the export direction produces exactly the fixture key set
    tree = {}
    for path, shape in flax_shapes.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.empty(shape, np.float32)
    exported = convert.params_to_state_dict(tree)
    assert set(exported) == set(inv), (
        f"{fixture_name}: export mismatch; missing={sorted(set(inv) - set(exported))[:5]} "
        f"extra={sorted(set(exported) - set(inv))[:5]}"
    )
    for key, arr in exported.items():
        assert tuple(arr.shape) == inv[key], (
            f"{fixture_name}: exported {key} shape {arr.shape} != HF {inv[key]}"
        )


@pytest.mark.parametrize("name", sorted(HK.INVENTORIES))
def test_fixture_is_current(name):
    """Committed fixture == regenerated inventory (catches silent drift)."""
    if name.startswith("clip"):
        pytest.importorskip("transformers")
    assert HK.load_fixture(FIXTURE_DIR, name) == HK.INVENTORIES[name]()


def test_sd2_unet_inventory_bijection():
    _assert_bijection("sd2_unet_8ch", _unet_shape_tree(UNetConfig()))


def test_sd2_unet_4ch_inventory_bijection():
    _assert_bijection("sd2_unet_4ch", _unet_shape_tree(UNetConfig(in_channels=4)))


def test_geowizard_unet_inventory_bijection():
    _assert_bijection("geowizard_unet", _unet_shape_tree(UNetConfig.geowizard()))


def test_sd2_vae_inventory_bijection():
    _assert_bijection("sd2_vae", _vae_shape_tree(VAEConfig()))


@pytest.mark.parametrize("name,builder", [
    ("clip_text_sd2", "text"),
    ("clip_vision_vitl", "vision"),
])
def test_clip_inventory_consumed_exactly(name, builder):
    """clip_state_dict_to_params must consume the full transformers state dict
    (minus its declared skips) and land exactly on our model's init tree."""
    from diffusion_e2e_ft_tpu.models import clip as clip_models

    inv = HK.load_fixture(FIXTURE_DIR, name)
    state_dict = {k: np.zeros(s, np.float32) for k, s in inv.items()}
    params = convert.clip_state_dict_to_params(state_dict)
    got = _flatten(jax.tree.map(np.asarray, params))

    if builder == "text":
        model = clip_models.CLIPTextModel(clip_models.CLIPTextConfig())
        shapes = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 77), jnp.int32)
        )["params"]
    else:
        model = clip_models.CLIPVisionModelWithProjection(clip_models.CLIPVisionConfig())
        shapes = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3))
        )["params"]
    want = _flatten(shapes)
    assert set(got) == set(want), (
        f"{name}: tree mismatch; missing={sorted(set(want) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(want))[:5]}"
    )
    for path, shape in want.items():
        assert got[path] == shape, f"{name}: {path} {got[path]} != {shape}"

    # declared skips are the ONLY unconsumed keys
    skipped = {
        k for k in inv
        if k.startswith("text_projection") or "position_ids" in k
    }
    consumed = len(inv) - len(skipped)
    n_leaves = len(got)
    assert n_leaves == consumed, (
        f"{name}: {consumed} HF keys consumed but {n_leaves} leaves produced"
    )
