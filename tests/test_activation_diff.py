import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_e2e_ft_tpu.models import UNet2DCondition, UNetConfig
from diffusion_e2e_ft_tpu.tools import activation_diff as AD

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min


def test_capture_and_self_diff(tmp_path):
    unet = UNet2DCondition(UNetConfig.tiny())
    x = jnp.ones((1, 16, 16, 8))
    ctx = jnp.ones((1, 2, 32))
    variables = unet.init(jax.random.key(0), x, jnp.asarray(999), ctx)
    out, acts = AD.capture_intermediates(unet, variables, x, jnp.asarray(999), ctx)
    assert out.shape == (1, 16, 16, 4)
    assert len(acts) > 20
    assert any("down_blocks_0" in k for k in acts)

    # self-diff: everything within tolerance, no divergence
    rows = AD.diff(acts, acts)
    assert all(r.get("within_tol", True) for r in rows)
    assert AD.first_divergence(rows) is None

    # dump round-trip
    p = str(tmp_path / "acts.npz")
    AD.save_dump(p, acts)
    back = AD.load_dump(p)
    rows = AD.diff(acts, back)
    assert all(r.get("within_tol", True) for r in rows)


def test_diff_detects_divergence():
    a = {"block_0/conv": np.ones((2, 4, 4, 3), np.float32)}
    b = {"block.0.conv": np.ones((2, 4, 4, 3), np.float32) * 2.0}
    rows = AD.diff(a, b)
    assert rows[0]["max_abs_err"] == 1.0
    assert not rows[0]["within_tol"]
    assert AD.first_divergence(rows) == "block_0/conv"


def test_nchw_reconciliation():
    rng = np.random.default_rng(0)
    nhwc = rng.normal(size=(1, 8, 6, 3)).astype(np.float32)
    rows = AD.diff({"x": nhwc}, {"x": nhwc.transpose(0, 3, 1, 2)})
    assert rows[0]["within_tol"]


def test_one_sided_layers_reported():
    rows = AD.diff({"a": np.ones(3)}, {"b": np.ones(3)})
    kinds = {r["layer"]: r.get("only_in") for r in rows}
    assert kinds == {"a": "ours", "b": "reference"}


def test_summarize():
    s = AD.summarize({"x": np.ones((2, 2), np.float32) * 3})
    assert s["x"]["mean"] == 3.0 and s["x"]["shape"] == [2, 2]


def test_load_reference_directory(tmp_path):
    """Directory mode: .npy files (torch dot-dialect stems) + .npz merged."""
    from diffusion_e2e_ft_tpu.tools import activation_diff as AD

    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.save(ref_dir / "down_blocks.0.resnets.1.npy", a)
    AD.save_dump(str(ref_dir / "extra.npz"), {"mid_block/attn": a + 1.0})

    ref = AD.load_reference(str(ref_dir))
    assert set(map(AD.canonicalize_path, ref)) == {
        "down_blocks_0/resnets_1", "mid_block/attn",
    }

    ours = {"down_blocks_0/resnets_1": a, "mid_block/attn": a + 1.0}
    rows = AD.diff(ours, ref)
    assert all(r.get("max_abs_err") == 0.0 for r in rows)


def test_cli_main_divergence_and_exit_codes(tmp_path, capsys):
    from diffusion_e2e_ft_tpu.tools import activation_diff as AD

    a = np.ones((2, 2), np.float32)
    ours_path = tmp_path / "ours.npz"
    AD.save_dump(str(ours_path), {"layer_a": a, "layer_b": a})

    ref_dir = tmp_path / "refdir"
    ref_dir.mkdir()
    np.save(ref_dir / "layer_a.npy", a)
    np.save(ref_dir / "layer_b.npy", a)
    assert AD.main(["--ours", str(ours_path), "--reference", str(ref_dir)]) == 0

    np.save(ref_dir / "layer_b.npy", a + 0.5)  # diverged
    assert AD.main(["--ours", str(ours_path), "--reference", str(ref_dir)]) == 1

    np.save(ref_dir / "layer_c.npy", a)  # structural: extra reference layer
    np.save(ref_dir / "layer_b.npy", a)
    assert AD.main(["--ours", str(ours_path), "--reference", str(ref_dir)]) == 1
