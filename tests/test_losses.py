import jax.numpy as jnp
import numpy as np

from diffusion_e2e_ft_tpu.ops import losses as L


def _lstsq_scale_shift(pred, target, mask):
    """Independent per-image reference: masked least squares via np.linalg.lstsq."""
    outs = []
    for p, y, m in zip(pred, target, mask):
        pm, ym = p[m], y[m]
        A = np.stack([pm, np.ones_like(pm)], axis=1)
        # positive-definiteness check mirrors the det>0 guard
        a00 = (pm * pm).sum()
        a01 = pm.sum()
        a11 = float(m.sum())
        if a00 * a11 - a01 * a01 <= 0:
            outs.append((0.0, 0.0))
            continue
        sol, *_ = np.linalg.lstsq(A, ym, rcond=None)
        outs.append((sol[0], sol[1]))
    return np.array(outs).T


class TestSSI:
    def test_affine_invariance(self):
        """Prediction = affine transform of target => zero loss."""
        rng = np.random.default_rng(0)
        target = rng.uniform(1.0, 10.0, size=(2, 16, 16)).astype(np.float32)
        pred = 3.0 * target - 2.0
        mask = np.ones_like(target, bool)
        loss = L.ssi_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
        assert float(loss) < 1e-4

    def test_matches_lstsq_reference(self):
        rng = np.random.default_rng(1)
        pred = rng.normal(size=(3, 12, 12)).astype(np.float32)
        target = rng.normal(size=(3, 12, 12)).astype(np.float32)
        mask = rng.random((3, 12, 12)) > 0.3
        s, t = L.compute_scale_and_shift(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)
        )
        s_ref, t_ref = _lstsq_scale_shift(pred, target, mask)
        np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_ref, rtol=1e-3, atol=1e-4)
        # full loss vs manual masked mean
        aligned = s_ref[:, None, None] * pred + t_ref[:, None, None]
        ref_loss = np.abs(aligned - target)[mask].mean()
        loss = L.ssi_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)

    def test_degenerate_det_guard(self):
        """Constant prediction under full mask -> det == 0 -> scale=shift=0."""
        pred = np.ones((1, 8, 8), np.float32)
        target = np.full((1, 8, 8), 5.0, np.float32)
        mask = np.ones((1, 8, 8), bool)
        s, t = L.compute_scale_and_shift(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)
        )
        assert float(s[0]) == 0.0 and float(t[0]) == 0.0
        loss = L.ssi_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
        np.testing.assert_allclose(float(loss), 5.0, rtol=1e-6)

    def test_empty_mask_no_nan(self):
        pred = np.ones((1, 4, 4), np.float32)
        target = np.ones((1, 4, 4), np.float32)
        mask = np.zeros((1, 4, 4), bool)
        loss = L.ssi_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
        assert np.isfinite(float(loss))

    def test_channel_dim_squeeze(self):
        rng = np.random.default_rng(2)
        pred = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
        target = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
        mask = np.ones((2, 8, 8, 1), bool)
        a = L.ssi_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
        b = L.ssi_loss(
            jnp.asarray(pred[..., 0]), jnp.asarray(target[..., 0]), jnp.asarray(mask[..., 0])
        )
        np.testing.assert_allclose(float(a), float(b))


class TestAngular:
    def test_identical_normals_zero(self):
        rng = np.random.default_rng(3)
        n = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        mask = np.ones((2, 8, 8), bool)
        loss = L.angular_loss(jnp.asarray(n), jnp.asarray(n), jnp.asarray(mask))
        assert float(loss) < 1e-3

    def test_orthogonal_is_pi_over_2(self):
        a = np.zeros((1, 4, 4, 3), np.float32)
        b = np.zeros((1, 4, 4, 3), np.float32)
        a[..., 0] = 1.0
        b[..., 1] = 1.0
        mask = np.ones((1, 4, 4), bool)
        loss = L.angular_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask))
        np.testing.assert_allclose(float(loss), np.pi / 2, rtol=1e-5)

    def test_masked_mean_semantics(self):
        """Only valid pixels contribute; matches an explicit numpy masked mean."""
        rng = np.random.default_rng(4)
        a = rng.normal(size=(2, 6, 6, 3)).astype(np.float32)
        b = rng.normal(size=(2, 6, 6, 3)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        mask = rng.random((2, 6, 6)) > 0.4
        loss = L.angular_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask))
        dot = np.clip((a * b).sum(-1), -1, 1)
        ref = np.arccos(dot)[mask].mean()
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_mask_with_channel_dim(self):
        a = np.zeros((1, 4, 4, 3), np.float32)
        a[..., 2] = 1.0
        mask4 = np.ones((1, 4, 4, 3), bool)
        loss = L.angular_loss(jnp.asarray(a), jnp.asarray(a), jnp.asarray(mask4))
        assert float(loss) < 1e-3


def test_nan_guard():
    assert float(L.nan_guarded(jnp.asarray(np.nan))) == 0.0
    assert float(L.nan_guarded(jnp.asarray(1.5))) == 1.5
