"""Flash-attention kernel numerics (Pallas interpreter on CPU) vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

attn = importlib.import_module("diffusion_e2e_ft_tpu.kernels.attention")
from diffusion_e2e_ft_tpu.kernels import flash_attention as fa

pytestmark = pytest.mark.slow  # compile-heavy: keeps the "not slow" tier < 5 min



@pytest.fixture(autouse=True)
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _mk(b, l, n, d, lk=None, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    lk = lk or l
    q = rng.normal(size=(b, l, n, d)).astype(dtype)
    k = rng.normal(size=(b, lk, n, d)).astype(dtype)
    v = rng.normal(size=(b, lk, n, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestNumerics:
    def test_matches_xla_exact_blocks(self):
        q, k, v = _mk(2, 512, 2, 64)
        out = fa.flash_attention(q, k, v)
        ref = attn._xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_q_padding_path(self):
        """L=576 pads q to 768 (3 blocks of 256); kv chunk 192."""
        q, k, v = _mk(1, 576, 2, 64)
        out = fa.flash_attention(q, k, v)
        ref = attn._xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_cross_lengths(self):
        """Joint-attention shape: Lk = 2 * Lq."""
        q, k, v = _mk(2, 256, 2, 64, lk=512)
        out = fa.flash_attention(q, k, v)
        ref = attn._xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_custom_scale(self):
        q, k, v = _mk(1, 256, 1, 64)
        out = fa.flash_attention(q, k, v, scale=0.5)
        ref = attn._xla_attention(q, k, v, 0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16_inputs(self):
        q, k, v = _mk(1, 256, 2, 64)
        out = fa.flash_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        )
        ref = attn._xla_attention(q, k, v, None)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
        )

    def test_gradients_flow(self):
        q, k, v = _mk(1, 256, 1, 64)

        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v) ** 2)

        def ref_loss(q, k, v):
            return jnp.sum(attn._xla_attention(q, k, v, None) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


class TestBackward:
    """Pallas dq/dk/dv kernels (FlashAttention-2 form) vs XLA autodiff."""

    def _check(self, q, k, v, scale=None, atol=1e-3):
        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, scale=scale) * jnp.cos(q[..., :1]))

        def ref_loss(q, k, v):
            s = scale if scale is not None else q.shape[-1] ** -0.5
            return jnp.sum(attn._xla_attention(q, k, v, s) * jnp.cos(q[..., :1]))

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=atol)

    def test_grads_q_padding(self):
        """L=576 pads q/do to 768: padded rows must be self-masking in dk/dv."""
        self._check(*_mk(1, 576, 2, 64, seed=10))

    def test_grads_joint_kv(self):
        """GeoWizard joint shape Lk = 2 * Lq."""
        self._check(*_mk(2, 256, 2, 64, lk=512, seed=11))

    def test_grads_geowizard_head_dim(self):
        """d=40 (non-lane-aligned GeoWizard head)."""
        self._check(*_mk(1, 256, 2, 40, seed=12))

    def test_grads_custom_scale(self):
        self._check(*_mk(1, 256, 1, 64, seed=13), scale=0.37)

    def test_grads_vae_head(self):
        """Single 512-dim VAE head."""
        self._check(*_mk(1, 256, 1, 512, seed=14), atol=3e-3)

    def test_grads_bf16(self):
        q, k, v = _mk(1, 256, 2, 64, seed=15)
        qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))

        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v).astype(jnp.float32) ** 2)

        def ref_loss(q, k, v):
            return jnp.sum(attn._xla_attention(q, k, v, None) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
        gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            assert a.dtype == jnp.bfloat16
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b), atol=0.15, rtol=0.1
            )

    def test_xla_fallback_env(self, monkeypatch):
        monkeypatch.setenv("E2EFT_FA_BWD", "xla")
        self._check(*_mk(1, 256, 1, 64, seed=16))

    def test_forward_lse_variant_matches(self):
        """The lse-emitting forward must produce the same output as the primal."""
        q, k, v = _mk(1, 512, 2, 64, seed=17)
        b, l, n, d = q.shape
        qt = q.transpose(0, 2, 1, 3).reshape(b * n, l, d)
        kt = k.transpose(0, 2, 1, 3).reshape(b * n, l, d)
        vt = v.transpose(0, 2, 1, 3).reshape(b * n, l, d)
        out, lse = fa._flash_bnld_lse(qt, kt, vt, d**-0.5, 256)
        ref = fa._flash_bnld(qt, kt, vt, d**-0.5, 256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        # lse cross-check against dense logits
        logits = np.einsum("bqd,bkd->bqk", qt, kt) * d**-0.5
        lse_ref = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
        np.testing.assert_allclose(np.asarray(lse[..., 0]), lse_ref, atol=2e-5)


class TestEnvelope:
    def test_vae_shape_single_512_head(self):
        """The VAE mid-block shape: one 512-dim head (grid-over-KV keeps it in
        VMEM block by block)."""
        q, k, v = _mk(1, 256, 1, 512)
        out = fa.flash_attention(q, k, v)
        ref = attn._xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_long_joint_kv(self):
        """GeoWizard joint KV at the top level: Lk no longer needs VMEM residency."""
        q, k, v = _mk(1, 256, 1, 64, lk=1536)
        out = fa.flash_attention(q, k, v)
        ref = attn._xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_rejects_huge_head_dim(self):
        q, k, v = _mk(1, 256, 1, 1024)
        with pytest.raises(ValueError):
            fa.flash_attention(q, k, v)

    def test_rejects_short_sequence(self):
        q, k, v = _mk(1, 64, 1, 64)
        with pytest.raises(ValueError):
            fa.flash_attention(q, k, v)

    def test_rejects_indivisible_kv(self):
        q, k, v = _mk(1, 256, 1, 64, lk=300)
        with pytest.raises(ValueError):
            fa.flash_attention(q, k, v)

    def test_dispatcher_falls_back(self):
        """attention() must transparently fall back to XLA outside the envelope."""
        attn.set_backend("pallas")
        try:
            q, k, v = _mk(1, 64, 1, 64)  # too short for the kernel
            out = attn.attention(q, k, v)
            ref = attn._xla_attention(q, k, v, None)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        finally:
            attn.set_backend(None)

    def test_dispatcher_uses_pallas_in_envelope(self):
        attn.set_backend("pallas")
        try:
            q, k, v = _mk(1, 256, 2, 64)
            out = attn.attention(q, k, v)
            ref = attn._xla_attention(q, k, v, None)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        finally:
            attn.set_backend(None)


class TestPaddedKV:
    """KV zero-padding + in-kernel -inf column masking (block_k need not divide
    Lk): exact vs the XLA reference in both forward and backward."""

    def test_padded_kv_forward(self):
        q, k, v = _mk(1, 256, 2, 64, lk=600, seed=20)
        out = fa._flash_btnh(q, k, v, 64**-0.5, 256)  # 600 -> 768 (3 blocks)
        ref = attn._xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_padded_kv_grads(self):
        q, k, v = _mk(1, 256, 2, 64, lk=600, seed=21)

        def loss(q, k, v):
            o = fa._flash_btnh(q, k, v, 64**-0.5, 256)
            return jnp.sum(o * jnp.cos(q[..., :1]))

        def ref_loss(q, k, v):
            return jnp.sum(attn._xla_attention(q, k, v, 64**-0.5) * jnp.cos(q[..., :1]))

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)

    def test_picker_policy(self):
        """Measured preferences (perf/hotops_sweep.py exp A) + padded fallbacks."""
        assert fa._pick_block_k(9216, 64) == 1536   # exact, swept winner
        assert fa._pick_block_k(18432, 64) == 1536  # GeoWizard joint
        assert fa._pick_block_k(2304, 64) == 768    # exact, 3 programs
        assert fa._pick_block_k(9216, 512) == 1024  # VAE head: wide chunks
        assert fa._pick_block_k(4800, 64) == 1024   # train seq: pad 4800->5120
        assert fa._pick_block_k(9600, 64) == 1536   # joint train: pad ->10752
        assert fa._pick_block_k(576, 64) == 192     # small: exact beats waste
        assert fa._pick_block_k(77, 64) is None     # cross-attn: XLA fallback
        # d < 64 (GeoWizard/SD1.5 level-0 heads): r5 exp-E sweep at
        # [8, 18432, 40] inverts the d=64 preference — 1024 beats 1536
        assert fa._pick_block_k(18432, 40) == 1024  # GeoWizard joint inference
        assert fa._pick_block_k(9216, 40) == 1024   # SD1.5 single-task 768px
        assert fa._pick_block_k(9600, 40) == 1024   # joint train: pad ->10240
        assert fa._default_bq(18432, 40) == 1024
        assert fa._default_bq(9216, 64) == 1536
        assert fa._default_bq(9216, 512) == fa._BLOCK_Q
        assert fa._pick_block_k(300, 64) is None


class TestMultiHeadPacking:
    """hp-heads-per-program forward (`_flash_kernel_mh`) — exact parity with the
    hp=1 kernel and the XLA reference at GeoWizard's narrow head dim (d=40)."""

    def test_mh_matches_xla(self, monkeypatch):
        monkeypatch.setenv("E2EFT_FA_HP", "2")
        q, k, v = _mk(2, 256, 2, 40, seed=30)  # bn=4, hp=2 -> 2 head-pairs
        out = fa._flash_btnh(q, k, v, 40**-0.5, 128)
        ref = attn._xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_mh_padded_kv(self, monkeypatch):
        monkeypatch.setenv("E2EFT_FA_HP", "2")
        q, k, v = _mk(1, 256, 2, 40, lk=300, seed=31)  # 300 -> 2 blocks of 192
        out = fa._flash_btnh(q, k, v, 40**-0.5, 192)
        ref = attn._xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_mh_joint_lengths(self, monkeypatch):
        monkeypatch.setenv("E2EFT_FA_HP", "4")
        q, k, v = _mk(1, 128, 4, 40, lk=256, seed=32)
        out = fa._flash_btnh(q, k, v, 40**-0.5, 128)
        ref = attn._xla_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_hp_picker_gates(self, monkeypatch):
        # default off
        assert fa._pick_heads_per_program(8, 18432, 18432, 40, 1024, 1024, 2) == 1
        monkeypatch.setenv("E2EFT_FA_HP", "2")
        # applies at the GeoWizard joint shape
        assert fa._pick_heads_per_program(8, 18432, 18432, 40, 1024, 1024, 2) == 2
        # never at wide heads, indivisible bn, or sub-block sequences
        assert fa._pick_heads_per_program(8, 9216, 9216, 64, 1024, 1024, 2) == 1
        assert fa._pick_heads_per_program(5, 18432, 18432, 40, 1024, 1024, 2) == 1
        assert fa._pick_heads_per_program(8, 512, 18432, 40, 1024, 1024, 2) == 1
