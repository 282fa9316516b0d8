"""Pallas TPU flash attention for the UNet's spatial attention.

Replaces the reference's xformers `memory_efficient_attention` CUDA path
(`/root/reference/training/train.py:309-319`) with a TPU-native fused kernel:
per-(batch, head) program, online-softmax over KV chunks held in VMEM, fp32
accumulators, bf16-friendly MXU dots. No [L, L] probability matrix ever
materializes in HBM.

Envelope: head_dim <= 128, KV length divisible by a supported chunk size, and K+V
resident per head in VMEM (true for the SD2 UNet levels at 768px: L in {9216, 2304,
576}, D = 64). Shapes outside the envelope (VAE's single 512-dim head, tiny mid-block
sequences, GeoWizard's 2x-length joint KV at the top level) fall back to the XLA path
in kernels/attention.py via a ValueError the dispatcher catches.

The backward pass recomputes attention with XLA ops under a custom VJP — training
gets correct gradients while inference keeps the fused kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLOCK_Q = 256
_KV_CHUNKS = (512, 384, 256, 192, 128)
_MAX_KV_VMEM_BYTES = 6 * 1024 * 1024  # K+V per head budget

# CPU tests flip this to run the kernel under the Pallas interpreter
INTERPRET = False


def _pick_block_k(lk: int) -> Optional[int]:
    for c in _KV_CHUNKS:
        if lk % c == 0:
            return c
    return None


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    """One (batch*head, q-block) program: online softmax over VMEM-resident KV."""
    q = q_ref[0].astype(jnp.float32)  # [block_q, D]
    lk = k_ref.shape[1]
    block_q, d = q.shape

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [block_q, block_k]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, lk // block_k, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_bnld(q: Array, k: Array, v: Array, scale: float, block_k: int) -> Array:
    """[BN, L, D] x [BN, Lk, D] -> [BN, L, D]. Lk must divide block_k."""
    bn, lq, d = q.shape
    lk = k.shape[1]
    block_q = min(_BLOCK_Q, lq)

    # pad q-length to a block multiple; extra rows are sliced off after
    pad_q = (-lq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    lq_p = lq + pad_q

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bn, lq_p, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(bn, lq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=INTERPRET,
    )(q, k, v)
    if pad_q:
        out = out[:, :lq]
    return out


def _xla_reference(q: Array, k: Array, v: Array, scale: float) -> Array:
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_btnh(q: Array, k: Array, v: Array, scale: float, block_k: int) -> Array:
    """[B, L, N, D] flash attention (forward Pallas, backward XLA recompute)."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * n, lq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    out = _flash_bnld(qt, kt, vt, scale, block_k)
    return out.reshape(b, n, lq, d).transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, scale, block_k):
    return _flash_btnh(q, k, v, scale, block_k), (q, k, v)


def _flash_bwd(scale, block_k, res, g):
    q, k, v = res

    def f(q, k, v):
        return _xla_reference(q, k, v, scale)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


_flash_btnh.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: Array, k: Array, v: Array, *, scale: Optional[float] = None
) -> Array:
    """[B, L, N, D] multi-head attention; raises for unsupported shapes so the
    caller's dispatch falls back to XLA."""
    d = q.shape[-1]
    lk = k.shape[1]
    s = scale if scale is not None else d**-0.5
    block_k = _pick_block_k(lk)
    if (
        d > 128
        or block_k is None
        or 2 * lk * max(d, 128) * 4 > _MAX_KV_VMEM_BYTES
        or q.shape[1] < 256
    ):
        raise ValueError("shape outside the Pallas flash-attention envelope")
    return _flash_btnh(q, k, v, s, block_k)
