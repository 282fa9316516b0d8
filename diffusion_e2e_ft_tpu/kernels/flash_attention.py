"""Pallas TPU flash attention for the UNet / VAE spatial attention.

Replaces the reference's xformers `memory_efficient_attention` CUDA path
(`/root/reference/training/train.py:309-319`) with a TPU-native fused kernel in the
canonical grid-over-KV form: grid = (batch*heads, q_blocks, kv_blocks) with the KV
axis innermost; online-softmax statistics (running max, denominator, accumulator)
live in VMEM scratch that persists across the KV axis, and the output block is
written once at the final KV step. No [L, L] probability matrix ever materializes,
and KV never needs to be fully VMEM-resident — so the VAE's single 512-dim head at
9216 tokens and GeoWizard's 2x-length joint KV are in-envelope.

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
# Preference order for the KV block: an on-chip trace sweep at the SD2 level-0
# shape ([5, 9216, 64]) measured 1024 fastest (1.54 ms vs 2.71 at 512, 1.76x),
# and the same on GeoWizard's joint KV ([10, 9216x2, 64]: 6.2 ms vs 11.0).
# Smaller chunks remain for sequence lengths 1024 doesn't divide.
_KV_CHUNKS = (1024, 1536, 512, 384, 256, 192, 128)

# CPU tests flip this to run the kernel under the Pallas interpreter
INTERPRET = False


def _pick_block_k(lk: int) -> Optional[int]:
    for c in _KV_CHUNKS:
        if lk % c == 0:
            return c
    return None


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale: float):
    """Grid (bn, qi, ki), ki innermost. Scratch (m, l, acc) carries the online
    softmax across ki; o is written at the last ki.

    MXU note: q/k/v stay in their input dtype (bf16 on TPU) for both dots —
    `preferred_element_type=f32` gives fp32 accumulation at full bf16 MXU rate.
    Upcasting the inputs first would silently run 8x-slower fp32 matmuls (measured:
    the 96x96-latent SD2 self-attention dropped from ~3.8 ms to sub-ms per call
    after this fix). Only the softmax runs in fp32 on the VPU."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [block_q, D], input dtype
    kb = k_ref[0]  # [block_k, D]
    vb = v_ref[0]

    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [block_q, block_k] fp32
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_bnld(q: Array, k: Array, v: Array, scale: float, block_k: int) -> Array:
    """[BN, Lq, D] x [BN, Lk, D] -> [BN, Lq, D]. block_k must divide Lk."""
    import os

    bn, lq, d = q.shape
    lk = k.shape[1]
    # small head dims leave MXU rows idle; a taller Q block restores occupancy
    # (trace sweep: 1024 beats 512 by another ~5% at d=64)
    default_bq = 1024 if d <= 64 else _BLOCK_Q
    block_q = min(int(os.environ.get("E2EFT_FA_BQ", default_bq)), lq)

    pad_q = (-lq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    lq_p = lq + pad_q

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bn, lq_p, d), q.dtype),
        grid=(bn, lq_p // block_q, lk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # denominator
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
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
    caller's dispatch falls back to XLA (head_dim > 512, KV not divisible by a
    supported chunk, or sequences too short to benefit)."""
    d = q.shape[-1]
    lk = k.shape[1]
    s = scale if scale is not None else d**-0.5
    block_k = _pick_block_k(lk)
    if d > 512 or block_k is None or q.shape[1] < 256:
        raise ValueError("shape outside the Pallas flash-attention envelope")
    return _flash_btnh(q, k, v, s, block_k)
