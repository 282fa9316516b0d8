"""Pallas TPU flash attention for the UNet / VAE spatial attention.

Replaces the reference's xformers `memory_efficient_attention` CUDA path
(`/root/reference/training/train.py:309-319`) with a TPU-native fused kernel in the
canonical grid-over-KV form: grid = (batch*heads, q_blocks, kv_blocks) with the KV
axis innermost; online-softmax statistics (running max, denominator, accumulator)
live in VMEM scratch that persists across the KV axis, and the output block is
written once at the final KV step. No [L, L] probability matrix ever materializes,
and KV never needs to be fully VMEM-resident — so the VAE's single 512-dim head at
9216 tokens and GeoWizard's 2x-length joint KV are in-envelope.

The backward pass is a pair of Pallas kernels in the FlashAttention-2 form: the
forward (when differentiated) additionally emits the per-row log-sum-exp, and the
backward recomputes probability blocks from (q, k, lse) to accumulate dq (grid over
KV) and dk/dv (grid over Q) without ever materializing the [L, L] matrix. The
delta term rowsum(dO*O) is a cheap minor-dim reduce left to XLA where it fuses
with the incoming cotangent. `E2EFT_FA_BWD=xla` restores the round-2 XLA-recompute
backward.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLOCK_Q = 256
# Preference order for the KV block. On-chip sweeps at the SD2 level-0 shape
# ([5, 9216, 64], `perf/hotops_sweep.py` exp A): (bq, bk) = (1536, 1536) runs
# 1.494 ms vs 2.173 at the old (1024, 1024) default — fewer grid programs
# (36/head vs 81) amortize the per-program prologue that dominates at small
# head dims, and 1536² still fits the 16 MB scoped-VMEM limit (2304² does not).
# 1024 remains next (r2 sweep: 1.54 ms vs 2.71 at 512 on the same shape);
# smaller chunks remain for sequence lengths the big blocks don't divide.
_KV_CHUNKS = (1536, 1024, 768, 512, 384, 256, 192, 128)
# At d < 64 (GeoWizard/SD1.5 level-0 heads, d=40) the r5 exp-E sweep at
# [8, 18432, 40] INVERTS the d=64 result: (1024,1024)=8.87 ms beats
# (1536,1536)=10.20 ms and every taller-q variant (1536q=8.98, 2304q=9.54,
# 512q=10.23) — at 40 contraction lanes the bigger block's extra VMEM pressure
# buys no MXU occupancy, so 1024-first there (PERF.md r5).
_KV_CHUNKS_NARROW = (1024, 1536, 768, 512, 384, 256, 192, 128)
# At d > 64 (the VAE's single 512-dim head) the K/V blocks are 8x wider in VMEM
# and the grid already has few programs, so the 1536 preference is unmeasured
# upside with real OOM risk — keep the r2-swept 1024-first order there.
_KV_CHUNKS_WIDE = (1024, 768, 512, 384, 256, 192, 128)

# CPU tests flip this to run the kernel under the Pallas interpreter
INTERPRET = False


def _pick_block_k(lk: int, d: int = 64) -> Optional[int]:
    """Pick the KV block. Exact divisors are preferred (no wasted programs);
    when the best exact divisor is small (< 512 — e.g. the 480x640 train
    sequence L=4800 only divides by 192), KV is instead zero-PADDED to the next
    multiple of a big block and the kernels mask the padded columns to -inf
    (exact math, bounded waste) — per-program prologue dominates at small head
    dims, so 5 padded 1024-programs beat 25 exact 192-programs."""
    env = os.environ.get("E2EFT_FA_BK")  # perf-sweep override (trace-time)
    if env and lk >= int(env):
        # honored only when KV is at least one block long: a process-wide
        # override must not make CROSS-attention (Lk=77) zero-pad to a full
        # self-attention block (~95% wasted columns) during kernel sweeps
        # (ADVICE r4). Sweeps that need sub-length blocks call the kernel
        # directly with an explicit block_k.
        return int(env)
    if d > 64:
        chunks = _KV_CHUNKS_WIDE
    elif d < 64:
        chunks = _KV_CHUNKS_NARROW
    else:
        chunks = _KV_CHUNKS
    exact = next((c for c in chunks if lk % c == 0), None)
    if exact is not None and exact >= 512:
        return exact
    # padded candidates, preference order matching the swept chunk order:
    # d == 64 -> fewest programs first, tie -> big block (1536 wins exp A);
    # d < 64  -> 1024 first (exp E); d > 64 -> 1024 only (VMEM)
    if d == 64:
        best = None
        for c in (1536, 1024):
            pad = (-lk) % c
            if lk >= c and pad / (lk + pad) <= 0.20:
                cand = (-(-lk // c), -c, c)
                if best is None or cand < best:
                    best = cand
        if best is not None:
            return best[2]
    else:
        for c in (1024, 1536) if d < 64 else (1024,):
            pad = (-lk) % c
            if lk >= c and pad / (lk + pad) <= 0.20:
                return c
    return exact


def _default_bq(lq: int, d: int) -> int:
    """Q-block default by head dim: at d == 64 the r4 exp-A sweep showed 1536
    wins when it divides Lq (padding a 4800-token train sequence to 6144 wastes
    28%); at d < 64 the r5 exp-E sweep showed 1024 beats every taller block."""
    if d > 64:
        return _BLOCK_Q
    if d < 64:
        return 1024
    return 1536 if lq % 1536 == 0 else 1024


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale: float,
                  kv_len: Optional[int] = None):
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
    s = _mask_padded_cols(s, ki, kv_len)
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


def _mask_padded_cols(s, ki, kv_len: Optional[int]):
    """-inf the logit columns beyond the real KV length (zero-padded K rows
    would otherwise contribute exp(0-m) to the softmax denominator). kv_len is
    trace-time static: the exact-divisor path compiles with no masking at all;
    only the final, partially-padded block pays the select."""
    if kv_len is None:
        return s
    block_k = s.shape[-1]
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < kv_len, s, -jnp.inf)


def _pad_kv(k: Array, v: Array, block_k: int):
    """Zero-pad K/V length to a block_k multiple; returns (k, v, lk_padded,
    kv_len) where kv_len is the real length when padded, else None (the kernels
    compile with no masking at all on the exact-divisor path)."""
    lk = k.shape[1]
    pad_k = (-lk) % block_k
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    return k, v, lk + pad_k, (lk if pad_k else None)


def _flash_kernel_mh(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                     scale: float, hp: int, kv_len: Optional[int] = None):
    """hp-heads-per-program forward: identical online-softmax math to
    `_flash_kernel`, looped over the hp heads resident in each block. The loop
    is sequential inside one program, so the per-program prologue (grid
    bookkeeping, DMA issue/wait) amortizes over hp heads — the lever VERDICT r4
    named for the program-overhead-bound GeoWizard joint shape [8, 18432, 40]
    (exp E: measured time sits 1.26x above the d-padded MXU floor with block
    shape exhausted). Scratch carries all hp heads' (m, l, acc) stacked along
    rows; the [bq, bk] fp32 logits transients are reused across loop iterations
    by the compiler (the loop is data-independent across h)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    bq = q_ref.shape[1]

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for h in range(hp):
        rows = slice(h * bq, (h + 1) * bq)
        s = jax.lax.dot_general(
            q_ref[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = _mask_padded_cols(s, ki, kv_len)
        m_prev = m_ref[rows]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        m_ref[rows] = m_new
        l_ref[rows] = l_ref[rows] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[rows] = acc_ref[rows] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk - 1)
    def _():
        for h in range(hp):
            rows = slice(h * bq, (h + 1) * bq)
            o_ref[h] = (acc_ref[rows] / l_ref[rows]).astype(o_ref.dtype)


def _pick_heads_per_program(bn: int, lq: int, lk: int, d: int,
                            block_q: int, block_k: int, itemsize: int) -> int:
    """E2EFT_FA_HP overrides (sweep knob); default 1 until the on-chip sweep
    (hotops exp F) proves a win worth promoting. Multi-head packing only
    applies to narrow heads (d < 64) where programs are prologue-bound, and
    must keep the VMEM envelope: hp scales the q/k/v/out blocks and the acc
    scratch but NOT the dominant [bq, bk] fp32 logits transients."""
    import os

    hp = int(os.environ.get("E2EFT_FA_HP", "1"))
    if hp <= 1 or d >= 64 or bn % hp or lq < block_q or lk < block_k:
        return 1
    blocks = hp * (2 * (block_q + 2 * block_k) * d * itemsize + block_q * d * 4)
    if blocks + 3 * block_q * block_k * 4 > 14 * 2**20:
        return 1
    return hp


def _flash_bnld(q: Array, k: Array, v: Array, scale: float, block_k: int) -> Array:
    """[BN, Lq, D] x [BN, Lk, D] -> [BN, Lq, D]. KV is zero-padded to a block_k
    multiple and masked in-kernel when block_k does not divide Lk."""
    import os

    bn, lq, d = q.shape
    block_q = min(int(os.environ.get("E2EFT_FA_BQ", _default_bq(lq, d))), lq)

    pad_q = (-lq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    lq_p = lq + pad_q
    k, v, lk_p, kv_len = _pad_kv(k, v, block_k)
    hp = _pick_heads_per_program(bn, lq, k.shape[1], d, block_q, block_k,
                                 q.dtype.itemsize)

    if hp > 1:
        kernel = functools.partial(_flash_kernel_mh, scale=scale, hp=hp, kv_len=kv_len)
        scratch_rows = hp * block_q
    else:
        kernel = functools.partial(_flash_kernel, scale=scale, kv_len=kv_len)
        scratch_rows = block_q
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bn, lq_p, d), q.dtype),
        grid=(bn // hp, lq_p // block_q, lk_p // block_k),
        in_specs=[
            pl.BlockSpec((hp, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (hp, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((scratch_rows, 1), jnp.float32),  # running max
            pltpu.VMEM((scratch_rows, 1), jnp.float32),  # denominator
            pltpu.VMEM((scratch_rows, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v)
    if pad_q:
        out = out[:, :lq]
    return out


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                      scale: float, kv_len: Optional[int] = None):
    """Forward that also writes per-row log-sum-exp (the backward residual)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = _mask_padded_cols(s, ki, kv_len)
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
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _flash_bnld_lse(q: Array, k: Array, v: Array, scale: float, block_k: int):
    """Forward returning (out, lse). lse is fp32 [BN, Lq, 1] (padded rows sliced)."""
    import os

    bn, lq, d = q.shape
    block_q = min(int(os.environ.get("E2EFT_FA_BQ", _default_bq(lq, d))), lq)
    pad_q = (-lq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    lq_p = lq + pad_q
    k, v, lk_p, kv_len = _pad_kv(k, v, block_k)

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel_lse, scale=scale, kv_len=kv_len),
        out_shape=(
            jax.ShapeDtypeStruct((bn, lq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bn, lq_p, 1), jnp.float32),
        ),
        grid=(bn, lq_p // block_q, lk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v)
    if pad_q:
        out = out[:, :lq]
        lse = lse[:, :lq]
    return out, lse


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref, acc_ref, *,
               scale: float, kv_len: Optional[int] = None):
    """Grid (bn, qi, ki), ki innermost: dq[qi] += (p ∘ (dO·Vᵀ − Δ)) · K · scale."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = _mask_padded_cols(s, ki, kv_len)
    p = jnp.exp(s - lse_ref[0])  # [bq, bk], lse broadcasts from [bq, 1]
    dp = jax.lax.dot_general(
        do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - dd_ref[0]) * scale
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        ds.astype(kb.dtype), kb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale: float, kv_len: Optional[int] = None):
    """Grid (bn, ki, qi), qi innermost: dv[ki] += pᵀ·dO; dk[ki] += dsᵀ·Q·scale."""
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = _mask_padded_cols(s, pl.program_id(1), kv_len)
    p = jnp.exp(s - lse_ref[0])  # [bq, bk]
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - dd_ref[0]) * scale
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_bnld(q, k, v, do, out, lse, scale: float, block_k: int):
    """[BN, L, D] backward. Zero-padded q/do rows are self-masking: padded dO rows
    zero their dv/dk contributions and Δ=0 zeros ds (q pads to zeros in fwd, so
    lse stays finite — no inf·0)."""
    import os

    bn, lq, d = q.shape
    lk = k.shape[1]
    block_q = min(int(os.environ.get("E2EFT_FA_BQ", _default_bq(lq, d))), lq)
    # ADVICE r4 (medium): the backward kernels keep several [bq, bk] fp32
    # temporaries live (s, p, dp, ds) — the 1536^2 blocks that fit the FORWARD's
    # VMEM envelope exceed the 16 MB scoped limit when differentiated, and the
    # failure is an XLA-compile-time Mosaic error outside attention.py's
    # trace-time fallback. The backward's blocks need not match the forward's
    # (s/p are recomputed from q/k/lse under any partition), so cap both at the
    # r3-training-validated 1024. K/V are re-padded below for the capped block.
    block_q = min(block_q, 1024)
    block_k = min(block_k, 1024)
    pad_q = (-lq) % block_q

    dd = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, pad_q), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, pad_q), (0, 0)))
        dd = jnp.pad(dd, ((0, 0), (0, pad_q), (0, 0)))
    lq_p = lq + pad_q
    k, v, lk_p, kv_len = _pad_kv(k, v, block_k)

    q_spec_qk = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    k_spec_qk = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    r_spec_qk = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_len=kv_len),
        out_shape=jax.ShapeDtypeStruct((bn, lq_p, d), q.dtype),
        grid=(bn, lq_p // block_q, lk_p // block_k),
        in_specs=[q_spec_qk, k_spec_qk, k_spec_qk, q_spec_qk, r_spec_qk, r_spec_qk],
        out_specs=q_spec_qk,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v, do, lse, dd)

    q_spec_kq = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    k_spec_kq = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    r_spec_kq = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, kv_len=kv_len),
        out_shape=(
            jax.ShapeDtypeStruct((bn, lk_p, d), k.dtype),
            jax.ShapeDtypeStruct((bn, lk_p, d), v.dtype),
        ),
        grid=(bn, lk_p // block_k, lq_p // block_q),
        in_specs=[q_spec_kq, k_spec_kq, k_spec_kq, q_spec_kq, r_spec_kq, r_spec_kq],
        out_specs=(k_spec_kq, k_spec_kq),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v, do, lse, dd)

    if pad_q:
        dq = dq[:, :lq]
    if kv_len is not None:
        dk = dk[:, :lk]
        dv = dv[:, :lk]
    return dq, dk, dv


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


def _use_pallas_bwd() -> bool:
    import os

    return os.environ.get("E2EFT_FA_BWD", "pallas") != "xla"


def _flash_fwd(q, k, v, scale, block_k):
    if not _use_pallas_bwd():
        return _flash_btnh(q, k, v, scale, block_k), (q, k, v, None, None)
    b, lq, n, d = q.shape
    lk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * n, lq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    out, lse = _flash_bnld_lse(qt, kt, vt, scale, block_k)
    return out.reshape(b, n, lq, d).transpose(0, 2, 1, 3), (q, k, v, out, lse)


def _flash_bwd(scale, block_k, res, g):
    q, k, v, out_bnld, lse = res
    if out_bnld is None:  # E2EFT_FA_BWD=xla: round-2 recompute fallback
        def f(q, k, v):
            return _xla_reference(q, k, v, scale)

        _, vjp = jax.vjp(f, q, k, v)
        return vjp(g)
    b, lq, n, d = q.shape
    lk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * n, lq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    gt = g.transpose(0, 2, 1, 3).reshape(b * n, lq, d)
    dq, dk, dv = _flash_bwd_bnld(qt, kt, vt, gt, out_bnld, lse, scale, block_k)
    dq = dq.reshape(b, n, lq, d).transpose(0, 2, 1, 3)
    dk = dk.reshape(b, n, lk, d).transpose(0, 2, 1, 3)
    dv = dv.reshape(b, n, lk, d).transpose(0, 2, 1, 3)
    return dq, dk, dv


_flash_btnh.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: Array, k: Array, v: Array, *, scale: Optional[float] = None
) -> Array:
    """[B, L, N, D] multi-head attention; raises for unsupported shapes so the
    caller's dispatch falls back to XLA (head_dim > 512, KV too short for any
    block, or sequences too short to benefit)."""
    d = q.shape[-1]
    lk = k.shape[1]
    s = scale if scale is not None else d**-0.5
    block_k = _pick_block_k(lk, d)
    if d > 512 or block_k is None or q.shape[1] < 256:
        raise ValueError("shape outside the Pallas flash-attention envelope")
    return _flash_btnh(q, k, v, s, block_k)
