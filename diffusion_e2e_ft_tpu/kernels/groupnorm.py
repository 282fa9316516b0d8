"""GroupNorm(+SiLU) with a Pallas TPU statistics kernel.

Profiling the 768px pipeline (r2 trace, PERF.md) showed XLA's GroupNorm splits into
two fusions: a per-channel stats reduction and a normalize+affine elementwise. The
NORMALIZE fusion already streams at near HBM rate, but the STATS fusion runs ~15x
off memory bandwidth (~54 GB/s on 75M-element decoder activations — padded-predicate
masked reduce). So only the stats pass is worth a kernel:

  * Pallas stats kernel: grid (B, row_blocks), each step accumulates per-CHANNEL
    fp32 [sum, sum_sq] over a [rows, C] block in VMEM scratch — a pure sublane
    reduction at streaming rate. Zero-padding needs no mask: zeros contribute
    nothing to either moment (the count uses the true row count).
  * Group fold (C -> groups), mean/var, and the normalize+affine+SiLU apply stay in
    XLA, where they fuse with neighbors and already run near roofline.

This replaces round 1's fully-fused two-phase kernel whose per-block [C, C]
group-fold matmul made it 3x SLOWER than XLA. Stats are fp32 regardless of IO dtype
(fp32-island policy). Backward is an XLA recompute under custom_vjp.

Dispatch: the lane-friendly XLA reduce is the DEFAULT everywhere (see
`_use_pallas`) — inserting the Pallas stats call perturbs XLA's layout/fusion
decisions around the neighboring convs and regresses the full pipeline. The Pallas
stats kernel is opt-in via `E2EFT_GN=pallas` (or the interpreter in CPU tests);
`E2EFT_KERNELS=xla` force-disables every Pallas path.
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

INTERPRET = False
_ROW_BLOCK = 1024  # spatial rows per grid step (flattened HW)


def _xla_group_norm(x: Array, scale: Array, bias: Array, groups: int, eps: float, silu: bool) -> Array:
    """XLA GroupNorm, written lane-friendly.

    The naive `reshape(b, n, G, c/G).mean(axis=(1, 3))` reduces over a SPLIT of the
    minor (channel/lane) dim — on TPU that lowers to a padded masked reduce running
    ~15x off HBM bandwidth (measured 2.8 ms on a 75M-element decoder activation
    where the read costs 0.2 ms). Reducing per-CHANNEL over the major dim keeps
    lanes intact and streams at full rate; the tiny C->G fold happens on [B, C].
    One-pass moments (E[x^2] - E[x]^2) in fp32 keep it to a single read."""
    b, n, c = x.shape
    gs = c // groups
    xf = x.astype(jnp.float32)
    if x.dtype == jnp.bfloat16 and os.environ.get("E2EFT_GN_STATS") == "mxu":
        # OPT-IN MXU statistics (E2EFT_GN_STATS=mxu): per-channel sum as a bf16
        # mat-vec + sum-of-squares as the diagonal of the bf16 Gram matrix x^T x
        # (bf16xbf16 products are exact in fp32; fp32 accumulation = the
        # fp32-island semantics, only summation order differs). In-isolation
        # roofline says <0.4 ms/layer, but IN the pipeline the dot custom-call
        # breaks the producer fusion chain (like the Pallas stats kernel):
        # measured 126 ms vs 98.5 ms at 768px, so the fused lane-friendly
        # reduce below stays the default despite its 5-10x-off-bandwidth stats.
        ones = jnp.ones((n,), jnp.bfloat16)
        s = jnp.einsum("n,bnc->bc", ones, x, preferred_element_type=jnp.float32)
        gram = jnp.einsum("bnc,bnd->bcd", x, x, preferred_element_type=jnp.float32)
        ss = jnp.diagonal(gram, axis1=1, axis2=2)
    else:
        s = jnp.sum(xf, axis=1)  # [B, C] — major-dim reduce, lane-aligned
        ss = jnp.sum(xf * xf, axis=1)
    count = jnp.float32(n * gs)
    mean_g = s.reshape(b, groups, gs).sum(-1) / count  # [B, G]
    # one-pass E[x^2]-E[x]^2 can go slightly negative from cancellation when
    # |mean| >> std; clamp before rsqrt (fp32 stats keep the tolerance tight —
    # pinned by the large-mean torch-parity test)
    var_g = jnp.maximum(ss.reshape(b, groups, gs).sum(-1) / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, gs, axis=-1)[:, None, :]  # [B, 1, C]
    inv_c = jnp.repeat(inv_g, gs, axis=-1)[:, None, :]
    out = (xf - mean_c) * inv_c
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _stats_kernel(x_ref, o_ref, acc_ref):
    """Grid (B, NB): accumulate per-channel fp32 [sum, sum_sq]; write at last block."""
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # [block, C]
    acc_ref[0:1, :] = acc_ref[0:1, :] + jnp.sum(x, axis=0, keepdims=True)
    acc_ref[1:2, :] = acc_ref[1:2, :] + jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(i == nb - 1)
    def _():
        o_ref[0] = acc_ref[:]


def _channel_stats(x: Array) -> Array:
    """[B, N, C] -> fp32 [B, 2, C] per-channel (sum, sum_sq) via one streaming pass."""
    b, n, c = x.shape
    block = min(_ROW_BLOCK, n)
    pad = (-n) % block
    if pad:
        # zero rows are moment-neutral; no in-kernel mask needed
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    n_p = n + pad
    return pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        grid=(b, n_p // block),
        in_specs=[
            pl.BlockSpec((1, block, c), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(x)


def _pallas_group_norm(x: Array, scale: Array, bias: Array, groups: int, eps: float, silu: bool) -> Array:
    b, n, c = x.shape
    gs = c // groups
    stats = _channel_stats(x)  # [B, 2, C] fp32
    gsum = stats[:, 0].reshape(b, groups, gs).sum(-1)  # [B, G]
    gsq = stats[:, 1].reshape(b, groups, gs).sum(-1)
    count = jnp.float32(n * gs)
    mean_g = gsum / count
    var_g = jnp.maximum(gsq / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # expand to per-channel for a flat [B, 1, C] broadcast in the apply
    mean_c = jnp.repeat(mean_g, gs, axis=-1)[:, None, :]
    inv_c = jnp.repeat(inv_g, gs, axis=-1)[:, None, :]
    out = (x.astype(jnp.float32) - mean_c) * inv_c
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x: Array, scale: Array, bias: Array, groups: int, eps: float, silu: bool) -> Array:
    return _pallas_group_norm(x, scale, bias, groups, eps, silu)


def _fused_fwd(x, scale, bias, groups, eps, silu):
    return _fused(x, scale, bias, groups, eps, silu), (x, scale, bias)


def _fused_bwd(groups, eps, silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _xla_group_norm(x, s, b, groups, eps, silu), x, scale, bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _use_pallas() -> bool:
    # OPT-IN only (E2EFT_GN=pallas). Measured on v5e at 768px: inserting the Pallas
    # stats call changes XLA's layout/fusion decisions so the NEIGHBORING decoder
    # convolutions stop lowering to the fast conv custom-call (pipeline 109 -> 379
    # ms). The lane-friendly XLA formulation above gets the stats speedup without
    # perturbing conv lowering, so it is the default everywhere.
    if os.environ.get("E2EFT_KERNELS") == "xla":
        return False
    return os.environ.get("E2EFT_GN") == "pallas" or INTERPRET


def group_norm_silu(
    x: Array,
    scale: Array,
    bias: Array,
    groups: int,
    eps: float,
    silu: bool = True,
) -> Array:
    """[B, H, W, C] (or [B, N, C]) GroupNorm(+SiLU); Pallas stats kernel on TPU."""
    orig_shape = x.shape
    if x.ndim == 4:
        b, h, w, c = x.shape
        x3 = x.reshape(b, h * w, c)
    else:
        x3 = x
    c = x3.shape[-1]
    # Ablation hooks require the explicit E2EFT_PERF=1 opt-in as well: a leaked
    # E2EFT_GN_ABLATE alone must not silently poison production graphs (the
    # wrong-math graph would even persist in the compile cache) — ADVICE r4.
    ablate = (
        os.environ.get("E2EFT_GN_ABLATE")
        if os.environ.get("E2EFT_PERF") == "1"
        else None
    )
    if ablate:
        # MEASUREMENT-ONLY cost decomposition (perf/gn_stats_sweep.py, PERF.md r4):
        # 'const' keeps the normalize+affine(+SiLU) apply but skips the stats
        # pass; 'none' removes GroupNorm entirely. Output values are wrong.
        if ablate == "none":
            return x
        if ablate == "const":
            xf = x3.astype(jnp.float32)
            out = (xf - 0.1) * 1.01 * scale.astype(jnp.float32) + bias.astype(jnp.float32)
            if silu:
                out = out * jax.nn.sigmoid(out)
            return out.astype(x.dtype).reshape(orig_shape)
    usable = (
        _use_pallas()
        and c % groups == 0
        and c % 128 == 0  # lane-aligned channels; odd widths go to XLA
    )
    if usable:
        try:
            out = _fused(x3, scale, bias, groups, eps, silu)
        except Exception:
            out = _xla_group_norm(x3, scale, bias, groups, eps, silu)
    else:
        out = _xla_group_norm(x3, scale, bias, groups, eps, silu)
    return out.reshape(orig_shape)
