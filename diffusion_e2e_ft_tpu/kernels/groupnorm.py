"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

The UNet/VAE resnet blocks are GN -> SiLU -> conv chains; XLA computes GN as a
separate stats reduction + normalize, each a full HBM pass over the activation, with
the affine+SiLU sometimes fused and sometimes not. This kernel does the canonical
two-phase pass (grid axis: phase 0 accumulates per-group sums/squares in VMEM
scratch, phase 1 normalizes + affine + SiLU and writes) so the epilogue never costs
an extra pass.

Stats are fp32 regardless of IO dtype (matching the fp32-island policy). Backward is
an XLA recompute under custom_vjp. Dispatch mirrors kernels/attention.py: Pallas on
TPU, XLA everywhere else, toggleable.
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
    """Reference implementation (also the backward path)."""
    b, n, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, n, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out.reshape(b, n, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, acc_ref, *, groups: int, eps: float,
               silu: bool, n_rows: int):
    """Grid (B, 2, NB): phase 0 accumulates per-CHANNEL [sum, sumsq]; phase 1 folds
    channels into groups via an iota-mask matmul (everything stays 2-D and
    lane-aligned — Mosaic rejects small 1-D<->2-D reshapes) and writes."""
    phase = pl.program_id(1)
    i = pl.program_id(2)

    c = x_ref.shape[-1]
    gs = c // groups
    x = x_ref[0].astype(jnp.float32)  # [block_rows, C]
    block_rows = x.shape[0]

    # mask rows past the true length (padding contributes zeros)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0) + i * block_rows
    valid = (row_ids < n_rows).astype(jnp.float32)  # [block_rows, 1]

    @pl.when(jnp.logical_and(phase == 0, i == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        xv = x * valid
        acc_ref[0:1, :] = acc_ref[0:1, :] + jnp.sum(xv, axis=0, keepdims=True)
        acc_ref[1:2, :] = acc_ref[1:2, :] + jnp.sum(xv * xv, axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _():
        count = jnp.float32(n_rows * gs)
        # same-group mask [C, C]: channel j contributes to channel i iff same group
        gi = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // gs
        gj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // gs
        same = (gi == gj).astype(jnp.float32)
        group_sum = jax.lax.dot_general(
            acc_ref[0:1, :], same, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, C]: each channel's group total
        group_sq = jax.lax.dot_general(
            acc_ref[1:2, :], same, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mean_c = group_sum / count
        var_c = group_sq / count - mean_c * mean_c
        inv_c = jax.lax.rsqrt(var_c + eps)
        out = (x - mean_c) * inv_c
        out = out * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
        if silu:
            out = out * jax.nn.sigmoid(out)
        o_ref[0] = out.astype(o_ref.dtype)


def _pallas_group_norm(x: Array, scale: Array, bias: Array, groups: int, eps: float, silu: bool) -> Array:
    b, n, c = x.shape
    # keep the fp32 x block around 2-4MB of VMEM (the [C, C] group mask in phase 1
    # costs c*c*4 bytes on top)
    block = min(_ROW_BLOCK if c <= 512 else 512, n)
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    n_p = n + pad
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)

    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, silu=silu, n_rows=n),
        out_shape=jax.ShapeDtypeStruct((b, n_p, c), x.dtype),
        grid=(b, 2, n_p // block),
        in_specs=[
            pl.BlockSpec((1, block, c), lambda bb, p, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bb, p, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bb, p, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, c), lambda bb, p, i: (bb, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=INTERPRET,
    )(x, scale2, bias2)
    if pad:
        out = out[:, :n]
    return out


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


def group_norm_silu(
    x: Array,
    scale: Array,
    bias: Array,
    groups: int,
    eps: float,
    silu: bool = True,
) -> Array:
    """[B, H, W, C] (or [B, N, C]) fused GroupNorm(+SiLU); dispatches Pallas on TPU."""
    orig_shape = x.shape
    if x.ndim == 4:
        b, h, w, c = x.shape
        x3 = x.reshape(b, h * w, c)
    else:
        x3 = x
    c = x3.shape[-1]
    # OPT-IN only (E2EFT_GN=pallas): measured 3x slower than XLA's GN at SD2 shapes
    # on v5e (the per-block [C, C] group-fold matmul and the two-phase re-read
    # dominate); kept as a validated kernel for iteration, not the default path.
    usable = (
        os.environ.get("E2EFT_GN") == "pallas"
        and c % groups == 0
        and c % 128 == 0  # lane-aligned channels; odd widths go to XLA
        and (c // groups) >= 1
    )
    if usable:
        try:
            out = _fused(x3, scale, bias, groups, eps, silu)
        except Exception:
            out = _xla_group_norm(x3, scale, bias, groups, eps, silu)
    else:
        out = _xla_group_norm(x3, scale, bias, groups, eps, silu)
    return out.reshape(orig_shape)
