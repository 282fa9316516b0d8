"""Fused GroupNorm(+SiLU) -> 3x3 conv Pallas kernel (the VAE decoder hot path).

Why this exists (PERF.md, VERDICT r2 #1): at 768px the pipeline's #1 sink is
XLA's GroupNorm statistics fusion (a major-dim reduction emitted 5-10x off HBM
rate, ~25 ms of a 98.5 ms pipeline), and no XLA-expressible reformulation fixes
it (perf/gn_stats_sweep.py — every variant equal or worse; opaque stats ops
break the producer-fusion chain and lose MORE). The decoder resnet pair
GN->SiLU->conv3x3 costs ~5 ms per 768x768x128 layer in XLA against a ~1.4 ms
roofline. This kernel replaces the whole pair:

  stats   : one streaming pass (the validated per-channel Pallas stats kernel,
            `groupnorm._channel_stats`) -> tiny XLA fold to per-channel a/b
  conv    : ONE kernel; per grid step (batch b, row-block i) it
            - builds the padded activation strip act[(BR+2)*(W+2), C] in VMEM:
              silu(x*a + b) for rows i*BR-1 .. i*BR+BR (+1-row halos come in as
              two extra 1-row inputs with clamped index maps; borders zeroed)
            - computes the 3x3 conv as NINE contiguous 2D slices + 2D MXU dots:
              out_flat = sum_tap act_flat[dy*(W+2)+dx : +BR*(W+2)] @ w[dy,dx]
              (the classic shifted-flat trick: for j = r*(W+2)+w_col, the tap
              offsets are constant, so each tap is one unaligned-but-contiguous
              slice; the 2 junk columns per row are never written out)
            - writes out rows [i*BR, i*BR+BR)
  traffic : read x twice (stats + conv) + write out once, all at streaming
            rate, with the conv's MACs on the MXU at full 128-lane contraction
            -- vs XLA's read-x-3-times + slow stats + separate apply pass.

Numerics match the default path: fp32 statistics and normalization, bf16 conv
dots with fp32 accumulation. Backward is an XLA recompute under custom_vjp
(inference never differentiates this; training's VAE-decode remat recomputes
anyway). Dispatch is TPU-only, lane-aligned channels, SAME-padded stride-1 3x3;
everything else falls back to the composite XLA path. `E2EFT_KERNELS=xla` or
`E2EFT_GNCONV=off` disables it.

Reference behavior replaced: diffusers resnet GN->SiLU->conv pairs used by the
frozen VAE (`/root/reference/Marigold/marigold/marigold_pipeline.py:481-538`
delegates to diffusers' AutoencoderKL).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusion_e2e_ft_tpu.kernels.groupnorm import _channel_stats, _xla_group_norm

Array = jax.Array

INTERPRET = False
_ROW_BLOCK = 8  # output rows per grid step (H is always a multiple of 8 here)
_VMEM_BUDGET = 11 * 2**20  # conservative; fall back to XLA above this


def _xla_gn_conv(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias, residual):
    """Composite reference path (CPU tests, backward recompute, odd shapes).

    The conv runs in the compute dtype with NO mixed preferred_element_type
    (matching `nn.Conv(dtype=...)`): a bf16-in/fp32-out conv has no transposable
    XLA form, so differentiating it (the custom_vjp backward AND the direct
    fallback grad) would fail. The MXU still accumulates fp32 internally."""
    b, h, w, c = x.shape
    y = _xla_group_norm(x.reshape(b, h * w, c), gn_scale, gn_bias, groups, eps, silu)
    y = y.reshape(b, h, w, c).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, kernel.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    if conv_bias is not None:
        out = out + conv_bias.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


def _conv_kernel(ab_ref, xm_ref, xt_ref, xb_ref, w_ref, bias_ref, out_ref, act_ref,
                 *, br: int, width: int, cout: int, silu: bool, out_dtype):
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    wp = width + 2
    a = ab_ref[0, 0:1, :]  # [1, C] f32
    bvec = ab_ref[0, 1:2, :]

    def act(rows):  # [W, C] -> normalized (+SiLU), in the compute dtype
        y = rows.astype(jnp.float32) * a + bvec
        if silu:
            y = y * jax.nn.sigmoid(y)
        return y.astype(act_ref.dtype)

    # zero the whole padded strip (borders + halos default to conv zero-padding)
    act_ref[:] = jnp.zeros_like(act_ref)

    # interior rows: act rows p=1..BR map to x_mid rows 0..BR-1
    for p in range(1, br + 1):
        act_ref[p * wp + 1 : p * wp + 1 + width, :] = act(xm_ref[0, p - 1])

    # top halo (act row p=0) — real data unless this is the first row block
    @pl.when(i > 0)
    def _():
        act_ref[1 : 1 + width, :] = act(xt_ref[0, 0])

    # bottom halo (act row p=BR+1) — real data unless this is the last row block
    @pl.when(i < nb - 1)
    def _():
        base = (br + 1) * wp + 1
        act_ref[base : base + width, :] = act(xb_ref[0, 0])

    # 3x3 conv: nine contiguous flat slices, nine MXU dots, fp32 accumulation
    n_out = br * wp
    acc = jnp.broadcast_to(bias_ref[0:1, :].astype(jnp.float32), (n_out, cout))
    for dy in range(3):
        for dx in range(3):
            patch = act_ref[dy * wp + dx : dy * wp + dx + n_out, :]
            acc = acc + jax.lax.dot_general(
                patch, w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # write valid columns row by row (flat index r*(W+2) + col, cols 0..W-1)
    for r in range(br):
        out_ref[0, r] = acc[r * wp : r * wp + width, :].astype(out_dtype)


def _vmem_estimate(br: int, w: int, c: int, cout: int, itemsize: int) -> int:
    return (
        ((br + 2) * (w + 2) + 2) * c  # act strip (scratch)
        + 2 * br * w * c  # double-buffered x main blocks
        + 2 * 2 * w * c  # double-buffered 1-row halo blocks (top+bottom)
        + 2 * br * w * cout  # double-buffered output blocks
    ) * itemsize + br * (w + 2) * cout * 4 + 9 * c * cout * itemsize


def _pick_row_block(h: int, w: int, c: int, cout: int, itemsize: int) -> Optional[int]:
    for br in (_ROW_BLOCK, 4, 2, 1):
        if h % br == 0 and _vmem_estimate(br, w, c, cout, itemsize) <= _VMEM_BUDGET:
            return br
    return None


def _pallas_gn_conv(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias):
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    gs = c // groups
    br = _pick_row_block(h, w, c, cout, x.dtype.itemsize) or _ROW_BLOCK

    # --- stats: one streaming pass + tiny group fold -> per-channel a/b ---
    stats = _channel_stats(x.reshape(b, h * w, c))  # [B, 2, C] f32
    count = jnp.float32(h * w * gs)
    mean_g = stats[:, 0].reshape(b, groups, gs).sum(-1) / count
    var_g = jnp.maximum(
        stats[:, 1].reshape(b, groups, gs).sum(-1) / count - mean_g * mean_g, 0.0
    )
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, gs, axis=-1)  # [B, C]
    inv_c = jnp.repeat(inv_g, gs, axis=-1)
    a = inv_c * gn_scale.astype(jnp.float32)[None]
    bvec = gn_bias.astype(jnp.float32)[None] - mean_c * a
    ab = jnp.stack([a, bvec], axis=1)  # [B, 2, C]

    wk = kernel.astype(x.dtype)  # [3, 3, C, Cout] in compute dtype
    bias2 = (
        conv_bias.astype(jnp.float32).reshape(1, cout)
        if conv_bias is not None
        else jnp.zeros((1, cout), jnp.float32)
    )

    grid = (b, h // br)
    kernel_fn = functools.partial(
        _conv_kernel, br=br, width=w, cout=cout, silu=silu, out_dtype=x.dtype
    )
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, c), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, w, c), lambda bb, i: (bb, i, 0, 0), memory_space=pltpu.VMEM),
            # 1-row halos with clamped block indices (block row size 1 => block
            # index == row index); masked to zero at the image borders in-kernel
            pl.BlockSpec(
                (1, 1, w, c),
                lambda bb, i: (bb, jnp.maximum(i * br - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, c),
                lambda bb, i: (bb, jnp.minimum(i * br + br, h - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, c, cout), lambda bb, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, br, w, cout), lambda bb, i: (bb, i, 0, 0), memory_space=pltpu.VMEM
        ),
        # +2 junk rows: the dy=2,dx=2 tap slice ends at (br+2)*(w+2)+2
        scratch_shapes=[pltpu.VMEM(((br + 2) * (w + 2) + 2, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(ab, x, x, x, wk, bias2)


def _conv_kernel_v2(sb_ref, gmask_ref, xm_ref, xt_ref, xb_ref, w_ref, bias_ref,
                    out_ref, act_ref, stats_ref, ab_ref, *, br: int, width: int,
                    cout: int, silu: bool, out_dtype, eps: float, count: float):
    """Two-phase grid (b, 2*nb), sequential: steps [0, nb) stream per-channel
    fp32 [sum, sum_sq] into scratch; step nb folds channels->groups (one tiny
    [2,C]@[C,C] group-mask dot) into per-channel a/b; steps [nb, 2*nb) run the
    v1 normalize+SiLU+conv body off the scratch a/b. One pallas_call = no XLA
    stats boundary at all (the r2/r4 trace chain: every opaque op BETWEEN XLA
    fusions triggered layout wars; here stats/normalize/conv share the call)."""
    s = pl.program_id(1)
    nb = pl.num_programs(1) // 2
    wp = width + 2

    @pl.when(s == 0)
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    @pl.when(s < nb)
    def _():
        xf = xm_ref[0].astype(jnp.float32).reshape(br * width, -1)
        ssum = jnp.sum(xf, axis=0, keepdims=True)
        ssq = jnp.sum(xf * xf, axis=0, keepdims=True)
        stats_ref[:] = stats_ref[:] + jnp.concatenate([ssum, ssq], axis=0)

    @pl.when(s == nb)
    def _():
        # per-channel group moments: one [2,C]@[C,C] dot against the 0/1
        # same-group mask (runs ONCE per image, unlike the r1 per-block fold)
        g = jax.lax.dot_general(
            stats_ref[:], gmask_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mean_c = g[0:1] / count
        var_c = jnp.maximum(g[1:2] / count - mean_c * mean_c, 0.0)
        a = jax.lax.rsqrt(var_c + eps) * sb_ref[0:1]
        ab_ref[:] = jnp.concatenate([a, sb_ref[1:2] - mean_c * a], axis=0)

    @pl.when(s >= nb)
    def _():
        i = s - nb
        a = ab_ref[0:1, :]
        bvec = ab_ref[1:2, :]

        def act(rows):
            y = rows.astype(jnp.float32) * a + bvec
            if silu:
                y = y * jax.nn.sigmoid(y)
            return y.astype(act_ref.dtype)

        act_ref[:] = jnp.zeros_like(act_ref)
        for p in range(1, br + 1):
            act_ref[p * wp + 1 : p * wp + 1 + width, :] = act(xm_ref[0, p - 1])

        @pl.when(i > 0)
        def _():
            act_ref[1 : 1 + width, :] = act(xt_ref[0, 0])

        @pl.when(i < nb - 1)
        def _():
            base = (br + 1) * wp + 1
            act_ref[base : base + width, :] = act(xb_ref[0, 0])

        n_out = br * wp
        acc = jnp.broadcast_to(bias_ref[0:1, :].astype(jnp.float32), (n_out, cout))
        for dy in range(3):
            for dx in range(3):
                patch = act_ref[dy * wp + dx : dy * wp + dx + n_out, :]
                acc = acc + jax.lax.dot_general(
                    patch, w_ref[dy, dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        for r in range(br):
            out_ref[0, r] = acc[r * wp : r * wp + width, :].astype(out_dtype)


def _vmem_estimate_v2(br: int, w: int, c: int, cout: int, itemsize: int) -> int:
    return _vmem_estimate(br, w, c, cout, itemsize) + c * c * 4 + 4 * c * 4


def _pick_row_block_v2(h: int, w: int, c: int, cout: int, itemsize: int) -> Optional[int]:
    for br in (_ROW_BLOCK, 4, 2, 1):
        if h % br == 0 and _vmem_estimate_v2(br, w, c, cout, itemsize) <= _VMEM_BUDGET:
            return br
    return None


def _pallas_gn_conv_v2(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias):
    """Single-call GN(+SiLU)->conv3x3: stats + fold + normalize + conv in one
    pallas_call (see _conv_kernel_v2). HBM traffic: x read twice (stats pass +
    conv pass) + 2 row-halos per conv block + out written twice (the stats-phase
    block copies write garbage that the conv phase overwrites — Pallas copies
    the out buffer back every grid step); all streams at full rate."""
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    gs = c // groups
    br = _pick_row_block_v2(h, w, c, cout, x.dtype.itemsize) or _ROW_BLOCK
    nb = h // br

    sb = jnp.stack(
        [gn_scale.astype(jnp.float32), gn_bias.astype(jnp.float32)], axis=0
    )  # [2, C]
    gidx = jnp.arange(c, dtype=jnp.int32) // gs
    gmask = (gidx[:, None] == gidx[None, :]).astype(jnp.float32)  # [C, C]
    wk = kernel.astype(x.dtype)
    bias2 = (
        conv_bias.astype(jnp.float32).reshape(1, cout)
        if conv_bias is not None
        else jnp.zeros((1, cout), jnp.float32)
    )

    kernel_fn = functools.partial(
        _conv_kernel_v2, br=br, width=w, cout=cout, silu=silu, out_dtype=x.dtype,
        eps=float(eps), count=float(h * w * gs),
    )
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=(b, 2 * nb),
        in_specs=[
            pl.BlockSpec((2, c), lambda bb, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bb, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, br, w, c), lambda bb, s: (bb, s % nb, 0, 0), memory_space=pltpu.VMEM
            ),
            # 1-row halos (clamped; zeroed at the borders in-kernel). During the
            # stats phase they pin to row 0 so consecutive steps skip the DMA.
            pl.BlockSpec(
                (1, 1, w, c),
                lambda bb, s: (
                    bb, jnp.where(s < nb, 0, jnp.maximum((s - nb) * br - 1, 0)), 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, c),
                lambda bb, s: (
                    bb,
                    jnp.where(s < nb, 0, jnp.minimum((s - nb) * br + br, h - 1)),
                    0, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, c, cout), lambda bb, s: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bb, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, br, w, cout), lambda bb, s: (bb, s % nb, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM(((br + 2) * (w + 2) + 2, c), x.dtype),
            pltpu.VMEM((2, c), jnp.float32),  # streaming [sum, sum_sq]
            pltpu.VMEM((2, c), jnp.float32),  # folded per-channel [a, b]
        ],
        compiler_params=pltpu.CompilerParams(
            # both axes sequential: the stats scratch must complete before the
            # conv phase reads it, and resets at each new batch element
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(sb, gmask, x, x, x, wk, bias2)


def _impl() -> str:
    """Kernel implementation (trace-time): v1 = separate stats kernel + ab-input
    conv kernel (the r3 shape); v2 = single two-phase call with in-kernel stats."""
    return os.environ.get("E2EFT_GNCONV_IMPL", "v1")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias):
    if _impl() == "v2":
        return _pallas_gn_conv_v2(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias)
    return _pallas_gn_conv(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias)


def _fused_fwd(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias):
    return _fused(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias), (
        x, gn_scale, gn_bias, kernel, conv_bias,
    )


def _fused_bwd(groups, eps, silu, res, g):
    x, gn_scale, gn_bias, kernel, conv_bias = res

    def f(x, s, b, k, cb):
        return _xla_gn_conv(x, s, b, groups, eps, silu, k, cb, None)

    _, vjp = jax.vjp(f, x, gn_scale, gn_bias, kernel, conv_bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _use_pallas() -> bool:
    if os.environ.get("E2EFT_KERNELS") == "xla":
        return False
    if os.environ.get("E2EFT_GNCONV") == "off":
        return False
    if INTERPRET:
        return True
    return jax.devices()[0].platform == "tpu"


def gn_silu_conv3x3(
    x: Array,
    gn_scale: Array,
    gn_bias: Array,
    groups: int,
    eps: float,
    kernel: Array,  # [3, 3, C, Cout] HWIO
    conv_bias: Optional[Array],
    silu: bool = True,
    residual: Optional[Array] = None,
) -> Array:
    """GroupNorm(+SiLU) -> SAME 3x3 conv (+ optional residual add)."""
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    if conv_bias is None:
        conv_bias = jnp.zeros((cout,), jnp.float32)
    picker = _pick_row_block_v2 if _impl() == "v2" else _pick_row_block
    # E2EFT_GNCONV_CMAX=N restricts fusion to layers with C <= N (per-layer
    # dispatch sweeps: the 512-ch low-resolution layers are where the r4 trace
    # saw XLA-conv layout wars; image-resolution 128/256-ch layers are the win)
    cmax = int(os.environ.get("E2EFT_GNCONV_CMAX", "0")) or None
    usable = (
        _use_pallas()
        and c % groups == 0
        and c % 128 == 0
        and (cmax is None or max(c, cout) <= cmax)
        and kernel.shape[:2] == (3, 3)
        and picker(h, w, c, cout, x.dtype.itemsize) is not None
    )
    if usable:
        out = _fused(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias)
        if residual is not None:
            out = (out.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
        return out
    return _xla_gn_conv(x, gn_scale, gn_bias, groups, eps, silu, kernel, conv_bias, residual)
