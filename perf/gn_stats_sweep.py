"""On-chip A/B sweep of GroupNorm statistics formulations (PERF.md's #1 sink).

The round-2 trace showed GN stats tuple-fusions running 5-10x off HBM rate
(~25 ms of a 98.5 ms pipeline at 768px), and that any *opaque* replacement
(Pallas stats kernel, MXU Gram matmul) breaks XLA's producer-fusion chain and
loses more than it wins. This sweep measures candidate XLA-expressible
reformulations inside a realistic resnet sandwich

    y = x + conv2(gn_silu(conv1(gn_silu(x))))

at VAE-decoder shapes, using device-time traces (perf/xprof.py), and reports
both the total and the conv-custom-call share (to catch the fusion trap).

Run on the chip: `python perf/gn_stats_sweep.py [BxHxWxC ...]`
"""

from __future__ import annotations

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")
from xprof import bucket, trace_device_times  # noqa: E402


def _roundtrip_seconds(x) -> float:
    """Dispatch->fetch roundtrip measured on an ALREADY-READY value (ADVICE r4:
    a baked-in tunnel constant clamps sub-ms variants to ~0 on non-tunnel
    hosts). Same approach as bench.py::_timeit."""
    import time

    import numpy as np

    leaf = jax.tree.leaves(x)[0]
    float(np.asarray(leaf[(0,) * leaf.ndim]))  # ensure ready
    t0 = time.perf_counter()
    float(np.asarray(leaf[(0,) * leaf.ndim]))
    return time.perf_counter() - t0


def chained_seconds(step_fn, x0, iters: int = 30, warmup: int = 3) -> float:
    """Per-iteration device time via ITERS data-DEPENDENT applications of
    step_fn (x -> same-shaped x) ended by a scalar fetch.

    Through the axon tunnel `block_until_ready` acks EARLY (a 4096^3 bf16 matmul
    'measured' 6464 TFLOP/s on a 197 TFLOP/s chip), and profiler sessions can
    wedge >14 min — so neither async-amortized walls nor traces are usable.
    Chaining forces serial device execution and the final element fetch is a
    true sync; calibration: chained 4096^3 matmul = 167.7 TFLOP/s (85% peak)."""
    import time

    import numpy as np

    def sync_scalar(x):
        # fetch ONE element (device-side slice first): np.asarray(x) would pull
        # the whole buffer through the ~50 MB/s tunnel and dominate the timing
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    x = x0
    for _ in range(warmup):
        x = step_fn(x)
    sync_scalar(x)
    roundtrip = _roundtrip_seconds(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step_fn(x)
    sync_scalar(x)
    return max((time.perf_counter() - t0 - roundtrip) / iters, 0.0)

GROUPS = 32
EPS = 1e-6


# ---------------------------------------------------------------------------
# stats variants: [B, N, C] -> (sum[B,C], sumsq[B,C]) fp32
# ---------------------------------------------------------------------------

def stats_current(x):
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=1), jnp.sum(xf * xf, axis=1)


def stats_packed(x):
    xf = x.astype(jnp.float32)
    both = jnp.concatenate([xf, xf * xf], axis=-1)
    s = jnp.sum(both, axis=1)
    c = x.shape[-1]
    return s[:, :c], s[:, c:]


def stats_dtypearg(x):
    # bf16 products, fp32 accumulation (sum with dtype=) — one convert less
    return (
        jnp.sum(x, axis=1, dtype=jnp.float32),
        jnp.sum(x * x, axis=1, dtype=jnp.float32),
    )


def _twostage(x, k):
    b, n, c = x.shape
    assert n % k == 0
    xf = x.astype(jnp.float32).reshape(b, n // k, k, c)
    return (
        jnp.sum(xf, axis=(1, 2)),
        jnp.sum(xf * xf, axis=(1, 2)),
    )


def stats_twostage_explicit(x):
    """Manually staged partial reduce: [B,N,C] -> [B,N/k,C] -> [B,C]."""
    b, n, c = x.shape
    k = 512
    while n % k:
        k //= 2
    xf = x.astype(jnp.float32).reshape(b, n // k, k, c)
    ps = jnp.sum(xf, axis=2)
    pss = jnp.sum(xf * xf, axis=2)
    return jnp.sum(ps, axis=1), jnp.sum(pss, axis=1)


def stats_variadic(x):
    xf = x.astype(jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    s, ss = jax.lax.reduce(
        (xf, xf * xf),
        (zero, zero),
        lambda a, b: (a[0] + b[0], a[1] + b[1]),
        dimensions=(1,),
    )
    return s, ss


def stats_transposed(x):
    # XLA's major-dim ("column") reduction is the measured 5-10x-off path; pay an
    # explicit transpose (2 streams at HBM rate) to make it a minor-dim reduction
    xf = x.astype(jnp.float32)
    xt = jnp.swapaxes(xf, 1, 2)  # [B, C, N]
    return jnp.sum(xt, axis=2), jnp.sum(xt * xt, axis=2)


def stats_pallas(x):
    from diffusion_e2e_ft_tpu.kernels.groupnorm import _channel_stats

    st = _channel_stats(x)
    return st[:, 0], st[:, 1]


VARIANTS = {
    "current": stats_current,
    "packed": stats_packed,
    "dtypearg": stats_dtypearg,
    "twostage": stats_twostage_explicit,
    "variadic": stats_variadic,
    "transposed": stats_transposed,
    "pallas": stats_pallas,
}


def gn_silu_4d(x4, scale, bias):
    """Stats reduced on the 4D NHWC tensor directly (axis=(1,2)) — no [B,N,C]
    reshape, which may be what forces the retiled bf16 copy in the tuple fusion."""
    b, h, w, c = x4.shape
    gs = c // GROUPS
    xf = x4.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2))
    ss = jnp.sum(xf * xf, axis=(1, 2))
    count = jnp.float32(h * w * gs)
    mean_g = s.reshape(b, GROUPS, gs).sum(-1) / count
    var_g = jnp.maximum(ss.reshape(b, GROUPS, gs).sum(-1) / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + EPS)
    mean_c = jnp.repeat(mean_g, gs, axis=-1)[:, None, None, :]
    inv_c = jnp.repeat(inv_g, gs, axis=-1)[:, None, None, :]
    out = (xf - mean_c) * inv_c * scale + bias
    out = out * jax.nn.sigmoid(out)
    return out.astype(x4.dtype)


def gn_silu(x4, scale, bias, stats_fn):
    b, h, w, c = x4.shape
    gs = c // GROUPS
    x3 = x4.reshape(b, h * w, c)
    s, ss = stats_fn(x3)
    count = jnp.float32(h * w * gs)
    mean_g = s.reshape(b, GROUPS, gs).sum(-1) / count
    var_g = jnp.maximum(ss.reshape(b, GROUPS, gs).sum(-1) / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + EPS)
    mean_c = jnp.repeat(mean_g, gs, axis=-1)[:, None, None, :]
    inv_c = jnp.repeat(inv_g, gs, axis=-1)[:, None, None, :]
    out = (x4.astype(jnp.float32) - mean_c) * inv_c * scale + bias
    out = out * jax.nn.sigmoid(out)
    return out.astype(x4.dtype)


def conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def make_sandwich(stats_fn):
    @jax.jit
    def f(x, w1, w2, sc1, bi1, sc2, bi2):
        h = gn_silu(x, sc1, bi1, stats_fn)
        h = conv3x3(h, w1)
        h = gn_silu(h, sc2, bi2, stats_fn)
        h = conv3x3(h, w2)
        return x + h

    return f


def make_sandwich_ablation(mode: str):
    """Cost decomposition: 'conv_only' drops GN entirely; 'no_stats' keeps the
    normalize+affine+SiLU apply but with constant mean/inv (no stats pass). Then
    stats cost = full - no_stats, apply cost = no_stats - conv_only."""

    def gn_apply_const(x4, scale, bias):
        xf = x4.astype(jnp.float32)
        out = (xf - 0.1) * 1.01 * scale + bias
        out = out * jax.nn.sigmoid(out)
        return out.astype(x4.dtype)

    @jax.jit
    def f(x, w1, w2, sc1, bi1, sc2, bi2):
        h = x if mode == "conv_only" else gn_apply_const(x, sc1, bi1)
        h = conv3x3(h, w1)
        h = h if mode == "conv_only" else gn_apply_const(h, sc2, bi2)
        h = conv3x3(h, w2)
        return x + h

    return f


def make_sandwich_4d():
    @jax.jit
    def f(x, w1, w2, sc1, bi1, sc2, bi2):
        h = gn_silu_4d(x, sc1, bi1)
        h = conv3x3(h, w1)
        h = gn_silu_4d(h, sc2, bi2)
        h = conv3x3(h, w2)
        return x + h

    return f


def bandwidth_controls(x):
    """Calibration anchors, both chainable (x -> x):
    (a) copy: read+write of x;  (b) reduce+copy: (a) plus a streaming stats-style
    fp32 reduce over (H, W). Their DIFFERENCE is the marginal cost of a
    bandwidth-optimal stats pass at this shape."""
    nbytes = x.size * x.dtype.itemsize

    @jax.jit
    def copy(x):
        return x * jnp.bfloat16(1.0001)

    @jax.jit
    def reduce_copy(x):
        s = jnp.sum(x, axis=(1, 2), dtype=jnp.float32)
        return x + (jnp.float32(1e-6) * s[:, None, None, :]).astype(x.dtype)

    t_copy = chained_seconds(copy, x)
    t_rc = chained_seconds(reduce_copy, x)
    print(
        f"  control copy         {t_copy*1e3:7.3f} ms  ({2*nbytes/t_copy/1e9:5.0f} GB/s)   "
        f"reduce+copy {t_rc*1e3:7.3f} ms  -> marginal stats read {max(t_rc-t_copy,0)*1e3:6.3f} ms "
        f"({nbytes/max(t_rc-t_copy,1e-9)/1e9:5.0f} GB/s)",
        flush=True,
    )


def main():
    shapes = sys.argv[1:] or ["1x768x768x128", "1x384x384x256"]
    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform, flush=True)
    for spec in shapes:
        b, h, w, c = (int(v) for v in spec.split("x"))
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)
        sc1 = jnp.ones((c,), jnp.float32)
        bi1 = jnp.zeros((c,), jnp.float32)
        print(f"\n=== sandwich {spec} (bf16, {GROUPS} groups) ===", flush=True)
        bandwidth_controls(x)
        ref = None
        extra = [("fourd", None), ("conv_only", None), ("no_stats", None)]
        for name, stats_fn in list(VARIANTS.items()) + extra:
            if name == "fourd":
                fn = make_sandwich_4d()
            elif name in ("conv_only", "no_stats"):
                fn = make_sandwich_ablation(name)
            else:
                fn = make_sandwich(stats_fn)
            part = functools.partial(fn, w1=w1, w2=w2, sc1=sc1, bi1=bi1, sc2=sc1, bi2=bi1)
            try:
                if os.environ.get("E2EFT_SWEEP_TRACE") == "1":
                    times = trace_device_times(functools.partial(part, x), iters=10)
                    total = sum(times.values())
                    bk = bucket(times)
                    detail = (
                        f"conv/cc {(bk.get('conv',0)+bk.get('custom-call',0))*1e3:7.3f} ms  "
                        f"fusion {bk.get('fusion',0)*1e3:7.3f} ms  "
                        f"copy {bk.get('copy/transpose',0)*1e3:6.3f} ms  "
                    )
                else:
                    total = chained_seconds(part, x)
                    detail = ""
            except Exception as e:
                print(f"  {name:10s} FAILED: {e}", flush=True)
                continue
            out = part(x)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(
                f"  {name:10s} total {total*1e3:7.3f} ms  {detail}maxerr {err:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
