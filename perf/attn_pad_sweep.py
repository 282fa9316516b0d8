"""A/B head-dim padding for the GeoWizard (SD1.5-geometry) attention shapes.

SD1.5 splits channels over 8 heads -> head_dim 40/80/160; d=40 caps the MXU at
the 40/128-lane envelope (~73% of it measured in round 2 = ~45 TFLOP/s-equiv).
Zero-padding q/k/v head_dim to a multiple of 64 is numerically EXACT (zeros
contribute nothing to q.k scores, and padded v columns are sliced off) and buys
lane utilization at the cost of d_pad/d extra MACs. This sweep measures whether
the trade wins at the joint pipeline's real shapes.

Run on the chip: `python perf/attn_pad_sweep.py`
"""

from __future__ import annotations

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xprof import trace_device_times

    from diffusion_e2e_ft_tpu.kernels import flash_attention as fa

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    rng = np.random.default_rng(0)
    # GeoWizard joint self-attention shapes (pair folded into one sequence):
    # level0 (96x96 latent): L=2*9216 d=40; level1: L=2*2304 d=80; level2: L=2*576 d=160
    shapes = [
        (1, 18432, 8, 40),
        (1, 4608, 8, 80),
        (1, 1152, 8, 160),
    ]

    @functools.partial(jax.jit, static_argnums=(3,))
    def padded(q, k, v, dp):
        d = q.shape[-1]
        if dp > d:
            pad = [(0, 0)] * 3 + [(0, dp - d)]
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        out = fa.flash_attention(q, k, v, scale=d ** -0.5)
        return out[..., : d]

    for (b, l, n, d) in shapes:
        q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.bfloat16)
        useful_tflop = 4 * b * n * l * l * d / 1e12
        cands = sorted({d, ((d + 63) // 64) * 64, ((d + 127) // 128) * 128})
        base = None
        for dp in cands:
            try:
                times = trace_device_times(lambda: padded(q, k, v, dp), iters=10)
            except Exception as e:
                print(f"  d={d}->{dp}: FAILED {type(e).__name__}: {str(e)[:120]}")
                continue
            total = sum(times.values())
            ref = padded(q, k, v, cands[0])
            out = padded(q, k, v, dp)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            if base is None:
                base = total
            print(
                f"  ({b},{l},{n},d={d}) pad->{dp:3d}: {total*1e3:7.3f} ms  "
                f"useful {useful_tflop/total:6.1f} TFLOP/s  speedup {base/total:5.2f}x  maxerr {err:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
