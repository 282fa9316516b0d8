"""On-chip A/B of the fused GN+SiLU->conv3x3 Pallas kernel vs the XLA composite
(VERDICT r2 #1). Times a scan of 16 chained applications per dispatch so the
axon tunnel's per-call latency amortizes out (PERF.md process notes).

Run on the chip: `python perf/gnconv_bench.py`
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPEAT = 16  # chained ops per dispatch
ITERS = 8  # timed dispatches


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gn_stats_sweep import chained_seconds

    from diffusion_e2e_ft_tpu.kernels import gn_conv

    # VAE-decoder hot shapes at 768px output (b, h, w, c); cout == c so the
    # scan can chain output -> input.
    shapes = [
        (1, 768, 768, 128),
        (1, 384, 384, 256),
        (1, 192, 192, 512),
        (1, 96, 96, 512),
    ]
    rng = np.random.default_rng(0)
    for b, h, w, c in shapes:
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        s = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        bi = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.02, jnp.bfloat16)
        cb = jnp.asarray(rng.normal(size=(c,)) * 0.01, jnp.float32)

        def chain(fn):
            def run(x):
                def body(carry, _):
                    return fn(carry), None

                y, _ = jax.lax.scan(body, x, None, length=REPEAT)
                return y

            return jax.jit(run)

        fused = chain(lambda t: gn_conv._fused(t, s, bi, 32, 1e-6, True, k, cb))
        xla = chain(lambda t: gn_conv._xla_gn_conv(t, s, bi, 32, 1e-6, True, k, cb, None))

        out = {}
        for name, fn in [("pallas", fused), ("xla", xla)]:
            try:
                # chained_seconds: tunnel-proof (scalar-fetch sync, measured
                # roundtrip subtracted); each step is itself REPEAT chained ops
                dt = chained_seconds(fn, x, iters=ITERS) / REPEAT * 1e3
                out[name] = dt
                err = ""
            except Exception as e:  # noqa: BLE001
                out[name] = float("nan")
                err = f"  ({type(e).__name__}: {str(e)[:120]})"
            print(f"{h}x{w}x{c}: {name:6s} {out[name]:8.3f} ms/op{err}", flush=True)
        if out.get("xla") and out.get("pallas"):
            print(
                f"{h}x{w}x{c}: speedup {out['xla'] / out['pallas']:.2f}x", flush=True
            )
        # numerics spot check on-chip (bf16)
        y1 = gn_conv._fused(x, s, bi, 32, 1e-6, True, k, cb)
        y2 = gn_conv._xla_gn_conv(x, s, bi, 32, 1e-6, True, k, cb, None)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(y2.astype(jnp.float32))))
        print(f"{h}x{w}x{c}: maxerr {err:.3e} (mag {mag:.2f})", flush=True)


if __name__ == "__main__":
    main()
