"""On-TPU numerical validation of the Pallas kernels against their XLA references.

Run on the real chip (ambient axon env): `python tools_tpu_validate.py`.
The interpret-mode tests prove the kernel math; this proves the Mosaic lowering.

`python tools_tpu_validate.py --dryrun-smoke` instead runs a 30-second-scale
COLD-compile canary for the driver-scored multichip dryrun: it launches
`__graft_entry__.py multichip 8` against a throwaway compile cache and asserts
the FIRST case passes within its budget, so a creeping compile-time regression
is caught without paying for the full four-case acceptance run every time
(README pre-commit ritual; VERDICT r4 #8).
"""

import numpy as np


def dryrun_smoke(budget_s: float = 180.0) -> int:
    """Cold first-case canary for dryrun_multichip. Returns 0 on pass.

    Budget: case 1 measures ~77 s cold on this 1-core host (MULTICHIP_COLD_RUN.log);
    180 s trips well before the 600 s driver budget would be at risk (the full
    four-case run fits only if case 1 stays ~O(80 s))."""
    import os
    import subprocess
    import sys
    import tempfile
    import time

    here = os.path.dirname(os.path.abspath(__file__))
    with tempfile.TemporaryDirectory() as cache:
        env = dict(os.environ)
        env["E2EFT_DRYRUN_CACHE"] = cache
        t0 = time.time()
        # hard timeout on the child: the dryrun prints nothing until case 1
        # completes, so the read loop below would otherwise block past budget
        proc = subprocess.Popen(
            ["timeout", str(int(budget_s) + 15), sys.executable, "-u",
             os.path.join(here, "__graft_entry__.py"), "multichip", "8"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        try:
            for line in proc.stdout:
                if "[1/4] PASS" in line:
                    dt = time.time() - t0
                    ok = dt <= budget_s
                    print(f"dryrun-smoke: first case PASS in {dt:.0f}s "
                          f"(budget {budget_s:.0f}s) {'OK' if ok else 'FAIL'}")
                    return 0 if ok else 1
                if time.time() - t0 > budget_s:
                    print(f"dryrun-smoke: no first-case PASS within {budget_s:.0f}s FAIL")
                    return 1
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
    print("dryrun-smoke: process ended without a first-case PASS FAIL")
    return 1


def main():
    import importlib

    import jax
    import jax.numpy as jnp

    # the kernels package re-exports a function named `attention`, shadowing the
    # submodule attribute — import the module explicitly
    attn_mod = importlib.import_module("diffusion_e2e_ft_tpu.kernels.attention")
    from diffusion_e2e_ft_tpu.kernels import flash_attention as fa
    from diffusion_e2e_ft_tpu.kernels import groupnorm as gn

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    failures = 0

    # ---- flash attention, SD2 UNet shapes -------------------------------
    for (b, l, n, d, lk) in [(1, 9216, 5, 64, 9216), (1, 2304, 10, 64, 2304),
                             (2, 576, 20, 64, 1152), (1, 9216, 1, 512, 9216)]:
        q = jnp.asarray(rng.normal(size=(b, l, n, d)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, lk, n, d)).astype(np.float32), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, lk, n, d)).astype(np.float32), jnp.bfloat16)
        out = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v))(q, k, v)
        ref = jax.jit(lambda q, k, v: attn_mod._xla_attention(q, k, v, None))(q, k, v)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        ok = err < 0.05
        failures += 0 if ok else 1
        print(f"flash ({b},{l},{n},{d})xKV{lk}: max_err={err:.4f} {'OK' if ok else 'FAIL'}", flush=True)

    # ---- fused GroupNorm+SiLU, VAE/UNet shapes --------------------------
    # bf16 IO rounds both paths to adjacent ULPs (0.0625 at |y| in [4,8)); compare
    # with a relative bound of ~1.5 ULP of the output magnitude, plus one fp32 case.
    for (b, n, c, g, silu, dt) in [
        (1, 9216, 512, 32, False, jnp.bfloat16),
        (1, 589824, 128, 32, True, jnp.bfloat16),
        (1, 9216, 1280, 32, True, jnp.bfloat16),
        (2, 36864, 512, 32, True, jnp.bfloat16),
        (1, 9216, 512, 32, True, jnp.float32),
    ]:
        x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32), dt)
        scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
        out = jax.jit(lambda x: gn._pallas_group_norm(x, scale, bias, g, 1e-6, silu))(x)
        ref = jax.jit(lambda x: gn._xla_group_norm(x, scale, bias, g, 1e-6, silu))(x)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        mag = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        tol = 1e-3 * max(mag, 1.0) if dt == jnp.float32 else 0.012 * max(mag, 1.0)
        ok = err < tol
        failures += 0 if ok else 1
        print(
            f"gn ({b},{n},{c},g{g},silu={silu},{jnp.dtype(dt).name}): "
            f"max_err={err:.4f} (tol {tol:.4f}) {'OK' if ok else 'FAIL'}", flush=True,
        )

    # ---- fused GN+SiLU->conv3x3, both kernel generations ------------------
    from diffusion_e2e_ft_tpu.kernels import gn_conv as gc

    for (b, h, w, c, co) in [(1, 96, 96, 512, 512), (1, 192, 192, 256, 128),
                             (2, 64, 80, 128, 128)]:
        x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32), jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
        kern = jnp.asarray((rng.normal(size=(3, 3, c, co)) * 0.02).astype(np.float32), jnp.bfloat16)
        cb = jnp.asarray((rng.normal(size=(co,)) * 0.01).astype(np.float32))
        ref = jax.jit(lambda x: gc._xla_gn_conv(x, scale, bias, 32, 1e-6, True, kern, cb, None))(x)
        mag = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        for impl, fn in (("v1", gc._pallas_gn_conv), ("v2", gc._pallas_gn_conv_v2)):
            out = jax.jit(lambda x: fn(x, scale, bias, 32, 1e-6, True, kern, cb))(x)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            tol = 0.02 * max(mag, 1.0)
            ok = err < tol
            failures += 0 if ok else 1
            print(f"gn_conv {impl} ({b},{h},{w},{c}->{co}): max_err={err:.4f} "
                  f"(tol {tol:.4f}) {'OK' if ok else 'FAIL'}", flush=True)

    # ---- flash-attention BACKWARD (Pallas dq/dk/dv vs XLA recompute) ----
    # The training path: bf16 q/k/v at SD2 shapes, fp32 cotangent reduction.
    # Tolerances are relative to the XLA-recompute grads' own magnitude (both
    # paths accumulate in fp32; bf16 rounding dominates the delta).
    import os as _os

    for (b, l, n, d, lk) in [(2, 4800, 5, 64, 4800), (1, 2304, 10, 64, 4608),
                             (2, 576, 8, 40, 1152)]:
        q = jnp.asarray(rng.normal(size=(b, l, n, d)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, lk, n, d)).astype(np.float32), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, lk, n, d)).astype(np.float32), jnp.bfloat16)

        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v).astype(jnp.float32) ** 2)

        g_pallas = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        _os.environ["E2EFT_FA_BWD"] = "xla"
        try:
            jax.clear_caches()
            g_xla = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        finally:
            _os.environ.pop("E2EFT_FA_BWD", None)
            jax.clear_caches()
        for name, a, r in zip(("dq", "dk", "dv"), g_pallas, g_xla):
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32))))
            mag = float(jnp.max(jnp.abs(r.astype(jnp.float32))))
            tol = 0.03 * max(mag, 1.0)
            ok = err < tol
            failures += 0 if ok else 1
            print(
                f"flash-bwd {name} ({b},{l},{n},{d})xKV{lk}: max_err={err:.4f} "
                f"(tol {tol:.4f}) {'OK' if ok else 'FAIL'}", flush=True,
            )

    print("FAILURES:", failures, flush=True)
    return failures


if __name__ == "__main__":
    import sys as _sys

    if "--dryrun-smoke" in _sys.argv:
        raise SystemExit(dryrun_smoke())
    raise SystemExit(main())
