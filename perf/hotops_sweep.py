"""Isolated microbenches of the three biggest sinks in the 768px inference trace
(PERF.md r4, 94.4 ms device total):

  A. SD2 level-0 self-attention [5, 9216, 64] — 25.9 ms of Pallas custom-calls,
     ~1.5 ms per attn1 vs ~0.65 ms MXU roofline. Sweeps (block_q, block_k) to
     trade grid-program overhead (405 programs at 1024x1024) against VMEM.
  B. nearest-2x-upsample -> GroupNorm -> conv3x3 — the two ~3.6 ms "monster"
     stats fusions (%fusion.41/.94) sit right after the VAE decoder upsamples;
     tests whether breaking the broadcast->reduce fusion (optimization_barrier)
     or a reshape-broadcast upsample formulation dodges the pathology.
  C. GeoWizard joint attention [1, 18432, 8, 40] — head_dim 40 wastes MXU
     contraction lanes; tests zero-padding D 40->64 around the Pallas kernel
     (exact math: zero-padded K keeps logits identical, zero-padded V rows
     contribute nothing, output sliced back to 40).

All variants are chainable (x -> x) and timed with
gn_stats_sweep.chained_seconds (the tunnel acks block_until_ready early).
Run on the chip, one job at a time: python perf/hotops_sweep.py [A|B|C|all]
"""

from __future__ import annotations

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gn_stats_sweep import chained_seconds  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def exp_a():
    from diffusion_e2e_ft_tpu.kernels import attention as A

    bn, L, d = 5, 9216, 64
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    scale = d**-0.5
    flops = 2 * 2 * bn * L * L * d
    print(f"=== A: level-0 self-attn [{bn},{L},{d}]  (roofline ~{flops/197e12*1e3:.2f} ms) ===",
          flush=True)

    def run(name, step):
        try:
            t = chained_seconds(jax.jit(step), q0, iters=20)
        except Exception as e:
            print(f"  {name:18s} FAILED: {type(e).__name__}: {e}", flush=True)
            return
        print(f"  {name:18s} {t*1e3:7.3f} ms  ({flops/t/1e12:5.1f} TF/s)", flush=True)

    def xla_step(q):
        from diffusion_e2e_ft_tpu.kernels.attention import _xla_attention

        # BTNH layout for the xla path: [bn, L, d] -> [1, L, bn, d]
        o = _xla_attention(
            q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
            v.transpose(1, 0, 2)[None], scale,
        )
        return o[0].transpose(1, 0, 2)

    run("xla", xla_step)

    def dpa_step(q):
        o = jax.nn.dot_product_attention(
            q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
            v.transpose(1, 0, 2)[None], scale=scale,
        )
        return o[0].transpose(1, 0, 2)

    run("jax.nn.dpa", dpa_step)
    from diffusion_e2e_ft_tpu.kernels import flash_attention as FA

    for bq, bk in ((1024, 1024), (2304, 1024), (1024, 2304), (1536, 1536),
                   (4608, 512), (512, 1024), (3072, 1024), (2304, 2304)):
        os.environ["E2EFT_FA_BQ"] = str(bq)

        def step(q, _bk=bk):
            return FA._flash_bnld(q, k, v, scale, _bk)

        run(f"pallas bq{bq} bk{bk}", step)
        del os.environ["E2EFT_FA_BQ"]


def exp_b():
    from diffusion_e2e_ft_tpu.kernels.groupnorm import group_norm_silu

    rng = np.random.default_rng(0)
    for h, c in ((384, 256), (192, 512)):
        x0 = jnp.asarray(rng.normal(size=(1, h, h, c)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.02, jnp.bfloat16)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        print(f"=== B: upsample2x -> GN+SiLU -> conv3x3 at [1,{h},{h},{c}] -> {2*h}px ===",
              flush=True)

        def tail(y, x):
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            return x + y[:, ::2, ::2, :]  # fold back to input shape (equal cost all variants)

        def v_resize(x):
            y = jax.image.resize(x, (1, 2 * h, 2 * h, c), method="nearest")
            y = group_norm_silu(y, sc, bi, groups=32, eps=1e-5)
            return tail(y, x)

        def v_barrier(x):
            y = jax.image.resize(x, (1, 2 * h, 2 * h, c), method="nearest")
            y = jax.lax.optimization_barrier(y)
            y = group_norm_silu(y, sc, bi, groups=32, eps=1e-5)
            return tail(y, x)

        def v_reshape(x):
            # nearest-2x as reshape-broadcast (no gather): [1,h,1,h,1,c] -> tile
            y = jnp.broadcast_to(x[:, :, None, :, None, :], (1, h, 2, h, 2, c))
            y = y.reshape(1, 2 * h, 2 * h, c)
            y = group_norm_silu(y, sc, bi, groups=32, eps=1e-5)
            return tail(y, x)

        def v_stats_small(x):
            # compute GN stats on the PRE-upsample tensor (nearest-2x preserves
            # mean/var exactly), then only apply at full res: 4x less stats read
            xf = x.astype(jnp.float32)
            g = 32
            xg = xf.reshape(1, h * h, g, c // g)
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
            inv = jax.lax.rsqrt(var + 1e-5)
            mean_c = jnp.repeat(mean[0, 0, :, 0], c // g)
            inv_c = jnp.repeat(inv[0, 0, :, 0], c // g)
            y = jax.image.resize(x, (1, 2 * h, 2 * h, c), method="nearest")
            yf = (y.astype(jnp.float32) - mean_c) * (inv_c * sc) + bi
            yf = yf * jax.nn.sigmoid(yf)
            y = yf.astype(x.dtype)
            return tail(y, x)

        ref = None
        for name, f in (("resize", v_resize), ("barrier", v_barrier),
                        ("reshape-bcast", v_reshape), ("stats-small", v_stats_small)):
            try:
                t = chained_seconds(jax.jit(f), x0, iters=15)
                out = jax.jit(f)(x0)
            except Exception as e:
                print(f"  {name:14s} FAILED: {type(e).__name__}: {e}", flush=True)
                continue
            if ref is None:
                ref, err = out, 0.0
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"  {name:14s} {t*1e3:7.3f} ms   maxerr {err:.4f}", flush=True)


def exp_c():
    from diffusion_e2e_ft_tpu.kernels import flash_attention as FA
    from diffusion_e2e_ft_tpu.kernels.attention import _xla_attention

    bn, L, d = 8, 18432, 40
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    scale = d**-0.5
    flops = 2 * 2 * bn * L * L * d
    print(f"=== C: GeoWizard joint self-attn [{bn},{L},{d}] (roofline ~{flops/197e12*1e3:.2f} ms) ===",
          flush=True)

    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 24)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 24)))

    def cur(q):
        return FA._flash_bnld(q, k, v, scale, 1024)

    def pad64(q):
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, 24)))
        return FA._flash_bnld(qp, kp, vp, scale, 1024)[..., :40]

    def pad128(q):
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, 88)))
        kq = jnp.pad(k, ((0, 0), (0, 0), (0, 88)))
        vq = jnp.pad(v, ((0, 0), (0, 0), (0, 88)))
        return FA._flash_bnld(qp, kq, vq, scale, 1024)[..., :40]

    def xla(q):
        o = _xla_attention(
            q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
            v.transpose(1, 0, 2)[None], scale,
        )
        return o[0].transpose(1, 0, 2)

    ref = None
    for name, f in (("pallas d40", cur), ("pallas pad->64", pad64),
                    ("pallas pad->128", pad128), ("xla", xla)):
        try:
            t = chained_seconds(jax.jit(f), q0, iters=10)
            out = jax.jit(f)(q0)
        except Exception as e:
            print(f"  {name:16s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        if ref is None:
            ref, err = out, 0.0
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"  {name:16s} {t*1e3:7.3f} ms  ({flops/t/1e12:5.1f} TF/s)  maxerr {err:.4f}",
              flush=True)


def exp_e():
    """(bq, bk) sweep at the GeoWizard joint shape [8, 18432, 40] — exp C refuted
    head-dim padding (the kernel is program-overhead-bound at d=40, VERDICT r4),
    so the lever is fewer/bigger programs, swept here the way exp A did at d=64.
    The [bq, bk] fp32 logits block is the VMEM hog and is head-dim independent,
    so blocks beyond 1536x1536 should OOM exactly as at d=64."""
    from diffusion_e2e_ft_tpu.kernels import flash_attention as FA

    bn, L, d = 8, 18432, 40
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    scale = d**-0.5
    flops = 2 * 2 * bn * L * L * d
    print(f"=== E: joint-attn (bq,bk) sweep [{bn},{L},{d}] "
          f"(d-padded MXU floor ~{flops / 197e12 * 128 / 40 * 1e3:.2f} ms) ===", flush=True)
    grid_env = os.environ.get("E2EFT_SWEEP_BLOCKS")  # "2304x1024,3072x1024"
    grid = (
        tuple(tuple(int(v) for v in pair.split("x")) for pair in grid_env.split(","))
        if grid_env
        else ((1024, 1024), (1536, 1536), (2304, 1536), (1536, 1024),
              (2304, 1024), (3072, 1024), (2304, 2304), (4608, 768),
              (9216, 512), (1024, 1536))
    )
    for bq, bk in grid:
        os.environ["E2EFT_FA_BQ"] = str(bq)

        def step(q, _bk=bk):
            return FA._flash_bnld(q, k, v, scale, _bk)

        try:
            t = chained_seconds(jax.jit(step), q0, iters=10)
            print(f"  bq{bq:5d} bk{bk:5d} {t*1e3:7.3f} ms  ({flops/t/1e12:5.1f} TF/s)",
                  flush=True)
        except Exception as e:
            print(f"  bq{bq:5d} bk{bk:5d} FAILED: {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
        finally:
            del os.environ["E2EFT_FA_BQ"]


def exp_f():
    """Heads-per-program sweep at the GeoWizard joint shape [8, 18432, 40] —
    exp E exhausted block shape at 1.26x the d-padded floor; the residue is
    per-program overhead, attacked here by packing hp heads into one program
    (kernels/flash_attention.py::_flash_kernel_mh) so the prologue amortizes."""
    from diffusion_e2e_ft_tpu.kernels import flash_attention as FA

    bn, L, d = 8, 18432, 40
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bn, L, d)), jnp.bfloat16)
    scale = d**-0.5
    flops = 2 * 2 * bn * L * L * d
    print(f"=== F: joint-attn heads-per-program sweep [{bn},{L},{d}] "
          f"(d-padded MXU floor ~{flops / 197e12 * 128 / 40 * 1e3:.2f} ms) ===", flush=True)
    for hp in (1, 2, 4, 8):
        for bq, bk in ((1024, 1024), (512, 1024), (1024, 512), (512, 512)):
            os.environ["E2EFT_FA_BQ"] = str(bq)
            os.environ["E2EFT_FA_HP"] = str(hp)

            def step(q, _bk=bk):
                return FA._flash_bnld(q, k, v, scale, _bk)

            try:
                t = chained_seconds(jax.jit(step), q0, iters=10)
                print(f"  hp{hp} bq{bq:5d} bk{bk:5d} {t*1e3:7.3f} ms  "
                      f"({flops/t/1e12:5.1f} TF/s)", flush=True)
            except Exception as e:
                print(f"  hp{hp} bq{bq:5d} bk{bk:5d} FAILED: {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)
            finally:
                del os.environ["E2EFT_FA_BQ"]
                del os.environ["E2EFT_FA_HP"]


def exp_d():
    """Dump the OPTIMIZED HLO of the 768px `_infer_jit` (compile-cache hit) so the
    pathological stats fusions from the trace (%fusion.41/.94, 3.6 ms for a sub-ms
    stream) can be read offline."""
    from diffusion_e2e_ft_tpu.models import UNetConfig, VAEConfig
    from diffusion_e2e_ft_tpu.ops import scheduler as S
    from diffusion_e2e_ft_tpu.pipelines import MarigoldPipeline

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    pipe = MarigoldPipeline.from_random(
        jax.random.key(0), unet_config=UNetConfig(), vae_config=VAEConfig(),
        scheduler_config=S.SchedulerConfig(), dtype=dtype,
    )
    rgb = jax.ShapeDtypeStruct((1, 768, 768, 3), jnp.float32)
    lat = jax.ShapeDtypeStruct((1, 96, 96, 4), jnp.float32)
    # the bound jit accessor binds `self` for __call__ but not `.lower` (PERF.md)
    compiled = MarigoldPipeline._infer_jit.lower(
        pipe, pipe.params, rgb, 1, False, lat
    ).compile()
    mods = compiled.runtime_executable().hlo_modules() if hasattr(
        compiled, "runtime_executable") else None
    try:
        text = compiled.as_text()
    except Exception:
        text = "\n".join(m.to_string() for m in (mods or []))
    out = "/tmp/infer_hlo.txt"
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {len(text)/1e6:.1f} MB of optimized HLO to {out}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("A", "all"):
        exp_a()
    if which in ("C", "all"):
        exp_c()
    if which in ("B", "all"):
        exp_b()
    if which in ("D", "all"):
        exp_d()
    if which in ("E", "all"):
        exp_e()
    if which in ("F", "all"):
        exp_f()


if __name__ == "__main__":
    main()
