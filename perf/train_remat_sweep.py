"""On-chip sweep of UNet remat policies for the E2E train step (VERDICT r2 #2).

Round 2 rematerialized the WHOLE UNet apply (save-nothing checkpoint) — the
entire UNet forward runs again inside the backward pass, capping the step at
~33% MFU. UNet activations live at latent resolution (60x80 for the paper
config) and are cheap to keep; the HBM pressure comes from the frozen VAE
decoder at image resolution. This sweeps what the checkpoint saves and prints
step time + device memory stats for each.

Run on the chip: `python perf/train_remat_sweep.py [policies...]`
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")


def mem_gb():
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)
    return peak / 2**30


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import bench_train

    cases = sys.argv[1:] or ["none", "dots", "dots_all", "no_remat"]
    for case in cases:
        if case == "no_remat":
            overrides = {"gradient_checkpointing": False}
        elif case == "vae_off":
            overrides = {"vae_decode_checkpoint": False}
        elif case == "vae_off_dots":
            overrides = {"vae_decode_checkpoint": False, "remat_policy": "dots"}
        else:
            overrides = {"remat_policy": None if case == "none" else case}
        try:
            r = bench_train(**overrides)
            print(
                f"{case:10s} {r['value']:7.3f} img/s  "
                f"({2000.0/r['value']:.1f} ms/step)  peak_mem {mem_gb():.2f} GiB",
                flush=True,
            )
        except Exception as e:
            print(f"{case:10s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
