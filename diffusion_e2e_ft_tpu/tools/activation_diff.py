"""Layer-wise activation capture and diffing — the bit-fidelity debugging harness.

SURVEY.md §7 flags cross-framework numerical parity (resize antialiasing, GroupNorm
epsilons, softmax precision) as the hard part of matching the CUDA reference within
1e-3 AbsRel. This tool captures every intermediate activation of our Flax modules
(`flax capture_intermediates`), summarizes them (shape/mean/std/absmax), and diffs
two runs — ours vs ours (regression), or ours vs a recorded dump from the torch
reference (parity), with NHWC<->NCHW reconciliation.

Dump format: a .npz of flattened path -> array (recorded dumps from the torch side
use the HF module path dialect; `canonicalize_path` maps both sides onto one key).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import numpy as np


def capture_intermediates(module, variables, *args, method=None, **kwargs):
    """Run a Flax module with intermediate capture; returns (output, {path: array}).

    Captures each submodule's `__call__` output (flax's default filter)."""
    out, state = module.apply(
        variables,
        *args,
        method=method,
        capture_intermediates=True,
        mutable=["intermediates"],
        **kwargs,
    )
    flat: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                # flax stores __call__ outputs as tuples of invocations
                suffix = () if len(node) == 1 else (str(i),)
                walk(v, path + suffix)
        else:
            key = "/".join(p for p in path if p != "__call__")
            flat[key] = np.asarray(node)

    walk(state["intermediates"], ())
    return out, flat


def summarize(acts: Dict[str, np.ndarray]) -> Dict[str, Dict[str, float]]:
    out = {}
    for k, v in acts.items():
        v = np.asarray(v, np.float32)
        out[k] = {
            "shape": list(v.shape),
            "mean": float(v.mean()),
            "std": float(v.std()),
            "absmax": float(np.abs(v).max()),
        }
    return out


def canonicalize_path(path: str) -> str:
    """Map torch ('down_blocks.0.resnets.1') and flax ('down_blocks_0/resnets_1')
    module paths onto one dialect."""
    p = path.replace(".", "/")
    p = re.sub(r"/(\d+)(/|$)", r"_\1\2", p)
    return p.strip("/")


def _maybe_nchw_to_nhwc(a: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """If shapes match after a NCHW->NHWC transpose, apply it."""
    if a.shape == ref.shape:
        return a
    if a.ndim == 4 and a.transpose(0, 2, 3, 1).shape == ref.shape:
        return a.transpose(0, 2, 3, 1)
    if a.ndim == 3 and a.transpose(1, 2, 0).shape == ref.shape:
        return a.transpose(1, 2, 0)
    return a


def diff(
    ours: Dict[str, np.ndarray],
    reference: Dict[str, np.ndarray],
    rtol: float = 1e-4,
    atol: float = 1e-4,
) -> List[Dict[str, Any]]:
    """Per-layer comparison, ordered by descending max abs error. Layers present on
    only one side are reported with error=None."""
    ours_c = {canonicalize_path(k): v for k, v in ours.items()}
    ref_c = {canonicalize_path(k): v for k, v in reference.items()}
    rows: List[Dict[str, Any]] = []
    for key in sorted(set(ours_c) | set(ref_c)):
        a = ours_c.get(key)
        b = ref_c.get(key)
        if a is None or b is None:
            rows.append({"layer": key, "only_in": "reference" if a is None else "ours"})
            continue
        a = np.asarray(a, np.float32)
        b = _maybe_nchw_to_nhwc(np.asarray(b, np.float32), a)
        if a.shape != b.shape:
            rows.append({"layer": key, "shape_ours": a.shape, "shape_ref": b.shape})
            continue
        err = np.abs(a - b)
        denom = np.maximum(np.abs(b), atol / max(rtol, 1e-30))
        rows.append(
            {
                "layer": key,
                "max_abs_err": float(err.max()),
                "mean_abs_err": float(err.mean()),
                "max_rel_err": float((err / denom).max()),
                "within_tol": bool(np.allclose(a, b, rtol=rtol, atol=atol)),
            }
        )
    rows.sort(key=lambda r: -(r.get("max_abs_err") or float("inf")))
    return rows


def save_dump(path: str, acts: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **{canonicalize_path(k): v for k, v in acts.items()})


def load_dump(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def load_reference(path: str) -> Dict[str, np.ndarray]:
    """Load reference activations from a single .npz OR a DIRECTORY of recorded
    files (how a torch-side capture script naturally writes them): every
    `*.npy` contributes one layer (key = filename stem, torch dot-dialect is
    fine — `diff` canonicalizes), every `*.npz` is merged in wholesale. This is
    the landing pad for published-checkpoint parity runs: record activations on
    a CUDA host with the reference pipeline, rsync the directory here, and diff
    without any torch-side packaging step (VERDICT r4 #7)."""
    import os

    if not os.path.isdir(path):
        return load_dump(path)
    acts: Dict[str, np.ndarray] = {}
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if name.endswith(".npy"):
            acts[name[: -len(".npy")]] = np.load(full)
        elif name.endswith(".npz"):
            acts.update(load_dump(full))
    if not acts:
        raise FileNotFoundError(f"no .npy/.npz activation files under {path}")
    return acts


def main(argv: Optional[List[str]] = None) -> int:
    """CLI: diff our dump against a reference dump file or directory.

    Exit code 0 = all layers within tolerance and no structural mismatches."""
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ours", required=True, help=".npz dump from our side")
    ap.add_argument(
        "--reference", required=True,
        help=".npz file or directory of .npy/.npz recorded reference activations",
    )
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--atol", type=float, default=1e-4)
    ap.add_argument("--threshold", type=float, default=1e-3)
    ap.add_argument("--top", type=int, default=20, help="rows to print")
    args = ap.parse_args(argv)

    rows = diff(load_dump(args.ours), load_reference(args.reference),
                rtol=args.rtol, atol=args.atol)
    for r in rows[: args.top]:
        print(json.dumps(r, default=str))
    structural = [r for r in rows if "max_abs_err" not in r]
    worst = max((r["max_abs_err"] for r in rows if "max_abs_err" in r), default=0.0)
    div = first_divergence(rows, args.threshold)
    print(
        f"layers={len(rows)} structural_mismatches={len(structural)} "
        f"worst_abs_err={worst:.3e} first_divergence={div}"
    )
    return 1 if (structural or div is not None) else 0


def first_divergence(
    rows: List[Dict[str, Any]], threshold: float = 1e-3
) -> Optional[str]:
    """The shallowest layer whose error exceeds threshold (depth ~ path length) —
    where to start debugging."""
    bad = [r for r in rows if r.get("max_abs_err", 0.0) and r["max_abs_err"] > threshold]
    if not bad:
        return None
    bad.sort(key=lambda r: (r["layer"].count("/"), len(r["layer"])))
    return bad[0]["layer"]


if __name__ == "__main__":
    raise SystemExit(main())
