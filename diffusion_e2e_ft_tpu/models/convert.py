"""HF checkpoint <-> Flax pytree weight conversion, plus the conv_in surgery.

Capability parity: loads the published diffusers-layout checkpoints (`GonzaloMG/*`,
`prs-eth/marigold-*`, `lemonaddie/geowizard`, `stabilityai/stable-diffusion-2`) into
our NHWC Flax models, and exports back so trained models round-trip to the HF pipeline
directory format the reference saves (`/root/reference/training/train.py:610-630`).

The mapping is one generic rule (list indices `.N.` flatten to `_N`; `weight` becomes
`kernel`/`scale` by rank; conv kernels transpose OIHW->HWIO; linear kernels transpose
OI->IO) because the Flax modules were named to mirror the HF key structure.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

# Old diffusers VAE attention naming -> modern to_q/to_k/to_v/to_out.0
_VAE_ATTN_ALIASES = {
    "query": "to_q",
    "key": "to_k",
    "value": "to_v",
    "proj_attn": "to_out.0",
}


def _canonicalize(key: str) -> str:
    parts = key.split(".")
    parts = [_VAE_ATTN_ALIASES.get(p, p) for p in parts]
    return ".".join(parts)


def torch_key_to_flax_path(key: str, ndim: int) -> Tuple[str, ...]:
    """'down_blocks.0.resnets.1.conv1.weight' -> ('down_blocks_0','resnets_1','conv1','kernel')."""
    key = _canonicalize(key)
    parts = key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    leaf = merged[-1]
    if leaf == "weight":
        merged[-1] = "kernel" if ndim >= 2 else "scale"
    return tuple(merged)


def _to_flax_value(path: Tuple[str, ...], value: np.ndarray) -> np.ndarray:
    if path[-1] == "kernel":
        if value.ndim == 4:  # conv OIHW -> HWIO
            return np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:  # linear OI -> IO
            return np.transpose(value, (1, 0))
    return value


def _to_torch_value(path: Tuple[str, ...], value: np.ndarray) -> np.ndarray:
    if path[-1] == "kernel":
        if value.ndim == 4:  # HWIO -> OIHW
            return np.transpose(value, (3, 2, 0, 1))
        if value.ndim == 2:
            return np.transpose(value, (1, 0))
    return value


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """Inverse of torch_key_to_flax_path (list indices re-expanded, kernel->weight)."""
    parts = []
    for p in path:
        m = re.fullmatch(r"(.*?)_(\d+)", p)
        # split trailing _N back into '.N' only for known list containers
        if m and m.group(1) in (
            "resnets", "attentions", "down_blocks", "up_blocks", "downsamplers",
            "upsamplers", "transformer_blocks", "net", "to_out", "layers",
        ):
            parts.extend([m.group(1), m.group(2)])
        else:
            parts.append(p)
    leaf = parts[-1]
    if leaf in ("kernel", "scale"):
        parts[-1] = "weight"
    return ".".join(parts)


def state_dict_to_params(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Flat torch-layout state dict -> nested Flax params tree."""
    tree: Dict[str, Any] = {}
    for key, value in state_dict.items():
        value = np.asarray(value)
        path = torch_key_to_flax_path(key, value.ndim)
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(_to_flax_value(path, value))
    return tree


def params_to_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Nested Flax params tree -> flat torch-layout state dict (numpy)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            value = _to_torch_value(path, np.asarray(node))
            out[flax_path_to_torch_key(path)] = value

    walk(params, ())
    return out


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .safetensors or torch .bin weights file into numpy (host memory)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        try:
            return dict(load_file(path))
        except Exception:
            # bf16/f16 tensors are not numpy-native; route through torch
            from safetensors.torch import load_file as load_torch

            return {k: v.float().numpy() for k, v in load_torch(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def save_state_dict(state_dict: Mapping[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()}, path)


def clip_state_dict_to_params(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIPTextModel / CLIPVisionModelWithProjection weights -> our Flax params.

    Strips the `text_model.`/`vision_model.`/`embeddings.`/`encoder.` nesting (our
    modules are flat) and maps embedding tables without the 2-D linear transpose.
    """
    tree: Dict[str, Any] = {}
    for key, value in state_dict.items():
        value = np.asarray(value)
        if key.startswith("text_projection") or "position_ids" in key:
            continue  # text projection / buffer indices are unused by the reference flows
        key = (
            key.replace("text_model.", "")
            .replace("vision_model.", "")
            .replace("embeddings.", "")
            .replace("encoder.", "")
        )
        is_embed = (
            key.endswith("token_embedding.weight")
            or key.endswith("position_embedding.weight")
        )
        if is_embed:
            base = torch_key_to_flax_path(key.rsplit(".", 1)[0], 0)  # path sans 'weight'
            path = base + ("embedding",)
            leaf = jnp.asarray(value)
        elif key == "class_embedding":
            path = ("class_embedding",)
            leaf = jnp.asarray(value)
        else:
            path = torch_key_to_flax_path(key, value.ndim)
            leaf = jnp.asarray(_to_flax_value(path, value))
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf
    return tree


def replace_conv_in(params: Dict[str, Any], repeat: int = 2) -> Dict[str, Any]:
    """Duplicate conv_in input channels 4 -> 4*repeat, scaling weights AND bias by
    1/repeat — the reference's UNet input surgery, reproduced exactly (including the
    bias scaling) so converted checkpoints match numerically
    (`/root/reference/training/util/unet_prep.py:6-21`).

    Flax conv kernel layout is HWIO: duplication happens on axis 2 (input channels).
    """
    params = dict(params)
    conv_in = dict(params["conv_in"])
    kernel = np.asarray(conv_in["kernel"])
    bias = np.asarray(conv_in["bias"])
    kernel = np.tile(kernel, (1, 1, repeat, 1)) / repeat
    bias = bias / repeat
    conv_in["kernel"] = jnp.asarray(kernel)
    conv_in["bias"] = jnp.asarray(bias)
    params["conv_in"] = conv_in
    return params
