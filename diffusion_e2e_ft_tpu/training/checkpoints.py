"""Training checkpoints: orbax step checkpoints with rotation + resume, and the
final HF-layout pipeline export.

Capability parity: the reference's two formats
(`/root/reference/training/train.py:322-339,578-599,610-630`): periodic
`checkpoint-{step}` training-state saves with `checkpoints_total_limit` rotation and
`--resume_from_checkpoint [path|latest]`, plus the final export as an HF pipeline
directory with trailing timestep spacing baked into the scheduler config.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


_STEP_RE = re.compile(r"checkpoint-(\d+)$")


def _ckpt_path(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")


def list_checkpoints(output_dir: str):
    """[(step, path)] sorted ascending."""
    if not os.path.isdir(output_dir):
        return []
    out = []
    for name in os.listdir(output_dir):
        m = _STEP_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(os.path.abspath(output_dir), name)))
    return sorted(out)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(output_dir)
    return ckpts[-1][1] if ckpts else None


def save_checkpoint(
    output_dir: str,
    step: int,
    state: Any,
    total_limit: Optional[int] = None,
) -> str:
    """Save the full TrainState pytree; rotate old checkpoints beyond total_limit."""
    import orbax.checkpoint as ocp

    path = _ckpt_path(output_dir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()

    if total_limit is not None:
        ckpts = list_checkpoints(output_dir)
        excess = len(ckpts) - total_limit
        for _, old in ckpts[:max(excess, 0)]:
            import shutil

            shutil.rmtree(old, ignore_errors=True)
    return path


def restore_checkpoint(path: str, abstract_state: Any) -> Any:
    """Restore a TrainState saved by save_checkpoint; `abstract_state` provides the
    tree structure/shapes (e.g. a freshly initialized state)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_state)


def step_from_path(path: str) -> int:
    m = _STEP_RE.search(os.path.basename(os.path.normpath(path)))
    if not m:
        raise ValueError(f"not a checkpoint path: {path}")
    return int(m.group(1))


def export_hf_pipeline(
    output_dir: str,
    unet_config,
    unet_params,
    vae_config,
    vae_params,
    scheduler_config,
    scheduler_class: str = "DDPMScheduler",
    source_checkpoint: Optional[str] = None,
    modality: str = "depth",
) -> None:
    """Final export in the HF pipeline layout with TRAILING spacing baked in — the
    reference's inference-bug fix is part of the artifact, not a runtime flag.

    When `source_checkpoint` is given, the frozen towers are copied in verbatim so
    the export is self-contained: text_encoder (+tokenizer) for depth/normals runs,
    image_encoder (+feature_extractor) for joint runs — matching the reference's
    full-pipeline saves (`/root/reference/training/train.py:610-630`,
    `GeoWizard/geowizard/training/train_depth_normal.py:852-871`). The trained UNet
    expects the REAL empty-prompt/image embedding at inference; an export without
    these towers is not the trained model."""
    from diffusion_e2e_ft_tpu.pipelines import loading

    copy_subfolders = None
    if source_checkpoint is not None:
        copy_subfolders = loading.frozen_tower_subfolders(source_checkpoint, modality)
    loading.save_pipeline_dir(
        output_dir,
        unet_config,
        jax.tree.map(lambda x: x, unet_params),
        vae_config,
        vae_params,
        scheduler_config.replace(timestep_spacing="trailing"),
        scheduler_class=scheduler_class,
        copy_subfolders=copy_subfolders,
    )
