"""Checkpointing: orbax for native state, converters for .pth interop.

The reference saves bare ``state_dict()`` files with no optimizer state and
no resume path (reference: perseus/detector/train.py:352-355; SURVEY.md
section 5 "Checkpoint / resume"). Here:
  * full train state (params, batch stats, optimizer state, epoch, LR
    plateau state) checkpoints via orbax, enabling exact resume;
  * `load_model` accepts either an orbax checkpoint dir or a reference
    ``.pth`` (via the torch converter), so reference checkpoints drop in;
  * `export_reference_pth` writes a reference-layout ``.pth`` so TPU-trained
    weights load into the original torch stack.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_train_state", "restore_train_state", "load_model", "export_reference_pth"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(directory: str, state: dict) -> None:
    """Saves a pytree train state to ``directory`` (overwrites)."""
    directory = os.path.abspath(directory)
    state = jax.tree.map(np.asarray, state)
    _checkpointer().save(directory, state, force=True)


def restore_train_state(directory: str, target: dict | None = None) -> dict:
    """Restores a train-state pytree. Pass `target` (a template with the
    same structure, e.g. a freshly-initialized state) to recover custom
    container types like optax NamedTuple optimizer states."""
    if target is not None:
        target = jax.tree.map(np.asarray, target)
    return _checkpointer().restore(os.path.abspath(directory), item=target)


def load_model(path: str) -> tuple[dict[str, Any], dict[str, Any]]:
    """Loads (params, batch_stats) from an orbax dir or a reference .pth."""
    if path.endswith(".pth") or path.endswith(".pt"):
        # reference keypoint checkpoints load directly; bare torchvision
        # resnet18 classifier checkpoints (the reference's pretrained init,
        # models.py:20) are adapted: backbone kept, conv1/fc re-initialized
        from perseus_tpu.models.pretrained import load_pretrained_checkpoint

        return load_pretrained_checkpoint(path)
    state = restore_train_state(path)
    return state["params"], state["batch_stats"]


def export_reference_pth(path: str, params: dict, batch_stats: dict) -> None:
    """Writes a reference-format torch checkpoint (keys under ``resnet.``)."""
    import torch

    from perseus_tpu.models.convert import to_torch_state_dict

    sd = to_torch_state_dict(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, batch_stats)
    )
    torch.save({k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}, path)
