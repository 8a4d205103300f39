"""Torch checkpoint <-> JAX pytree conversion for the keypoint CNN.

The reference trains with DDP and saves raw ``state_dict()`` files whose keys
may carry ``module.`` prefixes, which every consumer strips (reference:
perseus/detector/validate.py:94-96, validate_real.py:44-46,
scripts/streaming.py:115-117). The model nests everything under a
``resnet.`` submodule (reference: perseus/detector/models.py:20).

This module converts such checkpoints into the flat (params, batch_stats)
dicts used by perseus_tpu.models.resnet, handling:
  * ``module.`` / ``resnet.`` prefix stripping,
  * conv kernels OIHW -> HWIO,
  * fc weight (out, in) -> (in, out),
  * dropping torch bookkeeping tensors (``num_batches_tracked``).

Works from either an in-memory state dict of numpy arrays or a ``.pth`` file
(torch is an optional host-side dependency, used only here and in tests).
The reverse conversion exists for round-trip tests and for exporting
TPU-trained weights back into the reference's checkpoint format.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = [
    "normalize_torch_keys",
    "from_torch_state_dict",
    "to_torch_state_dict",
    "load_torch_checkpoint",
]


def normalize_torch_keys(state_dict: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Strips ``module.`` (DDP) and ``resnet.`` (submodule) prefixes."""
    out = {}
    for key, value in state_dict.items():
        k = key
        if k.startswith("module."):
            k = k[len("module.") :]
        if k.startswith("resnet."):
            k = k[len("resnet.") :]
        out[k] = value
    return out


def from_torch_state_dict(
    state_dict: Mapping[str, np.ndarray],
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Torch state dict (numpy values) -> (params, batch_stats) flat dicts."""
    sd = normalize_torch_keys(state_dict)
    params: dict[str, np.ndarray] = {}
    stats: dict[str, np.ndarray] = {}
    for key, value in sd.items():
        v = np.asarray(value)
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith("running_mean") or key.endswith("running_var"):
            stats[key] = v.astype(np.float32)
        elif key == "fc.weight":
            params[key] = v.T.astype(np.float32)  # (out, in) -> (in, out)
        elif key.endswith(".weight") and v.ndim == 4:
            # conv OIHW -> HWIO
            params[key] = np.transpose(v, (2, 3, 1, 0)).astype(np.float32)
        else:
            params[key] = v.astype(np.float32)
    return params, stats


def to_torch_state_dict(
    params: Mapping[str, np.ndarray],
    stats: Mapping[str, np.ndarray],
    nest_resnet: bool = True,
) -> dict[str, np.ndarray]:
    """Inverse of :func:`from_torch_state_dict` (for export/round-trip).

    With ``nest_resnet`` the keys carry the reference model's ``resnet.``
    prefix so the file loads directly into the reference's KeypointCNN.
    """
    out: dict[str, np.ndarray] = {}
    prefix = "resnet." if nest_resnet else ""
    for key, value in params.items():
        v = np.asarray(value)
        if key == "fc.weight":
            out[prefix + key] = v.T
        elif key.endswith(".weight") and v.ndim == 4:
            out[prefix + key] = np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
        else:
            out[prefix + key] = v
    for key, value in stats.items():
        out[prefix + key] = np.asarray(value)
        bn_prefix = key.rsplit(".", 1)[0]
        tracked = f"{prefix}{bn_prefix}.num_batches_tracked"
        out.setdefault(tracked, np.asarray(0, dtype=np.int64))
    return out


def load_torch_checkpoint(path: str) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Loads a reference ``.pth`` checkpoint into (params, batch_stats)."""
    import torch  # local import: torch is host-side tooling only

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return from_torch_state_dict({k: v.numpy() for k, v in state_dict.items()})
