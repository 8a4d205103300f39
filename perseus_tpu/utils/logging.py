"""Metrics logging with a wandb-compatible surface.

The reference logs per-step loss and per-epoch val loss to wandb (reference:
perseus/detector/train.py:204-206, 294-295, 344-345). This module exposes
the same init/log/finish surface: if the real wandb package is importable it
is used; otherwise metrics append to a local JSONL file under
``outputs/runs/<id>/metrics.jsonl`` along with the serialized config — so
training is observable in any environment (wandb is not installed here).

Also provides `generate_id()` (wandb-style 8-char run ids) used for
checkpoint naming, matching the reference's `<wandb_id>.pth` convention
(reference: train.py:204, 355).
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import string
import time
from typing import Any

__all__ = ["generate_id", "init", "log", "finish", "Run"]

_ACTIVE_RUN: "Run | None" = None


def generate_id(length: int = 8) -> str:
    alphabet = string.ascii_lowercase + string.digits
    return "".join(random.choices(alphabet, k=length))


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_jsonable(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    if isinstance(obj, dict):
        return {str(k): _to_jsonable(v) for k, v in obj.items()}
    if hasattr(obj, "item") and callable(obj.item):
        try:
            return obj.item()
        except Exception:
            return str(obj)
    if isinstance(obj, (int, float, str, bool)) or obj is None:
        return obj
    return str(obj)


class Run:
    def __init__(self, project: str, config: Any, run_id: str, root: str):
        self.project = project
        self.id = run_id
        self._wandb = None
        try:  # use real wandb when available
            import wandb  # type: ignore

            self._wandb = wandb
            wandb.init(project=project, config=config, id=run_id, resume="allow")
        except Exception:
            self.dir = os.path.join(root, "outputs", "runs", run_id)
            os.makedirs(self.dir, exist_ok=True)
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                json.dump({"project": project, "config": _to_jsonable(config)}, f, indent=2)
            self._file = open(os.path.join(self.dir, "metrics.jsonl"), "a", buffering=1)
            self._step = 0

    def log(self, metrics: dict) -> None:
        if self._wandb is not None:
            self._wandb.log(metrics)
            return
        record = {"_step": self._step, "_time": time.time(), **_to_jsonable(metrics)}
        self._file.write(json.dumps(record) + "\n")
        self._step += 1

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        elif hasattr(self, "_file"):
            self._file.close()


def init(project: str, config: Any = None, run_id: str | None = None, root: str | None = None) -> Run:
    global _ACTIVE_RUN
    from perseus_tpu import ROOT

    _ACTIVE_RUN = Run(project, config, run_id or generate_id(), root or ROOT)
    return _ACTIVE_RUN


def log(metrics: dict) -> None:
    if _ACTIVE_RUN is not None:
        _ACTIVE_RUN.log(metrics)


def finish() -> None:
    global _ACTIVE_RUN
    if _ACTIVE_RUN is not None:
        _ACTIVE_RUN.finish()
        _ACTIVE_RUN = None
