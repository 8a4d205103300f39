"""Tests for the tyro-style CLI and the wandb-facade logger."""

import json
import os
from dataclasses import dataclass, field
from typing import Tuple

import pytest

from perseus_tpu.configs.cli import parse_config
from perseus_tpu.utils import logging as ptlog


@dataclass(frozen=True)
class Inner:
    dataset_path: str = "data/pruned_dataset/pruned.hdf5"
    lazy: bool = True


@dataclass(frozen=True)
class Outer:
    batch_size: int = 256
    learning_rate: float = 1e-3
    translate: Tuple[float, float] = (0.1, 0.1)
    multigpu: bool = True
    dataset_config: Inner = field(default_factory=Inner)


def test_defaults():
    cfg = parse_config(Outer, [])
    assert cfg == Outer()


def test_scalar_and_nested_overrides():
    cfg = parse_config(
        Outer,
        [
            "--batch-size", "64",
            "--learning-rate", "3e-4",
            "--dataset-config.dataset-path", "/tmp/x.hdf5",
        ],
    )
    assert cfg.batch_size == 64
    assert cfg.learning_rate == 3e-4
    assert cfg.dataset_config.dataset_path == "/tmp/x.hdf5"
    assert cfg.dataset_config.lazy is True


def test_bool_and_tuple():
    cfg = parse_config(Outer, ["--no-multigpu", "--translate", "0.2,0.3"])
    assert cfg.multigpu is False
    assert cfg.translate == (0.2, 0.3)
    cfg2 = parse_config(Outer, ["--multigpu", "false"])
    assert cfg2.multigpu is False


def test_equals_syntax_and_unknown_flag():
    cfg = parse_config(Outer, ["--batch-size=8"])
    assert cfg.batch_size == 8
    with pytest.raises(SystemExit):
        parse_config(Outer, ["--bogus", "1"])


def test_local_logger_writes_jsonl(tmp_path):
    run = ptlog.init("test-project", config=Outer(), run_id="abc12345", root=str(tmp_path))
    ptlog.log({"loss": 1.5})
    ptlog.log({"val_loss": 0.5})
    ptlog.finish()
    run_dir = os.path.join(str(tmp_path), "outputs", "runs", "abc12345")
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["config"]["batch_size"] == 256
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        lines = [json.loads(line) for line in f]
    assert lines[0]["loss"] == 1.5 and lines[1]["val_loss"] == 0.5
