"""Unit tests for the per-compile XLA:TPU option plumbing (utils/xla_opts)."""

import unittest.mock as mock

import jax
import pytest

import perseus_tpu.utils.xla_opts as xo

pytestmark = pytest.mark.quick


def test_off_tpu_returns_none(monkeypatch):
    monkeypatch.setenv("PERSEUS_COMPILER_OPTIONS", "a=1")
    with mock.patch.object(jax, "default_backend", return_value="cpu"):
        assert xo.tpu_compiler_options() is None


def test_env_merges_over_defaults(monkeypatch):
    monkeypatch.setenv("PERSEUS_COMPILER_OPTIONS", "a=1,b=2 c=")
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        with mock.patch.object(xo, "TPU_DEFAULTS", {"c": "9", "d": "4"}):
            assert xo.tpu_compiler_options() == {"d": "4", "a": "1", "b": "2"}


def test_empty_everything_returns_none(monkeypatch):
    monkeypatch.delenv("PERSEUS_COMPILER_OPTIONS", raising=False)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        with mock.patch.object(xo, "TPU_DEFAULTS", {}):
            assert xo.tpu_compiler_options() is None
