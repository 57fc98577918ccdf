"""Argument-resolution tests for the multi-host init wrapper.

`jax.distributed.initialize` itself cannot run here (single host), so these
pin the wrapper's contract: resolution order explicit args > JAX_* env vars,
single-process no-op, and the process_id requirement — the logic a pod
launcher actually depends on (`parallel/multihost.py`).
"""
from __future__ import annotations

import os
from unittest import mock

import pytest

from poseprobe_tpu.parallel import multihost


def _clean_env(monkeypatch):
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(k, raising=False)


def test_single_process_is_noop(monkeypatch):
    _clean_env(monkeypatch)
    with mock.patch("jax.distributed.initialize") as init:
        assert multihost.init_distributed() is False
        assert multihost.init_distributed(num_processes=1, process_id=0) is False
        init.assert_not_called()


def test_explicit_args_initialize(monkeypatch):
    _clean_env(monkeypatch)
    with mock.patch("jax.distributed.initialize") as init:
        assert multihost.init_distributed("10.0.0.1:1234", 4, 2) is True
        init.assert_called_once_with(
            coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2)


def test_env_var_resolution(monkeypatch):
    _clean_env(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "head:9999")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "8")
    monkeypatch.setenv("JAX_PROCESS_ID", "5")
    with mock.patch("jax.distributed.initialize") as init:
        assert multihost.init_distributed() is True
        init.assert_called_once_with(
            coordinator_address="head:9999", num_processes=8, process_id=5)


def test_explicit_args_beat_env(monkeypatch):
    _clean_env(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "env:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    with mock.patch("jax.distributed.initialize") as init:
        assert multihost.init_distributed("arg:2", 16, 7) is True
        init.assert_called_once_with(
            coordinator_address="arg:2", num_processes=16, process_id=7)


def test_missing_process_id_raises(monkeypatch):
    _clean_env(monkeypatch)
    with mock.patch("jax.distributed.initialize"):
        with pytest.raises(ValueError, match="process_id"):
            multihost.init_distributed(num_processes=4)


def test_is_primary_single_host():
    assert multihost.is_primary() is True


def test_make_global_mesh_covers_all_devices():
    import jax

    mesh = multihost.make_global_mesh()
    assert mesh.devices.size == len(jax.devices())
