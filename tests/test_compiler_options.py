"""train_compiler_options: backend gating + env override parsing."""

import pytest

from deepfakedetection_tpu.train.steps import train_compiler_options


def test_cpu_backend_gets_no_tpu_options():
    # the suite runs on the CPU platform (conftest); TPU-only compile
    # options must not leak there (the CPU client hard-rejects them)
    assert train_compiler_options() is None


def test_env_override_parsing(monkeypatch):
    monkeypatch.setenv("DFD_TRAIN_SCOPED_VMEM_KIB", "0")
    assert train_compiler_options() is None  # 0 disables regardless of backend

    monkeypatch.setenv("DFD_TRAIN_SCOPED_VMEM_KIB", "banana")
    with pytest.raises(ValueError, match="DFD_TRAIN_SCOPED_VMEM_KIB"):
        train_compiler_options()


def test_tpu_backend_gets_budget(monkeypatch):
    import deepfakedetection_tpu.train.steps as steps

    monkeypatch.setattr(steps.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("DFD_TRAIN_SCOPED_VMEM_KIB", "49152")
    assert train_compiler_options() == {"xla_tpu_scoped_vmem_limit_kib": 49152}
