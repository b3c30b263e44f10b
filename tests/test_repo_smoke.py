"""Repo smoke tests (reference: tests/test_repo_smoke.py) — structure +
syntax checks that run without heavy deps (CI's `pytest -k smoke` job)."""

import compileall
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_smoke_repo_structure():
    assert (REPO / "README.md").exists()
    assert (REPO / "requirements.txt").exists()
    assert (REPO / ".github" / "workflows").exists()
    assert (REPO / "config" / "train.yaml").exists()
    assert (REPO / "config" / "inference.yaml").exists()
    assert (REPO / "bench.py").exists()


def test_smoke_all_python_compiles():
    ok = compileall.compile_dir(
        str(REPO / "deepfakedetection_tpu"), quiet=2, force=False
    )
    assert ok, "syntax errors in package"
    for entry in ("train.py", "inference.py", "web_ui.py", "bench.py", "__graft_entry__.py"):
        ok = compileall.compile_file(str(REPO / entry), quiet=2)
        assert ok, f"syntax error in {entry}"
    assert sys.version_info >= (3, 10)
