"""Packaging metadata stays in sync with the source tree.

The framework is pip-installable (pyproject.toml, setuptools backend,
explicit package list). This guards the explicit list against drift when a
new subpackage is added.
"""

import tomllib
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_pyproject_packages_match_tree():
    with open(REPO / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    declared = set(meta["tool"]["setuptools"]["packages"])
    actual = {"deepfakedetection_tpu"}
    for init in (REPO / "deepfakedetection_tpu").rglob("__init__.py"):
        rel = init.parent.relative_to(REPO)
        actual.add(".".join(rel.parts))
    assert declared == actual


def test_pyproject_deps_cover_requirements_core():
    """Every core requirement (the block before the first blank line of
    requirements.txt) appears in project.dependencies."""
    with open(REPO / "pyproject.toml", "rb") as f:
        deps = meta_deps = tomllib.load(f)["project"]["dependencies"]
    names = {d.split(">")[0].split("=")[0].strip() for d in meta_deps}
    core = []
    for line in (REPO / "requirements.txt").read_text().splitlines():
        line = line.split("#")[0].strip()
        if not line:
            if core:
                break
            continue
        core.append(line.split(">")[0].split("=")[0].strip())
    assert set(core) <= names, set(core) - names
    assert deps  # non-empty
