"""Test harness: force an 8-device virtual CPU platform before jax imports.

Multi-chip sharding tests run on these virtual devices (SURVEY.md §4);
real-TPU behavior is exercised by bench.py / the driver instead.
"""

import os

import re

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the image presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
# the sharding tests REQUIRE exactly 8 virtual devices — replace any preset
# count rather than keeping it (a preset =1 would silently degrade the mesh
# tests to single-device)
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags.strip() + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# the image's sitecustomize registers the TPU backend at interpreter startup,
# which wins over the env var — override through jax.config as well
jax.config.update("jax_platforms", "cpu")

# tests are compile-time-dominated on CPU (deep backbones): skip XLA's
# expensive optimization passes (~3-10x faster compiles; numerics stay
# within the suite's tolerances) and persist compiled executables so repeat
# runs skip compilation entirely
jax.config.update("jax_disable_most_optimizations", True)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/deepfakedetection_tpu/test_xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # older jax spellings — cache is an optimization only
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from PIL import Image  # noqa: E402


@pytest.fixture(scope="session")
def tiny_image_tree(tmp_path_factory):
    """Synthetic ImageFolder tree: train/val/test × {fake,real} with small PNGs."""
    root = tmp_path_factory.mktemp("dataset")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 6), ("test", 6)):
        for cls in ("fake", "real"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                h, w = int(rng.integers(40, 90)), int(rng.integers(40, 90))
                arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"img_{i:03d}.png")
    return root
