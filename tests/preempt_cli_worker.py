"""Worker for the CLI-level preemption test (tests/test_preempt.py).

Runs the real ``orchestrate(mode="training")`` call stack — the same thing
``python train.py`` does — with the registry routed to the tiny test CNN,
on CPU. The parent SIGTERMs this process mid-run and then re-runs it to
completion; ``runtime/preempt.py``'s trap + mid-epoch checkpoint + exact
resume must make the final exported weights identical to an uninterrupted
control run.

Usage: python -m tests.preempt_cli_worker <config.yaml>
"""

import sys


def main() -> None:
    cfg_path = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_disable_most_optimizations", True)

    import deepfakedetection_tpu.orchestrator as orch
    from tests.util import tiny_spec

    orch.get_model_spec = lambda name: tiny_spec()
    orch.orchestrate(cfg_path, mode="training")


if __name__ == "__main__":
    main()
