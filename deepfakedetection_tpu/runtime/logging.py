"""Console, stream tee, throughput meters and metrics.jsonl writers.

Reproduces the reference's observability surface (SURVEY.md §5.5):
- Rich console with progress bars showing live img/s
  (reference: orchestrator.py:569-599, trainers/efficientnet.py:316-325)
- stdout+stderr tee into per-run log files
  (reference: orchestrator.py:77-109, train_env.py:49-95)
- append-only ``logs/metrics.jsonl`` records (orchestrator.py:645-647)
"""

from __future__ import annotations

import contextlib
import json
import sys
from collections.abc import Iterator
from pathlib import Path
from time import perf_counter
from typing import Any, TextIO

try:  # rich is available in the image; degrade gracefully anyway
    from rich.console import Console

    _HAVE_RICH = True
except Exception:  # pragma: no cover
    _HAVE_RICH = False


class _PlainConsole:
    """Minimal stand-in for rich.Console when rich is unavailable."""

    def print(self, *args: Any, **kwargs: Any) -> None:  # noqa: A003
        import re

        text = " ".join(str(a) for a in args)
        print(re.sub(r"\[/?[a-z _]*\]", "", text))


def make_console() -> Any:
    if _HAVE_RICH:
        return Console()
    return _PlainConsole()


console = make_console()


class TeeStream:
    """Mirror writes to an underlying stream and a log file."""

    def __init__(self, stream: TextIO, log_file: TextIO) -> None:
        self._stream = stream
        self._log = log_file

    def write(self, data: str) -> int:
        n = self._stream.write(data)
        try:
            self._log.write(data)
        except ValueError:
            pass  # log closed
        return n

    def flush(self) -> None:
        self._stream.flush()
        try:
            self._log.flush()
        except ValueError:
            pass

    def isatty(self) -> bool:
        return bool(getattr(self._stream, "isatty", lambda: False)())

    def fileno(self) -> int:  # pragma: no cover - rich queries this sometimes
        return self._stream.fileno()


@contextlib.contextmanager
def tee_output(log_path: Path) -> Iterator[None]:
    """Mirror stdout+stderr into ``log_path`` for the scope of the block.

    Multihost: the run dir is shared (checkpoint saves are collective, so
    every process targets the same directory — runtime/paths.sync_run_id);
    concurrent appends from several processes would interleave garbage into
    one file, so non-primary processes tee into ``<name>.p<index>``."""
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        log_path = log_path.with_name(f"{log_path.name}.p{jax.process_index()}")
    log_path.parent.mkdir(parents=True, exist_ok=True)
    with log_path.open("a", encoding="utf-8") as fh:
        old_out, old_err = sys.stdout, sys.stderr
        sys.stdout = TeeStream(old_out, fh)  # type: ignore[assignment]
        sys.stderr = TeeStream(old_err, fh)  # type: ignore[assignment]
        try:
            yield
        finally:
            sys.stdout, sys.stderr = old_out, old_err


def append_metrics(metrics_path: Path, record: dict[str, Any]) -> None:
    """Append one JSON record to logs/metrics.jsonl (orchestrator.py:645-647).

    Multihost: every process computes identical records (metrics are
    allgathered), so only process 0 writes — concurrent appends to one
    shared file would duplicate and interleave lines."""
    import jax

    if jax.process_index() != 0:
        return
    metrics_path.parent.mkdir(parents=True, exist_ok=True)
    with metrics_path.open("a", encoding="utf-8") as fh:
        fh.write(json.dumps(record) + "\n")


class Throughput:
    """img/s meter matching the reference's live display semantics
    (seen/elapsed since loop start, efficientnet.py:316-325)."""

    def __init__(self) -> None:
        self.start = perf_counter()
        self.seen = 0

    def update(self, n: int) -> float:
        self.seen += n
        elapsed = perf_counter() - self.start
        return self.seen / max(elapsed, 1e-6)


@contextlib.contextmanager
def progress(description: str, total: int | None) -> Iterator[Any]:
    """Live Rich progress bar with running img/s, mirroring the reference's
    train/eval displays (orchestrator.py:569-599, efficientnet.py:316-325).

    Yields ``update(n_images) -> img/s``. The bar renders only on an
    interactive TTY; otherwise this degrades to a bare Throughput meter so
    tee'd log files stay byte-identical to the plain prints.
    """
    interactive = _HAVE_RICH and getattr(sys.stdout, "isatty", lambda: False)()
    if not interactive:
        meter = Throughput()
        yield meter.update
        return
    from rich.progress import (
        BarColumn,
        MofNCompleteColumn,
        Progress,
        TextColumn,
        TimeElapsedColumn,
    )

    prog = Progress(
        TextColumn("[progress.description]{task.description}"),
        BarColumn(),
        MofNCompleteColumn(),
        TextColumn("{task.fields[rate]:>8.1f} img/s"),
        TimeElapsedColumn(),
        console=console,
        transient=True,
    )
    with prog:
        task = prog.add_task(description, total=total, rate=0.0)
        meter = Throughput()

        def update(n: int) -> float:
            rate = meter.update(n)
            prog.update(task, advance=n, rate=rate)
            return rate

        yield update
