"""Host input pipeline: seeded shuffling, process sharding, batch decode.

Replaces the reference's torch ``DataLoader`` (reference:
trainers/efficientnet.py:216-233) with a TPU-shaped loader:

- static batch shapes: the final eval batch is zero-padded with a validity
  mask (no recompilation on ragged batches); train drops the last partial
  batch like ``drop_last`` semantics implied by fixed accumulation
- deterministic per-epoch shuffling from ``(seed, epoch)`` — torch's
  ``set_epoch`` idiom — fully reproducible across processes
- multi-host: the GLOBAL batch of ``batch_size`` rows is assembled across
  processes (``parallel.mesh.shard_batch``); each process decodes only its
  ``batch_size / process_count`` rows from a disjoint contiguous shard of
  the identical epoch order. Per-process batch counts are EXACTLY equal
  (jitted steps over a multi-host mesh run in lockstep): train drops the
  sub-process-count global remainder, eval pads with ``-1`` sentinel slots
  that decode to masked rows. Eval results re-assemble with
  ``parallel.multihost.allgather_examples``
- decode backends: the native C++ thread-pool decoder (data/native.py) when
  built, else PIL in a thread pool (PIL releases the GIL for decode/resize)
- one-batch lookahead: the next batch decodes while the caller dispatches the
  current one to the device.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from deepfakedetection_tpu.data import native
from deepfakedetection_tpu.data.decode import decode_eval, decode_train
from deepfakedetection_tpu.data.folder import ImageFolderDataset
from deepfakedetection_tpu.data.transforms import EvalTransformPlan, TrainTransformPlan


@dataclass
class Batch:
    images: np.ndarray  # uint8 [B, S, S, 3]
    labels: np.ndarray  # int64 [B]
    mask: np.ndarray  # bool [B] — False on padding rows
    num_valid: int


class Loader:
    """Iterable over padded/dropped batches of decoded uint8 images."""

    def __init__(
        self,
        dataset: ImageFolderDataset,
        plan: TrainTransformPlan | EvalTransformPlan,
        *,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        seed: int | None = None,
        num_workers: int = 0,
        use_native: bool | None = None,
        cache_decoded: bool = False,
        lookahead: int = 1,
    ) -> None:
        self.dataset = dataset
        self.plan = plan
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = 0 if seed is None else int(seed)
        self.num_workers = int(num_workers)
        # batches decoded ahead of the consumer (≥1). Deeper lookahead keeps
        # decode running through consumer stalls (H2D transfer bursts, the
        # jit dispatch) at the cost of `lookahead` resident uint8 batches.
        self.lookahead = max(1, int(lookahead))
        self._epoch = 0
        self._train = isinstance(plan, TrainTransformPlan)
        self._target = plan.host_canvas_size if self._train else plan.img_size
        if use_native is None:
            use_native = native.available() and (
                self._train or os.environ.get("DFD_NATIVE_EVAL") == "1"
            )
        self.use_native = bool(use_native) and native.available()
        # opt-in decoded-canvas cache: the deterministic host decode is
        # identical every epoch (all randomness lives on device), so caching
        # uint8 canvases makes epochs ≥2 decode-free — the chip never starves
        # on host JPEG throughput. Cost: ~target²·3 bytes per image in RAM
        # (~200 KB at a 257px canvas). TPU extension; no reference analogue.
        self.cache_decoded = bool(cache_decoded)
        self._cache: dict[int, np.ndarray] = {}

    # -- ordering ----------------------------------------------------------
    def set_epoch(self, epoch: int) -> None:
        """Advance the shuffle stream (torch DistributedSampler idiom)."""
        self._epoch = int(epoch)

    @staticmethod
    def _processes() -> tuple[int, int]:
        import jax

        return jax.process_count(), jax.process_index()

    def _local_batch_rows(self) -> int:
        """Rows each process contributes per GLOBAL batch of ``batch_size``.

        The jitted step consumes the global batch (assembled across hosts by
        ``parallel.mesh.shard_batch``); each process decodes only its slice.
        Single-process this is just ``batch_size``."""
        pc, _ = self._processes()
        return max(self.batch_size // pc, 1)

    def _shard_len(self) -> int:
        """Per-process epoch length — IDENTICAL on every process.

        Jitted steps over a multi-host mesh execute in lockstep (every
        process must join every step, collectives or not), so per-process
        batch counts must match exactly:
        - shuffle (train): each process takes exactly ``n // pc`` samples —
          the global remainder (< pc samples) is dropped for the epoch, the
          distributed analogue of ``drop_last``
        - eval: ``ceil(n / pc)`` slots per process, the tail padded with a
          ``-1`` sentinel that decodes to a masked row — disjoint, jointly
          exhaustive, and count-aligned.
        """
        n = len(self.dataset)
        pc, _ = self._processes()
        if pc == 1:
            return n
        return n // pc if self.shuffle else -(-n // pc)

    def _order(self) -> np.ndarray:
        """THIS process's sample slots for the current epoch (may contain
        ``-1`` padding sentinels on multi-host eval — see ``_shard_len``).

        The full-epoch order (seeded permutation when shuffling) is computed
        identically on every process, then contiguously sharded so processes
        decode disjoint subsets (SURVEY.md §5.8; eval results re-assemble
        via allgather_examples)."""
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng([self.seed, self._epoch])
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        pc, pi = self._processes()
        if pc == 1:
            return order
        per = self._shard_len()
        if not self.shuffle and per * pc > n:
            padded = np.full(per * pc, -1, order.dtype)
            padded[:n] = order
            order = padded
        return order[pi * per : (pi + 1) * per]

    def __len__(self) -> int:
        rows = self._local_batch_rows()
        n = self._shard_len()
        if self.drop_last:
            return n // rows
        return -(-n // rows)

    # -- decode ------------------------------------------------------------
    def _decode_indices(self, idx: np.ndarray) -> Batch:
        """Decode one local batch slot list (``-1`` entries are padding)."""
        B = self._local_batch_rows()
        images = np.zeros((B, self._target, self._target, 3), np.uint8)
        labels = np.zeros((B,), np.int64)
        mask = np.zeros((B,), bool)
        valid_pos = [k for k, i in enumerate(idx) if int(i) >= 0]
        for k in valid_pos:
            labels[k] = self.dataset.samples[int(idx[k])][1]
        if self.cache_decoded:
            todo = [
                k for k in valid_pos if int(idx[k]) not in self._cache
            ]
            if todo:
                sub = self._decode_raw(np.asarray([int(idx[k]) for k in todo]))
                for k, arr, good in zip(todo, sub[0], sub[1]):
                    if good:
                        self._cache[int(idx[k])] = arr
            for k in valid_pos:
                arr = self._cache.get(int(idx[k]))
                if arr is not None:
                    images[k] = arr
                    mask[k] = True
        elif valid_pos:
            decoded, ok = self._decode_raw(
                np.asarray([int(idx[k]) for k in valid_pos])
            )
            for j, k in enumerate(valid_pos):
                images[k] = decoded[j]
                mask[k] = ok[j]
        return Batch(
            images=images,
            labels=labels,
            mask=mask,
            num_valid=int(mask.sum()),
        )

    def _decode_raw(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode the given sample indices → (uint8 [n,T,T,3], ok [n])."""
        if hasattr(self.dataset, "read_bytes"):
            return self._decode_from_bytes(idx)
        paths = [self.dataset.samples[i][0] for i in idx]
        if self.use_native:
            # eval plans may over-resize before the crop (trainer-val
            # geometry); the native decoder takes separate resize/crop
            # targets and performs the DIRECT center crop (a composed
            # double-crop would shift 1px on odd remainders)
            resize = (
                self._target
                if self._train
                else (self.plan.resize_size or self.plan.img_size)
            )
            decoded, status = native.decode_batch(
                paths, self._target, n_threads=max(self.num_workers, 1),
                resize_target=resize,
            )
            return decoded, status == 0
        decode = (
            (lambda p: decode_train(p, self.plan))
            if self._train
            else (lambda p: decode_eval(p, self.plan))
        )
        if self.num_workers > 0:
            arrays = list(self._decode_pool().map(decode, paths))
        else:
            arrays = [decode(p) for p in paths]
        return np.stack(arrays), np.ones(len(idx), bool)

    def _decode_from_bytes(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode bytes-backed samples (tar shards, data/shards.py).

        Native path: the reads (one seek+read per member — microseconds next
        to the decode) run serially, then ONE ``decode_buffer_batch`` call
        decodes the whole batch in the C++ thread pool — same pool, same
        resize/crop geometry as the file-path branch (a per-image
        ``decode_buffer`` loop measured 22% slower E2E on one core:
        docs/BENCHMARKS.md "Shard backend"). PIL decodes from memory with
        identical geometry otherwise (default eval path, bit-parity).
        """
        ids = [int(i) for i in idx]
        if self.use_native and native.has_buffer_batch():
            buffers = [self.dataset.read_bytes(i) for i in ids]
            resize = (
                self._target
                if self._train
                else (self.plan.resize_size or self.plan.img_size)
            )
            decoded, status = native.decode_buffer_batch(
                buffers, self._target, n_threads=max(self.num_workers, 1),
                resize_target=resize,
            )
            return decoded, status == 0
        import io

        from PIL import Image

        from deepfakedetection_tpu.data.decode import decode_pil_eval, decode_pil_train

        def decode_one(i: int) -> np.ndarray:
            data = self.dataset.read_bytes(int(i))
            with Image.open(io.BytesIO(data)) as img:
                if self._train:
                    return decode_pil_train(img, self.plan)
                return decode_pil_eval(img, self.plan)

        if self.num_workers > 0:
            arrays = list(self._decode_pool().map(decode_one, ids))
        else:
            arrays = [decode_one(i) for i in ids]
        return np.stack(arrays), np.ones(len(ids), bool)

    def _decode_pool(self) -> ThreadPoolExecutor:
        """Persistent PIL-decode pool (a per-batch pool would pay thread
        spawn/join on every batch of the epoch)."""
        pool = getattr(self, "_pool", None)
        if pool is None:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            self._pool = pool
        return pool

    def __iter__(self) -> Iterator[Batch]:
        order = self._order()
        B = self._local_batch_rows()
        n_full = len(order) // B
        chunks = [order[i * B : (i + 1) * B] for i in range(n_full)]
        if not self.drop_last and len(order) > n_full * B:
            chunks.append(order[n_full * B :])
        if not chunks:
            return
        # k-batch lookahead: up to `lookahead` batches decode while the
        # caller consumes the current one (row-level parallelism within each
        # batch comes from the shared _decode_pool)
        from collections import deque

        with ThreadPoolExecutor(max_workers=self.lookahead) as ahead:
            pending: deque = deque(
                ahead.submit(self._decode_indices, c)
                for c in chunks[: self.lookahead]
            )
            for nxt in chunks[self.lookahead:]:
                current = pending.popleft().result()
                pending.append(ahead.submit(self._decode_indices, nxt))
                yield current
            while pending:
                yield pending.popleft().result()


def make_train_loader(
    dataset: ImageFolderDataset,
    plan: TrainTransformPlan,
    *,
    batch_size: int,
    seed: int | None,
    num_workers: int = 0,
    use_native: bool | None = None,
    cache_decoded: bool = False,
) -> Loader:
    """Shuffled, drop-last loader over host canvases (device augments)."""
    return Loader(
        dataset, plan, batch_size=batch_size, shuffle=True, drop_last=True,
        seed=seed, num_workers=num_workers, use_native=use_native,
        cache_decoded=cache_decoded,
    )


def make_eval_loader(
    dataset: ImageFolderDataset,
    plan: EvalTransformPlan,
    *,
    batch_size: int,
    num_workers: int = 0,
    use_native: bool | None = None,
    cache_decoded: bool = False,
    lookahead: int = 2,
) -> Loader:
    """Deterministic-order loader; final batch zero-padded with a mask.

    PIL decode by default for bit-parity with the reference's eval pixels;
    set ``DFD_NATIVE_EVAL=1`` to opt into the native decoder (sub-1-LSB mean
    differences from resampling-filter details). ``lookahead=2`` by default:
    eval consumption is bursty (H2D transfer then jit dispatch), and a
    second staged batch keeps decode running through the bursts (measured
    on the E2E loop — docs/BENCHMARKS.md)."""
    return Loader(
        dataset, plan, batch_size=batch_size, shuffle=False, drop_last=False,
        num_workers=num_workers, use_native=use_native,
        cache_decoded=cache_decoded, lookahead=lookahead,
    )
