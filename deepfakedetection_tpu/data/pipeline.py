"""Host input pipeline: seeded shuffling, process sharding, batch decode.

Replaces the reference's torch ``DataLoader`` (reference:
trainers/efficientnet.py:216-233) with a TPU-shaped loader:

- static batch shapes: the final eval batch is zero-padded with a validity
  mask (no recompilation on ragged batches); train drops the last partial
  batch like ``drop_last`` semantics implied by fixed accumulation
- deterministic per-epoch shuffling from ``(seed, epoch)`` — torch's
  ``set_epoch`` idiom — fully reproducible across processes
- multi-host: each process decodes a disjoint contiguous shard of the epoch
  order (both train and eval); eval results are re-assembled with
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
    ) -> None:
        self.dataset = dataset
        self.plan = plan
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = 0 if seed is None else int(seed)
        self.num_workers = int(num_workers)
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

    def _order(self) -> np.ndarray:
        """THIS process's sample indices for the current epoch.

        The full-epoch order (seeded permutation when shuffling) is computed
        identically on every process, then contiguously sharded so processes
        decode disjoint, jointly-exhaustive subsets (SURVEY.md §5.8; eval
        sharding re-assembles via allgather_examples)."""
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng([self.seed, self._epoch])
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        from deepfakedetection_tpu.parallel.multihost import process_shard

        start, end = process_shard(n)
        return order[start:end]

    def __len__(self) -> int:
        n = len(self._order())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    # -- decode ------------------------------------------------------------
    def _decode_indices(self, idx: np.ndarray) -> Batch:
        labels = np.asarray([self.dataset.samples[i][1] for i in idx], np.int64)
        B = self.batch_size
        images = np.zeros((B, self._target, self._target, 3), np.uint8)
        if self.cache_decoded:
            todo = [
                (k, int(i)) for k, i in enumerate(idx) if int(i) not in self._cache
            ]
            if todo:
                sub = self._decode_raw(np.asarray([i for _, i in todo]))
                for (k, i), arr, good in zip(todo, sub[0], sub[1]):
                    if good:
                        self._cache[i] = arr
            ok = np.ones(len(idx), bool)
            for k, i in enumerate(idx):
                arr = self._cache.get(int(i))
                if arr is None:
                    ok[k] = False
                else:
                    images[k] = arr
        else:
            decoded, ok = self._decode_raw(idx)
            images[: len(idx)] = decoded
        mask = np.zeros((B,), bool)
        mask[: len(idx)] = ok
        padded_labels = np.zeros((B,), np.int64)
        padded_labels[: len(idx)] = labels
        return Batch(
            images=images,
            labels=padded_labels,
            mask=mask,
            num_valid=int(mask.sum()),
        )

    def _decode_raw(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode the given sample indices → (uint8 [n,T,T,3], ok [n])."""
        paths = [self.dataset.samples[i][0] for i in idx]
        if self.use_native:
            # eval plans may over-resize before the crop (trainer-val
            # geometry); the native decoder produces the resize_size square,
            # then the compose-of-center-crops slice yields img_size
            nat_target = (
                self._target
                if self._train
                else (self.plan.resize_size or self.plan.img_size)
            )
            decoded, status = native.decode_batch(
                paths, nat_target, n_threads=max(self.num_workers, 1)
            )
            if nat_target != self._target:
                off = (nat_target - self._target) // 2
                decoded = decoded[:, off : off + self._target, off : off + self._target]
            return decoded, status == 0
        decode = (
            (lambda p: decode_train(p, self.plan))
            if self._train
            else (lambda p: decode_eval(p, self.plan))
        )
        if self.num_workers > 0:
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                arrays = list(pool.map(decode, paths))
        else:
            arrays = [decode(p) for p in paths]
        return np.stack(arrays), np.ones(len(idx), bool)

    def __iter__(self) -> Iterator[Batch]:
        order = self._order()
        B = self.batch_size
        n_full = len(order) // B
        chunks = [order[i * B : (i + 1) * B] for i in range(n_full)]
        if not self.drop_last and len(order) > n_full * B:
            chunks.append(order[n_full * B :])
        if not chunks:
            return
        # one-batch lookahead: decode batch i+1 while the caller consumes i
        with ThreadPoolExecutor(max_workers=1) as ahead:
            fut = ahead.submit(self._decode_indices, chunks[0])
            for nxt in chunks[1:]:
                current = fut.result()
                fut = ahead.submit(self._decode_indices, nxt)
                yield current
            yield fut.result()


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
) -> Loader:
    """Deterministic-order loader; final batch zero-padded with a mask.

    PIL decode by default for bit-parity with the reference's eval pixels;
    set ``DFD_NATIVE_EVAL=1`` to opt into the native decoder (sub-1-LSB mean
    differences from resampling-filter details)."""
    return Loader(
        dataset, plan, batch_size=batch_size, shuffle=False, drop_last=False,
        num_workers=num_workers, use_native=use_native,
        cache_decoded=cache_decoded,
    )
