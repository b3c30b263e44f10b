"""Multi-host eval sharding: disjoint loader coverage + identical metrics.

Simulates N processes on one host by monkeypatching jax.process_count /
process_index where data/pipeline.py consults them (real collectives can't
run single-host, so allgather_examples' identity path plus manual shard
concatenation stands in for the pod collective).
"""

import numpy as np
import pytest

from deepfakedetection_tpu.data.folder import scan_image_folder
from deepfakedetection_tpu.data.pipeline import make_eval_loader, make_train_loader
from deepfakedetection_tpu.data.transforms import build_eval_plan, build_train_plan


def _orders_for_processes(loader, monkeypatch, n_proc):
    import jax

    orders = []
    for pi in range(n_proc):
        monkeypatch.setattr(jax, "process_count", lambda: n_proc)
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        orders.append(np.asarray(loader._order()))
    monkeypatch.undo()
    return orders


@pytest.mark.parametrize("shuffle", [False, True])
def test_loader_shards_disjointly_across_processes(tiny_image_tree, monkeypatch, shuffle):
    ds = scan_image_folder(tiny_image_tree / "val")
    if shuffle:
        loader = make_train_loader(
            ds, build_train_plan(32, {}), batch_size=4, seed=7, num_workers=0
        )
    else:
        loader = make_eval_loader(ds, build_eval_plan(32, {}), batch_size=4, num_workers=0)
    loader.set_epoch(3)
    n = len(ds)
    orders = _orders_for_processes(loader, monkeypatch, 3)
    flat = np.concatenate(orders)
    # disjoint and jointly exhaustive
    assert len(flat) == n
    assert len(np.unique(flat)) == n
    for a in orders[:-1]:
        for b in orders[1:]:
            if a is not b:
                assert not set(a.tolist()) & set(b.tolist())


def test_sharded_eval_metrics_match_full_eval(tiny_image_tree, monkeypatch):
    """Concatenating per-shard probs/targets (what allgather_examples does on
    a pod) must reproduce the single-process metrics exactly."""
    import jax
    import jax.numpy as jnp

    from deepfakedetection_tpu.data.augment import normalize_batch
    from deepfakedetection_tpu.evaluate.metrics import sweep_threshold

    ds = scan_image_folder(tiny_image_tree / "val")
    plan = build_eval_plan(32, {})

    def collect(loader):
        probs_list, targets = [], []
        for batch in loader:
            x = normalize_batch(jnp.asarray(batch.images), plan, out_dtype=jnp.float32)
            # deterministic per-sample stand-in "model": mean-pixel → probs
            score = 1.0 / (1.0 + np.exp(-np.asarray(x.mean(axis=(1, 2, 3)))))
            p = np.stack([1 - score, score], -1)
            probs_list.append(p[batch.mask])
            targets.append(batch.labels[batch.mask])
        return np.concatenate(probs_list), np.concatenate(targets)

    full_loader = make_eval_loader(ds, plan, batch_size=4, num_workers=0)
    probs_full, targets_full = collect(full_loader)

    shards = []
    for pi in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        shards.append(collect(make_eval_loader(ds, plan, batch_size=4, num_workers=0)))
    monkeypatch.undo()
    probs_cat = np.concatenate([s[0] for s in shards])
    targets_cat = np.concatenate([s[1] for s in shards])

    np.testing.assert_allclose(probs_cat, probs_full, atol=1e-6)
    np.testing.assert_array_equal(targets_cat, targets_full)
    assert sweep_threshold(probs_cat[:, 1], targets_cat) == sweep_threshold(
        probs_full[:, 1], targets_full
    )


def test_allgather_examples_single_process_identity():
    from deepfakedetection_tpu.parallel.multihost import allgather_examples

    arr = np.arange(12, dtype=np.float32).reshape(6, 2)
    out = allgather_examples(arr)
    np.testing.assert_array_equal(out, arr)


def test_lockstep_batch_counts_with_remainders(tiny_image_tree, monkeypatch):
    """Per-process batch counts must be EXACTLY equal (jitted multi-host
    steps run in lockstep) even when neither the dataset size nor the batch
    divides the process count: train drops the global remainder, eval pads
    with -1 sentinels that decode to masked rows."""
    import jax

    ds = scan_image_folder(tiny_image_tree / "train")  # 16 images
    n, pc = len(ds), 3
    tplan = build_train_plan(32, {})
    eplan = build_eval_plan(32, {})

    per_proc = []
    for pi in range(pc):
        monkeypatch.setattr(jax, "process_count", lambda: pc)
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        tl = make_train_loader(ds, tplan, batch_size=6, seed=1, num_workers=0)
        el = make_eval_loader(ds, eplan, batch_size=6, num_workers=0)
        tb = list(tl)
        eb = list(el)
        per_proc.append(
            dict(
                t_len=len(tl), t_batches=len(tb),
                e_len=len(el), e_batches=len(eb),
                t_rows=[b.images.shape[0] for b in tb],
                e_valid=[int(b.mask.sum()) for b in eb],
                e_labels=np.concatenate([b.labels[b.mask] for b in eb]) if eb else np.array([]),
                t_order=np.asarray(tl._order()),
                e_order=np.asarray(el._order()),
            )
        )
    monkeypatch.undo()

    t_counts = {p["t_batches"] for p in per_proc}
    e_counts = {p["e_batches"] for p in per_proc}
    assert len(t_counts) == 1 and len(e_counts) == 1  # lockstep
    assert all(p["t_len"] == p["t_batches"] for p in per_proc)
    assert all(p["e_len"] == p["e_batches"] for p in per_proc)
    # local rows per batch = global batch / pc (= 2 for batch 6, pc 3)
    assert all(r == 2 for p in per_proc for r in p["t_rows"])
    # train: disjoint, each exactly n//pc samples (global remainder dropped)
    t_all = np.concatenate([p["t_order"] for p in per_proc])
    assert len(t_all) == (n // pc) * pc == len(np.unique(t_all))
    # eval: jointly exhaustive over the real dataset; sentinels masked out
    e_all = np.concatenate([p["e_order"] for p in per_proc])
    assert sorted(e_all[e_all >= 0].tolist()) == list(range(n))
    assert sum(sum(p["e_valid"]) for p in per_proc) == n


def test_local_rows_fetches_sharded_rows_in_order():
    """local_rows on an 8-device-sharded array must equal the full array
    (single host owns all shards; ordering by global row offset)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deepfakedetection_tpu.parallel.mesh import make_mesh
    from deepfakedetection_tpu.parallel.multihost import local_rows

    mesh = make_mesh(8, 1)
    arr = jnp.arange(32.0).reshape(16, 2)
    sharded = jax.device_put(arr, NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(local_rows(sharded), np.asarray(arr))


def test_local_rows_dedupes_model_axis_replicas():
    """With a model axis in the mesh, a P('data')-sharded array is replicated
    along 'model': each row block appears once per local model-axis device.
    local_rows must fetch each global row block exactly once (keyed by row
    offset), not concatenate every addressable shard."""
    import numpy as np

    from deepfakedetection_tpu.parallel.multihost import local_rows

    full = np.arange(16.0).reshape(8, 2)

    class FakeShard:
        def __init__(self, start, stop):
            self.index = (slice(start, stop), slice(None))
            self.data = full[start:stop]

    class FakeArray:
        is_fully_addressable = False
        # data=4 x model=2: 4 row blocks, each replicated twice, out of order
        addressable_shards = [
            FakeShard(4, 6), FakeShard(0, 2), FakeShard(4, 6), FakeShard(2, 4),
            FakeShard(0, 2), FakeShard(6, 8), FakeShard(2, 4), FakeShard(6, 8),
        ]

    np.testing.assert_array_equal(local_rows(FakeArray()), full)
