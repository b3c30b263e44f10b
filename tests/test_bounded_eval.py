"""Bounded eval collection (VERDICT r3 weak #6): long splits must not grow
in-flight state linearly; chunked combining must not change results."""

import numpy as np
import jax.numpy as jnp

from deepfakedetection_tpu.evaluate.job import ProbsCollector


def _fake_batches(n_batches=50, batch=8, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_batches):
        probs = jnp.asarray(rng.random((batch, 2)), jnp.float32)
        mask = rng.random(batch) > 0.2
        if i == n_batches - 1:
            mask[-3:] = False  # padded tail batch
        labels = rng.integers(0, 2, batch)
        out.append((probs, mask, labels))
    return out


def test_collector_bounds_pending_buffers():
    batches = _fake_batches(200)
    c = ProbsCollector(combine_every=8)
    for probs, mask, labels in batches:
        c.add(probs, mask, labels)
    assert c.max_pending <= 9  # never more than combine_every+1 in flight
    probs, targets = c.finish()
    n_valid = sum(int(m.sum()) for _, m, _ in batches)
    assert probs.shape == (n_valid, 2)
    assert targets.shape == (n_valid,)


def test_chunked_combine_matches_unchunked():
    batches = _fake_batches(37, seed=3)
    chunked = ProbsCollector(combine_every=4)
    unchunked = ProbsCollector(combine_every=0)  # pre-r4 behavior
    for probs, mask, labels in batches:
        chunked.add(probs, mask, labels)
        unchunked.add(probs, mask, labels)
    assert unchunked.max_pending == 37  # would grow forever
    p1, t1 = chunked.finish()
    p2, t2 = unchunked.finish()
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(t1, t2)


def test_empty_split_returns_empty_arrays():
    probs, targets = ProbsCollector(combine_every=4).finish()
    assert probs.shape == (0, 2) and targets.shape == (0,)
