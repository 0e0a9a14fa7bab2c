"""PRNG parity: jnp generator vs independent pure-python implementation."""

import numpy as np

from tracer.math import rng
from tracer.oracle import cpu_tracer as oracle


def test_tea_seed_matches_python():
    idx = np.array([0, 1, 12345, 2**31 + 7], np.uint32)
    it = np.array([0, 1, 999, 77], np.uint32)
    ours = np.asarray(rng.tea_seed(idx, it))
    ref = [oracle.tea_seed(int(a), int(b)) for a, b in zip(idx, it)]
    assert (ours == np.array(ref, np.uint32)).all()


def test_mcg31_stream_matches():
    state = rng.tea_seed(np.uint32(42), np.uint32(3))
    py = oracle.Rng(oracle.tea_seed(42, 3))
    for _ in range(100):
        f, state = rng.rnd(state)
        assert float(f) == float(py.rnd())


def test_rnd_int_range():
    state = np.uint32([1, 2, 3])
    for _ in range(10):
        v, state = rng.rnd_int(state)
        assert (np.asarray(v) < 2**31).all()


def test_rnd_uniform():
    idx = np.arange(10000, dtype=np.uint32)
    state = rng.pixel_seed(idx, np.uint32(0))
    u, _ = rng.rnd(state)
    u = np.asarray(u)
    assert 0.45 < u.mean() < 0.55
    assert (u >= 0).all() and (u < 1).all()
