"""Native (C++) BVH builder parity: bit-identical trees vs the numpy oracle
(csrc/bvh_builder.cpp vs accel/bvh.py), across mesh sizes and degeneracies."""

import numpy as np
import pytest

from tpu_pathtracer.accel import bvh
from tpu_pathtracer.accel.native import (
    build_bvh_flat_native,
    flat_to_links_native,
    get_lib,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native builder unavailable (no g++?)"
)


def _random_tris(n, seed=0, spread=10.0, size=0.3):
    rng = np.random.default_rng(seed)
    c = (rng.random((n, 3)).astype(np.float32) - 0.5) * spread
    p0 = c
    p1 = c + (rng.random((n, 3)).astype(np.float32) - 0.5) * size
    p2 = c + (rng.random((n, 3)).astype(np.float32) - 0.5) * size
    return p0, p1, p2


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 1000])
def test_native_matches_numpy(n):
    p0, p1, p2 = _random_tris(n, seed=n)
    ref = bvh.build_bvh_flat(p0, p1, p2, native=False)
    nat = build_bvh_flat_native(p0, p1, p2)
    for k in ref:
        np.testing.assert_array_equal(nat[k], ref[k], err_msg=k)


def test_native_links_match_numpy():
    p0, p1, p2 = _random_tris(257, seed=9)
    flat = bvh.build_bvh_flat(p0, p1, p2, native=False)
    ref = bvh.flat_to_links(flat, end=600, native=False)
    nat = flat_to_links_native(flat, end=600)
    for k in ref:
        np.testing.assert_array_equal(nat[k], ref[k], err_msg=k)


def test_native_degenerate_coplanar():
    # identical centroids: stable-sort tie-breaking must match numpy
    n = 33
    base = np.zeros((n, 3), np.float32)
    p0, p1, p2 = base, base + [1, 0, 0], base + [0, 1, 0]
    ref = bvh.build_bvh_flat(p0, p1, p2, native=False)
    nat = build_bvh_flat_native(p0, p1, p2)
    for k in ref:
        np.testing.assert_array_equal(nat[k], ref[k], err_msg=k)


def test_native_empty():
    z = np.zeros((0, 3), np.float32)
    out = build_bvh_flat_native(z, z, z)
    assert out["left"].shape == (0,)


def test_native_large_and_fast():
    import time

    p0, p1, p2 = _random_tris(100_000, seed=3)
    t0 = time.time()
    nat = build_bvh_flat_native(p0, p1, p2)
    dt = time.time() - t0
    assert nat["left"].shape[0] == 199_999
    # generous wall bound (numpy takes ~4.4s alone; native ~0.2s) — loose
    # enough to survive CPU contention from parallel test processes
    assert dt < 15.0, f"native 100K build took {dt:.1f}s"
    # spot-check structural invariants instead of full numpy parity (slow)
    leaf = nat["is_leaf"] == 1
    assert leaf.sum() == 100_000
    assert (np.sort(nat["tri"][leaf]) == np.arange(100_000)).all()
    inner = ~leaf
    assert (nat["left"][inner] > 0).all() and (nat["right"][inner] > 0).all()
    assert (nat["min"] <= nat["max"]).all()
