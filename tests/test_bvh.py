"""BVH builder invariants (reference contract: raytrace.ts:540-694)."""

import numpy as np

from tpu_pathtracer.accel.bvh import build_bvh_flat, flat_to_links


def _soup(n=97, seed=3):
    rs = np.random.RandomState(seed)
    base = rs.uniform(-2, 2, (n, 3))
    p0 = base
    p1 = base + rs.uniform(-0.4, 0.4, (n, 3))
    p2 = base + rs.uniform(-0.4, 0.4, (n, 3))
    return p0.astype(np.float32), p1.astype(np.float32), p2.astype(np.float32)


def test_structure_invariants():
    p0, p1, p2 = _soup()
    n = p0.shape[0]
    bvh = build_bvh_flat(p0, p1, p2)
    k = bvh["left"].shape[0]
    assert k == 2 * n - 1  # one leaf per triangle, binary internal nodes

    leaves = bvh["is_leaf"] == 1
    assert leaves.sum() == n
    # every triangle appears in exactly one leaf
    assert sorted(bvh["tri"][leaves].tolist()) == list(range(n))
    # internal nodes have valid child indices, children come after parents (BFS)
    internal = ~leaves
    assert (bvh["left"][internal] > np.nonzero(internal)[0]).all()
    assert (bvh["right"][internal] > np.nonzero(internal)[0]).all()
    assert (bvh["tri"][internal] == -1).all()
    assert (bvh["left"][leaves] == -1).all()

    # child bboxes are contained in parents; root contains everything
    for i in np.nonzero(internal)[0]:
        for c in (bvh["left"][i], bvh["right"][i]):
            assert (bvh["min"][c] >= bvh["min"][i] - 1e-6).all()
            assert (bvh["max"][c] <= bvh["max"][i] + 1e-6).all()
    tri_min = np.minimum(np.minimum(p0, p1), p2).min(axis=0)
    tri_max = np.maximum(np.maximum(p0, p1), p2).max(axis=0)
    assert np.allclose(bvh["min"][0], tri_min, atol=1e-6)
    assert np.allclose(bvh["max"][0], tri_max, atol=1e-6)


def test_bfs_order():
    # BFS layout: nodes appear level by level; children of node i appear
    # in order after all nodes of i's level (raytrace.ts:667-694).
    p0, p1, p2 = _soup(33, seed=5)
    bvh = build_bvh_flat(p0, p1, p2)
    k = bvh["left"].shape[0]
    # reconstruct BFS from the tree and compare to identity
    order = []
    queue = [0]
    while queue:
        i = queue.pop(0)
        order.append(i)
        if bvh["is_leaf"][i] == 0:
            queue.append(bvh["left"][i])
            queue.append(bvh["right"][i])
    assert order == list(range(k))


def test_two_and_one_triangle():
    p0, p1, p2 = _soup(2, seed=7)
    bvh = build_bvh_flat(p0, p1, p2)
    assert bvh["left"].shape[0] == 3
    # 2-node fast path keeps incoming order (raytrace.ts:587-589)
    assert bvh["tri"][bvh["left"][0]] == 0
    assert bvh["tri"][bvh["right"][0]] == 1

    bvh1 = build_bvh_flat(p0[:1], p1[:1], p2[:1])
    assert bvh1["left"].shape[0] == 1
    assert bvh1["is_leaf"][0] == 1 and bvh1["tri"][0] == 0


def test_empty():
    z = np.zeros((0, 3), np.float32)
    bvh = build_bvh_flat(z, z, z)
    assert bvh["left"].shape[0] == 0
    links = flat_to_links(bvh)
    assert links["miss"].shape[0] == 0


def test_links_cover_all_leaves_in_preorder():
    p0, p1, p2 = _soup(41, seed=11)
    n = p0.shape[0]
    bvh = build_bvh_flat(p0, p1, p2)
    links = flat_to_links(bvh)
    k = links["miss"].shape[0]
    assert k == bvh["left"].shape[0]

    # walking hit-next (i+1) from the root visits every node once; walking
    # only miss links from any node eventually terminates at k
    for start in range(k):
        p, steps = start, 0
        while p < k:
            p = links["miss"][p]
            steps += 1
            assert steps <= k + 1
    # leaves hold each triangle exactly once
    tris = links["tri"][links["tri"] >= 0]
    assert sorted(tris.tolist()) == list(range(n))
    # miss links only point forward (preorder skip)
    idx = np.arange(k)
    assert (links["miss"] > idx).all()
