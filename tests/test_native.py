"""Native C++ LBVH builder vs the NumPy reference implementation."""

import numpy as np
import pytest

from tracer.accel import lbvh

native = pytest.importorskip("tracer.accel.native")


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_matches_numpy_structure(teapot_mesh):
    lo, hi = teapot_mesh.bboxes()
    a = lbvh.build(lo, hi, 4)
    b = native.build(lo, hi, 4)
    lbvh.validate(b, teapot_mesh.num_triangles)
    assert a.left.shape[0] == b.left.shape[0]
    assert np.array_equal(a.prim_ids, b.prim_ids)
    assert np.allclose(a.node_min[0], b.node_min[0])
    assert np.allclose(a.node_max[0], b.node_max[0])


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_traversal_parity(teapot_mesh):
    import jax
    import jax.numpy as jnp

    from tracer.accel import traverse
    from tracer.kernels.intersect import make_rays, mesh_brute_force

    lo, hi = teapot_mesh.bboxes()
    bvh = jax.tree.map(jnp.asarray, native.build(lo, hi, 4))
    V = jnp.asarray(teapot_mesh.vertices)
    I = jnp.asarray(teapot_mesh.indices.astype(np.int64), jnp.int32)
    rs = np.random.RandomState(3)
    n = 256
    o = np.array([0.15, 1.5, 10.0], np.float32) + rs.randn(n, 3).astype(np.float32)
    tgt = rs.randn(n, 3).astype(np.float32) * 2
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d))
    bt, bid = map(np.asarray, mesh_brute_force(rays, V, I))
    ct, cid = map(np.asarray, traverse.bvh_closest_hit(rays, bvh, V, I))
    assert ((bid >= 0) == (cid >= 0)).all()
    both = bid >= 0
    assert np.allclose(bt[both], ct[both], atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_edge_cases():
    # tiny: single leaf
    lo = np.zeros((2, 3), np.float32)
    hi = np.ones((2, 3), np.float32)
    b = native.build(lo, hi, 4)
    assert b.count[0] == 2
    # duplicate centroids
    lo = np.zeros((100, 3), np.float32)
    hi = np.ones((100, 3), np.float32)
    b = native.build(lo, hi, 4)
    lbvh.validate(b, 100)


def test_native_bsp_matches_numpy(teapot_mesh):
    """The native C++ BSP builder must produce a bit-identical tree to the
    NumPy reference implementation (compiled with -ffp-contract=off so no
    FMA divergence)."""
    import numpy as np

    from tracer.accel import bsp as B
    from tracer.accel import native

    if not native.bsp_available():
        import pytest

        pytest.skip("native BSP unavailable")
    lo, hi = teapot_mesh.bboxes()
    a = B.build(lo, hi, max_depth=12, max_objects=4, prefer_native=False)
    b = B.build(lo, hi, max_depth=12, max_objects=4, prefer_native=True)
    for f in ("axis", "plane", "left", "right", "first", "count",
              "prim_ids"):
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f
        )
    np.testing.assert_array_equal(a.bbox_lo, b.bbox_lo)
    B.validate(b, teapot_mesh.num_triangles)
