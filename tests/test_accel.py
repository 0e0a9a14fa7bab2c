"""Acceleration-structure invariants and traversal parity vs brute force.

Mirrors the reference's builder tests (leaf coverage ``bsp_tree.rs:357-392``,
id uniqueness ``:395-420``, HLBVH smoke ``hlbvh.rs:536-573``) and adds what it
lacked: hit parity between accelerated and brute-force traversal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracer.accel import lbvh, traverse
from tracer.kernels.intersect import make_rays, mesh_brute_force, mesh_brute_force_anyhit


def _rand_rays(mesh, n=512, seed=0):
    rs = np.random.RandomState(seed)
    lo = mesh.vertices.min(axis=0)
    hi = mesh.vertices.max(axis=0)
    c = (lo + hi) / 2
    ext = float(np.max(hi - lo))
    o = c + rs.randn(n, 3).astype(np.float32) * ext
    tgt = c + rs.randn(n, 3).astype(np.float32) * ext * 0.3
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


@pytest.mark.parametrize("max_prims", [1, 4, 8])
def test_lbvh_invariants(teapot_mesh, max_prims):
    lo, hi = teapot_mesh.bboxes()
    bvh = lbvh.build(lo, hi, max_prims=max_prims)
    lbvh.validate(bvh, teapot_mesh.num_triangles)
    assert (bvh.count[bvh.count > 0] <= max_prims).all()


def test_lbvh_tiny(cornell_mesh):
    lo, hi = cornell_mesh.bboxes()
    bvh = lbvh.build(lo, hi, max_prims=4)
    lbvh.validate(bvh, cornell_mesh.num_triangles)


def test_lbvh_single_leaf():
    lo = np.zeros((3, 3), np.float32)
    hi = np.ones((3, 3), np.float32)
    bvh = lbvh.build(lo, hi, max_prims=4)
    assert bvh.count[0] == 3
    lbvh.validate(bvh, 3)


def test_lbvh_duplicate_centroids():
    # all-identical centroids: morton codes collide; index bits must
    # disambiguate (PBRT trick).
    lo = np.zeros((64, 3), np.float32)
    hi = np.ones((64, 3), np.float32)
    bvh = lbvh.build(lo, hi, max_prims=4)
    lbvh.validate(bvh, 64)


def test_closest_hit_matches_brute(teapot_mesh):
    lo, hi = teapot_mesh.bboxes()
    bvh = jax.tree.map(jnp.asarray, lbvh.build(lo, hi, 4))
    V = jnp.asarray(teapot_mesh.vertices)
    I = jnp.asarray(teapot_mesh.indices.astype(np.int64), jnp.int32)
    rays = _rand_rays(teapot_mesh, 512)
    bt, bid = mesh_brute_force(rays, V, I)
    ct, cid = traverse.bvh_closest_hit(rays, bvh, V, I)
    bt, bid, ct, cid = map(np.asarray, (bt, bid, ct, cid))
    assert (bid >= 0).sum() > 50  # rays actually hit
    assert ((bid >= 0) == (cid >= 0)).all()
    both = bid >= 0
    assert np.allclose(bt[both], ct[both], atol=1e-4)
    assert (bid[both] == cid[both]).mean() > 0.999


def test_any_hit_matches_brute(cornell_mesh):
    lo, hi = cornell_mesh.bboxes()
    bvh = jax.tree.map(jnp.asarray, lbvh.build(lo, hi, 4))
    V = jnp.asarray(cornell_mesh.vertices)
    I = jnp.asarray(cornell_mesh.indices.astype(np.int64), jnp.int32)
    rays = _rand_rays(cornell_mesh, 512, seed=1)
    b = np.asarray(mesh_brute_force_anyhit(rays, V, I))
    a = np.asarray(traverse.bvh_any_hit(rays, bvh, V, I))
    assert (a == b).all()


def test_anyhit_respects_tmax(cornell_mesh):
    lo, hi = cornell_mesh.bboxes()
    bvh = jax.tree.map(jnp.asarray, lbvh.build(lo, hi, 4))
    V = jnp.asarray(cornell_mesh.vertices)
    I = jnp.asarray(cornell_mesh.indices.astype(np.int64), jnp.int32)
    # ray from box center toward a wall, but tmax too short to reach it
    o = jnp.asarray([[278.0, 274.0, 279.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    rays_short = make_rays(o, d, tmin=1e-4, tmax=10.0)
    rays_long = make_rays(o, d, tmin=1e-4, tmax=5000.0)
    assert not bool(traverse.bvh_any_hit(rays_short, bvh, V, I)[0])
    assert bool(traverse.bvh_any_hit(rays_long, bvh, V, I)[0])
