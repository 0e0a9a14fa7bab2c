"""Procedural stand-in meshes for assets missing from the reference mount.

``res/models/bunny.obj`` and ``res/models/dragon.obj`` appear in the scene
table (``/root/reference/src/scenes.rs:91-93``) but are listed in
``.MISSING_LARGE_BLOBS``. These generators produce meshes of comparable
triangle count and world placement (bunny ~69k tris around the bunny camera
target, dragon ~871k) so the scenes render and benchmarks measure realistic
workloads. They are clearly stand-ins, not the Stanford models.
"""

from __future__ import annotations

import numpy as np

from tracer.geometry.obj import MaterialData, MeshData


def uv_sphere(n_lat: int, n_lon: int, radius: float, center) -> MeshData:
    """Lat-long sphere with smooth normals; 2 * n_lat * n_lon triangles."""
    lat = np.linspace(0.0, np.pi, n_lat + 1)
    lon = np.linspace(0.0, 2 * np.pi, n_lon + 1)[:-1]
    LAT, LON = np.meshgrid(lat, lon, indexing="ij")
    x = np.sin(LAT) * np.cos(LON)
    y = np.cos(LAT)
    z = np.sin(LAT) * np.sin(LON)
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)

    def vid(i, j):
        return i * n_lon + (j % n_lon)

    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            if i > 0:
                faces.append((a, c, b))
            if i < n_lat - 1:
                faces.append((b, c, d))
    verts = (pts * radius + np.asarray(center)).astype(np.float32)
    normals = pts.astype(np.float32)
    idx = np.asarray(faces, np.uint32)
    return MeshData(
        vertices=verts,
        normals=normals,
        indices=idx,
        mat_ids=np.zeros(idx.shape[0], np.uint32),
        materials=[MaterialData.default()],
    )


def bumpy_blob(n_lat: int, n_lon: int, radius: float, center, seed=0) -> MeshData:
    """Sphere perturbed by low-frequency bumps — a stand-in with non-trivial
    normal variation and BVH structure."""
    m = uv_sphere(n_lat, n_lon, 1.0, (0.0, 0.0, 0.0))
    v = m.vertices
    rs = np.random.RandomState(seed)
    freqs = rs.randn(5, 3).astype(np.float32)
    phase = rs.rand(5).astype(np.float32) * 6.28
    bump = np.zeros(v.shape[0], np.float32)
    for k in range(5):
        bump += 0.08 * np.sin(v @ (freqs[k] * 3.0) + phase[k])
    scale = (1.0 + bump)[:, None]
    verts = (v * scale * radius + np.asarray(center)).astype(np.float32)
    # Recompute smooth-ish normals from faces.
    idx = m.indices.astype(np.int64)
    a, b, c = verts[idx[:, 0]], verts[idx[:, 1]], verts[idx[:, 2]]
    fn = np.cross(b - a, c - a)
    normals = np.zeros_like(verts)
    for k in range(3):
        np.add.at(normals, idx[:, k], fn)
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = (normals / np.maximum(lens, 1e-20)).astype(np.float32)
    return MeshData(
        vertices=verts,
        normals=normals,
        indices=m.indices,
        mat_ids=m.mat_ids,
        materials=m.materials,
    )


def standin_for(path: str) -> MeshData:
    """Stand-in selection by missing-asset name."""
    name = path.rsplit("/", 1)[-1]
    if "bunny" in name:
        # bunny: 69,451 tris, fits the bunny camera (target ~(-0.02, 0.11, 0))
        return bumpy_blob(187, 187, 0.09, (-0.02, 0.11, 0.0), seed=1)
    if "dragon" in name:
        # dragon: 871,414 tris
        return bumpy_blob(660, 660, 0.10, (-0.02, 0.11, 0.0), seed=2)
    raise FileNotFoundError(path)
