"""OBJ/MTL loader semantics vs the reference's tobj behavior."""

import numpy as np


def test_cornell_load(cornell_mesh):
    m = cornell_mesh
    assert m.num_triangles == 12
    assert len(m.materials) == 4
    names = [mat.name for mat in m.materials]
    assert "light" in names
    light_mat = m.materials[names.index("light")]
    assert light_mat.illum == 1
    assert np.allclose(light_mat.ambient, [27.6, 23.4, 12.0], atol=1e-5)
    # emissive triangle extraction (storage_mesh.rs:316-332)
    lights = m.light_indices()
    assert len(lights) == 2
    assert all(m.materials[m.mat_ids[i]].illum == 1 for i in lights)


def test_cornell_no_normals_zero_filled(cornell_mesh):
    # CornellBox.obj has no vn statements -> zero normals (mesh.rs:159-166)
    assert np.all(cornell_mesh.normals == 0.0)


def test_teapot_has_normals(teapot_mesh):
    assert teapot_mesh.num_triangles == 6320  # journal benchmark count
    norms = np.linalg.norm(teapot_mesh.normals, axis=1)
    assert (norms > 0.5).all()


def test_indices_in_range(teapot_mesh, cornell_mesh):
    for m in (teapot_mesh, cornell_mesh):
        assert m.indices.max() < m.num_vertices
        assert (m.mat_ids < max(len(m.materials), 1)).all() or (
            m.mat_ids == 0xFFFFFFFF
        ).any()


def test_scale(cornell_mesh):
    s = cornell_mesh.scale(1.0 / 500.0)
    assert np.allclose(s.vertices, cornell_mesh.vertices / 500.0)


def test_bboxes(teapot_mesh):
    lo, hi = teapot_mesh.bboxes()
    assert lo.shape == (teapot_mesh.num_triangles, 3)
    assert (lo <= hi).all()
