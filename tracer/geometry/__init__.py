"""Geometry: OBJ/MTL loading and device-resident scene buffers."""

from tracer.geometry.obj import MaterialData, MeshData, load_mtl, load_obj  # noqa: F401
from tracer.geometry.device import (  # noqa: F401
    AnalyticTriangles,
    GeometryBuffers,
    MaterialTable,
    Planes,
    Spheres,
    empty_planes,
    empty_spheres,
    empty_triangles,
    upload_mesh,
)
