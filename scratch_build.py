import os, time
import jax
jax.config.update("jax_platforms", "cpu")
t0 = time.perf_counter()
from tracer.scenes import build_scene, get_scene
from tracer.scenes.build import _load_mesh_cached
desc = get_scene("Project: Dragon")
t1 = time.perf_counter()
mesh = _load_mesh_cached(desc.model, desc.model_scale)
t2 = time.perf_counter()
print(f"mesh gen: {t2-t1:.2f}s ({mesh.num_triangles} tris)")
from tracer.accel import lbvh, treelet
t3 = time.perf_counter()
binary = lbvh.build_for_mesh(mesh, max_prims=desc.bvh_leaf)
t4 = time.perf_counter()
print(f"lbvh build: {t4-t3:.2f}s")
tb = treelet.build(binary, mesh.vertices, mesh.indices)
t5 = time.perf_counter()
print(f"treelet build: {t5-t4:.2f}s")
from tracer.geometry.device import upload_mesh
geom, mats, li = upload_mesh(mesh)
t6 = time.perf_counter()
print(f"upload_mesh (cpu): {t6-t5:.2f}s")
scene, cfg = build_scene(desc)
t7 = time.perf_counter()
print(f"full build_scene (cached mesh): {t7-t6:.2f}s")
