import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("TRACER_NO_PALLAS", "1")
import numpy as np
import jax.numpy as jnp

from tracer.geometry import procedural
from tracer.accel import lbvh, treelet, packet
from tracer.kernels import intersect

mesh = procedural.bumpy_blob(24, 24, 1.0, (0.0, 0.0, 0.0))  # ~1k tris
print("tris:", mesh.num_triangles)
binary = lbvh.build(*mesh.bboxes(), max_prims=4)
tb = treelet.build(binary, mesh.vertices, mesh.indices, T=32)
print("treelets:", tb.blocks.shape, "top rows:", tb.top.shape, "depth:", tb.depth)
treelet.validate(np.asarray(tb.top), np.asarray(tb.blocks), mesh.num_triangles)
print("validate ok")

rng = np.random.default_rng(0)
N = 512
o = rng.normal(size=(N, 3)).astype(np.float32) * 3.0
tgt = rng.normal(size=(N, 3)).astype(np.float32) * 0.5
d = tgt - o
d /= np.linalg.norm(d, axis=1, keepdims=True)
rays = intersect.make_rays(jnp.asarray(o), jnp.asarray(d))

t_ref, id_ref = intersect.mesh_brute_force(
    rays, jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices)
)
t_p, id_p = packet.closest_hit(rays, tb)
t_ref, id_ref, t_p, id_p = map(np.asarray, (t_ref, id_ref, t_p, id_p))
bad = id_ref != id_p
print("id mismatches:", bad.sum(), "/", N)
if bad.sum():
    i = np.nonzero(bad)[0][:10]
    print("ref", id_ref[i], t_ref[i])
    print("pkt", id_p[i], t_p[i])
hit = id_ref >= 0
print("max |t| err on hits:", np.abs(t_ref[hit] - t_p[hit]).max() if hit.any() else 0)

# any-hit parity: occlusion within a tmax window
rays2 = intersect.make_rays(jnp.asarray(o), jnp.asarray(d), tmax=4.0)
b_ref = intersect.mesh_brute_force_anyhit(
    rays2, jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices)
)
b_p = packet.any_hit(rays2, tb)
print("any-hit mismatches:", int((np.asarray(b_ref) != np.asarray(b_p)).sum()))
