"""Parity check: flat frustum traversal vs brute force (run with
JAX_PLATFORMS=cpu TRACER_NO_PALLAS=1)."""

import numpy as np
import jax.numpy as jnp

from tracer.geometry import procedural
from tracer.accel import lbvh, treelet, flat
from tracer.kernels import intersect

mesh = procedural.bumpy_blob(24, 24, 1.0, (0.0, 0.0, 0.0))
print("tris:", mesh.num_triangles)
binary = lbvh.build(*mesh.bboxes(), max_prims=4)
tb = treelet.build(binary, mesh.vertices, mesh.indices, T=128)
print("treelets:", tb.blocks.shape[0])

rng = np.random.default_rng(0)

# Coherent pinhole-ish rays (shared origin, small cone) + incoherent ones.
N = 1024
o1 = np.tile(np.array([[3.0, 0.2, 0.1]], np.float32), (N // 2, 1))
tgt = rng.normal(size=(N // 2, 3)).astype(np.float32) * 0.4
d1 = tgt - o1
o2 = rng.normal(size=(N // 2, 3)).astype(np.float32) * 3.0
d2 = rng.normal(size=(N // 2, 3)).astype(np.float32)
o = np.concatenate([o1, o2])
d = np.concatenate([d1, d2])
d /= np.linalg.norm(d, axis=1, keepdims=True)
rays = intersect.make_rays(jnp.asarray(o), jnp.asarray(d))

t_ref, id_ref = intersect.mesh_brute_force(
    rays, jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices)
)
for K in (128, 8):  # K=8 forces many cursor rounds
    t_f, id_f = flat._run(rays, tb, None, any_hit=False, K=K)
    id_f = np.asarray(id_f.astype(jnp.int32))
    bad = np.asarray(id_ref) != id_f
    print(f"K={K}: id mismatches {bad.sum()}/{N}")
    if bad.sum():
        i = np.nonzero(bad)[0][:5]
        print(" ref", np.asarray(id_ref)[i], np.asarray(t_ref)[i])
        print(" flt", id_f[i], np.asarray(t_f)[i])

rays2 = intersect.make_rays(jnp.asarray(o), jnp.asarray(d), tmax=4.0)
b_ref = intersect.mesh_brute_force_anyhit(
    rays2, jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices)
)
b_f = flat.any_hit(rays2, tb)
print("any-hit mismatches:", int((np.asarray(b_ref) != np.asarray(b_f)).sum()))

# Frame-tiled path.
W, H = 40, 30
u = (np.arange(W) + 0.5) / W - 0.5
v = 0.5 - (np.arange(H) + 0.5) / H
uu, vv = np.meshgrid(u, v)
df = np.stack([uu.ravel(), vv.ravel(), -np.ones(W * H)], -1).astype(np.float32)
df /= np.linalg.norm(df, axis=1, keepdims=True)
of = np.tile(np.array([[0.1, 0.0, 3.0]], np.float32), (W * H, 1))
raysf = intersect.make_rays(jnp.asarray(of), jnp.asarray(df))
t_ref, id_ref = intersect.mesh_brute_force(
    raysf, jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices)
)
t_f, id_f = flat.closest_hit(raysf, tb, frame=(W, H))
print(
    "frame id mismatches:",
    int((np.asarray(id_ref) != np.asarray(id_f)).sum()), "/", W * H,
)
hit = np.asarray(id_ref) >= 0
print("frame hit frac:", hit.mean())
