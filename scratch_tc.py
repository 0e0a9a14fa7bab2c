import time
import jax, jax.numpy as jnp
from tracer.render import integrator as I
from tracer.render.camera import camera_rays, pixel_uv
from tracer.kernels import intersect
from tracer.kernels.intersect import Rays
from tracer.accel import flat
from tracer.math import vec
from tracer.scenes import build_scene, get_scene

def timeit(fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
W, H = cfg.width, cfg.height
u, v = pixel_uv(W, H)
r0 = camera_rays(scene.camera, u, v)
n = W * H
rays = Rays(r0.o, r0.d, jnp.full(n, cfg.eta), jnp.full(n, cfg.tmax))

def derive(rays, stage):
    t_m, tri = flat.closest_hit(rays, scene.tb, frame=(W, H))
    if stage == 0: return t_m, tri
    tri_c = jnp.clip(tri, 0, scene.geom.indices.shape[0] - 1)
    idx = scene.geom.indices[tri_c]
    v0 = scene.geom.vertices[idx[:, 0]]
    v1 = scene.geom.vertices[idx[:, 1]]
    v2 = scene.geom.vertices[idx[:, 2]]
    if stage == 1: return v0, v1, v2
    t_d, beta, gamma, _ = intersect.triangle_t(
        Rays(rays.o, rays.d, jnp.zeros_like(rays.tmin), rays.tmax), v0, v1, v2)
    if stage == 2: return t_d, beta, gamma
    n0 = scene.geom.normals[idx[:, 0]]
    n1 = scene.geom.normals[idx[:, 1]]
    n2 = scene.geom.normals[idx[:, 2]]
    sn = n0 * (1.0-beta-gamma)[:, None] + n1 * beta[:, None] + n2 * gamma[:, None]
    face_n = vec.cross(v1 - v0, v2 - v0)
    sn = jnp.where((vec.dot(sn, sn) > 1e-20)[:, None], sn, face_n)
    nrm = vec.normalize(sn, eps=1e-24)
    if stage == 3: return nrm
    mat = scene.geom.mat_ids[tri_c]
    return nrm, scene.materials.diffuse[mat], scene.materials.emission[mat]

for stage in range(5):
    dt, _ = timeit(jax.jit(lambda r, s=stage: derive(r, s)), rays)
    print(f"stage {stage}: {dt*1e3:.2f} ms")
dt, _ = timeit(jax.jit(lambda r: I.trace_closest(scene, cfg, r)), rays)
print(f"full trace_closest: {dt*1e3:.2f} ms")
