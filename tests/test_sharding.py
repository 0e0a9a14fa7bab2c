"""Multi-device sharding on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import numpy as np
import pytest

from tracer.parallel import shard as S
from tracer.render import progressive as P
from tracer.scenes import build_scene, get_scene


def _desc(w=16, h=16):
    d = get_scene("W8 E3 Absorption")
    return dataclasses.replace(
        d, cfg=dataclasses.replace(d.cfg, width=w, height=h, traversal="bvh")
    )


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return S.make_ray_mesh()


def test_sharded_matches_single_device(mesh):
    scene, cfg = build_scene(_desc())
    single = P.render_progressive(scene, cfg, 2)
    sharded = S.render_progressive_sharded(scene, cfg, 2, mesh=mesh)
    img_single = P.image(single, cfg)
    img_sharded = S.gather_image(sharded, cfg)
    assert np.allclose(img_single, img_sharded, atol=1e-5)


def test_sharded_layout(mesh):
    scene, cfg = build_scene(_desc())
    st = S.shard_state(P.init_state(cfg), mesh)
    # padded to a multiple of 8 and sharded over the ray axis
    assert st.accum.shape[0] % 8 == 0
    shard_shapes = {s.data.shape for s in st.accum.addressable_shards}
    assert len(shard_shapes) == 1
    assert next(iter(shard_shapes))[0] == st.accum.shape[0] // 8


def test_sharded_gradient_psum(mesh):
    """Gradients wrt replicated scene params reduce over the sharded ray
    axis (the implicit psum in the sharded VJP)."""
    import jax.numpy as jnp

    from tracer.diff.grad import grad_scene, render_radiance

    scene, cfg = build_scene(_desc(8, 8))
    target = jnp.zeros((cfg.height * cfg.width, 3), jnp.float32)
    g_single = grad_scene(scene, cfg, target)
    scene_r = S.replicate_scene(scene, mesh)
    g_sharded = grad_scene(scene_r, cfg, target)
    gd_s = np.asarray(g_single.materials.diffuse)
    gd_m = np.asarray(g_sharded.materials.diffuse)
    assert np.abs(gd_s).sum() > 0  # non-trivial gradient
    assert np.allclose(gd_s, gd_m, atol=1e-5)


def test_sharded_hlo_collective_structure(mesh):
    """SCALING.md section 2's claim, enforced at compile time (the
    replacement for a machine-dependent weak-scaling timing gate): at a
    production tile shape (shard rows a multiple of 32) the compiled
    sharded forward step contains ZERO inter-device collectives — scene
    and accel buffers are replicated, pixels are device-local — and the
    sharded gradient step's backward is psum-only (the all-reduce of
    replicated scene-parameter cotangents), with no gathers/permutes."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench_scaling import _COLLECTIVES, collective_census

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    # 64x32 = 2048 rays -> 256 rows/device on the 8-device mesh.
    scene, cfg = build_scene(_desc(64, 32))
    scene_r = S.replicate_scene(scene, mesh)
    state = S.shard_state(P.init_state(cfg), mesh)
    step = S.sharded_step(mesh, donate=False)
    fwd_hlo = step.lower(scene_r, cfg, state).compile().as_text()
    fwd = collective_census(fwd_hlo)
    # Loop-control predicate all-reduces (a replicated while_loop `any`
    # over sharded lanes) are latency-only scalars; the claim under test
    # is zero *data* movement: no gathers/permutes and no all-reduce
    # payload beyond control scalars.
    for k in ("all-gather", "collective-permute", "all-to-all",
              "reduce-scatter"):
        assert fwd[k] == 0, (
            f"forward step must move no data between devices, got {fwd}"
        )
    assert fwd["payload_bytes"] <= 16, (
        f"forward all-reduce payload must be control scalars only, "
        f"got {fwd}"
    )

    from tracer.diff.grad import grad_scene_jit

    target = jax.device_put(
        jnp.zeros((cfg.height * cfg.width, 3), jnp.float32),
        NamedSharding(mesh, PartitionSpec(S.RAY_AXIS, None)),
    )
    # scatter="add": the multi-device path grad_scene resolves to — the
    # plain scatter partitions as local-scatter + psum (the sorted Pallas
    # placement is single-chip-only; a global sort would all-gather).
    grad_hlo = grad_scene_jit.lower(
        scene_r, cfg, target, 1, "add"
    ).compile().as_text()
    g = collective_census(grad_hlo)
    assert g["all-reduce"] >= 1, f"gradient psum missing: {g}"
    for k in ("all-gather", "collective-permute", "all-to-all",
              "reduce-scatter"):
        assert g[k] == 0, f"backward must be psum-only, got {g}"
