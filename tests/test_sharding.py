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


def test_weak_scaling_harness():
    """1 -> 2 device weak scaling through the bench_scaling children.

    This host has few cores, so the virtual-device proxy can't meet the
    real >= 85% ICI target (SCALING.md documents the caveat); assert a
    generous sanity bound and that the harness machinery works end to end.
    """
    import json
    import os
    import subprocess
    import sys

    results = {}
    for ndev in (1, 2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={ndev}"
        )
        env.pop("TRACER_TEST_PLATFORM", None)
        out = subprocess.run(
            [sys.executable, "bench_scaling.py", "--child",
             "--rows-per-device=16", "--width=64", "--samples=2"],
            env=env, capture_output=True, text=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        rows = [json.loads(l.split(" ", 1)[1])
                for l in out.stdout.splitlines()
                if l.startswith("CHILD_RESULT")]
        assert rows, out.stderr[-1500:]
        results[ndev] = rows[0]["ms"]
    eff = results[1] / results[2]
    assert eff > 0.35, f"2-device weak-scaling efficiency {eff:.2f}"
