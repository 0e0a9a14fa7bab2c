"""Progressive accumulation, determinism, and checkpoint/resume."""

import dataclasses
import os

import numpy as np

from tracer.render import progressive as P
from tracer.scenes import build_scene, get_scene


def _desc(w=12, h=12):
    d = get_scene("W8 E3 Absorption")
    return dataclasses.replace(
        d, cfg=dataclasses.replace(d.cfg, width=w, height=h, traversal="bvh")
    )


def test_progressive_mean_and_determinism():
    scene, cfg = build_scene(_desc())
    s1 = P.render_progressive(scene, cfg, 3)
    assert int(s1.iteration) == 3
    # Re-render: counter-based PRNG -> bit-identical accumulators.
    s2 = P.render_progressive(scene, cfg, 3)
    assert np.array_equal(np.asarray(s1.accum), np.asarray(s2.accum))
    # Mean of per-iteration passes equals the accumulated state.
    from tracer.diff.grad import render_radiance

    manual = np.mean(
        [np.asarray(render_radiance(scene, cfg, i)) for i in range(3)], axis=0
    )
    # Tolerance: the progressive step and render_radiance are separately
    # compiled XLA programs; fusion/fma differences give ~1e-5-scale f32
    # drift on long bounce chains even though the math is identical.
    assert np.allclose(manual, np.asarray(s1.accum), atol=2e-4, rtol=1e-4)


def test_checkpoint_resume(tmp_path):
    scene, cfg = build_scene(_desc())
    full = P.render_progressive(scene, cfg, 4)
    ckpt = os.path.join(tmp_path, "state.npz")
    half = P.render_progressive(scene, cfg, 2)
    P.save_checkpoint(ckpt, half, cfg)
    resumed = P.load_checkpoint(ckpt, cfg)
    assert int(resumed.iteration) == 2
    done = P.render_progressive(scene, cfg, 4, state=resumed)
    assert np.allclose(np.asarray(done.accum), np.asarray(full.accum), atol=1e-6)


def test_image_export(tmp_path):
    from tracer import io as tio

    scene, cfg = build_scene(_desc())
    st = P.render_progressive(scene, cfg, 1)
    img = P.image(st, cfg)
    assert img.shape == (cfg.height, cfg.width, 3)
    assert (img >= 0).all() and (img <= 1).all()
    png = os.path.join(tmp_path, "out.png")
    pfm = os.path.join(tmp_path, "out.pfm")
    tio.write_png(png, img)
    lin = np.asarray(st.accum).reshape(cfg.height, cfg.width, 3)
    tio.write_pfm(pfm, lin)
    assert os.path.getsize(png) > 0
    back = tio.read_pfm(pfm)
    assert np.allclose(back, lin)


def test_live_param_change_no_recompile():
    """The reference applies control-panel commands between frames without
    rebuilding the pipeline (lib.rs:365-488); here every tunable is a
    traced input, so changing camera constant or material selection must
    reuse the compiled step (zero recompiles)."""
    import dataclasses

    import jax.numpy as jnp

    from tracer.render import progressive as P
    from tracer.scenes import build_scene, get_scene
    from tracer.util import replace

    desc = get_scene("W1 E6")
    desc = dataclasses.replace(
        desc, cfg=dataclasses.replace(desc.cfg, width=16, height=16)
    )
    scene, cfg = build_scene(desc)
    state = P.step(scene, cfg, P.init_state(cfg))
    n0 = P.step._cache_size()

    scene2 = replace(
        scene,
        camera=replace(
            scene.camera, constant=jnp.asarray(2.5, jnp.float32)
        ),
        uniforms=replace(
            scene.uniforms, selection1=jnp.asarray(2, jnp.int32)
        ),
    )
    state = P.step(scene2, cfg, P.init_state(cfg))
    assert P.step._cache_size() == n0, "parameter change must not recompile"


def test_interactive_cli_repl(tmp_path):
    """Drive the --interactive REPL end-to-end over stdin."""
    import subprocess
    import sys

    out_png = tmp_path / "live.png"
    cmds = f"c 2.0\nm1 5\nr 2\nsave {out_png}\nq\n"
    r = subprocess.run(
        [sys.executable, "-m", "tracer.cli", "--scene", "W1 E6",
         "--width", "16", "--height", "16", "--interactive"],
        input=cmds, capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_png.exists()
    assert "ms/frame" in r.stderr


def test_seeded_frames_bit_identical():
    """Temporal t-bound seeding is an accelerator, not an approximation:
    frame radiance with a (good or garbage) seed is bit-identical to the
    unseeded render — undershooting lanes go through the flat engine's
    exact repair pass (tracer.accel.flat._run)."""
    import jax.numpy as jnp

    from tracer.render import integrator
    from tracer.util import replace

    d = get_scene("Project: Utah Teapot")  # 6.3k tris -> treelet engine
    d = dataclasses.replace(
        d, cfg=dataclasses.replace(d.cfg, width=24, height=16)
    )
    scene, cfg = build_scene(d)
    assert integrator._single_bounce(cfg)  # the seeded driver engages
    assert integrator._effective_traversal(scene, cfg) == "bvh"
    n = cfg.width * cfg.height
    scene = replace(
        scene, uniforms=replace(scene.uniforms, iteration=jnp.uint32(0))
    )
    base = np.asarray(integrator.render_sample(scene, cfg))

    zero_seed = jnp.zeros((n,), jnp.float32)
    r0, seed1 = integrator.render_sample_seeded(scene, cfg, zero_seed)
    assert np.array_equal(base, np.asarray(r0))
    # Real seed from frame 0 (mesh-hit lanes carry their depth).
    assert float(jnp.max(seed1)) > 0.0
    r1, _ = integrator.render_sample_seeded(scene, cfg, seed1)
    assert np.array_equal(base, np.asarray(r1))
    # Adversarial seeds: way too tight (every lane repairs) and garbage.
    r2, _ = integrator.render_sample_seeded(scene, cfg, seed1 * 0.05)
    assert np.array_equal(base, np.asarray(r2))
    r3, _ = integrator.render_sample_seeded(
        scene, cfg, jnp.full((n,), 1e-4, jnp.float32)
    )
    assert np.array_equal(base, np.asarray(r3))
