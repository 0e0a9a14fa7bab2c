"""Benchmark: primary-ray throughput on the reference's headline scene.

Reference headline (BASELINE.md): dragon 800x450, Lambertian, BVH traversal,
~7.78-8.40 ms/frame on the journal's laptop GPU = ~43-46 M primary rays/s at
1 spp. This bench renders the same scene shape (dragon stand-in mesh, 871k
triangles, project.wgsl-equivalent config) on one TPU chip and reports
rays/s, with vs_baseline against 45e6 rays/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra stage details go to stderr.
"""

import dataclasses
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    """Force completion: block_until_ready does NOT reliably block on the
    tunneled backend (returns before execution finishes); a host readback
    of a tiny slice does. Timing loops must end with sync()."""
    import numpy as _np

    arr = x
    try:
        _np.asarray(arr.reshape(-1)[:1])
    except Exception:
        _np.asarray(arr)


def path_frame_child():
    """Child: W8E3 path-mode ms/frame; prints 'CHILD <ms>' on stdout."""
    import jax

    from tracer.render import progressive as P
    from tracer.scenes import build_scene, get_scene

    pdesc = get_scene("W8 E3 Absorption")
    ptimings = {}
    pscene, pcfg = build_scene(pdesc, timings=ptimings)
    pstate = P.init_state(pcfg)
    t0 = time.perf_counter()
    pstate = P.step(pscene, pcfg, pstate)
    sync(pstate.accum)
    log(f"path first frame (compile + run): {time.perf_counter()-t0:.2f} s "
        f"(build {ptimings.get('total', 0.0):.2f} s)")
    pframes = 10
    t0 = time.perf_counter()
    for _ in range(pframes):
        pstate = P.step(pscene, pcfg, pstate)
    sync(pstate.accum)
    ms = (time.perf_counter() - t0) / pframes * 1e3
    log(f"path mode ({pdesc.name} {pcfg.width}x{pcfg.height} depth "
        f"{pcfg.max_depth}): {ms:.2f} ms/frame")
    print(f"CHILD {ms}")


def path_grad_child():
    """Child: W8E3 path-mode grad-step ms; prints 'CHILD <ms>'."""
    import jax

    from tracer.diff import grad as G
    from tracer.scenes import build_scene, get_scene

    pdesc = get_scene("W8 E3 Absorption")
    pscene, pcfg = build_scene(pdesc)
    pgcfg = dataclasses.replace(pcfg, loop="scan")
    ptarget = jax.numpy.zeros((pcfg.height * pcfg.width, 3))
    t0 = time.perf_counter()
    pg = G.grad_scene(pscene, pgcfg, ptarget)
    sync(pg.camera.eye)
    log(f"path grad first step (compile + run): "
        f"{time.perf_counter()-t0:.2f} s")
    t0 = time.perf_counter()
    for _ in range(3):
        pg = G.grad_scene(pscene, pgcfg, ptarget)
    sync(pg.camera.eye)
    ms = (time.perf_counter() - t0) / 3 * 1e3
    log(f"path grad step: {ms:.1f} ms")
    print(f"CHILD {ms}")


def main():
    import jax

    from tracer.render import progressive as P
    from tracer.scenes import build_scene, get_scene
    from tracer.util import self_test

    log(f"backend: {self_test()}")  # adapter probe (gpu_handles.rs:72-92)

    import os

    cache_dir = os.environ.get(
        "TRACER_JAX_CACHE", os.path.expanduser("~/.cache/tracer-jax")
    )
    try:
        cache_entries = len(os.listdir(cache_dir))
    except OSError:
        cache_entries = 0
    log(f"compile cache: {cache_entries} entries "
        f"({'warm' if cache_entries else 'cold'})")

    desc = get_scene("Project: Dragon")
    cfg = desc.cfg
    log(f"scene: {desc.name} {cfg.width}x{cfg.height} traversal={cfg.traversal}")

    timings = {}
    t0 = time.perf_counter()
    scene, cfg = build_scene(desc, timings=timings)
    sync(scene.tb.blocks)
    build_s = time.perf_counter() - t0
    log(f"scene build: {build_s:.2f} s "
        "(host products disk-cached; cold adds mesh gen + LBVH + cut)")
    log("  build stages: " + ", ".join(
        f"{k}={v:.3f}s" for k, v in timings.items()
    ) + f", block_ready={build_s - timings.get('total', 0.0):.3f}s")
    log(f"triangles: {scene.geom.indices.shape[0]}")

    state = P.init_state(cfg)
    t0 = time.perf_counter()
    state = P.step(scene, cfg, state)
    sync(state.accum)
    first_frame_s = time.perf_counter() - t0
    log(f"first frame (compile + run): {first_frame_s:.2f} s")

    # Timed frames.
    frames = 20
    t0 = time.perf_counter()
    for _ in range(frames):
        state = P.step(scene, cfg, state)
    sync(state.accum)
    dt = time.perf_counter() - t0
    ms_per_frame = dt / frames * 1e3
    rays = cfg.width * cfg.height  # primary rays per frame at 1 spp
    rays_per_s = rays * frames / dt
    log(f"{ms_per_frame:.3f} ms/frame, {rays_per_s / 1e6:.1f} Mray/s")

    # Forward+backward throughput (the BASELINE north-star counts fwd+bwd
    # aggregate): one gradient step of the L2 loss wrt the full scene
    # pytree. max_depth=2 bounds the scan driver at this scene's true depth
    # (Lambertian direct: 1 shading bounce + 1 all-dead flush).
    fwdbwd = None
    try:
        from tracer.diff import grad as G

        gcfg = dataclasses.replace(cfg, loop="scan", max_depth=2)
        target = jax.numpy.zeros((cfg.height * cfg.width, 3))
        g = G.grad_scene(scene, gcfg, target)
        sync(g.camera.eye)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            g = G.grad_scene(scene, gcfg, target)
        sync(g.camera.eye)
        dtg = (time.perf_counter() - t0) / reps
        fwdbwd = rays * 2 / dtg  # fwd + bwd passes per pixel
        log(f"grad step: {dtg*1e3:.1f} ms, fwd+bwd {fwdbwd/1e6:.1f} Mray/s")
    except Exception as e:  # keep the headline metric robust
        log(f"fwdbwd bench failed: {e!r}")

    # Path-tracer bench (VERDICT r4 item 5): W8E3 Cornell 512^2, path mode,
    # depth 10 — the BASELINE config #3 / dryrun flagship. ms/frame and
    # grad-step ms in the same JSON line. Runs in CHILD PROCESSES: the
    # axon backend tolerates only ~2 large loaded executables per process
    # (a third throws INVALID_ARGUMENT), and this process already holds
    # the dragon step + grad programs.
    path_ms = path_grad_ms = None
    import subprocess

    for flag, key in (("--path-frame-child", "path_ms"),
                      ("--path-grad-child", "path_grad_ms")):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), flag],
                capture_output=True, text=True, timeout=3600,
                env=dict(os.environ),
            )
            for ln in out.stderr.splitlines():
                log(f"  [path] {ln}")
            val = None
            for ln in out.stdout.splitlines():
                if ln.startswith("CHILD "):
                    val = float(ln.split()[1])
            if key == "path_ms":
                path_ms = val
            else:
                path_grad_ms = val
        except Exception as e:
            log(f"path bench child {flag} failed: {e!r}")

    baseline = 45.0e6  # reference BVH dragon (journal/src/project.md 4.2.2)
    print(
        json.dumps(
            {
                "metric": "primary_rays_per_second_dragon_800x450_bvh",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / baseline,
                "fwdbwd_rays_per_second": fwdbwd,
                "ms_per_frame": ms_per_frame,
                "scene_build_seconds": build_s,
                "first_frame_seconds": first_frame_s,
                "path_ms_per_frame": path_ms,
                "path_grad_ms": path_grad_ms,
                "compile_cache_entries_at_start": cache_entries,
            }
        )
    )


if __name__ == "__main__":
    if "--path-frame-child" in sys.argv:
        path_frame_child()
    elif "--path-grad-child" in sys.argv:
        path_grad_child()
    else:
        main()
