"""Acceleration-structure build benchmark harness.

Mirrors the reference's ``bvh`` benchmark binary
(``/root/reference/src/bin/bvh_project.rs:11-106``) section for section —
N-run averaged builds with the reference's stage taxonomy
(morton/radix/treelet/upper-tree/flatten via StageTimer):

  1. triangle scaling (teapot / bunny / dragon, 4 leaf prims)
  2. dragon leaf-primitive sweep 1..16
  3. multithreaded scaling (native OpenMP MT vs OMP_NUM_THREADS=1 ST)
  4. BVH vs BSP tree (depth 20, matching leaf sizes)
  5. treelet-cut packing (this framework's extra production stage)

Prints tables to stdout and rewrites ``BUILD_BENCH.md``. Reference numbers
to compare against are in BASELINE.md (journal/src/benchmark.md: dragon
BVH 49.28 ms MT / 99.24 ms ST, BSP 827.9 ms on a Ryzen 7 7735HS).

Runs on the CPU backend only (no device involvement).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tracer.accel import bsp as bsp_mod  # noqa: E402
from tracer.accel import lbvh, native, treelet  # noqa: E402
from tracer.scenes.build import _load_mesh_cached  # noqa: E402
from tracer.util import StageTimer  # noqa: E402

REF_MODELS = "/root/reference/res/models"
STAGES = ["bounds", "morton", "radix_sort", "treelets", "upper_tree",
          "flatten"]


def log(*a):
    print(*a, flush=True)


def avg_stages(fn, runs):
    tot: dict[str, float] = {}
    for _ in range(runs):
        t = StageTimer()
        fn(t)
        for k, v in t.stages.items():
            tot[k] = tot.get(k, 0.0) + v
    return {k: v / runs for k, v in tot.items()}


def fmt_row(name, stages):
    total = sum(stages.values()) * 1e3
    parts = "  ".join(f"{k}={v * 1e3:.2f}" for k, v in stages.items())
    return f"{name:<38} total {total:8.2f} ms   ({parts})"


def bvh_numpy(mesh, max_prims):
    def f(t):
        lbvh.build_for_mesh(mesh, max_prims=max_prims, timer=t,
                            prefer_native=False)
    return f


def bvh_native(mesh, max_prims):
    def f(t):
        lbvh.build_for_mesh(mesh, max_prims=max_prims, timer=t,
                            prefer_native=True)
    return f


def bsp_build(mesh, max_objects):
    def f(t):
        lo, hi = mesh.bboxes()
        bsp_mod.build(lo, hi, 20, max_objects, timer=t)
    return f


def treelet_pack(mesh, binary):
    def f(t):
        host = treelet.build_host(binary)
        t.mark("treelet_cut_host")
        tb = treelet.from_host(
            host,
            np.asarray(mesh.vertices, np.float32),
            mesh.indices.astype(np.int32),
        )
        jax.block_until_ready(tb.blocks)
        t.mark("block_gather_device")
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=100)
    ap.add_argument("--bsp-runs", type=int, default=3)
    ap.add_argument("--numpy-dragon-runs", type=int, default=10)
    ap.add_argument("--st", action="store_true",
                    help="internal: run the ST section in this process")
    args = ap.parse_args()

    meshes = {}
    for name, path in [
        ("teapot", f"{REF_MODELS}/teapot.obj"),
        ("bunny", f"{REF_MODELS}/bunny.obj"),
        ("dragon", f"{REF_MODELS}/dragon.obj"),
    ]:
        meshes[name] = _load_mesh_cached(path, 1.0)
        log(f"{name}: {meshes[name].num_triangles} triangles")

    if args.st:
        # Subprocess mode: OMP_NUM_THREADS=1 was set by the parent.
        for mp in (4, 8):
            st = avg_stages(bvh_native(meshes["dragon"], mp),
                            max(args.runs // 4, 5))
            print("ST_RESULT " + json.dumps({"max_prims": mp, "stages": st}))
        return

    lines = []

    def emit(s=""):
        log(s)
        lines.append(s)

    emit(f"# Build benchmarks ({args.runs}-run averages, "
         f"{os.cpu_count()} CPUs)")
    emit()
    emit("Reference numbers (Ryzen 7 7735HS, journal/src/benchmark.md): "
         "BVH dragon 49.28 ms MT / 99.24 ms ST; teapot 0.993 ms; bunny "
         "4.305 ms; BSP dragon 827.9 ms (depth 20).")
    emit()

    emit("## 1. Triangle scaling (4 leaf prims, native MT)")
    scaling = {}
    for name in ("teapot", "bunny", "dragon"):
        st = avg_stages(bvh_native(meshes[name], 4), args.runs)
        scaling[name] = st
        emit(fmt_row(f"BVH {name} ({meshes[name].num_triangles:,})", st))
    emit()

    emit("## 2. Dragon leaf-primitive sweep (native MT)")
    for mp in (1, 2, 4, 6, 8, 16):
        st = avg_stages(bvh_native(meshes["dragon"], mp),
                        max(args.runs // 2, 5))
        emit(fmt_row(f"BVH dragon, {mp} leaf prims", st))
    emit()

    emit("## 3. Multithreaded scaling (dragon)")
    mt = {mp: avg_stages(bvh_native(meshes["dragon"], mp),
                         max(args.runs // 2, 5)) for mp in (4, 8)}
    env = dict(os.environ, OMP_NUM_THREADS="1")
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--st", f"--runs={args.runs}"],
            env=env, capture_output=True, text=True, timeout=600,
        ).stdout
        st_rows = [json.loads(l.split(" ", 1)[1])
                   for l in out.splitlines() if l.startswith("ST_RESULT")]
    except Exception:
        st_rows = []
    for mp in (4, 8):
        emit(fmt_row(f"BVH dragon, {mp}, MT", mt[mp]))
        row = next((r for r in st_rows if r["max_prims"] == mp), None)
        if row:
            emit(fmt_row(f"BVH dragon, {mp}, ST", row["stages"]))
            emit(f"{'':<38} MT speedup {sum(row['stages'].values()) / sum(mt[mp].values()):.2f}x")
    emit()

    emit("## 4. BVH vs BSP tree (depth 20)")
    for name, br in (("teapot", args.runs), ("bunny", max(args.runs // 10, 3)),
                     ("dragon", args.bsp_runs)):
        emit(fmt_row(f"BVH {name}, 4, MT", scaling[name]))
        st = avg_stages(bsp_build(meshes[name], 4), br)
        emit(fmt_row(f"BSP {name}, 4, depth 20 ({br} runs)", st))
    emit()

    emit("## 5. NumPy reference builder vs native (dragon, 4)")
    st = avg_stages(bvh_numpy(meshes["dragon"], 4), args.numpy_dragon_runs)
    emit(fmt_row(f"BVH dragon NumPy ({args.numpy_dragon_runs} runs)", st))
    emit(fmt_row("BVH dragon native MT", mt[4]))
    emit()

    emit("## 6. Treelet-cut packing (production T=1024 stage)")
    binary = lbvh.build_for_mesh(meshes["dragon"], max_prims=4)
    st = avg_stages(treelet_pack(meshes["dragon"], binary),
                    max(args.runs // 10, 3))
    emit(fmt_row("treelet pack dragon", st))
    emit()
    emit(f"native builder available: {native.available()}")

    with open("BUILD_BENCH.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    log("\nwrote BUILD_BENCH.md")


if __name__ == "__main__":
    main()
