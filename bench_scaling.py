"""Multi-device scaling-efficiency harness (SURVEY section 5.8).

Weak scaling of the sharded progressive step: per-device pixel workload is
held constant while the device count grows 1 -> N, so ideal scaling is
constant step time and efficiency = t(1) / t(N).

Each device count runs in its own subprocess with
``--xla_force_host_platform_device_count=<n>`` (virtual CPU devices), so
every measurement sees exactly its mesh. Without real multi-chip hardware
the virtual CPU mesh timeshares host cores — a pessimistic proxy for real
ICI scaling. On a real slice, run the child directly with
``TRACER_SCALING_TPU=1`` after ``tracer.parallel.distributed`` bring-up.

Writes SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def child(args):
    """Measure one device count in this process; print CHILD_RESULT json."""
    import jax

    if not os.environ.get("TRACER_SCALING_TPU"):
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from tracer.parallel import shard
    from tracer.render.progressive import init_state
    from tracer.scenes import build_scene, get_scene

    if args.distributed:
        from tracer.parallel.distributed import initialize_from_env

        initialize_from_env()

    devices = jax.devices()
    ndev = len(devices)
    desc = get_scene("Project: Utah Teapot")
    scene0, cfg0 = build_scene(desc)
    mesh = shard.make_ray_mesh(devices)
    h = args.rows_per_device * ndev  # weak scaling: fixed rows/device
    cfg = dataclasses.replace(cfg0, width=args.width, height=h)
    scene = shard.replicate_scene(scene0, mesh)
    state = shard.shard_state(init_state(cfg), mesh)
    step = shard.sharded_step(mesh, donate=False)
    state = step(scene, cfg, state)  # compile
    jax.block_until_ready(state.accum)
    t0 = time.perf_counter()
    for _ in range(args.samples):
        state = step(scene, cfg, state)
    jax.block_until_ready(state.accum)
    dt = (time.perf_counter() - t0) / args.samples
    print("CHILD_RESULT " + json.dumps(
        {"ndev": ndev, "ms": dt * 1e3, "platform": devices[0].platform}
    ))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--rows-per-device", type=int, default=64)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()

    if args.child:
        child(args)
        return

    counts = []
    n = 1
    while n <= args.devices:
        counts.append(n)
        n *= 2

    results = {}
    platform = "?"
    for ndev in counts:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ndev}"
        ).strip()
        cmd = [sys.executable, __file__, "--child",
               f"--rows-per-device={args.rows_per_device}",
               f"--width={args.width}", f"--samples={args.samples}"]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=900)
        row = None
        for line in out.stdout.splitlines():
            if line.startswith("CHILD_RESULT"):
                row = json.loads(line.split(" ", 1)[1])
        if row is None:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"child for {ndev} devices failed")
        results[row["ndev"]] = row["ms"]
        platform = row["platform"]
        print(f"{row['ndev']} device(s): {row['ms']:8.2f} ms/step",
              file=sys.stderr)

    base_n = min(results)
    base = results[base_n]
    lines = [
        "# Weak-scaling efficiency (sharded progressive step)",
        "",
        f"Backend: {platform}; per-device workload "
        f"{args.width}x{args.rows_per_device} pixels/step; teapot scene.",
        "",
        "| devices | ms/step | efficiency |",
        "|---|---|---|",
    ]
    for ndev in sorted(results):
        eff = base / results[ndev]
        lines.append(f"| {ndev} | {results[ndev]:.2f} | {eff*100:.1f}% |")
    lines.append("")
    lines.append("Target (BASELINE.md): >= 85% on a real multi-host slice. "
                 "Virtual CPU devices timeshare host cores, so the CPU "
                 "number is a pessimistic proxy (no ICI, shared compute).")
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")

    eff_max = base / results[max(results)]
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": eff_max,
        "unit": "ratio",
        "devices": max(results),
        "backend": platform,
    }))


if __name__ == "__main__":
    main()
