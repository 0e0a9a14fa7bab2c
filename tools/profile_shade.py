import sys, time, dataclasses
import jax, jax.numpy as jnp
def log(*a): print(*a, file=sys.stderr, flush=True)
from tracer.scenes import build_scene, get_scene
from tracer.render import integrator as I

desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
for d in (1, 2, 10):
    cfgd = dataclasses.replace(cfg, max_depth=d)
    rs = jax.jit(lambda s: I.render_sample(s, cfgd))
    r = rs(scene); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = rs(scene); jax.block_until_ready(r)
    log(f"render_sample depth={d}: {(time.perf_counter()-t0)*1e3:.1f}ms")
