import time
import jax, jax.numpy as jnp
from tracer.render import progressive as P
from tracer.scenes import build_scene, get_scene

desc = get_scene("Project: Dragon")
scene, cfg = build_scene(desc)
state = P.init_state(cfg)
state = P.step(scene, cfg, state)
jax.block_until_ready(state.accum)
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(5):
        state = P.step(scene, cfg, state)
    jax.block_until_ready(state.accum)
print("done")
