"""Multi-device rendering: pixel-tile sharding over a ``jax.sharding.Mesh``.

The reference is single-GPU; its parallelism is the rasterizer over pixels
(SURVEY.md section 2.3). The TPU-native scale-out maps that same data axis
onto the device mesh:

* pixels (rows of the flat W*H wavefront) shard over the ``"rays"`` mesh
  axis — each device traces its tile; no cross-device traffic during the walk
  because scene + accel buffers are replicated (small scenes) on every device;
* the progressive accumulator shards the same way, so accumulation is
  device-local (the all_gather happens only at image export);
* gradients of replicated scene parameters are ``psum``-reduced by
  ``shard_map``'s reverse-mode transposition automatically (a sharded-batch /
  replicated-param VJP *is* the gradient all-reduce, riding ICI).

Multi-host: the same code runs under ``jax.distributed.initialize`` with a
(hosts, chips_per_host) mesh; the "rays" axis spans both (DCN x ICI), and
each host feeds only its addressable shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tracer.render import integrator
from tracer.render.progressive import ProgressiveState
from tracer.render.scene import Scene, SceneConfig
from tracer.util import replace

RAY_AXIS = "rays"


def make_ray_mesh(devices=None) -> Mesh:
    """1-D device mesh over which pixel tiles shard."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def pad_to(n: int, k: int) -> int:
    return -(-n // k) * k


def shard_state(state: ProgressiveState, mesh: Mesh) -> ProgressiveState:
    """Lay out the accumulator sharded over the ray axis (pad rows so the
    leading dim divides the mesh)."""
    k = mesh.devices.size
    n = state.accum.shape[0]
    n_pad = pad_to(n, k)
    accum = jnp.pad(state.accum, ((0, n_pad - n), (0, 0)))
    accum = jax.device_put(
        accum, NamedSharding(mesh, P(RAY_AXIS, None))
    )
    seed_t = jax.device_put(
        jnp.pad(state.seed_t, (0, n_pad - n)),
        NamedSharding(mesh, P(RAY_AXIS)),
    )
    # Commit the iteration counter replicated too: otherwise call 2 of the
    # step (iteration now a committed device array) retraces with a new
    # input layout.
    iteration = jax.device_put(state.iteration, NamedSharding(mesh, P()))
    return ProgressiveState(accum=accum, iteration=iteration, seed_t=seed_t)


def replicate_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Replicate every scene buffer on all devices (the reference uploads a
    copy per GPU; here a single logical copy with replicated sharding)."""
    spec = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, spec), scene)


def sharded_step(mesh: Mesh, donate: bool = True):
    """Build the jitted sharded progressive step for ``mesh``.

    Uses jit-with-shardings (GSPMD): the wavefront partitions over the ray
    axis automatically; XLA inserts no collectives in the forward pass
    because every non-batch input is replicated.
    """

    @partial(
        jax.jit,
        static_argnames=("cfg",),
        **({"donate_argnames": ("state",)} if donate else {}),
    )
    def step(scene: Scene, cfg: SceneConfig, state: ProgressiveState):
        scene = replace(
            scene, uniforms=replace(scene.uniforms, iteration=state.iteration)
        )
        n = cfg.width * cfg.height
        result = integrator.render_sample(scene, cfg)
        n_pad = state.accum.shape[0]
        if n_pad != n:
            result = jnp.pad(result, ((0, n_pad - n), (0, 0)))
        accum = integrator.accumulate(result, state.accum, state.iteration)
        accum = jax.lax.with_sharding_constraint(
            accum, NamedSharding(mesh, P(RAY_AXIS, None))
        )
        # Temporal seeding stays single-chip for now (the Pallas flat
        # engine is not traced under GSPMD); the hint rides along unused.
        return ProgressiveState(
            accum=accum, iteration=state.iteration + 1, seed_t=state.seed_t
        )

    return step


def gather_image(state: ProgressiveState, cfg: SceneConfig) -> np.ndarray:
    """Assemble the full image on host (the reference's surface present)."""
    n = cfg.width * cfg.height
    acc = np.asarray(state.accum)[:n]
    disp = integrator.to_display(jnp.asarray(acc), cfg)
    return np.asarray(disp).reshape(cfg.height, cfg.width, 3)


def render_progressive_sharded(
    scene: Scene,
    cfg: SceneConfig,
    num_samples: int,
    mesh: Mesh | None = None,
):
    """Multi-device progressive render; returns the sharded final state."""
    from tracer.render.progressive import init_state

    mesh = mesh if mesh is not None else make_ray_mesh()
    scene = replicate_scene(scene, mesh)
    state = shard_state(init_state(cfg), mesh)
    step = sharded_step(mesh)
    for _ in range(num_samples):
        state = step(scene, cfg, state)
    return state
