"""tracer — a TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
Rust + wgpu/WGSL renderer (``cakarsubasi/02562_raytracer``): OBJ/MTL scene
loading, BSP-tree and LBVH acceleration structures, Möller-style triangle
intersection, Lambertian/Phong/mirror/dielectric (Fresnel + Beer-Lambert)
materials, point/directional/area-light next-event estimation, HDR environment
maps with RGBE decoding, stratified sampling, and progressive accumulation with
Russian-roulette termination — rebuilt TPU-first:

* the per-pixel fragment-shader megaloop of the reference
  (``res/shaders/*.wgsl``) becomes a ``jax.jit``/Pallas wavefront over ray
  batches with masked material dispatch (no divergent branches);
* the CPU Rust builders (``src/data_structures/``) become vectorized
  NumPy/JAX builders plus an optional native C++ fast path;
* the progressive accumulation ping-pong texture pair
  (``src/bindings/texture.rs``) becomes a donated device-resident
  ``(accum, iteration)`` state;
* single-GPU rasterizer parallelism becomes pixel-tile sharding over a
  ``jax.sharding.Mesh`` with ``psum``/``all_gather`` collectives.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (the traversal while-loops
    are expensive to compile; the cache makes reruns instant)."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "TRACER_JAX_CACHE", _os.path.expanduser("~/.cache/tracer-jax")
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


_enable_compilation_cache()

def __getattr__(name):
    # Lazy top-level re-exports so light submodule imports stay cheap.
    if name in ("get_scenes", "get_scene"):
        import tracer.scenes as _scenes

        return getattr(_scenes, name)
    if name == "Camera":
        from tracer.render.camera import Camera

        return Camera
    raise AttributeError(name)
