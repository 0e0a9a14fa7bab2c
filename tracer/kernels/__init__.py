"""Device compute kernels: vectorized intersections and Pallas paths."""

from tracer.kernels import intersect  # noqa: F401
