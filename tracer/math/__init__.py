"""Math primitives: batched vec ops, ONB, PRNG, sampling warps."""

from tracer.math import onb, rng, sampling, vec  # noqa: F401
