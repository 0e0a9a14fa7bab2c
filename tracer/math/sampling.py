"""Monte-Carlo sampling warps.

Reproduces the reference's warps:

* cosine-weighted hemisphere (``setup_indirect``,
  ``/root/reference/res/shaders/w8e3.wgsl:492-509``): theta = acos(sqrt(1-x1)),
  phi = 2*pi*x2, rotated to the shading normal;
* uniform triangle sampling with the sqrt warp (``sample_area_light``,
  ``/root/reference/res/shaders/w9e2.wgsl:406-433``);
* stratified sub-pixel jitters with a fixed-seed PCG stream
  (``compute_jitters``, ``/root/reference/src/bindings/uniform.rs:254-277``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tracer.math import onb, rng, vec

MAX_SUBDIVISION = 10  # reference MAX_SUBDIVISION (uniform.rs:36)


def cosine_hemisphere(normal, state):
    """Cosine-weighted direction about ``normal``; returns (dir, state')."""
    xi1, state = rng.rnd(state)
    xi2, state = rng.rnd(state)
    theta = jnp.arccos(jnp.sqrt(1.0 - xi1))
    phi = 2.0 * jnp.pi * xi2
    tang = onb.spherical_direction(jnp.sin(theta), jnp.cos(theta), phi)
    return onb.rotate_to_normal(vec.normalize(normal), tang), state


def triangle_barycentric(state):
    """(alpha, beta, gamma) uniform over a triangle; returns (bary, state').

    psi1 = sqrt(rnd), psi2 = rnd; alpha = 1-psi1, beta = (1-psi2)*psi1,
    gamma = psi2*psi1 (``w9e2.wgsl:417-421``).
    """
    u1, state = rng.rnd(state)
    u2, state = rng.rnd(state)
    psi1 = jnp.sqrt(u1)
    alpha = 1.0 - psi1
    beta = (1.0 - u2) * psi1
    gamma = u2 * psi1
    return jnp.stack([alpha, beta, gamma], axis=-1), state


class _PcgLcg64Xsh32:
    """rand_pcg's Lcg64Xsh32 (PCG-XSH-RR 64/32) with the reference's
    ``new(0, 0)`` seeding, for bit-compatible jitter tables."""

    MUL = 6364136223846793005
    MASK = (1 << 64) - 1

    def __init__(self, state: int = 0, stream: int = 0):
        self.inc = ((stream << 1) | 1) & self.MASK
        # rand_pcg new(): state = (state + inc) * MUL + inc
        self.state = ((state + self.inc) * self.MUL + self.inc) & self.MASK

    def next_u32(self) -> int:
        s = self.state
        self.state = (s * self.MUL + self.inc) & self.MASK
        xorshifted = (((s >> 18) ^ s) >> 27) & 0xFFFFFFFF
        rot = s >> 59
        return ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & 0xFFFFFFFF

    def gen_range_f64(self) -> float:
        # rand's Standard f64 from [0,1): 53 random bits / 2^53
        hi = self.next_u32()
        lo = self.next_u32()
        val = (lo | (hi << 32)) >> 11
        return val / float(1 << 53)


def compute_jitters(pixel_size: float, subdivs: int) -> np.ndarray:
    """Stratified sub-pixel offsets, shape (subdivs**2, 2) float32.

    Matches ``compute_jitters`` (``uniform.rs:254-277``): a fresh PCG stream
    per table, cell-stratified offsets centered on the pixel; subdivs == 1
    yields the single zero jitter.
    """
    assert 0 < subdivs <= MAX_SUBDIVISION and pixel_size != 0.0
    if subdivs == 1:
        return np.zeros((1, 2), np.float32)
    prng = _PcgLcg64Xsh32(0, 0)
    step = pixel_size / subdivs
    out = np.empty((subdivs * subdivs, 2), np.float32)
    k = 0
    for i in range(subdivs):
        for j in range(subdivs):
            u1 = prng.gen_range_f64()
            u2 = prng.gen_range_f64()
            out[k, 0] = (u1 + j) * step - pixel_size * 0.5
            out[k, 1] = (u2 + i) * step - pixel_size * 0.5
            k += 1
    return out
