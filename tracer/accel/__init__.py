"""Acceleration structures: LBVH and BSP builders + device traversal."""

from tracer.accel import lbvh, traverse  # noqa: F401
