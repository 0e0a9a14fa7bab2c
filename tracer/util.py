"""Small shared utilities: pytree dataclasses and timers."""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax


def pytree_dataclass(cls=None, *, static: tuple[str, ...] = ()):
    """Register a dataclass as a JAX pytree.

    Fields named in ``static`` become aux (hashable, trigger recompiles on
    change); everything else is traced array data. Fields may be ``None``
    (treated as an empty subtree by JAX).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [
            f.name for f in dataclasses.fields(c) if f.name not in static
        ]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(static)
        )
        return c

    return wrap if cls is None else wrap(cls)


def replace(obj, **kwargs):
    """dataclasses.replace that works on frozen pytree dataclasses."""
    return dataclasses.replace(obj, **kwargs)


class StageTimer:
    """Per-stage wall timer mirroring the reference's build profilers
    (``BvhConstructionTime``, ``/root/reference/src/data_structures/bvh_util.rs:4-57``)."""

    def __init__(self) -> None:
        self.stages: dict[str, float] = {}
        self._t0 = time.perf_counter()

    def mark(self, name: str) -> None:
        t = time.perf_counter()
        self.stages[name] = self.stages.get(name, 0.0) + (t - self._t0)
        self._t0 = t

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    def display(self) -> str:
        lines = [f"  {k}: {v * 1e3:.3f} ms" for k, v in self.stages.items()]
        lines.append(f"  total: {self.total * 1e3:.3f} ms")
        return "\n".join(lines)

    def merged(self, other: "StageTimer") -> "StageTimer":
        out = StageTimer()
        out.stages = dict(self.stages)
        for k, v in other.stages.items():
            out.stages[k] = out.stages.get(k, 0.0) + v
        return out


def timed(fn: Callable[..., Any], *args, **kwargs) -> tuple[Any, float]:
    """Run ``fn``, blocking on JAX outputs, and return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    out = jax.block_until_ready(out)
    return out, time.perf_counter() - t0
