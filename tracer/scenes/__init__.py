"""Scene registry and builders."""

from tracer.scenes.registry import SceneDescriptor, get_scene, get_scenes  # noqa: F401
from tracer.scenes.build import build_oracle_scene, build_scene  # noqa: F401
