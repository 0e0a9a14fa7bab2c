"""Test harness: force the CPU backend with a virtual 8-device mesh so
sharding paths are testable without TPU hardware (SURVEY.md section 4)."""

import os

# Unconditional (not setdefault): the ambient environment may pin
# JAX_PLATFORMS to a real accelerator, but the suite needs the virtual
# 8-device CPU mesh. Set TRACER_TEST_PLATFORM to override.
os.environ["JAX_PLATFORMS"] = os.environ.get("TRACER_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The ambient environment may import jax at interpreter startup (a
# sitecustomize registering an accelerator backend), in which case jax's
# config has already captured JAX_PLATFORMS from the pre-conftest env and
# the os.environ write above is too late. Re-apply through the config API.
import jax  # noqa: E402

jax.config.update(
    "jax_platforms", os.environ.get("TRACER_TEST_PLATFORM", "cpu")
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REF = "/root/reference/res/models"


@pytest.fixture(scope="session")
def cornell_mesh():
    from tracer.geometry.obj import load_obj

    return load_obj(f"{REF}/CornellBox.obj")


@pytest.fixture(scope="session")
def cornell_blocks_mesh():
    from tracer.geometry.obj import load_obj

    return load_obj(f"{REF}/CornellBoxWithBlocks.obj")


@pytest.fixture(scope="session")
def teapot_mesh():
    from tracer.geometry.obj import load_obj

    return load_obj(f"{REF}/teapot.obj")


@pytest.fixture(scope="session")
def test_object_mesh():
    from tracer.geometry.obj import load_obj

    return load_obj(f"{REF}/test_object.obj")
