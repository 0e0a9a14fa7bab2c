"""Camera controller parity with the reference (camera.rs:82-111)."""

import numpy as np

from tracer.render.camera import make_camera
from tracer.render.controller import SPEED, CameraController


def _cam():
    return make_camera(eye=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0),
                       constant=1.0)


def test_dolly_forward_backward():
    c = CameraController()
    cam = c.update(_cam(), "w")
    assert np.allclose(np.asarray(cam.eye), [0, 0, 3.0 - SPEED])
    cam = c.update(_cam(), "s")
    assert np.allclose(np.asarray(cam.eye), [0, 0, 3.0 + SPEED])


def test_forward_clamped_at_target():
    # camera.rs:90: forward motion stops when |forward| <= speed
    c = CameraController()
    cam = make_camera(eye=(0.0, 0.0, SPEED * 0.5), target=(0.0, 0.0, 0.0),
                      constant=1.0)
    out = c.update(cam, "w")
    assert np.allclose(np.asarray(out.eye), np.asarray(cam.eye))


def test_orbit_preserves_radius():
    c = CameraController()
    cam = _cam()
    for key in ("a", "d"):
        out = c.run(cam, key * 50)
        r = np.linalg.norm(np.asarray(out.eye) - np.asarray(out.target))
        assert abs(r - 3.0) < 1e-4
        # moved around the circle, not in place
        assert not np.allclose(np.asarray(out.eye), np.asarray(cam.eye))


def test_arrow_aliases():
    c = CameraController()
    assert np.allclose(
        np.asarray(c.update(_cam(), "up").eye),
        np.asarray(c.update(_cam(), "w").eye),
    )
