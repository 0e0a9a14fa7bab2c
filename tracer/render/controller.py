"""Camera controller: WASD/arrow dolly + orbit, headless command driven.

Faithful port of the reference's ``CameraController``
(``/root/reference/src/camera.rs:36-112``): W/S dolly the eye along the
view direction (forward clamped so the eye never crosses the target);
A/D orbit the eye around the target at constant radius by nudging the
forward vector along the right axis and renormalizing. Speed 0.05 per
update, matching ``CAMERA_SPEED`` (``src/render_state.rs:31``).

The windowing stack is gone, so "keys" arrive as CLI commands
(``--camera-moves wwdd``) or driver calls — each character is one
pressed-key update tick.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tracer.render.camera import Camera, make_camera

SPEED = 0.05  # CAMERA_SPEED, render_state.rs:31

_KEYS = {
    "w": "forward", "s": "backward", "a": "left", "d": "right",
    # arrow-key aliases (camera.rs:58-74 treats them identically)
    "up": "forward", "down": "backward", "left": "left", "right": "right",
}


@dataclasses.dataclass
class CameraController:
    """Per-tick update of a host-side camera state."""

    speed: float = SPEED

    def update(self, cam: Camera, key: str) -> Camera:
        """Apply one pressed-key tick; returns the updated Camera."""
        action = _KEYS.get(key.lower())
        if action is None:
            return cam
        eye = np.asarray(cam.eye, np.float64)
        target = np.asarray(cam.target, np.float64)
        up = np.asarray(cam.up, np.float64)

        forward = target - eye
        mag = float(np.linalg.norm(forward))
        fn = forward / mag

        if action == "forward" and mag > self.speed:
            eye = eye + fn * self.speed
        if action == "backward":
            eye = eye - fn * self.speed

        right = np.cross(fn, up)
        forward = target - eye
        mag = float(np.linalg.norm(forward))
        if action == "right":
            d = forward + right * self.speed
            eye = target - d / np.linalg.norm(d) * mag
        if action == "left":
            d = forward - right * self.speed
            eye = target - d / np.linalg.norm(d) * mag

        return make_camera(
            eye=eye.astype(np.float32),
            target=np.asarray(cam.target, np.float32),
            up=np.asarray(cam.up, np.float32),
            constant=float(np.asarray(cam.constant)),
            aspect=float(np.asarray(cam.aspect)),
        )

    def run(self, cam: Camera, moves: str) -> Camera:
        """Apply a whole move string (one char per tick; 'wwad...')."""
        for ch in moves:
            cam = self.update(cam, ch)
        return cam
