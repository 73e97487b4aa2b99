"""Orbital camera and projection math.

Mirrors ``Camera`` (Camera.{h,cpp}): a spherical-coordinate orbit
(theta = elevation, phi = azimuth, radius) around a pannable target, with
lookAt view and a 45-degree perspective projection (near 0.1, far 5000,
Camera.cpp:31-34). Matrices are float32 numpy/jax arrays in standard
math row-major convention (M @ column_vector); the reference's glm storage
is column-major, so glm ``m[c][r]`` == ``M[r, c]`` here.

Also hosts the pinhole ray generator shared by both ray pipelines
(``generateRay``, RayTracerBVH.cpp:338-355).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_octrees_tpu.config import CameraConfig


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    """Right-handed lookAt matrix (glm::lookAt semantics)."""
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    f = target - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective(fovy_deg: float, aspect: float, near: float, far: float):
    """glm::perspective (OpenGL clip conventions, -1..1 depth)."""
    f = 1.0 / math.tan(math.radians(fovy_deg) / 2.0)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (far + near) / (near - far)
    m[2, 3] = (2.0 * far * near) / (near - far)
    m[3, 2] = -1.0
    return m


@dataclasses.dataclass
class Camera:
    """Orbital camera (Camera.cpp:8-95). Host-side state; matrices are numpy."""

    theta: float = 0.0
    phi: float = 0.0
    radius: float = 3.0
    target: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )
    config: CameraConfig = CameraConfig()

    # -- pose ------------------------------------------------------------------
    def get_pos(self) -> np.ndarray:
        eye = self.radius * np.array(
            [
                math.cos(self.theta) * math.sin(self.phi),
                math.sin(self.theta),
                math.cos(self.theta) * math.cos(self.phi),
            ],
            np.float32,
        )
        return eye + self.target.astype(np.float32)

    def get_view(self) -> np.ndarray:
        return look_at(self.get_pos(), self.target)

    def get_proj(self, aspect: float) -> np.ndarray:
        c = self.config
        return perspective(c.fov_deg, aspect, c.near, c.far)

    def get_look_dir(self) -> np.ndarray:
        d = self.target.astype(np.float32) - self.get_pos()
        return d / np.linalg.norm(d)

    # -- interaction (Camera.cpp:53-84) ------------------------------------------
    def increment_theta(self, dt: float) -> None:
        nt = self.theta + dt * self.config.orbit_rate
        if -math.pi / 2 < nt < math.pi / 2:
            self.theta = nt

    def increment_phi(self, dp: float) -> None:
        self.phi -= dp * self.config.orbit_rate
        if self.phi > 2.0 * math.pi:
            self.phi -= 2.0 * math.pi
        elif self.phi < 0.0:
            self.phi += 2.0 * math.pi

    def increment_r(self, dr: float) -> None:
        self.radius = max(self.config.min_radius, self.radius - dr)

    def pan(self, dx: float, dy: float) -> None:
        look = self.get_look_dir()
        right = np.cross(look, np.array([0.0, 1.0, 0.0], np.float32))
        right = right / np.linalg.norm(right)
        up = np.cross(right, look)
        up = up / np.linalg.norm(up)
        self.target = self.target + (-dx * right + dy * up) * (
            self.radius * self.config.pan_rate
        )

    def set_target(self, t) -> None:
        self.target = np.asarray(t, np.float32)

    def pose_key(self, aspect: float) -> int:
        """Camera-pose cache hash (generateCacheFilename, main.cpp:27-45)."""
        pos = self.get_pos()
        h = 0
        for v in (pos[0], pos[1], pos[2], self.theta, self.phi, aspect):
            h ^= hash(round(float(v), 4)) + 0x9E3779B9 + (h << 6) + (h >> 2)
        return h & 0xFFFFFFFFFFFF


def generate_rays(width: int, height: int, cam_pos, view, fov_deg, aspect):
    """Per-pixel pinhole rays (generateRay, RayTracerBVH.cpp:338-355).

    Returns (origins f32[H*W, 3], directions f32[H*W, 3]) with pixel (px, py)
    at flat index py*width + px; py = 0 is the TOP row (ny = +).
    """
    fov = jnp.asarray(fov_deg, jnp.float32) * jnp.float32(math.pi / 180.0)
    tan_half = jnp.tan(fov * 0.5)
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    py = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    nx = px * aspect * tan_half
    ny = py * tan_half
    nxg, nyg = jnp.meshgrid(nx, ny, indexing="xy")  # [H, W]
    d_view = jnp.stack(
        [nxg, nyg, -jnp.ones_like(nxg)], axis=-1
    ).reshape(-1, 3)
    d_view = d_view / jnp.linalg.norm(d_view, axis=-1, keepdims=True)
    inv_view = jnp.linalg.inv(jnp.asarray(view, jnp.float32))
    d_world = jnp.matmul(d_view, inv_view[:3, :3].T,
                         precision=jax.lax.Precision.HIGHEST)
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(
        jnp.asarray(cam_pos, jnp.float32)[None, :], d_world.shape
    )
    return origins, d_world
