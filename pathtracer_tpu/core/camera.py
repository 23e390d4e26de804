"""Perspective camera and batched ray generation.

Parity with reference ``src/common/mod.rs:20-63`` (transform chain) and
``src/pathtracer/mod.rs:44-81`` (ray + ray-differential generation), rebuilt
as one batched op: raster-space sample positions (N, 2) in → world-space ray
origins/directions (N, 3) out, ready for the wavefront.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def perspective_matrix(aspect: float, fovy: float, znear: float, zfar: float) -> np.ndarray:
    """nalgebra ``Perspective3`` projection matrix.

    Depth convention: camera-space z=-znear → NDC z=0, z=-zfar → NDC z=1
    (verified against the reference's own camera test, common/mod.rs:103-125:
    z_screen = ((z-n)·f)/((f-n)·z)).
    """
    f = 1.0 / np.tan(fovy / 2.0)
    m = np.zeros((4, 4), np.float64)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = zfar / (znear - zfar)
    m[2, 3] = zfar * znear / (znear - zfar)
    m[3, 2] = -1.0
    return m


def screen_to_raster_matrix(res_x: float, res_y: float) -> np.ndarray:
    """NDC [-1,1]² → raster [0,res)², y flipped (ref common/mod.rs:38-41)."""
    scale_res = np.diag([res_x, res_y, 1.0, 1.0])
    scale_half = np.diag([0.5, -0.5, 1.0, 1.0])
    translate = np.eye(4)
    translate[0, 3] = 1.0
    translate[1, 3] = -1.0
    return scale_res @ scale_half @ translate


def transform_point(m: np.ndarray, p: np.ndarray) -> np.ndarray:
    q = m @ np.append(p, 1.0)
    return q[:3] / q[3]


@dataclasses.dataclass
class Camera:
    """Host-side camera description.

    ``cam_to_world`` is a rigid transform (R, t); ``raster_to_camera`` is the
    full projective chain inverse((cam_to_screen)) @ inverse(screen_to_raster).
    """

    cam_to_world: np.ndarray  # (4,4) rigid
    raster_to_camera: np.ndarray  # (4,4) projective
    resolution: tuple[int, int]  # (width, height)
    dx_camera: np.ndarray  # (3,) camera-space shift for +1 raster x
    dy_camera: np.ndarray  # (3,)

    @staticmethod
    def create(cam_to_world: np.ndarray, aspect: float, fovy: float,
               resolution: tuple[int, int],
               znear: float = 0.01, zfar: float = 10000.0) -> "Camera":
        cam_to_screen = perspective_matrix(aspect, fovy, znear, zfar)
        s2r = screen_to_raster_matrix(resolution[0], resolution[1])
        raster_to_screen = np.linalg.inv(s2r)
        raster_to_camera = np.linalg.inv(cam_to_screen) @ raster_to_screen
        dx = transform_point(raster_to_camera, np.array([1.0, 0.0, 0.0])) - \
            transform_point(raster_to_camera, np.zeros(3))
        dy = transform_point(raster_to_camera, np.array([0.0, 1.0, 0.0])) - \
            transform_point(raster_to_camera, np.zeros(3))
        return Camera(
            cam_to_world=np.asarray(cam_to_world, np.float64),
            raster_to_camera=raster_to_camera,
            resolution=(int(resolution[0]), int(resolution[1])),
            dx_camera=dx,
            dy_camera=dy,
        )

    @staticmethod
    def look_at(eye, center, up, fovy, resolution,
                znear: float = 0.01, zfar: float = 1000.0) -> "Camera":
        """Convenience constructor (ref common/mod.rs:90-101 test camera)."""
        eye = np.asarray(eye, np.float64)
        center = np.asarray(center, np.float64)
        up = np.asarray(up, np.float64)
        f = center - eye
        f = f / np.linalg.norm(f)
        s = np.cross(f, up)
        s = s / np.linalg.norm(s)
        u = np.cross(s, f)
        # camera looks down -z in its own frame (right-handed)
        c2w = np.eye(4)
        c2w[:3, 0] = s
        c2w[:3, 1] = u
        c2w[:3, 2] = -f
        c2w[:3, 3] = eye
        aspect = resolution[0] / resolution[1]
        return Camera.create(c2w, aspect, fovy, resolution, znear, zfar)

    def ray_params(self):
        """f32 arrays consumed by generate_rays (device-side)."""
        return (
            jnp.asarray(self.raster_to_camera, jnp.float32),
            jnp.asarray(self.cam_to_world[:3, :3], jnp.float32),
            jnp.asarray(self.cam_to_world[:3, 3], jnp.float32),
        )

    def diff_params(self):
        """(2, 3) f32 camera-space raster-step offsets (dx_camera,
        dy_camera) for ray-differential generation (ref pathtracer/
        mod.rs:59-81)."""
        return jnp.asarray(np.stack([self.dx_camera, self.dy_camera]),
                           jnp.float32)

    def project_params(self):
        """World→raster projection pack for connect-to-camera splatting
        (light tracing). Returns (cam_to_raster (4,4), w2c_rot (3,3),
        w2c_pos (3,), fwd_world (3,), importance) — ``importance`` is
        z0²/A_pix, the pixel-mean-radiance conversion constant of the
        pinhole importance function We (z0 = image-plane distance, A_pix
        = image-plane area per pixel; the ratio is znear-independent)."""
        w2c = np.linalg.inv(self.cam_to_world)
        c2r = np.linalg.inv(self.raster_to_camera)
        p00 = transform_point(self.raster_to_camera, np.zeros(3))
        z0 = abs(float(p00[2]))
        a_pix = float(np.linalg.norm(np.cross(self.dx_camera,
                                              self.dy_camera)))
        fwd = -self.cam_to_world[:3, 2]  # camera looks down -z
        return (jnp.asarray(c2r, jnp.float32),
                jnp.asarray(w2c[:3, :3], jnp.float32),
                jnp.asarray(w2c[:3, 3], jnp.float32),
                jnp.asarray(fwd, jnp.float32),
                jnp.float32(z0 * z0 / max(a_pix, 1e-30)))


def project_points(cam_to_raster, w2c_rot, w2c_pos, p_world):
    """Batched world→raster projection (the raygen chain inverted).

    Returns (raster (..., 2), z_cam (...,)) — points with z_cam >= 0 are
    behind the pinhole (camera looks down -z) and must be culled by the
    caller before using the raster coordinates."""
    p_cam = p_world @ w2c_rot.T + w2c_pos
    ph = jnp.concatenate([p_cam, jnp.ones_like(p_cam[..., :1])], axis=-1)
    pr = ph @ cam_to_raster.T
    w = jnp.where(jnp.abs(pr[..., 3:4]) > 1e-20, pr[..., 3:4], 1e-20)
    return pr[..., :2] / w, p_cam[..., 2]


def generate_rays(raster_to_camera, cam_rot, cam_pos, p_film):
    """Batched pinhole raygen (ref pathtracer/mod.rs:44-57).

    p_film: (..., 2) raster-space sample positions.
    Returns (origins (...,3), directions (...,3) normalized, world space).
    """
    ph = jnp.stack(
        [p_film[..., 0], p_film[..., 1],
         jnp.zeros_like(p_film[..., 0]), jnp.ones_like(p_film[..., 0])],
        axis=-1,
    )
    pc = ph @ raster_to_camera.T
    p_camera = pc[..., :3] / pc[..., 3:4]
    d_cam = p_camera / jnp.linalg.norm(p_camera, axis=-1, keepdims=True)
    d_world = d_cam @ cam_rot.T
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    o_world = jnp.broadcast_to(cam_pos, d_world.shape)
    return o_world, d_world


def generate_rays_diff(raster_to_camera, cam_rot, cam_pos, p_film, dxdy_cam,
                       diff_scale):
    """Raygen with ray differentials (ref pathtracer/mod.rs:59-81 +
    scale_differentials, common/ray.rs:30-35).

    dxdy_cam: (2, 3) camera-space offsets for a +1 raster x/y step;
    diff_scale: 1/sqrt(spp). The pinhole differential rays share the main
    origin, so only the two auxiliary directions are returned.
    """
    ph = jnp.stack(
        [p_film[..., 0], p_film[..., 1],
         jnp.zeros_like(p_film[..., 0]), jnp.ones_like(p_film[..., 0])],
        axis=-1,
    )
    pc = ph @ raster_to_camera.T
    p_camera = pc[..., :3] / pc[..., 3:4]
    d_cam = p_camera / jnp.linalg.norm(p_camera, axis=-1, keepdims=True)
    d_world = d_cam @ cam_rot.T
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    o_world = jnp.broadcast_to(cam_pos, d_world.shape)

    def aux(dcam):
        v = p_camera + dcam
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = v @ cam_rot.T
        # reference normalizes the camera-space vector only; mirror the
        # main-ray double-normalize for frame-safety (rigid rot: no-op)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return d_world + (v - d_world) * diff_scale

    return o_world, d_world, aux(dxdy_cam[0]), aux(dxdy_cam[1])
