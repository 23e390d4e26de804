"""Interactive viewer: camera controllers + key dispatch + a headless
end-to-end frame (no terminal, no tev — max_frames bounds the loop).

Reference semantics: viewer/camera.rs (orbital + first-person
controllers), viewer/mod.rs:98-300 (key bindings R/S/T/Up/Down/Escape).
"""

import numpy as np
import pytest

from pathtracer_tpu.core.camera import Camera
from pathtracer_tpu.core.controller import (FirstPersonCameraController,
                                            OrbitalCameraController)
from pathtracer_tpu.frontend.interactive import ViewerState, dispatch_key


def _cam(eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0)):
    return Camera.look_at(eye, center, (0, 1, 0), fovy=np.radians(45),
                          resolution=(32, 32))


def test_orbit_preserves_radius_and_aims_at_pivot():
    cam = _cam()
    ctl = OrbitalCameraController(pivot=(0, 0, 0), orbit_speed=1.0)
    ctl.process_mouse(30.0, 10.0)
    cam2 = ctl.update_camera(cam, dt=1.0)
    p = cam2.cam_to_world[:3, 3]
    np.testing.assert_allclose(np.linalg.norm(p), 5.0, rtol=1e-6)
    # camera looks down -z toward the pivot
    fwd = -cam2.cam_to_world[:3, 2]
    np.testing.assert_allclose(fwd, -p / np.linalg.norm(p), atol=1e-6)
    # the eye actually moved
    assert np.linalg.norm(p - cam.cam_to_world[:3, 3]) > 0.5
    # accumulators reset
    assert ctl.rotate_horizontal == ctl.rotate_vertical == 0.0


def test_orbit_zoom_clamps_radius():
    cam = _cam()
    ctl = OrbitalCameraController(pivot=(0, 0, 0), zoom_speed=1.0)
    ctl.process_scroll(-0.5)  # zoom in: radius * (1 - 0.5)
    cam2 = ctl.update_camera(cam, dt=1.0)
    np.testing.assert_allclose(
        np.linalg.norm(cam2.cam_to_world[:3, 3]), 2.5, rtol=1e-6)
    ctl.process_scroll(-1e9)  # absurd zoom still >= 0.01 (camera.rs:80)
    cam3 = ctl.update_camera(cam2, dt=1.0)
    assert np.linalg.norm(cam3.cam_to_world[:3, 3]) >= 0.01 - 1e-9


def test_fps_translation_in_camera_frame():
    cam = _cam()  # at (0,0,5) looking toward -z (the origin)
    ctl = FirstPersonCameraController(move_sensitivity=1.0)
    assert ctl.process_key("w")
    cam2 = ctl.update_camera(cam, dt=1.0)
    # forward = camera -z = world (0,0,-1): w moves the eye toward origin
    np.testing.assert_allclose(cam2.cam_to_world[:3, 3], [0, 0, 4],
                               atol=1e-6)
    assert ctl.process_key("d")
    cam3 = ctl.update_camera(cam2, dt=1.0)
    # right = +x in camera frame; facing -z with up +y, right = world +x
    np.testing.assert_allclose(cam3.cam_to_world[:3, 3], [1, 0, 4],
                               atol=1e-6)
    assert not ctl.process_key("z")  # unbound key


def test_fps_yaw_rotates_view():
    cam = _cam()
    ctl = FirstPersonCameraController(rotate_sensitivity=1.0)
    ctl.process_mouse(90.0, 0.0)
    cam2 = ctl.update_camera(cam, dt=1.0)
    fwd = -cam2.cam_to_world[:3, 2]
    # rotation matrix stays orthonormal
    r = cam2.cam_to_world[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert abs(np.dot(fwd, [0, 0, -1])) < 0.1  # view turned ~90 deg


def test_dispatch_key_bindings():
    cam = _cam()
    ctl = OrbitalCameraController(pivot=(0, 0, 0))
    st = ViewerState(camera=cam, spp=4, controller=ctl)
    st = dispatch_key(st, "]")
    assert st.spp == 8
    st = dispatch_key(st, "[")
    st = dispatch_key(st, "[")
    assert st.spp == 2
    st = dispatch_key(st, "h")
    assert st.dirty
    st = dispatch_key(st, "r")
    assert st.restart
    st = dispatch_key(st, "o")
    assert st.save
    st = dispatch_key(st, "\x1b")
    assert st.quit


def test_interactive_headless_frame(tmp_path, monkeypatch):
    """One bounded interactive frame renders and writes the PNG without a
    terminal or tev server."""
    from pathtracer_tpu.frontend.interactive import run
    from pathtracer_tpu.integrator import PathConfig, PathIntegrator
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    monkeypatch.setattr("sys.stdin", open("/dev/null"))
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(16, 16))
    integ = PathIntegrator(PathConfig(max_depth=1), spp=1)
    out = str(tmp_path / "frame.png")
    film = run(cam, sd, integ, out, server_address="127.0.0.1:1",
               max_frames=1)
    assert film is not None
    import os
    assert os.path.exists(out)


def test_preview_frame_shades_albedo():
    """preview_frame (RasterScene analogue) returns an albedo-shaded
    primary-visibility image: walls colored, background dim."""
    from pathtracer_tpu.frontend.interactive import preview_frame
    from pathtracer_tpu.integrator import TracedScene
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(24, 24))
    rgb = preview_frame(cam, TracedScene.create(sd, use_pallas=False))
    assert rgb.shape == (24, 24, 3)
    assert np.isfinite(rgb).all()
    mid = rgb[8:16]
    # red wall left of image, green wall right (albedo shading visible)
    assert mid[:, :6, 0].mean() > mid[:, :6, 1].mean()
    assert mid[:, -6:, 1].mean() > mid[:, -6:, 0].mean()


def test_dispatch_key_debug_bindings():
    """'m'/'b' toggle the wireframe / BVH-bounds overlays (ref Ctrl-H /
    Ctrl-B, viewer/wireframe.rs + bounds.rs) and 'g' arms the
    single-pixel trace (ref Ctrl-click, viewer/mod.rs:304-318)."""
    cam = _cam()
    ctl = OrbitalCameraController(pivot=(0, 0, 0))
    st = ViewerState(camera=cam, spp=4, controller=ctl)
    st = dispatch_key(st, "m")
    assert st.wire and st.preview
    st.preview = False
    st = dispatch_key(st, "b")
    assert st.bounds and st.preview
    st = dispatch_key(st, "m")
    st = dispatch_key(st, "b")
    assert not st.wire and not st.bounds
    st = dispatch_key(st, "g")
    assert st.debug_pixel


def test_wireframe_overlay_marks_edges():
    """wire=True highlights triangle-edge pixels green on top of the
    albedo preview; the plain preview has none."""
    from pathtracer_tpu.frontend.interactive import preview_frame
    from pathtracer_tpu.integrator import TracedScene
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(32, 32))
    ts = TracedScene.create(sd, use_pallas=False)
    plain = preview_frame(cam, ts)
    wired = preview_frame(cam, ts, wire=True)
    edge = np.all(np.abs(wired - [0.1, 1.0, 0.25]) < 1e-6, axis=-1)
    assert edge.sum() > 10          # edges drawn
    assert edge.sum() < edge.size / 2  # but not everywhere
    assert not np.allclose(plain, wired)


def test_bvh_bounds_overlay_draws_boxes():
    """draw_bvh_bounds walks the BVH32 table's top levels and line-draws
    their AABBs over the preview (ref viewer/bounds.rs:12-114): level-0
    boxes sit inside the root scene bounds and the overlay actually
    marks pixels."""
    from pathtracer_tpu.frontend.interactive import (bvh_level_boxes,
                                                     draw_bvh_bounds,
                                                     preview_frame)
    from pathtracer_tpu.integrator import TracedScene
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(48, 48))
    ts = TracedScene.create(sd, use_bvh=True, use_pallas=False)
    boxes = bvh_level_boxes(ts, levels=2)
    assert boxes, "forced BVH scene must yield level boxes"
    p = np.concatenate([np.asarray(ts.data.p0), np.asarray(ts.data.p1),
                        np.asarray(ts.data.p2)])
    lo, hi = p.min(0), p.max(0)
    for _lvl, bmin, bmax in boxes:
        assert (bmin >= lo - 1e-3).all() and (bmax <= hi + 1e-3).all()
        assert (bmax >= bmin).all()
    img = preview_frame(cam, ts)
    before = img.copy()
    out = draw_bvh_bounds(img, cam, ts, levels=2)
    assert not np.allclose(before, out)


def test_project_points_inverts_raygen():
    """project_points is the inverse of the generate_rays chain: a point
    along the ray through raster (x, y) projects back to (x, y)."""
    import jax.numpy as jnp
    from pathtracer_tpu.core.camera import generate_rays
    from pathtracer_tpu.frontend.interactive import project_points
    cam = _cam()
    r2c, rot, pos = cam.ray_params()
    pf = jnp.asarray([[4.5, 7.25], [16.0, 16.0], [30.0, 2.0]], jnp.float32)
    o, d = generate_rays(r2c, rot, pos, pf)
    pts = np.asarray(o) + 3.0 * np.asarray(d)
    xy, ok = project_points(cam, pts)
    assert ok.all()
    np.testing.assert_allclose(xy, np.asarray(pf), atol=1e-3)
