"""Interactive viewer: terminal key input + tev display.

The reference's interactive loop (viewer/mod.rs:98-300) drives a wgpu
window: camera controllers move the eye, R re-raytraces, Up/Down
double/halve pixel samples, S saves, T cycles the log level, Escape
quits. TPU pods have no display, so this equivalent keeps the SAME
interaction loop but reads single keys from the terminal (raw mode) and
shows the progressively rendered film in a running tev (the preview
channel the headless runner already speaks).

Keys (reference binding in parentheses):
  orbit mode: h/l orbit horizontally, j/k vertically, -/+ zoom
              (mouse drag / scroll)
  fps mode:   w/a/s/d move, space/c up/down, q/e roll (WASD + mouse)
  r           restart the render from sample 0          (R)
  ]/[         double / halve samples per pixel          (Up/Down)
  o           save the current film as PNG              (S)
  t           cycle log level                           (T)
  ESC or x    quit (writes the final PNG)               (Escape)

The render loop is chunked: after every sample chunk the film streams to
tev and pending keys are applied; camera motion restarts the
accumulation (the reference re-raytraces on R; here motion implies R).
"""

from __future__ import annotations

import dataclasses
import select
import sys
import time

import numpy as np

from ..core.controller import (FirstPersonCameraController,
                               OrbitalCameraController)
from ..core.film import to_rgb, to_rgb8
from ..utils.image import write_png
from ..utils.logging import cycle_level, get_logger
from .tev import TevClient

log = get_logger("viewer")


def preview_frame(camera, scene):
    """Instant preview: one primary-visibility wave shaded as
    albedo x |n . v| — the TPU stand-in for the reference viewer's
    rasterized phong preview (viewer/shaders/phong.rs; ViewerState::
    RasterScene). Returns (H, W, 3) float rgb."""
    import jax.numpy as jnp

    from ..core.camera import generate_rays
    from ..integrator import _scene_intersect
    from ..ops import bsdf as bx
    from ..ops import interaction as ia
    from ..core import math as pm

    w, h = camera.resolution
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    p_film = jnp.asarray(
        np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], -1), jnp.float32)
    r2c, rot, pos = camera.ray_params()
    o, d = generate_rays(r2c, rot, pos, p_film)
    hit = _scene_intersect(scene, o, d,
                           jnp.full((w * h,), jnp.inf, jnp.float32))
    it = ia.make_interaction(scene.data, o, d, hit, scene.tri_attr)
    mp = bx.gather_params(scene.data, it["material"], it["uv"],
                          mat_attr=scene.mat_attr, has_tex=scene.has_tex,
                          tex_channels=scene.tex_channels)
    shade = mp["kd"] * jnp.abs(pm.dot(it["ns"], -d))[..., None] \
        + ia.emitted_radiance(it, -d)
    rgb = jnp.where(hit["valid"][..., None], shade, 0.05)
    return np.asarray(rgb).reshape(h, w, 3)


@dataclasses.dataclass
class ViewerState:
    camera: object
    spp: int
    controller: object
    dirty: bool = False   # camera moved -> restart accumulation
    restart: bool = False  # explicit R
    save: bool = False
    quit: bool = False
    preview: bool = False  # 'p': show the raster-preview analogue


def dispatch_key(state: ViewerState, key: str) -> ViewerState:
    """Apply one key to the viewer state (pure-ish: controller objects
    accumulate motion; render loop applies them via update_camera)."""
    ctl = state.controller
    if key in ("\x1b", "x"):
        state.quit = True
    elif key == "r":
        state.restart = True
    elif key == "]":
        state.spp *= 2
        state.restart = True  # re-render at the new spp (ref Up key)
        log.info("pixel samples: %d", state.spp)
    elif key == "[":
        state.spp = max(1, state.spp // 2)
        state.restart = True
        log.info("pixel samples: %d", state.spp)
    elif key == "o":
        state.save = True
    elif key == "p":
        state.preview = True
    elif key == "t":
        cycle_level()
    elif isinstance(ctl, OrbitalCameraController):
        step = 30.0  # degrees per press (mouse-drag analogue)
        if key == "h":
            ctl.process_mouse(step, 0.0)
        elif key == "l":
            ctl.process_mouse(-step, 0.0)
        elif key == "j":
            ctl.process_mouse(0.0, step)
        elif key == "k":
            ctl.process_mouse(0.0, -step)
        elif key == "+" or key == "=":
            ctl.process_scroll(-0.5)
        elif key == "-":
            ctl.process_scroll(0.5)
        else:
            return state
        state.dirty = True
    elif isinstance(ctl, FirstPersonCameraController):
        look = {"i": (0.0, -15.0), "k": (0.0, 15.0),
                "j": (15.0, 0.0), "l": (-15.0, 0.0)}
        if key == "c":
            key = "shift"
        if key in look:
            ctl.process_mouse(*look[key])
            state.dirty = True
        elif ctl.process_key(key):
            state.dirty = True
    return state


def _pending_keys(timeout: float = 0.0):
    """Non-blocking single-character reads from stdin (raw mode). A
    closed stdin (piped key scripts) reads as ESC so the viewer exits
    instead of idling forever. Terminal escape SEQUENCES are translated:
    Up/Down arrows -> ']'/'[' (the reference's spp keys); other CSI
    sequences are swallowed so a stray arrow can't quit the viewer —
    only a BARE ESC quits."""
    keys = []
    while True:
        try:
            r, _, _ = select.select([sys.stdin], [], [], timeout)
        except (OSError, ValueError):
            return keys + ["\x1b"]
        if not r:
            return keys
        ch = sys.stdin.read(1)
        if not ch:  # EOF
            return keys + ["\x1b"]
        if ch == "\x1b":
            r2, _, _ = select.select([sys.stdin], [], [], 0.02)
            if not r2:
                keys.append("\x1b")  # bare ESC
            else:
                nxt = sys.stdin.read(1)
                if nxt in ("[", "O"):
                    code = sys.stdin.read(1)
                    keys.append({"A": "]", "B": "["}.get(code, ""))
                # else: alt-<key> chord — swallow
            timeout = 0.0
            continue
        keys.append(ch)
        timeout = 0.0


def run(camera, scene, integrator, output_path: str,
        server_address: str = "127.0.0.1:14158",
        controller: str = "orbit", pivot=None,
        max_frames: int | None = None):
    """Interactive loop. ``max_frames`` bounds the outer loop for tests."""
    from ..integrator import TracedScene
    if not isinstance(scene, TracedScene):
        scene = TracedScene.create(scene)
    p0 = np.asarray(scene.data.p0)
    extent = float(np.linalg.norm(p0.max(0) - p0.min(0)))
    if pivot is None:
        pivot = 0.5 * (p0.min(0) + p0.max(0))
    # unit speeds: key presses apply their nominal step exactly once per
    # update_camera(dt=1.0) (30-degree orbit, x0.5/x1.5 zoom, 0.1-rad
    # roll) — larger speeds multiply INTO the step and can alias to a
    # full revolution
    ctl = (OrbitalCameraController(pivot, orbit_speed=1.0, zoom_speed=1.0)
           if controller == "orbit"
           else FirstPersonCameraController(
               rotate_sensitivity=1.0,
               move_sensitivity=max(0.03 * extent, 1e-3)))
    state = ViewerState(camera=camera, spp=integrator.spp, controller=ctl)
    w, h = camera.resolution
    tev = TevClient(server_address)
    if tev.connected:
        tev.create_image(w, h)
        log.info("interactive viewer streaming to tev at %s",
                 server_address)
    else:
        log.warning("tev unreachable; interactive render continues "
                    "headless (keys still work, 'o' saves PNG)")

    raw = False
    if sys.stdin.isatty():
        import termios
        import tty
        fd = sys.stdin.fileno()
        saved = termios.tcgetattr(fd)
        tty.setcbreak(fd)
        raw = True
    film = None
    frames = 0
    try:
        while not state.quit:
            if max_frames is not None and frames >= max_frames:
                break
            frames += 1
            state.dirty = state.restart = False
            integrator.spp = state.spp

            def cb(f, done, _state=state):
                nonlocal film
                film = f
                if tev.connected:
                    tev.update_image(np.asarray(to_rgb(f)))
                for key in _pending_keys():
                    dispatch_key(_state, key)
                if _state.save and film is not None:
                    write_png(output_path, to_rgb8(film))
                    log.info("saved %s", output_path)
                    _state.save = False
                if _state.dirty or _state.restart or _state.quit:
                    raise _Restart()

            try:
                film = integrator.render_progressive(
                    state.camera, scene,
                    chunk_spp=max(1, min(4, state.spp)), callback=cb)
            except _Restart:
                pass
            if state.quit:
                break
            if state.dirty:
                state.camera = ctl.update_camera(state.camera, dt=1.0)
                if tev.connected:  # instant feedback while moving
                    tev.update_image(preview_frame(state.camera, scene))
                continue
            if state.restart:
                continue
            # render finished at current spp: idle-wait for input
            while not (state.dirty or state.restart or state.quit):
                keys = _pending_keys(timeout=0.25)
                for key in keys:
                    dispatch_key(state, key)
                if state.save and film is not None:
                    write_png(output_path, to_rgb8(film))
                    log.info("saved %s", output_path)
                    state.save = False
                if state.preview:
                    if tev.connected:
                        tev.update_image(preview_frame(state.camera, scene))
                    state.preview = False
                if max_frames is not None:
                    break
            if state.dirty:
                state.camera = ctl.update_camera(state.camera, dt=1.0)
    finally:
        if raw:
            termios.tcsetattr(fd, termios.TCSADRAIN, saved)
        if tev.connected:
            tev.close()
    if film is not None:
        write_png(output_path, to_rgb8(film))
        log.info("wrote %s", output_path)
    return film


class _Restart(Exception):
    """Raised inside the chunk callback to abandon the current
    accumulation (camera moved / spp changed / quit)."""
