"""Headless render runner: progressive tev streaming + PNG output.

Parity with reference ``src/headless.rs:180-232``: connect to tev (or fall
back to one-shot), stream in-progress film updates while rendering, write
``render.png`` at the end. The reference's 2-second polling thread becomes
per-sample-chunk callbacks from the progressive integrator (the film is
fetched from device between chunks); checkpoint/resume of the additive
accumulator comes for free.
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..core.film import to_rgb, to_rgb8
from ..integrator import PathIntegrator
from ..utils.image import write_png
from ..utils.logging import get_logger
from .tev import TevClient

log = get_logger("headless")


def run(camera, scene, integrator: PathIntegrator, output_path: str,
        server_address: str = "127.0.0.1:14158",
        chunk_spp: int | None = None,
        checkpoint: str | None = None) -> np.ndarray:
    """Render and save; returns the film accumulator as numpy (H, W, 4)."""
    w, h = camera.resolution
    tev = TevClient(server_address)
    t_start = time.perf_counter()

    def progress(done):
        # the indicatif render bar analogue (ref integrator.rs:631-635):
        # per-chunk spp progress with elapsed + ETA
        el = time.perf_counter() - t_start
        eta = el / max(done, 1) * (integrator.spp - done)
        log.info("progress: %d/%d spp  %.0fs elapsed  ~%.0fs left",
                 done, integrator.spp, el, eta)

    if tev.connected:
        log.info("streaming progressive render to tev at %s", server_address)
        tev.create_image(w, h)

        def callback(film, done):
            tev.update_image(np.asarray(to_rgb(film)))
            progress(done)

        chunk = chunk_spp or max(1, integrator.spp // 8)
    else:
        log.warning("could not connect to display server, "
                    "falling back to progressive chunked rendering")
        callback = (lambda film, done: progress(done)) \
            if (chunk_spp and chunk_spp < integrator.spp) else None
        chunk = chunk_spp or integrator.spp

    t0 = time.perf_counter()
    film = integrator.render_progressive(camera, scene, chunk_spp=chunk,
                                         callback=callback,
                                         checkpoint=checkpoint)
    log.info("rendering took: %.2fs (%.2f Mrays/s)",
             time.perf_counter() - t0,
             integrator.last_ray_count / max(time.perf_counter() - t0, 1e-9)
             / 1e6)
    if integrator.bad_sample_count:
        log.error("non-finite/negative radiance in %d samples (zeroed)",
                  int(integrator.bad_sample_count))
    if tev.connected:
        tev.update_image(np.asarray(to_rgb(film)))
        tev.close()

    out = output_path
    if os.path.isdir(out):
        out = os.path.join(out, "render.png")
    write_png(out, to_rgb8(film))
    log.info("wrote %s", out)
    return np.asarray(film)
