"""Golden-image regression: cornell at fixed seeds must stay stable.

The Rust reference can't be built in this image (no cargo), so the golden
is self-generated and pinned — it catches unintended behavior changes
across refactors (BASELINE.md correctness methodology)."""

import os

import numpy as np

from pathtracer_tpu.integrator import PathConfig, PathIntegrator
from pathtracer_tpu.scene.mitsuba import load_mitsuba

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_cornell_32.npz")


def test_cornell_matches_golden():
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(32, 32))
    film = PathIntegrator(PathConfig(max_depth=3), spp=2).render(cam, sd)
    want = np.load(GOLDEN)["film"]
    got = np.asarray(film)
    # identical sampling; tolerate compiler fusion variance only
    rmse = np.sqrt(np.mean((got - want) ** 2))
    assert rmse < 1e-3, rmse
