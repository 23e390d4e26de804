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


def test_sponza_glb_golden():
    """Pin the flagship GLB path end to end (import -> alpha split ->
    BVH8 main+alpha trees -> render): tiny-res film vs a committed golden
    (VERDICT r3 item 5)."""
    from pathtracer_tpu.scene.gltf import load_gltf
    cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(48, 27))
    integ = PathIntegrator(PathConfig(max_depth=1), spp=2)
    film = np.asarray(integ.render(cam, sd))
    ref = np.load(os.path.join(os.path.dirname(__file__),
                               "golden_sponza_48.npz"))["film"]
    # filter weights are sampler-deterministic -> exact
    np.testing.assert_allclose(film[..., 3], ref[..., 3], rtol=1e-5)
    # radiance: XLA codegen variants (persistent-cache machine features,
    # virtual-device count) shift fp enough to flip grazing shadow
    # binaries at 2 spp (measured 1.5% mean drift between identical-code
    # runs), so the comparison is statistical — still far tighter than
    # any real import/traversal regression (wrong texture, missing alpha
    # split, broken camera all shift the mean by 10%+)
    f, r = film[..., :3], ref[..., :3]
    assert abs(f.mean() - r.mean()) < 0.03 * r.mean() + 1e-4
    rel = np.abs(f - r) / (np.abs(r) + 5e-2)
    assert (rel > 0.05).mean() < 0.10, \
        f"{(rel > 0.05).mean():.1%} of channels off by >5%"
