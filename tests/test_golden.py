"""Golden-image regression: cornell at fixed seeds must stay stable.

The Rust reference can't be built in this image (no cargo), so the golden
is self-generated and pinned — it catches unintended behavior changes
across refactors (BASELINE.md correctness methodology)."""

import os

import numpy as np
import pytest

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


@pytest.mark.slow
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


def _golden_check(name, cam, scene, cfg, spp):
    """Shared 64x64 golden comparison: band_rows=16 forces band-boundary
    crossings and the Gaussian splat reaches across them (VERDICT r3
    item 7: goldens big enough to catch filter-splat / band regressions).
    Tolerances mirror the sponza golden's rationale: XLA codegen variance
    across machines drifts fp slightly; real regressions shift 10%+."""
    film = np.asarray(PathIntegrator(cfg, spp=spp, band_rows=16)
                      .render(cam, scene))
    ref = np.load(os.path.join(os.path.dirname(__file__), name))["film"]
    np.testing.assert_allclose(film[..., 3], ref[..., 3], rtol=1e-5)
    f, r = film[..., :3], ref[..., :3]
    rmse = np.sqrt(np.mean((f - r) ** 2))
    assert rmse < 2e-3, rmse
    assert abs(f.mean() - r.mean()) < 0.02 * r.mean() + 1e-4


@pytest.mark.slow
def test_small_scene_golden():
    """Config B (mirror + glass spheres, point/distant lights)."""
    from pathtracer_tpu.scene.procedural import small_scene
    cam, scene = small_scene((64, 64))
    _golden_check("golden_small_64.npz", cam, scene,
                  PathConfig(max_depth=4), spp=2)


@pytest.mark.slow
def test_microfacet_golden():
    """Config C (GGX metal/substrate/glass under an area light)."""
    from pathtracer_tpu.scene.procedural import microfacet_scene
    cam, scene = microfacet_scene((64, 64))
    _golden_check("golden_microfacet_64.npz", cam, scene,
                  PathConfig(max_depth=6), spp=2)


@pytest.mark.slow
def test_envmap_disney_golden():
    """Config D (HDR envmap importance sampling + Disney BSDF)."""
    from pathtracer_tpu.scene.procedural import envmap_disney_scene
    cam, scene = envmap_disney_scene((64, 64))
    _golden_check("golden_envmap_64.npz", cam, scene,
                  PathConfig(max_depth=4), spp=2)
