"""(Re)generate the golden films pinned by tests/test_golden.py.

Self-generated goldens (no cargo in this image, BASELINE.md correctness
methodology): run ONLY when a behavior change is intended, eyeball the
renders, then commit the refreshed .npz files together with the change
that moved them.

Usage: python tools/make_goldens.py [configA|configB|configC|configD|sponza ...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

# goldens are pinned against the TEST environment: CPU backend, 8 virtual
# devices (tests/conftest.py) — sitecustomize registers the axon TPU at
# interpreter startup, so flip jax_platforms after import too
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform == "cpu"

from pathtracer_tpu.integrator import PathConfig, PathIntegrator  # noqa


TESTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests")


def save(name, film):
    path = os.path.join(TESTS, name)
    np.savez_compressed(path, film=np.asarray(film))
    print(f"wrote {path} mean={np.asarray(film)[..., :3].mean():.4f}")


def config_a():
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(32, 32))
    save("golden_cornell_32.npz",
         PathIntegrator(PathConfig(max_depth=3), spp=2).render(cam, sd))


def config_b():
    from pathtracer_tpu.scene.procedural import small_scene
    cam, scene = small_scene((64, 64))
    save("golden_small_64.npz",
         PathIntegrator(PathConfig(max_depth=4), spp=2,
                        band_rows=16).render(cam, scene))


def config_c():
    from pathtracer_tpu.scene.procedural import microfacet_scene
    cam, scene = microfacet_scene((64, 64))
    save("golden_microfacet_64.npz",
         PathIntegrator(PathConfig(max_depth=6), spp=2,
                        band_rows=16).render(cam, scene))


def config_d():
    from pathtracer_tpu.scene.procedural import envmap_disney_scene
    cam, scene = envmap_disney_scene((64, 64))
    save("golden_envmap_64.npz",
         PathIntegrator(PathConfig(max_depth=4), spp=2,
                        band_rows=16).render(cam, scene))


def sponza():
    from pathtracer_tpu.scene.gltf import load_gltf
    cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(48, 27))
    save("golden_sponza_48.npz",
         PathIntegrator(PathConfig(max_depth=1), spp=2).render(cam, sd))


ALL = {"configA": config_a, "configB": config_b, "configC": config_c,
       "configD": config_d, "sponza": sponza}

if __name__ == "__main__":
    picks = sys.argv[1:] or ["configB", "configC", "configD"]
    for p in picks:
        ALL[p]()
