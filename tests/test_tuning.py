"""Hardware-tuned launch geometry: tuned.json plumbing + auto_tune rules.

The measurement session banks a ledger (tools/tpu_session.py), auto_tune
folds it into tuned.json, and pathtracer_tpu.tuning serves the knobs to
the integrator. The knobs only change LAUNCH geometry (chunk count,
gather interleave, band rows) — never the math — so every setting must
produce the identical intersection result.
"""

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pathtracer_tpu import tuning
from pathtracer_tpu.integrator import (TracedScene, _main_closest,
                                       _traversal_knobs)
from pathtracer_tpu.scene.mitsuba import load_mitsuba
from tools.auto_tune import decide


@pytest.fixture(autouse=True)
def _fresh_tuning_cache():
    tuning.reload()
    yield
    tuning.reload()


@pytest.fixture(scope="module")
def cornell_scene():
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(48, 48))
    return cam, TracedScene.create(sd, use_bvh=True, use_pallas=False)


def _bank_trav(chunk1, chunk4, chunk8, il2=None, il4=None, c4i2=None):
    bank = {"platform": "axon"}
    for rs in ("bush", "cam "):
        bank[f"[trav] {rs} chunk1  closest"] = chunk1
        bank[f"[trav] {rs} chunk4  closest"] = chunk4
        bank[f"[trav] {rs} chunk8  closest"] = chunk8
        if il2 is not None:
            bank[f"[trav] {rs} il2     closest"] = il2
        if il4 is not None:
            bank[f"[trav] {rs} il4     closest"] = il4
        if c4i2 is not None:
            bank[f"[trav] {rs} chunk4i2closest"] = c4i2
    return bank


def test_decide_picks_winning_chunks():
    tuned, _ = decide(_bank_trav(chunk1=10.0, chunk4=8.0, chunk8=6.0))
    assert tuned["traversal_chunks"] == 8
    assert tuned["traversal_interleave"] == 1


def test_decide_keeps_default_within_margin():
    # 2% better than the incumbent: inside noise, no churn
    tuned, _ = decide(_bank_trav(chunk1=10.0, chunk4=8.0, chunk8=7.9))
    assert "traversal_chunks" not in tuned


def test_decide_picks_interleaved_candidate():
    tuned, _ = decide(_bank_trav(chunk1=10.0, chunk4=8.0, chunk8=7.8,
                                 c4i2=5.0))
    assert (tuned["traversal_chunks"], tuned["traversal_interleave"]) \
        == (4, 2)


def test_decide_band_rows():
    bank = {"platform": "axon", "cornell_band64_mrays": 90.0,
            "cornell_band128_mrays": 70.0, "cornell_band203_mrays": 60.0}
    tuned, _ = decide(bank)
    assert tuned["band_rows_dense"] == 64
    # default already best -> no knob
    bank2 = {"platform": "axon", "cornell_band64_mrays": 50.0,
             "cornell_band203_mrays": 60.0}
    tuned2, _ = decide(bank2)
    assert "band_rows_dense" not in tuned2


def test_decide_seg_wave_lanes():
    bank = {"platform": "axon", "sponza_wave65536_mrays": 5.0,
            "sponza_wave131072_mrays": 6.0, "sponza_wave262144_mrays": 7.0}
    tuned, _ = decide(bank)
    assert tuned["seg_wave_lanes"] == 262144
    # within margin of the default -> no churn
    bank["sponza_wave262144_mrays"] = 6.1
    tuned2, _ = decide(bank)
    assert "seg_wave_lanes" not in tuned2


def test_seg_wave_lanes_changes_launch_geometry_not_film(cornell_scene,
                                                         monkeypatch):
    """The segmented rays-per-launch knob must only re-band the wave."""
    import pathtracer_tpu.integrator as intg
    from pathtracer_tpu.core.camera import Camera  # noqa: F401
    from pathtracer_tpu.integrator import PathConfig, PathIntegrator
    cam, scene = cornell_scene
    monkeypatch.setattr(intg, "_WAVE_DEPTH_BUDGET", 1)
    monkeypatch.setattr(intg, "_SEG_MIN_ROWS", 1)  # force segmented
    f_ref = np.asarray(PathIntegrator(PathConfig(max_depth=2),
                                      spp=2).render(cam, scene))
    monkeypatch.setenv("PTPU_SEG_WAVE_LANES", "512")
    f_small = np.asarray(PathIntegrator(PathConfig(max_depth=2),
                                        spp=2).render(cam, scene))
    np.testing.assert_allclose(f_small, f_ref, rtol=2e-4, atol=2e-5)


def test_decide_refuses_cpu_smoke_bank():
    bank = _bank_trav(chunk1=1.0, chunk4=2.0, chunk8=3.0)
    bank["platform"] = "cpu"
    tuned, notes = decide(bank)
    assert tuned == {}
    assert any("CPU" in n for n in notes)


def test_get_env_overrides_file(tmp_path, monkeypatch):
    p = tmp_path / "tuned.json"
    p.write_text(json.dumps({"traversal_chunks": 8}))
    monkeypatch.setattr(tuning, "_PATH", str(p))
    tuning.reload()
    assert tuning.get("traversal_chunks", 4) == 8
    assert tuning.get("band_rows_dense", 203) == 203  # absent -> default
    monkeypatch.setenv("PTPU_TRAVERSAL_CHUNKS", "2")
    assert tuning.get("traversal_chunks", 4) == 2
    monkeypatch.setenv("PTPU_TRAVERSAL_CHUNKS", "junk")
    assert tuning.get("traversal_chunks", 4) == 8  # bad env -> file


def test_session_generates_measurements_from_candidate_table():
    """tools/tpu_session.py must derive its trav/band measurement names
    from auto_tune's tables (single source of truth — a rename in either
    file would otherwise silently disable tuning)."""
    src = open(os.path.join(os.path.dirname(__file__), "..", "tools",
                            "tpu_session.py")).read()
    assert "_TRAV_CANDIDATES" in src
    assert "_BAND_SWEEP" in src
    assert "cornell_band{br}_mrays" in src  # the key decide() reads back


def test_knobs_change_launch_geometry_not_results(monkeypatch):
    """Every (chunks, interleave) setting must return the identical
    closest-hit; interleave stays OFF for trees below the segmented
    threshold (fused-program compile-cost guard)."""
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(64, 64))
    scene = TracedScene.create(sd, use_bvh=True, use_pallas=False)
    assert scene.bw_rows is not None

    rng = np.random.default_rng(3)
    n = 16384
    o = jnp.asarray(np.tile(np.array([[0.0, 1.0, 2.0]], np.float32),
                            (n, 1)))
    dn = rng.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
    d = jnp.asarray(dn)
    t = jnp.full((n,), jnp.inf, jnp.float32)

    # cornell's tree is tiny: interleave must be gated off...
    monkeypatch.setenv("PTPU_TRAVERSAL_INTERLEAVE", "2")
    assert _traversal_knobs(scene)["interleave"] == 1
    # ...until the tree crosses the segmented threshold
    import pathtracer_tpu.integrator as intg
    monkeypatch.setattr(intg, "_SEG_MIN_ROWS", 1)
    assert _traversal_knobs(scene)["interleave"] == 2
    monkeypatch.delenv("PTPU_TRAVERSAL_INTERLEAVE")

    # jit with the combo as STATIC args: each setting traces (and reads
    # its env knobs) exactly once, and the executables take the jit
    # serialization path — eager-dispatch while_loop executables trip a
    # jaxlib cache-deserialization abort (see conftest cache note)
    @functools.partial(jax.jit, static_argnums=(4, 5))
    def closest(sc, o_, d_, t_, _chunks, _il):
        return _main_closest(sc, o_, d_, t_)

    ref = None
    for chunks, il in ((1, 1), (4, 1), (8, 1), (1, 2), (4, 2)):
        monkeypatch.setenv("PTPU_TRAVERSAL_CHUNKS", str(chunks))
        monkeypatch.setenv("PTPU_TRAVERSAL_INTERLEAVE", str(il))
        hit = closest(scene, o, d, t, chunks, il)
        if ref is None:
            ref = hit
            continue
        np.testing.assert_array_equal(np.asarray(hit["valid"]),
                                      np.asarray(ref["valid"]),
                                      err_msg=f"{chunks}/{il}")
        np.testing.assert_array_equal(np.asarray(hit["tri"]),
                                      np.asarray(ref["tri"]),
                                      err_msg=f"{chunks}/{il}")
        np.testing.assert_allclose(np.asarray(hit["t"]),
                                   np.asarray(ref["t"]), rtol=1e-6,
                                   err_msg=f"{chunks}/{il}")
