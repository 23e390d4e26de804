"""Turn the banked TPU measurement ledger into tuned.json.

Reads TPU_SESSION.json (written incrementally by tools/tpu_session.py on
hardware), picks the winning launch geometry per knob, and writes
tuned.json at the repo root — which pathtracer_tpu.tuning serves to the
integrator. Runs as the final stage of the one-attach session so the
recovery pipeline's bench.py measures TUNED defaults unattended
(VERDICT r3 item 2: "the settings that produced them committed as
defaults" — the driver commits tuned.json at round end).

Pure stdlib — safe to run anywhere, no jax import.

Usage: python tools/auto_tune.py [--dry-run]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BANK = os.path.join(_ROOT, "TPU_SESSION.json")
_OUT = os.path.join(_ROOT, "tuned.json")

# a knob only changes when the winner beats the incumbent by this margin
# (3-rep timings jitter a few percent; don't churn defaults on noise)
_MARGIN = 0.03

# the cornell band-height sweep (tpu_session "cband" stage measures these;
# decide() picks the winner) — 203 is the computed default at 640x480
_BAND_SWEEP = (32, 64, 128, 203)

# segmented rays-per-launch sweep (tpu_session "eband" stage, sponza
# 1080p e2e) — 131072 is the built-in default; per-bounce programs have
# no fault envelope so larger launches are safe by construction
_WAVE_SWEEP = (65536, 131072, 262144)

# (traversal_chunks, traversal_interleave) candidates -> the [trav] ledger
# key suffix that measured them. tools/tpu_session.py GENERATES its trav
# measurements from this dict (same entry point the integrator uses), so
# the two files cannot drift apart.
_TRAV_CANDIDATES = {
    (1, 1): "chunk1  closest",
    (4, 1): "chunk4  closest",
    (8, 1): "chunk8  closest",
    (1, 2): "il2     closest",
    (1, 4): "il4     closest",
    (4, 2): "chunk4i2closest",
    (8, 2): "chunk8i2closest",
}
_TRAV_DEFAULT = (4, 1)
_RAY_SETS = ("bush", "cam ")


def _trav_total(bank: dict, suffix: str) -> float | None:
    """Summed ms over ray sets; None unless every ray set was measured."""
    total = 0.0
    for rs in _RAY_SETS:
        v = bank.get(f"[trav] {rs} {suffix}")
        if not isinstance(v, (int, float)) or v <= 0:
            return None
        total += float(v)
    return total


def decide(bank: dict) -> tuple[dict, list[str]]:
    """Ledger -> ({tuned knobs}, [human-readable decisions])."""
    tuned: dict = {}
    notes: list[str] = []
    if bank.get("platform") == "cpu":
        return {}, ["bank is a CPU smoke run; refusing to tune from it"]

    # --- traversal chunks/interleave (Sponza-class trees)
    totals = {cand: _trav_total(bank, sfx)
              for cand, sfx in _TRAV_CANDIDATES.items()}
    measured = {c: t for c, t in totals.items() if t is not None}
    if measured:
        best = min(measured, key=measured.get)
        incumbent = measured.get(_TRAV_DEFAULT)
        if best != _TRAV_DEFAULT and incumbent is not None \
                and measured[best] < (1.0 - _MARGIN) * incumbent:
            tuned["traversal_chunks"], tuned["traversal_interleave"] = best
            notes.append(
                f"traversal: chunks={best[0]} interleave={best[1]} "
                f"({measured[best]:.1f} ms vs default {incumbent:.1f} ms)")
        else:
            notes.append(
                f"traversal: keep default chunks=4 interleave=1 "
                f"(best measured {best} at {measured[best]:.1f} ms)")

    # --- dense-scene band rows (cornell cband sweep; higher Mrays/s wins)
    bands = {br: bank.get(f"cornell_band{br}_mrays")
             for br in _BAND_SWEEP}
    bands = {br: float(v) for br, v in bands.items()
             if isinstance(v, (int, float)) and v > 0}
    if len(bands) >= 2 and 203 in bands:
        best_br = max(bands, key=bands.get)
        if best_br != 203 and bands[best_br] > (1.0 + _MARGIN) * bands[203]:
            tuned["band_rows_dense"] = best_br
            notes.append(f"band_rows_dense={best_br} "
                         f"({bands[best_br]:.1f} vs {bands[203]:.1f} Mrays/s "
                         "at the default 203)")
        else:
            notes.append(f"band: keep computed default "
                         f"(best sweep {best_br} rows at "
                         f"{bands[max(bands, key=bands.get)]:.1f} Mrays/s)")

    # --- segmented rays-per-launch (sponza 1080p eband sweep)
    waves = {wl: bank.get(f"sponza_wave{wl}_mrays") for wl in _WAVE_SWEEP}
    waves = {wl: float(v) for wl, v in waves.items()
             if isinstance(v, (int, float)) and v > 0}
    if len(waves) >= 2 and 131072 in waves:
        best_wl = max(waves, key=waves.get)
        if best_wl != 131072 and waves[best_wl] > (1.0 + _MARGIN) * waves[131072]:
            tuned["seg_wave_lanes"] = best_wl
            notes.append(f"seg_wave_lanes={best_wl} "
                         f"({waves[best_wl]:.2f} vs {waves[131072]:.2f} "
                         "Mrays/s at the default 131072)")
        else:
            notes.append(f"seg wave: keep default 131072 (best sweep "
                         f"{best_wl} at {waves[best_wl]:.2f} Mrays/s)")
    return tuned, notes


def main(dry_run: bool = False) -> dict:
    try:
        with open(_BANK) as f:
            bank = json.load(f)
    except Exception:  # noqa: BLE001
        print("[auto_tune] no TPU_SESSION.json ledger; nothing to tune",
              flush=True)
        return {}
    tuned, notes = decide(bank)
    for n in notes:
        print(f"[auto_tune] {n}", flush=True)
    if not tuned:
        print("[auto_tune] no knob beat its default; tuned.json unchanged",
              flush=True)
        return {}
    tuned["decided_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    tuned["decided_from"] = {
        "bank_updated_at": bank.get("updated_at"),
        "platform": bank.get("platform", "unknown"),
    }
    if dry_run:
        print(f"[auto_tune] dry run: {json.dumps(tuned)}", flush=True)
        return tuned
    with open(_OUT, "w") as f:
        json.dump(tuned, f, indent=1)
    print(f"[auto_tune] wrote {_OUT}: {json.dumps(tuned)}", flush=True)
    return tuned


if __name__ == "__main__":
    main(dry_run="--dry-run" in sys.argv)
