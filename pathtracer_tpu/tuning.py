"""Hardware-tuned integrator defaults.

The TPU measurement session (tools/tpu_session.py) banks a ledger of
traversal/band variants; tools/auto_tune.py turns that ledger into
``tuned.json`` at the repo root. This module is the read side: knobs the
integrator consults at trace time, each overridable via ``PTPU_<KEY>``
environment variables (for A/B scripts) and falling back to the built-in
default when neither source has a value.

The reference has no analogue — its only tuning surface is rayon thread
count; here launch geometry (band rows, traversal chunk count, gather
interleave) is the per-hardware performance surface, and the recovery
pipeline must be able to apply fresh measurements unattended.
"""

from __future__ import annotations

import functools
import json
import os

_PATH = os.environ.get(
    "PTPU_TUNED_JSON",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tuned.json"))


@functools.lru_cache(maxsize=None)
def _load() -> dict:
    try:
        with open(_PATH) as f:
            d = json.load(f)
        return d if isinstance(d, dict) else {}
    except Exception:  # noqa: BLE001 — absent/corrupt file = no tuning
        return {}


def get(key: str, default: int) -> int:
    """Integer knob: PTPU_<KEY> env > tuned.json > default."""
    env = os.environ.get("PTPU_" + key.upper())
    if env is not None:
        try:
            return int(env)
        except ValueError:
            pass
    v = _load().get(key, default)
    try:
        return int(v)
    except (TypeError, ValueError):
        return default


def get_str(key: str, default: str) -> str:
    """String knob: PTPU_<KEY> env > tuned.json > default."""
    env = os.environ.get("PTPU_" + key.upper())
    if env is not None:
        return env
    v = _load().get(key, default)
    return v if isinstance(v, str) else default


def reload() -> None:
    """Drop the cached tuned.json (tests / after auto_tune writes)."""
    _load.cache_clear()
