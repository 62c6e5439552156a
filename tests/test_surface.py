"""Mechanical surface guard: every queries() entry is verifiable.

Mirrors scripts/check_surface.py into the default pytest run so the
invariant that every declared query has an oracle (or a reasoned
rows-only allowlist entry) — plus rotation-schedule integrity — fails
the suite the moment it is broken, instead of surfacing one driver
round later.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "check_surface", Path(__file__).resolve().parents[1] / "scripts" / "check_surface.py"
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def test_surface_invariants():
    assert _mod.check_surface() == []
