"""Query catalog: every implemented operator exposed as a named query.

Each entry pairs a Spark implementation (`(spark, sf_dir) -> DataFrame`)
with an ANSI-SQL oracle string executable by DuckDB over the same
parquet tables. Column names and value determinism are contract: see
functions/exact.py for why aggregates over doubles go through integer
cents, and functions/hashing.py for the engine-portable hashes.

Driver-row curation: the round driver records CORRECTNESS rows for the
FIRST 50 registrations (insertion order). The registry is ordered
stalest-first from the repo's CORRECTNESS_r*.json history so the
driver always re-verifies the 50 least-recently-checked queries; the
remainder keep the IDENTICAL exact-DuckDB comparison via the in-repo
oracle-parity suite (tests/test_oracle_parity.py runs it over ALL
entries). See the rotation block below and COVERAGE.md "Catalog
totals".
"""

from __future__ import annotations

from python_stream_processing_framework_spark.queries.base import QUERY_REGISTRY, QuerySpec

# Importing the modules registers their queries.
from python_stream_processing_framework_spark.queries import (  # noqa: F401, E402
    relational,
    windows,
    dedup,
    similarity,
    text,
    advanced,
    sql_surface,
    extras,
    sampling,
    pq,
    packing,
    mixture,
    retrieval,
    bpe,
    lm,
    spans,
    semdedup,
    dsir,
    paragraphs,
    ccnet,
    html,
    urls,
    sketch,
    lines,
    graphq,
    funnelq,
    cdcq,
    setsimq,
    zorderq,
    robustq,
    unigram,
    probe,
    wordpiece,
    charclf,
)

# ---------------------------------------------------------------------------
# Driver-row rotation (r11: staleness-driven, supersedes the r10 frozen
# hand-curated OUTSIDE_DRIVER_CAP list).
#
# The round driver records CORRECTNESS rows for the FIRST ``DRIVER_CAP``
# registrations (insertion order).  Rather than hand-pick which queries
# ride outside the cap, the registry is now ordered by STALENESS: the
# queries whose last green external driver row is oldest come first, so
# every round the driver re-checks the 50 least-recently-verified
# queries.  With 88 catalog queries and 50 driver rows per round this
# bounds external-check staleness at ceil(88/50) = 2 rounds — strictly
# stronger than the r10 policy (which had let 24 queries go unchecked
# since r7 or earlier while shared machinery under them was refactored;
# see VERDICT.md r10 "Next round" #1).
#
# Invariants preserved from the frozen r10 policy:
#   * a query the external driver has NEVER checked sorts first
#     (last-green round 0), i.e. new queries always enter INSIDE the
#     cap — rotating a never-driver-checked query out is impossible by
#     construction;
#   * every query outside the cap keeps the IDENTICAL exact-DuckDB
#     value-hash comparison via tests/test_oracle_parity.py each run.
#
# Enforced by tests/test_oracle_parity.py::
# test_rotation_policy_no_blind_spots (never-checked ⇒ in-cap, and a
# max-staleness bound: no outside-cap query's last green row older
# than 3 rounds behind the newest CORRECTNESS record).
# ---------------------------------------------------------------------------

import glob as _glob
import json as _json
import os as _os

DRIVER_CAP = 50

#: Repo root (parent of the package dir).  When the package is
#: installed without the repo's CORRECTNESS_r*.json records, staleness
#: falls back to 0 for every query and the order degrades to
#: name-sorted — harmless, since the driver cap only matters in-repo.
_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def _green(row: dict) -> bool:
    """A green external driver row: no error, row counts matched, and
    the value hash matched when the driver computed one (rows-only
    checks carry hash_match=None)."""
    return (
        row.get("err") is None
        and bool(row.get("rows_match"))
        and row.get("hash_match") in (True, None)
    )


def last_green_rounds(root: str = _REPO_ROOT) -> dict[str, int]:
    """Map query name -> newest round whose CORRECTNESS_r*.json at
    ``root`` holds a green row for it.  Absent names were never
    externally checked."""
    last: dict[str, int] = {}
    for path in _glob.glob(_os.path.join(root, "CORRECTNESS_r*.json")):
        m = _os.path.basename(path)
        digits = "".join(ch for ch in m if ch.isdigit())
        if not digits:
            continue
        rnd = int(digits)
        try:
            with open(path) as f:
                rows = _json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _green(row):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _curate(registry: dict[str, QuerySpec]) -> tuple[str, ...]:
    """Reorder the registry stalest-first (never-checked, then oldest
    last-green round, name tie-break) so the driver's first
    ``DRIVER_CAP`` rows re-verify the least-recently-checked queries.
    Returns the names left outside the cap this round."""
    last = last_green_rounds()
    ordered_names = sorted(registry, key=lambda n: (last.get(n, 0), n))
    ordered = {n: registry[n] for n in ordered_names}
    registry.clear()
    registry.update(ordered)
    return tuple(ordered_names[DRIVER_CAP:])


#: Names outside the driver's 50-row cap THIS round — i.e. the
#: most-recently-externally-verified queries.  Recomputed from the
#: CORRECTNESS records at import time; kept as a module attribute for
#: the parity tests and COVERAGE.md tooling.
OUTSIDE_DRIVER_CAP: tuple[str, ...] = _curate(QUERY_REGISTRY)

__all__ = [
    "QUERY_REGISTRY",
    "QuerySpec",
    "OUTSIDE_DRIVER_CAP",
    "DRIVER_CAP",
    "last_green_rounds",
]
