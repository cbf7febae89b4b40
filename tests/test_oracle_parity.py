"""Local mirror of the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle on the same parquet, compare
row count, column names, and order-insensitive values EXACTLY (no
tolerances — the engine's determinism contract makes that possible).
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_CORRECT, register_duck_views

from python_stream_processing_framework_spark.queries import QUERY_REGISTRY

ORACLE_QUERIES = sorted(n for n, s in QUERY_REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERY_REGISTRY.items() if not s.oracle)


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 17 significant digits: exact round-trip for float64.
        return repr(v)
    if hasattr(v, "__int__") and not isinstance(v, bool):
        try:
            return int(v)
        except (TypeError, ValueError):
            pass
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def _assert_driver_hashable_types(duck, name, oracle):
    """The external driver's value hash is physical-type-sensitive:
    a DuckDB HUGEINT/DECIMAL column hashes differently from Spark's
    int64/double even when every value is equal (r9's
    embedding_outliers red row — its list_sum over BIGINTs typed
    HUGEINT). _norm_cell's int() coercion makes the local mirror
    blind to exactly that class, so gate the oracle's output types
    here: any wide-integer/decimal column must be CAST in the SQL."""
    types = [str(t).upper() for t in duck.sql(oracle).types]
    bad = [
        (c, t)
        for c, t in zip(duck.sql(oracle).columns, types)
        if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")
    ]
    assert not bad, (
        f"{name}: oracle emits driver-unhashable column types {bad}; "
        "CAST them (AS BIGINT / AS DOUBLE) in the oracle SQL"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERY_REGISTRY[name]
    sdf = spec.fn(spark, SF_CORRECT)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    register_duck_views(duck, SF_CORRECT)
    _assert_driver_hashable_types(duck, name, spec.oracle)
    res = duck.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} != {len(d_rows)}"
    s_canon = _canon(s_rows, s_cols)
    d_canon = _canon(d_rows, d_cols)
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = QUERY_REGISTRY[name]
    sdf = spec.fn(spark, SF_CORRECT)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_driver_cap_curation():
    """Pin the registry curation contract: insertion order is the
    driver's CORRECTNESS selection order, ordered STALEST-FIRST from
    the repo's CORRECTNESS history (r11 rotation policy). The first
    DRIVER_CAP slots must be exactly the least-recently-verified
    queries, OUTSIDE_DRIVER_CAP exactly the tail, and every outside-cap
    query still carries an exact oracle (verified above)."""
    from python_stream_processing_framework_spark.queries import (
        DRIVER_CAP,
        OUTSIDE_DRIVER_CAP,
        last_green_rounds,
    )

    names = list(QUERY_REGISTRY)
    assert len(names[:DRIVER_CAP]) == DRIVER_CAP
    assert set(names[DRIVER_CAP:]) == set(OUTSIDE_DRIVER_CAP)
    last = last_green_rounds()
    expected = sorted(names, key=lambda n: (last.get(n, 0), n))
    assert names == expected, "registry must be ordered stalest-first"
    for name in OUTSIDE_DRIVER_CAP:
        assert QUERY_REGISTRY[name].oracle, f"{name} outside cap needs an oracle"


def test_rotation_policy_no_blind_spots():
    """Rotation policy (queries/__init__.py, r11 staleness-driven):

    1. A query the external driver has NEVER checked (no key in any
       CORRECTNESS_r*.json) must sit inside the driver's 50-row cap so
       it gets checked next round — prevents recreating the 9-query
       blind spot r9 closed.
    2. Max-staleness bound (r10 verdict #1): no query outside the cap
       may have its last GREEN external driver row more than 3 rounds
       behind the newest CORRECTNESS record — i.e. by next round no
       catalog query's last green check is older than 4 rounds. With
       88 queries and 50 slots, stalest-first ordering keeps the
       actual bound at ceil(88/50) = 2.
    """
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert files, "no CORRECTNESS_r*.json records found at repo root"
    from python_stream_processing_framework_spark.queries import (
        OUTSIDE_DRIVER_CAP,
        last_green_rounds,
    )

    last = last_green_rounds(root)
    newest_round = max(
        int("".join(ch for ch in os.path.basename(p) if ch.isdigit()))
        for p in files
    )
    never_checked = [n for n in OUTSIDE_DRIVER_CAP if n not in last]
    assert not never_checked, (
        f"outside-cap queries never checked by the external driver: "
        f"{never_checked}; new queries must enter inside the cap for "
        ">=1 round first (rotation policy, queries/__init__.py)"
    )
    too_stale = {
        n: last[n]
        for n in OUTSIDE_DRIVER_CAP
        if newest_round - last[n] > 3
    }
    assert not too_stale, (
        f"outside-cap queries with last green driver row >3 rounds "
        f"behind r{newest_round}: {too_stale}; stalest-first curation "
        "should have put them inside the cap"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs = entry_mod.queries()
    os = entry_mod.oracle_sql()
    assert set(os) <= set(qs)
    assert len(qs) >= 25
