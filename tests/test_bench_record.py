"""bench.py's final stdout line must survive the driver's tail cut.

The round driver persists only the LAST 2,000 bytes of bench stdout
and parses the last line as JSON. A line longer than the cut is
truncated at its FRONT and parses to nothing — r5-r7 BENCH records
lost every wall time this way. These tests pin the compact-line
contract without starting Spark.
"""

from __future__ import annotations

import importlib.util
import json
import random

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_timings(n: int, seed: int = 1) -> dict:
    rng = random.Random(seed)
    return {f"query_with_a_realistic_name_{i:03d}": round(rng.uniform(0.05, 13), 3) for i in range(n)}


def test_tail_safe_line_fits_and_parses_after_cut(bench):
    timings = _fake_timings(82)
    total = round(sum(timings.values()), 3)
    line = bench._tail_safe_line(total, timings, "0.1", "32")
    assert len(line) <= 1900
    # simulate the driver: rich line first, compact line last, cut tail
    rich = json.dumps({"queries": timings, "spread": {k: 1.1 for k in timings}})
    tail = (rich + "\n" + line)[-2000:]
    rec = json.loads(tail.splitlines()[-1])
    assert rec["value"] == total
    assert rec["metric"] == "catalog_total_wall_seconds"
    # the slowest queries must be present by name
    slowest = sorted(timings, key=timings.get, reverse=True)[:20]
    for name in slowest:
        assert name in rec["queries"]
    # omitted bookkeeping reconciles with the total
    kept_sum = sum(rec["queries"].values())
    assert rec["queries_omitted"] == len(timings) - len(rec["queries"])
    assert kept_sum + rec["omitted_total_sec"] == pytest.approx(total, abs=0.5)


def test_tail_safe_line_small_catalog_keeps_everything(bench):
    timings = _fake_timings(10)
    line = bench._tail_safe_line(sum(timings.values()), timings, "0.01", "8")
    rec = json.loads(line)
    assert len(rec["queries"]) == 10
    assert rec["queries_omitted"] == 0
    assert rec["omitted_total_sec"] == 0


def test_tail_safe_line_huge_catalog_still_fits(bench):
    timings = _fake_timings(500)
    line = bench._tail_safe_line(sum(timings.values()), timings, "0.1", "32")
    assert len(line) <= 1900
    rec = json.loads(line)
    assert rec["queries_omitted"] == 500 - len(rec["queries"])
