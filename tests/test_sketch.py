"""Count-min sketch (operators/sketch.py): never-undercount
guarantee, exactness without collisions, forced-collision
overcounting, heavy-hitter ordering, bound helper."""

from __future__ import annotations

import pytest

from python_stream_processing_framework_spark.operators.sketch import (
    cm_build,
    cm_error_bound,
    cm_estimate,
    cm_heavy_hitters,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # token frequencies: a=6, b=3, c=2, d=1
    rows = [(1, "a a a b"), (2, "a b c"), (3, "a a b c d")]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _exact(spark):
    return {"a": 6, "b": 3, "c": 2, "d": 1}


def test_estimates_never_undercount(spark, corpus):
    sketch = cm_build(corpus, "text", depth=4, width=4096)
    cands = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("zzz",)], "token string"
    )
    est = {
        r["token"]: r["est"]
        for r in cm_estimate(cands, sketch, "token", depth=4, width=4096).collect()
    }
    for t, c in _exact(spark).items():
        assert est[t] >= c
    # wide sketch, 4 tokens: no collisions — estimates are exact
    assert est == {**_exact(spark), "zzz": 0}


def test_forced_collisions_overcount_only(spark, corpus):
    # width=1: every token lands in the same bucket per row, so every
    # estimate is the total token count — the worst case, but still
    # an OVERcount, never under
    sketch = cm_build(corpus, "text", depth=2, width=1)
    cands = spark.createDataFrame([("a",), ("d",)], "token string")
    est = {
        r["token"]: r["est"]
        for r in cm_estimate(cands, sketch, "token", depth=2, width=1).collect()
    }
    assert est["a"] == 12 and est["d"] == 12


def test_heavy_hitters_order_and_ties(spark, corpus):
    top = cm_heavy_hitters(corpus, "text", k=3, depth=4, width=4096).collect()
    assert [(r["token"], r["est"]) for r in top] == [
        ("a", 6), ("b", 3), ("c", 2)
    ]


def test_error_bound(spark):
    assert cm_error_bound(1000, 4096) == pytest.approx(
        2.718281828459045 * 1000 / 4096
    )


def test_partition_invariance(spark, corpus):
    a = [tuple(r) for r in cm_heavy_hitters(corpus, "text", k=4).collect()]
    b = [
        tuple(r)
        for r in cm_heavy_hitters(corpus.repartition(5), "text", k=4).collect()
    ]
    assert a == b


def test_streaming_cm_fold_matches_batch_sketch(spark, tmp_path):
    """The streaming form: a checkpointed keyed fold maintaining the
    sparse sketch across micro-batches must yield the SAME estimates
    as a batch cm_build over the union of the events."""
    import json

    from python_stream_processing_framework_spark.operators.sketch import (
        cm_fold,
        cm_state_estimate,
    )
    from python_stream_processing_framework_spark.streaming.state import (
        keyed_fold_stream,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    collected: list[dict] = []
    schema = "lang string, ts double, token string"

    def write_rows(name, rows):
        (src_dir / f"{name}.json").write_text(
            "\n".join(
                json.dumps({"lang": l, "ts": t, "token": tok})
                for l, t, tok in rows
            )
            + "\n"
        )

    def run_once():
        src = spark.readStream.schema(schema).json(str(src_dir))
        out = keyed_fold_stream(
            src, "lang", "ts", cm_fold("token", depth=3, width=16)
        )

        def sink(batch, _bid):
            collected.extend(r.asDict() for r in batch.collect())

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_rows("b1", [("en", 1.0, "a"), ("en", 2.0, "a"), ("de", 1.0, "x")])
    run_once()
    write_rows("b2", [("en", 3.0, "b"), ("en", 4.0, "a"), ("de", 2.0, "x")])
    run_once()

    states = {}
    for r in collected:  # later updates overwrite earlier ones
        states[r["lang"]] = json.loads(r["state_json"])

    # exact frequencies: en a=3 b=1; de x=2 — width 16, 3 tokens:
    # estimates from the live state equal the true counts here, and
    # ALWAYS equal what a batch sketch over the same events gives
    assert cm_state_estimate(states["en"], "a", depth=3, width=16) == 3
    assert cm_state_estimate(states["en"], "b", depth=3, width=16) == 1
    assert cm_state_estimate(states["en"], "zz", depth=3, width=16) in (0, 1, 3, 4)
    assert cm_state_estimate(states["de"], "x", depth=3, width=16) == 2

    from python_stream_processing_framework_spark.operators.sketch import (
        cm_build,
        cm_estimate,
    )

    en_docs = spark.createDataFrame(
        [(1, "a a"), (2, "b a")], "doc_id bigint, text string"
    )
    sketch = cm_build(en_docs, "text", depth=3, width=16)
    cands = spark.createDataFrame([("a",), ("b",)], "token string")
    batch_est = {
        r["token"]: r["est"]
        for r in cm_estimate(cands, sketch, "token", depth=3, width=16).collect()
    }
    assert batch_est["a"] == cm_state_estimate(states["en"], "a", depth=3, width=16)
    assert batch_est["b"] == cm_state_estimate(states["en"], "b", depth=3, width=16)
