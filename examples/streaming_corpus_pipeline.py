"""Composed STREAMING LLM-corpus pipeline — every facade stage chained
over topic handoffs, the live mirror of examples/llm_corpus_pipeline.py
and the reference's multi-stage topology posture
(/root/reference/examples/advanced_topology.py, chaos acceptance
examples/chaos_demo.py:126-137):

    docs ──dedupe_near(granularity="paragraph")──▶ docs-unique
      docs-unique ──tokenize(tokenizer="bpe", level="byte")──▶ docs-unique-tokens
        docs-unique-tokens ──pipeline().map(featurize)──▶ docs-feat
          docs-feat ──classify(linear probe)──▶ docs-feat-classes
      docs-unique ──pipeline().map(tag source)──▶ docs-clean
        docs-clean ──monitor_drift(edge_only=True)──▶ docs-clean-drift(+alerts)
        docs-clean ──classify_text(char-n-gram lang gate)──▶ docs-clean-textclass

Seven subscriptions, six topic boundaries. Every stage is exactly-once
on its own (idempotent per-batch_id sinks, write-once model tables,
checkpointed offsets); this example — and the crash test over it,
tests/test_streaming_corpus_chain.py — proves they stay exactly-once
when COMPOSED: a worker dying mid-chain leaves upstream boundaries
committed and downstream ones empty, and a restart over the same
broker drains the remainder without duplicating or losing a single
row at ANY boundary.

Models are trained once at registration (the write-once facade
discipline): a byte-level BPE merge table from a training corpus, a
linear probe over (n_words, n_pieces) token-budget features (verbose
vs terse docs — the curation gate shape), a drift reference
distribution from the same training corpus, and a trained
char-n-gram text classifier (operators/charclf.py, the fastText
lang-id shape) routing each cleaned document by vocabulary family —
the trained replacement for heuristic lang_id, running live in the
same chain.

Run: python examples/streaming_corpus_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)
UNIQ = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
        StructField("n_paras", LongType()),
        StructField("n_removed", LongType()),
    ]
)
TOKENS = StructType(
    [
        StructField("batch_seq", LongType()),
        StructField("doc_id", StringType()),
        StructField("n_words", LongType()),
        StructField("n_pieces", LongType()),
    ]
)
FEAT = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)
CLASSES = StructType(
    [
        StructField("batch_seq", LongType()),
        StructField("doc_id", StringType()),
        StructField("pred", LongType()),
        StructField("z_nano", LongType()),
    ]
)
CLEAN = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)
DRIFT = StructType(
    [
        StructField("batch_seq", LongType()),
        StructField("src", StringType()),
        StructField("n_tokens", LongType()),
        StructField("tv_ppm", LongType()),
    ]
)
TEXTCLASS = StructType(
    [
        StructField("batch_seq", LongType()),
        StructField("doc_id", StringType()),
        StructField("pred", StringType()),
        StructField("score_nano", LongType()),
    ]
)

#: paragraph-dedup knobs — the facade-test arithmetic: 40-token
#: paragraphs, a one-word edit is Jaccard 35/41 = 0.854 (near-dup at
#: 0.8); bands=8 x rows=2 makes band recall at that similarity
#: effectively certain under the deterministic md5 minhash.
DEDUP_KW = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.8)

#: spam's token vocabulary is fully disjoint from the reference, so
#: its TV is exactly 1_000_000 ppm; web batches share the reference
#: vocabulary and measure at most ~888k (a single short doc whose
#: tokens are a small slice of the reference support) — the threshold
#: sits between with ~50k margin on each side.
DRIFT_THRESHOLD_PPM = 950_000


def banner(edit: str | None = None) -> str:
    """The templated 40-token boilerplate paragraph (optionally with
    one word edited — a near-dup the paragraph index must shed)."""
    toks = [f"alpha{i}" for i in range(40)]
    if edit is not None:
        toks[20] = edit
    return " ".join(toks)


def content(prefix: str, n: int = 12) -> str:
    """A unique content paragraph drawn from the web vocabulary."""
    return " ".join(f"{prefix}{i}" for i in range(n))


def train_frames(spark):
    """(corpus_df, feature_df, lang_df) used to train the write-once
    models: the BPE vocabulary + drift reference come from
    ``corpus_df``; the probe trains on (n_words, n_pieces) features —
    class 0 = terse (few pieces per word), class 1 = verbose;
    ``lang_df`` carries (text, label) rows for the char-n-gram
    router (web vs spam vocabulary families)."""
    corpus = spark.createDataFrame(
        [
            (0, banner() + "\n" + content("beta")),
            (1, content("gamma") + "\n" + content("delta")),
            (2, content("beta") + " " + content("gamma")),
        ],
        "doc_id bigint, text string",
    )
    feats = spark.createDataFrame(
        [
            (0, 0, [12.0, 40.0]),
            (1, 0, [20.0, 70.0]),
            (2, 0, [8.0, 30.0]),
            (3, 1, [12.0, 130.0]),
            (4, 1, [20.0, 210.0]),
            (5, 1, [8.0, 95.0]),
        ],
        "vec_id bigint, label int, embedding array<float>",
    )
    lang = spark.createDataFrame(
        [
            (0, content("beta") + " " + content("gamma"), "web"),
            (1, banner() + " " + content("delta"), "web"),
            (2, " ".join(f"zz{i}" for i in range(30, 60)), "spam"),
            (3, " ".join(f"zz{i}" for i in range(60, 90)), "spam"),
        ],
        "doc_id bigint, text string, label string",
    )
    return corpus, feats, lang


def _nested():
    """The DSL map fns ship to PYTHON WORKERS via cloudpickle, which
    serializes module-level functions BY REFERENCE — and this example
    module is not importable on a worker. Nested functions pickle by
    VALUE (code + closure), so the glue stages are defined inside a
    factory; they must reference no module globals."""

    def featurize(ev: dict) -> dict:
        # token-budget row -> probe feature vector (executor-side
        # mapInPandas DSL; no driver loop)
        return {
            "doc_id": ev["doc_id"],
            "embedding": [float(ev["n_words"]), float(ev["n_pieces"])],
        }

    def tag_source(ev: dict) -> dict:
        # recover the feed source from the doc-id prefix
        # ('web/001' -> 'web') so drift monitors per-source
        # distributions downstream of the dedup boundary (which
        # forwards only the rebuilt (id, text, n_paras, n_removed))
        return {
            "source": str(ev["doc_id"]).split("/", 1)[0],
            "doc_id": ev["doc_id"],
            "text": ev["text"],
        }

    return featurize, tag_source


featurize, tag_source = _nested()


def register_stages(stream, *, feat_map=featurize) -> None:
    """Register the full six-stage topology on ``stream``. Model
    tables are trained from :func:`train_frames` the FIRST time and
    skipped on every later registration over the same broker (the
    write-once facade contract) — so a crashed app re-registers with
    the exact same models. ``feat_map`` lets a chaos test inject a
    crashing featurize worker."""
    from python_stream_processing_framework_spark.operators.bpe import bpe_train
    from python_stream_processing_framework_spark.operators.charclf import (
        charclf_train,
    )
    from python_stream_processing_framework_spark.operators.probe import (
        linear_probe_train,
    )

    spark = stream.spark
    corpus, feats, lang = train_frames(spark)
    vocab_path = str(stream.broker / "_indexes" / "stream-tokens")
    first_time = not os.path.exists(vocab_path)

    stream.dedupe_near("docs", DOCS, granularity="paragraph", **DEDUP_KW)
    stream.tokenize(
        "docs-unique",
        UNIQ,
        tokenizer="bpe",
        level="byte",
        vocab=bpe_train(corpus, "text", n_merges=8, level="byte")
        if first_time
        else None,
    )
    stream.pipeline("docs-unique-tokens", TOKENS).map(feat_map).sink(
        "docs-feat", output_schema=FEAT
    )
    stream.classify(
        "docs-feat",
        FEAT,
        weights=linear_probe_train(feats) if first_time else None,
    )
    stream.pipeline("docs-unique", CLEAN, group="clean").map(tag_source).sink(
        "docs-clean", output_schema=CLEAN
    )
    stream.monitor_drift(
        "docs-clean",
        CLEAN,
        reference=corpus.selectExpr("text") if first_time else None,
        threshold_ppm=DRIFT_THRESHOLD_PPM,
        hysteresis=1,
        edge_only=True,
    )
    stream.classify_text(
        "docs-clean",
        CLEAN,
        model=charclf_train(lang, "doc_id", "text", "label", n=3, n_buckets=512)
        if first_time
        else None,
        n=3,
        n_buckets=512,
    )


#: chain depth in topic hops (docs -> unique -> tokens -> feat ->
#: classes); one run_until_idle round drains one hop, so a full drain
#: of freshly emitted docs needs this many rounds.
CHAIN_DEPTH = 4


def main() -> None:
    from python_stream_processing_framework_spark.session import get_spark
    from python_stream_processing_framework_spark.streaming import Stream

    spark = get_spark("streaming-corpus-pipeline")
    root = tempfile.mkdtemp(prefix="stream-corpus-")
    stream = Stream(spark, os.path.join(root, "broker"))
    register_stages(stream)

    # wave 1: two web docs sharing the templated banner (the second
    # carries a one-word edit — a paragraph near-dup to shed)
    stream.emit(
        "docs",
        {"doc_id": "web/001", "text": banner() + "\n" + content("beta")},
        {"doc_id": "web/002", "text": banner("edited") + "\n" + content("gamma")},
    )
    stream.run_until_idle(rounds=CHAIN_DEPTH)

    # wave 2: one more banner variant (near-dups the ADMITTED wave-1
    # banner across batches) plus a spam doc with a disjoint
    # vocabulary — the drift edge the alert topic must page on once
    stream.emit(
        "docs",
        {"doc_id": "web/003", "text": banner("other") + "\n" + content("delta")},
        {"doc_id": "spam/001", "text": content("zz", 30)},
    )
    stream.run_until_idle(rounds=CHAIN_DEPTH)

    uniq = stream.read_topic("docs-unique", UNIQ)
    toks = stream.read_topic("docs-unique-tokens", TOKENS)
    classes = stream.read_topic("docs-feat-classes", CLASSES)
    drift = stream.read_topic("docs-clean-drift", DRIFT)
    alerts = stream.read_topic("docs-clean-drift-alerts", DRIFT)
    routed = stream.read_topic("docs-clean-textclass", TEXTCLASS)

    print("docs-unique (banner shed downstream of web/001):")
    for r in sorted(uniq.collect(), key=lambda r: r["doc_id"]):
        print(f"  {r['doc_id']}: n_paras={r['n_paras']} n_removed={r['n_removed']}")
    print("token meter rows:", toks.count(), " class rows:", classes.count())
    print("drift rows:")
    for r in sorted(drift.collect(), key=lambda r: (r["batch_seq"], r["src"])):
        print(f"  batch {r['batch_seq']} src={r['src']} tv_ppm={r['tv_ppm']}")
    print("alert edges (exactly one, for spam):")
    for r in alerts.collect():
        print(f"  src={r['src']} tv_ppm={r['tv_ppm']}")
    print("trained lang-gate routing (charclf, web vs spam):")
    for r in sorted(routed.collect(), key=lambda r: r["doc_id"]):
        print(f"  {r['doc_id']}: pred={r['pred']}")


if __name__ == "__main__":
    main()
