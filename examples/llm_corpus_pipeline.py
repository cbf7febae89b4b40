"""End-to-end LLM training-data pipeline on the documents table:

    quality filter -> LM-perplexity audit -> CCNet head/middle/tail
    bands -> DSIR target selection -> PII scrub -> near-dup
    detection (MinHash+LSH) -> cluster collapse (connected
    components) -> deterministic train/val/test split ->
    decontaminate train against val/test (Jaccard + exact 13-gram)
    -> repeated-span masking (exact-substring dedup) -> exact-quota
    domain mixture -> token-window chunking -> sequence packing ->
    shard plan -> audit stats

Every step is the scale-path operator (bucketed equi-joins, map-only
hashing, two-phase quota selection, grouped greedy packing) — no
O(n^2) stage, no driver-side data. Run:
python examples/llm_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.dedup import (
    bloom_build,
    bloom_flags,
    decontaminate,
    dedup_corpus,
    minhash_lsh_pairs,
    ngram_decontaminate,
)
from python_stream_processing_framework_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)
from python_stream_processing_framework_spark.operators.common import (
    materialize,
    release_caches,
)
from python_stream_processing_framework_spark.operators.mixture import (
    assign_shards,
    domain_mixture,
    shard_stats,
)
from python_stream_processing_framework_spark.operators.classifier import (
    classifier_score,
    classifier_train,
)
from python_stream_processing_framework_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_scores,
    dsir_select,
    hashed_ngram_features,
)
from python_stream_processing_framework_spark.operators.lm import (
    perplexity_buckets,
    score_bigram_lm,
    train_bigram_lm,
)
from python_stream_processing_framework_spark.operators.sampling import hash_split
from python_stream_processing_framework_spark.operators.spans import (
    mask_repeated_spans,
)
from python_stream_processing_framework_spark.operators.text import (
    chunk_documents,
    gopher_quality_flags,
    normalize_text,
    pii_stats,
    quality_stats,
    redact_pii,
)
from python_stream_processing_framework_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("llm-corpus-pipeline")
    (docs,) = load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate: drop degenerate docs before paying for dedup
    quality = quality_stats(docs, "doc_id", "text")
    good = docs.join(
        quality.filter(
            (F.col("n_tokens") >= 5) & (F.col("quality_score") > 0.2)
        ).select("doc_id"),
        "doc_id",
    )
    n1 = good.count()

    # 1a. Gopher rule audit (REPORT, not gate — this synthetic corpus
    # is word soup, so the English stop-word rule rejects everything;
    # a real web corpus gates on gopher_pass). Per-rule counts are
    # what a corpus report shows.
    gopher = gopher_quality_flags(good, "doc_id", "text")
    rule_cols = [c for c in gopher.columns if c.startswith("ok_")]
    rej = gopher.agg(
        *[F.sum((~F.col(c)).cast("long")).alias(c) for c in rule_cols]
    ).collect()[0]
    worst = max(rule_cols, key=lambda c: rej[c])
    print(
        "gopher audit: rejections by rule "
        + ", ".join(f"{c[3:]}={rej[c]}" for c in rule_cols)
        + f" (dominant: {worst[3:]})"
    )

    # 1a'. classifier scoring (REPORT, like the Gopher audit): train
    # token weights on a weak label — here "above-median heuristic
    # quality", standing in for the seed set a real pipeline has —
    # and score every doc as the mean token posterior. A production
    # run gates on the score (keep the top of the distribution, the
    # DCLM/FineWeb-Edu move); on word soup the distribution is what
    # the report shows. Training's shuffle is vocabulary-bounded and
    # scoring broadcasts the weights, so this stage adds no
    # corpus-side exchange.
    med = quality.agg(
        F.expr("approx_percentile(quality_score, 0.5)")
    ).collect()[0][0]
    labeled = good.join(
        quality.select("doc_id", "quality_score"), "doc_id"
    ).withColumn("_y", F.col("quality_score") > med)
    scored = classifier_score(
        labeled,
        classifier_train(labeled, "doc_id", "text", "_y"),
        "doc_id",
        "text",
    )
    cstats = scored.agg(
        F.min("score_micro"), F.avg("score_micro"), F.max("score_micro")
    ).collect()[0]
    print(
        f"classifier audit: score_micro min {cstats[0]} "
        f"mean {cstats[1]:.0f} max {cstats[2]} (weak label: "
        f"quality_score > {med:.3f})"
    )

    # 1a''. LM-perplexity audit (REPORT, the CCNet filter's scorer):
    # train an add-k bigram LM on the quality-passing corpus and
    # score every doc's mean token log-prob. A production pipeline
    # trains on a TRUSTED reference corpus and gates or buckets on
    # the score; on word soup the distribution is the report. One
    # training scan + one scoring scan, count tables vocab-bounded.
    bigrams, contexts, vsz = train_bigram_lm(good, "doc_id", "text")
    lm_scores = score_bigram_lm(
        good, bigrams, contexts, vsz, "doc_id", "text"
    )
    lstats = lm_scores.agg(
        F.min("avg_lp"), F.avg("avg_lp"), F.max("avg_lp")
    ).collect()[0]
    print(
        f"lm audit: vocab {vsz}, avg_lp min {lstats[0]:.3f} "
        f"mean {lstats[1]:.3f} max {lstats[2]:.3f} "
        "(gate: keep avg_lp above a trusted-corpus floor)"
    )

    # 1a'''. CCNet head/middle/tail: per-language equal-mass
    # perplexity bands over the LM scores (exact order-statistic
    # cutoffs on the score histogram — never a per-language global
    # sort). A production pipeline keeps head+middle or reweights by
    # band; the per-(lang, bucket) counts are the report.
    bands = perplexity_buckets(
        lm_scores.filter(F.col("n_tokens") >= 1).join(
            good.select("doc_id", "lang"), "doc_id"
        ),
        "lang",
        "avg_lp",
    )
    band_counts = {
        (r["lang"], r["bucket"]): r["n"]
        for r in bands.groupBy("lang", "bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    heads = sum(v for (_, b), v in band_counts.items() if b == "head")
    tails = sum(v for (_, b), v in band_counts.items() if b == "tail")
    print(f"ccnet bands: {heads} head / {tails} tail across "
          f"{len({k for k, _ in band_counts})} languages")

    # 1a''''. DSIR target selection (REPORT): score how much every
    # non-English doc resembles the English subcorpus under hashed
    # unigram+bigram bucket models, then Gumbel-top-k select — the
    # published recipe for mining target-like data from a raw pool.
    # Model/ratio tables are <= n_buckets rows (broadcast by
    # construction); selection is a TakeOrdered, no global sort.
    target = good.filter(F.col("lang") == "en")
    pool = good.filter(F.col("lang") != "en")
    tf = hashed_ngram_features(target, "doc_id", "text")
    rf = hashed_ngram_features(pool, "doc_id", "text")
    ratios, unseen = dsir_log_ratios(tf, rf)
    dsir_scored = dsir_scores(pool, ratios, unseen, "doc_id", "text")
    picked = dsir_select(dsir_scored, "doc_id", n=25, seed="pipeline")
    wstats = picked.agg(F.min("log_weight"), F.max("log_weight")).collect()[0]
    print(
        f"dsir: selected 25 of {pool.count()} pool docs resembling "
        f"the en target (log-weight range {wstats[0]:.3f} "
        f"to {wstats[1]:.3f})"
    )

    # 1b. PII scrub BEFORE dedup: redaction tokens normalize spans
    # that would otherwise make near-identical docs differ (two copies
    # of a page with different tracking emails dedup after scrubbing,
    # not before). Map-only regex pass; the counts are the audit.
    # 1b-pre. unicode-normalize FIRST: byte-different renderings of
    # the same content (ligatures, full-width forms, combining
    # accents, zero-width chars) must collapse to one canonical form
    # or they defeat both exact and MinHash dedup below — and NFKC
    # folds full-width digits, so the PII regexes that follow match
    # more. Order is also load-bearing mechanically: the UDF's input
    # must be a plain column (see normalize_text's composition
    # constraint), so it runs before redact_pii's lambda folds.
    good = normalize_text(good, "text")
    n_pii = (
        pii_stats(good, "doc_id", "text")
        .agg(F.sum("n_pii").alias("s"))
        .collect()[0]["s"]
    )
    good = redact_pii(good, "text")

    # 2-3. near-dup pairs -> one canonical doc per cluster
    # star expansion: linearly many (canonical, member) edges instead
    # of O(c^2) intra-cluster pairs — the right input for dedup_corpus
    # at real duplicate mass (see dedup_corpus docstring)
    pairs = minhash_lsh_pairs(
        good, "doc_id", "text", threshold=0.5, expand="star"
    )
    deduped = dedup_corpus(good, pairs, "doc_id")
    n2 = deduped.count()

    # 4. leak-proof split (membership is a content hash, not a coin flip)
    split = hash_split(
        deduped, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )

    # 5. evaluation hygiene: drop train docs that near-duplicate
    # anything in val/test (the held-out data must stay unseen)
    train_docs = split.filter(F.col("split") == "train").select(
        "doc_id", "text", "lang"
    )
    heldout = split.filter(F.col("split") != "train").select("doc_id", "text")
    # STAGE BOUNDARY: the mixture below makes two passes over its
    # input (bucket histogram + selection); materialize the clean
    # train set so neither pass recomputes dedup + decontamination.
    # (A production pipeline writes each stage's output to storage.)
    # Both decontamination rules run: Jaccard for near-copies of
    # held-out docs, exact 13-gram for benchmark strings embedded in
    # otherwise-unrelated pages (whole-doc Jaccard stays ~0 there).
    clean_train = materialize(
        ngram_decontaminate(
            decontaminate(train_docs, heldout, threshold=0.5), heldout
        )
    )
    n3 = clean_train.count()

    # 5a'. bloom prefilter audit: at FULL corpus scale the broadcast
    # gram join above is the bottleneck — bloom_flags tests the same
    # 13-gram universe against a 16 KiB bitmask map-side (zero
    # exchanges, no false negatives), so production runs
    # bloom-prefilter first and the exact join only on the flagged
    # slice. Here we run it as an audit: flagged count vs the exact
    # rule's drop count bounds the false-positive mass.
    bloom_flagged = (
        bloom_flags(train_docs, bloom_build(heldout, "text"), "doc_id", "text")
        .filter(F.col("bloom_flagged"))
        .count()
    )

    # 5b. exact-substring dedup WITHIN train (Lee et al.): delete
    # 13-token spans occurring >= 2 times across the training set —
    # boilerplate paragraphs that survive whole-doc near-dup because
    # their host pages differ. Runs after decontamination (masking
    # first would change the grams the decontamination rules hash)
    # and before mixture (quota counts should reflect real content).
    masked = mask_repeated_spans(
        clean_train, "doc_id", "text", n=13, min_count=2
    )
    n_span_tokens = masked.agg(F.sum("n_removed")).collect()[0][0]
    clean_train = clean_train.drop("text").join(
        masked.filter(F.col("n_removed") < F.col("n_tokens")).select(
            "doc_id", "text"
        ),
        "doc_id",
    )
    n3b = clean_train.count()
    print(
        f"span masking: {n_span_tokens} repeated-span tokens deleted, "
        f"{n3 - n3b} all-boilerplate docs dropped"
    )

    # 6. hit the target language mixture with EXACT per-stratum quotas
    # (overweight en; stratified_sample would only give expected
    # fractions — a mixture spec wants exact counts)
    mixed = domain_mixture(
        clean_train,
        "lang",
        {"en": 0.4, "zh": 0.15, "es": 0.15, "de": 0.15, "fr": 0.15},
        "doc_id",
        seed="mix",
    )
    n4 = mixed.count()

    # 7. chunk docs longer than the per-chunk budget, then pack chunks
    # into 512-token training sequences — chunking first means packing
    # can never meet an oversized document (n_oversized must be 0)
    chunks = chunk_documents(
        mixed, "doc_id", "text", chunk_tokens=64, overlap=0
    )
    n5 = chunks.count()
    train = chunks.select(
        F.concat_ws(":", "doc_id", "chunk_id").alias("doc_id"),
        F.col("n_chunk_tokens").alias("n_tokens"),
    )
    packed = materialize(pack_sequences(train, max_tokens=512, num_groups=16))
    audit = packing_stats(packed, max_tokens=512).collect()[0]

    # 8. shard the packed sequences for training I/O; keying the shard
    # hash on the sequence identity keeps each sequence whole within
    # one shard while balancing across all sequences
    seqs = packed.withColumn(
        "seq_key", F.concat_ws(":", "pack_group", "seq_idx")
    )
    shards = shard_stats(
        assign_shards(seqs, "seq_key", 8, seed="shard"),
        size_col="n_tokens",
    ).collect()

    print(
        f"corpus: {n0} docs -> {n1} after quality "
        f"({n_pii} PII spans redacted) -> {n2} after dedup; "
        f"train {train_docs.count()} -> {n3} after decontamination "
        f"(bloom prefilter flags {bloom_flagged}) -> {n4} after mixture"
    )
    print(
        f"train packing: {n4} docs -> {n5} chunks -> "
        f"{audit['n_sequences']} sequences, mean fill "
        f"{audit['mean_fill']:.1%}, oversized {audit['n_oversized']}"
    )
    assert audit["n_oversized"] == 0  # chunking guarantees this
    sizes = sorted(r["total_size"] for r in shards)
    print(f"shards: {len(shards)}, token-size min {sizes[0]} max {sizes[-1]}")
    assert audit["n_overfull_bugs"] == 0

    # cache hygiene: the dedup/decontamination operators pinned
    # signature caches for their fan-out subplans; reclaim them now
    # that every downstream action has run. (A production pipeline
    # would write each stage's output and release between stages —
    # releasing earlier here would force lineage recompute, because
    # the counts above re-walk the same lazy plans.)
    release_caches()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
