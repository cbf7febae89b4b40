"""Deduplication queries with exact DuckDB oracles.

The Spark implementations live in operators/dedup.py; the oracles
mirror the same deterministic md5-based algorithms in DuckDB SQL
(lambdas + list functions), so even MinHash/SimHash results compare
exactly — no tolerance, no rows-only fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    tokens_expr,
)
from python_stream_processing_framework_spark.queries.base import query

# Shared DuckDB fragments mirroring operators/dedup.py expressions.
_TOKS = "string_split(trim(lower(text)), ' ')"
_SHINGLES3 = (
    "list_distinct(list_transform(range(1, len(toks) - 1),"
    " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)
_SHINGLES2 = (
    "list_distinct(list_transform(range(1, len(toks)),"
    " i -> toks[i] || ' ' || toks[i+1]))"
)
_SIMHASH_FP = """
  CAST(list_sum(list_transform(range(0, 60), b ->
    CASE WHEN list_sum(list_transform(hs, h ->
           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
    AS BIGINT)
"""


@query(
    "dedup_exact",
    """
    SELECT event_id, user_id, event_type, value, canonical_event_id FROM (
      SELECT event_id, user_id, event_type, value,
             min(event_id) OVER (PARTITION BY user_id, event_type, value)
               AS canonical_event_id
      FROM events) t
    WHERE event_id != canonical_event_id
    """,
    doc="Exact dedup: canonical-id per duplicate key group (hash-groupBy "
    "shape; reference dedups by event_id token, pspf/connectors/base.py:32-78).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    deduped = exact_dedup(events, ["user_id", "event_type", "value"], "event_id")
    return deduped.filter(F.col("is_dup")).select(
        "event_id", "user_id", "event_type", "value", "canonical_event_id"
    )


@query(
    "dedup_minhash_lsh",
    f"""
    WITH d AS (
      SELECT doc_id, {_SHINGLES3} AS sh
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) t
      WHERE len(toks) >= 3),
    sigs AS (
      SELECT doc_id, sh,
             list_transform(range(0, 16), s ->
               list_min(list_transform(sh, x ->
                 md5(x || '#' || CAST(s AS VARCHAR))))) AS sig
      FROM d),
    banded AS (
      SELECT doc_id, j,
             array_to_string(sig[j*4+1 : j*4+4], '') AS band_val
      FROM sigs, range(0, 4) t(j)),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM banded x JOIN banded y
        ON x.j = y.j AND x.band_val = y.band_val AND x.doc_id < y.doc_id),
    verified AS (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
             CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                  AS BIGINT) AS n_union
      FROM cand JOIN sigs a ON a.doc_id = doc_a
                JOIN sigs b ON b.doc_id = doc_b)
    SELECT doc_a, doc_b, n_common, n_union,
           CAST(n_common AS DOUBLE)/n_union AS jaccard
    FROM verified
    WHERE CAST(n_common AS DOUBLE)/n_union >= 0.5
    """,
    doc="MinHash (16 hashes) + LSH (4 bands x 4 rows) + exact-Jaccard "
    "verify at threshold 0.5 over 3-word shingles.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        documents, "doc_id", "text", num_hashes=16, bands=4, shingle_k=3, threshold=0.5
    )


@query(
    "simhash_pairs",
    f"""
    WITH f AS (
      SELECT doc_id, {_SIMHASH_FP} AS fingerprint
      FROM (SELECT doc_id,
                   list_transform(list_distinct({_TOKS}), t ->
                     CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hs
            FROM documents
            WHERE len({_TOKS}) >= 1) t)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS BIGINT)
             AS hamming
    FROM f a JOIN f b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
    """,
    doc="SimHash near-dup pairs, Hamming <= 3. Spark side generates "
    "candidates by 4-band bit-slicing (pigeonhole-complete for d<=3); "
    "oracle verifies with the quadratic reference computation.",
)
def simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return simhash_pairs(documents, "doc_id", "text", bands=4, max_hamming=3)


@query(
    "ngram_jaccard_pairs",
    f"""
    WITH d AS (
      SELECT doc_id, {_SHINGLES2} AS sh
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) t
      WHERE len(toks) >= 2),
    inv AS (SELECT doc_id, unnest(sh) AS sh FROM d),
    sz AS (SELECT doc_id, len(sh) AS n FROM d),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(x.n + y.n - n_common AS BIGINT) AS n_union,
           CAST(n_common AS DOUBLE)/(x.n + y.n - n_common) AS jaccard
    FROM common JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE)/(x.n + y.n - n_common) >= 0.8
    """,
    doc="Exact word-bigram Jaccard >= 0.8 via inverted-index self-join.",
)
def ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(documents, "doc_id", "text", shingle_k=2, threshold=0.8)


# Shared CTE chain: minhash near-dup pairs (threshold 0.5) -> undirected
# edges -> recursive min-label reachability -> per-node component id.
# Mirrors operators/graph.connected_components over minhash_lsh_pairs.
_COMPONENT_CTES = f"""
    d AS (
      SELECT doc_id, {_SHINGLES3} AS sh
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) t
      WHERE len(toks) >= 3),
    sigs AS (
      SELECT doc_id, sh,
             list_transform(range(0, 16), s ->
               list_min(list_transform(sh, x ->
                 md5(x || '#' || CAST(s AS VARCHAR))))) AS sig
      FROM d),
    banded AS (
      SELECT doc_id, j,
             array_to_string(sig[j*4+1 : j*4+4], '') AS band_val
      FROM sigs, range(0, 4) t(j)),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM banded x JOIN banded y
        ON x.j = y.j AND x.band_val = y.band_val AND x.doc_id < y.doc_id),
    pairs AS (
      SELECT doc_a, doc_b
      FROM cand JOIN sigs a ON a.doc_id = doc_a
                JOIN sigs b ON b.doc_id = doc_b
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
            >= 0.5),
    edges AS (
      SELECT doc_a AS s, doc_b AS dd FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, lab) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.dd, r.lab FROM reach r JOIN edges e ON e.s = r.node),
    comp AS (
      SELECT node AS doc_id, MIN(lab) AS component
      FROM reach GROUP BY node)
"""


@query(
    "dedup_components",
    f"""
    WITH RECURSIVE {_COMPONENT_CTES}
    SELECT doc_id, component FROM comp
    """,
    doc="Near-dup clusters: connected components (min-label propagation, "
    "operators/graph.py) over MinHash-LSH pairs at Jaccard>=0.5. The "
    "pairs->clusters step a dedup pipeline needs so transitive near-dups "
    "(A~B, B~C) collapse to one canonical doc; oracle is a DuckDB "
    "recursive-CTE reachability over the same pairs. Spark side feeds "
    "components the expand='star' spanning form (exact dups collapse "
    "to rep+copy edges) — identical component labels, linear edge "
    "count under duplicate mass.",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.graph import (
        connected_components,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        documents,
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        shingle_k=3,
        threshold=0.5,
        expand="star",
    )
    cc = connected_components(pairs, "doc_a", "doc_b")
    return cc.select(F.col("node").alias("doc_id"), "component")


# dedup_cluster_stats (per-cluster yield report) was consolidated into
# dedup_components: the row-level component labels are the stricter
# check of the same minhash->LSH->connected-components pipeline, and
# the registry is capped at 50 driver-verified entries.


def _sig_ctes(prefix: str, src: str) -> str:
    """MinHash signature + banding CTEs over source CTE ``src``
    (columns doc_id, text) — the same 16-hash/4-band/3-shingle family
    as the self-join oracle, parameterized so the corpus and held-out
    sides of the decontamination join share one definition (mirrors
    operators/dedup.band_vals_expr being shared Spark-side). The
    oracle bands on the raw md5-slice concat while Spark bands on its
    xxhash64 (r9 bytes discipline) — identical equality classes up to
    xxhash collisions, which only ADD Spark-side candidates that the
    exact-Jaccard filter both engines apply then rejects, so the
    COMPARED final rows are unaffected."""
    return f"""
    {prefix}d AS (
      SELECT doc_id, {_SHINGLES3} AS sh
      FROM (SELECT doc_id, {_TOKS} AS toks FROM {src}) t
      WHERE len(toks) >= 3),
    {prefix}sig AS (
      SELECT doc_id, sh,
             list_transform(range(0, 16), s ->
               list_min(list_transform(sh, x ->
                 md5(x || '#' || CAST(s AS VARCHAR))))) AS sig
      FROM {prefix}d),
    {prefix}band AS (
      SELECT doc_id, j,
             array_to_string(sig[j*4+1 : j*4+4], '') AS band_val
      FROM {prefix}sig, range(0, 4) t(j))"""


_JACC = (
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))"
)


@query(
    "corpus_decontaminate",
    f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, text,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split#'), 1, 15))::BIGINT
               % 20 AS bucket
      FROM documents),
    corpus AS (SELECT doc_id, text FROM base WHERE bucket != 0),
    heldout AS (SELECT doc_id, text FROM base WHERE bucket = 0),
    {_sig_ctes('c', 'corpus')},
    {_sig_ctes('h', 'heldout')},
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM cband x JOIN cband y
        ON x.j = y.j AND x.band_val = y.band_val AND x.doc_id < y.doc_id),
    pairs AS (
      SELECT doc_a, doc_b
      FROM cand JOIN csig a ON a.doc_id = doc_a
                JOIN csig b ON b.doc_id = doc_b
      WHERE {_JACC} >= 0.5),
    edges AS (
      SELECT doc_a AS s, doc_b AS dd FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, lab) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.dd, r.lab FROM reach r JOIN edges e ON e.s = r.node),
    losers AS (
      SELECT node AS doc_id FROM reach GROUP BY node
      HAVING node != MIN(lab)),
    xcand AS (
      SELECT DISTINCT x.doc_id AS ca, y.doc_id AS hb
      FROM cband x JOIN hband y ON x.j = y.j AND x.band_val = y.band_val),
    contaminated AS (
      SELECT DISTINCT ca AS doc_id
      FROM xcand JOIN csig a ON a.doc_id = ca
                 JOIN hsig b ON b.doc_id = hb
      WHERE {_JACC} >= 0.5)
    SELECT doc_id FROM corpus
    WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
    doc="The composed corpus-assembly gate (the flow of examples/"
    "llm_corpus_pipeline.py, driver-verified): hash-split documents "
    "95/5 into corpus and held-out, collapse near-dup clusters to "
    "their min-id canonical doc (MinHash-LSH pairs at Jaccard>=0.5 -> "
    "connected components), then drop surviving docs that "
    "near-duplicate any held-out doc (cross-corpus LSH join -> "
    "anti-join, the test-set decontamination shape). Oracle mirrors "
    "the banding SQL of dedup_minhash_lsh, the recursive-CTE "
    "components of dedup_components, and NOT-IN anti-joins.",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.functions.hashing import hash60
    from python_stream_processing_framework_spark.operators.dedup import (
        decontaminate,
        dedup_corpus,
        minhash_signatures,
    )

    (documents,) = load(spark, sf_dir, "documents")
    bucket = hash60(F.concat(F.col("doc_id").cast("string"), F.lit("#split#"))) % 20
    corpus = documents.filter(bucket != 0)
    heldout = documents.filter(bucket == 0)
    # Sign the corpus ONCE; the same cached frame drives pair mining
    # and the decontamination join (r9 — the chained form signed the
    # kept set from scratch, re-running the whole dedup lineage, ~2x
    # the query). Sharing is sound because dedup keeps each
    # component's MIN id, which is always its exact-cluster
    # representative, so every kept doc has its own signature row;
    # _members resets to the doc itself (all other members are gone).
    sig_corpus = minhash_signatures(
        corpus, "doc_id", "text", num_hashes=16, shingle_k=3
    )
    pairs = minhash_lsh_pairs(
        corpus,
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        shingle_k=3,
        threshold=0.5,
        expand="star",
        sigs=sig_corpus,
    )
    kept = dedup_corpus(corpus, pairs, "doc_id")
    kept_sigs = sig_corpus.join(
        kept.select("doc_id"), "doc_id", "semi"
    ).withColumn("_members", F.array(F.col("doc_id")))
    clean = decontaminate(
        kept, heldout, "doc_id", "text", threshold=0.5, corpus_sigs=kept_sigs
    )
    return clean.select("doc_id")


@query(
    "ngram_decontaminate",
    """
    WITH base AS (
      SELECT doc_id, text,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split#'), 1, 15))::BIGINT
               % 20 AS bucket
      FROM documents),
    corpus AS (SELECT doc_id, text FROM base WHERE bucket != 0),
    heldout AS (SELECT doc_id, text FROM base WHERE bucket = 0),
    cg AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, md5(array_to_string(toks[i:i+12], ' ')) AS g
             FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
                   FROM corpus),
                  unnest(range(1, len(toks) - 11)) AS u(i)
             WHERE len(toks) >= 13) x),
    hg AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, md5(array_to_string(toks[i:i+12], ' ')) AS g
             FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
                   FROM heldout),
                  unnest(range(1, len(toks) - 11)) AS u(i)
             WHERE len(toks) >= 13) x),
    flagged AS (SELECT DISTINCT cg.doc_id FROM cg JOIN hg USING (g))
    SELECT doc_id FROM corpus
    WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
    """,
    doc="The strict exact-13-gram decontamination rule (the published "
    "GPT-3/Gopher-style pass run ALONGSIDE fuzzy dedup): hash-split "
    "documents 95/5 into corpus and held-out, then drop every training "
    "doc sharing ANY exact 13-token span with held-out data "
    "(operators/dedup.ngram_decontaminate) — catches a benchmark "
    "string embedded in an otherwise-unrelated page, which whole-doc "
    "Jaccard (corpus_decontaminate) structurally misses. Scale shape: "
    "per-doc DISTINCT md5 13-gram hashes are map-only JVM expressions; "
    "the benchmark-sized held-out side broadcasts, so the corpus never "
    "shuffles. Oracle mirrors the gram hashing with DuckDB list "
    "lambdas and the drop with NOT IN.",
)
def ngram_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.functions.hashing import hash60
    from python_stream_processing_framework_spark.operators.dedup import (
        ngram_decontaminate,
    )

    (documents,) = load(spark, sf_dir, "documents")
    bucket = hash60(F.concat(F.col("doc_id").cast("string"), F.lit("#split#"))) % 20
    corpus = documents.filter(bucket != 0)
    heldout = documents.filter(bucket == 0)
    return ngram_decontaminate(corpus, heldout, "doc_id", "text", n=13).select(
        "doc_id"
    )


@query(
    "bloom_decontaminate",
    """
    WITH base AS (
      SELECT doc_id, text,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split#'), 1, 15))::BIGINT
               % 20 AS bucket
      FROM documents),
    corpus AS (SELECT doc_id, text FROM base WHERE bucket != 0),
    heldout AS (SELECT doc_id, text FROM base WHERE bucket = 0),
    hg AS (SELECT DISTINCT g FROM (
             SELECT md5(array_to_string(toks[i:i+12], ' ')) AS g
             FROM (SELECT string_split(trim(lower(text)), ' ') AS toks
                   FROM heldout),
                  unnest(range(1, len(toks) - 11)) AS u(i)
             WHERE len(toks) >= 13) x),
    bits AS (SELECT DISTINCT ('0x' || substr(g, 1 + 5*i, 5))::BIGINT % 131072 AS p
             FROM hg, unnest([0, 1, 2, 3]) AS t(i)),
    cg AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, md5(array_to_string(toks[i:i+12], ' ')) AS g
             FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
                   FROM corpus),
                  unnest(range(1, len(toks) - 11)) AS u(i)
             WHERE len(toks) >= 13) x),
    cpos AS (SELECT doc_id, g, i,
                    ('0x' || substr(g, 1 + 5*i, 5))::BIGINT % 131072 AS p
             FROM cg, unnest([0, 1, 2, 3]) AS t(i)),
    flagged AS (SELECT DISTINCT doc_id FROM (
                  SELECT doc_id, g FROM cpos JOIN bits USING (p)
                  GROUP BY doc_id, g HAVING count(DISTINCT i) = 4) h)
    SELECT c.doc_id, (f.doc_id IS NOT NULL) AS bloom_flagged
    FROM corpus c LEFT JOIN flagged f USING (doc_id)
    """,
    doc="Bloom-filter decontamination pre-filter "
    "(operators/dedup.bloom_build + bloom_flags): build a bitmask over "
    "the held-out split's exact 13-gram md5s (k=4 positions from "
    "disjoint 20-bit md5 slices, m=2^17), then flag every training doc "
    "whose ANY gram has all 4 bits set — the join-free scale path that "
    "ships only a 16 KiB mask instead of broadcasting the gram table, "
    "and runs as one JVM `exists` inside the scan stage (ZERO "
    "exchanges, plan-pinned). No false negatives vs "
    "ngram_decontaminate (unit-pinned superset guarantee); the oracle "
    "recomputes the exact set-bit set and replays membership via "
    "position joins (all-4-positions-present == the bitmask test).",
)
def bloom_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.functions.hashing import hash60
    from python_stream_processing_framework_spark.operators.dedup import (
        bloom_build,
        bloom_flags,
    )

    (documents,) = load(spark, sf_dir, "documents")
    bucket = hash60(F.concat(F.col("doc_id").cast("string"), F.lit("#split#"))) % 20
    corpus = documents.filter(bucket != 0)
    heldout = documents.filter(bucket == 0)
    words = bloom_build(heldout, "text", n=13, m_bits=1 << 17, k=4)
    return bloom_flags(corpus, words, "doc_id", "text", n=13, k=4)


@query(
    "canonical_docs",
    f"""
    WITH RECURSIVE {_COMPONENT_CTES},
    lens AS (
      SELECT doc_id, len({_TOKS}) AS n_toks FROM documents)
    SELECT c.doc_id, c.component,
           (row_number() OVER (
              PARTITION BY c.component
              ORDER BY l.n_toks DESC, c.doc_id ASC) = 1) AS is_canonical
    FROM comp c JOIN lens l ON l.doc_id = c.doc_id
    """,
    doc="Canonical-representative selection over near-dup clusters "
    "(operators/dedup.select_canonical after minhash_lsh_pairs -> "
    "connected_components): per cluster, keep the LONGEST member "
    "(token count), ties by ascending doc_id — the keep-best rule "
    "production dedup applies instead of an arbitrary keep-first. "
    "One window shuffle on the cluster label over near-dup-sized "
    "groups. Oracle replays the full LSH->components pipeline plus "
    "the row_number tie-break.",
)
def canonical_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.dedup import (
        select_canonical,
    )
    from python_stream_processing_framework_spark.operators.graph import (
        connected_components,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        documents,
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        shingle_k=3,
        threshold=0.5,
        expand="star",
    )
    cc = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), "component"
    )
    lens = documents.select(
        "doc_id", F.size(tokens_expr("text")).alias("n_toks")
    )
    labeled = cc.join(lens, "doc_id").withColumnRenamed("n_toks", "score")
    return select_canonical(labeled, "doc_id", "component", "score").select(
        "doc_id", "component", "is_canonical"
    )
