"""Deduplication operators for large-scale text corpora.

Beyond-reference capability (SURVEY §2.7): exact, MinHash+LSH, SimHash,
and n-gram-Jaccard near-dup detection, each designed so the candidate
generation is a bucketed equi-join (shuffle on a band key) rather than
an O(n^2) comparison — the only shape that survives 100 TB.

Everything is built from deterministic md5-based hashing evaluated
JVM-side via higher-order functions (no Python UDFs, no explode of the
token stream except where a shuffle key is genuinely needed), so
results are engine-portable and oracle-checkable.

Scale notes (local[32] tests at sf<=0.1; design target 1000 executors):
- signatures: narrow map-only stage, whole-stage codegen.
- LSH banding: |bands| rows per doc into one shuffle; BUCKET keys are
  md5-uniform, but bucket OCCUPANCY is not — c byte-identical copies
  of one document share every band value, so an unguarded band join
  generates O(c^2) candidates per copy-cluster, and real web corpora
  are 30-50% exact duplicates. minhash_lsh_pairs/minhash_lsh_join
  therefore collapse exact duplicates (identical normalized text) to
  ONE representative before banding and re-expand the results through
  the membership table afterwards — exactly output-equivalent (copies
  have identical shingle sets, so intra-cluster pairs are Jaccard 1.0
  and cross-cluster member pairs inherit their representatives'
  statistics), while the band join only ever sees distinct texts.
  AQE skew-join handles residual pathological buckets.
- verification joins fetch shingle sets only for candidate pairs —
  candidates are O(near-dups), not O(n^2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# materialize lives in common.py; re-imported here both for local use
# and back-compat with callers importing it from this module
from python_stream_processing_framework_spark.operators.common import (
    materialize,
    maybe_broadcast,
)


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Widen a too-narrow scan before a CPU-heavy map stage.

    The testdata ships one row-group per table, so a bare scan is ONE
    task no matter how many cores exist; hashing/vector math would run
    single-threaded. One small shuffle buys full-width execution.

    GATED on input width: when the input is already >= parallelism
    wide (any production-sized table), repartitioning would be a
    gratuitous full shuffle of raw text/vectors — return the input
    untouched so no Exchange enters the plan at all.

    The gate reads `inputFiles()` first (a file-index lookup): a scan
    over >= parallelism files is wide at the source, no `.rdd` call
    needed. Converting the plan to an RDD just to count partitions
    would re-plan the whole query per call (bypassing AQE) — that
    fallback only runs for non-file inputs (in-memory test frames),
    where the plan is trivially small.
    """
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # non-file-backed plan
        files = []
    if files:
        if len(files) >= parallelism:
            return df
        return df.repartition(parallelism)
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)


def tokens_expr(text_col: str) -> Column:
    """Whitespace tokens of lower-cased trimmed text (engine-portable)."""
    return F.split(F.trim(F.lower(F.col(text_col))), " ")


def shingles_expr(toks_col: str, k: int) -> Column:
    """Distinct k-word shingles: concat_ws(' ', slice(toks, i, k))."""
    return F.expr(
        f"array_distinct(transform(sequence(1, size({toks_col}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({toks_col}, i, {k}))))"
    )


def exact_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Exact dedup: canonical row id per duplicate-key group.

    Returns the input plus `canonical_<order_col>` (min order_col per
    key group) and `is_dup`. Hash-groupBy shape: one shuffle on `keys`,
    map-side partial min.
    """
    w = Window.partitionBy(*keys)
    return df.withColumn(f"canonical_{order_col}", F.min(order_col).over(w)).withColumn(
        "is_dup", F.col(order_col) != F.col(f"canonical_{order_col}")
    )


def band_vals_expr(num_hashes: int, bands: int, sig_col: str = "_sig") -> Column:
    """LSH band keys: xxhash64 of each band's signature slice — the
    ONE definition the self-join (minhash_lsh_pairs), the two-table
    join (minhash_lsh_join), and the persisted index
    (dedup_index.minhash_index_admit) all band on, so they can never
    silently diverge.

    r9 bytes discipline: the key is the 8-byte xxhash64 of the
    concatenated md5 slice, not the ~128-char concat itself — the
    band join is the family's BIGGEST shuffle and its row shrinks
    ~6x. Banding equality classes are unchanged except for xxhash64
    collisions (~2^-64 per cross-doc pair), which only ADD candidates
    that the exact Jaccard verification then rejects — output-neutral
    unless a colliding pair also genuinely clears the threshold
    (a true pair md5-banding missed; w.h.p. never, and strictly a
    recall improvement if it ever happens)."""
    rows = num_hashes // bands
    return F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> xxhash64(concat_ws('', slice({sig_col}, b * {rows} + 1, {rows}))))"
    )


def with_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    shingle_k: int = 3,
    widen: bool = True,
) -> DataFrame:
    """Add `_shingles` and a `_sig` MinHash signature column.

    MinHash per Broder (1997): per hash i, sig[i] = min over shingles
    of h_i(shingle), with h_i = md5(shingle || '#' || i). Min over the
    md5 hex strings is a valid uniform min-hash (lexicographic order on
    uniformly distributed hex). Map-only, codegen'd.

    ``_shingles`` carries the distinct shingle set as int64 xxhash64
    IMAGES, not the shingle strings (r9 bytes discipline, the same
    move setsim's verification made in r8): verification only needs
    intersection/union CARDINALITIES, which hashing preserves
    (within-doc image collisions at ~|shingles|^2 / 2^64 are the
    standard w.h.p. trade), and the image array is ~3x smaller in
    the signature caches, the persisted dedup index, and the
    candidate-verify shuffle. Signature derivation itself stays on
    the md5 strings — that family is what the SQL oracles replay.

    ``widen=False`` skips the spread() gate — pass it when the input
    is already shuffle-width (e.g. a collapse_exact_dups output):
    spread's partition-count probe (`df.rdd`) would force AQE to
    materialize the upstream shuffle stages eagerly just to read the
    partition count.
    """
    sig = F.expr(
        f"transform(sequence(0, {num_hashes - 1}),"
        f" s -> array_min(transform(_shingles_str, x -> md5(concat(x, '#', cast(s as string))))))"
    )
    filtered = df.filter(F.size(tokens_expr(text_col)) >= shingle_k)
    return (
        (spread(filtered) if widen else filtered)
        .withColumn("_toks", tokens_expr(text_col))
        .withColumn("_shingles_str", shingles_expr("_toks", shingle_k))
        .withColumn("_sig", sig)
        .withColumn("_shingles", F.expr("transform(_shingles_str, x -> xxhash64(x))"))
        .drop("_toks", "_shingles_str")
    )


def collapse_exact_dups(
    df: DataFrame, id_col: str, text_col: str, *, shingle_k: int = 3
) -> DataFrame:
    """Collapse byte-identical (after trim+lower normalization) texts
    to ONE representative row before any signature work.

    Returns one row per distinct normalized text: the minimum-id
    member's (id, text) plus `_members`, the sorted id list of every
    copy (so `_members[0]` is the representative itself). Identical
    normalized texts have identical token streams, hence identical
    shingle sets, signatures and band values — so running LSH on
    representatives and re-expanding through `_members` afterwards is
    EXACTLY output-equivalent to running it on the raw corpus, while
    the band join never sees duplicate mass (the O(c^2)-per-copy-
    cluster hazard of real web corpora, which are 30-50% exact dups).

    One hash shuffle on the md5 text key; docs below the shingle
    floor are dropped exactly as with_minhash would drop them. No
    spread() here: the collapse map side is one cheap md5 per doc
    (production scans are file-split wide anyway), and the groupBy
    exchange itself gives the expensive downstream signature stage
    full shuffle-partition width.
    """
    eligible = df.select(id_col, text_col).filter(
        F.size(tokens_expr(text_col)) >= shingle_k
    )
    return (
        eligible.withColumn("_dupkey", F.md5(F.trim(F.lower(F.col(text_col)))))
        .groupBy("_dupkey")
        .agg(
            F.min(id_col).alias(id_col),
            F.min(text_col).alias(text_col),
            F.sort_array(F.collect_list(id_col)).alias("_members"),
        )
        .drop("_dupkey")
    )


def _cap_band_buckets(
    banded: DataFrame,
    max_band_freq: int,
    keys: tuple[str, ...] = ("band_idx", "band_val"),
) -> DataFrame:
    """Drop LSH buckets with more than `max_band_freq` occupants
    before the candidate join — the `max_doc_freq` hot-key pattern
    applied to LSH buckets. The ONE implementation of the
    family-wide hot-bucket guard: MinHash banding uses the default
    (band_idx, band_val) keys; sign-LSH banding and the embedding
    index pass (band_idx, band_key). Occupancy is counted over
    REPRESENTATIVES (exact dups are already collapsed), so only
    genuinely giant near-dup buckets are dropped; that trades recall
    inside those buckets for a hard per-bucket O(cap^2) bound."""
    key_cols = list(keys)
    freq = banded.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_bf"))
    return banded.join(
        freq.filter(F.col("_bf") <= max_band_freq).select(*key_cols),
        key_cols,
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    shingle_k: int = 3,
    collapse_exact: bool = True,
) -> DataFrame:
    """The materialized `(id, _members, _sig, _shingles)` signature
    frame every MinHash stage consumes — exposed so a COMPOSED
    pipeline signs its corpus ONCE and shares the frame between pair
    mining (``minhash_lsh_pairs(sigs=...)``) and cross-corpus joins
    (``minhash_lsh_join(left_sigs=...)`` / ``decontaminate(
    corpus_sigs=...)``), the same share-the-signing contract as
    similarity.sign_signatures for the embedding family. Projected to
    the four columns before caching (never the raw text); release via
    common.release_caches()."""
    if collapse_exact:
        src = collapse_exact_dups(df, id_col, text_col, shingle_k=shingle_k)
    else:
        src = df.select(id_col, text_col).withColumn(
            "_members", F.array(F.col(id_col))
        )
    return materialize(
        with_minhash(
            src,
            id_col,
            text_col,
            num_hashes=num_hashes,
            shingle_k=shingle_k,
            widen=not collapse_exact,
        ).select(F.col(id_col), F.col("_members"), F.col("_sig"), F.col("_shingles"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = True,
    expand: str = "pairs",
    max_band_freq: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding + exact verify.

    1. collapse exact duplicates to one representative (default on —
       exactly output-equivalent, see collapse_exact_dups; identical
       docs would otherwise occupy every band together and the band
       join would generate O(c^2) candidates per copy-cluster);
    2. signatures (map-only);
    3. banding: `bands` band-keys per doc, equi-self-join on
       (band_idx, band_val) — the one shuffle;
    4. verify candidates with exact Jaccard over distinct shingle sets;
    5. re-expand representative pairs through the membership table.

    Output: (doc_a, doc_b, n_common, n_union, jaccard) with
    jaccard >= threshold; doc_a < doc_b.

    ``expand="star"`` (with collapse_exact) returns the linear-size
    spanning form instead of all-pairs: representative-vs-
    representative pairs plus one (representative, copy) edge per
    exact duplicate. Connected components over the star output equals
    components over the full pair set (each copy-cluster is a clique;
    a star spans it), so dedup pipelines avoid materializing the
    inherently O(c^2) intra-cluster pairs. ``max_band_freq`` caps
    band-bucket occupancy (recall-trading hot-key guard, off by
    default — see _cap_band_buckets). Recommended setting on corpora
    with boilerplate (web crawls): **256**. Measured on a planted
    10%-boilerplate corpus (SCALE.md "Hot-bucket cap"), capping at
    256 cost ZERO recall on normal near-dup pairs (bucket occupancy
    ~2) while refusing the boilerplate cluster's quadratic pair mass
    (20k docs: 22.2 s / 1.99M pairs uncapped -> 3.6 s / 87 pairs;
    the uncapped gap grows with the SQUARE of corpus size). Inside a
    capped bucket recall is zero by design — pair the cap with
    exact dedup / boilerplate_removal for template-heavy content,
    or use ``expand='star'`` (linear pair mass) when the pairs feed
    connected components anyway.

    ``sigs``: a precomputed :func:`minhash_signatures` frame for
    ``df`` (same num_hashes/shingle_k/collapse_exact) — pass it when
    a composed pipeline also needs the signatures elsewhere, so the
    collapse + signing pass runs exactly once.
    """
    if expand not in ("pairs", "star"):
        raise ValueError(f"expand must be 'pairs' or 'star', got {expand!r}")
    if expand == "star" and not collapse_exact:
        raise ValueError("expand='star' requires collapse_exact=True")
    # Signatures feed four plan branches (both sides of the band join,
    # both sides of the verify join): minhash_signatures materializes
    # so the md5 work runs once, projected to (id, members, sig,
    # shingles) BEFORE caching — raw text pinned in cache would hold
    # ~the whole corpus in memory at scale.
    if sigs is None:
        sigs = minhash_signatures(
            df,
            id_col,
            text_col,
            num_hashes=num_hashes,
            shingle_k=shingle_k,
            collapse_exact=collapse_exact,
        )
    band_vals = band_vals_expr(num_hashes, bands)
    banded = sigs.select(
        F.col(id_col), F.posexplode(band_vals).alias("band_idx", "band_val")
    )
    if max_band_freq is not None:
        banded = _cap_band_buckets(banded, max_band_freq)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    sh = sigs.select(F.col(id_col), F.col("_shingles"))
    rep_pairs = (
        cand.join(sh.withColumnRenamed(id_col, "doc_a").withColumnRenamed("_shingles", "_sh_a"), "doc_a")
        .join(sh.withColumnRenamed(id_col, "doc_b").withColumnRenamed("_shingles", "_sh_b"), "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("_sh_a", "_sh_b")).cast("bigint"))
        .withColumn(
            "n_union",
            (F.size("_sh_a") + F.size("_sh_b")).cast("bigint") - F.col("n_common"),
        )
        .withColumn("jaccard", F.col("n_common").cast("double") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
    )
    if not collapse_exact:
        return rep_pairs
    # Re-expansion. Copies have IDENTICAL shingle sets, so every intra-
    # cluster pair is (n_sh, n_sh, 1.0) and every (member-of-A,
    # member-of-B) pair carries exactly the (rep_A, rep_B) statistics —
    # no re-verification needed, just membership joins.
    nsh = F.size("_shingles").cast("bigint")
    clusters = sigs.filter(F.size("_members") > 1)
    if expand == "star":
        copies = clusters.select(
            F.col(id_col).alias("doc_a"),
            F.explode(F.expr("slice(_members, 2, size(_members) - 1)")).alias("doc_b"),
            nsh.alias("n_common"),
            nsh.alias("n_union"),
            F.lit(1.0).alias("jaccard"),
        )
        return rep_pairs.unionByName(copies) if threshold <= 1.0 else rep_pairs
    # expand="pairs": exact all-pairs semantics. Cluster self-pairs
    # (rep, rep) ride through the same two membership joins as the
    # cross-cluster pairs; the filter keeps each unordered pair once
    # (cross-cluster members are distinct so least/greatest orders
    # them; intra-cluster needs the _ma < _mb guard).
    selfpairs = clusters.select(
        F.col(id_col).alias("doc_a"),
        F.col(id_col).alias("doc_b"),
        nsh.alias("n_common"),
        nsh.alias("n_union"),
        F.lit(1.0).alias("jaccard"),
    )
    allp = rep_pairs.unionByName(selfpairs) if threshold <= 1.0 else rep_pairs
    mem = sigs.select(
        F.col(id_col).alias("_rep"), F.explode("_members").alias("_member")
    )
    return (
        allp.join(
            mem.select(F.col("_rep").alias("doc_a"), F.col("_member").alias("_ma")),
            "doc_a",
        )
        .join(
            mem.select(F.col("_rep").alias("doc_b"), F.col("_member").alias("_mb")),
            "doc_b",
        )
        .filter((F.col("doc_a") != F.col("doc_b")) | (F.col("_ma") < F.col("_mb")))
        .select(
            F.least("_ma", "_mb").alias("doc_a"),
            F.greatest("_ma", "_mb").alias("doc_b"),
            "n_common",
            "n_union",
            "jaccard",
        )
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, bits: int = 60
) -> DataFrame:
    """60-bit SimHash fingerprint per document (Charikar 2002).

    Per bit b: sum over distinct tokens of +1/-1 depending on bit b of
    the token's 60-bit md5-derived hash; bit set iff sum >= 0. Integer
    sums are order-free, so the fingerprint is engine-exact. Map-only,
    no shuffle.

    The token hashes stay JVM-side (md5/conv, codegen'd, pushdown
    intact); the majority vote is an Arrow-batched numpy bit-count —
    evaluating it as a nested Catalyst lambda (aggregate over 60 bits x
    aggregate over tokens) costs 60*|tokens| interpreted iterations per
    document, the exact hazard similarity.py documents for LSH
    signatures. 60 bits (15 md5 hex chars) keeps every intermediate in
    a signed int64.
    """
    from pyspark.sql.functions import pandas_udf

    hs = F.expr(
        "transform(array_distinct(_toks), t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))"
    )
    shifts = np.arange(bits, dtype=np.int64)
    # cap the (tokens x bits) bit matrix per block: 500k tokens x 60
    # bits as uint8 = 30 MB regardless of how many docs one Arrow
    # batch carries.
    max_block_tokens = 500_000

    @pandas_udf("bigint")
    def _vote(hs_col: pd.Series) -> pd.Series:
        arrs = [np.asarray(a, dtype=np.int64) for a in hs_col]
        out = np.empty(len(arrs), dtype=np.int64)
        i = 0
        while i < len(arrs):
            j, tok = i, 0
            while j < len(arrs) and (tok == 0 or tok + arrs[j].size <= max_block_tokens):
                tok += arrs[j].size
                j += 1
            block = arrs[i:j]
            lens = np.fromiter((a.size for a in block), dtype=np.int64, count=len(block))
            flat = np.concatenate(block) if tok else np.empty(0, dtype=np.int64)
            # per-bit columns: each pass allocates ONE token-length
            # int64 temp (~4 MB at the cap). The one-shot broadcast
            # form ((flat[:, None] >> shifts) & 1) materializes TWO
            # (tokens x bits) int64 intermediates first — ~240 MB each
            # at the cap, 16x the documented block budget, per
            # concurrently-running UDF worker.
            ones = np.empty((flat.size, bits), dtype=np.uint8)
            for b in range(bits):
                ones[:, b] = (flat >> b) & 1
            starts = np.zeros(len(block), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            # empty docs never reach here (filter size>=1), but guard:
            # reduceat misbehaves on empty segments
            if tok and (lens > 0).all():
                cnt = np.add.reduceat(ones, starts, axis=0, dtype=np.int64)
            else:
                cnt = np.stack(
                    [
                        np.array(
                            [((a >> b) & 1).sum(dtype=np.int64) for b in range(bits)],
                            dtype=np.int64,
                        )
                        if a.size
                        else np.zeros(bits, dtype=np.int64)
                        for a in block
                    ]
                )
            # majority: sum(+1/-1) >= 0  <=>  2*count_ones >= n_tokens
            fp_bits = (2 * cnt >= lens[:, None]).astype(np.int64)
            out[i:j] = (fp_bits << shifts).sum(axis=1)
            i = j
        return pd.Series(out)

    return (
        spread(df)
        .withColumn("_toks", tokens_expr(text_col))
        .filter(F.size("_toks") >= 1)
        .withColumn("_hs", hs)
        .withColumn("fingerprint", _vote(F.col("_hs")))
        .drop("_toks", "_hs")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidate generation by banding the fingerprint into `bands`
    equal bit-slices: any pair within Hamming distance `bands - 1`
    shares at least one exact band (pigeonhole), so with bands=4 and
    max_hamming=3 recall is 100% while the join stays an equi-join on
    (band_idx, band_slice) — no O(n^2) scan.
    """
    if max_hamming > bands - 1:
        raise ValueError("banding guarantees recall only for max_hamming <= bands-1")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    # Both sides of the band self-join read the fingerprints: persist
    # so the 60-bit majority vote runs once per document.
    fps = materialize(
        simhash_fingerprints(df, id_col, text_col, bits=bits).select(
            id_col, "fingerprint"
        )
    )
    slices = F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> (fingerprint >> (b * {band_bits})) & {mask})"
    )
    banded = fps.select(
        F.col(id_col),
        F.col("fingerprint"),
        F.posexplode(slices).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.expr("bit_count(a.fingerprint ^ b.fingerprint)").cast("bigint").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 2,
    unit: str = "word",
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via an inverted-index self-join.

    `unit='word'` shingles over whitespace tokens; `unit='char'`
    shingles over raw characters (sub-word near-dups). The shuffle key
    is the shingle itself (inverted index), so common work is
    proportional to sum over shingles of df^2 — with `max_doc_freq`
    set, ultra-frequent (non-discriminative) shingles are dropped
    before pairing, which is the standard way to keep hot keys bounded
    at corpus scale. Left unset, results are the exact Jaccard (used by
    the oracle harness at small SF).
    """
    if unit == "word":
        prepped = (
            spread(df)
            .withColumn("_toks", tokens_expr(text_col))
            .filter(F.size("_toks") >= shingle_k)
            .withColumn("_sh", shingles_expr("_toks", shingle_k))
        )
    elif unit == "char":
        prepped = (
            spread(df)
            .withColumn("_t", F.trim(F.lower(F.col(text_col))))
            .filter(F.length("_t") >= shingle_k)
            .withColumn(
                "_sh",
                F.expr(
                    f"array_distinct(transform(sequence(1, length(_t) - {shingle_k - 1}),"
                    f" i -> substring(_t, i, {shingle_k})))"
                ),
            )
        )
    else:
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    # feeds both the inverted index and the size table; project to
    # (id, shingles) first — caching the raw text too would pin ~the
    # whole corpus in memory at scale
    docs = materialize(prepped.select(F.col(id_col), F.col("_sh")))
    inv = materialize(docs.select(F.col(id_col), F.explode("_sh").alias("sh")))
    if max_doc_freq is not None:
        # Drop non-discriminative shingles BEFORE pairing, and compute
        # set sizes over the SAME filtered space — Jaccard over rare
        # shingles. (Sizes from the unfiltered sets would undercount
        # similarity: identical docs would score < 1.)
        freq = inv.groupBy("sh").agg(F.count("*").alias("_df"))
        inv = materialize(
            inv.join(freq.filter(F.col("_df") <= max_doc_freq).select("sh"), "sh")
        )
        sizes = inv.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    else:
        sizes = docs.select(F.col(id_col), F.size("_sh").cast("bigint").alias("n_sh"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, "sh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_common"))
        .withColumn("jaccard", F.col("n_common").cast("double") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
    )


def dedup_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    *,
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
) -> DataFrame:
    """End-to-end near-dup collapse: keep ONE canonical doc per cluster.

    ``pairs`` is the output of any detector in this module
    (minhash_lsh_pairs / simhash_pairs / ngram_jaccard_pairs) or of
    similarity.cosine_lsh_pairs — including minhash_lsh_pairs'
    ``expand="star"`` form, which spans the same clusters with
    linearly many edges and is the right input at corpus scale.
    Pairs are transitive-closed into
    clusters (graph.connected_components), and the member with the
    MINIMUM id survives as the cluster's canonical document — the same
    deterministic rule the components operator itself uses, so the
    kept set is reproducible across runs, partitionings, and engines.

    Docs that appear in no pair are untouched (components only labels
    nodes that occur in edges; the anti-join keeps everything else).

    Scale: components is the iterative part (see graph.py); the final
    step is one anti-join of the corpus against the non-canonical
    member set — typically a small fraction of the corpus, so AQE
    turns it into a broadcast anti-join when it fits.
    """
    from python_stream_processing_framework_spark.operators.graph import (
        connected_components,
    )

    a, b = pair_cols
    labels = connected_components(pairs.select(a, b), src=a, dst=b)
    losers = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def minhash_lsh_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = True,
    max_band_freq: int | None = None,
    left_sigs: DataFrame | None = None,
    right_sigs: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus near-duplicate pairs (MinHash + LSH, two tables).

    The two-table form of `minhash_lsh_pairs`: find documents in
    ``left`` that near-duplicate documents in ``right`` — the shape of
    test-set decontamination (corpus vs held-out benchmark) and of
    incremental dedup (new batch vs existing corpus). Both sides use
    the SAME md5 hash family, so signatures are comparable without any
    shared fitted state.

    Output: (id_left, id_right, jaccard) with jaccard >= threshold.
    Scale: identical to the self-join path — each side collapses its
    exact duplicates to one representative before banding (exactly
    output-equivalent, see collapse_exact_dups; results re-expand
    through the membership tables), banding is one equi-join shuffle
    keyed on (band_idx, band_val); when ``right`` is small (a
    benchmark suite), AQE broadcasts its banded side and the big
    corpus never shuffles. ``max_band_freq`` caps LEFT-side (corpus)
    band-bucket occupancy — the recall-trading hot-key guard.

    Recall floor: documents with fewer than ``shingle_k`` tokens have
    no shingles and are dropped from BOTH sides (with_minhash's
    filter), so sub-shingle-length docs can never match — pair this
    with an exact-match join on normalized text if very short
    held-out rows matter. Caches: each side pins one (id, members,
    sig, shingles) frame via materialize(); call
    common.release_caches() once the result is consumed.

    ``left_sigs`` / ``right_sigs``: precomputed
    :func:`minhash_signatures` frames (same num_hashes/shingle_k/
    collapse semantics) — a composed pipeline that already signed a
    side passes it here instead of paying the collapse + signing
    pass again.
    """
    band_vals = band_vals_expr(num_hashes, bands)

    def banded(
        df: DataFrame, side: str, pre: DataFrame | None
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        sigs = pre
        if sigs is None:
            # caches only (id, members, sig, shingles) — never raw text
            sigs = minhash_signatures(
                df,
                id_col,
                text_col,
                num_hashes=num_hashes,
                shingle_k=shingle_k,
                collapse_exact=collapse_exact,
            )
        bd = sigs.select(
            F.col(id_col).alias(f"id_{side}"),
            F.posexplode(band_vals).alias("band_idx", "band_val"),
        )
        sh = sigs.select(
            F.col(id_col).alias(f"id_{side}"), F.col("_shingles").alias(f"_sh_{side}")
        )
        mem = sigs.select(
            F.col(id_col).alias(f"id_{side}"),
            F.explode("_members").alias(f"_m_{side}"),
        )
        return bd, sh, mem

    bl, shl, meml = banded(left, "left", left_sigs)
    br, shr, memr = banded(right, "right", right_sigs)
    if max_band_freq is not None:
        bl = _cap_band_buckets(bl, max_band_freq)
    cand = bl.join(br, ["band_idx", "band_val"]).select("id_left", "id_right").distinct()
    rep_out = (
        cand.join(shl, "id_left")
        .join(shr, "id_right")
        .withColumn(
            "n_common", F.size(F.array_intersect("_sh_left", "_sh_right")).cast("bigint")
        )
        .withColumn(
            "n_union",
            (F.size("_sh_left") + F.size("_sh_right")).cast("bigint")
            - F.col("n_common"),
        )
        .withColumn("jaccard", F.col("n_common").cast("double") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_left", "id_right", "jaccard")
    )
    if not collapse_exact:
        return rep_out
    # Re-expand: every (copy-of-left-rep, copy-of-right-rep) pair
    # carries exactly the representative pair's Jaccard (identical
    # shingle sets) — membership joins, no re-verification.
    return (
        rep_out.join(meml, "id_left")
        .join(memr, "id_right")
        .select(
            F.col("_m_left").alias("id_left"),
            F.col("_m_right").alias("id_right"),
            "jaccard",
        )
    )


def decontaminate(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float = 0.5,
    broadcast_row_cap: int | None = None,
    corpus_sigs: DataFrame | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Remove training documents that near-duplicate held-out data.

    ``corpus_sigs``: a precomputed :func:`minhash_signatures` frame
    for ``corpus`` — a pipeline that just deduped the corpus already
    holds one; passing it skips the second whole-corpus collapse +
    signing pass (measured ~2x on the composed
    dedup -> decontaminate chain).

    Benchmark/test-set contamination is the canonical silent failure
    of LLM training corpora: any training doc whose shingle Jaccard
    with a held-out doc clears ``threshold`` is dropped. One LSH join
    + one anti-join; the held-out side is small, so AQE broadcasts it
    end-to-end and the corpus is never shuffled.

    Limitation (inherited from minhash_lsh_join): held-out docs
    shorter than ``shingle_k`` tokens (default 3) produce no shingles
    and can never flag a training doc — short benchmark answers need
    an additional exact-match pass on normalized text. The two
    signature caches this pins are reclaimed by
    common.release_caches() after the kept set is consumed.
    """
    hits = minhash_lsh_join(
        corpus,
        heldout,
        id_col,
        text_col,
        threshold=threshold,
        left_sigs=corpus_sigs,
        **lsh_kwargs,
    )
    contaminated = hits.select(F.col("id_left").alias(id_col)).distinct()
    # Size-gated broadcast (maybe_broadcast), like ngram_decontaminate:
    # the flagged set is small when contamination is rare, and under
    # the cap the hint keeps the corpus map-side — but its mass scales
    # with CORPUS duplication, not with the benchmark (a popular
    # benchmark string copied across the web flags a corpus-
    # proportional id set), so above the cap the anti-join stays an
    # exchange join and AQE decides. (dedup_corpus's loser anti-join
    # deliberately stays SMJ+AQE always — ITS removal mass scales with
    # the corpus under real duplicate fractions.)
    return corpus.join(
        maybe_broadcast(contaminated, max_rows=broadcast_row_cap),
        id_col,
        "left_anti",
    )


def ngram_overlap_hits(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 13,
) -> DataFrame:
    """Exact n-gram overlap between corpus and held-out docs.

    The published decontamination rule GPT-3/Gopher-style pipelines
    apply alongside fuzzy dedup: a training document is contaminated
    if it shares ANY exact n-token span (n=13 is the classic choice)
    with held-out data — much stricter than a Jaccard threshold, and
    the right tool when a benchmark answer string is embedded inside
    an otherwise-unrelated page (Jaccard over whole docs stays near 0
    there, so `decontaminate` misses it; one shared 13-gram flags it).

    Output: (id_corpus, id_heldout, n_shared) — one row per flagged
    doc pair with its shared-distinct-n-gram count. Compose with an
    anti-join (`ngram_decontaminate`) to drop flagged training docs.

    Scale: per-doc DISTINCT n-gram md5s via the same JVM-side
    higher-order-function hashing as the rest of this module (map-only,
    no Python); the join is an equi-join on the hash. The held-out
    side is benchmark-sized, so AQE broadcasts it and the corpus never
    shuffles; the corpus side's n-gram explode is the unavoidable
    |doc| x (len - n + 1) row fan-out, but it's map-side and feeds a
    broadcast join, not an exchange. Docs shorter than n tokens have
    no n-grams and can never be flagged (same recall floor as the
    shingle pipeline, documented there).
    """
    def grams(side: str) -> DataFrame:
        src = corpus if side == "c" else heldout
        return src.select(
            F.col(id_col).alias(f"id_{side}"),
            F.explode_outer(
                F.array_distinct(
                    # size < n guard is load-bearing: sequence(1, k)
                    # DESCENDS for k < 1, and a filtered remnant would
                    # hash a shorter-than-n slice as a fake n-gram
                    F.expr(
                        f"if(size(_toks) < {n}, array(),"
                        f" transform(sequence(1, size(_toks) - {n} + 1),"
                        f"   i -> md5(array_join(slice(_toks, i, {n}), ' '))))"
                    )
                )
            ).alias("_g"),
        ).filter(F.col("_g").isNotNull())

    c = corpus.withColumn("_toks", tokens_expr(text_col))
    h = heldout.withColumn("_toks", tokens_expr(text_col))
    corpus, heldout = c, h  # grams() closes over these
    return (
        grams("c")
        .join(grams("h"), "_g")
        .groupBy("id_c", "id_h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .select(
            F.col("id_c").alias("id_corpus"),
            F.col("id_h").alias("id_heldout"),
            "n_shared",
        )
    )


def ngram_decontaminate(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 13,
    broadcast_row_cap: int | None = None,
) -> DataFrame:
    """Drop training docs sharing any exact n-gram with held-out data
    (see ngram_overlap_hits). The strict companion to `decontaminate`
    — production pipelines run BOTH: Jaccard for near-copies, exact
    n-gram for embedded benchmark strings.

    The flagged id set rides a SIZE-GATED broadcast (maybe_broadcast):
    under the cap the hint keeps the corpus map-side end to end
    (without it the anti-join plans as a sort-merge that shuffles the
    ENTIRE corpus on id). But the flagged mass is NOT bounded by the
    benchmark — an exact 13-gram from a popular benchmark embedded
    across the web flags an id set proportional to the CORPUS — so
    above the cap the hint is withheld and AQE picks the strategy
    from the real runtime size. bloom_decontaminate remains the
    join-free scale path."""
    hits = ngram_overlap_hits(corpus, heldout, id_col, text_col, n=n)
    flagged = hits.select(F.col("id_corpus").alias(id_col)).distinct()
    return corpus.join(
        maybe_broadcast(flagged, max_rows=broadcast_row_cap), id_col, "left_anti"
    )


def _bloom_gram_expr(toks_col: str, n: int) -> Column:
    """Array of md5-hex n-gram hashes — identical construction to
    ngram_overlap_hits (space-joined token slices), shared so bloom
    and exact decontamination flag the same gram universe."""
    return F.expr(
        f"if(size({toks_col}) < {n}, array(),"
        f" transform(sequence(1, size({toks_col}) - {n} + 1),"
        f"   i -> md5(array_join(slice({toks_col}, i, {n}), ' '))))"
    )


def _bloom_pos_sql(gram: str, i: int, m_bits: int) -> str:
    """Position i for a gram's md5 hex: 5 hex chars (20 bits) starting
    at offset 5*i, reduced mod m_bits. m_bits MUST be a power of two
    <= 2^20 so the modulus of the uniform 20-bit slice stays uniform,
    and k*5 <= 32 hex chars bounds k at 6."""
    return f"(cast(conv(substr({gram}, {1 + 5 * i}, 5), 16, 10) as bigint) % {m_bits})"


def bloom_build(
    heldout: DataFrame,
    text_col: str = "text",
    *,
    n: int = 13,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> list[int]:
    """Build a bloom filter over held-out n-grams; returns the bitmask
    as ``m_bits / 64`` int64 words (driver-side index metadata, like a
    PQ codebook — 16 KiB at the default m, 16 MiB at m=2^27 for a
    ~10M-gram benchmark union, always broadcastable).

    Positions are k disjoint 20-bit slices of the gram's md5 hex mod
    m_bits — engine-portable (md5 + string ops only), so an oracle can
    recompute the exact set-bit set. Deterministic: same corpus, same
    bits, any partitioning.
    """
    if m_bits & (m_bits - 1) or m_bits > (1 << 20):
        raise ValueError("m_bits must be a power of two <= 2^20")
    if not 1 <= k <= 6:
        raise ValueError("k must be in [1, 6] (md5 yields 6 disjoint 20-bit slices)")
    grams = (
        heldout.select(tokens_expr(text_col).alias("_toks"))
        .select(F.explode(F.array_distinct(_bloom_gram_expr("_toks", n))).alias("_g"))
    )
    pos = grams.select(
        F.explode(
            F.array(*[F.expr(_bloom_pos_sql("_g", i, m_bits)) for i in range(k)])
        ).alias("_p")
    ).distinct()
    words = [0] * (m_bits // 64)
    for r in pos.collect():
        p = int(r["_p"])
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement wrap: bit 63 set must ship as a negative int64
    # literal (shiftright is arithmetic, but `& 1` reads any bit fine)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_flags(
    corpus: DataFrame,
    words: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 13,
    k: int = 4,
) -> DataFrame:
    """Map-side bloom membership test: (id_col, bloom_flagged) — true
    iff ANY n-gram of the doc has all k bloom positions set.

    This is the join-free scale path for decontamination: where
    ngram_decontaminate broadcasts the held-out gram table into an
    equi-join, the bloom test ships only the bitmask and runs as a
    single JVM `exists` expression inside the scan stage — ZERO
    exchanges, no join to schedule, and the filter composes with any
    downstream pipeline without a shuffle barrier. The price is a
    bounded false-positive rate ((1 - e^{-kq/m})^k for q set grams);
    false negatives are impossible, so the standard deployment is
    bloom-prefilter -> exact n-gram join on the tiny flagged slice.
    """
    return _with_bloom_flag(corpus, words, text_col, n=n, k=k).select(
        F.col(id_col), "bloom_flagged"
    )


def _with_bloom_flag(
    corpus: DataFrame,
    words: list[int],
    text_col: str,
    *,
    n: int,
    k: int,
) -> DataFrame:
    """corpus + a map-only ``bloom_flagged`` column (helper columns
    dropped); shared by bloom_flags and bloom_decontaminate so the
    drop path needs no self-join."""
    m_bits = len(words) * 64
    word_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    bit_checks = []
    for i in range(k):
        p = _bloom_pos_sql("g", i, m_bits)
        bit_checks.append(
            f"((shiftright(element_at(_bloom_mask, cast(({p}) div 64 as int) + 1),"
            f" cast(({p}) % 64 as int)) & 1) = 1)"
        )
    flag = F.expr(
        "exists(_bloom_grams, g -> " + " AND ".join(bit_checks) + ")"
    )
    return (
        corpus.withColumn("_bloom_mask", F.expr(word_sql))
        .withColumn("_bloom_toks", tokens_expr(text_col))
        .withColumn("_bloom_grams", _bloom_gram_expr("_bloom_toks", n))
        .withColumn("bloom_flagged", F.coalesce(flag, F.lit(False)))
        .drop("_bloom_mask", "_bloom_toks", "_bloom_grams")
    )


def bloom_decontaminate(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 13,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> DataFrame:
    """Drop training docs the bloom filter flags against held-out
    n-grams (bloom_build + bloom_flags). Conservative by construction:
    everything ngram_decontaminate would drop is dropped (no false
    negatives), plus a bounded false-positive mass — the right trade
    when the corpus is 100 TB and a broadcast gram JOIN per benchmark
    suite is the bottleneck. The flags frame is map-only; the drop
    itself filters on the flag, so the whole operator adds zero
    exchanges to the pipeline."""
    words = bloom_build(heldout, text_col, n=n, m_bits=m_bits, k=k)
    return (
        _with_bloom_flag(corpus, words, text_col, n=n, k=k)
        .filter(~F.col("bloom_flagged"))
        .drop("bloom_flagged")
    )


def select_canonical(
    labeled: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "component",
    score_col: str = "score",
) -> DataFrame:
    """Mark one canonical representative per near-dup cluster.

    The resolution step after pairs->components: production pipelines
    do NOT keep an arbitrary (min-id) member — they keep the best one
    (longest text, highest quality score, freshest crawl). Adds
    ``is_canonical``: true for the cluster member with the highest
    ``score_col``, ties broken by ascending ``id_col`` so the choice
    is total and engine-reproducible.

    One shuffle on the cluster label; clusters are near-dup groups
    (tiny fan-in even on duplicate-heavy corpora — the giant-cluster
    mass is exact dups, already collapsed upstream), so the window
    never sees a skewed partition beyond what AQE handles.
    """
    w = Window.partitionBy(label_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return labeled.withColumn("is_canonical", F.row_number().over(w) == 1)
