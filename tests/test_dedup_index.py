"""Incremental MinHash-index admission: crafted-corpus exactness and
the no-admitted-near-dups invariant across batches.

Texts are 40 unique tokens; a one-word edit replaces exactly 3 of the
38 3-shingles, so exact Jaccard is 35/41 = 0.854 (a near-dup at the
0.8 threshold) and a two-word edit gives 32/44 = 0.727 (NOT a
near-dup) — every admit/drop decision below is arithmetic, not
vibes. bands=8 x rows=2 makes LSH band recall at j=0.854 effectively
certain (miss probability ~3e-5, and md5 is deterministic anyway).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import release_caches
from python_stream_processing_framework_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from python_stream_processing_framework_spark.operators.dedup_index import (
    compact_index,
    minhash_index_admit,
    read_index,
)

_KW = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.8)


def _text(changes: dict[int, str] | None = None, prefix: str = "alpha") -> str:
    toks = [f"{prefix}{i}" for i in range(40)]
    for pos, word in (changes or {}).items():
        toks[pos] = word
    return " ".join(toks)


_A = _text()                              # the base document
_B = _text({20: "editB"})                 # ~A (j = 35/41 = 0.854)
_Z = _text({20: "editB", 30: "editZ"})    # ~B (0.854), NOT ~A (0.727)
_D = _text({10: "editD"})                 # ~A (0.854)
_C = _text(prefix="beta")                 # distinct
_E = _text(prefix="gamma")                # distinct


def _docs(spark, items):
    return spark.createDataFrame(list(items), ["doc_id", "text"])


def test_admit_batches_keeps_invariant(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        # Batch 1: A(1)~B(2) -> component keeps min id 1; C(3) distinct.
        a1 = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(1, _A), (2, _B), (3, _C)]), idx, "b1", **_KW
            ).collect()
        )
        assert a1 == [1, 3]

        # Batch 2: D(4) near-dups INDEXED A(1) -> dropped cross-index
        # (no within-batch pair); E(5) distinct -> admitted.
        a2 = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(4, _D), (5, _E)]), idx, "b2", **_KW
            ).collect()
        )
        assert a2 == [5]

        stored = read_index(spark, idx)
        assert sorted(r["doc_id"] for r in stored.select("doc_id").collect()) == [
            1,
            3,
            5,
        ]

        # Invariant: no two admitted docs are near-duplicates.
        pairs = minhash_lsh_pairs(
            _docs(spark, [(1, _A), (3, _C), (5, _E)]), "doc_id", "text", **_KW
        )
        assert pairs.count() == 0
    finally:
        release_caches()


def test_admit_retry_same_tag_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        b1 = _docs(spark, [(1, _A), (3, _C)])
        minhash_index_admit(b1, idx, "b1", **_KW).collect()
        # Retry the SAME batch under the same tag (foreachBatch
        # redelivery): the index must not grow duplicate rows.
        minhash_index_admit(b1, idx, "b1", **_KW).collect()
        stored = read_index(spark, idx)
        assert stored.count() == 2
        assert stored.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    finally:
        release_caches()


def test_chain_collapses_to_one_survivor(spark, tmp_path):
    """A~B and B~Z but NOT A~Z: the component chain {1,2,4} keeps only
    min id 1 (component-canonical, same rule as dedup_corpus)."""
    idx = str(tmp_path / "idx")
    try:
        admitted = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(2, _B), (1, _A), (4, _Z), (9, _E)]), idx, "first", **_KW
            ).collect()
        )
        assert admitted == [1, 9]
    finally:
        release_caches()


def test_cross_index_drop_respects_threshold(spark, tmp_path):
    """Z is 0.727-similar to indexed A — BELOW the 0.8 threshold, so
    the exact-verify step must admit it even though banding may
    surface the candidate pair."""
    idx = str(tmp_path / "idx")
    try:
        minhash_index_admit(_docs(spark, [(1, _A)]), idx, "b1", **_KW).collect()
        admitted = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(4, _Z)]), idx, "b2", **_KW
            ).collect()
        )
        assert admitted == [4]
    finally:
        release_caches()


def _batch_dirs(tmp_path_idx: str):
    import os

    sigs = os.path.join(tmp_path_idx, "sigs")
    return sorted(d for d in os.listdir(sigs) if d.startswith("batch="))


@pytest.mark.slow
def test_compact_then_admit_equivalence(spark, tmp_path):
    """Compaction is invisible to admission: the same batch sequence
    admits the same ids whether or not the index was compacted
    mid-sequence, and the directory count actually drops."""
    idx_plain = str(tmp_path / "plain")
    idx_comp = str(tmp_path / "comp")
    b1 = [(1, _A), (2, _B), (3, _C)]
    b2 = [(5, _E)]
    b3 = [(4, _D), (6, _Z)]  # D ~ indexed A -> drop; Z ~ nothing kept
    try:
        for idx in (idx_plain, idx_comp):
            minhash_index_admit(_docs(spark, b1), idx, "b1", **_KW).collect()
            minhash_index_admit(_docs(spark, b2), idx, "b2", **_KW).collect()
        assert len(_batch_dirs(idx_comp)) == 2
        tag = compact_index(spark, idx_comp, target_files=1)
        assert tag is not None and tag.startswith("zz-compact-")
        assert _batch_dirs(idx_comp) == [f"batch={tag}"]

        got = {}
        for idx in (idx_plain, idx_comp):
            got[idx] = sorted(
                r["doc_id"]
                for r in minhash_index_admit(
                    _docs(spark, b3), idx, "b3", **_KW
                ).collect()
            )
        assert got[idx_plain] == got[idx_comp] == [6]
        # stored sets agree too (ignoring which partition holds a row)
        rows = lambda p: sorted(  # noqa: E731
            r["doc_id"] for r in read_index(spark, p).select("doc_id").collect()
        )
        assert rows(idx_plain) == rows(idx_comp) == [1, 3, 5, 6]
    finally:
        release_caches()


@pytest.mark.slow
def test_compact_folds_previous_generations(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        minhash_index_admit(_docs(spark, [(1, _A)]), idx, "b1", **_KW).collect()
        minhash_index_admit(_docs(spark, [(3, _C)]), idx, "b2", **_KW).collect()
        t1 = compact_index(spark, idx, target_files=1)
        minhash_index_admit(_docs(spark, [(5, _E)]), idx, "b3", **_KW).collect()
        t2 = compact_index(spark, idx, target_files=1)
        assert t1 != t2 and _batch_dirs(idx) == [f"batch={t2}"]
        assert sorted(
            r["doc_id"] for r in read_index(spark, idx).select("doc_id").collect()
        ) == [1, 3, 5]
    finally:
        release_caches()


@pytest.mark.slow
def test_compact_retains_tags_for_retry(spark, tmp_path):
    """The retention rule: a tag that may be retried must be passed in
    retain_tags — its partition survives, so the retry still excludes
    its own earlier write via batch != tag and stays idempotent."""
    idx = str(tmp_path / "idx")
    try:
        b2 = _docs(spark, [(5, _E)])
        minhash_index_admit(_docs(spark, [(1, _A), (3, _C)]), idx, "b1", **_KW).collect()
        minhash_index_admit(b2, idx, "b2", **_KW).collect()
        # b2 is still in flight: retain it
        assert compact_index(spark, idx, retain_tags=["b2"]) is None  # <=1 other
        minhash_index_admit(_docs(spark, [(7, _text(prefix="delta"))]), idx, "b3", **_KW).collect()
        tag = compact_index(spark, idx, retain_tags=["b2"])
        assert tag is not None
        assert f"batch=b2" in _batch_dirs(idx)
        # the retry of b2 still admits its own docs (no self-collision)
        retried = sorted(
            r["doc_id"]
            for r in minhash_index_admit(b2, idx, "b2", **_KW).collect()
        )
        assert retried == [5]
        stored = read_index(spark, idx)
        assert stored.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    finally:
        release_caches()


def test_compact_noop_cases(spark, tmp_path):
    idx = str(tmp_path / "idx")
    assert compact_index(spark, idx) is None  # no index at all
    try:
        minhash_index_admit(_docs(spark, [(1, _A)]), idx, "b1", **_KW).collect()
        assert compact_index(spark, idx) is None  # single partition
        assert _batch_dirs(idx) == ["batch=b1"]
    finally:
        release_caches()


def test_index_stores_signatures_not_text(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        minhash_index_admit(_docs(spark, [(1, _A), (3, _C)]), idx, "b1", **_KW).collect()
        stored = read_index(spark, idx)
        assert set(stored.columns) == {"doc_id", "_sig", "_shingles", "batch"}
    finally:
        release_caches()


@pytest.mark.slow
def test_within_batch_loser_gate_exchange_regime(spark, tmp_path, monkeypatch):
    """r8 verdict #2: the within-batch loser anti-join is size-gated.
    With the cap forced to 0 (every loser set 'too big to broadcast')
    the admit decisions must be identical to the default regime — the
    gate changes the join strategy, never the result."""
    from python_stream_processing_framework_spark.operators import common

    def run(tag_dir):
        idx = str(tmp_path / tag_dir)
        a1 = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(1, _A), (2, _B), (3, _C)]), idx, "b1", **_KW
            ).collect()
        )
        a2 = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(4, _D), (5, _E)]), idx, "b2", **_KW
            ).collect()
        )
        return a1, a2

    try:
        default = run("idx_default")
        monkeypatch.setattr(common, "BROADCAST_ROW_CAP", 0)
        forced = run("idx_forced")
        assert forced == default == ([1, 3], [5])
    finally:
        release_caches()


@pytest.mark.slow
def test_compact_keeps_both_signatures_on_id_reuse(spark, tmp_path):
    """ADVICE r8: dropDuplicates([id]) at compaction silently discarded
    one signature when the same id was legitimately re-admitted with
    DIFFERENT content (id reuse across crawls). Compaction now dedups
    on the FULL row: crash-replay copies still collapse, but both
    content versions survive — and a post-compaction near-dup of the
    OLD content still drops."""
    idx = str(tmp_path / "idx")
    try:
        minhash_index_admit(_docs(spark, [(7, _A)]), idx, "b1", **_KW).collect()
        # same id, different content (not a near-dup of _A) -> admitted
        a2 = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(7, _C)]), idx, "b2", **_KW
            ).collect()
        )
        assert a2 == [7]
        assert compact_index(spark, idx, target_files=1) is not None
        stored = read_index(spark, idx)
        assert stored.filter(F.col("doc_id") == 7).count() == 2
        # near-dup of the OLD (b1) content must still be caught
        a3 = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(9, _D), (10, _E)]), idx, "b3", **_KW
            ).collect()
        )
        assert a3 == [10]
    finally:
        release_caches()


def _legacy_sigs(spark, items):
    """Reconstruct the pre-r9 index row format: `_shingles` as the
    shingle STRINGS (what indexes written before the r9 image bump
    persist), same `_sig` as today."""
    from python_stream_processing_framework_spark.operators.dedup import (
        minhash_signatures,
        shingles_expr,
        tokens_expr,
    )

    docs = _docs(spark, items)
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=16, shingle_k=3)
    return (
        sigs.join(docs, "doc_id")
        .withColumn("_toks", tokens_expr("text"))
        .withColumn("_shingles", shingles_expr("_toks", 3))
        .select("doc_id", "_sig", "_shingles")
    )


def test_legacy_string_shingle_index_migrates_on_read(spark, tmp_path):
    """A pre-r9 index (string `_shingles`) is durably rewritten to
    the int64 image format on first read, and admission against it
    detects cross-index near-dups exactly as against a native index
    (the image is xxhash64(shingle), a pure function)."""
    from pyspark.sql.types import ArrayType, LongType

    idx = str(tmp_path / "idx")
    _legacy_sigs(spark, [(1, _A), (3, _C)]).write.parquet(f"{idx}/sigs/batch=legacy0")

    try:
        stored = read_index(spark, idx)
        t = dict((f.name, f.dataType) for f in stored.schema.fields)["_shingles"]
        assert isinstance(t, ArrayType) and isinstance(t.elementType, LongType)
        # the rewrite is DURABLE: the partition itself is new-format now
        on_disk = spark.read.parquet(f"{idx}/sigs/batch=legacy0")
        t2 = dict((f.name, f.dataType) for f in on_disk.schema.fields)["_shingles"]
        assert isinstance(t2.elementType, LongType)

        # D(4) ~ indexed A(1) -> dropped cross-index; E(5) admitted.
        a = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(4, _D), (5, _E)]), idx, "b2", **_KW
            ).collect()
        )
        assert a == [5]
        # no mixed formats left behind: full-index read still works
        assert sorted(
            r["doc_id"] for r in read_index(spark, idx).select("doc_id").collect()
        ) == [1, 3, 5]
    finally:
        release_caches()


def test_migrate_orphan_recovery(spark, tmp_path):
    """A crash between the legacy-dir delete and the temp rename
    leaves `.migrate-<tag>` with no `batch=<tag>`; the next
    migrate_index() completes the rename instead of losing the
    partition."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        migrate_index,
    )

    idx = str(tmp_path / "idx")
    sigs = _legacy_sigs(spark, [(1, _A)])
    rehashed = sigs.withColumn(
        "_shingles", F.expr("transform(_shingles, x -> xxhash64(x))")
    )
    # simulate the post-crash state: completed temp, deleted original
    rehashed.write.parquet(f"{idx}/sigs/.migrate-legacy0")
    assert migrate_index(spark, idx) == 0  # nothing legacy, just heals
    healed = spark.read.parquet(f"{idx}/sigs/batch=legacy0")
    assert healed.count() == 1
    assert read_index(spark, idx).count() == 1


def test_migrate_orphan_recovery_old_backup(spark, tmp_path):
    """Crash points of the r11 four-step swap: (a) after the legacy
    dir was renamed aside but before the temp renamed in — recovery
    lands the temp THEN drops the backup; (b) after the temp renamed
    in but before the backup delete — recovery just drops the
    backup. Neither loses the partition or doubles it."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        migrate_index,
    )

    idx = str(tmp_path / "idx")
    sigs = _legacy_sigs(spark, [(1, _A)])
    rehashed = sigs.withColumn(
        "_shingles", F.expr("transform(_shingles, x -> xxhash64(x))")
    )
    # (a): temp complete, live dir renamed aside, no batch= dir
    rehashed.write.parquet(f"{idx}/sigs/.migrate-legacy0")
    sigs.write.parquet(f"{idx}/sigs/.old-legacy0")
    # (b): swap done for another tag, backup not yet deleted
    rehashed.write.parquet(f"{idx}/sigs/batch=legacy1")
    sigs.write.parquet(f"{idx}/sigs/.old-legacy1")

    assert migrate_index(spark, idx) == 0  # heals, nothing legacy left
    import os

    names = set(os.listdir(f"{idx}/sigs"))
    assert "batch=legacy0" in names and "batch=legacy1" in names
    assert not any(n.startswith(".old-") for n in names)
    assert not any(n.startswith(".migrate-") for n in names)
    assert read_index(spark, idx).count() == 2


@pytest.mark.slow
def test_compact_retains_zero_padded_numeric_tag(spark, tmp_path):
    """r12 review regression (compact_partitions raw-dir discipline):
    a zero-padded retained tag ('007') used to be compared against the
    partition-INFERRED value (int 7 -> '7'), so the supposedly-retained
    partition was folded — breaking the retry's self-exclusion — and
    its delete path (batch=7) didn't even exist. Compaction now works
    from the raw directory names and protects every inferred surface
    form of a retained tag."""
    idx = str(tmp_path / "idx")
    try:
        held = _docs(spark, [(5, _E)])
        minhash_index_admit(_docs(spark, [(1, _A)]), idx, "001", **_KW).collect()
        minhash_index_admit(_docs(spark, [(3, _C)]), idx, "002", **_KW).collect()
        minhash_index_admit(held, idx, "007", **_KW).collect()
        tag = compact_index(spark, idx, retain_tags=["007"])
        assert tag is not None
        dirs = _batch_dirs(idx)
        # the retained partition survived; the folded sources are gone
        assert "batch=007" in dirs
        assert dirs == sorted(["batch=007", f"batch={tag}"])
        # the retry of 007 still admits its own docs (self-exclusion
        # intact across the inference gap)
        retried = sorted(
            r["doc_id"]
            for r in minhash_index_admit(held, idx, "007", **_KW).collect()
        )
        assert retried == [5]
        stored = read_index(spark, idx)
        assert (
            stored.groupBy("doc_id").count().filter(F.col("count") > 1).count()
            == 0
        )
    finally:
        release_caches()


def test_admit_zero_padded_tag_excludes_own_partition(spark, tmp_path):
    """exclude_batch_tag (r12): a retry with a zero-padded numeric tag
    must not collide with its own earlier int-inferred partition."""
    idx = str(tmp_path / "idx")
    try:
        b = _docs(spark, [(9, _A)])
        minhash_index_admit(b, idx, "07", **_KW).collect()
        retried = sorted(
            r["doc_id"] for r in minhash_index_admit(b, idx, "07", **_KW).collect()
        )
        assert retried == [9]
    finally:
        release_caches()


def test_exclude_batch_tag_float_widened_and_escaped(spark, tmp_path):
    """r12 review regressions on exclude_batch_tag's form set: (a) a
    MIXED int/float dir set widens the partition column to double, so
    an integer tag's rows surface as '7.0' — the int-only form missed
    them and a retry self-collided; (b) dirs are written with the raw
    tag but Spark's partition reader UNESCAPES %XX, so an escaped
    tag's rows surface under the unescaped string."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        exclude_batch_tag,
    )

    # (a) int/float widening
    root = str(tmp_path / "idx")
    spark.createDataFrame([(1,)], "v bigint").write.parquet(f"{root}/batch=7")
    spark.createDataFrame([(2,)], "v bigint").write.parquet(f"{root}/batch=8.5")
    idx = spark.read.parquet(root)
    left = [r["v"] for r in exclude_batch_tag(idx, "7").collect()]
    assert left == [2]

    # (b) hive unescaping
    root2 = str(tmp_path / "idx2")
    spark.createDataFrame([(1,)], "v bigint").write.parquet(
        f"{root2}/batch=a%3Ab"
    )
    spark.createDataFrame([(2,)], "v bigint").write.parquet(
        f"{root2}/batch=other"
    )
    idx2 = spark.read.parquet(root2)
    assert {r["batch"] for r in idx2.select("batch").distinct().collect()} == {
        "a:b",
        "other",
    }  # the reader really does unescape
    left2 = [r["v"] for r in exclude_batch_tag(idx2, "a%3Ab").collect()]
    assert left2 == [2]


def test_compact_preserves_rows_of_escaped_tag_dirs(spark, tmp_path):
    """r12 review regression (compact_partitions): a dir whose raw
    name contains %XX reads back under the UNESCAPED column value, so
    matching compacted rows by raw name alone would omit them from
    the consolidated partition while still deleting the source dir —
    permanently losing the rows."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        compact_partitions,
    )

    root = str(tmp_path / "grams")
    spark.createDataFrame([(11,)], "g bigint").write.parquet(
        f"{root}/batch=a%3Ab"
    )
    spark.createDataFrame([(22,)], "g bigint").write.parquet(
        f"{root}/batch=b2"
    )
    tag = compact_partitions(spark, root)
    assert tag is not None
    rows = sorted(
        r["g"] for r in spark.read.parquet(root).select("g").collect()
    )
    assert rows == [11, 22]  # nothing lost across the escape gap


def test_exclude_batch_tag_java_scientific_rendering(spark, tmp_path):
    """r13 review regression (exclude_batch_tag typed disjunct): a
    double-widened batch column renders values >= 1e7 in Java
    scientific notation (cast(1.0E7 as string) = '1.0E7'), which no
    Python-minted string form matches — the retry used to
    self-collide. The typed cast('double') disjunct matches the
    VALUE, sidestepping engine string formatting."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        exclude_batch_tag,
    )

    root = str(tmp_path / "idx")
    spark.createDataFrame([(1,)], "v bigint").write.parquet(
        f"{root}/batch=10000000"
    )
    spark.createDataFrame([(2,)], "v bigint").write.parquet(
        f"{root}/batch=8.5"
    )
    idx = spark.read.parquet(root)
    # precondition: the widened column really does render Java-style
    rendered = {
        r[0]
        for r in idx.select(F.col("batch").cast("string")).distinct().collect()
    }
    assert "1.0E7" in rendered
    left = [r["v"] for r in exclude_batch_tag(idx, "10000000").collect()]
    assert left == [2]
    # and the typed disjunct must not null-drop OTHER non-numeric
    # batches (null == 7.0 is null; un-coalesced it would eat rows)
    root2 = str(tmp_path / "idx2")
    spark.createDataFrame([(3,)], "v bigint").write.parquet(
        f"{root2}/batch=alpha"
    )
    spark.createDataFrame([(4,)], "v bigint").write.parquet(
        f"{root2}/batch=7"
    )
    idx2 = spark.read.parquet(root2)
    left2 = sorted(r["v"] for r in exclude_batch_tag(idx2, "7").collect())
    assert left2 == [3]


def test_compact_folds_java_scientific_rows(spark, tmp_path):
    """r13 review regression (compact_partitions complement select):
    rows whose batch value renders '1.0E7' matched no Python surface
    form, so the positive-list isin() select omitted them from the
    consolidated write while the delete still removed their source
    dir — permanent row loss. Folding the COMPLEMENT of the retained
    tags makes fold-or-retain a partition of the index."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        compact_partitions,
    )

    root = str(tmp_path / "grams")
    spark.createDataFrame([(11,)], "g bigint").write.parquet(
        f"{root}/batch=10000000"
    )
    spark.createDataFrame([(22,)], "g bigint").write.parquet(
        f"{root}/batch=8.5"
    )
    spark.createDataFrame([(33,)], "g bigint").write.parquet(
        f"{root}/batch=other"
    )
    tag = compact_partitions(spark, root)
    assert tag is not None
    rows = sorted(r["g"] for r in spark.read.parquet(root).select("g").collect())
    assert rows == [11, 22, 33]  # nothing lost across the rendering gap


def test_compact_retained_java_scientific_tag_not_duplicated(spark, tmp_path):
    """Complement-select dual of the row-loss regression: a RETAINED
    tag whose column value renders Java-style must stay out of the
    consolidated partition (folding it would duplicate its rows and
    break the retry's batch != tag self-exclusion)."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        compact_partitions,
    )

    root = str(tmp_path / "grams")
    spark.createDataFrame([(11,)], "g bigint").write.parquet(
        f"{root}/batch=10000000"
    )
    spark.createDataFrame([(22,)], "g bigint").write.parquet(
        f"{root}/batch=8.5"
    )
    spark.createDataFrame([(33,)], "g bigint").write.parquet(
        f"{root}/batch=9.5"
    )
    tag = compact_partitions(spark, root, retain_tags=["10000000"])
    assert tag is not None
    dirs = sorted(
        p.name for p in (tmp_path / "grams").iterdir() if p.name.startswith("batch=")
    )
    assert dirs == sorted(["batch=10000000", f"batch={tag}"])
    rows = sorted(r["g"] for r in spark.read.parquet(root).select("g").collect())
    assert rows == [11, 22, 33]  # retained once, folded once, no dupes


def test_tag_forms_ascii_numeric_gate(spark, tmp_path):
    """r13 review regression (_tag_forms ASCII gate): Python's
    int()/float() accept underscores (int('7_0') == 70), so the tag
    '7_0' used to mint the form '70' and exclude the UNRELATED batch
    '70' partition — over-exclusion that re-admits its duplicates."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        _tag_forms,
        exclude_batch_tag,
    )

    assert "70" not in _tag_forms("7_0")
    root = str(tmp_path / "idx")
    spark.createDataFrame([(1,)], "v bigint").write.parquet(
        f"{root}/batch=7_0"
    )
    spark.createDataFrame([(2,)], "v bigint").write.parquet(
        f"{root}/batch=70"
    )
    idx = spark.read.parquet(root)
    left = sorted(r["v"] for r in exclude_batch_tag(idx, "7_0").collect())
    assert left == [2]  # only the tag's own partition is excluded


def test_compact_protects_whitespace_numeric_tag_dir(spark, tmp_path):
    """r13 ADVICE regression (compact_partitions predicate split):
    dir protection matched string surface forms only, while row
    retention (_tag_match_pred) also matches on try_cast('double'),
    which TRIMS whitespace. A non-canonical dir 'batch= 7' retained
    under tag '7' therefore had its rows kept OUT of the fold while
    its directory was deleted — losing the rows. Dir protection now
    mirrors the typed disjunct (a superset: over-protection only
    duplicates, which the next compaction folds)."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        compact_partitions,
    )

    root = str(tmp_path / "idx")
    spark.createDataFrame([(1,)], "v bigint").write.parquet(
        f"{root}/batch= 7"
    )
    spark.createDataFrame([(2,)], "v bigint").write.parquet(
        f"{root}/batch=a"
    )
    spark.createDataFrame([(3,)], "v bigint").write.parquet(
        f"{root}/batch=b"
    )
    tag = compact_partitions(spark, root, retain_tags=["7"])
    assert tag is not None
    # the whitespace dir is typed-protected (its rows would have been
    # retained from the fold); no row of the index is lost
    import os

    dirs = sorted(
        d for d in os.listdir(root) if d.startswith("batch=")
    )
    assert "batch= 7" in dirs
    vals = sorted(r["v"] for r in spark.read.parquet(root).collect())
    assert vals == [1, 2, 3]
