"""Persisted MinHash index: incremental near-dup admission.

At 100 TB you never re-mine the whole corpus because a new crawl
arrived. This module keeps a parquet signature index (doc_id, MinHash
signature, shingle set — never the text) and admits document batches
incrementally:

1. within-batch: LSH pairs -> connected components -> keep the
   min-id representative per component (the same canonical rule as
   operators/dedup.dedup_corpus);
2. cross-index: band-join the survivors' signatures against the
   INDEX signatures (no text rescan, no signature recompute for the
   historical corpus) and drop survivors whose verified shingle
   Jaccard meets the threshold against any indexed doc;
3. append the admitted docs' signatures to the index under
   ``sigs/batch=<tag>`` — a whole-directory overwrite per batch tag,
   so a retried batch (streaming foreachBatch redelivery, job
   restart) rewrites the same rows instead of duplicating them.

Admission invariant (property-tested in tests/test_dedup_index.py):
after any sequence of admits, NO two admitted documents anywhere in
the index are near-duplicates at the configured threshold.

Scale: per batch, the new side is micro-batch-sized and the index
side is read signature-only (column-pruned parquet scan — `_sig` and
`_shingles` only, never text). The band join shuffles on
(band_idx, band_val) exactly like minhash_lsh_join; when the new
batch is small its banded side broadcasts under AQE and the index
never shuffles. ``max_band_freq`` caps index-side bucket occupancy —
the same recall-trading hot-key guard as the batch path. Shingle
sets ride along for exact verification as int64 xxhash64 IMAGES
(r9 format bump, ~3x smaller index and verify shuffle — counts are
what verification consumes and hashing preserves them w.h.p.;
indexes written before r9 store shingle strings and are migrated in
place, durably and crash-safely, on first read — see
``migrate_index``). At petabyte index
sizes swap `_shingles` verification for the signature-estimated
Jaccard (agreement fraction of the two signatures) and drop the
column — the banding plumbing is unchanged.

The reference's closest surface is sink-boundary idempotence tokens
(/root/reference/pspf/connectors/base.py:32-78); content-level
incremental near-dup admission is beyond-reference charter
(SURVEY §2.7 dedup family).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from python_stream_processing_framework_spark.operators.common import (
    materialize,
    maybe_broadcast,
)
from python_stream_processing_framework_spark.operators.dedup import (
    band_vals_expr,
    minhash_lsh_pairs,
    minhash_signatures,
)
from python_stream_processing_framework_spark.operators.graph import (
    connected_components,
)


def _sigs_path(index_path: str) -> str:
    return f"{index_path}/sigs"


_REHASH = "transform(_shingles, x -> xxhash64(x))"


def _is_legacy_shingles(schema) -> bool:
    """True for the pre-r9 index format (`_shingles` as the shingle
    STRINGS rather than their int64 xxhash64 images)."""
    from pyspark.sql.types import ArrayType, StringType

    for fld in schema.fields:
        if fld.name == "_shingles":
            return isinstance(fld.dataType, ArrayType) and isinstance(
                fld.dataType.elementType, StringType
            )
    return False


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm  # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), jvm, p


def _rename_or_raise(fs, jvm, src: str, dst: str) -> None:
    """Hadoop FileSystem.rename signals failure by returning False,
    not raising — a silent False here would let a migration delete
    its backup and report success while the live partition is absent.
    Surface it instead; the orphan-recovery sweep heals on retry."""
    if not fs.rename(
        jvm.org.apache.hadoop.fs.Path(src), jvm.org.apache.hadoop.fs.Path(dst)
    ):
        raise OSError(f"rename failed: {src} -> {dst}")


def migrate_index(spark: SparkSession, index_path: str) -> int:
    """Durably upgrade a pre-r9 string-shingle index in place;
    returns the number of batch partitions rewritten.

    The int64 image is a pure function of the shingle string —
    exactly ``transform(_shingles, x -> xxhash64(x))``, the same
    expression minhash_signatures applies (operators/dedup.py) — so
    no re-admission is needed. Each legacy ``batch=<tag>`` partition
    is rewritten through a crash-safe four-step dance: (1) write the
    rehashed rows to a hidden ``.migrate-<tag>`` sibling (hidden dirs
    are invisible to Spark's partition discovery, so a half-written
    temp never pollutes a concurrent read), (2) rename the legacy dir
    aside to hidden ``.old-<tag>``, (3) rename the temp into place,
    (4) delete ``.old-<tag>``. A crash after (1) re-runs the
    overwrite; a crash after (2) or (3) is healed by the
    orphan-recovery sweep at the top of this function (a
    ``.migrate-<tag>`` with no ``batch=<tag>`` is a completed rewrite
    awaiting its rename; an ``.old-<tag>`` whose ``batch=<tag>``
    exists again is a finished swap awaiting its cleanup).

    Concurrent readers: a partition is absent from discovery only
    between the two renames of steps (2)-(3) — single-digit
    milliseconds of metadata ops, not the full rewrite (pre-r11 this
    window spanned a recursive delete). It is still not zero: a
    reader that lists at exactly the wrong instant misses that one
    partition, so migrations should run under the index's existing
    single-writer contract with readers quiesced if a complete view
    is required mid-migration. Steady-state reads (no migration in
    flight) are always complete."""
    sigs = _sigs_path(index_path)
    fs, jvm, root = _fs_and_path(spark, sigs)
    if not fs.exists(root):
        return 0
    entries = [st.getPath().getName() for st in fs.listStatus(root)]
    # Orphan recovery: finish any swap a previous migration crashed
    # out of. First land completed rewrites (temp exists, live dir
    # renamed aside or gone) BEFORE touching any .old backup, so no
    # crash point can lose data; then drop backups whose live dir is
    # back in place.
    for name in entries:
        if name.startswith(".migrate-"):
            tag = name[len(".migrate-") :]
            if f"batch={tag}" not in entries:
                _rename_or_raise(fs, jvm, f"{sigs}/{name}", f"{sigs}/batch={tag}")
                entries.append(f"batch={tag}")
    for name in entries:
        if name.startswith(".old-"):
            tag = name[len(".old-") :]
            if f"batch={tag}" in entries:
                fs.delete(jvm.org.apache.hadoop.fs.Path(f"{sigs}/{name}"), True)
    migrated = 0
    for name in entries:
        if not name.startswith("batch="):
            continue
        tag = name[len("batch=") :]
        part_path = f"{sigs}/{name}"
        part = spark.read.parquet(part_path)
        if not _is_legacy_shingles(part.schema):
            continue
        tmp = f"{sigs}/.migrate-{tag}"
        old = f"{sigs}/.old-{tag}"
        part.withColumn("_shingles", F.expr(_REHASH)).write.mode(
            "overwrite"
        ).parquet(tmp)
        # both renames are checked: a False from either would
        # otherwise let the backup delete below destroy the only
        # surviving copy while the live partition is absent
        _rename_or_raise(fs, jvm, part_path, old)
        _rename_or_raise(fs, jvm, tmp, part_path)
        fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)
        migrated += 1
    return migrated


def read_index(spark: SparkSession, index_path: str) -> DataFrame | None:
    """The signature index, or None if no batch was ever admitted.

    Pre-r9 indexes (string `_shingles`) are detected here and
    durably migrated to the int64 image format before the read
    (migrate_index) — without the guard, admission against a legacy
    index dies inside array_intersect with an obscure Catalyst
    type-mismatch, and admitting in the new format alongside legacy
    partitions would leave a mixed-schema index no single parquet
    scan could read. On read-only storage the rewrite fails; fall
    back to an in-memory rehash so pure readers still work (writers
    would fail at their own write anyway)."""
    sigs = _sigs_path(index_path)
    try:
        idx = spark.read.parquet(sigs)
    except AnalysisException:
        return None
    if _is_legacy_shingles(idx.schema):
        try:
            migrate_index(spark, index_path)
            idx = spark.read.parquet(sigs)
        except Exception:  # noqa: BLE001 — read-only storage fallback
            return idx.withColumn("_shingles", F.expr(_REHASH))
    return idx


#: Strict ASCII numeric shapes — the only tags whose int()/float()
#: reading agrees with Spark's partition-value inference. Python's
#: int()/float() also accept underscores ('7_0' == 70) and non-ASCII
#: digit scripts, which Spark never parses as numeric; minting forms
#: from those would exclude an UNRELATED batch's partition (r12
#: ADVICE). Exponent shapes ('1e5') are handled by the TYPED
#: disjunct, not string forms — Java renders them its own way.
_INT_FORM_RE = re.compile(r"[+-]?[0-9]+")
_NUM_FORM_RE = re.compile(r"[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?")


def _tag_forms(batch_tag) -> set[str]:
    """Every string a `batch=<tag>` directory value can surface as
    after partition discovery:

    - the raw tag itself;
    - its int AND double canonical forms when numeric — all-numeric
      dirs infer as int (`batch=007` reads back as 7 → '7'), and a
      MIXED int/float dir set widens the column to double, so the
      same tag also surfaces as '7.0';
    - its Hive-unescaped form — the dirs are written with the raw
      tag in the path, but Spark's partition reader UNESCAPES %XX
      sequences, so a tag like 'a%3Ab' reads back as 'a:b'.

    String forms deliberately do NOT try to reproduce Java's double
    rendering (>= 1e7 surfaces as '1.0E7', not Python's
    '10000000.0'); batch-column matching pairs these forms with the
    typed-value disjunct in :func:`_tag_match_pred`, which compares
    ``cast('double')`` against the numeric value directly so engine
    string formatting never participates (r12 ADVICE)."""
    tag = str(batch_tag)
    forms = {tag}
    if _INT_FORM_RE.fullmatch(tag):
        i = int(tag)
        forms.add(str(i))
        forms.add(str(float(i)))
    elif _NUM_FORM_RE.fullmatch(tag):
        forms.add(str(float(tag)))
    if "%" in tag:
        from urllib.parse import unquote

        forms.add(unquote(tag))
    return forms


def _tag_typed_value(batch_tag) -> float | None:
    """The double Spark's partition inference would read this tag
    as, or None for non-numeric tags. ASCII-gated like _tag_forms."""
    tag = str(batch_tag)
    if _NUM_FORM_RE.fullmatch(tag):
        try:
            return float(tag)
        except ValueError:  # pragma: no cover — regex precludes
            return None
    return None


def _tag_try_double(tag) -> float | None:
    """The double ``try_cast('double')`` would read this tag's column
    value as, or None — the DIR-side mirror of the typed disjunct in
    :func:`_tag_match_pred`. try_cast trims whitespace, so a
    non-canonical tag like ``' 7'`` (dir ``batch= 7``) still reads as
    7.0 on the row side; the dir-side protection check must see the
    same value or compaction deletes a directory whose rows the
    retention predicate kept (r13 ADVICE — retained-from-fold rows in
    a deleted dir are lost). Python ``float`` accepts a superset of
    try_cast's grammar (underscores, 'inf'), which only ever
    OVER-protects a directory — the safe direction: a protected dir
    whose rows also folded yields tolerated duplicates, removed by
    the next compaction."""
    for s in sorted(_tag_forms(tag)):
        try:
            return float(s.strip())
        except ValueError:
            continue
    return None


def _tag_match_pred(tags) -> F.Column:
    """Column predicate: this row's ``batch`` value belongs to one of
    ``tags``. Matches on string surface forms (_tag_forms) OR — for
    ASCII-numeric tags — on the TYPED value via ``cast('double')``,
    which sidesteps engine-vs-Python double formatting entirely
    (Java renders ``cast(1.0E7 as string)`` as '1.0E7'; no Python
    string mint can chase every such shape). The typed disjunct is
    null-coalesced to False: a non-numeric batch value casts to
    null, and a bare ``null == 7.0`` disjunct would turn the whole
    predicate null and make ``~pred`` silently drop OTHER batches'
    rows."""
    col = F.col("batch").cast("string")
    forms: set[str] = set()
    typed: set[float] = set()
    for t in tags:
        forms |= _tag_forms(t)
        v = _tag_typed_value(t)
        if v is not None:
            typed.add(v)
    pred = None
    for f in sorted(forms):
        eq = col == F.lit(f)
        pred = eq if pred is None else (pred | eq)
    for v in sorted(typed):
        # try_cast, not cast: under ANSI mode a plain cast THROWS on
        # the first non-numeric batch value ('zz-compact-...') instead
        # of yielding null; and the null still coalesces to False so
        # ~pred never null-drops other batches' rows
        eq = F.coalesce(
            F.col("batch").try_cast("double") == F.lit(v), F.lit(False)
        )
        pred = eq if pred is None else (pred | eq)
    return pred if pred is not None else F.lit(False)


def exclude_batch_tag(idx: DataFrame, batch_tag) -> DataFrame:
    """Filter OUT the rows of one ``batch=<tag>`` partition — the
    redelivery-exclusion move every persisted index shares (minhash
    sigs, embedding LSH sigs, novelty grams): a retried batch must
    adjudicate against all OTHER batches, never collide with its own
    previous partial write.

    Robust to partition-type inference in BOTH directions: the
    column casts to string (an int-inferred column compared against
    a non-numeric tag would otherwise cast the TAG to null and
    silently drop — or keep — every row), and the tag matches any of
    its inferred surface forms (an int-inferred '007' directory
    reads back as '7', which a one-sided raw-string compare would
    miss, un-excluding the retried batch's own rows) plus the typed
    double value (a double-widened column renders >= 1e7 in Java
    scientific notation that no Python string form matches — r12
    ADVICE). Distinct raw tags that collide post-inference ('007'
    vs '7') are indistinguishable in the column and excluded
    together — don't mint tags that differ only by numeric
    padding."""
    return idx.filter(~_tag_match_pred([batch_tag]))


def _within_batch_survivors(
    pairs: DataFrame, docs: DataFrame, id_col: str
) -> DataFrame:
    """Component-canonical within-batch dedup: keep the min-id member
    of every near-dup component (chains collapse to one survivor).

    The loser anti-join is size-gated (``maybe_broadcast``), not an
    unconditional hint: in streaming the loser set is micro-batch-
    bounded, but a bootstrap admit of a whole crawl as batch 1 makes
    it proportional to the CORPUS duplicate mass — above the cap the
    join stays an exchange join and AQE decides."""
    if pairs.isEmpty():
        return docs
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(edges)  # (node, component=min reachable id)
    losers = maybe_broadcast(
        comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
    )
    return docs.join(losers, id_col, "left_anti")


def minhash_index_admit(
    new_docs: DataFrame,
    index_path: str,
    batch_tag: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Admit a batch against the persisted index; return admitted docs.

    Returns the admitted rows with all their original columns. Side
    effect: admitted signatures land in ``sigs/batch=<batch_tag>``
    (idempotent overwrite per tag — reuse the tag to retry a batch,
    never to admit new data). Docs shorter than ``shingle_k`` tokens
    carry no signature; they are admitted verbatim but not indexed
    (same recall floor as every MinHash path here — pair with exact
    dedup on normalized text where very short docs matter).

    Pins one (id, sig, shingles) frame via materialize() — call
    common.release_caches() once the returned frame is consumed, the
    same contract as minhash_lsh_pairs/minhash_lsh_join.
    """
    spark = new_docs.sparkSession

    # Sign ONCE (r9, the same share-the-signing fix embed_index_admit
    # got): the cached signature frame drives within-batch pair
    # mining, the cross-index stage, and the index write. Reuse for
    # survivors is sound because the within-batch keep rule is the
    # component MIN id, which is always its exact-cluster
    # representative — every survivor has its own signature row.
    sigs_all = minhash_signatures(
        new_docs,
        id_col,
        text_col,
        num_hashes=num_hashes,
        shingle_k=shingle_k,
    )
    # Within-batch: component-canonical near-dup dedup. Star edges
    # span the same components as all-pairs with linearly many rows.
    pairs = minhash_lsh_pairs(
        new_docs,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        max_band_freq=max_band_freq,
        expand="star",
        sigs=sigs_all,
    )
    survivors = _within_batch_survivors(pairs, new_docs, id_col)

    # materialize: four plan branches consume the survivor signatures
    # (band explode, verify fetch, index write, and the admitted
    # anti-join's survivor side) — one cache, evaluated once, exactly
    # like the frame the second signing pass used to produce.
    sigs_new = materialize(
        sigs_all.join(survivors.select(id_col), id_col, "semi").select(
            id_col, "_sig", "_shingles"
        )
    )

    # Cross-index: band join against stored signatures only. The
    # CURRENT tag is excluded (partition-pruned on the `batch` dir
    # column): a retried batch must re-adjudicate against all OTHER
    # batches, not collide with its own previous partial write —
    # without this, doc i near-matches its own indexed copy at
    # jaccard 1.0 and a retry admits nothing.
    idx = read_index(spark, index_path)
    if idx is not None:
        idx = exclude_batch_tag(idx, batch_tag)
    if idx is not None:
        band_vals = band_vals_expr(num_hashes, bands)
        bn = sigs_new.select(
            F.col(id_col).alias("id_new"),
            F.posexplode(band_vals).alias("band_idx", "band_val"),
        )
        bi = idx.select(
            F.col(id_col).alias("id_idx"),
            F.posexplode(band_vals).alias("band_idx", "band_val"),
        )
        if max_band_freq is not None:
            from python_stream_processing_framework_spark.operators.dedup import (
                _cap_band_buckets,
            )

            bi = _cap_band_buckets(bi, max_band_freq)
        cand = (
            bn.join(bi, ["band_idx", "band_val"]).select("id_new", "id_idx").distinct()
        )
        sh_new = sigs_new.select(
            F.col(id_col).alias("id_new"), F.col("_shingles").alias("_sh_new")
        )
        sh_idx = idx.select(
            F.col(id_col).alias("id_idx"), F.col("_shingles").alias("_sh_idx")
        )
        # materialize(): the drop list is bounded (new-batch ids) and
        # pinning it completes the index scan BEFORE the overwrite of
        # this batch's own partition starts the write job below.
        dropped = materialize(
            cand.join(sh_new, "id_new")
            .join(sh_idx, "id_idx")
            .withColumn(
                "n_common",
                F.size(F.array_intersect("_sh_new", "_sh_idx")).cast("bigint"),
            )
            .withColumn(
                "n_union",
                (F.size("_sh_new") + F.size("_sh_idx")).cast("bigint")
                - F.col("n_common"),
            )
            .filter(
                F.col("n_common").cast("double") / F.col("n_union")
                >= F.lit(threshold)
            )
            .select(F.col("id_new").alias(id_col))
            .distinct()
        )
        admitted = survivors.join(dropped, id_col, "left_anti")
        sigs_admitted = sigs_new.join(dropped, id_col, "left_anti")
    else:
        admitted = survivors
        sigs_admitted = sigs_new

    sigs_admitted.write.mode("overwrite").parquet(
        f"{_sigs_path(index_path)}/batch={batch_tag}"
    )
    return admitted


_COMPACT_PREFIX = "zz-compact-"


def compact_partitions(
    spark: SparkSession,
    root: str,
    *,
    target_files: int = 8,
    retain_tags: tuple[str, ...] | list[str] = (),
) -> str | None:
    """Layout-parametric compactor for any ``<root>/batch=<tag>``
    parquet index (r12): fold every non-retained batch partition into
    one consolidated ``batch=zz-compact-<generation>`` partition of
    ``target_files`` files (full-row dropDuplicates — crash-replay
    copies collapse, legitimately distinct rows both survive), then
    delete the source directories. Previous compact generations fold
    in too, so repeated compaction never accumulates.

    This is the shared engine behind :func:`compact_index` (the
    ``sigs/`` MinHash + embedding signature indexes) and
    ``operators/text.compact_novelty_grams`` (the ``grams/`` novelty
    index) — every persisted per-micro-batch index here has the same
    lifecycle problem (one directory per batch = 10^4 listings after
    10^4 batches) and the same retry discipline (a tag that may
    still be REDELIVERED must be passed in ``retain_tags``: its rows
    must stay excludable via ``batch != tag``, which folding would
    destroy).

    Crash-safe by write-then-delete: a failure between the
    consolidated write and the source deletes leaves duplicate rows,
    which every consumer tolerates (admission distinct's candidate
    pairs; novelty scoring anti-joins the seen set — duplicates are
    idempotent in both) and the next compaction removes.

    Returns the new compact tag, or None when there was nothing to
    compact (no index, or <= 1 non-retained partition)."""
    try:
        idx = spark.read.parquet(root)
    except AnalysisException:
        return None
    # Work from the RAW directory names, not the partition column:
    # type inference surfaces numeric-looking tags as int/double
    # (batch=007 reads back as 7), so inferred values can neither
    # match retain_tags reliably nor reconstruct delete paths. A
    # retained tag protects every raw dir sharing any of its
    # inferred surface forms (_tag_forms — '007' protects '7' too;
    # post-inference the column cannot tell them apart anyway).
    jvm = spark._jvm  # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    root_path = jvm.org.apache.hadoop.fs.Path(root)
    fs = root_path.getFileSystem(hconf)
    raw_dirs = sorted(
        st.getPath().getName()[len("batch=") :]
        for st in fs.listStatus(root_path)
        if st.isDirectory() and st.getPath().getName().startswith("batch=")
    )
    retained_forms: set[str] = set()
    retained_typed: set[float] = set()
    for t in retain_tags:
        retained_forms |= _tag_forms(t)
        v = _tag_typed_value(t)
        if v is not None:
            retained_typed.add(v)
    # Dir protection must be a SUPERSET of row retention
    # (_tag_match_pred over retain_tags): a dir whose rows the
    # retention predicate keeps but whose name the string-form check
    # misses (try_cast trims whitespace — dir 'batch= 7' vs retained
    # '7') would be deleted WITH its retained-from-fold rows. Mirror
    # the typed disjunct on the dir name; over-protection is safe
    # (duplicates fold next compaction), under-protection loses rows.
    to_compact = [
        d
        for d in raw_dirs
        if not (_tag_forms(d) & retained_forms)
        and not (
            retained_typed and _tag_try_double(d) in retained_typed
        )
    ]
    if len(to_compact) <= 1:
        return None
    gen = 0
    for t in raw_dirs:
        if t.startswith(_COMPACT_PREFIX):
            try:
                gen = max(gen, int(t[len(_COMPACT_PREFIX) :]))
            except ValueError:
                pass
    new_tag = f"{_COMPACT_PREFIX}{gen + 1:08d}"
    # Select rows to fold by COMPLEMENT of the retained tags, never
    # by isin(compact_forms): the source directories are deleted
    # unconditionally below, so a batch value whose engine rendering
    # no Python surface form anticipates (Java scientific notation —
    # cast(1.0E7 as string) = '1.0E7') must FOLD rather than vanish
    # (r12 ADVICE: the positive-list select silently lost such
    # rows). Every row is either retained (its dir survives) or
    # folded (its dir is deleted); the complement makes that a
    # partition of the index by construction.
    rows = idx.filter(~_tag_match_pred(retain_tags)).drop("batch")
    rows.dropDuplicates().coalesce(max(1, target_files)).write.mode(
        "overwrite"
    ).parquet(f"{root}/batch={new_tag}")
    # sources go only AFTER the consolidated partition is durable;
    # raw names make these paths exact, so a False return here is a
    # real failure worth surfacing rather than a silent leftover
    for t in to_compact:
        p = jvm.org.apache.hadoop.fs.Path(f"{root}/batch={t}")
        if not p.getFileSystem(hconf).delete(p, True):
            raise OSError(f"compact_partitions: failed to delete {p}")
    return new_tag


def compact_index(
    spark: SparkSession,
    index_path: str,
    *,
    id_col: str = "doc_id",
    target_files: int = 8,
    retain_tags: tuple[str, ...] | list[str] = (),
) -> str | None:
    """Fold the per-batch ``sigs/batch=<tag>`` directories into one.

    ``id_col`` is accepted for call-site compatibility but no longer
    steers deduplication: since r9 compaction dedups on the FULL row
    (see the crash-safety paragraph below for why).

    Every ``minhash_index_admit`` call appends one parquet directory;
    after 10^4 micro-batches the index is 10^4 directories and every
    cross-index read pays their listing + small-file cost. Compaction
    rewrites all batch partitions — except ``retain_tags`` — into a
    single consolidated ``batch=zz-compact-<generation>`` partition of
    ``target_files`` files, then deletes the source directories.
    Previous compact generations are folded in too, so repeated
    compaction never accumulates.

    Admission equivalence (pinned in tests/test_dedup_index.py): the
    admit decision reads the index as one signature set and only
    excludes rows via ``batch != batch_tag``, so moving rows between
    partitions changes nothing — as long as a tag that may still be
    RETRIED is never folded in (its rows would stop being excluded
    and the retry would collide with its own earlier write, admitting
    nothing). That is the retention rule: pass every tag that is not
    yet durably complete (for ``Stream.dedupe_near``, the current and
    any in-flight micro-batch tags) in ``retain_tags``.

    Crash-safe by write-then-delete: a failure between the
    consolidated write and the source deletes leaves duplicate rows,
    which admission tolerates (candidate pairs are distinct'd; a doc
    matching two copies of the same indexed doc drops the same doc)
    and the next compaction removes (rows are dropDuplicates'd on
    the FULL row, not just ``id_col``: crash-replay duplicates are
    bit-identical and collapse to one, while an id legitimately
    re-admitted across crawls with DIFFERENT content keeps both
    signatures — future admissions then match either version, which
    strengthens the invariant instead of silently discarding an
    arbitrary one).

    Returns the new compact tag, or None when there was nothing to
    compact (no index, or <= 1 non-retained partition).
    """
    # read_index first: its side effect durably migrates a pre-r9
    # string-shingle index before the raw read compaction folds
    if read_index(spark, index_path) is None:
        return None
    return compact_partitions(
        spark,
        _sigs_path(index_path),
        target_files=target_files,
        retain_tags=retain_tags,
    )
