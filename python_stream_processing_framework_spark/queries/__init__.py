"""Query catalog: every implemented operator exposed as a named query.

Each entry pairs a Spark implementation (`(spark, sf_dir) -> DataFrame`)
with an ANSI-SQL oracle string executable by DuckDB over the same
parquet tables. Column names and value determinism are contract: see
functions/exact.py for why aggregates over doubles go through integer
cents, and functions/hashing.py for the engine-portable hashes.

Driver-row curation: the round driver records CORRECTNESS rows for the
FIRST 50 registrations (insertion order). The registry holds
len(QUERY_REGISTRY) queries (88 as of r10), so the queries whose
verified surfaces are multiply pinned by other in-cap rows and by the
in-repo oracle-parity suite (tests/test_oracle_parity.py runs the
IDENTICAL exact-DuckDB comparison over ALL entries) are deliberately
ordered last — see OUTSIDE_DRIVER_CAP below and COVERAGE.md "Catalog
totals" for the per-query rationale.
"""

from __future__ import annotations

from python_stream_processing_framework_spark.queries.base import QUERY_REGISTRY, QuerySpec

# Importing the modules registers their queries.
from python_stream_processing_framework_spark.queries import (  # noqa: F401, E402
    relational,
    windows,
    dedup,
    similarity,
    text,
    advanced,
    sql_surface,
    extras,
    sampling,
    pq,
    packing,
    mixture,
    retrieval,
    bpe,
    lm,
    spans,
    semdedup,
    dsir,
    paragraphs,
    ccnet,
    html,
    urls,
    sketch,
    lines,
    graphq,
    funnelq,
    cdcq,
    setsimq,
    zorderq,
    robustq,
)

#: The driver's CORRECTNESS file caps at 50 rows taken in registration
#: order. These queries are curated OUTSIDE the cap: each one's
#: verified surface is also pinned by an in-cap row (rationale in
#: COVERAGE.md "Catalog totals"), and every one still gets the same
#: exact DuckDB value-hash comparison via tests/test_oracle_parity.py.
#:
#: ROTATION POLICY (frozen r10): a query may be moved into
#: OUTSIDE_DRIVER_CAP only after it has held at least one GREEN row
#: in some external CORRECTNESS_r*.json. New queries therefore always
#: enter INSIDE the cap and stay there for >=1 round before they can
#: earn an outside slot; rotating a never-driver-checked query out is
#: a policy violation. Enforced by
#: tests/test_oracle_parity.py::test_rotation_policy_no_blind_spots,
#: which reads every CORRECTNESS_r*.json at the repo root and asserts
#: every name absent from all of them sits inside the cap.
OUTSIDE_DRIVER_CAP: tuple[str, ...] = (
    # machinery rides the n-gram set-hash pair join shape pinned by
    # ngram_decontaminate's and setsim_pairs' driver rows (word-gram
    # variant rotated out r9 after 8 straight green rounds)
    "char_ngram_jaccard",
    # exact cosine top-k is the back half of pooled_retrieval's chain
    "cosine_topk",
    # overlaps semdedup_prune + cosine_lsh_pairs + dedup_components
    "dedup_semantic",
    # full Lloyd k-means is replayed bit-exact inside semdedup_prune
    "kmeans_clusters",
    # PQ train/encode/ADC machinery is inside ann_ivfpq_topk
    "pq_adc_topk",
    # the mining phase of boilerplate_removal (mine -> remove)
    "frequent_ngrams",
    # the front half of pooled_retrieval's chunk->pool->retrieve chain
    "doc_chunks",
    # md5-hash split pinned by stratified_sample_docs and
    # ngram_decontaminate's 95/5 held-out split
    "split_summary",
    # map-only regex token counting; token-budget columns driver-pinned
    # in text_quality, learned-vocab counting in bpe_token_counts
    "token_counts",
    # regex capture extraction pinned by pii_redaction's battery
    "url_domains",
    # int8-quantized scoring pinned by ann_ivfpq_topk's ADC path,
    # TakeOrdered top-k by pooled_retrieval
    "int8_mips_topk",
    # IVF coarse quantize + cell-probe prune is the front half of
    # ann_ivfpq_topk (r7 rotation making room for lm_backoff_scores)
    "ann_ivf_topk",
    # array-HOF fold machinery pinned by bm25_topk's sorted-fold
    # scoring; the map-only single-scan text-stats shape by
    # text_quality/gopher_rules/lang_id (r7 rotation making room
    # for dsir_select)
    "repetition_stats",
    # sign-bit pigeonhole band-bucket pair generation is pinned by
    # cosine_lsh_pairs (the embedding-side sign-LSH), text n-gram
    # hashing by ngram_jaccard_pairs (r7 rotation making room for
    # paragraph_dedup, the CCNet paragraph pass)
    "simhash_pairs",
    # the F.window tumbling aggregation path is the slide=width
    # degenerate case of sliding_window_stats, and late_data_counts
    # builds its tumbling windows + late split on the same machinery
    # (r7 rotation making room for ccnet_buckets)
    "tumbling_window_sum",
    # EXISTS/IN semi-join machinery is pinned by corpus_decontaminate
    # and ngram_decontaminate's broadcast anti/semi-joins, the
    # orders-side join+agg SQL surface by region_revenue and
    # top_orders_per_customer (r7 rotation making room for
    # html_extract)
    "order_priority_semi",
    # the exact-hash dedup core runs inside dedup_minhash_lsh
    # (collapse_exact_dups) and corpus_decontaminate's composed
    # dedup->components->decontaminate chain; url_dedup exercises the
    # same groupBy-min keep-first shape (r7 rotation making room for
    # url_dedup)
    "dedup_exact",
    # TPC-H Q3's join+agg+TakeOrdered shapes are each pinned
    # elsewhere: the dim-broadcast join chain by region_revenue, the
    # per-key agg + top-k cut by top_orders_per_customer and
    # pricing_summary (r7 rotation making room for cm_heavy_hitters)
    "shipping_priority",
    # the from_json/get_json_object parsing surface is pinned by the
    # schema-registry corrupt-capture tests (tests/test_schema_sources
    # .py) and the events-table agg shape by sliding_window_stats /
    # late_data_counts driver rows (r7 rotation making room for
    # line_corrections)
    "events_json_agg",
    # map-only marker-count scan: the single-scan text-stats shape is
    # pinned by text_quality and gopher_rules driver rows, the
    # argmax-CASE tie chain by the lang_id unit tests (r7 rotation
    # making room for pagerank_hosts)
    "lang_id",
    # the sequence-scaffold + last-observation window-fill machinery
    # is the same union + window-fill shape asof_click_attribution
    # pins with a driver row; gapfill's own semantics stay covered by
    # tests/test_operators.py (r7 rotation making room for
    # funnel_conversion)
    "gapfill_locf",
    # signature-building machinery pinned by dedup_minhash_lsh's
    # driver row (minhash signatures) and the dedup-family unit
    # tests; md5 hash parity by test_portable_hash_helpers (r7
    # rotation making room for retention_weekly)
    "doc_fingerprints",
    # per-key rank/top-k-cut machinery pinned by pricing_summary
    # (agg surface), running_total (window surface), and
    # pooled_retrieval's TakeOrdered row; the join chain by
    # region_revenue (r7 rotation making room for setsim_pairs'
    # brute-force-oracled exact-join row)
    "top_orders_per_customer",
    # the exact-quota two-phase selection machinery runs inside
    # temperature_mixture's driver row (tau-scaled weights feed the
    # IDENTICAL quota plan + hash-ranked selection); membership is
    # additionally property-tested against a direct reference
    # (r7 rotation making room for bloom_decontaminate's join-free
    # bitmask row)
    "domain_mixture",
    # ---- r9 rotation: the 9 never-driver-checked queries (r8 verdict
    # #4: bpe_encode_pieces, canonical_docs, cdc_dup_stats,
    # embedding_outliers, hard_negatives, tfidf_topk, triangle_hosts,
    # weighted_sample_docs, zorder_cells) move INSIDE the cap for an
    # external driver check, plus the new mad_anomalies row. The 10
    # rows below made room — every one held green driver rows for
    # multiple consecutive rounds (r1/r2 through r8, none ever
    # regressed) and keeps the identical exact-DuckDB comparison in
    # tests/test_oracle_parity.py.
    #
    # TPC-H Q1 exact-cents agg surface: pinned by rollup_lineitem's
    # in-cap row (same cents discipline, superset grouping sets) and
    # 8 straight green driver rounds
    "pricing_summary",
    # dim-broadcast join chain + exact-cents agg: pinned by
    # range_join_incidents/asof in-cap join rows and shipping_priority
    # parity; 8 straight green driver rounds
    "region_revenue",
    # per-key cumulative window surface: pinned by
    # sliding_window_stats' in-cap window row and the Stream.fold
    # restart tests; 8 straight green driver rounds
    "running_total",
    # sign-LSH band/verify machinery: pinned IN-CAP this round by
    # hard_negatives (pure composition over cosine_lsh_pairs) and by
    # semdedup_prune + ann_ivfpq_topk's embedding-side rows
    "cosine_lsh_pairs",
    # label-propagation components: pinned IN-CAP this round by
    # canonical_docs (LSH->components->keep-best) and by
    # dedup_minhash_lsh's component-canonical collapse
    "dedup_components",
    # md5-split hash membership: pinned IN-CAP this round by
    # weighted_sample_docs (same unit-hash) and by
    # ngram_decontaminate's 95/5 held-out split
    "stratified_sample_docs",
    # word-gram set-hash pair join: pinned by setsim_pairs (exact
    # set-similarity join, in-cap) and char_ngram_jaccard parity
    "ngram_jaccard_pairs",
    # HLL approx-distinct surface: pinned by cm_heavy_hitters' in-cap
    # sketch row; stable since r1
    "approx_distinct_users",
    # map-only single-scan text-stat battery: pinned by text_quality
    # and quality_classifier in-cap rows; stable since r2
    "gopher_rules",
    # mine->remove frequent-ngram chain: mining pinned by
    # frequent_ngrams parity, paragraph-level removal by
    # paragraph_dedup's in-cap row
    "boilerplate_removal",
    # ---- r10 rotation (policy-compliant: green driver rows r2-r9).
    # binarize/encode + octet_length metadata surface now pinned
    # IN-CAP by image_meta (same encode/octet_length discipline on
    # the unknown path, plus real PNG/JPEG header parsing) — makes
    # room for image_meta, which enters in-cap per the rotation
    # policy above
    "binary_meta",
    # gram-hash/island-merge/rebuild machinery now pinned IN-CAP by
    # span_dedup_keep_first (identical pipeline, stricter keep-first
    # flag rule); repeated_span_mask held green driver rows r5-r9 —
    # makes room for the new query per the rotation policy
    "repeated_span_mask",
    # groupBy-min keep-first shape pinned in-cap by canonical_docs
    # (keep-best per cluster) and paragraph_dedup; url
    # canonicalization by unit tests + url_domains parity. Green
    # driver rows r7-r9 — makes room for semantic_decontaminate
    "url_dedup",
    # CCNet line-wise correction machinery: the line-split/rejoin
    # shape is pinned in-cap by paragraph_dedup and the text-battery
    # rows; green driver rows r7-r9 — makes room for audio_meta,
    # completing the multimodal trio's driver coverage
    "line_corrections",
)

DRIVER_CAP = 50


def _curate(registry: dict[str, QuerySpec]) -> None:
    """Reorder the registry so every query NOT in OUTSIDE_DRIVER_CAP
    sits inside the driver's 50-row cap (insertion order is the
    driver's selection order)."""
    missing = [n for n in OUTSIDE_DRIVER_CAP if n not in registry]
    if missing:
        raise RuntimeError(f"OUTSIDE_DRIVER_CAP names unknown queries: {missing}")
    inside = {k: v for k, v in registry.items() if k not in OUTSIDE_DRIVER_CAP}
    if len(inside) > DRIVER_CAP:
        raise RuntimeError(
            f"{len(inside)} queries inside the {DRIVER_CAP}-row driver cap; "
            "move overflow into OUTSIDE_DRIVER_CAP with a rationale"
        )
    ordered = dict(inside)
    for name in OUTSIDE_DRIVER_CAP:
        ordered[name] = registry[name]
    registry.clear()
    registry.update(ordered)


_curate(QUERY_REGISTRY)

__all__ = ["QUERY_REGISTRY", "QuerySpec", "OUTSIDE_DRIVER_CAP", "DRIVER_CAP"]
