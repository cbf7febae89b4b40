"""Additional oracle-checked coverage: char-ngram dedup, unpivot,
histogram bucketing, date rollups, string functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.functions.exact import cents_sum, money
from python_stream_processing_framework_spark.queries.base import query


@query(
    "char_ngram_jaccard",
    """
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, length(t) - 2),
                                          i -> substr(t, i, 4))) AS sh
      FROM (SELECT doc_id, trim(lower(text)) AS t FROM documents) x
      WHERE length(t) >= 4),
    inv0 AS (SELECT doc_id, unnest(sh) AS sh FROM d),
    rare AS (SELECT sh FROM inv0 GROUP BY sh HAVING count(*) <= 100),
    inv AS (SELECT inv0.doc_id, inv0.sh FROM inv0 JOIN rare USING (sh)),
    sz AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY doc_id),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(x.n + y.n - n_common AS BIGINT) AS n_union,
           CAST(n_common AS DOUBLE)/(x.n + y.n - n_common) AS jaccard
    FROM c JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE)/(x.n + y.n - n_common) >= 0.9
    """,
    doc="Character 4-gram Jaccard >= 0.9 over rare shingles (doc-freq "
    "<= 100): common 4-grams ('the ', ' and') hit nearly every doc and "
    "turn the inverted-index join quadratic — the frequency cap is the "
    "standard web-dedup mitigation, mirrored exactly in the oracle.",
)
def char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    (documents,) = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        documents,
        "doc_id",
        "text",
        shingle_k=4,
        unit="char",
        threshold=0.9,
        max_doc_freq=100,
    )


@query(
    "events_unpivot",
    """
    WITH p AS (
      SELECT user_id,
        CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
      FROM events GROUP BY user_id)
    SELECT user_id, 'click' AS kind, click AS n FROM p
    UNION ALL
    SELECT user_id, 'purchase' AS kind, purchase AS n FROM p
    """,
    doc="Unpivot (stack): wide per-type counts back to long form.",
)
def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "purchase"])
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            F.coalesce(F.col("click"), F.lit(0)).cast("bigint").alias("click"),
            F.coalesce(F.col("purchase"), F.lit(0)).cast("bigint").alias("purchase"),
        )
    )
    return wide.selectExpr(
        "user_id", "stack(2, 'click', click, 'purchase', purchase) AS (kind, n)"
    )


_BUCKET = (
    "CASE WHEN value < 0 THEN 0 WHEN value >= 200 THEN 9 "
    "ELSE CAST(floor(value/25.0) AS BIGINT) + 1 END"
)


@query(
    "value_histogram",
    f"""
    SELECT event_type,
           CAST({_BUCKET} AS BIGINT) AS bucket,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="Equi-width histogram (8 buckets on [0,200), under/overflow "
    "buckets 0 and 9 — width_bucket semantics, written portably).",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy(
        "event_type",
        F.expr(_BUCKET).cast("bigint").alias("bucket"),
    ).agg(F.count("*").alias("n"))


@query(
    "orders_by_month",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0
             AS total_value
    FROM orders GROUP BY 1, 2
    """,
    doc="Calendar rollup: date-part extraction + grouped exact sums.",
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
    ).agg(
        F.count("*").alias("n_orders"),
        money(cents_sum("o_totalprice")).alias("total_value"),
    )


@query(
    "token_count_estimate",
    """
    SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST((length(text) + 3) // 4 AS BIGINT) AS est_bpe_tokens,
           CAST(greatest(len(string_split(trim(text), ' ')),
                         (length(text) + 3) // 4) AS BIGINT)
             AS est_tokens
    FROM documents
    """,
    doc="Token counting for pipeline budgeting: whitespace words + the "
    "chars/4 BPE heuristic (subword tokenizers average ~4 chars/token "
    "on English text); est_tokens = max of the two bounds. A real "
    "tokenizer slots in as an Arrow pandas UDF.",
)
def token_count_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    est_bpe = F.expr("(length(text) + 3) DIV 4")
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        est_bpe.alias("est_bpe_tokens"),
        F.greatest(n_words, est_bpe).alias("est_tokens"),
    )


@query(
    "part_brand_stats",
    """
    SELECT p_brand,
           count(*) AS n_parts,
           CAST(sum(length(p_name)) AS BIGINT) AS total_name_chars,
           CAST(count(DISTINCT string_split(p_name, ' ')[1]) AS BIGINT)
             AS n_first_words,
           min(upper(p_type)) AS first_type_upper
    FROM part GROUP BY p_brand
    """,
    doc="String-function surface: length/split/upper + distinct count "
    "over derived strings.",
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = load(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.sum(F.length("p_name")).alias("total_name_chars"),
        F.countDistinct(F.split(F.col("p_name"), " ")[0]).alias("n_first_words"),
        F.min(F.upper("p_type")).alias("first_type_upper"),
    )
