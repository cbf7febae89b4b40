"""Text-analysis operators for training-data pipelines.

Beyond-reference capability (SURVEY §2.7): token statistics, quality
scoring, heuristic language ID, and rolling-hash document
fingerprinting. All pure column expressions (whole-stage codegen,
map-only, no shuffle) — the right shape for a 100 TB corpus pass.
Heavier NLP (real tokenizers, model-based langid) belongs in an
Arrow-batched pandas UDF; these heuristics are the JVM-fast tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.dedup import tokens_expr

#: Default stopword list for the quality heuristic (tiny on purpose —
#: a ratio feature, not linguistics).
STOPWORDS = ("the", "a", "of", "and", "to")

#: Marker tokens per language for the n-gram/keyword language-ID
#: heuristic. Order = tie-break priority.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de5", "shi4", "le5", "zai4"),
}


def _count_in(toks_col: str, words: tuple[str, ...]) -> Column:
    quoted = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter({toks_col}, t -> t IN ({quoted})))"
    ).cast("bigint")


def quality_stats(
    df: DataFrame, id_col: str, text_col: str, token_estimates: bool = False
) -> DataFrame:
    """Per-document token/quality statistics.

    Output: id, n_tokens, n_distinct, type_token_ratio, stopword_ratio,
    chars_per_token, quality_score (deterministic linear blend). The
    score formula is arbitrary but fixed; what matters is that every
    term is exact integer arithmetic divided once at the end, so any
    engine reproduces it bit-for-bit.

    With ``token_estimates=True`` also emits token-budget columns for
    pipeline sizing: est_bpe_tokens = ceil(chars/4) (subword tokenizers
    average ~4 chars/token on English) and est_tokens =
    max(whitespace words, bpe estimate) — an upper bound for batch
    budgeting. A real tokenizer slots in as an Arrow pandas UDF.
    """
    est_cols = []
    if token_estimates:
        n_words = F.size(F.split(F.trim(F.col(text_col)), " ")).cast("bigint")
        est_bpe = F.expr(f"(length({text_col}) + 3) DIV 4")
        est_cols = [
            est_bpe.alias("est_bpe_tokens"),
            F.greatest(n_words, est_bpe).alias("est_tokens"),
        ]
    out = (
        df.withColumn("_toks", tokens_expr(text_col))
        .filter(F.size("_toks") >= 1)
        .select(
            F.col(id_col),
            F.size("_toks").cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct("_toks")).cast("bigint").alias("n_distinct"),
            _count_in("_toks", STOPWORDS).alias("n_stop"),
            F.length(F.trim(F.col(text_col))).cast("bigint").alias("n_chars_trim"),
            *est_cols,
        )
        .withColumn(
            "type_token_ratio", F.col("n_distinct").cast("double") / F.col("n_tokens")
        )
        .withColumn(
            "stopword_ratio", F.col("n_stop").cast("double") / F.col("n_tokens")
        )
        .withColumn(
            # single-space-separated text: chars = sum(len) + (n-1)
            "chars_per_token",
            (F.col("n_chars_trim") - (F.col("n_tokens") - F.lit(1))).cast("double")
            / F.col("n_tokens"),
        )
    )
    score = (
        out["type_token_ratio"] * F.lit(0.5)
        + (F.lit(1.0) - out["stopword_ratio"]) * F.lit(0.3)
        + F.least(out["n_tokens"], F.lit(100)).cast("double") / F.lit(100.0) * F.lit(0.2)
    )
    return out.withColumn("quality_score", score)


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID from marker-token counts.

    Output: id, one marker-count column per language, pred_lang.
    Prediction = argmax count with fixed priority order on ties —
    a deterministic CASE chain, identical in any SQL engine.
    """
    out = df.withColumn("_toks", tokens_expr(text_col)).select(
        F.col(id_col),
        *[
            _count_in("_toks", words).alias(f"n_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    langs = list(LANG_MARKERS)
    pred = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1 :]:
            c = F.col(f"n_{lang}") >= F.col(f"n_{other}")
            cond = c if cond is None else (cond & c)
        pred = (
            F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
        )
    pred = pred.otherwise(F.lit(langs[-1]))
    return out.withColumn("pred_lang", pred)


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality rules).

    Repetitive documents (boilerplate, keyword stuffing, decoding
    loops) are the classic low-quality signal a corpus filter removes.
    Per doc with >= 2 tokens:
    - ``dup_word_frac``: fraction of tokens that repeat an earlier one.
    - ``top_bigram_frac``: share of all (overlapping, order-preserving)
      word bigrams taken by the single most frequent bigram.
    - ``max_run``: longest run of consecutive identical tokens, via a
      sequential struct fold (order-sensitive, left-to-right).

    All row-local column expressions — map-only, no shuffle, codegen.
    The top-bigram count is O(distinct * n) per row (nested filter),
    fine for document-sized rows; a corpus-wide n-gram table would be
    the explode+groupBy shape instead.
    """
    bigrams = F.expr(
        "transform(sequence(1, size(_toks) - 1),"
        " i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))"
    )
    top_bigram = F.expr(
        "array_max(transform(array_distinct(_bi), x -> size(filter(_bi, y -> y = x))))"
    )
    max_run = F.expr(
        "aggregate(_toks,"
        " named_struct('prev', '', 'run', cast(0 as bigint), 'best', cast(0 as bigint)),"
        " (acc, t) -> named_struct("
        "   'prev', t,"
        "   'run', IF(t = acc.prev, acc.run + 1, cast(1 as bigint)),"
        "   'best', greatest(acc.best, IF(t = acc.prev, acc.run + 1, cast(1 as bigint)))),"
        " acc -> acc.best)"
    )
    return (
        df.withColumn("_toks", tokens_expr(text_col))
        .filter(F.size("_toks") >= 2)
        .withColumn("_bi", bigrams)
        .select(
            F.col(id_col),
            F.size("_toks").cast("bigint").alias("n_tokens"),
            (
                (F.size("_toks") - F.size(F.array_distinct("_toks"))).cast("double")
                / F.size("_toks")
            ).alias("dup_word_frac"),
            (top_bigram.cast("double") / F.size("_bi")).alias("top_bigram_frac"),
            max_run.alias("max_run"),
        )
    )


def fingerprint(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    base: int = 131,
    modulus: int = 2_147_483_647,
    token_mod: int = 1_000_003,
) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint.

    Polynomial rolling hash over the token stream:
    ``h = (h * base + md5_28(token) % token_mod) % modulus`` — a
    sequential left-fold, so token ORDER matters (unlike the set-based
    dedup hashes). Bounds: acc < 2^31, base=131 → products < 2^39,
    safely inside int64 in any engine. Map-only, codegen'd.
    """
    fold = F.expr(
        f"aggregate(_toks, cast(0 as bigint), (acc, t) -> "
        f"(acc * {base} + cast(conv(substr(md5(t), 1, 7), 16, 10) as bigint) % {token_mod})"
        f" % {modulus})"
    )
    return (
        df.withColumn("_toks", tokens_expr(text_col))
        .withColumn("fingerprint", fold)
        .drop("_toks")
    )
