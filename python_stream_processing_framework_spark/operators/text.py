"""Text-analysis operators for training-data pipelines.

Beyond-reference capability (SURVEY §2.7): token statistics, quality
scoring, heuristic language ID, and rolling-hash document
fingerprinting. All pure column expressions (whole-stage codegen,
map-only, no shuffle) — the right shape for a 100 TB corpus pass.
Heavier NLP (real tokenizers, model-based langid) belongs in an
Arrow-batched pandas UDF; these heuristics are the JVM-fast tier.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.dedup import (
    shingles_expr,
    tokens_expr,
)

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


#: PII patterns, applied/counted in this fixed order. Written in the
#: common Java-regex / RE2 subset (no lookaround, no backreferences)
#: so Spark (java.util.regex) and any RE2 engine (DuckDB, Go) match
#: the same spans — which is what makes the driver oracle exact.
#: Email before ipv4/phone: digits inside a matched email's host
#: (a@555-123-4567.example.com) must not re-match as phone/IP spans.
#: (An all-numeric host like a.b@203.0.113.7 is NOT an email under
#: the letters-TLD rule — its IP still redacts, by design.)
#: ipv6 (full uncompressed 8-group form — `::` compression needs
#: alternation bushes that stop being obviously identical across
#: engines; compressed forms are a documented recall gap) sits before
#: ipv4 for order hygiene, though their alphabets can't overlap (the
#: full form has no dots).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv6", r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
)

#: Credit-card CANDIDATE spans (16 digits in 4-groups, one optional
#: separator each — the dominant written form). A candidate only
#: counts/redacts if it passes the Luhn checksum (`_luhn_ok`), which
#: is what keeps 16-digit order numbers and the like out of the
#: redaction — the standard false-positive gate. Handled outside
#: PII_PATTERNS because the Luhn gate needs per-match logic
#: (extract-all -> filter -> literal-replace fold), not a bare
#: regexp_replace; the 3-3-4 phone pattern and the 4-4-4-4 groups
#: here cannot match the same span, so order between them is moot.
CCARD_PATTERN = r"\b\d{4}[-. ]?\d{4}[-. ]?\d{4}[-. ]?\d{4}\b"


def _luhn_ok(card: Column) -> Column:
    """Luhn checksum over a candidate card string (separators allowed)
    as a pure column expression: strip separators, walk the digits
    right-to-left doubling every second one (9-fold the carries), and
    accept when the sum is a multiple of 10. Sequential index fold —
    the DuckDB oracle mirrors it with the same range/substr/CASE
    arithmetic, so the accept set is engine-identical."""
    d = F.regexp_replace(card, "[-. ]", "")
    rev = F.reverse(d)

    def step(acc: Column, i: Column) -> Column:
        x = rev.substr(i, F.lit(1)).cast("int")
        dbl = x * 2
        return acc + F.when(
            i % 2 == 0, F.when(dbl > 9, dbl - 9).otherwise(dbl)
        ).otherwise(x)

    total = F.aggregate(F.sequence(F.lit(1), F.length(d)), F.lit(0), step)
    return total % 10 == 0


def pii_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document PII occurrence counts (email / ipv6 / ipv4 /
    phone / Luhn-valid credit card).

    Output: id, n_email, n_ipv6, n_ipv4, n_phone, n_ccard, n_pii
    (plus any `keep_cols`, carried through so a downstream
    `redact_pii` can chain onto the SAME projection instead of
    re-joining on the id — one map-only select, no shuffle). Counts
    are independent per pattern ON THE ORIGINAL TEXT (no masking
    between categories — that is `redact_pii`'s job, where order
    matters); n_ccard counts only candidates that pass the Luhn gate.
    Pure column expressions (regexp_count + an extract/filter fold
    for the card check): map-only, codegen'd, no shuffle — the shape
    of a 100 TB scrubbing pre-pass that decides which documents need
    the (more expensive) redaction write at all.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    n_ccard = (
        F.size(
            F.filter(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(CCARD_PATTERN), F.lit(0)
                ),
                _luhn_ok,
            )
        )
        .cast("bigint")
        .alias("n_ccard")
    )
    out = df.select(
        F.col(id_col), *counts, n_ccard, *[F.col(c) for c in keep_cols]
    )
    total = F.col("n_ccard")
    for name, _ in PII_PATTERNS:
        total = total + F.col(f"n_{name}")
    return out.withColumn("n_pii", total)


def redact_pii(
    df: DataFrame,
    text_col: str,
    *,
    output_col: str | None = None,
    token_format: str = "[{name}]",
) -> DataFrame:
    """Replace PII spans with category tokens (`[EMAIL]`, `[CCARD]`,
    `[IPV6]`, `[IPV4]`, `[PHONE]`) — the scrubbing pass itself.

    Fixed application order: email first (host-part digits must never
    half-match as IPs/phones), then the Luhn-gated credit-card fold
    (extracted from the EMAIL-REDACTED text, so a card-digit local
    part inside an email can't be double-hit), then the remaining
    `PII_PATTERNS`. Each `regexp_replace` replaces ALL occurrences;
    the card step literal-replaces each Luhn-valid candidate in match
    order (candidates failing Luhn stay untouched — the
    false-positive gate). Deterministic: the same fixed order +
    global-replace + left-to-right fold semantics reproduce in any
    regex engine (DuckDB needs the 'g' flag, and mirrors the fold
    with list_prepend + list_reduce). Map-only column expression;
    `output_col` defaults to replacing `text_col` in place.
    """
    out_col = output_col or text_col
    name0, pat0 = PII_PATTERNS[0]  # email — first by contract
    expr = F.regexp_replace(
        F.col(text_col), pat0, token_format.format(name=name0.upper())
    )
    ccard_token = F.lit(token_format.format(name="CCARD"))
    valid = F.filter(
        F.regexp_extract_all(expr, F.lit(CCARD_PATTERN), F.lit(0)), _luhn_ok
    )
    expr = F.aggregate(
        valid, expr, lambda acc, c: F.replace(acc, c, ccard_token)
    )
    for name, pat in PII_PATTERNS[1:]:
        expr = F.regexp_replace(
            expr, pat, token_format.format(name=name.upper())
        )
    return df.withColumn(out_col, expr)


def normalize_text(
    df: DataFrame,
    text_col: str,
    *,
    form: str = "NFKC",
    lowercase: bool = False,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
    output_col: str | None = None,
) -> DataFrame:
    """Unicode-normalize a text column — the hygiene pass run BEFORE
    hashing/dedup so byte-different renderings of the same content
    (ligatures, full-width forms, combining vs precomposed accents,
    zero-width joiners) collapse to one canonical form and stop
    defeating exact/MinHash dedup.

    Steps, in order: unicodedata.normalize(form) (NFKC default — the
    compatibility fold corpus pipelines use), optional lowercase,
    strip C0/C1 control chars and zero-width code points
    (keeping \\n and \\t), collapse runs of whitespace to one space
    and trim. Nulls pass through.

    Unicode normalization has no JVM-expression form, so this is the
    sanctioned Arrow path: one pandas UDF over the column, map-only,
    no shuffle. Deterministic for a given Python unicodedata table
    (pin the Python minor version across the cluster, which Spark
    already requires).

    Composition constraint (test-pinned): the UDF's INPUT must be a
    plain column, not an expression containing higher-order-function
    lambdas — Spark cannot extract a Python UDF whose input embeds a
    LambdaFunction (redact_pii's Luhn fold is one), and the plan dies
    with INTERNAL_ERROR "Cannot generate code for expression" at the
    first downstream use. Either run normalize_text FIRST (usually
    the better order anyway: NFKC folds full-width digits so PII
    regexes match more) or put a stage boundary UNDER it —
    `normalize_text(materialize(lambda_heavy_df), ...)`. A boundary
    ABOVE the composed expression does not help; the bad projection
    is already inside it.
    """
    from pyspark.sql.functions import pandas_udf

    _form, _lower = form, lowercase
    _strip, _collapse = strip_control, collapse_whitespace

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import re as _re
        import unicodedata as _ud

        # C0 (minus tab/newline/CR) + DEL + C1 + zero-width/bidi + BOM
        ctrl = _re.compile(
            "[\u0000-\u0008\u000b\u000c\u000e-\u001f"
            "\u007f-\u009f\u200b-\u200f\u2060\ufeff]"
        )
        ws = _re.compile(r"\s+")

        def one(t):
            if t is None:
                return None
            t = _ud.normalize(_form, t)
            if _lower:
                t = t.lower()
            if _strip:
                t = ctrl.sub("", t)
            if _collapse:
                t = ws.sub(" ", t).strip()
            return t

        return s.map(one)

    return df.withColumn(output_col or text_col, _norm(F.col(text_col)))


def compression_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the cheap
    repetition/quality proxy corpus pipelines (Dolma-style) threshold
    on: near-random text sits near 1.0 compressed/raw, boilerplate
    and template spam compress far below it, and degenerate repeats
    approach 0.

    Output: id, n_bytes_raw (UTF-8), n_bytes_zlib, compression_ratio
    (zlib/raw; null for empty docs). Arrow pandas UDF (zlib has no
    JVM-expression form), map-only. Thresholding is the caller's
    policy — like gopher_quality_flags this REPORTS. Exact compressed
    sizes depend on the zlib build, so tests assert behavioral bounds
    (repeats « prose < random), not byte counts.
    """
    from pyspark.sql.functions import pandas_udf

    _level = level

    @pandas_udf("struct<n_bytes_raw: bigint, n_bytes_zlib: bigint>")
    def _sizes(s: pd.Series) -> pd.DataFrame:
        import zlib as _z

        raw, comp = [], []
        for t in s:
            if t is None:
                raw.append(None)
                comp.append(None)
            else:
                b = t.encode("utf-8")
                raw.append(len(b))
                comp.append(len(_z.compress(b, _level)))
        return pd.DataFrame({"n_bytes_raw": raw, "n_bytes_zlib": comp})

    sized = df.select(F.col(id_col), _sizes(F.col(text_col)).alias("_s"))
    return sized.select(
        id_col,
        F.col("_s.n_bytes_raw").alias("n_bytes_raw"),
        F.col("_s.n_bytes_zlib").alias("n_bytes_zlib"),
        (
            F.col("_s.n_bytes_zlib").cast("double")
            / F.nullif(F.col("_s.n_bytes_raw"), F.lit(0)).cast("double")
        ).alias("compression_ratio"),
    )


#: The stop words whose PRESENCE (>= 2 distinct) the Gopher rule set
#: requires — a crude but published English-document signal.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The published Gopher document-filter rule battery (Rae et al.
    2021 §A1.1; also the FineWeb/Dolma baseline set) as per-rule
    booleans plus the conjunction — the standard pre-filter a web
    corpus runs BEFORE paying for dedup.

    Output: id, n_words, plus one boolean per rule — ok_word_count
    (count in [min,max]), ok_mean_word_len (mean length in [3,10]),
    ok_symbol_ratio (#/ellipsis per word < 0.1), ok_bullet_lines
    (< 90% of lines bullet-started), ok_ellipsis_lines (< 30% of
    lines ellipsis-ended), ok_alpha_words (>= 80% of words contain a
    letter), ok_stopwords (>= 2 distinct Gopher stop words present) —
    and `gopher_pass` (all of them). Keeping the per-rule flags
    (rather than just the verdict) is deliberate: corpus reports
    always break rejections down by rule.

    Scale shape: row-local JVM expressions only (splits + higher-order
    functions), map-only, no Python, no shuffle — same contract as
    quality_stats. Thresholds are keyword-tunable; defaults are the
    published constants. Documents that tokenize to nothing fail
    ok_word_count rather than being dropped (the filter REPORTS, the
    caller decides).
    """
    words = F.split(F.trim(F.col(text_col)), " ")
    lines = F.split(F.col(text_col), "\n")
    n_words = F.size(words)
    n_lines = F.size(lines)
    # exact integer char sum / one division at the end — engine-stable
    sum_len = F.expr(
        f"aggregate(split(trim({text_col}), ' '), 0L, (a, w) -> a + length(w))"
    )
    mean_len = sum_len.cast("double") / n_words
    n_hash = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    n_ellipsis = F.regexp_count(F.col(text_col), F.lit(r"\.\.\.|…"))
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.ltrim(ln).rlike(r"^[-*•]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tokens_expr(text_col)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "ok_symbol_ratio": (
            (n_hash + n_ellipsis).cast("double") / n_words
        )
        < max_symbol_word_ratio,
        "ok_bullet_lines": (
            bullet_lines.cast("double") / n_lines
        )
        < max_bullet_line_frac,
        "ok_ellipsis_lines": (
            ellipsis_lines.cast("double") / n_lines
        )
        < max_ellipsis_line_frac,
        "ok_alpha_words": (
            alpha_words.cast("double") / n_words
        )
        >= min_alpha_word_frac,
        "ok_stopwords": stop_hits >= min_stop_hits,
    }
    out = df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        *[
            F.coalesce(c, F.lit(False)).alias(name)
            for name, c in flags.items()
        ],
    )
    verdict = None
    for name in flags:
        verdict = F.col(name) if verdict is None else (verdict & F.col(name))
    return out.withColumn("gopher_pass", verdict)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into (optionally overlapping) token-window
    chunks — the step in front of embedding models with bounded
    context, whose output `mean_pool` later re-aggregates chunk
    embeddings back to one document vector (the pooled_retrieval
    chain run forward).

    Output: one row per chunk — (id, chunk_id, n_chunk_tokens,
    chunk_text). Chunk i covers tokens [i*stride, i*stride +
    chunk_tokens) with stride = chunk_tokens - overlap; a doc of n
    tokens yields ceil((n - overlap) / stride) chunks (1 when n <=
    chunk_tokens), so consecutive chunks share exactly `overlap`
    tokens and the final partial chunk keeps the tail. Docs whose
    text tokenizes to nothing are dropped.

    Scale shape: one map-side projection + posexplode — the chunk
    fan-out happens where the data lives, no shuffle; chunk rows are
    |corpus| x (1/stride) of the token volume, the same row-budget an
    embedding job must pay anyway. Tokenization is the module's
    whitespace `tokens_expr`; swap a BPE tokenizer in via mapInPandas
    when chunk budgets must be model-exact.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens, got "
            f"{overlap} vs {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    n = F.size("_toks")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    slice_expr = (
        f"slice(_toks, chunk_id * {stride} + 1, {chunk_tokens})"
    )
    return (
        df.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
        # a blank doc tokenizes to [''] under split-on-space: drop it
        .filter((n > 0) & ~((n == 1) & (F.element_at("_toks", 1) == "")))
        .select(
            F.col(id_col),
            F.col("_toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.size(F.expr(slice_expr)).cast("bigint").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.expr(slice_expr)).alias("chunk_text"),
        )
    )


#: URL + capture-group-for-host written in the same dual-engine
#: subset (non-capturing groups are valid Java regex AND RE2),
#: following RFC-3986 authority parsing: the authority ends at the
#: first '/', '?' or '#', and the host is what follows the LAST '@'
#: inside it (browsers parse userinfo the same way). The greedy
#: `(?:[^\s/?#"']*@)?` userinfo group is load-bearing: without it,
#: https://x@spam.example.org captures 'x@spam.example.org' — and a
#: lazier class would still let 'u:p@' or 'a@b@' prefixes smuggle a
#: blocklisted host past the equi-join. Because the group cannot
#: cross '/', '?' or '#', an '@' in the query string
#: (https://spam.example.org?a@x) cannot displace the real host.
URL_PATTERN = r"https?://[^\s/\"']+[^\s\"']*"
URL_HOST_PATTERN = r"https?://(?:[^\s/?#\"']*@)?([^\s/:@?#\"']+)"


def extract_url_domains(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (document, URL host) occurrence.

    Output: id, domain (lowercased full host). `regexp_extract_all`
    with a capture group pulls every host; explode keeps duplicates
    (a doc linking the same domain 5 times counts 5 — the signal a
    link-spam filter wants). Map-side explode, no shuffle; the
    downstream groupBy/join decides the exchange.
    """
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_HOST_PATTERN), F.lit(1))
        ).alias("domain"),
    ).withColumn("domain", F.lower(F.col("domain")))


def filter_url_blocklist(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: DataFrame,
    *,
    domain_col: str = "domain",
    broadcast_row_cap: int | None = None,
) -> DataFrame:
    """Drop documents containing a URL whose host is blocklisted.

    The standard corpus hygiene pass (spam/adult/malware domain
    lists). The semi-join side rides a SIZE-GATED broadcast
    (``common.maybe_broadcast``): typical public lists broadcast
    comfortably and the corpus never shuffles — extract hosts
    map-side, broadcast-join against the list, anti-join the flagged
    ids back. But the list is user-supplied and unbounded in
    principle (the big public ones run to ~10M rows BEFORE the
    subdomain pre-expansion below multiplies them), so above the cap
    the hint is withheld and AQE picks the strategy — the same
    discipline as the classifier weight table. Matching is exact on
    the lowercased host; subdomain policies (suffix matching) belong
    in the blocklist itself (pre-expand) to keep the join an
    equi-join.
    """
    from python_stream_processing_framework_spark.operators.common import (
        maybe_broadcast,
    )

    hosts = extract_url_domains(df, id_col, text_col)
    flagged = (
        hosts.join(
            maybe_broadcast(
                blocklist.select(F.col(domain_col).alias("domain")),
                max_rows=broadcast_row_cap,
            ),
            "domain",
        )
        .select(id_col)
        .distinct()
    )
    return df.join(flagged, id_col, "left_anti")


#: GPT-2-style pre-tokenizer (Radford et al. 2019, the regex every
#: BPE vocabulary since has inherited), restricted to the dual-engine
#: subset: contraction suffixes, letter runs, digit runs, and
#: non-space-non-alnum runs. Two deliberate deviations from the
#: original, both forced by RE2 (the DuckDB oracle engine): the
#: trailing-space lookahead `\s+(?!\S)` is dropped (RE2 has no
#: lookaround), and `\s` is spelled as an explicit ASCII class
#: because Java's `\s` includes \x0B while RE2's does not. Leftmost-
#: first alternation semantics agree between java.util.regex and
#: RE2's Perl mode, so the SAME string tokenizes identically in both
#: engines (pinned over the full documents table in tests).
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)|[\p{L}]+|[\p{N}]+|[^ \t\n\r\f\p{L}\p{N}]+"
)

_CONTRACTION_FULL = r"^'(?:s|t|re|ve|m|ll|d)$"


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting the way an LLM-data pipeline budgets it: a
    BPE-ish regex pre-tokenization pass next to the plain whitespace
    count.

    Output per document: id, n_ws_tokens (whitespace tokens — the
    number quality_stats and the Gopher rules reason about),
    n_bpe_tokens (pre-tokenizer matches — the number a token-budget
    planner wants, since each pre-token maps to >=1 BPE piece),
    n_word_tokens / n_num_tokens / n_contraction_tokens /
    n_punct_tokens (the pre-token classes; punct is the exact
    remainder), and n_chars (total characters). All-integer output —
    ratios are one division away and left to the caller so the row
    stays engine-exact.

    Scale shape: row-local JVM regex + higher-order filters, map-only,
    no Python, no shuffle — a 100-TB corpus pays exactly one scan.
    A model-exact tokenizer (tiktoken et al.) slots in as an
    Arrow-batched mapInPandas with this same output schema.
    """
    toks = F.regexp_extract_all(
        F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), F.lit(0)
    )
    n_word = F.size(F.filter(toks, lambda x: x.rlike(r"^[\p{L}]+$")))
    n_num = F.size(F.filter(toks, lambda x: x.rlike(r"^[\p{N}]+$")))
    n_contr = F.size(F.filter(toks, lambda x: x.rlike(_CONTRACTION_FULL)))
    out = df.select(
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("bigint").alias("n_ws_tokens"),
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        n_word.cast("bigint").alias("n_word_tokens"),
        n_num.cast("bigint").alias("n_num_tokens"),
        n_contr.cast("bigint").alias("n_contraction_tokens"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
    )
    return out.withColumn(
        "n_punct_tokens",
        (
            F.col("n_bpe_tokens")
            - F.col("n_word_tokens")
            - F.col("n_num_tokens")
            - F.col("n_contraction_tokens")
        ).cast("bigint"),
    )


def frequent_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    top_k: int = 25,
    min_df: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate mining: the word n-grams that appear
    in the most documents.

    The standard diagnostic before writing removal rules — cookie
    banners, nav bars, and license footers surface as n-grams with
    anomalous document frequency (the C4/FineWeb reports both lead
    with this table). Counts DOCUMENT frequency (each doc contributes
    each distinct gram once), so a single doc repeating a phrase
    can't fake corpus-wide boilerplate.

    Output: ngram, doc_freq — the top_k by (doc_freq DESC, ngram) —
    the tie-break makes the cut deterministic.

    Scale shape: gram generation is a map-side projection (explode
    where the data lives); the groupBy count gets map-side partial
    aggregation, so the single shuffle carries one row per distinct
    (partition, gram) — bounded by vocabulary, not corpus size; the
    top-k is TakeOrderedAndProject (no global sort). `min_df` prunes
    the singleton-gram tail (the vast majority of grams) before the
    ordering.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = (
        df.select(tokens_expr(text_col).alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(F.explode(shingles_expr("_toks", n)).alias("ngram"))
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_df)
        .orderBy(F.col("doc_freq").desc(), F.col("ngram"))
        .limit(top_k)
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    grams,
    *,
    replacement: str = " ",
    engine: str = "auto",
    expr_limit: int = 1_000,
) -> DataFrame:
    """Delete mined boilerplate phrases from every document — the
    removal half of the mine -> remove loop `frequent_ngrams` opens
    (C4's "three-sentence spans seen more than once" rule, FineWeb's
    boilerplate line filters — same shape: a SMALL list of phrases
    with anomalous document frequency, applied corpus-wide).

    ``grams`` is either the DataFrame `frequent_ngrams` returns
    (column ``ngram``, optionally ``doc_freq``) or a plain list of
    strings. A gram DataFrame is collected to the driver — bounded
    by construction (a mined boilerplate list is top-k, thousands at
    most) — and applied in (doc_freq DESC, ngram) order so the fold
    is deterministic; a list is applied in the order given. Each
    occurrence is replaced literally (no regex) with ``replacement``.

    Scale shape: both engines are map-only single scans with
    IDENTICAL results (a left-to-right fold of literal replaces):

    - ``engine='expr'``: one JVM `replace` per gram chained in the
      plan — whole-stage codegen, no Python. The right path for the
      usual top-k-sized lists, but Catalyst expression trees don't
      scale to six-figure chain depth.
    - ``engine='python'``: one Arrow-batched `mapInPandas` stage
      folding the same phrase list (shipped via a tracked broadcast)
      per batch — flat in phrase count where the expression tree is
      not, at the cost of leaving codegen.
    - ``engine='auto'`` (default): 'expr' up to ``expr_limit``
      phrases, 'python' beyond.
    """
    from functools import reduce

    if isinstance(grams, DataFrame):
        cols = grams.columns
        if "doc_freq" in cols:
            rows = grams.orderBy(
                F.col("doc_freq").desc(), F.col("ngram")
            ).collect()
        else:
            rows = grams.orderBy("ngram").collect()
        phrases = [r["ngram"] for r in rows]
    else:
        phrases = list(grams)
    if engine == "auto":
        engine = "expr" if len(phrases) <= expr_limit else "python"
    if engine == "expr":
        folded = reduce(
            lambda acc, g: F.replace(acc, F.lit(g), F.lit(replacement)),
            phrases,
            F.col(text_col),
        )
        return df.withColumn(text_col, folded)
    if engine != "python":
        raise ValueError(f"engine must be auto|expr|python, got {engine!r}")

    from collections.abc import Iterator

    from python_stream_processing_framework_spark.operators.common import (
        track_broadcast,
    )

    bc = df.sparkSession.sparkContext.broadcast(phrases)
    track_broadcast(bc)
    schema = df.schema

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ps = bc.value
        for pdf in batches:
            s = pdf[text_col]
            for p in ps:
                s = s.str.replace(p, replacement, regex=False)
            out = pdf.copy()
            out[text_col] = s
            yield out

    return df.mapInPandas(fold, schema)


def _gram_hash_expr(toks_col: str, n: int) -> str:
    """Distinct n-gram 60-bit md5-prefix hashes of a token array —
    the spans-family gram hash (operators/spans._gram_spans), applied
    to the DISTINCT gram set. BIGINTs shuffle; gram text never
    does."""
    return (
        f"array_distinct(transform(sequence(1, size({toks_col}) - {n - 1}),"
        f" i -> CAST(conv(substring(md5(array_join(slice({toks_col}, i, {n}), ' ')),"
        f" 1, 15), 16, 10) AS BIGINT)))"
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: of each doc's DISTINCT n-grams,
    how many occur in NO earlier document (earlier = smaller id) —
    the marginal-contribution curve behind data-diversity analyses
    (each new crawl snapshot contributes diminishing novel n-grams;
    a novelty collapse is the standard sign a source is exhausted or
    a dump is a re-crawl).

    Returns (id, n_grams, n_novel, novelty_ppm): distinct-gram count,
    grams whose corpus-wide first occurrence is this doc, and their
    ratio in exact integer parts-per-million (``novel * 1e6 DIV
    total`` — no float rounding, oracle-exact). Docs shorter than
    ``n`` tokens yield no row.

    Scale shape: the gram table (id, gram-hash60) is exploded
    map-side and aggregated TWICE, never joined back to itself at
    corpus size — per-gram first occurrence is a partial-aggregable
    min (a boilerplate gram's 1e6 occurrences reach the reducer as
    partials), per-doc totals a partial-aggregable count; the only
    join is doc-level (two doc-sized aggregates), broadcast-able.
    """
    toks = df.select(F.col(id_col), tokens_expr(text_col).alias("_toks")).filter(
        F.size("_toks") >= n
    )
    grams = toks.select(
        F.col(id_col), F.explode(F.expr(_gram_hash_expr("_toks", n))).alias("_g")
    )
    totals = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    novel = (
        grams.groupBy("_g")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        totals.join(novel, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("CAST(n_novel * 1000000 DIV n_grams AS BIGINT)"),
        )
    )


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    *,
    n: int = 3,
) -> DataFrame:
    """Cross-source n-gram containment: for every ordered source pair
    (a, b), what fraction of a's distinct n-grams also occur in b —
    the dump-overlap matrix a training-data pipeline reads before
    merging crawl snapshots (a high-containment pair means the new
    dump is mostly a re-crawl and will mostly dedup away; the
    published CommonCrawl-overlap analyses lead with this table).

    Returns (src_a, src_b, grams_a, shared, containment_ppm) for
    every ordered pair with shared > 0 — ppm is exact integer
    ``shared * 1e6 DIV grams_a``, so containment(a,b) and
    containment(b,a) differ when the sources differ in size.

    Scale shape: grams reduce to DISTINCT (source, gram-hash60)
    FIRST (partial-aggregable — corpus mass collapses to vocabulary
    mass before any join), then self-join on the gram hash: each
    gram matches at most |sources| rows per side, so the join output
    is bounded by vocab x |sources|^2, never corpus-sized. Totals
    are source-level (tiny, broadcast). Pins the distinct-gram frame
    via materialize() (it fans into three consumers); release with
    common.release_caches(), the family-wide contract."""
    from python_stream_processing_framework_spark.operators.common import (
        materialize,
        maybe_broadcast,
    )

    toks = df.select(
        F.col(group_col), tokens_expr(text_col).alias("_toks")
    ).filter(F.size("_toks") >= n)
    # materialize: sg fans into three consumers (totals + both join
    # sides) — without the pin each would rescan the corpus
    sg = materialize(
        toks.select(
            F.col(group_col),
            F.explode(F.expr(_gram_hash_expr("_toks", n))).alias("_g"),
        )
        .groupBy(group_col, "_g")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    totals = sg.groupBy(group_col).agg(F.count(F.lit(1)).alias("grams_a"))
    a = sg.select(F.col(group_col).alias("src_a"), "_g")
    b = sg.select(F.col(group_col).alias("src_b"), "_g")
    shared = (
        a.join(b, "_g")
        .filter(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return shared.join(
        maybe_broadcast(totals.withColumnRenamed(group_col, "src_a")), "src_a"
    ).select(
        "src_a",
        "src_b",
        "grams_a",
        "shared",
        F.expr("CAST(shared * 1000000 DIV grams_a AS BIGINT)").alias(
            "containment_ppm"
        ),
    )


def novelty_scores_batch(
    batch: DataFrame,
    index_path: str,
    batch_tag: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """One micro-batch of the INCREMENTAL novelty score: per-doc
    distinct n-grams scored against everything seen in EARLIER
    batches (the persisted gram index under ``index_path``) plus the
    within-batch first-occurrence rule of :func:`ngram_novelty`.
    Returns (id, n_grams, n_novel, novelty_ppm); docs shorter than
    ``n`` tokens yield no row. Callers append the batch's grams via
    :func:`append_novelty_grams` AFTER delivering the scores — and
    the index read here EXCLUDES ``batch_tag``'s own partition, so a
    redelivered batch (foreachBatch's at-least-once) scores
    identically even when its gram append already landed.

    Scale shape: same as ngram_novelty (gram table aggregated, never
    self-joined at corpus scale) plus ONE anti-join against the seen
    set — vocabulary-sized per side, hash-join on int64 gram keys.
    The index holds distinct grams per batch dir; grams recurring
    across batches are stored once per batch they appear in (the
    anti-join dedups logically), so index mass is bounded by
    sum-of-batch vocabularies."""
    from pyspark.sql.utils import AnalysisException

    spark = batch.sparkSession
    toks = batch.select(F.col(id_col), tokens_expr(text_col).alias("_toks")).filter(
        F.size("_toks") >= n
    )
    grams = toks.select(
        F.col(id_col), F.explode(F.expr(_gram_hash_expr("_toks", n))).alias("_g")
    )
    from python_stream_processing_framework_spark.operators.dedup_index import (
        exclude_batch_tag,
    )

    try:
        # shared inference-robust exclusion (handles non-numeric tags
        # on int-inferred columns AND zero-padded numeric tags — see
        # dedup_index.exclude_batch_tag)
        seen = exclude_batch_tag(
            spark.read.parquet(f"{index_path}/grams"), batch_tag
        ).select("_g")
    except AnalysisException:
        seen = None
    first = grams.groupBy("_g").agg(F.min(id_col).alias("_first"))
    cand = grams.join(first, "_g").filter(F.col(id_col) == F.col("_first"))
    if seen is not None:
        cand = cand.join(seen, "_g", "left_anti")
    totals = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    novel = cand.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_novel"))
    return (
        totals.join(novel, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("CAST(n_novel * 1000000 DIV n_grams AS BIGINT)"),
        )
    )


def append_novelty_grams(
    batch: DataFrame,
    index_path: str,
    batch_tag: str,
    *,
    text_col: str = "text",
    n: int = 3,
) -> None:
    """Record one batch's distinct gram hashes under
    ``grams/batch=<tag>`` — overwrite-idempotent per tag (the
    dedup-index discipline), so retries rewrite exactly their own
    partition and the index never double-counts."""
    toks = batch.select(tokens_expr(text_col).alias("_toks")).filter(
        F.size("_toks") >= n
    )
    grams = toks.select(
        F.explode(F.expr(_gram_hash_expr("_toks", n))).alias("_g")
    ).distinct()
    grams.write.mode("overwrite").parquet(f"{index_path}/grams/batch={batch_tag}")


def compact_novelty_grams(
    spark: SparkSession,
    index_path: str,
    *,
    target_files: int = 8,
    retain_tags: tuple[str, ...] | list[str] = (),
) -> str | None:
    """Fold the per-batch ``grams/batch=<tag>`` directories into one
    consolidated partition (r12) — the novelty index's lifecycle
    valve: every ``append_novelty_grams`` adds a directory, so a
    long-running ``Stream.score_novelty`` would otherwise pay 10^4
    directory listings per scoring read after 10^4 micro-batches, and
    cross-batch duplicate grams (boilerplate recurring in every
    batch) would be stored once PER BATCH even though scoring only
    consumes the distinct gram set. Compaction collapses them:
    full-row dropDuplicates over int64 gram hashes bounds the index
    at vocabulary size, not sum-of-batch-vocabularies.

    Shares ``compact_partitions`` with the dedup signature indexes —
    identical retry discipline: pass every tag a foreachBatch
    redelivery may still retry (for Stream.score_novelty, the
    current batch tag) in ``retain_tags``, or the retried batch
    would see its own earlier grams as "seen" and score zero novel.
    Scoring equivalence and the crash window (write-then-delete;
    duplicate grams are anti-join-idempotent) are pinned in
    tests/test_novelty_facade.py.

    Returns the new compact tag, or None when there was nothing to
    compact."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        compact_partitions,
    )

    return compact_partitions(
        spark,
        f"{index_path}/grams",
        target_files=target_files,
        retain_tags=retain_tags,
    )


def token_drift(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token-distribution drift: the total-variation
    distance between each source's token distribution and the
    distribution of the REST of the corpus — the mixture-shift
    monitor a training-data pipeline reads when a feed changes
    character (a new crawl config, a language flip, a spam wave all
    move TV before any downstream metric notices). TV is used
    instead of KL/JS because it needs no logarithms: cross-multiplied
    it is exact integer arithmetic end to end, so the DuckDB oracle
    replays it bit-for-bit.

    Returns (src, n_tokens, tv_ppm) per source: n_tokens the
    source's token mass, tv_ppm = floor(1e6 * TV) with
    TV = (1/2) * sum over the vocabulary of |c_t/T - r_t/R|
    (c_t/T the source's token distribution, r_t/R the
    rest-of-corpus one). Computed CROSS-MULTIPLIED — sum
    |c_t*R - r_t*T| over the vocabulary, one final floor-DIV by
    2*T*R — so the ONLY rounding anywhere is that last division.
    (The pre-r12 form floor-quantized each token to integer ppm
    first, which saturated toward 1e6 once the vocabulary passed
    ~1e6: every sub-ppm token floored to 0 and its whole mass
    landed in the residue — exactly the corpus scale this targets.)
    Intermediates ride decimal(38,0) (HUGEINT in the oracle):
    |c*R - r*T| <= T*R ~ 1e26 at 1e13-token scale, and * 1e6 still
    < 1e38. 0 = identical distributions, 1e6 = disjoint
    vocabularies (exact); a source that IS the whole corpus (R = 0)
    reads 1e6 by convention.

    Scale shape: one partial-aggregable (source, token) count — the
    corpus collapses to vocabulary x sources rows before anything
    else; per-token rest-counts derive from a global per-token sum
    (vocabulary-sized, the same frame re-aggregated, no second
    corpus scan); the compare is one vocabulary-bounded join keyed
    on the token, the per-source totals broadcast. Tokens a source
    never uses need no join row: their aggregate rest-side mass is
    T*(R - sum_present(r_t)), closed-form from the present rows."""
    from python_stream_processing_framework_spark.operators.common import (
        materialize,
        maybe_broadcast,
    )

    toks = df.select(
        F.col(group_col), F.explode(tokens_expr(text_col)).alias("_t")
    )
    # materialize: the (source, token) counts feed three consumers
    # (totals, global counts, the compare join)
    st = materialize(
        toks.groupBy(group_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    )
    totals = st.groupBy(group_col).agg(F.sum("_c").alias("_total"))
    glob = st.groupBy("_t").agg(F.sum("_c").alias("_gc"))
    g_total = totals.agg(F.sum("_total").alias("_gt"))
    dec = "decimal(38,0)"
    with_rest = (
        st.join(glob, "_t")
        .join(maybe_broadcast(totals), group_col)
        .crossJoin(F.broadcast(g_total))
        .select(
            F.col(group_col).alias("src"),
            F.col("_c").cast(dec).alias("_c"),
            F.col("_gc").cast(dec).alias("_gc"),
            F.col("_total").cast(dec).alias("_tt"),
            (F.col("_gt") - F.col("_total")).cast(dec).alias("_r"),
        )
    )
    present = with_rest.groupBy("src").agg(
        F.max("_tt").alias("_tt"),
        F.max("_r").alias("_r"),
        F.sum(F.abs(F.col("_c") * F.col("_r") - (F.col("_gc") - F.col("_c")) * F.col("_tt"))).alias("_num_present"),
        F.sum(F.col("_gc") - F.col("_c")).alias("_rest_present"),
    )
    # tokens the source never uses contribute |0*R - r_t*T| = r_t*T
    # each; summed over the absent vocabulary that is
    # T*(R - sum_present(r_t)) — added in closed form, no join row
    # per absent token
    return present.select(
        "src",
        F.col("_tt").cast("bigint").alias("n_tokens"),
        F.expr(
            "CAST(CASE WHEN _r = 0 THEN 1000000"
            " ELSE (_num_present + _tt * (_r - _rest_present)) * 1000000"
            " DIV (2 * _tt * _r) END AS BIGINT)"
        ).alias("tv_ppm"),
    )


def write_drift_reference(
    df: DataFrame, ref_path: str, *, text_col: str = "text"
) -> int:
    """Persist the REFERENCE token distribution the streaming drift
    monitor compares against: ``{ref_path}/counts`` holds (token,
    count) for the reference corpus, ``{ref_path}/total`` one row
    with its token mass. Written once (the monitor never mutates
    it); a rebuild is an explicit overwrite. Returns the reference's
    token mass.

    Scale shape: one partial-aggregable token count — the reference
    corpus collapses to its vocabulary before the write; the total
    is re-read from the written parquet (footer-cheap, no second
    corpus scan)."""
    toks = df.select(F.explode(tokens_expr(text_col)).alias("_t"))
    toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_rc")).write.mode(
        "overwrite"
    ).parquet(f"{ref_path}/counts")
    spark = df.sparkSession
    total = spark.read.parquet(f"{ref_path}/counts").agg(
        F.coalesce(F.sum("_rc"), F.lit(0)).cast("bigint").alias("_rt")
    )
    total.write.mode("overwrite").parquet(f"{ref_path}/total")
    return total.head()[0]


def drift_scores_batch(
    batch: DataFrame,
    ref_path: str,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """One micro-batch of the streaming drift monitor: per-source
    total-variation distance between the batch's token distribution
    and the persisted reference under ``ref_path`` (see
    :func:`write_drift_reference`). Returns (src, n_tokens, tv_ppm)
    — the streaming form of :func:`token_drift`, with the
    rest-of-corpus side replaced by a FIXED reference so every batch
    is stateless and a foreachBatch redelivery scores identically by
    construction.

    Same exact integer arithmetic as token_drift: cross-multiplied
    TV = sum |c_t*R - r_t*T| / (2*T*R) with one final floor-DIV,
    decimal(38,0) intermediates (|c*R - r*T| <= T*R ~ 1e26 at
    1e13-token scale, * 1e6 still < 1e38); tokens absent from the
    batch contribute T*(R - sum_present(r_t)) in closed form. An
    empty reference (R = 0) reads 1e6 by convention.

    Scale shape: the batch side collapses to (source, token) counts
    (micro-batch-sized); the reference — corpus-vocabulary-sized, so
    NEVER broadcast wholesale — is pruned to the batch's vocabulary
    by a size-gated-broadcast semi-join before the left join, so the
    big side is scanned once and never shuffled."""
    from python_stream_processing_framework_spark.operators.common import (
        materialize,
        maybe_broadcast,
    )

    spark = batch.sparkSession
    ref = spark.read.parquet(f"{ref_path}/counts")
    r_total = spark.read.parquet(f"{ref_path}/total")
    toks = batch.select(
        F.col(group_col), F.explode(tokens_expr(text_col)).alias("_t")
    )
    # materialize: the (source, token) counts feed three consumers
    # (per-source totals, the vocabulary prune, the compare join)
    st = materialize(
        toks.groupBy(group_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    )
    totals = st.groupBy(group_col).agg(F.sum("_c").alias("_total"))
    ref_pruned = ref.join(
        maybe_broadcast(st.select("_t").distinct()), "_t", "left_semi"
    )
    dec = "decimal(38,0)"
    joined = (
        st.join(ref_pruned, "_t", "left")
        .join(maybe_broadcast(totals), group_col)
        .crossJoin(F.broadcast(r_total))
        .select(
            F.col(group_col).alias("src"),
            F.col("_c").cast(dec).alias("_c"),
            F.coalesce(F.col("_rc"), F.lit(0)).cast(dec).alias("_rc"),
            F.col("_total").cast(dec).alias("_tt"),
            F.col("_rt").cast(dec).alias("_rt"),
        )
    )
    present = joined.groupBy("src").agg(
        F.max("_tt").alias("_tt"),
        F.max("_rt").alias("_rt"),
        F.sum(
            F.abs(F.col("_c") * F.col("_rt") - F.col("_rc") * F.col("_tt"))
        ).alias("_num_present"),
        F.sum("_rc").alias("_ref_present"),
    )
    # reference tokens the batch never uses contribute |0*R' - r_t*T|
    # = r_t*T each; summed over that absent vocabulary this is
    # T*(R - sum_present(r_t)) — closed form, no join row per token
    scored = present.select(
        "src",
        F.col("_tt").cast("bigint").alias("n_tokens"),
        F.expr(
            "CAST(CASE WHEN _rt = 0 THEN 1000000"
            " ELSE (_num_present + _tt * (_rt - _ref_present)) * 1000000"
            " DIV (2 * _tt * _rt) END AS BIGINT)"
        ).alias("tv_ppm"),
    )
    # every-source-accounted (r12 ADVICE): a source whose batch rows
    # carry only empty/whitespace text contributes zero exploded
    # tokens, so the aggregate above yields NO row for it — the one
    # place a live source could silently drop off the drift feed.
    # Right-join the batch's distinct sources back in; a token-less
    # source reads n_tokens=0 and the maximal tv_ppm=1e6 (an empty
    # distribution is vocabulary-disjoint from any real reference).
    # The source list is batch-bounded and tiny — broadcast side.
    srcs = batch.select(F.col(group_col).alias("src")).distinct()
    return srcs.join(scored, "src", "left").select(
        "src",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias(
            "n_tokens"
        ),
        F.coalesce(F.col("tv_ppm"), F.lit(1000000)).cast("bigint").alias(
            "tv_ppm"
        ),
    )
