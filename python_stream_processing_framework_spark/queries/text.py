"""Text-analysis + multimodal queries with exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.dedup import (
    simhash_fingerprints,
)
from python_stream_processing_framework_spark.operators.multimodal import (
    binarize,
    binary_meta,
)
from python_stream_processing_framework_spark.operators.text import (
    LANG_MARKERS,
    PII_PATTERNS,
    STOPWORDS,
    extract_url_domains,
    fingerprint,
    lang_id,
    pii_stats,
    quality_stats,
    redact_pii,
    repetition_stats,
)
from python_stream_processing_framework_spark.queries.base import query
from python_stream_processing_framework_spark.queries.dedup import _SIMHASH_FP

_TOKS = "string_split(trim(lower(text)), ' ')"
_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "text_quality",
    f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
      WHERE len({_TOKS}) >= 1),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(toks, x -> x IN ({_STOP_LIST}))) AS BIGINT)
               AS n_stop,
             CAST(length(trim(text)) AS BIGINT) AS n_chars_trim
      FROM t)
    SELECT c.doc_id, n_tokens, n_distinct, n_stop, n_chars_trim,
           CAST(n_distinct AS DOUBLE)/n_tokens AS type_token_ratio,
           CAST(n_stop AS DOUBLE)/n_tokens AS stopword_ratio,
           CAST(n_chars_trim - (n_tokens - 1) AS DOUBLE)/n_tokens
             AS chars_per_token,
           CAST(n_distinct AS DOUBLE)/n_tokens * 0.5
             + (1.0 - CAST(n_stop AS DOUBLE)/n_tokens) * 0.3
             + CAST(least(n_tokens, 100) AS DOUBLE)/100.0 * 0.2
             AS quality_score,
           CAST((length(t.text) + 3) // 4 AS BIGINT) AS est_bpe_tokens,
           CAST(greatest(len(string_split(trim(t.text), ' ')),
                         (length(t.text) + 3) // 4) AS BIGINT) AS est_tokens
    FROM c JOIN t ON t.doc_id = c.doc_id
    """,
    doc="Per-document token stats + deterministic quality score "
    "(length/stopword/type-token features) + token-budget estimates "
    "(whitespace words vs the chars/4 BPE heuristic).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return quality_stats(documents, "doc_id", "text", token_estimates=True)


def _lang_oracle() -> str:
    counts = ",\n             ".join(
        f"CAST(len(list_filter(toks, x -> x IN "
        f"({', '.join(chr(39) + w + chr(39) for w in words)}))) AS BIGINT) AS n_{lang}"
        for lang, words in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"n_{lang} >= n_{other}" for other in langs[i + 1 :])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (SELECT doc_id,
             {counts}
          FROM t)
    SELECT doc_id, n_en, n_es, n_de, n_fr, n_zh,
           {case_sql} AS pred_lang
    FROM c
    """


@query(
    "lang_id",
    _lang_oracle(),
    doc="Heuristic language ID: marker-token counts, argmax with fixed "
    "tie-break priority.",
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return lang_id(documents, "doc_id", "text")


@query(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
           CAST(list_reduce(
             list_concat(CAST([0] AS BIGINT[]),
               list_transform(toks, t ->
                 CAST('0x' || substr(md5(t), 1, 7) AS BIGINT) % 1000003)),
             (acc, h) -> (acc * 131 + h) % 2147483647) AS BIGINT)
             AS rolling_fp,
           {_SIMHASH_FP} AS simhash_fp
    FROM (SELECT doc_id, toks,
                 list_transform(list_distinct(toks), t ->
                   CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hs
          FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) x
          WHERE len(toks) >= 1) t
    """,
    doc="Both document fingerprint families in one per-doc pass: the "
    "order-sensitive polynomial rolling hash (left fold, exact int64 "
    "arithmetic) and the 60-bit SimHash (Charikar-style majority vote "
    "over md5 token hashes — the near-dup fingerprint that "
    "simhash_pairs bands). Map-only; both engines fold identically.",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    rolled = fingerprint(documents, "doc_id", "text").withColumnRenamed(
        "fingerprint", "rolling_fp"
    )
    return simhash_fingerprints(rolled, "doc_id", "text").select(
        "doc_id", "rolling_fp", F.col("fingerprint").alias("simhash_fp")
    )


@query(
    "binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST((octet_length(encode(text)) + 999) // 1000 AS BIGINT)
             AS n_chunks
    FROM documents
    """,
    doc="Multimodal plumbing: opaque binary payload column + typed "
    "metadata (byte length, digest, storage chunk count). The decode "
    "path (mapInPandas) is exercised in tests/test_multimodal.py.",
)
def binary_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return binary_meta(binarize(documents, "doc_id", "text"), "doc_id")


# deterministic synthetic container headers from doc_id: md5-derived
# dims, PNG for even ids, JPEG (APP0 + SOF0) for odd, every 7th doc a
# non-image payload (raw text bytes) so the unknown path is exercised
_IMG_W = (
    "(16 + cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10)"
    " as bigint) % 4096)"
)
_IMG_H = (
    "(16 + cast(conv(substring(md5(cast(doc_id as string)), 5, 4), 16, 10)"
    " as bigint) % 4096)"
)
_PNG_HEX = (
    "concat('89504E470D0A1A0A', '0000000D', '49484452', "
    f"lpad(hex({_IMG_W}), 8, '0'), lpad(hex({_IMG_H}), 8, '0'), "
    "'08', '06', '000000', '00000000')"
)
_JPEG_HEX = (
    "concat('FFD8', 'FFE0', '0010', '4A46494600', '0102', '00', '0001', "
    f"'0001', '0000', 'FFC0', '0011', '08', lpad(hex({_IMG_H}), 4, '0'), "
    f"lpad(hex({_IMG_W}), 4, '0'), '03', '011100', '021101', '031101', "
    "'FFD9')"
)


@query(
    "image_meta",
    """
    WITH src AS (
      SELECT doc_id, text,
             16 + ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 4096
               AS w,
             16 + ('0x' || substr(md5(doc_id::VARCHAR), 5, 4))::BIGINT % 4096
               AS h
      FROM documents),
    built AS (
      SELECT doc_id, text,
        CASE WHEN doc_id % 7 = 0 THEN NULL
             WHEN doc_id % 2 = 0 THEN
               '89504E470D0A1A0A' || '0000000D' || '49484452' ||
               lpad(hex(w), 8, '0') || lpad(hex(h), 8, '0') ||
               '08' || '06' || '000000' || '00000000'
             ELSE
               'FFD8' || 'FFE0' || '0010' || '4A46494600' || '0102' ||
               '00' || '0001' || '0001' || '0000' || 'FFC0' || '0011' ||
               '08' || lpad(hex(h), 4, '0') || lpad(hex(w), 4, '0') ||
               '03' || '011100' || '021101' || '031101' || 'FFD9'
        END AS hx
      FROM src),
    parsed AS (
      SELECT doc_id, hx,
        CASE WHEN hx IS NULL THEN CAST(octet_length(encode(text)) AS BIGINT)
             ELSE CAST(strlen(hx) // 2 AS BIGINT) END AS n_bytes,
        CASE WHEN hx IS NULL THEN 'unknown'
             WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'png'
             ELSE 'jpeg' END AS format,
        -- PNG IHDR slices (sig 1-16, len 17-24, type 25-32)
        ('0x' || substr(hx, 33, 8))::BIGINT AS png_w,
        ('0x' || substr(hx, 41, 8))::BIGINT AS png_h,
        ('0x' || substr(hx, 49, 2))::BIGINT AS png_bit,
        ('0x' || substr(hx, 51, 2))::BIGINT AS png_color,
        -- JPEG marker scan replay: APP0 length at chars 9-12; the
        -- SOF marker starts right after the APP0 segment
        8 + ('0x' || substr(hx, 9, 4))::BIGINT * 2 + 1 AS sof
      FROM built)
    SELECT doc_id, n_bytes, format,
      CASE format
        WHEN 'png' THEN png_w
        WHEN 'jpeg' THEN ('0x' || substr(hx, sof + 14, 4))::BIGINT
      END AS width,
      CASE format
        WHEN 'png' THEN png_h
        WHEN 'jpeg' THEN ('0x' || substr(hx, sof + 10, 4))::BIGINT
      END AS height,
      CASE format
        WHEN 'png' THEN png_bit
        WHEN 'jpeg' THEN ('0x' || substr(hx, sof + 8, 2))::BIGINT
      END AS bit_depth,
      CASE format
        WHEN 'png' THEN CASE png_color WHEN 0 THEN 1 WHEN 2 THEN 3
                             WHEN 3 THEN 1 WHEN 4 THEN 2 WHEN 6 THEN 4 END
        WHEN 'jpeg' THEN ('0x' || substr(hx, sof + 18, 2))::BIGINT
      END AS channels
    FROM parsed
    """,
    doc="Codec-free image metadata (operators/multimodal.image_meta): "
    "PNG IHDR and JPEG SOF header parse over binary payloads via "
    "Arrow mapInPandas — width, height, bit depth, channels without "
    "decoding pixel data; non-image payloads degrade to "
    "format='unknown' with NULL fields. Payloads are deterministic "
    "synthetic container headers built from doc_id (md5-derived "
    "dims), so the oracle rebuilds the identical bytes as a hex "
    "string and replays the parse by slicing — byte-exact parity "
    "for the sibling of audio_meta's RIFF/WAVE parser.",
)
def image_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.multimodal import (
        image_meta,
    )

    (documents,) = load(spark, sf_dir, "documents")
    payloads = documents.select(
        "doc_id",
        F.expr(
            f"""CASE WHEN doc_id % 7 = 0 THEN encode(text, 'utf-8')
                     WHEN doc_id % 2 = 0 THEN unhex({_PNG_HEX})
                     ELSE unhex({_JPEG_HEX}) END"""
        ).alias("payload"),
    )
    return image_meta(payloads, "doc_id")


def _u16le(expr: str) -> str:
    """Little-endian u16 as 4 hex chars (engine-shared: hex/lpad/%
    behave identically in Spark SQL and DuckDB)."""
    return (
        f"concat(lpad(hex(({expr}) % 256), 2, '0'),"
        f" lpad(hex((({expr}) DIV 256) % 256), 2, '0'))"
    )


def _u32le(expr: str) -> str:
    return (
        f"concat(lpad(hex(({expr}) % 256), 2, '0'),"
        f" lpad(hex((({expr}) DIV 256) % 256), 2, '0'),"
        f" lpad(hex((({expr}) DIV 65536) % 256), 2, '0'),"
        f" lpad(hex((({expr}) DIV 16777216) % 256), 2, '0'))"
    )


# md5-derived WAV parameters (engine-portable arithmetic)
_WAV_X1 = (
    "cast(conv(substring(md5(concat(cast(doc_id as string), '#wav#')),"
    " 1, 4), 16, 10) as bigint)"
)
_WAV_X2 = (
    "cast(conv(substring(md5(concat(cast(doc_id as string), '#wav#')),"
    " 5, 4), 16, 10) as bigint)"
)
_WAV_CH = f"(1 + {_WAV_X1} % 2)"
_WAV_RATE = (
    f"(CASE {_WAV_X1} % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000"
    " WHEN 2 THEN 22050 ELSE 44100 END)"
)
_WAV_BITS = f"(8 * (1 + ({_WAV_X1} DIV 7) % 2))"
_WAV_DLEN = f"(1000 + {_WAV_X2} % 9000)"

# 44-byte header-only WAV probe: RIFF/WAVE + complete 16-byte fmt
# chunk + the data chunk HEADER (declared length, bytes not appended
# — chunk-walking parsers stop at end-of-payload, the header-sniff
# shape a metadata scan reads at 100 TB without fetching audio)
_WAV_HEX = (
    "concat('52494646', "  # 'RIFF'
    + _u32le(f"36 + {_WAV_DLEN}")
    + ", '57415645', '666D7420', "  # 'WAVE', 'fmt '
    + _u32le("16")
    + ", "
    + _u16le("1")  # PCM
    + ", "
    + _u16le(_WAV_CH)
    + ", "
    + _u32le(_WAV_RATE)
    + ", "
    + _u32le(f"({_WAV_CH} * {_WAV_RATE} * {_WAV_BITS}) DIV 8")  # byte rate
    + ", "
    + _u16le(f"({_WAV_CH} * {_WAV_BITS}) DIV 8")  # block align
    + ", "
    + _u16le(_WAV_BITS)
    + ", '64617461', "  # 'data'
    + _u32le(_WAV_DLEN)
    + ")"
)


@query(
    "audio_meta",
    f"""
    WITH src AS (
      SELECT doc_id, text,
             1 + ('0x' || substr(md5(doc_id::VARCHAR || '#wav#'), 1, 4))::BIGINT % 2
               AS ch,
             CASE ('0x' || substr(md5(doc_id::VARCHAR || '#wav#'), 1, 4))::BIGINT % 4
                  WHEN 0 THEN 8000 WHEN 1 THEN 16000
                  WHEN 2 THEN 22050 ELSE 44100 END AS rate,
             8 * (1 + (('0x' || substr(md5(doc_id::VARCHAR || '#wav#'), 1, 4))::BIGINT // 7) % 2)
               AS bits,
             1000 + ('0x' || substr(md5(doc_id::VARCHAR || '#wav#'), 5, 4))::BIGINT % 9000
               AS dlen
      FROM documents),
    built AS (
      SELECT doc_id, text,
        CASE WHEN doc_id % 5 = 0 THEN NULL ELSE
          '52494646' ||
          concat(lpad(hex((36 + dlen) % 256), 2, '0'),
                 lpad(hex(((36 + dlen) // 256) % 256), 2, '0'),
                 lpad(hex(((36 + dlen) // 65536) % 256), 2, '0'),
                 lpad(hex(((36 + dlen) // 16777216) % 256), 2, '0')) ||
          '57415645' || '666D7420' || '10000000' || '0100' ||
          concat(lpad(hex(ch % 256), 2, '0'),
                 lpad(hex((ch // 256) % 256), 2, '0')) ||
          concat(lpad(hex(rate % 256), 2, '0'),
                 lpad(hex((rate // 256) % 256), 2, '0'),
                 lpad(hex((rate // 65536) % 256), 2, '0'),
                 lpad(hex((rate // 16777216) % 256), 2, '0')) ||
          concat(lpad(hex((ch * rate * bits // 8) % 256), 2, '0'),
                 lpad(hex(((ch * rate * bits // 8) // 256) % 256), 2, '0'),
                 lpad(hex(((ch * rate * bits // 8) // 65536) % 256), 2, '0'),
                 lpad(hex(((ch * rate * bits // 8) // 16777216) % 256), 2, '0')) ||
          concat(lpad(hex((ch * bits // 8) % 256), 2, '0'),
                 lpad(hex(((ch * bits // 8) // 256) % 256), 2, '0')) ||
          concat(lpad(hex(bits % 256), 2, '0'),
                 lpad(hex((bits // 256) % 256), 2, '0')) ||
          '64617461' ||
          concat(lpad(hex(dlen % 256), 2, '0'),
                 lpad(hex((dlen // 256) % 256), 2, '0'),
                 lpad(hex((dlen // 65536) % 256), 2, '0'),
                 lpad(hex((dlen // 16777216) % 256), 2, '0'))
        END AS hx
      FROM src),
    -- byte-parse REPLAY over the constructed hex (fixed offsets: this
    -- construction emits exactly one fmt then one data chunk): LE u16
    -- at fmt+2 = channels, LE u32 at fmt+4 = rate, LE u16 at fmt+14 =
    -- bits, LE u32 after 'data' = declared data length
    parsed AS (
      SELECT doc_id,
        CASE WHEN hx IS NULL THEN CAST(octet_length(encode(text)) AS BIGINT)
             ELSE CAST(strlen(hx) // 2 AS BIGINT) END AS n_bytes,
        CASE WHEN hx IS NULL THEN 'unknown' ELSE 'wav' END AS format,
        ('0x' || substr(hx, 47, 2) || substr(hx, 45, 2))::BIGINT AS p_ch,
        ('0x' || substr(hx, 55, 2) || substr(hx, 53, 2)
              || substr(hx, 51, 2) || substr(hx, 49, 2))::BIGINT AS p_rate,
        ('0x' || substr(hx, 71, 2) || substr(hx, 69, 2))::BIGINT AS p_bits,
        ('0x' || substr(hx, 87, 2) || substr(hx, 85, 2)
              || substr(hx, 83, 2) || substr(hx, 81, 2))::BIGINT AS p_dlen
      FROM built)
    SELECT doc_id, n_bytes, format,
           p_ch AS channels, p_rate AS sample_rate,
           p_bits AS bits_per_sample,
           CAST(floor(p_dlen /
                (p_ch * p_rate * (p_bits // 8) / 1000.0)) AS BIGINT)
             AS duration_ms
    FROM parsed
    """,
    doc="Audio metadata catalog row (operators/multimodal.audio_meta, "
    "the RIFF/WAVE header parser): deterministic 44-byte header-only "
    "WAV probes built from doc_id (md5-derived channels/rate/bit "
    "depth/declared data length, little-endian construction shared "
    "verbatim between engines), every 5th doc a non-audio payload "
    "degrading to format='unknown'. The oracle rebuilds the identical "
    "bytes as hex and replays the parse by little-endian slicing — "
    "byte-exact parity, completing the multimodal trio next to "
    "binary_meta and image_meta.",
)
def audio_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.multimodal import (
        audio_meta,
    )

    (documents,) = load(spark, sf_dir, "documents")
    payloads = documents.select(
        "doc_id",
        F.expr(
            f"""CASE WHEN doc_id % 5 = 0 THEN encode(text, 'utf-8')
                     ELSE unhex({_WAV_HEX}) END"""
        ).alias("payload"),
    )
    return audio_meta(payloads, "doc_id")


@query(
    "repetition_stats",
    f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    base AS (
      SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1]) AS bi
      FROM d WHERE len(toks) >= 2),
    tokpos0 AS (
      SELECT doc_id, toks, unnest(range(1, len(toks)+1)) AS i FROM base),
    tokpos AS (
      SELECT doc_id, i, toks[i] AS tok,
             i - row_number() OVER (PARTITION BY doc_id, toks[i] ORDER BY i)
               AS island
      FROM tokpos0),
    runs AS (
      SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS max_run FROM (
        SELECT doc_id, tok, island, COUNT(*) AS cnt
        FROM tokpos GROUP BY doc_id, tok, island) t
      GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks)
             AS dup_word_frac,
           CAST(list_max(list_transform(list_distinct(bi),
                  x -> len(list_filter(bi, y -> y = x)))) AS DOUBLE) / len(bi)
             AS top_bigram_frac,
           r.max_run
    FROM base b JOIN runs r ON r.doc_id = b.doc_id
    """,
    doc="Gopher-style repetition quality signals per doc: duplicate-word "
    "fraction, most-frequent-bigram share, longest identical-token run "
    "(sequential struct fold). Spark side is map-only row-local exprs; "
    "the oracle rebuilds max_run with a gaps-and-islands window.",
)
def repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return repetition_stats(documents, "doc_id", "text")


#: Synthetic-PII construction shared by the Spark query and the
#: oracle: the testdata documents are clean word soup, so the query
#: deterministically plants an email, a phone, and an IPv4 per doc
#: from table columns — detection/redaction then has non-trivial
#: matches whose spans both engines must agree on exactly.
#: The r6 extension plants a full-form IPv6 (last hextet varies per
#: doc; decimal digits are valid hex) and a credit card that
#: ALTERNATES Luhn validity: even doc_ids carry 4111-1111-1111-1111
#: (valid -> must redact), odd ones 4111 1111 1111 1112 (fails Luhn
#: -> must survive VERBATIM in the redacted string, proving the gate).
_PII_BUILT_SQL = (
    "'contact user' || CAST(doc_id AS VARCHAR) || '@' || source"
    " || '.com or 555-'"
    " || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')"
    " || ' srv 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    " || CAST(doc_id * 3 % 256 AS VARCHAR)"
    " || ' v6 2001:0db8:85a3:0000:0000:8a2e:0370:'"
    " || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')"
    " || ' card ' || CASE WHEN doc_id % 2 = 0 THEN '4111-1111-1111-1111'"
    "                     ELSE '4111 1111 1111 1112' END"
    " || ' ' || substr(text, 1, 80)"
)


def _luhn_sql(var: str) -> str:
    """DuckDB mirror of operators/text._luhn_ok: same strip, same
    reversed index walk, same doubling CASE arithmetic."""
    d = f"regexp_replace({var}, '[-. ]', '', 'g')"
    x = f"CAST(substr(reverse({d}), i, 1) AS INT)"
    return (
        f"(list_sum(list_transform(range(1, len({d}) + 1),"
        f" i -> CASE WHEN i % 2 = 0"
        f" THEN CASE WHEN {x} * 2 > 9 THEN {x} * 2 - 9 ELSE {x} * 2 END"
        f" ELSE {x} END)) % 10 = 0)"
    )


def _pii_oracle() -> str:
    from python_stream_processing_framework_spark.operators.text import (
        CCARD_PATTERN,
    )

    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat in PII_PATTERNS
    )
    ccard_count = (
        f"CAST(len(list_filter(regexp_extract_all(text, '{CCARD_PATTERN}'),"
        f" c -> {_luhn_sql('c')})) AS BIGINT) AS n_ccard"
    )
    name0, pat0 = PII_PATTERNS[0]  # email first, matching redact_pii
    red = f"regexp_replace(text, '{pat0}', '[{name0.upper()}]', 'g')"
    # Luhn-gated literal-replace fold over the email-redacted text:
    # list_prepend seeds list_reduce's accumulator (DuckDB has no
    # explicit init), mirroring F.aggregate(valid, init, replace).
    red = (
        f"list_reduce(list_prepend({red},"
        f" list_filter(regexp_extract_all({red}, '{CCARD_PATTERN}'),"
        f" c -> {_luhn_sql('c')})),"
        f" (acc, c) -> replace(acc, c, '[CCARD]'))"
    )
    for name, pat in PII_PATTERNS[1:]:
        red = f"regexp_replace({red}, '{pat}', '[{name.upper()}]', 'g')"
    total = " + ".join(
        ["n_ccard"] + [f"n_{name}" for name, _ in PII_PATTERNS]
    )
    return f"""
    WITH built AS (SELECT doc_id, {_PII_BUILT_SQL} AS text FROM documents),
    c AS (SELECT doc_id,
           {counts},
           {ccard_count},
           {red} AS redacted
          FROM built)
    SELECT doc_id, n_email, n_ipv6, n_ipv4, n_phone, n_ccard,
           CAST({total} AS BIGINT) AS n_pii, redacted
    FROM c
    """


@query(
    "pii_redaction",
    _pii_oracle(),
    doc="PII scrubbing pass: per-doc email/IPv6/IPv4/phone/credit-card "
    "counts (regexp_count + a Luhn extract-filter fold, map-only) + "
    "category-token redaction in the fixed order email -> Luhn-gated "
    "card fold -> ipv6 -> ipv4 -> phone. Patterns live in the common "
    "Java-regex/RE2 subset, so both engines agree on every span; the "
    "redacted STRING itself is value-compared, not just the counts — "
    "including that Luhn-INVALID card numbers survive verbatim (odd "
    "doc_ids plant one), pinning the false-positive gate.",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    built = documents.select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@"),
            F.col("source"),
            F.lit(".com or 555-"),
            F.lpad((F.col("doc_id") % 900 + 100).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
            F.lit(" srv 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") * 3 % 256).cast("string"),
            F.lit(" v6 2001:0db8:85a3:0000:0000:8a2e:0370:"),
            F.lpad((F.col("doc_id") * 13 % 10000).cast("string"), 4, "0"),
            F.lit(" card "),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit("4111-1111-1111-1111")
            ).otherwise(F.lit("4111 1111 1111 1112")),
            F.lit(" "),
            F.substring(F.col("text"), 1, 80),
        ).alias("text"),
    )
    # counts + redaction in ONE map-only pass (pii_stats keeps the
    # text column it's given alongside the id, so redact_pii can chain
    # onto the same projection) — joining two derivations of the same
    # frame on doc_id would add a pointless shuffle to a query that
    # needs none.
    stats = pii_stats(built, "doc_id", "text", keep_cols=("text",))
    return redact_pii(stats, "text", output_col="redacted").drop("text")


@query(
    "url_domains",
    """
    WITH built AS (
      SELECT doc_id,
             'see https://' || source || '.example-' || lang || '.com/p/'
               || CAST(doc_id AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0
                       THEN ' and https://mirror-' || source || '.net/x'
                       ELSE '' END AS text
      FROM documents),
    hosts AS (
      SELECT doc_id,
             lower(unnest(regexp_extract_all(
               text, 'https?://(?:[^\\s/?#"'']*@)?([^\\s/:@?#"'']+)', 1)))
               AS domain
      FROM built)
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_refs,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM hosts GROUP BY domain
    """,
    doc="URL-domain extraction + per-domain link stats (the shape of a "
    "blocklist/link-spam hygiene pass): regexp_extract_all host "
    "capture, map-side explode, one groupBy shuffle. The blocklist "
    "filter itself (broadcast semi-join, filter_url_blocklist) is "
    "unit-tested; this row pins the extraction+count semantics.",
)
def url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    built = documents.select(
        "doc_id",
        F.concat(
            F.lit("see https://"),
            F.col("source"),
            F.lit(".example-"),
            F.col("lang"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" and https://mirror-"), F.col("source"), F.lit(".net/x")
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return (
        extract_url_domains(built, "doc_id", "text")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_refs"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
    )


@query(
    "doc_chunks",
    """
    WITH t AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
      FROM documents),
    ok AS (
      SELECT * FROM t
      WHERE len(toks) > 0 AND NOT (len(toks) = 1 AND toks[1] = '')),
    n AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE CAST(ceil((len(toks) - 8) / 24.0) AS INT) END AS nc
      FROM ok)
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           CAST(len(toks[i*24+1 : i*24+32]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text
    FROM n, unnest(range(0, nc)) AS u(i)
    """,
    doc="Document chunking (operators/text.chunk_documents): 32-token "
    "windows with 8-token overlap (stride 24), final partial chunk "
    "keeps the tail, blank docs drop — the step in front of "
    "bounded-context embedding models, whose output pooled_retrieval "
    "re-aggregates. One map-side projection + explode, no shuffle "
    "(plan-pinned); the oracle replays the slice arithmetic with "
    "DuckDB list slicing and the chunk TEXT itself is value-compared.",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.text import (
        chunk_documents,
    )

    (documents,) = load(spark, sf_dir, "documents")
    return chunk_documents(
        documents, "doc_id", "text", chunk_tokens=32, overlap=8
    )


def _gopher_oracle() -> str:
    from python_stream_processing_framework_spark.operators.text import (
        GOPHER_STOPWORDS,
    )

    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split(trim(text), ' ') AS words,
             string_split(text, chr(10)) AS lines,
             {_TOKS} AS toks
      FROM documents),
    c AS (
      SELECT doc_id,
        CAST(len(words) AS BIGINT) AS n_words,
        len(words) BETWEEN 50 AND 100000 AS ok_word_count,
        CAST(list_sum(list_transform(words, w -> length(w)))
             AS DOUBLE) / len(words) BETWEEN 3.0 AND 10.0
          AS ok_mean_word_len,
        CAST(length(text) - length(replace(text, '#', ''))
             + len(regexp_extract_all(text, '\\.\\.\\.|…'))
             AS DOUBLE) / len(words) < 0.1 AS ok_symbol_ratio,
        CAST(len(list_filter(lines,
               l -> regexp_matches(ltrim(l), '^[-*•]')))
             AS DOUBLE) / len(lines) < 0.9 AS ok_bullet_lines,
        CAST(len(list_filter(lines,
               l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
             AS DOUBLE) / len(lines) < 0.3 AS ok_ellipsis_lines,
        CAST(len(list_filter(words,
               w -> regexp_matches(w, '[A-Za-z]')))
             AS DOUBLE) / len(words) >= 0.8 AS ok_alpha_words,
        len(list_intersect(list_distinct(toks), [{stops}])) >= 2
          AS ok_stopwords
      FROM t)
    SELECT doc_id, n_words,
           coalesce(ok_word_count, FALSE) AS ok_word_count,
           coalesce(ok_mean_word_len, FALSE) AS ok_mean_word_len,
           coalesce(ok_symbol_ratio, FALSE) AS ok_symbol_ratio,
           coalesce(ok_bullet_lines, FALSE) AS ok_bullet_lines,
           coalesce(ok_ellipsis_lines, FALSE) AS ok_ellipsis_lines,
           coalesce(ok_alpha_words, FALSE) AS ok_alpha_words,
           coalesce(ok_stopwords, FALSE) AS ok_stopwords,
           coalesce(ok_word_count AND ok_mean_word_len
             AND ok_symbol_ratio AND ok_bullet_lines
             AND ok_ellipsis_lines AND ok_alpha_words
             AND ok_stopwords, FALSE) AS gopher_pass
    FROM c
    """


@query(
    "gopher_rules",
    _gopher_oracle(),
    doc="The published Gopher document-filter rule battery (operators/"
    "text.gopher_quality_flags): word-count and mean-word-length "
    "bounds, #/ellipsis symbol-to-word ratio, bullet-started and "
    "ellipsis-ended line fractions, alpha-word fraction, stop-word "
    "presence — per-rule booleans plus the conjunction, all row-local "
    "JVM expressions (map-only). Corpus reports break rejections down "
    "by rule, which is why the flags are not pre-folded. On this "
    "synthetic word-soup corpus the stop-word rule rejects everything "
    "— the per-rule columns are what the oracle value-compares.",
)
def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.text import (
        gopher_quality_flags,
    )

    (documents,) = load(spark, sf_dir, "documents")
    return gopher_quality_flags(documents, "doc_id", "text")


def _bpe_oracle() -> str:
    from python_stream_processing_framework_spark.operators.text import (
        BPE_PRETOKEN_PATTERN,
    )

    pat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    contr = r"^''(?:s|t|re|ve|m|ll|d)$"
    return f"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_extract_all(text, '{pat}') AS btoks
      FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
             CAST(len(btoks) AS BIGINT) AS n_bpe_tokens,
             CAST(len(list_filter(btoks,
               x -> regexp_matches(x, '^[\\p{{L}}]+$'))) AS BIGINT)
               AS n_word_tokens,
             CAST(len(list_filter(btoks,
               x -> regexp_matches(x, '^[\\p{{N}}]+$'))) AS BIGINT)
               AS n_num_tokens,
             CAST(len(list_filter(btoks,
               x -> regexp_matches(x, '{contr}'))) AS BIGINT)
               AS n_contraction_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM t)
    SELECT *,
           n_bpe_tokens - n_word_tokens - n_num_tokens
             - n_contraction_tokens AS n_punct_tokens
    FROM c
    """


@query(
    "token_counts",
    _bpe_oracle(),
    doc="Token counting for LLM budget planning (operators/"
    "text.bpe_token_stats): whitespace-token count next to a "
    "GPT-2-style regex pre-tokenization (contraction suffixes, "
    "letter runs, digit runs, punctuation runs — the RE2-safe "
    "subset of the published pattern) with per-class counts. "
    "All-integer output, map-only single scan; the oracle runs "
    "the identical pattern through DuckDB's RE2 — leftmost-first "
    "alternation agrees between engines, pinned over the whole "
    "documents table.",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.text import (
        bpe_token_stats,
    )

    (documents,) = load(spark, sf_dir, "documents")
    return bpe_token_stats(documents, "doc_id", "text")


@query(
    "frequent_ngrams",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    g AS (SELECT unnest(list_distinct(list_transform(
            range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
            AS ngram
          FROM t WHERE len(toks) >= 3)
    SELECT ngram, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM g GROUP BY ngram
    HAVING COUNT(*) >= 2
    ORDER BY doc_freq DESC, ngram LIMIT 25
    """,
    doc="Boilerplate mining (operators/text.frequent_ngrams): the 25 "
    "word trigrams present in the most documents (document frequency "
    "— each doc votes once per distinct gram). The table C4/FineWeb-"
    "style corpus reports lead with, and the input to boilerplate-"
    "removal rules. Map-side gram explode, partial-agg'd groupBy "
    "(shuffle bounded by vocabulary, not corpus), min_df prune, "
    "TakeOrderedAndProject top-k with a deterministic (doc_freq "
    "DESC, ngram) tie-break.",
)
def frequent_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.text import (
        frequent_ngrams,
    )

    (documents,) = load(spark, sf_dir, "documents")
    return frequent_ngrams(documents, "doc_id", "text", n=3, top_k=25, min_df=2)


@query(
    "quality_classifier",
    f"""
    WITH lab AS (
      SELECT doc_id, (lang = 'en') AS y, {_TOKS} AS toks FROM documents),
    tok AS (
      SELECT doc_id, y, unnest(list_distinct(toks)) AS token FROM lab),
    w AS (
      SELECT token,
             SUM(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
             SUM(CASE WHEN y THEN 0 ELSE 1 END) AS n_neg
      FROM tok GROUP BY token),
    wm AS (
      SELECT token,
             (n_pos + 1) * 1000000 // (n_pos + n_neg + 2) AS w_micro
      FROM w),
    s AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_matched,
             SUM(wm.w_micro) AS sw
      FROM (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM lab) t
      JOIN wm USING (token)
      GROUP BY t.doc_id)
    SELECT doc_id, n_matched,
           CAST(sw // n_matched AS BIGINT) AS score_micro
    FROM s
    """,
    doc="Classifier-based quality scoring (operators/classifier.py) — "
    "the DCLM/FineWeb-Edu filter pattern: train token weights from a "
    "weak label in ONE explode+groupBy pass (here: lang='en' as the "
    "positive class, a stand-in for any rule-battery or seed-set "
    "signal), then score every document as the integer mean "
    "positive-class posterior of its distinct tokens via a BROADCAST "
    "join (the corpus never shuffles). All-integer micro-unit "
    "arithmetic — no logs, no float sums — so the oracle replays "
    "train AND score bit-exactly. (The synthetic corpus's lang "
    "column does not control its words, so scores here cluster near "
    "neutral — the row validates the exact train+score pipeline; "
    "class separation under a signal-bearing label is unit-tested "
    "on a crafted corpus.)",
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.classifier import (
        classifier_score,
        classifier_train,
    )

    (documents,) = load(spark, sf_dir, "documents")
    labeled = documents.withColumn("_is_en", F.col("lang") == "en")
    weights = classifier_train(labeled, "doc_id", "text", "_is_en")
    return classifier_score(documents, weights, "doc_id", "text")


@query(
    "boilerplate_removal",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    g AS (SELECT ngram, CAST(COUNT(*) AS BIGINT) AS doc_freq
          FROM (SELECT unnest(list_distinct(list_transform(
                  range(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                  AS ngram
                FROM t WHERE len(toks) >= 3) z
          GROUP BY ngram HAVING COUNT(*) >= 2
          ORDER BY doc_freq DESC, ngram LIMIT 10),
    gl AS (SELECT list(ngram ORDER BY doc_freq DESC, ngram) AS grams
           FROM g)
    SELECT doc_id,
           list_reduce(
             list_prepend(text, coalesce((SELECT grams FROM gl), [])),
             (acc, x) -> replace(acc, x, ' ')) AS text
    FROM documents
    """,
    doc="The mine -> remove boilerplate loop closed (operators/"
    "text.frequent_ngrams -> remove_boilerplate): mine the 10 "
    "highest-document-frequency trigrams, then delete every literal "
    "occurrence corpus-wide (the C4/FineWeb hygiene move). The mined "
    "list is driver-bounded top-k; the removal is a map-only literal "
    "replace fold in (doc_freq DESC, ngram) order — deterministic, "
    "no regex, no shuffle — which the oracle replays with the "
    "identical fold via list_reduce. The rewritten TEXT is "
    "value-compared.",
)
def boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.text import (
        frequent_ngrams,
        remove_boilerplate,
    )

    (documents,) = load(spark, sf_dir, "documents")
    mined = frequent_ngrams(
        documents, "doc_id", "text", n=3, top_k=10, min_df=2
    )
    return remove_boilerplate(documents, "doc_id", "text", mined).select(
        "doc_id", "text"
    )


@query(
    "doc_novelty",
    """
    WITH tok AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
                     1, 15))::BIGINT))) AS g
      FROM tok WHERE len(toks) >= 3),
    tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
    nov AS (
      SELECT doc_id, count(*) AS n_novel
      FROM (SELECT g, min(doc_id) AS doc_id FROM g GROUP BY g)
      GROUP BY doc_id)
    SELECT t.doc_id, t.n_grams,
           coalesce(nv.n_novel, 0) AS n_novel,
           CAST(coalesce(nv.n_novel, 0) * 1000000 // t.n_grams AS BIGINT)
             AS novelty_ppm
    FROM tot t LEFT JOIN nov nv USING (doc_id)
    """,
    doc="Per-document n-gram novelty (operators/text.ngram_novelty): "
    "of each doc's distinct 3-grams, how many occur in no "
    "smaller-id document — the marginal-diversity curve read before "
    "adding a crawl snapshot. Exact integer ppm; gram table "
    "aggregated twice (partial-aggregable min and counts), never "
    "self-joined at corpus size; only doc-level aggregates join.",
)
def doc_novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.text import (
        ngram_novelty,
    )

    (documents,) = load(spark, sf_dir, "documents")
    return ngram_novelty(documents, "doc_id", "text", n=3)


@query(
    "source_overlap",
    """
    WITH tok AS (
      SELECT source, string_split(trim(lower(text)), ' ') AS toks
      FROM documents),
    sg AS (
      SELECT DISTINCT source,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
                     1, 15))::BIGINT))) AS g
      FROM tok WHERE len(toks) >= 3),
    tot AS (SELECT source AS src_a, count(*) AS grams_a FROM sg GROUP BY source),
    sh AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
      FROM sg a JOIN sg b USING (g)
      WHERE a.source != b.source
      GROUP BY a.source, b.source)
    SELECT sh.src_a, sh.src_b, tot.grams_a, sh.shared,
           CAST(sh.shared * 1000000 // tot.grams_a AS BIGINT)
             AS containment_ppm
    FROM sh JOIN tot USING (src_a)
    """,
    doc="Cross-source n-gram containment matrix (operators/text."
    "source_overlap): for each ordered source pair, the ppm of a's "
    "distinct 3-grams also present in b — the dump-overlap table "
    "read before merging crawl snapshots. Grams reduce to distinct "
    "(source, hash60) BEFORE the self-join, so join output is "
    "bounded by vocabulary x sources^2, never corpus mass.",
)
def source_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.text import (
        source_overlap,
    )

    (documents,) = load(spark, sf_dir, "documents")
    return source_overlap(documents, "source", "text", n=3)


@query(
    "source_drift",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(trim(lower(text)), ' ')) AS t
      FROM documents),
    st AS (SELECT source, t, count(*) AS c FROM tok GROUP BY source, t),
    tot AS (SELECT source, sum(c) AS total FROM st GROUP BY source),
    gl AS (SELECT t, sum(c) AS gc FROM st GROUP BY t),
    gt AS (SELECT sum(total) AS gt FROM tot),
    wr AS (
      SELECT st.source AS src,
             CAST(st.c AS HUGEINT) AS c, CAST(gl.gc AS HUGEINT) AS gc,
             CAST(tot.total AS HUGEINT) AS tt,
             CAST(gt.gt - tot.total AS HUGEINT) AS r
      FROM st JOIN gl USING (t) JOIN tot USING (source) CROSS JOIN gt),
    pr AS (SELECT src, max(tt) AS tt, max(r) AS r,
                  sum(abs(c * r - (gc - c) * tt)) AS num_present,
                  sum(gc - c) AS rest_present
           FROM wr GROUP BY src)
    SELECT src, CAST(tt AS BIGINT) AS n_tokens,
           CAST(CASE WHEN r = 0 THEN 1000000
                ELSE (num_present + tt * (r - rest_present)) * 1000000
                     // (2 * tt * r) END AS BIGINT) AS tv_ppm
    FROM pr
    """,
    doc="Per-source token-distribution drift (operators/text."
    "token_drift): total-variation distance between each source's "
    "token distribution and the rest of the corpus, floor(1e6*TV) "
    "computed CROSS-MULTIPLIED in exact integer arithmetic (the only "
    "rounding is the final division — no per-token ppm floor, which "
    "saturated once vocabulary passed 1e6) — the mixture-shift "
    "monitor read when a feed changes character. Corpus collapses "
    "to one partial-aggregable (source, token) count; the compare "
    "is a vocabulary-bounded join; absent-token rest mass enters in "
    "closed form.",
)
def source_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.text import (
        token_drift,
    )

    (documents,) = load(spark, sf_dir, "documents")
    return token_drift(documents, "source", "text")
