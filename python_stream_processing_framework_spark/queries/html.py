"""HTML-extraction catalog query (operators/html.py).

The synthetic documents are plain text, so the query first wraps each
one in a deterministic page — title, style block, comment, header,
body paragraph, script with raw angle brackets, entity-laden footer —
then runs the real extractor (the pii_redaction planting pattern).
The oracle rebuilds the SAME page and replays the extraction chain
step by step in DuckDB; every pattern sits in the Java-regex/RE2
common subset and the entity pass is the same fixed replace chain
(built programmatically from the operator's own DROP_BLOCKS /
BLOCK_TAGS / ENTITIES constants, so the two can never drift), and
the extracted STRING itself is value-compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.html import (
    BLOCK_TAGS,
    DROP_BLOCKS,
    ENTITIES,
    extract_html_text,
)
from python_stream_processing_framework_spark.queries.base import query

_PAGE_PREFIX = "<html><head><title>Doc "
_PAGE_MID = (
    " &amp; co</title><style>p{margin:0}</style></head><body><!-- crawl -->"
    "<h1>"
)
_PAGE_TAIL = (
    "</p><script>if(1<2){go()}</script>"
    '<p>tail &lt;b&gt; &quot;q&quot;&nbsp;&#39;s&#39;</p></body></html>'
)


def _oracle() -> str:
    # the extraction chain, step for step as html_text_expr applies it
    t = "html"
    t = f"regexp_replace({t}, '(?s)<!--.*?-->', ' ', 'g')"
    for tag in DROP_BLOCKS:
        t = f"regexp_replace({t}, '(?is)<{tag}[^>]*>.*?</{tag}>', ' ', 'g')"
    alts = "|".join(BLOCK_TAGS)
    t = f"regexp_replace({t}, '(?i)</({alts})>|<br[^>]*>', chr(10), 'g')"
    t = f"regexp_replace({t}, '<[^>]+>', ' ', 'g')"
    for ent, rep in ENTITIES:
        lit = rep.replace("'", "''")
        t = f"replace({t}, '{ent}', '{lit}')"
    t = f"regexp_replace({t}, '[ \\t\\r\\f]+', ' ', 'g')"
    t = f"regexp_replace({t}, ' ?\\n ?', chr(10), 'g')"
    t = f"regexp_replace({t}, '\\n+', chr(10), 'g')"
    t = f"trim(regexp_replace({t}, '^\\n+|\\n+$', '', 'g'))"
    title = (
        "trim(regexp_replace(regexp_extract(html, "
        "'(?is)<title[^>]*>(.*?)</title>', 1), '\\s+', ' ', 'g'))"
    )
    return f"""
    WITH built AS (
      SELECT doc_id,
             '{_PAGE_PREFIX}' || doc_id || '{_PAGE_MID}' || source
             || '</h1><p>' || substr(text, 1, 100) || '{_PAGE_TAIL}' AS html
      FROM documents),
    ex AS (
      SELECT doc_id, {title} AS title, {t} AS text,
             CAST(length(html) AS BIGINT) AS n_chars_html
      FROM built)
    SELECT doc_id, title, text, n_chars_html,
           CAST(length(text) AS BIGINT) AS n_chars_text
    FROM ex ORDER BY doc_id
    """


@query(
    "html_extract",
    _oracle(),
    doc="WET-style HTML -> text extraction (operators/html.py "
    "extract_html_text; the stage C4/CCNet/RefinedWeb pipelines run "
    "before any quality pass): wrap every document in a deterministic "
    "page, then drop script/style/title blocks and comments, convert "
    "block-element closes and <br> to line breaks, strip remaining "
    "tags, unescape the common entities in a fixed order, and "
    "normalize whitespace. Pure map-only JVM regexp chain — zero "
    "shuffles, zero Python; titles and the raw/extracted char sizes "
    "(the C4 boilerplate-mass signal) ride along. Oracle rebuilds the "
    "page and replays the chain step-for-step from the operator's own "
    "constants; the extracted strings value-compare bit-exact.",
)
def html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    built = documents.select(
        "doc_id",
        F.concat(
            F.lit(_PAGE_PREFIX),
            F.col("doc_id").cast("string"),
            F.lit(_PAGE_MID),
            F.col("source"),
            F.lit("</h1><p>"),
            F.substring(F.col("text"), 1, 100),
            F.lit(_PAGE_TAIL),
        ).alias("html"),
    )
    # no orderBy: the parity/driver compares sort rows themselves, and
    # a global sort would put an exchange under a map-only query
    return extract_html_text(built, "doc_id", "html")
