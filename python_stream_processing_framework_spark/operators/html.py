"""HTML -> text extraction — the WET-record stage of a crawl pipeline.

Beyond-reference capability (SURVEY §2.7 charter): every web-corpus
pipeline (CCNet, C4, RefinedWeb, FineWeb) starts from raw crawl HTML
and must extract the visible text before any quality pass. The
production extractors (trafilatura, resiliparse) are DOM-based C
libraries; the distributed fallback every WET-style pass uses — and
what Common Crawl's own WET files are — is tag stripping: drop
non-content blocks (script/style/comments), convert block-element
boundaries to line breaks, strip remaining tags, unescape the common
entities, and normalize whitespace.

Scale shape: a pure map-only column expression chain — regexp_replace
and replace are JVM whole-stage-codegen expressions, so extraction
runs where the HTML bytes live with zero shuffles, zero Python, and
the scan reading only (id, html). A DOM-exact extractor slots in
behind the same signature as an Arrow mapInPandas when the corpus
needs one (the multimodal decode pattern).

Determinism (oracle contract): every pattern sits in the common
Java-regex / RE2 subset — inline (?is) flags, non-greedy repetition,
no backreferences, no lookaround — so Spark and DuckDB produce
byte-identical text; the entity pass is a fixed chain of literal
replaces applied in one documented order (specific entities first,
``&amp;`` last).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Non-content blocks dropped wholesale (contents included); the
#: title is head metadata — html_title_expr surfaces it separately.
DROP_BLOCKS = ("script", "style", "title")

#: Closing these (or <br>) marks a paragraph/line boundary.
BLOCK_TAGS = ("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr", "table", "blockquote")

#: Literal entity chain: specific entities first, the ampersand LAST
#: (the classic fixed order; a pre-escaped "&amp;lt;" deliberately
#: unescapes to "&lt;" and stops — no double decode).
ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def html_title_expr(html_col: str) -> Column:
    """The <title> contents, whitespace-normalized ('' when absent)."""
    t = F.regexp_extract(F.col(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_text_expr(html_col: str) -> Column:
    """Visible text of an HTML column, one line per block element."""
    c = F.col(html_col)
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    for tag in DROP_BLOCKS:
        c = F.regexp_replace(c, rf"(?is)<{tag}[^>]*>.*?</{tag}>", " ")
    alts = "|".join(BLOCK_TAGS)
    c = F.regexp_replace(c, rf"(?i)</({alts})>|<br[^>]*>", "\n")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    # horizontal runs -> one space; blank-trimmed lines; squeeze \n;
    # strip boundary newlines (trim() only takes spaces)
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    return F.trim(F.regexp_replace(c, r"^\n+|\n+$", ""))


def extract_html_text(
    df: DataFrame, id_col: str, html_col: str
) -> DataFrame:
    """(id, title, text, n_chars_html, n_chars_text): the extracted
    visible text (one line per block element), the <title>, and the
    raw/extracted sizes (the boilerplate-mass signal crawl pipelines
    threshold on — C4 drops pages whose text is a sliver of the
    markup). Map-only; one pass over the HTML bytes."""
    return df.select(
        F.col(id_col),
        html_title_expr(html_col).alias("title"),
        html_text_expr(html_col).alias("text"),
        F.length(html_col).cast("bigint").alias("n_chars_html"),
        F.length(html_text_expr(html_col)).cast("bigint").alias("n_chars_text"),
    )
