"""HTML extraction (operators/html.py): tag stripping, block
boundaries, drop blocks, entities, title, whitespace normalization."""

from __future__ import annotations

from python_stream_processing_framework_spark.operators.html import extract_html_text


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    (row,) = extract_html_text(df, "doc_id", "html").collect()
    return row


def test_basic_page(spark):
    row = _extract(
        spark,
        "<html><head><title> My  Page </title><style>p{color:red}</style>"
        "</head><body><!-- nav goes here --><h1>Header</h1>"
        "<p>First para.</p><p>Second para.</p>"
        "<script>var x = 1 < 2;</script></body></html>",
    )
    assert row["title"] == "My Page"
    assert row["text"] == "Header\nFirst para.\nSecond para."
    assert row["n_chars_html"] > row["n_chars_text"] > 0


def test_entities_fixed_order_no_double_decode(spark):
    row = _extract(spark, "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y</p>")
    assert row["text"] == "a & b <tag> \"q\" 's' x y"
    # pre-escaped &amp;lt; unescapes ONCE to the literal "&lt;"
    row = _extract(spark, "<p>&amp;lt;</p>")
    assert row["text"] == "&lt;"


def test_br_and_inline_tags(spark):
    row = _extract(spark, "one<br>two<br/>three <b>bold</b> <a href='x'>link</a>")
    assert row["text"] == "one\ntwo\nthree bold link"


def test_script_with_angle_brackets_and_comments(spark):
    row = _extract(
        spark,
        "<p>keep</p><script type='text/javascript'>if (a<b && c>d) {}</script>"
        "<!-- <p>commented out</p> --><p>also keep</p>",
    )
    assert row["text"] == "keep\nalso keep"


def test_nested_blocks_collapse_blank_lines(spark):
    row = _extract(
        spark,
        "<div><ul><li>a</li><li>b</li></ul></div>"
        "<table><tr><td>c</td></tr></table>",
    )
    assert row["text"] == "a\nb\nc"


def test_no_title_no_markup(spark):
    row = _extract(spark, "plain   text only")
    assert row["title"] == ""
    assert row["text"] == "plain text only"
