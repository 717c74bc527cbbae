"""HTML -> text extraction (feathr_spark/operators/extract.py).

Semantics pinned here; dialect parity (Spark vs the DuckDB replay of
the identical regex pipeline) is pinned by the ``html_extract`` row in
test_driver_contract.py over real testdata.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feathr_spark.operators.extract import (decode_entities, html_features,
                                            html_title, html_to_text,
                                            with_html_extraction)


def _extract_one(spark, html: str) -> dict:
    row = (
        spark.createDataFrame([(html,)], "html string")
        .select(html_to_text("html").alias("text"),
                html_title("html").alias("title"),
                *[v.alias(k) for k, v in html_features("html").items()])
        .first()
    )
    return row.asDict()


def test_basic_structure(spark):
    r = _extract_one(spark, (
        '<html><head><title>My &amp; Title</title>'
        '<style>p {color:red}</style>'
        '<script>var x = "<p>decoy</p>";</script></head>'
        '<body><h1>Head</h1><p>one para.</p><p>two para.</p>'
        '<a href="/x">a link</a></body></html>'))
    assert r["title"] == "My & Title"
    # head (incl. title/style/script decoys) gone; block tags -> newlines;
    # inline <a> -> space
    # inline <a> contributes no line break of its own, so the link text
    # lands right after the final paragraph's newline
    assert r["text"] == "Head\n\none para.\n\ntwo para.\na link"
    assert r["n_links"] == 1
    assert r["n_tags"] > 0


def test_entities_decode_amp_last(spark):
    # '&amp;lt;' must decode to the literal text '&lt;', NOT '<'
    r = _extract_one(spark, "<body><p>a &amp;lt; b &lt;c&gt; &quot;d&quot; "
                            "&#39;e&#39;&nbsp;f</p></body>")
    assert r["text"] == 'a &lt; b <c> "d" \'e\' f'


def test_missing_title_and_empty(spark):
    r = _extract_one(spark, "<body><p>no title here at all.</p></body>")
    assert r["title"] == ""
    r0 = _extract_one(spark, "")
    assert r0["text"] == "" and r0["title"] == ""
    assert r0["text_html_ratio"] == 0.0


def test_br_variants_and_comments(spark):
    r = _extract_one(spark, "<p>x<br>y<br/>z<br />w</p><!-- hidden\n"
                            "two-line comment -->tail")
    assert r["text"] == "x\ny\nz\nw\ntail"


def test_whitespace_normalization(spark):
    r = _extract_one(spark, "<div>  a   b\t c </div><div></div><div></div>"
                            "<div>  d  </div>")
    # runs collapse, empty blocks collapse to a paragraph break at most
    assert r["text"] == "a b c\n\nd"


def test_script_with_attributes_and_case(spark):
    r = _extract_one(spark, '<SCRIPT type="a">alert(1)</SCRIPT>'
                            "<Style>x</Style><P>kept.</p>")
    assert r["text"] == "kept."


def test_decode_entities_column(spark):
    out = (spark.range(1)
           .select(decode_entities(F.lit("&gt;&amp;amp;")).alias("x"))
           .first())
    assert out["x"] == ">&amp;"


def test_with_html_extraction_matches_column_api(spark):
    htmls = [
        ('<html><head><title>T1</title></head><body><p>alpha beta.</p>'
         '<a href="u">l</a></body></html>',),
        ("<body><div>gamma &amp; delta</div></body>",),
        ("plain text, no tags at all",),
    ]
    df = spark.createDataFrame(htmls, "html string")
    staged = with_html_extraction(df).collect()
    direct = df.select(
        html_to_text("html").alias("text"),
        html_title("html").alias("title"),
        *[v.alias(k) for k, v in html_features("html").items()]).collect()
    for s, d in zip(staged, direct):
        assert s["text"] == d["text"]
        assert s["title"] == d["title"]
        assert s["n_links"] == d["n_links"]
        assert s["n_tags"] == d["n_tags"]
        assert abs(s["text_html_ratio"] - d["text_html_ratio"]) < 1e-12


def test_no_tags_passthrough(spark):
    r = _extract_one(spark, "just ordinary words with 3 < 5 kept")
    # a lone '<' with no closing '>' is not a tag; text survives
    assert "ordinary words" in r["text"]
