"""HTML -> text extraction — the raw-web stage AHEAD of every curation
operator (language ID, Gopher/C4 rules, dedup all consume extracted
text). The production analogue is trafilatura/WET extraction; this is
the engine-portable core of that recipe: structural tag handling, tag
stripping, entity decoding, and whitespace normalization as pure JVM
regex/replace expressions — whole-stage codegen, zero shuffle, no
Python in the hot path.

Reference analogue: row-level preprocessing ahead of anchors
(feathr-impl/src/main/scala/com/linkedin/feathr/offline/anchored/
anchorExtractor/SQLConfigurableAnchorExtractor.scala applies SQL
transforms to raw source rows before feature extraction; HTML -> text
is the same stage for a web corpus).

Dialect-portability contract (this is what makes the DuckDB oracle
able to replay extraction byte-for-byte): every regex used here avoids
backreferences (RE2 has none), uses only inline flags ``(?i)``/
``(?s)``, ASCII classes, ``\\b`` word boundaries, and lazy ``.*?`` —
identical semantics in Java regex and RE2. Entity decoding is literal
``replace`` (identical left-to-right non-overlapping semantics in
both engines), with ``&amp;`` decoded LAST so ``&amp;lt;`` yields the
literal text ``&lt;`` rather than ``<``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# script/style bodies vanish entirely (two passes — RE2 has no
# backreferences, so <(script|style)>.*?</\1> is not portable)
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
# the whole <head> section (title/meta/link) is metadata, not body text
_HEAD_RE = r"(?is)<head\b[^>]*>.*?</head\s*>"
# block-level open/close tags become line breaks so document structure
# (paragraphs, list items, rows, headings) survives tag stripping
_BLOCK_RE = r"(?is)</?(?:p|div|li|ul|ol|table|tr|td|th|h[1-6]|blockquote|section|article|header|footer|br|hr)\b[^>]*>"
# everything else (<a ...>, <span>, <b>, unknown tags) becomes a space
_TAG_RE = r"(?s)<[^>]*>"
_TITLE_RE = r"(?is)<title\b[^>]*>([^<]*)</title\s*>"
_ANCHOR_RE = r"(?is)<a\b[^>]*>"

# literal entity decode order: &amp; strictly last (see module doc)
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def decode_entities(text: Column | str) -> Column:
    """Decode the common HTML entities literally (``&amp;`` last)."""
    c = _col(text)
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def _normalize_ws(c: Column) -> Column:
    # horizontal runs -> one space; spaces hugging a newline vanish;
    # 3+ blank lines -> paragraph break; strip leading/trailing ws
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.regexp_replace(c, r"(?s)^\s+|\s+$", "")


def html_to_text(html: Column | str) -> Column:
    """Extracted plain text of an HTML document: drop script/style/
    comments, turn block tags into line breaks, strip residual tags,
    decode entities, normalize whitespace. One codegen'd expression
    chain — row-local, zero shuffle, linear in input bytes."""
    c = _col(html)
    c = F.regexp_replace(c, _SCRIPT_RE, "")
    c = F.regexp_replace(c, _STYLE_RE, "")
    c = F.regexp_replace(c, _COMMENT_RE, "")
    c = F.regexp_replace(c, _HEAD_RE, "")
    c = F.regexp_replace(c, _BLOCK_RE, "\n")
    c = F.regexp_replace(c, _TAG_RE, " ")
    c = decode_entities(c)
    return _normalize_ws(c)


def html_title(html: Column | str) -> Column:
    """``<title>`` text (first match; entity-decoded, ws-normalized);
    empty string when absent."""
    t = F.regexp_extract(_col(html), _TITLE_RE, 1)
    return _normalize_ws(decode_entities(t))


def html_features(html: Column | str) -> dict[str, Column]:
    """Structural metrics used by extraction-quality filters:
    ``n_links`` (anchor tags), ``n_tags`` (all tags outside script/
    style/comment bodies), ``text_html_ratio`` (extracted-text length /
    raw length — boilerplate-heavy pages score low; the standard WET
    quality gate)."""
    raw = _col(html)
    stripped = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(raw, _SCRIPT_RE, ""),
                         _STYLE_RE, ""), _COMMENT_RE, "")
    text = html_to_text(raw)
    return {
        "n_links": F.size(F.regexp_extract_all(stripped, F.lit(_ANCHOR_RE), 0)),
        "n_tags": F.size(F.regexp_extract_all(stripped, F.lit(_TAG_RE), 0)),
        "text_html_ratio": F.when(
            F.length(raw) > 0,
            F.length(text).cast("double") / F.length(raw)).otherwise(F.lit(0.0)),
    }


def with_html_extraction(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    title_col: str = "title",
    metrics_prefix: str = "",
) -> DataFrame:
    """Stage extraction once per row: adds ``text_col`` (extracted
    text), ``title_col``, and the :func:`html_features` columns. The
    shared script/style/comment-stripped intermediate lives in its own
    projection so it is computed once, not once per output column.

    ``metrics_prefix`` renames the structure-metric outputs
    (``n_links``/``n_tags``/``text_html_ratio``) so a caller staging
    extraction inside a pipeline can use collision-proof internal names
    (e.g. ``__``) and drop exactly those, without clobbering same-named
    input columns."""
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(html_col), _SCRIPT_RE, ""),
            _STYLE_RE, ""),
        _COMMENT_RE, "")
    staged = df.withColumn("__stripped", stripped)
    body = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("__stripped"), _HEAD_RE, ""),
            _BLOCK_RE, "\n"),
        _TAG_RE, " ")
    text = _normalize_ws(decode_entities(body))
    out = (
        staged
        .withColumn(text_col, text)
        .withColumn(title_col, html_title(F.col(html_col)))
        .withColumn(metrics_prefix + "n_links",
                    F.size(F.regexp_extract_all(F.col("__stripped"),
                                                F.lit(_ANCHOR_RE), 0)))
        .withColumn(metrics_prefix + "n_tags",
                    F.size(F.regexp_extract_all(F.col("__stripped"),
                                                F.lit(_TAG_RE), 0)))
        .withColumn(metrics_prefix + "text_html_ratio",
                    F.when(F.length(F.col(html_col)) > 0,
                           F.length(F.col(text_col)).cast("double")
                           / F.length(F.col(html_col)))
                    .otherwise(F.lit(0.0)))
    )
    return out.drop("__stripped")
