"""End-to-end corpus curation: one call composing the curation operators
in the standard pretraining-data order.

The individual operators (Gopher/C4 quality rules, language ID,
line-level boilerplate dedup, exact + MinHash-LSH near-dup dedup,
benchmark decontamination, per-source caps) each carry their own oracle
contract query; this module is the product surface that chains them the
way a real curation run does (cheap row-local filters first so the
expensive shuffled dedup stages see the smallest possible corpus, caps
last so dedup can't resurrect an over-capped source):

    language filter -> Gopher rules -> C4 rules -> line dedup ->
    exact dedup -> MinHash near-dup dedup -> decontamination ->
    per-source cap

Every stage is optional; the return value is (curated DataFrame,
stage report). With ``track_counts=False`` (the 100 TB default) the
stages compose into ONE lazy plan — no counting actions — and Catalyst
pipelines all row-local filters into a single scan stage; the only
exchanges are the ones the enabled dedup/cap stages inherently need.
``track_counts=True`` materializes a per-stage row count (one action
per stage boundary) for funnel observability at test scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    html_col: Optional[str] = None,
    min_text_html_ratio: Optional[float] = None,
    languages: Sequence[str] = (),
    gopher: bool = False,
    gopher_thresholds: Optional[dict] = None,
    c4: bool = False,
    c4_thresholds: Optional[dict] = None,
    lottery_alpha: Optional[float] = None,
    lottery_score_col: Optional[str] = None,
    clean_lines: bool = False,
    line_kwargs: Optional[dict] = None,
    exact: bool = True,
    near_dup: bool = False,
    near_dup_kwargs: Optional[dict] = None,
    benchmark: Optional[DataFrame] = None,
    contamination_n: int = 13,
    max_per_source: Optional[int] = None,
    cap_order: Sequence[str] = (),
    track_counts: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Run the curation funnel over ``docs``; returns the curated frame
    (original columns, ``text_col`` rewritten by the line stages when
    enabled) and a ``[{stage, rows}]`` report (rows are None unless
    ``track_counts``)."""
    report: list[dict] = []

    def note(stage: str, df: DataFrame) -> DataFrame:
        report.append({"stage": stage,
                       "rows": df.count() if track_counts else None})
        return df

    out = note("input", docs)

    if html_col is not None:
        # raw-web entry point: extract text (and the WET-style
        # structure metrics) before any text-based stage; row-local
        # regex codegen, fuses into the same scan as the filters below.
        # Internal __-prefixed names for the stage outputs so a corpus
        # that already carries title/n_links/n_tags/text_html_ratio
        # columns is not clobbered; the raw html column is dropped from
        # the curated output (it served its purpose and would dominate
        # the downstream shuffle payload otherwise).
        from feathr_spark.operators.extract import with_html_extraction
        extracted = with_html_extraction(out, html_col=html_col,
                                         text_col=text_col,
                                         title_col="__title",
                                         metrics_prefix="__")
        if min_text_html_ratio is not None:
            extracted = extracted.where(
                F.col("__text_html_ratio") >= min_text_html_ratio)
        out = note("extract", extracted.drop(
            "__title", "__n_links", "__n_tags", "__text_html_ratio",
            html_col))

    if languages:
        from feathr_spark.operators.text import detect_language
        out = note("language", out.where(
            detect_language(F.col(text_col)).isin(list(languages))))

    if gopher:
        from feathr_spark.operators.text import with_gopher_rules
        flagged = with_gopher_rules(out, text_col,
                                    **(gopher_thresholds or {}))
        rule_cols = [c for c in flagged.columns if c not in out.columns]
        out = note("gopher", flagged.where(F.col("gopher_pass"))
                   .drop(*rule_cols))

    if c4:
        from feathr_spark.operators.text import with_c4_rules
        flagged = with_c4_rules(out, text_col, **(c4_thresholds or {}))
        rule_cols = [c for c in flagged.columns if c not in out.columns]
        # keep the cleaned text (C4 is a line filter, not just a gate)
        out = (flagged.where(F.col("c4_pass"))
               .withColumn(text_col, F.col("c4_clean_text"))
               .drop(*rule_cols))
        out = note("c4", out)

    if lottery_alpha is not None:
        # GPT-3 soft quality filter (Brown et al. 2020 App. A): keep iff
        # Pareto(alpha) > 1 - score. Deterministic draw -> the funnel
        # stays retry/resume-stable. Row-local, fuses into the same
        # scan stage as the rule filters above.
        from feathr_spark.operators.selection import apply_quality_lottery
        from feathr_spark.operators.text import quality_score
        if lottery_score_col is None:
            staged = out.withColumn("__q", quality_score(F.col(text_col)))
            out = note("quality_lottery",
                       apply_quality_lottery(staged, "__q",
                                             alpha=lottery_alpha,
                                             id_col=id_col).drop("__q"))
        else:
            out = note("quality_lottery",
                       apply_quality_lottery(out, lottery_score_col,
                                             alpha=lottery_alpha,
                                             id_col=id_col))

    if clean_lines:
        from feathr_spark.operators.corpus import drop_common_lines
        cleaned = drop_common_lines(out, text_col, id_col,
                                    **(line_kwargs or {}))
        out = note("line_dedup",
                   cleaned.withColumn(text_col, F.col(f"{text_col}_clean"))
                   .drop(f"{text_col}_clean"))

    if exact:
        from feathr_spark.operators.dedup import exact_dedup
        out = note("exact_dedup", exact_dedup(out, text_col, id_col))

    if near_dup:
        from feathr_spark.operators.dedup import minhash_lsh_dedup
        labels = minhash_lsh_dedup(out, text_col, id_col,
                                   **(near_dup_kwargs or {}))
        reps = (labels.where(F.col(id_col) == F.col("cluster_rep"))
                .select(id_col))
        out = note("near_dup", out.join(reps, on=id_col, how="left_semi"))

    if benchmark is not None:
        from feathr_spark.operators.corpus import decontaminate
        out = note("decontaminate",
                   decontaminate(out, benchmark, contamination_n,
                                 text_col, id_col))

    if max_per_source is not None:
        from feathr_spark.operators.corpus import cap_per_group
        out = note("source_cap",
                   cap_per_group(out, source_col, max_per_source,
                                 order_by=list(cap_order), id_col=id_col))

    return out, report
