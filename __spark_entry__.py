"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
through the public feathr_spark API, and ``oracle_sql()`` provides the
DuckDB-equivalent SQL over the same parquet tables. Column names and
types are aligned on both sides (floats rounded identically so the
value-hash comparison is stable across engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

US_HOUR = 3_600_000_000
US_DAY = 86_400_000_000


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-time feature vector per event — as-of join to
    the last purchase + a battery of sliding-window aggregates."""
    sf_dir = "/root/testdata/sf0.001"
    from feathr_spark import SWAFeature, WindowSpec, asof_join, join_window_agg_features

    events = _t(spark, sf_dir, "events")
    obs = events.select("event_id", "user_id", "ts")
    feats = [
        SWAFeature("val_sum_1h", "SUM", "value", WindowSpec(3600)),
        SWAFeature("n_events_1h", "COUNT", "value", WindowSpec(3600)),
        SWAFeature("val_avg_1d", "AVG", "value", WindowSpec(86400)),
        SWAFeature("val_max_1d", "MAX", "value", WindowSpec(86400)),
        SWAFeature("types_1d", "COUNT_DISTINCT", "event_type", WindowSpec(86400)),
        SWAFeature("click_cnt_1d", "COUNT", "value", WindowSpec(86400),
                   filter="event_type = 'click'"),
    ]
    swa = join_window_agg_features(
        obs, events, ["user_id"], ["user_id"], "ts", "ts", feats,
        obs_ts_format="timestamp", fact_ts_format="timestamp",
    )
    purchases = events.where("event_type = 'purchase'")
    return asof_join(
        swa, purchases, ["user_id"], ["user_id"], "ts", "ts",
        ["value as last_purchase_value"],
        obs_ts_format="timestamp", fact_ts_format="timestamp",
    )


# ---------------------------------------------------------------------------
# query helpers (shared by queries below)
# ---------------------------------------------------------------------------


def _events_obs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev, ev.select("event_id", "user_id", "ts")


def _swa(spark, sf_dir, feats, strategy="auto", **kw):
    from feathr_spark import join_window_agg_features

    ev, obs = _events_obs(spark, sf_dir)
    return join_window_agg_features(
        obs, ev, ["user_id"], ["user_id"], "ts", "ts", feats,
        obs_ts_format="timestamp", fact_ts_format="timestamp", strategy=strategy, **kw,
    )


# ---------------------------------------------------------------------------
# individual queries
# ---------------------------------------------------------------------------


def q_swa_sum_count_avg(spark, sf_dir):
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("s", "SUM", "value", WindowSpec(3600)),
        SWAFeature("c", "COUNT", "value", WindowSpec(3600)),
        SWAFeature("a", "AVG", "value", WindowSpec(3600)),
    ])
    return out.select(
        "event_id",
        F.round("s", 4).alias("sum_1h"),
        F.col("c").alias("cnt_1h"),
        F.round("a", 6).alias("avg_1h"),
    )


def q_swa_sum_count_avg_cogroup(spark, sf_dir):
    """Same semantics, forced through the Arrow cogroup kernel."""
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("s", "SUM", "value", WindowSpec(3600)),
        SWAFeature("c", "COUNT", "value", WindowSpec(3600)),
        SWAFeature("a", "AVG", "value", WindowSpec(3600)),
    ], strategy="cogroup")
    return out.select(
        "event_id",
        F.round("s", 4).alias("sum_1h"),
        F.col("c").alias("cnt_1h"),
        F.round("a", 6).alias("avg_1h"),
    )


_SWA_BASIC_ORACLE = """
SELECT o.event_id,
       round(sum(f.value), 4)   AS sum_1h,
       count(f.value)           AS cnt_1h,
       round(avg(f.value), 6)   AS avg_1h
FROM events o LEFT JOIN events f
  ON f.user_id = o.user_id
 AND epoch_us(f.ts) >  epoch_us(o.ts) - 3600000000
 AND epoch_us(f.ts) <= epoch_us(o.ts)
GROUP BY o.event_id
"""


def q_swa_min_max(spark, sf_dir):
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("mn", "MIN", "value", WindowSpec(86400)),
        SWAFeature("mx", "MAX", "value", WindowSpec(86400)),
    ])
    return out.select("event_id", F.round("mn", 4).alias("min_1d"),
                      F.round("mx", 4).alias("max_1d"))


def q_swa_latest_timesince(spark, sf_dir):
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("lt", "LATEST", "value", WindowSpec(86400)),
        SWAFeature("tsn", "TIMESINCE", "ts", WindowSpec(86400)),
    ])
    return out.select("event_id", F.round("lt", 4).alias("latest_1d"),
                      F.round("tsn", 6).alias("timesince_1d"))


def q_swa_count_distinct(spark, sf_dir):
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("cd", "COUNT_DISTINCT", "event_type", WindowSpec(86400)),
    ])
    return out.select("event_id", F.col("cd").alias("types_1d"))


def q_swa_filtered(spark, sf_dir):
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("cs", "SUM", "value", WindowSpec(86400), filter="event_type = 'click'"),
        SWAFeature("cc", "COUNT", "value", WindowSpec(86400), filter="event_type = 'click'"),
    ])
    return out.select("event_id", F.round("cs", 4).alias("click_sum_1d"),
                      F.col("cc").alias("click_cnt_1d"))


def q_swa_delay(spark, sf_dir):
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("s", "SUM", "value", WindowSpec(86400, delay=3600)),
    ])
    return out.select("event_id", F.round("s", 4).alias("sum_1d_delay1h"))


def q_swa_grouped_topk(spark, sf_dir):
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("g", "COUNT", "value", WindowSpec(86400), group_by="event_type", limit=2),
    ])
    ex = out.select("event_id", F.explode("g").alias("e"))
    return ex.select("event_id", F.col("e.group").alias("grp"),
                     F.col("e.value").cast("double").alias("val"))


def q_asof_purchase(spark, sf_dir):
    from feathr_spark import asof_join

    ev, obs = _events_obs(spark, sf_dir)
    purchases = ev.where("event_type = 'purchase'")
    out = asof_join(obs, purchases, ["user_id"], ["user_id"], "ts", "ts",
                    ["value as last_purchase_value"],
                    obs_ts_format="timestamp", fact_ts_format="timestamp")
    return out.select("event_id", F.round("last_purchase_value", 4).alias("last_purchase_value"))


def q_asof_tokens(spark, sf_dir):
    """Token-array equality per row (the north star's per-row
    invariant): as-of join fetches an array<bigint> token payload —
    deterministically derived from event_id — and the oracle must match
    it ELEMENT-FOR-ELEMENT (JSON-serialized so the harness can sort and
    hash array values)."""
    from feathr_spark import asof_join

    ev, obs = _events_obs(spark, sf_dir)
    fact = ev.where("event_type = 'purchase'").withColumn(
        "tokens",
        F.transform(F.sequence(F.lit(0), F.pmod(F.col("event_id"), F.lit(5))),
                    lambda i: F.pmod(F.col("event_id") * 7 + i, F.lit(997))))
    out = asof_join(obs, fact, ["user_id"], ["user_id"], "ts", "ts",
                    ["tokens as last_tokens"],
                    obs_ts_format="timestamp", fact_ts_format="timestamp")
    return out.select(
        "event_id",
        F.coalesce(F.to_json("last_tokens"), F.lit("[]")).alias("last_tokens_json"))


def q_asof_prune(spark, sf_dir):
    """Two-phase as-of (slim match + pruned payload fetch) — the wide-
    payload / 100 TB strategy; must equal the union-strategy oracle."""
    from feathr_spark import asof_join

    ev, obs = _events_obs(spark, sf_dir)
    purchases = ev.where("event_type = 'purchase'")
    out = asof_join(obs, purchases, ["user_id"], ["user_id"], "ts", "ts",
                    ["value as last_purchase_value", "event_type as last_kind"],
                    obs_ts_format="timestamp", fact_ts_format="timestamp",
                    strategy="prune")
    return out.select("event_id", F.round("last_purchase_value", 4).alias("last_purchase_value"),
                      "last_kind")


def q_lag_lead(spark, sf_dir):
    from feathr_spark.operators.windows import with_lag_lead

    ev, _ = _events_obs(spark, sf_dir)
    out = with_lag_lead(ev, ["user_id"], "ts", ["value"], offsets=(1,),
                        ts_format="timestamp")
    return out.select("event_id",
                      F.round("value_lag1", 4).alias("value_lag1"),
                      F.round("value_lead1", 4).alias("value_lead1"))


def q_sessionize(spark, sf_dir):
    from feathr_spark.operators.windows import sessionize

    ev, _ = _events_obs(spark, sf_dir)
    out = sessionize(ev, ["user_id"], "ts", gap=1800, ts_format="timestamp")
    return out.select("event_id", "session_id")


def q_session_stats(spark, sf_dir):
    from feathr_spark.operators.windows import session_stats

    ev = _t(spark, sf_dir, "events")
    out = session_stats(ev, ["user_id"], "ts", gap=1800, ts_format="timestamp",
                        agg_exprs={"val_sum": "round(sum(value), 4)"})
    return out.select(F.col("user_id"), F.col("session_id"), F.col("session_start_us"),
                      F.col("n_events"), F.col("val_sum"))


def q_backfill(spark, sf_dir):
    from feathr_spark.operators.windows import backfill

    ev = _t(spark, sf_dir, "events")
    sparse = ev.withColumn("v_sparse", F.when(F.col("event_type") != "error", F.col("value")))
    out = backfill(sparse, ["user_id"], "ts", ["v_sparse"], ts_format="timestamp")
    return out.select("event_id", F.round("v_sparse_filled", 4).alias("v_filled"))


def q_rolling_stats(spark, sf_dir):
    from feathr_spark.operators.windows import rolling_stats

    ev = _t(spark, sf_dir, "events")
    out = rolling_stats(ev, ["user_id"], "ts", "value", 3600.0, ts_format="timestamp")
    return out.select("event_id",
                      F.round("value_roll_sum", 4).alias("roll_sum"),
                      F.col("value_roll_cnt").alias("roll_cnt"))


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_topk_per_group(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_returnflag", "l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("revenue"), F.col("l_partkey"))
    return rev.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3) \
        .select("l_returnflag", "l_partkey", "revenue", "rk")


def q_lookup_two_hop(spark, sf_dir):
    """orders -> customer (nation key) -> nation name: sequential join."""
    from feathr_spark.operators.lookup import lookup_join

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    step1 = lookup_join(orders, "o_orderkey", "o_custkey", customer,
                        "c_custkey", "c_nationkey", "cust_nation_key",
                        aggregation="FIRST", broadcast_expansion=True)
    step2 = lookup_join(step1, "o_orderkey", "cust_nation_key", nation,
                        "n_nationkey", "n_name", "nation_name",
                        aggregation="FIRST", broadcast_expansion=True)
    return step2.select("o_orderkey", "nation_name")


def q_lookup_union_agg(spark, sf_dir):
    """customer -> orders: count + sum of order totals (UNION-family agg)."""
    from feathr_spark.operators.lookup import lookup_join

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    c1 = lookup_join(customer, "c_custkey", "c_custkey", orders, "o_custkey",
                     "o_totalprice", "order_sum", aggregation="SUM")
    c2 = lookup_join(c1, "c_custkey", "c_custkey", orders, "o_custkey",
                     "o_totalprice", "n_orders", aggregation="COUNT")
    return c2.select("c_custkey", F.round("order_sum", 2).alias("order_sum"),
                     F.col("n_orders").cast("long").alias("n_orders"))


def q_derived_features(spark, sf_dir):
    from feathr_spark.operators.derived import apply_derived_features

    orders = _t(spark, sf_dir, "orders")
    out = apply_derived_features(orders, [
        ("price_bucket", "cast(floor(o_totalprice / 50000) as long)"),
        ("is_urgent", "case when o_orderpriority like '1-%' then 1 else 0 end"),
        ("urgency_price", "round(is_urgent * o_totalprice, 2)"),
    ])
    return out.select("o_orderkey", "price_bucket", "is_urgent", "urgency_price")


def q_mvel_features(spark, sf_dir):
    """Row-level features defined in MVEL (the reference's anchor
    `def:` language) translated to Spark SQL by the subset translator
    (functions/mvel.py; reference MvelContextUDFs.java +
    SimpleConfigurableAnchorExtractor.scala) — evaluation is all
    Catalyst, no MVEL runtime, no Python row path."""
    from feathr_spark.functions.mvel import MvelAnchorExtractor

    ev = _t(spark, sf_dir, "events")
    ex = MvelAnchorExtractor({
        "val_log": "isPresent(value) ? Math.log(value + 1.0) : null",
        "is_click": "event_type.equals('click') ? 1 : 0",
        "etype2": "event_type.substring(0, 2).toUpperCase()",
        "val_bucket": "(Integer) (toNumeric(value) / 10.0)",
    })
    return ex.apply(ev).select(
        "event_id", F.round("val_log", 6).alias("val_log"), "is_click",
        "etype2", "val_bucket")


def q_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


def q_token_counts(spark, sf_dir):
    from feathr_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count("text").alias("n_ws"),
                       token_count("text", "bpe").alias("n_bpe"))


def q_quality(spark, sf_dir):
    from feathr_spark.operators.text import quality_features

    docs = _t(spark, sf_dir, "documents")
    q = quality_features("text")
    return docs.select(
        "doc_id",
        q["n_words"].alias("n_words"),
        F.round(q["mean_word_len"], 6).alias("mean_word_len"),
        F.round(q["uniq_word_ratio"], 6).alias("uniq_word_ratio"),
        F.round(q["stopword_ratio"], 6).alias("stopword_ratio"),
    )


def q_exact_dup_groups(spark, sf_dir):
    from feathr_spark.operators.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(normalize_text("text").alias("norm_text"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_docs") > 0)
        .select("norm_text", "n_docs", "keep_id")
    )


def q_shingle_count(spark, sf_dir):
    from feathr_spark.operators.text import shingles

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.size(shingles("text", 3)).cast("long").alias("n_shingles"))


def q_embedding_norms(spark, sf_dir):
    from feathr_spark.operators.similarity import l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(l2_norm(F.transform("embedding", lambda x: x.cast("double"))), 5).alias("norm"),
    )


def q_pairwise_cosine(spark, sf_dir):
    from feathr_spark.operators.similarity import cosine_sim

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20) \
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b",
                        F.round(cosine_sim(F.col("va"), F.col("vb")), 5).alias("cosine"))


def q_minhash_clusters(spark, sf_dir):
    """Near-dup clustering: MinHash-LSH candidates, exact-Jaccard
    verification, fixpoint connected components. With exact verify the
    emitted clusters depend only on the text, so a DuckDB oracle
    recomputes them (all-pairs Jaccard + recursive-CTE closure)."""
    from feathr_spark.operators.dedup import minhash_lsh_dedup

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_dedup(docs.select("doc_id", "text"), threshold=0.7,
                             verify="exact")


def q_dup_spans(spark, sf_dir):
    """Fixed-window exact substring dedup audit (Lee et al. 2022): per
    document, word/window totals, cross-document-duplicated window count,
    and surviving word count after span removal. All counts derive from
    window TEXT (hashing is internal), so DuckDB recomputes them exactly
    with a lateral-unnest window inventory."""
    from feathr_spark.operators.corpus import duplicate_window_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicate_window_stats(docs, window=10, min_docs=2)


def q_incremental_dedup(spark, sf_dir):
    """Append-only-corpus dedup: even doc_ids play the already-ingested
    corpus (their fingerprint table is materialized first — the only
    thing the incremental job reads for them), odd doc_ids the incoming
    batch. With exact verify the kept/dropped decisions depend only on
    the text, so the DuckDB oracle recomputes them: new x new closure
    (recursive CTE) for cluster reps, any >=threshold cross pair
    anchors the whole component to the corpus (transitive: a chain
    new~new~corpus drops both new docs)."""
    from feathr_spark.operators.dedup import (fingerprints,
                                              minhash_incremental_dedup)

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    fp = fingerprints(corpus).persist()
    fp.count()
    out = minhash_incremental_dedup(new, fp, threshold=0.7, verify="exact")
    return out.select(
        "doc_id", "cluster_rep",
        F.col("dup_of_corpus").cast("int").alias("dup_of_corpus"),
        F.col("keep").cast("int").alias("keep"))


def q_minhash_pairs(spark, sf_dir):
    """LSH candidate pairs verified by exact shingle-set Jaccard —
    the banded-LSH path's output is oracle-checkable because the
    emitted (pair, jaccard) depends only on the text."""
    from feathr_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs.select("doc_id", "text"), threshold=0.7)
    return out.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


def q_token_dedup_pairs(spark, sf_dir):
    """Near-dup pairs computed ENTIRELY in token space: documents are
    encoded with an injective full vocabulary (the north-star
    pre-tokenized shape), then LSH banding + exact Jaccard run over
    rotate-XOR token-trigram fingerprints — no text round-trip
    (operators/dedup.py::token_jaccard_pairs). With an injective vocab
    the token-trigram set corresponds 1:1 to the word-trigram set, so
    the DuckDB word-space Jaccard oracle must reproduce every pair AND
    every jaccard value exactly."""
    from feathr_spark.operators.dedup import token_jaccard_pairs
    from feathr_spark.operators.text import build_vocabulary, encode_tokens

    docs = _t(spark, sf_dir, "documents")
    vocab = build_vocabulary(docs, max_size=100_000, min_count=1)
    toks = encode_tokens(docs, vocab, keep_cols=())
    out = token_jaccard_pairs(toks, threshold=0.7)
    return out.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


def q_token_dup_groups(spark, sf_dir):
    """Exact duplicate token SEQUENCES (token-array equality — the
    north rule's per-row invariant) over the encoded corpus: xxhash64
    of the array<int> itself, one hash-partition shuffle
    (operators/dedup.py::token_dup_groups). Injective vocab makes
    token-sequence equality ⟺ normalized-word-sequence equality, which
    the oracle replays in word space."""
    from feathr_spark.operators.dedup import token_dup_groups
    from feathr_spark.operators.text import build_vocabulary, encode_tokens

    docs = _t(spark, sf_dir, "documents")
    # the synthetic corpus has no exact dups — inject a deterministic
    # copy of every 10th doc (id + 10^6) so the result is non-trivial;
    # the oracle replays the same injection
    dup = (docs.where(F.col("doc_id") % 10 == 0)
           .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000)))
    both = docs.unionByName(dup)
    vocab = build_vocabulary(both, max_size=100_000, min_count=1)
    toks = encode_tokens(both, vocab, keep_cols=())
    return (token_dup_groups(toks)
            .select("keep_id", F.col("n_dups").cast("long").alias("n_dups")))


def q_simhash_pairs(spark, sf_dir):
    """SimHash Hamming-band candidates verified by exact Jaccard
    (candidate generation is hash-internal; the verified output is
    text-deterministic and oracle-checkable)."""
    from feathr_spark.operators.dedup import simhash_verified_pairs

    docs = _t(spark, sf_dir, "documents")
    # max_hamming=10: measured true near-dups (exact jaccard >= 0.7)
    # reach hamming 9 at sf0.001 and 5 at sf0.01 — the two oracle-gated
    # corpora. Simhash is inherently a recall-tradeoff screen for
    # Jaccard on ~50-word docs (at sf0.1, untested by oracle, a handful
    # of true pairs measure hamming 11-12 — outside any practical
    # radius); the full-recall Jaccard path is minhash_pairs. The wide
    # radius is affordable because candidates pass a minhash-estimate
    # screen before the exact-Jaccard verify (see simhash_verified_pairs).
    out = simhash_verified_pairs(docs.select("doc_id", "text"),
                                 max_hamming=10, threshold=0.7)
    return out.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


def q_knn_bruteforce(spark, sf_dir):
    """Exact top-3 cosine neighbors for the first 3 vectors, scored in
    float64 so the double-precision DuckDB oracle ranks identically
    (ties break on ascending vec_id in both engines)."""
    from feathr_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = [r["embedding"] for r in emb.where(F.col("vec_id") < 3)
               .orderBy("vec_id").collect()]
    out = brute_force_topk(emb, queries, k=3, dtype="float64")
    return out.select("query_id", "vec_id", F.round("score", 5).alias("score"))


def q_semantic_contamination(spark, sf_dir):
    """Embedding-space benchmark contamination
    (operators/similarity.py::semantic_contamination): vec_id%10==0
    rows act as the eval set, the rest as corpus; the eval matrix is
    broadcast and every corpus row scored in one zero-shuffle Arrow
    pass (max cosine + nearest bench id, float64 so the
    double-precision DuckDB cross-join oracle ranks identically;
    ties break toward the smallest bench id in both engines).
    Threshold 0.4 splits the synthetic corpus 14/436 with a >=1e-4
    gap to the nearest score, so the flag is ulp-safe."""
    from feathr_spark.operators.similarity import semantic_contamination

    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 10 == 0)
    corp = emb.where(F.col("vec_id") % 10 != 0)
    out = semantic_contamination(corp, bench, threshold=0.4,
                                 dtype="float64")
    return out.select(
        "vec_id", "bench_id",
        F.round("max_cosine", 5).alias("max_cosine"),
        F.col("contaminated").cast("int").alias("contaminated"))


def q_swa_multikey(spark, sf_dir):
    """Composite (user_id, event_type) join key."""
    from feathr_spark import SWAFeature, WindowSpec, join_window_agg_features

    ev = _t(spark, sf_dir, "events")
    obs = ev.select("event_id", "user_id", "event_type", "ts")
    out = join_window_agg_features(
        obs, ev, ["user_id", "event_type"], ["user_id", "event_type"], "ts", "ts",
        [SWAFeature("s", "SUM", "value", WindowSpec(86400))],
        obs_ts_format="timestamp", fact_ts_format="timestamp",
    )
    return out.select("event_id", F.round("s", 4).alias("sum_1d_bytype"))


def q_swa_salted(spark, sf_dir):
    """Identical semantics to swa_sum_count_avg, with explicit hot-key
    salting forced on — the correctness gate proves salting changes
    nothing but the physical plan."""
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("s", "SUM", "value", WindowSpec(3600)),
        SWAFeature("c", "COUNT", "value", WindowSpec(3600)),
        SWAFeature("a", "AVG", "value", WindowSpec(3600)),
    ], strategy="cogroup", hot_key_threshold=50, salt_buckets=4)
    return out.select(
        "event_id",
        F.round("s", 4).alias("sum_1h"),
        F.col("c").alias("cnt_1h"),
        F.round("a", 6).alias("avg_1h"),
    )


def q_swa_salted_union(spark, sf_dir):
    """Round-4 twin of swa_salted on the pure-JVM union strategy: the
    salt column joins the window partition key (operators/swa.py
    _swa_union salted=True) — same oracle, different physical plan."""
    from feathr_spark import SWAFeature, WindowSpec

    out = _swa(spark, sf_dir, [
        SWAFeature("s", "SUM", "value", WindowSpec(3600)),
        SWAFeature("c", "COUNT", "value", WindowSpec(3600)),
        SWAFeature("a", "AVG", "value", WindowSpec(3600)),
    ], strategy="union", hot_key_threshold=50, salt_buckets=4)
    return out.select(
        "event_id",
        F.round("s", 4).alias("sum_1h"),
        F.col("c").alias("cnt_1h"),
        F.round("a", 6).alias("avg_1h"),
    )


def _emb_ts(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        F.pmod(F.col("vec_id"), F.lit(50)).cast("long").alias("k"),
        (F.lit(1_700_000_000) + F.col("vec_id") * 60).alias("ts"),
        "vec_id", "embedding",
    )


def q_swa_pooling(spark, sf_dir):
    """Element-wise MAX/MIN/SUM/AVG_POOLING over an array-valued metric
    in a 2h window (embedding rows given synthetic entity keys +
    timestamps). Output is EXPLODED to scalar rows (vec_id, pos, ...)
    so the harness canonicalizer can sort/hash it — array-typed columns
    are unsortable in pandas."""
    from feathr_spark import SWAFeature, WindowSpec, join_window_agg_features

    e = _emb_ts(spark, sf_dir)
    obs = e.select("vec_id", "k", "ts")
    out = join_window_agg_features(
        obs, e, ["k"], ["k"], "ts", "ts",
        [SWAFeature("mx", "MAX_POOLING", "embedding", WindowSpec(7200)),
         SWAFeature("mn", "MIN_POOLING", "embedding", WindowSpec(7200)),
         SWAFeature("sm", "SUM_POOLING", "embedding", WindowSpec(7200)),
         SWAFeature("av", "AVG_POOLING", "embedding", WindowSpec(7200))],
    )
    ex = out.select(
        "vec_id", F.posexplode(F.arrays_zip("mx", "mn", "sm", "av")).alias("pos", "z"))
    # + 0.0 normalizes IEEE negative zero (DuckDB round keeps -0.0)
    return ex.select(
        "vec_id", F.col("pos").cast("long").alias("pos"),
        (F.round("z.mx", 4) + F.lit(0.0)).alias("max_p"),
        (F.round("z.mn", 4) + F.lit(0.0)).alias("min_p"),
        (F.round("z.sm", 4) + F.lit(0.0)).alias("sum_p"),
        (F.round("z.av", 6) + F.lit(0.0)).alias("avg_p"),
    )


def q_asof_tolerance(spark, sf_dir):
    """As-of with delay=5min and tolerance=1h."""
    from feathr_spark import asof_join

    ev, obs = _events_obs(spark, sf_dir)
    purchases = ev.where("event_type = 'purchase'")
    out = asof_join(obs, purchases, ["user_id"], ["user_id"], "ts", "ts",
                    ["value as last_val"], obs_ts_format="timestamp",
                    fact_ts_format="timestamp", delay=300, tolerance=3600)
    return out.select("event_id", F.round("last_val", 4).alias("last_val"))


def q_asof_fused(spark, sf_dir):
    """Fused as-of: match ts computed INSIDE the SWA cogroup kernel as a
    LATEST feature, payload fetched by asof_fetch's pruned hash join —
    semantically asof_join(tolerance=w) with the match phase amortized
    into an existing sliding-window pass (zero extra shuffle for the
    match; the payload never enters a sort)."""
    from feathr_spark import SWAFeature, WindowSpec, asof_fetch, join_window_agg_features
    from feathr_spark.functions.timestamps import to_epoch_micros

    ev, obs = _events_obs(spark, sf_dir)
    purch = ev.where("event_type = 'purchase'") \
        .withColumn("ts_d", to_epoch_micros("ts", "timestamp"))
    vec = join_window_agg_features(
        obs, purch, ["user_id"], ["user_id"], "ts", "ts",
        [SWAFeature("m_ts", "LATEST", "ts_d", WindowSpec(3600))],
        obs_ts_format="timestamp", fact_ts_format="timestamp",
        strategy="cogroup")
    out = asof_fetch(vec, purch, ["user_id"], ["user_id"], "m_ts", "ts_d",
                     ["value as last_val"])
    return out.select("event_id", F.round("last_val", 4).alias("last_val"))


def q_asof_cogroup(spark, sf_dir):
    from feathr_spark import asof_join

    ev, obs = _events_obs(spark, sf_dir)
    purchases = ev.where("event_type = 'purchase'")
    out = asof_join(obs, purchases, ["user_id"], ["user_id"], "ts", "ts",
                    ["value as last_purchase_value"], obs_ts_format="timestamp",
                    fact_ts_format="timestamp", strategy="cogroup")
    return out.select("event_id", F.round("last_purchase_value", 4).alias("last_purchase_value"))


GEN_CUTOFF = 1_705_276_800  # 2024-01-15T00:00:00Z, mid-events-range


def q_gen_term_map(spark, sf_dir):
    """Grouped generation feature: per user, a map event_type -> SUM(value)
    over the 3d window (reference CollectTermValueMap UDAF). Output is
    EXPLODED to (user_id, term, value) scalar rows so the harness can
    sort/hash (map columns are unsortable in pandas)."""
    from feathr_spark.definitions import SWAFeature, WindowSpec
    from feathr_spark.materialize import GenSpec, generate_features

    ev = _t(spark, sf_dir, "events")
    spec = GenSpec(
        keys=["user_id"], key_names=["user_id"],
        ts_col="ts", ts_format="timestamp",
        features=[SWAFeature("v_by_type", "SUM", "value", WindowSpec(3 * 86400),
                             group_by="event_type")],
    )
    out = generate_features(ev, spec, GEN_CUTOFF)
    ex = out.select("user_id", F.explode("v_by_type").alias("term", "v"))
    return ex.select("user_id", "term", F.round("v", 4).alias("v_sum"))


def q_gen_cutoff(spark, sf_dir):
    """Feature generation (materialization): per-entity aggregates over
    the window ending at a fixed cutoff."""
    from feathr_spark.definitions import SWAFeature, WindowSpec
    from feathr_spark.materialize import GenSpec, generate_features

    ev = _t(spark, sf_dir, "events")
    spec = GenSpec(
        keys=["user_id"], key_names=["user_id"],
        ts_col="ts", ts_format="timestamp",
        features=[
            SWAFeature("v_sum_3d", "SUM", "value", WindowSpec(3 * 86400)),
            SWAFeature("v_cnt_3d", "COUNT", "value", WindowSpec(3 * 86400)),
            SWAFeature("v_max_3d", "MAX", "value", WindowSpec(3 * 86400)),
            SWAFeature("v_latest_3d", "LATEST", "value", WindowSpec(3 * 86400)),
        ],
    )
    out = generate_features(ev, spec, GEN_CUTOFF)
    return out.select(
        "user_id",
        F.round("v_sum_3d", 4).alias("v_sum_3d"),
        F.col("v_cnt_3d").cast("long").alias("v_cnt_3d"),
        F.round("v_max_3d", 4).alias("v_max_3d"),
        F.round("v_latest_3d", 4).alias("v_latest_3d"),
    )


def q_gen_incremental(spark, sf_dir):
    """Incremental snapshot advance (prev + incoming - expired) — the
    oracle is a FULL recompute at the new cutoff, so the correctness
    gate proves the delta algebra."""
    from feathr_spark.definitions import SWAFeature, WindowSpec
    from feathr_spark.materialize import GenSpec, generate_features, incremental_snapshot

    ev = _t(spark, sf_dir, "events")
    spec = GenSpec(
        keys=["user_id"], key_names=["user_id"],
        ts_col="ts", ts_format="timestamp",
        features=[
            SWAFeature("v_sum_3d", "SUM", "value", WindowSpec(3 * 86400)),
            SWAFeature("v_cnt_3d", "COUNT", "value", WindowSpec(3 * 86400)),
            SWAFeature("v_avg_3d", "AVG", "value", WindowSpec(3 * 86400)),
        ],
    )
    prev = generate_features(ev, spec, GEN_CUTOFF - 86400)
    inc = incremental_snapshot(ev, spec, prev, GEN_CUTOFF - 86400, GEN_CUTOFF)
    return inc.where(F.col("v_cnt_3d") > 0).select(
        "user_id",
        F.round("v_sum_3d", 4).alias("v_sum_3d"),
        F.col("v_cnt_3d").cast("long").alias("v_cnt_3d"),
        F.round("v_avg_3d", 6).alias("v_avg_3d"),
    )


def q_gen_derived(spark, sf_dir):
    """Feature generation with a post-aggregation derived stage
    (reference: offline/evaluator/DerivedFeatureGenStage.scala, driven
    from DataFrameFeatureGenerator.scala:44-175): two generated window
    aggregates feed a derived ratio, and a second derivation depends on
    the first — exercising dependency ordering inside generation."""
    from feathr_spark.definitions import DerivedFeature, SWAFeature, WindowSpec
    from feathr_spark.materialize import GenSpec, generate_features

    ev = _t(spark, sf_dir, "events")
    spec = GenSpec(
        keys=["user_id"], key_names=["user_id"],
        ts_col="ts", ts_format="timestamp",
        features=[
            SWAFeature("v_sum_3d", "SUM", "value", WindowSpec(3 * 86400)),
            SWAFeature("v_cnt_3d", "COUNT", "value", WindowSpec(3 * 86400)),
        ],
        derived=(
            # declared out of dependency order on purpose
            DerivedFeature("v_avg_sq", "v_avg_3d * v_avg_3d",
                           inputs=("v_avg_3d",)),
            DerivedFeature("v_avg_3d", "v_sum_3d / v_cnt_3d",
                           inputs=("v_sum_3d", "v_cnt_3d")),
        ),
    )
    out = generate_features(ev, spec, GEN_CUTOFF)
    return out.select(
        "user_id",
        F.round("v_sum_3d", 4).alias("v_sum_3d"),
        F.col("v_cnt_3d").cast("long").alias("v_cnt_3d"),
        F.round("v_avg_3d", 6).alias("v_avg_3d"),
        F.round("v_avg_sq", 4).alias("v_avg_sq"),
    )


# Reference-dialect HOCON configs (FeathrConfigLoader.scala grammar) —
# the plan below is built ONLY from these strings via feathr_spark.config.
_HOCON_FEATURE_DEF = """
sources: {
  evSource: {
    location: { path: "events" }
    timeWindowParameters: {
      timestampColumn: "ts"
      timestampColumnFormat: "timestamp"
    }
  }
}
anchors: {
  swaAnchor: {
    source: "evSource"
    key: "user_id"
    features: {
      h_val_sum: { def: "value", aggregation: SUM, window: 1h }
      h_cnt:     { def: "value", aggregation: COUNT, window: 1h }
      d_clicks: {
        def: "value"
        filter: "event_type = 'click'"
        aggregation: COUNT
        window: 1d
        default: 0
      }
    }
  }
}
derivations: {
  // MVEL derivation over two joined SWA features
  click_rate: "toNumeric(d_clicks) / toNumeric(h_cnt)"
}
"""

_HOCON_JOIN_CONF = """
settings: {
  joinTimeSettings: {
    timestampColumn: { def: ts, format: timestamp }
  }
}
features: [
  { key: user_id, featureList: [h_val_sum, h_cnt, d_clicks, click_rate] }
]
"""


def q_hocon_join(spark, sf_dir):
    """Feature join planned entirely from reference-style HOCON configs
    (feature definition + join config), parsed by feathr_spark.config
    (dialect: offline/config/FeathrConfigLoader.scala +
    FeatureJoinConfig.scala) and executed through the standard planner —
    proving config-level compatibility end to end."""
    from feathr_spark.config import (
        load_feature_def,
        load_join_config,
        run_join_config,
    )

    ev = _t(spark, sf_dir, "events")
    fdef = load_feature_def(_HOCON_FEATURE_DEF)
    jc = load_join_config(_HOCON_JOIN_CONF)
    obs = ev.select("event_id", "user_id", "ts")
    out = run_join_config(spark, obs, fdef, jc, source_cache={"events": ev})
    return out.select(
        "event_id",
        F.round("h_val_sum", 4).alias("h_val_sum"),
        F.col("h_cnt").cast("long").alias("h_cnt"),
        F.col("d_clicks").cast("long").alias("d_clicks"),
        F.round("click_rate", 6).alias("click_rate"),
    )


def q_rollup_daily(spark, sf_dir):
    """Multi-level time-bucket rollup: the daily level is re-aggregated
    from hourly buckets (one raw scan), oracle-checked against direct
    daily bucketing."""
    from feathr_spark.operators.rollup import multi_level_rollup

    ev = _t(spark, sf_dir, "events").withColumn("ts_s", F.unix_timestamp("ts"))
    levels = multi_level_rollup(ev, ["user_id"], "ts_s", "value", "SUM",
                                levels=["1h", "1d"], out_name="v_sum")
    return levels["1d"].select("user_id", "bucket_start",
                               F.round("v_sum", 4).alias("v_sum"))


def q_word_counts(spark, sf_dir):
    """Corpus-wide word frequencies via explode (lateral view)."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def q_ngram_counts(spark, sf_dir):
    """Corpus-wide word-bigram frequency table (normalized text),
    min_count=3 — the n-gram statistic behind LM-filtering /
    boilerplate mining. Map-side combine bounds the shuffle by
    vocabulary, not corpus size."""
    from feathr_spark.operators.text import ngram_counts

    docs = _t(spark, sf_dir, "documents")
    return ngram_counts(docs, "text", n=2, min_count=3)


def q_domain_cap(spark, sf_dir):
    """Per-source document cap (top-10 by n_chars desc, doc_id tie) —
    the domain-balance guard of corpus curation."""
    from feathr_spark.operators.corpus import cap_per_group

    docs = _t(spark, sf_dir, "documents")
    out = cap_per_group(docs, "source", k=10, order_by=["n_chars"])
    return out.select("doc_id", "source", "n_chars")


def q_line_dedup(spark, sf_dir):
    """Line-level dedup (RefinedWeb/CCNet boilerplate removal): the
    corpus docs are single-line, so the query deterministically builds
    2-line documents — own text + the text of doc ``doc_id % 10`` as a
    boilerplate second line shared by ~1/10 of the corpus — then drops
    every line appearing in >= 5 distinct docs. Exercises drop, keep,
    re-assembly order, and the all-lines-dropped empty-doc path."""
    from feathr_spark.operators.corpus import drop_common_lines

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = (docs.where(F.col("doc_id") < 10)
              .select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text")))
    multi = (docs.withColumn("b_id", F.col("doc_id") % 10)
             .join(F.broadcast(boiler), "b_id")
             .select("doc_id", F.concat_ws("\n", "text", "b_text").alias("text")))
    out = drop_common_lines(multi, min_docs=5)
    return out.select("doc_id", "text_clean", "n_lines_kept")


def q_stream_hourly(spark, sf_dir):
    """Hourly per-user aggregates computed by Structured Streaming
    (availableNow over the events parquet, complete mode to a memory
    sink) — same results as the batch oracle."""
    import tempfile
    import uuid

    from feathr_spark.streaming import stream_window_agg

    schema = _t(spark, sf_dir, "events").schema
    # glob form: the file stream source rejects a bare file as basePath
    stream = spark.readStream.schema(schema).format("parquet").load(f"{sf_dir}/events*") \
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ cannot carry a watermark
    agg = stream_window_agg(
        stream, ["user_id"], "ts", "1 hour",
        {"n": "count(value)", "v_sum": "round(sum(value), 4)"},
        watermark="1 minute",
    )
    name = "q_stream_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="feathr_stream_"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        "user_id", F.unix_timestamp("window_start").alias("bucket_start"), "n", "v_sum")


def q_stream_sliding(spark, sf_dir):
    """SLIDING event-time windows (1h width / 15min slide) computed by
    Structured Streaming with a watermark — each event lands in exactly
    4 overlapping windows; the DuckDB oracle replays the window-start
    enumeration arithmetically."""
    import tempfile
    import uuid

    from feathr_spark.streaming import stream_window_agg

    schema = _t(spark, sf_dir, "events").schema
    stream = spark.readStream.schema(schema).format("parquet").load(f"{sf_dir}/events*") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    agg = stream_window_agg(
        stream, ["user_id"], "ts", "1 hour",
        {"n": "count(value)", "v_sum": "round(sum(value), 4)"},
        slide="15 minutes", watermark="1 minute",
    )
    name = "q_stream_sl_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="feathr_stream_"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        "user_id", F.unix_timestamp("window_start").alias("bucket_start"), "n", "v_sum")


def q_stream_running(spark, sf_dir):
    """Custom stateful streaming operator (``applyInPandasWithState``,
    beyond the reference's row-only streaming path — see
    StreamingFeatureGenerator.scala:44-129 for the per-batch online-state
    shape it mirrors): per-user running state (n_events, value_sum,
    latest_ts, latest_value) over the events stream, availableNow.
    Deterministic input -> the final state per entity is a plain grouped
    SQL aggregate the DuckDB oracle recomputes exactly (latest ties on
    ts broken by max value, matching the operator's tie rule)."""
    import tempfile
    import uuid

    from feathr_spark.streaming.ingest import stream_running_features

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema).format("parquet").load(f"{sf_dir}/events*")
        # fractional epoch seconds == DuckDB epoch(ts) on the NTZ column
        .withColumn("uts", F.col("ts").cast("timestamp").cast("double"))
    )
    run = stream_running_features(stream, "user_id", "uts", "value")
    name = "q_stream_run_" + uuid.uuid4().hex[:8]
    q = (
        run.writeStream.outputMode("update").format("memory").queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="feathr_stream_"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    # update mode emits one row per key per micro-batch; n_events is
    # monotone, so the max struct is the final state regardless of how
    # the source split into batches
    final = (
        spark.table(name).groupBy("entity")
        .agg(F.max(F.struct("n_events", "value_sum", "latest_ts", "latest_value")).alias("s"))
        .select("entity", "s.*")
    )
    return final.select(
        "entity", "n_events",
        F.round("value_sum", 4).alias("value_sum"),
        "latest_ts", "latest_value",
    )


def q_tokenize_docs(spark, sf_dir):
    """Vocabulary tokenizer end-to-end: build a word vocab over the raw
    documents table (count desc / token asc dense ids, distributed
    top-K) and encode every document into the engine's north-star
    pre-tokenized shape (doc_id, tokens array<int>, n_tok) via the
    zero-shuffle broadcast-dict Arrow kernel (operators/text.py::
    build_vocabulary / encode_tokens). Token arrays compared
    ELEMENT-FOR-ELEMENT as JSON."""
    from feathr_spark.operators.text import build_vocabulary, encode_tokens

    docs = _t(spark, sf_dir, "documents")
    vocab = build_vocabulary(docs, max_size=500, min_count=2)
    out = encode_tokens(docs, vocab, keep_cols=())
    return out.select(
        "doc_id", F.col("n_tok").cast("long").alias("n_tok"),
        F.to_json("tokens").alias("tokens_json"))


def _tokenized_docs(spark, sf_dir, max_size=20, min_count=2):
    from feathr_spark.operators.text import build_vocabulary, encode_tokens

    docs = _t(spark, sf_dir, "documents")
    vocab = build_vocabulary(docs, max_size=max_size, min_count=min_count)
    return encode_tokens(docs, vocab, keep_cols=()), vocab


def q_token_stats(spark, sf_dir):
    """One-row corpus summary over the pre-tokenized shape: total /
    distinct / OOV token counts, top-10 coverage, sequence-length
    percentiles (operators/tokens.py::corpus_token_stats). Vocab
    capped at 20 so the OOV path is exercised (token_id 0)."""
    from feathr_spark.operators.tokens import corpus_token_stats

    enc, _ = _tokenized_docs(spark, sf_dir)
    s = corpus_token_stats(enc, top_k=10)
    return s.select(
        F.col("total_docs").cast("long").alias("total_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("distinct_tokens").cast("long").alias("distinct_tokens"),
        F.col("oov_tokens").cast("long").alias("oov_tokens"),
        F.round("oov_share", 6).alias("oov_share"),
        F.round("topk_coverage", 6).alias("topk_coverage"),
        F.round("mean_len", 6).alias("mean_len"),
        F.round("p50_len", 4).alias("p50_len"),
        F.round("p90_len", 4).alias("p90_len"),
        F.col("max_len").cast("long").alias("max_len"))


def q_token_histogram(spark, sf_dir):
    """Full token-frequency table (token_id, n, share) over the
    pre-tokenized corpus — the vocabulary-bounded explode+groupBy
    shuffle with a broadcast grand-total join
    (operators/tokens.py::token_histogram)."""
    from feathr_spark.operators.tokens import token_histogram

    enc, _ = _tokenized_docs(spark, sf_dir)
    h = token_histogram(enc)
    return h.select(
        F.col("token_id").cast("long").alias("token_id"),
        F.col("n").cast("long").alias("n"),
        F.round("share", 6).alias("share"))


def q_detokenize(spark, sf_dir):
    """Decode round-trip: token-id arrays back to text through the
    broadcast id->token dict in one Arrow pass, OOV -> '<unk>'
    (operators/tokens.py::decode_tokens — the exact inverse kernel of
    encode_tokens)."""
    from feathr_spark.operators.tokens import decode_tokens

    enc, vocab = _tokenized_docs(spark, sf_dir)
    return decode_tokens(enc, vocab).select("doc_id", "text")


def q_feature_drift(spark, sf_dir):
    """PSI/KL drift of the numeric `value` feature between the first
    and second half of January (operators/monitor.py::feature_drift):
    equal-width bins over the global min/max, Laplace smoothing 0.5.
    The bin exchange is bounded at features*2*bins rows/task."""
    from feathr_spark.operators.monitor import feature_drift

    ev = _t(spark, sf_dir, "events")
    out = feature_drift(ev, ["value"],
                        current=F.col("ts") >= F.lit("2024-01-16").cast("timestamp"),
                        bins=10)
    return out.select("feature",
                      F.round("psi", 6).alias("psi"),
                      F.round("kl", 6).alias("kl"),
                      F.col("n_ref").cast("long").alias("n_ref"),
                      F.col("n_cur").cast("long").alias("n_cur"))


def q_category_drift(spark, sf_dir):
    """PSI/KL drift of the categorical `event_type` feature over the
    union category support (operators/monitor.py::category_drift)."""
    from feathr_spark.operators.monitor import category_drift

    ev = _t(spark, sf_dir, "events")
    out = category_drift(ev, ["event_type"],
                         current=F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
    return out.select("feature",
                      F.round("psi", 6).alias("psi"),
                      F.round("kl", 6).alias("kl"),
                      F.col("n_ref").cast("long").alias("n_ref"),
                      F.col("n_cur").cast("long").alias("n_cur"))


def q_temperature_mixture(spark, sf_dir):
    """Temperature-scaled sampling mixture p_i ∝ share_i^0.7 over the
    documents domains (operators/corpus.py::temperature_mixture)."""
    from feathr_spark.operators.corpus import temperature_mixture

    docs = _t(spark, sf_dir, "documents")
    out = temperature_mixture(docs, alpha=0.7)
    return out.select("source", "n_docs", "n_tokens",
                      F.round("share", 6).alias("share"),
                      F.round("p_target", 6).alias("p_target"),
                      F.round("weight", 6).alias("weight"))


def q_importance_scores(spark, sf_dir):
    """DSIR-style data selection (Xie et al. 2023): per-document
    unigram log-likelihood ratio between the src0 target domain and
    the full raw corpus, vocab-bounded distributions + one OOV cell,
    broadcast-dict Arrow scoring with zero shuffle
    (operators/selection.py::importance_scores)."""
    from feathr_spark.operators.selection import importance_scores

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("source") == "src0")
    out = importance_scores(docs, target, vocab_size=20, min_count=2)
    return out.select("doc_id", "source",
                      F.round("importance", 6).alias("importance"))


_BPE_DET_MERGES = [("t", "h"), ("th", "e"), ("e", "r"), ("o", "r"),
                   ("or", "d"), ("s", "c"), ("sc", "a"), ("a", "n")]


def q_bpe_train(spark, sf_dir):
    """BPE merge learning, trained end-to-end on the documents corpus
    (operators/bpe.py::train_bpe): one distributed word-frequency
    shuffle + driver merge loop. The DuckDB oracle re-derives the same
    3 merges with an unrolled pair-count/argmax/replace round per
    merge — a hard oracle for the trainer itself."""
    from feathr_spark.operators.bpe import train_bpe

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs, num_merges=3, min_count=2)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string")


def q_bpe_encode_det(spark, sf_dir):
    """BPE application with a FIXED merge list (deterministic twin of
    the trained encoder — identical kernel, literal merges so DuckDB
    can replay them as a replace() chain over '|'-fenced symbol
    strings; includes the chained merge th+e that only fires after
    t+h). Pieces compared element-for-element as JSON."""
    from feathr_spark.operators.bpe import encode_bpe

    docs = _t(spark, sf_dir, "documents")
    out = encode_bpe(docs, _BPE_DET_MERGES, emit="pieces")
    return out.select("doc_id",
                      F.to_json("pieces").alias("pieces_json"),
                      F.col("n_tok").cast("long").alias("n_tok"))


def q_chunk_sequences(spark, sf_dir):
    """LM-pretraining chunk windowing: tokenize the documents, then
    split every sequence into size-16 chunks with stride 8 (overlap 8),
    dropping tails shorter than 4 — row-local sequence+posexplode+slice,
    zero shuffle (operators/tokens.py::chunk_sequences)."""
    from feathr_spark.operators.tokens import chunk_sequences

    enc, _ = _tokenized_docs(spark, sf_dir)
    out = chunk_sequences(enc, chunk_size=16, stride=8, min_chunk=4)
    return out.select("doc_id", "chunk_idx",
                      F.to_json("tokens").alias("tokens_json"),
                      F.col("n_tok").cast("long").alias("n_tok"))


def q_leakage_safe_split(spark, sf_dir):
    """Duplicate-atomic train/val split: rows grouped by normalized
    text, whole group assigned by the LCG of its min doc_id
    (operators/corpus.py::leakage_safe_split). The oracle groups by
    the normalized text itself — same groups, no hash needed."""
    from feathr_spark.operators.corpus import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    out = leakage_safe_split(docs, train_fraction=0.8)
    return out.select("doc_id", "source", "split")


def q_client_flow(spark, sf_dir):
    """Reference Python-client façade end-to-end
    (feathr_spark/client.py; reference feathr_project/feathr/client.py:
    build_features:241 -> get_offline_features:497): context-built SWA
    anchor + derived feature through FeathrClient, same planner
    underneath as full_plan/hocon_join."""
    from feathr_spark import (Anchor, DerivedFeature, FeathrClient,
                              FeatureQuery, ObservationSettings, Source,
                              SWAFeature, WindowSpec)

    client = FeathrClient(spark)
    src = Source(path=f"{sf_dir}/events.parquet", fmt="parquet",
                 timestamp_col="ts", timestamp_format="timestamp")
    client.build_features(
        anchor_list=[Anchor(
            name="ev", source=src, keys=["user_id"],
            features=[SWAFeature("sum_1h", "SUM", "value", WindowSpec(3600)),
                      SWAFeature("cnt_1h", "COUNT", "value", WindowSpec(3600))])],
        derived_feature_list=[DerivedFeature(
            "ratio", "sum_1h / greatest(cnt_1h, 1)",
            inputs=("sum_1h", "cnt_1h"))])
    settings = ObservationSettings(keys=["user_id"], timestamp_col="ts",
                                   timestamp_format="timestamp")
    _, obs = _events_obs(spark, sf_dir)
    out = client.get_offline_features(
        obs, FeatureQuery(["sum_1h", "cnt_1h", "ratio"]), settings)
    return out.select(
        "event_id", F.round("sum_1h", 4).alias("sum_1h"), "cnt_1h",
        F.round("ratio", 6).alias("ratio"))


def q_stream_asof(spark, sf_dir):
    """Streaming point-in-time enrichment: the events stream is drained
    availableNow through ``foreachBatch``, each micro-batch as-of joined
    against the static purchase table by the batch kernel
    (streaming/enrich.py — the serving-side twin of asof_purchase; the
    reference pushes materialized values online instead,
    StreamingFeatureGenerator.scala:95-125). Per-row output is
    independent of micro-batch splits, so the oracle is the plain batch
    ASOF join; the multi-epoch split property itself is pinned by
    tests/test_streaming.py."""
    import tempfile

    from feathr_spark.streaming import stream_asof_enrich

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema).format("parquet").load(f"{sf_dir}/events*")
        .select("event_id", "user_id", "ts")
    )
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where("event_type = 'purchase'")
    sink = tempfile.mkdtemp(prefix="feathr_enrich_")
    q = stream_asof_enrich(
        stream, purchases, ["user_id"], ["user_id"], "ts", "ts",
        ["value as last_purchase_value"],
        checkpoint_dir=tempfile.mkdtemp(prefix="feathr_enrich_ck_"),
        sink_path=sink,
        obs_ts_format="timestamp", fact_ts_format="timestamp",
    )
    q.awaitTermination(300)
    return spark.read.parquet(sink).select(
        "event_id", F.round("last_purchase_value", 4).alias("last_purchase_value"))


def q_ann_recall_bounds(spark, sf_dir):
    """Recall lower bounds for the seeded-Gaussian ANN variants (the two
    rows-only queries): a deterministic clustered corpus (12 seeded
    centers x 50 points) is synthesized in-query, recall of ann_topk_lsh
    / ivf_topk against the exact brute-force top-k (the brute-force
    kernel itself is oracle-verified in knn_bruteforce) is computed
    engine-side, and each (algo, query) emits recall >= 0.8 as a
    boolean. The oracle pins every bound TRUE, so any recall regression
    in the LSH bucketing / IVF probing turns this row red."""
    import numpy as np

    from feathr_spark.operators.similarity import (ann_topk_lsh,
                                                   brute_force_topk,
                                                   ivf_topk)

    rng = np.random.default_rng(1234)
    dim, k = 32, 5
    centers = rng.standard_normal((12, dim)).astype(np.float32) * 3.0
    vecs = np.concatenate(
        [c + rng.standard_normal((50, dim)).astype(np.float32) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    q_src = [0, 75, 150, 325, 500]
    queries = [vecs[i].tolist() for i in q_src]
    exact = brute_force_topk(df, queries, k=k).select("query_id", "vec_id")
    lsh = ann_topk_lsh(df, queries, dim=dim, k=k, n_bits=10, n_probe_bits=2)
    ivf = ivf_topk(df, queries, k=k, n_centroids=12, n_probe=4)

    def bound(approx, algo):
        hits = (exact.join(approx.select("query_id", "vec_id"),
                           ["query_id", "vec_id"])
                .groupBy("query_id").agg((F.count("*") / k).alias("recall")))
        base = exact.select("query_id").distinct()
        # left join: a query with zero surviving candidates must emit
        # FALSE (red row), not silently vanish
        return (base.join(hits, "query_id", "left")
                .select(F.lit(algo).alias("algo"), "query_id",
                        (F.coalesce("recall", F.lit(0.0)) >= 0.8).alias("recall_ok")))

    return bound(lsh, "lsh").unionAll(bound(ivf, "ivf"))


def q_image_stats(spark, sf_dir):
    """Multimodal decode end-to-end with a HARD integer oracle: the 64
    smallest doc_ids get a real 24-bit BMP payload synthesized in an
    Arrow batch (size derived from the rank: w = 4 + 3*(i%5),
    h = 3 + 2*(i%4)), the ``image_stats`` mapInPandas operator
    (multimodal/binaryops.py, reference analogue: the opaque-binary
    feature-extraction pattern) DECODES each payload — width/height come
    out of the BITMAPINFOHEADER parse, not the generator — and the
    DuckDB oracle recomputes width, height, and the exact byte size from
    the BMP layout's closed form (54-byte header + height × (3·width
    padded to 4)) in pure integer SQL. Any drift in the encoder layout,
    the decoder parse, or the Arrow plumbing turns the row red."""
    from pyspark.sql import Window

    from feathr_spark.multimodal.binaryops import encode_bmp, image_stats

    d = (
        _t(spark, sf_dir, "documents").select("doc_id")
        .orderBy("doc_id").limit(64)
        .withColumn("i", F.row_number().over(Window.orderBy("doc_id")) - 1)
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for i in pdf["i"]:
                w, h = 4 + (int(i) % 5) * 3, 3 + (int(i) % 4) * 2
                yy, xx = np.mgrid[0:h, 0:w]
                gray = ((yy * 17 + xx * 31 + int(i)) % 256).astype(np.float32)
                payloads.append(encode_bmp(gray))
            yield pd.DataFrame({
                "media_id": pdf["i"], "doc_id": pdf["doc_id"],
                "payload": payloads, "meta": [None] * len(pdf),
            })

    media = d.mapInPandas(
        gen,
        schema=("media_id long, doc_id long, payload binary, "
                "meta struct<width:int,height:int,sample_rate:int,"
                "n_frames:int,codec:string>"),
    )
    sizes = media.select("media_id", "doc_id",
                         F.octet_length("payload").cast("long").alias("n_bytes"))
    stats = image_stats(media)
    return (
        stats.join(sizes, "media_id")
        .select("doc_id", "width", "height", "n_bytes")
    )


def q_url_features(spark, sf_dir):
    """Structural URL features (protocol/host/registered-domain/path
    depth/query params) — documents carry no URL column, so the query
    synthesizes a deterministic URL per doc from (doc_id, source),
    exercising empty paths, missing query strings, and both schemes."""
    from feathr_spark.operators.text import with_url_features

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("http")).otherwise(F.lit("https")),
        F.lit("://w"), (F.col("doc_id") % 5).cast("string"),
        F.lit("."), F.col("source"), F.lit(".example.com"),
        F.expr("repeat('/p', doc_id % 4)"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("?a=1&b=2")).otherwise(F.lit("")),
    )
    out = with_url_features(docs.withColumn("url", url))
    return out.select("doc_id", "protocol", "host", "domain",
                      "path_depth", "n_query_params")


def q_lang_id(spark, sf_dir):
    """N-gram/stopword-heuristic language ID over documents."""
    from feathr_spark.operators.text import detect_language

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", detect_language("text").alias("lang_pred"))


def q_doc_fingerprint(spark, sf_dir):
    """64-bit content fingerprints (normalized-text xxhash64) grouped
    into duplicate clusters; oracle groups by the normalized text itself
    (identical clusters assuming no 64-bit collisions at this scale)."""
    from feathr_spark.operators.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .select("keep_id", "n_docs")
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (arXiv:2303.09540): drop every
    row with a cosine >= threshold neighbor of smaller id. Contract
    runs strategy='exact' (all-pairs, oracle-reproducible — this
    corpus' near-dups sit at cosine ~0.45, un-bucketable at any
    angle-LSH width); the lsh/ivf scale strategies are recall-tested
    against exact in tests/test_similarity_mm.py."""
    from feathr_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings") \
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"),
                "label")
    out = semantic_dedup(emb, dim=64, threshold=0.42, strategy="exact",
                         id_col="vec_id", vec_col="v")
    return out.select("vec_id", "label")


def q_near_dup_embeddings(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, exact brute-force baseline
    (the LSH-bucketed variant is q_ann_lsh, rows-only)."""
    from feathr_spark.operators.similarity import cosine_sim

    emb = _t(spark, sf_dir, "embeddings") \
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_sim(F.col("va"), F.col("vb"))
    return pairs.where(cos >= 0.42).select(
        "id_a", "id_b", F.round(cos, 5).alias("cosine"))


def q_ann_lsh(spark, sf_dir):
    """Approximate top-k neighbors via SEEDED random-hyperplane LSH
    buckets — the real Gaussian path, not the det twin. Hard-oracled
    since r5: in float64 every decision (bucket signs, multi-probe set,
    scores, ranking) is a pure function of the table plus the seed's
    hyperplane values, which the DuckDB oracle replays as literals
    (signs are scale-invariant, so the oracle skips normalization for
    bucketing; scores round to 5 like knn_bruteforce)."""
    from feathr_spark.operators.similarity import ann_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    qvecs = [r["embedding"] for r in emb.where(F.col("vec_id") < 4)
             .orderBy("vec_id").collect()]
    dim = len(qvecs[0])
    out = ann_topk_lsh(emb, qvecs, dim, k=3, n_bits=8, seed=7,
                       dtype="float64")
    return out.select("query_id", "vec_id", F.round("score", 5).alias("score"))


def q_rollup_distinct_daily(spark, sf_dir):
    """Bucketed exact count-distinct rollup (daily distinct users)."""
    from feathr_spark.operators.rollup import bucketed_count_distinct

    ev = _t(spark, sf_dir, "events").withColumn("ts_s", F.unix_timestamp("ts"))
    out = bucketed_count_distinct(ev, [], "ts_s", "user_id", levels=["1d"], exact=True)
    return out["1d"].select("bucket_start", "n_distinct")


def q_swa_lateral(spark, sf_dir):
    """SWA over a LATERAL VIEW explode of an array-valued fact column,
    through the full planner path (Anchor.lateral_view -> SWA stage):
    the reference's FeatureTransformer.scala:51-64 semantics."""
    from feathr_spark.definitions import (Anchor, ObservationSettings, Source,
                                          SWAFeature, WindowSpec)
    from feathr_spark.plans.planner import join_features

    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select((F.col("vec_id") % 50).alias("k"),
                   (F.lit(1_700_000_000) + F.col("vec_id") * 60).alias("ts"),
                   "vec_id", "embedding")
    obs = e.select("vec_id", "k", "ts")
    src = Source(path="emb_ts", timestamp_col="ts", timestamp_format="epoch")
    anchor = Anchor(
        "emb", src, keys=["k"],
        features=[SWAFeature("elem_sum_2h", "SUM", "elem", WindowSpec(7200)),
                  SWAFeature("elem_cnt_2h", "COUNT", "elem", WindowSpec(7200))],
        lateral_view="explode(embedding)", lateral_view_alias="elem")
    out = join_features(spark, obs, ObservationSettings(keys=["k"], timestamp_col="ts"),
                        [anchor], source_cache={"emb_ts": e})
    return out.select("vec_id", F.round("elem_sum_2h", 4).alias("elem_sum_2h"),
                      F.col("elem_cnt_2h").cast("long").alias("elem_cnt_2h"))


def q_feature_stats(spark, sf_dir):
    """Monitoring-processor stats: one scan, one row per feature."""
    from feathr_spark.sources.sinks import feature_stats

    ev = _t(spark, sf_dir, "events")
    out = feature_stats(ev, ["value", "user_id"])
    return out.select(
        "feature", "n_rows", "n_null",
        F.round("mean", 4).alias("mean"), F.round("stddev", 4).alias("stddev"),
        F.round("min", 4).alias("min"), F.round("max", 4).alias("max"))


def q_swa_slick(spark, sf_dir):
    """Slick-trimmed SWA: only (uid, key, ts) shuffles through the
    merge; the wide observation (here: all event columns incl. props)
    re-joins by uid (OptimizerUtils.scala:92-105). Values must equal the
    untrimmed formulation exactly."""
    from feathr_spark import SWAFeature, WindowSpec, join_window_agg_features

    ev = _t(spark, sf_dir, "events")
    out = join_window_agg_features(
        ev, ev, ["user_id"], ["user_id"], "ts", "ts",
        [SWAFeature("s", "SUM", "value", WindowSpec(3600)),
         SWAFeature("c", "COUNT", "value", WindowSpec(3600)),
         SWAFeature("a", "AVG", "value", WindowSpec(3600))],
        obs_ts_format="timestamp", fact_ts_format="timestamp", slick=True)
    return out.select(
        "event_id",
        F.round("s", 4).alias("sum_1h"),
        F.col("c").alias("cnt_1h"),
        F.round("a", 6).alias("avg_1h"),
    )


def q_swa_sim_delay(spark, sf_dir):
    """ObservationSettings.simulate_time_delay wired through the planner:
    a 1h simulated delay shifts every window back by 1h (reference
    feathr_project/feathr/definition/settings.py:32-66)."""
    from feathr_spark.definitions import (Anchor, ObservationSettings, Source,
                                          SWAFeature, WindowSpec)
    from feathr_spark.plans.planner import join_features

    ev = _t(spark, sf_dir, "events")
    obs = ev.select("event_id", "user_id", "ts")
    src = Source(path="events_mem", timestamp_col="ts", timestamp_format="timestamp")
    anchor = Anchor("ev", src, keys=["user_id"],
                    features=[SWAFeature("s", "SUM", "value", WindowSpec(86400))])
    out = join_features(
        spark, obs,
        ObservationSettings(keys=["user_id"], timestamp_col="ts",
                            timestamp_format="timestamp", simulate_time_delay=3600),
        [anchor], source_cache={"events_mem": ev})
    return out.select("event_id", F.round("s", 4).alias("sum_1d_sim1h"))


def q_full_plan(spark, sf_dir):
    """Kitchen-sink planner run in ONE join_features call: two SWA
    anchors on different sources (events + filtered purchases — the
    planner's source de-dup and stage ordering), a row-level profile
    anchor (equality join), and a derived feature over columns from two
    different stages. End-to-end test of the multi-stage plan the
    reference's MultiStageJoinPlanner builds."""
    from feathr_spark.definitions import (Anchor, DerivedFeature, Feature,
                                          ObservationSettings, Source,
                                          SWAFeature, WindowSpec)
    from feathr_spark.plans.planner import join_features

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where("event_type = 'purchase'")
    profile = ev.groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("avg_value_all"),
        F.count(F.lit(1)).alias("n_events_all"))
    obs = ev.select("event_id", "user_id", "ts")

    anchors = [
        Anchor("swa_ev",
               Source(path="ev", timestamp_col="ts", timestamp_format="timestamp"),
               keys=["user_id"],
               features=[SWAFeature("v_sum_1d", "SUM", "value", WindowSpec(86400)),
                         SWAFeature("v_cnt_7d", "COUNT", "value",
                                    WindowSpec(7 * 86400))]),
        Anchor("swa_purch",
               Source(path="purch", timestamp_col="ts", timestamp_format="timestamp"),
               keys=["user_id"],
               features=[SWAFeature("p_latest_7d", "LATEST", "value",
                                    WindowSpec(7 * 86400))]),
        Anchor("profile", Source(path="prof"), keys=["user_id"],
               features=[Feature("avg_value_all", "avg_value_all"),
                         Feature("n_events_all", "n_events_all")]),
    ]
    derived = [DerivedFeature("sum_over_avg",
                              "round(v_sum_1d / (avg_value_all + 1), 6)")]
    out = join_features(
        spark, obs,
        ObservationSettings(keys=["user_id"], timestamp_col="ts",
                            timestamp_format="timestamp"),
        anchors, derived=derived,
        source_cache={"ev": ev, "purch": purchases, "prof": profile})
    return out.select(
        "event_id",
        F.round("v_sum_1d", 4).alias("v_sum_1d"),
        F.col("v_cnt_7d").cast("long").alias("v_cnt_7d"),
        F.round("p_latest_7d", 4).alias("p_latest_7d"),
        "avg_value_all",
        F.col("n_events_all").cast("long").alias("n_events_all"),
        "sum_over_avg")


def q_lookup_elementwise(spark, sf_dir):
    """ELEMENTWISE_AVG lookup aggregation: each document's bucket key
    expands to the embeddings in that bucket; the arrays average
    elementwise (SequentialJoinAsDerivation.scala:300-663 UDAF family).
    Output exploded to scalar rows for canonicalization."""
    from feathr_spark.operators.lookup import lookup_join

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(10)).alias("bucket"))
    emb = _t(spark, sf_dir, "embeddings").select(
        F.pmod(F.col("vec_id"), F.lit(10)).alias("bucket"), "embedding")
    out = lookup_join(docs, "doc_id", "bucket", emb, "bucket", "embedding",
                      "elem_avg", aggregation="ELEMENTWISE_AVG")
    ex = out.select("doc_id", F.posexplode("elem_avg").alias("pos", "v"))
    return ex.select("doc_id", F.col("pos").cast("long").alias("pos"),
                     F.round("v", 6).alias("elem_avg"))


def q_swa_custom_agg(spark, sf_dir):
    """User-registered RANGE (max - min) aggregation through the public
    register_aggregation surface — the reference's ComplexAggregation /
    custom-UDAF parity (TimeWindowFeatureDefinition.scala:24-27). The fn
    is vectorized numpy over per-key window slices and runs inside the
    cogroup Arrow kernel; RANGE is SQL-expressible, so a DuckDB oracle
    value-checks the whole custom-agg plumbing."""
    import numpy as np

    from feathr_spark import SWAFeature, WindowSpec
    from feathr_spark.definitions import CUSTOM_AGGS, register_aggregation

    if "RANGE" not in CUSTOM_AGGS:
        def value_range(values, ts, lo, hi):
            from feathr_spark.operators import kernels
            v = np.array([np.nan if x is None else float(x) for x in values],
                         dtype=np.float64)
            r = kernels.agg_max(v, lo, hi) - kernels.agg_min(v, lo, hi)
            return np.where(np.isnan(r), None, np.round(r, 4))

        register_aggregation("RANGE", value_range, dtype="double")
    out = _swa(spark, sf_dir,
               [SWAFeature("vrange", "RANGE", "value", WindowSpec(86400))],
               strategy="cogroup")
    return out.select("event_id", "vrange")


def q_quantize_embeddings(spark, sf_dir):
    """Per-vector symmetric int8 quantization (pure JVM; floor(+0.5)
    rounding pinned so the DuckDB oracle reproduces it bit-exactly).
    Exploded to scalar rows for canonicalization."""
    from feathr_spark.operators.similarity import quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    out = quantize_embeddings(emb.select("vec_id", "embedding"))
    ex = out.select("vec_id", F.round("q8_scale", 6).alias("q8_scale"),
                    F.posexplode("q8").alias("pos", "q"))
    return ex.select("vec_id", F.col("pos").cast("long").alias("pos"),
                     F.col("q").cast("int").alias("q"), "q8_scale")


def q_repetition_features(spark, sf_dir):
    """Gopher-style repetition filters: duplicate-line fraction +
    top-bigram fraction per document."""
    from feathr_spark.operators.text import repetition_features

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = repetition_features(docs)
    return out.select("doc_id",
                      F.round("dup_line_frac", 6).alias("dup_line_frac"),
                      F.round("top_bigram_frac", 6).alias("top_bigram_frac"))


def q_ann_ivf(spark, sf_dir):
    """IVF ANN top-3 for the first 3 vectors through the REAL ivf_topk
    pipeline (sample -> Lloyd coarse quantizer -> cell assignment ->
    probe ranking -> scoring -> top-k). Hard-oracled since r5 via the
    deterministic fit mode (fit="det": id-ordered sample, evenly spaced
    init, RNG-free Lloyd) in float64 — the DuckDB oracle replays the
    whole pipeline INCLUDING the k-means fit as unrolled chained CTEs
    (_ann_ivf_oracle). The seeded production fit keeps its recall
    coverage in tests/test_similarity_mm.py."""
    from feathr_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_v = [r["embedding"] for r in emb.where(F.col("vec_id") < 3)
                 .orderBy("vec_id").collect()]
    out = ivf_topk(emb, queries_v, k=3, n_centroids=16, n_probe=8,
                   fit="det", dtype="float64")
    return out.select("query_id", "vec_id", F.round("score", 5).alias("score"))


def q_ann_lsh_det(spark, sf_dir):
    """Deterministic multi-probe LSH ANN (integer-exact signatures):
    same plan shape as ann_lsh, but the hyperplane grid is plain integer
    arithmetic and the query vectors are corpus rows, so the DuckDB
    oracle reproduces bucketing, probing, scoring, and top-k exactly."""
    from feathr_spark.operators.similarity import ann_topk_det

    emb = _t(spark, sf_dir, "embeddings")
    return ann_topk_det(emb, query_ids=[0, 1, 2, 3], dim=64, k=3,
                        n_bits=8, n_probe_bits=2)


def q_ann_ivf_det(spark, sf_dir):
    """Deterministic IVF ANN: coarse cells = embeddings of vec_ids
    0,7,...,98 (15 deterministic centroids), n_probe=4 — every step
    (assignment argmax, probe ranking, scoring, top-k) is a pure
    function of the table, reproduced by the DuckDB oracle."""
    from feathr_spark.operators.similarity import ivf_topk_det

    emb = _t(spark, sf_dir, "embeddings")
    cents = list(range(0, 105, 7))  # 15 centroids
    return ivf_topk_det(emb, query_ids=[10, 20, 30], centroid_ids=cents,
                        k=3, n_probe=4)


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: per-doc count of word 3-grams shared
    with a held-out benchmark split (doc_id % 37 == 0) — the GPT-3
    appendix-C n-gram overlap rule (n=3 suits the short synthetic docs;
    production default is n=13). Join happens on 64-bit shingle hashes
    engine-side; the oracle joins the n-gram strings themselves."""
    from feathr_spark.operators.corpus import contamination

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    train = docs.where(F.col("doc_id") % 37 != 0)
    return contamination(train, bench, n=3)


def q_token_contamination(spark, sf_dir):
    """Benchmark decontamination ENTIRELY in token space: the corpus is
    encoded with an injective full vocabulary (the north-star
    pre-tokenized shape) and overlap runs on rolling token-3-gram
    hashes (operators/tokens.py::token_contamination) — no text round
    trip. With an injective vocab a token 3-gram corresponds 1:1 to a
    word 3-gram, so the word-space DuckDB oracle must match
    row-for-row."""
    from feathr_spark.operators.text import build_vocabulary, encode_tokens
    from feathr_spark.operators.tokens import token_contamination

    docs = _t(spark, sf_dir, "documents")
    vocab = build_vocabulary(docs, max_size=100_000, min_count=1)
    toks = encode_tokens(docs, vocab, keep_cols=())
    bench = toks.where(F.col("doc_id") % 37 == 0)
    train = toks.where(F.col("doc_id") % 37 != 0)
    return token_contamination(train, bench, n=3)


def q_pack_sequences(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing: 128 whitespace
    tokens per training sequence, packed independently per source
    domain (docs may straddle a cut; one row per doc x sequence)."""
    from feathr_spark.operators.corpus import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=128, partition_by=["source"])


def q_gopher_rules(spark, sf_dir):
    """Gopher pretraining quality rules (Rae et al. 2021 table A1) as
    boolean PASS/FAIL columns — pure JVM split/filter/regexp
    expressions, zero shuffle (operators/text.py::gopher_rules).
    min_words lowered to 25 so the synthetic corpus (10-60-word docs)
    splits on the rule."""
    from feathr_spark.operators.text import with_gopher_rules

    docs = _t(spark, sf_dir, "documents")
    out = with_gopher_rules(docs, min_words=25, min_stopword_hits=1)
    flags = ["r_word_count", "r_mean_word_len", "r_symbol_ratio",
             "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
             "r_stopwords", "gopher_pass"]
    return out.select("doc_id",
                      *[F.col(f).cast("int").alias(f) for f in flags])


def q_shard_shuffle(spark, sf_dir):
    """Deterministic global training-order shuffle: shard + dense
    within-shard position as pure functions of (key, seed) — one
    exchange, per-shard parallel sort
    (operators/corpus.py::shard_shuffle). Engine-portable LCG hash so
    the oracle reproduces the exact permutation."""
    from feathr_spark.operators.corpus import shard_shuffle

    docs = _t(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * F.lit(1103515245) + F.lit(12345),
               F.lit(2147483648))
    out = shard_shuffle(docs, n_shards=8, hash_col=h)
    return out.select("doc_id", "shard", "pos")


def q_pii_cards(spark, sf_dir):
    """Luhn-validated payment-card detection
    (operators/corpus.py::with_card_features): card-SHAPED spans by
    regex, VALID cards by the Luhn checksum fold — the validation a
    regex alone cannot express. Every doc gains one valid card
    (spaced); even doc_ids also gain a checksum-failing near-miss
    (dashed), so shaped != valid on half the corpus. The oracle replays
    the regex, the separator strip, the Luhn fold (list_sum over
    doubled-every-other digits), and the <CARD> redaction length."""
    from feathr_spark.operators.corpus import with_card_features

    docs = _t(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"), F.lit(" card 4539 5787 6362 1486 ok"),
        F.when(F.col("doc_id") % 2 == 0,
               F.lit(" bad 4539-5787-6362-1487 end")).otherwise(F.lit("")))
    staged = docs.select("doc_id", t.alias("text"))
    out = with_card_features(staged)
    return out.select(
        "doc_id",
        F.col("n_cards_shaped").cast("int").alias("n_cards_shaped"),
        F.col("n_cards_valid").cast("int").alias("n_cards_valid"),
        F.length("text").cast("long").alias("n_redacted_chars"))


def q_corpus_datacard(spark, sf_dir):
    """Dataset-release datacard (operators/monitor.py::corpus_datacard):
    corpus size, word volume, exact length percentiles, per-source
    composition shares, exact-dup rate — one scan building a skinny
    per-doc projection, then three bounded aggregations. The oracle
    replays every metric (incl. quantile_cont == Spark's interpolating
    percentile, and the shared dedup normalization) in DuckDB."""
    from feathr_spark.operators.monitor import corpus_datacard

    docs = _t(spark, sf_dir, "documents")
    out = corpus_datacard(docs)
    return out.select("metric", F.round("value", 6).alias("value"))


def q_quality_lottery(spark, sf_dir):
    """GPT-3 Pareto quality lottery (Brown et al. 2020 App. A;
    operators/selection.py::quality_lottery): keep iff
    Pareto(9) > 1 - score, with a DETERMINISTIC inverse-CDF draw from
    an engine-portable LCG hash so DuckDB replays the identical keep
    set. Score is a synthetic deterministic ramp (doc_id%97)/96 —
    the operator under test is the lottery, not the scorer."""
    from feathr_spark.operators.selection import quality_lottery

    docs = _t(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * F.lit(1103515245) + F.lit(12345),
               F.lit(2147483648))
    staged = docs.select(
        "doc_id", ((F.col("doc_id") % 97) / F.lit(96.0)).alias("score"))
    out = quality_lottery(staged, "score", alpha=9.0, hash_col=h)
    return out.select(
        "doc_id", F.round("score", 6).alias("score"),
        F.round("pareto_draw", 6).alias("pareto_draw"),
        F.col("lottery_keep").cast("int").alias("lottery_keep"))


def q_shard_write(spark, sf_dir):
    """Resumable sharded corpus writer (sources/shards.py): write the
    documents table into 8 pos-sorted shards committed by per-shard
    lineage manifests, then simulate a kill (shard 0's manifest and
    data removed) and RESUME — the rewritten shard must reproduce the
    identical deterministic assignment (engine-portable LCG hash, same
    as shard_shuffle). Emits per-shard rows from the POST-RESUME
    manifests plus a max-pos check read back from disk; the oracle
    recomputes both from the hash in SQL (rows survive the kill/resume
    cycle only if resume re-derives byte-identical shards)."""
    import shutil
    import tempfile

    from feathr_spark.sources.shards import (load_shards, shard_report,
                                             write_shards)

    docs = _t(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * F.lit(1103515245) + F.lit(12345),
               F.lit(2147483648))
    sink = tempfile.mkdtemp(prefix="feathr_shards_")
    try:
        write_shards(docs, sink, n_shards=8, hash_col=h, wave_size=3,
                     with_checksum=False)
        # kill: lose shard 0 entirely, then resume (skips 1..7)
        shutil.rmtree(f"{sink}/shard=0")
        report = write_shards(docs, sink, n_shards=8, hash_col=h,
                              wave_size=3, with_checksum=False)
        rewritten = set(report["written"])  # must be exactly {0}
        back = (load_shards(spark, sink)
                .groupBy("shard")
                .agg(F.count(F.lit(1)).alias("disk_rows"),
                     F.max("pos").alias("max_pos")))
        rows = [(int(k), int(v)) for k, v in
                shard_report(sink)["rows_per_shard"].items()]
        mf = spark.createDataFrame(rows, "shard int, manifest_rows long")
        out = (back.join(mf, "shard")
               .select(F.col("shard").cast("int"),
                       F.col("disk_rows").cast("long"),
                       F.col("manifest_rows").cast("long"),
                       F.col("max_pos").cast("long"),
                       F.col("shard").isin([int(x) for x in rewritten])
                        .cast("int").alias("rewritten")))
        out = out.cache()
        out.count()  # materialize before the tempdir vanishes
        return out
    finally:
        shutil.rmtree(sink, ignore_errors=True)


def q_c4_rules(spark, sf_dir):
    """C4 cleaning bundle (Raffel et al. 2020 sec 2.2) — line-level
    terminal-punct / min-words / javascript filters + document flags,
    pure codegen, zero shuffle (operators/text.py::c4_rules). The
    synthetic corpus has no newlines or punctuation, so structure is
    synthesized deterministically first: ' data ' becomes a
    sentence+line break and every doc gains a terminal period; docs
    with doc_id%5==0 / %7==0 gain lorem-ipsum / brace markers to
    exercise those branches. Literal replace() has identical
    non-overlapping left-to-right semantics in Spark and DuckDB."""
    from feathr_spark.operators.text import with_c4_rules

    docs = _t(spark, sf_dir, "documents")
    t = F.concat(F.replace(F.col("text"), F.lit(" data "),
                           F.lit(".\ndata ")), F.lit("."))
    t = F.when(F.col("doc_id") % 5 == 0,
               F.concat(t, F.lit(" lorem ipsum sits right here today."))
               ).otherwise(t)
    t = F.when(F.col("doc_id") % 7 == 0,
               F.concat(t, F.lit(" and value { appears here with words."))
               ).otherwise(t)
    staged = docs.select("doc_id", t.alias("text"))
    out = with_c4_rules(staged, min_line_words=5, min_sentences=2)
    return out.select(
        "doc_id",
        F.length("c4_clean_text").cast("long").alias("n_clean_chars"),
        *[F.col(f).cast("int").alias(f)
          for f in ("r_min_sentences", "r_no_lorem", "r_no_brace",
                    "r_blocklist", "c4_pass")])


def q_html_extract(spark, sf_dir):
    """HTML -> text extraction (operators/extract.py) — the raw-web
    stage ahead of every curation operator. Deterministic HTML is
    synthesized around documents.text (title with entities, style +
    script bodies with decoy tags, an HTML comment spanning a newline,
    paragraph structure from ' data ' splits, anchors, and on
    doc_id%3==0 an entity-rich div + second anchor); the full extracted
    text and title are compared STRING-FOR-STRING against DuckDB
    replaying the identical dialect-portable regex pipeline, plus link/
    tag counts and the text:html length ratio."""
    from feathr_spark.operators.extract import with_html_extraction

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><head><title> Doc &amp; '), d, F.lit(' </title>'),
        F.lit('<style type="text/css">p {color:red}</style>'),
        F.lit('<script type="text/javascript">var x = "<p>ignored</p>";'
              '</script></head>'),
        F.lit('<body><!-- nav\nboilerplate --><h1>Heading '), d,
        F.lit('</h1><p>'),
        F.replace(F.col("text"), F.lit(" data "), F.lit(" data</p><p>")),
        F.lit('</p><a href="/home">home link</a>'),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit('<br/><div class="x">extra &lt;tag&gt; &quot;q&quot;'
                     '&nbsp;here</div><a name="z">second</a>'))
         .otherwise(F.lit("")),
        F.lit("</body></html>"))
    staged = docs.select("doc_id", html.alias("html"))
    out = with_html_extraction(staged, html_col="html",
                               text_col="extracted_text",
                               title_col="title")
    return out.select(
        "doc_id", "title", "extracted_text",
        F.length("extracted_text").cast("long").alias("n_clean_chars"),
        F.col("n_links").cast("int").alias("n_links"),
        F.col("n_tags").cast("int").alias("n_tags"),
        (F.length("extracted_text").cast("double")
         / F.length("html")).alias("text_html_ratio"))


def q_gopher_repetition(spark, sf_dir):
    """Full Gopher A1.1 repetition-filter set
    (operators/corpus.py::gopher_repetition): dup line/para fractions
    (count + char), top-n-gram char fractions, duplicated-n-gram char
    coverage (overlaps counted once). The synthetic corpus has no
    newlines, so line/paragraph structure is synthesized with chained
    literal replaces (identical left-to-right semantics in Spark and
    DuckDB); the n-gram statistics run on the normalized word stream.
    The oracle replays every statistic with DuckDB list/lateral ops —
    ties in the top-n-gram pick are value-identical because the frac
    depends only on (count, charlen), the tie-break keys."""
    from feathr_spark.operators.corpus import gopher_repetition

    docs = _t(spark, sf_dir, "documents")
    t = F.replace(F.col("text"), F.lit(" data "), F.lit("\ndata "))
    t = F.replace(t, F.lit(" the "), F.lit("\n\nthe "))
    staged = docs.select("doc_id", t.alias("text"))
    out = gopher_repetition(staged, top_ngram_ns=(2, 3), dup_ngram_ns=(5,))
    return out.select(
        "doc_id", "dup_line_frac", "dup_line_char_frac",
        "dup_para_frac", "dup_para_char_frac",
        "top_2gram_char_frac", "top_3gram_char_frac",
        "dup_5gram_char_frac")


def q_select_by_budget(spark, sf_dir):
    """Token-budget corpus selection: per-source greedy fill in quality
    order, 800 tokens per source
    (operators/selection.py::select_by_budget). Runs the BUCKET scale
    path (histogram cut + boundary-cell refinement) against the oracle's
    exact running-sum window — the two must agree row-for-row."""
    from feathr_spark.operators.selection import select_by_budget

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source",
        F.size(F.filter(F.split("text", r"\s+"),
                        lambda w: w != "")).cast("long").alias("n_tokens"),
        F.col("n_chars").cast("double").alias("score"))
    out = select_by_budget(scored, 800.0, "n_tokens", "score",
                           ["source"], method="bucket", score_buckets=64)
    return out.select("doc_id", "source", "n_tokens")


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-domain downsampling. Uses an engine-portable
    LCG hash so the DuckDB oracle reproduces the exact keep set
    (production default is xxhash64 — identical bucket rule)."""
    from feathr_spark.operators.corpus import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * F.lit(1103515245) + F.lit(12345),
               F.lit(2147483648))
    out = stratified_sample(docs, {"src0": 0.7, "src1": 0.2, "src2": 0.05},
                            default_rate=0.4, hash_col=h)
    return out.select("doc_id", "source")


def q_pii_redact(spark, sf_dir):
    """PII redaction: email / IPv4 / phone spans -> typed tags + per-doc
    counts. The corpus has no PII, so identifiers are injected
    deterministically from doc_id first (both engines inject the same
    string, then redact)."""
    from feathr_spark.operators.corpus import pii_features

    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".77 tel +1 555 01"),
            F.pmod(F.col("doc_id"), F.lit(100)).cast("string"),
        ).alias("text"))
    return pii_features(injected)


def q_mixture_weights(spark, sf_dir):
    """Per-domain token accounting vs a target mixture -> resampling
    weights (domains outside the target get weight 0)."""
    from feathr_spark.operators.corpus import mixture_weights

    docs = _t(spark, sf_dir, "documents")
    out = mixture_weights(docs, {"src0": 0.30, "src1": 0.20, "src2": 0.10})
    return out.select("source", "n_docs", "n_tokens",
                      F.round("share", 6).alias("share"),
                      F.round("weight", 6).alias("weight"))


def _lm_for(spark, sf_dir):
    """Shared trainer for the two LM contract queries: bigram
    stupid-backoff LM over the src0 'trusted target' slice (the CCNet
    recipe — train on target-like text, score the whole corpus).
    Small vocab + tight bigram cap so pruning and backoff are both
    exercised against the oracle."""
    from feathr_spark.operators.lm import train_ngram_lm

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("source") == "src0")
    lm = train_ngram_lm(target, vocab_size=30, min_count=2,
                        smooth=0.5, alpha=0.4, max_bigrams=50)
    return docs, lm


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM perplexity scoring (Wenzek et al. 2020): bigram
    stupid-backoff LM trained on the src0 target slice, every document
    scored in ONE zero-shuffle broadcast Arrow pass
    (operators/lm.py::perplexity_scores, strategy='broadcast')."""
    from feathr_spark.operators.lm import perplexity_scores

    docs, lm = _lm_for(spark, sf_dir)
    out = perplexity_scores(docs, lm)
    # ppl = exp(-lp/n) amplifies summation-order noise ~exp-fold; 4 dp
    # keeps the hash stable while lp itself is safe at 6 dp
    return out.select("doc_id", "source", "lm_n",
                      F.round("lm_logprob", 6).alias("lm_logprob"),
                      F.round("perplexity", 4).alias("perplexity"))


def q_lm_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail split: per-source ntile(3) over LM
    perplexity (bucket 1 = most target-like). Bucketing runs over the
    6-dp-rounded perplexity with doc_id tie-break so the cut is
    bit-reproducible against the oracle."""
    from feathr_spark.operators.lm import (perplexity_buckets,
                                           perplexity_scores)

    docs, lm = _lm_for(spark, sf_dir)
    scored = perplexity_scores(docs, lm).withColumn(
        "perplexity", F.round("perplexity", 4))
    out = perplexity_buckets(scored, by="source", n_buckets=3)
    return out.select("doc_id", "source", "perplexity", "ppl_bucket")


def q_fds_convert(spark, sf_dir):
    """Quince-FDS tensor output encoding over every conversion path:
    numeric scalar, nullable categorical, dense vector, categorical set,
    and term vectors hitting BOTH term-sort rules (all-float-parseable ->
    numeric order; mixed -> lexical fallback). Pure projection — the FDS
    rewrite adds zero shuffle (functions/fds.py; reference
    FDSConversionUtils.scala:34-60, FeaturizedDatasetUtils.scala:209-221)."""
    from feathr_spark.functions.fds import to_fds

    c = _t(spark, sf_dir, "customer")
    cust = F.col("c_custkey")
    k1 = (cust % 7).cast("int")
    k2 = (cust % 9 + 10).cast("int")
    raw = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("num"),
        F.when(F.col("c_mktsegment") != "BUILDING",
               F.col("c_mktsegment")).alias("cat"),
        F.array(F.col("c_acctbal"), cust.cast("double")).alias("dense"),
        F.array(F.col("c_mktsegment"),
                F.concat(F.lit("seg_"), (cust % 3).cast("string"))).alias("catset"),
        F.create_map(
            k1.cast("string"), (cust % 5).cast("double"),
            k2.cast("string"), (cust % 11).cast("double"),
            F.lit("100"), F.lit(1.5),
        ).alias("tv_num"),
        F.create_map(
            F.concat(F.lit("x"), (cust % 5).cast("string")), F.lit(1.0),
            F.lit("a"), F.lit(2.0),
            F.lit("10"), F.lit(3.0),
        ).alias("tv_lex"),
    )
    out, _types = to_fds(raw, ["num", "cat", "dense", "catset",
                               "tv_num", "tv_lex"])
    # Flatten the FDS structs to SCALAR columns for the comparator: every
    # tensor here has fixed arity (dense=2, catset=2, tv_*=3), so each
    # term/value gets its own column. Top-level array columns crash the
    # driver canonicalizer's pandas sort (unhashable list — the r3 red
    # row), and scalars also dodge any cross-engine JSON float-format
    # skew. The null tensor (BUILDING rows) surfaces as NULL scalars on
    # both sides; the null-stays-null rule itself is unit-tested
    # (test_fds.py).
    return out.select(
        "c_custkey", "num",
        F.col("dense")[0].alias("dense_0"),
        F.col("dense")[1].alias("dense_1"),
        F.col("cat.indices0")[0].alias("cat_term"),
        F.col("cat")["values"][0].alias("cat_val"),
        F.col("catset.indices0")[0].alias("catset_term_0"),
        F.col("catset.indices0")[1].alias("catset_term_1"),
        F.col("catset")["values"][0].alias("catset_val_0"),
        F.col("catset")["values"][1].alias("catset_val_1"),
        F.col("tv_num.indices0")[0].alias("tvn_term_0"),
        F.col("tv_num.indices0")[1].alias("tvn_term_1"),
        F.col("tv_num.indices0")[2].alias("tvn_term_2"),
        F.col("tv_num")["values"][0].alias("tvn_val_0"),
        F.col("tv_num")["values"][1].alias("tvn_val_1"),
        F.col("tv_num")["values"][2].alias("tvn_val_2"),
        F.col("tv_lex.indices0")[0].alias("tvl_term_0"),
        F.col("tv_lex.indices0")[1].alias("tvl_term_1"),
        F.col("tv_lex.indices0")[2].alias("tvl_term_2"),
        F.col("tv_lex")["values"][0].alias("tvl_val_0"),
        F.col("tv_lex")["values"][1].alias("tvl_val_1"),
        F.col("tv_lex")["values"][2].alias("tvl_val_2"),
    )


def q_fds_convert_2d(spark, sf_dir):
    """Rank-2 FDS tensor encoding (the reference's multi-dim path:
    sparse rank-2 = parallel coordinate arrays indices0/indices1/values,
    dense rank-2 = nested arrays — FeaturizedDatasetUtils.scala:364-390
    tensorTypeToDataFrameSchema; reached via declared TensorType configs
    / FDSExtract, SQLConfigurableAnchorExtractor.scala:83-87). Exercises
    a nested term map (both dims numeric-sorted), COO rows with a
    lexical dim0 + numeric dim1 (per-dimension all-or-nothing rule), and
    a dense 2x2. Pure Catalyst projection, zero shuffle; outputs
    flattened to scalars for the driver comparator (fixed arity)."""
    from feathr_spark.functions.fds import to_fds

    c = _t(spark, sf_dir, "customer")
    cust = F.col("c_custkey")
    raw = c.select(
        "c_custkey",
        # nested term map: outer keys {c%3, "9"}, inner {c%5, "7"} / {"1"}
        # — every term float-parseable on both dims -> numeric sort
        F.create_map(
            (cust % 3).cast("string"),
            F.create_map((cust % 5).cast("string"),
                         (cust % 7).cast("double"),
                         F.lit("7"), F.lit(1.5)),
            F.lit("9"),
            F.create_map(F.lit("1"), (cust % 11).cast("double")),
        ).alias("tv2"),
        # COO rows: dim0 has the non-parseable term 'b' -> lexical dim0;
        # dim1 all-parseable -> numeric (10 sorts AFTER c%4, not before)
        F.array(
            F.struct(F.lit("b").alias("d0"),
                     (cust % 4).cast("string").alias("d1"),
                     F.lit(1.0).alias("v")),
            F.struct(F.concat(F.lit("a"), (cust % 2).cast("string")).alias("d0"),
                     F.lit("5").alias("d1"),
                     (cust % 5).cast("double").alias("v")),
            F.struct(F.lit("b").alias("d0"), F.lit("10").alias("d1"),
                     F.lit(2.0).alias("v")),
        ).alias("coo2"),
        # dense rank-2: 2x2 nested arrays
        F.array(F.array(F.col("c_acctbal"), cust.cast("double")),
                F.array((cust % 7).cast("double"),
                        (cust % 9).cast("double"))).alias("dense2"),
    )
    out, _types = to_fds(raw, ["tv2", "coo2", "dense2"])
    assert _types == {"tv2": "SPARSE_TENSOR_2D", "coo2": "SPARSE_TENSOR_2D",
                      "dense2": "DENSE_TENSOR_2D"}, _types
    return out.select(
        "c_custkey",
        F.col("tv2.indices0")[0].alias("tv_i0_0"),
        F.col("tv2.indices0")[1].alias("tv_i0_1"),
        F.col("tv2.indices0")[2].alias("tv_i0_2"),
        F.col("tv2.indices1")[0].alias("tv_i1_0"),
        F.col("tv2.indices1")[1].alias("tv_i1_1"),
        F.col("tv2.indices1")[2].alias("tv_i1_2"),
        F.col("tv2")["values"][0].alias("tv_v_0"),
        F.col("tv2")["values"][1].alias("tv_v_1"),
        F.col("tv2")["values"][2].alias("tv_v_2"),
        F.col("coo2.indices0")[0].alias("coo_i0_0"),
        F.col("coo2.indices0")[1].alias("coo_i0_1"),
        F.col("coo2.indices0")[2].alias("coo_i0_2"),
        F.col("coo2.indices1")[0].alias("coo_i1_0"),
        F.col("coo2.indices1")[1].alias("coo_i1_1"),
        F.col("coo2.indices1")[2].alias("coo_i1_2"),
        F.col("coo2")["values"][0].alias("coo_v_0"),
        F.col("coo2")["values"][1].alias("coo_v_1"),
        F.col("coo2")["values"][2].alias("coo_v_2"),
        F.col("dense2")[0][0].alias("d_00"),
        F.col("dense2")[0][1].alias("d_01"),
        F.col("dense2")[1][0].alias("d_10"),
        F.col("dense2")[1][1].alias("d_11"),
    )



def q_fds_convert_3d(spark, sf_dir):
    """Rank-3 FDS tensor encoding (general FDSConversionUtils case, new
    r5: fds.sparse_tensor_type/_sorted_sparse_nd — one indices{i} array
    per dimension, any rank, per tensorTypeToDataFrameSchema
    FeaturizedDatasetUtils.scala:364-390). Exercises a depth-3 nested
    term map (all dims numeric-sorted), rank-3 COO rows with lexical
    dim0 + numeric dim1 + lexical dim2, and a 2x1x2 dense block. Pure
    Catalyst projection, zero shuffle; flattened to scalars for the
    driver comparator."""
    from feathr_spark.functions.fds import to_fds

    c = _t(spark, sf_dir, "customer")
    cust = F.col("c_custkey")
    raw = c.select(
        "c_custkey",
        # depth-3 term map: outer {c%3, "9"} numeric, mid {"2","1"},
        # inner {c%5, "4"} — numeric sort on every dimension
        F.create_map(
            (cust % 3).cast("string"),
            F.create_map(F.lit("2"),
                         F.create_map((cust % 5).cast("string"),
                                      (cust % 7).cast("double"))),
            F.lit("9"),
            F.create_map(F.lit("1"),
                         F.create_map(F.lit("4"),
                                      (cust % 11).cast("double"))),
        ).alias("tv3"),
        # rank-3 COO: dim0 has 'b' -> lexical; dim1 all-numeric; dim2
        # lexical but never consulted ((d0, d1) is unique)
        F.array(
            F.struct(F.lit("b").alias("d0"),
                     (cust % 4).cast("string").alias("d1"),
                     F.lit("x").alias("d2"), F.lit(1.0).alias("v")),
            F.struct(F.concat(F.lit("a"),
                              (cust % 2).cast("string")).alias("d0"),
                     F.lit("5").alias("d1"), F.lit("z").alias("d2"),
                     (cust % 5).cast("double").alias("v")),
            F.struct(F.lit("b").alias("d0"), F.lit("10").alias("d1"),
                     F.lit("y").alias("d2"), F.lit(2.0).alias("v")),
        ).alias("coo3"),
        # dense rank-3: 2x1x2 nested arrays
        F.array(F.array(F.array(F.col("c_acctbal"), cust.cast("double"))),
                F.array(F.array((cust % 7).cast("double"),
                                (cust % 9).cast("double")))).alias("dense3"),
    )
    out, _types = to_fds(raw, ["tv3", "coo3", "dense3"])
    assert _types == {"tv3": "SPARSE_TENSOR_3D", "coo3": "SPARSE_TENSOR_3D",
                      "dense3": "DENSE_TENSOR_3D"}, _types
    cols = ["c_custkey"]
    for i in range(3):
        for j in range(2):
            cols.append(F.col(f"tv3.indices{i}")[j].alias(f"tv_i{i}_{j}"))
    cols += [F.col("tv3")["values"][j].alias(f"tv_v_{j}") for j in range(2)]
    for i in range(3):
        for j in range(3):
            cols.append(F.col(f"coo3.indices{i}")[j].alias(f"coo_i{i}_{j}"))
    cols += [F.col("coo3")["values"][j].alias(f"coo_v_{j}") for j in range(3)]
    cols += [F.col("dense3")[0][0][0].alias("d_000"),
             F.col("dense3")[0][0][1].alias("d_001"),
             F.col("dense3")[1][0][0].alias("d_100"),
             F.col("dense3")[1][0][1].alias("d_101")]
    return out.select(*cols)


def q_kmeans_clusters(spark, sf_dir):
    """Full-corpus distributed Lloyd k-means, k=4, two update rounds,
    min-id init — replayed EXACTLY by the unrolled DuckDB oracle.
    quantize_decimals=6 puts centroids and the argmin key on a 1e-6
    grid so the numpy-vs-SQL summation-order slack (~1e-13) cannot flip
    an assignment; ties break on cluster index in both engines
    (operators/clustering.py)."""
    from feathr_spark.operators.clustering import assign_kmeans, fit_kmeans

    emb = _t(spark, sf_dir, "embeddings")
    cent = fit_kmeans(emb, k=4, max_iter=2, quantize_decimals=6)
    out = assign_kmeans(emb.select("vec_id", "embedding"), cent,
                        quantize_decimals=6)
    return out.select("vec_id", "cluster",
                      F.round("sq_dist", 4).alias("sq_dist"))


def _kmeans_oracle(k: int = 4, iters: int = 2, dim: int = 64,
                   qd: int = 6, out_round: int = 4) -> str:
    """Unrolled Lloyd in DuckDB: min-id init, per-round argmin on the
    round(qd) grid with cluster-index tie-break, mean update rounded to
    qd, empty cluster keeps the previous centroid."""
    sqd = (f"round(list_sum(list_transform(range(1, {dim + 1}), "
           f"i -> (v.x[i] - {{p}}.cx[i]) * (v.x[i] - {{p}}.cx[i]))), {qd})")
    sql = f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
        ),
        c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
                   list_transform(x, e -> round(e, {qd})) AS cx
            FROM (SELECT vec_id, x FROM v ORDER BY vec_id LIMIT {k})
        )"""
    for it in range(1, iters + 1):
        p = f"c{it - 1}"
        d = sqd.format(p=p)
        sql += f""",
        a{it} AS (
            SELECT vec_id, x, c FROM (
                SELECT v.vec_id, v.x, {p}.c,
                       row_number() OVER (PARTITION BY v.vec_id
                                          ORDER BY {d}, {p}.c) AS rn
                FROM v CROSS JOIN {p}) t
            WHERE rn = 1
        ),
        c{it} AS (
            SELECT {p}.c, coalesce(m.cx, {p}.cx) AS cx
            FROM {p} LEFT JOIN (
                SELECT c, list(mu ORDER BY i) AS cx FROM (
                    SELECT a{it}.c, t.i, round(avg(a{it}.x[t.i]), {qd}) AS mu
                    FROM a{it} CROSS JOIN range(1, {dim + 1}) AS t(i)
                    GROUP BY a{it}.c, t.i) s
                GROUP BY c) m ON m.c = {p}.c
        )"""
    p = f"c{iters}"
    d = sqd.format(p=p)
    raw = (f"list_sum(list_transform(range(1, {dim + 1}), "
           f"i -> (v.x[i] - {p}.cx[i]) * (v.x[i] - {p}.cx[i])))")
    sql += f"""
        SELECT vec_id, c AS cluster, round(dd, {out_round}) AS sq_dist FROM (
            SELECT v.vec_id, {p}.c, {raw} AS dd,
                   row_number() OVER (PARTITION BY v.vec_id
                                      ORDER BY {d}, {p}.c) AS rn
            FROM v CROSS JOIN {p}) t
        WHERE rn = 1
    """
    return sql


def q_curate_funnel(spark, sf_dir):
    """End-to-end curation pipeline (feathr_spark/pipeline.py): Gopher
    quality gate -> exact dedup -> per-source cap, composed as ONE lazy
    plan (track_counts=False); the DuckDB oracle replays the same funnel
    over the shared gopher-rule CTEs."""
    from feathr_spark.pipeline import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    out, _report = curate_corpus(
        docs,
        gopher=True,
        gopher_thresholds={"min_words": 25, "min_stopword_hits": 1},
        exact=True,
        max_per_source=30,
    )
    return out.select("doc_id", "source")


def q_quality_classifier(spark, sf_dir):
    """GPT-3-style quality filter (Brown et al. 2020 App. A): logistic
    regression over bag-of-token term frequencies, trained end-to-end
    IN the engine (vocab -> encode -> featurize -> 2 GD rounds ->
    score) and replayed EXACTLY by the unrolled DuckDB oracle.
    quantize_decimals=6 puts the weight vector on a 1e-6 grid after
    every round so numpy-vs-SQL summation-order slack (~1e-14) cannot
    drift the trajectory; margins accumulate in ascending feature-index
    order in both engines (operators/classify.py)."""
    from feathr_spark.operators.classify import (
        featurize_tokens, score_logreg, train_logreg)
    from feathr_spark.operators.text import build_vocabulary, encode_tokens

    docs = _t(spark, sf_dir, "documents")
    labeled = docs.withColumn("y", (F.col("lang") == "en").cast("double"))
    vocab = build_vocabulary(labeled, max_size=12, min_count=2)
    enc = encode_tokens(labeled, vocab, keep_cols=("y",))
    feat = featurize_tokens(enc, 13, label_col="y")
    w = train_logreg(feat, 13, rounds=2, lr=1.0, quantize_decimals=6)
    scored = score_logreg(feat, w)
    return scored.select(
        "doc_id", F.round("margin", 4).alias("margin"),
        (F.col("margin") > 0).cast("int").alias("pred"))


def q_embedding_covariance(spark, sf_dir):
    """One-pass distributed moments (mean + covariance) over the
    embedding table — the PCA/whitening statistic (operators/pca.py).
    Partial cells (1 + d + d(d+1)/2 skinny rows per batch) reduce via
    one bounded groupBy(cell).sum; DuckDB replays every upper-triangle
    cell from the same (Σxxᵀ − ΣxΣxᵀ/n)/(n−1) formula."""
    from feathr_spark.operators.pca import embedding_moments

    emb = _t(spark, sf_dir, "embeddings")
    n, mean, cov = embedding_moments(emb)
    d = len(mean)
    rows = [(i + 1, j + 1, round(float(cov[i, j]), 6))
            for i in range(d) for j in range(i, d)]
    return spark.createDataFrame(rows, "i int, j int, cov double")


def q_tfidf_terms(spark, sf_dir):
    """Top-5 TF-IDF terms per document (sklearn smooth-idf form):
    vocabulary-bounded doc-frequency table broadcast as a dict, per-doc
    counting + scoring + top-k cut all inside ONE zero-shuffle Arrow
    pass (operators/text.py::tfidf_top_terms)."""
    from feathr_spark.operators.text import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, k=5)
    return out.select("doc_id", "term",
                      F.round("score", 6).alias("score"), "rank")


def q_pq_topk_det(spark, sf_dir):
    """Product-quantization ADC top-k (Jégou et al. 2011 / FAISS
    IVF-PQ), deterministic form: min-id codebook seeds (lloyd_rounds=0),
    encode + lookup-table distances on the 1e-6 grid so DuckDB replays
    codes and rankings exactly (operators/pq.py). m=8 subspaces of 8
    dims, ksub=16 codes, 3 query vectors, k=10."""
    from feathr_spark.operators.pq import encode_pq, pq_topk, train_pq

    emb = _t(spark, sf_dir, "embeddings")
    cb = train_pq(emb, m=8, ksub=16, lloyd_rounds=0)
    codes = encode_pq(emb.select("vec_id", "embedding"), cb,
                      quantize_decimals=6)
    qrows = (emb.select("vec_id", "embedding")
             .orderBy("vec_id").limit(3).collect())
    out = pq_topk(codes, cb, [r["embedding"] for r in qrows], k=10,
                  quantize_decimals=6)
    return out.select("query_id", "vec_id",
                      F.round("dist", 4).alias("dist"))


def _corpus_versions(spark, sf_dir):
    """Deterministic v1 -> v2 corpus mutation for the diff queries:
    v2 drops doc_id % 11 == 0, rewrites text where doc_id % 13 == 0,
    and adds fresh ids (doc_id + 1000000) cloned from doc_id % 17 == 0."""
    docs = _t(spark, sf_dir, "documents")
    old = docs
    kept = docs.where(F.col("doc_id") % 11 != 0)
    mutated = kept.withColumn(
        "text", F.when(F.col("doc_id") % 13 == 0,
                       F.concat(F.lit("v2 edit: "), F.col("text")))
                 .otherwise(F.col("text")))
    added = (docs.where(F.col("doc_id") % 17 == 0)
             .withColumn("doc_id", F.col("doc_id") + 1000000))
    return old, mutated.unionByName(added)


def q_corpus_diff(spark, sf_dir):
    """Dataset-version diff: per-doc added/removed/changed/unchanged
    between two corpus snapshots — one full-outer hash join on id, the
    shuffle carries (id, content hash) only
    (operators/corpus.py::corpus_diff)."""
    from feathr_spark.operators.corpus import corpus_diff

    old, new = _corpus_versions(spark, sf_dir)
    return corpus_diff(old, new).select("doc_id", "status")


def q_corpus_diff_summary(spark, sf_dir):
    """Per-source roll-up of the version diff + token-budget delta
    (operators/corpus.py::corpus_diff_summary)."""
    from feathr_spark.operators.corpus import corpus_diff_summary

    old, new = _corpus_versions(spark, sf_dir)
    out = corpus_diff_summary(old, new)
    return out.select(
        "source",
        F.col("n_added").cast("long").alias("n_added"),
        F.col("n_removed").cast("long").alias("n_removed"),
        F.col("n_changed").cast("long").alias("n_changed"),
        F.col("n_unchanged").cast("long").alias("n_unchanged"),
        F.col("tok_old").cast("long").alias("tok_old"),
        F.col("tok_new").cast("long").alias("tok_new"),
        F.col("tok_delta").cast("long").alias("tok_delta"))


def q_temporal_split(spark, sf_dir):
    """Embargoed temporal train/val split over events: train strictly
    before val_start - embargo, val at/after val_start, a 2-day embargo
    gap absorbing windowed-feature look-ahead
    (operators/corpus.py::temporal_split). Pure projection."""
    from feathr_spark.operators.corpus import temporal_split

    ev = _t(spark, sf_dir, "events")
    out = temporal_split(ev, "ts", "2024-01-20", embargo=2 * 86400.0)
    return out.select("event_id", "split")


def q_cluster_weights(spark, sf_dir):
    """Repetition-aware sampling weights from exact-content cluster
    labels: weight = 1/cluster_size, so each duplicate family carries
    one document of probability mass
    (operators/corpus.py::cluster_sample_weights)."""
    from feathr_spark.operators.corpus import cluster_sample_weights
    from feathr_spark.operators.text import normalize_text
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    labels = docs.select(
        "doc_id",
        F.min("doc_id").over(
            Window.partitionBy(normalize_text("text"))).alias("cluster_rep"))
    out = cluster_sample_weights(labels)
    return out.select("doc_id", "cluster_rep",
                      F.col("cluster_size").cast("long").alias("cluster_size"),
                      F.round("weight", 6).alias("weight"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's CORRECTNESS harness emits rows for the
    # FIRST 50 dict entries only. Round-5 window (per SURVEY §12.1 +
    # VERDICT r4 item 1): (1) the five round-4 additions that sat past
    # the r4 cap (corpus_diff, corpus_diff_summary, cluster_weights,
    # swa_salted_union, temporal_split — green in the repo-side oracle
    # harness at sf0.001+sf0.01, never driver-checked); (2) backfill
    # with the LONGEST-UNCONFIRMED greens: the 20 queries whose only
    # driver row is r2 (they rotated past the cap in r3), then the
    # oldest r3-green block. ann_ivf is NOT re-run (its rows-only
    # status is recorded in CORRECTNESS_r04 per VERDICT r4 item 3);
    # ann_lsh likewise stays past the cap (rows-only by design,
    # det-twin + recall-bound verified). Everything past the cap has a
    # green row in r1-r4 and is re-verified by the identical
    # dtype-strict DuckDB compare in tests/test_driver_contract.py
    # every round.
    return {
        # -- (1) round-4 additions, first driver rows ----------------------
        "corpus_diff": q_corpus_diff,
        "corpus_diff_summary": q_corpus_diff_summary,
        "cluster_weights": q_cluster_weights,
        "swa_salted_union": q_swa_salted_union,
        "temporal_split": q_temporal_split,
        # -- (2a) green in round 2 only, unconfirmed since -----------------
        "topk_per_group": q_topk_per_group,
        "lookup_two_hop": q_lookup_two_hop,
        "lookup_union_agg": q_lookup_union_agg,
        "derived_features": q_derived_features,
        "mvel_features": q_mvel_features,
        "json_extract": q_json_extract,
        "token_counts": q_token_counts,
        "quality_features": q_quality,
        "exact_dup_groups": q_exact_dup_groups,
        "shingle_count": q_shingle_count,
        "embedding_norms": q_embedding_norms,
        "pairwise_cosine": q_pairwise_cosine,
        "word_counts": q_word_counts,
        "ngram_counts": q_ngram_counts,
        "domain_cap": q_domain_cap,
        "line_dedup": q_line_dedup,
        "url_features": q_url_features,
        "stream_hourly": q_stream_hourly,
        "stream_sliding": q_stream_sliding,
        "lang_id": q_lang_id,
        # -- (2b) green in round 3 only, unconfirmed since -----------------
        "kmeans_clusters": q_kmeans_clusters,
        "curate_funnel": q_curate_funnel,
        "token_dedup_pairs": q_token_dedup_pairs,
        "token_dup_groups": q_token_dup_groups,
        "gopher_rules": q_gopher_rules,
        "shard_shuffle": q_shard_shuffle,
        "c4_rules": q_c4_rules,
        "gopher_repetition": q_gopher_repetition,
        "select_by_budget": q_select_by_budget,
        "token_contamination": q_token_contamination,
        "lm_perplexity": q_lm_perplexity,
        "tokenize_docs": q_tokenize_docs,
        "token_histogram": q_token_histogram,
        "detokenize": q_detokenize,
        "temperature_mixture": q_temperature_mixture,
        "importance_scores": q_importance_scores,
        "bpe_train": q_bpe_train,
        "bpe_encode_det": q_bpe_encode_det,
        "chunk_sequences": q_chunk_sequences,
        "leakage_safe_split": q_leakage_safe_split,
        "client_flow": q_client_flow,
        "stream_asof": q_stream_asof,
        "stream_running": q_stream_running,
        # the two never-green rows, hard-oracled in r5 (VERDICT r4 item
        # 4a): the seeded Gaussian LSH path with literal hyperplanes in
        # the oracle, and the IVF path whose deterministic Lloyd fit the
        # oracle replays as unrolled CTEs — both float64-decision modes
        # of the REAL operators, not the det twins
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        # ---- 50-row driver cap falls here --------------------------------
        # -- past the cap: green r3, next-longest-unconfirmed --------------
        "ann_recall_bounds": q_ann_recall_bounds,
        "hocon_join": q_hocon_join,
        "gen_derived": q_gen_derived,
        "image_stats": q_image_stats,
        "incremental_dedup": q_incremental_dedup,
        "dup_spans": q_dup_spans,
        "full_plan": q_full_plan,
        "lookup_elementwise": q_lookup_elementwise,
        "swa_sim_delay": q_swa_sim_delay,
        "swa_custom_agg": q_swa_custom_agg,
        "semantic_dedup": q_semantic_dedup,
        "ann_lsh_det": q_ann_lsh_det,
        "ann_ivf_det": q_ann_ivf_det,
        "quality_classifier": q_quality_classifier,
        "embedding_covariance": q_embedding_covariance,
        "tfidf_terms": q_tfidf_terms,
        "pq_topk_det": q_pq_topk_det,
        "quantize_embeddings": q_quantize_embeddings,
        "repetition_features": q_repetition_features,
        "contamination_check": q_contamination,
        "pack_sequences": q_pack_sequences,
        "stratified_sample": q_stratified_sample,
        "pii_redact": q_pii_redact,
        "mixture_weights": q_mixture_weights,
        # -- past the cap: green r4 (freshest rows, rotate out) ------------
        "fds_convert": q_fds_convert,
        "token_stats": q_token_stats,
        "feature_drift": q_feature_drift,
        "category_drift": q_category_drift,
        "asof_fused": q_asof_fused,
        "html_extract": q_html_extract,
        "shard_write": q_shard_write,
        "semantic_contamination": q_semantic_contamination,
        "quality_lottery": q_quality_lottery,
        "corpus_datacard": q_corpus_datacard,
        "pii_cards": q_pii_cards,
        "lm_ppl_buckets": q_lm_ppl_buckets,
        "fds_convert_2d": q_fds_convert_2d,
        "doc_fingerprint": q_doc_fingerprint,
        "feature_stats": q_feature_stats,
        "near_dup_embeddings": q_near_dup_embeddings,
        "rollup_distinct_daily": q_rollup_distinct_daily,
        "swa_lateral": q_swa_lateral,
        "swa_slick": q_swa_slick,
        "swa_sum_count_avg": q_swa_sum_count_avg,
        "swa_sum_count_avg_cogroup": q_swa_sum_count_avg_cogroup,
        "swa_min_max": q_swa_min_max,
        "swa_latest_timesince": q_swa_latest_timesince,
        "swa_count_distinct": q_swa_count_distinct,
        "swa_filtered": q_swa_filtered,
        "swa_delay": q_swa_delay,
        "swa_grouped_topk": q_swa_grouped_topk,
        "swa_pooling": q_swa_pooling,
        "swa_multikey": q_swa_multikey,
        "swa_salted": q_swa_salted,
        "asof_purchase": q_asof_purchase,
        "asof_tokens": q_asof_tokens,
        "asof_prune": q_asof_prune,
        "asof_tolerance": q_asof_tolerance,
        "asof_cogroup": q_asof_cogroup,
        "minhash_clusters": q_minhash_clusters,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "knn_bruteforce": q_knn_bruteforce,
        "gen_cutoff": q_gen_cutoff,
        "gen_term_map": q_gen_term_map,
        "gen_incremental": q_gen_incremental,
        "rollup_daily": q_rollup_daily,
        "lag_lead": q_lag_lead,
        "sessionize": q_sessionize,
        "session_stats": q_session_stats,
        "backfill": q_backfill,
        "rolling_stats": q_rolling_stats,
        "tpch_q1": q_tpch_q1,
        # -- new in round 5 (past the cap; repo-harness green) -------------
        "fds_convert_3d": q_fds_convert_3d,
    }


# Exact 3-word-shingle Jaccard over normalized text — the DuckDB twin of
# operators.text.shingles/shingle_hashes (same normalization: lowercase,
# strip [^\w\s], collapse \s+, trim; Jaccard over DISTINCT shingles ==
# Jaccard over distinct xxhash64(shingle) modulo 64-bit collisions).
_SHINGLE_JACCARD_CTE = r"""
    w AS (
        SELECT doc_id, list_filter(regexp_split_to_array(
            trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                                '\s+', ' ', 'g')),
            '\s+'), x -> x <> '') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(len(words) - 2, 0) + 1),
            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS s
        FROM w
    ), jp AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s))::DOUBLE
               / greatest(len(list_distinct(list_concat(a.s, b.s))), 1) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
"""

_CONTAMINATION_ORACLE = r"""
    WITH w AS (
        SELECT doc_id, list_filter(regexp_split_to_array(
            trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                                '\s+', ' ', 'g')),
            '\s+'), x -> x <> '') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(len(words) - 2, 0) + 1),
            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS s
        FROM w
    ), bench AS (
        SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 37 = 0
    ), doc_g AS (
        SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 37 <> 0
    )
    SELECT d.doc_id, count(*)::BIGINT AS n_hits
    FROM doc_g d JOIN bench b ON d.g = b.g
    GROUP BY d.doc_id
"""

_JACCARD_PAIRS_ORACLE = f"""
    WITH {_SHINGLE_JACCARD_CTE}
    SELECT id_a, id_b, round(j, 5) AS jaccard FROM jp WHERE j >= 0.7
"""


# Bigram stupid-backoff LM replay (operators/lm.py): train on the src0
# slice (vocab 30 / min_count 2 / smooth 0.5 / alpha 0.4 / max_bigrams
# 50 — mirrors _lm_for), score every document. Shared by both LM
# contract queries.
_LM_MODEL_CTES = r"""
    w AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(
                   trim(regexp_replace(regexp_replace(lower(text),
                        '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                   x -> x <> '') AS ws
        FROM documents
    ),
    ttok AS (SELECT doc_id, unnest(ws) AS w,
                    generate_subscripts(ws, 1) AS pos
             FROM w WHERE source = 'src0'),
    uni AS (SELECT w, count(*) AS n FROM ttok GROUP BY w),
    vocab AS (SELECT w, n FROM uni WHERE n >= 2
              ORDER BY n DESC, w ASC LIMIT 30),
    tot AS (SELECT coalesce(sum(n), 0) AS n_total FROM uni),
    vin AS (SELECT coalesce(sum(n), 0) AS n_in, count(*) AS v FROM vocab),
    unigrams AS (
        SELECT v.w AS w,
               ln((v.n + 0.5) / (tot.n_total + 0.5 * (vin.v + 1))) AS logp1
        FROM vocab v, tot, vin
        UNION ALL
        SELECT '<unk>',
               ln((tot.n_total - vin.n_in + 0.5)
                  / (tot.n_total + 0.5 * (vin.v + 1)))
        FROM tot, vin
    ),
    tpair AS (
        SELECT coalesce(v1.w, '<unk>') AS prev,
               coalesce(v2.w, '<unk>') AS w
        FROM ttok a JOIN ttok b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        LEFT JOIN vocab v1 ON v1.w = a.w
        LEFT JOIN vocab v2 ON v2.w = b.w
    ),
    big AS (SELECT prev, w, count(*) AS n FROM tpair GROUP BY prev, w),
    ctx AS (SELECT prev, sum(n) AS ctx FROM big GROUP BY prev),
    -- prune AFTER ctx so kept-pair probabilities keep their true
    -- context mass (matches train_ngram_lm's pre-prune ctx totals)
    kept AS (SELECT prev, w, n FROM big
             ORDER BY n DESC, prev ASC, w ASC LIMIT 50),
    bigrams AS (SELECT k.prev, k.w, ln(k.n * 1.0 / c.ctx) AS logp2
                FROM kept k JOIN ctx c USING (prev)),
    stok AS (SELECT doc_id, unnest(ws) AS tok,
                    generate_subscripts(ws, 1) AS pos FROM w),
    mapped AS (
        SELECT s.doc_id, s.pos, coalesce(v.w, '<unk>') AS w
        FROM stok s LEFT JOIN vocab v ON v.w = s.tok
    ),
    seq AS (
        SELECT doc_id, pos, w,
               lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM mapped
    ),
    toklp AS (
        SELECT s.doc_id,
               CASE WHEN s.prev IS NULL THEN u.logp1
                    ELSE coalesce(b.logp2, ln(0.4) + u.logp1) END AS lp
        FROM seq s
        JOIN unigrams u ON u.w = s.w
        LEFT JOIN bigrams b ON b.prev = s.prev AND b.w = s.w
    ),
    lm_scored AS (
        SELECT doc_id, sum(lp) AS lm_logprob, count(*) AS lm_n
        FROM toklp GROUP BY doc_id
    )
"""


# Gopher rule measures (Rae et al. 2021 table A1) — shared between the
# gopher_rules oracle and the curate_funnel pipeline oracle.
_GOPHER_CTES = r"""
            b AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   w -> w <> '') AS ws,
                       regexp_split_to_array(text, '\n') AS ls
                FROM documents
            ), m AS (
                SELECT doc_id,
                       len(ws) AS nw,
                       greatest(len(ws), 1)::DOUBLE AS nw1,
                       coalesce(list_aggregate(
                           list_transform(ws, w -> length(w)), 'sum'), 0)
                           / greatest(len(ws), 1)::DOUBLE AS mwl,
                       (length(text) - length(replace(text, '#', '')))
                       + (length(text)
                          - length(regexp_replace(text, '\.\.\.', 'xx', 'g')))
                       + (length(text) - length(replace(text, '…', '')))
                           AS n_sym,
                       len(list_filter(ls,
                           l -> regexp_matches(l, '^\s*[-*•]')))
                           / greatest(len(ls), 1)::DOUBLE AS bullet_frac,
                       len(list_filter(ls,
                           l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                           / greatest(len(ls), 1)::DOUBLE AS ell_frac,
                       len(list_filter(ws,
                           w -> regexp_matches(w, '[A-Za-z]')))
                           / greatest(len(ws), 1)::DOUBLE AS alpha_frac,
                       len(list_filter(
                           ['the','be','to','of','and','that','have','with'],
                           s -> list_contains(
                               list_transform(ws, w -> lower(w)), s)))
                           AS stop_hits
                FROM b
            )
"""

_GOPHER_PASS = ("((nw >= 25 AND nw <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0) "
                "AND (n_sym / nw1 <= 0.1) AND (bullet_frac <= 0.9) "
                "AND (ell_frac <= 0.3) AND (alpha_frac >= 0.8) "
                "AND (stop_hits >= 1))")


def _ann_lsh_oracle() -> str:
    """DuckDB replay of the SEEDED LSH path (q_ann_lsh): the seed-7
    Gaussian hyperplanes are data-independent constants, so they embed
    as double literals (exact shortest-roundtrip repr of the float32
    draws — the same values the engine widens to float64). Bucket bits
    use the raw dot (sign-invariant under normalization); the 37-mask
    multi-probe set (identity + 8 single-bit + 28 double-bit flips) is
    likewise a literal list. Everything else — query buckets, candidate
    join, cosine scores, top-3 — is recomputed from the table."""
    from feathr_spark.operators.similarity import _hyperplanes

    H = _hyperplanes(64, 8, 7)
    hrows = ",\n                ".join(
        "({}, [{}])".format(
            b, ", ".join(repr(float(v)) for v in H[b]))
        for b in range(8))
    masks = [0] + [1 << i for i in range(8)] + [
        (1 << i) | (1 << j) for i in range(8) for j in range(i + 1, 8)]
    return """
        WITH h(bit, hv) AS (VALUES
                {hrows}
        ), c AS (
            SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
        ), cb AS (
            SELECT c.vec_id,
                   sum(CASE WHEN list_dot_product(c.cv, h.hv) > 0
                       THEN 1 << h.bit ELSE 0 END)::BIGINT AS bucket
            FROM c CROSS JOIN h GROUP BY c.vec_id
        ), q AS (
            SELECT cb.vec_id AS query_id, c.cv AS qv, cb.bucket AS qbucket
            FROM cb JOIN c USING (vec_id) WHERE cb.vec_id < 4
        ), probes AS (
            SELECT DISTINCT query_id, xor(qbucket, m.mask) AS bucket
            FROM q CROSS JOIN (SELECT unnest({masks}) AS mask) m
        ), cand AS (
            SELECT p.query_id, cb.vec_id
            FROM probes p JOIN cb USING (bucket)
        ), s AS (
            SELECT cand.query_id, cand.vec_id,
                   list_dot_product(q.qv, c.cv)
                   / greatest(sqrt(list_dot_product(q.qv, q.qv))
                              * sqrt(list_dot_product(c.cv, c.cv)), 1e-24)
                       AS score
            FROM cand
            JOIN q USING (query_id)
            JOIN c ON c.vec_id = cand.vec_id
        ), r AS (
            SELECT query_id, vec_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id) AS rn
            FROM s
        )
        SELECT query_id, vec_id, round(score, 5) AS score
        FROM r WHERE rn <= 3
    """.format(hrows=hrows, masks=masks)


def _ann_ivf_oracle(n_centroids: int = 16, iters: int = 5, n_probe: int = 8,
                    k: int = 3, dim: int = 64, sample: int = 20000) -> str:
    """DuckDB replay of the DETERMINISTIC-fit IVF path (q_ann_ivf):
    with fit="det" + float64 every step — id-ordered sample, evenly
    spaced init centroids, each unrolled Lloyd iteration (argmax-cosine
    assignment with ties to the lowest cell, normalized member-mean
    recenter, empty cells keep their centroid), corpus assignment,
    probe ranking, scoring, top-k — is a pure function of the table, so
    the oracle recomputes the ENTIRE pipeline including the k-means fit
    (iterations generated as chained CTEs)."""
    steps = []
    for i in range(1, iters + 1):
        steps.append("""a{i} AS (
            SELECT sn.rk, sn.nv,
                   (SELECT kk.cell FROM km{p} kk
                    ORDER BY list_dot_product(sn.nv, kk.cv) DESC, kk.cell
                    LIMIT 1) AS cell
            FROM sn
        ), mu{i} AS (
            SELECT cell, list(av ORDER BY d) AS mv
            FROM (SELECT cell, t.d AS d, avg(nv[t.d + 1]) AS av
                  FROM a{i}, range({dim}) t(d) GROUP BY cell, t.d)
            GROUP BY cell
        ), km{i} AS (
            SELECT kk.cell,
                   CASE WHEN m.mv IS NULL THEN kk.cv
                        ELSE list_transform(m.mv, x -> x /
                             greatest(sqrt(list_dot_product(m.mv, m.mv)),
                                      1e-12)) END AS cv
            FROM km{p} kk LEFT JOIN mu{i} m USING (cell)
        )""".format(i=i, p=i - 1, dim=dim))
    return """
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE embedding IS NOT NULL
        ), cn AS (
            SELECT vec_id, list_transform(v, x -> x /
                   greatest(sqrt(list_dot_product(v, v)), 1e-12)) AS nv
            FROM e
        ), sn AS (
            SELECT * FROM (
                SELECT vec_id,
                       row_number() OVER (ORDER BY vec_id) - 1 AS rk, nv
                FROM cn)
            WHERE rk < {sample}
        ), prm AS (
            SELECT greatest(count(*) // {nc}, 1) AS step FROM sn
        ), km0 AS (
            SELECT c.cell, sn.nv AS cv
            FROM (SELECT unnest(range({nc})) AS cell) c
            CROSS JOIN prm JOIN sn ON sn.rk = c.cell * prm.step
        ), {steps}, assign AS (
            SELECT cn.vec_id,
                   (SELECT kk.cell FROM km{it} kk
                    ORDER BY list_dot_product(cn.nv, kk.cv) DESC, kk.cell
                    LIMIT 1) AS cell
            FROM cn
        ), qn2 AS (
            SELECT vec_id AS query_id, nv AS qv FROM cn WHERE vec_id < 3
        ), probes AS (
            SELECT query_id, cell FROM (
                SELECT q.query_id, kk.cell,
                       row_number() OVER (PARTITION BY q.query_id
                           ORDER BY list_dot_product(q.qv, kk.cv) DESC,
                                    kk.cell) AS rn
                FROM qn2 q CROSS JOIN km{it} kk)
            WHERE rn <= {np}
        ), cand AS (
            SELECT p.query_id, a.vec_id FROM probes p JOIN assign a USING (cell)
        ), sc AS (
            SELECT cand.query_id, cand.vec_id,
                   list_dot_product(q.qv, c.nv) AS score
            FROM cand JOIN qn2 q USING (query_id)
            JOIN cn c ON c.vec_id = cand.vec_id
        ), r AS (
            SELECT query_id, vec_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id) AS rn
            FROM sc
        )
        SELECT query_id, vec_id, round(score, 5) AS score
        FROM r WHERE rn <= {k}
    """.format(sample=sample, nc=n_centroids, it=iters, np=n_probe, k=k,
               steps=", ".join(steps))


def oracle_sql() -> dict[str, str]:
    win_1d = ("f.user_id = o.user_id AND epoch_us(f.ts) > epoch_us(o.ts) - 86400000000 "
              "AND epoch_us(f.ts) <= epoch_us(o.ts)")
    return {
        # FDS tensor encoding: replay every conversion rule, including the
        # all-float-parseable-terms numeric sort vs the lexical fallback
        # (struct list_sort orders by the leading field).
        "fds_convert": """
            WITH base AS (
                SELECT c_custkey, c_acctbal, c_mktsegment,
                       CAST(c_custkey % 7 AS INT) AS k1,
                       CAST(c_custkey % 9 + 10 AS INT) AS k2,
                       CAST(c_custkey % 5 AS DOUBLE) AS v1,
                       CAST(c_custkey % 11 AS DOUBLE) AS v2
                FROM customer
            ), ents AS (
                SELECT c_custkey, c_acctbal, c_mktsegment,
                    list_sort([
                        struct_pack(s := k1, k := CAST(k1 AS VARCHAR), v := CAST(v1 AS FLOAT)),
                        struct_pack(s := k2, k := CAST(k2 AS VARCHAR), v := CAST(v2 AS FLOAT)),
                        struct_pack(s := 100, k := '100', v := CAST(1.5 AS FLOAT))
                    ]) AS tvn,
                    list_sort([
                        struct_pack(k := 'x' || CAST(c_custkey % 5 AS VARCHAR), v := CAST(1.0 AS FLOAT)),
                        struct_pack(k := 'a', v := CAST(2.0 AS FLOAT)),
                        struct_pack(k := '10', v := CAST(3.0 AS FLOAT))
                    ]) AS tvl,
                    list_sort([
                        struct_pack(k := c_mktsegment, v := CAST(1.0 AS FLOAT)),
                        struct_pack(k := 'seg_' || CAST(c_custkey % 3 AS VARCHAR), v := CAST(1.0 AS FLOAT))
                    ]) AS cs
                FROM base
            )
            -- scalar flattening (fixed tensor arity) mirrors the Spark
            -- side: no top-level arrays, null tensor -> NULL scalars
            SELECT c_custkey,
                CAST(c_acctbal AS FLOAT) AS num,
                CAST(c_acctbal AS FLOAT) AS dense_0,
                CAST(c_custkey AS FLOAT) AS dense_1,
                CASE WHEN c_mktsegment <> 'BUILDING'
                     THEN c_mktsegment END AS cat_term,
                CASE WHEN c_mktsegment <> 'BUILDING'
                     THEN CAST(1.0 AS FLOAT) END AS cat_val,
                cs[1].k AS catset_term_0, cs[2].k AS catset_term_1,
                cs[1].v AS catset_val_0, cs[2].v AS catset_val_1,
                tvn[1].k AS tvn_term_0, tvn[2].k AS tvn_term_1,
                tvn[3].k AS tvn_term_2,
                tvn[1].v AS tvn_val_0, tvn[2].v AS tvn_val_1,
                tvn[3].v AS tvn_val_2,
                tvl[1].k AS tvl_term_0, tvl[2].k AS tvl_term_1,
                tvl[3].k AS tvl_term_2,
                tvl[1].v AS tvl_val_0, tvl[2].v AS tvl_val_1,
                tvl[3].v AS tvl_val_2
            FROM ents
        """,
        # Rank-2 FDS: sparse COO sorted by (dim0, dim1) with the
        # per-dimension numeric-vs-lexical rule encoded in the struct
        # sort keys (s0/s1 DOUBLE = numeric order, s0 VARCHAR = lexical),
        # dense rank-2 = nested arrays flattened to scalars.
        "fds_convert_2d": """
            WITH base AS (
                SELECT c_custkey, c_acctbal,
                       CAST(c_custkey % 3 AS VARCHAR) AS ok1,
                       CAST(c_custkey % 5 AS VARCHAR) AS ik1,
                       CAST(c_custkey % 7 AS DOUBLE) AS v1,
                       CAST(c_custkey % 11 AS DOUBLE) AS v3,
                       CAST(c_custkey % 4 AS VARCHAR) AS cd1,
                       'a' || CAST(c_custkey % 2 AS VARCHAR) AS ad0,
                       CAST(c_custkey % 5 AS DOUBLE) AS cv2,
                       CAST(c_custkey % 9 AS DOUBLE) AS dv3
                FROM customer
            ), tv AS (
                SELECT c_custkey, list_sort([
                    struct_pack(s0 := CAST(ok1 AS DOUBLE),
                                s1 := CAST(ik1 AS DOUBLE),
                                k0 := ok1, k1 := ik1,
                                v := CAST(v1 AS FLOAT)),
                    struct_pack(s0 := CAST(ok1 AS DOUBLE), s1 := 7.0,
                                k0 := ok1, k1 := '7',
                                v := CAST(1.5 AS FLOAT)),
                    struct_pack(s0 := 9.0, s1 := 1.0,
                                k0 := '9', k1 := '1',
                                v := CAST(v3 AS FLOAT))
                ]) AS e FROM base
            ), coo AS (
                SELECT c_custkey, list_sort([
                    struct_pack(s0 := 'b', s1 := CAST(cd1 AS DOUBLE),
                                k0 := 'b', k1 := cd1,
                                v := CAST(1.0 AS FLOAT)),
                    struct_pack(s0 := ad0, s1 := 5.0,
                                k0 := ad0, k1 := '5',
                                v := CAST(cv2 AS FLOAT)),
                    struct_pack(s0 := 'b', s1 := 10.0,
                                k0 := 'b', k1 := '10',
                                v := CAST(2.0 AS FLOAT))
                ]) AS e FROM base
            )
            SELECT b.c_custkey,
                   tv.e[1].k0 AS tv_i0_0, tv.e[2].k0 AS tv_i0_1,
                   tv.e[3].k0 AS tv_i0_2,
                   tv.e[1].k1 AS tv_i1_0, tv.e[2].k1 AS tv_i1_1,
                   tv.e[3].k1 AS tv_i1_2,
                   tv.e[1].v AS tv_v_0, tv.e[2].v AS tv_v_1,
                   tv.e[3].v AS tv_v_2,
                   coo.e[1].k0 AS coo_i0_0, coo.e[2].k0 AS coo_i0_1,
                   coo.e[3].k0 AS coo_i0_2,
                   coo.e[1].k1 AS coo_i1_0, coo.e[2].k1 AS coo_i1_1,
                   coo.e[3].k1 AS coo_i1_2,
                   coo.e[1].v AS coo_v_0, coo.e[2].v AS coo_v_1,
                   coo.e[3].v AS coo_v_2,
                   CAST(b.c_acctbal AS FLOAT) AS d_00,
                   CAST(b.c_custkey AS FLOAT) AS d_01,
                   CAST(b.v1 AS FLOAT) AS d_10,
                   CAST(b.dv3 AS FLOAT) AS d_11
            FROM base b JOIN tv USING (c_custkey) JOIN coo USING (c_custkey)
        """,
        "fds_convert_3d": """
            WITH base AS (
                SELECT c_custkey, c_acctbal,
                       CAST(c_custkey % 3 AS VARCHAR) AS ok1,
                       CAST(c_custkey % 5 AS VARCHAR) AS ik1,
                       CAST(c_custkey % 7 AS DOUBLE) AS v1,
                       CAST(c_custkey % 11 AS DOUBLE) AS v2,
                       CAST(c_custkey % 4 AS VARCHAR) AS cd1,
                       'a' || CAST(c_custkey % 2 AS VARCHAR) AS ad0,
                       CAST(c_custkey % 5 AS DOUBLE) AS cv2,
                       CAST(c_custkey % 7 AS DOUBLE) AS d10,
                       CAST(c_custkey % 9 AS DOUBLE) AS d11
                FROM customer
            ), tv AS (
                SELECT c_custkey, list_sort([
                    struct_pack(s0 := CAST(ok1 AS DOUBLE),
                                k0 := ok1, k1 := '2', k2 := ik1,
                                v := CAST(v1 AS FLOAT)),
                    struct_pack(s0 := 9.0,
                                k0 := '9', k1 := '1', k2 := '4',
                                v := CAST(v2 AS FLOAT))
                ]) AS e FROM base
            ), coo AS (
                SELECT c_custkey, list_sort([
                    struct_pack(s0 := 'b', s1 := CAST(cd1 AS DOUBLE),
                                k0 := 'b', k1 := cd1, k2 := 'x',
                                v := CAST(1.0 AS FLOAT)),
                    struct_pack(s0 := ad0, s1 := 5.0,
                                k0 := ad0, k1 := '5', k2 := 'z',
                                v := CAST(cv2 AS FLOAT)),
                    struct_pack(s0 := 'b', s1 := 10.0,
                                k0 := 'b', k1 := '10', k2 := 'y',
                                v := CAST(2.0 AS FLOAT))
                ]) AS e FROM base
            )
            SELECT b.c_custkey,
                   tv.e[1].k0 AS tv_i0_0, tv.e[2].k0 AS tv_i0_1,
                   tv.e[1].k1 AS tv_i1_0, tv.e[2].k1 AS tv_i1_1,
                   tv.e[1].k2 AS tv_i2_0, tv.e[2].k2 AS tv_i2_1,
                   tv.e[1].v AS tv_v_0, tv.e[2].v AS tv_v_1,
                   coo.e[1].k0 AS coo_i0_0, coo.e[2].k0 AS coo_i0_1,
                   coo.e[3].k0 AS coo_i0_2,
                   coo.e[1].k1 AS coo_i1_0, coo.e[2].k1 AS coo_i1_1,
                   coo.e[3].k1 AS coo_i1_2,
                   coo.e[1].k2 AS coo_i2_0, coo.e[2].k2 AS coo_i2_1,
                   coo.e[3].k2 AS coo_i2_2,
                   coo.e[1].v AS coo_v_0, coo.e[2].v AS coo_v_1,
                   coo.e[3].v AS coo_v_2,
                   CAST(b.c_acctbal AS FLOAT) AS d_000,
                   CAST(b.c_custkey AS FLOAT) AS d_001,
                   CAST(b.d10 AS FLOAT) AS d_100,
                   CAST(b.d11 AS FLOAT) AS d_101
            FROM base b JOIN tv USING (c_custkey) JOIN coo USING (c_custkey)
        """,
        "kmeans_clusters": _kmeans_oracle(k=4, iters=2, dim=64, qd=6,
                                          out_round=4),
        "swa_sum_count_avg": _SWA_BASIC_ORACLE,
        "swa_sum_count_avg_cogroup": _SWA_BASIC_ORACLE,
        "swa_min_max": f"""
            SELECT o.event_id, round(min(f.value), 4) AS min_1d, round(max(f.value), 4) AS max_1d
            FROM events o LEFT JOIN events f ON {win_1d}
            GROUP BY o.event_id
        """,
        "swa_latest_timesince": f"""
            SELECT o.event_id,
                   round(arg_max(f.value, f.ts), 4) AS latest_1d,
                   round((epoch_us(o.ts) - max(epoch_us(f.ts))) / 1e6, 6) AS timesince_1d
            FROM events o LEFT JOIN events f ON {win_1d}
            GROUP BY o.event_id, o.ts
        """,
        "swa_count_distinct": f"""
            SELECT o.event_id, count(DISTINCT f.event_type) AS types_1d
            FROM events o LEFT JOIN events f ON {win_1d}
            GROUP BY o.event_id
        """,
        "swa_filtered": f"""
            SELECT o.event_id,
                   round(sum(f.value) FILTER (WHERE f.event_type = 'click'), 4) AS click_sum_1d,
                   -- engine COUNT is NULL when no fact row passes the filter
                   -- (reference semantics: sum of per-row 1/0 contributions)
                   NULLIF(count(f.value) FILTER (WHERE f.event_type = 'click'), 0) AS click_cnt_1d
            FROM events o LEFT JOIN events f ON {win_1d}
            GROUP BY o.event_id
        """,
        "swa_delay": """
            SELECT o.event_id, round(sum(f.value), 4) AS sum_1d_delay1h
            FROM events o LEFT JOIN events f
              ON f.user_id = o.user_id
             AND epoch_us(f.ts) >  epoch_us(o.ts) - 3600000000 - 86400000000
             AND epoch_us(f.ts) <= epoch_us(o.ts) - 3600000000
            GROUP BY o.event_id
        """,
        "swa_grouped_topk": """
            WITH pairs AS (
                SELECT o.event_id, f.event_type AS grp, count(*) AS val
                FROM events o JOIN events f
                  ON f.user_id = o.user_id
                 AND epoch_us(f.ts) >  epoch_us(o.ts) - 86400000000
                 AND epoch_us(f.ts) <= epoch_us(o.ts)
                GROUP BY o.event_id, f.event_type
            ), ranked AS (
                SELECT event_id, grp, CAST(val AS DOUBLE) AS val,
                       row_number() OVER (PARTITION BY event_id ORDER BY val DESC, grp) AS rn
                FROM pairs
            )
            SELECT event_id, grp, val FROM ranked WHERE rn <= 2
        """,
        "asof_purchase": """
            SELECT o.event_id, round(f.value, 4) AS last_purchase_value
            FROM events o ASOF LEFT JOIN (
                SELECT * FROM events WHERE event_type = 'purchase'
            ) f ON o.user_id = f.user_id AND f.ts <= o.ts
        """,
        "asof_tokens": """
            SELECT o.event_id,
                   coalesce(to_json(f.tokens), '[]') AS last_tokens_json
            FROM events o ASOF LEFT JOIN (
                SELECT *, list_transform(range(0, (event_id % 5) + 1),
                                         i -> (event_id * 7 + i) % 997) AS tokens
                FROM events WHERE event_type = 'purchase'
            ) f ON o.user_id = f.user_id AND f.ts <= o.ts
        """,
        "asof_prune": """
            SELECT o.event_id, round(f.value, 4) AS last_purchase_value,
                   f.event_type AS last_kind
            FROM events o ASOF LEFT JOIN (
                SELECT * FROM events WHERE event_type = 'purchase'
            ) f ON o.user_id = f.user_id AND f.ts <= o.ts
        """,
        "lag_lead": """
            SELECT event_id,
                   round(lag(value) OVER w, 4) AS value_lag1,
                   round(lead(value) OVER w, 4) AS value_lead1
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "sessionize": """
            SELECT event_id,
                   CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
            FROM (
                SELECT event_id, user_id, ts,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                              OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
                            THEN 1 ELSE 0 END AS boundary
                FROM events
            )
        """,
        "session_stats": """
            WITH s AS (
                SELECT user_id, ts, value,
                       CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
                FROM (
                    SELECT user_id, ts, value,
                           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                  OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
                                THEN 1 ELSE 0 END AS boundary
                    FROM events
                )
            )
            SELECT user_id, session_id,
                   min(epoch_us(ts)) AS session_start_us,
                   count(*) AS n_events,
                   round(sum(value), 4) AS val_sum
            FROM s GROUP BY user_id, session_id
        """,
        "backfill": """
            SELECT event_id,
                   round(last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING), 4) AS v_filled
            FROM events
        """,
        "rolling_stats": """
            SELECT o.event_id, round(sum(f.value), 4) AS roll_sum, count(f.value) AS roll_cnt
            FROM events o LEFT JOIN events f
              ON f.user_id = o.user_id
             AND epoch_us(f.ts) >  epoch_us(o.ts) - 3600000000
             AND epoch_us(f.ts) <= epoch_us(o.ts)
            GROUP BY o.event_id
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "topk_per_group": """
            WITH rev AS (
                SELECT l_returnflag, l_partkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
                FROM lineitem GROUP BY l_returnflag, l_partkey
            )
            SELECT l_returnflag, l_partkey, revenue, rk FROM (
                SELECT *, CAST(row_number() OVER (PARTITION BY l_returnflag
                               ORDER BY revenue DESC, l_partkey) AS INT) AS rk
                FROM rev
            ) WHERE rk <= 3
        """,
        "lookup_two_hop": """
            SELECT o.o_orderkey, n.n_name AS nation_name
            FROM orders o
            LEFT JOIN customer c ON c.c_custkey = o.o_custkey
            LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
        """,
        "lookup_union_agg": """
            SELECT c.c_custkey,
                   round(sum(o.o_totalprice), 2) AS order_sum,
                   count(o.o_totalprice) AS n_orders
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        """,
        "derived_features": """
            SELECT o_orderkey,
                   CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bucket,
                   CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS is_urgent,
                   round((CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END) * o_totalprice, 2)
                       AS urgency_price
            FROM orders
        """,
        "mvel_features": """
            SELECT event_id,
                   round(CASE WHEN value IS NOT NULL THEN ln(value + 1.0) END, 6) AS val_log,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
                   upper(substring(event_type, 1, 2)) AS etype2,
                   -- Java (Integer) truncates toward zero; DuckDB CAST rounds
                   CAST(trunc(value / 10.0) AS INTEGER) AS val_bucket
            FROM events
        """,
        "json_extract": """
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
            FROM events
        """,
        "token_counts": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(lower(text), '\s+'), w -> w <> '')) AS n_ws,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
            FROM documents
        """,
        "quality_features": r"""
            WITH w AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS words
                FROM documents
            )
            SELECT doc_id,
                   len(words) AS n_words,
                   round(list_sum(list_transform(words, x -> len(x)))
                         / greatest(len(words), 1), 6) AS mean_word_len,
                   round(len(list_distinct(words)) * 1.0 / greatest(len(words), 1), 6) AS uniq_word_ratio,
                   round(len(list_filter(words, x -> x IN ('the','and','of','to','in','is','that','for','with','are')))
                         * 1.0 / greatest(len(words), 1), 6) AS stopword_ratio
            FROM w
        """,
        "exact_dup_groups": r"""
            SELECT trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                                       '\s+', ' ', 'g')) AS norm_text,
                   count(*) AS n_docs,
                   min(doc_id) AS keep_id
            FROM documents
            GROUP BY 1
        """,
        "shingle_count": r"""
            SELECT doc_id,
                   greatest(len(list_filter(regexp_split_to_array(
                       trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'), '\s+', ' ', 'g')),
                       '\s+'), w -> w <> '')) - 2, 0)::BIGINT AS n_shingles
            FROM documents
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 5) AS norm
            FROM embeddings
        """,
        "pairwise_cosine": """
            WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
                            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x)))), 5)
                       AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
        """,
        "swa_multikey": """
            SELECT o.event_id, round(sum(f.value), 4) AS sum_1d_bytype
            FROM events o LEFT JOIN events f
              ON f.user_id = o.user_id AND f.event_type = o.event_type
             AND epoch_us(f.ts) >  epoch_us(o.ts) - 86400000000
             AND epoch_us(f.ts) <= epoch_us(o.ts)
            GROUP BY o.event_id
        """,
        "swa_salted": _SWA_BASIC_ORACLE,
        "swa_salted_union": _SWA_BASIC_ORACLE,
        "swa_pooling": """
            WITH e AS (
                SELECT vec_id % 50 AS k, 1700000000 + vec_id * 60 AS ts, vec_id, embedding
                FROM embeddings
            ), pairs AS (
                SELECT o.vec_id AS oid, f.embedding AS emb
                FROM e o JOIN e f ON f.k = o.k
                 AND f.ts > o.ts - 7200 AND f.ts <= o.ts
            ), ex AS (
                SELECT oid, i - 1 AS pos, CAST(emb[i] AS DOUBLE) AS v
                FROM pairs CROSS JOIN range(1, 65) r(i)
            )
            SELECT oid AS vec_id, CAST(pos AS BIGINT) AS pos,
                   round(max(v), 4) + 0.0 AS max_p,
                   round(min(v), 4) + 0.0 AS min_p,
                   round(sum(v), 4) + 0.0 AS sum_p,
                   round(avg(v), 6) + 0.0 AS avg_p
            FROM ex GROUP BY oid, pos
        """,
        "semantic_contamination": """
            WITH b AS (
                SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bv
                FROM embeddings WHERE vec_id % 10 = 0
            ), c AS (
                SELECT vec_id, embedding::DOUBLE[] AS cv
                FROM embeddings WHERE vec_id % 10 <> 0
            ), s AS (
                SELECT c.vec_id, b.bench_id,
                       list_dot_product(cv, bv)
                       / greatest(sqrt(list_sum(list_transform(cv, x -> x * x)))
                                  * sqrt(list_sum(list_transform(bv, x -> x * x))),
                                  1e-24) AS score
                FROM c CROSS JOIN b
            ), r AS (
                SELECT vec_id, bench_id, score,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY score DESC, bench_id) AS rn
                FROM s
            )
            SELECT vec_id, bench_id,
                   round(score, 5) AS max_cosine,
                   (score >= 0.4)::INT AS contaminated
            FROM r WHERE rn = 1
        """,
        "knn_bruteforce": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 3
            ), c AS (
                SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
            ), s AS (
                SELECT q.query_id, c.vec_id,
                       list_dot_product(qv, cv)
                       / greatest(sqrt(list_sum(list_transform(qv, x -> x * x)))
                                  * sqrt(list_sum(list_transform(cv, x -> x * x))), 1e-24) AS score
                FROM q CROSS JOIN c
            ), r AS (
                SELECT query_id, vec_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id) AS rn
                FROM s
            )
            SELECT query_id, vec_id, round(score, 5) AS score FROM r WHERE rn <= 3
        """,
        "ann_lsh": _ann_lsh_oracle(),
        "ann_ivf": _ann_ivf_oracle(),
        "ann_lsh_det": """
            WITH qv AS (
                SELECT vec_id,
                       list_transform(embedding,
                           x -> CAST(round(x * 1000000) AS BIGINT)) AS q,
                       embedding::DOUBLE[] AS v
                FROM embeddings
            ), dots AS (
                SELECT vec_id, b.b AS b,
                       list_sum(list_transform(range(1, 65),
                           d -> q[d] * (((b.b * 1000003 + (d - 1) * 7919) % 1999) - 999))) AS dot
                FROM qv, range(8) b(b)
            ), sig AS (
                SELECT vec_id,
                       SUM(CASE WHEN dot >= 0 THEN 1 << b ELSE 0 END)::BIGINT AS sig
                FROM dots GROUP BY vec_id
            ), sv AS (
                SELECT s.vec_id, s.sig, q.v FROM sig s JOIN qv q USING (vec_id)
            ), cand AS (
                SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                       round(list_dot_product(q.v, c.v)
                             / (sqrt(list_dot_product(q.v, q.v))
                                * sqrt(list_dot_product(c.v, c.v))), 6) AS score
                FROM sv q JOIN sv c
                  ON bit_count(xor(q.sig, c.sig)) <= 2 AND c.vec_id <> q.vec_id
                WHERE q.vec_id < 4
            ), r AS (
                SELECT query_id, vec_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id) AS rn
                FROM cand
            )
            SELECT query_id, vec_id, score FROM r WHERE rn <= 3
        """,
        "ann_ivf_det": """
            WITH e AS (
                SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), cents AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
                FROM e WHERE vec_id % 7 = 0 AND vec_id < 105
            ), cos AS (
                SELECT e.vec_id, c.cell,
                       list_dot_product(e.v, c.cv)
                       / (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(c.cv, c.cv))) AS cs
                FROM e CROSS JOIN cents c
            ), assign AS (
                SELECT vec_id, cell FROM (
                    SELECT vec_id, cell,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cs DESC, cell) AS rn
                    FROM cos) WHERE rn = 1
            ), probes AS (
                SELECT vec_id AS query_id, cell FROM (
                    SELECT vec_id, cell,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cs DESC, cell) AS rn
                    FROM cos WHERE vec_id IN (10, 20, 30)) WHERE rn <= 4
            ), cand AS (
                SELECT p.query_id, a.vec_id
                FROM probes p JOIN assign a USING (cell)
                WHERE a.vec_id <> p.query_id
            ), scored AS (
                SELECT cand.query_id, cand.vec_id,
                       round(list_dot_product(q.v, c.v)
                             / (sqrt(list_dot_product(q.v, q.v))
                                * sqrt(list_dot_product(c.v, c.v))), 6) AS score
                FROM cand
                JOIN e q ON q.vec_id = cand.query_id
                JOIN e c ON c.vec_id = cand.vec_id
            ), r AS (
                SELECT query_id, vec_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id) AS rn
                FROM scored
            )
            SELECT query_id, vec_id, score FROM r WHERE rn <= 3
        """,
        "swa_sim_delay": """
            SELECT o.event_id, round(sum(f.value), 4) AS sum_1d_sim1h
            FROM events o LEFT JOIN events f
              ON f.user_id = o.user_id
             AND epoch_us(f.ts) >  epoch_us(o.ts) - 3600000000 - 86400000000
             AND epoch_us(f.ts) <= epoch_us(o.ts) - 3600000000
            GROUP BY o.event_id
        """,
        "lookup_elementwise": """
            WITH ex AS (
                SELECT vec_id % 10 AS bucket, i - 1 AS pos,
                       CAST(embedding[i] AS DOUBLE) AS v
                FROM embeddings CROSS JOIN range(1, 65) r(i)
            ), ag AS (
                SELECT bucket, pos, avg(v) AS m FROM ex GROUP BY bucket, pos
            )
            SELECT d.doc_id, CAST(ag.pos AS BIGINT) AS pos, round(ag.m, 6) AS elem_avg
            FROM documents d JOIN ag ON ag.bucket = d.doc_id % 10
        """,
        "asof_tolerance": """
            SELECT o.event_id, round(arg_max(f.value, f.ts), 4) AS last_val
            FROM events o LEFT JOIN events f
              ON f.user_id = o.user_id AND f.event_type = 'purchase'
             AND epoch_us(f.ts) <= epoch_us(o.ts) - 300000000
             AND epoch_us(f.ts) >  epoch_us(o.ts) - 300000000 - 3600000000
            GROUP BY o.event_id
        """,
        "asof_cogroup": """
            SELECT o.event_id, round(f.value, 4) AS last_purchase_value
            FROM events o ASOF LEFT JOIN (
                SELECT * FROM events WHERE event_type = 'purchase'
            ) f ON o.user_id = f.user_id AND f.ts <= o.ts
        """,
        "asof_fused": """
            SELECT o.event_id, round(arg_max(f.value, f.ts), 4) AS last_val
            FROM events o LEFT JOIN events f
              ON f.user_id = o.user_id AND f.event_type = 'purchase'
             AND epoch_us(f.ts) <= epoch_us(o.ts)
             AND epoch_us(f.ts) >  epoch_us(o.ts) - 3600000000
            GROUP BY o.event_id
        """,
        "full_plan": """
            WITH prof AS (
                SELECT user_id, round(avg(value), 6) AS avg_value_all,
                       count(*) AS n_events_all
                FROM events GROUP BY user_id
            ), swa AS (
                SELECT o.event_id,
                       sum(CASE WHEN epoch_us(f.ts) > epoch_us(o.ts) - 86400000000
                           THEN f.value END) AS v_sum_1d_raw,
                       count(f.value) AS v_cnt_7d
                FROM events o LEFT JOIN events f
                  ON f.user_id = o.user_id
                 AND epoch_us(f.ts) >  epoch_us(o.ts) - 7*86400000000
                 AND epoch_us(f.ts) <= epoch_us(o.ts)
                GROUP BY o.event_id
            ), pl AS (
                SELECT o.event_id,
                       round(arg_max(f.value, f.ts), 4) AS p_latest_7d
                FROM events o LEFT JOIN (
                    SELECT * FROM events WHERE event_type = 'purchase') f
                  ON f.user_id = o.user_id
                 AND epoch_us(f.ts) >  epoch_us(o.ts) - 7*86400000000
                 AND epoch_us(f.ts) <= epoch_us(o.ts)
                GROUP BY o.event_id
            )
            SELECT o.event_id, round(swa.v_sum_1d_raw, 4) AS v_sum_1d,
                   swa.v_cnt_7d, pl.p_latest_7d,
                   p.avg_value_all, p.n_events_all,
                   round(swa.v_sum_1d_raw / (p.avg_value_all + 1), 6) AS sum_over_avg
            FROM events o
            JOIN swa USING (event_id)
            JOIN pl USING (event_id)
            LEFT JOIN prof p ON p.user_id = o.user_id
        """,
        "gen_term_map": f"""
            SELECT user_id, event_type AS term,
                   round(sum(value), 4) AS v_sum
            FROM events
            WHERE epoch_us(ts) > CAST({GEN_CUTOFF} - 3*86400 AS BIGINT) * 1000000
              AND epoch_us(ts) <= CAST({GEN_CUTOFF} AS BIGINT) * 1000000
              AND event_type IS NOT NULL AND value IS NOT NULL
            GROUP BY user_id, event_type
            HAVING sum(value) IS NOT NULL
        """,
        "gen_derived": f"""
            WITH g AS (
                SELECT user_id,
                       sum(value)   AS s,
                       count(value) AS c
                FROM events
                WHERE epoch_us(ts) > CAST({GEN_CUTOFF} - 3*86400 AS BIGINT) * 1000000
                  AND epoch_us(ts) <= CAST({GEN_CUTOFF} AS BIGINT) * 1000000
                GROUP BY user_id
            )
            SELECT user_id,
                   round(s, 4) AS v_sum_3d,
                   c AS v_cnt_3d,
                   round(s / c, 6) AS v_avg_3d,
                   round((s / c) * (s / c), 4) AS v_avg_sq
            FROM g
        """,
        "image_stats": """
            WITH d AS (
                SELECT doc_id,
                       row_number() OVER (ORDER BY doc_id) - 1 AS i
                FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 64)
            )
            SELECT doc_id,
                   CAST(4 + (i % 5) * 3 AS INT) AS width,
                   CAST(3 + (i % 4) * 2 AS INT) AS height,
                   CAST(54 + (3 + (i % 4) * 2)
                           * (((4 + (i % 5) * 3) * 3 + 3) // 4 * 4)
                        AS BIGINT) AS n_bytes
            FROM d
        """,
        "hocon_join": """
            SELECT o.event_id,
                   round(sum(CASE WHEN epoch_us(f.ts) > epoch_us(o.ts) - 3600000000
                             THEN f.value END), 4) AS h_val_sum,
                   count(CASE WHEN epoch_us(f.ts) > epoch_us(o.ts) - 3600000000
                         THEN f.value END) AS h_cnt,
                   count(CASE WHEN f.event_type = 'click' THEN f.value END) AS d_clicks,
                   round(CAST(count(CASE WHEN f.event_type = 'click' THEN f.value END) AS DOUBLE)
                         / CAST(count(CASE WHEN epoch_us(f.ts) > epoch_us(o.ts) - 3600000000
                                      THEN f.value END) AS DOUBLE), 6) AS click_rate
            FROM events o LEFT JOIN events f
              ON f.user_id = o.user_id
             AND epoch_us(f.ts) > epoch_us(o.ts) - 86400000000
             AND epoch_us(f.ts) <= epoch_us(o.ts)
            GROUP BY o.event_id
        """,
        "gen_cutoff": f"""
            SELECT user_id,
                   round(sum(value), 4) AS v_sum_3d,
                   count(value) AS v_cnt_3d,
                   round(max(value), 4) AS v_max_3d,
                   round(arg_max(value, ts), 4) AS v_latest_3d
            FROM events
            WHERE epoch_us(ts) > CAST({GEN_CUTOFF} - 3*86400 AS BIGINT) * 1000000
              AND epoch_us(ts) <= CAST({GEN_CUTOFF} AS BIGINT) * 1000000
            GROUP BY user_id
        """,
        "gen_incremental": f"""
            SELECT user_id,
                   round(sum(value), 4) AS v_sum_3d,
                   count(value) AS v_cnt_3d,
                   round(avg(value), 6) AS v_avg_3d
            FROM events
            WHERE epoch_us(ts) > CAST({GEN_CUTOFF} - 3*86400 AS BIGINT) * 1000000
              AND epoch_us(ts) <= CAST({GEN_CUTOFF} AS BIGINT) * 1000000
            GROUP BY user_id
            HAVING count(value) > 0
        """,
        "rollup_daily": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket_start,
                   round(sum(value), 4) AS v_sum
            FROM events
            GROUP BY 1, 2
        """,
        "word_counts": r"""
            SELECT w AS word, count(*) AS n
            FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM documents)
            WHERE w <> ''
            GROUP BY w
        """,
        "ngram_counts": r"""
            WITH w AS (
                SELECT list_filter(regexp_split_to_array(
                    trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                                        '\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
                FROM documents
            ),
            g AS (
                SELECT unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS ngram
                FROM w WHERE len(ws) >= 2
            )
            SELECT ngram, count(*) AS n FROM g GROUP BY ngram HAVING count(*) >= 3
        """,
        "domain_cap": """
            SELECT doc_id, source, n_chars FROM (
                SELECT doc_id, source, n_chars,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id ASC) AS rk
                FROM documents
            ) WHERE rk <= 10
        """,
        "url_features": """
            WITH u AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END)
                       || '://w' || (doc_id % 5) || '.' || source || '.example.com'
                       || repeat('/p', CAST(doc_id % 4 AS INT))
                       || (CASE WHEN doc_id % 2 = 0 THEN '?a=1&b=2' ELSE '' END)
                       AS url
                FROM documents
            ), parts AS (
                SELECT doc_id,
                       regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
                       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
                       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
                       regexp_extract(url, '\\?([^#]*)$', 1) AS q
                FROM u
            )
            SELECT doc_id, protocol, host,
                   regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
                   CAST(len(list_filter(string_split(path, '/'), x -> x <> ''))
                        AS BIGINT) AS path_depth,
                   CAST(CASE WHEN q = '' THEN 0
                             ELSE len(string_split(q, '&')) END AS BIGINT)
                       AS n_query_params
            FROM parts
        """,
        "line_dedup": """
            WITH boiler AS (
                SELECT doc_id AS b_id, text AS b_text FROM documents WHERE doc_id < 10
            ), multi AS (
                SELECT d.doc_id, d.text || chr(10) || b.b_text AS text
                FROM documents d JOIN boiler b ON d.doc_id % 10 = b.b_id
            ), ex AS (
                SELECT doc_id,
                       unnest(string_split(text, chr(10))) AS line,
                       generate_subscripts(string_split(text, chr(10)), 1) AS pos
                FROM multi
            ), common AS (
                SELECT line FROM ex GROUP BY line HAVING count(DISTINCT doc_id) >= 5
            ), kept AS (
                SELECT * FROM ex WHERE line NOT IN (SELECT line FROM common)
            ), re AS (
                SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
                       count(*) AS n_lines_kept
                FROM kept GROUP BY doc_id
            )
            SELECT m.doc_id, coalesce(re.text_clean, '') AS text_clean,
                   coalesce(re.n_lines_kept, 0) AS n_lines_kept
            FROM multi m LEFT JOIN re ON m.doc_id = re.doc_id
        """,
        "stream_sliding": """
            WITH e AS (
                SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
                FROM events
            ), w AS (
                SELECT user_id, value, t,
                       unnest(range((t // 900) - 3, (t // 900) + 1)) * 900 AS ws
                FROM e
            )
            SELECT user_id, ws AS bucket_start,
                   count(value) AS n, round(sum(value), 4) AS v_sum
            FROM w WHERE t >= ws AND t < ws + 3600
            GROUP BY 1, 2
        """,
        "lm_perplexity": f"""
            WITH {_LM_MODEL_CTES}
            SELECT d.doc_id, d.source,
                   coalesce(s.lm_n, 0) AS lm_n,
                   round(s.lm_logprob, 6) AS lm_logprob,
                   round(exp(-s.lm_logprob / s.lm_n), 4) AS perplexity
            FROM documents d LEFT JOIN lm_scored s USING (doc_id)
        """,
        "lm_ppl_buckets": f"""
            WITH {_LM_MODEL_CTES},
            ppl AS (
                SELECT d.doc_id, d.source,
                       round(exp(-s.lm_logprob / s.lm_n), 4) AS perplexity
                FROM documents d JOIN lm_scored s USING (doc_id)
                WHERE s.lm_n > 0
            )
            SELECT doc_id, source, perplexity,
                   CAST(ntile(3) OVER (PARTITION BY source
                        ORDER BY perplexity ASC, doc_id ASC) AS INTEGER)
                       AS ppl_bucket
            FROM ppl
        """,
        "tokenize_docs": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS token,
                           generate_subscripts(ws, 1) AS pos FROM w),
            cnt AS (SELECT token, count(*) AS n FROM tok
                    GROUP BY token HAVING count(*) >= 2),
            vocab AS (
                SELECT token, row_number() OVER (ORDER BY n DESC, token) AS tid
                FROM cnt ORDER BY n DESC, token LIMIT 500
            ),
            enc AS (
                SELECT t.doc_id, list(coalesce(v.tid, 0) ORDER BY t.pos) AS toks
                FROM tok t LEFT JOIN vocab v USING (token)
                GROUP BY t.doc_id
            )
            SELECT w.doc_id,
                   coalesce(len(e.toks), 0) AS n_tok,
                   coalesce(to_json(e.toks), '[]') AS tokens_json
            FROM w LEFT JOIN enc e USING (doc_id)
        """,
        "token_stats": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS token,
                           generate_subscripts(ws, 1) AS pos FROM w),
            cnt AS (SELECT token, count(*) AS n FROM tok
                    GROUP BY token HAVING count(*) >= 2),
            vocab AS (
                SELECT token, row_number() OVER (ORDER BY n DESC, token) AS tid
                FROM cnt ORDER BY n DESC, token LIMIT 20
            ),
            enc AS (SELECT t.doc_id, coalesce(v.tid, 0) AS tid
                    FROM tok t LEFT JOIN vocab v USING (token)),
            hist AS (SELECT tid, count(*) AS n FROM enc GROUP BY tid),
            lens AS (SELECT d.doc_id, coalesce(l.n_tok, 0) AS n_tok
                     FROM documents d LEFT JOIN
                          (SELECT doc_id, count(*) AS n_tok FROM enc
                           GROUP BY doc_id) l USING (doc_id)),
            g AS (SELECT sum(n) AS total_tokens,
                         count(*) AS distinct_tokens,
                         sum(CASE WHEN tid = 0 THEN n ELSE 0 END) AS oov_tokens
                  FROM hist),
            topk AS (SELECT coalesce(sum(n), 0) AS tn FROM
                     (SELECT n FROM hist ORDER BY n DESC, tid ASC LIMIT 10)),
            l AS (SELECT count(*) AS total_docs, avg(n_tok) AS mean_len,
                         quantile_cont(n_tok, 0.5) AS p50_len,
                         quantile_cont(n_tok, 0.9) AS p90_len,
                         max(n_tok) AS max_len FROM lens)
            -- ::BIGINT on every integer output: DuckDB sum() yields
            -- HUGEINT, which pandas renders float64 and breaks the
            -- driver's dtype-sensitive value hash vs Spark's long
            SELECT l.total_docs::BIGINT AS total_docs,
                   g.total_tokens::BIGINT AS total_tokens,
                   g.distinct_tokens::BIGINT AS distinct_tokens,
                   g.oov_tokens::BIGINT AS oov_tokens,
                   round(g.oov_tokens * 1.0 / g.total_tokens, 6) AS oov_share,
                   round(topk.tn * 1.0 / g.total_tokens, 6) AS topk_coverage,
                   round(l.mean_len, 6) AS mean_len,
                   round(l.p50_len, 4) AS p50_len,
                   round(l.p90_len, 4) AS p90_len,
                   l.max_len::BIGINT AS max_len
            FROM g, topk, l
        """,
        "token_histogram": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
            cnt AS (SELECT token, count(*) AS n FROM tok
                    GROUP BY token HAVING count(*) >= 2),
            vocab AS (
                SELECT token, row_number() OVER (ORDER BY n DESC, token) AS tid
                FROM cnt ORDER BY n DESC, token LIMIT 20
            ),
            enc AS (SELECT coalesce(v.tid, 0) AS tid
                    FROM tok t LEFT JOIN vocab v USING (token)),
            hist AS (SELECT tid, count(*) AS n FROM enc GROUP BY tid)
            SELECT tid AS token_id, n,
                   round(n * 1.0 / (SELECT sum(n) FROM hist), 6) AS share
            FROM hist
        """,
        "detokenize": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS token,
                           generate_subscripts(ws, 1) AS pos FROM w),
            cnt AS (SELECT token, count(*) AS n FROM tok
                    GROUP BY token HAVING count(*) >= 2),
            vocab AS (
                SELECT token, row_number() OVER (ORDER BY n DESC, token) AS tid
                FROM cnt ORDER BY n DESC, token LIMIT 20
            ),
            dec AS (
                SELECT t.doc_id,
                       string_agg(CASE WHEN v.tid IS NULL THEN '<unk>'
                                       ELSE t.token END, ' '
                                  ORDER BY t.pos) AS text
                FROM tok t LEFT JOIN vocab v USING (token)
                GROUP BY t.doc_id
            )
            SELECT d.doc_id, coalesce(dec.text, '') AS text
            FROM documents d LEFT JOIN dec USING (doc_id)
        """,
        "client_flow": """
            SELECT event_id, round(s, 4) AS sum_1h, c AS cnt_1h,
                   round(s / greatest(c, 1), 6) AS ratio
            FROM (
                SELECT o.event_id, sum(f.value) AS s, count(f.value) AS c
                FROM events o LEFT JOIN events f
                  ON f.user_id = o.user_id
                 AND epoch_us(f.ts) >  epoch_us(o.ts) - 3600000000
                 AND epoch_us(f.ts) <= epoch_us(o.ts)
                GROUP BY o.event_id
            )
        """,
        "stream_asof": """
            SELECT o.event_id, round(f.value, 4) AS last_purchase_value
            FROM events o ASOF LEFT JOIN (
                SELECT * FROM events WHERE event_type = 'purchase'
            ) f ON o.user_id = f.user_id AND f.ts <= o.ts
        """,
        "stream_running": """
            WITH e AS (
                SELECT CAST(user_id AS VARCHAR) AS entity, epoch(ts) AS uts, value
                FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
            ), g AS (
                SELECT entity, count(*) AS n_events,
                       round(sum(value), 4) AS value_sum,
                       max(uts) AS latest_ts
                FROM e GROUP BY entity
            )
            SELECT g.entity, g.n_events, g.value_sum, g.latest_ts,
                   max(e.value) AS latest_value
            FROM g JOIN e ON e.entity = g.entity AND e.uts = g.latest_ts
            GROUP BY 1, 2, 3, 4
        """,
        "ann_recall_bounds": """
            SELECT algo, CAST(query_id AS BIGINT) AS query_id, recall_ok
            FROM (VALUES
                ('lsh', 0, TRUE), ('lsh', 1, TRUE), ('lsh', 2, TRUE),
                ('lsh', 3, TRUE), ('lsh', 4, TRUE),
                ('ivf', 0, TRUE), ('ivf', 1, TRUE), ('ivf', 2, TRUE),
                ('ivf', 3, TRUE), ('ivf', 4, TRUE)
            ) AS t(algo, query_id, recall_ok)
        """,
        "stream_hourly": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_start,
                   count(value) AS n,
                   round(sum(value), 4) AS v_sum
            FROM events
            GROUP BY 1, 2
        """,
        "lang_id": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS words
                FROM documents
            ), s AS (
                SELECT doc_id,
                       len(list_filter(words, x -> x IN ('the','and','of','to','in','is','that','for','with','are'))) * 1.0 / greatest(len(words), 1) AS s_en,
                       len(list_filter(words, x -> x IN ('der','die','das','und','ist','von','mit','den','nicht','ein'))) * 1.0 / greatest(len(words), 1) AS s_de,
                       len(list_filter(words, x -> x IN ('le','la','les','et','des','est','dans','que','pour','une'))) * 1.0 / greatest(len(words), 1) AS s_fr,
                       len(list_filter(words, x -> x IN ('el','la','los','que','de','en','es','por','con','para'))) * 1.0 / greatest(len(words), 1) AS s_es
                FROM w
            )
            SELECT doc_id,
                   CASE WHEN greatest(s_en, s_de, s_fr, s_es) < 0.01 THEN 'und'
                        -- tie-break = lexicographically largest code, matching
                        -- Spark's max over struct(score, code)
                        WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                        WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                        WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM s
        """,
        "doc_fingerprint": r"""
            SELECT min(doc_id) AS keep_id, count(*) AS n_docs
            FROM documents
            GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                                         '\s+', ' ', 'g'))
        """,
        "near_dup_embeddings": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_dot_product(a.v, b.v)
                       / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                          * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS c
                FROM e a JOIN e b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(c, 5) AS cosine FROM p WHERE c >= 0.42
        """,
        "semantic_dedup": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
            p AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM e a JOIN e b ON a.vec_id < b.vec_id
                WHERE list_dot_product(a.v, b.v)
                      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.42
            )
            SELECT vec_id, label FROM e
            WHERE vec_id NOT IN (SELECT id_b FROM p)
        """,
        "rollup_distinct_daily": """
            SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket_start,
                   count(DISTINCT user_id) AS n_distinct
            FROM events
            GROUP BY 1
        """,
        "swa_lateral": """
            WITH e AS (
                SELECT vec_id % 50 AS k, 1700000000 + vec_id * 60 AS ts, vec_id, embedding
                FROM embeddings
            ), x AS (
                SELECT k, ts, unnest(embedding)::DOUBLE AS elem FROM e
            )
            SELECT o.vec_id, round(sum(x.elem), 4) AS elem_sum_2h,
                   count(x.elem) AS elem_cnt_2h
            FROM e o LEFT JOIN x ON x.k = o.k
             AND x.ts > o.ts - 7200 AND x.ts <= o.ts
            GROUP BY o.vec_id
        """,
        "feature_stats": """
            SELECT 'value' AS feature, count(*) AS n_rows,
                   count(*) - count(value) AS n_null,
                   round(avg(value), 4) AS mean, round(stddev_samp(value), 4) AS stddev,
                   round(min(value), 4) AS min, round(max(value), 4) AS max
            FROM events
            UNION ALL
            SELECT 'user_id', count(*), count(*) - count(user_id),
                   round(avg(user_id), 4), round(stddev_samp(user_id), 4),
                   round(min(user_id), 4), round(max(user_id), 4)
            FROM events
        """,
        "swa_slick": _SWA_BASIC_ORACLE,
        "swa_custom_agg": f"""
            SELECT o.event_id,
                   round(max(f.value) - min(f.value), 4) AS vrange
            FROM events o LEFT JOIN events f ON {win_1d}
            GROUP BY o.event_id
        """,
        "quantize_embeddings": """
            WITH s AS (
                SELECT vec_id, embedding,
                       list_max(list_transform(embedding,
                                x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                FROM embeddings
            ), ex AS (
                SELECT vec_id, scale, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
                FROM s CROSS JOIN range(1, 65) r(i)
            )
            SELECT vec_id, CAST(pos AS BIGINT) AS pos,
                   CAST(CASE WHEN scale = 0 OR scale IS NULL THEN 0
                        ELSE greatest(-127, least(127, floor(v / scale + 0.5))) END
                        AS INTEGER) AS q,
                   round(coalesce(scale, 0), 6) AS q8_scale
            FROM ex
        """,
        "repetition_features": r"""
            WITH l AS (
                SELECT doc_id,
                       list_filter(string_split(text, chr(10)),
                                   x -> trim(x) <> '') AS lines
                FROM documents
            ), wds AS (
                SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
                                           x -> x <> '') AS words
                FROM documents
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(words), 1)),
                                             i -> words[i] || ' ' || words[i+1])) AS b
                FROM wds
            ), cnt AS (
                SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
            ), top AS (
                SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS tbf
                FROM cnt GROUP BY doc_id
            )
            SELECT l.doc_id,
                   round(CASE WHEN len(lines) = 0 THEN 0.0
                         ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
                                    / len(lines) END, 6) AS dup_line_frac,
                   round(coalesce(top.tbf, 0.0), 6) AS top_bigram_frac
            FROM l LEFT JOIN top ON top.doc_id = l.doc_id
        """,
        # ann_ivf: rows-only (centroid fit is sample/seed-dependent);
        # exact parity via knn_bruteforce, recall asserted in pytest
        "dup_spans": r"""
            WITH w AS (
              SELECT doc_id, list_filter(regexp_split_to_array(
                  trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                                      '\s+', ' ', 'g')),
                  '\s+'), x -> x <> '') AS words
              FROM documents
            ), wins AS (
              SELECT doc_id, i - 1 AS pos, array_to_string(words[i:i+9], ' ') AS win
              FROM w, UNNEST(range(1, greatest(len(words) - 9, 0) + 1)) AS t(i)
            ), duph AS (
              SELECT win FROM (
                SELECT win, count(DISTINCT doc_id) AS nd FROM wins GROUP BY win
              ) WHERE nd >= 2
            ), occ AS (
              SELECT wins.doc_id, wins.pos FROM wins JOIN duph USING (win)
            ), occagg AS (
              SELECT doc_id, count(*) AS ndup FROM occ GROUP BY doc_id
            ), cov AS (
              SELECT doc_id, count(DISTINCT j) AS ncov
              FROM occ, UNNEST(range(pos, pos + 10)) AS u(j) GROUP BY doc_id
            )
            SELECT w.doc_id,
                   CAST(len(words) AS BIGINT) AS n_words,
                   CAST(greatest(len(words) - 9, 0) AS BIGINT) AS n_windows,
                   CAST(coalesce(ndup, 0) AS BIGINT) AS n_dup_windows,
                   CAST(len(words) - coalesce(ncov, 0) AS BIGINT) AS clean_n_words
            FROM w LEFT JOIN occagg USING (doc_id) LEFT JOIN cov USING (doc_id)
        """,
        "incremental_dedup": f"""
            WITH RECURSIVE {_SHINGLE_JACCARD_CTE},
            nd AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
            nn(ia, ib) AS (
                SELECT id_a, id_b FROM jp
                WHERE j >= 0.7 AND id_a % 2 = 1 AND id_b % 2 = 1
                UNION ALL
                SELECT id_b, id_a FROM jp
                WHERE j >= 0.7 AND id_a % 2 = 1 AND id_b % 2 = 1
            ),
            crossed AS (
                SELECT DISTINCT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS id
                FROM jp WHERE j >= 0.7 AND (id_a % 2) <> (id_b % 2)
            ),
            reach(src, dst) AS (
                SELECT doc_id, doc_id FROM nd
                UNION
                SELECT r.src, e.ib FROM reach r JOIN nn e ON e.ia = r.dst
            ),
            comp AS (
                SELECT src AS doc_id, min(dst) AS cluster_rep
                FROM reach GROUP BY src
            ),
            anch AS (
                SELECT DISTINCT c2.cluster_rep
                FROM comp c2 JOIN crossed x ON x.id = c2.doc_id
            )
            SELECT c.doc_id, c.cluster_rep,
                   CAST(a.cluster_rep IS NOT NULL AS INT) AS dup_of_corpus,
                   CAST((a.cluster_rep IS NULL AND c.doc_id = c.cluster_rep)
                        AS INT) AS keep
            FROM comp c LEFT JOIN anch a ON a.cluster_rep = c.cluster_rep
        """,
        "minhash_pairs": _JACCARD_PAIRS_ORACLE,
        # token-space twin: with an injective vocab, token-trigram
        # Jaccard == word-trigram Jaccard — same oracle, every pair and
        # value must match exactly
        "token_dedup_pairs": _JACCARD_PAIRS_ORACLE,
        "gopher_rules": f"""
            WITH {_GOPHER_CTES}
            SELECT doc_id,
                   (nw >= 25 AND nw <= 100000)::INT AS r_word_count,
                   (mwl >= 3.0 AND mwl <= 10.0)::INT AS r_mean_word_len,
                   (n_sym / nw1 <= 0.1)::INT AS r_symbol_ratio,
                   (bullet_frac <= 0.9)::INT AS r_bullet_lines,
                   (ell_frac <= 0.3)::INT AS r_ellipsis_lines,
                   (alpha_frac >= 0.8)::INT AS r_alpha_words,
                   (stop_hits >= 1)::INT AS r_stopwords,
                   {_GOPHER_PASS}::INT AS gopher_pass
            FROM m
        """,
        # end-to-end curation funnel: gopher gate -> exact dedup (keep
        # min id per normalized text) -> per-source cap (id-ascending)
        "curate_funnel": f"""
            WITH {_GOPHER_CTES},
            pass AS (
                SELECT d.doc_id, d.source, d.text
                FROM documents d JOIN m ON m.doc_id = d.doc_id
                WHERE {_GOPHER_PASS}
            ), norm AS (
                SELECT doc_id, source,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g')) AS nt
                FROM pass
            ), keep AS (
                SELECT doc_id, source FROM (
                    SELECT doc_id, source,
                           row_number() OVER (PARTITION BY nt
                                              ORDER BY doc_id) AS rn
                    FROM norm) t WHERE rn = 1
            )
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY doc_id) AS rn
                FROM keep) t WHERE rn <= 30
        """,
        "html_extract": r"""
            WITH raw AS (
                SELECT doc_id,
                       '<html><head><title> Doc &amp; ' || doc_id
                       || ' </title>'
                       || '<style type="text/css">p {color:red}</style>'
                       || '<script type="text/javascript">var x = "<p>ignored</p>";</script></head>'
                       || '<body><!-- nav' || chr(10)
                       || 'boilerplate --><h1>Heading ' || doc_id
                       || '</h1><p>'
                       || replace(text, ' data ', ' data</p><p>')
                       || '</p><a href="/home">home link</a>'
                       || CASE WHEN doc_id % 3 = 0
                          THEN '<br/><div class="x">extra &lt;tag&gt; &quot;q&quot;&nbsp;here</div><a name="z">second</a>'
                          ELSE '' END
                       || '</body></html>' AS html
                FROM documents
            ), stripped AS (
                SELECT doc_id, html,
                       regexp_replace(regexp_replace(regexp_replace(html,
                           '(?is)<script\b[^>]*>.*?</script\s*>', '', 'g'),
                           '(?is)<style\b[^>]*>.*?</style\s*>', '', 'g'),
                           '(?s)<!--.*?-->', '', 'g') AS s
                FROM raw
            ), body AS (
                SELECT doc_id, html, s,
                       regexp_replace(regexp_replace(
                           regexp_replace(s,
                               '(?is)<head\b[^>]*>.*?</head\s*>', '', 'g'),
                           '(?is)</?(?:p|div|li|ul|ol|table|tr|td|th|h[1-6]|blockquote|section|article|header|footer|br|hr)\b[^>]*>',
                           chr(10), 'g'),
                           '(?s)<[^>]*>', ' ', 'g') AS b,
                       regexp_extract(html,
                           '(?is)<title\b[^>]*>([^<]*)</title\s*>', 1) AS t0
                FROM stripped
            ), ent AS (
                SELECT doc_id, html, s,
                       replace(replace(replace(replace(replace(replace(replace(
                           b, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                           '&quot;', '"'), '&#39;', ''''), '&apos;', ''''),
                           '&amp;', '&') AS e,
                       replace(replace(replace(replace(replace(replace(replace(
                           t0, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                           '&quot;', '"'), '&#39;', ''''), '&apos;', ''''),
                           '&amp;', '&') AS te
                FROM body
            ), norm AS (
                SELECT doc_id, html, s,
                       regexp_replace(regexp_replace(regexp_replace(
                           regexp_replace(e, '[ \t\r]+', ' ', 'g'),
                           ' ?\n ?', chr(10), 'g'),
                           '\n{3,}', chr(10) || chr(10), 'g'),
                           '(?s)^\s+|\s+$', '', 'g') AS text,
                       regexp_replace(regexp_replace(regexp_replace(
                           regexp_replace(te, '[ \t\r]+', ' ', 'g'),
                           ' ?\n ?', chr(10), 'g'),
                           '\n{3,}', chr(10) || chr(10), 'g'),
                           '(?s)^\s+|\s+$', '', 'g') AS title
                FROM ent
            )
            SELECT doc_id, title, text AS extracted_text,
                   length(text)::BIGINT AS n_clean_chars,
                   len(regexp_extract_all(s, '(?is)<a\b[^>]*>'))::INT
                       AS n_links,
                   len(regexp_extract_all(s, '(?s)<[^>]*>'))::INT AS n_tags,
                   length(text)::DOUBLE / length(html) AS text_html_ratio
            FROM norm
        """,
        "c4_rules": r"""
            WITH staged AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN base ||
                                ' and value { appears here with words.'
                            ELSE base END AS text
                FROM (
                    SELECT doc_id,
                           CASE WHEN doc_id % 5 = 0 THEN t ||
                                    ' lorem ipsum sits right here today.'
                                ELSE t END AS base
                    FROM (
                        SELECT doc_id,
                               replace(text, ' data ',
                                       '.' || chr(10) || 'data ') || '.'
                                   AS t
                        FROM documents))
            ), cleaned AS (
                SELECT doc_id,
                       array_to_string(list_filter(
                           regexp_split_to_array(text, '\n'),
                           l -> regexp_matches(l, '[.!?"]\s*$')
                                AND len(list_filter(
                                    regexp_split_to_array(l, '\s+'),
                                    w -> w <> '')) >= 5
                                AND NOT contains(lower(l), 'javascript')
                       ), chr(10)) AS clean
                FROM staged
            ), m AS (
                SELECT doc_id, clean,
                       length(clean)
                       - length(regexp_replace(clean, '[.!?]', '', 'g'))
                           AS n_sent,
                       contains(lower(clean), 'lorem ipsum') AS has_lorem,
                       contains(clean, '{') AS has_brace
                FROM cleaned
            )
            SELECT doc_id,
                   length(clean)::BIGINT AS n_clean_chars,
                   (n_sent >= 2)::INT AS r_min_sentences,
                   (NOT has_lorem)::INT AS r_no_lorem,
                   (NOT has_brace)::INT AS r_no_brace,
                   1 AS r_blocklist,
                   ((n_sent >= 2) AND NOT has_lorem
                    AND NOT has_brace)::INT AS c4_pass
            FROM m
        """,
        "gopher_repetition": r"""
            WITH staged AS (
                SELECT doc_id,
                       replace(replace(text, ' data ', chr(10) || 'data '),
                               ' the ', chr(10) || chr(10) || 'the ')
                           AS text
                FROM documents
            ), seg AS (
                SELECT doc_id, text,
                       list_filter(list_transform(
                           regexp_split_to_array(text, '\n'),
                           s -> trim(s)), s -> s <> '') AS ls,
                       list_filter(list_transform(
                           regexp_split_to_array(text, '\n{2}'),
                           s -> trim(s)), s -> s <> '') AS ps
                FROM staged
            ), segstats AS (
                SELECT doc_id,
                       CASE WHEN len(ls) > 0 THEN
                           1.0 - len(list_distinct(ls)) / len(ls)::DOUBLE
                       ELSE 0.0 END AS dup_line_frac,
                       CASE WHEN coalesce(list_aggregate(list_transform(
                                ls, s -> length(s)), 'sum'), 0) > 0 THEN
                           coalesce(list_aggregate(list_transform(
                               list_distinct(ls),
                               d -> (len(list_filter(ls, x -> x = d)) - 1)
                                    * length(d)), 'sum'), 0)
                           / coalesce(list_aggregate(list_transform(
                               ls, s -> length(s)), 'sum'), 0)::DOUBLE
                       ELSE 0.0 END AS dup_line_char_frac,
                       CASE WHEN len(ps) > 0 THEN
                           1.0 - len(list_distinct(ps)) / len(ps)::DOUBLE
                       ELSE 0.0 END AS dup_para_frac,
                       CASE WHEN coalesce(list_aggregate(list_transform(
                                ps, s -> length(s)), 'sum'), 0) > 0 THEN
                           coalesce(list_aggregate(list_transform(
                               list_distinct(ps),
                               d -> (len(list_filter(ps, x -> x = d)) - 1)
                                    * length(d)), 'sum'), 0)
                           / coalesce(list_aggregate(list_transform(
                               ps, s -> length(s)), 'sum'), 0)::DOUBLE
                       ELSE 0.0 END AS dup_para_char_frac
                FROM seg
            ), w AS (
                SELECT doc_id,
                       list_filter(string_split(trim(regexp_replace(
                           regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                           '\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
                FROM staged
            ), wtc AS (
                SELECT doc_id, ws,
                       coalesce(list_aggregate(list_transform(
                           ws, x -> length(x)), 'sum'), 0) AS tc
                FROM w
            ), g2 AS (
                SELECT doc_id,
                       array_to_string(ws[i:i+1], ' ') AS ng,
                       list_aggregate(list_transform(ws[i:i+1],
                           x -> length(x)), 'sum') AS cl
                FROM wtc, unnest(range(1, len(ws))) AS t(i)
                WHERE len(ws) >= 2
            ), top2 AS (
                SELECT doc_id, c * cl AS chars FROM (
                    SELECT doc_id, cl, count(*) AS c,
                           row_number() OVER (PARTITION BY doc_id
                               ORDER BY count(*) DESC, cl DESC) AS rn
                    FROM g2 GROUP BY doc_id, ng, cl)
                WHERE rn = 1
            ), g3 AS (
                SELECT doc_id,
                       array_to_string(ws[i:i+2], ' ') AS ng,
                       list_aggregate(list_transform(ws[i:i+2],
                           x -> length(x)), 'sum') AS cl
                FROM wtc, unnest(range(1, len(ws) - 1)) AS t(i)
                WHERE len(ws) >= 3
            ), top3 AS (
                SELECT doc_id, c * cl AS chars FROM (
                    SELECT doc_id, cl, count(*) AS c,
                           row_number() OVER (PARTITION BY doc_id
                               ORDER BY count(*) DESC, cl DESC) AS rn
                    FROM g3 GROUP BY doc_id, ng, cl)
                WHERE rn = 1
            ), g5 AS (
                SELECT doc_id, i,
                       array_to_string(ws[i:i+4], ' ') AS ng
                FROM wtc, unnest(range(1, len(ws) - 3)) AS t(i)
                WHERE len(ws) >= 5
            ), d5 AS (
                SELECT doc_id, ng FROM g5
                GROUP BY doc_id, ng HAVING count(*) > 1
            ), cov AS (
                SELECT DISTINCT g.doc_id, j
                FROM g5 g JOIN d5 USING (doc_id, ng),
                     unnest(range(g.i, g.i + 5)) AS c(j)
            ), covchars AS (
                SELECT cov.doc_id,
                       sum(length(list_extract(wtc.ws, j))) AS ch
                FROM cov JOIN wtc USING (doc_id)
                GROUP BY cov.doc_id
            )
            SELECT s.doc_id, s.dup_line_frac, s.dup_line_char_frac,
                   s.dup_para_frac, s.dup_para_char_frac,
                   CASE WHEN wtc.tc > 0 AND top2.chars IS NOT NULL
                        THEN top2.chars / wtc.tc::DOUBLE ELSE 0.0 END
                       AS top_2gram_char_frac,
                   CASE WHEN wtc.tc > 0 AND top3.chars IS NOT NULL
                        THEN top3.chars / wtc.tc::DOUBLE ELSE 0.0 END
                       AS top_3gram_char_frac,
                   CASE WHEN wtc.tc > 0 AND covchars.ch IS NOT NULL
                        THEN covchars.ch / wtc.tc::DOUBLE ELSE 0.0 END
                       AS dup_5gram_char_frac
            FROM segstats s
            JOIN wtc USING (doc_id)
            LEFT JOIN top2 USING (doc_id)
            LEFT JOIN top3 USING (doc_id)
            LEFT JOIN covchars USING (doc_id)
        """,
        "select_by_budget": r"""
            WITH t AS (
                SELECT doc_id, source,
                       len(list_filter(regexp_split_to_array(text, '\s+'),
                                       w -> w <> ''))::BIGINT AS n_tokens,
                       n_chars::DOUBLE AS score
                FROM documents
            ), c AS (
                SELECT *, coalesce(sum(n_tokens) OVER (
                           PARTITION BY source
                           ORDER BY score DESC, doc_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS cb
                FROM t
            )
            SELECT doc_id, source, n_tokens FROM c WHERE cb < 800
        """,
        "pii_cards": r"""
            WITH staged AS (
                SELECT doc_id,
                       text || ' card 4539 5787 6362 1486 ok'
                       || CASE WHEN doc_id % 2 = 0
                          THEN ' bad 4539-5787-6362-1487 end' ELSE '' END
                           AS text
                FROM documents
            ), spans AS (
                SELECT doc_id, text,
                       list_transform(
                           regexp_extract_all(text,
                               '(\b[0-9](?:[ -]?[0-9]){11,17}[0-9]\b)'),
                           s -> regexp_replace(s, '[ -]', '', 'g')) AS ds
                FROM staged
            ), judged AS (
                SELECT doc_id, text, ds,
                       list_transform(ds, s ->
                           CASE WHEN length(s) BETWEEN 13 AND 19 AND
                               list_sum(list_transform(
                                   range(1, length(s) + 1),
                                   i -> CASE WHEN (length(s) - i) % 2 = 1
                                        THEN CASE WHEN 2 * substring(s, i, 1)::INT > 9
                                             THEN 2 * substring(s, i, 1)::INT - 9
                                             ELSE 2 * substring(s, i, 1)::INT END
                                        ELSE substring(s, i, 1)::INT END))
                               % 10 = 0
                           THEN 1 ELSE 0 END) AS ok
                FROM spans
            )
            SELECT doc_id,
                   len(ds)::INT AS n_cards_shaped,
                   list_sum(ok)::INT AS n_cards_valid,
                   length(regexp_replace(text,
                       '\b[0-9](?:[ -]?[0-9]){11,17}[0-9]\b', '<CARD>',
                       'g'))::BIGINT AS n_redacted_chars
            FROM judged
        """,
        "corpus_datacard": r"""
            WITH w AS (
                SELECT trim(regexp_replace(regexp_replace(lower(text),
                           '[^\w\s]', '', 'g'), '\s+', ' ', 'g')) AS norm,
                       source
                FROM documents
            ), wc AS (
                SELECT len(list_filter(regexp_split_to_array(norm, '\s+'),
                           x -> x <> '')) AS c, norm, source
                FROM w
            ), g AS (
                SELECT count(*)::DOUBLE AS n,
                       sum(c)::DOUBLE AS tw,
                       avg(c) AS mw,
                       quantile_cont(c, 0.5) AS p50,
                       quantile_cont(c, 0.9) AS p90,
                       max(c)::DOUBLE AS mx,
                       count(DISTINCT norm)::DOUBLE AS nd
                FROM wc
            ), m AS (
                SELECT 'n_docs' AS metric, n AS value FROM g
                UNION ALL SELECT 'total_words', tw FROM g
                UNION ALL SELECT 'mean_words', mw FROM g
                UNION ALL SELECT 'p50_words', p50 FROM g
                UNION ALL SELECT 'p90_words', p90 FROM g
                UNION ALL SELECT 'max_words', mx FROM g
                UNION ALL SELECT 'exact_dup_rate', 1.0 - nd / n FROM g
                UNION ALL
                SELECT 'share:' || source, count(*) / (SELECT n FROM g)
                FROM wc GROUP BY source
            )
            SELECT metric, round(value, 6) AS value FROM m
        """,
        "quality_lottery": r"""
            WITH h AS (
                SELECT doc_id,
                       ((doc_id * 1103515245 + 12345) % 2147483648) AS hv,
                       (doc_id % 97) / 96.0 AS score
                FROM documents
            ), d AS (
                SELECT doc_id, score,
                       pow((hv + 0.5) / 2147483648.0, -1.0 / 9.0) - 1.0
                           AS draw
                FROM h
            )
            SELECT doc_id,
                   round(score, 6) AS score,
                   round(draw, 6) AS pareto_draw,
                   (draw > 1.0 - score)::INT AS lottery_keep
            FROM d
        """,
        "shard_write": r"""
            WITH h AS (
                SELECT doc_id, ((doc_id * 1103515245 + 12345) % 2147483648)
                               AS hv
                FROM documents
            )
            SELECT (hv % 8)::INT AS shard,
                   count(*)::BIGINT AS disk_rows,
                   count(*)::BIGINT AS manifest_rows,
                   (count(*) - 1)::BIGINT AS max_pos,
                   (CASE WHEN hv % 8 = 0 THEN 1 ELSE 0 END)::INT
                       AS rewritten
            FROM h GROUP BY hv % 8
        """,
        "shard_shuffle": r"""
            WITH h AS (
                SELECT doc_id, ((doc_id * 1103515245 + 12345) % 2147483648)
                               AS hv
                FROM documents
            )
            SELECT doc_id, (hv % 8)::INT AS shard,
                   (row_number() OVER (PARTITION BY hv % 8
                                       ORDER BY hv, doc_id) - 1)::BIGINT AS pos
            FROM h
        """,
        "token_dup_groups": r"""
            WITH with_dups AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents
                WHERE doc_id % 10 = 0
            ),
            n AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^\w\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
                FROM with_dups
            )
            SELECT min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_dups
            FROM n GROUP BY norm HAVING count(*) > 1
        """,
        "simhash_pairs": _JACCARD_PAIRS_ORACLE,
        "minhash_clusters": f"""
            WITH RECURSIVE {_SHINGLE_JACCARD_CTE},
            edges(ia, ib) AS (
                SELECT id_a, id_b FROM jp WHERE j >= 0.7
                UNION ALL
                SELECT id_b, id_a FROM jp WHERE j >= 0.7
            ),
            reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.src, e.ib FROM reach r JOIN edges e ON e.ia = r.dst
            )
            SELECT src AS doc_id, min(dst) AS cluster_rep FROM reach GROUP BY src
        """,
        # ann_lsh: rows-only (approximate recall is seed/probe-dependent,
        # not SQL-expressible; exact-top-k parity is covered by
        # knn_bruteforce's green oracle)
        "contamination_check": _CONTAMINATION_ORACLE,
        # token 3-grams over an injective vocabulary == word 3-grams
        # over normalized text: the token-space decontamination must
        # reproduce the word-space oracle row-for-row
        "token_contamination": _CONTAMINATION_ORACLE,
        "pack_sequences": r"""
            WITH t AS (
                SELECT doc_id, source,
                       len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                       w -> w <> ''))::BIGINT AS ntok
                FROM documents
            ), c AS (
                SELECT doc_id, source, ntok,
                       sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING)::BIGINT AS e
                FROM t WHERE ntok > 0
            )
            SELECT source, u.seq_id::BIGINT AS seq_id, doc_id,
                   greatest(e - ntok - u.seq_id * 128, 0)::BIGINT AS seq_off,
                   (least(e, (u.seq_id + 1) * 128)
                    - greatest(e - ntok, u.seq_id * 128))::BIGINT AS n_tok_in_seq
            FROM c, unnest(generate_series((e - ntok) // 128, (e - 1) // 128)) AS u(seq_id)
        """,
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE ((doc_id * 1103515245 + 12345) % 2147483648) % 1000000 <
                  CASE source WHEN 'src0' THEN 700000
                              WHEN 'src1' THEN 200000
                              WHEN 'src2' THEN 50000
                              ELSE 400000 END
        """,
        "pii_redact": r"""
            WITH inj AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id || '@example.com or 10.0.'
                            || (doc_id % 256) || '.77 tel +1 555 01'
                            || (doc_id % 100) AS t
                FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS n_emails,
                   len(regexp_extract_all(t,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
                   len(regexp_extract_all(
                       regexp_replace(regexp_replace(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', ' ', 'g'),
                           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', ' ', 'g'),
                       '\+[0-9][0-9 -]{6,}[0-9]')) AS n_phones,
                   regexp_replace(regexp_replace(regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                       '\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS clean_text
            FROM inj
        """,
        "feature_drift": """
            WITH rng AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
            b AS (
                SELECT least(9, floor((value - rng.mn)
                                      / ((rng.mx - rng.mn) / 10))::INT) AS bin,
                       (ts >= TIMESTAMP '2024-01-16') AS cur
                FROM events, rng WHERE value IS NOT NULL
            ),
            cells AS (
                SELECT bin,
                       sum(CASE WHEN cur THEN 0 ELSE 1 END) AS n_ref,
                       sum(CASE WHEN cur THEN 1 ELSE 0 END) AS n_cur
                FROM b GROUP BY bin
            ),
            tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM cells),
            terms AS (
                SELECT ((n_cur + 0.5) / (t_cur + 0.5 * 10)) AS p_cur,
                       ((n_ref + 0.5) / (t_ref + 0.5 * 10)) AS p_ref
                FROM cells, tot
            )
            SELECT 'value' AS feature,
                   round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi,
                   round(sum(p_cur * ln(p_cur / p_ref)), 6) AS kl,
                   -- ::BIGINT: uncast sum() is HUGEINT -> pandas float64,
                   -- which breaks the driver hash vs Spark's long
                   (SELECT t_ref FROM tot)::BIGINT AS n_ref,
                   (SELECT t_cur FROM tot)::BIGINT AS n_cur
            FROM terms
        """,
        "category_drift": """
            WITH cells AS (
                SELECT event_type AS bin,
                       sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                                THEN 0 ELSE 1 END) AS n_ref,
                       sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                                THEN 1 ELSE 0 END) AS n_cur
                FROM events WHERE event_type IS NOT NULL GROUP BY event_type
            ),
            tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur,
                           count(*) AS cells FROM cells),
            terms AS (
                SELECT ((n_cur + 0.5) / (t_cur + 0.5 * cells)) AS p_cur,
                       ((n_ref + 0.5) / (t_ref + 0.5 * cells)) AS p_ref
                FROM cells, tot
            )
            SELECT 'event_type' AS feature,
                   round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi,
                   round(sum(p_cur * ln(p_cur / p_ref)), 6) AS kl,
                   -- ::BIGINT: uncast sum() is HUGEINT -> pandas float64,
                   -- which breaks the driver hash vs Spark's long
                   (SELECT t_ref FROM tot)::BIGINT AS n_ref,
                   (SELECT t_cur FROM tot)::BIGINT AS n_cur
            FROM terms
        """,
        "temperature_mixture": r"""
            WITH t AS (
                SELECT source, count(*)::BIGINT AS n_docs,
                       sum(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                           w -> w <> '')))::BIGINT AS n_tokens
                FROM documents GROUP BY source
            ),
            s AS (
                SELECT source, n_docs, n_tokens,
                       n_tokens::DOUBLE / sum(n_tokens) OVER () AS share
                FROM t
            )
            SELECT source, n_docs, n_tokens,
                   round(share, 6) AS share,
                   round(pow(share, 0.7) / sum(pow(share, 0.7)) OVER (), 6)
                       AS p_target,
                   round(pow(share, 0.7) / sum(pow(share, 0.7)) OVER () / share,
                         6) AS weight
            FROM s
        """,
        "bpe_train": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tokw AS (SELECT unnest(ws) AS word FROM w),
            wc AS (SELECT word, count(*) AS cnt FROM tokw
                   GROUP BY word HAVING count(*) >= 2),
            s0 AS (SELECT word, cnt,
                          '|' || array_to_string(
                              regexp_split_to_array(word, ''), '||') || '|' AS s
                   FROM wc),
            p0 AS (SELECT word, cnt, unnest(toks) AS tok,
                          generate_subscripts(toks, 1) AS pos
                   FROM (SELECT word, cnt,
                                string_split(trim(s, '|'), '||') AS toks
                         FROM s0)),
            pr0 AS (SELECT a.tok AS l, b.tok AS r, sum(a.cnt) AS c
                    FROM p0 a JOIN p0 b
                      ON a.word = b.word AND b.pos = a.pos + 1
                    GROUP BY a.tok, b.tok),
            m1 AS (SELECT l, r FROM pr0 ORDER BY c DESC, l, r LIMIT 1),
            s1 AS (SELECT word, cnt,
                          replace(s, (SELECT '|'||l||'||'||r||'|' FROM m1),
                                     (SELECT '|'||l||r||'|' FROM m1)) AS s
                   FROM s0),
            p1 AS (SELECT word, cnt, unnest(toks) AS tok,
                          generate_subscripts(toks, 1) AS pos
                   FROM (SELECT word, cnt,
                                string_split(trim(s, '|'), '||') AS toks
                         FROM s1)),
            pr1 AS (SELECT a.tok AS l, b.tok AS r, sum(a.cnt) AS c
                    FROM p1 a JOIN p1 b
                      ON a.word = b.word AND b.pos = a.pos + 1
                    GROUP BY a.tok, b.tok),
            m2 AS (SELECT l, r FROM pr1 ORDER BY c DESC, l, r LIMIT 1),
            s2 AS (SELECT word, cnt,
                          replace(s, (SELECT '|'||l||'||'||r||'|' FROM m2),
                                     (SELECT '|'||l||r||'|' FROM m2)) AS s
                   FROM s1),
            p2 AS (SELECT word, cnt, unnest(toks) AS tok,
                          generate_subscripts(toks, 1) AS pos
                   FROM (SELECT word, cnt,
                                string_split(trim(s, '|'), '||') AS toks
                         FROM s2)),
            pr2 AS (SELECT a.tok AS l, b.tok AS r, sum(a.cnt) AS c
                    FROM p2 a JOIN p2 b
                      ON a.word = b.word AND b.pos = a.pos + 1
                    GROUP BY a.tok, b.tok),
            m3 AS (SELECT l, r FROM pr2 ORDER BY c DESC, l, r LIMIT 1)
            SELECT 1 AS rank, l AS "left", r AS "right" FROM m1
            UNION ALL
            SELECT 2 AS rank, l AS "left", r AS "right" FROM m2
            UNION ALL
            SELECT 3 AS rank, l AS "left", r AS "right" FROM m3
        """,
        "bpe_encode_det": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS token,
                           generate_subscripts(ws, 1) AS wpos FROM w),
            enc AS (
                SELECT doc_id, wpos,
                       replace(replace(replace(replace(replace(replace(
                       replace(replace(
                           '|' || array_to_string(
                               regexp_split_to_array(token, ''), '||') || '|',
                           '|t||h|', '|th|'), '|th||e|', '|the|'),
                           '|e||r|', '|er|'), '|o||r|', '|or|'),
                           '|or||d|', '|ord|'), '|s||c|', '|sc|'),
                           '|sc||a|', '|sca|'), '|a||n|', '|an|') AS s
                FROM tok
            ),
            flat AS (
                SELECT doc_id, wpos, unnest(ps) AS piece,
                       generate_subscripts(ps, 1) AS ppos
                FROM (SELECT doc_id, wpos,
                             string_split(trim(s, '|'), '||') AS ps
                      FROM enc)
            ),
            agg AS (SELECT doc_id, list(piece ORDER BY wpos, ppos) AS toks
                    FROM flat GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(to_json(a.toks), '[]') AS pieces_json,
                   coalesce(len(a.toks), 0) AS n_tok
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "chunk_sequences": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS token,
                           generate_subscripts(ws, 1) AS pos FROM w),
            cnt AS (SELECT token, count(*) AS n FROM tok
                    GROUP BY token HAVING count(*) >= 2),
            vocab AS (
                SELECT token, row_number() OVER (ORDER BY n DESC, token) AS tid
                FROM cnt ORDER BY n DESC, token LIMIT 20
            ),
            enc AS (
                SELECT t.doc_id, list(coalesce(v.tid, 0) ORDER BY t.pos) AS toks
                FROM tok t LEFT JOIN vocab v USING (token)
                GROUP BY t.doc_id
            ),
            offs AS (
                SELECT doc_id, toks,
                       unnest(range(0, len(toks), 8)) AS off
                FROM enc WHERE len(toks) > 0
            ),
            chunks AS (
                SELECT doc_id, off // 8 AS chunk_idx,
                       toks[off + 1 : off + 16] AS c
                FROM offs
            )
            SELECT doc_id, chunk_idx, to_json(c) AS tokens_json,
                   len(c) AS n_tok
            FROM chunks WHERE len(c) >= 4
        """,
        "leakage_safe_split": r"""
            WITH norm AS (
                SELECT doc_id, source,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^\w\s]', '', 'g'), '\s+', ' ', 'g')) AS nt
                FROM documents
            ),
            rep AS (
                SELECT doc_id, source,
                       min(doc_id) OVER (PARTITION BY nt) AS r
                FROM norm
            )
            SELECT doc_id, source,
                   CASE WHEN ((r * 1103515245 + 12345) % 2147483648) % 1000000
                             < 800000
                        THEN 'train' ELSE 'val' END AS split
            FROM rep
        """,
        "importance_scores": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
            rawcnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
            tgtcnt AS (
                SELECT t.token, count(*) AS n
                FROM tok t JOIN documents d USING (doc_id)
                WHERE d.source = 'src0' GROUP BY t.token
            ),
            vocab AS (SELECT token FROM rawcnt WHERE n >= 2
                      ORDER BY n DESC, token LIMIT 20),
            cells AS (
                SELECT v.token, coalesce(r.n, 0) AS n_raw,
                       coalesce(t.n, 0) AS n_tgt
                FROM vocab v LEFT JOIN rawcnt r USING (token)
                             LEFT JOIN tgtcnt t USING (token)
            ),
            tots AS (SELECT (SELECT sum(n) FROM rawcnt) AS tot_raw,
                            (SELECT coalesce(sum(n), 0) FROM tgtcnt) AS tot_tgt,
                            (SELECT sum(n_raw) FROM cells) AS in_raw,
                            (SELECT sum(n_tgt) FROM cells) AS in_tgt,
                            (SELECT count(*) + 1 FROM cells) AS n_cells),
            ratios AS (
                SELECT token,
                       ln(((n_tgt + 0.5) / (tot_tgt + 0.5 * n_cells))
                          / ((n_raw + 0.5) / (tot_raw + 0.5 * n_cells))) AS r
                FROM cells, tots
            ),
            oov AS (
                SELECT ln(((tot_tgt - in_tgt + 0.5) / (tot_tgt + 0.5 * n_cells))
                          / ((tot_raw - in_raw + 0.5)
                             / (tot_raw + 0.5 * n_cells))) AS r
                FROM tots
            ),
            scores AS (
                SELECT t.doc_id,
                       sum(coalesce(rt.r, (SELECT r FROM oov))) AS s
                FROM tok t LEFT JOIN ratios rt USING (token)
                GROUP BY t.doc_id
            )
            SELECT d.doc_id, d.source,
                   round(coalesce(s.s, 0), 6) AS importance
            FROM documents d LEFT JOIN scores s USING (doc_id)
        """,
        "mixture_weights": r"""
            WITH t AS (
                SELECT source, count(*)::BIGINT AS n_docs,
                       sum(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                           w -> w <> '')))::BIGINT AS n_tokens
                FROM documents GROUP BY source
            )
            SELECT source, n_docs, n_tokens,
                   round(n_tokens::DOUBLE / sum(n_tokens) OVER (), 6) AS share,
                   round(CASE source WHEN 'src0' THEN 0.30
                                     WHEN 'src1' THEN 0.20
                                     WHEN 'src2' THEN 0.10
                                     ELSE 0.0 END
                         / (n_tokens::DOUBLE / sum(n_tokens) OVER ()), 6) AS weight
            FROM t
        """,
        # Two unrolled full-batch GD rounds of logistic regression over
        # bag-of-token term frequencies (lr=1.0, weights rounded to the
        # 1e-6 grid after each round — mirrors train_logreg's
        # quantize_decimals=6). Round 1 starts from w=0 => p=0.5 for
        # every doc. Margins accumulate in ascending tid order (matches
        # the ascending-index np.bincount in score_logreg).
        "quality_classifier": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
            cnt AS (SELECT token, count(*) AS n FROM tok
                    GROUP BY token HAVING count(*) >= 2),
            vocab AS (
                SELECT token, row_number() OVER (ORDER BY n DESC, token) AS tid
                FROM cnt ORDER BY n DESC, token LIMIT 12
            ),
            enc AS (SELECT t.doc_id, coalesce(v.tid, 0) AS tid
                    FROM tok t LEFT JOIN vocab v USING (token)),
            nt AS (SELECT doc_id, count(*) AS n_tok FROM enc GROUP BY doc_id),
            x AS (SELECT e.doc_id, e.tid,
                         count(*)::DOUBLE / any_value(nt.n_tok) AS val
                  FROM enc e JOIN nt USING (doc_id)
                  GROUP BY e.doc_id, e.tid),
            y AS (SELECT doc_id,
                         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
                  FROM documents),
            n AS (SELECT count(*)::DOUBLE AS n FROM documents),
            g1 AS (SELECT x.tid AS j, sum(x.val * (y.y - 0.5)) AS g
                   FROM x JOIN y USING (doc_id) GROUP BY x.tid),
            w1 AS (SELECT j, round(g / n.n, 6) AS wj FROM g1, n),
            b1 AS (SELECT round(sum(y - 0.5) / any_value(n.n), 6) AS b
                   FROM y, n),
            m1 AS (SELECT x.doc_id,
                          any_value(b1.b) + list_sum(
                              list(x.val * coalesce(w1.wj, 0)
                                   ORDER BY x.tid)) AS z
                   FROM x LEFT JOIN w1 ON x.tid = w1.j, b1
                   GROUP BY x.doc_id),
            p AS (SELECT y.doc_id, y.y,
                         1.0 / (1.0 + exp(-coalesce(m1.z, b1.b))) AS p
                  FROM y LEFT JOIN m1 USING (doc_id), b1),
            g2 AS (SELECT x.tid AS j, sum(x.val * (p.y - p.p)) AS g
                   FROM x JOIN p USING (doc_id) GROUP BY x.tid),
            w2 AS (SELECT coalesce(w1.j, g2.j) AS j,
                          round(coalesce(w1.wj, 0)
                                + coalesce(g2.g, 0) / n.n, 6) AS wj
                   FROM w1 FULL JOIN g2 ON w1.j = g2.j, n),
            b2 AS (SELECT round(any_value(b1.b)
                               + sum(p.y - p.p) / any_value(n.n), 6) AS b
                   FROM p, b1, n),
            m2 AS (SELECT x.doc_id,
                          any_value(b2.b) + list_sum(
                              list(x.val * coalesce(w2.wj, 0)
                                   ORDER BY x.tid)) AS z
                   FROM x LEFT JOIN w2 ON x.tid = w2.j, b2
                   GROUP BY x.doc_id)
            SELECT y.doc_id,
                   round(coalesce(m2.z, b2.b), 4) AS margin,
                   CASE WHEN coalesce(m2.z, b2.b) > 0
                        THEN 1 ELSE 0 END AS pred
            FROM y LEFT JOIN m2 USING (doc_id), b2
        """,
        "embedding_covariance": r"""
            WITH t AS (
                SELECT row_number() OVER (ORDER BY vec_id) AS rid,
                       CAST(embedding AS DOUBLE[]) AS x
                FROM embeddings WHERE embedding IS NOT NULL
            ),
            e AS (SELECT rid, unnest(x) AS val,
                         generate_subscripts(x, 1) AS i FROM t)
            SELECT a.i AS i, b.i AS j,
                   round((sum(a.val * b.val)
                          - sum(a.val) * sum(b.val) / count(*))
                         / (count(*) - 1), 6) AS cov
            FROM e a JOIN e b USING (rid)
            WHERE a.i <= b.i
            GROUP BY a.i, b.i
        """,
        "tfidf_terms": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
            n AS (SELECT count(*)::DOUBLE AS n FROM documents),
            dfreq AS (SELECT term, count(DISTINCT doc_id) AS dfr
                      FROM tok GROUP BY term),
            cnt AS (SELECT doc_id, term, count(*)::DOUBLE AS c
                    FROM tok GROUP BY doc_id, term),
            sc AS (SELECT c.doc_id, c.term,
                          c.c * (ln((n.n + 1) / (d.dfr + 1)) + 1) AS score
                   FROM cnt c JOIN dfreq d USING (term), n),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY score DESC, term ASC) AS rank
                  FROM sc)
            SELECT doc_id, term, round(score, 6) AS score, rank
            FROM r WHERE rank <= 5
        """,
        "pq_topk_det": r"""
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
                       FROM embeddings WHERE embedding IS NOT NULL),
            ss AS (SELECT unnest(range(1, 9)) AS s),
            cb AS (SELECT ss.s, t.rn - 1 AS c,
                          list_transform(range(1, 9),
                              i -> t.x[(ss.s - 1) * 8 + i]) AS cx
                   FROM (SELECT x, row_number() OVER (ORDER BY vec_id) AS rn
                         FROM (SELECT vec_id, x FROM v
                               ORDER BY vec_id LIMIT 16)) t, ss),
            sv AS (SELECT v.vec_id, ss.s,
                          list_transform(range(1, 9),
                              i -> v.x[(ss.s - 1) * 8 + i]) AS sx
                   FROM v, ss),
            cd AS (SELECT sv.vec_id, sv.s, cb.c,
                          round(list_sum(list_transform(range(1, 9),
                              i -> (sv.sx[i] - cb.cx[i])
                                   * (sv.sx[i] - cb.cx[i]))), 6) AS d2
                   FROM sv JOIN cb USING (s)),
            codes AS (SELECT vec_id, s, c FROM
                      (SELECT *, row_number() OVER (
                           PARTITION BY vec_id, s ORDER BY d2, c) AS rn
                       FROM cd) WHERE rn = 1),
            q AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                              AS INT) AS query_id, x
                  FROM (SELECT vec_id, x FROM v ORDER BY vec_id LIMIT 3)),
            qlut AS (SELECT q.query_id, cb.s, cb.c,
                            list_sum(list_transform(range(1, 9),
                                i -> (q.x[(cb.s - 1) * 8 + i] - cb.cx[i])
                                     * (q.x[(cb.s - 1) * 8 + i] - cb.cx[i])))
                                AS d
                     FROM q, cb),
            adc AS (SELECT ql.query_id, co.vec_id,
                           round(sum(ql.d), 6) AS dist
                    FROM codes co JOIN qlut ql
                         ON co.s = ql.s AND co.c = ql.c
                    GROUP BY ql.query_id, co.vec_id),
            top AS (SELECT *, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY dist, vec_id) AS rn FROM adc)
            SELECT query_id, vec_id, round(dist, 4) AS dist
            FROM top WHERE rn <= 10
        """,
        # Version diff: hash equality in the engine == text equality here
        # (xxhash64 is injective modulo collisions); the v1->v2 mutation
        # is replayed literally.
        "corpus_diff": """
            WITH oldv AS (SELECT doc_id, text FROM documents),
            newv AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0 THEN 'v2 edit: ' || text
                            ELSE text END AS text
                FROM documents WHERE doc_id % 11 <> 0
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents
                WHERE doc_id % 17 = 0
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.text = n.text THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM oldv o FULL JOIN newv n ON o.doc_id = n.doc_id
        """,
        "corpus_diff_summary": r"""
            WITH oldv AS (
                SELECT doc_id, text, source,
                       len(list_filter(regexp_split_to_array(lower(text),
                           '\s+'), w -> w <> ''))::BIGINT AS t
                FROM documents),
            newv AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0 THEN 'v2 edit: ' || text
                            ELSE text END AS text,
                       source,
                       len(list_filter(regexp_split_to_array(lower(
                           CASE WHEN doc_id % 13 = 0 THEN 'v2 edit: ' || text
                                ELSE text END), '\s+'), w -> w <> ''))::BIGINT AS t
                FROM documents WHERE doc_id % 11 <> 0
                UNION ALL
                SELECT doc_id + 1000000, text, source,
                       len(list_filter(regexp_split_to_array(lower(text),
                           '\s+'), w -> w <> ''))::BIGINT AS t
                FROM documents WHERE doc_id % 17 = 0
            ),
            d AS (
                SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                       CASE WHEN o.doc_id IS NULL THEN 'added'
                            WHEN n.doc_id IS NULL THEN 'removed'
                            WHEN o.text = n.text THEN 'unchanged'
                            ELSE 'changed' END AS status
                FROM oldv o FULL JOIN newv n ON o.doc_id = n.doc_id
            ),
            per_doc AS (
                SELECT d.status, m.source AS s
                FROM d JOIN newv m USING (doc_id) WHERE d.status <> 'removed'
                UNION ALL
                SELECT d.status, m.source AS s
                FROM d JOIN oldv m USING (doc_id) WHERE d.status = 'removed'
            ),
            counts AS (
                SELECT s AS source,
                       sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT AS n_added,
                       sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT AS n_removed,
                       sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT AS n_changed,
                       sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)::BIGINT AS n_unchanged
                FROM per_doc GROUP BY s
            ),
            t_old AS (SELECT source, sum(t)::BIGINT AS tok_old
                      FROM oldv GROUP BY source),
            t_new AS (SELECT source, sum(t)::BIGINT AS tok_new
                      FROM newv GROUP BY source)
            SELECT source,
                   coalesce(n_added, 0)::BIGINT AS n_added,
                   coalesce(n_removed, 0)::BIGINT AS n_removed,
                   coalesce(n_changed, 0)::BIGINT AS n_changed,
                   coalesce(n_unchanged, 0)::BIGINT AS n_unchanged,
                   coalesce(tok_old, 0)::BIGINT AS tok_old,
                   coalesce(tok_new, 0)::BIGINT AS tok_new,
                   (coalesce(tok_new, 0) - coalesce(tok_old, 0))::BIGINT
                       AS tok_delta
            FROM counts
            FULL JOIN t_old USING (source) FULL JOIN t_new USING (source)
        """,
        "temporal_split": """
            SELECT event_id,
                   CASE WHEN ts IS NULL THEN 'embargo'
                        WHEN epoch(ts) < epoch(TIMESTAMP '2024-01-20')
                             - 172800.0 THEN 'train'
                        WHEN epoch(ts) >= epoch(TIMESTAMP '2024-01-20')
                             THEN 'val'
                        ELSE 'embargo' END AS split
            FROM events
        """,
        "cluster_weights": r"""
            WITH labels AS (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY
                           trim(regexp_replace(regexp_replace(lower(text),
                                '[^\w\s]', '', 'g'), '\s+', ' ', 'g')))
                           AS cluster_rep
                FROM documents
            ),
            sizes AS (SELECT cluster_rep, count(*)::BIGINT AS cluster_size
                      FROM labels GROUP BY cluster_rep)
            SELECT l.doc_id, l.cluster_rep, s.cluster_size,
                   round(1.0 / s.cluster_size, 6) AS weight
            FROM labels l JOIN sizes s USING (cluster_rep)
        """,
    }
