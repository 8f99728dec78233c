"""Catalog queries — second wave: rank-join sampling (J7/O5), top-k +
sample (O3), rollup (the idiomatic replacement for the reference's
re-aggregation duplication, SURVEY §2.4 note), k-skip-n-gram lift (F7),
tumbling event-time windows, incremental overlap merge (§2.11 core),
SimHash fingerprints, and IVF-style nearest-centroid assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..cachescope import scoped_cache
from ..functions.timeutil import epoch_micros, epoch_seconds
from ..operators import joins
from .catalog import register, table
from .shared_corpus import tokenized_documents
from .text_queries import _SQL_TOKS

LOG_RANKS = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]


@register(
    "j7_rank_join",
    sql=f"""
    SELECT rank, event_id, round(value, 2) AS value
    FROM (
      SELECT row_number() OVER (ORDER BY value DESC, event_id DESC) AS rank,
             event_id, value
      FROM events
    ) WHERE rank IN ({", ".join(map(str, LOG_RANKS))})
    """,
    tags=("J7", "O5"),
    doc="log-spaced rank sampling (sample_tweets...py:21-33): per-partition "
    "top-k prune, then global rank over survivors only — never a full "
    "single-partition sort",
)
def j7_rank_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    out = joins.rank_join(events, LOG_RANKS, ["value", "event_id"])
    return out.select("rank", "event_id", F.round("value", 2).alias("value"))


@register(
    "o3_topk_sample",
    sql="""
    SELECT event_id, round(value, 2) AS value
    FROM (
      SELECT event_id, value FROM events
      ORDER BY value DESC, event_id DESC LIMIT 1000
    ) WHERE (CAST(event_id AS HUGEINT) * 2654435761) % 4294967296 < 214748364
    """,
    tags=("O3", "R1"),
    doc="top-k then secondary sample (sample_top_tweets.py:106-109), with "
    "the deterministic hash sample so the oracle replays it",
)
def o3_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_sample
    from ..operators.windows import global_topk

    events = table(spark, sf_dir, "events")
    top = global_topk(events, ["value", "event_id"], 1000)
    return hash_sample(top, "event_id", 0.05).select(
        "event_id", F.round("value", 2).alias("value")
    )


@register(
    "a_rollup_revenue",
    sql="""
    SELECT r.r_name, n.n_name,
           CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS acctbal_sum,
           count(*) AS n_cust
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    tags=("rollup", "A1"),
    doc="multi-level aggregation in ONE pass via rollup — the reference "
    "re-aggregates per level instead (1_import.py:127,226); rollup "
    "shares the scan and the shuffle across levels",
)
def a_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    j = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    # integer-cents accumulation: float round(sum) diverges between
    # engines at ~1e-15 relative on 100x-scale sums (the class the
    # TPC-H suite and a_grouping_sets document)
    return j.rollup("r_name", "n_name").agg(
        (
            F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long"))
            .cast("double") / 100.0
        ).alias("acctbal_sum"),
        F.count(F.lit(1)).alias("n_cust"),
    )


_SQL_BIGRAMS = (
    "list_concat("
    "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]), "
    "list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+2]))"
)


@register(
    "f7_kskip_lift",
    sql=f"""
    WITH toks AS (
      SELECT doc_id,
             list_contains({_SQL_TOKS.format(c="text")}, 'spark') AS is_target,
             {_SQL_TOKS.format(c="text")} AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, is_target, unnest({_SQL_BIGRAMS}) AS gram FROM toks
    ),
    tot AS (
      SELECT CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS DOUBLE) AS n_t,
             CAST(count(*) AS DOUBLE) AS n_all
      FROM grams
    ),
    cnt AS (
      SELECT gram,
             sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_t,
             count(*) AS c_all
      FROM grams GROUP BY gram
    )
    SELECT gram, CAST(c_t AS BIGINT) AS c_t, CAST(c_all AS BIGINT) AS c_all,
           round((c_t / tot.n_t) / (c_all / tot.n_all), 6) AS lift
    FROM cnt, tot
    WHERE c_t >= 5
    ORDER BY lift DESC, gram ASC
    LIMIT 20
    """,
    tags=("F7",),
    doc="1-skip bigram lift (count_kskipngrams.py:68-114,185-204): grams "
    "over-represented in docs mentioning 'spark' vs the corpus; pure "
    "array expressions + two aggregates, no Python",
)
def f7_kskip_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The shared tokenize-once frame already holds the materialized
    # token array per row — passing a raw tokenize(...) expression into
    # transform() would re-run the regexp chain per array ELEMENT
    # (O(tokens^2) per doc — measured 77s vs <2s at sf0.1).
    docs = tokenized_documents(spark, sf_dir).select("toks")
    toks = F.col("toks")
    contiguous = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    skip1 = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        F.array_contains(toks, "spark").alias("is_target"),
        F.explode(F.concat(contiguous, skip1)).alias("gram"),
    )
    grams = scoped_cache(grams)
    tot = grams.agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).cast("double").alias("n_t"),
        F.count(F.lit(1)).cast("double").alias("n_all"),
    )
    cnt = grams.groupBy("gram").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_t"),
        F.count(F.lit(1)).alias("c_all"),
    )
    return (
        cnt.where(F.col("c_t") >= 5)
        .crossJoin(F.broadcast(tot))
        .select(
            "gram",
            F.col("c_t").cast("long").alias("c_t"),
            F.col("c_all").cast("long").alias("c_all"),
            F.round(
                (F.col("c_t") / F.col("n_t")) / (F.col("c_all") / F.col("n_all")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("gram").asc())
        .limit(20)
    )


@register(
    "w_tumbling_hour",
    sql="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming-window",),
    doc="tumbling 1-hour event-time window — calls "
    "streaming/windowed.py tumbling_counts VERBATIM on the batch frame "
    "(the module function's watermark attaches only to streaming "
    "inputs), so the driver's value-hash gate covers the exact "
    "expression the stream runs per micro-batch",
)
def w_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windowed import tumbling_counts

    events = table(spark, sf_dir, "events")
    out = tumbling_counts(events, "ts", window_len="1 hour")
    return out.select(
        F.col("win_start").alias("hour_start"),
        "event_type",
        F.col("n_events").alias("n"),
        F.round("total_value", 2).alias("total_value"),
    )


@register(
    "inc_overlap_merge",
    sql="""
    WITH unioned AS (
      SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-21'
      UNION ALL
      SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-19'
    ),
    deduped AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_id ORDER BY ts, event_id) AS rn
      FROM unioned
    )
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM deduped WHERE rn = 1
    GROUP BY event_type
    """,
    tags=("incremental", "U1"),
    doc="the incremental-append merge core (stop_locations_append.py:"
    "128-132): old + re-delivered overlap batches, union + deterministic "
    "dedup restores exactly-once counts",
)
def inc_overlap_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    old = events.where(F.col("ts") < "2024-01-21")
    new = events.where(F.col("ts") >= "2024-01-19")
    unioned = old.unionByName(new)
    w = Window.partitionBy("event_id").orderBy("ts", "event_id")
    deduped = unioned.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


def _simhash_sql(bits: int = 16) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS.format(c="text")}) AS tok FROM documents
    ),
    enc AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT % 4294967296 AS h
      FROM toks
    ),
    votes AS (
      SELECT doc_id, bit,
             sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM enc CROSS JOIN (SELECT unnest(range(0, {bits})) AS bit)
      GROUP BY doc_id, bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """


@register(
    "d_simhash",
    sql=_simhash_sql(),
    tags=("dedup-simhash",),
    doc="SimHash fingerprints (16-bit): majority vote over token-hash "
    "bits; near-dups land at small Hamming distance — integer bit "
    "arithmetic end to end",
)
def d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash

    docs = table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text")


@register(
    "e_ivf_assign",
    sql="""
    WITH flat AS (
      SELECT label,
             unnest(range(1, len(embedding) + 1)) AS i,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT label, i, avg(x) AS v FROM flat GROUP BY label, i
    ),
    cvec AS (SELECT label, list(v ORDER BY i) AS cv FROM cent GROUP BY label),
    d AS (
      SELECT e.vec_id, e.label AS label_true, c.label AS cand,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) ** 2)) AS dist
      FROM embeddings e CROSS JOIN cvec c
    )
    SELECT vec_id, label_true, cand AS assigned_label
    FROM (
      SELECT vec_id, label_true, cand,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cand ASC) AS rn
      FROM d
    ) WHERE rn = 1
    """,
    tags=("similarity", "ivf"),
    doc="IVF-style coarse quantizer: per-label centroids (posexplode + "
    "avg + reassemble), nearest-centroid assignment — the bucketing "
    "stage that turns brute-force ANN into per-cell probes at scale",
)
def e_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("v"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
            ).alias("cv")
        )
    )
    pairs = emb.select(
        "vec_id", F.col("label").alias("label_true"), "embedding"
    ).crossJoin(F.broadcast(cent.select(F.col("label").alias("cand"), "cv")))
    dist = pairs.withColumn(
        "dist",
        F.aggregate(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                "cv",
                lambda x, c: (x - c) * (x - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("cand").asc())
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "label_true", F.col("cand").alias("assigned_label"))
    )


_IVF_CTE = """
    flat AS (
      SELECT label,
             unnest(range(1, len(embedding) + 1)) AS i,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
      FROM embeddings
    ),
    cent AS (SELECT label, i, avg(x) AS v FROM flat GROUP BY label, i),
    cvec AS (SELECT label AS cell, list(v ORDER BY i) AS cv FROM cent GROUP BY label),
    vecd AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    dists AS (
      SELECT e.vec_id, e.v, c.cell,
             list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - c.cv[i]) ** 2)) AS dist
      FROM vecd e CROSS JOIN cvec c
    ),
    assign AS (
      SELECT vec_id AS neighbor_id, v, cell FROM (
        SELECT vec_id, v, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cell ASC) AS rn
        FROM dists) WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id AS query_id, v AS qv, cell FROM (
        SELECT vec_id, v, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cell ASC) AS rn
        FROM dists WHERE vec_id < 5) WHERE rn <= 2
    )
"""


@register(
    "e_ivf_topk",
    sql=f"""
    WITH {_IVF_CTE},
    scored AS (
      SELECT q.query_id, a.neighbor_id,
             list_dot_product(q.qv, a.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(a.v, a.v))) AS cos
      FROM qprobe q JOIN assign a ON a.cell = q.cell
      WHERE a.neighbor_id != q.query_id
    )
    SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos
    FROM (SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
    tags=("similarity", "ann-ivf"),
    doc="full IVF approximate top-k: codebook -> one-cell assignment "
    "(index build) -> queries probe nprobe=2 nearest cells and score "
    "only those cells' vectors (hash join on cell id). The scale path "
    "where LSH buckets are too coarse; recall tunes via nprobe; exact "
    "baseline sim_cosine_topk",
)
def e_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = similarity.ivf_topk(emb, queries, k=5, nprobe=2)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos")
    )


@register(
    "w_sliding_window",
    sql="""
    WITH g AS (
      SELECT event_type, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events
    ),
    w AS (
      SELECT event_type, value,
             (t // 1800 - i) * 1800 AS win_start
      FROM g, unnest([0, 1]) AS u(i)
      WHERE (t // 1800 - i) * 1800 + 3600 > t
    )
    SELECT win_start, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM w GROUP BY win_start, event_type
    """,
    tags=("streaming-batch", "sliding-window"),
    doc="sliding event-time window (1h length, 30min slide) via F.window "
    "— each event lands in length/slide windows; the oracle enumerates "
    "the two containing window starts arithmetically",
)
def w_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            epoch_seconds(F.col("win.start")).alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "d_simhash_pairs",
    sql=f"""
    WITH fp AS ({_simhash_sql(32)}),
    banded AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * 8)) & 255 AS chunk
      FROM fp, unnest(range(0, 4)) AS u(band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS fp_a, b.simhash AS fp_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 3
    """,
    tags=("dedup-simhash", "dedup-lsh"),
    doc="SimHash near-dup pairs at the SCALE-SAFE default bands "
    "(bits=32/band_bits=8 — 1024 distinct band keys; pigeonhole: any "
    "pair within Hamming 3 of a 32-bit fingerprint shares one of the 4 "
    "bands) + bit_count(xor) verify — hash-join candidate generation, "
    "the quadratic step never materializes, pairs emitted exactly once "
    "via the first-shared-band filter (no distinct re-shuffle)",
)
def d_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_near_dup_pairs

    docs = table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, "doc_id", "text")


@register(
    "j_asof_join",
    sql="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, c.click_id AS asof_click,
           date_diff('microsecond', c.ts, p.ts) AS lag_us
    FROM p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("asof", "join", "time-series"),
    doc="backward as-of join: each purchase picks up the latest click at "
    "or before it per user (joins.as_of_join). Implemented as tag-union "
    "+ one window with last(ignorenulls) — a single shuffle and linear "
    "state, vs a range join's |left|x|right-in-range| pair blow-up; the "
    "reference approximates this with lag over pre-unioned frames "
    "(wbgps/analysis.py:392-397)",
)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    clicks = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = joins.as_of_join(
        purchases, clicks, keys=["user_id"], ts_col="ts",
        payload_cols=["click_id", "click_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("click_id").alias("asof_click"),
        (epoch_micros("ts") - epoch_micros("click_ts")).alias("lag_us"),
    )


@register(
    "j_interval_join",
    sql="""
    WITH pts AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
      FROM events
    ),
    iv AS (
      SELECT user_id, event_id AS interval_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(floor(value * 10) AS BIGINT) * 600 + 600 AS e
      FROM events WHERE event_id % 10 = 0
    )
    SELECT iv.interval_id, count(*) AS n_points,
           round(sum(pts.value), 2) AS total_value
    FROM iv JOIN pts
      ON pts.user_id = iv.user_id AND pts.t >= iv.s AND pts.t < iv.e
    GROUP BY iv.interval_id
    """,
    tags=("interval", "join", "time-series"),
    doc="point-in-interval join (joins.interval_join): every 10th event "
    "opens a 10-70 min window for its user; count/sum the user's events "
    "inside it. Banded two-phase plan — points bucket once, intervals "
    "explode to covered buckets, equi-join + exact refine — a shuffled "
    "hash join Catalyst optimizes, never the BroadcastNestedLoop a raw "
    "range predicate plans",
)
def j_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    pts = events.select(
        "user_id", epoch_seconds("ts").alias("t"), "value"
    )
    iv = events.where(F.col("event_id") % 10 == 0).select(
        "user_id",
        F.col("event_id").alias("interval_id"),
        epoch_seconds("ts").alias("s"),
        (
            epoch_seconds("ts")
            + F.floor(F.col("value") * 10).cast("long") * 600
            + 600
        ).alias("e"),
    )
    joined = joins.interval_join(
        pts, iv, keys=["user_id"], point_col="t", start_col="s",
        end_col="e", bucket_width=1800,
    )
    return joined.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "a_cube_status",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("cube", "A4"),
    doc="all grouping combinations in one pass via cube (rollup's "
    "sibling; both replace the reference's per-level re-aggregation)",
)
def a_cube_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("double") / 100.0
        ).alias("total"),
    )


@register(
    "a_quantiles",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("quantiles", "A1"),
    doc="exact grouped quantiles (linear interpolation — Spark percentile "
    "== DuckDB quantile_cont semantics). Exact form for oracle parity; at "
    "100 TB swap percentile -> percentile_approx (t-digest, one pass, "
    "mergeable sketches) — same call shape",
)
def a_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # ONE percentile aggregate with an array of percentages — three
    # scalar percentile() aggs each buffer the group's full value list
    # independently (3x the memory and sort work; measured ~2x wall)
    pcts = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(pcts.alias("__p"))
        .select(
            "l_returnflag",
            F.round(F.col("__p")[0], 4).alias("p25"),
            F.round(F.col("__p")[1], 4).alias("p50"),
            F.round(F.col("__p")[2], 4).alias("p75"),
        )
    )


@register(
    "a_corr_covar",
    sql="""
    WITH e AS (
      SELECT event_type, value,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 % 24 AS hr
      FROM events
    )
    SELECT event_type,
           round(corr(value, hr), 5) AS corr_vh,
           round(covar_samp(value, hr), 5) AS covar_vh,
           CAST(count(*) AS BIGINT) AS n
    FROM e GROUP BY event_type
    """,
    tags=("corr", "A7"),
    doc="grouped Pearson correlation + sample covariance (value vs "
    "hour-of-day) — single-pass mergeable moment aggregates; hour derived "
    "from epoch integer arithmetic so both engines see identical inputs",
)
def a_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hr = (epoch_seconds("ts") / F.lit(3600)).cast("long") % 24
    e = ev.select("event_type", "value", hr.alias("hr"))
    return e.groupBy("event_type").agg(
        F.round(F.corr("value", "hr"), 5).alias("corr_vh"),
        F.round(F.covar_samp("value", "hr"), 5).alias("covar_vh"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "r4_group_sample",
    sql="""
    SELECT event_type, event_id, user_id
    FROM (
      SELECT event_type, event_id, user_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(event_id AS HUGEINT) * 2654435761 % 4294967296 ASC,
                        event_id ASC) AS rn
      FROM events
    ) WHERE rn <= 50
    """,
    tags=("R3", "sampling-group"),
    doc="deterministic fixed-n sample per group (sampling.group_fixed_n): "
    "portable multiplicative-hash order within group; two-phase narrow "
    "prune (per-partition head-n, Arrow cumcount with carry) before the "
    "exact window, so a skewed group never sorts in one task",
)
def r4_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import group_fixed_n

    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "user_id")
    return group_fixed_n(ev, ["event_type"], 50, "event_id")


@register(
    "a_robust_stats",
    sql="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(m.med), 6) AS med,
           round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
    FROM events e JOIN med m USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("robust-stats", "A7"),
    doc="grouped median + MAD (median absolute deviation) — the "
    "outlier-resistant location/scale pair for quality gating (a z-score "
    "on mean/std lets one spam flood shift the gate; median/MAD doesn't). "
    "Two exact passes: grouped median, broadcast back, median of absolute "
    "deviations; interpolation identical to DuckDB quantile_cont. At "
    "100 TB swap percentile -> approx_percentile (t-digest), same shape",
)
def a_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    j = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("med"), 6).alias("med"),
        F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad"),
    )


@register(
    "r5_stratified_split",
    sql="""
    WITH r AS (
      SELECT event_type,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(event_id AS HUGEINT) * 2654435761 % 4294967296 ASC,
                        event_id ASC) AS rk,
             count(*) OVER (PARTITION BY event_type) AS nb
      FROM events
    )
    SELECT event_type,
           CASE WHEN rk <= floor(nb * 0.8) THEN 'train'
                WHEN rk <= floor(nb * 0.9) THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n
    FROM r GROUP BY 1, 2
    """,
    tags=("R3", "ml-split"),
    doc="deterministic EXACT-proportion stratified train/val/test split "
    "(sampling.stratified_split): within-stratum hash-order rank cut at "
    "exact fractional boundaries — 80/10/10 of a 1000-row stratum is "
    "exactly 800/100/100, unlike per-row Bernoulli hashing. Rank rides "
    "the scalable grouped prefix sum; the oracle states the same "
    "assignment with a window",
)
def r5_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import stratified_split

    ev = table(spark, sf_dir, "events").select("event_type", "event_id")
    out = stratified_split(
        ev, ["event_type"], {"train": 0.8, "val": 0.1, "test": 0.1}, "event_id"
    )
    return out.groupBy("event_type", "split").agg(F.count(F.lit(1)).alias("n"))


_SEMDEDUP_TAU = 0.35

# Cells per ~900 vectors: the SemDeDup paper's own regime (grow k with
# the corpus so per-cell pair work stays constant — a pinned codebook
# makes the epsilon-ball verify quadratic in corpus size; measured 45x
# wall on 10x vectors before this). Floor of 2 keeps the fixture
# non-degenerate at driver-check scale.
_SEMDEDUP_CELLS_PER = 900

_SEMDEDUP_SQL = f"""
    WITH vecd AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    kq AS (
      SELECT greatest(2, CAST(ceil(count(*) / {_SEMDEDUP_CELLS_PER}.0) AS INT))
               AS k
      FROM vecd
    ),
    init AS (
      SELECT rn - 1 AS cell, v FROM (
        SELECT v,
               row_number() OVER (
                 ORDER BY (CAST(vec_id AS HUGEINT) % 4294967296)
                          * 2654435761 % 4294967296 ASC,
                          vec_id ASC) AS rn
        FROM vecd
      ) WHERE rn <= (SELECT k FROM kq)
    ),
    a0 AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_sum(list_transform(range(1, len(e.v) + 1),
                            i -> (e.v[i] - c.v[i]) ** 2)) ASC,
                          c.cell ASC) AS rn
        FROM vecd e CROSS JOIN init c
      ) WHERE rn = 1
    ),
    upd AS (
      SELECT cell, i, floor(avg(v[i]) * 1000000 + 0.5) / 1000000 AS cv
      FROM a0, unnest(range(1, len(v) + 1)) AS u(i)
      GROUP BY cell, i
    ),
    upd_vec AS (SELECT cell, list(cv ORDER BY i) AS cv FROM upd GROUP BY cell),
    cent AS (
      SELECT init.cell, coalesce(u.cv, init.v) AS cv
      FROM init LEFT JOIN upd_vec u USING (cell)
    ),
    a AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_sum(list_transform(range(1, len(e.v) + 1),
                            i -> (e.v[i] - c.cv[i]) ** 2)) ASC,
                          c.cell ASC) AS rn
        FROM vecd e CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT x.vec_id
      FROM a x JOIN a y ON x.cell = y.cell AND y.vec_id < x.vec_id
      WHERE list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v))
               * sqrt(list_dot_product(y.v, y.v))) >= {_SEMDEDUP_TAU}
    )
    SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell,
           CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
    FROM a LEFT JOIN dropped d USING (vec_id)
    """


@register(
    "d_semantic_dedup",
    sql=_SEMDEDUP_SQL,
    tags=("dedup", "semantic", "similarity"),
    doc="SemDeDup-style semantic deduplication (similarity.semantic_dedup, "
    "arXiv:2303.09540) at the SCALE-ADAPTIVE codebook size: one Lloyd "
    "iteration of clustering.kmeans with k = max(2, ceil(n/900)) cells "
    "(deterministic hash-ordered init, centroid trajectory pinned to "
    "1e-6 — the e_kmeans_lloyd replay discipline), then within each "
    "cell drop any vector with a smaller-id neighbor at cosine >= tau. "
    "Growing k with the corpus is the paper's own regime — pair space "
    "stays per-cell quadratic with CONSTANT cell size, so verify work "
    "is linear in n at every scale (the pinned label codebook measured "
    "45x wall on 10x vectors); the oracle re-derives k from its own "
    "count(*) and replays init, assignment, the rounded centroid "
    "update, and the drop policy exactly",
)
def d_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.clustering import kmeans
    from ..operators.similarity import semantic_dedup

    emb = table(spark, sf_dir, "embeddings")
    k = max(2, math.ceil(emb.count() / _SEMDEDUP_CELLS_PER))
    assigned, _cents = kmeans(emb, k, max_iter=1, round_dp=6)
    return semantic_dedup(
        assigned.withColumnRenamed("cluster_id", "cell"),
        "vec_id", "embedding", "cell", threshold=_SEMDEDUP_TAU,
    )


@register(
    "a_hll_distinct",
    sql="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS approx_distinct
    FROM events GROUP BY event_type
    """,
    tags=("A2", "sketch", "rollup"),
    doc="mergeable HLL distinct rollup (relational.hll_distinct_rollup): "
    "per-(event_type, day) DataSketches HLL sketches unioned up to "
    "event_type — the 100 TB pattern where daily ~1.5 KB sketches are "
    "persisted once and every coarser grain is a sketch union, never a "
    "raw-value rescan. The oracle is EXACT count(distinct): at the "
    "oracle's scale every group sits in the sketch's sparse-exact regime "
    "(cardinality << 0.75*2^lg_k), so estimate == exact is the contract "
    "being checked; the estimating regime is covered by the tolerance "
    "property test (tests/test_plans.py::test_hll_estimate_tolerance)",
)
def a_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import hll_distinct_rollup

    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return hll_distinct_rollup(
        ev, ["event_type", "day"], ["event_type"], "user_id", lg_k=12
    )


_HIST_BUCKETS = 10


@register(
    "a_histogram",
    sql=f"""
    WITH b AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      FROM lineitem
    ),
    tagged AS (
      SELECT CASE WHEN b.hi = b.lo THEN 0
                  ELSE least({_HIST_BUCKETS - 1},
                             CAST(floor((l.l_extendedprice - b.lo)
                                        / ((b.hi - b.lo) / {_HIST_BUCKETS}))
                                  AS INTEGER))
             END AS bucket,
             b.lo, b.hi
      FROM lineitem l CROSS JOIN b
    )
    SELECT bucket,
           round(lo + bucket * ((hi - lo) / {_HIST_BUCKETS}), 4) AS lo,
           round(lo + (bucket + 1) * ((hi - lo) / {_HIST_BUCKETS}), 4) AS hi,
           CAST(count(*) AS BIGINT) AS n
    FROM tagged GROUP BY bucket, tagged.lo, tagged.hi
    """,
    tags=("A-profile", "histogram"),
    doc="equi-width histogram (relational.equi_width_histogram) over "
    "l_extendedprice: bounds pass + broadcast-crossJoin bucket pass, both "
    "map-side-combined — the standard data-profiling primitive; identical "
    "IEEE bucket arithmetic on both engines",
)
def a_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import equi_width_histogram

    li = table(spark, sf_dir, "lineitem")
    out = equi_width_histogram(li, "l_extendedprice", _HIST_BUCKETS)
    return out.select(
        "bucket",
        F.round("lo", 4).alias("lo"),
        F.round("hi", 4).alias("hi"),
        "n",
    )


_KLL_EPS = 0.05  # KLL k=200 rank-error bound ~1.65% (99% conf); generous
# headroom so the per-quantile verdict is deterministically TRUE across
# runs (merge order / compaction randomness move the ESTIMATE, never
# outside the guarantee at this margin)


@register(
    "a_kll_quantiles",
    sql="""
    SELECT l_returnflag, phi,
           CAST(count(*) AS BIGINT) AS n,
           1 AS within_bound
    FROM lineitem
    CROSS JOIN (
      SELECT UNNEST([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE]) AS phi
    ) q
    GROUP BY l_returnflag, phi
    """,
    tags=("A-sketch", "kll", "rollup"),
    doc="mergeable KLL quantile rollup (relational.kll_quantile_rollup): "
    "per-(returnflag, shipdate) sketches merged up to returnflag, "
    "p25/p50/p75 read off the merged sketch. A sketch ESTIMATE is not "
    "hash-able (merge order moves it within the error bound), so the "
    "entry oracles the GUARANTEE itself: the engine recomputes each "
    "returned quantile's EXACT normalized rank in one corpus pass and "
    "emits within_bound = |rank - phi| <= eps per probe — a boolean "
    "that IS hash-stable, compared against the oracle's literal TRUE "
    "(a broken merge or guarantee violation flips it and fails the "
    "hash). The estimating-regime tolerance is additionally covered by "
    "tests/test_plans.py::test_kll_rollup_rank_error",
)
def a_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import kll_quantile_rollup

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_shipdate", "l_extendedprice"
    )
    roll = kll_quantile_rollup(
        li,
        ["l_returnflag", "l_shipdate"],
        ["l_returnflag"],
        "l_extendedprice",
        quantiles=(0.25, 0.5, 0.75),
    )
    est = roll.selectExpr(
        "l_returnflag",
        "stack(3, 0.25D, q_0_25, 0.5D, q_0_5, 0.75D, q_0_75) AS (phi, __v)",
    )
    # exact-rank verification: the 9-row estimate frame broadcasts back
    # onto ONE corpus pass; rank fractions are exact long arithmetic.
    # Interval form handles ties: the returned value v satisfies the
    # guarantee iff [frac(<v), frac(<=v)] intersects [phi-eps, phi+eps].
    j = li.join(F.broadcast(est), "l_returnflag")
    agg = j.groupBy("l_returnflag", "phi").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_extendedprice") < F.col("__v"), 1).otherwise(0)
        ).alias("__lt"),
        F.sum(
            F.when(F.col("l_extendedprice") <= F.col("__v"), 1).otherwise(0)
        ).alias("__le"),
    )
    eps = F.lit(_KLL_EPS)
    return agg.select(
        "l_returnflag",
        "phi",
        "n",
        (
            (F.col("__lt") / F.col("n") - eps <= F.col("phi"))
            & (F.col("phi") <= F.col("__le") / F.col("n") + eps)
        ).cast("int").alias("within_bound"),
    )


@register(
    "a_theta_overlap",
    sql="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
           CAST((SELECT count(*) FROM a
                 WHERE o_custkey IN (SELECT o_custkey FROM b))
                AS BIGINT) AS n_intersection,
           CAST((SELECT count(*) FROM (SELECT o_custkey FROM a
                                       UNION SELECT o_custkey FROM b))
                AS BIGINT) AS n_union,
           CAST((SELECT count(*) FROM a
                 WHERE o_custkey NOT IN (SELECT o_custkey FROM b))
                AS BIGINT) AS n_only_a
    """,
    tags=("A2", "sketch", "set-overlap"),
    doc="Theta-sketch distinct-set overlap (relational.theta_set_overlap): "
    "|A|, |B|, |A∩B|, |A∪B|, |A∖B| of two slices' distinct customer sets "
    "from ONE base-data pass (conditional sketch inputs) — the "
    "decontamination / cohort-overlap question at sketch cost, set "
    "algebra HLL cannot do. Oracle is exact set arithmetic: at the "
    "oracle's scale both slices sit under the sketch's nominal entries "
    "(2^lg_k), where Theta estimates are exact; the estimating regime is "
    "covered by tests/test_plans.py::test_theta_overlap_tolerance",
)
def a_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import theta_set_overlap

    orders = table(spark, sf_dir, "orders")
    return theta_set_overlap(orders, "o_custkey", "o_orderstatus", "F", "O")


@register(
    "r6_weighted_bernoulli",
    sql="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE (CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296) / 4294967296.0
          < n_chars / 4000.0
    """,
    tags=("sampling-weighted", "data-mixing"),
    doc="deterministic weighted Bernoulli sample "
    "(sampling.weighted_bernoulli_sample): keep probability min(1, w/scale) "
    "per row — the quality-proportional keep for data mixing. Membership is "
    "a pure row property (portable hash vs the row's own weight, one IEEE "
    "double compare both engines), stable across partitionings and reruns; "
    "a single narrow filter pushed to the scan",
)
def r6_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_bernoulli_sample

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_bernoulli_sample(docs, "doc_id", "n_chars", 4000.0)


@register(
    "r7_weighted_topk",
    sql="""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               ORDER BY -ln(((CAST(doc_id AS HUGEINT) * 2654435761
                              % 4294967296) + 1) / 4294967296.0)
                        / n_chars ASC,
                        doc_id ASC) AS rn
      FROM documents WHERE n_chars > 0
    ) WHERE rn <= 50
    """,
    tags=("sampling-weighted", "data-mixing"),
    doc="weighted sample of exactly k rows without replacement "
    "(sampling.weighted_fixed_k): exponential-race keys -ln(u)/w "
    "(Efraimidis & Spirakis 2006) on the portable hash uniform; k smallest "
    "keys win. Plans TakeOrdered (per-partition k-heap + k-row merge), "
    "never a global sort; same IEEE ln/divide both engines",
)
def r7_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_fixed_k

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_fixed_k(docs, 50, "doc_id", "n_chars")


@register(
    "g_funnel",
    sql="""
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_view_click_purchase
    """,
    tags=("funnel", "sequence"),
    doc="ordered conversion funnel (view -> click -> purchase, strictly "
    "increasing timestamps): ONE shuffle — per-user sorted event array + "
    "a higher-order aggregate() fold carrying (t1,t2,t3) stage state "
    "through the sequence, entirely JVM-side. The oracle states the same "
    "semantics as three min-after-min passes; the fold computes them in "
    "one corpus pass where the SQL form rescans per stage",
)
def g_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timeutil import epoch_micros

    ev = table(spark, sf_dir, "events").select(
        "user_id", epoch_micros("ts").alias("t"), "event_type"
    )
    arr = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("t"), F.col("event_type").alias("et")))
        ).alias("evs")
    )
    init = F.struct(
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("t2"),
        F.lit(None).cast("long").alias("t3"),
    )

    def step(acc, e):
        t1 = F.when(
            acc["t1"].isNull() & (e["et"] == "view"), e["t"]
        ).otherwise(acc["t1"])
        t2 = F.when(
            acc["t2"].isNull()
            & acc["t1"].isNotNull()
            & (e["et"] == "click")
            & (e["t"] > acc["t1"]),
            e["t"],
        ).otherwise(acc["t2"])
        t3 = F.when(
            acc["t3"].isNull()
            & acc["t2"].isNotNull()
            & (e["et"] == "purchase")
            & (e["t"] > acc["t2"]),
            e["t"],
        ).otherwise(acc["t3"])
        return F.struct(t1.alias("t1"), t2.alias("t2"), t3.alias("t3"))

    st = arr.select(F.aggregate("evs", init, step).alias("s"))
    return st.agg(
        F.count(F.col("s.t1")).alias("n_view"),
        F.count(F.col("s.t2")).alias("n_view_click"),
        F.count(F.col("s.t3")).alias("n_view_click_purchase"),
    )


@register(
    "g_retention",
    sql="""
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_d
      FROM events GROUP BY user_id
    ), w AS (
      SELECT e.user_id,
             CAST(date_trunc('week', f.first_d) AS DATE) AS cohort_week,
             CAST(datediff('day', date_trunc('week', f.first_d),
                           date_trunc('week', CAST(e.ts AS DATE))) // 7
                  AS INT) AS week_offset
      FROM events e JOIN f USING (user_id)
    )
    SELECT cohort_week, week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM w GROUP BY cohort_week, week_offset
    """,
    tags=("retention", "cohort"),
    doc="weekly cohort retention matrix: cohort = Monday-truncated week "
    "of a user's first event; cell (cohort, offset) = distinct users from "
    "that cohort active offset weeks later. Two keyed aggregations on "
    "user_id (first-touch, then matrix) — at 100 TB the first-touch "
    "frame is user-dimension-sized and the join shuffles once on the "
    "same key the agg just produced (no extra exchange under AQE)",
)
def g_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timeutil import _as_instant

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date(_as_instant("ts")).alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    j = ev.join(first, "user_id").select(
        "user_id",
        F.date_trunc("week", F.col("first_d")).cast("date").alias("cohort_week"),
        (
            F.datediff(
                F.date_trunc("week", F.col("d")).cast("date"),
                F.date_trunc("week", F.col("first_d")).cast("date"),
            )
            / 7
        )
        .cast("int")
        .alias("week_offset"),
    )
    return j.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").alias("n_users")
    )


@register(
    "j_fuzzy_match",
    sql="""
    WITH nn AS (
      SELECT GREATEST((SELECT count(*) FROM customer),
                      (SELECT count(*) FROM supplier)) AS n
    ),
    kk AS (
      SELECT GREATEST(
               3, length(CAST(GREATEST(1, (n + 499) // 500) - 1 AS VARCHAR))
             ) AS k
      FROM nn
    ),
    l AS (SELECT c_custkey, c_name,
                 right(c_name, (SELECT k FROM kk)) AS blk FROM customer),
    r AS (SELECT s_suppkey, s_name,
                 right(s_name, (SELECT k FROM kk)) AS blk FROM supplier)
    SELECT l.c_custkey, l.c_name, r.s_suppkey, r.s_name,
           levenshtein(l.c_name, r.s_name) AS edit_dist
    FROM l JOIN r USING (blk)
    WHERE levenshtein(l.c_name, r.s_name) <= 7
    """,
    tags=("fuzzy", "join", "record-linkage"),
    doc="blocked fuzzy join (joins.fuzzy_join): record linkage by edit "
    "distance — block on the last-k chars of the digit-tailed name "
    "(equi-join candidates), refine with exact levenshtein <= 7. "
    "k is SCALE-ADAPTIVE (joins.auto_block_digits, the auto_n_planes "
    "pattern): smallest width with 10^k blocks >= ceil(n/500), so block "
    "population — and refine cost — stays ~constant per block and the "
    "wall scales linearly (the fixed last-3 key measured 37.9x wall for "
    "10x data at 100x). The oracle re-derives the SAME k from its own "
    "count(*) in identical integer arithmetic (digits of blocks-1). "
    "Two-phase plan replaces the BroadcastNestedLoop a raw non-equi "
    "distance predicate would get; per-block pair cost, never |L| x |R|",
)
def j_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return joins.fuzzy_join(
        cust,
        supp,
        "c_name",
        "s_name",
        max_dist=7,
    ).select("c_custkey", "c_name", "s_suppkey", "s_name", "edit_dist")


@register(
    "j_fuzzy_left",
    sql="""
    WITH nn AS (
      SELECT GREATEST((SELECT count(*) FROM supplier),
                      (SELECT count(*) FROM customer)) AS n
    ),
    kk AS (
      SELECT GREATEST(
               3, length(CAST(GREATEST(1, (n + 499) // 500) - 1 AS VARCHAR))
             ) AS k
      FROM nn
    ),
    l AS (SELECT s_suppkey, s_name,
                 right(s_name, (SELECT k FROM kk)) AS blk FROM supplier),
    r AS (SELECT c_custkey, c_name,
                 right(c_name, (SELECT k FROM kk)) AS blk FROM customer),
    m AS (
      SELECT l.s_suppkey, r.c_custkey, r.c_name,
             levenshtein(l.s_name, r.c_name) AS edit_dist
      FROM l JOIN r USING (blk)
      WHERE levenshtein(l.s_name, r.c_name) <= 7
    )
    SELECT l.s_suppkey, l.s_name, m.c_custkey, m.c_name, m.edit_dist
    FROM l LEFT JOIN m USING (s_suppkey)
    """,
    tags=("fuzzy", "join", "record-linkage", "left-outer"),
    doc="LEFT-OUTER blocked fuzzy join (joins.fuzzy_join how='left'): "
    "every supplier kept — matched rows refined by levenshtein <= 7, "
    "unmatched suppliers null-extended EXACTLY ONCE (the naive "
    "join(how)+refine spelling silently dropped them: null distance "
    "fails >= 0; fixed round 9 as inner-matches UNION anti-joined "
    "null-extension). Same scale-adaptive block width as "
    "j_fuzzy_match, re-derived from count(*) in both engines; the "
    "oracle replays the two-phase form with a unique-key LEFT JOIN "
    "back onto the blocked-match set",
)
def j_fuzzy_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return joins.fuzzy_join(
        supp,
        cust,
        "s_name",
        "c_name",
        max_dist=7,
        how="left",
    ).select("s_suppkey", "s_name", "c_custkey", "c_name", "edit_dist")


# --- product quantization (e_pq_encode / e_pq_topk) -------------------------

_PQ_CB_CTE = """
    flat AS (
      SELECT label AS cell,
             unnest(range(1, len(embedding) + 1)) AS i,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT cell, CAST((i - 1) // 16 AS INTEGER) AS subspace,
             (i - 1) % 16 AS sp, avg(x) AS v
      FROM flat GROUP BY cell, CAST((i - 1) // 16 AS INTEGER), (i - 1) % 16
    ),
    cb AS (
      SELECT subspace, cell, list(v ORDER BY sp) AS cv
      FROM cent GROUP BY subspace, cell
    ),
    vecd AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    d AS (
      SELECT e.vec_id, c.subspace, c.cell,
             list_sum(list_transform(range(1, 17),
               t -> (e.v[c.subspace * 16 + t] - c.cv[t]) ** 2)) AS dist
      FROM vecd e CROSS JOIN cb c
    ),
    code AS (
      SELECT vec_id, subspace, cell FROM (
        SELECT vec_id, subspace, cell,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY dist ASC, cell ASC) AS rn
        FROM d) WHERE rn = 1
    ),
    codearr AS (
      SELECT vec_id, list(cell ORDER BY subspace) AS pq_code
      FROM code GROUP BY vec_id
    )
"""


@register(
    "e_pq_encode",
    sql=f"""
    WITH {_PQ_CB_CTE}
    SELECT vec_id,
           CAST(len(pq_code) AS INTEGER) AS n_subspaces,
           ('0x' || substr(md5(array_to_string(
              list_transform(pq_code, x -> CAST(x AS VARCHAR)), ',')), 1, 15)
           )::BIGINT AS code_digest
    FROM codearr
    """,
    tags=("similarity", "pq", "quantization"),
    doc="product quantization encode (similarity.train_pq_codebooks + "
    "pq_encode, Jegou et al. 2011): 4 subspaces x 16 dims, per-cell "
    "sub-centroid codebooks from one posexplode pass; encoding is a "
    "MAP-ONLY projection (codebook as expression literals, argmin per "
    "subspace, lowest-cell tiebreak) — 64 floats -> 4 small ints, the "
    "64x memory lever that fits a 100 TB embedding corpus' ANN index "
    "in cluster RAM. The code array (list-typed — the comparison "
    "harness cannot canonicalize lists, r4 finding) is verified through "
    "a per-vector 60-bit md5 digest of its comma-joined form: one "
    "scalar expression per row instead of the r5 posexplode (a Generate "
    "barrier that re-ran the argmin lambdas per emitted row)",
)
def e_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity
    from ..operators.dedup import portable_hash60

    emb = table(spark, sf_dir, "embeddings")
    cbs = similarity.collect_pq_codebooks(
        similarity.train_pq_codebooks(emb, m=4, dim=64)
    )
    return similarity.pq_encode(emb, cbs).select(
        "vec_id",
        F.size("pq_code").alias("n_subspaces"),
        portable_hash60(
            F.array_join(F.col("pq_code").cast("array<string>"), ",")
        ).alias("code_digest"),
    )


@register(
    "e_pq_topk",
    sql=f"""
    WITH {_PQ_CB_CTE},
    q AS (SELECT vec_id AS query_id, v AS qv FROM vecd WHERE vec_id < 5),
    pair AS (
      SELECT ca.vec_id AS neighbor_id, ca.pq_code, q.query_id, q.qv
      FROM codearr ca CROSS JOIN q
      WHERE ca.vec_id <> q.query_id
    ),
    pd AS (
      SELECT p.query_id, p.neighbor_id, c.subspace,
             list_sum(list_transform(range(1, 17),
               t -> (p.qv[c.subspace * 16 + t] - c.cv[t]) ** 2)) AS sd
      FROM pair p JOIN cb c ON c.cell = p.pq_code[c.subspace + 1]
    ),
    dist AS (
      SELECT query_id, neighbor_id,
             round(CAST(sum(sd) AS DOUBLE), 4) AS adc_dist
      FROM pd GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, rank, adc_dist FROM (
      SELECT query_id, neighbor_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist ASC, neighbor_id ASC)
               AS rank
      FROM dist
    ) WHERE rank <= 5
    """,
    tags=("similarity", "pq", "ann"),
    doc="PQ asymmetric-distance top-k (similarity.pq_adc_topk): approx "
    "L2 from each query to ENCODED vectors — per-subspace codebook "
    "lookup summed over 4 subspaces; the corpus side touches only the "
    "4-int code column, never the full vectors. Ranked on the rounded "
    "distance (ulp-stable across engines) with id tiebreak",
)
def e_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    cbs = similarity.collect_pq_codebooks(
        similarity.train_pq_codebooks(emb, m=4, dim=64)
    )
    codes = similarity.pq_encode(emb, cbs).select("vec_id", "pq_code")
    queries = emb.where(F.col("vec_id") < 5)
    out = similarity.pq_adc_topk(codes, queries, cbs, k=5, round_dp=4)
    return out.select("query_id", "neighbor_id", "rank", "adc_dist")


@register(
    "a_trend_ols",
    sql="""
    WITH m AS (
      SELECT l_returnflag AS flag,
             (CAST(year(l_shipdate) AS BIGINT) - 1992) * 12
               + (CAST(month(l_shipdate) AS BIGINT) - 1) AS mi,
             round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2)
               AS rev
      FROM lineitem GROUP BY 1, 2
    )
    SELECT flag, CAST(regr_count(rev, mi) AS BIGINT) AS n,
           round(CAST(regr_slope(rev, mi) AS DOUBLE), 2) AS slope,
           round(CAST(regr_intercept(rev, mi) AS DOUBLE), 2) AS intercept,
           round(CAST(regr_r2(rev, mi) AS DOUBLE), 6) AS r2
    FROM m GROUP BY flag
    """,
    tags=("aggregation", "regression", "trend"),
    doc="per-group OLS time trend (relational.grouped_trend): monthly "
    "revenue per returnflag regressed on the month index — "
    "slope/intercept/r2/n from the built-in REGR_* single-pass moment "
    "aggregates (JVM-side, map-side combined; the panel collapses to "
    "#groups x #months rows BEFORE the regression, so the regression "
    "shuffle is dimension-sized at any corpus scale). The reference "
    "fits the same per-panel time trends in its Stata post-processing",
)
def a_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import grouped_trend

    li = table(spark, sf_dir, "lineitem")
    monthly = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            (
                (F.year("l_shipdate").cast("long") - 1992) * 12
                + (F.month("l_shipdate").cast("long") - 1)
            ).alias("mi"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev")
        )
    )
    out = grouped_trend(monthly, ["flag"], "mi", "rev")
    return out.select(
        "flag",
        "n",
        F.round("slope", 2).alias("slope"),
        F.round("intercept", 2).alias("intercept"),
        F.round("r2", 6).alias("r2"),
    )


@register(
    "t_ngram_chi2",
    sql=f"""
    WITH toks AS (
      SELECT doc_id,
             list_contains({_SQL_TOKS.format(c="text")}, 'spark') AS is_target,
             unnest({_SQL_TOKS.format(c="text")}) AS tok
      FROM documents
    ),
    tot AS (
      SELECT CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS DOUBLE) AS n_t,
             CAST(count(*) AS DOUBLE) AS n_all
      FROM toks
    ),
    cnt AS (
      SELECT tok,
             CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS DOUBLE) AS a,
             CAST(count(*) AS DOUBLE) AS ab
      FROM toks GROUP BY tok
    )
    SELECT tok, CAST(a AS BIGINT) AS c_t, CAST(ab AS BIGINT) AS c_all,
           round(
             n_all * pow(a * (n_all - n_t - (ab - a)) - (ab - a) * (n_t - a), 2)
               / (n_t * (n_all - n_t) * ab * (n_all - ab)),
             4
           ) AS chi2
    FROM cnt, tot
    WHERE a >= 5 AND ab < n_all
    ORDER BY chi2 DESC, tok ASC
    LIMIT 20
    """,
    tags=("text", "chi2", "association"),
    doc="chi-square token association (the statistically-grounded sibling "
    "of f7's lift, same active-learning keyword-discovery role as "
    "count_kskipngrams.py): per token the 2x2 chi2 of occurrence in "
    "target-doc tokens vs the rest — two aggregates over one token "
    "explode, totals broadcast back; integer-count inputs make the "
    "double formula engine-portable",
)
def t_ngram_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = tokenized_documents(spark, sf_dir)
    toks = td.select(
        F.array_contains(F.col("toks"), "spark").alias("is_target"),
        F.explode("toks").alias("tok"),
    )
    toks = scoped_cache(toks)
    tot = toks.agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("double")
        .alias("n_t"),
        F.count(F.lit(1)).cast("double").alias("n_all"),
    )
    cnt = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("double")
        .alias("a"),
        F.count(F.lit(1)).cast("double").alias("ab"),
    )
    a, ab, n_t, n_all = F.col("a"), F.col("ab"), F.col("n_t"), F.col("n_all")
    chi2 = (
        n_all
        * F.pow(a * (n_all - n_t - (ab - a)) - (ab - a) * (n_t - a), 2)
        / (n_t * (n_all - n_t) * ab * (n_all - ab))
    )
    return (
        cnt.where(a >= 5)
        .crossJoin(F.broadcast(tot))
        .where(ab < n_all)
        .select(
            "tok",
            a.cast("long").alias("c_t"),
            ab.cast("long").alias("c_all"),
            F.round(chi2, 4).alias("chi2"),
        )
        .orderBy(F.col("chi2").desc(), F.col("tok").asc())
        .limit(20)
    )


@register(
    "g_funnel",
    sql="""
    WITH u1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    u2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN u1 ON e.user_id = u1.user_id
      WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1
    ),
    u3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN u2 ON e.user_id = u2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1
    )
    SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
           CAST((SELECT count(*) FROM u1) AS BIGINT) AS n_users
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click',
           CAST((SELECT count(*) FROM u2) AS BIGINT)
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase',
           CAST((SELECT count(*) FROM u3) AS BIGINT)
    """,
    tags=("sequence", "funnel"),
    doc="ordered-funnel conversion (sequence.funnel): users reaching "
    "view -> click -> purchase with each step STRICTLY after the "
    "previous — per-user history collapses to one sorted array in a "
    "single shuffle, step times are pure filter+array_min expressions "
    "(no per-user Python, no join chain); the oracle replays the same "
    "semantics as sequential min-after joins",
)
def g_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import funnel

    ev = table(spark, sf_dir, "events")
    return funnel(ev, ["view", "click", "purchase"])


@register(
    "g_transitions",
    sql="""
    WITH p AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 9) AS p
    FROM c
    """,
    tags=("sequence", "markov"),
    doc="first-order Markov transition matrix (sequence.transitions): "
    "(from, to, n, p) over per-user event streams under a total (ts, "
    "event_id) order — one keyed window shuffle + one #types^2-row "
    "aggregate; the sequence-modeling prep for any interaction log",
)
def g_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import transitions

    ev = table(spark, sf_dir, "events")
    out = transitions(ev, order_cols=["ts", "event_id"])
    return out.select("from_type", "to_type", "n", F.round("p", 9).alias("p"))


@register(
    "e_prototypes",
    sql="""
    WITH flat AS (
      SELECT label,
             unnest(range(1, len(embedding) + 1)) AS i,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT label, i, avg(x) AS v FROM flat GROUP BY label, i
    ),
    cv AS (
      SELECT label, list(v ORDER BY i) AS cv FROM cent GROUP BY label
    ),
    n AS (
      SELECT label, cv,
             sqrt(list_sum(list_transform(cv, x -> x * x))) AS nrm
      FROM cv
    )
    SELECT label,
           CAST(unnest(range(1, len(cv) + 1)) - 1 AS INTEGER) AS dim,
           unnest(list_transform(
             CASE WHEN nrm > 0
                  THEN list_transform(cv, x -> x / nrm) ELSE cv END,
             x -> round(x, 9)
           )) AS value
    FROM n
    """,
    tags=("similarity", "prototype", "embedding"),
    doc="per-label L2-normalized mean embedding "
    "(similarity.class_prototypes) — the nearest-centroid-classifier / "
    "query-by-class vector: one posexplode pass + two dimension-bounded "
    "aggregates; rounded per component so cross-engine avg summation "
    "order cannot flip the hash. Emitted as exploded (label, dim, value) "
    "rows — the array form is list-typed, which the comparison harness "
    "cannot canonicalize (r4 finding)",
)
def e_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import class_prototypes

    emb = table(spark, sf_dir, "embeddings")
    out = class_prototypes(emb, "label")
    return out.select(
        "label",
        F.posexplode(
            F.transform(F.col("prototype"), lambda x: F.round(x, 9))
        ).alias("dim", "value"),
    )


# --- a_cm_heavy_hitters ------------------------------------------------------

_CM_D, _CM_W = 4, 256
_CM_I = "[" + ", ".join(str(i) for i in range(_CM_D)) + "]"
# ONE md5 per key; the depth row-hashes are disjoint 8-bit slices —
# identical shift/mask arithmetic to relational._cm_cells.
_CM_HASH = (
    "((('0x' || substr(md5('cm:' || CAST({k} AS VARCHAR)), 1, 15))::BIGINT "
    ">> (8 * {i})) % " + str(_CM_W) + ")"
)


@register(
    "a_cm_heavy_hitters",
    sql=f"""
    WITH probes AS (
      SELECT ii.i,
             {_CM_HASH.format(i="ii.i", k="l.l_suppkey")} AS bucket
      FROM lineitem l CROSS JOIN (SELECT unnest({_CM_I}) AS i) ii
    ),
    cells AS (
      SELECT i, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM probes GROUP BY 1, 2
    ),
    exact AS (
      SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM lineitem GROUP BY 1
      ORDER BY exact_cnt DESC, suppkey ASC LIMIT 10
    ),
    est AS (
      SELECT e.suppkey, min(c.cnt) AS cm_est
      FROM exact e
      CROSS JOIN (SELECT unnest({_CM_I}) AS i) ii
      JOIN cells c
        ON c.i = ii.i
       AND c.bucket = {_CM_HASH.format(i="ii.i", k="e.suppkey")}
      GROUP BY 1
    )
    SELECT e.suppkey, e.exact_cnt, est.cm_est
    FROM exact e JOIN est USING (suppkey)
    """,
    tags=("sketch", "count-min"),
    doc="count-min sketch heavy hitters (relational.cm_sketch/cm_estimate, "
    "d=4 w=256): per-item frequency estimates from a mergeable "
    "depth x width cell table — the frequency member of the sketch "
    "family (HLL=distinct, Theta=set ops, KLL=quantiles); est >= exact "
    "by construction, the oracle replays every hash cell",
)
def a_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import cm_estimate, cm_sketch

    li = table(spark, sf_dir, "lineitem")
    sketch = cm_sketch(li, "l_suppkey", depth=_CM_D, width=_CM_W)
    exact = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("suppkey").asc())
        .limit(10)
    )
    est = cm_estimate(sketch, exact, "suppkey", depth=_CM_D, width=_CM_W)
    return exact.join(est, "suppkey").select(
        "suppkey", "exact_cnt", F.col("cm_est")
    )


# --- e_kmeans_lloyd ----------------------------------------------------------


def _kmeans_blocks(k: int = 4, n_iter: int = 3, dp: int = 6) -> str:
    """The unrolled Lloyd CTE chain (vecd/comp/centarr0..centarr{n}) —
    shared by the k-means oracle and the kmeans-trained IVF oracle."""
    m = 10 ** dp
    hashexpr = "(CAST(vec_id AS HUGEINT) * 2654435761) % 4294967296"
    blocks = [
        f"""
    vecd AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    comp AS (
      SELECT vec_id, unnest(range(1, len(v) + 1)) - 1 AS pos, unnest(v) AS x
      FROM vecd
    ),
    centarr0 AS (
      SELECT row_number() OVER (ORDER BY {hashexpr}, vec_id) - 1
               AS cluster_id,
             v AS cv
      FROM vecd ORDER BY {hashexpr}, vec_id LIMIT {k}
    )"""
    ]
    for i in range(1, n_iter + 1):
        blocks.append(
            f"""
    d{i} AS (
      SELECT t.vec_id, c.cluster_id,
             list_sum(list_transform(range(1, len(t.v) + 1),
               j -> (t.v[j] - c.cv[j]) * (t.v[j] - c.cv[j]))) AS dist
      FROM vecd t CROSS JOIN centarr{i - 1} c
    ),
    a{i} AS (
      SELECT vec_id, cluster_id FROM (
        SELECT vec_id, cluster_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cluster_id ASC) AS rn
        FROM d{i}) WHERE rn = 1
    ),
    upd{i} AS (
      SELECT a.cluster_id, c.pos,
             floor(avg(c.x) * {m} + 0.5) / {m} AS cv
      FROM a{i} a JOIN comp c USING (vec_id)
      GROUP BY a.cluster_id, c.pos
    ),
    centarr{i} AS (
      SELECT p.cluster_id,
             CASE WHEN u.cluster_id IS NULL THEN p.cv ELSE u.cva END AS cv
      FROM centarr{i - 1} p
      LEFT JOIN (
        SELECT cluster_id, list(cv ORDER BY pos) AS cva
        FROM upd{i} GROUP BY cluster_id) u
      ON u.cluster_id = p.cluster_id
    )"""
        )
    return ",".join(blocks)


def _kmeans_sql(k: int = 4, n_iter: int = 3, dp: int = 6) -> str:
    """Exact unrolled-CTE oracle for Lloyd's k-means (the pagerank/BPE
    discipline: a fixed-iteration distributed algorithm replayed as
    declarative SQL). Distances use ORDERED list folds (list_sum over
    list_transform — the same sequential component order as the engine's
    zip_with+aggregate), and every UPDATED centroid component is pinned
    to floor(avg·10^dp + 0.5)/10^dp in both engines, so per-iteration
    summation-order differences cannot compound."""
    return f"""
    WITH {_kmeans_blocks(k, n_iter, dp)}
    SELECT vec_id, CAST(cluster_id AS INTEGER) AS cluster_id FROM (
      SELECT t.vec_id, c.cluster_id,
             row_number() OVER (PARTITION BY t.vec_id ORDER BY
               list_sum(list_transform(range(1, len(t.v) + 1),
                 j -> (t.v[j] - c.cv[j]) * (t.v[j] - c.cv[j]))) ASC,
               c.cluster_id ASC) AS rn
      FROM vecd t CROSS JOIN centarr{n_iter} c
    ) WHERE rn = 1
    """


@register(
    "e_kmeans_lloyd",
    sql=_kmeans_sql(),
    tags=("similarity", "clustering", "iterative"),
    doc="distributed Lloyd k-means (clustering.kmeans): k=4, 3 fixed "
    "iterations over the embedding corpus. Deterministic init (k "
    "smallest multiplicative-hash keys), assignment is a MAP-ONLY "
    "projection per iteration (centroids ride in as expression "
    "literals — the same plan shape as IVF assign / PQ encode), the "
    "update is one posexplode + (cluster x dim)-sized map-side-combined "
    "aggregate; nothing corpus-sized is ever collected or broadcast. "
    "The oracle replays all 3 iterations as unrolled CTEs with the "
    "float trajectory pinned per iteration (floor(avg*1e6+0.5)/1e6 in "
    "both engines) — an iterative Spark algorithm with an exact "
    "declarative oracle, like g_pagerank and t_bpe_merges",
)
def e_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans

    emb = table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(
        emb, k=4, max_iter=3, tol=0.0, round_dp=6
    )
    return assigned.select("vec_id", "cluster_id")


@register(
    "e_ivf_kmeans_topk",
    sql=f"""
    WITH {_kmeans_blocks()},
    cvec AS (SELECT cluster_id AS cell, cv FROM centarr3),
    kdists AS (
      SELECT e.vec_id, e.v, c.cell,
             list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
      FROM vecd e CROSS JOIN cvec c
    ),
    kassign AS (
      SELECT vec_id AS neighbor_id, v, cell FROM (
        SELECT vec_id, v, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cell ASC) AS rn
        FROM kdists) WHERE rn = 1
    ),
    kqprobe AS (
      SELECT vec_id AS query_id, v AS qv, cell FROM (
        SELECT vec_id, v, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist ASC, cell ASC) AS rn
        FROM kdists WHERE vec_id < 5) WHERE rn <= 2
    ),
    kscored AS (
      SELECT q.query_id, a.neighbor_id,
             list_dot_product(q.qv, a.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(a.v, a.v))) AS cos
      FROM kqprobe q JOIN kassign a ON a.cell = q.cell
      WHERE a.neighbor_id != q.query_id
    )
    SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos
    FROM (SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM kscored)
    WHERE rank <= 5
    """,
    tags=("similarity", "ann-ivf", "clustering", "composition"),
    doc="the full production ANN story as ONE oracle-exact lineage: "
    "k-means TRAINS the codebook (clustering.kmeans, 3 Lloyd "
    "iterations, trajectory-pinned), IVF indexes the corpus against it "
    "and searches nprobe=2 cells (similarity.ivf_topk with an explicit "
    "centroid frame — the train-offline/search-online regime, vs "
    "e_ivf_topk's label-mean codebook). Train, index and search all "
    "replay declaratively: the oracle chains the unrolled Lloyd CTEs "
    "into the IVF assignment/probe/score CTEs",
)
def e_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity
    from ..operators.clustering import kmeans

    emb = table(spark, sf_dir, "embeddings")
    _, cents = kmeans(emb, k=4, max_iter=3, tol=0.0, round_dp=6)
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "label int, cv array<double>",
    )
    out = similarity.ivf_topk(
        emb, emb.where(F.col("vec_id") < 5), k=5, nprobe=2, centroids=cent_df
    )
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos")
    )


@register(
    "g_time_to_convert",
    sql="""
    WITH c AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, c.t0, min(e.ts) AS t1
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t0
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id, c.t0
    ),
    d AS (
      SELECT user_id,
             CAST(floor(epoch(t1)) AS BIGINT)
               - CAST(floor(epoch(t0)) AS BIGINT) AS delta_s
      FROM p
    ),
    nn AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(delta_s) AS BIGINT) AS s
      FROM d
    ),
    r AS (
      SELECT delta_s,
             row_number() OVER (ORDER BY delta_s, user_id) AS rk
      FROM d
    )
    SELECT nn.n AS n_converted,
           round(CAST(nn.s AS DOUBLE) / nn.n, 4) AS mean_s,
           (SELECT delta_s FROM r, nn
             WHERE rk = greatest(1, CAST(ceil(0.5 * nn.n) AS BIGINT)))
             AS q50_s,
           (SELECT delta_s FROM r, nn
             WHERE rk = greatest(1, CAST(ceil(0.9 * nn.n) AS BIGINT)))
             AS q90_s
    FROM nn
    """,
    tags=("sequence", "funnel", "latency"),
    doc="time-to-convert distribution (sequence.conversion_latency) — "
    "the latency companion to g_funnel: per user, whole seconds from "
    "first click to the first strictly-later purchase; mean + EXACT "
    "type-1 p50/p90 order statistics at rank ceil(q*n) via the "
    "scalable range-shuffle global_rank (percentile_approx cannot "
    "hash-match an oracle). Two user-keyed min-aggregates + one "
    "users-sized rank; event-type filters prune both scans",
)
def g_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import conversion_latency

    ev = table(spark, sf_dir, "events")
    return conversion_latency(ev, "click", "purchase")


@register(
    "a_grouping_sets",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
    tags=("grouping-sets", "A4"),
    doc="explicit GROUPING SETS (cube/rollup's general form — only the "
    "levels a report actually needs, one Expand+aggregate pass instead "
    "of the 2^k cube) with grouping_id() disambiguating real NULL keys "
    "from subtotal rows. Revenue accumulates in exact integer cents "
    "(the TPC-H discipline): float round(sum) diverged between engines "
    "at 8e-15 relative on the 100x grand-total row",
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).cast("double")
            / 100.0
        ).alias("total"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n", "total")


# HLL guarantee margin: published RSE for lg_k=16 is 1.04/sqrt(2^16) =
# 0.41%. 3 sigma is NOT a guarantee — ~99.7% per window, so a fixture
# with hundreds of estimating-regime windows could legitimately exceed
# it and flip the hash (ADVICE r8). 6 sigma (2.44%) puts the per-window
# miss probability below ~1e-9 — residual failure odds are negligible
# across any realistic window count — while a broken sketch union still
# errs by ORDERS OF MAGNITUDE and trips the bound unambiguously.
# (Sparse-regime windows are exactly 0 error; the 10x fixture's
# estimating-regime windows measured -0.28%, well inside either margin.)
_HLL_SLIDING_EPS = 6 * 1.04 / (2 ** 16) ** 0.5


@register(
    "a_hll_sliding",
    sql="""
    WITH e AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM e)
    SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS exact_distinct,
           1 AS within_bound
    FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
    tags=("sketch", "rollup", "sliding-window"),
    doc="trailing 7-day sliding distinct users via mergeable HLL "
    "sketches (relational.hll_sliding_distinct): one daily-sketch pass, "
    "KB-sized sketches fan out to their windows and union per day — "
    "exact countDistinct would replicate every raw row window_days "
    "times through the shuffle. Oracled on the GUARANTEE, the same "
    "pattern as a_kll_quantiles: a sketch estimate leaves the sparse-"
    "EXACT regime at scale (measured -0.28%% at the 10x fixture's "
    "15k-unique windows), so the hashed columns are the engine's own "
    "exact per-window distinct (recomputed alongside, the expensive "
    "plan the sketch exists to avoid — verification only) plus "
    "within_bound = |estimate - exact| <= 6*RSE*exact, compared against "
    "the oracle's exact count and literal TRUE — a broken union (orders-"
    "of-magnitude error) flips the boolean and fails the hash AT ANY "
    "SCALE, no waiver; at 6 sigma the legitimate-estimate miss odds are "
    "<1e-9/window. NOTE: the timed wall of this entry includes the "
    "exact-countDistinct verification plan the sketch exists to avoid — "
    "it measures the guarantee check, not sketch throughput (the sketch-"
    "only plan is hll_sliding_distinct itself)",
)
def a_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import hll_sliding_distinct

    ev = table(spark, sf_dir, "events")
    est = hll_sliding_distinct(ev, "ts", "user_id", window_days=7, lg_k=16)
    e = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    )
    # Exact verify arm. countDistinct(user) over a window depends only on
    # the DISTINCT (day, user) pairs, so collapse the raw events first
    # (map-side combinable), then fan each pair out to its <= 7
    # containing window days ARITHMETICALLY (day + 0..6) instead of a
    # range join — the range predicate planned a BroadcastNestedLoopJoin
    # evaluating |days| x |events| conditions and fed 7x|events| rows
    # into the distinct aggregate. A window day exists in the output iff
    # it is an observed event day (it always matches itself at i=0), so
    # the semi-join against the distinct-days frame reproduces the day
    # set exactly.
    pairs = e.distinct()
    days = e.select("day").distinct()
    exact = (
        pairs.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("__i"),
            "day",
        )
        .select(F.date_add("day", F.col("__i")).alias("day"), "user_id")
        .join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return exact.join(est, "day").select(
        "day",
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= F.lit(_HLL_SLIDING_EPS) * F.col("exact_distinct")
        )
        .cast("int")
        .alias("within_bound"),
    )


@register(
    "j_overlap_join",
    sql="""
    WITH l AS (
      SELECT user_id, event_id AS l_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ls,
             CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(floor(value * 10) AS BIGINT) * 600 + 600 AS le
      FROM events WHERE event_id % 10 = 0
    ),
    r AS (
      SELECT user_id, event_id AS r_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS rs,
             CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(floor(value * 7) AS BIGINT) * 300 + 300 AS re
      FROM events WHERE event_id % 7 = 0
    )
    SELECT l.l_id, count(*) AS n_overlaps,
           CAST(sum(least(l.le, r.re) - greatest(l.ls, r.rs)) AS BIGINT)
             AS overlap_s
    FROM l JOIN r
      ON l.user_id = r.user_id AND l.ls < r.re AND r.rs < l.le
    GROUP BY l.l_id
    """,
    tags=("join", "interval-overlap", "temporal"),
    doc="interval-overlap join (joins.interval_overlap_join — the "
    "temporal-DB / genomics intersect): both sides explode to covered "
    "buckets, equi-join on (user, bucket), exact half-open refine, each "
    "pair emitted exactly once via the first-shared-bucket filter (no "
    "distinct pass) — never the BroadcastNestedLoop a raw range "
    "predicate plans; per-pair overlap seconds aggregated per left "
    "interval. Oracle is the quadratic range join",
)
def j_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import interval_overlap_join

    ev = table(spark, sf_dir, "events")
    t = epoch_seconds("ts")
    left = ev.where(F.col("event_id") % 10 == 0).select(
        "user_id",
        F.col("event_id").alias("l_id"),
        t.alias("ls"),
        (t + F.floor(F.col("value") * 10).cast("long") * 600 + 600).alias("le"),
    )
    right = ev.where(F.col("event_id") % 7 == 0).select(
        "user_id",
        F.col("event_id").alias("r_id"),
        t.alias("rs"),
        (t + F.floor(F.col("value") * 7).cast("long") * 300 + 300).alias("re"),
    )
    joined = interval_overlap_join(
        left, right, keys=["user_id"], l_start="ls", l_end="le",
        r_start="rs", r_end="re", bucket_width=1800,
    )
    return joined.groupBy("l_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum(
            F.least(F.col("le"), F.col("re"))
            - F.greatest(F.col("ls"), F.col("rs"))
        ).alias("overlap_s"),
    )
