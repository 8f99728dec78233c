"""End-to-end pipeline tests on constructed fixtures with known answers.

Mirrors the reference's validation strategy (SURVEY.md §5): synthetic
users with planted home/work patterns, planted duplicate tweets, planted
sentiment words — assert the pipelines recover exactly what was planted.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


# --- mobility ----------------------------------------------------------------


@pytest.fixture(scope="module")
def pings(spark):
    """Two users, 14 days. u1: home venue nightly (21:00-06:00), work
    venue weekdays (09:00-16:00). u2: home only. Plus noise pings that
    fail the accuracy filter."""
    rows = []
    day0 = 1_600_000_000 - (1_600_000_000 % 86400)  # midnight boundary
    home = (10.0000, 20.0000)
    work = (10.0100, 20.0100)  # ~1.5 km away
    home2 = (-5.0000, 30.0000)
    for d in range(14):
        base = day0 + d * 86400
        # u1 home: pings every 10 min, 21:00-23:00 (stop ~2h)
        for i in range(13):
            rows.append(("u1", home[0], home[1], 10.0, base + 21 * 3600 + i * 600))
        # u1 work on weekdays (day0 is a Sunday iff ...; use d%7 in (1..5))
        if d % 7 in (1, 2, 3, 4, 5):
            for i in range(13):
                rows.append(
                    ("u1", work[0], work[1], 10.0, base + 10 * 3600 + i * 600)
                )
        # u2 home nightly
        for i in range(13):
            rows.append(("u2", home2[0], home2[1], 15.0, base + 22 * 3600 + i * 600))
        # noise: bad accuracy
        rows.append(("u1", 50.0, 50.0, 5000.0, base + 12 * 3600))
    return spark.createDataFrame(
        rows, schema="user_id string, lat double, lon double, accuracy double, timestamp long"
    )


def test_mobility_pipeline(spark, pings, tmp_path):
    from sdg_big_data_spark.pipelines import mobility

    admin = spark.createDataFrame(
        [
            ("zone_home", "POLYGON ((19.99 9.99, 20.01 9.99, 20.01 10.005, 19.99 10.005, 19.99 9.99))"),
            ("zone_work", "POLYGON ((20.005 10.005, 20.02 10.005, 20.02 10.02, 20.005 10.02, 20.005 10.005))"),
        ],
        schema="geom_id string, geometry string",
    )
    out = mobility.run(pings, admin=None)

    stops = out["stops"].collect()
    assert len(stops) > 0
    # all stops belong to the two users; noise pings filtered
    assert {r["user_id"] for r in stops} <= {"u1", "u2"}

    labeled = out["labeled"]
    lab = {
        (r["user_id"], r["cluster_label"]): r["location_type"]
        for r in labeled.select("user_id", "cluster_label", "location_type")
        .distinct()
        .collect()
    }
    # u1: the night cluster is H; the weekday-daytime cluster is W
    u1_types = {v for (u, _), v in lab.items() if u == "u1"}
    assert "H" in u1_types and "W" in u1_types
    # u2 has only a home
    u2_types = {v for (u, _), v in lab.items() if u == "u2"}
    assert u2_types == {"H"}

    durations = out["durations"]
    row = (
        durations.where((F.col("user_id") == "u1") & (F.col("day_night") == "night"))
        .agg(F.sum("H").alias("h"))
        .collect()[0]
    )
    assert row["h"] > 0  # night hours land in the H column

    # geocoded variant: stops join to the right zones
    geo = mobility.geocode_stops(out["stops_daily"], admin)
    zones = {
        (r["user_id"], r["geom_id"])
        for r in geo.select("user_id", "geom_id").distinct().collect()
    }
    assert ("u1", "zone_home") in zones
    assert ("u1", "zone_work") in zones
    assert all(u != "u2" for u, _ in zones)  # u2 is outside both polygons


def test_day_split_preserves_duration(spark):
    """Property (SURVEY.md §5.2): day-splitting preserves total duration."""
    from sdg_big_data_spark.pipelines.mobility import day_split_stops

    stops = spark.createDataFrame(
        [
            ("u", 1_600_000_000, 1_600_000_000 + 300),        # within one day
            ("u", 1_600_038_000, 1_600_038_000 + 200_000),    # spans 3 days
        ],
        schema="user_id string, t_start long, t_end long",
    )
    split = day_split_stops(stops)
    total = split.agg(F.sum("duration")).collect()[0][0]
    orig = stops.select(F.sum(F.col("t_end") - F.col("t_start"))).collect()[0][0]
    assert total == orig


# --- labor -------------------------------------------------------------------


@pytest.fixture(scope="module")
def tweets(spark):
    rows = []
    ts0 = dt.datetime(2021, 1, 15)
    texts = [
        "I just got hired at the new plant",
        "lost my job today, looking for work",
        "searching for a job in retail",
        "RT please ignore this retweet",
        "nothing to see here",
    ]
    for i in range(200):
        t = texts[i % len(texts)]
        rows.append(
            (
                i,
                f"user_{i % 40}",
                t if i % 10 else t + " http://x.co/abc",  # URL variants dedup together
                "en",
                ts0 + dt.timedelta(days=i % 60),
            )
        )
    return spark.createDataFrame(
        rows,
        schema="tweet_id long, user_id string, text string, tweet_lang string, created_at timestamp",
    )


def test_labor_pipeline(tweets):
    from sdg_big_data_spark.pipelines import labor

    out = labor.run(
        tweets,
        classes=["is_hired_1mo", "lost_job_1mo"],
        ngrams=[r"\bhired\b", r"lost my job", r"\bjob\b"],
        cutoff=0.5,
        lang="en",
    )
    corpus = out["corpus"]
    # RT rows dropped; URL variants deduped to one row per normalized text
    texts = [r["text_norm"] for r in corpus.select("text_norm").collect()]
    assert len(texts) == len(set(texts))
    assert not any("retweet" in t for t in texts)

    labeling = out["labeling_sets"].collect()
    assert {r["ngram"] for r in labeling} == {r"\bhired\b", r"lost my job", r"\bjob\b"}
    # every sampled row actually matches its pattern
    for r in labeling:
        import re

        assert re.search(r["ngram"], r["text_norm"])

    ind = out["indicator"].collect()
    assert all(r["n_users"] <= r["n_users_total"] for r in ind)
    assert all(0 <= r["pct_users"] <= 100 for r in ind)


def test_labor_rank_eval(tweets):
    from sdg_big_data_spark.pipelines import labor

    corpus = labor.build_corpus(tweets, lang="en")
    scored = labor.score_corpus(corpus, ["is_hired_1mo"])
    picks = labor.rank_eval_sample(scored, "is_hired_1mo", ranks=[1, 2, 4])
    got = sorted(r["rank"] for r in picks.collect())
    assert got == [1, 2, 4]


# --- news --------------------------------------------------------------------


@pytest.fixture(scope="module")
def articles(spark):
    rows = []
    d0 = dt.datetime(2019, 1, 1)
    for i in range(120):
        day = d0 + dt.timedelta(days=i % 30)
        if i % 3 == 0:
            txt = "growth is strong and markets improve, a good gain"
            tags = ["US"]
        elif i % 3 == 1:
            txt = "crisis deepens, fear of decline and heavy loss"
            tags = ["BR"]
        else:
            txt = "the committee met on tuesday"
            tags = ["US", "BR"]
        rows.append((f"an_{i}", day, tags, txt))
    return spark.createDataFrame(
        rows, schema="an string, date timestamp, regions array<string>, full_text string"
    )


def test_news_pipeline(articles):
    from sdg_big_data_spark.pipelines import news

    out = news.run(articles)
    scored = out["scored"].collect()
    pos = [r for r in scored if "growth" in r["full_text"]]
    neg = [r for r in scored if "crisis" in r["full_text"]]
    assert all(r["sentiment"] > 0 for r in pos)
    assert all(r["sentiment"] < 0 for r in neg)

    panel = out["panel"].collect()
    assert {r["country"] for r in panel} == {"US", "BR"}
    us = [r for r in panel if r["country"] == "US"]
    br = [r for r in panel if r["country"] == "BR"]
    assert sum(r["sentiment_mean"] for r in us) > 0
    assert sum(r["sentiment_mean"] for r in br) < 0

    gf = out["global_factor"]
    assert len(gf) == 30  # one row per day
    assert gf["factor"].notna().all()


def test_mobility_tz_offset(spark):
    from sdg_big_data_spark.pipelines.mobility import apply_tz_offset

    pings = spark.createDataFrame(
        [("u", 10.5, 20.5, 5.0, 1_600_000_000), ("u", -3.2, 150.8, 5.0, 1_600_000_000)],
        schema="user_id string, lat double, lon double, accuracy double, timestamp long",
    )
    tz = spark.createDataFrame(
        [("10:20", 3600), ("-4:150", 36000)], schema="cell string, utc_offset_s long"
    )
    out = {(r["lat"], r["utc_offset_s"], r["local_timestamp"])
           for r in apply_tz_offset(pings, tz).collect()}
    assert (10.5, 3600, 1_600_003_600) in out
    assert (-3.2, 36000, 1_600_036_000) in out


def test_labor_active_learning_helpers(spark):
    from sdg_big_data_spark.pipelines import labor

    scored = spark.createDataFrame(
        [(i, i / 100.0) for i in range(100)],
        schema="tweet_id long, is_hired_1mo double",
    )
    labeled = spark.createDataFrame(
        [(99,), (98,), (97,)], schema="tweet_id long"
    )
    top = labor.peel_retrieval(scored, labeled, "is_hired_1mo", k=5)
    got_ids = {r["tweet_id"] for r in top.collect()}
    # top-5 after peeling the already-labeled top-3
    assert got_ids == {96, 95, 94, 93, 92}

    unc = labor.uncertainty_sample(scored, "is_hired_1mo", k_per_side=3)
    # 3 nearest below 0.5 (47,48,49) and 3 at/above (50,51,52)
    assert {r["tweet_id"] for r in unc.collect()} == {47, 48, 49, 50, 51, 52}


def test_dataprep_pipeline(spark):
    """Planted corpus: junk docs fail the quality gate, Spanish docs fail
    the language gate, exact copies and near-copies get deduped, and the
    budget reflects only survivors."""
    from sdg_big_data_spark.pipelines import dataprep

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to find some food for the long cold winter that is coming soon"
    )
    near = base.replace("cold winter", "cold dark winter")
    rows = [
        (1, base, "web"),
        (2, base + " http://x.co/z", "web"),       # exact dup after normalize
        (3, near, "web"),                           # near dup (high jaccard)
        (4, "el gato y el perro con la casa de los padres para que es una "
            "historia larga con muchas palabras y frases que continuan", "web"),
        (5, "!!!! ???? ....", "junk"),              # fails quality
        (6, "the sun is bright and the sky is blue with many white clouds "
            "floating slowly over the hills and the green fields below", "web"),
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string, source string")
    out = dataprep.run(docs, min_quality=0.6, jaccard_threshold=0.5)

    assert {r["doc_id"] for r in out["quality"].select("doc_id").collect()} == {1, 2, 3, 4, 6}
    assert {r["doc_id"] for r in out["language"].select("doc_id").collect()} == {1, 2, 3, 6}
    assert {r["doc_id"] for r in out["exact_dedup"].select("doc_id").collect()} == {1, 3, 6}
    assert {r["doc_id"] for r in out["near_dedup"].select("doc_id").collect()} == {1, 6}
    budget = out["budget"].collect()
    assert len(budget) == 1 and budget[0]["n_docs"] == 2


def test_dataprep_checkpointed_resumes(spark, sf_dir, tmp_path):
    import os

    from sdg_big_data_spark.cachescope import cache_scope
    from sdg_big_data_spark.pipelines import dataprep
    from sdg_big_data_spark.plans.catalog import table

    docs = table(spark, sf_dir, "documents").limit(200)
    wd = str(tmp_path / "prep")
    with cache_scope(blocking=True):
        first = dataprep.run_checkpointed(docs, wd)
        survivors1 = {r["doc_id"] for r in first["near_dedup"].select("doc_id").collect()}

    # stage files exist with success markers
    for st in ("s1_quality", "s2_language", "s3_exact_dedup", "s4_near_dedup"):
        assert os.path.exists(os.path.join(wd, st, "_SUCCESS"))

    # drop the LAST stage; re-run must rebuild only it (earlier stage
    # files untouched -> same mtime) and reproduce identical survivors
    import shutil

    mtimes = {
        st: os.path.getmtime(os.path.join(wd, st, "_SUCCESS"))
        for st in ("s1_quality", "s2_language", "s3_exact_dedup")
    }
    shutil.rmtree(os.path.join(wd, "s4_near_dedup"))
    with cache_scope(blocking=True):
        second = dataprep.run_checkpointed(docs, wd)
        survivors2 = {r["doc_id"] for r in second["near_dedup"].select("doc_id").collect()}
    assert survivors2 == survivors1
    for st, m in mtimes.items():
        assert os.path.getmtime(os.path.join(wd, st, "_SUCCESS")) == m, st


def test_dataprep_survival_report_matches_run(spark, sf_dir):
    """survival_report (single-lineage flag/conditional-agg audit) must
    equal the per-stage counts of run()'s materialized stage frames —
    the two formulations of the same ladder may never drift."""
    from pyspark.sql import functions as F

    from sdg_big_data_spark.functions import text
    from sdg_big_data_spark.pipelines import dataprep
    from sdg_big_data_spark.plans.catalog import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    report = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in dataprep.survival_report(docs, min_quality=0.6).collect()
    }
    stages = dataprep.run(docs, min_quality=0.6, cache_stages=True)

    def stat(df):
        row = df.agg(
            F.count(F.lit(1)).cast("long").alias("d"),
            F.coalesce(
                F.sum(F.size(text.tokenize(F.col("text")))), F.lit(0)
            ).cast("long").alias("t"),
        ).collect()[0]
        return (row["d"], row["t"])

    assert report["0_input"] == stat(docs)
    assert report["1_quality"] == stat(stages["quality"])
    assert report["2_language"] == stat(stages["language"])
    assert report["3_exact_dedup"] == stat(stages["exact_dedup"])
    assert report["4_near_dedup"] == stat(stages["near_dedup"])


def test_mobility_e2e_matches_stagewise(spark, sf_dir):
    """m_mobility_e2e (the one-lineage survival report of the composed
    GPS DAG) must equal the counts/metrics of the stages built
    independently through the pipelines.mobility functions — the
    composed catalog entry and the pipeline module may never drift."""
    from pyspark.sql import functions as F

    from sdg_big_data_spark.operators import grouped
    from sdg_big_data_spark.pipelines import mobility
    from sdg_big_data_spark.plans import mobility_queries as mq

    report = {
        r["stage"]: (r["n_rows"], r["metric"])
        for r in mq.m_mobility_e2e(spark, sf_dir).collect()
    }
    assert set(report) == {
        "0_pings", "1_stops", "2_day_segments", "3_geocoded",
        "4_labeled", "5_panel", "6_stay_home",
    }

    pings = mq._pings_anchored(spark, sf_dir)
    stops = grouped.detect_stops_batched(pings)
    daily = mobility.day_split_stops(stops)
    admin = spark.createDataFrame(
        [(g, mq._diamond_wkt(la, lo, r)) for g, la, lo, r in mq._admin_sites()],
        schema="geom_id string, geometry string",
    )
    geo = mobility.geocode_stops(daily, admin, cell_deg=0.01)
    labeled = mobility.label_stops(geo)
    panel = mobility.durations_panel(labeled)
    stay = mobility.stay_at_home_index(
        panel, baseline_end=mq._BASELINE_END, min_home_s=900
    )

    assert report["0_pings"][0] == pings.count()
    assert report["1_stops"][0] == stops.count()
    assert report["2_day_segments"][0] == daily.count()
    assert report["3_geocoded"][0] == geo.count()
    assert report["4_labeled"][0] == labeled.count()
    assert report["5_panel"][0] == panel.count()
    assert report["6_stay_home"][0] == stay.count()

    # F1 seam invariant: the midnight split preserves total dwell
    assert report["1_stops"][1] == report["2_day_segments"][1]
    # labeling is a 1:1 decoration of the geocoded frame
    assert report["3_geocoded"][0] == report["4_labeled"][0]
    # pivot seam: panel H-seconds equal the labeled frame's H-seconds
    assert report["4_labeled"][1] == report["5_panel"][1]
    # geocode is a survivorship filter, never a row multiplier
    assert report["3_geocoded"][0] <= report["2_day_segments"][0]


def test_mobility_e2e_polygon_join_is_broadcast(spark, sf_dir):
    """The geocode stage's coarse cell join must broadcast the
    dimension-sized polygon cover — never shuffle or cross-join the
    segment side."""
    from sdg_big_data_spark.pipelines import mobility
    from sdg_big_data_spark.plans import mobility_queries as mq

    from sdg_big_data_spark.operators import grouped

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    pings = mq._pings_anchored(spark, sf_dir)
    stops = grouped.detect_stops_batched(pings)
    daily = mobility.day_split_stops(stops)
    admin = spark.createDataFrame(
        [(g, mq._diamond_wkt(la, lo, r)) for g, la, lo, r in mq._admin_sites()],
        schema="geom_id string, geometry string",
    )
    geo = mobility.geocode_stops(daily, admin, cell_deg=0.01)
    plan = geo._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_labor_e2e_matches_stagewise(spark, sf_dir):
    """m_labor_e2e (one-lineage survival report of the composed labor
    pipeline) must equal the counts of the stages built independently
    through the pipelines.labor functions."""
    from pyspark.sql import functions as F

    from sdg_big_data_spark.pipelines import labor
    from sdg_big_data_spark.plans import labor_queries as lq

    report = {
        r["stage"]: (r["n_rows"], r["metric"])
        for r in lq.m_labor_e2e(spark, sf_dir).collect()
    }
    assert set(report) == {
        "0_tweets", "1_corpus", "2_labeling_sets", "3_scored",
        "4_rank_eval", "5_indicator",
    }

    tweets = lq._tweets(spark, sf_dir)
    corpus = labor.build_corpus(
        tweets, lang=lq._LANG, sample_fraction=lq._SAMPLE_FRAC
    ).where(F.length(F.trim(F.col("text_norm"))) > 0)
    labeling = labor.ngram_labeling_sets(
        corpus, list(lq._NGRAMS), n_per_ngram=lq._N_PER_NGRAM
    )
    scored = labor.score_corpus(corpus, list(lq._CLASSES))
    rank_eval = labor.rank_eval_sample(scored, lq._CLASSES[0], list(lq._RANKS))
    dated = scored.join(
        corpus.select("tweet_id", "user_id", "created_at"), "tweet_id"
    )
    ind = labor.indicator(dated, lq._CLASSES[0], lq._CUTOFF)

    assert report["0_tweets"][0] == tweets.count()
    assert report["1_corpus"][0] == corpus.count()
    assert report["2_labeling_sets"][0] == labeling.count()
    # F6 seam: scoring is a 1:1 decoration — ids survive the Arrow
    # boundary exactly
    assert report["3_scored"][0] == report["1_corpus"][0] == scored.count()
    assert report["4_rank_eval"][0] == rank_eval.count()
    assert report["4_rank_eval"][0] <= len(lq._RANKS)
    assert report["5_indicator"][0] == ind.count()
    # every requested stratum that matched anything survives sampling
    assert report["2_labeling_sets"][1] == float(
        labeling.select("ngram").distinct().count()
    )
