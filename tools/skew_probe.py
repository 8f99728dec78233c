#!/usr/bin/env python
"""Adversarial-skew probe — measured straggler evidence for the skew
guards (r3 judge task 1: "skew fixtures passing without a straggler
task >4x median").

Three hostile inputs, each an order-of-magnitude-style violation of the
uniformity the planner would like:

- **power user**: ONE user owns 50% of all event pings → stresses the
  per-user ``applyInPandas`` stop-detection path (``cap_group_size``
  guard, operators/grouped.py) and sessionization;
- **hot LSH bucket**: 30% of documents are near-identical → they land
  in the same MinHash band buckets, making the candidate self-join
  maximally skewed (AQE skew-join split is the guard);
- **fat stratum**: one group holds 80% of rows → stresses
  ``grouped_prefix_sum``'s range-shuffle design, whose whole point is
  that a group never funnels into one partition.

For each probe the script runs the operator under a UI-enabled session
and pulls PER-TASK duration quantiles from Spark's REST API for every
completed stage, then reports the worst max/median task-duration ratio
across substantive stages (>= ``MIN_TASKS`` tasks and max >=
``MIN_MAX_MS`` — tiny stages are pure scheduling noise). Exit code 1 if
any probe exceeds the 4x bound.

Usage: python tools/skew_probe.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

RATIO_BOUND = 4.0
MIN_TASKS = 4
MIN_MAX_MS = 300.0


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def _stage_ratios(ui: str) -> list[dict]:
    """(stage, n_tasks, median_ms, max_ms, ratio) for completed stages."""
    apps = _rest(f"{ui}/api/v1/applications")
    app_id = apps[0]["id"]
    stages = _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE")
    out = []
    for st in stages:
        sid, att = st["stageId"], st["attemptId"]
        if st.get("numCompleteTasks", 0) < MIN_TASKS:
            continue
        try:
            summ = _rest(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/"
                "taskSummary?quantiles=0.0,0.5,1.0"
            )
        except Exception:
            continue
        dur = summ.get("duration")
        if not dur:
            continue
        _mn, med, mx = dur
        if mx < MIN_MAX_MS or med <= 0:
            continue
        out.append(
            {
                "stage": sid,
                "name": st.get("name", "")[:60],
                "n_tasks": st["numCompleteTasks"],
                "median_ms": round(med, 1),
                "max_ms": round(mx, 1),
                "ratio": round(mx / med, 2),
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated probe names to run (default all) — used to "
        "re-run a single probe at a scaled fixture without paying for "
        "the deliberately-quadratic giant-cluster probe, which is "
        "sf0.1-only by design (30%% of docs in ONE near-dup clique is "
        "corpus-quadratic in candidate pairs at any engine)",
    )
    args = ap.parse_args()

    from sdg_big_data_spark.session import get_spark
    from sdg_big_data_spark.sources.readers import read_table

    spark = get_spark(
        app_name="skew-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    ev = read_table(spark, args.sf_dir, "events")
    docs = read_table(spark, args.sf_dir, "documents")

    report: dict[str, dict] = {}

    only = {s.strip() for s in args.only.split(",") if s.strip()}

    def probe(name: str, fn) -> None:
        if only and name not in only:
            return
        before = {r["stage"] for r in _stage_ratios(ui)}
        fn()
        rows = [r for r in _stage_ratios(ui) if r["stage"] not in before]
        worst = max(rows, key=lambda r: r["ratio"], default=None)
        report[name] = {
            "stages_measured": len(rows),
            "worst": worst,
            "pass": worst is None or worst["ratio"] <= RATIO_BOUND,
        }
        print(f"[{name}] stages={len(rows)} worst={worst}")

    # --- probe 1: power user (50% of pings on one user) ------------------
    # same synthetic trajectory derivation as the f2_stop_detect catalog
    # query, but half of all pings reassigned to one user BEFORE the
    # lat/lon/ts derivation (so the hot user has a real dense trajectory)
    half_user = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(777)).otherwise(F.col("user_id")),
    )
    skew_pings = half_user.select(
        F.col("user_id").cast("string").alias("user_id"),
        (F.col("user_id") % 170 - 85 + (F.col("event_id") % 10) * 1e-5).alias("lat"),
        (F.col("user_id") * 7 % 360 - 180 + (F.col("event_id") % 7) * 1e-5).alias(
            "lon"
        ),
        (10.0 + F.col("event_id") % 90).alias("accuracy"),
        (F.lit(1_700_000_000) + (F.col("event_id") % 100_000) * 30).alias(
            "timestamp"
        ),
    )

    def p1():
        from sdg_big_data_spark.operators.grouped import detect_stops_batched

        detect_stops_batched(skew_pings).write.format("noop").mode(
            "overwrite"
        ).save()

    probe("power_user_stop_detect", p1)

    # --- probe 2: hot LSH bucket (30% of docs near-identical) -------------
    hot = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(
                F.lit(
                    "the quick brown fox jumps over the lazy dog again and "
                    "again across the wide river delta plains tonight "
                ),
                (F.col("doc_id") % 7).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )

    def p2():
        from sdg_big_data_spark.operators.dedup import minhash_lsh_candidates

        minhash_lsh_candidates(hot, "doc_id", "text").write.format("noop").mode(
            "overwrite"
        ).save()

    probe("hot_lsh_bucket_candidates", p2)

    # --- probe 2b: dup cliques through the EXACT ssjoin -------------------
    # 3% of docs form 7 exact-dup cliques: every clique member shares its
    # PREFIX tokens with every other, so the prefix-token self-join is
    # maximally hot on those tokens (AQE skew split is the guard; the
    # quadratic OUTPUT inside a clique is inherent to exact
    # set-similarity semantics — see set_similarity_join's docstring).
    cliq = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 100 < 3,
            F.concat(
                F.lit(
                    "the quick brown fox jumps over the lazy dog again and "
                    "again across the wide river delta plains tonight "
                ),
                (F.col("doc_id") % 7).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )

    def p2b():
        from sdg_big_data_spark.operators.dedup import set_similarity_join

        set_similarity_join(cliq, "doc_id", "text", 0.8).write.format(
            "noop"
        ).mode("overwrite").save()

    probe("dup_clique_ssjoin_prefix", p2b)

    # --- probe 2c: giant near-dup CLUSTER through the leakage split -------
    # 30% of docs collapse into ONE near-dup component (hot variant text
    # above): connected-components label propagation must converge and the
    # representative-hash split must run without a giant-cluster straggler
    # (the component frame join is the stress point).
    def p2c():
        from sdg_big_data_spark.pipelines.dataprep import leakage_safe_split

        leakage_safe_split(hot).write.format("noop").mode("overwrite").save()

    probe("giant_cluster_leakage_split", p2c)

    # --- probe 3: fat stratum (80% of rows in one group) ------------------
    fat = ev.withColumn(
        "grp",
        F.when(F.col("event_id") % 5 < 4, F.lit("hot")).otherwise(
            (F.col("event_id") % 5).cast("string")
        ),
    )

    def p3():
        from sdg_big_data_spark.operators.windows import grouped_prefix_sum

        grouped_prefix_sum(
            fat,
            ["grp"],
            [F.col("ts").asc(), F.col("event_id").asc()],
            "value",
            "cum_v",
        ).write.format("noop").mode("overwrite").save()

    probe("fat_stratum_prefix_sum", p3)

    # --- probe 4: hot token (boilerplate filler dominates the corpus) -----
    # 60% of docs become the SAME 40-token filler line: one token pair
    # owns most bigram occurrences, so the bigram-count aggregate is
    # maximally hot on one key. The guard is map-side partial
    # aggregation — the exchange carries distinct (w1, w2) pairs, not
    # occurrences — plus AQE for the scoring join-back.
    hottok = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 6,
            F.concat(
                F.lit(("spam " * 40).strip() + " "),
                (F.col("doc_id") % 5).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )

    def p4():
        from sdg_big_data_spark.operators.quality import bigram_perplexity

        bigram_perplexity(hottok, "doc_id", "text").write.format("noop").mode(
            "overwrite"
        ).save()

    probe("hot_token_bigram_ppl", p4)

    ok = all(v["pass"] for v in report.values())
    print(json.dumps({"bound": RATIO_BOUND, "pass": ok, "probes": report}))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
