"""Environment-invariance gates (the COVERAGE.md claim, enforced):
catalog results must not depend on the host session's timezone or
shuffle-partition count. A non-UTC session silently shifts every
year/month/hour derivation vs the oracle unless ``read_table``'s UTC
enforcement holds; partition-count changes break anything that leans on
``spark_partition_id`` or seeded per-partition randomness.
"""

from __future__ import annotations

import math

import pytest

from sdg_big_data_spark.plans import catalog

# Queries chosen for sensitivity: calendar derivations, event-time
# windows, epoch sessionization, hash sampling, scalable rank, dedup.
PROBES = [
    "f_datetime_family",
    "w_tumbling_hour",
    "g_sessionize",
    "r1_hash_sample",
    "w4_full_rank",
    "d_exact_dedup",
    "ev_bootstrap_f1",
    # round 3: iterative tie-broken training, top-k tie-broken ranking,
    # interval bucketing over event-time epochs
    "t_bpe_merges",
    "ev_ndcg",
    "j_interval_join",
    # round 3b: float cell-assignment tie-breaks, sketch estimates over a
    # day derivation (timezone-sensitive fine grain), histogram bounds
    "d_semantic_dedup",
    "a_hll_distinct",
    "a_histogram",
    "a_theta_overlap",
    "t_chunk_plan",
    # round 3c: iterative broadcast-hinted rank propagation, PQ argmin
    # tie-breaks through the transform-literal codebook path
    "g_pagerank",
    "e_pq_topk",
    # round 3d: event-time sequence scans (strictly-after funnel chain,
    # lead-window transition pairs) — both timezone-sensitive if the
    # reader's UTC normalization ever regresses
    "g_funnel",
    "g_transitions",
    # epoch-bucketed spatio-temporal banding
    "sp_colocation",
    # round 4: df-ordered prefix filtering (a global (df, shingle) sort
    # order must not depend on partitioning) and the composed curation
    # ladder (five chained stages — any stage drifting shifts every
    # downstream count)
    "d_ssjoin_prefix",
    "d_curation_e2e",
    # round 4b: representative-hash split over an iterative CC fixpoint
    # (cluster labels must not depend on partitioning) and the DSIR
    # two-pass fit/score (collected histogram must be partition-exact)
    "d_leakage_split",
    "d_dsir_weights",
    # round 4c: sketch cells from bit-sliced hashes (cell counts must be
    # partition-exact), top-k tie-breaks through two ANN paths
    "a_cm_heavy_hitters",
    "ev_ann_recall",
    # round 5: iterative k-means (hash-ordered init rows + per-iteration
    # avg summation order under 200 partitions), bigram LM (two count
    # shuffles joined back), calendar-window categorical drift (day-of-
    # month derivation is timezone-sensitive), and the ship-year
    # derivation + integer-cents accumulation of the new TPC-H shapes
    "e_kmeans_lloyd",
    "t_bigram_ppl",
    "dq_chi2_drift",
    "tpch_q7_nation_volume",
    "tpch_q4_priority_count",
    # round 5b: the composed train->index->search lineage (k-means
    # trajectory + IVF probe tie-breaks, end to end)
    "e_ivf_kmeans_topk",
    # round 6: PSI bin edges from the scalable range-shuffle rank (edge
    # VALUES must be partition-invariant), session windows over
    # second-truncated event time (timezone-sensitive day/hour math),
    # the pairwise-cosine diversity fold, and Q15's exact-units
    # max-equality membership (any summation drift changes the row set)
    "dq_psi_drift",
    "s_session_window",
    "ev_diversity",
    "tpch_q15_top_supplier",
    # round 7: corpus-wide keep-first line dedup (min-struct keeper must
    # be partition-invariant), the two grouped-sequential smoothers
    # (Arrow-batch carry under 200 partitions + event-time ordering),
    # average-rank Spearman over the range-shuffle prefix sum, the
    # 5-step MMR greedy (float argmax tie-breaks end to end), BFS and
    # k-core fixpoints (join/broadcast schedules must not change the
    # result), and the per-day HLL sliding union (day derivation is
    # timezone-sensitive; sketch merge order partition-dependent)
    "d_line_dedup",
    "w_holt_trend",
    "w_rolling_mad",
    "ev_spearman",
    "sim_mmr_rerank",
    "g_bfs_hops",
    "g_kcore",
    "a_hll_sliding",
]


def _normalize(rows):
    out = []
    for r in rows:
        vals = []
        for k in sorted(r):
            v = r[k]
            if isinstance(v, float) and not math.isnan(v):
                vals.append((k, round(v, 9)))
            else:
                vals.append((k, str(v)))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.fixture(scope="module")
def hostile(spark):
    """A sibling session with hostile confs: non-UTC zone + a very
    different shuffle width. Shares the SparkContext (both are session-
    level confs), so the module is cheap."""
    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    s.conf.set("spark.sql.shuffle.partitions", "200")
    return s


@pytest.mark.parametrize("name", PROBES)
def test_query_invariant_under_hostile_session(name, spark, hostile, ddb, sf_dir):
    catalog._load_all()
    fn = catalog.REGISTRY[name].fn
    sql = catalog.REGISTRY[name].sql
    want = _normalize(ddb.execute(sql).fetch_arrow_table().to_pylist())
    got = _normalize([r.asDict() for r in fn(hostile, sf_dir).collect()])
    assert got == want, f"{name} drifted under America/New_York + 200 partitions"
