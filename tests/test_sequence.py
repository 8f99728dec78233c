"""Hand-computed funnel / transition-matrix semantics on tiny fixtures:
strictly-after step ordering, dropped-out users, null-next handling, and
row-normalized probabilities."""

from __future__ import annotations

from sdg_big_data_spark.operators.sequence import funnel, transitions


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, ty) for i, (u, t, ty) in enumerate(rows)],
        "event_id long, user_id long, ts long, event_type string",
    )


def test_funnel_strictly_after_and_dropouts(spark):
    rows = [
        # u1 completes the funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2 clicks BEFORE viewing — click must not count
        (2, 20, "click"), (2, 30, "view"),
        # u3 views only
        (3, 10, "view"),
        # u4 purchase simultaneous with click — strictly-after drops it
        (4, 10, "view"), (4, 20, "click"), (4, 20, "purchase"),
        # u5 never views; later steps can't start
        (5, 10, "click"), (5, 20, "purchase"),
    ]
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel(
            _events(spark, rows), ["view", "click", "purchase"], ts_col="ts"
        ).collect()
    }
    assert out == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_retry_after_false_start(spark):
    # u1: view, click, view, click, purchase — first chain wins:
    # t1=10 (first view), t2=20 (first click after 10), purchase at 50
    rows = [(1, 10, "view"), (1, 20, "click"), (1, 30, "view"),
            (1, 40, "click"), (1, 50, "purchase")]
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel(
            _events(spark, rows), ["view", "click", "purchase"], ts_col="ts"
        ).collect()
    }
    assert out == {"view": 1, "click": 1, "purchase": 1}


def test_transitions_counts_and_probabilities(spark):
    rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 30, "a"), (1, 40, "c"),
        (2, 10, "a"), (2, 20, "b"),
    ]
    # pairs: u1 a->b, b->a, a->c; u2 a->b  →  a->b:2, a->c:1, b->a:1
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in transitions(_events(spark, rows)).collect()
    }
    assert out[("a", "b")] == (2, 2 / 3)
    assert out[("a", "c")] == (1, 1 / 3)
    assert out[("b", "a")] == (1, 1.0)
    assert len(out) == 3  # final events (no successor) emit nothing
