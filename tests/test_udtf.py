"""Python UDTF surface: SQL registration, lateral-join use, and exact
agreement with the native sequence+explode day split."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_udtf_direct_call_and_clamp(spark):
    from sdg_big_data_spark.functions.udtf import SplitDays

    out = SplitDays(F.lit(10), F.lit(200_000)).collect()
    # 200000 // 86400 = 2 -> three day segments
    assert [tuple(r) for r in out] == [
        (0, 10, 86400),
        (1, 86400, 172800),
        (2, 172800, 200000),
    ]


def test_udtf_sql_lateral_matches_native_split(spark):
    from sdg_big_data_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    iv = spark.createDataFrame(
        [(1, 10, 200_000), (2, 86_400, 86_400), (3, 50, 40)],
        "id long, t_start long, t_end long",
    )
    iv.createOrReplaceTempView("iv_udtf_test")
    via_udtf = spark.sql(
        """
        SELECT id, s.dayidx, s.seg_start, s.seg_end
        FROM iv_udtf_test, LATERAL split_days(t_start, t_end) s
        """
    ).collect()
    native = (
        iv.where(F.col("t_end") >= F.col("t_start"))
        .withColumn(
            "dayidx",
            F.explode(
                F.sequence(
                    F.floor(F.col("t_start") / 86400),
                    F.floor(F.col("t_end") / 86400),
                )
            ),
        )
        .select(
            "id",
            "dayidx",
            F.greatest(F.col("t_start"), F.col("dayidx") * 86400).alias("seg_start"),
            F.least(F.col("t_end"), (F.col("dayidx") + 1) * 86400).alias("seg_end"),
        )
        .collect()
    )
    assert sorted(map(tuple, via_udtf)) == sorted(map(tuple, native))
    # inverted interval (id 3) emitted by neither
    assert all(r[0] != 3 for r in via_udtf)


def test_native_form_stays_python_free(spark, sf_dir):
    """The catalog's F1 path must NOT regress to the UDTF: no Python
    crossing in its plan (the UDTF is the escape hatch, not the path)."""
    from sdg_big_data_spark.plans import catalog

    df = catalog.queries()["f1_day_split"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDTF" not in plan and "BatchEvalPython" not in plan
