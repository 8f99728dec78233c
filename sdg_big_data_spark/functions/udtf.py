"""Python UDTFs — the table-function surface (Spark 3.5+/4).

The engine's position (SURVEY §2.10): row-expanding logic belongs in
native ``sequence``+``explode`` expressions (F1's day split is one —
codegen'd, zero Python). A UDTF is the escape hatch for expansions whose
row-count or shape is genuinely imperative — and the API surface a
reference user migrating UDF-heavy code hits first, so the engine ships
a worked example with an exactness test against the native form.

Scale note: a Python UDTF is an Arrow-batched Python crossing per row
group, like any pandas UDF — keep it off the hot path when a native
expression exists (`test_udtf.py` asserts the native F1 plan beats it on
plan shape: no PythonUDTF node, full codegen).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="dayidx bigint, seg_start bigint, seg_end bigint")
class SplitDays:
    """Split an epoch-seconds interval [t_start, t_end] at midnight
    boundaries — the UDTF twin of the native F1 day split (same clamp
    semantics: segment i covers [max(t_start, day*86400),
    min(t_end, (day+1)*86400)])."""

    def eval(self, t_start: int, t_end: int):
        if t_start is None or t_end is None or t_end < t_start:
            return
        d0, d1 = t_start // 86400, t_end // 86400
        for d in range(d0, d1 + 1):
            yield (
                d,
                max(t_start, d * 86400),
                min(t_end, (d + 1) * 86400),
            )


def register_udtfs(spark) -> None:
    """Expose the UDTFs to SQL: ``SELECT * FROM split_days(10, 200000)``
    or LATERAL JOIN against a table."""
    spark.udtf.register("split_days", SplitDays)
