"""Pandas GROUPED_AGG UDAFs — the custom-aggregate surface (SURVEY
§2.10 F9: the reference defines no UDAF; this is the worked example a
migrating user needs when a built-in genuinely doesn't exist).

Position: reach for a built-in first — every moment/percentile/argmax
aggregate in this engine is native (see operators/relational.py). A
GROUPED_AGG pandas UDF is Arrow-batched per group and cannot partial-
aggregate (the WHOLE group's column ships to one task), so it is for
aggregates that are irreducibly holistic — like the weighted median
below, which has no mergeable state smaller than the data.

Scale note: group size is the limit, group COUNT is not. A skewed group
(one key = 10% of 100 TB) cannot weighted-median through this path;
bound group sizes upstream or switch to the two-pass quantile
approximation (`relational.grouped_quantiles` with weights exploded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# explicit DataType, not a DDL string: the string form parses through the
# active session at import time and breaks sessionless imports
@pandas_udf(DoubleType())
def weighted_median(values: pd.Series, weights: pd.Series) -> float:
    """Weighted lower median: smallest v with cumulative weight >= half
    the total. NULL values/weights and non-positive weights are ignored
    (pandas-aggregation convention); an empty effective group -> NULL.
    Deterministic: ties in value collapse by summing weights first."""
    m = values.notna() & weights.notna() & (weights > 0)
    if not m.any():
        return None
    v = values[m].to_numpy(dtype="float64")
    w = weights[m].to_numpy(dtype="float64")
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    return float(v[np.searchsorted(cum, cum[-1] / 2.0)])
