"""Pushdown barrier — pin expensive projected expressions against
Catalyst alias re-inlining.

Interpreted higher-order expressions (``transform``/``filter``/
``aggregate`` lambdas) get NO common-subexpression elimination and no
codegen, and three optimizer rules silently multiply their cost:

1. ``PushDownPredicates`` substitutes a projected alias's DEFINITION
   into any Filter placed above it — a ``where()`` on a derived column
   re-runs the whole expression chain inside the Filter node (measured:
   the composed quality→language gate evaluated the tokenizer 25× in
   one Filter, 271 s vs ~96 s sum-of-parts at the 100x fixture).
2. ``CollapseProject`` inlines cheap-looking aliases across projection
   boundaries.
3. ``InferFiltersFromGenerate`` plants an extra copy under explodes.

Nothing pushes through a ``Generate``: predicates above it reference
the generator's output attributes, which by definition do not exist
below it. So ``explode(array(struct(<row>)))`` — exactly one output row
per input row — is a plan-level *let binding*: everything computed
below the barrier is evaluated once, no matter how many filters or
projections stack above.

Unlike a cache or ``localCheckpoint`` shield this is lazy, costs no
storage, and is legal on STREAMING DataFrames (it is a stateless
narrow op), which the curation gates require
(`streaming/curation.py` applies them per micro-batch).

Cost: one extra Generate node (~0.3-0.5 s planning at sf0.1, unmeasurable
at 100x) and an optimization fence — raw-column predicates from ABOVE the
barrier no longer reach the scan, so callers should filter source columns
BEFORE a barriered operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pushdown_barrier(df: DataFrame) -> DataFrame:
    """Return ``df`` behind a Generate barrier: same rows, same schema,
    but every expression in ``df``'s projection is evaluated exactly
    once even when callers filter on its aliases."""
    row = F.struct(*[F.col(c) for c in df.columns])
    return df.select(F.explode(F.array(row)).alias("__row")).select("__row.*")
