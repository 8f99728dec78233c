"""Timestamp flavor-proof epoch helpers.

Spark 4 infers parquet ``timestamp[us]`` WITHOUT ``isAdjustedToUTC`` as
TIMESTAMP_NTZ, and ``CAST(ntz AS BIGINT)`` / ``unix_micros(ntz)`` are
analysis errors. The round-2 driver fixture flip regressed five queries
through exactly that crack. Every epoch derivation in the engine now goes
through these helpers so a fixture-flavor flip can never fan out again.

Semantics: under the engine's enforced-UTC session (``read_table`` sets
``spark.sql.session.timeZone=UTC``) an NTZ wall-clock cast to TIMESTAMP
denotes the same instant DuckDB computes with ``epoch(ts)`` on the naive
value — so oracle arithmetic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _as_instant(col: Column | str) -> Column:
    """Normalize any timestamp flavor (TIMESTAMP, TIMESTAMP_NTZ, string,
    date) to session-zone TIMESTAMP. NTZ→TIMESTAMP re-interprets the wall
    clock in the session zone (UTC here) — a no-op for already-zoned
    columns."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_seconds(col: Column | str) -> Column:
    """Seconds since epoch as BIGINT (floor, like DuckDB ``epoch(ts)``)."""
    return _as_instant(col).cast("long")


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since epoch as BIGINT (``unix_micros`` on the
    normalized instant — exact for the driver's µs fixtures)."""
    return F.unix_micros(_as_instant(col))
