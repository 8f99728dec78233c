"""The scale-parity comparator (tools/oracle_at_scale.canon_hash) must be
trustworthy in BOTH directions: equal canonical content hashes equal, and
a genuinely different value changes the hash (a vacuous comparator would
make the 100x parity record meaningless)."""

import duckdb
import pytest

from tools.oracle_at_scale import canon_hash


@pytest.fixture()
def con():
    return duckdb.connect()


def _h(con, sql):
    return canon_hash(con, sql, "t")


def test_equal_content_equal_hash_order_insensitive(con):
    a = "SELECT * FROM (VALUES (1, 'x', 1.5), (2, 'y', 2.5)) v(a, b, c)"
    b = "SELECT * FROM (VALUES (2, 'y', 2.5), (1, 'x', 1.5)) v(a, b, c)"
    assert _h(con, a) == _h(con, b)


def test_value_change_changes_hash(con):
    a = "SELECT * FROM (VALUES (1, 'x', 1.5), (2, 'y', 2.5)) v(a, b, c)"
    b = "SELECT * FROM (VALUES (1, 'x', 1.5), (2, 'y', 2.500001)) v(a, b, c)"
    n1, h1 = _h(con, a)
    n2, h2 = _h(con, b)
    assert n1 == n2 and h1 != h2


def test_round9_tolerance_and_nan_sentinel(con):
    # sub-1e-9 float jitter is canonicalized away (driver rounds to 9)
    a = "SELECT 1.2345678901234 AS x"
    b = "SELECT 1.2345678901999 AS x"
    assert _h(con, a) == _h(con, b)
    # NaN and NULL both collapse to the sentinel, never poison the sum
    n, h = _h(con, "SELECT CAST('nan' AS DOUBLE) AS x")
    n2, h2 = _h(con, "SELECT CAST(NULL AS DOUBLE) AS x")
    assert h is not None and h == h2


def test_string_vs_number_not_conflated(con):
    a = "SELECT '1' AS x"
    b = "SELECT 1 AS x"
    assert _h(con, a) != _h(con, b)
