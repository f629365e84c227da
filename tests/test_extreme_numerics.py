"""Extreme-numerics robustness: the differential gate must hold when
float columns carry domain-plausible dirty values — negative zero and
large magnitudes. This is where long-overflow clamps and sign-of-zero
normalization quietly diverge across engines:

- Spark's floor(double) returns LONG and clamps at ±2⁶³ while DuckDB's
  FLOOR stays DOUBLE — window_ewma was pinned to exactly Long.MAX/1e6
  on ±1e15 inputs until the double-domain floor fix (windows.py);
- the sign-of-zero bit flips through Spark's NormalizeFloatingNumbers
  and the SQLite JDBC round trip, so -0.0 == 0.0 is explicitly outside
  the gate contract (normalized in tests/utils.py).

The fixture mirrors tools/adversarial_sweep.py::make_extremes (every
11th row of each float column cycles through its domain-plausible
extreme set), and each op below is differentially compared on the SAME
mutated parquet.
"""

from __future__ import annotations

import duckdb
import pytest

from sqlite_to_clickhouse_spark.io import TABLES
from sqlite_to_clickhouse_spark.registry import all_queries
from tests.utils import assert_df_matches_oracle

_Q = all_queries()

_OPS = [
    # the long-overflow clamp find (fixed: double-domain floor)
    "window_ewma",
    # -0.0 through the SQLite JDBC round trip
    "scan_jdbc",
    "migrate_sqlite_roundtrip",
    # -0.0 out of sums / window ratios / math fns
    "query_promo_revenue",
    "window_ratio_to_report",
    "fn_math_advanced",
    # integer-scaled exact-arithmetic oracle at its documented bound
    "events_anomaly_zscore",
    # large-magnitude accumulation through a stateful stream
    "stream_custom_stateful",
]


@pytest.fixture(scope="module")
def extremes_sf_dir(sf_dir, tmp_path_factory):
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from adversarial_sweep import make_extremes

    dst = tmp_path_factory.mktemp("sf_extremes")
    make_extremes(sf_dir, str(dst))
    return str(dst)


@pytest.fixture(scope="module")
def extremes_duck(extremes_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{extremes_sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _OPS)
def test_op_survives_extreme_numerics(spark, extremes_duck, extremes_sf_dir, name):
    q = _Q[name]
    assert_df_matches_oracle(
        q.fn(spark, extremes_sf_dir), extremes_duck, q.oracle, name=name
    )


def test_ewma_not_clamped_at_long_max(spark, sf_dir, tmp_path_factory):
    """The regression itself needs |ewma| > 2⁶³/1e6 ≈ 9.2e12, beyond the
    domain-plausible sweep set — a dedicated events mutant pushes value
    to ±1e15 and asserts (a) the oracle still matches and (b) nothing in
    the output sits at the Long.MAX/1e6 clamp the bug produced."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = tmp_path_factory.mktemp("sf_ewma_huge")
    for t in TABLES:
        if t != "events":
            shutil.copy(
                os.path.join(sf_dir, f"{t}.parquet"), str(dst / f"{t}.parquet")
            )
    tab = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    typ = tab.schema.field("value").type
    vals = tab.column("value").to_pylist()
    out = [
        (1e15 if i % 2 else -1e15) if (i % 5 == 2 and v is not None) else v
        for i, v in enumerate(vals)
    ]
    cols = {n: tab.column(n) for n in tab.schema.names}
    cols["value"] = pa.array(out, typ)
    pq.write_table(pa.table(cols), str(dst / "events.parquet"))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{dst}/{t}.parquet'"
        )
    try:
        q = _Q["window_ewma"]
        df = q.fn(spark, str(dst))
        assert_df_matches_oracle(df, con, q.oracle, name="window_ewma@1e15")
        clamp = 9223372036854.775
        vals_out = {r.ewma for r in df.collect() if r.ewma is not None}
        assert not any(abs(abs(v) - clamp) < 1e-3 for v in vals_out)
        assert any(abs(v) > 1e13 for v in vals_out)  # the regime is exercised
    finally:
        con.close()
