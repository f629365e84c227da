"""Differential-comparison helpers mirroring the driver's t2 check:
row count + column names + order-insensitive values. Floats compare by
the driver's exact normalization (f"{v:.9g}" string equality, the same
formatting its value hash applies) — an isclose() tolerance here let a
round-half-up vs round-half-even boundary slip through locally and fail
the driver gate (window_ewma, round 5)."""

from __future__ import annotations

import datetime as dt
import math
from typing import Any


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            # Sign-of-zero is outside the gate contract: IEEE defines
            # -0.0 == 0.0, but the engines surface different signs after
            # normalization passes (Spark's NormalizeFloatingNumbers
            # rewrites -0.0 in grouping/join keys; SQLite loses the sign
            # in the JDBC round trip) — the extreme-numerics sweep hit
            # ten ops differing ONLY in this bit. The driver-generated
            # clean fixtures contain no -0.0, so the driver's own hash
            # (which formats '-0' vs '0') is unaffected.
            return 0.0
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _sort_key(row: tuple) -> tuple:
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def _cells_equal(a: Any, b: Any) -> bool:
    if isinstance(a, float) and isinstance(b, (float, int)):
        return f"{a:.9g}" == f"{float(b):.9g}"
    if isinstance(b, float) and isinstance(a, (float, int)):
        return f"{float(a):.9g}" == f"{b:.9g}"
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date", "BLOB": "bytes",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts", "TIMESTAMP_MS": "ts", "TIMESTAMP_S": "ts",
}

_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date", "binary": "bytes",
}


def _type_class(duck_type: str):
    """Coarse type class of a DuckDB column type (None = don't check)."""
    return _DUCK_CLASS.get(duck_type.upper())


def _spark_type_class(spark_dtype: str):
    if spark_dtype.startswith("timestamp"):
        return "ts"
    return _SPARK_CLASS.get(spark_dtype)


def assert_df_matches_oracle(spark_df, duck_con, oracle: str, name: str = "?") -> None:
    """Compare a Spark DataFrame against DuckDB oracle SQL the way the
    driver does: count, sorted column names, order-insensitive values."""
    duck_rel = duck_con.sql(oracle)
    duck_cols = list(duck_rel.columns)
    duck_types = [str(t).upper() for t in duck_rel.types]
    duck_rows = duck_rel.fetchall()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    # The driver's value hash type-tags cells, so any cross-engine dtype
    # drift (DuckDB HUGEINT from SUM(int), TINYINT from SIGN(double), …)
    # hashes differently from Spark's type even when every value is equal.
    # Local values compare as plain Python scalars and would pass silently —
    # so fail on the dtype itself and demand an explicit CAST in the oracle
    # SQL (or in the Spark projection). 3 of the last 3 driver hash fails
    # were exactly this class (session_no BIGINT, lang_filter, fn_math SIGN).
    spark_dtypes = dict(spark_df.dtypes)
    for c, t in zip(duck_cols, duck_types):
        sdt = spark_dtypes.get(c, "")
        if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
            assert sdt.startswith("decimal"), (
                f"[{name}] oracle column {c!r} is DuckDB {t} but Spark {sdt!r}; "
                f"the driver hash type-tags these differently — CAST the oracle "
                f"expression to BIGINT/DOUBLE"
            )
            continue
        dcls = _type_class(t)
        scls = _spark_type_class(sdt)
        if dcls is not None and scls is not None:
            assert dcls == scls, (
                f"[{name}] oracle column {c!r} is DuckDB {t} ({dcls}) but Spark "
                f"{sdt!r} ({scls}); the driver hash type-tags these differently "
                f"even when values are equal — CAST one side"
            )

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"[{name}] column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"[{name}] row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    # Reorder duck columns to spark order, normalize, sort rows.
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_rows_o = [tuple(r[i] for i in idx) for r in duck_rows]

    s_norm = sorted((tuple(_norm_cell(c) for c in r) for r in spark_rows), key=_sort_key)
    d_norm = sorted((tuple(_norm_cell(c) for c in r) for r in duck_rows_o), key=_sort_key)

    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        if not all(_cells_equal(a, b) for a, b in zip(sr, dr)):
            mismatches.append((i, sr, dr))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"[{name}] value mismatches (spark vs duck): {mismatches}"
