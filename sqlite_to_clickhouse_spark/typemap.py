"""The reference's type system, re-expressed as columnar Spark expressions.

This is the only module whose *semantics* are normative from the reference
(everything else is capability-surface, not code, parity):

- declared-type map: reference ``infer_column_types`` (main.py:118-136);
  unknown declared types default to String (main.py:134).
- per-value coercions: reference ``prepare_row`` (main.py:81-104) —
  numeric NULL → 0 (main.py:87,93), string NULL → the literal ``"None"``
  (main.py:95 — a ``str(value)`` quirk, reproduced only behind
  ``compat_none_strings=True``; the engine defaults to real NULLs),
  datetime strings parsed after stripping fractional seconds with
  unparseable → NULL (main.py:18-27), dates likewise (main.py:29-37).
- the dead value-based inferrer ``infer_clickhouse_type`` (main.py:39-54)
  including the unsigned wraparound masks (main.py:89-91,100-101), kept for
  parity but never routed in the hot path.

The reference applies these per row in Python; here each branch is a single
``pyspark.sql.Column`` expression, so the whole battery stays inside
whole-stage codegen (no Python in the hot path).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Dict, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- declared-type map (reference main.py:125-134) -------------------------

_DECL_TYPE_MAP: Dict[str, T.DataType] = {
    "INTEGER": T.LongType(),
    "INT": T.LongType(),
    "REAL": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "TEXT": T.StringType(),
    "DATETIME": T.TimestampType(),
    "DATE": T.DateType(),
}


def decl_type_to_spark(decl: Optional[str]) -> T.DataType:
    """SQLite declared column type → Spark type (main.py:125-134).

    Matches the reference's prefix-insensitive lookup: it uppercases the
    declared type and takes the first token (so ``varchar(255)`` → VARCHAR).
    Unknown/empty declared types default to String (main.py:134).
    """
    if not decl:
        return T.StringType()
    token = decl.strip().upper().split("(")[0].strip()
    # SQLite type affinity: a declared type like "UNSIGNED BIG INT" still
    # contains INT; the reference's dict lookup is exact-match, so we stay
    # exact-match on the first word for parity.
    token = token.split()[0] if token else ""
    return _DECL_TYPE_MAP.get(token, T.StringType())


# --- cast battery (reference main.py:81-104, §1.2) -------------------------


def cast_expr(col: Column, spark_type: T.DataType, *, compat_none_strings: bool = False) -> Column:
    """One coercion branch of the reference's ``prepare_row``, columnar.

    ``try_cast``-style expressions are used so behavior is NULL-on-failure
    under both ANSI and legacy Spark SQL modes, matching the reference's
    warn-and-NULL handling (main.py:25-27, 35-37).
    """
    if isinstance(spark_type, T.LongType):
        # int(value or 0) — NULL → 0 (main.py:86-87)
        return F.coalesce(col.try_cast("long"), F.lit(0).cast("long"))
    if isinstance(spark_type, T.DoubleType):
        # float(value or 0) — NULL → 0.0 (main.py:92-93)
        return F.coalesce(col.try_cast("double"), F.lit(0.0))
    if isinstance(spark_type, T.TimestampType):
        # strip fractional seconds then strptime("%Y-%m-%d %H:%M:%S");
        # unparseable → NULL (main.py:18-27)
        s = F.split(col.try_cast("string"), r"\.").getItem(0)
        return F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss"))
    if isinstance(spark_type, T.DateType):
        # strptime("%Y-%m-%d").date(); unparseable → NULL (main.py:29-37)
        return F.try_to_timestamp(col.try_cast("string"), F.lit("yyyy-MM-dd")).try_cast("date")
    if isinstance(spark_type, T.BooleanType):
        # dead value-based path (main.py:41-42); kept for parity
        return col.try_cast("boolean")
    # String: str(value) — the reference turns NULL into the literal "None"
    # (main.py:95). Engine default is a real NULL; compat flag reproduces it.
    s = col.try_cast("string")
    if compat_none_strings:
        return F.coalesce(s, F.lit("None"))
    return s


def cast_battery(
    schema: Dict[str, T.DataType], *, compat_none_strings: bool = False
) -> list[Column]:
    """Full projection list for a table: the engine analog of reference R5.

    ``select(cast_battery(...))`` replaces the reference's per-row Python
    loop (main.py:106-116) with one codegen'd columnar projection.
    """
    return [
        cast_expr(F.col(name), dtype, compat_none_strings=compat_none_strings).alias(name)
        for name, dtype in schema.items()
    ]


# --- value-based inference (dead code in the reference, main.py:39-54) -----

_U32_MASK = 0xFFFFFFFF
_U64_MASK = 0xFFFFFFFFFFFFFFFF


def infer_clickhouse_type(value: Any) -> str:
    """Scalar → ClickHouse type name (reference main.py:39-54).

    Never called by the reference (dead code) — implemented for parity and
    unit-tested, but not routed anywhere in the engine's hot path.
    """
    if isinstance(value, bool):
        return "Boolean"
    if isinstance(value, int):
        if value < 0:
            return "Int32"
        if value <= _U32_MASK:
            return "UInt32"
        return "UInt64"
    if isinstance(value, float):
        return "Float64"
    if isinstance(value, str):
        return "String"
    return "String"


def unsigned_wraparound(value: int, ch_type: str) -> int:
    """The reference's unsigned masks (main.py:89-91, 100-101): dead code,
    kept for bug-for-bug parity in compat mode. Spark has no unsigned ints;
    the masked value is representable in LongType (U32) / DecimalType (U64).
    """
    if ch_type == "UInt32":
        return value & _U32_MASK
    if ch_type == "UInt64":
        return value & _U64_MASK
    return value


def parse_datetime(value: Optional[str]) -> Optional[_dt.datetime]:
    """Driver-side scalar twin of the DATETIME branch (main.py:18-27).

    Used only by unit tests and the SQLite migration path's schema probe;
    the data path uses the columnar ``cast_expr`` above.
    """
    if value is None or value == "":
        return None
    try:
        return _dt.datetime.strptime(str(value).split(".")[0], "%Y-%m-%d %H:%M:%S")
    except ValueError:
        return None


def parse_date(value: Optional[str]) -> Optional[_dt.date]:
    """Scalar twin of the DATE branch (main.py:29-37)."""
    if value is None or value == "":
        return None
    try:
        return _dt.datetime.strptime(str(value), "%Y-%m-%d").date()
    except ValueError:
        return None
