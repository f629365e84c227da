"""Fixture-table loaders.

All driver tables are one parquet file per table under an sf dir
(TESTDATA.md). Parquet scans give Catalyst predicate pushdown, column
pruning, and (on a partitioned layout) partition pruning for free — the
callers just declare filters/projections and the scan narrows itself
(verify with ``df.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import contextlib
import fcntl
import os

from pyspark.sql import DataFrame, SparkSession


def read_marker(marker: str) -> "str | None":
    """Read a cache-validity marker, None when absent/unreadable — the
    mandatory companion to ``build_lock``'s double-checked re-check."""
    try:
        with open(marker) as fh:
            return fh.read().strip()
    except OSError:
        return None


@contextlib.contextmanager
def build_lock(path: str):
    """Exclusive cross-process lock for rebuilding a shared /tmp cache dir
    (bucketed-coloc layout, persisted ANN/dedup index).

    The rebuild pattern is rmtree + rewrite; without a lock, two sessions
    on the same sf_dir can delete the directory out from under each
    other's in-flight build.  The lockfile lives BESIDE the cache dir
    (``<path>.lock``), never inside it, so the rmtree cannot remove the
    lock itself.  Callers must RE-CHECK their cache marker after
    acquiring the lock (double-checked locking): the process that was
    queued behind the winner sees a fresh marker and skips its rebuild.

    The lockfile is opened via ``os.open(O_CREAT | O_RDWR)`` rather than
    ``open(..., "w")`` so re-acquisition never O_TRUNCs a file another
    process holds flock'd.  The 0o666 create mode is masked by umask
    (typically landing at 0644), so it is NOT what prevents cross-user
    EACCES — the real guard is that cache paths are per-OS-user
    (``cache_base``), making another user's lockfile unreachable by
    construction (ADVICE r7/r8).
    """
    lockfile = f"{path}.lock"
    fd = os.open(lockfile, os.O_CREAT | os.O_RDWR, 0o666)
    with os.fdopen(fd, "r+") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)


def cache_base(kind: str, key: str) -> str:
    """Per-user /tmp cache root for ``kind`` keyed by ``key`` (usually the
    sf_dir).  Including the OS user in the path makes cross-user /tmp
    collisions (EACCES on another user's 0755 dir or 0644 lockfile)
    structurally impossible — ADVICE r7."""
    import getpass
    import hashlib
    import tempfile

    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    try:
        user = getpass.getuser()
    except OSError:  # no passwd entry (some containers)
        user = f"uid{os.getuid()}"
    return os.path.join(tempfile.gettempdir(), f"graft_{kind}_{user}_{tag}")


GEN_MARKER = "_GRAFT_GEN_OK"
_GEN_GC_TTL_S = 6 * 3600


def _gc_generations(base: str, keep: str) -> None:
    """Lazily delete generation dirs other than ``keep`` that are older
    than the TTL.  Called only under ``build_lock(base)``.  The TTL is
    the read-grace window: a generation is deleted only long after any
    scan that started against it has finished, so GC never races a
    reader the way rebuild-in-place did."""
    import shutil
    import time

    now = time.time()
    try:
        entries = os.listdir(base)
    except OSError:
        return
    for name in entries:
        if not name.startswith("gen-") or name == keep:
            continue
        p = os.path.join(base, name)
        try:
            if now - os.stat(p).st_mtime > _GEN_GC_TTL_S:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue


def ensure_generation(kind: str, key: str, fp: str, build, *, force: bool = False) -> str:
    """Immutable-generation shared cache (ADVICE r7): every (re)build goes
    into a FRESH ``gen-*`` subdirectory and the ``CURRENT`` pointer file
    swings to it atomically, so no session ever rmtree's or overwrites a
    layout another session is mid-scan on — the residual read race of the
    old rebuild-in-place protocol.  Old generations are GC'd lazily by
    age (``_gc_generations``), long after their readers are gone.

    ``fp`` fingerprints the source data (size+mtime of the input parquet);
    a regenerated fixture yields a new fingerprint, hence a new
    generation.  ``force=True`` builds a fresh generation even when a
    valid one exists (the "a build is a fresh build" gate ops) — the
    SERIAL file makes each forced build's directory name unique.

    ``build(gen_dir)`` must write the cache contents into ``gen_dir``;
    the generation becomes visible only after its marker + CURRENT land.
    Returns the absolute path of the valid generation directory.
    """
    import hashlib
    import shutil

    base = cache_base(kind, key)
    os.makedirs(base, exist_ok=True)
    cur_file = os.path.join(base, "CURRENT")

    def _valid() -> "str | None":
        cur = read_marker(cur_file)
        if not cur or "/" in cur or cur.startswith("."):
            return None
        gen = os.path.join(base, cur)
        ok = read_marker(os.path.join(gen, GEN_MARKER)) == fp
        return gen if ok else None

    got = None if force else _valid()
    if got:
        return got
    with build_lock(base):
        got = None if force else _valid()
        if got:
            return got
        serial = int(read_marker(os.path.join(base, "SERIAL")) or "0") + 1
        with open(os.path.join(base, "SERIAL"), "w") as fh:
            fh.write(str(serial))
        name = "gen-" + hashlib.md5(f"{fp}:{serial}".encode()).hexdigest()[:16]
        gen = os.path.join(base, name)
        shutil.rmtree(gen, ignore_errors=True)  # debris of a failed build
        os.makedirs(gen)
        build(gen)
        with open(os.path.join(gen, GEN_MARKER), "w") as fh:
            fh.write(fp)
        tmp = cur_file + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(name)
        os.replace(tmp, cur_file)  # atomic pointer swap
        _gc_generations(base, keep=name)
    return gen


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Event-time columns per table. If the driver regenerates a fixture with a
# different physical timestamp type, these are the columns that must be
# re-normalized (everything else — int vs bigint key width, float vs double
# — drifts identically on the Spark and DuckDB sides and needs no help).
_TS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _normalize_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalize one event-time column to a session-tz TIMESTAMP regardless
    of the fixture's physical parquet type. The driver regenerates fixtures
    between rounds and has already flipped events.ts between
    TIMESTAMP(NANOS) (read as long under ``nanosAsLong``) and timestamp[us]
    (read as TIMESTAMP_NTZ), so dispatch on the *read* dtype:

    - LongType (nanos-as-long): integer ``div 1000`` then
      ``timestamp_micros`` — ns epoch values overflow double precision, so
      no float math.
    - TIMESTAMP: already what we want.
    - TIMESTAMP_NTZ / anything else: plain cast. Under the pinned UTC
      session timezone this preserves the wall-clock value DuckDB sees,
      keeping oracle hash parity.

    Exception: a column that reads as TIMESTAMP_NTZ today (o_orderdate,
    l_shipdate) is left NTZ — every oracle was validated against that, and
    NTZ vs UTC-timestamp hash identically only for columns the driver
    serializes as naive. Normalization kicks in only on a long read, the
    one shape Spark can't use directly.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000"))
        )
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """events.ts: long → micros conversion as in ``_normalize_ts``, plus a
    TIMESTAMP_NTZ → TIMESTAMP cast (the batch ops and streaming watermarks
    were built and driver-validated against TimestampType)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    df = _normalize_ts(df, "ts")
    if not isinstance(df.schema["ts"].dataType, TimestampType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (reference R3's engine analog)."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    # Timestamps must mean the same instant the DuckDB oracle sees (naive);
    # pin the session timezone in case the caller's session didn't.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Tolerate TIMESTAMP(NANOS) fixtures (Spark refuses them by default with
    # PARQUET_TYPE_ILLEGAL); harmless when the fixture is already micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    else:
        for col in _TS_COLUMNS.get(name, ()):
            df = _normalize_ts(df, col)
    return df
