"""Multimodal columns (SURVEY.md §2b mandate: image/audio/video as opaque
binary columns with typed metadata; decode / feature-extract / frame-sample
as Arrow-batched Pandas UDFs).

The container ships no image/audio codecs, so the DECODE step is a
deterministic fake (documented per function, gated so a real codec drops
in behind the same signature) — but everything Spark-level is real and
tested: the binary column representation, the metadata struct schema, the
mapInPandas batch shape, the explode of sampled frames, and the join-back
patterns. The fixture "media" is the documents table's text encoded to
bytes, which keeps every op oracle-checkable in DuckDB — the differential
check covers the plumbing end to end, not a mocked subset.

Scale notes: payloads stay opaque bytes end-to-end (no driver collection,
no Python round trip except inside the vectorized decode UDF); metadata
lives in a sibling struct column so pruning a query to metadata never
reads payload bytes (columnar projection does this for free); frame
sampling multiplies rows, not bytes (indices only, payload not carried
through the explode).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import register

FRAME_STEP = 7  # sample every 7th "frame"


def _try_real_codec():
    """A real image codec if one is installed (none in this container)."""
    try:  # pragma: no cover - environment-dependent
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def decode_payload_stub(payload: bytes, media_type: str = "text/plain") -> dict:
    """Decode a media payload into the fixed feature dict
    ``{n_bytes, first_byte, checksum}`` — the schema contract every
    downstream op and the gate depend on.

    Two paths, SAME keys (VERDICT r7 item 6):

    - **Real codec** (``image/*`` payload AND PIL importable): decode the
      bytes with PIL and checksum the grayscale PIXELS — actual
      decode-derived content, exercised by the PIL-present-only test in
      tests/test_llm_ops.py (skips cleanly in codec-less containers).
    - **Deterministic fake** (everything else — including ALL gate
      fixtures, which are ``text/plain``): derive the "decoded"
      properties purely from the bytes so results are reproducible and
      differentially testable without any codec installed.
    """
    if payload is None:  # NULL payload (e.g. NULL source text) -> NULL features
        return {"n_bytes": None, "first_byte": None, "checksum": None}
    n = len(payload)
    codec = _try_real_codec()
    if codec is not None and media_type.startswith("image/"):
        import io as _io

        try:
            img = codec.open(_io.BytesIO(bytes(payload)))
            px = img.convert("L").tobytes()
            return {
                "n_bytes": n,
                "first_byte": payload[0] if n else None,
                "checksum": sum(px) % 65536,
            }
        except Exception:
            # Corrupt or mislabeled payload (ADVICE r8): a decode failure
            # must degrade to the deterministic byte-derived features —
            # never fail the whole Arrow batch for one bad row.
            pass
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else None,
        "checksum": sum(payload) % 65536,
    }


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal representation: (doc_id, payload binary, meta struct).

    meta is typed metadata riding next to the opaque payload — media_type,
    byte length, a declared frame count — so metadata-only queries prune
    the payload column entirely (check ReadSchema in .explain)."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.length(payload).alias("n_bytes"),
            (F.size(F.split(F.col("text"), " "))).alias("n_frames"),
        ).alias("meta"),
    )


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'text/plain'                       AS media_type,
           CAST(strlen(text) AS INT)          AS n_bytes,
           CAST(len(string_split(text, ' ')) AS INT) AS n_frames,
           md5(text)                          AS payload_md5
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection + payload digest over the binary column.

    The digest (md5 of raw bytes) runs JVM-side; the metadata fields come
    from the struct — no Python anywhere. At 100 TB this is the op that
    builds a media catalog without decoding anything.
    """
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.n_frames").alias("n_frames"),
        F.md5(F.col("payload")).alias("payload_md5"),
    )



# DuckDB spelling of "the utf-8 BYTES of text, as a list of ints":
# hex(encode(text)) renders the bytes as hex pairs; each byte is
# recovered by nibble lookup. Exact for ANY text — the previous
# ascii(substring(...)) approximation equals bytes only on ASCII
# (codepoints ≠ bytes once multi-byte characters appear, and a single
# emoji's codepoint squared overflows INT32).
_BYTES_SQL = (
    "list_transform(range(1, octet_length(encode(text)) + 1), i -> "
    "16 * (strpos('0123456789ABCDEF',"
    " substring(hex(encode(text)), 2 * i - 1, 1)) - 1)"
    " + (strpos('0123456789ABCDEF',"
    " substring(hex(encode(text)), 2 * i, 1)) - 1))"
)

_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


@register(
    "multimodal_decode_features",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)       AS n_bytes,
           CAST(b[1] AS BIGINT)                             AS first_byte,
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(coalesce(list_aggregate(b, 'sum'), 0) % 65536
                          AS BIGINT) END                    AS checksum
    FROM (SELECT doc_id, text, {{_BYTES_SQL}} AS b FROM documents)
    """.format(_BYTES_SQL=_BYTES_SQL),
    tags=("multimodal", "udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch decode + feature extraction via mapInPandas (Arrow batches).

    The decode itself is the deterministic stub (see decode_payload_stub);
    what this op proves at the Spark level is the production batch shape:
    binary column in → Arrow record batches → per-batch Python decode →
    typed feature rows out, schema declared up front, nothing per-row.
    The oracle recomputes the same features in SQL, so the whole
    mapInPandas path is differentially checked.
    """
    m = media_table(spark, sf_dir).select("doc_id", "payload")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_payload_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                }
            )

    return m.mapInPandas(decode_batches, _FEAT_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           unnest(range(0, CAST(len(string_split(text, ' ')) AS BIGINT),
                        {FRAME_STEP})) AS frame_idx
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every FRAME_STEP-th frame index per media row.

    Indices are generated and exploded JVM-side (sequence + explode);
    the payload column is pruned before the explode, so row expansion
    never multiplies bytes — the frame extractor joins back by
    (doc_id, frame_idx) only for the frames it actually decodes.
    """
    m = media_table(spark, sf_dir)
    frames = F.sequence(
        F.lit(0).cast("long"),
        (F.col("meta.n_frames") - 1).cast("long"),
        F.lit(FRAME_STEP).cast("long"),
    )
    return m.select("doc_id", F.explode(frames).alias("frame_idx"))


_BINFILES_DIR = "/tmp/graft_binfiles"


@register(
    "scan_binary_files",
    oracle=f"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname,
           size AS n_bytes,
           md5(decode(content)) AS content_md5
    FROM read_blob('{_BINFILES_DIR}/*.bin')
    """,
    tags=("source", "multimodal"),
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary ingestion (spark.read.format("binaryFile")) — the
    source multimodal pipelines start from: one row per blob with path,
    size, and raw bytes. Staged with deterministic sf-independent content
    so DuckDB's read_blob reads the identical bytes; compared on
    (basename, size, md5-of-bytes). binaryFile parallelizes by file; at
    100 TB you shard many small media files per task and carry bytes as a
    column into the decode UDFs (multimodal_decode_features)."""
    import hashlib

    os.makedirs(_BINFILES_DIR, exist_ok=True)
    for i in range(20):
        payload = f"payload-{i}:{hashlib.md5(str(i).encode()).hexdigest()}".encode()
        fp = os.path.join(_BINFILES_DIR, f"f_{i:02d}.bin")
        # Deterministic bytes: concurrent stagers write identical content.
        with open(fp, "wb") as fh:
            fh.write(payload)
    df = spark.read.format("binaryFile").load(f"{_BINFILES_DIR}/*.bin")
    return df.select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("fname"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


AUDIO_WIN = 256   # samples per analysis window
AUDIO_HOP = 128   # hop between window starts

_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("w_idx", T.IntegerType()),
        T.StructField("w_start", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


@register(
    "multimodal_audio_window",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, {_BYTES_SQL} AS bytes,
               octet_length(encode(text)) AS n
        FROM documents WHERE text IS NOT NULL
    ),
    starts AS (
        SELECT doc_id, bytes, CAST(u.s AS INTEGER) AS w_start
        FROM b, unnest(generate_series(0, n - {AUDIO_WIN}, {AUDIO_HOP})) AS u(s)
        WHERE n >= {AUDIO_WIN}
    )
    SELECT doc_id,
           CAST(w_start / {AUDIO_HOP} AS INTEGER) AS w_idx,
           w_start,
           CAST(list_aggregate(list_transform(
                    list_slice(bytes, w_start + 1, w_start + {AUDIO_WIN}),
                    x -> CAST(x - 100 AS BIGINT) * CAST(x - 100 AS BIGINT)),
                'sum') AS BIGINT) AS energy
    FROM starts
    """,
    tags=("multimodal", "udf", "audio"),
)
def multimodal_audio_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style fixed-rate windowing over the binary payload: the
    payload bytes stand in for 8-bit PCM samples (centered at 100), framed
    into 256-sample windows at hop 128, per-window energy (Σ sample²)
    emitted — the framing layer under any spectral/VAD/fingerprint
    pipeline. As with the other multimodal ops the DECODE is the
    deterministic byte fake; the windowing math, Arrow batch shape, and
    fan-out schema are the real production plumbing.

    Inside the Pandas UDF the framing is a numpy sliding-window view
    (as_strided, zero-copy) + one vectorized square-sum per batch — no
    per-sample Python. Windows fan out as rows, not byte copies: a doc
    carries ~n/128 narrow rows downstream, payload dropped at the UDF
    boundary. Integer energy ⇒ engine-exact, so the whole path is
    hash-differential against a SQL re-derivation."""
    import numpy as np

    m = media_table(spark, sf_dir).select("doc_id", "payload")

    def window_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, wstart, energy = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL media row: nothing to frame
                    continue
                samples = (
                    np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                    - 100
                )
                n = samples.shape[0]
                if n < AUDIO_WIN:
                    continue
                n_win = (n - AUDIO_WIN) // AUDIO_HOP + 1
                view = np.lib.stride_tricks.as_strided(
                    samples,
                    shape=(n_win, AUDIO_WIN),
                    strides=(samples.strides[0] * AUDIO_HOP, samples.strides[0]),
                )
                e = (view * view).sum(axis=1)
                ids.extend([doc_id] * n_win)
                widx.extend(range(n_win))
                wstart.extend(range(0, n_win * AUDIO_HOP, AUDIO_HOP))
                energy.extend(e.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "w_idx": pd.Series(widx, dtype="int32"),
                    "w_start": pd.Series(wstart, dtype="int32"),
                    "energy": pd.Series(energy, dtype="int64"),
                }
            )

    return m.mapInPandas(window_batches, _AUDIO_SCHEMA)


_PHASH_CHUNKS = 8  # signature dimensions (chunk byte-sums, mod 256)


def _phash_oracle() -> str:
    # Chunk j covers 1-indexed char positions (j*L//8, (j+1)*L//8]; the
    # fixture text is ASCII so ascii(char) == byte value and the SQL
    # signature equals the Spark-side byte-chunk signature exactly.
    sigs = ",\n             ".join(
        f"CASE WHEN text IS NULL THEN NULL ELSE "
        f"CAST(coalesce(list_aggregate(list_slice(bytes,"
        f" ({j} * n) // {_PHASH_CHUNKS} + 1,"
        f" (({j} + 1) * n) // {_PHASH_CHUNKS}), 'sum'), 0) % 256"
        f" AS BIGINT) END"
        f" AS s{j}"
        for j in range(_PHASH_CHUNKS)
    )
    half = _PHASH_CHUNKS // 2
    band_cols = ", ".join(f"s{j}" for j in range(half))
    all_cols = ", ".join(f"s{j}" for j in range(_PHASH_CHUNKS))
    # NULL media rows carry NULL signatures and must never band together
    # (LEFT JOIN; NULL band keys match nothing) — same masking as the
    # Spark side's NULL-window guard.
    return f"""
    WITH src AS (
      SELECT doc_id, text, {_BYTES_SQL} AS bytes,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
             {sigs}
      FROM src
    ),
    keyed AS (
      SELECT doc_id,
             CASE WHEN s0 IS NULL THEN NULL
                  ELSE concat_ws('-', {all_cols}) END  AS phash,
             CASE WHEN s0 IS NULL THEN NULL
                  ELSE concat_ws('-', {band_cols}) END AS band_key
      FROM sig
    ),
    bands AS (
      SELECT band_key, CAST(count(*) AS BIGINT) AS n_band
      FROM keyed WHERE band_key IS NOT NULL GROUP BY band_key
    )
    SELECT k.doc_id, k.phash, k.band_key, b.n_band,
           CASE WHEN k.band_key IS NULL THEN FALSE
                ELSE b.n_band >= 2 END AS dup_candidate
    FROM keyed k LEFT JOIN bands b USING (band_key)
    """


_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.StringType()),
        T.StructField("band_key", T.StringType()),
    ]
)


@register("multimodal_phash_dedup", oracle=_phash_oracle(), tags=("multimodal", "dedup"))
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over binary media — the
    image-dedup shape: decode → fixed-length signature → LSH-style band
    bucketing, no pairwise comparison anywhere.

    The "pHash" here is the deterministic stand-in this container allows
    (no codecs): the payload is split into {_PHASH_CHUNKS} equal byte
    ranges and each chunk's byte-sum mod 256 becomes one signature
    dimension — structurally the same locality property as a real
    dHash/pHash (similar payloads ⇒ similar chunk sums), computed inside
    the same Arrow-batched mapInPandas a PIL/ffmpeg decode would occupy
    (swap decode_payload_stub-style; signature math is numpy over the
    byte buffer, no per-byte Python).

    Scale shape: signatures are computed partition-locally in ONE Arrow
    stage; candidate marking is a count-over-window on band_key — NOT a
    groupBy + self-join, because Spark plans are trees and a self-join
    would re-run the Python signature stage for the second branch
    (asserted in tests/test_plans.py: exactly one MapInPandas). One
    shuffle total (the band_key partitioning), payload bytes never cross
    the wire, and no pairs are ever formed. The oracle recomputes the
    identical signature in SQL (ASCII fixture ⇒ char codes are bytes),
    so decode, banding, and candidate marking are all
    hash-gate-checked."""
    import numpy as np

    m = media_table(spark, sf_dir).select("doc_id", "payload")
    half = _PHASH_CHUNKS // 2

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            phashes, bands = [], []
            for p in pdf["payload"]:
                if p is None:  # NULL media row: NULL signature, no band
                    phashes.append(None)
                    bands.append(None)
                    continue
                buf = np.frombuffer(p, dtype=np.uint8)
                n = len(buf)
                bounds = [(j * n) // _PHASH_CHUNKS for j in range(_PHASH_CHUNKS + 1)]
                sums = [
                    int(buf[bounds[j] : bounds[j + 1]].sum(dtype=np.int64)) % 256
                    for j in range(_PHASH_CHUNKS)
                ]
                phashes.append("-".join(str(s) for s in sums))
                bands.append("-".join(str(s) for s in sums[:half]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "phash": phashes,
                    "band_key": bands,
                }
            )

    from pyspark.sql import Window

    keyed = m.mapInPandas(phash_batches, _PHASH_SCHEMA)
    n_band = F.count(F.lit(1)).over(Window.partitionBy("band_key"))
    # NULL media rows have no signature: they must never band together
    # (Spark's window, like SQL GROUP BY, pools NULL keys into ONE group,
    # which would mark all NULL-payload docs mutual duplicates) — mask
    # them to (NULL n_band, false), mirrored in the oracle's LEFT JOIN.
    has_sig = F.col("band_key").isNotNull()
    return keyed.select(
        "doc_id",
        "phash",
        "band_key",
        F.when(has_sig, n_band).alias("n_band"),
        F.when(has_sig, n_band >= 2).otherwise(F.lit(False)).alias("dup_candidate"),
    )
