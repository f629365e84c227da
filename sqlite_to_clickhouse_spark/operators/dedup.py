"""Deduplication operators for training-data pipelines (SURVEY.md §2b:
dedup_* family; the reference's only dedup is ReplacingMergeTree
last-write-wins, /root/reference/main.py:65,178 — see windows.dedup_replacing
for that analog; this module is the content-dedup family an LLM corpus
needs).

Scale design:
- `dedup_exact` is a hash shuffle on a 256-bit digest — O(n), the digest
  is the shuffle key so byte-identical docs co-locate regardless of size.
- `dedup_fuzzy_minhash` is real LSH: signatures are computed with array
  lambdas (no shuffle), candidate generation shuffles only (band_id,
  band_key) buckets, and the exact-Jaccard verification runs on candidate
  pairs, never all pairs. All-pairs O(n²) appears ONLY in the DuckDB
  oracle (which must enumerate ground truth at toy scale).
- Hash family is switchable (``spark.graft.minhash.hash``): md5 (default)
  is bit-identical in Spark and DuckDB, which is what lets the LSH
  pipeline be differentially tested end-to-end; xxhash64 is the
  production spelling (codegen'd intrinsic, no digest-string decode,
  same plan shape — tests/test_minhash_property.py pins exact-dup
  recovery and plan-shape parity, bench.py A/Bs the two).

MinHash/LSH parameters: 48 hash functions, 4 bands × 12 rows, Jaccard
threshold 0.95. Band-collision probability is J¹², so a J=0.99 pair is
caught with P = 1-(1-0.99¹²)⁴ ≈ 0.9998, a J=0.95 pair with ≈ 0.955,
while a J=0.8 pair collides with only P ≈ 0.25 and J=0.7 with ≈ 0.05.
The steep r=12 curve matters because realistic corpora (and the
synthetic fixture) contain mountains of moderate-similarity pairs: with
the naive 2-rows-per-band scheme the fixture produced 11.3M candidates
from 5 000 docs (90 % of all pairs, LSH degenerated to the O(n²) plan it
exists to avoid); r=8×6 still admitted 4.1M (33 %); r=12×4 admits ~1.5M
while keeping near-exact dups — the threshold band the 0.95 cutoff
actually targets — at >99.9 % recall.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark import io as gio
from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.registry import register

N_HASHES = 48
N_BANDS = 4
ROWS_PER_BAND = 12
JACCARD_T = 0.95
SIMHASH_BITS = 24
# Affine universal-hash family for the minhash signatures: one md5 per
# token (the 60-bit base hash also used by the verify stage), then per
# seed s the cheap 64-bit arithmetic (2s+1)·h + b_s mod M31 — instead of
# 48 md5 calls per token. Identical in DuckDB, so the construction stays
# differentially testable.
MERSENNE31 = 2_147_483_647
AFFINE_MULT = 2_654_435_761  # Knuth's 2^32/phi multiplier for b_s spread


def _tokens(col):
    return F.filter(F.split(col, " "), lambda t: t != "")


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, sha256(text) AS content_hash
    FROM documents
    WHERE doc_id IN (
      SELECT MIN(doc_id) FROM documents GROUP BY sha256(text)
    )
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest: keep the lowest doc_id per sha256.

    One shuffle on the digest; the window rank never materializes groups
    (per-partition sort scan). Deterministic keeper (min doc_id) rather
    than dropDuplicates' arbitrary-first — required for the differential
    check and for reproducible pipelines under retries.
    """
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        d.select("doc_id", F.sha2(F.col("text"), 256).alias("content_hash"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_hash")
    )


_JACCARD_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                 / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))), 6) AS jaccard
    FROM toks a JOIN toks b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
          / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) >= {JACCARD_T}
"""


def _ranked_postings(toks: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """Postings with the machinery for exact prefix filtering.

    Each document's distinct tokens are ranked rarest-first under a global
    total order (document frequency within the language, token string as
    tie-break) — the ordering from the ALL-PAIRS / PPJoin family. Output
    columns per posting: doc_id, lang, token, sz (doc's set size), rank
    (1-based position in the global order), and o = ceil(t·sz), the
    minimum overlap a partner must share with THIS doc at threshold
    t = t_num/t_den. o is computed in integer arithmetic ((t_num·sz +
    t_den − 1) div t_den): a float ceil(0.95·20) = ceil(19.000…004) = 20
    would SHORTEN the prefix below the theorem's bound and silently drop
    true pairs.
    """
    sized = toks.withColumn("sz", F.size("tk").cast("long"))
    postings = sized.select("doc_id", "lang", "sz", F.explode("tk").alias("token"))
    df_counts = postings.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "token")
    return (
        postings.join(df_counts, ["lang", "token"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("o", F.expr(f"({t_num} * sz + {t_den} - 1) div {t_den}"))
    )


def jaccard_prefix_candidates(toks: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs for an exact Jaccard-threshold join,
    via symmetric prefix filtering.

    Theorem (prefix filter): if |A∩B| ≥ o, the first |A|−o+1 tokens of A
    and the first |B|−o+1 of B under a shared total order intersect.
    J(A,B) ≥ t implies |A∩B| ≥ ceil(t·max(|A|,|B|)) ≥ ceil(t·|X|) for
    each side X, so joining only prefix postings (rank ≤ sz − o + 1) loses
    no qualifying pair — the result is EXACT, not approximate. A stopword
    with df ≈ n ranks last in every document and never enters a prefix,
    which removes the O(df²) hot-token blowup of the naive inverted-index
    join. The size-ratio filter (t·max ≤ min, also implied by J ≥ t) cuts
    cross-size pairs before the shuffle output materializes.
    """
    prefix = _ranked_postings(toks, t_num, t_den).filter(
        F.col("rank") <= F.col("sz") - F.col("o") + 1
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                t_den * F.least(F.col("a.sz"), F.col("b.sz"))
                >= t_num * F.greatest(F.col("a.sz"), F.col("b.sz"))
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("llm", "dedup"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs within each language shard.

    Two-stage exact plan (Vernica–Carey–Li shape): (1) candidate pairs
    from a prefix-filtered inverted index — see jaccard_prefix_candidates
    for the theorem; hot tokens never enter prefixes, so no posting-list
    self-join blowup — then (2) exact verification of only the candidates
    against the full token arrays. Both stages are exact, so the oracle
    remains the direct all-pairs enumeration (fine at toy scale) with no
    construction mirroring needed.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.array_distinct(_tokens(F.col("text"))).alias("tk"),
    )
    cand = jaccard_prefix_candidates(toks, 19, 20)  # 19/20 == 0.95 exactly
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("tk").alias("tk_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("tk").alias("tk_b"))
    n_inter = F.size(F.array_intersect("tk_a", "tk_b")).cast("long")
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("n_inter", n_inter)
        .withColumn("sz_a", F.size("tk_a").cast("long"))
        .withColumn("sz_b", F.size("tk_b").cast("long"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
    )
    return (
        verified.filter(jac >= JACCARD_T)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _minhash_oracle(pair_pred: str = "TRUE", threshold: float = JACCARD_T) -> str:
    band_pairs = ", ".join(
        f"CAST(('0x' || substring(md5('{i}|' || "
        + " || '|' || ".join(
            f"CAST(sig[{i * ROWS_PER_BAND + r + 1}] AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        )
        + "), 1, 15)) AS BIGINT)"
        for i in range(N_BANDS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, tk,
             list_transform(tk,
               t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)) AS tkh
      FROM toks
    ),
    hashed32 AS (
      SELECT doc_id, tkh,
             list_distinct(list_transform(tkh, h -> h & 2147483647)) AS tk32
      FROM hashed
    ),
    sigs AS (
      SELECT doc_id, tkh,
             list_transform(range({N_HASHES}),
               s -> list_aggregate(
                      list_transform(tkh,
                        h -> ((2 * s + 1) * (h % {MERSENNE31})
                              + (s * {AFFINE_MULT}) % {MERSENNE31})
                             % {MERSENNE31}),
                      'min')) AS sig
      FROM hashed
    ),
    bands AS (
      SELECT s.doc_id, h.tk32, unnest([{band_pairs}]) AS bk
      FROM sigs s JOIN hashed32 h ON s.doc_id = h.doc_id
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.tk32 AS tk_a, b.tk32 AS tk_b
      FROM bands a JOIN bands b
        ON a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(len(list_intersect(tk_a, tk_b)) AS DOUBLE)
                 / (len(tk_a) + len(tk_b) - len(list_intersect(tk_a, tk_b))), 6) AS jaccard
    FROM cand
    WHERE CAST(len(list_intersect(tk_a, tk_b)) AS DOUBLE)
          / (len(tk_a) + len(tk_b) - len(list_intersect(tk_a, tk_b))) >= {threshold}
      AND ({pair_pred})
    """


@register("dedup_fuzzy_minhash", oracle=_minhash_oracle(), tags=("llm", "dedup"))
def dedup_fuzzy_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, exact-Jaccard verified.

    Pipeline (shingle → exact-set collapse → minhash → band →
    bucket-join → verify → expand; the collapse/expand stages are the
    round-8 addition — see minhash_lsh_pairs, which documents why only
    one representative per distinct token set enters banding):
    1. distinct tokens per doc (the 1-gram shingle set), one md5 per
       token → 60-bit base hash (shared with the verify stage);
    2. 48 affine min-hashes per doc — (2s+1)·h + b_s mod M31 over the
       base hashes, pure codegen'd long arithmetic (the md5-per-seed
       variant spent ~40 % of the whole pipeline hashing);
    3. 4 band keys (12 sig rows each) per doc, exploded. The band id is
       folded INTO a band md5 and the digest truncated to a 60-bit long,
       so the bucket join hashes/compares 8-byte integers, not 32-char
       strings in a struct;
    4. self-join on the long band key carrying ONLY (doc_id, key) —
       then distinct (doc_a, doc_b). Token arrays are deliberately NOT
       carried here: a pair can collide in up to 4 bands, so rows
       entering the distinct are multiplied, and hauling two token
       arrays per raw collision is what turns LSH into a multi-GB
       shuffle.
    5. join the slim verified-candidate list back to the token table
       (tiny vs. the pair list — the planner broadcasts it at bench
       scale, and at cluster scale it degrades to a clean shuffle join
       on doc_id) and compute exact token-set Jaccard, threshold 0.95.
       The verify intersects md5-derived token hashes masked to 31
       bits and held as array<int> — not strings, not longs: int
       arrays pack at 4 B/element in Tungsten, halving the per-pair
       bytes hauled through the verify join's shuffle (the stage that
       spilled at the 100× scale check). The mask + distinct is
       mirrored in the oracle, so any in-doc collision (P ≈ 1e-5 per
       doc) merges identically on both sides.

    The oracle runs the SAME md5-minhash construction in DuckDB, so the
    candidate sets match bit-for-bit and the whole LSH path — not just
    the final Jaccard — is differentially tested.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.array_distinct(_tokens(F.col("text"))).alias("tk"))
    return minhash_lsh_pairs(toks, "doc_id", "tk").select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "jaccard",
    )


def _minhash_family(hash_mode: str):
    """The switchable base/band hash closures — the ONLY thing that
    differs between the md5 gate spelling and the xxhash64 production
    spelling (see minhash_lsh_pairs docstring)."""
    if hash_mode == "md5":

        def _base_hash(t):
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")

        def _band_key(i, parts):
            return F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(str(i)), *parts)), 1, 15
                ),
                16,
                10,
            ).cast("long")
    else:

        def _base_hash(t):
            return F.xxhash64(t)

        def _band_key(i, parts):
            return F.xxhash64(F.lit(i), *parts)

    return _base_hash, _band_key


def minhash_bands_tokens(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    hash_mode: str | None = None,
):
    """Signature/banding front half of the MinHash-LSH pipeline, shared by
    the one-shot pair search (minhash_lsh_pairs) and the persisted-index
    incremental path (minhash_index_build / minhash_index_dedup) — one
    implementation, so the two paths can never band differently.

    Returns ``(bands, tokh)``:

    - ``bands``: one row per (doc, band) — ``(__id, bk)`` with ``bk`` the
      8-byte band key.  Token-less documents (blank/whitespace text) are
      dropped here: their all-null signatures would otherwise share the
      constant empty-band keys and form ONE quadratic hot bucket (the
      classic LSH blank-document blowup), and their pairs are
      verify-stage no-ops anyway (NULL Jaccard).
    - ``tokh``: ``(__id, __tk32)`` — the doc's distinct 31-bit-masked
      token hashes as array<int> for the exact-Jaccard verify stage
      (4 B/element in Tungsten, half the shuffle bytes of longs).
    """
    if hash_mode is None:
        hash_mode = df.sparkSession.conf.get("spark.graft.minhash.hash", "md5")
    if hash_mode not in ("md5", "xxhash64"):
        raise ValueError(f"unknown minhash hash_mode: {hash_mode!r}")
    _base_hash, _band_key = _minhash_family(hash_mode)

    rows_per_band = n_hashes // n_bands
    toks = df.select(
        F.col(id_col).alias("__id"), F.col(tokens_col).alias("__tk")
    ).withColumn("__tkh", F.transform(F.col("__tk"), _base_hash))
    # Affine minhash over the md5-derived base hash: per seed s,
    # min((2s+1)·(h mod M31) + b_s mod M31). One md5 per token total
    # (shared with the verify stage's __tkh); the n_hashes mins are an
    # Arrow-batched pandas UDF doing the same exact int64 arithmetic as a
    # (seeds × tokens) numpy broadcast. The previous JVM spelling — an
    # n_hashes-wide array(array_min(transform(...))) tree — is evaluated
    # as interpreted higher-order functions (never whole-stage codegen)
    # and cost more to analyze+compile than to run at any SF; the kernel
    # is bit-identical (intermediates < 2^38, no int64 overflow) so the
    # DuckDB oracle is unchanged.
    from pyspark.sql import types as T

    seeds = np.arange(n_hashes, dtype=np.int64)
    mults = 2 * seeds + 1
    offs = (seeds * AFFINE_MULT) % MERSENNE31

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig_kernel(tkh: pd.Series) -> pd.Series:
        out = []
        for arr in tkh:
            if arr is None:  # NULL text -> NULL token array -> NULL signature
                out.append([None] * len(seeds))
                continue
            h = np.asarray(arr, dtype=np.int64) % MERSENNE31
            if h.size == 0:
                out.append([None] * len(seeds))
                continue
            m = (mults[:, None] * h[None, :] + offs[:, None]) % MERSENNE31
            out.append(m.min(axis=1))
        return pd.Series(out)

    # Drop token-less docs (blank/whitespace/NULL text) BEFORE the kernel,
    # on the token array itself: the old spelling filtered on
    # element_at(sig, 1).isNotNull() AFTER the kernel, and the optimizer
    # pushed that filter below the caller's representative join — dragging
    # a SECOND full-corpus ArrowEvalPython evaluation of the kernel with it
    # (guide §4.4 duplicated-UDF; plans/r13 fuzzy_minhash before/after:
    # the kernel over the raw documents scan is gone).  Equivalent by
    # construction: sig[1] is NULL iff the token array is NULL or empty
    # (the kernel emits [None]*n for both), and non-empty arrays always
    # produce non-NULL mins.  size() covers NULL under both ANSI (NULL)
    # and legacy (-1) semantics — neither passes > 0.
    sigs = toks.filter(F.size("__tk") > 0).withColumn(
        "sig", _sig_kernel(F.col("__tkh"))
    )
    band_keys = F.array(
        *[
            _band_key(
                i,
                [
                    F.element_at("sig", i * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
            )
            for i in range(n_bands)
        ]
    )
    # No persist: the band table feeds both sides of the self-join, and the
    # r1-era persist here was a 4× win when signatures were an interpreted
    # md5-per-seed expression tree. After the affine+Arrow kernel rework the
    # subtree is cheap to recompute, and an r5 A/B at 10× measured the
    # persist at 73 s vs 32 s without (materialization + InMemoryRelation
    # scan costs dominate recompute; at 1× the difference is noise). Let
    # both join branches pipeline from the scan.
    bands = sigs.select("__id", F.explode(band_keys).alias("bk"))
    tokh = toks.select(
        "__id",
        F.array_distinct(
            F.transform(
                "__tkh", lambda h: h.bitwiseAND(F.lit(MERSENNE31)).cast("int")
            )
        ).alias("__tk32"),
    )
    return bands, tokh


def _bucket_pairs(bands: DataFrame) -> DataFrame:
    """Within-bucket candidate pairs (id_a < id_b) from a (__id, bk) band
    relation — the LSH self-join restructured as ONE pass (r13, VERDICT
    r12 item 3): groupBy the band key, collect the bucket's distinct ids,
    expand i<j pairs with JVM higher-order functions.  The classic
    ``bands.alias("a").join(bands.alias("b"), a.bk == b.bk & a.id < b.id)``
    evaluates the bands SUBTREE — scan + representative join + the
    ArrowEvalPython signature kernel — once per join side; this shape
    consumes it once, and shuffles the thin (bk, id) rows once instead of
    twice.  Exactly the join's candidate set: collect_set dedupes the
    (id, bk) duplicates a two-band collision produces (the join's
    duplicates die in the downstream pair-distinct anyway), sort + slice
    enumerates each unordered pair once with id_a < id_b, and NULL band
    keys are dropped as SQL join equality would (bk is never NULL
    post-banding, but the filter keeps the equivalence unconditional)."""
    ids = F.sort_array(F.collect_set("__id"))
    buckets = (
        bands.filter(F.col("bk").isNotNull())
        .groupBy("bk")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return buckets.select(F.explode(pair_arr).alias("p")).select(
        F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")
    )


def _packed_distinct(pairs: DataFrame) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b in, ids < 2^32): pack the
    pair into ONE long so the dedup shuffle hashes a single 8-byte key —
    a pair can collide in up to n_bands bands, so rows entering the
    distinct are multiplied, and this stage's bytes dominate the LSH
    shuffle."""
    return (
        pairs.select(
            (F.col("id_a") * F.lit(2**32) + F.col("id_b")).alias("pair")
        )
        .dropDuplicates()
        .select(
            F.expr(f"pair div {2**32}").alias("id_a"),
            (F.col("pair") % F.lit(2**32)).alias("id_b"),
        )
    )


def _verify_jaccard(
    cand: DataFrame,
    tokh: DataFrame,
    threshold: float,
    tokh_b: "DataFrame | None" = None,
) -> DataFrame:
    """Exact-Jaccard verification of a slim candidate list against the
    (__id, __tk32) token store: join the candidates back to the tokens
    (tiny vs. the raw collision list — the planner broadcasts it at bench
    scale, and at cluster scale it degrades to a clean shuffle join on
    doc id) and threshold on the exact token-set Jaccard.  Verifying on
    31-bit int arrays (4 B/element) rather than longs halves the bytes
    hauled through this join's shuffle — the one stage that spilled at
    the 100× scale check (SURVEY §6.1).  The mask + distinct is mirrored
    in the DuckDB oracle (hashed32 CTE).

    ``tokh_b``: optional separate token store for the id_b side (the
    index-lookup path, where id_a is a batch doc and id_b an index
    doc); defaults to ``tokh`` for the symmetric self-join case."""
    ta = tokh.alias("ta")
    tb = (tokh if tokh_b is None else tokh_b).alias("tb")
    pairs = (
        cand.join(ta, F.col("id_a") == F.col("ta.__id"))
        .join(tb, F.col("id_b") == F.col("tb.__id"))
        .select(
            "id_a", "id_b",
            F.col("ta.__tk32").alias("tk_a"), F.col("tb.__tk32").alias("tk_b"),
        )
    )
    n_inter = F.size(F.array_intersect("tk_a", "tk_b")).cast("double")
    # try_divide: two EMPTY token sets (blank documents band together via
    # their all-null signatures) make the union size 0 — NULL Jaccard,
    # which the threshold filter drops, exactly like the oracle where
    # DuckDB division by zero yields NULL. Never a candidate, never a
    # crash (ANSI mode turns bare / into DIVIDE_BY_ZERO).
    jac = F.try_divide(n_inter, F.size("tk_a") + F.size("tk_b") - n_inter)
    return pairs.filter(jac >= threshold).select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    )


def _resolve_hash_mode(df: DataFrame, hash_mode: "str | None") -> str:
    if hash_mode is None:
        hash_mode = df.sparkSession.conf.get("spark.graft.minhash.hash", "md5")
    if hash_mode not in ("md5", "xxhash64"):
        raise ValueError(f"unknown minhash hash_mode: {hash_mode!r}")
    return hash_mode


def _set_keyed(df: DataFrame, id_col: str, tokens_col: str, base_hash) -> DataFrame:
    """(__id, __set) for every non-blank doc, where __set is the doc's
    FULL sorted distinct token-hash array — the exact cluster key of the
    round-8 collapse.  Same token SET ⟹ same __set ⟹ same minhash
    signature ⟹ same band keys, so clustering on __set is lossless for
    candidate generation by construction (never probabilistic: the key
    is the array itself, not a hash of it).  Blank/NULL docs are dropped
    here exactly as the banding stage drops them."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.array_sort(
            F.array_distinct(F.transform(F.col(tokens_col), base_hash))
        ).alias("__set"),
    ).filter(F.size("__set") > 0)


def _persist_md(df: DataFrame, persisted_out: "list | None" = None) -> DataFrame:
    """MEMORY_AND_DISK persist that optionally RECORDS the persisted frame
    in ``persisted_out`` so a looping caller (stream_incremental_dedup's
    foreachBatch — one lookup+append per micro-batch, for the lifetime of
    a production stream) can unpersist batch-scoped frames after each
    batch materializes.  Disk-backed blocks are not auto-evicted, so
    without the hand-back a long-running stream accumulates cached blocks
    unboundedly (ADVICE r8).  One-shot callers pass nothing and rely on
    session teardown, as before."""
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if persisted_out is not None:
        persisted_out.append(df)
    return df


def _clusters(keyed: DataFrame, persisted_out: "list | None" = None) -> DataFrame:
    """(__id, __rep) membership: representative = min id per distinct
    set.  groupBy gets map-side partial aggregation (a boilerplate
    cluster collapses before the wire); the join back is doc-linear.
    (r13 note: a window-min spelling — one exchange instead of
    groupBy+join — was interleaved-A/B'd on the streaming handler cycle
    and came out a wash locally while adding a full array-key SORT for
    corpus-scale callers, so the hash-aggregation shape stays.)

    PERSISTED (memory-and-disk): every caller fans the membership into
    3-5 downstream joins (rep filter, two expansion sides, within-pairs
    expansion), and each re-evaluation would repeat the array-keyed
    groupBy+join over the full token-hash arrays — measured 2x whole-op
    wall at sf0.1 when left to recompute.  The frame is two longs per
    doc (tiny relative to the arrays it derives from), identical plans
    share one cache entry across invocations, and eviction is safe (it
    recomputes)."""
    reps = keyed.groupBy("__set").agg(F.min("__id").alias("__rep"))
    return _persist_md(keyed.join(reps, "__set").select("__id", "__rep"),
                       persisted_out)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    threshold: float = JACCARD_T,
    hash_mode: str | None = None,
) -> DataFrame:
    """Generic MinHash-LSH near-dup pairs (library API): rows (id, token
    array) in, verified pairs (id_a, id_b, jaccard >= threshold) out.

    Requires ids < 2^32 (pairs are packed into one 64-bit key for the
    dedup shuffle). Plan shape and rationale: see dedup_fuzzy_minhash.

    ``hash_mode`` picks the base/band hash family — the ONLY thing that
    changes; the plan (scan → sig kernel → band explode → bucket
    self-join → distinct → verify join) is identical either way:

    - ``"md5"`` (default): md5 truncated to a 60-bit long.  Bit-identical
      in DuckDB, which is what lets the whole LSH path be differentially
      gate-tested — the correctness spelling.
    - ``"xxhash64"``: Spark's codegen'd 64-bit xxHash intrinsic — no
      digest string, no substring/conv decode, ~5× cheaper per token.
      The production spelling for a 100 TB corpus, where the md5 forest
      is pure gate tax; not DuckDB-reproducible, so it is covered by the
      exact-dup-recovery + plan-shape-parity tests and the bench A/B
      (bench.py ``derived.minhash_md5_sec``) instead of the oracle.

    When ``hash_mode`` is None it resolves from the session conf key
    ``spark.graft.minhash.hash`` (default ``md5``), so a deployment flips
    the fleet with one conf line and the gate keeps the md5 default.

    **Exact-set collapse (round 8).** Identical token SETS share the
    signature, the band keys, AND the Jaccard against every third doc —
    so only one REPRESENTATIVE per distinct set enters banding, and the
    cluster structure answers the rest analytically: within-cluster
    pairs are J=1.0 by identity, and each verified representative pair
    expands to all member cross pairs carrying the same Jaccard.  This
    is the dedup_simhash_nn collapse applied to MinHash, and it is what
    keeps boilerplate-heavy corpora (the 100 TB norm) from going
    cluster-quadratic through the band join: the sf0.1 fixture's 248-doc
    exact cluster alone contributed ~246 k of the 3.3 M pre-collapse
    collision rows, and the verify stage intersected 2.05 M candidate
    pairs where ~2 k representative pairs carried all the information
    (measured round 8: 4.4 s → see bench).  Clustering groups by the
    full sorted token-hash array — NOT a hash of it — so the collapse
    is exact by construction, never probabilistic, and the result is
    bit-identical to the uncollapsed plan (pinned by the property tests
    and the unchanged DuckDB oracle, which still enumerates the
    uncollapsed construction)."""
    hash_mode = _resolve_hash_mode(df, hash_mode)
    _base_hash, _ = _minhash_family(hash_mode)

    members = _clusters(_set_keyed(df, id_col, tokens_col, _base_hash))
    rep_ids = members.filter(F.col("__id") == F.col("__rep")).select("__rep")
    rep_df = df.join(rep_ids, F.col(id_col) == F.col("__rep")).drop("__rep")
    bands, tokh = minhash_bands_tokens(
        rep_df, id_col, tokens_col,
        n_hashes=n_hashes, n_bands=n_bands, hash_mode=hash_mode,
    )
    cand = _packed_distinct(_bucket_pairs(bands))
    rep_pairs = _verify_jaccard(cand, tokh, threshold)

    # Expand representative pairs to member cross pairs (output-bound
    # joins on 8-byte ids; clusters are disjoint so no duplicates), and
    # emit within-cluster pairs analytically at J=1.0.
    ma = members.select(F.col("__rep").alias("id_a"), F.col("__id").alias("__a"))
    mb = members.select(F.col("__rep").alias("id_b"), F.col("__id").alias("__b"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("__a", "__b").alias("id_a"),
            F.greatest("__a", "__b").alias("id_b"),
            "jaccard",
        )
    )
    # Within-cluster pairs via the same one-pass bucket expansion as the
    # band join (r13): members bucketed by their rep instead of a
    # two-legged self-join of the cached membership.
    within = _bucket_pairs(
        members.select("__id", F.col("__rep").alias("bk"))
    ).select("id_a", "id_b", F.lit(1.0).alias("jaccard")).filter(
        F.lit(1.0) >= F.lit(threshold)
    )
    return cross.unionByName(within)


# ---------------------------------------------------------------------------
# Incremental dedup: persisted MinHash band index + new-batch serving path
# (VERDICT r7 item 4).  A production pipeline does not re-scan 100 TB per
# ingest — it dedups each NEW batch against a persisted signature index
# (the sim_index_build pattern, similarity.py): band keys partition the
# index on disk, a batch probes only its own buckets (static partition
# pruning), and the index grows by parquet APPEND — never a rewrite.
#
# Index schema v2 (round 8): the exact-set collapse is PERSISTED.  Three
# relations:
#   bands/   (bk, doc_id, pb)        — doc_id is a cluster REPRESENTATIVE;
#                                      one band row per band per DISTINCT
#                                      token set, partitioned by pb.
#   tokens/  (doc_id, tk32, rep_id)  — every banded member doc with its
#                                      verify-stage token hashes and its
#                                      cluster representative.
#   sets/    (skey, rep_id)          — one row per distinct token set;
#                                      skey is the FULL sorted token-hash
#                                      array (exact, never a hash of it),
#                                      consulted at append time so a new
#                                      doc identical to an indexed set
#                                      joins that cluster instead of
#                                      spawning a duplicate representative.
# A 248-member boilerplate cluster therefore costs 4 band rows and one
# verify per colliding probe — not 248 of each — and the lookup expands
# representative pairs to member pairs through `tokens/` (output-bound
# joins on 8-byte ids).  Lossless by the same theorem as the in-memory
# collapse: identical sets share signature and band keys.
# ---------------------------------------------------------------------------

MINHASH_IDX_BUCKETS = 32  # on-disk partitions of the band table (pb = bk mod B)
INCR_MOD, INCR_REM = 10, 7  # registered split: batch = doc_id % 10 == 7

_IDX_BANDS_SCHEMA = "bk long, doc_id long, pb int"
_IDX_TOKENS_SCHEMA = "doc_id long, tk32 array<int>, rep_id long"
_IDX_SETS_SCHEMA = "skey array<bigint>, rep_id long"
_IDX_RELATIONS = ("bands", "tokens", "sets")


def _read_idx(
    spark: SparkSession,
    path: str,
    rel: str,
    schema: str,
    *,
    partitioned: bool = False,
) -> DataFrame:
    """Manifest-resolved scan of one index relation; an unwritten
    relation (empty-corpus build: an empty partitionBy write emits no
    files) reads as an empty frame with the declared schema."""
    df = gio.read_relation(spark, path, rel, schema, partitioned=partitioned)
    return df if df is not None else spark.createDataFrame([], schema)


def _band_frame(bands: DataFrame) -> DataFrame:
    return bands.select(
        F.col("bk"),
        F.col("__id").alias("doc_id"),
        F.pmod(F.col("bk"), F.lit(MINHASH_IDX_BUCKETS)).cast("int").alias("pb"),
    )


def _member_tokens(df, id_col, tokens_col, members, hash_mode) -> DataFrame:
    """tokens/ rows for the given membership: (doc_id, tk32, rep_id).
    Only banded (non-blank) members — blank docs never verify, and
    storing them would recreate the blank hot bucket ON DISK."""
    _, tokh = minhash_bands_tokens(df, id_col, tokens_col, hash_mode=hash_mode)
    return (
        tokh.join(members, "__id")
        .filter(F.size("__tk32") > 0)
        .select(
            F.col("__id").alias("doc_id"),
            F.col("__tk32").alias("tk32"),
            F.col("__rep").alias("rep_id"),
        )
    )


def _rep_subset(df: DataFrame, id_col: str, rep_ids: DataFrame) -> DataFrame:
    """Filter ``df`` to representative rows (rep_ids: one __rep column)."""
    return df.join(rep_ids, F.col(id_col) == F.col("__rep")).drop("__rep")


def minhash_index_build(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    path: str,
    *,
    hash_mode: str | None = None,
) -> None:
    """Persist the MinHash signature index for a corpus at ``path`` (see
    the schema-v2 comment above).  Uses the SAME banding front half as
    the one-shot search (minhash_bands_tokens), so index lookups
    reproduce minhash_lsh_pairs bit-for-bit."""
    hash_mode = _resolve_hash_mode(df, hash_mode)
    base_hash, _ = _minhash_family(hash_mode)
    from pyspark.storagelevel import StorageLevel

    keyed = _set_keyed(df, id_col, tokens_col, base_hash)
    # sets feeds the sets/ write AND the membership join; members feeds
    # the rep filter AND the tokens/ write — persist both so the
    # array-keyed aggregation runs once per build (the _clusters lesson).
    sets = (
        keyed.groupBy("__set")
        .agg(F.min("__id").alias("__rep"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    members = (
        keyed.join(sets, "__set")
        .select("__id", "__rep")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rep_ids = members.filter(F.col("__id") == F.col("__rep")).select("__rep")
    bands, _ = minhash_bands_tokens(
        _rep_subset(df, id_col, rep_ids), id_col, tokens_col, hash_mode=hash_mode
    )
    # Cluster by pb BEFORE the partitioned write (one shuffle of a thin
    # (bk, doc_id, pb) frame): a map-side partitionBy write emits one file
    # per (task × pb value) — ~700 KB-size files at 22 upstream tasks × 32
    # buckets — and every later lookup/append/compact pays the per-file
    # open cost (guide §6 small-files; measured: the corpus-bands scan ran
    # 538 tasks before, ≤32 row-group-sized files after).  Same layout the
    # compactor produces, so a fresh build now starts compact.
    # The three relation writes are independent jobs — submit them from
    # driver threads so each job's scheduling/commit tail back-fills the
    # others' idle cores (guide §2.6; sets/members are persisted, so the
    # shared aggregation still runs once, guarded by the block manager).
    gio.run_jobs(
        lambda: (
            _band_frame(bands)
            .repartition("pb")
            .write.partitionBy("pb")
            .option("maxRecordsPerFile", 5_000_000)
            .parquet(os.path.join(path, "bands"))
        ),
        lambda: _member_tokens(df, id_col, tokens_col, members, hash_mode)
        .write.parquet(os.path.join(path, "tokens")),
        lambda: sets.select(
            F.col("__set").alias("skey"), F.col("__rep").alias("rep_id")
        ).write.parquet(os.path.join(path, "sets")),
    )
    # Publish the initial snapshot: one atomic manifest listing every
    # relation's files — from here on, readers resolve manifests, never
    # directory listings (io.py manifest protocol, VERDICT r9 item 4).
    gio.manifest_commit(
        path,
        {rel: gio.relation_data_files(path, rel) for rel in _IDX_RELATIONS},
    )


def minhash_index_append(
    df_new: DataFrame,
    id_col: str,
    tokens_col: str,
    path: str,
    *,
    hash_mode: str | None = None,
    persisted_out: "list | None" = None,
    meta: "dict | None" = None,
    precomputed: "dict | None" = None,
) -> None:
    """Fold a processed batch INTO the index: parquet append of the
    batch's rows, then ONE atomic manifest publish covering all three
    relations.  Appends only add files — no committed file is rewritten
    or deleted — and a reader resolves the previous manifest until the
    publish lands, so it sees the whole batch or none of it (never a
    torn bands-without-tokens state).  A crash before the publish leaves
    the new files orphaned-but-invisible; the retry's commit lists only
    its own files (io.manifest_append), so there is no double-append
    window.  ``meta`` (e.g. ``{"epoch": id}``) rides the commit for
    retried-writer idempotence checks.

    Cluster maintenance: each new doc's set key is joined against
    ``sets/`` — a doc identical to an INDEXED set becomes a member of
    that cluster (one tokens/ row, no new bands); genuinely new sets
    cluster among themselves and append their representative's bands +
    sets rows.  Caller contract: the batch's ids are not already in the
    index (dedup first, then append the keepers).

    ``precomputed``: the ``shared_out`` dict a minhash_index_dedup call
    over the SAME batch just filled (guide §1.2) — reuses the lookup's
    persisted set-key frame and its representative band frame instead of
    re-running the token scan and the signature kernel.  Sound because
    banding is a pure function of the token set and append
    representatives (min id per fresh distinct set) are a subset of
    lookup representatives (min id per batch distinct set); guarded on
    matching hash_mode, ignored otherwise."""
    hash_mode = _resolve_hash_mode(df_new, hash_mode)
    base_hash, _ = _minhash_family(hash_mode)
    spark = df_new.sparkSession

    pre = (
        precomputed
        if precomputed and precomputed.get("hash_mode") == hash_mode
        else None
    )
    keyed = pre["keyed"] if pre else _set_keyed(df_new, id_col, tokens_col, base_hash)
    idx_sets = _read_idx(spark, path, "sets", _IDX_SETS_SCHEMA)
    # The matched/fresh split re-reads this subtree four ways (members
    # union, new sets, rep filter, tokens write) — persist the joined
    # frame once (the _clusters lesson; batch-sized, two longs + the key
    # array per row).
    m = _persist_md(
        keyed.join(idx_sets, keyed["__set"] == idx_sets["skey"], "left"),
        persisted_out,
    )
    matched = m.filter(F.col("rep_id").isNotNull()).select(
        "__id", F.col("rep_id").alias("__rep")
    )
    fresh_keyed = m.filter(F.col("rep_id").isNull()).select("__id", "__set")
    new_sets = _persist_md(
        fresh_keyed.groupBy("__set").agg(F.min("__id").alias("__rep")),
        persisted_out,
    )
    new_members = fresh_keyed.join(new_sets, "__set").select("__id", "__rep")
    members = matched.unionByName(new_members)
    rep_ids = new_members.filter(F.col("__id") == F.col("__rep")).select("__rep")
    if pre is not None:
        # Fresh-set representatives are a subset of the lookup's batch
        # representatives with identical ids (both min-id per distinct
        # set), and band keys depend only on the token set — so the
        # lookup's persisted band frame, semi-joined to the fresh reps,
        # IS this append's band frame, with no second kernel pass.
        bands = pre["rep_bands"].join(
            rep_ids, F.col("__id") == F.col("__rep"), "semi"
        )
    else:
        bands, _ = minhash_bands_tokens(
            _rep_subset(df_new, id_col, rep_ids), id_col, tokens_col,
            hash_mode=hash_mode,
        )
    with gio.manifest_append(path, list(_IDX_RELATIONS), meta=meta):
        # Same pb-clustering as the build write: an append lands one file
        # per pb partition it touches instead of (tasks × partitions)
        # shards, bounding the small-file growth rate per micro-batch.
        # Concurrent independent writes (guide §2.6): the manifest diff
        # runs after ALL of them complete, and a failure in any aborts
        # the commit (run_jobs re-raises), so atomicity is unchanged.
        gio.run_jobs(
            lambda: _band_frame(bands)
            .repartition("pb")
            .write.partitionBy("pb")
            .mode("append")
            .parquet(os.path.join(path, "bands")),
            lambda: _member_tokens(df_new, id_col, tokens_col, members, hash_mode)
            .write.mode("append")
            .parquet(os.path.join(path, "tokens")),
            lambda: new_sets.select(
                F.col("__set").alias("skey"), F.col("__rep").alias("rep_id")
            )
            .write.mode("append")
            .parquet(os.path.join(path, "sets")),
        )


_IDX_TOMB_SCHEMA = "doc_id long"


def _read_tombstones(spark: SparkSession, path: str) -> "DataFrame | None":
    """The index's tombstone relation, or None when no delete has ever
    been COMMITTED (the overwhelmingly common case — the None keeps the
    no-delete lookup plan byte-identical to pre-tombstone rounds).
    Manifest-resolved: a delete whose manifest publish didn't land is
    invisible, exactly like an uncommitted append."""
    return gio.read_relation(spark, path, "tombstones", _IDX_TOMB_SCHEMA)


def minhash_index_delete(ids: DataFrame, path: str, *, id_col: str = "doc_id") -> None:
    """Delete docs from the index by TOMBSTONE — the GDPR-shape
    counterpart of maintenance_delete_rows (etl.py) for the dedup index:
    a right-to-be-forgotten request must take effect immediately but
    must NOT force a rewrite of a 100 TB index.  The delete appends one
    tiny parquet file of doc_ids to ``tombstones/`` (new files only —
    same reader-safety contract as minhash_index_append); every lookup
    anti-joins the member store against it (and re-elects cluster
    representatives where needed, see minhash_index_dedup), so
    delete-then-lookup is bit-identical to rebuild-without-the-deleted
    (pinned in tests/test_minhash_property.py).  The next compaction
    (minhash_index_compact) physically drops tombstoned rows and clears
    the tombstone relation.  Contract: doc ids are never reused — a
    tombstone is forever until compaction."""
    with gio.manifest_append(path, ["tombstones"]):
        ids.select(F.col(id_col).cast("long").alias("doc_id")).write.mode(
            "append"
        ).parquet(os.path.join(path, "tombstones"))


def minhash_index_dedup(
    spark: SparkSession,
    df_new: DataFrame,
    id_col: str,
    tokens_col: str,
    path: str,
    *,
    threshold: float = JACCARD_T,
    hash_mode: str | None = None,
    persisted_out: "list | None" = None,
    shared_out: "dict | None" = None,
    exclude_ids: "DataFrame | None" = None,
) -> DataFrame:
    """Near-dup pairs of a NEW batch against the persisted index plus
    within the batch itself — the incremental serving path.  Returns
    (id_a, id_b, jaccard >= threshold), bit-identical to running
    minhash_lsh_pairs over (index corpus ∪ batch) and keeping the pairs
    that involve >= 1 batch doc (pinned by the append-twice property
    test): banding is deterministic and shared, so the candidate set
    decomposes exactly into batch×index (bucket join against the pruned
    index partitions) ∪ batch×batch (self-join of the small batch).

    Scale shape: both sides are COLLAPSED to cluster representatives —
    the index on disk (schema v2), the batch in-flight — so the bucket
    join carries one row per distinct set per band, the verify stage
    intersects token arrays once per representative pair, and member
    pairs materialize only in the final output-bound expansion joins on
    8-byte ids.  The probed pb set is collected driver-side (bounded by
    MINHASH_IDX_BUCKETS, a few ints) and lands in the bands scan as a
    static partition filter.  Nothing rescans the corpus text.

    ``shared_out`` (r12, guide §1.2 "don't compute things twice"): when a
    caller is about to APPEND the same batch right after this lookup (the
    streaming ingest handler), pass a dict and hand it to
    ``minhash_index_append(precomputed=...)`` — the batch's set-key pass
    and the signature-kernel banding of its representatives are computed
    once here and reused there (banding is a pure function of the token
    set, and append representatives are a subset of lookup
    representatives — both are min-id per distinct set).

    ``exclude_ids`` (r13, VERDICT r12 item 7 — the streaming retry
    window): a one-column frame of doc ids to treat as ABSENT from the
    index side.  A foreachBatch retry whose append already COMMITTED
    must reproduce the pairs the first attempt would have written, so
    the retry passes its own batch ids here — the member store is
    anti-joined (which also empties those clusters' verify rows and
    expansions), restoring exactly the pre-append lookup state (appends
    only ever add the batch's own rows).  None (the default) leaves the
    common-path plan untouched."""
    hash_mode = _resolve_hash_mode(df_new, hash_mode)
    base_hash, _ = _minhash_family(hash_mode)
    keyed = _set_keyed(df_new, id_col, tokens_col, base_hash)
    if shared_out is not None:
        # shared_out hands PERSISTED frames to a follow-up append, so the
        # caller must also take the unpersist handles — a looping caller
        # using shared_out alone would leak disk-backed cached blocks per
        # batch (ADVICE r12).
        if persisted_out is None:
            raise ValueError("shared_out requires persisted_out (unpersist handles)")
        # Persisted so the append's reuse doesn't re-run the token
        # scan + set-key pass (batch-sized; handed back for unpersist).
        keyed = _persist_md(keyed, persisted_out)
    b_members = _clusters(keyed, persisted_out)
    rep_ids = b_members.filter(F.col("__id") == F.col("__rep")).select("__rep")
    new_bands, new_tokh = minhash_bands_tokens(
        _rep_subset(df_new, id_col, rep_ids), id_col, tokens_col,
        hash_mode=hash_mode,
    )
    # BATCH-sized frames fanned into 2-3 joins each (index join + self
    # join + two verifies): persist them so the rep filter + sig kernel
    # run once per lookup.  This inverts the corpus-side no-persist rule
    # (minhash_bands_tokens docstring) because these are bounded by the
    # BATCH, not the corpus — the exact asymmetry of the serving path.
    new_bands = _persist_md(new_bands, persisted_out)
    new_tokh = _persist_md(new_tokh, persisted_out)
    if shared_out is not None:
        shared_out.update(hash_mode=hash_mode, keyed=keyed, rep_bands=new_bands)
    probed = [
        int(r["pb"])
        for r in new_bands.select(
            F.pmod(F.col("bk"), F.lit(MINHASH_IDX_BUCKETS)).cast("int").alias("pb")
        )
        .distinct()
        .collect()  # bounded: <= MINHASH_IDX_BUCKETS values
    ]
    idx_tok = _read_idx(spark, path, "tokens", _IDX_TOKENS_SCHEMA)
    if exclude_ids is not None:
        # Retry-after-committed-append (see docstring): drop the batch's
        # own rows from the member store.  Bands rows of excluded reps
        # may still generate candidates, but they cannot verify (their
        # rep has no surviving tokens row) nor expand (the member side
        # is this anti-joined store), so the output is exactly the
        # pre-append lookup's.
        idx_tok = idx_tok.join(
            exclude_ids.select(F.col(exclude_ids.columns[0]).alias("doc_id")),
            "doc_id",
            "left_anti",
        )
    # Tombstone-aware lookup (GDPR-shape deletes, VERDICT r8 item 4): a
    # deleted doc must vanish from every output pair WITHOUT an index
    # rewrite.  ``tombstones/`` (written by minhash_index_delete) is
    # anti-joined against the member store, so deleted members never
    # expand into pairs; when a cluster REPRESENTATIVE is deleted the
    # verify side re-elects min live member per cluster — sound because a
    # v2 cluster IS a distinct token set, so every member's tk32 is
    # identical to the rep's by construction.  Bands rows key clusters by
    # the ORIGINAL rep id; that id stays valid as a cluster label (band
    # keys derive from the token set, not the id), and fully-deleted
    # clusters drop out in the verify inner join.  Compaction
    # (minhash_index_compact) physically drops tombstoned rows and
    # re-labels clusters by their live minimum.
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        idx_tok = idx_tok.join(tomb, "doc_id", "left_anti")

    # batch-rep × index-rep candidates (sides kept distinct: id_a = batch
    # rep, id_b = index rep — the token stores and expansions differ).
    vs_pairs = None
    if probed:
        idx_b = (
            _read_idx(spark, path, "bands", _IDX_BANDS_SCHEMA, partitioned=True)
            .filter(F.col("pb").isin(probed))  # static partition pruning
            .alias("ib")
        )
        nb = new_bands.alias("nb")
        cand_vs = _packed_distinct(
            nb.join(idx_b, F.col("nb.bk") == F.col("ib.bk"))
            # Defensive: a batch id already present in the index (contract
            # violation) must not emit a self-pair.
            .filter(F.col("nb.__id") != F.col("ib.doc_id"))
            .select(
                F.col("nb.__id").alias("id_a"),
                F.col("ib.doc_id").alias("id_b"),
            )
        )
        idx_rep_tok = idx_tok.filter(F.col("doc_id") == F.col("rep_id")).select(
            F.col("doc_id").alias("__id"), F.col("tk32").alias("__tk32")
        )
        if tomb is not None:
            # Representative re-election under deletes — TOMBSTONE-bounded,
            # never corpus-bounded: a deleted rep's row is already gone
            # from the anti-joined member store, so the surviving rep rows
            # serve verbatim (the map-side filter above), and only
            # clusters whose rep_id IS tombstoned re-elect min live member
            # (semi-join against the small tombstone set, then a groupBy
            # over just those clusters' members).  min_by is deterministic;
            # the tk32 arrays are identical within a cluster anyway
            # (exact-set collapse), and the two branches are disjoint by
            # construction (a tombstoned rep has no surviving rep row).
            reelected = (
                idx_tok.join(
                    tomb.select(F.col("doc_id").alias("rep_id")), "rep_id", "semi"
                )
                .groupBy("rep_id")
                .agg(F.min_by("tk32", "doc_id").alias("tk32"))
                .select(
                    F.col("rep_id").alias("__id"), F.col("tk32").alias("__tk32")
                )
            )
            idx_rep_tok = idx_rep_tok.unionByName(reelected)
        vs_pairs = _verify_jaccard(cand_vs, new_tokh, threshold, idx_rep_tok)

    # batch-rep × batch-rep candidates (one bucket pass, see _bucket_pairs).
    cand_bb = _packed_distinct(_bucket_pairs(new_bands))
    bb_pairs = _verify_jaccard(cand_bb, new_tokh, threshold)

    # Expansions: representative pairs -> member pairs (output-bound).
    ba = b_members.select(F.col("__rep").alias("id_a"), F.col("__id").alias("__a"))
    bb = b_members.select(F.col("__rep").alias("id_b"), F.col("__id").alias("__b"))
    out = (
        bb_pairs.join(ba, "id_a")
        .join(bb, "id_b")
        .select(
            F.least("__a", "__b").alias("id_a"),
            F.greatest("__a", "__b").alias("id_b"),
            "jaccard",
        )
    )
    if vs_pairs is not None:
        im = idx_tok.select(F.col("rep_id").alias("id_b"), F.col("doc_id").alias("__b"))
        out = out.unionByName(
            vs_pairs.join(ba, "id_a")
            .join(im, "id_b")
            .select(
                F.least("__a", "__b").alias("id_a"),
                F.greatest("__a", "__b").alias("id_b"),
                "jaccard",
            )
        )
    within = _bucket_pairs(
        b_members.select("__id", F.col("__rep").alias("bk"))
    ).select("id_a", "id_b", F.lit(1.0).alias("jaccard")).filter(
        F.lit(1.0) >= F.lit(threshold)
    )
    return out.unionByName(within)


def _incr_batch_pred():
    return F.col("doc_id") % INCR_MOD == INCR_REM


def _doc_tokens(d: DataFrame) -> DataFrame:
    return d.select("doc_id", F.array_distinct(_tokens(F.col("text"))).alias("tk"))


def _incr_index_path(
    spark: SparkSession, sf_dir: str, hash_mode: str, *, force: bool = False
) -> str:
    """Valid persisted corpus index for the registered incremental ops,
    built once per (documents fingerprint, hash family, split, schema
    version) into an immutable generation dir (io.ensure_generation) and
    reused across invocations — amortizing the build is the point of the
    index.  ``force=True``: a build is a fresh build (new generation,
    CURRENT swings, concurrent readers of the old one are untouched)."""
    from sqlite_to_clickhouse_spark.io import ensure_generation

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        fp = "missing"
    # "|m1": manifest-committed layout (r10) — a cached pre-manifest
    # generation fingerprints differently and is rebuilt, never half-read.
    # "|c1": pb-clustered bands layout (r12) — a cached generation built
    # with the old map-side partitionBy write (tasks × 32 tiny files)
    # rebuilds once into the compact layout every later scan assumes.
    fp = f"{fp}|{hash_mode}|mod{INCR_MOD}r{INCR_REM}|v2|m1|c1"

    def _build(gen: str) -> None:
        corpus = table(spark, sf_dir, "documents").filter(~_incr_batch_pred())
        minhash_index_build(
            _doc_tokens(corpus), "doc_id", "tk", gen, hash_mode=hash_mode
        )

    return ensure_generation("minhash_idx", sf_dir, fp, _build, force=force)


@register(
    "dedup_index_build",
    oracle=f"""
    WITH sets AS (
      SELECT list_sort(list_distinct(list_transform(
               list_filter(string_split(text, ' '), t -> t <> ''),
               t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)))) AS s
      FROM documents
      WHERE doc_id % {INCR_MOD} <> {INCR_REM}
        AND len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
    )
    SELECT CAST({N_BANDS} * COUNT(DISTINCT s) AS BIGINT) AS band_rows,
           CAST(COUNT(*) AS BIGINT) AS token_rows,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS set_rows
    FROM sets
    """,
    tags=("llm", "dedup", "incremental"),
)
def dedup_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build + persist the corpus MinHash band index (force-fresh
    generation) and report the on-disk relation sizes.  Differentially
    oracled against a DuckDB recompute from the raw documents table:
    every DISTINCT non-blank token set contributes exactly N_BANDS band
    rows and one sets/ row (the persisted exact-set collapse), every
    non-blank doc one tokens/ row, and blank/NULL docs contribute
    nothing — so a banding/clustering/filter drift on the WRITTEN files
    (not just in-memory) breaks the gate."""
    hash_mode = spark.conf.get("spark.graft.minhash.hash", "md5")
    path = _incr_index_path(spark, sf_dir, hash_mode, force=True)
    band_rows = _read_idx(spark, path, "bands", _IDX_BANDS_SCHEMA, partitioned=True).count()
    token_rows = _read_idx(spark, path, "tokens", _IDX_TOKENS_SCHEMA).count()
    set_rows = _read_idx(spark, path, "sets", _IDX_SETS_SCHEMA).count()
    return spark.createDataFrame(
        [(band_rows, token_rows, set_rows)],
        "band_rows bigint, token_rows bigint, set_rows bigint",
    )


@register(
    "dedup_incremental",
    oracle=_minhash_oracle(
        pair_pred=f"doc_a % {INCR_MOD} = {INCR_REM} OR doc_b % {INCR_MOD} = {INCR_REM}"
    ),
    tags=("llm", "dedup", "incremental"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup a NEW batch (doc_id % 10 == 7) against the persisted corpus
    index — the 100 TB serving path: the corpus text is never rescanned,
    the batch probes only its band-key partitions, and the result is
    bit-identical to the full-corpus LSH restricted to pairs involving a
    batch doc (the oracle recomputes exactly that ground truth from the
    raw documents table in DuckDB, so the whole persisted path — write,
    pruned read, bucket join, verify, cluster expansion — is
    differentially gated)."""
    hash_mode = spark.conf.get("spark.graft.minhash.hash", "md5")
    path = _incr_index_path(spark, sf_dir, hash_mode)
    batch = table(spark, sf_dir, "documents").filter(_incr_batch_pred())
    return minhash_index_dedup(
        spark, _doc_tokens(batch), "doc_id", "tk", path, hash_mode=hash_mode
    ).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "jaccard",
    )


def minhash_index_compact(spark: SparkSession, path: str, dst: str) -> None:
    """Rewrite an append-grown index into a compacted copy at ``dst``:
    every ingest batch appends one small file per touched pb partition,
    so after thousands of batches each partition is thousands of KB-size
    files — the small-file problem that destroys lookup throughput via
    per-file open/footer cost.  The compaction re-clusters bands by pb
    (one shuffle) and rewrites with a row-group-sized file target; per
    partition it is embarrassingly parallel, and in production it runs
    against a NEW generation dir (the io.ensure_generation pattern) so
    in-flight lookups on the old layout are never disturbed.

    Compaction is also where TOMBSTONES (minhash_index_delete) are
    physically applied: deleted members drop from tokens/, clusters with
    no live member drop entirely, and surviving clusters are RE-LABELED
    by their minimum live doc_id across bands/tokens/sets — band keys
    derive from the token set, never the label, so relabeling is free —
    after which the compacted index carries no tombstone relation at all
    and is bit-identical to an index built on the corpus minus the
    deleted docs (pinned in tests/test_minhash_property.py)."""
    bands = _read_idx(spark, path, "bands", _IDX_BANDS_SCHEMA, partitioned=True)
    tokens = _read_idx(spark, path, "tokens", _IDX_TOKENS_SCHEMA)
    sets = _read_idx(spark, path, "sets", _IDX_SETS_SCHEMA)
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        tokens = tokens.join(tomb, "doc_id", "left_anti")
        # old cluster label -> min live member (re-election); inner joins
        # below drop fully-deleted clusters from every relation.
        remap = tokens.groupBy("rep_id").agg(F.min("doc_id").alias("__new"))
        tokens = tokens.join(remap, "rep_id").select(
            "doc_id", "tk32", F.col("__new").alias("rep_id")
        )
        bands = bands.join(
            remap, bands["doc_id"] == remap["rep_id"]
        ).select("bk", F.col("__new").alias("doc_id"), "pb")
        sets = sets.join(remap, "rep_id").select(
            "skey", F.col("__new").alias("rep_id")
        )
    def _write_rel(rel: str, df: DataFrame):
        return lambda: (
            df.coalesce(8)
            .write.option("maxRecordsPerFile", 5_000_000)
            .parquet(os.path.join(dst, rel))
        )

    # The three compacted-relation rewrites are independent jobs —
    # overlap them from driver threads (guide §2.6).
    gio.run_jobs(
        lambda: (
            bands.repartition("pb")
            .write.partitionBy("pb")
            .option("maxRecordsPerFile", 5_000_000)
            .parquet(os.path.join(dst, "bands"))
        ),
        _write_rel("tokens", tokens),
        _write_rel("sets", sets),
    )
    # The compacted store's initial snapshot: tombstones physically
    # applied, so the manifest lists no tombstone relation at all.  The
    # source's applied-epoch chain carries over — a stream swapped onto
    # the compacted store must still skip epochs it already ingested.
    gio.manifest_commit(
        dst,
        {rel: gio.relation_data_files(dst, rel) for rel in _IDX_RELATIONS},
        applied_seed=gio.manifest_applied_chain(path),
    )


@register(
    "dedup_index_compact",
    oracle=f"""
    WITH sets AS (
      SELECT list_sort(list_distinct(list_transform(
               list_filter(string_split(text, ' '), t -> t <> ''),
               t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)))) AS s
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
    )
    SELECT CAST({N_BANDS} * COUNT(DISTINCT s) AS BIGINT) AS band_rows,
           CAST(COUNT(*) AS BIGINT) AS token_rows,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS set_rows
    FROM sets
    """,
    tags=("llm", "dedup", "incremental", "maintenance"),
)
def dedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact an append-grown MinHash index and prove the rewrite is
    content-preserving — the invariant a compaction job must never
    silently break.  The op simulates the ingest lifecycle end-to-end:
    build the corpus index, APPEND the new-doc batch (the append lands
    one more small file per touched pb partition — the growth compaction
    exists to absorb), compact into a fresh directory, and report the
    COMPACTED copy's relation counts.  (r13: the batch lands as ONE
    append instead of two halves — appends maintain cluster identity via
    the sets/ join, so the grown relations and every oracle count are
    identical either way, for one fewer full append pass; the
    append-twice-equals-once equivalence itself stays pinned in
    tests/test_minhash_property.py.)  The DuckDB oracle recomputes all
    three counts from the raw documents table over ALL docs (corpus +
    appended batch) — including the DISTINCT-set counts, which also gate
    the append path's cluster maintenance (a batch doc identical to an
    indexed set must join that cluster, never spawn a duplicate
    representative); file-count collapse and lookup-equality are pinned
    in tests/test_minhash_property.py."""
    import tempfile

    import shutil

    hash_mode = spark.conf.get("spark.graft.minhash.hash", "md5")
    docs = table(spark, sf_dir, "documents")
    toks = _doc_tokens(docs)
    base = tempfile.mkdtemp(prefix="graft_idx_compact_")
    grown = os.path.join(base, "grown")
    compacted = os.path.join(base, "compacted")
    # Clone the shared corpus generation (appends below mutate it); a
    # file clone is the production snapshot, not a re-band of the corpus.
    shutil.copytree(_incr_index_path(spark, sf_dir, hash_mode), grown)
    minhash_index_append(
        toks.filter(_incr_batch_pred()), "doc_id", "tk", grown,
        hash_mode=hash_mode,
    )
    minhash_index_compact(spark, grown, compacted)
    # Three independent count jobs over the compacted relations — overlap
    # them from driver threads (guide §2.6) instead of paying three
    # sequential job scheduling/teardown tails.
    counts = gio.run_jobs(
        *[
            (lambda r, s: lambda: spark.read.schema(s)
             .parquet(os.path.join(compacted, r)).count())(rel, schema)
            for rel, schema in (
                ("bands", _IDX_BANDS_SCHEMA),
                ("tokens", _IDX_TOKENS_SCHEMA),
                ("sets", _IDX_SETS_SCHEMA),
            )
        ]
    )
    return spark.createDataFrame(
        [tuple(counts)], "band_rows bigint, token_rows bigint, set_rows bigint"
    )


DEL_MOD, DEL_REM = 30, 3  # registered delete set: corpus docs, doc_id % 30 == 3
# (30·k + 3) % 10 ∈ {3} ≠ 7, so the deleted set never intersects the
# ingest batch (doc_id % 10 == 7) — deletes target only INDEXED docs.


def _clone_incr_index(spark: SparkSession, sf_dir: str, hash_mode: str) -> str:
    """Private mutable copy of the shared corpus index generation (file
    clone — the production snapshot analog): deletes and appends mutate,
    so the cached generation other ops reuse must never be the target."""
    import shutil
    import tempfile

    src = _incr_index_path(spark, sf_dir, hash_mode)
    dst = os.path.join(tempfile.mkdtemp(prefix="graft_idx_del_"), "idx")
    shutil.copytree(src, dst)
    return dst


def _deleted_ids(docs: DataFrame) -> DataFrame:
    return docs.filter(
        ~_incr_batch_pred() & (F.col("doc_id") % DEL_MOD == DEL_REM)
    ).select("doc_id")


@register(
    "dedup_incremental_deletes",
    oracle=_minhash_oracle(
        pair_pred=(
            f"(doc_a % {INCR_MOD} = {INCR_REM} OR doc_b % {INCR_MOD} = {INCR_REM}) "
            f"AND doc_a % {DEL_MOD} <> {DEL_REM} AND doc_b % {DEL_MOD} <> {DEL_REM}"
        )
    ),
    tags=("llm", "dedup", "incremental", "maintenance"),
)
def dedup_incremental_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup lookup against an index with TOMBSTONED deletes
    (VERDICT r8 item 4) — the GDPR loop: a delete request lands
    (minhash_index_delete: one tiny tombstone file, no index rewrite),
    and every subsequent lookup must behave as if the deleted docs were
    never indexed.  The op tombstones the corpus docs with
    doc_id % 30 == 3 — at typical fixture cardinalities most docs are
    their own cluster representative, so the delete set hits REP rows and
    the gate exercises representative re-election, not just the member
    anti-join — then runs the standard batch lookup.  The DuckDB oracle
    recomputes ground truth from the raw documents table restricted to
    pairs with no deleted endpoint: delete-then-lookup must be
    bit-identical to rebuild-without-the-deleted."""
    hash_mode = spark.conf.get("spark.graft.minhash.hash", "md5")
    idx = _clone_incr_index(spark, sf_dir, hash_mode)
    docs = table(spark, sf_dir, "documents")
    minhash_index_delete(_deleted_ids(docs), idx)
    batch = docs.filter(_incr_batch_pred())
    return minhash_index_dedup(
        spark, _doc_tokens(batch), "doc_id", "tk", idx, hash_mode=hash_mode
    ).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "jaccard",
    )


@register(
    "dedup_index_delete_compact",
    oracle=f"""
    WITH sets AS (
      SELECT list_sort(list_distinct(list_transform(
               list_filter(string_split(text, ' '), t -> t <> ''),
               t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)))) AS s
      FROM documents
      WHERE doc_id % {INCR_MOD} <> {INCR_REM}
        AND doc_id % {DEL_MOD} <> {DEL_REM}
        AND len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
    )
    SELECT CAST({N_BANDS} * COUNT(DISTINCT s) AS BIGINT) AS band_rows,
           CAST(COUNT(*) AS BIGINT) AS token_rows,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS set_rows
    FROM sets
    """,
    tags=("llm", "dedup", "incremental", "maintenance"),
)
def dedup_index_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physically apply tombstones via compaction and prove the rewrite
    equals an index built on corpus-minus-deleted: tombstone the
    doc_id % 30 == 3 corpus docs, compact into a fresh directory
    (deleted members dropped, fully-deleted clusters dropped, surviving
    clusters re-labeled by min live member, tombstone relation cleared),
    and report the COMPACTED relation counts.  The DuckDB oracle
    recomputes all three from the raw documents table with the deleted
    docs excluded — a leak of any tombstoned row (or loss of any live
    one) breaks the gate.  Tombstone-clearing and bit-level equivalence
    to rebuild-without are pinned in tests/test_minhash_property.py."""
    import tempfile

    hash_mode = spark.conf.get("spark.graft.minhash.hash", "md5")
    idx = _clone_incr_index(spark, sf_dir, hash_mode)
    docs = table(spark, sf_dir, "documents")
    minhash_index_delete(_deleted_ids(docs), idx)
    compacted = os.path.join(tempfile.mkdtemp(prefix="graft_idx_delc_"), "idx")
    minhash_index_compact(spark, idx, compacted)
    # Independent count jobs, overlapped (guide §2.6) — same as
    # dedup_index_compact's closing counts.
    counts = gio.run_jobs(
        *[
            (lambda r, s: lambda: spark.read.schema(s)
             .parquet(os.path.join(compacted, r)).count())(rel, schema)
            for rel, schema in (
                ("bands", _IDX_BANDS_SCHEMA),
                ("tokens", _IDX_TOKENS_SCHEMA),
                ("sets", _IDX_SETS_SCHEMA),
            )
        ]
    )
    return spark.createDataFrame(
        [tuple(counts)], "band_rows bigint, token_rows bigint, set_rows bigint"
    )


def _simhash_expr(tokens_col):
    """SimHash over SIMHASH_BITS bits of the 60-bit md5-derived token hash:
    bit b of the fingerprint is the sign of sum over tokens of ±1 by that
    token's hash bit. Entirely JVM-side expression tree."""
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")  # noqa: E731

    def _vote_merge(mask: int):
        # Bound via factory: PySpark introspects lambda arity, so default
        # args would be mistaken for extra lambda variables.
        return lambda acc, t: acc + F.when(
            tok_hash(t).bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    fp = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        vote = F.aggregate(tokens_col, F.lit(0).cast("long"), _vote_merge(1 << b))
        fp = fp + F.when(vote > 0, F.lit(1 << b)).otherwise(0)
    return fp


def _simhash_votes_sql() -> str:
    h = "CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)"
    return " + ".join(
        f"(CASE WHEN list_aggregate(list_transform(tk, t -> "
        f"CASE WHEN ({h} & {1 << b}) <> 0 THEN 1 ELSE -1 END), 'sum') > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )


def _simhash_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
      FROM documents
    )
    SELECT doc_id, CAST({_simhash_votes_sql()} AS BIGINT) AS simhash FROM toks
    """


@register("dedup_simhash", oracle=_simhash_oracle(), tags=("llm", "dedup"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per document (24-bit, md5-derived, engine-
    portable). Near-dup docs land at small Hamming distance; downstream
    grouping by fingerprint (or by fingerprint bands) finds clusters with
    one shuffle. Fingerprint computation itself is shuffle-free."""
    d = table(spark, sf_dir, "documents")
    toks = F.array_distinct(_tokens(F.col("text")))
    return d.select("doc_id", _simhash_expr(toks).cast("long").alias("simhash"))


HAMMING_T = 3  # max differing simhash bits for a near-dup neighbor
SIMHASH_BANDS = 4  # must exceed HAMMING_T for lossless banding (pigeonhole)
SIMHASH_NN_BITS = 48  # wide fingerprint for the NN op (bits 0..47 of the 60-bit hash)


def _simhash_nn_votes_sql() -> str:
    return " + ".join(
        f"(CASE WHEN list_aggregate(list_transform(hh, h -> "
        f"CASE WHEN (h & {1 << b}) <> 0 THEN 1 ELSE -1 END), 'sum') > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_NN_BITS)
    )


def _simhash_nn_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
      FROM documents
    ),
    hs AS (
      SELECT doc_id,
             list_transform(tk, t ->
               CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)) AS hh
      FROM toks WHERE len(tk) > 0
    ),
    fps AS (
      SELECT doc_id, CAST({_simhash_nn_votes_sql()} AS BIGINT) AS fp FROM hs
    ),
    pairs AS (
      SELECT a.doc_id AS doc_id, b.doc_id AS nn_doc,
             CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
      FROM fps a JOIN fps b ON a.doc_id <> b.doc_id
      WHERE bit_count(xor(a.fp, b.fp)) <= {HAMMING_T}
    )
    SELECT doc_id, nn_doc, hamming FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY hamming, nn_doc) AS rn
      FROM pairs
    ) WHERE rn = 1
    """


@register("dedup_simhash_nn", oracle=_simhash_nn_oracle(), tags=("llm", "dedup"))
def dedup_simhash_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest near-duplicate per document by SimHash Hamming distance —
    the second classic fuzzy-dedup geometry next to MinHash-Jaccard:
    one integer fingerprint per doc, near-dups differ in a few bits.
    Emits at most ONE row per doc, ``(doc_id, nn_doc, hamming)`` — its
    closest neighbor within HAMMING_T (ties: lowest hamming, then lowest
    nn_doc). The per-doc-NN output shape is deliberate: on a templated
    corpus the full pair LIST is inherently quadratic in cluster size
    (measured on the fixture: 24-bit simhash put 29% of ALL 12.5 M
    sf0.1 pairs within distance 3 — output-unbounded), while the NN
    relation is ≤ n rows at any scale and is what a keep-best/cluster
    stage actually consumes.

    The banding is LOSSLESS, not probabilistic: the 48-bit fingerprint
    splits into SIMHASH_BANDS=4 contiguous 12-bit bands, and a pair
    within Hamming distance 3 has its differing bits in at most 3 bands
    — so at least one band matches EXACTLY (pigeonhole, HAMMING_T <
    SIMHASH_BANDS). The oracle can therefore state the all-pairs ground
    truth and the banded plan must reproduce it bit-for-bit; recall is a
    theorem, precision comes from the exact popcount on every candidate.

    Plan: one md5 per token JVM-side (the minhash __tkh spelling), then
    the 48 bit-votes in ONE Arrow kernel pass (the per-bit expression
    tree recomputes the token hash per bit — 48× the md5 work,
    interpreted). Identical fingerprints are collapsed BEFORE banding:
    a fingerprint cluster of size ≥ 2 answers its members' NN
    analytically (hamming 0, lowest other member — any cross-cluster
    distance is ≥ 1), and only one representative per DISTINCT
    fingerprint enters the band join. This is what makes the op safe on
    a templated corpus: the fixture's exact-fp clusters alone produce
    ~10 M in-bucket candidate rows at sf0.1 when banded naively
    (measured), versus ~10⁴ distinct-fp candidates after the collapse —
    an exact-duplicate cluster of ANY size c costs O(c) here, never c².
    Candidates shuffle on (band_id, band_value) only; exact popcount +
    a per-fingerprint min finish it. Token-less docs are dropped before
    fingerprinting (their all-zero fingerprints would otherwise form one
    giant cluster — the LSH blank-doc lesson, here handled by the same
    collapse that makes them cheap anyway).
    """
    from pyspark.sql import types as T

    d = table(spark, sf_dir, "documents")
    toks = F.array_distinct(_tokens(F.col("text")))
    base = d.where(F.size(toks) > 0).select(
        "doc_id",
        F.transform(
            toks,
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
        ).alias("__tkh"),
    )

    bits = np.arange(SIMHASH_NN_BITS, dtype=np.int64)

    @F.pandas_udf(T.LongType())
    def _fp(tkh: pd.Series) -> pd.Series:
        out = []
        for arr in tkh:
            h = np.asarray(arr, dtype=np.int64)
            b = (h[:, None] >> bits[None, :]) & 1
            votes = (2 * b - 1).sum(axis=0)
            out.append(int(((votes > 0).astype(np.int64) << bits).sum()))
        return pd.Series(out)

    fps = base.select("doc_id", _fp("__tkh").alias("fp"))

    # Collapse identical fingerprints: per-fp cluster size, lowest and
    # second-lowest member (one shuffle on fp, reused by every window).
    wfull = (
        Window.partitionBy("fp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # PERSISTED (r13): four consumers re-evaluated this frame — and with
    # it the ArrowEvalPython fingerprint kernel over the full corpus —
    # once each (both band-join sides via reps, the intra branch, the
    # singles branch).  Six scalars per doc; one kernel pass + one window
    # shuffle total with the persist.
    docs = _persist_md(
        fps.select(
            "doc_id",
            "fp",
            F.count(F.lit(1)).over(wfull).alias("csz"),
            F.min("doc_id").over(wfull).alias("cmin"),
            F.nth_value("doc_id", 2).over(wfull).alias("csecond"),
            F.row_number()
            .over(Window.partitionBy("fp").orderBy("doc_id"))
            .alias("crn"),
        )
    )

    # Band join over one representative per DISTINCT fingerprint.
    band_bits = SIMHASH_NN_BITS // SIMHASH_BANDS
    band_keys = F.array(
        *[
            F.shiftright(F.col("fp"), i * band_bits)
            .bitwiseAND(F.lit((1 << band_bits) - 1))
            .bitwiseOR(F.lit(i << band_bits))  # fold band id into the key
            for i in range(SIMHASH_BANDS)
        ]
    )
    reps = docs.filter(F.col("crn") == 1).select(
        "fp", F.col("cmin").alias("rep_doc")
    )
    bands = reps.select("fp", "rep_doc", F.explode(band_keys).alias("bk"))
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    # Per source fingerprint: nearest OTHER fingerprint, tie-broken by the
    # target cluster's lowest doc_id — lexicographic struct-min, no
    # per-candidate window. A doc at distance h from fp_b is nearest to
    # fp_b's LOWEST member (same h for every member), so the cluster min
    # IS the correct nn_doc under the (hamming, nn_doc) order.
    inter = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.fp") != F.col("b.fp")))
        .filter(hamming <= HAMMING_T)
        .groupBy(F.col("a.fp").alias("fp"))
        .agg(
            F.min(
                F.struct(
                    hamming.alias("hamming"), F.col("b.rep_doc").alias("nn_doc")
                )
            ).alias("nn")
        )
        .select("fp", F.col("nn.nn_doc").alias("i_nn"), F.col("nn.hamming").alias("i_h"))
    )

    # Members of a multi-doc fingerprint cluster: NN is intra-cluster at
    # hamming 0 (any cross-cluster distance is ≥ 1); the lowest member's
    # NN is the second-lowest. Singletons take the banded inter result.
    intra = docs.filter(F.col("csz") >= 2).select(
        "doc_id",
        F.when(F.col("doc_id") == F.col("cmin"), F.col("csecond"))
        .otherwise(F.col("cmin"))
        .alias("nn_doc"),
        F.lit(0).cast("int").alias("hamming"),
    )
    singles = (
        docs.filter(F.col("csz") == 1)
        .join(inter, "fp")
        .select("doc_id", F.col("i_nn").alias("nn_doc"), F.col("i_h").alias("hamming"))
    )
    return intra.unionByName(singles)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    jump_from: int = 3,
    driver_edge_cap: "int | None" = None,
) -> DataFrame:
    """Connected components by iterative min-label propagation (library
    API): undirected edge list in, (node, component_id) out, where
    component_id = the smallest node id reachable from the node.

    The Pregel-lite loop: every node starts labeled with itself; each
    round a node adopts min(own label, min of neighbors' labels); stop at
    fixpoint. Rounds ≈ graph diameter (dup clusters are shallow — near-dup
    graphs are clique-ish, so 3-5 rounds in practice). Per round: one
    shuffle join (edges ⨝ labels on src) + one agg on dst — both keyed the
    same way, so AQE coalesces them tightly. localCheckpoint every round
    truncates the lineage (an iterative plan otherwise grows exponentially
    in analysis time) and materializes the small label table, never the
    edges.

    Execution shape (r12 A/B-tuned; identical output on every variant):

    - ``und`` is hash-repartitioned on ``s`` and then lazily
      checkpointed, so every round's edges⨝labels join reuses the one
      materialized layout of the edge table instead of re-exchanging it
      per round (guide §2.4), and the caller's edge lineage is cut out
      of every round's analysis (see the in-body comment).
    - checkpoints are LAZY (``eager=False``): each round's label table is
      materialized exactly once, by the convergence count that must run
      anyway, instead of once eagerly and once by the count.
    - from round ``jump_from`` the update also adopts label-of-label
      (pointer jumping / path halving), cutting rounds from O(diameter)
      to O(log diameter) on chain-shaped dup graphs.  The extra
      label⨝label join costs one small-table shuffle per round, which
      loses on shallow graphs — so the first ``jump_from - 1`` rounds run
      plain.  Measured at sf0.1: ER name graph (diameter ~4) unchanged,
      MinHash doc graph 11 rounds → 8, CC wall 10.5 s → 5.8 s.
      Adopting min(neighbor label, label-of-label) preserves the
      invariant that a node's label is always the id of some node in its
      component, so the fixpoint (component min) and the emitted rows are
      bit-identical to the plain iteration — differentially pinned by the
      recursive-CTE oracles on dedup_connected_components/_corpus_apply/
      _keep_best and the ER cluster gates.
    """
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = fwd.union(fwd.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    # localCheckpoint, not persist (r12): persist caches the DATA but the
    # LOGICAL plan keeps the caller's full edge lineage (LSH candidate
    # joins, Levenshtein verifies, contraction joins, ...), and Catalyst
    # re-analyzes that whole tree every round — measured ~0.3-0.6 s/round
    # of pure planning on deep-lineage inputs (er_index_append's
    # contracted CC: 4.1 s → 1.6 s standalone).  The lazy checkpoint
    # truncates the plan to a leaf at first materialization (the labels
    # count that must run anyway) while keeping the repartition's hash
    # layout on the materialized blocks.
    und = und.repartition("s").localCheckpoint(eager=False)
    # Driver fast path (r12, guide §1.2 — first-principles): the
    # distributed loop costs a fixed 3-8 driver-sequential rounds of
    # (join + checkpoint + count) jobs REGARDLESS of graph size — ~0.3 s
    # per tiny job on an idle local[32], several seconds total — while a
    # 16-edge contracted append graph is microseconds of actual work
    # (profiled: er_index_append's relabel spent 3.8-5.0 s labeling 23
    # nodes).  Small graphs therefore collect and union-find on the
    # driver: label = min member per component under the column type's
    # ordering — for longs trivially Spark-identical, for strings Python
    # codepoint order == Spark's UTF8 binary order (UTF-8 preserves
    # codepoint order), so the rows are bit-identical to the loop's
    # fixpoint (pinned in tests/test_cc_property.py).  The sizing agg is
    # the same materializing action the loop's first convergence count
    # would run, and it is GATED on the cap being enabled so disabled
    # (cap=0) and store-scale callers pay no extra job (ADVICE r12).
    # Cap is edge-rows collected (both directions) AND estimated collect
    # bytes (VERDICT r12: 200k edges of long string names is unbounded
    # driver memory in row units), both env-overridable; 0 disables.
    # Fast path is restricted to integral/string node types: Python and
    # Spark agree on `<` for those, while float NaN diverges (Spark
    # orders NaN greatest; Python NaN comparisons are all False).
    driver_cap = (
        driver_edge_cap
        if driver_edge_cap is not None
        else int(os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGES", "200000"))
    )
    byte_cap = int(os.environ.get("SPARK_GRAFT_CC_DRIVER_BYTES", str(64 << 20)))
    from pyspark.sql import types as T

    node_t = und.schema["s"].dataType
    _DRIVER_TYPES = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType,
    )
    if driver_cap > 0 and byte_cap > 0 and isinstance(node_t, _DRIVER_TYPES):
        if isinstance(node_t, T.StringType):
            row_bytes = F.octet_length("s") + F.octet_length("d") + F.lit(64)
        else:
            row_bytes = F.lit(80)  # two boxed numerics + Row overhead
        stats = und.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(row_bytes), F.lit(0)).alias("b"),
        ).collect()[0]
        n_edges, est_bytes = int(stats["n"]), int(stats["b"])
    else:
        n_edges, est_bytes = None, None
    if n_edges is not None and n_edges <= driver_cap and est_bytes <= byte_cap:
        rows = und.collect()  # bounded by driver_cap rows / byte_cap bytes
        if all(r[0] is not None and r[1] is not None for r in rows):
            parent: dict = {}

            def _find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            for r in rows:
                s_v, d_v = r[0], r[1]
                parent.setdefault(s_v, s_v)
                parent.setdefault(d_v, d_v)
                rs, rd = _find(s_v), _find(d_v)
                if rs != rd:
                    if rd < rs:
                        rs, rd = rd, rs
                    parent[rd] = rs  # root stays the component minimum

            from pyspark.sql import types as T

            node_t = und.schema["s"].dataType
            out_schema = T.StructType(
                [
                    T.StructField("node", node_t),
                    T.StructField("component_id", node_t),
                ]
            )
            return edges.sparkSession.createDataFrame(
                [(n, _find(n)) for n in parent], out_schema
            )
    labels = (
        und.select(F.col("s").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=False)
    for i in range(max_iter):
        nbr_min = (
            und.join(labels, und["s"] == labels["node"])
            .groupBy(und["d"].alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # The convergence flag rides the label update itself (one column in
        # the checkpoint) instead of a separate new-vs-old join per round.
        cand = F.coalesce(F.col("nbr_label"), F.col("label"))
        joined = labels.join(nbr_min, labels["node"] == nbr_min["node2"], "left")
        if i + 1 >= jump_from:
            lol = labels.select(
                F.col("node").alias("jnode"), F.col("label").alias("jlabel")
            )
            joined = joined.join(lol, labels["label"] == lol["jnode"], "left")
            cand = F.least(cand, F.coalesce(F.col("jlabel"), F.col("label")))
        stepped = (
            joined.select(
                "node",
                F.least(F.col("label"), cand).alias("new_label"),
                (cand < F.col("label")).alias("chg"),
            )
        ).localCheckpoint(eager=False)
        changed = stepped.filter(F.col("chg")).count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component_id"))


def _components_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT s AS node, d AS peer FROM edges
        UNION
        SELECT r.node, e.d FROM reach r JOIN edges e ON r.peer = e.s
    )
    SELECT node AS doc_id,
           least(node, min(peer)) AS component_id,
           (node = least(node, min(peer))) AS is_canonical
    FROM reach
    GROUP BY node
    """


@register("dedup_connected_components", oracle=_components_oracle(), tags=("llm", "dedup"))
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster collapse — the step after pair generation that
    actual corpus dedup needs: MinHash-LSH pairs → connected components →
    one canonical doc (min id) per cluster. Iterative label propagation on
    the Spark side; the oracle computes the same components with a
    recursive-CTE transitive closure over the identical pair set, so the
    clustering itself is differentially verified (a rare case of an
    iterative algorithm with an exact SQL oracle)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.array_distinct(_tokens(F.col("text"))).alias("tk"))
    pairs = minhash_lsh_pairs(toks, "doc_id", "tk").select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias("doc_id"),
        "component_id",
        (F.col("node") == F.col("component_id")).alias("is_canonical"),
    )


_CONTAINMENT_T = 0.9

_CONTAINMENT_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) / len(a.tk), 6)
               AS containment
    FROM toks a JOIN toks b
      ON a.lang = b.lang AND a.doc_id <> b.doc_id
    WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) / len(a.tk)
          >= {_CONTAINMENT_T}
"""


@register("dedup_containment", oracle=_CONTAINMENT_ORACLE, tags=("llm", "dedup"))
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment similarity C(A→B) = |A∩B| / |A|: the
    asymmetric near-dup measure that catches a document EMBEDDED in a
    larger one (quote-inside-article, boilerplate wrappers) where Jaccard
    stays low because the union is dominated by the big side.

    Exact prefix-filtered plan: a pair can satisfy either containment
    direction at threshold t only if the overlap is ≥ o = ceil(t·min(|A|,
    |B|)) — C(small→big) ≥ t needs o directly, and C(big→small) ≥ t
    implies an even larger overlap. So candidates are generated with the
    SMALLER doc's static prefix (rank ≤ sz − o + 1, o from its own size)
    against the larger doc's dynamic prefix (rank_b ≤ sz_b − o_a + 1; the
    partner's o arrives through the join predicate, which is why the big
    side keeps full ranked postings). Hot tokens rank last and never
    enter the small side's prefix, so the O(df²) stopword blowup is gone
    while the result stays exact — verification recomputes both directed
    ratios from the full token arrays, and the oracle remains the direct
    all-pairs enumeration."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.array_distinct(_tokens(F.col("text"))).alias("tk"),
    )
    ranked = _ranked_postings(toks, 9, 10)  # 9/10 == 0.9 exactly
    small = ranked.filter(F.col("rank") <= F.col("sz") - F.col("o") + 1).alias("a")
    big = ranked.alias("b")
    cand = (
        small.join(
            big,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.token") == F.col("b.token"))
            & (
                (F.col("a.sz") < F.col("b.sz"))
                | (
                    (F.col("a.sz") == F.col("b.sz"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            )
            & (F.col("b.rank") <= F.col("b.sz") - F.col("a.o") + 1),
        )
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .distinct()
    )
    tu = toks.select(F.col("doc_id").alias("u"), F.col("tk").alias("tk_u"))
    tv = toks.select(F.col("doc_id").alias("v"), F.col("tk").alias("tk_v"))
    both = (
        cand.join(tu, "u")
        .join(tv, "v")
        .withColumn("n_inter", F.size(F.array_intersect("tk_u", "tk_v")).cast("long"))
        .withColumn("sz_u", F.size("tk_u").cast("long"))
        .withColumn("sz_v", F.size("tk_v").cast("long"))
    )
    # Both directed ratios leave each verified pair as ONE row exploded
    # to its two directions in place — a union of two selects over `both`
    # would re-run the whole candidate join + verification for the second
    # branch (plans are trees; common subplans are recomputed, and this
    # union sat at the ROOT, doubling everything).
    directions = F.array(
        F.struct(
            F.col("u").alias("doc_a"),
            F.col("v").alias("doc_b"),
            (F.col("n_inter").cast("double") / F.col("sz_u")).alias("c"),
        ),
        F.struct(
            F.col("v").alias("doc_a"),
            F.col("u").alias("doc_b"),
            (F.col("n_inter").cast("double") / F.col("sz_v")).alias("c"),
        ),
    )
    return (
        both.select(F.explode(directions).alias("dir"))
        .select("dir.doc_a", "dir.doc_b", F.col("dir.c").alias("c"))
        .filter(F.col("c") >= _CONTAINMENT_T)
        .select("doc_a", "doc_b", F.round("c", 6).alias("containment"))
    )


@register(
    "dedup_adjacent",
    oracle="""
    WITH lagged AS (
        SELECT event_id, user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                   AS prev_type
        FROM events
    )
    SELECT event_id, user_id, event_type
    FROM lagged
    WHERE prev_type IS NULL OR event_type <> prev_type
    """,
    tags=("dedup", "events"),
)
def dedup_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-duplicate collapse: keep an event only when it CHANGES
    the user's event_type (run-length compression of state streams —
    sensor readings, status pings; ClickHouse users reach for
    CollapsingMergeTree or groupArray+arrayCompact here). Unlike
    dedup_replacing this is order-sensitive: equal values survive if a
    different value sits between them. One lag window per user — state is
    one row regardless of run length, so it streams at any scale."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("event_id", "user_id", "event_type")
    )


def _corpus_apply_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT s AS node, d AS peer FROM edges
        UNION
        SELECT r.node, e.d FROM reach r JOIN edges e ON r.peer = e.s
    ),
    comp AS (
        SELECT node AS doc_id, least(node, min(peer)) AS component_id
        FROM reach GROUP BY node
    )
    SELECT d.doc_id,
           d.lang,
           COALESCE(c.component_id, d.doc_id) AS cluster_id,
           (c.component_id IS NULL OR c.component_id = d.doc_id) AS keep
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """


@register("dedup_corpus_apply", oracle=_corpus_apply_oracle(), tags=("llm", "dedup"))
def dedup_corpus_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable end of the fuzzy-dedup pipeline: EVERY document of
    the corpus labeled keep/drop. Near-dup clusters (MinHash-LSH pairs →
    connected components) keep their min-id canonical; documents in no
    cluster keep themselves. Downstream, ``filter(keep)`` IS the deduped
    training corpus — this op is what a pipeline actually materializes,
    where dedup_connected_components only reports cluster structure for
    documents that appear in some pair.

    Plan: the LSH + label-propagation subtree (see minhash_lsh_pairs /
    connected_components) plus one left join of the full corpus to the
    (much smaller) clustered-doc table — at 100 TB the join broadcasts
    when the dup set is small and degrades to a hash join on doc_id
    otherwise. Differentially verified end-to-end against the
    recursive-CTE closure oracle over the identical pair set.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.array_distinct(_tokens(F.col("text"))).alias("tk"))
    pairs = minhash_lsh_pairs(toks, "doc_id", "tk").select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component_id"
    )
    return d.select("doc_id", "lang").join(comp, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("component_id"), F.col("doc_id")).alias("cluster_id"),
        (
            F.col("component_id").isNull()
            | (F.col("component_id") == F.col("doc_id"))
        ).alias("keep"),
    )


def _keep_best_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT s AS node, d AS peer FROM edges
        UNION
        SELECT r.node, e.d FROM reach r JOIN edges e ON r.peer = e.s
    ),
    comp AS (
        SELECT node AS doc_id, least(node, min(peer)) AS component_id
        FROM reach GROUP BY node
    ),
    lab AS (
        SELECT d.doc_id, d.n_chars,
               COALESCE(c.component_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    )
    SELECT doc_id, cluster_id, n_chars,
           (row_number() OVER (PARTITION BY cluster_id
                               ORDER BY n_chars DESC, doc_id) = 1) AS keep
    FROM lab
    """


@register("dedup_keep_best", oracle=_keep_best_oracle(), tags=("llm", "dedup"))
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering with a QUALITY-chosen representative: where
    dedup_corpus_apply keeps each cluster's min doc_id, this keeps its
    LONGEST member (n_chars, doc_id tiebreak) — the policy a training
    pipeline actually wants, since the min-id member of a near-dup cluster
    is often the truncated variant. Same LSH → connected-components
    subtree; representative election is one row_number window over
    cluster_id, so swapping the quality metric (model score, fetch date)
    is a one-line ORDER BY change. Cluster cardinality is bounded by dup
    structure, not corpus size — the window never sees a giant partition
    unless the corpus genuinely contains a giant dup cluster, which is
    exactly the case you want surfaced."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.array_distinct(_tokens(F.col("text"))).alias("tk"))
    pairs = minhash_lsh_pairs(toks, "doc_id", "tk").select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component_id"
    )
    lab = d.select("doc_id", "n_chars").join(comp, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("component_id"), F.col("doc_id")).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return lab.select(
        "doc_id",
        "cluster_id",
        "n_chars",
        (F.row_number().over(w) == 1).alias("keep"),
    )


_SPAN_W = 10  # window width in tokens (Lee et al. 2022 use 50-token spans
# on BPE tokens; the synthetic fixture's docs are 10-99 whitespace tokens,
# so 10 keeps every doc in scope while exercising the identical plan)


def _span_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS tk
      FROM documents
    ),
    win AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(unnest(list_transform(
               range(1, len(tk) - {_SPAN_W - 2}),
               i -> array_to_string(list_slice(tk, i, i + {_SPAN_W - 1}), ' ')
             ))), 1, 15)) AS BIGINT) AS g
      FROM toks WHERE len(tk) >= {_SPAN_W}
    ),
    per_doc_gram AS (
      SELECT doc_id, g, count(*) AS k
      FROM win GROUP BY doc_id, g
    ),
    gram_docs AS (
      SELECT g, count(*) AS n_docs
      FROM per_doc_gram GROUP BY g
    )
    SELECT d.doc_id,
           CAST(sum(d.k) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN gd.n_docs >= 2 THEN d.k ELSE 0 END) AS BIGINT)
               AS n_dup_windows,
           round(sum(CASE WHEN gd.n_docs >= 2 THEN d.k ELSE 0 END)
                 / CAST(sum(d.k) AS DOUBLE), 6) AS dup_frac
    FROM per_doc_gram d JOIN gram_docs gd ON d.g = gd.g
    GROUP BY d.doc_id
    """


@register("dedup_substring_spans", oracle=_span_oracle(), tags=("llm", "dedup"))
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span duplication profiling (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    W-token window of every document is hashed; a window is *duplicated*
    if the identical token span occurs in at least one OTHER document.
    Output per doc: total windows, duplicated-window count, duplicated
    fraction — the signal used to cut boilerplate/templated spans that
    survive whole-doc MinHash (which only catches near-identical DOCS,
    not shared paragraphs inside otherwise-distinct docs).

    Scale shape (the suffix-array of the paper is a single-machine
    construct; this is its shuffle-native equivalent):
      1. tokenize + rolling windows as array lambdas — zero shuffle,
         O(tokens) rows emitted with an 8-byte hash key, raw strings
         dropped before anything moves;
      2. (doc_id, g) pre-aggregation — map-side combine collapses
         within-doc repeats, so the wire carries at most one row per
         distinct (doc, span);
      3. per-span doc-frequency as a count-over-window on g — NOT a
         groupBy + join-back: Spark plans are trees, so a self-join
         would re-run the explode/hash subtree for the second branch,
         doubling the O(tokens) work (the window form is asserted in
         tests/test_plans.py: exactly one Generate);
      4. roll up per doc. Three narrow shuffles total ((doc_id,g) → g →
         doc_id), each carrying only ids, hashes and counts.
    Hash = md5-derived 60-bit key on BOTH sides (decontaminate's parity
    trick) so Spark and the oracle agree by construction."""
    d = table(spark, sf_dir, "documents")
    # Token array bound in its own projection BEFORE the per-window
    # lambda references it: interpreted HOFs do no common-subexpression
    # elimination, so an unbound tk re-tokenized the document inside
    # every window's slice() — O(tokens²) per doc (same fix as
    # text_ngram_novelty, measured 7× there).  explode_outer over the
    # bound hash array + scalar NULL filter keeps
    # InferFiltersFromGenerate from re-evaluating the window transform.
    toks = d.select(
        "doc_id", F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("tk")
    ).filter(F.size("tk") >= _SPAN_W)
    tk = F.col("tk")
    wins = F.transform(
        F.sequence(F.lit(1), F.size(tk) - F.lit(_SPAN_W - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.array_join(F.slice(tk, i, _SPAN_W), " ")), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    per_doc_gram = (
        toks.select("doc_id", wins.alias("w"))
        .select("doc_id", F.explode_outer("w").alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("g"))
    dup_k = F.when(F.col("n_docs") >= 2, F.col("k")).otherwise(F.lit(0))
    return (
        per_doc_gram.withColumn("n_docs", n_docs)
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_windows"),
            F.sum(dup_k).cast("long").alias("n_dup_windows"),
            F.round(
                F.sum(dup_k) / F.sum("k").cast("double"), 6
            ).alias("dup_frac"),
        )
    )


@register(
    "dedup_cluster_stats",
    oracle=f"""
    WITH sets AS (
      SELECT list_sort(list_distinct(list_transform(
               list_filter(string_split(text, ' '), t -> t <> ''),
               t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)))) AS s
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
    ),
    clusters AS (SELECT s, COUNT(*) AS c FROM sets GROUP BY s)
    SELECT CAST(c AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(c * COUNT(*) AS BIGINT) AS n_docs,
           CAST((c - 1) * COUNT(*) AS BIGINT) AS dup_docs
    FROM clusters
    GROUP BY c
    """,
    tags=("llm", "dedup"),
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication profile: the cluster-size histogram of exact
    token-set duplicates — THE dashboard numbers a dedup pass is judged
    by (what fraction of the corpus is duplicate mass, and whether it
    sits in a few giant boilerplate clusters or a long tail of pairs).
    ``dup_docs`` per row is the documents a keep-one-per-cluster pass
    would delete at that cluster size; summing the column gives the
    corpus dup rate.

    Shape: one doc-linear pass (tokenize → hash → sort, all codegen) +
    two combiner-bounded groupBys — first on the set key (boilerplate
    clusters collapse map-side), then on the size.  No joins, no pair
    enumeration; runs ahead of the LSH pass to size it.  Uses the same
    _set_keyed cluster key as the collapse/index machinery, so its
    numbers are exactly the clusters those paths exploit."""
    hash_mode = _resolve_hash_mode(
        table(spark, sf_dir, "documents"), None
    )
    base_hash, _ = _minhash_family(hash_mode)
    keyed = _set_keyed(
        _doc_tokens(table(spark, sf_dir, "documents")), "doc_id", "tk", base_hash
    )
    sizes = keyed.groupBy("__set").agg(F.count(F.lit(1)).alias("c"))
    return sizes.groupBy("c").agg(
        F.col("c").alias("cluster_size"),
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("c") * F.count(F.lit(1))).alias("n_docs"),
        ((F.col("c") - F.lit(1)) * F.count(F.lit(1))).alias("dup_docs"),
    ).drop("c")


_SWEEP_FLOOR = 0.80  # lowest threshold the sweep surveys
_SWEEP_BIN_E6 = 50_000  # bin width 0.05 in 1e-6 jaccard units


@register(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH pairs AS ({_minhash_oracle(threshold=_SWEEP_FLOOR)})
    SELECT CAST(ROUND(jaccard * 1000000) AS BIGINT) // {_SWEEP_BIN_E6} AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs
    GROUP BY 1
    """,
    tags=("llm", "dedup"),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair histogram by Jaccard band (width 0.05, floor 0.80)
    — the knob-tuning dashboard for the dedup threshold: "how many more
    pairs would T=0.90 delete than T=0.95" read off one run instead of
    re-running the pipeline per candidate T.  Counts are pairs the
    4×12 banding CATCHES at each level (recall follows the band curve,
    ~0.25 at J=0.80 rising to ~1 at J→1), which is exactly the
    population a threshold change would act on; the oracle mirrors the
    banded construction at the same floor, so the histogram is
    differentially gated bit-for-bit.  Binning is integer math on the
    6-dp-rounded jaccard (never FLOOR(j/0.05), whose float division
    misbins exact boundaries like 0.95).  Same collapsed plan as
    dedup_fuzzy_minhash — only the threshold and the final
    combiner-bounded groupBy differ."""
    d = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        _doc_tokens(d), "doc_id", "tk", threshold=_SWEEP_FLOOR
    )
    return (
        pairs.select(
            F.expr(
                f"CAST(ROUND(jaccard * 1000000) AS BIGINT) div {_SWEEP_BIN_E6}"
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "dedup_lsh_recall",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(list_transform(
               list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
                              t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)),
               h -> h & {MERSENNE31})) AS tk32
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
    ),
    ex AS (
      SELECT COUNT(*) AS n_exact
      FROM toks a JOIN toks b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.tk32, b.tk32)) AS DOUBLE)
            / (len(a.tk32) + len(b.tk32) - len(list_intersect(a.tk32, b.tk32)))
            >= {JACCARD_T}
    ),
    caught AS (SELECT COUNT(*) AS n_caught FROM ({_minhash_oracle()}) q)
    SELECT CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_caught AS BIGINT) AS n_caught,
           ROUND(CAST(n_caught AS DOUBLE) / NULLIF(n_exact, 0), 6) AS recall
    FROM ex, caught
    """,
    tags=("llm", "dedup"),
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH recall as a HASH-GATED number, not a probabilistic
    bound: the exact pair count at J >= 0.95 (prefix-filtered inverted
    index — lossless by the AllPairs theorem, see
    jaccard_prefix_candidates — over the SAME 31-bit masked token-hash
    space the LSH verify uses) against the banded pipeline's caught
    count.  Caught pairs are verified in that space, hence a strict
    subset of exact — recall = caught/exact is exactly defined, both
    sides are deterministic, and the DuckDB oracle recomputes the exact
    side by all-pairs enumeration and the caught side by the mirrored
    band construction, so the measured recall itself must match
    bit-for-bit.  This is the per-corpus answer to "is 4x12 banding
    good enough for THIS data" — the band-curve math says ~0.955 at the
    threshold; this op says what actually happened.

    Scale shape: the exact side is the prefix-filtered plan (hot tokens
    never enter prefixes — no posting-list blowup), the caught side is
    the collapsed LSH plan; two count aggregates cross-joined into one
    row.  md5 space on both sides by construction (the gate spelling);
    the xxhash64 production family has its own recall pinned by
    tests/test_minhash_property.py instead."""
    d = table(spark, sf_dir, "documents")
    toks = _doc_tokens(d)
    base_hash, _ = _minhash_family("md5")
    t32 = toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.transform("tk", base_hash),
                lambda h: h.bitwiseAND(F.lit(MERSENNE31)),
            )
        ).alias("tk32"),
    ).filter(F.size("tk32") > 0)
    # Prefix filtering runs on the masked hashes spelled as strings (the
    # machinery is token-type-agnostic; the total order just has to be
    # shared), one global shard.
    str_toks = t32.select(
        "doc_id",
        F.lit("all").alias("lang"),
        F.transform("tk32", lambda h: h.cast("string")).alias("tk"),
    )
    cand = jaccard_prefix_candidates(str_toks, 19, 20)  # 19/20 == 0.95
    ta = t32.select(F.col("doc_id").alias("doc_a"), F.col("tk32").alias("tk_a"))
    tb = t32.select(F.col("doc_id").alias("doc_b"), F.col("tk32").alias("tk_b"))
    n_inter = F.size(F.array_intersect("tk_a", "tk_b")).cast("double")
    jac = F.try_divide(
        n_inter, F.size("tk_a") + F.size("tk_b") - n_inter
    )
    exact = (
        cand.join(ta, "doc_a").join(tb, "doc_b").filter(jac >= JACCARD_T)
    )
    caught = minhash_lsh_pairs(toks, "doc_id", "tk", hash_mode="md5")
    ex = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    ca = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    return ex.crossJoin(ca).select(
        "n_exact",
        "n_caught",
        F.round(
            F.try_divide(F.col("n_caught"), F.nullif("n_exact", F.lit(0))), 6
        ).alias("recall"),
    )


_URL_ORACLE = """
    WITH urls AS (
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'https://WWW.' || source || '.Example.com/articles/'
                             || CAST(doc_id // 7 AS VARCHAR)
                             || '?utm_source=feed&id=' || CAST(doc_id % 3 AS VARCHAR)
                 WHEN 1 THEN 'https://www.' || source || '.example.com:443/articles/'
                             || CAST(doc_id // 7 AS VARCHAR)
                             || '?id=' || CAST(doc_id % 3 AS VARCHAR) || '&utm_campaign=x'
                 WHEN 2 THEN 'https://www.' || source || '.example.com/articles/'
                             || CAST(doc_id // 7 AS VARCHAR) || '/?id='
                             || CAST(doc_id % 3 AS VARCHAR) || '#frag'
                 ELSE        'https://www.' || source || '.example.com/articles/'
                             || CAST(doc_id // 7 AS VARCHAR)
                             || '?id=' || CAST(doc_id % 3 AS VARCHAR)
               END AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id, url,
               lower(regexp_extract(url, '^(https?)://', 1)) || '://'
               || regexp_replace(lower(regexp_extract(url, '://([^/]+)', 1)),
                                 ':443$', '')
               || regexp_replace(regexp_extract(url, '://[^/]+(/[^?#]*)', 1),
                                 '/$', '')
               || CASE WHEN array_to_string(list_sort(list_filter(
                            string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                            p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') <> ''
                       THEN '?' || array_to_string(list_sort(list_filter(
                            string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                            p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&')
                       ELSE '' END
               AS canonical_url
        FROM urls
    )
    SELECT canonical_url,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants
    FROM canon
    GROUP BY canonical_url
"""


@register("dedup_url_canonical", oracle=_URL_ORACLE, tags=("llm", "dedup"))
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the crawl-pipeline stage BEFORE any
    text dedup: the same page fetched as ``HTTPS://WWW.Host/x/?utm_...#f``
    and ``https://www.host:443/x?...`` must collapse to one canonical key
    so only one copy's text enters the corpus. The fixture has no URL
    column, so the query materializes a deterministic messy-URL variant
    per doc from (doc_id, source) IDENTICALLY in the oracle — the
    text_pii_scrub precedent: non-vacuous and fully differential.

    Canonicalization (each rule a codegen'd regex/array expression, the
    same chain in both engines): lowercase scheme and host, strip the
    default :443 port, drop the fragment, strip the trailing slash,
    drop ``utm_*`` tracking params, and SORT the surviving query params
    so param order can't split a group. Then one groupBy(canonical_url):
    keeper = min doc_id, duplicate and raw-variant counts.

    Scale shape: pure per-row string expressions (no UDF) + one hash
    aggregate on the canonical key — the same plan at 100 TB, with the
    canonical key also being the natural partition key for downstream
    incremental crawls."""
    d = table(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    base = F.concat(
        F.lit("www."), F.col("source"), F.lit(".example.com")
    )
    path = F.concat(F.lit("/articles/"), (F.col("doc_id") / 7).cast("long").cast("string"))
    idp = F.concat(F.lit("id="), (F.col("doc_id") % 3).cast("string"))
    url = (
        F.when(m == 0, F.concat(F.lit("https://WWW."), F.col("source"),
                                F.lit(".Example.com"), path,
                                F.lit("?utm_source=feed&"), idp))
        .when(m == 1, F.concat(F.lit("https://"), base, F.lit(":443"), path,
                               F.lit("?"), idp, F.lit("&utm_campaign=x")))
        .when(m == 2, F.concat(F.lit("https://"), base, path, F.lit("/?"), idp,
                               F.lit("#frag")))
        .otherwise(F.concat(F.lit("https://"), base, path, F.lit("?"), idp))
    )
    u = d.select("doc_id", url.alias("url"))
    qs = F.regexp_extract(F.col("url"), r"\?([^#]*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda p: (p != "") & ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    canonical = F.concat(
        F.lower(F.regexp_extract(F.col("url"), r"^(https?)://", 1)),
        F.lit("://"),
        F.regexp_replace(
            F.lower(F.regexp_extract(F.col("url"), r"://([^/]+)", 1)), r":443$", ""
        ),
        F.regexp_replace(
            F.regexp_extract(F.col("url"), r"://[^/]+(/[^?#]*)", 1), r"/$", ""
        ),
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return (
        u.select("doc_id", "url", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url").alias("n_raw_variants"),
        )
    )
