"""Training-data pipeline extras: vocabulary building, sequence chunking,
unigram-LM fluency scoring, and embedding-space geometry diagnostics.

These extend the LLM-data family (operators/text.py, dedup.py,
similarity.py) with the remaining ops a 100 TB pretraining pipeline runs
between cleaning and packing: build the token vocabulary (tokenizer
training input), chunk documents into fixed-size overlapping training
windows, score fluency against a corpus unigram LM (the cheapest
perplexity proxy — a standard quality-filter feature), and profile the
embedding space's pairwise-distance distribution (collapse/anisotropy
check before ANN indexing).

All four are pure DataFrame plans: explode → aggregate with map-side
combine, broadcast scalar totals, and the bit-identical double fold from
operators/similarity.py for cosines — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlite_to_clickhouse_spark.io import table
from sqlite_to_clickhouse_spark.operators.similarity import (
    _bind_vec,
    _cos_sql,
    _cosine,
    _dbl,
    _dot,
)
from sqlite_to_clickhouse_spark.operators.text import _tokens
from sqlite_to_clickhouse_spark.registry import register

VOCAB_TOP_K = 200
CHUNK_SIZE = 64
CHUNK_STRIDE = 48
PAIR_OFFSET = 997  # prime offset pairing vec_id ↔ vec_id+997


@register(
    "text_vocab_build",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        FROM documents
    ),
    tf AS (
        SELECT token, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM tf),
    ranked AS (
        SELECT token, tf,
               CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rank,
               CAST(sum(tf) OVER (ORDER BY tf DESC, token
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tf
        FROM tf
    )
    SELECT token, tf, rank,
           round(cum_tf / tot.total, 6) AS coverage
    FROM ranked CROSS JOIN tot
    WHERE rank <= {VOCAB_TOP_K}
    """,
    tags=("llm", "text"),
)
def text_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-vocabulary construction: the top-K corpus tokens by frequency
    with rank and cumulative corpus coverage — the input to tokenizer
    training and the standard "how big must the vocab be for X% coverage"
    curve.

    The explode collapses to vocab-sized counts via map-side combine; the
    rank/cumulative window is unpartitioned but runs over the VOCAB (≤ a
    few million rows at 100 TB, after the aggregate), never the corpus.
    The grand total is an unbounded-frame sum over the SAME unpartitioned
    window — a separate `tf.agg(...)` + crossJoin would make Spark
    recompute the whole corpus-scan→tf subtree a second time (plans are
    trees; common subplans are not shared), so the window form halves the
    corpus reads: one scan, two exchanges total. Ties break on the token
    string so both engines pick the same top-K prefix."""
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return (
        tf.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_tf",
            F.sum("tf").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "total",
            F.sum("tf")
            .over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("double"),
        )
        .filter(F.col("rank") <= VOCAB_TOP_K)
        .select(
            "token",
            "tf",
            "rank",
            F.round(F.col("cum_tf") / F.col("total"), 6).alias("coverage"),
        )
    )


@register(
    "text_doc_chunk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(s / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           CAST(s AS INTEGER) AS chunk_start,
           CAST(len(list_slice(toks, s + 1, s + {CHUNK_SIZE})) AS INTEGER)
               AS chunk_len,
           md5(array_to_string(list_slice(toks, s + 1, s + {CHUNK_SIZE}), ' '))
               AS chunk_hash
    FROM tok, unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS u(s)
    """,
    tags=("llm", "text"),
)
def text_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence chunking: split each document into fixed-size overlapping
    token windows (size 64, stride 48 — the sliding-window packing used
    when documents exceed the model context). Emits per-chunk offsets,
    lengths, and a content hash (the downstream join key for chunk-level
    dedup).

    Pure columnar explode: the chunk starts are a generated int sequence,
    the chunk text a `slice` of the already-split token array — the doc
    row fans out to ceil(n/stride) chunk rows with no shuffle at all
    (narrow transformation), so this parallelizes perfectly at 100 TB.
    The final chunk is allowed to be short (< size) so every token is
    covered exactly by the stride grid."""
    d = table(spark, sf_dir, "documents")
    n = F.size(F.col("toks"))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.expr(f"slice(toks, chunk_start + 1, {CHUNK_SIZE})")
    return (
        d.select("doc_id", _tokens(F.col("text")).alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            (F.col("chunk_start") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.size(chunk).alias("chunk_len"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        FROM documents
    ),
    tf AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1),
    tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM tf)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(tf.tf / tot.total)), 6) AS avg_logprob,
           round(min(ln(tf.tf / tot.total)), 6) AS min_logprob
    FROM tok t
    JOIN tf ON t.token = tf.token
    CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    tags=("llm", "text"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM fluency score per document: mean and min token
    log-probability under the corpus's own unigram distribution — the
    cheapest perplexity proxy, a standard quality-filter feature (gibberish
    and boilerplate both sit in the tails).

    Fit-then-score collapses to ONE tokenize pass: the per-token global
    frequency is a count-over-window on token over the exploded stream
    (every occurrence is a row, so the token-partition size IS tf) — the
    groupBy-and-join-back form re-ran the corpus explode for the tf
    branch (plans are trees; the same flaw fixed in text_tfidf). The
    grand total rides a broadcast scalar from a sum(size(tokens)) scan —
    it re-tokenizes but never explodes or shuffles a token.
    ln() on identical double inputs is engine-stable (same precedent as
    text_tfidf's LN, driver-green since r3)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    total = d.agg(
        F.sum(F.size(_tokens(F.col("text")))).cast("double").alias("total")
    )
    logp = F.log(F.col("tf") / F.col("total"))
    return (
        tok.withColumn("tf", F.count(F.lit(1)).over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
            F.round(F.min(logp), 6).alias("min_logprob"),
        )
    )


@register(
    "sim_pair_distance_stats",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id,
               {_cos_sql('a.embedding', 'b.embedding')} AS cos
        FROM embeddings a
        JOIN embeddings b ON b.vec_id = a.vec_id + {PAIR_OFFSET}
    )
    SELECT round(floor(cos * 10) / 10, 1) AS cos_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(cos), 4) AS avg_cos,
           round(min(cos), 6) AS min_cos,
           round(max(cos), 6) AS max_cos
    FROM pairs
    GROUP BY 1
    """,
    tags=("llm", "similarity"),
)
def sim_pair_distance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space geometry diagnostic: the distribution of cosine
    similarity over a deterministic sample of vector pairs (vec_id paired
    with vec_id+997), bucketed into 0.1-wide histogram bins. A collapsed
    or anisotropic embedding space (all mass near one bucket) breaks both
    near-dup thresholds and ANN recall — this is the check you run before
    trusting either.

    The pairing is an equi self-join on a shifted key — ONE hash shuffle
    of (id, vector), linear in table size, no crossJoin anywhere. The
    cosine reuses similarity.py's fold, bit-identical to the oracle's SQL
    expression, so the bucket boundaries cut identical doubles and the
    histogram is exactly reproducible."""
    e = table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = _cosine(_dbl(F.col("a.embedding")), _dbl(F.col("b.embedding")))
    pairs = a.join(
        b, F.col("b.vec_id") == F.col("a.vec_id") + PAIR_OFFSET
    ).select(cos.alias("cos"))
    return pairs.groupBy(
        F.round(F.floor(F.col("cos") * 10) / 10, 1).alias("cos_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("cos"), 4).alias("avg_cos"),
        F.round(F.min("cos"), 6).alias("min_cos"),
        F.round(F.max("cos"), 6).alias("max_cos"),
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH d AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
    ), m AS (
        SELECT vec_id, e,
               list_max(list_transform(e, x -> abs(x))) AS maxabs
        FROM d
    )
    SELECT vec_id,
           CAST(len(e) AS INTEGER) AS n_dims,
           round(maxabs, 9) AS scale,
           array_to_string(
             CASE WHEN maxabs = 0
                  THEN list_transform(e, x -> CAST(0 AS INTEGER))
                  ELSE list_transform(e, x -> CAST(round(127 * x / maxabs)
                                                   AS INTEGER))
             END, ',') AS codes,
           CAST(CASE WHEN maxabs = 0 THEN 0
                ELSE list_aggregate(
                    list_transform(e, x -> CAST(round(127 * x / maxabs)
                                                AS BIGINT)), 'sum')
           END AS BIGINT) AS code_sum
    FROM m
    """,
    tags=("llm", "embedding"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization — the 4×-compression layer a
    100 TB embedding store applies before anything else (scalar
    quantization: per-vector scale = max |x|, codes = round(127·x/scale)).
    Unlike the PQ path this is losslessly invertible to 1/127 precision
    and keeps dot products cheap (int8 SIMD downstream).

    Everything is per-row Catalyst higher-order lambdas (`transform` /
    `aggregate`) over the float array widened to double — exact IEEE
    widening, so both engines quantize identical inputs; no shuffle at
    all, and the plan is a single codegen projection. Zero vectors get
    scale 0 / all-zero codes rather than a NaN poisoning the store.

    Gate rendering: the code vector is emitted as an exact comma-joined
    STRING — integer formatting is unambiguous in both engines, and the
    driver's canonicalizer factorizes column values, so a top-level
    array column is unhashable there (the embedding_normalize r5 red;
    this op was caught by the same pre-driver schema audit in r6)."""
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    ed = e.select("vec_id", dbl.alias("e"))
    maxabs = F.array_max(F.transform("e", F.abs))
    q = ed.select(
        "vec_id",
        F.size("e").alias("n_dims"),
        F.round(maxabs, 9).alias("scale"),
        maxabs.alias("_m"),
        F.col("e"),
    )
    code = lambda x: F.round(F.lit(127) * x / F.col("_m")).cast("int")  # noqa: E731
    zeros = F.transform("e", lambda x: F.lit(0))
    codes = F.when(F.col("_m") == 0, zeros).otherwise(F.transform("e", code))
    code_sum = F.when(F.col("_m") == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.transform("e", lambda x: F.round(F.lit(127) * x / F.col("_m")).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
    )
    return q.select(
        "vec_id",
        "n_dims",
        "scale",
        F.concat_ws(
            ",", F.transform(codes, lambda c: c.cast("string"))
        ).alias("codes"),
        code_sum.alias("code_sum"),
    )


@register(
    "pipeline_dataset_card",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, source, text, n_chars,
               len(string_split(trim(text), ' ')) AS n_tokens,
               md5(text) AS h
        FROM documents
        WHERE text IS NOT NULL AND trim(text) <> ''
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           round(avg(n_chars), 6) AS avg_chars,
           round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS pct_en,
           CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
           round(1.0 - count(DISTINCT h) / CAST(count(*) AS DOUBLE), 6)
               AS exact_dup_rate
    FROM toks
    """,
    tags=("llm", "pipeline", "report"),
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus "dataset card" in one row: document / token / language /
    source counts, mean length, English share, and the exact-duplicate
    rate — the summary block every curated-training-set release publishes,
    and the numbers an operator checks before and after each cleaning
    stage of the pipeline.

    One pass over documents: tokenization and content hashing are per-row
    projections, then a single global aggregate (two exact NDVs ride the
    same hash aggregate; at 100 TB swap them for approx_count_distinct and
    an HLL union across shards — same plan shape). Whitespace token count
    matches the oracle's split-on-space exactly."""
    d = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    t = d.select(
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.trim("text"), " ")).alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    return t.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        # try_divide: on an EMPTY corpus count(*) is 0 and ANSI mode turns
        # a bare / into DIVIDE_BY_ZERO — the card must render (with NULL
        # rates), not kill the job, when a source partition is empty.
        F.round(
            F.try_divide(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)),
                F.count("*").cast("double"),
            ),
            6,
        ).alias("pct_en"),
        F.countDistinct("h").alias("n_unique_texts"),
        F.round(
            1.0 - F.try_divide(F.countDistinct("h"), F.count("*").cast("double")), 6
        ).alias("exact_dup_rate"),
    )


_HN_ANCHORS = 30  # anchors = vec_id < 30


@register(
    "sample_hard_negatives",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
               b.vec_id AS cand_id,
               (a.label = b.label) AS same_label,
               {_cos_sql('a.embedding', 'b.embedding')} AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < {_HN_ANCHORS}
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                 PARTITION BY anchor_id, same_label
                 ORDER BY cos DESC, cand_id) AS rn
        FROM pairs
    )
    SELECT anchor_id,
           CAST(anchor_label AS BIGINT) AS anchor_label,
           CAST(min(CASE WHEN same_label THEN cand_id END) AS BIGINT) AS pos_id,
           round(min(CASE WHEN same_label THEN cos END), 6)  AS pos_cos,
           CAST(min(CASE WHEN NOT same_label THEN cand_id END) AS BIGINT) AS neg_id,
           round(min(CASE WHEN NOT same_label THEN cos END), 6) AS neg_cos,
           round(min(CASE WHEN same_label THEN cos END)
                 - min(CASE WHEN NOT same_label THEN cos END), 6) AS margin
    FROM ranked WHERE rn = 1
    GROUP BY anchor_id, anchor_label
    """,
    tags=("llm", "similarity", "sampling"),
)
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for embedding training: per anchor, the hardest
    positive (most-similar SAME-label vector — the easy pair you already
    get right) and the hardest negative (most-similar OTHER-label vector
    — the pair a contrastive/triplet loss learns from), plus the margin
    between them. Negative margins mark anchors whose nearest neighbor
    has the wrong label — exactly the batch-mining signal (FaceNet-style
    semi-hard selection drops out of the same ranked pairs).

    Plan: anchors broadcast (bounded probe set, the sim_topk_cosine
    contract); the vector table streams through ONCE — the same-label
    and other-label tops come from one rank window partitioned by
    (anchor, same_label), then one per-anchor aggregate folds the two
    rn=1 rows into a single triplet row. No second pass, no self-join of
    the pair stream; embeddings never shuffle (the exchange carries
    (anchor, cand, cos, flag) rows only). Ties break on ascending
    candidate id; cosines rounded to 6 dp for the gate."""
    e = table(spark, sf_dir, "embeddings")
    # Both sides pre-bind double vector + norm (_bind_vec): every corpus
    # row pairs with all anchors, so per-pair work drops to one dot and
    # each norm is computed N+A times instead of N·A (the interpreted-HOF
    # CSE rule — see similarity._bind_vec).
    ev = _bind_vec(e, "embedding", ["vec_id", "label"], "__hn_v", "__hn_vn")
    anchors = _bind_vec(
        e.filter(F.col("vec_id") < _HN_ANCHORS).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            "embedding",
        ),
        "embedding",
        ["anchor_id", "anchor_label"],
        "__hn_a",
        "__hn_an",
    )
    cos = _dot(F.col("__hn_a"), F.col("__hn_v")) / (
        F.col("__hn_an") * F.col("__hn_vn")
    )
    pairs = (
        ev.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("cand_id"),
            (F.col("label") == F.col("anchor_label")).alias("same_label"),
            cos.alias("cos"),
        )
    )
    w = Window.partitionBy("anchor_id", "same_label").orderBy(
        F.desc("cos"), F.asc("cand_id")
    )
    top = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    pos_c = F.when(F.col("same_label"), F.col("cos"))
    neg_c = F.when(~F.col("same_label"), F.col("cos"))
    return top.groupBy("anchor_id", F.col("anchor_label").cast("long").alias("anchor_label")).agg(
        F.min(F.when(F.col("same_label"), F.col("cand_id"))).cast("long").alias("pos_id"),
        F.round(F.min(pos_c), 6).alias("pos_cos"),
        F.min(F.when(~F.col("same_label"), F.col("cand_id"))).cast("long").alias("neg_id"),
        F.round(F.min(neg_c), 6).alias("neg_cos"),
        F.round(F.min(pos_c) - F.min(neg_c), 6).alias("margin"),
    )


_PPL_KEEP_NUM = {1: 4294967296, 2: 2147483648, 3: 429496730}  # 100% / 50% / 10%


@register(
    "sample_perplexity_buckets",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        FROM documents
    ),
    lp AS (
        SELECT doc_id,
               ln((count(*) OVER (PARTITION BY token))
                  / (CAST((SELECT count(*) FROM tok) AS DOUBLE))) AS logprob
        FROM tok
    ),
    scored AS (
        SELECT doc_id, avg(logprob) AS avg_logprob
        FROM lp
        GROUP BY doc_id
    ),
    bucketed AS (
        SELECT doc_id, avg_logprob,
               CAST(ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS BIGINT)
                   AS ppl_bucket
        FROM scored
    )
    SELECT ppl_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(avg_logprob), 6) AS worst_logprob,
           CAST(sum(CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT)
                       < CASE ppl_bucket WHEN 1 THEN {_PPL_KEEP_NUM[1]}
                                         WHEN 2 THEN {_PPL_KEEP_NUM[2]}
                                         ELSE {_PPL_KEEP_NUM[3]} END
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM bucketed
    GROUP BY ppl_bucket
    """,
    tags=("llm", "sampling", "quality"),
)
def sample_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity-bucket sampling: score every document with
    the corpus-unigram LM (cheapest perplexity proxy, see
    text_unigram_logprob), tercile the corpus into head/middle/tail by
    fluency, and keep each bucket at a different hash-gated rate (100 % /
    50 % / 10 %) — the recipe that keeps some stylistic diversity from
    the tail instead of hard-thresholding it away.

    One tokenize pass (count-over-window tf, §6.4a), per-doc aggregate,
    then the ntile + keep-gate run over doc-level rows only. The keep
    decision is the integer-threshold md5 gate shared by the whole
    sampling family: deterministic, order- and partitioning-stable.
    The unpartitioned ntile is post-aggregation (|docs| rows after the
    corpus collapses); at extreme doc counts swap in percent_rank
    buckets, same semantics."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    total = d.agg(
        F.sum(F.size(_tokens(F.col("text")))).cast("double").alias("total")
    )
    tf = F.count(F.lit(1)).over(Window.partitionBy("token"))
    scored = (
        tok.withColumn("tf", tf)
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.avg(F.log(F.col("tf") / F.col("total"))).alias("avg_logprob"))
    )
    bucketed = scored.withColumn(
        "ppl_bucket",
        F.ntile(3)
        .over(Window.orderBy(F.desc("avg_logprob"), F.asc("doc_id")))
        .cast("long"),
    )
    u32 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    keep_below = (
        F.when(F.col("ppl_bucket") == 1, F.lit(_PPL_KEEP_NUM[1]))
        .when(F.col("ppl_bucket") == 2, F.lit(_PPL_KEEP_NUM[2]))
        .otherwise(F.lit(_PPL_KEEP_NUM[3]))
    )
    return bucketed.groupBy("ppl_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.min("avg_logprob"), 6).alias("worst_logprob"),
        F.sum((u32 < keep_below).cast("long")).cast("long").alias("n_kept"),
    )


@register(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
               unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
        FROM toks
    ),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM bg)
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v))), 6) AS avg_logprob,
           round(min(ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v))), 6) AS min_logprob
    FROM bg b
    JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
    JOIN c1 ON c1.w1 = b.w1
    CROSS JOIN v
    GROUP BY b.doc_id
    """,
    tags=("llm", "text"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency score per document — the CCNet-style perplexity
    filter one order up from text_unigram_logprob: each adjacent token
    pair scores ln P(w2|w1) under the corpus's own add-0.5-smoothed
    bigram model (P = (c(w1,w2)+0.5) / (c(w1·)+0.5·V), V = continuation
    vocabulary), so word-salad that passes the unigram filter (common
    words in impossible orders) lands in the tail where the quality cut
    removes it.

    No model join-back: c(w1,w2) and c(w1·) are counts-over-windows ON
    the exploded bigram stream itself (the partition size IS the count —
    text_unigram_logprob's plan trick, one exchange per partitioning).
    The scoring path explodes ONCE; V's broadcast scalar re-explodes the
    corpus for its count-distinct because plans are trees — a map-side
    partial-aggregated second pass, pinned at exactly two Generates in
    tests/test_plans.py so a third (a join-back creeping in) fails CI.
    ln() on
    identical double inputs is engine-stable (text_tfidf/unigram
    precedent, driver-green since r3); the smoothing arithmetic keeps
    integer counts exact until a single IEEE division."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens(F.col("text")).alias("tk"))
    tk = F.col("tk")
    pairs = F.when(
        F.size(tk) < 2,
        F.array().cast("array<struct<w1:string,w2:string>>"),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - 2),
            lambda i: F.struct(
                F.element_at(tk, i + 1).alias("w1"),
                F.element_at(tk, i + 2).alias("w2"),
            ),
        )
    )
    bg = (
        toks.select("doc_id", F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    v = bg.agg(F.countDistinct("w2").cast("double").alias("v"))
    logp = F.log((F.col("c12") + 0.5) / (F.col("c1") + 0.5 * F.col("v")))
    return (
        bg.withColumn("c12", F.count(F.lit(1)).over(Window.partitionBy("w1", "w2")))
        .withColumn("c1", F.count(F.lit(1)).over(Window.partitionBy("w1")))
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
            F.round(F.min(logp), 6).alias("min_logprob"),
        )
    )
