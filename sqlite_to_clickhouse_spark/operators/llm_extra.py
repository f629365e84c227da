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
from sqlite_to_clickhouse_spark.operators.similarity import _cos_sql, _cosine, _dbl
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

    Two passes over the corpus (the unavoidable shape: the LM must be
    fitted before it can score): pass 1 collapses the token stream to the
    vocab-sized frequency table, pass 2 re-streams tokens and joins the
    frequencies back — broadcast at any realistic vocab size, degrading
    to a hash join on the 8-byte-hashable token otherwise; the grand
    total is a broadcast scalar off the small tf table.
    ln() on identical double inputs is engine-stable (same precedent as
    text_tfidf's LN, driver-green since r3)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    total = tf.agg(F.sum("tf").cast("double").alias("total"))
    logp = F.log(F.col("tf") / F.col("total"))
    return (
        tok.join(F.broadcast(tf), "token")
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
