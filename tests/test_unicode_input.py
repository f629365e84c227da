"""Unicode-text robustness: the differential gate must hold when the
corpus contains multi-byte UTF-8 (accents, CJK, emoji). This is where
byte-vs-codepoint semantics quietly diverge: DuckDB's strlen counts
BYTES and its levenshtein edits bytes, Spark's length/levenshtein count
codepoints, and any oracle reconstructing "payload bytes" via
ascii(substring(...)) gets codepoints instead (an emoji's codepoint
squared even overflows INT32).

The byte-defined multimodal oracles now recover exact bytes via
hex(encode(text)) nibble lookup, and fn_editdistance runs over an
ASCII projection on both sides (transliteration-normalized fuzzy
matching) — this suite pins all of that on a fixture with unicode
injected into every 5th document.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.mutant_sweep  # mutated-fixture sweep module (see README: three-command split)

from sqlite_to_clickhouse_spark.io import TABLES
from sqlite_to_clickhouse_spark.registry import all_queries
from tests.utils import assert_df_matches_oracle

_Q = all_queries()

_OPS = [
    # the byte-defined family (failed before the byte-exact oracles)
    "multimodal_metadata",
    "multimodal_decode_features",
    "multimodal_audio_window",
    "multimodal_phash_dedup",
    "fn_editdistance",
    # representative text ops (passed the sweep; keep them pinned)
    "text_tokens",
    "text_char_entropy",
    "text_tfidf",
    "doc_fingerprint",
    # round-7 additions: md5-of-UTF-8 token hashing must agree byte-wise
    "text_hashing_vectorizer",
    "dedup_simhash_nn",
    # round-8: persisted-index banding must agree with DuckDB byte-wise
    "dedup_incremental",
    # round-9: tombstoned lookup shares that banding front half
    "dedup_incremental_deletes",
    # round-9 session 2: source-level vocabulary join must agree on
    # unicode token identity byte-wise
    "text_source_overlap",
    # unicode text changes token counts; the plan arithmetic must agree
    "sample_mixture_weights",
    # unicode bigram keys must join/count byte-identically
    "text_bigram_logprob",
]


@pytest.fixture(scope="module")
def unicode_sf_dir(sf_dir, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_unicode")
    for t in TABLES:
        if t != "documents":
            shutil.copy(os.path.join(sf_dir, f"{t}.parquet"), str(dst / f"{t}.parquet"))
    tab = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    texts = tab.column("text").to_pylist()
    out = []
    for i, t in enumerate(texts):
        if t is not None and i % 5 == 2:
            t = t.replace("table", "tablé").replace("fast", "快速") + " émoji 😀 naïve"
        out.append(t)
    cols = {n: tab.column(n) for n in tab.schema.names}
    cols["text"] = pa.array(out, pa.string())
    # fixture contract: n_chars == length(text) (codepoints)
    cols["n_chars"] = pa.array(
        [None if t is None else len(t) for t in out], pa.int64()
    )
    pq.write_table(pa.table(cols), str(dst / "documents.parquet"))
    return str(dst)


@pytest.fixture(scope="module")
def unicode_duck(unicode_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{unicode_sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _OPS)
def test_oracle_match_with_unicode(spark, unicode_duck, unicode_sf_dir, name):
    q = _Q[name]
    df = q.fn(spark, unicode_sf_dir)
    if q.oracle is None:
        assert df.count() >= 0 and df.columns
    else:
        assert_df_matches_oracle(df, unicode_duck, q.oracle, name=name)


_ER_UNI_OPS = [
    "er_blocked_pairs",
    "er_clusters",
    "er_index_build",
    "er_incremental",
    "er_index_append",
    "er_index_delete",
    "er_index_delete_compact",
    "er_reordered_match",
]


@pytest.fixture(scope="module")
def unicode_names_sf_dir(sf_dir, tmp_path_factory):
    """The shared unicode mutant never touches p_name — the ER family's
    key column — so this dedicated mutant accents/extends every 5th
    part name: levenshtein must count CODEPOINTS identically in both
    engines (the byte-vs-codepoint class the r5 sweep found in
    fn_editdistance), splits must tokenize the CJK word as one token,
    and the md5 delete bucket must hash the UTF-8 bytes identically."""
    import shutil

    dst = tmp_path_factory.mktemp("sf_unicode_names")
    for t in TABLES:
        if t != "part":
            shutil.copy(os.path.join(sf_dir, f"{t}.parquet"), str(dst / f"{t}.parquet"))
    tab = pq.read_table(os.path.join(sf_dir, "part.parquet"))
    names = tab.column("p_name").to_pylist()
    out = []
    for i, nm in enumerate(names):
        if nm is not None and i % 5 == 2:
            nm = nm.replace("a", "á").replace("o", "ö") + " 快速"
        out.append(nm)
    cols = {n: tab.column(n) for n in tab.schema.names}
    cols["p_name"] = pa.array(out, pa.string())
    pq.write_table(pa.table(cols), str(dst / "part.parquet"))
    return str(dst)


@pytest.fixture(scope="module")
def unicode_names_duck(unicode_names_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{unicode_names_sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.mutant_keycol
@pytest.mark.parametrize("name", _ER_UNI_OPS)
def test_er_ops_under_unicode_names(spark, unicode_names_duck, unicode_names_sf_dir, name):
    q = _Q[name]
    assert_df_matches_oracle(
        q.fn(spark, unicode_names_sf_dir),
        unicode_names_duck,
        q.oracle,
        name=f"{name}_uninames",
    )
