"""Property-based checks of minhash_lsh_pairs (the library API under
dedup_fuzzy_minhash): on random small corpora,

- PRECISION is exact by construction (the verify stage computes true
  Jaccard on the 31-bit-masked distinct token hashes) — every returned
  pair must satisfy jaccard >= threshold against a driver-side
  recomputation on the same masked-hash space;
- RECALL at J=1 is a hard guarantee, not probabilistic: identical token
  SETS produce identical signatures, hence identical band keys, hence a
  candidate pair in every band — such pairs can never be missed.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from sqlite_to_clickhouse_spark.operators.dedup import (
    JACCARD_T,
    MERSENNE31,
    minhash_lsh_pairs,
)

_VOCAB = [f"w{i}" for i in range(12)]


def _masked_hashes(tokens):
    """Mirror the pipeline's token-hash space: md5 → first 15 hex digits
    → 60-bit int → & M31, distinct."""
    out = set()
    for t in set(tokens):
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        out.add(h & MERSENNE31)
    return out


def _true_jaccard(a, b):
    ha, hb = _masked_hashes(a), _masked_hashes(b)
    if not ha or not hb:
        return 0.0
    return len(ha & hb) / len(ha | hb)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=8),
        min_size=2,
        max_size=10,
    )
)
def test_minhash_pairs_precise_and_exact_dupes_never_missed(spark, docs):
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)],
        "doc_id long, tokens array<string>",
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(df, "doc_id", "tokens").collect()
    }
    # Precision: every returned pair clears the threshold on a driver-side
    # recomputation over the identical masked-hash token space.
    for (a, b), jac in got.items():
        true_j = _true_jaccard(docs[a], docs[b])
        assert true_j >= JACCARD_T
        assert abs(jac - round(true_j, 6)) < 1e-9
    # Guaranteed recall at J=1: identical token SETS must always pair.
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if set(docs[i]) == set(docs[j]):
                assert (i, j) in got, f"identical docs {i},{j} missed"
