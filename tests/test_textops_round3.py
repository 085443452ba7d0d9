"""Round-3 text operators: Gopher repetition signals + winnowing.

The winnowing test exercises the algorithm's PAPER guarantee (Schleimer,
Wilkerson & Aiken 2003): two documents sharing a token run of at least
window + shingle_n − 1 tokens share at least one fingerprint.
"""

import pyspark.sql.functions as F

from frontier_engine import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_values(spark):
    docs = _docs(
        spark,
        [
            (0, "a b a b a b"),          # bigrams: ab×3 ba×2 → top 3/5; trigrams: aba×2 bab×2 → top 2/4, dup (4-2)/4
            (1, "w x y z"),              # all n-grams unique
            (2, "q"),                    # too short for any n-gram → 0.0
        ],
    )
    out = {r["doc_id"]: r for r in textops.repetition_signals(docs).collect()}
    assert out[0]["top_bigram_frac"] == 0.6
    assert out[0]["top_trigram_frac"] == 0.5
    assert out[0]["dup_trigram_frac"] == 0.5
    assert out[1]["top_bigram_frac"] == round(1 / 3, 6)
    assert out[1]["dup_trigram_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 0.0 and out[2]["dup_trigram_frac"] == 0.0


def test_winnow_shared_run_guarantee(spark):
    """Docs sharing >= window+n-1 consecutive tokens (here 4+3-1=6) must
    share a fingerprint, regardless of the text around the run."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6-token shared run
    docs = _docs(
        spark,
        [
            (0, f"one two three {shared} four five"),
            (1, f"{shared} completely different tail here"),
            (2, "nothing in common with the others at all"),
        ],
    )
    by_doc: dict[int, set[int]] = {}
    for r in textops.winnow_fingerprints(docs).collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[0] & by_doc[1], "shared 6-token run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])


def test_winnow_short_doc_emits_global_min(spark):
    # 4 tokens → 2 shingles (< window=4) → exactly one fingerprint: the min
    docs = _docs(spark, [(0, "a b c d")])
    rows = textops.winnow_fingerprints(docs).collect()
    assert len(rows) == 1


def test_ngram_jaccard_hashed_keys_match_string_semantics(spark):
    """The h60 shingle-key optimization must not change pair results."""
    docs = _docs(
        spark,
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over a lazy dog"),
            (2, "completely unrelated text with other words entirely"),
        ],
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             textops.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert pairs == {(0, 1)}
