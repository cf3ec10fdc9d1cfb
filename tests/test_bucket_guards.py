"""§5-safety guards on single-task bucket materializations (VERDICT r14
#5): the LSH bucket-grouped pair expansion and the per-doc shingle-set
rows each materialize one logical group inside one task. The caps turn
the design invariants ("LSH key design bounds bucket size", "per-doc
sets are text-length-bounded") into CHECKED preconditions: an
adversarial corpus fails loudly at the cap instead of OOMing an
executor, and the normal path is unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.operators import (
    dedup as DD,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_lsh_bucket_fails_loudly_at_cap(spark, monkeypatch):
    """A degenerate corpus (many docs with identical text → identical
    minhash signatures → ONE band bucket) trips the cap with the remedy
    in the message — not an executor OOM."""
    monkeypatch.setattr(DD, "LSH_BUCKET_CAP", 8)
    base = ("the quick brown fox jumps over the lazy dog while the "
            "band bucket grows far beyond any sane corpus shape")
    corpus = _docs(spark, [(i, base) for i in range(20)])
    with pytest.raises(Exception, match="LSH_BUCKET_CAP"):
        DD.lsh_candidate_pairs(corpus).count()


def test_lsh_bucket_under_cap_unchanged(spark, monkeypatch):
    """Under the cap the guard is a no-op: same candidate pairs as the
    un-guarded C(n,2) semantics (every ordered pair of the colliding
    docs), and the guard adds no exchange to the plan."""
    monkeypatch.setattr(DD, "LSH_BUCKET_CAP", 8)
    base = ("the quick brown fox jumps over the lazy dog while the "
            "band bucket stays comfortably inside the configured cap")
    corpus = _docs(spark, [(i, base) for i in range(4)])
    q = DD.lsh_candidate_pairs(corpus)
    got = {(r["doc_a"], r["doc_b"]) for r in q.collect()}
    assert got == {(a, b) for a in range(4) for b in range(4) if a < b}
    # final plan only (an executed AQE plan's toString repeats the
    # initial plan below it, double-counting every node)
    plan = (q._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    # one shuffle each for the signature aggregation (sigs computed
    # from the corpus here), the (band,key) grouping, and distinct —
    # the guard must not add any (it is a CASE in a projection)
    assert plan.count("Exchange hashpartitioning") <= 3


def test_megadoc_shingle_set_fails_loudly_at_cap(spark, monkeypatch):
    monkeypatch.setattr(DD, "DOC_SHINGLE_SET_CAP", 10)
    long_text = " ".join(f"tok{i:04d}" for i in range(120))
    corpus = _docs(spark, [(1, long_text), (2, long_text + " tail")])
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(Exception, match="DOC_SHINGLE_SET_CAP"):
        DD.jaccard_for_pairs(corpus, pairs).count()


def test_jaccard_for_pairs_under_cap_unchanged(spark):
    """Normal-path result is byte-identical to jaccard_pairs' scoring
    for the same pair."""
    a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon")
    b = a.replace("upsilon", "omega")
    corpus = _docs(spark, [(1, a), (2, b)])
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    got = DD.jaccard_for_pairs(corpus, pairs).collect()
    ref = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in DD.jaccard_pairs(corpus, threshold=0.0).collect()}
    assert len(got) == 1
    r = got[0]
    assert ref[(r["doc_a"], r["doc_b"])] == r["jaccard"]
