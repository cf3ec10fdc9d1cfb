"""Leakage-safe split assignment (r8): the oracle-parity/driver gates
hash the full per-doc frame; these pin the PROPERTY the row exists for
— no near-dup pair may straddle splits — plus determinism under
repartitioning and split-is-a-cluster-function."""

from __future__ import annotations

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.operators import dedup as DD
from sport_advantages_moderne_data_infrastructure_spark.plans import catalog
from sport_advantages_moderne_data_infrastructure_spark.plans.textops import (
    capped_shingle_index, near_corpus,
)

catalog._load_all()


def _splits(spark, sf_dir):
    return catalog.REGISTRY["leakage_safe_splits"].spark_fn(spark, sf_dir)


def test_no_near_dup_pair_straddles_splits(spark, sf_dir):
    """The contamination property itself: every LSH near-dup pair's two
    docs carry the SAME split label (stronger than split==f(cluster):
    it also exercises CC correctness — a wrong component breaks it)."""
    s = _splits(spark, sf_dir).select("doc_id", "split")
    pairs = DD.jaccard_pairs(
        near_corpus(spark, sf_dir),
        capped=capped_shingle_index(spark, sf_dir)).select("doc_a", "doc_b")
    j = (pairs
         .join(s.withColumnRenamed("doc_id", "doc_a")
               .withColumnRenamed("split", "split_a"), "doc_a")
         .join(s.withColumnRenamed("doc_id", "doc_b")
               .withColumnRenamed("split", "split_b"), "doc_b"))
    n_pairs = j.count()
    assert n_pairs > 0  # non-vacuous: the synth near-dups exist
    assert j.filter(F.col("split_a") != F.col("split_b")).count() == 0


def test_split_is_pure_function_of_cluster(spark, sf_dir):
    s = _splits(spark, sf_dir)
    assert (s.select("cluster_id", "split").distinct().count()
            == s.select("cluster_id").distinct().count())
    labels = {r["split"] for r in s.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    # hash split lands near 80/10/10 (loose band — small corpus)
    frac = {r["split"]: r["n"] for r in s.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(frac.values())
    assert 0.6 < frac["train"] / total < 0.95


def test_assignment_invariant_under_repartitioning(spark, sf_dir):
    """CC label choice (min doc_id) and the md5 bucket are both
    data-determined — shuffling the input cannot move a doc."""
    corpus = near_corpus(spark, sf_dir)
    pairs = DD.jaccard_pairs(
        corpus,
        capped=capped_shingle_index(spark, sf_dir)).select("doc_a", "doc_b")
    a = DD.connected_components_two_phase(
        corpus.select("doc_id").distinct().repartition(3), pairs)
    b = DD.connected_components_two_phase(
        corpus.select("doc_id").distinct().repartition(17),
        pairs.repartition(5))
    assert ({(r["doc_id"], r["cluster_id"]) for r in a.collect()}
            == {(r["doc_id"], r["cluster_id"]) for r in b.collect()})
