"""Semantic invariants for the two late-r5 operators beyond oracle
parity (test_oracle_parity / test_driver_gate cover the DuckDB hash
match): SCD2 interval algebra and mixture-sampling quota maximality."""

from __future__ import annotations

from collections import defaultdict

from sport_advantages_moderne_data_infrastructure_spark.plans import catalog

from .conftest import SF_DIR

catalog._load_all()


def test_scd2_intervals_are_contiguous_and_single_current(spark):
    rows = (catalog.REGISTRY["scd2_employee_sport_dim"]
            .spark_fn(spark, SF_DIR).collect())
    assert rows
    by_emp = defaultdict(list)
    for r in rows:
        by_emp[r.id_employee].append(r)
    for emp, vs in by_emp.items():
        vs.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval, and it is the last one
        assert [r.is_current for r in vs].count(1) == 1
        assert vs[-1].is_current == 1 and vs[-1].valid_to is None
        for a, b in zip(vs, vs[1:]):
            # contiguous, non-overlapping, and a REAL change each time
            assert a.valid_to == b.valid_from, (emp, a, b)
            assert a.sport_type != b.sport_type, (emp, a, b)


def test_scd2_version_count_matches_change_count(spark):
    """Row count == number of value changes (+1 initial) per employee,
    recomputed independently from the ordered activity stream."""
    from sport_advantages_moderne_data_infrastructure_spark.sources import (
        domain as D,
    )
    acts = (D.sport_activities(spark, SF_DIR)
            .select("id_employee", "sport_type", "start_datetime", "id")
            .collect())
    seq = defaultdict(list)
    for r in acts:
        seq[r.id_employee].append((r.start_datetime, r.id, r.sport_type))
    expected = 0
    for vs in seq.values():
        vs.sort()
        last = object()
        for _, _, st in vs:
            if st != last:
                expected += 1
                last = st
    got = (catalog.REGISTRY["scd2_employee_sport_dim"]
           .spark_fn(spark, SF_DIR).count())
    assert got == expected


def test_mixture_respects_quota_and_is_maximal(spark):
    rows = (catalog.REGISTRY["mixture_token_budget"]
            .spark_fn(spark, SF_DIR).collect())
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
        assert r.cum_tokens <= r.quota_tokens
    # weight-0 sources (srcN with N % 7 == 0) never appear
    for src in by_src:
        assert int(src[3:]) % 7 != 0, src
    for src, vs in by_src.items():
        # the selected set's token mass is exactly the max cumulative sum
        assert sum(r.n_tokens for r in vs) == max(r.cum_tokens for r in vs)


def test_mixture_selection_is_priority_prefix(spark):
    """Selection == the prefix of the md5-priority order whose running
    token sum fits the quota — recomputed driver-side per source."""
    import hashlib

    from pyspark.sql import functions as F

    from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (  # noqa: E501
        load_table,
    )
    docs = (load_table(spark, SF_DIR, "documents")
            .select("doc_id", "source",
                    F.size(F.split(F.trim("text"), " +")).cast("bigint")
                    .alias("n_tokens"))
            .collect())
    got = {(r.doc_id, r.cum_tokens, r.quota_tokens)
           for r in catalog.REGISTRY["mixture_token_budget"]
           .spark_fn(spark, SF_DIR).collect()}
    per_src = defaultdict(list)
    for r in docs:
        pri = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        per_src[r.source].append((pri, r.doc_id, r.n_tokens))
    total = sum(n for vs in per_src.values() for _, _, n in vs)
    weights = {s: 0 if int(s[3:]) % 7 == 0 else 1 + int(s[3:]) % 3
               for s in per_src}
    tw = sum(weights.values())
    budget = total // 2
    expected = set()
    for s, vs in per_src.items():
        quota = budget * weights[s] // tw
        cum = 0
        for pri, doc_id, n in sorted(vs):
            cum += n
            if cum > quota:
                break
            expected.add((doc_id, cum, quota))
    assert got == expected
