"""Replica of the external driver's correctness gate at ITS scale:
every driver-facing query (the 50-slot `__spark_entry__.queries()`
surface) vs its DuckDB oracle at sf0.01 — `test_oracle_parity` covers
the FULL registry at sf0.001 for speed; this module pins the exact
(surface, scale) pair the external gate hashes, so a query that only
diverges at sf0.01 (row-count-dependent plans, tie distributions) can
never reach the driver unverified."""

from __future__ import annotations

import pytest

from sport_advantages_moderne_data_infrastructure_spark.plans import catalog

from .conftest import SF_DIR_T2
from .oracle import assert_oracle_match, duck_connection

catalog._load_all()
DRIVER_NAMES = [n for n, q in catalog.REGISTRY.items()
                if q.driver and q.oracle is not None]


def test_entry_survives_rotation(spark):
    """__spark_entry__.entry() must work regardless of which rows hold
    driver slots — r10's demotion of prime_query broke it via
    queries()[...] (KeyError on a vanilla run); it now reads REGISTRY."""
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert "prime_query" not in E.queries()  # the broken precondition


def test_driver_surface_is_fully_oracle_bearing():
    # the r2 state (two no_oracle driver rows) may not come back
    bare = [n for n, q in catalog.REGISTRY.items()
            if q.driver and q.oracle is None]
    assert bare == [], f"driver queries without an oracle: {bare}"
    assert len(DRIVER_NAMES) <= catalog.DRIVER_CAP


@pytest.fixture(scope="module")
def con_t2():
    c = duck_connection(SF_DIR_T2)
    yield c
    c.close()


@pytest.mark.parametrize("name", DRIVER_NAMES)
def test_driver_query_matches_oracle_at_gate_scale(spark, con_t2, name):
    q = catalog.REGISTRY[name]
    df = q.spark_fn(spark, SF_DIR_T2)
    assert_oracle_match(df, con_t2, q.oracle, name)


def test_never_gated_set_is_exactly_the_adc_exception():
    """r10 (VERDICT r9 #2): the set of registry rows that have NEVER
    held a driver-gate slot must stay exactly the three ADC bench rows
    (the documented permanent no-SQL-oracle convention; their quality
    is enforced via the gated ann_pq_recall_floor /
    ann_refine_recall_floor siblings). tests/gated_history.json is the
    checked-in manifest of every row that ever held a slot — gating a
    new row means adding it there, so a future rotation can't silently
    recreate the r8 text_bm25_topk gap."""
    import glob
    import json
    import os

    here = os.path.dirname(__file__)
    manifest = set(json.load(open(os.path.join(here,
                                               "gated_history.json"))))
    # cross-check: the manifest covers every recorded driver round
    recorded = set()
    for f in glob.glob(os.path.join(here, "..", "CORRECTNESS_r*.json")):
        d = json.load(open(f))
        rows = d.get("rows", d) if isinstance(d, dict) else d
        recorded |= (set(rows) if isinstance(rows, dict)
                     else {r["name"] for r in rows})
    assert recorded <= manifest, sorted(recorded - manifest)
    # the current window counts as gated — and must be IN the manifest
    current = {n for n, q in catalog.REGISTRY.items() if q.driver}
    assert current <= manifest, (
        f"driver rows missing from tests/gated_history.json: "
        f"{sorted(current - manifest)} — add them when gating")
    never = set(catalog.REGISTRY) - manifest
    # r13 (VERDICT r12 #7): the identical-oracle-twin carve-out is
    # RETIRED — grouped_quantiles_prod took a direct slot from its
    # adversarial twin, so every oracle-bearing registry row has now
    # held (or holds) a gate slot and the never-gated set is exactly
    # the three documented no-SQL-oracle ADC bench rows again.
    assert never == {"ann_pq_topk", "ann_ivfpq_topk",
                     "ann_ivfpq_refined_topk"}, sorted(never)
