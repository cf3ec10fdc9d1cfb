"""Property-based invariants (hypothesis) for the hand-built operators
whose semantics are easy to get subtly wrong: MERGE row-wise precedence
and as-of join. Each property is checked against a pure-Python reference
implementation on randomized small inputs — complementary to the
fixed-fixture oracle gate."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = st.integers(min_value=0, max_value=6)
VALS = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))

ROWS = st.lists(st.tuples(KEYS, VALS), max_size=8)

_settings = settings(max_examples=12, deadline=None,
                     suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(target=ROWS, updates=ROWS)
@_settings
def test_merge_upsert_rowwise_semantics(spark, target, updates):
    from sport_advantages_moderne_data_infrastructure_spark.operators.merge import (
        merge_upsert,
    )

    # one row per key (MERGE requires unique keys per side)
    tgt = {k: v for k, v in target}
    upd = {k: v for k, v in updates}
    t = spark.createDataFrame(
        [(k, v) for k, v in tgt.items()] or [(None, None)],
        "k int, v int").filter("k IS NOT NULL")
    u = spark.createDataFrame(
        [(k, v) for k, v in upd.items()] or [(None, None)],
        "k int, v int").filter("k IS NOT NULL")

    got = {r["k"]: r["v"] for r in merge_upsert(t, u, "k").collect()}
    # reference semantics: update row wins WHOLESALE when key matches —
    # including explicit NULLs (dict union, updates last)
    want = {**tgt, **upd}
    assert got == want


@given(
    left=st.lists(st.tuples(KEYS, st.integers(0, 20)), max_size=8),
    right=st.lists(st.tuples(KEYS, st.integers(0, 20),
                             st.integers(0, 100)), max_size=8),
)
@_settings
def test_asof_bucketed_equals_plain(spark, left, right):
    """The time-bucketed as-of (scale path) must return exactly what the
    plain operator returns — bucket width chosen so rows straddle
    buckets (width 7 over ts range 0..20 → 3 buckets)."""
    from sport_advantages_moderne_data_infrastructure_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    lrows = list({(k, t) for k, t in left})
    rrows = list({(k, t, v) for k, t, v in right})
    l_df = spark.createDataFrame(
        lrows or [(None, None)], "k int, lts int").filter("k IS NOT NULL")
    r_df = spark.createDataFrame(
        rrows or [(None, None, None)],
        "k int, rts int, rv int").filter("k IS NOT NULL")

    def to_map(df):
        return {(r["k"], r["lts"]): r["rv"] for r in df.collect()}

    plain = to_map(asof_join(l_df, r_df, on="k", left_ts="lts",
                             right_ts="rts", right_cols=["rv"]))
    bucketed = to_map(asof_join_bucketed(l_df, r_df, on="k", left_ts="lts",
                                         right_ts="rts", right_cols=["rv"],
                                         bucket="7"))
    assert bucketed == plain


@given(
    left=st.lists(st.tuples(KEYS, st.integers(0, 20)), max_size=8),
    right=st.lists(st.tuples(KEYS, st.integers(0, 20),
                             st.integers(0, 100)), max_size=8),
)
@_settings
def test_asof_join_matches_reference_impl(spark, left, right):
    from sport_advantages_moderne_data_infrastructure_spark.operators.asof import (
        asof_join,
    )

    # unique (key, ts) per side keeps expected output single-valued
    lrows = list({(k, t): None for k, t in left})
    rrows = list({(k, t): v for k, t, v in right}.items())
    l_df = spark.createDataFrame(
        [(k, t) for (k, t) in lrows] or [(None, None)],
        "k int, lts int").filter("k IS NOT NULL")
    r_df = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rrows] or [(None, None, None)],
        "k int, rts int, rv int").filter("k IS NOT NULL")

    got = {(r["k"], r["lts"]): r["rv"]
           for r in asof_join(l_df, r_df, on="k", left_ts="lts",
                              right_ts="rts", right_cols=["rv"]).collect()}

    want = {}
    rmap = {}
    for (k, t), v in rrows:
        rmap.setdefault(k, []).append((t, v))
    for k, lt in lrows:
        cands = [(t, v) for t, v in rmap.get(k, []) if t <= lt]
        # operator tie-break: latest ts, then largest first right_col
        want[(k, lt)] = max(cands)[1] if cands else None
    assert got == want


# -- txn table model-based property ----------------------------------------
#
# Random sequences of write ops against a pure-Python snapshot model:
# every committed version's row multiset must match, including via
# time travel and RESTORE. This is the property complement to the
# fixed-scenario txnlog tests — op INTERLEAVINGS are where snapshot
# semantics break subtly.

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.tuples(st.integers(0, 9),
                                     st.integers(0, 5)),
                           min_size=1, max_size=4)),
        st.tuples(st.just("delete"), st.integers(0, 9)),
        st.tuples(st.just("delete_dv"), st.integers(0, 9)),
        st.tuples(st.just("update"), st.integers(0, 9),
                  st.integers(10, 15)),
        st.tuples(st.just("overwrite"),
                  st.lists(st.tuples(st.integers(0, 9),
                                     st.integers(0, 5)),
                           min_size=1, max_size=3)),
        st.tuples(st.just("restore"), st.integers(0, 10)),
        st.just(("compact",)),
    ),
    min_size=1, max_size=4)


@given(ops=_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_txn_table_matches_snapshot_model(spark, ops, tmp_path_factory):
    from collections import Counter

    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
        TxnTable,
    )

    root = tmp_path_factory.mktemp("txnprop")
    t = TxnTable(str(root / "t"))
    t.append(spark.createDataFrame([(0, 0), (1, 1)], "id int, val int"))
    history = [Counter({(0, 0): 1, (1, 1): 1})]
    model = history[0]

    def snap():
        return Counter((r["id"], r["val"])
                       for r in t.read(spark).collect())

    for op in ops:
        before_v = t.latest_version()
        if op[0] == "append":
            rows = op[1]
            t.append(spark.createDataFrame(rows, "id int, val int"))
            model = model + Counter(rows)
        elif op[0] == "delete":
            t.delete_where(spark, f"id = {op[1]}",
                           capture_changes=bool(op[1] % 2))
            model = Counter({k: c for k, c in model.items()
                             if k[0] != op[1]})
        elif op[0] == "delete_dv":
            # r11: DV-mode delete interleaved with every other op —
            # restores/compactions/updates must round-trip the masks
            t.delete_where(spark, f"id = {op[1]}",
                           capture_changes=bool(op[1] % 2),
                           use_dv=True)
            model = Counter({k: c for k, c in model.items()
                             if k[0] != op[1]})
        elif op[0] == "update":
            t.update_where(spark, f"id = {op[1]}", {"val": str(op[2])},
                           capture_changes=bool(op[1] % 2))
            if any(k[0] == op[1] for k in model):
                new = Counter()
                for (i, v), c in model.items():
                    new[(i, op[2] if i == op[1] else v)] += c
                model = new
        elif op[0] == "overwrite":
            rows = op[1]
            t.overwrite(spark.createDataFrame(rows, "id int, val int"))
            model = Counter(rows)
        elif op[0] == "restore":
            target = op[1] % len(history)
            t.restore(target)
            model = history[target]
        elif op[0] == "compact":
            t.compact(spark, target_files=2)
            # layout-only: model unchanged
        if t.latest_version() != before_v:
            history.append(model)
        else:
            model = history[-1]  # no-op op: model must not drift
        assert snap() == model, f"after {op}"

    # time travel: every recorded version replays to its model state
    for v, m in enumerate(history):
        got = Counter((r["id"], r["val"])
                      for r in t.read(spark, version=v).collect())
        assert got == m, f"time travel to v{v}"


@given(
    points=st.lists(st.integers(min_value=0, max_value=120), max_size=10),
    intervals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=120),
                  st.integers(min_value=0, max_value=40)),
        max_size=6),
)
@_settings
def test_interval_join_matches_brute_force(spark, points, intervals):
    """The bucketed interval join must emit EXACTLY the containment
    pairs (start <= ts < end), each exactly once — bucket width 30 s
    over a 0..160 s span so intervals straddle buckets, including
    zero-length and multi-bucket intervals."""
    import datetime as dt

    from sport_advantages_moderne_data_infrastructure_spark.operators.rangejoin import (  # noqa: E501
        interval_join,
    )

    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    prows = [(i, ts(s)) for i, s in enumerate(points)]
    irows = [(j, ts(s), ts(s + d)) for j, (s, d) in enumerate(intervals)]
    want = sorted((i, j) for i, pt in prows for j, s, e in irows
                  if s <= pt < e)
    if not prows or not irows:
        return
    p = spark.createDataFrame(prows, "pid int, p_ts timestamp")
    iv = spark.createDataFrame(irows,
                               "iid int, w_start timestamp, w_end timestamp")
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(p, iv, point_ts="p_ts", start_ts="w_start",
                               end_ts="w_end", bucket_seconds=30)
        .select("pid", "iid").collect())
    assert got == want


@given(words=st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta"]), max_size=25))
@_settings
def test_dedup_chunk_boundaries_match_reference(spark, words):
    """Chunking must agree with the obvious Python reference: 10-word
    windows, stride 10, last chunk short, empty text = one chunk."""
    import hashlib

    from pyspark.sql import functions as F

    text = " ".join(words)
    ws = text.strip().split() if text.strip() else [""]
    # reference: Spark's split('', ' +') yields [''] for empty text
    ref = [" ".join(ws[i:i + 10]) for i in range(0, len(ws), 10)] or [""]
    want = sorted(hashlib.md5(c.encode()).hexdigest() for c in ref)

    d = spark.createDataFrame([(0, text)], "doc_id long, text string") \
        .select("doc_id", F.split(F.trim("text"), " +").alias("w"))
    n_chunks = F.greatest(F.ceil(F.size("w") / F.lit(10)).cast("int"),
                          F.lit(1))
    got = sorted(
        r["h"] for r in d.select(
            F.explode(F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.md5(
                    F.array_join(F.slice("w", i * 10 + 1, 10), " "))))
            .alias("h")).collect())
    assert got == want


_MV_ROWS = st.lists(st.tuples(st.integers(0, 9),
                              st.sampled_from(["a", "b", "c"]),
                              st.integers(0, 5)),
                    min_size=1, max_size=4)
_MV_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), _MV_ROWS),
        st.tuples(st.just("delete"), st.integers(0, 9)),
        st.tuples(st.just("dv_delete"), st.integers(0, 9)),
        st.tuples(st.just("overwrite"), _MV_ROWS),
    ),
    min_size=1, max_size=3)


@given(ops=_MV_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_projection_and_bucketed_agg_views_track_any_history(
        spark, ops, tmp_path_factory):
    """MapMaterializedView and AggMaterializedView refreshed after
    EVERY commit of an arbitrary append/delete/DV-delete/overwrite
    history must equal the direct recompute from the source snapshot —
    including the flagged-resync path (overwrite has no row-level
    delta) and multiset duplicates (append can repeat rows)."""
    from pyspark.sql import functions as F

    from sport_advantages_moderne_data_infrastructure_spark.operators.mv import (  # noqa: E501
        AggMaterializedView,
        MapMaterializedView,
    )
    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (  # noqa: E501
        TxnTable,
    )

    root = tmp_path_factory.mktemp("mvprop")
    src = TxnTable(str(root / "s"))
    src.append(spark.createDataFrame([(0, "a", 1), (1, "b", 2)],
                                     "id int, grp string, val int"))

    def proj(df):
        return df.select("id", "grp",
                         (F.col("val") * 2).alias("dval"))

    mmv = MapMaterializedView(str(root / "m"), "id", proj, n_buckets=4)
    aggmv = AggMaterializedView(str(root / "a"), "grp", "val",
                                n_buckets=4)

    def check():
        mmv.refresh(spark, src)
        aggmv.refresh(spark, src)
        from collections import Counter

        want_m = Counter(tuple(r) for r in
                         proj(src.read(spark)).collect())
        got_m = Counter(tuple(r) for r in mmv.read(spark).collect())
        assert got_m == want_m
        want_a = sorted((r.grp, r.cnt, r.sm) for r in
                        src.read(spark).groupBy("grp")
                        .agg(F.count(F.lit(1)).alias("cnt"),
                             F.sum("val").alias("sm")).collect())
        got_a = sorted((r.grp, r.cnt, r.sm) for r in
                       aggmv.read(spark)
                       .select("grp", "cnt", "sm").collect())
        assert got_a == want_a

    check()
    for op in ops:
        if op[0] == "append":
            src.append(spark.createDataFrame(
                op[1], "id int, grp string, val int"))
        elif op[0] == "delete":
            src.delete_where(spark, f"id = {op[1]}")
        elif op[0] == "dv_delete":
            src.delete_where(spark, f"id = {op[1]}", use_dv=True)
        else:
            src.overwrite(spark.createDataFrame(
                op[1], "id int, grp string, val int"))
        check()


# --- incremental connected components (streaming/cc.py) -------------------
# random small graphs, random batch schedules (respecting the edge
# arrival contract), reference = pure-Python union-find

_CC_NODES = st.lists(st.integers(0, 11), min_size=1, max_size=10,
                     unique=True)


@given(
    nodes=_CC_NODES,
    edge_picks=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                        max_size=10),
    cuts=st.lists(st.integers(1, 9), max_size=2, unique=True),
    data=st.data(),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_cc_matches_union_find(spark, nodes, edge_picks,
                                           cuts, data, tmp_path_factory):
    import tempfile

    from sport_advantages_moderne_data_infrastructure_spark.streaming import (
        cc as C,
    )

    # edges over the sampled node set only
    edges = sorted({(nodes[a % len(nodes)], nodes[b % len(nodes)])
                    for a, b in edge_picks
                    if nodes[a % len(nodes)] != nodes[b % len(nodes)]})
    # batch schedule: nodes split positionally at the sampled cuts;
    # each edge lands in the batch where its LATER endpoint arrives
    bounds = sorted(c for c in cuts if c < len(nodes)) + [len(nodes)]
    batches, start = [], 0
    for end in bounds:
        if end > start:
            batches.append(nodes[start:end])
            start = end
    when = {n: i for i, bs in enumerate(batches) for n in bs}

    root = tempfile.mkdtemp(prefix="cc_prop_")
    a_t, r_t = C._tables(root)
    for i, bs in enumerate(batches):
        rows = ([(n, None) for n in bs]
                + [(u, v) for u, v in edges
                   if max(when[u], when[v]) == i])
        C.ingest_batch(
            a_t, r_t,
            spark.createDataFrame(rows, "doc_id long, nbr long"),
            i, "cc_prop")

    got = {r["doc_id"]: r["cluster_id"]
           for r in C.current_labels(spark, root).collect()}

    # reference union-find with min-label roots
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    want = {n: find(n) for n in nodes}
    assert got == want


# --- exact order statistics (r10: exact_ranks powers the hot-bucket
# serve fallback; its rank math must hold for arbitrary multisets) ----

_QVALS = st.lists(
    st.one_of(st.integers(min_value=-50, max_value=50),
              st.sampled_from([0, 0, 1, 1, 1])),  # force duplicates
    min_size=1, max_size=40)


@given(vals=_QVALS,
       ks_frac=st.lists(st.floats(min_value=0.0, max_value=1.0,
                                  allow_nan=False),
                        min_size=1, max_size=4))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_ranks_matches_sorted_reference(spark, vals, ks_frac):
    """exact_ranks(k) == sorted(vals)[k-1] for arbitrary multisets
    (heavy duplicates included) and arbitrary rank positions, under a
    tiny accuracy/direct_limit so REAL bracketing rounds run even on
    these small inputs."""
    from sport_advantages_moderne_data_infrastructure_spark.operators.sketches import (  # noqa: E501
        exact_ranks,
    )

    n = len(vals)
    ks = sorted({max(1, min(n, int(round(f * n)) or 1))
                 for f in ks_frac})
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = exact_ranks(df.repartition(3), "v", ks,
                      accuracy=8, direct_limit=4, max_rounds=12)
    ref = sorted(float(v) for v in vals)
    assert got == [ref[k - 1] for k in ks], (vals, ks)


@given(vals=_QVALS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hot_bucket_serve_matches_sorted_reference(spark, vals,
                                                   tmp_path_factory):
    """Streaming-quantile serve under a maximally skewed grid (every
    value lands in ONE cell, forcing the hot fallback) equals the
    order-statistic definition for arbitrary multisets."""
    import math

    from sport_advantages_moderne_data_infrastructure_spark.streaming import (
        quantiles as Q,
    )

    base = tmp_path_factory.mktemp("hotprop")
    root = str(base / "q")
    v, hist = Q._tables(root)
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(vals)],
        "event_id long, value double")
    # grid [lo, hi) declared far wider than the data: one hot cell
    Q.ingest_batch(v, hist, df, 0, "value", -1e6, 1e6, app_id="hp")
    qs = [0.25, 0.5, 0.9]
    got = Q.quantiles_served(spark, root, qs,
                             hot_bucket_limit=2, accuracy=8)
    ref = sorted(float(x) for x in vals)
    n = len(ref)
    want = [(q, ref[max(1, math.ceil(q * n)) - 1]) for q in qs]
    assert got == want, (vals,)


# --- r11: identity allocation + chunk-index folding under churn ----------

_ID_ROWS = st.integers(min_value=0, max_value=40)


@given(
    batches=st.lists(st.tuples(_ID_ROWS,
                               st.integers(min_value=1, max_value=5)),
                     min_size=1, max_size=4),
    start=st.integers(min_value=-10, max_value=100),
    step=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_identity_allocation_exact_sequence(spark, batches, start,
                                            step, tmp_path_factory):
    """Whatever the batch sizes, partition counts, start and step, the
    allocated id multiset is EXACTLY the arithmetic sequence
    start, start+step, ... with one term per row — unique, contiguous
    per commit, never re-issued across appends."""
    import tempfile

    from pyspark.sql import functions as F

    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
        TxnTable,
    )

    t = TxnTable(tempfile.mkdtemp(
        prefix="prop_id_", dir=str(tmp_path_factory.getbasetemp())))
    t.set_identity_column("rid", start=start, step=step)
    total = 0
    for i, (n, parts) in enumerate(batches):
        df = (spark.range(total, total + n)
              .select(F.col("id").alias("k"))
              .repartition(parts))
        t.append(df)
        total += n
    if total == 0:
        return
    got = sorted(r["rid"] for r in
                 t.read(spark).select("rid").collect())
    assert got == [start + step * i for i in range(total)]


@given(
    script=st.lists(
        st.lists(st.tuples(st.integers(0, 5),          # doc id
                           st.sampled_from(["up", "del"]),
                           st.integers(0, 4)),          # text seed
                 min_size=1, max_size=4),
        min_size=1, max_size=4),
    folds=st.lists(st.booleans(), min_size=4, max_size=4),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_index_folds_any_history(spark, script, folds,
                                       tmp_path_factory):
    """Random upsert/delete scripts against a tiny documents table,
    refreshed at RANDOM points (so some refreshes fold multi-commit
    windows — the per-physical-row projection's hard case): after a
    final refresh the maintained postings/df/scalars equal the batch
    build over the table's current state, bit for bit."""
    import tempfile

    from pyspark.sql import functions as F

    from sport_advantages_moderne_data_infrastructure_spark.operators.retrieval import (
        chunk_postings_frame,
    )
    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
        TxnTable,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.chunkbm25 import (
        read_chunk_bm25_index,
        refresh_chunk_index,
    )

    base = tempfile.mkdtemp(
        prefix="prop_cbx_", dir=str(tmp_path_factory.getbasetemp()))
    docs = TxnTable(base + "/docs")
    texts = ["alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lam mu nu xi omicron pi",
             "one two three four five six seven eight nine ten "
             "eleven twelve",
             "red green blue red green blue red green",
             "aa bb cc dd", "solo"]
    docs.append(spark.createDataFrame(
        [(i, texts[i % len(texts)]) for i in range(6)],
        "doc_id long, text string"))
    live = set(range(6))
    bid = 0
    refresh_chunk_index(spark, docs, base + "/idx", bid, "prop")
    for wi, wave in enumerate(script):
        ups, dels = {}, set()
        for d, op, seed in wave:   # last op per doc wins inside a wave
            if op == "del":
                dels.add(d)
                ups.pop(d, None)
            else:
                ups[d] = texts[seed % len(texts)] + f" v{seed}"
                dels.discard(d)
        if ups:
            docs.merge(spark, spark.createDataFrame(
                [(d, tx) for d, tx in ups.items()],
                "doc_id long, text string"), key="doc_id")
            live |= set(ups)
        real_dels = dels & live
        if real_dels:
            docs.delete_where(
                spark, "doc_id IN (%s)" % ",".join(map(str, real_dels)))
            live -= real_dels
        if folds[wi % len(folds)]:
            bid += 1
            refresh_chunk_index(spark, docs, base + "/idx", bid, "prop")
    bid += 1
    refresh_chunk_index(spark, docs, base + "/idx", bid, "prop")

    ctf, _cdl, cdf, n_chunks, avgdl = read_chunk_bm25_index(
        spark, base + "/idx")
    b_ctf = chunk_postings_frame(docs.read(spark))
    cols = ["doc_id", "pos", "tok", "tf", "dl"]
    assert ctf.select(cols).exceptAll(b_ctf.select(cols)).count() == 0
    assert b_ctf.select(cols).exceptAll(ctf.select(cols)).count() == 0
    b_cdl = b_ctf.select("doc_id", "pos", "dl").distinct()
    bn = b_cdl.count()
    assert n_chunks == bn
    if bn:
        assert avgdl == int(b_cdl.agg(F.sum("dl")).first()[0]) / bn
    else:
        assert avgdl == 0.0  # fully-retracted corpus serves empty


@given(
    script=st.lists(
        st.lists(st.tuples(st.integers(0, 7),          # vec id
                           st.sampled_from(["up", "del"]),
                           st.integers(0, 3)),          # embed seed
                 min_size=1, max_size=4),
        min_size=1, max_size=3),
    folds=st.lists(st.booleans(), min_size=3, max_size=3),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ann_cdf_folds_any_history(spark, script, folds,
                                   tmp_path_factory):
    """Random re-embed/delete scripts against a tiny embeddings table,
    folded at random points through the CDF maintenance (retract keeps
    every preimage, ingest takes the net-last event): the maintained
    inverted lists always end row-identical to the batch assignment
    over the table's current state."""
    import tempfile

    from pyspark.sql import functions as F

    from sport_advantages_moderne_data_infrastructure_spark.operators.ivf import (
        assign_centroids,
    )
    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
        TxnTable,
    )
    from sport_advantages_moderne_data_infrastructure_spark.streaming.annindex import (
        apply_cdf_batch,
        read_index,
    )

    dim = 4
    centroids = [[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                 [0, 0, 1.0, 0], [0, 0, 0, 1.0]]

    def emb_of(vid, seed):
        v = [0.1] * dim
        v[(vid + seed) % dim] = 1.0
        return [float(x) for x in v]

    base = tempfile.mkdtemp(
        prefix="prop_ann_", dir=str(tmp_path_factory.getbasetemp()))
    emb = TxnTable(base + "/emb")
    idx = TxnTable(base + "/idx")
    emb.append(spark.createDataFrame(
        [(i, emb_of(i, 0)) for i in range(8)],
        "vec_id long, embedding array<float>"))
    live = set(range(8))
    bid, last_v = 0, -1

    def fold():
        nonlocal bid, last_v
        sv = emb.latest_version()
        if sv > last_v:
            apply_cdf_batch(
                idx, emb.read_changes(spark, since_version=last_v,
                                      upto=sv),
                centroids, bid, "prop")
            last_v = sv
            bid += 1

    fold()
    for wi, wave in enumerate(script):
        ups, dels = {}, set()
        for vid, op, seed in wave:
            if op == "del":
                dels.add(vid)
                ups.pop(vid, None)
            else:
                ups[vid] = emb_of(vid, seed)
                dels.discard(vid)
        if ups:
            emb.merge(spark, spark.createDataFrame(
                [(v, e) for v, e in ups.items()],
                "vec_id long, embedding array<float>"), key="vec_id")
            live |= set(ups)
        real = dels & live
        if real:
            emb.delete_where(
                spark, "vec_id IN (%s)" % ",".join(map(str, real)))
            live -= real
        if folds[wi % len(folds)]:
            fold()
    fold()

    m = read_index(spark, idx.path).select("vec_id", "centroid_id") \
        if idx.latest_version() is not None else None
    cur = emb.read(spark).select(
        "vec_id", "embedding",
        F.sqrt(F.expr(
            "aggregate(zip_with(embedding, embedding, (a, b) -> "
            "CAST(a AS DOUBLE) * b), 0D, (a, x) -> a + x)"))
        .alias("e_norm"))
    b = assign_centroids(cur, centroids).select("vec_id", "centroid_id")
    assert m is not None
    assert m.exceptAll(b).count() == 0
    assert b.exceptAll(m).count() == 0


# r12: the PARTITIONED snapshot model — the same random-interleaving
# property over a partition-by-GENERATED table: every op (appends,
# row-predicate and partition-key deletes, DV deletes, updates that
# MOVE rows across partitions by rewriting the column the generated
# key reads, overwrites, restores, partition-granular compactions)
# must leave the table's row multiset equal to the pure-Python model,
# with the generated key consistent on every row, at every version.

_POPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.tuples(st.integers(0, 9),
                                     st.integers(0, 5)),
                           min_size=1, max_size=4)),
        st.tuples(st.just("delete"), st.integers(0, 9)),
        st.tuples(st.just("delete_pk"), st.integers(0, 2)),
        st.tuples(st.just("delete_dv"), st.integers(0, 9)),
        st.tuples(st.just("update"), st.integers(0, 9),
                  st.integers(10, 15)),
        st.tuples(st.just("shift"), st.integers(0, 5)),
        st.tuples(st.just("overwrite"),
                  st.lists(st.tuples(st.integers(0, 9),
                                     st.integers(0, 5)),
                           min_size=1, max_size=3)),
        st.tuples(st.just("restore"), st.integers(0, 10)),
        st.just(("pcompact",)),
    ),
    min_size=1, max_size=4)


@given(ops=_POPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_partitioned_txn_matches_snapshot_model(spark, ops,
                                                tmp_path_factory):
    from collections import Counter

    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
        TxnTable,
    )

    root = tmp_path_factory.mktemp("ptxnprop")
    t = TxnTable(str(root / "t"))
    t.set_generated_column("pk", "CAST(id % 3 AS STRING)")
    t.set_partition_column("pk")
    t.append(spark.createDataFrame([(0, 0), (1, 1), (2, 2)],
                                   "id int, val int"))
    history = [Counter({(0, 0): 1, (1, 1): 1, (2, 2): 1})]
    model = history[0]

    def snap():
        rows = t.read(spark).collect()
        # the generated partition key is consistent on EVERY row at
        # every point (round-tripped through the col=value path)
        assert all(str(r["pk"]) == str(r["id"] % 3) for r in rows)
        return Counter((r["id"], r["val"]) for r in rows)

    for op in ops:
        before_v = t.latest_version()
        if op[0] == "append":
            rows = op[1]
            t.append(spark.createDataFrame(rows, "id int, val int"))
            model = model + Counter(rows)
        elif op[0] == "delete":
            t.delete_where(spark, f"id = {op[1]}",
                           capture_changes=bool(op[1] % 2))
            model = Counter({k: c for k, c in model.items()
                             if k[0] != op[1]})
        elif op[0] == "delete_pk":
            # partition-key-only predicate: whole partitions drop with
            # no rewrite (metadata-only when the feed is off)
            t.delete_where(spark, f"pk = '{op[1]}'",
                           capture_changes=bool(op[1] % 2))
            model = Counter({k: c for k, c in model.items()
                             if k[0] % 3 != op[1]})
        elif op[0] == "delete_dv":
            t.delete_where(spark, f"id = {op[1]}",
                           capture_changes=bool(op[1] % 2),
                           use_dv=True)
            model = Counter({k: c for k, c in model.items()
                             if k[0] != op[1]})
        elif op[0] == "update":
            t.update_where(spark, f"id = {op[1]}", {"val": str(op[2])},
                           capture_changes=bool(op[1] % 2))
            if any(k[0] == op[1] for k in model):
                new = Counter()
                for (i, v), c in model.items():
                    new[(i, op[2] if i == op[1] else v)] += c
                model = new
        elif op[0] == "shift":
            # SET the column the generated PARTITION KEY reads: matched
            # rows recompute pk and MIGRATE to their new partition
            t.update_where(spark, f"val = {op[1]}", {"id": "id + 1"},
                           capture_changes=bool(op[1] % 2))
            if any(v == op[1] for (_, v) in model):
                new = Counter()
                for (i, v), c in model.items():
                    new[(i + 1 if v == op[1] else i, v)] += c
                model = new
        elif op[0] == "overwrite":
            rows = op[1]
            t.overwrite(spark.createDataFrame(rows, "id int, val int"))
            model = Counter(rows)
        elif op[0] == "restore":
            target = op[1] % len(history)
            t.restore(target)
            model = history[target]
        elif op[0] == "pcompact":
            t.compact_partitions_if_needed(spark, max_dirs_per_value=1)
            # layout-only: model unchanged (may be a no-op commit)
        if t.latest_version() != before_v:
            history.append(model)
        else:
            model = history[-1]  # no-op op: model must not drift
        assert snap() == model, f"after {op}"

    for v, m in enumerate(history):
        got = Counter((r["id"], r["val"])
                      for r in t.read(spark, version=v).collect())
        assert got == m, f"time travel to v{v}"


# identity × partitioned layout (r13, VERDICT r12 #2): the allocation
# high water rides the same commit doc as the partition-granular
# adds/removes, so ANY interleaving of identity appends with partitioned
# overwrites must keep ids unique, block-contiguous per commit, and
# never reused (an overwrite retires its replaced rows' ids).

_IDP_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.integers(0, 2), min_size=1, max_size=4)),
        st.tuples(st.just("overwrite_day"), st.integers(0, 2),
                  st.integers(1, 3)),
    ),
    min_size=1, max_size=5)


@given(ops=_IDP_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_identity_allocation_interleaves_partitioned_overwrites(
        spark, ops, tmp_path_factory):
    from sport_advantages_moderne_data_infrastructure_spark.sources.txnlog import (
        TxnTable,
    )

    root = tmp_path_factory.mktemp("idpart")
    t = TxnTable(str(root / "t"))
    t.set_identity_column("rid")
    t.set_partition_column("day")

    # model: rows tagged with the 1-based write number w; write w
    # allocated the contiguous block (cum[w-1], cum[w]]
    cum = [0]
    live: list[tuple[int, int]] = []  # (day, w) per live row

    def apply(op, w):
        if op[0] == "append":
            days = op[1]
            t.append(spark.createDataFrame(
                [(d, w) for d in days], "day int, w int"))
            cum.append(cum[-1] + len(days))
            live.extend((d, w) for d in days)
        else:
            d, n = op[1], op[2]
            t.overwrite_partitions(
                spark.createDataFrame([(d, w)] * n, "day int, w int"),
                "day")
            cum.append(cum[-1] + n)
            live[:] = [(dd, ww) for dd, ww in live if dd != d]
            live.extend((d, w) for _ in range(n))

    for w, op in enumerate(ops, start=1):
        apply(op, w)
        rows = [(r["day"], r["w"], r["rid"])
                for r in t.read(spark).collect()]
        # row multiset matches the model
        from collections import Counter as C_
        assert C_((d, ww) for d, ww, _ in rows) == C_(live), f"after {op}"
        rids = [r for _, _, r in rows]
        assert len(rids) == len(set(rids)), "rid collision"
        # every live row's id sits inside its write's contiguous block
        for d, ww, r in rows:
            assert cum[ww - 1] < r <= cum[ww], (
                f"rid {r} outside write {ww}'s block "
                f"({cum[ww - 1]}, {cum[ww]}] after {op}")
        # the layout never flattens
        assert all("day=" in dd for dd in t.snapshot_dirs())
