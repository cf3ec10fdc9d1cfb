"""Exact substring-level dedup (operators/dedup.repeated_spans): the
bucketed suffix-array equivalent of Lee et al. 2021's ExactSubstr —
maximal verbatim spans >= L chars occurring 2+ times anywhere in the
corpus, from duplicated seed-window marking + gaps-and-islands merge.
Crafted corpora with hand-computed expected spans; the registry entry is
additionally DuckDB-parity-gated (tests/test_oracle_parity.py) and
plan-pinned (tests/test_plan_quality.py)."""

from __future__ import annotations

from sport_advantages_moderne_data_infrastructure_spark.operators.dedup import (
    repeated_spans,
)

L = 8  # readable test seed length; the registry entry uses 40


def _spans(spark, docs, seed_len=L):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {(r.doc_id, r.span_start, r.span_end, r.span_len)
            for r in repeated_spans(df, seed_len=seed_len).collect()}


def test_cross_doc_shared_span_exact_bounds(spark):
    # 16-char shared region at different offsets; seed windows fully
    # inside it are duplicated, windows straddling its edges are not —
    # so the reported span is exactly the shared region in each doc
    shared = "SHAREDSPANTEXT!!"
    docs = [(1, "abcdefghij" + shared + "klmnopqrst"),
            (2, "zyxwvut" + shared + "rqponmlkjihg")]
    assert _spans(spark, docs) == {
        (1, 11, 26, 16),   # shared at 1-based [11, 26]
        (2, 8, 23, 16),
    }


def test_within_doc_repetition_counts(spark):
    # the window repeats at two positions of ONE doc (Lee et al. remove
    # substrings repeated anywhere, including self-repeats); the two
    # occurrences are non-adjacent marks -> two separate L-length spans
    docs = [(1, "QWERTYUIOP" + "01234567" + "01234567" + "ASDFGHJKL")]
    assert _spans(spark, docs) == {
        (1, 11, 18, 8),
        (1, 19, 26, 8),
    }


def test_short_docs_and_no_repeats_empty(spark):
    docs = [(1, "tiny"),                      # shorter than L: excluded
            (2, "ABCDEFGHIJKLMNOPQRSTUVWXYZ"),
            (3, "abcdefghijklmnopqrstuvwxyz")]
    assert _spans(spark, docs) == set()


def test_whole_doc_duplicate_is_one_full_span(spark):
    t = "The same exact document body, twice."
    docs = [(1, t), (2, t), (3, "completely unrelated other text!")]
    n = len(t)
    assert _spans(spark, docs) == {(1, 1, n, n), (2, 1, n, n)}


def test_overlapping_seed_runs_merge_to_maximal_span(spark):
    # a 24-char shared region yields 17 consecutive duplicated window
    # starts; they must merge into ONE maximal span, not 17 rows
    shared = "ABCDEFGHIJKLMNOPQRSTUVWX"
    docs = [(1, "0123456789" + shared),
            (2, shared + "9876543210")]
    assert _spans(spark, docs) == {
        (1, 11, 34, 24),
        (2, 1, 24, 24),
    }


# --- span_scrub: the cut-and-stitch action step ---------------------------

from sport_advantages_moderne_data_infrastructure_spark.operators.dedup import (  # noqa: E402,E501
    span_scrub,
)


def _scrub(spark, docs, seed_len=L):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {(r.doc_id, r.clean_text, r.removed_chars)
            for r in span_scrub(df, seed_len=seed_len).collect()}


def test_scrub_cuts_shared_region_exactly(spark):
    shared = "SHAREDSPANTEXT!!"
    docs = [(1, "abcdefghij" + shared + "klmnopqrst"),
            (2, "zyxwvut" + shared + "rqponmlkjihg")]
    assert _scrub(spark, docs) == {
        (1, "abcdefghijklmnopqrst", 16),
        (2, "zyxwvutrqponmlkjihg", 16),
    }


def test_scrub_whole_doc_duplicate_comes_out_empty(spark):
    t = "The same exact document body, twice."
    docs = [(1, t), (2, t), (3, "completely unrelated other text!")]
    assert _scrub(spark, docs) == {
        (1, "", len(t)), (2, "", len(t)),
        (3, "completely unrelated other text!", 0),  # verbatim
    }


def test_scrub_multiple_spans_stitch_in_order(spark):
    # two separate repeated regions inside one doc: both cut, the three
    # untouched pieces stitch back in original order
    a, b = "AAAAAAAAAA", "BBBBBBBBBB"  # 10 chars each, repeated in doc 2
    docs = [(1, "head," + a + "=mid=" + b + ";tail"),
            (2, a + "xxxxxxxx" + b)]
    got = dict((d, (c, n)) for d, c, n in _scrub(spark, docs))
    assert got[1] == ("head,=mid=;tail", 20)
    assert got[2] == ("xxxxxxxx", 20)


def test_scrub_span_at_doc_edges(spark):
    # repeated region at position 1 and at the very end: no empty-piece
    # artifacts, prefix/suffix surgery exact
    edge = "EDGESPAN"
    docs = [(1, edge + "-middle-" + edge),
            (2, edge + "unrelated tail here")]
    got = dict((d, (c, n)) for d, c, n in _scrub(spark, docs))
    assert got[1] == ("-middle-", 16)
    assert got[2] == ("unrelated tail here", 8)


def _scrub1(spark, docs, seed_len=L):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {(r.doc_id, r.clean_text, r.removed_chars)
            for r in span_scrub(df, seed_len=seed_len,
                                policy="keep_one").collect()}


def test_keep_one_canonical_copy_survives_cross_doc(spark):
    # Lee et al.'s actual policy: ONE occurrence of the duplicated
    # span is retained — the globally smallest (doc_id, pos). Doc 1
    # holds the canonical copy and passes through verbatim; doc 2's
    # copy is cut.
    shared = "SHAREDSPANTEXT!!"
    docs = [(1, "abcdefghij" + shared + "klmnopqrst"),
            (2, "zyxwvut" + shared + "rqponmlkjihg")]
    assert _scrub1(spark, docs) == {
        (1, "abcdefghij" + shared + "klmnopqrst", 0),
        (2, "zyxwvutrqponmlkjihg", 16),
    }


def test_keep_one_whole_doc_triplicate_keeps_first(spark):
    t = "The same exact document body, thrice over!"
    docs = [(1, t), (2, t), (3, t), (4, "some other unrelated text.")]
    assert _scrub1(spark, docs) == {
        (1, t, 0), (2, "", len(t)), (3, "", len(t)),
        (4, "some other unrelated text.", 0),
    }


def test_keep_one_within_doc_first_occurrence_survives(spark):
    # self-repeat inside one document: the earlier occurrence is the
    # canonical one; the later copy is cut
    edge = "EDGESPAN"
    docs = [(1, edge + "-middle-" + edge)]
    assert _scrub1(spark, docs) == {(1, edge + "-middle-", 8)}


def test_keep_one_vs_all_on_unique_text_identical(spark):
    # corpora with no repeated window at all: both policies verbatim
    docs = [(1, "alpha bravo charlie delta"),
            (2, "0123456789ZYXWVUTSRQ")]
    assert (_scrub1(spark, docs) == _scrub(spark, docs)
            == {(1, "alpha bravo charlie delta", 0),
                (2, "0123456789ZYXWVUTSRQ", 0)})
