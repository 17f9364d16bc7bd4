"""Planted-span fixture tests for exact-substring dedup (Lee et al.
2022 style; r12 verdict ask #2).

The differential oracle proves Spark == DuckDB on the testdata; these
prove BOTH engines compute the thing the operator claims, on corpora
where the ground-truth spans are planted by construction: exact span
boundaries, the >= min_df distinct-doc gate (within-doc repetition does
NOT count), exact-k spans, multiple disjoint spans per doc, and the
interval-union semantics (overlapping duplicated extents merge into one
disjoint region; regions separated by more than a gap stay separate).
"""

from __future__ import annotations

import hashlib

from state_economics_end_to_end_data_pipeline_spark.operators.dedup import (
    exact_substring_removal,
    exact_substring_spans,
)

K = 8


def _doc(*parts: list[str]) -> str:
    toks: list[str] = []
    for p in parts:
        toks.extend(p)
    return " ".join(toks)


def _uniq(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


def _spans(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = exact_substring_spans(df, text_col="text", id_col="doc_id", k=K)
    return {
        (r.doc_id, r.span_start, r.span_len) for r in out.collect()
    }


def test_planted_span_exact_boundaries(spark):
    """A 12-token span shared by two docs at different offsets is found
    in BOTH docs with exact 1-based start and exact length; the unique
    filler context never produces a span."""
    shared = _uniq("s", 12)
    rows = [
        (1, _doc(_uniq("fa", 10), shared, _uniq("ga", 5))),
        (2, _doc(_uniq("fb", 3), shared)),
        (3, _doc(_uniq("fc", 30))),  # nothing shared -> no rows
    ]
    assert _spans(spark, rows) == {(1, 11, 12), (2, 4, 12)}


def test_exact_k_span_and_within_doc_repeat_excluded(spark):
    """A span of exactly k tokens is reported with span_len == k; a
    k-gram repeated twice within ONE doc only (no second doc) is NOT a
    duplicate (the gate is distinct-document frequency)."""
    s8 = _uniq("t", K)
    rep = _uniq("x", K)
    rows = [
        (1, _doc(_uniq("fa", 4), s8)),
        (2, _doc(s8, _uniq("fb", 6))),
        (3, _doc(rep, rep)),  # within-doc repeat only
    ]
    assert _spans(spark, rows) == {(1, 5, K), (2, 1, K)}


def test_two_disjoint_spans_one_doc(spark):
    """A doc sharing two different spans with two different partners
    (separated by > k unique tokens) reports TWO disjoint spans."""
    p = _uniq("p", 12)
    q = _uniq("q", 9)
    rows = [
        (1, _doc(p, _uniq("fa", 20), q)),
        (2, _doc(_uniq("fb", 2), p)),
        (3, _doc(q, _uniq("fc", 5))),
    ]
    # doc 1: p at 1..12, q at 33..41
    assert _spans(spark, rows) == {
        (1, 1, 12),
        (1, 33, 9),
        (2, 3, 12),
        (3, 1, 9),
    }


def test_overlapping_extents_merge_into_disjoint_region(spark):
    """Interval-union semantics: when duplicated anchor extents overlap
    (two shared spans closer than k tokens), the covered region is ONE
    disjoint interval -- the union Lee et al. remove -- never
    overlapping output rows."""
    a = _uniq("a", K)  # shared with doc 2
    b = _uniq("b", K)  # shared with doc 3
    gap = _uniq("g", 3)  # 3 < k: extents [1..8] and [12..19] touch? no:
    # anchors at 1 and 12; 12 > 1 + 8 -> separate islands BUT the
    # covered extents are [1,8] and [12,19] -- disjoint, two rows
    rows = [
        (1, _doc(a, gap, b)),
        (2, _doc(_uniq("fb", 5), a)),
        (3, _doc(b, _uniq("fc", 5))),
    ]
    spans = _spans(spark, rows)
    assert (1, 1, K) in spans and (1, 12, K) in spans
    # adjacent case: zero gap -> anchors at 1 and 9; 9 <= 1 + 8 merges
    # the touching extents [1,8]+[9,16] into one 16-token region
    rows2 = [
        (1, _doc(a, b)),
        (2, _doc(_uniq("fb", 5), a)),
        (3, _doc(b, _uniq("fc", 5))),
    ]
    spans2 = _spans(spark, rows2)
    one = {(d, s, n) for (d, s, n) in spans2 if d == 1}
    assert one == {(1, 1, 2 * K)}, spans2
    # output regions within a doc are always pairwise disjoint
    for case in (spans, spans2):
        by_doc: dict = {}
        for d, s, n in case:
            by_doc.setdefault(d, []).append((s, s + n - 1))
        for ivs in by_doc.values():
            ivs.sort()
            for (s1, e1), (s2, _e2) in zip(ivs, ivs[1:]):
                assert s2 > e1, ivs


def test_long_shared_span_reconstructed_maximally(spark):
    """A 20-token shared span yields ONE row of exactly length 20 (all
    13 duplicated anchors merge), never 13 fragment rows."""
    long = _uniq("L", 20)
    rows = [
        (1, _doc(_uniq("fa", 7), long, _uniq("ga", 4))),
        (2, _doc(long)),
    ]
    assert _spans(spark, rows) == {(1, 8, 20), (2, 1, 20)}


def _removal(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = exact_substring_removal(df, text_col="text", id_col="doc_id", k=K)
    return {r.doc_id: r for r in out.collect()}


def test_removal_accounting_and_digest(spark):
    """REMOVAL side (r13 verdict ask #2): the planted 12-token span is
    cut from both carriers, n_retained = n_tokens - n_removed holds on
    every row (spans are disjoint in-bounds intervals by construction),
    the cleaned digest equals md5 of exactly the surviving tokens
    space-joined in original order, and an untouched doc keeps its full
    stream with n_removed = 0."""
    shared = _uniq("s", 12)
    fa, ga, fb, fc = (
        _uniq("fa", 10),
        _uniq("ga", 5),
        _uniq("fb", 3),
        _uniq("fc", 30),
    )
    rows = [
        (1, _doc(fa, shared, ga)),
        (2, _doc(fb, shared)),
        (3, _doc(fc)),
    ]
    out = _removal(spark, rows)
    assert len(out) == 3  # one row per input doc, touched or not
    for r in out.values():
        assert r.n_retained == r.n_tokens - r.n_removed
    assert (out[1].n_tokens, out[1].n_removed) == (27, 12)
    assert (out[2].n_tokens, out[2].n_removed) == (15, 12)
    assert (out[3].n_tokens, out[3].n_removed) == (30, 0)

    def md5_of(toks):
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    assert out[1].retained_md5 == md5_of(fa + ga)
    assert out[2].retained_md5 == md5_of(fb)
    assert out[3].retained_md5 == md5_of(fc)


def test_removal_many_span_bomb_linear(spark):
    """Worst-case span density: one doc alternating a cross-doc
    duplicated 8-token island with a 2-token unique gap -> 1,000
    disjoint spans in ONE document.  The gap-slice reconstruction is
    O(tokens + spans) per doc (the original position-indexed
    exists-probe filter was O(tokens * spans) and measurably quadratic
    at 9,900 spans); this pins the exact accounting on the dense case:
    every island cut, every gap retained, digest of exactly the gap
    tokens."""
    island = " ".join(f"d{j}" for j in range(8))
    parts = []
    gap_toks = []
    for i in range(1000):
        parts.append(island)
        parts.append(f"u{i}a u{i}b")
        gap_toks += [f"u{i}a", f"u{i}b"]
    rows = [(1, " ".join(parts)), (2, island)]
    out = _removal(spark, rows)
    assert (out[1].n_tokens, out[1].n_removed, out[1].n_retained) == (
        10000,
        8000,
        2000,
    )
    assert out[1].retained_md5 == hashlib.md5(
        " ".join(gap_toks).encode()
    ).hexdigest()
    assert out[1].n_retained == out[1].n_tokens - out[1].n_removed


def test_removal_fully_duplicated_doc_empties(spark):
    """A document that is one big shared span retains zero tokens and
    digests the empty string; multiple disjoint spans each subtract."""
    p = _uniq("p", 12)
    q = _uniq("q", 9)
    mid = _uniq("m", 20)
    rows = [
        (1, _doc(p)),  # fully covered by the span shared with doc 2
        (2, _doc(_uniq("fb", 2), p)),
        (3, _doc(p, mid, q)),  # two disjoint cuts
        (4, _doc(q, _uniq("fc", 5))),
    ]
    out = _removal(spark, rows)
    assert (out[1].n_retained, out[1].n_removed) == (0, 12)
    assert out[1].retained_md5 == hashlib.md5(b"").hexdigest()
    assert (out[3].n_tokens, out[3].n_removed, out[3].n_retained) == (
        41,
        21,
        20,
    )
    assert out[3].retained_md5 == hashlib.md5(
        " ".join(mid).encode()
    ).hexdigest()
    for r in out.values():
        assert r.n_retained == r.n_tokens - r.n_removed
