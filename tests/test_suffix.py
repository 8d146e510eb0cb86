"""Suffix-array semantics: the distributed prefix-doubling ranks must
equal a trusted O(n² log n) driver-side suffix sort, including on inputs
engineered with long repeats (where early rounds tie heavily and the
doubling actually has to work)."""

from __future__ import annotations

import pyspark.sql.functions as F

from parquetaivectorsearch_spark.operators.suffix import suffix_array


def _chars_df(spark, s: str):
    rows = [(i + 1, c) for i, c in enumerate(s)]
    return spark.createDataFrame(rows, "pos BIGINT, ch STRING")


def _expected_ranks(s: str) -> dict[int, int]:
    order = sorted(range(1, len(s) + 1), key=lambda p: s[p - 1:])
    return {p: r + 1 for r, p in enumerate(order)}


def test_suffix_array_banana(spark):
    s = "banana"
    got = {r.pos: r["rank"] for r in
           suffix_array(_chars_df(spark, s), parts=3).collect()}
    assert got == _expected_ranks(s)


def test_suffix_array_heavy_repeats(spark):
    """abab…×20 + aaaa…×17: ranks tie until h exceeds the repeat period —
    a wrong pair-join or a non-global dense rank diverges here."""
    s = "ab" * 20 + "a" * 17 + "ab" * 5
    got = {r.pos: r["rank"] for r in
           suffix_array(_chars_df(spark, s), parts=4).collect()}
    assert got == _expected_ranks(s)


def test_suffix_array_is_permutation_and_cross_doc(spark):
    """Two docs joined by the \\x01 separator: ranks are a permutation of
    1..n and the separator suffixes sort below letter suffixes (binary
    order), matching the corpus-concatenation convention of the
    suffix_array_rank query."""
    s = "the cat sat" + "\x01" + "the cat ran"
    df = suffix_array(_chars_df(spark, s), parts=3)
    ranks = [r["rank"] for r in df.collect()]
    assert sorted(ranks) == list(range(1, len(s) + 1))
    got = {r.pos: r["rank"] for r in df.collect()}
    assert got == _expected_ranks(s)


def test_lcp_adjacent_matches_naive(spark):
    """Sparse-table LCP walk vs a character-at-a-time driver-side LCP on
    the heavy-repeat string (max LCP 47 here — multiple levels must fire
    on the same pair)."""
    from parquetaivectorsearch_spark.operators.suffix import (
        lcp_adjacent, suffix_array_rounds)

    s = "ab" * 20 + "a" * 17 + "ab" * 5
    sa, rounds = suffix_array_rounds(_chars_df(spark, s), parts=4)
    got = {(r.pos_a, r.pos_b): r.lcp for r in
           lcp_adjacent(sa, rounds).collect()}

    order = sorted(range(1, len(s) + 1), key=lambda p: s[p - 1:])

    def naive(a, b):
        x, y = s[a - 1:], s[b - 1:]
        i = 0
        while i < min(len(x), len(y)) and x[i] == y[i]:
            i += 1
        return i

    expected = {(order[i], order[i + 1]): naive(order[i], order[i + 1])
                for i in range(len(order) - 1)}
    assert got == expected
    assert max(got.values()) == max(expected.values())


def test_suffix_array_degenerate_inputs(spark):
    """1-char string (round 0 converges immediately); all-equal string
    'aaaa' (ranks = reverse position order: shorter suffix sorts first,
    doubling must break every tie)."""
    got1 = {r.pos: r["rank"] for r in
            suffix_array(_chars_df(spark, "z"), parts=2).collect()}
    assert got1 == {1: 1}
    s = "aaaa"
    got = {r.pos: r["rank"] for r in
           suffix_array(_chars_df(spark, s), parts=2).collect()}
    assert got == _expected_ranks(s) == {1: 4, 2: 3, 3: 2, 4: 1}


def test_suffix_array_random_strings_property(spark):
    """Property (hypothesis): for random small-alphabet strings — the
    tie-heavy regime where prefix doubling earns its keep — every rank
    equals the trusted driver-side suffix sort. Few examples, bounded
    length: each example is a full multi-round distributed run."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=6, deadline=None)
    @given(s=st.text(alphabet="ab", min_size=2, max_size=48))
    def check(s):
        got = {r.pos: r["rank"] for r in
               suffix_array(_chars_df(spark, s), parts=3).collect()}
        assert got == _expected_ranks(s)

    check()


def test_suffix_array_astral_characters(spark):
    """Supplementary-plane pin (ADVICE r10): U+1D11E (surrogate pair in
    UTF-16) mixed with U+FB04 and ASCII must rank in code-point order —
    the first round keys on F.ascii's integer code point, so the
    range-partitioner, the pandas local sort, and the Python reference
    sort below are literally the same integer comparison."""
    s = "a\U0001d11ebﬄa\U0001d11eﬄb"
    got = {r.pos: r["rank"] for r in
           suffix_array(_chars_df(spark, s), parts=3).collect()}
    assert got == _expected_ranks(s)


def test_lcp_adjacent_max_lcp_saturates_above_cap(spark):
    """The cap-aware walk (r14): with max_lcp=M the reported LCP is
    exact below M and ≥ M above it, so least(lcp, M) equals the capped
    naive answer — the contract every registered SA consumer relies on
    (they all apply least(lcp, 512))."""
    import pyspark.sql.functions as F

    from parquetaivectorsearch_spark.operators.suffix import (
        lcp_adjacent, suffix_array_rounds)

    s = "ab" * 20 + "a" * 17 + "ab" * 5  # max true LCP 47
    sa, rounds = suffix_array_rounds(_chars_df(spark, s), parts=4)
    M = 4
    got = {(r.pos_a, r.pos_b): r.lcp for r in
           lcp_adjacent(sa, rounds, max_lcp=M)
           .withColumn("lcp", F.least(F.col("lcp"), F.lit(M))).collect()}

    order = sorted(range(1, len(s) + 1), key=lambda p: s[p - 1:])

    def naive(a, b):
        x, y = s[a - 1:], s[b - 1:]
        i = 0
        while i < min(len(x), len(y)) and x[i] == y[i]:
            i += 1
        return i

    expected = {(order[i], order[i + 1]): min(naive(order[i], order[i + 1]), M)
                for i in range(len(order) - 1)}
    assert got == expected
