"""Backoff golden parity (SURVEY.md §5.2.3).

The reference's golden sequences (backoffpolicy_test.go:13,30, seed 3230)
decompose as deterministic_base + jitter with jitter ∈ [0, min). We assert
(a) our deterministic base matches the reference FORMULA exactly by checking
the reference goldens land within [base, base+min), and (b) our full
jittered sequences are frozen (order-independent PRNG — documented
divergence from Go's shared-stream math/rand; functions/backoff.py docstring).
"""

from cs3103_gocrawler_spark.functions.backoff import (
    exponential_backoff_ms,
    jitter_ms,
    linear_backoff_ms,
    total_retry_backoff_ms,
)

GO_LINEAR = [134, 285, 361, 408, 544, 698, 715, 887, 903, 1031]  # backoffpolicy_test.go:13
GO_EXP = [134, 285, 461, 808, 1644, 3298, 6415, 12887, 25603, 51231]  # :30


def test_reference_goldens_match_formula_bounds():
    mn, mx = 100, 1000
    for attempt, golden in enumerate(GO_LINEAR):
        base = min(mn + attempt * 100, mx)
        assert base <= golden < base + mn
    mn, mx = 100, 1_000_000
    for attempt, golden in enumerate(GO_EXP):
        base = min(mn * (1 << attempt), mx)
        assert base <= golden < base + mn


def test_linear_cap_and_jitter_range():
    for attempt in range(12):
        v = linear_backoff_ms(100, 1000, attempt, key="u")
        base = min(100 + attempt * 100, 1000)
        assert base <= v < base + 100


def test_frozen_goldens_deterministic():
    seq1 = [exponential_backoff_ms(100, 1_000_000, a, key="http://h0.test/p/1")
            for a in range(6)]
    seq2 = [exponential_backoff_ms(100, 1_000_000, a, key="http://h0.test/p/1")
            for a in range(6)]
    assert seq1 == seq2
    # different keys draw different jitter (order-independence)
    seq3 = [exponential_backoff_ms(100, 1_000_000, a, key="http://h0.test/p/2")
            for a in range(6)]
    assert seq1 != seq3


def test_jitter_uniform_range():
    vals = {jitter_ms(3230, f"k{i}", 0, 100) for i in range(500)}
    assert min(vals) >= 0 and max(vals) < 100 and len(vals) > 50


def test_total_retry_backoff():
    att, total = total_retry_backoff_ms(200, 3, key="u")
    assert (att, total) == (1, 0)
    att, total = total_retry_backoff_ms(500, 3, key="u")
    assert att == 4 and total > 0
    assert total_retry_backoff_ms(500, 3, key="u") == (att, total)
