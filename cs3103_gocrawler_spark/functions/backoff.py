"""Retry backoff policies (SURVEY.md §2.1 S3/S4).

Formula parity with the reference (internal/rhttp/backoffpolicy.go:23-44):

    linear:      wait = min(minMs + 100*attempt, maxMs) + jitter
    exponential: wait = min(minMs * 2**attempt, maxMs)  + jitter
    jitter ~ U[0, minMs)

Jitter-PRNG divergence, documented per SURVEY.md §5.2.3: the reference draws
jitter from one process-global ``math/rand`` stream seeded 3230
(backoffpolicy.go:10) — a *stateful shared sequence* that cannot be reproduced
order-independently by distributed tasks, and Go's PRNG algorithm (lagged
Fibonacci) differs from anything in numpy anyway. We instead make jitter a
pure function of ``(seed, key, attempt)`` via splitmix64 — deterministic,
order-independent, task-parallel safe. Golden values for OUR sequence are
frozen in tests/test_backoff.py alongside the reference's recorded goldens
(backoffpolicy_test.go:13,30) for the deterministic (pre-jitter) component.
"""

from __future__ import annotations

import hashlib

_MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return (z ^ (z >> 31)) & _MASK


def jitter_ms(seed: int, key: str, attempt: int, min_ms: int) -> int:
    """Deterministic stand-in for rng.Intn(minMs): U[0, min_ms)."""
    h = int.from_bytes(hashlib.sha1(f"{seed}|{key}".encode()).digest()[:8], "big")
    return _splitmix64(h ^ (attempt * 0x9E3779B97F4A7C15 & _MASK)) % min_ms


def linear_backoff_ms(min_ms: int, max_ms: int, attempt: int,
                      seed: int = 3230, key: str = "") -> int:
    wait = min_ms + attempt * 100
    if wait > max_ms:
        wait = max_ms
    return wait + jitter_ms(seed, key, attempt, min_ms)


def exponential_backoff_ms(min_ms: int, max_ms: int, attempt: int,
                           seed: int = 3230, key: str = "") -> int:
    wait = min_ms * (1 << attempt)
    if wait > max_ms:
        wait = max_ms
    return wait + jitter_ms(seed, key, attempt, min_ms)


def total_retry_backoff_ms(status: int, max_retries: int, min_ms: int = 100,
                           max_ms: int = 1_000_000, seed: int = 3230,
                           key: str = "", policy: str = "exponential") -> tuple[int, int]:
    """Simulated retry loop for one URL (reference rhttp.go:47-61 semantics:
    retry on 5xx/transport error up to max_retries, sleeping per policy).
    Returns (attempts, total_backoff_ms). 5xx in the synthetic web is
    persistent, so a 500 always exhausts its retries."""
    fn = exponential_backoff_ms if policy == "exponential" else linear_backoff_ms
    if status < 500:
        return 1, 0
    total = 0
    for attempt in range(max_retries):
        total += fn(min_ms, max_ms, attempt, seed=seed, key=key)
    return max_retries + 1, total
