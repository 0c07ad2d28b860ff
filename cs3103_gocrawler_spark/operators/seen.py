"""J1 — the URL-seen set: broadcast bloom pre-filter + exact anti-join.

Reference: the load-bearing ``VisitedPageInfo`` membership probes
(crawler.go:74-79, 97-102). Two tiers (SURVEY.md §2.3 J1):

tier 1  broadcast bloom filter over url_sha1 (int64) — kills shuffle volume:
        candidates the bloom rejects are *definitely unseen* and skip the
        anti-join entirely; only maybe-seen rows shuffle.
tier 2  exact ``left_anti`` join on the url string against the seen table —
        guarantees exactness regardless of bloom FPR (and of the ~3 expected
        64-bit hash collisions at 10^10 URLs).

The bloom is maintained driver-side as a numpy bit array, unioned with each
round's newly-seen sha1s (incremental per-round build, SURVEY.md §7 hard-part
(c) — no full rescan). At true 10^10 scale the per-round delta build moves to
executors (per-partition blooms OR-merged via treeAggregate, or Iceberg's
bloom write option); the probe path — a broadcast + vectorized pandas UDF —
is unchanged, which is the part that matters for the plan shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

_MASK = np.uint64((1 << 64) - 1)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return (x ^ (x >> np.uint64(31))) & _MASK


class Bloom:
    """Vectorized numpy bloom filter keyed by int64 hashes (double hashing)."""

    def __init__(self, capacity: int, fpr: float = 1e-3):
        m = max(64, int(-capacity * np.log(fpr) / (np.log(2) ** 2)))
        self.m = np.uint64((m + 7) // 8 * 8)
        self.k = max(1, int(round(float(self.m) / max(capacity, 1) * np.log(2))))
        self.bits = np.zeros(int(self.m) // 8, dtype=np.uint8)
        self.n_added = 0

    def _indices(self, h: np.ndarray):
        h1 = h.astype(np.int64).view(np.uint64)
        h2 = _splitmix64(h1) | np.uint64(1)
        for i in range(self.k):
            yield ((h1 + np.uint64(i) * h2) % self.m).astype(np.uint64)

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        for idx in self._indices(np.asarray(hashes)):
            np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        self.n_added += len(hashes)

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        res = np.ones(len(hashes), dtype=bool)
        if self.n_added == 0:
            return np.zeros(len(hashes), dtype=bool)
        for idx in self._indices(np.asarray(hashes)):
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            res &= (byte & (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))) != 0
        return res


def filter_unseen(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom: Bloom | None,
) -> tuple[DataFrame, DataFrame]:
    """Return (unseen_candidates, maybe_seen_survivors_for_fp_metric).

    ``candidates`` must carry ``url`` + ``url_sha1``; ``seen`` carries ``url``.
    The second return value is the bloom's false positives (rows the bloom
    flagged but the exact join proved unseen) — instrumentation for metrics.
    """
    if seen is None:
        return candidates, candidates.limit(0)
    if bloom is None or bloom.n_added == 0:
        return candidates.join(seen.select("url"), "url", "left_anti"), candidates.limit(0)

    state = spark.sparkContext.broadcast((bloom.bits, int(bloom.m), bloom.k))

    @F.pandas_udf("boolean")
    def might_contain(h: pd.Series) -> pd.Series:
        bits, m, k = state.value
        b = Bloom.__new__(Bloom)
        b.bits, b.m, b.k, b.n_added = bits, np.uint64(m), k, 1
        return pd.Series(b.might_contain(h.to_numpy(dtype=np.int64)))

    flagged = candidates.withColumn("_maybe", might_contain(F.col("url_sha1")))
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    survivors = (
        flagged.filter(F.col("_maybe")).drop("_maybe")
        .join(seen.select("url"), "url", "left_anti")
    )
    return definitely_new.unionByName(survivors), survivors
