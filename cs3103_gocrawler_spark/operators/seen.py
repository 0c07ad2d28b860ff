"""J1 — the URL-seen set: broadcast bloom pre-filter + exact anti-join.

Reference: the load-bearing ``VisitedPageInfo`` membership probes
(crawler.go:74-79, 97-102). Two tiers (SURVEY.md §2.3 J1):

tier 1  broadcast bloom filter over url_sha1 (int64) — kills shuffle volume:
        candidates the bloom rejects are *definitely unseen* and skip the
        anti-join entirely; only maybe-seen rows shuffle.
tier 2  exact ``left_anti`` join on the url string against the seen table —
        guarantees exactness regardless of bloom FPR (and of the ~3 expected
        64-bit hash collisions at 10^10 URLs).

The bloom is SEGMENTED: key ``h`` lives entirely inside segment ``pmod(h, S)``,
whose bit array is an independent ``m_seg``-bit bloom. That makes the
per-round build a *Spark job*, not a driver loop:

    fetched Δ ──repartition(S, pmod(url_sha1, S))──► mapInPandas builds each
    segment's bitmap where its rows live ──► driver collects S segment rows
    (m bits total — NOT n data rows) and ORs them into the running filter.

Driver traffic per round is therefore O(filter size), independent of row
count — the previous design collected every (url_sha1, depth, outcome) row
into pandas, a multi-GB pull and a serial Amdahl fraction at 10^8-row rounds
(measured: 8→32-core efficiency 0.361 vs a 1.017 machine ceiling).

Two probe tiers exist behind ``filter_unseen``:

broadcast  (small/medium filters — the engine's "auto" mode resolves here
           below a 256 MB filter) the driver ORs the segment deltas
           into one bit array and broadcasts it; probing is a vectorized
           pandas UDF. Broadcast volume = filter size per round — fine up to
           a few hundred MB, pathological at north_rule scale (10^10 URLs at
           fpr 1e-3 ≈ 17 GB).
partitioned  (scale path) each round's segment rows are *written* as a
           ``bloom_segments`` per-round delta table instead of collected; the
           probe routes candidates by ``pmod(url_sha1, S)`` and cogroups them
           with the segment bitmaps (``probe_with_segments``) — the bit array
           never exists in driver memory and never crosses the driver at all.
           Driver memory and broadcast volume are O(1) in visited-set size;
           resume needs no bloom rebuild because the segment table persists.
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


def _segment_of(h: np.ndarray, s: int) -> np.ndarray:
    """numpy % on int64 matches Spark's pmod for positive divisors
    (non-negative result) — the routing must agree between the repartition
    expression and the worker-side grouping."""
    return np.mod(h.astype(np.int64), np.int64(s)).astype(np.int64)


def _local_indices(h: np.ndarray, m_seg: np.uint64, k: int):
    """k double-hashed bit positions within the key's segment."""
    h1 = h.astype(np.int64).view(np.uint64)
    h2 = _splitmix64(h1) | np.uint64(1)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % m_seg).astype(np.uint64)


def _build_segment_bitmap(h: np.ndarray, m_seg: int, k: int) -> np.ndarray:
    bits = np.zeros(m_seg // 8, dtype=np.uint8)
    for idx in _local_indices(h, np.uint64(m_seg), k):
        np.bitwise_or.at(
            bits, (idx >> np.uint64(3)).astype(np.int64),
            np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8),
        )
    return bits


class Bloom:
    """Vectorized numpy bloom filter keyed by int64 hashes (double hashing),
    split into ``n_segments`` independent sub-filters routed by
    ``pmod(h, n_segments)``. ``n_segments=1`` is the classic single-array
    filter; the engine uses >1 so each round's delta is built executor-side
    (module docstring)."""

    def __init__(self, capacity: int, fpr: float = 1e-3, n_segments: int = 1):
        self.s = max(1, int(n_segments))
        cap_seg = max(1, capacity // self.s)
        m = max(64, int(-cap_seg * np.log(fpr) / (np.log(2) ** 2)))
        self.m_seg = np.uint64((m + 7) // 8 * 8)
        self.k = max(1, int(round(float(self.m_seg) / max(cap_seg, 1) * np.log(2))))
        self._bits = None
        self.n_added = 0

    @property
    def bits(self) -> np.ndarray:
        """Lazily allocated: an engine in partitioned probe mode only uses
        the filter GEOMETRY (m_seg, k, s) — its bitmaps live in the
        bloom_segments table, so the driver never materializes the array
        (at north_rule scale, 10^10 keys at fpr 1e-3, that array is ~17 GB)."""
        if self._bits is None:
            self._bits = np.zeros(int(self.m_seg) // 8 * self.s, dtype=np.uint8)
        return self._bits

    @bits.setter
    def bits(self, v) -> None:
        self._bits = v

    @property
    def seg_bytes(self) -> int:
        return int(self.m_seg) // 8

    def or_segment(self, seg: int, bitmap: bytes, n_rows: int) -> None:
        """Merge an executor-built segment delta (one round, one segment)."""
        a = np.frombuffer(bitmap, dtype=np.uint8)
        lo = seg * self.seg_bytes
        self.bits[lo:lo + self.seg_bytes] |= a
        self.n_added += n_rows

    def add(self, hashes: np.ndarray) -> None:
        """Driver-side add (tests / tiny deltas); the engine path is
        ``build_round_state`` → ``or_segment``."""
        h = np.asarray(hashes)
        if len(h) == 0:
            return
        segs = _segment_of(h, self.s)
        base = (segs.astype(np.uint64) * self.m_seg)
        for idx in _local_indices(h, self.m_seg, self.k):
            g = base + idx
            np.bitwise_or.at(
                self.bits, (g >> np.uint64(3)).astype(np.int64),
                np.uint8(1) << (g & np.uint64(7)).astype(np.uint8),
            )
        self.n_added += len(h)

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes)
        if self.n_added == 0:
            return np.zeros(len(h), dtype=bool)
        res = np.ones(len(h), dtype=bool)
        base = _segment_of(h, self.s).astype(np.uint64) * self.m_seg
        for idx in _local_indices(h, self.m_seg, self.k):
            g = base + idx
            byte = self.bits[(g >> np.uint64(3)).astype(np.int64)]
            res &= (byte & (np.uint8(1) << (g & np.uint64(7)).astype(np.uint8))) != 0
        return res


_STATE_SCHEMA = (
    "seg int, bitmap binary, n_rows long, outcome string, min_depth long"
)


def build_round_state(df: DataFrame, bloom: Bloom,
                      build_bloom: bool = True,
                      segments_sink: tuple | None = None) -> tuple[dict, int | None]:
    """ONE Spark job that replaces the old full-result ``toPandas``: routes
    the round's (url_sha1, depth, outcome) by bloom segment, builds each
    segment's bitmap delta executor-side, and returns the per-outcome counts
    and min depth. Mutates ``bloom`` by OR-merging the segment deltas.

    Collected rows: ≤ S segment rows (bloom-sized) + ≤ S·|outcomes| stat rows
    — independent of the round's row count.

    ``segments_sink=(catalog, round_id)`` is the partitioned-probe scale
    path: the segment bitmap rows are WRITTEN to the catalog's
    ``bloom_segments`` delta table straight from the executors — the driver
    reads back only the (narrow, bitmap-column-pruned) stat rows, so driver
    traffic is O(S) stat rows and the bit arrays never reach it. The driver
    ``bloom`` object is left untouched in this mode.

    ``build_bloom=False`` (caller proved no future round will probe the
    filter — frontier min-depth is monotone, so once min+1 exceeds the depth
    cap it stays exceeded) skips the repartition + Python segment build and
    computes the stats as a pure JVM aggregate.
    """
    if not build_bloom:
        counts: dict[str, int] = {}
        min_depth: int | None = None
        for r in (
            df.groupBy("outcome")
            .agg(F.count("*").alias("n"), F.min("depth").alias("d"))
            .collect()
        ):
            counts[r["outcome"]] = int(r["n"])
            d = int(r["d"])
            min_depth = d if min_depth is None else min(min_depth, d)
        return counts, min_depth

    s, m_seg, k = bloom.s, int(bloom.m_seg), bloom.k
    has_stats = "depth" in df.columns
    cols = ["url_sha1", "depth", "outcome"] if has_stats else ["url_sha1"]
    routed = df.select(*cols).repartition(s, F.pmod(F.col("url_sha1"), F.lit(s)))

    def build(batches):
        acc: dict[int, np.ndarray] = {}
        counts: dict[str, int] = {}
        min_depth = None
        for pdf in batches:
            h = pdf["url_sha1"].to_numpy(dtype=np.int64)
            segs = _segment_of(h, s)
            for seg in np.unique(segs):
                bm = _build_segment_bitmap(h[segs == seg], m_seg, k)
                if int(seg) in acc:
                    acc[int(seg)] |= bm
                else:
                    acc[int(seg)] = bm
            if has_stats and len(pdf):
                for o, n in pdf["outcome"].value_counts().items():
                    counts[o] = counts.get(o, 0) + int(n)
                d = int(pdf["depth"].min())
                min_depth = d if min_depth is None else min(min_depth, d)
        out = {"seg": [], "bitmap": [], "n_rows": [], "outcome": [],
               "min_depth": []}
        for seg, bm in acc.items():
            out["seg"].append(seg)
            out["bitmap"].append(bm.tobytes())
            out["n_rows"].append(0)
            out["outcome"].append(None)
            out["min_depth"].append(None)
        for o, n in counts.items():
            out["seg"].append(None)
            out["bitmap"].append(None)
            out["n_rows"].append(n)
            out["outcome"].append(o)
            out["min_depth"].append(min_depth)
        yield pd.DataFrame(out)

    state = routed.mapInPandas(build, schema=_STATE_SCHEMA)
    counts: dict[str, int] = {}
    min_depth: int | None = None

    if segments_sink is not None:
        # scale path: bitmaps go executor→parquet, never through the driver;
        # the stat read prunes the bitmap column and pushes seg IS NULL down
        catalog, round_id = segments_sink
        catalog.write(state, "bloom_segments", round_id)
        stat_rows = (
            catalog.read("bloom_segments", round_id)
            .filter(F.col("seg").isNull())
            .select("n_rows", "outcome", "min_depth")
            .collect()
        )
        for r in stat_rows:
            counts[r["outcome"]] = counts.get(r["outcome"], 0) + int(r["n_rows"])
            if r["min_depth"] is not None:
                d = int(r["min_depth"])
                min_depth = d if min_depth is None else min(min_depth, d)
        return counts, min_depth

    seg_rows = 0
    for r in state.collect():
        if r["seg"] is not None:
            bloom.or_segment(int(r["seg"]), r["bitmap"], 0)
            seg_rows += 1
        else:
            counts[r["outcome"]] = counts.get(r["outcome"], 0) + int(r["n_rows"])
            if r["min_depth"] is not None:
                d = int(r["min_depth"])
                min_depth = d if min_depth is None else min(min_depth, d)
    bloom.n_added += sum(counts.values()) if has_stats else 0
    return counts, min_depth


def build_bloom_distributed(df: DataFrame, bloom: Bloom) -> None:
    """Bloom-only variant (resume path): add every url_sha1 in ``df`` via the
    executor-side segment build. Marks the filter non-empty even when counts
    are unknown."""
    n_before = bloom.n_added
    build_round_state(df.select("url_sha1"), bloom)
    if bloom.n_added == n_before:
        # stats-less build: approximate n_added with a cheap count so the
        # probe path knows the filter is live
        bloom.n_added += df.count()


def probe_with_segments(
    candidates: DataFrame,
    segments: DataFrame,
    m_seg: int,
    k: int,
    s: int,
    probe_salt: int = 8,
) -> DataFrame:
    """Tier-1 probe against PERSISTED segment bitmaps — the scale path.

    Routes candidates by ``pmod(url_sha1, S)`` and cogroups them with the
    ``bloom_segments`` delta rows on the segment key: both sides shuffle on
    the same key (the candidate side is the only large one; the segment side
    is ≤ S rows per committed round), each task ORs its segment's per-round
    deltas locally and probes its candidates vectorized. No driver-held bit
    array, no ``sparkContext.broadcast`` — probe state lives where the rows
    live, exactly the Iceberg-table layout the module docstring describes.

    ``probe_salt`` bounds per-task candidate volume: cogrouping on the
    segment alone caps parallelism at S keys AND materializes ~1/S of the
    round's children as ONE pandas DataFrame per task — at 10^10-URL rounds
    that is an executor-OOM shape. The candidate side therefore cogroups on
    (segment, salt) where salt = pmod(xxhash64(url_sha1), probe_salt), and
    each segment's (tiny, ≤ rounds·1 rows) bitmap side is replicated once
    per salt bucket — S·probe_salt tasks, each holding 1/(S·probe_salt) of
    the candidates plus one segment's bitmaps. The probe result is
    salt-invariant (pure per-row membership), verified by the
    partitioned≡broadcast conformance test at several salt values.

    Returns ``candidates`` + a ``_maybe`` boolean column.
    """
    from pyspark.sql.types import BooleanType, StructField

    out_fields = list(candidates.schema.fields) + [
        StructField("_maybe", BooleanType())
    ]
    out_names = [f.name for f in candidates.schema.fields]
    probe_salt = max(1, int(probe_salt))
    cand = candidates.withColumn(
        "_seg", F.pmod(F.col("url_sha1"), F.lit(s)).cast("int")
    ).withColumn(
        # xxhash64 of the sha1 is independent of pmod(sha1, s) — rows spread
        # across salt buckets uniformly within every segment
        "_salt", F.pmod(F.xxhash64(F.col("url_sha1")), F.lit(probe_salt)).cast("int")
    )
    segs = (
        segments.filter(F.col("seg").isNotNull())
        .select(F.col("seg").cast("int").alias("_seg"), "bitmap")
        .withColumn(
            # sequence of int literals explodes to int — matches the cast on
            # the candidate side (a generator can't nest inside a cast)
            "_salt",
            F.explode(F.sequence(F.lit(0), F.lit(probe_salt - 1))),
        )
    )
    m = np.uint64(m_seg)

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        h = left["url_sha1"].to_numpy(dtype=np.int64)
        if len(right) == 0 or len(h) == 0:
            maybe = np.zeros(len(h), dtype=bool)
        else:
            bits = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8).copy()
            for bm in right["bitmap"].iloc[1:]:
                bits |= np.frombuffer(bm, dtype=np.uint8)
            maybe = np.ones(len(h), dtype=bool)
            for idx in _local_indices(h, m, k):
                byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
                maybe &= (
                    byte & (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
                ) != 0
        out = left[out_names].copy()
        out["_maybe"] = maybe
        return out

    from pyspark.sql.types import StructType

    return (
        cand.groupBy("_seg", "_salt")
        .cogroup(segs.groupBy("_seg", "_salt"))
        .applyInPandas(probe, schema=StructType(out_fields))
    )


def filter_unseen(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom: Bloom | None,
    segments: DataFrame | None = None,
    probe_salt: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Return (unseen_candidates, maybe_seen_survivors_for_fp_metric).

    ``candidates`` must carry ``url`` + ``url_sha1``; ``seen`` carries ``url``.
    The second return value is the bloom's false positives (rows the bloom
    flagged but the exact join proved unseen) — instrumentation for metrics.

    ``segments`` (the persisted ``bloom_segments`` delta table) selects the
    partitioned probe tier; ``bloom`` then only supplies the filter geometry
    (m_seg, k, S) and its bit array is neither read nor broadcast.
    """
    if seen is None:
        return candidates, candidates.limit(0)
    if segments is not None and bloom is not None:
        flagged = probe_with_segments(
            candidates, segments, int(bloom.m_seg), bloom.k, bloom.s,
            probe_salt=probe_salt,
        )
    elif bloom is None or bloom.n_added == 0:
        return candidates.join(seen.select("url"), "url", "left_anti"), candidates.limit(0)
    else:
        # duck-typed broadcast tier: any filter exposing might_contain over
        # int64 sha1s rides here — Bloom or the deletable CuckooFilter
        # (operators/cuckoo.py). One broadcast per probing round either way.
        state = spark.sparkContext.broadcast(bloom)

        @F.pandas_udf("boolean")
        def might_contain(h: pd.Series) -> pd.Series:
            return pd.Series(
                state.value.might_contain(h.to_numpy(dtype=np.int64))
            )

        flagged = candidates.withColumn("_maybe", might_contain(F.col("url_sha1")))
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    survivors = (
        flagged.filter(F.col("_maybe")).drop("_maybe")
        .join(seen.select("url"), "url", "left_anti")
    )
    return definitely_new.unionByName(survivors), survivors
