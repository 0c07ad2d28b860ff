"""T38-T40 — temporal relational operators: as-of join, point-in-interval
range join, gap sessionization (SURVEY.md §8).

Spark has no native ASOF JOIN / interval join (DuckDB and Flink do), but all
three are expressible as compositions of built-in DataFrame ops with exactly
one shuffle each — no Pandas UDFs, no per-key loops, no cross products:

* ``asof_join`` — the distributed ``pandas.merge_asof``: union both sides
  under a side tag, sort by (key, t, tag), carry the most recent right-side
  payload forward with ``last(..., ignorenulls=True)`` over
  UNBOUNDED PRECEDING..CURRENT ROW. One exchange on the key, one sort; the
  window state is a single struct regardless of group size, so a hot key
  degrades to a sequential scan of its rows, never a buffered buildup.
* ``interval_join`` — point-in-interval without a cross product: both sides
  bin to ``bin_us``, intervals explode into their covered bins (a constant
  ≤ ceil(duration/bin)+1 rows each), the join is an equi-join on the bin,
  and the exact half-open ``[start, start+duration)`` predicate filters
  residually. Candidate generation is complete (a point's bin is always
  among its covering interval's bins), so binning affects cost only, never
  the result. All boundary math is integer microseconds (``div``, not
  float division — epoch-µs values sit near 2^50 where double rounding is
  not provably exact).
* ``sessionize`` — gap-based session ids: boundary flag via ``lag`` then a
  running sum, both over the same (key, t, tiebreak) window — one shuffle,
  one sort, ids dense per key so output is identical at any parallelism.

Reference parity: the reference engine has no temporal joins (its only
temporal logic is the per-request duration capture, crawler.go:117-120);
these are target-only training-data-pipeline operators in the §8 family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

HOUR_US = 3_600_000_000
MINUTE_US = 60_000_000


def _us(col) -> Column:
    """Timestamp → integer microseconds since epoch. Parquet NTZ timestamps
    cast through TIMESTAMP under the engine's pinned UTC session tz — the
    same naive-is-UTC reading DuckDB's ``epoch_us`` uses."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    carry: tuple[str, ...],
    tiebreak: str,
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``(right_ts, tiebreak)`` such that ``right_ts <= left_ts`` and the same
    ``on`` key (inclusive backward as-of, deterministic tie-break), or nulls
    when no right row precedes. Output: all left columns + ``carry``.

    ``carry`` must list every right column to surface (including
    ``right_ts`` if the caller wants to compute gaps); ``tiebreak`` must be
    one of them and unique within ``(on, right_ts)`` groups.
    """
    payload = F.struct(*[F.col(c) for c in carry])
    left_struct_type = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    r = right.select(
        F.col(on).alias("_k"),
        _us(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.col(tiebreak).alias("_tb"),
        payload.alias("_p"),
        F.lit(None).cast(left_struct_type).alias("_l"),
    )
    lf = left.select(
        F.col(on).alias("_k"),
        _us(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.struct(*left.columns).alias("_l"),
    )
    # right rows sort BEFORE left rows at equal t (tag 0 < 1) → inclusive
    # right_ts == left_ts matches; among right ties the ascending tiebreak
    # makes `last` pick the maximum.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(lf)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in carry],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    duration_us: int,
    bin_us: int = HOUR_US,
) -> DataFrame:
    """Inner-join points to the half-open intervals
    ``[start_ts, start_ts + duration_us)`` that contain them, via complete
    bin-bucketed candidate generation (module docstring). Output: all
    interval columns + all point columns (callers project/aggregate).

    Each (interval, point) pair appears exactly once: a point has ONE bin
    and an interval's exploded bins are distinct. Skewed bins (every event
    in one hour) are AQE skew-join territory — the bin key is data-derived,
    so salting belongs in the caller's choice of finer ``bin_us``.
    """
    p = points.withColumn("_p_us", _us(point_ts)).withColumn(
        "_bin", F.expr(f"_p_us div {int(bin_us)}")
    )
    iv = (
        intervals.withColumn("_s_us", _us(start_ts))
        .withColumn("_e_us", F.col("_s_us") + F.lit(int(duration_us)))
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.expr(f"_s_us div {int(bin_us)}"),
                    F.expr(f"(_e_us - 1) div {int(bin_us)}"),
                )
            ),
        )
    )
    return (
        p.join(iv, "_bin")
        .filter((F.col("_p_us") >= F.col("_s_us")) & (F.col("_p_us") < F.col("_e_us")))
        .drop("_bin", "_p_us", "_s_us", "_e_us")
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    gap_us: int = 30 * MINUTE_US,
) -> DataFrame:
    """Assign per-key dense session indexes: a new session starts at the
    first event and whenever the gap to the previous event (by
    ``(ts, tiebreak)`` order) exceeds ``gap_us``. Returns the input plus
    ``_ev_us`` (event epoch-µs) and ``session_idx`` (long, 1-based).

    Boundary flags depend only on µs gaps, so equal-timestamp orderings
    cannot flip them — the tiebreak exists to pin the window order itself.
    """
    w = Window.partitionBy(key).orderBy(F.col("_ev_us").asc(), F.col(tiebreak).asc())
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_us = events.withColumn("_ev_us", _us(ts))
    prev = F.lag("_ev_us").over(w)
    boundary = F.when(
        prev.isNull() | ((F.col("_ev_us") - prev) > F.lit(int(gap_us))), 1
    ).otherwise(0)
    return with_us.withColumn(
        "session_idx", F.sum(boundary).over(run).cast("long")
    )
