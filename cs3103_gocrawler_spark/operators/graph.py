"""Link-graph analytics for frontier prioritization.

A crawl frontier at 10^10 URLs cannot be ordered by depth alone: the
standard prioritization signal is link authority over the already-crawled
edge set (PageRank, Page et al. 1999 — public). The reference engine keeps
only the raw parent→child link map (gocrawler's ``linkMap``); ranking it is
the natural target-side extension, feeding the same priority column the
politeness dequeue (W2) already orders by.

Numerics: the rank is computed in FIXED-POINT integer units (1 unit =
10^-8 of one page's initial mass) with floor division everywhere, so every
engine — Spark, DuckDB, a hand calculation — produces bit-identical longs.
Floating-point PageRank sums doubles in shuffle-arrival order, which no
cross-engine hash gate can pin down; integer mass is associative, so the
oracle twin matches exactly. Damping 0.85 is applied as the staged integer
division ``(x DIV 100)*85 + ((x % 100)*85) DIV 100`` — exactly equal to
``(85*x) DIV 100`` for x ≥ 0 but with a max intermediate of ``85*(x DIV
100)``, so the multiply can never wrap int64 for ANY representable mass.
Overflow bound: the only remaining 64-bit-sensitive expression is the
inbound-mass SUM, bounded by total graph mass n·UNIT; with UNIT = 10^8
that stays under 2^63 for n ≤ 9.2×10^10 nodes — comfortably past the
advertised 10^10-URL frontier even in the pathological every-edge-into-
one-sink graph. (UNIT = 10^12, the round-4 value, wrapped at ~10^5 nodes
feeding one sink — ADVICE r4.)

Scale shape (per iteration): one join of the edge list against the rank
vector on ``src`` (both sides hash-partition on the join key; the edge list
carries its precomputed out-degree so no extra shuffle) and one map-side-
partial sum on ``dst``. Nothing is ever collected; the edge list is read
once and reused across iterations (cache/persist is the caller's choice).
For iteration counts beyond a handful, checkpoint the rank vector between
iterations exactly as dedup.neardup_components does for its label frontier
(lineage otherwise grows linearly with iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

UNIT = 10**8                  # fixed-point scale: initial rank per node
BASE = (15 * UNIT) // 100     # (1 - damping) mass kept by every node
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact integer ratio


def pagerank_units(edges: DataFrame, iters: int = 3,
                   src_col: str = "src", dst_col: str = "dst",
                   materialize: bool = True) -> DataFrame:
    """Integer fixed-point PageRank over a distinct (src, dst) edge list
    (self-loops excluded by the caller). Returns (node, rank_units) with
    rank_units a long in UNIT = 10^8 fixed-point units.

    Per-node update: r'(v) = BASE + damp(Σ_{(u,v)} (r(u) DIV outdeg(u)))
    where damp(x) = (x DIV 100)*85 + ((x % 100)*85) DIV 100 ≡ (85*x) DIV
    100, staged so the multiply cannot wrap int64 (module docstring).
    Dangling mass is dropped rather than redistributed (both engines drop
    it identically; redistribution would add one tiny global agg per
    iteration and is orthogonal to the join/agg shape).

    With ``materialize=True`` (default) the final ranks are eagerly
    localCheckpoint-ed — truncating the iteration lineage — and the two
    internally persisted relations (nodes, degree-annotated edges) are
    unpersisted before returning, so a call leaves NOTHING pinned in
    executor storage (ADVICE r4: the round-4 version leaked both for the
    session lifetime). Pass ``materialize=False`` to get the lazy plan
    back for inspection; the caller then owns the two cached relations
    (clear with ``spark.catalog.clearCache()``).
    """
    src, dst = F.col(src_col), F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .union(edges.select(dst.alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(src_col).agg(F.count("*").alias("outdeg"))
    ew = edges.join(outdeg, src_col)
    # nodes and the degree-annotated edge list are read EVERY iteration —
    # persist them once or each iteration's plan re-derives them from the
    # raw edge scan (3 iterations cost 3 distincts + 3 degree aggs instead
    # of one of each; at 10^10 edges that is the whole job)
    nodes = nodes.persist()
    ew = ew.persist()
    ranks = nodes.withColumn("rank_units", F.lit(UNIT).cast("long"))
    for _ in range(int(iters)):
        inc = (
            ew.join(ranks, ew[src_col] == ranks["node"])
            .select(
                F.col(dst_col).alias("node"),
                F.expr("rank_units DIV outdeg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_inc"))
        )
        ranks = nodes.join(inc, "node", "left").select(
            "node",
            (
                F.lit(BASE)
                + F.expr(
                    f"(coalesce(_inc, CAST(0 AS BIGINT)) DIV {DAMP_DEN})"
                    f" * {DAMP_NUM}"
                    f" + ((coalesce(_inc, CAST(0 AS BIGINT)) % {DAMP_DEN})"
                    f" * {DAMP_NUM}) DIV {DAMP_DEN}"
                )
            ).cast("long").alias("rank_units"),
        )
    if materialize:
        # eager localCheckpoint materializes ranks off the cached inputs and
        # truncates lineage, so releasing them below can never force a
        # recompute from the raw edge scan; the checkpointed blocks are
        # reclaimed by the ContextCleaner when the returned DF is dropped
        ranks = ranks.localCheckpoint(eager=True)
        nodes.unpersist()
        ew.unpersist()
    return ranks


def rank_link_graph(visited: DataFrame, iters: int = 3) -> DataFrame:
    """Frontier prioritization over a crawl's OWN output: PageRank on the
    visited set's extracted-link edge set (the J5 explode,
    streaming/rounds.py), including link targets that were never fetched.
    Returns (url, rank_units).

    Those unfetched targets are the next crawl's frontier — they enter the
    graph as sink nodes and accumulate authority from every page that links
    to them, so joining this table onto a seed list's ``priority`` column
    (higher rank ⇒ dequeued earlier under the W2 per-host window) turns the
    engine's depth-BFS into an authority-first crawl without touching the
    round loop. The reference keeps the same edge map (gocrawler's
    ``linkMap``, crawler.go:31-38) but never ranks it.
    """
    edges = (
        visited.select(
            F.col("url").alias("src"), F.explode("links").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return pagerank_units(edges, iters=iters).select(
        F.col("node").alias("url"), "rank_units"
    )
