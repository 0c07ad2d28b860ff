"""Link-graph analytics for frontier prioritization.

A crawl frontier at 10^10 URLs cannot be ordered by depth alone: the
standard prioritization signal is link authority over the already-crawled
edge set (PageRank, Page et al. 1999 — public). The reference engine keeps
only the raw parent→child link map (gocrawler's ``linkMap``); ranking it is
the natural target-side extension, feeding the same priority column the
politeness dequeue (W2) already orders by.

Numerics: the rank is computed in FIXED-POINT integer units (1 unit =
10^-12 of one page's initial mass) with floor division everywhere, so every
engine — Spark, DuckDB, a hand calculation — produces bit-identical longs.
Floating-point PageRank sums doubles in shuffle-arrival order, which no
cross-engine hash gate can pin down; integer mass is associative, so the
oracle twin matches exactly. Damping 0.85 becomes ``(85 * x) DIV 100``.

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

UNIT = 10**12                 # fixed-point scale: initial rank per node
BASE = (15 * UNIT) // 100     # (1 - damping) mass kept by every node
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact integer ratio


def pagerank_units(edges: DataFrame, iters: int = 3,
                   src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Integer fixed-point PageRank over a distinct (src, dst) edge list
    (self-loops excluded by the caller). Returns (node, rank_units) with
    rank_units a long in UNIT = 10^12 fixed-point units.

    Per-node update: r'(v) = BASE + (85 * Σ_{(u,v)} (r(u) DIV outdeg(u)))
    DIV 100. Dangling mass is dropped rather than redistributed (both
    engines drop it identically; redistribution would add one tiny global
    agg per iteration and is orthogonal to the join/agg shape).
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
                    f"({DAMP_NUM} * coalesce(_inc, CAST(0 AS BIGINT)))"
                    f" DIV {DAMP_DEN}"
                )
            ).cast("long").alias("rank_units"),
        )
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
