"""Report queries (SURVEY.md §3.3) — the flagship batch shapes over the
crawl output tables: host aggregates (A3/A4/A6), crawl ordering (W3), and
the geo-enrichment dimension join (J6/S5/S6).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F  # noqa: N812


def host_report(visited: DataFrame) -> DataFrame:
    """Per-host NetworkInfo report (sitemap.go:25-57 semantics): distinct-path
    count, sorted path list, total/avg response time — avg over *distinct
    paths* with the ÷0→1 guard (sitemap.go:43-48, SURVEY.md §1.3)."""
    return (
        visited.groupBy("host")
        .agg(
            F.countDistinct("path").alias("path_count"),
            F.array_sort(F.collect_set("path")).alias("visited_paths"),
            F.sum("resp_ms").alias("total_response_ms"),
        )
        .withColumn(
            "avg_response_ms",
            F.floor(
                F.col("total_response_ms") / F.greatest(F.lit(1), F.col("path_count"))
            ).cast("long"),
        )
    )


def crawl_order(visited: DataFrame) -> DataFrame:
    """W3 — the recorded per-host crawl ordering the conformance check
    compares: deterministic at any parallelism level."""
    w = Window.partitionBy("host").orderBy("round_id", "priority", "depth", "url")
    return visited.select("host", "url", "round_id", "priority", "depth").withColumn(
        "seq", (F.row_number().over(w) - 1).cast("int")
    )


def fake_ip_dim(spark: SparkSession, hosts: list[str]) -> DataFrame:
    """Deterministic host→(ip, location, asn) dimension — the synthetic
    stand-in for DNS (crawler.go:122-126) + the ipapi.co RPC
    (crawler.go:222-249), re-expressed as a broadcastable lookup table."""
    rows = []
    for h in sorted(set(hosts)):
        d = hashlib.sha1(h.encode()).digest()
        rows.append({
            "host": h,
            "ip": f"10.{d[0]}.{d[1]}.{d[2]}",
            "location": f"Region-{d[3] % 32}",
            "as_number": f"AS{int.from_bytes(d[4:6], 'big')}",
        })
    return spark.createDataFrame(rows)


def host_report_with_geo(spark: SparkSession, visited: DataFrame) -> DataFrame:
    """Host report enriched via broadcast dimension join (J6) — the RPC of
    the reference becomes a dimension join in the Spark design."""
    rep = host_report(visited)
    hosts = [r.host for r in rep.select("host").distinct().collect()]
    dim = fake_ip_dim(spark, hosts)
    return rep.join(F.broadcast(dim), "host", "left")


def write_report(engine, path: str, wall_sec: float, config: dict) -> dict:
    """S7 — the JSON report sink (filewriter.ToJSON, explorerreport.go:12-21):
    scalar header (seeds/depth/rps analog/crawl_time) + per-host network_info
    (A3/A4/A6 + geo J6) + per-URL page_info, one file.

    The aggregates run as Spark jobs; only the final (small) report rows are
    collected driver-side — page bodies never enter the report."""
    import json
    import os

    visited = engine.visited_df()
    spark = engine.spark
    net = {}
    page = {}
    if visited is not None:
        for r in host_report_with_geo(spark, visited).collect():
            net[r["host"]] = [{
                "remote_ip_info": [{
                    "ip": r["ip"], "location": r["location"], "as_number": r["as_number"],
                }],
                "avg_response_ms": r["avg_response_ms"],
                "path_count": r["path_count"],
                "visited_paths": list(r["visited_paths"]),
            }]
        for r in visited.select("url", "depth", "parent", "links").collect():
            page[r["url"]] = {
                "depth": r["depth"],
                "parent": r["parent"],
                "links": sorted(r["links"] or []),
            }
    report = {
        "config": {k: v for k, v in sorted(config.items()) if k != "report"},
        "crawl_time": f"{wall_sec:.3f}s",
        "network_info": dict(sorted(net.items())),
        "page_info": dict(sorted(page.items())),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
    return report


def round_summary(metrics: DataFrame) -> DataFrame:
    """Totals across rounds — the report header scalars (A7)."""
    return metrics.agg(
        F.count("*").alias("rounds"),
        F.sum("dequeued").alias("total_dequeued"),
        F.sum("fetched_ok").alias("total_fetched_ok"),
        F.sum("rejected").alias("total_rejected"),
        F.sum("elapsed_ms").alias("total_elapsed_ms"),
    )
