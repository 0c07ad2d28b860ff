"""S7 JSON report sink — the filewriter.ToJSON analog over engine output."""

import json

from pyspark.sql import functions as F  # noqa: N812

from cs3103_gocrawler_spark.plans.report import write_report
from cs3103_gocrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine


def test_write_report_shape(spark, tiny_web, tmp_path):
    cfg_web, web_dir = tiny_web
    pages = spark.read.parquet(f"{web_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{web_dir}/seeds.parquet").select(
        "url", F.col("priority").cast("int").alias("priority")
    )
    eng = CrawlEngine(spark, pages, CrawlConfig(max_depth=2), str(tmp_path / "s"))
    eng.init_frontier(seeds)
    eng.run()

    out = tmp_path / "report.json"
    rep = write_report(eng, str(out), wall_sec=1.234, config={"max_depth": 2})
    on_disk = json.loads(out.read_text())
    assert on_disk == rep
    assert rep["crawl_time"] == "1.234s"

    visited = eng.visited_df().toPandas()
    assert set(rep["page_info"]) == set(visited["url"])
    # per-host network_info mirrors sitemap.go:25-57: distinct paths, avg over
    # distinct-path count, geo enrichment present
    hosts = set(visited["host"])
    assert set(rep["network_info"]) == hosts
    for host, entries in rep["network_info"].items():
        (ni,) = entries
        sub = visited[visited["host"] == host]
        assert ni["path_count"] == sub["path"].nunique()
        assert ni["visited_paths"] == sorted(set(sub["path"]))
        assert ni["avg_response_ms"] == sub["resp_ms"].sum() // max(1, sub["path"].nunique())
        assert ni["remote_ip_info"][0]["ip"].startswith("10.")
    # page_info links are the sorted extracted links (first-writer-wins rows)
    for url, pi in rep["page_info"].items():
        assert pi["links"] == sorted(pi["links"])
        assert pi["depth"] >= 0
