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


def test_write_report_distributed_mode(spark, tiny_web, tmp_path):
    """The scale path: sections written by executors via df.write.json; the
    report file holds only the scalar header + section pointers."""
    cfg_web, web_dir = tiny_web
    pages = spark.read.parquet(f"{web_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{web_dir}/seeds.parquet").select(
        "url", F.col("priority").cast("int").alias("priority")
    )
    eng = CrawlEngine(spark, pages, CrawlConfig(max_depth=2), str(tmp_path / "s"))
    eng.init_frontier(seeds)
    eng.run()

    single = write_report(
        eng, str(tmp_path / "single.json"), wall_sec=1.0, config={}, mode="single"
    )
    dist = write_report(
        eng, str(tmp_path / "dist.json"), wall_sec=1.0, config={}, mode="distributed"
    )
    assert dist["n_pages"] == len(single["page_info"])
    # the distributed sections reassemble to the exact single-file content
    pages_df = spark.read.json(dist["page_info_dir"])
    got_pages = {
        r.url: {"depth": int(r.depth), "parent": r.parent, "links": sorted(r.links)}
        for r in pages_df.collect()
    }
    assert got_pages == single["page_info"]
    net_df = spark.read.json(dist["network_info_dir"])
    got_net = {r.host: [r.info.asDict(recursive=True)] for r in net_df.collect()}
    for h, [info] in got_net.items():
        want = single["network_info"][h][0]
        assert info["path_count"] == want["path_count"]
        assert sorted(info["visited_paths"]) == want["visited_paths"]
        assert info["remote_ip_info"] == want["remote_ip_info"]


def test_default_report_path_timestamped():
    """F9 — explorer's timestamped default filename (config.go:31)."""
    import re

    from cs3103_gocrawler_spark.plans.report import default_report_path

    p = default_report_path("explorer", now=1698130800.0)
    assert re.fullmatch(r"explorer_\d{4}-\d{2}-\d{2}_\d{2}-\d{2}\.json", p)


def test_geo_dim_from_json_parity(spark):
    """F12 — the explicit-schema from_json parse must reproduce the
    sha1-derived dim exactly (same bytes as hashlib.sha1)."""
    import hashlib

    from cs3103_gocrawler_spark.plans.report import geo_dim

    hosts = ["alpha.test", "www.beta.example", "h7.test"]
    got = {
        r.host: (r.ip, r.location, r.as_number)
        for r in geo_dim(spark.createDataFrame([(h,) for h in hosts], "host string")).collect()
    }
    for h in hosts:
        d = hashlib.sha1(h.encode()).digest()
        assert got[h] == (
            f"10.{d[0]}.{d[1]}.{d[2]}",
            f"Region-{d[3] % 32}",
            f"AS{int.from_bytes(d[4:6], 'big')}",
        )
