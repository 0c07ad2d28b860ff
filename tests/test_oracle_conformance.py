"""Golden conformance (SURVEY.md §5.2.2): the Spark engine's visited set,
(depth, parent, links) per URL, per-host crawl ordering, and host aggregates
must equal the sequential oracle's, across depths / budgets / seeds."""

import pandas as pd
import pytest

from cs3103_gocrawler_spark.oracle.bfs_oracle import crawl_oracle, pages_dict_from_pandas
from cs3103_gocrawler_spark.plans.report import crawl_order, host_report
from cs3103_gocrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine
from cs3103_gocrawler_spark.synthetic.webgen import (
    generate_pandas,
    robots_for,
    seeds_for,
)


def run_engine(spark, cfg_web, web_dir, state_dir, crawl_cfg, robots=False):
    pages = spark.read.parquet(f"{web_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{web_dir}/seeds.parquet")
    robots_df = spark.read.parquet(f"{web_dir}/robots.parquet") if robots else None
    eng = CrawlEngine(spark, pages, crawl_cfg, state_dir, robots=robots_df)
    eng.init_frontier(seeds)
    history = eng.run()
    return eng, history


def oracle_run(cfg_web, crawl_cfg, robots=False):
    pages_pdf, edges_pdf = generate_pandas(cfg_web)
    pages, links = pages_dict_from_pandas(pages_pdf, edges_pdf)
    seeds = [(r.url, int(r.priority)) for r in seeds_for(cfg_web).itertuples()]
    robots_map = None
    if robots:
        robots_map = {
            r.host: list(r.disallow_prefixes) for r in robots_for(cfg_web).itertuples()
        }
    return crawl_oracle(
        pages, links, seeds,
        max_depth=crawl_cfg.max_depth,
        budget_per_host=crawl_cfg.budget_per_host,
        blacklist=set(crawl_cfg.blacklist_hosts),
        robots=robots_map,
        resp_seed=crawl_cfg.gen_seed,
    )


def compare(eng, oracle):
    visited = eng.visited_df().toPandas()
    got = {
        r.url: (int(r.depth), r.parent, list(r.links)) for r in visited.itertuples()
    }
    want = {
        u: (v["depth"], v["parent"], v["links"]) for u, v in oracle.visited.items()
    }
    assert set(got) == set(want), (
        f"visited-set mismatch: extra={set(got) - set(want)} missing={set(want) - set(got)}"
    )
    for u in want:
        assert got[u] == want[u], f"{u}: engine {got[u]} != oracle {want[u]}"

    order = crawl_order(eng.visited_df()).toPandas()
    got_order = sorted(
        (r.host, int(r.seq), r.url) for r in order.itertuples()
    )
    assert got_order == sorted(oracle.order)

    rep = host_report(eng.visited_df()).toPandas()
    got_stats = {
        r.host: (int(r.path_count), list(r.visited_paths),
                 int(r.total_response_ms), int(r.avg_response_ms))
        for r in rep.itertuples()
    }
    want_stats = {
        h: (s["path_count"], s["visited_paths"],
            s["total_response_ms"], s["avg_response_ms"])
        for h, s in oracle.host_stats.items()
    }
    assert got_stats == want_stats

    rejected = eng.rejected_df()
    got_rej = {r.url: r.reason for r in rejected.toPandas().itertuples()} if rejected is not None else {}
    assert got_rej == oracle.rejected


def compare_metrics(history, oracle):
    eng_rounds = [
        {k: h[k] for k in ("round_id", "dequeued", "fetched_ok", "rejected", "new_urls", "deferred")}
        for h in history if h.get("dequeued", 0) > 0
    ]
    assert eng_rounds == oracle.rounds


@pytest.mark.parametrize(
    "depth,budget,blacklist", [(3, None, True), (4, 2, True), (6, 3, True), (2, None, False)]
)
def test_tiny_conformance(spark, tiny_web, tmp_path, depth, budget, blacklist):
    cfg_web, web_dir = tiny_web
    crawl_cfg = CrawlConfig(
        max_depth=depth,
        budget_per_host=budget,
        blacklist_hosts=cfg_web.blacklist_hosts if blacklist else (),
    )
    eng, history = run_engine(
        spark, cfg_web, web_dir, str(tmp_path / "state"), crawl_cfg
    )
    oracle = oracle_run(cfg_web, crawl_cfg)
    compare(eng, oracle)
    compare_metrics(history, oracle)


def test_medium_conformance_with_robots(spark, medium_web, tmp_path):
    cfg_web, web_dir = medium_web
    crawl_cfg = CrawlConfig(
        max_depth=6,
        budget_per_host=4,
        blacklist_hosts=cfg_web.blacklist_hosts,
        gen_seed=cfg_web.seed,
    )
    eng, _ = run_engine(
        spark, cfg_web, web_dir, str(tmp_path / "state"), crawl_cfg, robots=True
    )
    oracle = oracle_run(cfg_web, crawl_cfg, robots=True)
    compare(eng, oracle)


def test_depth_off_by_one_semantics(spark, tiny_web, tmp_path):
    """user max_depth=1 ⇒ only seeds fetched (crawler.go:59,93)."""
    cfg_web, web_dir = tiny_web
    crawl_cfg = CrawlConfig(max_depth=1, blacklist_hosts=cfg_web.blacklist_hosts)
    eng, _ = run_engine(spark, cfg_web, web_dir, str(tmp_path / "s"), crawl_cfg)
    visited = eng.visited_df().toPandas()
    assert set(visited["depth"]) <= {0}
    assert len(visited) <= cfg_web.n_seeds
