"""End-to-end CLI integration (VERDICT r2 missing #5): drive
scripts/crawl_driver.py as a subprocess — the spark-submit surface the three
reference example apps use (example/*/main.go) — and check its JSON report
equals the engine-direct write_report output for the same config."""

import json
import os
import subprocess
import sys

import pytest

from cs3103_gocrawler_spark.plans.report import write_report
from cs3103_gocrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "scripts", "crawl_driver.py")


def _run_cli(web_dir, state_dir, report_path, extra):
    p = subprocess.run(
        [sys.executable, DRIVER, "--web-dir", web_dir, "--state-dir", state_dir,
         "--report", report_path, *extra],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert p.returncode == 0, p.stderr[-2000:]
    out = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert out, p.stdout
    return json.loads(out[-1])


def _engine_report(spark, web_dir, tmp_path, cfg, name):
    pages = spark.read.parquet(f"{web_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{web_dir}/seeds.parquet")
    eng = CrawlEngine(spark, pages, cfg, str(tmp_path / f"eng_{name}"))
    eng.init_frontier(seeds)
    eng.run()
    path = str(tmp_path / f"eng_{name}.json")
    write_report(eng, path, wall_sec=0.0, config={})
    with open(path) as f:
        return json.load(f)


def test_cli_robots_gate(spark, tiny_web, tmp_path):
    """--robots loads <web-dir>/robots.parquet: disallowed paths are dropped
    at admission (never fetch_error'd), matching the engine-direct run."""
    _, web_dir = tiny_web
    report_path = str(tmp_path / "cli_robots.json")
    summary = _run_cli(web_dir, str(tmp_path / "cli_state_robots"), report_path,
                       ["--robots", "--max-depth", "4", "--budget-per-host", "3"])
    assert summary["urls_dequeued"] > 0

    pages = spark.read.parquet(f"{web_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{web_dir}/seeds.parquet")
    robots = spark.read.parquet(f"{web_dir}/robots.parquet")
    eng = CrawlEngine(spark, pages, CrawlConfig(max_depth=4, budget_per_host=3),
                      str(tmp_path / "eng_robots"), robots=robots)
    eng.init_frontier(seeds)
    eng.run()
    path = str(tmp_path / "eng_robots.json")
    write_report(eng, path, wall_sec=0.0, config={})
    with open(report_path) as f:
        cli_report = json.load(f)
    with open(path) as f:
        eng_report = json.load(f)
    assert cli_report["network_info"] == eng_report["network_info"]
    assert cli_report["page_info"] == eng_report["page_info"]


@pytest.mark.parametrize(
    "name,cli,cfg_kw",
    [
        # sitemapper: same-host scope (example/sitemapper/main.go)
        ("sitemapper", ["--same-host", "--max-depth", "4", "--budget-per-host", "3"],
         dict(scope_same_host=True, max_depth=4, budget_per_host=3)),
        # explorer: blacklist + www variants + substring scope
        ("explorer",
         ["--blacklist", "blocked0.test,blocked1.test",
          "--blacklist-www-variants", "--blacklist-substrings", "h1",
          "--max-depth", "3", "--budget-per-host", "4"],
         dict(blacklist_hosts=("blocked0.test", "blocked1.test"),
              blacklist_www_variants=True, blacklist_substrings=("h1",),
              max_depth=3, budget_per_host=4)),
    ],
)
def test_cli_report_matches_engine(spark, tiny_web, tmp_path, name, cli, cfg_kw):
    _, web_dir = tiny_web
    report_path = str(tmp_path / f"cli_{name}.json")
    summary = _run_cli(web_dir, str(tmp_path / f"cli_state_{name}"),
                       report_path, cli)
    assert summary["urls_dequeued"] > 0 and summary["rounds"] >= 1

    with open(report_path) as f:
        cli_report = json.load(f)
    eng_report = _engine_report(spark, web_dir, tmp_path,
                                CrawlConfig(**cfg_kw), name)
    # config/crawl_time are invocation-specific; the crawl output sections
    # must match exactly
    assert cli_report["network_info"] == eng_report["network_info"]
    assert cli_report["page_info"] == eng_report["page_info"]
    assert len(cli_report["page_info"]) == summary["urls_fetched_ok"]
