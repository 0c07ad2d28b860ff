"""Live robots.txt (VERDICT r3 task 4): in HttpConfig mode the SERVER's
robots.txt must govern disallowed paths and crawl_delay dequeue caps, exactly
like the equivalent static robots dim (whose path is oracle-conformance-
tested in test_crawl_delay.py); plus live DNS (task 5): resolved loopback
addresses must reach the report's network_info (reference crawler.go:122-126).
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F  # noqa: N812

from cs3103_gocrawler_spark.operators.fetch import HttpConfig
from cs3103_gocrawler_spark.operators.robots import parse_robots_txt
from cs3103_gocrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

ROBOTS_BODY = """
# fixture rules
User-agent: nobody-else
Disallow: /

User-agent: cs3103-gocrawler-spark
Disallow: /d
Crawl-delay: 0.2
"""

SITE = {
    "/a": (200, "text/html",
           '<a href="/b">b</a> <a href="/c">c</a> <a href="/d">d</a>'),
    "/b": (200, "text/html", '<a href="/d">d</a> <a href="/e">e</a>'),
    "/c": (200, "text/html", '<a href="/e">e</a>'),
    "/d": (200, "text/html", "disallowed leaf"),
    "/e": (200, "text/html", "leaf"),
    "/robots.txt": (200, "text/plain", ROBOTS_BODY),
}


class _Handler(BaseHTTPRequestHandler):
    robots_hits = 0

    def do_GET(self):  # noqa: N802
        if self.path == "/robots.txt":
            type(self).robots_hits += 1
        status, ctype, body = SITE.get(self.path, (404, "text/html", "gone"))
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def robots_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


# ---------------------------------------------------------------- parser unit

def test_parse_robots_picks_most_specific_section():
    dis, delay = parse_robots_txt(ROBOTS_BODY, "cs3103-gocrawler-spark/0.1")
    assert dis == ["/d"] and delay == 200
    # a UA matching no named section falls back to none here (no * record)
    dis2, _ = parse_robots_txt(ROBOTS_BODY, "googlebot")
    assert dis2 == []


def test_parse_robots_star_fallback_and_groups():
    body = (
        "User-agent: a\nUser-agent: b\nDisallow: /x\n\n"
        "User-agent: *\nDisallow: /y\nCrawl-delay: 3\n"
    )
    assert parse_robots_txt(body, "b-crawler") == (["/x"], 0)
    assert parse_robots_txt(body, "other") == (["/y"], 3000)
    # empty Disallow = allow all; garbage lines skipped; rules before any UA
    # line ignored
    assert parse_robots_txt(
        "Disallow: /pre\nUser-agent: *\nDisallow:\nnoise\nCrawl-delay: zz\n",
        "x",
    ) == ([], 0)
    assert parse_robots_txt("", "x") == ([], 0)


# -------------------------------------------------------------- live vs static

def _fetched_state(eng):
    f = eng.fetched_df().select(
        "url", "outcome", "links", "depth", "parent", "round_id"
    ).toPandas().sort_values("url").reset_index(drop=True)
    return [
        (r.url, r.outcome, None if r.links is None else list(r.links),
         int(r.depth), r.parent, int(r.round_id))
        for r in f.itertuples()
    ]


def _round_dequeues(eng):
    man = eng.cat.manifest()
    return [m["dequeued"] for m in man["metrics"]]


def test_live_robots_matches_static_dim(spark, tmp_path, robots_server):
    """The live-fetched rules must reproduce the static-dim engine run
    bit-for-bit: same visited set, same link lists, same per-round dequeue
    counts under the crawl_delay cap (round_target_ms=300, delay 200 ms →
    at most max(1, 300//200) = 1 URL/round for the host)."""
    base = robots_server
    seeds = spark.createDataFrame([(base + "/a", 0)], "url string, priority int")
    cfg_kw = dict(max_depth=4, budget_per_host=10, max_retries=1,
                  round_target_ms=300)
    http = HttpConfig(timeout_s=5.0, sleep_scale=0.01)

    live = CrawlEngine(
        spark, None,
        CrawlConfig(http=http, live_robots=True, **cfg_kw),
        str(tmp_path / "live"),
    )
    live.init_frontier(seeds)
    live.run()

    static_robots = spark.createDataFrame(
        [("127.0.0.1", ["/d"], 200)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long",
    )
    static = CrawlEngine(
        spark, None, CrawlConfig(http=http, **cfg_kw),
        str(tmp_path / "static"), robots=static_robots,
    )
    static.init_frontier(seeds)
    static.run()

    assert _fetched_state(live) == _fetched_state(static)
    assert _round_dequeues(live) == _round_dequeues(static)
    # the server's rules actually governed the crawl
    vis = {r.url for r in live.visited_df().select("url").collect()}
    assert base + "/d" not in vis            # Disallow: /d enforced
    assert {base + "/a", base + "/b", base + "/c", base + "/e"} <= vis
    assert max(_round_dequeues(live)) <= 1   # crawl_delay cap enforced
    assert _Handler.robots_hits >= 1         # rules really came off the wire


def test_live_robots_resume_identical(spark, tmp_path, robots_server):
    """Kill after round 1 and resume: the persisted robots dim is re-read
    (kept by drop_rounds_after), no divergence vs uninterrupted."""
    base = robots_server
    seeds = spark.createDataFrame([(base + "/a", 0)], "url string, priority int")
    kw = dict(max_depth=3, budget_per_host=10, max_retries=1,
              round_target_ms=1000, live_robots=True,
              http=HttpConfig(timeout_s=5.0, sleep_scale=0.01))

    full = CrawlEngine(spark, None, CrawlConfig(**kw), str(tmp_path / "full"))
    full.init_frontier(seeds)
    full.run()

    part = CrawlEngine(spark, None, CrawlConfig(max_rounds=1, **kw),
                       str(tmp_path / "part"))
    part.init_frontier(seeds)
    part.run()
    resumed = CrawlEngine(spark, None, CrawlConfig(**kw), str(tmp_path / "part"))
    resumed.run(resume=True)
    assert _fetched_state(resumed) == _fetched_state(full)


def test_live_dns_in_report(spark, tmp_path, robots_server):
    """S5/S6 live: resolved loopback IPs appear in the report's
    network_info.remote_ip_info instead of the synthetic sha1-derived dim."""
    import json

    from cs3103_gocrawler_spark.plans.report import write_report

    base = robots_server
    seeds = spark.createDataFrame([(base + "/a", 0)], "url string, priority int")
    eng = CrawlEngine(
        spark, None,
        CrawlConfig(http=HttpConfig(timeout_s=5.0, sleep_scale=0.01),
                    max_depth=2, max_retries=1),
        str(tmp_path / "dns"),
    )
    eng.init_frontier(seeds)
    eng.run()

    vis = eng.visited_df()
    assert "remote_ip" in vis.columns
    ips = {r.remote_ip for r in vis.select("remote_ip").collect()}
    assert ips == {"127.0.0.1"}

    path = str(tmp_path / "report.json")
    write_report(eng, path, wall_sec=0.1, config={}, mode="single")
    rep = json.load(open(path))
    infos = rep["network_info"]["127.0.0.1"]
    assert infos[0]["remote_ip_info"][0]["ip"] == "127.0.0.1"
