"""Replay the reference's recorded explorer crawl (FIXTURES.md §5): the link
graph embedded in /root/reference/example/explorer/explorer_2023-10-24_15-00.json
(25 pages, 3 hosts, user max_depth=3) re-hosted as a synthetic web; the
engine must reproduce the visited set, every recorded depth (including the
max_depth-1 off-by-one cap, crawler.go:59,93), and every page's link list.

Parents are compared only where the reference recorded one: the reference's
first-goroutine-wins insert (crawler.go:262-272) left two entries with
parent "" — our deterministic min-(depth,parent) rule fills those in
(SURVEY.md §1.3, documented divergence).
"""

import json

import pandas as pd
import pytest

FIXTURE = "/root/reference/example/explorer/explorer_2023-10-24_15-00.json"


@pytest.fixture(scope="module")
def fixture_data():
    with open(FIXTURE) as f:
        return json.load(f)


def test_replay_explorer_fixture(spark, tmp_path, fixture_data):
    from cs3103_gocrawler_spark.functions.urlfuncs import canonicalize_url
    from cs3103_gocrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine
    from cs3103_gocrawler_spark.synthetic.webgen import render_body_html

    fix = fixture_data
    canon = {url: canonicalize_url(url) for url in fix["page_info"]}
    assert len(set(canon.values())) == len(canon), "fixture URLs collide post-canon"

    rows = []
    for url, info in fix["page_info"].items():
        # links: null in the fixture == successful fetch, empty extraction
        # (Go nil slice marshals to null)
        rows.append({
            "image_id": canon[url],
            "status": 200,
            "content_type": "text/html; charset=utf-8",
            "body_html": render_body_html(canon[url], "", info["links"] or []),
        })
    pages = spark.createDataFrame(pd.DataFrame(rows))
    seeds = spark.createDataFrame(
        pd.DataFrame({"url": fix["seeds"], "priority": [0] * len(fix["seeds"])})
    )
    cfg = CrawlConfig(
        max_depth=fix["max_depth"],  # user value; engine applies the -1 quirk
        budget_per_host=None,
        blacklist_hosts=tuple(fix["blacklist"]),
        matchers=("html",),
    )
    eng = CrawlEngine(spark, pages, cfg, str(tmp_path / "replay_explorer"))
    eng.init_frontier(seeds)
    eng.run()

    visited = eng.visited_df().toPandas()
    got = {
        r.url: (
            int(r.depth),
            r.parent,
            sorted(list(r.links) if r.links is not None else []),
        )
        for r in visited.itertuples()
    }
    want = {
        canon[url]: (
            info["depth"],
            canonicalize_url(info["parent"]) if info["parent"] else "",
            # canonicalize against the page URL + dedupe: the reference
            # recorded raw href strings incl. fragment-only ones ('#page-1'),
            # which RFC 3986 resolves to the page itself; two raw forms can
            # also canonicalize to one (linkextractor.go:31-57 deduped raw)
            sorted({
                cu
                for x in (info["links"] or [])
                if (cu := canonicalize_url(x, base=canon[url])) is not None
            }),
        )
        for url, info in fix["page_info"].items()
    }
    assert set(got) == set(want), (
        f"extra={set(got) - set(want)} missing={set(want) - set(got)}"
    )
    for url in want:
        assert got[url][0] == want[url][0], f"depth mismatch at {url}"
        assert got[url][2] == want[url][2], f"links mismatch at {url}"
        if want[url][1]:  # parent recorded by the reference
            assert got[url][1] == want[url][1], f"parent mismatch at {url}"
