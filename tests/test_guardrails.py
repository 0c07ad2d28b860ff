"""Round-3 guardrail fixes (ADVICE.md): fail-closed stats, config validation,
finalize idempotence, fractional-budget rejection."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cs3103_gocrawler_spark.operators.politeness import dequeue
from cs3103_gocrawler_spark.storage import RoundCatalog
from cs3103_gocrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine


def test_carryover_budget_below_half_rejected():
    with pytest.raises(ValueError, match="livelock"):
        CrawlConfig(budget_per_host=0.4, politeness_carryover=True)
    # >= 0.5 is the smallest workable carryover budget (alternates 0/1 takes)
    CrawlConfig(budget_per_host=0.5, politeness_carryover=True)


def test_fractional_budget_without_carryover_rejected():
    with pytest.raises(TypeError, match="carryover"):
        CrawlConfig(budget_per_host=2.5)
    # integral floats are fine (2.0 == 2)
    CrawlConfig(budget_per_host=2.0)


def test_dequeue_rejects_fractional_budget(spark):
    pending = spark.createDataFrame(
        [("http://a.test/x", "a.test", "/x", 1, 0, 0, "")],
        "url string, host string, path string, url_sha1 long, depth int, "
        "priority int, parent string",
    )
    with pytest.raises(TypeError, match="fractional"):
        dequeue(pending, 2.5)


def test_column_min_fails_closed(spark, tmp_path):
    cat = RoundCatalog(spark, str(tmp_path))
    p = cat.path("frontier", 0)
    os.makedirs(p)
    t = pa.table({"depth": pa.array([3, 1, 2], type=pa.int64())})
    # file WITH stats: real minimum
    pq.write_table(t, os.path.join(p, "a.parquet"))
    assert cat.column_min("frontier", 0, "depth") == 1
    # missing column: get_field_index returns -1, must not read a wrong column
    assert cat.column_min("frontier", 0, "missing_col") is None
    # any stats-less file poisons the min (partial min could overstate it)
    pq.write_table(t, os.path.join(p, "b.parquet"), write_statistics=False)
    assert cat.column_min("frontier", 0, "depth") is None


def test_bloom_gate_fails_closed_when_stats_absent(spark, tiny_web, tmp_path):
    """A frontier written without parquet stats must still build the bloom:
    bloom_needed falls back to True, so the crawl's visited set is unchanged
    (nothing is ever re-enqueued)."""
    from pyspark.sql import functions as F

    _, d = tiny_web
    pages = spark.read.parquet(f"{d}/pages.parquet")
    seeds = pages.limit(3).select(
        F.col("image_id").alias("url"), F.lit(0).cast("int").alias("priority")
    )
    cfg = CrawlConfig(max_depth=3, budget_per_host=2)
    eng = CrawlEngine(spark, pages, cfg, str(tmp_path / "gate_state"))
    eng.init_frontier(seeds)
    # strip the stats from the round-0 frontier files in place (and drop the
    # hadoop .crc sidecars the rewrite invalidates)
    p = eng.cat.path("frontier", 0)
    for f in os.listdir(p):
        fp = os.path.join(p, f)
        if f.endswith(".crc"):
            os.remove(fp)
        elif f.endswith(".parquet"):
            t = pq.read_table(fp)
            pq.write_table(t, fp, write_statistics=False)
    hist = eng.run()
    assert sum(h.get("fetched_ok", 0) for h in hist) > 0
    # the bloom must have been built for round 0 despite absent stats
    assert eng.bloom.n_added > 0


def test_finalize_clears_stale_parts(spark, tmp_path):
    state = str(tmp_path / "state")
    eng = CrawlEngine(spark, None, CrawlConfig(), state)
    eng.cat.commit_round(0, {"metrics": [
        {"round_id": 0, "pending": 5, "dequeued": 5, "fetched_ok": 4,
         "rejected": 1, "new_urls": 2, "deferred": 0, "bloom_fp": -1,
         "elapsed_ms": 10},
    ]})
    out = os.path.join(state, "metrics_table")
    os.makedirs(out)
    # a stale uuid-named part from an old Spark overwrite write
    pq.write_table(
        pa.table({"round_id": pa.array([99], type=pa.int64())}),
        os.path.join(out, "part-uuid-stale.parquet"),
    )
    eng._finalize()
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0]["round_id"] == 0


def test_bench_compact_line_fits_driver_tail_window():
    """The per-round driver json-parses only the LAST ~4 KB of bench.py's
    stdout; the full result blew past that in r04 and recorded
    "parsed": null. The compact final line must stay well inside the
    window with every field populated, and keep the contract keys."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    pair = {
        "n_cores": 2, "n4_cores": 8,
        "urls_per_sec_n": 12345.6, "urls_per_sec_4n": 45678.9,
        "scaling_efficiency": 0.925, "probe_eff_same_window": 1.018,
        "eff_probe_normalized": 0.909, "time_coherent": True,
        "pair_passes": {"n": {"huge": "x" * 2000}, "4n": {"huge": "y" * 2000}},
    }
    result = {
        "metric": "headline_queries_total_sec",
        "value": 5.5,
        "unit": "sec",
        "queries": {f"q{i:02d}": 0.123456 for i in range(12)},
        "sf": 0.1,
        "crawl": {"rounds": 6, "urls_dequeued": 130968,
                  "urls_fetched_ok": 109524, "wall_sec": 35.9,
                  "urls_per_sec": 3647.0, "extra_detail": "z" * 3000},
        "scaling": {
            **pair,
            "secondary_pair": dict(pair, config={"note": "n" * 500}),
            "secondary_pair_oversubscribed": pair,
            "machine_cpu_ceiling": {"it_per_sec": {"2": 1, "8": 2}},
            "per_cycle": [pair] * 6,
            "identical_output": True,
            "urls": 1000000,
        },
    }
    line = _json.dumps(bench._compact(result))
    assert len(line) < 2048, f"compact line too long: {len(line)}"
    out = _json.loads(line)
    assert {"metric", "value", "unit", "queries", "sf"} <= set(out)
    assert out["scaling"]["scaling_efficiency"] == 0.925
    assert out["scaling"]["secondary_pair"]["time_coherent"] is True
    assert out["scaling"]["identical_output"] is True
    assert "pair_passes" not in out["scaling"]
    assert "per_cycle" not in out["scaling"]
    # error path passes through verbatim
    err = bench._compact(dict(result, scaling={"error": "worker died"}))
    assert err["scaling"] == {"error": "worker died"}
