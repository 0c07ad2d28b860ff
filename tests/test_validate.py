"""Payload validation invariants (BASELINE.json input_hint, SURVEY §5.2.4)."""

from pyspark.sql import functions as F  # noqa: N812

from cs3103_gocrawler_spark.operators.validate import validate_payloads
from cs3103_gocrawler_spark.streaming.rounds import CrawlConfig, CrawlEngine


def test_all_generated_payloads_validate(spark, tiny_web):
    cfg_web, web_dir = tiny_web
    pages = spark.read.parquet(f"{web_dir}/pages.parquet")
    res = validate_payloads(pages, gen_seed=cfg_web.seed).toPandas()
    assert len(res) == cfg_web.n_pages
    assert res["valid"].all(), res[~res["valid"]].head()
    lossy = res[res["fmt"] != "png"]
    assert (lossy["psnr_db"] >= 40.0).all()
    assert (lossy["psnr_db"] < 1e6).all()  # genuinely lossy, not exact


def test_corrupted_payload_detected(spark, tiny_web):
    cfg_web, web_dir = tiny_web
    pages = spark.read.parquet(f"{web_dir}/pages.parquet").limit(5)
    corrupted = pages.withColumn(
        "caption", F.concat(F.col("caption"), F.lit(" TAMPERED"))
    )
    res = validate_payloads(corrupted, gen_seed=cfg_web.seed).toPandas()
    assert (~res["caption_ok"]).all()
    assert (~res["valid"]).all()


def test_engine_validation_table(spark, tiny_web, tmp_path):
    cfg_web, web_dir = tiny_web
    pages = spark.read.parquet(f"{web_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{web_dir}/seeds.parquet")
    cfg = CrawlConfig(max_depth=3, blacklist_hosts=cfg_web.blacklist_hosts,
                      validate=True, gen_seed=cfg_web.seed)
    eng = CrawlEngine(spark, pages, cfg, str(tmp_path / "v"))
    eng.init_frontier(seeds)
    eng.run()
    val = eng.validation_df().toPandas()
    vis = eng.visited_df().toPandas()
    assert set(val["url"]) == set(vis["url"])
    assert val["valid"].all()
