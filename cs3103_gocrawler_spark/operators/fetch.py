"""U2/J4/S2-S5 — the fetch stage (SURVEY.md §2.1).

Real mode (a live crawl) would run HTTP GETs inside ``mapInPandas`` batches —
one connection pool per executor slot, retry+backoff per element
(rhttp.go:45-63). In the synthetic-web mode that all tests/benches use, the
"network" is the generator's pages table, so the fetch becomes a *join*:

    dequeued(url, ...) LEFT JOIN pages(image_id → url, status, content_type,
    body_html) — a repartition join; on Iceberg both sides are bucketed by
    the same key so it is a storage-partitioned join with no full shuffle
    (SURVEY.md §4.2.5). Payload ``bytes`` are deliberately NOT selected here —
    they never enter this shuffle (§4.2 spill discipline); the validation
    stage re-joins for them separately.

The post-join enrich stage runs in ``mapInPandas`` exactly where live HTTP
would: it computes the deterministic synthetic response time (webgen
page_resp_ms) and simulates the retry/backoff loop for 5xx rows
(functions/backoff.py) — same batch shape, same UDF signature as real mode.
DNS (S5) in synthetic mode is the deterministic host→fake-IP mapping used by
the geo-enrichment dimension join (J6) in plans/report.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..functions.backoff import total_retry_backoff_ms
from ..synthetic.webgen import page_resp_ms

FETCH_COLS = ("image_id", "status", "content_type", "body_html")


PAYLOAD_COLS = ("bytes", "w", "h", "fmt", "caption", "phash")


def synthetic_fetch(
    dequeued: DataFrame,
    pages: DataFrame,
    max_retries: int = 3,
    resp_seed: int = 42,
    backoff_policy: str = "exponential",
    with_payload: bool = False,
) -> DataFrame:
    """Fetch-join + enrich. Output adds: found(bool), status, content_type,
    body_html, resp_ms, attempts, backoff_ms, partition_id (lineage).

    ``with_payload=True`` carries the image payload columns through so the
    validation stage runs inline in the same pass (no second join against the
    pages table; the payload reaches a Python worker exactly once — in a real
    crawl this is where the HTTP body lands anyway)."""
    cols = ["status", "content_type", "body_html"] + (
        list(PAYLOAD_COLS) if with_payload else []
    )
    pruned = pages.select(F.col("image_id").alias("url"), *cols)
    joined = dequeued.join(pruned, "url", "left").withColumn(
        "found", F.col("status").isNotNull()
    )

    in_schema = joined.schema
    out_schema = (
        in_schema.simpleString()[7:-1]  # strip struct<...>
        + ",resp_ms bigint,attempts int,backoff_ms bigint"
    )

    def enrich(batches):
        # real mode: open one requests.Session here, reused across batches
        # (iterator-of-batches pattern, SURVEY.md §4.1 connection reuse)
        for pdf in batches:
            resp, att, back = [], [], []
            for url, status, found in zip(pdf["url"], pdf["status"], pdf["found"]):
                if not found:
                    resp.append(0)
                    att.append(int(max_retries) + 1)  # transport error: all retries burned
                    back.append(0)
                    continue
                a, b = total_retry_backoff_ms(
                    int(status), max_retries, key=url, policy=backoff_policy
                )
                resp.append(page_resp_ms(resp_seed, url))
                att.append(a)
                back.append(b)
            yield pdf.assign(resp_ms=resp, attempts=att, backoff_ms=back)

    return joined.mapInPandas(enrich, schema=out_schema).withColumn(
        "partition_id", F.spark_partition_id()
    )
