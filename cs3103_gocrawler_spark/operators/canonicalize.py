"""U1 — vectorized URL canonicalize + hash (SURVEY.md §2.10).

Replaces the reference's ``url.Parse`` call sites (crawler.go:116-120,
linkextractor.go:39-49) with one Arrow-batched pandas UDF returning a struct,
so host/path/sha1 ride along as columns (no per-row Python, per input_hint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql import types as T  # noqa: N812

from ..functions.urlfuncs import canonicalize_url, sha1_64, split_canonical

CANON_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("url_sha1", T.LongType()),
])


@F.pandas_udf(CANON_SCHEMA)
def canon_struct(urls: pd.Series) -> pd.DataFrame:
    out = {"url": [], "host": [], "path": [], "url_sha1": []}
    for u in urls:
        cu = canonicalize_url(u) if u is not None else None
        if cu is None:
            out["url"].append(None)
            out["host"].append(None)
            out["path"].append(None)
            out["url_sha1"].append(None)
        else:
            host, path = split_canonical(cu)
            out["url"].append(cu)
            out["host"].append(host)
            out["path"].append(path)
            out["url_sha1"].append(sha1_64(cu))
    return pd.DataFrame(out)


# Deterministic in fact, but declared nondeterministic so Catalyst pins it to
# ONE evaluation: the filter on _c.url plus the projection of _c's fields
# otherwise split into two stacked ArrowEvalPython nodes — the UDF (and its
# Arrow pipe traffic) ran twice per row.
_canon_struct_once = canon_struct.asNondeterministic()


def with_canonical(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Replace ``url_col`` with its canonical form + host/path/url_sha1
    columns; drops rows whose URL is unparsable or non-http(s)."""
    c = df.withColumn("_c", _canon_struct_once(F.col(url_col)))
    return (
        c.filter(F.col("_c.url").isNotNull())
        .withColumn(url_col, F.col("_c.url"))
        .withColumn("host", F.col("_c.host"))
        .withColumn("path", F.col("_c.path"))
        .withColumn("url_sha1", F.col("_c.url_sha1"))
        .drop("_c")
    )
