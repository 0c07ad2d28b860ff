"""U3/X1 — link extraction (SURVEY.md §2.8).

Reference ``DefaultLinkExtractor`` (linkextractor.go:19-66): find ``<a href>``
attributes, resolve against the current URL, drop blacklisted hosts,
deduplicate, sort. Re-expressed as one Arrow-batched pandas UDF returning
``array<string>`` — HTML parse stays in Python (the one place it must), the
explode/fan-out stays JVM-side.

The regex href scan matches the generator's output and any well-formed
``<a ... href="...">`` / ``href='...'`` tag; a full HTML5 parser is a drop-in
replacement behind the same UDF signature (X2 plug-point).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql import types as T  # noqa: N812

from ..functions.urlfuncs import canonicalize_url, split_canonical

_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"']*)["']""", re.IGNORECASE)


def extract_links_py(base_url: str, body_html: str, blacklist: frozenset[str]) -> list[str]:
    """Pure-Python core shared with tests: canonical, blacklist-filtered,
    deduped, sorted (linkextractor.go:31-63 semantics)."""
    out = set()
    for href in _HREF_RE.findall(body_html or ""):
        cu = canonicalize_url(href, base=base_url)
        if cu is None or split_canonical(cu)[0] in blacklist:
            continue
        out.add(cu)
    return sorted(out)


def make_extract_udf(blacklist: frozenset[str]):
    """Build the extractor UDF with the blacklist captured in the closure
    (ships to executors once per stage via task serialization)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def extract_links(url: pd.Series, body: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_links_py(u, b, blacklist) for u, b in zip(url, body)]
        )

    return extract_links
