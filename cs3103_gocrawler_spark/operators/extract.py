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


def expand_blacklist_www(hosts) -> frozenset[str]:
    """SO3 — the reference blacklists every host with AND without the 'www.'
    prefix (example/explorer/internal/explorer/config.go:52-65)."""
    out = set()
    for h in hosts:
        h = h.strip()
        if not h:
            continue
        out.add(h)
        out.add(h[4:] if h.startswith("www.") else "www." + h)
    return frozenset(out)


def make_scoped_extractor(
    blacklist: frozenset[str] = frozenset(),
    blacklist_substrings: tuple[str, ...] = (),
    same_host: bool = False,
    path_includes: tuple[str, ...] = (),
):
    """X2 — the reference's pluggable ``LinkExtractor`` surface as an
    extractor factory: ``(base_url, body_html) -> sorted link list``. The
    three reference example apps are compositions of these scope filters:

    * explorer  — ``blacklist_substrings``: drop a link when its host and any
      entry contain each other (bidirectional substring,
      example/explorer/internal/explorer/linkextractor.go:34-42)
    * sitemapper — ``same_host=True``: keep only links on the fetched page's
      host (example/sitemapper/internal/sitemapper/linkextractor.go:26-43)
    * tianalyser — ``same_host=True`` + ``path_includes``: additionally the
      link path must contain an include substring
      (example/tianalyser/internal/tianalyser/linkextractor.go:33-53)

    The returned callable plugs into ``fetch_process(extractor=...)`` and
    ships to executors in the UDF closure; any user extractor with the same
    signature slots in identically (reference ``LinkExtractor`` field,
    linkextractor.go:14).
    """

    def extract(base_url: str, body_html: str) -> list[str]:
        base_host = split_canonical(base_url)[0] if same_host else None
        out = set()
        for href in _HREF_RE.findall(body_html or ""):
            cu = canonicalize_url(href, base=base_url)
            if cu is None:
                continue
            host, path = split_canonical(cu)
            if host in blacklist:
                continue
            if blacklist_substrings and any(
                b in host or host in b for b in blacklist_substrings
            ):
                continue
            if same_host and host != base_host:
                continue
            if path_includes and not any(p in path for p in path_includes):
                continue
            out.add(cu)
        return sorted(out)

    return extract


def make_extract_udf(blacklist: frozenset[str]):
    """Build the extractor UDF with the blacklist captured in the closure
    (ships to executors once per stage via task serialization)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def extract_links(url: pd.Series, body: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_links_py(u, b, blacklist) for u, b in zip(url, body)]
        )

    return extract_links
