"""X4 — post-crawl HTML-table scraping (the payload-analysis slot).

Reference: tianalyser's country-representation table scrape
(example/tianalyser/internal/tianalyser/tianalyser.go:80-118): for every
stored page body, locate a table and emit one row per ``<tr>`` with cells
split/cleaned (``&nbsp;`` removal, comma-split player lists ≙ F10).

Re-expressed as an ``applyInPandas``-style batch pass (``mapInPandas`` here —
no grouping key needed): HTML parse in Python per Arrow batch, relational
output. This is the same plug-point the image decode/phash validation uses
(SURVEY.md §2.8 X4/X5).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

_TABLE_RE = re.compile(r"<table[^>]*>(.*?)</table>", re.IGNORECASE | re.DOTALL)
_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.IGNORECASE | re.DOTALL)
_TD_RE = re.compile(r"<t[dh][^>]*>(.*?)</t[dh]>", re.IGNORECASE | re.DOTALL)
_TD_ONLY_RE = re.compile(r"<td[^>]*>(.*?)</td>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")

SCRAPE_SCHEMA = (
    "url string, table_idx int, row_idx int, cells array<string>"
)


def _clean(cell: str) -> str:
    # tianalyser.go:101: NBSP removal; plus tag-strip + trim
    return _TAG_RE.sub("", cell).replace(" ", "").replace("&nbsp;", "").strip()


def extract_tables_py(html: str, td_only: bool = False) -> list[list[list[str]]]:
    """All tables → rows → cleaned cell texts (pure-Python core for tests).
    ``td_only`` skips ``<th>`` header cells — the reference's goquery selector
    ``Find("td")`` has the same behavior (tianalyser.go:97)."""
    cell_re = _TD_ONLY_RE if td_only else _TD_RE
    tables = []
    for tmatch in _TABLE_RE.finditer(html or ""):
        rows = []
        for rmatch in _TR_RE.finditer(tmatch.group(1)):
            cells = [_clean(c) for c in cell_re.findall(rmatch.group(1))]
            if cells:
                rows.append(cells)
        if rows:
            tables.append(rows)
    return tables


def scrape_tables(pages: DataFrame, url_col: str = "url",
                  body_col: str = "body_html", td_only: bool = False) -> DataFrame:
    """One output row per table row across all pages."""

    def run(batches):
        for pdf in batches:
            out = {"url": [], "table_idx": [], "row_idx": [], "cells": []}
            for r in pdf.itertuples():
                for ti, rows in enumerate(
                    extract_tables_py(getattr(r, body_col), td_only=td_only)
                ):
                    for ri, cells in enumerate(rows):
                        out["url"].append(getattr(r, url_col))
                        out["table_idx"].append(ti)
                        out["row_idx"].append(ri)
                        out["cells"].append(cells)
            yield pd.DataFrame(out)

    return pages.select(url_col, body_col).mapInPandas(run, schema=SCRAPE_SCHEMA)


def split_player_list(cell: str) -> list[str]:
    """F10 — comma-split + trim + drop-empty (tianalyser.go:104-110)."""
    return [p.strip() for p in cell.split(",") if p.strip()]


def country_representation(pages: DataFrame, url_col: str = "url",
                           body_col: str = "body_html") -> DataFrame:
    """X4 — tianalyser's country-representation analysis
    (tianalyser.go:80-118): flattened ``<td>`` cells taken 4 at a time as
    (row-number ignored, country, representation, comma-joined players) →
    one relational row per country, players split per F10. Cell cleaning
    (tag-strip, NBSP removal) matches the reference's goquery ``.Text()``
    plus its explicit NBSP ReplaceAll (tianalyser.go:101)."""
    cells = scrape_tables(pages, url_col, body_col, td_only=True)
    return cells.filter(F.size("cells") >= 4).select(
        "url",
        "table_idx",
        "row_idx",
        F.col("cells").getItem(1).alias("country"),
        F.col("cells").getItem(2).alias("representation"),
        F.filter(
            F.transform(F.split(F.col("cells").getItem(3), ","), lambda p: F.trim(p)),
            lambda p: p != "",
        ).alias("players"),
    )
