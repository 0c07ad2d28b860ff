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

_TABLE_RE = re.compile(r"<table[^>]*>(.*?)</table>", re.IGNORECASE | re.DOTALL)
_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.IGNORECASE | re.DOTALL)
_TD_RE = re.compile(r"<t[dh][^>]*>(.*?)</t[dh]>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")

SCRAPE_SCHEMA = (
    "url string, table_idx int, row_idx int, cells array<string>"
)


def _clean(cell: str) -> str:
    # tianalyser.go:101: NBSP removal; plus tag-strip + trim
    return _TAG_RE.sub("", cell).replace(" ", "").replace("&nbsp;", "").strip()


def extract_tables_py(html: str) -> list[list[list[str]]]:
    """All tables → rows → cleaned cell texts (pure-Python core for tests)."""
    tables = []
    for tmatch in _TABLE_RE.finditer(html or ""):
        rows = []
        for rmatch in _TR_RE.finditer(tmatch.group(1)):
            cells = [_clean(c) for c in _TD_RE.findall(rmatch.group(1))]
            if cells:
                rows.append(cells)
        if rows:
            tables.append(rows)
    return tables


def scrape_tables(pages: DataFrame, url_col: str = "url",
                  body_col: str = "body_html") -> DataFrame:
    """One output row per table row across all pages."""

    def run(batches):
        for pdf in batches:
            out = {"url": [], "table_idx": [], "row_idx": [], "cells": []}
            for r in pdf.itertuples():
                for ti, rows in enumerate(extract_tables_py(getattr(r, body_col))):
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
