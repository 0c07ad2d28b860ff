"""Response matchers P1-P6 (SURVEY.md §2.2) as Column predicates.

Reference: responsematcher.go:13-36 — pure functions of (status, headers).
The reference applies them as an ordered short-circuit conjunction
(crawler.go:153-158); predicates here are pure Columns so Catalyst's conjunct
evaluation gives the same semantics (P6).
"""

from __future__ import annotations

from functools import reduce
from operator import and_

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: N812


def is_noop_response() -> Column:  # responsematcher.go:13-15
    return F.lit(True)


def is_ok_response(status: Column | str = "status") -> Column:  # :18-20
    return F.col(status) == 200 if isinstance(status, str) else status == 200


def is_client_error_response(status: str = "status") -> Column:  # :23-25
    return F.col(status).between(400, 499)


def is_server_error_response(status: str = "status") -> Column:  # :28-30
    return F.col(status) >= 500


def is_html_content(status: str = "status", content_type: str = "content_type") -> Column:
    # responsematcher.go:34-36: 200 AND Content-Type contains "text/html"
    return is_ok_response(status) & F.col(content_type).contains("text/html")


_NAMED = {
    "noop": is_noop_response,
    "ok": is_ok_response,
    "client_error": is_client_error_response,
    "server_error": is_server_error_response,
    "html": is_html_content,
}


def conjunction(names: list[str]) -> Column:
    """P6 — ordered conjunction; empty list = accept-all (crawler.go:40-43)."""
    if not names:
        return is_noop_response()
    return reduce(and_, (_NAMED[n]() for n in names))


_PY_NAMED = {
    "noop": lambda s, ct: True,
    "ok": lambda s, ct: s == 200,
    "client_error": lambda s, ct: 400 <= s <= 499,
    "server_error": lambda s, ct: s >= 500,
    "html": lambda s, ct: s == 200 and "text/html" in (ct or ""),
}


def python_conjunction(names: list[str]):
    """Live-fetch twin of ``conjunction``: the same P1-P6 predicates
    (responsematcher.go:13-36) as a plain ``(status, content_type) -> bool``
    callable. Live HTTP mode only learns status/headers inside the Python
    fetch worker — after the Catalyst plan is fixed — so the matcher cannot
    be a Column there; these lambdas are kept in lockstep with ``_NAMED``."""
    fns = [_PY_NAMED[n] for n in names] or [_PY_NAMED["noop"]]

    def match(status: int, content_type: str) -> bool:
        return all(f(status, content_type) for f in fns)

    return match
