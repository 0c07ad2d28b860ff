"""Sequential pure-Python oracle of the reference crawl semantics (SURVEY §5.2.2).

The Go reference's output is goroutine-interleaving-dependent (SURVEY.md §1.3);
this oracle fixes the deterministic resolution our Spark engine must match:

* **BFS micro-batch rounds** — one round = one wave of fetches; the reference's
  recursion tree (crawler.go:86-109) replayed breadth-first.
* **Depth off-by-one** — user ``max_depth = d`` means the stored cap is ``d-1``
  (crawler.go:59) and the child guard is ``next_depth > cap`` (crawler.go:93):
  seeds always fetched; children enqueued iff ``child_depth <= d-1``.
* **Fetch-once** — the reference's racy check-then-fetch (crawler.go:74-79,
  97-102) becomes exact: a URL is dequeued at most once, ever. URLs whose
  fetch fails (dangling) or whose response fails the matchers
  (responsematcher.go:34-36 — non-200 / non-HTML after retries) enter a
  ``rejected`` set: never visited (matching the reference's final state —
  e.g. rss.xml absent from sitemap_yusufaine.dev.json) and never re-fetched
  (documented divergence: the reference may fetch them repeatedly).
* **min-(depth, parent) tie-break** — competing discoveries of a pending URL
  keep the lexicographically smallest ``(depth, parent)`` (crawler.go:141-144,
  262-272 first-writer-wins made deterministic).
* **Politeness** — the reference's single global token bucket (crawler.go:57,
  105) generalizes to a per-host budget of B dequeues per round; within a host
  the dequeue order is ``(priority asc, depth asc, url asc)`` (W2/W3).
  ``budget=None`` = unlimited (pure BFS).
* **Robots gating** (target-only, north_rule): a URL whose path starts with a
  disallowed prefix for its host is dropped at admission (never enqueued).
* **Host aggregates** — per sitemapper report semantics
  (example/sitemapper/internal/sitemapper/sitemap.go:35-48): paths/response
  times of *successful* fetches only; ``avg = total // max(1, path_count)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.urlfuncs import canonicalize_url, url_host, url_path
from ..synthetic.webgen import page_resp_ms


@dataclass
class OracleResult:
    visited: dict = field(default_factory=dict)      # url -> {depth, parent, links}
    rejected: dict = field(default_factory=dict)     # url -> reason
    order: list = field(default_factory=list)        # (host, seq, url) per-host fetch order
    host_stats: dict = field(default_factory=dict)   # host -> {path_count, visited_paths, total_response_ms, avg_response_ms}
    rounds: list = field(default_factory=list)       # per-round {round_id, dequeued, fetched_ok, rejected, new_urls, deferred}


def _extract_links(body_links: list[str], blacklist: set[str], base: str,
                   blacklist_substrings: tuple[str, ...] = (),
                   same_host: bool = False,
                   path_includes: tuple[str, ...] = ()) -> list[str]:
    """Reference DefaultLinkExtractor semantics (linkextractor.go:19-66):
    canonicalize, drop unparsable/non-http(s), drop blacklisted hosts,
    dedupe, sort — plus the example-app scope filters (P8/P9/P10, same
    semantics as operators.extract.make_scoped_extractor)."""
    base_host = url_host(base) if same_host else None
    out = set()
    for href in body_links:
        cu = canonicalize_url(href, base=base)
        if cu is None:
            continue
        host = url_host(cu)
        if host in blacklist:
            continue
        if blacklist_substrings and any(
            b in host or host in b for b in blacklist_substrings
        ):
            continue
        if same_host and host != base_host:
            continue
        if path_includes and not any(p in url_path(cu) for p in path_includes):
            continue
        out.add(cu)
    return sorted(out)


def _robots_blocked(url: str, robots: dict[str, list[str]]) -> bool:
    prefixes = robots.get(url_host(url))
    if not prefixes:
        return False
    path = url_path(url)
    return any(path.startswith(p) for p in prefixes)


def crawl_oracle(
    pages: dict[str, dict],
    links_by_src: dict[str, list[str]],
    seeds: list[tuple[str, int]],
    max_depth: int,
    budget_per_host: int | None = None,
    blacklist: set[str] | None = None,
    robots: dict[str, list[str]] | None = None,
    require_html: bool = True,
    max_rounds: int = 10_000,
    resp_seed: int = 42,
    blacklist_substrings: tuple[str, ...] = (),
    same_host: bool = False,
    path_includes: tuple[str, ...] = (),
    carryover: bool = False,
    crawl_delays: dict[str, int] | None = None,
    round_target_ms: int = 1000,
) -> OracleResult:
    """Run the sequential crawl.

    ``pages``: canonical_url -> {status, content_type} (+ anything else).
    ``links_by_src``: canonical_url -> raw outgoing hrefs (generated order).
    ``seeds``: (url, priority) pairs. ``max_depth``: the *user* value d —
    pages at depth 0..d-1 are fetched (seed = depth 0).
    """
    blacklist = blacklist or set()
    robots = robots or {}
    res = OracleResult()
    depth_cap = max_depth - 1  # crawler.go:59
    # ST5 token carryover: per-host fractional balance, refilled by one
    # budget per round, stores at most one budget (burst ≙ the reference's
    # rate.NewLimiter(MaxRPS, 1) scaled to rounds, crawler.go:57,105)
    balances: dict[str, float] = {}

    # pending: url -> [depth, parent, priority]; min-(depth,parent) merged
    pending: dict[str, list] = {}
    seen: set[str] = set()
    host_seq: dict[str, int] = {}

    for raw, prio in seeds:
        cu = canonicalize_url(raw)
        if cu is None or url_host(cu) in blacklist or _robots_blocked(cu, robots):
            continue
        if cu not in pending or (0, "") < tuple(pending[cu][:2]):
            pending[cu] = [0, "", prio]

    for round_id in range(max_rounds):
        if not pending:
            break
        # per-host dequeue: order (priority, depth, url), take first B
        by_host: dict[str, list[str]] = {}
        for u in pending:
            by_host.setdefault(url_host(u), []).append(u)
        dequeued: list[tuple[str, str]] = []  # (host, url) in deterministic order
        for host in sorted(by_host):
            urls = sorted(by_host[host], key=lambda u: (pending[u][2], pending[u][0], u))
            # robots crawl_delay cap (engine CrawlConfig.round_target_ms):
            # a host pacing one request per d ms fits max(1, target//d)
            # fetches into a round — the floor of 1 guarantees progress
            cap = None
            if crawl_delays:
                dly = int(crawl_delays.get(host, 0) or 0)
                if dly > 0:
                    cap = max(1, round_target_ms // dly)
            if budget_per_host is None:
                take = urls if cap is None else urls[:cap]
            elif carryover:
                allowance = balances.get(host, 0.0) + float(budget_per_host)
                k = int(allowance)  # floor
                take = urls[: k if cap is None else min(k, cap)]
            else:
                take = urls[: budget_per_host if cap is None else min(budget_per_host, cap)]
            for u in take:
                dequeued.append((host, u))
        if carryover and budget_per_host is not None:
            b = float(budget_per_host)
            n_by_host: dict[str, int] = {}
            for host, _u in dequeued:
                n_by_host[host] = n_by_host.get(host, 0) + 1
            for host in set(balances) | set(by_host):
                allowance = balances.get(host, 0.0) + b
                balances[host] = min(allowance - n_by_host.get(host, 0), b)

        fetched_ok = rejected_n = 0
        new_children: list[tuple[str, int, str, int]] = []  # (url, depth, parent, prio)
        for host, u in dequeued:
            depth, parent, prio = pending.pop(u)
            seen.add(u)
            page = pages.get(u)
            if page is None:
                res.rejected[u] = "fetch_error"
                rejected_n += 1
                continue
            if require_html and not (
                page["status"] == 200 and "text/html" in page["content_type"]
            ):
                res.rejected[u] = "matcher"
                rejected_n += 1
                continue
            links = _extract_links(
                links_by_src.get(u, []), blacklist, base=u,
                blacklist_substrings=blacklist_substrings,
                same_host=same_host, path_includes=path_includes,
            )
            res.visited[u] = {"depth": depth, "parent": parent, "links": links}
            seq = host_seq.get(host, 0)
            res.order.append((host, seq, u))
            host_seq[host] = seq + 1
            st = res.host_stats.setdefault(
                host,
                {"paths": set(), "total_response_ms": 0},
            )
            st["paths"].add(url_path(u))
            st["total_response_ms"] += page_resp_ms(resp_seed, u)
            fetched_ok += 1
            child_depth = depth + 1
            if child_depth <= depth_cap:  # crawler.go:92-95 guard
                for link in links:
                    new_children.append((link, child_depth, u, prio))

        new_urls = 0
        for link, d, parent, prio in new_children:
            if link in seen or _robots_blocked(link, robots):
                continue
            if link in pending:
                if (d, parent) < tuple(pending[link][:2]):
                    pending[link][0], pending[link][1] = d, parent
                pending[link][2] = min(pending[link][2], prio)
            else:
                pending[link] = [d, parent, prio]
                new_urls += 1

        if dequeued:  # 0-dequeue rounds (all balances < 1) mirror the
            # engine's metrics filter (metrics_df drops them)
            res.rounds.append({
                "round_id": round_id,
                "dequeued": len(dequeued),
                "fetched_ok": fetched_ok,
                "rejected": rejected_n,
                "new_urls": new_urls,
                "deferred": len(pending) - new_urls,
            })

    for host, st in res.host_stats.items():
        paths = sorted(st.pop("paths"))
        st["visited_paths"] = paths
        st["path_count"] = len(paths)
        # sitemap.go:43-48: average over distinct paths, guard div-by-zero → 1
        st["avg_response_ms"] = st["total_response_ms"] // max(1, len(paths))
    return res


def pages_dict_from_pandas(pages_pdf, edges_pdf) -> tuple[dict, dict]:
    """Adapt webgen output to oracle inputs."""
    pages = {
        r.image_id: {"status": int(r.status), "content_type": r.content_type}
        for r in pages_pdf.itertuples()
    }
    links: dict[str, list[str]] = {}
    for r in edges_pdf.itertuples():
        links.setdefault(r.src, []).append(r.dst)
    return pages, links
