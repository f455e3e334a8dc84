"""Single-threaded reference oracle — a faithful simulation of the Go
crawler's observable semantics, used as the golden against which the Spark
engine's crawl order, seen set, documents and counts are asserted.

Semantics simulated (all file:line into /root/reference/):
- FIFO queue with push-time dedup, first-wins per canonical key
  (queue.go:54-84): the first URL *variant* seen for a key is fetched.
- limit+1 off-by-one: ``done > limit`` is checked before ``done++``, so
  exactly limit+1 pushes succeed (queue.go:64-67,80).
- After the first ErrLimitReached the worker stops parsing for the rest of
  the crawl (crawler.go:244-246,218-220) — already-queued URLs are still
  fetched (queue drain, queue.go:104-110) and their documents still stored
  (Process is called even when parse is a no-op, crawler.go:213).
- ``done`` counts attempted fetches including failures (crawler.go:175).
- Seeds bypass the accept filter; off-host seeds are enqueued and fail at
  fetch (crawler.go:184-186) — still counted.
- Sitemap entries are pushed before explicit seeds (crawler.go:313-331).
- Canonical crawl order = the single-worker order (the only deterministic
  configuration of the reference; SURVEY.md §7 "what's hard").

Extensions beyond the reference (the engine's scaled modes), implemented
here with identical ordering rules so they stay cross-checkable:
- ``multi_host``: seen key becomes ``host + key``; accept checks membership
  in the allowed host set.
- ``host_budget``: per-host per-round politeness budget (the batch
  realization of the 3s delay, crawler.go:22,176-178): each round takes at
  most ``budget`` frontier URLs per host in frontier order; the rest carry
  over ahead of newly discovered URLs (FIFO = push order preserved).
- ``priority``: frontier ordered by (priority desc, disc_order) before the
  budget cut; priority comes from sitemap entries (sitemap.go:96-101),
  inherited by discovered children.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

from .htmlparse import extract_links, extract_spans
from .purl import URL, accept as accept_url, normalize, normalize_key, parse_url


@dataclass
class CrawlRecord:
    url: str
    url_key: str
    round: int
    disc_order: int
    priority: float
    fetched_ok: bool = False
    status: int = 0


@dataclass
class OracleResult:
    order: List[CrawlRecord] = field(default_factory=list)
    seen: Set[str] = field(default_factory=set)
    documents: List[Tuple[str, list]] = field(default_factory=list)  # (doc_id, spans)
    counts: List[dict] = field(default_factory=list)  # per-round metrics
    visited: int = 0  # == pushed == Σ worker.done
    limit_reached: bool = False

    @property
    def order_tuples(self) -> List[Tuple[str, int, int]]:
        return [(r.url, r.round, r.disc_order) for r in self.order]


class _Limit(Exception):
    pass


def crawl(
    pages: Dict[Tuple[str, str], Tuple[int, Optional[str]]],
    seeds: Sequence[str],
    host: str,
    *,
    limit: int = 0,
    reject: Sequence[str] = (),
    accept: Sequence[str] = (),
    sitemap_entries: Sequence[Tuple[str, float]] = (),
    multi_host: bool = False,
    hosts: Optional[Set[str]] = None,
    host_budget: int = 0,
    priority_order: bool = False,
    max_rounds: int = 0,
    host_budgets: Optional[Dict[str, int]] = None,
    default_budget: int = 0,
    accept_fn=None,
    process_fn=None,
    remove_fn=None,
) -> OracleResult:
    """Run the reference-semantics crawl over a synthetic pages index.

    ``pages``: (host, url_key) → (status, html), see synth.pages_index.
    ``host``: the crawl host (single-host mode); ``hosts`` for multi-host.
    ``limit``: MaxEnqueue (0 = unlimited); exactly limit+1 pushes succeed.
    ``host_budget``: per-host per-round scheduling cap (0 = unlimited —
    reference-exact FIFO/BFS).
    ``host_budgets``/``default_budget``: per-host budget overrides (the
    robots crawl-delay realization): a host uses its ``host_budgets``
    entry, else ``host_budget`` if > 0, else ``default_budget``; all
    zero/absent ⇒ unbounded.
    User hooks (the reference's pluggable seams, applied identically by
    the Spark engine):
    ``accept_fn(url_str) -> bool`` REPLACES the default accept filter F1
    (IsAcceptedFunc, crawler.go:96-97); pre-fetch host guards still apply.
    ``process_fn(url_str, spans: list[dict]) -> list[dict]`` post-hook on
    each stored span document (ProcessFunc, crawler.go:99-100).
    ``remove_fn(ch) -> bool`` rune-removal pre-pass before whitespace
    normalization of span text (transform.RemoveFunc, transform.go:46).
    """
    res = OracleResult()
    allowed = hosts if multi_host else {host}

    def _budget_for(h: str) -> Optional[int]:
        if host_budgets and h in host_budgets:
            return host_budgets[h]
        if host_budget > 0:
            return host_budget
        if default_budget > 0:
            return default_budget
        return None  # unbounded

    frontier: List[CrawlRecord] = []  # unscheduled, frontier order

    def push(u: URL, rnd: int, prio: float) -> None:
        # Q1 — queue.go:54-84 (closed-check omitted: batch crawl never
        # closes mid-push; limit check precedes the dup check, so a push
        # attempt past the budget raises even for a would-be duplicate)
        if limit > 0 and res.visited > limit:
            raise _Limit()
        key = normalize_key(u)
        if multi_host:
            key = u.host + key
        if not key:
            return  # ErrEmptyURL — skipped, crawler.go:240-242
        if key in res.seen:
            return  # ErrDuplicateURL — first variant wins
        res.seen.add(key)
        rec = CrawlRecord(
            url=u.to_string(), url_key=key, round=rnd,
            disc_order=res.visited, priority=prio,
        )
        res.visited += 1
        frontier.append(rec)

    # Start(): sitemap entries first, then seeds; push errors only logged
    for loc, prio in sitemap_entries:
        u = parse_url(loc)
        if u is None:
            continue
        try:
            push(u, 0, prio)
        except _Limit:
            res.limit_reached = True
    for s in seeds:
        u = parse_url(s)
        if u is None:
            continue
        try:
            push(u, 0, 0.0)
        except _Limit:
            res.limit_reached = True

    rnd = 0
    while frontier:
        if max_rounds and rnd >= max_rounds:
            break
        # schedule this round: politeness budget per host (Q5)
        if priority_order:
            frontier.sort(key=lambda r: (-r.priority, r.disc_order))
        if host_budget > 0 or host_budgets or default_budget > 0:
            taken: Dict[str, int] = {}
            scheduled, carry = [], []
            for rec in frontier:
                h = parse_url(rec.url).host
                bud = _budget_for(h)
                if bud is None or taken.get(h, 0) < bud:
                    taken[h] = taken.get(h, 0) + 1
                    scheduled.append(rec)
                else:
                    carry.append(rec)
        else:
            scheduled, carry = list(frontier), []
        frontier = carry

        n_ok = n_fail = 0
        new_before = res.visited
        for rec in scheduled:
            rec.round = rnd
            u = parse_url(rec.url)
            # F3 pre-fetch guards + resolver fetch (crawler.go:184-190,27-57)
            ok = u.host in allowed and u.is_abs
            status, html = 0, None
            if ok:
                if multi_host:
                    pkey = normalize_key(u)
                else:
                    pkey = rec.url_key
                status, html = pages.get((u.host, pkey), (0, None))
                ok = status == 200
            rec.fetched_ok, rec.status = ok, status
            if ok:
                n_ok += 1
                # P4: Process hook runs even after limit (crawler.go:213)
                spans = extract_spans(u, html, remove_fn=remove_fn)
                span_dicts = [s._asdict() for s in spans]
                if process_fn is not None:
                    span_dicts = process_fn(rec.url, span_dicts)
                res.documents.append((rec.url, span_dicts))
                if not res.limit_reached:
                    for href in extract_links(html):
                        cand = normalize(u, href)
                        if cand is None:
                            continue
                        if accept_fn is not None:
                            # IsAcceptedFunc REPLACES the default filter
                            if not accept_fn(cand.to_string()):
                                continue
                        elif multi_host:
                            if cand.host not in allowed:
                                continue
                        elif not accept_url(cand, host, list(reject), list(accept)):
                            continue
                        try:
                            push(cand, rnd + 1, rec.priority)
                        except _Limit:
                            res.limit_reached = True
                            break  # stop parsing for the rest of the crawl
            else:
                n_fail += 1
            res.order.append(rec)

        res.counts.append(
            {
                "round": rnd,
                "scheduled": len(scheduled),
                "fetched_ok": n_ok,
                "failed": n_fail,
                "new_urls": res.visited - new_before,
            }
        )
        rnd += 1

    return res
