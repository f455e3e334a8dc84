"""Oracle semantics tests — the golden the Spark engine is later asserted
against. Pins the reference behaviors: 16-visit integration golden
(integration_test.go:38-59), limit+1 off-by-one (queue.go:64-67), failures
counted (crawler.go:175), first-wins dedup, budget carryover."""

from crawlspark.oracle import crawl
from crawlspark.synth import basic16, chain, pages_index, powerlaw, richsite


def test_basic16_golden():
    pages, seeds = basic16()
    res = crawl(pages_index(pages), seeds, "example.com")
    assert res.visited == 16  # == filepath.Walk count in the reference test
    assert len(res.seen) == 16
    # discovery order: site1's sub2-0..3 precede sub1-0, then sub2-4..9
    urls = [r.url for r in res.order]
    assert urls[0] == "http://example.com"
    assert urls[5] == "http://example.com/sub2/sub2-0.html"
    assert urls[9] == "http://example.com/sub1/sub1-0.html"
    assert urls[15] == "http://example.com/sub2/sub2-9.html"
    assert all(r.fetched_ok for r in res.order)


def test_limit_plus_one():
    pages, seeds = basic16()
    res = crawl(pages_index(pages), seeds, "example.com", limit=5)
    # done > limit checked BEFORE increment ⇒ exactly limit+1 pushes succeed
    assert res.visited == 6
    assert res.limit_reached
    assert len(res.order) == 6  # queued URLs drain and are all fetched
    # documents still produced for post-limit fetches (Process still runs)
    assert len(res.documents) == 6


def test_limit_larger_than_graph():
    pages, seeds = basic16()
    res = crawl(pages_index(pages), seeds, "example.com", limit=1000)
    assert res.visited == 16
    assert not res.limit_reached


def test_failed_fetches_counted():
    pages, seeds = richsite()
    res = crawl(pages_index(pages), seeds, "rich.example")
    # dead link (/dead/404.html) and non-RFC-resolved next-links are
    # attempted and counted even though they fail
    assert any(not r.fetched_ok for r in res.order)
    assert res.visited == len(res.order)
    fail_statuses = {r.status for r in res.order if not r.fetched_ok}
    assert 404 in fail_statuses  # explicit 404 row
    assert 0 in fail_statuses  # missing page


def test_offhost_seed_counted_but_fails():
    pages, seeds = basic16()
    res = crawl(pages_index(pages), seeds + ["http://other.com/x"], "example.com")
    assert res.visited == 17
    bad = [r for r in res.order if r.url == "http://other.com/x"]
    assert len(bad) == 1 and not bad[0].fetched_ok


def test_fragment_variants_dedup_first_wins():
    pages, seeds = richsite()
    res = crawl(pages_index(pages), seeds, "rich.example")
    # /articles/a3.html#section-3 and /articles/a3.html share a key;
    # only one entry exists and it is the first-discovered variant
    a3 = [r for r in res.order if r.url_key == "/articles/a3.html"]
    assert len(a3) == 1
    assert a3[0].url == "http://rich.example/articles/a3.html#section-3"


def test_query_is_part_of_key():
    pages, seeds = richsite()
    res = crawl(pages_index(pages), seeds, "rich.example")
    keys = {r.url_key for r in res.order}
    assert "/articles/a4.html?ref=home" in keys  # distinct from /articles/a4.html


def test_chain_rounds():
    pages, seeds = chain(10)
    res = crawl(pages_index(pages), seeds, "chain.example")
    assert res.visited == 10
    assert [r.round for r in res.order] == list(range(10))


def test_host_budget_carryover_order():
    pages, seeds = basic16()
    res = crawl(pages_index(pages), seeds, "example.com", host_budget=3)
    full = crawl(pages_index(pages), seeds, "example.com")
    # same seen set and same disc_order sequence; only round boundaries move
    assert res.seen == full.seen
    assert [r.disc_order for r in sorted(res.order, key=lambda r: r.disc_order)] == list(range(16))
    assert max(r.round for r in res.order) > max(r.round for r in full.order)
    # within each round at most 3 scheduled
    assert all(c["scheduled"] <= 3 for c in res.counts)
    # carryover precedes fresh discoveries: processing order is still by
    # disc_order (FIFO = push order) in non-priority mode
    assert [r.disc_order for r in res.order] == sorted(r.disc_order for r in res.order)


def test_multi_host_powerlaw():
    pages, seeds = powerlaw(n_pages=300, n_hosts=5, seed=7)
    hosts = {p["host"] for p in pages}
    res = crawl(
        pages_index(pages), seeds, "", multi_host=True, hosts=hosts, host_budget=20
    )
    assert res.visited > len(seeds)
    assert all(r.url_key[0] != "/" for r in res.order)  # keys host-prefixed
    # determinism: run twice, identical order
    res2 = crawl(
        pages_index(pages), seeds, "", multi_host=True, hosts=hosts, host_budget=20
    )
    assert res.order_tuples == res2.order_tuples


def test_sitemap_entries_precede_seeds_and_priority_mode():
    pages, seeds = basic16()
    sm = [("http://example.com/site2.html", 0.9)]
    res = crawl(pages_index(pages), seeds, "example.com", sitemap_entries=sm)
    assert res.order[0].url == "http://example.com/site2.html"
    assert res.order[0].disc_order == 0
    assert res.visited == 16

    prio = crawl(
        pages_index(pages), seeds, "example.com",
        sitemap_entries=sm, host_budget=2, priority_order=True,
    )
    assert prio.seen == res.seen
