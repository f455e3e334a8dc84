"""Vectorized canonicalization ≡ pure-Python golden contract, over an
adversarial corpus (every href form, dot-segments, whitespace edges,
control chars, opaque schemes, ports, queries, fragments)."""

import pandas as pd
import pytest

from crawlspark.canon import pd_accept, pd_host, pd_resolve, pd_url_key
from crawlspark.purl import accept, normalize, normalize_key, parse_url

PARENTS = [
    "http://google.com",
    "http://google.com/sub",
    "http://google.com/sub/",
    "http://example.com:8080/a/b.html",
    "http://h.example/dir/page.html?x=1#frag",
    # escaped + raw non-ASCII parents: the decoded parent path re-enters
    # the constructed URL and must be re-escaped by the round-trip
    "http://google.com/caf%C3%A9/x",
    "http://google.com/á/b",
]

HREFS = [
    "http://google.com/search?q=golang",
    "search",
    "/search",
    "//google.com/search",
    "#fragment",
    "search?q=golang",
    "/search#fragment",
    "",
    ".",
    "..",
    "../up.html",
    "./here.html",
    "a/b/../c.html",
    "//cdn.example/img.png",
    "HTTPS://Upper.Example/Path",
    "mailto:user@example.com",
    "javascript:void(0)",
    " http://leading-space.example",
    "http://bad host.example/x",
    "tel:+1-555",
    "/a//b.html",
    "/trailing/",
    "page.html?a=1&b=2#s",
    "\x01bad",
    "sub page.html",
    "?query-only",
    "/;params",
    "p%20q.html",
    # percent-encoding edges (Go decodes into u.Path; invalid ⇒ skip)
    "http://h/a%20b",
    "http://h/%2e%2e/x",
    "http://h/bad%zz",
    "/x%41y",
    "%7Euser",
    "http://h/q?x=%20&y=%2",
    "http://h/a%2Fb",
    # raw non-ASCII: Go url.Parse decodes, String() percent-escapes paths
    # (ADVICE r2 — fast masks must exclude these, not emit verbatim)
    "http://h/café",
    "/café",
    "café",
    "//h2/é",
    "#fragé",
    "naïve/path?q=café",
    "http://h/ümlaut?q=ß",
    "http://hést.example/x",
]

URLS = [
    "http://h/",
    "http://h",
    "http://h/sub/",
    "http://h/a/../b",
    "http://h/a//b",
    "http://h/p?b=2&a=1",
    "http://h/p?",
    "http://h/p#f",
    "http://h/.",
    "http://h/..",
    "http://h/a/./b/",
    "http://example.com:8080/x",
    "http://h/%7Euser/page",
    "http://h/p;semi?q=1",
    "http://h/café",
    "http://h/caf%C3%A9",
    "http://h/á/../b",
    "http://h/p?café=é",
]


def test_pd_url_key_matches_purl():
    s = pd.Series(URLS + [p for p in PARENTS])
    got = pd_url_key(s)
    for raw, g in zip(s, got):
        u = parse_url(raw)
        want = normalize_key(u) if u else None
        assert g == want, f"url_key mismatch for {raw!r}: {g!r} != {want!r}"


def test_pd_resolve_matches_purl():
    rows = [(p, h) for p in PARENTS for h in HREFS]
    parents = pd.Series([r[0] for r in rows])
    hrefs = pd.Series([r[1] for r in rows])
    got = pd_resolve(parents, hrefs)
    for (p, h), g in zip(rows, got):
        u = normalize(parse_url(p), h)
        want = u.to_string() if u is not None else None
        assert g == want, f"resolve mismatch for parent={p!r} href={h!r}: {g!r} != {want!r}"


def test_pd_host_matches_purl():
    s = pd.Series(URLS + HREFS)
    got = pd_host(s)
    for raw, g in zip(s, got):
        u = parse_url(raw)
        want = u.host if u is not None else ""
        if u is None:
            continue  # fast host extraction is only consumed for valid urls
        assert g == want, f"host mismatch for {raw!r}: {g!r} != {want!r}"


def test_pd_accept_matches_purl():
    reject = ["notwant", r"/index\.html"]
    acc = [r"\.html$", "search"]
    urls = [
        "http://example.com/site1.html",
        "http://example.com/index.html",
        "http://example.com/notwant.html",
        "http://other.com/site1.html",
        "http://example.com/search?q=1",
        "http://example.com/plain",
    ]
    s = pd.Series(urls)
    for rej, ac in [(reject, acc), ([], []), (reject, []), ([], acc)]:
        got = pd_accept(s, "example.com", rej, ac)
        for raw, g in zip(urls, got):
            want = accept(parse_url(raw), "example.com", rej, ac)
            assert bool(g) == want, f"accept mismatch {raw!r} rej={rej} acc={ac}"


def test_pd_url_key_null_and_empty():
    got = pd_url_key(pd.Series([None, "", "http://h/x"]))
    assert got.iloc[0] is None
    assert got.iloc[1] == "/"  # Go: Parse("") → empty URL → key "/"
    assert got.iloc[2] == "/x"


def test_parse_empty_string():
    # reference: Parse("") succeeds with empty URL; normalizeKey → "/"
    u = parse_url("")
    assert u is not None and normalize_key(u) == "/"
