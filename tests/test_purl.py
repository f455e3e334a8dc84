"""Golden vectors for U1/U2/U3 + F1, ported verbatim from the reference
tests (/root/reference/url_test.go:8-85, crawler_test.go:93-143)."""

import pytest

from crawlspark.purl import (
    accept,
    clean_path,
    join_host,
    normalize,
    normalize_key,
    parse_url,
    url_key_of,
)

# url_test.go:8-43 — parent http://google.com (empty path)
VECTORS_ROOT = [
    ("http://google.com/search?q=golang", "http://google.com/search?q=golang"),
    ("http://google.com/search", "http://google.com/search"),
    ("http://google.com", "http://google.com"),
    ("/search", "http://google.com/search"),
    ("search", "http://google.com/search"),
    ("/search#fragment", "http://google.com/search#fragment"),
    ("/search?q=golang", "http://google.com/search?q=golang"),
    ("search?q=golang", "http://google.com/search?q=golang"),
    ("#fragment", "http://google.com#fragment"),
    ("//google.com/search", "http://google.com/search"),
]

# url_test.go:45-80 — parent http://google.com/sub (parent path acts as
# base DIRECTORY — the non-RFC quirk: "search" → /sub/search)
VECTORS_SUB = [
    ("http://google.com/sub/search?q=golang", "http://google.com/sub/search?q=golang"),
    ("http://google.com/sub/search", "http://google.com/sub/search"),
    ("http://google.com/sub", "http://google.com/sub"),
    ("/search", "http://google.com/search"),
    ("search", "http://google.com/sub/search"),
    ("/search#fragment", "http://google.com/search#fragment"),
    ("/search?q=golang", "http://google.com/search?q=golang"),
    ("search?q=golang", "http://google.com/sub/search?q=golang"),
    ("#fragment", "http://google.com/sub#fragment"),
    ("//google.com/sub/search", "http://google.com/sub/search"),
]


@pytest.mark.parametrize("href,want", VECTORS_ROOT)
def test_normalize_root_parent(href, want):
    parent = parse_url("http://google.com")
    got = normalize(parent, href)
    assert got is not None and got.to_string() == want


@pytest.mark.parametrize("href,want", VECTORS_SUB)
def test_normalize_sub_parent(href, want):
    parent = parse_url("http://google.com/sub")
    got = normalize(parent, href)
    assert got is not None and got.to_string() == want


def test_normalize_trailing_slash_parent():
    # parent path "/sub/" — join() Cleans it, so same as "/sub"
    parent = parse_url("http://google.com/sub/")
    got = normalize(parent, "search")
    assert got.to_string() == "http://google.com/sub/search"


def test_normalize_unparseable_href_skipped():
    parent = parse_url("http://google.com")
    assert normalize(parent, "http://goo\x7fgle.com") is None


# Go path.Clean vectors (path/path_test.go semantics, subset the engine hits)
@pytest.mark.parametrize(
    "path,want",
    [
        ("", "."),
        ("abc", "abc"),
        ("abc/def", "abc/def"),
        ("a/b/c", "a/b/c"),
        (".", "."),
        ("..", ".."),
        ("../..", "../.."),
        ("/", "/"),
        ("/abc", "/abc"),
        ("abc/", "abc"),
        ("abc/def/", "abc/def"),
        ("/abc/def/", "/abc/def"),
        ("//abc", "/abc"),
        ("abc//def", "abc/def"),
        ("abc/./def", "abc/def"),
        ("/./abc/def", "/abc/def"),
        ("abc/..", "."),
        ("abc/def/..", "abc"),
        ("abc/def/../..", "."),
        ("abc/def/../../..", ".."),
        ("/abc/def/../../..", "/"),
        ("/../abc", "/abc"),
        ("abc/../../def", "../def"),
    ],
)
def test_clean_path(path, want):
    assert clean_path(path) == want


@pytest.mark.parametrize(
    "host,name,want",
    [
        ("google.com", "", "google.com"),
        ("google.com", "/", "google.com"),
        ("google.com", ".", ""),
        ("google.com", "/sub", "google.com/sub"),
        ("google.com", "//sub/", "google.com/sub"),
        ("google.com", "/sub/./x", "google.com/sub/x"),
    ],
)
def test_join_host(host, name, want):
    assert join_host(host, name) == want


# U3 — normalizeKey consequences (url.go:52-72)
@pytest.mark.parametrize(
    "url,want",
    [
        ("http://h", "/"),
        ("http://h/", "/"),
        ("http://h/sub/", "/sub"),
        ("http://h/sub", "/sub"),
        ("http://h/page#frag", "/page"),
        ("http://h/a/../b", "/b"),
        ("http://h/a//b", "/a/b"),
        ("http://h/p?b=2&a=1", "/p?b=2&a=1"),  # query verbatim, unsorted
        ("http://h/p?", "/p"),  # empty rawquery dropped
        ("http://h/.", "/"),
    ],
)
def test_normalize_key(url, want):
    assert normalize_key(parse_url(url)) == want
    assert url_key_of(url) == want


# F1 — crawler_test.go:93-143 matrix
REJECT = ["http://example.com/index.html", "http://example.com/notwant*"]
ACCEPT = [
    r"http://example.com/site1\.html",
    r"http://example.com/site2\.html",
    "http://example.com/index1*",
]


@pytest.mark.parametrize(
    "url",
    [
        "http://google.com",
        "http://example.com/index.html",
        "http://example.com/notwant",
        "http://example.com/notwant1",
        "http://example.com/notwant2",
        "http://example.com/site3.html",
    ],
)
def test_accept_rejects(url):
    assert not accept(parse_url(url), "example.com", REJECT, ACCEPT)


@pytest.mark.parametrize(
    "url",
    [
        "http://example.com/site1.html",
        "http://example.com/xnotwan",
        "http://example.com/index1.html",
    ],
)
def test_accept_all_when_empty(url):
    assert accept(parse_url(url), "example.com", REJECT, [])


@pytest.mark.parametrize(
    "url",
    [
        "http://example.com/site1.html",
        "http://example.com/site2.html",
        "http://example.com/index1.html",
    ],
)
def test_accept_list(url):
    assert accept(parse_url(url), "example.com", REJECT, ACCEPT)


def test_accept_empty_host_raises():
    with pytest.raises(ValueError):
        accept(parse_url("http://example.com"), "", [], [])


def test_accept_host_includes_port():
    assert not accept(parse_url("http://example.com:8080/x"), "example.com", [], [])
    assert accept(parse_url("http://example.com:8080/x"), "example.com:8080", [], [])
