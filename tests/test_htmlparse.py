"""P2/P4 extraction contract tests (crawler.go:217-263 link semantics; span
contract per SURVEY.md §2.4 / FIXTURES.md §5)."""

from crawlspark.htmlparse import extract_links, extract_spans
from crawlspark.purl import parse_url

PAGE = parse_url("http://example.com/dir/page.html")


def test_links_document_order_and_duplicates():
    html = """<html><body>
    <a href="/a">A</a>
    <div><a href="b.html">B</a></div>
    <a href="/a">dup kept (queue dedups, not parser)</a>
    <a href="">empty skipped</a>
    <a>no href</a>
    <a href="/c" href="/d">repeated attr: both emitted</a>
    </body></html>"""
    assert extract_links(html) == ["/a", "b.html", "/a", "/c", "/d"]


def test_links_nested_anchor_children_walked():
    html = '<a href="/outer"><span><a href="/inner">x</a></span></a>'
    assert extract_links(html) == ["/outer", "/inner"]


def test_links_none_for_unparseable():
    assert extract_links(None) == []


def test_spans_interleaved_order():
    html = """<html><body>
    <p>Hello,   world</p>
    <img src="/img/a.png">
    <p>tail\r\ntext</p>
    <video src="clip.mp4"></video>
    <script>var x = 1;</script>
    <p>   </p>
    </body></html>"""
    spans = extract_spans(PAGE, html)
    assert [(s.kind, s.text, s.media_ref) for s in spans] == [
        ("text", "Hello, world", ""),
        ("media", "", "http://example.com/img/a.png"),
        ("text", "tail\ntext", ""),
        # relative src resolves against the full parent path as directory
        ("media", "", "http://example.com/dir/page.html/clip.mp4"),
    ]
    assert [s.offset for s in spans] == [0, 1, 2, 3]


def test_spans_source_and_audio():
    html = '<audio src="/a.mp3"></audio><picture><source src="/b.webp"></picture>'
    spans = extract_spans(PAGE, html)
    assert [s.media_ref for s in spans] == [
        "http://example.com/a.mp3",
        "http://example.com/b.webp",
    ]


def test_spans_entity_decode():
    spans = extract_spans(PAGE, "<p>a &amp; b</p>")
    assert spans[0].text == "a & b"
