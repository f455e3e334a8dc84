"""Sitemap decode golden — the exact corpus from the reference test
(sitemap/sitemap_test.go:13-78)."""

from datetime import datetime, timezone

import pytest

from crawlspark.sitemapsrc import _FREQ_SECS, parse_lastmod, parse_sitemap_xml

XML = """
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url>
\t<loc>http://www.example.com/</loc>
\t<lastmod>2005-01-01</lastmod>
\t<changefreq>monthly</changefreq>
\t<priority>0.8</priority>
</url>
<url>
\t<loc>http://www.example.com/catalog?item=12&amp;desc=vacation_hawaii</loc>
\t<changefreq>weekly</changefreq>
</url>
<url>
\t<loc>http://www.example.com/catalog?item=73&amp;desc=vacation_new_zealand</loc>
\t<lastmod>2004-12-23</lastmod>
\t<changefreq>weekly</changefreq>
</url>
<url>
\t<loc>http://www.example.com/catalog?item=74&amp;desc=vacation_newfoundland</loc>
\t<lastmod>2004-12-23T18:00:15+00:00</lastmod>
\t<priority>0.3</priority>
</url>
<url>
\t<loc>http://www.example.com/catalog?item=83&amp;desc=vacation_usa</loc>
\t<lastmod>2004-11-23</lastmod>
</url>
</urlset>
"""


def test_reference_corpus():
    entries = parse_sitemap_xml(XML)
    assert len(entries) == 5
    e0 = entries[0]
    assert e0["loc"] == "http://www.example.com/"
    assert e0["lastmod"] == datetime(2005, 1, 1, tzinfo=timezone.utc)
    assert e0["changefreq_secs"] == 30 * 86400
    assert e0["priority"] == 0.8
    e1 = entries[1]
    assert e1["loc"] == "http://www.example.com/catalog?item=12&desc=vacation_hawaii"
    assert e1["changefreq_secs"] == 7 * 86400
    assert e1["priority"] == 0.0
    assert e1["lastmod"] is None
    e3 = entries[3]
    assert e3["lastmod"] == datetime(2004, 12, 23, 18, 0, 15, tzinfo=timezone.utc)
    assert e3["priority"] == 0.3
    assert [e["entry_order"] for e in entries] == [0, 1, 2, 3, 4]


def test_changefreq_table():
    # sitemap.go:23-44
    assert _FREQ_SECS["always"] == 1
    assert _FREQ_SECS["hourly"] == 3600
    assert _FREQ_SECS["daily"] == 86400
    assert _FREQ_SECS["weekly"] == 604800
    assert _FREQ_SECS["monthly"] == 2592000
    assert _FREQ_SECS["yearly"] == 31536000
    assert _FREQ_SECS["never"] == (1 << 63) - 1
    assert _FREQ_SECS[""] == 0


def test_invalid_changefreq_fails_whole_parse():
    bad = XML.replace("monthly", "sometimes")
    with pytest.raises(ValueError):
        parse_sitemap_xml(bad)


@pytest.mark.parametrize(
    "s,want",
    [
        ("2006-01-02", datetime(2006, 1, 2, tzinfo=timezone.utc)),
        ("2006-01-02T15:04Z", datetime(2006, 1, 2, 15, 4, tzinfo=timezone.utc)),
        ("2006-01-02T15:04:05+02:00", None),  # value checked below
        ("2006-01", datetime(2006, 1, 1, tzinfo=timezone.utc)),
        ("2006", datetime(2006, 1, 1, tzinfo=timezone.utc)),
    ],
)
def test_lastmod_layouts(s, want):
    got = parse_lastmod(s)
    if want is not None:
        assert got == want
    else:
        assert got is not None and got.hour == 15 and got.utcoffset().total_seconds() == 7200


def test_lastmod_garbage():
    assert parse_lastmod("not-a-date") is None
