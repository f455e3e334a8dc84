"""HTML parse + link/span extraction (P1/P2/P4).

Reference behavior being reproduced (/root/reference/crawler.go:217-263):

- Pre-order DFS over the DOM (node, then children left-to-right;
  crawler.go:260-262). Event order from Python's ``html.parser`` equals that
  document order for the well-formed HTML this engine processes.
- For every ``<a>`` element, ALL attributes are scanned in order and every
  non-empty ``href`` occurrence (malformed HTML can repeat the attribute)
  emits one link (crawler.go:221-224). ``link_index`` is the pre-order
  emission counter — the intra-page tiebreaker that makes crawl order
  deterministic.
- Unparseable pages contribute zero links (crawler.go:207-209; the URL still
  counts as attempted).

Span extraction (P4) realizes the reference's ``ProcessFunc`` hook
(crawler.go:99-100,144-148) for the interleaved text+media payload. The
reference leaves the payload to user space, so the contract is fixed here
and pinned by the oracle:

- Walk in the same document order.
- Text nodes → ``kind='text'``, text whitespace-normalized (T1,
  transform/transform.go:9-42 semantics); nodes that are blank after
  normalization are skipped, as is text inside <script>/<style>.
- Media elements (``img``, ``video``, ``audio``, ``source`` with a
  non-empty ``src``) → ``kind='media'``, ``media_ref`` = src resolved
  against the page URL with the same non-RFC resolver as links (url.go:9-34).
- ``offset`` = document-order span index (0-based).

Pure Python, no Spark imports — runs inside Arrow batches on executors and
inside the single-threaded oracle.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, NamedTuple, Optional, Tuple

from .purl import URL, normalize
from .textnorm import normalize_text

MEDIA_TAGS = frozenset({"img", "video", "audio", "source"})
_SKIP_TEXT_TAGS = frozenset({"script", "style"})


class Span(NamedTuple):
    kind: str  # 'text' | 'media'
    text: str
    media_ref: str
    offset: int


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: List[str] = []  # raw href values, document order
        self.media_srcs: List[Tuple[int, str]] = []  # (position, raw src)
        self.texts: List[Tuple[int, str]] = []  # (position, raw text)
        self._pos = 0  # shared document-order counter for spans
        self._skip_depth = 0
        self.ok = True

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
        if tag == "a":
            for key, val in attrs:
                if key == "href" and val:
                    self.hrefs.append(val)
        if tag in MEDIA_TAGS:
            for key, val in attrs:
                if key == "src" and val:
                    self.media_srcs.append((self._pos, val))
                    self._pos += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self.texts.append((self._pos, data))
            self._pos += 1


def extract(html: Optional[str]) -> _Extractor:
    """Parse ``html`` and return the raw extraction events. A parse failure
    returns an extractor with ``ok=False`` and nothing extracted."""
    ex = _Extractor()
    if html is None:
        ex.ok = False
        return ex
    try:
        ex.feed(html)
        ex.close()
    except Exception:
        ex.ok = False
        ex.hrefs, ex.media_srcs, ex.texts = [], [], []
    return ex


def extract_links(html: Optional[str]) -> List[str]:
    """P2: raw hrefs in pre-order emission order (resolution/filtering is a
    separate stage so Catalyst can fuse the native filters that follow)."""
    return extract(html).hrefs


def extract_spans(
    page_url: URL, html: Optional[str], remove_fn=None
) -> List[Span]:
    """P4: interleaved text+media span sequence for one fetched page."""
    return spans_from_extractor(page_url, extract(html), remove_fn=remove_fn)


def spans_from_extractor(
    page_url: URL, ex: _Extractor, remove_fn=None
) -> List[Span]:
    """Span assembly from an existing extraction (lets the fused Spark
    stage parse each page exactly once for both links and spans).

    ``remove_fn(ch) -> bool``: optional rune-removal pre-pass applied to
    text payloads BEFORE whitespace normalization — the reference's
    ``transform.RemoveFunc`` seam (transform/transform.go:46, chained
    ahead of the normalize transducer at transform.go:59-68)."""
    events: List[Tuple[int, str, str]] = []  # (pos, kind, payload)
    for pos, data in ex.texts:
        events.append((pos, "text", data))
    for pos, src in ex.media_srcs:
        events.append((pos, "media", src))
    events.sort(key=lambda e: e[0])

    spans: List[Span] = []
    for _pos, kind, payload in events:
        if kind == "text":
            if remove_fn is not None:
                payload = "".join(c for c in payload if not remove_fn(c))
            norm = normalize_text(payload)
            if norm.strip() == "":
                continue
            spans.append(Span("text", norm, "", len(spans)))
        else:
            resolved = normalize(page_url, payload)
            if resolved is None:
                continue
            spans.append(Span("media", "", resolved.to_string(), len(spans)))
    return spans
