"""Fused parse stage (P1-P4): one ``mapInPandas`` pass per round turns
fetched pages into (spans, links) — HTML parse runs exactly once per page
and its two products stay nested until after the documents write, so the
expensive work is never recomputed (SURVEY.md P3: the reference pipelines
guards→get→parse→extract→process in one worker pass, crawler.go:184-215).

Per-row Python at the *Spark* level: none — batches arrive as Arrow
RecordBatches; the per-document HTML parse inside the batch is the same
inherently-per-document work the reference does per URL, minus the
serialization (Arrow moves the batch in one copy).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from .htmlparse import extract, spans_from_extractor
from .purl import parse_url
from .schemas import PARSED

_PASSTHROUGH = ["url", "host", "url_key", "round", "disc_order", "priority"]


def _make_parse_batch(process_fn=None, remove_fn=None):
    """Build the mapInPandas body, closing over the optional user hooks
    (ProcessFunc / RemoveFunc seams — cloudpickled to executors)."""

    def _parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gc as _gc
        import os as _os
        import time as _time

        _stats = _os.environ.get("CRAWLSPARK_UDF_STATS") == "1"
        # The parse loop allocates heavily (DOM events, span dicts); in
        # long-lived pyspark workers the cyclic GC fires constantly over the
        # worker's whole heap (Arrow buffers, pandas state) and was measured
        # inflating in-batch time several-fold at high worker counts. The
        # structures built here are acyclic; disable the cycle collector for
        # the duration of the batch.
        _gc_was_enabled = _gc.isenabled()
        _gc.disable()
        try:
            yield from _parse_batches_inner(
                batches, _stats, _os, _time, process_fn, remove_fn
            )
        finally:
            if _gc_was_enabled:
                _gc.enable()

    return _parse_batch


def _parse_batches_inner(batches, _stats, _os, _time, process_fn, remove_fn):
    for pdf in batches:
        _t0 = _time.time()
        out = {c: pdf[c] for c in _PASSTHROUGH}
        statuses = pdf["status"]
        fetched_ok = []
        spans_col = []
        links_col = []
        for url, status, html, ok_guard in zip(
            pdf["url"], statuses, pdf["content_html"], pdf["guard_ok"]
        ):
            ok = bool(ok_guard) and status == 200 and html is not None
            u = parse_url(url) if ok else None
            if ok and u is not None:
                ex = extract(html)
                ok = ex.ok
                if ok:
                    spans = spans_from_extractor(u, ex, remove_fn=remove_fn)
                    span_dicts = [s._asdict() for s in spans]
                    if process_fn is not None:
                        span_dicts = process_fn(url, span_dicts)
                    spans_col.append(span_dicts)
                    links_col.append(
                        [{"link_index": i, "href": h} for i, h in enumerate(ex.hrefs)]
                    )
                else:
                    spans_col.append(None)
                    links_col.append(None)
            else:
                ok = False
                spans_col.append(None)
                links_col.append(None)
            fetched_ok.append(ok)
        out["status"] = statuses.astype("int32")
        out["fetched_ok"] = pd.Series(fetched_ok, index=pdf.index)
        out["spans"] = pd.Series(spans_col, index=pdf.index, dtype=object)
        out["links"] = pd.Series(links_col, index=pdf.index, dtype=object)
        if _stats:
            with open("/tmp/crawlspark_udf_stats.log", "a") as f:
                f.write(
                    f"parse {len(pdf)} {_time.time() - _t0:.3f} pid={_os.getpid()}\n"
                )
        yield pd.DataFrame(out)


def parse_stage(fetched, process_fn=None, remove_fn=None):
    """fetched: DataFrame with frontier cols + (status, content_html,
    guard_ok) → PARSED rows (spans + links nested arrays). Optional user
    hooks: ``process_fn(url, spans)->spans`` span post-hook (ProcessFunc),
    ``remove_fn(ch)->bool`` rune-removal pre-pass (RemoveFunc)."""
    cols = _PASSTHROUGH + ["status", "content_html", "guard_ok"]
    return fetched.select(*cols).mapInPandas(
        _make_parse_batch(process_fn, remove_fn), PARSED
    )
