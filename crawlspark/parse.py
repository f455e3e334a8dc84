"""Fused parse stage (P1-P4): one Arrow pass per round turns fetched
pages into (spans, links) — HTML parse runs exactly once per page and its
two products stay nested until after the documents write, so the expensive
work is never recomputed (SURVEY.md P3: the reference pipelines
guards→get→parse→extract→process in one worker pass, crawler.go:184-215).

Per-row Python at the *Spark* level: none — batches arrive as Arrow
RecordBatches (``mapInArrow``); the per-document HTML parse inside the
batch is the same inherently-per-document work the reference does per URL,
minus the serialization (Arrow moves the batch in one copy).

Why mapInArrow and not mapInPandas: the output columns are nested
(array<struct> spans/links). With mapInPandas those must be pandas object
columns of per-row list-of-dict, and the worker-side pandas→Arrow
conversion walks every dict per field — measured 8x per-page inflation at
16 workers (memory-allocator traffic, not parse CPU): 60k pages took 20s
at local[4] but 42s at local[16]. Building the nested Arrow arrays
directly from flat Python lists (one ``pa.StructArray``/``pa.ListArray``
per batch, C++ builders) removed the collapse: 11.7s at local[4], 10.7s at
local[16] on the identical input. This is the difference between a stage
that scales with executors and one that inverts at cluster width.
"""

from __future__ import annotations

from typing import Iterator

from .htmlparse import extract, spans_from_extractor
from .purl import parse_url
from .schemas import PARSED

_PASSTHROUGH = ["url", "host", "url_key", "round", "disc_order", "priority"]


def _make_parse_batch(process_fn=None, remove_fn=None):
    """Build the mapInArrow body, closing over the optional user hooks
    (ProcessFunc / RemoveFunc seams — cloudpickled to executors)."""

    def _parse_batch(batches) -> Iterator:
        import gc as _gc
        import os as _os
        import time as _time

        _stats = _os.environ.get("CRAWLSPARK_UDF_STATS") == "1"
        # The parse loop allocates heavily (DOM events, span tuples); in
        # long-lived pyspark workers the cyclic GC fires constantly over the
        # worker's whole heap (Arrow buffers, batch state) and was measured
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
    import pyarrow as pa

    for batch in batches:
        _t0 = _time.time()
        cols = {n: batch.column(n) for n in batch.schema.names}
        # to_pylist once per column: C++ -> list of str, far cheaper than
        # per-element scalar access
        urls = cols["url"].to_pylist()
        htmls = cols["content_html"].to_pylist()
        statuses = cols["status"].to_pylist()
        guards = cols["guard_ok"].to_pylist()
        n = len(urls)
        fetched_ok = []
        is_null = []  # row's spans/links are null (failed fetch/parse)
        s_kind, s_text, s_ref, s_off = [], [], [], []
        l_idx, l_href = [], []
        s_ends, l_ends = [0] * (n + 1), [0] * (n + 1)  # list offsets (n+1)
        s_pos = 0
        l_pos = 0
        for i in range(n):
            ok = bool(guards[i]) and statuses[i] == 200 and htmls[i] is not None
            if ok:
                u = parse_url(urls[i])
                ex = extract(htmls[i])
                ok = ex.ok
                if ok:
                    spans = spans_from_extractor(u, ex, remove_fn=remove_fn)
                    if process_fn is not None:
                        # ProcessFunc sees/returns the span-dict shape
                        # (reference ProcessFunc seam, crawler.go:144-150)
                        span_dicts = process_fn(
                            urls[i], [s._asdict() for s in spans]
                        )
                        for d in span_dicts:
                            s_kind.append(d["kind"])
                            s_text.append(d["text"])
                            s_ref.append(d["media_ref"])
                            s_off.append(d["offset"])
                        s_pos += len(span_dicts)
                    else:
                        for s in spans:
                            s_kind.append(s.kind)
                            s_text.append(s.text)
                            s_ref.append(s.media_ref)
                            s_off.append(s.offset)
                        s_pos += len(spans)
                    hrefs = ex.hrefs
                    l_href.extend(hrefs)
                    l_idx.extend(range(len(hrefs)))
                    l_pos += len(hrefs)
            fetched_ok.append(ok)
            is_null.append(not ok)
            s_ends[i + 1] = s_pos
            l_ends[i + 1] = l_pos
        # one C++ builder call per flat column; masked offsets mark the
        # null (not empty) lists of failed rows
        mask = pa.array(is_null, pa.bool_())
        spans_struct = pa.StructArray.from_arrays(
            [
                pa.array(s_kind, pa.string()),
                pa.array(s_text, pa.string()),
                pa.array(s_ref, pa.string()),
                pa.array(s_off, pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans_arr = pa.ListArray.from_arrays(
            pa.array(s_ends, pa.int32()), spans_struct, mask=mask
        )
        links_struct = pa.StructArray.from_arrays(
            [pa.array(l_idx, pa.int32()), pa.array(l_href, pa.string())],
            names=["link_index", "href"],
        )
        links_arr = pa.ListArray.from_arrays(
            pa.array(l_ends, pa.int32()), links_struct, mask=mask
        )
        out = pa.RecordBatch.from_arrays(
            [cols[c] for c in _PASSTHROUGH]
            + [
                cols["status"].cast(pa.int32()),
                pa.array(fetched_ok, pa.bool_()),
                spans_arr,
                links_arr,
            ],
            names=_PASSTHROUGH + ["status", "fetched_ok", "spans", "links"],
        )
        if _stats:
            with open("/tmp/crawlspark_udf_stats.log", "a") as f:
                f.write(
                    f"parse {n} {_time.time() - _t0:.3f} pid={_os.getpid()}\n"
                )
        yield out


def parse_stage(fetched, process_fn=None, remove_fn=None):
    """fetched: DataFrame with frontier cols + (status, content_html,
    guard_ok) → PARSED rows (spans + links nested arrays). Optional user
    hooks: ``process_fn(url, spans)->spans`` span post-hook (ProcessFunc),
    ``remove_fn(ch)->bool`` rune-removal pre-pass (RemoveFunc)."""
    cols = _PASSTHROUGH + ["status", "content_html", "guard_ok"]
    return fetched.select(*cols).mapInArrow(
        _make_parse_batch(process_fn, remove_fn), PARSED
    )
