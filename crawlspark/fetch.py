"""Batch fetch round (SRC3 + guards F3/F4/F6) — the scan.

In-sandbox there is no network: "fetch" is an equi-join of the scheduled
batch against the deterministic ``pages`` resolver table on
(host, url_key) — the exact seam the reference exposes as ``GetFunc``
(crawler.go:93-94; its tests inject fake pages the same way,
crawler_test.go:21-24). A real deployment swaps this for an HTTP pandas-UDF
stage with identical columns.

Semantics preserved:
- F3/F4 pre-fetch guards (crawler.go:184-190): host mismatch or
  non-absolute URL ⇒ failed attempt (status 0) — applied to seeds too,
  which bypass the accept filter.
- F6 status filter (crawler.go:52-55): anything but 200 is a failed
  attempt; the row still counts in ``done`` (crawler.go:175).
- The fetch key is (host, url_key): servers resolve cleaned path + query
  and never see fragments — matching the reference's file-server fixture.

Scale: the pages side is broadcast when small; otherwise both sides
shuffle on (host, url_key) with AQE handling skew. The scheduled side has
already been uniformly spread by schedule.spread_for_fetch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_fetch(
    scheduled: DataFrame,
    pages: DataFrame,
    allowed_hosts: Optional[DataFrame] = None,
    crawl_host: Optional[str] = None,
    broadcast_pages: bool = False,
) -> DataFrame:
    """Join the scheduled batch against the pages table, adding
    (status, content_html, guard_ok). Failed guards/misses get status 0.
    """
    p = pages.select(
        F.col("host").alias("_phost"),
        F.col("url_key").alias("_pkey"),
        F.col("status").alias("_status"),
        F.col("content_html").alias("_content"),
    )
    if broadcast_pages:
        p = F.broadcast(p)

    # F3/F4: host-membership + absoluteness guards (the ONLY filter seeds
    # get — off-host seeds are fetched-and-failed, not silently dropped)
    if crawl_host is not None:
        guard = F.col("host") == F.lit(crawl_host)
    elif allowed_hosts is not None:
        scheduled = scheduled.join(
            F.broadcast(allowed_hosts.select(F.col("host").alias("_ahost"))),
            F.col("host") == F.col("_ahost"),
            "left",
        )
        guard = F.col("_ahost").isNotNull()
    else:
        guard = F.lit(True)
    guard = guard & (F.col("url").rlike("^[A-Za-z][A-Za-z0-9+.\\-]*:"))

    # SHUFFLE_HASH hint: build the hash map on the (small) scheduled batch;
    # the pages side then streams without the per-round SORT a sort-merge
    # join would impose on the whole web table. With the pages table
    # pre-partitioned on (host, url_key) (Crawler init), the pages side
    # needs no exchange at all — the per-round cost is one scan.
    joined = scheduled.withColumn("guard_ok", guard).hint("shuffle_hash").join(
        p,
        (F.col("host") == F.col("_phost")) & (F.col("url_key") == F.col("_pkey")),
        "left",
    )
    out = (
        joined.withColumn(
            "status",
            F.when(
                F.col("guard_ok"), F.coalesce(F.col("_status"), F.lit(0))
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "content_html",
            F.when(
                F.col("guard_ok") & (F.col("_status") == 200), F.col("_content")
            ),
        )
        .drop("_phost", "_pkey", "_status", "_content", "_ahost")
    )
    return out
