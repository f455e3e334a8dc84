"""Robots gate (F5) — reference ``Robots.Test`` consulted before fetch
(crawler.go:31-33,86-88); nil robots ⇒ allow-all.

Rules model (FIXTURES.md §4): per-host path-prefix allow/deny rows with
optional crawl delay. Decision: the longest matching prefix wins; no
matching rule ⇒ allow (matching real robots.txt precedence).

Scale: the rules table is small policy state shared by every task — the
Spark translation of the reference's read-only robots object shared by all
workers is an explicit ``F.broadcast`` join (north rule calls this out).
Denied rows are failed fetch attempts: still counted in ``done``
(crawler.go:175), never fetched.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_budgets(
    rules: DataFrame, round_wall_secs: float, default_delay_secs: float = 3.0
) -> Optional[DataFrame]:
    """Per-host politeness budgets derived from robots crawl-delay
    (reference README.md:9-10 — crawl-delay honored in the default
    config; the delay sleep is crawler.go:176-178, default 3s
    crawler.go:22). Batch translation: a host whose crawl-delay is d can
    absorb at most ceil(round_wall / d) fetches per round. The configured
    default delay applies only to hosts WITHOUT a robots crawl-delay
    (crawler.go:110-113: Worker.Delay is used "if there is not robots.txt
    crawl delay") — a host advertising a delay shorter than the default
    gets the larger budget its own rule allows (ADVICE r2).

    Returns a small (host, budget) DataFrame for schedule_round's
    broadcast, or None when no rule carries a delay. Hosts absent from
    the result fall to the caller's default budget (derived from
    default_delay_secs)."""
    if rules is None or "crawl_delay_secs" not in rules.columns:
        return None
    per_host = (
        rules.filter(
            F.col("crawl_delay_secs").isNotNull()
            & (F.col("crawl_delay_secs") > 0)
        )
        .groupBy("host")
        .agg(F.max("crawl_delay_secs").alias("_delay"))
    )
    return per_host.select(
        "host",
        F.ceil(
            F.lit(float(round_wall_secs)) / F.col("_delay").cast("double")
        ).cast("long").alias("budget"),
    )


def apply_robots(
    scheduled: DataFrame, rules: Optional[DataFrame]
) -> Tuple[DataFrame, DataFrame]:
    """Split scheduled rows into (allowed, denied) under the rules table.

    ``scheduled`` must carry url_key (path[?query] — the path the server
    sees); ``rules``: (host, path_prefix, allow, crawl_delay_secs).
    """
    if rules is None:
        return scheduled, scheduled.limit(0)

    r = rules.select(
        F.col("host").alias("_rhost"),
        F.col("path_prefix").alias("_prefix"),
        F.col("allow").alias("_allow"),
    )
    # robots tests the UN-normalized URL (reference passes *url.URL to
    # Robots.Test, crawler.go:31-33): match prefixes against the raw path,
    # not the cleaned dedup key ("/sub2/" must match path "/sub2/" even
    # though the key is "/sub2")
    raw_path = F.regexp_extract(
        F.col("url"), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    joined = scheduled.withColumn("_rawpath", raw_path).join(
        F.broadcast(r),
        (F.col("host") == F.col("_rhost"))
        & F.col("_rawpath").startswith(F.col("_prefix")),
        "left",
    )
    # longest matching prefix per URL wins; no rule ⇒ allow
    w = Window.partitionBy("seen_key").orderBy(
        F.length(F.col("_prefix")).desc_nulls_last()
    )
    decided = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .withColumn("_decision", F.coalesce(F.col("_allow"), F.lit(True)))
        .drop("_rn", "_rhost", "_prefix", "_allow", "_rawpath")
    )
    allowed = decided.filter(F.col("_decision")).drop("_decision")
    denied = decided.filter(~F.col("_decision")).drop("_decision")
    return allowed, denied
