"""Round scheduling: politeness budgets, priority order, skew-proof
partitioning (Q4/Q5 — crawler.go:169-182,333-340 re-expressed for batch).

Politeness in a batch engine: per host per round, at most ``host_budget``
URLs are scheduled (≙ round_wall_budget / crawl_delay with the reference's
3s default, crawler.go:22); the rest carry over in FIFO order ahead of
fresh discoveries — exactly the queue's push-order semantics.

The per-host top-k is a window, but a naive ``partitionBy(host)`` window
dies on hot hosts (one partition gets 50% of the frontier). Two-phase
top-k: (1) per (host, salt-bucket) row_number keeps ≤ budget rows per
bucket — uniform partitions, whole-stage codegen; (2) per-host row_number
over the ≤ salt×budget survivors — now guaranteed small per host. Same
result, no skewed exchange.

The expensive fetch/parse stage needs no host locality at all (politeness
is already enforced by the budget), so scheduled rows are spread uniformly
by ``xxhash64(url_key, salt)`` — the batch answer to the reference's
round-robin dispatch, immune to hot-host skew by construction.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SALT_BUCKETS = 64


def schedule_round(
    frontier: DataFrame,
    host_budget: int = 0,
    priority_order: bool = False,
    salt_buckets: int = SALT_BUCKETS,
) -> Tuple[DataFrame, Optional[DataFrame]]:
    """Split the frontier into (scheduled, carryover) for one round.

    Frontier order (≙ queue FIFO / priority queue): (priority desc,
    disc_order) in priority mode, else disc_order alone.
    """
    if host_budget <= 0:
        return frontier, None

    if priority_order:
        order = [F.col("priority").desc(), F.col("disc_order")]
    else:
        order = [F.col("disc_order")]

    salted = frontier.withColumn(
        "_salt", F.pmod(F.xxhash64("url_key"), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    phase1 = salted.withColumn("_rn1", F.row_number().over(w1))

    # bucket survivors ≤ salt_buckets × budget per host — phase-2 window is
    # provably un-skewed
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = (
        phase1.filter(F.col("_rn1") <= host_budget)
        .withColumn("_rn2", F.row_number().over(w2))
        .drop("_rn1", "_salt")
    )
    scheduled = ranked.filter(F.col("_rn2") <= host_budget).drop("_rn2")
    # carryover = frontier minus scheduled (cheap anti-join on seen_key;
    # avoids re-ranking rows that lost in phase 1)
    carry = frontier.join(
        scheduled.select("seen_key"), "seen_key", "left_anti"
    )
    return scheduled, carry


def spread_for_fetch(
    scheduled: DataFrame, num_partitions: int, salt: int = 0
) -> DataFrame:
    """Uniform repartition of the scheduled batch for the CPU-heavy
    fetch→parse stage (Q4). Hash on the url_key (plus a per-round salt so
    pathological key sets cannot stick to the same partitions every
    round) — never on host, so hot hosts spread evenly."""
    return scheduled.repartition(
        num_partitions, F.xxhash64("url_key", F.lit(salt))
    )
