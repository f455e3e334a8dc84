"""North-rule deployment shape: ``spark-submit --py-files crawlspark.zip``.

The rule names the deployment explicitly ("run via spark-submit --py-files
on multi-executor clusters"); local[N] is the sandbox's executor-count
stand-in. This test proves the REAL seam end-to-end: the package zipped by
tools/make_pyfiles.py, shipped through the actual spark-submit binary with
--py-files, driving tools/submit_crawl.py from a cwd where the repo is NOT
importable — so every crawlspark byte the job runs came from the archive.
The submitted crawl's order checksum and push count must equal the
in-process engine's on the identical parquet inputs (richsite exercises
every href form; crawler.go:217-263 link semantics).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _checksum(order_df):
    return order_df.agg(
        F.sum(
            F.pmod(
                F.xxhash64("url", F.col("disc_order").cast("string")),
                F.lit(1 << 32),
            )
        )
    ).collect()[0][0]


def test_spark_submit_pyfiles_matches_inprocess(spark, tmp_path):
    from crawlspark.engine import CrawlConfig, Crawler
    from crawlspark.schemas import PAGES
    from crawlspark.synth import richsite

    pages, seeds = richsite(n_articles=8)
    pages_pq = str(tmp_path / "pages")
    seeds_pq = str(tmp_path / "seeds")
    spark.createDataFrame(pages, PAGES).write.parquet(pages_pq)
    spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds)], "url string, seed_order int"
    ).write.parquet(seeds_pq)

    # in-process reference run
    cfg = CrawlConfig(
        checkpoint_dir=str(tmp_path / "ckpt_ref"), host="rich.example"
    )
    ref = Crawler(spark, spark.read.parquet(pages_pq), cfg).run(
        spark.read.parquet(seeds_pq)
    )
    ref_checksum = _checksum(ref.order_df())

    # build the --py-files archive and submit from a NEUTRAL cwd with the
    # repo stripped from PYTHONPATH: crawlspark must resolve from the zip
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    zip_path = make_pyfiles.build(out=str(tmp_path / "crawlspark.zip"))
    assert os.path.getsize(zip_path) > 10_000

    env = {
        k: v for k, v in os.environ.items() if k != "PYTHONPATH"
    }
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = str(tmp_path / "out")
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--driver-memory", "4g",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "submit_crawl.py"),
        "--pages", pages_pq,
        "--seeds", seeds_pq,
        "--checkpoint", str(tmp_path / "ckpt_sub"),
        "--host", "rich.example",
        "--out", out_dir,
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)

    assert res["pushed"] == ref.pushed
    assert res["rounds"] == ref.rounds
    assert res["crawl_checksum"] == ref_checksum
    # the submitted job's persisted outputs round-trip: identical order set
    sub_order = spark.read.parquet(os.path.join(out_dir, "order"))
    assert _checksum(sub_order) == ref_checksum
    assert sub_order.count() == ref.order_df().count()
