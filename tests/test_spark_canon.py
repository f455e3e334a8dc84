"""Spark-side equivalence: the Catalyst regexp chain (T1) and the native
accept filter / pandas UDFs must agree with the pure-Python contract when
run through a real session, including plan-level checks (pushdown,
codegen)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlspark import canon
from crawlspark.purl import accept, normalize, normalize_key, parse_url
from crawlspark.textnorm import normalize_text, normalize_text_col
from tests.test_textnorm import CORPUS


def test_textnorm_catalyst_chain_matches_python(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CORPUS)], "i int, s string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_text_col("s").alias("n")).collect()
    }
    for i, (inp, want) in enumerate(CORPUS):
        assert got[i] == want == normalize_text(inp)


def test_udfs_match_purl_through_spark(spark):
    udfs = canon.register_udfs()
    rows = [
        ("http://google.com/sub", "search?q=1"),
        ("http://google.com", "#frag"),
        ("http://h.example/dir/page.html", "../up.html"),
        ("http://h.example/a/", "//cdn.example/x.png"),
        ("http://h.example", "mailto:x@y"),
    ]
    df = spark.createDataFrame(rows, "parent string, href string")
    out = df.select(
        "parent", "href",
        udfs["resolve"](F.col("parent"), F.col("href")).alias("resolved"),
    ).withColumn("key", udfs["url_key"](F.col("resolved"))).collect()
    for r in out:
        u = normalize(parse_url(r["parent"]), r["href"])
        want_resolved = u.to_string() if u else None
        assert r["resolved"] == want_resolved
        if u is not None:
            assert r["key"] == normalize_key(parse_url(r["resolved"]))


def test_accept_filter_col_matches_purl(spark):
    urls = [
        "http://example.com/site1.html",
        "http://example.com/notwant",
        "http://other.com/x",
        "http://example.com:8080/x",
    ]
    reject, acc = ["notwant"], [r"\.html$", "x"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["ok"]
        for r in df.select(
            "url",
            canon.accept_filter_col("url", "example.com", reject, acc).alias("ok"),
        ).collect()
    }
    for u in urls:
        assert got[u] == accept(parse_url(u), "example.com", reject, acc)


def test_native_canonize_matches_udf(spark):
    """The JVM-native canonicalization fast path must agree with the exact
    pandas-UDF path row for row over every href shape."""
    from tests.test_canon_vectorized import HREFS, PARENTS

    udfs = canon.register_udfs()
    rows = []
    i = 0
    for p in PARENTS:
        for h in HREFS:
            rows.append((p, i, h))
            i += 1
    # plus absolute machine-generated links (the native-path bulk case)
    for j in range(200):
        rows.append((PARENTS[0], i, f"http://h{j % 7}.example/p/{j}?x={j}#f{j}"))
        i += 1
    df = spark.createDataFrame(rows, "parent_url string, rid long, href string")

    got_native = {
        r["rid"]: (r["url"], r["host"], r["url_key"])
        for r in canon.canonize_links(df, "href", udfs["canonize"], native=True).collect()
    }
    got_udf = {
        r["rid"]: (r["url"], r["host"], r["url_key"])
        for r in canon.canonize_links(df, "href", udfs["canonize"], native=False).collect()
    }
    assert got_native == got_udf
    # sanity: the native branch actually covered the machine-generated bulk
    from pyspark.sql import functions as F

    n_native = df.filter(
        F.col("href").rlike(canon.SQL_ABS_SIMPLE)
    ).count()
    assert n_native >= 200


def test_native_canonize_precomputed_parent_cols(spark):
    """The engine hoists the parent-derived columns (_pprefix/_phost/
    _parent_ok) above the link explode; the precomputed-column branch of
    canonize_links must (a) produce output identical to the inline-native
    and udf paths and (b) never leak the private columns into the output
    schema — on ANY path (ADVICE r3)."""
    from tests.test_canon_vectorized import HREFS, PARENTS

    udfs = canon.register_udfs()
    rows = []
    i = 0
    for p in PARENTS:
        for h in HREFS:
            rows.append((p, i, h))
            i += 1
    df = spark.createDataFrame(rows, "parent_url string, rid long, href string")

    # the engine's exact hoisted expressions (engine.py candidate pipeline)
    _purl = F.col("parent_url")
    _ppath = F.regexp_extract(
        _purl, r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    pre = df.select(
        "parent_url", "rid", "href",
        F.regexp_extract(
            _purl, r"^([a-z][a-z0-9+.\-]*://[^/?#]*)", 1
        ).alias("_pprefix"),
        F.regexp_extract(_purl, canon.SQL_HOST_RE, 1).alias("_phost"),
        (
            _purl.rlike(canon.SQL_ABS_SIMPLE) & ~_ppath.contains("%")
        ).alias("_parent_ok"),
    )

    def res(out_df):
        assert not any(c.startswith("_p") for c in out_df.columns)
        return {
            r["rid"]: (r["url"], r["host"], r["url_key"])
            for r in out_df.collect()
        }

    got_pre = res(canon.canonize_links(pre, "href", udfs["canonize"], native=True))
    got_pre_udf = res(
        canon.canonize_links(pre, "href", udfs["canonize"], native=False)
    )
    got_inline = res(
        canon.canonize_links(df, "href", udfs["canonize"], native=True)
    )
    got_udf = res(canon.canonize_links(df, "href", udfs["canonize"], native=False))
    assert got_pre == got_inline == got_udf == got_pre_udf


def test_prepared_split_cached_matches_udf(spark):
    """The engine's round-4 shape — canonize_links_prepared PERSISTED,
    then canonize_links_split's union over the cache — must produce the
    same row set as the exact pandas-UDF path over every href shape, the
    prepared projection must store NULL url/host/url_key and the raw
    (parent_url, href) pair exactly on the non-native rows, and no
    private column (_cn/_cp/_cf or the hoisted _p*) may leak into the
    union's output schema."""
    from tests.test_canon_vectorized import HREFS, PARENTS

    udfs = canon.register_udfs()
    rows = []
    i = 0
    for p in PARENTS:
        for h in HREFS:
            rows.append((p, i, h))
            i += 1
    for j in range(200):
        rows.append((PARENTS[0], i, f"http://h{j % 7}.example/p/{j}?x={j}#f{j}"))
        i += 1
    df = spark.createDataFrame(rows, "parent_url string, rid long, href string")

    pre = canon.canonize_links_prepared(df, "href").persist()
    try:
        # the prepared projection's invariants
        for r in pre.collect():
            if r["_cn"]:
                assert r["url"] is not None and r["url_key"] is not None
                assert r["_cp"] is None and r["_cf"] is None
            else:
                assert r["url"] is None and r["host"] is None
                assert r["url_key"] is None
                assert r["_cp"] is not None  # parent_url is never null here

        fast, slow = canon.canonize_links_split(pre, udfs["canonize"])
        out = fast.unionByName(slow)
        assert set(out.columns) == {"rid", "url", "host", "url_key"}
        got = {
            r["rid"]: (r["url"], r["host"], r["url_key"])
            for r in out.collect()
        }
        want = {
            r["rid"]: (r["url"], r["host"], r["url_key"])
            for r in canon.canonize_links(
                df, "href", udfs["canonize"], native=False
            ).collect()
        }
        assert got == want
        # both tiers genuinely exercised on this corpus
        n_fast = fast.count()
        assert n_fast >= 200
        assert slow.count() == len(rows) - n_fast > 0
    finally:
        pre.unpersist()


def test_parquet_scan_pushdown(spark, tmp_path):
    """Filter + projection must reach the parquet scan (the 100 TB
    contract: a scan reading all columns for a 2-column projection is
    wrong)."""
    from crawlspark.schemas import PAGES
    from crawlspark.synth import richsite

    pages, _ = richsite()
    path = str(tmp_path / "pages")
    spark.createDataFrame(pages, PAGES).write.parquet(path)
    df = (
        spark.read.parquet(path)
        .filter(F.col("host") == "rich.example")
        .select("url_key", "status")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(host), EqualTo(host,rich.example)" in plan
    assert "ReadSchema: struct<host:string,url_key:string,status:int" in plan


def test_politeness_topk_no_host_exchange_before_salt(spark):
    """The two-phase politeness top-k must not hash-partition on bare
    host in phase 1 (that exchange is exactly the hot-host skew)."""
    from crawlspark.schedule import schedule_round

    frontier = spark.range(1000).select(
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string")).alias("host"),
        F.col("id").alias("disc_order"),
        F.lit(0.0).alias("priority"),
        F.col("id").cast("string").alias("url_key"),
        F.col("id").cast("string").alias("seen_key"),
        F.col("id").cast("string").alias("url"),
    )
    sched, carry = schedule_round(frontier, host_budget=5)
    plan = sched._jdf.queryExecution().executedPlan().toString()
    # phase-1 window partitions by (host, salt); only the tiny survivor set
    # (≤ salt×budget per host) is exchanged by bare host
    assert "hashpartitioning(host" in plan
    assert "_salt" in plan
