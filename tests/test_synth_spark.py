"""Distributed synthetic-graph generator (synth.powerlaw_spark): the
scale path used by the bench beyond 1M pages. Structure-class and
determinism pins — every column must be a pure function of the page
index so the corpus is identical at any parallelism."""

from pyspark.sql import functions as F

from crawlspark.synth import powerlaw_spark

ARGS = dict(n_pages=3000, n_hosts=8, out_degree=5, paragraphs=3,
            seed=42, hot_host_share=0.4, seed_fraction=0.25)


def _checksum(df):
    return df.agg(
        F.sum(F.pmod(F.xxhash64("url", "content_html"), F.lit(1 << 32)))
    ).collect()[0][0]


def test_structure_class(spark):
    pages, seeds = powerlaw_spark(spark, **ARGS)
    assert pages.count() == 3000
    assert seeds.count() == 750  # seed_fraction 0.25 -> every 4th page

    by_host = dict(
        (r["host"], r["cnt"])
        for r in pages.groupBy("host").agg(F.count("*").alias("cnt")).collect()
    )
    assert by_host["h0.example"] == 1200  # hot_host_share 0.4
    assert len(by_host) == 8
    # zipf tail decays: h1 > h7
    assert by_host["h1.example"] > by_host["h7.example"]

    row = pages.filter(F.col("url_key") == "/p/17").collect()[0]
    assert row["url"].endswith("/p/17") and row["status"] == 200
    assert row["content_html"].count('<a href="http://') == 5
    assert row["content_html"].count("<p>") == 3


def test_deterministic_across_parallelism(spark):
    a, _ = powerlaw_spark(spark, **ARGS)
    b, _ = powerlaw_spark(spark, **ARGS)
    assert _checksum(a.repartition(16)) == _checksum(b.repartition(3))


def test_links_point_into_corpus(spark):
    pages, _ = powerlaw_spark(spark, **ARGS)
    hrefs = (
        pages.select(
            F.explode(
                F.expr(
                    r"regexp_extract_all(content_html,"
                    r" '<a href=\"(http://[^\"]+)\"', 1)"
                )
            ).alias("href")
        )
        .distinct()
    )
    urls = pages.select(F.col("url").alias("href"))
    dangling = hrefs.join(urls, "href", "left_anti").count()
    assert dangling == 0
