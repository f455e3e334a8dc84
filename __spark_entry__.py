"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a full deterministic crawl (frontier →
politeness schedule → resolver fetch → parse → span documents) over the
synthetic rich site, unioned with the sf0.001 documents table lifted into
the same interleaved span-document shape.

``queries()`` — one entry per implemented operator (SURVEY.md §2 +
training-data ops); ``oracle_sql()`` — DuckDB equivalents for the
SQL-expressible ones (hash-sketch and crawl-lifecycle ops are
deterministic but engine-specific ⇒ rows-only checks).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlspark import analysis
from crawlspark.engine import CrawlConfig, Crawler
from crawlspark.frontier import with_dense_order
from crawlspark.media import media_features
from crawlspark.schedule import schedule_round
from crawlspark.schemas import PAGES, SPAN
from crawlspark.synth import basic16, richsite
from crawlspark.textnorm import duckdb_normalize_sql

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# crawl helpers (rows-only queries: deterministic, not SQL-expressible)
# ---------------------------------------------------------------------------


def _run_crawl(spark: SparkSession, pages, seeds, **cfg):
    pages_df = spark.createDataFrame(pages, PAGES)
    ckpt = tempfile.mkdtemp(prefix="crawlspark_entry_")
    crawler = Crawler(
        spark, pages_df, CrawlConfig(checkpoint_dir=ckpt, **cfg)
    )
    return crawler.run(seeds)


def _spanify_sf_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift the flat sf documents table into the interleaved span shape
    (sentence text spans + a deterministic media span per document)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sents = F.split(F.col("text"), r"\. ")
    text_spans = F.transform(
        sents,
        lambda s, i: F.struct(
            F.lit("text").alias("kind"),
            s.alias("text"),
            F.lit("").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    media_span = F.array(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            F.concat(F.lit("http://media.example/img/"),
                     F.col("doc_id").cast("string"),
                     F.lit(".png")).alias("media_ref"),
            F.size(sents).cast("int").alias("offset"),
        )
    )
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(text_spans, media_span).cast(
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        ).alias("spans"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl the deterministic rich site end-to-end and return
    its interleaved span documents, unioned with the sf0.001 documents
    lifted into the same shape."""
    pages, seeds = richsite()
    result = _run_crawl(spark, pages, seeds, host="rich.example")
    crawled = result.documents_df()
    return crawled.unionByName(_spanify_sf_documents(spark, SF0001))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_crawl_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages, seeds = basic16()
    res = _run_crawl(spark, pages, seeds, host="example.com")
    return (
        res.order_df()
        .select("url", "round", "disc_order", "fetched_ok")
        .orderBy("disc_order")
    )


def _q_crawl_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages, seeds = richsite()
    res = _run_crawl(spark, pages, seeds, host="rich.example")
    return res.documents_df().select(
        "doc_id", F.posexplode("spans").alias("i", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    ).orderBy("doc_id", "offset")


def _q_politeness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's two-phase per-host politeness top-k (Q5), driven by an
    events-derived frontier so DuckDB can check it with a plain window."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    frontier = ev.select(
        F.col("user_id").cast("string").alias("host"),
        F.col("event_id").alias("disc_order"),
        F.col("value").alias("priority"),
        F.col("event_id").cast("string").alias("url_key"),
        F.col("event_id").cast("string").alias("seen_key"),
        F.col("event_id").cast("string").alias("url"),
    )
    sched, _carry = schedule_round(frontier, host_budget=3, priority_order=True)
    return sched.select(
        "host",
        F.col("disc_order").alias("event_id"),
        F.col("priority").alias("value"),
    )


def _q_budget_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global limit+1 budget via the distributed dense-order index (Q1/Q2
    machinery) — checked against row_number in DuckDB."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    idx, _n = with_dense_order(ev, [F.col("event_id")], "disc_order")
    return idx.filter(F.col("disc_order") < 101).select(
        "event_id", "disc_order"
    )


def _q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seen-set dedup as left_anti (Q1 cross-round): customers with no
    orders."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey")


def _q_span_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), r"\. ")).alias("offset", "sent")
    ).select("doc_id", F.col("offset").cast("long").alias("offset"), "sent")


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    refs = d.select(
        F.concat(
            F.lit("http://media.example/img/"),
            F.col("doc_id").cast("string"),
            F.lit(".png"),
        ).alias("media_ref")
    )
    return media_features(refs).select(
        "media_ref", "n_bytes", "format", "width", "height", "phash"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # crawl engine (rows-only: lifecycle ops, not single SQL statements)
        "crawl_order_basic16": _q_crawl_order,
        "crawl_span_documents": _q_crawl_documents,
        # crawl building blocks, SQL-checkable
        "politeness_topk": _q_politeness_topk,
        "budget_limit": _q_budget_limit,
        "seen_antijoin": _q_seen_antijoin,
        "span_explode": _q_span_explode,
        # text / training-data ops
        "dedup_exact": analysis.dedup_exact,
        "dedup_exact_hash": analysis.dedup_exact_hash,
        "ngram_jaccard": analysis.ngram_jaccard_pairs,
        "minhash_lsh": analysis.minhash_lsh_pairs,
        "simhash_dups": analysis.simhash_dups,
        "embedding_topk": analysis.embedding_topk,
        "ann_lsh_topk": analysis.ann_lsh_topk,
        "lang_id": analysis.lang_id,
        "quality_score": analysis.quality_score,
        "token_count": analysis.token_count,
        "fingerprint": analysis.fingerprint,
        "ws_normalize": analysis.ws_normalize,
        "media_features": _q_media_features,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_STOP = analysis._STOPWORDS


def _lang_sql() -> str:
    score_cols = ",\n    ".join(
        "len(list_filter(toks, x -> x IN ({lst}))) AS s_{lang}".format(
            lst=", ".join(f"'{w}'" for w in _STOP[lang]), lang=lang
        )
        for lang in sorted(_STOP)
    )
    langs = sorted(_STOP)
    best = "greatest({})".format(", ".join(f"s_{la}" for la in langs))
    case = "CASE WHEN {best} = 0 THEN 'unk' {whens} END".format(
        best=best,
        whens=" ".join(f"WHEN s_{la} = {best} THEN '{la}'" for la in langs),
    )
    return f"""
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
), s AS (
  SELECT doc_id,
    {score_cols}
  FROM t
)
SELECT doc_id, {case} AS pred_lang FROM s
"""


def oracle_sql() -> dict[str, str]:
    en = ", ".join(f"'{w}'" for w in _STOP["en"])
    return {
        "politeness_topk": """
SELECT CAST(user_id AS VARCHAR) AS host, event_id, value
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
""",
        "budget_limit": """
SELECT event_id, CAST(row_number() OVER (ORDER BY event_id) - 1 AS BIGINT)
       AS disc_order
FROM events
QUALIFY row_number() OVER (ORDER BY event_id) - 1 < 101
""",
        "seen_antijoin": """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
        "span_explode": """
SELECT doc_id,
       CAST(unnest(generate_series(1, len(string_split(text, '. ')))) - 1
            AS BIGINT) AS offset,
       unnest(string_split(text, '. ')) AS sent
FROM documents
""",
        "dedup_exact": """
SELECT doc_id, text FROM (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
""",
        "dedup_exact_hash": """
SELECT doc_id, md5(text) AS text_hash FROM (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
""",
        "ngram_jaccard": """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 400
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(0, greatest(len(t) - 3, 0)),
           i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) AS s
  FROM d
), e AS (
  SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 6) AS jaccard
FROM e a JOIN e b USING (shingle)
WHERE a.doc_id < b.doc_id
GROUP BY doc_a, doc_b, a.n, b.n
HAVING round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 6) >= 0.6
""",
        "embedding_topk": """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
), q AS (SELECT vec AS qv FROM v WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(vec, qv)
             / (sqrt(list_dot_product(vec, vec)) * sqrt(list_dot_product(qv, qv))),
             4) AS cosine
FROM v, q
WHERE vec_id != 0
ORDER BY cosine DESC, vec_id
LIMIT 10
""",
        "lang_id": _lang_sql(),
        "quality_score": f"""
WITH b AS (
  SELECT doc_id,
         string_split(text, ' ') AS toks,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
           AS punct
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       round(CAST(n_chars AS DOUBLE) / len(toks), 4) AS mean_token_len,
       round(CAST(punct AS DOUBLE) / n_chars, 4) AS punct_ratio,
       round(CAST(len(list_filter(toks, x -> x IN ({en}))) AS DOUBLE)
             / len(toks), 4) AS stopword_ratio,
       round(CAST(len(list_filter(toks, x -> x IN ({en}))) AS DOUBLE)
             / len(toks) * 2.0
             + least(len(toks) / 100.0, 1.0), 4) AS quality
FROM b
""",
        "token_count": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]'))
            AS INTEGER) AS piece_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_estimate
FROM documents
""",
        "fingerprint": f"""
SELECT doc_id, md5({duckdb_normalize_sql('text')}) AS fp FROM documents
""",
        "ws_normalize": f"""
SELECT doc_id,
       {duckdb_normalize_sql("regexp_replace(text, ' ', chr(9) || '  ' || chr(9), 'g')")}
         AS norm_text
FROM documents
""",
    }
