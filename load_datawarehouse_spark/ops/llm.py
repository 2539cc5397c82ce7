"""LLM-training-data pipeline operators (BASELINE.json north-star).

Dedup (exact, minhash-LSH, n-gram Jaccard), similarity search over
embeddings, and text analysis over the documents table. All hot paths
are JVM built-ins (no Python UDFs); hashing uses md5 (identical in
Spark and DuckDB) so every pipeline is oracle-checkable — lowercase
fixed-width hex compares lexicographically like the underlying value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from load_datawarehouse_spark.session import load_tables

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Exact deduplication
# ---------------------------------------------------------------------------

_DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
FROM documents
GROUP BY md5(text)
HAVING COUNT(*) > 1
ORDER BY text_hash
"""


@_register("dedup_exact_groups", _DEDUP_EXACT_ORACLE)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash.

    Scale: hashing before grouping means the shuffle carries 32-byte
    keys, not document bodies; partial aggregation reduces map-side.
    """
    t = load_tables(spark, sf_dir, register_views=False)
    return (
        t["documents"]
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
        .orderBy("text_hash")
    )


_DEDUP_KEEP_ORACLE = """
SELECT COUNT(*) AS n_survivors,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
    SELECT doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
) WHERE rn = 1
"""


@_register("dedup_exact_keep_first", _DEDUP_KEEP_ORACLE)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keeping the lowest doc_id per content group (deterministic
    survivor selection, unlike dropDuplicates' arbitrary pick)."""
    t = load_tables(spark, sf_dir, register_views=False)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        t["documents"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .agg(
            F.count(F.lit(1)).alias("n_survivors"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_TEXT_STATS_ORACLE = """
SELECT doc_id, lang,
       LENGTH(text) AS n_chars_actual,
       LEN(string_split(text, ' ')) AS n_words,
       CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / LEN(string_split(text, ' ')) AS avg_word_len,
       LENGTH(text) - LENGTH(REPLACE(text, 'e', '')) AS n_letter_e
FROM documents
ORDER BY doc_id
"""


@_register("text_stats", _TEXT_STATS_ORACLE)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality stats from pure built-ins (codegen'd)."""
    t = load_tables(spark, sf_dir, register_views=False)
    n_words = F.size(F.split("text", " ", -1))
    return (
        t["documents"]
        .select(
            "doc_id",
            "lang",
            F.length("text").alias("n_chars_actual"),
            n_words.alias("n_words"),
            (
                F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words
            ).alias("avg_word_len"),
            (F.length("text") - F.length(F.regexp_replace("text", "e", ""))).alias("n_letter_e"),
        )
        .orderBy("doc_id")
    )


_TOKEN_COUNT_ORACLE = """
SELECT doc_id,
       LEN(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_tokens
FROM documents
ORDER BY doc_id
"""


@_register("token_count", _TOKEN_COUNT_ORACLE)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenization count (word / number / symbol runs)."""
    t = load_tables(spark, sf_dir, register_views=False)
    return (
        t["documents"]
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all("text", F.lit("([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])"), 0)
            ).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )
