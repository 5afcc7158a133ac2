"""Corpus-hygiene operators: PII redaction and URL normalization.

Standard pre-training pipeline stages (alongside dedup/quality in this
package): scrub emails/phones/IPs from documents, and canonicalize URLs
for host-level grouping/dedup.  Both are pure Catalyst regexp expressions
— zero Python in the hot path, so at 100 TB they run entirely inside
whole-stage codegen as a map-only stage (no shuffle except the final
bounded host rollup).

The synthetic corpus contains no real PII, so each query deterministically
plants PII/URLs derived from (doc_id, source) IDENTICALLY on the Spark and
DuckDB sides; the redaction/normalization logic is what the value hash
verifies.  Regex patterns are restricted to the Java-regex ∩ RE2 common
subset so both engines compile them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from snappydata_spark.operators.registry import register
from snappydata_spark.tables import load_tables

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "txt_pii_redact",
    oracle=f"""
WITH planted AS (
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || doc_id || '@mail' || (doc_id % 7) || '.example.com'
              ELSE '' END ||
         CASE WHEN doc_id % 5 = 0
              THEN ' call 555-' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0')
                   || '-' || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')
              ELSE '' END ||
         CASE WHEN doc_id % 4 = 0
              THEN ' from 10.' || (doc_id % 256) || '.' || (doc_id * 3 % 256)
                   || '.' || (doc_id * 7 % 256)
              ELSE '' END AS raw
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{_EMAIL}')) AS BIGINT) AS emails_found,
       CAST(len(regexp_extract_all(raw, '{_PHONE}')) AS BIGINT) AS phones_found,
       CAST(len(regexp_extract_all(raw, '{_IPV4}')) AS BIGINT) AS ips_found,
       md5(regexp_replace(regexp_replace(regexp_replace(raw,
           '{_EMAIL}', '[EMAIL]', 'g'),
           '{_PHONE}', '[PHONE]', 'g'),
           '{_IPV4}', '[IP]', 'g')) AS redacted_sig
FROM planted
""",
)
def txt_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrubber (emails → [EMAIL], phones → [PHONE], IPv4 → [IP])
    with per-document match counts and an md5 signature of the redacted
    text so the full transformation is hash-verified end-to-end."""
    doc = load_tables(spark, sf_dir, ("documents",))["documents"]
    d = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" contact user"), d.cast("string"), F.lit("@mail"),
                (d % 7).cast("string"), F.lit(".example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((d * 7 % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((d * 13 % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit(" from 10."), (d % 256).cast("string"), F.lit("."),
                (d * 3 % 256).cast("string"), F.lit("."),
                (d * 7 % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    planted = doc.select("doc_id", raw.alias("raw"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), _EMAIL, "[EMAIL]"),
            _PHONE,
            "[PHONE]",
        ),
        _IPV4,
        "[IP]",
    )
    return planted.select(
        "doc_id",
        F.regexp_count(F.col("raw"), F.lit(_EMAIL)).cast("long").alias("emails_found"),
        F.regexp_count(F.col("raw"), F.lit(_PHONE)).cast("long").alias("phones_found"),
        F.regexp_count(F.col("raw"), F.lit(_IPV4)).cast("long").alias("ips_found"),
        F.md5(redacted).alias("redacted_sig"),
    )


@register(
    "txt_url_normalize",
    oracle="""
WITH planted AS (
  SELECT doc_id,
         'HTTPS://WWW.' || upper(source) || (doc_id % 3) || '.Example.COM/p/'
             || doc_id || '?utm_source=x&ref=y#frag' AS url
  FROM documents),
norm AS (
  SELECT doc_id,
         regexp_replace(
             lower(regexp_extract(url, '(?i)https?://([^/?#]+)', 1)),
             '^www\\.', '') AS host,
         regexp_extract(url, '(?i)https?://[^/?#]+([^?#]*)', 1) AS path
  FROM planted)
SELECT host, COUNT(*) AS n_urls,
       COUNT(DISTINCT path) AS n_paths
FROM norm
GROUP BY host
ORDER BY host
""",
)
def txt_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for host-level corpus stats/dedup: lowercase
    the authority, strip the www. prefix and query/fragment, then roll up
    per host.  The rollup output is bounded by |hosts|, so the shuffle is
    tiny no matter how many raw URLs were scanned."""
    doc = load_tables(spark, sf_dir, ("documents",))["documents"]
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        (F.col("doc_id") % 3).cast("string"),
        F.lit(".Example.COM/p/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=x&ref=y#frag"),
    )
    planted = doc.select("doc_id", url.alias("url"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(F.col("url"), r"(?i)https?://([^/?#]+)", 1)),
        r"^www\.",
        "",
    )
    path = F.regexp_extract(F.col("url"), r"(?i)https?://[^/?#]+([^?#]*)", 1)
    return (
        planted.select(host.alias("host"), path.alias("path"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("path").alias("n_paths"),
        )
        .orderBy("host")
    )
