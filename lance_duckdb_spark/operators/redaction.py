"""Privacy / provenance curation operators (SURVEY §2.C25-C27):
PII redaction, URL-domain statistics, and text normalization — the
remaining hygiene stages a web-scale pretraining pipeline runs before
tokenization (cf. C4 / RefinedWeb-style curation).

The synthetic ``documents.text`` is clean word-soup with no PII, URLs
or case/punctuation noise, so each operator first ENRICHES the text
deterministically from ``doc_id`` (same expression in the DuckDB
oracle — the multimodal-stub pattern: the interesting machinery is the
redaction/extraction/normalization itself, which runs on a nontrivial
input and is oracle-checked end to end). On real data the enrichment
step disappears and the rest of the plan is unchanged.

Scale shapes: all three are single narrow scans of ``documents`` with
JVM-side regexp built-ins (whole-stage codegen, no Python), followed
by a small groupBy — linear, shuffle only on the tiny aggregate key.
``text_normalize``'s distinct-vocabulary count shuffles exploded words
on (lang, word); partial aggregation bounds it by per-partition
vocabulary, not corpus size.

Regex subset chosen to evaluate identically under Java regex (Spark)
and RE2 (DuckDB): character classes, bounded repetition, alternation —
no lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

# -- PII redaction ----------------------------------------------------------

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

# deterministic PII planting: every 3rd doc gets an email, every 4th a
# phone, every 5th an IPv4 — all derived from doc_id so Spark and the
# oracle enrich identically.
_PII_ENRICH_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' reach user', doc_id,"
    "   '@mail.example.com') ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' call ',"
    "   lpad(CAST((doc_id * 7) % 1000 AS STRING), 3, '0'), '-555-',"
    "   lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' from ',"
    "   doc_id % 223 + 1, '.', doc_id % 251, '.', doc_id % 241, '.',"
    "   doc_id % 254 + 1) ELSE '' END)"
)

_PII_ENRICH_DUCK = (
    "text ||"
    " CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id ||"
    "   '@mail.example.com' ELSE '' END ||"
    " CASE WHEN doc_id % 4 = 0 THEN ' call ' ||"
    "   lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0') || '-555-' ||"
    "   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||"
    " CASE WHEN doc_id % 5 = 0 THEN ' from ' ||"
    "   (doc_id % 223 + 1) || '.' || (doc_id % 251) || '.' ||"
    "   (doc_id % 241) || '.' || (doc_id % 254 + 1) ELSE '' END"
)


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails, phone numbers and IPv4 addresses from document
    text, reporting per-source counts and the net character delta.
    Counts come from ``regexp_extract_all`` BEFORE replacement (the
    audit log a compliance pipeline keeps); the redacted text itself
    is three chained ``regexp_replace`` — all JVM codegen, one scan.

    Redaction order matters only if patterns overlap; these cannot
    (emails contain '@', phones dashed digits, IPs dotted digits), so
    engines agree regardless of match order."""
    docs = load(spark, sf_dir, "documents")
    enriched = F.expr(_PII_ENRICH_SPARK)
    d = docs.select(
        "doc_id",
        "source",
        enriched.alias("t"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        ),
        IP_RE,
        "[IP]",
    )
    per_doc = d.select(
        "source",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(EMAIL_RE), 0)).alias(
            "n_email"
        ),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(PHONE_RE), 0)).alias(
            "n_phone"
        ),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(IP_RE), 0)).alias(
            "n_ip"
        ),
        (F.length("t") - F.length(redacted)).alias("delta"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").cast("long").alias("emails_redacted"),
            F.sum("n_phone").cast("long").alias("phones_redacted"),
            F.sum("n_ip").cast("long").alias("ips_redacted"),
            F.sum("delta").cast("long").alias("chars_removed"),
        )
        .orderBy("source")
    )


PII_REDACT_SQL = f"""
WITH enriched AS (
  SELECT source, {_PII_ENRICH_DUCK} AS t FROM documents
),
per_doc AS (
  SELECT source,
    len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_email,
    len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phone,
    len(regexp_extract_all(t, '{IP_RE}')) AS n_ip,
    length(t) - length(
      regexp_replace(regexp_replace(regexp_replace(
        t, '{EMAIL_RE}', '[EMAIL]', 'g'),
        '{PHONE_RE}', '[PHONE]', 'g'),
        '{IP_RE}', '[IP]', 'g')) AS delta
  FROM enriched
)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
  CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
  CAST(SUM(n_ip) AS BIGINT) AS ips_redacted,
  CAST(SUM(delta) AS BIGINT) AS chars_removed
FROM per_doc GROUP BY source ORDER BY source
"""

# -- URL / domain statistics ------------------------------------------------

URL_RE = "https?://[A-Za-z0-9.-]+[A-Za-z0-9/._-]*"
DOMAIN_RE = "https?://([A-Za-z0-9.-]+)"

_DOMAINS = [
    "example.com",
    "news.example.org",
    "blog.example.net",
    "docs.example.io",
]
_DOMAINS_SQL = "[" + ", ".join(f"'{d}'" for d in _DOMAINS) + "]"

# every 2nd doc cites a primary https URL, every 7th an http mirror —
# domain choice keyed on doc_id so both engines plant identically.
_URL_ENRICH_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' see https://',"
    f"   element_at(array({', '.join(repr(d) for d in _DOMAINS)}),"
    "    CAST(doc_id % 4 + 1 AS INT)), '/p/', doc_id) ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN concat(' mirror http://',"
    f"   element_at(array({', '.join(repr(d) for d in _DOMAINS)}),"
    "    CAST((doc_id + 1) % 4 + 1 AS INT)), '/alt') ELSE '' END)"
)

_URL_ENRICH_DUCK = (
    "text ||"
    " CASE WHEN doc_id % 2 = 0 THEN ' see https://' ||"
    f"   {_DOMAINS_SQL}[CAST(doc_id % 4 + 1 AS INT)] ||"
    "   '/p/' || doc_id ELSE '' END ||"
    " CASE WHEN doc_id % 7 = 0 THEN ' mirror http://' ||"
    f"   {_DOMAINS_SQL}[CAST((doc_id + 1) % 4 + 1 AS INT)] ||"
    "   '/alt' ELSE '' END"
)


def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain link census over document text: extract every URL,
    bucket by registered domain, report url/doc counts and the https
    share — the provenance summary a crawl-curation pipeline uses to
    allow/deny-list hosts. Extraction is ``regexp_extract_all`` (JVM),
    explode, then a groupBy on the (small) domain key."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.expr(_URL_ENRICH_SPARK).alias("t")
    )
    urls = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("t"), F.lit(URL_RE), 0)
        ).alias("url"),
    )
    return (
        urls.select(
            "doc_id",
            "url",
            F.regexp_extract(F.col("url"), DOMAIN_RE, 1).alias("domain"),
            F.col("url").startswith("https://").cast("long").alias("https"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("https").cast("long").alias("n_https"),
        )
        .orderBy("domain")
    )


URL_DOMAIN_SQL = f"""
WITH enriched AS (
  SELECT doc_id, {_URL_ENRICH_DUCK} AS t FROM documents
),
urls AS (
  SELECT doc_id, unnest(regexp_extract_all(t, '{URL_RE}')) AS url
  FROM enriched
)
SELECT regexp_extract(url, '{DOMAIN_RE}', 1) AS domain,
  COUNT(*) AS n_urls,
  COUNT(DISTINCT doc_id) AS n_docs,
  CAST(SUM(CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_https
FROM urls GROUP BY domain ORDER BY domain
"""

# -- text normalization -----------------------------------------------------

# case/punctuation noise planted deterministically: every 2nd doc is
# uppercased, every 3rd gets a punctuation tail (whose doubled spaces
# also exercise the whitespace-collapse step).
_NORM_ENRICH_SPARK = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END,"
    " CASE WHEN doc_id % 3 = 0 THEN ' !!! Extra,, Noise?? ' ELSE '' END)"
)
_NORM_ENRICH_DUCK = (
    "CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END ||"
    " CASE WHEN doc_id % 3 = 0 THEN ' !!! Extra,, Noise?? ' ELSE '' END"
)


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — lowercase, strip non-alnum to
    space, collapse runs of whitespace, trim — then per-language
    stats: doc count, normalized char/token totals, and the distinct
    vocabulary size. The normalize chain is three regexp/lower calls
    in one codegen stage; vocabulary is an exploded distinct count
    keyed (lang, word) with partial aggregation."""
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.expr(_NORM_ENRICH_SPARK)), "[^a-z0-9 ]", " "
            ),
            "  +",
            " ",
        )
    )
    d = docs.select("lang", norm.alias("t"))
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("t")).cast("long").alias("norm_chars"),
        F.sum(F.size(F.split(F.col("t"), " "))).cast("long").alias(
            "total_tokens"
        ),
    )
    vocab = (
        d.select("lang", F.explode(F.split(F.col("t"), " ")).alias("w"))
        .groupBy("lang")
        .agg(F.countDistinct("w").alias("vocab_size"))
    )
    return per_lang.join(vocab, "lang").orderBy("lang")


TEXT_NORMALIZE_SQL = f"""
WITH norm AS (
  SELECT lang, trim(regexp_replace(regexp_replace(
    lower({_NORM_ENRICH_DUCK}),
    '[^a-z0-9 ]', ' ', 'g'), '  +', ' ', 'g')) AS t
  FROM documents
),
per_lang AS (
  SELECT lang, COUNT(*) AS n_docs,
    CAST(SUM(length(t)) AS BIGINT) AS norm_chars,
    CAST(SUM(len(string_split(t, ' '))) AS BIGINT) AS total_tokens
  FROM norm GROUP BY lang
),
vocab AS (
  SELECT lang, COUNT(DISTINCT w) AS vocab_size
  FROM (SELECT lang, unnest(string_split(t, ' ')) AS w FROM norm)
  GROUP BY lang
)
SELECT p.lang AS lang, n_docs, norm_chars, total_tokens, vocab_size
FROM per_lang p JOIN vocab v ON p.lang = v.lang ORDER BY lang
"""


QUERIES = {
    "pii_redact": pii_redact,
    "url_domain_stats": url_domain_stats,
    "text_normalize": text_normalize,
}

ORACLE = {
    "pii_redact": PII_REDACT_SQL,
    "url_domain_stats": URL_DOMAIN_SQL,
    "text_normalize": TEXT_NORMALIZE_SQL,
}
