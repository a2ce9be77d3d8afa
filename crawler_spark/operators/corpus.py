"""Corpus-hygiene operators for training-data pipelines: corpus-frequency
boilerplate detection and removal (C4/CCNet-style), deterministic hash
sampling, and PII redaction.

All four are pure native-expression DataFrame compositions (no Python UDFs)
with exact DuckDB oracles via the portable md5-derived ``h32`` hash and
dialect-safe regexes.  Scale notes inline: every aggregate keys on a
uniform hash (shingle / line / sample key), so no skew; nothing here is
all-pairs or driver-side.

Reference context: the F# crawler has no corpus layer — these extend the
training-data pipeline the same way `operators/dedup.py` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import h32, shingles


def boilerplate_shingle_stats(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id", shingle_k: int = 3,
                              min_df: int = 2) -> DataFrame:
    """Per-document boilerplate score: the fraction of a document's distinct
    word ``shingle_k``-shingles that occur in >= ``min_df`` documents.

    High-boiler_frac documents are templated/near-duplicated content a
    corpus-cleaning pass down-weights or drops.  Two shuffles, both keyed on
    the uniform shingle string: (1) doc-frequency per shingle with map-side
    partial counts (shingles are distinct per doc by construction, so
    count(*) IS the doc frequency); (2) a left join marking each document's
    frequent shingles.  At 100 TB the frequent-shingle side (df >= min_df)
    is a small fraction of the shingle universe and usually broadcastable.

    Returns (id_col, n_shingles, n_boiler, boiler_frac).
    """
    sh = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_k)).alias("shingle")
    )
    frequent = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("shingle", F.lit(True).alias("is_boiler"))
    )
    return (
        sh.join(frequent, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            # count of non-nulls, not SUM(CASE): both engines type it int64
            F.count(F.col("is_boiler")).alias("n_boiler"),
        )
        .select(
            id_col, "n_shingles", "n_boiler",
            F.round(
                F.col("n_boiler").cast("double") / F.col("n_shingles").cast("double"), 6
            ).alias("boiler_frac"),
        )
    )


def remove_frequent_lines(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", min_df: int = 2,
                          sep: str = "\n") -> DataFrame:
    """C4-style line-level boilerplate removal: drop every line that occurs
    (as an exact string) in >= ``min_df`` distinct documents, and rebuild
    each document from its surviving lines in original order.

    The line doc-frequency count dedupes (line, doc) first, so a line
    repeated inside one document counts once.  Order restoration is
    relational — lines carry their ``posexplode`` position, survivors are
    re-assembled with a per-document sort of (pos, line) structs inside one
    ``collect_list`` aggregate (bounded by document size, never by corpus
    size).  Documents whose every line was dropped survive with
    ``clean_text = ''`` (a downstream min-length filter removes them —
    dropping them here would silently change corpus membership).

    Returns (id_col, clean_text, n_lines, n_kept).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "line"),
    )
    frequent = (
        lines.select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("line")
    )
    kept = lines.join(frequent, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        docs.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), sep, -1)).cast("long").alias("n_lines"),
        )
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def hash_sample(df: DataFrame, key_col: str, rate_bp: int,
                salt: str = "") -> DataFrame:
    """Deterministic corpus sampling: keep a row iff
    ``h32(salt || key) % 10000 < rate_bp`` (rate in basis points, 100 = 1%).

    Unlike ``df.sample``, this is reproducible across engines, runs, and
    partitionings (the md5-derived ``h32`` is the same expression in the
    DuckDB oracle), is stable under re-partition (keyed on row identity,
    not partition position), and composes: disjoint salts give independent
    samples; the same salt at a higher rate gives a superset (nested
    samples for scaling-law curves).  Pure codegen — no shuffle at all.
    """
    bucket = h32(F.concat(F.lit(salt), F.col(key_col).cast("string"))) % 10000
    return df.where(bucket < F.lit(rate_bp))


# Dialect-safe PII patterns: every construct below (classes, \\d, \\b,
# bounded/unbounded repetition) means the same thing in Java regex (Spark)
# and RE2 (DuckDB), and replacement is global in both (DuckDB needs the 'g'
# flag — see the oracle twin in __spark_entry__.py).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(text):
    """Redact emails, phone-like digit runs, and IPv4 literals with typed
    placeholders.  Email first: a phone-ish digit run inside an address
    must disappear as part of the <EMAIL>, not get half-eaten as a <PHONE>.
    Native ``regexp_replace`` chain — codegen'd, no Python.
    """
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4, "<IP>")


def pii_match_counts(text):
    """(n_emails, n_phones, n_ips) match counts on the RAW text — the audit
    metric a redaction pass reports alongside the rewrite."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).cast("long"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).cast("long"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)).cast("long"),
    )
