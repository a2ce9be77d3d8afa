"""Arrow-batched pandas UDFs wrapping the pure-Python pet911 extraction
kernels (``crawler_spark.html.pet911``).

Design: ONE struct-returning UDF per page kind (card / catalog / check-API),
so each page's HTML is parsed exactly once per batch — the reference
similarly parses each document once and runs all extractors over it
(``CrawlerPet911/CrawlerPet911.fs:101-161``).  Batches are Arrow-transferred;
no per-row Python (input_hint).  The check-API JSON parse needs no Python at
all — it is native ``from_json`` (NewCards.fs:81-90 → P16).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..html import pet911

AUTHOR_TYPE = StructType(
    [
        StructField("name", StringType(), True),
        StructField("phone", StringType(), True),  # always null in active
        StructField("email", StringType(), True),  # pipeline (CrawlerPet911.fs:155-159)
    ]
)

PHOTO_DESCRIPTOR_TYPE = StructType(
    [
        StructField("ID", StringType(), True),
        StructField("url", StringType(), True),
    ]
)

# FIXTURES.md §5 / SemanticTypes.fs:19-31
CARD_TYPE = StructType(
    [
        StructField("id", StringType(), True),
        StructField("animal", IntegerType(), True),
        StructField("sex", IntegerType(), True),
        StructField("type", IntegerType(), True),
        StructField("address", StringType(), True),
        StructField("latitude", DoubleType(), True),
        StructField("longitude", DoubleType(), True),
        StructField("date", TimestampType(), True),
        StructField("description", StringType(), True),
        StructField("author", AUTHOR_TYPE, True),
        StructField("photos", ArrayType(PHOTO_DESCRIPTOR_TYPE), True),
        StructField("error", StringType(), True),
    ]
)

CATALOG_TYPE = StructType(
    [
        StructField("cards", ArrayType(PHOTO_DESCRIPTOR_TYPE), True),
        StructField("error", StringType(), True),
    ]
)


# Flat UDF return type: primitives + a JSON-encoded photo list.  Arrow
# converts flat string/number columns ~5x faster than list<struct> built
# from per-row Python objects; the nested CARD_TYPE shape is reassembled
# JVM-side with from_json/to_timestamp/struct (see with_parsed_card).
FLAT_CARD_TYPE = StructType(
    [
        StructField("id", StringType(), True),
        StructField("animal", IntegerType(), True),
        StructField("sex", IntegerType(), True),
        StructField("type", IntegerType(), True),
        StructField("address", StringType(), True),
        StructField("latitude", DoubleType(), True),
        StructField("longitude", DoubleType(), True),
        StructField("date_unix", LongType(), True),
        StructField("description", StringType(), True),
        StructField("author_name", StringType(), True),
        StructField("author_present", BooleanType(), True),
        StructField("photos_json", StringType(), True),
        StructField("error", StringType(), True),
        # telemetry: did this row's parse fall back whole-document from the
        # fast scanner to the stdlib engine?  (dom.FALLBACK_COUNT delta)
        StructField("parse_fallback", BooleanType(), True),
    ]
)

_FLAT_KEYS = [f.name for f in FLAT_CARD_TYPE.fields]


@pandas_udf(FLAT_CARD_TYPE)
def parse_card_udf(text: pd.Series) -> pd.DataFrame:
    """P15 full-card assembly — one DOM parse per page, short-circuit order
    preserved (CrawlerPet911.fs:110-143)."""
    cols: dict[str, list] = {k: [] for k in _FLAT_KEYS}

    def emit(**kv):
        for k in _FLAT_KEYS:
            cols[k].append(kv.get(k))

    from ..html import dom

    for t in text:
        if t is None:
            emit(error="No page content", parse_fallback=False)
            continue
        fb0 = dom.FALLBACK_COUNT
        try:
            c = pet911.parse_card(t)
        except Exception as exc:  # defensive: a kernel bug must not kill the executor
            emit(error=f"Parser exception: {exc}",
                 parse_fallback=dom.FALLBACK_COUNT > fb0)
            continue
        emit(
            id=c["id"],
            animal=c["animal"],
            sex=c["sex"],
            type=c["type"],
            address=c["address"],
            latitude=c["latitude"],
            longitude=c["longitude"],
            date_unix=None if c["date"] is None else int(c["date"].timestamp()),
            description=c["description"],
            author_name=c["author_name"],
            author_present=c["error"] is None,
            photos_json=None if c["photos"] is None else json.dumps(
                c["photos"], ensure_ascii=False
            ),
            error=c["error"],
            parse_fallback=dom.FALLBACK_COUNT > fb0,
        )
    return pd.DataFrame(cols)


PHOTOS_JSON_SCHEMA = "array<struct<ID:string,url:string>>"


def with_parsed_card(df: DataFrame, text_col: str = "text",
                     out_col: str = "card") -> DataFrame:
    """Apply the flat parse UDF and reassemble the typed CARD_TYPE struct
    natively (from_json / to_timestamp / struct — all JVM-side)."""
    flat = df.withColumn("__flat", parse_card_udf(F.col(text_col)))
    fc = F.col("__flat")
    card = F.struct(
        fc["id"].alias("id"),
        fc["animal"].alias("animal"),
        fc["sex"].alias("sex"),
        fc["type"].alias("type"),
        fc["address"].alias("address"),
        fc["latitude"].alias("latitude"),
        fc["longitude"].alias("longitude"),
        F.timestamp_seconds(fc["date_unix"]).alias("date"),
        fc["description"].alias("description"),
        F.when(
            fc["author_present"],
            F.struct(
                fc["author_name"].alias("name"),
                F.lit(None).cast("string").alias("phone"),
                F.lit(None).cast("string").alias("email"),
            ),
        ).alias("author"),
        F.from_json(fc["photos_json"], PHOTOS_JSON_SCHEMA).alias("photos"),
        fc["error"].alias("error"),
    )
    # parse_fallback rides OUTSIDE the card struct: it's engine telemetry
    # (fast-scanner -> stdlib whole-document fallback), not card data — the
    # cards sink drops it after the wave metric aggregates it.
    return (
        flat.withColumn(out_col, card)
        .withColumn("parse_fallback", fc["parse_fallback"])
        .drop("__flat")
    )


@pandas_udf(CATALOG_TYPE)
def parse_catalog_udf(text: pd.Series) -> pd.DataFrame:
    """P11 getCatalogCards (ParserPet911.fs:125-136) as array<struct<ID,url>>."""
    rows = []
    for t in text:
        if t is None:
            rows.append({"cards": None, "error": "No page content"})
            continue
        try:
            cards, err = pet911.get_catalog_cards(pet911.parse_doc(t))
        except Exception as exc:
            cards, err = None, f"Parser exception: {exc}"
        rows.append({"cards": cards, "error": err})
    return pd.DataFrame(rows)


# P16 — check-API JSON (NewCards.fs:81-90): pure from_json, zero Python.
CHECK_API_SCHEMA = "struct<data: array<struct<url: string>>>"


def parse_check_api(json_text: Column) -> Column:
    """'{"data":[{"url":...}]}' → array<string> of urls; null data → []."""
    parsed = F.from_json(json_text, CHECK_API_SCHEMA)
    return F.coalesce(
        F.transform(parsed["data"], lambda x: x["url"]),
        F.array().cast("array<string>"),
    )


def decode_text(html: Column) -> Column:
    """P17 downloadedFileToText (Downloader.fs:27-30): UTF-8 decode of page
    bytes — native `decode`; defines the canonical `text` column."""
    return F.decode(html, "UTF-8")
