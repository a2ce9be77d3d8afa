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

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
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


@pandas_udf(CARD_TYPE)
def parse_card_udf(text: pd.Series) -> pd.DataFrame:
    """P15 full-card assembly — one DOM parse per page, short-circuit order
    preserved (CrawlerPet911.fs:110-143)."""
    rows = []
    for t in text:
        if t is None:
            rows.append(
                {
                    "id": None, "animal": None, "sex": None, "type": None,
                    "address": None, "latitude": None, "longitude": None,
                    "date": None, "description": None, "author": None,
                    "photos": None, "error": "No page content",
                }
            )
            continue
        try:
            c = pet911.parse_card(t)
        except Exception as exc:  # defensive: a kernel bug must not kill the executor
            rows.append(
                {
                    "id": None, "animal": None, "sex": None, "type": None,
                    "address": None, "latitude": None, "longitude": None,
                    "date": None, "description": None, "author": None,
                    "photos": None, "error": f"Parser exception: {exc}",
                }
            )
            continue
        rows.append(
            {
                "id": c["id"],
                "animal": c["animal"],
                "sex": c["sex"],
                "type": c["type"],
                "address": c["address"],
                "latitude": c["latitude"],
                "longitude": c["longitude"],
                "date": None if c["date"] is None else c["date"].replace(tzinfo=None),
                "description": c["description"],
                "author": None
                if c["error"] is not None
                else {"name": c["author_name"], "phone": None, "email": None},
                "photos": c["photos"],
                "error": c["error"],
            }
        )
    out = pd.DataFrame(rows)
    out["date"] = pd.to_datetime(out["date"])  # naive == UTC (session tz is UTC)
    return out


@pandas_udf(CATALOG_TYPE)
def parse_catalog_udf(text: pd.Series) -> pd.DataFrame:
    """P11 getCatalogCards (ParserPet911.fs:125-136) as array<struct<ID,url>>."""
    rows = []
    for t in text:
        if t is None:
            rows.append({"cards": None, "error": "No page content"})
            continue
        try:
            cards, err = pet911.get_catalog_cards(pet911.parse_html(t))
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
