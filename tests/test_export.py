"""P20 pipeline-JSON export tests (cardToPipelineJSON, Utils.fs:42-105)."""

from __future__ import annotations

import datetime
import json

import pytest

from crawler_spark.functions.export import card_to_pipeline_json

CARDS_SCHEMA = (
    "id string, animal int, sex int, type int, address string, "
    "latitude double, longitude double, date timestamp, description string, "
    "author struct<name:string,phone:string,email:string>, "
    "photos array<struct<ID:string,url:string>>"
)


@pytest.fixture(scope="module")
def cards(spark):
    rows = [
        (
            "rf100001", 1, 2, 2, "Улица 1, Москва", 41.5, 30.25,
            datetime.datetime(2020, 1, 2, 0, 0, 0), "desc one",
            ("Author_1", None, None),
            [("rf100001/Pet_100001_1.webp", "https://cdn.pet911.ru/Pet_100001_1.webp")],
        ),
        (   # no coords, no author name, no photos, cat/lost/unknown-sex
            "rl100002", 2, 1, 1, None, None, None,
            datetime.datetime(2021, 6, 1, 12, 0, 0), "второе",
            (None, None, None),
            [],
        ),
    ]
    return spark.createDataFrame(rows, CARDS_SCHEMA)


def test_pipeline_json_values(cards):
    out = {r["id"]: json.loads(r["pipeline_json"])
           for r in card_to_pipeline_json(cards).collect()}

    pet = out["rf100001"]["pet"]
    assert list(out["rf100001"].keys()) == ["pet"]
    # field order = the reference's JObject.Add order (Utils.fs:42-105)
    assert list(pet.keys()) == [
        "art", "animal", "sex", "address", "latitude", "longitude",
        "date", "type", "description", "author", "photos",
    ]
    assert pet["art"] == "rf100001"
    assert pet["animal"] == "1" and pet["sex"] == "2" and pet["type"] == "2"
    assert pet["latitude"] == "41.500000" and pet["longitude"] == "30.250000"
    assert pet["date"] == str(int(datetime.datetime(
        2020, 1, 2, tzinfo=datetime.timezone.utc).timestamp()))
    assert pet["author"] == {"username": "Author_1"}      # phone/email omitted
    assert pet["photos"] == [{"id": "Pet_100001_1.webp"}]

    pet2 = out["rl100002"]["pet"]
    assert "latitude" not in pet2 and "longitude" not in pet2  # None → omitted
    assert pet2["animal"] == "2" and pet2["sex"] == "0" and pet2["type"] == "1"
    assert pet2["address"] == ""                           # null → "" default
    assert pet2["author"] == {"username": ""}
    assert pet2["photos"] == []


def test_pipeline_json_on_crawled_cards(spark, tmp_path):
    """End-to-end: crawl synthetic cards, export, validate every row parses
    and photo ids are bare filenames."""
    from pyspark.sql import functions as F

    from crawler_spark.plans.crawl_job import CrawlJob
    from crawler_spark.sources.pages import (
        NUM_BASE, build_pages, synthetic_docs_from_range,
    )

    docs = synthetic_docs_from_range(spark, 40)
    pages = build_pages(spark, "", include_fixtures=False, docs_df=docs)
    job = CrawlJob(spark, str(tmp_path / "store"), pages, wave_seconds=3600 * 1000)
    job.seed_range(NUM_BASE, NUM_BASE + 39)
    job.run_wave()

    good = job.cards().where(F.col("error").isNull())
    exported = card_to_pipeline_json(good).collect()
    assert len(exported) == good.count() > 0
    for r in exported:
        doc = json.loads(r["pipeline_json"])
        pet = doc["pet"]
        assert pet["art"] == r["id"]
        assert pet["animal"] in {"1", "2"} and pet["type"] in {"1", "2"}
        assert all("/" not in p["id"] for p in pet["photos"])
