"""Pipeline-JSON export (P20) — ``cardToPipelineJSON``
(``CrawlerPet911/Utils.fs:42-105``) as a native ``to_json`` expression.

Field order and value encodings mirror the reference's JObject.Add sequence:
``art, animal, sex, address, latitude?, longitude?, date, type?,
description, author{username, phone?, email?}, photos[{id}]`` wrapped in
``{pet: …}`` — with the reference's numeric-STRING codes (dog→"1", cat→"2",
unknown sex→"0", lost→"1", found→"2"), ``%f``-formatted coordinates
(6 decimals, same in .NET and Java), unix-seconds date as a decimal string,
""-defaulted author username, and photo ids reduced to the filename part of
``{cardID}/{file.ext}`` (``parsePhotoId``, Utils.fs:36-40).

Optional fields (latitude/longitude when None; phone/email) disappear from
the JSON — Spark's ``to_json`` drops null struct fields, matching the
reference's conditional ``Add`` calls.  Divergence note: the reference
serializes via Newtonsoft with its default formatting; we emit compact JSON
(semantically identical, not byte-identical whitespace).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# SemanticTypes.fs:3-12
SPECIES_DOG, SPECIES_CAT = 1, 2
SEX_MALE, SEX_FEMALE = 2, 3
TYPE_LOST, TYPE_FOUND = 1, 2


def pipeline_pet_struct(
    id_col: Column, animal: Column, sex: Column, address: Column,
    latitude: Column, longitude: Column, date: Column, type_col: Column,
    description: Column, author_name: Column, author_phone: Column,
    author_email: Column, photos: Column,
) -> Column:
    """The ``pet`` JObject as a Spark struct, field order preserved."""
    return F.struct(
        id_col.alias("art"),
        F.when(animal == SPECIES_DOG, "1")
        .when(animal == SPECIES_CAT, "2")
        .otherwise("0")
        .alias("animal"),
        F.when(sex == SEX_MALE, "2")
        .when(sex == SEX_FEMALE, "3")
        .otherwise("0")
        .alias("sex"),
        F.coalesce(address, F.lit("")).alias("address"),
        # %f == six decimals in both .NET (sprintf) and Java (format_string);
        # null → field omitted by to_json (matches the conditional Add)
        F.when(latitude.isNotNull(), F.format_string("%f", latitude)).alias("latitude"),
        F.when(longitude.isNotNull(), F.format_string("%f", longitude)).alias("longitude"),
        F.format_string("%d", F.unix_timestamp(date)).alias("date"),
        F.when(type_col == TYPE_FOUND, "2")
        .when(type_col == TYPE_LOST, "1")
        .alias("type"),
        description.alias("description"),
        F.struct(
            F.coalesce(author_name, F.lit("")).alias("username"),
            author_phone.alias("phone"),
            author_email.alias("email"),
        ).alias("author"),
        F.transform(
            photos,
            lambda p: F.struct(
                # parsePhotoId: '{cardId}/{file.ext}' → file.ext (Utils.fs:36-40)
                F.element_at(F.split(p["ID"], "/"), -1).alias("id")
            ),
        ).alias("photos"),
    )


def card_to_pipeline_json(cards_df: DataFrame) -> DataFrame:
    """cards table (CrawlJob.cards() schema) → (id, pipeline_json)."""
    pet = pipeline_pet_struct(
        F.col("id"), F.col("animal"), F.col("sex"), F.col("address"),
        F.col("latitude"), F.col("longitude"), F.col("date"), F.col("type"),
        F.col("description"),
        F.col("author.name"), F.col("author.phone"), F.col("author.email"),
        F.col("photos"),
    )
    return cards_df.select(
        "id",
        F.to_json(F.struct(pet.alias("pet"))).alias("pipeline_json"),
    )
