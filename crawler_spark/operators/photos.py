"""Card→photo fan-out and per-card fan-in barrier (J1/J2 + P18).

The reference posts each parsed card's photo descriptors to an image agent
(PhotosForCardCrawler.fs:30-36) and replies to the card only when ALL photos
finish; an empty photo set replies immediately (:38-40) and the FIRST photo
failure aborts the card's await with that error (:57-62).  Its `photoToCard`
reverse map is just our join key.

Spark shape: ``explode`` fan-out, hash-aggregate fan-in with
``every() / min_by(first error by arrival seq)`` — one shuffle on card_id.
Image validation (Images.fs:12-24) is a magic-byte stub here: PIL is absent
from the container, so the decode is gated behind an import-try and the
deterministic corpus carries real WEBP/JPEG/PNG magic prefixes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fanout_photos(cards_df: DataFrame, carry: tuple = ()) -> DataFrame:
    """J1: one row per (card, photo), preserving per-card photo order as
    ``photo_seq`` (the reference posts photos in array order,
    PhotosForCardCrawler.fs:30-36 → first-failure semantics need it).

    ``carry`` names extra per-card columns to thread THROUGH the explode —
    card ids are unique, so carrying them here is plan-equivalent to
    exploding bare and joining back on card_id, minus that join's two
    exchanges (a generate is narrow; the join re-shuffled the whole
    fan-out on the wave's critical path).
    """
    return (
        cards_df.where(F.col("error").isNull() & (F.size("photos") > 0))
        .select(
            F.col("id").alias("card_id"),
            *carry,
            F.posexplode("photos").alias("photo_seq", "photo"),
        )
        .select(
            "card_id",
            *carry,
            "photo_seq",
            F.col("photo.ID").alias("photo_id"),
            F.col("photo.url").alias("url"),
        )
    )


def mime_to_ext(mime: Column) -> Column:
    """P19 mimeToExt (Images.fs:26-34): contains-based mapping, first match
    wins — jpeg/jpg→jpg, png→png, webp→webp, else NULL.  Native when-chain."""
    low = F.lower(mime)
    return (
        F.when(low.contains("jpeg") | low.contains("jpg"), F.lit("jpg"))
        .when(low.contains("png"), F.lit("png"))
        .when(low.contains("webp"), F.lit("webp"))
    )


def _magic_prefix_ok(data: Column) -> Column:
    """Magic-byte image sniff over the binary column — native expressions."""
    head = F.substring(data, 1, 12)
    as_text = F.decode(head, "ISO-8859-1")  # byte-preserving 1:1 decode
    return (
        as_text.startswith("\xff\xd8\xff")  # JPEG
        | as_text.startswith("\x89PNG\r\n\x1a\n")  # PNG
        | (as_text.startswith("RIFF") & (F.substring(as_text, 9, 4) == "WEBP"))
    )


def validate_image(fetched_photos_df: DataFrame, data_col: str = "html") -> DataFrame:
    """P18 validateImage (Images.fs:12-24): bytes → is-valid-image boolean.

    Full decode via PIL when available (not in this container); otherwise the
    deterministic magic-byte sniff — the Spark-side plumbing (binary column,
    Arrow batching, schema) is identical either way.
    """
    try:  # pragma: no cover - container has no PIL
        import io

        from PIL import Image  # noqa: F401
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def _pil_ok(data: pd.Series) -> pd.Series:
            def check(b):
                if b is None:
                    return False
                try:
                    Image.open(io.BytesIO(b)).verify()
                    return True
                except Exception:
                    return False

            return data.map(check)

        ok = _pil_ok(F.col(data_col))
    except ImportError:
        ok = F.when(F.col(data_col).isNull(), F.lit(False)).otherwise(
            _magic_prefix_ok(F.col(data_col))
        )
    return fetched_photos_df.withColumn("image_ok", ok)


def fanin_photos(photo_results_df: DataFrame) -> DataFrame:
    """J2 barrier: per-card completion with reference first-error semantics.

    Input: (card_id, photo_seq, photo_id, photo_ok:boolean, error:string?).
    Output: (card_id, photos_ok, n_photos, first_error) — photos_ok true iff
    EVERY photo succeeded; first_error is the lowest-photo_seq failure
    (PhotosForCardCrawler.fs:57-62 reports the first failure as the card
    result).  One hash aggregation; partial aggregation map-side.
    """
    failed_seq = F.when(~F.col("photo_ok"), F.col("photo_seq"))
    return photo_results_df.groupBy("card_id").agg(
        F.every(F.col("photo_ok")).alias("photos_ok"),
        F.count("*").alias("n_photos"),
        F.min_by(F.col("error"), failed_seq).alias("first_error"),
    )


def cards_with_photo_status(cards_df: DataFrame, fanin_df: DataFrame) -> DataFrame:
    """Join the barrier result back; photo-less cards complete immediately
    (PhotosForCardCrawler.fs:38-40)."""
    out = cards_df.join(fanin_df, cards_df["id"] == fanin_df["card_id"], "left").drop(
        "card_id"
    )
    return out.withColumn(
        "photos_ok", F.coalesce(F.col("photos_ok"), F.lit(True))
    ).withColumn("n_photos", F.coalesce(F.col("n_photos"), F.lit(0)))
