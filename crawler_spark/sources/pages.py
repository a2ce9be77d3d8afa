"""Deterministic synthesis of the ``pages`` fetch universe.

BASELINE.json input_hint: ``pages(url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)`` — a Common-Crawl-style table; a fetch is a join
against it instead of live HTTP (Downloader.fs:57-126 → F1/J3), and a url
absent from it is an HTTP 404 → ``Absent`` (Downloader.fs:116-117).

Two page populations:

1. **Fixture pages** — the reference's golden HTML dumps embedded verbatim
   (FIXTURES.md: "the pet911 rows should embed the verbatim reference fixture
   HTML so parser byte-identity is checked against real goldens").

2. **Synthetic card pages** — one pet911-shaped card page per row of the
   driver's ``documents`` table, every field derived deterministically from
   ``doc_id``.  Generation is 100% native Spark expressions (format_string /
   concat / date_format) — no Python per row — so it scales to any corpus
   size.  A configurable fraction of ids is withheld to exercise the
   404/missing path.  Synthetic photo bytes carry a real WEBP magic prefix
   for the image-validation operator.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url import card_id_to_url

FIXTURE_DIR = Path("/root/reference/data/20240114")

# deterministic synthetic id space: doc_id d -> num = NUM_BASE + d
NUM_BASE = 100_000
# every 7th id is withheld from `pages` -> fetch yields Absent -> missing set
ABSENT_MOD = 7

_CARD_HTML_PREFIX = """<!DOCTYPE html>
<html lang="ru">
<head><meta charset="UTF-8"><title>synthetic card</title></head>
<body>
<div class="breadcrumbs section-top__breadcrumbs">
<a class="link-gray-dk breadcrumbs__item" href="/">Pet911.ru</a>\
<a class="link-gray-dk breadcrumbs__item" href="/x">%s</a>\
<a class="link-gray-dk breadcrumbs__item" href="/y">%s</a>
</div>
<div class="card">
<div class="card__inner">
<div class="card__content">
<div class="card-slider"><div class="swiper-wrapper">
%s</div></div>
<div class="text text-lt card__descr content">
<p>%s</p>
</div>
</div>
<div class="card-map">
<div class="md-font card-map__address">%s</div>
</div>
<div class="card-information">
<div class="card-info">
<div class="gray-dk-color card-info__title">Номер объявления</div>
<div class="card-info__value">%s</div>
</div>
%s<div class="card-info">
<div class="gray-dk-color card-info__title">
%s </div>
<div class="card-info__value">%s</div>
</div>
%s</div>
</div>
</div>
<script>
    initMap(
        'map-single-pc',
        {
            lat: %s,
            lng: %s
        }
    );
</script>
</body>
</html>
"""


def _synthetic_card_html():
    """Column expression rendering a full card page from derived columns."""
    photo_slide = (
        '<div class="swiper-slide"><a href="https://cdn.pet911.ru/Pet_%s_%s.webp" '
        'class="card-slider__slide js-card-slide">'
        '<img class="img-crop" src="https://cdn.pet911.ru/Pet_%s_%s.webp" alt="photo">'
        "</a></div>\n"
    )
    # NB: sequence(1, 0) is DESCENDING [1,0] in Spark — guard the empty case
    photo_seq = F.when(
        F.col("n_photos") > 0, F.sequence(F.lit(1), F.col("n_photos"))
    ).otherwise(F.array().cast("array<int>"))
    slides = F.array_join(
        F.transform(
            photo_seq,
            lambda j: F.format_string(
                photo_slide,
                F.col("num").cast("string"), j.cast("string"),
                F.col("num").cast("string"), j.cast("string"),
            ),
        ),
        "",
    )
    sex_row = F.when(F.col("sex_code") == 0, F.lit("")).otherwise(
        F.format_string(
            '<div class="card-info">\n'
            '<div class="gray-dk-color card-info__title">Пол питомца</div>\n'
            '<div class="card-info__value">%s</div>\n</div>\n',
            F.when(F.col("sex_code") == 1, F.lit("Мужской")).otherwise(F.lit("Женский")),
        )
    )
    author_row = F.when(F.col("author_name").isNull(), F.lit("")).otherwise(
        F.format_string(
            '<div class="card-info">\n'
            '<div class="gray-dk-color card-info__title">\n%s </div>\n'
            '<div class="card-info__value">%s</div>\n</div>\n',
            F.when(F.col("kind") == "rl", F.lit("Имя хозяина")).otherwise(
                F.lit("Имя нашедшего")
            ),
            F.col("author_name"),
        )
    )
    return F.format_string(
        _CARD_HTML_PREFIX,
        F.col("breadcrumb_type"),   # Пропавшие / Найденные
        F.col("breadcrumb_species"),  # Собаки / Кошки
        slides,
        F.col("description"),
        F.col("address"),
        F.col("card_id"),
        sex_row,
        F.col("date_label"),  # Пропал(а) / Найден(а)
        F.col("date_value"),
        author_row,
        F.format_string("%.8f", F.col("lat")),
        F.format_string("%.8f", F.col("lon")),
    )


def synthetic_docs_from_range(spark: SparkSession, n: int,
                              num_partitions: int | None = None) -> DataFrame:
    """Range-derived stand-in for the documents table (doc_id, text, lang) —
    lets the pages corpus scale to any size for throughput benchmarks
    (documents.parquet tops out at a few thousand rows)."""
    rng = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    d = F.col("id")
    return rng.select(
        d.alias("doc_id"),
        F.format_string(
            "Synthetic pet description %d: lost near station %d, call owner %d. "
            "Distinctive collar number %d.",
            d, F.pmod(d, F.lit(977)), F.pmod(d, F.lit(9973)), d,
        ).alias("text"),
        F.lit("ru").alias("lang"),
    )


def synthetic_card_pages(spark: SparkSession, sf_dir: str,
                         docs_df: DataFrame | None = None) -> DataFrame:
    """One card page per ``documents`` row; fields derived from doc_id.

    Returns pages(url, warc_ts, html, text, lang) — all native expressions.
    """
    docs = docs_df if docs_df is not None else spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    derived = (
        docs.select("doc_id", "text", "lang")
        .withColumn("num", (d + F.lit(NUM_BASE)).cast("long"))
        .withColumn("kind", F.when(d % 2 == 0, F.lit("rf")).otherwise(F.lit("rl")))
        .withColumn("card_id", F.concat("kind", F.col("num").cast("string")))
        .withColumn(
            "breadcrumb_type",
            F.when(F.col("kind") == "rl", F.lit("Пропавшие")).otherwise(F.lit("Найденные")),
        )
        .withColumn(
            "breadcrumb_species",
            F.when(d % 3 == 0, F.lit("Собаки")).otherwise(F.lit("Кошки")),
        )
        .withColumn("sex_code", (d % 3).cast("int"))  # 0=absent,1=male,2=female
        .withColumn(
            "author_name",
            F.when(d % 5 == 0, F.lit(None).cast("string")).otherwise(
                F.format_string("Author_%d", d)
            ),
        )
        .withColumn("n_photos", (d % 4).cast("int"))
        .withColumn(
            "description",
            # sanitize markup-significant chars so embedded doc text round-trips
            # through InnerText byte-identically (entities stay raw in HAP)
            F.regexp_replace(F.substring(F.col("text"), 1, 400), "[<>&]", " "),
        )
        .withColumn("address", F.format_string("Улица %d, Москва", d % 1000))
        .withColumn(
            "date_label",
            F.when(F.col("kind") == "rl", F.lit("Пропал(а)")).otherwise(F.lit("Найден(а)")),
        )
        .withColumn(
            "date_value",
            F.date_format(
                F.date_add(F.to_date(F.lit("2020-01-01")), (d % 1000).cast("int")),
                "dd.MM.yyyy",
            ),
        )
        .withColumn("lat", F.lit(40.0) + (d % 2000).cast("double") / 100.0)
        .withColumn("lon", F.lit(30.0) + (d % 3000).cast("double") / 100.0)
    )
    page_text = _synthetic_card_html()
    return (
        derived
        # withheld ids simulate 404s (Absent → missing set)
        .where(d % ABSENT_MOD != 0)
        .select(
            card_id_to_url(F.col("card_id")).alias("url"),
            F.to_timestamp(F.lit("2024-01-14 00:00:00")).alias("warc_ts"),
            F.encode(page_text, "UTF-8").alias("html"),
            page_text.alias("text"),
            F.coalesce(F.col("lang"), F.lit("ru")).alias("lang"),
            F.lit("text/html; charset=utf-8").alias("mime"),
        )
    )


def synthetic_photo_pages(spark: SparkSession, sf_dir: str,
                          docs_df: DataFrame | None = None) -> DataFrame:
    """Photo-byte pages for every photo url referenced by synthetic cards.

    Bytes = 'RIFF....WEBPVP8 ' magic + deterministic payload; every 11th photo
    is withheld (missing photo path, Tests/Pet911Crawling.fs:76-123).
    """
    docs = docs_df if docs_df is not None else spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    photos = (
        docs.select("doc_id")
        .withColumn("num", (d + F.lit(NUM_BASE)).cast("long"))
        .withColumn("n_photos", (d % 4).cast("int"))
        .where((d % ABSENT_MOD != 0) & (F.col("n_photos") > 0))
        .select(
            "num",
            F.explode(F.sequence(F.lit(1), F.col("n_photos"))).alias("j"),
        )
        .where((F.col("num") * 4 + F.col("j")) % 11 != 0)
    )
    payload = F.format_string("WEBPVP8 synthetic-photo-%d-%d", F.col("num"), F.col("j"))
    return photos.select(
        F.format_string("https://cdn.pet911.ru/Pet_%d_%d.webp", F.col("num"), F.col("j")).alias("url"),
        F.to_timestamp(F.lit("2024-01-14 00:00:00")).alias("warc_ts"),
        F.concat(F.encode(F.lit("RIFF\x00\x00\x00\x00"), "UTF-8"), F.encode(payload, "UTF-8")).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit("image/webp").alias("mime"),
    )


# --------------------------------------------------------------------------
# Discovery universes (S4/S5): catalog listing pages + check-API JSON pages,
# derived from the same synthetic card id space.
# --------------------------------------------------------------------------

# NewCards.fs:12-17 — the four catalog query bases (animal × type)
CATALOG_BASES = (
    "https://pet911.ru/catalog?PetsSearch[animal]=2&PetsSearch[type]=1",
    "https://pet911.ru/catalog?PetsSearch[animal]=1&PetsSearch[type]=1",
    "https://pet911.ru/catalog?PetsSearch[animal]=2&PetsSearch[type]=2",
    "https://pet911.ru/catalog?PetsSearch[animal]=1&PetsSearch[type]=2",
)
CATALOG_PAGE_SIZE = 20
CHECK_API_URL = "https://pet911.ru/ajax/check-pet?art=%s"


def _catalog_membership():
    """(animal, type) of each synthetic card: animal 2=dog iff d%3==0 else
    1=cat; type 1=lost (rl) / 2=found (rf) — mirrors synthetic_card_pages."""
    d = F.col("doc_id")
    animal = F.when(d % 3 == 0, F.lit(2)).otherwise(F.lit(1))
    typ = F.when(d % 2 == 0, F.lit(2)).otherwise(F.lit(1))  # rf=found=2
    return animal, typ


def synthetic_catalog_pages(spark: SparkSession, sf_dir: str,
                            docs_df: DataFrame | None = None) -> DataFrame:
    """Catalog listing pages: per (animal,type) catalog, cards sorted num
    DESC, CATALOG_PAGE_SIZE hrefs per page (a.catalog-item__thumb, the node
    ParserPet911.fs:125-136 extracts).  Returns pages(url, warc_ts, html,
    text, lang) rows for every non-empty page of each catalog."""
    from pyspark.sql.window import Window

    docs = docs_df if docs_df is not None else spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    animal, typ = _catalog_membership()
    cards = (
        docs.select("doc_id")
        .withColumn("num", (d + F.lit(NUM_BASE)).cast("long"))
        .withColumn("kind", F.when(d % 2 == 0, F.lit("rf")).otherwise(F.lit("rl")))
        .withColumn("card_id", F.concat("kind", F.col("num").cast("string")))
        .withColumn("animal", animal)
        .withColumn("type", typ)
        # only cards that exist in the fetch universe are listed
        .where(d % ABSENT_MOD != 0)
    )
    w = Window.partitionBy("animal", "type").orderBy(F.col("num").desc())
    paged = cards.withColumn(
        "page", ((F.row_number().over(w) - 1) / CATALOG_PAGE_SIZE + 1).cast("int")
    )
    items = paged.withColumn(
        "item",
        F.format_string(
            '<div class="catalog-item"><a class="catalog-item__thumb" '
            'href="/pet/%s"><img src="/t.webp"></a></div>',
            F.col("card_id"),
        ),
    )
    rendered = (
        items.groupBy("animal", "type", "page")
        # collect_list order is NOT guaranteed by Spark — aggregate structs
        # carrying the sort key and array_sort before joining, so the page
        # bytes are deterministic by construction (num DESC via negated key)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("num")).alias("sort_key"),
                                F.col("item").alias("item"),
                            )
                        )
                    ),
                    lambda s: s["item"],
                ),
                "\n",
            ).alias("body")
        )
        .withColumn(
            "html_text",
            F.format_string(
                '<!DOCTYPE html><html><body><div class="catalog">\n%s\n</div></body></html>',
                F.col("body"),
            ),
        )
        .withColumn(
            "url",
            F.concat(
                F.element_at(
                    F.array(*[F.lit(b) for b in CATALOG_BASES]),
                    # base index per reference order (animal,type):
                    # (2,1)->1 (1,1)->2 (2,2)->3 (1,2)->4
                    F.when((F.col("animal") == 2) & (F.col("type") == 1), 1)
                    .when((F.col("animal") == 1) & (F.col("type") == 1), 2)
                    .when((F.col("animal") == 2) & (F.col("type") == 2), 3)
                    .otherwise(4),
                ),
                F.format_string("&page=%d", F.col("page")),
            ),
        )
    )
    return rendered.select(
        "url",
        F.to_timestamp(F.lit("2024-01-14 00:00:00")).alias("warc_ts"),
        F.encode(F.col("html_text"), "UTF-8").alias("html"),
        F.col("html_text").alias("text"),
        F.lit("ru").alias("lang"),
        F.lit("text/html; charset=utf-8").alias("mime"),
    )


def synthetic_checkapi_pages(spark: SparkSession, sf_dir: str,
                             docs_df: DataFrame | None = None) -> DataFrame:
    """check-pet search API JSON pages (NewCards.fs:68-91): one page per
    probe string `art`, data = cards whose decimal num string STARTS WITH
    art.  Probes generated: every full num (existence checks, D2) and every
    tens prefix (lookahead probes, D3).  Test-scale generator (theta join)."""
    docs = docs_df if docs_df is not None else spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    all_nums = (
        docs.select("doc_id")
        .withColumn("num", (d + F.lit(NUM_BASE)).cast("long"))
        .select("num", F.col("num").cast("string").alias("numstr"))
    )
    cards = (
        docs.select("doc_id")
        .withColumn("num", (d + F.lit(NUM_BASE)).cast("long"))
        .withColumn("kind", F.when(d % 2 == 0, F.lit("rf")).otherwise(F.lit("rl")))
        .withColumn("card_id", F.concat("kind", F.col("num").cast("string")))
        .where(d % ABSENT_MOD != 0)
        .select("num", "card_id", F.col("num").cast("string").alias("numstr"))
    )
    # probe pages exist for EVERY num (a search for a deleted card returns an
    # empty result page, not a 404 — Tests/Pet911Crawling.fs:142-158)
    arts = (
        all_nums.select(F.col("numstr").alias("art"))
        .unionByName(
            all_nums.select(
                F.expr("substr(numstr, 1, length(numstr) - 1)").alias("art")
            )
        )
        .where(F.length("art") > 0)
        .distinct()
    )
    hits = arts.join(cards, F.col("numstr").startswith(F.col("art")), "left")
    rendered = (
        hits.groupBy("art")
        # deterministic item order (num ASC): collect (num, item) structs and
        # array_sort before joining — collect_list alone has no order contract.
        # The when() guard keeps left-join misses out (null → dropped).
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("card_id").isNotNull(),
                                F.struct(
                                    F.col("num").alias("sort_key"),
                                    F.format_string(
                                        '{"url":"pet/%s"}', F.col("card_id")
                                    ).alias("item"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["item"],
                ),
                ",",
            ).alias("items"),
            F.count("card_id").alias("n"),
        )
        .withColumn(
            "json_text",
            F.when(F.col("n") == 0, F.lit('{"data":null}')).otherwise(
                F.format_string('{"data":[%s]}', F.col("items"))
            ),
        )
        .withColumn("url", F.format_string(CHECK_API_URL, F.col("art")))
    )
    return rendered.select(
        "url",
        F.to_timestamp(F.lit("2024-01-14 00:00:00")).alias("warc_ts"),
        F.encode(F.col("json_text"), "UTF-8").alias("html"),
        F.col("json_text").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit("application/json").alias("mime"),
    )


def fixture_pages(spark: SparkSession) -> DataFrame:
    """Reference golden dumps as pages keyed by their canonical card URL."""
    rows = []
    for f in sorted(FIXTURE_DIR.glob("petCard_*.html.dump")):
        card_id = f.stem.split("_")[1].split(".")[0]
        raw = f.read_bytes()
        rows.append((card_id, raw, raw.decode("utf-8", errors="replace")))
    df = spark.createDataFrame(rows, "card_id string, html binary, text string")
    return df.select(
        card_id_to_url(F.col("card_id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-14 00:00:00")).alias("warc_ts"),
        "html",
        "text",
        F.lit("ru").alias("lang"),
        F.lit("text/html; charset=utf-8").alias("mime"),
    )


def build_pages(spark: SparkSession, sf_dir: str, include_fixtures: bool = True,
                include_photos: bool = True,
                docs_df: DataFrame | None = None) -> DataFrame:
    """The full deterministic fetch universe for a scale factor."""
    pages = synthetic_card_pages(spark, sf_dir, docs_df)
    if include_photos:
        pages = pages.unionByName(synthetic_photo_pages(spark, sf_dir, docs_df))
    if include_fixtures:
        pages = pages.unionByName(fixture_pages(spark))
    return pages


def write_pages_bucketed(pages_df: DataFrame, path: str,
                         table_name: str = "pages_bucketed",
                         n_buckets: int = 32) -> DataFrame:
    """Persist the fetch universe BUCKETED by ``url_hash`` — the
    storage-partitioned-join layout the fetch path is designed around.

    This is the plain-parquet analog of an Iceberg ``bucket(N, url_hash)``
    partition transform: each file belongs to ``murmur3(url_hash) % N``, and
    Spark's catalog records the spec, so a subsequent join on ``url_hash``
    reads the big side WITHOUT any Exchange — only the (politeness-bounded)
    wave shuffles.  At 10^10 urls that is the difference between re-shuffling
    ~100 TB of page payloads every wave and shuffling a few GB of frontier
    descriptors (fetch.py:9-13).

    Returns the catalog-backed DataFrame whose scan carries the bucket spec
    (reading the parquet path directly would lose it).
    """
    from ..functions.url import url_hash as url_hash_fn

    spark = pages_df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    with_hash = pages_df.withColumn("url_hash", url_hash_fn(F.col("url")))
    (
        with_hash.write.format("parquet")
        .bucketBy(n_buckets, "url_hash")
        .sortBy("url_hash")
        .option("path", str(path))
        .mode("overwrite")
        .saveAsTable(table_name)
    )
    return spark.table(table_name)
