"""Golden parser tests — port of /root/reference/Tests/Pet911Parsing.fs (23 facts).

Pure-Python (no Spark) so the extraction kernels are pinned byte-for-byte
against the reference's HTML fixtures before they go into pandas UDFs.
"""

from datetime import datetime, timezone
from pathlib import Path

import pytest

from crawler_spark.html import pet911
from crawler_spark.html.dom import parse_html

DATA_DIR = Path("/root/reference/data/20240114")


def load(filename: str):
    text = (DATA_DIR / filename).read_text(encoding="utf-8")
    return parse_html(text), text


def ok(result):
    value, err = result
    assert err is None, f"expected success, got error: {err}"
    return value


def test_extract_card_id():  # Pet911Parsing.fs:22-28
    doc, _ = load("petCard_rf518209.html.dump")
    assert ok(pet911.get_card_id(doc)) == "rf518209"


def test_extract_species_lost_cat_female():  # :30-36
    doc, _ = load("petCard_rl518787.html.dump")
    assert ok(pet911.get_animal_species(doc)) == pet911.SPECIES_CAT


def test_extract_species_found_dog_male():  # :38-44
    doc, _ = load("petCard_rf518209.html.dump")
    assert ok(pet911.get_animal_species(doc)) == pet911.SPECIES_DOG


def test_extract_species_lost_cat_male():  # :46-52
    doc, _ = load("petCard_rl537378_lost_cat_male.html.dump")
    assert ok(pet911.get_animal_species(doc)) == pet911.SPECIES_CAT


def test_extract_photo_urls():  # :55-68
    doc, _ = load("petCard_rl518787.html.dump")
    urls = ok(pet911.get_photo_urls(doc))
    assert len(urls) == 7
    for u in [
        "https://cdn.pet911.ru/Pet_165095340062678cb83dea18.58046461.webp",
        "https://cdn.pet911.ru/Pet_165095343462678cda7583a1.69548470.webp",
        "https://cdn.pet911.ru/Pet_165095351562678d2bb44ab4.37666840.webp",
        "https://cdn.pet911.ru/Pet_165095351662678d2c27d440.01200981.webp",
        "https://cdn.pet911.ru/Pet_165095355562678d53ce94c6.03768364.webp",
        "https://cdn.pet911.ru/Pet_165095355662678d54a27803.69782174.webp",
        "https://cdn.pet911.ru/Pet_165095355762678d5570db96.27027701.webp",
    ]:
        assert u in urls


@pytest.mark.parametrize(
    "url,expected",
    [
        (  # :70-73 CDN 1
            "https://cdn.pet911.ru/thumb_1654448834629ce2c249c577.33157738_image.webp",
            "thumb_1654448834629ce2c249c577.33157738_image.webp",
        ),
        (  # :75-78 CDN 2
            "https://cdn.pet911.ru/thumb_Pet_165095343462678cda7583a1.69548470.webp",
            "thumb_Pet_165095343462678cda7583a1.69548470.webp",
        ),
        (  # :80-83 CDN 3
            "https://cdn.pet911.ru/thumb_165521764662a89dee7a9f67.94353445_1.webp",
            "thumb_165521764662a89dee7a9f67.94353445_1.webp",
        ),
        (  # :85-88 upload
            "https://pet911.ru/upload/d2/2022_06/165521425862a890b29d17a3.55330430_7BA6C9051EFD4B21A537967B2D129936.jpeg",
            "165521425862a890b29d17a3.55330430_7BA6C9051EFD4B21A537967B2D129936.jpeg",
        ),
    ],
)
def test_extract_photo_id(url, expected):
    assert ok(pet911.get_photo_id(url)) == expected


def test_card_with_no_photos():  # :90-96
    doc, _ = load("petCard_rl518678_no_photos.html.dump")
    assert ok(pet911.get_photo_urls(doc)) == []


def test_extract_event_time():  # :98-104
    doc, _ = load("petCard_rf518209.html.dump")
    assert ok(pet911.get_event_time_utc(doc)) == datetime(2022, 4, 22, tzinfo=timezone.utc)


def test_extract_author_name_found_card():  # :106-112
    doc, _ = load("petCard_rf518209.html.dump")
    assert ok(pet911.get_author_name(doc)) == "Максим"


def test_extract_author_name_lost_card():  # :114-120
    doc, _ = load("petCard_rl527005_lost_author_name.html.dump")
    assert ok(pet911.get_author_name(doc)) == "Дмитрий"


def test_extract_author_name_lost_card_that_is_found():  # :122-128
    doc, _ = load("petCard_rl537200_lost_is_found.html.dump")
    assert ok(pet911.get_author_name(doc)) is None


def test_extract_author_message():  # :130-136
    doc, _ = load("petCard_rf518209.html.dump")
    assert ok(pet911.get_author_message(doc)) == (
        "Нашли на улице, лежал с раненной лапой. Есть ошейник."
    )


def test_extract_event_address():  # :138-144
    doc, _ = load("petCard_rl518787.html.dump")
    assert ok(pet911.get_event_address(doc)) == "улица Брянский Пост, 6 с1А, Москва"


def test_extract_animal_sex():  # :146-152
    doc, _ = load("petCard_rf518209.html.dump")
    assert ok(pet911.get_animal_sex(doc)) == pet911.SEX_MALE


def test_animal_sex_unknown():  # :154-160
    doc, _ = load("petCard_rf494618_no_sex.html.dump")
    assert ok(pet911.get_animal_sex(doc)) == pet911.SEX_UNKNOWN


def test_no_author():  # :162-169
    doc, _ = load("petCard_rf494610_no_author.html.dump")
    assert ok(pet911.get_author_name(doc)) is None


def test_extract_event_type_loss():  # :171-177
    doc, _ = load("petCard_rl518787.html.dump")
    assert ok(pet911.get_event_type(doc)) == pet911.EVENT_LOST


def test_extract_event_type_find():  # :179-185
    doc, _ = load("petCard_rf518209.html.dump")
    assert ok(pet911.get_event_type(doc)) == pet911.EVENT_FOUND


def test_extract_event_coords():  # :187-196
    _, text = load("petCard_rl518787.html.dump")
    lat, lon = ok(pet911.get_event_coords(text))
    assert lat == pytest.approx(55.77292439, abs=1e-10)
    assert lon == pytest.approx(37.55103469, abs=1e-10)


def test_extract_cards_from_catalog():  # :198-207
    doc, _ = load("catalog.html.dump")
    cards = ok(pet911.get_catalog_cards(doc))
    assert len(cards) == 20
    assert any(
        c["ID"] == "rl784284" and c["url"] == "https://pet911.ru/moskva/lost/cat/rl784284"
        for c in cards
    )


def test_issue_45_temp_image_locations():  # :209-217
    text = Path("/root/reference/data/20220724/rl546939.html.dump").read_text(
        encoding="utf-8"
    )
    urls = ok(pet911.get_photo_urls(parse_html(text)))
    assert len(urls) > 0


def test_issue_52_event_type():  # :219-225
    doc, _ = load("petCard_rf777439_issue_52.html.dump")
    assert ok(pet911.get_event_type(doc)) == pet911.EVENT_FOUND


def test_parse_photo_id():  # Utils.fs:36-40
    assert pet911.parse_photo_id("rl123/photo.webp") == ("rl123", "photo.webp")
    assert pet911.parse_photo_id("no-slash") is None
    assert pet911.parse_photo_id("a/b/c") is None


def test_parse_card_full_assembly():
    # end-to-end assembly on the richest fixture (photos + coords + author)
    _, text = load("petCard_rl518787.html.dump")
    card = pet911.parse_card(text)
    assert card["error"] is None
    assert card["id"] == "rl518787"
    assert card["animal"] == pet911.SPECIES_CAT
    assert card["sex"] == pet911.SEX_FEMALE
    assert card["type"] == pet911.EVENT_LOST
    assert card["address"] == "улица Брянский Пост, 6 с1А, Москва"
    assert card["latitude"] == pytest.approx(55.77292439)
    assert card["longitude"] == pytest.approx(37.55103469)
    assert len(card["photos"]) == 7
    assert card["photos"][0]["ID"].startswith("rl518787/")


def test_parse_card_short_circuit_error_order():
    # a page with no recognizable markup fails on the FIRST extractor in the
    # reference chain: getAnimalSpecies (CrawlerPet911.fs:110-111)
    card = pet911.parse_card("<html><body><p>nothing here</p></body></html>")
    assert card["error"] == "Can't find breadcrumb nodes"
    assert card["id"] is None


def test_older_fixture_eras_parse_without_crash():
    # FIXTURES.md §2: older eras should go through parse_card without raising
    for era_dir in ["2021", "20220430", "20220628"]:
        p = Path("/root/reference/data") / era_dir
        if not p.exists():
            continue
        for f in sorted(p.glob("*.html.dump")):
            text = f.read_text(encoding="utf-8", errors="replace")
            card = pet911.parse_card(text)  # may be an error result, must not raise
            assert "error" in card


def test_fast_scanner_tree_identical_to_stdlib():
    """The fast tokenizer (html/scanner.py) must build the EXACT tree the
    stdlib engine builds — attrs, text, subtree spans — over every reference
    fixture era and a set of hostile shapes (which may route through the
    stdlib fallback; the public parse_html must agree either way)."""
    from crawler_spark.html.dom import parse_html, parse_html_stdlib

    def tree_sig(root):
        out, stack = [], [(root, 0)]
        while stack:
            n, d = stack.pop()
            out.append((
                d, n.tag,
                tuple(sorted(n.attrs.items())) if n.tag else n.text,
                n._start, n._end,
            ))
            stack.extend((c, d + 1) for c in reversed(n.children))
        return out

    seen_pages = 0
    for era_dir in ["20240114", "2021", "20220430", "20220628"]:
        p = Path("/root/reference/data") / era_dir
        if not p.exists():
            continue
        for f in sorted(p.glob("*.dump")):
            text = f.read_text(encoding="utf-8", errors="replace")
            assert tree_sig(parse_html(text)) == tree_sig(
                parse_html_stdlib(text)
            ), f.name
            seen_pages += 1
    assert seen_pages >= 11

    probes = [
        "", "<", "a<b", "<html><body><p>x",
        "<script>if(a<b){}</script>done",
        "<div class='x' data-a=1 b>t</div>",
        "<!-- unterminated", "<![CDATA[x]]>", "</p junk>",
        "<a href=/x/>y</a>",
        "<style>.a{content:'</div>'}</style>ok",
        "<br/><BR><input type=text>",
        '<a href="x?b=1&amp;c=2">t</a>',
        '<div a="1" a="2">d</div>',
        '<div class="a"x="b">t</div>',
        "<script></scriptx></script>s",
        "<p>a<div>b</div><li>c<li>d",
    ]
    for probe in probes:
        assert tree_sig(parse_html(probe)) == tree_sig(
            parse_html_stdlib(probe)
        ), repr(probe)


def test_fallback_counter_and_udf_flag(spark):
    """dom.FALLBACK_COUNT increments exactly on stdlib fallback, and the
    parse UDF surfaces the per-row parse_fallback telemetry flag."""
    from crawler_spark.html import dom
    from crawler_spark.functions.parse_udfs import with_parsed_card

    before = dom.FALLBACK_COUNT
    dom.parse_html("<html><body><p>clean</p></body></html>")
    assert dom.FALLBACK_COUNT == before          # in-subset: no fallback
    dom.parse_html("<div><!-- unterminated")
    assert dom.FALLBACK_COUNT == before + 1      # out-of-subset: one

    _, good = load("petCard_rf518209.html.dump")
    hostile = "<div class='card'><!-- unterminated"
    df = spark.createDataFrame(
        [("good", good), ("hostile", hostile)], "tag string, text string")
    out = {r["tag"]: r["parse_fallback"]
           for r in with_parsed_card(df, "text").collect()}
    assert out == {"good": False, "hostile": True}
