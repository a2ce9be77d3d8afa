"""Pruned-tree extractor equivalence gates.

The extractor hot path builds only trigger subtrees and LEAPS over
invisible regions (dom._PruningBuilder + scanner jump scan).  Its
contract is NOT tree equality — the pruned tree is intentionally partial
— but EXTRACTOR-RESULT equality: every P1-P15 extractor and the full
parse_card assembly must return byte-identical results over the pruned
tree and over the full stdlib tree, for every fixture era and for
adversarial generated markup (boundary-crossing end tags, fake markup
inside script/comments, entity-encoded classes, single-quoted triggers —
the constructs the jump scan must either handle or conservatively
fall back on).
"""

from __future__ import annotations

import glob

import pytest
from hypothesis import given, settings, strategies as st

from crawler_spark.html import pet911
from crawler_spark.html.dom import parse_html_stdlib

FIXTURES = sorted(glob.glob("/root/reference/data/*/*.html.dump"))

_EXTRACTORS = [
    pet911.get_card_id,
    pet911.get_animal_species,
    pet911.get_event_type,
    pet911.get_photo_urls,
    pet911.get_event_time_utc,
    pet911.get_author_name,
    pet911.get_author_message,
    pet911.get_event_address,
    pet911.get_animal_sex,
    pet911.get_catalog_cards,
]


def _assert_equivalent(text: str) -> None:
    pruned = pet911.parse_doc(text)
    full = parse_html_stdlib(text)
    for ex in _EXTRACTORS:
        assert ex(pruned) == ex(full), ex.__name__
    assert pet911.assemble_card(pruned, text) == pet911.assemble_card(
        full, text
    )


@pytest.mark.parametrize(
    "path", FIXTURES, ids=[p.split("/data/")[1] for p in FIXTURES]
)
def test_every_fixture_era_extracts_identically(path):
    _assert_equivalent(open(path, "rb").read().decode("utf-8", "replace"))


# adversarial generator: trigger classes in every quoting/encoding style,
# fake markup inside raw-text containers, boundary-crossing end tags
_CHUNKS = st.sampled_from([
    '<div class="card">', '<div class="card-information">',
    '<div class="card-info">', '<div class="card-info__value">',
    "<div class='card'>", "<div class=card>",            # tolerant quoting
    '<div class="c&#97;rd">', '<div class="card&amp;x">',  # entity values
    '<DIV CLASS="card">', '<div CLaSs="breadcrumbs x">',
    '<a class="breadcrumbs__item" href="/x">', '<img class="card" src="u">',
    '<p class="card-x">', '<li>', '<ul>', '<div>', '<span id="y">',
    "</div>", "</li>", "</ul>", "</p>", "</table>", "</span>",
    "<script>", "</script>", '<script>var x = "<div class=\'card\'>";</script>',
    '<!-- <div class="card">hidden</div> -->', "<!DOCTYPE html>",
    "<?php class card ?>", '<style>.card { color: red }</style>',
    "Номер объявления", "Пол питомца", "мужской", "собаки text",
    "plain class text", "a < b card", "&amp;", "&bogus", "x&y",
    "<div class=\"swiper-wrapper\">", '<a class="js-card-slide" href="h">',
    '<img src="https://pet911.ru/img/p/1.jpg">', "text",
    'initMap({lat: 1.5, lng: 2.5})',
])


@settings(max_examples=300, deadline=None)
@given(st.lists(_CHUNKS, min_size=0, max_size=25).map("".join))
def test_pruned_extraction_matches_full_on_fuzz(doc):
    _assert_equivalent(doc)
