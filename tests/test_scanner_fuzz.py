"""Property test: the fast scanner and the stdlib engine must build the
SAME tree for arbitrary HTML-ish input (the scanner may route through its
stdlib fallback — the public parse_html must agree either way).

This is the safety net for the parse-kernel byte-identity invariant
(BASELINE.json: byte-identical extracted text per url): the golden fixtures
pin real pages; the fuzz pins the grammar's corners.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

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


_TAGS = ["div", "p", "li", "b", "a", "br", "img", "script", "style", "tr", "td"]
_ATTR_FRAGMENTS = [
    ' class="card-info"', " class='x y'", ' href="u?a=1&amp;b=2"',
    " data-a=1", " b", ' class="card"', " a=b=c", ' x="">', " /",
]
_CHUNKS = st.one_of(
    st.sampled_from(
        [f"<{t}>" for t in _TAGS]
        + [f"</{t}>" for t in _TAGS]
        + [f"<{t}/>" for t in _TAGS]
        + ["text", " ", "&amp;", "&#65;", "&bogus", "<", ">", "</",
           "<!-- c -->", "<!DOCTYPE html>", "<?php x ?>", "a < b",
           "</p junk>", "<3", "x&y", "'", '"', "=", "/"]
    ),
    st.builds(
        lambda t, a: f"<{t}{a}>",
        st.sampled_from(_TAGS), st.sampled_from(_ATTR_FRAGMENTS),
    ),
    st.text(
        alphabet="ab<>&;\"'=/! -жф", min_size=0, max_size=12
    ),
)


@settings(max_examples=400, deadline=None)
@given(st.lists(_CHUNKS, min_size=0, max_size=20).map("".join))
def test_fast_scanner_matches_stdlib_on_fuzz(doc):
    assert tree_sig(parse_html(doc)) == tree_sig(parse_html_stdlib(doc))
