"""Fast HTML tokenizer feeding the same _DomBuilder as the stdlib engine.

The stdlib ``html.parser`` tokenizer was >80% of parse-kernel time
(BENCH.md §5.3): its ``goahead`` loop re-scans for "interesting" characters,
dispatches one callback per text fragment / entity ref / tag, and pays
buffered-input bookkeeping the batch engine never needs (documents arrive
whole).  This scanner walks the document once with direct ``str.find`` /
anchored-regex steps and emits the same token stream.

Byte-identity strategy — this is the load-bearing design point:

* **Same attribute/tag grammar by construction**: the scanner anchors with
  the stdlib's OWN compiled module-level regexes (``tagfind_tolerant``,
  ``attrfind_tolerant``, ``locatestarttagend_tolerant``, ``endtagfind``),
  so any markup both engines accept tokenizes identically.
* **Fallback, never divergence**: any construct outside the verified subset
  (malformed end tags, marked sections, unterminated comments, junk between
  attributes and ``>``) raises :class:`FallbackNeeded` and the caller
  re-parses the WHOLE document with the stdlib engine.  The scanner is an
  optimization with a proof obligation, not a second dialect.
* Entity/char refs in text stay raw (HAP ``InnerText`` semantics) — the
  scanner simply never splits text at ``&``, which coalesces to the same
  text nodes the stdlib path builds via ``handle_entityref``.
* script/style CDATA replicates ``parse_endtag``'s cdata_elem behavior
  exactly: a ``</script...`` that is not a clean end tag becomes text and
  scanning continues.

Equivalence is asserted over every reference fixture page and hostile
probes in tests/test_parser_golden.py (tree-serialization equality plus
golden parse results through both engines).
"""

from __future__ import annotations

import html.parser as _hp
import re
from html import unescape

from .dom import Node, _DomBuilder

_TAGFIND = _hp.tagfind_tolerant
_ATTRFIND = _hp.attrfind_tolerant
_LOCATESTART = _hp.locatestarttagend_tolerant
_ENDTAGFIND = _hp.endtagfind

_CDATA_ELEMENTS = ("script", "style")  # HTMLParser.CDATA_CONTENT_ELEMENTS
_CDATA_OPEN = {
    tag: re.compile(rf"</\s*{tag}", re.IGNORECASE) for tag in _CDATA_ELEMENTS
}


class FallbackNeeded(Exception):
    """Markup outside the scanner's verified subset — reparse with stdlib."""


# One-regex fast path for the overwhelmingly common start-tag shape:
# whitespace-separated double-quoted entity-free attributes.  Anything it
# accepts, the tolerant grammar tokenizes to the same (name, value) pairs
# (quoted values stripped, no '&' so no unescape), so the two paths cannot
# disagree; anything else falls into the tolerant path.
_SIMPLE_START = re.compile(
    r'<([a-zA-Z][a-zA-Z0-9-]*)'
    r'((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*="[^"&]*")*)'
    r"\s*(/?)>"
)
_SIMPLE_ATTR = re.compile(r'([a-zA-Z_:][-a-zA-Z0-9_:.]*)="([^"&]*)"')

# Entity handling must reproduce the stdlib builder's established behavior
# (the pipeline's byte-identity baseline since round 1): a well-formed ref
# passes through verbatim, an UNTERMINATED named/numeric ref gets a ';'
# appended (HTMLParser reports it via handle_entityref/handle_charref and
# the builder re-serializes with ';'), and an '&' that starts no ref is
# plain text.  Incomplete refs at EOF hit HTMLParser buffer-boundary quirks
# (drops) — those route to the stdlib fallback rather than being imitated.
_ENTITY = re.compile(r"&([a-zA-Z][-.a-zA-Z0-9]*|#(?:[0-9]+|[xX][0-9a-fA-F]+))(;?)")
_EOF_INCOMPLETE = re.compile(r"&[-.a-zA-Z0-9#]*\Z")


def _emit_text(builder: _DomBuilder, s: str, at_eof: bool) -> None:
    if "&" not in s:
        builder.handle_data(s)
        return
    if at_eof and _EOF_INCOMPLETE.search(s):
        raise FallbackNeeded("incomplete entity at EOF")
    out = []
    i, n = 0, len(s)
    while True:
        a = s.find("&", i)
        if a < 0:
            out.append(s[i:])
            break
        out.append(s[i:a])
        m = _ENTITY.match(s, a)
        if m is not None:
            out.append(f"&{m.group(1)};")  # ';' normalized in if missing
            i = m.end()
        else:
            out.append("&")
            i = a + 1
    builder.handle_data("".join(out))


_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")

# Skip-mode jump targets (pruning builders only): the next position that
# can possibly matter to the pruned tree.  A triggering element MUST carry
# a literal `class` attribute NAME (attribute names are never
# entity-encoded — an encoded name is a different attribute to every
# engine), so stopping at every case-insensitive "class" token catches
# every candidate tag no matter how its VALUE is quoted or encoded.
# script/style/comment/declaration/PI openers stop the leap earlier so
# raw-text and commented regions are consumed by the normal construct
# handlers and fake markup inside them can never trigger a build.
_SKIP_STOP = re.compile(r"<(?i:script|style)|<!|<\?|(?i:class)")


def parse_html_fast(text: str, builder: _DomBuilder | None = None) -> Node:
    if builder is None:
        builder = _DomBuilder()
    n = len(text)
    i = 0
    find = text.find
    startswith = text.startswith
    handle_data = builder.handle_data
    handle_starttag = builder.handle_starttag
    handle_startendtag = builder.handle_startendtag
    handle_endtag = builder.handle_endtag
    simple_match = _SIMPLE_START.match
    attr_findall = _SIMPLE_ATTR.findall
    endtag_match = _ENDTAGFIND.match
    skip_search = _SKIP_STOP.search
    rfind = text.rfind
    pre = builder.skip_prefilter
    can_jump = builder.skip_jump
    while i < n:
        if can_jump and not builder.wants_text:
            # skip mode: leap to the next position that can matter
            sm = skip_search(text, i)
            if sm is None:
                break  # rest of the document is invisible
            j = sm.start()
            if text[j] == "<":
                i = j  # construct opener: normal handling below
            else:
                # "class" token: find its enclosing start tag, if any
                lt = rfind("<", i, j + 1)
                if lt < 0 or text[lt + 1: lt + 2] not in _ASCII_LETTERS:
                    i = sm.end()  # plain text / end-tag innards: invisible
                    continue
                i = lt  # tokenize the candidate tag normally below
        lt = find("<", i)
        if lt < 0:
            # a pruning builder drops skip-mode text before entity work
            # (incomplete-entity-at-EOF inside DROPPED text needs no
            # stdlib-parity fallback: nothing reads it)
            if builder.wants_text:
                _emit_text(builder, text[i:], at_eof=True)
            break
        if lt > i and builder.wants_text:
            _emit_text(builder, text[i:lt], at_eof=False)
        i = lt
        c = text[lt + 1: lt + 2]
        if c in _ASCII_LETTERS:
            m = simple_match(text, lt)
            if m is not None:
                tag, raw_attrs, close = m.group(1, 2, 3)
                tag = tag.lower()
                # skip-mode fast path: a pruning builder only needs attrs
                # to decide triggering, and a trigger substring in any
                # class VALUE necessarily appears in the raw attribute
                # text — so when the raw text contains no trigger, skip
                # attribute tokenization entirely (conservative: raw hits
                # from non-class attrs just take the exact path below)
                if raw_attrs and (pre is None or pre(raw_attrs)):
                    attrs = [
                        (k.lower(), v) for k, v in attr_findall(raw_attrs)
                    ]
                else:
                    attrs = ()
                if close:
                    handle_startendtag(tag, attrs)
                    i = m.end()
                else:
                    handle_starttag(tag, attrs)
                    i = (
                        _cdata(builder, text, m.end(), tag)
                        if tag in _CDATA_ELEMENTS else m.end()
                    )
            else:
                i = _starttag(builder, text, lt)
        elif c == "/":
            m = endtag_match(text, lt)
            if m is None:
                raise FallbackNeeded("malformed end tag")
            handle_endtag(m.group(1).lower())
            i = m.end()
        elif startswith("<!--", lt):
            end = find("-->", lt + 4)
            if end < 0:
                raise FallbackNeeded("unterminated comment")
            i = end + 3  # comments contribute nothing
        elif c == "!":
            if startswith("<![", lt):
                raise FallbackNeeded("marked section")
            end = find(">", lt + 2)
            if end < 0:
                raise FallbackNeeded("unterminated declaration")
            i = end + 1  # doctype/decl ignored
        elif c == "?":
            end = find(">", lt + 2)
            if end < 0:
                raise FallbackNeeded("unterminated processing instruction")
            i = end + 1  # PI ignored
        else:
            handle_data("<")  # stray '<' is text (stdlib behavior)
            i = lt + 1
    return builder.finish()


def _starttag(builder: _DomBuilder, text: str, i: int) -> int:
    """Tokenize one start tag at ``text[i] == '<'``; returns the next scan
    position.  Mirrors HTMLParser.parse_starttag's tolerant control flow on
    the stdlib's own regexes."""
    m = _LOCATESTART.match(text, i)
    if m is None:
        raise FallbackNeeded("unparseable start tag")
    end = m.end()
    ch = text[end: end + 1]
    if ch == ">":
        endpos = end + 1
    elif ch == "/" and text[end: end + 2] == "/>":
        endpos = end + 2
    else:
        raise FallbackNeeded("junk before start-tag close")
    tm = _TAGFIND.match(text, i + 1)
    tag = tm.group(1).lower()
    k = tm.end()
    attrs = []
    while k < endpos:
        am = _ATTRFIND.match(text, k)
        if am is None:
            break
        name, rest, value = am.group(1, 2, 3)
        if not rest:
            value = None
        elif value[:1] == "'" == value[-1:] or value[:1] == '"' == value[-1:]:
            value = value[1:-1]
        if value and "&" in value:
            value = unescape(value)  # attr values ARE entity-decoded (HAP)
        attrs.append((name.lower(), value))
        k = am.end()
    # self-closing is decided from the UNCONSUMED tail after the attribute
    # loop, exactly like parse_starttag: `<a<div/>` has tag name "a<div"
    # (the tolerant name charset admits '<') and tail "/>", i.e. STARTEND —
    # deriving it from the tag-end locator (which eats the '/') gets this
    # wrong.
    tail = text[k:endpos].strip()
    if tail == "/>":
        selfclose = True
    elif tail == ">":
        selfclose = False
    else:
        raise FallbackNeeded("junk between attributes and start-tag close")
    if selfclose:
        builder.handle_startendtag(tag, attrs)
        return endpos
    builder.handle_starttag(tag, attrs)
    if tag in _CDATA_ELEMENTS:
        return _cdata(builder, text, endpos, tag)
    return endpos


def _cdata(builder: _DomBuilder, text: str, pos: int, tag: str) -> int:
    """Raw-text content of script/style: ends only at a clean matching end
    tag; any other ``</tag…`` construct is data (parse_endtag's cdata_elem
    semantics, replicated token for token)."""
    n = len(text)
    opener = _CDATA_OPEN[tag]
    while True:
        m = opener.search(text, pos)
        if m is None:
            # unterminated rawtext at EOF: HTMLParser silently DROPS the
            # remaining content (goahead breaks in cdata mode without
            # emitting) — degenerate markup, let the stdlib engine own it
            raise FallbackNeeded("unterminated rawtext element")
        j = m.start()
        builder.handle_data(text[pos:j])
        gt = text.find(">", j + 1)
        if gt < 0:
            raise FallbackNeeded("unterminated cdata end tag")
        em = _ENDTAGFIND.match(text, j)
        if em is not None and em.group(1).lower() == tag:
            builder.handle_endtag(tag)
            return em.end()
        builder.handle_data(text[j: gt + 1])  # not our end tag: still data
        pos = gt + 1
