"""Minimal lenient HTML DOM built on the stdlib ``html.parser``.

The reference crawler parses pages with HtmlAgilityPack and a handful of
XPath selectors (``/root/reference/CrawlerPet911/ParserPet911.fs``).  This
module provides just enough DOM to re-express those selectors in Python with
HtmlAgilityPack-compatible semantics:

* ``inner_text`` concatenates descendant text nodes **without decoding HTML
  entities** (HAP ``InnerText`` keeps ``&quot;`` raw — see
  ``CrawlerLib/Downloader.fs:27-30`` decode + HAP behavior).
* attribute values *are* entity-decoded (HAP decodes attribute values).
* void elements and HTML5-ish implied end tags (``p``, ``li`` …) are handled
  so real-world markup nests the way HAP nests it.

This is intentionally not a general XPath engine: `find_all` supports the
descendant/child + class/exact-attr predicates the reference uses.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# open tags that implicitly close an open <p> (HTML5 spec subset)
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption figure "
    "footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p pre section "
    "table ul".split()
)

# tag -> set of open ancestors it implicitly closes when re-opened
_SELF_NESTING_CLOSERS = {
    "li": {"li"},
    "option": {"option"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
}


class Node:
    """One element / text node.  ``tag`` is None for text nodes.

    ``_start``/``_end`` are document-order subtree spans (element counter at
    open / after close), letting the lazy per-document query index answer
    "descendant of X" by interval containment instead of re-walking the
    tree for every selector (the parse kernel runs ~20 selector scans per
    card — the index makes each one a dict lookup + span filter).
    """

    __slots__ = ("tag", "attrs", "children", "parent", "text",
                 "_start", "_end", "_index")

    def __init__(self, tag, attrs=None, parent=None, text=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children = []
        self.parent = parent
        self.text = text
        self._start = 0
        self._end = 0
        self._index = None  # on the document root: (class_index, tag_index)

    # -- HAP-compatible accessors -------------------------------------------------
    def inner_text(self):
        """Concatenated descendant text, entities left un-decoded (HAP InnerText)."""
        if self.tag is None:
            return self.text
        out = []
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.tag is None:
                out.append(n.text)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    def inner_html(self):
        """Serialized children (attribute quoting is normalized; the reference
        only ever substring-matches InnerHtml, ParserPet911.fs:24-31)."""
        return "".join(_serialize(c) for c in self.children)

    def get(self, name, default=None):
        return self.attrs.get(name, default)

    def classes(self):
        return (self.attrs.get("class") or "").split()

    # -- tiny query engine --------------------------------------------------------
    def iter_descendants(self):
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.tag is not None:
                yield n
                stack.extend(reversed(n.children))

    def _document_index(self):
        """Lazy whole-document (class→nodes, tag→nodes) index on the root —
        built ONCE per parsed page by a single walk, amortized over every
        subsequent selector."""
        root = self
        while root.parent is not None:
            root = root.parent
        if root._index is None:
            class_index: dict = {}
            tag_index: dict = {}
            stack = list(reversed(root.children))
            while stack:
                n = stack.pop()
                if n.tag is None:
                    continue
                tag_index.setdefault(n.tag, []).append(n)
                cls = n.attrs.get("class")
                if cls is not None:
                    class_index.setdefault(cls, []).append(n)
                stack.extend(reversed(n.children))
            root._index = (class_index, tag_index)
        return root._index

    def find_all(self, tag=None, class_exact=None, class_contains=None):
        """All descendant elements matching tag + class predicate, doc order.

        ``class_exact``    → XPath ``[@class='x']`` (whole attribute string equal)
        ``class_contains`` → XPath ``[contains(@class,'x')]`` (raw substring)

        Served from the per-document index: candidate lists are in document
        order by construction; subtree anchoring is the ``_start``/``_end``
        span check (strictly inside this node's interval = descendant).
        """
        class_index, tag_index = self._document_index()
        if class_exact is not None:
            candidates = class_index.get(class_exact, ())
        elif class_contains is not None:
            lists = [
                nodes for cls, nodes in class_index.items()
                if class_contains in cls
            ]
            if not lists:
                candidates = ()
            elif len(lists) == 1:
                candidates = lists[0]
            else:
                candidates = sorted(
                    (n for ns in lists for n in ns), key=lambda n: n._start
                )
        elif tag is not None:
            candidates = tag_index.get(tag, ())
        else:
            return list(self.iter_descendants())
        lo, hi = self._start, self._end
        anchored = self.parent is not None  # document root spans everything
        out = []
        for n in candidates:
            if tag is not None and n.tag != tag:
                continue
            if anchored and not (lo < n._start < hi):
                continue
            out.append(n)
        return out

    def child_elements(self, tag=None):
        return [c for c in self.children if c.tag is not None and (tag is None or c.tag == tag)]


def _serialize(n: Node) -> str:
    if n.tag is None:
        return n.text
    attrs = "".join(
        f' {k}="{v}"' if v is not None else f" {k}" for k, v in n.attrs.items()
    )
    if n.tag in VOID_ELEMENTS and not n.children:
        return f"<{n.tag}{attrs}>"
    inner = "".join(_serialize(c) for c in n.children)
    return f"<{n.tag}{attrs}>{inner}</{n.tag}>"


class _DomBuilder:
    """Tokenizer-independent tree construction: void elements, implied end
    tags, subtree spans, text-node coalescing.  Both the stdlib-HTMLParser
    builder and the fast scanner feed tokens through these methods, so the
    two engines produce IDENTICAL trees by construction wherever their
    tokenizations agree (equivalence-tested over every reference fixture)."""

    wants_text = True  # the tokenizer may skip text work when False
    skip_prefilter = None  # None = attrs always needed (full tree)
    skip_jump = False  # full tree: every token matters, never leap

    def __init__(self):
        self.root = Node("#document")
        self.stack = [self.root]
        self._counter = 0  # element doc-order counter for subtree spans

    # attribute values arrive entity-DECODED (matches HAP).
    def handle_starttag(self, tag, attrs):
        self._implied_end(tag)
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        node._start = self._counter
        self._counter += 1
        node._end = self._counter  # final for leaves; re-set at close
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._implied_end(tag)
        node = Node(tag, dict(attrs), parent=self.stack[-1])
        node._start = self._counter
        self._counter += 1
        node._end = self._counter
        self.stack[-1].children.append(node)

    def _pop_to(self, i):
        for n in self.stack[i:]:
            n._end = self._counter
        del self.stack[i:]

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        # close up to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                self._pop_to(i)
                return

    def _implied_end(self, tag):
        top = self.stack[-1].tag
        if top == "p" and tag in _P_CLOSERS:
            self._pop_to(len(self.stack) - 1)
            return
        closers = _SELF_NESTING_CLOSERS.get(tag)
        if closers and top in closers:
            self._pop_to(len(self.stack) - 1)

    def _append_text(self, data):
        parent = self.stack[-1]
        if parent.children and parent.children[-1].tag is None:
            parent.children[-1].text += data
        else:
            parent.children.append(Node(None, parent=parent, text=data))

    def handle_data(self, data):
        if data:
            self._append_text(data)

    def finish(self) -> Node:
        for n in self.stack:  # unclosed-at-EOF elements span to the end
            n._end = self._counter
        return self.root


class _PruningBuilder:
    """Build-only-what-the-extractors-read tree construction.

    The P1-P15 parse kernel runs ~20 selectors, ALL of which anchor inside
    subtrees whose root element's class attribute contains one of a small
    set of trigger substrings (pet911: "card" / "breadcrumbs" /
    "catalog-item" — every class the selectors name contains one of these,
    and every nested lookup starts from a node matched that way).  Outside
    a triggered subtree this builder materializes NOTHING: elements become
    lightweight tag-name string frames (nesting bookkeeping only — implied
    ends, stray end tags and void elements behave exactly like
    _DomBuilder's stack), text is dropped before entity work
    (``wants_text`` gates the tokenizer's text path), and the element
    counter still advances so built nodes carry the IDENTICAL
    ``_start``/``_end`` spans they would in the full tree (asserted in
    tests/test_parser_golden.py).  Inside a triggered subtree every
    descendant builds normally; triggered roots parent to the document
    root (no selector inspects ancestors).

    The pruned tree therefore yields byte-identical extractor results to
    the full tree whenever the triggers cover the selector set — gated by
    the 23 goldens, a per-extractor full-vs-pruned equality sweep over
    every fixture era, and the adversarial fuzz comparison.
    """

    skip_jump = True  # the tokenizer may leap over invisible regions

    def __init__(self, trigger_substrings):
        self.root = Node("#document")
        self.stack = [self.root]  # BUILT frames only (root + open Nodes)
        self._counter = 0
        self._active = None  # build parent Node while inside a triggered subtree
        self._trigger = tuple(trigger_substrings)
        self.wants_text = False  # plain attr, updated on mode transitions

    def skip_prefilter(self, raw_attrs: str) -> bool:
        """Does the tokenizer need to parse this start tag's attributes?
        Yes while building (the node stores them); in skip mode only if
        the raw attribute text could contain a trigger class (substring
        containment is conservative: the exact class check happens in
        _open on the parsed attrs; entity-obfuscated values never reach
        this path — _SIMPLE_START rejects '&' in values, routing those
        tags through the tolerant parser with decoded attrs)."""
        if self._active is not None:
            return True
        for t in self._trigger:
            if t in raw_attrs:
                return True
        return False

    def _open(self, tag, attrs, push):
        # implied end over BUILT frames only (skip-mode elements are
        # invisible: their implied closes can affect no built node, and a
        # trigger root always parents to the document root)
        top = self.stack[-1]
        if top is not self.root:
            ttag = top.tag
            if (ttag == "p" and tag in _P_CLOSERS) or (
                ttag in _SELF_NESTING_CLOSERS.get(tag, ())
            ):
                self._pop_to(len(self.stack) - 1)
        parent = self._active
        if parent is None:
            cls = None
            for k, v in attrs:
                if k == "class":
                    cls = v
                    break
            if cls is None or not any(t in cls for t in self._trigger):
                return  # invisible
            parent = self.root
        node = Node(tag, dict(attrs), parent=parent)
        node._start = self._counter
        self._counter += 1
        node._end = self._counter
        parent.children.append(node)
        if push:
            self.stack.append(node)
            self._active = node
            self.wants_text = True

    def handle_starttag(self, tag, attrs):
        self._open(tag, attrs, push=tag not in VOID_ELEMENTS)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs, push=False)

    def _pop_to(self, i):
        for f in self.stack[i:]:
            f._end = self._counter
        del self.stack[i:]
        top = self.stack[-1]
        if top is not self.root:
            self._active = top
            self.wants_text = True
        else:
            self._active = None
            self.wants_text = False

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        stack = self.stack
        for i in range(len(stack) - 1, 0, -1):
            if stack[i].tag == tag:
                self._pop_to(i)
                return
        if len(stack) > 1:
            # Ambiguous while building: with skipped outer elements not
            # tracked, this end tag is either stray (full tree ignores it)
            # or closes a skipped ancestor (full tree would close the
            # build root with it).  Never guess — reparse the whole
            # document with the full engine.
            from .scanner import FallbackNeeded

            raise FallbackNeeded("end tag crosses pruned boundary")

    def handle_data(self, data):
        parent = self._active
        if parent is None or not data:
            return
        if parent.children and parent.children[-1].tag is None:
            parent.children[-1].text += data
        else:
            parent.children.append(Node(None, parent=parent, text=data))

    def finish(self) -> Node:
        for f in self.stack:
            f._end = self._counter
        return self.root


class _TreeBuilder(_DomBuilder, HTMLParser):
    def __init__(self):
        _DomBuilder.__init__(self)
        # convert_charrefs=False: keep entity/char refs raw in text nodes so
        # inner_text matches HAP InnerText byte-for-byte.
        HTMLParser.__init__(self, convert_charrefs=False)

    def handle_entityref(self, name):
        self._append_text(f"&{name};")

    def handle_charref(self, name):
        self._append_text(f"&#{name};")

    def handle_comment(self, data):  # comments contribute nothing to InnerText
        pass


def parse_html_stdlib(text: str) -> Node:
    """Reference engine: stdlib ``html.parser`` tokenizer."""
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.finish()


# Telemetry: count of fast-scanner parses that fell back whole-document to
# the stdlib engine (markup outside the scanner's verified subset).  The
# fallback is ~1.6x slower (BENCH.md §15), so at 100x scale a silent 5%
# fallback rate would erase the pruned kernel's win — the parse UDF
# snapshots this counter per row and CrawlJob surfaces the per-wave sum as
# wave_metrics.parse_fallbacks.  Per-Python-worker counter; only deltas
# within one row's parse are read, so cross-process totals never mix.
FALLBACK_COUNT = 0


def parse_html(text: str) -> Node:
    """Parse an HTML string into a Node tree (document root).

    Uses the fast single-regex scanner (scanner.py) — ~3× the stdlib
    tokenizer, which was >80% of parse-kernel time (BENCH.md §5.3) — and
    falls back to the stdlib engine whenever the scanner reports markup
    outside its verified subset, so hostile/degenerate input can never
    produce a tree the stdlib engine wouldn't.  Equivalence of the two
    engines is asserted over every reference fixture page and the golden
    parse results (tests/test_parser_golden.py)."""
    from .scanner import FallbackNeeded, parse_html_fast

    try:
        return parse_html_fast(text)
    except FallbackNeeded:
        global FALLBACK_COUNT
        FALLBACK_COUNT += 1
        return parse_html_stdlib(text)


def parse_html_pruned(text: str, trigger_substrings) -> Node:
    """Parse building ONLY subtrees whose root class contains a trigger
    substring (see _PruningBuilder) — the extractor hot path.  Falls back
    to the FULL stdlib tree on markup outside the scanner's subset: the
    full tree is a superset, and extractor results are identical on it.
    """
    from .scanner import FallbackNeeded, parse_html_fast

    try:
        return parse_html_fast(text, _PruningBuilder(trigger_substrings))
    except FallbackNeeded:
        global FALLBACK_COUNT
        FALLBACK_COUNT += 1
        return parse_html_stdlib(text)
