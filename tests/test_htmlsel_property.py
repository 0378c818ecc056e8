"""Property test: the single-pass streaming selector engine
(pipeline/htmlsel.py) against an independent tree-building reference.

The reference parses the generated (always explicitly-closed) HTML into
a real DOM and evaluates the selector by recursive chain-walking over
the complete tree — the textbook two-pass approach the streaming matcher
avoids. Any divergence in match set, document order, or normalized text
is a bug in one of them; since the reference is ~40 lines of direct CSS
semantics over a materialized tree, in practice it localizes bugs in the
streaming side (backtracking binds, sibling history, pending-candidate
finalization for :last-*/:only-*/:nth-last-*)."""

import re
from html.parser import HTMLParser

from hypothesis import given, settings, strategies as st

from lucille_spark.pipeline.htmlsel import select_html


# --------------------------------------------------------- reference DOM


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "texts")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children = []      # element children only
        self.parent = parent
        self.texts = []         # own + descendant text, in doc order


class _TreeBuilder(HTMLParser):
    """Explicit-close HTML only (the generator never omits end tags),
    so this builder needs no void/implicit-close tables."""

    def __init__(self):
        super().__init__()
        self.root = _Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_endtag(self, tag):
        self.cur = self.cur.parent

    def handle_data(self, data):
        n = self.cur
        while n is not None:
            n.texts.append(data)
            n = n.parent


def _parse_tree(html):
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


def _preorder(node):
    for c in node.children:
        yield c
        yield from _preorder(c)


# ------------------------------------------------- reference evaluation


def _nth(p, arg):
    if arg == "odd":
        a, b = 2, 1
    elif arg == "even":
        a, b = 2, 0
    elif "n" in arg:
        m = re.fullmatch(r"([+-]?\d*)n([+-]\d+)?", arg.replace(" ", ""))
        a = int(m.group(1)) if m.group(1) not in ("", "+", "-") else (
            -1 if m.group(1) == "-" else 1)
        b = int(m.group(2) or 0)
    else:
        a, b = 0, int(arg)
    if a == 0:
        return p == b
    return (p - b) % a == 0 and (p - b) // a >= 0


def _simple_match(el, simple):
    tag, id_, classes, attrs, pseudos = simple
    if tag and tag != "*" and el.tag != tag:
        return False
    if id_ and el.attrs.get("id") != id_:
        return False
    for c in classes:
        if c not in (el.attrs.get("class") or "").split():
            return False
    for k, op, v in attrs:
        if k not in el.attrs:
            return False
        if op == "=" and (el.attrs.get(k) or "") != v:
            return False
        if op == "~=" and v not in (el.attrs.get(k) or "").split():
            return False
    sibs = el.parent.children
    pos = sibs.index(el) + 1                       # 1-based among elements
    same = [s for s in sibs if s.tag == el.tag]
    tpos = same.index(el) + 1
    n, nt = len(sibs), len(same)
    for name, arg in pseudos:
        if name == "not":           # arg is the inner reference-simple
            if _simple_match(el, arg):
                return False
            continue
        ok = {
            "first-child": pos == 1,
            "last-child": pos == n,
            "only-child": n == 1,
            "first-of-type": tpos == 1,
            "last-of-type": tpos == nt,
            "only-of-type": nt == 1,
            "nth-child": _nth(pos, arg) if arg else False,
            "nth-of-type": _nth(tpos, arg) if arg else False,
            "nth-last-child": _nth(n - pos + 1, arg) if arg else False,
            "nth-last-of-type": _nth(nt - tpos + 1, arg) if arg else False,
        }[name]
        if not ok:
            return False
    return True


def _chain_match_ref(el, chain):
    """chain = [(simple, comb_to_next), ...]; el is the subject
    candidate for chain[-1]."""
    simple, _ = chain[-1]
    if not _simple_match(el, simple):
        return False
    if len(chain) == 1:
        return True
    comb = chain[-2][1]          # combinator BETWEEN chain[-2] and subject
    rest = chain[:-1]
    if comb == "child":
        p = el.parent
        return p.tag != "#root" and _chain_match_ref(p, rest)
    if comb == "descendant":
        p = el.parent
        while p is not None and p.tag != "#root":
            if _chain_match_ref(p, rest):
                return True
            p = p.parent
        return False
    sibs = el.parent.children
    i = sibs.index(el)
    if comb == "adjacent":
        return i > 0 and _chain_match_ref(sibs[i - 1], rest)
    if comb == "general":
        return any(_chain_match_ref(s, rest) for s in sibs[:i])
    raise AssertionError(comb)


def _ref_select(html, chain):
    root = _parse_tree(html)
    out = [" ".join("".join(el.texts).split())
           for el in _preorder(root) if _chain_match_ref(el, chain)]
    return out or None


# ------------------------------------------------------------ generators

_TAGS = ["div", "p", "span", "ul", "li", "em", "b"]
_CLASSES = ["ca", "cb", "cc"]

# the engine applies the HTML5 implicit-close table even to explicitly
# closed markup (a <p> start tag closes an open <p>, ditto <li>), so the
# generator must never nest a tag directly inside a tag it would
# implicitly close — otherwise the two parsers legitimately build
# different DOMs and the property compares apples to oranges
_NO_NEST = {"p": {"p"}, "li": {"li"}}


@st.composite
def _tree_html(draw, depth=0, parent=None):
    tag = draw(st.sampled_from(
        [t for t in _TAGS if parent not in _NO_NEST.get(t, ())]))
    bits = [f"<{tag}"]
    if draw(st.booleans()):
        bits.append(f' class="{" ".join(sorted(draw(st.sets(st.sampled_from(_CLASSES), max_size=2))))}"')
    if draw(st.integers(0, 3)) == 0:
        bits.append(f' data-x="{draw(st.sampled_from(["u", "v"]))}"')
    bits.append(">")
    bits.append(draw(st.sampled_from(["", "t1 ", "t2"])))
    if depth < 3:
        for child in draw(st.lists(
                _tree_html(depth=depth + 1, parent=tag),  # type: ignore[call-arg]
                max_size=4 - depth)):
            bits.append(child)
            bits.append(draw(st.sampled_from(["", " mid "])))
    bits.append(f"</{tag}>")
    return "".join(bits)


@st.composite
def _doc_html(draw):
    return "".join(draw(st.lists(_tree_html(), min_size=1, max_size=3)))


_START_PSEUDOS = ["first-child", "first-of-type", "nth-child",
                  "nth-of-type"]
_FINAL_PSEUDOS = ["last-child", "last-of-type", "only-child",
                  "only-of-type", "nth-last-child", "nth-last-of-type"]
_NTH_ARGS = ["1", "2", "3", "odd", "even", "2n+1", "3n"]


@st.composite
def _simple_sel(draw, allow_finalized):
    tag = draw(st.sampled_from(_TAGS + ["*"]))
    parts = [tag]
    classes = []
    if draw(st.integers(0, 2)) == 0:
        classes = [draw(st.sampled_from(_CLASSES))]
        parts.append("." + classes[0])
    attrs = []
    if draw(st.integers(0, 3)) == 0:
        v = draw(st.sampled_from(["u", "v"]))
        attrs.append(("data-x", "=", v))
        parts.append(f'[data-x={v}]')
    pseudos = []
    pool = _START_PSEUDOS + (_FINAL_PSEUDOS if allow_finalized else [])
    if draw(st.integers(0, 1)) == 0:
        name = draw(st.sampled_from(pool))
        arg = draw(st.sampled_from(_NTH_ARGS)) if name.startswith("nth") \
            else None
        pseudos.append((name, arg))
        parts.append(f":{name}" + (f"({arg})" if arg else ""))
    if draw(st.integers(0, 2)) == 0:
        # :not(inner) with a start-tag-decidable single-feature inner
        inner_kind = draw(st.sampled_from(["tag", "class", "attr",
                                           "first"]))
        if inner_kind == "tag":
            it = draw(st.sampled_from(_TAGS))
            inner_text, inner = it, (it, None, [], [], [])
        elif inner_kind == "class":
            ic = draw(st.sampled_from(_CLASSES))
            inner_text, inner = f".{ic}", (None, None, [ic], [], [])
        elif inner_kind == "attr":
            iv = draw(st.sampled_from(["u", "v"]))
            inner_text = f"[data-x={iv}]"
            inner = (None, None, [], [("data-x", "=", iv)], [])
        else:
            inner_text = ":first-child"
            inner = (None, None, [], [], [("first-child", None)])
        pseudos.append(("not", inner))
        parts.append(f":not({inner_text})")
    sel_text = "".join(parts)
    simple = (None if tag == "*" else tag, None, classes, attrs, pseudos)
    return sel_text, simple


@st.composite
def _selector(draw):
    n = draw(st.integers(1, 3))
    combs = [draw(st.sampled_from(["descendant", "child", "adjacent",
                                   "general"])) for _ in range(n - 1)]
    texts, chain = [], []
    for i in range(n):
        t, s = draw(_simple_sel(allow_finalized=(i == n - 1)))
        texts.append(t)
        chain.append([s, combs[i] if i < n - 1 else None])
    sep = {"descendant": " ", "child": " > ", "adjacent": " + ",
           "general": " ~ "}
    sel = texts[0]
    for i in range(1, n):
        sel += sep[combs[i - 1]] + texts[i]
    return sel, [tuple(c) for c in chain]


# ---------------------------------------------------------------- property


@settings(max_examples=200, deadline=None)
@given(_doc_html(), _selector())
def test_streaming_matches_tree_reference(html, sel_and_chain):
    sel, chain = sel_and_chain
    got = select_html(html, sel, "text")
    want = _ref_select(html, chain)
    assert got == want, (sel, html, got, want)
