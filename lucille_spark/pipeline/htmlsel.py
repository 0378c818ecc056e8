"""CSS-selector extraction over stdlib html.parser — the engine behind the
ApplyHTML stage (reference: stage/ApplyJSoup.java:1-45, which delegates to
jsoup; this container has no bs4/lxml/jsoup, so the selector subset the
reference's fixtures exercise is implemented from scratch).

Supported selector grammar (ApplyJSoupTest fixtures: css.conf `.class`,
`[name=name]`, `#id`; extract-attributes.conf `a` + attribute type;
round 4 adds the child combinator and class-list attribute matching;
round 5 adds the sibling combinators):

    chain  := simple (comb simple)*
    comb   := WS | WS? ('>' | '+' | '~') WS?   # descendant/child/adjacent/general sibling
    simple := [tag|*] [#id] (.class)* ([attr] | [attr=value] | [attr~=value])* pseudo*
    pseudo := :first-child | :nth-child(An+B|odd|even|k)
            | :first-of-type | :nth-of-type(...)
            | :not(simple)             # start-tag-decidable inner only
            | :last-child | :last-of-type | :only-child | :only-of-type
            | :nth-last-child(...) | :nth-last-of-type(...)   # subject only

`A > B` matches B whose PARENT matches A (jsoup child combinator);
`A + B` matches B whose immediately-preceding ELEMENT sibling matches A
(text/comment nodes don't break adjacency, per CSS); `A ~ B` matches B
with ANY preceding element sibling matching A. `[attr~=value]` matches
when value is a whitespace-separated word of the attribute (the
class-list semantics of CSS ~=). Chain matching uses a proper
backtracking walk over open ancestors AND per-depth closed-sibling
history, so mixed chains like `ul > li + li em` resolve correctly
(greedy-nearest binding is wrong when several candidates match).
Structural pseudo-classes decidable at start-tag time are supported via
the same sibling history (`:first-child`, `:nth-child`,
`:first-of-type`, `:nth-of-type`); the FINALIZED ones (`:last-child`,
`:last-of-type`, `:only-child`, `:only-of-type`, `:nth-last-child`,
`:nth-last-of-type` — r6) are supported on the SUBJECT (rightmost)
simple: such candidates match optimistically at start-tag, capture
normally, and are emitted/discarded when their parent closes and the
full child list is known (pending-candidate buffer). On a non-subject
step they would defer the whole chain binding to ancestor/sibling
futures — out of the single-pass boundary, rejected with a clear
ValueError, as are non-structural pseudos (`:hover` etc.).

Extraction types per ApplyJSoup.java destinationFields:
    text      — element.text(): subtree text, whitespace-normalized
    attribute — the named attribute's value per matched element
    html      — inner HTML (reconstructed from parse events)
    outerHtml — including the element's own tags

Multiple matches return a list in DOCUMENT ORDER (jsoup Elements order);
no match returns None (the reference does not create the field).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

_SIMPLE = re.compile(
    r"^([a-zA-Z][\w-]*|\*)?(#[\w-]+)?((?:\.[\w-]+)*)((?:\[[^\]]+\])*)"
    r"((?::[\w-]+(?:\([^)]*\))?)*)$")
_ATTR = re.compile(r"\[([\w-]+)(?:(~?)=([^\]]*))?\]")
_PSEUDO = re.compile(r":([\w-]+)(?:\(([^)]*)\))?")


def _parse_nth(arg: str) -> Tuple[int, int]:
    """CSS An+B micro-syntax -> (A, B): 'odd', 'even', '3', '2n',
    '2n+1', '-n+3', 'n'."""
    a = arg.strip().lower().replace(" ", "")
    if a == "odd":
        return (2, 1)
    if a == "even":
        return (2, 0)
    m = re.match(r"^([+-]?\d*)n([+-]\d+)?$", a)
    if m:
        coef = m.group(1)
        A = 1 if coef in ("", "+") else (-1 if coef == "-" else int(coef))
        return (A, int(m.group(2)) if m.group(2) else 0)
    if re.match(r"^[+-]?\d+$", a):
        return (0, int(a))
    raise ValueError(f"unsupported :nth-* argument {arg!r}")


# pseudo-classes that need the parent's FULL child list, i.e. are only
# decidable once the parent CLOSES (r6): the streaming matcher buffers
# such candidates per parent depth and emits/discards at parent close
_FINALIZED = {"last-child", "last-of-type", "only-child", "only-of-type",
              "nth-last-child", "nth-last-of-type"}


def _parse_pseudos(raw: str, sel: str,
                   in_not: bool = False) -> List[Tuple[str, int, int]]:
    """Structural pseudo-classes: (kind, A, B). Kinds 'child'/'type'
    (position among element / same-tag siblings) are decidable at
    START-TAG time; the _FINALIZED kinds (`:last-child`,
    `:last-of-type`, `:only-child`, `:only-of-type`,
    `:nth-last-child(An+B)`, `:nth-last-of-type(An+B)`) are decided at
    PARENT-CLOSE time via the pending-candidate buffer (r6; subject
    position only — parse_selector enforces). `:not(simple)` (late r6)
    negates an inner start-tag-decidable simple — represented as
    ("not", inner_simple, 0); nesting `:not` or putting a finalized
    pseudo inside it is rejected (the negation of a parent-close fact
    is itself a parent-close fact — out of the start-tag grammar).
    Non-structural pseudos (`:hover` etc.) stay out of grammar."""
    out: List[Tuple[str, int, int]] = []
    for m in _PSEUDO.finditer(raw or ""):
        name, arg = m.group(1), m.group(2)
        if name == "first-child":
            out.append(("child", 0, 1))
        elif name == "first-of-type":
            out.append(("type", 0, 1))
        elif name == "nth-child":
            out.append(("child", *_parse_nth(arg or "")))
        elif name == "nth-of-type":
            out.append(("type", *_parse_nth(arg or "")))
        elif name in ("nth-last-child", "nth-last-of-type"):
            if in_not:
                raise ValueError(
                    f"':{name}' inside :not() is not supported ({sel!r})")
            out.append((name, *_parse_nth(arg or "")))
        elif name in _FINALIZED:
            if in_not:
                raise ValueError(
                    f"':{name}' inside :not() is not supported ({sel!r})")
            out.append((name, 0, 0))
        elif name == "not":
            if in_not:
                raise ValueError(f"nested :not() in selector {sel!r}")
            if not (arg or "").strip():
                raise ValueError(f"empty :not() in selector {sel!r}")
            out.append(("not", _compile_simple(arg.strip(), sel,
                                               in_not=True), 0))
        else:
            raise ValueError(
                f"unsupported pseudo-class ':{name}' in selector {sel!r}")
    return out

def _compile_simple(part: str, sel: str, in_not: bool = False) -> tuple:
    """Compile one simple selector to (tag, id, classes, attrs, pseudos).
    Shared by parse_selector's chain steps and :not()'s inner simple
    (``in_not`` forbids parent-close pseudos and further nesting there).
    Note :not's inner cannot itself carry a parenthesized pseudo — the
    outer :pseudo(...) token regex does not nest parens; positional
    keywords (`:first-child`, `:first-of-type`) are fine."""
    m = _SIMPLE.match(part)
    if not m or (not m.group(1) and not m.group(2) and not m.group(3)
                 and not m.group(4) and not m.group(5)):
        raise ValueError(f"unsupported selector {part!r}")
    tag = m.group(1)
    if tag == "*":
        tag = None
    eid = m.group(2)[1:] if m.group(2) else None
    classes = [c for c in (m.group(3) or "").split(".") if c]
    attrs: List[Tuple[str, str, Optional[str]]] = []
    for am in _ATTR.finditer(m.group(4) or ""):
        v = am.group(3)
        if v is not None:
            v = v.strip("\"'")
        op = "~=" if am.group(2) else ("=" if v is not None else "")
        attrs.append((am.group(1), op, v))
    pseudos = _parse_pseudos(m.group(5), sel, in_not=in_not)
    return (tag.lower() if tag else None, eid, classes, attrs, pseudos)


VOID_TAGS = {"br", "img", "hr", "meta", "link", "input", "area", "base",
             "col", "embed", "source", "track", "wbr", "param"}

# a start tag implicitly closes these open siblings (HTML5 omitted end
# tags — <li>a<li>b is two siblings, not nested)
_IMPLICIT_CLOSE = {
    "li": {"li"}, "p": {"p"}, "td": {"td", "th"}, "th": {"td", "th"},
    "tr": {"tr", "td", "th"}, "option": {"option"},
    "dd": {"dd", "dt"}, "dt": {"dd", "dt"},
}


_COMBINATORS = {">": "child", "+": "adjacent", "~": "general"}


def _space_combinators(sel: str) -> str:
    """Surround top-level `>` `+` `~` with spaces so the chain splits on
    whitespace. `~` inside `[attr~=value]` brackets and `+` inside
    `:nth-child(2n+1)` parens are NOT combinators — tracked via
    bracket/paren depth."""
    out = []
    depth = 0
    for ch in sel:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth = max(0, depth - 1)
        if depth == 0 and ch in _COMBINATORS:
            out.append(f" {ch} ")
        else:
            out.append(ch)
    return "".join(out)


def parse_selector(sel: str) -> List[tuple]:
    """Compile a selector chain to [(simple, combinator), ...] where
    ``combinator`` relates the simple to its LEFT neighbour: 'descendant'
    (whitespace), 'child' ('>'), 'adjacent' ('+') or 'general' ('~');
    the first entry's combinator is None. Raises ValueError on
    unsupported syntax."""
    parts = _space_combinators(sel).split()
    if not parts:
        raise ValueError("empty selector")
    out = []
    comb = None
    expect_simple = True
    for p in parts:
        if p in _COMBINATORS:
            if expect_simple or comb is not None:
                raise ValueError(f"misplaced {p!r} in selector {sel!r}")
            comb = _COMBINATORS[p]
            continue
        simple = _compile_simple(p, sel)
        out.append((simple, None if not out else (comb or "descendant")))
        comb = None
        expect_simple = False
    if comb is not None:
        raise ValueError(f"dangling combinator in selector {sel!r}")
    # finalized pseudos are resolved by buffering the SUBJECT until its
    # parent closes; on a non-subject step they would defer the whole
    # chain binding (ancestors'/siblings' futures) — out of the
    # single-pass boundary, reported explicitly
    for s, _ in out[:-1]:
        fin = [k for k, _, _ in s[4] if k in _FINALIZED]
        if fin:
            raise ValueError(
                f"pseudo-class ':{fin[0]}' is only supported on the "
                f"subject (rightmost) simple of a selector chain "
                f"({sel!r}): it needs the parent's full child list, "
                "which a single-pass matcher only has for the subject")
    return out


def _match_simple(el, s, preceding=()) -> bool:
    tag, attrs = el
    t, eid, classes, sattrs, pseudos = s
    if t and tag != t:
        return False
    a = dict(attrs)
    if eid and a.get("id") != eid:
        return False
    if classes:
        cls = (a.get("class") or "").split()
        if any(c not in cls for c in classes):
            return False
    for k, op, v in sattrs:
        if k not in a:
            return False
        if op == "=" and (a.get(k) or "") != v:
            return False
        if op == "~=" and v not in (a.get(k) or "").split():
            return False
    for kind, A, B in pseudos:
        if kind == "not":
            # A holds the inner compiled simple (start-tag-decidable by
            # construction — parse rejects finalized pseudos inside)
            if _match_simple(el, A, preceding):
                return False
            continue
        if kind in _FINALIZED:
            continue  # optimistic here; decided at parent close (r6)
        # 1-based position among element siblings (text/comment nodes
        # don't count, per CSS), computed from the closed-sibling history
        if kind == "child":
            p = len(preceding) + 1
        else:                                  # -of-type
            p = 1 + sum(1 for pt, _ in preceding if pt == tag)
        if not _nth_ok(p, A, B):
            return False
    return True


def _nth_ok(p: int, A: int, B: int) -> bool:
    """CSS An+B membership for 1-based position p."""
    if A == 0:
        return p == B
    return (p - B) % A == 0 and (p - B) // A >= 0


def _chain_match(stack, sibs, chain) -> bool:
    """True when the chain matches with stack[-1] as the subject.
    Backtracking right-to-left walk: descendant steps may bind to ANY
    ancestor, child steps to the immediate parent only; sibling steps
    ('+' adjacent / '~' general) bind to the subject's already-CLOSED
    preceding element siblings, recorded per depth in ``sibs``
    (sibs[i] = closed element children of stack[i]'s container, i.e.
    the preceding siblings of stack[i]). A sibling binding keeps the
    same ancestor path, so chains like `li + li em` and `A ~ B > C`
    compose with the ancestor walk."""

    def ok(ci: int, si: int, elem, preceding) -> bool:
        if not _match_simple(elem, chain[ci][0], preceding):
            return False
        if ci == 0:
            return True
        comb = chain[ci][1]
        if comb == "child":
            return si > 0 and ok(ci - 1, si - 1, stack[si - 1],
                                 sibs[si - 1])
        if comb == "adjacent":
            return bool(preceding) and ok(ci - 1, si, preceding[-1],
                                          preceding[:-1])
        if comb == "general":
            return any(ok(ci - 1, si, preceding[j], preceding[:j])
                       for j in range(len(preceding) - 1, -1, -1))
        return any(ok(ci - 1, sj, stack[sj], sibs[sj])
                   for sj in range(si - 1, -1, -1))

    top = len(stack) - 1
    return ok(len(chain) - 1, top, stack[top], sibs[top])


class _Selector(HTMLParser):
    def __init__(self, chain, typ: str, attr: Optional[str]):
        super().__init__(convert_charrefs=True)
        self.chain, self.typ, self.attr = chain, typ, attr
        self.stack: list = []      # open (tag, attrs)
        # containers[d] = closed element children of the container at
        # depth d (d=0 is the document root; d=len(stack) is the open
        # top element). While stack[i] is open nothing can be appended
        # to containers[i], so containers[i] IS stack[i]'s
        # preceding-sibling list — no snapshotting needed.
        self.containers: list = [[]]
        self.active: list = []     # open matched records
        self.results: dict = {}    # idx -> value (document order)
        # candidates whose finalized pseudos (:last-*/:only-*/:nth-last-*)
        # await their parent's close: {idx, checks, tag, sib_pos,
        # parent_depth, value} — value filled when the candidate itself
        # closes, verdict when the parent does (r6)
        self.pending: list = []
        self._n = 0

    # --- match helpers ---------------------------------------------------
    def _matches(self) -> bool:
        return _chain_match(self.stack, self.containers, self.chain)

    # --- events ----------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        closes = _IMPLICIT_CLOSE.get(tag)
        while closes and self.stack and self.stack[-1][0] in closes:
            self._close_to(len(self.stack) - 1)
        raw = self.get_starttag_text() or ""
        for rec in self.active:
            rec["html"].append(raw)
        self.stack.append((tag, attrs))
        self.containers.append([])
        if self._matches():
            idx = self._n
            self._n += 1
            fin = [p for p in self.chain[-1][0][4] if p[0] in _FINALIZED]
            pend = None
            if fin:
                pend = {"idx": idx, "checks": fin, "tag": tag,
                        "sib_pos": len(self.containers[-2]),
                        "parent_depth": len(self.stack) - 1}
            if self.typ == "attribute":
                a = dict(attrs)
                if self.attr in a:
                    if pend is not None:
                        pend["value"] = a.get(self.attr) or ""
                        self.pending.append(pend)
                    else:
                        self.results[idx] = a.get(self.attr) or ""
            else:
                self.active.append({"depth": len(self.stack), "idx": idx,
                                    "tag": tag, "outer": raw,
                                    "html": [], "text": [],
                                    "pend": pend})
        if tag in VOID_TAGS:
            self._close_to(len(self.stack) - 1)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in VOID_TAGS:
            self._close_to(len(self.stack) - 1)

    def handle_endtag(self, tag):
        # lenient: find the nearest open element with this tag; unmatched
        # end tags are ignored (malformed HTML tolerance, like jsoup)
        for lvl in range(len(self.stack), 0, -1):
            if self.stack[lvl - 1][0] == tag:
                self._close_to(lvl - 1)
                return

    def _close_to(self, new_len: int):
        while len(self.stack) > new_len:
            depth = len(self.stack)
            tag = self.stack[-1][0]
            end_raw = f"</{tag}>"
            still = []
            for rec in self.active:
                if rec["depth"] == depth:
                    self._finish(rec)
                else:
                    still.append(rec)
            self.active = still
            closed = self.stack.pop()
            child_list = self.containers.pop()
            self.containers[-1].append(closed)   # now a preceding sibling
            # the popped element's child list is now FINAL: judge the
            # buffered finalized-pseudo candidates parented here (r6)
            if self.pending:
                self._resolve_pending(depth, child_list)
            if len(self.stack) >= new_len and self.stack:
                for rec in self.active:
                    rec["html"].append(end_raw)

    def handle_data(self, d):
        for rec in self.active:
            rec["html"].append(d)
            rec["text"].append(d)

    def _finish(self, rec):
        if self.typ == "text":
            value = " ".join("".join(rec["text"]).split())
        elif self.typ == "html":
            value = "".join(rec["html"]).strip()
        elif self.typ == "outerHtml":
            value = rec["outer"] + "".join(rec["html"]) + f"</{rec['tag']}>"
        else:
            return
        pend = rec.get("pend")
        if pend is not None:
            pend["value"] = value      # verdict at parent close
            self.pending.append(pend)
        else:
            self.results[rec["idx"]] = value

    def _resolve_pending(self, parent_depth: int, children: list):
        """Emit or discard buffered candidates whose parent (at
        ``parent_depth``) just closed; ``children`` is the parent's
        complete element-child list, so :last-*/:only-*/:nth-last-* are
        now decidable. children[sib_pos] IS the candidate (siblings can
        only close into the parent container in document order)."""
        still = []
        for pend in self.pending:
            if pend["parent_depth"] != parent_depth:
                still.append(pend)
                continue
            if "value" in pend and self._pend_ok(pend, children):
                self.results[pend["idx"]] = pend["value"]
        self.pending = still

    @staticmethod
    def _pend_ok(pend, children) -> bool:
        pos = pend["sib_pos"]              # 0-based index in children
        n = len(children)
        same = [i for i, (t, _) in enumerate(children)
                if t == pend["tag"]]
        for kind, A, B in pend["checks"]:
            if kind == "last-child":
                if pos != n - 1:
                    return False
            elif kind == "only-child":
                if n != 1:
                    return False
            elif kind == "last-of-type":
                if not same or same[-1] != pos:
                    return False
            elif kind == "only-of-type":
                if same != [pos]:
                    return False
            elif kind == "nth-last-child":
                if not _nth_ok(n - pos, A, B):
                    return False
            elif kind == "nth-last-of-type":
                if pos not in same or not _nth_ok(
                        len(same) - same.index(pos), A, B):
                    return False
        return True

    def close(self):
        super().close()
        self._close_to(0)   # finalize anything left open (malformed HTML)
        # root-level candidates: the document root never "closes" via
        # _close_to, so judge them against the final root child list
        if self.pending:
            self._resolve_pending(0, self.containers[0])


def select_html(html: Optional[str], selector: str, typ: str = "text",
                attribute: Optional[str] = None) -> Optional[List[str]]:
    """All matches for ``selector`` in document order, extracted per
    ``typ``; None when the input is None or nothing matches."""
    if html is None:
        return None
    if typ == "attribute" and not attribute:
        raise ValueError("`attribute` must be provided for attribute "
                         "extraction (ApplyJSoup.java:115-117)")
    p = _Selector(parse_selector(selector), typ, attribute)
    p.feed(html)
    p.close()
    out = [p.results[i] for i in sorted(p.results)]
    return out or None
