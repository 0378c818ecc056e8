"""A from-scratch JSONata-subset parser/evaluator for the ApplyJSONata
stage (reference: stage/ApplyJSONata.java:1-15, which delegates to the
dashjoin jsonata-java library; fixtures under
lucille-core/src/test/resources/ApplyJSONataTest/*.conf).

Supported subset — chosen to cover the reference's fixtures:
  - path expressions:            field.value.sub
  - context reference:           $
  - literals:                    "str", 'str', 123, 1.5, true, false, null
  - object / array constructors: {"id": id, "v": field.value}, [a, b]
  - ternary conditional:         cond ? then : else
  - binary ops:  & (string concat), + - * / %, = != < <= > >=, and, or
  - functions: $string(x?), $number(x), $exists(path), $keys(x?),
    $uppercase(x), $lowercase(x), $length(x), $count(x), $not(x),
    $abs(x), $floor(x), $ceil(x), $sum(x), $trim(x), $substring(x,s,l?)

Unknown functions or syntax raise JsonataError at parse/eval time —
matching the reference's "invalid expression -> stage error / skip doc"
behavior (ApplyJSONataTest badEvaluation/invalidExpression fixtures).

Missing-path results evaluate to the sentinel ``UNDEFINED``; like JSONata,
an undefined entry in an object constructor is omitted, and an undefined
top-level result means "no change" for the stage.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any, List, Optional, Tuple


class JsonataError(ValueError):
    pass


class _Undefined:
    __slots__ = ()

    def __repr__(self):
        return "undefined"


UNDEFINED = _Undefined()

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>\d+(?:\.\d+)?) |
      (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*') |
      (?P<name>\$?[A-Za-z_][A-Za-z0-9_]*) |
      (?P<op><=|>=|!=|[-+*/%<>=&?:().,{}\[\]]|\$)
    )""", re.VERBOSE)

_KEYWORDS = {"true": True, "false": False, "null": None}


def _tokenize(src: str) -> List[Tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m or m.end() == i:
            if src[i:].strip() == "":
                break
            raise JsonataError(f"bad token at {src[i:i+10]!r}")
        i = m.end()
        for kind in ("num", "str", "name", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive descent with precedence climbing."""

    _PREC = {"or": 1, "and": 2, "=": 3, "!=": 3, "<": 4, "<=": 4, ">": 4,
             ">=": 4, "&": 5, "+": 6, "-": 6, "*": 7, "/": 7, "%": 7}

    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str):
        k, v = self.next()
        if v != val:
            raise JsonataError(f"expected {val!r}, got {v!r}")

    def parse(self):
        node = self.parse_expr()
        if self.peek()[0] != "eof":
            raise JsonataError(f"trailing input at {self.peek()[1]!r}")
        return node

    def parse_expr(self, min_prec: int = 0):
        node = self.parse_unary()
        while True:
            k, v = self.peek()
            if (k in ("op", "name") and v in self._PREC
                    and self._PREC[v] >= min_prec):
                self.next()
                rhs = self.parse_expr(self._PREC[v] + 1)
                node = ("bin", v, node, rhs)
            elif v == "?" and min_prec == 0:
                # conditional has the LOWEST precedence (real JSONata):
                # only the top-level climb may consume `?`, so
                # `a > 5 ? "big" : "small"` conditions on the whole
                # comparison, not on the literal 5 (ADVICE r2).
                self.next()
                then = self.parse_expr()
                self.expect(":")
                other = self.parse_expr()
                node = ("cond", node, then, other)
            else:
                return node

    def parse_unary(self):
        k, v = self.peek()
        if v == "-":
            self.next()
            return ("bin", "-", ("lit", 0), self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        node = self.parse_primary()
        while True:
            k, v = self.peek()
            if v == ".":
                self.next()
                k2, name = self.next()
                if k2 != "name":
                    raise JsonataError(f"bad path segment {name!r}")
                node = ("path", node, name)
            else:
                return node

    def parse_primary(self):
        k, v = self.next()
        if k == "num":
            return ("lit", float(v) if "." in v else int(v))
        if k == "str":
            body = v[1:-1]
            return ("lit", re.sub(r"\\(.)", r"\1", body))
        if k == "name":
            if v in _KEYWORDS:
                return ("lit", _KEYWORDS[v])
            if v.startswith("$"):
                if self.peek()[1] == "(":
                    self.next()
                    args = []
                    if self.peek()[1] != ")":
                        args.append(self.parse_expr())
                        while self.peek()[1] == ",":
                            self.next()
                            args.append(self.parse_expr())
                    self.expect(")")
                    return ("call", v[1:], args)
                raise JsonataError(f"unknown variable {v!r}")
            return ("ref", v)
        if v == "$":
            return ("ctx",)
        if v == "(":
            node = self.parse_expr()
            self.expect(")")
            return node
        if v == "{":
            pairs = []
            if self.peek()[1] != "}":
                while True:
                    key = self.parse_expr()
                    self.expect(":")
                    pairs.append((key, self.parse_expr()))
                    if self.peek()[1] != ",":
                        break
                    self.next()
            self.expect("}")
            return ("obj", pairs)
        if v == "[":
            items = []
            if self.peek()[1] != "]":
                while True:
                    items.append(self.parse_expr())
                    if self.peek()[1] != ",":
                        break
                    self.next()
            self.expect("]")
            return ("arr", items)
        raise JsonataError(f"unexpected token {v!r}")


def _num(x) -> float:
    if isinstance(x, bool) or not isinstance(x, (int, float)):
        if isinstance(x, str):
            try:
                return float(x) if "." in x else int(x)
            except ValueError as e:
                raise JsonataError(f"cannot cast {x!r} to number") from e
        raise JsonataError(f"cannot cast {type(x).__name__} to number")
    return x


def _eval(node, ctx):
    tag = node[0]
    if tag == "lit":
        return node[1]
    if tag == "ctx":
        return ctx
    if tag == "ref":
        if isinstance(ctx, dict) and node[1] in ctx:
            return ctx[node[1]]
        return UNDEFINED
    if tag == "path":
        base = _eval(node[1], ctx)
        if base is UNDEFINED or base is None:
            return UNDEFINED
        if isinstance(base, dict):
            return base.get(node[2], UNDEFINED)
        if isinstance(base, list):  # JSONata maps over sequences
            out = [b.get(node[2], UNDEFINED) for b in base
                   if isinstance(b, dict)]
            out = [o for o in out if o is not UNDEFINED]
            if not out:
                return UNDEFINED
            return out[0] if len(out) == 1 else out
        return UNDEFINED
    if tag == "bin":
        op = node[1]
        lhs = _eval(node[2], ctx)
        if op in ("and", "or"):
            lb = bool(lhs) and lhs is not UNDEFINED
            if op == "and" and not lb:
                return False
            if op == "or" and lb:
                return True
            rhs = _eval(node[3], ctx)
            return bool(rhs) and rhs is not UNDEFINED
        rhs = _eval(node[3], ctx)
        if op == "&":
            return _to_string(lhs) + _to_string(rhs)
        if op in ("=", "!="):
            if lhs is UNDEFINED or rhs is UNDEFINED:
                return False if op == "=" else True
            return (lhs == rhs) if op == "=" else (lhs != rhs)
        if lhs is UNDEFINED or rhs is UNDEFINED:
            return UNDEFINED
        a, b = _num(lhs), _num(rhs)
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        if op == "%":
            return a % b
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        if op == ">=":
            return a >= b
        raise JsonataError(f"unknown operator {op}")
    if tag == "cond":
        c = _eval(node[1], ctx)
        truthy = (c is not UNDEFINED) and bool(c)
        return _eval(node[2] if truthy else node[3], ctx)
    if tag == "obj":
        out = {}
        for key_node, val_node in node[1]:
            key = _eval(key_node, ctx)
            val = _eval(val_node, ctx)
            if val is UNDEFINED:
                continue  # JSONata omits undefined entries
            out[_to_string(key)] = val
        return out
    if tag == "arr":
        return [v if v is not UNDEFINED else None
                for v in (_eval(n, ctx) for n in node[1])]
    if tag == "call":
        return _call(node[1], [_eval(a, ctx) for a in node[2]],
                     node[2], ctx)
    raise JsonataError(f"unknown node {tag}")


def _to_string(x) -> str:
    if x is UNDEFINED:
        return ""
    if isinstance(x, str):
        return x
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, float) and x.is_integer():
        return str(int(x))
    if isinstance(x, (dict, list)):
        return json.dumps(x, separators=(",", ":"))
    if x is None:
        return "null"
    return str(x)


def _call(name: str, args: list, arg_nodes, ctx):
    if name == "exists":
        return len(args) == 1 and args[0] is not UNDEFINED
    if name == "string":
        v = args[0] if args else ctx
        if v is UNDEFINED:
            return UNDEFINED
        # $string on a non-string JSON value yields its serialization
        return _to_string(v) if not isinstance(v, str) else v
    if name == "number":
        if not args or args[0] is UNDEFINED:
            return UNDEFINED
        return _num(args[0])
    if name == "keys":
        v = args[0] if args else ctx
        if isinstance(v, dict):
            return list(v.keys())
        return UNDEFINED
    if name == "uppercase":
        return _to_string(args[0]).upper() if args else UNDEFINED
    if name == "lowercase":
        return _to_string(args[0]).lower() if args else UNDEFINED
    if name == "length":
        return len(_to_string(args[0])) if args else UNDEFINED
    if name == "count":
        if not args or args[0] is UNDEFINED:
            return 0
        v = args[0]
        return len(v) if isinstance(v, list) else 1
    if name == "not":
        v = args[0] if args else UNDEFINED
        return not (v is not UNDEFINED and bool(v))
    if name == "abs":
        return abs(_num(args[0]))
    if name == "floor":
        return math.floor(_num(args[0]))
    if name == "ceil":
        return math.ceil(_num(args[0]))
    if name == "sum":
        v = args[0] if args else []
        if v is UNDEFINED:
            return 0
        return sum(_num(x) for x in (v if isinstance(v, list) else [v]))
    if name == "trim":
        return _to_string(args[0]).strip() if args else UNDEFINED
    if name == "substring":
        s = _to_string(args[0])
        start = int(_num(args[1]))
        if start < 0:
            start = max(0, len(s) + start)
        if len(args) > 2:
            return s[start:start + int(_num(args[2]))]
        return s[start:]
    raise JsonataError(f"unknown function ${name}")


class Expression:
    """A compiled JSONata-subset expression: ``Expression(src)(json_value)``.

    Returns UNDEFINED when the expression has no result (caller treats as
    "no change", matching the reference's skip-on-failure behavior)."""

    def __init__(self, src: str):
        self.src = src
        self.ast = _Parser(src).parse()

    def __call__(self, value: Any):
        return _eval(self.ast, value)

    def evaluate_json(self, json_str: Optional[str]) -> Optional[str]:
        """str -> str convenience used by the Spark stage: parse the input
        JSON, evaluate, serialize the result; None in/out for undefined."""
        if json_str is None:
            return None
        try:
            ctx = json.loads(json_str)
        except json.JSONDecodeError:
            ctx = json_str  # treat non-JSON input as a bare string context
        out = self(ctx)
        if out is UNDEFINED:
            return None
        return json.dumps(out, separators=(",", ":"), ensure_ascii=False)
