"""Grammar-based XPath engine for user-supplied format configs.

The config-driven extractor (stages/xmlconfig.py) walks the shipped
``.blf.yaml`` path shapes with a fast string-dispatch subset. USER
configs can contain arbitrary expressions (the reference hands those
to Saxon — DocIndexerSaxon.java:30); this module is the from-scratch
analogue: a tokenizer + recursive-descent parser over the W3C XPath
1.0 grammar (productions 1-39 of the public spec) and a typed
evaluator (number / string / boolean / node-set with document-order
semantics), plus the handful of XPath-2 convenience functions the
shipped configs already rely on (ends-with, upper-case, lower-case,
replace, matches).

Scope (documented): no namespace axis, no variables ($x), node tests
``text()``/``node()``/``*``/name only (no processing-instruction or
comment tests) — none of which appear in indexing configs. Elements
are ElementTree nodes; attribute and text nodes are lightweight
wrappers so ``count(@*)``-style expressions behave.

xmlconfig tries its subset first and delegates here whenever the
subset parser rejects a step — so every shipped format keeps its
tuned path, while arbitrary expressions become a fallback, not an
error.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

# ---------------------------------------------------------------------------
# node model


def _local(tag) -> str:
    if not isinstance(tag, str):
        return ""
    return tag.rsplit("}", 1)[-1]


@dataclass(frozen=True)
class AttrNode:
    """Attribute node: string-value is the attribute value."""
    owner: Any
    name: str
    value: str


@dataclass(frozen=True)
class TextNode:
    """Text node (element text/tail chunk), string-value = the chunk."""
    owner: Any
    value: str


def string_value(node) -> str:
    if isinstance(node, AttrNode):
        return node.value
    if isinstance(node, TextNode):
        return node.value
    if isinstance(node, (str, float, bool)):
        # atomic items appear in XPath-2 sequences (for/tokenize())
        return _to_string(node)
    # element: concatenation of descendant text (XPath string-value);
    # whitespace chunks are joined the same way the extractor's
    # _text_of does, keeping subset and engine agreeing on values
    return " ".join(s.strip() for s in node.itertext() if s.strip())


class _DocumentRoot:
    """The XPath document root node — parent of the root ELEMENT
    ('/doc' selects the root element named doc, not its children)."""

    __slots__ = ("_r", "text", "attrib", "tag")

    def __init__(self, root):
        self._r = root
        self.text = None
        self.attrib = {}
        self.tag = None             # matches no name test

    def __iter__(self):
        return iter([self._r])

    def __len__(self):
        return 1

    def iter(self):
        yield self
        yield from self._r.iter()

    def itertext(self):
        return self._r.itertext()


class Context:
    """Evaluation context: parents map + document order for sorting."""

    def __init__(self, root, parents: dict | None = None):
        self.root = root
        self.droot = _DocumentRoot(root)
        if parents is None:
            parents = {}
            for p in root.iter():
                for c in p:
                    parents[c] = p
        self.parents = parents
        self.order = {self.droot: 0}
        for i, el in enumerate(root.iter(), 1):
            self.order[el] = i

    def parent(self, node):
        if node is self.droot:
            return None
        if node is self.root:
            return self.droot
        return self.parents.get(node)

    def doc_order_key(self, node):
        if isinstance(node, AttrNode):
            return (self.order.get(node.owner, 1 << 60), 1, node.name)
        if isinstance(node, TextNode):
            return (self.order.get(node.owner, 1 << 60), 2, node.value)
        return (self.order.get(node, 1 << 60), 0, "")


# ---------------------------------------------------------------------------
# tokenizer

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>\d+(?:\.\d+)?|\.\d+)
    | (?P<str>'[^']*'|"[^"]*")
    | (?P<op>\.\.|//|!=|<=|>=|::|[()\[\]@,/|*+\-=<>.])
    | (?P<var>\$[\w][\w.-]*)
    | (?P<name>[\w][\w.-]*(?::[\w][\w.-]*)?)
    )""", re.X)


def tokenize(expr: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(expr):
        m = _TOKEN_RE.match(expr, i)
        if m is None or m.end() == i:
            if expr[i:].strip():
                raise XPathSyntaxError(
                    f"bad token at {expr[i:]!r} in {expr!r}")
            break
        i = m.end()
        for kind in ("num", "str", "op", "var", "name"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class XPathSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST

# nodes are tuples: (kind, ...)
#   ("or"|"and", a, b) ("cmp", op, a, b) ("arith", op, a, b)
#   ("neg", a) ("union", a, b) ("num", f) ("str", s)
#   ("call", name, [args]) ("path", absolute, descend0, [steps])
#   ("filter", primary, [preds], tail_steps, tail_descend)
# step = (axis, test, [preds], descend_before)


class _Parser:
    def __init__(self, expr: str):
        self.toks = tokenize(expr)
        self.i = 0
        self.expr = expr

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def eat(self, val):
        if self.peek()[1] != val:
            raise XPathSyntaxError(
                f"expected {val!r} at token {self.i} in {self.expr!r}")
        return self.next()

    # ---- expression grammar (precedence climbing) ----

    def parse(self):
        e = self.expr_single()
        if self.i != len(self.toks):
            raise XPathSyntaxError(
                f"trailing tokens {self.toks[self.i:]} in {self.expr!r}")
        return e

    def expr_single(self):
        # XPath 2.0 ExprSingle: the ForExpr production ('for $x in
        # e1, $y in e2 return body' — the one Saxon construct user
        # configs still reached for); everything else is XPath 1.0
        if self.peek() == ("name", "for") and self.peek(1)[0] == "var":
            self.next()
            bindings = []
            while True:
                k, v = self.next()
                if k != "var":
                    raise XPathSyntaxError(
                        f"for needs a $variable in {self.expr!r}")
                if self.peek() != ("name", "in"):
                    raise XPathSyntaxError(
                        f"for ${v[1:]} needs 'in' in {self.expr!r}")
                self.next()
                bindings.append((v[1:], self.expr_or()))
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek() != ("name", "return"):
                raise XPathSyntaxError(
                    f"for needs 'return' in {self.expr!r}")
            self.next()
            return ("for", bindings, self.expr_single())
        return self.expr_or()

    def expr_or(self):
        e = self.expr_and()
        while self.peek() == ("name", "or"):
            self.next()
            e = ("or", e, self.expr_and())
        return e

    def expr_and(self):
        e = self.expr_eq()
        while self.peek() == ("name", "and"):
            self.next()
            e = ("and", e, self.expr_eq())
        return e

    def expr_eq(self):
        e = self.expr_rel()
        while self.peek()[1] in ("=", "!="):
            op = self.next()[1]
            e = ("cmp", op, e, self.expr_rel())
        return e

    def expr_rel(self):
        e = self.expr_add()
        while self.peek()[1] in ("<", ">", "<=", ">="):
            op = self.next()[1]
            e = ("cmp", op, e, self.expr_add())
        return e

    def expr_add(self):
        e = self.expr_mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = ("arith", op, e, self.expr_mul())
        return e

    def expr_mul(self):
        e = self.expr_unary()
        while True:
            k, v = self.peek()
            # '*' is multiplication only in operator position (the
            # XPath disambiguation rule); after an operand it can only
            # be the operator
            if (k, v) == ("op", "*") or (k == "name"
                                         and v in ("div", "mod")):
                self.next()
                e = ("arith", v, e, self.expr_unary())
            else:
                return e

    def expr_unary(self):
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.expr_unary())
        return self.expr_union()

    def expr_union(self):
        e = self.expr_path()
        while self.peek()[1] == "|":
            self.next()
            e = ("union", e, self.expr_path())
        return e

    # ---- paths ----

    _AXES = ("child", "self", "parent", "ancestor", "ancestor-or-self",
             "descendant", "descendant-or-self", "following-sibling",
             "preceding-sibling", "following", "preceding", "attribute")

    def _is_step_start(self) -> bool:
        k, v = self.peek()
        if v in (".", "..", "@", "*"):
            return True
        if k != "name":
            return False
        # a name starts a step unless it is a function call — but
        # axis::... and text()/node() node tests ARE steps
        if self.peek(1)[1] == "::":
            return True
        if self.peek(1)[1] == "(":
            return v in ("text", "node")
        return True

    def expr_path(self):
        k, v = self.peek()
        if v == "/" or v == "//":
            absolute = True
            descend0 = v == "//"
            self.next()
            if not self._is_step_start():   # bare "/" = root
                return ("path", True, False, [])
            steps = self.steps()
            return ("path", absolute, descend0, steps)
        if self._is_step_start():
            return ("path", False, False, self.steps())
        # FilterExpr: primary with optional predicates and path tail
        prim = self.primary()
        preds = []
        while self.peek()[1] == "[":
            self.next()
            preds.append(self.expr_or())
            self.eat("]")
        tail_descend, tail = False, []
        if self.peek()[1] in ("/", "//"):
            tail_descend = self.next()[1] == "//"
            tail = self.steps()
        if preds or tail:
            return ("filter", prim, preds, tail, tail_descend)
        return prim

    def steps(self):
        steps = [self.step(False)]
        while self.peek()[1] in ("/", "//"):
            descend = self.next()[1] == "//"
            steps.append(self.step(descend))
        return steps

    def step(self, descend_before: bool):
        k, v = self.peek()
        if v == ".":
            self.next()
            axis, test = "self", "node()"
        elif v == "..":
            self.next()
            axis, test = "parent", "node()"
        else:
            axis = "child"
            if v == "@":
                self.next()
                axis = "attribute"
            elif k == "name" and self.peek(1)[1] == "::":
                if v not in self._AXES:
                    raise XPathSyntaxError(f"unknown axis {v!r}")
                axis = v
                self.next()
                self.next()
            k2, v2 = self.peek()
            if v2 == "*":
                self.next()
                test = "*"
            elif k2 == "name" and v2 in ("text", "node") \
                    and self.peek(1)[1] == "(":
                self.next()
                self.eat("(")
                self.eat(")")
                test = v2 + "()"
            elif k2 == "name":
                self.next()
                test = v2
            else:
                raise XPathSyntaxError(
                    f"expected node test at token {self.i} "
                    f"in {self.expr!r}")
        preds = []
        while self.peek()[1] == "[":
            self.next()
            preds.append(self.expr_or())
            self.eat("]")
        return (axis, test, preds, descend_before)

    def primary(self):
        k, v = self.next()
        if v == "(":
            if self.peek()[1] == ")":      # () = empty sequence
                self.next()
                return ("seq", [])
            e = self.expr_single()
            if self.peek()[1] == ",":      # (a, b, ...) sequence
                items = [e]
                while self.peek()[1] == ",":
                    self.next()
                    items.append(self.expr_single())
                self.eat(")")
                return ("seq", items)
            self.eat(")")
            return e
        if k == "var":
            return ("var", v[1:])
        if k == "num":
            return ("num", float(v))
        if k == "str":
            return ("str", v[1:-1])
        if k == "name" and self.peek()[1] == "(":
            self.next()
            args = []
            if self.peek()[1] != ")":
                args.append(self.expr_single())
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.expr_single())
            self.eat(")")
            return ("call", v, args)
        raise XPathSyntaxError(
            f"unexpected token {(k, v)!r} in {self.expr!r}")


def parse(expr: str):
    return _Parser(expr).parse()


# ---------------------------------------------------------------------------
# evaluation


def _to_number(v) -> float:
    if isinstance(v, float):
        return v
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, str):
        try:
            return float(v.strip())
        except ValueError:
            return float("nan")
    if isinstance(v, list):
        return _to_number(_to_string(v))
    return float("nan")


def _to_string(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, list):
        return string_value(v[0]) if v else ""
    return string_value(v)


def _to_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v == v and v != 0.0
    if isinstance(v, str):
        return len(v) > 0
    if isinstance(v, list):
        return len(v) > 0
    return v is not None


class _Evaluator:
    def __init__(self, ctx: Context):
        self.ctx = ctx
        self._vars: dict = {}

    # ---- axes ----

    def _axis(self, node, axis: str):
        par = self.ctx.parent
        if isinstance(node, (AttrNode, TextNode)):
            if axis == "parent":
                return [node.owner]
            if axis in ("ancestor", "ancestor-or-self"):
                out = [node] if axis.endswith("-or-self") else []
                p = node.owner
                while p is not None:
                    out.append(p)
                    p = par(p)
                return out
            if axis == "self":
                return [node]
            return []
        if axis == "child":
            out = []
            if node.text and node.text.strip():
                out.append(TextNode(node, node.text.strip()))
            for c in node:
                out.append(c)
                if c.tail and c.tail.strip():
                    out.append(TextNode(node, c.tail.strip()))
            return out
        if axis == "attribute":
            return [AttrNode(node, k, v) for k, v in node.attrib.items()]
        if axis == "self":
            return [node]
        if axis == "parent":
            p = par(node)
            return [] if p is None else [p]
        if axis in ("ancestor", "ancestor-or-self"):
            out = [node] if axis.endswith("-or-self") else []
            p = par(node)
            while p is not None:
                out.append(p)
                p = par(p)
            return out
        if axis == "descendant":
            return [x for x in node.iter() if x is not node]
        if axis == "descendant-or-self":
            return list(node.iter())
        if axis in ("following-sibling", "preceding-sibling"):
            p = par(node)
            if p is None:
                return []
            kids = list(p)
            i = next(j for j, k in enumerate(kids) if k is node)
            return (kids[i + 1:] if axis == "following-sibling"
                    else kids[i - 1::-1])
        if axis in ("following", "preceding"):
            order = self.ctx.order
            mine = order.get(node, -1)
            if axis == "following":
                under = set(id(x) for x in node.iter())
                return [x for x in self.ctx.root.iter()
                        if order.get(x, -1) > mine
                        and id(x) not in under]
            anc = set()
            p = par(node)
            while p is not None:
                anc.add(id(p))
                p = par(p)
            return [x for x in self.ctx.root.iter()
                    if order.get(x, -1) < mine and id(x) not in anc][::-1]
        raise XPathSyntaxError(f"unsupported axis {axis!r}")

    @staticmethod
    def _test(node, test: str, axis: str) -> bool:
        if test == "node()":
            return True
        if isinstance(node, TextNode):
            return test == "text()"
        if isinstance(node, AttrNode):
            # match on the LOCAL attribute name: configs write
            # @xml:id, ElementTree stores {ns}id
            local = node.name.rsplit("}", 1)[-1].rsplit(":", 1)[-1]
            return test == "*" or local == test.rsplit(":", 1)[-1]
        if test == "text()":
            return False
        if test == "*":
            return isinstance(node.tag, str)
        # namespace-prefixed name tests (tei:w) match by LOCAL name,
        # like the subset engine: ElementTree stores {uri}w and the
        # config's prefix binding is informational here
        return _local(node.tag) == test.rsplit(":", 1)[-1]

    # ---- steps ----

    def _apply_steps(self, nodes, steps, descend0=False):
        cur = nodes
        first = True
        for (axis, test, preds, descend_before) in steps:
            descend = descend0 if first else descend_before
            first = False
            nxt, seen = [], set()
            for n in cur:
                if descend:
                    bases = ([n] + [x for x in n.iter() if x is not n]
                             if not isinstance(n, (AttrNode, TextNode))
                             else [n])
                else:
                    bases = [n]
                for b in bases:
                    cands = [c for c in self._axis(b, axis)
                             if self._test(c, test, axis)]
                    cands = self._filter_preds(cands, preds, axis)
                    for c in cands:
                        key = id(c) if not isinstance(
                            c, (AttrNode, TextNode)) else c
                        if key not in seen:
                            seen.add(key)
                            nxt.append(c)
            cur = sorted(nxt, key=self.ctx.doc_order_key)
        return cur

    def _filter_preds(self, cands, preds, axis):
        for pred in preds:
            size = len(cands)
            kept = []
            for pos, c in enumerate(cands, 1):
                v = self.eval(pred, c, pos, size)
                ok = (_to_number(v) == pos if isinstance(v, float)
                      else _to_bool(v))
                if ok:
                    kept.append(c)
            cands = kept
        return cands

    # ---- expression evaluation ----

    def eval(self, ast, node, pos=1, size=1):
        kind = ast[0]
        if kind == "num":
            return ast[1]
        if kind == "str":
            return ast[1]
        if kind == "var":
            try:
                return self._vars[ast[1]]
            except (AttributeError, KeyError):
                raise XPathSyntaxError(
                    f"unbound variable ${ast[1]}") from None
        if kind == "seq":
            items: list = []
            for sub in ast[1]:
                v = self.eval(sub, node, pos, size)
                items.extend(v) if isinstance(v, list) \
                    else items.append(v)
            return items
        if kind == "for":
            # sequence order (NOT re-sorted to document order: the
            # ForExpr result is the concatenation of the return
            # clause over the bound items, per the XPath 2.0 spec)
            if not hasattr(self, "_vars"):
                self._vars = {}
            results: list = []

            def _rec(i):
                if i == len(ast[1]):
                    v = self.eval(ast[2], node, pos, size)
                    results.extend(v) if isinstance(v, list) \
                        else results.append(v)
                    return
                nm, e = ast[1][i]
                seq = self.eval(e, node, pos, size)
                if not isinstance(seq, list):
                    seq = [seq]
                missing = object()
                old_v = self._vars.get(nm, missing)
                for item in seq:
                    self._vars[nm] = item
                    _rec(i + 1)
                if old_v is missing:
                    del self._vars[nm]
                else:
                    self._vars[nm] = old_v
            _rec(0)
            return results
        if kind == "or":
            return _to_bool(self.eval(ast[1], node, pos, size)) \
                or _to_bool(self.eval(ast[2], node, pos, size))
        if kind == "and":
            return _to_bool(self.eval(ast[1], node, pos, size)) \
                and _to_bool(self.eval(ast[2], node, pos, size))
        if kind == "cmp":
            return self._compare(ast[1],
                                 self.eval(ast[2], node, pos, size),
                                 self.eval(ast[3], node, pos, size))
        if kind == "arith":
            a = _to_number(self.eval(ast[2], node, pos, size))
            b = _to_number(self.eval(ast[3], node, pos, size))
            op = ast[1]
            if op == "+":
                return a + b
            if op == "-":
                return a - b
            if op == "*":
                return a * b
            if op == "div":
                return a / b if b else (float("nan") if a != a or a == 0
                                        else float("inf") * (1 if a > 0
                                                             else -1))
            import math                          # mod: sign of dividend
            return math.fmod(a, b) if b else float("nan")
        if kind == "neg":
            return -_to_number(self.eval(ast[1], node, pos, size))
        if kind == "union":
            a = self.eval(ast[1], node, pos, size)
            b = self.eval(ast[2], node, pos, size)
            if not isinstance(a, list) or not isinstance(b, list):
                raise XPathSyntaxError("union of non-node-sets")
            seen, out = set(), []
            for n in a + b:
                key = id(n) if not isinstance(
                    n, (AttrNode, TextNode)) else n
                if key not in seen:
                    seen.add(key)
                    out.append(n)
            return sorted(out, key=self.ctx.doc_order_key)
        if kind == "path":
            _, absolute, descend0, steps = ast
            start = self.ctx.droot if absolute else node
            if not steps:
                return [start]
            return self._apply_steps([start], steps, descend0)
        if kind == "filter":
            _, prim, preds, tail, tail_descend = ast
            v = self.eval(prim, node, pos, size)
            if not isinstance(v, list):
                # a for-variable bound to one node is an item, not a
                # node-set — steps on it treat it as a singleton
                if not isinstance(v, (str, float, bool)) and \
                        v is not None:
                    v = [v]
                elif preds or tail:
                    raise XPathSyntaxError(
                        "predicates/steps on a non-node-set")
                else:
                    return v
            cands = self._filter_preds(
                sorted(v, key=self.ctx.doc_order_key), preds, "child")
            if tail:
                return self._apply_steps(cands, tail, tail_descend)
            return cands
        if kind == "call":
            return self._call(ast[1], ast[2], node, pos, size)
        raise XPathSyntaxError(f"bad AST node {kind!r}")

    @staticmethod
    def _cmp_vals(op, a, b) -> bool:
        if op in ("=", "!="):
            if isinstance(a, bool) or isinstance(b, bool):
                ok = _to_bool(a) == _to_bool(b)
            elif isinstance(a, float) or isinstance(b, float):
                ok = _to_number(a) == _to_number(b)
            else:
                ok = _to_string(a) == _to_string(b)
            return ok if op == "=" else not ok
        an, bn = _to_number(a), _to_number(b)
        return {"<": an < bn, ">": an > bn,
                "<=": an <= bn, ">=": an >= bn}[op]

    def _compare(self, op, a, b) -> bool:
        # node-set comparisons are existential (XPath 1.0 §3.4)
        if isinstance(a, list) and isinstance(b, list):
            avs = [string_value(x) for x in a]
            bvs = [string_value(x) for x in b]
            return any(self._cmp_vals(op, x, y)
                       for x in avs for y in bvs)
        if isinstance(a, list):
            return any(self._cmp_vals(op, string_value(x), b) for x in a)
        if isinstance(b, list):
            return any(self._cmp_vals(op, a, string_value(x)) for x in b)
        return self._cmp_vals(op, a, b)

    def _call(self, name, args, node, pos, size):
        ev = [self.eval(a, node, pos, size) for a in args]

        def s(i, default=None):
            if i >= len(ev):
                return (string_value(node) if default is None
                        else default)
            return _to_string(ev[i])

        if name == "position":
            return float(pos)
        if name == "last":
            return float(size)
        if name == "count":
            if not isinstance(ev[0], list):
                raise XPathSyntaxError("count() needs a node-set")
            return float(len(ev[0]))
        if name in ("local-name", "name"):
            if not ev:
                target = node
            else:
                if not ev[0]:
                    return ""
                target = ev[0][0]
            if isinstance(target, AttrNode):
                return target.name
            if isinstance(target, TextNode):
                return ""
            return _local(target.tag)
        if name == "string":
            return s(0)
        if name == "concat":
            return "".join(_to_string(v) for v in ev)
        if name == "starts-with":
            return s(0).startswith(s(1))
        if name == "ends-with":
            return s(0).endswith(s(1))
        if name == "contains":
            return s(1) in s(0)
        if name == "substring-before":
            a, b = s(0), s(1)
            i = a.find(b)
            return a[:i] if i >= 0 else ""
        if name == "substring-after":
            a, b = s(0), s(1)
            i = a.find(b)
            return a[i + len(b):] if i >= 0 else ""
        if name == "substring":
            a = s(0)
            start = round(_to_number(ev[1]))
            if len(ev) > 2:
                length = round(_to_number(ev[2]))
                if length != length or start != start:
                    return ""
                lo = max(0, start - 1)
                hi = max(lo, start - 1 + length)
                return a[lo:hi]
            if start != start:
                return ""
            return a[max(0, start - 1):]
        if name == "string-length":
            return float(len(s(0)))
        if name == "normalize-space":
            return " ".join(s(0).split())
        if name == "translate":
            src, frm, to = s(0), s(1), s(2)
            tbl = {ord(f): (to[i] if i < len(to) else None)
                   for i, f in enumerate(frm)}
            return src.translate(tbl)
        if name == "upper-case":
            return s(0).upper()
        if name == "lower-case":
            return s(0).lower()
        if name == "replace":
            return re.sub(s(1), s(2), s(0))
        if name == "matches":
            return re.search(s(1), s(0)) is not None
        if name == "boolean":
            return _to_bool(ev[0])
        if name == "not":
            return not _to_bool(ev[0])
        if name == "true":
            return True
        if name == "false":
            return False
        if name == "number":
            return _to_number(ev[0]) if ev else _to_number(
                string_value(node))
        if name == "sum":
            if not isinstance(ev[0], list):
                raise XPathSyntaxError("sum() needs a node-set")
            return float(sum(_to_number(string_value(x))
                             for x in ev[0]))
        if name == "floor":
            import math
            return float(math.floor(_to_number(ev[0])))
        if name == "ceiling":
            import math
            return float(math.ceil(_to_number(ev[0])))
        if name == "round":
            import math
            v = _to_number(ev[0])
            return v if v != v else float(math.floor(v + 0.5))
        if name == "tokenize":
            # XPath 2.0 fn:tokenize(input, pattern) — a sequence of
            # strings (empty sequence for the empty input, per spec).
            # The XPath-3.1 one-arg whitespace form is out of scope:
            # name it instead of crashing on a missing argument.
            if len(ev) < 2:
                raise XPathSyntaxError(
                    "tokenize() needs (input, pattern) — the one-"
                    "argument whitespace form is not supported")
            s0 = s(0)
            if s0 == "":
                return []
            return list(re.split(_to_string(ev[1]), s0))
        if name == "string-join":
            sep = s(1, "") if len(ev) > 1 else ""
            seq = ev[0] if isinstance(ev[0], list) else [ev[0]]
            return sep.join(string_value(x) for x in seq)
        raise XPathSyntaxError(f"unknown function {name}()")


# ---------------------------------------------------------------------------
# public API

_PARSE_CACHE: dict[str, Any] = {}


def evaluate(expr: str, node, parents: dict | None = None,
             root=None, ctx: Context | None = None) -> Any:
    """Evaluate ``expr`` with ``node`` as the context node. Returns a
    float, str, bool, or node-set (list of Element/AttrNode/TextNode).
    ``root`` defaults to the top of the parents chain (absolute paths
    resolve against it). Pass a prebuilt ``ctx`` (``Context(root)``)
    when evaluating many expressions over one document — the context
    holds the document-order map, which costs one tree walk."""
    ast = _PARSE_CACHE.get(expr)
    if ast is None:
        if len(_PARSE_CACHE) > 4096:
            _PARSE_CACHE.clear()
        ast = _PARSE_CACHE[expr] = parse(expr)
    if ctx is None:
        if root is None:
            root = node
            p = (parents or {}).get(root)
            while p is not None:
                root = p
                p = (parents or {}).get(root)
        ctx = Context(root, parents)
    return _Evaluator(ctx).eval(ast, node)


def evaluate_string(expr: str, node, parents: dict | None = None,
                    root=None, ctx: Context | None = None) -> str:
    return _to_string(evaluate(expr, node, parents, root, ctx))


def evaluate_nodes(expr: str, node, parents: dict | None = None,
                   root=None, ctx: Context | None = None) -> list:
    v = evaluate(expr, node, parents, root, ctx)
    if not isinstance(v, list):
        raise XPathSyntaxError(f"{expr!r} is not a node-set expression")
    return v
