"""MVEL-expression subset → Spark SQL translator.

The reference's anchors and derivations accept MVEL expressions
(`def: "isPresent(f) ? Math.log(f) : null"`); its engine compiles them
with the MVEL runtime plus a UDF registry
(feathr-impl/src/main/java/com/linkedin/feathr/common/util/
MvelContextUDFs.java:63-340, anchorExtractor/
SimpleConfigurableAnchorExtractor.scala). Running a JVM MVEL
interpreter per row would put every feature on the slow row-at-a-time
path, so this engine TRANSLATES the expression subset that actually
appears in reference configs into Spark SQL — the compiled plan stays
inside Catalyst/codegen, and the translation is inspectable
(``mvel_to_sql`` returns the SQL string).

Supported surface (everything observed in the reference's configs and
MvelContextUDFs):

- literals (numbers, single/double-quoted strings, true/false/null),
  identifiers and dotted property paths (struct-field navigation)
- operators: ``? :``, ``|| &&``, ``== != < <= > >=``, ``+ - * / %``,
  unary ``! -``; ``== null`` / ``!= null`` emit IS [NOT] NULL
- Java casts: ``(Float) x``, ``(Double)``, ``(Integer)``, ``(Long)``,
  ``(String)``, ``(Boolean)``, ``(Number)``
- ``Math.*``: log, log10, abs, sqrt, cbrt, exp, pow, min, max, floor,
  ceil, round, signum, sin/cos/tan/asin/acos/atan/atan2/sinh/cosh/tanh
- String methods: toLowerCase, toUpperCase, trim, length, substring,
  contains, startsWith, endsWith, equals, equalsIgnoreCase, indexOf,
  split, matches, replace, replaceAll, isEmpty, concat, charAt,
  toString; collection methods size, isEmpty
- MvelContextUDFs: toNumeric, toBoolean, toCategorical, isPresent,
  isNonZero, isnull, isnotnull, and, or, not, concat, if_else,
  cast_double, cast_float, cast_int, get_data_type, getTerms,
  getTopKTerms, getTopTerm, distinct, flatten, cosineSimilarity

- MVEL projections (r5): ``(P in coll)`` -> ``transform(coll, P)``,
  with filter ``(P in coll if F)`` -> ``transform(filter(coll, F), P)``;
  the element variable ``$`` maps to the Spark lambda variable, and a
  single-entry map-literal projection ``([$.k : $.v] in coll ...)``
  (the reference's testMVELLoopExpFeature.conf shape) emits
  ``map_from_entries`` so the feature value is one map, matching the
  reference's term-vector coercion. Inline list ``[a, b]`` and map
  ``[k : v, ...]`` literals emit ``array(...)`` / ``map(...)``.

``import`` and nested projections remain unsupported and raise
:class:`MvelTranslationError` — the caller should use a Spark SQL
``expr`` directly for those (the engine's native extractor language).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Dict, Optional

__all__ = [
    "MvelTranslationError",
    "mvel_to_sql",
    "mvel_column",
    "MvelAnchorExtractor",
    "mvel_feature",
]


class MvelTranslationError(ValueError):
    """Raised when an expression uses MVEL surface outside the
    supported subset (projections, imports, unknown functions)."""


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?[fFdDlL]?|\.\d+(?:[eE][+-]?\d+)?[fFdDlL]?|\d+(?:[eE][+-]?\d+)?[fFdDlL]?)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<id>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<op>\?|:|\|\||&&|==|!=|<=|>=|<|>|\+|-|\*|/|%|!|\(|\)|\[|\]|,|\.)
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str  # num | str | id | op | eof
    text: str
    pos: int


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise MvelTranslationError(
                f"unrecognized character {src[i]!r} at position {i} in MVEL "
                f"expression {src!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append(_Tok(kind, m.group(), m.start()))
    toks.append(_Tok("eof", "", len(src)))
    return toks


# ---------------------------------------------------------------------------
# parser → SQL emitter (precedence climbing, emits SQL text directly)
# ---------------------------------------------------------------------------

# SQL keywords that break parsing when emitted as bare column names
# (the reference's own test configs use e.g. `as` as a field name)
_SQL_RESERVED = {
    "as", "in", "if", "then", "else", "end", "select", "from", "where",
    "and", "or", "not", "case", "when", "cast", "group", "order", "by",
    "join", "on", "is", "like", "between", "distinct", "having", "union",
    "all", "true", "false", "null", "current_date", "current_timestamp",
}

_CAST_TYPES = {
    "float": "FLOAT", "Float": "FLOAT",
    "double": "DOUBLE", "Double": "DOUBLE", "Number": "DOUBLE",
    "int": "INT", "Integer": "INT",
    "long": "BIGINT", "Long": "BIGINT",
    "String": "STRING", "string": "STRING",
    "boolean": "BOOLEAN", "Boolean": "BOOLEAN",
}

_MATH_FNS = {
    "log": "LN({0})", "log10": "LOG10({0})", "abs": "ABS({0})",
    "sqrt": "SQRT({0})", "cbrt": "CBRT({0})", "exp": "EXP({0})",
    "pow": "POWER({0}, {1})", "min": "LEAST({0}, {1})",
    "max": "GREATEST({0}, {1})", "floor": "FLOOR({0})",
    "ceil": "CEIL({0})", "round": "ROUND({0})", "signum": "SIGN({0})",
    "sin": "SIN({0})", "cos": "COS({0})", "tan": "TAN({0})",
    "asin": "ASIN({0})", "acos": "ACOS({0})", "atan": "ATAN({0})",
    "atan2": "ATAN2({0}, {1})", "sinh": "SINH({0})", "cosh": "COSH({0})",
    "tanh": "TANH({0})",
}

_TOPK_TERMS = (
    "transform(slice(array_sort(map_entries({0}), "
    "(l, r) -> CASE WHEN l.value > r.value THEN -1 "
    "WHEN l.value < r.value THEN 1 ELSE 0 END), 1, {1}), e -> e.key)"
)

_COSINE = (
    "(aggregate(zip_with({0}, {1}, (x, y) -> x * y), CAST(0 AS DOUBLE), "
    "(s, v) -> s + v) / (sqrt(aggregate({0}, CAST(0 AS DOUBLE), "
    "(s, v) -> s + v * v)) * sqrt(aggregate({1}, CAST(0 AS DOUBLE), "
    "(s, v) -> s + v * v))))"
)

# top-level function registry: name -> (min_args, max_args, template)
_FUNCTIONS: Dict[str, tuple[int, int, str]] = {
    "toNumeric": (1, 1, "CAST({0} AS DOUBLE)"),
    "toBoolean": (1, 1, "CAST({0} AS BOOLEAN)"),
    "toCategorical": (1, 1, "CAST({0} AS STRING)"),
    "isPresent": (1, 1, "({0} IS NOT NULL)"),
    "isNonZero": (1, 1, "({0} IS NOT NULL AND CAST({0} AS DOUBLE) <> 0.0)"),
    "isnull": (1, 1, "({0} IS NULL)"),
    "isnotnull": (1, 1, "({0} IS NOT NULL)"),
    "and": (2, 2, "({0} AND {1})"),
    "or": (2, 2, "({0} OR {1})"),
    "not": (1, 1, "(NOT {0})"),
    "concat": (2, 2, "concat({0}, {1})"),
    "if_else": (3, 3, "IF({0}, {1}, {2})"),
    "cast_double": (1, 1, "CAST({0} AS DOUBLE)"),
    "cast_float": (1, 1, "CAST({0} AS FLOAT)"),
    "cast_int": (1, 1, "CAST({0} AS INT)"),
    "get_data_type": (1, 1, "typeof({0})"),
    # term-vector (map<string,double>) features
    "getTerms": (1, 1, "map_keys({0})"),
    "getTopKTerms": (2, 2, _TOPK_TERMS),
    "getTopTerm": (1, 1, "element_at(" + _TOPK_TERMS.replace("{1}", "1") + ", 1)"),
    "distinct": (1, 1, "array_distinct({0})"),
    "flatten": (1, 1, "flatten({0})"),
    "cosineSimilarity": (2, 2, _COSINE),
}

# instance-method registry: name -> (min_args, max_args, emitter(recv, args))
_METHODS: Dict[str, tuple[int, int, Callable[..., str]]] = {
    "toLowerCase": (0, 0, lambda r: f"lower({r})"),
    "toUpperCase": (0, 0, lambda r: f"upper({r})"),
    "trim": (0, 0, lambda r: f"trim({r})"),
    "length": (0, 0, lambda r: f"length({r})"),
    "size": (0, 0, lambda r: f"size({r})"),
    "isEmpty": (0, 0, lambda r: f"(length({r}) = 0)"),
    "toString": (0, 0, lambda r: f"CAST({r} AS STRING)"),
    "intValue": (0, 0, lambda r: f"CAST({r} AS INT)"),
    "doubleValue": (0, 0, lambda r: f"CAST({r} AS DOUBLE)"),
    "floatValue": (0, 0, lambda r: f"CAST({r} AS FLOAT)"),
    "longValue": (0, 0, lambda r: f"CAST({r} AS BIGINT)"),
    # Java substring is 0-based begin / exclusive end; SQL substring is
    # 1-based start / length
    "substring": (1, 2, lambda r, a, b=None:
                  f"substring({r}, ({a}) + 1, ({b}) - ({a}))" if b is not None
                  else f"substring({r}, ({a}) + 1)"),
    "charAt": (1, 1, lambda r, a: f"substring({r}, ({a}) + 1, 1)"),
    "contains": (1, 1, lambda r, a: f"(instr({r}, {a}) > 0)"),
    "startsWith": (1, 1, lambda r, a: f"startswith({r}, {a})"),
    "endsWith": (1, 1, lambda r, a: f"endswith({r}, {a})"),
    "equals": (1, 1, lambda r, a: f"({r} = {a})"),
    "equalsIgnoreCase": (1, 1, lambda r, a: f"(lower({r}) = lower({a}))"),
    "indexOf": (1, 1, lambda r, a: f"(instr({r}, {a}) - 1)"),
    "split": (1, 1, lambda r, a: f"split({r}, {a})"),
    "matches": (1, 1, lambda r, a: f"({r} RLIKE {a})"),
    "replace": (2, 2, lambda r, a, b: f"replace({r}, {a}, {b})"),
    "replaceAll": (2, 2, lambda r, a, b: f"regexp_replace({r}, {a}, {b})"),
    "concat": (1, 1, lambda r, a: f"concat({r}, {a})"),
}

_RESERVED = {"true": "TRUE", "false": "FALSE", "null": "NULL"}


class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = _tokenize(src)
        self.i = 0
        self._proj_depth = 0  # >0 while parsing a projection body/filter

    # -- token helpers ----------------------------------------------------
    def peek(self, k: int = 0) -> _Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def accept(self, text: str) -> Optional[_Tok]:
        if self.peek().kind == "op" and self.peek().text == text:
            return self.next()
        return None

    def expect(self, text: str) -> _Tok:
        t = self.accept(text)
        if t is None:
            p = self.peek()
            raise MvelTranslationError(
                f"expected {text!r} at position {p.pos} in {self.src!r}, "
                f"found {p.text or 'end of expression'!r}")
        return t

    # -- grammar ----------------------------------------------------------
    def parse(self) -> str:
        sql = self.ternary()
        t = self.peek()
        if t.kind != "eof":
            raise MvelTranslationError(
                f"unexpected {t.text!r} at position {t.pos} in {self.src!r} "
                "(MVEL imports and nested projections are not supported — "
                "use a Spark SQL expr)")
        return sql

    def ternary(self) -> str:
        cond = self.or_()
        if self.accept("?"):
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            return f"IF({cond}, {a}, {b})"
        return cond

    def or_(self) -> str:
        left = self.and_()
        while self.accept("||"):
            left = f"({left} OR {self.and_()})"
        return left

    def and_(self) -> str:
        left = self.equality()
        while self.accept("&&"):
            left = f"({left} AND {self.equality()})"
        return left

    def equality(self) -> str:
        left = self.relational()
        while True:
            # MVEL null equality is symmetric: 'null == x' must emit IS
            # NULL exactly like 'x == null' (SQL 'NULL = x' would yield
            # NULL, i.e. false in a filter — a silent semantics change)
            if self.accept("=="):
                right = self.relational()
                if right == "NULL" and left == "NULL":
                    left = "TRUE"
                elif right == "NULL":
                    left = f"({left} IS NULL)"
                elif left == "NULL":
                    left = f"({right} IS NULL)"
                else:
                    left = f"({left} = {right})"
            elif self.accept("!="):
                right = self.relational()
                if right == "NULL" and left == "NULL":
                    left = "FALSE"
                elif right == "NULL":
                    left = f"({left} IS NOT NULL)"
                elif left == "NULL":
                    left = f"({right} IS NOT NULL)"
                else:
                    left = f"({left} <> {right})"
            else:
                return left

    def relational(self) -> str:
        left = self.additive()
        while True:
            for op in ("<=", ">=", "<", ">"):
                if self.accept(op):
                    left = f"({left} {op} {self.additive()})"
                    break
            else:
                return left

    def additive(self) -> str:
        left = self.multiplicative()
        while True:
            if self.accept("+"):
                left = f"({left} + {self.multiplicative()})"
            elif self.accept("-"):
                left = f"({left} - {self.multiplicative()})"
            else:
                return left

    def multiplicative(self) -> str:
        left = self.unary()
        while True:
            if self.accept("*"):
                left = f"({left} * {self.unary()})"
            elif self.accept("/"):
                left = f"({left} / {self.unary()})"
            elif self.accept("%"):
                left = f"({left} % {self.unary()})"
            else:
                return left

    def unary(self) -> str:
        if self.accept("!"):
            return f"(NOT {self.unary()})"
        if self.accept("-"):
            return f"(- {self.unary()})"
        if self.accept("+"):
            return self.unary()
        # Java cast: '(' Type ')' operand — distinguished from a
        # parenthesized expression by the type name and a following
        # operand-start token
        nxt = self.peek(3)
        if (self.peek().kind == "op" and self.peek().text == "("
                and self.peek(1).kind == "id"
                and self.peek(1).text in _CAST_TYPES
                and self.peek(2).kind == "op" and self.peek(2).text == ")"
                and (nxt.kind in ("num", "str", "id")
                     or (nxt.kind == "op" and nxt.text in ("(", "!", "-")))):
            self.next()
            ty = _CAST_TYPES[self.next().text]
            self.next()
            return f"CAST({self.unary()} AS {ty})"
        return self.postfix()

    def postfix(self) -> str:
        sql = self.primary()
        while True:
            if self.accept("."):
                name_t = self.next()
                if name_t.kind != "id":
                    raise MvelTranslationError(
                        f"expected member name after '.' at position "
                        f"{name_t.pos} in {self.src!r}")
                name = name_t.text
                if self.peek().kind == "op" and self.peek().text == "(":
                    args = self.call_args()
                    sql = self.emit_method(sql, name, args, name_t.pos)
                else:
                    # property navigation → struct-field access
                    sql = f"{sql}.{name}"
            elif self.peek().kind == "op" and self.peek().text == "[":
                self.next()
                idx = self.ternary()
                self.expect("]")
                # MVEL indexing is 0-based; element_at is 1-based
                sql = f"element_at({sql}, ({idx}) + 1)"
            else:
                return sql

    def _looks_like_projection(self) -> bool:
        """True when the '(' at the cursor opens ``(P in coll [if F])``:
        a top-level ``in`` identifier before the matching ')'."""
        depth = 0
        for k in range(self.i, len(self.toks)):
            tok = self.toks[k]
            if tok.kind == "op" and tok.text in "([":
                depth += 1
            elif tok.kind == "op" and tok.text in ")]":
                depth -= 1
                if depth == 0:
                    return False
            elif tok.kind == "id" and tok.text == "in" and depth == 1:
                return True
            elif tok.kind == "eof":
                return False
        return False

    def _projection(self) -> str:
        """``(P in coll)`` / ``(P in coll if F)`` -> transform/filter.
        The element variable ``$`` binds to the Spark lambda variable;
        a single-entry map-literal body emits map_from_entries (one map
        per row — the reference's term-vector shape)."""
        self.expect("(")
        if self._proj_depth:
            raise MvelTranslationError(
                f"nested MVEL projections are not supported ({self.src!r})")
        # single-entry map literal body? ([k : v] in ...)
        map_kv = None
        save = self.i
        if self.peek().kind == "op" and self.peek().text == "[":
            try:
                self._proj_depth += 1
                self.next()
                k = self.ternary()
                self.expect(":")
                v = self.ternary()
                self.expect("]")
                map_kv = (k, v)
            except MvelTranslationError:
                self.i = save
                map_kv = None
            finally:
                self._proj_depth -= 1
        proj = None
        if map_kv is None:
            self._proj_depth += 1
            proj = self.ternary()
            self._proj_depth -= 1
        t = self.next()
        if not (t.kind == "id" and t.text == "in"):
            raise MvelTranslationError(
                f"expected 'in' at position {t.pos} in projection "
                f"{self.src!r}")
        coll = self.ternary()
        filt = None
        if self.peek().kind == "id" and self.peek().text == "if":
            self.next()
            self._proj_depth += 1
            filt = self.ternary()
            self._proj_depth -= 1
        self.expect(")")
        src = coll if filt is None else f"filter({coll}, __x -> ({filt}))"
        if map_kv is not None:
            k, v = map_kv
            return (f"map_from_entries(transform({src}, "
                    f"__x -> struct({k}, {v})))")
        return f"transform({src}, __x -> {proj})"

    def _collection_literal(self) -> str:
        """Inline MVEL ``[a, b, ...]`` -> array(...), ``[k : v, ...]``
        -> map(k, v, ...). Empty ``[]`` -> array()."""
        self.expect("[")
        if self.accept("]"):
            return "array()"
        first = self.ternary()
        if self.accept(":"):
            parts = [first, self.ternary()]
            while self.accept(","):
                parts.append(self.ternary())
                self.expect(":")
                parts.append(self.ternary())
            self.expect("]")
            return f"map({', '.join(parts)})"
        items = [first]
        while self.accept(","):
            items.append(self.ternary())
        self.expect("]")
        return f"array({', '.join(items)})"

    def call_args(self) -> list[str]:
        self.expect("(")
        args: list[str] = []
        if not (self.peek().kind == "op" and self.peek().text == ")"):
            args.append(self.ternary())
            while self.accept(","):
                args.append(self.ternary())
        self.expect(")")
        return args

    def emit_method(self, recv: str, name: str, args: list[str],
                    pos: int) -> str:
        spec = _METHODS.get(name)
        if spec is None:
            raise MvelTranslationError(
                f"unsupported method .{name}() at position {pos} in "
                f"{self.src!r}")
        lo, hi, emit = spec
        if not (lo <= len(args) <= hi):
            raise MvelTranslationError(
                f".{name}() takes {lo}..{hi} args, got {len(args)} in "
                f"{self.src!r}")
        return emit(recv, *args)

    def primary(self) -> str:
        t = self.peek()
        if t.kind == "num":
            self.next()
            text = t.text
            if text[-1] in "fFdD" and not text[-1].isdigit():
                return f"CAST({text[:-1]} AS " + \
                    ("FLOAT)" if text[-1] in "fF" else "DOUBLE)")
            if text[-1] in "lL" and not text[-1].isdigit():
                return f"CAST({text[:-1]} AS BIGINT)"
            return text
        if t.kind == "str":
            self.next()
            body = t.text[1:-1]
            # unescape java-style, re-escape for SQL single quotes
            body = (body.replace("\\\\", "\x00").replace("\\'", "'")
                    .replace('\\"', '"').replace("\\n", "\n")
                    .replace("\\t", "\t").replace("\x00", "\\"))
            return "'" + body.replace("\\", "\\\\").replace("'", "\\'") + "'"
        if t.kind == "id":
            # Math.fn(...)
            if (t.text == "Math" and self.peek(1).kind == "op"
                    and self.peek(1).text == "."):
                self.next()
                self.next()
                fn_t = self.next()
                tmpl = _MATH_FNS.get(fn_t.text)
                if tmpl is None:
                    raise MvelTranslationError(
                        f"unsupported Math.{fn_t.text} in {self.src!r}")
                args = self.call_args()
                n_slots = len(set(re.findall(r"\{(\d)\}", tmpl)))
                if len(args) != n_slots:
                    raise MvelTranslationError(
                        f"Math.{fn_t.text} takes {n_slots} args, got "
                        f"{len(args)} in {self.src!r}")
                return tmpl.format(*args)
            if t.text in _RESERVED:
                self.next()
                return _RESERVED[t.text]
            if t.text == "import":
                raise MvelTranslationError(
                    f"MVEL 'import' is not supported ({self.src!r})")
            # function call
            if self.peek(1).kind == "op" and self.peek(1).text == "(":
                self.next()
                spec = _FUNCTIONS.get(t.text)
                if spec is None:
                    raise MvelTranslationError(
                        f"unknown function {t.text!r} at position {t.pos} in "
                        f"{self.src!r} — supported: "
                        f"{', '.join(sorted(_FUNCTIONS))}")
                lo, hi, tmpl = spec
                args = self.call_args()
                if not (lo <= len(args) <= hi):
                    raise MvelTranslationError(
                        f"{t.text}() takes {lo}..{hi} args, got {len(args)} "
                        f"in {self.src!r}")
                return tmpl.format(*args)
            if t.text == "$":
                if self._proj_depth == 0:
                    raise MvelTranslationError(
                        f"MVEL element variable '$' is only valid inside a "
                        f"projection body/filter ({self.src!r})")
                self.next()
                return "__x"
            if t.text.startswith("$"):
                raise MvelTranslationError(
                    f"unsupported MVEL variable {t.text!r} ({self.src!r})")
            self.next()
            if not t.text.isidentifier() or t.text.lower() in _SQL_RESERVED:
                return f"`{t.text}`"
            return t.text
        if t.kind == "op" and t.text == "(":
            if self._looks_like_projection():
                return self._projection()
            self.next()
            inner = self.ternary()
            self.expect(")")
            return f"({inner})"
        if t.kind == "op" and t.text == "[":
            return self._collection_literal()
        raise MvelTranslationError(
            f"unexpected {t.text or 'end of expression'!r} at position "
            f"{t.pos} in {self.src!r}")


def mvel_to_sql(expr: str) -> str:
    """Translate an MVEL expression (reference anchor/derivation
    ``def:`` subset) to an equivalent Spark SQL expression string."""
    return _Parser(expr).parse()


def mvel_column(expr: str):
    """Translate an MVEL expression and return it as a Spark Column."""
    from pyspark.sql import functions as F

    return F.expr(mvel_to_sql(expr))


def mvel_feature(name: str, expr: str, default=None):
    """Build a row-level :class:`~feathr_spark.definitions.Feature`
    from an MVEL definition (the reference's
    ``features: { name: { def: "<mvel>" } }`` anchor form)."""
    from feathr_spark.definitions import Feature

    return Feature(name, mvel_to_sql(expr), default=default)


class MvelAnchorExtractor:
    """AnchorExtractor that evaluates a dict of MVEL feature
    definitions (reference SimpleConfigurableAnchorExtractor.scala:
    MVEL branch) — each expression is translated once at plan time and
    evaluated entirely inside Catalyst."""

    def __init__(self, features: dict[str, str]):
        self.features = dict(features)
        self._sql = {n: mvel_to_sql(e) for n, e in self.features.items()}

    def transform(self, df):
        from pyspark.sql import functions as F

        return {n: F.expr(s) for n, s in self._sql.items()}

    def apply(self, df):
        from feathr_spark.definitions import AnchorExtractor

        return AnchorExtractor.apply(self, df)
