"""Minimal HOCON parser for the reference's feature-definition dialect.

The reference's user surface is HOCON configs (feathr-impl/.../offline/
config/FeathrConfigLoader.scala parses them with typesafe-config). This
is a from-scratch parser of the HOCON *subset* those configs actually
use — no JVM, no third-party dependency:

- objects ``{ k: v }`` (root braces optional), arrays ``[a, b]``
- ``key: value`` / ``key = value`` / ``key { ... }`` (separator optional
  before an object)
- dotted unquoted keys create nested objects (``def.sqlExpr: x``)
- duplicate object keys deep-merge, scalars last-write-wins (HOCON
  object-merge semantics)
- ``//`` and ``#`` comments, optional commas, newline separators
- quoted strings with escapes, triple-quoted strings, and unquoted
  strings that run to end-of-line (so ``lateralViewDef:
  explode(features)`` parses without quotes, exactly as typesafe-config
  treats it)
- numbers / booleans / null recognized in unquoted values

- ``include "file.conf"`` / ``include classpath("x.conf")`` /
  ``include file("x.conf")`` / ``include required(...)`` — resolved
  through a caller-supplied resolver (see :func:`load_file`); per the
  HOCON spec a missing include is silently skipped unless wrapped in
  ``required(...)``. Typesafe reference:
  com.typesafe.config.impl.ConfigParser (the reference loads configs
  with typesafe-config via FeathrConfigLoader.scala).

Not supported (and not used by any reference test config we target):
``${substitutions}``, ``+=``. Hitting one raises ``HoconParseError``
with the offset so the config can be fixed rather than silently
misread.
"""

from __future__ import annotations

import os
import re

__all__ = ["loads", "load_file", "HoconParseError"]


class HoconParseError(ValueError):
    pass


_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
# chars that terminate an unquoted key token
_KEY_END = set(':={}[],#"\n\r\t ')


class _P:
    def __init__(self, text: str, include_resolver=None):
        self.s = text
        self.i = 0
        self.n = len(text)
        self.include_resolver = include_resolver

    # -- low-level ---------------------------------------------------------
    def err(self, msg: str) -> HoconParseError:
        line = self.s.count("\n", 0, self.i) + 1
        return HoconParseError(f"{msg} at offset {self.i} (line {line})")

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def skip_ws(self, newlines: bool = True) -> None:
        """Skip whitespace and comments; optionally stop at newlines."""
        while self.i < self.n:
            c = self.s[self.i]
            if c in " \t\r" or (newlines and c == "\n"):
                self.i += 1
            elif c == "#" or self.s.startswith("//", self.i):
                while self.i < self.n and self.s[self.i] != "\n":
                    self.i += 1
            else:
                return

    # -- values ------------------------------------------------------------
    def parse_root(self):
        self.skip_ws()
        if self.peek() == "{":
            obj = self.parse_object()
        elif self.peek() == "[":
            obj = self.parse_array()
        else:  # root braces omitted (HOCON allows it; every .conf uses it)
            obj = self.parse_object(braceless=True)
        self.skip_ws()
        if self.i < self.n:
            raise self.err(f"trailing content {self.s[self.i:self.i+20]!r}")
        return obj

    def parse_object(self, braceless: bool = False) -> dict:
        if not braceless:
            assert self.peek() == "{"
            self.i += 1
        out: dict = {}
        while True:
            self.skip_ws()
            c = self.peek()
            if c == ",":  # stray separators
                self.i += 1
                continue
            if c == "}":
                if braceless:
                    raise self.err("unexpected '}'")
                self.i += 1
                return out
            if c == "":
                if braceless:
                    return out
                raise self.err("unterminated object")
            path = self.parse_key_path()
            self.skip_ws(newlines=False)
            c = self.peek()
            # HOCON: a member starting with the unquoted token `include`
            # followed by a string / classpath() / file() / url() /
            # required() is an include directive, not a key (a key named
            # include still works: it is followed by ':', '=' or '{')
            if path == ["include"] and c not in ":={":
                inc = self.parse_include_target()
                if inc is not None:
                    _merge(out, inc)
                continue
            if c in ":=":
                self.i += 1
                self.skip_ws(newlines=False)
                val = self.parse_value()
            elif c == "{":
                val = self.parse_object()
            elif c == "+" and self.s.startswith("+=", self.i):
                raise self.err("'+=' is not supported")
            else:
                raise self.err(f"expected ':', '=' or '{{' after key {path!r}")
            _assign(out, path, val)

    def parse_include_target(self):
        """Parse the target of an include directive and return the parsed
        included document (dict) or None when the include is optional and
        unresolvable. Accepts ``"name"``, ``classpath("name")``,
        ``file("name")``, ``url("name")`` and ``required(<any of those>)``."""
        required = False
        kind = "heuristic"
        if self.peek() != '"':
            j = self.i
            while self.i < self.n and self.s[self.i] not in _KEY_END \
                    and self.s[self.i] != "(":
                self.i += 1
            word = self.s[j:self.i]
            if word == "required":
                required = True
                if self.peek() != "(":
                    raise self.err("expected '(' after required")
                self.i += 1
                self.skip_ws(newlines=False)
                if self.peek() != '"':
                    j = self.i
                    while self.i < self.n and self.s[self.i] not in _KEY_END \
                            and self.s[self.i] != "(":
                        self.i += 1
                    kind = self.s[j:self.i]
            else:
                kind = word
            if kind not in ("classpath", "file", "url", "heuristic") or \
                    (kind != "heuristic" and self.peek() != "("):
                raise self.err(f"malformed include directive ({word!r})")
            if self.peek() == "(":
                self.i += 1
                self.skip_ws(newlines=False)
        if self.peek() != '"':
            raise self.err("include target must be a quoted string")
        name = self.parse_quoted()
        self.skip_ws(newlines=False)
        while self.peek() == ")":  # close file(...) and required(...)
            self.i += 1
            self.skip_ws(newlines=False)
        text = self.include_resolver(name) if self.include_resolver else None
        if text is None:
            if required:
                raise self.err(f"required include {name!r} not resolvable")
            return None  # HOCON: optional includes are silently skipped
        sub = _P(text, self.include_resolver).parse_root()
        if not isinstance(sub, dict):
            raise self.err(f"include {name!r} is not an object")
        return sub

    def parse_key_path(self) -> list:
        parts = []
        while True:
            self.skip_ws(newlines=False)
            if self.peek() == '"':
                parts.append(self.parse_quoted())
            else:
                j = self.i
                while self.i < self.n and self.s[self.i] not in _KEY_END \
                        and self.s[self.i] != ".":
                    self.i += 1
                if self.i == j:
                    raise self.err("empty key")
                parts.append(self.s[j:self.i])
            if self.peek() == ".":
                self.i += 1
                continue
            return parts

    def parse_array(self) -> list:
        assert self.peek() == "["
        self.i += 1
        out = []
        while True:
            self.skip_ws()
            c = self.peek()
            if c == ",":
                self.i += 1
                continue
            if c == "]":
                self.i += 1
                return out
            if c == "":
                raise self.err("unterminated array")
            out.append(self.parse_value(in_array=True))

    def parse_value(self, in_array: bool = False):
        c = self.peek()
        if c == "{":
            return self.parse_object()
        if c == "[":
            return self.parse_array()
        if self.s.startswith('"""', self.i):
            return self.parse_triple()
        if c == '"':
            return self.parse_quoted()
        if self.s.startswith("${", self.i):
            raise self.err("HOCON substitutions (${...}) are not supported")
        # unquoted value: runs to end of line / ',' / closing bracket /
        # comment start; internal spaces kept then trimmed (typesafe-config
        # value concatenation collapses to the same string here)
        j = self.i
        stop = ",]\n" if in_array else ",}\n"
        while self.i < self.n:
            ch = self.s[self.i]
            if ch in stop or ch == "#" or self.s.startswith("//", self.i):
                break
            self.i += 1
        raw = self.s[j:self.i].strip()
        if not raw:
            raise self.err("empty value")
        return _coerce(raw)

    def parse_quoted(self) -> str:
        assert self.peek() == '"'
        self.i += 1
        buf = []
        while self.i < self.n:
            c = self.s[self.i]
            if c == '"':
                self.i += 1
                return "".join(buf)
            if c == "\\":
                self.i += 1
                e = self.peek()
                buf.append({"n": "\n", "t": "\t", "r": "\r", '"': '"',
                            "\\": "\\", "/": "/"}.get(e, e))
                self.i += 1
            else:
                buf.append(c)
                self.i += 1
        raise self.err("unterminated string")

    def parse_triple(self) -> str:
        self.i += 3
        end = self.s.find('"""', self.i)
        if end < 0:
            raise self.err("unterminated triple-quoted string")
        val = self.s[self.i:end]
        self.i = end + 3
        return val


def _coerce(raw: str):
    if raw == "true":
        return True
    if raw == "false":
        return False
    if raw == "null":
        return None
    if _NUM_RE.match(raw):
        try:
            return int(raw)
        except ValueError:
            return float(raw)
    return raw


def _assign(obj: dict, path: list, val) -> None:
    """Set obj[path...] = val with HOCON merge semantics: object-over-
    object deep-merges, anything else replaces."""
    for k in path[:-1]:
        nxt = obj.get(k)
        if not isinstance(nxt, dict):
            nxt = {}
            obj[k] = nxt
        obj = nxt
    k = path[-1]
    old = obj.get(k)
    if isinstance(old, dict) and isinstance(val, dict):
        _merge(old, val)
    else:
        obj[k] = val


def _merge(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(dst.get(k), dict) and isinstance(v, dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def loads(text: str, include_resolver=None):
    """Parse a HOCON document into plain dict/list/scalar values.

    ``include_resolver(name) -> str | None`` supplies the text of
    ``include`` targets; with the default ``None`` resolver, optional
    includes are skipped and ``required(...)`` ones raise."""
    return _P(text, include_resolver).parse_root()


def load_file(path: str, classpath_roots: tuple = ()):
    """Parse a HOCON file, resolving ``include`` targets relative to the
    including file's directory first, then against ``classpath_roots``
    (what typesafe-config's classpath() does against the JVM classpath —
    here: explicit resource roots, e.g. a test-resources directory)."""
    base = os.path.dirname(os.path.abspath(path))

    def resolver(name: str):
        for root in (base, *classpath_roots):
            cand = os.path.join(root, name)
            if os.path.isfile(cand):
                with open(cand, encoding="utf-8") as fh:
                    return fh.read()
        return None

    with open(path, encoding="utf-8") as fh:
        return _P(fh.read(), resolver).parse_root()
