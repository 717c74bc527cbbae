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

Not supported (and not used by any reference test config we target):
``include``, ``${substitutions}``, ``+=``. Hitting one raises
``HoconParseError`` with the offset so the config can be fixed rather
than silently misread.
"""

from __future__ import annotations

import re

__all__ = ["loads", "HoconParseError"]


class HoconParseError(ValueError):
    pass


_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
# chars that terminate an unquoted key token
_KEY_END = set(':={}[],#"\n\r\t ')


class _P:
    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.n = len(text)

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


def loads(text: str):
    """Parse a HOCON document into plain dict/list/scalar values."""
    return _P(text).parse_root()
