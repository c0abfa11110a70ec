"""Vendored lenient-JSON parser: JSON5 and HJSON (reference S5/S6).

The reference delegates these formats entirely to the optional ``json5`` /
``hjson`` packages (/root/reference/src/transmog/iterators.py:266-319) and
raises when they are missing. This module removes the hard dependency: a
from-scratch recursive-descent parser over the published format specs
(json5.org, hjson.github.io) — ``sources.readers`` prefers the real
packages when importable and falls back here, so S5/S6 parse everywhere.

Supported supersets of JSON:

JSON5 (``mode='json5'``):
* ``//`` line and ``/* */`` block comments
* trailing commas in objects and arrays
* unquoted ECMAScript-identifier keys (``$``/``_``/alnum)
* single-quoted strings; ``\\`` line continuations; ``\\x`` escapes
* hex integers (``0x1F``), leading/trailing decimal points (``.5``/``5.``),
  explicit ``+``, ``Infinity``/``NaN``

HJSON (``mode='hjson'``): all of the above plus
* ``#`` line comments
* commas optional (newline-separated members); braceless root objects
* quoteless keys (anything but whitespace and ``{}[],:``)
* quoteless string values (to end of line); a value that fully parses as a
  number / ``true`` / ``false`` / ``null`` before a terminator stays typed
* ``'''``-delimited multiline strings (common leading indent stripped)

These are small-config-file formats, not 100 TB inputs — parsing is
driver-side by design, mirroring the reference's iterator semantics.
"""

from __future__ import annotations

import re

__all__ = ["loads", "LenientJSONError"]


class LenientJSONError(ValueError):
    """Malformed JSON5/HJSON input."""


_IDENT = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_NUMBER = re.compile(
    r"[+-]?(?:0[xX][0-9a-fA-F]+|Infinity|NaN|"
    r"(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
)
_HJSON_KEY = re.compile(r"[^\s{}\[\],:]+")
_ESCAPES = {
    '"': '"', "'": "'", "\\": "\\", "/": "/", "b": "\b",
    "f": "\f", "n": "\n", "r": "\r", "t": "\t", "v": "\v", "0": "\0",
}


def loads(text: str, mode: str = "json5"):
    """Parse lenient-JSON ``text``; ``mode`` is ``'json5'`` or ``'hjson'``."""
    if mode not in ("json5", "hjson"):
        raise ValueError(f"unknown lenient-JSON mode {mode!r}")
    p = _Parser(text, hjson=(mode == "hjson"))
    return p.parse_document()


class _Parser:
    def __init__(self, text: str, *, hjson: bool) -> None:
        self.s = text
        self.n = len(text)
        self.i = 0
        self.hjson = hjson

    # -- low-level ---------------------------------------------------------

    def error(self, msg: str) -> LenientJSONError:
        line = self.s.count("\n", 0, self.i) + 1
        col = self.i - (self.s.rfind("\n", 0, self.i) + 1) + 1
        return LenientJSONError(f"{msg} at line {line} col {col}")

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def skip_ws(self, *, stop_at_newline: bool = False) -> None:
        """Advance past whitespace and comments."""
        while self.i < self.n:
            c = self.s[self.i]
            if c == "\n" and stop_at_newline:
                return
            if c.isspace():
                self.i += 1
            elif c == "#" and self.hjson:
                self._skip_line()
            elif c == "/" and self.s[self.i + 1 : self.i + 2] == "/":
                self._skip_line()
            elif c == "/" and self.s[self.i + 1 : self.i + 2] == "*":
                end = self.s.find("*/", self.i + 2)
                if end < 0:
                    raise self.error("unterminated block comment")
                self.i = end + 2
            else:
                return

    def _skip_line(self) -> None:
        end = self.s.find("\n", self.i)
        self.i = self.n if end < 0 else end  # leave the newline for skip_ws

    # -- document ----------------------------------------------------------

    def parse_document(self):
        self.skip_ws()
        if self.i >= self.n:
            raise self.error("empty document")
        if self.hjson and self.peek() not in "{[":
            # braceless root object iff the first token looks like key:value
            mark = self.i
            if self._looks_like_member():
                val = self.parse_members(close="")
                self.skip_ws()
                if self.i < self.n:
                    raise self.error("trailing content")
                return val
            self.i = mark
        val = self.parse_value()
        self.skip_ws()
        if self.i < self.n:
            raise self.error("trailing content")
        return val

    def _looks_like_member(self) -> bool:
        mark = self.i
        try:
            self.parse_key()
            self.skip_ws(stop_at_newline=True)
            return self.peek() == ":"
        except LenientJSONError:
            return False
        finally:
            self.i = mark

    # -- values ------------------------------------------------------------

    def parse_value(self):
        self.skip_ws()
        c = self.peek()
        if c == "{":
            self.i += 1
            return self.parse_members(close="}")
        if c == "[":
            return self.parse_array()
        if c in "\"'":
            if self.hjson and self.s[self.i : self.i + 3] == "'''":
                return self.parse_multiline()
            return self.parse_quoted()
        m = _NUMBER.match(self.s, self.i)
        if m and not (self.hjson and not self._typed_ok(m.end())):
            self.i = m.end()
            return _to_number(m.group(0))
        for kw, val in (("true", True), ("false", False), ("null", None)):
            if self.s.startswith(kw, self.i) and (
                not self.hjson or self._typed_ok(self.i + len(kw))
            ):
                self.i += len(kw)
                return val
        if self.hjson:
            return self.parse_quoteless()
        raise self.error(f"unexpected character {c!r}")

    def _typed_ok(self, end: int) -> bool:
        """HJSON rule: a number/keyword stays typed only if followed by a
        terminator (else the whole line is a quoteless string)."""
        j = end
        while j < self.n and self.s[j] in " \t":
            j += 1
        if j >= self.n:
            return True
        c = self.s[j]
        return (
            c in ",\n]}"
            or c == "#"
            or self.s[j : j + 2] in ("//", "/*")
        )

    def parse_array(self):
        self.i += 1  # past [
        out = []
        while True:
            self.skip_ws()
            if self.i >= self.n:
                raise self.error("unterminated array")
            if self.peek() == "]":
                self.i += 1
                return out
            out.append(self.parse_value())
            self.skip_ws(stop_at_newline=self.hjson)
            if self.peek() == ",":
                self.i += 1
            elif self.hjson and self.peek() == "\n":
                self.i += 1  # newline separates members
            else:
                self.skip_ws()
                if self.peek() != "]":
                    raise self.error("expected ',' or ']' in array")

    def parse_members(self, *, close: str):
        """Object body; ``close=''`` parses an HJSON braceless root."""
        out: dict = {}
        while True:
            self.skip_ws()
            if self.i >= self.n:
                if close:
                    raise self.error("unterminated object")
                return out
            if close and self.peek() == close:
                self.i += 1
                return out
            key = self.parse_key()
            self.skip_ws(stop_at_newline=True)
            if self.peek() != ":":
                raise self.error("expected ':' after object key")
            self.i += 1
            out[key] = self.parse_value()  # later duplicate keys win
            self.skip_ws(stop_at_newline=self.hjson)
            if self.peek() == ",":
                self.i += 1
            elif self.hjson and self.peek() == "\n":
                self.i += 1
            else:
                self.skip_ws()
                if close and self.peek() != close:
                    raise self.error("expected ',' or close brace in object")

    def parse_key(self) -> str:
        self.skip_ws()
        c = self.peek()
        if c in "\"'":
            return self.parse_quoted()
        pat = _HJSON_KEY if self.hjson else _IDENT
        m = pat.match(self.s, self.i)
        if not m:
            raise self.error("invalid object key")
        self.i = m.end()
        return m.group(0)

    # -- strings -----------------------------------------------------------

    def parse_quoted(self) -> str:
        quote = self.s[self.i]
        self.i += 1
        buf: list[str] = []
        while True:
            if self.i >= self.n:
                raise self.error("unterminated string")
            c = self.s[self.i]
            if c == quote:
                self.i += 1
                return "".join(buf)
            if c == "\n":
                raise self.error("unescaped newline in string")
            if c != "\\":
                buf.append(c)
                self.i += 1
                continue
            self.i += 1
            e = self.s[self.i : self.i + 1]
            if e == "\n":  # JSON5 line continuation
                self.i += 1
            elif e == "u":
                cp = self._hex_escape(4)
                # UTF-16 surrogate pair: \uD800-\uDBFF followed by
                # \uDC00-\uDFFF combine into one astral codepoint, matching
                # json/json5/hjson library behavior.
                if 0xD800 <= cp <= 0xDBFF and self.s[self.i : self.i + 2] == "\\u":
                    save = self.i
                    self.i += 1  # past the backslash; _hex_escape reads from 'u'
                    lo = self._hex_escape(4)
                    if 0xDC00 <= lo <= 0xDFFF:
                        cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                    else:
                        self.i = save  # not a low surrogate: leave unpaired
                buf.append(chr(cp))
            elif e == "x":
                buf.append(chr(self._hex_escape(2)))
            elif e in _ESCAPES:
                buf.append(_ESCAPES[e])
                self.i += 1
            else:
                buf.append(e)  # JSON5: \X -> X for other chars
                self.i += 1

    def _hex_escape(self, width: int) -> int:
        """Read ``width`` hex digits after a ``\\u``/``\\x`` escape.

        Raises :class:`LenientJSONError` with line/col context on
        truncated or non-hex escapes instead of a bare ``ValueError``.
        """
        digits = self.s[self.i + 1 : self.i + 1 + width]
        if len(digits) < width:
            raise self.error("truncated \\u/\\x escape")
        try:
            cp = int(digits, 16)
        except ValueError:
            raise self.error(f"invalid hex escape {digits!r}") from None
        self.i += 1 + width
        return cp

    def parse_multiline(self) -> str:
        """HJSON ``'''`` string: common leading indent stripped."""
        self.i += 3
        end = self.s.find("'''", self.i)
        if end < 0:
            raise self.error("unterminated ''' string")
        body = self.s[self.i : end]
        self.i = end + 3
        lines = body.split("\n")
        if lines and not lines[0].strip():
            lines = lines[1:]  # opening ''' on its own line
        if lines and not lines[-1].strip():
            lines = lines[:-1]
        indents = [len(ln) - len(ln.lstrip(" ")) for ln in lines if ln.strip()]
        cut = min(indents) if indents else 0
        return "\n".join(ln[cut:] if ln.strip() else "" for ln in lines)

    def parse_quoteless(self) -> str:
        end = self.s.find("\n", self.i)
        if end < 0:
            end = self.n
        token = self.s[self.i : end].strip()
        if not token:
            raise self.error("empty value")
        self.i = end
        return token


def _to_number(tok: str):
    sign = 1
    if tok[0] in "+-":
        sign = -1 if tok[0] == "-" else 1
        tok = tok[1:]
    if tok == "Infinity":
        return sign * float("inf")
    if tok == "NaN":
        return float("nan")
    if tok[:2] in ("0x", "0X"):
        return sign * int(tok, 16)
    if any(c in tok for c in ".eE"):
        return sign * float(tok)
    return sign * int(tok)
