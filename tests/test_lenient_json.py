"""Vendored JSON5/HJSON parser (sources/lenient_json.py, reference S5/S6).

Cases mirror the published format examples (json5.org / hjson.github.io);
the reference itself delegates to the optional json5/hjson packages
(iterators.py:266-319), so its behavior on these inputs is the spec's.
No Spark needed — pure parser tests.
"""

from __future__ import annotations

import math

import pytest

from transmog_spark.sources.lenient_json import LenientJSONError, loads


# -- JSON5 ------------------------------------------------------------------

def test_json5_spec_example():
    text = """{
      // comments
      unquoted: 'and you can quote me on that',
      singleQuotes: 'I can use "double quotes" here',
      lineBreaks: "Look, Mom! \\
No \\\\n's!",
      hexadecimal: 0xdecaf,
      leadingDecimalPoint: .8675309, andTrailing: 8675309.,
      positiveSign: +1,
      trailingComma: 'in objects', andIn: ['arrays',],
      "backwardsCompatible": "with JSON",
    }"""
    d = loads(text, mode="json5")
    assert d["unquoted"] == "and you can quote me on that"
    assert d["singleQuotes"] == 'I can use "double quotes" here'
    assert d["lineBreaks"] == "Look, Mom! No \\n's!"
    assert d["hexadecimal"] == 0xDECAF
    assert d["leadingDecimalPoint"] == 0.8675309
    assert d["andTrailing"] == 8675309.0
    assert d["positiveSign"] == 1
    assert d["andIn"] == ["arrays"]
    assert d["backwardsCompatible"] == "with JSON"


def test_json5_numbers_and_keywords():
    assert loads("[0x1F, -0x0a, Infinity, -Infinity, +.5, 1e3]") == [
        31, -10, float("inf"), float("-inf"), 0.5, 1000.0,
    ]
    assert math.isnan(loads("NaN"))
    assert loads("[true, false, null]") == [True, False, None]


def test_json5_comments_and_nesting():
    d = loads("/* block */ {a: [1, 2, {b: 'c'}], /* mid */ d: {}} // tail")
    assert d == {"a": [1, 2, {"b": "c"}], "d": {}}


def test_json5_escapes():
    assert loads(r"'\x41B\n\q'") == "AB\nq"


def test_json5_duplicate_keys_later_wins():
    # matches the engine's collision semantics (F10) and python-json
    assert loads("{a: 1, a: 2}") == {"a": 2}


def test_json5_strict_json_still_parses():
    assert loads('{"a": [1, 2.5, "x"], "b": null}') == {"a": [1, 2.5, "x"], "b": None}


@pytest.mark.parametrize(
    "bad",
    ["{a: 1", "[1, 2", "{a 1}", "'unterminated", "/* open", "", "{} extra"],
)
def test_json5_errors(bad):
    with pytest.raises(LenientJSONError):
        loads(bad, mode="json5")


# -- HJSON ------------------------------------------------------------------

def test_hjson_quoteless_and_hash_comments():
    d = loads(
        "{\n  # hash comment\n  greet: Hello, world!\n  n: 42\n  f: 1.5\n"
        "  flag: true\n  nothing: null\n}",
        mode="hjson",
    )
    # the comma is part of the quoteless string; typed values stay typed
    assert d["greet"] == "Hello, world!"
    assert d["n"] == 42 and d["f"] == 1.5
    assert d["flag"] is True and d["nothing"] is None


def test_hjson_number_like_string_stays_string():
    # '3 times' does not fully parse as a number before the terminator
    d = loads("{a: 3 times\nb: 5\n}", mode="hjson")
    assert d == {"a": "3 times", "b": 5}


def test_hjson_commas_optional_newline_members():
    d = loads('{\n  one: 1\n  two: 2\n  arr: [\n    x\n    y\n  ]\n}', mode="hjson")
    assert d == {"one": 1, "two": 2, "arr": ["x", "y"]}


def test_hjson_braceless_root():
    d = loads("name: test\nvalue: 7\n", mode="hjson")
    assert d == {"name": "test", "value": 7}


def test_hjson_multiline_string():
    d = loads(
        "{\n  md:\n    '''\n    first line\n      indented\n    last\n    '''\n}",
        mode="hjson",
    )
    assert d["md"] == "first line\n  indented\nlast"


def test_hjson_quoted_keys_and_values():
    d = loads('{"a key": "quoted, value"\nb: c\n}', mode="hjson")
    assert d == {"a key": "quoted, value", "b": "c"}


def test_hjson_quoteless_swallows_brace_on_same_line():
    # spec behavior: a quoteless string runs to end of line, so a closing
    # brace on the same line is part of the string -> unterminated object
    with pytest.raises(LenientJSONError):
        loads("{b: c}", mode="hjson")


def test_hjson_nested_objects():
    d = loads("{outer: {inner: deep value\nn: 1}\nlist: [{x: 1}, {x: 2}]}", mode="hjson")
    assert d == {"outer": {"inner": "deep value", "n": 1},
                 "list": [{"x": 1}, {"x": 2}]}
