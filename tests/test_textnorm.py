"""T1 golden corpus — reference transform/transform_test.go:10-31 — plus
python-vs-Catalyst-chain equivalence (the Spark half runs in
tests/test_spark_canon.py against a live session)."""

import pytest

from crawlspark.textnorm import normalize_text

CORPUS = [
    ("hello, world\r\n", "hello, world\n"),
    ("hello, world\r", "hello, world\n"),
    ("hello, world\n", "hello, world\n"),
    ("", ""),
    ("\r\n", "\n"),
    ("hello,\r\nworld", "hello,\nworld"),
    ("hello,\rworld", "hello,\nworld"),
    ("hello,\nworld", "hello,\nworld"),
    ("hello,\n\rworld", "hello,\n\nworld"),
    ("hello,\r\n\r\nworld", "hello,\n\nworld"),
    ("hello,  world", "hello, world"),
    ("hello,    world", "hello, world"),
    ("hello,  \tworld", "hello, world"),
    ("hello,\t\t\tworld", "hello, world"),
    ("\t\thello,\t\t\tworld  ", " hello, world "),
    ("hello,\v\t\vworld", "hello, world"),
    # codepoint-semantics extras (reference is byte-level and would mangle
    # multibyte NBSP — documented divergence, SURVEY.md §2.6)
    ("a b", "a b"),
    ("a \n b", "a \n b"),  # newline breaks a blank run
]


@pytest.mark.parametrize("inp,want", CORPUS)
def test_normalize_text(inp, want):
    assert normalize_text(inp) == want
