"""Filter-language + dialect truth tables (semantics from
cocrawler/cdx_toolkit README.md:147-180 and tests/unit/test_compat.py)."""

import pyarrow as pa
import pytest

from cdx_toolkit_ray import compat
from cdx_toolkit_ray.filters import apply_filters, compile_filters, parse_filter

BATCH = pa.table({
    "status": ["200", "301", "404", "200", "-"],
    "mime": ["text/html", "text/html", "text/plain", "image/png", "warc/revisit"],
    "url": ["http://a.example/x", "http://b.example/y", "http://a.example/z",
            "http://c.example/w", "http://a.example/x"],
})


def _urls(filters, source="cc"):
    out = apply_filters(BATCH, compile_filters(filters, source))
    return out["url"].to_pylist()


def test_substring_match():
    assert _urls(["mime:html"]) == [
        "http://a.example/x", "http://b.example/y"]
    assert _urls(["!mime:html"]) == [
        "http://a.example/z", "http://c.example/w", "http://a.example/x"]


def test_exact_match():
    assert _urls(["=status:200"]) == ["http://a.example/x", "http://c.example/w"]
    assert _urls(["!=status:200"]) == [
        "http://b.example/y", "http://a.example/z", "http://a.example/x"]


def test_regex_match():
    # full-match semantics: '3.' must match the WHOLE value
    assert _urls(["~status:3.."]) == ["http://b.example/y"]
    assert _urls(["~status:3"]) == []
    assert _urls(["!~status:[23].."]) == [
        "http://a.example/z", "http://a.example/x"]


def test_multiple_filters_and():
    assert _urls(["=status:200", "mime:html"]) == ["http://a.example/x"]
    assert _urls(["!=status:200", "!=status:404"]) == [
        "http://b.example/y", "http://a.example/x"]


def test_ia_dialect():
    # ia: regex full-match only, with renamed fields
    assert _urls(["statuscode:200"], source="ia") == [
        "http://a.example/x", "http://c.example/w"]
    assert _urls(["!statuscode:200"], source="ia") == [
        "http://b.example/y", "http://a.example/z", "http://a.example/x"]
    for bad in ("=status:200", "!=status:200", "~status:2..", "!~status:2.."):
        with pytest.raises(ValueError):
            compile_filters([bad], source="ia")


def test_missing_field():
    got = apply_filters(BATCH, compile_filters(["languages:eng"]))
    assert got.num_rows == 0
    got = apply_filters(BATCH, compile_filters(["!languages:eng"]))
    assert got.num_rows == BATCH.num_rows


def test_munge_filter_renames():
    assert compat.munge_filter(["statuscode:200"], "cc") == ["status:200"]
    assert compat.munge_filter(["original:foo"], "cc") == ["url:foo"]
    assert compat.munge_filter(["mimetype:x"], "cc") == ["mime:x"]
    assert compat.munge_filter(["status:200"], "ia") == ["statuscode:200"]
    assert compat.munge_filter(["url:foo"], "ia") == ["original:foo"]
    assert compat.munge_filter(["mime:x"], "ia") == ["mimetype:x"]
    # untouched when already in target dialect
    assert compat.munge_filter(["status:200"], "cc") == ["status:200"]


def test_munge_fields():
    fields = ["urlkey", "timestamp", "original", "mimetype", "statuscode"]
    rows = [["org,x)/", "20200101000000", "http://x.org/", "text/html", "200"]]
    got = compat.munge_fields(fields, rows)
    assert got == [{"urlkey": "org,x)/", "timestamp": "20200101000000",
                    "url": "http://x.org/", "mime": "text/html",
                    "status": "200"}]


def test_parse_filter_shapes():
    f = parse_filter("!~status:3..")
    assert (f.field, f.op, f.invert) == ("status", "regex", True)
    f = parse_filter("mime:html")
    assert (f.field, f.op, f.invert) == ("mime", "contains", False)
    with pytest.raises(ValueError):
        parse_filter("nocolon")
