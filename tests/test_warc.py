"""WARC container parsing (datapipe/warc.py)."""

import pytest

_W = (
    "preamble junk\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: http://a.com/x\r\n"
    "WARC-Date: 2024-03-15T10:00:00Z\r\n"
    "Content-Length: 18\r\n"
    "\r\n"
    "<html>hello</html>\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "warc-type: request\r\n"
    "warc-target-uri: http://a.com/x\r\n"
    "\r\n"
    "GET /x HTTP/1.1\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: metadata\r\n"
    "\r\n"
)


def test_parse_warc_records_and_fields(spark):
    from literature_to_facts_spark.datapipe.warc import parse_warc

    df = spark.createDataFrame(
        [(1, _W), (2, None), (3, "WARC/1.0\r\nno blank line ever")],
        "doc_id bigint, warc string",
    )
    rows = parse_warc(df, carry_cols=("doc_id",)).collect()
    # doc 2 NULL payload and doc 3's terminator-less fragment contribute 0
    assert all(r["doc_id"] == 1 for r in rows)
    got = {r["warc_type"]: r for r in rows}
    assert set(got) == {"response", "request", "metadata"}
    r = got["response"]
    assert r["target_uri"] == "http://a.com/x"
    assert r["warc_date"] == "2024-03-15T10:00:00Z"
    assert r["warc_ts_us"] == 1710496800000000
    assert r["content_length"] == 18
    assert r["body"] == "<html>hello</html>"
    # lowercase header names match; absent fields are NULL
    q = got["request"]
    assert q["target_uri"] == "http://a.com/x"
    assert q["warc_date"] is None and q["warc_ts_us"] is None
    assert q["content_length"] is None
    assert q["body"] == "GET /x HTTP/1.1"
    # header-only trailing record without terminator: empty body
    assert got["metadata"]["body"] == ""


def test_parse_warc_guards(spark):
    from literature_to_facts_spark.datapipe.warc import parse_warc

    df = spark.createDataFrame(
        [(1, _W, "x")], "doc_id bigint, warc string, body string"
    )
    with pytest.raises(ValueError, match="collide"):
        parse_warc(df)
