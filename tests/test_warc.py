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


def _py_parse_warc(payload):
    """Independent row-at-a-time reference of the documented text subset."""
    out = []
    for rec in payload.split("WARC/1.0\r\n")[1:]:
        if "\r\n\r\n" not in rec:
            continue
        hdr, _, body = rec.partition("\r\n\r\n")
        if body.endswith("\r\n\r\n"):
            body = body[:-4]
        fields = {}
        for line in hdr.split("\r\n"):
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        cl = fields.get("content-length")
        out.append(
            (
                fields.get("warc-type") or None,
                fields.get("warc-target-uri") or None,
                fields.get("warc-date") or None,
                int(cl) if cl and cl.isdigit() else None,
                body,
            )
        )
    return sorted(out, key=lambda t: tuple(map(str, t)))


def test_parse_warc_seeded_random_vs_reference(spark):
    import random

    from literature_to_facts_spark.datapipe.warc import parse_warc

    rng = random.Random(7)
    types = ["response", "request", "metadata", "  warcinfo "]
    uris = ["http://a.com/x", "https://b.org/y?z=1", ""]
    dates = ["2024-03-15T10:00:00Z", "not-a-date", ""]
    body_bits = ["<html>x</html>", "line1\r\nline2", "", "plain text",
                 "trailing\r\n", "GET / HTTP/1.1"]

    def record(r):
        lines = []
        if r.random() < 0.9:
            lines.append(f"WARC-Type: {r.choice(types)}")
        if r.random() < 0.8:
            lines.append(f"WARC-Target-URI: {r.choice(uris)}")
        if r.random() < 0.7:
            lines.append(f"warc-date: {r.choice(dates)}")
        if r.random() < 0.5:
            lines.append(f"Content-Length: {r.randint(0, 99999)}")
        if r.random() < 0.3:
            lines.append("X-Custom: noise")
        body = r.choice(body_bits)
        return "WARC/1.0\r\n" + "\r\n".join(lines) + "\r\n\r\n" + body + "\r\n\r\n"

    payloads = [
        "".join(record(rng) for _ in range(rng.randint(0, 6)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id bigint, warc string"
    )
    got = {}
    for r in parse_warc(df, carry_cols=("doc_id",)).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["warc_type"], r["target_uri"], r["warc_date"],
             r["content_length"], r["body"])
        )
    for i, p in enumerate(payloads):
        want = _py_parse_warc(p)
        have = sorted(got.get(i, []), key=lambda t: tuple(map(str, t)))
        assert have == want, f"payload {i}: {p!r}"
