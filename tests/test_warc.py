"""WARC container ingestion — grammar, member walk, corrupt isolation."""

import zlib

import pyspark.sql.functions as F
import pytest

from rs_graphdb_spark.sources.warc import (
    _gzip_member,
    _parse_record,
    _walk_members,
    _warc_record,
    documents_as_warc,
    encode_warc_file,
    fixture_page,
    fixture_url,
    read_warc,
    read_warc_files,
    warc_responses,
    warc_to_wet,
)


def _docs(spark, n=8):
    return spark.createDataFrame(
        [(i, f"body text {i} scan join") for i in range(n)],
        "doc_id long, text string")


# ------------------------------------------------------------- grammar


def test_parse_record_roundtrip():
    rec = _warc_record(
        "response",
        [("WARC-Target-URI", "https://x.test/a"),
         ("WARC-Date", "2024-01-01T00:00:00Z"),
         ("WARC-Record-ID", "<urn:uuid:r1>")],
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>",
    )
    out = _parse_record(rec)
    assert out["rec_type"] == "response"
    assert out["url"] == "https://x.test/a"
    assert out["http_status"] == 200
    assert out["content_type"] == "text/html"
    assert out["body"] == b"<p>hi</p>"


def test_parse_record_headers_case_insensitive():
    raw = (b"WARC/1.0\r\nwarc-type: metadata\r\ncontent-length: 3\r\n"
           b"\r\nabc\r\n\r\n")
    out = _parse_record(raw)
    assert out["rec_type"] == "metadata" and out["body"] == b"abc"


@pytest.mark.parametrize("raw, msg", [
    (b"HTTP/1.1 200 OK\r\n\r\n", "not a WARC record"),
    (b"WARC/1.0\r\nWARC-Type: response", "unterminated WARC header"),
    (b"WARC/1.0\r\nbad header line\r\n\r\nx", "malformed WARC header"),
    (b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort", "bad Content-Length"),
])
def test_parse_record_rejects_bad_grammar(raw, msg):
    with pytest.raises(ValueError, match=msg):
        _parse_record(raw)


def test_parse_response_malformed_http_status():
    rec = _warc_record("response", [], b"HTTP/1.1 nope\r\n\r\nx")
    with pytest.raises(ValueError, match="malformed HTTP status"):
        _parse_record(rec)


# --------------------------------------------------------- member walk


def _members(*recs: bytes) -> bytes:
    return b"".join(_gzip_member(r) for r in recs)


def _rec(i: int) -> bytes:
    return _warc_record(
        "resource", [("WARC-Record-ID", f"<urn:uuid:m{i}>")],
        f"payload {i}".encode())


def test_walk_concatenated_members():
    rows = list(_walk_members(_members(_rec(0), _rec(1), _rec(2))))
    assert [r["ok"] for r in rows] == [True, True, True]
    assert [r["record_id"] for r in rows] == [
        "<urn:uuid:m0>", "<urn:uuid:m1>", "<urn:uuid:m2>"]


def test_walk_resyncs_after_garbage_member():
    good0, good2 = _gzip_member(_rec(0)), _gzip_member(_rec(2))
    garbage = b"X" * 40
    rows = list(_walk_members(good0 + garbage + good2))
    assert [r["ok"] for r in rows] == [True, False, True]
    assert rows[1]["error"] and "gzip" in rows[1]["error"]
    assert rows[2]["record_id"] == "<urn:uuid:m2>"


def test_walk_isolates_corrupted_gzip_body():
    # valid magic, corrupted deflate body: decompress raises mid-member,
    # the walk rescans for the NEXT member's magic
    m0, m2 = _gzip_member(_rec(0)), _gzip_member(_rec(2))
    bad = bytearray(_gzip_member(_rec(1)))
    bad[12:20] = b"\x00" * 8
    rows = list(_walk_members(m0 + bytes(bad) + m2))
    oks = [r["ok"] for r in rows]
    # the corrupted member yields >=1 corrupt row; both neighbors decode
    assert oks[0] is True and oks[-1] is True and False in oks
    assert rows[-1]["record_id"] == "<urn:uuid:m2>"


def test_walk_truncated_final_member():
    m0, m1 = _gzip_member(_rec(0)), _gzip_member(_rec(1))
    rows = list(_walk_members(m0 + m1[: len(m1) - 6]))
    assert [r["ok"] for r in rows] == [True, False]
    assert "truncated" in rows[1]["error"] or "Error" in rows[1]["error"]


def test_walk_valid_gzip_but_not_warc():
    rows = list(_walk_members(
        _gzip_member(b"just plain text") + _gzip_member(_rec(1))))
    assert [r["ok"] for r in rows] == [False, True]
    assert "not a WARC record" in rows[0]["error"]


def test_walk_empty_payload():
    assert list(_walk_members(b"")) == []


# ----------------------------------------------------- fixture encoder


def test_encode_warc_file_member_count_and_corruption():
    docs = [(i, f"t{i}") for i in range(4)]
    payload, n = encode_warc_file(docs, corrupt_ids={2})
    assert n == 1 + 2 * 4  # warcinfo + (request+response) per doc
    rows = list(_walk_members(payload))
    assert len(rows) == n
    types = [r["rec_type"] for r in rows if r["ok"]]
    assert types.count("response") == 3 and types.count("request") == 4
    bad = [r for r in rows if not r["ok"]]
    assert len(bad) == 1  # exactly one corrupt row, resync exact


# ------------------------------------------------------ spark surface


def test_read_warc_types_and_isolation(spark):
    docs = _docs(spark, 10)
    wf = documents_as_warc(docs, docs_per_file=4, corrupt_every=5)
    recs = read_warc(wf)
    counts = {(r["rec_type"], r["ok"]): r["cnt"]
              for r in recs.groupBy("rec_type", "ok")
              .agg(F.count("*").alias("cnt")).collect()}
    assert counts[("warcinfo", True)] == 3   # files 0..2
    assert counts[("request", True)] == 10
    assert counts[("response", True)] == 8   # docs 0,5 corrupted
    assert counts[(None, False)] == 2


def test_warc_responses_and_wet_composition(spark):
    docs = _docs(spark, 6)
    wf = documents_as_warc(docs, docs_per_file=4)
    resp = warc_responses(wf)
    rows = {r["url"]: r for r in resp.collect()}
    assert set(rows) == {fixture_url(i) for i in range(6)}
    assert all(r["http_status"] == 200 for r in rows.values())
    assert all(r["content_type"] == "text/html; charset=utf-8"
               for r in rows.values())
    wet = {r["url"]: r["wet_text"] for r in warc_to_wet(wf).collect()}
    # html_to_text of the fixture page: title+h1 text, body text, list
    # items with decoded entities, no tags/comments
    t0 = wet[fixture_url(0)]
    assert "body text 0 scan join" in t0
    assert "a & b" in t0 and "<0>" in t0
    assert "<p>" not in t0 and "crawl" not in t0  # comment stripped
    assert fixture_page(0, "x").startswith("<html>")


def test_warc_records_reuse_param(spark):
    docs = _docs(spark, 4)
    wf = documents_as_warc(docs, docs_per_file=4)
    recs = read_warc(wf).localCheckpoint()
    a = warc_responses(records=recs).count()
    b = warc_to_wet(records=recs).count()
    assert a == b == 4


def test_read_warc_files_binary_source(spark, tmp_path):
    payload, _ = encode_warc_file([(1, "alpha"), (2, "beta")])
    p = tmp_path / "part-000.warc.gz"
    p.write_bytes(payload)
    files = read_warc_files(spark, str(tmp_path))
    recs = read_warc(files)
    assert recs.filter("rec_type = 'response'").count() == 2
    (row,) = recs.select("warc_id").limit(1).collect()
    assert row["warc_id"].endswith("part-000.warc.gz")


def test_warc_zero_shuffle_plan(spark):
    # the parse+extract pipeline is a scan stage: no Exchange anywhere
    docs = _docs(spark, 4)
    wf = documents_as_warc(docs, docs_per_file=4).localCheckpoint()
    plan = warc_to_wet(wf)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------- streaming reader (r9)


def _write_fixture_files(tmp_path, n_files=3, docs_per=4, corrupt=True):
    paths = []
    base = 0
    for fi in range(n_files):
        docs = [(base + i, f"stream body {base + i} text") for i in
                range(docs_per)]
        corrupt_ids = {base + 1} if corrupt and fi == 1 else set()
        payload, _ = encode_warc_file(docs, corrupt_ids)
        p = tmp_path / f"part-{fi:03d}.warc.gz"
        p.write_bytes(payload)
        paths.append(str(p))
        base += docs_per
    return paths


def _rows_key(df):
    return {
        (r["warc_id"].rsplit("/", 1)[-1], r["rec_idx"]):
        (r["rec_type"], r["url"], r["warc_date"], r["record_id"],
         r["http_status"], r["content_type"],
         bytes(r["body"]) if r["body"] is not None else None,
         r["ok"], r["error"])
        for r in df.collect()
    }


def test_stream_reader_equals_binaryfile_path(spark, tmp_path):
    """read_warc_stream ≡ read_warc(read_warc_files(...)) exactly —
    same records, same corrupt isolation, same resync — without ever
    holding a whole file (r8 VERDICT item #5)."""
    from rs_graphdb_spark.sources.warc import read_warc_stream
    _write_fixture_files(tmp_path)
    want = _rows_key(read_warc(read_warc_files(spark, str(tmp_path))))
    got = _rows_key(read_warc_stream(spark, str(tmp_path)))
    assert want and got == want


def test_stream_reader_tiny_chunks_and_batches(spark, tmp_path):
    """Members straddling chunk boundaries and resync across refills:
    a 64-byte chunk forces every member through many fills; 2-row
    output batches force the slicing path."""
    from rs_graphdb_spark.sources.warc import read_warc_stream
    _write_fixture_files(tmp_path)
    want = _rows_key(read_warc(read_warc_files(spark, str(tmp_path))))
    got = _rows_key(read_warc_stream(spark, str(tmp_path),
                                     chunk_size=64, rows_per_batch=2))
    assert got == want


def test_stream_walk_bounded_memory():
    """The binaryFile path holds the WHOLE file; the streaming walk's
    peak buffer must stay O(chunk + record) — far below file size for
    a many-member file (the >2 GB-file story in miniature)."""
    import io

    from rs_graphdb_spark.sources.warc import _walk_members_stream
    docs = [(i, "x" * 2000) for i in range(400)]
    payload, n = encode_warc_file(docs)
    assert len(payload) > 200_000
    stats = {}
    rows = list(_walk_members_stream(
        io.BytesIO(payload).read, chunk_size=8192, stats=stats))
    assert len(rows) == n and all(r["ok"] for r in rows)
    assert stats["peak_buffer"] < len(payload) / 10
    assert stats["peak_buffer"] <= 8192 * 3


def test_stream_walk_truncated_and_garbage():
    import io

    from rs_graphdb_spark.sources.warc import _walk_members_stream
    good, _ = encode_warc_file([(1, "alpha")])
    garbage = b"Y" * 57
    tail, _ = encode_warc_file([(2, "beta")])
    payload = good + garbage + tail[:-9]  # truncate the final member
    rows = list(_walk_members_stream(io.BytesIO(payload).read,
                                     chunk_size=32))
    errs = [r for r in rows if not r["ok"]]
    oks = [r for r in rows if r["ok"]]
    assert any("not a gzip member" in r["error"] for r in errs)
    assert any("truncated" in r["error"] for r in errs)
    # the good file's members all survive (warcinfo + request + resp)
    assert len(oks) >= 3


def test_unicode_fixture_variant(spark):
    """r8 VERDICT item #8: CJK/Cyrillic URL bytes survive the header
    grammar and the charset-variant content type parses — value-checked
    end to end by q36:warc_uurl; this pins the writer/reader pair."""
    from rs_graphdb_spark.sources.warc import fixture_url_u
    docs = _docs(spark, 6)
    wf = documents_as_warc(docs, docs_per_file=6, unicode_every=2)
    resp = warc_responses(records=read_warc(wf)).collect()
    by_url = {r["url"]: r for r in resp}
    assert fixture_url_u(0) in by_url
    assert fixture_url_u(2) in by_url
    assert "документы/東京-2" in fixture_url_u(2)
    assert by_url[fixture_url_u(2)]["content_type"] == \
        "text/html;charset=UTF-8"
    # odd ids keep the ascii template + spaced lowercase charset
    from rs_graphdb_spark.sources.warc import fixture_url
    assert by_url[fixture_url(1)]["content_type"] == \
        "text/html; charset=utf-8"
    assert all(r["http_status"] == 200 for r in resp)


def test_stream_reader_listing_prunes_content(spark, tmp_path):
    """The streaming reader's claim: binaryFile does the LISTING only —
    the content column must be pruned out of the scan (ReadSchema
    carries just the path), or every file would be read twice."""
    from rs_graphdb_spark.sources.warc import read_warc_stream
    _write_fixture_files(tmp_path, n_files=1, corrupt=False)
    df = read_warc_stream(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "content" not in m.group(1), m
    assert "path" in m.group(1)
