import pyarrow as pa

from blockchainspider_ray.functions.warc import (
    build_warc_record,
    iter_warc_records,
    parse_http_response,
    parse_warc_batch,
)


def _records(data: bytes):
    return list(iter_warc_records(data))


def test_roundtrip_single_record():
    rec = build_warc_record("http://a.example/x", "2026-01-01T00:00:05Z", b"<html>hi</html>")
    [(headers, block)] = _records(rec)
    assert headers["warc-target-uri"] == "http://a.example/x"
    assert headers["warc-date"] == "2026-01-01T00:00:05Z"
    status, http_headers, body = parse_http_response(block)
    assert status == 200
    assert http_headers["content-type"] == "text/html"
    assert body == b"<html>hi</html>"


def test_framing_is_length_prefixed_not_magic_scan():
    """A payload legally containing the record magic must not split the
    record — framing follows Content-Length, never scans the body."""
    evil = b"<html>WARC/1.0\r\nWARC-Type: response\r\n\r\nfake</html>"
    data = build_warc_record("http://a/1", "2026-01-01T00:00:00Z", evil) + build_warc_record(
        "http://a/2", "2026-01-01T00:00:01Z", b"<html>two</html>"
    )
    recs = _records(data)
    assert [h["warc-target-uri"] for h, _ in recs] == ["http://a/1", "http://a/2"]
    assert parse_http_response(recs[0][1])[2] == evil


def test_truncated_trailing_record_is_dropped():
    full = build_warc_record("http://a/1", "2026-01-01T00:00:00Z", b"<html>one</html>")
    partial = build_warc_record("http://a/2", "2026-01-01T00:00:01Z", b"<html>two</html>")
    data = full + partial[: len(partial) // 2]
    recs = _records(data)
    assert [h["warc-target-uri"] for h, _ in recs] == ["http://a/1"]


def test_batch_parse_skips_non_response_records_and_extracts_title():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://a/1\r\n"
        b"Content-Length: 4\r\n\r\nGET "
    )
    resp = build_warc_record(
        "http://a/1", "2026-01-01T00:00:00Z", b"<html><title>T1</title>x</html>"
    )
    batch = pa.table({"bytes": pa.array([req + resp], pa.binary()), "path": ["f.warc"]})
    out = parse_warc_batch(batch)
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["url"] == "http://a/1"
    assert row["title"] == "T1"
    assert row["status"] == 200
    assert row["content_length"] == len(b"<html><title>T1</title>x</html>")


def test_fixture_writer_shards_by_doc_id(tmp_path):
    from blockchainspider_ray.fixtures import write_warc_store

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "text": pa.array([f"body {i}" for i in range(20)], pa.string()),
        }
    )
    out = write_warc_store(docs, str(tmp_path / "w"), num_files=4)
    import pathlib

    files = sorted(p.name for p in pathlib.Path(out).iterdir())
    assert files == [f"part-{k}.warc" for k in range(4)]
    recs = _records((pathlib.Path(out) / "part-1.warc").read_bytes())
    assert [h["warc-target-uri"] for h, _ in recs] == [
        f"http://site{d % 10}.example/d/{d}" for d in (1, 5, 9, 13, 17)
    ]


def test_warc_sink_roundtrip_and_idempotent_rerun(ray_session, tmp_path):
    """Distributed WarcDatasink: payload octets survive write->read
    byte-for-byte; a rerun overwrites shards instead of appending."""
    import ray.data as rd

    from blockchainspider_ray.functions.warc import parse_warc_batch
    from blockchainspider_ray.stages.warc_sink import write_warc

    payloads = [b"<html><title>T0</title>x</html>", b"WARC/1.0 inside body \r\n\r\n ok"]
    rows = pa.table(
        {
            "url": ["http://a.example/0", "http://b.example/1"],
            "warc_date": ["2026-01-01T00:00:00Z", "2026-01-01T00:00:01Z"],
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = str(tmp_path / "warc_out")
    for _ in range(2):  # second run must not append/duplicate
        write_warc(rd.from_arrow(rows), out)
        got = (
            rd.read_binary_files(out, include_paths=True)
            .map_batches(parse_warc_batch, batch_format="pyarrow")
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert len(got) == 2
        assert got["content_length"].tolist() == [len(p) for p in payloads]
        assert got["title"].tolist()[0] == "T0"
