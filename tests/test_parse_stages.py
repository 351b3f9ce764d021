"""M0 end-to-end: read pages store -> map_batches parse stages -> results."""

import pyarrow as pa
import ray

from blockchainspider_ray.stages.parse import (
    canonicalize_stage,
    extract_entities_stage,
    extract_links_stage,
    extract_text_stage,
)


def _read_store(pages_store):
    return ray.data.read_parquet(pages_store)


def test_extract_text_stage_matches_golden(pages_store, pages_table):
    ds = _read_store(pages_store).map_batches(
        extract_text_stage, batch_format="pyarrow", batch_size=64
    )
    got = {r["url"]: r["text_extracted"] for r in ds.take_all()}
    want = {
        u: t
        for u, t in zip(
            pages_table.column("url").to_pylist(), pages_table.column("text").to_pylist()
        )
    }
    assert got == want
    # html column must not survive the stage
    assert "html" not in ds.schema().names


def test_extract_links_stage(pages_store):
    ds = _read_store(pages_store).map_batches(
        extract_links_stage, batch_format="pyarrow", batch_size=64
    )
    edges = ds.take_all()
    assert len(edges) > 0
    for e in edges:
        assert e["dst_url"].startswith("http://")
        # canonical: no fragments, no default ports, lowercase host
        assert "#" not in e["dst_url"]
        assert ":80/" not in e["dst_url"]
        assert e["dst_host"] == e["dst_url"].split("/")[2].split(":")[0]
        assert e["kind"] in ("a", "script")
    # every page has the relative "next" link resolved absolute
    rel = [e for e in edges if e["dst_url"].endswith("/p/1") and e["src_url"].endswith("/p/0")]
    assert rel


def test_extract_entities_stage(pages_table):
    batch = pa.table(
        {
            "url": ["http://h/x"],
            "text": [" see 0x" + "ab" * 20 + " and tx 0x" + "12" * 32 + " ."],
        }
    )
    out = extract_entities_stage(batch)
    nets = out.column("net").to_pylist()
    assert "ETH-Like" in nets and "ETH-Tx" in nets


def test_canonicalize_stage():
    batch = pa.table({"url": ["HTTP://A.Example:80/x#f", "mailto:z@q"]})
    out = canonicalize_stage(batch)
    assert out.column("canonical_url").to_pylist() == ["http://a.example/x", None]
    assert out.column("host").to_pylist() == ["a.example", ""]
    assert out.column("url_hash").type == pa.uint64()
