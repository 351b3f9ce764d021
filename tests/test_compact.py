"""Page-store compaction: small-file coalescing, sort invariant, keep-latest
recrawl dedup, resumability, and PageStore compatibility."""

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blockchainspider_ray.fixtures import ensure_pages_store
from blockchainspider_ray.stages.compact import compact_store
from blockchainspider_ray.stages.fetch import PageStore


@pytest.fixture(scope="module")
def fragmented_store(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("compact")
    src = str(base / "store")
    ensure_pages_store(src, n_pages=600, num_partitions=4)
    # simulate incremental crawl rounds: append a newer-warc_ts duplicate
    # of some urls plus extra small files into partition 0
    p0 = Path(src) / "part=0"
    t = pq.read_table(p0 / "pages.parquet")
    dup = t.slice(0, 5)
    bumped = dup.set_column(
        dup.column_names.index("warc_ts"),
        "warc_ts",
        pa.compute.add(dup.column("warc_ts"), pa.scalar(1_000, pa.duration("ms"))),
    )
    pq.write_table(bumped, p0 / "round2.parquet")
    pq.write_table(t.slice(5, 3), p0 / "round3.parquet")
    return src, str(base / "out"), t


def test_compact_coalesces_and_sorts(fragmented_store):
    src, dst, t0 = fragmented_store
    stats = compact_store(src, dst + "_all", keep_latest=False)
    assert stats["partitions"] == 4 and stats["skipped"] == 0
    assert stats["files_in"] >= 6  # 4 originals + 2 appended
    assert stats["rows_out"] == stats["rows_in"]
    # one file per partition, sorted by url, manifest carried over
    for k in range(4):
        files = list((Path(dst + "_all") / f"part={k}").glob("*.parquet"))
        assert len(files) == 1
        urls = pq.read_table(files[0]).column("url").to_pylist()
        assert urls == sorted(urls)
    assert (Path(dst + "_all") / "_MANIFEST").read_text() == (
        Path(src) / "_MANIFEST"
    ).read_text()


def test_compact_keep_latest_dedups_recrawls(fragmented_store):
    src, dst, t0 = fragmented_store
    stats = compact_store(src, dst + "_latest", keep_latest=True)
    # 5 urls were re-crawled with newer warc_ts: exactly those dedup away,
    # and the surviving version is the NEWER one
    assert stats["rows_in"] - stats["rows_out"] == 8  # 5 dups + 3 re-appends
    out = pq.read_table(Path(dst + "_latest") / "part=0" / "pages.parquet")
    by_url = dict(zip(out.column("url").to_pylist(), out.column("warc_ts").to_pylist()))
    old = dict(zip(t0.column("url").to_pylist(), t0.column("warc_ts").to_pylist()))
    bumped_urls = t0.column("url").to_pylist()[:5]
    for u in bumped_urls:
        assert by_url[u] > old[u]


def test_compact_is_resumable_and_store_compatible(fragmented_store, ray_session):
    src, dst, _ = fragmented_store
    out = dst + "_resume"
    first = compact_store(src, out, partitions=[0, 1])
    assert first["partitions"] == 2 and first["skipped"] == 0
    again = compact_store(src, out)
    assert again["skipped"] == 2  # parts 0,1 detected as done
    # the compacted store serves PageStore lookups identically
    ps = PageStore(out)
    assert ps.num_partitions == 4
    some = pq.read_table(Path(out) / "part=2" / "pages.parquet").column("url").to_pylist()[:8]
    got = ps.lookup_table(some)
    assert sorted(got.column("url").to_pylist()) == sorted(some)
