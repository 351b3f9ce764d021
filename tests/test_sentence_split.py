"""sentence_split on a PUNCTUATED corpus — the synthetic documents table has
no sentence boundaries (one sentence per doc, covered by the oracle test),
so the multi-sentence path is pinned here against the same DuckDB mirror on
a constructed table."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from blockchainspider_ray.pipelines.queries import ORACLE_SQL, SQL_QUERIES


def test_sentence_split_multi_sentence(tmp_path, ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "First one. Second here! Third?  And a trailing tail",
                    "No boundaries at all just words",
                    "Ends with punct. ",
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([0, 0, 0], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")

    got = SQL_QUERIES["sentence_split"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(ORACLE_SQL["sentence_split"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    # doc 1 really splits into 4 ordered sentences
    d1 = got[got["doc_id"] == 1]
    assert list(d1["sent_idx"]) == [1, 2, 3, 4]
    assert list(d1["sentence"])[:3] == ["First one", "Second here", "Third"]
    # trailing separator yields a final empty sentence, same as the SQL
    d3 = got[got["doc_id"] == 3]
    assert list(d3["sentence"]) == ["Ends with punct", ""]
