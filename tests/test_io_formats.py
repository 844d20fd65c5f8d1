"""Roundtrip gates for the row-format ingest adapters (JSONL / CSV)
in io.read_table — same rows as the parquet path, columns selected
immediately after the read."""

import os

import pandas as pd

from raqc_ray.io import read_table


def _frame():
    return pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta", "gamma", "delta epsilon zeta"],
        "n": [10, 20, 30],
    })


def test_read_table_jsonl_roundtrip(ray_session, tmp_path):
    df = _frame()
    p = os.path.join(tmp_path, "docs.jsonl")
    df.to_json(p, orient="records", lines=True)
    out = (read_table(p, columns=["doc_id", "text"]).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out.columns) == ["doc_id", "text"]
    pd.testing.assert_frame_equal(out, df[["doc_id", "text"]])


def test_read_table_csv_roundtrip(ray_session, tmp_path):
    df = _frame()
    p = os.path.join(tmp_path, "docs.csv")
    df.to_csv(p, index=False)
    out = (read_table(p).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["doc_id", "text", "n"]], df)
