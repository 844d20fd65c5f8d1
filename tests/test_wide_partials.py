"""Wide partial-merge path ≡ sliced single-task reduce.

RunConfig.wide_partials routes the Pass A partial stream through the
per-block combiner + distributed groupby/map_groups merge (the
10^12-row path) instead of the sliced reduce; verdicts and violations
must be equivalent either way."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_parquet(tmp_path_factory):
    rng = np.random.default_rng(8)
    n = 4000
    df = pd.DataFrame(
        {"doc_id": np.arange(n),
         "text": [("x" * int(k)) if k else None
                  for k in rng.integers(0, 200, n)],
         "n_chars": rng.integers(0, 200, n).astype("int64")}
    )
    # plant nulls and a duplicate key
    df.loc[5, "text"] = None
    df.loc[100, "doc_id"] = 99
    p = str(tmp_path_factory.mktemp("widep") / "docs.parquet")
    df.to_parquet(p)
    return p


def _run(path, wide: bool):
    from raqc_ray.config import (CardinalityCheck, NullityCheck,
                                 QuantileCheck, RunConfig, StatsCheck,
                                 UniquenessCheck)
    from raqc_ray.pipelines.validate import validate_epoch

    cfg = RunConfig(
        checks=[NullityCheck(columns=("text",)),
                StatsCheck(columns=("n_chars",)),
                CardinalityCheck(column="doc_id"),
                QuantileCheck(column="n_chars"),
                UniquenessCheck(column="doc_id")],
        epoch="w",
        partition_from=("expr",
                        lambda b: b["doc_id"].to_numpy(zero_copy_only=False) % 4),
        wide_partials=wide,
    )
    r = validate_epoch(path, cfg)
    v = r.violations.to_pandas().sort_values(
        ["check", "image_id", "partition_id"]).reset_index(drop=True)
    verd = r.verdicts.to_pandas().sort_values(
        ["check", "partition_id"]).reset_index(drop=True)
    return v, verd


def test_wide_equals_narrow(ray_session, docs_parquet):
    v1, d1 = _run(docs_parquet, wide=False)
    v2, d2 = _run(docs_parquet, wide=True)
    pd.testing.assert_frame_equal(v1, v2)
    # verdict pass/fail, counts exact; stats_json floats can differ in
    # the last ulp from float-sum order — compare the discrete columns
    cols = ["partition_id", "epoch", "check", "pass", "n_rows",
            "n_violations"]
    pd.testing.assert_frame_equal(d1[cols], d2[cols])
    assert (d1["check"] == d2["check"]).all()
    assert len(d1) == len(d2) and len(v1) > 0


def test_size_trigger_selects_wide(ray_session, docs_parquet, monkeypatch):
    """Default config must auto-route through the wide merge when the
    materialized partial stream exceeds wide_partials_threshold
    (VERDICT r2 Next #4) — and produce the same verdicts."""
    from raqc_ray.config import (CardinalityCheck, NullityCheck,
                                 QuantileCheck, RunConfig, StatsCheck,
                                 UniquenessCheck)
    from raqc_ray.pipelines import validate as V

    calls = {"wide": 0}
    real = V._wide_partials_merge

    def spy(passa, cfg):
        calls["wide"] += 1
        return real(passa, cfg)

    monkeypatch.setattr(V, "_wide_partials_merge", spy)
    monkeypatch.delenv("RAQC_WIDE_PARTIALS", raising=False)
    cfg = RunConfig(
        checks=[NullityCheck(columns=("text",)),
                StatsCheck(columns=("n_chars",)),
                CardinalityCheck(column="doc_id"),
                QuantileCheck(column="n_chars"),
                UniquenessCheck(column="doc_id")],
        epoch="w",
        partition_from=("expr",
                        lambda b: b["doc_id"].to_numpy(zero_copy_only=False) % 4),
        wide_partials=False,
        wide_partials_threshold=1,  # every real stream exceeds this
    )
    r = V.validate_epoch(docs_parquet, cfg)
    assert calls["wide"] == 1
    d = r.verdicts.to_pandas()
    assert len(d) > 0 and (d["epoch"] == "w").all()
