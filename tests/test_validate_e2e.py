"""Golden end-to-end test: full constraint suite on the t1 fixture must
recover exactly the planted corruption matrix (FIXTURES.md §3-4)."""

import json
import os

import pyarrow as pa
import pytest

from raqc_ray.config import NearDupCheck, default_image_config
from raqc_ray.fixtures import expected_violation_keys
from raqc_ray.pipelines import validate_epoch_pair
from raqc_ray.schema import VIOLATIONS_SCHEMA


@pytest.fixture(scope="module")
def pair_result(ray_session, t1_fixture):
    root = t1_fixture["root"]
    cfgs = []
    for epoch in ("e1", "e2"):
        cfg = default_image_config(
            epoch, captions_path=os.path.join(root, epoch, "captions.parquet")
        )
        # fixture hot bucket is 50 rows → cap below it to exercise salting
        cfg.checks = [
            NearDupCheck(column="phash", hot_bucket_cap=32)
            if isinstance(c, NearDupCheck)
            else c
            for c in cfg.checks
        ]
        cfgs.append(cfg)
    e1_files = os.path.join(root, "e1")
    e2_files = os.path.join(root, "e2")
    # directories contain captions.parquet too — pass explicit part files
    parts = lambda d: sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.startswith("part-")
    )
    r1, r2 = validate_epoch_pair(parts(e1_files), parts(e2_files), cfgs[0], cfgs[1])
    return t1_fixture, r1, r2


def _violation_keys(result):
    tbl = result.violations.to_pandas()
    return sorted(
        (int(r.partition_id), r.epoch, r.check, r.image_id, r.column)
        for r in tbl.itertuples(index=False)
    )


def test_violations_match_expected_e1(pair_result):
    manifest, r1, _ = pair_result
    got = _violation_keys(r1)
    exp = expected_violation_keys(manifest, "e1")
    assert got == exp, (
        f"missing={sorted(set(exp)-set(got))[:10]} "
        f"extra={sorted(set(got)-set(exp))[:10]}"
    )


def test_violations_match_expected_e2(pair_result):
    manifest, _, r2 = pair_result
    got = _violation_keys(r2)
    exp = expected_violation_keys(manifest, "e2")
    assert got == exp, (
        f"missing={sorted(set(exp)-set(got))[:10]} "
        f"extra={sorted(set(got)-set(exp))[:10]}"
    )


def test_violations_schema(pair_result):
    _, r1, _ = pair_result
    batch = r1.violations.schema()
    assert batch.base_schema.equals(VIOLATIONS_SCHEMA)


def test_row_check_verdicts(pair_result):
    manifest, r1, _ = pair_result
    v = r1.verdicts.to_pandas()
    # partition 0 holds nearly all corruptions → fails the row checks there
    def verdict(check, pid):
        row = v[(v["check"] == check) & (v["partition_id"] == pid)]
        assert len(row) == 1, (check, pid)
        return row.iloc[0]

    for check in ("nullity", "range", "caption", "decode", "expr",
                  "exposure"):
        assert not verdict(check, 0)["pass"]
        assert verdict(check, 0)["n_violations"] > 0
        # partitions beyond the corruption zone are clean
        assert verdict(check, 3)["pass"]
    assert verdict("nullity", 0)["n_rows"] == manifest["rows_per_partition"]
    # uniqueness: pairs span partitions 0..3
    for pid in range(4):
        assert not verdict("uniqueness", pid)["pass"]
    # referential orphans land on partition -1
    assert not verdict("referential", -1)["pass"]
    assert verdict("referential", -1)["n_violations"] == 3


def test_stat_verdicts(pair_result):
    manifest, r1, _ = pair_result
    v = r1.verdicts.to_pandas()
    rp = manifest["rows_per_partition"]
    card = v[v["check"] == "cardinality:image_id"]
    assert len(card) == manifest["n_partitions"]
    for _, row in card.iterrows():
        est = json.loads(row["stats_json"])["estimate"]
        assert abs(est - rp) / rp < 0.05  # HLL within 5% at n=250
    quant = v[v["check"] == "quantile:w"]
    assert len(quant) == manifest["n_partitions"]
    st = json.loads(quant.iloc[0]["stats_json"])
    assert 32 <= st["quantiles"]["0.5"] <= 256
    stats = v[v["check"] == "stats"]
    s0 = json.loads(stats[stats["partition_id"] == 0].iloc[0]["stats_json"])
    assert s0["w"]["max"] == 20_000  # planted range outlier visible in stats


def test_drift_verdicts(pair_result):
    manifest, r1, r2 = pair_result
    v2 = r2.verdicts.to_pandas()
    drift = v2[v2["check"] == "drift"]
    assert len(drift) == manifest["n_partitions"]
    # e2 plants a strong shift (width dist + brightness) → every partition trips
    assert not drift["pass"].any()
    psi_vals = [json.loads(s)["psi"] for s in drift["stats_json"]]
    assert all(p > 0.2 for p in psi_vals)
    # e1 verdicts have no drift rows (baseline epoch)
    assert (r1.verdicts.to_pandas()["check"] != "drift").all()


def test_metrics(pair_result):
    manifest, r1, _ = pair_result
    assert r1.metrics["n_rows"] == manifest["rows"]
    assert r1.metrics["n_partitions"] == manifest["n_partitions"]


def test_band_quantile_verdicts(pair_result):
    import json as _json

    manifest, r1, _ = pair_result
    v = r1.verdicts.to_pandas()
    bq = v[v["check"] == "band_quantile"]
    assert len(bq) == manifest["n_partitions"]
    assert bq["pass"].all()  # informational by default
    st = _json.loads(bq.iloc[0]["stats_json"])
    assert st["n_bands"] >= 2  # several byte-length bands exist
    assert 0.0 <= st["frac_beyond_band_thresholds"] <= 1.0
