"""F4 — fmt-conditioned band thresholds (SURVEY.md §2.9, VERDICT r1 #6).

Plants an outlier block that is extreme WITHIN its category ('png'
values shifted to 30 vs the category's 10) but unremarkable against the
pooled distribution (which spans 10…100 because of 'jpg').  The
conditioned check must fail the planted partition; the unconditioned
check must NOT notice it — that contrast is exactly the
outlier ∧ side-attribute semantics of RAQC's conditional flag trees.
"""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    rng = np.random.default_rng(4)
    root = tmp_path_factory.mktemp("bandcond")
    # partition 0: healthy — png ~N(10, .1), jpg ~N(100, .1)
    n = 5000
    p0 = pd.DataFrame(
        {"image_id": [f"a{i}" for i in range(2 * n)],
         "fmt": ["png"] * n + ["jpg"] * n,
         "v": np.concatenate([rng.normal(10, 0.1, n),
                              rng.normal(100, 0.1, n)]),
         "b": 1.0,
         "pid": 0}
    )
    # partition 1: 50 png rows at 30 — within pooled [10, 100], extreme
    # for png (<1% of png mass → beyond the 0.99 category threshold)
    p1 = pd.DataFrame(
        {"image_id": [f"b{i}" for i in range(50)],
         "fmt": "png",
         "v": rng.normal(30, 0.1, 50),
         "b": 1.0,
         "pid": 1}
    )
    path = str(root / "t.parquet")
    pd.concat([p0, p1], ignore_index=True).to_parquet(path)
    return path


def _run(fixture_path, conditioned: bool):
    from raqc_ray.config import BandQuantileCheck, RunConfig
    from raqc_ray.pipelines.validate import validate_epoch

    cfg = RunConfig(
        checks=[BandQuantileCheck(
            value="v", band_of="b", condition_on="fmt" if conditioned else "",
            outlier_percentiles=(0.01, 0.99), max_outlier_fraction=0.3)],
        epoch="t",
        partition_from=("column", "pid"),
        read_columns=("image_id", "fmt", "v", "b", "pid"),
    )
    v = validate_epoch(fixture_path, cfg).verdicts.to_pandas()
    bq = v[v["check"] == "band_quantile"].set_index("partition_id")
    return bq


def test_conditioned_flags_planted_partition(ray_session, fixture_path):
    bq = _run(fixture_path, conditioned=True)
    assert bool(bq.loc[0, "pass"]) is True
    assert bool(bq.loc[1, "pass"]) is False  # png@30 extreme for png


def test_unconditioned_misses_planted_partition(ray_session, fixture_path):
    bq = _run(fixture_path, conditioned=False)
    assert bool(bq.loc[0, "pass"]) is True
    assert bool(bq.loc[1, "pass"]) is True  # 30 hides inside pooled 10…100


def test_conditioned_keys_robust_to_nulls_and_huge_bands(ray_session, tmp_path):
    """ADVICE r2: (category, band) keys must be grouped as tuples — the
    old cat*1e6+band packing broke for band ids >= 1e6 and aliased null
    condition values (factorize code -1) onto the last category.  Plant
    both: rows whose band value / band_width yields a band id > 1e6, and
    null-fmt rows whose values would flip the real category's verdict if
    they leaked into it."""
    from raqc_ray.config import BandQuantileCheck, RunConfig
    from raqc_ray.pipelines.validate import validate_epoch

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {"image_id": [f"a{i}" for i in range(n)],
         "fmt": ["png"] * n,
         "v": rng.normal(10, 0.1, n),
         # band value 2_000_000 / band_width 1.0 → band id 2e6 (> 1e6)
         "b": 2_000_000.0,
         "pid": 0})
    # null-fmt rows with extreme values — must land in a skip bucket,
    # not in 'png' (where 500 rows at 1000 would fail the partition)
    nulls = pd.DataFrame(
        {"image_id": [f"n{i}" for i in range(500)],
         "fmt": pd.Series([None] * 500, dtype="object"),
         "v": 1000.0,
         "b": 2_000_000.0,
         "pid": 0})
    p = str(tmp_path / "t.parquet")
    pd.concat([df, nulls], ignore_index=True).to_parquet(p)

    cfg = RunConfig(
        checks=[BandQuantileCheck(
            value="v", band_of="b", condition_on="fmt",
            outlier_percentiles=(0.01, 0.99), max_outlier_fraction=0.3)],
        epoch="t",
        partition_from=("column", "pid"),
        read_columns=("image_id", "fmt", "v", "b", "pid"),
    )
    v = validate_epoch(p, cfg).verdicts.to_pandas()
    bq = v[v["check"] == "band_quantile"].set_index("partition_id")
    # healthy png distribution → pass; no IndexError from huge band ids
    assert bool(bq.loc[0, "pass"]) is True
