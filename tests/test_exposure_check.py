"""ExposureCheck — the configurable in-pipeline exposure gate riding
the DecodeCheck's decode (no second decode): planted blown-out images
must produce exposure violations and fail their partition's verdict;
healthy mid-gray partitions must pass."""

import numpy as np
import pandas as pd
import pytest

from raqc_ray.codecs import encode_image, phash64


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("expcheck")

    def row(i, pid, v):
        arr = np.full((8, 8, 3), v, dtype=np.uint8)
        b = encode_image(arr, "png")
        return {"image_id": f"p{pid}-{i}", "bytes": b, "w": 8, "h": 8,
                "fmt": "png", "caption": "c",
                "phash": np.int64(phash64(arr)), "pid": pid}

    rows = [row(i, 0, 100 + i % 20) for i in range(40)]       # healthy
    rows += [row(i, 1, 250) for i in range(3)]                # blown out
    rows += [row(100 + i, 1, 100) for i in range(37)]         # filler
    path = str(root / "t.parquet")
    pd.DataFrame(rows).to_parquet(path)
    return path


def test_exposure_check_flags_planted_partition(ray_session,
                                                fixture_path):
    from raqc_ray.config import DecodeCheck, ExposureCheck, RunConfig
    from raqc_ray.pipelines.validate import validate_epoch

    cfg = RunConfig(
        checks=[DecodeCheck(),
                ExposureCheck(max_clip_permille=100, min_support=2)],
        epoch="t",
        partition_from=("column", "pid"),
        read_columns=("image_id", "bytes", "w", "h", "fmt", "pid"),
    )
    res = validate_epoch(fixture_path, cfg)
    v = res.violations.to_pandas()
    exp = v[v["check"] == "exposure"]
    # exactly the three planted v=250 images (25000c >= hi_c=23500)
    assert sorted(exp["image_id"]) == ["p1-0", "p1-1", "p1-2"]
    verd = (res.verdicts.to_pandas()
            .query("check == 'exposure'").set_index("partition_id"))
    assert bool(verd.loc[0, "pass"]) is True
    assert bool(verd.loc[1, "pass"]) is False  # 3 >= min_support=2


def test_exposure_check_respects_threshold(ray_session, fixture_path):
    from raqc_ray.config import DecodeCheck, ExposureCheck, RunConfig
    from raqc_ray.pipelines.validate import validate_epoch

    # 1000 permille: nothing can exceed a full-clip threshold
    cfg = RunConfig(
        checks=[DecodeCheck(), ExposureCheck(max_clip_permille=1000)],
        epoch="t",
        partition_from=("column", "pid"),
        read_columns=("image_id", "bytes", "w", "h", "fmt", "pid"),
    )
    v = validate_epoch(fixture_path, cfg).violations.to_pandas()
    assert len(v) == 0 or (v["check"] == "exposure").sum() == 0
