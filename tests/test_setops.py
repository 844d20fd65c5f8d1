"""Set operations (ops/setops.py): planted semantics — distinctness,
duplicate collapsing, empty-result schema stability — beyond the
q43/q44 INTERSECT/EXCEPT oracles."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def test_intersect_except_union_planted(rd):
    from raqc_ray.ops.setops import (
        except_distinct,
        intersect_distinct,
        union_distinct,
    )

    left = rd.from_pandas(pd.DataFrame(
        {"k": np.array([1, 1, 2, 3, 3, 3, 4], dtype=np.int64)}
    )).repartition(3)
    right = rd.from_pandas(pd.DataFrame(
        {"rk": np.array([2, 2, 4, 9], dtype=np.int64)}
    )).repartition(2)

    inter = sorted(intersect_distinct(left, right, on="k", right_on="rk")
                   .to_pandas()["k"])
    assert inter == [2, 4]  # duplicates collapse, set semantics
    exc = sorted(except_distinct(left, right, on="k", right_on="rk")
                 .to_pandas()["k"])
    assert exc == [1, 3]
    uni = sorted(union_distinct(left, right, on="k", right_on="rk")
                 .to_pandas()["k"])
    assert uni == [1, 2, 3, 4, 9]


def test_setops_empty_result_keeps_schema(rd):
    from raqc_ray.ops.setops import except_distinct, intersect_distinct

    left = rd.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2], dtype=np.int64)}))
    right_same = rd.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2], dtype=np.int64)}))
    right_disjoint = rd.from_pandas(pd.DataFrame(
        {"k": np.array([7, 8], dtype=np.int64)}))
    empty_exc = except_distinct(left, right_same, on="k")
    empty_int = intersect_distinct(left, right_disjoint, on="k")
    for ds in (empty_exc, empty_int):
        assert ds.count() == 0
        assert [f.name for f in ds.schema().base_schema] == ["k"]
