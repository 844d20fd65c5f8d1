"""CLI smoke test — the ``ray job submit`` surface (SURVEY.md §3.3)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_validate_writes_outputs(t1_fixture, tmp_path):
    root = t1_fixture["root"]
    out = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, "-m", "raqc_ray.cli", "--num-cpus", "4", "validate",
         "--input", os.path.join(root, "e1"),
         "--captions", os.path.join(root, "e1", "captions.parquet"),
         "--epoch", "e1", "--out", out],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["n_rows"] == t1_fixture["rows"]
    assert os.path.isdir(os.path.join(out, "violations"))
    assert os.path.exists(os.path.join(out, "verdicts.parquet"))
    import pyarrow.parquet as pq

    verdicts = pq.read_table(os.path.join(out, "verdicts.parquet"))
    assert verdicts.num_rows > 0
