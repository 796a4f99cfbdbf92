"""End-to-end spark-submit pipeline script: synthetic corpus → edges +
orders + algorithm outputs + REPORT.json (the north rule's packaged entry
point), both PageRank engines."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out_dir: str, extra: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--synthetic", "300", "--out", out_dir, *extra],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    with open(os.path.join(out_dir, "REPORT.json")) as f:
        return json.load(f)


def test_pipeline_both_pr_engines(tmp_path):
    out_a = str(tmp_path / "df")
    rep_a = _run(out_a, ["--algorithms", "pagerank", "--pr-iters", "5",
                         "--pr-tol", "0", "--pr-engine", "dataframe"])
    out_b = str(tmp_path / "kern")
    rep_b = _run(out_b, ["--algorithms", "pagerank", "--pr-iters", "5",
                         "--pr-tol", "0", "--pr-engine", "kernel"])
    assert rep_a["n_edges"] == rep_b["n_edges"] > 0
    assert os.path.exists(os.path.join(out_a, "pagerank", "_SUCCESS"))
    assert os.path.exists(os.path.join(out_b, "pagerank", "_SUCCESS"))

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        select max(abs(a.rank - b.rank))
        from '{out_a}/pagerank/*.parquet' a
        join '{out_b}/pagerank/*.parquet' b using (v)
        """
    ).fetchone()
    assert rows[0] < 1e-9  # engine parity through the packaged entry point


def test_pipeline_triangles_checkpoint_counters(tmp_path):
    """TC through the pipeline records the reference's profiling counters
    (inter_cnt/cmp_cnt, src/tc.cpp:46) in both REPORT.json and the
    checkpoint manifest metrics (VERDICT r4 next-round #8)."""
    out = str(tmp_path / "tc")
    ckdir = str(tmp_path / "ck")
    rep = _run(out, ["--algorithms", "triangles",
                     "--checkpoint-dir", ckdir, "--run-id", "tcrun"])
    assert rep["triangles"] >= 0
    assert rep["tc_counters"]["inter_cnt"] > 0
    assert rep["tc_counters"]["cmp_cnt"] >= rep["tc_counters"]["inter_cnt"]
    manifest = os.path.join(ckdir, "tcrun-triangles", "MANIFEST.jsonl")
    with open(manifest) as f:
        entries = [json.loads(l) for l in f if l.strip()]
    assert entries[-1]["metrics"]["inter_cnt"] == rep["tc_counters"]["inter_cnt"]
    assert entries[-1]["metrics"]["cmp_cnt"] == rep["tc_counters"]["cmp_cnt"]
    assert entries[-1]["metrics"]["triangles"] == rep["triangles"]
