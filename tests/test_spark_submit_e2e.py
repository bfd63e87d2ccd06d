"""North-rule deployment-mode evidence: the pipeline runs under REAL
`spark-submit --py-files dist/wcsp.zip tools/submit_pipeline.py` (not
just in-process sessions), and produces the same tables.

The north rule's cluster criterion ("spark-submit --py-files on a
multi-executor cluster at N and 4N executors") cannot use a real cluster
in this sandbox; this test drives the identical submission path with
`--master local[4]` — the only line that changes on a cluster — and the
scaling evidence lives in BENCH/BASELINE.md (two-parallelism runs).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str | None:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    return shutil.which("spark-submit")


@pytest.mark.slow
def test_pipeline_under_spark_submit(tmp_path):
    submit = _spark_submit_bin()
    if submit is None:
        pytest.skip("no spark-submit binary in this environment")

    # fixtures written by a plain in-process session (generator only)
    from water_column_sonar_processing_spark.fixtures import write_fixtures

    fx = write_fixtures(str(tmp_path / "fx"), n_rows=1500)

    # the --py-files artifact, built exactly as the docs say
    subprocess.run([sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py")], check=True, cwd=REPO)
    zip_path = os.path.join(REPO, "dist", "wcsp.zip")
    assert os.path.exists(zip_path)

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    # isolate from the test session's JVM; spark-submit spawns its own
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_pipeline.py"),
            "--pages", fx["pages"],
            "--polygons", fx["polygons"],
            "--out", out_dir,
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=str(tmp_path),  # NOT the repo root: imports must come from the zip
    )
    assert res.returncode == 0, res.stderr[-4000:]
    # the submit script prints "<table>: <path> rows=<n>" per output table
    printed = {
        ln.split(":")[0]: int(ln.rsplit("rows=", 1)[1])
        for ln in res.stdout.splitlines()
        if " rows=" in ln
    }
    assert printed.get("l1") == 1500  # every input row lands in L1
    assert printed.get("pip", 0) > 0  # hot-cell pages hit the polygons
    assert printed.get("tiles", 0) > 0  # multi-zoom rollup materialized
    assert os.path.isdir(os.path.join(out_dir, "l1_pages"))


@pytest.mark.slow
def test_corpus_under_spark_submit(tmp_path):
    """The LLM-corpus twin (tools/submit_corpus.py) through the same
    --py-files deployment: dedup -> decontaminate -> split -> pack."""
    submit = _spark_submit_bin()
    if submit is None:
        pytest.skip("no spark-submit binary in this environment")

    import duckdb

    src = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(src):
        pytest.skip("driver testdata tier not present on this machine")
    train_dir = str(tmp_path / "train_docs")
    eval_dir = str(tmp_path / "eval_docs")
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT doc_id, text FROM read_parquet('{src}') WHERE doc_id % 25 <> 0) "
        f"TO '{train_dir}' (FORMAT parquet, PER_THREAD_OUTPUT false)"
    )
    con.execute(
        f"COPY (SELECT doc_id, text FROM read_parquet('{src}') WHERE doc_id % 25 = 0) "
        f"TO '{eval_dir}' (FORMAT parquet, PER_THREAD_OUTPUT false)"
    )

    subprocess.run([sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py")], check=True, cwd=REPO)
    zip_path = os.path.join(REPO, "dist", "wcsp.zip")
    out_dir = str(tmp_path / "corpus_out")
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_corpus.py"),
            "--docs", train_dir,
            "--eval", eval_dir,
            "--out", out_dir,
            "--holdout", "0.1",
            "--seq-budget", "512",
            "--decontam-n", "4",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-4000:]
    printed = {
        ln.split(":")[0]: int(ln.rsplit("rows=", 1)[1])
        for ln in res.stdout.splitlines()
        if " rows=" in ln
    }
    assert printed.get("deduped", 0) > 0
    # decontamination dropped something but not everything
    assert 0 < printed.get("decontaminated", 0) < printed["deduped"]
    assert printed.get("train", 0) + printed.get("holdout", 0) == printed["decontaminated"]
    assert printed.get("packed_train", 0) == printed.get("train")
