"""spark-submit job entry points, driven in-process (the north rule ships
the pipeline as --py-files jobs)."""

import json
import os

import pytest

from tantivy4java_spark.corpus import generate_pandas


def test_build_then_query_job(spark, tmp_path, capsys):
    src = str(tmp_path / "corpus")
    pdf = generate_pandas(0, 120, min_tokens=15, max_tokens=40)
    spark.createDataFrame(pdf).write.parquet(src)
    idx = str(tmp_path / "jobidx")

    from jobs.build_job import main as build_main
    build_main(["--input", src, "--index-dir", idx, "--segments", "2"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["num_docs"] == 120

    from jobs.query_job import main as query_main
    query_main(["--index-dir", idx, "--query",
                "content:import AND lang:java", "--k", "5",
                "--source", src])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    hits = [l for l in lines if "doc_id" in l]
    assert hits and all("content" in h for h in hits)
    assert all(h["lang"] == "java" for h in hits)


def test_resume_via_job_rerun(spark, tmp_path, capsys):
    src = str(tmp_path / "corpus2")
    pdf = generate_pandas(0, 60, min_tokens=10, max_tokens=25)
    spark.createDataFrame(pdf).write.parquet(src)
    idx = str(tmp_path / "jobidx2")
    from jobs.build_job import main as build_main
    build_main(["--input", src, "--index-dir", idx, "--segments", "2"])
    capsys.readouterr()
    # identical rerun: all segments skipped, still commits
    build_main(["--input", src, "--index-dir", idx, "--segments", "2"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["num_docs"] == 60
