"""The shipped examples must actually run (no doc rot)."""

from __future__ import annotations

import pytest

import sys


def test_airflow_dag_example_imports_without_airflow():
    """The deployment DAG example must degrade to a clean no-op module in
    an airflow-free environment (the engine never depends on Airflow),
    and its generated schedule must cover every CLI-runnable manifest
    entry once Airflow IS present (asserted structurally here via the
    manifest, since this image has no airflow)."""
    sys.path.insert(0, "examples")
    try:
        import airflow_dag
    finally:
        sys.path.pop(0)
    assert not airflow_dag.HAVE_AIRFLOW  # this image is airflow-free
    from bi_gcp_stitch_repl_spark.jobs.schedule import JOB_MANIFEST

    cli_jobs = {n for n, sp in JOB_MANIFEST.items() if sp.cli}
    assert cli_jobs  # the DAG generator would emit one DAG per entry
    # the module exposes the generator for an Airflow-present deployment
    assert callable(airflow_dag.build_dags)


def test_curate_corpus_example_end_to_end(spark, tmp_path):
    sys.path.insert(0, "examples")
    try:
        import curate_corpus
    finally:
        sys.path.pop(0)
    stats = curate_corpus.run(str(tmp_path))
    assert stats["ingested"] == 200
    assert stats["quarantined"] == 1
    # shards exported for every split
    out = spark.read.parquet(str(tmp_path / "shards"))
    assert {r.split for r in out.select("split").distinct().collect()} == {
        "train",
        "valid",
        "test",
    }


def test_hybrid_search_example(spark):
    """rrf_fuse's documented seam — ivf_topk as the semantic side — must
    actually run end-to-end, return a full fused top-10, and keep IVF
    recall sane at n_probe=5/8."""
    sys.path.insert(0, "examples")
    try:
        import hybrid_search
    finally:
        sys.path.pop(0)
    top = hybrid_search.run("/root/testdata/sf0.001")
    assert len(top) == hybrid_search.K
    assert all(r["rrf_score"] > 0 for r in top)
    # every fused row came from at least one retriever list
    assert all(
        r["lex_rank"] is not None or r["sem_rank"] is not None for r in top
    )


def test_submit_job_script_forwards_to_cli():
    """The spark-submit primary resource must reach the package CLI:
    --help exits 0 via argparse (spark-submit has no -m mode, so this
    file IS the deployment entry; review r05)."""
    import os
    import subprocess

    out = subprocess.run(
        [sys.executable, "examples/submit_job.py", "--help"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0
    assert "bi_gcp_stitch_repl_spark.jobs" in out.stdout


@pytest.mark.slow
def test_web_pipeline_example_end_to_end(spark, tmp_path):
    """The web-crawl example must run its whole chain: 240 crawled pages
    (every resource fetched twice under different raw spellings) collapse
    to 120 docs at the URL tier, the 3 benchmark-contaminated pages fall
    to the two-tier decontamination, and shards export for every split."""
    sys.path.insert(0, "examples")
    try:
        import web_pipeline
    finally:
        sys.path.pop(0)
    stats = web_pipeline.run(str(tmp_path))
    assert stats["crawled_pages"] == 244  # incl. 4 robots-disallowed pages
    # 120 resources - 3 contaminated; the 4 /private/ pages fell at the
    # robots tier (without the gate they would make this 121)
    assert stats["after_web_front"] == 117
    # the crawl's own link graph: the hub domain every third page
    # endorses out-ranks the four page-serving sites
    assert stats["top_domain"] == "hub-site.com"
    assert stats["n_domains"] == 5
    out = spark.read.parquet(str(tmp_path / "shards"))
    assert {r.split for r in out.select("split").distinct().collect()} == {
        "train",
        "valid",
        "test",
    }
