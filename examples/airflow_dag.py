"""Airflow deployment of the job manifest — the reference's operational
surface ("Airflow scheduling Spark jobs") materialized as one runnable DAG
file.

The reference spread its schedule over 52 DAG files, each hard-wiring one
pipeline to one staggered daily cron (e.g.
``dags/bexio/bexio_invoice_and_line_items_de.py:35-50`` — ``schedule_interval
='35 21 * * *'``, ``catchup=False``, ``retries=1`` / 5-minute delay). This
file generates the SAME cadence from ``bi_gcp_stitch_repl_spark.jobs.
schedule.JOB_MANIFEST`` instead: one ``SparkSubmitOperator`` per CLI-runnable
manifest entry, so adding a pipeline to the manifest IS the deployment
change — no new DAG file, no cron drift between code and schedule.

Per-job JSON configs (warehouse paths, API bases, transport factories) live
next to this file as ``<job>.json`` — see ``billwerk_job.json`` for the
shape; the ``$transport`` / ``$parquet`` resolver forms are documented in
``bi_gcp_stitch_repl_spark/jobs/__main__.py``.

IMPORT-GUARDED: the engine never imports Airflow (scheduling is the
deployment's concern — ``jobs/schedule.py``), and this example degrades to
a no-op module outside an Airflow image, so the test suite and any
airflow-free environment import it cleanly. Inside an Airflow deployment,
drop this file (plus the package zip and configs) into ``dags/`` unchanged.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from bi_gcp_stitch_repl_spark.jobs.schedule import JOB_MANIFEST

try:  # deployment-only dependency: absent in the engine's test image
    from airflow import DAG
    from airflow.providers.apache.spark.operators.spark_submit import (
        SparkSubmitOperator,
    )

    HAVE_AIRFLOW = True
except ImportError:  # pragma: no cover - exercised via test_examples.py
    DAG = SparkSubmitOperator = None
    HAVE_AIRFLOW = False

#: where the job JSON configs live inside the Airflow image
CONFIG_DIR = os.environ.get("SPARK_JOBS_CONFIG_DIR", os.path.dirname(__file__))
#: the engine package shipped to executors, exactly as the catalog does
#: internally via addPyFile (queries/catalog.py::_ensure_importable_on_workers)
PY_FILES = os.environ.get("SPARK_JOBS_PYFILES", "bi_gcp_stitch_repl_spark.zip")


def build_dags() -> dict[str, "DAG"]:
    """One DAG per CLI-runnable manifest entry, mirroring the reference's
    defaults: daily staggered crons, no catchup (a missed night is re-read
    by the next run's watermark/merge semantics, not replayed), one retry
    after 5 minutes (transient API flakes; systematic failures page)."""
    dags: dict[str, DAG] = {}
    for name, spec in JOB_MANIFEST.items():
        if not spec.cli:
            continue  # callable-argument jobs run library-driven
        dag = DAG(
            dag_id=name,
            description=spec.description,
            schedule=spec.cron,
            start_date=datetime(2024, 1, 1),
            catchup=False,
            default_args={
                "retries": 1,
                "retry_delay": timedelta(minutes=5),
            },
        )
        # spark-submit has NO module (-m) mode: the application must be a
        # .py/.jar primary resource. submit_job.py (shipped next to this
        # DAG) forwards argv to the package CLI, which the zip in
        # py_files makes importable on driver and executors
        SparkSubmitOperator(
            task_id=name,
            dag=dag,
            application=os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "submit_job.py"
            ),
            application_args=[
                name,
                "--config",
                os.path.join(CONFIG_DIR, f"{name}.json"),
            ],
            py_files=PY_FILES,
            name=f"job:{name}",
        )
        dags[name] = dag
    return dags


if HAVE_AIRFLOW:
    # Airflow discovers DAGs by scanning module globals
    globals().update(build_dags())
