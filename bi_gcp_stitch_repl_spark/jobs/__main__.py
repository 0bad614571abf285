"""spark-submit entry point for the job manifest.

    spark-submit [--py-files pkg.zip] -m bi_gcp_stitch_repl_spark.jobs \
        <job-name> --config job.json

or, equivalently, ``python -m bi_gcp_stitch_repl_spark.jobs <job-name>
--config job.json``. ``job-name`` is a key of ``schedule.JOB_MANIFEST``;
the JSON config holds the pipeline's keyword arguments (warehouse paths,
API base URLs, …). Two resolver forms make non-JSON arguments
expressible: ``{"$transport": "module:factory"}`` constructs a transport
(connectors are injectable here exactly as in tests, so the same job
binary runs hermetic or live), and ``{"$parquet": "/path"}`` reads a
parquet table into the DataFrame argument (how batch-taking jobs —
history_capture, the three index-ingest jobs — receive their input from
a landing path). Top-level keys starting with ``__`` (``__doc__``) are
config metadata, not kwargs.

This is the deployment seam the manifest docstring describes: Airflow (or
any cron) schedules one ``spark-submit`` per manifest entry; the engine
never imports Airflow.
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys

from ..session import get_spark
from . import pipelines
from .schedule import JOB_MANIFEST


def _resolve(value, spark=None):
    if isinstance(value, dict) and set(value) == {"$transport"}:
        mod, _, fn = value["$transport"].partition(":")
        return getattr(importlib.import_module(mod), fn)()
    if isinstance(value, dict) and set(value) == {"$parquet"}:
        if spark is None:
            raise ValueError("$parquet resolver needs a SparkSession")
        return spark.read.parquet(value["$parquet"])
    if isinstance(value, dict):
        return {k: _resolve(v, spark) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve(v, spark) for v in value]
    return value


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="bi_gcp_stitch_repl_spark.jobs")
    parser.add_argument(
        "job",
        choices=sorted(n for n, sp in JOB_MANIFEST.items() if sp.cli),
    )
    parser.add_argument(
        "--config",
        required=True,
        help="JSON file of keyword arguments for the pipeline function",
    )
    args = parser.parse_args(argv)

    spec = JOB_MANIFEST[args.job]
    fn = getattr(pipelines, spec.pipeline)
    spark = get_spark(app_name=f"job:{args.job}")
    with open(args.config) as f:
        kwargs = {
            k: _resolve(v, spark)
            for k, v in json.load(f).items()
            # "__doc__"-style keys are config self-documentation — passing
            # them through made the README's own example command crash
            # with an unexpected-keyword TypeError
            if not k.startswith("__")
        }
    # baked per-entity declarative config first; the runtime --config
    # supplies deployment concerns (transport, paths) and may override
    kwargs = {**(spec.params or {}), **kwargs}
    result = fn(spark, **kwargs)
    print(json.dumps({"job": args.job, "result": repr(result)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
