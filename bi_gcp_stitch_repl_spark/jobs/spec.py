"""JobSpec: one schedulable pipeline entry (shared by the core manifest in
``schedule`` and the per-entity manifest in ``entities`` — its own module
so neither imports the other)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class JobSpec:
    pipeline: str  # function name in jobs.pipelines
    cron: str  # reference cadence (staggered daily crons)
    description: str
    #: False = the pipeline takes an argument no JSON config can express
    #: (currently only a Python callable — reverse-ETL's ``send``); such
    #: jobs run through a library driver / streaming job, not the
    #: spark-submit CLI, and __main__ excludes them from its choices.
    #: DataFrame arguments ARE expressible via the {"$parquet": path}
    #: resolver, so the batch/snapshot-taking jobs stay CLI-runnable.
    cli: bool = True
    #: static per-entity pipeline kwargs (the DECLARATIVE config that
    #: replaces one reference DAG file). __main__ passes these under the
    #: runtime --config, which supplies deployment concerns (transport,
    #: warehouse paths) and may override. None = the job has no baked
    #: config.
    params: dict | None = None
    #: reference DAG file this entry replaces (parity audit trail)
    ref: str | None = None
