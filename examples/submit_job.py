"""spark-submit primary resource for the Airflow DAGs in
``airflow_dag.py``.

``spark-submit`` runs a .py/.jar application — it has no ``-m`` module
mode — so the DAG ships THIS file as the application and the engine
package as ``--py-files``; the script just forwards its argv to the
package CLI (``bi_gcp_stitch_repl_spark/jobs/__main__.py``):

    spark-submit --py-files bi_gcp_stitch_repl_spark.zip \
        submit_job.py <job-name> --config <job>.json
"""

from __future__ import annotations

import sys

if __name__ == "__main__":
    try:
        from bi_gcp_stitch_repl_spark.jobs.__main__ import main
    except ImportError:
        # direct `python examples/submit_job.py` runs (smoke tests) put
        # examples/ on sys.path instead of the repo root; under
        # spark-submit the --py-files zip provides the package instead
        import os

        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from bi_gcp_stitch_repl_spark.jobs.__main__ import main

    sys.exit(main(sys.argv[1:]))
