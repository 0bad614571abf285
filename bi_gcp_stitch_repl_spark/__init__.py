"""bi_gcp_stitch_repl_spark — a PySpark-native analytics/ELT engine.

A from-scratch re-expression of the capabilities of the reference BI
replication platform (``shore-gmbh/bi-gcp-stitch-repl``, 52 Airflow DAGs of
pandas + BigQuery SQL) as an idiomatic Spark engine:

- ``sources``   — paginated REST scans (offset / page / keyset / cursor),
                  per-key detail fan-out via ``mapInPandas``, sheet ranges,
                  warehouse (parquet) scans with projection pushdown.
- ``ops``       — normalization (explode + parent attach, struct flattening,
                  schema padding), cleaning/coercion, upsert-key carry-forward,
                  anti-join history capture.
- ``sinks``     — atomic merge-upsert / overwrite / append on parquet tables,
                  watermark store, reverse-ETL batch writer.
- ``functions`` — text analysis, dedup (exact / MinHash-LSH / SimHash /
                  n-gram Jaccard), embedding similarity search, multimodal
                  column plumbing: the LLM-data-pipeline extension surface.
- ``streaming`` — Structured Streaming jobs over the ``events`` table
                  (tumbling windows, sessionization, watermarked late data).
- ``queries``   — the operator catalog: every operator exposed as a named
                  (spark, sf_dir) -> DataFrame callable with a DuckDB oracle.

Everything is DataFrame/Catalyst-first: no RDDs, no Python scalar UDFs in the
reference-parity surface (SURVEY.md §2.11), Pandas UDF / mapInPandas only where
Spark genuinely lacks the primitive (remote fan-out, multimodal decode).
"""

__version__ = "0.1.0"
