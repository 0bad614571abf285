"""Z-order clustering: the rewrite must preserve data exactly, and the
file-level min/max footer stats must actually prune on EVERY clustered
column — measured directly from the parquet footers, the same stats a
100 TB scan's file skipping reads."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from bi_gcp_stitch_repl_spark.ops.layout import zorder_layout
from bi_gcp_stitch_repl_spark.sinks.merge import ParquetTable

from .conftest import SF_SMOKE

N_FILES = 16


def _files_overlapping(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(files whose [min,max] for ``col`` overlaps [lo,hi], total files) —
    exactly the skipping decision a stats-based scan makes per file."""
    hit, total = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        assert mins, f"no stats for {col} in {f}"
        total += 1
        if min(mins) <= hi and max(maxs) >= lo:
            hit += 1
    return hit, total


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n = li.count()

    # Baseline: the classic single-column layout (range-sorted by orderkey).
    linear = str(tmp_path / "linear")
    li.repartitionByRange(N_FILES, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(linear)
    # Z-ordered on (orderkey, partkey).
    zpath = str(tmp_path / "zorder")
    zorder_layout(li, ["l_orderkey", "l_partkey"], N_FILES).write.parquet(zpath)

    z = spark.read.parquet(zpath)
    assert z.count() == n
    assert li.exceptAll(z).isEmpty() and z.exceptAll(li).isEmpty()

    # A narrow partkey band: the orderkey-sorted layout cannot skip anything
    # (partkey is uniform within every file); the z-ordered one must.
    pk_lo, pk_hi = 10, 30
    lin_hit, lin_total = _files_overlapping(linear, "l_partkey", pk_lo, pk_hi)
    z_hit, z_total = _files_overlapping(zpath, "l_partkey", pk_lo, pk_hi)
    assert lin_total == N_FILES and z_total == N_FILES
    assert lin_hit == N_FILES  # no pruning without the curve
    assert z_hit <= N_FILES // 2, (z_hit, N_FILES)

    # And the curve still prunes on the leading column too.
    ok_lo, ok_hi = 1, 100
    z_ok_hit, _ = _files_overlapping(zpath, "l_orderkey", ok_lo, ok_hi)
    assert z_ok_hit <= N_FILES // 2, z_ok_hit


def test_compact_zorder_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    t = ParquetTable(spark, path)
    t.overwrite(li)
    n = t.compact(target_partitions=8, zorder_by=["l_orderkey", "l_partkey"])
    assert n == li.count()
    assert t.read().count() == n
    hit, total = _files_overlapping(path, "l_partkey", 10, 30)
    assert total == 8 and hit < total


def test_driver_window_covers_survey_gates():
    """The external correctness driver checks only the FIRST 50 registered
    queries; this pins the round-3 window: every SURVEY §2 gate (30 slots —
    A4+A6 and F20/F24/F25 share combined gates) plus the rotating slots, currently the
    LLM-pipeline core and the three hardest TPC-H shapes
    (catalog._PRIORITY)."""
    from bi_gcp_stitch_repl_spark.queries import catalog

    first50 = list(catalog.queries())[:50]
    required = {
        # §2 parity spine (30)
        "flagship_union_history", "q1_pricing_summary", "q3_top_revenue_orders",
        "q5_local_supplier_volume", "p1_p2_project_rename", "p3_p4_p5_predicates",
        "p6_date_boundary", "j1_carry_forward_keys", "j2_dim_enrichment",
        "j3_j4_k7_history_delta", "j5_semi_join", "k1_merge_upsert",
        "a1_a2_distinct_dedup", "a3_conditional_rollup",
        "a4_a6_watermark_accounting", "a5_first_wins_merge",
        "k8_reverse_etl_batches",
        "u2_vertical_concat", "a7_rollup_hierarchy", "a9_cube_status_priority",
        "a8_percentiles", "o1_order_limit_offset", "s4_keyset_increment",
        "s7_detail_fanout", "s9_sql_scan", "n_explode_with_parent",
        "n_nested_battery", "f_string_clean_coerce",
        "f_date_functions", "f_timestamp_json",
        # LLM-pipeline core (17)
        "x_dedup_exact", "x_minhash_lsh_candidates", "x_span_dedup",
        "x_simhash_pairs", "x_dedup_embedding_pairs",
        "x_knn_cosine_topk", "x_ivf_topk", "x_sparse_cosine_pairs",
        "x_text_stats", "x_vocab_encode", "x_gopher_rules",
        "x_decontaminate", "x_split_shard", "x_curation_pipeline",
        "x_dau_mau_stickiness", "x_linear_attribution",
        "x_image_roundtrip_meta",
        # TPC-H completions (3)
        "q21_waiting_suppliers", "q17_small_quantity_revenue",
        "q20_dominant_suppliers",
    }
    assert len(required) == 50
    missing = required - set(first50)
    assert not missing, f"§2 gates fell out of the driver's 50: {missing}"
