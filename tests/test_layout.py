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
    queries; this pins the round-4 window (catalog._PRIORITY): the §2
    spine + canaries + the 40 entries that had never received a hard
    driver row in rounds 1-3 + the two queries changed this round. It
    additionally proves the coverage-closure invariant: the union of the
    r01-r03 driver windows and this window is the ENTIRE catalog."""
    import json
    import os

    from bi_gcp_stitch_repl_spark.queries import catalog

    first50 = list(catalog.queries())[:50]
    assert len(catalog._PRIORITY) == 50
    assert first50 == catalog._PRIORITY
    required = {
        # §2 spine + canaries + this-round changes
        "flagship_union_history", "k1_merge_upsert", "j1_carry_forward_keys",
        "s4_keyset_increment", "s7_detail_fanout", "n_nested_battery",
        "f_string_clean_coerce", "x_dedup_exact", "x_jaccard_ngram_pairs",
        "x_video_frames_roundtrip",
        # previously never-driver-verified tail
        "q2_min_cost_supplier", "q4_order_priority", "q6_forecast_revenue",
        "q9_product_profit", "q10_returned_items", "q11_revenue_concentration",
        "q12_linestatus_priority", "q13_order_distribution", "q14_promo_share",
        "q15_top_supplier", "q16_supplier_variety", "q18_large_orders",
        "q19_disjunctive_predicates", "q22_idle_customers",
        "w_rolling_30d_revenue", "w_frames_battery", "st_time_rollup",
        "x_grouping_sets", "x_asof_nearest", "x_null_aware_anti",
        "x_string_agg", "x_stats_battery", "x_benford_digits",
        "x_length_histogram", "x_approx_quantiles",
        "x_lang_id_ngram", "x_winnowing_fingerprints", "x_winnowing_pairs",
        "x_lm_likelihood", "x_bm25_topk", "x_bigram_stats", "x_zipf_fit",
        "x_inverted_index", "x_feature_hash_embed", "x_kmeans_assign",
        "x_source_overlap", "x_basket_pairs", "x_weighted_sample",
        "x_audio_roundtrip_features", "x_frame_sample_plan",
    }
    assert len(required) == 50
    missing = required - set(first50)
    assert not missing, f"window entries fell out of the driver's 50: {missing}"

    # coverage closure: every registered query has (or gets this round) a
    # hard driver row — guarded so the test stays hermetic if the
    # CORRECTNESS artifacts aren't present
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = set(first50)
    for r in (1, 2, 3):
        path = os.path.join(repo, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            with open(path) as f:
                seen |= set(json.load(f))
    if len(seen) > 50:  # artifacts were present
        # registered AFTER the r04 window froze — first eligible for the
        # r05 rotation (keep this list empty-able, never growing quietly)
        post_freeze = {"x_mjpeg_avi_roundtrip"}
        never = [
            n for n in catalog.queries()
            if n not in seen and n not in post_freeze
        ]
        assert not never, f"queries with no driver row in any round: {never}"
