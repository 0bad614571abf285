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
    queries; this pins the round-12 window (catalog._PRIORITY): §2 spine
    (flagship), the changed-library canaries, the r11 cohort minus seven
    released r11-fresh members (libraries untouched this round — the
    w_topk_per_group precedent), and the SEVEN re-oracled graph-family
    twins (r11 verdict #3): their library operators gained driver fast
    paths in the r11 optimization session AFTER the twins rotated out of
    the window, so the driver must re-oracle them now. It additionally
    proves the coverage-closure invariant: the union of the prior
    rounds' driver windows and this window is the ENTIRE catalog."""
    import json
    import os

    from bi_gcp_stitch_repl_spark.queries import catalog

    first50 = list(catalog.queries())[:50]
    assert len(catalog._PRIORITY) == 50
    assert first50 == catalog._PRIORITY
    required = {
        # §2 spine
        "flagship_union_history",
        # changed-library canaries: graph.py (r12 dispatch/NULL-weight
        # fixes), rerank.py, web.py trio
        "x_html_extract", "x_url_canonicalize", "x_robots_exclusion",
        "x_dedup_clusters", "x_clustering_trade", "x_mmr_rerank",
        # r11 cohort minus the seven released members (x_bigram_stats,
        # x_bm25_topk, x_ccnet_buckets, x_jl_project, x_lang_id,
        # x_lm_likelihood, x_quality_score — each r11-fresh, library
        # untouched this round)
        "w_topk_per_group", "x_bloom_decontaminate",
        "x_curation_pipeline",
        "x_decontaminate", "x_dedup_embedding_pairs",
        "x_dedup_near_survivors", "x_dedup_normalized", "x_dsir_weights",
        "x_embedding_quantize", "x_feature_hash_embed", "x_fingerprint",
        "x_gopher_rules", "x_ivf_topk",
        "x_knn_cosine_topk",
        "x_minhash_lsh_candidates", "x_mixture_sample",
        "x_multimodal_meta", "x_semantic_decontaminate",
        "x_semdedup", "x_simhash", "x_simhash_pairs",
        "x_sparse_cosine_pairs", "x_split_shard", "x_stratified_sample",
        "x_string_agg", "x_token_budget_plan", "x_vocab_encode",
        "x_weighted_sample", "x_winnowing_fingerprints",
        "x_winnowing_pairs",
        # r11 new-query cohort (keeps slots)
        "x_communities_trade", "x_bpe_merges", "x_modularity_trade",
        "x_bpe_encode", "x_image_dhash_near_dups", "x_random_walks_trade",
        # the seven re-oracled graph-family twins (r11 verdict #3)
        "x_bfs_trade", "x_sssp_trade", "x_kcore_trade",
        "x_pagerank_trade", "x_hits_trade", "x_ppr_trade",
        "x_triangle_trade",
    }
    assert len(required) == 50
    missing = required - set(first50)
    assert not missing, f"window entries fell out of the driver's 50: {missing}"

    # coverage closure: every registered query has (or gets this round) a
    # hard driver row — guarded so the test stays hermetic if the
    # CORRECTNESS artifacts aren't present
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = set(first50)
    for r in range(1, 21):
        path = os.path.join(repo, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(path):
            with open(path) as f:
                seen |= set(json.load(f))
    if len(seen) > 50:  # artifacts were present
        never = [n for n in catalog.queries() if n not in seen]
        assert not never, f"queries with no driver row in any round: {never}"

    # staleness closure: with this window counted as fresh, no catalog
    # entry's freshest driver row predates r08 (tightened from r07 this
    # round: the whole 37-entry r07 cohort holds slots above)
    freshest: dict[str, int] = {}
    for r in range(1, 21):
        path = os.path.join(repo, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(path):
            with open(path) as f:
                for name in json.load(f):
                    freshest[name] = r
    if freshest:
        stale = [
            n
            for n in catalog.queries()
            if freshest.get(n, 0) < 8 and n not in set(first50)
        ]
        assert not stale, f"pre-r08 rows left out of the window: {stale}"


def test_spread_narrow_only_touches_narrow_scans(spark):
    """catalog.spread_narrow: a 1-partition frame is spread to session
    parallelism; a frame at/above the 1/8-of-parallelism trigger is
    returned UNCHANGED (no extra exchange on wide production inputs)."""
    from bi_gcp_stitch_repl_spark.queries.catalog import spread_narrow

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    spread = spread_narrow(narrow.selectExpr("id", "id * 2 AS v"), "id")
    assert spread.rdd.getNumPartitions() == par
    assert spread.count() == 100
    wide_n = max(2, par // 8)
    wide = spark.range(100).repartition(wide_n)
    assert spread_narrow(wide) is wide  # untouched, not just same count


def test_changed_queries_hold_window_slots():
    """Window-staleness policy as code (r04 verdict #8): every catalog
    query whose implementation changed since the last window rotation —
    and every changed shared library module's canary queries — must hold
    a slot in the driver's first-50 window. Rotating = editing
    catalog._PRIORITY and regenerating tests/window_snapshot.json in the
    same commit (tools/update_window_snapshot.py)."""
    from tests import window_policy

    from bi_gcp_stitch_repl_spark.queries import catalog

    assert window_policy.load_snapshot() is not None, (
        "tests/window_snapshot.json missing — run "
        "tools/update_window_snapshot.py"
    )
    first50 = set(list(catalog.queries())[:50])
    changed_q, changed_libs = window_policy.changed_since_snapshot()
    stale = sorted(changed_q - first50)
    assert not stale, (
        f"queries changed since the window rotation but hold no driver-"
        f"window slot: {stale} — add them to catalog._PRIORITY and rerun "
        f"tools/update_window_snapshot.py"
    )
    lib_missing = {
        lib: sorted(set(window_policy.LIB_CANARIES[lib]) - first50)
        for lib in changed_libs
        if set(window_policy.LIB_CANARIES[lib]) - first50
    }
    assert not lib_missing, (
        f"library modules changed since the window rotation but their "
        f"canary queries hold no window slot: {lib_missing}"
    )
    # every canary name must exist (guards against catalog renames
    # silently voiding the policy)
    all_names = set(catalog.queries())
    unknown = {
        lib: [n for n in names if n not in all_names]
        for lib, names in window_policy.LIB_CANARIES.items()
        if any(n not in all_names for n in names)
    }
    assert not unknown, f"LIB_CANARIES names not in the catalog: {unknown}"
