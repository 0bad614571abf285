"""Misra-Gries frequent items: the mergeable-summary guarantees hold on
every partitioning — estimate never exceeds truth, deficit bounded by
n/(k+1), and every heavy hitter above the threshold survives the merge."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bi_gcp_stitch_repl_spark.functions.sketch import (
    mg_frequent_items,
    mg_partial_sketch,
)

# skewed streams: a few hot values over a long tail
_stream = st.lists(
    st.one_of(st.just(0), st.just(1), st.integers(0, 200)),
    min_size=1,
    max_size=400,
)


def test_partial_sketch_guarantee_plain_python():
    stream = [1] * 50 + [2] * 30 + list(range(100, 140))
    k = 8
    sk = mg_partial_sketch(stream, k)
    n = len(stream)
    from collections import Counter

    true = Counter(stream)
    for item, est in sk.items():
        assert est <= true[item]
        assert true[item] - est <= n / (k + 1)
    # every item above the error bound must be present
    for item, cnt in true.items():
        if cnt > n / (k + 1):
            assert item in sk


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=_stream, n_parts=st.integers(1, 6), k=st.integers(2, 16))
def test_distributed_merge_preserves_guarantees(spark, stream, n_parts, k):
    from collections import Counter

    df = spark.createDataFrame([(v,) for v in stream], "v long").repartition(
        n_parts
    )
    got = {r.item: r.est for r in mg_frequent_items(df, "v", k=k).collect()}
    true = Counter(stream)
    n = len(stream)
    bound = n / (k + 1)
    for item, est in got.items():
        assert est <= true[item], (item, est, true[item])
        assert true[item] - est <= bound, (item, est, true[item], bound)
    for item, cnt in true.items():
        if cnt > bound:
            assert item in got, (item, cnt, bound)


def test_string_items_and_null_ignored(spark):
    rows = [("a",)] * 20 + [("b",)] * 5 + [(None,)] * 3
    df = spark.createDataFrame(rows, "v string").repartition(2)
    got = {r.item: r.est for r in mg_frequent_items(df, "v", k=4).collect()}
    assert got.get("a", 0) >= 20 - 28 / 5
    assert None not in got


# --- pagerank ---------------------------------------------------------------


def test_pagerank_uniform_on_cycle(spark):
    """A directed cycle is perfectly symmetric: every node rank = 1/n."""
    from bi_gcp_stitch_repl_spark.functions.graph import pagerank

    n = 6
    e = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    ranks = {r.node: r.rank for r in pagerank(e, n_iter=15).collect()}
    for v in ranks.values():
        assert abs(v - 1.0 / n) < 1e-9
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_pagerank_star_center_dominates_and_mass_conserved(spark):
    """Spokes all link to the hub: the hub outranks every spoke; the hub
    is dangling, so its mass redistributes and total rank stays 1."""
    from bi_gcp_stitch_repl_spark.functions.graph import pagerank

    e = spark.createDataFrame(
        [(i, 0) for i in range(1, 8)], "src long, dst long"
    )
    ranks = {r.node: r.rank for r in pagerank(e, n_iter=20).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    hub = ranks[0]
    for spoke in range(1, 8):
        assert hub > ranks[spoke]


def test_pagerank_isolated_nodes_get_base_rank(spark):
    from bi_gcp_stitch_repl_spark.functions.graph import pagerank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,), (99,)], "node long")
    ranks = {r.node: r.rank for r in pagerank(e, n_iter=10, nodes=nodes).collect()}
    assert 99 in ranks and ranks[99] > 0
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


# --- pagerank_fixedpoint ------------------------------------------------------


def test_pagerank_fixedpoint_uniform_on_cycle(spark):
    """Directed cycle: perfect symmetry, every rank identical; total mass
    within the documented truncation drift of the 1e12 scale."""
    from bi_gcp_stitch_repl_spark.functions.graph import pagerank_fixedpoint

    n = 5
    e = spark.createDataFrame(
        [(i, (i + 1) % n, 1) for i in range(n)], "src long, dst long, w long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    ranks = {r.node: r.rank_fp for r in pagerank_fixedpoint(e, nodes).collect()}
    assert len(set(ranks.values())) == 1  # exact symmetry, exact arithmetic
    total = sum(ranks.values())
    assert 10**12 - total < 10**6  # floor-divide drift only


def test_pagerank_fixedpoint_weighted_hub_and_python_reference(spark):
    """Weighted edges: node 1 sends 3/4 of its mass to 2 and 1/4 to 3 —
    compared against a plain-Python integer replica of the update rule
    (same floor-divides, same order), which must match EXACTLY."""
    from bi_gcp_stitch_repl_spark.functions.graph import pagerank_fixedpoint

    edges = [(1, 2, 3), (1, 3, 1), (2, 1, 1), (3, 1, 1)]
    nodes = [1, 2, 3]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    nd = spark.createDataFrame([(i,) for i in nodes], "node long")
    got = {
        r.node: r.rank_fp
        for r in pagerank_fixedpoint(e, nd, n_iter=4).collect()
    }

    S, FS, n = 10**12, 10**6, len(nodes)
    W = {}
    for s, _, w in edges:
        W[s] = W.get(s, 0) + w
    frac = {(s, d): (w * FS) // W[s] for s, d, w in edges}
    rank = {v: S // n for v in nodes}
    base = (S * 15) // (100 * n)
    for _ in range(4):
        contrib = {v: 0 for v in nodes}
        for (s, d), f in frac.items():
            contrib[d] += (rank[s] * f) // FS
        dm = sum(rank[v] for v in nodes if v not in W) // n
        rank = {v: base + ((85 * (contrib[v] + dm)) // 100) for v in nodes}
    assert got == rank
    assert got[2] > got[3]  # the heavier edge wins


def test_pagerank_fixedpoint_dangling_and_validation(spark):
    from bi_gcp_stitch_repl_spark.functions.graph import pagerank_fixedpoint

    e = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    nd = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    ranks = {r.node: r.rank_fp for r in pagerank_fixedpoint(e, nd).collect()}
    # 2 receives 1's full mass plus the dangling share; 3 only the share
    assert ranks[2] > ranks[1] > 0 and ranks[3] > 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overflow"):
        pagerank_fixedpoint(e, nd, scale=10**15, frac_scale=10**6)
    # the damped product is damping_num*(contrib+dmn) ≤ 2*damping_num*scale:
    # scale=1e17/frac_scale=10 passes the product guard (1e18 < 2^63) and
    # would have passed the old damping_num*scale check (8.5e18 < 2^63),
    # but 2*85*1e17 = 1.7e19 wraps int64 in the distributed path
    with _pytest.raises(ValueError, match="overflow"):
        pagerank_fixedpoint(e, nd, scale=10**17, frac_scale=10)


def test_triangle_counts_k4_and_star(spark):
    """K4: 4 triangles, every node in exactly 3. A star plus one
    cross-edge: exactly the one closed triangle, leaf d absent (no
    zero-padding — the caller left-joins its node dimension)."""
    from bi_gcp_stitch_repl_spark.functions.graph import triangle_counts

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "x long, y long",
    )
    out = {r.node: r.n_triangles for r in triangle_counts(k4).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2)], "x long, y long"
    )
    out = {r.node: r.n_triangles for r in triangle_counts(star).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangle_counts_ignores_direction_dups_selfloops_nulls(spark):
    """The graph is treated simple + undirected: reversed duplicates,
    multi-edges, self-loops and NULL endpoints must not inflate counts,
    and a triangle-free path yields an empty frame."""
    from bi_gcp_stitch_repl_spark.functions.graph import triangle_counts

    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (2, 3), (1, 3), (2, 2), (None, 1), (3, None)],
        "x long, y long",
    )
    out = {r.node: r.n_triangles for r in triangle_counts(messy).collect()}
    assert out == {1: 1, 2: 1, 3: 1}
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "x long, y long")
    assert triangle_counts(path).count() == 0


def test_triangle_counts_string_keys(spark):
    """Key type is free (domain graphs are string-keyed): same counts."""
    from bi_gcp_stitch_repl_spark.functions.graph import triangle_counts

    e = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "c.com"), ("a.com", "c.com"),
         ("c.com", "d.com")],
        "x string, y string",
    )
    out = {r.node: r.n_triangles for r in triangle_counts(e).collect()}
    assert out == {"a.com": 1, "b.com": 1, "c.com": 1}


def test_clustering_coefficients_known_graphs(spark):
    """K4: every node coeff 1.0 (scale units). Triangle with a tail: the
    tailed corner has deg 3 and 1 triangle → 2·1e6//6 = 333333; the tail
    leaf deg 1 → 0; star center deg 3, no triangles → 0."""
    from bi_gcp_stitch_repl_spark.functions.graph import (
        clustering_coefficients,
    )

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "x long, y long",
    )
    out = {r.node: r for r in clustering_coefficients(k4).collect()}
    assert all(r.coeff_fp == 10**6 and r.degree == 3 for r in out.values())

    tailed = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "x long, y long"
    )
    out = {r.node: r for r in clustering_coefficients(tailed).collect()}
    assert (out[3].degree, out[3].n_triangles, out[3].coeff_fp) == (3, 1, 333333)
    assert (out[1].coeff_fp, out[4].coeff_fp) == (10**6, 0)

    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "x long, y long")
    out = {r.node: r for r in clustering_coefficients(star).collect()}
    assert out[0] == (0, 3, 0, 0) or (
        out[0].degree == 3 and out[0].n_triangles == 0 and out[0].coeff_fp == 0
    )
    assert all(r.coeff_fp == 0 for r in out.values())


def test_k_core_known_graphs(spark):
    """K4 with a pendant path: the 3-core is exactly the K4 (within-core
    degrees 3); the 2-core of a triangle+tail is the triangle; a pure
    path has NO 2-core — the peel cascades end-inward over multiple
    rounds until nothing is left."""
    from bi_gcp_stitch_repl_spark.functions.graph import k_core

    k4_tail = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b]
        + [(3, 4), (4, 5)],
        "x long, y long",
    )
    core3 = {r.node: r.degree for r in k_core(k4_tail, 3).collect()}
    assert core3 == {0: 3, 1: 3, 2: 3, 3: 3}

    tri_tail = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "x long, y long"
    )
    assert {r.node for r in k_core(tri_tail, 2).collect()} == {1, 2, 3}

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "x long, y long"
    )
    assert k_core(path, 2).count() == 0
    # k=1: every non-isolated node with its full degree
    assert {r.node: r.degree for r in k_core(path, 1).collect()} == {
        1: 1, 2: 2, 3: 2, 4: 2, 5: 1,
    }


def test_personalized_pagerank_seed_semantics(spark):
    """teleport=seeds: the seed's rank rises vs the uniform restart (it
    receives ALL restart mass), non-seeds keep only flow-through rank,
    both physical paths agree bit-for-bit, and an out-of-node-set
    teleport frame raises instead of silently zeroing the restart."""
    import pytest as _pytest

    from bi_gcp_stitch_repl_spark.functions.graph import pagerank_fixedpoint

    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (3, 1, 1), (3, 4, 1), (4, 4, 1)],
        "src long, dst long, w long",
    )
    nd = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "node long")
    seeds = spark.createDataFrame([(1,)], "node long")
    uni = {r.node: r.rank_fp for r in pagerank_fixedpoint(e, nd).collect()}
    drv = {
        r.node: r.rank_fp
        for r in pagerank_fixedpoint(e, nd, teleport=seeds).collect()
    }
    dist = {
        r.node: r.rank_fp
        for r in pagerank_fixedpoint(
            e, nd, teleport=seeds, driver_threshold=0
        ).collect()
    }
    assert drv == dist
    assert drv[1] > uni[1]  # seed absorbs all restart mass
    assert drv[4] < uni[4]  # the self-loop sink no longer gets restarts
    disjoint = spark.createDataFrame([(99,)], "node long")
    with _pytest.raises(ValueError, match="teleport"):
        pagerank_fixedpoint(e, nd, teleport=disjoint)


def test_bfs_hops_known_graphs(spark):
    """Path graph from one end: hops = position. Multi-source: min over
    seeds. Isolated seed keeps its 0 row; a disconnected component is
    absent; direction/dups/self-loops/NULL endpoints are ignored (the
    simple-undirected contract)."""
    from bi_gcp_stitch_repl_spark.functions.graph import bfs_hops

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "x long, y long"
    )
    one = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.hops for r in bfs_hops(path, one).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}

    both_ends = spark.createDataFrame([(1,), (5,)], "node long")
    out = {r.node: r.hops for r in bfs_hops(path, both_ends).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}

    messy = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (2, 2), (None, 3), (3, None), (8, 9)],
        "x long, y long",
    )
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    out = {r.node: r.hops for r in bfs_hops(messy, seeds).collect()}
    # 99 is an isolated seed (hops 0); the 8-9 component is unreachable
    assert out == {1: 0, 2: 1, 3: 2, 99: 0}

    # empty seed set -> empty result, converges immediately
    none = spark.createDataFrame([], "node long")
    assert bfs_hops(path, none).count() == 0


def test_sssp_weighted_known_graphs_and_guards(spark):
    """Two-hop route beats the weak direct edge (1→2→3 costs 2 vs the
    direct 10); direction is honored (no distance flows dst→src);
    duplicate (src, dst) rows keep the MIN cost; zero/negative weights
    raise; unreachable nodes absent, seeds explicit 0."""
    import pytest as _pytest

    from bi_gcp_stitch_repl_spark.functions.graph import sssp_weighted

    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 10), (4, 1, 1), (1, 2, 7)],
        "src long, dst long, w long",
    )
    one = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.dist for r in sssp_weighted(e, one).collect()}
    # 4 unreachable (edge points 4->1, never 1->4); dup (1,2) keeps w=1
    assert out == {1: 0, 2: 1, 3: 2}

    multi = spark.createDataFrame([(1,), (3,)], "node long")
    out = {r.node: r.dist for r in sssp_weighted(e, multi).collect()}
    assert out == {1: 0, 2: 1, 3: 0}

    bad = spark.createDataFrame([(1, 2, 0)], "src long, dst long, w long")
    with _pytest.raises(ValueError, match="positive"):
        sssp_weighted(bad, one)


def test_hits_fixedpoint_known_graph_and_guards(spark):
    """Bipartite toy: hub side (1, 2) never receives authority, authority
    side (10, 11) never earns hub score; node 2 out-weighs node 1 (extra
    weight to 11) so hub(2) > hub(1); the stray 10→99 edge makes 10 the
    only mixed-role node. Guards: zero/negative weights raise, scale
    below the node count raises (an all-zero start would silently yield
    an all-zero answer), scale² · max-weight overflow raises."""
    import pytest as _pytest

    from bi_gcp_stitch_repl_spark.functions.graph import hits_fixedpoint

    e = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 1), (2, 10, 1), (2, 11, 2), (10, 99, 1)],
        "src long, dst long, w long",
    )
    nd = spark.createDataFrame([(v,) for v in (1, 2, 10, 11, 99)], "node long")
    out = {r.node: (r.hub_fp, r.auth_fp) for r in hits_fixedpoint(e, nd).collect()}
    assert out[2][0] > out[1][0] > 0
    assert out[11][1] > out[10][1] > 0
    assert out[1][1] == out[2][1] == 0  # pure hubs
    assert out[11][0] == 0              # pure authority
    assert out[99][0] == 0 and out[99][1] > 0  # sink of the stray edge
    # L1 normalization: each side sums to ~scale (floor-divide sheds <1/node)
    assert sum(h for h, _ in out.values()) <= 10**6
    assert sum(a for _, a in out.values()) <= 10**6

    bad_w = spark.createDataFrame([(1, 2, 0)], "src long, dst long, w long")
    with _pytest.raises(ValueError, match="positive"):
        hits_fixedpoint(bad_w, nd)
    with _pytest.raises(ValueError, match="scale"):
        hits_fixedpoint(e, nd, scale=3)  # < node count
    huge = spark.createDataFrame(
        [(1, 2, 10**7)], "src long, dst long, w long"
    )
    with _pytest.raises(ValueError, match="overflow"):
        hits_fixedpoint(huge, nd, scale=10**6)  # 1e12 * 1e7 wraps int64


def test_clustering_coefficients_single_normalization(spark):
    """r9 verdict #1 / ADVICE: the triangle/coefficient composition must
    pay ONE simple-undirected normalization + checkpoint, not two copies
    of the same edge set. Probe = persistent-RDD delta: exactly 2 new
    checkpointed frames (the shared ``und`` + the oriented frame) — the
    pre-fix shape checkpointed 3."""
    from bi_gcp_stitch_repl_spark.functions.graph import (
        clustering_coefficients,
    )

    sc = spark.sparkContext
    k4_tail = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b] + [(3, 4)],
        "x long, y long",
    )
    def persistent_ids():
        ids = set()
        it = sc._jsc.sc().getPersistentRDDs().keysIterator()
        while it.hasNext():
            ids.add(it.next())
        return ids

    # probe on ADDED ids, not a size delta: the async ContextCleaner can
    # unpersist OTHER tests' stale checkpoints mid-probe (full-suite run
    # measured the set shrinking by 8 during this test), but it can only
    # REMOVE entries — additions during the call are ours alone
    before = persistent_ids()
    # force the distributed composition (r11 added a driver fast path;
    # this probe pins the DISTRIBUTED single-normalization contract)
    out = clustering_coefficients(k4_tail, driver_threshold=0)
    rows = {r.node: r.coeff_fp for r in out.collect()}
    assert rows[0] == 10**6 and rows[4] == 0  # semantics unchanged
    assert len(persistent_ids() - before) == 2
    # driver path: the normalization checkpoint is released once the
    # probe rows are in hand — nothing stays pinned
    before = persistent_ids()
    rows = {
        r.node: r.coeff_fp for r in clustering_coefficients(k4_tail).collect()
    }
    assert rows[0] == 10**6 and rows[4] == 0
    assert len(persistent_ids() - before) == 0


def test_k_core_one_fixpoint_action_and_bounded_checkpoints(spark):
    """r9 verdict #2 / ADVICE: (a) the per-round fixpoint check is ONE
    aggregate job (count + count_if in the same pass), pinned by the
    exact job count — with AQE off the peel costs 3 jobs/round (deg
    checkpoint, fixpoint agg, shrunken-edge checkpoint; none on the last
    round) + the init checkpoint + the collect: ``3·rounds + 1``; the
    old two-count shape cost 4/round. (b) superseded rounds' checkpoints
    are released: retained persistent RDDs stay O(1) — 3 frames (init
    edges, final deg, final edge set) — regardless of peel depth."""
    from bi_gcp_stitch_repl_spark.functions.graph import k_core

    sc = spark.sparkContext
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for n_nodes, rounds in ((5, 3), (9, 5)):
            # a k=2 peel of an n-node path strips both ends each round:
            # path5 converges in 3 rounds, path9 in 5
            path = spark.createDataFrame(
                [(i, i + 1) for i in range(1, n_nodes)], "x long, y long"
            )
            group = f"kcore_probe_{n_nodes}"
            before = sc._jsc.sc().getPersistentRDDs().size()
            sc.setJobGroup(group, "k_core fixpoint probe")
            try:
                # driver_threshold=0 forces the distributed peel (r11
                # added a driver fast path; <= 0 disables the dispatch
                # probe outright, so the pinned job count is unchanged)
                assert k_core(path, 2, driver_threshold=0).collect() == []
            finally:
                sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            assert jobs == 3 * rounds + 1, (n_nodes, jobs)
            retained = sc._jsc.sc().getPersistentRDDs().size() - before
            assert retained <= 3, (n_nodes, retained)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_pagerank_fixedpoint_empty_graph(spark):
    from bi_gcp_stitch_repl_spark.functions.graph import pagerank_fixedpoint

    e = spark.createDataFrame([], "src long, dst long, w long")
    nd = spark.createDataFrame([], "node long")
    assert pagerank_fixedpoint(e, nd).count() == 0


def test_pagerank_fixedpoint_input_contract(spark):
    """Positive-weight contract (floor-div vs DIV would diverge the two
    physical paths on negatives; zero out-weight divides by zero), the
    (src, dst, weight) arity error, and NULL-endpoint/NULL-node drops
    behaving identically on both paths."""
    import pytest as _pytest

    from bi_gcp_stitch_repl_spark.functions.graph import pagerank_fixedpoint

    nd = spark.createDataFrame([(1,), (2,)], "node long")
    bad = spark.createDataFrame([(1, 2, -1)], "src long, dst long, w long")
    with _pytest.raises(ValueError, match="positive"):
        pagerank_fixedpoint(bad, nd)
    with _pytest.raises(ValueError, match="src, dst, weight"):
        pagerank_fixedpoint(
            spark.createDataFrame([(1, 2)], "src long, dst long"), nd
        )
    e = spark.createDataFrame(
        [(1, 2, 1), (None, 2, 5), (1, None, 5)],
        "src long, dst long, w long",
    )
    nd_null = spark.createDataFrame([(1,), (2,), (None,)], "node long")
    for thr in (100_000, 0):  # driver path, then distributed path
        got = {
            r.node: r.rank_fp
            for r in pagerank_fixedpoint(
                e, nd_null, driver_threshold=thr
            ).collect()
        }
        clean = {
            r.node: r.rank_fp
            for r in pagerank_fixedpoint(
                spark.createDataFrame(
                    [(1, 2, 1)], "src long, dst long, w long"
                ),
                spark.createDataFrame([(1,), (2,)], "node long"),
                driver_threshold=thr,
            ).collect()
        }
        assert got == clean  # NULL edges/nodes dropped, both paths agree


def test_mmr_pool_hygiene_null_id_and_nan_rel(spark):
    """Dirty-corpus pool hygiene: NULL ids and NaN relevance are filtered
    before the driver greedy (NULL crashes sorted(); NaN sorts above
    every real score and wins every argmax)."""
    from bi_gcp_stitch_repl_spark.functions.rerank import mmr_rerank_scored

    scored = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0.9),
            (None, [1.0, 0.0], 0.95),
            (3, [0.0, 1.0], float("nan")),
            (4, [0.5, 0.5], 0.4),
        ],
        "_id long, _v array<double>, _rel double",
    )
    out = mmr_rerank_scored(scored, k=4, pool=8).collect()
    assert [r.vec_id for r in sorted(out, key=lambda r: r.rnk)] == [1, 4]


def test_label_propagation_known_graphs_and_guards(spark):
    """Two triangles + a bridge resolve to two communities; an isolated
    node keeps its own label; non-positive weights, negative n_iter and
    a missing weight column raise; the empty universe returns empty."""
    from bi_gcp_stitch_repl_spark.functions.graph import label_propagation

    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 1),
         (3, 4, 1), (4, 5, 1), (3, 5, 1), (2, 3, 1)],
        "src long, dst long, w long",
    )
    nd = spark.createDataFrame([(i,) for i in range(7)], "node long")
    out = {
        r.node: r.community for r in label_propagation(e, nd).collect()
    }
    assert len(out) == 7 and out[6] == 6  # isolated keeps own label
    left = {out[0], out[1], out[2]}
    right = {out[3], out[4], out[5]}
    assert len(left) == 1 and len(right) == 1 and left != right
    # weighted majority overrides unweighted degree: node 9's single
    # heavy edge to 0 beats its two unit edges into the {7, 8} pair
    ew = spark.createDataFrame(
        [(0, 9, 10), (7, 9, 1), (8, 9, 1), (7, 8, 5)],
        "src long, dst long, w long",
    )
    ndw = spark.createDataFrame([(v,) for v in (0, 7, 8, 9)], "node long")
    outw = {
        r.node: r.community
        for r in label_propagation(ew, ndw, n_iter=1).collect()
    }
    assert outw[9] == 0 and outw[7] == 8 and outw[8] == 7
    bad = spark.createDataFrame([(0, 1, 0)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="positive"):
        label_propagation(bad, nd)
    with pytest.raises(ValueError, match="n_iter"):
        label_propagation(e, nd, n_iter=-1)
    with pytest.raises(ValueError, match="weight"):
        label_propagation(e.select("src", "dst"), nd)
    assert label_propagation(e, nd.limit(0)).count() == 0


def test_modularity_known_graphs_and_guards(spark):
    """Two triangles + a bridge under the 2-community partition score
    the textbook Q = 2*(3/7 - (7/14)^2) = 0.357...; the all-in-one
    partition scores exactly 0 (the definition's calibration point);
    negative contributions (a community SPARSER than random) come out
    of the truncating integer divide identically in both engines;
    duplicate node labels, non-positive weights raise; the empty graph
    returns zero rows-with-zeros."""
    from bi_gcp_stitch_repl_spark.functions.graph import modularity

    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 1),
         (3, 4, 1), (4, 5, 1), (3, 5, 1), (2, 3, 1)],
        "src long, dst long, w long",
    )
    lab2 = spark.createDataFrame(
        [(i, 0 if i < 3 else 3) for i in range(6)],
        "node long, community long",
    )
    out = {r.community: r for r in modularity(e, lab2).collect()}
    assert out[0].w_in == 3 and out[0].d_tot == 7
    assert out[3].w_in == 3 and out[3].d_tot == 7
    # (2*3*14 - 49) * 1e6 div 196 = 178571 each
    assert out[0].contrib_fp == 178571 and out[3].contrib_fp == 178571
    lab1 = spark.createDataFrame(
        [(i, 0) for i in range(6)], "node long, community long"
    )
    (row,) = modularity(e, lab1).collect()
    assert row.contrib_fp == 0 and row.w_in == 7 and row.d_tot == 14
    # singleton partition: every contrib is NEGATIVE (no intra edges)
    labn = spark.createDataFrame(
        [(i, i) for i in range(6)], "node long, community long"
    )
    rows = modularity(e, labn).collect()
    assert all(r.contrib_fp < 0 for r in rows) and sum(
        r.w_in for r in rows
    ) == 0
    import pytest as _pytest

    dup = spark.createDataFrame(
        [(0, 0), (0, 1)], "node long, community long"
    )
    with _pytest.raises(ValueError, match="exactly one community"):
        modularity(e, dup)
    bad = spark.createDataFrame([(0, 1, 0)], "src long, dst long, w long")
    with _pytest.raises(ValueError, match="positive"):
        modularity(bad, lab2)
    empty = modularity(e.limit(0), lab2).collect()
    assert {r.community for r in empty} == {0, 3}
    assert all(r.contrib_fp == 0 and r.w_in == 0 for r in empty)


def test_random_walks_replica_and_distributed_pin(spark):
    """Deterministic hash-seeded walks on a known graph match an
    INDEPENDENT Python replica (recomputing each step's hash choice from
    the edge list — a different formulation than the library's driver
    loop); the forced-distributed loop is bit-identical to the driver
    fast path; every step lands on a neighbor of the previous node;
    duplicate/reverse input edges collapse; guards raise."""
    from bi_gcp_stitch_repl_spark.functions.graph import (
        WALK_A, WALK_B, WALK_C, WALK_D, WALK_E, WALK_P, random_walks,
    )

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 5), (1, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = random_walks(e, walk_len=3, num_walks=2).collect()

    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    nbr: dict = {}
    for u, v in und:
        nbr.setdefault(u, []).append(v)
        nbr.setdefault(v, []).append(u)
    nbr = {k: sorted(vs) for k, vs in nbr.items()}
    expect = set()
    for start in nbr:
        for wid in range(2):
            cur = start
            expect.add((start, wid, 0, cur))
            for t in (1, 2, 3):
                h1 = (
                    (cur % WALK_P) * WALK_A + t * WALK_B
                    + wid * WALK_C + WALK_D
                ) % WALK_P
                cur = nbr[cur][((h1 * h1 + WALK_E) % WALK_P) % len(nbr[cur])]
                expect.add((start, wid, t, cur))
    got = {(r.start, r.wid, r.step, r.node) for r in out}
    assert got == expect and len(out) == len(expect) == 6 * 2 * 4

    dist = random_walks(e, walk_len=3, num_walks=2, driver_threshold=0)
    drows = dist.collect()
    assert {(r.start, r.wid, r.step, r.node) for r in drows} == expect
    byw: dict = {}
    for r in drows:
        byw.setdefault((r.start, r.wid), {})[r.step] = r.node
    for steps in byw.values():
        for t in (1, 2, 3):
            assert steps[t] in nbr[steps[t - 1]]

    with pytest.raises(ValueError, match="walk_len"):
        random_walks(e, walk_len=-1)
    with pytest.raises(ValueError, match="num_walks"):
        random_walks(e, num_walks=0)


def test_walk_skipgrams_known_and_selfjoin_pin(spark):
    """Skip-gram pair counts from walk trajectories: known-answer on a
    hand-checked two-walk set, pinned against an INDEPENDENT self-join
    formulation (step-range join on the trajectory key — a different
    shape than the library's row-local array fan-out), symmetric by
    construction, windows clamp at trajectory edges, guards raise."""
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.functions.graph import walk_skipgrams

    rows = [
        # walk (0, 0): 10 -> 11 -> 12 -> 10
        (0, 0, 0, 10), (0, 0, 1, 11), (0, 0, 2, 12), (0, 0, 3, 10),
        # walk (5, 1): 20 -> 21
        (5, 1, 0, 20), (5, 1, 1, 21),
    ]
    w = spark.createDataFrame(rows, "start long, wid int, step int, node long")

    got = {
        (r.center, r.context): r.cnt
        for r in walk_skipgrams(w, window=1).collect()
    }
    expect = {
        (10, 11): 1, (11, 10): 1, (11, 12): 1, (12, 11): 1,
        (12, 10): 1, (10, 12): 1,
        (20, 21): 1, (21, 20): 1,
    }
    assert got == expect

    # window=2 via the independent self-join replica
    for win in (2, 3):
        lib = {
            (r.center, r.context): r.cnt
            for r in walk_skipgrams(w, window=win).collect()
        }
        a = w.selectExpr("start", "wid", "step AS si", "node AS center")
        b = w.selectExpr("start AS s2", "wid AS w2", "step AS sj",
                         "node AS context")
        rep_rows = (
            a.join(
                b,
                (a.start == b.s2) & (a.wid == b.w2)
                & (F.col("si") != F.col("sj"))
                & (F.abs(F.col("si") - F.col("sj")) <= win),
            )
            .groupBy("center", "context")
            .count()
            .collect()
        )
        rep = {(r.center, r.context): r["count"] for r in rep_rows}
        assert lib == rep
        # symmetry: every (a,b) has the mirror (b,a) with equal count
        assert all(lib[(b_, a_)] == c for (a_, b_), c in lib.items())

    with pytest.raises(ValueError, match="window"):
        walk_skipgrams(w, window=0)
    with pytest.raises(ValueError, match="missing column"):
        walk_skipgrams(w.drop("wid"))


def test_node2vec_walks_replica_distributed_pin_and_bias(spark):
    """Second-order biased walks: known graph matches an INDEPENDENT
    Python replica (recomputing class weights and the cumulative pick
    from the edge list); forced-distributed loop bit-identical to the
    driver fast path; step-1 uniformity (prev == start makes every
    candidate the w_common class, so changing w_return/w_out does not
    move step 1); every step lands on a neighbor; guards raise."""
    from pyspark.sql import functions as F  # noqa: F401

    from bi_gcp_stitch_repl_spark.functions.graph import (
        WALK_A, WALK_B, WALK_C, WALK_D, WALK_E, WALK_F, WALK_P,
        node2vec_walks,
    )

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 5), (2, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    params = dict(walk_len=3, num_walks=2, w_return=1, w_common=4, w_out=2)
    out = node2vec_walks(e, **params).collect()

    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    nbr: dict = {}
    for u, v in und:
        nbr.setdefault(u, []).append(v)
        nbr.setdefault(v, []).append(u)
    nbr = {k: sorted(vs) for k, vs in nbr.items()}

    def replica(w_return, w_common, w_out, walk_len=3, num_walks=2):
        got = set()
        for start in nbr:
            for wid in range(num_walks):
                prev, cur = start, start
                got.add((start, wid, 0, cur))
                for t in range(1, walk_len + 1):
                    ws = [
                        w_return if x == prev
                        else w_common if (min(prev, x), max(prev, x)) in und
                        else w_out
                        for x in nbr[cur]
                    ]
                    h2 = (
                        ((cur % WALK_P) * WALK_A) % WALK_P
                        + ((prev % WALK_P) * WALK_F) % WALK_P
                        + t * WALK_B + wid * WALK_C + WALK_D
                    ) % WALK_P
                    r = ((h2 * h2 + WALK_E) % WALK_P) % sum(ws)
                    cum = 0
                    for x, wx in zip(nbr[cur], ws):
                        cum += wx
                        if r < cum:
                            prev, cur = cur, x
                            break
                    got.add((start, wid, t, cur))
        return got

    got = {(r.start, r.wid, r.step, r.node) for r in out}
    assert got == replica(1, 4, 2)
    assert len(out) == 6 * 2 * 4

    dist = node2vec_walks(e, driver_threshold=0, **params).collect()
    assert {(r.start, r.wid, r.step, r.node) for r in dist} == got
    byw: dict = {}
    for r in dist:
        byw.setdefault((r.start, r.wid), {})[r.step] = r.node
    for key, steps in byw.items():
        assert steps[0] == key[0]
        for t in (1, 2, 3):
            assert steps[t] in nbr[steps[t - 1]]

    # step 1 is class-uniform: w_return/w_out cannot move it (prev==start
    # makes every candidate w_common); later steps CAN move
    alt = replica(7, 4, 9)
    assert {x for x in got if x[2] <= 1} == {x for x in alt if x[2] <= 1}

    with pytest.raises(ValueError, match="class weights"):
        node2vec_walks(e, w_return=0)
    with pytest.raises(ValueError, match="walk_len"):
        node2vec_walks(e, walk_len=-1)


def test_walk_skipgrams_duckdb_oracle_parity(spark):
    """Cross-engine pin ahead of the r12 catalog registration: the
    skip-gram aggregation over REAL library-generated walks must match a
    DuckDB relational twin (step-range self-join + count over the same
    walk rows — the formulation the x_walk_skipgrams oracle will use).
    Walks come from random_walks on a seeded 60-edge graph, so the
    trajectories exercised are the production operator's own output."""
    import duckdb

    from bi_gcp_stitch_repl_spark.functions.graph import (
        random_walks,
        walk_skipgrams,
    )

    import random as _random

    rng = _random.Random(411)
    edges = {(rng.randrange(20), rng.randrange(20)) for _ in range(60)}
    e = spark.createDataFrame(
        sorted(edges), "src long, dst long"
    )
    walks = random_walks(e, walk_len=5, num_walks=3)
    got = {
        (r.center, r.context): r.cnt
        for r in walk_skipgrams(walks, window=2).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE walks(start BIGINT, wid INT, step INT, node BIGINT)")
    con.executemany(
        "INSERT INTO walks VALUES (?, ?, ?, ?)",
        [(r.start, r.wid, r.step, r.node) for r in walks.collect()],
    )
    oracle = {
        (c, x): n
        for c, x, n in con.execute(
            """
            SELECT a.node AS center, b.node AS context, COUNT(*) AS cnt
            FROM walks a JOIN walks b
              ON a.start = b.start AND a.wid = b.wid
             AND a.step <> b.step AND abs(a.step - b.step) <= 2
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == oracle and len(got) > 10


def test_node2vec_walks_duckdb_oracle_parity(spark):
    """Cross-engine pin ahead of the r12 catalog registration: the full
    second-order walk replayed RELATIONALLY in DuckDB (per step: fan-out
    join to cur's neighbors, classification LEFT JOIN against canonical
    edges, window cumulative-sum pick) must reproduce node2vec_walks
    step for step on a seeded graph. The step hash's linear pass comes
    from graph.py's _walk_h2_sql — one spelling, two engines."""
    import random as _random

    import duckdb

    from bi_gcp_stitch_repl_spark.functions.graph import (
        WALK_E, WALK_P, _walk_h2_sql, node2vec_walks,
    )

    rng = _random.Random(1107)
    edges = sorted({(rng.randrange(16), rng.randrange(16)) for _ in range(48)})
    e = spark.createDataFrame(edges, "src long, dst long")
    WL, NW, WR, WC, WO = 3, 2, 1, 4, 2
    got = {
        (r.start, r.wid, r.step, r.node)
        for r in node2vec_walks(
            e, walk_len=WL, num_walks=NW,
            w_return=WR, w_common=WC, w_out=WO,
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE edges(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edges)
    head = f"""
WITH und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM edges WHERE src <> dst
),
adj AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM und
  UNION ALL SELECT v AS node, u AS nbr FROM und
),
w0 AS MATERIALIZED (
  SELECT n.node AS start, CAST(ws.wid AS INTEGER) AS wid,
         n.node AS prev, n.node AS cur
  FROM (SELECT DISTINCT node FROM adj) n
  CROSS JOIN (SELECT UNNEST(range({NW})) AS wid) ws
)"""
    steps = []
    for t in range(1, WL + 1):
        h2 = _walk_h2_sql(
            "CAST(s.prev AS BIGINT)", "CAST(s.cur AS BIGINT)", t,
            "CAST(s.wid AS BIGINT)",
        )
        steps.append(f""",
c{t} AS MATERIALIZED (
  SELECT w.start, w.wid, w.prev, w.cur, a.nbr,
         CASE WHEN a.nbr = w.prev THEN {WR}
              WHEN e.u IS NOT NULL THEN {WC}
              ELSE {WO} END AS wgt
  FROM w{t-1} w
  JOIN adj a ON w.cur = a.node
  LEFT JOIN und e ON LEAST(w.prev, a.nbr) = e.u
                 AND GREATEST(w.prev, a.nbr) = e.v
),
s{t} AS MATERIALIZED (
  SELECT *,
         SUM(wgt) OVER (PARTITION BY start, wid ORDER BY nbr) AS cum,
         SUM(wgt) OVER (PARTITION BY start, wid) AS tot
  FROM c{t}
),
w{t} AS MATERIALIZED (
  SELECT start, wid, cur AS prev, nbr AS cur FROM (
    SELECT s.*, ((({h2}) * ({h2}) + {WALK_E}) % {WALK_P}) % s.tot AS r
    FROM s{t} s
  ) WHERE cum - wgt <= r AND r < cum
)""")
    unions = "\n  UNION ALL\n".join(
        f"  SELECT start, wid, CAST({t} AS INTEGER) AS step, cur AS node"
        f" FROM w{t}"
        for t in range(WL + 1)
    )
    rows = con.execute(head + "".join(steps) + f"\n{unions}").fetchall()
    assert {tuple(r) for r in rows} == got and len(got) > 50


def test_modularity_driver_matches_distributed(spark):
    """The r11 driver fast path (probe-collected Q decomposition) must be
    bit-identical to the distributed aggregations — including negative
    contributions (truncate-toward-zero divide), a NULL community label
    (never equi-joins → (c, 0, 0, 0) row), and communities with no
    edges."""
    from bi_gcp_stitch_repl_spark.functions.graph import modularity

    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 1),
         (3, 4, 1), (4, 5, 1), (3, 5, 1), (2, 3, 1), (5, 6, 2)],
        "src long, dst long, w long",
    )
    lab = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5), (6, None), (7, 9)],
        "node long, community long",
    )
    key = lambda t: (t[0] is None, t[0])  # noqa: E731 — NULL community row
    drv = sorted(map(tuple, modularity(e, lab).collect()), key=key)
    dist = sorted(
        map(tuple, modularity(e, lab, driver_threshold=0).collect()), key=key
    )
    assert drv == dist
    # singleton partition: every contrib negative, identical both paths
    labn = spark.createDataFrame(
        [(i, i) for i in range(7)], "node long, community long"
    )
    drv = sorted(map(tuple, modularity(e, labn).collect()))
    dist = sorted(map(tuple, modularity(e, labn, driver_threshold=0).collect()))
    assert drv == dist and all(r[3] < 0 for r in drv)


def test_cc_driver_singleton_attach_matches_distributed(spark):
    """The r11 driver-side singleton attach (full label list as one local
    relation when the node set also fits the probe) must emit exactly the
    labels ∪ anti-join-singletons set — including a NULL node id, which
    the anti-join keeps as a (NULL, NULL) singleton."""
    from bi_gcp_stitch_repl_spark.functions.graph import connected_components

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    nodes = spark.createDataFrame(
        [(1,), (2,), (3,), (10,), (11,), (42,), (99,), (None,)],
        "node long",
    )
    drv = sorted(
        map(tuple, connected_components(e, nodes=nodes).collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    dist = sorted(
        map(
            tuple,
            connected_components(e, nodes=nodes, driver_threshold=0).collect(),
        ),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert drv == dist
    assert (None, None) in drv and (42, 42) in drv


def test_graph_driver_paths_match_distributed_r11(spark):
    """The r11 driver fast paths (triangle_counts, clustering_
    coefficients, k_core, bfs_hops, sssp_weighted) must be row-identical
    to their forced-distributed twins on graphs that exercise hubs,
    tails, unreachable nodes, string keys and weighted corridors."""
    from bi_gcp_stitch_repl_spark.functions.graph import (
        bfs_hops,
        clustering_coefficients,
        k_core,
        sssp_weighted,
        triangle_counts,
    )

    e = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b]
        + [(3, 4), (4, 5), (5, 6), (6, 4), (7, 8)],
        "x long, y long",
    )
    for fn, kw in (
        (triangle_counts, {}),
        (clustering_coefficients, {}),
        (lambda d, **k: k_core(d, 2, **k), {}),
    ):
        drv = sorted(map(tuple, fn(e, **kw).collect()))
        dist = sorted(map(tuple, fn(e, driver_threshold=0, **kw).collect()))
        assert drv == dist and drv, fn
    # string keys through the driver triangle path
    es = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], "x string, y string"
    )
    drv = sorted(map(tuple, triangle_counts(es).collect()))
    dist = sorted(map(tuple, triangle_counts(es, driver_threshold=0).collect()))
    assert drv == dist == [("a", 1), ("b", 1), ("c", 1)]
    # BFS: seeds incl. an isolated source (hops 0) and unreachable nodes
    seeds = spark.createDataFrame([(0,), (42,)], "node long")
    drv = sorted(map(tuple, bfs_hops(e, seeds).collect()))
    dist = sorted(
        map(tuple, bfs_hops(e, seeds, driver_threshold=0).collect())
    )
    assert drv == dist and (42, 0) in drv and (7, 1) not in dict(drv).items()
    # SSSP over the directed weighted spelling
    ew = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 1), (0, 2, 9), (2, 3, 1), (9, 9, 7), (4, 0, 2)],
        "src long, dst long, w long",
    )
    drv = sorted(map(tuple, sssp_weighted(ew, seeds).collect()))
    dist = sorted(
        map(tuple, sssp_weighted(ew, seeds, driver_threshold=0).collect())
    )
    assert drv == dist and dict(drv)[2] == 6 and dict(drv)[3] == 7
    import pytest as _pytest

    bad = spark.createDataFrame([(0, 1, 0)], "src long, dst long, w long")
    with _pytest.raises(ValueError, match="positive"):
        sssp_weighted(bad, seeds)


def test_fused_und_probe_matches_simple_undirected(spark):
    """r11-opt: _und_probe's driver-path Python normalization must emit
    exactly the _simple_undirected row set (least/greatest, NULL/self-loop
    drop, dedup) for every dispatch-eligible endpoint type — and the
    VALUES-local input branch must probe without building a checkpoint."""
    from bi_gcp_stitch_repl_spark.functions.graph import (
        _simple_undirected,
        _und_probe,
    )

    fixtures = [
        (
            [(1, 2), (2, 1), (3, 3), (None, 4), (5, None), (2, 7), (7, 2)],
            "src long, dst long",
        ),
        (
            [("b", "a"), ("a", "b"), ("z", "z"), ("m", "q")],
            "src string, dst string",
        ),
    ]
    for rows, ddl in fixtures:
        df = spark.createDataFrame(rows, ddl)
        und, urows, utype = _und_probe(df, 100_000)
        assert und is None and urows is not None
        got = sorted((r.u, r.v) for r in urows)
        want = sorted(
            map(tuple, _simple_undirected(df).collect())
        )
        assert got == want, (got, want)
    # VALUES-local input: zero jobs scheduled by the probe
    sc = spark.sparkContext
    vals = spark.sql(
        "SELECT * FROM VALUES (1, 2), (2, 1), (4, 4) AS t(src, dst)"
    )
    before = len(sc.statusTracker().getJobIdsForGroup() or [])
    und, urows, _ = _und_probe(vals, 100_000)
    after = len(sc.statusTracker().getJobIdsForGroup() or [])
    assert und is None and sorted((r.u, r.v) for r in urows) == [(1, 2)]
    assert after == before, "local-relation probe must schedule no job"


def test_sparsify_driver_path_matches_distributed(spark):
    """r11-opt: _sparsify_mean_relative's probe-based driver path must
    emit exactly the distributed cross-multiplication filter's rows
    (incl. NULL-weight drop), for both keep_weight spellings."""
    from bi_gcp_stitch_repl_spark.queries.relational_ext import (
        _sparsify_mean_relative,
    )

    rows = [
        (1, 2, 10),
        (2, 3, 1),
        (3, 4, 7),
        (4, 5, None),
        (5, 5, 2),
        (6, 7, 4),
    ]
    df = spark.createDataFrame(rows, "src int, dst int, w long")
    for kw in (False, True):
        drv = sorted(
            map(tuple, _sparsify_mean_relative(df, keep_weight=kw).collect())
        )
        dist = sorted(
            map(
                tuple,
                _sparsify_mean_relative(
                    df, keep_weight=kw, driver_threshold=0
                ).collect(),
            )
        )
        assert drv == dist and drv, (kw, drv, dist)


def test_lpa_modularity_local_input_fast_path(spark):
    """r11-opt: the fully-local LPA/modularity fast path (VALUES edge
    input + Python weighted aggregate) must be bit-identical to the
    forced-distributed loops, and _wund_rows_py must refuse (None) any
    pair sum outside int64 so the engine's ANSI overflow semantics are
    preserved by the distributed fallback."""
    from bi_gcp_stitch_repl_spark.functions.graph import (
        _wund_rows_py,
        label_propagation,
        modularity,
    )

    e = spark.sql(
        "SELECT * FROM VALUES"
        " (1L, 2L, 5L), (2L, 1L, 3L), (2L, 3L, 1L), (3L, 4L, 9L),"
        " (4L, 4L, 7L), (5L, 6L, 2L), (9L, 1L, 4L)"
        " AS t(src, dst, w)"
    )
    nd = spark.createDataFrame([(v,) for v in range(1, 8)], "node long")
    drv = sorted(map(tuple, label_propagation(e, nd).collect()))
    dist = sorted(
        map(tuple, label_propagation(e, nd, driver_threshold=0).collect())
    )
    assert drv == dist and drv
    lab = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 11), (4, 11), (5, 12), (6, 12)],
        "node long, community long",
    )
    drv = sorted(map(tuple, modularity(e, lab).collect()))
    dist = sorted(map(tuple, modularity(e, lab, driver_threshold=0).collect()))
    assert drv == dist and drv
    # the in-universe restriction: node 9's edge must not contribute
    assert all(r is not None for r in drv)
    # overflow refusal (int64 boundary): Python would happily sum past
    # 2^63 — the helper must return None instead
    big = 2**62
    rows = [(1, 2, big), (2, 1, big), (3, 4, 1)]
    assert _wund_rows_py(rows, None) is None
    assert _wund_rows_py([(1, 2, 5), (2, 1, None)], None) == [
        __import__(
            "bi_gcp_stitch_repl_spark.functions.graph", fromlist=["_WUndRow"]
        )._WUndRow(1, 2, 5)
    ]


def test_null_weight_fast_paths_match_distributed_r12(spark):
    """r12-opt (r11 advice): all-NULL-weight pairs reach the weighted
    operators as w=NULL rows. The driver fast paths must not crash on
    them (Python None arithmetic) — they route to the distributed
    spelling, whose SQL NULL-skipping MIN/SUM define the behavior — so
    fast-path and forced-distributed results stay identical."""
    from bi_gcp_stitch_repl_spark.functions.graph import (
        hits_fixedpoint,
        label_propagation,
        modularity,
        pagerank_fixedpoint,
    )

    # (5,6) carries only NULL weights -> the canonical aggregate emits
    # w=NULL for that pair; every other weight is positive
    e = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (5, 6, None), (6, 5, None), (3, 1, 2)],
        "src long, dst long, w long",
    )
    nd = spark.createDataFrame([(v,) for v in range(1, 7)], "node long")
    lab = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 11), (5, 12), (6, 12)],
        "node long, community long",
    )
    for fast, slow in [
        (
            pagerank_fixedpoint(e, nd),
            pagerank_fixedpoint(e, nd, driver_threshold=0),
        ),
        (
            hits_fixedpoint(e, nd),
            hits_fixedpoint(e, nd, driver_threshold=0),
        ),
        (
            label_propagation(e, nd),
            label_propagation(e, nd, driver_threshold=0),
        ),
        (modularity(e, lab), modularity(e, lab, driver_threshold=0)),
    ]:
        got = sorted(map(tuple, fast.collect()))
        want = sorted(map(tuple, slow.collect()))
        assert got == want and got, (got, want)
    # the LPA fully-local (VALUES-input) fast path takes the same fallback
    ev = spark.sql(
        "SELECT * FROM VALUES (1L, 2L, 5L), (5L, 6L, CAST(NULL AS BIGINT))"
        " AS t(src, dst, w)"
    )
    got = sorted(map(tuple, label_propagation(ev, nd).collect()))
    want = sorted(
        map(tuple, label_propagation(ev, nd, driver_threshold=0).collect())
    )
    assert got == want and got


def test_pagerank_teleport_probe_bounded_r12(spark):
    """r12-opt (r11 advice): the personalized-PageRank driver path must
    PROBE the teleport set instead of collecting it unbounded — a seed
    list above the dispatch bound falls back to the distributed
    semi-join path with identical results."""
    from bi_gcp_stitch_repl_spark.functions.graph import pagerank_fixedpoint

    e = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (3, 1, 2)], "src long, dst long, w long"
    )
    nd = spark.createDataFrame([(v,) for v in range(1, 4)], "node long")
    # teleport cardinality (20) exceeds driver_threshold (8) while the
    # edge/node frames fit: the driver path must decline, and the
    # distributed branch must produce the same ranks as threshold=0
    tel = spark.range(1, 21).selectExpr("id AS node")
    got = sorted(
        map(
            tuple,
            pagerank_fixedpoint(e, nd, teleport=tel, driver_threshold=8)
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            pagerank_fixedpoint(e, nd, teleport=tel, driver_threshold=0)
            .collect(),
        )
    )
    assert got == want and got


def test_und_probe_skips_raw_checkpoint_on_nonaggregate_r12(spark):
    """r12-opt (r11 verdict #3): _und_probe must not eagerly checkpoint
    a NON-aggregate upstream — above the dispatch bound that would
    materialize the full pre-dedup edge list in executor storage just to
    decide "distributed". Aggregate upstreams (bounded output) keep the
    checkpoint; both dispatch outcomes stay correct."""
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.functions.graph import (
        _plan_output_aggregated,
        _simple_undirected,
        _und_probe,
    )

    sc = spark.sparkContext
    raw = spark.createDataFrame(
        [(i % 7, (i * 3) % 7) for i in range(200)], "src long, dst long"
    )
    assert not _plan_output_aggregated(raw)
    agg = raw.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w")).select(
        "src", "dst"
    )
    assert _plan_output_aggregated(agg)
    # non-aggregate input ABOVE the bound: the probe must leave no new
    # persisted RDD behind beyond the normalized checkpoint itself
    before = sc._jsc.sc().getPersistentRDDs().size()
    und, urows, _ = _und_probe(raw, 5)
    after = sc._jsc.sc().getPersistentRDDs().size()
    assert urows is None or len(urows) <= 5
    assert after - before <= 1, "raw pre-dedup edge list was checkpointed"
    got = sorted(map(tuple, und.collect()))
    want = sorted(map(tuple, _simple_undirected(raw).collect()))
    assert got == want
    # below the bound: Python normalization, rows in hand, nothing kept
    before = sc._jsc.sc().getPersistentRDDs().size()
    und2, urows2, _ = _und_probe(raw, 100_000)
    after = sc._jsc.sc().getPersistentRDDs().size()
    assert und2 is None and sorted((r.u, r.v) for r in urows2) == want
    assert after == before


def test_sssp_local_input_fast_path_r12(spark):
    """r12-opt: sssp_weighted's fully-local fast path (VALUES edge input
    collected job-free, min-aggregation + Bellman-Ford in Python) must be
    bit-identical to the forced-distributed loop, keep the positive-weight
    guard, and route NULL weights to the engine."""
    from bi_gcp_stitch_repl_spark.functions.graph import sssp_weighted

    e = spark.sql(
        "SELECT * FROM VALUES"
        " (1L, 2L, 5L), (1L, 2L, 3L), (2L, 3L, 1L), (3L, 3L, 9L),"
        " (CAST(NULL AS BIGINT), 4L, 2L), (4L, 5L, 7L)"
        " AS t(src, dst, w)"
    )
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = sorted(map(tuple, sssp_weighted(e, seeds).collect()))
    want = sorted(
        map(tuple, sssp_weighted(e, seeds, driver_threshold=0).collect())
    )
    assert got == want and got
    # min-aggregated duplicate edge: (1,2) keeps cost 3
    assert dict(got)[2] == 3
    import pytest as _pytest

    bad = spark.sql("SELECT * FROM VALUES (1L, 2L, 0L) AS t(src, dst, w)")
    with _pytest.raises(ValueError, match="positive"):
        sssp_weighted(bad, seeds)
    # NULL weight: identical to the forced-distributed behavior
    en = spark.sql(
        "SELECT * FROM VALUES (1L, 2L, 4L),"
        " (2L, 3L, CAST(NULL AS BIGINT)) AS t(src, dst, w)"
    )
    got = sorted(map(tuple, sssp_weighted(en, seeds).collect()))
    want = sorted(
        map(tuple, sssp_weighted(en, seeds, driver_threshold=0).collect())
    )
    assert got == want and got
