"""Distributed connected components (dup-cluster resolution).

Near-duplicate detection (functions.dedup, queries.extensions) produces
PAIRS; a training-data pipeline needs CLUSTERS — if A~B and B~C, all
three are one duplicate group even when A~C was never emitted, and one
representative per group survives. That closure is connected components
over the candidate-pair graph.

Implementation: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log n) rounds on any graph, each round two hash-shuffle jobs
(groupBy-min + join), no driver-side graph state, no vertex ever holds
more than its neighbor list implicitly (we use groupBy().min() + join
rather than collect_list, so even a star center never materializes its
adjacency in one task). This is the construction that survives
billions of edges; simple min-label propagation needs O(diameter)
rounds and dies on long chains.
"""

from __future__ import annotations

import math
from collections import namedtuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's minimum neighborhood node."""
    sym = _symmetrize(edges)
    mins = sym.groupBy("src").agg(F.min("dst").alias("_m"))
    mins = mins.select("src", F.least("_m", F.col("src")).alias("_m"))
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame, pre_oriented: bool = False) -> DataFrame:
    """Orient edges to the larger endpoint, connect all smaller neighbors
    (and the center) to the minimum. ``pre_oriented=True`` skips the
    symmetrize+filter when the input already satisfies dst < src —
    _large_star's output does by construction (_m <= src < dst), and
    re-symmetrizing it paid a distinct() exchange over 2E rows on every
    CC round for rows the filter immediately discarded."""
    oriented = (
        edges if pre_oriented else _symmetrize(edges).filter(F.col("dst") < F.col("src"))
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("_m"))
    nbr_edges = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    )
    center_edges = mins.select("src", F.col("_m").alias("dst"))
    return (
        nbr_edges.unionByName(center_edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 30,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(node, component) labeling; component = min node id in the component.

    ``edges``: two-column DataFrame (any names; first = src, second = dst).
    ``nodes``: optional one-column DataFrame of all node ids — isolated
    nodes (no edges) come back as singleton components. Each iteration is
    localCheckpoint()ed: iterative algorithms otherwise stack an
    unbounded lineage that blows up planning time and executor stacks.

    **Adaptive physical strategy** (the same runtime branch discipline as
    the Jaccard bitset kernel): after dedup, if the edge list fits
    ``driver_threshold`` rows it is union-found ON THE DRIVER and the
    labels broadcast back — a dup-pair graph is usually tiny next to its
    corpus (near-dup density, not corpus size), and the distributed
    alternating-star loop costs ~4 shuffle rounds of pure scheduling
    overhead on a 300-edge graph. Above the threshold the O(log n)
    large-star/small-star rounds run unchanged; results are identical
    (min-label semantics both paths).
    """
    if max_iter < 1:
        # with zero rounds the post-loop labeling would run on raw
        # (non-fixpoint) edges and the non-convergence guard below could
        # never fire (changed starts False) — exactly the silent
        # split-component failure that guard exists to prevent
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    src, dst = edges.columns[:2]
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # widen BOTH id columns to their common type up front: the driver
    # fast path builds its label schema from one column's type, so an
    # (int, long) edge frame would overflow the narrow field there while
    # the distributed path's unions silently widened — same inputs must
    # take the same types on both paths
    common = e.select(F.array("src", "dst").alias("_x")).schema[0].dataType.elementType
    e = e.select(F.col("src").cast(common).alias("src"), F.col("dst").cast(common).alias("dst"))
    # a node appearing ONLY in self-loop edges must still be labeled (a
    # singleton component): the src != dst filter below would otherwise
    # erase it from both label paths and the output would silently drop
    # it — fold self-loop-only nodes into the ``nodes`` frame before the
    # filter so the existing isolated-node path covers them
    loop_only = e.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("node")
    )
    if nodes is not None:
        n0, = nodes.columns[:1]
        nodes = nodes.select(F.col(n0).cast(common).alias("node")).unionByName(
            loop_only
        ).distinct()
    else:
        # built BEFORE the src != dst filter, so loop-only nodes are in —
        # taken unconditionally: the former "probe for self-loops first"
        # optimization ran an EAGER limit(1).count() job over the
        # un-checkpointed edge frame on every call (a full upstream
        # re-evaluation) to sometimes save one bounded anti-join on the
        # node set — a bad trade at any scale
        nodes = e.select(F.col("src").alias("node")).unionByName(
            e.select(F.col("dst").alias("node"))
        ).distinct()
    e = e.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=True)
    # one-job dispatch probe: when the edge list fits, the probe rows ARE
    # the union-find input (the old count()-then-collect() pair was two
    # driver round-trips over the same checkpointed frame)
    erows = (
        _probe_rows(e, driver_threshold)
        if driver_threshold > 0
        else None
    )
    if erows is not None:
        return _cc_driver(erows, e, nodes, driver_threshold)
    changed = False
    for _ in range(max_iter):
        after = _small_star(_large_star(e), pre_oriented=True).localCheckpoint(
            eager=True
        )
        # Fixpoint: both star passes are monotone (they never merge distinct
        # components or split one), so edge-set equality means convergence.
        # Checked as (equal size) ∧ (after ⊆ e): multiset inclusion plus
        # equal cardinality is equality — one exceptAll job instead of two
        # (both run on the checkpointed edge set, but each is a full
        # set-difference shuffle; rounds dominate wall time on small
        # graphs).
        changed = after.count() != e.count() or not after.exceptAll(e).isEmpty()
        e = after
        if not changed:
            break
    if changed:
        # the post-loop labeling assumes every edge is (member, root) —
        # true ONLY at the fixpoint. Returning anyway would silently emit
        # split components and duplicate (node, component) rows; with the
        # documented O(log n) convergence, hitting this means max_iter
        # was set far below log2(n) — a configuration error, not a data
        # condition to paper over.
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds; raise max_iter (alternating-star "
            "converges in O(log n) rounds)"
        )
    # At the fixpoint every edge is (member, root); add the roots themselves.
    labels = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    labels = labels.unionByName(roots).distinct()
    if nodes is not None:
        node_col = nodes.columns[0]
        all_nodes = nodes.select(F.col(node_col).alias("node")).distinct()
        singletons = all_nodes.join(labels, "node", "left_anti").select(
            "node", F.col("node").alias("component")
        )
        labels = labels.unionByName(singletons)
    return labels


def _cc_driver(
    erows: list, e: DataFrame, nodes: DataFrame | None,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Small-graph path: union-find over the collected edge list, labels
    re-emitted as a DataFrame. Deterministic min-label components —
    identical output to the distributed star algorithm. The singleton
    attach dispatches the same way the edge side did: when the node set
    also fits ``driver_threshold`` (one probe job) the full label list —
    including singletons — is built in Python and emitted as ONE local
    relation, replacing the distributed anti-join + union the downstream
    consumer would otherwise execute (and typically checkpoint) against
    a broadcast of the edge labels; past the threshold the anti-join
    runs unchanged."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    touched = set()
    for row in erows:
        a, b = row["src"], row["dst"]
        touched.add(a)
        touched.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    label_rows = [(n, find(n)) for n in sorted(touched)]
    spark = e.sparkSession
    # label schema inherits the node id type from the edge frame — the
    # driver path must accept whatever id type the distributed path does
    import pyspark.sql.types as T

    id_type = e.schema["src"].dataType
    schema = T.StructType(
        [T.StructField("node", id_type), T.StructField("component", id_type)]
    )
    if nodes is not None:
        node_col = nodes.columns[0]
        all_nodes = nodes.select(F.col(node_col).alias("node")).distinct()
        nrows = (
            _probe_rows(all_nodes, driver_threshold)
            if driver_threshold > 0
            else None
        )
        if nrows is not None:
            # full label list driver-side: same (node, component) set as
            # labels ∪ (anti-join singletons), one local relation. A NULL
            # node id rides along as a (NULL, NULL) singleton — exactly
            # what the anti-join emits (NULL never equals a label key) —
            # and sorts after every real id (row order is cosmetic).
            label_rows = sorted(
                label_rows
                + [
                    (r.node, r.node)
                    for r in nrows
                    if r.node not in touched
                ],
                key=lambda t: (t[0] is None, t[0]),
            )
            return _local_df(spark, label_rows, schema)
        labels = spark.createDataFrame(label_rows, schema)
        singletons = all_nodes.join(
            F.broadcast(labels), "node", "left_anti"
        ).select("node", F.col("node").alias("component"))
        return labels.unionByName(singletons)
    return _local_df(spark, label_rows, schema)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """PageRank over a directed edge list (src, dst): (node, rank) after
    ``n_iter`` power iterations (Page et al. 1999 — public).

    Scale shape per iteration: one join of ranks onto the out-degree-
    annotated edge list (both pre-partitioned on src — the exchange is
    paid once outside the loop), one groupBy(dst) sum of contributions.
    Dangling nodes' mass redistributes uniformly (computed as a 1-row
    aggregate, broadcast into the update), so total rank stays 1.
    Each iteration localCheckpoints — same unbounded-lineage rule as
    :func:`connected_components`.

    Determinism note: contribution sums are IEEE double adds whose order
    depends on partitioning (inherent to floating-point power
    iteration); ranks are correct to ~1e-15 but not bit-pinned. Tests
    assert structural properties (mass conservation, known-graph
    orderings) with tolerances — this operator deliberately stays a
    library function, not a hash-checked catalog entry.
    """
    src, dst = edges.columns[:2]
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    node_df = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    )
    if nodes is not None:
        node_df = node_df.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("node"))
        )
    node_df = node_df.distinct().localCheckpoint(eager=True)
    n_nodes = node_df.count()
    if n_nodes == 0:
        # empty graph: return an empty (node, rank) frame instead of
        # dividing by zero below
        return node_df.select("node", F.lit(1.0).alias("rank")).limit(0)

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e_deg = e.join(deg, "src").repartition("src").localCheckpoint(eager=True)
    # the dangling NODE SET is loop-invariant — materialize it once;
    # deriving it from `deg` inside the loop would re-execute the raw
    # edge scan + distinct + degree shuffle on every one of the n_iter
    # iterations (deg's lineage roots at the un-checkpointed edge list)
    dangling_nodes = node_df.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)

    ranks = node_df.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e_deg.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        # dangling mass = rank held by nodes with no out-edges
        dangling = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        base = (1.0 - damping) / n_nodes
        ranks = (
            node_df.join(
                contrib.select(F.col("dst").alias("node"), "in_mass"),
                "node",
                "left",
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_fixedpoint(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 4,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    frac_scale: int = 10**6,
    node_type: str = "long",
    driver_threshold: int = 100_000,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank in FIXED-POINT integer arithmetic: (node,
    rank_fp) after ``n_iter`` power iterations, ranks carried as BIGINTs
    scaled by ``scale``. ``node_type`` is the key type both frames are
    cast to — "long" for numeric ids, "string" for domain-keyed graphs
    (jobs.pipelines.rank_domains).

    ``teleport`` (optional): a one-column DataFrame of SEED nodes turns
    this into **personalized PageRank** — the random surfer restarts
    (and dangling mass teleports) uniformly over the seed set instead of
    all nodes: ``base_v = scale·(den−num) div (den·|S|)`` for seeds,
    0 elsewhere, and the per-iteration dangling redistribution likewise
    lands on seeds only. Ranks then measure proximity-weighted authority
    FROM the seed set — crawl seed expansion ("which domains does my
    trusted list flow to"), related-entity scoring, topic-conditioned
    authority. Seeds outside ``nodes`` are ignored (the subgraph
    contract); an empty intersection raises (an all-zero restart vector
    has no fixed point). ``teleport=None`` keeps the classic uniform
    restart — that code path is untouched byte-for-byte. Initial ranks
    stay uniform ``scale div n`` in BOTH modes (documented choice: the
    fixed-``n_iter`` result is a deterministic function of the init, and
    a uniform start measures seed influence after exactly ``n_iter``
    propagation steps).

    **Adaptive physical strategy** (the :func:`connected_components`
    discipline): the input is usually an already-AGGREGATED graph, and
    when both the edge list and the node set fit ``driver_threshold``
    rows the loop runs ON THE DRIVER over the collected aggregate — the
    distributed loop's per-iteration checkpoints are pure scheduling
    overhead on a 625-edge nation graph. Because every operation is
    integer, the two paths are BIT-IDENTICAL (property-tested against
    an independent sequential replica on random graphs), so the branch
    is invisible to callers; above the threshold the checkpointed
    join+sum rounds run unchanged.

    Why this exists next to :func:`pagerank`: the float version's
    contribution sums are IEEE adds whose order depends on partitioning,
    so it deliberately stays out of the hash-checked catalog. Here every
    operation is integer multiply / floor-divide / sum — associative,
    commutative, partition-order-independent — so two engines (or two
    cluster layouts) produce IDENTICAL bits. The price is documented
    truncation drift: each floor-divide sheds < 1 unit of mass, so total
    mass decays by O(edges/frac_scale) per iteration instead of being
    conserved exactly — irrelevant for ranking (all nodes shed
    proportionally) and bounded by construction.

    Update rule (everything integer; div = floor division):
        frac(u,v)  = w(u,v) * frac_scale div W(u)          [per edge, once]
        contrib(v) = Σ_u rank(u) * frac(u,v) div frac_scale
        dmn        = (Σ_{dangling u} rank(u)) div n
        rank'(v)   = base + damping_num*(contrib(v)+dmn) div damping_den
        base       = scale*(damping_den-damping_num) div (damping_den*n)

    Overflow headroom: rank ≤ scale (1e12) and frac ≤ frac_scale (1e6),
    so the largest product is ≤ 1e18 < 2^63-1; callers raising ``scale``
    must keep scale*frac_scale and 2*damping_num*scale inside int64 —
    the factor 2 because the damped term multiplies (contrib + dmn),
    which reaches scale*(1 + 1/n) ≤ 2*scale at n=1, not scale alone.

    Scale shape: ``edges`` is usually an AGGREGATED graph (counts from a
    fact-table join) — the expensive distributed work happens upstream,
    once; the loop is n_iter joins + groupBy sums on the aggregate.
    Loop-invariant frames (out-degree fractions, node set, dangling set)
    localCheckpoint once OUTSIDE the loop so iterations never re-execute
    the upstream join; per-iteration dangling mass stays in-plan as a
    1-row broadcast (no driver round-trip).
    """
    # the damped product is damping_num*(contrib+dmn), and contrib+dmn can
    # reach scale*(1+1/n) ≤ 2*scale — guard the actual worst case, not
    # damping_num*scale (a custom scale near 1e17 would pass the looser
    # guard yet wrap int64 in the distributed path while the driver
    # path's Python bignums stayed exact, breaking bit-identity)
    if scale * frac_scale >= 2**63 or 2 * damping_num * scale >= 2**63:
        raise ValueError("fixed-point scales overflow int64")
    if len(edges.columns) < 3:
        raise ValueError(
            "edges needs (src, dst, weight) columns — for an unweighted"
            " graph pass F.lit(1) as the weight"
        )
    src, dst, w = edges.columns[:3]
    # canonicalize to ONE row per (src, dst): duplicate edge rows must
    # pre-aggregate, because the out-weight FRACTION floor-divides per
    # row — two rows w=1,w=2 truncate differently than one row w=3, and
    # the result would then depend on the caller's representation (the
    # exact class of nondeterminism this function exists to exclude;
    # caught by the hypothesis property suite's self-loop example).
    # NULL endpoints drop here (SQL joins and Python dict membership
    # disagree about NULL, so letting one through would diverge the two
    # physical paths); checkpointed — the upstream derivation is the
    # expensive part and frac references e twice.
    ecast = edges.select(
        F.col(src).cast(node_type).alias("src"),
        F.col(dst).cast(node_type).alias("dst"),
        F.col(w).cast("long").alias("w"),
    )
    e = None
    erows = None
    # fully-local fast path (the label_propagation discipline): a
    # driver-built local relation (the trade wrappers' VALUES edge
    # aggregate) collects job-free and the (src, dst) canonicalization
    # runs in Python with SQL SUM semantics — skipping the aggregate
    # exchange + eager checkpoint + probe jobs entirely; int64 sum
    # overflow falls back to the engine's ANSI-abort spelling
    if driver_threshold > 0 and _is_local_plan(ecast):
        raw = ecast.limit(driver_threshold + 1).collect()
        if len(raw) <= driver_threshold:
            pairs = _dagg_rows_py(raw)
            if pairs is not None and len(pairs) <= driver_threshold:
                erows = pairs
    if erows is None:
        e = (
            ecast.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
    nd_proj = nodes.select(
        F.col(nodes.columns[0]).cast(node_type).alias("node")
    ).filter(F.col("node").isNotNull())
    node_df = nd_proj.distinct()
    # driver/distributed dispatch via the one-job limit probe: when both
    # frames fit, the probe rows ARE the collected inputs — the old
    # count() + guard-agg + count() + collect() + collect() sequence
    # spent five driver round-trips where two suffice (the weight guard
    # then runs in Python over rows already in hand, same checks, same
    # messages). EDGES probe first (e is already checkpointed); the node
    # frame is probed UN-checkpointed — the driver path never touches it
    # again, so its eager checkpoint was a pure extra job + planning gap
    # per query; the distributed branch checkpoints it below as before
    if erows is None:
        erows = (
            _probe_rows(e, driver_threshold) if driver_threshold > 0 else None
        )
    if erows is not None and any(r.w is None for r in erows):
        # SQL MIN/SUM skip NULL weights, so the distributed guard and
        # loop have well-defined NULL semantics the Python replica does
        # not reproduce — route NULL-weight inputs to the engine
        erows = None
    nrows = (
        _distinct_probe_rows(nd_proj, driver_threshold)
        if erows is not None
        else None
    )
    if nrows is not None and len(nrows) == 0:
        return node_df.select("node", F.lit(0).cast("long").alias("rank_fp"))
    if nrows is not None:
        _check_weights_rows(
            (r.w for r in erows), frac_scale=frac_scale
        )
        seeds = None
        if teleport is not None:
            # Python set intersection IS the left-semi join here: the
            # node universe is fully in hand (nrows) and both sides are
            # NULL-filtered hashable keys. The teleport frame is PROBED,
            # not blindly collected — a seed list larger than the
            # dispatch bound falls back to the distributed semi-join
            # instead of exhausting driver memory (r11 advice)
            trows = _distinct_probe_rows(
                teleport.select(
                    F.col(teleport.columns[0]).cast(node_type).alias("node")
                ).filter(F.col("node").isNotNull()),
                driver_threshold,
            )
            if trows is None:
                nrows = None
            else:
                seeds = {r.node for r in trows} & {r.node for r in nrows}
                if not seeds:
                    raise ValueError(
                        "teleport set is empty or disjoint from nodes — an"
                        " all-zero restart vector has no fixed point"
                    )
    if nrows is not None:
        return _pagerank_fp_driver(
            erows, nrows, node_df, len(nrows), n_iter, damping_num,
            damping_den, scale, frac_scale, seeds=seeds,
        )
    if e is None:
        # the local fast path collected the edges but the dispatch fell
        # through (node frame or teleport above the bound): build the
        # canonical checkpointed aggregate for the distributed loop
        e = (
            ecast.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
    node_df = node_df.localCheckpoint(eager=True)
    n = node_df.count()
    if n == 0:
        return node_df.select("node", F.lit(0).cast("long").alias("rank_fp"))
    wb = e.agg(F.min("w").alias("mn"), F.max("w").alias("mx")).first()
    if wb.mn is not None:
        if wb.mn <= 0:
            # Python // floors while Spark DIV truncates toward zero, so
            # negative weights would silently diverge the two physical
            # paths; zero total out-weight divides by zero — both are
            # contract violations, not data to paper over
            raise ValueError(f"edge weights must be positive (min={wb.mn})")
        if wb.mx * frac_scale >= 2**63:
            # the distributed CAST(w * frac_scale) would ANSI-abort (or
            # wrap) where the driver path's Python bignums succeed
            raise ValueError(
                f"max edge weight {wb.mx} * frac_scale overflows int64"
            )
    seeds_df = None
    m = n
    if teleport is not None:
        seeds_df = (
            teleport.select(
                F.col(teleport.columns[0]).cast(node_type).alias("node")
            )
            .filter(F.col("node").isNotNull())
            .distinct()
            .join(node_df, "node", "left_semi")
            .localCheckpoint(eager=True)
        )
        m = seeds_df.count()
        if m == 0:
            raise ValueError(
                "teleport set is empty or disjoint from nodes — an"
                " all-zero restart vector has no fixed point"
            )
    tot = e.groupBy("src").agg(F.sum("w").alias("w_out"))
    frac = (
        e.join(tot, "src")
        .select(
            "src",
            "dst",
            F.expr(f"CAST(w * {frac_scale} AS BIGINT) DIV w_out").alias("frac"),
        )
        .localCheckpoint(eager=True)
    )
    dangling = node_df.join(
        frac.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)
    if seeds_df is None:
        nodef = node_df
        base = (scale * (damping_den - damping_num)) // (damping_den * n)
        rank_expr = (
            f"CAST({base} AS BIGINT) + (({damping_num} *"
            f" (coalesce(contrib, CAST(0 AS BIGINT)) + dmn))"
            f" DIV {damping_den})"
        )
    else:
        # seed flag materialized ONCE onto the node frame — the loop's
        # per-iteration rank projection branches on it (restart mass and
        # dangling redistribution land on seeds only)
        nodef = node_df.join(
            seeds_df.select("node", F.lit(True).alias("_seed")),
            "node",
            "left",
        ).localCheckpoint(eager=True)
        base_s = (scale * (damping_den - damping_num)) // (damping_den * m)
        rank_expr = (
            f"CASE WHEN _seed THEN CAST({base_s} AS BIGINT) +"
            f" (({damping_num} * (coalesce(contrib, CAST(0 AS BIGINT))"
            f" + dmn)) DIV {damping_den})"
            f" ELSE ({damping_num} * coalesce(contrib, CAST(0 AS BIGINT)))"
            f" DIV {damping_den} END"
        )
    rank = node_df.select(
        "node", F.lit(scale // n).cast("long").alias("rank_fp")
    )
    for _ in range(n_iter):
        contrib = (
            frac.join(rank.select(F.col("node").alias("src"), "rank_fp"), "src")
            .select(
                "dst",
                F.expr(f"(rank_fp * frac) DIV {frac_scale}").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dmn = (
            rank.join(dangling, "node", "left_semi")
            .agg(
                F.expr(
                    f"CAST(coalesce(sum(rank_fp), 0) AS BIGINT) DIV {m}"
                ).alias("dmn")
            )
        )
        rank = (
            nodef.join(
                contrib.select(F.col("dst").alias("node"), "contrib"),
                "node",
                "left",
            )
            .crossJoin(F.broadcast(dmn))
            .select(
                "node",
                F.expr(rank_expr).alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return rank


def _pagerank_fp_driver(
    erows: list,
    nrows: list,
    node_df: DataFrame,
    n: int,
    n_iter: int,
    damping_num: int,
    damping_den: int,
    scale: int,
    frac_scale: int,
    seeds: set | None = None,
) -> DataFrame:
    """Driver fast path: the same update rule over the collected
    aggregate (both frames proven ≤ driver_threshold by the caller).
    Integer arithmetic makes this bit-identical to the distributed loop
    — the property suite compares both against an independent replica.
    ``seeds`` (already intersected with the node set) switches to the
    personalized restart: base and dangling mass land on seeds only."""
    spark = node_df.sparkSession
    edges = [(r.src, r.dst, r.w) for r in erows]
    nodes = [r.node for r in nrows]
    w_out: dict = {}
    for s, _, w in edges:
        w_out[s] = w_out.get(s, 0) + w
    frac = {(s, d): (w * frac_scale) // w_out[s] for s, d, w in edges}
    dangling = [v for v in nodes if v not in w_out]
    base = (scale * (damping_den - damping_num)) // (damping_den * n)
    rank = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for (s, d), f in frac.items():
            # mirror the distributed joins EXACTLY: an edge whose src is
            # not a ranked node contributes nothing (inner join of frac
            # onto ranks), and mass sent to a dst outside the node set is
            # dropped (node_df LEFT join contrib) — without these guards
            # the driver path KeyErrors on subgraph rankings the
            # distributed path handles
            if s in rank and d in contrib:
                contrib[d] += (rank[s] * f) // frac_scale
        if seeds is None:
            dmn = sum(rank[v] for v in dangling) // n
            rank = {
                v: base + ((damping_num * (contrib[v] + dmn)) // damping_den)
                for v in nodes
            }
        else:
            m = len(seeds)
            base_s = (
                scale * (damping_den - damping_num)
            ) // (damping_den * m)
            dmn = sum(rank[v] for v in dangling) // m
            rank = {
                v: (
                    base_s
                    + ((damping_num * (contrib[v] + dmn)) // damping_den)
                    if v in seeds
                    else (damping_num * contrib[v]) // damping_den
                )
                for v in nodes
            }
    out_type = dict(node_df.dtypes)["node"]
    return _local_df(
        spark, [(v, rank[v]) for v in nodes], f"node {out_type}, rank_fp long"
    )


def hits_fixedpoint(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 4,
    scale: int = 10**6,
    node_type: str = "long",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg) in FIXED-POINT integer
    arithmetic: ``(node, hub_fp, auth_fp)`` after ``n_iter`` mutual-
    reinforcement rounds over the DIRECTED weighted graph — the
    complement of PageRank on a crawl graph (a hub is a page whose
    out-links point at good authorities: link directories, indexes; an
    authority is a page good hubs point at — PageRank conflates the two
    roles into one score).

    Update rule (everything integer; div = floor division; edges outside
    the node universe drop, exactly like :func:`pagerank_fixedpoint`):
        auth_raw(v) = Σ_{(u,v)} hub(u)  * w(u,v)
        auth(v)     = auth_raw(v) * scale div Σ_x auth_raw(x)
        hub_raw(u)  = Σ_{(u,v)} auth(v) * w(u,v)
        hub(u)      = hub_raw(u)  * scale div Σ_x hub_raw(x)
        hub0        = scale div n
    Normalization is **L1** (sum), not the textbook L2: power iteration
    converges to the same principal direction under ANY positive
    rescaling, and an integer floor-divide by the SUM is bit-portable
    across engines where a sqrt is not (the DETERMINISM.md rule-5
    discipline — remove the transcendental, don't pin it). An all-zero
    side (no in-universe edges) normalizes to all-zero instead of
    dividing by zero.

    Overflow headroom (guarded loudly, not discovered): every score is
    ≤ ``scale`` after L1 normalization and the per-edge products sum
    over a score mass of ≤ scale, so the largest intermediates are
    ``scale² · max_edge_weight`` (the normalize multiply) and
    ``scale · total_edge_weight`` (the normalization sum) — both checked
    against int64 up front; heavier graphs lower ``scale`` or
    pre-normalize weights.

    **Adaptive physical strategy** (the pagerank_fixedpoint discipline):
    below ``driver_threshold`` the loop runs on the collected aggregate
    with Python integers — BIT-IDENTICAL to the distributed loop
    (property-tested against an independent sequential replica); above
    it, per-round hash joins + map-side-combinable sums on the
    checkpointed in-universe edge frame, normalization totals staying
    in-plan as 1-row broadcasts (no driver round-trip per round).
    """
    if len(edges.columns) < 3:
        raise ValueError(
            "edges needs (src, dst, weight) columns — for an unweighted"
            " graph pass F.lit(1) as the weight"
        )
    src, dst, w = edges.columns[:3]
    # one row per (src, dst) and NULL endpoints dropped up front — same
    # canonicalization (and same reasons) as pagerank_fixedpoint
    ecast = edges.select(
        F.col(src).cast(node_type).alias("src"),
        F.col(dst).cast(node_type).alias("dst"),
        F.col(w).cast("long").alias("w"),
    )
    e = None
    erows = None
    # fully-local fast path (the pagerank_fixedpoint discipline): VALUES
    # edge inputs collect job-free, canonicalize in Python with SQL SUM
    # semantics — no aggregate exchange, checkpoint or probe job
    if driver_threshold > 0 and _is_local_plan(ecast):
        raw = ecast.limit(driver_threshold + 1).collect()
        if len(raw) <= driver_threshold:
            pairs = _dagg_rows_py(raw)
            if pairs is not None and len(pairs) <= driver_threshold:
                erows = pairs
    if erows is None:
        e = (
            ecast.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
    nd_proj = nodes.select(
        F.col(nodes.columns[0]).cast(node_type).alias("node")
    ).filter(F.col("node").isNotNull())
    node_df = nd_proj.distinct()
    # one-job dispatch probe (the pagerank_fixedpoint discipline): when
    # both frames fit the driver threshold, the probe rows ARE the
    # collected inputs and the guards run in Python over them — same
    # checks, same messages, three fewer driver round-trips. Edges probe
    # first (e is already checkpointed); the node frame probes
    # UN-checkpointed — the driver path never touches it again, and the
    # distributed branch checkpoints it below as before
    if erows is None:
        erows = (
            _probe_rows(e, driver_threshold) if driver_threshold > 0 else None
        )
    if erows is not None and any(r.w is None for r in erows):
        # SQL MIN/MAX/SUM skip NULL weights — the engine defines the
        # NULL-weight behavior, so route those inputs to it (the
        # pagerank_fixedpoint fallback)
        erows = None
    nrows = (
        _distinct_probe_rows(nd_proj, driver_threshold)
        if erows is not None
        else None
    )
    if nrows is not None and len(nrows) == 0:
        return node_df.select(
            "node",
            F.lit(0).cast("long").alias("hub_fp"),
            F.lit(0).cast("long").alias("auth_fp"),
        )
    if nrows is not None:
        n = len(nrows)
        if scale // n == 0:
            raise ValueError(f"scale={scale} must be >= node count {n}")
        _check_weights_rows((r.w for r in erows), hits_scale=scale)
        return _hits_fp_driver(erows, nrows, node_df, n, n_iter, scale)
    if e is None:
        # local fast path collected the edges but the node frame is
        # above the bound: build the checkpointed aggregate for the
        # distributed loop
        e = (
            ecast.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
    node_df = node_df.localCheckpoint(eager=True)
    n = node_df.count()
    if n == 0:
        return node_df.select(
            "node",
            F.lit(0).cast("long").alias("hub_fp"),
            F.lit(0).cast("long").alias("auth_fp"),
        )
    if scale // n == 0:
        # hub0 = scale div n would start the iteration at exactly zero
        # everywhere and every round would stay zero — a silent all-zero
        # answer is a configuration error, not a result
        raise ValueError(f"scale={scale} must be >= node count {n}")
    wb = e.agg(
        F.min("w").alias("mn"), F.max("w").alias("mx"), F.sum("w").alias("tw")
    ).first()
    if wb.mn is not None:
        if wb.mn <= 0:
            raise ValueError(f"edge weights must be positive (min={wb.mn})")
        if scale * scale * wb.mx >= 2**63 or scale * wb.tw >= 2**63:
            raise ValueError(
                "fixed-point scale overflows int64 for these edge weights:"
                f" need scale^2*max_w ({scale}^2*{wb.mx}) and scale*total_w"
                f" ({scale}*{wb.tw}) below 2^63 — lower scale or"
                " pre-normalize weights"
            )
    # restrict to in-universe edges ONCE (pagerank folds this into its
    # per-round joins; HITS reads the edge frame 2x per round, so paying
    # the two semi-joins once outside the loop is strictly cheaper)
    eu = (
        e.join(node_df.select(F.col("node").alias("src")), "src", "left_semi")
        .join(node_df.select(F.col("node").alias("dst")), "dst", "left_semi")
        .select("src", "dst", "w")
        .localCheckpoint(eager=True)
    )
    norm = (
        f"CAST(coalesce((raw * {scale}) DIV nullif(t, CAST(0 AS BIGINT)),"
        " CAST(0 AS BIGINT)) AS BIGINT)"
    )
    hub = node_df.select(
        "node", F.lit(scale // n).cast("long").alias("hub_fp")
    )
    auth = None
    for _ in range(n_iter):
        araw = (
            eu.join(hub.select(F.col("node").alias("src"), "hub_fp"), "src")
            .select("dst", F.expr("hub_fp * w").alias("x"))
            .groupBy("dst")
            .agg(F.sum("x").alias("raw"))
        )
        at = araw.agg(F.coalesce(F.sum("raw"), F.lit(0)).alias("t"))
        auth = (
            node_df.join(
                araw.select(F.col("dst").alias("node"), "raw"), "node", "left"
            )
            .crossJoin(F.broadcast(at))
            .select("node", F.expr(norm).alias("auth_fp"))
            .localCheckpoint(eager=True)
        )
        hraw = (
            eu.join(auth.select(F.col("node").alias("dst"), "auth_fp"), "dst")
            .select("src", F.expr("auth_fp * w").alias("x"))
            .groupBy("src")
            .agg(F.sum("x").alias("raw"))
        )
        ht = hraw.agg(F.coalesce(F.sum("raw"), F.lit(0)).alias("t"))
        hub = (
            node_df.join(
                hraw.select(F.col("src").alias("node"), "raw"), "node", "left"
            )
            .crossJoin(F.broadcast(ht))
            .select("node", F.expr(norm).alias("hub_fp"))
            .localCheckpoint(eager=True)
        )
    return hub.join(auth, "node").select("node", "hub_fp", "auth_fp")


def _hits_fp_driver(
    erows: list, nrows: list, node_df: DataFrame, n: int, n_iter: int,
    scale: int,
) -> DataFrame:
    """Driver fast path: the same update rule over the collected
    aggregate — bit-identical to the distributed loop (all integer; the
    property suite compares both against an independent replica)."""
    spark = node_df.sparkSession
    nodes = [r.node for r in nrows]
    ns = set(nodes)
    eu = [
        (r.src, r.dst, r.w)
        for r in erows
        if r.src in ns and r.dst in ns
    ]
    hub = {v: scale // n for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(n_iter):
        araw = {v: 0 for v in nodes}
        for s, d, w in eu:
            araw[d] += hub[s] * w
        t = sum(araw.values())
        auth = {v: (araw[v] * scale) // t if t else 0 for v in nodes}
        hraw = {v: 0 for v in nodes}
        for s, d, w in eu:
            hraw[s] += auth[d] * w
        t = sum(hraw.values())
        hub = {v: (hraw[v] * scale) // t if t else 0 for v in nodes}
    out_type = dict(node_df.dtypes)["node"]
    return _local_df(
        spark,
        [(v, hub[v], auth[v]) for v in nodes],
        f"node {out_type}, hub_fp long, auth_fp long",
    )


def _check_weights_rows(
    weights,
    frac_scale: int | None = None,
    hits_scale: int | None = None,
) -> None:
    """The driver-path spelling of the distributed weight guards: same
    checks, same messages, over rows already collected by the dispatch
    probe (no extra aggregate job). ``frac_scale`` enables the
    pagerank-family overflow check, ``hits_scale`` the HITS one."""
    mn = mx = tw = None
    for w in weights:
        if mn is None:
            mn = mx = w
            tw = 0
        mn = w if w < mn else mn
        mx = w if w > mx else mx
        tw += w
    if mn is None:
        return
    if mn <= 0:
        raise ValueError(f"edge weights must be positive (min={mn})")
    if frac_scale is not None and mx * frac_scale >= 2**63:
        raise ValueError(
            f"max edge weight {mx} * frac_scale overflows int64"
        )
    if hits_scale is not None and (
        hits_scale * hits_scale * mx >= 2**63 or hits_scale * tw >= 2**63
    ):
        raise ValueError(
            "fixed-point scale overflows int64 for these edge weights:"
            f" need scale^2*max_w ({hits_scale}^2*{mx}) and scale*total_w"
            f" ({hits_scale}*{tw}) below 2^63 — lower scale or"
            " pre-normalize weights"
        )


#: VALUES-literal emission cutoff: the SQL parse cost crosses the
#: 1-slice-RDD emission cost at ~4-5k rows (measured, local[32]: noop of
#: a 2-col bigint frame — 0.105 vs 0.198 s at 1k rows, 0.202 vs 0.200 at
#: 5k, 0.383 vs 0.235 at 20k)
_VALUES_MAX_ROWS = 4096

#: broadcast-hint gate for driver-path results: ~100k short rows is a
#: few MB framed — comfortably inside the executor build-side budget —
#: and it equals the graph family's default dispatch bound, so every
#: default-threshold driver-path result is hinted. Fixed on purpose:
#: a caller-raised driver_threshold proves driver fit, not executor
#: hash-relation fit (see _local_df's docstring).
_BROADCAST_HINT_MAX_ROWS = 100_000

#: column types the VALUES literal renderer covers (simpleString -> SQL);
#: anything else (arrays, structs, timestamps) takes the RDD path
_VALUES_TYPES = {
    "bigint": "BIGINT",
    "int": "INT",
    "string": "STRING",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
}


def _sql_literal(v, sql_type: str) -> str:
    """Render one Python value as an exact Spark SQL literal. Strings
    escape backslash and quote (the default parser processes backslash
    escapes); doubles go through repr(), which round-trips binary64
    exactly and is re-parsed by CAST with correct rounding — bit-exact
    both ways."""
    if v is None:
        return "NULL"
    if sql_type == "STRING":
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if sql_type == "DOUBLE":
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"
    if sql_type == "BOOLEAN":
        return "true" if v else "false"
    return str(v)


def _local_df(spark, rows, schema):
    """Driver-path result emitter. Small simple-typed results embed as a
    ``VALUES`` literal — a pure-JVM ``LocalTableScan`` with ACCURATE
    stats: no Python-worker round-trip at execution (measured 0.157 →
    0.037 s for a 25-row noop; a downstream join picks the broadcast
    side from real sizes), at the price of SQL-text parse time that
    grows with the row count (crossover ~4-5k rows, see
    ``_VALUES_MAX_ROWS``).

    Larger or complex-typed results fall back to a ONE-slice RDD:
    ``createDataFrame`` on a plain list parallelizes into
    defaultParallelism slices — 32 near-empty tasks for a 25-row result,
    each paying a Python-worker round-trip, and every downstream
    operator schedules them all; the one-slice form measured 0.7-1.4 s →
    0.24-0.37 s for a 25-row noop write, 1.1-1.8 → 0.6-0.9 s at 100k
    rows. (NOT ``coalesce(1)``: a no-shuffle coalesce makes the single
    task evaluate all 32 parent Python slices SEQUENTIALLY — measured
    4.7 s for 25 rows.)

    The broadcast hint is gated on the ACTUAL row count in hand (not an
    estimate): an RDD-backed frame has no stats, so the planner assumes
    it is huge — a consumer joining a 25-row driver-path result to a
    dimension table got a two-Exchange sort-merge join
    (x_triangle_trade's measured plan). The gate is the fixed
    :data:`_BROADCAST_HINT_MAX_ROWS` (the graph family's default probe
    bound), NOT the caller's threshold: a caller that raised its
    dispatch bound has proven its rows fit the DRIVER, which says
    nothing about every executor also holding the built hash relation —
    beyond the fixed bound results stay unhinted (walk corpora fan out
    past it routinely). The hint stays on the VALUES path too — same
    boundedness argument, zero-cost exchange."""
    st = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    sql_types = [
        _VALUES_TYPES.get(f.dataType.simpleString()) for f in st.fields
    ]
    if 0 < len(rows) <= _VALUES_MAX_ROWS and all(sql_types):
        cols = ", ".join(
            f"CAST(c{i} AS {t}) AS `{f.name}`"
            for i, (f, t) in enumerate(zip(st.fields, sql_types))
        )
        tuples = ", ".join(
            "("
            + ", ".join(
                _sql_literal(row[i], t) for i, t in enumerate(sql_types)
            )
            + ")"
            for row in rows
        )
        alias = ", ".join(f"c{i}" for i in range(len(st.fields)))
        df = spark.sql(f"SELECT {cols} FROM VALUES {tuples} AS t({alias})")
    else:
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), st
        )
    return F.broadcast(df) if len(rows) <= _BROADCAST_HINT_MAX_ROWS else df


_NodeRow = namedtuple("_NodeRow", ["node"])


def _distinct_probe_rows(proj: DataFrame, threshold: int) -> list | None:
    """Smallness probe of ``proj.distinct()`` for a ONE-column frame of
    a :data:`_PY_ORDERED_SIMPLE` type: probe the RAW projection (a
    CollectLimit over the scan — limit short-circuits, no aggregate to
    plan, job-free on driver-local relations) and dedup in Python, where
    equality provably matches SQL distinct for these types (the engine
    applied any cast while executing/folding the projection). Probing
    ``distinct()`` itself was costing a 2-stage AQE plan + a ~0.2 s
    driver planning gap per graph query on a 25-row dimension scan
    (measured, x_pagerank_trade). A raw row count past the threshold —
    the 100 TB node frame — falls back to the ordinary one-job probe of
    the distinct frame, reading ~threshold rows either way; a DEDUPED
    count past the threshold is proof the distinct cannot fit and
    returns None directly."""
    t = proj.schema[0].dataType.simpleString()
    if t in _PY_ORDERED_SIMPLE:
        raw = proj.limit(threshold + 1).collect()
        if len(raw) <= threshold:
            seen = dict.fromkeys(r[0] for r in raw)
            if len(seen) <= threshold:
                return [_NodeRow(v) for v in seen]
            return None
    return _probe_rows(proj.distinct(), threshold)


def _probe_rows(df: DataFrame, threshold: int) -> list | None:
    """ONE-job smallness probe: collect up to ``threshold + 1`` rows of a
    (checkpointed) frame; return the row list when the frame fits — the
    caller then holds EVERY row and needs no further action on the frame
    — else None. Replaces the ``count()``-then-``collect()`` pair the
    adaptive driver/distributed dispatch used to pay: each action is a
    full driver round-trip (a scheduled job), and on the driver path the
    count told us nothing the collect would not. The distributed branch
    still takes its exact counts as before — this probe only spends one
    job deciding, and its partial result is discarded there."""
    rows = df.limit(threshold + 1).collect()
    return rows if len(rows) <= threshold else None


#: dtypes whose PYTHON ordering/equality provably match Spark's
#: least/greatest/distinct semantics on collected values (integrals:
#: numeric order; strings: Python compares by code point, and Spark's
#: UTF8String binary order preserves code-point order) — the fused
#: driver-path normalization below is gated on them; any other endpoint
#: type falls back to the distributed distinct (always correct).
_PY_ORDERED_SIMPLE = {"tinyint", "smallint", "int", "bigint", "string"}

_UndRow = namedtuple("_UndRow", ["u", "v"])


def _und_rows_py(rows: list) -> list:
    """Driver spelling of :func:`_simple_undirected` over probed raw edge
    rows: least/greatest endpoint ordering, NULL endpoints and self-loops
    dropped, exact dedup — bit-identical to the distributed
    distinct for the :data:`_PY_ORDERED_SIMPLE` types (the only ones the
    caller dispatches here)."""
    s = set()
    for r in rows:
        a, b = r[0], r[1]
        if a is None or b is None or a == b:
            continue
        s.add((a, b) if a <= b else (b, a))
    return [_UndRow(u, v) for u, v in s]


def _is_local_plan(df: DataFrame) -> bool:
    """True when the frame's optimized logical plan is a driver-local
    relation (VALUES literal / fully constant-folded) — collecting it
    schedules no job, so probe-style dispatches can skip the defensive
    checkpoint. Best-effort (py4j introspection): False on any doubt,
    which only costs the checkpoint job, never correctness."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        return plan.getClass().getName().endswith("LocalRelation")
    except Exception:  # noqa: BLE001 — conservative fallback
        return False


def _plan_output_aggregated(df: DataFrame) -> bool:
    """True when the frame's optimized plan is an Aggregate (possibly
    under Project/Filter nodes) — its output cardinality is the GROUP
    count, which for the graph callers (nation-pair / domain-pair edge
    aggregates) is bounded far below the upstream fact table, so an
    eager checkpoint of it is storage-safe at any input scale. A
    ``limit`` probe over an Aggregate must run the FULL aggregation
    anyway (no pushdown through the blocking operator), which is exactly
    why those inputs are checkpointed before probing. Best-effort (py4j
    introspection): False on any doubt, which routes the caller to the
    no-checkpoint probe — never a correctness decision."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        for _ in range(8):
            name = plan.getClass().getSimpleName()
            if name in ("Project", "Filter"):
                plan = plan.child()
                continue
            return name == "Aggregate"
        return False
    except Exception:  # noqa: BLE001 — conservative fallback
        return False


def _und_probe(
    edges: DataFrame, driver_threshold: int
) -> tuple[DataFrame | None, list | None, "object"]:
    """Fused normalize+dispatch for the simple-undirected consumers
    (triangle/clustering/k-core/BFS/walks): ONE materialization of the
    caller's upstream + ONE probe, with the least/greatest/distinct
    normalization running in PYTHON on the driver path instead of paying
    a distinct exchange + eager checkpoint job per query (measured: the
    normalization job plus its planning gap was ~0.2-0.4 s of every
    25-node trade-graph query's build; guide §1.2 "remove passes",
    §2.4 "remove shuffles outright").

    Returns ``(und, urows, utype)``:

    - ``(None, rows, t)`` — driver path, ``rows`` are the normalized
      ``(u, v)`` tuples (every row in hand; nothing remains persisted);
    - ``(und, rows, t)`` — the RAW edge list was above the threshold but
      the deduped undirected frame fits (today's dispatch bound kept):
      caller owns the checkpointed ``und``;
    - ``(und, None, t)`` — distributed path, ``und`` checkpointed.

    ``driver_threshold <= 0`` keeps the EXACT legacy shape (one
    ``_simple_undirected`` checkpoint, no probes) so the forced-
    distributed job/storage pins stay valid. ``utype`` is the normalized
    endpoint type (the least/greatest common supertype — analysis only,
    no job).
    """
    src, dst = edges.columns[:2]
    utype = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u")
    ).schema["u"].dataType
    if driver_threshold <= 0:
        return _simple_undirected(edges), None, utype
    if utype.simpleString() in _PY_ORDERED_SIMPLE:
        proj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        if _is_local_plan(proj):
            # a driver-built local relation (e.g. the sparsify fast
            # path's VALUES output): probing collects straight off the
            # driver — LocalTableScanExec.executeCollect schedules NO
            # job — so the checkpoint below would be pure overhead
            rows = _probe_rows(proj, driver_threshold)
            if rows is not None:
                return None, _und_rows_py(rows), utype
            und = _simple_undirected(proj)
            return und, _probe_rows(und, driver_threshold), utype
        if _plan_output_aggregated(proj):
            # aggregate upstream (the trade/domain edge frames): a limit
            # probe would run the FULL aggregation, so materialize it
            # ONCE (output bounded by the group count — storage-safe),
            # probe the checkpoint, and normalize in Python when it
            # fits; the checkpoint is released either way (the driver
            # path consumed it, the distributed path re-reads it exactly
            # once into the normalized checkpoint)
            ck = proj.localCheckpoint(eager=True)
            rows = _probe_rows(ck, driver_threshold)
            if rows is not None:
                _free_local_checkpoint(ck)
                return None, _und_rows_py(rows), utype
            und = _simple_undirected(ck)
            _free_local_checkpoint(ck)
            return und, _probe_rows(und, driver_threshold), utype
        # non-aggregate upstream (raw edge scans, persisted RDDs): the
        # limit probe short-circuits — it reads ~threshold rows whatever
        # the input size — so probe WITHOUT a checkpoint: a raw eager
        # checkpoint here would materialize the full PRE-dedup edge list
        # into executor storage at 100 TB scale just to decide a
        # dispatch that will say "distributed" (r11 verdict #3). Below
        # threshold the rows are in hand (upstream ran once); above it
        # the probe cost is bounded and the normalization pass runs the
        # upstream exactly once, as the legacy shape did.
        rows = _probe_rows(proj, driver_threshold)
        if rows is not None:
            return None, _und_rows_py(rows), utype
        und = _simple_undirected(proj)
        return und, _probe_rows(und, driver_threshold), utype
    und = _simple_undirected(edges)
    return und, _probe_rows(und, driver_threshold), utype


_WUndRow = namedtuple("_WUndRow", ["u", "v", "w"])
_MUndRow = namedtuple("_MUndRow", ["u", "v", "w", "cu", "cv"])


def _wund_rows_py(erows: list, nodeset: set | None) -> list | None:
    """Driver spelling of the canonical WEIGHTED undirected aggregate
    (label_propagation / modularity contract): least/greatest endpoint
    ordering, NULL endpoints and self-loops dropped, per-pair weights
    SUMMED with SQL semantics (NULLs skipped; all-NULL pair → NULL),
    optionally restricted to ``nodeset`` endpoints (the subgraph
    semi-join). Returns None when any partial sum leaves int64 — the
    engine's BIGINT SUM would ANSI-abort there, so the caller must fall
    back to the distributed spelling rather than silently succeed with
    Python bignums."""
    agg: dict = {}
    for r in erows:
        a, b, w = r[0], r[1], r[2]
        if a is None or b is None or a == b:
            continue
        if nodeset is not None and (a not in nodeset or b not in nodeset):
            continue
        key = (a, b) if a <= b else (b, a)
        if w is not None:
            cur = agg.get(key)
            s = w if cur is None else cur + w
            if not (-(2**63) <= s < 2**63):
                return None
            agg[key] = s
        else:
            agg.setdefault(key, None)
    return [_WUndRow(u, v, w) for (u, v), w in agg.items()]


def _simple_undirected(edges: DataFrame) -> DataFrame:
    """Normalize an edge list to the simple undirected graph — endpoints
    least/greatest-ordered into ``(u, v)``, self-loops / NULL endpoints /
    duplicate edges dropped — and eagerly ``localCheckpoint`` the result.

    Shared by :func:`triangle_counts`, :func:`clustering_coefficients`
    and :func:`k_core` (the ``pre_normalized`` contract, the
    ``_small_star(pre_oriented=)`` precedent): each consumer reads the
    normalized frame several times, and without the pin every read would
    re-run the caller's upstream derivation (typically a fact-table
    aggregation — the expensive part). Composing operators pass the
    SAME checkpointed frame through instead of paying a second
    distinct + checkpoint of an identical edge set.
    """
    src, dst = edges.columns[:2]
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def _free_local_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a superseded ``localCheckpoint``'s storage
    blocks. A localCheckpoint() frame's plan is a ``LogicalRDD`` over the
    persisted internal RDD; unpersisting that RDD frees its blocks
    immediately instead of holding them until the context dies — on a
    deep iterative loop (k_core peel rounds) the superseded rounds would
    otherwise accumulate one retained RDD per round. JVM-internal
    accessor via py4j, so strictly best-effort: any failure leaves the
    blocks to normal GC (correctness never depends on the release —
    callers only free frames no longer referenced by any live plan)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def triangle_counts(
    edges: DataFrame,
    pre_normalized: bool = False,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Per-node triangle counts: ``(node, n_triangles)`` — how many
    3-cliques each node participates in. The standard cohesion /
    link-farm signal over a domain or interaction graph (a link farm is
    triangle-dense; an organic authority is wedge-dense but
    triangle-sparse).

    ``edges``: first two columns are the endpoints; direction, weights,
    duplicates and self-loops are all ignored (the graph is treated as
    simple and undirected).

    Scale shape — degree orientation, the classic MapReduce triangle
    trick (Suri & Vassilvitskii, WWW'11): orient every undirected edge
    from its lower-(degree, key) endpoint to the higher one. Every
    triangle then has exactly ONE consistent orientation a→b→c with
    a→c, so one equi-join builds wedges rooted at the LOW-degree vertex
    and one more closes them: wedge count is Σ outdeg(v)² where outdeg
    is bounded by O(√m) under this orientation — a heavy hub (the
    web's power-law tail) generates almost no wedges because nearly all
    its edges point INTO it. A key-ordered orientation (the naive
    a<b<c) would root every wedge of a hub's neighborhood at the hub.
    All joins are hash equi-joins on node keys; counts are integers, so
    the result is partition-order-independent and hash-gate safe. The
    oriented edge frame is checkpointed once — three joins read it, and
    its upstream (often a fact-table aggregation) must not run thrice.

    Determinism: the (degree, key) order is total (key breaks degree
    ties), so the orientation — and therefore every intermediate frame —
    is unique for a given input graph; counts are orientation-invariant
    anyway.

    ``pre_normalized=True`` declares the input already IS a
    :func:`_simple_undirected` frame (least/greatest ``(u, v)``, no
    dups/self-loops/NULLs, checkpointed) and skips re-deriving it — the
    :func:`clustering_coefficients` composition shares ONE normalization
    pass + checkpoint instead of paying a redundant full distinct and a
    second checkpointed copy of the same edge set (the
    ``_small_star(pre_oriented=)`` precedent).
    """
    # checkpoint the simple undirected edge set BEFORE it fans out: deg
    # reads it twice (the union) and the orientation join once more, and
    # without the pin all three reads would re-run the caller's upstream
    # derivation (typically a fact-table aggregation — the expensive part)
    # fused one-materialization dispatch (_und_probe): the probe rows ARE
    # the edge list on the driver path — normalization AND the same
    # degree-oriented wedge count run in Python (bounded by the same
    # Σ outdeg² ≤ O(m^1.5)) instead of a distinct exchange + three joins
    # over a 25-node frame
    if pre_normalized:
        und = edges
        utype = und.schema["u"].dataType
        urows = (
            _probe_rows(und, driver_threshold)
            if driver_threshold > 0
            else None
        )
    else:
        und, urows, utype = _und_probe(edges, driver_threshold)
    if urows is not None:
        tri = _tri_counts_py(urows)
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("node", utype),
                T.StructField("n_triangles", T.LongType()),
            ]
        )
        if und is not None and not pre_normalized:
            # this call owns the normalization checkpoint and has fully
            # consumed it; a shared pre-normalized frame stays persisted
            _free_local_checkpoint(und)
        return _local_df(
            edges.sparkSession, sorted(tri.items()), schema
        )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    w = und.join(
        deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = w.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=True)
    ab = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"], "left_semi").select("a", "b", "c")
    # ONE read of the triangle frame: explode each triangle into its 3
    # corners (a 3-way union of tri would re-run the wedge join three
    # times — Catalyst does not CTE-materialize shared subtrees)
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def _tri_counts_py(urows: list) -> dict:
    """Per-node triangle counts over probed simple-undirected edge rows —
    the driver spelling of the degree-oriented wedge count: orient each
    edge from its lower-(degree, key) endpoint, intersect out-adjacency
    per oriented edge. Same Σ outdeg² wedge bound as the distributed
    joins, counts identical (orientation-invariant integers)."""
    deg: dict = {}
    for r in urows:
        deg[r.u] = deg.get(r.u, 0) + 1
        deg[r.v] = deg.get(r.v, 0) + 1
    out: dict = {}
    for r in urows:
        u, v = r.u, r.v
        if (deg[u], u) < (deg[v], v):
            out.setdefault(u, set()).add(v)
        else:
            out.setdefault(v, set()).add(u)
    tri: dict = {}
    for a, outa in out.items():
        for b in outa:
            outb = out.get(b)
            if not outb:
                continue
            for c in outa & outb:
                tri[a] = tri.get(a, 0) + 1
                tri[b] = tri.get(b, 0) + 1
                tri[c] = tri.get(c, 0) + 1
    return tri


def clustering_coefficients(
    edges: DataFrame,
    coeff_scale: int = 10**6,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Local clustering coefficients over the simple undirected graph:
    ``(node, degree, n_triangles, coeff_fp)`` where ``coeff_fp`` is the
    fixed-point ratio ``2·triangles·coeff_scale // (degree·(degree−1))``
    — how close each node's neighborhood is to a clique, the per-node
    companion of :func:`triangle_counts` (link-farm neighborhoods score
    near ``coeff_scale``; organic hubs near 0). Degree-<2 nodes carry 0
    (no possible wedge), and nodes appear iff they have at least one
    edge (callers left-join their node dimension, the triangle_counts
    contract).

    Integer arithmetic end to end (the pagerank_fixedpoint discipline):
    the ratio is a BIGINT floor-divide, so results are
    partition-order-independent and the catalog twin (x_clustering_trade)
    hash-pins them. Costs exactly triangle_counts + one degree aggregate
    reusing the SAME :func:`_simple_undirected` frame (ONE normalization
    pass + checkpoint, passed via ``pre_normalized=True``); one extra
    join on the node key.

    Overflow headroom (stated, not discovered): the intermediate
    ``2·n_triangles·coeff_scale`` needs ``n_triangles < 2^62/coeff_scale``
    (≈4.6e12 at the default 1e6) — reached only by a node of degree
    ~3e6 sitting in a near-clique, at which point lower ``coeff_scale``
    (the coefficient itself is always ≤ coeff_scale); ANSI mode aborts
    rather than wraps.
    """
    # fused one-materialization dispatch (_und_probe): normalization,
    # degrees, triangles and the fixed-point ratio all run in Python over
    # the probe rows (nonnegative ints, so Python // IS the BIGINT DIV)
    und, urows, utype = _und_probe(edges, driver_threshold)
    if urows is not None:
        degm: dict = {}
        for r in urows:
            degm[r.u] = degm.get(r.u, 0) + 1
            degm[r.v] = degm.get(r.v, 0) + 1
        tri = _tri_counts_py(urows)
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("node", utype),
                T.StructField("degree", T.LongType()),
                T.StructField("n_triangles", T.LongType()),
                T.StructField("coeff_fp", T.LongType()),
            ]
        )
        rows = [
            (
                n,
                d,
                tri.get(n, 0),
                (2 * tri.get(n, 0) * coeff_scale) // (d * (d - 1))
                if d >= 2
                else 0,
            )
            for n, d in sorted(degm.items())
        ]
        if und is not None:
            _free_local_checkpoint(und)
        return _local_df(edges.sparkSession, rows, schema)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    tri = triangle_counts(
        und, pre_normalized=True, driver_threshold=driver_threshold
    )
    out = deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    )
    return out.withColumn(
        "coeff_fp",
        F.when(
            F.col("degree") >= 2,
            F.expr(
                f"(2 * n_triangles * CAST({coeff_scale} AS BIGINT))"
                " DIV (degree * (degree - 1))"
            ),
        ).otherwise(F.lit(0)).cast("long"),
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_iter: int = 30,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Multi-source unweighted BFS hop counts over the simple undirected
    graph: ``(node, hops)`` = each reachable node's minimum hop distance
    from ANY source node — the reachability/distance primitive behind
    crawl-frontier expansion ("how many link hops from the seed list"),
    seed-set influence radii, and filtering a corpus graph to a
    neighborhood of trusted nodes. Unreachable nodes are absent (callers
    left-join their node dimension); source nodes return hops 0 even
    when isolated (a seed is at distance 0 from itself by definition).

    Semantics: simple undirected graph (direction / duplicate edges /
    self-loops / NULL endpoints ignored — the :func:`_simple_undirected`
    contract); deterministic by construction (a node's hop count is its
    FIRST discovery round — min over arrival orders, no tie to break).

    Scale shape: frontier BFS, not full relaxation — round ``i`` joins
    the (shrinking) frontier against the checkpointed symmetric edge
    list and anti-joins the known set, so each round's cost tracks the
    frontier's edge boundary, not the whole graph; rounds are bounded by
    the graph's eccentricity from the seed set (single-digit on web
    graphs — the small-world property); the convergence probe is ONE
    cheap ``isEmpty`` on the already-checkpointed new-nodes frame, and
    superseded rounds' checkpoints are released as they die
    (:func:`_free_local_checkpoint`, the k_core storage contract).
    ``max_iter`` is a loud backstop: non-convergence raises.
    """
    src_proj = sources.select(
        F.col(sources.columns[0]).alias("node")
    ).filter(F.col("node").isNotNull())
    dist0 = src_proj.distinct().select(
        "node", F.lit(0).cast("long").alias("hops")
    )
    # fused one-materialization dispatch (_und_probe): below threshold
    # the normalization AND the whole frontier loop run in Python over
    # the probe rows — the distinct checkpoint, symmetric checkpoint,
    # per-round semi/anti-joins and isEmpty probes were ~10 scheduled
    # jobs on a 25-node graph
    und, urows, utype = _und_probe(edges, driver_threshold)
    srows = (
        _distinct_probe_rows(src_proj, driver_threshold)
        if urows is not None
        else None
    )
    if srows is not None:
        if und is not None:
            _free_local_checkpoint(und)
        return _bfs_driver(urows, srows, utype, dist0, max_iter)
    if und is None:
        # driver-eligible edges but a seed set above threshold (>100k
        # sources on a <100k-edge graph): rebuild the distributed frame —
        # correct, just re-derives the (small) upstream once more
        und = _simple_undirected(edges)
    sym = (
        und.unionByName(
            und.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .localCheckpoint(eager=True)
    )
    # the one-directional frame is fully consumed by sym's materialization
    _free_local_checkpoint(und)
    dist = dist0.localCheckpoint(eager=True)
    frontier = dist
    for i in range(1, max_iter + 1):
        new = (
            sym.join(
                frontier.select(F.col("node").alias("u")), "u", "left_semi"
            )
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(i).cast("long").alias("hops"))
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            return dist
        old_dist, old_frontier = dist, frontier
        dist = old_dist.unionByName(new).localCheckpoint(eager=True)
        frontier = new
        # the superseded distance set and the PREVIOUS frontier are dead
        # the moment the new union materializes (this round's discovery
        # already consumed them); round 1's frontier IS the seed dist, so
        # guard against the double free
        _free_local_checkpoint(old_dist)
        if old_frontier is not old_dist:
            _free_local_checkpoint(old_frontier)
    raise RuntimeError(
        f"bfs_hops did not converge within max_iter={max_iter} rounds;"
        " raise max_iter (rounds are bounded by the seed set's graph"
        " eccentricity)"
    )


def _bfs_driver(
    urows: list, srows: list, utype, dist0: DataFrame,
    max_iter: int,
) -> DataFrame:
    """Driver fast path: the same frontier expansion over the probed
    edge/seed rows — hop counts are first-discovery rounds, identical to
    the distributed loop (no ties to break). Raises the same
    non-convergence error under the same condition (round ``max_iter``
    still discovering). The result schema mirrors the distributed
    union's type coercion: seed dtype alone when nothing was discovered,
    the seed/edge common type otherwise."""
    adj: dict = {}
    for r in urows:
        adj.setdefault(r.u, set()).add(r.v)
        adj.setdefault(r.v, set()).add(r.u)
    hops = {r.node: 0 for r in srows}
    frontier = set(hops)
    discovered = converged = False
    for i in range(1, max_iter + 1):
        new = set()
        for n in frontier:
            for nb in adj.get(n, ()):
                if nb not in hops:
                    new.add(nb)
        if not new:
            converged = True
            break
        discovered = True
        for n in new:
            hops[n] = i
        frontier = new
    if not converged:
        raise RuntimeError(
            f"bfs_hops did not converge within max_iter={max_iter} rounds;"
            " raise max_iter (rounds are bounded by the seed set's graph"
            " eccentricity)"
        )
    schema = (
        dist0.unionByName(
            dist0.limit(0).select(
                F.col("node").cast(utype).alias("node"), F.col("hops")
            )
        ).schema
        if discovered
        else dist0.schema
    )
    return _local_df(dist0.sparkSession, sorted(hops.items()), schema)


_SsspERow = namedtuple("_SsspERow", ["src", "dst", "w"])


def _dagg_rows_py(erows: list) -> list | None:
    """Driver spelling of the DIRECTED canonical aggregate shared by
    pagerank_fixedpoint / hits_fixedpoint: NULL endpoints dropped,
    per-(src, dst) weights SUMMED with SQL semantics (NULLs skipped;
    all-NULL pair → NULL, which the callers route to the engine).
    Returns None when any partial sum leaves int64 — the engine's
    BIGINT SUM would ANSI-abort there (the _wund_rows_py contract)."""
    agg: dict = {}
    for r in erows:
        s, d, w = r[0], r[1], r[2]
        if s is None or d is None:
            continue
        key = (s, d)
        if w is not None:
            cur = agg.get(key)
            t = w if cur is None else cur + w
            if not (-(2**63) <= t < 2**63):
                return None
            agg[key] = t
        else:
            agg.setdefault(key, None)
    return [_SsspERow(s, d, w) for (s, d), w in agg.items()]


def sssp_weighted(
    edges: DataFrame,
    sources: DataFrame,
    max_iter: int = 50,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Multi-source single-source-shortest-path over the DIRECTED
    integer-weighted graph: ``(node, dist)`` = each reachable node's
    minimum total edge cost from ANY source — the weighted complement of
    :func:`bfs_hops` (hop counts answer "how far"; this answers "how
    cheap": strongest-corridor proximity on a trade/link graph, crawl
    distance under per-link quality costs). Unreachable nodes are
    absent; sources carry an explicit 0. Direction is honored as given
    (callers symmetrize for undirected semantics); duplicate (src, dst)
    rows keep their MINIMUM cost (the only aggregation consistent with
    shortest-path semantics); self-loops and NULL endpoints drop (a
    positive-cost self-loop can never lie on a shortest path); weights
    must be POSITIVE integers (zero/negative raise — Bellman-Ford-with-
    frontier termination and the min-plus fixpoint both depend on it).

    Deterministic: min-plus over BIGINTs — no ties to break (equal-cost
    paths agree on the cost), partition-order-independent, hash-gate
    safe.

    Scale shape: delta-less frontier Bellman-Ford — each round relaxes
    only edges OUT OF nodes whose distance improved last round (one hash
    join + map-side-combinable min against the checkpointed edge list,
    one anti-join-flavored improvement filter), so round cost tracks the
    improving wavefront, not the graph; rounds are bounded by the
    longest shortest-path EDGE COUNT (small-world graphs: single
    digits); convergence is one ``isEmpty`` probe on the already-
    checkpointed improvement frame; superseded checkpoints are released
    (:func:`_free_local_checkpoint`). ``max_iter`` is the loud backstop.
    """
    if len(edges.columns) < 3:
        raise ValueError(
            "edges needs (src, dst, weight) columns — for unit costs pass"
            " F.lit(1) as the weight"
        )
    src, dst, w = edges.columns[:3]
    ecast = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(w).cast("long").alias("w"),
    )
    src_proj = sources.select(
        F.col(sources.columns[0]).alias("node")
    ).filter(F.col("node").isNotNull())
    dist0 = src_proj.distinct().select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    # fully-local fast path (the label_propagation discipline): a
    # driver-built local relation (e.g. x_sssp_trade's VALUES cost
    # frame) collects job-free — the min-aggregation canonicalization,
    # the weight guard and the frontier Bellman-Ford all run in Python,
    # skipping the eager checkpoint + probe jobs entirely. NULL weights
    # route to the engine (SQL MIN NULL-skipping semantics).
    if driver_threshold > 0 and _is_local_plan(ecast):
        raw = ecast.limit(driver_threshold + 1).collect()
        if len(raw) <= driver_threshold:
            agg: dict = {}
            nullw = False
            for r in raw:
                if r.src is None or r.dst is None or r.src == r.dst:
                    continue
                if r.w is None:
                    nullw = True
                    break
                key = (r.src, r.dst)
                cur = agg.get(key)
                if cur is None or r.w < cur:
                    agg[key] = r.w
            if not nullw:
                mn = min(agg.values(), default=None)
                if mn is not None and mn <= 0:
                    raise ValueError(
                        f"edge weights must be positive (min={mn})"
                    )
                srows = _distinct_probe_rows(src_proj, driver_threshold)
                if srows is not None:
                    erows = [
                        _SsspERow(s, d, wv) for (s, d), wv in agg.items()
                    ]
                    return _sssp_driver(erows, srows, ecast, dist0, max_iter)
    e = (
        ecast.filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    # one-job dispatch probe: weight guard + frontier Bellman-Ford in
    # Python over the probe rows (same checks, same messages, same
    # round/raise structure)
    erows = (
        _probe_rows(e, driver_threshold)
        if driver_threshold > 0
        else None
    )
    if erows is not None and any(r.w is None for r in erows):
        erows = None  # all-NULL-weight pairs: engine MIN semantics
    if erows is not None:
        mn = min((r.w for r in erows), default=None)
        if mn is not None and mn <= 0:
            raise ValueError(f"edge weights must be positive (min={mn})")
        srows = (
            _distinct_probe_rows(src_proj, driver_threshold)
            if driver_threshold > 0
            else None
        )
        if srows is not None:
            _free_local_checkpoint(e)
            return _sssp_driver(erows, srows, e, dist0, max_iter)
    else:
        wb = e.agg(F.min("w").alias("mn")).first()
        if wb.mn is not None and wb.mn <= 0:
            raise ValueError(f"edge weights must be positive (min={wb.mn})")
    dist = dist0.localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_iter):
        cand = (
            e.join(
                frontier.select(F.col("node").alias("src"), "dist"), "src"
            )
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("d"))
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        improved = (
            cand.join(dist, "node", "left")
            .filter(F.col("dist").isNull() | (F.col("d") < F.col("dist")))
            .select("node", F.col("d").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            return dist
        old_dist, old_frontier = dist, frontier
        dist = (
            old_dist.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
        _free_local_checkpoint(old_dist)
        if old_frontier is not old_dist:
            _free_local_checkpoint(old_frontier)
    raise RuntimeError(
        f"sssp_weighted did not converge within max_iter={max_iter} rounds;"
        " raise max_iter (rounds are bounded by the longest shortest-path"
        " edge count)"
    )


def _sssp_driver(
    erows: list, srows: list, e: DataFrame, dist0: DataFrame,
    max_iter: int,
) -> DataFrame:
    """Driver fast path: the same frontier Bellman-Ford over the probed
    (min-aggregated) edge rows — min-plus over Python ints, identical
    distances (no ties exist), same round/raise structure as the
    distributed loop. Result schema mirrors the distributed union's
    coercion (see _bfs_driver)."""
    adj: dict = {}
    for r in erows:
        adj.setdefault(r.src, []).append((r.dst, r.w))
    dist = {r.node: 0 for r in srows}
    frontier = set(dist)
    discovered = converged = False
    for _ in range(max_iter):
        cand: dict = {}
        for n in frontier:
            dn = dist[n]
            for m, w in adj.get(n, ()):
                nd = dn + w
                if m not in cand or nd < cand[m]:
                    cand[m] = nd
        improved = {
            m: d for m, d in cand.items() if m not in dist or d < dist[m]
        }
        if not improved:
            converged = True
            break
        discovered = True
        dist.update(improved)
        frontier = set(improved)
    if not converged:
        raise RuntimeError(
            f"sssp_weighted did not converge within max_iter={max_iter}"
            " rounds; raise max_iter (rounds are bounded by the longest"
            " shortest-path edge count)"
        )
    schema = (
        dist0.unionByName(
            e.select(
                F.col("dst").alias("node"),
                F.lit(0).cast("long").alias("dist"),
            ).limit(0)
        ).schema
        if discovered
        else dist0.schema
    )
    return _local_df(e.sparkSession, sorted(dist.items()), schema)


def k_core(
    edges: DataFrame, k: int, max_iter: int = 100,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Nodes of the graph's k-core: ``(node, degree)`` after repeatedly
    deleting every node of degree < ``k`` (degree recomputed each round)
    — the density filter crawl curation uses to isolate tightly
    interlinked clusters (a link farm survives high-k cores; organic
    long-tail sites peel out immediately) and the standard preprocessing
    cut before community detection. Returned degrees are WITHIN-core
    degrees (≥ k by definition).

    Semantics: simple undirected graph (direction / duplicate edges /
    self-loops / NULL endpoints ignored, the triangle_counts contract);
    k ≤ 1 returns every non-isolated node with its full degree (isolated
    nodes never appear — callers left-join their node dimension).

    Scale shape: each peel round is one map-side-combinable degree
    aggregate + two semi-joins re-filtering the CHECKPOINTED edge set —
    never a collect; rounds converge in at most the peel depth of the
    graph (bounded by the degeneracy ordering length, typically a few
    dozen on web graphs) and the fixpoint check is ONE aggregate job over
    the checkpointed degree frame (``count`` + ``count_if(degree >= k)``
    in the same pass — two separate ``count()`` actions would double the
    per-round job-scheduling latency on deep peels). Superseded rounds'
    checkpoints are released as soon as the next round materializes
    (:func:`_free_local_checkpoint`), so retained storage is O(1) rounds,
    not O(peel depth). Deterministic: the surviving set is unique (the
    k-core is closed under order of deletions — a classic invariant — so
    no tie-breaking is even needed). ``max_iter`` is a loud configuration
    backstop, not a silent truncation: non-convergence raises.
    """
    # fused one-materialization dispatch (_und_probe): normalization and
    # the peel loop run in Python over the probe rows (the k-core is
    # unique under any deletion order, and the round structure —
    # including the max_iter raise — mirrors exactly)
    und, urows, utype = _und_probe(edges, driver_threshold)
    if urows is not None:
        edges_py = [(r.u, r.v) for r in urows]
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("node", utype),
                T.StructField("degree", T.LongType()),
            ]
        )
        for _ in range(max_iter):
            degm: dict = {}
            for u, v in edges_py:
                degm[u] = degm.get(u, 0) + 1
                degm[v] = degm.get(v, 0) + 1
            surv = {n for n, d in degm.items() if d >= k}
            if len(surv) == len(degm):
                if und is not None:
                    _free_local_checkpoint(und)
                return _local_df(
                    edges.sparkSession,
                    sorted((n, degm[n]) for n in surv),
                    schema,
                )
            edges_py = [
                (u, v) for u, v in edges_py if u in surv and v in surv
            ]
        if und is not None:
            # the middle-case dispatch checkpoint (raw above threshold,
            # deduped fits) is owned here — free it before raising so a
            # non-convergence backstop doesn't leak its storage blocks
            _free_local_checkpoint(und)
        raise RuntimeError(
            f"k_core did not converge within max_iter={max_iter} peel"
            " rounds; raise max_iter (rounds are bounded by the graph's"
            " peel depth)"
        )
    prev_und = prev_deg = None
    for _ in range(max_iter):
        deg = (
            und.select(F.col("u").alias("node"))
            .unionByName(und.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            .localCheckpoint(eager=True)
        )
        # the previous round's degree frame is superseded the moment this
        # one materializes (nothing references it: survivors/und of the
        # NEW round read only the new deg and the current und)
        if prev_deg is not None:
            _free_local_checkpoint(prev_deg)
        prev_deg = deg
        survivors = deg.filter(F.col("degree") >= k)
        n_all, n_surv = deg.agg(
            F.count(F.lit(1)), F.count_if(F.col("degree") >= k)
        ).first()
        if n_surv == n_all:
            # the returned frame reads THIS round's deg checkpoint — it
            # (and the final und, by paranoia of callers re-deriving)
            # stays persisted; only superseded rounds were released
            return survivors.select("node", "degree")
        new_und = (
            und.join(
                survivors.select(F.col("node").alias("u")), "u", "left_semi"
            )
            .join(
                survivors.select(F.col("node").alias("v")), "v", "left_semi"
            )
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        # likewise: the shrunken edge set is materialized, its parent
        # round's edges are dead — EXCEPT the caller's input frame when
        # pre-normalized elsewhere; we only ever free frames this loop
        # itself checkpointed (prev_und starts None: round 1's input und
        # may be shared via _simple_undirected's contract)
        if prev_und is not None:
            _free_local_checkpoint(prev_und)
        prev_und = new_und
        und = new_und
    raise RuntimeError(
        f"k_core did not converge within max_iter={max_iter} peel rounds;"
        " raise max_iter (rounds are bounded by the graph's peel depth)"
    )


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 4,
    node_type: str = "long",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Community detection by synchronous weighted label propagation
    (Raghavan et al. 2007, determinized): ``(node, community)`` after
    EXACTLY ``n_iter`` rounds over the UNDIRECTED weighted graph — the
    classic "who trades/links inside a bloc" clustering that k-core
    (density cut) and connected components (reachability) don't answer.

    Update rule (everything integer):
        label0(v)   = v                      (node ids must be integral)
        score(v, l) = Σ_{u ∈ N(v), label(u)=l} w(v, u)
        label(v)    = argmax_l score(v, l), ties to the SMALLEST label;
                      a node with no in-universe neighbors keeps its label
    Edges canonicalize to the simple undirected weighted graph first:
    (least, greatest) endpoint ordering with BOTH directions' (and
    duplicates') weights SUMMED, self-loops / NULL endpoints dropped,
    out-of-universe endpoints dropped (the pagerank_fixedpoint subgraph
    contract).

    Deterministic BY CONSTRUCTION, not by convergence: synchronous
    updates + the smallest-label tie-break make every round a pure
    function of the previous labeling, and the loop runs EXACTLY
    ``n_iter`` rounds with NO early exit — synchronous LPA can 2-cycle
    on bipartite-ish structure (the textbook oscillation), so a
    stability early-exit would make the answer depend on which side of
    the cycle a round lands on and break parity with the unrolled-CTE
    oracle twin. Fixed rounds are bit-portable regardless of
    convergence; callers wanting a fixpoint raise ``n_iter`` and accept
    the oscillation caveat (DETERMINISM.md rule 5: remove the
    instability, don't pin it).

    **Adaptive physical strategy** (the pagerank_fixedpoint discipline):
    below ``driver_threshold`` the loop runs on the collected aggregate
    with Python integers — BIT-IDENTICAL to the distributed loop
    (property-pinned); above it, each round is ONE hash join of the
    symmetric edge list against the previous labeling + a map-side-
    combinable (node, label) weight sum + a deterministic struct-max
    argmax — two exchanges per round on the label-mass aggregate, the
    checkpointed edge list never reshuffles; superseded label
    checkpoints are released (:func:`_free_local_checkpoint`).
    """
    if len(edges.columns) < 3:
        raise ValueError(
            "edges needs (src, dst, weight) columns — for an unweighted"
            " graph pass F.lit(1) as the weight"
        )
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0 (got {n_iter})")
    src, dst, w = edges.columns[:3]
    nd_proj = nodes.select(
        F.col(nodes.columns[0]).cast(node_type).alias("node")
    ).filter(F.col("node").isNotNull())
    nd_plan = nd_proj.distinct()
    # fully-local fast path (optimization round 1): when the edge input
    # is a driver-built local relation (the sparsify fast path's VALUES
    # output), collecting it schedules NO job — the canonical weighted
    # aggregate, the subgraph restriction and the whole loop run in
    # Python, replacing the node checkpoint + und checkpoint + two probe
    # jobs (measured ~0.55 s / 3 jobs for the und checkpoint alone over
    # a 625-row local input). _wund_rows_py returns None on any int64
    # sum overflow, falling back to the engine's ANSI-abort semantics.
    ecast = edges.select(
        F.col(src).cast(node_type).alias("src"),
        F.col(dst).cast(node_type).alias("dst"),
        F.col(w).cast("long").alias("w"),
    )
    if driver_threshold > 0 and _is_local_plan(ecast):
        nrows = _distinct_probe_rows(nd_proj, driver_threshold)
        if nrows is not None:
            if len(nrows) == 0:
                return nd_plan.select(
                    "node", F.col("node").cast("long").alias("community")
                )
            erows = ecast.limit(driver_threshold + 1).collect()
            if len(erows) <= driver_threshold:
                urows = _wund_rows_py(erows, {r.node for r in nrows})
                if (
                    urows is not None
                    and len(urows) <= driver_threshold
                    # all-NULL-weight pairs sum to NULL; the engine's
                    # NULL-skipping MIN/SUM define that behavior, so
                    # those inputs take the distributed spelling
                    and not any(r.w is None for r in urows)
                ):
                    _check_weights_rows(r.w for r in urows)
                    return _lpa_driver(urows, nrows, nd_plan, n_iter)
    node_df = nd_plan.localCheckpoint(eager=True)
    # eager checkpoint BEFORE the first action (the hits_fixedpoint
    # discipline): the weight guard, the size probe and the driver
    # collect below are three separate actions — without the pin each
    # would re-run the caller's upstream derivation (typically the
    # fact-table aggregation, the expensive part; measured 4.7 → 2.0 s
    # on x_communities_trade)
    und = (
        edges.select(
            F.least(
                F.col(src).cast(node_type), F.col(dst).cast(node_type)
            ).alias("u"),
            F.greatest(
                F.col(src).cast(node_type), F.col(dst).cast(node_type)
            ).alias("v"),
            F.col(w).cast("long").alias("w"),
        )
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .join(node_df.select(F.col("node").alias("u")), "u", "left_semi")
        .join(node_df.select(F.col("node").alias("v")), "v", "left_semi")
        .localCheckpoint(eager=True)
    )
    # one-job dispatch probe (the pagerank_fixedpoint discipline): the
    # probe rows ARE the collected inputs on the driver path; the weight
    # guard runs in Python over them — same check, same message
    nrows = (
        _probe_rows(node_df, driver_threshold)
        if driver_threshold > 0
        else None
    )
    if nrows is not None and len(nrows) == 0:
        return node_df.select(
            "node", F.col("node").cast("long").alias("community")
        )
    urows = _probe_rows(und, driver_threshold) if nrows is not None else None
    if urows is not None and any(r.w is None for r in urows):
        urows = None  # NULL-weight pairs: engine semantics (see above)
    if urows is not None:
        _check_weights_rows(r.w for r in urows)
        return _lpa_driver(urows, nrows, node_df, n_iter)
    wb = und.agg(F.min("w").alias("mn")).first()
    if wb.mn is not None and wb.mn <= 0:
        raise ValueError(f"edge weights must be positive (min={wb.mn})")
    n = node_df.count()
    if n == 0:
        return node_df.select(
            "node", F.col("node").cast("long").alias("community")
        )
    # both orientations of the canonical undirected edge — each round
    # reads it once, so checkpoint the symmetric spelling, not und
    es = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"), "w")
        .unionByName(
            und.select(F.col("v").alias("node"), F.col("u").alias("nbr"), "w")
        )
        .localCheckpoint(eager=True)
    )
    lab = node_df.select(
        "node", F.col("node").cast("long").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        # argmax by (weight mass, then SMALLEST label) as ONE struct-max:
        # max(struct(s, -l)) picks max s then max(-l) = min l — integer,
        # partition-order-independent, hash-gate safe
        best = (
            es.join(
                lab.select(F.col("node").alias("nbr"),
                           F.col("label").alias("l")),
                "nbr",
            )
            .groupBy("node", "l")
            .agg(F.sum("w").alias("s"))
            .groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("s"), (-F.col("l")).alias("negl"))
                ).alias("b")
            )
            .select("node", (-F.col("b.negl")).alias("nl"))
        )
        old = lab
        lab = (
            old.join(best, "node", "left")
            .select(
                "node", F.coalesce(F.col("nl"), F.col("label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        _free_local_checkpoint(old)
    return lab.select("node", F.col("label").alias("community"))


def _lpa_driver(
    urows: list, nrows: list, node_df: DataFrame, n_iter: int
) -> DataFrame:
    """Driver fast path: the same update rule over the collected
    aggregate — bit-identical to the distributed loop (all integer; the
    property suite compares both against an independent replica)."""
    spark = node_df.sparkSession
    nodes = [r.node for r in nrows]
    eu = [(r.u, r.v, r.w) for r in urows]
    lab = {v: int(v) for v in nodes}
    for _ in range(n_iter):
        scores: dict = {v: {} for v in nodes}
        for u, v, w in eu:
            scores[u][lab[v]] = scores[u].get(lab[v], 0) + w
            scores[v][lab[u]] = scores[v].get(lab[u], 0) + w
        lab = {
            v: (
                max(sc.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                if sc
                else lab[v]
            )
            for v, sc in scores.items()
        }
    out_type = dict(node_df.dtypes)["node"]
    return _local_df(
        spark,
        [(v, lab[v]) for v in nodes],
        f"node {out_type}, community long",
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    scale: int = 10**6,
    node_type: str = "long",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Newman modularity of a community partition over the UNDIRECTED
    weighted graph, in FIXED-POINT integers: one row per community
    ``(community, w_in, d_tot, contrib_fp)`` plus the partition total as
    the ``contrib_fp`` sum —
        Q = Σ_c [ w_in(c)/m  −  (d_tot(c)/(2m))² ]
    with m = total undirected edge weight, w_in(c) = intra-community
    edge weight, d_tot(c) = Σ weighted degrees. Spelled exactly as
        contrib_fp = (2·w_in·2m − d_tot²) · scale  div  (2m)²
    — pure BIGINT products and ONE floor divide per community (the
    pagerank_fixedpoint discipline: remove the rational, don't round
    it twice), so the score is bit-portable and an unrolled-CTE oracle
    can pin it. The quality metric for :func:`label_propagation`'s
    output (a partition with Q ≈ 0 is no better than random edge
    placement; density alone — k-core — can't say that).

    Input contract matches label_propagation: edges canonicalize to the
    simple undirected weighted graph (least/greatest, BOTH directions'
    and duplicates' weights SUMMED, self-loops/NULLs dropped); labels =
    ``(node, community)``, one row per node (duplicate nodes raise —
    a node in two communities makes Q undefined); edges whose endpoint
    has no label row DROP (the subgraph contract). Overflow guarded
    loudly: needs (2m)²·scale and 2·max(w_in)·2m·scale below 2^63.

    Scale shape: two map-side-combinable aggregations (per-community
    intra-edge weight via a 2-key label join; per-community degree via
    a 1-key join) + a 1-row total broadcast — no iteration, nothing
    corpus-sized shuffles twice.
    """
    if len(edges.columns) < 3:
        raise ValueError(
            "edges needs (src, dst, weight) columns — for an unweighted"
            " graph pass F.lit(1) as the weight"
        )
    src, dst, w = edges.columns[:3]
    lab = labels.select(
        F.col(labels.columns[0]).cast(node_type).alias("node"),
        F.col(labels.columns[1]).cast("long").alias("community"),
    ).filter(F.col("node").isNotNull())
    # one-job dispatch probe (the pagerank_fixedpoint discipline): when
    # the label table fits, the duplicate-node guard runs in Python over
    # the probe rows (same check, same message) and — if the joined edge
    # aggregate also fits — the whole Q decomposition does too
    lrows = (
        _probe_rows(lab, driver_threshold)
        if driver_threshold > 0
        else None
    )
    if lrows is not None:
        seen: dict = {}
        for r in lrows:
            seen[r.node] = seen.get(r.node, 0) + 1
        dups = [n for n in sorted(seen) if seen[n] > 1][:5]
        if dups:
            raise ValueError(
                "labels must map each node to exactly one community"
                f" (duplicates: {dups})"
            )
    else:
        dup = lab.groupBy("node").count().filter(F.col("count") > 1)
        if not dup.isEmpty():
            raise ValueError(
                "labels must map each node to exactly one community"
                f" (duplicates: {[r.node for r in dup.limit(5).collect()]})"
            )
    # fully-local fast path (the label_propagation discipline): when the
    # edge input is a driver-built local relation (sparsify VALUES) and
    # the label table is already in hand, the canonical weighted
    # aggregate + both label joins run in Python — the distributed und
    # checkpoint over a 625-row local input measured ~0.5 s / 3 jobs.
    # _wund_rows_py returns None on int64 sum overflow (engine ANSI
    # semantics preserved via the distributed fallback).
    if lrows is not None:
        ecast = edges.select(
            F.col(src).cast(node_type).alias("src"),
            F.col(dst).cast(node_type).alias("dst"),
            F.col(w).cast("long").alias("w"),
        )
        if _is_local_plan(ecast):
            erows = ecast.limit(driver_threshold + 1).collect()
            if len(erows) <= driver_threshold:
                pairs = _wund_rows_py(erows, None)
                if (
                    pairs is not None
                    and len(pairs) <= driver_threshold
                    # all-NULL-weight pairs: engine NULL-skipping
                    # semantics — distributed spelling (the LPA rule)
                    and not any(p.w is None for p in pairs)
                ):
                    labm = {r.node: r.community for r in lrows}
                    urows = [
                        _MUndRow(p.u, p.v, p.w, labm[p.u], labm[p.v])
                        for p in pairs
                        if p.u in labm and p.v in labm
                    ]
                    return _modularity_driver(urows, lrows, lab, scale)
    und = (
        edges.select(
            F.least(
                F.col(src).cast(node_type), F.col(dst).cast(node_type)
            ).alias("u"),
            F.greatest(
                F.col(src).cast(node_type), F.col(dst).cast(node_type)
            ).alias("v"),
            F.col(w).cast("long").alias("w"),
        )
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .join(
            lab.select(F.col("node").alias("u"), F.col("community").alias("cu")),
            "u",
        )
        .join(
            lab.select(F.col("node").alias("v"), F.col("community").alias("cv")),
            "v",
        )
        .localCheckpoint(eager=True)
    )
    urows = _probe_rows(und, driver_threshold) if lrows is not None else None
    if urows is not None and any(r.w is None for r in urows):
        urows = None  # NULL-weight pairs: engine semantics (see above)
    if urows is not None:
        return _modularity_driver(urows, lrows, lab, scale)
    wb = und.agg(F.min("w").alias("mn"), F.sum("w").alias("m")).first()
    if wb.mn is not None and wb.mn <= 0:
        raise ValueError(f"edge weights must be positive (min={wb.mn})")
    m = wb.m or 0
    if m == 0:
        return lab.select("community").distinct().select(
            "community",
            F.lit(0).cast("long").alias("w_in"),
            F.lit(0).cast("long").alias("d_tot"),
            F.lit(0).cast("long").alias("contrib_fp"),
        )
    if (2 * m) ** 2 * scale >= 2**63 or 2 * m * 2 * m * scale >= 2**63:
        raise ValueError(
            f"fixed-point scale overflows int64: need (2m)^2*scale"
            f" ((2*{m})^2*{scale}) below 2^63 — lower scale or"
            " pre-normalize weights"
        )
    w_in = (
        und.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.sum("w").alias("w_in"))
    )
    deg = (
        und.select(F.col("cu").alias("community"), "w")
        .unionByName(und.select(F.col("cv").alias("community"), "w"))
        .groupBy("community")
        .agg(F.sum("w").alias("d_tot"))
    )
    two_m = 2 * m
    # contrib can be NEGATIVE (a community sparser than random), so the
    # division operator's negative semantics are load-bearing: Spark's
    # DIV and DuckDB's // BOTH truncate toward zero (-7/2 → -3,
    # verified), so the fixed-point quotient is cross-engine exact.
    # Plain Column `/` would be IEEE double division — never use it in
    # a hash-gated integer path.
    contrib = F.expr(
        f"CAST(((2L * w_in * {two_m}L - d_tot * d_tot) * {scale}L)"
        f" DIV {two_m * two_m}L AS BIGINT)"
    )
    return (
        lab.select("community")
        .distinct()
        .join(w_in, "community", "left")
        .join(deg, "community", "left")
        .select(
            "community",
            F.coalesce(F.col("w_in"), F.lit(0)).cast("long").alias("w_in"),
            F.coalesce(F.col("d_tot"), F.lit(0)).cast("long").alias("d_tot"),
        )
        .select("community", "w_in", "d_tot", contrib.alias("contrib_fp"))
    )


def _modularity_driver(
    urows: list, lrows: list, lab: DataFrame, scale: int
) -> DataFrame:
    """Driver fast path: the same Q decomposition over the probed
    (u, v, w, cu, cv) edge aggregate — pure integer arithmetic, same
    guards, same messages, bit-identical to the distributed
    aggregations (the test suite pins both against each other).
    SQL-semantics notes carried over exactly: a NULL community label
    never equi-joins, so its row reports (community, 0, 0, 0); the
    fixed-point quotient truncates toward zero (Spark DIV / DuckDB //),
    NOT Python's flooring ``//`` — spelled with the sign split below."""
    spark = lab.sparkSession
    mn = None
    m = 0
    for r in urows:
        w = r.w
        if mn is None or w < mn:
            mn = w
        m += w
    if mn is not None and mn <= 0:
        raise ValueError(f"edge weights must be positive (min={mn})")
    comms = sorted(
        {r.community for r in lrows}, key=lambda c: (c is None, c)
    )
    out_schema = "community long, w_in long, d_tot long, contrib_fp long"
    if m == 0:
        return _local_df(spark, [(c, 0, 0, 0) for c in comms], out_schema)
    if (2 * m) ** 2 * scale >= 2**63 or 2 * m * 2 * m * scale >= 2**63:
        raise ValueError(
            f"fixed-point scale overflows int64: need (2m)^2*scale"
            f" ((2*{m})^2*{scale}) below 2^63 — lower scale or"
            " pre-normalize weights"
        )
    w_in: dict = {}
    d_tot: dict = {}
    for r in urows:
        # cu == cv under SQL semantics: NULL labels compare unknown —
        # never intra; NULL groupBy keys aggregate but never re-join,
        # so skipping them entirely reproduces the coalesce(_, 0) rows
        if r.cu is not None:
            if r.cu == r.cv:
                w_in[r.cu] = w_in.get(r.cu, 0) + r.w
            d_tot[r.cu] = d_tot.get(r.cu, 0) + r.w
        if r.cv is not None:
            d_tot[r.cv] = d_tot.get(r.cv, 0) + r.w
    two_m = 2 * m
    den = two_m * two_m
    rows = []
    for c in comms:
        wi = w_in.get(c, 0) if c is not None else 0
        dt = d_tot.get(c, 0) if c is not None else 0
        num = (2 * wi * two_m - dt * dt) * scale
        q = num // den if num >= 0 else -((-num) // den)
        rows.append((c, wi, dt, q))
    return _local_df(spark, rows, out_schema)


# -- deterministic random walks (DeepWalk-style corpus generation) ----------

#: walk-step hash constants: idx = ((h1(cur, step, wid))² + E) mod P mod deg
#: with h1 = ((cur mod P)·A + step·B + wid·C + D) mod P. Everything stays
#: below 2^63 ((P−1)·A ≈ 1.1e18; h1² < 1e18), the quadratic pass breaks the
#: linearity that would correlate step choice with the sorted neighbor rank
#: (a purely linear-mod-P hash walks "monotone" paths on contiguous id
#: ranges), and the arithmetic is plain BIGINT ·/+/% — expressible
#: identically in Spark SQL and DuckDB, which is what makes the walks
#: oracle-checkable cross-engine.
WALK_P = 1_000_000_007
WALK_A = 1_103_515_245
WALK_B = 12_345
WALK_C = 789_221
WALK_D = 41
WALK_E = 2_531_011


def _walk_h1_sql(cur: str, step: int, wid: str) -> str:
    """The linear pass of the walk-step hash, as SQL text shared verbatim
    by the Spark loop and the DuckDB oracle twin (one spelling, two
    engines — the catalog's cross-dialect discipline)."""
    return (
        f"((({cur}) % {WALK_P}) * {WALK_A} + {step} * {WALK_B}"
        f" + ({wid}) * {WALK_C} + {WALK_D}) % {WALK_P}"
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    num_walks: int = 2,
    node_type: str = "long",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Deterministic hash-seeded random walks over the simple undirected
    graph — the DeepWalk/node2vec corpus-generation primitive (Perozzi et
    al. 2014, public), determinized so a hash gate can pin every step:
    ``(start, wid, step, node)`` for ``num_walks`` walks per node and
    steps 0..walk_len, where step t moves from ``cur`` to its
    ``idx``-th smallest neighbor with
        idx = ((h1² + E) mod P) mod deg(cur),
        h1  = ((cur mod P)·A + t·B + wid·C + D) mod P
    — a pure function of (cur, t, wid), so walks are reproducible across
    engines, partitionings and retries (no RNG state; the "randomness"
    is the quadratic-mixed hash, the same determinization the catalog's
    sampling operators use). Every node of the graph starts
    ``num_walks`` walks; isolated nodes (degree 0 after simplification)
    have no adjacency row and start none.

    **Adaptive physical strategy** (the pagerank_fixedpoint discipline):
    at or below ``driver_threshold`` undirected edges the walk runs on
    the collected adjacency with Python ints — bit-identical to the
    distributed loop (property-pinned). Above it, the sorted-neighbor
    rank table ``(node, nbr, rank)`` and the degree table are built ONCE
    (one shuffle each on node) and eagerly checkpointed; each step is
    then TWO fixed-width hash joins (cur→deg for the index, (cur,
    idx)→rank for the move) — no adjacency arrays ever shuffle, so a
    skewed hub costs its bucket size, not a replicated array. Walk
    frames are walker-count-sized (nodes × num_walks), constant across
    steps; every step frame is part of the result, so all walk_len+1
    step checkpoints are retained until the caller is done with the
    output (bounded: (walk_len+1) × walkers rows of 3 fixed-width cols).
    """
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0 (got {walk_len})")
    if num_walks < 1:
        raise ValueError(f"num_walks must be >= 1 (got {num_walks})")
    src, dst = edges.columns[:2]
    spark = edges.sparkSession
    out_schema = f"start {node_type}, wid int, step int, node {node_type}"
    # fused one-materialization dispatch (_und_probe): the probe rows ARE
    # the collected adjacency on the driver path, normalized in Python
    # (old shape: distinct exchange + checkpoint, then count + collect)
    und, urows, _ = _und_probe(
        edges.select(
            F.col(src).cast(node_type).alias("src"),
            F.col(dst).cast(node_type).alias("dst"),
        ),
        driver_threshold,
    )
    if urows is not None:
        if und is not None:
            _free_local_checkpoint(und)
        return _local_df(
            spark, _walks_driver(urows, walk_len, num_walks), out_schema
        )
    adj = und.selectExpr("u AS node", "v AS nbr").unionByName(
        und.selectExpr("v AS node", "u AS nbr")
    )
    from pyspark.sql import Window

    rk = adj.withColumn(
        "rank", F.row_number().over(Window.partitionBy("node").orderBy("nbr"))
    ).localCheckpoint(eager=True)
    dg = rk.groupBy("node").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    wid_arr = F.array([F.lit(i).cast("int") for i in range(num_walks)])
    w = dg.select(
        F.col("node").alias("start"),
        F.explode(wid_arr).alias("wid"),
        F.col("node").alias("cur"),
    ).localCheckpoint(eager=True)
    outs = [
        w.select(
            "start", "wid", F.lit(0).cast("int").alias("step"),
            F.col("cur").alias("node"),
        )
    ]
    # rename the join sides once: w/dg/rk all descend from adj, and a
    # straight three-way self-join leaves `node` ambiguous to the analyzer
    degj = dg.selectExpr("node AS _dnode", "deg")
    rkj = rk.selectExpr("node AS _rnode", "nbr AS _rnbr", "rank AS _rrank")
    for t in range(1, walk_len + 1):
        # wid is INT; promote before the * WALK_C multiply so a large
        # num_walks can't int32-overflow (ANSI mode would throw, not wrap)
        h1 = _walk_h1_sql("cur", t, "CAST(wid AS BIGINT)")
        stepped = (
            w.join(degj, F.col("cur") == F.col("_dnode"))
            .withColumn("_h1", F.expr(h1))
            .withColumn(
                "_rank",
                F.expr(f"1 + ((_h1 * _h1 + {WALK_E}) % {WALK_P}) % deg"),
            )
            .join(
                rkj,
                (F.col("cur") == F.col("_rnode"))
                & (F.col("_rank") == F.col("_rrank")),
            )
            .select("start", "wid", F.col("_rnbr").alias("cur"))
        )
        # Every step frame IS part of the output (outs[t] projects it at
        # the final union), so — unlike the pagerank/LPA loops where only
        # the latest state survives — superseded checkpoints must NOT be
        # freed here. Retention is bounded: walk_len+1 frames of exactly
        # nodes×num_walks rows × 3 fixed-width columns each.
        w = stepped.localCheckpoint(eager=True)
        outs.append(
            w.select(
                "start", "wid", F.lit(t).cast("int").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _walks_driver(und_rows, walk_len: int, num_walks: int):
    """Driver fast path: the same walk with Python ints over the collected
    simple undirected edge list — bit-identical to the distributed loop
    (property-pinned against it and an independent replica)."""
    adj: dict = {}
    for r in und_rows:
        adj.setdefault(r.u, set()).add(r.v)
        adj.setdefault(r.v, set()).add(r.u)
    nbrs = {n: sorted(s) for n, s in adj.items()}
    rows = []
    for start in sorted(nbrs):
        for wid in range(num_walks):
            cur = start
            rows.append((start, wid, 0, cur))
            for t in range(1, walk_len + 1):
                h1 = (
                    (cur % WALK_P) * WALK_A + t * WALK_B
                    + wid * WALK_C + WALK_D
                ) % WALK_P
                idx = ((h1 * h1 + WALK_E) % WALK_P) % len(nbrs[cur])
                cur = nbrs[cur][idx]
                rows.append((start, wid, t, cur))
    return rows


def walk_skipgrams(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram (center, context) pair counts from walk trajectories —
    the word2vec corpus step after DeepWalk's walk generation (Mikolov et
    al. 2013, public): for every walk and every ordered position pair
    within ``window`` steps, emit (center node, context node), then count
    — ``(center, context, cnt)`` is exactly the co-occurrence table a
    downstream embedding trainer consumes. Symmetric by construction
    (i→j and j→i both emit), diagonal excluded.

    ``walks`` must carry (start, wid, step, node) — the random_walks
    contract; (start, wid) identifies a trajectory and step orders it.

    Scale shape: ONE exchange groups each trajectory's steps into a
    sorted array (trajectories are walk_len+1 rows — tiny, bounded, no
    skew possible: every key has identical cardinality by construction),
    the pair fan-out is a ROW-LOCAL nested array transform (≤ 2·window
    pairs per position, all inside whole-stage codegen — no self-join,
    so the walk table is shuffled once, not twice, and the join-side
    duplication of a step-range self-join never materializes), and the
    count is a map-side-combinable aggregation on the pair keys. Output
    is ≤ nodes² rows but typically ≪ (the co-occurrence support)."""
    if window < 1:
        raise ValueError(f"window must be >= 1 (got {window})")
    for c in ("start", "wid", "step", "node"):
        if c not in walks.columns:
            raise ValueError(f"walks is missing column '{c}'")
    seq = walks.groupBy("start", "wid").agg(
        F.array_sort(F.collect_list(F.struct("step", "node"))).alias("seq")
    )
    pairs = seq.select(
        F.explode(
            F.expr(
                "flatten(transform(seq, c ->"
                " transform("
                f"  filter(seq, x -> x.step <> c.step"
                f"             AND abs(x.step - c.step) <= {int(window)}),"
                "  x -> struct(c.node AS center, x.node AS context))))"
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.center").alias("center"), F.col("p.context").alias("context")
    ).agg(F.count(F.lit(1)).alias("cnt"))


#: second-order walk hash: adds the PREVIOUS node to the linear pass so
#: the step choice is a pure function of the full walker state
#: (prev, cur, t, wid). (P-1)·(A+F) ≈ 2.3e18 would overflow past 2^63 if
#: both products peaked together, so the prev term is reduced mod P
#: BEFORE adding: each product < 1.2e18, the sum < 2.4e18 — still over?
#: No: ((cur%P)*A) % P and ((prev%P)*F) % P are each < P ≈ 1e9 after the
#: inner mod, so the combined linear form stays far below 2^63.
WALK_F = 69_069


def _walk_h2_sql(prev: str, cur: str, step: int, wid: str) -> str:
    """Linear pass of the SECOND-ORDER walk-step hash — one spelling for
    the Spark loop and the DuckDB oracle twin. Inner mods keep every
    intermediate below 2^63 (see WALK_F note)."""
    return (
        f"(((({cur}) % {WALK_P}) * {WALK_A}) % {WALK_P}"
        f" + ((({prev}) % {WALK_P}) * {WALK_F}) % {WALK_P}"
        f" + {step} * {WALK_B} + ({wid}) * {WALK_C} + {WALK_D}) % {WALK_P}"
    )


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 4,
    num_walks: int = 2,
    w_return: int = 1,
    w_common: int = 4,
    w_out: int = 2,
    node_type: str = "long",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Deterministic second-order (node2vec-style) biased walks over the
    simple undirected graph — Grover & Leskovec 2016's p/q bias,
    re-expressed with INTEGER class weights so the walk stays
    hash-gate-exact: from ``cur`` with previous node ``prev``, each
    sorted neighbor ``x`` weighs
        w_return  if x == prev            (backtrack;   ≈ 1/p)
        w_common  if x adjacent to prev   (triangle/BFS-ish; ≈ 1)
        w_out     otherwise               (exploration; ≈ 1/q)
    and the step picks the first sorted neighbor whose cumulative weight
    exceeds ``((h2² + E) mod P) mod T`` (T = total weight), with ``h2``
    linear in (prev, cur, t, wid) — a pure function of the walker state,
    reproducible across engines, partitionings and retries. ``prev``
    initializes to the start node itself, which makes step 1 uniform
    over the weighted classes naturally: every neighbor of the start is
    trivially adjacent to prev == start, so all candidates weigh
    ``w_common`` (no special case in either dialect).

    All three weights must be >= 1: a zero class could strand a walker
    on a total weight of 0 (degree-1 node whose only neighbor is prev,
    w_return = 0) — approximate "never backtrack" with a LARGE
    w_common/w_out instead (the integer-ratio spelling of small 1/p).

    **Scale shape** (the honest second-order cost): unlike first-order
    ``random_walks`` (two fixed-width joins, no fan-out), each step
    joins every walker to ALL of cur's neighbors (Σ deg(cur) rows),
    classifies them with one LEFT join against the canonical undirected
    edge set on (prev, x), and resolves the pick with ONE window
    cumulative sum per walker — two exchanges per step on the fan-out
    frame. That is still linear in touched adjacency, where the
    reference node2vec's alias tables cost O(Σ deg²) PREPROCESSED
    memory per node pair; at 100 TB the per-step fan-out join is the
    strategy that survives. Driver fast path below ``driver_threshold``
    edges, property-pinned bit-identical to the distributed loop."""
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0 (got {walk_len})")
    if num_walks < 1:
        raise ValueError(f"num_walks must be >= 1 (got {num_walks})")
    if min(w_return, w_common, w_out) < 1:
        raise ValueError(
            "all class weights must be >= 1 (a zero class can strand a"
            f" walker): got w_return={w_return} w_common={w_common}"
            f" w_out={w_out}"
        )
    src, dst = edges.columns[:2]
    spark = edges.sparkSession
    out_schema = f"start {node_type}, wid int, step int, node {node_type}"
    # fused one-materialization dispatch (the random_walks discipline)
    und, urows, _ = _und_probe(
        edges.select(
            F.col(src).cast(node_type).alias("src"),
            F.col(dst).cast(node_type).alias("dst"),
        ),
        driver_threshold,
    )
    if urows is not None:
        if und is not None:
            _free_local_checkpoint(und)
        return _local_df(
            spark,
            _node2vec_driver(
                urows, walk_len, num_walks, w_return, w_common, w_out
            ),
            out_schema,
        )
    from pyspark.sql import Window
    adj = und.selectExpr("u AS node", "v AS nbr").unionByName(
        und.selectExpr("v AS node", "u AS nbr")
    ).localCheckpoint(eager=True)
    dg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    w = dg.select(
        F.col("node").alias("start"),
        F.explode(
            F.array([F.lit(i).cast("int") for i in range(num_walks)])
        ).alias("wid"),
        F.col("node").alias("prev"),
        F.col("node").alias("cur"),
    ).localCheckpoint(eager=True)
    outs = [
        w.select(
            "start", "wid", F.lit(0).cast("int").alias("step"),
            F.col("cur").alias("node"),
        )
    ]
    adjj = adj.selectExpr("node AS _anode", "nbr AS _anbr")
    # canonical edge probe for the "x adjacent to prev" class
    undj = und.selectExpr("u AS _eu", "v AS _ev", "1 AS _hit")
    wcls = (
        F.when(F.col("_anbr") == F.col("prev"), F.lit(w_return))
        .when(F.col("_hit").isNotNull(), F.lit(w_common))
        .otherwise(F.lit(w_out))
    )
    win = Window.partitionBy("start", "wid").orderBy("_anbr")
    for t in range(1, walk_len + 1):
        h2 = _walk_h2_sql(
            "prev", "cur", t, "CAST(wid AS BIGINT)"
        )
        cand = (
            w.join(adjj, F.col("cur") == F.col("_anode"))
            .join(
                undj,
                (F.least("prev", "_anbr") == F.col("_eu"))
                & (F.greatest("prev", "_anbr") == F.col("_ev")),
                "left",
            )
            .withColumn("_w", wcls)
            .withColumn("_cum", F.sum("_w").over(win))
            .withColumn(
                "_tot", F.sum("_w").over(Window.partitionBy("start", "wid"))
            )
            .withColumn("_h2", F.expr(h2))
            .withColumn(
                "_r",
                F.expr(f"((_h2 * _h2 + {WALK_E}) % {WALK_P}) % _tot"),
            )
        )
        stepped = cand.filter(
            (F.col("_cum") - F.col("_w") <= F.col("_r"))
            & (F.col("_r") < F.col("_cum"))
        ).select(
            "start", "wid", F.col("cur").alias("prev"),
            F.col("_anbr").alias("cur"),
        )
        w = stepped.localCheckpoint(eager=True)
        outs.append(
            w.select(
                "start", "wid", F.lit(t).cast("int").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _node2vec_driver(
    und_rows, walk_len, num_walks, w_return, w_common, w_out
):
    """Driver fast path: the same second-order walk with Python ints —
    bit-identical to the distributed loop (property-pinned)."""
    adj: dict = {}
    eset = set()
    for r in und_rows:
        adj.setdefault(r.u, set()).add(r.v)
        adj.setdefault(r.v, set()).add(r.u)
        eset.add((min(r.u, r.v), max(r.u, r.v)))
    nbrs = {n: sorted(s) for n, s in adj.items()}
    rows = []
    for start in sorted(nbrs):
        for wid in range(num_walks):
            prev, cur = start, start
            rows.append((start, wid, 0, cur))
            for t in range(1, walk_len + 1):
                ws = []
                for x in nbrs[cur]:
                    if x == prev:
                        ws.append(w_return)
                    elif (min(prev, x), max(prev, x)) in eset:
                        ws.append(w_common)
                    else:
                        ws.append(w_out)
                tot = sum(ws)
                h2 = (
                    ((cur % WALK_P) * WALK_A) % WALK_P
                    + ((prev % WALK_P) * WALK_F) % WALK_P
                    + t * WALK_B + wid * WALK_C + WALK_D
                ) % WALK_P
                r_ = ((h2 * h2 + WALK_E) % WALK_P) % tot
                cum = 0
                for x, wx in zip(nbrs[cur], ws):
                    cum += wx
                    if r_ < cum:
                        prev, cur = cur, x
                        break
                rows.append((start, wid, t, cur))
    return rows
