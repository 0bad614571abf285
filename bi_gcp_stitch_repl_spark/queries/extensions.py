"""LLM-data-pipeline extension queries (SURVEY.md §7.6, BASELINE.json
north_star): deduplication, similarity search, text analysis, multimodal
metadata — each designed for 100 TB scale and, wherever the math is
SQL-expressible, oracle-checked against DuckDB.

Determinism architecture (why no Spark ``hash``/``xxhash64`` here): the
oracle must reproduce every hash bit-for-bit, so all hashing in the catalog
surface is an explicit polynomial fold ``(acc*31 + codepoint) % 1e9+7``,
expressed as Spark ``aggregate(transform(...))`` and DuckDB
``list_reduce(... list comprehension ...)`` — verified to match exactly.
The production-scale variants using JVM-side ``xxhash64``/``minhash`` live
in ``functions.dedup`` / ``functions.similarity`` with pytest coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS as _WS
from .catalog import register, spread_narrow, tables

P = 1_000_000_007
#: (a, b) pairs for the MinHash permutation family h_k(x) = (a*x + b) mod P.
MINHASH_SEEDS = [
    (131, 7),
    (137, 11),
    (139, 13),
    (149, 17),
    (151, 19),
    (157, 23),
    (163, 29),
    (167, 31),
]
N_BANDS = 2  # 8 minhashes → 2 bands × 4 rows: P(candidate) = 1-(1-J^4)^2,
#              steep around J≈0.7 — right for a corpus with heavy shared
#              vocabulary where 2-row bands would flood candidates (measured
#              537k pre-distinct pairs at sf0.1 with r=2; ~300 with r=4)
ROWS_PER_BAND = len(MINHASH_SEEDS) // N_BANDS
JACCARD_THRESHOLD = 0.4  # clean separation point in the corpus


def _as_ratio(t: float) -> tuple[int, int]:
    """Float threshold → exact rational (p, q) for division-free integer
    comparisons (x >= t ⟺ q·x_num >= p·x_den). ONE conversion rule for
    every threshold site — the PPJoin bounds and the LSH-candidate verify
    must never disagree on the same boundary pair."""
    from fractions import Fraction

    f = Fraction(t).limit_denominator(10**6)
    return f.numerator, f.denominator
#: the exact Jaccard audit is PROBE-ANCHORED: the AUDIT_K smallest
#: doc_ids are exact-verified against the ENTIRE corpus — every true
#: near-dup pair touching a probe doc is found, which is precisely the
#: recall question ("what did LSH banding miss?") asked on a fixed
#: deterministic sample. Cost is one prefix-filtered probe⋈corpus join —
#: linear in corpus size at fixed K, exactly the IVF recall audit's
#: shape (fixed 20-query subset × full cell probe, below). The two
#: designs this replaces both fail at 100×: a fixed FRACTION slice
#: (r01-r03's ``doc_id % 5``) grows pairs as (n/5)² — quadratic; a
#: fixed-count WITHIN-subset all-pairs audit is constant-cost but
#: vacuous — corpus near-dups are uniformly spread, so a K-of-n subset
#: contains a pair's BOTH endpoints with probability ~(K/n)² → 0 rows
#: at any real scale (measured: zero pairs among the 100 smallest ids
#: even at sf0.01).
AUDIT_K = 100

# --- shared expression fragments (Spark SQL dialect) -----------------------

#: distinct character 5-gram shingles of `text`
SHINGLES_SPARK = (
    "array_distinct(transform(sequence(1, greatest(length(text)-4, 1)),"
    " i -> substring(text, i, 5)))"
)
#: polynomial fold hash of one string s (Spark lambda body)
_FOLD_SPARK = (
    "aggregate(transform(split({s}, ''), c -> cast(ascii(c) as bigint)),"
    " cast(0 as bigint), (acc, c) -> (acc*31 + c) % {p})"
)

# --- shared fragments (DuckDB dialect) --------------------------------------

SHINGLES_DUCK = (
    "list_distinct([substr(text, i, 5)"
    " for i in generate_series(1, greatest(len(text)-4, 1))])"
)
# CASE: both engines split '' to [''], but duck ord('') is -1 where spark
# ascii('') is 0 — an EMPTY string must fold to the same hash (0) in both
_FOLD_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " [CAST(CASE WHEN c = '' THEN 0 ELSE ord(c) END AS BIGINT)"
    " for c in split({s}, '')]),"
    " (acc, c) -> (acc*31 + c) % {p})"
)


_SHINGLE_DUCK_CTE = f"""
sh AS (
  SELECT doc_id, unnest({SHINGLES_DUCK}) AS shingle FROM documents
),
probe AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {AUDIT_K})"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "x_dedup_exact",
    oracle="""
SELECT md5(text) AS content_key, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
)
def x_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, keep-lowest-id representative. At 100 TB
    this is the canonical first pass: hash JVM-side (no text shuffle — only
    the 32-byte key moves), group, keep min id. Here md5 doubles as the
    oracle-portable hash."""
    (docs,) = tables(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_key")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


@register(
    "x_dedup_normalized",
    # WS_CLASS, not RE2 '\s': Java \s includes \x0B, RE2's does not — a
    # vertical-tab doc would hash-diverge between the dialects otherwise
    oracle=f"""
SELECT md5(lower(trim(regexp_replace(text, '{_WS}+', ' ', 'g')))) AS content_key,
       MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
)
def x_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/case-normalized exact dedup — catches trivially-reformatted
    copies before any expensive near-dup pass."""
    (docs,) = tables(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", "\\s+", " ")))
    return docs.groupBy(F.md5(norm).alias("content_key")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


_AUDIT_P, _AUDIT_Q = _as_ratio(JACCARD_THRESHOLD)

_JACCARD_DUCK = f"""
WITH {_SHINGLE_DUCK_CTE},
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_id AS pa, s.doc_id AS pb, COUNT(*) AS n_inter
  FROM sh p JOIN sh s ON p.shingle = s.shingle AND p.doc_id <> s.doc_id
  WHERE p.doc_id IN (SELECT doc_id FROM probe)
  GROUP BY 1, 2
)
SELECT DISTINCT least(pa, pb) AS doc_a, greatest(pa, pb) AS doc_b,
       n_inter * 1.0 / (ca.n + cb.n - n_inter) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = pa
JOIN cnt cb ON cb.doc_id = pb
WHERE {_AUDIT_Q} * n_inter >= {_AUDIT_P} * (ca.n + cb.n - n_inter)
"""


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-anchored exact 5-gram Jaccard audit: every pair with J >=
    threshold touching one of the AUDIT_K smallest doc_ids, verified
    against the ENTIRE corpus.

    Shape: broadcast the K probe docs' exploded shingles against ONE
    parallelized corpus shingle explode and COUNT shared shingles per
    (probe, other) pair — a single map-side-combinable aggregation, no
    windows, no per-pair set materialization. The group count is exactly
    |A intersect B| because shingles are distinct per doc. Join output
    is Sigma over probe shingle occurrences of df(shingle) — linear in
    corpus size at fixed K (the IVF fixed-query recall audit's cost
    shape). Per-doc set sizes come row-locally from
    size(array_distinct(...)) and join onto the (small) pair aggregate
    at the END, so the wide 31M-row join stream stays two columns —
    attaching them pre-explode would also bait a Catalyst collapse that
    re-builds the whole shingle array per exploded row (measured 5x the
    query cost). The threshold compare is exact integer rationals on
    BOTH engines, so boundary pairs never split on float rounding.

    Why not PPJoin prefix filtering here (the production all-pairs
    kernel shape, still showcased by ``x_sparse_cosine_pairs``): on this
    degenerate shared-vocabulary corpus the prefixes barely prune
    (measured 322k of ~500k probe-corpus candidates surviving at sf0.1)
    and the per-candidate verify then dominates; the direct count is
    simpler, faster, and its cost bound does not depend on vocabulary
    diversity."""
    p, q = _as_ratio(JACCARD_THRESHOLD)
    (docs,) = tables(spark, sf_dir, "documents")
    # single-file fixtures scan as ONE task; spread the explode work
    # before it starts (tiny shuffle: raw docs, not shingles)
    spread = docs.select("doc_id", "text").repartition(32, "doc_id")
    sh = spread.select(
        F.col("doc_id").alias("pb"),
        F.explode(F.expr(SHINGLES_SPARK)).alias("shingle"),
    )
    probe_docs = docs.orderBy("doc_id").limit(AUDIT_K)
    probe = probe_docs.select(
        F.col("doc_id").alias("pa"),
        F.explode(F.expr(SHINGLES_SPARK)).alias("shingle"),
    )
    inter = (
        sh.join(F.broadcast(probe), "shingle")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_inter"))
    )
    # row-local distinct-shingle counts (no explode), attached to the
    # K x matched-docs aggregate — never to the wide join stream
    na = probe_docs.select(
        F.col("doc_id").alias("pa"), F.expr(f"size({SHINGLES_SPARK})").alias("na")
    )
    nb = spread.select(
        F.col("doc_id").alias("pb"), F.expr(f"size({SHINGLES_SPARK})").alias("nb")
    )
    return (
        inter.join(F.broadcast(na), "pa")
        .join(nb, "pb")
        # q*|A&B| >= p*|A|B| -- identical integer form to the oracle
        .filter(
            F.lit(q) * F.col("n_inter")
            >= F.lit(p) * (F.col("na") + F.col("nb") - F.col("n_inter"))
        )
        .select(
            F.least("pa", "pb").alias("doc_a"),
            F.greatest("pa", "pb").alias("doc_b"),
            (
                F.col("n_inter")
                * 1.0
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        # probe-probe pairs arrive from both directions with identical
        # integer operands (hence identical double) -- keep one
        .distinct()
    )


@register("x_jaccard_ngram_pairs", oracle=_JACCARD_DUCK)
def x_jaccard_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (threshold 0.4) touching
    the AUDIT_K-smallest-doc_id probe set, verified against the WHOLE
    corpus — the audit baseline for the LSH path
    (``x_dedup_near_survivors`` verifies candidates exactly; this entry
    measures what banding MISSED, exhaustively, for a fixed
    deterministic sample of documents). Probe-anchoring is what keeps
    the audit both meaningful and scalable: a fixed-fraction slice is
    quadratic at 100×, and a within-subset all-pairs audit finds zero
    pairs once the corpus outgrows the subset (near-dups are uniformly
    spread — both endpoints rarely land in any small sample). Cost is
    linear in corpus size at fixed K — the same shape as the IVF
    fixed-query recall audit."""
    return _jaccard_pairs(spark, sf_dir)


SPAN_WORDS = 10


@register(
    "x_span_dedup",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
seg AS (
  SELECT doc_id, i AS seg_no,
         array_to_string(ws[(i*{SPAN_WORDS}+1):(i*{SPAN_WORDS}+{SPAN_WORDS})], ' ') AS seg,
         doc_id * 1000000 + i AS pos
  FROM w, LATERAL (SELECT unnest(generate_series(
      0, CAST(ceil(len(ws) / {SPAN_WORDS}.0) AS BIGINT) - 1)) AS i)
),
own AS (SELECT seg, COUNT(*) AS n_occ, MIN(pos) AS first_pos FROM seg GROUP BY seg),
kept AS (
  SELECT s.doc_id, COUNT(*) AS n_kept,
         string_agg(s.seg, ' ' ORDER BY s.seg_no) AS cleaned_text
  FROM seg s JOIN own o USING (seg)
  WHERE o.n_occ = 1 OR s.pos = o.first_pos
  GROUP BY s.doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_segs FROM seg GROUP BY doc_id)
SELECT t.doc_id, t.n_segs, COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.cleaned_text, '') AS cleaned_text
FROM tot t LEFT JOIN kept k USING (doc_id)
""",
)
def x_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span-level dedup (functions.dedup.span_dedup): cut every
    document into consecutive 10-word segments, keep only the globally
    first occurrence of each repeated segment, rebuild the text. Removes
    shared boilerplate RUNS that document-level dedup can't touch. One
    map-side-combinable groupBy on the segment, one join back, one
    per-doc regroup — linear at any corpus size."""
    (docs,) = tables(spark, sf_dir, "documents")
    from ..functions.dedup import span_dedup

    return span_dedup(docs, span_words=SPAN_WORDS)


def _gram5_hash(index_fn) -> str:
    """Closed-form polynomial hash of the 5-gram starting at position i,
    over a precomputed codepoint array `cs`:
    ((((c1*31+c2)*31+c3)*31+c4)*31+c5, with c_j = cs[i+j-1].
    Identical to the stepwise fold mod P because the accumulator for a
    5-char input never reaches P (max ≈ 1.2e8 < 1e9+7).

    The codepoint array is built ONCE per document: hashing grams with
    substring(text, i, …) instead is O(i) per call on Spark's UTF8String
    (byte-offset scan), i.e. O(len²) per document — measured 11s for 5000
    docs; the array-indexed form is O(len)."""
    cs = [index_fn(j) for j in range(5)]
    h = cs[0]
    for c in cs[1:]:
        h = f"({h} * 31 + {c})"
    return h


#: distinct 5-gram hashes per document (Spark / DuckDB) — the hash-domain
#: shingle set used by MinHash. Documents shorter than 5 chars yield an
#: EMPTY gram set on BOTH dialects: the old greatest(size-4, 1) lower
#: bound still emitted i=1 for short docs, indexing element_at past the
#: array end — fine on the driver corpus (min length 44) but an
#: INVALID_ARRAY_INDEX abort under ANSI (the Spark 4 default) on the
#: first short/empty document of a real corpus.
GRAM_HASHES_SPARK = (
    "CASE WHEN size(cs) < 5 THEN CAST(array() AS ARRAY<BIGINT>) ELSE "
    "array_distinct(transform(sequence(1, size(cs)-4),"
    f" i -> {_gram5_hash(lambda j: f'element_at(cs, i + {j})')})) END"
)
GRAM_HASHES_DUCK = (
    "CASE WHEN len(cs) < 5 THEN CAST([] AS BIGINT[]) ELSE "
    f"list_distinct([{_gram5_hash(lambda j: f'cs[i + {j}]')}"
    " for i in generate_series(1, len(cs)-4)]) END"
)
CODEPOINTS_SPARK = "transform(split(text, ''), c -> cast(ascii(c) as bigint))"
# CASE: duck ord('') = -1 vs spark ascii('') = 0 on the empty-text split
CODEPOINTS_DUCK = (
    "[CAST(CASE WHEN c = '' THEN 0 ELSE ord(c) END AS BIGINT)"
    " for c in split(text, '')]"
)


def _minhash_signature(hs_df: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh7) MinHash signature over the `hs` gram-hash array.

    All permutations fold in ONE array traversal with an array accumulator
    (`least` per slot) — measured 2.7× faster than one transform+array_min
    per permutation, bit-identical output. Two-step projection so the fold
    is evaluated once, not once per extracted signature column."""
    init = "array(" + ", ".join(f"cast({P} as bigint)" for _ in MINHASH_SEEDS) + ")"
    upd = "array(" + ", ".join(
        f"least(acc[{k}], ({a}*h + {b}) % {P})" for k, (a, b) in enumerate(MINHASH_SEEDS)
    ) + ")"
    arr = hs_df.select(
        "doc_id", F.expr(f"aggregate(hs, {init}, (acc, h) -> {upd})").alias("mh")
    )
    return arr.select(
        "doc_id", *[F.col("mh")[k].alias(f"mh{k}") for k in range(len(MINHASH_SEEDS))]
    )


def _band_sig_duck(i: int) -> str:
    return " || '_' || ".join(
        f"CAST(mh{i * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
    )


def _minhash_lsh_duck_ctes() -> str:
    """The WITH-clause body shared by every MinHash-LSH oracle: codepoints
    → gram hashes → signatures → band rows → distinct candidate pairs."""
    mh_exprs = ",\n         ".join(
        f"list_min(list_transform(hs, h -> ({a}*h + {b}) % {P})) AS mh{k}"
        for k, (a, b) in enumerate(MINHASH_SEEDS)
    )
    band_rows = ",\n    ".join(f"({i}, {_band_sig_duck(i)})" for i in range(N_BANDS))
    return f"""cp AS (
  SELECT doc_id, {CODEPOINTS_DUCK} AS cs FROM documents
), hs AS (
  SELECT doc_id, {GRAM_HASHES_DUCK} AS hs
  FROM cp
), sig AS (
  SELECT doc_id,
         {mh_exprs}
  FROM hs
  WHERE len(hs) > 0
), bands AS (
  SELECT doc_id, band, sig FROM sig,
  LATERAL (VALUES
    {band_rows}
  ) AS t(band, sig)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""


def _minhash_lsh_duck() -> str:
    return f"WITH {_minhash_lsh_duck_ctes()} SELECT doc_a, doc_b FROM cand"


def _minhash_candidates(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) LSH candidate pairs via the DuckDB-reproducible
    permutation family — shared by the candidate query and the
    candidate-verified near-dedup survivors."""
    # spread a severely-narrow scan before the CPU-heavy shingle→
    # signature chain (catalog.spread_narrow: measured trigger, no-op on
    # wide inputs); select first so any spread shuffles only what the
    # hash needs
    # a <5-char doc has NO 5-gram shingles — it cannot be a near-dup
    # candidate. Without this guard the signature fold returns its init
    # sentinel [P,P,...] for empty gram sets, giving every short doc the
    # SAME band signature: m short docs emit ~m²/2 bogus candidate pairs
    # (and the oracle's list_min([]) is NULL → zero pairs — a hard
    # cross-engine divergence). The guard is the CHEAP equivalent
    # length(text) >= 5 at the scan (hs is empty ⟺ size(cs) < 5 ⟺
    # length(text) < 5): a filter(size(hs) > 0) AFTER the projection gets
    # predicate-pushed into the gram expression and re-evaluates the
    # whole shingle-hash build per row — measured 45 s vs 0.9 s at sf0.1
    # (the module's "never project size(arr) next to its builder" lesson).
    # The duck CTE guards with WHERE len(hs) > 0 (one evaluation there).
    docs = spread_narrow(
        docs.select("doc_id", "text").filter(F.length("text") >= 5), "doc_id"
    )
    cp = docs.select("doc_id", F.expr(CODEPOINTS_SPARK).alias("cs"))
    hs = cp.select("doc_id", F.expr(GRAM_HASHES_SPARK).alias("hs"))
    sig = _minhash_signature(hs)
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.concat_ws(
                "_",
                *[F.col(f"mh{i * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
            ).alias("sig"),
        )
        for i in range(N_BANDS)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "b.band", "b.sig")
    # self-join: without a shuffle boundary Spark recomputes the whole
    # signature pipeline per side; repartitioning on the join key makes the
    # two sides identical Exchanges, so ReusedExchange evaluates it once
    bands = bands.repartition("band", "sig")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register("x_minhash_lsh_candidates", oracle=_minhash_lsh_duck())
def x_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding candidate pairs — the scale path for near-dedup:
    shingle → 8 minhashes → 2 bands of 4 → bucket-join on (band, signature).
    Cost is linear in corpus size + bucket collisions (vs the quadratic
    shingle self-join), which is what survives 100 TB. The signature pass is
    pure JVM-side expression work (one shuffle on the band key).

    Deterministic permutation family (a*h+b mod 1e9+7) over the polynomial
    shingle hash, so DuckDB reproduces every signature exactly.
    """
    (docs,) = tables(spark, sf_dir, "documents")
    return _minhash_candidates(docs)


#: JACCARD_THRESHOLD as an exact rational for division-free comparisons
_JT_P, _JT_Q = _as_ratio(JACCARD_THRESHOLD)


@register(
    "x_dedup_near_survivors",
    oracle=f"""
WITH {_minhash_lsh_duck_ctes()},
j AS (
  SELECT c.doc_b
  FROM cand c
  JOIN hs ha ON ha.doc_id = c.doc_a
  JOIN hs hb ON hb.doc_id = c.doc_b
  WHERE {_JT_Q} * len(list_intersect(ha.hs, hb.hs))
        >= {_JT_P} * (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))
),
dups AS (SELECT DISTINCT doc_b AS doc_id FROM j)
SELECT d.doc_id, d.lang, d.source FROM documents d
LEFT JOIN dups USING (doc_id) WHERE dups.doc_id IS NULL
""",
)
def x_dedup_near_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup keep-first over LSH-VERIFIED pairs: MinHash-LSH proposes
    candidates (linear in corpus + collisions), exact gram-hash-set
    Jaccard verifies ONLY those candidates, and every document with a
    verified near-duplicate of smaller doc_id is dropped — the production
    representative-selection pipeline end to end. The verification kernel
    is bounded by the candidate count (Σ over buckets, never corpus²);
    the earlier all-pairs exact form is retained as the sliced audit
    baseline ``x_jaccard_ngram_pairs``. Threshold compare is exact
    integer arithmetic (t = p/q), so boundary pairs agree with the
    oracle bit-for-bit."""
    (docs,) = tables(spark, sf_dir, "documents")
    # The candidate list is tiny (collision pairs only) but its lineage is
    # the whole shingle→signature pipeline; materialize it once so the
    # id-broadcast below and the verify join don't evaluate that pipeline
    # twice. (Same eager-small-result precedent as the IVF centroids.)
    cand = _minhash_candidates(docs).localCheckpoint(eager=True)
    # Only candidate documents' gram-hash sets ever move: the semi-join
    # against the (tiny) candidate id list runs map-side under a broadcast,
    # so the expensive array column is built for all docs (cheap, JVM
    # expression work on the scan) but shuffled only for colliding docs —
    # at 100 TB that's the difference between shipping the corpus and
    # shipping the near-dup neighborhoods.
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # semi-join FIRST, expressions after: Catalyst won't reorder a join
    # below a projection, and the gram-hash array is the expensive part —
    # build it for the ~1% of docs that collided, not the corpus
    # single-file fixtures scan as ONE task; spread the verify-side gram
    # build the same way _minhash_candidates spreads the signature chain.
    # Probe/spread the BARE SCAN, not the post-join frame: under AQE the
    # probe's .rdd fallback materializes every upstream broadcast stage,
    # so probing after the join would execute the whole candidate
    # pipeline once more just to count partitions — the scan answers
    # from its file listing. The broadcast semi-join keeps the spread
    # partitioning (no exchange), so the gram build still runs wide.
    cand_docs = spread_narrow(docs, "doc_id").join(
        F.broadcast(cand_ids), "doc_id", "left_semi"
    )
    hs = cand_docs.select("doc_id", F.expr(CODEPOINTS_SPARK).alias("cs")).select(
        "doc_id", F.expr(GRAM_HASHES_SPARK).alias("hs")
    )
    ha = hs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    hb = hs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    n_inter = F.size(F.array_intersect("hs_a", "hs_b"))
    verified = (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .filter(
            F.lit(_JT_Q) * n_inter
            >= F.lit(_JT_P) * (F.size("hs_a") + F.size("hs_b") - n_inter)
        )
    )
    dups = verified.select(F.col("doc_b").alias("doc_id")).distinct()
    return docs.select("doc_id", "lang", "source").join(dups, "doc_id", "left_anti")


def _simhash_exprs(n_bits: int, spark_side: bool) -> tuple[str, str]:
    """Generate (per-bit vote sums, recombine expression) for SimHash."""
    shift = (lambda b: f"(shiftright(h, {b}) & 1)") if spark_side else (
        lambda b: f"((h >> {b}) & 1)"
    )
    votes = ",\n       ".join(
        f"SUM(2 * {shift(b)} - 1) AS s{b}" for b in range(n_bits)
    )
    recombine = " + ".join(
        f"CASE WHEN s{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(n_bits)
    )
    return votes, recombine


SIMHASH_BITS = 32


def _simhash_duck() -> str:
    fold = _FOLD_DUCK.format(s="t", p=P)
    votes, recombine = _simhash_exprs(SIMHASH_BITS, spark_side=False)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest([{fold} for t in list_filter(string_split_regex(trim(text), '{_WS}+'), t -> t <> '')]) AS h
  FROM documents
), votes AS (
  SELECT doc_id,
       {votes}
  FROM toks GROUP BY doc_id
)
SELECT doc_id, {recombine} AS simhash FROM votes
"""


@register("x_simhash", oracle=_simhash_duck())
def x_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash over token hashes: tokens vote per bit
    (+1 if the bit is set, -1 otherwise); the sign of each bit's vote sum
    becomes the fingerprint bit. Near-duplicates land at small Hamming
    distance — at scale, group by a few fixed bit-slices of the fingerprint
    to find candidates without any pairwise pass."""
    (docs,) = tables(spark, sf_dir, "documents")
    fold = _FOLD_SPARK.format(s="t", p=P)
    # spread a severely-narrow scan before the tokenize+hash explode
    # (ONE task until the vote groupBy's shuffle otherwise)
    src = spread_narrow(docs.select("doc_id", "text"), "doc_id")
    toks = src.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(filter(split(trim(text), '\\\\s+'), t -> t <> ''),"
                f" t -> {fold})"
            )
        ).alias("h"),
    )
    _, recombine_sql = _simhash_exprs(SIMHASH_BITS, spark_side=True)
    vote_cols = [
        F.expr(f"SUM(2 * (shiftright(h, {b}) & 1) - 1)").alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    votes = toks.groupBy("doc_id").agg(*vote_cols)
    return votes.select("doc_id", F.expr(recombine_sql).alias("simhash"))


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

#: Spark sequential-fold dot product of two double arrays — matches DuckDB's
#: list_sum(list_transform(list_zip(...))) element order bit-for-bit.
_DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
_NORM_SPARK = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v))"
)

#: The embeddings table's declared vector dimension — the catalog's table
#: contract (every sf fixture generates 64-dim vectors; an ANN deployment
#: declares its dim the same way). Passing it to the similarity kernels
#: switches the interpreted aggregate/zip_with folds to a guarded
#: UNROLLED spelling (functions.similarity.dot_sql): rows of exactly this
#: length take a flat codegen expression with the identical left-fold
#: accumulation order (bit-identical doubles — the DuckDB twins are
#: untouched), any other row falls back to the fold, so a dim change can
#: only cost speed, never correctness. Measured 2.5x on the semdedup
#: pair stage at sf0.1.
EMB_DIM = 64


def _dot64(a: str, b: str) -> str:
    from ..functions.similarity import dot_sql

    return dot_sql(a, b, EMB_DIM)


def _norm64(a: str) -> str:
    from ..functions.similarity import norm_sql

    return norm_sql(a, EMB_DIM)


@register(
    "x_knn_cosine_topk",
    oracle="""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label,
         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qe), x -> x[1]*x[2]))
         / nullif(sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x)))
            * sqrt(list_sum(list_transform(q.qe, x -> x*x))), 0.0) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != 0
)
SELECT vec_id, label, cosine FROM scored
ORDER BY cosine DESC, vec_id LIMIT 10
""",
)
def x_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a query vector — the exact ANN
    baseline. The query vector broadcasts (1 row); scoring is a JVM-side
    fold over the 64-dim arrays (no Python, no shuffle); top-k is a
    TakeOrdered, not a global sort. Linear scan = the correctness oracle
    for x_lsh_cosine_buckets / functions.similarity at any scale."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    # fold spelling on purpose: corpus x ONE query row — the unrolled
    # tree costs more in plan size than 2k rows of fold eval ever save
    # (A/B: fold 0.10+0.14 s vs unrolled 0.15+0.19; the unroll pays only
    # on >~1e5-pair stages, where the catalog passes EMB_DIM)
    dot = _DOT_SPARK.format(a="embedding", b="qe")
    norm_e = _NORM_SPARK.format(a="embedding")
    norm_q = _NORM_SPARK.format(a="qe")
    return (
        emb.filter(F.col("vec_id") != 0)
        # nullif: a zero-norm vector must score NULL (excluded from the
        # top-k), never an ANSI divide-by-zero abort / NaN divergence
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", F.expr(f"{dot} / nullif({norm_e} * {norm_q}, 0.0d)"))
        .select("vec_id", "label", "cosine")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


@register(
    "x_lsh_cosine_buckets",
    oracle="""
SELECT (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
      + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
      + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
      + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
      + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
      + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END
      + CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END
      + CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket_id,
       COUNT(*) AS n_vectors,
       MIN(vec_id) AS min_vec_id
FROM embeddings GROUP BY 1
""",
)
def x_lsh_cosine_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit LSH bucketing (hyperplanes = first 8 coordinate axes): the
    partition function of the scale path for similarity search. A query
    probes only its bucket (and Hamming-1 neighbors) instead of the full
    corpus — functions.similarity.lsh_topk drives the actual per-bucket
    top-k; this query checks the bucket assignment."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    bucket = None
    for i in range(8):
        bit = F.when(F.element_at("embedding", i + 1) > 0, F.lit(1 << i)).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    return emb.groupBy(bucket.alias("bucket_id")).agg(
        F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


COSINE_DUP_THRESHOLD = 0.45  # max pairwise cosine in this corpus is ~0.51;
#                              0.45 separates a small "near" tail (7 pairs at
#                              sf0.001, 14 at sf0.01, 144 at sf0.1) from noise


@register(
    "x_dedup_embedding_pairs",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_sum(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]))
         / nullif(a.nrm * b.nrm, 0.0) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]))
        / nullif(a.nrm * b.nrm, 0.0) >= {COSINE_DUP_THRESHOLD}
""",
)
def x_dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — EXACT all-pairs baseline.
    Norms are computed once per row before the self-join (the join computes
    only the dot product); the smaller side broadcasts. This quadratic form
    is the correctness oracle; the 100 TB path is
    ``functions.similarity.embedding_near_dup`` (banded random-hyperplane
    LSH candidates + exact verify — linear in corpus + collisions),
    recall-tested against this baseline in pytest."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    norm = F.expr(_norm64("embedding"))
    n = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        norm.alias("nrm"),
    )
    # the corpus is one small parquet file → one scan partition; without
    # an explicit spread the O(n²) nested-loop probe runs on ONE task
    # (measured 18.9 s single-task at sf0.1, ~1.3 s across 32)
    a = n.repartition(32).select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dot = _dot64("va", "vb")
    # no broadcast HINT: b is the ENTIRE embeddings table (there is no
    # smaller side in an all-pairs baseline), and a forced hint would
    # hard-fail at the broadcast limit long before the O(n²) compute
    # does — unhinted, Catalyst still broadcasts it while it fits
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        # nullif: zero-norm vectors yield NULL cosine (dropped by the
        # threshold filter), never an ANSI divide-by-zero abort
        .withColumn(
            "cosine",
            F.expr(dot) / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        )
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", "cosine")
    )


@register(
    "x_embedding_quantize",
    oracle="""
WITH scaled AS (
  SELECT vec_id,
         CAST(list_max(list_transform(embedding,
              x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE) AS max_abs
  FROM embeddings
)
SELECT e.vec_id,
       s.max_abs,
       array_to_string(list_transform(e.embedding,
           x -> coalesce(CAST(floor(CAST(x AS DOUBLE) * 127.0
                                    / nullif(s.max_abs, 0.0) + 0.5)
                              AS INTEGER), 0)), ',') AS q8,
       list_max(list_transform(e.embedding,
           x -> coalesce(abs(CAST(x AS DOUBLE)
                    - floor(CAST(x AS DOUBLE) * 127.0
                            / nullif(s.max_abs, 0.0) + 0.5)
                      * s.max_abs / 127.0), 0.0))) AS max_err
FROM embeddings e JOIN scaled s USING (vec_id)
""",
)
def x_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector: scale by 127/max|x|, round
    half-up, report the reconstruction error — the 4× storage/bandwidth
    cut that makes a 100 TB embedding store scan-able. Pure array
    expressions (transform + max fold), zero shuffle, zero Python. Two
    bit-portability spellings are load-bearing: floor(x+0.5), NOT round()
    (Spark HALF_UPs while DuckDB banker's-rounds), and every float32
    element cast to DOUBLE before arithmetic (DuckDB otherwise evaluates
    the lambda in float32). max over elements is order-independent, so
    the whole row is deterministic; the int8 vector serializes to CSV for
    the hash compare."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    max_abs = F.expr(
        "cast(array_max(transform(embedding, x -> abs(cast(x as double)))) as double)"
    ).alias("max_abs")
    with_scale = emb.select("vec_id", "embedding", max_abs)
    # zero-vector guard (both dialects in lockstep): max_abs = 0 would
    # divide by zero — nullif makes the scale NULL and coalesce maps the
    # whole vector to the exact quantization a zero vector deserves
    # (all-zero q8, max_err 0.0) instead of engine-specific NaN/Inf
    q8 = F.expr(
        "array_join(transform(embedding,"
        " x -> coalesce(cast(floor(cast(x as double) * 127.0D"
        " / nullif(max_abs, 0.0D) + 0.5D) as int), 0)), ',')"
    ).alias("q8")
    max_err = F.expr(
        "array_max(transform(embedding,"
        " x -> coalesce(abs(cast(x as double)"
        " - floor(cast(x as double) * 127.0D / nullif(max_abs, 0.0D) + 0.5D)"
        " * max_abs / 127.0D), 0.0D)))"
    ).alias("max_err")
    return with_scale.select("vec_id", "max_abs", q8, max_err)


@register(
    "x_ivf_topk",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(TRUE AS BOOLEAN) AS recall_ok
FROM (SELECT vec_id FROM embeddings WHERE vec_id % 25 = 0
      ORDER BY vec_id LIMIT 200)
""",
)
def x_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search over KMeans coarse cells (functions.similarity.
    kmeans_ivf_index + ivf_topk) with CORPUS-DERIVED index geometry:
    n_cells = auto_n_cells(N) ≈ sqrt(N) (22 at sf0.01, 45 at sf0.1) and
    n_probe = ceil(0.625 · n_cells) — both scale with the table instead
    of being pinned at a fixture size (VERDICT r05 #5). Queries = ONE
    BOUNDED BATCH (the 200 smallest of every-25th vector, k=5): a query
    set that scaled with the corpus made total scored rows grow as
    corpus² — a real ANN service answers fixed-size query batches.

    Approximate by design, so the hash-checkable contract is a recall
    BOUND, not the hit list: the query recomputes the exact brute-force
    top-k for a FIXED 20-query audit subset (smallest query ids —
    deterministic) and emits one row asserting mean recall@5 ≥ 0.8.
    The 0.625 probe fraction is the measured scale-stable operating
    point on this corpus: recall@5 at ~62% of sqrt(N) cells probed is
    0.90 (sf0.01, 14/22 cells) and 0.92 (sf0.1, 29/45) — the same
    recall the old pinned 5-of-8 config measured, because these
    near-uniform synthetic vectors are the hardest case for coarse
    quantization and recall tracks the probed-mass fraction, NOT the
    absolute cell count (40%→0.81-0.82, 75%→0.94-0.97 at both scales;
    /tmp-reproducible via tools/ann_scale_trend.py + the fixture sweep).
    On realistic CLUSTERED corpora the same sqrt(N) rule needs only a
    constant few probes: measured recall@5 = 1.000 at n_probe=5 (1.1%
    of cells) on a 200 k-vector clustered corpus (PERF.md trend table).
    A recall regression is a hard hash mismatch, not a silent quality
    drop. The audit cost is 20 × corpus — constant in query count,
    linear in corpus. Per-configuration recall curves are additionally
    pinned in test_functions.py."""
    import math

    from ..functions.similarity import (
        auto_n_cells, cosine, ivf_topk, kmeans_ivf_index,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    n_cells = auto_n_cells(emb.count())
    n_probe = math.ceil(0.625 * n_cells)
    # Materialize the assignment once: ivf_topk consumes `indexed` three
    # times (centroid derivation, query-side probes, corpus side), and
    # each use would otherwise re-run model.transform over the corpus.
    # In production the index IS a persisted table (incremental_ann_
    # ingest); this checkpoint is the in-query stand-in for that.
    # max_iter=4 + random init: a coarse quantizer needs roughly-balanced
    # cells, not converged centers — random-init recall@5 at n_probe=5 is
    # 0.91/0.91 (sf0.01/sf0.1), BETTER than k-means|| init's 0.89/0.88 on
    # these near-uniform vectors, and drops the fit (the query's dominant
    # cost term) ~4x by skipping the k-means|| init passes.
    indexed = kmeans_ivf_index(
        emb, n_cells=n_cells, seed=42, max_iter=4, init_mode="random"
    ).localCheckpoint(eager=True)
    queries = (
        indexed.filter(F.col("vec_id") % 25 == 0)
        .orderBy("vec_id")
        .limit(200)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding"))
        # limit leaves one partition; spread the per-query probe work
        .repartition(8, "query_id")
    )
    k = 5
    ivf = ivf_topk(
        indexed, queries, k=k, n_probe=n_probe, centroid_col="ivf_cell",
        dim=EMB_DIM,
    )
    audit_q = queries.orderBy("query_id").limit(20)
    from ..ops.skew import salted_topk

    q = audit_q.select("query_id", F.col("embedding").alias("qv"))
    # salted two-level top-k for the exact audit too: a bare window over
    # the 20 query ids would sort the FULL corpus per query in 20
    # single tasks
    exact = salted_topk(
        emb.crossJoin(F.broadcast(q)).withColumn(
            "cosine", cosine("embedding", "qv", EMB_DIM)
        ),
        partition_by=["query_id"],
        order_by=[F.col("cosine").desc(), F.col("vec_id")],
        k=k,
        salt_on="vec_id",
    ).select("query_id", "vec_id")
    hits = (
        ivf.join(exact, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    per_query = audit_q.select("query_id").join(hits, "query_id", "left").select(
        "query_id", (F.coalesce(F.col("n_hits"), F.lit(0)) / k).alias("recall")
    )
    recall = per_query.agg((F.avg("recall") >= 0.8).alias("recall_ok"))
    return queries.agg(F.count("*").alias("n_queries")).crossJoin(
        F.broadcast(recall)
    )


@register(
    "x_approx_distinct",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(TRUE AS BOOLEAN) AS approx_ok
FROM events GROUP BY event_type
""",
)
def x_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type — the
    constant-memory cardinality sketch for 100 TB streams where exact
    distinct would shuffle every key.

    Sketch estimates are engine-specific by nature (DuckDB's
    approx_count_distinct uses a different HLL construction), so the raw
    estimate can't cross-check; the hash-checkable contract is an error
    BOUND instead: the query also computes the exact per-group distinct
    (the sampled audit you'd run at scale) and asserts the HLL estimate
    lands within 3× the configured rsd (2% → 6%). An estimator
    regression is a hard hash mismatch, not a silent accuracy drop."""
    (e,) = tables(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.06 * F.col("exact_users")
        ).alias("approx_ok"),
    )


@register(
    "x_embedding_norms",
    oracle="""
SELECT label,
       COUNT(*) AS n_vectors,
       MIN(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))) AS min_norm,
       MAX(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))) AS max_norm
FROM embeddings GROUP BY label
""",
)
def x_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-norm hygiene stats (min/max L2 norm + count) —
    the cheap sanity scan before any similarity work (catches unnormalized
    or degenerate vectors). min/max (not sums) keep the doubles
    order-independent and oracle-exact."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    norm = F.expr(_NORM_SPARK.format(a="embedding"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.min(norm).alias("min_norm"),
        F.max(norm).alias("max_norm"),
    )


#: JL projection geometry: 64 → 8 dims with Achlioptas's sparse
#: {+1, 0, -1} matrix (P = 1/6, 2/3, 1/6) scaled by sqrt(3/k); the
#: matrix is generated ONCE from a seeded PRNG and embedded as literal
#: constants in BOTH dialects (the random_hyperplanes recipe), so the
#: projection is a fixed pure function — at 100 TB the matrix is ~0
#: bytes of driver state and the whole operator is a narrow projection
JL_IN_DIM = 64
JL_OUT_DIM = 8
JL_SCALE = (3.0 / JL_OUT_DIM) ** 0.5  # repr() round-trips exactly


def _jl_matrix(d: int = JL_IN_DIM, k: int = JL_OUT_DIM, seed: int = 7) -> list[list[int]]:
    """k columns of d sparse Achlioptas entries in {+1, 0, -1}."""
    import random

    rng = random.Random(seed)
    cols = []
    for _ in range(k):
        col = []
        for _ in range(d):
            u = rng.random()
            col.append(1 if u < 1 / 6 else (-1 if u > 5 / 6 else 0))
        cols.append(col)
    return cols


def _jl_cols(spark_side: bool) -> list[str]:
    out = []
    for j, col in enumerate(_jl_matrix()):
        lits = ", ".join(f"{float(m)}" for m in col)
        if spark_side:
            expr = (
                f"aggregate(zip_with(v, array({lits}), (x, m) -> x * m),"
                f" 0.0D, (a, b) -> a + b) * {JL_SCALE!r}D"
            )
        else:
            expr = (
                f"list_sum(list_transform(list_zip(v, [{lits}]::DOUBLE[]),"
                f" p -> p[1] * p[2])) * CAST({JL_SCALE!r} AS DOUBLE)"
            )
        out.append(f"{expr} AS f{j}")
    return out


# nullif: a zero vector has nx = 0 and an (undefined) norm ratio — NULL in
# both dialects, never an engine-specific 0/0 NaN-vs-error surprise
_JL_RATIO = (
    "(" + " + ".join(f"f{j} * f{j}" for j in range(JL_OUT_DIM)) + ") / nullif(nx, 0.0)"
)


@register(
    "x_jl_project",
    oracle=f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) AS nx
  FROM embeddings
), p AS (
  SELECT vec_id, nx, {", ".join(_jl_cols(spark_side=False))}
  FROM v
)
SELECT vec_id, {", ".join(f"f{j}" for j in range(JL_OUT_DIM))},
       {_JL_RATIO} AS norm_ratio
FROM p
""",
)
def x_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection (Achlioptas, JCSS 2003 —
    the database-friendly sparse matrix, public): {din}-dim embeddings
    down to {k} dims via a fixed seeded {{+1, 0, −1}} matrix scaled by
    sqrt(3/{k}), plus each vector's projected/original squared-norm
    ratio (the quantity JL bounds — E[ratio] = 1, concentration gives
    the distance guarantee; the pytest audit pins the corpus mean).
    Use it where coarse geometry suffices — clustering features,
    IVF cell assignment, storage/bandwidth cuts — at {din}/{k}× the
    per-comparison cost. Measured honestly: it is NOT a candidate
    filter for tight-margin near-dup on this corpus (true pairs sit at
    cosine ≥ 0.45 with the bulk at ~0.3–0.4; JL distortion at k = 8–32
    buries that margin — recall 0.56–0.75 with 1000× false candidates;
    PERF.md). Signed-hyperplane LSH / IVF remain the candidate
    generators; JL is the geometry compressor.

    Scale: ZERO shuffles — a narrow per-row projection ({k} sequential
    folds over the 2/3-sparse columns), exactly what survives any
    corpus size. Determinism: matrix literals are identical text in
    both dialects; each output coordinate is a sequential fold of
    double products in array order, then ONE multiply by the literal
    scale — bit-identical cross-engine (the x_dedup_embedding_pairs
    fold-parity recipe); norm_ratio adds one division of two such
    folds."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    vdf = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn(
        "nx",
        F.expr("aggregate(transform(v, x -> x * x), 0.0D, (a, b) -> a + b)"),
    )
    proj = vdf.select(
        "vec_id", "nx", *[F.expr(c) for c in _jl_cols(spark_side=True)]
    )
    return proj.select(
        "vec_id",
        *[f"f{j}" for j in range(JL_OUT_DIM)],
        F.expr(_JL_RATIO).alias("norm_ratio"),
    )


x_jl_project.__doc__ = x_jl_project.__doc__.format(din=JL_IN_DIM, k=JL_OUT_DIM)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "x_text_stats",
    # WS_CLASS, not RE2 '\s': the Spark side's Java \s includes \x0B,
    # RE2's does not — the oracle must spell the Java set explicitly
    oracle=f"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(trim(text), '{_WS}+'), t -> t <> '')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
       CAST(length(regexp_replace(text, '{_WS}', '', 'g')) AS DOUBLE)
         / nullif(len(list_filter(string_split_regex(trim(text), '{_WS}+'), t -> t <> '')), 0) AS avg_token_len
FROM documents
""",
)
def x_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality stats: token count, char count, whitespace count,
    mean token length — the cheap quality-scoring features a training-data
    pipeline computes on every document. Pure row-local expressions:
    embarrassingly parallel, no shuffle."""
    from ..functions.text import tokens_expr

    (docs,) = tables(spark, sf_dir, "documents")
    n_tokens = F.size(F.expr(tokens_expr("text"))).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
        .cast("long")
        .alias("n_spaces"),
        # \s-stripped length (not just spaces): tokens come from a \s+
        # split, so tab/newline separators must not count as token mass
        (
            F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast("double")
            / F.nullif(n_tokens, F.lit(0))
        ).alias("avg_token_len"),
    )


#: GPT-2-ish pre-tokenizer classes: letter runs | single digits | single
#: non-alnum glyph. Basic character classes only — Java regex (Spark) and
#: RE2 (DuckDB) agree on these.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
#: duck twin: the class-internal \s spelled as the explicit Java set
#: (RE2's \s lacks \x0B — see functions.text.WS_CLASS)
BPE_TOKEN_RE_DUCK = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9" + _WS[1:]


@register(
    "x_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(trim(text), '{_WS}+'), t -> t <> '')) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE_DUCK}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE_DUCK}')) AS DOUBLE)
         / nullif(len(list_filter(string_split_regex(trim(text), '{_WS}+'), t -> t <> '')), 0) AS fertility
FROM documents
""",
)
def x_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish pre-tokenizer
    regex (letter runs / digits / punctuation glyphs), plus their ratio
    ("fertility" — tokens per word, the cost predictor for LLM training
    budgets). Row-local regex work, JVM-side, no shuffle: the canonical
    100 TB token-accounting scan."""
    from ..functions.text import tokens_expr

    (docs,) = tables(spark, sf_dir, "documents")
    n_words = F.size(F.expr(tokens_expr("text"))).cast("long")
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), 0)).cast("long")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_bpe.alias("n_bpe_tokens"),
        (n_bpe.cast("double") / F.nullif(n_words, F.lit(0))).alias("fertility"),
    )


HIST_LO, HIST_HI, HIST_BUCKETS = 0, 600, 12


_WB_DUCK = f"""CASE WHEN n_chars < {HIST_LO} THEN 0
     WHEN n_chars >= {HIST_HI} THEN {HIST_BUCKETS + 1}
     ELSE 1 + CAST(floor((n_chars - {HIST_LO}) * {HIST_BUCKETS}.0
                         / {HIST_HI - HIST_LO}) AS BIGINT) END"""


@register(
    "x_length_histogram",
    oracle=f"""
SELECT source,
       CAST({_WB_DUCK} AS BIGINT) AS bucket,
       CAST(({_WB_DUCK} - 1) * {(HIST_HI - HIST_LO) // HIST_BUCKETS} AS BIGINT)
         AS bucket_lo,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2, 3
""",
)
def x_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length histogram (fixed-width SQL-standard
    width_bucket bins): the batch-shape / sequence-length profile a
    training pipeline reads before choosing context length and packing
    budgets. Map-side-combinable groupBy on (source, bucket) — bucket
    cardinality is constant, so the exchange carries at most
    sources × (buckets + 2) rows at ANY corpus size."""
    (docs,) = tables(spark, sf_dir, "documents")
    bucket = F.width_bucket(
        "n_chars", F.lit(HIST_LO), F.lit(HIST_HI), F.lit(HIST_BUCKETS)
    ).cast("long")
    width = (HIST_HI - HIST_LO) // HIST_BUCKETS
    return (
        docs.groupBy(
            "source",
            bucket.alias("bucket"),
            ((bucket - 1) * width).cast("long").alias("bucket_lo"),
        )
        .agg(F.count("*").alias("n_docs"))
    )


VOCAB_SIZE = 20


@register(
    "x_vocab_encode",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, i AS pos, ws[i] AS token
  FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), '{_WS}+'), t -> t <> '') AS ws FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
),
vocab AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY COUNT(*) DESC, token) AS INT) AS token_id
  FROM tok GROUP BY token
  QUALIFY token_id <= {VOCAB_SIZE}
),
enc AS (
  SELECT t.doc_id, t.pos, COALESCE(v.token_id, 0) AS tid
  FROM tok t LEFT JOIN vocab v USING (token)
)
SELECT doc_id, COUNT(*) AS n_tokens,
       array_to_string(list(tid ORDER BY pos), ',') AS token_ids
FROM enc GROUP BY doc_id
""",
)
def x_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build + token-id encoding (functions.text.build_vocab /
    encode_tokens): corpus-frequency top-20 vocabulary (deterministic
    count-then-token rank, 0 = OOV), every document re-emitted as its
    token-id sequence — the step between text cleanup and sequence
    packing in a training pipeline. The corpus-linear stage is a map-side-
    combinable count; ranking runs only on the distinct-term set
    (vocabulary-sized by Heaps' law), and encoding is a broadcast join."""
    (docs,) = tables(spark, sf_dir, "documents")
    from ..functions.text import build_vocab, encode_tokens

    vocab = build_vocab(docs, VOCAB_SIZE)
    enc = encode_tokens(docs, vocab)
    # the library emits real array<int>; the oracle contract has no array
    # type mapping, so the catalog surface serializes the sequence
    return enc.select(
        "doc_id",
        "n_tokens",
        F.array_join(F.col("token_ids").cast("array<string>"), ",").alias(
            "token_ids"
        ),
    )


_LANG_KEYWORDS = {
    "en": ["the", "and", "value"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
}


def _tok_eq_count(toks: str, kw: str, duck: bool) -> str:
    """EXACT token-equality count over a bound token array — not the
    ``replace(' kw ', '')`` length-arithmetic idiom, which undercounts
    ADJACENT repeats (consecutive markers share a delimiter space:
    'le le le' counts 2 of 3) and can flip an argmax on short docs.
    Same fix as functions.text.lang_scores (the library twin)."""
    if duck:
        return f"len(list_filter({toks}, t -> t = '{kw}'))"
    return f"size(filter({toks}, t -> t = '{kw}'))"


def _lang_id_sql(duck: bool, table: str = "documents") -> str:
    """Language-marker scores + argmax guess, one LET-bound whitespace
    split per row (the ``ws`` subquery column). Dialect deltas: len/size,
    list_filter/filter, string_split_regex/split — and the duck split
    pattern is WS_CLASS, not RE2 '\\s' (which lacks \\x0B)."""
    if duck:
        ws = (
            f"list_filter(string_split_regex(trim(text), '{_WS}+'),"
            " t -> t <> '')"
        )
    else:
        ws = "filter(split(trim(text), '\\\\s+'), t -> t <> '')"
    scores = {
        lang: "CAST("
        + " + ".join(_tok_eq_count("ws", kw, duck) for kw in kws)
        + " AS BIGINT)"
        for lang, kws in _LANG_KEYWORDS.items()
    }
    return f"""
WITH w AS (SELECT doc_id, {ws} AS ws FROM {table}),
s AS (
  SELECT doc_id,
         {scores['en']} AS score_en,
         {scores['de']} AS score_de,
         {scores['fr']} AS score_fr
  FROM w
)
SELECT doc_id, score_en, score_de,
       CASE WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_fr THEN 'de'
            ELSE 'fr' END AS lang_guess
FROM s
"""


@register("x_lang_id", oracle=_lang_id_sql(duck=True))
def x_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-frequency language ID heuristic: count language-marker
    tokens by exact token equality over ONE whitespace split (no regex in
    the hot loop, no UDF), argmax wins. The real quality gate would use
    richer n-gram profiles — the plumbing (row-local scoring then
    filter/route) is identical."""
    import uuid as _uuid

    (docs,) = tables(spark, sf_dir, "documents")
    view = f"lang_id_docs_{_uuid.uuid4().hex}"
    docs.createOrReplaceTempView(view)
    try:
        return spark.sql(_lang_id_sql(duck=False, table=view))
    finally:
        spark.catalog.dropTempView(view)


#: character-trigram profiles (public linguistic facts: the highest-
#: frequency trigrams of each language's running text). Substring counts —
#: no word boundaries — so morphology inside words votes too ("sch" fires
#: on "deutsche", "ing" on "running").
_LANG_TRIGRAMS = {
    "en": ["the", "ing", "and", "ion", "ent", "her", "for", "tha"],
    "de": ["der", "ein", "sch", "ich", "nde", "die", "und", "che"],
    "fr": ["les", "ent", "que", "des", "ait", "ion", "eur", "our"],
}


def _tg_count(text_expr: str, tg: str) -> str:
    """Substring occurrence count of a trigram (identical SQL both engines)."""
    return (
        f"CAST((length({text_expr}) - length(replace({text_expr}, '{tg}', '')))"
        f" / 3 AS BIGINT)"
    )


def _lang_ngram_sql() -> tuple[dict[str, str], str]:
    """Per-language trigram-profile scores + argmax guess (en > de > fr
    tie-break, matching profile-list order)."""
    scores = {
        lang: "(" + " + ".join(_tg_count("lower(text)", tg) for tg in tgs) + ")"
        for lang, tgs in _LANG_TRIGRAMS.items()
    }
    guess = (
        f"CASE WHEN {scores['en']} >= {scores['de']}"
        f"      AND {scores['en']} >= {scores['fr']} THEN 'en'"
        f"     WHEN {scores['de']} >= {scores['fr']} THEN 'de'"
        f"     ELSE 'fr' END"
    )
    return scores, guess


@register(
    "x_lang_id_ngram",
    oracle=f"""
SELECT doc_id,
       {_lang_ngram_sql()[0]['en']} AS tg_en,
       {_lang_ngram_sql()[0]['de']} AS tg_de,
       {_lang_ngram_sql()[0]['fr']} AS tg_fr,
       {_lang_ngram_sql()[1]} AS lang_guess
FROM documents
""",
)
def x_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-n-gram language ID — the classic trigram-profile heuristic
    (Cavnar & Trenkle 1994, public): count each language profile's top
    trigrams as substrings of the lowercased text, argmax wins. Unlike the
    stopword variant (``x_lang_id``), this scores INSIDE words, so it
    stays robust on punctuation-stripped or concatenated text. Pure
    row-local length/replace arithmetic — no regex, no UDF, no shuffle —
    the shape that language-routes a 100 TB corpus at scan speed.
    (The driver corpus's ``lang`` column is a synthetic label unrelated
    to its English-ish generated text, so the gate here — as for
    ``x_lang_id`` — is score exactness vs the oracle, not label
    agreement.)"""
    (docs,) = tables(spark, sf_dir, "documents")
    scores, guess = _lang_ngram_sql()
    return docs.select(
        "doc_id",
        F.expr(scores["en"]).alias("tg_en"),
        F.expr(scores["de"]).alias("tg_de"),
        F.expr(scores["fr"]).alias("tg_fr"),
        F.expr(guess).alias("lang_guess"),
    )


#: winnowing window (fingerprints = per-window minima of positional gram
#: hashes; guarantee: substring matches ≥ WINNOW_W + 4 chars always share
#: a fingerprint)
WINNOW_W = 4
#: fingerprints appearing in more than this many docs are boilerplate —
#: excluded from pair generation (the prefix-filter discipline again:
#: candidate cost Σ df² stays bounded by construction)
WINNOW_DF_CAP = 20

#: POSITIONAL gram hashes (winnowing needs adjacency — no array_distinct);
#: same short-doc empty-set guard as GRAM_HASHES (ANSI-safe, see above)
POS_GRAM_HASHES_SPARK = (
    "CASE WHEN size(cs) < 5 THEN CAST(array() AS ARRAY<BIGINT>) ELSE "
    "transform(sequence(1, size(cs)-4),"
    f" i -> {_gram5_hash(lambda j: f'element_at(cs, i + {j})')}) END"
)
POS_GRAM_HASHES_DUCK = (
    "CASE WHEN len(cs) < 5 THEN CAST([] AS BIGINT[]) ELSE "
    f"[{_gram5_hash(lambda j: f'cs[i + {j}]')}"
    " for i in generate_series(1, len(cs)-4)] END"
)

# empty-gram guard: a doc shorter than the gram size has hs = [] and the
# unguarded window transform would emit a [NULL] "fingerprint" (array_min
# of an empty slice) — a bogus shared-by-all-short-docs key. Guard to [].
_WINNOW_SPARK = (
    "CASE WHEN size(hs) = 0 THEN CAST(array() AS ARRAY<BIGINT>) ELSE "
    f"array_distinct(transform(sequence(1, greatest(size(hs)-{WINNOW_W - 1}, 1)),"
    f" i -> array_min(slice(hs, i, {WINNOW_W})))) END"
)
_WINNOW_DUCK = (
    "CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[]) ELSE "
    f"list_distinct([list_min(hs[i:i+{WINNOW_W - 1}])"
    f" for i in generate_series(1, greatest(len(hs)-{WINNOW_W - 1}, 1))]) END"
)

_WINNOW_DUCK_CTES = f"""cp AS (
  SELECT doc_id, {CODEPOINTS_DUCK} AS cs FROM documents
), hs AS (
  SELECT doc_id, {POS_GRAM_HASHES_DUCK} AS hs FROM cp
), fps AS (
  SELECT doc_id, unnest({_WINNOW_DUCK}) AS fp FROM hs
)"""


@register(
    "x_winnowing_fingerprints",
    oracle=f"""
WITH {_WINNOW_DUCK_CTES}
SELECT h.doc_id,
       CAST(len(h.hs) AS BIGINT) AS n_grams,
       CAST(len({_WINNOW_DUCK}) AS BIGINT) AS n_fp,
       CAST(len({_WINNOW_DUCK}) AS DOUBLE) / nullif(len(h.hs), 0) AS density
FROM hs h
""",
)
def x_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint summary (Schleimer-Wilkerson-Aiken / MOSS,
    SIGMOD 2003): positional 5-gram polynomial hashes → per-window (w=4)
    minima → distinct fingerprint set. Any shared substring ≥ w+k-1 chars
    guarantees a shared fingerprint at ~2/(w+1) index density — the
    deterministic-recall alternative to uniform sampling. The whole
    selection is one row-local array chain (JVM codegen, zero shuffle);
    output is per-doc accounting. Library twin with xxhash64:
    ``functions.dedup.winnowing_fingerprints``."""
    (docs,) = tables(spark, sf_dir, "documents")
    # spread a severely-narrow scan: zero-shuffle chains otherwise run
    # as ONE task on a single-file fixture (no-op on a wide input)
    docs = spread_narrow(docs.select("doc_id", "text"), "doc_id")
    return (
        docs.select("doc_id", F.expr(CODEPOINTS_SPARK).alias("cs"))
        .select("doc_id", F.expr(POS_GRAM_HASHES_SPARK).alias("hs"))
        .select(
            "doc_id",
            F.size("hs").cast("long").alias("n_grams"),
            F.expr(_WINNOW_SPARK).alias("_w"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.size("_w").cast("long").alias("n_fp"),
            (
                F.size("_w").cast("double")
                / F.nullif(F.col("n_grams"), F.lit(0))  # empty doc: NULL, not /0
            ).alias("density"),
        )
    )


@register(
    "x_winnowing_pairs",
    oracle=f"""
WITH {_WINNOW_DUCK_CTES},
rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(DISTINCT doc_id) <= {WINNOW_DF_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fps a
JOIN rare USING (fp)
JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
""",
)
def x_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap candidates: documents sharing ≥2 winnowing
    fingerprints, with boilerplate fingerprints (df > cap) excluded
    BEFORE the self-join — candidate cost is Σ df² over rare
    fingerprints, bounded by the cap, never corpus². The same
    broadcast-the-tiny-side + equi-join shape as the MinHash band join;
    text never moves, only 8-byte fingerprints."""
    (docs,) = tables(spark, sf_dir, "documents")
    # spread a severely-narrow scan before the CPU-heavy fingerprint
    # chain (no-op on a wide input)
    src = spread_narrow(docs.select("doc_id", "text"), "doc_id")
    fps = (
        src.select("doc_id", F.expr(CODEPOINTS_SPARK).alias("cs"))
        .select("doc_id", F.expr(POS_GRAM_HASHES_SPARK).alias("hs"))
        .select("doc_id", F.explode(F.expr(_WINNOW_SPARK)).alias("fp"))
    )
    fps = fps.repartition("fp")
    rare = fps.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("_df")
    ).filter(F.col("_df") <= WINNOW_DF_CAP).select("fp")
    a = fps.join(rare, "fp").alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


_STOPWORDS = ["the", "and", "of", "to", "der", "und", "le", "et"]


def _quality_sql(global_flag: str, table: str = "documents") -> str:
    """Quality-score SQL in both dialects (basic regex + length
    arithmetic + one bound whitespace split). DuckDB regexp_replace is
    single-match without 'g', so the flag is passed there; Spark replaces
    globally by default. Dialect deltas beyond the flag: len/size,
    list_filter/filter, string_split_regex/split, and the duck split
    pattern is WS_CLASS, not RE2 '\\s' (which lacks \\x0B).
    ``table`` parameterizes the FROM target: the Spark side binds a
    UNIQUE per-call temp view instead of registering a session-global
    'documents' view, which would shadow that name for every later
    spark.sql in the session and race concurrent catalog builds.

    Zero-input guards: every ratio divides through ``nullif(.., 0)`` — an
    EMPTY document must yield NULL ratios (and keep=FALSE via 3VL with the
    n_chars gate), not a dialect-dependent div-by-zero surprise. Stopword
    hits use exact token equality over the bound split (``_tok_eq_count``)
    — the replace-arithmetic idiom undercounts adjacent markers."""
    duck = bool(global_flag)
    if duck:
        ws = (
            f"list_filter(string_split_regex(lower(trim(text)), '{_WS}+'),"
            " t -> t <> '')"
        )
        n_words = "CAST(len(ws) AS BIGINT)"
    else:
        ws = "filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')"
        n_words = "CAST(size(ws) AS BIGINT)"
    n_chars = "CAST(length(text) AS BIGINT)"
    alpha = (
        f"CAST(length(regexp_replace(text, '[^A-Za-z]', ''{global_flag})) AS DOUBLE)"
        " / nullif(length(text), 0)"
    )
    punct = (
        f"CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', ''{global_flag}))"
        " AS DOUBLE) / nullif(length(text), 0)"
    )
    stop_hits = " + ".join(_tok_eq_count("ws", kw, duck) for kw in _STOPWORDS)
    stop_ratio = f"CAST({stop_hits} AS DOUBLE) / nullif({n_words}, 0)"
    score = f"(({alpha}) + (1.0 - ({punct})) + least(({stop_ratio}) * 2.0, 1.0)) / 3.0"
    return f"""
SELECT doc_id,
       {n_chars} AS n_chars,
       {alpha} AS alpha_ratio,
       {punct} AS punct_ratio,
       {stop_ratio} AS stop_ratio,
       {score} AS quality_score,
       ({score}) >= 0.5 AND {n_chars} >= 20 AS keep
FROM (SELECT doc_id, text, {ws} AS ws FROM {table})
"""


@register("x_quality_score", oracle=_quality_sql(", 'g'"))
def x_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality scoring — alphabetic ratio, punctuation
    density, stopword rate — combined into a [0,1] score and a keep/drop
    gate (the C4/Gopher-style filter shape). Every feature is a row-local
    expression (regex strip + length arithmetic): the filter runs at scan
    speed with zero shuffle. Same SQL text runs in DuckDB, modulo its
    non-global-default regexp_replace flag and split-function name."""
    import uuid as _uuid

    (docs,) = tables(spark, sf_dir, "documents")
    view = f"quality_docs_{_uuid.uuid4().hex}"
    docs.createOrReplaceTempView(view)
    try:
        return spark.sql(_quality_sql("", table=view))
    finally:
        spark.catalog.dropTempView(view)


@register(
    "x_fingerprint",
    oracle=f"""
SELECT doc_id,
       {_FOLD_DUCK.format(s="text", p=P)} AS fingerprint,
       {_FOLD_DUCK.format(s="substr(text, 1, 64)", p=P)} AS prefix_fingerprint
FROM documents
""",
)
def x_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: polynomial rolling hash of the
    full text and of the first 64 chars (prefix fingerprint for fast
    candidate filtering). Content-addressable identity that any engine can
    recompute — unlike murmur/xxhash which are engine-specific."""
    (docs,) = tables(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(_FOLD_SPARK.format(s="text", p=P)).alias("fingerprint"),
        F.expr(_FOLD_SPARK.format(s="substring(text, 1, 64)", p=P)).alias(
            "prefix_fingerprint"
        ),
    )


# ---------------------------------------------------------------------------
# Multimodal metadata (the SQL-checkable half; binary decode plumbing is in
# functions.multimodal with pytest coverage)
# ---------------------------------------------------------------------------


@register(
    "x_multimodal_meta",
    oracle="""
SELECT doc_id,
       md5(text) AS content_md5,
       sha256(text) AS content_sha256,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       lang, source
FROM documents
""",
)
def x_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload metadata columns: content hashes + byte length — the
    typed-metadata side of the multimodal design (payload stays an opaque
    binary column; all routing/dedup decisions read only the metadata).
    functions.multimodal adds the mapInPandas decode/feature plumbing."""
    (docs,) = tables(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.sha2("text", 256).alias("content_sha256"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        "lang",
        "source",
    )


@register(
    "x_image_roundtrip_meta",
    oracle="""
SELECT doc_id AS media_id,
       CAST(8 + doc_id % 16 AS INT) AS width,
       CAST(8 + (doc_id * 7) % 16 AS INT) AS height,
       'RGB' AS mode,
       CAST(TRUE AS BOOLEAN) AS _decode_ok
FROM documents WHERE doc_id % 10 = 0
""",
)
def x_image_roundtrip_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end through the multimodal seams: synthesize
    a doc_id-sized RGB image per document (1-in-10 slice), encode it as an
    actual PNG inside one Arrow-batched stage, then recover its dimensions
    with the DEFAULT ``decode_image_meta`` path (``functions.codecs``
    pure-stdlib PNG decoder). The oracle predicts width/height from
    doc_id arithmetic — so a broken encoder, a broken decoder, or a stub
    leaking back into the default path all hash-mismatch. Payload bytes
    move through exactly one mapInPandas pair; everything else is
    metadata-only, per the multimodal design contract."""
    from ..functions.multimodal import decode_image_meta

    (docs,) = tables(spark, sf_dir, "documents")
    src = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("media_id"),
        (8 + F.col("doc_id") % 16).cast("int").alias("w"),
        (8 + (F.col("doc_id") * 7) % 16).cast("int").alias("h"),
    )
    schema = "media_id long, payload binary"

    def synth(batches):
        import numpy as np
        import pandas as pd

        from bi_gcp_stitch_repl_spark.functions.codecs import encode_png

        for pdf in batches:
            out = []
            for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                # deterministic pixels without RNG: value = (id + index) % 256
                px = (
                    (int(mid) + np.arange(int(h) * int(w) * 3)) % 256
                ).astype(np.uint8).reshape(int(h), int(w), 3)
                out.append({"media_id": mid, "payload": encode_png(px)})
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    payloads = src.mapInPandas(synth, schema=schema)
    return decode_image_meta(payloads)


@register(
    "x_audio_roundtrip_features",
    oracle="""
SELECT doc_id AS media_id,
       CAST(CAST((1 + doc_id % 32000) AS REAL) / 32768.0 AS DOUBLE) AS rms0,
       CAST(CAST((1 + doc_id % 32000) AS REAL) / 32768.0 AS DOUBLE) AS rms1,
       CAST(CAST((1 + doc_id % 32000) AS REAL) / 32768.0 AS DOUBLE) AS rms2,
       CAST(TRUE AS BOOLEAN) AS _extract_ok
FROM documents WHERE doc_id % 10 = 5
""",
)
def x_audio_roundtrip_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end-to-end: synthesize a 16-bit PCM WAV per
    document (1-in-10 slice) holding a constant doc_id-derived amplitude
    k = 1 + doc_id % 32000, decode it with the DEFAULT
    ``extract_audio_features`` path (stdlib ``wave`` + numpy RMS
    envelope), and emit the per-chunk RMS values. A constant signal's RMS
    is exactly k/32768 — representable in float32 and reproduced by the
    SQL oracle bit-for-bit (the int16 sample, its square, the chunk mean,
    and the square root are all exact IEEE operations here), so the
    decode path is hash-verified, not just shape-checked."""
    from ..functions.multimodal import extract_audio_features

    (docs,) = tables(spark, sf_dir, "documents")
    src = docs.filter(F.col("doc_id") % 10 == 5).select(
        F.col("doc_id").alias("media_id"),
        (1 + F.col("doc_id") % 32000).cast("int").alias("k"),
    )

    def synth(batches):
        import io
        import wave as wave_mod

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, k in zip(pdf["media_id"], pdf["k"]):
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(
                        np.full(240, int(k), dtype="<i2").tobytes()
                    )
                out.append({"media_id": mid, "payload": buf.getvalue()})
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    payloads = src.mapInPandas(synth, schema="media_id long, payload binary")
    feats = extract_audio_features(payloads, n_features=3)
    return feats.select(
        "media_id",
        F.col("features")[0].cast("double").alias("rms0"),
        F.col("features")[1].cast("double").alias("rms1"),
        F.col("features")[2].cast("double").alias("rms2"),
        "_extract_ok",
    )


@register(
    "x_frame_sample_plan",
    oracle="""
SELECT doc_id AS media_id, CAST(i * 2.5 AS DOUBLE) AS sample_ts
FROM (SELECT doc_id, n_chars / 100.0 AS duration_sec FROM documents),
     LATERAL UNNEST(generate_series(0, CAST(floor(duration_sec / 2.5) AS INT))) AS t(i)
""",
)
def x_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (functions.multimodal.frame_sample_plan):
    one row per (media, sample timestamp), every 2.5 s across each clip's
    duration — the Catalyst-side half of frame extraction. The plan rows
    are tiny, so the shuffle that balances the downstream mapInPandas
    decode happens on (id, ts) pairs, never on video bytes; at 100 TB of
    video that ordering is the difference between shuffling kilobytes and
    shuffling the corpus. Duration here is synthesized from n_chars
    (documents stand in for clip metadata); the real pipeline reads it
    from attach_payload_meta."""
    from ..functions.multimodal import frame_sample_plan

    (docs,) = tables(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") / 100.0).alias("duration_sec"),
    )
    return frame_sample_plan(media, every_n_seconds=2.5, id_col="media_id")


@register(
    "x_video_frames_roundtrip",
    oracle="""
SELECT doc_id AS media_id,
       CAST(i * 2 AS INT) AS frame_idx,
       CAST(8 + (doc_id % 5) * 2 AS INT) AS width,
       CAST(6 + (doc_id % 3) * 2 AS INT) AS height,
       CAST(4 + doc_id % 5 AS INT) AS n_frames,
       CAST((doc_id + i * 2 * 17) % 251 AS DOUBLE) AS mean_luma,
       CAST(TRUE AS BOOLEAN) AS _decode_ok
FROM documents,
     LATERAL UNNEST(generate_series(
         0, CAST(floor((3 + doc_id % 5) / 2.0) AS INT))) AS t(i)
WHERE doc_id % 10 = 3
""",
)
def x_video_frames_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video codec end-to-end: synthesize a mono Y4M clip per
    document (1-in-10 slice) — ``4 + doc_id % 5`` frames of
    ``(8 + doc_id%5*2) × (6 + doc_id%3*2)`` pixels, frame *f* filled with
    the constant ``(doc_id + f·17) % 251`` — then decode it with the
    DEFAULT ``extract_video_frames`` path (pure-stdlib YUV4MPEG2 parser,
    ``functions.codecs.iter_y4m_frames``) sampling every 2nd frame. A
    constant frame's mean luma is exactly its fill value, so the SQL
    oracle predicts every sampled frame's index/dims/total-count/mean
    bit-for-bit — the decode path is hash-verified, not shape-checked.
    Scale shape: synthesis and decode are both Arrow-batched mapInPandas
    over payload partitions (per-row cost constant, embarrassingly
    parallel); the sampling *plan* half is ``x_frame_sample_plan``."""
    from ..functions.multimodal import extract_video_frames

    (docs,) = tables(spark, sf_dir, "documents")
    src = docs.filter(F.col("doc_id") % 10 == 3).select(
        F.col("doc_id").alias("media_id"),
        (8 + (F.col("doc_id") % 5) * 2).cast("int").alias("w"),
        (6 + (F.col("doc_id") % 3) * 2).cast("int").alias("h"),
        (4 + F.col("doc_id") % 5).cast("int").alias("nf"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from bi_gcp_stitch_repl_spark.functions.codecs import encode_y4m

        for pdf in batches:
            out = []
            for mid, w, h, nf in zip(pdf["media_id"], pdf["w"], pdf["h"], pdf["nf"]):
                frames = [
                    np.full((int(h), int(w)), (int(mid) + f * 17) % 251, np.uint8)
                    for f in range(int(nf))
                ]
                out.append({"media_id": mid, "payload": encode_y4m(frames)})
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    payloads = src.mapInPandas(synth, schema="media_id long, payload binary")
    frames = extract_video_frames(payloads, every_n_frames=2, keep_frame_png=False)
    return frames.select(
        "media_id", "frame_idx", "width", "height", "n_frames",
        "mean_luma", "_decode_ok",
    )


@register(
    "x_mjpeg_avi_roundtrip",
    oracle="""
SELECT doc_id AS media_id,
       CAST(i * 3 AS INT) AS frame_idx,
       CAST(16 + (doc_id % 2) * 8 AS INT) AS width,
       CAST(8 + (doc_id % 3) * 8 AS INT) AS height,
       CAST(3 + doc_id % 4 AS INT) AS n_frames,
       CAST(128 + 2 * ((doc_id + 17 * i * 3) % 50 - 25) AS DOUBLE) AS mean_luma,
       CAST(TRUE AS BOOLEAN) AS _decode_ok
FROM documents,
     LATERAL UNNEST(generate_series(
         0, CAST(floor((2 + doc_id % 4) / 3.0) AS INT))) AS t(i)
WHERE doc_id % 10 = 7
""",
)
def x_mjpeg_avi_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-video codec end-to-end: synthesize an MJPEG AVI
    per document (1-in-10 slice) — ``3 + doc_id % 4`` grayscale JPEG
    frames, frame *f* filled with the constant
    ``128 + 2·((doc_id + 17f) % 50 − 25)`` — then decode through the
    DEFAULT ``extract_video_frames`` path (RIFF demux → baseline JPEG
    entropy decode → dequant → IDCT, all pure numpy/stdlib:
    ``functions.jpeg``), sampling every 3rd frame.

    The fills keep ``v − 128`` even, so at quality 50 (Annex K table,
    Q₀₀=16) the DC coefficient 8·(v−128) quantizes EXACTLY to
    (v−128)/2 and every AC coefficient rounds to zero — a DC-only block
    reconstructs the constant bit-exactly through the float IDCT
    (error ~1e−15, killed by the uint8 round). Mean luma is therefore
    exactly the fill value and the SQL oracle predicts the whole decode
    chain — entropy coding, zigzag, dequant, IDCT — value-for-value.
    DETERMINISM.md round-4 recipe, compressed-codec corollary."""
    from ..functions.multimodal import extract_video_frames

    (docs,) = tables(spark, sf_dir, "documents")
    src = docs.filter(F.col("doc_id") % 10 == 7).select(
        F.col("doc_id").alias("media_id"),
        (16 + (F.col("doc_id") % 2) * 8).cast("int").alias("w"),
        (8 + (F.col("doc_id") % 3) * 8).cast("int").alias("h"),
        (3 + F.col("doc_id") % 4).cast("int").alias("nf"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from bi_gcp_stitch_repl_spark.functions.jpeg import (
            encode_avi_mjpeg,
            encode_jpeg,
        )

        for pdf in batches:
            out = []
            for mid, w, h, nf in zip(pdf["media_id"], pdf["w"], pdf["h"], pdf["nf"]):
                frames = [
                    encode_jpeg(
                        np.full(
                            (int(h), int(w)),
                            128 + 2 * ((int(mid) + 17 * f) % 50 - 25),
                            np.uint8,
                        ),
                        quality=50,
                    )
                    for f in range(int(nf))
                ]
                out.append(
                    {
                        "media_id": mid,
                        "payload": encode_avi_mjpeg(frames, int(w), int(h)),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    payloads = src.mapInPandas(synth, schema="media_id long, payload binary")
    frames = extract_video_frames(payloads, every_n_frames=3, keep_frame_png=False)
    return frames.select(
        "media_id", "frame_idx", "width", "height", "n_frames",
        "mean_luma", "_decode_ok",
    )


@register(
    "x_image_dhash_near_dups",
    oracle="""
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS hamming
FROM documents a
JOIN documents b
  ON (a.doc_id // 30) = (b.doc_id // 30) AND a.doc_id < b.doc_id
WHERE a.doc_id % 10 = 2 AND b.doc_id % 10 = 2
""",
)
def x_image_dhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE near-dup dedup end-to-end
    (functions.multimodal.image_dhash → dhash_near_dup_pairs): a 1-in-10
    document slice synthesizes real PNGs in structural groups of ≤3
    (group = doc_id//30; every member shares the group's pixel pattern
    but carries its OWN uniform brightness shift (doc_id·13)%97), and
    the pipeline must recover exactly the within-group pairs at hamming
    0 — dHash's brightness invariance is structural (adjacent-cell
    comparisons), so a hash that reacted to the shift, a broken PNG
    encode/decode, a luma/box-average bug, or a banding join that
    misses buckets all hash-mismatch against the oracle's pure doc_id
    arithmetic.

    Pattern safety: each group's 8×9 grid cells are splitmix64-mixed
    values in [0,128) keyed on (gid, row, col) — a LINEAR mix (e.g.
    one multiplicative congruential pass) is NOT enough: adjacent-cell
    comparisons of a linear-in-(g,r,c) function are nearly constant in
    g and collapsed every group to the same dHash (measured, min
    hamming 0); the avalanche finalizer puts distinct groups ~32 bits
    apart — verified ≥16 bits minimum across ALL group pairs at
    sf0.001/0.01/0.1 (the pattern space is doc_id-deterministic, so
    the margin is fixed, not sampled). Max pixel 127+96 < 256: no wrap
    to break the shift invariance.

    Scale shape: synthesis/decode/hash are Arrow-batched row-local
    stages (pixels never shuffle); pairing shuffles only 8-byte
    fingerprints through the byte-band LSH buckets (candidates ∝
    Σ|bucket|², never all-pairs) — the x_simhash_pairs design carried
    to the image modality."""
    from ..functions.multimodal import dhash_near_dup_pairs, image_dhash

    (docs,) = tables(spark, sf_dir, "documents")
    src = docs.filter(F.col("doc_id") % 10 == 2).select(
        F.col("doc_id").alias("media_id"),
        F.expr("doc_id DIV 30").alias("gid"),
        ((F.col("doc_id") * 13) % 97).cast("int").alias("shift"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from bi_gcp_stitch_repl_spark.functions.codecs import encode_png

        for pdf in batches:
            out = []
            M = (1 << 64) - 1

            def mix(x):
                # splitmix64 finalizer: avalanche, NOT linear (see
                # docstring — a linear mix collapses every group's hash)
                x = (x + 0x9E3779B97F4A7C15) & M
                x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M
                x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M
                return (x ^ (x >> 31)) & M

            for mid, gid, b in zip(pdf["media_id"], pdf["gid"], pdf["shift"]):
                g, b = int(gid), int(b)
                # 8x9 dhash-grid-aligned cells (2px each -> 16x18 image),
                # cell value = splitmix64(gid, r, c) low 7 bits, [0,128)
                grid = np.array(
                    [
                        [mix(g * 72 + r * 9 + c) & 127 for c in range(9)]
                        for r in range(8)
                    ],
                    dtype=np.int64,
                )
                px = np.kron(grid, np.ones((2, 2), dtype=np.int64)) + b
                img = np.repeat(
                    px[:, :, None], 3, axis=2
                ).astype(np.uint8)
                out.append({"media_id": mid, "payload": encode_png(img)})
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    payloads = src.mapInPandas(synth, schema="media_id long, payload binary")
    hashes = image_dhash(payloads)
    return dhash_near_dup_pairs(hashes, max_hamming=8)


_SQDIST_DUCK = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])))"
)

KMEANS_K = 4


@register(
    "x_kmeans_assign",
    oracle=f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cents0 AS (
  SELECT vec_id AS cid, v AS cv FROM emb ORDER BY vec_id LIMIT {KMEANS_K}
),
a1 AS (
  SELECT vec_id, v, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (SELECT e.vec_id, e.v, c.cid,
               {_SQDIST_DUCK.format(a="e.v", b="c.cv")} AS dist
        FROM emb e CROSS JOIN cents0 c) s1
),
asg1 AS (SELECT vec_id, v, cid AS cluster FROM a1 WHERE rn = 1),
sums AS (
  SELECT cluster, i,
         list_sum(list_sort(list(x))) / CAST(COUNT(*) AS DOUBLE) AS m
  FROM (SELECT cluster, generate_subscripts(v, 1) AS i, unnest(v) AS x
        FROM asg1) t
  GROUP BY 1, 2
),
cents1 AS (SELECT cluster AS cid, list(m ORDER BY i) AS cv FROM sums GROUP BY 1),
a2 AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (SELECT e.vec_id, c.cid,
               {_SQDIST_DUCK.format(a="e.v", b="c.cv")} AS dist
        FROM emb e CROSS JOIN cents1 c) s2
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM a2 WHERE rn = 1
""",
)
def x_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd's KMeans rounds (k={KMEANS_K}, seeded by the k smallest
    vec_ids) as a pure deterministic DataFrame plan
    (functions.similarity.kmeans_lloyd): broadcast centroid table →
    JVM-side squared-L2 folds → per-vector argmin window → one (cluster,
    dim) update aggregation, repeated. The oracle replays the identical
    trajectory in SQL — every distance and centroid coordinate is
    bit-identical cross-engine (sequential folds, value-sorted update
    sums), so the final assignment hash-matches exactly. Scale twin:
    kmeans_ivf_index (pyspark.ml) fits the same shape without the
    sorted-update collect."""
    from ..functions.similarity import kmeans_lloyd

    (emb,) = tables(spark, sf_dir, "embeddings")
    return kmeans_lloyd(emb, k=KMEANS_K, n_iter=2)


#: x_kmeans_assign's oracle, reshaped as a CTE list ending in
#: km(vec_id, cluster) so x_semdedup's oracle can replay the identical
#: clustering trajectory (same CTE text, one extra closing CTE)
_KMEANS_CTES_DUCK = f"""
emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cents0 AS (
  SELECT vec_id AS cid, v AS cv FROM emb ORDER BY vec_id LIMIT {KMEANS_K}
),
a1 AS (
  SELECT vec_id, v, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (SELECT e.vec_id, e.v, c.cid,
               {_SQDIST_DUCK.format(a="e.v", b="c.cv")} AS dist
        FROM emb e CROSS JOIN cents0 c) s1
),
asg1 AS (SELECT vec_id, v, cid AS cluster FROM a1 WHERE rn = 1),
sums AS (
  SELECT cluster, i,
         list_sum(list_sort(list(x))) / CAST(COUNT(*) AS DOUBLE) AS m
  FROM (SELECT cluster, generate_subscripts(v, 1) AS i, unnest(v) AS x
        FROM asg1) t
  GROUP BY 1, 2
),
cents1 AS (SELECT cluster AS cid, list(m ORDER BY i) AS cv FROM sums GROUP BY 1),
a2 AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (SELECT e.vec_id, c.cid,
               {_SQDIST_DUCK.format(a="e.v", b="c.cv")} AS dist
        FROM emb e CROSS JOIN cents1 c) s2
),
km AS (SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM a2 WHERE rn = 1)"""


@register(
    "x_semdedup",
    oracle=f"""
WITH {_KMEANS_CTES_DUCK},
n AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
  FROM embeddings
),
d AS (
  SELECT DISTINCT ka.vec_id
  FROM km ka
  JOIN km kb ON ka.cluster = kb.cluster AND ka.vec_id > kb.vec_id
  JOIN n na ON na.vec_id = ka.vec_id
  JOIN n nb ON nb.vec_id = kb.vec_id
  WHERE list_sum(list_transform(list_zip(na.v, nb.v), x -> x[1]*x[2]))
          / nullif(na.nrm * nb.nrm, 0.0) >= {COSINE_DUP_THRESHOLD}
)
SELECT km.vec_id, km.cluster, (d.vec_id IS NULL) AS kept
FROM km LEFT JOIN d ON km.vec_id = d.vec_id
""",
)
def x_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-pruned semantic dedup (Abbas et al., 2023,
    public): cluster the embeddings (the deterministic ``kmeans_lloyd``
    trajectory shared with ``x_kmeans_assign``), then look for
    near-duplicate pairs ONLY within each cluster and drop every vector
    that has an earlier (lower-id) in-cluster neighbor at cosine ≥
    {t} — the one-pass keep-first rule SemDeDup applies inside each
    k-means cell. Output is row-per-vector (vec_id, cluster, kept).

    Scale: the point of the method — pair cost falls from the exact
    baseline's O(n²) (``x_dedup_embedding_pairs``) to Σ|cell|², and the
    pair search is an EQUI-join on the cluster id, so each cell's pairs
    build inside one shuffle partition. In production k grows with the
    corpus (cells stay bounded, cost ≈ n·cell_size) and the cells come
    from ``kmeans_ivf_index`` — the same frame the IVF-ANN index already
    maintains, so dedup rides the index's clustering for free; the
    catalog uses the k={k} exact trajectory because the oracle must
    replay it. Transitive chains: a→b→c with only adjacent pairs close
    drops b AND c (both have an earlier near neighbor); exact
    transitive survivorship is ``x_dedup_clusters``' connected-
    components path. Determinism: assignments and cosines are
    sequential-fold doubles, bit-identical cross-engine."""
    from ..functions.similarity import kmeans_lloyd, semdedup

    (emb,) = tables(spark, sf_dir, "embeddings")
    asg = kmeans_lloyd(emb, k=KMEANS_K, n_iter=2)
    # salt=16: at catalog scale there are only k=4 cells, so an unsalted
    # cluster equi-join runs on 4 tasks (measured 7.9 s vs 2.5 s salted
    # at sf0.1/local[32]) — see functions.similarity.semdedup
    return semdedup(
        asg.join(emb, "vec_id"), threshold=COSINE_DUP_THRESHOLD, dim=EMB_DIM
    )


x_semdedup.__doc__ = x_semdedup.__doc__.format(
    t=COSINE_DUP_THRESHOLD, k=KMEANS_K
)


@register(
    "x_approx_quantiles",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(TRUE AS BOOLEAN) AS p50_ok,
       CAST(TRUE AS BOOLEAN) AS p90_ok
FROM orders GROUP BY o_orderstatus
""",
)
def x_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna / t-digest family) per group —
    the constant-memory quantile path for 100 TB where a8's exact
    within-group sort is not affordable.

    Sketch internals are engine-specific, so (exactly like
    x_approx_distinct) the hash-checkable contract is the GUARANTEE, not
    the estimate: with accuracy=1000 the rank error is bounded by n/1000,
    so the estimate must land between the exact percentiles at p ± 0.02 —
    a band 20x looser than the guarantee, wide enough that the sketch's
    return-an-actual-value discretization (±1 rank, which a tight band
    undercuts at small n) can never graze the boundary. The query
    computes both the sketch and the exact band and emits the boolean; a
    sketch regression is a hard hash mismatch."""
    (o,) = tables(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("a50"),
        F.expr("approx_percentile(o_totalprice, 0.9, 1000)").alias("a90"),
        F.percentile("o_totalprice", F.lit(0.48)).alias("lo50"),
        F.percentile("o_totalprice", F.lit(0.52)).alias("hi50"),
        F.percentile("o_totalprice", F.lit(0.88)).alias("lo90"),
        F.percentile("o_totalprice", F.lit(0.92)).alias("hi90"),
    )
    return agg.select(
        "o_orderstatus",
        "n_orders",
        ((F.col("a50") >= F.col("lo50")) & (F.col("a50") <= F.col("hi50"))).alias("p50_ok"),
        ((F.col("a90") >= F.col("lo90")) & (F.col("a90") <= F.col("hi90"))).alias("p90_ok"),
    )


INDEX_TOP_TERMS = 50


@register(
    "x_inverted_index",
    oracle=f"""
WITH tf AS (
  SELECT term, doc_id, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
  GROUP BY 1, 2
),
ranked AS (
  SELECT term, COUNT(*) AS df, SUM(tf) AS cf,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rnk
  FROM tf GROUP BY term
)
SELECT r.term, CAST(r.df AS BIGINT) AS df, CAST(r.cf AS BIGINT) AS cf,
       string_agg(f.doc_id || ':' || f.tf, ',' ORDER BY f.doc_id) AS postings
FROM ranked r JOIN tf f USING (term)
WHERE r.rnk <= {INDEX_TOP_TERMS}
GROUP BY r.term, r.df, r.cf
""",
)
def x_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the artifact a lexical search stack (see
    x_bm25_topk for the scoring side) persists: per term, document
    frequency, collection frequency, and the doc-sorted posting list
    (serialized ``doc:tf`` for the oracle hash; the library form would
    keep the array). One (doc, term) count, one term-level regroup; the
    row_number rank window runs on the distinct-term set only
    (vocabulary-sized, never corpus-sized — same discipline as
    x_vocab_encode). Output bounded to the top-{INDEX_TOP_TERMS} terms by
    df with term tiebreak."""
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    terms = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.orderBy(F.desc("df"), "term")
    top = (
        terms.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= INDEX_TOP_TERMS)
        .drop("rnk")
    )
    return (
        tf.join(F.broadcast(top), "term")
        .groupBy("term", "df", "cf")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(doc_id, tf))),"
                " p -> concat(p.doc_id, ':', p.tf)), ',')"
            ).alias("postings")
        )
        .select("term", "df", "cf", "postings")
    )


_SIMHASH_HAM_T = 1  # max hamming distance; 4 bands catch up to 3 diffs
_SIMHASH_BANDS = 4  # 8-bit slices of the 32-bit fingerprint


def _simhash_pairs_duck() -> str:
    bands = ", ".join(str(b) for b in range(_SIMHASH_BANDS))
    return f"""
WITH sh AS ({_simhash_duck()}),
bands AS (
  SELECT doc_id, simhash, b, (simhash >> (8 * b)) & 255 AS band_val
  FROM sh, (SELECT unnest([{bands}]) AS b)
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
                  l.simhash AS ha, r.simhash AS hb
  FROM bands l JOIN bands r
    ON l.b = r.b AND l.band_val = r.band_val AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {_SIMHASH_HAM_T}
"""


@register("x_simhash_pairs", oracle=_simhash_pairs_duck())
def x_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS: documents within Hamming distance
    {t} of each other, found by the banded-bucket design — the 32-bit
    fingerprint splits into {nb} 8-bit bands; by pigeonhole, any pair
    within distance {nb}-1 collides in at least one band, so candidates
    come from band-value equi-joins (never an all-pairs pass) and the
    popcount(xor) verify runs only on collisions. Completes the dedup
    family: MinHash-LSH catches set-overlap near-dups, this catches
    bit-level (weighted-token) near-dups on an 8-byte key — the join
    shuffles fingerprints, not text. Pair dedup happens BEFORE the
    verify so a pair colliding in k bands is checked once."""
    sims = x_simhash(spark, sf_dir)  # doc_id, simhash
    band_arr = ", ".join(
        f"named_struct('b', {b}, 'v', shiftright(simhash, {8 * b}) & 255)"
        for b in range(_SIMHASH_BANDS)
    )
    bands = sims.select(
        "doc_id", "simhash", F.expr(f"explode(array({band_arr}))").alias("bv")
    ).select("doc_id", "simhash", F.col("bv.b").alias("b"), F.col("bv.v").alias("v"))
    # one exchange on the join key so both self-join sides hang off the
    # SAME shuffle and ReusedExchange computes the vote pipeline once
    bands = bands.repartition("b", "v")
    left = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "b", "v"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "b", "v"
    )
    cand = (
        left.join(right, on=["b", "v"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= _SIMHASH_HAM_T)
        .select("doc_a", "doc_b", "hamming")
    )


x_simhash_pairs.__doc__ = x_simhash_pairs.__doc__.format(
    t=_SIMHASH_HAM_T, nb=_SIMHASH_BANDS
)


#: feature-hashing dimensionality (16 buckets keeps the oracle SQL
#: readable; the construction is dimension-agnostic)
FEATHASH_DIM = 16


def _feathash_cols(spark_side: bool) -> list[str]:
    """One signed conditional sum per output dimension (identical SQL in
    both dialects): bucket = fold_hash(token) % DIM, sign = parity of
    (fold_hash // DIM) — the two independent hash bits the hashing trick
    needs (Weinberger et al. 2009)."""
    fold = (_FOLD_SPARK if spark_side else _FOLD_DUCK).format(s="tok", p=P)
    # sign bit = parity of (hash div DIM): expressed as hash % (2·DIM) <
    # DIM, which keeps the whole expression INTEGER arithmetic — a '/'
    # here would be double division in both dialects and its %2 test is
    # almost never exactly zero (a silently biased sign)
    return [
        f"CAST(COALESCE(SUM(CASE WHEN ({fold}) % {FEATHASH_DIM} = {i} "
        f"THEN CASE WHEN (({fold}) % {2 * FEATHASH_DIM}) < {FEATHASH_DIM} "
        f"THEN 1 ELSE -1 END "
        f"END), 0) AS BIGINT) AS f{i}"
        for i in range(FEATHASH_DIM)
    ]


@register(
    "x_feature_hash_embed",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '{_WS}+'),
                            w -> w <> '')) AS tok
  FROM documents
)
SELECT doc_id, {", ".join(_feathash_cols(spark_side=False))}
FROM tok GROUP BY doc_id
""",
)
def x_feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document embeddings (the hashing trick — Weinberger
    et al., ICML 2009, public): each token lands in ``hash % dim`` with a
    ±1 sign from an independent hash bit, summed per document — a
    model-free, vocabulary-free, deterministic text→vector bridge into
    the similarity stack (cosine/LSH/IVF run on these exactly as on
    learned embeddings, with the hashing trick's inner-product-preserving
    guarantee). One explode + ONE map-side-combinable aggregation; the
    vector never exists as an intermediate array, only as dim conditional
    sums — integer arithmetic end to end, so the oracle matches
    bit-for-bit."""
    (docs,) = tables(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(trim(text), '\\\\s+'), w -> w <> '')")
        ).alias("tok"),
    )
    return tok.groupBy("doc_id").agg(
        *[F.expr(c) for c in _feathash_cols(spark_side=True)]
    )


# ---------------------------------------------------------------------------
# Diversified rerank (MMR)
# ---------------------------------------------------------------------------

MMR_K = 8
MMR_POOL = 24
#: duck dual of functions.rerank's fold cosine, over candidate double arrays
_MMR_COS_DUCK = (
    "list_sum(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]))"
    " / nullif(sqrt(list_sum(list_transform({a}, x -> x*x)))"
    " * sqrt(list_sum(list_transform({b}, x -> x*x))), 0.0)"
)


def _mmr_oracle(k: int, pool: int) -> str:
    """Unrolled greedy-MMR SQL: pick_i is an argmax CTE over the candidates
    not yet selected, referencing the union of picks 1..i-1 — the textbook
    sequential dependence, expressed as k chained CTEs (the same unrolling
    discipline as the span-dedup oracle). Every chained CTE is
    ``AS MATERIALIZED``: inlining re-evaluates the whole prefix chain at
    each of its (multiple) references, doubling work per level — measured
    exponential (k=5 already 3.2 s; materialized, k=8 is 0.07 s).
    Constants are CAST(... AS DOUBLE) so both engines compare the SAME
    binary64 literals."""
    rel = _MMR_COS_DUCK.format(a="e.embedding::DOUBLE[]", b="q.qe")
    sim = _MMR_COS_DUCK.format(a="a.v", b="b.v")
    head = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v, {rel} AS rel
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
),
cand AS MATERIALIZED (SELECT vec_id, v, rel FROM scored WHERE rel IS NOT NULL
         ORDER BY rel DESC, vec_id LIMIT {pool}),
sim AS MATERIALIZED (
  SELECT a.vec_id AS ai, b.vec_id AS bi, {sim} AS s
  FROM cand a, cand b WHERE a.vec_id != b.vec_id
)"""
    return head + _mmr_greedy_sql(k)


def _mmr_greedy_sql(k: int) -> str:
    """The greedy-selection tail of an MMR oracle: k chained MATERIALIZED
    argmax CTEs over preceding ``cand (vec_id, v, rel)`` / ``sim (ai, bi,
    s)`` CTEs, ending in the UNION of picks. Shared by x_mmr_rerank
    (cosine relevance) and x_hybrid_mmr (RRF-fused relevance) — the
    relevance source is entirely the head's business."""
    parts = [
        """,
p1 AS MATERIALIZED (SELECT 1 AS rnk, vec_id, rel,
              CAST(0.7 AS DOUBLE)*rel - CAST(0.3 AS DOUBLE)*CAST(0.0 AS DOUBLE) AS mmr
       FROM cand ORDER BY mmr DESC, vec_id LIMIT 1),
sel1 AS MATERIALIZED (SELECT vec_id FROM p1)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f""",
p{i} AS MATERIALIZED (
  SELECT {i} AS rnk, c.vec_id, c.rel,
         CAST(0.7 AS DOUBLE)*c.rel - CAST(0.3 AS DOUBLE)*(
           SELECT MAX(s.s) FROM sim s
           WHERE s.ai = c.vec_id AND s.bi IN (SELECT vec_id FROM sel{i-1})) AS mmr
  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i-1})
  ORDER BY mmr DESC, c.vec_id LIMIT 1
),
sel{i} AS MATERIALIZED (SELECT vec_id FROM sel{i-1} UNION ALL SELECT vec_id FROM p{i})"""
        )
    union = "\nUNION ALL ".join(f"SELECT * FROM p{i}" for i in range(1, k + 1))
    return "".join(parts) + f"\n{union}\n"


@register("x_mmr_rerank", oracle=_mmr_oracle(MMR_K, MMR_POOL))
def x_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (functions.rerank):
    the rerank stage a retrieval pipeline runs AFTER ANN recall — select 8
    of the 24 most-relevant vectors, each pick trading relevance against
    similarity to what is already selected (lam=0.7, mu=0.3). Relevance
    scoring + the pool cut are distributed (broadcast query vector, fold
    cosine, TakeOrdered); the inherently-sequential greedy runs on the
    driver over the BOUNDED pool (documented in functions/rerank.py). The
    oracle unrolls the greedy as 8 chained argmax CTEs."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    from ..functions.rerank import mmr_rerank

    q = emb.filter(F.col("vec_id") == 0).select("embedding")
    return mmr_rerank(
        emb.filter(F.col("vec_id") != 0), q, k=MMR_K, pool=MMR_POOL
    )


# ---------------------------------------------------------------------------
# BPE merge training (functions/bpe.py) — the tokenizer-TRAINING step:
# x_vocab_encode encodes against a given vocabulary; this LEARNS the
# merges (Sennrich et al. 2016), which is the part of an LLM pipeline's
# tokenizer stage the reference (and plain SQL) cannot express.
# ---------------------------------------------------------------------------

BPE_MERGE_ROUNDS = 8


def _bpe_round_ctes(i: int) -> str:
    """One unrolled BPE merge round (the pagerank_iter_ctes discipline,
    7 CTEs): pair counts weighted by word freq → 1-row total-order
    argmax (cnt DESC, a ASC, b ASC) → position explode → candidate
    merge starts → LEFT-TO-RIGHT non-overlap via run parity (consecutive
    candidates share a symbol; within each maximal run the 1st, 3rd, …
    merge — the run groups by ``j - row_number()``) → rebuild arrays
    (merged position takes a||b, its successor drops)."""
    return f""",
p{i} AS MATERIALIZED (
  SELECT u.pr[1] AS a, u.pr[2] AS b, SUM(freq) AS cnt
  FROM w{i - 1}, unnest(list_zip(syms[1:len(syms)-1], syms[2:])) AS u(pr)
  GROUP BY 1, 2
),
m{i} AS MATERIALIZED (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1),
x{i} AS MATERIALIZED (
  SELECT w.word, w.freq, u.e.s AS sym, u.e.j AS j
  FROM w{i - 1} w,
       unnest(list_transform(w.syms,
              (s, j) -> struct_pack(s := s, j := j))) AS u(e)
),
c{i} AS MATERIALIZED (
  SELECT x.word AS word, x.j AS j,
         x.j - row_number() OVER (PARTITION BY x.word ORDER BY x.j) AS run
  FROM x{i} x JOIN x{i} y ON x.word = y.word AND y.j = x.j + 1
  CROSS JOIN m{i} m
  WHERE x.sym = m.a AND y.sym = m.b
),
g{i} AS MATERIALIZED (
  SELECT word, j FROM (
    SELECT word, j,
           row_number() OVER (PARTITION BY word, run ORDER BY j) AS rn
    FROM c{i}) WHERE rn % 2 = 1
),
w{i} AS MATERIALIZED (
  SELECT k.word, any_value(k.freq) AS freq, list(k.sym ORDER BY k.j) AS syms
  FROM (
    SELECT x.word, x.freq, x.j,
           CASE WHEN mg.j IS NOT NULL
                THEN x.sym || (SELECT b FROM m{i}) ELSE x.sym END AS sym
    FROM x{i} x
    LEFT JOIN g{i} mg ON x.word = mg.word AND x.j = mg.j
    LEFT JOIN g{i} sk ON x.word = sk.word AND x.j = sk.j + 1
    WHERE sk.j IS NULL
  ) k GROUP BY k.word
)"""


def _bpe_oracle(rounds: int) -> str:
    """Unrolled twin of functions.bpe.bpe_train over the corpus
    word-frequency table: the Spark side folds each word's rebuild
    row-locally with a (rebuilt, skip) accumulator; the oracle replays
    the same merge RELATIONALLY (position explode + run parity + two
    anti/equi joins) — two formulations of left-to-right non-overlap,
    one answer. A round past pair exhaustion has an empty m{{i}} and
    contributes no output row, matching the library's early stop."""
    head = f"""
WITH wf AS MATERIALIZED (
  SELECT u.t AS word, COUNT(*) AS freq
  FROM documents d,
       unnest(list_filter(string_split_regex(trim(d.text), '{_WS}+'),
                          t -> t <> '')) AS u(t)
  GROUP BY 1
),
w0 AS MATERIALIZED (
  SELECT word, freq,
         list_transform(range(1, length(word) + 1),
                        i -> substring(word, i, 1)) AS syms
  FROM wf
)"""
    tail = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, a, b, a || b AS merged,"
        f" CAST(cnt AS BIGINT) AS cnt FROM m{i}"
        for i in range(1, rounds + 1)
    )
    return (
        head
        + "".join(_bpe_round_ctes(i) for i in range(1, rounds + 1))
        + "\nSELECT * FROM (" + tail + ") ORDER BY merge_rank"
    )


@register("x_bpe_merges", oracle=_bpe_oracle(BPE_MERGE_ROUNDS))
def x_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training (functions.bpe.bpe_train) over the corpus
    word-frequency table: the first BPE_MERGE_ROUNDS learned merge rules
    ``(merge_rank, a, b, merged, cnt)`` — most-frequent adjacent symbol
    pair per round (word-frequency weighted, ties to the smallest (a, b)
    — a total order, so the whole learned SEQUENCE is hash-pinned),
    merged left-to-right non-overlapping within every vocabulary word.

    Scale shape: the ONE corpus exchange is the word-frequency
    aggregation (map-side combinable; output Heaps-law vocabulary-sized
    — BPE training never touches the corpus again, which is why real
    tokenizer trainers run on word counts). Each merge round is one
    zip-explode + combinable sum on the checkpointed vocabulary, a 1-row
    ordered argmax (the emitted rule itself — a result fetch, not a data
    materialization), and a row-local (rebuilt, skip) fold; superseded
    round checkpoints are released. Driver fast path at or below 100k
    vocabulary rows, property-pinned bit-identical to the distributed
    loop."""
    from ..functions.bpe import bpe_train, word_frequencies

    (docs,) = tables(spark, sf_dir, "documents")
    return bpe_train(word_frequencies(docs), BPE_MERGE_ROUNDS)


def _bpe_encode_oracle(rounds: int) -> str:
    """Unrolled twin of functions.bpe.bpe_encode with merges LEARNED from
    the same corpus: training's relational replay already carries the
    encoded vocabulary — ``w{rounds}``'s symbol arrays ARE each distinct
    word after every learned merge (the bpe_encode docstring contract:
    encode(train_corpus) reproduces training's final symbol state) — so
    the encode oracle joins the word-position explode back to ``w{rounds}``
    and regroups per document in position order. Tokens serialize as a
    space-joined string (whitespace tokenization means no token can
    contain a space, so the join is injective; the oracle contract has
    no array type mapping — the x_vocab_encode precedent)."""
    pos = f""",
pos AS MATERIALIZED (
  SELECT d.doc_id, u.e.t AS word, u.e.j AS j
  FROM documents d,
       unnest(list_transform(
         list_filter(string_split_regex(trim(d.text), '{_WS}+'),
                     t -> t <> ''),
         (t, j) -> struct_pack(t := t, j := j))) AS u(e)
)
SELECT p.doc_id,
       CAST(SUM(len(w.syms)) AS BIGINT) AS n_tokens,
       array_to_string(flatten(list(w.syms ORDER BY p.j)), ' ') AS tokens
FROM pos p JOIN w{rounds} w ON p.word = w.word
GROUP BY p.doc_id
"""
    head = _bpe_oracle(rounds)
    chain = head[: head.index("\nSELECT * FROM (")]
    return chain + pos


@register("x_bpe_encode", oracle=_bpe_encode_oracle(BPE_MERGE_ROUNDS))
def x_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding with merges learned from the corpus itself
    (functions.bpe.bpe_encode ∘ bpe_train): every document re-emitted as
    its BPE token sequence after BPE_MERGE_ROUNDS learned merges —
    train-then-apply as ONE oracled composition, the full tokenizer
    stage of an LLM pipeline (x_vocab_encode covers token-ID lookup
    against a given vocabulary; x_bpe_merges covers merge learning; this
    covers the segmentation the learned merges induce on the corpus).

    Scale shape: the merge list is a model artifact (n_merges rows);
    encoding runs on the DISTINCT-WORD table — each unique word encoded
    once (Heaps-bounded), one staged projection per merge (the
    composed-fold analyzer hazard documented in bpe_encode), token
    arrays joining back to the corpus' exploded word positions. Corpus
    cost: the training word count, one explode, one word-key join, one
    per-document ordered regroup."""
    from ..functions.bpe import bpe_encode, bpe_train, word_frequencies

    (docs,) = tables(spark, sf_dir, "documents")
    merges = bpe_train(word_frequencies(docs), BPE_MERGE_ROUNDS)
    enc = bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.array_join("tokens", " ").alias("tokens"),
    )
