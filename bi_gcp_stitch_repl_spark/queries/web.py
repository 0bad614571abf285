"""Web-corpus preprocessing queries: HTML extraction, URL canonicalization.

The row-local front of a web-crawl training pipeline (functions.web),
each as a catalog entry whose DuckDB oracle runs the IDENTICAL expression
pipeline — the synthetic ``documents`` table has no raw HTML or URL
column, so each query first CONSTRUCTS a deterministic instance per row
(escaped text wrapped in boilerplate markup; a messy URL with mixed case,
default port, tracking params, unstable param order and per-parity
trailing-slash/param-order variants) and then runs the real operator on
it. The construction is the fixture; the extraction/canonicalization
chain is the surface under test, and the roundtrip/dup-group columns pin
its semantics end to end.

Determinism: pure string/regexp builtins and integer arithmetic — no
floats, no nondeterministic functions; window dup-counts partition on the
canonical key itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS as _WS
from ..functions.web import (
    canonical_url_expr,
    html_escape_expr,
    html_text_expr,
    registrable_domain_expr,
)
from .catalog import register, tables

# --- shared fixture fragments (identical SQL text in both dialects) --------

#: boilerplate HTML wrapped around each document's escaped text: script and
#: style blocks whose bodies contain '<' '>' and a fake closing tag inside
#: a JS string, a comment, entity-encoded title/heading pieces — the traps
#: a naive single-regex tag strip gets wrong
_HTML_BUILD = (
    "concat('<html><head><title>T &amp; ', source, '</title>',"
    " '<script type=\"text/javascript\">if (1 < 2 && 3 > 0)"
    " {{ var s = \"</p>no\"; }}</script>',"
    " '<style media=\"all\">p {{ content: \"<div>\"; }}</style>',"
    " '</head><body><h1 class=\"h\">Doc &lt;', lang, '&gt; &#39;', source,"
    " '&#39;</h1><!-- boilerplate comment --><p>', {esc}, '</p>',"
    " '<div>footer &quot;fin&quot;&nbsp;end</div></body></html>')"
).format(esc=html_escape_expr("text"))

#: what the extractor must produce for the build above: title + heading +
#: body text (whitespace-collapsed) + footer, entities decoded one level
_HTML_EXPECTED = (
    "concat('T & ', source, ' Doc <', lang, '> ''', source, ''' ',"
    " trim({ws}), ' footer \"fin\" end')"
)

#: messy raw URL: uppercase scheme/host, www, explicit default port,
#: tracking params (utm_*, ref), fragment — and PER-PARITY variants
#: (trailing slash + swapped param order on even doc_ids) so one resource
#: has two raw spellings that must collapse to one canonical form
#: moduli sized so canonical dup GROUPS exist at the driver's sf0.01 scale
#: (500 docs): the canonical key is (doc_id%3 host, doc_id%8 path,
#: doc_id%10 id, doc_id%5 z) — lcm 120, so ~4 raw spellings per resource,
#: and group members span BOTH parity variants (trailing slash + param
#: order), so dup_count > 1 happens only because canonicalization unified
#: genuinely different raw strings
_URL_BUILD = (
    "concat('HTTPS://WWW.EXAMPLE', cast(doc_id % 3 as string), '.COM:443/p/',"
    " cast(doc_id % 8 as string),"
    " CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,"
    " '?utm_source=rss&utm_campaign=a',"
    " CASE WHEN doc_id % 2 = 0"
    "  THEN concat('&id=', cast(doc_id % 10 as string),"
    "              '&z=', cast(doc_id % 5 as string))"
    "  ELSE concat('&z=', cast(doc_id % 5 as string),"
    "              '&id=', cast(doc_id % 10 as string)) END,"
    " '&ref=', lang, '#s-', cast(doc_id as string))"
)


# WS_CLASS, not RE2 '\s' (which lacks \x0B) — matches html_text_expr's
# collapse so roundtrip_ok agrees between the dialects on any whitespace
_EXPECTED_DUCK = _HTML_EXPECTED.format(
    ws=f"regexp_replace(text, '{_WS}+', ' ', 'g')"
)

@register(
    "x_html_extract",
    oracle=f"""
WITH raw AS (
  SELECT doc_id, lang, source, text, {_HTML_BUILD} AS html FROM documents
),
cleaned AS (
  SELECT doc_id, lang, source, text,
         CAST(length(html) AS BIGINT) AS n_chars_html,
         {html_text_expr("html", "duck")} AS clean_text
  FROM raw
)
SELECT doc_id, n_chars_html, clean_text,
       clean_text = {_EXPECTED_DUCK} AS roundtrip_ok
FROM cleaned
""",
)
def x_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→text extraction (functions.web.html_text_expr): strip
    script/style bodies as blocks, comments, every tag (as a word
    boundary), decode the core entities one level, collapse whitespace.
    Each row builds a deterministic HTML document around its escaped text
    (the fixture carries the classic traps: '<' inside JS, a fake
    '</p>' inside a JS string literal, markup inside CSS content) and
    ``roundtrip_ok`` pins that extraction recovers exactly the expected
    visible text. Row-local regexp builtins end to end — zero UDFs, zero
    shuffles; at 100 TB this runs at parquet-scan speed inside one
    codegen stage."""
    (docs,) = tables(spark, sf_dir, "documents")
    # separate projections, NOT textual nesting: the extraction chain
    # references its input several times, and Catalyst re-evaluates
    # textual repetition but not a prior projection's column — html is
    # built once, extracted once, compared once
    raw = docs.select(
        "doc_id", "lang", "source", "text", F.expr(_HTML_BUILD).alias("html")
    )
    cleaned = raw.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.length("html").cast("long").alias("n_chars_html"),
        F.expr(html_text_expr("html", "spark")).alias("clean_text"),
    )
    ws_sql = _WS.replace("\\", "\\\\")  # SQL literal eats one level
    expected = _HTML_EXPECTED.format(
        ws=f"regexp_replace(text, '{ws_sql}+', ' ')"
    )
    return cleaned.select(
        "doc_id",
        "n_chars_html",
        "clean_text",
        (F.col("clean_text") == F.expr(expected)).alias("roundtrip_ok"),
    )


@register(
    "x_url_canonicalize",
    oracle=f"""
WITH raw AS (
  SELECT doc_id, {_URL_BUILD} AS url_raw FROM documents
),
canon AS (
  SELECT doc_id, url_raw, {canonical_url_expr("url_raw", "duck")} AS url_canonical
  FROM raw
)
SELECT doc_id, url_raw, url_canonical,
       CAST(COUNT(*) OVER (PARTITION BY url_canonical) AS BIGINT) AS dup_count,
       doc_id = MIN(doc_id) OVER (PARTITION BY url_canonical) AS is_kept
FROM canon
""",
)
def x_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + URL-level dedup (functions.web.
    canonical_url_expr): lowercase scheme/authority, strip default port /
    ``www.`` / fragment / tracking params, SORT surviving query params,
    tidy trailing slash — then dedup on the canonical form (keep-first by
    doc_id). The fixture builds two raw spellings per resource (trailing
    slash + param order flip by doc_id parity) so dup groups are real:
    ``dup_count`` > 1 rows exist only BECAUSE canonicalization unified
    distinct raw strings. Canonicalization is row-local string work (zero
    shuffle); the keep-first window partitions on the canonical key —
    the one hash exchange URL dedup fundamentally needs at any scale."""
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    raw = docs.select("doc_id", F.expr(_URL_BUILD).alias("url_raw"))
    canon = raw.select(
        "doc_id",
        "url_raw",
        F.expr(canonical_url_expr("url_raw", "spark")).alias("url_canonical"),
    )
    w = Window.partitionBy("url_canonical")
    return canon.select(
        "doc_id",
        "url_raw",
        "url_canonical",
        F.count("*").over(w).cast("long").alias("dup_count"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_kept"),
    )


#: per-domain document quota (the Dolma/C4-style domain cap: no single
#: registrable domain may contribute more than this many documents).
#: Sized against the fixture's 3-domain URL space so the cap BINDS at
#: driver scale (sf0.01: 500 docs / 3 domains ~ 167 each -> 17 dropped
#: per domain) — a cap nothing hits would test nothing.
DOMAIN_CAP = 150


@register(
    "x_domain_caps",
    oracle=f"""
WITH raw AS (
  SELECT doc_id, {_URL_BUILD} AS url_raw FROM documents
),
d AS (
  SELECT doc_id, {registrable_domain_expr("url_raw", "duck")} AS domain
  FROM raw
),
r AS (
  SELECT doc_id, domain,
         CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id)
              AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY domain) AS BIGINT) AS n_domain
  FROM d
)
SELECT doc_id, domain, rk, n_domain FROM r WHERE rk <= {DOMAIN_CAP}
""",
)
def x_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document quota (the web-mix balancing stage every crawl
    pipeline runs after URL dedup: no registrable domain may dominate the
    corpus): extract the registrable domain
    (functions.web.registrable_domain_expr — two-label heuristic, PSL
    seam documented there), keep the first ``DOMAIN_CAP`` docs per domain
    by the deterministic doc_id order, and carry the domain's total so
    downstream mixing can reason about what the cap removed.

    Scale shape: domain extraction is row-local string work; the quota is
    ``ops.skew.salted_topk`` — the EXACT two-level top-k (local top-k per
    64-way salt lane, final window over <= 64*cap survivors), because a
    bare per-domain row_number window funnels each domain's entire row
    set into ONE task and crawl domains are the canonical heavy-hitter
    key (a big domain is exactly the row set you're capping). The domain
    totals are one map-side-combinable groupBy broadcast back onto the
    bounded survivor set."""
    from ..ops.skew import salted_topk

    (docs,) = tables(spark, sf_dir, "documents")
    raw = docs.select("doc_id", F.expr(_URL_BUILD).alias("url_raw"))
    dom = raw.select(
        "doc_id",
        F.expr(registrable_domain_expr("url_raw", "spark")).alias("domain"),
    )
    totals = dom.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_domain")
    )
    kept = salted_topk(
        dom,
        partition_by=["domain"],
        order_by=[F.col("doc_id")],
        k=DOMAIN_CAP,
        salt_on="doc_id",
    )
    # NO broadcast hint: `totals` is one row per registrable domain — a
    # CORPUS-scaled side (10^7-10^8 rows on a real crawl), and a forced
    # hint bypasses the size check and aborts at the broadcast limit (the
    # abort-at-limit class r6 purged from the TPC queries). Both sides
    # here are same-order cardinality (survivors <= cap x domains); AQE
    # converts the join to broadcast at test scale on its own and keeps
    # the shuffle form when the domain space is actually large.
    return kept.join(totals, "domain").select(
        "doc_id", "domain", F.col("rk").cast("long").alias("rk"), "n_domain"
    )


#: PSL fixture for x_registrable_domain_psl: a rule set exercising every
#: rule kind (plain multi-label, wildcard, exception, comment/blank
#: filtering) and a host set exercising every resolution path — co.uk
#: grouping the two-label heuristic gets wrong, a wildcard suffix, the
#: list's own exception test vector (!www.ck -> www.ck registrable), a
#: cased www host, and an unknown TLD (implicit '*' rule fallback)
_PSL_RULES = ["// test rules", "", "com", "uk", "co.uk", "ck", "*.ck", "!www.ck"]
_PSL_HOST_CASE = (
    "CASE CAST(doc_id % 7 AS INT)"
    " WHEN 0 THEN 'shop.example0.co.uk'"
    " WHEN 1 THEN 'deep.a.example1.co.uk'"
    " WHEN 2 THEN 'other.co.uk'"
    " WHEN 3 THEN 'WWW.EXAMPLE2.COM'"
    " WHEN 4 THEN 'x.foo.ck'"
    " WHEN 5 THEN 'www.ck'"
    " ELSE 'svc.internal.xyz' END"
)
_PSL_URL_BUILD = (
    "CASE WHEN doc_id % 29 = 0 THEN NULL"
    f" ELSE concat('https://', {_PSL_HOST_CASE}, '/p/',"
    " cast(doc_id as string)) END"
)
_PSL_RULES_VALUES = ", ".join(f"('{r}')" for r in _PSL_RULES)


# --- domain-authority fixture (x_rank_domains) -----------------------------
#: page URL / HTML for the link-graph fixture: 4 ring-linked site domains
#: (every page links its successor domain), a shared authority sink
#: (every third page links HUB.ORG — uppercase + single-quoted href, the
#: two extract_links_expr paths), a relative href (must be skipped), a
#: self-link (must drop as a self-edge), and a NULL row every 29th doc
#: (fetch-failed page: drops from pages AND contributes no links).
#: hub.org has no pages of its own, so it is both the authority sink and
#: the dangling-mass node — every stage of rank_domains is load-bearing.
_LINK_URL_BUILD = (
    "CASE WHEN doc_id % 29 = 0 THEN NULL"
    " ELSE concat('https://www.example', cast(doc_id % 4 as string),"
    " '.com/p/', cast(doc_id as string)) END"
)
_LINK_HTML_BUILD = (
    "CASE WHEN doc_id % 29 = 0 THEN NULL"
    " ELSE concat('<html><body><a href=\"https://example',"
    " cast((doc_id + 1) % 4 as string), '.com/next\">n</a>',"
    " CASE WHEN doc_id % 3 = 0 THEN '<A HREF=''HTTP://HUB.ORG/h''>hub</A>'"
    " ELSE '' END,"
    " '<a href=\"/local\">rel</a><a href=\"https://www.example',"
    " cast(doc_id % 4 as string), '.com/self\">s</a></body></html>') END"
)


def _rank_domains_oracle() -> str:
    """Unrolled twin of jobs.pipelines.rank_domains on the fixture above:
    href extraction (the same two (?i) regexes as extract_links_expr,
    list-concatenated), registrable domains, self-edge-dropped weighted
    edge aggregation, nodes = page domains ∪ linked-to domains, then the
    SHARED fixed-point iteration chain (relational_ext.pagerank_iter_ctes
    — refactor verified byte-identical on x_pagerank_trade's evaluated
    oracle before this second consumer registered)."""
    from .relational_ext import PR_FRAC, PR_ITER, PR_SCALE, pagerank_iter_ctes

    rd_url = registrable_domain_expr("url", "duck")
    rd_href = registrable_domain_expr("href", "duck")
    head = f"""
WITH raw AS MATERIALIZED (
  SELECT doc_id, {_LINK_URL_BUILD} AS url, {_LINK_HTML_BUILD} AS html
  FROM documents
),
hrefs AS MATERIALIZED (
  SELECT url, unnest(list_concat(
    regexp_extract_all(html, '(?i)href="(https?://[^"]+)"', 1),
    regexp_extract_all(html, '(?i)href=''(https?://[^'']+)''', 1))) AS href
  FROM raw
),
links AS MATERIALIZED (
  SELECT {rd_url} AS src, {rd_href} AS dst FROM hrefs
),
edges AS MATERIALIZED (
  SELECT src, dst, COUNT(*) AS w FROM links
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT {rd_url} AS node FROM raw WHERE {rd_url} IS NOT NULL
    UNION ALL
    SELECT dst FROM edges
  )
),
params AS MATERIALIZED (
  SELECT COUNT(*) AS n,
         {PR_SCALE} // COUNT(*) AS init_fp,
         ({PR_SCALE} * 15) // (100 * COUNT(*)) AS base
  FROM nodes
),
tot AS (SELECT src, SUM(w) AS W FROM edges GROUP BY src),
frac AS MATERIALIZED (
  SELECT e.src, e.dst, (e.w * {PR_FRAC}) // t.W AS frac
  FROM edges e JOIN tot t USING (src)
),
dangling AS MATERIALIZED (
  SELECT node FROM nodes WHERE node NOT IN (SELECT DISTINCT src FROM frac)
),
r0 AS MATERIALIZED (
  SELECT node, p.init_fp AS rank_fp FROM nodes CROSS JOIN params p
)"""
    tail = f"""
SELECT r.node AS domain, CAST(r.rank_fp AS BIGINT) AS rank_fp FROM r{PR_ITER} r
"""
    return head + pagerank_iter_ctes(PR_ITER) + tail


@register("x_rank_domains", oracle=_rank_domains_oracle())
def x_rank_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain authority from the crawl's own link graph
    (jobs.pipelines.rank_domains): per-page href extraction
    (functions.web.extract_links_expr — row-local, both quote styles,
    case-insensitive), registrable-domain edges with self-edges dropped,
    one groupBy to the weighted domain graph, then string-keyed
    fixed-point PageRank (functions.graph.pagerank_fixedpoint,
    node_type="string"). The r8 verdict's ask: the numeric-keyed core is
    already hash-pinned by x_pagerank_trade; THIS pins the whole
    href→PSL-domain→weighted-graph→rank composition cross-engine,
    integer arithmetic end to end.

    Fixture: 4 site domains in a weighted link ring + an authority sink
    (hub.org) that every third page cites but that hosts no pages itself
    — so it exercises the dangling-mass path AND must out-rank the ring
    (authority ordering is asserted in tests/test_jobs.py; here the hash
    gate pins every bit).

    Scale shape: extraction is scan-speed row-local regexp; the ONE big
    exchange is the page-multigraph → domain-edge aggregation; the
    iteration loop runs on the tiny aggregated graph (driver fast path
    below 100k edges, property-tested bit-identical to the distributed
    loop)."""
    from ..jobs.pipelines import rank_domains
    from .relational_ext import PR_ITER

    (docs,) = tables(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.expr(_LINK_URL_BUILD).alias("url"),
        F.expr(_LINK_HTML_BUILD).alias("html"),
    )
    return rank_domains(pages, n_iter=PR_ITER)


#: the full PSL-resolution CTE chain (rules → norm → raw → host labels →
#: suffix candidates → exception/longest aggregation → per-doc suffix
#: length), shared verbatim by x_registrable_domain_psl and
#: x_domain_caps_psl (evaluated SQL of the first verified byte-identical
#: across the extraction — the pagerank_iter_ctes / _hybrid_fused
#: discipline: one chain, two consumers, no textual-sync debt)
_PSL_RESOLUTION_CTES = f"""
WITH rules(rule) AS (VALUES {_PSL_RULES_VALUES}),
norm AS (
  SELECT lower(CASE WHEN rule LIKE '!%' THEN substr(rule, 2) ELSE rule END)
           AS key,
         CAST(len(string_split(
                CASE WHEN rule LIKE '!%' THEN substr(rule, 2) ELSE rule END,
                '.'))
              - CASE WHEN rule LIKE '!%' THEN 1 ELSE 0 END AS INT) AS ps,
         rule LIKE '!%' AS exc
  FROM rules WHERE trim(rule) <> '' AND trim(rule) NOT LIKE '//%'
),
raw AS (SELECT doc_id, {_PSL_URL_BUILD} AS url_raw FROM documents),
hostt AS (
  SELECT doc_id, url_raw,
         lower(regexp_extract(url_raw, '^[a-zA-Z]+://([^/:?#]+)', 1)) AS h
  FROM raw
),
lab AS (
  SELECT doc_id, url_raw, h, string_split(h, '.') AS ls,
         len(string_split(h, '.')) AS n
  FROM hostt
),
cand AS (
  SELECT l.doc_id, l.n, t.k,
         array_to_string(l.ls[l.n - t.k + 1 : l.n], '.') AS suffix
  FROM lab l, (SELECT unnest(range(1, 6)) AS k) t
  WHERE l.h IS NOT NULL AND l.h <> '' AND t.k <= l.n
),
m AS (
  SELECT c.doc_id,
         max(CASE WHEN r.exc AND r.key = c.suffix THEN r.ps END) AS exc_ps,
         max(CASE WHEN NOT r.exc THEN r.ps END) AS best
  FROM cand c JOIN norm r
    ON r.key = c.suffix OR (r.key = '*.' || c.suffix AND c.n >= c.k + 1)
  GROUP BY c.doc_id
),
res AS (
  SELECT l.doc_id, l.url_raw, l.h, l.n, l.ls,
         COALESCE(m.exc_ps, m.best, 1) AS ps
  FROM lab l LEFT JOIN m USING (doc_id)
)"""


@register(
    "x_registrable_domain_psl",
    oracle=_PSL_RESOLUTION_CTES + """
SELECT doc_id, url_raw,
       CASE WHEN h IS NOT NULL AND h <> '' AND n > ps
            THEN array_to_string(ls[n - ps : n], '.') END AS domain
FROM res
""",
)
def x_registrable_domain_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-Suffix-List registrable domain
    (functions.web.registrable_domain_psl): the exact publicsuffix.org
    algorithm — exception beats longest match beats the implicit ``*``
    rule — over a rules DataFrame, exercising the paths the two-label
    heuristic gets wrong (``*.co.uk`` sites keep their own quota groups,
    wildcard ``*.ck`` suffixes, the ``!www.ck`` exception vector). The
    DuckDB oracle implements the SAME algorithm relationally
    (unnest-candidates → rule join → exception/longest aggregation), so
    the two engines verify each other through entirely different shapes.

    Scale shape: the rule list (~10k rows published) collapses to ONE
    broadcast map row; per-doc resolution is a pure array fold over ≤5
    suffix probes — zero shuffles, zero UDFs, scan speed. Consumers
    (`prepare_web_corpus(domain_psl=...)`, ``web_corpus_stream``) swap it
    in for the heuristic without touching the quota machinery."""
    from ..functions.web import registrable_domain_psl

    (docs,) = tables(spark, sf_dir, "documents")
    raw = docs.select("doc_id", F.expr(_PSL_URL_BUILD).alias("url_raw"))
    rules = spark.createDataFrame([(r,) for r in _PSL_RULES], "rule string")
    return registrable_domain_psl(raw, "url_raw", rules, out_col="domain")


#: quota for the PSL-backed caps composition: the PSL fixture spreads 500
#: docs over 7 registrable domains (~71 each), so 60 BINDS on every domain
#: at the driver's sf0.01 — a cap nothing hits would test nothing
PSL_DOMAIN_CAP = 60


@register(
    "x_domain_caps_psl",
    oracle=_PSL_RESOLUTION_CTES + f""",
dres AS (
  SELECT doc_id,
         CASE WHEN h IS NOT NULL AND h <> '' AND n > ps
              THEN array_to_string(ls[n - ps : n], '.') END AS domain
  FROM res
),
d AS (SELECT doc_id, domain FROM dres WHERE domain IS NOT NULL),
r AS (
  SELECT doc_id, domain,
         CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id)
              AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY domain) AS BIGINT) AS n_domain
  FROM d
)
SELECT doc_id, domain, rk, n_domain FROM r WHERE rk <= {PSL_DOMAIN_CAP}
""",
)
def x_domain_caps_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION domain-quota path end to end (r9 verdict #7):
    x_domain_caps pins the quota machinery over the two-label heuristic;
    THIS composes the full pipeline — PSL registrable-domain resolution
    (functions.web.registrable_domain_psl, exception/wildcard/longest-
    match rules) feeding the exact salted two-level top-k — so the pair
    actually deployed against a crawl (`prepare_web_corpus(domain_psl=,
    quota=)`) is hash-pinned as ONE composition, not just as pieces.
    Docs with no resolvable domain (NULL URL rows) are excluded from the
    quota — robots/quota stages can only speak for a domain they can
    name; the NULL-row passthrough posture is pinned by the pipeline
    tests.

    Scale shape: PSL resolution is one broadcast rules-map row + a ≤5-
    probe row-local array fold (zero shuffles); the quota is
    ops.skew.salted_topk (local top-k per 64-way salt lane, final window
    over ≤ 64·cap survivors — a bare per-domain window funnels each
    crawl domain's full row set into one task); the domain totals groupBy
    is map-side-combinable and AQE picks the join strategy (no forced
    broadcast: domains are a corpus-scaled key space)."""
    from ..functions.web import registrable_domain_psl
    from ..ops.skew import salted_topk

    (docs,) = tables(spark, sf_dir, "documents")
    raw = docs.select("doc_id", F.expr(_PSL_URL_BUILD).alias("url_raw"))
    rules = spark.createDataFrame([(r,) for r in _PSL_RULES], "rule string")
    dom = (
        registrable_domain_psl(raw, "url_raw", rules, out_col="domain")
        .filter(F.col("domain").isNotNull())
        .select("doc_id", "domain")
    )
    totals = dom.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_domain")
    )
    kept = salted_topk(
        dom,
        partition_by=["domain"],
        order_by=[F.col("doc_id")],
        k=PSL_DOMAIN_CAP,
        salt_on="doc_id",
    )
    return kept.join(totals, "domain").select(
        "doc_id", "domain", F.col("rk").cast("long").alias("rk"), "n_domain"
    )


# --- robots-exclusion fixture (x_robots_exclusion) --------------------------
#: one robots.txt per site, spanning the parser's grammar corners AND the
#: RFC 9309 §2.2.2/§2.2.3 precedence rules (r10 verdict #2) — site0
#: serves CRLF line endings + a tab-padded Disallow (the r9 ADVICE class:
#: both dialects previously agreed on the WRONG answer for CRLF, so only
#: a driver row over a CRLF fixture keeps that regression caught
#: cross-engine); site1 = grouped agents (googlebot + *) with an empty
#: Disallow and a comment; site2 = a non-* group only (its rules must NOT
#: apply); site3 = Disallow: / (blocks even the bare root); site4 =
#: longest-match Allow override (/p/1 allowed inside disallowed /p/) plus
#: an equal-length Allow/Disallow tie on /p/0 that MUST resolve to Allow;
#: site5 = ``*`` + trailing-``$`` metacharacters (paths ending in 4
#: blocked; ``/$`` blocks ONLY the bare root); site6 = a trailing-``$``
#: rule that matches NO real path (/p/1$ — paths continue past /p/1) and
#: a wildcard Disallow subtree pierced by a longer wildcard Allow; site7
#: serves NO robots row at all (kept — no rules is no restriction).
_ROBOTS_SITES: list[tuple[str, str]] = [
    ("site0.example",
     "User-agent: *\r\nDisallow: /p/0\r\nDisallow:\t/t0\r\n"),
    ("site1.example",
     "# policy\nUser-agent: googlebot\nUser-agent: *\n"
     "Disallow: /p/1\nDisallow:\nDisallow: /q/\n"),
    ("site2.example", "User-agent: googlebot\nDisallow: /p/2\n"),
    ("site3.example", "User-agent: *\nDisallow: /\n"),
    ("site4.example",
     "User-agent: *\nDisallow: /p/\nAllow: /p/1\n"
     "Disallow: /p/0\nAllow: /p/0\n"),
    ("site5.example",
     "User-agent: *\nDisallow: /*/x*4$\nDisallow: /$\n"),
    ("site6.example",
     "User-agent: *\nDisallow: /p/1$\nDisallow: /p/2*\nAllow: /p/2/x1*\n"),
]

#: page URLs over the 8-site space: doc_id%8 picks the site (site7 has no
#: robots row), doc_id%7=0 is a bare-root URL (path '' must normalize to
#: '/'), doc_id%11=0 is an UPPERCASE spelling (host must case-fold before
#: the rules join), doc_id%29=0 is a NULL fetch-failed row (kept — robots
#: can only speak for a host it names).
_ROBOTS_PATH_BUILD = (
    "CASE WHEN doc_id % 7 = 0 THEN ''"
    " ELSE concat('/p/', cast(doc_id % 3 as string),"
    "             '/x', cast(doc_id as string)) END"
)
_ROBOTS_URL_BUILD = (
    "CASE WHEN doc_id % 29 = 0 THEN NULL"
    " WHEN doc_id % 11 = 0 THEN"
    f" concat('HTTPS://SITE', cast(doc_id % 8 as string), '.EXAMPLE',"
    f"        {_ROBOTS_PATH_BUILD})"
    f" ELSE concat('https://site', cast(doc_id % 8 as string), '.example',"
    f"      {_ROBOTS_PATH_BUILD}) END"
)


def _robots_exclusion_oracle() -> str:
    """Twin of functions.web.apply_robots over the fixture: the shared
    relational rules parse (robots_rules_duck_sql — CRLF/CR normalized,
    space+tab trims, Allow AND Disallow), then the same host extraction /
    path normalization, and RFC 9309 longest-match precedence replayed in
    a DIFFERENT formulation than the Spark side: Spark folds a
    (best-len, best-allow) accumulator over the rule array; the oracle
    unnests the matching rules relationally and picks the winner with
    ``row_number() ORDER BY length DESC, allow DESC`` (ties beyond
    allow/disallow carry the same verdict, so the pick is deterministic).
    Two shapes, one precedence — the x_registrable_domain_psl pattern."""
    from ..functions.web import robots_match_duck_sql, robots_rules_duck_sql

    values = ", ".join(
        "('{}', '{}')".format(h, t.replace("'", "''"))
        for h, t in _ROBOTS_SITES
    )
    match = robots_match_duck_sql("p.path", "u.path")
    return f"""
WITH robots(host, robots_txt) AS (VALUES {values}),
rules AS (SELECT host, rules FROM {robots_rules_duck_sql("robots")} rr),
pages AS (SELECT doc_id, {_ROBOTS_URL_BUILD} AS url FROM documents),
probe AS (
  SELECT doc_id, url,
         NULLIF(lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1)),
                '') AS h,
         COALESCE(NULLIF(regexp_extract(url,
                                        '^[a-zA-Z]+://[^/]*(/.*)$', 1),
                         ''), '/') AS path
  FROM pages
),
cand AS (
  SELECT p.doc_id, u.allow,
         row_number() OVER (PARTITION BY p.doc_id
                            ORDER BY length(u.path) DESC, u.allow DESC)
           AS rn
  FROM probe p
  JOIN (SELECT host, unnest(rules) AS u FROM rules) r ON p.h = r.host
  WHERE {match}
),
blocked AS (SELECT doc_id FROM cand WHERE rn = 1 AND NOT allow)
SELECT p.doc_id, p.url
FROM probe p LEFT JOIN blocked b ON p.doc_id = b.doc_id
WHERE b.doc_id IS NULL
"""


@register("x_robots_exclusion", oracle=_robots_exclusion_oracle())
def x_robots_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt exclusion as an oracled catalog row (r9 verdict #2;
    RFC 9309 precedence completed per r10 verdict #2):
    functions.web.parse_robots_rules (zero-UDF sequential fold, RFC 9309
    wildcard-agent subset, CRLF/CR/tab handling, Allow AND Disallow) +
    apply_robots (ONE host equi-join, row-local longest-match precedence
    fold with ``*``/trailing-``$`` metacharacters) over a fixture whose
    sites exercise grouped agents, non-applicable groups, empty
    Disallow, full-site Disallow, Allow-overrides-Disallow longest
    match, equal-length tie→Allow, wildcard and end-anchor rules,
    bare-root path normalization, host case-folding, rule-less hosts,
    NULL URLs — and one site served with CRLF line endings, the r9
    ADVICE regression, pinned cross-engine every round it holds a
    window slot.

    Scale shape: parsing is a row-local fold over the robots table (one
    row per host — corpus-scaled, so NO broadcast hint: AQE decides the
    rules join); the precedence probe is a row-local array aggregate
    with literal rules on a startswith fast path — the host equi-join
    is the only exchange the gate adds to a crawl."""
    from ..functions.web import apply_robots

    (docs,) = tables(spark, sf_dir, "documents")
    pages = docs.select("doc_id", F.expr(_ROBOTS_URL_BUILD).alias("url"))
    robots = spark.createDataFrame(
        _ROBOTS_SITES, "host string, robots_txt string"
    )
    return apply_robots(pages, robots)
