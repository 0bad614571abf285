"""functions.bloom + functions.web unit coverage: the Bloom filter's
set-theory invariants (incl. a forced-false-positive regime the catalog's
production-sized filter never enters), and the HTML/URL expression
builders' semantics with dual-dialect agreement."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bi_gcp_stitch_repl_spark.functions.bloom import (
    BLOOM_K,
    BLOOM_M,
    bloom_bit_set,
    bloom_decontaminate,
    bloom_positions,
)
from bi_gcp_stitch_repl_spark.functions.web import (
    canonical_url_expr,
    html_escape_expr,
    html_text_expr,
)

# --------------------------------------------------------------------------
# bloom
# --------------------------------------------------------------------------


def test_bloom_positions_distinct_in_range(spark):
    """m prime + double hashing ⇒ every gram probes exactly k pairwise
    distinct positions in [0, m)."""
    df = spark.createDataFrame(
        [(f"gram number {i} with words",) for i in range(200)], "gram string"
    )
    rows = df.select(bloom_positions("gram").alias("p")).collect()
    for (p,) in rows:
        assert len(p) == BLOOM_K
        assert len(set(p)) == BLOOM_K
        assert all(0 <= x < BLOOM_M for x in p)


def test_bloom_positions_deterministic(spark):
    a = spark.createDataFrame([("the same gram",)], "gram string")
    one = a.select(bloom_positions("gram")).collect()[0][0]
    two = a.select(bloom_positions("gram")).collect()[0][0]
    assert one == two


def test_bloom_bit_set_bounded(spark):
    """The filter is ≤ m rows no matter the bench size — with a tiny m
    every position lands in [0, m) and the distinct set saturates."""
    bench = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(60)],
        "doc_id long, text string",
    )
    bits = bloom_bit_set(bench, n=8, m=17, k=3)
    vals = [r.p for r in bits.collect()]
    assert len(vals) == len(set(vals)) <= 17
    assert all(0 <= v < 17 for v in vals)


def _docs(spark):
    # doc 1 shares its 8-gram run with bench doc 100; docs 2/3 are clean
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    return (
        spark.createDataFrame(
            [
                (1, "x " + bench_text + " y"),
                (2, "one two three four five six seven eight nine"),
                (3, "cold warm hot cool mild damp dry wet windy"),
            ],
            "doc_id long, text string",
        ),
        spark.createDataFrame([(100, bench_text)], "doc_id long, text string"),
    )


def test_bloom_decontaminate_exact_hits_always_flagged(spark):
    """No false negatives: every exact-hit gram's positions are in the
    filter by construction, at ANY m/k."""
    train, bench = _docs(spark)
    for m, k in [(BLOOM_M, BLOOM_K), (31, 2), (7, 2)]:
        out = {r.doc_id: r for r in bloom_decontaminate(train, bench, m=m, k=k).collect()}
        assert out[1].exact_flagged and out[1].bloom_flagged
        assert out[1].n_bloom_grams >= out[1].n_exact_grams >= 1
        # superset invariant row-by-row
        assert all(r.n_bloom_grams >= r.n_exact_grams for r in out.values())


def test_bloom_decontaminate_tiny_m_forces_false_positives(spark):
    """In a deliberately saturated regime every clean doc bloom-flags
    while staying exact-clean — the false-positive mechanism is real and
    measured, not theoretical. Saturation is asserted first (the fixed
    hash arithmetic fills all m=17 bits on this fixture), so the test is
    deterministic, not probabilistic."""
    train, _ = _docs(spark)
    bench = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(60)],
        "doc_id long, text string",
    )
    assert bloom_bit_set(bench, n=8, m=17, k=2).count() == 17  # saturated
    out = {
        r.doc_id: r
        for r in bloom_decontaminate(train, bench, m=17, k=2).collect()
    }
    # no train doc shares an 8-gram with the w-vocab bench…
    assert not any(r.exact_flagged for r in out.values())
    # …yet every gram probes only set bits: all docs are false positives
    assert all(r.bloom_flagged for r in out.values())
    # production-sized filter (m=BLOOM_M): the same docs pass clean
    big = {r.doc_id: r for r in bloom_decontaminate(train, bench).collect()}
    assert not any(r.bloom_flagged for r in big.values())


def test_bloom_decontaminate_no_audit_branch(spark):
    train, bench = _docs(spark)
    out = {
        r.doc_id: r
        for r in bloom_decontaminate(train, bench, audit_exact=False).collect()
    }
    assert out[1].bloom_flagged and out[1].n_exact_grams == 0
    assert not out[1].exact_flagged  # audit off: exact columns are inert zeros


# --------------------------------------------------------------------------
# web expressions — semantics + dual-dialect agreement
# --------------------------------------------------------------------------

_HTML_CASES = [
    # (html, expected visible text)
    ("<p>plain</p>", "plain"),
    ("<p>a</p><p>b</p>", "a b"),  # tags become word boundaries
    ('<script a="1">if (1 < 2) { var s = "</p>x"; }</script>ok', "ok"),
    ("<style>p { content: '<div>'; }</style>ok", "ok"),
    # tag names are case-insensitive: uppercase blocks must strip as
    # blocks, not leak their bodies as text
    ("<SCRIPT>var x = 1;</SCRIPT>ok", "ok"),
    ("<Style media='x'>p { color: red; }</STYLE>ok", "ok"),
    ("a<!-- hidden\nmulti-line -->b", "a b"),
    ("&lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39;&nbsp;end",
     "<tag> &amp; \"q\" 's' end"),  # one decode level only
    ("  a \t\n  b  ", "a b"),
]


@pytest.mark.parametrize("html,expected", _HTML_CASES)
def test_html_text_expr_semantics(spark, html, expected):
    df = spark.createDataFrame([(html,)], "h string")
    got = df.select(F.expr(html_text_expr("h", "spark")).alias("t")).collect()[0].t
    assert got == expected


_URL_CASES = [
    ("HTTPS://WWW.EX.COM:443/A/B?b=2&a=1#frag", "https://ex.com/A/B?a=1&b=2"),
    ("http://ex.com:80/", "http://ex.com"),
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),  # non-default port kept
    ("https://ex.com/a/?utm_source=x&utm_medium=y&ref=z&fbclid=1&gclid=2",
     "https://ex.com/a"),  # all-tracking query vanishes entirely
    ("https://ex.com/a?", "https://ex.com/a"),
    ("https://Sub.WWW.ex.com/P", "https://sub.www.ex.com/P"),  # www only at host START
    ("https://ex.com/CaseKept?Q=V", "https://ex.com/CaseKept?Q=V"),
    # VALUELESS tracking params (truncated/shared links) strip too…
    ("https://ex.com/a?utm_source&b=1&fbclid", "https://ex.com/a?b=1"),
    # …but params that merely START with a tracking name survive
    ("https://ex.com/a?refresh=1&gclid_x=2", "https://ex.com/a?gclid_x=2&refresh=1"),
    # path-less URL with a query: authority lowercasing must stop at '?'
    # (the idempotence property test's falsifying example)
    ("http://EX.com?Q=V", "http://ex.com?Q=V"),
]


@pytest.mark.parametrize("raw,canon", _URL_CASES)
def test_canonical_url_expr_semantics(spark, raw, canon):
    df = spark.createDataFrame([(raw,)], "u string")
    got = df.select(F.expr(canonical_url_expr("u", "spark")).alias("c")).collect()[0].c
    assert got == canon


def test_web_exprs_dialects_agree(spark):
    """The duck dialect of every builder produces byte-identical results —
    the property the catalog oracle rests on."""
    con = duckdb.connect()
    for html, _ in _HTML_CASES:
        con.execute("CREATE OR REPLACE TABLE wt AS SELECT ? AS h", [html])
        d = con.sql(f"SELECT {html_text_expr('h', 'duck')} FROM wt").fetchone()[0]
        s = (
            spark.createDataFrame([(html,)], "h string")
            .select(F.expr(html_text_expr("h", "spark")))
            .collect()[0][0]
        )
        assert d == s, html
    for raw, _ in _URL_CASES:
        con.execute("CREATE OR REPLACE TABLE wt AS SELECT ? AS u", [raw])
        d = con.sql(
            f"SELECT {canonical_url_expr('u', 'duck')} FROM wt"
        ).fetchone()[0]
        s = (
            spark.createDataFrame([(raw,)], "u string")
            .select(F.expr(canonical_url_expr("u", "spark")))
            .collect()[0][0]
        )
        assert d == s, raw


def test_rr_replacement_backslash_pair_dialect_parity(spark):
    """_java_repl consumes the RE2 escaped-backslash pair '\\\\' as ONE
    literal backslash — treating each char independently emitted TWO
    backslashes on the Spark side while DuckDB's raw pass-through emits
    one (latent divergence; no production call site passes backslashes,
    this pins the contract for the first one that does). Also re-pins
    group refs and literal '$' in the same replacement."""
    from bi_gcp_stitch_repl_spark.functions.web import _rr

    cases = [
        ("abc", "b", "\\\\"),        # RE2 escaped backslash -> one '\'
        ("abc", "(b)", "[\\1]"),     # group ref
        ("abc", "b", "$"),           # literal dollar
        ("abc", "(b)", "\\\\\\1$"),  # backslash + group + dollar together
    ]
    con = duckdb.connect()
    for text, pat, repl in cases:
        con.execute("CREATE OR REPLACE TABLE wt AS SELECT ? AS t", [text])
        d = con.sql(f"SELECT {_rr('t', pat, repl, 'duck')} FROM wt").fetchone()[0]
        s = (
            spark.createDataFrame([(text,)], "t string")
            .select(F.expr(_rr("t", pat, repl, "spark")))
            .collect()[0][0]
        )
        assert d == s, (text, pat, repl, d, s)
    # and the pair really is ONE output backslash, not two
    assert (
        con.sql(f"SELECT {_rr('t', 'b', chr(92) * 2, 'duck')} FROM wt")
        .fetchone()[0]
        == "a\\c"
    )


def test_registrable_domain_psl_algorithm(spark):
    """functions.web.registrable_domain_psl implements the
    publicsuffix.org algorithm: exception beats longest match beats the
    implicit '*' rule; wildcard suffixes need the extra label; a host
    that IS a public suffix has no registrable domain; comments/blank
    rule lines are ignored; NULL/unparseable hosts yield NULL. The www
    label is NOT pre-stripped (www.ck is the list's own exception test
    vector; www.com is a registered domain) — ps=1 rules fold it away
    where it is genuinely a subdomain."""
    from bi_gcp_stitch_repl_spark.functions.web import registrable_domain_psl

    rules = spark.createDataFrame(
        [(r,) for r in
         ["// test rules", "", "com", "uk", "co.uk", "ck", "*.ck", "!www.ck"]],
        "rule string",
    )
    cases = [
        ("https://shop.example.co.uk/x", "example.co.uk"),
        ("HTTPS://WWW.DEEP.A.EXAMPLE.CO.UK/y", "example.co.uk"),
        ("https://other.co.uk", "other.co.uk"),
        ("https://plain.example.com/z", "example.com"),
        ("https://www.example.com/w", "example.com"),  # ps=1 'com' rule
        ("https://x.foo.ck/a", "x.foo.ck"),   # wildcard: foo.ck is the suffix
        ("https://www.ck/b", "www.ck"),       # exception: ck is the suffix
        ("https://co.uk/", None),             # host IS a public suffix
        (None, None),
        ("notaurl", None),
        ("https://unknown.tld.xyz/q", "tld.xyz"),  # implicit '*' fallback
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "id long, url string"
    )
    got = {
        r["id"]: r["domain"]
        for r in registrable_domain_psl(df, "url", rules).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, want, got[i])


def test_registrable_domain_psl_duplicate_rules_survive(spark):
    """map_from_entries aborts on duplicate keys under Spark's default
    mapKeyDedupPolicy=EXCEPTION — a repeated rule line (hand-concatenated
    lists) or a plain rule shadowed by its exception ('www.ck' and
    '!www.ck' normalize to the same key) must dedup at map-build time
    with the PSL priority (exception prevails), not kill the job."""
    from bi_gcp_stitch_repl_spark.functions.web import registrable_domain_psl

    rules = spark.createDataFrame(
        [(r,) for r in ["com", "com", "ck", "*.ck", "www.ck", "!www.ck"]],
        "rule string",
    )
    df = spark.createDataFrame(
        [(1, "https://www.ck/b"), (2, "https://a.example.com/")],
        "id long, url string",
    )
    got = {
        r["id"]: r["domain"]
        for r in registrable_domain_psl(df, "url", rules).collect()
    }
    # exception prevails over the colliding plain 'www.ck' rule: the
    # public suffix is 'ck', so the registrable domain is www.ck itself
    assert got == {1: "www.ck", 2: "example.com"}


def test_ws_class_dialect_parity_on_vertical_tab(spark):
    """WS_CLASS exists because RE2's \\s lacks \\x0B while Java's has it:
    on a vertical-tab document the explicit class keeps both engines
    token- and strip-identical where a duck-side '\\s' would diverge."""
    from bi_gcp_stitch_repl_spark.functions.text import WS_CLASS

    txt = "a\x0bb c"
    con = duckdb.connect()
    con.execute("CREATE TABLE wt AS SELECT ? AS text", [txt])
    d_tokens, d_strip = con.sql(
        f"SELECT len(list_filter(string_split_regex(trim(text), '{WS_CLASS}+'),"
        f" t -> t <> '')), length(regexp_replace(text, '{WS_CLASS}', '', 'g'))"
        " FROM wt"
    ).fetchone()
    # duck's own \s: the divergence this guards against
    d_s = con.sql("SELECT length(regexp_replace(text, '\\s', '', 'g')) FROM wt").fetchone()[0]
    df = spark.createDataFrame([(txt,)], "text string")
    s_tokens = df.selectExpr(
        "size(filter(split(trim(text), '\\\\s+'), t -> t <> ''))"
    ).collect()[0][0]
    s_strip = df.selectExpr(
        "length(regexp_replace(text, '\\\\s', ''))"
    ).collect()[0][0]
    assert (d_tokens, d_strip) == (s_tokens, s_strip) == (3, 3)
    assert d_s == 4  # RE2 \s left the \x0B in — the bug WS_CLASS closes


def test_html_escape_roundtrips_through_extract(spark):
    """escape → wrap in markup → extract recovers the original text
    (whitespace-collapsed), even when the text contains markup chars."""
    nasty = 'a < b & c > d "quoted" <script>not code</script>'
    df = spark.createDataFrame([(nasty,)], "text string")
    wrapped = f"concat('<body><p>', {html_escape_expr('text')}, '</p></body>')"
    got = df.select(
        F.expr(html_text_expr(wrapped, "spark")).alias("t")
    ).collect()[0].t
    assert got == nasty


# --------------------------------------------------------------------------
# property tests (hypothesis)
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# whitespace restricted to Java's \s set (which extraction collapses);
# includes the entity/markup metacharacters the escape must neutralize
_TEXT_ALPHABET = " \t\n\r\x0b\x0cabcXYZ012.,;:!?&<>\"'#/=-"
_texts = st.lists(
    st.text(alphabet=_TEXT_ALPHABET, max_size=60), min_size=1, max_size=8
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_html_escape_wrap_extract_roundtrip_property(spark, texts):
    """For ARBITRARY text over markup-hostile characters (raw & < > ' "
    entity-lookalikes, every Java-\\s whitespace): escape → wrap in
    markup → extract returns exactly the whitespace-collapsed text."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    wrapped = f"concat('<body><p>', {html_escape_expr('text')}, '</p></body>')"
    got = {
        r.i: r.t
        for r in df.select("i", F.expr(html_text_expr(wrapped, "spark")).alias("t")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == " ".join(t.split()), repr(t)


_url_parts = st.fixed_dictionaries(
    {
        "scheme": st.sampled_from(["http", "https"]),
        "www": st.booleans(),
        "host": st.sampled_from(["ex.com", "Ex.COM", "a-b.ex.com", "ex2.com"]),
        "port": st.sampled_from(["", ":443", ":80", ":8080"]),
        "path": st.lists(st.sampled_from(["a", "B", "c9"]), max_size=3),
        "slash": st.booleans(),
        "params": st.lists(
            st.sampled_from(
                ["id=1", "z=9", "utm_source=x", "ref", "fbclid=2", "Q=V", "utm_x", "b=2"]
            ),
            max_size=4,
        ),
        "frag": st.booleans(),
    }
)


def _mk_url(p) -> str:
    u = f"{p['scheme']}://{'www.' if p['www'] else ''}{p['host']}{p['port']}"
    u += "/" + "/".join(p["path"])
    if p["slash"] and p["path"]:
        u += "/"
    if p["params"]:
        u += "?" + "&".join(p["params"])
    if p["frag"]:
        u += "#frag"
    return u


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(parts=st.lists(_url_parts, min_size=1, max_size=8))
def test_canonical_url_idempotent_and_dialect_equal_property(spark, parts):
    """Canonicalization is IDEMPOTENT (canonical(canonical(u)) ==
    canonical(u) — the property that makes re-runs and already-clean
    inputs safe) and the duck dialect agrees byte-for-byte on arbitrary
    scheme/www/port/path/param/fragment combinations."""
    urls = [_mk_url(p) for p in parts]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, u string")
    once = df.select("i", "u", F.expr(canonical_url_expr("u", "spark")).alias("c1"))
    twice = once.select(
        "i", "u", "c1", F.expr(canonical_url_expr("c1", "spark")).alias("c2")
    ).collect()
    con = duckdb.connect()
    for r in twice:
        assert r.c2 == r.c1, f"not idempotent: {r.u!r} -> {r.c1!r} -> {r.c2!r}"
        con.execute("CREATE OR REPLACE TABLE wt AS SELECT ? AS u", [r.u])
        d = con.sql(f"SELECT {canonical_url_expr('u', 'duck')} FROM wt").fetchone()[0]
        assert d == r.c1, f"dialects disagree on {r.u!r}: {d!r} vs {r.c1!r}"


_words = st.lists(st.sampled_from([f"w{i}" for i in range(12)]), min_size=0, max_size=14)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    train_docs=st.lists(_words, min_size=1, max_size=5),
    bench_docs=st.lists(_words, min_size=1, max_size=3),
    m=st.sampled_from([7, 31, 131_071]),
)
def test_bloom_superset_and_no_false_negative_property(
    spark, train_docs, bench_docs, m
):
    """For ARBITRARY word documents and any filter size: bloom counts
    superset exact counts row-by-row, and exact-hit docs always
    bloom-flag (no false negatives) — the pair of invariants the whole
    prefilter composition rests on."""
    train = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(train_docs)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100 + i, " ".join(ws)) for i, ws in enumerate(bench_docs)],
        "doc_id long, text string",
    )
    out = bloom_decontaminate(train, bench, n=3, m=m, k=2).collect()
    assert len(out) == len(train_docs)
    for r in out:
        assert r.n_bloom_grams >= r.n_exact_grams
        assert (not r.exact_flagged) or r.bloom_flagged


_DOMAIN_CASES = [
    ("https://a.b.example.com/x?q=1", "example.com"),  # subdomain chain
    ("HTTPS://WWW.EXAMPLE.COM:443/p", "example.com"),  # upper + www + port
    ("http://example.com", "example.com"),  # no path
    ("http://www.example.co/x", "example.co"),  # two labels after www
    ("https://localhost/x", "localhost"),  # single-label host
    ("https://deep.sub.tracker.example.org/a/b", "example.org"),
    ("ftp://www.files.example.net", "example.net"),  # non-http scheme
    # NULL / unparseable → NULL in BOTH dialects (pre-r9 the ELSE-branch
    # concat semantics diverged: spark '' vs duck '.'; x_rank_domains'
    # NULL-row fixture found it as a ghost graph node)
    (None, None),
    ("not a url", None),
    ("", None),
]


def test_registrable_domain_expr_semantics_and_dialect_parity(spark):
    """Two-label registrable-domain heuristic: subdomains collapse,
    www/port/scheme-case strip, single-label hosts pass through — and the
    duck twin is byte-identical (the x_domain_caps oracle's foundation)."""
    from bi_gcp_stitch_repl_spark.functions.web import registrable_domain_expr

    con = duckdb.connect()
    for raw, want in _DOMAIN_CASES:
        s = (
            spark.createDataFrame([(raw,)], "u string")
            .select(F.expr(registrable_domain_expr("u", "spark")))
            .collect()[0][0]
        )
        assert s == want, (raw, s)
        con.execute("CREATE OR REPLACE TABLE wt AS SELECT CAST(? AS VARCHAR) AS u", [raw])
        d = con.sql(
            f"SELECT {registrable_domain_expr('u', 'duck')} FROM wt"
        ).fetchone()[0]
        assert d == s, (raw, d, s)


def test_extract_links_parses_under_double_quoted_identifiers(spark):
    """The single-quote href pattern is a SINGLE-quoted SQL literal with
    doubled-quote escapes: a double-quoted spelling parses as an
    IDENTIFIER (analysis error) in sessions with
    spark.sql.ansi.doubleQuotedIdentifiers enabled."""
    from bi_gcp_stitch_repl_spark.functions.web import extract_links_expr

    df = spark.createDataFrame(
        [
            (
                "<a href=\"https://a.com/x\">d</a> "
                "<A HREF='HTTP://B.com/y'>s</A> <a href='/rel'>r</a>",
            )
        ],
        "html string",
    )
    expected = ["https://a.com/x", "HTTP://B.com/y"]
    assert df.select(
        F.expr(extract_links_expr("html")).alias("l")
    ).collect()[0]["l"] == expected
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    try:
        assert df.select(
            F.expr(extract_links_expr("html")).alias("l")
        ).collect()[0]["l"] == expected
    finally:
        spark.conf.unset("spark.sql.ansi.doubleQuotedIdentifiers")


_ROBOTS_FIXTURE = """\
# corpus crawler policy
User-agent: googlebot
Disallow: /only-google

User-agent: SpecialBot
USER-AGENT: *
disallow: /private/   # grouped UA lines: * is in this group
Disallow: /tmp
Disallow:
Sitemap: https://a.example/map.xml

User-agent: otherbot
Disallow: /not-for-us
"""


def test_parse_robots_rules_star_groups_only(spark):
    """RFC 9309 grouping, wildcard-agent subset: grouped UA headers make
    one group (any '*' applies), non-* groups are ignored, comments and
    case fold away, empty rule values contribute nothing, and Allow
    lines are captured in document order with allow=true."""
    from bi_gcp_stitch_repl_spark.functions.web import parse_robots_rules

    robots = spark.createDataFrame(
        [
            ("A.example", _ROBOTS_FIXTURE),
            ("b.example", "User-agent: *\n"),
            ("c.example",
             "User-agent: *\nDisallow: /p/\nAllow: /p/ok\nallow:\n"),
        ],
        "host string, robots_txt string",
    )
    out = {
        r.host: [(x.path, x.allow) for x in r.rules]
        for r in parse_robots_rules(robots).collect()
    }
    assert out == {
        "a.example": [("/private/", False), ("/tmp", False)],
        "b.example": [],
        "c.example": [("/p/", False), ("/p/ok", True)],
    }


def test_apply_robots_blocks_prefixes_keeps_unruled_hosts(spark):
    """Literal prefix match on the raw path (+query); bare-root URLs
    normalize to '/'; hosts without a robots row and unparseable URLs
    are kept (robots can only speak for a host it names)."""
    from bi_gcp_stitch_repl_spark.functions.web import apply_robots

    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow: /private/\nDisallow: /tmp"),
            ("root.example", "User-agent: *\nDisallow: /"),
        ],
        "host string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [
            (1, "https://a.example/private/x.html"),  # blocked
            (2, "https://a.example/tmp?x=1"),         # blocked (query rides the path)
            (3, "https://a.example/tmpfoo"),          # blocked: literal prefix
            (4, "https://a.example/public/x"),        # kept
            (5, "HTTPS://A.EXAMPLE/private/y"),       # blocked: host case folds
            (6, "https://root.example"),              # blocked: '' path -> '/'
            (7, "https://other.example/private/z"),   # kept: no rules row
            (8, None),                                # kept: no host
            (9, "not a url"),                         # kept: no host
        ],
        "doc_id long, url string",
    )
    kept = {r.doc_id for r in apply_robots(docs, robots).collect()}
    assert kept == {4, 7, 8, 9}


def test_prepare_web_corpus_robots_runs_before_dedup(spark):
    """Order is load-bearing: robots matches the RAW spelling, so with
    two raw variants of ONE canonical URL — the first-by-id variant
    disallowed, the other allowed — robots-first keeps the allowed
    copy; dedup-first would keep-first the disallowed one and lose the
    content entirely."""
    from bi_gcp_stitch_repl_spark.jobs.pipelines import prepare_web_corpus

    robots = spark.createDataFrame(
        [("site.example", "User-agent: *\nDisallow: /a?utm_")],
        "host string, robots_txt string",
    )
    bench = spark.createDataFrame(
        [(900, "completely unrelated benchmark text")],
        "doc_id long, text string",
    )
    crawl = spark.createDataFrame(
        [
            # same canonical (tracking param strips) — raw variant 1 is
            # disallowed, variant 2 allowed; keep-first-by-id would pick 1
            (1, "https://site.example/a?utm_source=x",
             "<html><body><p>doc one words</p></body></html>"),
            (2, "https://site.example/a",
             "<html><body><p>doc one words</p></body></html>"),
            (3, "https://site.example/b",
             "<html><body><p>doc three words</p></body></html>"),
        ],
        "doc_id long, url string, html string",
    )
    out = {
        r["doc_id"]
        for r in prepare_web_corpus(spark, crawl, bench, robots=robots).collect()
    }
    assert out == {2, 3}


def test_domain_caps_binds_and_is_deterministic(spark):
    """salted_topk-backed per-domain quota on the driver fixture: the cap
    binds (no domain keeps more than DOMAIN_CAP), survivors are the LOWEST
    doc_ids per domain (deterministic keep-first), and n_domain carries
    the PRE-cap mass so mixing can reason about what was removed."""
    from bi_gcp_stitch_repl_spark.queries.web import DOMAIN_CAP, x_domain_caps

    from .conftest import SF_SMOKE

    out = x_domain_caps(spark, SF_SMOKE).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert set(by_dom) == {"example0.com", "example1.com", "example2.com"}
    for dom, rows in by_dom.items():
        assert len(rows) <= DOMAIN_CAP
        assert len(rows) < rows[0]["n_domain"]  # the cap BINDS (500/3 > 150)
        kept_ids = sorted(r["doc_id"] for r in rows)
        # keep-first: the kept set is exactly the domain's smallest ids
        assert kept_ids == sorted(
            i for i in range(500) if f"example{i % 3}.com" == dom
        )[: len(rows)]


# --- robots fold property suite --------------------------------------------

def _robots_reference(txt: str) -> list[tuple[str, bool]]:
    """Independent Python reference of parse_robots_rules' documented
    semantics (RFC 9309 wildcard-agent subset): grouped UA headers, any
    '*' applies to the group, '#' comments, case-insensitive directives,
    empty rule values contribute nothing, Allow and Disallow both
    captured in document order, blank lines inert, any other non-blank
    line ends a UA header block. Line endings are LF, CRLF or bare CR
    (RFC 9309 §2.2); token padding trims the space+tab set — NOT bare
    str.strip(), whose wider whitespace set silently masked the CRLF
    divergence this suite now exists to catch (r9 ADVICE)."""
    import re

    ua_block, applies, acc = False, False, []
    for raw in re.split(r"\r\n|\r|\n", txt):
        line = (raw.split("#", 1)[0] if "#" in raw else raw).strip(" \t")
        low = line.lower()
        if low.startswith("user-agent:"):
            agent = line[11:].strip(" \t")
            applies = (applies or agent == "*") if ua_block else agent == "*"
            ua_block = True
        elif low.startswith("disallow:") or low.startswith("allow:"):
            ua_block = False
            allow = low.startswith("allow:")
            path = line[(6 if allow else 9):].strip(" \t")
            if applies and path:
                acc.append((path, allow))
        elif line == "":
            pass
        else:
            ua_block = False
    return acc


def _robots_match_reference(path: str, pattern: str) -> bool:
    """Independent Python reference of robots_match_expr (RFC 9309
    §2.2.3): '*' matches any character run, a TRAILING '$' anchors at
    end-of-path, everything else is a literal octet — implemented as a
    character-walk with greedy-backtracking wildcard (NO regex, so it
    cannot share a bug class with the regex-compiling engine sides)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    pos = 0
    # first part must match at the start
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for part in parts[1:-1] if len(parts) > 1 else []:
        i = path.find(part, pos)
        if i < 0:
            return False
        pos = i + len(part)
    if len(parts) > 1:
        last = parts[-1]
        if anchored:
            return len(path) >= pos + len(last) and path.endswith(last)
        return path.find(last, pos) >= 0
    return path == pattern if anchored else True


def _robots_blocked_reference(
    path: str, rules: list[tuple[str, bool]]
) -> bool:
    """Independent precedence reference: longest matching rule wins,
    equal-length tie resolves to Allow, no match means allowed."""
    best: tuple[int, bool] | None = None
    for pat, allow in rules:
        if _robots_match_reference(path, pat):
            cand = (len(pat), allow)
            if best is None or cand[0] > best[0] or (
                cand[0] == best[0] and allow and not best[1]
            ):
                best = cand
    return best is not None and not best[1]


_ROBOTS_LINE = st.one_of(
    st.sampled_from(["*", "googlebot", "OtherBot"]).map(
        lambda a: f"User-agent: {a}"
    ),
    st.sampled_from(["uSeR-AgEnT:*", "USER-AGENT:  * ", "User-agent:\t*"]),
    st.sampled_from(
        ["/p", "/private/", "/a?q=", "/tmp", "", "/*.php$", "/a*b", "/$"]
    ).map(lambda p: f"Disallow: {p}"),
    st.sampled_from(
        ["DISALLOW:/x", "disallow:  /y  # trail", "Disallow:\t/tabbed"]
    ),
    st.sampled_from(
        ["/ok", "/p/sub", "", "/*.html$", "/a*"]
    ).map(lambda p: f"Allow: {p}"),
    st.sampled_from(["ALLOW:/up", "allow:  /low  # trail", "Allow:\t/tab"]),
    st.just(""),
    st.sampled_from(
        ["# a comment", "Sitemap: https://x/map.xml",
         "Crawl-delay: 2", "garbage line"]
    ),
)

#: full documents, not just LF-joined lines: every line carries generated
#: lead/tail padding from the RFC whitespace set (space/tab) and its OWN
#: terminator (LF, CRLF, bare CR — all legal per RFC 9309 §2.2). The r9
#: ADVICE finding: the old LF-only, unpadded generator could never emit
#: the CRLF/tab inputs where the fold and the reference used to disagree.
_ROBOTS_TXT = st.lists(
    st.tuples(
        _ROBOTS_LINE,
        st.sampled_from(["", " ", "\t", " \t"]),
        st.sampled_from(["", " ", "\t"]),
        st.sampled_from(["\n", "\r\n", "\r"]),
    ),
    min_size=0,
    max_size=20,
).map(
    lambda items: "".join(
        pad + line + tail + term for line, pad, tail, term in items
    )
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(txt=_ROBOTS_TXT)
def test_robots_fold_matches_reference_property(spark, txt):
    """The SQL sequential fold and the independent Python reference agree
    on ARBITRARY interleavings of UA headers / rules / comments / blanks
    / junk — under every legal terminator (LF/CRLF/CR) and space/tab
    padding — the 3-field state machine is easy to get subtly wrong at
    group boundaries, and this pins every transition."""
    from bi_gcp_stitch_repl_spark.functions.web import parse_robots_rules

    robots = spark.createDataFrame(
        [("h.example", txt)], "host string, robots_txt string"
    )
    got = [
        (x.path, x.allow)
        for x in parse_robots_rules(robots).collect()[0].rules
    ]
    assert got == _robots_reference(txt), txt


def test_parse_robots_rules_crlf_and_cr_line_endings(spark):
    """The r9 ADVICE medium finding as a regression fixture: a CRLF-served
    robots.txt (very common in the wild; RFC 9309 §2.2 allows CRLF and
    bare CR) must parse identically to its LF spelling — the old bare-\\n
    split left every agent as '*\\r' and yielded ZERO applicable rules,
    silently ingesting disallowed pages. Tab-padded tokens ride along
    (RFC whitespace is space OR tab)."""
    from bi_gcp_stitch_repl_spark.functions.web import (
        apply_robots,
        parse_robots_rules,
    )

    lf = "User-agent: *\nDisallow: /private/\nDisallow:\t/tabbed\n"
    robots = spark.createDataFrame(
        [
            ("crlf.example", lf.replace("\n", "\r\n")),
            ("cr.example", lf.replace("\n", "\r")),
            ("lf.example", lf),
        ],
        "host string, robots_txt string",
    )
    out = {
        r.host: [(x.path, x.allow) for x in r.rules]
        for r in parse_robots_rules(robots).collect()
    }
    expect = [("/private/", False), ("/tabbed", False)]
    assert out == {
        "crlf.example": expect,
        "cr.example": expect,
        "lf.example": expect,
    }
    # and the gate actually BLOCKS under the CRLF spelling end to end
    docs = spark.createDataFrame(
        [(1, "https://crlf.example/private/x"), (2, "https://crlf.example/ok")],
        "doc_id long, url string",
    )
    assert {r.doc_id for r in apply_robots(docs, robots).collect()} == {2}


def test_robots_duck_twin_matches_spark_fold(spark):
    """robots_rules_duck_sql ≡ parse_robots_rules on the fixture (in all
    three line-ending spellings) AND on 40 seeded pseudo-random directive
    interleavings with mixed LF/CRLF/CR terminators and tab padding — the
    cross-engine parity the x_robots_exclusion oracle rests on (the duck
    side replays the fold relationally: blanks inert → lag group
    boundaries → bool_or)."""
    import random

    from bi_gcp_stitch_repl_spark.functions.web import (
        parse_robots_rules,
        robots_rules_duck_sql,
    )

    rng = random.Random(90210)
    vocab = [
        "User-agent: *", "User-agent: googlebot", "uSeR-AgEnT:*",
        "USER-AGENT:  * ", "User-agent:\t*", "Disallow: /p",
        "Disallow: /private/", "Disallow: /a?q=", "DISALLOW:/x",
        "disallow:  /y  # trail", "\tDisallow:\t/tabbed ", "Disallow:",
        "Disallow: /*.php$", "Disallow: /$", "Allow: /ok",
        "ALLOW:/up", "allow:  /low  # trail", "Allow:\t/tab", "Allow:",
        "Allow: /p/*.html$",
        "", "# a comment", "Sitemap: https://x/map.xml",
        "garbage line",
    ]
    terms = ["\n", "\r\n", "\r"]
    cases = [
        ("fix.example", _ROBOTS_FIXTURE),
        ("fixcrlf.example", _ROBOTS_FIXTURE.replace("\n", "\r\n")),
        ("fixcr.example", _ROBOTS_FIXTURE.replace("\n", "\r")),
    ] + [
        (f"h{j}.example",
         "".join(rng.choice(vocab) + rng.choice(terms)
                 for _ in range(rng.randrange(0, 16))))
        for j in range(40)
    ]
    sdf = spark.createDataFrame(cases, "host string, robots_txt string")
    got_spark = {
        r.host: [(x.path, x.allow) for x in r.rules]
        for r in parse_robots_rules(sdf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE robots (host VARCHAR, robots_txt VARCHAR)"
    )
    con.executemany("INSERT INTO robots VALUES (?, ?)", cases)
    got_duck = {
        h: [(d["path"], d["allow"]) for d in rules]
        for h, rules in con.sql(
            f"SELECT host, rules FROM {robots_rules_duck_sql()}"
        ).fetchall()
    }
    assert got_spark == got_duck


# --- RFC 9309 precedence + metacharacter matching ---------------------------

#: rule-value vocabulary spanning every matcher corner: literal prefixes,
#: mid/trailing '*', trailing '$' (and '$' as a LITERAL mid-pattern
#: octet), regex specials that must stay literal, bare '*', bare '$',
#: multi-wildcard patterns.
_ROBOTS_PATTERNS = [
    "/p", "/p/", "/p/1", "/private/", "/", "/$", "*", "/*", "/*/x",
    "/*.php$", "/p/*4$", "/a*b", "/a*b$", "/*a*b*", "/a.b", "/a(1)",
    "/a+b?", "/lit$mid", "/end$", "/p/*/deep", "x", "/[x]",
]
_ROBOTS_PATHS = [
    "/", "/p", "/p/", "/p/1", "/p/1/x", "/p/2/x14", "/private/z",
    "/a.b", "/aXb", "/a(1)z", "/a+b?q", "/ab", "/axyb", "/axybz",
    "/lit$mid/y", "/end", "/endx", "/x.php", "/x.phpz", "/p/9/deep",
    "/p/9/deeper", "/[x]y", "xyz",
]


def test_robots_match_three_way_parity(spark):
    """robots_match_expr (Spark, regex-compiled) ≡ robots_match_duck_sql
    (DuckDB RE2) ≡ the backtracking character-walk reference (NO regex)
    on the full pattern×path grid — three independent formulations of
    RFC 9309 §2.2.3, so a regex-translation bug in either engine dialect
    cannot hide behind its twin (the CRLF lesson: two dialects agreeing
    is not enough when they share a formulation)."""
    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.functions.web import (
        robots_match_duck_sql,
        robots_match_expr,
    )

    rows = [(p, q) for p in _ROBOTS_PATHS for q in _ROBOTS_PATTERNS]
    ref = {(p, q): _robots_match_reference(p, q) for p, q in rows}
    mdf = spark.createDataFrame(rows, "path string, rule string")
    got_spark = {
        (r.path, r.rule): r.m
        for r in mdf.select(
            "path", "rule",
            robots_match_expr(F.col("path"), F.col("rule")).alias("m"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE grid (path VARCHAR, rule VARCHAR)")
    con.executemany("INSERT INTO grid VALUES (?, ?)", rows)
    got_duck = {
        (p, q): m
        for p, q, m in con.sql(
            "SELECT path, rule, "
            f"{robots_match_duck_sql('path', 'rule')} FROM grid"
        ).fetchall()
    }
    assert got_spark == ref, {
        k: (got_spark[k], ref[k]) for k in ref if got_spark[k] != ref[k]
    }
    assert got_duck == ref, {
        k: (got_duck[k], ref[k]) for k in ref if got_duck[k] != ref[k]
    }
    # the grid genuinely exercises both verdicts
    assert any(ref.values()) and not all(ref.values())


def test_apply_robots_rfc9309_precedence(spark):
    """Longest-match precedence end to end (RFC 9309 §2.2.2): a longer
    Allow pierces a shorter Disallow subtree, an equal-length
    Allow/Disallow tie resolves to Allow, '$' anchors (so /p/1$ blocks
    /p/1 but NOT /p/1/x), wildcards count their RAW pattern length, and
    regex specials in rule values stay literal."""
    from bi_gcp_stitch_repl_spark.functions.web import apply_robots

    robots = spark.createDataFrame(
        [
            ("a.example",
             "User-agent: *\nDisallow: /p/\nAllow: /p/1\n"
             "Disallow: /t\nAllow: /t\n"),
            ("b.example",
             "User-agent: *\nDisallow: /p/1$\nDisallow: /*4$\n"),
            ("c.example", "User-agent: *\nDisallow: /a.b\n"),
        ],
        "host string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [
            (1, "https://a.example/p/0/x"),   # blocked: /p/ only
            (2, "https://a.example/p/1/x"),   # kept: Allow /p/1 longer
            (3, "https://a.example/t/z"),     # kept: tie -> Allow
            (4, "https://b.example/p/1"),     # blocked: /p/1$ anchors
            (5, "https://b.example/p/1/x"),   # kept: $ stops the match
            (6, "https://b.example/p/2/x14"), # blocked: /*4$ wildcard
            (7, "https://b.example/p/2/x15"), # kept
            (8, "https://c.example/a.b/z"),   # blocked: literal dot
            (9, "https://c.example/aXb/z"),   # kept: '.' is NOT regex
        ],
        "doc_id long, url string",
    )
    kept = {r.doc_id for r in apply_robots(docs, robots).collect()}
    assert kept == {2, 3, 5, 7, 9}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rules=st.lists(
        st.tuples(
            st.sampled_from(_ROBOTS_PATTERNS), st.booleans()
        ),
        min_size=0,
        max_size=6,
    ),
    paths=st.lists(
        st.sampled_from(_ROBOTS_PATHS), min_size=1, max_size=6, unique=True
    ),
)


@pytest.mark.slow
def test_robots_verdict_matches_reference_property(spark, rules, paths):
    """apply_robots' verdict ≡ the independent Python precedence
    reference on arbitrary rule lists (random allow flags over the
    metacharacter pattern vocabulary) × path sets — pins the
    (best-length, tie→allow) accumulator fold against a formulation
    that never builds a regex or an accumulator."""
    from bi_gcp_stitch_repl_spark.functions.web import apply_robots

    # a non-/ vocabulary path would change the URL's HOST, not its path —
    # only slash paths round-trip through the URL spelling
    paths = [p for p in paths if p.startswith("/")]
    if not paths:
        return
    txt = "User-agent: *\n" + "".join(
        f"{'Allow' if allow else 'Disallow'}: {pat}\n"
        for pat, allow in rules
    )
    robots = spark.createDataFrame(
        [("h.example", txt)], "host string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [(i, f"https://h.example{p}") for i, p in enumerate(paths)],
        "doc_id long, url string",
    )
    expected = {
        i
        for i, p in enumerate(paths)
        if not _robots_blocked_reference(p, rules)
    }
    kept = {r.doc_id for r in apply_robots(docs, robots).collect()}
    assert kept == expected, (rules, paths)


def test_robots_match_composed_pattern_grid(spark):
    """Three-way matcher parity on 300 SEEDED COMPOSED patterns × 24
    paths (one Spark job, one DuckDB query, one reference loop — not
    per-example sessions): patterns are random concatenations of path
    segments, regex-special literals, '*' runs and optional trailing
    '$', so the grid reaches combinations the fixed vocabulary cannot
    (adjacent wildcards, '*$', '$' mid-pattern, empty-segment
    wildcards at both ends)."""
    import random

    from pyspark.sql import functions as F

    from bi_gcp_stitch_repl_spark.functions.web import (
        robots_match_duck_sql,
        robots_match_expr,
    )

    rng = random.Random(1138)
    segs = ["/p", "/p/1", "a", ".", "(", ")", "x1", "+", "$", "\\", "[x]"]
    pats = []
    for _ in range(300):
        n = rng.randrange(1, 5)
        p = "".join(
            "*" * rng.randrange(0, 3) + rng.choice(segs) for _ in range(n)
        )
        p += "*" * rng.randrange(0, 2) + ("$" if rng.random() < 0.3 else "")
        if p:
            pats.append(p)
    pats = sorted(set(pats))
    paths = [
        "/", "/p", "/p/1", "/p/1/x1", "/a.b", "/aXb", "/(x)", "/a+b",
        "/lit$mid", "/p/1$", "a", "ax1", "/p/1/x1.a", "/[x]", "x1x1",
        "/p/1a(x1)", "/\\y", "/p/*", "/p/1x1$", "/ax1(", "/p/1/x1+",
        "/..", "/p/1.", "/p/1/x1$z",
    ]
    rows = [(p, q) for p in paths for q in pats]
    ref = {(p, q): _robots_match_reference(p, q) for p, q in rows}
    mdf = spark.createDataFrame(rows, "path string, rule string")
    got_spark = {
        (r.path, r.rule): r.m
        for r in mdf.select(
            "path", "rule",
            robots_match_expr(F.col("path"), F.col("rule")).alias("m"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE grid (path VARCHAR, rule VARCHAR)")
    con.executemany("INSERT INTO grid VALUES (?, ?)", rows)
    got_duck = {
        (p, q): m
        for p, q, m in con.sql(
            "SELECT path, rule, "
            f"{robots_match_duck_sql('path', 'rule')} FROM grid"
        ).fetchall()
    }
    spark_diff = {k for k in ref if got_spark[k] != ref[k]}
    duck_diff = {k for k in ref if got_duck[k] != ref[k]}
    assert not spark_diff, sorted(spark_diff)[:5]
    assert not duck_diff, sorted(duck_diff)[:5]
    hits = sum(ref.values())
    assert 0 < hits < len(ref)  # the grid exercises both verdicts
