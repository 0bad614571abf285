"""Web-corpus preprocessing: HTML boilerplate extraction + URL canonicalization.

The two row-local transforms every web-crawl training pipeline runs before
any dedup/quality stage: turn raw HTML into clean text (drop script/style/
comments/tags, decode entities, collapse whitespace) and collapse the many
spellings of one web resource into a canonical URL (case, default port,
``www.``, tracking params, fragments, param order) so URL-level dedup works.

Both are built as SQL EXPRESSION STRINGS with a ``dialect`` switch
('spark' | 'duck') so the catalog's DuckDB oracle runs the IDENTICAL
pipeline — the only differences are engine spellings (regexp_replace's
global flag, ``$1`` vs ``\\1`` group refs, array vs list function names).
Everything is JVM-side regexp/string builtins: zero UDFs, zero shuffles —
at 100 TB these run at scan speed inside WholeStageCodegen and the plan
cost is the parquet read.

Scope note (honest): this is the regex tier of HTML cleaning — the right
shape for boilerplate stripping at scan speed, not a browser-grade parser
(no malformed-tag recovery, no CSS visibility, no trafilatura-style main-
content detection; those are per-document library calls behind a
mapInPandas seam if ever needed). The regex tier is what C4's cleaning and
most crawl pipelines' first pass actually use.

Reference parity: the reference replicates SaaS APIs, not web crawls
(SURVEY.md §0) — this is §7.6 LLM-pipeline surface.
"""

from __future__ import annotations

from .text import WS_CLASS


def _java_repl(repl: str) -> str:
    """Rewrite an RE2-style replacement (``\\1`` group refs) for Java's
    Matcher (``$1`` group refs), escaping literal ``$``/``\\`` instead of
    corrupting them (a blanket ``'\\'->'$'`` turned any literal backslash
    into a bogus group ref and a literal ``$`` into an illegal one). The
    output is then SQL-escaped one level (Spark string literals eat one
    backslash).

    The RE2 escaped-backslash pair ``\\\\`` (two input chars) is consumed
    as ONE literal backslash — treating each char independently emitted
    TWO backslashes on the Spark side while DuckDB's raw pass-through
    emits one (latent dialect divergence; no current call site passes
    backslashes, pinned by test anyway)."""
    out: list[str] = []
    i = 0
    while i < len(repl):
        c = repl[i]
        if c == "\\" and i + 1 < len(repl) and repl[i + 1].isdigit():
            out.append("$" + repl[i + 1])
            i += 2
        elif c == "\\" and i + 1 < len(repl) and repl[i + 1] == "\\":
            # RE2 '\\' = one literal backslash: Java '\\', SQL '\\\\'
            out.append("\\\\\\\\")
            i += 2
        elif c == "\\":  # stray trailing backslash: one literal
            out.append("\\\\\\\\")
            i += 1
        elif c == "$":  # literal dollar: Java '\$', SQL text '\\$'
            out.append("\\\\$")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _rr(e: str, pat: str, repl: str, dialect: str) -> str:
    """regexp_replace in either dialect. ``pat`` is the RAW regex: Spark
    SQL string literals eat one backslash level ('\\\\s' in SQL text),
    DuckDB's don't; group refs are ``$1`` (Java) vs ``\\1`` (RE2)."""
    if dialect == "spark":
        p = pat.replace("\\", "\\\\")
        return f"regexp_replace({e}, '{p}', '{_java_repl(repl)}')"
    return f"regexp_replace({e}, '{pat}', '{repl}', 'g')"


def _let(expr: str, var: str, body: str, dialect: str) -> str:
    """LET-bind ``expr`` as ``var`` inside ``body`` — the one-element
    transform idiom (Spark SQL has no LET; an unbound repeated
    subexpression is re-evaluated per textual reference)."""
    if dialect == "spark":
        return f"transform(array({expr}), {var} -> {body})[0]"
    return f"list_transform([{expr}], {var} -> {body})[1]"


#: the five XML/HTML entities plus nbsp — decoded AFTER tag removal, with
#: ``&amp;`` last so double-encoded text ('&amp;lt;') decodes one level per
#: pass like real parsers do
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "''"),  # SQL-escaped single quote, both dialects
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_text_expr(col: str, dialect: str = "spark") -> str:
    """SQL expression: visible text of an HTML document column.

    Order is load-bearing: script/style bodies go FIRST as whole blocks
    (their content may contain '<' '>' that are not markup), then
    comments, then every remaining tag becomes a space (so adjacent block
    elements don't weld words together), then entities decode, then
    whitespace collapses. Each step is one vectorized regexp over the
    row — the whole chain fuses into one codegen stage."""
    e = col
    # (?is): tag NAMES are case-insensitive in HTML — <SCRIPT>/<Style>
    # blocks must strip as blocks too, or their bodies leak into the
    # extracted corpus text (both Java regex and RE2 support (?is))
    e = _rr(e, r"(?is)<script[^>]*>.*?</script>", " ", dialect)
    e = _rr(e, r"(?is)<style[^>]*>.*?</style>", " ", dialect)
    e = _rr(e, r"(?s)<!--.*?-->", " ", dialect)
    e = _rr(e, r"<[^>]+>", " ", dialect)
    for ent, ch in _ENTITIES:
        e = f"replace({e}, '{ent}', '{ch}')"
    # WS_CLASS, not '\s': RE2 (the duck oracle) lacks \x0B in \s — a
    # vertical-tab doc would make clean_text diverge between dialects
    e = _rr(e, WS_CLASS + "+", " ", dialect)
    return f"trim({e})"


def html_escape_expr(col: str) -> str:
    """SQL expression: minimal HTML-escape of a text column (& < >) —
    same spelling in both dialects; used to BUILD well-formed HTML from
    plain text (the catalog's roundtrip construction)."""
    return (
        f"replace(replace(replace({col}, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )


def extract_links_expr(html_col: str) -> str:
    """SQL expression: ``array<string>`` of absolute http(s) hrefs in an
    HTML column — the edge producer for the domain link graph
    (jobs.pipelines.rank_domains). Double- or single-quoted attributes;
    case-insensitive ((?i): legacy uppercase '<A HREF=\"HTTP://...' is
    common at crawl scale, and registrable_domain_expr already
    lowercases the host for the same reason); relative links are skipped
    on purpose (a same-site link confers no cross-domain authority and
    the graph drops self-edges anyway). Row-local regexp_extract_all —
    zero shuffle, scan speed."""
    # the single-quote pattern is spelled as a SINGLE-quoted SQL literal
    # with doubled-quote escapes ('' — the ANSI spelling both Spark and
    # DuckDB accept under every parser config): a double-quoted string
    # here would parse as an IDENTIFIER in sessions with
    # spark.sql.ansi.doubleQuotedIdentifiers enabled
    return (
        f"concat(regexp_extract_all({html_col},"
        " '(?i)href=\"(https?://[^\"]+)\"', 1),"
        f" regexp_extract_all({html_col},"
        " '(?i)href=''(https?://[^'']+)''', 1))"
    )


#: tracking params dropped by canonicalization: the utm_* family + the
#: bare click-ref params (the list every URL-normalizer ships; extend per
#: deployment). (=|$): truncated/shared links carry these VALUELESS
#: ('?utm_source&b=1') — a bare tracking param must strip too or the same
#: resource splits into two dedup groups
_TRACKING_RE = r"^(utm_[^=&]*|ref|fbclid|gclid)(=|$)"


def canonical_url_expr(col: str, dialect: str = "spark") -> str:
    """SQL expression: canonical form of a URL column.

    Steps (RFC 3986 normalization + the crawl-dedup conventions):
    fragment off; scheme+authority lowercased (path/query case is
    SIGNIFICANT and kept); default ports (:443 https, :80 http) off;
    ``www.`` off; tracking params (utm_*/ref/fbclid/gclid) out; remaining
    query params SORTED so param order doesn't split dup groups; empty
    query and trailing path slash tidied.

    All row-local string work — canonicalization itself never shuffles;
    the downstream groupBy(canonical) is the one exchange URL-level dedup
    fundamentally needs (hash-partition by the canonical key).

    The rewritten URL and the surviving-params string are each LET-BOUND
    through the one-element transform idiom (the repo's word_ngram_expr
    lesson: Catalyst inlines textual repetition, so an unbound chain
    would re-run the whole rewrite stack in each of its three downstream
    references and the split/filter/sort twice)."""
    e = _rr(col, r"#.*$", "", dialect)  # fragment
    # lowercase scheme://host[:port] only (path/query case kept); _w
    # below binds the finished rewrite, so these cheap regexes over the
    # raw column are the only textually-repeated work. The authority
    # must stop at '/' AND '?': on a path-less URL ('http://ex.com?Q=V')
    # a bare [^/]* would eat the query and lowercase it — caught by the
    # idempotence property test
    sh = f"regexp_extract({e}, '^([^/?#]*//[^/?#]*)', 1)"
    e = f"concat(lower({sh}), substr({e}, length({sh}) + 1))"
    # default ports: RE2 (duck oracle) has no lookahead — capture the
    # delimiter (or end) and put it back
    e = _rr(e, r"^(https://[^/:?]*):443([/?]|$)", r"\1\2", dialect)
    e = _rr(e, r"^(http://[^/:?]*):80([/?]|$)", r"\1\2", dialect)
    e = _rr(e, r"^([a-z]+://)www\.", r"\1", dialect)
    # below here everything reads the bound rewrite _w, never e
    base = _rr("_w", r"\?.*$", "", dialect)
    base = _rr(base, r"/$", "", dialect)
    q = (
        "regexp_extract(_w, '\\\\?(.*)$', 1)"
        if dialect == "spark"
        else "regexp_extract(_w, '\\?(.*)$', 1)"
    )
    if dialect == "spark":
        kept = (
            f"array_join(array_sort(filter(split({q}, '&'),"
            f" p -> p != '' AND NOT p rlike '{_TRACKING_RE}')), '&')"
        )
    else:
        # coalesce: duck's array_to_string on an EMPTY list yields NULL
        # (spark's array_join yields ''), and NULL would sail through the
        # CASE below into a stray trailing '?'
        kept = (
            f"coalesce(array_to_string(list_sort(list_filter(string_split({q}, '&'),"
            f" p -> p != '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))), '&'), '')"
        )
    body = (
        f"concat({base}, CASE WHEN _q = '' THEN '' ELSE concat('?', _q) END)"
    )
    return _let(e, "_w", _let(kept, "_q", body, dialect), dialect)


def registrable_domain_expr(url_col: str, dialect: str = "spark") -> str:
    """SQL expression: the registrable domain of a URL column — host
    lowercased, ``www.`` off, last two dot-labels kept ("a.b.example.com"
    → "example.com").

    Honest scope: the real rule is the Public Suffix List (multi-label
    suffixes like ``co.uk`` need a data file); this is the deterministic
    two-label heuristic crawl pipelines use when the PSL isn't loaded —
    right for quota/cap grouping, not for cookie-scope security
    decisions. Swap the expression for a broadcast PSL join when the
    list is available; every consumer (domain caps, domain stats) is
    agnostic to which produces the column.

    Row-local string work (one regexp_extract + one split) — zero
    shuffle; the groupBy(domain) a consumer runs is the one exchange
    domain-level policies fundamentally need.

    NULL/unparseable input → NULL in BOTH dialects (the nullif guard):
    without it a NULL url fell through the CASE's ELSE branch where the
    dialects' concat NULL-handling DIVERGES (Spark concat_ws skips NULL
    args → ``''``; duck concat treats NULL as empty → ``'.'``) — a ghost
    domain node either way (caught by x_rank_domains' NULL-row fixture),
    and an unparseable url captured ``''``, a ghost quota group."""
    # [a-zA-Z] in BOTH dialects: the extract runs on the RAW url where the
    # scheme may be uppercase — a duck-side [a-z] silently captured ''
    host = f"lower(regexp_extract({url_col}, '^[a-zA-Z]+://([^/:?#]+)', 1))"
    # nullif BEFORE the www-strip/split: NULL then propagates through
    # every downstream string op identically in both dialects
    host = f"nullif({host}, '')"
    host = _rr(host, r"^www\.", "", dialect)
    if dialect == "spark":
        parts = f"split({host}, '\\\\.')"
        return (
            f"CASE WHEN {host} IS NULL THEN NULL"
            f" WHEN size({parts}) <= 2 THEN {host}"
            f" ELSE concat_ws('.', element_at({parts}, -2),"
            f" element_at({parts}, -1)) END"
        )
    parts = f"string_split({host}, '.')"
    return (
        f"CASE WHEN {host} IS NULL THEN NULL"
        f" WHEN len({parts}) <= 2 THEN {host}"
        f" ELSE concat({parts}[-2], '.', {parts}[-1]) END"
    )


def registrable_domain_psl(
    df,
    url_col: str,
    rules,
    out_col: str = "domain",
):
    """Public-Suffix-List-backed registrable domain: the exact PSL
    algorithm over a rules DataFrame, replacing the two-label heuristic
    where it matters (``shop.example.co.uk`` → ``example.co.uk``, not
    ``co.uk`` — the heuristic collapses every ``*.co.uk`` site into one
    quota group, materially distorting per-domain caps on a real crawl).

    ``rules``: a single-string-column DataFrame of raw PSL lines — plain
    (``co.uk``), wildcard (``*.ck``), exception (``!www.ck``); blank
    lines and ``//`` comments are dropped. The published list is ~10k
    rows — it collapses to ONE broadcast map row, so the lookup is a
    1-row ``crossJoin(broadcast(...))`` (the vocab-table shape) and the
    per-row resolution is a pure array fold: zero shuffles, zero UDFs,
    scan speed at 100 TB.

    Semantics (publicsuffix.org algorithm): among matching rules an
    exception wins (its public suffix is the rule minus its leftmost
    label), else the longest match; no match falls back to the implicit
    ``*`` rule (the bare TLD is the suffix — identical to the two-label
    heuristic). The registrable domain is the public suffix plus one
    label; a host that IS a public suffix has none (NULL). Suffix labels
    are probed to depth 5 (the published list's maximum is 4).

    Returns ``df`` + ``out_col`` (NULL for NULL/unparseable hosts).
    Consumers (``prepare_web_corpus(domain_cap=..., domain_psl=...)``,
    ``web_corpus_stream``) treat it as a drop-in producer of the same
    column ``registrable_domain_expr`` builds.
    """
    from pyspark.sql import functions as F

    rule_col = rules.columns[0]
    lines = rules.select(F.trim(F.col(rule_col)).alias("_r")).where(
        (F.col("_r") != "") & (~F.col("_r").startswith("//"))
    )
    exc = F.col("_r").startswith("!")
    body = F.lower(F.when(exc, F.expr("substring(_r, 2)")).otherwise(F.col("_r")))
    norm = lines.select(
        body.alias("key"),
        (
            F.size(F.split(body, "\\."))
            - F.when(exc, F.lit(1)).otherwise(F.lit(0))
        ).cast("int").alias("ps"),
        exc.alias("exc"),
    )
    # ONE row per key before the map build: map_from_entries ABORTS on a
    # duplicate key under Spark's default mapKeyDedupPolicy=EXCEPTION, so
    # a repeated line (hand-concatenated lists) or a plain rule shadowed
    # by its exception ('www.ck' + '!www.ck' share the key) would kill
    # the whole job mid-run. Priority on collision follows the PSL spec:
    # the exception rule prevails (struct max orders exc first; same-exc
    # duplicates carry identical ps by construction).
    norm = (
        norm.groupBy("key")
        .agg(F.max(F.struct(F.col("exc"), F.col("ps"))).alias("_pri"))
        .select(
            "key",
            F.col("_pri.ps").alias("ps"),
            F.col("_pri.exc").alias("exc"),
        )
    )
    psl_map = norm.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("key"), F.struct("ps", "exc")))
        ).alias("_psl")
    )

    # NO www-strip here (unlike the heuristic): the PSL algorithm handles
    # it naturally (www.example.com → example.com via ps=1 anyway), and
    # stripping breaks the hosts where "www.X" IS the registrable name
    # (the list's own test vector !www.ck, and the registered www.com).
    # Consumers feeding canonical URLs already lost a leading www — that
    # is the canonicalizer's (separate) dedup decision.
    #
    # host and labels are MATERIALIZED as columns of prior projections,
    # not captured inline (the x_html_extract discipline, and doubly
    # load-bearing here): the probe fold below is a higher-order function
    # — evaluated INTERPRETED, outside codegen — and an inline host
    # expression captured by its lambda re-runs regexp_extract + split
    # per probe per row (~12× per row; materializing once measured
    # 2.3 s → 1.5 s on the bare 5k-doc resolution and 3.2 → 2.8 s on the
    # caps composition). CollapseProject keeps the split because
    # non-cheap multiply-referenced aliases are not re-inlined.
    host = F.lower(
        F.regexp_extract(F.col(url_col), "^[a-zA-Z]+://([^/:?#]+)", 1)
    )
    staged = (
        df.crossJoin(F.broadcast(psl_map))
        .withColumn("_h", host)
        .withColumn("_ls", F.split(F.col("_h"), "\\."))
    )
    hostc = F.col("_h")
    labels = F.col("_ls")
    n = F.size(labels)
    # NULL-host guard BEFORE sequence(): least() skips NULLs, so a NULL n
    # would otherwise fold 5 probe rounds over a NULL label array
    safe_n = F.when(hostc.isNotNull() & (hostc != ""), n).otherwise(F.lit(1))
    mp = F.col("_psl")

    def suffix(k):
        return F.concat_ws(".", F.slice(labels, -k, k))

    # the probe FOLD stays a higher-order aggregate() on purpose: an
    # unrolled coalesce/greatest spelling was A/B-measured SLOWER
    # (4.1-4.8 s vs 3.3-3.8 s on the sf0.1 caps composition) — greatest()
    # evaluates all 10 probes with no short-circuit while the fold stops
    # at min(n, 5) rounds and carries two ints of state; the win that
    # mattered was materializing host/labels above, not escaping the
    # interpreted lambda.
    def merge(acc, k):
        e = F.try_element_at(mp, suffix(k))
        w = F.try_element_at(mp, F.concat(F.lit("*."), suffix(k)))
        return F.struct(
            F.coalesce(
                acc["exc_ps"],
                F.when(e.isNotNull() & e["exc"], e["ps"]),
            ).alias("exc_ps"),
            F.greatest(
                acc["best"],
                F.coalesce(F.when(e.isNotNull() & ~e["exc"], e["ps"]), F.lit(0)),
                # a wildcard suffix has k+1 labels: it only matches hosts
                # that HAVE that extra label
                F.coalesce(
                    F.when(
                        w.isNotNull() & (safe_n >= k + F.lit(1)), w["ps"]
                    ),
                    F.lit(0),
                ),
            ).alias("best"),
        )

    init = F.struct(
        F.lit(None).cast("int").alias("exc_ps"), F.lit(0).alias("best")
    )
    acc = F.aggregate(
        F.sequence(F.lit(1), F.least(safe_n, F.lit(5))), init, merge
    )
    ps = F.coalesce(acc["exc_ps"], F.nullif(acc["best"], F.lit(0)), F.lit(1))
    dom = F.when(
        hostc.isNotNull() & (hostc != "") & (safe_n > ps),
        F.concat_ws(".", F.slice(labels, -(ps + F.lit(1)), ps + F.lit(1))),
    )
    return staged.withColumn(out_col, dom).drop("_psl", "_h", "_ls")


def parse_robots_rules(
    robots,
    host_col: str = "host",
    txt_col: str = "robots_txt",
):
    """``(host, rules array<struct<path string, allow boolean>>)`` — the
    ``User-agent: *`` Allow/Disallow rules of each host's robots.txt in
    document order, parsed with a zero-UDF sequential fold (RFC 9309
    grouping, simplified to the wildcard agent).

    Grammar honored: consecutive ``User-agent:`` lines form one group
    header (a group applies when ANY of them is ``*``); the group's
    ``Allow:`` / ``Disallow:`` lines follow until the next
    ``User-agent:`` line starts a new group; ``#`` comments strip to end
    of line; directive names are case-insensitive; an EMPTY rule value
    contributes no rule (RFC 9309 §2.2.2: an empty pattern is ignored —
    the classic ``Disallow:`` "allow all" spelling). Line endings are
    LF, CRLF **or** bare CR — RFC 9309 §2.2 allows all three, and real
    hosts commonly serve CRLF: splitting on ``\\n`` alone would leave
    every agent parsed as ``*\\r`` (never equal to ``*``) and silently
    ingest disallowed pages (the r9 ADVICE finding — both dialects
    agreed, so only a CRLF fixture can catch it). Token padding is space
    OR tab (RFC whitespace), trimmed with an explicit ``BOTH ' \\t'``
    set. Rule VALUES are kept verbatim (incl. ``*`` / ``$``
    metacharacters) — matching precedence lives in
    :func:`robots_verdict_expr` / :func:`apply_robots`, so the parse
    stays a pure grammar pass.

    Scale shape: the fold is one row-local ``aggregate`` over the line
    array — robots documents parse at scan speed; the output is one row
    per host (duplicate host rows fold via flatten+collect downstream in
    :func:`apply_robots`). State is (in-UA-block, group-applies, rules)
    — exactly the 3-field struct the fold carries; lines are
    comment-stripped and whitespace-trimmed ONCE by a transform() before
    the fold instead of re-deriving the clean line per branch.
    """
    from pyspark.sql import functions as F

    ws = "BOTH ' \\t' FROM"

    def rule_branch(prefix_len: int, allow: str) -> str:
        # prefix_len = len('disallow:')+1 or len('allow:')+1 — substring
        # is 1-based, so the value starts one past the directive name
        val = f"trim({ws} substring(line, {prefix_len}))"
        return f"""named_struct(
      'ua', false,
      'app', s.app,
      'acc', CASE WHEN s.app AND {val} <> ''
              THEN array_append(s.acc,
                                named_struct('path', {val},
                                             'allow', {allow}))
              ELSE s.acc END)"""

    fold = f"""
aggregate(
  transform(split({txt_col}, '\\r\\n|\\r|\\n'),
            l -> trim({ws} regexp_replace(l, '#.*$', ''))),
  named_struct('ua', false, 'app', false,
               'acc', cast(array() as
                           array<struct<path: string, allow: boolean>>)),
  (s, line) -> CASE
    WHEN startswith(lower(line), 'user-agent:')
    THEN named_struct(
      'ua', true,
      'app', CASE WHEN s.ua THEN s.app OR
                   trim({ws} substring(line, 12)) = '*'
              ELSE trim({ws} substring(line, 12)) = '*' END,
      'acc', s.acc)
    WHEN startswith(lower(line), 'disallow:')
    THEN {rule_branch(10, 'false')}
    WHEN startswith(lower(line), 'allow:')
    THEN {rule_branch(7, 'true')}
    WHEN line = '' THEN s
    ELSE named_struct('ua', false, 'app', s.app, 'acc', s.acc)
  END,
  s -> s.acc
)"""
    return robots.select(
        F.lower(F.trim(F.col(host_col))).alias("host"),
        F.expr(fold).alias("rules"),
    )


#: Java/RE2-compatible character class of regex metacharacters that must
#: be escaped when a robots rule value is compiled to a regex. ``*`` IS
#: in the set — it is escaped first and the two-char ``\*`` sequence is
#: then rewritten to ``.*`` so only the robots wildcard survives as a
#: metacharacter (a ``$`` anywhere but rule end is a literal octet).
_ROBOTS_REGEX_SPECIALS = r"([\.\[\]\{\}\(\)\^\$\|\+\?\*\\])"


def robots_match_expr(path, rule_path):
    """Column: does URL ``path`` match robots rule value ``rule_path``
    under RFC 9309 §2.2.3 special characters — ``*`` matches any
    character sequence (including ``/``), a TRAILING ``$`` anchors the
    match at end-of-path, and every other octet matches literally
    (case-sensitively). Rules without metacharacters take the literal
    ``startswith`` fast path — the regex compile is paid only on the
    (rare in real corpora) wildcard rules; metacharacter rules compile
    to an anchored regex with regex specials escaped so ``.``, ``(`` …
    in rule values stay literal."""
    from pyspark.sql import functions as F

    anchored = rule_path.endswith("$")
    body = F.when(
        anchored, rule_path.substr(F.lit(1), F.length(rule_path) - 1)
    ).otherwise(rule_path)
    regex = F.concat(
        F.lit("^"),
        F.replace(
            F.regexp_replace(body, _ROBOTS_REGEX_SPECIALS, r"\\$1"),
            F.lit(r"\*"),
            F.lit(".*"),
        ),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return F.when(
        ~F.contains(rule_path, F.lit("*")) & ~anchored,
        path.startswith(rule_path),
    ).otherwise(F.rlike(path, regex))


def robots_verdict_expr(path, rules):
    """Column: is ``path`` BLOCKED by ``rules`` (the
    :func:`parse_robots_rules` array) under RFC 9309 §2.2.2 precedence —
    the matching rule with the MOST octets wins; an Allow/Disallow tie
    at the same length resolves to Allow; no matching rule means
    allowed. "Octets" is spelled ``length()`` (characters) in BOTH
    engine dialects, so parity holds for non-ASCII rule values too.

    One row-local ``aggregate`` over the rules array carrying a
    2-field (best-length, best-is-allow) struct — the probe stays
    scan-speed; no sort, no explode."""
    from pyspark.sql import functions as F

    init = F.struct(
        F.lit(-1).alias("len"), F.lit(True).alias("allow")
    )

    def merge(acc, r):
        plen = F.length(r["path"])
        better = (plen > acc["len"]) | (
            (plen == acc["len"]) & r["allow"] & ~acc["allow"]
        )
        return F.when(
            robots_match_expr(path, r["path"]) & better,
            F.struct(plen.alias("len"), r["allow"].alias("allow")),
        ).otherwise(acc)

    return F.aggregate(
        rules, init, merge, lambda acc: (acc["len"] >= 0) & ~acc["allow"]
    )


def apply_robots(
    docs,
    robots,
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
):
    """Drop rows whose URL is DISALLOWED by the ``User-agent: *`` group
    of the url's host's robots.txt — the crawl-politeness gate every
    corpus pipeline runs before spending parse/dedup work on a page it
    must not keep. ``robots``: one row per host, ``(host, robots_txt)``
    (repeated host rows merge; their rule lists concatenate in
    first-seen-row order — precedence is length-based, so concatenation
    order never changes the verdict).

    Matching: host = lowercased URL authority minus port; path = the
    first '/' onward ('' → '/', so a ``Disallow: /`` blocks the bare
    root URL too); RFC 9309 longest-match precedence over Allow AND
    Disallow with ``*`` / trailing-``$`` metacharacters
    (:func:`robots_verdict_expr`). URLs with no parseable host are KEPT
    (same posture as the quota stage's NULL-domain fallback — robots can
    only speak for a host it names). Hosts with no robots row are kept
    (no rules = no restriction).

    Scale shape: ONE hash equi-join on the host key — the rules side is
    one row per host with its rule array (corpus-scaled like the
    domain-counts table, so NO broadcast hint: AQE decides); the
    precedence probe is a row-local ``aggregate`` fold over that row's
    array with literal rules on a startswith fast path. Nothing else
    shuffles.
    """
    from pyspark.sql import functions as F

    rules = (
        parse_robots_rules(robots, host_col=host_col, txt_col=txt_col)
        .groupBy("host")
        .agg(F.flatten(F.collect_list("rules")).alias("_rules"))
    )
    host = F.lower(
        F.regexp_extract(F.col(url_col), "^[a-zA-Z]+://([^/:?#]+)", 1)
    )
    joined = docs.withColumn("_rhost", F.nullif(host, F.lit(""))).join(
        rules.withColumnRenamed("host", "_rhost"), "_rhost", "left"
    )
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(url_col), "^[a-zA-Z]+://[^/]*(/.*)$", 1),
            F.lit(""),
        ),
        F.lit("/"),
    )
    empty = F.expr(
        "cast(array() as array<struct<path: string, allow: boolean>>)"
    )
    blocked = robots_verdict_expr(path, F.coalesce(F.col("_rules"), empty))
    return joined.filter(~blocked).drop("_rhost", "_rules")


def robots_rules_duck_sql(
    source: str = "robots",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> str:
    """DuckDB twin of :func:`parse_robots_rules`: a self-contained
    subquery producing ``(host, rules list<struct(path, allow)>)`` from
    ``source``. DuckDB 1.0's ``list_reduce`` has no initial-value form
    (struct accumulators cannot seed), so the sequential fold is replayed
    RELATIONALLY — legal because blank lines are inert to the fold's
    state: with blanks dropped, a UA line opens a group exactly when the
    previous kept line was not a UA line (lag), group ids are a running
    boundary sum, a group applies when any of its UA lines names ``*``
    (bool_or), and the rules are its non-empty Allow/Disallow values in
    line order. Line endings normalize CRLF / bare CR to LF before the
    split and token trims use the space+tab set — the Spark fold's RFC
    9309 whitespace rules (the r9 ADVICE CRLF finding, fixed in BOTH
    dialects in the same commit so the cross-engine gate stays honest).
    Parity with the Spark fold is pytest-pinned (fixture + generated
    interleavings incl. CRLF/CR/tab/Allow); the x_robots_exclusion
    catalog query composes this with :func:`robots_blocked_duck_sql`."""
    ws = "' ' || chr(9)"
    line = f"trim(regexp_replace(u.l, '#.*$', ''), {ws})"
    return f"""(
WITH _rl AS (
  SELECT lower(trim({host_col})) AS host,
         unnest(list_transform(
           string_split(replace(replace({txt_col}, chr(13) || chr(10),
                                        chr(10)),
                                chr(13), chr(10)),
                        chr(10)),
           (l, i) -> struct_pack(l := l, i := i))) AS u
  FROM {source}
),
_rk AS (
  SELECT host, u.i AS i,
         CASE WHEN lower({line}) LIKE 'user-agent:%' THEN 'ua'
              WHEN lower({line}) LIKE 'disallow:%' THEN 'dis'
              WHEN lower({line}) LIKE 'allow:%' THEN 'alw'
              WHEN {line} = '' THEN 'blank' ELSE 'other' END AS kind,
         trim(substring({line}, 12), {ws}) AS agent,
         CASE WHEN lower({line}) LIKE 'disallow:%'
              THEN trim(substring({line}, 10), {ws})
              ELSE trim(substring({line}, 7), {ws}) END AS path
  FROM _rl
),
_rm AS (
  SELECT *,
         CASE WHEN kind = 'ua' AND
                   COALESCE(lag(kind) OVER (PARTITION BY host ORDER BY i),
                            'x') <> 'ua'
              THEN 1 ELSE 0 END AS boundary
  FROM _rk WHERE kind <> 'blank'
),
_rg AS (
  SELECT *, SUM(boundary) OVER (PARTITION BY host ORDER BY i
                                ROWS UNBOUNDED PRECEDING) AS gid
  FROM _rm
),
_ra AS (
  SELECT host, gid, bool_or(kind = 'ua' AND agent = '*') AS applies
  FROM _rg GROUP BY 1, 2
),
_rp AS (
  SELECT g.host,
         list(struct_pack(path := g.path, allow := g.kind = 'alw')
              ORDER BY g.i) AS rules
  FROM _rg g JOIN _ra a USING (host, gid)
  WHERE g.kind IN ('dis', 'alw') AND a.applies AND g.path <> ''
  GROUP BY g.host
)
SELECT r.host,
       COALESCE(p.rules,
                CAST([] AS STRUCT(path VARCHAR, allow BOOLEAN)[])) AS rules
FROM (SELECT DISTINCT lower(trim({host_col})) AS host FROM {source}) r
LEFT JOIN _rp p USING (host)
)"""


def robots_match_duck_sql(path_sql: str, rule_sql: str) -> str:
    """DuckDB twin of :func:`robots_match_expr`: a boolean SQL expression
    — does ``path_sql`` match robots rule value ``rule_sql`` under RFC
    9309 ``*`` / trailing-``$`` semantics. Same shape as the Spark
    expression: literal rules take the ``starts_with`` fast path,
    metacharacter rules compile to an anchored RE2 regex with specials
    escaped (``\\0`` = whole-match backreference in DuckDB's RE2
    replacement dialect, vs Java's ``$1`` on the Spark side)."""
    body = (
        f"CASE WHEN ends_with({rule_sql}, '$')"
        f" THEN left({rule_sql}, length({rule_sql}) - 1)"
        f" ELSE {rule_sql} END"
    )
    regex = (
        "'^' || replace(regexp_replace("
        + body
        + r", '([\.\[\]\{\}\(\)\^\$\|\+\?\*\\])', '\\\0', 'g'), "
        + r"'\*', '.*') || "
        + f"CASE WHEN ends_with({rule_sql}, '$') THEN '$' ELSE '' END"
    )
    return (
        f"(CASE WHEN strpos({rule_sql}, '*') = 0"
        f" AND NOT ends_with({rule_sql}, '$')"
        f" THEN starts_with({path_sql}, {rule_sql})"
        f" ELSE regexp_matches({path_sql}, {regex}) END)"
    )
