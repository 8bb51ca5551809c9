"""robots.txt politeness gating — the crawl pipeline's FIRST filter.

A crawl corpus is only usable if the pipeline can prove it respected
(or at least can audit) robots exclusions, and recrawl planning needs
the same gate. The reference engine has no connector/crawl layer at
all (its ``session.py`` is "hand me a DataFrame"), so this module is
beyond-reference; it follows the repo's established conventions:
pure-Catalyst column arithmetic (window + prefix compare — no UDF, no
Python in the hot path), size-guarded broadcasts, and exact
SQL-replayability of every step so the DuckDB oracle can grade values.

Semantics implemented (RFC 9309 / Google REP):

- ``User-agent`` lines start a GROUP; several consecutive UA lines
  share the group's rules (``User-agent: a\\nUser-agent: b\\n
  Disallow: /x`` applies to both).
- A fetcher obeys the group(s) naming it EXACTLY when any exist for
  its agent, else the ``*`` group(s); when neither exists, everything
  is allowed. A named group with NO rules still counts as "exists":
  it allows everything and supersedes the ``*`` group (RFC group
  selection — the empty group is the site saying "this agent is
  unrestricted").
- ``Disallow:`` with an empty value allows everything.
- ``*`` in a rule path matches any run of characters; a trailing
  ``$`` anchors the rule to the end of the URL path (the Google/RFC
  wildcard extension). A ``$`` anywhere else is a literal character,
  matching Google's reference parser. Wildcard rules are translated
  ONCE at parse time to anchored regexes; ``*``-free rules keep the
  prefix fast path (no per-row regex for the common case).
- Most-specific match wins across the governing rules — specificity
  is the length of the rule path as written (wildcards count one
  octet, the RFC's "longest match" reading that Google's matcher
  uses); ``Allow`` beats ``Disallow`` at equal length.

Scale shape: parsing is one projection + one explode + two window
passes over the ROBOTS corpus (one small doc per domain — tiny next
to the URL corpus); gating packs the governing rules to ONE array row
per domain and joins them onto the URL side. The packed table is
broadcast only when provably small (row-count guard); past the
threshold the gate falls back to a plain equi-join on ``domain`` —
one honest, linear shuffle of the URL corpus instead of a broadcast
whose size grows with DOMAIN COUNT (tens of millions of domains in a
real crawl would blow past Spark's 8 GB broadcast cap). The fold is
identical on both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_gate", "crawl_directives"]

# Rules at or under this many (domain, agent, directive) rows are
# broadcast; above it the gate shuffles the URL corpus on domain
# instead. ~1M packed rule structs is tens of MB — far under Spark's
# broadcast cap, far over any politeness corpus a single job needs
# driver-side.
_DEFAULT_BROADCAST_RULE_LIMIT = 1_000_000


def _wildcard_regex(value):
    """Translate a robots rule path containing ``*``/trailing ``$``
    into an anchored Java regex (as a Column), per the Google REP
    parser: ``*`` -> ``.*``, ONE trailing ``$`` -> end anchor, every
    other character literal. Returns the regex string column; callers
    only apply it when the rule actually contains a wildcard.
    """
    anchored = value.endswith("$")
    body = F.when(
        anchored, F.substr(value, F.lit(1), F.length(value) - 1)
    ).otherwise(value)
    # Escape regex metacharacters EXCEPT '*' (translated below).
    esc = F.regexp_replace(body, "([\\\\.+?(){}\\[\\]^$|])", "\\\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots(
    df: DataFrame,
    domain_column: str,
    robots_column: str,
) -> DataFrame:
    """Parse one robots.txt document per row into a rule table:
    ``(domain, agent, directive, prefix, rule_len, rx)`` — one row
    per (user-agent, Allow/Disallow directive) pair, group semantics
    as in the module docstring. ``rx`` is an anchored regex for rules
    containing ``*`` or a trailing ``$`` and NULL for plain-prefix
    rules (the fast path). Lines that are comments (``#``), blank, or
    unknown directives (Crawl-delay, Sitemap, ...) are ignored for
    gating. Matching is case-insensitive on directive names and agent
    names (RFC 9309), case-sensitive on path prefixes.

    Empty ``Disallow:`` becomes an Allow of ``""`` (allow-everything),
    and a group with NO rules at all emits the same sentinel — so an
    empty exact-agent group still registers as existing and
    supersedes the ``*`` group downstream, with no special case in
    the longest-match logic.
    """
    lines = df.select(
        F.col(domain_column).alias("domain"),
        F.posexplode(
            F.split(F.coalesce(F.col(robots_column), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).select(
        "domain",
        "pos",
        # strip comments, then whitespace (incl. CR from CRLF files)
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "domain",
        "pos",
        F.lower(
            F.trim(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
        ).alias("key"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "value"
        ),
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))
    # Group ids: a UA line that does NOT directly follow another UA
    # line starts a new group; rules attach to the latest group.
    w = Window.partitionBy("domain").orderBy("pos")
    marked = parsed.withColumn(
        "is_ua", (F.col("key") == "user-agent").cast("int")
    ).withColumn(
        "starts_group",
        (
            (F.col("key") == "user-agent")
            & (
                F.coalesce(F.lag("key").over(w), F.lit(""))
                != F.lit("user-agent")
            )
        ).cast("int"),
    ).withColumn("group_id", F.sum("starts_group").over(w))
    agents = (
        marked.filter("key = 'user-agent'")
        .select(
            "domain",
            "group_id",
            F.lower(F.col("value")).alias("agent"),
        )
        .distinct()
    )
    rules = marked.filter(
        (F.col("key") != "user-agent") & (F.col("group_id") > 0)
    ).select(
        "domain",
        "group_id",
        # empty Disallow == allow everything
        F.when(
            (F.col("key") == "disallow") & (F.col("value") == ""),
            F.lit("allow"),
        )
        .otherwise(F.col("key"))
        .alias("directive"),
        F.col("value").alias("prefix"),
    )
    # LEFT join so a group that names agents but carries no rules
    # still materializes (as the allow-"" sentinel): an empty
    # exact-agent group must register for RFC group selection.
    joined = agents.join(rules, ["domain", "group_id"], "left").select(
        "domain",
        "agent",
        F.coalesce("directive", F.lit("allow")).alias("directive"),
        F.coalesce("prefix", F.lit("")).alias("prefix"),
    )
    is_wild = F.col("prefix").contains("*") | F.col("prefix").endswith("$")
    return joined.select(
        "domain",
        "agent",
        "directive",
        "prefix",
        F.length("prefix").alias("rule_len"),
        F.when(is_wild, _wildcard_regex(F.col("prefix"))).alias("rx"),
    )


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    domain_column: str,
    path_column: str,
    user_agent: str = "*",
    output_column: str = "crawl_allowed",
    broadcast_rules: bool | None = None,
    broadcast_rule_limit: int = _DEFAULT_BROADCAST_RULE_LIMIT,
) -> DataFrame:
    """Gate a URL corpus against a :func:`parse_robots` rule table:
    adds boolean ``output_column`` — True when ``user_agent`` may
    fetch the path. Exact-agent groups override ``*`` groups when any
    exist for the domain (RFC 9309 group selection, including empty
    exact groups); within the governing rules, the most specific
    (longest-as-written, wildcard-aware) matching rule wins and
    ``Allow`` beats ``Disallow`` at equal length; no matching rule
    (or no rules for the domain at all) means allowed.

    Plan shape: the governing rules collapse to ONE array row per
    domain and the longest match resolves with a per-row array fold —
    the URL corpus gains no row keys (a groupBy-rowid + join-back
    design would stand on monotonically_increasing_id's
    non-determinism). The packed table is broadcast ONLY when the
    rule table is provably small: ``broadcast_rules=None`` counts the
    governing rules up to ``broadcast_rule_limit`` (a bounded
    ``limit(n+1).count()`` probe over the tiny rules side, never the
    URL corpus) and falls back to a plain equi-join on ``domain`` —
    one linear shuffle of the URL corpus — when the count exceeds the
    limit, because broadcast size here grows with DOMAIN COUNT and a
    real crawl's tens of millions of domains would exceed Spark's
    8 GB broadcast cap. Pass ``broadcast_rules=True/False`` to pin
    either path. Pure Catalyst; every step, including the tie-breaks,
    replays in ANSI SQL (the oracle re-derives the same winner with a
    plain join + argmax).
    """
    ua = user_agent.lower()
    scoped = rules.filter(
        (F.lower(F.col("agent")) == ua) | (F.col("agent") == "*")
    ).withColumn("is_exact", (F.lower(F.col("agent")) == ua).cast("int"))
    # Domains with an exact-agent group ignore their * groups.
    has_exact = scoped.groupBy("domain").agg(
        F.max("is_exact").alias("has_exact")
    )
    governing = scoped.join(has_exact, "domain").filter(
        (F.col("is_exact") == 1) | (F.col("has_exact") == 0)
    )
    packed = governing.groupBy("domain").agg(
        F.collect_list(
            F.struct(
                F.col("rule_len").alias("l"),
                (F.col("directive") == "allow").cast("int").alias("a"),
                F.col("prefix").alias("p"),
                F.col("rx").alias("rx"),
            )
        ).alias("__rules__")
    ).withColumnRenamed("domain", "__rdomain__")
    if broadcast_rules is None:
        # Bounded probe on the RULES side only: scans at most
        # limit+1 rows, never touches the URL corpus.
        broadcast_rules = (
            scoped.limit(broadcast_rule_limit + 1).count()
            <= broadcast_rule_limit
        )
    right = F.broadcast(packed) if broadcast_rules else packed
    joined = urls.join(
        right,
        urls[domain_column] == packed["__rdomain__"],
        "left",
    )
    path = F.col(path_column)

    def _matches(r):
        # Prefix fast path for *-free rules; per-rule anchored regex
        # (built once at parse time) for wildcard rules.
        return F.when(
            r["rx"].isNull(), path.startswith(r["p"])
        ).otherwise(F.regexp_like(path, r["rx"]))

    # Fold: keep the lexicographic max of (match length, is_allow)
    # over the matching rules; the (-1, 1) seed makes "no matching
    # rule" (and "no rules at all") allowed.
    best = F.aggregate(
        F.filter(
            F.coalesce(
                F.col("__rules__"),
                F.array().cast(
                    "array<struct<l:int,a:int,p:string,rx:string>>"
                ),
            ),
            _matches,
        ),
        F.struct(
            F.lit(-1).alias("l"), F.lit(1).alias("a")
        ),
        lambda acc, r: F.when(
            (r["l"] > acc["l"])
            | ((r["l"] == acc["l"]) & (r["a"] > acc["a"])),
            F.struct(r["l"].alias("l"), r["a"].alias("a")),
        ).otherwise(acc),
    )
    return joined.withColumn(
        output_column, best["a"] == 1
    ).drop("__rdomain__", "__rules__")


def crawl_directives(
    df: DataFrame,
    domain_column: str,
    robots_column: str,
    user_agent: str = "*",
) -> DataFrame:
    """Per-domain politeness METADATA from robots.txt — the two
    directives a crawl scheduler consumes alongside the allow/deny
    gate: ``(domain, crawl_delay, sitemaps)``.

    - ``Crawl-delay`` is a GROUP directive (non-standard but
      near-universal): RFC 9309 group selection applies — the
      exact-agent group's delay supersedes the ``*`` group's when any
      exact group exists for the domain. When several governing
      groups carry delays, the MAXIMUM wins (the conservative
      politeness reading). Unparsable or negative values are ignored;
      a domain with no governing delay gets NULL (fetch at the
      crawler's default rate).
    - ``Sitemap`` lines are file-global per the sitemaps protocol
      (valid anywhere, not tied to a group): collected as a sorted
      distinct array, empty when none.

    Pure Catalyst (the :func:`parse_robots` projection + two
    aggregations over the tiny robots corpus); exactly replayable in
    SQL, so the DuckDB oracle can grade values.
    """
    ua = user_agent.lower()
    lines = df.select(
        F.col(domain_column).alias("domain"),
        F.posexplode(
            F.split(F.coalesce(F.col(robots_column), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).select(
        "domain",
        "pos",
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "domain",
        "pos",
        F.lower(
            F.trim(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
        ).alias("key"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "value"
        ),
    ).filter(
        F.col("key").isin("user-agent", "crawl-delay", "sitemap")
    )
    # Sitemaps: file-global, independent of grouping.
    sitemaps = parsed.filter(
        (F.col("key") == "sitemap") & (F.col("value") != "")
    ).groupBy("domain").agg(
        F.array_sort(F.collect_set("value")).alias("sitemaps")
    )
    # Crawl-delay: same group attachment + selection as parse_robots.
    grouped = parsed.filter(F.col("key") != "sitemap")
    w = Window.partitionBy("domain").orderBy("pos")
    marked = grouped.withColumn(
        "starts_group",
        (
            (F.col("key") == "user-agent")
            & (
                F.coalesce(F.lag("key").over(w), F.lit(""))
                != F.lit("user-agent")
            )
        ).cast("int"),
    ).withColumn("group_id", F.sum("starts_group").over(w))
    agents = (
        marked.filter("key = 'user-agent'")
        .select(
            "domain", "group_id", F.lower(F.col("value")).alias("agent")
        )
        .distinct()
        .filter((F.lower(F.col("agent")) == ua) | (F.col("agent") == "*"))
        .withColumn(
            "is_exact", (F.lower(F.col("agent")) == ua).cast("int")
        )
    )
    delays = marked.filter(
        (F.col("key") == "crawl-delay") & (F.col("group_id") > 0)
    ).select(
        "domain",
        "group_id",
        # try_cast: unparsable delays are junk to skip, not job
        # failures (ANSI cast would throw on 'nonsense').
        F.col("value").try_cast("double").alias("delay"),
    ).filter(F.col("delay") >= 0)
    scoped = agents.join(delays, ["domain", "group_id"]).select(
        "domain", "is_exact", "delay"
    )
    has_exact = scoped.groupBy("domain").agg(
        F.max("is_exact").alias("has_exact")
    )
    governing = scoped.join(has_exact, "domain").filter(
        (F.col("is_exact") == 1) | (F.col("has_exact") == 0)
    )
    delay_per_domain = governing.groupBy("domain").agg(
        F.max("delay").alias("crawl_delay")
    )
    domains = df.select(
        F.col(domain_column).alias("domain")
    ).distinct()
    return (
        domains.join(delay_per_domain, "domain", "left")
        .join(sitemaps, "domain", "left")
        .select(
            "domain",
            "crawl_delay",
            F.coalesce(
                "sitemaps", F.array().cast("array<string>")
            ).alias("sitemaps"),
        )
    )
