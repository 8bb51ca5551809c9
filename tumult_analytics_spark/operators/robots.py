"""robots.txt politeness gating — the crawl pipeline's FIRST filter.

A crawl corpus is only usable if the pipeline can prove it respected
(or at least can audit) robots exclusions, and recrawl planning needs
the same gate. The reference engine has no connector/crawl layer at
all (its ``session.py`` is "hand me a DataFrame"), so this module is
beyond-reference; it follows the repo's established conventions:
pure-Catalyst column arithmetic (window + prefix compare — no UDF, no
Python in the hot path), broadcast-sized rule tables, and exact
SQL-replayability of every step so the DuckDB oracle can grade values.

Semantics implemented (the well-defined core of REP / RFC 9309):

- ``User-agent`` lines start a GROUP; several consecutive UA lines
  share the group's rules (``User-agent: a\\nUser-agent: b\\n
  Disallow: /x`` applies to both).
- A fetcher obeys the group(s) naming it EXACTLY when any exist for
  its agent, else the ``*`` group(s); when neither exists, everything
  is allowed.
- ``Disallow:`` with an empty value allows everything.
- Longest-prefix match wins across the governing rules; ``Allow``
  beats ``Disallow`` on equal length (the Google/RFC tie-break).
- Prefix-only matching: the ``*``/``$`` wildcard extension is NOT
  implemented (documented subset — wildcard support would force
  per-row regex compilation, and the '*'-free prefix form covers the
  overwhelming majority of real rules).

Scale shape: parsing is one projection + one explode + two window
passes over the ROBOTS corpus (one small doc per domain — tiny next
to the URL corpus); gating broadcasts the rule table and resolves the
longest match with one aggregation keyed by the URL row — no shuffle
of the URL corpus beyond its own aggregation needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_gate"]


def parse_robots(
    df: DataFrame,
    domain_column: str,
    robots_column: str,
) -> DataFrame:
    """Parse one robots.txt document per row into a rule table:
    ``(domain, agent, directive, prefix, rule_len)`` — one row per
    (user-agent, Allow/Disallow directive) pair, group semantics as in
    the module docstring. Lines that are comments (``#``), blank, or
    unknown directives (Crawl-delay, Sitemap, ...) are ignored for
    gating. Matching is case-insensitive on directive names and agent
    names (RFC 9309), case-sensitive on path prefixes.

    Empty ``Disallow:`` becomes an Allow of ``""`` (allow-everything),
    so downstream longest-match logic needs no special case.
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
    return (
        agents.join(rules, ["domain", "group_id"])
        .select(
            "domain",
            "agent",
            "directive",
            "prefix",
            F.length("prefix").alias("rule_len"),
        )
    )


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    domain_column: str,
    path_column: str,
    user_agent: str = "*",
    output_column: str = "crawl_allowed",
) -> DataFrame:
    """Gate a URL corpus against a :func:`parse_robots` rule table:
    adds boolean ``output_column`` — True when ``user_agent`` may
    fetch the path. Exact-agent groups override ``*`` groups when any
    exist for the domain (RFC 9309 group selection); within the
    governing rules, the longest matching prefix wins and ``Allow``
    beats ``Disallow`` at equal length; no matching rule (or no rules
    for the domain at all) means allowed.

    Plan shape: the governing rules collapse to ONE array row per
    domain (robots rules are tiny — dozens per domain next to a URL
    corpus of millions per domain), broadcast onto the URL side, and
    the longest match resolves with a per-row array fold — the URL
    corpus is NEVER shuffled and gains no row keys (a groupBy-rowid +
    join-back design would both shuffle the corpus and stand on
    monotonically_increasing_id's non-determinism). Pure Catalyst;
    every step, including the tie-breaks, replays in ANSI SQL (the
    oracle re-derives the same winner with a plain join + argmax).
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
            )
        ).alias("__rules__")
    ).withColumnRenamed("domain", "__rdomain__")
    joined = urls.join(
        F.broadcast(packed),
        urls[domain_column] == packed["__rdomain__"],
        "left",
    )
    path = F.col(path_column)
    # Fold: keep the lexicographic max of (match length, is_allow)
    # over the rules whose prefix the path starts with; the (-1, 1)
    # seed makes "no matching rule" (and "no rules at all") allowed.
    best = F.aggregate(
        F.filter(
            F.coalesce(
                F.col("__rules__"),
                F.array().cast(
                    "array<struct<l:int,a:int,p:string>>"
                ),
            ),
            lambda r: path.startswith(r["p"]),
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
