"""Per-host politeness scheduling: robots gating + crawl-delay budgets +
salted window/rank priority queue.

The reference has no robots parser (grep: only meta-robots flag bits,
protocol.jr:31-38) and rate-limits at fetch time
(BandwidthUtils.java:158-207); per the north_rule this module lifts both
into the batch plan:

* robots gate — join the per-host rules table, drop candidates whose
  path matches a disallow prefix (pure Catalyst: ``exists(startswith)``);
* budget — ``max_fetches_per_round`` capped by
  ``round_duration_ms / crawl_delay_ms`` (the 1-second-window token
  budget of BandwidthUtils.checkRateLimit, generalized to a round);
* priority queue — deterministic total order
  ``(priority DESC, domain_hash, url_hash)`` ranked per host with
  **two-stage salted top-k**: stage 1 ranks within ``(host, salt)`` and
  keeps at most ``budget`` rows per salt, stage 2 ranks the survivors
  exactly per host.  Hot hosts (zipf head) therefore never serialize a
  single window partition; the result is identical to the unsalted rank
  because stage 1 only discards rows that could never make the top-k.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 10
DEFAULT_ROUND_MS = 60_000
PATH_RE = r"^[a-z]+://[^/]+(/.*)?$"


def parse_robots_txt(text: str | None, agent: str = "*") -> tuple[list[str], int | None]:
    """Minimal robots.txt parser → (disallow_prefixes, crawl_delay_ms).

    Honors the most-specific matching user-agent group (exact agent
    name beats ``*``), Disallow path prefixes (empty Disallow = allow
    all), and Crawl-delay seconds.  Feeds the per-host rules table.

    NOTE: this is the conservative *prefix-only* subset (no Allow, no
    '*'/'$' patterns) used by the synthetic frontier and its pure-Python
    replay oracle; hosts using Allow-exceptions or wildcards are
    over-blocked here.  For RFC 9309 semantics (Allow with
    longest-match precedence, '*' and '$' patterns) use
    ``parse_robots_rules`` + ``robots_rules_table`` + ``robots_allow_rfc``."""
    if not text:
        return [], None
    groups: dict[str, tuple[list[str], float | None]] = {}
    current: list[str] = []
    collecting = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            ua = value.lower()
            if not collecting:
                current = []
            current.append(ua)
            collecting = True
            for u in current:
                groups.setdefault(u, ([], None))
        elif key in ("disallow", "crawl-delay"):
            collecting = False
            for u in current:
                dis, delay = groups.get(u, ([], None))
                if key == "disallow":
                    if value:
                        dis = dis + [value]
                else:
                    try:
                        delay = float(value)
                    except ValueError:
                        pass
                groups[u] = (dis, delay)
    pick = groups.get(agent.lower()) or groups.get("*")
    if pick is None:
        return [], None
    dis, delay = pick
    return dis, int(delay * 1000) if delay is not None else None


def parse_robots_rules(
    text: str | None, agent: str = "*"
) -> tuple[list[tuple[str, bool]], int | None]:
    """RFC 9309 robots.txt parser → ([(pattern, is_allow)], crawl_delay_ms).

    Both Allow and Disallow lines are kept, in file order, with their raw
    path patterns ('*' any-sequence wildcard, '$' end anchor).  Matching
    precedence (longest pattern wins, tie → Allow) is applied at
    evaluation time by ``robots_allow_rfc`` / ``robots_decision``.
    Group selection matches parse_robots_txt: exact agent beats '*'."""
    if not text:
        return [], None
    groups: dict[str, tuple[list[tuple[str, bool]], float | None]] = {}
    current: list[str] = []
    collecting = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            ua = value.lower()
            if not collecting:
                current = []
            current.append(ua)
            collecting = True
            for u in current:
                groups.setdefault(u, ([], None))
        elif key in ("disallow", "allow", "crawl-delay"):
            collecting = False
            for u in current:
                rules, delay = groups.get(u, ([], None))
                if key == "crawl-delay":
                    try:
                        delay = float(value)
                    except ValueError:
                        pass
                elif value:  # empty Allow/Disallow matches nothing (RFC 9309 §2.2.2)
                    rules = rules + [(value, key == "allow")]
                groups[u] = (rules, delay)
    pick = groups.get(agent.lower()) or groups.get("*")
    if pick is None:
        return [], None
    rules, delay = pick
    return rules, int(delay * 1000) if delay is not None else None


def _pattern_to_regex(pattern: str) -> str:
    """Robots path pattern → anchored Java/Python-compatible regex:
    '*' → '.*', trailing '$' → end anchor, everything else literal."""
    import re as _re

    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    rx = "".join(".*" if c == "*" else _re.escape(c) for c in body)
    return "^" + rx + ("$" if anchored_end else "")


def robots_decision(path: str, rules: list[tuple[str, bool]]) -> bool:
    """Scalar RFC 9309 decision: True = allowed.  Longest matching
    pattern wins; equal lengths → Allow wins; no match → allowed."""
    import re as _re

    best_len = -1
    best_allow = True
    for pattern, is_allow in rules:
        if _re.match(_pattern_to_regex(pattern), path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and is_allow and not best_allow):
                best_len = plen
                best_allow = is_allow
    return best_allow


def robots_rules_table(
    df: DataFrame, host_col: str = "host", body_col: str = "robots_txt", agent: str = "*"
) -> DataFrame:
    """(host, robots_txt) rows → RFC 9309 rules table:
    (host, rules array<struct<rx,len,allow>>, crawl_delay_ms,
    max_fetches_per_round)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    rule_t = StructType(
        [
            StructField("rx", StringType()),
            StructField("len", IntegerType()),
            StructField("allow", BooleanType()),
        ]
    )
    schema = StructType(
        [
            StructField("rules", ArrayType(rule_t)),
            StructField("crawl_delay_ms", LongType()),
        ]
    )

    @pandas_udf(schema)
    def _parse(bodies: pd.Series) -> pd.DataFrame:
        out_rules, out_delay = [], []
        for b in bodies:
            rules, delay = parse_robots_rules(b, agent)
            out_rules.append(
                [
                    {"rx": _pattern_to_regex(p), "len": len(p), "allow": a}
                    for p, a in rules
                ]
            )
            out_delay.append(delay)
        return pd.DataFrame(
            {"rules": out_rules, "crawl_delay_ms": pd.array(out_delay, dtype="Int64")}
        )

    # one row per host is a hard invariant downstream: schedule_round's
    # gate join would fan candidates out (duplicate seen identities,
    # double-counted budgets) on a duplicate host row
    parsed = df.dropDuplicates([host_col]).withColumn("_r", _parse(F.col(body_col)))
    return parsed.select(
        F.col(host_col).alias("host"),
        F.col("_r.rules").alias("rules"),
        F.col("_r.crawl_delay_ms").alias("crawl_delay_ms"),
        F.lit(None).cast("int").alias("max_fetches_per_round"),
    )


def robots_allow_rfc(df: DataFrame, robots: DataFrame, broadcast_robots: bool = True) -> DataFrame:
    """RFC 9309 gate as a pure Catalyst higher-order-function fold:
    keep rows whose path's longest matching rule allows (tie → Allow;
    no rules / no match → allow)."""
    return (
        robots_gate_rfc(df, robots, broadcast_robots)
        .filter("robots_allowed")
        .drop("robots_allowed")
    )


def robots_table_from_fetches(df: DataFrame, host_col: str = "host", body_col: str = "robots_txt", agent: str = "*") -> DataFrame:
    """(host, robots_txt) rows → the politeness rules table shape."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("disallow_prefixes", ArrayType(StringType())),
            StructField("crawl_delay_ms", LongType()),
        ]
    )

    @pandas_udf(schema)
    def _parse(bodies: pd.Series) -> pd.DataFrame:
        rows = [parse_robots_txt(b, agent) for b in bodies]
        return pd.DataFrame(
            {
                "disallow_prefixes": [r[0] for r in rows],
                "crawl_delay_ms": pd.array([r[1] for r in rows], dtype="Int64"),
            }
        )

    # same one-row-per-host invariant as robots_rules_table
    parsed = df.dropDuplicates([host_col]).withColumn("_r", _parse(F.col(body_col)))
    return parsed.select(
        F.col(host_col).alias("host"),
        F.col("_r.disallow_prefixes").alias("disallow_prefixes"),
        F.col("_r.crawl_delay_ms").alias("crawl_delay_ms"),
        F.lit(None).cast("int").alias("max_fetches_per_round"),
    )


def with_host_and_path(df: DataFrame, canonical_col: str = "canonical_url") -> DataFrame:
    """Derive host and path columns from the canonical URL (Catalyst only).

    The path regex runs ONCE per row: the raw extract lands in its own
    projection and the empty→"/" default references that column.
    CollapseProject keeps non-cheap multiply-referenced aliases in
    their own project, so the plan evaluates one regexp_extract per
    output column (r4 plan audit showed the inline CASE form computing
    the path regex twice per candidate row)."""
    return (
        df.withColumn(
            "host", F.regexp_extract(F.col(canonical_col), r"^[a-z]+://(?:[^/@]*@)?([^/:?#]+)", 1)
        )
        .withColumn("_rawpath", F.regexp_extract(F.col(canonical_col), PATH_RE, 1))
        .withColumn(
            "path",
            F.when(F.length("_rawpath") > 0, F.col("_rawpath")).otherwise(F.lit("/")),
        )
        .drop("_rawpath")
    )


def robots_gate(df: DataFrame, robots: DataFrame, broadcast_robots: bool = True) -> DataFrame:
    """Join the rules table and add a ``robots_allowed`` flag (prefix
    subset; hosts without rules default-allow).  Callers split on the
    flag: allowed rows go to ranking, disallowed rows to the excluded
    set so they drain from the frontier."""
    r = robots.select("host", "disallow_prefixes", "crawl_delay_ms", "max_fetches_per_round")
    if broadcast_robots:
        r = F.broadcast(r)
    joined = df.join(r, "host", "left")
    disallowed = F.when(
        F.col("disallow_prefixes").isNotNull(),
        F.exists("disallow_prefixes", lambda p: F.col("path").startswith(p)),
    ).otherwise(F.lit(False))
    return joined.withColumn("robots_allowed", ~disallowed)


def robots_allow(df: DataFrame, robots: DataFrame, broadcast_robots: bool = True) -> DataFrame:
    """Filter out disallowed paths; hosts without rules default-allow."""
    return robots_gate(df, robots, broadcast_robots).filter("robots_allowed").drop("robots_allowed")


def with_budget(
    df: DataFrame,
    default_budget: int = DEFAULT_BUDGET,
    round_duration_ms: int = DEFAULT_ROUND_MS,
) -> DataFrame:
    """Effective per-host fetch budget for one round."""
    delay_cap = F.when(
        F.col("crawl_delay_ms").isNotNull() & (F.col("crawl_delay_ms") > 0),
        F.greatest(F.lit(1), (F.lit(round_duration_ms) / F.col("crawl_delay_ms")).cast("int")),
    )
    base = F.coalesce(F.col("max_fetches_per_round"), F.lit(default_budget))
    return df.withColumn("budget", F.least(base, F.coalesce(delay_cap, base)))


def rank_per_host(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Two-stage salted priority rank; output keeps rows with
    ``host_rank <= budget`` and carries the deterministic rank."""
    order = [F.desc("priority"), F.asc("domain_hash"), F.asc("url_hash")]
    salted = df.withColumn("salt", F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int"))
    w1 = Window.partitionBy("host", "salt").orderBy(*order)
    pruned = (
        salted.withColumn("salt_rank", F.row_number().over(w1))
        .filter(F.col("salt_rank") <= F.col("budget"))
        .drop("salt_rank", "salt")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        pruned.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= F.col("budget"))
    )


def topk_per_key(df: DataFrame, key_col: str, k: int, n_salts: int = 16) -> DataFrame:
    """Deterministic per-key top-k by the frontier total order
    (priority DESC, domain_hash, url_hash) using the same two-stage
    salted window as rank_per_host — hot keys never serialize one
    window partition, and the result equals the unsalted top-k.  Used
    for per-host frontier capping (priority eviction of queue
    blowups)."""
    order = [F.desc("priority"), F.asc("domain_hash"), F.asc("url_hash")]
    salted = df.withColumn("_salt", F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int"))
    w1 = Window.partitionBy(key_col, "_salt").orderBy(*order)
    pruned = (
        salted.withColumn("_sr", F.row_number().over(w1))
        .filter(F.col("_sr") <= k)
        .drop("_sr", "_salt")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        pruned.withColumn("_r", F.row_number().over(w2))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def robots_gate_rfc(df: DataFrame, robots: DataFrame, broadcast_robots: bool = True) -> DataFrame:
    """RFC 9309 flag variant of ``robots_gate`` over a ``rules`` table
    (see robots_rules_table): adds ``robots_allowed`` via the
    longest-match Catalyst fold."""
    r = robots.select("host", "rules", "crawl_delay_ms", "max_fetches_per_round")
    if broadcast_robots:
        r = F.broadcast(r)
    joined = df.join(r, "host", "left")
    allowed = F.expr(
        "rules IS NULL OR aggregate("
        "  filter(rules, x -> path rlike x.rx),"
        "  named_struct('len', -1, 'allow', true),"
        "  (acc, x) -> IF(x.len > acc.len OR (x.len = acc.len AND x.allow AND NOT acc.allow),"
        "               named_struct('len', x.len, 'allow', x.allow), acc)"
        ").allow"
    )
    return joined.withColumn("robots_allowed", allowed)


def process_round(
    candidates: DataFrame,
    robots: DataFrame,
    default_budget: int = DEFAULT_BUDGET,
    round_duration_ms: int = DEFAULT_ROUND_MS,
    n_salts: int = 16,
    broadcast_robots: bool = True,
    robots_mode: str = "prefix",
    layout_partitions: int | None = None,
) -> DataFrame:
    """schedule_round + robots retirement as ONE linear plan.

    Returns every candidate row DISPOSED this round: scheduled rows
    carry ``host_rank`` 1..budget, robots-retired rows carry
    ``host_rank`` NULL.  Allowed-but-over-budget rows are absent (they
    stay in the frontier).  Semantically identical to
    ``schedule_round(..., return_disallowed=True)`` followed by a
    union — but as a single pass: the two-branch union recomputes the
    whole gate+rank subtree per branch when its input isn't already
    materialized (the branches race the cache within one action).
    The trick is ranking within ``(host, robots_allowed)`` window
    partitions: allowed rows rank among themselves exactly as in
    rank_per_host, disallowed rows ride along and get their rank
    nulled at the end.  Same robots-table one-row-per-host invariant
    as schedule_round.

    ``layout_partitions``: when set (the frontier passes its partition
    count P), the FINAL rank's exchange hash-partitions by
    ``pmod(domain_hash, P)`` instead of by host — domain_hash is
    constant per host, so prefixing the window keys with the partition
    id leaves the rank groups (and therefore every output row)
    unchanged, while the output lands already clustered for the
    one-file-per-partition checkpoint write: the caller's separate
    layout Exchange disappears.  The salted stage-1 window keeps its
    own host/salt exchange, so hot hosts still spread across tasks."""
    df = with_host_and_path(candidates)
    if robots_mode == "rfc":
        gated = robots_gate_rfc(df, robots, broadcast_robots)
        rule_cols = ("rules", "crawl_delay_ms", "max_fetches_per_round")
    else:
        gated = robots_gate(df, robots, broadcast_robots)
        rule_cols = ("disallow_prefixes", "crawl_delay_ms", "max_fetches_per_round")
    budgeted = with_budget(gated, default_budget, round_duration_ms)
    allowed = F.col("robots_allowed")
    order = [F.desc("priority"), F.asc("domain_hash"), F.asc("url_hash")]
    salted = budgeted.withColumn(
        "salt", F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int")
    )
    w1 = Window.partitionBy("host", "robots_allowed", "salt").orderBy(*order)
    pruned = (
        salted.withColumn("salt_rank", F.row_number().over(w1))
        .filter(~allowed | (F.col("salt_rank") <= F.col("budget")))
        .drop("salt_rank", "salt")
    )
    if layout_partitions is not None:
        pid = F.pmod(F.col("domain_hash"), F.lit(layout_partitions)).cast("int")
        pruned = pruned.withColumn("_pid", pid).repartition(layout_partitions, "_pid")
        w2 = Window.partitionBy("_pid", "host", "robots_allowed").orderBy(*order)
    else:
        w2 = Window.partitionBy("host", "robots_allowed").orderBy(*order)
    ranked = (
        pruned.withColumn("rk", F.row_number().over(w2))
        .filter(~allowed | (F.col("rk") <= F.col("budget")))
    )
    if layout_partitions is not None:
        ranked = ranked.drop("_pid")
    return (
        ranked.withColumn("host_rank", F.when(allowed, F.col("rk")))
        .drop("rk", "robots_allowed", *rule_cols)
    )


def schedule_round(
    candidates: DataFrame,
    robots: DataFrame,
    default_budget: int = DEFAULT_BUDGET,
    round_duration_ms: int = DEFAULT_ROUND_MS,
    n_salts: int = 16,
    broadcast_robots: bool = True,
    return_disallowed: bool = False,
    robots_mode: str = "prefix",
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Full politeness gate: host/path → robots → budget → salted rank.

    Input needs (canonical_url, priority, domain_hash, url_hash);
    output adds host, path, budget, host_rank (the per-host fetch order).
    With ``return_disallowed`` also returns the robots-rejected rows so
    the frontier can retire them (they would otherwise be re-probed
    every round forever).  ``robots_mode``: "prefix" expects a
    disallow_prefixes table (the synthetic frontier's conservative
    subset), "rfc" expects a robots_rules_table (RFC 9309 Allow +
    wildcard semantics) — the rest of the plan is identical.

    INVARIANT: ``robots`` must have exactly one row per host (the
    constructors enforce this) — the gate join would otherwise fan out
    candidates into duplicate identities downstream."""
    df = with_host_and_path(candidates)
    if robots_mode == "rfc":
        gated = robots_gate_rfc(df, robots, broadcast_robots)
        rule_cols = ("rules", "crawl_delay_ms", "max_fetches_per_round")
    else:
        gated = robots_gate(df, robots, broadcast_robots)
        rule_cols = ("disallow_prefixes", "crawl_delay_ms", "max_fetches_per_round")
    allowed = gated.filter("robots_allowed").drop("robots_allowed")
    allowed = with_budget(allowed, default_budget, round_duration_ms)
    sched = rank_per_host(allowed, n_salts).drop(*rule_cols)
    if return_disallowed:
        disallowed = gated.filter(~F.col("robots_allowed")).drop("robots_allowed", *rule_cols)
        return sched, disallowed
    return sched
