"""Per-host politeness scheduling (SURVEY §2.7).

Reference behavior being generalized: a single sequential worker sleeping
``delay_between_requests × U(0.8,1.2)`` between fetches (scraper.py:97-101),
+2 s post-fetch (scraper.py:157), + loop delay (main.py:123) — i.e. a
per-HOST serial budget.  The engine never sleeps an executor: politeness is
*virtual time* — each crawl round represents ``round_seconds`` of wall time
and a host may fetch at most ``floor(round_seconds / crawl_delay)`` URLs in
it, scheduled at slots ``i * crawl_delay``.  Ordering inside a host is the
frontier priority (score desc, then seed_index, then url_key — deterministic
under any partitioning, SURVEY §7.4).

robots.txt: the reference has NONE (P7) — parity mode is allow-all.  Engine
mode evaluates serialized deny-prefix rules from the ``host_policy`` table
(broadcast join; the policy table is tiny relative to the frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY = 3.0  # config.yaml:4


def join_host_policy(frontier: DataFrame, host_policy: DataFrame | None) -> DataFrame:
    """Broadcast-join the per-host policy; unknown hosts get the reference
    default delay and allow-all rules."""
    if host_policy is None:
        return frontier.withColumn("crawl_delay", F.lit(DEFAULT_CRAWL_DELAY)).withColumn(
            "robots_rules", F.lit("")
        )
    return frontier.join(F.broadcast(host_policy), "host", "left").fillna(
        {"crawl_delay": DEFAULT_CRAWL_DELAY, "robots_rules": ""}
    )


def robots_blocked_col(url_col: str = "url"):
    """Boolean Column: URL path starts with a deny prefix in
    ``robots_rules`` (NEWLINE-separated: a comma is legal inside a URL path
    and would split one deny prefix into two bogus ones — ADVICE r2; a raw
    newline cannot survive a robots.txt line value).  Native expressions
    only: the rules column is exploded lazily via ``exists`` over a split
    array — no UDF.  Exposed as a COLUMN (not just a filter) so the round
    loop can compute allowed and blocked rows from ONE frame instead of
    subtracting two copies of the candidate lineage."""
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    denies = F.filter(F.split(F.coalesce(F.col("robots_rules"), F.lit("")), "\n"), lambda d: d != "")
    return F.coalesce(F.exists(denies, lambda d: path.startswith(d)), F.lit(False))


def robots_allowed(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Rows of ``df`` not blocked by :func:`robots_blocked_col`."""
    return df.filter(~robots_blocked_col(url_col))


def parse_robots_policy(
    robots: DataFrame, text_col: str = "robots_txt", agent: str = "*"
) -> DataFrame:
    """(host, robots_txt) → host_policy rows (host, robots_rules,
    crawl_delay): the standard robots.txt group parse (RFC 9309-lite) for
    ``agent``, preferring an exact user-agent group over the ``*`` group.

    Output feeds ``join_host_policy``/``robots_allowed`` unchanged:
    Disallow path prefixes NEWLINE-joined (commas are legal in paths; empty
    Disallow = allow-all and is dropped), Crawl-delay honored when present,
    else the reference default.

    Engine shape: robots.txt is per HOST — a dim table even at web scale —
    so an Arrow-batched pandas UDF is the right tool here (stateful
    line-group parsing; the FRONTIER never passes through Python).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    target = agent.lower()

    def parse_one(text: str | None) -> tuple[str, float]:
        if not text:
            return "", DEFAULT_CRAWL_DELAY
        groups: list[tuple[list[str], list[str], float | None]] = []  # (agents, denies, delay)
        cur_agents: list[str] = []
        cur_denies: list[str] = []
        cur_delay: float | None = None
        last_was_agent = False

        def flush():
            nonlocal cur_agents, cur_denies, cur_delay
            if cur_agents:
                groups.append((cur_agents, cur_denies, cur_delay))
            cur_agents, cur_denies, cur_delay = [], [], None

        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if not last_was_agent:
                    flush()
                cur_agents.append(value.lower())
                last_was_agent = True
                continue
            last_was_agent = False
            if field == "disallow" and value:
                cur_denies.append(value)
            elif field == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
        flush()
        exact = [g for g in groups if target in g[0]]
        star = [g for g in groups if "*" in g[0]]
        chosen = exact or star
        if not chosen:
            return "", DEFAULT_CRAWL_DELAY
        denies = [d for g in chosen for d in g[1]]
        delays = [g[2] for g in chosen if g[2] is not None]
        return "\n".join(denies), (delays[0] if delays else DEFAULT_CRAWL_DELAY)

    # struct-returning scalar pandas UDF: no type hints (the hint resolver
    # rejects Series → DataFrame; the untyped form dispatches correctly)
    @pandas_udf("struct<robots_rules:string,crawl_delay:double>")
    def parse_udf(texts):
        parsed = [parse_one(t) for t in texts]
        return pd.DataFrame(parsed, columns=["robots_rules", "crawl_delay"])

    return robots.select(
        "host", parse_udf(F.col(text_col)).alias("p")
    ).select("host", F.col("p.robots_rules").alias("robots_rules"), F.col("p.crawl_delay").alias("crawl_delay"))


def rank_and_quota(
    candidates: DataFrame,
    round_seconds: float,
    max_per_host: int | None = None,
) -> DataFrame:
    """Window-rank candidates per host and keep the politeness quota.

    Appends:
      host_rank  — 1-based fetch position within the host this round
      slot_ts    — virtual offset (seconds) inside the round = (rank-1)*delay

    Quota = floor(round_seconds / crawl_delay), min 1, optionally capped.
    One shuffle on host; skew is defused upstream by the salted repartition
    (frontier.py) and bounded anyway: a hot host can't exceed its quota.
    """
    w = Window.partitionBy("host").orderBy(
        F.col("score").desc(),
        F.col("seed_index").asc_nulls_last(),
        F.col("url_key").asc(),
    )
    quota = F.greatest(F.floor(F.lit(round_seconds) / F.col("crawl_delay")), F.lit(1))
    if max_per_host is not None:
        quota = F.least(quota, F.lit(max_per_host))
    return (
        candidates.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= quota)
        .withColumn("slot_ts", (F.col("host_rank") - 1) * F.col("crawl_delay"))
    )


def salted_repartition(df: DataFrame, n_partitions: int, salt_buckets: int = 8) -> DataFrame:
    """P10 — host-keyed repartition with a salt term so one hot host spreads
    over ``salt_buckets`` tasks instead of pinning one executor.  Politeness
    is already enforced by rank_and_quota (order/slots assigned BEFORE the
    salt), so splitting a host across tasks never violates its delay budget."""
    return df.repartition(
        n_partitions, F.col("host"), F.pmod(F.xxhash64(F.col("url_key")), F.lit(salt_buckets))
    )
