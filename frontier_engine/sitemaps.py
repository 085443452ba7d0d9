"""Sitemap ingestion (sitemaps.org XML protocol) — the third seeding path
a real crawler has beside seed lists (S1/S2) and link discovery (J2/J4):
`robots.txt` advertises sitemap URLs, sitemap INDEX files fan out to urlset
files, and urlsets carry per-URL `lastmod` / `changefreq` / `priority`
hints that map directly onto the engine's priority frontier
(`frontier.with_priority` / `run_crawl(seed_scores=...)`).

Reference parity note: the reference scraper takes explicit seed lists only
(src/main.py seed handling) and never reads sitemaps; this module is a
beyond-reference addition in the same spirit as the WARC source — the
ingest surfaces a production crawl actually has.

Parsing is namespace-agnostic (matches element LOCAL names), tolerant of
malformed XML (a file that fails to parse yields zero rows, mirroring the
WARC parser's skip-and-continue posture), and gzip-sniffing
(`sitemap.xml.gz` is ubiquitous).  Like robots.txt, sitemaps are per-HOST
dim data — parse via Arrow-batched ``mapInPandas``; the frontier itself
never passes through Python.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd  # noqa: F401  (module-level for pandas_udf hint resolution)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frontier_engine.warc import maybe_gunzip

URL_SCHEMA = (
    "sitemap_url string, loc string, lastmod string, changefreq string,"
    " priority double"
)
_CHANGEFREQS = {"always", "hourly", "daily", "weekly", "monthly", "yearly", "never"}
_SITEMAP_LINE = re.compile(r"^\s*sitemap\s*:\s*(\S+)\s*$", re.I | re.M)


def _local(tag: str) -> str:
    """'{http://www.sitemaps.org/...}loc' → 'loc' (namespace-agnostic)."""
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(data: bytes) -> dict:
    """Parse one sitemap blob (gzip-sniffed).

    Returns ``{"kind": "urlset"|"sitemapindex"|"invalid", "urls": [...],
    "sitemaps": [...]}`` — ``urls`` rows are dicts (loc, lastmod,
    changefreq, priority); ``sitemaps`` is the child-sitemap loc list of
    an index file.  Unparseable XML → ``kind="invalid"``, zero rows (the
    skip-and-continue posture; a crawler must not die on one bad host).
    Out-of-spec values are normalized: unknown changefreq → None,
    non-numeric or out-of-range priority → None.
    """
    out: dict = {"kind": "invalid", "urls": [], "sitemaps": []}
    try:
        root = ET.fromstring(maybe_gunzip(data))
    except (ET.ParseError, OSError, ValueError):
        return out
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return out
    out["kind"] = kind
    for child in root:
        name = _local(child.tag)
        if kind == "sitemapindex" and name == "sitemap":
            loc = next((c.text for c in child if _local(c.tag) == "loc"), None)
            if loc and loc.strip():
                out["sitemaps"].append(loc.strip())
        elif kind == "urlset" and name == "url":
            row = {"loc": None, "lastmod": None, "changefreq": None, "priority": None}
            for c in child:
                cn = _local(c.tag)
                if cn in row and c.text is not None:
                    row[cn] = c.text.strip()
            if not row["loc"]:
                continue
            if row["changefreq"] is not None:
                row["changefreq"] = row["changefreq"].lower()
                if row["changefreq"] not in _CHANGEFREQS:
                    row["changefreq"] = None
            if row["priority"] is not None:
                try:
                    p = float(row["priority"])
                    row["priority"] = p if 0.0 <= p <= 1.0 else None
                except ValueError:
                    row["priority"] = None
            out["urls"].append(row)
    return out


def sitemaps_from_robots(robots_txt: str | None) -> list[str]:
    """`Sitemap:` directives from a robots.txt body (case-insensitive,
    outside any user-agent group per RFC 9309 §2.3 / sitemaps.org)."""
    if not robots_txt:
        return []
    return [m.group(1) for m in _SITEMAP_LINE.finditer(robots_txt)]


def parse_sitemap_frame(
    df: DataFrame, url_col: str = "sitemap_url", bytes_col: str = "xml"
) -> DataFrame:
    """(sitemap url, xml blob) rows → one row per ``<url>`` entry
    (URL_SCHEMA).  Index files contribute no url rows here — resolve them
    with :func:`child_sitemaps` first (fetch loop at the driver: the
    index fan-out is per-host-sized, never corpus-sized)."""

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("sitemap_url", "loc", "lastmod", "changefreq", "priority")}
            for u, blob in zip(pdf[url_col], pdf[bytes_col]):
                for r in parse_sitemap(bytes(blob))["urls"]:
                    rows["sitemap_url"].append(u)
                    for k in ("loc", "lastmod", "changefreq", "priority"):
                        rows[k].append(r[k])
            if rows["sitemap_url"]:
                out = pd.DataFrame(rows)
                out["priority"] = out["priority"].astype("float64")
                yield out

    return df.select(F.col(url_col).alias(url_col), F.col(bytes_col).alias(bytes_col)).mapInPandas(
        gen, URL_SCHEMA
    )


def child_sitemaps(df: DataFrame, url_col: str = "sitemap_url", bytes_col: str = "xml") -> DataFrame:
    """(sitemap url, xml blob) rows → (parent, child) rows for index
    files — the driver-side fan-out loop fetches children and feeds them
    back through :func:`parse_sitemap_frame`."""

    def gen(batches):
        for pdf in batches:
            parents, children = [], []
            for u, blob in zip(pdf[url_col], pdf[bytes_col]):
                for c in parse_sitemap(bytes(blob))["sitemaps"]:
                    parents.append(u)
                    children.append(c)
            if parents:
                yield pd.DataFrame({"parent": parents, "child": children})

    return df.select(F.col(url_col), F.col(bytes_col)).mapInPandas(
        gen, "parent string, child string"
    )


DISCOVERY_SCHEMA = "loc string, priority double, kind string"


def discovered_from_pages(
    pages: DataFrame, url_col: str = "url", bytes_col: str = "html"
) -> DataFrame:
    """Mid-crawl discovery (``run_crawl(discover_sitemaps=True)``): fetched
    robots.txt bodies yield their ``Sitemap:`` directives and fetched
    sitemap XML yields child sitemaps / urlset entries — the production
    discovery chain (robots → sitemapindex → urlset → pages) running
    INSIDE the crawl loop instead of via a CLI side door.

    Output rows (``DISCOVERY_SCHEMA``): ``kind='sitemap'`` for a sitemap
    URL to fetch next (from a robots directive or an index file, priority
    NULL), ``kind='page'`` for a content URL from a urlset (priority = the
    declared value or NULL).  Rows whose body is neither a robots file
    (recognized by URL path) nor parseable sitemap XML yield nothing —
    the skip-and-continue posture; a prefilter upstream (run_crawl) keeps
    ordinary HTML out of this Arrow-batched pass, so at scale the UDF
    touches per-host-sized dim pages, never the corpus."""
    robots_re = re.compile(r"^https?://[^/]+/robots\.txt(\?.*)?$", re.I)

    def gen(batches):
        for pdf in batches:
            locs, prios, kinds = [], [], []
            for u, blob in zip(pdf[url_col], pdf[bytes_col]):
                if blob is None:
                    continue
                if robots_re.match(u or ""):
                    body = bytes(blob).decode("utf-8", errors="replace")
                    for sm in sitemaps_from_robots(body):
                        locs.append(sm)
                        prios.append(None)
                        kinds.append("sitemap")
                    continue
                parsed = parse_sitemap(bytes(blob))
                for child in parsed["sitemaps"]:
                    locs.append(child)
                    prios.append(None)
                    kinds.append("sitemap")
                for r in parsed["urls"]:
                    locs.append(r["loc"])
                    prios.append(r["priority"])
                    kinds.append("page")
            if locs:
                out = pd.DataFrame({"loc": locs, "priority": prios, "kind": kinds})
                out["priority"] = out["priority"].astype("float64")
                yield out

    return pages.select(F.col(url_col).alias(url_col), F.col(bytes_col).alias(bytes_col)).mapInPandas(
        gen, DISCOVERY_SCHEMA
    )


def seed_scores_from_sitemaps(urls: DataFrame, default_priority: float = 0.5) -> DataFrame:
    """Sitemap url rows → a ``(url_key, score)`` priority table for
    ``run_crawl(seed_scores=...)``: score = sitemap ``priority`` (spec
    default 0.5 when absent), max-merged across sitemaps that list the
    same URL.  Canonicalization matches the frontier's own key so the
    broadcast join in ``with_priority`` lines up."""
    from frontier_engine.canonicalize import surt_key_udf

    keyed = urls.select(F.col("loc").alias("url"), "priority").withColumn(
        "url_key", surt_key_udf("url")
    )
    return (
        keyed.filter(F.col("url_key").isNotNull())
        .groupBy("url_key")
        .agg(
            F.max(F.coalesce(F.col("priority"), F.lit(float(default_priority)))).alias(
                "score"
            )
        )
    )


# seconds per nominal change interval (sitemaps.org changefreq values);
# "always" is treated as hourly for scheduling purposes, "never" never
# becomes due on interval alone (only a newer lastmod can resurrect it)
_FREQ_SECONDS = {
    "always": 3600.0,
    "hourly": 3600.0,
    "daily": 86400.0,
    "weekly": 604800.0,
    "monthly": 2592000.0,
    "yearly": 31536000.0,
}


def revisit_scores(
    last_fetch: DataFrame,
    sitemap_urls: DataFrame,
    now_ts: str,
    default_changefreq: str = "weekly",
    default_priority: float = 0.5,
) -> DataFrame:
    """Recrawl scheduling — the freshness half of frontier prioritization
    (Cho & Garcia-Molina 2000: revisit frequency should track change
    frequency).  Combines the crawl's own state with the host's declared
    change hints into a ``(url_key, score)`` table for
    ``run_crawl(seed_scores=...)``.

    Inputs: ``last_fetch`` = (url_key, fetch_ts) — one row per known URL
    (e.g. ``max(fetch_ts) groupBy url_key`` over crawl result pages);
    ``sitemap_urls`` = URL_SCHEMA rows from :func:`parse_sitemap_frame`.
    ``now_ts`` is an explicit ISO timestamp string — deterministic by
    construction, no wall-clock read.

    Score (higher = fetch sooner, scaled by sitemap priority):

    * ``lastmod`` after our last fetch ⇒ the page CHANGED since we saw
      it: score = 2 × priority (the ceiling — hard evidence beats any
      interval heuristic).
    * else: overdue ratio = elapsed-since-fetch / changefreq interval,
      capped at 2 (a year-overdue daily page shouldn't starve everything
      else); ``never`` pages score 0 on interval alone.
    * URLs the sitemap lists but we NEVER fetched score 2 × priority
      (discovery beats refresh at equal priority).

    Scale: both sides are url_key tables (KBs/row); one equi-join on
    url_key + column math — no windows, no UDFs, partial-agg max-merge on
    the sitemap side.  At 10^10 URLs this is exactly the shape of the
    bucketed seen store (seen.py): join bucket-to-bucket, shuffle-free.
    """
    from frontier_engine.canonicalize import surt_key_udf

    sm = (
        sitemap_urls.withColumn("url_key", surt_key_udf(F.col("loc")))
        .filter(F.col("url_key").isNotNull())
        .groupBy("url_key")
        .agg(
            F.max(F.to_timestamp("lastmod")).alias("lastmod_ts"),
            F.max(F.coalesce(F.col("priority"), F.lit(float(default_priority)))).alias(
                "prio"
            ),
            # most-demanding declared interval wins (min seconds)
            F.min(
                F.coalesce(
                    *[
                        F.when(F.col("changefreq") == k, F.lit(v))
                        for k, v in _FREQ_SECONDS.items()
                    ],
                    F.when(F.col("changefreq") == "never", F.lit(float("inf"))),
                    F.lit(_FREQ_SECONDS[default_changefreq]),
                )
            ).alias("interval_sec"),
        )
    )
    lf = last_fetch.select("url_key", F.col("fetch_ts").cast("timestamp").alias("fetch_ts"))
    now = F.to_timestamp(F.lit(now_ts))
    joined = sm.join(lf, "url_key", "left")
    elapsed = F.unix_timestamp(now) - F.unix_timestamp(F.col("fetch_ts"))
    overdue = F.least(elapsed / F.col("interval_sec"), F.lit(2.0))
    score = (
        F.when(F.col("fetch_ts").isNull(), F.lit(2.0))  # never fetched
        .when(
            F.col("lastmod_ts").isNotNull() & (F.col("lastmod_ts") > F.col("fetch_ts")),
            F.lit(2.0),
        )  # changed since last fetch
        .otherwise(F.greatest(overdue, F.lit(0.0)))
    )
    return joined.select("url_key", (score * F.col("prio")).alias("score"))
