"""Sitemap ingestion (frontier_engine/sitemaps.py): XML parse (urlset /
index / malformed), robots Sitemap: directives, gzip, distributed frames,
and composition with the priority frontier."""

from __future__ import annotations

import gzip

from frontier_engine import sitemaps
from pyspark.sql import functions as F

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(entries):
    rows = []
    for e in entries:
        parts = [f"<loc>{e['loc']}</loc>"]
        for k in ("lastmod", "changefreq", "priority"):
            if k in e:
                parts.append(f"<{k}>{e[k]}</{k}>")
        rows.append("<url>" + "".join(parts) + "</url>")
    return f'<?xml version="1.0"?><urlset {NS}>' + "".join(rows) + "</urlset>"


def test_parse_urlset_fields_and_normalization():
    xml = _urlset(
        [
            {"loc": "http://a.example/1", "lastmod": "2024-01-02", "changefreq": "Daily", "priority": "0.8"},
            {"loc": "http://a.example/2", "priority": "3.7"},   # out of range -> None
            {"loc": "http://a.example/3", "changefreq": "fortnightly"},  # bogus -> None
            {"loc": "  "},  # empty loc dropped
        ]
    )
    out = sitemaps.parse_sitemap(xml.encode())
    assert out["kind"] == "urlset"
    assert [r["loc"] for r in out["urls"]] == [f"http://a.example/{i}" for i in (1, 2, 3)]
    assert out["urls"][0]["changefreq"] == "daily" and out["urls"][0]["priority"] == 0.8
    assert out["urls"][1]["priority"] is None
    assert out["urls"][2]["changefreq"] is None


def test_parse_sitemapindex_and_gzip():
    idx = (
        f'<?xml version="1.0"?><sitemapindex {NS}>'
        "<sitemap><loc>http://a.example/s1.xml</loc></sitemap>"
        "<sitemap><loc>http://a.example/s2.xml.gz</loc><lastmod>2024-01-01</lastmod></sitemap>"
        "</sitemapindex>"
    )
    out = sitemaps.parse_sitemap(gzip.compress(idx.encode()))
    assert out["kind"] == "sitemapindex"
    assert out["sitemaps"] == ["http://a.example/s1.xml", "http://a.example/s2.xml.gz"]
    assert out["urls"] == []


def test_parse_malformed_and_wrong_root():
    assert sitemaps.parse_sitemap(b"<urlset><url><loc>x")["kind"] == "invalid"
    assert sitemaps.parse_sitemap(b"not xml at all")["kind"] == "invalid"
    assert sitemaps.parse_sitemap(b"<rss><channel/></rss>")["kind"] == "invalid"


def test_namespace_agnostic_parse():
    bare = "<urlset><url><loc>http://b.example/x</loc></url></urlset>"
    assert sitemaps.parse_sitemap(bare.encode())["urls"][0]["loc"] == "http://b.example/x"


def test_sitemaps_from_robots():
    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://h.example/sitemap.xml\n"
        "sitemap:   http://h.example/other.xml.gz\n"
        "# Sitemap: http://h.example/commented.xml is prose, not a directive line\n"
    )
    assert sitemaps.sitemaps_from_robots(txt) == [
        "http://h.example/sitemap.xml",
        "http://h.example/other.xml.gz",
    ]
    assert sitemaps.sitemaps_from_robots(None) == []


def test_parse_sitemap_frame_and_children(spark):
    s1 = _urlset([{"loc": "http://a.example/1", "priority": "0.9"}, {"loc": "http://a.example/2"}])
    idx = (
        f'<sitemapindex {NS}><sitemap><loc>http://a.example/s1.xml</loc></sitemap></sitemapindex>'
    )
    df = spark.createDataFrame(
        [
            ("http://a.example/s1.xml", s1.encode()),
            ("http://a.example/sitemap.xml", idx.encode()),
            ("http://bad.example/broken.xml", b"<oops"),
        ],
        "sitemap_url string, xml binary",
    )
    urls = sitemaps.parse_sitemap_frame(df)
    assert urls.count() == 2  # index + broken contribute no url rows
    kids = sitemaps.child_sitemaps(df).collect()
    assert [(r.parent, r.child) for r in kids] == [
        ("http://a.example/sitemap.xml", "http://a.example/s1.xml")
    ]


def test_seed_scores_max_merge_and_default(spark):
    rows = [
        ("s1", "http://a.example/page", None, None, 0.3),
        ("s2", "http://a.example/page", None, None, 0.9),   # same url: max wins
        ("s1", "http://a.example/other", None, None, None),  # spec default 0.5
    ]
    urls = spark.createDataFrame(rows, sitemaps.URL_SCHEMA)
    scores = {r.url_key: r.score for r in sitemaps.seed_scores_from_sitemaps(urls).collect()}
    assert len(scores) == 2
    assert 0.9 in scores.values() and 0.5 in scores.values()


def test_sitemap_priorities_drive_crawl_order(spark):
    """End-to-end: sitemap priorities feed run_crawl(seed_scores=...) and a
    quota-1 crawl fetches the high-priority URL first."""
    from frontier_engine import synth
    from frontier_engine.frontier import CrawlConfig, run_crawl
    from frontier_engine.schema import PAGES

    pages = spark.createDataFrame(synth.gen_pages(40), schema=PAGES)
    # three urls on ONE host so the per-host quota makes ordering observable
    from urllib.parse import urlsplit

    by_host: dict[str, list[str]] = {}
    for r in pages.select("url").distinct().collect():
        by_host.setdefault(urlsplit(r.url).netloc, []).append(r.url)
    host_urls = sorted(next(v for v in by_host.values() if len(v) >= 3))[:3]
    # seed order says host_urls[0] first, but the sitemap says the LAST is top
    xml = _urlset(
        [{"loc": host_urls[2], "priority": "1.0"}]
        + [{"loc": u, "priority": "0.1"} for u in host_urls[:2]]
    )
    sm = spark.createDataFrame([("http://x/sitemap.xml", xml.encode())], "sitemap_url string, xml binary")
    scores = sitemaps.seed_scores_from_sitemaps(sitemaps.parse_sitemap_frame(sm))
    res = run_crawl(
        spark,
        pages,
        host_urls,
        CrawlConfig(round_seconds=30.0, max_rounds=10, max_per_host_per_round=1),
        seed_scores=scores,
    )
    fetched = res.pages.select("url", "round").collect()
    by_url = {r.url: r.round for r in fetched}
    assert by_url[host_urls[2]] == min(by_url.values())  # top priority went first


def test_revisit_scores_scheduling(spark):
    """Freshness scheduling: changed-since-fetch and never-fetched hit the
    2x ceiling, overdue ratio accrues by changefreq, 'never' stays 0."""
    import datetime as dt

    base = dt.datetime(2024, 1, 10, 0, 0, 0)

    def u(k):
        return f"http://x.example/{k}"

    from frontier_engine.canonicalize import surt_key

    rows = [
        ("s", u("k_changed"), "2024-01-11T00:00:00", "daily", 1.0),   # lastmod AFTER fetch
        ("s", u("k_fresh_daily"), "2024-01-01T00:00:00", "daily", 1.0),
        ("s", u("k_overdue_daily"), None, "daily", 0.5),
        ("s", u("k_never"), "2024-01-01T00:00:00", "never", 1.0),
        ("s", u("k_capped"), None, "hourly", 1.0),                     # wildly overdue
        ("s", u("k_new"), None, None, 0.8),                            # never fetched
    ]
    sm = spark.createDataFrame(rows, sitemaps.URL_SCHEMA)
    # revisit_scores keys by surt_key(loc) — build last_fetch with the same keys
    lf = spark.createDataFrame(
        [(surt_key(u(k)), t) for k, t in
         [("k_changed", base), ("k_fresh_daily", base), ("k_overdue_daily", base),
          ("k_never", base), ("k_capped", base)]],
        "url_key string, fetch_ts timestamp",
    )
    # now = fetch + 36h: daily pages are 1.5 intervals overdue
    out = {r.url_key: r.score for r in
           sitemaps.revisit_scores(lf, sm, "2024-01-11 12:00:00").collect()}

    def s(k):
        return out[surt_key(u(k))]

    assert s("k_changed") == 2.0          # changed since fetch -> ceiling
    assert abs(s("k_overdue_daily") - 0.75) < 1e-9   # 1.5 overdue * prio 0.5
    assert abs(s("k_fresh_daily") - 1.5) < 1e-9      # interval path (lastmod older)
    assert s("k_never") == 0.0            # never + no new lastmod
    assert abs(s("k_capped") - 2.0) < 1e-9           # capped at 2 * prio 1.0
    assert abs(s("k_new") - 1.6) < 1e-9   # never fetched: 2 * prio 0.8
