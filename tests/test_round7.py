"""Round-7 regressions (VERDICT r6 #2/#3/#4).

* trap_detection composed THROUGH run_crawl (the url_template_stats
  docstring promised anti-join composition; now `trap_templates=` is a
  first-class run_crawl input): a planted calendar-trap host's templated
  URLs leave the frontier while its real pages and every other host
  proceed, and a no-op trap table leaves the crawl byte-identical.
* mid-crawl sitemap discovery from corpus-served robots.txt /
  sitemap.xml pages (`discover_sitemaps=`): a URL reachable ONLY via a
  discovered sitemap is fetched, with its sitemap priority honored.
* host_quality streaming twin (stream == batch identity + resume).
"""

from urllib.parse import urlsplit

import pytest

import pyspark.sql.functions as F

from frontier_engine import textops
from frontier_engine.frontier import CrawlConfig, run_crawl
from frontier_engine.schema import PAGES


def _page(url: str, body: str = "<p>x</p>") -> dict:
    return {
        "url": url,
        "warc_ts": None,
        "html": f"<html><body>{body}</body></html>".encode(),
        "text": None,
        "lang": None,
    }


TRAP_HOST = "trap.example.com"
GOOD_HOST = "good.example.com"
TRAP_URLS = [f"https://{TRAP_HOST}/cal/2024/01/{i}" for i in range(30)]
TRAP_REAL = [f"https://{TRAP_HOST}/{p}" for p in ("about", "contact", "team")]
GOOD_URLS = [f"https://{GOOD_HOST}/article/{i}" for i in range(10)]


@pytest.fixture(scope="module")
def trap_corpus(spark):
    rows = [_page(u) for u in TRAP_URLS + TRAP_REAL + GOOD_URLS]
    return spark.createDataFrame(rows, schema=PAGES).cache()


def _trap_stats(spark, urls, threshold=20):
    frame = spark.createDataFrame(
        [(urlsplit(u).hostname, urlsplit(u).path) for u in urls], "host string, path string"
    )
    return textops.url_template_stats(frame, trap_threshold=threshold)


def test_trap_templates_drop_through_crawl(spark, trap_corpus):
    """Flagged (host, template) candidates never fetch, leave the frontier
    permanently (drain check can terminate), and do NOT take down the trap
    host's real pages or any other host."""
    seeds = TRAP_URLS + TRAP_REAL + GOOD_URLS  # trap urls FIRST in seed order
    stats = _trap_stats(spark, seeds)
    # sanity on the fixture: exactly one flagged template, the calendar one
    flagged = stats.filter("is_trap").collect()
    assert [(r["host"], r["template"]) for r in flagged] == [(TRAP_HOST, "/cal/N/N/N")]
    res = run_crawl(
        spark,
        trap_corpus,
        seeds,
        CrawlConfig(round_seconds=1e9, max_rounds=10, n_partitions=4),
        trap_templates=stats,
    )
    fetched = {r["url"] for r in res.pages.select("url").collect()}
    assert fetched == set(TRAP_REAL + GOOD_URLS)
    # trap rows are OUT of the frontier, not parked as pending forever
    assert res.frontier.filter(F.col("status").isin("pending", "retry")).count() == 0


def test_trap_gate_frees_quota_slots(spark, trap_corpus):
    """Under max_per_host_per_round=1 the trap URLs sit first in seed order,
    so ungated they win every one of the trap host's quota slots; gated,
    those slots go to the host's real pages while other hosts proceed
    identically."""
    seeds = TRAP_URLS + TRAP_REAL + GOOD_URLS
    cfg = CrawlConfig(
        round_seconds=1e9, max_rounds=3, max_per_host_per_round=1, n_partitions=4
    )
    ungated = run_crawl(spark, trap_corpus, seeds, cfg)
    trap_fetched = [
        r["url"] for r in ungated.pages.filter(F.col("host") == TRAP_HOST).collect()
    ]
    assert all(u.startswith(f"https://{TRAP_HOST}/cal/") for u in trap_fetched)
    gated = run_crawl(
        spark, trap_corpus, seeds, cfg, trap_templates=_trap_stats(spark, seeds)
    )
    assert {
        r["url"] for r in gated.pages.filter(F.col("host") == TRAP_HOST).collect()
    } == set(TRAP_REAL)
    # other hosts unaffected by the gate
    assert (
        gated.pages.filter(F.col("host") == GOOD_HOST).count()
        == ungated.pages.filter(F.col("host") == GOOD_HOST).count()
        == 3
    )


SM_HOST = "site.example.com"


def _sm(path: str) -> str:
    return f"https://{SM_HOST}{path}"


_ROBOTS_BODY = (
    "User-agent: *\nDisallow: /private\n"
    f"Sitemap: {_sm('/sitemap-index.xml')}\n"
)
_INDEX_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    f"<sitemap><loc>{_sm('/sitemap-a.xml')}</loc></sitemap>"
    "</sitemapindex>"
)
_URLSET_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    f"<url><loc>{_sm('/hidden/high')}</loc><priority>0.9</priority></url>"
    f"<url><loc>{_sm('/hidden/low')}</loc><priority>0.2</priority></url>"
    f"<url><loc>{_sm('/home')}</loc></url>"
    "</urlset>"
)


@pytest.fixture(scope="module")
def sitemap_corpus(spark):
    def raw(url, body):
        return {"url": url, "warc_ts": None, "html": body.encode(), "text": None, "lang": None}

    rows = [
        raw(_sm("/robots.txt"), _ROBOTS_BODY),
        raw(_sm("/sitemap-index.xml"), _INDEX_XML),
        raw(_sm("/sitemap-a.xml"), _URLSET_XML),
        _page(_sm("/start")),
        _page(_sm("/hidden/high")),
        _page(_sm("/hidden/low")),
        _page(_sm("/home")),
    ]
    return spark.createDataFrame(rows, schema=PAGES).cache()


def test_sitemap_discovery_mid_crawl(spark, sitemap_corpus):
    """The full production chain inside run_crawl: auto-enqueued robots.txt
    → Sitemap: directive → sitemapindex → urlset → content pages.  Under
    quota-1 the fetch sequence is fully determined by the discovery
    scores (robots 2.0 > sitemaps 1.5 > seed 1.0 > urlset priorities
    0.9/0.5/0.2), so the exact order IS the assertion: the hidden pages —
    reachable ONLY via the discovered sitemap — arrive in priority order."""
    from frontier_engine.frontier import fetch_order

    res = run_crawl(
        spark,
        sitemap_corpus,
        [_sm("/start")],
        CrawlConfig(
            round_seconds=1e9,
            max_rounds=12,
            max_per_host_per_round=1,
            n_partitions=4,
            discover_sitemaps=True,
        ),
    )
    order = [r["url"] for r in fetch_order(res.pages).collect()]
    assert order == [
        _sm("/robots.txt"),
        _sm("/sitemap-index.xml"),
        _sm("/sitemap-a.xml"),
        _sm("/start"),
        _sm("/hidden/high"),
        _sm("/home"),
        _sm("/hidden/low"),
    ]
    assert res.frontier.filter(F.col("status").isin("pending", "retry")).count() == 0


def test_sitemap_discovery_off_by_default(spark, sitemap_corpus):
    """Without the flag, only the explicit seed is fetched — sitemap-only
    URLs stay invisible and no robots row is injected (P8 parity)."""
    res = run_crawl(
        spark,
        sitemap_corpus,
        [_sm("/start")],
        CrawlConfig(round_seconds=1e9, max_rounds=5, n_partitions=4),
    )
    assert [r["url"] for r in res.pages.select("url").collect()] == [_sm("/start")]


def test_trap_gate_noop_table_is_byte_identical(spark, trap_corpus):
    """A trap table that flags NOTHING must leave the crawl byte-identical
    to the no-table run — the gate's join machinery may not perturb fetch
    order (P8 parity composition)."""
    from frontier_engine.frontier import fetch_order

    seeds = TRAP_URLS + TRAP_REAL + GOOD_URLS
    cfg = CrawlConfig(round_seconds=1e9, max_rounds=4, max_per_host_per_round=2, n_partitions=4)
    base = run_crawl(spark, trap_corpus, seeds, cfg)
    noop_stats = _trap_stats(spark, seeds, threshold=10_000)  # nothing flags
    gated = run_crawl(spark, trap_corpus, seeds, cfg, trap_templates=noop_stats)
    assert [tuple(r) for r in fetch_order(base.pages).collect()] == [
        tuple(r) for r in fetch_order(gated.pages).collect()
    ]


def test_sitemap_discovery_gzip_and_cross_host(spark):
    """The prefilter's URL branch must catch .xml.gz sitemaps whose BYTES
    sniff as binary (no '<?xml' prefix), and a robots Sitemap: directive
    may point at ANOTHER host (common CDN layout) — both paths feed the
    same frontier.  The gz sitemap carries the only route to /deep."""
    import gzip

    host2 = "cdn.example.net"
    robots = f"User-agent: *\nSitemap: https://{host2}/maps/sitemap-1.xml.gz\n"
    urlset = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<url><loc>https://{SM_HOST}/deep</loc><priority>0.7</priority></url>"
        "</urlset>"
    )
    rows = [
        {"url": _sm("/robots.txt"), "warc_ts": None, "html": robots.encode(), "text": None, "lang": None},
        {
            "url": f"https://{host2}/maps/sitemap-1.xml.gz",
            "warc_ts": None,
            "html": gzip.compress(urlset.encode()),
            "text": None,
            "lang": None,
        },
        _page(_sm("/start")),
        _page(_sm("/deep")),
    ]
    corpus = spark.createDataFrame(rows, schema=PAGES)
    res = run_crawl(
        spark,
        corpus,
        [_sm("/start")],
        CrawlConfig(
            round_seconds=1e9, max_rounds=10, max_per_host_per_round=1,
            n_partitions=4, discover_sitemaps=True,
        ),
    )
    got = {r["url"] for r in res.pages.select("url").collect()}
    assert _sm("/deep") in got, got
    # the cross-host gz sitemap itself was fetched (it lives on host2)
    assert f"https://{host2}/maps/sitemap-1.xml.gz" in got


RB_HOST = "ruled.example.com"


def _rb(path: str) -> str:
    return f"https://{RB_HOST}{path}"


@pytest.fixture(scope="module")
def robots_corpus(spark):
    robots = "User-agent: *\nDisallow: /private\nCrawl-delay: 5\n"
    rows = [
        {"url": _rb("/robots.txt"), "warc_ts": None, "html": robots.encode(), "text": None, "lang": None},
        _page(_rb("/public/a")),
        _page(_rb("/public/b")),
        _page(_rb("/public/c")),
        _page(_rb("/public/d")),
        _page(_rb("/private/secret")),
    ]
    return spark.createDataFrame(rows, schema=PAGES).cache()


def test_learned_robots_rules_block_next_round(spark, robots_corpus):
    """learn_robots_policy + honor_robots: the Disallow learned from the
    corpus-served robots.txt must keep /private out of the crawl — it is
    seeded explicitly, survives round 0 only because the policy is not
    yet known, and leaves the frontier permanently once learned.  The
    loop must still drain."""
    seeds = [_rb("/private/secret"), _rb("/public/a"), _rb("/public/b")]
    res = run_crawl(
        spark,
        robots_corpus,
        seeds,
        CrawlConfig(
            round_seconds=1e9,
            max_rounds=10,
            max_per_host_per_round=1,  # round 0 fetches ONLY robots.txt
            n_partitions=4,
            learn_robots_policy=True,
            honor_robots=True,
        ),
    )
    got = {r["url"] for r in res.pages.select("url").collect()}
    assert got == {_rb("/robots.txt"), _rb("/public/a"), _rb("/public/b")}
    assert res.frontier.filter(F.col("status").isin("pending", "retry")).count() == 0


def test_learned_crawl_delay_reshapes_quota(spark, robots_corpus):
    """The learned Crawl-delay: 5 must shrink the host's per-round quota
    from the NEXT round: round_seconds=10 gives floor(10/3)=3 slots under
    the default delay (round 0: robots + two pages), then floor(10/5)=2
    (rounds 1-2).  The per-round fetch counts ARE the assertion."""
    from collections import Counter

    seeds = [_rb(f"/public/{p}") for p in "abcd"]
    res = run_crawl(
        spark,
        robots_corpus,
        seeds,
        CrawlConfig(
            round_seconds=10.0,
            max_rounds=10,
            n_partitions=4,
            learn_robots_policy=True,
        ),
    )
    per_round = Counter(r["round"] for r in res.pages.select("round").collect())
    assert per_round == {0: 3, 1: 2}, per_round
    assert res.pages.count() == 5  # robots + all four pages


def test_quality_classifier_map_only_and_order_sensitive(spark):
    """The hashed linear classifier must be a single map-side projection
    (no Exchange in the optimized plan — the 100 TB gate shape) and the
    bigram features must actually contribute: permuting a doc's tokens
    changes its score (unigrams alone would be permutation-invariant)."""
    d = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "delta gamma beta alpha"), (3, "")],
        "doc_id long, text string",
    )
    out = textops.quality_classifier(d)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = {r.doc_id: r for r in out.collect()}
    # same multiset of tokens, different order → same n_features but
    # different bigrams, hence different score
    assert rows[1].n_features == rows[2].n_features == 7
    assert rows[1].score_permille != rows[2].score_permille
    # empty text: split('') = [''] on both engines — one unigram feature
    assert rows[3].n_features == 1
    assert 0 <= rows[3].score_permille <= 1000


def test_quality_classifier_xxhash_variant(spark):
    """The production-hash variant (use_xxhash=True, no md5 parity — 4.9×
    faster per token, SCALE.md): same schema, same feature counts (the
    tokenization is shared; only the weight values differ), still
    map-only, and deterministic across invocations."""
    d = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "delta gamma beta alpha")],
        "doc_id long, text string",
    )
    out = textops.quality_classifier(d, use_xxhash=True)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r.doc_id: r for r in out.collect()}
    md5_rows = {r.doc_id: r for r in textops.quality_classifier(d).collect()}
    assert out.columns == ["doc_id", "n_features", "score_permille"]
    for i in (1, 2):
        assert rows[i].n_features == md5_rows[i].n_features
        assert 0 <= rows[i].score_permille <= 1000
    again = {r.doc_id: r for r in textops.quality_classifier(d, use_xxhash=True).collect()}
    assert {i: (r.n_features, r.score_permille) for i, r in rows.items()} == {
        i: (r.n_features, r.score_permille) for i, r in again.items()
    }


def test_discovery_and_policy_composed(spark):
    """All production flags together: the SAME fetched robots.txt both
    advertises a sitemap (discover_sitemaps) and disallows a prefix
    (learn_robots_policy + honor_robots).  A sitemap-advertised URL under
    the disallowed prefix must be discovered-then-blocked; its sibling
    outside the prefix is fetched.  The two learners share one robots
    fetch and must not fight."""
    h = "both.example.com"

    def u(p):
        return f"https://{h}{p}"

    robots = f"User-agent: *\nDisallow: /secret\nSitemap: {u('/sitemap.xml')}\n"
    urlset = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<url><loc>{u('/secret/page')}</loc><priority>0.9</priority></url>"
        f"<url><loc>{u('/open/page')}</loc><priority>0.8</priority></url>"
        "</urlset>"
    )
    rows = [
        {"url": u("/robots.txt"), "warc_ts": None, "html": robots.encode(), "text": None, "lang": None},
        {"url": u("/sitemap.xml"), "warc_ts": None, "html": urlset.encode(), "text": None, "lang": None},
        _page(u("/start")),
        _page(u("/secret/page")),
        _page(u("/open/page")),
    ]
    corpus = spark.createDataFrame(rows, schema=PAGES)
    res = run_crawl(
        spark,
        corpus,
        [u("/start")],
        CrawlConfig(
            round_seconds=1e9,
            max_rounds=12,
            max_per_host_per_round=1,
            n_partitions=4,
            discover_sitemaps=True,
            learn_robots_policy=True,
            honor_robots=True,
        ),
    )
    got = {r["url"] for r in res.pages.select("url").collect()}
    assert got == {u("/robots.txt"), u("/sitemap.xml"), u("/start"), u("/open/page")}, got
    assert res.frontier.filter(F.col("status").isin("pending", "retry")).count() == 0


def test_auto_trap_detection_by_content_sameness(spark):
    """Self-detecting trap gate (auto_trap_min_fetched): 30 calendar-trap
    URLs serving IDENTICAL bodies vs same-host real pages with distinct
    bodies.  After round 0's quota of 6 trap fetches (one content hash →
    estimate×3 ≤ 6) the template is flagged; the remaining 24 trap URLs
    leave the frontier while every real page is still fetched.  URL-count
    detection alone could not make this call — /r/N also has >6 URLs but
    its distinct bodies keep it unflagged."""
    h = "cal.example.com"
    trap_urls = [f"https://{h}/cal/2024/01/{i}" for i in range(30)]
    real_urls = [f"https://{h}/r/{j}" for j in range(8)]
    rows = [_page(u, body="same trap body every time") for u in trap_urls] + [
        _page(u, body=f"unique body {u}") for u in real_urls
    ]
    corpus = spark.createDataFrame(rows, schema=PAGES)
    res = run_crawl(
        spark,
        corpus,
        trap_urls + real_urls,  # trap seeds first: round 0 quota goes to them
        CrawlConfig(
            round_seconds=1e9,
            max_rounds=12,
            max_per_host_per_round=6,
            n_partitions=4,
            auto_trap_min_fetched=6,
            auto_trap_dup_factor=3,
        ),
    )
    got = [r["url"] for r in res.pages.select("url").collect()]
    n_trap = sum(1 for u in got if "/cal/" in u)
    assert n_trap == 6, (n_trap, sorted(got))
    assert {u for u in got if "/r/" in u} == set(real_urls)
    assert res.frontier.filter(F.col("status").isin("pending", "retry")).count() == 0


def test_auto_trap_relearns_after_resume(spark, tmp_path):
    """The auto-trap aggregate is NOT snapshotted (CrawlConfig docstring):
    a resumed crawl re-learns from its own fetches.  Crash after round 0's
    6 trap fetches; the resumed run pays ONE more quota of trap fetches
    before re-flagging the template, then starves it — 12 trap pages
    total across both phases, every real page fetched, loop drained."""
    h = "resume.example.com"
    trap_urls = [f"https://{h}/cal/2024/01/{i}" for i in range(30)]
    real_urls = [f"https://{h}/r/{j}" for j in range(8)]
    rows = [_page(u, body="same trap body every time") for u in trap_urls] + [
        _page(u, body=f"unique body {u}") for u in real_urls
    ]
    corpus = spark.createDataFrame(rows, schema=PAGES)
    seeds = trap_urls + real_urls
    kw = dict(
        round_seconds=1e9,
        max_per_host_per_round=6,
        n_partitions=4,
        auto_trap_min_fetched=6,
        auto_trap_dup_factor=3,
        checkpoint_dir=str(tmp_path),
    )
    part = run_crawl(spark, corpus, seeds, CrawlConfig(max_rounds=1, **kw))
    assert part.pages.count() == 6
    res = run_crawl(spark, corpus, seeds, CrawlConfig(max_rounds=12, **kw))
    got = [r["url"] for r in res.pages.select("url").collect()]
    assert sum(1 for u in got if "/cal/" in u) == 12, sorted(got)
    assert {u for u in got if "/r/" in u} == set(real_urls)
    assert res.frontier.filter(F.col("status").isin("pending", "retry")).count() == 0
