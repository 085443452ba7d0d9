"""Pipeline-YAML interpreter + engine dispatch (SURVEY §2.1 S3/S4/S10).

The reference's entire "query engine" surface is a YAML pipeline file: a
seed/url list, a scraper mode, extraction flags, and an ordered
post-processing op list with an export block (``src/main.py:15-30`` loads
it, ``src/main.py:166-206`` runs the ops, ``src/main.py:208-222`` exports).
This module is that interpreter over the engine's native operators:

* ops run IN ORDER over a DataFrame (filter → sort → deduplicate compose
  exactly like the reference's sequential pandas mutations);
* ``deduplicate`` needs an explicit order key (SURVEY §7.4: pandas
  keep-first relies on frame order, which a distributed engine must replace
  with a deterministic sort key);
* unknown op types / missing columns warn and no-op, matching the
  reference's log-and-continue behavior (src/main.py:186,195).

Engine dispatch (S10, ``src/scraper.py:39-57``): mode string → fetcher with
a warn-and-fallback default.  Browser modes (selenium/scrapy/pyppeteer/
playwright, S6-S9) are out of scope per SURVEY §2.1 — they dispatch to the
vectorized HTTP fetcher, which is what the reference's fallback does too
(unknown → simple).

Site-config merge (S4, ``src/main.py:56-74``): pipeline urls extend with
the site config's urls; selectors fall back to the site config's.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from frontier_engine import sinks
from frontier_engine.fetch import fetch_http_batch, fetch_via_pages_table
from frontier_engine.functions import op_filter, op_sort

# ---------------------------------------------------------------------------
# S3 — pipeline YAML load (src/main.py:15-30)
# ---------------------------------------------------------------------------


def load_pipeline(path: str) -> dict:
    """YAML pipeline file → dict; unreadable/invalid → {} with a warning
    (the reference logs the error and returns {}, src/main.py:28-30)."""
    try:
        import yaml

        with open(path) as fh:
            return yaml.safe_load(fh) or {}
    except Exception as e:  # log-and-continue parity
        warnings.warn(f"Error loading pipeline file {path}: {e}", stacklevel=2)
        return {}


# ---------------------------------------------------------------------------
# S4 — site-config merge (src/main.py:56-74)
# ---------------------------------------------------------------------------


def merge_site_config(pipeline_cfg: dict, site_cfg: dict | None) -> tuple[list[str], dict]:
    """(urls, selectors): pipeline urls EXTENDED by site urls; selectors
    fall back to the site config when the pipeline sets none."""
    urls = list(pipeline_cfg.get("urls", []) or [])
    site_cfg = site_cfg or {}
    urls.extend(site_cfg.get("urls", []) or [])
    selectors = pipeline_cfg.get("selectors") or site_cfg.get("selectors", {}) or {}
    return urls, selectors


# ---------------------------------------------------------------------------
# post-processing op interpreter (src/main.py:166-206 + export 208-222)
# ---------------------------------------------------------------------------


def run_post_processing(df: DataFrame, post_cfg: dict, dedup_order_by: list[str] | None = None) -> DataFrame:
    """Run the ordered op list.  ``dedup_order_by``: the deterministic
    keep-first key (defaults to all of the dedup subset's columns — stable,
    though callers with a row-order column should pass it)."""
    from pyspark.sql import functions as F

    from frontier_engine.functions import op_deduplicate

    # pandas drop_duplicates keeps the FIRST row in the CURRENT frame order.
    # pandas sort_values is STABLE, so after two sequential sorts the frame
    # order is (last sort, earlier sort as tiebreaker, original order) — the
    # accumulated key list mirrors that exactly: each new sort becomes the
    # PRIMARY key and the previous keys demote to tiebreakers (re-sorting an
    # already-used column just promotes it).  dedup_order_by is the final
    # stable tiebreak for rows tied on every declared sort (SURVEY §7.4
    # determinism rule).
    sort_keys: list[tuple[str, bool]] = []  # most-significant first
    for op in post_cfg.get("operations", []) or []:
        op_type = op.get("type")
        if op_type == "filter":
            df = op_filter(df, op.get("column"), op.get("value"), op.get("condition", "equals"))
        elif op_type == "sort":
            col, asc = op.get("column"), op.get("ascending", True)
            df = op_sort(df, col, asc)
            if col in df.columns:
                sort_keys = [(col, asc)] + [(c, a) for c, a in sort_keys if c != col]
        elif op_type == "deduplicate":
            cols = op.get("columns", []) or []
            valid = [c for c in cols if c in df.columns]
            if cols and not valid:
                # reference (src/main.py:201-206): `if valid_columns:` subset
                # dedup, `else:` full-row drop_duplicates() — an op whose
                # configured columns are ALL missing falls back to full-row
                # dedup, it does not skip.  Warn (the reference is silent
                # here, but the divergence is worth surfacing) and fall
                # through to the all-columns subset below.
                warnings.warn(
                    f"Deduplicate columns {cols} not in frame — "
                    "falling back to full-row dedup (reference src/main.py:206)",
                    stacklevel=2,
                )
            if not valid:  # no/invalid subset → pandas default: all columns
                valid = list(df.columns)
            current_sort = [F.col(c).asc() if a else F.col(c).desc() for c, a in sort_keys]
            tiebreak = [F.col(c) for c in (dedup_order_by or valid)]
            df = op_deduplicate(df, valid, order_by=current_sort + tiebreak)
        else:
            warnings.warn(f"Unknown post-processing op type: {op_type}", stacklevel=2)
    export_cfg = post_cfg.get("export")
    if export_cfg:
        sinks.export(
            df,
            export_cfg.get("format", "csv"),
            export_cfg.get("path", "processed_data"),
        )
    return df


# ---------------------------------------------------------------------------
# S10 — engine dispatch (src/scraper.py:39-57)
# ---------------------------------------------------------------------------

# browser engines are dispatched to the vectorized HTTP path: SURVEY §2.1
# scopes JS rendering out (S6-S9 n/a), and the reference's own factory falls
# back to SimpleScraper for anything it can't construct
_BROWSER_MODES = ("selenium", "scrapy", "pyppeteer", "playwright")


def _http_fetcher(candidates: DataFrame, pages_corpus: DataFrame) -> DataFrame:
    """fetch_http_batch under the normalized (candidates, corpus) fetcher
    interface — the corpus argument is unused (real HTTP doesn't have one)."""
    return fetch_http_batch(candidates)


def get_fetcher(mode: str = "simple"):
    """mode string → fetcher callable with the uniform signature
    ``fetcher(candidates, pages_corpus) -> DataFrame`` that run_crawl
    invokes.  'table' is the sandbox/test engine (fetch = join against the
    pages corpus); 'simple' is real HTTP; browser modes map to 'simple'
    with a note; unknown modes warn + fall back."""
    fetchers = {"table": fetch_via_pages_table, "simple": _http_fetcher}
    for m in _BROWSER_MODES:
        fetchers[m] = _http_fetcher
    if mode not in fetchers:
        warnings.warn(f"Mode {mode} not supported, falling back to simple mode", stacklevel=2)
        mode = "simple"
    return fetchers[mode]


# ---------------------------------------------------------------------------
# whole-pipeline driver (execute_pipeline analogue, src/main.py:32-143)
# ---------------------------------------------------------------------------


@dataclass
class PipelineSpec:
    urls: list[str] = field(default_factory=list)
    scraper_mode: str = "table"
    selectors: dict = field(default_factory=dict)
    extract_links: bool = False
    extract_images: bool = False
    extract_metadata: bool = False
    post_processing: dict = field(default_factory=dict)

    @classmethod
    def from_config(cls, cfg: dict, site_cfg: dict | None = None) -> "PipelineSpec":
        urls, selectors = merge_site_config(cfg, site_cfg)
        return cls(
            urls=urls,
            scraper_mode=cfg.get("scraper_mode", "table"),
            selectors=selectors,
            extract_links=bool(cfg.get("extract_links", False)),
            extract_images=bool(cfg.get("extract_images", False)),
            extract_metadata=bool(cfg.get("extract_metadata", False)),
            post_processing=cfg.get("post_processing", {}) or {},
        )


def run_pipeline(spark, spec: PipelineSpec, pages_corpus: DataFrame, dedup_order_by: list[str] | None = None) -> DataFrame:
    """Reference execute_pipeline, Spark-first: seeds → crawl (depth 0, the
    reference never enqueues) → select the extraction columns the flags ask
    for → ordered post-processing ops → optional export.  Returns the final
    DataFrame (the reference returns df.to_dict('records'))."""
    from pyspark.sql import functions as F

    from frontier_engine.extract import make_selectors_udf
    from frontier_engine.frontier import CrawlConfig, run_crawl

    # mode selects the fetch engine AND run_crawl actually uses it (ADVICE
    # r2: the selection used to be discarded); in this sandbox only 'table'
    # runs end-to-end (http modes raise on missing `requests` — S5 gating)
    fetcher = get_fetcher(spec.scraper_mode)
    res = run_crawl(
        spark, pages_corpus, spec.urls,
        CrawlConfig(max_depth=0, round_seconds=1e9, max_rounds=1),
        fetcher=fetcher,
    )
    cols = ["url", "url_key", "host", "text"]
    pages = res.pages
    if spec.selectors:
        # E3: configured selector map → per-page parsed dict (scalar-collapse
        # quirk included), as the reference's parser.parse_html(html, selectors)
        pages = pages.withColumn("parsed", make_selectors_udf(spec.selectors)(F.col("html")))
        cols.append("parsed")
    if spec.extract_links:
        cols.append("links")
    if spec.extract_images:
        cols.append("images")
    if spec.extract_metadata:
        cols.append("page_metadata")
    df = pages.select(*cols)
    return run_post_processing(df, spec.post_processing, dedup_order_by=dedup_order_by or ["url_key"])
