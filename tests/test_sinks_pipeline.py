"""Sinks (K1/K2/K6/K7, E20), pipeline interpreter (S3/S4), engine dispatch
(S10), data-URL source (S12) and size cap (F5) — reference quirk parity.

Pandas/pure-Python oracles replicate the reference's code paths
(src/storage.py, src/main.py, src/media_downloader.py) on the same fixture
rows, and the Spark operators must agree.
"""

import base64
import hashlib
import warnings

import pandas as pd
import pytest
from pyspark.sql import functions as F

from frontier_engine import pipeline, sinks
from frontier_engine.multimodal import parse_data_urls, size_cap_filter


@pytest.fixture(scope="module")
def scraped(spark):
    """Rows shaped like the reference's parsed_data dicts (main.py:101-114)."""
    rows = [
        {"url": f"https://ex{i % 3}.com/p{i}", "timestamp": float(1000 + (i * 7) % 5),
         "site_name": "ex", "data": {"title": f"t{i % 4}", "heading": f"h{i}"}}
        for i in range(20)
    ]
    rows += rows[:3]  # exact duplicates for the dedup op
    return rows


# ---------------------------------------------------------------------------
# E20 — one-level flatten
# ---------------------------------------------------------------------------


def test_flatten_struct_and_map(spark):
    df = spark.createDataFrame(
        [(1, ("a", "b"), {"k1": "v1", "k2": "v2"}), (2, ("c", "d"), {"k1": "w1"})],
        "id int, meta struct<x:string,y:string>, tags map<string,string>",
    )
    flat = sinks.flatten_one_level(df)
    assert flat.columns == ["id", "meta_x", "meta_y", "tags_k1", "tags_k2"]
    rows = {r["id"]: r for r in flat.collect()}
    assert rows[1]["meta_x"] == "a" and rows[1]["tags_k2"] == "v2"
    assert rows[2]["tags_k2"] is None  # union-of-keys: absent → null/empty cell


def test_flatten_matches_reference_dict_semantics(spark, scraped):
    # reference flatten (storage.py:71-81) on the same rows
    ref = []
    for item in scraped:
        flat = {}
        for k, v in item.items():
            if isinstance(v, dict):
                for sk, sv in v.items():
                    flat[f"{k}_{sk}"] = sv
            else:
                flat[k] = v
        ref.append(flat)
    sdf = spark.createDataFrame(
        [(r["url"], r["timestamp"], r["site_name"], r["data"]) for r in scraped],
        "url string, timestamp double, site_name string, data map<string,string>",
    )
    flat = sinks.flatten_one_level(sdf)
    assert flat.columns == ["url", "timestamp", "site_name", "data_heading", "data_title"]
    got = sorted(tuple(r) for r in flat.collect())
    want = sorted((r["url"], r["timestamp"], r["site_name"], r["data_heading"], r["data_title"]) for r in ref)
    assert got == want


def test_union_of_keys(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, "y")], "id int, b string")
    u = sinks.union_of_keys([a, b])
    assert set(u.columns) == {"id", "a", "b"}
    rows = {r["id"]: r for r in u.collect()}
    assert rows[1]["b"] is None and rows[2]["a"] is None


# ---------------------------------------------------------------------------
# K1/K2 — round-trip
# ---------------------------------------------------------------------------


def test_csv_roundtrip(spark, tmp_path, scraped):
    sdf = spark.createDataFrame(
        [(r["url"], r["timestamp"], r["data"]) for r in scraped],
        "url string, timestamp double, data map<string,string>",
    )
    path = str(tmp_path / "out_csv")
    sinks.write_csv(sdf, path)
    back = spark.read.option("header", True).csv(path)
    assert set(back.columns) == {"url", "timestamp", "data_title", "data_heading"}
    assert back.count() == len(scraped)
    # append mode really appends (the reference's 'a' open mode)
    sinks.write_csv(sdf, path)
    assert spark.read.option("header", True).csv(path).count() == 2 * len(scraped)


def test_json_fixed_shape_and_humanized_sizes(spark, tmp_path):
    sdf = spark.createDataFrame(
        [
            (
                "https://ex.com/p",
                "2024-01-01 00:00:00",
                {"title": "t"},
                [{"filename": "a.jpg", "original_url": "u", "local_path": "/m/a.jpg", "size": 2048}],
                [],
            )
        ],
        "url string, timestamp string, data map<string,string>, "
        "images array<struct<filename:string,original_url:string,local_path:string,size:long>>, "
        "videos array<struct<filename:string,original_url:string,local_path:string,size:long>>",
    )
    path = str(tmp_path / "out_json")
    sinks.write_json(sdf, path)
    back = spark.read.json(path).collect()[0]
    assert back["url"] == "https://ex.com/p"
    img = back["media"]["images"][0]
    assert img["size"] == "2.0 KB"  # storage.py:163 → _format_size
    assert img["filename"] == "a.jpg"
    assert list(back["media"].asDict()) == ["images", "videos"]


def test_sink_dispatch(spark):
    assert sinks.get_sink("csv") is sinks.write_csv
    assert sinks.get_sink("json") is sinks.write_json
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert sinks.get_sink("weird") is sinks.write_csv  # K7 fallback
        assert any("falling back to CSV" in str(x.message) for x in w)
    with pytest.raises(NotImplementedError):
        sinks.get_sink("mongodb")


# ---------------------------------------------------------------------------
# S3/S4 — pipeline interpreter vs pandas oracle
# ---------------------------------------------------------------------------


def test_reference_pipeline_yaml_ops(spark, scraped):
    """The reference's own pipeline.yaml op list (dedup by url, sort by
    timestamp desc — src/pipeline.yaml:55-61) vs the pandas code path it
    feeds (main.py:168-206)."""
    pdf = pd.DataFrame([{k: v for k, v in r.items() if k != "data"} for r in scraped])
    pdf["__pos"] = range(len(pdf))
    # reference order: dedup FIRST (keep first in frame order), then sort
    ref = pdf.drop_duplicates(subset=["url"]).sort_values(by="timestamp", ascending=False)
    cfg = {
        "operations": [
            {"type": "deduplicate", "columns": ["url"]},
            {"type": "sort", "column": "timestamp", "ascending": False},
        ]
    }
    sdf = spark.createDataFrame(pdf, "url string, timestamp double, site_name string, __pos long")
    out = pipeline.run_post_processing(sdf, cfg, dedup_order_by=["__pos"])
    got = sorted(tuple(r) for r in out.select("url", "timestamp").collect())
    want = sorted(ref[["url", "timestamp"]].itertuples(index=False, name=None))
    assert got == want


def test_dedup_respects_prior_sort(spark):
    """sort desc THEN deduplicate: pandas keeps the max-value row per key
    (stable sort + keep-first); the interpreter must agree."""
    pdf = pd.DataFrame({"k": [1, 1, 2, 2], "v": [10.0, 30.0, 5.0, 5.0], "__pos": [0, 1, 2, 3]})
    ref = pdf.sort_values(by="v", ascending=False, kind="stable").drop_duplicates(subset=["k"])
    cfg = {"operations": [
        {"type": "sort", "column": "v", "ascending": False},
        {"type": "deduplicate", "columns": ["k"]},
    ]}
    sdf = spark.createDataFrame(pdf, "k int, v double, __pos long")
    out = pipeline.run_post_processing(sdf, cfg, dedup_order_by=["__pos"])
    got = {(r["k"], r["v"], r["__pos"]) for r in out.collect()}
    want = set(ref.itertuples(index=False, name=None))
    assert got == want


def test_filter_ops_and_unknown_warns(spark):
    sdf = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id int, tag string")
    cfg = {"operations": [
        {"type": "filter", "column": "tag", "value": "a", "condition": "equals"},
        {"type": "filter", "column": "nope", "value": 1},  # missing col → no-op
        {"type": "mystery"},
    ]}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = pipeline.run_post_processing(sdf, cfg)
        assert any("Unknown post-processing op" in str(x.message) for x in w)
    assert {r["id"] for r in out.collect()} == {1, 3}


def test_yaml_load_and_site_merge(tmp_path):
    p = tmp_path / "pipe.yaml"
    p.write_text(
        "scraper_mode: table\nurls:\n  - https://a.com/x\npost_processing:\n"
        "  operations:\n    - type: deduplicate\n      columns: [url]\n"
    )
    cfg = pipeline.load_pipeline(str(p))
    assert cfg["scraper_mode"] == "table"
    urls, selectors = pipeline.merge_site_config(cfg, {"urls": ["https://b.com/y"], "selectors": {"t": "h1"}})
    assert urls == ["https://a.com/x", "https://b.com/y"]
    assert selectors == {"t": "h1"}  # pipeline has none → site fallback
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert pipeline.load_pipeline(str(tmp_path / "missing.yaml")) == {}  # warn + {}
        assert any("Error loading pipeline" in str(x.message) for x in w)


def test_fetcher_dispatch():
    from frontier_engine.fetch import fetch_via_pages_table

    assert pipeline.get_fetcher("table") is fetch_via_pages_table
    assert pipeline.get_fetcher("playwright") is pipeline._http_fetcher  # S6-S9 → simple
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert pipeline.get_fetcher("nonsense") is pipeline._http_fetcher
        assert any("falling back to simple" in str(x.message) for x in w)


def test_run_pipeline_threads_fetcher(spark):
    """ADVICE r2: the selected fetcher must actually reach run_crawl.
    scraper_mode='simple' selects the HTTP fetcher; in this sandbox DNS
    fails instantly, so every fetch is a P5 failure-row and ZERO pages come
    back — while 'table' mode fetches the same URLs from the corpus.  If
    the selection were still discarded, both modes would return pages."""
    from frontier_engine import synth
    from frontier_engine.schema import PAGES

    corpus = spark.createDataFrame(synth.gen_pages(5), schema=PAGES)
    urls = [r["url"] for r in corpus.select("url").limit(2).collect()]
    via_table = pipeline.run_pipeline(
        spark, pipeline.PipelineSpec.from_config({"urls": urls, "scraper_mode": "table"}), corpus
    )
    assert via_table.count() > 0
    via_http = pipeline.run_pipeline(
        spark, pipeline.PipelineSpec.from_config({"urls": urls, "scraper_mode": "simple"}), corpus
    )
    assert via_http.count() == 0  # all candidates failed over real (dead) HTTP


def test_two_sequential_sorts_then_dedup_matches_pandas(spark):
    """VERDICT r2 #7: later sort = primary key, earlier sorts = tiebreakers
    (pandas stable-sort semantics), verified against the pandas oracle."""
    pdf = pd.DataFrame(
        {
            "k":  [1,    1,    1,    2,    2,    2],
            "a":  [3.0,  1.0,  3.0,  2.0,  2.0,  2.0],
            "b":  [10.0, 20.0, 30.0, 40.0, 50.0, 40.0],
            "__pos": [0, 1, 2, 3, 4, 5],
        }
    )
    ref = (
        pdf.sort_values(by="a", ascending=False, kind="stable")
        .sort_values(by="b", ascending=True, kind="stable")
        .drop_duplicates(subset=["k"])
    )
    cfg = {"operations": [
        {"type": "sort", "column": "a", "ascending": False},
        {"type": "sort", "column": "b", "ascending": True},
        {"type": "deduplicate", "columns": ["k"]},
    ]}
    sdf = spark.createDataFrame(pdf, "k int, a double, b double, __pos long")
    out = pipeline.run_post_processing(sdf, cfg, dedup_order_by=["__pos"])
    got = {tuple(r) for r in out.collect()}
    want = set(ref.itertuples(index=False, name=None))
    assert got == want


def test_dedup_all_missing_columns_full_row_fallback(spark):
    """ADVICE r3 (correcting r2): reference src/main.py:201-206 falls back
    to FULL-ROW drop_duplicates() when every configured dedup column is
    missing (`if valid_columns: ... else: df.drop_duplicates()`), so the
    identical rows must be dropped, not retained.  A warning still fires
    so the config bug is visible."""
    sdf = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id int, tag string")
    cfg = {"operations": [{"type": "deduplicate", "columns": ["nope", "missing"]}]}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = pipeline.run_post_processing(sdf, cfg)
        assert any("full-row dedup" in str(x.message) for x in w)
    got = {tuple(r) for r in out.collect()}
    assert got == {(1, "a"), (2, "b")}  # full-row dedup, reference parity


def test_run_pipeline_end_to_end(spark, tmp_path):
    """Whole S3 surface: seeds → crawl → extraction flags → ops → export."""
    from frontier_engine import synth
    from frontier_engine.schema import PAGES

    corpus = spark.createDataFrame(synth.gen_pages(30), schema=PAGES)
    urls = [r["url"] for r in corpus.select("url").distinct().limit(10).collect()]
    spec = pipeline.PipelineSpec.from_config(
        {
            "urls": urls,
            "scraper_mode": "table",
            "selectors": {"headline": "h1.title"},
            "extract_links": True,
            "extract_metadata": True,
            "post_processing": {
                "operations": [{"type": "deduplicate", "columns": ["url_key"]}],
                "export": {"format": "csv", "path": str(tmp_path / "export_csv")},
            },
        }
    )
    out = pipeline.run_pipeline(spark, spec, corpus)
    assert set(["url", "text", "links", "page_metadata", "parsed"]) <= set(out.columns)
    assert out.count() == len(set(urls))
    # E3 selector results flow through (scalar-collapse handled in refsem)
    heads = [r["parsed"].get("headline") for r in out.select("parsed").collect()]
    assert any(h and "eadline" in h for h in heads)
    back = spark.read.option("header", True).csv(str(tmp_path / "export_csv"))
    assert back.count() == out.count()


# ---------------------------------------------------------------------------
# S12 — data-URL source vs the reference's Python path
# ---------------------------------------------------------------------------


def _ref_data_url(data_url):
    """media_downloader.py:217-268 minus file IO."""
    mime_type = data_url.split(",")[0].split(":")[1].split(";")[0]
    is_base64 = ";base64," in data_url
    data = data_url.split(",", 1)[1]
    if is_base64:
        content = base64.b64decode(data)
    else:
        from urllib.parse import unquote

        content = unquote(data).encode("utf-8")
    if mime_type.startswith("image/"):
        media_type = "images"
    elif mime_type.startswith("video/"):
        media_type = "videos"
    elif mime_type.startswith("audio/"):
        media_type = "audio"
    else:
        media_type = "other"
    h = hashlib.md5(content).hexdigest()[:10]
    return mime_type, media_type, len(content), h


def test_data_url_parse_matches_reference(spark):
    payloads = [
        "data:image/png;base64," + base64.b64encode(b"\x89PNG fake bytes").decode(),
        "data:audio/mpeg;base64," + base64.b64encode(b"ID3 fake audio").decode(),
        "data:text/plain;base64," + base64.b64encode("héllo wörld".encode()).decode(),
        "data:text/plain,hello%20world",  # non-base64 percent-encoded branch
        "data:application/x-weird;base64," + base64.b64encode(b"?").decode(),
    ]
    sdf = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)], "i int, data_url string")
    got = {r["i"]: r for r in parse_data_urls(sdf).collect()}
    for i, p in enumerate(payloads):
        mime, mtype, size, h = _ref_data_url(p)
        r = got[i]
        assert r["content_type"] == mime
        assert r["media_type"] == mtype
        assert r["size"] == size
        assert r["content_hash"] == h
        assert r["filename"].startswith(h)
    assert got[0]["ext"] == ".png" and got[4]["ext"] == ".bin"
    # non-data URL → null content, flagged
    plain = parse_data_urls(
        spark.createDataFrame([(0, "https://ex.com/a.png")], "i int, data_url string")
    ).collect()[0]
    assert plain["content"] is None and plain["is_data_url"] is False


def test_size_cap_null_passes(spark):
    df = spark.createDataFrame([(1, 50), (2, 500), (3, None)], "id int, content_length long")
    kept = {r["id"] for r in size_cap_filter(df, 100).collect()}
    assert kept == {1, 3}  # over-cap dropped, unknown passes
