"""WARC source (frontier_engine/warc.py): pure parser/writer round-trips,
malformed-input recovery, gzip handling, the binaryFile reader, and the
anchor_text_rollup operator added alongside it."""

from __future__ import annotations

import gzip

import pytest

from frontier_engine import textops, warc
from pyspark.sql import functions as F


def _recs(n=3):
    return [
        {
            "warc_type": "response",
            "record_id": f"<urn:doc:{i}>",
            "warc_date": "2024-01-01T00:00:00Z",
            "target_uri": f"http://h.example/doc/{i}",
            "content_type": "text/plain",
            "payload": f"body {i} with some text".encode(),
        }
        for i in range(n)
    ]


def test_build_parse_roundtrip_pure():
    blob = warc.build_warc(_recs())
    out = list(warc.parse_warc(blob))
    assert [r["record_id"] for r in out] == [f"<urn:doc:{i}>" for i in range(3)]
    assert all(r["warc_type"] == "response" for r in out)
    assert out[1]["payload"] == b"body 1 with some text"
    assert out[1]["content_length"] == len(out[1]["payload"])
    assert out[2]["target_uri"] == "http://h.example/doc/2"


def test_parse_payload_containing_warc_magic():
    """Declared Content-Length must carry the parser OVER a payload that
    contains the record magic and CRLFs — no resync inside payloads."""
    evil = b"x\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\ny"
    blob = warc.build_warc(
        [{"warc_type": "response", "payload": evil}, {"warc_type": "metadata", "payload": b"z"}]
    )
    out = list(warc.parse_warc(blob))
    assert len(out) == 2
    assert out[0]["payload"] == evil
    assert out[1]["warc_type"] == "metadata"


def test_parse_skips_garbled_record_and_recovers():
    good = warc.build_warc(_recs(1))
    garbled = b"WARC/1.0\r\nWARC-Type: response\r\nno content length here\r\n\r\noops"
    out = list(warc.parse_warc(garbled + good))
    assert len(out) == 1 and out[0]["record_id"] == "<urn:doc:0>"


def test_parse_truncated_tail_emits_partial():
    blob = warc.build_warc(_recs(1))
    cut = blob[: blob.rfind(b"body 0") + 4]  # cut mid-payload
    out = list(warc.parse_warc(cut))
    assert len(out) == 1
    assert out[0]["content_length"] == len(b"body 0 with some text")  # declared
    assert out[0]["payload"] == b"body"  # actual bytes present


def test_parse_accepts_bare_lf_and_last_dup_header_wins():
    blob = (
        b"WARC/1.0\nWARC-Type: response\nWARC-Type: metadata\n"
        b"Content-Length: 2\n\nhi\n\n"
    )
    out = list(warc.parse_warc(blob))
    assert len(out) == 1
    assert out[0]["warc_type"] == "metadata"  # dup key: last wins (documented)
    assert out[0]["payload"] == b"hi"


def test_maybe_gunzip_multimember():
    a, b = warc.build_warc(_recs(1)), warc.build_warc(_recs(2))
    blob = gzip.compress(a) + gzip.compress(b)  # Common Crawl layout
    out = list(warc.parse_warc(warc.maybe_gunzip(blob)))
    assert len(out) == 3
    assert warc.maybe_gunzip(a) == a  # plain bytes pass through


def test_parse_warc_frame_distributed(spark):
    blobs = spark.createDataFrame(
        [("a.warc", warc.build_warc(_recs(3))), ("b.warc.gz", gzip.compress(warc.build_warc(_recs(2))))],
        "warc_file string, warc_bytes binary",
    )
    out = warc.parse_warc_frame(blobs)
    rows = out.groupBy("warc_file").agg(
        F.count(F.lit(1)).alias("n"), F.sum("content_length").alias("tot")
    ).collect()
    d = {r.warc_file: r for r in rows}
    assert d["a.warc"].n == 3 and d["b.warc.gz"].n == 2
    assert d["b.warc.gz"].tot == sum(len(r["payload"]) for r in _recs(2))


def test_parse_warc_frame_empty_and_garbage_blobs(spark):
    blobs = spark.createDataFrame(
        [("empty.warc", b""), ("junk.warc", b"not a warc at all")],
        "warc_file string, warc_bytes binary",
    )
    assert warc.parse_warc_frame(blobs).count() == 0


def test_read_warc_binaryfile(spark, tmp_path):
    (tmp_path / "seg0.warc").write_bytes(warc.build_warc(_recs(2)))
    (tmp_path / "seg1.warc.gz").write_bytes(gzip.compress(warc.build_warc(_recs(3))))
    (tmp_path / "ignore.txt").write_bytes(b"WARC/1.0 lookalike but filtered out")
    out = warc.read_warc(spark, str(tmp_path), path_glob="*.warc*")
    assert out.count() == 5
    only = warc.read_warc(spark, str(tmp_path), path_glob="*.warc.gz")
    assert only.count() == 3


def test_anchor_rollup_counts_and_min(spark):
    links = spark.createDataFrame(
        [
            (1, 10, "zeta page"),
            (2, 10, "alpha page"),
            (2, 10, "alpha page"),  # same src+anchor twice
            (3, 20, "x" * 200),  # truncated to max_anchor_chars
        ],
        "src long, dst long, anchor string",
    )
    out = {r.dst: r for r in textops.anchor_text_rollup(links, max_anchor_chars=64).collect()}
    assert out[10].n_anchors == 3
    assert out[10].n_srcs == 2
    assert out[10].n_unique_anchors == 2
    assert out[10].top_anchor == "alpha page"  # lexicographic min
    assert out[20].top_anchor == "x" * 64


def test_anchor_rollup_no_window_plan(spark):
    links = spark.createDataFrame([(1, 2, "a")], "src long, dst long, anchor string")
    plan = textops.anchor_text_rollup(links)._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, plan


def test_pages_pack_parse_roundtrip(spark):
    """pages → pack_pages → parse_warc_frame → records_to_pages must
    reproduce (url, warc_ts, html, lang) exactly and re-derive `text`
    through the engine's E1 extraction (byte-identical contract)."""
    from frontier_engine import synth
    from frontier_engine.schema import PAGES

    pages = spark.createDataFrame(synth.gen_pages(60), schema=PAGES)
    back = warc.records_to_pages(warc.parse_warc_frame(warc.pack_pages(pages, n_files=4)))

    # gen_pages emits REPEAT captures of some urls — compare as multisets
    def keys(df):
        return sorted(
            (r.url, bytes(r.html), r.text, r.lang, r.warc_ts) for r in df.collect()
        )

    a, b = keys(pages), keys(back)
    assert len(a) == len(b) > 0
    assert a == b  # engine extraction == golden text; lang rode the header


def test_crawl_over_warc_corpus_matches_original(spark):
    """run_crawl over a WARC-roundtripped corpus must produce the same
    seen set and fetch counts as over the original pages table — the
    archived-crawl ingest path is a drop-in corpus source."""
    from frontier_engine import synth
    from frontier_engine.frontier import CrawlConfig, run_crawl
    from frontier_engine.schema import PAGES

    pages = spark.createDataFrame(synth.gen_pages(120), schema=PAGES)
    via_warc = warc.records_to_pages(
        warc.parse_warc_frame(warc.pack_pages(pages, n_files=3))
    )
    seeds = synth.parse_seed_lines(synth.gen_seed_lines(120, 40))
    cfg = CrawlConfig(round_seconds=30.0, max_rounds=50)
    r1 = run_crawl(spark, pages, seeds, cfg)
    r2 = run_crawl(spark, via_warc, seeds, cfg)
    s1 = {r.url_key for r in r1.seen.select("url_key").collect()}
    s2 = {r.url_key for r in r2.seen.select("url_key").collect()}
    assert s1 == s2 and len(s1) > 0
    t1 = {(r.url, r.text) for r in r1.pages.select("url", "text").collect()}
    t2 = {(r.url, r.text) for r in r2.pages.select("url", "text").collect()}
    assert t1 == t2


def test_sniff_charset_precedence():
    # BOM beats everything
    assert warc.sniff_charset(b"\xff\xfex\x00", "text/html; charset=latin-1") == "utf-16-le"
    assert warc.sniff_charset(b"\xef\xbb\xbfhi") == "utf-8-sig"
    # Content-Type parameter beats meta
    assert (
        warc.sniff_charset(b'<meta charset="koi8-r">', "text/html; charset=ISO-8859-1")
        == "iso-8859-1"
    )
    # meta in the prologue
    assert warc.sniff_charset(b'<html><meta charset=windows-1252>') == "windows-1252"
    assert (
        warc.sniff_charset(
            b'<meta http-equiv="Content-Type" content="text/html; charset=Shift_JIS">'
        )
        == "shift_jis"
    )
    # bogus label / nothing declared -> default
    assert warc.sniff_charset(b'<meta charset="not-a-codec">') == "utf-8"
    assert warc.sniff_charset(b"plain ascii") == "utf-8"


def test_to_utf8_transcodes_and_passes_through():
    latin = "<p>café señor</p>".encode("latin-1")
    assert warc.to_utf8(latin, "text/html; charset=latin-1").decode() == "<p>café señor</p>"
    # utf-16 with BOM, no header
    u16 = "<p>héllo</p>".encode("utf-16")  # includes BOM
    assert warc.to_utf8(u16).decode() == "<p>héllo</p>"
    # utf-8 input: byte-identical passthrough
    u8 = "<p>日本語</p>".encode()
    assert warc.to_utf8(u8) is u8


def test_records_to_pages_transcode_end_to_end(spark):
    """A latin-1 page with a meta declaration must extract clean text
    through records_to_pages(transcode=True) — and stay mojibake with the
    flag off (proving the flag is what fixes it)."""
    html = '<html><head><meta charset="iso-8859-1"></head><body>café señor</body></html>'
    blob = warc.build_warc(
        [
            {
                "warc_type": "response",
                "record_id": "<urn:doc:1>",
                "warc_date": "2024-01-01T00:00:00Z",
                "target_uri": "http://h.example/a",
                "content_type": "text/html",
                "payload": html.encode("iso-8859-1"),
            }
        ]
    )
    recs = warc.parse_warc_frame(
        spark.createDataFrame([("f.warc", blob)], "warc_file string, warc_bytes binary")
    )
    good = warc.records_to_pages(recs, transcode=True).collect()[0]
    assert good.text == "café señor"
    assert bytes(good.html).decode("utf-8") == html
    raw = warc.records_to_pages(recs, transcode=False).collect()[0]
    assert "café" not in (raw.text or "")


def test_read_warc_stream_identity_and_resume(spark, tmp_path):
    """Streaming WARC ingest == batch over the same segments, and a
    restart with the same checkpoint parses ONLY newly-landed files."""
    seg = tmp_path / "segments"
    seg.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    (seg / "s0.warc").write_bytes(warc.build_warc(_recs(2)))
    (seg / "s1.warc.gz").write_bytes(gzip.compress(warc.build_warc(_recs(3))))

    def drain():
        q = (
            warc.read_warc_stream(spark, str(seg))
            .select("warc_file", "record_id", "content_length")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.warc_file, r.record_id) for r in spark.read.parquet(out).collect()}

    got1 = drain()
    batch = {
        (r.warc_file, r.record_id)
        for r in warc.read_warc(spark, str(seg)).select("warc_file", "record_id").collect()
    }
    assert got1 == batch and len(got1) == 5

    # a third segment lands; the resumed query must parse ONLY the delta
    (seg / "s2.warc").write_bytes(warc.build_warc(_recs(4)))
    got2 = drain()
    assert len(got2) == 9  # 5 old (not re-parsed, not lost) + 4 new
    assert all(f.endswith("s2.warc") for f, _ in got2 - got1)


def test_anchor_rollup_from_real_extraction(spark):
    """The rollup composes with REAL extraction output: explode the links
    column with_extractions emits, canonicalize targets, and the counts
    match a Python fold over the same extracted links."""
    from collections import defaultdict

    from frontier_engine import synth
    from frontier_engine.canonicalize import surt_key
    from frontier_engine.extract import with_extractions
    from frontier_engine.schema import PAGES

    pages = with_extractions(spark.createDataFrame(synth.gen_pages(50), schema=PAGES))
    out = {r.dst: r for r in textops.anchor_rollup_from_pages(pages).collect()}

    want_n = defaultdict(int)
    want_min: dict = {}
    for r in pages.select("url", "links").collect():
        for l in r.links or []:
            k = surt_key(l.url)
            if k is None:
                continue
            a = (l.text or "")[:64]
            want_n[k] += 1
            want_min[k] = a if k not in want_min else min(want_min[k], a)
    assert want_n and set(out) == set(want_n)
    for k in want_n:
        assert out[k].n_anchors == want_n[k]
        assert out[k].top_anchor == want_min[k]
