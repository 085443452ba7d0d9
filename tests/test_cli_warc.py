"""CLI surface for the WARC source: synth → warc-export → warc-ingest →
identical pages content; crawl --sitemap-dir orders the frontier."""

from __future__ import annotations

from frontier_engine import cli


def test_cli_warc_export_ingest_roundtrip(spark, tmp_path, monkeypatch):
    # CLI commands stop their session when done; keep the shared test
    # session alive (get_spark returns the active one)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    src = str(tmp_path / "pages_src")
    seg = str(tmp_path / "segments")
    back = str(tmp_path / "pages_back")
    assert cli.main(["synth", "--pages", "200", "--out", src]) == 0
    assert cli.main(["warc-export", "--pages", src, "--out", seg, "--files", "3"]) == 0
    assert cli.main(["warc-ingest", "--warc", seg, "--glob", "*.warc.gz", "--out", back]) == 0

    a = spark.read.parquet(src)
    b = spark.read.parquet(back)

    def keys(df):
        return sorted(
            (r.url, bytes(r.html), r.text, r.lang) for r in df.collect()
        )

    assert keys(a) == keys(b)
