"""spark-submit entry point.

Production launch (north_rule):
    spark-submit --py-files frontier_engine.zip -m frontier_engine.cli crawl \
        --corpus s3://bucket/pages --seeds s3://bucket/seeds.txt \
        --checkpoint-dir s3://bucket/crawl_state --max-depth 2 --bloom

Local sandbox equivalents run with a local[N] master.  Subcommands mirror
the reference's CLI surface (cli.py:31-75: --url/--url-file/--output...)
re-expressed for batch tables.
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--master", default=None, help="spark master (default: env/local[32])")
    p.add_argument("--cpus", type=int, default=None, help="n_partitions hint")


def cmd_crawl(args) -> int:
    from frontier_engine.frontier import CrawlConfig, run_crawl
    from frontier_engine.session import get_spark
    from frontier_engine.synth import parse_seed_lines

    spark = get_spark(args.master, app_name="frontier-crawl")
    corpus = spark.read.parquet(args.corpus)
    if args.seeds.endswith(".txt"):
        with open(args.seeds) as fh:  # cli.py:77-84 seed-file semantics (S2)
            seeds = parse_seed_lines(fh.read().splitlines())
    else:
        seeds = spark.read.parquet(args.seeds)
    policy = spark.read.parquet(args.host_policy) if args.host_policy else None
    seed_scores = None
    if getattr(args, "sitemap_dir", None):
        # sitemap priorities -> frontier ordering (sitemaps.py); the dir
        # holds fetched sitemap XML (plain or .gz), one file per sitemap
        from pyspark.sql import functions as F

        from frontier_engine import sitemaps

        sm = (
            spark.read.format("binaryFile")
            .load(args.sitemap_dir)
            .select(F.col("path").alias("sitemap_url"), F.col("content").alias("xml"))
        )
        seed_scores = sitemaps.seed_scores_from_sitemaps(sitemaps.parse_sitemap_frame(sm))
    cfg = CrawlConfig(
        max_depth=args.max_depth,
        round_seconds=args.round_seconds,
        max_rounds=args.max_rounds,
        use_bloom=args.bloom,
        honor_robots=args.robots,
        checkpoint_dir=args.checkpoint_dir,
        n_partitions=args.cpus or 32,
        discover_sitemaps=args.discover_sitemaps,
        learn_robots_policy=args.learn_robots,
        auto_trap_min_fetched=args.auto_trap,
    )
    res = run_crawl(spark, corpus, seeds, cfg, host_policy=policy, seed_scores=seed_scores)
    if args.out:
        res.pages.write.mode("overwrite").parquet(args.out + "/pages")
        res.seen.write.mode("overwrite").parquet(args.out + "/seen")
        res.metrics.write.mode("overwrite").parquet(args.out + "/metrics")
    summary = {
        "rounds": res.rounds,
        "pages": res.pages.count(),
        "seen": res.seen.count(),
        "frontier_left": res.frontier.count(),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


def cmd_extract(args) -> int:
    from frontier_engine.extract import with_extractions
    from frontier_engine.session import get_spark

    spark = get_spark(args.master, app_name="frontier-extract")
    pages = spark.read.parquet(args.pages)
    out = with_extractions(pages)
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"rows": spark.read.parquet(args.out).count()}))
    spark.stop()
    return 0


def cmd_synth(args) -> int:
    from frontier_engine import synth
    from frontier_engine.schema import PAGES
    from frontier_engine.session import get_spark

    spark = get_spark(args.master, app_name="frontier-synth")
    rows = synth.gen_pages(args.pages, with_text=not args.no_text)
    spark.createDataFrame(rows, schema=PAGES).repartition(
        max(8, args.pages // 20000)
    ).write.mode("overwrite").parquet(args.out)
    print(json.dumps({"pages": args.pages, "out": args.out}))
    spark.stop()
    return 0


def cmd_warc_ingest(args) -> int:
    """WARC archive (dir of .warc/.warc.gz segments) → pages parquet —
    the Common Crawl ingest path (warc.py); one task per segment file."""
    from frontier_engine import warc
    from frontier_engine.session import get_spark

    spark = get_spark(args.master, app_name="frontier-warc-ingest")
    recs = warc.read_warc(spark, args.warc, path_glob=args.glob)
    pages = warc.records_to_pages(recs, transcode=args.transcode)
    pages.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"pages": spark.read.parquet(args.out).count(), "out": args.out}))
    spark.stop()
    return 0


def cmd_warc_export(args) -> int:
    """pages parquet → gzipped WARC segments (archival export,
    warc.pack_pages); blobs are written worker-side, one file per hash
    bucket — point --out at shared/object storage on a cluster."""
    import os

    from frontier_engine import warc
    from frontier_engine.session import get_spark

    spark = get_spark(args.master, app_name="frontier-warc-export")
    pages = spark.read.parquet(args.pages)
    blobs = warc.pack_pages(pages, n_files=args.files)
    out_dir = args.out
    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows):
        for r in rows:
            with open(os.path.join(out_dir, r.warc_file), "wb") as fh:
                fh.write(bytes(r.warc_bytes))

    blobs.foreachPartition(write_part)
    print(json.dumps({"files": args.files, "out": out_dir}))
    spark.stop()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="frontier_engine")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the frontier crawl loop")
    _add_common(c)
    c.add_argument("--corpus", required=True, help="pages parquet dir (the 'web')")
    c.add_argument("--seeds", required=True, help="seed .txt file or parquet dir")
    c.add_argument("--host-policy", default=None, help="host_policy parquet")
    c.add_argument("--max-depth", type=int, default=0)
    c.add_argument("--round-seconds", type=float, default=60.0)
    c.add_argument("--max-rounds", type=int, default=1000)
    c.add_argument("--bloom", action="store_true")
    c.add_argument("--robots", action="store_true")
    c.add_argument("--checkpoint-dir", default=None)
    c.add_argument("--out", default=None)
    c.add_argument(
        "--sitemap-dir",
        default=None,
        help="dir of fetched sitemap XML (.xml/.xml.gz); priorities order the frontier",
    )
    c.add_argument(
        "--discover-sitemaps",
        action="store_true",
        help="mid-crawl discovery: fetch robots.txt, follow Sitemap: directives, enqueue urlset entries at their priorities",
    )
    c.add_argument(
        "--learn-robots",
        action="store_true",
        help="fold fetched robots.txt Disallow rules + Crawl-delay into the live host policy (rules act with --robots)",
    )
    c.add_argument(
        "--auto-trap",
        type=int,
        default=None,
        metavar="N",
        help="self-detect crawler traps: flag a (host, URL-template) once N fetches show near-identical content (HLL sketch), starving it from the next round",
    )
    c.set_defaults(fn=cmd_crawl)

    wi = sub.add_parser("warc-ingest", help="WARC segments -> pages parquet")
    _add_common(wi)
    wi.add_argument("--warc", required=True, help="dir of .warc/.warc.gz files")
    wi.add_argument("--glob", default=None, help="pathGlobFilter, e.g. '*.warc.gz'")
    wi.add_argument("--out", required=True)
    wi.add_argument(
        "--transcode", action="store_true", help="charset-sniff and rewrite payloads to UTF-8"
    )
    wi.set_defaults(fn=cmd_warc_ingest)

    we = sub.add_parser("warc-export", help="pages parquet -> gzipped WARC segments")
    _add_common(we)
    we.add_argument("--pages", required=True)
    we.add_argument("--out", required=True)
    we.add_argument("--files", type=int, default=8, help="output segment count")
    we.set_defaults(fn=cmd_warc_export)

    e = sub.add_parser("extract", help="one-pass extraction over a pages table")
    _add_common(e)
    e.add_argument("--pages", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_extract)

    s = sub.add_parser("synth", help="generate a synthetic pages corpus")
    _add_common(s)
    s.add_argument("--pages", type=int, default=10000)
    s.add_argument("--out", required=True)
    s.add_argument("--no-text", action="store_true")
    s.set_defaults(fn=cmd_synth)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
