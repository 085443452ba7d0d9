"""frontier_engine — a PySpark-native crawl-frontier + fetch-scheduler engine.

Brand-new implementation (not a port) of the data-processing capabilities of
the reference repo ``Abdelilah04116/Web_scraping-script``, re-expressed
Spark-first per /root/repo/SURVEY.md: DataFrame/Catalyst plans, Arrow-batched
pandas UDFs for HTML extraction, partitioned Bloom-shard URL-seen set with an
authoritative anti-join, per-host politeness scheduling, and a resumable
snapshot-checkpointed frontier loop.
"""

__version__ = "0.1.0"
