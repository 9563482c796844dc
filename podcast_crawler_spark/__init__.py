"""podcast_crawler_spark — a from-scratch PySpark-native crawl/analytics
engine with the query and data-processing capabilities of
Erinable/podcast_crawler (reference, read-only, at /root/reference).

Spark-first architecture (SURVEY.md §7): DataFrame/SQL plans optimized by
Catalyst, Arrow-batched pandas UDFs for the parse path, window functions for
the politeness priority queue, partitioned Bloom/cuckoo filters for the
URL-seen set, snapshot-manifest checkpointing for exact resume.
"""

__version__ = "0.1.0"
