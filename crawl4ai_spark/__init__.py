"""crawl4ai_spark — a PySpark-native web-crawl analytics engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the reference crawler (Aitosoft/crawl4ai v0.9.2) as a batch-iterated URL
frontier over partitioned parquet/Iceberg tables of Common-Crawl-style pages:

- vectorized Arrow/pandas UDFs for URL canonicalization + 64-bit
  fingerprinting (semantics: reference ``crawl4ai/utils.py:2317-2373``),
- a partitioned, host-bucketed priority frontier with bloom-filter URL-seen
  pre-filtering backed by an exact anti-join,
- per-host politeness budgets + robots.txt gating via grouped window ranking,
- distributed HTML extraction (links / markdown / metadata / language) with
  a deterministic byte-level round-trip invariant,
- per-wave atomic checkpoints (frontier, seen shards, lineage, metrics) so a
  killed crawl resumes exactly.

Everything is DataFrame-first: Catalyst plans the physical execution; Python
runs only inside Arrow-batched pandas UDFs (never per-row).
"""

__version__ = "0.1.0"
