"""whoiswho_spark — a from-scratch PySpark-native entity-resolution engine.

Re-creates the query/data-processing capabilities of THUDM/WhoIsWho
(reference at /root/reference, analyzed in SURVEY.md) as idiomatic Spark:

- ``functions``  — Catalyst expression builders + vectorized pandas UDFs
  (text normalization, similarity kernels, text statistics).
- ``operators``  — the pipeline stages: blocking (MinHash/LSH + salting),
  candidate pairs (within-block self-join), pairwise scoring, transitive
  clustering (large-star/small-star connected components + post-match),
  evaluation (distributed pairwise F1), dedup / ANN / multimodal ops.
- ``sources``    — deterministic synthetic page-corpus generator and
  catalog helpers over the driver's parquet testdata.
- ``plans``      — end-to-end pipeline orchestration with per-stage
  checkpointing, lineage counters, and mid-stage resume.
- ``streaming``  — Structured Streaming variants (optional extension;
  the reference is batch-only, SURVEY.md §1.3).
"""

__version__ = "0.1.0"
