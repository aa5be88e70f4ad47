"""ertransfer_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the capabilities of the reference pipeline (still273/ertransfer:
blocking → pairwise matching → clustering over labeled record pairs) as an
idiomatic Spark DataFrame engine over tables of multi-turn conversation
transcripts (conv_id, turn_idx, role, text, tool, ts) — plus the
training-data-pipeline operators (dedup, similarity search, text analysis)
a 100 TB corpus needs.

Design notes (scale-first):
- Everything is a lazy DataFrame transform; Catalyst plans joins/pushdown.
- No per-row Python: native Column expressions or Arrow-batched pandas UDFs.
- Blocking = explode/equi-join + windowed top-K with per-block budgets and
  salting; AQE + skew-join enabled in the session factory.
- Clustering = iterated mutual-best (greedy-parity) + large-star/small-star
  connected components with checkpointed frontiers.
"""

__version__ = "0.1.0"
