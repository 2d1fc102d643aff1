"""graphminer_spark — a PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the GraphMiner reference suite
(chenxuhao/GraphMiner, a shared-memory C++/OpenMP/CUDA graph pattern
mining benchmark — see /root/reference) as a distributed DataFrame
program:

* graph construction from Common-Crawl-style web pages
  (``url, warc_ts, html, text, lang``) via Arrow-vectorized pandas UDFs,
* a canonical edge table with degrees, degree-ordered DAG orientation
  (semantics of reference ``src/common/graph.cc:233-279``), and skew
  (hub) handling,
* iterative algorithms — PageRank (power iteration + dangling mass),
  connected components (large-star/small-star hash-min), label
  propagation, triangle counting (total + per-edge, the reference's
  ``src/triangle`` kernels re-expressed as joins) — with checkpointing,
  per-superstep lineage and convergence metrics,
* training-data pipeline operators over document/embedding tables:
  exact + MinHash-LSH + SimHash + n-gram-Jaccard dedup, ANN similarity
  search, language id, quality scoring, token counting, fingerprinting.

Everything is DataFrame/Catalyst-first; Python only ever touches data
through Arrow-batched pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"
