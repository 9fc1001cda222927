"""trianglecounting_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query semantics of RapidsAtHKUST/TriangleCounting (a C++14/OpenMP
exact triangle-counting engine, see /root/reference) as idiomatic Spark DataFrame
plans plus Arrow-vectorized pandas kernels, and extends it with the iterative graph
algorithms (PageRank, connected components, label propagation, k-truss) and the
web-scale training-data pipeline operators (dedup, similarity search, text analysis)
that a 100 TB Common-Crawl-style deployment needs.

Layout:
    session.py   — SparkSession factory with scale-oriented defaults (AQE, Arrow).
    operators/   — graph operators: normalize, degrees, orientation, adjacency,
                   triangle counting (SQL plan + vectorized kernel), PageRank,
                   connected components, label propagation, k-truss, skew handling.
    sources/     — edge-list readers (METIS / TSV / binary), page→edge extraction,
                   deterministic graph generators over the test parquet tables.
    functions/   — text analysis, dedup (exact/MinHash/SimHash/Jaccard), embedding
                   similarity search, multimodal column plumbing.
    plans/       — composed end-to-end pipelines + checkpoint/resume.
    streaming/   — Structured Streaming variants (windowed edge-rate aggregation).
"""

__version__ = "0.1.0"
