"""gmallbiguan_parent_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference real-time e-commerce warehouse (szpBigData/gmallBiGuan-parent,
surveyed in SURVEY.md), re-expressed Spark-first: DataFrame/SQL plans that
Catalyst optimizes, broadcast dim joins instead of per-record async lookups,
window functions instead of keyed state, Structured Streaming variants where
stateful semantics require it.

Layout:
    session.py    — tuned SparkSession factory
    io.py         — table readers over the driver testdata
    functions/    — scalar helpers (portable hashing, decimal casts, dates)
    operators/    — reusable operators (joins, windows, dedup, similarity, text)
    pipelines/    — the DWD/DWM/DWS/serving query surface (SURVEY.md §2)
    streaming/    — Structured Streaming variants
"""

__version__ = "0.1.0"
