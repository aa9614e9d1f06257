"""Query surface of the engine, organized by warehouse layer like the
reference (ODS→DWD→DWM→DWS→serving, SURVEY.md §3):

    dwd.py      — parse/split/repair operators (SURVEY §2.2 P1-P8)
    dwm.py      — dedup, sessionization/jump, wide joins (P9, ST4, J1-J3)
    dws.py      — windowed aggregates (A1-A4, U1, U2)
    serving.py  — the 8 serving queries (A5-A11, O1-O2)
    tpch.py     — headline analytical queries for the benchmark

Every module exposes QUERIES: dict[name, (spark, sf_dir) -> DataFrame]
and ORACLES: dict[name, duckdb_sql]. The driver's correctness gate runs
both sides at sf0.01 and hash-compares (column names are aliased
identically on both sides; aggregates are decimal-cast so sums are
order-independent).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import asof, clustering, curation, dedup, multimodal, quality, sampling, similarity, sketches, text
from ..streaming import queries as streaming_queries
from . import analytics, cdc, dwd, dwm, dws, serving, tpch

_MODULES = (
    dwd, dwm, dws, serving, tpch, cdc, analytics,
    dedup, similarity, text, multimodal, sketches, asof, sampling, curation, clustering, quality,
    streaming_queries,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
