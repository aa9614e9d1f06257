"""The pandas_udf slot for a real CJK segmenter (U1): the engine's
tokenize() is a built-in expression; when a dictionary segmenter
(jieba/IK-equivalent) is needed, it drops in as an Arrow-vectorized
pandas_udf with this exact signature — demonstrated here with a
rule-based CJK bigram segmenter (no external deps)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.ArrayType(T.StringType()))
def cjk_tokenize(texts: pd.Series) -> pd.Series:
    """Latin runs stay whole words; CJK runs emit overlapping bigrams
    (the classic fallback when no dictionary is available)."""
    import re

    def seg(text: str) -> list[str]:
        out = []
        for run in re.findall(r"[a-z0-9]+|[一-鿿]+", text.lower()):
            if re.match(r"[a-z0-9]", run):
                out.append(run)
            elif len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
        return out

    return texts.map(seg)


def test_cjk_pandas_udf_tokenizer(spark):
    df = spark.createDataFrame(
        [("hello 世界和平 world",), ("纯中文",), ("latin only 42",)], "text string"
    )
    got = [r.toks for r in df.select(cjk_tokenize("text").alias("toks")).collect()]
    assert got[0] == ["hello", "世界", "界和", "和平", "world"]
    assert got[1] == ["纯中", "中文"]
    assert got[2] == ["latin", "only", "42"]


def test_cjk_udf_composes_with_explode_count(spark):
    df = spark.createDataFrame([("世界 世界 hello",)], "text string")
    counts = (
        df.select(F.explode(cjk_tokenize("text")).alias("kw"))
        .groupBy("kw")
        .count()
        .collect()
    )
    assert {(r.kw, r["count"]) for r in counts} == {("世界", 2), ("hello", 1)}
