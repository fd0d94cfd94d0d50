"""Golden-fixture checks for the queries the DuckDB differential
oracle cannot express (q15-q20, q31, q33-q34): each query's Spark DataFrame must value-match the
committed tests/golden/*.parquet, which tools/gen_goldens.py regenerates
from the SINGLE-NODE oracle (plain python/numpy — no Spark). Comparison
mirrors the driver's: columns sorted by name, rows order-insensitive,
floats normalized to %.12g.
"""

from __future__ import annotations

import importlib.util
import math
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
GOLDEN_DIR = Path(__file__).resolve().parent / "golden"

GOLDEN_QUERIES = [
    "q15_media_features",
    "q16_triples_by_pred",
    "q17_canonical_triples",
    "q18_predicted_links",
    "q19_ann_topk",
    "q20_knn_join",
    "q31_evaluation_harness",
    "q33_audio_features",
    "q34_video_features",
]


def _norm(v):
    if v is None:
        # same token check_entry.norm uses: a SQL NULL reaches this
        # comparer as python None via Spark collect() but as NaN via a
        # pandas float column (golden parquet) — both must hash alike
        return "nan"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(
        tuple(_norm(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )


def _rerank_aa(df: pd.DataFrame) -> pd.DataFrame:
    """q18 normalization: within a per-src group, candidates whose aa_score
    ties at the ROUNDED 6-dp value can rank either way depending on
    floating-point summation order (Spark's partition-order sum vs the
    oracle's sorted-order sum differ in the last ulps) — re-rank both sides
    deterministically by (rounded aa desc, common desc, dst asc) so only
    semantic differences fail the compare."""
    df = df.sort_values(
        ["src", "aa_score", "common_neighbors", "dst"],
        ascending=[True, False, False, True],
    ).copy()
    df["rank"] = df.groupby("src").cumcount() + 1
    return df


_NORMALIZERS = {"q18_predicted_links": _rerank_aa}


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_query_matches_golden(spark, name):
    import __spark_entry__ as entry

    golden_path = GOLDEN_DIR / f"{name}.parquet"
    expected = pd.read_parquet(golden_path)
    got = entry.queries()[name](spark, "/root/testdata/sf0.01").toPandas()
    assert sorted(got.columns) == sorted(expected.columns)
    fix = _NORMALIZERS.get(name)
    if fix is not None:
        got, expected = fix(got), fix(expected)
    assert _normalize(got) == _normalize(expected)


def test_python_xxh64_matches_spark(spark):
    """The golden generator derives graph ids with a pure-python XXH64;
    cross-check it against Spark's xxhash64 on representative strings."""
    spec = importlib.util.spec_from_file_location(
        "gen_goldens", REPO / "tools" / "gen_goldens.py"
    )
    gg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gg)
    samples = [
        "気候変動", "カーボンニュートラル", "Organization", "",
        "a", "1234567", "12345678", "x" * 31, "y" * 32, "z" * 100,
        "グリーン水素サプライチェーン推進コンソーシアム",
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in samples], "name string")
    got = {
        r.name: r.h
        for r in df.select(
            "name", F.xxhash64(F.col("name"), F.lit(42)).alias("h")
        ).collect()
    }
    for s in samples:
        assert got[s] == gg.name_id(s), s
