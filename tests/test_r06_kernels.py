"""Focused equivalence tests for the round-6 vectorized kernels: each one
re-states the operator's old Column-expression form inline and asserts the
kernel reproduces it exactly (the optimization contract — same rows, same
bits — independent of the oracle gate)."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from valor_spark.operators.dedup import (
    _list_column_tokens,
    _token_hashes_np,
    _token_hashes_offsets,
    tokens,
)
from valor_spark.operators.text import (
    _winnow_arrow,
    kgram_hashes_t,
    winnow_t,
)


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox jumps over the lazy dog again and again"),
    (4, "short"),
    (5, ""),
    (6, None),
    (7, "héllo wörld müst stay éxact héllo wörld müst stay éxact more"),
    (8, "a b a b a b a b a b a b"),
]


def test_token_hashes_offsets_matches_string_fold():
    col = pa.array(
        [["the", "quick", "fox"], ["héllo", "wörld", "x"], None, [],
         ["mixed", "ascïi", "run"]],
        type=pa.list_(pa.string()),
    )
    flat, lens0, starts0 = _list_column_tokens(col)
    hs0 = _token_hashes_np(flat)
    hs1, lens1, starts1 = _token_hashes_offsets(col)
    assert (hs0 == hs1).all()
    assert (lens0 == lens1).all() and (starts0 == starts1).all()


def test_token_hashes_offsets_non_ascii_vectorized_fold(spark):
    """The vectorized UTF-16 fallback must reproduce Spark's own
    split('')/ascii fold for CJK, combining-mark, and non-BMP (surrogate
    pair) tokens — Java chars are UTF-16 units, so an emoji folds as TWO
    units."""
    from valor_spark.operators.dedup import token_hash

    toks = [
        "漢字テスト", "русский", "mixé", "🚀rocket", "a🚀b", "🚀",
        "éclair", "plain", "ümlaut-ö", "ḟancy\U0001F600end",
    ]
    col = pa.array([toks], type=pa.list_(pa.string()))
    hs, _, _ = _token_hashes_offsets(col)
    want = [
        r["h"]
        for r in spark.createDataFrame([(t,) for t in toks], "tok string")
        .select(token_hash(F.col("tok")).alias("h"))
        .collect()
    ]
    assert list(hs) == want


def test_token_hashes_offsets_empty():
    col = pa.array([], type=pa.list_(pa.string()))
    hs, lens, starts = _token_hashes_offsets(col)
    assert len(hs) == 0 and len(lens) == 0 and list(starts) == [0]


def test_winnow_kernel_matches_column_chain(spark):
    df = spark.createDataFrame(CORPUS, "doc_id int, text string")
    base = df.select(
        F.col("doc_id").alias("doc"), tokens(F.col("text")).alias("__toks")
    )
    old = (
        base.select("doc", kgram_hashes_t(F.col("__toks"), 4).alias("__kh"))
        .select("doc", F.explode(winnow_t(F.col("__kh"), 4)).alias("fp_hex"))
    )
    old_rows = {(r["doc"], r["fp_hex"]) for r in old.collect()}
    new = base.mapInArrow(_winnow_arrow(4, 4, "doc", "fps"), "doc int, fp long")
    new_rows = {
        (r["doc"], "%016x" % (r["fp"] & 0xFFFFFFFFFFFFFFFF))
        for r in new.collect()
    }
    assert old_rows == new_rows


def test_winnow_profile_kernel_matches_column_chain(spark):
    from valor_spark.operators.text import winnow_profile

    df = spark.createDataFrame(CORPUS, "doc_id int, text string")
    base = df.select(F.col("doc_id"), tokens(F.col("text")).alias("__toks"))
    oldp = (
        base.select("doc_id", kgram_hashes_t(F.col("__toks"), 4).alias("__kh"))
        .select(
            "doc_id",
            F.size(F.col("__kh")).alias("n_kgrams"),
            winnow_t(F.col("__kh"), 4).alias("__fp"),
        )
        .select(
            "doc_id",
            "n_kgrams",
            F.size("__fp").alias("n_fp"),
            F.when(F.size("__fp") == 0, F.lit(None).cast("string")).otherwise(
                F.substring(F.md5(F.concat_ws(",", F.col("__fp"))), 1, 16)
            ).alias("fp_digest"),
        )
    )
    assert sorted(map(tuple, oldp.collect())) == sorted(
        map(tuple, winnow_profile(df).collect())
    )


def test_knn_bucket_kernel_matches_hof_path(spark):
    import valor_spark.operators.similarity as SIM

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(120)
    ] + [(900, [0.0] * 16)]  # zero vector exercises the den==0 guard
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    new = SIM.knn_graph(emb, k=3, n_planes=4, n_tables=2, dim=16)
    ref = SIM.knn_graph(emb, k=3, n_planes=4, n_tables=2, dim=None)
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, ref.collect()))


def test_spread_width_caps_and_floors(spark):
    from valor_spark.utils import spread_width

    tiny = spark.range(10).selectExpr("id", "cast(id as string) s")
    assert spread_width(tiny) >= 1
    assert spread_width(tiny) <= spark.sparkContext.defaultParallelism * 2


@pytest.mark.parametrize("n", [2, 5])
def test_contamination_kernel_matches_shingle_chain(spark, n):
    from valor_spark.operators.text import shingles_t

    df = spark.createDataFrame(CORPUS, "doc_id int, text string")
    old = (
        df.select(F.col("doc_id").alias("t"), tokens(F.col("text")).alias("__toks"))
        .select("t", F.explode(shingles_t(F.col("__toks"), n)).alias("sh"))
        .select("t", F.substring(F.md5("sh"), 1, 16).alias("h"))
    )
    o = {(r["t"], r["h"]) for r in old.collect()}
    new = (
        df.select(F.col("doc_id").alias("t"), tokens(F.col("text")).alias("__toks"))
        .mapInArrow(_winnow_arrow(n, 1, "t", "fps"), "t int, fp long")
    )
    nw = {(r["t"], "%016x" % (r["fp"] & 0xFFFFFFFFFFFFFFFF)) for r in new.collect()}
    assert o == nw
