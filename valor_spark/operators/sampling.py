"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is sampled *reproducibly* or not at all: ``df.sample()``
depends on partition layout and RNG state, so two runs (or a resume after a
failure) disagree about which rows were kept.  These operators decide
per-row from a content hash instead — the same row is kept by every run,
every partitioning, and every engine:

* ``hash_sample``        — Bernoulli(p) by md5 hash of the key (+ seed):
  a pure filter, no shuffle, whole-stage codegen;
* ``stratified_sample``  — per-stratum fractions via one CASE over the
  stratum column, still one shuffle-free filter;
* ``sample_k_per_group`` — EXACTLY k rows per group, smallest-hash-first
  (deterministic "reservoir"): one shuffle on the group key, rank pruned
  per partition.

Portability note: the sampling decision is ``substring(md5(key || ':' ||
seed), 1, 8) < hex_threshold`` — lowercase-hex md5 prefixes compare
lexicographically exactly like the numbers they encode, and md5 is
identical everywhere, so a DuckDB/Trino/any-engine oracle reproduces the
exact row set (unlike murmur/xxhash whose seeds differ per engine).
md5 costs more than murmur but the scan dominates at scale; 8 hex chars =
32 bits of sampling resolution (granularity 2^-32).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_BITS = 8  # hex chars of the md5 prefix used for the decision


def _threshold_hex(fraction: float) -> str:
    """fraction in [0,1] -> 8-char lowercase hex threshold."""
    n = int(fraction * (16 ** _HEX_BITS))
    return format(n, f"0{_HEX_BITS}x")


def sample_bucket(key: Column, seed: str = "") -> Column:
    """The deterministic per-row sampling bucket: first 8 hex chars of
    ``md5(key || ':' || seed)``.  Exposed so oracles/tests can reproduce
    the decision.  A NULL key hashes as the empty string — without the
    coalesce, ``concat`` propagates NULL and the comparison silently drops
    NULL-key rows at every fraction below 1.0 while ``fraction=1.0``
    (a plain ``lit(True)``) keeps them: an inconsistent, easy-to-miss
    filter.  Oracles replicate with ``COALESCE(CAST(k AS VARCHAR), '')``."""
    return F.substring(
        F.md5(F.concat(F.coalesce(key.cast("string"), F.lit("")), F.lit(":" + seed))),
        1,
        _HEX_BITS,
    )


def _keep(key: Column, fraction: float, seed: str) -> Column:
    if fraction <= 0.0:
        return F.lit(False)
    if fraction >= 1.0:
        return F.lit(True)
    return sample_bucket(key, seed) < F.lit(_threshold_hex(fraction))


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, seed: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``key_col``."""
    return df.filter(_keep(F.col(key_col), fraction, seed))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum value
    -> keep fraction; strata not listed get ``default_fraction``.  Compiles
    to ONE filter with a CASE over the stratum column — no shuffle, no
    per-stratum passes, codegen-friendly at any corpus size."""
    return df.filter(
        stratified_keep_expr(stratum_col, fractions, key_col, seed,
                             default_fraction)
    )


def stratified_keep_expr(
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "",
    default_fraction: float = 0.0,
) -> Column:
    """The CASE keep-predicate behind :func:`stratified_sample`, exposed as
    a Column so composite pipelines can fold the sampling decision into an
    existing aggregate instead of materializing a filtered frame just to
    count it."""
    key = F.col(key_col)
    keep = _keep(key, default_fraction, seed)
    for value, frac in sorted(fractions.items()):
        keep = F.when(F.col(stratum_col) == F.lit(value), _keep(key, frac, seed)).otherwise(keep)
    return keep


def sample_k_per_group(
    df: DataFrame,
    group_cols: list[str] | str,
    k: int,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """EXACTLY min(k, group size) rows per group, chosen as the k smallest
    sampling buckets — a deterministic reservoir for per-class balancing.
    One shuffle on the group key; the rank filter prunes inside the window
    stage so only k rows per group survive it."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    w = Window.partitionBy(*group_cols).orderBy(
        sample_bucket(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
