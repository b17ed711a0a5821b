"""Distribution-drift checks: binned KS and PSI (north_rule).

No scipy in the environment — the statistics are hand-rolled: the heavy part
(histogramming 10^12 rows) is a single DataFrame aggregation; the finish
(cumulative sums over a few dozen bins) is driver-side numpy, which is O(bins)
and scale-free.

* KS (used on ``dur_ms``): sup |ECDF_obs - ECDF_baseline| over shared bins.
* PSI (used on ``sr_hz``): sum((p-q) * ln(p/q)) with epsilon clamping.

The baseline is a tiny histogram table ``(column_name, bin_lo, bin_hi,
expected_share)`` (FIXTURES.md §3) — yesterday's distribution; at production
scale it is itself produced by :func:`numeric_histogram` on a previous run
and persisted.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EPS = 1e-9


def _bin_expr(col: str, lo: float, hi: float, nbins: int):
    """Uniform-bin index Column: floor((x - lo)/width) clamped to
    [0, nbins-1] — the ONE definition both numeric_histogram and
    drift_report use (duplicated copies drift apart)."""
    width = (hi - lo) / nbins
    b = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    return F.greatest(F.lit(0), F.least(F.lit(nbins - 1), b)).cast("int")


def _cat_key(r) -> str:
    """Categorical-baseline key for a row: a string ``category`` column when
    the baseline carries one (genuinely string-typed categories like codec),
    else the legacy numeric encoding where ``bin_lo`` holds the category
    value (sr_hz-style integer categories)."""
    try:
        c = r["category"]
    except (KeyError, ValueError):
        c = None
    if c is not None:
        return str(c)
    return str(int(r["bin_lo"]))


def _baseline_bins(base_rows, col: str, lo: float, hi: float, nbins: int) -> dict:
    """Map a baseline table's (bin_lo, expected_share) rows for ``col`` to
    {bin_index: share}.  round, not floor: bin_lo = lo + k*width accumulates
    fp error and floor would misassign a bin edge to k-1."""
    width = (hi - lo) / nbins
    base: dict = {}
    for r in base_rows:
        if r["column_name"] != col:
            continue
        b = int(min(nbins - 1, max(0, round((r["bin_lo"] - lo) / width))))
        base[b] = base.get(b, 0.0) + r["expected_share"]
    return base


def numeric_histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Uniform-bin histogram as one aggregation: ``(bin, cnt)``.

    Values outside [lo, hi) clamp to the edge bins (bin 0 / nbins-1); NULLs
    are dropped.  One shuffle of at most ``nbins`` rows after map-side
    partial aggregation — skew-free by construction."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(_bin_expr(col, lo, hi, nbins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def categorical_histogram(df: DataFrame, col: str) -> DataFrame:
    """Exact value histogram ``(value, cnt)`` (for low-cardinality columns
    like ``sr_hz``)."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _shares(counts: dict, keys: list) -> np.ndarray:
    total = float(sum(counts.values())) or 1.0
    return np.array([counts.get(k, 0) / total for k in keys])


def ks_statistic(obs: dict, base: dict) -> float:
    """sup-difference of cumulative shares over the union of (ordered) bins."""
    keys = sorted(set(obs) | set(base))
    p = _shares(obs, keys)
    q = _shares(base, keys)
    return float(np.max(np.abs(np.cumsum(p) - np.cumsum(q)))) if keys else 0.0


def psi_statistic(obs: dict, base: dict) -> float:
    """Population Stability Index with epsilon-clamped shares."""
    keys = sorted(set(obs) | set(base))
    p = np.clip(_shares(obs, keys), EPS, None)
    q = np.clip(_shares(base, keys), EPS, None)
    return float(np.sum((p - q) * np.log(p / q)))


def chi2_statistic(obs: dict, base_shares: dict) -> tuple[float, int]:
    """Pearson chi-square of observed COUNTS against baseline SHARES ->
    ``(chi2, dof)``.  Expected counts = clamped baseline share x observed
    total (same epsilon policy as :func:`psi_statistic` / :func:`chi2_df`,
    so categories absent from the baseline draw a finite-but-huge penalty);
    dof = union categories - 1."""
    keys = sorted(set(obs) | set(base_shares))
    n_o = np.array([obs.get(k, 0) for k in keys], dtype=np.float64)
    tot = float(n_o.sum()) or 1.0
    q = np.clip(np.array([base_shares.get(k, 0.0) for k in keys]), EPS, None)
    exp = q * tot
    return float(np.sum((n_o - exp) ** 2 / exp)), max(0, len(keys) - 1)


def chi2_critical(dof: int, z: float = 1.6448536269514722) -> float:
    """Wilson-Hilferty approximation of the chi-square quantile at the
    normal deviate ``z`` (default: 95th percentile).  Gives drift checks a
    SCALE-FREE default pass bar: unlike PSI, the chi2 statistic grows with
    row count under fixed drift, so a fixed threshold that passes at 1M
    rows fails at 100 TB — the critical value depends only on dof."""
    if dof <= 0:
        return 0.0
    h = 2.0 / (9.0 * dof)
    return dof * (1.0 - h + z * np.sqrt(h)) ** 3


@dataclass
class DriftResult:
    column: str
    metric: str  # 'ks' | 'psi' | 'chi2'
    value: float
    threshold: float
    dof: int | None = None  # chi2 only

    @property
    def passed(self) -> bool:
        return self.value <= self.threshold


def ks_drift(
    df: DataFrame,
    col: str,
    baseline: DataFrame,
    lo: float,
    hi: float,
    nbins: int,
    threshold: float = 0.1,
) -> DriftResult:
    """KS drift of ``col`` against a baseline histogram table filtered to
    ``column_name == col`` whose bins must be the same uniform grid."""
    obs_rows = numeric_histogram(df, col, lo, hi, nbins).collect()
    obs = {r["bin"]: r["cnt"] for r in obs_rows}
    base = _baseline_bins(baseline.collect(), col, lo, hi, nbins)
    return DriftResult(col, "ks", ks_statistic(obs, base), threshold)


def psi_drift(
    df: DataFrame,
    col: str,
    baseline: DataFrame,
    threshold: float = 0.2,
) -> DriftResult:
    """PSI drift of a categorical column against baseline expected shares
    (``bin_lo`` holds the category value for categorical baselines)."""
    obs_rows = categorical_histogram(df, col).collect()
    obs = {r["value"]: r["cnt"] for r in obs_rows}
    base_rows = baseline.filter(F.col("column_name") == col).collect()
    base = {_cat_key(r): r["expected_share"] for r in base_rows}
    return DriftResult(col, "psi", psi_statistic(obs, base), threshold)


def drift_report(
    df: DataFrame,
    baseline: DataFrame,
    numeric: dict | None = None,
    categorical: dict | None = None,
) -> list[DriftResult]:
    """ALL drift metrics from ONE scan of ``df``.

    ``numeric``: {col: {lo, hi, nbins, threshold, pred?}} -> KS;
    ``categorical``: {col: {threshold, pred?, metrics?, chi2_threshold?}} —
    ``metrics`` (default ``("psi",)``, may include ``"chi2"``) selects which
    statistics to derive from that column's ONE histogram; chi-square's
    threshold defaults to the Wilson-Hilferty 95% critical value for the
    realized dof (scale-free — see :func:`chi2_critical`), overridable via
    ``chi2_threshold``.  Per-row bin keys for every metric are computed in
    one projection and exploded, so the input is read once (vs one scan per
    metric) — at 100 TB the scan IS the cost; the shuffle stays a few-dozen
    -row count aggregate with map-side combine.  ``pred`` optionally
    restricts which rows enter that column's histogram (e.g. only positive
    durations)."""
    numeric = numeric or {}
    categorical = categorical or {}
    for c in (*numeric, *categorical):
        if ":" in c:
            raise ValueError(f"drift_report: column name may not contain ':': {c!r}")
    keys = []
    for col, spec in numeric.items():
        b = _bin_expr(col, spec["lo"], spec["hi"], spec["nbins"])
        cond = F.col(col).isNotNull()
        if spec.get("pred") is not None:
            cond = cond & spec["pred"]
        keys.append(F.when(cond, F.concat(F.lit(f"n:{col}:"), b.cast("string"))))
    for col, spec in categorical.items():
        cond = F.col(col).isNotNull()
        if spec.get("pred") is not None:
            cond = cond & spec["pred"]
        keys.append(
            F.when(cond, F.concat(F.lit(f"c:{col}:"), F.col(col).cast("string")))
        )
    hist_rows = (
        df.select(F.explode(F.array(*keys)).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    obs: dict[str, dict] = {}
    for r in hist_rows:
        kind, col, key = r["k"].split(":", 2)
        obs.setdefault((kind, col), {})[key] = r["cnt"]

    base_rows = baseline.collect()
    results = []
    for col, spec in numeric.items():
        base = _baseline_bins(base_rows, col, spec["lo"], spec["hi"], spec["nbins"])
        # string keys sort lexicographically; KS needs NUMERIC bin order
        o = {int(k): v for k, v in obs.get(("n", col), {}).items()}
        results.append(
            DriftResult(col, "ks", ks_statistic(o, base), spec.get("threshold", 0.1))
        )
    for col, spec in categorical.items():
        base = {
            _cat_key(r): r["expected_share"]
            for r in base_rows
            if r["column_name"] == col
        }
        o = obs.get(("c", col), {})
        metrics = spec.get("metrics", ("psi",))
        if "psi" in metrics:
            results.append(
                DriftResult(
                    col, "psi", psi_statistic(o, base), spec.get("threshold", 0.2)
                )
            )
        if "chi2" in metrics:
            chi2, dof = chi2_statistic(o, base)
            thr = spec.get("chi2_threshold")
            results.append(
                DriftResult(
                    col, "chi2", chi2,
                    chi2_critical(dof) if thr is None else thr, dof=dof,
                )
            )
    return results


def ks_df(
    obs: DataFrame,
    base: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
    round_to: int = 6,
) -> DataFrame:
    """Binned KS statistic between two DataFrames' distributions of ``col``,
    entirely as DataFrame ops — one row ``(ks)``.

    sup |cumsum(p) - cumsum(q)| over the shared uniform bins; the cumulative
    window runs over at most ``nbins`` rows (the heavy part is the two
    histogram aggregations, each one scan with map-side combine)."""
    o = (
        obs.filter(F.col(col).isNotNull())
        .groupBy(_bin_expr(col, lo, hi, nbins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bin", (F.col("n") / F.sum("n").over(Window.partitionBy())).alias("p"))
    )
    b = (
        base.filter(F.col(col).isNotNull())
        .groupBy(_bin_expr(col, lo, hi, nbins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bin", (F.col("n") / F.sum("n").over(Window.partitionBy())).alias("q"))
    )
    j = o.join(b, on="bin", how="full_outer").select(
        "bin",
        F.coalesce("p", F.lit(0.0)).alias("p"),
        F.coalesce("q", F.lit(0.0)).alias("q"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = j.select(
        (F.sum("p").over(w) - F.sum("q").over(w)).alias("d")
    )
    return cum.agg(F.round(F.max(F.abs(F.col("d"))), round_to).alias("ks"))


def psi_df(obs: DataFrame, base: DataFrame, col: str, round_to: int = 6) -> DataFrame:
    """PSI between two DataFrames' distributions of ``col``, entirely as
    DataFrame ops (no driver-side collect) — one row ``(psi)``.

    Shares are epsilon-clamped so categories missing on one side contribute
    a finite penalty (same formula as :func:`psi_statistic`)."""
    o = obs.groupBy(F.col(col).cast("string").alias("k")).agg(F.count(F.lit(1)).alias("n"))
    b = base.groupBy(F.col(col).cast("string").alias("k")).agg(F.count(F.lit(1)).alias("n"))
    o = o.select("k", (F.col("n") / F.sum("n").over(Window.partitionBy())).alias("p"))
    b = b.select("k", (F.col("n") / F.sum("n").over(Window.partitionBy())).alias("q"))
    j = o.join(b, on="k", how="full_outer").select(
        F.greatest(F.coalesce("p", F.lit(0.0)), F.lit(EPS)).alias("p"),
        F.greatest(F.coalesce("q", F.lit(0.0)), F.lit(EPS)).alias("q"),
    )
    return j.agg(
        F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), round_to).alias("psi")
    )


def baseline_from(
    df: DataFrame,
    numeric_cols: dict,
    categorical_cols: list[str],
) -> DataFrame:
    """Build a baseline_dist table from a (clean/previous) DataFrame.

    ``numeric_cols``: {col: (lo, hi, nbins)}.  Output schema extends
    FIXTURES.md §3 with a ``category`` string column: (column_name, bin_lo,
    bin_hi, expected_share, category) — categorical rows carry the category
    VALUE as a string there (so string-typed categories like codec work;
    the legacy numeric bin_lo encoding remains a read fallback), numeric
    rows carry NULL."""
    # ONE scan for every column's histogram (the drift_report shape): each
    # row projects one struct key per requested column (NULL when the value
    # is NULL — same drop semantics as the per-column histograms), explodes,
    # and a single count aggregate with map-side combine feeds all parts.
    # The old per-column union re-scanned the input once per histogram
    # family.  Shares and bin edges are the same expressions as before, so
    # the output rows are value-identical (order differs; every consumer
    # builds dicts or joins).  Struct keys, not delimited strings: category
    # values may contain any character.
    keys = []
    for col, (lo, hi, nbins) in numeric_cols.items():
        keys.append(
            F.when(
                F.col(col).isNotNull(),
                F.struct(
                    F.lit("n").alias("kind"),
                    F.lit(col).alias("col"),
                    _bin_expr(col, lo, hi, nbins).cast("string").alias("key"),
                ),
            )
        )
    for col in categorical_cols:
        keys.append(
            F.when(
                F.col(col).isNotNull(),
                F.struct(
                    F.lit("c").alias("kind"),
                    F.lit(col).alias("col"),
                    F.col(col).cast("string").alias("key"),
                ),
            )
        )
    hist = (
        df.select(F.explode(F.array(*keys)).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(F.col("k.kind").alias("kind"), F.col("k.col").alias("col"),
                 F.col("k.key").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = F.sum("cnt").over(Window.partitionBy("kind", "col"))

    def per_col(expr_for):
        out = F.lit(None).cast("double")
        for col, (lo, hi, nbins) in numeric_cols.items():
            out = F.when(F.col("col") == col, expr_for(lo, hi, nbins)).otherwise(out)
        return out

    b = F.col("key").cast("int")
    bin_lo_n = per_col(lambda lo, hi, nb: F.lit(lo) + b * F.lit((hi - lo) / nb))
    bin_hi_n = per_col(
        lambda lo, hi, nb: F.lit(lo) + (b + 1) * F.lit((hi - lo) / nb)
    )
    is_num = F.col("kind") == "n"
    return hist.select(
        F.col("col").alias("column_name"),
        # try_cast: ANSI mode throws on non-numeric categories; the legacy
        # numeric bin_lo slot is NULL for those (readers use `category`)
        F.when(is_num, bin_lo_n).otherwise(F.col("key").try_cast("double")).alias("bin_lo"),
        F.when(is_num, bin_hi_n).otherwise(F.col("key").try_cast("double")).alias("bin_hi"),
        (F.col("cnt") / total).alias("expected_share"),
        F.when(is_num, F.lit(None).cast("string")).otherwise(F.col("key")).alias("category"),
    )


def chi2_df(obs: DataFrame, base: DataFrame, col: str, round_to: int = 6) -> DataFrame:
    """Pearson chi-square drift statistic between two DataFrames'
    categorical distributions of ``col``, entirely as DataFrame ops — one
    row ``(chi2, dof)``.  Complements :func:`psi_df` (PSI weights by share
    delta; chi-square weights by expected count, so small-expected
    categories surface).  Expected counts derive from the baseline's share
    of each category scaled to the observed total; categories absent from
    the baseline get the epsilon share (finite penalty, same clamping
    policy as PSI).  All inputs to the float expression are exact integer
    counts, so the only float nondeterminism is the final <=#categories-row
    sum — rounded like psi_df."""
    o = obs.groupBy(F.col(col).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("n_o")
    )
    b = base.groupBy(F.col(col).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    j = (
        o.join(b, on="k", how="full_outer")
        .select(
            F.coalesce("n_o", F.lit(0)).cast("double").alias("n_o"),
            F.coalesce("n_b", F.lit(0)).cast("double").alias("n_b"),
        )
        .withColumn("tot_o", F.sum("n_o").over(Window.partitionBy()))
        .withColumn("tot_b", F.sum("n_b").over(Window.partitionBy()))
        .select(
            "n_o",
            (F.greatest(F.col("n_b") / F.col("tot_b"), F.lit(EPS)) * F.col("tot_o")).alias("exp"),
        )
    )
    return j.agg(
        F.round(
            F.sum((F.col("n_o") - F.col("exp")) * (F.col("n_o") - F.col("exp")) / F.col("exp")),
            round_to,
        ).alias("chi2"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("dof"),
    )
