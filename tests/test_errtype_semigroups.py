"""Payload-type Semigroup instances exercised through the combinators.

Haskell's ``Maybe e`` Semigroup (``Nothing <> x = x``, ``Just a <> Just b =
Just (a <> b)``) governs ``con`` over ``check1`` results (nullable payloads
from ``peer``, Valor.hs:361-362); error-record payloads combine field-wise.
"""

import pytest
from pyspark.sql import functions as F

from valor_spark import EArray, ENullable, ERecord, EString, check1, con, field, fail_if, pass_if, record

EA = EArray()


def run_one(spark, rule, value):
    df = spark.createDataFrame([(value,)], "i int")
    return df.select(rule(F.col("i")).alias("r")).collect()[0].r


@pytest.mark.parametrize(
    "value, expect_wrong, expect_err",
    [
        (10, False, None),                          # Nothing <> Nothing = Nothing
        (-5, True, ["neg", "zeroish", "neg2"]),     # Just a <> Just b = Just (a<>b)
        (0, True, ["zeroish"]),                     # Just a <> Nothing = Just a
    ],
)
def test_maybe_semigroup_via_con_of_check1(spark, value, expect_wrong, expect_err):
    ident = lambda c: c
    r1 = check1(ident, con(
        fail_if(["neg"], lambda i: i < 0, EA),
        fail_if(["zeroish"], lambda i: i <= 0, EA),
    ))
    r2 = check1(ident, fail_if(["neg2"], lambda i: i < 0, EA))
    combined = con(r1, r2)
    assert isinstance(combined.etype, ENullable)
    got = run_one(spark, combined, value)
    assert got.wrong is expect_wrong
    if expect_err is None:
        assert got.err is None
    else:
        assert list(got.err) == expect_err


def test_record_payloads_combine_fieldwise(spark):
    ident = lambda c: c
    ra = record({"f1": check1(ident, fail_if(["a1"], lambda i: i < 0, EA)),
                 "f2": check1(ident, fail_if(["a2"], lambda i: i == 0, EA))})
    rb = record({"f1": check1(ident, fail_if(["b1"], lambda i: i < -5, EA)),
                 "f2": check1(ident, fail_if(["b2"], lambda i: i == 0, EA))})
    combined = con(ra, rb)
    assert isinstance(combined.etype, ERecord)
    got = run_one(spark, combined, -10)
    assert got.wrong is True
    assert list(got.err.f1) == ["a1", "b1"]   # Just<>Just concatenates in order
    assert got.err.f2 is None                  # Nothing<>Nothing
    got0 = run_one(spark, combined, 0)
    assert list(got0.err.f2) == ["a2", "b2"]
    assert got0.err.f1 is None


def test_estring_concat_semigroup(spark):
    ES = EString()
    r = con(fail_if("ab", lambda i: i < 0, ES), fail_if("cd", lambda i: i < 0, ES))
    got = run_one(spark, r, -1)
    # Haskell String is [Char]: <> is concatenation
    assert (got.wrong, got.err) == (True, "abcd")
    got_pass = run_one(spark, r, 1)
    assert (got_pass.wrong, got_pass.err) == (False, "")
