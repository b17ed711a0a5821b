"""Per-combinator behavior specs.

Ports ``/root/reference/tst/Data/ValorSpec.hs:25-124`` (one test per
combinator) and the doctest golden examples embedded in
``/root/reference/lib/Data/Valor.hs`` (pass:109-114, passIf:121-125,
fail:141-146, failIf:153-157, test:175-181, make:197-203, peek:215-230,
poke:241-256, nerf:284-285, peer:299-311, adapt:328-334, check1:344-359,
checkN:373-388).
"""

import pytest
from pyspark.sql import functions as F

from valor_spark import (
    EArray,
    EString,
    adapt,
    bind,
    check1,
    checkN,
    fail_,
    fail_col,
    fail_if,
    field,
    make,
    nerf,
    pass_,
    pass_if,
    peek,
    peer,
    poke,
    record,
)
from valor_spark import test as vtest

ES = EString()
EA = EArray()


def run_ints(spark, rule, values):
    """validateP equivalent over int inputs: list of (wrong, err)."""
    df = spark.createDataFrame([(v,) for v in values], "i int")
    out = df.select(F.col("i"), rule(F.col("i")).alias("r")).orderBy("i").collect()
    return {r.i: (r.r.wrong, r.r.err) for r in out}


def test_pass(spark):
    # >>> validateP pass 1 => Left (Valid 1)
    assert run_ints(spark, pass_(ES), [1])[1] == (False, "")


def test_fail(spark):
    # >>> validateP (fail "YOU SHALL NOT PASS!!!") 1 => Right "YOU SHALL NOT PASS!!!"
    assert run_ints(spark, fail_("YOU SHALL NOT PASS!!!", ES), [1])[1] == (
        True,
        "YOU SHALL NOT PASS!!!",
    )


def test_pass_if(spark):
    # Valor.hs:121-125
    r = pass_if("must be greater than 0", lambda i: i > 0, ES)
    got = run_ints(spark, r, [1, 0])
    assert got[1] == (False, "")
    assert got[0] == (True, "must be greater than 0")


def test_fail_if(spark):
    # Valor.hs:153-157
    r = fail_if("must be less than or equal to 0", lambda i: i > 0, ES)
    got = run_ints(spark, r, [1, -20])
    assert got[1] == (True, "must be less than or equal to 0")
    assert got[-20] == (False, "")


def test_test(spark):
    # Valor.hs:175-181: test pass (fail "I'm a failure") (>3)
    r = vtest(pass_(ES), fail_("I'm a failure", ES), lambda i: i > 3)
    got = run_ints(spark, r, [3, 4])
    assert got[3] == (False, "")
    assert got[4] == (True, "I'm a failure")


def test_make(spark):
    # Valor.hs:197-203
    r = make(
        lambda i: F.when(i > 3, F.lit(None).cast("string")).otherwise(
            F.lit("I'm 3 or less failure")
        ),
        ES,
    )
    got = run_ints(spark, r, [3, 4])
    assert got[3] == (True, "I'm 3 or less failure")
    assert got[4] == (False, "")


@pytest.fixture
def peek_rules():
    failV = fail_if("I'm less than 3", lambda i: i < 3, ES)
    passV = fail_if("I'm greater than 4", lambda i: i > 4, ES)
    testV = fail_if("I'm not divisible by 2", lambda i: i % 2 != 0, ES)
    return failV, passV, testV


def test_peek(spark, peek_rules):
    # Valor.hs:215-230
    failV, passV, testV = peek_rules
    got = run_ints(spark, peek(failV, passV, testV), [7, 6, 2, 1])
    assert got[7] == (False, "")
    assert got[6] == (True, "I'm greater than 4")
    assert got[2] == (False, "")
    assert got[1] == (True, "I'm less than 3")


def test_poke(spark):
    # Valor.hs:241-256 (list payloads, order "test error first")
    failV = fail_if(["I'm less than 3"], lambda i: i < 3, EA)
    passV = fail_if(["I'm greater than 4"], lambda i: i > 4, EA)
    testV = fail_if(["I'm not divisible by 2"], lambda i: i % 2 != 0, EA)
    got = run_ints(spark, poke(failV, passV, testV), [7, 6, 2, 1])
    assert got[7] == (False, [])
    assert got[6] == (True, ["I'm greater than 4"])
    assert got[2] == (False, [])
    assert got[1] == (True, ["I'm not divisible by 2", "I'm less than 3"])


def test_nerf(spark):
    # Valor.hs:284-285
    got = run_ints(spark, nerf(fail_("I'm an error that will never appear", ES)), [0])
    assert got[0][0] is False


def test_peer(spark):
    # Valor.hs:299-303: payload becomes nullable
    got_fail = run_ints(spark, peer(fail_("I have failed", ES)), [0])
    assert got_fail[0] == (True, "I have failed")
    got_pass = run_ints(spark, peer(pass_(ES)), [0])
    assert got_pass[0] == (False, None)


def test_peer_bind(spark):
    # Valor.hs:305-311:
    # exV = peer (failIf "I'm less than 3" (<3))
    #         >>= maybe (fail "I fail if previous validator succeeds") fail
    inner = peer(fail_if("I'm less than 3", lambda i: i < 3, ES))
    r = bind(
        inner,
        [(lambda e: e.isNull(), fail_("I fail if previous validator succeeds", ES))],
        lambda e_col: fail_col(lambda _i: e_col, ES),
        ES,
    )
    got = run_ints(spark, r, [3, 2])
    assert got[3] == (True, "I fail if previous validator succeeds")
    assert got[2] == (True, "I'm less than 3")


def test_adapt(spark):
    # Valor.hs:328-334: newtype Age wrapped as struct<unAge:int>
    df = spark.createDataFrame([((78,),), ((14,),)], "age struct<unAge:int>")
    r = adapt(field("unAge"), fail_if("under aged", lambda i: i < 18, ES))
    out = df.select(
        F.col("age.unAge").alias("v"), r(F.col("age")).alias("r")
    ).collect()
    got = {o.v: (o.r.wrong, o.r.err) for o in out}
    assert got[78] == (False, "")
    assert got[14] == (True, "under aged")


@pytest.fixture
def user_validator():
    # Valor.hs:346-359 doctest: UserError <$> check1 (unID.userID) (passIf
    # ["invalid ID"] (>0)) <*> check1 userName (failIf ["username can't be empty"] null)
    return record(
        {
            "ueID": check1(
                lambda u: u.getField("userID").getField("unID"),
                pass_if(["invalid ID"], lambda i: i > 0, EA),
            ),
            "ueName": check1(
                "userName", fail_if(["username can't be empty"], lambda s: s == "", EA)
            ),
        }
    )


USER_SCHEMA = "u struct<userID:struct<unID:int>, userName:string>"


def test_check1_record(spark, user_validator):
    df = spark.createDataFrame(
        [(((-1,), ""),), (((0,), "username"),), (((11,), "mastarija"),)], USER_SCHEMA
    )
    out = df.select(
        F.col("u.userID.unID").alias("id"), user_validator(F.col("u")).alias("r")
    ).collect()
    got = {o.id: o for o in out}
    assert got[-1].r.wrong is True
    assert list(got[-1].r.err.ueID) == ["invalid ID"]
    assert list(got[-1].r.err.ueName) == ["username can't be empty"]
    assert got[0].r.wrong is True
    assert list(got[0].r.err.ueID) == ["invalid ID"]
    assert got[0].r.err.ueName is None
    assert got[11].r.wrong is False
    assert got[11].r.err.ueID is None
    assert got[11].r.err.ueName is None


def test_checkN(spark, user_validator):
    # Valor.hs:381-388: positions preserved, Nothing for valid elements
    users = [
        ((11,), "mastarija"),   # valid
        ((0,), ""),             # invalid: both fields
        ((13,), "reygoch"),     # valid
        ((-1,), "badboy"),      # invalid: id only
    ]
    df = spark.createDataFrame(
        [(users,)],
        "us array<struct<userID:struct<unID:int>, userName:string>>",
    )
    r = checkN(lambda row: row, user_validator)
    out = df.select(r(F.col("us")).alias("r")).collect()[0].r
    assert out.wrong is True
    elems = out.err
    assert len(elems) == 4
    assert elems[0] is None
    assert list(elems[1].ueID) == ["invalid ID"]
    assert list(elems[1].ueName) == ["username can't be empty"]
    assert elems[2] is None
    assert list(elems[3].ueID) == ["invalid ID"]
    assert elems[3].ueName is None


def test_checkN_all_valid_is_inert_nothing(spark, user_validator):
    users = [((11,), "mastarija"), ((13,), "reygoch")]
    df = spark.createDataFrame(
        [(users,)],
        "us array<struct<userID:struct<unID:int>, userName:string>>",
    )
    out = df.select(checkN(lambda r: r, user_validator)(F.col("us")).alias("r")).collect()[0].r
    assert out.wrong is False
    assert out.err is None


def test_checkN_empty_and_null_arrays_pass(spark, user_validator):
    df = spark.createDataFrame(
        [([],), (None,)],
        "us array<struct<userID:struct<unID:int>, userName:string>>",
    )
    rows = df.select(checkN(lambda r: r, user_validator)(F.col("us")).alias("r")).collect()
    for row in rows:
        assert row.r.wrong is False
        assert row.r.err is None


def test_checkN_map_entries(spark):
    """checkN over a Map traversable (Valor.hs:390 is Traversable t; Haskell
    Map traverses values, keys preserved): failing entries carry their error
    under their key, passing entries are NULL, all-pass -> Inert Nothing."""
    from valor_spark import EArray, checkN_map, fail_if

    EA = EArray()
    nonempty = fail_if(["ValueEmpty"], lambda v: v == "", EA)
    df = spark.createDataFrame(
        [({"a": "x", "b": "", "c": ""},), ({"a": "x"},), ({},), (None,)],
        "attrs map<string,string>",
    )
    r = checkN_map(lambda row: row, nonempty)
    rows = df.select(r(F.col("attrs")).alias("r")).collect()
    bad, good, empty, null = [row.r for row in rows]
    assert bad.wrong is True
    assert bad.err["a"] is None
    assert list(bad.err["b"]) == ["ValueEmpty"]
    assert list(bad.err["c"]) == ["ValueEmpty"]
    for v in (good, empty, null):
        assert v.wrong is False and v.err is None


def test_checkN_map_violation_paths(spark):
    """Map entry errors flatten to [key] path segments through the engine."""
    from valor_spark import EArray, adapt, checkN_map, fail_if, field
    from valor_spark.plans.engine import validate

    EA = EArray()
    rule = adapt(
        field("attrs"),
        checkN_map(lambda m: m, fail_if(["ValueEmpty"], lambda v: v == "", EA)),
    )
    df = spark.createDataFrame(
        [(1, {"k1": "", "k2": "ok"}), (2, {"k3": "ok"})],
        "id int, attrs map<string,string>",
    )
    res = validate(df, {"attrs_nonempty": rule}, key_cols=["id"])
    vio = [(r["id"], r["path"], r["error"]) for r in res.violations().collect()]
    assert vio == [(1, "[k1]", "ValueEmpty")]
