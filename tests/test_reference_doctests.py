"""Golden port of EVERY ``>>>`` doctest example in the reference's public
module (/root/reference/lib/Data/Valor.hs, line refs per test) — the doctest
suite (tst/Doctest.hs) is one of the reference's three test layers, so each
example is replicated verbatim: same validators, same inputs, same expected
``Left (Valid i)`` / ``Right e`` outcome and error VALUE (including payload
order).  ``Left (Valid i)`` == verdict wrong=False; ``Right e`` == wrong=True
with payload e.  (The tutorial's big Application oracle lives in
test_tutorial.py; validateM examples are covered there.)
"""

import pytest
from pyspark.sql import functions as F

import valor_spark as V

ES = V.EString()
EA = V.EArray()


def run1(spark, rule, value, schema="x int"):
    df = spark.createDataFrame([(value,)], schema)
    r = df.select(rule(F.col("x")).alias("r")).collect()[0].r
    return r.wrong, r.err


def test_pass_doctest(spark):
    # Valor.hs:109-110: validateP pass 1 -> Left (Valid 1)
    wrong, _ = run1(spark, V.pass_(ES), 1)
    assert wrong is False


def test_passIf_doctests(spark):
    # Valor.hs:120-125
    v = V.pass_if("must be greater than 0", lambda i: i > 0, ES)
    assert run1(spark, v, 1) == (False, "")
    assert run1(spark, v, 0) == (True, "must be greater than 0")


def test_fail_doctest(spark):
    # Valor.hs:140-141
    assert run1(spark, V.fail_("YOU SHALL NOT PASS!!!", ES), 1) == (
        True,
        "YOU SHALL NOT PASS!!!",
    )


def test_failIf_doctests(spark):
    # Valor.hs:152-157
    v = V.fail_if("must be less than or equal to 0", lambda i: i > 0, ES)
    assert run1(spark, v, 1) == (True, "must be less than or equal to 0")
    assert run1(spark, v, -20) == (False, "")


def test_test_doctests(spark):
    # Valor.hs:173-181: test pass (fail "I'm a failure") (>3)
    v = V.test(V.pass_(ES), V.fail_("I'm a failure", ES), lambda i: i > 3)
    assert run1(spark, v, 3) == (False, "")
    assert run1(spark, v, 4) == (True, "I'm a failure")


def test_make_doctests(spark):
    # Valor.hs:195-203: Nothing if i > 3 else Just "I'm 3 or less failure"
    v = V.make(
        lambda i: F.when(~(i > 3), F.lit("I'm 3 or less failure")), ES
    )
    assert run1(spark, v, 3) == (True, "I'm 3 or less failure")
    assert run1(spark, v, 4) == (False, "")


@pytest.fixture()
def peek_poke_rules():
    def mk(et, lift):
        failV = V.fail_if(lift("I'm less than 3"), lambda i: i < 3, et)
        passV = V.fail_if(lift("I'm greater than 4"), lambda i: i > 4, et)
        testV = V.fail_if(lift("I'm not divisible by 2"), lambda i: i % 2 == 1, et)
        return failV, passV, testV

    return mk


def test_peek_doctests(spark, peek_poke_rules):
    # Valor.hs:213-230 (String payload; test's error discarded)
    failV, passV, testV = peek_poke_rules(ES, lambda s: s)
    v = V.peek(failV, passV, testV)
    assert run1(spark, v, 7) == (False, "")
    assert run1(spark, v, 6) == (True, "I'm greater than 4")
    assert run1(spark, v, 2) == (False, "")
    assert run1(spark, v, 1) == (True, "I'm less than 3")


def test_poke_doctests(spark, peek_poke_rules):
    # Valor.hs:238-256 ([String] payload; both-fail mappends TEST error first)
    failV, passV, testV = peek_poke_rules(EA, lambda s: [s])
    v = V.poke(failV, passV, testV)
    wrong, err = run1(spark, v, 7)
    assert (wrong, list(err)) == (False, [])
    wrong, err = run1(spark, v, 6)
    assert (wrong, list(err)) == (True, ["I'm greater than 4"])
    wrong, err = run1(spark, v, 2)
    assert (wrong, list(err)) == (False, [])
    wrong, err = run1(spark, v, 1)
    assert (wrong, list(err)) == (
        True,
        ["I'm not divisible by 2", "I'm less than 3"],
    )


def test_nerf_doctest(spark):
    # Valor.hs:282-285
    wrong, _ = run1(spark, V.nerf(V.fail_("I'm an error that will never appear", ES)), 0)
    assert wrong is False


def test_peer_doctests(spark):
    # Valor.hs:296-311
    wrong, err = run1(spark, V.peer(V.fail_("I have failed", ES)), 0)
    assert (wrong, err) == (True, "I have failed")  # Right (Just "...")
    wrong, err = run1(spark, V.peer(V.pass_(ES)), 0)
    assert (wrong, err) == (False, None)  # Inert Nothing


def test_peer_bind_doctests(spark):
    # Valor.hs:304-311: peer (failIf "I'm less than 3" (<3))
    #   >>= maybe (fail "I fail if previous validator succeeds") fail
    v = V.bind(
        V.peer(V.fail_if("I'm less than 3", lambda i: i < 3, ES)),
        branches=[
            (
                lambda e: e.isNull(),  # Nothing -> the 'maybe' default
                V.fail_("I fail if previous validator succeeds", ES),
            )
        ],
        # Just e -> fail e (re-fail with the peered payload)
        default=lambda e: V.fail_col(lambda _i: e, ES),
        etype=ES,
    )
    assert run1(spark, v, 3) == (True, "I fail if previous validator succeeds")
    assert run1(spark, v, 2) == (True, "I'm less than 3")


def test_adapt_doctests(spark):
    # Valor.hs:326-334: newtype Age -> struct field unAge
    v = V.adapt(V.field("unAge"), V.fail_if("under aged", lambda a: a < 18, ES))
    schema = "x struct<unAge:int>"
    assert run1(spark, v, (78,), schema) == (False, "")
    assert run1(spark, v, (14,), schema) == (True, "under aged")


USER_SCHEMA = "x struct<userID:struct<unID:int>, userName:string>"


def _user_validator():
    # Valor.hs:351-354: UserError <$> check1 (unID . userID) (passIf ["invalid ID"] (>0))
    #                             <*> check1 userName (failIf ["username can't be empty"] null)
    return V.record(
        {
            "ueID": V.check1(
                V.field("userID", "unID"),
                V.pass_if(["invalid ID"], lambda i: i > 0, EA),
            ),
            "ueName": V.check1(
                V.field("userName"),
                V.fail_if(["username can't be empty"], lambda s: s == "", EA),
            ),
        }
    )


def test_check1_doctests(spark):
    # Valor.hs:356-359
    v = _user_validator()
    wrong, err = run1(spark, v, ((-1,), ""), USER_SCHEMA)
    assert wrong is True
    assert list(err.ueID) == ["invalid ID"]
    assert list(err.ueName) == ["username can't be empty"]
    wrong, err = run1(spark, v, ((0,), "username"), USER_SCHEMA)
    assert wrong is True
    assert list(err.ueID) == ["invalid ID"] and err.ueName is None
    wrong, err = run1(spark, v, ((11,), "mastarija"), USER_SCHEMA)
    assert wrong is False


def test_checkN_doctest(spark):
    # Valor.hs:373-388: the four-user list example
    users = [((11,), "mastarija"), ((0,), ""), ((13,), "reygoch"), ((-1,), "badboy")]
    v = V.checkN(lambda row: row, _user_validator())
    schema = "x array<struct<userID:struct<unID:int>, userName:string>>"
    wrong, elems = run1(spark, v, users, schema)
    assert wrong is True
    assert elems[0] is None and elems[2] is None  # valid users -> Nothing
    assert list(elems[1].ueID) == ["invalid ID"]
    assert list(elems[1].ueName) == ["username can't be empty"]
    assert list(elems[3].ueID) == ["invalid ID"] and elems[3].ueName is None
