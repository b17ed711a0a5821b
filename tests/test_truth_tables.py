"""Port of the reference's algebraic-law tests.

Mirrors ``/root/reference/tst/Data/Valor/InternalSpec.hs``: the four-row
constructor truth tables for ``con``/``app``/``alt``/``acc``
(Internal.hs:36-46), Semigroup associativity, Monoid identities, and the
Monad laws with ``fail``/``pure`` continuations (InternalSpec.hs:147-173).

Operands are enumerated as DataFrame rows ``(a_wrong, a_err, b_wrong,
b_err)`` with small string-list payloads (mirroring ``tst/Test/Gen.hs``
generators, sizes 0-6), and expected results are computed by a plain-Python
model of the ``Wrong`` algebra.
"""

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from valor_spark import (
    EArray,
    Rule,
    acc,
    alt,
    bind,
    con,
    conN,
    fail_,
    inert,
    mk,
    pass_,
    record,
)

ET = EArray()

PAYLOADS = [[], ["x"], ["x", "y"], ["x", "x"]]
GRID = [
    Row(aw=aw, ae=ae, bw=bw, be=be, cw=cw, ce=ce)
    for aw, bw, cw in itertools.product([False, True], repeat=3)
    for ae, be, ce in itertools.product(PAYLOADS, repeat=3)
]


def operand(wrong_field, err_field):
    """A rule that replays an enumerated Wrong operand from the input row."""
    return Rule(
        lambda col: mk(col.getField(wrong_field), col.getField(err_field), ET), ET
    )


A, B, C = operand("aw", "ae"), operand("bw", "be"), operand("cw", "ce")


# plain-Python model of the Wrong algebra (Internal.hs:112-178)
def con_py(a, b):
    return (a[0] or b[0], a[1] + b[1])


def alt_py(a, b):
    return a if not a[0] else b


def acc_py(a, b):
    if not a[0]:
        return a
    if not b[0]:
        return b
    return (True, a[1] + b[1])


def run(spark, rule):
    df = spark.createDataFrame(
        GRID,
        "aw boolean, ae array<string>, bw boolean, be array<string>, "
        "cw boolean, ce array<string>",
    )
    row = F.struct(*[F.col(c) for c in df.columns])
    out = df.select(rule(row).alias("r")).collect()
    return [(r.r.wrong, list(r.r.err)) for r in out]


def expected(fn2):
    return [
        fn2((g.aw, list(g.ae)), (g.bw, list(g.be)))
        for g in GRID
    ]


def expected3(fold):
    return [
        fold((g.aw, list(g.ae)), (g.bw, list(g.be)), (g.cw, list(g.ce)))
        for g in GRID
    ]


def test_con_truth_table(spark):
    got = run(spark, con(A, B))
    assert got == [
        (w, e) for (w, e) in expected(con_py)
    ]


def test_alt_truth_table(spark):
    assert run(spark, alt(A, B)) == expected(alt_py)


def test_acc_truth_table(spark):
    assert run(spark, acc(A, B)) == expected(acc_py)


def test_semigroup_associativity(spark):
    # (a <> b) <> c == a <> (b <> c)  — InternalSpec.hs:31-38
    left = run(spark, con(con(A, B), C))
    right = run(spark, con(A, con(B, C)))
    assert left == right
    assert left == expected3(lambda a, b, c: con_py(con_py(a, b), c))


def test_monoid_identities(spark):
    # mempty <> a == a == a <> mempty  — InternalSpec.hs:47-55
    assert run(spark, con(pass_(ET), A)) == [(g.aw, list(g.ae)) for g in GRID]
    assert run(spark, con(A, pass_(ET))) == [(g.aw, list(g.ae)) for g in GRID]


def test_mconcat_order(spark):
    # mconcat folds left-to-right preserving payload order & duplicates
    got = run(spark, conN(A, B, C))
    assert got == expected3(lambda a, b, c: con_py(con_py(a, b), c))


def test_alt_acc_prefer_first_inert(spark):
    # altW/accW truth tables, InternalSpec.hs:87-111
    got_alt = run(spark, alt(A, B))
    got_acc = run(spark, acc(A, B))
    for g, ra, rc in zip(GRID, got_alt, got_acc):
        a, b = (g.aw, list(g.ae)), (g.bw, list(g.be))
        if not g.aw:
            assert ra == a and rc == a
        elif not g.bw:
            assert ra == b and rc == b
        else:
            assert ra == b
            assert rc == (True, list(g.ae) + list(g.be))


def test_app_record_wrongness_or(spark):
    # <*> ORs wrongness and keeps all payloads (Internal.hs:136-143),
    # exercised through the record builder (the engine's only use of app).
    r = record({"fa": A, "fb": B})
    df = spark.createDataFrame(
        GRID,
        "aw boolean, ae array<string>, bw boolean, be array<string>, "
        "cw boolean, ce array<string>",
    )
    row = F.struct(*[F.col(c) for c in df.columns])
    out = df.select(r(row).alias("r")).collect()
    for g, o in zip(GRID, out):
        assert o.r.wrong == (g.aw or g.bw)
        assert list(o.r.err.fa) == list(g.ae)
        assert list(o.r.err.fb) == list(g.be)


# --- Monad laws with fail/pure continuations (InternalSpec.hs:147-173) ----

def run_one(spark, rule, value=0):
    df = spark.createDataFrame([(value,)], "i int")
    r = df.select(rule(F.col("i")).alias("r")).collect()[0].r
    return (r.wrong, list(r.err))


@pytest.mark.parametrize("payload", [[], ["e1"], ["e1", "e2"]])
def test_monad_left_identity(spark, payload):
    # pure e >>= f  ==  f e   (f = fail)
    fail_cont = lambda e_col: fail_col_from(e_col)
    lhs = bind(inert(payload, ET), [], fail_cont, ET)
    rhs = fail_(payload, ET)
    assert run_one(spark, lhs) == run_one(spark, rhs)


@pytest.mark.parametrize(
    "mval", [inert(["e1"], ET), fail_(["e1"], ET), pass_(ET)]
)
def test_monad_right_identity(spark, mval):
    # v >>= pure == v  (taint keeps Wrong wrong, Internal.hs:95)
    pure_cont = lambda e_col: inert_col_from(e_col)
    assert run_one(spark, bind(mval, [], pure_cont, ET)) == run_one(spark, mval)


def fail_col_from(e_col):
    from valor_spark import fail_col

    return fail_col(lambda _col: e_col, ET)


def inert_col_from(e_col):
    from valor_spark.functions.rules import Rule as _R

    return _R(lambda col: mk(F.lit(False), e_col, ET), ET)


def test_monad_taint(spark):
    # Wrong e >>= (\_ -> pure x) must stay Wrong with x's payload
    cont = lambda e_col: inert(["after"], ET)
    got = run_one(spark, bind(fail_(["before"], ET), [], cont, ET))
    assert got == (True, ["after"])


# --- General bind_k (arbitrary e -> Valor continuations, Internal.hs:90-95)

def _k_grow(e_col):
    # data-dependent continuation: fail when the accumulated payload is
    # non-empty, appending a marker derived from its size; pure otherwise
    from valor_spark import fail_col, inert_col
    from valor_spark import test as select_rule

    return select_rule(
        fail_col(
            lambda _c: F.concat(
                e_col, F.array(F.concat(F.lit("n="), F.size(e_col).cast("string")))
            ),
            ET,
        ),
        inert_col(lambda _c: e_col, ET),
        lambda _c: F.size(e_col) == 0,
    )


def _k_upper(e_col):
    from valor_spark import inert_col

    return inert_col(lambda _c: F.transform(e_col, lambda x: F.upper(x)), ET)


@pytest.mark.parametrize("payload", [[], ["e1"], ["e1", "e2"]])
def test_bind_k_left_identity(spark, payload):
    from valor_spark import bind_k

    lhs = bind_k(inert(payload, ET), _k_grow, ET)
    rhs = _k_grow(F.lit(payload).cast("array<string>"))
    assert run_one(spark, lhs) == run_one(spark, rhs)


@pytest.mark.parametrize(
    "mval", [inert(["e1"], ET), fail_(["e1", "e2"], ET), pass_(ET)]
)
def test_bind_k_right_identity(spark, mval):
    from valor_spark import bind_k, inert_col

    pure_cont = lambda e_col: inert_col(lambda _c: e_col, ET)
    assert run_one(spark, bind_k(mval, pure_cont, ET)) == run_one(spark, mval)


@pytest.mark.parametrize(
    "mval", [inert([], ET), inert(["e1"], ET), fail_(["x"], ET)]
)
def test_bind_k_associativity(spark, mval):
    # (m >>= f) >>= g  ==  m >>= (\e -> f e >>= g), with f data-dependent
    from valor_spark import bind_k

    lhs = bind_k(bind_k(mval, _k_grow, ET), _k_upper, ET)
    rhs = bind_k(mval, lambda e: bind_k(_k_grow(e), _k_upper, ET), ET)
    assert run_one(spark, lhs) == run_one(spark, rhs)


def test_bind_k_taint_and_data_dependence(spark):
    from valor_spark import bind_k

    # Wrong ["a"] >>= _k_grow: continuation sees the payload (size 1 -> fail
    # branch appends "n=1"), and the Wrong input keeps the result Wrong.
    got = run_one(spark, bind_k(fail_(["a"], ET), _k_grow, ET))
    assert got == (True, ["a", "n=1"])
    # Inert non-empty payload: continuation's own verdict (Wrong) decides.
    got = run_one(spark, bind_k(inert(["a", "b"], ET), _k_grow, ET))
    assert got == (True, ["a", "b", "n=2"])
    # Inert empty payload: pure branch, stays Inert.
    got = run_one(spark, bind_k(inert([], ET), _k_grow, ET))
    assert got == (False, [])


# --- Wrong-value helpers (InternalSpec.hs:113-142 parity) ------------------

def test_wrong_helpers(spark):
    from valor_spark import fmap_err, is_inert, is_wrong, val_w, wrong_case

    df = spark.createDataFrame(
        [(False, ["p"]), (True, ["q"])], "w boolean, e array<string>"
    )
    v = Rule(lambda col: mk(col.getField("w"), col.getField("e"), ET), ET)
    row = F.struct(F.col("w"), F.col("e"))
    out = df.select(
        val_w(v(row)).alias("payload"),          # valW: payload regardless of tag
        is_inert(v(row)).alias("inert"),
        is_wrong(v(row)).alias("wrong"),
        wrong_case(
            v(row),
            on_wrong=lambda e: F.concat(F.lit("W:"), F.concat_ws(",", e)),
            on_inert=lambda e: F.concat(F.lit("I:"), F.concat_ws(",", e)),
        ).alias("cased"),
        fmap_err(v, lambda e: F.transform(e, lambda x: F.upper(x)))(row).alias("mapped"),
    ).collect()
    a, b = out
    assert list(a.payload) == ["p"] and list(b.payload) == ["q"]
    assert (a.inert, a.wrong) == (True, False)
    assert (b.inert, b.wrong) == (False, True)
    assert a.cased == "I:p" and b.cased == "W:q"
    # Functor keeps the tag, maps the payload (Internal.hs:128-130)
    assert (a.mapped.wrong, list(a.mapped.err)) == (False, ["P"])
    assert (b.mapped.wrong, list(b.mapped.err)) == (True, ["Q"])
