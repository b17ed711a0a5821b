"""Golden port of the reference tutorial (lib/Data/Valor.hs:427-794).

The Application/Participant fixture with nested record + list validators and
reader-monad membership checks; expected error structures transcribed from
the doctest oracles at /root/reference/lib/Data/Valor.hs:785-792.
"""

import pytest
from pyspark.sql import functions as F

from valor_spark import (
    EArray,
    adapt,
    check1,
    checkN,
    conN,
    fail_if,
    field,
    make,
    pass_if,
    record,
)
from valor_spark.plans.engine import Membership, validate

EA = EArray()

APP_SCHEMA = (
    "app_id int, team string, country string, "
    "captain struct<age:int,name:string,surname:string,email:string>, "
    "members array<struct<age:int,name:string,surname:string,email:string>>"
)

P_VALID1 = (30, "Pero", "Perić", "pero.peric@email.com")
P_VALID2 = (51, "Marko", "Marić", "marko.maric@email.com")
P_VALID3 = (29, "Jane", "Doe", "jane.doe@email.com")
P_INVALID1 = (48, "", "Perić", "peropericemailcom")
P_INVALID2 = (73, "John", "Doe", "john.doe@mail.com")
P_INVALID3 = (17, "Mini", "Morris", "")

APPS = [
    # exApplicationValid (Valor.hs:753-761)
    (0, "Valor", "Croatia", P_VALID1, [P_VALID2, P_VALID3]),
    # exApplicationInvalid1 (Valor.hs:763-771)
    (1, "Taken", "", P_VALID1, [P_INVALID1, P_VALID3]),
    # exApplicationInvalid2 (Valor.hs:773-781)
    (2, "srt", "Murica!", P_INVALID1, [P_INVALID2, P_VALID1, P_VALID3, P_VALID2]),
]


def participant_validator():
    # participantV (Valor.hs:636-642)
    age_v = adapt(
        field("age"),
        pass_if(["AgeUnder"], lambda a: a > 18, EA)
        & fail_if(["AgeOver"], lambda a: a > 65, EA),
    )
    email_v = adapt(
        field("email"),
        conN(
            fail_if(["EmailEmpty"], lambda s: s == "", EA),
            pass_if(["EmailNoAt"], lambda s: s.contains("@"), EA),
            pass_if(["EmailNoDot"], lambda s: s.contains("."), EA),
        ),
    )
    return record(
        {
            "ageE": check1(lambda p: p, age_v),
            "nameE": check1(
                "name", fail_if(["name can't be empty"], lambda s: s == "", EA)
            ),
            "surnameE": check1(
                "surname", fail_if(["surname can't be empty"], lambda s: s == "", EA)
            ),
            "emailE": check1(lambda p: p, email_v),
        }
    )


def application_validator():
    """applicationV (Valor.hs:664-671) over the full row; the reader-monad
    checks (teams/countries, Valor.hs:548-553, 593-598) read context columns
    provided by Membership stages."""
    pv = participant_validator()
    team_v = conN(
        adapt(field("team"), fail_if(["TeamEmpty"], lambda s: s == "", EA)),
        adapt(field("team"), pass_if(["TeamShort"], lambda s: F.length(s) > 3, EA)),
        adapt(field("team"), fail_if(["TeamLong"], lambda s: F.length(s) > 50, EA)),
        make(
            lambda row: F.when(row.getField("__team_taken"), EA.lit(["TeamTaken"])),
            EA,
        ),
    )
    country_v = conN(
        adapt(field("country"), fail_if(["CountryEmpty"], lambda s: s == "", EA)),
        make(
            lambda row: F.when(
                ~row.getField("__country_allowed"), EA.lit(["CountryNotAllowed"])
            ),
            EA,
        ),
    )
    return record(
        {
            "teamE": check1(lambda r: r, team_v),
            "countryE": check1(lambda r: r, country_v),
            "captainE": check1("captain", pv),
            "membersE": checkN("members", pv),
        }
    )


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(APPS, APP_SCHEMA)
    # state (Valor.hs:681-687)
    teams = spark.createDataFrame([("Taken",)], "name string")
    countries = spark.createDataFrame(
        [("Croatia",), ("Germany",), ("USA",), ("Japan",)], "name string"
    )
    return validate(
        df,
        rules={"application": application_validator()},
        key_cols=["app_id"],
        contexts=[
            Membership("__team_taken", "team", teams, "name"),
            Membership("__country_allowed", "country", countries, "name",
                       broadcast=True),
        ],
    )


def test_valid_application_passes(result):
    # Valor.hs:785-786
    valid_ids = [r.app_id for r in result.valid().select("app_id").collect()]
    assert valid_ids == [0]


def test_invalid1_error_structure(result):
    # Valor.hs:788-789
    row = result.annotated.filter(F.col("app_id") == 1).collect()[0]
    v = row["__valor_application"]
    assert v.wrong is True
    e = v.err
    assert list(e.teamE) == ["TeamTaken"]
    assert list(e.countryE) == ["CountryEmpty", "CountryNotAllowed"]
    assert e.captainE is None
    assert len(e.membersE) == 2
    m0, m1 = e.membersE
    assert m0.ageE is None
    assert list(m0.nameE) == ["name can't be empty"]
    assert m0.surnameE is None
    assert list(m0.emailE) == ["EmailNoAt", "EmailNoDot"]
    assert m1 is None


def test_invalid2_error_structure(result):
    # Valor.hs:791-792
    row = result.annotated.filter(F.col("app_id") == 2).collect()[0]
    v = row["__valor_application"]
    assert v.wrong is True
    e = v.err
    assert list(e.teamE) == ["TeamShort"]
    assert list(e.countryE) == ["CountryNotAllowed"]
    assert e.captainE is not None
    assert e.captainE.ageE is None
    assert list(e.captainE.nameE) == ["name can't be empty"]
    assert e.captainE.surnameE is None
    assert list(e.captainE.emailE) == ["EmailNoAt", "EmailNoDot"]
    ms = e.membersE
    assert len(ms) == 4
    assert list(ms[0].ageE) == ["AgeOver"]
    assert ms[0].nameE is None and ms[0].surnameE is None and ms[0].emailE is None
    assert ms[1] is None and ms[2] is None and ms[3] is None


def test_violation_rows_paths_and_order(result):
    rows = (
        result.violations()
        .filter(F.col("app_id") == 1)
        .collect()
    )
    got = [(r.path, r.error) for r in rows]
    assert got == [
        (".teamE", "TeamTaken"),
        (".countryE", "CountryEmpty"),
        (".countryE", "CountryNotAllowed"),
        (".membersE[0].nameE", "name can't be empty"),
        (".membersE[0].emailE", "EmailNoAt"),
        (".membersE[0].emailE", "EmailNoDot"),
    ]


def test_valid_and_invalid_partition_input(result):
    assert result.valid().count() + result.invalid().count() == len(APPS)
    # unValid projects the original columns back out (Internal.hs:20-21)
    assert result.valid().columns == ["app_id", "team", "country", "captain", "members"]
    assert "__team_taken" not in result.valid().columns
