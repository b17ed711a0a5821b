"""Golden port of the reference tutorial (lib/Data/Valor.hs:427-794).

The Application/Participant fixture with nested record + list validators and
reader-monad membership checks; expected error structures transcribed from
the doctest oracles at /root/reference/lib/Data/Valor.hs:785-792.  The
validators live in valor_spark.examples.tutorial (also exercised by the
driver-contract query ``val_applications``).
"""

import pytest
from pyspark.sql import functions as F

from valor_spark.examples.tutorial import APP_SCHEMA, APPS, validate_applications

@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(APPS, APP_SCHEMA)
    return validate_applications(spark, df)


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
