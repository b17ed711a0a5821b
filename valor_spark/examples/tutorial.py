"""The reference tutorial validators as a reusable example.

Application/Participant fixture from /root/reference/lib/Data/Valor.hs:427-794:
nested record validators (`check1`), per-element list validation (`checkN`),
reader-monad membership checks hoisted to Membership context stages.  Used by
tests/test_tutorial.py (golden doctest parity) and the driver-contract query
``val_applications``.
"""

from __future__ import annotations

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

EA = EArray()

TEAMS = ["Taken"]  # Valor.hs:681-687
COUNTRIES = ["Croatia", "Germany", "USA", "Japan"]

APP_SCHEMA = (
    "app_id int, team string, country string, "
    "captain struct<age:int,name:string,surname:string,email:string>, "
    "members array<struct<age:int,name:string,surname:string,email:string>>"
)

# the three doctest applications (Valor.hs:753-781)
P_VALID1 = (30, "Pero", "Perić", "pero.peric@email.com")
P_VALID2 = (51, "Marko", "Marić", "marko.maric@email.com")
P_VALID3 = (29, "Jane", "Doe", "jane.doe@email.com")
P_INVALID1 = (48, "", "Perić", "peropericemailcom")
P_INVALID2 = (73, "John", "Doe", "john.doe@mail.com")
P_INVALID3 = (17, "Mini", "Morris", "")

APPS = [
    (0, "Valor", "Croatia", P_VALID1, [P_VALID2, P_VALID3]),
    (1, "Taken", "", P_VALID1, [P_INVALID1, P_VALID3]),
    (2, "srt", "Murica!", P_INVALID1, [P_INVALID2, P_VALID1, P_VALID3, P_VALID2]),
]


def participant_validator():
    """participantV (Valor.hs:636-642)."""
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
    """applicationV (Valor.hs:664-671); the reader-monad checks read the
    ``__team_taken`` / ``__country_allowed`` context columns (Membership
    stages, Valor.hs:548-553 / 593-598)."""
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


def validate_applications(spark, apps_df):
    """Run applicationV with the tutorial 'state' as Membership contexts."""
    from valor_spark.plans.engine import Membership, validate

    teams = spark.createDataFrame([(t,) for t in TEAMS], "name string")
    countries = spark.createDataFrame([(c,) for c in COUNTRIES], "name string")
    return validate(
        apps_df,
        rules={"application": application_validator()},
        key_cols=["app_id"],
        contexts=[
            Membership("__team_taken", "team", teams, "name"),
            Membership("__country_allowed", "country", countries, "name"),
        ],
    )
