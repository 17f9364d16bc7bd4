"""Pipeline-level golden tests: run the full economics ETL on
reference-shaped fixtures and assert the 11-table contract from
FIXTURES.md (schemas, PK invariants, spot aggregates, melt identity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from state_economics_end_to_end_data_pipeline_spark.pipelines.economics import (
    PRIMARY_KEYS,
    EconomicsETL,
)
from state_economics_end_to_end_data_pipeline_spark.operators.quality import (
    duplicate_keys,
    null_key_count,
)

EXPECTED_SCHEMAS = {
    "table_location": {"GeoFIPS": "int", "GeoName": "string", "Region": "double"},
    "table_Unemployment": {"GeoFIPS": "int", "Year": "int", "Unemployment_Rate": "double"},
    "table_HouseholdIncome2021": {"GeoFIPS": "int", "Median_Household_Income_2021": "double"},
    "table_gdp": {"GeoFIPS": "int", "Year": "int", "Industry_Code": "int", "GDP": "double"},
    "table_industry": {"Industry_Code": "int", "Description": "string"},
    "table_school_expense_type": {
        "School_Expense_Type_Id": "int", "School_Type": "string",
        "Length": "string", "Expense_Type": "string",
    },
    "table_school_expenses": {
        "Year": "int", "GeoFIPS": "int", "School_Expense_Type_Id": "int",
        "Expense_Amount": "int",
    },
    "table_state_min_wage": {
        "Year": "int", "GeoFIPS": "int", "State_Min_Wage": "double",
        "Small_Business_Min_Wage": "double", "Large_Business_Min_Wage": "double",
    },
    "table_inflation": {"Year": "int", "Inflation_Multiplier_2020": "double"},
    "table_CPI": {"Year": "int", "CPI_Average": "double"},
    "table_fed_min_wage": {"Year": "int", "Fed_Min_Wage": "double"},
}


@pytest.fixture(scope="module")
def tables(spark, fixture_paths):
    etl = EconomicsETL(spark=spark, **fixture_paths)
    return etl.run(validate=True)


def test_eleven_tables(tables):
    assert set(tables) == set(EXPECTED_SCHEMAS)


def test_schemas(tables):
    for name, expected in EXPECTED_SCHEMAS.items():
        got = dict(tables[name].dtypes)
        assert got == expected, f"{name}: {got} != {expected}"


def test_primary_keys(tables):
    for name, keys in PRIMARY_KEYS.items():
        df = tables[name]
        assert null_key_count(df, keys) == 0, f"{name}: null keys"
        assert duplicate_keys(df, keys).count() == 0, f"{name}: dup keys"


def test_location_coalesced_names(tables):
    loc = tables["table_location"].toPandas()
    assert loc["GeoName"].notna().all()
    # US-total row: '*' stripped, Region null (blank-coerced)
    us = loc[loc["GeoFIPS"] == 0]
    assert len(us) == 1 and us.iloc[0]["GeoName"] == "United States"
    assert us.iloc[0]["Region"] != us.iloc[0]["Region"]  # NaN


def test_gdp_sentinels_null_and_scaled(tables, spark, fixture_paths):
    gdp = tables["table_gdp"]
    assert gdp.filter(F.col("GDP").isNull()).count() > 0  # (D)/(L)/(NA)
    # values scaled to dollars: max must exceed raw millions cap
    assert gdp.agg(F.max("GDP")).first()[0] > 1_000_000


def test_melt_identity(spark, fixture_paths, tables):
    """rows(table_gdp) = gdp data rows x 24 year cols (dedup is a no-op on
    the synthetic fixture: keys are unique by construction)."""
    etl = EconomicsETL(spark=spark, **fixture_paths)
    n_raw = etl.load_gdp().count()
    assert tables["table_gdp"].count() == n_raw * 24


def test_school_expense_type_dim(tables):
    dim = tables["table_school_expense_type"].toPandas().sort_values(
        "School_Expense_Type_Id"
    )
    assert list(dim["School_Expense_Type_Id"]) == list(range(8))


def test_inflation_one_row_per_year(tables):
    inf = tables["table_inflation"]
    assert inf.count() == inf.select("Year").distinct().count() == 53  # 1968-2020


def test_min_wage_drops_unknown_jurisdictions(tables):
    """Guam/PR/USVI are not in the location dim -> inner join drops them."""
    mw = tables["table_state_min_wage"]
    assert mw.select("GeoFIPS").distinct().count() == 21  # the 21 fixture states


def test_validate_outputs_catches_fk_violation(spark, tables):
    """The integrity gate must reject a corrupted output set: planting an
    orphan GeoFIPS in table_Unemployment (no parent in table_location)
    raises naming that edge; the clean set passes (exercised by the
    `tables` fixture itself, which runs with validate=True)."""
    import pytest
    from pyspark.sql import functions as F

    from state_economics_end_to_end_data_pipeline_spark.pipelines.economics import (
        EconomicsETL,
    )

    corrupted = dict(tables)
    orphan = (
        tables["table_Unemployment"]
        .limit(1)
        .withColumn("GeoFIPS", F.lit(999999))
    )
    corrupted["table_Unemployment"] = tables["table_Unemployment"].unionByName(orphan)
    with pytest.raises(ValueError, match="table_Unemployment.GeoFIPS"):
        EconomicsETL.validate_outputs(corrupted)
