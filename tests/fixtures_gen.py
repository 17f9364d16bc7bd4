"""Synthesize the 4 reference-shaped raw sources per FIXTURES.md.

Structure, types, and quirks mirror the reference inputs exactly
(banner/footer rows, cp1252 en-dash, '$'-strings, (D)/(L)/(NA) sentinels,
dotted column names, zero-padded FIPS strings); values are synthetic and
deterministic (seeded).
"""

from __future__ import annotations

import random
from pathlib import Path

from ._xlsx import write_xlsx

STATES = [
    ("Alabama", 1), ("Alaska", 2), ("Arizona", 4), ("Arkansas", 5),
    ("California", 6), ("Colorado", 8), ("Connecticut", 9), ("Delaware", 10),
    ("District of Columbia", 11), ("Florida", 12), ("Georgia", 13),
    ("Hawaii", 15), ("Idaho", 16), ("Illinois", 17), ("Indiana", 18),
    ("Iowa", 19), ("Kansas", 20), ("Kentucky", 21), ("Louisiana", 22),
    ("Maine", 23), ("Maryland", 24),
]
EXTRA_JURISDICTIONS = ["Guam", "Puerto Rico", "U.S. Virgin Islands"]
BEA_REGIONS = [
    ("New England", 91), ("Mideast", 92), ("Great Lakes", 93), ("Plains", 94),
]
INDUSTRY_CODES = [(1, "  All industry total"), (2, "   Private industries"),
                  (3, "    Agriculture, forestry, fishing and hunting"),
                  (6, "    Mining, quarrying, and oil and gas extraction"),
                  (10, "    Utilities"), (11, "    Construction"),
                  (12, "    Manufacturing"), (34, "    Retail trade"),
                  (59, "     Real estate"), (83, "    Government")]
SCHOOL_COMBOS = [
    ("Private", "2-year", "Fees/Tuition"), ("Private", "4-year", "Fees/Tuition"),
    ("Private", "4-year", "Room/Board"), ("Public In-State", "2-year", "Fees/Tuition"),
    ("Public In-State", "4-year", "Fees/Tuition"), ("Public In-State", "4-year", "Room/Board"),
    ("Public Out-of-State", "2-year", "Fees/Tuition"), ("Public Out-of-State", "4-year", "Fees/Tuition"),
]


def scaled_states(n_states: int) -> list[tuple[str, int]]:
    """The real 21 jurisdictions extended with synthetic ones (unique
    name, unique FIPS starting clear of the real/BEA ranges) -- the
    scale axis for the ETL depth probe: every fixture's row count is
    linear in the state list, so n_states ~ 21,000 yields a ~1000x
    reference-shaped corpus with identical quirks (banners, sentinels,
    cp1252, '$'-strings)."""
    extra = [
        (f"Synthetic State {i:05d}", 100 + i)
        for i in range(n_states - len(STATES))
    ]
    return STATES + extra


def gen_unemployment_xlsx(
    path: Path, rng: random.Random, states: list[tuple[str, int]] = STATES
) -> None:
    """FIXTURES.md fixture 1: 3 banner rows, empty col A, header with
    trailing-space 'FIPS ' + mixed year labels, '$'-string income, footer."""
    years = list(range(2014, 2023))
    rows: list[list[object]] = [
        [None, None, "Unemployment Rate (percent)"],
        [None],
        [None, None, None, "source: synthetic"],
        [None, "FIPS ", "Name"]
        + [str(y) if y % 2 == 0 else float(y) for y in years]
        + ["Median Household Income (2021)"],
    ]
    for name, fips in states:
        income = rng.randint(40_000, 90_000)
        rates: list[object] = [
            round(rng.uniform(2.0, 11.0), 1) if rng.random() > 0.05 else None
            for _ in years
        ]
        rows.append([None, f"{fips:02d}000", name] + rates + [f"${income:,}"])
    rows.append([None, "Sources: synthetic fixture, do not cite."])
    write_xlsx(str(path), rows)


def gen_gdp_csv(
    path: Path, rng: random.Random, states: list[tuple[str, int]] = STATES
) -> None:
    """FIXTURES.md fixture 2: ' "01000"' GeoFIPS, US-total row with '*' name
    and blank Region, (D)/(L)/(NA) sentinels, 4 footer note lines."""
    years = list(range(1997, 2021))
    header = (
        "GeoFIPS,GeoName,Region,TableName,LineCode,IndustryClassification,"
        "Description,Unit," + ",".join(str(y) for y in years)
    )
    lines = [header]
    geos = [("United States *", 0, " ")] + [
        (name, fips, str(rng.randint(1, 8))) for name, fips in states
    ] + [(name, fips, " ") for name, fips in BEA_REGIONS]
    for geo_name, fips, region in geos:
        for code, desc in INDUSTRY_CODES:
            vals = []
            for _ in years:
                r = rng.random()
                if r < 0.02:
                    vals.append("(D)")
                elif r < 0.03:
                    vals.append("(L)")
                elif r < 0.04:
                    vals.append("(NA)")
                else:
                    vals.append(str(round(rng.uniform(100.0, 900000.0), 1)))
            lines.append(
                f' "{fips:02d}000","{geo_name}",{region},SAGDP2N,{code},"...",'
                f'"{desc}","Millions of current dollars",' + ",".join(vals)
            )
    lines += [
        '"Note. See the included footnotes file."',
        '"1. Synthetic fixture values."',
        '"2. Not real BEA data."',
        '"Last updated: never"',
    ]
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")


def gen_school_csv(
    path: Path, rng: random.Random, states: list[tuple[str, int]] = STATES
) -> None:
    """FIXTURES.md fixture 3: clean CSV, 8 distinct (Type,Length,Expense)."""
    lines = ["Year,State,Type,Length,Expense,Value"]
    for year in range(2013, 2022):
        for name, _ in states:
            for t, length, exp in SCHOOL_COMBOS:
                lines.append(
                    f"{year},{name},{t},{length},{exp},{rng.randint(1000, 40000)}"
                )
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")


def gen_min_wage_csv(
    path: Path, rng: random.Random, states: list[tuple[str, int]] = STATES
) -> None:
    """FIXTURES.md fixture 4: Windows-1252 (0x96 en-dash), dotted column
    names, zero wages (division edge), extra jurisdictions, footnotes."""
    cols = [
        "Year", "State", "State.Minimum.Wage", "State.Minimum.Wage.2020.Dollars",
        "Federal.Minimum.Wage", "Federal.Minimum.Wage.2020.Dollars",
        "Effective.Minimum.Wage", "Effective.Minimum.Wage.2020.Dollars",
        "CPI.Average", "Department.Of.Labor.Uncleaned.Data",
        "Department.Of.Labor.Cleaned.Low.Value",
        "Department.Of.Labor.Cleaned.Low.Value.2020.Dollars",
        "Department.Of.Labor.Cleaned.High.Value",
        "Department.Of.Labor.Cleaned.High.Value.2020.Dollars", "Footnote",
    ]
    lines = [",".join(cols)]
    jurisdictions = [name for name, _ in states] + EXTRA_JURISDICTIONS
    for year in range(1968, 2021):
        cpi = round(30.0 + (year - 1968) * 4.7, 3)
        fed = round(1.0 + (year - 1968) * 0.12, 2)
        mult = round(258.8 / cpi, 4)
        for state in jurisdictions:
            zero = rng.random() < 0.06
            wage = 0.0 if zero else round(rng.uniform(1.0, 14.0), 2)
            low = round(wage * rng.uniform(0.7, 1.0), 2)
            high = round(wage * rng.uniform(1.0, 1.3), 2)
            # – en-dash encodes to byte 0x96 in windows-1252
            unclean = rng.choice(["...", f"{low} – {high}(b)", ""])
            foot = rng.choice(["", "(b)", "(d)"])
            lines.append(
                f"{year},{state},{wage},{round(wage * mult, 2)},{fed},"
                f"{round(fed * mult, 2)},{max(wage, fed)},"
                f"{round(max(wage, fed) * mult, 2)},{cpi},\"{unclean}\","
                f"{low},{round(low * mult, 2)},{high},{round(high * mult, 2)},{foot}"
            )
    path.write_bytes(("\n".join(lines) + "\n").encode("windows-1252"))


def generate_all(
    dirpath: str | Path, seed: int = 42, n_states: int = len(STATES)
) -> dict[str, str]:
    d = Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)
    rng = random.Random(seed)
    states = scaled_states(n_states) if n_states > len(STATES) else STATES
    paths = {
        "unemployment_xlsx": d / "unemployment.xlsx",
        "gdp_csv": d / "gdp.csv",
        "school_csv": d / "school_expense.csv",
        "min_wage_csv": d / "min_wage.csv",
    }
    gen_unemployment_xlsx(paths["unemployment_xlsx"], rng, states)
    gen_gdp_csv(paths["gdp_csv"], rng, states)
    gen_school_csv(paths["school_csv"], rng, states)
    gen_min_wage_csv(paths["min_wage_csv"], rng, states)
    return {k: str(v) for k, v in paths.items()}
