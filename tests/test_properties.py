"""Property-based tests (hypothesis) for operator invariants the oracle
can't state: idempotence, reshape identities, hash stability. Data is
generated tiny and the session is reused, so the whole file stays fast."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from state_economics_end_to_end_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
)
from state_economics_end_to_end_data_pipeline_spark.operators.reshape import (
    surrogate_key,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["a", "b", "c"])),
    min_size=1, max_size=30,
)


@given(data=rows)
@settings(**_SETTINGS)
def test_dedup_idempotent_and_bounded(spark, data):
    df = spark.createDataFrame(data, ["k", "v"])
    once = exact_dedup(df)
    twice = exact_dedup(once)
    n_once, n_twice = once.count(), twice.count()
    assert n_once == n_twice  # idempotent
    assert n_once <= df.count()
    assert n_once == len(set(data))  # exactly the distinct rows


@given(data=rows)
@settings(**_SETTINGS)
def test_unpivot_row_count_identity(spark, data):
    df = spark.createDataFrame(
        [(k, float(k * 2), float(k * 3)) for k, _ in data], ["id", "m1", "m2"]
    )
    long = df.unpivot(["id"], ["m1", "m2"], "measure", "value")
    assert long.count() == df.count() * 2  # rows_long = rows_wide x n_measures


@given(data=rows)
@settings(**_SETTINGS)
def test_surrogate_key_deterministic_dense(spark, data):
    df = spark.createDataFrame(data, ["k", "v"])
    a = {(r["k"], r["v"]): r["sk"] for r in surrogate_key(df, ["k", "v"], "sk").collect()}
    b = {(r["k"], r["v"]): r["sk"] for r in surrogate_key(df, ["k", "v"], "sk").collect()}
    assert a == b  # reproducible across runs
    keys = sorted(a.values())
    assert keys == list(range(len(keys)))  # dense 0..n-1


@given(texts=st.lists(st.text(alphabet="abc xyz", min_size=10, max_size=40), min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_minhash_signature_stable_and_duplicate_safe(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    sigs1 = {r["doc_id"]: r["sig_hash"] for r in minhash_signatures(df).collect()}
    sigs2 = {r["doc_id"]: r["sig_hash"] for r in minhash_signatures(df).collect()}
    assert sigs1 == sigs2  # deterministic
    # identical text => identical signature
    dup = df.union(df.limit(1).select(F.lit(999).alias("doc_id"), "text"))
    s = {r["doc_id"]: r["sig_hash"] for r in minhash_signatures(dup).collect()}
    if 0 in s:  # doc 0 long enough to have shingles
        assert s[999] == s[0]


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),  # (user, seconds offset)
        min_size=1, max_size=40,
    ),
    gap=st.sampled_from([60, 600, 1800]),
)
@settings(**_SETTINGS)
def test_sessionize_invariants(spark, events, gap):
    from state_economics_end_to_end_data_pipeline_spark.operators.reshape import (
        sessionize,
    )

    df = spark.createDataFrame(
        [(u, s) for u, s in events], ["user_id", "off"]
    ).select("user_id", F.timestamp_seconds(F.col("off") + 1_700_000_000).alias("ts"))
    rows = sessionize(df, "user_id", "ts", gap).collect()
    assert len(rows) == len(events)  # sessions partition the events, none lost
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for seq in by_user.values():
        assert seq[0]["session_no"] == 1  # sessions are 1-based per key
        for a, b in zip(seq, seq[1:]):
            delta = (b["ts"] - a["ts"]).total_seconds()
            if b["session_no"] == a["session_no"]:
                assert delta <= gap  # intra-session gaps bounded
            else:
                assert b["session_no"] == a["session_no"] + 1  # dense labels
                assert delta > gap  # sessions split only on real gaps


# ---------------------------------------------------------------------------
# Driver-gate hashability: a catalog-wide regression guard for the two
# round-1 failure classes. The driver samples ~50 of the registered
# queries per round; this test walks ALL of them, so a regression in an
# unsampled entry fails CI instead of a future round's rotated sample.
# ---------------------------------------------------------------------------

_INT_DUCK = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_FLOAT_DUCK = {"FLOAT", "DOUBLE"}


def test_catalog_schemas_are_driver_hashable(spark, sf_dir):
    """Every oracle-paired catalog entry must survive the driver's
    sort+value-hash compare, which (a) crashes on unhashable cells --
    any top-level array/map/struct column on the Spark side -- and
    (b) hash-mismatches equal values held in different dtypes, the
    classic case being DuckDB SUM(int) -> HUGEINT -> pandas object vs
    Spark int64 (the fix is CAST(... AS BIGINT) in the oracle). Checked
    structurally: Spark schema (lazy -- building every catalog entry
    runs no jobs; eager operators are opt-in via kwargs the catalog
    never passes) against DuckDB DESCRIBE of the oracle (binds, does
    not scan), for all entries."""
    import duckdb

    from state_economics_end_to_end_data_pipeline_spark.plans import load_all

    qs = load_all()
    con = duckdb.connect()
    for tname in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'"
        )

    problems: list[str] = []
    for name in sorted(qs):
        entry = qs[name]
        if entry.oracle is None:
            continue  # rows-only gate: never value-hashed by the driver
        try:
            df = entry.fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: fn failed to build: {e}")
            continue
        spark_types = {f.name: f.dataType for f in df.schema.fields}
        for col, dt in spark_types.items():
            if dt.typeName() in ("array", "map", "struct"):
                problems.append(
                    f"{name}: spark col {col} is {dt.simpleString()} -- "
                    "unhashable cells crash the driver compare"
                )
        try:
            desc = con.sql("DESCRIBE " + entry.oracle).df()
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: oracle does not bind: {e}")
            continue
        duck_types = dict(zip(desc["column_name"], desc["column_type"]))
        if sorted(duck_types) != sorted(spark_types):
            problems.append(
                f"{name}: column names differ: spark={sorted(spark_types)} "
                f"oracle={sorted(duck_types)}"
            )
            continue
        for col, dtype in duck_types.items():
            base = dtype.split("(")[0]
            if dtype == "HUGEINT":
                problems.append(
                    f"{name}: oracle col {col} is HUGEINT (pandas object) -- "
                    "CAST the aggregate AS BIGINT"
                )
            elif dtype.endswith("[]") or base in ("STRUCT", "MAP", "UNION", "JSON"):
                problems.append(
                    f"{name}: oracle col {col} is {dtype} -- unhashable cells"
                )
            sdt = spark_types[col].typeName()
            if sdt in ("byte", "short", "integer", "long") and base not in _INT_DUCK:
                problems.append(
                    f"{name}: col {col} dtype kind differs "
                    f"(spark {sdt} vs oracle {dtype}) -- hashes differently"
                )
            elif sdt in ("float", "double") and base not in _FLOAT_DUCK:
                problems.append(
                    f"{name}: col {col} dtype kind differs "
                    f"(spark {sdt} vs oracle {dtype}) -- hashes differently"
                )
            elif (sdt == "float") != (base == "FLOAT") and sdt in ("float", "double") and base in _FLOAT_DUCK:
                problems.append(
                    f"{name}: col {col} float widths differ "
                    f"(spark {sdt} vs oracle {dtype}) -- float32 reprs hash differently"
                )
    assert not problems, "\n".join(problems)


def test_assign_cells_never_elects_degenerate_centroid(spark):
    """A zero (degenerate) centroid yields NULL cosine via try_divide;
    NULL would sort FIRST in the ascending (neg_cos, cell) struct sort,
    silently electing the degenerate centroid as nearest for EVERY row.
    assign_cells must coalesce it to rank strictly last: with one zero
    centroid and one real centroid, every nonzero vector lands in the
    real cell; a zero VECTOR (NULL against every centroid) falls back to
    the tie-break order rather than crashing."""
    from state_economics_end_to_end_data_pipeline_spark.operators.similarity import (
        assign_cells,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 2.0]), (3, [0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    out = {r["id"]: r["cell"] for r in assign_cells(vecs, cents).collect()}
    assert out[1] == 1 and out[2] == 1, out
    assert 3 in out  # degenerate vector still assigned deterministically


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=6,
    )
)
@settings(**_SETTINGS)
def test_cosine_prenormed_equals_inline_cosine(spark, vecs):
    """The hot-path form (squared norms staged per row) must be
    BIT-IDENTICAL to the inline cosine on every pair -- same
    sqrt(n2a*n2b) expression either way, so not just close: equal."""
    from pyspark.sql import functions as F2

    from state_economics_end_to_end_data_pipeline_spark.operators.similarity import (
        cosine,
        cosine_prenormed,
        norm2,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id bigint, v array<double>",
    )
    a = df.select(F2.col("id").alias("ia"), F2.col("v").alias("va"),
                  norm2(F2.col("v")).alias("n2a"))
    b = df.select(F2.col("id").alias("ib"), F2.col("v").alias("vb"),
                  norm2(F2.col("v")).alias("n2b"))
    pairs = a.crossJoin(b).filter(F2.col("ia") < F2.col("ib"))
    rows = pairs.select(
        cosine(F2.col("va"), F2.col("vb")).alias("inline"),
        cosine_prenormed(
            F2.col("va"), F2.col("vb"), F2.col("n2a"), F2.col("n2b")
        ).alias("staged"),
    ).collect()
    import math

    for r in rows:
        if r["inline"] is None or (isinstance(r["inline"], float) and math.isnan(r["inline"])):
            assert r["staged"] is None or math.isnan(r["staged"])
        else:
            assert r["inline"] == r["staged"]  # bitwise, not approx


def test_incremental_dedup_flags_partition_the_batch(spark):
    """Every batch doc is exactly one of {exact dup, near dup, kept} --
    the three counts must sum to the batch size in every language."""
    from state_economics_end_to_end_data_pipeline_spark.plans import load_all

    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = load_all()["dedup_incremental_batch"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_batch"] == r["n_exact_dup"] + r["n_near_dup"] + r["n_kept"], r


finite_vals = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    min_size=1, max_size=16,
)


@given(vals=finite_vals)
@settings(**_SETTINGS)
def test_ema_fold_matches_python_reference(spark, vals):
    """The JVM-side EMA fold (aggregate over an ordered array, alpha=0.25)
    must equal a sequential Python fold bit-for-bit: both are the same
    left-to-right IEEE op sequence (DETERMINISM.md rules 6/19), so no
    tolerance is allowed."""
    expected = vals[0]
    for x in vals[1:]:
        expected = 0.25 * x + 0.75 * expected
    df = spark.createDataFrame([(vals,)], "vals array<double>")
    fold = (
        "aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)), "
        "element_at(vals, 1), "
        "(acc, x) -> CAST(0.25 AS DOUBLE) * x "
        "+ (CAST(1 AS DOUBLE) - CAST(0.25 AS DOUBLE)) * acc)"
    )
    [row] = df.select(F.expr(fold).alias("ema")).collect()
    assert row.ema == expected


@given(
    pv=st.floats(-1e6, 1e6, allow_nan=False, width=64),
    nv=st.floats(-1e6, 1e6, allow_nan=False, width=64),
    num=st.integers(1, 99),
)
@settings(**_SETTINGS)
def test_linear_interp_expression_matches_python(spark, pv, nv, num):
    """The gap-fill interpolation expression pv + (nv-pv)*(num/100) must
    equal the identical Python arithmetic bit-for-bit -- same three
    correctly-rounded IEEE ops in the same order."""
    expected = pv + (nv - pv) * (float(num) / float(100))
    df = spark.createDataFrame([(pv, nv, num)], "pv double, nv double, num int")
    expr = (
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.col("num").cast("double") / F.lit(100).cast("double"))
    )
    [row] = df.select(expr.alias("v")).collect()
    assert row.v == expected


@given(counts=st.lists(st.integers(1, 50), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_entropy_fold_bounds_hold_for_any_counts(spark, counts):
    """Shannon entropy computed by the catalog's sorted-fold shape stays
    within [0, log2(k)] for ANY positive count multiset (the invariant
    the fixture-bound test can't cover)."""
    import math

    n = sum(counts)
    df = spark.createDataFrame(
        [(sorted(float(c) for c in counts),)], "counts array<double>"
    )
    clogc = F.aggregate(
        F.transform("counts", lambda c: c * F.log2(c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    ent = F.log2(F.lit(float(n))) - clogc / F.lit(float(n))
    [row] = df.select(ent.alias("h")).collect()
    assert -1e-9 <= row.h <= math.log2(len(counts)) + 1e-9


@given(doc_id=st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_bmp_roundtrip_any_doc_id(doc_id):
    """The synth/parse BMP pair must round-trip for ANY doc id: the
    vectorized decoder (numpy frombuffer + stride slicing) has to honor
    md5-derived geometry (1..8 x 1..8), row-stride padding, and
    bottom-up order everywhere, with integer-exact channel means and the
    top-left probe equal to the closed-form base colors. Pure Python --
    no Spark session."""
    import hashlib

    from state_economics_end_to_end_data_pipeline_spark.operators.multimodal import (
        parse_bmp_pixels,
        synth_bmp_payload,
    )

    h = hashlib.md5(f"{doc_id}:bmp".encode()).hexdigest()
    r0, g0, b0 = int(h[0:2], 16), int(h[2:4], 16), int(h[4:6], 16)
    w, ht = 1 + int(h[6:8], 16) % 8, 1 + int(h[8:10], 16) % 8
    got = parse_bmp_pixels(synth_bmp_payload(doc_id))
    assert got[0:2] == (w, ht)
    assert got[2] == sum((r0 + y) % 256 for y in range(ht)) / ht
    assert got[3] == sum((g0 + 2 * y) % 256 for y in range(ht)) / ht
    assert got[4] == sum((b0 + 3 * y) % 256 for y in range(ht)) / ht
    assert got[5:8] == (r0, g0, b0)


@given(
    truncate_at=st.integers(14, 53),
)
@settings(max_examples=20, deadline=None)
def test_bmp_truncated_payload_fails_loudly(truncate_at):
    """A payload cut anywhere inside the headers or pixel array must
    raise (struct.error or the explicit truncated-pixel ValueError),
    never return garbage stats."""
    import struct

    import pytest as _pytest

    from state_economics_end_to_end_data_pipeline_spark.operators.multimodal import (
        parse_bmp_pixels,
        synth_bmp_payload,
    )

    raw = synth_bmp_payload(7)[:truncate_at]
    with _pytest.raises((ValueError, struct.error)):
        parse_bmp_pixels(raw)


@given(doc_id=st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_any_doc_id(doc_id):
    """The synth/parse WAV pair must round-trip for ANY doc id: the
    chunk-walking parser (RIFF container, canonical fmt, int16 data)
    must reproduce the sawtooth generator's closed-form features --
    exact integers everywhere, including the int64-widened energy sum
    and strict-sign-flip crossing count. Pure Python -- no Spark
    session."""
    import hashlib

    from state_economics_end_to_end_data_pipeline_spark.operators.multimodal import (
        parse_wav_features,
        synth_wav_payload,
    )

    h = hashlib.md5(f"{doc_id}:wav".encode()).hexdigest()
    n = 64 + int(h[0:2], 16) % 64
    rate = 8000 * (1 + int(h[2:4], 16) % 3)
    a0 = int(h[4:8], 16) % 20011
    s = [((a0 + 1097 * i) % 4001) - 2000 for i in range(n)]
    expected = (
        rate,
        n,
        n * 1_000_000 // rate,
        max(abs(x) for x in s),
        sum(abs(x) for x in s),
        sum(x * x for x in s),
        sum(1 for i in range(1, n) if s[i] * s[i - 1] < 0),
    )
    assert parse_wav_features(synth_wav_payload(doc_id)) == expected


def test_wav_parser_walks_interleaved_chunks():
    """Real WAV files carry LIST/INFO (and odd-sized) chunks before
    data; a parser assuming fixed offsets returns garbage. Splice a
    5-byte LIST chunk (odd size -> exercises word-alignment padding)
    between fmt and data and require identical features."""
    import struct

    from state_economics_end_to_end_data_pipeline_spark.operators.multimodal import (
        parse_wav_features,
        synth_wav_payload,
    )

    raw = synth_wav_payload(42)
    base = parse_wav_features(raw)
    fmt_start = 12
    fmt_end = fmt_start + 8 + struct.unpack("<I", raw[fmt_start + 4:fmt_start + 8])[0]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    assert parse_wav_features(spliced) == base


@given(truncate_at=st.integers(0, 43))
@settings(max_examples=20, deadline=None)
def test_wav_truncated_payload_fails_loudly(truncate_at):
    """A WAV cut inside the container, fmt, or data chunk must raise,
    never return partial stats."""
    import pytest as _pytest

    from state_economics_end_to_end_data_pipeline_spark.operators.multimodal import (
        parse_wav_features,
        synth_wav_payload,
    )

    raw = synth_wav_payload(7)
    with _pytest.raises(ValueError):
        parse_wav_features(raw[:truncate_at])


@given(doc_id=st.integers(0, 2**31 - 1), every=st.integers(1, 4))
@settings(max_examples=50, deadline=None)
def test_avi_roundtrip_any_doc_id_and_stride(doc_id, every):
    """The synth/parse AVI pair must round-trip for ANY doc id and ANY
    sampling stride: chunk-walked hdrl/movi, bottom-up padded DIB
    frames, and the every-th-frame skip must reproduce the closed-form
    per-channel sums on exactly the sampled index set. Pure Python."""
    from state_economics_end_to_end_data_pipeline_spark.operators.multimodal import (
        _avi_dims,
        parse_avi_frames,
        synth_avi_payload,
    )

    w, ht, nf, r0, g0, b0 = _avi_dims(doc_id)
    got = parse_avi_frames(synth_avi_payload(doc_id), every=every)
    expected = [
        (
            w, ht, nf, f,
            sum((r0 + y + 5 * f) % 256 for y in range(ht)) * w,
            sum((g0 + 2 * y + 7 * f) % 256 for y in range(ht)) * w,
            sum((b0 + 3 * y + 11 * f) % 256 for y in range(ht)) * w,
        )
        for f in range(0, nf, every)
    ]
    assert got == expected


def test_avi_frame_census_mismatch_fails_loudly():
    """An AVI whose movi list holds fewer frames than the avih header
    declares (a truncated tail that still parses chunk-by-chunk) must
    raise, never silently return partial stats."""
    import struct

    import pytest as _pytest

    from state_economics_end_to_end_data_pipeline_spark.operators.multimodal import (
        parse_avi_frames,
        synth_avi_payload,
    )

    raw = synth_avi_payload(7)
    # chop the LAST '00db' chunk out of movi and fix up the two
    # enclosing sizes (movi LIST and RIFF) so every chunk still parses
    last = raw.rfind(b"00db")
    frame_sz = struct.unpack("<I", raw[last + 4:last + 8])[0]
    cut = 8 + frame_sz + (frame_sz & 1)
    movi_hdr = raw.rfind(b"LIST", 0, last)
    movi_sz = struct.unpack("<I", raw[movi_hdr + 4:movi_hdr + 8])[0]
    trimmed = (
        raw[:4] + struct.pack("<I", len(raw) - 8 - cut)
        + raw[8:movi_hdr + 4] + struct.pack("<I", movi_sz - cut)
        + raw[movi_hdr + 8:last] + raw[last + cut:]
    )
    with _pytest.raises(ValueError, match="header claims"):
        parse_avi_frames(trimmed)
