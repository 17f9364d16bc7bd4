"""Invariants for the corpus-assembly operators, and a genuine
multi-batch streaming replay (state evolving across micro-batches, not
a single availableNow gulp)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from state_economics_end_to_end_data_pipeline_spark.plans import load_all

QUERIES = load_all()


def test_split_is_deterministic_and_complete(spark, sf_dir):
    """Same doc -> same split on every run; splits partition the corpus
    (no doc lost or double-counted); observed proportions are within a
    tolerance band of 80/10/10."""
    a = QUERIES["train_val_test_split"].fn(spark, sf_dir).collect()
    b = QUERIES["train_val_test_split"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic

    totals = {}
    for r in a:
        totals[r["split"]] = totals.get(r["split"], 0) + r["n_docs"]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(totals.values()) == n_docs  # partition, nothing lost
    # hash buckets are uniform-ish: train should dominate, test/val minor
    assert totals["train"] > totals.get("val", 0)
    assert totals["train"] > totals.get("test", 0)


def test_packing_conserves_tokens_and_orders_chunks(spark, sf_dir):
    """Concat-and-chunk packing must conserve the total token count and
    produce ordered, bounded chunk ids per language starting at 0.

    NOT asserted: contiguity. A doc longer than the 2048-token chunk
    spans several chunks but is attributed to the chunk its FIRST token
    lands in, so ids legitimately gap when any doc exceeds 2048 tokens --
    the invariant is the id RANGE (0 .. floor((lang_tokens-1)/2048)),
    which holds for any fixture doc-length distribution."""
    rows = QUERIES["sequence_packing_chunks"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).first()["t"]
    assert sum(r["chunk_tokens"] for r in rows) == total_tokens

    lang_tokens = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    }
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["chunk_id"])
    for lang, ids in by_lang.items():
        ids = sorted(ids)
        assert ids[0] == 0, lang
        assert len(set(ids)) == len(ids), lang  # distinct (grouped) ids
        assert ids[-1] <= (lang_tokens[lang] - 1) // 2048, lang


def test_shard_shuffle_is_dense_balanced_permutation(spark, sf_dir):
    """Every doc appears exactly once; positions within each shard are a
    dense 1..n sequence (a valid write layout); shards are reasonably
    balanced (md5 bucketing: no shard > 2x the ideal share); and the
    assignment is deterministic across runs (no RNG anywhere)."""
    rows = QUERIES["corpus_shard_shuffle"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs
    assert len({r["doc_id"] for r in rows}) == docs
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    ideal = docs / len(by_shard)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard  # dense
        assert len(ps) <= 2 * ideal, (shard, len(ps))
    again = QUERIES["corpus_shard_shuffle"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mixing_rates_bound_kept_counts(spark, sf_dir):
    """Kept counts can never exceed totals; a 100% tier keeps everything;
    weighted counts = kept * epochs for the tier."""
    rows = {r["source"]: r for r in QUERIES["corpus_mixing_sample"].fn(spark, sf_dir).collect()}
    for src, r in rows.items():
        assert 0 <= r["n_kept"] <= r["n_total"], src
        if r["keep_pct"] == 100:
            assert r["n_kept"] == r["n_total"], src
            assert r["n_weighted"] == 2 * r["n_kept"], src  # tier-1 epochs
        else:
            assert r["n_weighted"] == r["n_kept"], src


def test_multibatch_stream_replay_matches_batch(spark, sf_dir, tmp_path):
    """Split the events into several files and stream with
    maxFilesPerTrigger=1: state (watermark aggregation) must merge
    across real micro-batches and still equal the one-shot batch
    aggregate -- a stronger check than a single availableNow batch."""
    from state_economics_end_to_end_data_pipeline_spark.streaming.events import (
        run_available_now,
        tumbling_counts,
    )

    src = str(tmp_path / "multi")
    # 4 deterministic slices by event_id, one parquet file each
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.withColumn("slice", F.pmod("event_id", F.lit(4))).repartition(
        "slice"
    ).write.partitionBy("slice").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .drop("slice")
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    out = run_available_now(tumbling_counts(stream), output_mode="complete")
    got = {
        (str(r["window"]["start"]), r["event_type"]): r["n_events"]
        for r in out.collect()
    }

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(batch.dtypes).get("ts") == "bigint":
        batch = batch.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    want = {
        (str(r["w"]["start"]), r["event_type"]): r["n"]
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_dupspan_coverage_invariants(spark):
    """Coverage semantics on a hand-built corpus: docs sharing a 5-gram
    get exactly that span covered; unique docs get zero; a doc shorter
    than n tokens gets zero with its true token count; coverage is the
    covered fraction in [0, 1]."""
    from state_economics_end_to_end_data_pipeline_spark.operators.dedup import (
        dupspan_coverage,
    )

    shared = "alpha beta gamma delta epsilon"  # the one repeated 5-gram
    df = spark.createDataFrame(
        [
            (1, shared + " zeta eta"),          # covered pos 1-5 of 7
            (2, "one two " + shared),            # covered pos 3-7 of 7
            (3, "u1 u2 u3 u4 u5 u6 u7"),         # unique, zero coverage
            (4, "tiny doc"),                     # shorter than n
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dupspan_coverage(df, n=5, min_df=2).collect()
    }
    assert rows[1]["n_tokens"] == 7 and rows[1]["n_covered"] == 5
    assert rows[2]["n_tokens"] == 7 and rows[2]["n_covered"] == 5
    assert rows[3]["n_covered"] == 0
    assert rows[4]["n_tokens"] == 2 and rows[4]["n_covered"] == 0
    for r in rows.values():
        assert 0.0 <= r["dup_coverage"] <= 1.0
        assert abs(r["dup_coverage"] - r["n_covered"] / r["n_tokens"]) < 1e-12


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL projection contract: deterministic across runs, and average
    pairwise squared distance in the projected space tracks the original
    within a loose statistical band (the matrix is +-1/sqrt(k), so
    E[|Px - Py|^2] = |x - y|^2)."""
    import math

    from state_economics_end_to_end_data_pipeline_spark.operators.similarity import (
        random_project,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 50
    )
    p1 = {r["vec_id"]: r["proj"] for r in random_project(emb, 64, 16).collect()}
    p2 = {r["vec_id"]: r["proj"] for r in random_project(emb, 64, 16).collect()}
    assert p1 == p2  # deterministic

    orig = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    ids = sorted(orig)[:20]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    num = den = 0.0
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            num += d2(p1[ids[i]], p1[ids[j]])
            den += d2(orig[ids[i]], orig[ids[j]])
    ratio = num / den
    assert 0.5 < ratio < 2.0, f"JL distance ratio {ratio} out of band"


def test_countmin_sketch_is_mergeable_and_one_sided(spark, sf_dir):
    """CM contract: building one sketch over A union B equals the
    cell-wise SUM of the sketches of A and B (the mergeability that lets
    per-shard grids roll up); estimates never undershoot exact counts."""
    from pyspark.sql import functions as F2

    from state_economics_end_to_end_data_pipeline_spark.plans import load_all

    rows = load_all()["countmin_heavy_hitters"].fn(spark, sf_dir).collect()
    assert rows and all(r["cm_overestimate"] >= 0 for r in rows)
    assert all(r["cm_estimate"] == r["n_occ"] + r["cm_overestimate"] for r in rows)

    # mergeability on a hand-split corpus
    from state_economics_end_to_end_data_pipeline_spark.operators.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    tok = docs.select(F2.explode(tokens("text")).alias("token"), "doc_id")

    def cm(df):
        h = F2.md5(F2.concat(F2.lit("0:"), F2.col("token")))
        b = F2.conv(F2.substring(h, 1, 5), 16, 10).cast("bigint") % 1024
        return {
            r["bucket"]: r["c"]
            for r in df.groupBy(b.alias("bucket"))
            .agg(F2.count(F2.lit(1)).alias("c"))
            .collect()
        }

    whole = cm(tok)
    a = cm(tok.filter(F2.col("doc_id") % 2 == 0))
    b = cm(tok.filter(F2.col("doc_id") % 2 == 1))
    merged = {}
    for part in (a, b):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole
