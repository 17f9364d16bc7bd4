"""LLM-data-pipeline extension queries (north-star: dedup, similarity
search, text analysis, multimodal columns) over the documents/embeddings
testdata, each with a DuckDB oracle.

Hash-based operators use md5 (portable) so the oracle checks *byte-
identical* signatures, not just row counts. Dot products fold left-to-
right in double on both engines -- bit-identical cosines.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve via func globals
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.readers import read_parquet_table as t
from ..operators.dedup import (
    content_hash,
    dupspan_coverage,
    exact_substring_removal,
    exact_substring_spans,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_bands_table,
    simhash_table,
)
from ..operators.multimodal import (
    decode_avi_frames,
    decode_bmp_pixels,
    decode_media,
    decode_wav_features,
    media_table,
    sample_frame_indexes,
    synth_avi_table,
    synth_bmp_table,
    synth_wav_table,
    thumbnail_dims,
)
from ..operators.partitioning import rebalance_for_cpu
from ..operators.similarity import cosine_topk, neardup_pairs_lsh
from .robust_stats import collect_value_cutpoints, value_slice_pid
from ..operators.text import (
    STOPWORDS,
    char_ngram_fingerprint,
    lang_guess,
    quality_features,
    token_count,
    tokens,
    word_ngrams,
)
from . import register

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_STOPLIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _dot_sql(a: str, b: str) -> str:
    """DuckDB sequential-fold dot product (list_reduce is a left fold --
    same IEEE order as Spark's aggregate())."""
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def _cos_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / sqrt({_dot_sql(a, a)} * {_dot_sql(b, b)}))"


# ------------------------------------------------------------------- dedup


@register(
    "dedup_exact_hash",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique
    FROM documents GROUP BY lang
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash: md5 fingerprint groupBy -- the shuffle
    key is 128 bits, never the document bodies (at 100 TB you shuffle
    hashes, not text)."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(content_hash("text")).alias("n_unique"),
    )


_MINHASH_SIG_SQL = """
WITH tk AS (
  SELECT doc_id, {toks} AS toks FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           j -> toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2])) AS shingles
  FROM tk WHERE len(toks) >= 3
), mh AS (
  SELECT doc_id,
         {mh_cols}
  FROM sh
)
""".strip()


def _minhash_sig_cte(num_hashes: int = 8) -> str:
    mh_cols = ",\n         ".join(
        f"list_min(list_transform(shingles, s -> md5('{i}:' || s))) AS mh{i}"
        for i in range(num_hashes)
    )
    return _MINHASH_SIG_SQL.format(toks=_TOKS, mh_cols=mh_cols)


@register(
    "minhash_signatures",
    oracle=_minhash_sig_cte()
    + """
    SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7,
           md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3 || '|' ||
               mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS sig_hash
    FROM mh
    """,
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 salted-md5 min-hashes over distinct word
    3-gram shingles). Fully narrow: per-row expressions, zero shuffle."""
    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    return minhash_signatures(docs, num_hashes=8, shingle_n=3)


@register(
    "minhash_lsh_pairs",
    oracle=_minhash_sig_cte()
    + """
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM mh a JOIN mh b ON a.doc_id < b.doc_id AND (
         (a.mh0 = b.mh0 AND a.mh1 = b.mh1) OR
         (a.mh2 = b.mh2 AND a.mh3 = b.mh3) OR
         (a.mh4 = b.mh4 AND a.mh5 = b.mh5) OR
         (a.mh6 = b.mh6 AND a.mh7 = b.mh7))
    """,
)
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding (4 bands x 2 hashes): near-dup candidate pairs via
    bucket join -- shuffle O(docs x bands), never O(docs^2). (The oracle
    states the same semantics as an O(n^2) predicate join; the engine
    never executes that shape.)"""
    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    sigs = minhash_signatures(docs, num_hashes=8, shingle_n=3)
    return lsh_candidate_pairs(sigs, num_hashes=8, band_size=2)


@register(
    "dedup_incremental_batch",
    oracle=_minhash_sig_cte()
    + """
    , split AS (
      SELECT doc_id, lang, md5(text) AS content_md5,
             (doc_id % 10 >= 8) AS is_new
      FROM documents
    ), hist AS (SELECT * FROM split WHERE NOT is_new),
    batch AS (SELECT * FROM split WHERE is_new),
    exact_dup AS (
      SELECT DISTINCT b.doc_id FROM batch b
      JOIN hist h ON h.content_md5 = b.content_md5
    ), near_dup AS (
      SELECT DISTINCT b.doc_id FROM batch b
      JOIN mh mb ON mb.doc_id = b.doc_id
      JOIN mh mh2 ON mh2.doc_id IN (SELECT doc_id FROM hist)
       AND ((mb.mh0 = mh2.mh0 AND mb.mh1 = mh2.mh1) OR
            (mb.mh2 = mh2.mh2 AND mb.mh3 = mh2.mh3) OR
            (mb.mh4 = mh2.mh4 AND mb.mh5 = mh2.mh5) OR
            (mb.mh6 = mh2.mh6 AND mb.mh7 = mh2.mh7))
      WHERE b.doc_id NOT IN (SELECT doc_id FROM exact_dup)
    )
    SELECT lang,
           COUNT(*) AS n_batch,
           CAST(COUNT(CASE WHEN doc_id IN (SELECT doc_id FROM exact_dup)
                           THEN 1 END) AS BIGINT) AS n_exact_dup,
           CAST(COUNT(CASE WHEN doc_id IN (SELECT doc_id FROM near_dup)
                           THEN 1 END) AS BIGINT) AS n_near_dup,
           CAST(COUNT(CASE WHEN doc_id NOT IN (SELECT doc_id FROM exact_dup)
                            AND doc_id NOT IN (SELECT doc_id FROM near_dup)
                           THEN 1 END) AS BIGINT) AS n_kept
    FROM batch GROUP BY lang
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup -- the nightly-batch shape at 100 TB: a
    NEW batch (deterministic 20% slice, doc_id % 10 >= 8) is deduped
    against the HISTORICAL corpus without ever joining history to
    itself. Tier 1: exact content-md5 semi-join (shuffle keyed on a
    128-bit hash, never bodies). Tier 2: MinHash-LSH band match against
    historical signatures -- in production the historical signature table
    is a stored incremental artifact, so each night costs O(batch) new
    signatures plus a bucket equi-join, not a corpus re-scan. Reported
    per lang: batch size, exact dups, near dups (exact excluded), kept."""
    docs = t(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 >= 8
    hist = docs.filter(~is_new)
    batch = docs.filter(is_new)

    h_md5 = hist.select(F.md5("text").alias("content_md5")).distinct()
    exact_ids = (
        batch.select("doc_id", F.md5("text").alias("content_md5"))
        .join(h_md5, "content_md5", "left_semi")
        .select("doc_id")
    )

    sigs = minhash_signatures(docs, num_hashes=8, shingle_n=3)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", f"mh{2*b}", f"mh{2*b+1}")).alias("bucket"),
        )
        for b in range(4)
    ]
    banded = sigs.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    # r14 (guide §2.4 "remove shuffles outright"): batch membership is a
    # deterministic PREDICATE of doc_id, so splitting the banded stream
    # is a filter, not a semi-join against a data-sized id set -- the
    # old plan paid two id-keyed shuffle joins to re-derive what the
    # rows already carry.  (In the nightly-production shape the batch
    # tag arrives as a column on the signature table; either way it is
    # row-local.)  Rows verified identical.
    hist_buckets = banded.filter(~is_new).select("band", "bucket").distinct()
    near_ids = (
        banded.filter(is_new)
        .join(hist_buckets, ["band", "bucket"], "left_semi")
        .select("doc_id")
        .distinct()
        .join(exact_ids, "doc_id", "left_anti")
    )

    flagged = (
        batch.select("doc_id", "lang")
        .join(exact_ids.withColumn("is_exact", F.lit(1)), "doc_id", "left")
        .join(near_ids.withColumn("is_near", F.lit(1)), "doc_id", "left")
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.count("is_exact").alias("n_exact_dup"),
        F.count("is_near").alias("n_near_dup"),
        F.count(
            F.when(F.col("is_exact").isNull() & F.col("is_near").isNull(), 1)
        ).alias("n_kept"),
    )


_BLOOM_WORDS, _BLOOM_K = 256, 3
_BLOOM_BITS = _BLOOM_WORDS * 63


def _bloom_pos_sql(key: str, salt: str) -> str:
    """DuckDB twin of operators.dedup._bloom_pos (same md5 prefix-hex)."""
    return (
        f"(('0x' || substr(md5({salt} || '#' || {key}), 1, 15))::BIGINT"
        f" % {_BLOOM_BITS})"
    )


@register(
    "dedup_bloom_prefilter",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, lang, md5(text) AS key, (doc_id % 10 >= 8) AS is_new
      FROM documents
    ), hist_keys AS (
      SELECT DISTINCT key FROM split WHERE NOT is_new
    ), hist_pos AS (
      SELECT {_bloom_pos_sql('key', 'i::VARCHAR')} AS pos
      FROM hist_keys, range({_BLOOM_K}) r(i)
    ), words AS (
      SELECT pos // 63 AS word,
             bit_or(1::BIGINT << (pos % 63)::INT) AS bits
      FROM hist_pos GROUP BY 1
    ), batch AS (
      SELECT doc_id, lang, key FROM split WHERE is_new
    ), batch_pos AS (
      SELECT b.doc_id, {_bloom_pos_sql('b.key', 'i::VARCHAR')} AS pos
      FROM batch b, range({_BLOOM_K}) r(i)
    ), hits AS (
      SELECT p.doc_id, COUNT(*) AS n_set
      FROM batch_pos p
      JOIN words w ON w.word = p.pos // 63
       AND (w.bits & (1::BIGINT << (p.pos % 63)::INT)) != 0
      GROUP BY 1
    ), flagged AS (
      SELECT b.doc_id, b.lang,
             COALESCE(h.n_set, 0) = {_BLOOM_K} AS bloom_pos,
             b.key IN (SELECT key FROM hist_keys) AS is_dup
      FROM batch b LEFT JOIN hits h USING (doc_id)
    )
    SELECT lang,
           COUNT(*) AS n_batch,
           CAST(SUM(bloom_pos::INT) AS BIGINT) AS n_bloom_pos,
           CAST(SUM(is_dup::INT) AS BIGINT) AS n_exact_dup,
           CAST(SUM((NOT is_dup)::INT) AS BIGINT) AS n_kept
    FROM flagged GROUP BY lang
    """,
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental exact dedup -- the cheap-reject path
    for nightly ingest at 100 TB. A Bloom bitmap over the HISTORICAL
    content hashes (operators.dedup.bloom_build: one map-side-combined
    bit_or aggregation into <= 256 words) screens the NEW batch with a
    broadcast probe; only bloom positives (true dups + a ~4e-4 FP
    fraction at these sizings) reach the exact semi-join against the
    historical key set, so the dominant shuffle shrinks by the bloom's
    rejection rate. The bloom has no false negatives, so n_exact_dup and
    n_kept are IDENTICAL to unfiltered exact dedup -- the filter changes
    the physical cost, never the answer. n_bloom_pos is reported (and
    oracle-checked bit-for-bit: the md5-derived bit positions are
    engine-portable) to pin the pruning rate itself."""
    docs = t(spark, sf_dir, "documents")
    split = docs.select(
        "doc_id", "lang", F.md5("text").alias("key"),
        (F.col("doc_id") % 10 >= 8).alias("is_new"),
    )
    hist_keys = split.filter(~F.col("is_new")).select("key").distinct()
    batch = split.filter(F.col("is_new"))

    from ..operators.dedup import bloom_build, bloom_maybe_contains

    words = bloom_build(hist_keys, "key", n_words=_BLOOM_WORDS, k=_BLOOM_K)
    probed = bloom_maybe_contains(
        batch, "key", words, id_col="doc_id",
        n_words=_BLOOM_WORDS, k=_BLOOM_K, flag_col="bloom_pos",
    )
    confirmed = (
        probed.filter(F.col("bloom_pos"))
        .join(hist_keys, "key", "left_semi")
        .select("doc_id", F.lit(True).alias("is_dup"))
    )
    flagged = probed.join(confirmed, "doc_id", "left").withColumn(
        "is_dup", F.coalesce(F.col("is_dup"), F.lit(False))
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.sum(F.col("bloom_pos").cast("int")).cast("bigint").alias("n_bloom_pos"),
        F.sum(F.col("is_dup").cast("int")).cast("bigint").alias("n_exact_dup"),
        F.sum((~F.col("is_dup")).cast("int")).cast("bigint").alias("n_kept"),
    )


@register(
    "hll_sketch_merge",
    oracle="""
    SELECT source, COUNT(DISTINCT md5(text)) AS n_exact, TRUE AS within_5pct
    FROM documents GROUP BY source
    UNION ALL
    SELECT 'ALL' AS source, COUNT(DISTINCT md5(text)) AS n_exact,
           TRUE AS within_5pct
    FROM documents
    """,
)
def hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting: per-source HLL sketches
    (DataSketches hll_sketch_agg) plus a GLOBAL estimate obtained by
    hll_union_agg over the per-source sketches -- never re-scanning the
    corpus. This is the incremental-stats shape at 100 TB: store one
    sketch blob per partition/day next to the data, and any cross-slice
    distinct count is a union of kilobyte sketches instead of a full
    scan. HLL state is a register-maximum -- update order and merge order
    can't change it -- so the estimates are deterministic and the oracle
    checks them as 5%-bounds booleans against exact counts (same
    discipline as sketch_distinct_approx; default lgK=12 gives ~1.6%
    standard error, so 5% is ~3 sigma)."""
    d = t(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("key")
    )
    per_src = d.groupBy("source").agg(
        F.countDistinct("key").alias("n_exact"),
        F.hll_sketch_agg("key").alias("sk"),
    )
    src_rows = per_src.select(
        "source",
        "n_exact",
        (
            F.abs(
                F.hll_sketch_estimate("sk").cast("double")
                - F.col("n_exact").cast("double")
            )
            / F.col("n_exact").cast("double")
            <= 0.05
        ).alias("within_5pct"),
    )
    global_exact = d.agg(F.countDistinct("key").alias("n_exact"))
    merged = per_src.agg(F.hll_union_agg("sk").alias("sk"))
    all_row = global_exact.crossJoin(F.broadcast(merged)).select(
        F.lit("ALL").alias("source"),
        "n_exact",
        (
            F.abs(
                F.hll_sketch_estimate("sk").cast("double")
                - F.col("n_exact").cast("double")
            )
            / F.col("n_exact").cast("double")
            <= 0.05
        ).alias("within_5pct"),
    )
    return src_rows.unionByName(all_row)


_CM_DEPTH = 4
_CM_WIDTH = 1024


def _cm_bucket_sql(row: int, token_expr: str) -> str:
    """DuckDB bucket: first 5 hex nibbles of md5('<row>:'||token) decoded
    positionally (portable -- no hex-int cast), mod width.

    CAUTION: the list_transform lambda binds a variable named ``k``,
    which SHADOWS any same-named column in ``token_expr`` (DuckDB
    resolves lambda params first) -- a column literally called ``k``
    silently hashes the loop index instead, collapsing the grid to one
    bucket (hit while building cm_selfjoin_size; its key is named
    ``jk`` for exactly this reason)."""
    h = f"md5('{row}:' || {token_expr})"
    val = (
        f"list_reduce(list_transform(range(1, 6), k -> "
        f"(strpos('0123456789abcdef', substr({h}, CAST(k AS INT), 1)) - 1)"
        f" * CAST(16**(5-k) AS BIGINT)), (a, b) -> a + b)"
    )
    return f"({val} % {_CM_WIDTH})"


def _cm_bucket_col(row: int, col: F.Column) -> F.Column:
    """Spark twin of ``_cm_bucket_sql`` -- the ONE definition of the md5
    counter grid both CM entries share (countmin_heavy_hitters,
    cm_selfjoin_size); a width/nibble change here changes both in
    lockstep, keeping the shared-grid claim true."""
    h = F.md5(F.concat(F.lit(f"{row}:"), col))
    return F.conv(F.substring(h, 1, 5), 16, 10).cast("bigint") % _CM_WIDTH


@register(
    "countmin_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKS}) AS token FROM documents
    ), exact AS (
      SELECT token, COUNT(*) AS n_occ FROM tok GROUP BY token
    ), topk AS (
      SELECT token, n_occ FROM exact ORDER BY n_occ DESC, token LIMIT 20
    ), pairs AS (
      {" UNION ALL ".join(f"SELECT {r} AS row, {_cm_bucket_sql(r, 'token')} AS bucket FROM tok" for r in range(_CM_DEPTH))}
    ), sketch AS (
      SELECT row, bucket, COUNT(*) AS c FROM pairs GROUP BY row, bucket
    ), probes AS (
      {" UNION ALL ".join(f"SELECT token, n_occ, {r} AS row, {_cm_bucket_sql(r, 'token')} AS bucket FROM topk" for r in range(_CM_DEPTH))}
    )
    SELECT p.token, p.n_occ, CAST(MIN(s.c) AS BIGINT) AS cm_estimate,
           CAST(MIN(s.c) - p.n_occ AS BIGINT) AS cm_overestimate
    FROM probes p JOIN sketch s ON s.row = p.row AND s.bucket = p.bucket
    GROUP BY p.token, p.n_occ
    """,
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: estimate token frequencies from a d x w counter
    grid (d=4, w=1024) and validate against the exact top-20.
    Completes the repo's mergeable-sketch family (bloom = set membership,
    HLL = distinct count, CM = frequency): the sketch is a groupBy on
    (row, md5-bucket) -- shuffle O(d*w), NEVER O(vocab) -- and two
    sketches merge by adding counters cell-wise, so per-day/per-shard
    sketches roll up without rescanning history, exactly like
    `bloom_union` and `hll_sketch_merge`. CM guarantees estimate >=
    exact (collisions only inflate), surfaced as `cm_overestimate >= 0`.
    md5 bucketing makes the grid BIT-IDENTICAL in any engine, so the
    oracle checks the estimates exactly, not as bounds."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tok = d.select(F.explode_outer(tokens("text")).alias("token")).filter(
        F.col("token").isNotNull()
    )

    pairs = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("row"),
                        _cm_bucket_col(r, F.col("token")).alias("bucket"),
                    )
                    for r in range(_CM_DEPTH)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")
    sketch = pairs.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))

    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_occ"))
    topk = exact.orderBy(F.desc("n_occ"), "token").limit(20)
    probes = topk.select(
        "token",
        "n_occ",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("row"),
                        _cm_bucket_col(r, F.col("token")).alias("bucket"),
                    )
                    for r in range(_CM_DEPTH)
                ]
            )
        ).alias("rb"),
    ).select("token", "n_occ", "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("token", "n_occ")
        .agg(
            F.min("c").cast("bigint").alias("cm_estimate"),
            (F.min("c") - F.col("n_occ")).cast("bigint").alias("cm_overestimate"),
        )
    )


@register(
    "source_capped_sample",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id
             ) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 50
    """,
)
def source_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep at most 50 docs per source, chosen
    by deterministic md5 rank -- the web-corpus curation step that stops
    one domain from dominating the mix (cap-per-domain), reproducible
    across runs and engines because the 'random' order is a salted hash
    of the key, not rand(). One shuffle on source + a per-source
    row_number window.

    Skew note for 100 TB: a hot source (the curation scenario!) puts all
    its docs in one window partition. The mitigation is a two-phase
    select: first drop rows whose md5 exceeds a per-source threshold
    estimated from counts (narrow filter, removes ~all of the hot tail),
    then run this exact window on the survivors -- same output, bounded
    partition. At catalog scale the single window states the semantics."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cap"))), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).cast("bigint").alias("rk"))
        .filter(F.col("rk") <= 50)
    )


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH tk AS (
      SELECT doc_id, lang, {toks} AS toks FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id AS id, lang AS block,
             unnest(list_distinct(list_transform(range(1, len(toks)),
               j -> toks[j] || ' ' || toks[j+1]))) AS gram
      FROM tk WHERE len(toks) >= 2
    ), sizes AS (
      SELECT id, COUNT(*) AS n_grams FROM sh GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.block = b.block AND a.gram = b.gram AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT id_a, id_b, n_inter, sa.n_grams AS n_a, sb.n_grams AS n_b,
             CAST(n_inter AS DOUBLE) / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    ) WHERE jaccard >= 0.2
    """.format(toks=_TOKS),
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard near-dup pairs via inverted-index join,
    blocked by lang (the block column is the scale lever: swap in an LSH
    bucket at 100 TB)."""
    return jaccard_pairs(
        rebalance_for_cpu(t(spark, sf_dir, "documents")),
        text_col="text",
        id_col="doc_id",
        shingle_n=2,
        min_jaccard=0.2,
        block_col="lang",
    )


@register(
    "ngram_containment_pairs",
    oracle="""
    WITH tk AS (
      SELECT doc_id, lang, {toks} AS toks FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id AS id, lang AS block,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               j -> toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2]))) AS gram
      FROM tk WHERE len(toks) >= 3
    ), sizes AS (
      SELECT id, COUNT(*) AS n_grams FROM sh GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.block = b.block AND a.gram = b.gram AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT id_a, id_b, n_inter, sa.n_grams AS n_a, sb.n_grams AS n_b,
             CAST(n_inter AS DOUBLE)
               / CAST(LEAST(sa.n_grams, sb.n_grams) AS DOUBLE) AS containment,
             CASE WHEN sa.n_grams <= sb.n_grams THEN 'a_in_b'
                  ELSE 'b_in_a' END AS direction
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    ) WHERE containment >= 0.5
    """.format(toks=_TOKS),
)
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: trigram CONTAINMENT
    |A&B| / min(|A|,|B|) instead of Jaccard. Catches the sub-document
    case symmetric Jaccard misses -- a short doc wholly embedded in a
    long one (boilerplate wrapping, quote-with-commentary, truncated
    mirrors) scores containment ~1.0 while its Jaccard ~|A|/|B| can be
    arbitrarily small, so a Jaccard threshold never fires. `direction`
    names which side is the contained one.

    Same inverted-index scale shape as ngram_jaccard_pairs (pairs meet
    only on shared grams, blocked by lang; swap an LSH bucket in as the
    block at 100 TB); only the final scoring projection differs --
    jaccard_pairs already carries (n_inter, n_a, n_b), so containment is
    a narrow rescore on top."""
    pairs = jaccard_pairs(
        rebalance_for_cpu(t(spark, sf_dir, "documents")),
        text_col="text",
        id_col="doc_id",
        shingle_n=3,
        min_jaccard=0.0,
        block_col="lang",
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            "n_inter",
            "n_a",
            "n_b",
            (
                F.col("n_inter").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
            F.when(F.col("n_a") <= F.col("n_b"), F.lit("a_in_b"))
            .otherwise(F.lit("b_in_a"))
            .alias("direction"),
        )
        .filter(F.col("containment") >= 0.5)
    )


_ESS_K = 8  # min duplicated-span length in tokens (Lee et al. use 50 BPE
# tokens at web scale; 8 words is the same discipline at testdata scale)


@register(
    "exact_substring_spans",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), gh AS (
      SELECT doc_id, pos,
             md5(array_to_string(toks[pos:pos + {_ESS_K - 1}], ' ')) AS g
      FROM (SELECT doc_id, unnest(range(1, len(toks) - {_ESS_K} + 2))
              AS pos, toks FROM tk)
    ), dup AS (
      SELECT g FROM gh GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ), flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -{_ESS_K}) + {_ESS_K}
               THEN 1 ELSE 0 END AS new_island
      FROM gh JOIN dup USING (g)
    ), grpd AS (
      SELECT doc_id, pos,
             SUM(new_island) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM flagged
    )
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) - MIN(pos) + {_ESS_K} AS BIGINT) AS span_len
    FROM grpd GROUP BY doc_id, grp
    """,
)
def exact_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING DEDUP, suffix-group formulation (r12 verdict ask
    #2; Lee et al. 2022): the maximal DISJOINT regions of each document
    covered by verbatim >= _ESS_K-token substrings shared with other
    documents -- the regions the classic dedup pass removes, which
    ``dupspan_coverage`` (frequent-5-gram POSITION coverage) summarizes
    but never reconstructs.  See
    ``operators.dedup.exact_substring_spans`` for the anchor-island
    formulation (duplicated k-gram extents merged into maximal
    contiguous intervals) and the scale contract: O(tokens) shingle
    explode, df groupBy on 16-byte md5 fingerprints, KEYED
    (non-broadcast) hit join sized for a data-sized duplicated-anchor
    set, doc-partitioned island-merge window.  Planted-span fixture
    test: tests/test_dedup_spans.py."""
    return exact_substring_spans(
        rebalance_for_cpu(t(spark, sf_dir, "documents")),
        text_col="text",
        id_col="doc_id",
        k=_ESS_K,
        min_df=2,
    )


# shared island construction for the removal oracles: identical to the
# exact_substring_spans oracle up through the spans CTE, then positions
# are subtracted and the retained token stream is re-serialized
_ESR_CTE = f"""
    WITH tk AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ), gh AS (
      SELECT doc_id, pos,
             md5(array_to_string(toks[pos:pos + {_ESS_K - 1}], ' ')) AS g
      FROM (SELECT doc_id, unnest(range(1, len(toks) - {_ESS_K} + 2))
              AS pos, toks FROM tk)
    ), dup AS (
      SELECT g FROM gh GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ), flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -{_ESS_K}) + {_ESS_K}
               THEN 1 ELSE 0 END AS new_island
      FROM gh JOIN dup USING (g)
    ), grpd AS (
      SELECT doc_id, pos,
             SUM(new_island) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM flagged
    ), spans AS (
      SELECT doc_id, MIN(pos) AS span_start,
             MAX(pos) - MIN(pos) + {_ESS_K} AS span_len
      FROM grpd GROUP BY doc_id, grp
    ), rm AS (
      SELECT doc_id, SUM(span_len) AS n_removed FROM spans GROUP BY doc_id
    ), covered AS (
      SELECT doc_id, unnest(range(span_start, span_start + span_len)) AS p
      FROM spans
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p FROM tk
    ), kept AS (
      SELECT pos.doc_id, pos.p FROM pos
      LEFT JOIN covered c ON c.doc_id = pos.doc_id AND c.p = pos.p
      WHERE c.p IS NULL
    ), ret AS (
      SELECT kept.doc_id,
             COUNT(*) AS n_retained,
             array_to_string(list(tk.toks[kept.p] ORDER BY kept.p), ' ')
               AS txt
      FROM kept JOIN tk USING (doc_id)
      GROUP BY kept.doc_id
    ), per_doc AS (
      SELECT tk.doc_id, tk.source,
             CAST(len(tk.toks) AS BIGINT) AS n_tokens,
             CAST(COALESCE(rm.n_removed, 0) AS BIGINT) AS n_removed,
             CAST(COALESCE(ret.n_retained, 0) AS BIGINT) AS n_retained,
             md5(COALESCE(ret.txt, '')) AS retained_md5
      FROM tk
      LEFT JOIN rm ON rm.doc_id = tk.doc_id
      LEFT JOIN ret ON ret.doc_id = tk.doc_id
    )
"""


@register(
    "exact_substring_removal",
    oracle=_ESR_CTE
    + """
    SELECT doc_id, source, n_tokens, n_removed, n_retained, retained_md5
    FROM per_doc
    """,
)
def exact_substring_removal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING DEDUP, REMOVAL side (r13 verdict ask #2; Lee et
    al. 2022): cut the reconstructed duplicated islands out of every
    document and publish per-doc retained-token accounting plus the md5
    digest of the cleaned token stream -- the train/apply pair for span
    dedup (``exact_substring_spans`` finds the regions; this entry is
    the corpus a training run would actually consume).  See
    ``operators.dedup.exact_substring_removal`` for the subtraction
    plan (per-doc bounded span list probed by a position-indexed
    higher-order filter -- whole-stage codegen, zero explode on the
    subtraction side) and the invariant n_retained = n_tokens -
    n_removed tested on the planted-span fixture
    (tests/test_dedup_spans.py)."""
    return exact_substring_removal(
        rebalance_for_cpu(t(spark, sf_dir, "documents")),
        text_col="text",
        id_col="doc_id",
        k=_ESS_K,
        min_df=2,
        keep_cols=("source",),
    )


@register(
    "exact_substring_removal_by_source",
    oracle=_ESR_CTE
    + """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_cut,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_removed) AS BIGINT) AS n_removed,
           CAST(SUM(n_retained) AS BIGINT) AS n_retained
    FROM per_doc GROUP BY source
    """,
)
def exact_substring_removal_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-SOURCE retained-token accounting for exact-substring removal
    -- the ledger a corpus curator reads after the cut: how many
    documents each source contributed, how many were touched, and the
    token counts before/removed/after.  One map-side-combined groupBy
    on source over the per-doc relation (shuffle O(sources)); all the
    heavy lifting is the shared spans construction documented at
    ``operators.dedup.exact_substring_removal``."""
    per_doc = exact_substring_removal(
        rebalance_for_cpu(t(spark, sf_dir, "documents")),
        text_col="text",
        id_col="doc_id",
        k=_ESS_K,
        min_df=2,
        keep_cols=("source",),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("n_removed") > 0).cast("int"))
        .cast("bigint")
        .alias("n_docs_cut"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_removed").cast("bigint").alias("n_removed"),
        F.sum("n_retained").cast("bigint").alias("n_retained"),
    )


@register(
    "dupspan_coverage",
    oracle="""
    WITH tk AS (
      SELECT doc_id, {toks} AS toks FROM documents
    ), g AS (
      SELECT doc_id, unnest(range(1, len(toks) - 3)) AS s, toks FROM tk
    ), g2 AS (
      SELECT doc_id, s,
             toks[s] || ' ' || toks[s+1] || ' ' || toks[s+2] || ' '
               || toks[s+3] || ' ' || toks[s+4] AS gram
      FROM g
    ), freq AS (
      SELECT gram FROM g2 GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT g2.doc_id, unnest(range(g2.s, g2.s + 5)) AS p
      FROM g2 JOIN freq USING (gram)
    ), cov AS (
      SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT) AS n_covered
      FROM hits GROUP BY doc_id
    )
    SELECT tk.doc_id, CAST(len(tk.toks) AS BIGINT) AS n_tokens,
           COALESCE(cov.n_covered, 0) AS n_covered,
           CAST(COALESCE(cov.n_covered, 0) AS DOUBLE)
             / CAST(len(tk.toks) AS DOUBLE) AS dup_coverage
    FROM tk LEFT JOIN cov USING (doc_id)
    """.format(toks=_TOKS),
)
def dupspan_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span coverage per document: fraction of token positions
    covered by a word 5-gram occurring in >= 2 distinct docs -- the
    span-level duplication metric behind line/paragraph dedup in LLM
    corpus pipelines (C4-style line dedup re-expressed for corpora
    without line structure). DF count is one groupBy on the gram; the
    frequent set is broadcast back; coverage is a distinct-position
    rollup per doc."""
    return dupspan_coverage(
        rebalance_for_cpu(t(spark, sf_dir, "documents")),
        text_col="text",
        id_col="doc_id",
        n=5,
        min_df=2,
    )


def _simhash_oracle(n_bits: int = 16) -> str:
    votes = []
    for j in range(n_bits):
        ni, bi = j // 4 + 1, j % 4
        contrib = (
            f"CASE WHEN (((strpos('0123456789abcdef', substr(md5(tok), {ni}, 1)) - 1)"
            f" >> {bi}) & 1) = 1 THEN 1 ELSE -1 END"
        )
        votes.append(
            f"CASE WHEN list_sum(list_transform(toks, tok -> {contrib})) > 0 "
            f"THEN CAST({2 ** j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    total = " + ".join(votes)
    return f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM tk
    """


@register("simhash16", oracle=_simhash_oracle())
def simhash16_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (token multiset votes +-1 per bit from
    md5 nibbles; portable hex-digit decode). md5 is staged once per token
    (simhash_table), not recomputed per bit."""
    return simhash_table(rebalance_for_cpu(t(spark, sf_dir, "documents")))


# ------------------------------------------------------------ text analysis


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens, n_chars
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) next to the stored n_chars."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"), "n_chars")


@register(
    "text_quality",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
           CAST(len(list_filter(toks, tok -> list_contains({_STOPLIST}, tok))) AS BIGINT) AS n_stopwords,
           CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS distinct_ratio,
           CAST(len(list_filter(toks, tok -> list_contains({_STOPLIST}, tok))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
           CAST(list_sum(list_transform(toks, tok -> length(tok))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS mean_token_len
    FROM tk
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features (length/diversity/stopword heuristics used
    to filter LLM training corpora)."""
    return quality_features(t(spark, sf_dir, "documents"))


_BM25_TERMS = ["spark", "vector", "query"]
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_oracle() -> str:
    """DuckDB BM25 with the SAME parenthesization as the Spark plan --
    ln() aside (1-ulp libm differences are absorbed by round(.,6)), every
    double op folds in the identical IEEE order on both engines."""
    per_term = " + ".join(
        f"""(ln(1.0 + (CAST(n_docs - df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))
           * (CAST(tf_{i} AS DOUBLE) * ({_BM25_K1} + 1.0))
           / (CAST(tf_{i} AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * (CAST(dl AS BIGINT) / avgdl))))"""
        for i in range(len(_BM25_TERMS))
    )
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, tok -> tok = '{w}')) AS tf_{i}"
        for i, w in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM((tf_{i} > 0)::INT) AS BIGINT) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), feat AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM tk
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             {df_cols}
      FROM feat
    ), scored AS (
      SELECT doc_id, round({per_term}, 6) AS bm25
      FROM feat, stats
    )
    SELECT doc_id, bm25 FROM (
      SELECT doc_id, bm25,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    """


@register("bm25_keyword_search", oracle=_bm25_oracle())
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (k1=1.2, b=0.75) for a fixed query-term set,
    top-10 docs. The full-corpus shape: per-doc tf/dl are narrow
    expression work; the collection stats (N, avgdl, per-term df) are ONE
    scalar aggregate broadcast back as a single-row cross join -- at
    100 TB the corpus is scanned twice (stats pass + scoring pass), with
    no shuffle wider than one row, and top-10 is a partial top-k
    (TakeOrderedAndProject), never a global sort. Scores round to 6
    decimals so 1-ulp libm ln() differences can't flip the oracle."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))

    def eq_term(w: str):
        # unary closure: a 2-arg lambda would get (element, index) semantics
        return lambda tok: tok == F.lit(w)

    feat = d.select(
        "doc_id",
        F.size(tokens("text")).alias("dl"),
        *[
            F.size(F.filter(tokens("text"), eq_term(w))).alias(f"tf_{i}")
            for i, w in enumerate(_BM25_TERMS)
        ],
    )
    stats = feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).cast("bigint").alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            F.lit(1.0)
            + ((F.col("n_docs") - F.col(f"df_{i}")).cast("double") + 0.5)
            / (F.col(f"df_{i}").cast("double") + 0.5)
        )
        term = (
            idf
            * (F.col(f"tf_{i}").cast("double") * (_BM25_K1 + 1.0))
            / (
                F.col(f"tf_{i}").cast("double")
                + _BM25_K1
                * (1.0 - _BM25_B + _BM25_B * (F.col("dl").cast("bigint") / F.col("avgdl")))
            )
        )
        score = term if score is None else score + term
    scored = feat.crossJoin(F.broadcast(stats)).select(
        "doc_id", F.round(score, 6).alias("bm25")
    )
    # orderBy+limit compiles to TakeOrderedAndProject: each task keeps its
    # local top-10 and only those reach the driver -- a global-order
    # row_number window would instead move EVERY scored row to one
    # partition. The oracle's ROW_NUMBER states the same selection; the
    # rank column is dropped, so the row sets are identical.
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(10)


@register(
    "tfidf_topk_terms",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf,
             round(CAST(t.tf AS DOUBLE)
                   * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
      FROM tf t JOIN dfq USING (term) CROSS JOIN nd
      WHERE t.doc_id < 100
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction: top-3 terms per document
    by tf * ln(N/df) -- the classic summarization/tagging primitive and
    BM25's unsaturated ancestor (kept alongside it because corpus
    pipelines use TF-IDF for doc->keyword extraction and BM25 for
    query->doc retrieval).

    Scale shape: term frequencies and document frequencies are two
    hash aggregates over the exploded token stream (df computed on the
    FULL corpus -- the per-doc output filter applies after); N is a
    broadcast one-row relation; ranking is a window PARTITIONED by
    doc_id (parallel by document, never global). Scores round to 6
    decimals before ranking (the bm25_keyword_search discipline) so
    1-ulp libm ln() differences can neither flip the oracle nor reorder
    the top-3; remaining ties break on term ASC -- a total order, so
    both engines select the identical set."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tk = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tk.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 100)
        .join(dfq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", F.col("tf").cast("bigint").alias("tf"), "score", "rk")
    )


@register(
    "vocab_topk_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKS}) AS token FROM documents
    ), freq AS (
      SELECT token, COUNT(*) AS n_occ FROM tok GROUP BY token
    ), total AS (
      SELECT SUM(n_occ) AS tot FROM freq
    ), topk AS (
      SELECT token, n_occ FROM freq ORDER BY n_occ DESC, token LIMIT 100
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, token) AS BIGINT) AS rank,
           token, n_occ,
           CAST(SUM(n_occ) OVER (ORDER BY n_occ DESC, token
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(tot AS DOUBLE) AS cum_share
    FROM topk, total
    """,
)
def vocab_topk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary sizing: top-100 tokens by corpus frequency
    with cumulative occurrence coverage -- the curve you read off to
    pick a vocab size (how many types cover 95% of tokens). Scale
    shape: token frequency is ONE groupBy (shuffle O(vocab)); the
    top-k is a partial sort (TakeOrderedAndProject -- each task ships
    its local top-100, never the full vocabulary); the cumulative
    window then runs over exactly k rows, so the single-partition
    window that would be a scale bug on the full vocab is bounded at
    k. The grand total is a one-row broadcast."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    # explode_outer: a plain explode would let InferFiltersFromGenerate
    # push a size(split(...)) > 0 re-evaluation into the scan stage.
    tok = d.select(F.explode_outer(tokens("text")).alias("token")).filter(
        F.col("token").isNotNull()
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_occ"))
    total = freq.agg(F.sum("n_occ").alias("tot"))
    topk = freq.orderBy(F.desc("n_occ"), "token").limit(100)
    w = Window.orderBy(F.desc("n_occ"), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return topk.crossJoin(F.broadcast(total)).select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "token",
        "n_occ",
        (
            F.sum("n_occ").over(w).cast("double") / F.col("tot").cast("double")
        ).alias("cum_share"),
    )


_ZIPF_TOPN = 200  # head of the frequency ranking entering the OLS fit
_ZIPF_SNAP = 1_000_000.0  # micro-snap for the two ln() surfaces


def _zipf_slope_from_counts(freq: DataFrame) -> DataFrame:
    """OLS slope of ln(freq) on ln(rank) over the top-_ZIPF_TOPN token
    frequencies -- exposed separately so tests can drive it on planted
    (token, n_occ) frames with a known power law; see ``zipf_slope_topk``
    for the algorithm and the scale contract.  Returns one row
    (n_top, top1_share, zipf_slope)."""
    total = freq.agg(F.sum("n_occ").alias("tot"))
    topk = freq.orderBy(F.desc("n_occ"), "token").limit(_ZIPF_TOPN)
    w = Window.orderBy(F.desc("n_occ"), "token")
    snapped = topk.select(
        F.floor(
            F.log(F.row_number().over(w).cast("double")) * _ZIPF_SNAP + 0.5
        )
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("n_occ").cast("double")) * _ZIPF_SNAP + 0.5)
        .cast("bigint")
        .alias("y"),
        F.col("n_occ"),
    )
    dec = "decimal(38,0)"
    s = snapped.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.max("n_occ").cast(dec).alias("f1"),
    )
    n = F.col("n").cast(dec)
    return s.crossJoin(F.broadcast(total)).select(
        F.col("n").alias("n_top"),
        (F.col("f1").cast("double") / F.col("tot").cast("double")).alias(
            "top1_share"
        ),
        (
            (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("zipf_slope"),
    )


@register(
    "zipf_slope_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKS}) AS token FROM documents
    ), freq AS (
      SELECT token, COUNT(*) AS n_occ FROM tok GROUP BY token
    ), total AS (SELECT SUM(n_occ) AS tot FROM freq),
    topk AS (
      SELECT token, n_occ FROM freq ORDER BY n_occ DESC, token
      LIMIT {_ZIPF_TOPN}
    ), sn AS (
      SELECT CAST(floor(ln(CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC,
                   token) AS DOUBLE)) * {_ZIPF_SNAP!r} + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(CAST(n_occ AS DOUBLE)) * {_ZIPF_SNAP!r} + 0.5)
               AS BIGINT) AS y,
             n_occ
      FROM topk
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(MAX(n_occ) AS DECIMAL(38,0)) AS f1
      FROM sn
    )
    SELECT n AS n_top,
           CAST(f1 AS DOUBLE) / CAST(tot AS DOUBLE) AS top1_share,
           CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
             AS zipf_slope
    FROM s, total
    """,
)
def zipf_slope_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF-LAW FIT of the corpus frequency head: OLS slope of ln(freq)
    on ln(rank) over the top-_ZIPF_TOPN tokens, plus the top-1 token's
    occurrence share -- the standard corpus-health diagnostic (natural
    text sits near slope -1; templated/synthetic or boilerplate-heavy
    corpora flatten or steepen it, so a drifting slope flags a
    contaminated crawl batch before training).  Companion to
    ``vocab_topk_coverage`` (same head relation; that entry reads the
    coverage curve, this one compresses the head into the power-law
    exponent).

    Distributed shape: ONE token pass into the vocab-grain groupBy
    (shuffle O(vocab), map-side combined); the top-N is a partial sort
    (TakeOrderedAndProject, each task ships its local top-N); the OLS
    runs over exactly N rows, so the unpartitioned rank window is
    bounded at _ZIPF_TOPN rows by construction (the vocab_topk_coverage
    contract) and the fit itself is one N-row aggregate.

    Cross-engine exactness: ranks and frequencies are exact integers;
    both ln() surfaces snap to integer micro-units BEFORE any cross-row
    arithmetic (the dsir_importance_topk libm discipline -- a 1-ulp ln
    divergence only matters exactly on a snap boundary, never observed,
    loudly caught by the sweep), so the OLS sums are EXACT integers
    carried in decimal(38,0) (n*sxy ~ 1.4e19 overflows bigint) and the
    published slope is one IEEE division of bit-identical doubles.

    Reference parity: no text operators in the reference (DAG1:1-322);
    extends the text-analysis family's corpus-law side (Heaps novelty =
    gram_novelty_by_bucket, coverage = vocab_topk_coverage, Zipf =
    this)."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tok = d.select(F.explode_outer(tokens("text")).alias("token")).filter(
        F.col("token").isNotNull()
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_occ"))
    return _zipf_slope_from_counts(freq)


_PMI_CAP = 64  # max distinct tokens per doc entering pair expansion
_PMI_MIN_SUPPORT = 5  # min co-occurring docs for a pair to be reported


@register(
    "token_pmi_pairs",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, list_sort(list_distinct({_TOKS}))[1:{_PMI_CAP}] AS toks
      FROM documents
    ),
    tk2 AS (SELECT doc_id, toks FROM tk WHERE len(toks) >= 2),
    tok AS (SELECT doc_id, unnest(toks) AS token FROM tk2),
    pc AS (
      SELECT a.token AS tok_a, b.token AS tok_b, COUNT(*) AS n_ab
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2 HAVING COUNT(*) >= {_PMI_MIN_SUPPORT}
    ),
    docfreq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
           round(ln((CAST(n_ab AS DOUBLE) * CAST(n_docs AS DOUBLE))
                    / (CAST(da.n AS DOUBLE) * CAST(db.n AS DOUBLE))), 6) AS pmi
    FROM pc
    JOIN docfreq da ON pc.tok_a = da.token
    JOIN docfreq db ON pc.tok_b = db.token
    CROSS JOIN nd
    """,
)
def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over token co-occurrence (document
    level) -- the classic phrase/collocation-mining signal for corpus
    curation: PMI = ln(P(a,b) / (P(a)P(b))) with doc-frequency estimates.

    Scale shape (same discipline as market_basket_pairs): the per-doc
    distinct-token list is sorted and CAPPED at 64 BEFORE pair
    expansion, so per-row fan-out is bounded at C(64,2) regardless of
    document length; pairs are generated inside the array (slice past
    each element -- sorted order gives a<b for free), never by a
    self-join. Doc-frequency and the doc count are vocab-sized /
    one-row aggregates broadcast onto the pair counts. ln() 1-ulp libm
    skew is absorbed by round(.,6) (DETERMINISM.md rule 18); the ratio
    stays in the double domain end-to-end (rule 4).
    """
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tk = d.select(
        "doc_id",
        F.slice(F.array_sort(F.array_distinct(tokens("text"))), 1, _PMI_CAP).alias(
            "toks"
        ),
    )
    tk2 = tk.filter(F.size("toks") >= 2)
    tok = tk2.select(F.explode("toks").alias("token"))
    pair_structs = F.flatten(
        F.transform(
            "toks",
            lambda x, i: F.transform(
                F.slice(F.col("toks"), i + F.lit(2), F.size("toks")),
                lambda y: F.struct(x.alias("tok_a"), y.alias("tok_b")),
            ),
        )
    )
    pc = (
        tk2.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_SUPPORT)
    )
    docfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    da = docfreq.select(F.col("token").alias("tok_a"), F.col("n").alias("n_a"))
    db = docfreq.select(F.col("token").alias("tok_b"), F.col("n").alias("n_b"))
    return (
        pc.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .crossJoin(F.broadcast(nd))
        .select(
            "tok_a",
            "tok_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(
                    (F.col("n_ab").cast("double") * F.col("n_docs").cast("double"))
                    / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH tk AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
    SELECT lang,
           CASE WHEN CAST(len(list_filter(toks, tok -> list_contains({_STOPLIST}, tok))) AS BIGINT) * 100
                     >= CAST(len(toks) AS BIGINT) * 8
                THEN 'en' ELSE 'other' END AS guess,
           COUNT(*) AS n
    FROM tk GROUP BY 1, 2
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-id (stopword density) vs the labeled lang column
    -- a confusion matrix. Integer cross-multiplied threshold: no float
    edge cases."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_guess(tokens("text")).alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
             i -> md5(substr(text, i, 8)))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over character 8-grams."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    return d.select("doc_id", char_ngram_fingerprint("text", 8).alias("fingerprint"))


# ------------------------------------------------------- similarity search


@register(
    "embedding_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS c_vec FROM embeddings
    ), scored AS (
      SELECT query_id, neighbor_id, {_cos_sql('q_vec', 'c_vec')} AS cos_sim
      FROM c CROSS JOIN q WHERE neighbor_id <> query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k (the ANN correctness baseline):
    query batch broadcast against the corpus, JVM-side fold dot product."""
    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "embedding_neardup_lsh",
    oracle=f"""
    WITH v AS (
      SELECT vec_id AS id, embedding AS vec,
             (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings
    )
    SELECT * FROM (
      SELECT a.id AS id_a, b.id AS id_b, {_cos_sql('a.vec', 'b.vec')} AS cos_sim
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.id < b.id
    ) WHERE cos_sim >= 0.5
    """,
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors: sign-LSH bucketing (16 buckets) then exact
    cosine verify within buckets -- the scale path for all-pairs search."""
    return neardup_pairs_lsh(
        t(spark, sf_dir, "embeddings"), bits=4, min_cosine=0.5
    )


# ----------------------------------------------------------------- multimodal


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS magic_hex,
           md5(text) AS content_hash
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: byte length, magic-prefix hex, and
    content hash over a binary payload (here: the utf-8 text bytes standing
    in for image/audio blobs; see operators/multimodal.py for the typed
    decode pipeline)."""
    d = t(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(blob).cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.substring(blob, 1, 4))).alias("magic_hex"),
        F.md5("text").alias("content_hash"),
    )


def _hex_to_int_sql(h: str, start: int, n: int) -> str:
    """Portable SQL for int(substr(h, start, n), 16) via nibble lookups."""
    parts = [
        f"(strpos('0123456789abcdef', substr({h}, {start + i}, 1)) - 1) * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(parts) + ")"


_DECODE_CTE = f"""
WITH meta AS (
  SELECT doc_id,
         1 + {_hex_to_int_sql('md5(text)', 1, 4)} % 4096 AS width,
         1 + {_hex_to_int_sql('md5(text)', 5, 4)} % 4096 AS height,
         1 + {_hex_to_int_sql('md5(text)', 9, 4)} % 240 AS n_frames,
         ['jpeg', 'png', 'webp', 'gif'][1 + {_hex_to_int_sql('md5(text)', 13, 1)} % 4] AS format
  FROM documents
)
""".strip()


@register(
    "multimodal_decode",
    oracle=_DECODE_CTE
    + """
    SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           CAST(n_frames AS INT) AS n_frames, format
    FROM meta
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed media decode via mapInPandas (Arrow-batched Python):
    binary payload -> typed metadata struct. The decode body is the
    deterministic fake (no media libs in this container -- see
    operators/multimodal.py); the Spark plumbing (schema, batch iterator,
    partitioning) is the real pipeline."""
    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    return decode_media(media_table(docs), decoder="fake")


@register(
    "multimodal_thumbnail",
    oracle=_DECODE_CTE
    + """
    SELECT doc_id,
           CAST(CASE WHEN width > 128 OR height > 128
             THEN greatest(floor(width * 128 / greatest(width, height)), 1)
             ELSE width END AS INT) AS thumb_w,
           CAST(CASE WHEN width > 128 OR height > 128
             THEN greatest(floor(height * 128 / greatest(width, height)), 1)
             ELSE height END AS INT) AS thumb_h
    FROM meta
    """,
)
def multimodal_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving thumbnail planning on decoded metadata -- pure
    JVM integer expressions after the Python decode boundary (resize work
    would fan out per row; the dims are the contract)."""
    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    meta = decode_media(media_table(docs), decoder="fake")
    tw, th = thumbnail_dims(F.col("width"), F.col("height"), max_dim=128)
    return meta.select("doc_id", tw.alias("thumb_w"), th.alias("thumb_h"))


@register(
    "multimodal_frame_sample",
    oracle=_DECODE_CTE
    + """
    SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
           CAST((n_frames - 1) // 24 + 1 AS BIGINT) AS n_sampled
    FROM meta
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: every-24th frame indexes as an array,
    exploded (the fan-out that distributes per-frame decode) and counted
    back per document."""
    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    meta = decode_media(media_table(docs), decoder="fake")
    planned = meta.select(
        "doc_id",
        "n_frames",
        F.explode(sample_frame_indexes(F.col("n_frames"), every=24)).alias("frame_idx"),
    )
    return planned.groupBy("doc_id", "n_frames").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


_BMP_H = "md5(CAST(doc_id AS VARCHAR) || ':bmp')"


@register(
    "multimodal_pixels",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             {_hex_to_int_sql(_BMP_H, 1, 2)} AS r0,
             {_hex_to_int_sql(_BMP_H, 3, 2)} AS g0,
             {_hex_to_int_sql(_BMP_H, 5, 2)} AS b0,
             1 + {_hex_to_int_sql(_BMP_H, 7, 2)} % 8 AS w,
             1 + {_hex_to_int_sql(_BMP_H, 9, 2)} % 8 AS hh
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, hh, r0, g0, b0, y
      FROM dims, LATERAL (SELECT unnest(range(hh)) AS y) t
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(hh AS INT) AS height,
           CAST(SUM((r0 + y) % 256) AS DOUBLE) / CAST(hh AS DOUBLE) AS mean_r,
           CAST(SUM((g0 + 2 * y) % 256) AS DOUBLE) / CAST(hh AS DOUBLE) AS mean_g,
           CAST(SUM((b0 + 3 * y) % 256) AS DOUBLE) / CAST(hh AS DOUBLE) AS mean_b,
           CAST(r0 AS INT) AS first_r,
           CAST(g0 AS INT) AS first_g,
           CAST(b0 AS INT) AS first_b
    FROM px GROUP BY doc_id, w, hh, r0, g0, b0
    """,
)
def multimodal_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIXEL-LEVEL multimodal round-trip with NO env gate (round-6): a
    real 24-bit BMP is synthesized per document (genuine
    BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up padded pixel rows,
    geometry/colors derived from md5(doc_id)), then decoded back to
    width/height/per-channel means/top-left pixel by a stdlib
    struct-based parser -- both halves Arrow-batched mapInPandas, no
    Pillow anywhere, so the family's decode evidence executes in every
    environment.

    The oracle is the CLOSED FORM of the pixel generator (per-row
    channel values enumerated via a lateral range over image rows), so
    a decoder that mishandles the 4-byte row stride padding, the
    bottom-up row order (first_* probes the top-left pixel, stored
    LAST), or the header offsets diverges from it. Means are exact:
    integer channel sums, one double division per channel (rule 19);
    mean-over-pixels equals mean-over-rows because rows are constant
    across x, and (w*s)/(w*n) and s/n round to the SAME double (one
    correctly-rounded division of the same real value).

    At 100 TB the payload column never shuffles: synth and decode are
    back-to-back narrow Arrow passes; only the derived fixed-width
    stats flow downstream (the derive-then-drop discipline in the
    module docstring)."""
    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    return decode_bmp_pixels(synth_bmp_table(docs))


_AVI_H = "md5(CAST(doc_id AS VARCHAR) || ':avi')"


@register(
    "multimodal_video_framestats",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             1 + {_hex_to_int_sql(_AVI_H, 1, 2)} % 6 AS w,
             1 + {_hex_to_int_sql(_AVI_H, 3, 2)} % 6 AS hh,
             2 + {_hex_to_int_sql(_AVI_H, 5, 2)} % 6 AS nf,
             {_hex_to_int_sql(_AVI_H, 7, 2)} AS r0,
             {_hex_to_int_sql(_AVI_H, 9, 2)} AS g0,
             {_hex_to_int_sql(_AVI_H, 11, 2)} AS b0
      FROM documents
    ),
    fy AS (
      SELECT doc_id, w, hh, nf, r0, g0, b0, f, y
      FROM dims,
           LATERAL (SELECT unnest(range(0, nf, 2)) AS f) tf,
           LATERAL (SELECT unnest(range(hh)) AS y) ty
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(hh AS INT) AS height,
           CAST(nf AS INT) AS n_frames,
           CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
           CAST(SUM(((r0 + y + 5 * f) % 256) * w) AS BIGINT) AS sum_r,
           CAST(SUM(((g0 + 2 * y + 7 * f) % 256) * w) AS BIGINT) AS sum_g,
           CAST(SUM(((b0 + 3 * y + 11 * f) % 256) * w) AS BIGINT) AS sum_b
    FROM fy GROUP BY doc_id, w, hh, nf
    """,
)
def multimodal_video_framestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRAME-LEVEL video round-trip -- the third leg of the multimodal
    triad, with a REAL container decode in every environment: a genuine
    uncompressed AVI (RIFF 'AVI ' form: LIST hdrl with avih main header
    + 'vids'/'DIB ' stream headers, LIST movi with one raw bottom-up
    BGR '00db' chunk per frame) is synthesized per document and decoded
    by the stdlib chunk-walking parser. The decoder executes the
    ``sample_frame_indexes`` semantics AT THE BYTE LEVEL: only every
    2nd frame's pixel array is touched (production frame sampling skips
    the decode cost of unsampled frames, not just their rows), and the
    header-declared frame count is cross-checked against the movi chunk
    census so a truncated tail fails loudly.

    Output is integer-exact: per-doc geometry, frame counts, and
    per-channel pixel sums over the sampled frames (int64 accumulation,
    no division anywhere), so the oracle restates the frame generator
    ((r0+y+5f)%256 etc.) in closed form over the sampled-frame lattice
    and matches bit-for-bit.

    At 100 TB: same derive-then-drop shape as the image/audio twins --
    payloads stay in one narrow Arrow pass, only fixed-width stats
    shuffle into the final small groupBy."""
    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    frames = decode_avi_frames(synth_avi_table(docs), every=2)
    return frames.groupBy("doc_id", "width", "height", "n_frames").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum("fsum_r").alias("sum_r"),
        F.sum("fsum_g").alias("sum_g"),
        F.sum("fsum_b").alias("sum_b"),
    )


_WAV_H = "md5(CAST(doc_id AS VARCHAR) || ':wav')"


@register(
    "multimodal_audio_features",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             64 + {_hex_to_int_sql(_WAV_H, 1, 2)} % 64 AS n,
             8000 * (1 + {_hex_to_int_sql(_WAV_H, 3, 2)} % 3) AS rate,
             {_hex_to_int_sql(_WAV_H, 5, 4)} % 20011 AS a0
      FROM documents
    ),
    sm AS (
      SELECT doc_id, n, rate,
             ((a0 + 1097 * i) % 4001) - 2000 AS s,
             CASE WHEN i > 0
                  THEN ((a0 + 1097 * (i - 1)) % 4001) - 2000 END AS sp
      FROM dims, LATERAL (SELECT unnest(range(n)) AS i) t
    )
    SELECT doc_id,
           CAST(rate AS INT) AS sample_rate,
           CAST(n AS INT) AS n_samples,
           CAST((n * 1000000) // rate AS BIGINT) AS duration_us,
           CAST(MAX(abs(s)) AS INT) AS peak_abs,
           CAST(SUM(abs(s)) AS BIGINT) AS sum_abs,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN sp IS NOT NULL AND s * sp < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM sm GROUP BY doc_id, n, rate
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-LEVEL audio round-trip -- the WAV twin of
    ``multimodal_pixels``, completing the image/audio/video triad with a
    REAL decode in every environment: a genuine RIFF/WAVE container
    (canonical fmt chunk, little-endian int16 data chunk) is synthesized
    per document and decoded back by a stdlib chunk-WALKING parser
    (struct + numpy frombuffer; real files interleave LIST/INFO chunks,
    so the parser honors chunk sizes and word alignment instead of fixed
    offsets). Features are the production audio-curation set: duration,
    peak, mean-abs ingredients, energy, zero-crossing count -- the cheap
    heuristics that gate speech/music corpus quality before any model
    runs.

    EVERY feature is integer-exact (int16 samples, int64 accumulation --
    a squared int16 needs the widening; crossings are strict sign flips
    s_i * s_{{i-1}} < 0), so the oracle restates the sawtooth generator
    s_i = ((a0 + 1097*i) % 4001) - 2000 in closed form and matches
    bit-for-bit with no snapping anywhere.

    At 100 TB the payload column follows the module's derive-then-drop
    discipline: synth and decode are back-to-back narrow Arrow passes,
    only fixed-width features flow downstream, the audio bytes never
    shuffle."""
    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    return decode_wav_features(synth_wav_table(docs))


@register(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS DOUBLE)
             / greatest(n_chars, 1) AS tokens_per_char
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex (letter
    runs | digit runs | single punctuation) -- the cheap proxy for LLM
    token budgeting; pure JVM regexp_count, no UDF."""
    d = t(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    n = F.regexp_count("text", F.lit(pat)).cast("bigint")
    return d.select(
        "doc_id",
        n.alias("n_bpe_tokens"),
        (n.cast("double") / F.greatest("n_chars", F.lit(1))).alias("tokens_per_char"),
    )


def _ivf_oracle() -> str:
    cos_qc = _cos_sql("e.embedding", "c.cvec")
    cos_pair = _cos_sql("qa.vec", "ca.vec")
    return f"""
    WITH cents AS (
      SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ), ca AS (
      SELECT neighbor_id, vec, cell FROM (
        SELECT e.vec_id AS neighbor_id, e.embedding AS vec, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos_qc} DESC, c.cell) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ), qa AS (
      SELECT query_id, vec, cell FROM (
        SELECT e.vec_id AS query_id, e.embedding AS vec, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos_qc} DESC, c.cell) AS rn
        FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 10
      ) WHERE rn <= 2
    ), cand AS (
      SELECT DISTINCT qa.query_id, ca.neighbor_id, {cos_pair} AS cos_sim
      FROM qa JOIN ca ON qa.cell = ca.cell AND ca.neighbor_id <> qa.query_id
    )
    SELECT * FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM cand
    ) WHERE rank <= 5
    """


@register("embedding_ivf_topk", eager_build=True, oracle=_ivf_oracle())
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors -- the scale path: corpus bucketed
    into nearest-centroid cells (one broadcast pass), queries probe their 2
    nearest cells, exact cosine only within probed cells. Deterministic
    fixed centroid set here (vec_id < 8) so the oracle reproduces it;
    production trains centroids with Spark ML KMeans."""
    from ..operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    return ivf_topk(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < 10),
        centroids=emb.filter(F.col("vec_id") < 8),
        k=5,
        n_probe=2,
    )


@register(
    "dedup_cluster_survivors",
    eager_build=True,
    oracle=_minhash_sig_cte()
    + """
    , pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM mh a JOIN mh b ON a.doc_id < b.doc_id AND (
           (a.mh0 = b.mh0 AND a.mh1 = b.mh1) OR
           (a.mh2 = b.mh2 AND a.mh3 = b.mh3) OR
           (a.mh4 = b.mh4 AND a.mh5 = b.mh5) OR
           (a.mh6 = b.mh6 AND a.mh7 = b.mh7))
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
      ) SELECT * FROM r
    ), labels AS (
      SELECT src AS id, least(src, MIN(dst)) AS label FROM reach GROUP BY src
    )
    SELECT label AS cluster_label, COUNT(*) AS n_members
    FROM labels GROUP BY label
    """,
)
def dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup resolution end-to-end: MinHash-LSH candidate pairs ->
    connected components (iterative min-label propagation; the oracle
    states the same fixpoint as a recursive transitive closure) -> cluster
    label = canonical survivor id, with member counts."""
    from ..operators.dedup import cluster_labels

    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    sigs = minhash_signatures(docs, num_hashes=8, shingle_n=3)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, band_size=2)
    labels = cluster_labels(pairs)
    return labels.groupBy(F.col("label").alias("cluster_label")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@register(
    "embedding_l2_normalize",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
      FROM embeddings WHERE vec_id < 200
    )
    SELECT vec_id,
           array_to_string(list_transform(embedding,
             x -> CAST(CAST(floor(CAST(x AS DOUBLE) / nrm
                                  * CAST(1e9 AS DOUBLE)
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)
                       AS VARCHAR)), '|') AS unit_vec_nano
    FROM n
    """,
)
def embedding_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (the Arrow-batched Python boundary for
    row-wise math the built-ins cover awkwardly): L2-normalize embeddings.
    The norm is a sequential left-fold, matching the JVM aggregate() and
    the DuckDB list_reduce bit-for-bit (numpy pairwise summation would
    drift in the last ulp). Components are published as '|'-joined
    nano-unit integers (floor(x*1e9+0.5) -- identical IEEE double ops in
    Python/JVM/DuckDB) because the harness canonicalizer cannot hash raw
    list cells; the array<double> form is covered by
    embedding_l2_normalize_jvm's pytest golden."""
    import math

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def l2_normalize_nano(vecs: pd.Series) -> pd.Series:
        def norm_one(v):
            acc = 0.0
            for x in v:
                xd = float(x)
                acc += xd * xd
            n = math.sqrt(acc)
            return "|".join(
                str(math.floor(float(x) / n * 1e9 + 0.5)) for x in v
            )

        return vecs.map(norm_one)

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return emb.select("vec_id", l2_normalize_nano("embedding").alias("unit_vec_nano"))


@register(
    "embedding_l2_normalize_jvm",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
      FROM embeddings WHERE vec_id < 200
    )
    SELECT vec_id,
           array_to_string(list_transform(embedding,
             x -> CAST(CAST(floor(CAST(x AS DOUBLE) / nrm
                                  * CAST(1e9 AS DOUBLE)
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)
                       AS VARCHAR)), '|') AS unit_vec_nano
    FROM n
    """,
)
def embedding_l2_normalize_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production L2-normalize: pure JVM transform/aggregate (zero
    Python boundary, stays inside whole-stage codegen) -- the plan to run
    at 100 TB. The norm is staged as a projected column (see
    ``with_l2_normalized``) so it folds ONCE per row; the inline form
    would re-fold per element (O(d^2)/row -- Catalyst does not CSE through
    HOF lambdas). Same nano-unit string output as the pandas_udf variant
    so the two are directly comparable in the harness and the bench."""
    from ..operators.similarity import with_l2_normalized

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    staged = with_l2_normalized(emb, "embedding", "__unit")
    nano = F.transform(
        F.col("__unit"),
        lambda u: F.floor(u * F.lit(1e9) + F.lit(0.5)).cast("long").cast("string"),
    )
    return staged.select("vec_id", F.array_join(nano, "|").alias("unit_vec_nano"))


def _jl_oracle(d_in: int = 64, d_out: int = 8) -> str:
    from ..operators.similarity import jl_projection_matrix

    mat = jl_projection_matrix(d_in, d_out)
    dims = []
    for row in mat:
        lit = "[" + ", ".join(repr(x) for x in row) + "]"
        fold = (
            f"list_reduce(list_transform(range(1, {d_in + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]), (a, b) -> a + b)"
        )
        dims.append(
            f"CAST(CAST(floor({fold} * 1e9 + 0.5) AS BIGINT) AS VARCHAR)"
        )
    cat = " || '|' || ".join(dims)
    return f"""
    SELECT vec_id, {cat} AS proj_nano
    FROM embeddings WHERE vec_id < 200
    """


@register("embedding_random_projection", oracle=_jl_oracle())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 8 dims with a
    deterministic md5-derived +-1/sqrt(8) matrix -- the standard cheap
    dimensionality cut BEFORE anything shuffles embedding rows
    (downstream joins move 8 doubles instead of 64 floats). Fully
    narrow: d_out sequential folds per row against literal matrix rows,
    zero shuffle; the matrix is driver-sized by definition and
    reproducible in any engine with md5, which is how the oracle
    rebuilds it bit-for-bit. Output nano-scaled to a pipe-joined string
    (house style for float-array comparisons)."""
    from ..operators.similarity import random_project

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    p = random_project(emb, d_in=64, d_out=8)
    nano = F.transform(
        F.col("proj"),
        lambda u: F.floor(u * F.lit(1e9) + F.lit(0.5)).cast("long").cast("string"),
    )
    return p.select("vec_id", F.array_join(nano, "|").alias("proj_nano"))


@register(
    "text_pii_redact",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact: user' || doc_id || '@example.com or 555-123-4567' AS text
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text,
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS BIGINT) AS n_phone,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '[PHONE]', 'g') AS redacted
    FROM synth
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (email/phone) over text -- the standard
    pre-training scrub. PII is synthesized onto the docs so both engines
    see identical input; counts and the redacted text are both checked."""
    from ..operators.text import pii_counts, redact_pii

    pats = {
        "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    }
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    synth = d.withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit(" contact: user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567"),
        ),
    )
    return synth.select(
        "doc_id",
        *pii_counts("text", pats),
        redact_pii("text", pats).alias("redacted"),
    )

def _brute_topk_sql() -> str:
    """Exact brute-force top-5 CTE (same shape as embedding_cosine_topk)."""
    return f"""
    exact_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_cos_sql('q.embedding', 'c.embedding')} AS cos_sim
      FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
      WHERE c.vec_id <> q.vec_id
    ), exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM exact_scored
      ) WHERE rk <= 5
    )
    """


@register(
    "ivf_recall_at_5",
    eager_build=True,
    oracle=_ivf_oracle().rstrip()
    .replace("WITH cents AS (", "WITH " + _brute_topk_sql().strip().rstrip() + ", cents AS (", 1)
    .replace(
        """SELECT * FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM cand
    ) WHERE rank <= 5""",
        """SELECT t.query_id,
           CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(i.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5
    FROM exact_top t
    LEFT JOIN (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rk
        FROM cand
      ) WHERE rk <= 5
    ) i ON i.query_id = t.query_id AND i.neighbor_id = t.neighbor_id
    GROUP BY t.query_id""",
        1,
    ),
)
def ivf_recall_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement: recall@5 of the IVF index against the
    exact brute-force top-5, per query. Both sides are deterministic, so
    even the quality metric is oracle-checkable -- the discipline for
    tuning (n_cells, n_probe) on real corpora."""
    from ..operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = ivf_topk(
        corpus=emb, queries=queries,
        centroids=emb.filter(F.col("vec_id") < 8), k=5, n_probe=2,
    ).select("query_id", F.col("neighbor_id").alias("ivf_neighbor"))
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.ivf_neighbor),
        "left",
    ).select(exact.query_id, approx.ivf_neighbor)
    return hits.groupBy("query_id").agg(
        F.count("ivf_neighbor").alias("n_hits"),
        (F.count("ivf_neighbor").cast("double") / 5.0).alias("recall_at_5"),
    )


@register(
    "embedding_ivf_kmeans_recall",
    eager_build=True,
    oracle="""
    SELECT CAST(vec_id AS BIGINT) AS query_id,
           TRUE AS n_hits_ok, TRUE AS n_approx_ok, TRUE AS hits_subset_ok
    FROM embeddings WHERE vec_id < 10
    """,
)
def embedding_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION IVF index end-to-end: centroids trained with Spark
    ML KMeans (seeded -- reproducible for a fixed input) instead of the
    oracle-parity fixed subset, then the same assign/probe/verify path as
    embedding_ivf_topk, measured as recall@5 against the exact brute
    force. Training is a corpus-sample job; assignment stays one narrow
    pass; the trained centers travel via the fitted model (k vectors on
    the driver by definition).

    Oracle (bounds, hll_sketch_merge style -- KMeans means are
    float-nondeterministic ACROSS engines, so a value oracle is
    impossible, but the index's structural guarantees are not): per
    query, 0 <= n_hits <= 5, the probed candidate list is non-empty and
    at most k (1 <= n_approx <= 5), and hits are a subset of the
    candidates (n_hits <= n_approx).  The THRESHOLD-style assertions
    (mean recall@5 >= 0.2, cell census) live in the pytest invariant
    layer instead (tests/test_diagnostics_entries.py,
    test_kmeans_ivf_thresholds_hold) -- ADVICE r6: a different
    JVM/BLAS/Spark can legitimately produce an empty cluster or lower
    recall, and oracle-pinning an environment-sensitive boolean turns
    correct behavior into a hard gate failure; moving them also removes
    the duplicated full-corpus ``assign_cells`` census pass this entry
    paid for n_cells (the round-6 suite's heaviest query).  Raw
    per-query recalls stay observable through ``ivf_recall_at_5``, the
    fixed-centroid oracle-parity variant."""
    from ..operators.similarity import ivf_topk, kmeans_centroids

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = kmeans_centroids(emb, k=8, seed=42, max_iter=10)
    exact = cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = ivf_topk(
        corpus=emb, queries=queries, centroids=cents, k=5, n_probe=2
    ).select("query_id", F.col("neighbor_id").alias("ivf_neighbor"))
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.ivf_neighbor),
        "left",
    ).select(exact.query_id, approx.ivf_neighbor)
    per_q = (
        hits.groupBy("query_id")
        .agg(F.count("ivf_neighbor").alias("n_hits"))
        .join(
            approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_approx")),
            "query_id",
            "left",
        )
        .select(
            "query_id", "n_hits", F.coalesce("n_approx", F.lit(0)).alias("n_approx")
        )
    )
    return per_q.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        ((F.col("n_hits") >= 0) & (F.col("n_hits") <= 5)).alias("n_hits_ok"),
        ((F.col("n_approx") >= 1) & (F.col("n_approx") <= 5)).alias(
            "n_approx_ok"
        ),
        (F.col("n_hits") <= F.col("n_approx")).alias("hits_subset_ok"),
    )


def _simhash_blocking_oracle() -> str:
    inner = _simhash_oracle().strip()
    return f"""
    WITH sh AS ({inner})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash
    FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
    """


@register("simhash_blocking_pairs", oracle=_simhash_blocking_oracle())
def simhash_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier-4 near-dup blocking: docs sharing an identical 16-bit SimHash
    become candidate pairs via an equi-join on the hash -- the O(docs)
    shuffle alternative to hamming-distance search (wider radii: split
    the hash into bands like MinHash-LSH)."""
    sh = simhash_table(rebalance_for_cpu(t(spark, sf_dir, "documents")))
    a = sh.select(F.col("doc_id").alias("id_a"), "simhash")
    b = sh.select(F.col("doc_id").alias("id_b"), "simhash")
    return (
        a.join(b, "simhash")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "simhash")
    )


@register(
    "weighted_sample_ares",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln((('0x' || substr(md5('ares:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                 + 1.0) / 281474976710657.0) / CAST(n_chars AS DOUBLE) AS r
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_chars, r,
             CAST(ROW_NUMBER() OVER (ORDER BY r DESC, doc_id) AS BIGINT) AS rk
      FROM keyed
    )
    SELECT doc_id, n_chars, round(r, 6) AS sample_key, rk
    FROM ranked WHERE rk <= 20
    """,
)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement (Efraimidis-
    Spirakis A-ES): each doc gets key ln(u)/w for a salted-md5 uniform
    u in (0,1] and weight w (n_chars here; production: a quality score),
    and the sample is the top-k by key -- inclusion probability
    proportional to weight, reproducible bit-for-bit on any engine and
    any shard count because u derives from the id, not an RNG (the house
    corpus_shard_shuffle discipline applied to WEIGHTED selection; this
    is how quality-weighted corpus subsets are drawn at 100 TB: one
    narrow key expression + a top-k, no global RNG state, and per-shard
    top-k lists merge associatively so the selection is one
    TakeOrdered, never a full sort).

    Determinism note: ranking compares raw ln(u)/w doubles; a 1-ulp
    libm ln() divergence could in principle reorder two keys, but keys
    of distinct docs differ by >>ulp with md5-uniform u (and doc_id
    breaks exact ties), the same probabilistic discipline as the
    entropy/pmi roundings. The emitted key rounds to 6 decimals."""
    d = t(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ares:"), F.col("doc_id").cast("string"))), 1, 12),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(281474976710657.0)
    r = F.log(u) / F.col("n_chars").cast("double")
    # orderBy+limit executes as TakeOrderedAndProject (per-partition
    # top-20 merged on the driver -- the associative merge the docstring
    # promises; plan-pinned in test_plans.py). The rank window after it
    # is unpartitioned but runs over a LIMIT-bounded 20-row relation --
    # bounded by construction, not a scale hazard.
    top = (
        d.select("doc_id", "n_chars", r.alias("r"))
        .orderBy(F.col("r").desc(), "doc_id")
        .limit(20)
    )
    w = Window.orderBy(F.col("r").desc(), "doc_id")
    return (
        top.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .select(
            "doc_id", "n_chars", F.round("r", 6).alias("sample_key"), "rk"
        )
    )


@register(
    "kappa_lang_agreement",
    oracle=f"""
    WITH tk AS (
      SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS a,
             CASE WHEN CAST(len(list_filter({_TOKS},
                        tok -> list_contains({_STOPLIST}, tok))) AS BIGINT) * 100
                       >= CAST(len({_TOKS}) AS BIGINT) * 8
                  THEN 'en' ELSE 'other' END AS b
      FROM documents
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
             CAST(SUM(CASE WHEN a = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS a_en,
             CAST(SUM(CASE WHEN b = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS b_en
      FROM tk
    )
    SELECT n, n_agree,
           CAST(n * n_agree - (a_en * b_en + (n - a_en) * (n - b_en)) AS DOUBLE)
             / CAST(n * n - (a_en * b_en + (n - a_en) * (n - b_en)) AS DOUBLE)
             AS kappa
    FROM m
    """,
)
def kappa_lang_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the corpus's labeled language (collapsed to
    en/other) and the heuristic stopword-density classifier -- the
    agreement metric eval pipelines report when two labelers (a model
    and a human, two annotation runs) judge the same items, correcting
    raw accuracy for chance agreement.

    Exactness: with binary raters, kappa reduces to a RATIO OF INTEGERS
    -- (n*agree - (a_en*b_en + a_oth*b_oth)) / (n^2 - (a_en*b_en +
    a_oth*b_oth)) -- so a single correctly-rounded division produces the
    bit-identical double in any engine (DETERMINISM.md: div is exact; no
    snap needed). Scale shape: ONE hash aggregate over the corpus
    producing four counters; everything after is constant-space."""
    from ..operators.text import lang_guess, tokens

    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tk = d.select(
        F.when(F.col("lang") == "en", "en").otherwise("other").alias("a"),
        lang_guess(tokens("text")).alias("b"),
    )
    m = tk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
        F.sum(F.when(F.col("a") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("a_en"),
        F.sum(F.when(F.col("b") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("b_en"),
    )
    pe_num = F.col("a_en") * F.col("b_en") + (F.col("n") - F.col("a_en")) * (
        F.col("n") - F.col("b_en")
    )
    return m.select(
        "n",
        "n_agree",
        (
            (F.col("n") * F.col("n_agree") - pe_num).cast("double")
            / (F.col("n") * F.col("n") - pe_num).cast("double")
        ).alias("kappa"),
    )


def _split_leakage_oracle() -> str:
    inner = _simhash_oracle().strip()
    return f"""
    WITH sh AS ({inner}),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
    ),
    s AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                       % 100 < 80 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                       % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT sa.split AS split_a, sb.split AS split_b,
           COUNT(*) AS n_pairs,
           (sa.split <> sb.split) AS is_leak
    FROM p JOIN s sa ON sa.doc_id = p.id_a JOIN s sb ON sb.doc_id = p.id_b
    GROUP BY sa.split, sb.split
    """


@register("split_leakage_neardup", oracle=_split_leakage_oracle())
def split_leakage_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test CONTAMINATION audit: near-duplicate candidate pairs
    (simhash blocking, the simhash_blocking_pairs mechanism) crossed
    with the deterministic md5 split rule (the train_val_test_split
    rule) -- any pair whose members land in DIFFERENT splits is
    evaluation leakage through a near-copy, the classic way held-out
    metrics go quietly optimistic. The output is the split x split pair
    matrix with an is_leak flag; a clean corpus has zero is_leak rows.

    The production remediation is to split by CLUSTER, not by doc: route
    each connected near-dup component (dedup_semantic_clusters) through
    the hash of its MIN member id so the whole cluster lands in one
    split. Scale shape: split assignment is a narrow per-row expression,
    pair generation is the O(docs) equi-join on the 16-bit hash (never
    all-pairs), and the matrix is a tiny groupBy -- the audit costs one
    hash shuffle at 100 TB."""
    sh = simhash_table(rebalance_for_cpu(t(spark, sf_dir, "documents")))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    ss = sh.select("doc_id", "simhash", split.alias("split"))
    a = ss.select(
        F.col("doc_id").alias("id_a"), "simhash", F.col("split").alias("split_a")
    )
    b = ss.select(
        F.col("doc_id").alias("id_b"), "simhash", F.col("split").alias("split_b")
    )
    return (
        a.join(b, "simhash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            (F.col("split_a") != F.col("split_b")).alias("is_leak"),
        )
    )


def _cluster_split_oracle() -> str:
    inner = _simhash_oracle().strip()
    return f"""
    WITH sh AS ({inner}),
    cl AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY simhash) AS cluster_id,
             simhash
      FROM sh
    ),
    s AS (
      SELECT doc_id, simhash,
             CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 6))::BIGINT
                       % 100 < 80 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 6))::BIGINT
                       % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM cl
    ),
    p AS (
      SELECT a.split AS split_a, b.split AS split_b
      FROM s a JOIN s b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
    )
    SELECT split_a, split_b, COUNT(*) AS n_pairs,
           (split_a <> split_b) AS is_leak
    FROM p GROUP BY split_a, split_b
    """


@register("cluster_aware_split", oracle=_cluster_split_oracle())
def cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMEDIATION for split_leakage_neardup: assign splits by
    near-dup CLUSTER, not by document -- every doc routes through the
    md5 of its cluster's MIN member id, so a whole family of near-copies
    lands in one split and the leakage matrix collapses to the diagonal
    (is_leak is FALSE on every row, pinned by the invariant test).

    Under simhash blocking the clusters are free: each doc has exactly
    one 16-bit hash, so candidate blocks are DISJOINT CLIQUES and the
    component id is simply min(doc_id) over the hash group -- one window
    (or groupBy+join) on the hash shuffle, no iterative label
    propagation. (With banded/multi-probe candidates, blocks overlap
    and the id comes from the dedup_semantic_clusters label-prop
    instead; the split rule downstream is identical.) Same audit shape
    as the leakage entry, same O(docs) cost.

    Shared-relation shape (round-8): the split relation feeds BOTH join
    sides; built lazily twice, each side re-scans documents and re-runs
    the simhash window. A lazy ``localCheckpoint`` stages the narrow
    (doc_id, simhash, split) relation once -- one documents scan, one
    window -- and both sides read the checkpointed blocks (the
    minhash_jaccard_estimate shared-build pattern; lazy, so plan
    construction stays side-effect-free)."""
    sh = simhash_table(rebalance_for_cpu(t(spark, sf_dir, "documents")))
    w = Window.partitionBy("simhash")
    cl = sh.select("doc_id", "simhash", F.min("doc_id").over(w).alias("cluster_id"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 6), 16, 10
        ).cast("long") % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    ss = cl.select("doc_id", "simhash", split.alias("split")).localCheckpoint(
        eager=False
    )
    a = ss.select(
        F.col("doc_id").alias("id_a"), "simhash", F.col("split").alias("split_a")
    )
    b = ss.select(
        F.col("doc_id").alias("id_b"), "simhash", F.col("split").alias("split_b")
    )
    return (
        a.join(b, "simhash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            (F.col("split_a") != F.col("split_b")).alias("is_leak"),
        )
    )


_SIMHASH_BAND_BITS = 24  # == derive_band_bits(6e5): the 100x-probe corpus
_SIMHASH_N_BANDS = 4  # radius 3 + 1 (pigeonhole completeness)


def _simhash_bands_sql() -> str:
    """Per-doc band values b0..b{n-1}, bit-identical to
    operators.dedup.simhash_band_cols: band b packs hash bits
    [b*w, (b+1)*w) of the token-md5 vote hash into its own bigint."""
    band_exprs = []
    for bnd in range(_SIMHASH_N_BANDS):
        votes = []
        for j in range(_SIMHASH_BAND_BITS):
            g = bnd * _SIMHASH_BAND_BITS + j
            ni, bi = g // 4 + 1, g % 4
            contrib = (
                f"CASE WHEN (((strpos('0123456789abcdef', substr(md5(tok), {ni}, 1)) - 1)"
                f" >> {bi}) & 1) = 1 THEN 1 ELSE -1 END"
            )
            votes.append(
                f"CASE WHEN list_sum(list_transform(toks, tok -> {contrib})) > 0 "
                f"THEN CAST({2 ** j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            )
        band_exprs.append(" + ".join(votes) + f" AS b{bnd}")
    cols = ",\n           ".join(band_exprs)
    return f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id, {cols} FROM tk
    """


def _simhash_banded_oracle() -> str:
    inner = _simhash_bands_sql().strip()
    ham = " + ".join(
        f"bit_count(xor(a.b{b}, b.b{b}))" for b in range(_SIMHASH_N_BANDS)
    )
    return f"""
    WITH sh AS ({inner})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST({ham} AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE {ham} <= 3
    """


@register("simhash_banded_pairs", oracle=_simhash_banded_oracle())
def simhash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier-4 near-dup with a HAMMING RADIUS, not just identity: a
    96-bit SimHash split into 4 bands of 24 bits, each band its own
    bigint column; two hashes within Hamming distance 3 differ in at
    most 3 bits, so by pigeonhole at least one band is untouched -- an
    equi-join per band (any-band-equal => candidate) is COMPLETE for
    radius <= 3. Candidates sharing several bands are deduped, then the
    exact filter (hamming = SUM over bands of bit_count(xor), exact
    because bands partition the bit space) keeps true near-dups; the
    oracle checks the same radius from an all-pairs scan (fine in
    DuckDB at test SF -- the banded plan exists precisely so Spark
    never does that scan at 100 TB).

    BAND SPACE IS THE SCALE LEVER, and it must scale with the corpus:
    the r8 100x probe measured the previous fixed 60-bit/15-bit layout
    saturating -- 221x candidates at 100x corpus, the LSH band-space
    knee, because random collisions per band grow n^2/2^w once corpus
    >> n_bands * 2^w (docs/SCALEUP.md, 100x table). The fix is
    ``derive_band_bits(n_docs)`` (operators/dedup.py): w ~ log2(n) + 2,
    nibble-aligned, so expected random band collisions stay O(corpus)
    at every scale -- 24 bits at the probe's 6e5-doc corpus (pinned
    here: the catalog entry is the derived width for the largest corpus
    the repo measures), 40 bits at 1e11 docs, always below the 60-bit
    per-band bigint ceiling. Multi-bigint bands remove the old 60-bit
    total-width cap entirely (96 bits here; md5 supplies up to 128).
    The 16-bit hash remains as the simhash16/simhash_blocking_pairs
    surface."""
    sh = simhash_bands_table(
        rebalance_for_cpu(t(spark, sf_dir, "documents")),
        band_bits=_SIMHASH_BAND_BITS,
        n_bands=_SIMHASH_N_BANDS,
    )
    band_cols = [f"band{b}" for b in range(_SIMHASH_N_BANDS)]
    bands = sh.select(
        "doc_id",
        *band_cols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(c).alias("val"))
                    for b, c in enumerate(band_cols)
                ]
            )
        ).alias("bv"),
    ).select(
        "doc_id", *band_cols, F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(c).alias(f"a_{c}") for c in band_cols],
        "band",
        "val",
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(c).alias(f"b_{c}") for c in band_cols],
        "band",
        "val",
    )
    # hamming is computed IN the join projection (re-evaluated per
    # colliding band, a small constant) so the distinct hauls ONE
    # carried bigint per pair instead of all 8 band columns -- the
    # candidate relation is the 100x probe's 4M+-row shuffle, and
    # (id_a, id_b) functionally determines hamming, so the distinct
    # over the triple equals the distinct over the pair
    hamming = sum(
        (
            F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
            for c in band_cols
        ),
        start=F.lit(0),
    ).cast("bigint")
    # radius filter BEFORE the distinct: the exact verify is map-side
    # (per join-output row), so the dedup exchange carries only true
    # near-dups (131 rows at sf0.1) instead of every band collision
    # (4M+ at the 100x probe)
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .distinct()  # a pair can collide in several bands
    )


@register(
    "udtf_term_doc_freq",
    oracle="""
    SELECT term,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    )
    GROUP BY term
    HAVING COUNT(*) >= 100
    """,
)
def udtf_term_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: LATERAL term_explode(text) expands each doc
    into (term, pos) rows inside the Python runner (streaming out, no
    per-row list materialization), then a plain JVM-side aggregate builds
    the document-frequency table. The UDTF is the pattern for custom
    parsers; for a plain whitespace split prefer explode(split(...)) --
    kept Python-side here precisely to exercise the table-function API."""
    from ..functions.tables import register_udtfs

    register_udtfs(spark)
    t(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT t.term,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM docs_udtf, LATERAL term_explode(text) t
        GROUP BY t.term
        HAVING COUNT(*) >= 100
        """
    )


@register(
    "embedding_int8_quantize",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT vec_id, scale,
           list_max(list_transform(v,
             x -> abs(x - greatest(least(floor(x / scale + 0.5), 127), -127)
                          * scale))) AS max_abs_err,
           len(list_filter(v,
             x -> abs(floor(x / scale + 0.5)) >= 127)) AS n_saturated
    FROM q
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (per-vector absmax scale), reported as
    reconstruction error + saturation count per vector -- the storage
    path that cuts an embedding corpus 4x before ANN indexing. All math
    in double with explicit floor(x+0.5) rounding so the result is
    bit-identical across engines (round() half-even vs half-up differs);
    everything stays JVM-side in array higher-order functions."""
    e = t(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))) / 127
    q = e.select("vec_id", scale.alias("scale"), v.alias("v"))
    qcode = lambda x: F.greatest(  # noqa: E731
        F.least(F.floor(x / F.col("scale") + 0.5), F.lit(127.0)), F.lit(-127.0)
    )
    return q.select(
        "vec_id",
        "scale",
        F.array_max(
            F.transform("v", lambda x: F.abs(x - qcode(x) * F.col("scale")))
        ).alias("max_abs_err"),
        F.size(
            F.filter("v", lambda x: F.abs(F.floor(x / F.col("scale") + 0.5)) >= 127)
        ).cast("long").alias("n_saturated"),
    )


@register(
    "embedding_pq_codes",
    eager_build=True,
    oracle="""
    WITH cb AS (
      SELECT vec_id AS code, embedding FROM embeddings WHERE vec_id < 4
    ), v AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
    ), sub AS (
      SELECT v.vec_id, s.s, cb.code,
             list_reduce(list_transform(range(1, 9), j ->
               (CAST(v.embedding[s.s * 8 + j] AS DOUBLE)
                - CAST(cb.embedding[s.s * 8 + j] AS DOUBLE))
               * (CAST(v.embedding[s.s * 8 + j] AS DOUBLE)
                  - CAST(cb.embedding[s.s * 8 + j] AS DOUBLE))),
               (a, b) -> a + b) AS d2
      FROM v
      CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
      CROSS JOIN cb
    ), best AS (
      SELECT vec_id, s, code, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                ORDER BY d2, code) AS rk
      FROM sub
    )
    SELECT vec_id, CAST(s AS BIGINT) AS subspace,
           CAST(code AS BIGINT) AS code, d2
    FROM best WHERE rk = 1
    """,
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (the 100 TB embedding-compression path: a
    d-dim float vector becomes m byte-sized codes, ~500x at production
    d; approximate search then uses code-table lookups). d=64 split into
    m=8 subspaces of 8 dims; codebook = the subvectors of the first 4
    embeddings (deterministic, so the oracle reproduces it -- production
    trains per-subspace KMeans, same driver-sized shape). One row per
    (vector, subspace) with the chosen code and the subspace quantization
    error; fully narrow per-row JVM expression work, sequential IEEE
    folds matching the DuckDB oracle bit-for-bit."""
    from ..operators.similarity import pq_encode

    emb = t(spark, sf_dir, "embeddings")
    cb_rows = emb.filter(F.col("vec_id") < 4).select("vec_id", "embedding").collect()
    codebook = {
        (s, int(r["vec_id"])): [float(x) for x in r["embedding"][s * 8:(s + 1) * 8]]
        for r in cb_rows
        for s in range(8)
    }
    return pq_encode(
        emb.filter(F.col("vec_id") < 200), codebook, m=8, sub_dim=8
    )


@register(
    "embedding_pq_adc_topk",
    eager_build=True,
    oracle="""
    WITH cb AS (
      SELECT vec_id AS code, embedding FROM embeddings WHERE vec_id < 4
    ), v AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
    ), sub AS (
      SELECT v.vec_id, s.s, cb.code,
             list_reduce(list_transform(range(1, 9), j ->
               (CAST(v.embedding[s.s * 8 + j] AS DOUBLE)
                - CAST(cb.embedding[s.s * 8 + j] AS DOUBLE))
               * (CAST(v.embedding[s.s * 8 + j] AS DOUBLE)
                  - CAST(cb.embedding[s.s * 8 + j] AS DOUBLE))),
               (a, b) -> a + b) AS d2
      FROM v
      CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
      CROSS JOIN cb
    ), best AS (
      SELECT vec_id, s, code,
             ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                ORDER BY d2, code) AS rk
      FROM sub
    ), q AS (
      SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5
    ), contrib AS (
      SELECT q.query_id, b.vec_id, b.s,
             CAST(floor(list_reduce(list_transform(range(1, 9), j ->
               (CAST(q.embedding[b.s * 8 + j] AS DOUBLE)
                - CAST(cb.embedding[b.s * 8 + j] AS DOUBLE))
               * (CAST(q.embedding[b.s * 8 + j] AS DOUBLE)
                  - CAST(cb.embedding[b.s * 8 + j] AS DOUBLE))),
               (a, b) -> a + b) * 1e9 + 0.5) AS BIGINT) AS d2q_nano
      FROM best b
      JOIN cb ON cb.code = b.code
      CROSS JOIN q
      WHERE b.rk = 1 AND b.vec_id <> q.query_id
    ), adc AS (
      SELECT query_id, vec_id AS neighbor_id,
             CAST(SUM(d2q_nano) AS BIGINT) AS adc_nano
      FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_nano, rank FROM (
      SELECT query_id, neighbor_id, adc_nano,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY adc_nano, neighbor_id) AS BIGINT) AS rank
      FROM adc
    ) WHERE rank <= 5
    """,
)
def embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric distance computation over PQ codes -- how compressed
    ANN search actually runs at 100 TB: per query, the m x k table of
    query-subvector-to-codebook distances is precomputed ONCE on the
    driver (m*k*sub_dim flops -- trivial), and each corpus vector's
    approximate distance is just m integer table lookups summed, no
    vector math per candidate at all. Distances are nano-scaled to
    integers (floor(d2*1e9+0.5), the repo's standard trick) so the
    per-vector sum is order-independent and the oracle exact. The corpus
    side is the narrow PQ code table; the only shuffle is the O(vectors)
    per-query sum."""
    from ..operators.similarity import pq_encode

    emb = t(spark, sf_dir, "embeddings")
    cb_rows = emb.filter(F.col("vec_id") < 4).select("vec_id", "embedding").collect()
    codebook = {
        (s, int(r["vec_id"])): [float(x) for x in r["embedding"][s * 8:(s + 1) * 8]]
        for r in cb_rows
        for s in range(8)
    }
    q_rows = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect()

    def d2_py(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            d = float(x) - float(y)
            acc += d * d
        return acc

    import math

    codes = pq_encode(emb.filter(F.col("vec_id") < 200), codebook, m=8, sub_dim=8)
    # One flat LUT for the whole query batch: slot q occupies entries
    # [q*32, (q+1)*32) laid out subspace-major (8 subspaces x 4 codes).
    # One broadcast join fans each code row out to the Q queries --
    # one corpus pass instead of Q unioned scans.
    flat_lut: list[int] = []
    slot_tuples: list[tuple[int, int]] = []
    for qpos, qr in enumerate(sorted(q_rows, key=lambda r: int(r["vec_id"]))):
        qid = int(qr["vec_id"])
        qvec = [float(x) for x in qr["embedding"]]
        flat_lut.extend(
            math.floor(
                d2_py(qvec[s * 8:(s + 1) * 8], codebook[(s, c)]) * 1e9 + 0.5
            )
            for s in range(8)
            for c in range(4)
        )
        slot_tuples.append((qpos, qid))
    slots = spark.createDataFrame(slot_tuples, "qpos int, query_id bigint")
    contrib = (
        codes.crossJoin(F.broadcast(slots))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.element_at(
                F.lit(flat_lut),
                (
                    F.col("qpos") * 32 + F.col("subspace") * 4 + F.col("code") + 1
                ).cast("int"),
            ).alias("d2q_nano"),
        )
    )
    adc = contrib.groupBy("query_id", "neighbor_id").agg(
        F.sum("d2q_nano").cast("bigint").alias("adc_nano")
    )
    w = Window.partitionBy("query_id").orderBy("adc_nano", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "adc_nano", "rank")
    )


def _ivfpq_oracle() -> str:
    cos_qc = _cos_sql("e.embedding", "c.cvec")
    d2_sub = """list_reduce(list_transform(range(1, 9), j ->
               (CAST(v.embedding[s.s * 8 + j] AS DOUBLE)
                - CAST(cb.embedding[s.s * 8 + j] AS DOUBLE))
               * (CAST(v.embedding[s.s * 8 + j] AS DOUBLE)
                  - CAST(cb.embedding[s.s * 8 + j] AS DOUBLE))),
               (a, b) -> a + b)"""
    d2_q = """list_reduce(list_transform(range(1, 9), j ->
               (CAST(q.embedding[b.s * 8 + j] AS DOUBLE)
                - CAST(cb.embedding[b.s * 8 + j] AS DOUBLE))
               * (CAST(q.embedding[b.s * 8 + j] AS DOUBLE)
                  - CAST(cb.embedding[b.s * 8 + j] AS DOUBLE))),
               (a, b) -> a + b)"""
    return f"""
    WITH cents AS (
      SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ), cb AS (
      SELECT vec_id AS code, embedding FROM embeddings WHERE vec_id < 4
    ), v AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
    ), ca AS (
      SELECT neighbor_id, cell FROM (
        SELECT e.vec_id AS neighbor_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos_qc} DESC, c.cell) AS rn
        FROM v e CROSS JOIN cents c
      ) WHERE rn = 1
    ), qa AS (
      SELECT query_id, cell FROM (
        SELECT e.vec_id AS query_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos_qc} DESC, c.cell) AS rn
        FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 5
      ) WHERE rn <= 2
    ), pairs AS (
      SELECT DISTINCT qa.query_id, ca.neighbor_id
      FROM qa JOIN ca ON ca.cell = qa.cell AND ca.neighbor_id <> qa.query_id
    ), sub AS (
      SELECT v.vec_id, s.s, cb.code, {d2_sub} AS d2
      FROM v
      CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
      CROSS JOIN cb
    ), best AS (
      SELECT vec_id, s, code,
             ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                ORDER BY d2, code) AS rk
      FROM sub
    ), q AS (
      SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5
    ), contrib AS (
      SELECT p.query_id, b.vec_id, b.s,
             CAST(floor({d2_q} * 1e9 + 0.5) AS BIGINT) AS d2q_nano
      FROM pairs p
      JOIN best b ON b.vec_id = p.neighbor_id AND b.rk = 1
      JOIN cb ON cb.code = b.code
      JOIN q ON q.query_id = p.query_id
    ), adc AS (
      SELECT query_id, vec_id AS neighbor_id,
             CAST(SUM(d2q_nano) AS BIGINT) AS adc_nano
      FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_nano, rank FROM (
      SELECT query_id, neighbor_id, adc_nano,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY adc_nano, neighbor_id) AS BIGINT) AS rank
      FROM adc
    ) WHERE rank <= 5
    """


@register("embedding_ivfpq_topk", eager_build=True, oracle=_ivfpq_oracle())
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the production compressed-ANN layout (coarse inverted cells
    + product-quantized codes), composed from the repo's two building
    blocks. Corpus vectors are assigned to their nearest cell (narrow --
    centroids are literals) and PQ-encoded (narrow, ~500x compression);
    a query probes its n_probe=2 nearest cells and runs ADC table-lookup
    distances ONLY over the probed cells' code lists -- at 100 TB the
    cell equi-join (a semi-join on cell membership here) cuts the
    scanned candidate set by ~n_cells/n_probe before any distance math,
    and the distance math itself is integer lookups over bytes, not
    float folds over 4 KB vectors. Nano-scaled integer distances keep
    the sum order-independent and the oracle exact; selection is
    deterministic (ties on neighbor_id).

    Plan shape: ONE pass over the corpus. Cell assignment and PQ
    encoding happen in the same narrow chain (``pq_encode(keep=
    ("cell",))`` -- inverted-list layout), the per-query ADC lookup
    tables are concatenated into a single flat literal indexed by
    (query slot, subspace, code), and the (query, cell) probe list is
    a broadcast literal relation -- so the whole query batch is
    answered by one broadcast hash join on cell plus one aggregation,
    instead of a per-query union of corpus scans. At 100 TB this is
    the difference between Q corpus passes and one, and the broadcast
    side is O(queries x n_probe), never corpus-sized."""
    from ..operators.similarity import assign_cells, pq_encode

    emb = t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    corpus = emb.filter(F.col("vec_id") < 200)

    cb_rows = emb.filter(F.col("vec_id") < 4).select("vec_id", "embedding").collect()
    codebook = {
        (s, int(r["vec_id"])): [float(x) for x in r["embedding"][s * 8:(s + 1) * 8]]
        for r in cb_rows
        for s in range(8)
    }
    # Inverted-list layout in one narrow pass: assign the cell, then
    # PQ-encode with the cell carried through.
    assigned = assign_cells(corpus, cents, n_probe=1).select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding"), "cell"
    )
    codes = pq_encode(assigned, codebook, m=8, sub_dim=8, keep=("cell",))

    qdf = emb.filter(F.col("vec_id") < 5)
    q_rows = qdf.select("vec_id", "embedding").collect()
    probe_rows = assign_cells(qdf, cents, n_probe=2).select("id", "cell").collect()
    probes_by_q: dict[int, list[int]] = {}
    for r in probe_rows:
        probes_by_q.setdefault(int(r["id"]), []).append(int(r["cell"]))

    def d2_py(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            d = float(x) - float(y)
            acc += d * d
        return acc

    import math

    # One flat LUT for the whole query batch: slot q occupies entries
    # [q*32, (q+1)*32) laid out subspace-major (8 subspaces x 4 codes).
    flat_lut: list[int] = []
    probe_tuples: list[tuple[int, int, int]] = []
    for qpos, qr in enumerate(sorted(q_rows, key=lambda r: int(r["vec_id"]))):
        qid = int(qr["vec_id"])
        qvec = [float(x) for x in qr["embedding"]]
        flat_lut.extend(
            math.floor(
                d2_py(qvec[s * 8:(s + 1) * 8], codebook[(s, c)]) * 1e9 + 0.5
            )
            for s in range(8)
            for c in range(4)
        )
        probe_tuples.extend((qpos, qid, cell) for cell in probes_by_q[qid])
    probe_df = spark.createDataFrame(
        probe_tuples, "qpos int, query_id bigint, cell bigint"
    )

    # Each corpus vector lives in exactly one cell (n_probe=1 above), so
    # the probe join yields each (query, neighbor) pair at most once.
    contrib = (
        codes.join(F.broadcast(probe_df), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.element_at(
                F.lit(flat_lut),
                (
                    F.col("qpos") * 32 + F.col("subspace") * 4 + F.col("code") + 1
                ).cast("int"),
            ).alias("d2q_nano"),
        )
    )
    adc = contrib.groupBy("query_id", "neighbor_id").agg(
        F.sum("d2q_nano").cast("bigint").alias("adc_nano")
    )
    w = Window.partitionBy("query_id").orderBy("adc_nano", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "adc_nano", "rank")
    )


@register(
    "quality_filter_lang_percentile",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, lang, {_TOKS} AS toks FROM documents
    ), sc AS (
      SELECT doc_id, lang,
             CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS score
      FROM tk
    ), r AS (
      SELECT doc_id, lang, score,
             percent_rank() OVER (PARTITION BY lang ORDER BY score) AS pr
      FROM sc
    )
    SELECT doc_id, lang, score, pr FROM r WHERE pr >= 0.25
    """,
)
def quality_filter_lang_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language percentile quality gate -- the corpus-curation shape
    where thresholds must be RELATIVE per language (an absolute
    diversity cutoff tuned on English would gut low-resource languages):
    keep documents at or above their language's 25th percentile of
    distinct-token ratio. percent_rank is (rank-1)/(n-1) -- exact
    rational arithmetic, engine-identical, ties share a rank -- so the
    filter is deterministic and fully oracle-checkable. One shuffle
    (hash by lang) + an in-partition sort. At 100 TB swap the exact
    window for a per-lang approx-quantile threshold broadcast back (the
    winsorized_mean exact/approx twin discipline); the filter semantics
    and this oracle stay the test fixture."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    staged = d.select(
        "doc_id",
        "lang",
        F.try_divide(
            F.size(F.array_distinct(toks)).cast("double"),
            F.size(toks).cast("double"),
        ).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy("score")
    return (
        staged.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.25)
        .select("doc_id", "lang", "score", "pr")
    )


_CURATION_FILLER = ("row", "value", "table", "data")


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, source, text,
             string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, source, text,
             len(toks) AS n_tokens,
             CAST(len(list_filter(toks,
                  t -> t IN {_CURATION_FILLER!r})) AS DOUBLE)
               / len(toks) AS filler_ratio
      FROM toks
    ),
    kept AS (
      SELECT * FROM scored
      WHERE lang IN ('en', 'de', 'fr', 'es')
        AND n_tokens >= 30
        AND filler_ratio <= 0.35
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(CAST(n_tokens AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*) AS avg_tokens,
           CAST(SUM(CAST(filler_ratio AS DECIMAL(38,12))) AS DOUBLE)
             / COUNT(*) AS avg_filler_ratio
    FROM deduped GROUP BY lang
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus curation shape, composed from the
    catalog's individual operators in ONE lineage: language filter ->
    token/quality scoring (JVM-side array functions, no Python) -> exact
    content dedup (md5 keep-first) -> per-language survivor stats. At
    100 TB each stage stays narrow until the dedup shuffle on the content
    hash; the final stats are O(langs). Near-dup removal (MinHash) chains
    after the exact pass in production -- checked separately
    (minhash_lsh_pairs, dedup_cluster_survivors)."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(toks).alias("n_tokens"),
        (
            F.size(F.filter(toks, lambda x: x.isin(*_CURATION_FILLER))).cast("double")
            / F.size(toks)
        ).alias("filler_ratio"),
    )
    kept = scored.filter(
        F.col("lang").isin("en", "de", "fr", "es")
        & (F.col("n_tokens") >= 30)
        & (F.col("filler_ratio") <= 0.35)
    )
    deduped = (
        kept.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        (
            F.sum(F.col("n_tokens").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_tokens"),
        (
            F.sum(F.col("filler_ratio").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_filler_ratio"),
    )


# ------------------------------------------- corpus splitting & packing


@register(
    "train_val_test_split",
    oracle="""
    WITH b AS (
      SELECT lang, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
               % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY 1, 2
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 corpus split by content-independent id hash
    (md5 -> bucket 0..99): every engine, every run, every shard assigns
    the same doc to the same split -- no RNG, no global sort, no driver
    state. The split is a narrow per-row expression, so it composes with
    any downstream op without a shuffle; summarized per (split, lang)."""
    d = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "corpus_shard_shuffle",
    oracle="""
    SELECT doc_id, shard, pos FROM (
      SELECT doc_id,
             ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
               % 8 AS shard,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 8
               ORDER BY md5('order:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS pos
      FROM documents
    )
    """,
)
def corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: every doc gets
    a shard (salted-md5 bucket, 8 shards) and a reproducible position
    within it (ordered by a SECOND independent salted hash, doc_id
    tie-break) -- the shuffled-read layout trainers want, with no RNG, no
    global sort, no driver state: any engine or rerun assigns identical
    (shard, pos). One shuffle total (the per-shard window sort), and the
    shard IS the write unit at 100 TB -- partitionBy(shard) +
    sortWithinPartitions(order_key) writes the same layout with the sort
    folded into the shuffle; changing the salt reshuffles every epoch
    reproducibly."""
    d = t(spark, sf_dir, "documents")
    doc_str = F.col("doc_id").cast("string")
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit("shard:"), doc_str)), 1, 6), 16, 10)
        .cast("long") % 8
    )
    order_key = F.md5(F.concat(F.lit("order:"), doc_str))
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("order_key", "doc_id")
    return (
        d.select("doc_id", shard.alias("shard"), order_key.alias("order_key"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


@register(
    "sequence_packing_chunks",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT lang,
           CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT)
             AS chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
    FROM c GROUP BY 1, 2
    """,
)
def sequence_packing_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining batches (concat-and-chunk): docs
    are concatenated in deterministic id order per language and cut every
    2048 tokens; a doc's chunk is where its first token lands. One window
    cumsum per language partition -- a single shuffle on lang, O(docs)
    state, no RNG. (First-fit bin packing needs sequential state; the
    concat-and-chunk form is what large-scale trainers actually use, and
    it is exactly expressible as a prefix sum.)"""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    chunk = F.floor((cum - F.col("n_tokens")).cast("double") / 2048).cast("bigint")
    return (
        d.select("lang", "n_tokens", chunk.alias("chunk_id"))
        .groupBy("lang", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("chunk_tokens"),
        )
    )


# ------------------------------------------- quality & contamination


@register(
    "doc_repetition_ratio",
    oracle="""
    WITH g AS (
      SELECT doc_id, lang,
             CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 3
                  THEN list_transform(
                         range(1, len(regexp_split_to_array(trim(text), '\\s+')) - 1),
                         i -> concat_ws(' ',
                                regexp_split_to_array(trim(text), '\\s+')[i],
                                regexp_split_to_array(trim(text), '\\s+')[i + 1],
                                regexp_split_to_array(trim(text), '\\s+')[i + 2]))
                  ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           CASE WHEN len(grams) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / len(grams) END AS repetition_ratio,
           CASE WHEN len(grams) = 0 THEN FALSE
                ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / len(grams) > 0.2 END AS flagged
    FROM g
    """,
)
def doc_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: the fraction of word 3-gram
    occurrences that are repeats of an earlier gram in the same document.
    Boilerplate and low-quality spam score high; docs over 0.2 are
    flagged. Entirely narrow (per-row array expressions, no shuffle, no
    UDF) -- at 100 TB this runs at scan speed. (Locally the one small
    parquet file is a single input split, so rebalance_for_cpu spreads
    the per-row work across cores; at scale file count provides the
    parallelism and the rebalance is a no-op round-robin.)"""
    from ..operators.text import word_ngrams

    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    toks = tokens("text")
    grams = word_ngrams(toks, n=3, distinct=False)
    n_grams = F.size(grams).cast("bigint")
    n_distinct = F.size(F.array_distinct(grams)).cast("bigint")
    ratio = F.when(n_grams == 0, F.lit(0.0)).otherwise(
        1.0 - n_distinct.cast("double") / n_grams
    )
    return d.select(
        "doc_id",
        "lang",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        ratio.alias("repetition_ratio"),
        F.when(n_grams == 0, F.lit(False))
        .otherwise(ratio > 0.2)
        .alias("flagged"),
    )


@register(
    "token_entropy",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), cnt AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             list_sort(list_transform(list_distinct(toks),
               t -> CAST(len(list_filter(toks, x -> x = t)) AS DOUBLE))) AS counts
      FROM tk
    )
    SELECT doc_id, n_tokens, n_distinct,
           round(log2(CAST(n_tokens AS DOUBLE))
             - list_reduce(list_transform(counts, c -> c * log2(c)), (a, b) -> a + b)
               / CAST(n_tokens AS DOUBLE), 6) AS entropy_bits,
           CASE WHEN n_distinct <= 1 THEN 0.0
                ELSE round((log2(CAST(n_tokens AS DOUBLE))
                  - list_reduce(list_transform(counts, c -> c * log2(c)), (a, b) -> a + b)
                    / CAST(n_tokens AS DOUBLE))
                  / log2(CAST(n_distinct AS DOUBLE)), 6) END AS norm_entropy
    FROM cnt
    """,
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits) and
    its normalized form (entropy / log2 distinct types) -- the cheap
    gibberish / repetition signal: natural text sits high, copy-paste
    spam and key-mashing sit low. Fully NARROW: counts come from
    within-row HOFs (O(types x tokens) per row, no shuffle, no UDF), so
    at 100 TB this runs at scan speed.

    Determinism across engines: the fold runs over the SORTED count
    array (entropy does not care which token had which count, and
    Spark's array_distinct is first-occurrence-ordered while DuckDB's
    list_distinct is not); results round to 6 decimals, so a 1-ulp libm
    log2 difference flips the rounded value only if the true value lies
    within ~1 ulp of a half-micro boundary -- improbable, not
    impossible; a flip would surface as an oracle diff of exactly 1e-6
    (the psi/chisq probabilistic discipline)."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    # stage the token array once -- it is referenced four times below,
    # and Catalyst does not CSE through HOF lambdas (house pattern, see
    # minhash_signatures / with_l2_normalized)
    staged = d.withColumn("__toks", tokens("text"))
    toks = F.col("__toks")
    base = staged.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.array_sort(
            F.transform(
                F.array_distinct(toks),
                lambda t: F.size(F.filter(toks, lambda x: x == t)).cast("double"),
            )
        ).alias("counts"),
    )
    clogc = F.aggregate(
        F.transform("counts", lambda c: c * F.log2(c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    ent = F.log2(F.col("n_tokens").cast("double")) - clogc / F.col("n_tokens").cast(
        "double"
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(ent, 6).alias("entropy_bits"),
        F.when(F.col("n_distinct") <= 1, F.lit(0.0))
        .otherwise(F.round(ent / F.log2(F.col("n_distinct").cast("double")), 6))
        .alias("norm_entropy"),
    )


@register(
    "benchmark_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(tk) >= 5
                    THEN list_transform(range(1, len(tk) - 3),
                           i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2],
                                          tk[i + 3], tk[i + 4]))
                    ELSE CAST([] AS VARCHAR[]) END)) AS gram
      FROM toks
    ), bench AS (
      SELECT DISTINCT gram FROM g WHERE doc_id < 20
    )
    SELECT g.doc_id, COUNT(*) AS n_shared_grams
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id >= 20
    GROUP BY g.doc_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: count distinct word 5-grams each
    corpus doc shares with a held-out benchmark set (here docs 0..19
    stand in for the eval suite). The benchmark gram set is dim-sized by
    construction -- broadcast it and the scan stays one narrow pass over
    the corpus; at real scale with a large benchmark, the same plan runs
    as a bucket equi-join on the gram hash. A doc with many shared grams
    is leaked eval data and must be quarantined before training."""
    from ..operators.text import word_ngrams

    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id",
        F.explode(word_ngrams(tokens("text"), n=5, distinct=True)).alias("gram"),
    )
    bench = grams.filter(F.col("doc_id") < 20).select("gram").distinct()
    return (
        grams.filter(F.col("doc_id") >= 20)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


@register(
    "dedup_semantic_clusters",
    eager_build=True,
    oracle=f"""
    WITH base AS (
      SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), aug AS (
      SELECT id, vec FROM base
      UNION ALL
      SELECT id + 100000,
             list_transform(vec, x -> x * CAST(1.05 AS DOUBLE))
      FROM base WHERE id < 30
    ), v AS (
      SELECT id, vec,
             (CASE WHEN vec[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN vec[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN vec[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN vec[4] > 0 THEN 8 ELSE 0 END) AS bucket
      FROM aug
    ), pairs AS (
      SELECT id_a, id_b FROM (
        SELECT a.id AS id_a, b.id AS id_b,
               {_cos_sql('a.vec', 'b.vec')} AS cos_sim
        FROM v a JOIN v b ON a.bucket = b.bucket AND a.id < b.id
      ) WHERE cos_sim >= 0.92
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
      ) SELECT * FROM r
    ), labels AS (
      SELECT src AS id, least(src, MIN(dst)) AS label FROM reach GROUP BY src
    )
    SELECT label AS cluster_label, COUNT(*) AS n_members
    FROM labels GROUP BY label
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup, SemDeDup-style: sign-LSH buckets
    restrict the pair space, exact cosine >= 0.92 confirms near-duplicates,
    connected components collapse duplicate groups to one surviving
    representative (min id). The oracle restates the fixpoint as a
    recursive transitive closure. Same shuffle discipline as the MinHash
    path: every pair-generating step is a bucket equi-join, never
    all-pairs; components converge in O(log diameter) label rounds.

    The synthetic embeddings are random (near-orthogonal -- no natural
    near-dups), so duplicates are synthesized in-query: scaled copies of
    the first 30 vectors (positive scaling preserves both the cosine and
    the sign buckets), making the cluster path non-vacuous in any engine."""
    from ..operators.dedup import cluster_labels

    base = t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    dup = base.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.05)).alias("embedding"),
    )
    pairs = neardup_pairs_lsh(
        base.unionByName(dup), bits=4, min_cosine=0.92
    ).select("id_a", "id_b")
    labels = cluster_labels(pairs)
    return labels.groupBy(F.col("label").alias("cluster_label")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@register(
    "corpus_mixing_sample",
    oracle="""
    WITH d AS (
      SELECT source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
               % 100 AS bucket,
             CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 100
                  WHEN source IN ('src5','src6','src7','src8','src9') THEN 50
                  ELSE 25 END AS keep_pct,
             CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 2
                  ELSE 1 END AS epochs
      FROM documents
    )
    SELECT source, CAST(MAX(keep_pct) AS INT) AS keep_pct,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN bucket < keep_pct THEN 1 END) AS n_kept,
           CAST(SUM(CASE WHEN bucket < keep_pct THEN epochs ELSE 0 END)
                AS BIGINT) AS n_weighted
    FROM d GROUP BY source
    """,
)
def corpus_mixing_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing for pretraining: per-source sampling rates (keep 100%
    of the high-quality tier, 50% / 25% of the rest) plus epoch
    upweighting (tier-1 sources seen twice per pass). Selection is the
    same content-independent id hash as train_val_test_split, so the mix
    is reproducible shard-by-shard with no RNG and composes with the
    split without correlation (different hash bytes would decorrelate
    further at scale). Narrow per-row expressions + one O(sources)
    aggregate."""
    d = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    tier1 = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    tier2 = F.col("source").isin("src5", "src6", "src7", "src8", "src9")
    keep_pct = F.when(tier1, 100).when(tier2, 50).otherwise(25)
    epochs = F.when(tier1, 2).otherwise(1)
    kept = bucket < keep_pct
    return (
        d.select(
            "source",
            keep_pct.alias("keep_pct"),
            kept.alias("kept"),
            epochs.alias("epochs"),
        )
        .groupBy("source")
        .agg(
            F.max("keep_pct").cast("int").alias("keep_pct"),
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("epochs")).otherwise(0))
            .cast("bigint")
            .alias("n_weighted"),
        )
    )


# ------------------------------------------------- LM-based quality scoring


@register(
    "class_balance_weights",
    oracle="""
    WITH cc AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
    k AS (SELECT COUNT(*) AS n_classes, CAST(SUM(n) AS BIGINT) AS n_total FROM cc)
    SELECT CAST(label AS INT) AS label, CAST(n AS BIGINT) AS n,
           CAST(n_total AS DOUBLE)
             / (CAST(n_classes AS DOUBLE) * CAST(n AS DOUBLE)) AS weight
    FROM cc CROSS JOIN k
    """,
)
def class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights w_c = N / (K * n_c) from the
    labeled embeddings table -- the standard imbalance correction fed to
    a weighted sampler or loss. One O(classes) aggregate plus a one-row
    broadcast; arithmetic is integer counts pushed through
    correctly-rounded double ops (DETERMINISM.md rule 19), so no
    rounding is needed."""
    cc = t(spark, sf_dir, "embeddings").groupBy("label").agg(
        F.count(F.lit(1)).alias("n")
    )
    k = cc.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return cc.crossJoin(F.broadcast(k)).select(
        F.col("label").cast("int").alias("label"),
        F.col("n").cast("bigint").alias("n"),
        (
            F.col("n_total").cast("double")
            / (F.col("n_classes").cast("double") * F.col("n").cast("double"))
        ).alias("weight"),
    )


@register(
    "bigram_logprob_quality",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               j -> {{'w1': toks[j], 'gram': toks[j] || ' ' || toks[j+1]}})) AS s
      FROM tk WHERE len(toks) >= 2
    ),
    inst AS (SELECT doc_id, s.w1 AS w1, s.gram AS gram FROM bg),
    cbig AS (SELECT gram, COUNT(*) AS c_big FROM inst GROUP BY gram),
    cctx AS (SELECT w1, COUNT(*) AS c_ctx FROM inst GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT unnest.t) AS vocab
          FROM (SELECT unnest(toks) AS t FROM tk) unnest)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(floor(ln(
                 CAST(c_big + 1 AS DOUBLE) / CAST(c_ctx + vocab AS DOUBLE)
               ) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*)
             AS avg_logprob
    FROM inst
    JOIN cbig USING (gram)
    JOIN cctx USING (w1)
    CROSS JOIN v
    GROUP BY doc_id
    """,
)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under an add-one-smoothed
    corpus bigram LM -- the perplexity-proxy quality filter (a la
    CCNet/Gopher curation): documents whose token transitions are
    improbable under the corpus model score low and get culled or
    down-weighted before training.

    Scale shape: bigram instances explode narrowly from each doc; the LM
    tables (bigram counts, context counts) are two groupBys with
    map-side partial aggregation, shuffle O(distinct grams); scoring
    joins instances to both count tables on the gram/context key (hash
    joins -- broadcastable when the vocab is bounded, shuffle joins on
    the gram key otherwise) and re-aggregates per doc_id. Cross-engine
    exactness: each ln() is snapped to nano-units (floor(x*1e9+0.5),
    rules 7+18 -- absorbing 1-ulp libm skew) and summed as exact BIGINTs,
    so the per-doc sum is order-insensitive; the final two divisions are
    correctly-rounded double ops (rule 19)."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tk = d.select("doc_id", tokens("text").alias("toks"))
    bigram_structs = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "j -> struct(element_at(toks, j) AS w1, "
        "concat(element_at(toks, j), ' ', element_at(toks, j + 1)) AS gram))"
    )
    inst = (
        tk.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigram_structs).alias("s"))
        .select("doc_id", F.col("s.w1").alias("w1"), F.col("s.gram").alias("gram"))
    )
    cbig = inst.groupBy("gram").agg(F.count(F.lit(1)).alias("c_big"))
    cctx = inst.groupBy("w1").agg(F.count(F.lit(1)).alias("c_ctx"))
    v = tk.select(F.explode("toks").alias("tkn")).agg(
        F.countDistinct("tkn").alias("vocab")
    )
    nano = F.floor(
        F.log(
            (F.col("c_big") + 1).cast("double")
            / (F.col("c_ctx") + F.col("vocab")).cast("double")
        )
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        inst.join(cbig, "gram")
        .join(cctx, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (
                F.sum(nano).cast("double") / F.lit(1e9) / F.count(F.lit(1))
            ).alias("avg_logprob"),
        )
    )

@register(
    "embedding_sim_histogram",
    oracle=f"""
    WITH v AS (
      SELECT vec_id AS id, embedding AS vec,
             {_dot_sql('embedding', 'embedding')} AS d2
      FROM embeddings
      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':simh'), 1, 6))::BIGINT
              % 5 = 0
    ),
    vg AS (SELECT * FROM v WHERE d2 > 0),
    pairs AS (
      SELECT {_dot_sql('a.vec', 'b.vec')} / sqrt(a.d2 * b.d2) AS cos_sim
      FROM vg a JOIN vg b ON a.id < b.id
    )
    SELECT CAST(least(floor((cos_sim + CAST(1 AS DOUBLE))
                            * CAST(10 AS DOUBLE)), 19) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1
    """,
)
def embedding_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram over a deterministic 20% sample of the
    embedding table (20 bins on [-1, 1]) -- the collapse/anisotropy
    diagnostic run before using an embedding space for dedup or
    retrieval: a healthy space spreads mass across bins; a collapsed one
    piles into the top bins and near-dup thresholds stop meaning
    anything.

    Scale shape: the md5-bucket sample (reproducible, content-free --
    the train_val_test_split idiom) bounds the quadratic BEFORE any pair
    forms; squared self-norms are staged once per sampled row so each
    pair costs ONE fold; the sample self-join is the only quadratic and
    its size is set by the sample rate, not the corpus. Exactness: dot
    folds are left-to-right (rule 6; Spark's 0.0-seeded aggregate equals
    list_reduce's first-element seeding because x + 0.0 is exact), and
    sqrt/divide are correctly rounded (rule 19), so binning at
    floor((cos+1)*10) is bit-stable across engines with no rounding
    step. Zero vectors are excluded (d2 > 0) on both sides rather than
    relying on engine-specific divide-by-zero behavior."""
    from ..operators.similarity import dot, norm2

    emb = t(spark, sf_dir, "embeddings")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":simh"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    v = (
        emb.filter(bucket == 0)
        .select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("vec"),
            norm2(F.col("embedding")).alias("d2"),
        )
        .filter(F.col("d2") > 0)
    )
    a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("d2").alias("d2_a"))
    b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("d2").alias("d2_b"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b")).select(
        (
            dot(F.col("vec_a"), F.col("vec_b"))
            / F.sqrt(F.col("d2_a") * F.col("d2_b"))
        ).alias("cos_sim")
    )
    bin_ = F.least(
        F.floor((F.col("cos_sim") + F.lit(1.0)) * F.lit(10.0)), F.lit(19)
    ).cast("bigint")
    return pairs.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


_KMV_K = 64
_KMV_SPACE = float(2**48)  # hash space: 12 hex chars


@register(
    "kmv_intersection_estimate",
    oracle=f"""
    WITH ha AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':kmv'),
                       1, 12))::BIGINT AS h
      FROM events WHERE event_type = 'click'
    ),
    hb AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':kmv'),
                       1, 12))::BIGINT AS h
      FROM events WHERE event_type = 'purchase'
    ),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
    ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
           ORDER BY h LIMIT {_KMV_K}),
    tau AS (SELECT MAX(h) AS tau, COUNT(*) AS ku_n FROM ku),
    rho AS (
      SELECT COUNT(*) AS rho FROM ka JOIN kb USING (h) CROSS JOIN tau
      WHERE h <= tau.tau
    ),
    exact AS (
      SELECT COUNT(*) AS n_exact FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    )
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST(rho AS BIGINT) AS rho,
           CAST((CAST(ku_n AS DOUBLE) - CAST(1 AS DOUBLE))
                * CAST({_KMV_SPACE!r} AS DOUBLE)
                / CAST(tau AS DOUBLE) AS DOUBLE) AS est_union,
           CAST(rho AS DOUBLE) / CAST(ku_n AS DOUBLE)
             * ((CAST(ku_n AS DOUBLE) - CAST(1 AS DOUBLE))
                * CAST({_KMV_SPACE!r} AS DOUBLE) / CAST(tau AS DOUBLE))
             AS est_inter,
           CAST(n_exact AS BIGINT) AS n_exact
    FROM tau CROSS JOIN rho CROSS JOIN exact
    """,
)
def kmv_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketch intersection: estimated distinct users in
    click AND purchase audiences from two k=64 sketches -- the set
    OPERATION sketches HLL cannot do (HLL unions; only KMV/theta-style
    sketches intersect), and the shape behind audience-overlap and
    cross-corpus contamination estimates at 100 TB: each side compresses
    to k 48-bit hashes (TakeOrderedAndProject partial top-k -- tasks
    ship only their local k minima), the combine works on 2k rows.

    Every step is deterministic (md5 hashes, integer order statistics,
    then a fixed sequence of correctly-rounded double ops -- rule 19),
    so the oracle reproduces the estimate EXACTLY, no tolerance band
    needed; n_exact rides along as the accuracy reference."""
    ev = t(spark, sf_dir, "events")

    def hashes(etype: str) -> DataFrame:
        # distinct() AFTER hashing (mirroring the oracle's
        # SELECT DISTINCT ... AS h): the sketch is over the hash SET, so
        # an md5-prefix collision between two user_ids must collapse to
        # one h in both engines, or the k-minima diverge.
        return (
            ev.filter(F.col("event_type") == etype)
            .select("user_id")
            .distinct()
            .select(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":kmv"))),
                        1,
                        12,
                    ),
                    16,
                    10,
                )
                .cast("bigint")
                .alias("h")
            )
            .distinct()
        )

    ka = hashes("click").orderBy("h").limit(_KMV_K)
    kb = hashes("purchase").orderBy("h").limit(_KMV_K)
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(_KMV_K)
    tau = ku.agg(F.max("h").alias("tau"), F.count(F.lit(1)).alias("ku_n"))
    rho = (
        ka.join(kb, "h")
        .crossJoin(F.broadcast(tau))
        .filter(F.col("h") <= F.col("tau"))
        .agg(F.count(F.lit(1)).alias("rho"))
    )
    exact = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
        .intersect(
            ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    est_union = (
        (F.col("ku_n").cast("double") - F.lit(1.0))
        * F.lit(_KMV_SPACE)
        / F.col("tau").cast("double")
    )
    return (
        tau.crossJoin(F.broadcast(rho))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(_KMV_K).cast("bigint").alias("k"),
            F.col("rho").cast("bigint").alias("rho"),
            est_union.alias("est_union"),
            (F.col("rho").cast("double") / F.col("ku_n").cast("double") * est_union).alias(
                "est_inter"
            ),
            "n_exact",
        )
    )


_CHUNK_LEN = 32
_CHUNK_STRIDE = 24


@register(
    "doc_chunk_overlap",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             unnest(range(0, greatest(
               (len(toks) - {_CHUNK_LEN} + {_CHUNK_STRIDE} - 1)
                 // {_CHUNK_STRIDE}, 0) + 1)) AS chunk_ix,
             toks
      FROM tk WHERE len(toks) >= 1
    )
    SELECT doc_id, CAST(chunk_ix AS BIGINT) AS chunk_ix,
           CAST(len(toks[chunk_ix * {_CHUNK_STRIDE} + 1 :
                      chunk_ix * {_CHUNK_STRIDE} + {_CHUNK_LEN}]) AS BIGINT)
             AS n_tokens,
           md5(list_aggregate(toks[chunk_ix * {_CHUNK_STRIDE} + 1 :
                      chunk_ix * {_CHUNK_STRIDE} + {_CHUNK_LEN}],
                      'string_agg', ' ')) AS chunk_md5
    FROM chunks
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunking: each document split into token
    windows of 32 with stride 24 (8-token overlap), emitting
    (doc_id, chunk_ix, n_tokens, md5 of the joined chunk) -- the
    retrieval twin of sequence_packing_chunks (which concatenates for
    TRAINING; this windows per-doc for INDEXING, where overlap keeps
    boundary sentences findable).

    Fully narrow at any scale: chunk indices come from an in-row
    sequence, slices are in-array, and nothing shuffles -- output size is
    the only cost, set by len/stride. The md5 content digest makes the
    row self-verifying across engines without shipping chunk text."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tk = d.select("doc_id", tokens("text").alias("toks")).filter(F.size("toks") >= 1)
    n_chunks = F.greatest(
        F.ceil(
            (F.size("toks") - F.lit(_CHUNK_LEN)).cast("double") / F.lit(_CHUNK_STRIDE)
        ).cast("int"),
        F.lit(0),
    ) + F.lit(1)
    chunks = tk.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_ix"),
    )
    sl = F.slice(
        F.col("toks"), F.col("chunk_ix") * _CHUNK_STRIDE + 1, _CHUNK_LEN
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_ix").cast("bigint").alias("chunk_ix"),
        F.size(sl).cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(sl, " ")).alias("chunk_md5"),
    )


_PREFIX_JACCARD_T = "0.8"  # threshold as exact literal in both engines


@register(
    "jaccard_prefix_filter_pairs",
    oracle="""
    WITH tk AS (
      SELECT doc_id, {toks} AS toks FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id AS id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 2),
               j -> toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2]
                    || ' ' || toks[j+3]))) AS gram
      FROM tk WHERE len(toks) >= 4
    ), sizes AS (
      SELECT id, COUNT(*) AS n_grams FROM sh GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.gram = b.gram AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT id_a, id_b, n_inter, sa.n_grams AS n_a, sb.n_grams AS n_b,
             CAST(n_inter AS DOUBLE)
               / CAST(sa.n_grams + sb.n_grams - n_inter AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    ) WHERE jaccard >= {t}
    """.format(toks=_TOKS, t=_PREFIX_JACCARD_T),
)
def jaccard_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-threshold set-similarity join with PREFIX FILTERING (the
    PPJoin family's core idea): for Jaccard >= t, two sets MUST share at
    least one gram among each set's first (n - ceil(t*n) + 1) grams under
    any agreed global ordering -- so only that prefix is indexed, and the
    candidate space collapses while remaining provably LOSSLESS. The
    oracle states the exact all-pairs semantics (every pair >= 0.8, no
    prefix mechanics), so the gate itself verifies losslessness.

    Scale shape: grams are ordered rarest-first (ascending corpus
    document frequency -- the standard choice, making prefix collisions
    rare); the inverted index holds ONLY prefixes (at t=0.8 that is
    ~20% of grams, and the rarest 20% at that); surviving candidates are
    verified by one sorted-array intersection per pair. Versus the plain
    inverted-index join (ngram_jaccard_pairs), which meets on EVERY
    shared gram, the candidate-generating join here shrinks by both the
    prefix fraction and the rare-gram selectivity -- the difference
    between feasible and not at 100 TB for high-threshold dedup. The
    jaccard division is exact-int over double (rule 19): no rounding.

    Shingle width is itself a scale lever: the first cut of this entry
    used word BIGRAMS, and this corpus's tiny vocabulary (~900 distinct
    bigrams across 5k docs) made every gram frequent -- the "rarest 20%"
    still collided into 1.5M candidate pairs and 57s at sf0.1. At 4-gram
    shingles the gram space is ~210k and the same prefix logic yields
    255 candidates (0.8s). Prefix filtering presumes a heavy-tailed gram
    distribution; pick the shingle width that makes the tail heavy."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tk = d.select("doc_id", tokens("text").alias("toks")).filter(F.size("toks") >= 4)
    sh = tk.select(
        F.col("doc_id").alias("id"),
        F.explode(word_ngrams(F.col("toks"), n=4, distinct=True)).alias("gram"),
    ).dropDuplicates()
    gfreq = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("gf"))
    wpos = Window.partitionBy("id").orderBy("gf", "gram")
    wcnt = Window.partitionBy("id")
    ranked = sh.join(gfreq, "gram").select(
        "id",
        "gram",
        F.row_number().over(wpos).alias("pos"),
        F.count(F.lit(1)).over(wcnt).alias("n"),
    )
    # prefix length n - ceil(t*n) + 1 with t=0.8, integer-exact:
    # ceil(4n/5) == (4n + 4) div 5
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.expr("(4 * n + 4) div 5") + 1
    )
    # PPJoin length filter rides the candidate join: J >= 4/5 forces
    # 5*min(n_a, n_b) >= 4*max(n_a, n_b) -- integer-exact, kills pairs of
    # very different sizes before they reach verification.
    cand = (
        prefix.select(F.col("id").alias("id_a"), "gram", F.col("n").alias("na"))
        .join(
            prefix.select(F.col("id").alias("id_b"), "gram", F.col("n").alias("nb")),
            "gram",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("na") * 5 >= F.col("nb") * 4)
            & (F.col("nb") * 5 >= F.col("na") * 4)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    arrs = sh.groupBy("id").agg(
        F.array_sort(F.collect_list("gram")).alias("grams"),
        F.count(F.lit(1)).alias("n_grams"),
    )
    aa = arrs.select(
        F.col("id").alias("id_a"), F.col("grams").alias("g_a"), F.col("n_grams").alias("n_a")
    )
    bb = arrs.select(
        F.col("id").alias("id_b"), F.col("grams").alias("g_b"), F.col("n_grams").alias("n_b")
    )
    scored = (
        cand.join(aa, "id_a")
        .join(bb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("g_a", "g_b")).alias("n_inter"),
            "n_a",
            "n_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_a",
            "n_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return scored.filter(F.col("jaccard") >= F.expr(_PREFIX_JACCARD_T))


_SKIPGRAM_WINDOW = 2  # tokens to the right paired with each position
_SKIPGRAM_MIN_N = 25


@register(
    "skipgram_cooccurrence",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    pairs AS (
      SELECT CASE WHEN toks[i] <= toks[i + k] THEN toks[i] ELSE toks[i + k] END AS w1,
             CASE WHEN toks[i] <= toks[i + k] THEN toks[i + k] ELSE toks[i] END AS w2
      FROM tk,
           LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i),
           LATERAL (SELECT unnest(range(1, {_SKIPGRAM_WINDOW} + 1)) AS k)
      WHERE i + k <= len(toks)
    )
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_cooc
    FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= {_SKIPGRAM_MIN_N}
    """,
)
def skipgram_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts within a +-2 token window -- the
    counting pass behind word2vec/GloVe-style embedding training and the
    positional companion to document-level PMI (token_pmi_pairs counts
    presence per doc; this counts proximity per position, weighting
    frequent near-neighbors).

    Fully narrow until the final count: each position pairs with at most
    WINDOW following tokens via in-array index arithmetic (fan-out fixed
    at 2 per token -- no cap needed, unlike basket/PMI expansion), pairs
    are canonically ordered in-row (unordered co-occurrence), and the
    single shuffle is the O(vocab^2-bounded) count itself, floored at
    n >= 25 to keep the result reporting-sized."""
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tk = d.select(tokens("text").alias("toks"))
    pair_structs = F.flatten(
        F.transform(
            "toks",
            lambda x, i: F.transform(
                F.slice(
                    F.col("toks"),
                    i + F.lit(2),
                    F.least(F.lit(_SKIPGRAM_WINDOW), F.size("toks") - i - 1),
                ),
                lambda y: F.struct(
                    F.least(x, y).alias("w1"), F.greatest(x, y).alias("w2")
                ),
            ),
        )
    )
    return (
        tk.filter(F.size("toks") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cooc"))
        .filter(F.col("n_cooc") >= _SKIPGRAM_MIN_N)
    )


@register(
    "events_heatmap_dow_hour",
    oracle="""
    SELECT CAST(isodow(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: ISO weekday (1=Monday) x hour-of-day grid of
    event counts and value -- the seasonality view behind staffing and
    anomaly baselines. Deliberately keyed on ISO weekday because plain
    dayofweek is an engine trap (Spark says 1=Sunday, DuckDB 0=Sunday --
    DETERMINISM.md rule 12); Spark's weekday() (0=Monday) + 1 equals
    DuckDB's isodow. One bounded 7x24 aggregate; value sums ride
    DECIMAL (rule 1)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        (F.weekday("ts") + F.lit(1)).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
    )


@register(
    "minhash_jaccard_estimate",
    oracle=_minhash_sig_cte()
    + """
    , cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST((a.mh0 = b.mh0) AS INT) + CAST((a.mh1 = b.mh1) AS INT)
           + CAST((a.mh2 = b.mh2) AS INT) + CAST((a.mh3 = b.mh3) AS INT)
           + CAST((a.mh4 = b.mh4) AS INT) + CAST((a.mh5 = b.mh5) AS INT)
           + CAST((a.mh6 = b.mh6) AS INT) + CAST((a.mh7 = b.mh7) AS INT)
             AS n_match
      FROM mh a JOIN mh b ON a.doc_id < b.doc_id AND (
           (a.mh0 = b.mh0 AND a.mh1 = b.mh1) OR
           (a.mh2 = b.mh2 AND a.mh3 = b.mh3) OR
           (a.mh4 = b.mh4 AND a.mh5 = b.mh5) OR
           (a.mh6 = b.mh6 AND a.mh7 = b.mh7))
    )
    SELECT c.id_a, c.id_b, CAST(c.n_match AS BIGINT) AS n_match,
           CAST(c.n_match AS DOUBLE) / CAST(8 AS DOUBLE) AS est_jaccard,
           CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             / CAST(len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             AS exact_jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    """,
)
def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit for the MinHash pipeline: per LSH candidate
    pair, the signature-agreement estimate (matches/8) NEXT TO the exact
    shingle-set Jaccard -- the calibration table you read before trusting
    an estimated-similarity threshold at corpus scale (E[est] = J, sd =
    sqrt(J(1-J)/k); with k=8 one hash is 0.125 of estimate, which is why
    production LSH verifies candidates exactly, as dedup_cluster
    _survivors does).

    Scale shape: candidates come from the banded bucket join (never
    all-pairs); exact verification joins each candidate to its two
    shingle ARRAYS and intersects in-row -- per-pair O(len) with no
    further shuffle. All divisions are exact-int over double (rule 19):
    the estimate, the exact value, and their gap match bit-for-bit
    across engines.

    Plan-shape note (round-6 rework, measured at sf0.1 warm): the
    round-5 formulation joined FOUR separately-built relations back onto
    the candidates (signatures x2, shingle sets x2 -- 9.5s, the suite's
    heaviest entry). Staging ONE combined feature relation (doc_id,
    shingle array, mh0..mh7 -- shingles computed once, signatures
    derived from that same array) and joining it back per side cuts the
    query to 1.8s (5.4x): the candidate generator and both verify
    join-backs now share a single narrow build, and the optimizer reuses
    its exchange across the two sides. Persisting the feature relation
    measured 0.7s more but caches corpus-sized state inside a catalog
    entry and flatters min-of-2 bench timings, so the lazy shape is
    kept. The earlier ship-the-arrays-through-the-band-join variant
    remains slower (payload replicates x4 bands x2 sides through the
    exchange)."""
    from ..operators.dedup import minhash_cols
    from ..operators.text import tokens, word_ngrams

    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    feat = (
        docs.withColumn("__toks", tokens("text"))
        .filter(F.size("__toks") >= 3)
        .withColumn("sh", word_ngrams(F.col("__toks"), n=3, distinct=True))
        .select("doc_id", "sh", *minhash_cols(F.col("sh"), 8))
    )
    cand = lsh_candidate_pairs(feat, num_hashes=8, band_size=2)
    feat_a = feat.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)],
    )
    feat_b = feat.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("sh_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)],
    )
    n_match = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    )
    ni = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(feat_a, "id_a")
        .join(feat_b, "id_b")
        .select(
            "id_a",
            "id_b",
            n_match.cast("bigint").alias("n_match"),
            (n_match.cast("double") / F.lit(8.0)).alias("est_jaccard"),
            (
                ni.cast("double")
                / (F.size("sh_a") + F.size("sh_b") - ni).cast("double")
            ).alias("exact_jaccard"),
        )
    )


@register(
    "brand_share_topn_other",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS brand,
             SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS revenue
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    ),
    ranked AS (
      SELECT brand, revenue,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, brand) AS rk
      FROM rev
    ),
    labeled AS (
      SELECT CASE WHEN rk <= 5 THEN brand ELSE 'OTHER' END AS brand,
             revenue FROM ranked
    ),
    agg AS (
      SELECT brand, SUM(revenue) AS revenue FROM labeled GROUP BY brand
    ),
    tot AS (SELECT SUM(revenue) AS t FROM agg)
    SELECT brand, CAST(revenue AS DOUBLE) AS revenue,
           CAST(revenue AS DOUBLE) / CAST(t AS DOUBLE) AS share
    FROM agg CROSS JOIN tot
    """,
)
def brand_share_topn_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 brands by revenue with everything else collapsed into an
    'OTHER' bucket, plus share-of-total -- the reporting-layer rollup
    every dashboard needs and most engines hand-roll badly (a full sort,
    or a driver-side relabel).

    Scale shape: revenue per brand is one fact-sized aggregate (shuffle
    O(brands)); ranking and relabeling happen on the O(brands) grid; the
    OTHER re-aggregation and the grand total are grid-sized too. The
    window is bounded by brand cardinality, never the fact table.
    Revenue rides DECIMAL end-to-end and the tie-break (revenue desc,
    brand asc) makes the top-5 cut engine-deterministic even on exactly
    equal revenues; the share division follows rule 4 (both operands to
    double first)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), "brand")
    labeled = rev.select(
        F.when(F.row_number().over(w) <= 5, F.col("brand"))
        .otherwise(F.lit("OTHER"))
        .alias("brand"),
        "revenue",
    )
    agg = labeled.groupBy("brand").agg(F.sum("revenue").alias("revenue"))
    tot = agg.agg(F.sum("revenue").alias("t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "brand",
        F.col("revenue").cast("double").alias("revenue"),
        (F.col("revenue").cast("double") / F.col("t").cast("double")).alias("share"),
    )


@register(
    "label_outlier_mining",
    oracle="""
    WITH pe AS (
      SELECT vec_id, label, pos, CAST(embedding[pos] AS DOUBLE) AS val
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS pos)
    ),
    cent AS (
      SELECT label, pos,
             CAST(SUM(CAST(floor(val * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1e9 / COUNT(*) AS c
      FROM pe GROUP BY label, pos
    ),
    carr AS (
      SELECT label, list(c ORDER BY pos) AS cent FROM cent GROUP BY label
    ),
    scored AS (
      SELECT e.vec_id, e.label,
             list_reduce(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - ca.cent[i])
                    * (CAST(e.embedding[i] AS DOUBLE) - ca.cent[i])),
               (a, b) -> a + b) AS dist2
      FROM embeddings e JOIN carr ca ON ca.label = e.label
    )
    SELECT label, vec_id, dist2, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY label ORDER BY dist2 DESC, vec_id) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def label_outlier_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabeled-example mining: for each class, the 3 vectors farthest
    (squared L2) from their class centroid -- the standard first pass of
    label-noise auditing before training on weakly-labeled data (cheap
    to compute, and the far tail is where annotation errors live).

    Scale shape: centroids come from a posexplode + per-(label,dim)
    aggregate -- shuffle O(labels x dims), with per-dim sums snapped to
    exact nano-integers (rule 7) so the centroid is identical across
    engines AND partitionings (a raw double SUM would be
    partition-order-dependent). The labels x dims centroid table is
    broadcast back; each row's distance is one in-row fold over
    identically-ordered arrays (rule 6), and the per-label top-3 window
    runs over class-sized groups. No rounding anywhere: every op after
    the nano snap is correctly rounded in a fixed sequence (rule 19)."""
    e = t(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "val_f"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val_f").cast("double").alias("val"),
    )
    cent = pe.groupBy("label", "pos").agg(
        (
            F.sum(F.floor(F.col("val") * F.lit(1e9) + F.lit(0.5)).cast("bigint"))
            .cast("double")
            / F.lit(1e9)
            / F.count(F.lit(1))
        ).alias("c")
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s.getField("c"),
        ).alias("cent")
    )
    scored = e.join(F.broadcast(carr), "label").select(
        "vec_id",
        "label",
        F.aggregate(
            F.zip_with(
                "embedding",
                "cent",
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("dist2"),
    )
    w = Window.partitionBy("label").orderBy(F.col("dist2").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("label", "vec_id", "dist2", "rk")
    )


@register(
    "sorted_neighborhood_pairs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             list_sort(list_distinct({_TOKS})) AS toks
      FROM documents
    ), keyed AS (
      SELECT doc_id, lang, toks,
             array_to_string(toks[1:3], ' ') AS snkey
      FROM d
    ), nb AS (
      SELECT lang, doc_id, toks, snkey,
             LEAD(doc_id, 1) OVER w AS nid1, LEAD(toks, 1) OVER w AS nt1,
             LEAD(doc_id, 2) OVER w AS nid2, LEAD(toks, 2) OVER w AS nt2
      FROM keyed
      WINDOW w AS (PARTITION BY lang ORDER BY snkey, doc_id)
    ), cand AS (
      SELECT lang, doc_id AS a, nid1 AS b, toks AS ta, nt1 AS tb
      FROM nb WHERE nid1 IS NOT NULL
      UNION ALL
      SELECT lang, doc_id, nid2, toks, nt2 FROM nb WHERE nid2 IS NOT NULL
    ), scored AS (
      SELECT lang, a, b,
             CAST(len(list_intersect(ta, tb)) AS BIGINT) AS n_inter,
             CAST(len(list_distinct(list_concat(ta, tb))) AS BIGINT) AS n_union
      FROM cand
    )
    SELECT lang, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           n_inter, n_union,
           CAST(n_inter AS DOUBLE) / n_union AS jacc
    FROM scored WHERE n_inter * 2 >= n_union
    """,
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup blocking (Hernandez-Stolfo SNM): sort
    each language block by a canonical key (the doc's 3 smallest
    distinct tokens), slide a w=3 window down the sorted order, and
    emit adjacent candidate pairs whose exact token-set Jaccard is
    >= 0.5. Completes the candidate-generation family with the third
    classic discipline: hash blocking (minhash/simhash bands), prefix
    filtering (PPJoin), and now order-based neighborhoods -- the method
    of choice when near-dups share a sort prefix rather than rare
    tokens (record linkage, address/title dedup).

    Plan shape: one narrow projection (split/distinct/sort, all JVM
    HOFs), one window (two LEADs, so candidate volume is exactly
    2*rows - boundary), and an in-row exact verify -- no join at all,
    O(rows) candidates by construction vs LSH's collision-dependent
    volume. The window partitions by lang; like `source_capped_sample`
    (extensions.py:518) the 100 TB shape re-partitions the sort by
    range(snkey) with a w-row boundary-replication pass --
    identical output, bounded partitions -- while at catalog scale the
    per-lang window states the semantics. Jaccard is an exact rational
    (int/int double division, DETERMINISM.md rule 7).
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.array_sort(F.array_distinct(tokens("text"))).alias("toks"),
    )
    keyed = d.withColumn("snkey", F.concat_ws(" ", F.slice("toks", 1, 3)))
    w = Window.partitionBy("lang").orderBy("snkey", "doc_id")
    nb = keyed.select(
        "lang",
        "doc_id",
        "toks",
        F.lead("doc_id", 1).over(w).alias("nid1"),
        F.lead("toks", 1).over(w).alias("nt1"),
        F.lead("doc_id", 2).over(w).alias("nid2"),
        F.lead("toks", 2).over(w).alias("nt2"),
    )
    cand = (
        nb.filter(F.col("nid1").isNotNull())
        .select("lang", F.col("doc_id").alias("a"), F.col("nid1").alias("b"), "toks", F.col("nt1").alias("tb"))
        .unionByName(
            nb.filter(F.col("nid2").isNotNull()).select(
                "lang", F.col("doc_id").alias("a"), F.col("nid2").alias("b"), "toks", F.col("nt2").alias("tb")
            )
        )
    )
    scored = cand.select(
        "lang",
        F.col("a").cast("bigint").alias("a"),
        F.col("b").cast("bigint").alias("b"),
        F.size(F.array_intersect("toks", "tb")).cast("bigint").alias("n_inter"),
        F.size(F.array_union("toks", "tb")).cast("bigint").alias("n_union"),
    )
    return scored.filter(F.col("n_inter") * 2 >= F.col("n_union")).withColumn(
        "jacc", F.col("n_inter") / F.col("n_union")
    )


@register(
    "cm_selfjoin_size",
    oracle=f"""
    WITH keys AS (
      SELECT CAST(l_partkey AS VARCHAR) AS jk FROM lineitem
    ), exact_c AS (
      SELECT jk, COUNT(*) AS c FROM keys GROUP BY jk
    ), exact AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT) AS exact_sjs
      FROM exact_c
    ), pairs AS (
      {" UNION ALL ".join(f"SELECT {r} AS row, {_cm_bucket_sql(r, 'jk')} AS bucket FROM keys" for r in range(_CM_DEPTH))}
    ), sketch AS (
      SELECT row, bucket, COUNT(*) AS c FROM pairs GROUP BY row, bucket
    ), per_row AS (
      SELECT row, SUM(CAST(c AS DECIMAL(38,0)) * c) AS est FROM sketch GROUP BY row
    ), cm AS (
      SELECT CAST(MIN(est) AS BIGINT) AS cm_estimate FROM per_row
    )
    SELECT e.n_rows, e.n_keys, e.exact_sjs, cm.cm_estimate,
           CAST(cm.cm_estimate - e.exact_sjs AS BIGINT) AS cm_overestimate
    FROM exact e CROSS JOIN cm
    """,
)
def cm_selfjoin_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from a count-min sketch -- the AMS
    inner-product result the optimizer family is built on: the
    self-join size SUM(c_k^2) of lineitem on l_partkey is estimated as
    min over sketch rows of SUM_b C[row,b]^2, WITHOUT a per-key
    groupBy. Collisions only inflate, so estimate >= exact always
    (surfaced as `cm_overestimate >= 0`); expected error is
    n^2/width. This is the statistic a cost-based planner consults
    before picking a join strategy at 100 TB -- the sketch is
    O(d*w)=4x1024 counters, mergeable cell-wise across shards/days
    like `countmin_heavy_hitters` above (extensions.py:417), whose
    md5 grid it shares, so the oracle pins the estimate EXACTLY, not
    as a bound. Squared-count sums accumulate in decimal(38,0) (house
    overflow discipline; the true value fits bigint at any SF where
    n < 3e9 per key).
    """
    keys = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("jk")
    )

    exact = (
        keys.groupBy("jk")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
            .cast("bigint")
            .alias("exact_sjs"),
        )
    )
    pairs = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("row"),
                        _cm_bucket_col(r, F.col("jk")).alias("bucket"),
                    )
                    for r in range(_CM_DEPTH)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")
    cm = (
        pairs.groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("row")
        .agg(F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("est"))
        .agg(F.min("est").cast("bigint").alias("cm_estimate"))
    )
    return (
        exact.crossJoin(F.broadcast(cm))
        .withColumn(
            "cm_overestimate",
            (F.col("cm_estimate") - F.col("exact_sjs")).cast("bigint"),
        )
    )


_RRF_K = 50  # per-list depth: 8 of 500 docs land in BOTH lists at sf0.01
_RRF_C = 60  # the standard RRF dampening constant


@register(
    "hybrid_rrf_fusion",
    oracle=f"""
    WITH lexs AS (
      SELECT doc_id,
             {' + '.join(f"len(list_filter({_TOKS}, tok -> tok = '{w}'))" for w in _BM25_TERMS)} AS lex
      FROM documents
    ), lexr AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY lex DESC, doc_id) AS lex_rank
      FROM (SELECT * FROM lexs ORDER BY lex DESC, doc_id LIMIT {_RRF_K})
    ), qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
    sems AS (
      SELECT vec_id AS doc_id, {_cos_sql('embedding', 'q_vec')} AS cs
      FROM embeddings CROSS JOIN qv WHERE vec_id <> 0
    ), semr AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS sem_rank
      FROM (SELECT * FROM sems ORDER BY cs DESC, doc_id LIMIT {_RRF_K})
    ), fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             CAST(l.lex_rank AS BIGINT) AS lex_rank,
             CAST(s.sem_rank AS BIGINT) AS sem_rank,
             COALESCE(1.0 / ({_RRF_C} + l.lex_rank), 0.0)
           + COALESCE(1.0 / ({_RRF_C} + s.sem_rank), 0.0) AS rrf
      FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lex_rank, sem_rank, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 15
    """,
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: a lexical list
    (summed term frequency of the `bm25_keyword_search` query set --
    integer, so ranking is ulp-free) and a semantic list (exact cosine
    to a fixed query embedding, left-to-right fold per DETERMINISM.md
    rule 6) are each cut to top-50 (_RRF_K), then fused by
    RRF(d) = sum over lists of 1/(60+rank) (_RRF_C) -- the standard
    score-free combination for mixing retrieval modalities whose raw
    scores are incomparable. The query embedding itself (vec_id 0) is
    excluded from the semantic candidates -- a self-match is cosine 1.0
    and would always take sem_rank 1 (retrieval-eval convention). At
    this depth the two lists genuinely overlap at sf0.01, so the
    both-lists boost path is exercised, not just interleaving; docs in
    one list keep a single
    reciprocal term via COALESCE in the identical operand order in
    both engines.

    Scale shape: each list is ORDER BY ... LIMIT k
    (TakeOrderedAndProject -- partial per-partition top-k, no global
    sort of the corpus); ranks come from row_number over the
    LIMIT-BOUNDED 50-row relations (the `weighted_sample_ares`
    precedent); the fusion itself is a full outer join of two tiny
    relations. The corpus is scanned once per modality.
    """
    d = t(spark, sf_dir, "documents")
    lex_score = sum(
        (
            F.size(F.filter(tokens("text"), (lambda w: lambda tok: tok == F.lit(w))(w)))
            for w in _BM25_TERMS
        ),
        start=F.lit(0),
    )
    lexr = (
        d.select("doc_id", lex_score.alias("lex"))
        .orderBy(F.col("lex").desc(), "doc_id")
        .limit(_RRF_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("lex").desc(), "doc_id"))
            .cast("bigint")
            .alias("lex_rank"),
        )
    )
    emb = t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    dot = lambda a, b: F.aggregate(  # noqa: E731 -- rule 6 fold
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # the query vector itself is excluded from the candidate corpus
    # (vec_id 0 is the query): a self-match has cosine 1.0 and would
    # always consume sem_rank 1, skewing the fused list -- standard
    # retrieval-eval practice is query != corpus
    sems = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        (
            dot("embedding", "q_vec")
            / F.sqrt(dot("embedding", "embedding") * dot("q_vec", "q_vec"))
        ).alias("cs"),
    )
    semr = (
        sems.orderBy(F.col("cs").desc(), "doc_id")
        .limit(_RRF_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("cs").desc(), "doc_id"))
            .cast("bigint")
            .alias("sem_rank"),
        )
    )
    fused = lexr.join(semr, "doc_id", "full_outer").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_C) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_C) + F.col("sem_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(15)


@register(
    "target_encode_loo",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(SUM(CAST(FLOOR(value * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS s_n,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(g.s_n - CAST(FLOOR(e.value * 1000000000 + 0.5) AS BIGINT) AS BIGINT) AS num_n,
           CAST(g.c - 1 AS BIGINT) AS denom,
           CAST(g.s_n - CAST(FLOOR(e.value * 1000000000 + 0.5) AS BIGINT) AS DOUBLE)
             / ((g.c - 1) * 1000000000.0) AS loo_enc
    FROM events e JOIN g USING (event_type)
    WHERE e.event_id < 200 AND g.c > 1
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the categorical event_type by
    the value column -- the leakage-safe categorical encoder for
    gradient-boosted/linear training sets: each row's category is
    replaced by the category's mean target EXCLUDING the row itself
    ((sum - own)/(n - 1)), so the feature never contains the row's own
    label. Published per row: the exact integer numerator in nano units
    (sums and the row's snapped value are both bigint -- the
    subtraction is exact), the denominator, and the encoded double (one
    bigint->double cast each side of a single division, identical in
    both engines). Singleton categories are dropped (n-1 = 0), the
    standard LOO convention; the output is cut to event_id < 200 purely
    to bound the comparison relation.

    Scale shape: ONE O(categories) groupBy, then the category stats
    join back -- a relation with one row per category, always
    BROADCAST at any corpus size; the encode itself is a narrow
    projection over the fact table. No window, no second shuffle.
    """
    ev = t(spark, sf_dir, "events")
    vn = F.floor(F.col("value") * 1e9 + F.lit(0.5)).cast("bigint")
    g = ev.groupBy("event_type").agg(
        F.sum(vn).cast("bigint").alias("s_n"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    return (
        ev.join(F.broadcast(g), "event_type")
        .filter((F.col("event_id") < 200) & (F.col("c") > 1))
        .select(
            "event_id",
            "event_type",
            (F.col("s_n") - vn).cast("bigint").alias("num_n"),
            (F.col("c") - 1).cast("bigint").alias("denom"),
            (
                (F.col("s_n") - vn).cast("double")
                / ((F.col("c") - 1) * F.lit(1e9)).cast("double")
            ).alias("loo_enc"),
        )
    )


@register(
    "cdc_chunk_dedup",
    oracle="""
    WITH tk AS (
      SELECT doc_id, tok, pos,
             CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1)
                       % 8 = 0 THEN 1 ELSE 0 END AS bnd
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok,
                   generate_subscripts(
                     regexp_split_to_array(trim(text), '\\s+'), 1) AS pos
            FROM documents)
    ),
    cx AS (
      SELECT doc_id, tok, pos,
             SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - bnd AS chunk_ix
      FROM tk
    ),
    ch AS (
      SELECT doc_id, chunk_ix,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chash,
             COUNT(*) AS n_toks
      FROM cx GROUP BY doc_id, chunk_ix
    ),
    dup AS (
      SELECT chash FROM ch GROUP BY chash HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) FILTER (WHERE chash IN (SELECT chash FROM dup))
                AS BIGINT) AS n_dup_chunks,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(n_toks) FILTER (
                  WHERE chash IN (SELECT chash FROM dup)), 0)
                AS BIGINT) AS dup_tokens
    FROM ch GROUP BY doc_id
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (CDC) dedup -- the storage-dedup
    primitive applied to corpus curation: a chunk boundary falls AFTER
    any token whose md5 first hex nibble is 0 mod 8 (expected chunk
    length 8 tokens), so boundaries depend only on LOCAL content and
    survive insertions/deletions that shift positions -- the property
    fixed-stride windows (`doc_chunk_overlap`) lack, and the reason CDC
    is how backup systems and span-level corpus dedup find moved
    duplicates. Chunks are grouped by content hash; a chunk is
    duplicated iff it appears in >= 2 distinct docs. Per doc: chunk
    count, duplicated-chunk count, token count, tokens inside
    duplicated chunks (all exact ints; the synthetic ~31-word
    vocabulary makes short chunks collide often -- 1,895 of 4,883
    chunks at sf0.01 -- which exercises the dup path hard).

    Scale shape: one scan; the chunk_ix assignment is a running sum
    INSIDE each doc partition (bounded by doc length, the house
    per-entity window rule); chunk hashing is one O(chunks) groupBy;
    the dup set joins back by content hash -- a shuffle join on a
    high-entropy key, skew-free by construction. No all-pairs stage
    anywhere: cross-doc duplicate discovery rides entirely on the
    hash groupBy, exactly like `dedup_exact_hash` but at sub-document
    granularity.
    """
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tk = d.select(
        "doc_id",
        F.posexplode(tokens("text")).alias("pos", "tok"),
    )
    nib = F.position(F.substring(F.md5("tok"), 1, 1), F.lit("0123456789abcdef")) - 1
    tk = tk.withColumn("bnd", ((nib % 8) == 0).cast("int"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cx = tk.withColumn("chunk_ix", F.sum("bnd").over(w) - F.col("bnd"))
    ch = cx.groupBy("doc_id", "chunk_ix").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
                " ",
            )
        ).alias("chash"),
        F.count(F.lit(1)).cast("bigint").alias("n_toks"),
    )
    dup = (
        ch.groupBy("chash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chash", F.lit(True).alias("is_dup"))
    )
    return (
        ch.join(dup, "chash", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.coalesce("is_dup", F.lit(False)).cast("bigint"))
            .cast("bigint")
            .alias("n_dup_chunks"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.coalesce("is_dup", F.lit(False)), F.col("n_toks")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("dup_tokens"),
        )
    )


@register(
    "gram_novelty_by_bucket",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(tk) >= 5
                    THEN list_transform(range(1, len(tk) - 3),
                           i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2],
                                          tk[i + 3], tk[i + 4]))
                    ELSE CAST([] AS VARCHAR[]) END)) AS gram
      FROM toks
    ),
    firsts AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT CAST(g.doc_id // 100 AS BIGINT) AS bucket,
           CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS grams_seen,
           CAST(COUNT(DISTINCT CASE WHEN f.first_doc // 100 = g.doc_id // 100
                                    THEN g.gram END) AS BIGINT) AS novel_grams
    FROM g JOIN firsts f USING (gram)
    GROUP BY 1
    """,
)
def gram_novelty_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty-decay curve: per ingestion bucket (100 docs in
    doc_id order), how many distinct word 5-grams appear at all vs how
    many appear for the FIRST time in that bucket. The novelty ratio's
    decay is the data-mixing diagnostic LLM pipelines watch to decide
    when a source is saturated (diminishing novel content per added
    shard) -- measured here exactly, not sampled: first occurrence is a
    MIN over doc_id per gram, so the whole statistic is two hash
    aggregates and one join, no window over facts and no ordering
    assumption beyond the ids the corpus already carries.

    Scale shape: gram explosion is one scan (distinct shingles per doc,
    the `benchmark_contamination` relation); firsts is an O(grams)
    groupBy; the join back is gram-keyed (high-entropy, skew-free).
    Bucket granularity keeps the output O(corpus/100) regardless of
    gram count. Both counts published as exact ints; the ratio is the
    reader's division.
    """
    from ..operators.text import word_ngrams

    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    g = d.select(
        "doc_id",
        F.explode(word_ngrams(tokens("text"), n=5, distinct=True)).alias("gram"),
    )
    # r14 shape (guide §2.3 "aggregate before you shuffle" / §2.4): the
    # old plan joined the data-sized gram stream back to the firsts
    # aggregate (one raw-row exchange of g) and then paid TWO
    # countDistincts under groupBy(bucket) -- an Expand doubling the
    # join output before a third exchange.  But both published counts
    # are aggregate-only:
    #   grams_seen(bucket)  = |distinct (gram, bucket)|  per bucket
    #   novel_grams(bucket) = |{gram : min(doc_id) div 100 == bucket}|
    # (a gram's first doc lies IN its first bucket, so "novel AND seen"
    # degenerates to a predicate on the firsts relation -- no join back
    # to occurrences is needed).  Both branches shuffle partially
    # aggregated rows only; the final assembly joins two O(buckets)
    # relations.  Integer division end to end (float division + cast
    # truncates the same way for the fixture's small ids, but drifts
    # past 2^53).  Rows verified identical to the join formulation.
    seen = (
        g.select(F.expr("doc_id div 100").cast("bigint").alias("bucket"), "gram")
        .distinct()
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("grams_seen"))
    )
    novel = (
        g.groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.expr("first_doc div 100").cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("novel_grams"))
    )
    return seen.join(novel, "bucket", "left_outer").select(
        "bucket",
        "grams_seen",
        F.coalesce("novel_grams", F.lit(0)).cast("bigint").alias("novel_grams"),
    )


@register(
    "dup_cluster_size_histogram",
    oracle=f"""
    WITH sh AS ({_simhash_oracle().strip()}),
    cl AS (SELECT simhash, COUNT(*) AS sz FROM sh GROUP BY simhash)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(sz * COUNT(*) AS BIGINT) AS n_docs
    FROM cl GROUP BY sz
    """,
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution -- the dedup REPORTING
    primitive every curation dashboard needs: after blocking docs into
    identity clusters (16-bit simhash here, the `simhash_blocking_pairs`
    relation), how many clusters have size 1, 2, ... k, and how many
    docs sit in each size class? The histogram is what turns a dedup
    run into a decision (size-1 mass = unique content; a fat tail =
    boilerplate to drop; `n_docs` sums back to the corpus size, which
    the invariant test pins). Three hash aggregates, each strictly
    smaller than the last -- O(docs) -> O(clusters) -> O(size classes);
    nothing here is pairwise.
    """
    sh = simhash_table(rebalance_for_cpu(t(spark, sf_dir, "documents")))
    cl = sh.groupBy("simhash").agg(F.count(F.lit(1)).alias("sz"))
    # n_docs = sz * n_clusters, computed as SUM(sz) -- every sz in the
    # group equals the grouping key, and sum avoids referencing the
    # grouping alias inside agg (lateral-alias resolution is Spark>=3.4
    # and flag-dependent)
    return cl.groupBy(F.col("sz").cast("bigint").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs"),
    )


@register(
    "group_kfold_assign",
    oracle="""
    WITH f AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT
               % 5 AS fold
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT f.fold,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(e.value * 1000000000 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_value_nano
    FROM events e JOIN f USING (user_id)
    GROUP BY f.fold
    """,
)
def group_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware k-fold assignment (k=5): every event of a user lands
    in the SAME fold (fold = md5(user_id) mod 5 -- deterministic,
    seedless, rerun-stable), the property plain row-hash splitting
    (`train_val_test_split`) cannot give and the one that matters for
    CV on grouped data: a user leaking across folds inflates every
    fold's score. Published per fold: users, events, value mass -- the
    balance diagnostics. The invariant test pins disjointness (each
    user in exactly one fold) and completeness (fold sizes sum to the
    corpus).

    Scale shape: the fold id is a pure projection of user_id -- no
    shuffle to ASSIGN; the reporting aggregate shuffles by fold
    (5 groups, map-side combined). The md5-mod idiom is the house
    deterministic sampler (train_val_test_split, corpus_shard_shuffle).
    """
    ev = t(spark, sf_dir, "events")
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 5
    ).cast("bigint")
    return (
        ev.select("user_id", fold.alias("fold"), "value")
        .groupBy("fold")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1e9 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("sum_value_nano"),
        )
    )


@register("compression_ratio_quality", oracle=None)
def compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style compression-ratio quality signal: zlib-compressed
    size over raw UTF-8 size per document. Highly repetitive/boiler-
    plate text compresses far below ~0.4; high-entropy junk sits near
    1.0; natural prose lands between -- the cheap corpus-quality filter
    production LLM pipelines run alongside the stopword/length rules
    (`text_quality`). No SQL engine exposes a compression primitive, so
    this is one of the catalog's few rows-only entries, and the
    sanctioned Python path is used: Arrow-batched ``mapInPandas``
    (zlib level pinned for determinism; whole batches cross the
    boundary, never rows). Invariants (tests): planted repetitive text
    compresses below planted random-ish text, ratios are in (0, ~1.1],
    and compressed_len is byte-exactly reproducible across runs.
    The SQL-expressible half is additionally VALUE-HASHED by the
    companion ``compression_ratio_rawlen`` below (same worker, same
    filter, (doc_id, raw_len) projection vs a DuckDB
    octet_length(encode(..)) oracle), so the only unhashed surface is
    the zlib call itself.

    Scale shape: embarrassingly parallel single scan -- per-partition
    Arrow batches through one Python worker pass, no shuffle at all.
    """
    import pandas as pd

    # null/empty texts are dropped JVM-side BEFORE the Python boundary:
    # encode(None) raises in the worker and an empty doc has no defined
    # ratio (x/0) -- and a production quality filter discards both
    # anyway. The filter is a pushdown-able scan predicate.
    d = (
        rebalance_for_cpu(t(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("doc_id", "text")
    )

    def ratios(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_len": raw.str.len().astype("int64"),
                    "compressed_len": comp.astype("int64"),
                }
            )
            out["ratio"] = out["compressed_len"] / out["raw_len"]
            yield out

    return d.mapInPandas(
        ratios, schema="doc_id long, raw_len long, compressed_len long, ratio double"
    )


@register(
    "compression_ratio_rawlen",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS raw_len
    FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
    """,
)
def compression_ratio_rawlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-hashed companion to ``compression_ratio_quality`` (r9
    verdict ask #2): the zlib half of that entry is inherently
    rows-only (no SQL engine exposes a compression primitive), but its
    deterministic half -- per-doc UTF-8 byte length, the ratio's
    denominator -- IS SQL-expressible.  This entry routes the IDENTICAL
    Arrow-batched ``mapInPandas`` worker (same null/empty pushdown
    filter, same pandas ``str.encode('utf-8')``) and projects
    (doc_id, raw_len), so the DuckDB oracle
    (``octet_length(encode(text))``) value-hashes everything about the
    Python boundary except the zlib call itself: row alignment across
    Arrow batches, the encode step (UTF-8 BYTES by construction on both
    sides -- though the driver fixture happens to be ASCII-only, probed,
    so bytes == code points there), and the JVM-side filter.  The zlib
    column keeps its pytest invariants
    (tests/test_diagnostics_entries.py); together the split leaves no
    untested surface, with the documented remainder being exactly
    `len(zlib.compress(b, 6))`."""
    return compression_ratio_quality(spark, sf_dir).select("doc_id", "raw_len")


# ------------------------------------------------- iterative linear algebra

_PCA_DIM = 64
_PCA_ROUNDS = 3
_PCA_SNAP = 1_000_000.0  # micro-unit input/score quantization (see docstring)


def _pca_round_sql(prev_v: str, r: int) -> str:
    """One unrolled power-iteration round in DuckDB, mirroring the
    engine's arithmetic EXACTLY (docs/DETERMINISM.md rules 2/3/6/7/8):
    s = X v as a per-row left-fold dot (same IEEE order as Spark's
    aggregate()), snapped to micro-int via floor(x*1e6 + 0.5) (rule 7:
    floor(x+0.5), never round()); the centered matvec numerator
    n*t_d - m_d*S in exact int128 (HUGEINT -- DECIMAL(38,0)*DECIMAL(38,0)
    would silently promote to DOUBLE, measured); then int->double via
    the sign/2^48/2^24 split (rule 3: DuckDB's wide-int->double cast
    double-rounds; three correctly-rounded IEEE ops are engine-exact),
    and the left-fold 2-norm."""
    dot = (
        f"list_reduce(list_transform(range(1, {_PCA_DIM} + 1), "
        f"i -> CAST(e.embedding[i] AS DOUBLE) * v.v[i]), (x, y) -> x + y)"
    )
    xm = (
        "CAST(floor(CAST(embedding[u.dim + 1] AS DOUBLE) * 1000000.0 + 0.5) "
        "AS BIGINT)"
    )
    return f"""
    s{r} AS (
      SELECT e.embedding,
             CAST(floor({dot} * 1000000.0 + 0.5) AS BIGINT) AS sn
      FROM embeddings e CROSS JOIN {prev_v} v
    ),
    a{r} AS (
      SELECT u.dim, SUM({xm} * sn) AS t
      FROM s{r} CROSS JOIN (SELECT unnest(range(0, {_PCA_DIM})) AS dim) u
      GROUP BY u.dim
    ),
    ss{r} AS (SELECT SUM(sn) AS ss, CAST(COUNT(*) AS HUGEINT) AS n FROM s{r}),
    w{r} AS (
      SELECT a.dim,
             ss.n * CAST(a.t AS HUGEINT)
               - CAST(mu.m AS HUGEINT) * CAST(ss.ss AS HUGEINT) AS wi
      FROM a{r} a JOIN mu ON mu.dim = a.dim CROSS JOIN ss{r} ss
    ),
    wd{r} AS (
      SELECT dim,
        (CASE WHEN wi < 0 THEN -1.0 ELSE 1.0 END) * (
          CAST(abs(wi) // 281474976710656 AS DOUBLE) * 281474976710656.0
          + CAST((abs(wi) % 281474976710656) // 16777216 AS DOUBLE) * 16777216.0
          + CAST(abs(wi) % 16777216 AS DOUBLE)) AS w
      FROM w{r}
    ),
    wl{r} AS (SELECT list(w ORDER BY dim) AS wl FROM wd{r}),
    v{r} AS (
      SELECT list_transform(wl, e -> e / sqrt(list_reduce(
               list_transform(wl, q -> q * q), (x, y) -> x + y))) AS v
      FROM wl{r}
    )
    """


def _pca_power_oracle() -> str:
    rounds = "".join(
        "," + _pca_round_sql(f"v{r - 1}", r) for r in range(1, _PCA_ROUNDS + 1)
    )
    return f"""
    WITH mu AS (
      SELECT u.dim,
             SUM(CAST(floor(CAST(embedding[u.dim + 1] AS DOUBLE)
                 * 1000000.0 + 0.5) AS BIGINT)) AS m
      FROM embeddings CROSS JOIN (SELECT unnest(range(0, {_PCA_DIM})) AS dim) u
      GROUP BY u.dim
    ),
    v0 AS (SELECT list_transform(range(1, {_PCA_DIM} + 1),
                    i -> CAST(0.125 AS DOUBLE)) AS v)
    {rounds}
    SELECT CAST(u.dim AS BIGINT) AS dim, v.v[u.dim + 1] AS loading
    FROM v{_PCA_ROUNDS} v
    CROSS JOIN (SELECT unnest(range(0, {_PCA_DIM})) AS dim) u
    """


def _wide_int_to_double(wi: int) -> float:
    """Exact-integer -> double conversion both engines reproduce
    bit-identically (DETERMINISM.md rule 3): sign * (h2*2^48 + h1*2^24
    + lo), each chunk < 2^53 so its own conversion is exact, and the
    three IEEE multiply/adds are correctly rounded by spec on both
    sides. A single direct cast of an int128-sized value is NOT safe:
    DuckDB's wide-int path double-rounds (observed 1-ulp skew)."""
    sign = -1.0 if wi < 0 else 1.0
    a = abs(wi)
    h2, rem = divmod(a, 1 << 48)
    h1, lo = divmod(rem, 1 << 24)
    return sign * (float(h2) * 2.0**48 + float(h1) * 2.0**24 + float(lo))


@register("embedding_pca_power", eager_build=True, oracle=_pca_power_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding matrix by POWER
    ITERATION -- the iterative-linear-algebra shape the catalog's other
    iterative families (value iteration: pagerank/h-index; traversal:
    BFS/CC; peeling: k-core) don't cover, and the standard first step of
    embedding-space analysis in LLM data pipelines (anisotropy
    measurement, top-component removal a la all-but-the-top, drift
    directions).

    Three unrolled rounds of v <- normalize(C v) on the CENTERED
    covariance C = sum_i (x_i - mu)(x_i - mu)^T, computed WITHOUT
    materializing C or centering X.  With micro-quantized inputs and
    scores (x~_id = floor(x_id * 1e6 + 0.5), s~_i = floor((x_i . v)
    * 1e6 + 0.5)) the centered-matvec numerator is the EXACT integer
        w_d  (prop to)  n * sum_i x~_id s~_i  -  m_d * sum_i s~_i
    (m_d = sum_i x~_id; the identity sum_i x_id = n mu_d multiplied
    through by n -- normalization absorbs the scale).  Quantization at
    1e-6 on unit-scale embeddings perturbs the direction ~1e-6, far
    below estimation noise -- the same scaled-integer trade the
    seasonal-decompose/ACF entries make (docs/DETERMINISM.md).

    Distributed shape per round: ONE whole-stage-codegen pass over the
    corpus -- s~_i is a per-row zip_with/aggregate fold (no UDF), and
    the 64 integer t_d sums + S + (first round only) the 64 m_d sums
    are a single map-side-combined global aggregate producing ONE row.
    No shuffle of the data at all, at any scale: a 1e9 x 64 matrix
    costs 3 cached scans and three O(dim) driver reductions.  The
    vector itself is O(dim) driver state, the same bounded-collect
    contract as the kmeans centroids (operators/similarity.py).

    Cross-engine BIT-EXACTNESS (no published rounding at all): every
    cross-row sum is an exact integer routed through decimal/HUGEINT
    (order-independent); the per-row dot is the identical IEEE left
    fold on both engines (Spark aggregate() == DuckDB list_reduce);
    snapping uses floor(x + 0.5), deterministic on both (rule 7);
    the wide integer w_d converts to double via the rule-3 hi/lo split
    (`_wide_int_to_double`, mirrored term-for-term in the oracle's
    wd CTE); normalization is sqrt/div, correctly rounded by IEEE
    spec (rule 19).  Init v0 = 1/sqrt(64) = 0.125 exactly.  The first
    draft cast double PRODUCTS to DECIMAL(38,18) and measured the
    rule-2 hazard live: 1-ulp engine skew on 44/64 loadings -- the
    integer redesign eliminates it (prototype: 64/64 loadings
    bit-equal).  Three fixed rounds make the result well-defined
    independent of convergence (same contract as pagerank_parts_3iter);
    sign follows deterministically from the init.

    Bounds: |x| <= ~0.6, |s| <= sqrt(64) at unit v, so the bigint
    product x~ * s~ is < 2^63 with ~10^5 headroom; per-dim sums are
    decimal(38,0) (engine) / HUGEINT (oracle), exact to 1e38 -- at
    n = 1e9 rows the numerator is ~1e26, five orders inside int128.

    Reference parity: the reference has no linear-algebra operators
    (linear pandas flows, DAG1:1-322); this extends the engine the way
    corpus-scale embedding analysis needs."""
    v, _, _ = _pca_power_vector(spark, sf_dir)
    return spark.createDataFrame(
        [(d, v[d]) for d in range(_PCA_DIM)], "dim bigint, loading double"
    )


# Session-scoped memo for the power-iteration results (r11 verdict ask
# #3): THREE entries consume the identical component-1 iteration ladder
# (embedding_pca_power publishes it, embedding_pca_top2 deflates against
# it, embedding_anisotropy_abtt projects it out), so without sharing the
# suite runs the same 3 corpus scans three times over.  The key is
# (applicationId, realpath(sf_dir)): the embeddings parquet is immutable
# driver testdata, the values are O(dim) Python floats (same bounded
# driver-state contract as the kmeans centroids), and a new SparkSession
# or a different SF recomputes from scratch.  Correctness is unaffected
# -- the memoized vector is bit-identical to a fresh run (deterministic
# exact-integer matvec, proven by the unchanged DuckDB oracles) -- and
# the scan/job-count pin lives in tests/test_plans.py.
_PCA_MEMO: dict[tuple[str, str], dict] = {}


def _memo_key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import os

    return (spark.sparkContext.applicationId, os.path.realpath(sf_dir))


def _evict_dead_apps(memo: dict, app_id: str) -> None:
    """Drop memo entries left by previous SparkSessions (r12 advice #5):
    keys are (applicationId, sf_dir) and a dead application's entry can
    never hit again, so a long-lived process that cycles sessions
    (pytest, notebooks) would otherwise grow the memo dicts without
    bound.  Called on every memo access; O(len(memo)) with at most a
    handful of live keys."""
    for k in [k for k in memo if k[0] != app_id]:
        del memo[k]


def _pca_memo_slot(spark: SparkSession, sf_dir: str) -> dict:
    key = _memo_key(spark, sf_dir)
    _evict_dead_apps(_PCA_MEMO, key[0])
    return _PCA_MEMO.setdefault(key, {})


def _pca_power_vector(
    spark: SparkSession, sf_dir: str
) -> tuple[list[float], list[int], int]:
    """The driver computation behind ``embedding_pca_power`` (and reused
    by ``embedding_pca_top2`` / ``embedding_anisotropy_abtt``): returns
    (v, m_ints, n) -- the unit top-direction after _PCA_ROUNDS power
    rounds, the exact micro-snapped per-dim column sums, and the row
    count.  Memoized per (session, sf_dir); see ``_PCA_MEMO``."""
    slot = _pca_memo_slot(spark, sf_dir)
    if "v1" not in slot:
        # cache across the _PCA_ROUNDS actions (iterative-loop
        # discipline: each round's collect would otherwise rescan the
        # parquet)
        emb = t(spark, sf_dir, "embeddings").select("embedding").cache()
        state: dict = {}
        try:
            v = _pca_power_rounds(emb, state)
        finally:
            # a failed mid-round action must not leave cached blocks
            # pinned for the rest of a long bench/sweep session
            emb.unpersist()
        slot.update(v1=v, m=state["m"], n=state["n"])
    return slot["v1"], slot["m"], slot["n"]


def _pca_power_rounds(
    emb: DataFrame, state: dict, deflate: list[float] | None = None
) -> list[float]:
    """_PCA_ROUNDS exact power rounds on the (cached) embedding frame:
    v <- normalize(C v), with C the centered covariance applied via the
    scaled-integer matvec of ``embedding_pca_power``.  ``state`` carries
    the exact column sums m_d and the row count n across calls (filled
    by whichever call runs the first action, so a two-component caller
    pays for them once).  ``deflate``, when given, is an already-
    computed unit direction: after every matvec the component along it
    is removed (w <- w - (w . deflate) deflate) BEFORE normalization --
    per-round Gram-Schmidt deflation, the textbook second-eigenvector
    power scheme.  The deflation arithmetic is O(dim) driver floats in
    LEFT-FOLD order, mirrored expression-for-expression by the oracle's
    list_reduce CTEs so the published vector stays bit-equal."""
    import math

    dec = "decimal(38,0)"

    def xm(d: int):
        return F.floor(
            F.col("embedding")[d].cast("double") * F.lit(_PCA_SNAP) + F.lit(0.5)
        )

    v = [0.125] * _PCA_DIM
    for _rnd in range(_PCA_ROUNDS):
        vcol = F.array(*[F.lit(x) for x in v])
        s_expr = F.aggregate(
            F.zip_with("embedding", vcol, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        sn = F.floor(s_expr * F.lit(_PCA_SNAP) + F.lit(0.5)).alias("sn")
        aggs = [
            F.sum(F.col("sn").cast(dec)).alias("ss"),
            *[
                F.sum((xm(d) * F.col("sn")).cast(dec)).alias(f"t{d}")
                for d in range(_PCA_DIM)
            ],
        ]
        need_m = "n" not in state
        if need_m:
            # column sums m_d and n ride the first round's single pass
            aggs += [
                F.count(F.lit(1)).alias("n"),
                *[F.sum(xm(d).cast(dec)).alias(f"m{d}") for d in range(_PCA_DIM)],
            ]
        row = emb.select("embedding", sn).agg(*aggs).collect()[0]
        if need_m:
            state["n"] = int(row["n"])
            state["m"] = [int(row[f"m{d}"]) for d in range(_PCA_DIM)]
        n, m_ints = state["n"], state["m"]
        ss = int(row["ss"])
        wd = [
            _wide_int_to_double(n * int(row[f"t{d}"]) - m_ints[d] * ss)
            for d in range(_PCA_DIM)
        ]
        if deflate is not None:
            p = 0.0
            for i in range(_PCA_DIM):
                p = p + wd[i] * deflate[i]
            wd = [wd[i] - p * deflate[i] for i in range(_PCA_DIM)]
        norm = math.sqrt(sum(q * q for q in wd))
        v = [q / norm for q in wd]
    return v


def _pca_round2_sql(prev_u: str, r: int) -> str:
    """One unrolled DEFLATED power round for the SECOND component:
    the identical exact matvec CTE chain as ``_pca_round_sql`` (renamed
    sy/ay/ssy/wy/wdy/wly to coexist), then Gram-Schmidt against the
    finished first component v{_PCA_ROUNDS} -- p = left-fold dot, then
    w[i] - p * v1[i] -- before the normalization.  Every float op is
    the same IEEE expression the driver runs in ``_pca_power_rounds``
    (list_reduce left fold == Python's 0.0-seeded accumulation, exact
    because 0.0 + x == x)."""
    dot = (
        f"list_reduce(list_transform(range(1, {_PCA_DIM} + 1), "
        f"i -> CAST(e.embedding[i] AS DOUBLE) * v.v[i]), (x, y) -> x + y)"
    )
    xm = (
        "CAST(floor(CAST(embedding[u.dim + 1] AS DOUBLE) * 1000000.0 + 0.5) "
        "AS BIGINT)"
    )
    idx = f"range(1, {_PCA_DIM} + 1)"
    return f"""
    sy{r} AS (
      SELECT e.embedding,
             CAST(floor({dot} * 1000000.0 + 0.5) AS BIGINT) AS sn
      FROM embeddings e CROSS JOIN {prev_u} v
    ),
    ay{r} AS (
      SELECT u.dim, SUM({xm} * sn) AS t
      FROM sy{r} CROSS JOIN (SELECT unnest(range(0, {_PCA_DIM})) AS dim) u
      GROUP BY u.dim
    ),
    ssy{r} AS (SELECT SUM(sn) AS ss, CAST(COUNT(*) AS HUGEINT) AS n FROM sy{r}),
    wy{r} AS (
      SELECT a.dim,
             ss.n * CAST(a.t AS HUGEINT)
               - CAST(mu.m AS HUGEINT) * CAST(ss.ss AS HUGEINT) AS wi
      FROM ay{r} a JOIN mu ON mu.dim = a.dim CROSS JOIN ssy{r} ss
    ),
    wdy{r} AS (
      SELECT dim,
        (CASE WHEN wi < 0 THEN -1.0 ELSE 1.0 END) * (
          CAST(abs(wi) // 281474976710656 AS DOUBLE) * 281474976710656.0
          + CAST((abs(wi) % 281474976710656) // 16777216 AS DOUBLE) * 16777216.0
          + CAST(abs(wi) % 16777216 AS DOUBLE)) AS w
      FROM wy{r}
    ),
    wly{r} AS (SELECT list(w ORDER BY dim) AS wl FROM wdy{r}),
    py{r} AS (
      SELECT list_reduce(list_transform({idx}, i -> wl.wl[i] * vk.v[i]),
                         (x, y) -> x + y) AS p
      FROM wly{r} wl CROSS JOIN v{_PCA_ROUNDS} vk
    ),
    uly{r} AS (
      SELECT list_transform({idx}, i -> wl.wl[i] - p.p * vk.v[i]) AS w
      FROM wly{r} wl CROSS JOIN py{r} p CROSS JOIN v{_PCA_ROUNDS} vk
    ),
    u{r} AS (
      SELECT list_transform(w, e -> e / sqrt(list_reduce(
               list_transform(w, q -> q * q), (x, y) -> x + y))) AS v
      FROM uly{r}
    )
    """


def _pca_top2_oracle() -> str:
    rounds1 = "".join(
        "," + _pca_round_sql(f"v{r - 1}", r) for r in range(1, _PCA_ROUNDS + 1)
    )
    rounds2 = "".join(
        "," + _pca_round2_sql(f"u{r - 1}", r) for r in range(1, _PCA_ROUNDS + 1)
    )
    return f"""
    WITH mu AS (
      SELECT u.dim,
             SUM(CAST(floor(CAST(embedding[u.dim + 1] AS DOUBLE)
                 * 1000000.0 + 0.5) AS BIGINT)) AS m
      FROM embeddings CROSS JOIN (SELECT unnest(range(0, {_PCA_DIM})) AS dim) u
      GROUP BY u.dim
    ),
    v0 AS (SELECT list_transform(range(1, {_PCA_DIM} + 1),
                    i -> CAST(0.125 AS DOUBLE)) AS v)
    {rounds1},
    u0 AS (SELECT list_transform(range(1, {_PCA_DIM} + 1),
                    i -> CAST(0.125 AS DOUBLE)) AS v)
    {rounds2}
    SELECT CAST(1 AS BIGINT) AS component, CAST(u.dim AS BIGINT) AS dim,
           v.v[u.dim + 1] AS loading
    FROM v{_PCA_ROUNDS} v
    CROSS JOIN (SELECT unnest(range(0, {_PCA_DIM})) AS dim) u
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS component, CAST(u.dim AS BIGINT) AS dim,
           w.v[u.dim + 1] AS loading
    FROM u{_PCA_ROUNDS} w
    CROSS JOIN (SELECT unnest(range(0, {_PCA_DIM})) AS dim) u
    """


@register("embedding_pca_top2", eager_build=True, oracle=_pca_top2_oracle())
def embedding_pca_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-2 PRINCIPAL SUBSPACE of the embedding matrix by deflated
    power iteration (r10 verdict ask #6): component 1 is exactly
    ``embedding_pca_power``'s vector; component 2 runs the SAME
    _PCA_ROUNDS exact-integer centered matvec but Gram-Schmidt-deflates
    against component 1 after every round (w <- w - (w . v1) v1) -- the
    textbook second-eigenvector scheme, converging to the second
    principal direction when the spectrum separates.  All-but-the-top
    (Mu & Viswanath 2018) removes the top k ~ dim/100 components; this
    publishes the subspace that postprocessing consumes.

    Distributed shape: SIX cached corpus scans total (3 per component
    -- the column sums m_d and n ride the first scan and are CARRIED
    ACROSS components via the shared state dict, so component 2 adds no
    extra aggregates), each one whole-stage-codegen pass producing ONE
    driver row; zero data shuffle at any scale.  Deflation itself is
    O(dim) driver arithmetic -- the same bounded-collect contract as
    the kmeans centroids.

    Cross-engine BIT-EXACTNESS: the matvec inherits
    ``embedding_pca_power``'s proof (exact integer cross-row sums,
    rule-3 hi/lo int->double split, identical IEEE per-row folds); the
    NEW float surface -- the projection dot, the subtraction, and the
    re-normalization -- is pure O(dim) IEEE arithmetic mirrored
    term-for-term in the oracle's py/uly/u CTEs (left folds match
    Python's 0.0-seeded sums exactly since 0.0 + x == x).  Three fixed
    rounds per component make the output well-defined independent of
    convergence (the synthetic fixture is near-isotropic, so the
    CONTRACT pinned by tests is algebraic: unit norms and v2 . v1 == 0
    to float precision -- not a data-dependent spectral claim).

    Reference parity: no linear-algebra operators in the reference
    (DAG1:1-322); see the module docstring.

    Component 1 comes from the session memo shared with
    ``embedding_pca_power`` / ``embedding_anisotropy_abtt`` (r11 verdict
    ask #3: the suite used to re-run the identical component-1 ladder
    three times -- 12 corpus scans across the three entries; now 6 on a
    fresh session).  Component 2's deflated rounds prefill the carried
    (n, m_d) state from the memo, so their per-round aggregates are the
    same expressions as before -- the published vectors are bit-identical
    to the unshared computation (oracle unchanged, still bit-exact)."""
    v1, m_ints, n = _pca_power_vector(spark, sf_dir)
    slot = _pca_memo_slot(spark, sf_dir)
    if "v2" not in slot:
        emb = t(spark, sf_dir, "embeddings").select("embedding").cache()
        try:
            slot["v2"] = _pca_power_rounds(
                emb, {"n": n, "m": m_ints}, deflate=v1
            )
        finally:
            emb.unpersist()
    v2 = slot["v2"]
    rows = [(1, d, v1[d]) for d in range(_PCA_DIM)] + [
        (2, d, v2[d]) for d in range(_PCA_DIM)
    ]
    return spark.createDataFrame(rows, "component bigint, dim bigint, loading double")


_ABTT_QUERY_CAP = 50  # sampled query set: 50 vectors -> 1225 pairs, bounded


def _abtt_oracle() -> str:
    """Composes the full unrolled power iteration (shared CTE text with
    ``_pca_power_oracle``) with the all-but-the-top projection and the
    nano-snapped pairwise-cosine sums.  Every per-pair cosine is the
    identical IEEE expression on both engines (_cos_sql == the
    operators.similarity fold shape, proven by embedding_cosine_topk);
    cross-row aggregation is exact integers only."""
    rounds = "".join(
        "," + _pca_round_sql(f"v{r - 1}", r) for r in range(1, _PCA_ROUNDS + 1)
    )
    idx = f"range(1, {_PCA_DIM} + 1)"
    return f"""
    WITH mu AS (
      SELECT u.dim,
             SUM(CAST(floor(CAST(embedding[u.dim + 1] AS DOUBLE)
                 * 1000000.0 + 0.5) AS BIGINT)) AS m
      FROM embeddings CROSS JOIN (SELECT unnest(range(0, {_PCA_DIM})) AS dim) u
      GROUP BY u.dim
    ),
    v0 AS (SELECT list_transform({idx}, i -> CAST(0.125 AS DOUBLE)) AS v)
    {rounds},
    mud AS (
      SELECT list(CAST(mu.m AS DOUBLE) / (CAST(ss1.n AS DOUBLE) * 1000000.0)
                  ORDER BY mu.dim) AS mu
      FROM mu CROSS JOIN ss1 GROUP BY ss1.n
    ),
    q AS (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id < {_ABTT_QUERY_CAP}),
    pc AS (
      SELECT vec_id, embedding,
             list_transform({idx},
               i -> CAST(embedding[i] AS DOUBLE) - mud.mu[i]) AS xc
      FROM q CROSS JOIN mud
    ),
    pj AS (
      SELECT vec_id, embedding, xc,
             list_reduce(list_transform({idx}, i -> xc[i] * v.v[i]),
                         (x, y) -> x + y) AS proj
      FROM pc CROSS JOIN v{_PCA_ROUNDS} v
    ),
    pp AS (
      SELECT vec_id, embedding,
             list_transform({idx}, i -> xc[i] - proj * v.v[i]) AS xp
      FROM pj CROSS JOIN v{_PCA_ROUNDS} v
    ),
    prs AS (
      SELECT {_cos_sql('a.embedding', 'b.embedding')} AS cr,
             {_cos_sql('a.xp', 'b.xp')} AS cp
      FROM pp a JOIN pp b ON a.vec_id < b.vec_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(floor(cr * 1000000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cos_nano_raw,
           CAST(SUM(CAST(floor(cp * 1000000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cos_nano_abtt
    FROM prs
    """


@register("embedding_anisotropy_abtt", eager_build=True, oracle=_abtt_oracle())
def embedding_anisotropy_abtt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL-BUT-THE-TOP embedding postprocessing (Mu & Viswanath, ICLR
    2018), measured as an anisotropy diagnostic: embedding spaces are
    notoriously anisotropic -- random pairs have systematically positive
    cosine because every vector shares the mean offset and a dominant
    direction -- and the standard cheap fix is x' = (x - mu) minus its
    projection on the top principal component.  This entry removes
    exactly that (mu and v reused from the power iteration,
    ``_pca_power_vector`` -- one computation, two entries) and reports
    the mean pairwise cosine over a fixed 50-vector query sample
    (_ABTT_QUERY_CAP -> 1225 pairs) BEFORE and AFTER, published as
    exact nano-snapped integer sums (n_pairs, sum_cos_nano_raw,
    sum_cos_nano_abtt) so the oracle match is bit-exact with no float
    hashing at all.  On real embedding corpora the postprocessed mean
    sits closer to zero; the SYNTHETIC fixture is already isotropic
    (measured mean pairwise cosine within +-0.004 at every SF), so the
    pytest invariant pins the operator's ALGEBRAIC contract instead --
    xp is orthogonal to the removed direction, the projection changed
    the statistic -- never the data-dependent improvement direction
    (tests/test_diagnostics_entries.py::test_abtt_projection_contract).

    Distributed shape: the corpus-wide statistics (mu, v) come from the
    power iteration's shuffle-free passes; the diagnostic itself stages
    xc -> proj -> xp as ATTRIBUTE REFS before the pair join (house HOF
    discipline: Catalyst skips CSE inside lambdas, so un-staged arrays
    re-fold once per PAIR instead of once per row), then one bounded
    50x50 broadcast self-join and a single global integer aggregate.
    At 100 TB the sample stays O(1) by construction while mu/v remain
    exact corpus-wide statistics.

    Cross-engine exactness: mu_d = m_d / (n * 1e6) is one correctly-
    rounded division of exact operands; xc/proj/xp and both cosines are
    identical IEEE expression trees (the fold shapes proven by
    embedding_pca_power and embedding_cosine_topk); per-pair cosines
    snap via floor(cos * 1e9 + 0.5) (DETERMINISM rule 7) and sum as
    exact integers (rule 20 discipline).

    Reference parity: no linear-algebra or embedding operators in the
    reference (DAG1:1-322); see the module docstring."""
    from ..operators.similarity import cosine

    v, m_ints, n = _pca_power_vector(spark, sf_dir)
    mu_list = [float(m) / (n * 1e6) for m in m_ints]
    v_lit = F.array(*[F.lit(x) for x in v])
    mu_lit = F.array(*[F.lit(x) for x in mu_list])

    q = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _ABTT_QUERY_CAP)
        .select("vec_id", "embedding")
    )
    staged = q.select(
        "vec_id",
        "embedding",
        F.zip_with("embedding", mu_lit, lambda a, b: a.cast("double") - b).alias(
            "xc"
        ),
    )
    staged = staged.select(
        "vec_id",
        "embedding",
        "xc",
        F.aggregate(
            F.zip_with("xc", v_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        ).alias("proj"),
    )
    staged = staged.select(
        "vec_id",
        "embedding",
        F.zip_with("xc", v_lit, lambda a, b: a - F.col("proj") * b).alias("xp"),
    )
    a = staged.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("emb_a"),
        F.col("xp").alias("xp_a"),
    )
    b = staged.select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("emb_b"),
        F.col("xp").alias("xp_b"),
    )
    pairs = a.join(b, F.col("ida") < F.col("idb")).select(
        cosine(F.col("emb_a"), F.col("emb_b")).alias("cr"),
        cosine(F.col("xp_a"), F.col("xp_b")).alias("cp"),
    )
    dec = "decimal(38,0)"
    nano = 1_000_000_000.0
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.floor(F.col("cr") * F.lit(nano) + F.lit(0.5)).cast(dec))
        .cast("bigint")
        .alias("sum_cos_nano_raw"),
        F.sum(F.floor(F.col("cp") * F.lit(nano) + F.lit(0.5)).cast(dec))
        .cast("bigint")
        .alias("sum_cos_nano_abtt"),
    )


@register(
    "cross_source_dup_matrix",
    oracle=_minhash_sig_cte()
    + """
    , cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM mh a JOIN mh b ON a.doc_id < b.doc_id AND (
           (a.mh0 = b.mh0 AND a.mh1 = b.mh1) OR
           (a.mh2 = b.mh2 AND a.mh3 = b.mh3) OR
           (a.mh4 = b.mh4 AND a.mh5 = b.mh5) OR
           (a.mh6 = b.mh6 AND a.mh7 = b.mh7))
    )
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
           CAST(COUNT(CASE WHEN md5(da.text) = md5(db.text) THEN 1 END)
                AS BIGINT) AS n_exact_dup_pairs
    FROM cand c
    JOIN documents da ON da.doc_id = c.id_a
    JOIN documents db ON db.doc_id = c.id_b
    GROUP BY 1, 2
    """,
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE CONTAMINATION MATRIX -- the corpus-curation question
    the pairwise dedup entries don't answer directly: WHICH pairs of
    sources duplicate each other, and how much of the overlap is
    verbatim.  For every MinHash-LSH candidate pair (the exact same
    4-band x 2-hash generator as ``minhash_lsh_pairs`` -- bucket
    equi-join, shuffle O(docs x bands), never O(docs^2)) the pair is
    attributed to its unordered (source, source) cell, with a verbatim
    tier (md5-equal texts) counted alongside.  In an LLM pipeline this
    is the artifact that decides which feeds to drop or de-prioritize:
    the diagonal is within-source redundancy, off-diagonal cells are
    cross-feed syndication.

    Scale shape: candidate generation is the proven banded join; the
    source attribution is two joins against the documents projection
    (doc_id, source, md5(text) -- never full bodies twice), and the
    output is an O(sources^2) matrix.  The md5 verbatim tier rides the
    same join (128-bit hashes shuffle, not texts).

    Reference parity: no dedup operators in the reference (DAG1:1-322);
    SURVEY.md section 2's LLM-pipeline extension families cover why the
    engine carries this.
    """
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    sigs = minhash_signatures(docs, num_hashes=8, shingle_n=3)
    cand = lsh_candidate_pairs(sigs, num_hashes=8, band_size=2)
    meta = docs.select("doc_id", "source", F.md5("text").alias("h"))
    a = meta.select(
        F.col("doc_id").alias("id_a"),
        F.col("source").alias("src_a"),
        F.col("h").alias("h_a"),
    )
    b = meta.select(
        F.col("doc_id").alias("id_b"),
        F.col("source").alias("src_b"),
        F.col("h").alias("h_b"),
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_candidate_pairs"),
            F.count(F.when(F.col("h_a") == F.col("h_b"), 1)).alias(
                "n_exact_dup_pairs"
            ),
        )
    )


@register(
    "source_mixture_weights",
    oracle="""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    q AS (
      SELECT source, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000000.0 + 0.5)
                  AS BIGINT) AS sqn
      FROM s
    ),
    tt AS (SELECT CAST(SUM(sqn) AS BIGINT) AS tot FROM q)
    SELECT source, n AS n_docs, sqn AS sqrt_nano,
           CAST(sqn AS DOUBLE) / CAST(tot AS DOUBLE) AS weight
    FROM q CROSS JOIN tt
    """,
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SAMPLING mixture weights per source, alpha = 0.5 --
    the multilingual/multi-source pretraining staple (mT5/XLM-R style:
    sample source s with probability n_s^alpha / sum n_i^alpha, alpha <
    1 upweights low-resource slices).  alpha = 0.5 is chosen
    DELIBERATELY for the determinism contract: sqrt is correctly
    rounded by IEEE spec on both engines (DETERMINISM rule 19), whereas
    a general pow(x, 0.7) = exp(0.7 ln x) carries two
    non-correctly-rounded libm calls.

    Exactness: per-source counts are exact ints; each sqrt is one
    correctly-rounded op whose result is nano-snapped to an integer
    (rule 7); the normalizer is an exact INTEGER sum of those (no
    float accumulation order anywhere); the published weight is one
    int->double cast per operand (exact below 2^53 -- a 1e15-doc corpus
    keeps sqrt_nano ~ 3e16, still inside) + one correctly-rounded
    division.  The exact integers publish alongside the double.

    Scale shape: one map-side-combined groupBy over the corpus, then
    O(sources) arithmetic against a broadcast 1-row total.

    Reference parity: no sampling operators in the reference
    (DAG1:1-322); see the module docstring.
    """
    s = t(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    q = s.select(
        "source",
        "n",
        F.floor(F.sqrt(F.col("n").cast("double")) * F.lit(1e9) + F.lit(0.5))
        .cast("bigint")
        .alias("sqn"),
    )
    tot = q.agg(F.sum("sqn").cast("bigint").alias("tot"))
    return q.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("sqn").alias("sqrt_nano"),
        (F.col("sqn").cast("double") / F.col("tot").cast("double")).alias(
            "weight"
        ),
    )


@register(
    "token_kl_by_source",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS}) AS token FROM documents
    ), st AS (
      SELECT source, token, COUNT(*) AS n_st FROM tok GROUP BY 1, 2
    ), s_tot AS (
      SELECT source, SUM(n_st) AS n_s, COUNT(*) AS n_types FROM st GROUP BY 1
    ), ct AS (
      SELECT token, SUM(n_st) AS n_ct FROM st GROUP BY 1
    ), n AS (
      SELECT SUM(n_ct) AS n_tot FROM ct
    )
    SELECT st.source,
           CAST(s.n_s AS BIGINT) AS n_tokens,
           CAST(s.n_types AS BIGINT) AS n_types,
           round(CAST(SUM(CAST(
             (CAST(st.n_st AS DOUBLE) / s.n_s)
             * ln((CAST(st.n_st AS DOUBLE) * n.n_tot)
                  / (CAST(s.n_s AS DOUBLE) * ct.n_ct))
           AS DECIMAL(38,18))) AS DOUBLE), 6) AS kl_nats
    FROM st
    JOIN s_tot s USING (source)
    JOIN ct USING (token)
    CROSS JOIN n
    GROUP BY 1, 2, 3
    """,
)
def token_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the token distribution against the
    corpus: KL(P_source || P_corpus) in nats -- THE data-mixture
    diagnostic (how far each source's unigram language drifts from the
    blend; complements `source_mixture_weights`, which decides how much
    of each source to take, with a measure of how *different* what you
    take is, and `psi_drift_event_values`, which is the binned numeric
    sibling). Sources are subsets of the corpus, so every source token
    exists in the corpus and KL is finite; KL >= 0 with equality iff
    the source matches the blend (Gibbs), pinned by the invariant test.

    Scale shape: one (source, token) partial-aggregated shuffle, one
    token-keyed rollup REUSED from that aggregate for corpus counts
    (never a second raw-token pass), a dimension-sized source rollup,
    and a 1-row grand total broadcast. All counts are exact integers;
    each KL term does ONE double division pair feeding ONE ln per
    (source, token) -- products stay < 2^53 at fixture scale so both
    engines see bit-identical ln arguments (at 1e13+ tokens the ratio
    should be computed as a difference of two exact divisions' logs;
    noted, not needed here); the per-source sum is decimal-routed and
    rounded to 6 (token_entropy's libm discipline).
    """
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    tok = d.select(
        "source", F.explode_outer(tokens("text")).alias("token")
    ).filter(F.col("token").isNotNull())
    # cache the (source, token) aggregate: three downstream consumers
    # (s_tot, ct, the KL join) must read ONE computation of it -- AQE's
    # ReusedExchange is best-effort, the cache makes the single raw-token
    # pass a guarantee (lazy: building the plan stays side-effect-free)
    st = (
        tok.groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n_st"))
        .cache()
    )
    s_tot = st.groupBy("source").agg(
        F.sum("n_st").alias("n_s"), F.count(F.lit(1)).alias("n_types")
    )
    ct = st.groupBy("token").agg(F.sum("n_st").alias("n_ct"))
    n = ct.agg(F.sum("n_ct").alias("n_tot"))
    term = (F.col("n_st").cast("double") / F.col("n_s")) * F.log(
        (F.col("n_st").cast("double") * F.col("n_tot"))
        / (F.col("n_s").cast("double") * F.col("n_ct"))
    )
    return (
        st.join(F.broadcast(s_tot), "source")
        .join(ct, "token")
        .crossJoin(F.broadcast(n))
        .groupBy(
            "source",
            F.col("n_s").cast("bigint").alias("n_tokens"),
            F.col("n_types").cast("bigint").alias("n_types"),
        )
        .agg(
            F.round(
                F.sum(term.cast("decimal(38,18)")).cast("double"), 6
            ).alias("kl_nats")
        )
    )


def _gt_top1_sql() -> str:
    """Exact brute-force top-1 CTE (the MRR ground truth; same scoring
    shape as ``_brute_topk_sql`` but keeping only rank 1)."""
    return f"""
    gt_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS gt_neighbor,
             {_cos_sql('q.embedding', 'c.embedding')} AS gcs
      FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
      WHERE c.vec_id <> q.vec_id
    ), gt AS (
      SELECT query_id, gt_neighbor FROM (
        SELECT query_id, gt_neighbor,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY gcs DESC, gt_neighbor) AS rk
        FROM gt_scored
      ) WHERE rk = 1
    )
    """


def _replace_once(text: str, needle: str, repl: str) -> str:
    """str.replace that FAILS FAST when the needle is absent: the
    mrr_ivf_vs_brute oracle is derived from _ivf_oracle()'s text, and a
    silent no-op replace after a rewording of the base oracle would
    produce a wrong-schema oracle that only surfaces as a confusing
    run-time sweep mismatch (r11 advice #2)."""
    assert needle in text, (
        "oracle-derivation needle missing -- _ivf_oracle() text drifted; "
        f"update the needle: {needle[:80]!r}"
    )
    return text.replace(needle, repl, 1)


@register(
    "mrr_ivf_vs_brute",
    eager_build=True,
    oracle=_replace_once(
        _replace_once(
            _ivf_oracle().rstrip(),
            "WITH cents AS (",
            "WITH " + _gt_top1_sql().strip().rstrip() + ", cents AS (",
        ),
        """SELECT * FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM cand
    ) WHERE rank <= 5""",
        """SELECT g.query_id, g.gt_neighbor,
           CAST(COALESCE(i.rank, 0) AS BIGINT) AS rank_in_ivf,
           CASE WHEN i.rank IS NULL THEN 0.0
                ELSE CAST(1.0 AS DOUBLE) / i.rank END AS rr
    FROM gt g
    LEFT JOIN (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM cand
    ) i ON i.query_id = g.query_id AND i.neighbor_id = g.gt_neighbor
       AND i.rank <= 5""",
    ),
)
def mrr_ivf_vs_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the TRUE nearest neighbor inside the IVF
    result, per query -- the ranking-quality complement of
    ``ivf_recall_at_5`` (recall asks "how many of the top-5 did the
    index keep"; RR asks "where did it PLACE the single right answer").
    rr = 1/rank of the brute-force top-1 in the IVF top-5, 0 when the
    index missed it entirely (probed cells excluded the true
    neighbor's cell). Chosen over nDCG deliberately: reciprocal ranks
    are exact rationals (one int division), so the quality metric
    itself stays engine-exact with NO libm surface -- the mean over
    queries (MRR) is a trivial downstream average left to the reader so
    every per-query row stays hash-checkable.

    Scale shape: ground truth is the brute-force broadcast-scored top-1
    (query batch bounded at 10); the IVF side is the same cell-join
    plan as ``embedding_ivf_topk``; the final comparison joins two
    query-batch-sized relations. At corpus scale the brute side is the
    one full scan you pay to MEASURE the index (that is what a quality
    eval is); the measured artifact itself stays O(queries).
    """
    from ..operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    gt = cosine_topk(emb, queries, k=1).select(
        "query_id", F.col("neighbor_id").alias("gt_neighbor")
    )
    ivf = ivf_topk(
        corpus=emb, queries=queries,
        centroids=emb.filter(F.col("vec_id") < 8), k=5, n_probe=2,
    ).select(F.col("query_id").alias("iq"), "neighbor_id", "rank")
    res = gt.join(
        ivf,
        (gt.query_id == ivf.iq) & (gt.gt_neighbor == ivf.neighbor_id),
        "left",
    )
    return res.select(
        "query_id",
        "gt_neighbor",
        F.coalesce(F.col("rank"), F.lit(0)).cast("bigint").alias("rank_in_ivf"),
        F.when(F.col("rank").isNull(), F.lit(0.0))
        .otherwise(F.lit(1.0) / F.col("rank"))
        .alias("rr"),
    )


_MRL_DIM = 16  # retrieval prefix: first quarter of the 64-dim embedding
_MRL_K = 5
_MRL_NQ = 10  # query batch (the mrr_ivf_vs_brute bound)


def _mrl_oracle() -> str:
    def arm(vec: str) -> str:
        return f"""
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 {_cos_sql(f'q.{vec}', f'c.{vec}')} DESC, c.vec_id) AS rk
        FROM embeddings c
        CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                    WHERE vec_id < {_MRL_NQ}) q
        WHERE c.vec_id <> q.vec_id
      ) WHERE rk <= {_MRL_K}"""

    return f"""
    WITH full_k AS ({arm('embedding')}),
    trunc_k AS ({arm(f'embedding[1:{_MRL_DIM}]')})
    SELECT f.query_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap,
           COUNT(t.neighbor_id) / {float(_MRL_K)!r} AS recall_at_k
    FROM full_k f
    LEFT JOIN trunc_k t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """


@register("embedding_matryoshka_recall", oracle=_mrl_oracle())
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA (truncated-dimension) RETRIEVAL RECALL (Kusupati et
    al. 2022): per query, how many of the exact full-dim cosine top-k
    neighbors survive when search runs on only the first _MRL_DIM of
    _PCA_DIM dimensions -- the eval behind the standard MRL serving
    recipe (search the cheap prefix, optionally rerank the shortlist
    with full vectors).  Published per query: the overlap count and
    recall@k = overlap / k, with the deterministic (cos DESC, id)
    tie-break on both arms.

    Distributed shape: both arms are the ``cosine_topk`` brute
    baseline -- query batch (bounded at _MRL_NQ) broadcast against one
    corpus scan, per-row staged squared norms, rank-limited per-query
    window -- so the truncated arm scans 1/4 of the vector bytes
    (column-pruned to the slice after the scan; at 100 TB this is the
    memory-bandwidth saving MRL exists for) and the published artifact
    is O(queries).  The final overlap join is between two
    (queries x k)-row relations.

    Cross-engine exactness: cosines are the proven sequential-fold
    double expression (_cos_sql == the operators.similarity fold,
    established by embedding_cosine_topk); overlap counts are exact
    integers and recall is one IEEE division of exact operands.

    Reference parity: no similarity operators in the reference
    (DAG1:1-322); deepens the ANN family's eval side alongside
    ivf_recall_at_5 (index loss) and mrr_ivf_vs_brute (rank
    placement)."""
    from ..operators.similarity import cosine_topk as _ctopk

    emb = t(spark, sf_dir, "embeddings")

    def arm(df: DataFrame) -> DataFrame:
        q = df.filter(F.col("vec_id") < _MRL_NQ)
        return _ctopk(df, q, k=_MRL_K).select("query_id", "neighbor_id")

    full_k = arm(emb)
    trunc_k = arm(
        emb.select(
            "vec_id", F.slice("embedding", 1, _MRL_DIM).alias("embedding")
        )
    ).select(F.col("query_id").alias("tq"), F.col("neighbor_id").alias("tn"))
    hit = full_k.join(
        trunc_k,
        (full_k.query_id == trunc_k.tq) & (full_k.neighbor_id == trunc_k.tn),
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("tn").cast("bigint").alias("n_overlap"),
        (F.count("tn") / F.lit(float(_MRL_K))).alias("recall_at_k"),
    )


_MRL_M = 4  # shortlist multiplier: stage 1 keeps m*k candidates


def _mrl_rerank_oracle() -> str:
    short = _MRL_M * _MRL_K
    return f"""
    WITH sq AS (
      SELECT vec_id, embedding[1:{_MRL_DIM}] AS v FROM embeddings
    ), short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 {_cos_sql('q.v', 'c.v')} DESC, c.vec_id) AS rk
        FROM sq c
        CROSS JOIN (SELECT vec_id, v FROM sq
                    WHERE vec_id < {_MRL_NQ}) q
        WHERE c.vec_id <> q.vec_id
      ) WHERE rk <= {short}
    ), rer AS (
      SELECT s.query_id, s.neighbor_id,
             {_cos_sql('qe.embedding', 'ce.embedding')} AS cos_sim
      FROM short s
      JOIN embeddings ce ON ce.vec_id = s.neighbor_id
      JOIN embeddings qe ON qe.vec_id = s.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM rer
    ) WHERE rank <= {_MRL_K}
    """


@register("matryoshka_rerank_topk", oracle=_mrl_rerank_oracle())
def matryoshka_rerank_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA TWO-STAGE SERVING (r13 verdict ask #3):
    ``embedding_matryoshka_recall`` MEASURES what the prefix loses;
    this entry is the PRODUCTION recipe its docstring names -- search
    the cheap _MRL_DIM-dim prefix for an m*k shortlist, rerank the
    shortlist (and only the shortlist) with exact full-dimension
    cosine, publish the reranked top-k per query with full-dim
    similarities.  See ``operators.similarity.matryoshka_rerank_topk``
    for the plan (prefix brute arm -> bounded broadcast shortlist ->
    keyed candidate fetch -> <= m*k-row per-query rerank window) and
    the proven law rerank-recall >= prefix-recall.

    Cross-engine exactness: both stages' cosines are the established
    sequential-fold expression (_cos_sql == the similarity fold); the
    shortlist and rerank tie-breaks are total orders, so the published
    rows are engine-exact including the raw cos_sim doubles (the
    embedding_cosine_topk discipline)."""
    from ..operators.similarity import (
        matryoshka_rerank_topk as _mrl_rerank,
    )

    emb = t(spark, sf_dir, "embeddings")
    return _mrl_rerank(
        corpus=emb,
        queries=emb.filter(F.col("vec_id") < _MRL_NQ),
        prefix_dim=_MRL_DIM,
        k=_MRL_K,
        m=_MRL_M,
    )


_LM_MU = 2000.0  # Dirichlet prior mass (Zhai & Lafferty's default range)


def _lm_dirichlet_oracle() -> str:
    """DuckDB query-likelihood scoring with the SAME parenthesization as
    the Spark plan (the _bm25_oracle discipline: ln() 1-ulp differences
    absorbed by round(.,6), every other double op folds identically)."""
    per_term = " + ".join(
        f"""ln((CAST(tf_{i} AS DOUBLE)
           + {_LM_MU!r} * (CAST(ctf_{i} AS DOUBLE) / CAST(c_total AS DOUBLE)))
           / (CAST(dl AS DOUBLE) + {_LM_MU!r}))"""
        for i in range(len(_BM25_TERMS))
    )
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, tok -> tok = '{w}')) AS tf_{i}"
        for i, w in enumerate(_BM25_TERMS)
    )
    ctf_cols = ",\n             ".join(
        f"CAST(SUM(CAST(tf_{i} AS BIGINT)) AS BIGINT) AS ctf_{i}"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), feat AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM tk
    ), stats AS (
      SELECT CAST(SUM(CAST(dl AS BIGINT)) AS BIGINT) AS c_total,
             {ctf_cols}
      FROM feat
    ), scored AS (
      SELECT doc_id, round({per_term}, 6) AS ql_logprob
      FROM feat, stats
    )
    SELECT doc_id, ql_logprob FROM (
      SELECT doc_id, ql_logprob,
             ROW_NUMBER() OVER (ORDER BY ql_logprob DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    """


@register("lm_dirichlet_search", oracle=_lm_dirichlet_oracle())
def lm_dirichlet_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001, mu=2000): score(q,d) = sum over query terms of
    ln((tf + mu*P_c(t)) / (dl + mu)) -- the language-modeling family's
    answer to BM25 (same fixed 3-term query, so the two entries rank the
    same corpus and their disagreements are exactly the k1/b-vs-mu
    modeling difference). Smoothing makes zero-tf docs scorable, so
    every document gets a finite log-probability.

    Scale shape: identical to ``bm25_keyword_search`` -- per-doc tf/dl
    are narrow in-row filters; collection stats (total tokens,
    per-term collection frequency) are ONE scalar aggregate broadcast
    back as a 1-row cross join; top-10 is a partial top-k
    (TakeOrderedAndProject). Two corpus scans, no shuffle wider than
    one row, at any corpus size.
    """
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))

    def eq_term(w: str):
        return lambda tok: tok == F.lit(w)

    feat = d.select(
        "doc_id",
        F.size(tokens("text")).alias("dl"),
        *[
            F.size(F.filter(tokens("text"), eq_term(w))).alias(f"tf_{i}")
            for i, w in enumerate(_BM25_TERMS)
        ],
    )
    stats = feat.agg(
        F.sum(F.col("dl").cast("bigint")).cast("bigint").alias("c_total"),
        *[
            F.sum(F.col(f"tf_{i}").cast("bigint")).cast("bigint").alias(f"ctf_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        term = F.log(
            (
                F.col(f"tf_{i}").cast("double")
                + _LM_MU
                * (F.col(f"ctf_{i}").cast("double") / F.col("c_total").cast("double"))
            )
            / (F.col("dl").cast("double") + _LM_MU)
        )
        score = term if score is None else score + term
    scored = feat.crossJoin(F.broadcast(stats)).select(
        "doc_id", F.round(score, 6).alias("ql_logprob")
    )
    return scored.orderBy(F.col("ql_logprob").desc(), "doc_id").limit(10)


_LOGREG_LR = 2.0
_LOGREG_ITERS = 3
_LOGREG_PLANT = 0.06  # planted boundary on the raw stopword ratio
_STOPWORDS_LIST = list(STOPWORDS)


def _logreg_iter_sql(i: int) -> str:
    """One unrolled batch-GD iteration: rational-sigmoid scores, three
    decimal-exact gradient sums quantized to 9 frac digits before the
    double cast (a full 38,18 decimal needs > 53 mantissa bits, so
    DuckDB's int128-scaled cast and Python's float() can land 1 ulp
    apart -- measured 8.7e-19 on w1; at 9 digits the scaled integer is
    < 2^53 for |g| < 9e6 and both conversions are the SAME single
    correctly-rounded operation), a scalar weight update, and the
    post-update training accuracy. Parenthesization mirrors the Spark
    plan token-for-token (DETERMINISM.md discipline)."""
    z = "w.w0 + w.w1 * x1 + w.w2 * x2"
    return f"""
    sc{i} AS (
      SELECT y, x1, x2,
             0.5 + z / (2.0 * (1.0 + abs(z))) AS s
      FROM (SELECT y, x1, x2, {z} AS z FROM feat CROSS JOIN w{i - 1} w)
    ),
    g{i} AS (
      SELECT SUM(CAST((y - s) AS DECIMAL(38,18))) AS g0,
             SUM(CAST((y - s) * x1 AS DECIMAL(38,18))) AS g1,
             SUM(CAST((y - s) * x2 AS DECIMAL(38,18))) AS g2
      FROM sc{i}
    ),
    w{i} AS (
      SELECT w.w0 + {_LOGREG_LR!r} * (CAST(ROUND(g.g0, 9) AS DOUBLE) / nn.n) AS w0,
             w.w1 + {_LOGREG_LR!r} * (CAST(ROUND(g.g1, 9) AS DOUBLE) / nn.n) AS w1,
             w.w2 + {_LOGREG_LR!r} * (CAST(ROUND(g.g2, 9) AS DOUBLE) / nn.n) AS w2
      FROM w{i - 1} w CROSS JOIN g{i} g CROSS JOIN nn
    ),
    acc{i} AS (
      SELECT COUNT(*) FILTER (WHERE (z > 0) = (y = 1.0)) AS n_correct
      FROM (SELECT y, {z} AS z FROM feat CROSS JOIN w{i} w)
    )
    """


_LOGREG_ORACLE = (
    f"""
    WITH tk AS (SELECT {_TOKS} AS toks FROM documents),
    rawfeat AS (
      SELECT CAST(len(list_filter(toks, tok -> list_contains({_STOPLIST}, tok)))
                  AS DOUBLE) / len(toks) AS r1,
             CAST(list_reduce(list_transform(toks, tok -> len(tok)),
                              (a, b) -> a + b) AS DOUBLE) / len(toks) AS r2
      FROM tk WHERE len(toks) > 0
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(r1 AS DECIMAL(38,18))) AS s1,
             SUM(CAST(r1 * r1 AS DECIMAL(38,18))) AS q1,
             SUM(CAST(r2 AS DECIMAL(38,18))) AS s2,
             SUM(CAST(r2 * r2 AS DECIMAL(38,18))) AS q2
      FROM rawfeat
    ),
    mom AS (
      SELECT n,
             CAST(ROUND(s1, 9) AS DOUBLE) / n AS m1,
             CAST(ROUND(q1, 9) AS DOUBLE) / n AS e1,
             CAST(ROUND(s2, 9) AS DOUBLE) / n AS m2,
             CAST(ROUND(q2, 9) AS DOUBLE) / n AS e2
      FROM stats
    ),
    norm AS (
      SELECT n, m1, sqrt(e1 - m1 * m1) AS sd1, m2, sqrt(e2 - m2 * m2) AS sd2
      FROM mom
    ),
    nn AS (SELECT n FROM norm),
    feat AS (
      SELECT CASE WHEN r1 > {_LOGREG_PLANT!r} THEN CAST(1.0 AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END AS y,
             (r1 - m1) / sd1 AS x1,
             (r2 - m2) / sd2 AS x2
      FROM rawfeat CROSS JOIN norm
    ),
    w0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
                  CAST(0.0 AS DOUBLE) AS w2)"""
    + "".join("," + _logreg_iter_sql(i) for i in range(1, _LOGREG_ITERS + 1))
    + f"""
    SELECT CAST(iter AS BIGINT) AS iter, w0, w1, w2,
           CAST(n_correct AS BIGINT) AS n_correct
    FROM ({" UNION ALL ".join(
        f"SELECT {i} AS iter, w.w0, w.w1, w.w2, a.n_correct FROM w{i} w CROSS JOIN acc{i} a"
        for i in range(1, _LOGREG_ITERS + 1)
    )})
    """
)


@register("quality_logreg_3iter", eager_build=True, oracle=_LOGREG_ORACLE)
def quality_logreg_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A TRAINED document classifier, CCNet-style (Wenzek et al. 2020
    train a fastText classifier to filter CommonCrawl; this is the
    distributed-training primitive behind that stage): standardize two
    text features (stopword ratio, mean token length) with one
    exact-sum stats pass, then batch gradient descent (lr=2, 3
    full-batch iterations) on a PLANTED boundary -- y = 1 iff the raw
    stopword ratio exceeds 0.06 -- published as the weight trajectory
    plus post-iteration training accuracy. The planted target is the
    point (like the densest-subgraph planted-clique test): the fixture
    text carries no real language signal (measured: converged logistic
    regression on lang = majority-class accuracy), so the verifiable
    claim is that the TRAINER recovers a known boundary -- accuracy
    rises from the ~52-56% majority baseline to ~92% in 3 iterations,
    pinned by the invariant test.

    The scale shape is the gradient-aggregate loop that trains any
    linear model at 100 TB: per epoch ONE map-side-combinable aggregate
    (three decimal-exact gradient sums, shuffle O(1)) + a 3-scalar
    driver update -- the missing sibling of the engine's power
    iteration (PCA), value iteration (coreness), and label propagation.
    Standardization is one more scalar-stats pass (classic GD
    preconditioning; unscaled, the intercept dominates and 3 steps
    stay at majority -- measured).

    NO transcendental libm anywhere: the link is the rational sigmoid
    s(z) = 0.5 + z/(2*(1+|z|)) (same monotone S-shape, exact double
    arithmetic), sqrt is IEEE-correctly-rounded, and every
    decimal->double conversion is quantized to 9 frac digits first
    (see _logreg_iter_sql), so weights and accuracies are
    BIT-IDENTICAL across engines with no rounding step. Accuracy uses
    pred = (z > 0), the exact decision boundary. eager_build: one
    stats collect + three bounded 1-row gradient collects + three
    accuracy counts (the CC-family scalar-potential contract).
    """
    from decimal import ROUND_HALF_UP, Decimal
    from math import sqrt

    grid = Decimal("1e-9")

    def to_f(dec) -> float:
        return float(dec.quantize(grid, rounding=ROUND_HALF_UP))

    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    staged = d.withColumn("__toks", tokens("text"))
    toks = F.col("__toks")
    n_tok = F.size(toks)
    raw = (
        staged.filter(n_tok > 0)
        .select(
            (
                F.size(F.filter(toks, lambda tk: tk.isin(*_STOPWORDS_LIST))).cast(
                    "double"
                )
                / n_tok
            ).alias("r1"),
            (
                F.aggregate(
                    F.transform(toks, lambda tk: F.length(tk)),
                    F.lit(0),
                    lambda a, b: a + b,
                ).cast("double")
                / n_tok
            ).alias("r2"),
        )
        .localCheckpoint()
    )
    st = raw.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r1").cast("decimal(38,18)")).alias("s1"),
        F.sum((F.col("r1") * F.col("r1")).cast("decimal(38,18)")).alias("q1"),
        F.sum(F.col("r2").cast("decimal(38,18)")).alias("s2"),
        F.sum((F.col("r2") * F.col("r2")).cast("decimal(38,18)")).alias("q2"),
    ).first()
    n = st["n"]
    m1, e1 = to_f(st["s1"]) / n, to_f(st["q1"]) / n
    m2, e2 = to_f(st["s2"]) / n, to_f(st["q2"]) / n
    sd1, sd2 = sqrt(e1 - m1 * m1), sqrt(e2 - m2 * m2)
    feat = raw.select(
        F.when(F.col("r1") > _LOGREG_PLANT, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
        ((F.col("r1") - F.lit(m1)) / F.lit(sd1)).alias("x1"),
        ((F.col("r2") - F.lit(m2)) / F.lit(sd2)).alias("x2"),
    ).localCheckpoint()
    w = (0.0, 0.0, 0.0)
    rows = []
    for i in range(1, _LOGREG_ITERS + 1):
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        s = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
        resid = F.col("y") - s
        g = feat.agg(
            F.sum(resid.cast("decimal(38,18)")).alias("g0"),
            F.sum((resid * F.col("x1")).cast("decimal(38,18)")).alias("g1"),
            F.sum((resid * F.col("x2")).cast("decimal(38,18)")).alias("g2"),
        ).first()
        w = tuple(w[k] + _LOGREG_LR * (to_f(g[k]) / n) for k in range(3))
        z_new = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        n_correct = feat.filter((z_new > 0) == (F.col("y") == 1.0)).count()
        rows.append((i, w[0], w[1], w[2], n_correct))
    return spark.createDataFrame(
        rows, "iter bigint, w0 double, w1 double, w2 double, n_correct bigint"
    )


_KM_K = 4  # init centroids = embeddings with vec_id < _KM_K
_KM_ROUNDS = 2


def _km_round_sql(r: int, last: bool) -> str:
    """One unrolled Lloyd round, fully relational: per-(vector, cell)
    squared L2 via a dim-join with a decimal-routed sum quantized to
    the 1e-9 grid (single-rounding decimal->double, logreg discipline),
    argmin assignment with (d2, cell) tie-break, and -- in non-final
    rounds -- per-(cell, dim) decimal-exact centroid means."""
    out = f"""
    dist{r} AS (
      SELECT x.vec_id, c.cell,
             CAST(ROUND(SUM(CAST((x.val - c.m) * (x.val - c.m)
                                 AS DECIMAL(38,18))), 9) AS DOUBLE) AS d2
      FROM dims x JOIN c{r - 1} c ON c.dim = x.dim
      GROUP BY x.vec_id, c.cell
    ),
    asg{r} AS (
      SELECT vec_id, cell, d2 FROM (
        SELECT vec_id, cell, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM dist{r}
      ) WHERE rn = 1
    )"""
    if not last:
        out += f""",
    c{r} AS (
      SELECT a.cell, x.dim,
             CAST(ROUND(SUM(CAST(x.val AS DECIMAL(38,18))), 9) AS DOUBLE)
               / COUNT(*) AS m
      FROM asg{r} a JOIN dims x ON x.vec_id = a.vec_id
      GROUP BY a.cell, x.dim
    )"""
    return out


_KM_ORACLE_BODY = f"""
    WITH dims AS (
      SELECT vec_id, i.i AS dim, CAST(embedding[i.i] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
    ),
    c0 AS (SELECT vec_id AS cell, dim, val AS m FROM dims WHERE vec_id < {_KM_K})""" + "".join(
    "," + _km_round_sql(r, last=(r == _KM_ROUNDS))
    for r in range(1, _KM_ROUNDS + 1)
)

_KM_ORACLE = (
    _KM_ORACLE_BODY
    + f"""
    SELECT CAST(cell AS BIGINT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           round(CAST(SUM(CAST(d2 AS DECIMAL(38,18))) AS DOUBLE), 6) AS inertia
    FROM asg{_KM_ROUNDS}
    GROUP BY cell
    """
)

# Counts-only final for the vectorized production path: memberships are
# engine-exact (the argmin flips only on a ~1e-12 d2 tie, never observed
# on the fixtures), but its double-fold inertia is NOT grid-quantized, so
# the value-hashed surface is the membership census.
_KM_VEC_ORACLE = (
    _KM_ORACLE_BODY
    + f"""
    SELECT CAST(cell AS BIGINT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM asg{_KM_ROUNDS}
    GROUP BY cell
    """
)


@register("kmeans_lloyd_exact2", oracle=_KM_ORACLE)
def kmeans_lloyd_exact2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's KMeans as PURE deterministic dataflow -- the
    oracle-paired exact twin of `embedding_ivf_kmeans_recall` (whose
    Spark-ML training is float-nondeterministic ACROSS engines, forcing
    a bounds-only oracle): k=4 centroids seeded from a fixed vector
    subset, two full Lloyd rounds, published as per-cluster membership
    counts and inertia. Everything stays relational -- distances are a
    dim-join + decimal-routed sum on the 1e-9 grid, assignments a
    per-vector argmin with an id tie-break, centroid updates
    decimal-exact per-(cell, dim) means -- so centroids never leave the
    cluster (NO driver collect at all; compare kmeans_centroids'
    bounded k-row collect) and every number value-hashes across
    engines. Empty clusters drop out of the centroid relation naturally.

    Scale shape: per round one k-way dim-join (n*k*d rows, the honest
    cost of Lloyd) feeding a map-side-combinable aggregate, then a
    (k*d)-group mean -- shuffles O(n*k) and O(k*d), no windows wider
    than k rows per vector. The decimal quantization envelope holds to
    ~3e6 vectors per cluster (scaled mantissas < 2^53); production
    KMeans at larger n uses the vectorized array-fold path
    (`operators.similarity.kmeans_lloyd_vectorized`, published as
    `kmeans_lloyd_vectorized_counts`; Spark-ML training in
    `embedding_ivf_kmeans_recall`) and THIS entry is its regression
    oracle on sampled data -- the exact/coded twin pattern of the
    _approx families, pinned assignment-for-assignment by
    tests/test_diagnostics_entries.py::test_kmeans_twins_membership_bridge.
    """
    emb = t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id", (F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("val")
    ).cache()
    c = dims.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cell"), "dim", F.col("val").alias("m")
    )
    from pyspark.sql import Window

    asg = None
    for r in range(1, _KM_ROUNDS + 1):
        dist = (
            dims.join(c, "dim")
            .groupBy("vec_id", "cell")
            .agg(
                F.round(
                    F.sum(
                        ((F.col("val") - F.col("m")) * (F.col("val") - F.col("m"))).cast(
                            "decimal(38,18)"
                        )
                    ),
                    9,
                )
                .cast("double")
                .alias("d2")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cell")
        asg = (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cell", "d2")
        )
        if r < _KM_ROUNDS:
            c = (
                asg.join(dims, "vec_id")
                .groupBy("cell", "dim")
                .agg(
                    (
                        F.round(F.sum(F.col("val").cast("decimal(38,18)")), 9)
                        .cast("double")
                        / F.count(F.lit(1))
                    ).alias("m")
                )
            )
    return asg.groupBy(F.col("cell").cast("bigint").alias("cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(F.sum(F.col("d2").cast("decimal(38,18)")).cast("double"), 6).alias(
            "inertia"
        ),
    )

@register("kmeans_lloyd_vectorized_counts", eager_build=True, oracle=_KM_VEC_ORACLE)
def kmeans_lloyd_vectorized_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION KMeans path, oracle-checked (r11 verdict ask #5):
    ``operators.similarity.kmeans_lloyd_vectorized`` runs the identical
    Lloyd spec as ``kmeans_lloyd_exact2`` (init = vectors with id < k,
    squared-L2 argmin with (d2, cell) tie-break, per-dim mean updates,
    two rounds) but keeps vectors WHOLE -- per-row array folds against
    centroid literals, one narrow codegen pass per round, ZERO shuffle
    of the corpus -- instead of the twin's n*k*d dim-join.  Publishing
    the per-cell membership census against the twin's own unrolled-CTE
    oracle proves the two paths compute the SAME clustering: the bench
    rides the vectorized plan, the dim-join twin is its regression
    oracle, and this entry is the bridge that pins them together (plus
    tests/test_diagnostics_entries.py::test_kmeans_twins_membership_bridge
    for the assignment-level comparison).

    Scale shape: per round one corpus scan (k folds + struct argmin per
    row) and one k-group, (k*d)-cell mean aggregate collected to the
    driver -- the assign_cells bounded-collect contract.  At 1e9 rows
    the dim-join twin shuffles n*k*d = 2.6e11 rows; this path shuffles
    k*d = 256 cells.

    Oracle surface: memberships only -- an assignment flip vs the twin
    needs two cells' true d2 gap inside the twin's 1e-9 quantization
    grid (the honest window, r12 advice #2: the oracle snaps d2 to the
    grid before its (d2, cell) argmin, so the comparison tolerates far
    more than this path's ~1e-12 fold noise; no fixture has two cells
    that close), while the double-fold inertia is deliberately NOT
    published (not grid-quantized; the exact twin publishes the
    value-hashed inertia)."""
    from ..operators.similarity import kmeans_lloyd_vectorized

    asg = kmeans_lloyd_vectorized(
        t(spark, sf_dir, "embeddings"), k=_KM_K, rounds=_KM_ROUNDS
    )
    return asg.groupBy(F.col("cell").cast("bigint").alias("cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )

_BPE_SEP = "\x1f"  # unit-separator: wraps every symbol, never in [a-z] words
_BPE_SS = _BPE_SEP * 2
_BPE_ROUNDS = 3
_BPE_WORD_MAX = 24  # skew guard: caps the per-row rewrite/fold cost


def _bpe_round_sql(r: int) -> str:
    """One unrolled greedy BPE merge round (see bpe_train_merges): pair
    counts over the symbol sequences, deterministic argmax (count DESC,
    pair ASC), and the wrapped-string rewrite.  Each symbol is wrapped
    in its own separators ('<US>a<US><US>b<US>'), so one occurrence of
    the merge pattern '<US>a<US><US>b<US>' never shares characters with
    the next and plain left-to-right non-overlapping replace() -- the
    IDENTICAL builtin on both engines -- implements exactly the greedy
    leftmost-first BPE merge ('aaa' + (a,a) -> 'aa','a')."""
    return f"""
    p{r} AS (
      SELECT pair, SUM(freq) AS cnt FROM (
        SELECT unnest(list_transform(range(1, len(l)),
                 i -> l[i] || '{_BPE_SS}' || l[i + 1])) AS pair, freq
        FROM (SELECT string_split(trim(seq, '{_BPE_SEP}'), '{_BPE_SS}') AS l,
                     freq FROM s{r - 1})
      ) GROUP BY pair
    ),
    b{r} AS (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1),
    s{r} AS (
      SELECT replace(s.seq, '{_BPE_SEP}' || b.pair || '{_BPE_SEP}',
                     '{_BPE_SEP}' || replace(b.pair, '{_BPE_SS}', '')
                     || '{_BPE_SEP}') AS seq, s.freq
      FROM s{r - 1} s CROSS JOIN b{r} b
    )"""


def _bpe_oracle() -> str:
    branches = "\n      UNION ALL\n".join(
        f"""      SELECT CAST({r} AS BIGINT) AS merge_rank,
             split_part(pair, '{_BPE_SS}', 1) AS left_sym,
             split_part(pair, '{_BPE_SS}', 2) AS right_sym,
             replace(pair, '{_BPE_SS}', '') AS merged,
             CAST(cnt AS BIGINT) AS pair_count FROM b{r}"""
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
    WITH wt AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents
      ) WHERE regexp_matches(word, '^[a-z]+$')
        AND length(word) BETWEEN 2 AND {_BPE_WORD_MAX}
      GROUP BY word
    ),
    s0 AS (SELECT regexp_replace(word, '(.)', '{_BPE_SEP}\\1{_BPE_SEP}', 'g')
             AS seq, freq FROM wt)
    {"".join("," + _bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))}
    SELECT * FROM (
{branches}
    )
    """


@register("bpe_train_merges", eager_build=True, oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED BPE TOKENIZER TRAINING, merge-step formulation (r11
    verdict ask #2): the text family consumes tokenizers everywhere
    (vocab coverage, token KL, entropy, Gopher gates) but nothing
    TRAINED one -- this entry runs the classic byte-pair-encoding merge
    loop (Sennrich et al. 2016) as pure distributed dataflow and
    publishes the first K=3 learned merge rules (rank, left, right,
    merged, exact pair count).

    Formulation -- the standard word-type trick plus a wrapped-string
    rewrite that keeps BOTH engines on the same builtin:
      1. One corpus pass folds documents to WORD TYPES with frequencies
         (lowercase, whitespace split, '^[a-z]+$', length 2.._BPE_WORD_MAX) --
         Heaps' law makes this relation sublinear in the corpus, and it
         is the ONLY thing the merge loop ever touches again.
      2. Each word becomes a symbol sequence encoded as a STRING with
         every symbol wrapped in its own unit separators:
         'the' -> '<US>t<US><US>h<US><US>e<US>'.  Wrapping means one
         occurrence of a merge pattern '<US>a<US><US>b<US>' never
         shares characters with the next, so the plain non-regex
         replace() builtin -- identical left-to-right non-overlapping
         semantics on Spark and DuckDB -- implements exactly the greedy
         leftmost-first BPE merge ('aaa' + (a,a) -> ['aa','a']), with
         no per-row UDF and no stateful scan.
      3. Per round: split to symbols, explode adjacent pairs weighted by
         word frequency, ONE map-side-combined aggregate (shuffle
         O(live pair vocabulary), never O(corpus)), a deterministic
         argmax (count DESC, pair ASC -- binary collation on both
         engines), and a NARROW rewrite of the cached word-type
         relation via the broadcast-literal winning pair.

    Scale shape: the corpus is scanned ONCE (step 1, shuffle O(word
    types)); each merge round costs one narrow scan of the word-type
    relation plus an O(pair-vocab) aggregate, so wall rides the corpus
    only through step 1 and the pair space stays bounded by the live
    vocabulary (10x probe row in docs/SCALEUP.md).  The argmax is a
    1-row TakeOrdered collect per round -- the CC-family bounded
    fixpoint-state contract; the _BPE_WORD_MAX cap bounds the per-row
    rewrite cost against pathological unbroken-text rows (skew
    discipline of the market-basket cap).  At a real 100 TB corpus the
    word-type relation is ~1e8 rows (GB-scale), so K=50k merge rounds
    would batch pair maintenance incrementally; the PER-ROUND dataflow
    -- count, argmax, rewrite -- is exactly this one.

    Cross-engine exactness: pair counts are exact integer sums; the
    tie-break compares plain strings under binary collation; the
    rewrite is the same builtin on both sides.  No floats anywhere.

    Reference parity: the reference has no text operators at all
    (DAG1:1-322); this extends the LLM-pipeline text family the way
    SURVEY.md section 6 lays out."""
    return spark.createDataFrame(
        _bpe_fit(spark, sf_dir),
        "merge_rank bigint, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    )


# (appId, realpath(sf_dir)) -> the localCheckpoint-pinned word-type
# DataFrame.  The checkpoint blocks are deliberately NEVER unpersisted
# while the session lives (train, curve, and raw-doc encode entries all
# re-scan the relation); memoizing bounds that to ONE pinned copy per
# (session, sf_dir) -- the relation is Heaps-sublinear in the corpus
# (~1e8 rows / GBs at 100 TB), driver-testdata-immutable, and dies with
# the session's block manager.  Dead-app keys are evicted on access.
_WT_MEMO: dict[tuple[str, str], DataFrame] = {}


def _bpe_word_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word-type/frequency relation with wrapped initial symbol
    sequences (step 1+2 of ``bpe_train_merges``), localCheckpoint-pinned
    for the per-round rescans and memoized per (session, sf_dir) so the
    train/curve/encode consumers share one pinned copy (see _WT_MEMO)."""
    key = _memo_key(spark, sf_dir)
    _evict_dead_apps(_WT_MEMO, key[0])
    hit = _WT_MEMO.get(key)
    if hit is not None:
        return hit
    d = rebalance_for_cpu(t(spark, sf_dir, "documents"))
    words = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
    )
    wt = (
        words.filter(F.col("word").rlike("^[a-z]+$"))
        .filter(F.length("word").between(2, _BPE_WORD_MAX))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(
            F.regexp_replace(
                "word", "(.)", f"{_BPE_SEP}$1{_BPE_SEP}"
            ).alias("seq"),
            "freq",
        )
        # the merge loop re-scans this relation once per round; pin it
        # (iterative-loop discipline -- otherwise each round re-reads
        # and re-aggregates the corpus)
        .localCheckpoint()
    )
    _WT_MEMO[key] = wt
    return wt


def _bpe_syms(seq: Column) -> Column:
    """Symbol array from a wrapped sequence string."""
    return F.split(F.btrim(seq, F.lit(_BPE_SEP)), _BPE_SS)


# (appId, realpath(sf_dir)) -> the K learned merge tuples -- the PCA-memo
# contract: deterministic driver-sized training state shared by the
# train/apply entries so the suite runs the merge loop once per session.
_BPE_MEMO: dict[tuple[str, str], list[tuple]] = {}


def _bpe_fit(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """Run the _BPE_ROUNDS greedy merge rounds (see ``bpe_train_merges``
    for the algorithm and scale contract); returns the learned
    [(rank, left, right, merged, count)] list.  Memoized per
    (session, sf_dir) like ``_PCA_MEMO``."""
    key = _memo_key(spark, sf_dir)
    _evict_dead_apps(_BPE_MEMO, key[0])
    hit = _BPE_MEMO.get(key)
    if hit is not None:
        return hit
    wt = _bpe_word_types(spark, sf_dir)
    seq = F.col("seq")
    merges: list[tuple] = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        syms = _bpe_syms(seq)
        # sequence(1, 0) DESCENDS in Spark -- guard fully-merged words
        idx = F.when(
            F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
        ).otherwise(F.expr("CAST(array() AS array<int>)"))
        pairs = F.transform(
            idx,
            lambda i: F.concat(
                F.element_at(syms, i),
                F.lit(_BPE_SS),
                F.element_at(syms, i + 1),
            ),
        )
        best = (
            wt.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .collect()[0]
        )
        pair, cnt = best["pair"], int(best["cnt"])
        left, right = pair.split(_BPE_SS)
        merges.append((rnd, left, right, left + right, cnt))
        # narrow rewrite: compose onto the cached relation, no new scan
        seq = F.replace(
            seq,
            F.lit(_BPE_SEP + pair + _BPE_SEP),
            F.lit(_BPE_SEP + left + right + _BPE_SEP),
        )
    _BPE_MEMO[key] = merges
    return merges


def _bpe_curve_oracle() -> str:
    branches = "\n      UNION ALL\n".join(
        f"""      SELECT CAST({r} AS BIGINT) AS n_merges,
             CAST(SUM(len(string_split(trim(seq, '{_BPE_SEP}'), '{_BPE_SS}'))
                      * freq) AS BIGINT) AS total_tokens FROM s{r}"""
        for r in range(0, _BPE_ROUNDS + 1)
    )
    return f"""
    WITH wt AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents
      ) WHERE regexp_matches(word, '^[a-z]+$')
        AND length(word) BETWEEN 2 AND {_BPE_WORD_MAX}
      GROUP BY word
    ),
    s0 AS (SELECT regexp_replace(word, '(.)', '{_BPE_SEP}\\1{_BPE_SEP}', 'g')
             AS seq, freq FROM wt)
    {"".join("," + _bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))}
    SELECT * FROM (
{branches}
    )
    """


@register("bpe_token_curve", eager_build=True, oracle=_bpe_curve_oracle())
def bpe_token_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained BPE merges -- the tokenizer-training curve:
    total corpus token count (sum over word types of symbols-per-word x
    frequency) after 0, 1, .., K merges.  Strictly decreasing by
    construction, and bounded per round by the published pair count:
    total_tokens[r] >= total_tokens[r-1] - pair_count[r], with EQUALITY
    whenever the winning merge has left_sym != right_sym (adjacent
    occurrences of such a pair cannot overlap).  When left == right,
    pair counts enumerate OVERLAPPING adjacent occurrences ('aaa'
    counts (a,a) twice) while greedy leftmost replace() merges
    non-overlapping ones ('aaa' -> ['aa','a'], one merge), so the round
    can remove fewer than pair_count tokens -- the law test pins the
    inequality and the left!=right equality case against
    ``bpe_train_merges``' published counts (r12 advice #1).  This is
    the curve a tokenizer-training pipeline monitors to pick its merge
    budget, and the ENCODE side of the train/apply pair.

    Distributed shape: the learned merges come from the session-memoized
    trainer (``_bpe_fit`` -- the _PCA_MEMO contract: the suite runs the
    merge loop once, train and apply entries share it); applying them is
    a NARROW chain of K replace() builtins composed onto one scan of the
    word-type relation, and all K+1 curve points ride that SINGLE pass
    as one map-side-combined aggregate (no shuffle wider than the
    word-type groupBy).  At 100 TB: encode cost is one corpus scan
    regardless of K -- exactly how production tokenizers amortize.

    Cross-engine exactness: token counts are exact integer sums of
    split-lengths; the rewrite chain is the proven wrapped-replace
    builtin (greedy leftmost, see ``bpe_train_merges``)."""
    merges = _bpe_fit(spark, sf_dir)
    wt = _bpe_word_types(spark, sf_dir)
    seq = F.col("seq")
    aggs = [
        F.sum(F.size(_bpe_syms(seq)).cast("bigint") * F.col("freq"))
        .cast("bigint")
        .alias("t0")
    ]
    for rnd, left, right, _merged, _cnt in merges:
        pair = left + _BPE_SS + right
        seq = F.replace(
            seq,
            F.lit(_BPE_SEP + pair + _BPE_SEP),
            F.lit(_BPE_SEP + left + right + _BPE_SEP),
        )
        aggs.append(
            F.sum(F.size(_bpe_syms(seq)).cast("bigint") * F.col("freq"))
            .cast("bigint")
            .alias(f"t{rnd}")
        )
    one = wt.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({r} AS BIGINT), t{r}" for r in range(0, _BPE_ROUNDS + 1)
    )
    return one.select(
        F.expr(
            f"stack({_BPE_ROUNDS + 1}, {stack_args}) "
            "AS (n_merges, total_tokens)"
        )
    )


_BPE_HELDOUT_MOD = 5  # held-out slice: doc_id % 5 = 0


def _bpe_encode_oracle() -> str:
    sep, ss = _BPE_SEP, _BPE_SS
    apply_ctes = "".join(
        f""",
    h{r} AS (
      SELECT h.doc_id, h.source, h.nc,
             replace(h.seq, '{sep}' || b.pair || '{sep}',
                     '{sep}' || replace(b.pair, '{ss}', '') || '{sep}')
               AS seq
      FROM h{r - 1} h CROSS JOIN b{r} b
    )"""
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
    WITH wt AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents
      ) WHERE regexp_matches(word, '^[a-z]+$')
        AND length(word) BETWEEN 2 AND {_BPE_WORD_MAX}
      GROUP BY word
    ),
    s0 AS (SELECT regexp_replace(word, '(.)', '{sep}\\1{sep}', 'g')
             AS seq, freq FROM wt)
    {"".join("," + _bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))},
    held AS (
      SELECT doc_id, source, word FROM (
        SELECT doc_id, source,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents WHERE doc_id % {_BPE_HELDOUT_MOD} = 0
      ) WHERE word <> '' AND NOT contains(word, '{sep}')
    ),
    h0 AS (
      SELECT doc_id, source, CAST(length(word) AS BIGINT) AS nc,
             regexp_replace(word, '(.)', '{sep}\\1{sep}', 'g') AS seq
      FROM held
    ){apply_ctes}
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(nc) AS BIGINT) AS n_chars,
           CAST(SUM(len(string_split(trim(seq, '{sep}'), '{ss}')))
                AS BIGINT) AS n_tokens
    FROM h{_BPE_ROUNDS}
    GROUP BY source
    """


@register("bpe_encode_heldout", eager_build=True, oracle=_bpe_encode_oracle())
def bpe_encode_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION BPE ENCODE over raw documents (r12 verdict ask #3):
    ``bpe_token_curve`` applies the learned merges back to the TRAINING
    word-type relation; a production tokenizer encodes unseen text.
    This entry applies the session-memoized merge rules (``_bpe_fit`` --
    train/apply share one merge loop per session) to a held-out
    document slice (doc_id % _BPE_HELDOUT_MOD = 0) -- EVERY whitespace
    token of those documents, not just the trainer's [a-z]{{2,24}} word
    types, so merges meet genuinely out-of-distribution symbols
    (numerals, punctuation-bearing tokens, words longer than the
    training cap) and simply don't fire where their pair is absent,
    exactly like a real tokenizer on unseen text.  Published per
    source: documents, words, characters (= pre-merge symbol count),
    and post-merge token count.

    Distributed shape: ONE scan of the held-out slice; the wrapped-
    symbol encode plus all K merge rewrites are a NARROW chain of
    regexp_replace + replace() builtins (whole-stage codegen, zero
    Python), and the rollup is one map-side-combined groupBy on source
    (shuffle O(sources); the distinct-doc count rides the same
    aggregate).  The merges come from the memo, so the suite pays the
    training loop once -- encode cost at 100 TB is one corpus scan
    regardless of K, the same amortization as ``bpe_token_curve``.

    Cross-engine exactness: the rewrite chain is the proven wrapped-
    replace builtin (greedy leftmost non-overlapping on BOTH engines,
    see ``bpe_train_merges``); counts are exact integer sums.  Tokens
    containing the \\x1f separator itself are excluded by an identical
    guard on both sides (never present in the testdata; the guard makes
    the wrapping injective by construction).

    Laws (tests/test_diagnostics_entries.py): n_tokens <= n_chars
    (merges only shrink), n_tokens >= n_words (every word keeps >= 1
    symbol), and the slice covers exactly the doc_id % 5 = 0 documents.

    Reference parity: no text operators in the reference (DAG1:1-322);
    completes the tokenizer train/apply pair for the LLM-pipeline text
    family."""
    merges = _bpe_fit(spark, sf_dir)
    d = rebalance_for_cpu(t(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % _BPE_HELDOUT_MOD == 0
    )
    w = d.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "word"
        ),
    ).filter((F.col("word") != "") & (~F.col("word").contains(_BPE_SEP)))
    seq = F.regexp_replace("word", "(.)", f"{_BPE_SEP}$1{_BPE_SEP}")
    for _rnd, left, right, _merged, _cnt in merges:
        pair = left + _BPE_SS + right
        seq = F.replace(
            seq,
            F.lit(_BPE_SEP + pair + _BPE_SEP),
            F.lit(_BPE_SEP + left + right + _BPE_SEP),
        )
    return (
        w.select(
            "doc_id",
            "source",
            F.length("word").cast("bigint").alias("nc"),
            F.size(_bpe_syms(seq)).cast("bigint").alias("nt"),
        )
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("nc").cast("bigint").alias("n_chars"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
    )


_DSIR_BUCKETS = 512  # hashed-ngram feature space (DSIR's vocab bound)
_DSIR_TARGET = "src7"  # fixed target slice; any source works
_DSIR_TOPK = 20


def _dsir_w_cte() -> str:
    """Shared DuckDB CTE computing per-document DSIR weights (ends with
    the ``w`` relation: doc_id, source, n_features, weight_nano) -- the
    common front of the top-k and selected-mixture oracles, kept in one
    place so both stay bit-identical to ``_dsir_doc_weights``."""
    b = _DSIR_BUCKETS
    lr = (
        f"ln((COALESCE(t.n_t, 0) + 1.0) / (nt.n + {b}))"
        f" - ln((r.n_r + 1.0) / (nr.n + {b}))"
    )
    # feature multiset per document = all unigrams + all consecutive
    # space-joined bigrams (Xie et al. 2023 s3), hashed into B buckets
    return f"""
    WITH tok AS (
      SELECT doc_id, source,
             {_hex_to_int_sql("md5(feat)", 1, 5)} % {b} AS bucket
      FROM (
        SELECT doc_id, source,
               unnest(list_concat(toks,
                 list_transform(range(1, len(toks)),
                   j -> toks[j] || ' ' || toks[j+1]))) AS feat
        FROM (SELECT doc_id, source, {_TOKS} AS toks FROM documents)
      )
    ),
    raw_b AS (SELECT bucket, COUNT(*) AS n_r FROM tok GROUP BY 1),
    tgt_b AS (SELECT bucket, COUNT(*) AS n_t FROM tok
              WHERE source = '{_DSIR_TARGET}' GROUP BY 1),
    nr AS (SELECT SUM(n_r) AS n FROM raw_b),
    nt AS (SELECT COALESCE(SUM(n_t), 0) AS n FROM tgt_b),
    lr AS (
      SELECT r.bucket,
             CAST(floor(({lr}) * 1000000000.0 + 0.5) AS BIGINT) AS lr_nano
      FROM raw_b r LEFT JOIN tgt_b t USING (bucket)
      CROSS JOIN nr CROSS JOIN nt
    ),
    w AS (
      SELECT tok.doc_id, tok.source,
             CAST(COUNT(*) AS BIGINT) AS n_features,
             CAST(SUM(lr.lr_nano) AS BIGINT) AS weight_nano
      FROM tok JOIN lr USING (bucket)
      GROUP BY 1, 2
    )
    """


def _dsir_oracle() -> str:
    return (
        _dsir_w_cte()
        + f"""
    SELECT doc_id, source, n_features, weight_nano FROM w
    ORDER BY weight_nano DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """
    )


@register("dsir_importance_topk", oracle=_dsir_oracle())
def dsir_importance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA SELECTION VIA IMPORTANCE RESAMPLING (DSIR, Xie et al. 2023)
    -- the standard pretraining-data selection technique the curation
    family still lacked: score every raw document by how much more
    likely its hashed-ngram features are under a TARGET distribution
    than under the raw pool, and keep the top scorers.  Features are
    the paper's HASHED N-GRAMS (Xie et al. 2023 s3; r12 verdict ask
    #6, closed r14): each document's feature multiset is all UNIGRAMS
    plus all consecutive space-joined BIGRAMS in document token order,
    each hashed md5 -> first 5 hex nibbles -> mod B = _DSIR_BUCKETS --
    the DSIR trick that bounds the vocab at B regardless of corpus
    size; the target slice is the fixed source _DSIR_TARGET (in
    production: the high-quality seed corpus);
    per-bucket log-ratios use Laplace-smoothed probabilities
    ln((n_t+1)/(N_t+B)) - ln((n_r+1)/(N_r+B)); a document's importance
    weight is the sum of its features' bucket log-ratios.  Published:
    the top-_DSIR_TOPK documents by (weight DESC, doc_id) with their
    feature counts and exact nano-snapped integer weights.

    Distributed shape: ONE feature pass (one explode to ~2x tokens --
    unigrams + bigrams -- still O(corpus tokens)) feeds two
    bucket-grain aggregates (shuffle O(B) = _DSIR_BUCKETS groups,
    map-side combined -- the raw count reuses the same relation, never
    a second raw-feature pass at the bucket grain); the per-bucket
    log-ratio table is B rows, BROADCAST back onto the feature stream;
    per-doc weights are one doc-keyed aggregate (shuffle O(docs));
    selection is a TakeOrdered top-k.  Nothing anywhere is wider than
    the corpus feature stream, and the model state (B log-ratios) is
    bounded by construction -- at 100 TB the score pass is the same
    one scan production DSIR does.

    Cross-engine exactness: bucket hashing is the shared md5-nibble
    idiom (_cm_bucket_col / _hex_to_int_sql); counts are exact
    integers; both ln arguments are single divisions of exact operands
    (bit-identical IEEE inputs); each bucket's log-ratio snaps to
    integer nano-units before any cross-row arithmetic, so per-doc
    weights are EXACT integer sums and the ranking has no float
    boundary (the bigram_logprob_quality libm discipline: a 1-ulp ln
    divergence could only flip a weight sitting exactly on a snap
    boundary -- never observed; the sweep would catch it loudly).

    Reference parity: no selection/curation operators in the reference
    (DAG1:1-322); completes the curation family alongside
    source_mixture_weights (how much per source), token_kl_by_source
    (how different), and the quality/contamination gates."""
    weights = _dsir_doc_weights(
        rebalance_for_cpu(t(spark, sf_dir, "documents")), _DSIR_TARGET
    )
    return weights.orderBy(F.col("weight_nano").desc(), "doc_id").limit(
        _DSIR_TOPK
    )


def _dsir_doc_weights(d: DataFrame, target: str) -> DataFrame:
    """Per-document DSIR importance weights over a documents-shaped
    frame (doc_id, source, text) -- exposed separately so tests can
    drive it on planted synthetic corpora (the greedy_densest_subgraph
    pattern); see ``dsir_importance_topk`` for the algorithm and the
    scale contract.  Features are unigrams + consecutive bigrams
    (space-joined, document token order), per Xie et al. 2023 s3.
    Returns (doc_id, source, n_features, weight_nano)."""
    b = _DSIR_BUCKETS
    toks = tokens("text")
    tok = (
        d.select(
            "doc_id",
            "source",
            # unigram features ++ bigram features, one array concat --
            # explode_OUTER so InferFiltersFromGenerate cannot push the
            # tokenize+shingle expression into the scan (the
            # dupspan_coverage finding)
            F.explode_outer(
                F.concat(toks, word_ngrams(toks, n=2, distinct=False))
            ).alias("feat"),
        )
        .filter(F.col("feat").isNotNull())
        .select(
            "doc_id",
            "source",
            (
                F.conv(F.substring(F.md5("feat"), 1, 5), 16, 10).cast("bigint")
                % b
            ).alias("bucket"),
        )
        # staged ONCE via lazy localCheckpoint: THREE consumers (raw
        # bucket counts, target bucket counts, the final doc-keyed
        # score join) would otherwise each re-run the tokenize +
        # bigram-shingle + md5 explode (warm min-of-3 at sf0.1:
        # 4.46 -> 4.17 s -- modest locally where the explode is cheap,
        # structural at scale where it is two fewer corpus passes).
        # The staged relation is the NARROW (doc_id, source,
        # bucket) feature stream -- bytes-per-feature far below the
        # text it came from; at 100 TB this is the standard
        # featurize-once materialization (MEMORY_AND_DISK blocks),
        # or drop the checkpoint and recompute if storage is tighter
        # than compute -- correctness is unaffected either way.
        .localCheckpoint(eager=False)
    )
    # one token pass, staged at the (doc, bucket)-grain consumers' base.
    # r15 (guide §2.3/§2.4): raw and target bucket counts FUSE into one
    # aggregate over the staged stream -- n_t is a conditional count of
    # the same rows, so the old second scan + second shuffle + the
    # raw_b LEFT JOIN tgt_b assembly disappear (a bucket with no target
    # rows now counts n_t = 0 exactly where the old plan coalesced the
    # join's NULL to 0; the log-ratio arithmetic below is the identical
    # expression tree on identical values -- bit-identical weights).
    bc = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_r"),
        F.count(F.when(F.col("source") == target, F.lit(1))).alias("n_t"),
    )
    tot = bc.agg(
        F.sum("n_r").alias("nr_n"),
        F.coalesce(F.sum("n_t"), F.lit(0)).alias("nt_n"),
    )
    lr = (
        bc.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                (
                    F.log(
                        (F.col("n_t") + F.lit(1.0))
                        / (F.col("nt_n") + F.lit(float(b)))
                    )
                    - F.log(
                        (F.col("n_r") + F.lit(1.0))
                        / (F.col("nr_n") + F.lit(float(b)))
                    )
                )
                * F.lit(1_000_000_000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lr_nano"),
        )
    )
    return (
        tok.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
            F.sum("lr_nano").cast("bigint").alias("weight_nano"),
        )
    )


_DSIR_KEEP_DENOM = 20  # select the top 1/20 (5%) of documents by weight


def _dsir_mixture_oracle() -> str:
    d = _DSIR_KEEP_DENOM
    return (
        _dsir_w_cte()
        + f"""
    , ranked AS (
      SELECT source, weight_nano,
             ROW_NUMBER() OVER (ORDER BY weight_nano DESC, doc_id) AS rk,
             COUNT(*) OVER () AS n
      FROM w
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk <= FLOOR((n + {d - 1}) / {d}.0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           CAST(SUM(CASE WHEN rk <= FLOOR((n + {d - 1}) / {d}.0)
                    THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS selection_rate
    FROM ranked GROUP BY source
    """
    )


@register(
    "dsir_selected_mixture",
    eager_build=True,
    oracle=_dsir_mixture_oracle(),
)
def dsir_selected_mixture(
    spark: SparkSession, sf_dir: str, cuts: list[float] | None = None
) -> DataFrame:
    """DSIR APPLY side: the per-source mixture of the SELECTED set.
    ``dsir_importance_topk`` publishes the top documents; production
    DSIR's artifact is a selected corpus slice and the first question a
    curator asks of it is "what did selection do to the source mix".
    This entry deterministically keeps the top ceil(n / _DSIR_KEEP_DENOM)
    documents by (weight DESC, doc_id) -- the noise-free variant of Xie
    et al. 2023's Gumbel-top-k resampling (randomized weighted sampling
    is covered by ``weighted_sample_ares``; a cross-engine-exact entry
    cannot carry an RNG) -- and publishes per source: document count,
    selected count, and the selection rate.

    The interesting part at 100 TB is the GLOBAL top-fraction cut: a
    naive ROW_NUMBER over the full weight relation is a single-partition
    window.  This plan ranks distributedly instead -- the house
    cutpoint discipline (``gini_user_spend``): broadcast
    percentile_approx boundaries over value = -weight_nano make the
    slice id a deterministic per-row function, per-slice counts
    prefix-sum on the BOUNDED slice grid (<= 33 rows), and a
    within-slice row_number (window PARTITIONED by slice, ordered
    weight DESC, doc_id) plus the slice offset reconstructs the exact
    global rank with no unpartitioned window anywhere.  The keep
    threshold ceil(n/d) = FLOOR((n + d - 1) / d.0) folds from a
    broadcast one-row count -- exact in IEEE doubles on both engines
    (an integer / 20.0 cannot round across an integer boundary).  The
    weight pass itself is the ``_dsir_doc_weights`` contract: O(B)
    bucket aggregates + one doc-keyed rollup.

    EAGER build caveat (the gini/KS pattern): collecting cutpoints runs
    one job at plan construction; explain-only callers pass ``cuts``.
    The weight relation is staged ONCE via a lazy localCheckpoint (the
    cluster_aware_split idiom): it feeds three consumers -- the
    cutpoint collect, the sliced rank, and the total count -- and
    without staging each would recompute the full O(corpus-features)
    weight pass (measured: 11.4 s -> the staged plan pays one).

    Reference parity: no curation operators in the reference
    (DAG1:1-322); completes the DSIR train/apply pair alongside the
    BPE and span-dedup families' train/apply pairs."""
    w = _dsir_doc_weights(
        rebalance_for_cpu(t(spark, sf_dir, "documents")), _DSIR_TARGET
    ).localCheckpoint(eager=False)
    pv = w.select((-F.col("weight_nano")).cast("double").alias("value"))
    if cuts is None:
        cuts = collect_value_cutpoints(pv, 32)
    sliced = w.withColumn(
        "value", (-F.col("weight_nano")).cast("double")
    ).withColumn("slice", value_slice_pid(cuts))
    per_slice = sliced.groupBy("slice").agg(F.count(F.lit(1)).alias("cnt"))
    w_grid = Window.orderBy("slice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_slice.select(
        "slice",
        F.coalesce(F.sum("cnt").over(w_grid), F.lit(0)).alias("offset"),
    )
    w_in = Window.partitionBy("slice").orderBy(
        F.col("weight_nano").desc(), "doc_id"
    )
    ranked = sliced.join(F.broadcast(offsets), "slice").withColumn(
        "rk", F.row_number().over(w_in) + F.col("offset")
    )
    tot = w.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    sel = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "is_sel",
        (
            F.col("rk")
            <= F.floor(
                (F.col("n") + F.lit(_DSIR_KEEP_DENOM - 1))
                / F.lit(float(_DSIR_KEEP_DENOM))
            )
        ).cast("int"),
    )
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("is_sel").cast("bigint").alias("n_selected"),
        (
            F.sum("is_sel").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("selection_rate"),
    )
