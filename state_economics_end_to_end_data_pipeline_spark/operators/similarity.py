"""Similarity search over embedding columns (north-star extensions).

Embeddings are ``array<float>`` columns. Two paths:

- **Brute-force cosine top-k** (the correctness baseline): cross join of a
  small query set against the corpus; the dot product is a JVM-side
  ``zip_with`` + left-fold (no UDF, no explode-shuffle). At scale the
  query side is broadcast, so cost is one pass over the corpus per batch
  of queries.
- **Sign-LSH bucketing** (the scale path): bucket vectors by the sign bits
  of selected dimensions (a deterministic random-hyperplane family for
  cosine similarity with axis-aligned planes); candidate pairs share a
  bucket, shrinking the pair space by ~2^bits before exact verification.

Determinism note: dot products fold left-to-right over the array -- the
same IEEE operation order in every engine -- so results are bit-identical
to the DuckDB oracle's list_reduce, with no decimal detour needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, computed in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm2(a: Column) -> Column:
    """Squared L2 norm (sequential fold, double)."""
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays. THREE O(d) folds per call
    (dot + both norms): fine for one-shot row expressions, but on a
    pair-generating path a row's norm is re-folded once per PAIR -- use
    ``cosine_prenormed`` with per-row staged squared norms there.
    ``try_divide`` so a zero vector yields NULL (undefined cosine)
    instead of an ANSI DIVIDE_BY_ZERO crash -- zero embeddings DO occur
    in real corpora; for non-degenerate inputs the value is the plain
    division bit-for-bit."""
    return F.try_divide(dot(a, b), F.sqrt(norm2(a) * norm2(b)))


def cosine_prenormed(a: Column, b: Column, n2a: Column, n2b: Column) -> Column:
    """Cosine from pre-staged SQUARED norms: one dot fold per pair
    instead of three -- the hot-path form for candidate verification,
    where a corpus row joins into many pairs but its norm is constant.
    Staging norm2 (not the sqrt) keeps the expression tree's value
    bit-identical to ``cosine``: the same sqrt(n2a * n2b) product is
    evaluated either way (and the same NULL-on-zero-vector guard)."""
    return F.try_divide(dot(a, b), F.sqrt(n2a * n2b))


def _py_norm2(vec) -> float:
    """Driver-side squared norm with the SAME sequential left-fold IEEE
    order as the ``norm2`` expression (and the DuckDB list_reduce), so a
    literal-embedded centroid norm is bit-identical to the engine's."""
    acc = 0.0
    for x in vec:
        xd = float(x)
        acc += xd * xd
    return acc


def _sql_dlit(x: float) -> str:
    """SQL text of one exact double literal: ``repr`` round-trips the
    IEEE value and a string->double cast is the exact inverse parse
    (constant-folded to the identical Literal at analysis).  Non-finite
    values are mapped explicitly: Python repr says 'inf'/'nan', which
    Spark's string->double cast does NOT accept ('Infinity'/'NaN' are
    the accepted spellings) -- degenerate upstream math (an empty
    cluster's centroid, say) must embed the value F.lit would have, not
    NULL/AnalysisException."""
    xf = float(x)
    if xf != xf:
        return "CAST('NaN' AS DOUBLE)"
    if xf == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if xf == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"CAST('{xf!r}' AS DOUBLE)"


def _sql_darr(vals) -> str:
    """SQL text of a literal array<double>."""
    return "array(" + ", ".join(_sql_dlit(v) for v in vals) + ")"


def _sql_dot_lit(vec_sql: str, vals) -> str:
    """SQL text of ``dot(vec, lit(vals))`` -- the same sequential-fold
    expression tree the Column builder makes, parsed JVM-side in one
    call.  r14: the per-centroid/per-code Column builders cost ~0.5-1.5s
    of DRIVER py4j chatter per PLAN BUILD for the ANN operators (k
    centroids x d dims of literals); the string build is milliseconds
    and analyzes to the identical plan (guide §7.3 -- plan construction
    itself was the bottleneck, verified bit-identical by exceptAll)."""
    return (
        f"aggregate(zip_with({vec_sql}, {_sql_darr(vals)}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _sql_d2_lit(vec_sql: str, vals) -> str:
    """SQL text of the squared-L2 fold against a literal vector (the
    ``pq_encode``/``kmeans_lloyd_vectorized`` distance) -- see
    ``_sql_dot_lit`` on why a string build."""
    return (
        f"aggregate(zip_with({vec_sql}, {_sql_darr(vals)}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def l2_normalize(a: Column, nrm: Column | None = None) -> Column:
    """Unit vector (array<double>) -- pure JVM transform/aggregate; the
    production path for normalization (the pandas_udf variant in
    plans/extensions.py exists to exercise the Arrow boundary). The norm
    is the same sequential left-fold as ``dot``, so components are
    bit-identical to the Python and DuckDB forms.

    ``nrm`` MUST be a pre-projected norm column on the hot path: Catalyst
    does not CSE through higher-order-function lambdas, so an inline norm
    subtree is re-evaluated for EVERY element -- O(d^2) per row (~1M ops
    at d=1024). Stage it with ``with_l2_normalized`` (or your own
    ``withColumn``) so the lambda sees a cheap attribute reference. The
    inline fallback (``nrm=None``) exists only for tiny d / throwaway
    expressions. Zero vectors pass through unchanged (norm clamped to 1
    so 0/1 = 0 -- no NaN/Inf components)."""
    if nrm is None:
        nrm = F.sqrt(norm2(a))
    safe = F.when(nrm == 0.0, F.lit(1.0)).otherwise(nrm.cast("double"))
    return F.transform(a, lambda x: x.cast("double") / safe)


def with_l2_normalized(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "unit_vec",
) -> DataFrame:
    """DataFrame-level L2 normalization, the scale-safe form: the norm is
    projected as its own column FIRST, then referenced (not recomputed)
    inside the per-element transform -- one O(d) fold + one O(d) map per
    row instead of the O(d^2) inline shape. The staged column is referenced
    twice downstream (zero-guard + divisor), which also keeps Catalyst's
    CollapseProject from inlining the non-cheap fold back into the lambda
    (same staging trick as ``minhash_signatures``, operators/dedup.py)."""
    nrm_col = f"__l2nrm_{vec_col}"
    staged = df.withColumn(nrm_col, F.sqrt(norm2(F.col(vec_col))))
    return staged.withColumn(
        out_col, l2_normalize(F.col(vec_col), F.col(nrm_col))
    ).drop(nrm_col)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k neighbors for each query vector.

    ``queries`` is broadcast (query batches are small by construction);
    ranking uses row_number with an id tie-break so top-k is total-ordered
    and reproducible. Squared norms are staged per ROW before the join --
    each corpus vector is scored against every query, so folding its norm
    per pair would cost |queries| redundant O(d) folds per corpus row."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm2(F.col(vec_col)).alias("q_n2"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2(F.col(vec_col)).alias("c_n2"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_prenormed(
                F.col("q_vec"), F.col("c_vec"), F.col("q_n2"), F.col("c_n2")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def matryoshka_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    prefix_dim: int,
    k: int = 5,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka TWO-STAGE serving (Kusupati et al. 2022; r13 verdict
    ask #3): stage 1 searches the cheap ``prefix_dim``-dim prefix of
    every vector for a per-query SHORTLIST of m*k candidates; stage 2
    reranks ONLY the shortlist with exact full-dimension cosine and
    keeps the top k.  Returns (query_id, neighbor_id, cos_sim, rank)
    where cos_sim is the FULL-dimension similarity.

    Law (tests/test_diagnostics_entries.py): rerank recall@k vs the
    exact full-dim top-k is >= prefix-only recall@k -- the shortlist
    contains the prefix top-k, and within the shortlist every true
    top-k member outranks every non-member under exact full cosine (the
    same (cos DESC, id) total order as the baseline), so reranking can
    only PROMOTE true neighbors, never demote them.

    Scale shape: stage 1 is the ``cosine_topk`` brute plan over the
    prefix slice -- one corpus scan reading prefix_dim/d of the vector
    bytes (the memory-bandwidth saving MRL serving exists for; swap an
    IVF index over the prefix at 100 TB, the shortlist contract is
    unchanged).  The shortlist is O(queries * m * k) rows -- BOUNDED by
    the query batch, so it BROADCASTS onto the corpus scan that fetches
    full candidate vectors (keyed equi-join on the vector id, no
    shuffle of the corpus); stage 2 scores |queries| * m * k pairs and
    ranks inside a per-query window over <= m*k rows.  The full-dim
    fold never touches vectors outside the shortlist."""
    trunc = F.slice(F.col(vec_col), 1, prefix_dim)
    shortlist = cosine_topk(
        corpus.select(F.col(id_col), trunc.alias(vec_col)),
        queries.select(F.col(id_col), trunc.alias(vec_col)),
        k=m * k,
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    cand = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2(F.col(vec_col)).alias("c_n2"),
    ).join(F.broadcast(shortlist), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm2(F.col(vec_col)).alias("q_n2"),
    )
    scored = cand.join(F.broadcast(q), "query_id").select(
        "query_id",
        "neighbor_id",
        cosine_prenormed(
            F.col("q_vec"), F.col("c_vec"), F.col("q_n2"), F.col("c_n2")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def sign_lsh_bucket(vec: Column, bits: int = 4) -> Column:
    """Sign-LSH bucket id from the first ``bits`` dimensions' signs."""
    out = F.lit(0).cast("bigint")
    for d in range(bits):
        bit = F.when(F.element_at(vec, d + 1) > 0, F.lit(2 ** d)).otherwise(F.lit(0))
        out = out + bit.cast("bigint")
    return out


def neardup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    min_cosine: float = 0.9,
) -> DataFrame:
    """Near-duplicate vector pairs: sign-LSH blocking then exact cosine
    verify within buckets. The join key is the bucket id -- pair count drops
    ~2^bits vs all-pairs; raise ``bits`` as the corpus grows. Squared
    norms are staged per ROW before the self-join: inside a bucket each
    vector meets O(bucket) partners, so the per-pair fold count drops
    from three to one (the dot)."""
    with_bucket = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm2(F.col(vec_col)).alias("n2"),
        sign_lsh_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    a = with_bucket.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
        F.col("n2").alias("n2_a"), "bucket",
    )
    b = with_bucket.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
        F.col("n2").alias("n2_b"), "bucket",
    )
    return (
        a.join(b, "bucket", "inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_prenormed(
                F.col("vec_a"), F.col("vec_b"), F.col("n2_a"), F.col("n2_b")
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cosine)
    )


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: each vector's ``n_probe`` nearest centroids by
    cosine. Returns (id, vec, cell, probe_rank); ties broken on cell id.

    Centroids are driver-sized by definition (a KMeans model lives on the
    driver), so they are collected into literal expressions and the
    assignment is a fully NARROW per-row computation -- zero shuffle of
    the corpus. (A crossJoin + per-id rank window would shuffle the whole
    corpus by id; at 100 TB that shuffle dominates the index build.)
    Sorting key is (-cos, cell): cos desc, cell asc on ties.

    Fold budget: the row's squared norm is staged ONCE (not re-folded per
    centroid) and each centroid's squared norm is computed driver-side
    with the same sequential IEEE fold (``_py_norm2``) and embedded as a
    literal -- so scoring k centroids costs k dot folds + 1 norm fold per
    row, instead of 3k folds."""
    cents = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("c_vec")
    ).collect()
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm2(F.col(vec_col)).alias("__n2"),
    )
    # One JVM-parsed expression for the whole scored array (see
    # _sql_dot_lit: the per-centroid Column builder dominated plan-build
    # time).  try_divide yields NULL for a zero (degenerate) vector or
    # centroid, and NULL would sort FIRST in the ascending struct sort
    # below -- electing the degenerate centroid as nearest for every
    # row.  Coalesce to +inf so degenerate entries rank strictly last.
    structs = ", ".join(
        "named_struct('neg_cos', coalesce(-try_divide("
        + _sql_dot_lit("vec", [float(x) for x in r["c_vec"]])
        + f", sqrt(__n2 * {_sql_dlit(_py_norm2(r['c_vec']))})), "
        "CAST('Infinity' AS DOUBLE)), "
        f"'cell', CAST({int(r['cell'])} AS BIGINT))"
        for r in cents
    )
    probes = F.expr(f"slice(sort_array(array({structs})), 1, {int(n_probe)})")
    exploded = v.select(
        "id", "vec", F.posexplode(probes).alias("pos", "probe")
    )
    return exploded.select(
        "id", "vec",
        F.col("probe.cell").alias("cell"),
        (F.col("pos") + 1).alias("probe_rank"),
    )


def pq_encode(
    df: DataFrame,
    codebook: dict[tuple[int, int], list[float]],
    m: int,
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Product quantization encode: split each d-dim vector into ``m``
    subvectors of ``sub_dim`` dims; per subspace, the code is the
    codebook entry with minimum squared L2 distance (tie-break on code
    id). Returns one row per (vector, subspace): id, subspace, code,
    d2 (the subspace quantization error).

    The compression story at 100 TB: a d=1024 float32 vector (4 KB)
    becomes m 1-byte codes (m bytes, ~500x), and approximate distances
    are code-table lookups (ADC) instead of full-vector math. The
    codebook is driver-sized by definition (m x k subvectors -- trained
    per-subspace KMeans in production, any deterministic table here);
    encoding is a fully narrow per-row pass: per subspace, k sequential
    O(sub_dim) folds against literal subvectors, engine-portable
    bit-for-bit (same left-to-right IEEE order as the DuckDB oracle).

    ``keep`` names extra input columns to carry through unchanged --
    e.g. the IVF cell id, so the codes come out already in
    inverted-list layout without a self-join back onto the corpus."""
    codes_per_sub: dict[int, list[tuple[int, list[float]]]] = {}
    for (s, c), vec in sorted(codebook.items()):
        codes_per_sub.setdefault(s, []).append((c, vec))

    # One JVM-parsed expression for the whole (subspace, code, d2) array
    # (see _sql_dot_lit: the m x k Column-built folds dominated
    # plan-build time).  The per-subspace argmin struct is routed
    # through transform(array(best), ...) so the sort_array(...) -- and
    # with it all k distance folds -- is evaluated ONCE per row and
    # subspace; the old Column form referenced best['code'] and
    # best['d2'] separately, duplicating every fold (HOF lambdas are
    # excluded from Catalyst CSE).  Values are bit-identical.
    rows = []
    for s in range(m):
        sub = f"slice(`{vec_col}`, {s * sub_dim + 1}, {sub_dim})"
        scored = ", ".join(
            f"named_struct('d2', {_sql_d2_lit(sub, vec)}, "
            f"'code', CAST({int(c)} AS BIGINT))"
            for c, vec in codes_per_sub[s]
        )
        best = f"sort_array(array({scored}))[0]"
        rows.append(
            f"transform(array({best}), b -> named_struct("
            f"'subspace', CAST({s} AS BIGINT), "
            f"'code', b.code, 'd2', b.d2))[0]"
        )
    q = F.expr("array(" + ", ".join(rows) + ")")
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep], F.explode(q).alias("q")
    ).select(id_col, *keep, "q.subspace", "q.code", "q.d2")


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    train_fraction: float = 1.0,
) -> DataFrame:
    """Train IVF centroids with Spark ML KMeans (the production path the
    fixed-subset test centroids stand in for). Returns a (id, vec) frame
    shaped exactly like ``assign_cells``/``ivf_topk`` expect, with cell
    ids 0..k-1.

    Scale posture: KMeans is iterative over the TRAINING set only --
    at 100 TB train on a sample (``train_fraction``; centroid quality
    converges long before the full corpus is seen) and assign the full
    corpus with the one narrow ``assign_cells`` pass. The model's k
    centers are driver-sized by definition; they come back through the
    (tiny) fitted model, never a corpus collect. Seeded, so the trained
    index is reproducible for a fixed input."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = df if train_fraction >= 1.0 else df.sample(train_fraction, seed=seed)
    feats = train.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    spark = df.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, f"{id_col} bigint, {vec_col} array<double>")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single nearest
    cell; each query probes its ``n_probe`` nearest cells and runs exact
    cosine only inside them. The candidate space shrinks by ~n_cells/n_probe
    vs brute force; the cell join is an equi-join on cell id (shuffle or
    broadcast, AQE's choice), never a cartesian.

    ``centroids`` is any (id, vec) table -- production trains it with
    Spark ML KMeans on a sample; tests use a deterministic fixed subset so
    the result is oracle-checkable. Recall is approximate by construction
    (a neighbor whose cell the query does not probe is missed) but the
    output is exactly determined by (centroids, n_probe, k)."""
    corpus_cells = assign_cells(corpus, centroids, 1, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec"),
        norm2(F.col("vec")).alias("c_n2"), "cell",
    )
    query_cells = assign_cells(queries, centroids, n_probe, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("vec").alias("q_vec"),
        norm2(F.col("vec")).alias("q_n2"), "cell",
    )
    cand = (
        corpus_cells.join(query_cells, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine_prenormed(
                F.col("q_vec"), F.col("c_vec"), F.col("q_n2"), F.col("c_n2")
            ).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def jl_projection_matrix(
    d_in: int, d_out: int, seed_tag: str = "jl"
) -> list[list[float]]:
    """Deterministic +-1 random-projection matrix (Achlioptas-style signs)
    derived from md5 of (seed_tag, row, col) -- reproducible bit-for-bit
    in ANY engine that has md5, which is what lets the DuckDB oracle
    rebuild the identical matrix. Scaled by 1/sqrt(d_out) so expected
    squared distances are preserved (Johnson-Lindenstrauss)."""
    import hashlib
    import math

    scale = 1.0 / math.sqrt(d_out)
    return [
        [
            (
                scale
                if int(
                    hashlib.md5(f"{seed_tag}:{j}:{i}".encode()).hexdigest()[0], 16
                )
                % 2
                == 0
                else -scale
            )
            for i in range(d_in)
        ]
        for j in range(d_out)
    ]


def random_project(
    df: DataFrame,
    d_in: int,
    d_out: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_tag: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: embed d_in-dim vectors
    into d_out dims with a deterministic +-1/sqrt(d_out) matrix.
    Pairwise distances are preserved within (1 +- eps) w.h.p. for
    d_out = O(log n / eps^2) -- the standard cheap dimensionality cut
    before ANN indexing or clustering.

    Scale shape: fully NARROW -- the matrix is d_out x d_in literals
    (driver-sized by definition), each output dim is one sequential
    zip_with/aggregate fold over the row's vector, zero shuffle. At
    100 TB this is the pass that turns 4 KB float rows into d_out
    doubles BEFORE anything shuffles them; every downstream
    shuffle/join moves d_in/d_out times fewer bytes. Folds are
    left-to-right in double (same IEEE order as the DuckDB oracle's
    list_reduce), so projections are bit-identical across engines."""
    mat = jl_projection_matrix(d_in, d_out, seed_tag)
    dims = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.lit(row),
                lambda x, r: x.cast("double") * r,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for row in mat
    ]
    return df.select(F.col(id_col), F.array(*dims).alias("proj"))


def kmeans_lloyd_vectorized(
    df: DataFrame,
    k: int = 4,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's KMeans with ARRAY-FOLD distances -- the production-shaped
    twin of ``plans.extensions.kmeans_lloyd_exact2`` under the IDENTICAL
    spec (init centroids = vectors with id < k, squared-L2 assignment
    with (d2, cell) tie-break, per-dim mean updates, ``rounds`` full
    Lloyd rounds).  Returns the final assignment frame (id, cell, d2).

    Where the exact twin pays the n*k*d dim-join so every number routes
    through decimal and value-hashes against a SQL oracle, this path
    keeps vectors WHOLE: per row, k zip_with/aggregate squared-L2 folds
    against centroid literals and an array_min struct argmin -- one
    narrow whole-stage-codegen pass over the corpus per round, zero
    shuffle of the data.  Centroid updates are one k-group aggregate of
    d per-dim means (map-side combined, k*d cells total) collected to
    the driver -- the same bounded k-row collect contract as
    ``assign_cells``/``kmeans_centroids``.  At 100 TB the per-round cost
    is a corpus scan, not an n*k*d shuffle: this is the path production
    runs, and the exact twin is its regression oracle on sampled data
    (bridged by tests/test_diagnostics_entries.py::
    test_kmeans_twins_membership_bridge and the oracle-paired
    ``kmeans_lloyd_vectorized_counts`` entry).

    Determinism: per-row folds are sequential IEEE left-folds (fixed
    order); cross-row centroid means use Spark's float avg, whose low
    bits may differ from the twin's decimal-routed means.  The honest
    divergence window vs the exact twin is the twin's own 1e-9 d2
    quantization grid (r12 advice #2): the oracle snaps every distance
    to the grid BEFORE the (d2, cell) argmin and breaks grid ties by
    cell id, so assignments can differ whenever two cells' true d2 gap
    is within ~1e-9 (absolute, at the grid) -- not just within the
    ~1e-12 fold/mean noise of this path.  The membership-count oracle
    (``kmeans_lloyd_vectorized_counts``) pins that no fixture corpus
    has two cells that close; a data-dependent flake there would point
    here first."""
    cents = [
        (int(r["cell"]), [float(x) for x in r["vec"]])
        for r in df.filter(F.col(id_col) < k)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("vec"))
        .collect()
    ]
    if len(cents) < k:
        # same empty/short-input class as the greedy_densest_subgraph
        # guard (r11 advice #1): id < k must seed exactly k centroids,
        # or round 1's argmin is over a truncated (or empty) cell set
        raise ValueError(
            f"kmeans_lloyd_vectorized: init collect found {len(cents)} "
            f"rows with {id_col} < {k}; need {k} seed centroids"
        )
    dim = len(cents[0][1])
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    asg = None
    for rnd in range(1, rounds + 1):
        # one JVM-parsed expression per round (see _sql_d2_lit), with the
        # argmin struct STAGED as its own column so the k distance folds
        # run ONCE per row -- the old amin['cell'] / amin['d2'] pair
        # duplicated the whole array_min subtree in the projection (HOF
        # lambdas are excluded from Catalyst CSE; CollapseProject keeps
        # a non-cheap staged column referenced twice, same discipline as
        # with_l2_normalized); values bit-identical
        scored = ", ".join(
            f"named_struct('d2', {_sql_d2_lit('vec', c_vec)}, "
            f"'cell', CAST({int(cell)} AS BIGINT))"
            for cell, c_vec in cents
        )
        staged = v.select(
            "id", "vec", F.expr(f"array_min(array({scored}))").alias("__amin")
        )
        asg = staged.select(
            "id", "vec",
            F.col("__amin.cell").alias("cell"),
            F.col("__amin.d2").alias("d2"),
        )
        if rnd < rounds:
            means = asg.groupBy("cell").agg(
                *[
                    F.avg(F.element_at("vec", d + 1).cast("double")).alias(
                        f"m{d}"
                    )
                    for d in range(dim)
                ]
            )
            cents = [
                (int(r["cell"]), [float(r[f"m{d}"]) for d in range(dim)])
                for r in means.collect()
            ]
    return asg.select("id", "cell", "d2")
