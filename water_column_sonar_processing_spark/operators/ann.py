"""Approximate-nearest-neighbor search over embedding columns.

Two paths:

- `cosine_topk_bruteforce`: exact baseline. Query set broadcast; dot
  products via native `F.aggregate`/`F.zip_with` (JVM, no Python hop);
  top-k by row_number window. Cost O(Q*N) — fine when Q is small or as
  the verification oracle.
- `cosine_topk_lsh`: scale path. Random-hyperplane LSH: each vector gets a
  b-bit signature (sign of dot with b fixed pseudo-random planes, derived
  deterministically from a seed — no Python RNG at execution time);
  candidates share a signature bucket (optionally with 1-bit-flip
  multiprobe), exact cosine re-rank inside buckets. Sort-merge join on the
  bucket key; hot buckets capped like LSH dedup.

Embedding near-dup (`embedding_neardup_pairs`) reuses the LSH kernel with
a similarity threshold instead of top-k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    """Sequential left-fold dot product in DOUBLE — operands cast up front
    so float inputs don't accumulate in float32, and so the DuckDB oracle
    (list_reduce over the same casts) folds to the bit-identical double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    # clamped strictly above 0: Spark 4 ANSI mode throws DIVIDE_BY_ZERO
    # even for DOUBLE division (verified in-session), so one all-zero
    # embedding (failed/padded rows are common at corpus scale) would
    # kill every cosine query. greatest(x, 1e-300) leaves every real
    # norm bit-identical (min normal double is ~2.2e-308) and gives zero
    # vectors similarity 0 (the dot product is 0) instead of an abort.
    return F.greatest(
        F.sqrt(
            F.aggregate(
                F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        F.lit(1e-300),
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int | None = 4096,
) -> DataFrame:
    """Exact cosine top-k: (q_id, n_id, cos_sim, rank). Excludes self.

    This is the EXACT VERIFICATION BASELINE (the role DuckDB's brute-force
    oracle plays test-side): its plan is a BroadcastNestedLoopJoin, O(Q*N)
    by construction. That is only sane when Q is bounded, so the bound is
    ENFORCED: raises ValueError when the query side exceeds `max_queries`
    (one cheap O(limit) count job on the to-be-broadcast side — it must fit
    on the driver anyway). Pass max_queries=None to opt out explicitly.
    For unbounded query sets use the scale paths: `cosine_topk_lsh` or
    `ivf_topk` (both bucketed equi-joins, oracle-checked for recall).

    The query side is broadcast (ANN query sets are small vs the corpus);
    the corpus streams through one projection — no shuffle of the corpus,
    only of the (q x k) result."""
    if max_queries is not None:
        n_q = queries.limit(max_queries + 1).count()
        if n_q > max_queries:
            raise ValueError(
                f"cosine_topk_bruteforce is the O(Q*N) exact baseline; query side has "
                f">{max_queries} rows. Use cosine_topk_lsh/ivf_topk at this scale, or "
                f"pass max_queries=None to force."
            )
    q = queries.select(
        F.col(query_id).alias("q_id"), F.col(vec_col).alias("q_vec"), _norm(F.col(vec_col)).alias("q_norm")
    )
    c = corpus.select(
        F.col(corpus_id).alias("n_id"), F.col(vec_col).alias("n_vec"), _norm(F.col(vec_col)).alias("n_norm")
    )
    cand = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
    sim = _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
    return (
        cand.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select("q_id", "n_id", "cos_sim", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (Box-Muller over an LCG
    stream — reproducible across sessions with no numpy RNG state)."""
    state = seed
    planes = []
    for _ in range(bits):
        vals = []
        while len(vals) < dim:
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            u1 = ((state >> 11) + 1) / float(1 << 52)
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            u2 = (state >> 11) / float(1 << 52)
            r = math.sqrt(-2.0 * math.log(u1))
            vals.append(r * math.cos(2 * math.pi * u2))
            if len(vals) < dim:
                vals.append(r * math.sin(2 * math.pi * u2))
        planes.append(vals[:dim])
    return planes


def lsh_signature(vec_col, dim: int, bits: int = 16, seed: int = 42):
    """Packed b-bit random-hyperplane signature as a long column (native:
    per-plane dot product sign, no UDF)."""
    planes = _hyperplanes(dim, bits, seed)
    sig = F.lit(0).cast("long")
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(v, p) >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = sig + bit
    return sig


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 12,
    multiprobe: int = 1,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed approximate cosine top-k.

    Queries probe their own bucket plus every neighbor bucket within
    Hamming distance `multiprobe` of their signature (explode over
    sum_{i<=m} C(bits, i) masks); corpus is signed once. Equi-join on
    the signature -> exact re-rank. Recall grows with multiprobe/fewer
    bits; cost shrinks with more bits."""
    from itertools import combinations

    q = queries.select(
        F.col(query_id).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
        lsh_signature(vec_col, dim, bits, seed).alias("sig"),
    )
    if multiprobe >= 1:
        masks = [0]
        for m in range(1, multiprobe + 1):
            for combo in combinations(range(bits), m):
                masks.append(sum(1 << b for b in combo))
        probes = F.array(*[F.lit(m) for m in masks])
        q = q.withColumn("probe", F.explode(probes)).withColumn(
            "sig", F.col("sig").bitwiseXOR(F.col("probe"))
        ).drop("probe")
    c = corpus.select(
        F.col(corpus_id).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_norm"),
        lsh_signature(vec_col, dim, bits, seed).alias("sig"),
    )
    cand = q.join(c, "sig").filter(F.col("q_id") != F.col("n_id"))
    sim = _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
    return (
        cand.withColumn("cos_sim", sim)
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select("q_id", "n_id", "cos_sim", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vector pairs (id_a < id_b, cos_sim >= threshold) via
    same-bucket self-join + exact re-check."""
    signed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
        lsh_signature(vec_col, dim, bits, seed).alias("sig"),
    )
    a = signed.alias("a")
    b = signed.alias("b")
    sim = _dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, "sig")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= F.lit(threshold))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos_sim")
        .distinct()
    )


def _kmeans_np(sample: "np.ndarray", k: int, iters: int = 10, seed: int = 42):
    """Tiny deterministic k-means (numpy, driver-side on a bounded sample)
    for the IVF coarse quantizer. Public Lloyd's algorithm."""
    import numpy as np

    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(k, len(sample)), replace=False)
    cent = sample[np.sort(idx)].astype(np.float64)
    for _ in range(iters):
        d = sample @ cent.T
        nrm = np.linalg.norm(sample, axis=1)[:, None] * np.linalg.norm(cent, axis=1)[None, :]
        assign = np.argmax(d / np.maximum(nrm, 1e-12), axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate cosine top-k — the scale path.

    Train: a bounded deterministic sample of the corpus fits n_lists
    centroids driver-side (Lloyd's); centroids broadcast as literals.
    Index: every corpus vector is assigned its nearest centroid with a
    native F.aggregate argmax fold (no Python). Search: each query probes
    its n_probe nearest lists (explode), equi-joins the corpus on list id
    (sort-merge / AQE), exact cosine re-rank inside probed lists.

    Recall grows with n_probe/n_lists ratio; cost ~ n_probe/n_lists of
    brute force. Deterministic end to end (seeded sample + fixed fold
    order). One-shot composition of the index lifecycle below; for
    build-once / query-many, use build_ivf_index + query_ivf_index."""
    cent = _fit_centroids(corpus, corpus_id, vec_col, n_lists, train_sample, seed)
    postings = _assign_lists(corpus, cent, corpus_id, vec_col)
    return _ivf_search(queries, cent, postings, k, n_probe, query_id, vec_col)


def _fit_centroids(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    train_sample: int = 2048,
    seed: int = 42,
):
    """Bounded deterministic corpus sample -> n_lists centroids (numpy).

    Deterministic unbiased sample: order by a hash of the ID (not the
    stringified vector — hashing the id is O(8 bytes) per row, and makes
    the selection reproducible by any engine that has xxHash64)."""
    import numpy as np

    sample_pdf = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(corpus_id).cast("string")), F.col(corpus_id))
        .limit(train_sample)
        .toPandas()
    )
    sample = np.array([np.asarray(v, dtype=np.float64) for v in sample_pdf["v"]])
    return _kmeans_np(sample, n_lists, seed=seed)


def _centroid_sims(cent, v):
    """Per-centroid cosine sims of vector column v (centroids as literals)."""
    import numpy as np

    cent_cols = [F.array(*[F.lit(float(x)) for x in c]) for c in cent]
    nv = _norm(v)
    return [
        _dot(v, c) / (nv * F.lit(max(float(np.linalg.norm(cent[i])), 1e-300)))
        for i, c in enumerate(cent_cols)
    ]


def _assign_lists(
    corpus: DataFrame, cent, corpus_id: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Postings: (n_id, n_vec, n_norm, list_id) — nearest-centroid
    assignment as one native projection over the corpus."""

    def _best_list(v):
        # argmax via array_position(array_max): each centroid sim appears
        # ONCE in the expression tree. A when-chain fold would double the
        # tree per centroid (best_s appears in both the condition and the
        # else-branch of the next level) — 2^n_lists expression copies,
        # which hangs plan construction at n_lists=16. First-index-of-max
        # tie-break == the strict-> fold's first-max semantics.
        sims = F.array(*_centroid_sims(cent, v))
        return (F.array_position(sims, F.array_max(sims)) - F.lit(1)).cast("int")

    return corpus.select(
        F.col(corpus_id).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_norm"),
        _best_list(F.col(vec_col)).alias("list_id"),
    )


def _ivf_search(
    queries: DataFrame,
    cent,
    postings: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    prune: bool = False,
) -> DataFrame:
    """Probe n_probe nearest lists per query, exact cosine re-rank inside.

    prune=True collects the batch's distinct probed list ids (bounded by
    n_lists — tiny) and applies them as a STATIC isin filter on postings
    BEFORE the join: against a list_id-partitioned postings table this is
    classic partition pruning, so the scan touches only probed
    partitions. A bare equi-join would rely on dynamic partition pruning
    that Spark does not guarantee here — without the filter, each query
    batch full-scans the corpus the index exists to avoid. Costs one
    small extra action over the query side; the one-shot path keeps
    prune=False (postings unpartitioned, filter buys nothing)."""
    q_base = queries.select(
        F.col(query_id).alias("q_id"), F.col(vec_col).alias("q_vec"), _norm(F.col(vec_col)).alias("q_norm")
    )

    # build a (sim, idx) struct array, sort desc, take the n_probe closest
    def _probe_lists(v):
        sims = _centroid_sims(cent, v)
        arr = F.array(*[F.struct(sims[i].alias("s"), F.lit(i).alias("i")) for i in range(len(sims))])
        return F.slice(F.reverse(F.array_sort(arr)), 1, n_probe)

    q = q_base.withColumn("probe", F.explode(_probe_lists(F.col("q_vec")))).select(
        "q_id", "q_vec", "q_norm", F.col("probe.i").alias("list_id")
    )
    if prune:
        probed = sorted(r["list_id"] for r in q.select("list_id").distinct().collect())
        postings = postings.filter(F.col("list_id").isin(probed))
    cand = q.join(postings, "list_id").filter(F.col("q_id") != F.col("n_id"))
    sim = _dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
    return (
        cand.withColumn("cos_sim", sim)
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select("q_id", "n_id", "cos_sim", "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    out_dir: str,
    n_lists: int = 16,
    train_sample: int = 2048,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Materialize the IVF index for build-once / query-many use.

    The expensive pass — nearest-centroid assignment over the FULL
    corpus — runs once; postings land PARTITIONED BY list_id, so every
    later query batch touches only its probed partitions (~n_probe /
    n_lists of the corpus): the IVF cost model made physical through
    partition layout. At 10^12 rows the index build is the one full
    scan; queries after that are bounded by list size, not corpus size.

    Layout: <out_dir>/centroids (list_id, centroid array<double>),
            <out_dir>/postings/list_id=<i>/ (n_id, n_vec, n_norm)."""
    spark = corpus.sparkSession
    cent = _fit_centroids(corpus, corpus_id, vec_col, n_lists, train_sample, seed)
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
        "list_id int, centroid array<double>",
    )
    cent_df.coalesce(1).write.mode("overwrite").parquet(out_dir + "/centroids")
    _assign_lists(corpus, cent, corpus_id, vec_col).write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(out_dir + "/postings")


def query_ivf_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF index — bit-identical results to the
    one-shot cosine_topk_ivf built with the same parameters (centroid
    doubles round-trip parquet exactly)."""
    import numpy as np

    cent_rows = spark.read.parquet(index_dir + "/centroids").orderBy("list_id").collect()
    cent = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    postings = spark.read.parquet(index_dir + "/postings")
    return _ivf_search(queries, cent, postings, k, n_probe, query_id, vec_col, prune=True)
