"""k-nearest-neighbor join via cell k-ring expansion + sort-merge.

The scale path for "nearest N documents/pings to each query point": instead
of a cross join (O(Q*C)), each query explodes into its (2r+1)^2 Chebyshev
ring of grid cells (or the 1+3k(k+1) hex k-ring) and equi-joins the corpus
on cell id — a shuffle-on-key sort-merge join whose cost is proportional to
true candidate counts. Top-k by distance is a row_number window.

Reference analog: nearest-grid interpolation (cruise/resample_regrid.py:94-107)
and the chunked point-lookup pattern (geometry/elevation_manager.py:52-82).

Semantics (deterministic, oracle-checkable): candidate set = corpus points
whose cell is within ring distance r (grid variant: lon wraps, lat clamps;
hex variant is planar — no dateline wrap, see knn_hex); rank by
squared planar degree distance with ties broken by corpus id; keep k.
This is a bounded-radius kNN: points with no corpus neighbor within the
ring radius return fewer than k rows (callers pick r for their density).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cells, geo


def _grid_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    ring: int = 1,
    res: int = 7,
    query_id: str = "url",
    corpus_id: str = "url",
    lat: str = "lat",
    lon: str = "lon",
    salt_buckets: int | None = None,
    corpus_prepared: DataFrame | None = None,
    broadcast_queries: bool = False,
) -> DataFrame:
    """The k-ring candidate join shared by knn_grid and the density tests:
    (q_id, q_lat, q_lon, n_id, n_lat, n_lon) for every corpus point whose
    cell lies within Chebyshev ring distance `ring` of the query's cell
    (lon wraps, lat clamps). Exposed separately so tests can pin the
    CANDIDATE count a resolution policy generates, not just the final
    top-k.

    salt_buckets (r5): the north rule's mandated salted repartition on
    cell id, wired into the one production shuffle equi-join whose key is
    genuinely skewed (hot coastal/urban cells put ~35% of the corpus in
    2 cells — fixtures/pages_gen.py:36-39). The corpus side salts by row
    id (operators/skew.add_salt), the exploded query-ring side replicates
    x salt_buckets (explode_salt), and the join key becomes
    (gx, gy, salt) — a hot cell's corpus rows spread over salt_buckets
    tasks at the cost of ring-side replication. Result-identical to the
    unsalted join (pinned by pytest); measured effect in BENCH/NOTES.md
    (r5 salting table). Default None = unsalted (AQE skew-join is the
    runtime backstop).

    corpus_prepared (r5): a frame from prepare_corpus_cells(corpus, res)
    — already projected to (n_id, n_lat, n_lon, j_gx, j_gy), hash-
    partitioned AND sorted on the join keys, and checkpointed. The join
    then reuses that partitioning/ordering (no corpus-side Exchange or
    Sort per call), which is what makes knn_grid_adaptive's round loop
    pay the corpus shuffle ONCE per tier instead of once per round.
    Mutually exclusive with salt_buckets (salting re-keys the join)."""
    if corpus_prepared is not None and salt_buckets:
        raise ValueError("corpus_prepared and salt_buckets are mutually exclusive")
    if corpus_prepared is not None:
        prep_res = getattr(corpus_prepared, "_wcsp_prep_res", None)
        if prep_res != res:
            # a res mismatch would equi-join numerically-coincidental cell
            # coords and silently return wrong neighbors
            raise ValueError(
                f"corpus_prepared was built at res={prep_res} (need {res}); "
                "pass a frame from prepare_corpus_cells(corpus, res)"
            )
    nx = 2 * (1 << res)
    q_gx, q_gy = cells.grid_cell_xy(F.col(lat), F.col(lon), res)
    q = (
        queries.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
        .select(
            F.col(query_id).alias("q_id"),
            F.col(lat).alias("q_lat"),
            F.col(lon).alias("q_lon"),
            q_gx.alias("q_gx"),
            q_gy.alias("q_gy"),
        )
    )
    # canonicalize dx modulo nx: when 2*ring+1 > nx the raw range would
    # alias the same wrapped column twice, duplicating candidate pairs
    # (which then eat top-k slots); gy is clamped, not wrapped, so dy
    # cannot alias
    dxs = sorted({((dx % nx) + nx) % nx for dx in range(-ring, ring + 1)})
    offsets = [(dx, dy) for dx in dxs for dy in range(-ring, ring + 1)]
    off = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets])
    q_exp = (
        q.withColumn("o", F.explode(off))
        .withColumn("j_gx", (F.col("q_gx") + F.col("o.dx") + F.lit(nx)) % F.lit(nx))
        .withColumn("j_gy", F.col("q_gy") + F.col("o.dy"))
        .drop("o")
    )
    if corpus_prepared is not None:
        c = corpus_prepared
    else:
        c = _project_corpus_cells(corpus, res, corpus_id, lat, lon)
    if salt_buckets:
        from . import skew

        c = skew.add_salt(c, salt_buckets, "n_id")
        q_exp = skew.explode_salt(q_exp, salt_buckets)
        return (
            q_exp.join(c, ["j_gx", "j_gy", "_salt"])
            .drop("_salt")
            .filter(F.col("q_id") != F.col("n_id"))
        )
    if broadcast_queries:
        # explicit hint (r6): when the caller KNOWS the exploded query
        # side is small (knn_grid_density's tier loop holds the exact
        # per-tier count), force the broadcast — Catalyst's size estimate
        # for a filtered scan misses it and falls back to a sort-merge
        # join that re-shuffles the FULL corpus every escalation round
        # (profiled at 5M rows: 4.84M corpus rows shuffled 3x per run)
        q_exp = F.broadcast(q_exp)
    return q_exp.join(c, ["j_gx", "j_gy"]).filter(F.col("q_id") != F.col("n_id"))


def _project_corpus_cells(
    corpus: DataFrame, res: int, corpus_id: str, lat: str, lon: str
) -> DataFrame:
    """The ONE corpus-side projection for the cell join — shared by the
    per-call path and prepare_corpus_cells so null/NaN guards and column
    shape cannot drift between them."""
    c_gx, c_gy = cells.grid_cell_xy(F.col(lat), F.col(lon), res)
    return (
        corpus.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
        .select(
            F.col(corpus_id).alias("n_id"),
            F.col(lat).alias("n_lat"),
            F.col(lon).alias("n_lon"),
            c_gx.alias("j_gx"),
            c_gy.alias("j_gy"),
        )
    )


def prepare_corpus_cells(
    corpus: DataFrame,
    res: int,
    corpus_id: str = "url",
    lat: str = "lat",
    lon: str = "lon",
    num_partitions: int | None = None,
) -> DataFrame:
    """Project the corpus to (n_id, n_lat, n_lon, j_gx, j_gy) at `res`,
    hash-partition + sort it on the join keys, and localCheckpoint so the
    LogicalRDD keeps the partitioning/ordering metadata: every subsequent
    _grid_candidates join against it skips the corpus-side Exchange and
    Sort (the query side shuffles to match — tiny). Used by
    knn_grid_adaptive/knn_grid_density to pay the corpus shuffle once per
    TIER instead of once per escalation round. The frame is stamped with
    the res it was built at; _grid_candidates refuses a mismatched one."""
    prepped = _project_corpus_cells(corpus, res, corpus_id, lat, lon)
    if num_partitions:
        prepped = prepped.repartition(num_partitions, "j_gx", "j_gy")
    else:
        prepped = prepped.repartition("j_gx", "j_gy")
    out = prepped.sortWithinPartitions("j_gx", "j_gy").localCheckpoint()
    out._wcsp_prep_res = res
    return out


def knn_grid(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    ring: int = 1,
    res: int = 7,
    query_id: str = "url",
    corpus_id: str = "url",
    lat: str = "lat",
    lon: str = "lon",
    salt_buckets: int | None = None,
    corpus_prepared: DataFrame | None = None,
    broadcast_queries: bool = False,
) -> DataFrame:
    """Bounded-radius kNN on the equirect grid.

    Returns (query_id, neighbor_id, dist_sq, rank). Self-matches (same id)
    are excluded. Query side explodes x(2r+1)^2 — keep ring small; corpus
    side shuffles once on (gx, gy). salt_buckets salts that shuffle for
    hot-cell skew; corpus_prepared reuses a prepare_corpus_cells frame
    (see _grid_candidates).
    """
    cand = _grid_candidates(
        queries, corpus, ring, res, query_id, corpus_id, lat, lon,
        salt_buckets=salt_buckets, corpus_prepared=corpus_prepared,
        broadcast_queries=broadcast_queries,
    )
    # antimeridian-aware distance: dlon wraps (the candidate generation
    # wraps j_gx, so ranking must agree or wrapped candidates score ~360deg
    # and never make top-k)
    dist = geo.planar_deg_sq_wrapped(F.col("q_lat"), F.col("q_lon"), F.col("n_lat"), F.col("n_lon"))
    w = Window.partitionBy("q_id").orderBy(F.col("dist_sq").asc(), F.col("n_id").asc())
    return (
        cand.withColumn("dist_sq", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select(
            F.col("q_id").alias(query_id + "_q"),
            F.col("n_id").alias("neighbor_id"),
            F.col("dist_sq"),
            F.col("rank"),
        )
    )


def knn_hex(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    ring: int = 1,
    res: int = 7,
    query_id: str = "url",
    corpus_id: str = "url",
    lat: str = "lat",
    lon: str = "lon",
    wrap: bool = False,
) -> DataFrame:
    """Same join shape over the hex grid: query explodes into the
    1+3k(k+1) axial k-ring (hex rings are ~30% tighter than square rings
    for the same radius — fewer candidates per query).

    Default (wrap=False) KNOWN BOUNDARY (unlike knn_grid, whose gx
    wraps): the axial hex projection is planar, so candidate generation
    does NOT wrap the antimeridian and distances are unwrapped planar
    degrees — a query at lon -179.9 will not see corpus points at +179.9.
    The exact SQL oracle for the knn_join contract query pins these
    (documented) planar semantics, so the contract default stays planar.

    wrap=True closes that boundary by dateline GHOST REPLICATION: a lon
    shift of 360 deg is not a lattice translation in axial coords
    (dq = sqrt3/3*360/s is non-integral), so corpus points within
    `margin` of either dateline edge are duplicated once at lon+-360
    before projection — the planar k-ring then finds them naturally —
    and ranking uses the wrapped degree distance (identical for a ghost
    and its original). A (q_id, n_id) min-dist agg collapses the
    original/ghost pair in the degenerate whole-world-ring case. Cost:
    one corpus-side filter+union (ghost fraction ~ margin/360 of the
    corpus) plus one partial-agg shuffle on candidates; candidate-join
    shape unchanged."""
    q_q, q_r = cells.hex_cell_qr(F.col(lat), F.col(lon), res)
    q = (
        queries.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
        .select(
            F.col(query_id).alias("q_id"),
            F.col(lat).alias("q_lat"),
            F.col(lon).alias("q_lon"),
            q_q.alias("hq"),
            q_r.alias("hr"),
        )
    )
    offs = cells.hex_kring_offsets(ring)
    off = F.array(*[F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr")) for dq, dr in offs])
    q_exp = (
        q.withColumn("o", F.explode(off))
        .withColumn("j_q", F.col("hq") + F.col("o.dq"))
        .withColumn("j_r", F.col("hr") + F.col("o.dr"))
        .drop("o")
    )
    c_base = corpus.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull()).select(
        F.col(corpus_id).alias("n_id"),
        F.col(lat).alias("n_lat"),
        F.col(lon).alias("n_lon"),
    )
    if wrap:
        # lon reach of a hex k-ring: ring steps of sqrt3*s deg in q plus
        # one cell width; +2 cells of slack absorbs axial rounding
        margin = (ring + 2) * 1.7320508075688772 * cells.hex_res_size(res)
        east = c_base.filter(F.col("n_lon") > F.lit(180.0 - margin)).withColumn(
            "n_lon", F.col("n_lon") - F.lit(360.0)
        )
        west = c_base.filter(F.col("n_lon") < F.lit(-180.0 + margin)).withColumn(
            "n_lon", F.col("n_lon") + F.lit(360.0)
        )
        c_base = c_base.unionByName(east).unionByName(west)
    c_q, c_r = cells.hex_cell_qr(F.col("n_lat"), F.col("n_lon"), res)
    c = c_base.withColumn("j_q", c_q).withColumn("j_r", c_r)
    cand = q_exp.join(c, ["j_q", "j_r"]).filter(F.col("q_id") != F.col("n_id"))
    if wrap:
        dist = geo.planar_deg_sq_wrapped(
            F.col("q_lat"), F.col("q_lon"), F.col("n_lat"), F.col("n_lon")
        )
        cand = (
            cand.withColumn("dist_sq", dist)
            .groupBy("q_id", "n_id")
            .agg(F.min("dist_sq").alias("dist_sq"))
        )
    else:
        dist = geo.planar_deg_sq(F.col("q_lat"), F.col("q_lon"), F.col("n_lat"), F.col("n_lon"))
        cand = cand.withColumn("dist_sq", dist)
    w = Window.partitionBy("q_id").orderBy(F.col("dist_sq").asc(), F.col("n_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
        .select(
            F.col("q_id").alias(query_id + "_q"),
            F.col("n_id").alias("neighbor_id"),
            F.col("dist_sq"),
            F.col("rank"),
        )
    )


def knn_grid_adaptive(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    res: int = 7,
    max_rounds: int = 3,
    query_id: str = "url",
    corpus_id: str = "url",
    lat: str = "lat",
    lon: str = "lon",
    corpus_prepared: DataFrame | None = None,
    broadcast_queries: bool = False,
) -> DataFrame:
    """Guaranteed-k kNN via bounded ring escalation.

    Round i runs the bounded-radius join at ring 2^i; queries that already
    hold k neighbors WITHIN a provably-complete radius stop, the rest
    escalate (classic grid-kNN doubling). Completeness guard: a neighbor
    found at ring r is only trusted as a true top-k member if its distance
    is <= r * cell_size (anything beyond could be beaten by a point in an
    unexplored cell); untrusted queries re-run at the next ring.

    Driver-side loop over at most max_rounds DataFrame jobs — each round
    is fully distributed; the loop is orchestration, not per-row compute
    (the reference's per-file loop analog, resample_regrid.py:167-196).
    """
    s = 180.0 / (1 << res)
    remaining = queries
    done_parts: list[DataFrame] = []
    for i in range(max_rounds):
        ring = 2**i
        if remaining.isEmpty():
            break
        res_i = knn_grid(
            remaining, corpus, k=k, ring=ring, res=res, query_id=query_id,
            corpus_id=corpus_id, lat=lat, lon=lon, corpus_prepared=corpus_prepared,
            broadcast_queries=broadcast_queries,
        )
        # lazy-checkpoint the round result: it feeds counts, trusted, the
        # anti-join AND the final union — without this the exploded
        # k-ring join re-executes 2-4x per round (r4 review); the next
        # action (isEmpty / the caller's collect) materializes it
        res_i = res_i.localCheckpoint(eager=False)
        # trust radius: ring * cell_size in degrees (squared for dist_sq)
        trust_sq = float((ring * s) ** 2)
        counts = (
            res_i.groupBy(query_id + "_q")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.max("dist_sq").alias("_maxd"),
            )
            .filter((F.col("_n") >= k) & (F.col("_maxd") <= F.lit(trust_sq)))
            .select(query_id + "_q")
        )
        trusted = res_i.join(counts, query_id + "_q", "left_semi")
        done_parts.append(trusted)
        remaining = remaining.join(
            counts.withColumnRenamed(query_id + "_q", query_id), query_id, "left_anti"
        )
        # truncate lineage: without this every round's `remaining` chains
        # the previous round's FULL knn_grid plan through the anti-join,
        # stacking Catalyst plans geometrically as rounds grow. Lazy
        # checkpoint — the next round's isEmpty() materializes it, keeping
        # one action per round.
        remaining = remaining.localCheckpoint(eager=False)
        if i == max_rounds - 1:
            # final round: emit best-effort results for the stragglers
            rest = res_i.join(counts, query_id + "_q", "left_anti")
            done_parts.append(rest)
    if not done_parts:
        # empty query set: an empty result with the right schema
        return knn_grid(queries, corpus, k=k, ring=1, res=res, query_id=query_id, corpus_id=corpus_id, lat=lat, lon=lon)
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out


def assign_density_res(
    queries: DataFrame,
    corpus: DataFrame,
    res: int = 7,
    res_max: int | None = None,
    step: int = 2,
    dense_threshold: int = 32,
    query_id: str = "url",
    lat: str = "lat",
    lon: str = "lon",
    out_col: str = "_knn_res",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Per-query starting resolution from LOCAL corpus density (r5, the
    fix for the r4 `weak`-at-100x flag): queries in dense cells start the
    ring join at a FINE resolution so their candidate lists are bounded
    by fine-cell occupancy, not base-cell population; sparse queries keep
    the base res and rely on knn_grid_adaptive's outward ring doubling.

    Mechanics (all one shuffle-join shaped, no driver data):
    1. corpus cell counts ONCE at the finest ladder level `res_max`
       (default res+12: 4096x finer per axis — at res 7 that is ~4e-4
       deg, fine enough to split metro-block-scale point clusters; the
       r5 5M-row bench hotspots pack ~480k pages into 0.02-deg squares
       and need res 19 for bounded cells, which res+8 missed);
    2. coarser ladder counts derived by CHAINED integer division of the
       next-finer level's cell coords (gx at res r == gx at res r+d //
       2^d, and floor division composes, so each level aggregates the
       previous level's rows — geometrically shrinking shuffles instead
       of len(ladder) passes over the full fine-count set);
    3. each query explodes into its (level, ancestor-cell) keys — one
       equi-join against the unioned ladder counts, then a per-query max:
       chosen res = FINEST ladder level whose containing cell holds >=
       dense_threshold corpus points, else the base `res`.

    The returned frame is `queries` + `out_col` (int). The bound this
    buys: a query's round-1 candidate count is ~ring^2 x its chosen
    cell's occupancy; choosing the finest still-dense level caps that at
    O(dense_threshold x 4^step) for any density res_max can resolve
    (beyond that, raise res_max — the knob trades assignment-join width
    for the worst-cell bound). Correctness never depends on the choice:
    every tier runs the same trust-radius escalation loop.

    sample_fraction: estimate densities from a seeded Bernoulli sample
    of the corpus (counts scaled back up by 1/fraction before the
    threshold test). The assignment is a pure PERFORMANCE choice — a
    mis-assigned query just starts at a different tier and the trust-
    radius loop still returns the exact top-k — so sampling is safe, and
    at 10^12 rows it turns the one full-corpus count shuffle into a
    fraction-sized one. Deterministic given a fixed corpus partitioning
    (seeded sample); None (default) = exact counts.

    Reference analog: dense-ping-region skew in the regrid neighborhoods
    (cruise/resample_regrid.py:62-78) + SURVEY §2.3's k-ring kNN graft."""
    if res_max is None:
        res_max = res + 12
    if res_max <= res or step <= 0:
        raise ValueError(f"need res_max > res and step > 0 (got res={res}, res_max={res_max}, step={step})")
    if sample_fraction is not None and not 0.0 < sample_fraction <= 1.0:
        raise ValueError(f"sample_fraction must be in (0, 1] (got {sample_fraction})")
    ladder = list(range(res_max, res, -step))  # finest -> coarser, excl. base

    cnt_src = corpus
    cnt_expr = F.count(F.lit(1))
    if sample_fraction is not None and sample_fraction < 1.0:
        cnt_src = corpus.sample(fraction=sample_fraction, seed=42)
        cnt_expr = (cnt_expr / F.lit(sample_fraction)).cast("long")
    cgx, cgy = cells.grid_cell_xy(F.col(lat), F.col(lon), res_max)
    cnt_fine = (
        cnt_src.select(cgx.alias("cx"), cgy.alias("cy"))
        .filter(F.col("cx").isNotNull())
        .groupBy("cx", "cy")
        .agg(cnt_expr.alias("cnt"))
    )
    # the fine counts seed a chain of derived aggs: truncate lineage so
    # the corpus scan + count shuffle happens once
    cnt_fine = cnt_fine.localCheckpoint(eager=False)
    levels = []
    prev, prev_r = cnt_fine, res_max
    for r in ladder:
        if r == res_max:
            lvl = prev.select(F.lit(r).alias("lvl"), "cx", "cy", "cnt")
        else:
            d = 1 << (prev_r - r)  # coarsen from the PREVIOUS level:
            # floor division composes, and each agg shrinks 4^step-fold
            lvl = (
                prev.groupBy(
                    F.floor(F.col("cx") / F.lit(d)).cast("long").alias("cx"),
                    F.floor(F.col("cy") / F.lit(d)).cast("long").alias("cy"),
                )
                .agg(F.sum("cnt").alias("cnt"))
                .select(F.lit(r).alias("lvl"), "cx", "cy", "cnt")
            )
            lvl = lvl.localCheckpoint(eager=False)
            prev, prev_r = lvl.drop("lvl"), r
        levels.append(lvl)
    counts_all = levels[0]
    for lvl in levels[1:]:
        counts_all = counts_all.unionByName(lvl)
    counts_all = counts_all.filter(F.col("cnt") >= F.lit(dense_threshold))

    qgx, qgy = cells.grid_cell_xy(F.col(lat), F.col(lon), res_max)
    key_structs = [
        F.struct(
            F.lit(r).alias("lvl"),
            F.floor(F.col("_qgx") / F.lit(1 << (res_max - r))).cast("long").alias("cx"),
            F.floor(F.col("_qgy") / F.lit(1 << (res_max - r))).cast("long").alias("cy"),
        )
        for r in ladder
    ]
    q_keys = (
        queries.select(F.col(query_id).alias("_qid"), qgx.alias("_qgx"), qgy.alias("_qgy"))
        .filter(F.col("_qgx").isNotNull())
        .withColumn("_k", F.explode(F.array(*key_structs)))
        .select("_qid", F.col("_k.lvl").alias("lvl"), F.col("_k.cx").alias("cx"), F.col("_k.cy").alias("cy"))
    )
    chosen = (
        q_keys.join(counts_all, ["lvl", "cx", "cy"])  # inner: only dense levels survive
        .groupBy("_qid")
        .agg(F.max("lvl").alias(out_col))  # finest dense level
    )
    return queries.join(
        chosen.withColumnRenamed("_qid", query_id), query_id, "left"
    ).withColumn(out_col, F.coalesce(F.col(out_col), F.lit(res)))


def knn_grid_density(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    res: int = 7,
    res_max: int | None = None,
    step: int = 2,
    dense_threshold: int | None = None,
    max_rounds: int = 4,
    query_id: str = "url",
    corpus_id: str = "url",
    lat: str = "lat",
    lon: str = "lon",
    collapse_exact_dups: bool = False,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Density-adaptive guaranteed-k kNN: assign each query a starting
    resolution from local corpus density (assign_density_res), then run
    the trust-radius escalation loop (knn_grid_adaptive) once per
    occupied tier and union.

    collapse_exact_dups (r5): web corpora duplicate COORDINATES (every
    page of a venue geocodes to one point), and no grid resolution
    separates identical points — the one case where cell refinement
    cannot bound candidates. Collapsing the corpus to at most k+1 rows
    per exact (lat, lon) — the k+1 smallest ids — is output-identical by
    the tie rule (order by dist then id: co-located points share dist
    for every query, so a dropped row has >= k+1 same-coordinate
    predecessors, at most one of which is the query itself — self-match
    excluded — leaving >= k rows that beat it for every query; the +1
    covers a query sitting AT the duplicated coordinate). The collapse
    happens AFTER density assignment (tiers are chosen from the
    uncollapsed counts), so tier choice, escalation rounds, and
    best-effort straggler output are all bit-identical to collapse off:
    within any candidate ring, a dropped row's k+1 predecessors share
    its cell and therefore its ring membership, so it can never appear
    in a top-k — trusted or best-effort. Pinned by pytest equality on a
    duplicated-coordinate fixture including co-located queries. Cost:
    one corpus shuffle on (lat, lon); default off because duplicate-free
    corpora pay it for nothing.

    Same output contract and exactness as knn_grid_adaptive (true top-k
    for every query that terminates trusted; best-effort for stragglers
    after max_rounds): the tier choice only bounds CANDIDATE counts —
    a dense-cell query starts fine, finds >= dense_threshold >= ~2k
    candidates in ring 1, and trusts within a ring or two; it never pays
    the base-res hot-cell population. The driver-side loop is over at
    most len(ladder)+1 tiers (a bounded, data-independent count — same
    orchestration stance as knn_grid_adaptive's round loop)."""
    if dense_threshold is None:
        dense_threshold = max(2 * k, 16)
    assigned = assign_density_res(
        queries,
        corpus,
        res=res,
        res_max=res_max,
        step=step,
        dense_threshold=dense_threshold,
        query_id=query_id,
        lat=lat,
        lon=lon,
        sample_fraction=sample_fraction,
    ).localCheckpoint(eager=False)
    if collapse_exact_dups:
        # AFTER assignment: tiers come from uncollapsed density, so the
        # collapse is invisible to tier choice and escalation (docstring
        # proof); only the candidate volume shrinks
        wdup = Window.partitionBy(lat, lon).orderBy(F.col(corpus_id).asc())
        corpus = (
            corpus.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
            .withColumn("_dr", F.row_number().over(wdup))
            .filter(F.col("_dr") <= F.lit(k + 1))
            .drop("_dr")
            .localCheckpoint(eager=False)
        )
    # bounded collect: one (tier, count) row per occupied tier (<= ladder
    # length). The count picks the tier's join strategy: a small query
    # side explodes to well under the broadcast threshold, so every
    # escalation round is a broadcast join against the checkpointed
    # corpus — no corpus shuffle at all, and pre-partitioning it would be
    # pure overhead (measured +0.6 s/tier on the 5M bench). A large query
    # side forces sort-merge rounds that would each re-shuffle the
    # corpus, so prepare it once per tier instead. 50k queries x ~9 ring
    # cells x ~60 B/row ~ 27 MB — past any sane autoBroadcast setting.
    tier_rows = assigned.groupBy("_knn_res").count().collect()
    tiers = sorted(((r["_knn_res"], r["count"]) for r in tier_rows), reverse=True)

    def _run_tier(t_nq):
        t, nq = t_nq
        qt = assigned.filter(F.col("_knn_res") == t).drop("_knn_res")
        prepped = (
            prepare_corpus_cells(corpus, t, corpus_id=corpus_id, lat=lat, lon=lon)
            if nq > 50_000
            else None
        )
        return knn_grid_adaptive(
            qt, corpus, k=k, res=t, max_rounds=max_rounds,
            query_id=query_id, corpus_id=corpus_id, lat=lat, lon=lon,
            corpus_prepared=prepped,
            # the tier count is known exactly here: a small query side
            # broadcasts (no corpus shuffle per round); a large one
            # uses the prepared corpus instead (see prepped above)
            broadcast_queries=nq <= 50_000,
        )

    import os as _os

    pool_n = min(int(_os.environ.get("SPARK_GRAFT_TIER_POOL", "3")), len(tiers))
    if pool_n > 1:
        # r6 (guide §2.6, overlap independent jobs): each tier's
        # trust-radius loop is an independent chain of small driver
        # actions (candidate join, count, checkpoint per round) that
        # rarely fills the cluster on its own; running the tiers from a
        # small thread pool lets one tier's map tasks back-fill the idle
        # cores under another tier's count/checkpoint tail. Tier inputs
        # are disjoint query subsets of the ALREADY-materialized
        # `assigned` checkpoint (the tier_rows collect above forced it),
        # so no shared lazy state races; pool.map preserves tier order,
        # keeping the union identical to the sequential loop.
        # pool size via SPARK_GRAFT_TIER_POOL (default 3; 1 = sequential):
        # 2-3 in-flight tiers fill the tail without fighting for executors
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=pool_n) as pool:
            parts = list(pool.map(_run_tier, tiers))
    else:
        parts = [_run_tier(t) for t in tiers]
    if not parts:
        return knn_grid(queries, corpus, k=k, ring=1, res=res, query_id=query_id, corpus_id=corpus_id, lat=lat, lon=lon)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
