"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline; the query side is small and
  broadcast, the corpus side streams — no shuffle of the corpus.
- LSH-bucketed ANN (random-hyperplane signs): the scale path; candidate
  pairs only meet inside a bucket.

Dot products are pure Catalyst (`aggregate` + `zip_with`), computed in
double precision so results are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_long


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    """Cosine similarity; NULL when either vector has zero norm (a plain
    divide would throw DIVIDE_BY_ZERO under Spark 4's default ANSI mode
    the moment one all-zero embedding — an embedding-service failure
    row — reaches the operator). Consumers treat NULL as 'never
    matches': threshold predicates reject it and the top-k operators
    filter it before ranking.

    PAIRWISE HOT PATHS MUST NOT USE THIS: it evaluates three interpreted
    aggregates (dot + two norms) per PAIR, and a filter on the resulting
    column gets pushdown-substituted so the whole expression runs TWICE
    per pair (the r4 brute_force_topk regression, found by the r5 quiet
    re-bench). Normalize each side once with :func:`unit_vectors` and
    score with a single ``_dot`` instead — per-pair cost drops from
    3(×2) aggregates to 1."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def unit_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Replace ``vec_col`` with its unit-normalized (double) form, ONE
    norm evaluation per row, dropping zero-norm rows (NULL-cosine
    semantics: they never match anything, so no consumer loses a row it
    would have kept).

    The division lambda must reference the norm as a real COLUMN: the
    plain ``withColumn(nrm) -> transform(x / col(nrm))`` shape gets
    collapsed by CollapseProject — it inlines a once-referenced alias
    into the lambda body, and interpreted higher-order functions have no
    CSE, so the whole norm aggregate re-ran PER ELEMENT (O(d²) per row;
    the r8 plan audit caught the inlined
    ``transform(v, x / SQRT(aggregate(v, ...)))`` in every ANN/IVF
    plan). Wrapping the transform in ``when(nrm > 0, ...)`` makes the
    alias referenced TWICE in the consuming projection, which
    CollapseProject refuses to inline (alwaysInline=false default), so
    the norm stays a per-row column; the ``when`` itself is vacuous
    under the ``nrm > 0`` filter (identical rows out, measured 3.4x
    faster on a 16k-row normalize-and-consume microbench)."""
    nrm = "_nrm"
    while nrm in df.columns:  # never clobber a caller's column
        nrm += "_"
    normed = df.withColumn(nrm, _norm(F.col(vec_col))).filter(F.col(nrm) > 0)
    unit = F.when(
        F.col(nrm) > 0,
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col(nrm)),
    )
    return normed.withColumn(vec_col, unit).drop(nrm)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (qid, nid, sim, rank): exact top-k cosine neighbors per query.

    queries is broadcast (small); ties break on neighbor id so ranking is
    total. Self-matches are excluded; zero-norm vectors never match on
    either side (unit_vectors drops them — same rows the old NULL-cosine
    filter removed, but without re-evaluating the score expression).

    Each side is unit-normalized ONCE (per row), so the per-pair cost is
    a single interpreted `_dot` — the naive cosine-per-pair shape costs
    3 aggregates per pair and, with the NULL filter pushdown-substituted
    into the projection, evaluated them twice (measured 1.8-2x slower at
    sf0.1; this is the r4 bench regression fixed in r5).
    """
    q = unit_vectors(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")),
        "qvec",
    )
    c = unit_vectors(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")),
        "nvec",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(_dot(F.col("qvec"), F.col("nvec")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def matmul_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine at BLAS speed: the (small-by-contract) query
    set is collected to a normalized numpy matrix and shipped in the
    task closure; the corpus streams through ONE ``mapInPandas`` that
    computes a [batch × n_queries] matmul and emits only each batch's
    per-query top-k, so the shuffle is bounded by n_batches·n_q·k rows
    (never the corpus); a final per-query rank reduces local top-k to
    global top-k. Results are identical to ``brute_force_topk`` — this
    is the exact-search scale path when the Catalyst expression dot
    product (interpreted per pair) becomes the bottleneck.
    """
    import numpy as np
    import pandas as pd

    id_type = corpus.schema[id_col].dataType.simpleString()
    q_rows = queries.select(id_col, vec_col).collect()  # small by contract
    if not q_rows:
        return queries.sparkSession.createDataFrame(
            [], f"qid {id_type}, nid {id_type}, sim double, rank int"
        )
    # ids stay native Python values (string/long/... per the schema —
    # forcing int64 broke the brute_force_topk drop-in contract for
    # non-long ids); zero-norm queries are dropped like the Catalyst
    # path's NULL-cosine filter drops them
    q_pairs = [
        (r[0], np.asarray(r[1], dtype=np.float64))
        for r in q_rows
        if np.linalg.norm(np.asarray(r[1], dtype=np.float64)) > 0
    ]
    if not q_pairs:
        return queries.sparkSession.createDataFrame(
            [], f"qid {id_type}, nid {id_type}, sim double, rank int"
        )
    q_ids = [p[0] for p in q_pairs]
    q_mat = np.stack([p[1] for p in q_pairs])
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    def round_half_up(x, decimals=4):
        # Spark/DuckDB round() is HALF_UP away from zero; np.round is
        # banker's half-even — mismatched .xxxx5 boundaries would flip
        # the oracle's 4th decimal. `+ 0.0` folds -0.0 into +0.0.
        scale = 10.0 ** decimals
        return np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x) + 0.0

    def topk_map(batches):
        from ..functions.worker import pin_worker_threads

        pin_worker_threads()
        for pdf in batches:
            a = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(a) == 0:
                yield pd.DataFrame({"qid": [], "nid": [], "sim": []})
                continue
            norms = np.linalg.norm(a, axis=1, keepdims=True)
            # zero-norm corpus rows never match (Catalyst-path parity:
            # its NULL cosine is filtered before ranking)
            valid = norms[:, 0] > 0
            nids = pdf[id_col].to_numpy()[valid]
            if len(nids) == 0:
                yield pd.DataFrame({"qid": [], "nid": [], "sim": []})
                continue
            a = a[valid] / norms[valid]
            sims = a @ q_mat.T  # [batch, n_q]
            numeric_ids = np.issubdtype(nids.dtype, np.number)
            out_q, out_n, out_s = [], [], []
            kk = min(k + 1, len(nids))  # +1 absorbs a possible self-match
            for j, qid in enumerate(q_ids):
                # rank on the ROUNDED similarity with nid tie-break —
                # the exact ordering the final window (and the oracle)
                # uses; cutting local top-k on raw sims can keep the
                # wrong member of a rounding-band tie
                col = round_half_up(sims[:, j])
                if numeric_ids:
                    order = np.lexsort((nids, -col))
                else:  # lexsort can't negate object/string keys
                    order = sorted(
                        range(len(nids)), key=lambda i: (-col[i], nids[i])
                    )
                for i in order[:kk]:
                    if nids[i] != qid:
                        out_q.append(qid)
                        out_n.append(nids[i])
                        out_s.append(float(col[i]))
            yield pd.DataFrame({"qid": out_q, "nid": out_n, "sim": out_s})

    local = corpus.select(id_col, vec_col).mapInPandas(
        topk_map, f"qid {id_type}, nid {id_type}, sim double"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple = (),
    probe_dim: bool = True,
) -> DataFrame:
    """-> (vec_id, *keep, bucket): sign pattern against n_planes
    pseudo-random hyperplanes. Planes are derived deterministically from
    (seed, plane, dim) via a portable integer mix of md5 — no
    driver-side randomness, so the same bucketing falls out on any
    cluster size. ``keep`` carries extra columns (e.g. the vector)
    through the SAME projection so callers never need to join this
    output back to its own input — Spark re-executes the upstream for a
    self-join's second alias (measured), so that join shape doubles the
    scan.

    ``probe_dim`` (default on, r8): the plane weights are ROW-
    INDEPENDENT — md5 of (seed, plane, dim-index) — yet the expression
    formulation recomputed n_planes × dim interpreted md5+conv chains
    for EVERY row (HOFs never codegen). One ``limit(1)`` probe of the
    vector width lets the weights become plan-time LITERAL arrays
    (computed driver-side with hashlib — bit-identical to the Catalyst
    md5 family), cutting the per-row work to the unavoidable
    multiply-add; a row wider than the probed dim falls back per
    element to the original md5 expression (``try_element_at`` miss),
    so mixed-width corpora keep exact v1 buckets. Measured 1.1s ->
    0.25s on the sf0.1 corpus bucketing (noop sink, min-of-4).
    ``False`` keeps the pure-lazy expression (no probe action).
    """
    dim_probe = None
    if probe_dim:
        row = vectors.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
        if row and row[0]["d"] is not None and row[0]["d"] > 0:
            dim_probe = int(row[0]["d"])

    def md5_weight(p, i):
        # the exact Catalyst family: first 8 md5-hex chars as long,
        # % 2001 - 1000, scaled — p/i may be ints or int columns
        return (
            md5_long(F.concat_ws("#", F.lit(seed), p, i)) % 2001 - 1000
        ).cast("double") / 1000.0

    if dim_probe is not None:
        from hashlib import md5 as _pymd5

        def lit_weight(p: int, i: int) -> float:
            h = int(
                _pymd5(f"{seed}#{p}#{i}".encode("utf-8")).hexdigest()[:8], 16
            )
            return (h % 2001 - 1000) / 1000.0

        def plane_dot(p: int):
            lits = F.array(
                *[F.lit(lit_weight(p, i)) for i in range(dim_probe)]
            )
            return F.aggregate(
                F.transform(
                    F.col(vec_col),
                    lambda x, i: x.cast("double")
                    * F.coalesce(
                        F.try_element_at(lits, i + 1),
                        md5_weight(F.lit(p), i),
                    ),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )

        planes = F.array(*[plane_dot(p) for p in range(n_planes)])
    else:
        dim = F.size(F.col(vec_col))
        planes = F.transform(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda p: F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.sequence(F.lit(0), dim - 1),
                    lambda x, i: x.cast("double") * md5_weight(p, i),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
    bucket = F.array_join(
        F.transform(planes, lambda d: F.when(d >= 0, "1").otherwise("0")), ""
    )
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        *[F.col(c) for c in keep],
        bucket.alias("bucket"),
    )


def lsh_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.8,
    n_planes: int = 6,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
    observation=None,
) -> DataFrame:
    """-> (vec_a, vec_b, sim): embedding-cosine near-dup pairs on an
    UNLABELED corpus — the scale pattern `embedding_near_dup`'s
    docstring promises (label block -> LSH bucket). Every vector
    explodes to its Hamming-radius probe codes; candidate pairs form
    inside probe buckets (two vectors meet iff their fingerprints are
    within 2·max_hamming bits — within max_hamming they share a middle
    code with certainty), then the exact cosine verifies. Candidate
    volume is bucket-bound, never all-pairs. ``max_bucket`` defaults
    OFF: probe codes span only 2^n_planes values (64 at the default),
    so bucket sizes grow ~N/keyspace with the corpus — a fixed cap
    would eventually drop every bucket and silently zero the output.
    Set it explicitly (with an ``observation`` counting drops, see
    ``dedup.minhash_lsh_pairs``) only for true identical-vector
    clusters, or raise n_planes so buckets stay small.
    """
    from ..operators.dedup import _bucket_pairs, _cap_buckets

    b = hyperplane_lsh_buckets(vectors, n_planes, id_col=id_col, vec_col=vec_col)
    probes = b.select(
        "vec_id",
        F.explode(_probe_buckets(F.col("bucket"), n_planes, max_hamming)).alias("code"),
    )
    buckets = (
        probes.groupBy("code")
        .agg(F.array_sort(F.collect_list("vec_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    buckets = _cap_buckets(buckets, max_bucket, observation)
    cand = (
        buckets.select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.doc_a").alias("vec_a"), F.col("p.doc_b").alias("vec_b"))
        .distinct()
    )
    # unit-normalize each side once; the threshold stays on the RAW dot
    # (oracle semantics), which costs a second _dot evaluation in the
    # pushed-down predicate — still 3x cheaper per pair than the old
    # cosine shape (3 aggregates, also double-evaluated)
    va = unit_vectors(
        vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea")),
        "ea",
    )
    vb = unit_vectors(
        vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb")),
        "eb",
    )
    sim = _dot(F.col("ea"), F.col("eb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .filter(sim >= threshold)
        .select("vec_a", "vec_b", F.round(sim, 4).alias("sim"))
    )


def ivf_assignments(
    vectors: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
):
    """IVF coarse quantizer: k-means cells over the corpus.

    Returns (assignments df with `cell`, centroids list). The centroid
    model is tiny and broadcast to score queries; training uses MLlib
    KMeans with a fixed seed so the index is reproducible.

    ``fit_fraction``: fit the quantizer on a DETERMINISTIC sample of
    the corpus (md5-hash keep decisions keyed on the row id — the same
    bit-stable-at-any-cluster-size discipline as
    ``sample_stratified``, never ``sample()``'s layout-dependent rng),
    then assign ALL rows to the sampled centroids. K-means cell
    centers converge on a fraction of the data (they estimate a
    density, not per-row facts), so this cuts the fit's cost —
    KMeans's per-iteration full-corpus pass — by ~1/fit_fraction while
    recall stays at parity (pinned in tests). The 100 TB shape: the
    fit should NEVER scan the full corpus 20 times; assignment
    (one pass) is the only full-corpus stage. Note the SAMPLE is
    bit-stable across layouts but the centroids still inherit MLlib
    k-means||'s layout-sensitive init (true of the full fit as well) —
    reproducibility of a served index comes from persisting it
    (``save_ivf_index``), not from refitting.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ..functions.hashing import md5_long

    feat = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    train = feat
    if fit_fraction is not None:
        if not 0.0 < fit_fraction <= 1.0:
            raise ValueError(f"fit_fraction {fit_fraction} outside (0, 1]")
        h = (
            md5_long(
                F.concat_ws(
                    "#", F.lit(f"ivf#{seed}"), F.col("vec_id").cast("string")
                )
            )
            % 1000000
        )
        train = feat.filter(h < F.lit(int(round(fit_fraction * 1000000))))
        # fail fast with a clear message instead of an opaque MLlib
        # error when the sample is too thin to carry k centroids (the
        # cap+1 LIMIT bounds the check to one cheap early-stop scan)
        n_train = len(train.select("vec_id").limit(n_cells).collect())
        if n_train < n_cells:
            raise ValueError(
                f"fit_fraction={fit_fraction} sampled only {n_train} "
                f"rows (< n_cells={n_cells}) — raise fit_fraction or "
                "drop fit_fraction for a full fit"
            )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    assigned = model.transform(feat).select(
        "vec_id", "embedding", F.col("prediction").alias("cell")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def _assign_query_cells(
    queries: DataFrame,
    centroids: list,
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (qid, cell): each query exploded to its n_probe nearest cells.

    The centroid matrix ships in the task closure (tiny by contract) and
    distances are one numpy pass per Arrow batch, so the PLAN is
    constant-size regardless of n_cells. The Catalyst-literal
    alternative (``_nearest_cells``) builds one struct expression per
    centroid with per-dimension literal arrays — at a realistic 100 TB
    index (n_cells ≥ 4096, dim ≥ 768) that is millions of literal nodes
    and plan compile/codegen blows up before any data moves.

    Tie semantics match ``_nearest_cells`` exactly: stable argsort on
    squared L2 breaks ties by ascending cell index, the same order as
    ``array_sort`` over struct(d, cell).
    """
    import numpy as np
    import pandas as pd

    cmat = np.asarray(centroids, dtype=np.float64)
    k = min(n_probe, len(centroids))

    def assign(batches):
        from ..functions.worker import pin_worker_threads

        pin_worker_threads()
        for pdf in batches:
            out_q: list = []
            out_c: list = []
            for qid, vec in zip(pdf[id_col], pdf[vec_col]):
                q = np.asarray(list(vec), dtype=np.float64)
                d = ((cmat - q) ** 2).sum(axis=1)
                for c in np.argsort(d, kind="stable")[:k]:
                    out_q.append(qid)
                    out_c.append(int(c))
            yield pd.DataFrame({"qid": out_q, "cell": out_c})

    id_type = queries.schema[id_col].dataType.simpleString()
    return queries.select(id_col, vec_col).mapInPandas(
        assign, f"qid {id_type}, cell int"
    )


def _nearest_cells(vec_col, centroids, n_probe: int):
    """Indices of the n_probe nearest centroids (JVM-side expressions).

    Plan size is LINEAR in n_cells × dim — kept only as the parity
    oracle for ``_assign_query_cells``; do not use beyond toy n_cells."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec_col,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(
        F.transform(F.array_sort(dists), lambda s: s["cell"]), 1, n_probe
    )


def ivf_search(
    assigned: DataFrame,
    centroids: list,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    catalyst_assign: bool = False,
) -> DataFrame:
    """Search a prebuilt IVF index (``ivf_assignments`` output). The
    index is built ONCE and amortized over many query waves — the
    assignments table persists like any table (TableIO/Iceberg), the
    centroid list is a tiny JSON-able model. Candidates come only from
    each query's n_probe nearest cells.

    Cell assignment for the (small, broadcast) query side runs as a
    numpy argmin in one mapInPandas (constant plan size in n_cells);
    ``catalyst_assign=True`` switches to the literal-expression variant
    — parity-tested equal, but its plan grows with n_cells, so it exists
    only as the test oracle."""
    c = assigned.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("nvec"), "cell"
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    if catalyst_assign:
        q = q.withColumn(
            "cell", F.explode(_nearest_cells(F.col("qvec"), centroids, n_probe))
        )
    else:
        cells = _assign_query_cells(queries, centroids, n_probe, id_col, vec_col)
        q = q.join(cells, on="qid")
    # per-pair cost: one _dot over unit vectors (zero-norm rows drop at
    # normalize time; cell assignment above used the raw vectors, which
    # k-means needs)
    c = unit_vectors(c, "nvec")
    q = unit_vectors(q, "qvec")
    # no (qid, nid) dedup stage, unlike _ann_rank: IVF partitions the
    # corpus — every row owns exactly ONE cell and a query's n_probe
    # cells are distinct (stable argsort / sorted slice), so the cell
    # join cannot emit the same (qid, nid) twice and the old
    # groupBy+max was an identity that cost a full extra Exchange
    # before the ranking window (r8 plan audit: 3 exchanges -> 2).
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(_dot(F.col("qvec"), F.col("nvec")), 4).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
) -> DataFrame:
    """IVF ANN: candidates come only from the query's n_probe nearest
    cells — the scale path when brute force is too wide. Recall improves
    with n_probe (n_probe = n_cells degenerates to exact search over a
    partitioned corpus). Convenience wrapper: builds the index and
    searches it once; long-lived corpora should build with
    ``ivf_assignments`` and reuse via ``ivf_search``.
    ``fit_fraction`` passes through to the quantizer fit (deterministic
    sampled k-means — see :func:`ivf_assignments`)."""
    assigned, centroids = ivf_assignments(
        corpus, n_cells, id_col=id_col, vec_col=vec_col,
        fit_fraction=fit_fraction,
    )
    return ivf_search(assigned, centroids, queries, k, n_probe, id_col, vec_col)


def save_ivf_index(io, assigned: DataFrame, centroids: list,
                   name: str = "ivf") -> None:
    """Persist a built IVF index through the TableIO facade (Iceberg or
    parquet+manifest): assignments as `<name>_assignments`, the tiny
    centroid model as `<name>_centroids` rows (cell, embedding). The
    build-once/search-many split then spans JOBS, not just one session.
    """
    spark = assigned.sparkSession
    io.write(assigned, f"{name}_assignments")
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, embedding array<double>",
    )
    io.write(cent_df, f"{name}_centroids")


def load_ivf_index(io, name: str = "ivf"):
    """-> (assigned, centroids) ready for ``ivf_search``."""
    assigned = io.read(f"{name}_assignments")
    rows = io.read(f"{name}_centroids").collect()  # tiny by contract
    centroids = [list(map(float, r["embedding"]))
                 for r in sorted(rows, key=lambda r: r["cell"])]
    return assigned, centroids


def _probe_buckets(bucket_col, n_planes: int, max_hamming: int):
    """Array of bucket codes within Hamming distance ``max_hamming`` of
    the query's code (multiprobe LSH: instead of many hash tables, one
    table probed at the nearest few codes — Lv et al., VLDB'07). The
    flip masks are enumerated at plan time (combinatorial in
    ``max_hamming``, tiny for d ≤ 2) and applied JVM-side."""
    from itertools import combinations

    def flip(positions):
        out = bucket_col
        for p in positions:
            ch = F.substring(out, p + 1, 1)
            flipped = F.when(ch == "1", "0").otherwise("1")
            out = F.concat(
                F.substring(out, 1, p),
                flipped,
                F.substring(out, p + 2, n_planes - p - 1),
            )
        return out

    probes = [bucket_col]
    for d in range(1, max_hamming + 1):
        probes.extend(flip(c) for c in combinations(range(n_planes), d))
    return F.array(*probes)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multiprobe hyperplane LSH: the corpus is
    bucketed ONCE; each (small, broadcast) query probes every bucket
    within ``max_hamming`` bit flips of its own code. Recall rises
    steeply with the probe radius while the corpus-side cost stays a
    single bucketing pass + one bucket-keyed join — the scale path when
    brute force is too wide. ``max_hamming=0`` is the classic
    single-bucket probe."""
    # vector rides through the bucketing projection (keep=) — joining
    # the bucket table back to the corpus would re-execute the corpus
    # scan for the join's second alias AND pay an id-keyed exchange
    c = hyperplane_lsh_buckets(
        corpus, n_planes, id_col=id_col, vec_col=vec_col, keep=(vec_col,)
    ).select(
        F.col("vec_id").alias("nid"), F.col(vec_col).alias("nvec"), "bucket"
    )
    q = (
        hyperplane_lsh_buckets(
            queries, n_planes, id_col=id_col, vec_col=vec_col, keep=(vec_col,)
        )
        .select(
            F.col("vec_id").alias("qid"), F.col(vec_col).alias("qvec"), "bucket"
        )
        .withColumn(
            "bucket",
            F.explode(_probe_buckets(F.col("bucket"), n_planes, max_hamming)),
        )
    )
    return _ann_rank(c, q, k)


def _ann_rank(c: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Shared scoring tail of the ANN shapes: broadcast bucket join ->
    one `_dot` per pair -> probe-dedup -> per-query rank.

    unit-normalizes AFTER bucketing (hyperplane signs are
    scale-invariant, so the codes are identical); zero-norm rows drop
    here — the same rows the old NULL-cosine filter removed — and the
    per-pair score is ONE _dot, not a twice-evaluated 3-aggregate
    cosine (see unit_vectors)."""
    c = unit_vectors(c, "nvec")
    q = unit_vectors(q, "qvec")
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(_dot(F.col("qvec"), F.col("nvec")), 4).alias("sim"))
        # a neighbor can surface from several probe buckets — dedup
        .groupBy("qid", "nid")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk_two_scan(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """A/B twin of :func:`ann_topk` kept ONLY as the measured
    alternative plan shape (``python bench.py --ann-ab``): buckets are
    computed on a NARROW projection and the vectors re-attached by an
    id-keyed join back to the corpus. Identical results; different
    physical plan — the join-back re-executes the corpus scan for the
    second alias (Spark does not reuse exchanges across self-join
    aliases — measured, see dedup module docstring) and adds an
    id-keyed exchange. ann_topk's single-pass shape won both A/B
    fixtures (BASELINE.md); use ann_topk."""
    b = hyperplane_lsh_buckets(corpus, n_planes, id_col=id_col, vec_col=vec_col)
    c = (
        b.select(F.col("vec_id").alias("nid"), "bucket")
        .join(
            corpus.select(
                F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")
            ),
            on="nid",
        )
    )
    q = (
        hyperplane_lsh_buckets(
            queries, n_planes, id_col=id_col, vec_col=vec_col, keep=(vec_col,)
        )
        .select(
            F.col("vec_id").alias("qid"), F.col(vec_col).alias("qvec"), "bucket"
        )
        .withColumn(
            "bucket",
            F.explode(_probe_buckets(F.col("bucket"), n_planes, max_hamming)),
        )
    )
    return _ann_rank(c, q, k)
