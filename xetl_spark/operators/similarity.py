"""Similarity search over embedding columns (array<float>).

Two paths, same contract:
- brute-force cosine top-k: exact; broadcast the (small) query side so
  the big corpus never shuffles — per-partition scan + local top-k.
- LSH-bucketed ANN (random hyperplanes): approximate; candidates come
  from signature-bucket equi-joins, the 100 TB path.

Vector math: hot paths (cell assignment, candidate-pair scoring) are
Arrow-batched numpy — one BLAS matmul / row-wise product-sum per
batch (r13; Catalyst higher-order lambdas evaluate interpreted, and
the sf1 sweep measured them at ~2.5k dots/s/core on pair scoring).
The HOF forms (_dot/_norm) remain for one-off expressions where the
multiplier is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xetl_spark.operators.util import ensure_parallelism


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _pair_cos(a, b):
    """Vectorized dot product of two array columns (Arrow batch →
    numpy row-wise product-sum). Replaces the interpreted zip_with/
    aggregate form on PAIR-scoring hot paths (r13 — the sf1 sweep
    measured the HOF form at ~2.5k pairs/s/core: candidate scoring in
    semdedup/IVF/LSH multiplied it by millions of pairs)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def dot(x, y):
        if not len(x):
            return pd.Series([], dtype="float64")
        X = np.stack(x.to_numpy())
        Y = np.stack(y.to_numpy())
        return pd.Series((X * Y).sum(axis=1))

    return dot(a, b)


def _centroid_sim(unit_col: str, cell_col: str, centroids: list[list[float]]):
    """Cosine of each row's unit vector to its ASSIGNED centroid —
    the vectorized twin of element_at(array(<dot per centroid>), cell)
    (which cost |corpus| x |centroids| interpreted HOF dots)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("double")
    def sim(u, cell):
        if not len(u):
            return pd.Series([], dtype="float64")
        X = np.stack(u.to_numpy())
        return pd.Series((X * C[cell.to_numpy()]).sum(axis=1))

    return sim(F.col(unit_col), F.col(cell_col))


def with_unit_vectors(df: DataFrame, vec_col: str, out_col: str = "__unit") -> DataFrame:
    """Pre-normalize embeddings to unit length (double precision) so
    cosine reduces to a dot product downstream."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    return df.withColumn(out_col, F.transform(v, lambda x: x / n))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    exclude_self: bool = True,
    max_queries: int = 65536,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row against the corpus.

    Execution shape for scale: the (small, by contract) query side is
    collected once and closure-broadcast as a dense float64 matrix; each
    corpus partition computes a BLAS matmul (Arrow batch → numpy) and
    emits only its LOCAL top-k per query, so the shuffle carries
    |partitions| × |queries| × k rows — never the full similarity
    matrix. A final window takes the global top-k.

    (A pure-Catalyst zip_with/aggregate formulation is ~50× slower:
    higher-order array lambdas are interpreted per element, not
    codegen'd — measured on the sf0.1 fixture.)

    Returns (query_id, neighbor_id, cos_sim, nn_rank).
    """
    import numpy as np
    import pandas as pd

    # the query side is collected + closure-broadcast: enforce the
    # "small by contract" assumption instead of silently OOMing the
    # driver on a mis-sized call (limit(n+1) costs one extra row, not
    # a count job)
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"cosine_topk_bruteforce query side exceeds max_queries="
            f"{max_queries}; this operator broadcasts the query matrix — "
            "split the query set, raise max_queries deliberately, or use "
            "ivf_ann_topk/lsh_ann_topk for large-to-large search"
        )
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)

    local_k = k + 1 if exclude_self else k  # self may occupy one slot

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            sims = C @ Q.T  # (n_corpus_rows, n_queries)
            n = sims.shape[0]
            take = min(local_k, n)
            ids = pdf[id_col].to_numpy()
            out_q, out_n, out_s = [], [], []
            for j in range(sims.shape[1]):
                # local cut under the SAME total order as the global
                # tie-break (sim desc, id asc) — exact under ties
                order = np.lexsort((ids, -sims[:, j]))[:take]
                out_q.extend([q_ids[j]] * len(order))
                out_n.extend(ids[order])
                out_s.extend(sims[order, j])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    scored = (
        ensure_parallelism(corpus)
        .select(id_col, vec_col)
        .mapInPandas(score, schema="query_id long, neighbor_id long, cos_sim double")
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("nn_rank", F.row_number().over(w)).filter(
        F.col("nn_rank") <= k
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side constants —
    tiny, shipped in the plan; no RNG on executors)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def lsh_signature(df: DataFrame, vec_col: str, planes: list[list[float]]):
    """Sign-of-projection bit signature packed into a long column.

    Expression form (readable, JVM-side) — kept for single-table use
    and tests; multi-table pipelines should use lsh_signatures_all,
    which computes every table's signature in ONE BLAS matmul per
    Arrow batch instead of tables x planes interpreted folds."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(v, F.array(*[F.lit(float(x)) for x in p]))
        sig = sig + F.when(proj > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return sig


def lsh_signatures_all(
    vec_col: str, num_planes: int, num_tables: int, dim: int, seed: int = 42
):
    """All ``num_tables`` hyperplane signatures in one vectorized pass:
    an Arrow-batched pandas UDF computes the full projection matrix
    X @ P.T (one BLAS matmul for tables x planes planes) and bit-packs
    per table. Replaces tables x planes x dim interpreted lambda steps
    per row (~48 aggregate folds at the 6x8 default) with one numpy
    call — measured ~5x on the signature stage. Sign-of-projection is
    scale-invariant, so raw or unit vectors give identical signatures;
    the plane set matches _hyperplanes(seed + 1000*t) exactly, making
    this a drop-in for per-table lsh_signature calls."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P = np.concatenate(
        [np.asarray(_hyperplanes(dim, num_planes, seed + 1000 * t)) for t in range(num_tables)]
    )  # (tables*planes, dim)
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def sigs(s):  # pd.Series of lists -> pd.Series of lists
        import pandas as pd

        if len(s) == 0:
            return pd.Series([], dtype=object)
        # null / wrong-length vectors can't enter the matmul: emit a
        # null signature array instead of crashing the batch — the
        # posexplode downstream drops those rows, so a malformed doc
        # simply isn't banded (it can't be a near-dup candidate).
        vals = s.tolist()
        good = [i for i, v in enumerate(vals) if v is not None and len(v) == dim]
        out = [None] * len(vals)
        if good:
            X = np.array([vals[i] for i in good], dtype=np.float64)
            bits = (X @ P.T) > 0  # (n, tables*planes)
            packed = (bits.reshape(len(X), num_tables, num_planes) * weights).sum(axis=2)
            for j, i in enumerate(good):
                out[i] = packed[j].astype(np.int64)
        return pd.Series(out, dtype=object)

    return sigs(F.col(vec_col))


def cosine_near_duplicates(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.9,
    num_planes: int | None = None,
    num_tables: int | None = None,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: int | None = 5000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH candidate
    generation (bucket-local pairing on (table, signature)) + exact
    cosine verification ≥ threshold.

    The dedup twin of LSH ANN: at cos ≥ 0.9 (θ ≤ 26°) a plane agrees
    with p ≈ 0.86, so an 8-plane bucket collides with p ≈ 0.29 per
    table — while random pairs (θ≈90°) collide at 0.5^planes per
    table, which is what keeps candidates near-linear.

    CORPUS-SCALED PARAMETERS (r14): the signature space must grow
    with the corpus — with a fixed 8 planes (256 signatures), 200k
    near-random vectors pile ~780 per bucket and pair generation
    emits ~470M candidates (the sf10 sweep death: hours of verify
    then a driver result-size abort). Defaults of ``None`` derive
    both knobs from the data:

    - ``num_planes`` = max(8, ceil(log2(n / 32))) — expected random
      bucket load ≤ ~32, so per-bucket pair cost stays bounded as the
      corpus grows (one count() job on the persisted unit table).
    - ``num_tables`` from the standard LSH recall relation: the
      smallest t with 1 - (1 - p_θ^planes)^t ≥ 0.87 at ``threshold``
      (p_θ = 1 - θ/π), clamped to [4, 24]. In the near-copy regime
      this operator targets (threshold ≥ 0.9) the clamp is inactive
      up to ~10M vectors; at permissive thresholds on huge corpora
      the 24-table cap trades recall (~0.7 at cos 0.8, 200k vectors)
      for bounded candidates — the ρ = ln p₁/ln p₂ LSH curse, which
      no parameter choice escapes (candidates grow ~n^(1+ρ)).
      Exact copies and scaled copies (cos = 1) hash identically in
      every table, so their recall is 1.0 at any setting.

    ``max_bucket_size`` is the quadratic-blowup guard, identical to
    lsh_candidate_pairs: a degenerate corpus (e.g. many zero/identical
    embeddings sharing one signature) would otherwise emit |bucket|²/2
    pairs from one bucket. Oversized buckets are dropped — their
    members are near-identical and are caught by exact dedup.
    Returns (id_a, id_b, cos_sim).
    """
    c = with_unit_vectors(ensure_parallelism(corpus), vec_col, "__u").persist()
    if num_planes is None or num_tables is None:
        import math

        n = c.count()  # materializes the persisted unit table it reuses
        if num_planes is None:
            num_planes = max(8, math.ceil(math.log2(max(n, 2) / 32)))
        if num_tables is None:
            p_theta = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
            miss = 1.0 - p_theta**num_planes
            if miss <= 1e-9:
                num_tables = 4
            else:
                num_tables = min(
                    24, max(4, math.ceil(math.log(0.13) / math.log(miss)))
                )
    # Verify INSIDE the bucket (r14): both vectors of every candidate
    # pair already sit in the same (tbl, sig) group, so each bucket
    # scores itself with ONE BLAS gram matrix and emits only the pairs
    # that pass the threshold. The previous shape — ids-only candidate
    # pairs, then re-attaching vectors by two id-keyed joins — moved a
    # |vector|-sized payload per CANDIDATE pair through the exchange
    # between the joins: at the sf10 fixture that was 105M candidates
    # × 512 B ≈ 55 GB of scratch for one stage (measured), while
    # banding-with-vectors is tables × corpus × |vector| ≈ 2.5 GB and
    # scales linearly with the corpus. Cross-table rediscovery of the
    # same pair is deduped AFTER verification, when only output-sized
    # true near-dups remain; max() is the deterministic canonical
    # reduction (the same pair scored in different-sized buckets can
    # differ in the last ulp under BLAS blocking). Per-task memory is
    # bounded by the bucket cap (cap × dim doubles).
    import numpy as np
    import pandas as pd

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cos_sim double"
    thr = float(threshold)
    cap = max_bucket_size

    def _bucket_verify(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = len(pdf)
        if m < 2 or (cap is not None and m > cap):
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        X = np.stack(pdf["__u"].to_numpy()[order])
        G = X @ X.T
        iu, ju = np.triu_indices(m, k=1)
        sims = G[iu, ju]
        keep = sims >= thr
        return pd.DataFrame(
            {"id_a": ids[iu[keep]], "id_b": ids[ju[keep]], "cos_sim": sims[keep]}
        )

    banded = c.select(
        F.col(id_col).alias("id"),
        F.col("__u"),
        F.posexplode(
            lsh_signatures_all(vec_col, num_planes, num_tables, dim, seed)
        ).alias("tbl", "sig"),
    )
    pairs = banded.groupBy("tbl", "sig").applyInPandas(_bucket_verify, out_schema)
    return pairs.groupBy("id_a", "id_b").agg(F.max("cos_sim").alias("cos_sim"))


def _nearest_cells(unit_col: str, centroids: list[list[float]], n: int):
    """Column expr: the ``n`` nearest centroid indices (by cosine on
    unit vectors) as an array<int>. Centroids are closure-captured as
    a dense matrix and each Arrow batch scores with ONE BLAS matmul
    (r13 — the prior per-centroid HOF-dot array cost
    |rows| x |centroids| x dim interpreted steps, the dominant term of
    the sf1 semdedup/IVF sweep timeouts). Stable argsort on -sim keeps
    the old comparator's ascending-cell tie order."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    m = min(n, C.shape[0])

    @pandas_udf("array<int>")
    def nn(u):
        if not len(u):
            return pd.Series([], dtype="object")
        X = np.stack(u.to_numpy())
        S = X @ C.T
        idx = np.argsort(-S, axis=1, kind="stable")[:, :m]
        return pd.Series([r.astype("int32").tolist() for r in idx])

    return nn(F.col(unit_col))


#: centroid memo — a KMeans fit is a full corpus scan (several, with
#: iterations), so an index BUILD and its PROBES inside one pipeline
#: invocation should pay it once. Keyed by (application id, the corpus
#: plan's semantic hash, params). Scope (r14): the registry's load()
#: clears this memo at every query construction — the same boundary as
#: spark.catalog.clearCache() — so bench reps and repeated oracle runs
#: re-fit from the parquet inputs every time (cross-invocation reuse of
#: computed results is the memoization the bench contract forbids).
#: Mutating files UNDER an unchanged path between calls is the one case
#: the key can't see — clear_centroid_cache() for that.
_CENTROID_CACHE: dict[tuple, list[list[float]]] = {}
#: FIFO bound: centroid lists are small (n_clusters × dim floats) but a
#: long-lived session fitting many corpora must not grow without limit
_CENTROID_CACHE_MAX = 32
# Lloyd's-assignment working set bound: rows are blocked so each
# (block, k) distance matrix stays ~64 MB of float64 regardless of k
# (at the caps, 65536 x 4096 unblocked is ~2 GB per temporary x several
# temporaries — a driver OOM risk). Module-level so tests can shrink it
# and prove blocked == unblocked.
_ASSIGN_BLOCK_ELEMS = 8_000_000


def clear_centroid_cache() -> None:
    _CENTROID_CACHE.clear()


def ivf_fit_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_clusters: int = 16,
    seed: int = 42,
    cache: bool = True,
    max_fit_sample: int = 65536,
    iters: int = 20,
) -> list[list[float]]:
    """KMeans-fit IVF cell centroids over unit vectors; returns them as
    plain lists (tiny — driver-held, plan-shipped). Fits are memoized
    per (session, corpus plan, params) unless ``cache=False``.

    The fit runs driver-side Lloyd's on a BOUNDED deterministic sample
    (the first ``max_fit_sample`` rows under md5 ordering — the pq.py
    _fit_sample precedent; partitioning-independent, TakeOrdered not a
    global sort). r13: the previous pyspark.ml KMeans fit ran dozens
    of kmeans||-init + Lloyd stage rounds PER FIT — ~60s of scheduler
    latency at k=80 on local mode, the dominant term of the sf1
    semdedup sweep timeout — while a numpy Lloyd on the same sample is
    ~1s and the assignment of the full corpus stays distributed."""
    import numpy as np

    key = None
    if cache:
        try:
            key = (
                corpus.sparkSession.sparkContext.applicationId,
                corpus._jdf.queryExecution().analyzed().semanticHash(),
                vec_col,
                n_clusters,
                seed,
            )
        except Exception:  # e.g. Connect-mode DataFrames have no _jdf
            key = None
        if key is not None and key in _CENTROID_CACHE:
            return _CENTROID_CACHE[key]

    c = with_unit_vectors(ensure_parallelism(corpus), vec_col, "__uc")
    rows = (
        c.select(F.col("__uc").alias("v"))
        .filter(F.col("v").isNotNull())
        # materialize the sort key as a COLUMN: sorting by the md5
        # expression directly makes Spark's top-K comparator re-cast +
        # re-hash the array per COMPARISON (interpreted, O(n log n)
        # evaluations — measured 16s vs 1s on a 20k x 64-dim corpus)
        .withColumn("__h", F.md5(F.col("v").cast("string")))
        .orderBy("__h")
        .limit(max_fit_sample)
        .collect()
    )
    x = np.asarray([r.v for r in rows], dtype=np.float64)
    if len(x) == 0:
        raise ValueError(
            f"ivf_fit_centroids: corpus has no non-null '{vec_col}' vectors"
        )
    rng = np.random.default_rng(seed)
    k = min(n_clusters, len(x))
    centers = x[rng.choice(len(x), size=k, replace=False)].copy()
    if k < n_clusters:  # degenerate tiny corpus: pad by repetition
        centers = np.vstack([centers] * (n_clusters // k + 1))[:n_clusters]
    xx = (x * x).sum(1)
    # assignment materializes a (block, k) float64 distance matrix; at
    # the caps (65536 sample x 4096 adaptive cells) an unblocked pass is
    # ~2 GB PER TEMPORARY x several temporaries — block rows so the
    # working set stays ~tens of MB regardless of k
    block = max(1, int(_ASSIGN_BLOCK_ELEMS / max(1, len(centers))))
    for _ in range(iters):
        cc = (centers * centers).sum(1)[None, :]
        assign = np.empty(len(x), dtype=np.int64)
        for s in range(0, len(x), block):
            e = min(s + block, len(x))
            # squared-distance via the expansion — no (n, k, d) temporary
            d = xx[s:e, None] - 2.0 * (x[s:e] @ centers.T) + cc
            assign[s:e] = d.argmin(1)
        for j in range(len(centers)):
            pts = x[assign == j]
            if len(pts):
                centers[j] = pts.mean(0)
    centroids = [list(map(float, ctr)) for ctr in centers]
    if key is not None:
        while len(_CENTROID_CACHE) >= _CENTROID_CACHE_MAX:
            _CENTROID_CACHE.pop(next(iter(_CENTROID_CACHE)))
        _CENTROID_CACHE[key] = centroids
    return centroids


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF (inverted-file) search:
    KMeans-partition the corpus, probe only the ``n_probe`` nearest
    cells per query.

    The scale shape: centroids are tiny (broadcast); the corpus is
    scanned once to assign cells (or pre-assigned and written
    partitioned-by-cell via ivf_build_index, making later queries
    partition-pruned scans); each query touches n_probe/n_clusters of
    the data. Beats hyperplane LSH when neighbor cosines are weak,
    because cells adapt to the data distribution.
    """
    centroids = ivf_fit_centroids(corpus, vec_col, n_clusters, seed)
    c = with_unit_vectors(ensure_parallelism(corpus), vec_col, "__uc")
    q = with_unit_vectors(queries, vec_col, "__uq")
    c_assigned = c.select(
        F.col(id_col).alias("neighbor_id"),
        "__uc",
        F.element_at(_nearest_cells("__uc", centroids, 1), 1).alias("cell"),
    )
    q_assigned = q.select(
        F.col(id_col).alias("query_id"),
        "__uq",
        F.explode(_nearest_cells("__uq", centroids, n_probe)).alias("cell"),
    )
    return _ivf_score(c_assigned, q_assigned, k)


def _ivf_score(c_assigned: DataFrame, q_assigned: DataFrame, k: int) -> DataFrame:
    cand = c_assigned.join(q_assigned, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.select(
        "query_id", "neighbor_id", _pair_cos(F.col("__uq"), F.col("__uc")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("nn_rank", F.row_number().over(w)).filter(
        F.col("nn_rank") <= k
    )


def ivf_build_index(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_clusters: int = 16,
    seed: int = 42,
) -> None:
    """Materialize an IVF index: the corpus (id, unit vector) written
    ``partitionBy(cell)`` under ``path``, centroids in a ``_centroids``
    parquet alongside.

    This turns every later ANN query into a PARTITION-PRUNED scan —
    only the probed cells' directories are read (PartitionFilters in
    the scan node), so a 100 TB corpus answers a query batch by
    touching n_probe/n_clusters of its files. Rebuild cadence at scale:
    centroids drift slowly; reassign/rewrite is a full-scan batch job,
    amortized over every query in between.
    """
    centroids = ivf_fit_centroids(corpus, vec_col, n_clusters, seed)
    c = with_unit_vectors(ensure_parallelism(corpus), vec_col, "__u")
    assigned = c.select(
        F.col(id_col).alias("id"),
        F.col("__u").alias("unit"),
        F.element_at(_nearest_cells("__u", centroids, 1), 1).alias("cell"),
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    spark = corpus.sparkSession
    rows = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(centroids)]
    spark.createDataFrame(rows, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_query_index(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k cosine ANN against a persisted IVF index (ivf_build_index).

    Probed cells become a partition filter (``cell IN (...)``) on the
    index scan, so only those directories are read. The probed-cell set
    is bounded by n_clusters (collected driver-side — tiny), never by
    corpus or query count.
    """
    centroids = [
        list(r.centroid)
        for r in spark.read.parquet(f"{path}/_centroids").orderBy("cell").collect()
    ]
    q = with_unit_vectors(queries, vec_col, "__uq").select(
        F.col(id_col).alias("query_id"),
        F.col("__uq"),
        F.explode(_nearest_cells("__uq", centroids, n_probe)).alias("cell"),
    )
    probed = sorted({r.cell for r in q.select("cell").distinct().collect()})
    index = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probed))  # partition-pruned scan
        .select(F.col("id").alias("neighbor_id"), F.col("unit").alias("__uc"), "cell")
    )
    return _ivf_score(index, q, k)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    num_planes: int = 6,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via random-hyperplane LSH.

    ``num_tables`` independent signature tables; candidates are pairs
    sharing a full signature in any table (equi-join on (table, sig) —
    shuffle-partitioned, skew-bounded). Exact cosine is computed only on
    candidates, then per-query top-k. Recall is property-tested against
    the brute-force oracle in tests/.

    Tuning: collision probability per table is (1-θ/π)^num_planes, so
    fewer planes → higher recall AND more candidates. The 6×8 default
    favors recall (~0.8+ for neighbors at cos≥0.7); scale deployments
    raise num_planes to cut candidate volume per byte scanned.
    """
    # Corpus-side banding carries IDS ONLY (see cosine_near_duplicates:
    # shipping vectors through the signature join multiplies shuffle
    # bytes by num_tables). The small query side keeps its vector —
    # it rides a broadcast — and corpus vectors are re-attached to the
    # deduped candidate set by one id-keyed join.
    c = with_unit_vectors(ensure_parallelism(corpus), vec_col, "__uc").persist()
    q = with_unit_vectors(queries, vec_col, "__uq")
    c_units = c.select(F.col(id_col).alias("neighbor_id"), "__uc")

    def signatures(df: DataFrame, unit_col: str, idname: str, keep_vec: bool) -> DataFrame:
        cols = [F.col(id_col).alias(idname)] + ([F.col(unit_col)] if keep_vec else [])
        return df.select(
            *cols,
            F.posexplode(
                lsh_signatures_all(vec_col, num_planes, num_tables, dim, seed)
            ).alias("tbl", "sig"),
        )

    cs = signatures(c, "__uc", "neighbor_id", keep_vec=False)
    qs = signatures(q, "__uq", "query_id", keep_vec=True)
    cand = (
        cs.join(F.broadcast(qs), on=["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__uq")
        # dedup keyed by neighbor_id: the vector re-attach join below
        # is neighbor_id-keyed, so the dedup exchange does double duty
        # (guide §2.4; skew bounded — per-neighbor candidates are
        # capped by the broadcast-small query side)
        .repartition("neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # shuffle_hash: c_units carries corpus vectors (one row per doc) —
    # same AQE wire-vs-JVM sizing trap as cosine_near_duplicates'
    # re-attach; never let it become a broadcast side (r14 sf10).
    scored = cand.join(c_units.hint("shuffle_hash"), "neighbor_id").select(
        "query_id", "neighbor_id", _pair_cos(F.col("__uq"), F.col("__uc")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("nn_rank", F.row_number().over(w)).filter(
        F.col("nn_rank") <= k
    )


def semdedup(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_clusters: int | None = 16,
    seed: int = 42,
    max_cluster_size: int | None = 5000,
    max_fit_sample: int = 65536,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): drop documents whose
    EMBEDDINGS nearly coincide — paraphrases and templated rewrites
    that no lexical dedup (MinHash/SimHash) can see.

    Exactly the paper's recipe:

    1. k-means cluster the unit embeddings (``ivf_fit_centroids`` —
       fit is memoized per corpus plan); assign each doc its nearest
       cell and its cosine to that centroid.
    2. Within each cluster only, emit candidate pairs and keep those
       with cosine >= ``threshold``. Pair generation is cluster-local
       (one groupBy shuffle + streamed posexplode — the
       lsh_candidate_pairs shape), so cost is Σ|cell|², never corpus².
       The paper keeps cells small by using large k: pass
       ``n_clusters=None`` for the adaptive default
       max(16, min(max_fit_sample//16, n/250)) — ~250-vector cells up
       to ~1M vectors (r13: a fixed k=8 at a 20k corpus meant 2.5k-row
       cells and ~25M HOF dot products; the registry-wide sf1 sweep
       caught it as a 120s+ timeout). The k ceiling derives from the
       fit sample (≥16 sample points per centroid), so raising
       ``max_fit_sample`` raises it in lockstep — see the inline note.
       ``max_cluster_size`` stays the quadratic guard for degenerate
       clusterings — oversized cells are SKIPPED, i.e. their members
       are exempt from semantic dedup entirely (every one comes back
       keep=True as its own singleton group; they remain candidates
       through exact dedup upstream). The exemption is pinned by a
       planted test (tests/test_llm_ops.py).
    3. Connected components over the pair graph → duplicate groups;
       per group KEEP the member FARTHEST from its centroid (lowest
       centroid cosine — the paper's diversity-preserving choice),
       ties broken by min id.

    Returns (id, cell, centroid_sim, group, keep) — one row per input
    doc; singletons keep themselves. 100 TB shape: every vector
    shuffles exactly ONCE (into its cell, inside the bucket rows — no
    id-keyed re-attach joins over the candidate set, which dwarfs the
    corpus when duplicates are dense); pair scoring is Arrow-batched
    in place; CC is one cell-partitioned shuffle (pairs never cross
    cells); centroids plan-shipped.
    """
    from xetl_spark.operators.graph import partitioned_components

    # persisted with no unpersist, matching cosine_near_duplicates: the
    # KMeans fit materializes it NOW and the returned lazy plan reads it
    # again — unpersisting before execution would recompute everything
    c = with_unit_vectors(ensure_parallelism(corpus), vec_col, "__u").persist()
    if n_clusters is None:
        # adaptive cell count: ~250 vectors per cell (the count is
        # against the just-persisted table the k-means fit reads next).
        # The ceiling is NOT arbitrary: it derives from the bounded fit
        # sample — below ~16 sample points per centroid the Lloyd's fit
        # is noise (empty/singleton cells), so cap k at max_fit_sample
        # // 16 (= 4096 at the 65536 default). Centroid memory is never
        # the binding constraint (4096 x 64-dim x 8 B ≈ 2 MB,
        # plan-shipped). Beyond ~1M vectors cells grow linearly with n
        # again; to keep ~250-vector cells, raise max_fit_sample in
        # lockstep (driver cost: sample x dim x 8 B collect + the
        # row-blocked assignment — 1M x 64 ≈ 512 MB, the documented
        # driver-memory trade).
        n_clusters = max(16, min(max_fit_sample // 16, c.count() // 250))
    centroids = ivf_fit_centroids(
        c, "__u", n_clusters=n_clusters, seed=seed,
        max_fit_sample=max_fit_sample,
    )
    assigned = c.select(
        F.col(id_col).alias("id"),
        F.element_at(_nearest_cells("__u", centroids, 1), 1).alias("cell"),
        "__u",
    ).withColumn(
        # one vectorized pass against the assigned centroid (r13 — the
        # per-centroid HOF-dot array cost |corpus| x k interpreted dots)
        "centroid_sim",
        _centroid_sim("__u", "cell", centroids),
    )
    # vectors travel WITH their cell group (struct array, ~250 x dim
    # per row at the adaptive cell size; the max_cluster_size cap
    # bounds the degenerate case at cap x dim x 8 B ≈ 2.5 MB/row), so
    # candidate pairs are generated with BOTH vectors in place — no
    # id-keyed re-attach joins. r14: the two joins shuffled the
    # candidate set twice (at sf10 that is 2 x 29M rows); this shape
    # shuffles each vector exactly once, into its cell.
    buckets = (
        assigned.groupBy("cell")
        .agg(
            F.array_sort(F.collect_list(F.struct("id", "__u"))).alias("ds")
        )
        .filter(F.size("ds") > 1)
    )
    if max_cluster_size is not None:
        buckets = buckets.filter(F.size("ds") <= max_cluster_size)
    cand = (
        buckets.select(
            "cell", F.col("ds"), F.posexplode("ds").alias("__i", "a")
        )
        .select(
            "cell",
            "a",
            F.explode(F.slice("ds", F.col("__i") + 2, F.size("ds"))).alias(
                "b"
            ),
        )
    )
    pairs = (
        cand.select(
            "cell",
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _pair_cos(F.col("a.__u"), F.col("b.__u")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    # pairs are cell-local by construction (candidates never cross
    # cells), so components are too: one-shuffle union-find per cell
    # instead of iterative global min-label rounds (r14 — CC round
    # scheduler latency was semdedup's remaining sf1 wall)
    comp = partitioned_components(pairs, "cell", "id_a", "id_b")
    meta = assigned.select("id", "cell", "centroid_sim")
    grouped = meta.join(comp, meta.id == comp.node, "left").select(
        "id", "cell", "centroid_sim", F.coalesce("comp", "id").alias("group")
    )
    # keeper per group: farthest from centroid (min cosine), then min id
    keepers = grouped.groupBy("group").agg(
        F.min(F.struct("centroid_sim", "id")).alias("__k")
    )
    return (
        grouped.join(keepers, "group")
        .select(
            "id",
            "cell",
            "centroid_sim",
            "group",
            (F.col("id") == F.col("__k.id")).alias("keep"),
        )
    )


def incremental_semdedup(
    new_df: DataFrame,
    store: DataFrame | None,
    centroids_df: DataFrame | None,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = 5000,
):
    """Cross-run SEMANTIC dedup ingestion — the SemDeDup twin of
    incremental_minhash_dedup (operators/dedup.py): drop rows of
    ``new_df`` whose embedding near-coincides (cosine ≥ threshold)
    with the historical ``store`` or with a lower-id row in the same
    batch, and return the updated store.

    The k-means centroids are fitted ONCE (on the first batch, when
    ``centroids_df`` is None) and reused verbatim for every later
    increment — new shards screen without refitting, so cell
    assignments stay stable across runs and old docs never need
    re-clustering. ``store`` is the persisted (id, cell, unit) table;
    only FRESH rows join it, so dropped duplicates never pollute
    future comparisons. Doc ids must be globally unique across runs.

    Scale shape mirrors dedup.py's new×all discipline: candidates are
    the cell-equi-join of the NEW assignments against store∪new —
    new×all, never old×old — so a small daily increment against a
    huge store costs |increment| × cell-collision-rate, not |store|².
    ``max_bucket_size`` caps the combined cell population (the
    semdedup quadratic guard); oversized cells are skipped. The
    centroid table is bounded by n_clusters (one tiny collect, the
    persisted-IVF pattern).

    Returns (fresh_rows, new_store, centroids_df).
    """
    spark = new_df.sparkSession
    nu = with_unit_vectors(ensure_parallelism(new_df), vec_col, "__u").persist()
    if centroids_df is None:
        ctr = ivf_fit_centroids(nu, "__u", n_clusters=n_clusters, seed=seed)
        centroids_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(ctr)],
            "cell int, centroid array<double>",
        )
    else:
        ctr = [
            list(r.centroid)
            for r in centroids_df.orderBy("cell").collect()
        ]
    new_a = nu.select(
        F.col(id_col).alias("id"),
        F.element_at(_nearest_cells("__u", ctr, 1), 1).alias("cell"),
        F.col("__u").alias("unit"),
    )
    old_a = (
        store.select("id", "cell", "unit")
        if store is not None
        else None
    )
    tagged_new = new_a.withColumn("__is_new", F.lit(True))
    all_side = (
        tagged_new
        if old_a is None
        else old_a.withColumn("__is_new", F.lit(False)).unionByName(tagged_new)
    )
    if max_bucket_size is not None:
        ok = (
            all_side.groupBy("cell")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("cell")
        )
        all_side = all_side.join(ok, "cell")
    # shuffle_hash: both sides carry unit vectors and scale with the
    # corpus/store — AQE must not broadcast either (the compressed-wire
    # size estimate hides array rows' JVM footprint; see
    # cosine_near_duplicates, r14 sf10). Cell-partitioned hash join:
    # the per-partition build is bounded by max_bucket_size vectors.
    dup_ids = (
        new_a.alias("n")
        .join(all_side.alias("o").hint("shuffle_hash"), "cell")
        .where(
            (~F.col("o.__is_new")) | (F.col("o.id") < F.col("n.id"))
        )
        .where(_pair_cos(F.col("n.unit"), F.col("o.unit")) >= threshold)
        .select(F.col("n.id").alias("id"))
        .distinct()
    )
    fresh = new_df.join(
        dup_ids.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    fresh_assigned = new_a.join(dup_ids, "id", "left_anti")
    new_store = (
        fresh_assigned
        if old_a is None
        else old_a.unionByName(fresh_assigned)
    )
    return fresh, new_store, centroids_df


def semdedup_save_store(store: DataFrame, centroids_df: DataFrame, path: str) -> None:
    """Persist an incremental_semdedup store: the (id, cell, unit)
    table partitioned by cell (the IVF layout — a later screen of one
    cell reads one directory) with the centroid table tucked under
    ``_centroids`` (underscore-prefixed → invisible to the store
    scan, the ivf_build_index trick)."""
    store.write.mode("overwrite").partitionBy("cell").parquet(path)
    centroids_df.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/_centroids"
    )


def semdedup_load_store(spark, path: str):
    """(store, centroids_df) back from semdedup_save_store."""
    return (
        spark.read.parquet(path),
        spark.read.parquet(f"{path}/_centroids"),
    )


def random_project(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    seed: int = 42,
    out_col: str = "projected",
    in_dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress embeddings to
    ``out_dim`` dimensions while approximately preserving pairwise
    distances (within 1±eps for out_dim = O(log n / eps^2)).

    The projection matrix is derived deterministically from ``seed``
    (numpy Gaussian / sqrt(out_dim)) and closure-broadcast — tiny
    (in_dim x out_dim doubles) regardless of corpus size, so the 100 TB
    side never shuffles; each partition is one Arrow-batched float64
    matmul. The canonical pre-step before ANN indexing or clustering
    when raw embedding width makes the index too large.
    """
    import numpy as np

    if in_dim is None:
        probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if probe is None:
            raise ValueError("random_project: empty input and no in_dim given")
        in_dim = int(probe["d"])
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def project(vs):  # pd.Series of lists -> pd.Series of lists
        import pandas as pd

        M = np.array(vs.tolist(), dtype=np.float64)
        return pd.Series(list(M @ R))

    return df.withColumn(out_col, project(F.col(vec_col)))
