"""Distributed k-means over embedding columns (Lloyd's algorithm).

Beyond-reference surface: the reference has no vector operations (its only
numeric-geometry code is the A* euclidean heuristic,
`/root/reference/src/algorithms/astar.rs:219-283`).  K-means over an
``array<float>`` embedding column is the standard curation primitive for
training-data pipelines (semantic sharding, topic balancing, IVF coarse
quantizers — `knn_ivf` in functions/similarity.py uses exactly such cells).

Scale design (100 TB):

- Centroids are tiny (k × dim doubles) and live on the driver; each
  assignment pass ships them as **literals folded into the plan** — the
  corpus is never shuffled for assignment (a pure projection in the scan
  stage, whole-stage codegen'd, no Python).
- The update pass is one ``posexplode`` + hash aggregation per iteration:
  shuffle volume is k × dim rows per partition after partial (map-side)
  aggregation — independent of corpus size.
- Distances fold left-to-right over the vector (``F.aggregate``), matching
  sequential summation in other engines — keeps results comparable bit-wise
  per pair (see tools/check.py oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sq_dist(vec, centroid: list[float]):
    """Squared euclidean distance, left-to-right double fold (deterministic
    summation order — parity with sequential engines)."""
    carr = F.array(*[F.lit(float(w)) for w in centroid])
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )


#: `_assign` routes to the Arrow kernel at/above this k·dim: below it the
#: per-task Python worker roundtrip outweighs the interpreted-HOF cost
#: (the q50 oracle fixtures at k=4·dim=16 stay on the expression path,
#: which is the twin-pinned configuration anyway — the kernel is
#: bit-exact, so the route is a pure cost decision).
_ASSIGN_ARROW_MIN_KDIM = 128


def _assign(df: DataFrame, vec_col: str, centroids: list[list[float]],
            engine: str = "auto") -> DataFrame:
    """Add a `cluster` column: argmin squared distance, ties → lowest index.

    `array_min` over `struct(dist, idx)` compares lexicographically, which
    is exactly (min dist, then min index). Above `_ASSIGN_ARROW_MIN_KDIM`
    the distances come from a fold-left Arrow kernel instead of k·dim
    interpreted HOF steps per row — bit-identical (same IEEE op order,
    dirty-row/NaN semantics pinned by test_clustering parity tests)."""
    if engine not in ("auto", "expr", "arrow"):
        raise ValueError(f"engine must be auto|expr|arrow, got {engine!r}")
    k = len(centroids)
    dim = len(centroids[0]) if k else 0
    if engine == "arrow" or (
        engine == "auto" and k * dim >= _ASSIGN_ARROW_MIN_KDIM
    ):
        return _assign_arrow(df, vec_col, centroids)
    pairs = F.array(
        *[
            F.struct(
                _sq_dist(F.col(vec_col), c).alias("d"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn("cluster", F.array_min(pairs)["c"])


def _assign_arrow(df: DataFrame, vec_col: str,
                  centroids: list[list[float]]) -> DataFrame:
    """Fold-left Arrow twin of the `_assign` expression: per batch the
    squared distances accumulate element-by-element over the dimension
    axis (``t = V[:, j] − c[j]; d += t·t`` — the exact zip_with/aggregate
    IEEE sequence), so the argmin can never disagree with the expression
    path. Expression dirty-row semantics reproduced: a null / ragged /
    null-element vector nulls EVERY distance (zip_with padding) and the
    struct array_min then falls to the lowest index — cluster 0; NaN
    distances sort ABOVE +Inf (Spark NaN ordering), all-NaN rows tie to
    cluster 0. Every input column passes through untouched."""
    import numpy as np
    import pyarrow as pa

    cents = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    k, dim = cents.shape
    names = df.columns
    vec_idx = names.index(vec_col)
    in_df = df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))
    ddl = ", ".join(
        f"`{c}` {in_df.schema[c].dataType.simpleString()}" for c in names
    ) + ", `cluster` int"

    def _fn(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            arr = batch.column(vec_idx)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            offs = arr.offsets.to_numpy(zero_copy_only=False)
            vals = arr.values
            lens = np.diff(offs)
            if arr.null_count == 0 and vals.null_count == 0:
                clean = lens == dim
            else:
                lst = arr.to_pylist()
                clean = np.array(
                    [v is not None and len(v) == dim
                     and all(x is not None for x in v) for v in lst],
                    dtype=bool)
            cluster = np.zeros(n, dtype=np.int32)  # dirty rows -> 0
            cidx = np.flatnonzero(clean)
            if len(cidx):
                if arr.null_count == 0 and vals.null_count == 0:
                    vnp = vals.to_numpy(zero_copy_only=False)
                    V = vnp[offs[cidx][:, None] + np.arange(dim)[None, :]]
                else:
                    V = np.asarray([lst[i] for i in cidx], dtype=np.float64)
                D = np.zeros((len(cidx), k))
                for c in range(k):
                    d = np.zeros(len(cidx))
                    row = cents[c]
                    for j in range(dim):
                        t = V[:, j] - row[j]
                        d += t * t
                    D[:, c] = d
                nan_mask = np.isnan(D)
                Dm = np.where(nan_mask, np.inf, D)
                cl = np.argmin(Dm, axis=1).astype(np.int32)
                # rows mixing a true +Inf distance with a NaN one would
                # tie under the masking; resolve those exactly (Spark:
                # NaN > +Inf, ties to the lowest index)
                odd = nan_mask.any(axis=1) & np.isinf(D).any(axis=1)
                for p in np.flatnonzero(odd):
                    best, bd = 0, None
                    for c in range(k):
                        dv = D[p, c]
                        keyv = (1, 0.0) if np.isnan(dv) else (0, dv)
                        if bd is None or keyv < bd:
                            bd, best = keyv, c
                    cl[p] = best
                cluster[cidx] = cl
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(len(names))]
                + [pa.array(cluster, type=pa.int32())],
                names + ["cluster"],
            )

    return in_df.mapInArrow(_fn, ddl)


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iterations: int = 3,
) -> DataFrame:
    """Lloyd's k-means; returns one row per cluster:
    ``cluster, n_members, centroid_norm, mean_dist`` (floats rounded 6dp).

    Deterministic: initial centroids are the vectors of the ``k`` smallest
    ids; every reduction is over doubles with rounded outputs.

    The per-row assignment under the final centroids is available via
    :func:`kmeans_assign` for pipeline use (semantic sharding).
    """
    emb = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).localCheckpoint()

    # init: vectors of the k smallest ids (data-derived, reproducible)
    centroids = [
        r["_v"] for r in emb.orderBy("_id").limit(k).collect()
    ]

    for _ in range(iterations):
        assigned = _assign(emb, "_v", centroids)
        # elementwise mean per cluster: one posexplode + partial-agg'd
        # hash aggregation; shuffle rows ≤ k × dim × n_partitions
        rows = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("val"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("cv"))
            .collect()
        )
        new = {r["cluster"]: [p["val"] for p in r["cv"]] for r in rows}
        # empty cluster keeps its previous centroid
        centroids = [new.get(i, centroids[i]) for i in range(k)]

    final = _assign(emb, "_v", centroids)
    norms = {
        i: sum(w * w for w in c) ** 0.5 for i, c in enumerate(centroids)
    }
    norm_expr = F.array(*[F.lit(norms[i]) for i in range(k)])[F.col("cluster")]
    return (
        final.withColumn("_d", F.sqrt(
            F.array(*[_sq_dist(F.col("_v"), c) for c in centroids])[F.col("cluster")]
        ))
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("_d"), 6).alias("mean_dist"),
        )
        .withColumn("centroid_norm", F.round(norm_expr, 6))
        .select("cluster", "n_members", "centroid_norm", "mean_dist")
    )


def _assign_gemm(emb: DataFrame, vec_col: str, cents) -> DataFrame:
    """Add a `cluster` column via blocked GEMM against a BROADCAST
    centroid matrix (the FAISS / IVF-codebook shape): each Arrow batch
    computes ``argmin_c ||v−c||² = argmin_c (||c||² − 2 v·cᵀ)`` with one
    numpy matmul per row-block. This is the large-k assignment path —
    the centroid table ships once per executor inside the task closure
    (k × dim doubles), NOT as k folded plan literals, so k is bounded by
    executor memory (k·dim ≲ 10⁸ doubles), not by Catalyst plan size
    (k ≈ 10³). Ties break to the lowest index (np.argmin = first min),
    matching the literal path's array_min tie-break."""
    import numpy as np

    C = np.ascontiguousarray(np.asarray(cents, dtype=np.float64))
    c_norms = (C * C).sum(axis=1)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields
    ) + ", cluster int"
    # bound the per-block score matrix (rows × k doubles) to ~32 MB
    block = max(1, (1 << 22) // max(1, C.shape[0]))

    def _fn(batches):
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = len(pdf)
            cl = np.empty(n, dtype=np.int32)
            for s in range(0, n, block):
                v = vecs[s:s + block]
                # ||v||² is constant per row — argmin ignores it
                cl[s:s + block] = np.argmin(
                    c_norms[None, :] - 2.0 * (v @ C.T), axis=1
                )
            pdf = pdf.copy()
            pdf["cluster"] = cl
            yield pdf

    return emb.mapInPandas(_fn, out_schema)


def _assign_gemm_coarse(
    emb: DataFrame, vec_col: str, cents, n_probe: int = 4
) -> DataFrame:
    """Two-level (IVF-shape) assignment for LARGE k: the k fine centroids
    are themselves k-means'd driver-side into c ≈ √k coarse groups
    (k × dim numpy, tiny); each row block then GEMMs against the c
    coarse centers, picks its ``n_probe`` nearest groups, and GEMMs only
    against those groups' fine centroids — O(n·(√k·n_probe)·dim) instead
    of O(n·k·dim). This is exactly the FAISS IVF coarse-quantizer
    recipe; assignment is approximate in the standard IVF sense (the
    true nearest fine centroid sits outside the probed groups with
    probability falling geometrically in ``n_probe``). Deterministic:
    coarse init = first c fine centroids, fixed 5 Lloyd steps."""
    import numpy as np

    C = np.ascontiguousarray(np.asarray(cents, dtype=np.float64))
    k = C.shape[0]
    c = max(1, int(np.ceil(np.sqrt(k))))
    n_probe = min(n_probe, c)
    # driver-side numpy k-means over the centroid matrix
    G = C[:c].copy()
    for _ in range(5):
        d = ((C[:, None, :] - G[None, :, :]) ** 2).sum(axis=2)
        grp = d.argmin(axis=1)
        for j in range(c):
            m = C[grp == j]
            if len(m):
                G[j] = m.mean(axis=0)
    d = ((C[:, None, :] - G[None, :, :]) ** 2).sum(axis=2)
    grp = d.argmin(axis=1)
    order = np.argsort(grp, kind="stable")
    C_sorted = np.ascontiguousarray(C[order])
    starts = np.searchsorted(grp[order], np.arange(c + 1))
    g_norms = (G * G).sum(axis=1)
    s_norms = (C_sorted * C_sorted).sum(axis=1)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields
    ) + ", cluster int"
    block = max(1, (1 << 22) // max(1, c))

    def _fn(batches):
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = len(pdf)
            cl = np.empty(n, dtype=np.int32)
            for s in range(0, n, block):
                v = vecs[s:s + block]
                gd = g_norms[None, :] - 2.0 * (v @ G.T)
                probes = np.argpartition(gd, n_probe - 1, axis=1)[:, :n_probe]
                best = np.full(len(v), np.inf)
                best_i = np.zeros(len(v), dtype=np.int64)
                for p in range(n_probe):
                    gsel = probes[:, p]
                    # rows sharing a coarse group share a fine-GEMM slice
                    for j in np.unique(gsel):
                        rows = np.flatnonzero(gsel == j)
                        lo, hi = starts[j], starts[j + 1]
                        if hi == lo:
                            continue
                        fd = (s_norms[lo:hi][None, :]
                              - 2.0 * (v[rows] @ C_sorted[lo:hi].T))
                        am = fd.argmin(axis=1)
                        fm = fd[np.arange(len(rows)), am]
                        upd = fm < best[rows]
                        ridx = rows[upd]
                        best[ridx] = fm[upd]
                        best_i[ridx] = order[lo:hi][am[upd]]
                cl[s:s + block] = best_i
            pdf = pdf.copy()
            pdf["cluster"] = cl
            yield pdf

    return emb.mapInPandas(_fn, out_schema)


def kmeans_assign_table(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iterations: int = 3,
    coarse: bool | None = None,
    n_probe: int = 4,
) -> DataFrame:
    """Per-row cluster assignment at PRODUCTION k — the large-k dual of
    :func:`kmeans_assign`, whose literal-folded centroids cap k at ~10³
    (plan size). Same Lloyd structure, but every assignment pass is the
    broadcast-centroid-matrix GEMM of :func:`_assign_gemm`; the update
    pass stays a posexplode + map-side-combined aggregation whose
    shuffle volume is k × dim rows — independent of corpus size.

    Init is the vectors of the k smallest ids (k × dim doubles to the
    driver — 2 MB at k=4000, dim=64; at k ≈ 10⁶⁺ persist/seed a codebook
    table instead). Not bit-identical to :func:`kmeans_assign`: GEMM
    sums in a different order than the left-fold `_sq_dist`, so points
    equidistant at double precision may tie-break differently — the
    oracle-checked configuration stays the literal path (SemDeDup k=4
    twin); this path is the scale regime (SemDeDup's k ≈ n/500 at
    corpus scale, the Abbas et al. parameterization).

    ``coarse`` switches the per-pass assignment to the two-level IVF
    shape (:func:`_assign_gemm_coarse`): flat GEMM is O(n·k·dim), which
    with the paper's k ∝ n is quadratic in corpus size — the coarse
    path probes ``n_probe`` of ≈√k centroid groups, O(n·√k·n_probe·dim),
    the standard FAISS escape. Default (None) = coarse above k = 1024.
    Coarse assignment is approximate in the usual IVF sense."""
    if coarse is None:
        coarse = k > 1024

    def _assign(e, cents):
        return (
            _assign_gemm_coarse(e, "_v", cents, n_probe)
            if coarse else _assign_gemm(e, "_v", cents)
        )

    emb = df.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).localCheckpoint()
    cents = [r["_v"] for r in emb.orderBy(id_col).limit(k).collect()]
    for _ in range(iterations):
        assigned = _assign(emb, cents)
        rows = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("val"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "val")))
                 .alias("cv"))
            .collect()
        )
        new = {r["cluster"]: [p["val"] for p in r["cv"]] for r in rows}
        cents = [new.get(i, cents[i]) for i in range(k)]
    return _assign(emb, cents).select(id_col, "cluster")


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iterations: int = 3,
) -> DataFrame:
    """Per-row final cluster assignment (``id, cluster``) under the same
    deterministic procedure as :func:`kmeans`."""
    emb = df.select(
        F.col(id_col).alias(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).localCheckpoint()
    centroids = [r["_v"] for r in emb.orderBy(id_col).limit(k).collect()]
    for _ in range(iterations):
        assigned = _assign(emb, "_v", centroids)
        rows = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("val"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("cv"))
            .collect()
        )
        new = {r["cluster"]: [p["val"] for p in r["cv"]] for r in rows}
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return _assign(emb, "_v", centroids).select(id_col, "cluster")
