"""Deterministic DataFrame-native clustering (Lloyd's k-means).

``kmeans_assign`` (SURVEY M13) uses MLlib — the idiomatic production path —
but its k-means|| init and aggregation order make results library-specific,
so its driver check is rows-only. This module implements the same algorithm
as explicit DataFrame algebra with every source of nondeterminism pinned:

- init: the first K points by ``vec_id`` (ids 0..K-1) are the centroids;
- assignment: argmin of squared L2 distance, ties broken by lowest cluster
  id (numpy ``argmin`` scans ascending — same rule as the oracle's
  ``ORDER BY dist, cluster``);
- update: per-dimension mean, **rounded to 9 decimals** so the engines'
  different summation orders (~1e-15 relative drift) cannot propagate into
  later iterations — both sides compute identical centroid doubles, and a
  drift-vs-grid boundary coincidence needs a ~1e-7 fluke per value instead
  of ~1e-4 at 12 dp;
- fixed iteration count, driver-coordinated (the per-iteration driver
  payload is the K×d centroid table — constant in corpus size).

Scale shape per iteration: assignment is a map with broadcast centroids
(zero shuffle, Arrow-batched kernel); the update is one partial-aggregated
shuffle keyed by (cluster, dim) — K×d groups regardless of corpus size.
This is exactly MLlib's own execution shape (``mllib.clustering.KMeans``),
re-derived so DuckDB can replay it: the oracle unrolls the iterations as
CTEs over the long-form (vec_id, dim, val) table. Reference parity:
``BERTopic_Analysis.py:277,292-297`` (KMeans n_clusters=K, seed path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import memo
from ..registry import register
from ..sources import load_table

LLOYD_K = 10
LLOYD_ITERS = 3
_ROUND = 9  # centroid rounding (decimals): > data precision, ≫ fp drift


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, emb array<double>) — persisted: every iteration and the
    final assignment rescan it."""
    from ..functions import vectors as V

    return memo(
        spark,
        ("lloyd_pts", sf_dir),
        lambda: load_table(spark, sf_dir, "embeddings").select(
            "vec_id", V.as_double("embedding").alias("emb")
        ),
        persist=True,
    )


def _assign(pts: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, emb, cluster): nearest centroid by squared L2, ties to the
    lowest cluster id. Broadcast-closure kernel — one Arrow-batched pass,
    no shuffle, O(K·d) work per row; numpy argmin over a (K, d) matrix."""
    import numpy as np

    ids = np.array([c for c, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)  # (K, d)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf["emb"].tolist(), dtype=np.float64)  # (n, d)
            # (n, K) squared distances; argmin scans clusters ascending, so
            # the first minimal index wins — ids[] is sorted, matching the
            # oracle's ORDER BY dist, cluster tie-break
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            pdf = pdf.copy()
            pdf["cluster"] = ids[np.argmin(d2, axis=1)]
            yield pdf

    return pts.select("vec_id", "emb").mapInPandas(
        kernel, schema="vec_id long, emb array<double>, cluster long"
    )


def _update(assigned: DataFrame) -> list[tuple[int, list[float]]]:
    """New centroids: per-(cluster, dim) mean, rounded to {_ROUND} decimals,
    collected to the driver (K×d rows — constant in corpus size). Empty
    clusters simply vanish, identically on both engines."""
    rows = (
        assigned.select("cluster", F.posexplode("emb").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(F.round(F.avg("val"), _ROUND).alias("val"))
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["val"]
    return [
        (c, [dims[i] for i in range(len(dims))])
        for c, dims in sorted(by_cluster.items())
    ]


def lloyd_fit(
    spark: SparkSession, sf_dir: str, k: int = LLOYD_K, iters: int = LLOYD_ITERS
):
    """Run ``iters`` Lloyd rounds from the first-K-points init. Returns
    ``(assigned, centroids)``: the final (vec_id, emb, cluster) DataFrame
    and the centroid list the final assignment used (cluster, vector) —
    the coarse-quantizer codebook for IVF. Memoized per (session, dataset,
    k, iters)."""

    def build():
        pts = _points(spark, sf_dir)
        seed = pts.filter(F.col("vec_id") < k).collect()
        centroids = [
            (int(r["vec_id"]), [round(float(x), _ROUND) for x in r["emb"]])
            for r in sorted(seed, key=lambda r: r["vec_id"])
        ]
        for _ in range(iters - 1):
            centroids = _update(_assign(pts, centroids))
        return (_assign(pts, centroids), centroids)

    return memo(spark, ("lloyd_fit", sf_dir, k, iters), build)


def lloyd_assignments(
    spark: SparkSession, sf_dir: str, k: int = LLOYD_K, iters: int = LLOYD_ITERS
) -> DataFrame:
    """Final (vec_id, emb, cluster) after ``iters`` Lloyd rounds."""
    return lloyd_fit(spark, sf_dir, k, iters)[0]


def _sql_lloyd(k: int, iters: int, src: str = "embeddings") -> str:
    """Unrolled Lloyd CTEs over the long-form points table. Produces CTE
    ``a{iters}`` = final (vec_id, cluster)."""
    parts = [
        f"""
pts AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM {src}
),
c0 AS (
    SELECT vec_id AS cluster, dim, round(val, {_ROUND}) AS val
    FROM pts WHERE vec_id < {k}
)"""
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        parts.append(
            f"""
d{i} AS (
    SELECT p.vec_id, c.cluster,
           sum((p.val - c.val) * (p.val - c.val)) AS dist
    FROM pts p JOIN {prev} c ON c.dim = p.dim
    GROUP BY p.vec_id, c.cluster
),
a{i} AS (
    SELECT vec_id, cluster FROM d{i}
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
)"""
        )
        if i < iters:
            parts.append(
                f"""
c{i} AS (
    SELECT a.cluster, p.dim, round(avg(p.val), {_ROUND}) AS val
    FROM a{i} a JOIN pts p ON p.vec_id = a.vec_id
    GROUP BY a.cluster, p.dim
)"""
            )
    return ",".join(parts)


@register(
    "lloyd_kmeans",
    sql=f"""
WITH {_sql_lloyd(LLOYD_K, LLOYD_ITERS)}
SELECT vec_id, cluster FROM a{LLOYD_ITERS}
""",
    tags=("topics", "ml", "cluster", "scale"),
)
def q_lloyd_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means assignment (k={LLOYD_K}, {LLOYD_ITERS}
    Lloyd rounds) — the exact-oracle twin of ``kmeans_assign``: DuckDB
    replays the identical iteration and the per-vector assignments must
    hash-match."""
    return lloyd_assignments(spark, sf_dir).select("vec_id", "cluster")


@register(
    "lloyd_cluster_profile",
    sql=f"""
WITH {_sql_lloyd(LLOYD_K, LLOYD_ITERS)}
SELECT a.cluster, count(*) AS n_members,
       count(DISTINCT e.label) AS n_labels,
       min(e.vec_id) AS first_vec
FROM a{LLOYD_ITERS} a JOIN embeddings e ON e.vec_id = a.vec_id
GROUP BY a.cluster
""",
    tags=("topics", "ml", "cluster"),
)
def q_lloyd_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster cardinality/purity profile over the deterministic k-means —
    the shape of the reference's docs-per-topic summary (SURVEY A8) on an
    exact-oracle clustering."""
    e = load_table(spark, sf_dir, "embeddings")
    a = lloyd_assignments(spark, sf_dir).select("vec_id", "cluster")
    return (
        a.join(e, "vec_id")
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("label").alias("n_labels"),
            F.min("vec_id").alias("first_vec"),
        )
    )


@register(
    "simplified_silhouette",
    sql=f"""
WITH {_sql_lloyd(LLOYD_K, LLOYD_ITERS)},
dist AS (
    SELECT p.vec_id, c.cluster,
           sqrt(sum((p.val - c.val) * (p.val - c.val))) AS d
    FROM pts p JOIN c{LLOYD_ITERS - 1} c ON c.dim = p.dim
    GROUP BY p.vec_id, c.cluster
),
s AS (
    SELECT a.vec_id, a.cluster,
           max(CASE WHEN d.cluster = a.cluster THEN d.d END) AS a_dist,
           min(CASE WHEN d.cluster <> a.cluster THEN d.d END) AS b_dist
    FROM dist d JOIN a{LLOYD_ITERS} a ON a.vec_id = d.vec_id
    GROUP BY a.vec_id, a.cluster
)
SELECT cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       round(avg(CASE WHEN b_dist IS NULL OR greatest(a_dist, b_dist) <= 0
                      THEN 0.0
                      ELSE (b_dist - a_dist) / greatest(a_dist, b_dist)
                 END), 6) AS mean_silhouette
FROM s
GROUP BY cluster
""",
    tags=("topics", "ml", "cluster", "scale"),
)
def q_simplified_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster mean simplified silhouette over the deterministic
    k-means: for each point, a = distance to its OWN centroid, b = the
    nearest OTHER centroid, s = (b - a) / max(a, b). The simplified
    variant (centroid distances instead of all-pairs point distances) is
    the one that survives scale — classic silhouette is O(N^2); this is
    O(N * K) in the same broadcast-closure kernel shape as the assignment
    itself, with a K-bounded rollup as the only shuffle. The centroids are
    the exact codebook the final assignment used, so DuckDB replays the
    identical Lloyd chain and the 6-dp-rounded means hash-match (the only
    fp nondeterminism is per-cluster summation order, absorbed by the
    round — the established convention)."""
    import numpy as np

    assigned, centroids = lloyd_fit(spark, sf_dir)
    ids = np.array([c for c, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf["emb"].tolist(), dtype=np.float64)
            d = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
            own = np.searchsorted(ids, pdf["cluster"].to_numpy())
            n = len(pdf)
            a = d[np.arange(n), own]
            d_others = d.copy()
            d_others[np.arange(n), own] = np.inf
            b = d_others.min(axis=1)
            hi = np.maximum(a, b)
            with np.errstate(invalid="ignore"):
                sil = np.where(np.isfinite(b) & (hi > 0), (b - a) / hi, 0.0)
            out = pdf[["vec_id", "cluster"]].copy()
            out["sil"] = sil
            yield out

    per_point = assigned.mapInPandas(
        kernel, schema="vec_id long, cluster long, sil double"
    )
    return per_point.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("sil"), 6).alias("mean_silhouette"),
    )


# ------------------------------------------------- power-iteration PCA (M11)

PCA_ITERS = 5
PCA_SCORE_IDS = 50  # vec_id bound for the projection output
_VROUND = 6  # axis rounding: post-division digits are structure-free


def _pca_axis(spark: SparkSession, sf_dir: str):
    """First principal axis by deterministic power iteration. Returns
    ``(mu, v, eigval)``: the 9-dp-rounded mean vector, unit axis, and its
    Rayleigh norm.

    Distribution shape: the covariance is a per-partition centered Gram
    accumulation (one d×d partial per task — the ``_window_cooc`` pattern),
    reduced by a d²-key aggregate; the iteration itself is driver-side on
    the d×d matrix (constant in corpus size — exactly where MLlib's own
    PCA does its eigendecomposition).

    Cross-engine determinism: round ONLY where the value's decimal digits
    are arbitrary. The matvec C·v multiplies 9-dp decimals, so its sums
    land exactly ON rounding-grid boundaries by construction (measured:
    3/64 flips with v0 = 0.125) — it stays unrounded (engines differ by
    ~1e-19 there); the norm (post-sqrt) rounds at 9 dp and the axis (post-
    division) at 6 dp, both structure-free, making a boundary coincidence
    a ≤1e-10 fluke."""
    import math

    import numpy as np
    import pandas as pd

    def build():
        pts = _points(spark, sf_dir)
        n = pts.count()
        mu_rows = (
            pts.select(F.posexplode("emb").alias("dim", "val"))
            .groupBy("dim")
            .agg(F.round(F.avg("val"), _ROUND).alias("m"))
            .collect()
        )
        d = len(mu_rows)
        mu = np.zeros(d)
        for r in mu_rows:
            mu[r["dim"]] = r["m"]

        def kernel(batches):
            acc = np.zeros((d, d))
            touched = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.asarray(pdf["emb"].tolist(), dtype=np.float64) - mu
                acc += X.T @ X
                touched = True
            if touched:
                ii, jj = np.indices((d, d))
                yield pd.DataFrame(
                    {"i": ii.ravel(), "j": jj.ravel(), "s": acc.ravel()}
                )

        sums = (
            pts.select("emb")
            .mapInPandas(kernel, schema="i int, j int, s double")
            .groupBy("i", "j")
            .agg(F.sum("s").alias("s"))
            .collect()
        )
        C = np.zeros((d, d))
        for r in sums:
            C[r["i"], r["j"]] = r["s"]
        C = np.round(C / (n - 1), _ROUND)

        v = np.full(d, round(1.0 / math.sqrt(d), _ROUND))
        nv = 0.0
        for _ in range(PCA_ITERS):
            w = C @ v  # unrounded: decimal-structured, boundary-prone
            nv = round(math.sqrt(float((w * w).sum())), _ROUND)
            v = np.round(w / nv, _VROUND)
        return (mu.tolist(), v.tolist(), nv)

    return memo(spark, ("pca_axis", sf_dir), build)


def _sql_power_pca(src: str = "embeddings") -> str:
    """Unrolled power-iteration CTEs; produces ``vT`` (dim, v), ``nT``
    (nv = eigenvalue), ``cpts`` (vec_id, dim, centered val)."""
    parts = [
        f"""
pts AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM {src}
),
nrow AS (SELECT count(DISTINCT vec_id) AS n FROM pts),
mu AS (SELECT dim, round(avg(val), {_ROUND}) AS m FROM pts GROUP BY dim),
ndim AS (SELECT count(*) AS d FROM mu),
cpts AS (
    SELECT p.vec_id, p.dim, p.val - m.m AS val
    FROM pts p JOIN mu m ON m.dim = p.dim
),
cov AS (
    SELECT a.dim AS i, b.dim AS j,
           round(sum(a.val * b.val) / ((SELECT n FROM nrow) - 1), {_ROUND}) AS c
    FROM cpts a JOIN cpts b ON a.vec_id = b.vec_id
    GROUP BY a.dim, b.dim
),
v0 AS (SELECT dim, round(1.0 / sqrt((SELECT d FROM ndim)), {_ROUND}) AS v FROM mu)"""
    ]
    for t in range(1, PCA_ITERS + 1):
        parts.append(
            f"""
w{t} AS (
    SELECT c.i AS dim, sum(c.c * v.v) AS w
    FROM cov c JOIN v{t - 1} v ON v.dim = c.j
    GROUP BY c.i
),
n{t} AS (SELECT round(sqrt(sum(w * w)), {_ROUND}) AS nv FROM w{t}),
v{t} AS (SELECT dim, round(w / (SELECT nv FROM n{t}), {_VROUND}) AS v FROM w{t})"""
        )
    return ",".join(parts)


@register(
    "pca_power_axis",
    sql=f"""
WITH {_sql_power_pca()}
SELECT dim, round(v, 6) AS loading,
       (SELECT nv FROM n{PCA_ITERS}) AS eigenvalue
FROM v{PCA_ITERS}
""",
    tags=("topics", "ml", "reduce_dim", "scale"),
)
def q_pca_power_axis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M11 (dimensionality reduction), exact-oracle form: the first
    principal axis by {PCA_ITERS} deterministic power-iteration rounds
    (fixed uniform init pins the sign). The rows-only ``pca_project``
    (MLlib PCA, k=5) remains the production variant; this one proves the
    covariance + iteration pipeline against DuckDB value-for-value."""
    # loading: v is already 6-dp rounded, so the output round is the
    # identity; eigenvalue ships at its native 9 dp — re-rounding an
    # already-rounded decimal at a coarser grid is the one rounding class
    # the engines resolve differently (exact decimal ties)
    _, v, ev = _pca_axis(spark, sf_dir)
    return spark.createDataFrame(
        [(i, round(float(x), 6), float(ev)) for i, x in enumerate(v)],
        ["dim", "loading", "eigenvalue"],
    )


@register(
    "pca_power_scores",
    sql=f"""
WITH {_sql_power_pca()},
xl AS (
    SELECT vec_id, list(val ORDER BY dim) AS l
    FROM cpts WHERE vec_id < {PCA_SCORE_IDS}
    GROUP BY vec_id
),
vl AS (SELECT list(v ORDER BY dim) AS l FROM v{PCA_ITERS})
SELECT x.vec_id, round(list_dot_product(x.l, vl.l), 6) AS pc1
FROM xl x, vl
""",
    tags=("topics", "ml", "reduce_dim", "scale"),
)
def q_pca_power_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection onto the power-iteration axis: pc1 = (x − μ)·v for the
    first {PCA_SCORE_IDS} vectors — sequential-sum dot on both engines, so
    scores match bit-for-bit before the 6-dp output rounding."""
    mu, v, _ = _pca_axis(spark, sf_dir)
    mu_arr = F.array(*[F.lit(float(m)) for m in mu])
    v_arr = F.array(*[F.lit(float(x)) for x in v])
    from ..functions import vectors as V

    pts = _points(spark, sf_dir).filter(F.col("vec_id") < PCA_SCORE_IDS)
    centered = F.zip_with("emb", mu_arr, lambda x, m: x - m)
    return pts.select(
        "vec_id", F.round(V.dot(centered, v_arr), 6).alias("pc1")
    )


# ---------------------------------------------- deterministic EM GMM (M12)

GMM_K = 5
GMM_ITERS = 3
GMM_VAR_FLOOR = 1e-6
GMM_WEIGHT_FLOOR = 1e-9  # keeps ln(weight) finite on both engines
GMM_NOISE_TH = 0.6  # max posterior below this => noise label -1 (HDBSCAN-ish)


def _gmm_params(spark: SparkSession, sf_dir: str):
    """Diagonal-covariance GMM fitted by ``GMM_ITERS`` deterministic EM
    rounds. Returns (mu (K,d), var (K,d), logw (K,)) as numpy arrays.

    Determinism: init is the first-K points (unit variance, uniform
    weights); each M-step rounds parameters at 9 dp AFTER the divisions
    (structure-free digits — the lesson from the PCA matvec), with a fixed
    variance floor. Log-densities, responsibilities, and partial sums stay
    raw: engines differ there by ~1e-15, absorbed by the parameter
    rounding. Scale shape per round: one Arrow-batched pass emits
    per-partition (k, dim) moment partials — K·(d+1) rows per task — and
    one tiny-key aggregate reduces them; driver holds only K×d params."""
    import math

    import numpy as np
    import pandas as pd

    def build():
        pts = _points(spark, sf_dir)
        n = pts.count()
        seed = sorted(
            pts.filter(F.col("vec_id") < GMM_K).collect(),
            key=lambda r: r["vec_id"],
        )
        d = len(seed[0]["emb"])
        mu = np.array(
            [[round(float(x), _ROUND) for x in r["emb"]] for r in seed]
        )
        var = np.ones((GMM_K, d))
        logw = np.full(GMM_K, math.log(round(1.0 / GMM_K, _ROUND)))

        for _ in range(GMM_ITERS):
            mu_b, var_b, logw_b = mu, var, logw

            def kernel(batches):
                s0 = np.zeros(GMM_K)
                s1 = np.zeros((GMM_K, d))
                s2 = np.zeros((GMM_K, d))
                touched = False
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    X = np.asarray(pdf["emb"].tolist(), dtype=np.float64)
                    r = _responsibilities(X, mu_b, var_b, logw_b)
                    s0 += r.sum(axis=0)
                    s1 += r.T @ X
                    s2 += r.T @ (X * X)
                    touched = True
                if touched:
                    # per component: one dim=-1 row carrying s0, then the
                    # d moment rows — a single (K·(d+1))-row partial frame
                    ks = np.repeat(np.arange(GMM_K), d + 1)
                    dims = np.tile(np.arange(-1, d), GMM_K)
                    rows1 = np.column_stack(
                        [np.concatenate([[s0[k]], s1[k]]) for k in range(GMM_K)]
                    ).T.ravel()
                    rows2 = np.column_stack(
                        [np.concatenate([[0.0], s2[k]]) for k in range(GMM_K)]
                    ).T.ravel()
                    yield pd.DataFrame(
                        {"k": ks, "dim": dims, "a": rows1, "b": rows2}
                    )

            sums = (
                pts.select("emb")
                .mapInPandas(kernel, schema="k int, dim int, a double, b double")
                .groupBy("k", "dim")
                .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
                .collect()
            )
            s0 = np.zeros(GMM_K)
            s1 = np.zeros((GMM_K, d))
            s2 = np.zeros((GMM_K, d))
            for r in sums:
                if r["dim"] < 0:
                    s0[r["k"]] = r["a"]
                else:
                    s1[r["k"], r["dim"]] = r["a"]
                    s2[r["k"], r["dim"]] = r["b"]
            mu = np.round(s1 / s0[:, None], _ROUND)
            var = np.maximum(
                np.round(s2 / s0[:, None] - mu * mu, _ROUND), GMM_VAR_FLOOR
            )
            # Floor the rounded weight (mirrors GMM_VAR_FLOOR): a component
            # whose weight underflows the rounding would yield -inf here but
            # an 'Out of Range' error in DuckDB's ln() — floor both engines
            # identically so a collapsed component degrades the same way.
            logw = np.log(np.maximum(np.round(s0 / n, _ROUND), GMM_WEIGHT_FLOOR))
        return (mu, var, logw)

    return memo(spark, ("gmm_params", sf_dir), build)


def _responsibilities(X, mu, var, logw):
    """Softmax responsibilities from diagonal-Gaussian log densities —
    plain numpy, shared by the fit kernel and the assignment kernel."""
    import numpy as np

    # (n, K) log densities: logw_k - 0.5 * sum_d ((x-mu)^2/var + ln(2*pi*var))
    quad = ((X[:, None, :] - mu[None, :, :]) ** 2 / var[None, :, :]).sum(axis=2)
    logdet = np.log(2 * np.pi * var).sum(axis=1)
    ll = logw[None, :] - 0.5 * (quad + logdet[None, :])
    e = np.exp(ll - ll.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def _sql_gmm(k: int, iters: int, src: str = "embeddings") -> str:
    """Unrolled EM CTEs. Produces ``r{iters + 1}`` — the responsibilities
    of one final E-step over the fitted parameters (matching the Spark
    side, which fits ``iters`` M-steps then assigns)."""
    parts = [
        f"""
pts AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM {src}
),
nrow AS (SELECT count(DISTINCT vec_id) AS n FROM pts),
m0 AS (
    SELECT vec_id AS k, dim, round(val, {_ROUND}) AS mu, 1.0 AS s2
    FROM pts WHERE vec_id < {k}
),
w0 AS (
    SELECT DISTINCT vec_id AS k, ln(round(1.0 / {k}, {_ROUND})) AS lw
    FROM pts WHERE vec_id < {k}
)"""
    ]
    for t in range(1, iters + 2):
        parts.append(
            f"""
l{t} AS (
    SELECT p.vec_id, m.k,
           w.lw - 0.5 * sum((p.val - m.mu) * (p.val - m.mu) / m.s2
                            + ln(2 * pi() * m.s2)) AS ll
    FROM pts p
    JOIN m{t - 1} m ON m.dim = p.dim
    JOIN w{t - 1} w ON w.k = m.k
    GROUP BY p.vec_id, m.k, w.lw
),
e{t} AS (
    SELECT vec_id, k, exp(ll - max(ll) OVER (PARTITION BY vec_id)) AS e
    FROM l{t}
),
r{t} AS (
    SELECT vec_id, k, e / sum(e) OVER (PARTITION BY vec_id) AS r FROM e{t}
)"""
        )
        if t <= iters:
            parts.append(
                f"""
s0_{t} AS (SELECT k, sum(r) AS s0 FROM r{t} GROUP BY k),
sm{t} AS (
    SELECT r.k, p.dim, sum(r.r * p.val) AS s1, sum(r.r * p.val * p.val) AS sq
    FROM r{t} r JOIN pts p ON p.vec_id = r.vec_id
    GROUP BY r.k, p.dim
),
m{t} AS (
    SELECT sm.k, sm.dim,
           round(sm.s1 / s0.s0, {_ROUND}) AS mu,
           greatest(round(sm.sq / s0.s0
                          - round(sm.s1 / s0.s0, {_ROUND})
                            * round(sm.s1 / s0.s0, {_ROUND}), {_ROUND}),
                    {GMM_VAR_FLOOR}) AS s2
    FROM sm{t} sm JOIN s0_{t} s0 ON s0.k = sm.k
),
w{t} AS (
    SELECT k, ln(greatest(round(s0 / (SELECT n FROM nrow), {_ROUND}),
                          {GMM_WEIGHT_FLOOR})) AS lw
    FROM s0_{t}
)"""
            )
    return ",".join(parts)


@register(
    "gmm_em_assign",
    sql=f"""
WITH {_sql_gmm(GMM_K, GMM_ITERS)},
best AS (
    SELECT vec_id, k, r FROM r{GMM_ITERS + 1}
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY r DESC, k) = 1
)
SELECT vec_id,
       CASE WHEN r < {GMM_NOISE_TH} THEN -1 ELSE k END AS component,
       round(r, 6) AS posterior
FROM best
""",
    tags=("topics", "ml", "cluster", "scale"),
)
def q_gmm_em_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY M12 (HDBSCAN substitute), exact-oracle form: diagonal GMM by
    {GMM_ITERS} deterministic EM rounds; each vector gets its max-posterior
    component, or the noise label −1 when the posterior is spread
    (< {GMM_NOISE_TH}) — HDBSCAN's unassigned-points surface. DuckDB
    replays the EM loop from unrolled CTEs (window-function softmax)."""
    import numpy as np
    import pandas as pd

    mu, var, logw = _gmm_params(spark, sf_dir)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf["emb"].tolist(), dtype=np.float64)
            r = _responsibilities(X, mu, var, logw)
            best = np.argmax(r, axis=1)
            p = r[np.arange(len(r)), best]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "component": np.where(p < GMM_NOISE_TH, -1, best),
                    "posterior": np.round(p, 6),
                }
            )

    return (
        _points(spark, sf_dir)
        .mapInPandas(kernel, schema="vec_id long, component long, posterior double")
    )


# ------------------------------------------------ product quantization (PQ)

PQ_M = 4  # subspaces
PQ_SUB = 16  # dims per subspace (driver embeddings are 64-d)
PQ_K = 8  # codes per subspace codebook
PQ_ITERS = 3


def _assign_with_dist(pts: DataFrame, centroids) -> DataFrame:
    """``_assign`` + the winning squared distance (the per-subspace
    reconstruction error PQ reports)."""
    import numpy as np

    ids = np.array([c for c, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf["emb"].tolist(), dtype=np.float64)
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            best = np.argmin(d2, axis=1)
            pdf = pdf.copy()
            pdf["cluster"] = ids[best]
            pdf["dist"] = d2[np.arange(len(pdf)), best]
            yield pdf[["vec_id", "cluster", "dist"]]

    return pts.select("vec_id", "emb").mapInPandas(
        kernel, schema="vec_id long, cluster long, dist double"
    )


def _sql_pq_ctes() -> str:
    """The PQ CTE chain alone (pts + per-subspace fits) — shared by the
    codes query and the ADC search."""
    parts = [
        f"""
pts AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
)"""
    ]
    sel = []
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
        s = f"_s{m}"
        parts.append(
            f"""
p{s} AS (SELECT vec_id, dim, val FROM pts WHERE dim >= {lo} AND dim < {hi}),
c0{s} AS (
    SELECT vec_id AS cluster, dim, round(val, {_ROUND}) AS val
    FROM p{s} WHERE vec_id < {PQ_K}
)"""
        )
        for i in range(1, PQ_ITERS + 1):
            parts.append(
                f"""
d{i}{s} AS (
    SELECT p.vec_id, c.cluster,
           sum((p.val - c.val) * (p.val - c.val)) AS dist
    FROM p{s} p JOIN c{i - 1}{s} c ON c.dim = p.dim
    GROUP BY p.vec_id, c.cluster
),
a{i}{s} AS (
    SELECT vec_id, cluster, dist FROM d{i}{s}
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
)"""
            )
            if i < PQ_ITERS:
                parts.append(
                    f"""
c{i}{s} AS (
    SELECT a.cluster, p.dim, round(avg(p.val), {_ROUND}) AS val
    FROM a{i}{s} a JOIN p{s} p ON p.vec_id = a.vec_id
    GROUP BY a.cluster, p.dim
)"""
                )
        sel.append(
            f"SELECT vec_id, {m} AS subspace, cluster AS code, "
            f"round(dist, 6) AS sq_err FROM a{PQ_ITERS}{s}"
        )
    return ",".join(parts), " UNION ALL ".join(sel)


def _sql_pq() -> str:
    ctes, sel = _sql_pq_ctes()
    return "WITH " + ctes + "\n" + sel


def _pq_fit(spark: SparkSession, sf_dir: str, m: int):
    """Memoized per-subspace codebook fit: (sub_points_df, centroids)."""

    def build():
        pts = _points(spark, sf_dir)
        sub = pts.select(
            "vec_id", F.slice("emb", m * PQ_SUB + 1, PQ_SUB).alias("emb")
        )
        seed = sub.filter(F.col("vec_id") < PQ_K).collect()
        centroids = [
            (int(r["vec_id"]), [round(float(x), _ROUND) for x in r["emb"]])
            for r in sorted(seed, key=lambda r: r["vec_id"])
        ]
        for _ in range(PQ_ITERS - 1):
            centroids = _update(_assign(sub, centroids))
        return (sub, centroids)

    return memo(spark, ("pq_fit", sf_dir, m), build)


@register("pq_codes", sql=_sql_pq(), tags=("similarity", "quantization", "ml", "scale"))
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011) — the vector-compression
    step between scalar int8 quantization and IVF in a 100 TB vector
    store: split each embedding into {PQ_M} x {PQ_SUB}-dim subspaces,
    fit a {PQ_K}-code deterministic Lloyd codebook per subspace, and
    encode every vector as {PQ_M} code ids (here with the winning squared
    reconstruction error per subspace). {PQ_M} codebooks x {PQ_K} codes
    x {PQ_SUB} dims replace {PQ_M * PQ_SUB} floats with {PQ_M} bytes per
    vector.

    Scale shape: each subspace fit reuses the Lloyd layout — broadcast
    codebook into an Arrow-batched argmin kernel (no shuffle), K x d
    centroid updates collected driver-side — and the {PQ_M} fits share
    the persisted points table. Exact oracle: DuckDB replays all
    {PQ_M} unrolled fits; deterministic first-K-points init and
    dist/cluster tie-breaks keep the codes identical."""
    out = None
    for m in range(PQ_M):
        sub, centroids = _pq_fit(spark, sf_dir, m)
        part = _assign_with_dist(sub, centroids).select(
            "vec_id",
            F.lit(m).alias("subspace"),
            F.col("cluster").alias("code"),
            F.round("dist", 6).alias("sq_err"),
        )
        out = part if out is None else out.unionByName(part)
    return out


PQ_ADC_QUERIES = 5
PQ_ADC_TOP_K = 10


@register(
    "pq_adc_topk",
    sql=f"""
WITH {_sql_pq_ctes()[0]},
adc AS (
    {" UNION ALL ".join(
        f'''SELECT q.vec_id AS query_id, a.vec_id AS db_id,
       sum((q.val - c.val) * (q.val - c.val)) AS d
FROM a{PQ_ITERS}_s{m} a
JOIN c{PQ_ITERS - 1}_s{m} c ON c.cluster = a.cluster
JOIN pts q ON q.dim = c.dim AND q.vec_id < {PQ_ADC_QUERIES}
GROUP BY q.vec_id, a.vec_id'''
        for m in range(PQ_M)
    )}
),
tot AS (
    SELECT query_id, db_id, round(sum(d), 6) AS adc_dist
    FROM adc WHERE query_id <> db_id
    GROUP BY query_id, db_id
)
SELECT query_id, db_id, adc_dist,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_dist, db_id) AS rank
FROM tot
QUALIFY rank <= {PQ_ADC_TOP_K}
""",
    tags=("similarity", "quantization", "scale"),
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance PQ search (Jégou et al. 2011 §IV): queries
    stay exact, the database side is its {PQ_M}-byte PQ code —
    d(q, v) ~= sum_m ||q_m - codebook_m[code_m(v)]||^2. At scale the
    per-query work is a {PQ_M} x {PQ_K} lookup table (computed once per
    query against the broadcast codebooks) plus one add per code — how a
    100 TB vector store scans billions of vectors without touching a
    float. Here distances are computed via the same broadcast joins the
    oracle replays, so every ADC distance and the per-query top-k
    hash-match DuckDB."""
    pts = _points(spark, sf_dir)
    queries = pts.filter(F.col("vec_id") < PQ_ADC_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    total = None
    for m in range(PQ_M):
        sub, centroids = _pq_fit(spark, sf_dir, m)
        codes = _assign(sub, centroids).select(
            F.col("vec_id").alias("db_id"), F.col("cluster").alias("code")
        )
        cb = spark.createDataFrame(
            [(c, v) for c, v in centroids], "code long, cent array<double>"
        )
        qs = queries.select(
            "query_id", F.slice("q_emb", m * PQ_SUB + 1, PQ_SUB).alias("q_sub")
        )
        from ..functions import vectors as V

        part = (
            codes.join(F.broadcast(cb), "code")
            .crossJoin(F.broadcast(qs))
            .select(
                "query_id",
                "db_id",
                V.sq_l2(F.col("q_sub"), F.col("cent")).alias("d"),
            )
        )
        total = part if total is None else total.unionByName(part)
    tot = (
        total.filter(F.col("query_id") != F.col("db_id"))
        .groupBy("query_id", "db_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("db_id"))
    return (
        tot.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_ADC_TOP_K)
        .select("query_id", "db_id", "adc_dist", "rank")
    )


# ------------------------------------------ IVF-PQ residual index (FAISS)

IVFPQ_COARSE_K = LLOYD_K  # coarse quantizer = the deterministic Lloyd fit
IVFPQ_ITERS = 2  # residual-codebook EM rounds (kept small for the oracle)


def _residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, coarse, remb): each vector minus its coarse centroid —
    the residual the fine PQ codebooks quantize. Memoized; the coarse fit
    is the memo-shared deterministic Lloyd."""

    def build():
        assigned, centroids = lloyd_fit(spark, sf_dir)
        cent = spark.createDataFrame(
            [(c, v) for c, v in centroids], "cluster long, cent array<double>"
        )
        return assigned.join(F.broadcast(cent), "cluster").select(
            "vec_id",
            F.col("cluster").alias("coarse"),
            F.zip_with("emb", "cent", lambda x, c: x - c).alias("remb"),
        )

    return memo(spark, ("ivfpq_res", sf_dir), build, persist=True)


def _ivfpq_fit(spark: SparkSession, sf_dir: str, m: int):
    """Memoized residual-subspace codebook: (sub_points_df, centroids)."""

    def build():
        res = _residuals(spark, sf_dir)
        sub = res.select(
            "vec_id",
            "coarse",
            F.slice("remb", m * PQ_SUB + 1, PQ_SUB).alias("emb"),
        )
        seed = sub.filter(F.col("vec_id") < PQ_K).collect()
        centroids = [
            (int(r["vec_id"]), [round(float(x), _ROUND) for x in r["emb"]])
            for r in sorted(seed, key=lambda r: r["vec_id"])
        ]
        for _ in range(IVFPQ_ITERS - 1):
            centroids = _update(_assign(sub, centroids))
        return (sub, centroids)

    return memo(spark, ("ivfpq_fit", sf_dir, m), build)


def _sql_ivfpq() -> str:
    """Coarse Lloyd CTEs + residual table + unrolled residual-PQ fits;
    final per-subspace assignment CTEs ra{IVFPQ_ITERS}_r{m}."""
    parts = [
        _sql_lloyd(IVFPQ_COARSE_K, LLOYD_ITERS),
        f"""
res AS MATERIALIZED (
    SELECT p.vec_id, a.cluster AS coarse, p.dim, p.val - c.val AS val
    FROM pts p
    JOIN a{LLOYD_ITERS} a ON a.vec_id = p.vec_id
    JOIN c{LLOYD_ITERS - 1} c ON c.cluster = a.cluster AND c.dim = p.dim
)""",
    ]
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
        s = f"_r{m}"
        parts.append(
            f"""
p{s} AS (SELECT vec_id, coarse, dim, val FROM res WHERE dim >= {lo} AND dim < {hi}),
rc0{s} AS (
    SELECT vec_id AS cluster, dim, round(val, {_ROUND}) AS val
    FROM p{s} WHERE vec_id < {PQ_K}
)"""
        )
        for i in range(1, IVFPQ_ITERS + 1):
            parts.append(
                f"""
rd{i}{s} AS (
    SELECT p.vec_id, c.cluster,
           sum((p.val - c.val) * (p.val - c.val)) AS dist
    FROM p{s} p JOIN rc{i - 1}{s} c ON c.dim = p.dim
    GROUP BY p.vec_id, c.cluster
),
ra{i}{s} AS (
    SELECT vec_id, cluster, dist FROM rd{i}{s}
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
)"""
            )
            if i < IVFPQ_ITERS:
                parts.append(
                    f"""
rc{i}{s} AS (
    SELECT a.cluster, p.dim, round(avg(p.val), {_ROUND}) AS val
    FROM ra{i}{s} a JOIN p{s} p ON p.vec_id = a.vec_id
    GROUP BY a.cluster, p.dim
)"""
                )
    return ",".join(parts)


@register(
    "ivfpq_codes",
    sql=f"""
WITH {_sql_ivfpq()}
{" UNION ALL ".join(
    f'''SELECT r.vec_id, r.coarse, {m} AS subspace,
       a.cluster AS code, round(a.dist, 6) AS sq_err
FROM ra{IVFPQ_ITERS}_r{m} a
JOIN (SELECT DISTINCT vec_id, coarse FROM res) r ON r.vec_id = a.vec_id'''
    for m in range(PQ_M)
)}
""",
    tags=("similarity", "quantization", "ml", "scale"),
)
def q_ivfpq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ residual index (Jégou et al. 2011 §V; the FAISS IVFPQ
    layout): the coarse Lloyd quantizer routes each vector to an inverted
    list, and {PQ_M} fine codebooks quantize the RESIDUAL x - c(x) —
    residuals concentrate near zero, so the same code budget spends its
    precision where the data actually lives. Output: one row per
    (vector, subspace) with the coarse list id, the fine code, and the
    per-subspace residual reconstruction error.

    Scale shape: every stage reuses the audited layouts — broadcast
    centroids into Arrow argmin kernels, K x d driver payloads, memoized
    residual table — and the whole two-level index (coarse fit, residual,
    {PQ_M} fine fits) replays exactly in DuckDB."""
    out = None
    for m in range(PQ_M):
        sub, centroids = _ivfpq_fit(spark, sf_dir, m)
        part = (
            _assign_with_dist(sub.select("vec_id", "emb"), centroids)
            .join(sub.select("vec_id", "coarse"), "vec_id")
            .select(
                "vec_id",
                "coarse",
                F.lit(m).alias("subspace"),
                F.col("cluster").alias("code"),
                F.round("dist", 6).alias("sq_err"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


IVFPQ_NPROBE = 3


@register(
    "ivfpq_adc_topk",
    sql=f"""
WITH {_sql_ivfpq()},
qc AS (
    SELECT p.vec_id AS query_id, c.cluster AS coarse,
           sum((p.val - c.val) * (p.val - c.val)) AS cd
    FROM pts p
    JOIN c{LLOYD_ITERS - 1} c ON c.dim = p.dim
    WHERE p.vec_id < {PQ_ADC_QUERIES}
    GROUP BY 1, 2
),
probe AS (
    SELECT query_id, coarse FROM qc
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cd, coarse)
            <= {IVFPQ_NPROBE}
),
qres AS MATERIALIZED (
    SELECT pr.query_id, pr.coarse, p.dim, p.val - c.val AS val
    FROM probe pr
    JOIN pts p ON p.vec_id = pr.query_id
    JOIN c{LLOYD_ITERS - 1} c ON c.cluster = pr.coarse AND c.dim = p.dim
),
rv AS (SELECT DISTINCT vec_id, coarse FROM res),
adc AS (
    {" UNION ALL ".join(
        f'''SELECT qr.query_id, a.vec_id AS db_id,
       sum((qr.val - cb.val) * (qr.val - cb.val)) AS d
FROM ra{IVFPQ_ITERS}_r{m} a
JOIN rv ON rv.vec_id = a.vec_id
JOIN qres qr ON qr.coarse = rv.coarse
            AND qr.dim >= {m * PQ_SUB} AND qr.dim < {(m + 1) * PQ_SUB}
JOIN rc{IVFPQ_ITERS - 1}_r{m} cb ON cb.cluster = a.cluster AND cb.dim = qr.dim
GROUP BY qr.query_id, a.vec_id'''
        for m in range(PQ_M)
    )}
),
tot AS (
    SELECT query_id, db_id, round(sum(d), 6) AS adc_dist
    FROM adc WHERE query_id <> db_id
    GROUP BY query_id, db_id
)
SELECT query_id, db_id, adc_dist,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_dist, db_id) AS rank
FROM tot
QUALIFY rank <= {PQ_ADC_TOP_K}
""",
    tags=("similarity", "quantization", "scale"),
)
def q_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ search: each query probes its {IVFPQ_NPROBE}
    nearest coarse lists, forms the per-list query residual q - c, and
    scores ONLY the vectors in those lists by residual ADC — the scan
    shape behind every production billion-vector index (inverted-list
    pruning x byte codes x lookup tables). The probe set, residuals and
    distances all replay exactly in DuckDB."""
    import numpy as np

    _, coarse_cents = lloyd_fit(spark, sf_dir)
    cids = np.array([c for c, _ in coarse_cents])
    C = np.array([v for _, v in coarse_cents], dtype=np.float64)
    pts = _points(spark, sf_dir)
    qrows = sorted(
        pts.filter(F.col("vec_id") < PQ_ADC_QUERIES).collect(),
        key=lambda r: r["vec_id"],
    )
    # model-sized driver work: probe lists + per-list query residuals
    probe_rows = []
    for r in qrows:
        q = np.array(r["emb"], dtype=np.float64)
        cd = ((q[None, :] - C) ** 2).sum(axis=1)
        order = sorted(range(len(cids)), key=lambda i: (cd[i], cids[i]))
        for i in order[:IVFPQ_NPROBE]:
            probe_rows.append(
                (int(r["vec_id"]), int(cids[i]), (q - C[i]).tolist())
            )
    qres = spark.createDataFrame(
        probe_rows, "query_id long, coarse long, qres array<double>"
    )
    from ..functions import vectors as V

    total = None
    for m in range(PQ_M):
        sub, centroids = _ivfpq_fit(spark, sf_dir, m)
        codes = _assign(sub.select("vec_id", "emb"), centroids).select(
            F.col("vec_id").alias("db_id"), F.col("cluster").alias("code")
        )
        cb = spark.createDataFrame(
            [(c, v) for c, v in centroids], "code long, cent array<double>"
        )
        part = (
            codes.join(sub.select(F.col("vec_id").alias("db_id"), "coarse"), "db_id")
            .join(F.broadcast(cb), "code")
            .join(
                F.broadcast(
                    qres.select(
                        "query_id",
                        "coarse",
                        F.slice("qres", m * PQ_SUB + 1, PQ_SUB).alias("q_sub"),
                    )
                ),
                "coarse",
            )
            .select(
                "query_id",
                "db_id",
                V.sq_l2(F.col("q_sub"), F.col("cent")).alias("d"),
            )
        )
        total = part if total is None else total.unionByName(part)
    tot = (
        total.filter(F.col("query_id") != F.col("db_id"))
        .groupBy("query_id", "db_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("db_id"))
    return (
        tot.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_ADC_TOP_K)
        .select("query_id", "db_id", "adc_dist", "rank")
    )
