"""Vector-column statistics over `embeddings` [N] — companions to the
similarity-search ops in similarity.py (same mandate: BASELINE.json:6).

Where similarity.py *searches* (top-k, ANN, near-dup pairs), this module
*profiles*: norm distributions per label (the sanity check before any
cosine math — un-normalized vectors make cosine ≠ dot) and sign-bucket
occupancy (the load-balance check for SimHash-style ANN bucketing).

Float-parity posture (same as similarity.py): element folds run in array
index order with float→double casts on both engines, and every float that
reaches an aggregate is first floored into integer 1e-5 units — group
aggregates are then exact integer arithmetic, immune to partition-order
summation drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..session import load_table


def _norm_e5(emb: Column) -> Column:
    """L2 norm in integer 1e-5 units: floor(||v|| * 1e5) as BIGINT."""
    sumsq = F.aggregate(
        emb,
        F.lit(0.0),
        lambda s, x: s + x.cast("double") * x.cast("double"),
    )
    return F.floor(F.sqrt(sumsq) * 100000).cast("long")


@register(
    "embed_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             CAST(floor(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 100000)
                  AS BIGINT) AS norm_e5
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(norm_e5) AS BIGINT) AS sum_norm_e5,
           CAST(MIN(norm_e5) AS BIGINT) AS min_norm_e5,
           CAST(MAX(norm_e5) AS BIGINT) AS max_norm_e5
    FROM n GROUP BY label
    """,
)
def embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile — the pre-flight check for every cosine
    pipeline (FIXTURES.md says the vectors are L2-normalized; this query
    is how a user *verifies* that before trusting dot == cosine).

    Scan-side codegen'd fold per vector (no UDF, no shuffle for the math),
    one partial+final agg on label.  At 100 TB the cost is the embedding
    scan itself; wire traffic is labels × 4 integers."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", _norm_e5(F.col("embedding")).alias("norm_e5"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("norm_e5").alias("sum_norm_e5"),
            F.min("norm_e5").alias("min_norm_e5"),
            F.max("norm_e5").alias("max_norm_e5"),
        )
    )


_N_PLANES = 8


def _sign_bucket(emb: Column) -> Column:
    """Sign pattern of the first 8 dims as an integer bucket id (0..255).

    Sign tests on floats are exact — no rounding ambiguity — so this is
    the rare *float-derived* key that is safely oracle-comparable.  It is
    also exactly the axis-aligned special case of the random-hyperplane
    bucketing sim_topk_ann uses, so bucket occupancy here measures the
    load balance that ANN join would see."""
    b = F.lit(0)
    for i in range(_N_PLANES):
        b = b + F.when(F.element_at(emb, i + 1) > 0, F.lit(1 << i)).otherwise(0)
    return b


@register(
    "embed_bucket_stats",
    oracle=f"""
    WITH b AS (
      SELECT label,
             ({" + ".join(f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)" for i in range(_N_PLANES))})
               AS bucket
      FROM embeddings
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
    FROM b GROUP BY bucket
    """,
)
def embed_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-bucket occupancy histogram: how many vectors (and distinct
    labels) land in each of the 256 sign buckets.  The skew diagnostic for
    ANN bucketing — a hot bucket here is a hot join partition in
    sim_topk_ann, and the fix (more planes, or salting the hot bucket) is
    decided from exactly this histogram.  Scan-side integer arithmetic,
    one tiny agg; output ≤ 256 rows at any scale."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", _sign_bucket(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_vecs"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


@register(
    "embed_centroids",
    oracle="""
    SELECT label, CAST(pos - 1 AS INT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1048576) AS BIGINT))
                AS BIGINT) AS sum_q20
    FROM (SELECT label,
                 generate_subscripts(embedding, 1) AS pos,
                 unnest(embedding) AS v
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid accumulators: for every (label, dimension), the
    vector count and the exact component sum in Q20 fixed point — the
    distributed half of a KMeans/mean-pooling step (the caller divides
    sum/n; keeping the division out keeps the oracle exact).

    Fixed-point note: ``floor(v * 2^20)`` is EXACT float-derived
    arithmetic — scaling a float by a power of two is lossless in
    double, and floor has no rounding ambiguity — unlike float→DECIMAL
    casts, which Spark performs via the shortest-string representation
    and DuckDB via the exact binary value (they disagree in the last
    digit; measured on these fixtures).  Integer sums then commute.

    Scale notes: posexplode is a 64× row expansion BEFORE the shuffle,
    but each exploded row is 20 bytes and partial aggregation collapses
    them map-side to (labels × 64) rows per task — the wire traffic is
    output-sized, the same reason agg_hash scales.  (MLlib's Summarizer
    avoids the explode at the cost of a black-box vector UDAF; the
    explode form stays whole-stage-codegen and oracle-checkable.)"""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        "pos",
        F.floor(F.col("v").cast("double") * (1 << 20)).cast("long").alias("q20"),
    )
    return ex.groupBy("label", "pos").agg(
        F.count("*").alias("n_vecs"),
        F.sum("q20").alias("sum_q20"),
    )


@register(
    "embed_quantize_int8",
    # Quantization uses FLOOR(x + 0.5), not ROUND: floor of a shared
    # IEEE double is bit-deterministic in both engines, while each
    # engine's ROUND(double) implementation differs at .5 boundaries
    # (decimal-repr vs binary — the engine-wide lesson from
    # common.round_dec).  The md5 of the joined codes then proves every
    # single code in every vector, not just aggregates.
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             len(embedding) AS n_dims,
             CAST(list_min(embedding) AS DOUBLE) AS mn,
             CAST(list_max(embedding) AS DOUBLE) AS mx,
             list_transform(embedding, v ->
               CAST(FLOOR((CAST(v AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))
                          * 255.0
                          / (CASE WHEN CAST(list_max(embedding) AS DOUBLE)
                                       = CAST(list_min(embedding) AS DOUBLE)
                                  THEN 1.0
                                  ELSE CAST(list_max(embedding) AS DOUBLE)
                                       - CAST(list_min(embedding) AS DOUBLE)
                             END)
                          + 0.5) AS INT)) AS codes
      FROM embeddings
    )
    SELECT vec_id, label,
           CAST(n_dims AS BIGINT) AS n_dims,
           mn AS range_min, mx AS range_max,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           md5(array_to_string(codes, ',')) AS code_md5
    FROM q
    ORDER BY vec_id
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector uint8 range quantization of the embedding column —
    4× memory/bandwidth compression for the vector store feeding
    `sim_topk_*` (the standard serving-side trick before PQ:
    code_i = ⌊(x_i − min)·255/(max − min) + ½⌋, reconstruct as
    min + code·(max−min)/255 with error ≤ range/510).

    The result row carries the min/max dequantization params and an
    md5 over the comma-joined codes: the oracle hash match certifies
    EVERY code of every vector bit-for-bit (arrays themselves are not
    canonicalizable by the driver harness — the digest is the array
    evidence).  Reconstruction error bound is asserted separately in
    tests/test_properties.py.

    Scale notes: pure scan-side codegen'd array math — no UDF, no
    shuffle, no state; output is one 50-byte row per vector.  Constant
    vectors are guarded to a unit denominator on both sides."""
    e = load_table(spark, sf_dir, "embeddings")
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    den = F.when(mx == mn, F.lit(1.0)).otherwise(mx - mn)
    codes = F.transform(
        F.col("embedding"),
        lambda v: F.floor((v.cast("double") - mn) * 255.0 / den + 0.5).cast(
            "int"
        ),
    )
    q = e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("n_dims"),
        mn.alias("range_min"),
        mx.alias("range_max"),
        codes.alias("codes"),
    )
    return q.select(
        "vec_id",
        "label",
        "n_dims",
        "range_min",
        "range_max",
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.md5(
            F.concat_ws(",", F.transform("codes", lambda c: c.cast("string")))
        ).alias("code_md5"),
    ).orderBy("vec_id")


@register("embed_pca_project")  # rows-only: eigendecomposition has no SQL twin
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA projection — the dimensionality-reduction /
    whitening step of every embedding pipeline (dataset maps, drift
    visualization, decorrelation before quantization), computed the
    way it actually distributes: moments first, eigen later.

    ONE Arrow-batched `mapInPandas` pass emits per-batch moment rows
    (count, Σx as d floats, ΣxxT as a d² flat array) — the sufficient
    statistics of the covariance, mergeable by construction.  The
    driver sums the ~(#partitions) partial rows (d=64 → 33 KB each),
    forms C = G/n − μμᵀ, and `numpy.linalg.eigh`s the d×d matrix —
    eigendecomposition is O(d³) DRIVER math on a frame whose size is
    independent of corpus row count; at 100 TB the data-path cost is
    still exactly one embedding scan.  Projection then goes back
    JVM-side: the top-2 components become literal arrays and each
    vector's coordinates are `zip_with` + `aggregate` folds (x·w − μ·w)
    inside codegen — no second Python hop.

    Eigenvector sign is fixed by convention (largest-|component| made
    positive) so the output is deterministic; coordinates are floored
    into integer 1e-5 units per the module's float discipline.  The
    pytest twin recomputes full-precision PCA with numpy on the
    collected matrix and asserts coordinate agreement within quantum
    tolerance plus the variance-ordering law var(pc1) ≥ var(pc2)."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    dim = int(e.select(F.size("embedding")).first()[0])

    def moments(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(m)],
                    "s": [m.sum(axis=0)],
                    "g": [(m.T @ m).ravel()],
                }
            )

    parts = e.select("embedding").mapInPandas(
        moments, "n long, s array<double>, g array<double>"
    ).toPandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    g = np.sum(np.stack(parts["g"].to_numpy()), axis=0).reshape(dim, dim)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    comps = []
    for j in (dim - 1, dim - 2):  # eigh returns ascending order
        w = evecs[:, j]
        if w[np.argmax(np.abs(w))] < 0:
            w = -w
        comps.append(w)

    def coord(w: "np.ndarray") -> Column:
        warr = F.array(*[F.lit(float(x)) for x in w])
        dot = F.aggregate(
            F.zip_with("embedding", warr, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.floor((dot - F.lit(float(mu @ w))) * 100000).cast("long")

    return e.select(
        "vec_id",
        "label",
        coord(comps[0]).alias("pc1_e5"),
        coord(comps[1]).alias("pc2_e5"),
    ).orderBy("vec_id")


_KM_K = 4
_KM_ITERS = 3


def _oracle_kmeans() -> str:
    """Unroll the Lloyd iterations as chained CTEs — same codegen-twin
    discipline as graph_pagerank/graph_shortest_paths: iteration count
    and arithmetic agree with the Spark loop by construction."""
    steps = []
    prev = "c0"
    for it in range(1, _KM_ITERS + 1):
        steps.append(
            f"""a{it} AS (
        SELECT f.vec_id, f.f1, f.f2, c.cluster,
               row_number() OVER (PARTITION BY f.vec_id ORDER BY
                 (f.f1 - c.c1) * (f.f1 - c.c1)
                 + (f.f2 - c.c2) * (f.f2 - c.c2), c.cluster) AS rn
        FROM feats f CROSS JOIN {prev} c
    ), c{it} AS (
        SELECT cluster,
               (2 * SUM(f1) + COUNT(*)) // (2 * COUNT(*)) AS c1,
               (2 * SUM(f2) + COUNT(*)) // (2 * COUNT(*)) AS c2,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM a{it} WHERE rn = 1 GROUP BY cluster
    )"""
        )
        prev = f"c{it}"
    return f"""
    WITH feats AS (
      SELECT vec_id,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 100000) AS BIGINT)
               AS f1,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 100000) AS BIGINT)
               AS f2
      FROM embeddings
    ), c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1
               AS cluster,
             f1 AS c1, f2 AS c2
      FROM feats ORDER BY vec_id LIMIT {_KM_K}
    ), {", ".join(steps)}
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(c1 AS BIGINT) AS c1_e5, CAST(c2 AS BIGINT) AS c2_e5,
           n_members
    FROM c{_KM_ITERS} ORDER BY cluster
    """


@register("kmeans_lloyd_exact", oracle=_oracle_kmeans())
def kmeans_lloyd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means as a driver-coordinated DataFrame loop (k=4, 3
    fixed iterations, first-k-points init) — the iterative-ML sibling
    of `graph_pagerank`, and the algorithm `sim_topk_ivf`/`sim_topk_pq`
    delegate to MLlib; here it is EXACT and oracle-proven: features are
    the first two embedding coordinates floored into integer 1e-5
    units, centroid updates are integer HALF-UP means, and assignment
    argmin runs on integer squared distances with ties to the lowest
    cluster id — every number in every iteration is integer arithmetic,
    so the unrolled DuckDB twin matches bit-for-bit (the float-free
    formulation of the module's discipline taken to its conclusion).

    Scale notes: per iteration, assignment is ONE broadcast of the k-row
    centroid frame against the feature scan (k·n integer ops, no
    shuffle) and the update is one partial+final agg keyed on cluster;
    the k-row argmax/centroid pull per round is the driver-coordinated
    merge decision, same posture as pagerank's rank frame.  2-D
    features keep the oracle writable; the Spark loop is
    dimension-generic (swap the two columns for an array fold)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    feats = e.select(
        "vec_id",
        F.floor(F.element_at("embedding", 1).cast("double") * 100000)
        .cast("long")
        .alias("f1"),
        F.floor(F.element_at("embedding", 2).cast("double") * 100000)
        .cast("long")
        .alias("f2"),
    )
    # k-row driver pull for init (same class as the per-round centroid
    # pull) — a global row_number window here would plan a needless
    # single-partition sort and fire WindowExec's warning.
    seed = feats.orderBy("vec_id").limit(_KM_K).collect()
    cents = spark.createDataFrame(
        [(i, r["f1"], r["f2"]) for i, r in enumerate(seed)],
        "cluster long, c1 long, c2 long",
    )
    for _ in range(_KM_ITERS):
        joined = feats.crossJoin(F.broadcast(cents.select("cluster", "c1", "c2")))
        dist = (F.col("f1") - F.col("c1")) * (F.col("f1") - F.col("c1")) + (
            F.col("f2") - F.col("c2")
        ) * (F.col("f2") - F.col("c2"))
        wv = Window.partitionBy("vec_id").orderBy(dist.alias("d"), "cluster")
        assigned = (
            joined.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1)
            .select("vec_id", "f1", "f2", "cluster")
        )
        cents = assigned.groupBy("cluster").agg(
            F.expr("(2 * sum(f1) + count(*)) div (2 * count(*))").alias("c1"),
            F.expr("(2 * sum(f2) + count(*)) div (2 * count(*))").alias("c2"),
            F.count("*").cast("long").alias("n_members"),
        )
    return cents.select(
        F.col("cluster").cast("long").alias("cluster"),
        F.col("c1").cast("long").alias("c1_e5"),
        F.col("c2").cast("long").alias("c2_e5"),
        "n_members",
    ).orderBy("cluster")


@register("embed_outliers_mahalanobis")  # rows-only: matrix inverse has no SQL twin
def embed_outliers_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier scoring by Mahalanobis distance — the
    covariance-aware QA gate that catches vectors `embed_norm_stats`
    cannot (a vector can have a perfectly normal norm while sitting far
    outside the data's correlation structure; Mahalanobis whitens by
    Σ⁻¹ so every direction counts at its own scale).  Reports the 20
    most anomalous vectors with their squared distances in integer 1e-3
    units.

    Same moments-first distribution as `embed_pca_project`: ONE Arrow
    `mapInPandas` pass emits mergeable (n, Σx, ΣxxT) rows, the driver
    forms Σ + εI (ridge for numerical safety) and inverts the d×d
    matrix — O(d³) independent of corpus size — then the quadratic form
    (x−μ)ᵀ Σ⁻¹ (x−μ) goes back JVM-side: d dot-products per vector via
    `zip_with`+`aggregate` folds over literal precision-matrix rows,
    inside codegen, no second Python hop.

    The pytest twin recomputes distances with numpy at full precision
    and asserts the top-20 set and quantized distances agree."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    dim = int(e.select(F.size("embedding")).first()[0])

    def moments(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {"n": [len(m)], "s": [m.sum(axis=0)], "g": [(m.T @ m).ravel()]}
            )

    parts = e.select("embedding").mapInPandas(
        moments, "n long, s array<double>, g array<double>"
    ).toPandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    g = np.sum(np.stack(parts["g"].to_numpy()), axis=0).reshape(dim, dim)
    mu = s / n
    cov = g / n - np.outer(mu, mu) + 1e-6 * np.eye(dim)
    prec = np.linalg.inv(cov)

    # (x−μ)ᵀP(x−μ) = xᵀPx − 2(Pμ)ᵀx + μᵀPμ: one fold per precision row
    # for the quadratic term, one fold for the linear term, a constant.
    pmu = prec @ mu
    const = float(mu @ prec @ mu)
    lin_arr = F.array(*[F.lit(float(v)) for v in pmu])
    lin = F.aggregate(
        F.zip_with("embedding", lin_arr, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    quad = F.lit(0.0)
    for i in range(dim):
        row_arr = F.array(*[F.lit(float(v)) for v in prec[i]])
        row_dot = F.aggregate(
            F.zip_with("embedding", row_arr, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        quad = quad + F.element_at("embedding", i + 1).cast("double") * row_dot
    d2 = quad - 2.0 * lin + F.lit(const)
    return (
        e.select(
            "vec_id",
            "label",
            F.floor(d2 * 1000).cast("long").alias("maha_d2_e3"),
        )
        .orderBy(F.col("maha_d2_e3").desc(), "vec_id")
        .limit(20)
    )


@register(
    "embed_silhouette",
    # Simplified (centroid) silhouette — Kaufman–Rousseeuw 1990, the
    # PAM book's medoid-free variant — of the LABEL clustering in the
    # quantized 2-D feature plane `kmeans_lloyd_exact` uses: a(i) =
    # d(x_i, own centroid), b(i) = min over other centroids, s(i) =
    # (b−a)/max(a,b).  Squared distances are exact integers (e5-floored
    # coords, half-up integer centroids — the kmeans discipline); the
    # only floats are two IEEE sqrts (correctly rounded by the
    # standard) and one guarded division, floored to e6 — identical on
    # both engines.
    oracle="""
    WITH feats AS (
      SELECT vec_id, label,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 100000) AS BIGINT)
               AS f1,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 100000) AS BIGINT)
               AS f2
      FROM embeddings
    ), cents AS (
      SELECT label AS clabel,
             (2 * SUM(f1) + COUNT(*)) // (2 * COUNT(*)) AS c1,
             (2 * SUM(f2) + COUNT(*)) // (2 * COUNT(*)) AS c2
      FROM feats GROUP BY 1
    ), dists AS (
      SELECT f.vec_id, f.label,
             MAX(CASE WHEN c.clabel = f.label
                 THEN (f.f1 - c.c1) * (f.f1 - c.c1)
                    + (f.f2 - c.c2) * (f.f2 - c.c2) END) AS a2,
             MIN(CASE WHEN c.clabel <> f.label
                 THEN (f.f1 - c.c1) * (f.f1 - c.c1)
                    + (f.f2 - c.c2) * (f.f2 - c.c2) END) AS b2
      FROM feats f CROSS JOIN cents c
      GROUP BY 1, 2
    ), scored AS (
      SELECT label,
             CASE WHEN a2 = 0 AND b2 = 0 THEN 0
                  ELSE CAST(floor((sqrt(CAST(b2 AS DOUBLE))
                                   - sqrt(CAST(a2 AS DOUBLE)))
                       / greatest(sqrt(CAST(a2 AS DOUBLE)),
                                  sqrt(CAST(b2 AS DOUBLE)))
                       * 1000000) AS BIGINT) END AS s_e6
      FROM dists
    ), tot AS (
      SELECT CAST(SUM(s_e6) // COUNT(*) AS BIGINT) AS overall_sil_e6
      FROM scored
    )
    SELECT s.label,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(s.s_e6) // COUNT(*) AS BIGINT) AS mean_sil_e6,
           MAX(t.overall_sil_e6) AS overall_sil_e6
    FROM scored s CROSS JOIN tot t
    GROUP BY 1 ORDER BY s.label
    """,
)
def embed_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid) silhouette of the label clustering — the
    clustering-quality gate: s(i) = (b−a)/max(a,b) with a = distance
    to the own-label centroid and b = distance to the nearest other
    centroid; mean s near +1 means labels are tight separated blobs,
    near 0 means label structure is invisible in this space, negative
    means points sit closer to a FOREIGN centroid.  The fixture's
    labels are geometrically unstructured in the feature plane (mean
    ≈ 0 — an honest 'these labels are not clusters' reading, the
    diagnostic this op exists to give); the planted pytest separates
    label blobs and drives the mean toward +1e6, then swaps half the
    labels and drives it negative.

    Exactness: e5-floored coordinates and half-up integer centroids
    (the `kmeans_lloyd_exact` discipline) make every squared distance
    an exact integer; the only floats are two IEEE-correctly-rounded
    sqrts and one guarded division, e6-floored on identical doubles;
    a2 = b2 = 0 (a point on two coincident centroids) scores 0 by
    definition on both engines.  Label means and the overall mean are
    integer divisions.

    Scale notes: ONE hash agg to the |labels|-row centroid frame,
    broadcast against the feature scan (k·n integer ops — the kmeans
    assignment posture, no shuffle), ONE conditional-agg reduce per
    vector, then a |labels|-row rollup + broadcast 1-row overall
    cross.  Works unchanged at any corpus size; the 2-D plane keeps
    the oracle writable (the Spark side generalizes to full-d via an
    array fold)."""
    e = load_table(spark, sf_dir, "embeddings")
    feats = e.select(
        "vec_id",
        "label",
        F.floor(F.element_at("embedding", 1).cast("double") * 100000)
        .cast("long")
        .alias("f1"),
        F.floor(F.element_at("embedding", 2).cast("double") * 100000)
        .cast("long")
        .alias("f2"),
    )
    cents = feats.groupBy(F.col("label").alias("clabel")).agg(
        F.expr("(2 * sum(f1) + count(*)) div (2 * count(*))").alias("c1"),
        F.expr("(2 * sum(f2) + count(*)) div (2 * count(*))").alias("c2"),
    )
    d2 = (F.col("f1") - F.col("c1")) * (F.col("f1") - F.col("c1")) + (
        F.col("f2") - F.col("c2")
    ) * (F.col("f2") - F.col("c2"))
    dists = (
        feats.crossJoin(F.broadcast(cents))
        .groupBy("vec_id", "label")
        .agg(
            F.max(
                F.when(F.col("clabel") == F.col("label"), d2)
            ).alias("a2"),
            F.min(
                F.when(F.col("clabel") != F.col("label"), d2)
            ).alias("b2"),
        )
    )
    sa = F.sqrt(F.col("a2").cast("double"))
    sb = F.sqrt(F.col("b2").cast("double"))
    scored = dists.select(
        "label",
        F.when((F.col("a2") == 0) & (F.col("b2") == 0), F.lit(0))
        .otherwise(
            F.floor((sb - sa) / F.greatest(sa, sb) * 1000000).cast("long")
        )
        .alias("s_e6"),
    )
    tot = scored.agg(
        F.expr("CAST(SUM(s_e6) div COUNT(1) AS BIGINT)").alias(
            "overall_sil_e6"
        )
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.expr("CAST(SUM(s_e6) div COUNT(1) AS BIGINT)").alias(
                "mean_sil_e6"
            ),
        )
        .crossJoin(F.broadcast(tot))
        .select("label", "n_members", "mean_sil_e6", "overall_sil_e6")
        .orderBy("label")
    )


@register(
    "embed_dim_variance",
    # Per-dimension moment profile of the embedding matrix — the
    # whitening/anisotropy diagnostic an embedding pipeline runs
    # before trusting cosine geometry (a dimension with outsized
    # variance dominates every distance; a dead dimension wastes
    # capacity — the "anisotropy problem" of contextual embeddings).
    # Values are e6-FLOORED to integers at the scan (floor(x·1e6) —
    # double·exact-power product + floor is bit-identical on both
    # engines), so Σv and Σv² are exact HUGEINT/DECIMAL(38,0) and the
    # variance (n·Σv² − (Σv)²)/n² is ONE double division, ROUND(6),
    # in raw embedding units (the e12 scales cancel).
    oracle="""
    WITH flat AS (
      SELECT generate_subscripts(embedding, 1) AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS v_e6
      FROM embeddings
    ), m AS (
      SELECT dim, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(v_e6) AS HUGEINT) AS s,
             CAST(SUM(CAST(v_e6 AS HUGEINT) * v_e6) AS HUGEINT) AS q
      FROM flat GROUP BY 1
    )
    SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n_vecs,
           CAST(s AS BIGINT) AS sum_v_e6,
           ROUND(CAST(n * q - s * s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12), 6)
               AS variance
    FROM m ORDER BY dim
    """,
)
def embed_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance profile of the embedding matrix — is the
    space isotropic?  The pre-flight diagnostic behind whitening and
    matryoshka truncation decisions: a dimension with outsized
    variance dominates every cosine; a near-zero one is dead capacity
    (`embed_matryoshka_eval` measures the truncation CONSEQUENCE;
    this measures the per-dimension CAUSE).  The fixture's vectors
    are near-isotropic (honest flat profile); the planted pytests pin
    a constant dimension at variance == 0.0 exactly and a ±1
    alternating dimension at exactly 1.0 (v_e6 = ±1e6, zero mean —
    the e12 scales cancel to an exact integer ratio).

    Exactness: each component is e6-floored AT THE SCAN
    (floor(CAST(x AS DOUBLE)·1e6) — the double product with an
    exactly-representable power is IEEE-identical on both engines, so
    the integers agree bit-for-bit); Σv and Σv² ride as
    HUGEINT/DECIMAL(38,0) (v_e6² ≈ 1e12 × corpus crosses int64 near
    1e6 vectors); variance is ONE double division of exact integers,
    ROUND(6).  Dimensions are 1-based on both engines (DuckDB
    generate_subscripts convention; Spark posexplode pos + 1).

    Scale notes: posexplode fans the scan to corpus×dim narrow rows
    that COLLAPSE in the map-side partial aggregate to |dims| groups
    — the exchange carries |dims| rows per task, never the fanout;
    output is |dims| (64) rows."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.expr(
            "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"
        ).alias("v_e6"),
    )
    m = flat.groupBy("dim").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(v_e6) AS DECIMAL(38,0))").alias("s"),
        F.expr(
            "CAST(SUM(CAST(v_e6 AS DECIMAL(38,0)) * v_e6)"
            " AS DECIMAL(38,0))"
        ).alias("q"),
    )
    return m.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("n").cast("long").alias("n_vecs"),
        F.col("s").cast("long").alias("sum_v_e6"),
        F.round(
            F.expr("CAST(n * q - s * s AS DOUBLE)")
            / (
                F.col("n").cast("double")
                * F.col("n").cast("double")
                * F.lit(1e12)
            ),
            6,
        ).alias("variance"),
    ).orderBy("dim")
