"""§2.10 Vector similarity search over `embeddings` [N] (SURVEY.md;
mandate: BASELINE.json:6).

The fixture vectors are L2-normalized (verified in FIXTURES.md), so dot
product == cosine similarity; all scoring below is plain dot product.

Scale posture:

* The **exact** path is O(n·m) and exists as the correctness oracle and
  for bounded candidate sets.  It is never run unblocked: queries join
  candidates within a blocking key (`label` here; an IVF/LSH bucket at
  production scale).
* The **ANN** path buckets by random-hyperplane signs (SimHash for
  vectors): one narrow projection per side, an equi-join on the bucket
  key, exact re-rank inside buckets.  Hyperplanes are fixed literals
  (seeded) so results are deterministic run-to-run.
* Dot products stay JVM-side: ``aggregate(zip_with(a, b, (x,y)->x*y))``
  is a codegen'd fold — no UDF, no Arrow round-trip.  Both engines cast
  float→double (exact) then fold 64 doubles in index order, so the
  oracle comparison is bit-stable.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..session import load_table

EMBED_DIM = 64


def dot(a: Column, b: Column) -> Column:
    """Codegen'd double-precision dot product of two array<float> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


@register(
    "sim_topk_exact",
    oracle="""
    WITH q AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 25 = 0),
    pairs AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             floor(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])) * 100000) / 100000
               AS cosine
      FROM q JOIN embeddings e
        ON q.label = e.label AND q.vec_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 3
    """,
)
def sim_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 within the query's `label` block.

    The label equi-join is the blocking key: the plan is a hash join on
    label (never a cartesian), then a per-query top-k window.  Floor-
    truncated at 1e-5 with a (cosine, neighbor_id) tie-break so ordering
    is engine-independent."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    pairs = q.join(e, (F.col("q_label") == F.col("label"))).where(
        F.col("query_id") != F.col("vec_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.floor(dot(F.col("q_emb"), F.col("embedding")) * 100000) / 100000).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


def _hyperplanes(n_planes: int, dim: int = EMBED_DIM, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed → stable buckets)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def simhash_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector under fixed hyperplanes (SimHash)."""
    # Projection of emb onto each plane: fold over zip_with(emb, plane).
    bucket = F.lit(0).cast("long")
    for p in planes:
        plane = F.array(*[F.lit(v) for v in p])
        proj = F.aggregate(
            F.zip_with(emb, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bucket = bucket * 2 + F.when(proj > 0, 1).otherwise(0)
    return bucket


#: Banded-LSH amplification parameters for `sim_topk_ann`.  OR-over-bands:
#: a corpus vector is a candidate if it agrees with the query on ALL bits
#: of at least ONE band — P(candidate) = 1-(1-p^BITS)^BANDS where p is the
#: per-hyperplane sign-agreement probability (1 - θ/π).  The fixture
#: vectors are near-uniform (true neighbors only mildly correlated, p ≈
#: 0.62 at the top-3 boundary), the adversarial case for LSH, so reaching
#: recall ≥ 0.8 needs generous banding; on real embedding corpora, where
#: near-duplicates have p ≥ 0.9, the same plan reaches that recall with
#: far fewer/wider bands (tune BANDS down / BITS up → fewer candidates).
#: Measured at sf0.001 vs unblocked brute force: (4,4)=0.43, (6,3)=0.72,
#: (8,3)=0.83 recall — the assertion lives in tests/test_properties.py.
ANN_BANDS = 8
ANN_BITS = 3


def _band_keys(emb: Column, bands: int = ANN_BANDS, bits: int = ANN_BITS) -> Column:
    """Array of (band, val) struct keys from a banded SimHash signature.

    Each band's value is the sign signature of its OWN disjoint plane
    subset — equivalent to slicing one (bands·bits)-bit signature, but
    each projection fold appears exactly once in the expression tree
    (the slice-of-shared-signature form duplicated all 24 folds per
    band: measured 1.5 MB task binaries at 8 bands)."""
    planes = _hyperplanes(bands * bits)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                simhash_bucket(emb, planes[i * bits : (i + 1) * bits]).alias("val"),
            )
            for i in range(bands)
        ]
    )


@register("sim_topk_ann")  # rows-only: ANN recall is approximate by design
def sim_topk_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via banded SimHash LSH + exact re-rank.

    Each vector gets a 24-bit hyperplane-sign signature split into 8
    bands of 3 bits; candidate pairs share at least one full band
    (standard OR-amplification — `P = 1-(1-p^3)^8`).  The candidate join
    is an equi-join on (band, val) — never all-pairs — followed by a
    pair-distinct and an exact dot-product re-rank, the same
    shape/scale posture as `dedup_simhash` and `dedup_minhash`.  Recall
    vs unblocked brute force is asserted ≥ 0.8 in
    tests/test_properties.py (measured 0.83 on the near-uniform fixture
    vectors — LSH's adversarial case; see ANN_BANDS/ANN_BITS note).

    The r3 single-probe 8-bit variant measured recall 0.05 here — a
    bucket equi-join alone is NOT an ANN index on weakly-correlated
    data; amplification is what buys recall, at candidate-set cost."""
    e = load_table(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id", "embedding", F.explode(_band_keys(F.col("embedding"))).alias("bk")
    ).select("vec_id", "embedding", "bk.band", "bk.val")
    q = b.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "band",
        "val",
    )
    cand = (
        q.join(b, ["band", "val"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "q_emb", "vec_id", "embedding")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.floor(dot(F.col("q_emb"), F.col("embedding")) * 100000) / 100000).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("query_id", "neighbor_id")
    )


def _ivf_centroids(e: DataFrame, nlist: int, fit: str = "kmeans") -> DataFrame:
    """IVF coarse-quantizer centroids as an (cell_id, c_emb) frame.

    ``kmeans`` (default): seeded MLlib KMeans — the real IVF training
    step; distributed fit, tiny (nlist×dim) model pulled to the driver,
    exactly like any offline index build.  ``sample``: deterministic
    seeded corpus sample, zero ML dependency, lower recall.
    """
    if fit == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        vec = e.select(
            array_to_vector(F.col("embedding").cast("array<double>")).alias(
                "features"
            )
        )
        model = KMeans(k=nlist, seed=42, maxIter=10).fit(vec)
        rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
        return e.sparkSession.createDataFrame(
            rows, "cell_id int, c_emb array<double>"
        )
    return (
        e.orderBy(F.xxhash64("vec_id"))
        .limit(nlist)
        .select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb"))
    )


@register("sim_topk_ivf")  # rows-only: ANN recall is approximate by design
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via an IVF (inverted-file) index:
    coarse-quantize every vector to its nearest of ``nlist`` centroids,
    then answer each query by probing only its ``nprobe`` nearest cells
    and exact-re-ranking inside them.

    The scale path, piece by piece:

    * **Centroids** come from a seeded MLlib KMeans fit (k=nlist,
      seed=42 — deterministic run-to-run) over the corpus; that is the
      production IVF training step and it is a distributed fit, not a
      collect.  ``SSKOS_IVF_FIT=sample`` falls back to a deterministic
      seeded corpus sample (``orderBy(xxhash64(vec_id)).limit(nlist)``
      plans as ``TakeOrderedAndProject`` — no full sort) for
      environments without pyspark.ml; measured recall@3 on the fixture
      is 0.92 (kmeans) vs 0.73 (sample) at nlist=16/nprobe=8.
    * **Assignment** is a broadcast nested-loop join of the corpus
      against the tiny centroid table (nlist rows), folded to the argmax
      cell with ``max_by`` — one pass over the data, partial+final agg,
      no shuffle of the embedding column beyond the group-by on vec_id.
    * **Probing** joins the nprobe cells per query against the cell
      assignment on the cell id — a plain equi shuffle join whose output
      is candidate-sized (n·nprobe/nlist expected), never n².
    * Re-rank is the same codegen'd double dot product as the exact path;
      recall ≥ 0.8 vs brute force is asserted in
      tests/test_properties.py::test_ivf_recall_against_bruteforce.
    """
    import os

    nlist, nprobe, k = 16, 8, 3
    e = load_table(spark, sf_dir, "embeddings")
    cent = _ivf_centroids(
        e, nlist, fit=os.environ.get("SSKOS_IVF_FIT", "kmeans")
    )

    # Coarse assignment: nearest centroid per vector (broadcast NL + argmax).
    scored_cells = e.select("vec_id", "embedding").crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "cell_id", dot(F.col("embedding"), F.col("c_emb")).alias("sim")
    )
    assign = scored_cells.groupBy("vec_id").agg(
        F.max_by("cell_id", "sim").alias("cell_id"),
        F.first("embedding").alias("embedding"),
    )

    # Each query probes its nprobe nearest cells.
    q = e.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_sim").desc(), F.col("cell_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "q_emb", "cell_id", dot(F.col("q_emb"), F.col("c_emb")).alias("c_sim"))
        .withColumn("pn", F.row_number().over(probe_w))
        .where(F.col("pn") <= nprobe)
        .select("query_id", "q_emb", "cell_id")
    )

    cand = probes.join(assign, "cell_id").where(F.col("query_id") != F.col("vec_id"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.floor(dot(F.col("q_emb"), F.col("embedding")) * 100000) / 100000).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.col("cosine").desc())
    )


@register(
    "dedup_embed_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) * 100000) / 100000
             AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) > 0.4
    """,
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine high-similarity pair mining within a label block
    — semantic dedup, the embedding-space sibling of `dedup_minhash`.

    Threshold 0.4: the synthetic fixture contains no true near-dups (max
    pairwise cosine ≈ 0.475, measured), so a production-style 0.99 cut
    would make the test vacuous; the plan is identical either way.
    Blocked on label; at production scale the block key is an ANN bucket
    (`sim_topk_ann`) instead."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
    )
    d = dot(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(b, (F.col("label_a") == F.col("label_b")) & (F.col("id_a") < F.col("id_b")))
        .where(d > 0.4)
        .select(
            "id_a", "id_b", (F.floor(d * 100000) / 100000).alias("cosine")
        )
    )


def _pq_codebooks(e: DataFrame, m: int, ksub: int, dim: int) -> DataFrame:
    """Per-subspace codebooks as one broadcastable frame
    (subspace, cell, c_sub array<double>, c_norm2).

    m seeded MLlib KMeans fits, one per dim/m-wide slice — the real PQ
    training step.  Model size is m·ksub·(dim/m) = ksub·dim doubles
    total (same as ONE full-dim centroid table), the only driver pull.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sub = dim // m
    rows = []
    for j in range(m):
        vec = e.select(
            array_to_vector(
                F.slice(F.col("embedding").cast("array<double>"), j * sub + 1, sub)
            ).alias("features")
        )
        model = KMeans(k=ksub, seed=42 + j, maxIter=10).fit(vec)
        for c, center in enumerate(model.clusterCenters()):
            cs = [float(x) for x in center]
            rows.append((j, c, cs, float(sum(x * x for x in cs))))
    return e.sparkSession.createDataFrame(
        rows, "subspace int, cell int, c_sub array<double>, c_norm2 double"
    )


@register("sim_topk_pq")  # rows-only: ANN recall is approximate by design
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via product quantization (the FAISS
    ``IndexPQ`` design): split each 64-dim vector into m=8 subvectors,
    quantize each against its own ksub=32-entry codebook (→ a 8×5-bit
    code, 40 bits per vector vs 2048 raw — 51× memory compression), scan
    with asymmetric distance computation (ADC: per-query lookup table,
    8 table probes per corpus vector instead of 64 multiplies), then
    exact-re-rank a 50-deep shortlist.

    The scale path, piece by piece:

    * **Training** is m seeded distributed KMeans fits
      (`_pq_codebooks`); the codebook is the only driver pull and is
      ksub·dim doubles regardless of corpus size.
    * **Encoding** is one broadcast join against the m·ksub codebook
      rows: code_j = argmin ‖x_j − c‖² = argmax (x_j·c − ‖c‖²/2),
      folded per (vec_id, subspace) with ``max_by`` and assembled into
      an ordered code array — after this the full embedding column is
      DROPPED from the scan path; at 100 TB the ADC scan reads 5-byte
      codes, not 256-byte vectors.
    * **ADC scoring** builds each query's (subspace, cell) → dot
      contribution table as a flat 256-double array, broadcast with the
      query set, and scores every code word with 8 ``element_at``
      lookups folded JVM-side — no UDF, no Arrow.
    * **Re-rank** joins TRUE embeddings back for only the 50-deep
      shortlist per query and applies the exact codegen'd dot product;
      recall@3 ≥ 0.8 vs numpy brute force is asserted in
      tests/test_properties.py::test_pq_recall_against_bruteforce.
    * At 100 TB this composes with `sim_topk_ivf`'s coarse cells
      (IVF-PQ): coarse cell prunes the scan, PQ codes shrink it.
    """
    m, ksub, dim, shortlist, k = 8, 32, EMBED_DIM, 50, 3
    sub = dim // m
    e = load_table(spark, sf_dir, "embeddings")
    books = F.broadcast(_pq_codebooks(e, m, ksub, dim))

    # Encode: per-(vector, subspace) argmax of (x_j·c − ‖c‖²/2).
    scored = e.select("vec_id", "embedding").crossJoin(books).select(
        "vec_id",
        "subspace",
        "cell",
        (
            dot(F.slice(F.col("embedding"), F.col("subspace") * sub + 1, sub),
                F.col("c_sub"))
            - F.col("c_norm2") / 2
        ).alias("fit"),
    )
    codes = (
        scored.groupBy("vec_id", "subspace")
        .agg(F.max_by("cell", "fit").alias("code"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )

    # Per-query ADC lookup table: flat array indexed subspace·ksub + cell.
    q = e.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    lut = (
        q.crossJoin(books)
        .select(
            "query_id",
            "subspace",
            "cell",
            dot(F.slice(F.col("q_emb"), F.col("subspace") * sub + 1, sub),
                F.col("c_sub")).alias("contrib"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "cell", "contrib"))),
                lambda s: s["contrib"],
            ).alias("lut")
        )
    )

    # ADC scan: 8 table lookups per corpus code word.
    idx = F.sequence(F.lit(0), F.lit(m - 1))
    adc = codes.join(F.broadcast(lut)).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.aggregate(
            F.transform(
                idx,
                lambda j: F.element_at(
                    F.col("lut"), (j * ksub + F.element_at(F.col("codes"), j + 1) + 1).cast("int")
                ),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        ).alias("adc_score"),
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    short = adc.withColumn("rn", F.row_number().over(w_short)).where(
        F.col("rn") <= shortlist
    )

    # Exact re-rank of the shortlist on true embeddings.
    nb = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    rer = (
        short.join(q, "query_id")
        .join(nb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(dot(F.col("q_emb"), F.col("n_emb")) * 100000) / 100000).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.col("cosine").desc())
    )


@register(
    "embed_matryoshka_eval",
    # Matryoshka-truncation evaluation: does ranking by the FIRST 16 of
    # 64 dims reproduce the full-dim top-3?  Both rankings use the
    # proven sim_topk_exact determinism recipe (floor-truncate at 1e-5,
    # neighbor-id tiebreak, within-label blocking); the overlap count
    # and recall are then pure integer arithmetic.
    oracle="""
    WITH q AS (
        SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 25 = 0
    ), pairs AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               floor(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[]))
                     * 100000) / 100000 AS cos_full,
               floor(list_dot_product(CAST(q.embedding[1:16] AS DOUBLE[]),
                                      CAST(e.embedding[1:16] AS DOUBLE[]))
                     * 100000) / 100000 AS cos_trunc
        FROM q JOIN embeddings e
          ON q.label = e.label AND q.vec_id <> e.vec_id
    ), truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_full DESC, neighbor_id) AS rn
            FROM pairs) WHERE rn <= 3
    ), approx AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_trunc DESC, neighbor_id) AS rn
            FROM pairs) WHERE rn <= 3
    )
    SELECT t.query_id,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_overlap,
           ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE) / 3.0, 6) AS recall_at_3
    FROM truth t
    LEFT JOIN approx a
      ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
    GROUP BY t.query_id
    ORDER BY t.query_id
    """,
)
def embed_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka / truncated-dimension retrieval evaluation: per query,
    how much of the exact 64-dim cosine top-3 survives when ranking by
    only the first 16 dimensions — the measurement behind the
    "truncate MRL embeddings to cut index cost" decision, done
    EXACTLY (both rankings brute-force within the label block) so the
    answer is an eval, not an estimate.

    Scale notes: one blocked pair join (label equi-join — the
    sim_topk_exact posture, never cartesian) scores BOTH similarities
    in a single pass (the truncated dot is a prefix of the full one;
    no second join); the two rank windows share the pair frame and
    partition by query.  The fixtures' vectors are near-uniform — the
    adversarial case for truncation — so low recall here is the
    honest floor; real MRL-trained embeddings concentrate information
    in the prefix and score far higher with the same plan."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    pairs = (
        q.join(e, (F.col("q_label") == F.col("label")))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.floor(dot(F.col("q_emb"), F.col("embedding")) * 100000) / 100000
            ).alias("cos_full"),
            (
                F.floor(
                    dot(F.slice(F.col("q_emb"), 1, 16), F.slice(F.col("embedding"), 1, 16))
                    * 100000
                )
                / 100000
            ).alias("cos_trunc"),
        )
    )
    w_full = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col("neighbor_id")
    )
    w_trunc = Window.partitionBy("query_id").orderBy(
        F.col("cos_trunc").desc(), F.col("neighbor_id")
    )
    truth = (
        pairs.withColumn("rn", F.row_number().over(w_full))
        .where(F.col("rn") <= 3)
        .select("query_id", "neighbor_id")
    )
    approx = (
        pairs.withColumn("rn", F.row_number().over(w_trunc))
        .where(F.col("rn") <= 3)
        .select(
            F.col("query_id").alias("a_qid"), F.col("neighbor_id").alias("a_nid")
        )
    )
    return (
        truth.join(
            approx,
            (truth.query_id == approx.a_qid)
            & (truth.neighbor_id == approx.a_nid),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("a_nid").cast("long").alias("n_overlap"),
            F.round(F.count("a_nid").cast("double") / 3.0, 6).alias("recall_at_3"),
        )
        .orderBy("query_id")
    )


#: Component quantum for the k-NN graph: 1e-4 units.  With |x| < 1 and
#: dim 64 every quantized component is ≤ 1e4, every product ≤ 1e8, and
#: every dot ≤ 6.4e9 — all EXACT in int64, float64, and DuckDB's DOUBLE
#: list_dot_product alike, so the score is identical under ANY summation
#: order and ANY execution strategy (SQL fold, numpy GEMM, BLAS).
_KNN_Q = 10_000

#: GEMM chunk: rows of the score matrix materialized at once inside a
#: block.  Memory per task = _KNN_CHUNK x |block| x 8 B (~160 MB at a
#: 20k-vector block), independent of how big the block gets.
_KNN_CHUNK = 1_024


def _knn_block(pdf):
    """Per-block exact k-NN via integer GEMM (numpy int64): top-3 by
    (quantized dot DESC, id ASC), self excluded, chunked so score-matrix
    memory stays bounded regardless of block size."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    n = len(ids)
    if n < 2:
        return pd.DataFrame(
            {"id_a": [], "rk": [], "id_b": [], "idot": []}
        ).astype({"id_a": "int64", "rk": "int64", "id_b": "int64", "idot": "int64"})
    # float64 BLAS GEMM, still EXACT: quantized components are ≤ 1e4,
    # so every product (≤ 1e8) and every partial sum (≤ dim·1e8 =
    # 6.4e9) is an integer far below 2^53 — no floating step can
    # round, regardless of BLAS blocking/FMA order.  dgemm is ~10-50x
    # the throughput of numpy's integer matmul at the 20k-vector
    # blocks the sf10 probe runs.
    m = np.stack(pdf["q"].to_numpy()).astype(np.float64)
    k = min(3, n - 1)
    frames = []
    # Self-exclusion sentinel: very negative but SAFELY NEGATABLE —
    # np.iinfo(int64).min would wrap to itself under the -c negation
    # below and sort the excluded self FIRST (caught by the sf0.01
    # parity check on this operator's first GEMM version).
    neg = np.int64(-(1 << 62))
    # Composite key C = dot*(n+1) - id_rank orders by (dot DESC, id ASC)
    # in one integer (ids are sorted, so rank order == id order).
    rank_pen = np.arange(n, dtype=np.int64)[None, :]
    for lo in range(0, n, _KNN_CHUNK):
        hi = min(lo + _KNN_CHUNK, n)
        g = (m[lo:hi] @ m.T).astype(np.int64)  # exact (see above)
        c = g * np.int64(n + 1) - rank_pen
        c[np.arange(hi - lo), np.arange(lo, hi)] = neg  # exclude self
        top = np.argpartition(-c, kth=k - 1, axis=1)[:, :k]
        rows = np.arange(hi - lo)[:, None]
        order = np.argsort(-c[rows, top], axis=1, kind="stable")
        top = top[rows, order]
        frames.append(
            pd.DataFrame(
                {
                    "id_a": np.repeat(ids[lo:hi], k),
                    "rk": np.tile(np.arange(1, k + 1, dtype=np.int64), hi - lo),
                    "id_b": ids[top.ravel()],
                    "idot": g[rows, top].ravel(),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


@register(
    "embed_knn_graph",
    # Blocked k-NN graph (k=3): within each label block, every vector's
    # top-3 neighbors ranked by the quantized-component integer dot
    # (1e-4 component cells) with id tiebreak.  Quantizing the INPUT
    # (not the score) makes every dot an exact integer under any
    # summation order, so SQL fold, list_dot_product, and numpy GEMM
    # agree bit-for-bit.
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> ROUND(x * 10000)) AS qe
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(list_dot_product(a.qe, b.qe) AS BIGINT) AS idot
        FROM q a JOIN q b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ), ranked AS (
        SELECT id_a, id_b, idot,
               ROW_NUMBER() OVER (PARTITION BY id_a
                                  ORDER BY idot DESC, id_b) AS rk
        FROM pairs
    )
    SELECT id_a, CAST(rk AS BIGINT) AS rk, id_b, idot,
           CAST(idot AS DOUBLE) / 100000000 AS cosine_q
    FROM ranked WHERE rk <= 3
    """,
)
def embed_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph (k=3) over the embedding corpus, blocked by label:
    each vector's three nearest neighbors by cosine within its block —
    the input graph for graph-based near-dup clustering, kNN
    classification, and UMAP-style layouts.

    Execution is a per-block integer GEMM (`applyInPandas` → numpy
    int64 matmul), NOT a pair join: the r7 sf1 sweep measured the
    zip_with-fold pair-join formulation at 105x wall for 10x data
    (324 s, ~8 µs/pair); the GEMM form runs the same 40M exact dots in
    ~2 s because blocked matrix multiply is the right physical operator
    for all-pairs scoring.  Components quantize to 1e-4 integer units
    FIRST, so every dot is an exact int64 under any summation order and
    the ranking (dot DESC, id ASC) is bit-identical across numpy, the
    SQL fold, and DuckDB's list_dot_product — quantize-the-input beats
    quantize-the-score because it makes the arithmetic itself
    order-free, not just the comparison.

    Scale notes: ONE shuffle (hash by block key); per-task memory is
    chunked to `_KNN_CHUNK` score-matrix rows (~160 MB at a 20k block)
    regardless of block size.  The label stands in for an ANN bucket
    (`sim_topk_ivf`); production occupancy is bounded by nlist sizing,
    and Σ|block|² work is the documented cost of exact in-block kNN —
    the GEMM fix removes the 100x constant, the blocking design caps
    the asymptotics."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000)"
            " AS BIGINT))"
        ).alias("q"),
    )
    out = e.groupBy("label").applyInPandas(
        _knn_block, schema="id_a long, rk long, id_b long, idot long"
    )
    return out.select(
        "id_a",
        "rk",
        "id_b",
        "idot",
        (F.col("idot").cast("double") / 100000000).alias("cosine_q"),
    )


@register(
    "embed_hubness",
    # Hubness audit of the blocked k-NN graph (k=3): the in-degree
    # (k-occurrence) distribution over ALL vectors, including the
    # 0-in-degree anti-hubs the graph rollup alone would drop.  High
    # max-in-degree / heavy right tail is THE known failure mode of
    # high-dimensional ANN retrieval (hub points dominate neighbor
    # lists); this is the readout that says whether it is happening.
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> ROUND(x * 10000)) AS qe
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(list_dot_product(a.qe, b.qe) AS BIGINT) AS idot
        FROM q a JOIN q b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ), ranked AS (
        SELECT id_a, id_b, idot,
               ROW_NUMBER() OVER (PARTITION BY id_a
                                  ORDER BY idot DESC, id_b) AS rk
        FROM pairs
    ), indeg AS (
        SELECT v.vec_id, COUNT(r.id_a) AS k_occ
        FROM q v LEFT JOIN ranked r
          ON r.id_b = v.vec_id AND r.rk <= 3
        GROUP BY v.vec_id
    )
    SELECT CAST(k_occ AS BIGINT) AS k_occurrence,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER () AS BIGINT)
               AS share_ppm
    FROM indeg
    GROUP BY k_occ
    ORDER BY k_occ
    """,
)
def embed_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the k-NN graph: the distribution of
    k-occurrence (how many OTHER vectors list me among their top-3
    neighbors) over every vector, 0-in-degree anti-hubs included.
    Mean in-degree is k by construction; what matters is the shape —
    a heavy right tail (hub vectors appearing in many neighbor lists)
    is the canonical high-dimensional failure mode of cosine
    retrieval, and it degrades both kNN classification and
    graph-based dedup built on `embed_knn_graph`.  Reported as the
    (k_occurrence, n_vecs, share_ppm) histogram — the input to a
    skewness decision, small enough to eyeball.

    Scale notes: reuses the blocked integer-GEMM k-NN graph (the r7
    quadratic-fold fix) — one applyInPandas pass per label block; the
    in-degree rollup is ONE hash aggregate on the (n_vecs × k)-row
    edge list joined left from the vector dim so anti-hubs keep their
    zero; the histogram is bounded by the max in-degree (≤ block
    size).  The share window runs on that bounded histogram
    (reviewed SINGLE)."""
    edges = embed_knn_graph(spark, sf_dir).select("id_b")
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id")
    indeg = (
        vecs.join(edges, vecs.vec_id == edges.id_b, "left")
        .groupBy("vec_id")
        .agg(F.count("id_b").alias("k_occ"))
    )
    w_all = Window.partitionBy()
    return (
        indeg.groupBy("k_occ")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .select(
            F.col("k_occ").cast("long").alias("k_occurrence"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.expr(
                "CAST(n_vecs * 1000000 AS BIGINT)"
            ).alias("_num"),
            F.sum("n_vecs").over(w_all).alias("_tot"),
        )
        .select(
            "k_occurrence",
            "n_vecs",
            F.expr("_num div _tot").cast("long").alias("share_ppm"),
        )
        .orderBy("k_occurrence")
    )


#: SemDeDup blocking/threshold constants.  k is DATA-ADAPTIVE:
#: max(_SD_K_MIN, n // _SD_CLUSTER_TARGET) — the SemDeDup prescription
#: (the paper ran 110k clusters over LAION) that keeps per-cluster size
#: ~constant, so total pair volume Σ|c|²/2 ≈ n·target/2 grows LINEARLY
#: in n instead of n²/k (the r10 sf1 sweep measured 14.3× growth /
#: 175 s with a fixed k=8 before this; adaptive k → ~linear).  Both
#: engines compute the same k from the same count, so the oracle stays
#: exact: the Lloyd unroll is k-agnostic, only the c0 seed LIMIT moves.
#: _SD_TAU_E5 = 0.40 in integer 1e-5 units: the synthetic fixture's max
#: pairwise cosine is ≈0.49 (no true paraphrase dups), so a production
#: 0.99 cut would be vacuous — the plan is identical either way and the
#: pytest injects true near-dups.
_SD_K_MIN = 8
_SD_CLUSTER_TARGET = 250
_SD_ITERS = 3
_SD_TAU_E5 = 40000
#: Multi-probe width (r13): pairs are compared when they share ANY of
#: their _SD_PROBES nearest clusters, not just the primary — the IVF
#: multi-probe fix for boundary splits.  BENCH_semdedup20k measured the
#: probe-1 form at 0.862 recall on planted cosine-0.999 twins (a
#: near-identical pair straddles a 2-D k-means boundary ~14% of the
#: time); probe-2 recovers the straddlers whose second-nearest cells
#: meet.  Pair volume stays linear: ≤ probes²·target·n/2.
_SD_PROBES = 2


def _oracle_dedup_semantic() -> str:
    """Unroll the Lloyd iterations as chained CTEs (the
    `kmeans_lloyd_exact` codegen-twin recipe) over the exact-collapsed
    corpus, apply the SemDeDup drop rule on representative groups, then
    expand the per-member rows through the multiplicity algebra.  `av`
    is referenced twice (both sides of the within-cluster pair join) so
    it is MATERIALIZED — the multi-reference CTE-inlining hazard
    documented in SURVEY §8."""
    steps = []
    prev = "c0"
    for it in range(1, _SD_ITERS + 1):
        steps.append(
            f"""a{it} AS (
        SELECT f.rep_id, f.f1, f.f2, c.cluster,
               row_number() OVER (PARTITION BY f.rep_id ORDER BY
                 (f.f1 - c.c1) * (f.f1 - c.c1)
                 + (f.f2 - c.c2) * (f.f2 - c.c2), c.cluster) AS rn
        FROM feats f CROSS JOIN {prev} c
    ), c{it} AS (
        SELECT cluster,
               (2 * SUM(f1) + COUNT(*)) // (2 * COUNT(*)) AS c1,
               (2 * SUM(f2) + COUNT(*)) // (2 * COUNT(*)) AS c2
        FROM a{it} WHERE rn = 1 GROUP BY cluster
    )"""
        )
        prev = f"c{it}"
    return f"""
    WITH raw AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), grp AS MATERIALIZED (
      SELECT emb, MIN(vec_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS g_n
      FROM raw GROUP BY emb
    ), feats AS MATERIALIZED (
      SELECT rep_id, g_n,
             CAST(floor(emb[1] * 100000) AS BIGINT) AS f1,
             CAST(floor(emb[2] * 100000) AS BIGINT) AS f2,
             emb
      FROM grp
    ), c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY rep_id) AS BIGINT) - 1
               AS cluster,
             f1 AS c1, f2 AS c2
      FROM feats ORDER BY rep_id
      LIMIT (SELECT GREATEST({_SD_K_MIN},
                             COUNT(*) // {_SD_CLUSTER_TARGET})
             FROM feats)
    ), {", ".join(steps)}, asg AS MATERIALIZED (
      SELECT f.rep_id, f.emb, f.g_n, c.cluster,
             (f.f1 - c.c1) * (f.f1 - c.c1)
               + (f.f2 - c.c2) * (f.f2 - c.c2) AS d2,
             row_number() OVER (PARTITION BY f.rep_id ORDER BY
               (f.f1 - c.c1) * (f.f1 - c.c1)
               + (f.f2 - c.c2) * (f.f2 - c.c2), c.cluster) AS rn
      FROM feats f CROSS JOIN c{_SD_ITERS} c
    ), probes AS MATERIALIZED (
      SELECT rep_id, cluster FROM asg WHERE rn <= {_SD_PROBES}
    ), av AS MATERIALIZED (
      SELECT rep_id, emb, g_n, cluster, d2 FROM asg WHERE rn = 1
    ), cand AS (
      SELECT DISTINCT pv.rep_id AS v_id, pu.rep_id AS u_id
      FROM probes pv JOIN probes pu ON pu.cluster = pv.cluster
      WHERE pu.rep_id <> pv.rep_id
    ), ext AS (
      SELECT v.rep_id,
             CAST(SUM(u.g_n) AS BIGINT) AS ext_cnt,
             CAST(MAX(CAST(floor(list_dot_product(u.emb, v.emb) * 100000)
                           AS BIGINT)) AS BIGINT) AS ext_best
      FROM cand c
      JOIN av v ON v.rep_id = c.v_id
      JOIN av u ON u.rep_id = c.u_id
      WHERE floor(list_dot_product(u.emb, v.emb) * 100000) >= {_SD_TAU_E5}
        AND (u.d2 > v.d2 OR (u.d2 = v.d2 AND u.rep_id < v.rep_id))
      GROUP BY v.rep_id
    ), gstat AS (
      SELECT a.rep_id, a.cluster, a.d2,
             CAST(floor(list_dot_product(a.emb, a.emb) * 100000) AS BIGINT)
               AS c_self,
             e.ext_cnt, e.ext_best
      FROM av a LEFT JOIN ext e ON e.rep_id = a.rep_id
    ), members AS (
      SELECT vec_id,
             CAST(row_number() OVER (PARTITION BY emb ORDER BY vec_id)
                  AS BIGINT) - 1 AS rk,
             MIN(vec_id) OVER (PARTITION BY emb) AS rep_id
      FROM raw
    ), scored AS (
      SELECT m.vec_id, g.cluster, g.d2,
             COALESCE(g.ext_cnt, 0)
               + CASE WHEN g.c_self >= {_SD_TAU_E5} THEN m.rk ELSE 0 END
               AS n_dom,
             CASE WHEN g.c_self >= {_SD_TAU_E5} AND m.rk > 0
                       AND (g.ext_best IS NULL OR g.c_self > g.ext_best)
                  THEN g.c_self ELSE g.ext_best END AS best_cos
      FROM members m JOIN gstat g ON g.rep_id = m.rep_id
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(cluster AS BIGINT) AS cluster,
           CAST(d2 AS BIGINT) AS d2_e5sq,
           CAST(n_dom AS BIGINT) AS n_dominators,
           CAST(best_cos AS BIGINT) AS best_cos_e5
    FROM scored WHERE n_dom > 0
    ORDER BY vec_id
    """


@register("dedup_semantic", oracle=_oracle_dedup_semantic())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup — semantic (paraphrase-level) deduplication in embedding
    space (Abbas et al. 2023, public): k-means cluster the corpus
    embeddings, then drop every vector that has a τ-cosine
    near-duplicate sitting FARTHER from the centroid (the paper's
    keep-farthest rule: among semantic duplicates, the example least
    typical of its cluster is kept for diversity).  Candidate pairs are
    MULTI-PROBE blocked (r13): two vectors are compared when ANY of
    their _SD_PROBES=2 nearest clusters coincide — the IVF multi-probe
    fix for boundary splits, adopted after BENCH_semdedup20k measured
    the probe-1 form at 0.862 recall on planted cosine-0.999 twins
    (a near-identical pair straddles a k-means boundary ~14% of the
    time on the 2-D feature).  The modern member of the dedup family
    that exact text / MinHash / SimHash / containment / pHash all
    miss: paraphrases share no n-grams but do share an embedding
    neighborhood.

    EXACT-COLLAPSE FORM (r14 — VERDICT r13 #2 killed the raw-pair
    shape): identical embeddings previously rode through the pair join
    as full cliques, so candidate pairs grew with exact-duplicate
    multiplicity² — the sf10 replica fixture (100 copies × 2k distinct)
    measured 453.7 s vs 21.7 s for the same op over a pre-collapsed
    corpus (BASELINE.md r13).  The minhash/phash r11 recipe, applied:
    group identical embedding arrays, elect the min-vec_id
    representative, run clustering + multi-probe pairing over
    REPRESENTATIVES only, then expand per-member drop rows by closed-
    form multiplicity algebra.  Within an exact group all members share
    f1/f2, hence the cluster and the d2, so the keep-farthest rule
    degenerates to the vec_id tie-break: the member at ascending-vec_id
    rank r has exactly r within-group dominators (each at the group's
    self-cosine c_self = floor(dot(e,e)·1e5), counted only when
    c_self ≥ τ) — all but the min-id member drop.  Cross-group
    dominators are group-level (cosine, d2, and candidacy are functions
    of the embedding alone): a dominator group contributes its FULL
    multiplicity g_n to every member of the dominated group.  Cross-
    group d2 ties break on rep_id (group-level, closed-form) — this is
    the one semantics refinement vs the raw form, where equal-d2
    cross-group pairs tie-broke on per-member vec_id; on any corpus
    without exact-duplicate embeddings (all driver SFs: verified 0
    dup groups at sf0.001/0.01/0.1) the two forms are identical because
    every group is a singleton with rep_id == vec_id.

    Output: one row per DROPPED vector — (vec_id, cluster, integer
    squared distance to centroid, how many dominators forced the drop,
    best dominator cosine in 1e-5 units).  The keep set is the
    complement; emitting drops keeps the result decision-auditable.

    Exactness: clustering is the `kmeans_lloyd_exact` recipe verbatim
    over the collapsed corpus (first-2-coordinate features floored to
    integer 1e-5 units, data-adaptive k = max(8, n_distinct/250)
    computed identically on both engines, first-k-by-rep_id seeds,
    3 fixed Lloyd iterations, integer half-up centroid means, integer
    argmin assignment with ties to the lowest cluster id), cosines are
    index-order double folds floored to integer 1e-5 units, and the
    drop rule compares integers only — the collapsed DuckDB twin
    matches bit-for-bit, multiplicity expansion included.

    Scale notes: pair volume is now over DISTINCT embeddings —
    ≤ probes²·Σ_c |c|² with k scaling off n_distinct (target cluster
    size ~250; SemDeDup ran 110k clusters over LAION), LINEAR in the
    collapsed corpus and IMMUNE to replica multiplicity (the r13 wart:
    multiplicity² pair blowup on replica-dense input).  The collapse is
    one hash aggregate on the embedding array; the member expansion is
    one window over the same key (rank within exact group) plus one
    join from corpus-sized members to the distinct-sized group stats on
    a long key — all linear, no pair-shaped shuffle touches raw rows.
    Per Lloyd iteration the centroid frame is a broadcast k-row literal
    against the staged representative table (feats is staged: the
    collapse aggregate feeds the count, the seed pull, 3 Lloyd passes
    and the final assignment); the pair join shuffles each cluster's
    representatives to one key — the documented skew guard is the k
    choice itself (cluster occupancy is load-balance-audited by
    `embed_bucket_stats`' recipe).  The dominator test is an inner
    self-join + groupBy over representative pairs, output bounded by
    the drop count."""
    from ..common import stage

    e = load_table(spark, sf_dir, "embeddings")
    raw = e.select("vec_id", "embedding")
    # Exact collapse (the minhash/phash r11 recipe): the embedding
    # array itself is the group key — a hash collision cannot merge
    # two distinct vectors, unlike a 64-bit digest.
    grp = raw.groupBy("embedding").agg(
        F.min("vec_id").alias("rep_id"),
        F.count(F.lit(1)).cast("long").alias("g_n"),
    )
    feats = stage(
        grp.select(
            "rep_id",
            "g_n",
            F.floor(F.element_at("embedding", 1).cast("double") * 100000)
            .cast("long")
            .alias("f1"),
            F.floor(F.element_at("embedding", 2).cast("double") * 100000)
            .cast("long")
            .alias("f2"),
            "embedding",
        )
    )
    # Data-adaptive k (the SemDeDup prescription — see the constants
    # note), now off the DISTINCT count: per-cluster size stays
    # ~_SD_CLUSTER_TARGET so pair volume grows linearly in n_distinct.
    # The count + k-row seed pull is the driver-coordinated init (k·2
    # longs — ~2 MB even at LAION's 110k clusters); production would
    # swap in kmeans|| sampled init, which changes the seeds, not the
    # plan shape.
    k = max(_SD_K_MIN, feats.count() // _SD_CLUSTER_TARGET)
    seed = feats.select("rep_id", "f1", "f2").orderBy("rep_id").limit(k).collect()
    cents = spark.createDataFrame(
        [(i, r["f1"], r["f2"]) for i, r in enumerate(seed)],
        "cluster long, c1 long, c2 long",
    )
    d2 = (F.col("f1") - F.col("c1")) * (F.col("f1") - F.col("c1")) + (
        F.col("f2") - F.col("c2")
    ) * (F.col("f2") - F.col("c2"))
    wv = Window.partitionBy("rep_id").orderBy(d2.alias("d"), "cluster")
    for _ in range(_SD_ITERS):
        assigned = (
            feats.crossJoin(F.broadcast(cents.select("cluster", "c1", "c2")))
            .withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1)
            .select("f1", "f2", "cluster")
        )
        cents = assigned.groupBy("cluster").agg(
            F.expr("(2 * sum(f1) + count(*)) div (2 * count(*))").alias("c1"),
            F.expr("(2 * sum(f2) + count(*)) div (2 * count(*))").alias("c2"),
        )
    asg = stage(
        feats.crossJoin(F.broadcast(cents.select("cluster", "c1", "c2")))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") <= _SD_PROBES)
        .select("rep_id", "embedding", "g_n", "cluster", "d2", "rn")
    )
    av = asg.where(F.col("rn") == 1)
    # multi-probe candidate pairs over REPRESENTATIVES: v and u meet
    # when ANY of their _SD_PROBES nearest clusters coincide; DISTINCT
    # collapses pairs that share both probes so each dominator group is
    # counted once.
    pv = asg.select(F.col("rep_id").alias("v_id"), F.col("cluster").alias("p_cluster"))
    pu = asg.select(F.col("rep_id").alias("u_id"), F.col("cluster").alias("p_cluster"))
    cand = (
        pv.join(pu, "p_cluster")
        .where(F.col("v_id") != F.col("u_id"))
        .select("v_id", "u_id")
        .distinct()
    )
    v = av.select(
        F.col("rep_id").alias("v_id"),
        F.col("embedding").alias("v_emb"),
        F.col("d2").alias("v_d2"),
    )
    u = av.select(
        F.col("rep_id").alias("u_id"),
        F.col("embedding").alias("u_emb"),
        F.col("d2").alias("u_d2"),
        F.col("g_n").alias("u_g_n"),
    )
    cos_e5 = F.floor(dot(F.col("u_emb"), F.col("v_emb")) * 100000).cast("long")
    # Group-level dominance: a dominator group ships its whole
    # multiplicity; d2 ties break on rep_id (see docstring).
    ext = (
        cand.join(v, "v_id")
        .join(u, "u_id")
        .where(
            (cos_e5 >= _SD_TAU_E5)
            & (
                (F.col("u_d2") > F.col("v_d2"))
                | ((F.col("u_d2") == F.col("v_d2")) & (F.col("u_id") < F.col("v_id")))
            )
        )
        .groupBy("v_id")
        .agg(
            F.sum("u_g_n").cast("long").alias("ext_cnt"),
            F.max(cos_e5).alias("ext_best"),
        )
        .withColumnRenamed("v_id", "rep_id")
    )
    c_self = F.floor(dot(F.col("embedding"), F.col("embedding")) * 100000).cast(
        "long"
    )
    gstat = av.select(
        "rep_id", "cluster", "d2", c_self.alias("c_self")
    ).join(ext, "rep_id", "left")
    # Member expansion: rank within the exact group (ascending vec_id)
    # and the group key, from ONE window shuffle over the embedding
    # array; the join back to group stats is on the long rep_id.
    we = Window.partitionBy("embedding")
    members = raw.select(
        "vec_id",
        (F.row_number().over(we.orderBy("vec_id")) - 1).cast("long").alias("rk"),
        F.min("vec_id").over(we).alias("rep_id"),
    )
    int_active = F.col("c_self") >= _SD_TAU_E5
    n_dom = (
        F.coalesce(F.col("ext_cnt"), F.lit(0))
        + F.when(int_active, F.col("rk")).otherwise(F.lit(0))
    ).cast("long")
    best = F.when(
        int_active
        & (F.col("rk") > 0)
        & (F.col("ext_best").isNull() | (F.col("c_self") > F.col("ext_best"))),
        F.col("c_self"),
    ).otherwise(F.col("ext_best"))
    return (
        members.join(gstat, "rep_id")
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cluster").cast("long").alias("cluster"),
            F.col("d2").cast("long").alias("d2_e5sq"),
            n_dom.alias("n_dominators"),
            best.cast("long").alias("best_cos_e5"),
        )
        .where(F.col("n_dominators") > 0)
        .orderBy("vec_id")
    )


@register(
    "sim_hard_negatives",
    oracle="""
    WITH q AS (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE vec_id % 25 = 0 ORDER BY vec_id LIMIT 64
    ), pairs AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             e.vec_id AS negative_id, e.label AS negative_label,
             CAST(floor(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                         CAST(e.embedding AS DOUBLE[]))
                        * 100000) AS BIGINT) AS cos_e5
      FROM q JOIN embeddings e ON q.label <> e.label
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(query_label AS BIGINT) AS query_label,
           CAST(negative_id AS BIGINT) AS negative_id,
           CAST(negative_label AS BIGINT) AS negative_label,
           cos_e5
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_e5 DESC, negative_id)
                      AS rn
          FROM pairs)
    WHERE rn <= 2
    ORDER BY query_id, cos_e5 DESC, negative_id
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the 2 highest-cosine vectors carrying a DIFFERENT label —
    the examples most likely to confuse a retriever/classifier, and
    the standard negatives source for embedding fine-tuning (in-batch
    negatives miss exactly these).  The complement of `sim_topk_exact`'s
    same-label search on the same query set.

    Scale notes: the candidate join is query-batch × corpus with a
    label INEQUALITY — it cannot block on the label key, so the QUERY
    BATCH is the bounded side: the 4 %-sample is capped at 64 queries
    (ORDER BY vec_id LIMIT — mining runs per training batch, never
    all-queries-at-once; the uncapped form measured 31.7× sf1 growth,
    |Q| ∝ n ⇒ n²/25 pairs — the r10 sweep catch).  Candidate volume is
    then 64·n, linear.  At production scale the per-query candidate
    set additionally comes from an ANN shortlist (`sim_topk_ivf`'s
    probed cells / `sim_topk_ann`'s bucket union, depth ≫ k) with the
    label filter pruning it — mining quality tracks shortlist depth,
    not corpus size.  Scoring is the module's codegen'd double fold
    floored to e5 ints; top-2 is a per-query window on the candidate
    frame."""
    e = load_table(spark, sf_dir, "embeddings")
    q = (
        e.where(F.col("vec_id") % 25 == 0)
        .orderBy("vec_id")
        .limit(64)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("q_emb"),
        )
    )
    pairs = q.join(e, F.col("query_label") != F.col("label")).select(
        "query_id",
        "query_label",
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.floor(dot(F.col("q_emb"), F.col("embedding")) * 100000)
        .cast("long")
        .alias("cos_e5"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_e5").desc(), F.col("negative_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("query_label").cast("long").alias("query_label"),
            F.col("negative_id").cast("long").alias("negative_id"),
            F.col("negative_label").cast("long").alias("negative_label"),
            "cos_e5",
        )
        .orderBy("query_id", F.col("cos_e5").desc(), "negative_id")
    )
