"""Similarity search over embedding columns (SURVEY §2.3 J).

Brute-force cosine top-k is the exact baseline; IVF-Flat with
deterministic seed centroids is the scale path (probe 1/K of the
corpus per query). Everything is JVM higher-order column expressions:
the dot product is a zip_with/aggregate fold — sequential double
accumulation, bit-identical to DuckDB's list_inner_product on
DOUBLE[] (verified property, relied on by the oracle checks).

At 100 TB:
- queries are broadcast (a query set is small by definition);
  candidates stream through a map-side join — no shuffle of the
  corpus;
- per-query top-k is row_number over a window partitioned by query
  id — one shuffle of (query, candidate-score) pairs, bounded by
  |queries| × |corpus partition|;
- IVF cuts the scanned fraction to ~1/K per query: the bucket join
  key (centroid id) co-partitions queries with their probe bucket.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: F.Column) -> F.Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-fold dot product in double (order-deterministic)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def with_norm(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    e = as_double(F.col(vec_col))
    return df.select(F.col(id_col).alias("id"), e.alias("e")).withColumn(
        "nrm", F.sqrt(dot(F.col("e"), F.col("e")))
    )


def cosine(ea: F.Column, eb: F.Column, na: F.Column, nb: F.Column) -> F.Column:
    return dot(ea, eb) / (na * nb)


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, vec_col: str, id_col: str, k: int
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, sim)."""
    c = with_norm(corpus, vec_col, id_col).withColumnsRenamed(
        {"id": "neighbor_id", "e": "ce", "nrm": "cn"}
    )
    q = with_norm(queries, vec_col, id_col).withColumnsRenamed(
        {"id": "query_id", "e": "qe", "nrm": "qn"}
    )
    sims = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_assign(corpus: DataFrame, centroids: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Assign every vector to its max-cosine centroid (IVF-Flat build).

    Centroids are broadcast; assignment is a map-side argmax via
    row_number over (vector, centroid-score)."""
    c = with_norm(centroids, vec_col, id_col).withColumnsRenamed(
        {"id": "centroid_id", "e": "ce", "nrm": "cn"}
    )
    v = with_norm(corpus, vec_col, id_col)
    scored = v.crossJoin(F.broadcast(c)).select(
        "id",
        "e",
        "nrm",
        "centroid_id",
        cosine(F.col("e"), F.col("ce"), F.col("nrm"), F.col("cn")).alias("csim"),
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(
        "id", "e", "nrm", "centroid_id"
    )


def _assign_topn(
    df: DataFrame, centroids: DataFrame, vec_col: str, id_col: str, n: int
) -> DataFrame:
    """Top-n nearest centroids per vector (multi-probe query fan-out)."""
    c = with_norm(centroids, vec_col, id_col).withColumnsRenamed(
        {"id": "centroid_id", "e": "ce", "nrm": "cn"}
    )
    v = with_norm(df, vec_col, id_col)
    scored = v.crossJoin(F.broadcast(c)).select(
        "id",
        "e",
        "nrm",
        "centroid_id",
        cosine(F.col("e"), F.col("ce"), F.col("nrm"), F.col("cn")).alias("csim"),
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= n).select(
        "id", "e", "nrm", "centroid_id"
    )


def train_centroids(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 16,
    seed: int = 7,
    sample_fraction: float | None = None,
    max_train_vectors: int = 200_000,
) -> DataFrame:
    """Train IVF centroids with k-means|| (pyspark.ml KMeans, fixed
    seed) — the quality upgrade over seeded first-K-vectors centroids:
    trained centroids tile the actual data distribution, so probe
    buckets are balanced and recall@k at the same nprobe is ≥ the
    seeded variant (measured in scripts/bench_operators.py).

    Training fits on a SAMPLE of the corpus: centroid positions
    converge long before the sample covers the distribution, so at
    100 TB fitting on every vector buys nothing but 20 extra full
    passes (this is an offline index build, but the passes still cost
    a cluster-day each). sample_fraction=None auto-sizes to about
    max_train_vectors rows (FAISS guidance is ~max(10k, 256·k)
    training points; 200k is comfortably past that for any practical
    k); pass 1.0 to force a full fit. Fixed seed ⇒ deterministic
    sample ⇒ deterministic centroids. recall@k vs the full fit is
    within noise (scripts/bench_operators.py).

    Returns (id_col, vec_col) shaped like the corpus so it drops into
    ivf_topk unchanged. Scale: k-means|| is the distributed-init
    variant designed for exactly this (Bahmani et al., VLDB'12); each
    iteration is one map-side assignment pass + a k-row reduce."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if sample_fraction is None:
        n = corpus.count()
        sample_fraction = min(1.0, max_train_vectors / max(n, 1))
    train = corpus if sample_fraction >= 1.0 else corpus.sample(sample_fraction, seed=seed)
    vecs = train.select(array_to_vector(as_double(F.col(vec_col))).alias("features"))
    model = KMeans(k=k, seed=seed, initMode="k-means||", maxIter=20).fit(vecs)
    centers = model.clusterCenters()
    spark = corpus.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        f"{id_col} long, {vec_col} array<double>",
    )
    return cdf


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    nprobe: int = 1,
) -> DataFrame:
    """IVF ANN top-k: search the query's ``nprobe`` nearest centroid
    buckets. Scanned fraction ≈ nprobe/num_centroids; recall rises
    with nprobe (measured in scripts/bench_operators.py). nprobe is
    the standard IVF quality/cost dial — probe-1 for cheap recall,
    probe-¼-of-K approaching exact."""
    assigned = ivf_assign(corpus, centroids, vec_col, id_col).withColumnsRenamed(
        {"id": "neighbor_id", "e": "ce", "nrm": "cn"}
    )
    q_assigned = _assign_topn(queries, centroids, vec_col, id_col, nprobe).withColumnsRenamed(
        {"id": "query_id", "e": "qe", "nrm": "qn"}
    )
    sims = q_assigned.join(assigned, "centroid_id").select(
        "query_id",
        "neighbor_id",
        "centroid_id",
        cosine(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "centroid_id", "neighbor_id", "rank", "sim")
    )


def quantize_int8(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Symmetric int8 quantization of an embedding column.

    Per vector: scale = max|x| / 127; q_i = clamp(floor(x_i/scale + .5),
    -127, 127). The storage form a 100 TB embedding corpus actually
    ships (4× smaller than float32, dot products in int arithmetic);
    here the engine-side contract is determinism — every output column
    is either integer (exact) or a fixed-order array fold (float ops in
    array order, bit-identical across engines — same property the
    cosine operators rely on).

    floor(x + 0.5) instead of round(): engines disagree on
    round-half-to-even vs half-away-from-zero, floor does not.
    All-zero vectors quantize to all-zero (scale guard).

    Performance: the per-vector scale must NOT be referenced inside a
    per-element lambda — HOF lambdas don't share outer subexpressions,
    so each of the 64 elements would recompute the array_max chain
    (measured ~10× slower; the word_shingles pitfall again). Instead
    ``array_repeat(scale, n)`` evaluates scale once per row and hands
    it to the lambdas as a plain element argument.

    Returns (id, n_dims, q_l1, q_sum, recon_mse):
    q_l1/q_sum integer checksums of the quantized vector, recon_mse
    the mean squared dequantization error.
    """
    x = as_double(F.col(vec_col))
    mx = F.array_max(F.transform(x, F.abs))
    sarr = F.array_repeat(mx / F.lit(127.0), F.size(x))
    q = F.when(mx == 0.0, F.transform(x, lambda v: F.lit(0.0))).otherwise(
        F.zip_with(
            x,
            sarr,
            lambda v, s: F.greatest(
                F.lit(-127.0), F.least(F.lit(127.0), F.floor(v / s + 0.5))
            ),
        )
    )
    recon = F.zip_with(q, sarr, lambda qi, s: qi * s)
    err2 = F.zip_with(x, recon, lambda v, r: (v - r) * (v - r))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(x).cast("long").alias("n_dims"),
        F.aggregate(q, F.lit(0.0), lambda a, v: a + F.abs(v)).cast("long").alias("q_l1"),
        F.aggregate(q, F.lit(0.0), lambda a, v: a + v).cast("long").alias("q_sum"),
        (F.aggregate(err2, F.lit(0.0), lambda a, v: a + v) / F.size(x)).alias("recon_mse"),
    )


def signbit_lsh_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos: float,
    n_bands: int = 4,
    bits_per_band: int = 4,
    stride: int = 4,
) -> DataFrame:
    """Embedding near-dup via sign-bit LSH: random-hyperplane hashing
    with axis-aligned hyperplanes (the bit for dimension d is
    sign(e[d]) — for unit-ish embeddings two vectors at angle θ agree
    on a coordinate sign with probability 1 − θ/π, the classic SimHash
    bound), banded like MinHash-LSH so only pairs colliding in ≥1
    band's bucket are candidates, then EXACT cosine verification.

    Scale story (why this replaces the all-pairs variant at 100 TB):
    candidate generation is n_bands equi-joins on small integer bucket
    keys — work is Σ per-bucket |bucket|², bounded by the bit width,
    never corpus². Verification touches candidates only. Recall is
    tunable (more bands → higher recall, more candidates); the
    signature derivation is one map-side projection that rides the
    scan. Deterministic on both engines: the "hyperplanes" are fixed
    coordinate picks, so the DuckDB oracle reproduces the exact same
    candidate set and verdicts.
    """
    from kcore_spark.caching import transient_persist

    n = with_norm(emb, vec_col, id_col)
    band_cols = []
    for band in range(n_bands):
        expr = None
        for j in range(bits_per_band):
            d = (band * bits_per_band + j) * stride + 1  # 1-based
            bit = F.when(F.element_at(F.col("e"), d) >= 0, 2**j).otherwise(0)
            expr = bit if expr is None else expr + bit
        band_cols.append(expr.alias(f"b{band}"))
    # persisted: the signature table feeds both sides of every band
    # join plus the verification re-join
    sig = transient_persist(n.select("id", "e", "nrm", *band_cols))
    keys = sig.select("id", *[f"b{b}" for b in range(n_bands)])
    cand = None
    for band in range(n_bands):
        a = keys.select(F.col("id").alias("id1"), F.col(f"b{band}").alias("k"))
        b = keys.select(F.col("id").alias("id2"), F.col(f"b{band}").alias("k"))
        pairs = a.join(b, "k").where(F.col("id1") < F.col("id2")).select("id1", "id2")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()
    va = sig.select(F.col("id").alias("id1"), F.col("e").alias("e1"), F.col("nrm").alias("n1"))
    vb = sig.select(F.col("id").alias("id2"), F.col("e").alias("e2"), F.col("nrm").alias("n2"))
    return (
        cand.join(va, "id1")
        .join(vb, "id2")
        .select(
            "id1",
            "id2",
            cosine(F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= min_cos)
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
) -> DataFrame:
    """Product quantization encode: split each vector into ``m``
    subvectors and replace each with the id of the nearest codebook
    entry's matching subvector (L2, ties → lowest code id) — the
    compression format behind IVF-PQ indexes (each vector becomes m
    small codes instead of d floats).

    ``codebook``: (code, vector) rows — k rows, one shared codebook
    whose j-th subvector quantizes subspace j (the oracle-pinned
    analog of a trained per-subspace codebook, same pinning stance as
    the IVF query's fixed centroids).

    Plan shape: corpus × broadcast(codebook × m subspaces) — work is
    O(n · k · m) map-side arithmetic, the true PQ encode cost; the
    only shuffles are the per-(vector, subspace) argmin and the final
    per-vector pack. Distances are sequential folds (bit-equal to the
    DuckDB oracle); per-vector distortion sums decimals (order-free).

    Returns (id, pq_codes '<c0>|<c1>|...', distortion).
    """
    from pyspark.sql import Window

    d_sub = F.expr(
        "aggregate(zip_with(slice(e, j * sub + 1, sub), slice(ce, j * sub + 1, sub),"
        " (a, b) -> (a - b) * (a - b)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    n = corpus.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("e"))
    cb = codebook.select(
        F.col("code"), as_double(F.col("vector")).alias("ce")
    )
    dims = len(corpus.select(vec_col).first()[0])
    assert dims % m == 0, f"dim {dims} must split into {m} subspaces"
    sub = dims // m
    pairs = (
        n.crossJoin(F.broadcast(cb))
        .withColumn("sub", F.lit(sub))
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(m - 1))))
        .withColumn("dist", d_sub)
    )
    w = Window.partitionBy("id", "j").orderBy(F.col("dist").asc(), F.col("code").asc())
    best = pairs.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    return (
        best.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "code"))),
                    lambda x: x["code"].cast("string"),
                ),
                "|",
            ).alias("pq_codes"),
            F.round(
                F.sum(F.round("dist", 12).cast("decimal(30,12)")).cast("double"), 9
            ).alias("distortion"),
        )
    )
