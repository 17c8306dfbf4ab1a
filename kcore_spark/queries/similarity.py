"""Similarity-search queries over `embeddings` (SURVEY §2.3 J).

The double-precision cosine arithmetic is bit-identical between the
Spark fold and DuckDB's list_inner_product on DOUBLE[] (both are
sequential left-to-right accumulations), so raw sims hash-match.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.similarity import as_double, cosine_topk, ivf_topk, signbit_lsh_pairs, with_norm
from kcore_spark.queries import QuerySpec

NORM_CTE = """
n AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings)
"""

# -------------------------------------------------- brute-force top-k


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    corpus = emb.where(F.col("vec_id") >= 20)
    return cosine_topk(corpus, queries, "embedding", "vec_id", k=5).orderBy("query_id", "rank")


Q_COSINE_TOPK_SQL = f"""
WITH {NORM_CTE},
q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n WHERE vec_id < 20),
c AS (SELECT vec_id AS neighbor_id, e AS ce, nrm AS cn FROM n WHERE vec_id >= 20),
sims AS (
  SELECT query_id, neighbor_id,
         list_inner_product(qe, ce) / (qn * cn) AS sim
  FROM q CROSS JOIN c)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS INT) AS rank,
       sim
FROM sims
QUALIFY rank <= 5
"""

# -------------------------------------------------- embedding near-dup


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine ≥ τ pairs within a BLOCK (same label): the blocked
    exact-dedup pattern — a hash equi-join on the blocking key, so the
    pair space is Σ|block|², never corpus². The former all-pairs
    (corpus²) form is deliberately NOT registered (VERDICT r5 #7); the
    unblocked production path is q_embedding_neardup_lsh (sign-bit LSH
    banding), whose candidate generation needs no blocking key."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = with_norm(emb, "embedding", "vec_id").join(
        load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id"), "label"
        ),
        "id",
    )
    a = n.withColumnsRenamed({"id": "id1", "e": "e1", "nrm": "n1"})
    b = n.select(
        F.col("id").alias("id2"),
        F.col("e").alias("e2"),
        F.col("nrm").alias("n2"),
        "label",
    )
    from kcore_spark.operators.similarity import cosine

    return (
        a.join(b, "label")
        .where(F.col("id1") < F.col("id2"))
        .select(
            "label",
            "id1",
            "id2",
            cosine(F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= 0.3)
        .orderBy("id1", "id2")
    )


Q_EMB_NEARDUP_SQL = f"""
WITH {NORM_CTE},
nl AS (SELECT n.vec_id, n.e, n.nrm, emb.label
       FROM n JOIN embeddings emb ON emb.vec_id = n.vec_id)
SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
       list_inner_product(a.e, b.e) / (a.nrm * b.nrm) AS cos_sim
FROM nl a JOIN nl b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_inner_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.3
"""

# -------------------------------------------------- IVF ANN (scale path)
# Deterministic "training": centroids = first 16 vectors. Probe-1.


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 16)
    queries = emb.where((F.col("vec_id") >= 16) & (F.col("vec_id") < 36))
    corpus = emb.where(F.col("vec_id") >= 36)
    return ivf_topk(corpus, queries, centroids, "embedding", "vec_id", k=3).orderBy(
        "query_id", "rank"
    )


Q_ANN_IVF_SQL = f"""
WITH {NORM_CTE},
cent AS (SELECT vec_id AS centroid_id, e AS ce, nrm AS cn FROM n WHERE vec_id < 16),
assign_c AS (
  SELECT vec_id AS neighbor_id, e, nrm, centroid_id
  FROM (SELECT v.vec_id, v.e, v.nrm, cent.centroid_id,
               list_inner_product(v.e, cent.ce) / (v.nrm * cent.cn) AS csim
        FROM n v CROSS JOIN cent
        WHERE v.vec_id >= 36)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) = 1),
assign_q AS (
  SELECT vec_id AS query_id, e, nrm, centroid_id
  FROM (SELECT v.vec_id, v.e, v.nrm, cent.centroid_id,
               list_inner_product(v.e, cent.ce) / (v.nrm * cent.cn) AS csim
        FROM n v CROSS JOIN cent
        WHERE v.vec_id >= 16 AND v.vec_id < 36)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) = 1),
sims AS (
  SELECT q.query_id, a.centroid_id, a.neighbor_id,
         list_inner_product(q.e, a.e) / (q.nrm * a.nrm) AS sim
  FROM assign_q q JOIN assign_c a ON q.centroid_id = a.centroid_id)
SELECT query_id, centroid_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank,
       sim
FROM sims
QUALIFY rank <= 3
"""


# -------------------------------------------------- label centroids
# Embedding pooling (mean vector per label) — the training-data op
# behind class prototypes / nearest-class-mean. Element values are
# rounded to 12 dp decimals before the exact sum so the per-group
# accumulation order (nondeterministic at scale) can't change bits.


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1))).alias(
                "centroid_val"
            ),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .orderBy("label", "pos")
    )


Q_LABEL_CENTROIDS_SQL = """
SELECT label, pos - 1 AS pos,
       CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS centroid_val,
       COUNT(*) AS n_vecs
FROM (SELECT label, UNNEST(embedding::DOUBLE[]) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings)
GROUP BY label, pos
"""




# ------------------------------------- embedding near-dup, LSH path


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production near-dup path: sign-bit LSH banding for candidate
    generation + exact cosine verify (operators/similarity.py
    docstring has the scale argument). The blocked exact variant
    (q_embedding_neardup) pins exact cosine semantics within a
    blocking key; this one is the plan shape a 100 TB corpus runs
    when no natural blocking key exists."""
    emb = load_table(spark, sf_dir, "embeddings")
    return signbit_lsh_pairs(emb, "vec_id", "embedding", min_cos=0.45).orderBy(
        "id1", "id2"
    )


def _sig_sql(n_bands=4, bits_per_band=4, stride=4):
    bands = []
    for band in range(n_bands):
        bits = []
        for j in range(bits_per_band):
            d = (band * bits_per_band + j) * stride + 1
            bits.append(f"{2**j} * (e[{d}] >= 0)::INT")
        bands.append(" + ".join(bits) + f" AS b{band}")
    return ",\n         ".join(bands)


Q_EMB_NEARDUP_LSH_SQL = f"""
WITH {NORM_CTE},
sig AS (
  SELECT vec_id, e, nrm,
         {_sig_sql()}
  FROM n),
cand AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM sig a JOIN sig b
    ON a.vec_id < b.vec_id
   AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
SELECT c.id1, c.id2,
       list_inner_product(sa.e, sb.e) / (sa.nrm * sb.nrm) AS cos_sim
FROM cand c
JOIN sig sa ON sa.vec_id = c.id1
JOIN sig sb ON sb.vec_id = c.id2
WHERE list_inner_product(sa.e, sb.e) / (sa.nrm * sb.nrm) >= 0.45
ORDER BY id1, id2
"""


QUERIES = {
    "q_embedding_neardup_lsh": QuerySpec(
        q_embedding_neardup_lsh,
        Q_EMB_NEARDUP_LSH_SQL,
        "sign-bit LSH near-dup (banded candidates + exact verify)",
    ),
    "q_label_centroids": QuerySpec(q_label_centroids, Q_LABEL_CENTROIDS_SQL, "embedding mean-pooling"),
    "q_cosine_topk": QuerySpec(q_cosine_topk, Q_COSINE_TOPK_SQL, "exact cosine top-k"),
    "q_embedding_neardup": QuerySpec(q_embedding_neardup, Q_EMB_NEARDUP_SQL, "cosine near-dup pairs"),
    "q_ann_ivf_topk": QuerySpec(q_ann_ivf_topk, Q_ANN_IVF_SQL, "IVF-Flat ANN (probe-1)"),
}


# -------------------------------------------------- product quantization


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode the corpus against an oracle-pinned codebook (the
    first 8 vectors — same pinning stance as the IVF query's fixed
    centroids): per label, how many vectors, the total distortion,
    and how many distinct code words got used (codebook utilization,
    the quality signal a real PQ index monitors)."""
    from kcore_spark.operators.similarity import pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    codebook = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("code"), F.col("embedding").alias("vector")
    )
    corpus = emb.where(F.col("vec_id") >= 8)
    enc = pq_encode(corpus, codebook, "embedding", "vec_id", m=8)
    labeled = enc.join(
        emb.select(F.col("vec_id").alias("id"), "label"), "id"
    )
    return (
        labeled.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("distortion").cast("decimal(30,9)")).cast("double"), 6
            ).alias("sum_distortion"),
            F.count_distinct("pq_codes").alias("n_distinct_codes"),
        )
        .orderBy("label")
    )


Q_PQ_ENCODE_SQL = """
WITH n AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
cb AS (SELECT vec_id AS code, e AS ce FROM n WHERE vec_id < 8),
corpus AS (SELECT vec_id AS id, label, e FROM n WHERE vec_id >= 8),
dists AS (
  SELECT id, label, code, j,
         list_reduce(list_prepend(0.0,
             list_transform(list_zip(e[j*8+1 : j*8+8], ce[j*8+1 : j*8+8]),
                            p -> (p[1] - p[2]) * (p[1] - p[2]))),
             (a, b) -> a + b) AS dist
  FROM corpus CROSS JOIN cb CROSS JOIN (SELECT unnest(range(8)) AS j)),
best AS (
  SELECT id, label, j, code, dist
  FROM dists
  QUALIFY ROW_NUMBER() OVER (PARTITION BY id, j ORDER BY dist, code) = 1),
encoded AS (
  SELECT id, label,
         string_agg(code, '|' ORDER BY j) AS pq_codes,
         ROUND(CAST(SUM(CAST(ROUND(dist, 12) AS DECIMAL(30,12))) AS DOUBLE), 9)
           AS distortion
  FROM best
  GROUP BY id, label)
SELECT label, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(distortion AS DECIMAL(30,9))) AS DOUBLE), 6)
         AS sum_distortion,
       COUNT(DISTINCT pq_codes) AS n_distinct_codes
FROM encoded
GROUP BY label
ORDER BY label
"""


QUERIES["q_pq_encode"] = QuerySpec(
    q_pq_encode, Q_PQ_ENCODE_SQL, "product-quantization encode + distortion"
)


# -------------------------------------------------- batch model inference


def q_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch inference with a linear scorer over embeddings — the
    quality-classifier pass of a curation pipeline (fastText-style
    linear heads are the standard web-scale quality filter). The
    model is an oracle-pinned weight vector (deterministic integer
    arithmetic → small doubles); score = sigmoid(w·x + b), bucketed
    into a calibration histogram plus per-bucket label mix.

    Plan: pure map-side fold per row (the dot product rides the scan,
    no shuffle until the 10-row histogram) — exactly how a 100 TB
    scoring pass should look: embarrassingly parallel, output tiny."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = 64
    # pinned weights: w_i = ((7i+3) mod 19 − 9) / 30 — integer-derived,
    # identical on both engines
    w = F.array(*[F.lit(((7 * i + 3) % 19 - 9) / 30.0) for i in range(dims)])
    x = as_double(F.col("embedding"))
    logit = F.aggregate(
        F.zip_with(x, w, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    ) + F.lit(0.1)
    score = 1.0 / (1.0 + F.exp(-logit))
    bucket = F.least(F.floor(score * 10).cast("long"), F.lit(9))
    return (
        emb.select("label", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("label").alias("n_labels"),
            F.min("label").alias("min_label"),
        )
        .orderBy("bucket")
    )


_W_SQL = ", ".join(str(((7 * i + 3) % 19 - 9) / 30.0) for i in range(64))

Q_BATCH_INFERENCE_SQL = f"""
WITH scored AS (
  SELECT label,
         1.0 / (1.0 + exp(-(
           list_reduce(list_prepend(0.0,
             list_transform(list_zip(embedding::DOUBLE[], [{_W_SQL}]),
                            p -> p[1] * p[2])),
             (a, b) -> a + b) + 0.1))) AS score
  FROM embeddings)
SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bucket,
       COUNT(*) AS n,
       COUNT(DISTINCT label) AS n_labels,
       MIN(label) AS min_label
FROM scored
GROUP BY bucket
ORDER BY bucket
"""


QUERIES["q_batch_inference"] = QuerySpec(
    q_batch_inference, Q_BATCH_INFERENCE_SQL, "linear-head batch inference + calibration"
)


# -------------------------------------------------- IVF-PQ-ADC retrieval


def q_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN pipeline end-to-end: IVF probe (query →
    nearest centroid → candidates = that centroid's bucket only), PQ
    asymmetric distance computation (candidates' subvectors quantized
    against a codebook, distance measured query-subvector → code — the
    ADC trick that never decompresses the corpus), then exact cosine
    rerank of the ADC top-8 down to top-3.

    Scale shape: the corpus is touched once to assign buckets + encode
    (both map-side vs broadcast centroids/codebook); each query then
    probes ~1/K of the corpus with m·k-sized lookup arithmetic and
    reranks a constant-sized shortlist. Centroids (vec_id<16) and
    codebook (16..24) are oracle-pinned like q_ann_ivf_topk's."""
    from kcore_spark.operators.similarity import as_double, cosine, with_norm

    # r13: spread the single-row-group scan so the per-row HOF folds
    # (assignment cosines, PQ subspace distances) run on every core
    # instead of one
    from kcore_spark.operators.relational import spread

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    cents = emb.where(F.col("vec_id") < 16)
    codebook = emb.where((F.col("vec_id") >= 16) & (F.col("vec_id") < 24)).select(
        (F.col("vec_id") - 16).alias("code"), F.col("embedding").alias("vector")
    )
    queries = emb.where((F.col("vec_id") >= 24) & (F.col("vec_id") < 32))
    corpus = emb.where(F.col("vec_id") >= 32)

    # 1. bucket assignment (corpus AND queries → argmax-cosine centroid)
    # r13: the 16 centroids fold into ONE broadcast row and the argmax
    # is a per-row array_max over (csim, −centroid_id) structs — the
    # same map-side shape as q_kmeans_lloyd's _assign. The old k-row
    # cross + row_number window shuffled the whole corpus of embedding
    # arrays ×16 just to undo the fan-out (guide §2.4). The csim
    # expression inside the transform is the identical sequential-fold
    # cosine, so the argmax (tie-break: lower centroid id) is
    # bit-identical to the old window pick.
    cn = with_norm(cents, "embedding", "vec_id").withColumnsRenamed(
        {"id": "centroid_id", "e": "ce", "nrm": "cn"}
    )
    cent_row = cn.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("centroid_id").alias("cid"),
                    F.col("ce").alias("ce"),
                    F.col("cn").alias("cn"),
                )
            )
        ).alias("cs")
    )

    def assign(df, id_alias):
        n = with_norm(df, "embedding", "vec_id").withColumnsRenamed({"id": id_alias})
        m = F.array_max(
            F.transform(
                F.col("cs"),
                lambda s: F.struct(
                    cosine(F.col("e"), s["ce"], F.col("nrm"), s["cn"]).alias("csim"),
                    (-s["cid"]).alias("negcid"),
                ),
            )
        )
        return (
            n.crossJoin(F.broadcast(cent_row))
            .withColumn("m", m)
            .select(
                id_alias, "e", "nrm", (-F.col("m.negcid")).alias("centroid_id")
            )
        )

    from pyspark.sql import Window

    corpus_a = assign(corpus, "neighbor_id")
    queries_a = assign(queries, "query_id")

    # 2. PQ-encode candidates: per subspace j, nearest codebook code —
    # same map-side fold: 8 codes in one broadcast row, per-(point, j)
    # array_min over (dist, code) structs replaces the 8-way cross +
    # row_number window over the whole corpus. dist is the identical
    # slice/zip/fold expression; array_min tie-breaks on lower code,
    # the old window's ordering.
    cb = codebook.select("code", as_double(F.col("vector")).alias("ce2"))
    cb_row = cb.agg(
        F.array_sort(F.collect_list(F.struct("code", "ce2"))).alias("cbs")
    )

    def d_sub_of(e_col, ce2_col, j_col):
        return F.aggregate(
            F.zip_with(
                F.slice(e_col, j_col * 8 + 1, 8),
                F.slice(ce2_col, j_col * 8 + 1, 8),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    best = F.array_min(
        F.transform(
            F.col("cbs"),
            lambda s: F.struct(
                d_sub_of(F.col("e"), s["ce2"], F.col("j")).alias("dist"),
                s["code"].alias("code"),
            ),
        )
    )
    codes = (
        corpus_a.crossJoin(F.broadcast(cb_row))
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(7))))
        .select("neighbor_id", "centroid_id", "j", best["code"].alias("code"))
    )

    # 3. ADC: query joins its bucket's candidates, distance = sum over
    #    subspaces of ||q_sub − code_sub||² (code vector from codebook)
    qd = F.expr(
        "aggregate(zip_with(slice(qe, j * 8 + 1, 8), slice(ce2, j * 8 + 1, 8),"
        " (a, b) -> (a - b) * (a - b)), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    adc_terms = (
        queries_a.withColumnsRenamed({"e": "qe", "nrm": "qn"})
        .join(codes, "centroid_id")
        .join(F.broadcast(cb), "code")
        .withColumn("qdist", F.round(qd, 12).cast("decimal(30,12)"))
    )
    adc = adc_terms.groupBy("query_id", "neighbor_id", "qn").agg(
        F.round(F.sum("qdist").cast("double"), 9).alias("adc_dist")
    )
    wshort = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id")
    )
    shortlist = (
        adc.withColumn("__rn", F.row_number().over(wshort))
        .where(F.col("__rn") <= 8)
        .drop("__rn")
    )

    # 4. exact rerank of the shortlist
    exact = shortlist.join(
        corpus_a.select("neighbor_id", F.col("e").alias("ne"), F.col("nrm").alias("nn")),
        "neighbor_id",
    ).join(
        queries_a.select("query_id", F.col("e").alias("qe2")), "query_id"
    )
    # recompute the query norm from qe2 to keep the fold sequential
    sim = F.round(
        F.aggregate(
            F.zip_with(F.col("qe2"), F.col("ne"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / (F.col("qn") * F.col("nn")),
        6,
    )
    wfin = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        exact.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(wfin).cast("int"))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank", "sim", "adc_dist")
        .orderBy("query_id", "rank")
    )


Q_IVF_PQ_SQL = f"""
WITH {NORM_CTE},
cent AS (SELECT vec_id AS centroid_id, e AS ce, nrm AS cn FROM n WHERE vec_id < 16),
cb AS (SELECT vec_id - 16 AS code, e AS ce2 FROM n WHERE vec_id >= 16 AND vec_id < 24),
corpus_a AS (
  SELECT vec_id AS neighbor_id, e, nrm, centroid_id
  FROM (SELECT v.vec_id, v.e, v.nrm, cent.centroid_id,
               list_inner_product(v.e, cent.ce) / (v.nrm * cent.cn) AS csim
        FROM n v CROSS JOIN cent WHERE v.vec_id >= 32)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) = 1),
queries_a AS (
  SELECT vec_id AS query_id, e AS qe, nrm AS qn, centroid_id
  FROM (SELECT v.vec_id, v.e, v.nrm, cent.centroid_id,
               list_inner_product(v.e, cent.ce) / (v.nrm * cent.cn) AS csim
        FROM n v CROSS JOIN cent WHERE v.vec_id >= 24 AND v.vec_id < 32)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) = 1),
codes AS (
  SELECT neighbor_id, centroid_id, j, code
  FROM (SELECT c.neighbor_id, c.centroid_id, b.code, t.j,
               list_reduce(list_prepend(0.0,
                 list_transform(list_zip(c.e[j*8+1 : j*8+8], b.ce2[j*8+1 : j*8+8]),
                                p -> (p[1] - p[2]) * (p[1] - p[2]))),
                 (a, bb) -> a + bb) AS dist
        FROM corpus_a c CROSS JOIN cb b
        CROSS JOIN (SELECT unnest(range(8)) AS j) t)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY neighbor_id, j ORDER BY dist, code) = 1),
adc AS (
  SELECT q.query_id, k.neighbor_id, q.qn,
         ROUND(CAST(SUM(CAST(ROUND(
           list_reduce(list_prepend(0.0,
             list_transform(list_zip(q.qe[k.j*8+1 : k.j*8+8], b.ce2[k.j*8+1 : k.j*8+8]),
                            p -> (p[1] - p[2]) * (p[1] - p[2]))),
             (a, bb) -> a + bb), 12) AS DECIMAL(30,12))) AS DOUBLE), 9) AS adc_dist
  FROM queries_a q JOIN codes k USING (centroid_id) JOIN cb b USING (code)
  GROUP BY q.query_id, k.neighbor_id, q.qn),
shortlist AS (
  SELECT query_id, neighbor_id, qn, adc_dist
  FROM adc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY adc_dist, neighbor_id) <= 8),
exact AS (
  SELECT s.query_id, s.neighbor_id, s.adc_dist,
         ROUND(list_inner_product(q.qe, c.e) / (s.qn * c.nrm), 6) AS sim
  FROM shortlist s
  JOIN corpus_a c USING (neighbor_id)
  JOIN queries_a q USING (query_id))
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS INT) AS rank,
       sim, adc_dist
FROM exact
QUALIFY rank <= 3
ORDER BY query_id, rank
"""


QUERIES["q_ivf_pq_search"] = QuerySpec(
    q_ivf_pq_search, Q_IVF_PQ_SQL, "IVF-PQ-ADC retrieval + exact rerank"
)


# -------------------------------------------------- semantic dedup clusters


def q_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup clusters: cosine ≥ τ pairs from
    the sign-bit LSH production path → connected components → cluster
    membership counts. The modern corpus-dedup step that catches
    paraphrases exact/n-gram dedup can't; candidate generation is the
    banded LSH equi-join (never all-pairs), verification is exact
    cosine, and transitivity comes from the same HashToMin components
    machinery the text-dedup clusters use. Oracle: the SAME banded
    candidate generation + exact verify replicated in SQL, then the
    recursive closure — so the probabilistic-recall banding is pinned
    bit-for-bit, not assumed complete (its recall vs exact all-pairs
    is what q_embedding_neardup_lsh vs q_embedding_neardup shows)."""
    from kcore_spark.operators.graph import connected_components

    from kcore_spark.operators.relational import spread

    # spread: the per-row sign-bit signature fold otherwise rides the
    # serial single-row-group scan task
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    pairs = signbit_lsh_pairs(emb, "vec_id", "embedding", min_cos=0.45)
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    cc = connected_components(edges)
    return (
        cc.groupBy(F.col("component").alias("canonical_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("canonical_id")
    )


Q_SEMANTIC_CLUSTERS_SQL = f"""
WITH RECURSIVE {NORM_CTE},
sig AS (
  SELECT vec_id, e, nrm,
         {_sig_sql()}
  FROM n),
pairs AS (
  SELECT c.id1, c.id2
  FROM (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        FROM sig a JOIN sig b
          ON a.vec_id < b.vec_id
         AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)) c
  JOIN sig sa ON sa.vec_id = c.id1
  JOIN sig sb ON sb.vec_id = c.id2
  WHERE list_inner_product(sa.e, sb.e) / (sa.nrm * sb.nrm) >= 0.45),
edges AS (SELECT id1 AS a, id2 AS b FROM pairs
          UNION SELECT id2, id1 FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
assign AS (
  SELECT a AS id, LEAST(a, MIN(b)) AS canonical_id
  FROM reach
  GROUP BY a)
SELECT canonical_id, COUNT(*) AS n_members
FROM assign
GROUP BY canonical_id
ORDER BY canonical_id
"""


QUERIES["q_semantic_clusters"] = QuerySpec(
    q_semantic_clusters, Q_SEMANTIC_CLUSTERS_SQL, "semantic dedup clusters (LSH + components)"
)


# ------------------------------------------------ ANN recall@k eval
# The quality loop for the ANN path: recall@10 of the probe-1 IVF
# shortlist against the exact cosine top-10, per query and macro-
# averaged — the number an embedding-serving team watches when tuning
# nprobe. Exact side: 20 query rows broadcast into one corpus scan
# (the q_cosine_topk shape); approx side: the same ivf_topk the
# serving query uses. Join on (query, neighbor), count hits. recall
# = hits/10 is an exact rational; the macro row is Σhits / (Q*10).


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kcore_spark.operators.relational import spread
    from kcore_spark.operators.similarity import cosine, ivf_topk, with_norm

    # spread: the 20-query exact cosine scan and the IVF assignment
    # folds otherwise ride the serial single-row-group scan task
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    centroids = emb.where(F.col("vec_id") < 16)
    queries = emb.where((F.col("vec_id") >= 16) & (F.col("vec_id") < 36))
    corpus = emb.where(F.col("vec_id") >= 36)

    approx = ivf_topk(corpus, queries, centroids, "embedding", "vec_id", k=10).select(
        "query_id", "neighbor_id"
    )
    qn = with_norm(queries, "embedding", "vec_id").select(
        F.col("id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    cn = with_norm(corpus, "embedding", "vec_id").select(
        F.col("id").alias("neighbor_id"), "e", "nrm"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    exact = (
        cn.crossJoin(F.broadcast(qn))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id")
    )
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per_q = (
        qn.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
        )
        .withColumn("recall", F.col("hits") / 10.0)
    )
    macro = per_q.agg(
        F.lit(-1).cast("long").alias("query_id"),
        F.sum("hits").alias("hits"),
        (F.sum("hits") / (F.count(F.lit(1)) * 10.0)).alias("recall"),
    )
    return per_q.unionByName(macro).orderBy("query_id")


Q_ANN_RECALL_SQL = f"""
WITH {NORM_CTE},
cent AS (SELECT vec_id AS centroid_id, e AS ce, nrm AS cn FROM n WHERE vec_id < 16),
assign_c AS (
  SELECT vec_id AS neighbor_id, e, nrm, centroid_id
  FROM (SELECT v.vec_id, v.e, v.nrm, cent.centroid_id,
               list_inner_product(v.e, cent.ce) / (v.nrm * cent.cn) AS csim
        FROM n v CROSS JOIN cent
        WHERE v.vec_id >= 36)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) = 1),
assign_q AS (
  SELECT vec_id AS query_id, e, nrm, centroid_id
  FROM (SELECT v.vec_id, v.e, v.nrm, cent.centroid_id,
               list_inner_product(v.e, cent.ce) / (v.nrm * cent.cn) AS csim
        FROM n v CROSS JOIN cent
        WHERE v.vec_id >= 16 AND v.vec_id < 36)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) = 1),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, a.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY list_inner_product(q.e, a.e) / (q.nrm * a.nrm) DESC,
                                       a.neighbor_id) AS rank
    FROM assign_q q JOIN assign_c a ON q.centroid_id = a.centroid_id)
  WHERE rank <= 10),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY list_inner_product(q.e, c.e) / (q.nrm * c.nrm) DESC,
                                       c.vec_id) AS rank
    FROM n q CROSS JOIN n c
    WHERE q.vec_id >= 16 AND q.vec_id < 36 AND c.vec_id >= 36)
  WHERE rank <= 10),
hits AS (
  SELECT e.query_id, COUNT(*) AS hits
  FROM exact e JOIN approx a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id),
per_q AS (
  SELECT q.vec_id AS query_id, COALESCE(h.hits, 0) AS hits,
         COALESCE(h.hits, 0) / 10.0 AS recall
  FROM (SELECT vec_id FROM n WHERE vec_id >= 16 AND vec_id < 36) q
  LEFT JOIN hits h ON h.query_id = q.vec_id)
SELECT query_id, CAST(hits AS BIGINT) AS hits, recall FROM per_q
UNION ALL
SELECT -1 AS query_id, CAST(SUM(hits) AS BIGINT) AS hits,
       SUM(hits) / (COUNT(*) * 10.0) AS recall
FROM per_q
ORDER BY query_id
"""

QUERIES["q_ann_recall"] = QuerySpec(
    q_ann_recall,
    Q_ANN_RECALL_SQL,
    "ANN quality loop: recall@10 of the probe-1 IVF shortlist vs exact "
    "cosine top-10, per query + macro average",
)
