"""Similarity search: exact top-k / radius, and IVF ANN for the scale path.

Reference surface: ANN scan claims (`ORDER BY emb <=> $v LIMIT k` →
IRESEARCH_ANN_SCAN, radius → ANN_RANGE_SCAN;
server/connector/optimizer/iresearch_plan.cpp:927-1014) over an `ivf(...)`
opclass index (server/catalog/index.h:39-40, faiss-backed posting lists).

Spark-first design:
  * exact top-k: distance expression (JVM-side, functions/vector.py) +
    ORDER BY/LIMIT — Catalyst executes it as TakeOrderedAndProject, i.e.
    per-partition top-k then merge: no global sort, no shuffle of the corpus.
  * radius: plain filter on the distance expression (predicate evaluated
    in-scan, full pushdown).
  * IVF: KMeans centroids (tiny, broadcast); vectors stored with a
    centroid_id column (partition/bucket by centroid_id at scale). Query =
    rank nprobe nearest centroids driver-side (centroids are small by
    construction), scan only those partitions, exact re-rank. This is the
    same probe shape as the reference's IVF posting lists — centroid_id
    plays the posting-list key.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from serenedb_spark.functions import vector as V


def knn_exact(
    df: DataFrame,
    vec_col: str,
    query_vec,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Brute-force top-k: TakeOrderedAndProject over a distance expression."""
    dist = V.DISTANCES[metric](F.col(vec_col), V.lit_vector(query_vec))
    if round_to is not None:
        dist = F.round(dist, round_to)
    return (
        df.select(id_col, dist.alias("distance"))
        .orderBy(F.col("distance"), F.col(id_col))
        .limit(k)
    )


def radius_search(
    df: DataFrame,
    vec_col: str,
    query_vec,
    radius: float,
    metric: str = "cosine",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """`WHERE dist < r` — the ANN range scan, exact."""
    dist = V.DISTANCES[metric](F.col(vec_col), V.lit_vector(query_vec))
    if round_to is not None:
        dist = F.round(dist, round_to)
    return df.select(id_col, dist.alias("distance")).where(
        F.col("distance") < radius
    )


# ---- IVF ------------------------------------------------------------------

class IVFIndex:
    """IVF 'index': assigned vectors + a small centroid table.

    At 100 TB the `assigned` table is written partitioned by centroid_id so
    a query touches only nprobe partitions (partition pruning on the IN
    filter); centroids stay a driver-side list (nlist ≤ a few thousand).
    """

    def __init__(self, assigned: DataFrame, centroids: list[list[float]],
                 vec_col: str, id_col: str, metric: str):
        self.assigned = assigned  # (id_col, vec_col, centroid_id)
        self.centroids = centroids
        self.vec_col = vec_col
        self.id_col = id_col
        self.metric = metric


def ivf_build(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    metric: str = "cosine",
    seed: int = 42,
    max_iter: int = 20,
    train_sample_factor: int | None = None,
) -> IVFIndex:
    """KMeans (MLlib, fixed seed) → centroid assignment column.

    ``train_sample_factor`` (the reference's SET sdb_ivf_sample_factor):
    fit the centroids on a deterministic sample of ~nlist × factor rows
    instead of the full corpus — at 100 TB the KMeans fit must sample
    (assignment still covers every row). None keeps full-corpus training
    (the oracle-gated small-SF behavior)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = df.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("__features"),
    )
    train = feat
    if train_sample_factor is not None:
        target = nlist * train_sample_factor
        n = df.count()
        if n > target:
            train = feat.sample(fraction=min(1.0, target / n * 1.2),
                                seed=seed).limit(target)
    km = KMeans(k=nlist, seed=seed, maxIter=max_iter, featuresCol="__features")
    model = km.fit(train)
    assigned = model.transform(feat).select(
        id_col, vec_col, F.col(model.getPredictionCol()).alias("centroid_id")
    )
    centroids = [c.tolist() for c in model.clusterCenters()]
    return IVFIndex(assigned, centroids, vec_col, id_col, metric)


def ivf_search(
    idx: IVFIndex,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    round_to: int | None = 6,
) -> DataFrame:
    """nprobe nearest centroids (driver-side argsort of a tiny list) →
    partition-pruned scan → exact re-rank top-k."""
    import math

    def _dist(c):
        if idx.metric == "cosine":
            dot = sum(a * b for a, b in zip(c, query_vec))
            na = math.sqrt(sum(a * a for a in c))
            nb = math.sqrt(sum(b * b for b in query_vec))
            return 1.0 - dot / (na * nb) if na and nb else 1.0
        if idx.metric in ("l2", "l2_sqr"):
            return sum((a - b) ** 2 for a, b in zip(c, query_vec))
        if idx.metric == "ip":
            return -sum(a * b for a, b in zip(c, query_vec))
        raise ValueError(idx.metric)

    order = sorted(range(len(idx.centroids)), key=lambda i: (_dist(idx.centroids[i]), i))
    probes = order[:nprobe]

    cand = idx.assigned.where(F.col("centroid_id").isin(probes))
    return knn_exact(
        cand, idx.vec_col, query_vec, k=k, metric=idx.metric,
        id_col=idx.id_col, round_to=round_to,
    )


def ivf_save(idx: IVFIndex, path: str) -> None:
    """Persist the IVF layout partitioned by centroid_id — a probe query
    reads exactly nprobe of nlist partition directories (partition pruning,
    the vector twin of the term-bucket postings layout). Centroids go to
    the manifest (tiny, driver-side)."""
    import json
    import os

    (
        idx.assigned.repartition("centroid_id")
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(f"{path}/assigned")
    )
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/manifest.json", "w") as f:
        json.dump({
            "centroids": idx.centroids,
            "vec_col": idx.vec_col,
            "id_col": idx.id_col,
            "metric": idx.metric,
        }, f)


def ivf_load(spark, path: str) -> IVFIndex:
    import json

    with open(f"{path}/manifest.json") as f:
        m = json.load(f)
    return IVFIndex(
        spark.read.parquet(f"{path}/assigned"),
        m["centroids"], m["vec_col"], m["id_col"], m["metric"],
    )


def ivf_sq8_build(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    metric: str = "cosine",
    seed: int = 42,
) -> tuple["IVFIndex", "SQ8"]:
    """The reference's `ivf(quant=sq8)` opclass composed: KMeans centroid
    assignment + per-dim SQ8 codes stored TOGETHER, so a probe reads
    nprobe partitions of uint8 codes (dim bytes/row) and never the raw
    vectors. Returns (ivf index whose `assigned` carries a codes column,
    the SQ8 train stats)."""
    sq = SQ8.train(df, vec_col)
    ivf = ivf_build(df, vec_col, id_col, nlist=nlist, metric=metric, seed=seed)
    assigned = ivf.assigned.withColumn("codes", sq.encode_col(F.col(vec_col)))
    ivf.assigned = assigned
    return ivf, sq


def ivf_sq8_search(
    idx: "IVFIndex",
    sq: "SQ8",
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    rerank_factor: int | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Probe nprobe centroid partitions, rank by distance over DECODED SQ8
    codes; with rerank_factor, the quantized pass selects k·factor
    candidates and exact distances on raw vectors produce the final top-k
    (`SET sdb_rerank_factor`)."""
    import math

    def _dist(c):
        if idx.metric == "cosine":
            dot = sum(a * b for a, b in zip(c, query_vec))
            na = math.sqrt(sum(a * a for a in c))
            nb = math.sqrt(sum(b * b for b in query_vec))
            return 1.0 - dot / (na * nb) if na and nb else 1.0
        if idx.metric in ("l2", "l2_sqr"):
            return sum((a - b) ** 2 for a, b in zip(c, query_vec))
        if idx.metric == "ip":
            return -sum(a * b for a, b in zip(c, query_vec))
        raise ValueError(idx.metric)

    order = sorted(range(len(idx.centroids)),
                   key=lambda i: (_dist(idx.centroids[i]), i))
    cand = idx.assigned.where(F.col("centroid_id").isin(order[:nprobe]))

    decoded = sq.decode_codes_col(F.col("codes"))
    qdist = V.DISTANCES[idx.metric](decoded, V.lit_vector(query_vec))
    if rerank_factor is None:
        d = F.round(qdist, round_to) if round_to is not None else qdist
        return (
            cand.select(idx.id_col, d.alias("distance"))
            .orderBy(F.col("distance"), F.col(idx.id_col))
            .limit(k)
        )
    short = (
        cand.select(idx.id_col, qdist.alias("qd"))
        .orderBy(F.col("qd"), F.col(idx.id_col))
        .limit(k * rerank_factor)
        .select(idx.id_col)
    )
    return knn_exact(
        idx.assigned.join(short, idx.id_col, "left_semi"),
        idx.vec_col, query_vec, k=k, metric=idx.metric,
        id_col=idx.id_col, round_to=round_to,
    )


# ---- SQ8 scalar quantization ---------------------------------------------

class SQ8:
    """Per-dimension min/max scalar quantization to uint8 codes — the
    reference's `quant=sq8` IVF option (server/catalog/index.cpp:300-460,
    faiss SQ8). Train stats are tiny (2×dim floats) and live driver-side;
    encode/decode are pure column arithmetic (portable to the oracle).

    code_i  = floor(255 * (v_i - min_i) / (max_i - min_i) + 0.5), clamped
    v̂_i     = min_i + code_i * (max_i - min_i) / 255
    """

    def __init__(self, mins: list[float], maxs: list[float]):
        self.mins = mins
        self.maxs = maxs

    @classmethod
    def train(cls, df: DataFrame, vec_col: str = "embedding") -> "SQ8":
        # posexplode → per-dimension min/max: one small aggregation plan
        # (a per-dim expression list would be 2×dim aggregates and blow up
        # codegen compile time)
        rows = (
            df.select(F.posexplode(F.col(vec_col)).alias("i", "v"))
            .groupBy("i")
            .agg(F.min(F.col("v").cast("double")).alias("mn"),
                 F.max(F.col("v").cast("double")).alias("mx"))
            .orderBy("i")
            .collect()
        )
        return cls([r.mn for r in rows], [r.mx for r in rows])

    def _scale(self, i: int) -> float:
        span = self.maxs[i] - self.mins[i]
        return span if span != 0 else 1.0

    def encode_col(self, vec: Column) -> Column:
        codes = [
            F.greatest(F.least(F.floor(
                F.lit(255.0) * (F.element_at(vec, i + 1).cast("double")
                                - F.lit(self.mins[i])) / F.lit(self._scale(i))
                + F.lit(0.5)
            ), F.lit(255.0)), F.lit(0.0)).cast("int")
            for i in range(len(self.mins))
        ]
        return F.array(*codes)

    def decode_col(self, codes: Column) -> Column:
        vals = [
            (F.lit(self.mins[i])
             + F.element_at(codes, i + 1).cast("double")
             * F.lit(self._scale(i)) / F.lit(255.0))
            for i in range(len(self.mins))
        ]
        return F.array(*vals)

    def decode_codes_col(self, codes: Column) -> Column:
        """Reconstruct v̂ from stored codes with two zip_with HOFs — the
        query-time path over a persisted codes column (constant-size
        expression tree regardless of dim)."""
        mins = F.array(*[F.lit(float(m)) for m in self.mins])
        scales = F.array(*[F.lit(float(self._scale(i)))
                           for i in range(len(self.mins))])
        scaled = F.zip_with(
            codes, scales, lambda c, sc: c.cast("double") * sc / F.lit(255.0)
        )
        return F.zip_with(scaled, mins, lambda s, mn: mn + s)

    def requantize_col(self, vec: Column) -> Column:
        """encode+decode fused as three zip_with HOFs — a constant-size
        expression tree regardless of dim (the per-element form compiles
        2×dim codegen branches and dominates query time)."""
        mins = F.array(*[F.lit(float(m)) for m in self.mins])
        scales = F.array(*[F.lit(float(self._scale(i)))
                           for i in range(len(self.mins))])
        shifted = F.zip_with(vec, mins, lambda v, mn: v.cast("double") - mn)
        coded_scaled = F.zip_with(
            shifted, scales,
            lambda d, sc: F.greatest(
                F.least(F.floor(F.lit(255.0) * d / sc + F.lit(0.5)),
                        F.lit(255.0)),
                F.lit(0.0),
            ) * sc / F.lit(255.0),
        )
        return F.zip_with(coded_scaled, mins, lambda c, mn: mn + c)

    def duckdb_decode(self, vec_sql: str) -> str:
        """Encode+decode in one SQL expression (mirrors encode_col →
        decode_col symbol-for-symbol)."""
        parts = []
        for i in range(len(self.mins)):
            mn, sc = repr(self.mins[i]), repr(self._scale(i))
            code = (
                f"greatest(least(floor(255.0 * ({vec_sql}[{i + 1}]::DOUBLE"
                f" - {mn}) / {sc} + 0.5), 255.0), 0.0)"
            )
            parts.append(f"{mn} + {code} * {sc} / 255.0")
        return "[" + ", ".join(parts) + "]"


def sq8_encode(
    df: DataFrame, sq: SQ8, vec_col: str, id_col: str = "vec_id"
) -> DataFrame:
    """Index-build step: persistable (id, codes uint8-as-int) relation.
    At scale this is written once next to the IVF layout; queries read the
    codes column (dim bytes/row), never the raw vectors."""
    return df.select(F.col(id_col), sq.encode_col(F.col(vec_col)).alias("codes"))


def sq8_codes_knn(
    codes_df: DataFrame,
    sq: SQ8,
    query_vec,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Quantized kNN over PRE-ENCODED codes: decode is constant-size column
    arithmetic (3 zip_with HOFs); the corpus-wide encode happened once at
    index build, not per query."""
    decoded = sq.decode_codes_col(F.col("codes"))
    dist = V.DISTANCES[metric](decoded, V.lit_vector(query_vec))
    if round_to is not None:
        dist = F.round(dist, round_to)
    return (
        codes_df.select(id_col, dist.alias("distance"))
        .orderBy(F.col("distance"), F.col(id_col))
        .limit(k)
    )


def sq8_knn(
    df: DataFrame,
    sq: SQ8,
    vec_col: str,
    query_vec,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Quantized kNN straight off raw vectors (one-shot / no prebuilt codes:
    encodes the corpus in-query — prefer sq8_encode + sq8_codes_knn)."""
    decoded = sq.requantize_col(F.col(vec_col))
    dist = V.DISTANCES[metric](decoded, V.lit_vector(query_vec))
    if round_to is not None:
        dist = F.round(dist, round_to)
    return (
        df.select(id_col, dist.alias("distance"))
        .orderBy(F.col("distance"), F.col(id_col))
        .limit(k)
    )


# ---- PQ product quantization ---------------------------------------------

class PQ:
    """Product quantization — the reference's `quant=pq` IVF option
    (server/catalog/index.cpp:300-460, faiss PQ).

    The vector is split into ``m`` subspaces of ``dim/m`` dims; each
    subvector is coded as the id of its nearest sub-centroid.  Query-time
    distance is ADC (asymmetric distance computation): a tiny
    ``m × ksub`` lookup table of query→centroid distances, summed by code.

    Scale shape: codebooks are ``m·ksub·(dim/m)`` doubles — driver-side /
    broadcast.  ``encode_col`` is pure column arithmetic executed once at
    index-build time (codes stored alongside doc ids, 8 bits per
    subspace); a query touches only the codes column + the LUT, never the
    raw vectors (reads shrink dim·4 bytes → m bytes per row).
    """

    def __init__(self, codebooks: list[list[list[float]]]):
        self.codebooks = codebooks  # m × ksub × ds
        self.m = len(codebooks)
        self.ksub = len(codebooks[0])
        self.ds = len(codebooks[0][0])

    @classmethod
    def from_seed_rows(cls, seed_vectors: list[list[float]], m: int) -> "PQ":
        """Deterministic sampled codebook (k-means init without Lloyd
        iterations): sub-centroid j of subspace s = subvector s of seed j.
        Fully reproducible in SQL — the differential-oracle path."""
        dim = len(seed_vectors[0])
        ds = dim // m
        return cls([
            [[float(v[s * ds + i]) for i in range(ds)] for v in seed_vectors]
            for s in range(m)
        ])

    @classmethod
    def train(cls, df: DataFrame, vec_col: str, m: int, ksub: int = 16,
              seed: int = 42, max_iter: int = 20) -> "PQ":
        """Quality path: per-subspace MLlib KMeans codebooks."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        dim = len(df.select(vec_col).first()[0])
        ds = dim // m
        books = []
        for s in range(m):
            feat = df.select(
                array_to_vector(
                    F.transform(
                        F.slice(F.col(vec_col), s * ds + 1, ds),
                        lambda x: x.cast("double"),
                    )
                ).alias("__sub")
            )
            km = KMeans(k=ksub, seed=seed + s, maxIter=max_iter,
                        featuresCol="__sub")
            books.append([c.tolist() for c in km.fit(feat).clusterCenters()])
        return cls(books)

    def _sub_dist(self, vec: Column, s: int, centroid: list[float]) -> Column:
        sub = F.transform(
            F.slice(vec, s * self.ds + 1, self.ds), lambda x: x.cast("double")
        )
        return F.aggregate(
            F.zip_with(sub, F.array(*[F.lit(c) for c in centroid]),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def encode_col(self, vec: Column) -> Column:
        """array<int> of m 1-based codes (first-minimum tie-break — matches
        the oracle's min-j-at-min-distance)."""
        codes = []
        for s in range(self.m):
            dists = F.array(*[
                self._sub_dist(vec, s, self.codebooks[s][j])
                for j in range(self.ksub)
            ])
            codes.append(F.array_position(dists, F.array_min(dists)))
        return F.array(*[c.cast("int") for c in codes])

    def adc_lut(self, query_vec) -> list[list[float]]:
        """m × ksub squared-L2 from the query subvector to each centroid
        (sequential fold, mirroring _sub_dist / the SQL oracle)."""
        lut = []
        for s in range(self.m):
            row = []
            for j in range(self.ksub):
                acc = 0.0
                for i in range(self.ds):
                    d = float(query_vec[s * self.ds + i]) - self.codebooks[s][j][i]
                    acc = acc + d * d
                row.append(acc)
            lut.append(row)
        return lut

    def adc_dist_col(self, codes: Column, query_vec) -> Column:
        lut = self.adc_lut(query_vec)
        lut_col = F.array(*[
            F.array(*[F.lit(v) for v in row]) for row in lut
        ])
        return F.aggregate(
            F.zip_with(codes, lut_col, lambda c, row: F.element_at(row, c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )


def pq_encode(
    df: DataFrame, pq: PQ, vec_col: str, id_col: str = "vec_id"
) -> DataFrame:
    """Index-build step: (id, codes array<int>, m bytes/row). Persist once;
    ADC queries read codes + a broadcast LUT, never the raw vectors."""
    return df.select(F.col(id_col), pq.encode_col(F.col(vec_col)).alias("codes"))


def pq_codes_adc_knn(
    codes_df: DataFrame,
    pq: PQ,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """ADC top-k over PRE-ENCODED codes: per-query work is an m-element LUT
    lookup-sum per row — the reads shrink from dim·4 bytes to m bytes."""
    dist = pq.adc_dist_col(F.col("codes"), query_vec)
    if round_to is not None:
        dist = F.round(dist, round_to)
    return (
        codes_df.select(id_col, dist.alias("distance"))
        .orderBy(F.col("distance"), F.col(id_col))
        .limit(k)
    )


def pq_adc_knn(
    df: DataFrame,
    pq: PQ,
    vec_col: str,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """PQ top-k off raw vectors (one-shot; prefer pq_encode +
    pq_codes_adc_knn so the corpus-wide encode happens at build time)."""
    codes = pq.encode_col(F.col(vec_col))
    dist = pq.adc_dist_col(codes, query_vec)
    if round_to is not None:
        dist = F.round(dist, round_to)
    return (
        df.select(id_col, dist.alias("distance"))
        .orderBy(F.col("distance"), F.col(id_col))
        .limit(k)
    )


def pq_rerank_knn(
    df: DataFrame,
    pq: PQ,
    vec_col: str,
    query_vec,
    k: int = 10,
    rerank_factor: int = 10,
    metric: str = "l2_sqr",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """PQ with exact re-rank — the reference's `SET sdb_rerank_factor`
    pattern (server/connector/duckdb_table_function.h:88-124): ADC selects
    k·rerank_factor candidates from codes alone, then exact distances on
    just those rows produce the final top-k.  At scale the expensive exact
    pass reads `k·factor` raw vectors instead of the corpus."""
    cand = pq_adc_knn(df, pq, vec_col, query_vec, k=k * rerank_factor,
                      id_col=id_col, round_to=None).select(id_col)
    return knn_exact(df.join(cand, id_col, "left_semi"), vec_col, query_vec,
                     k=k, metric=metric, id_col=id_col, round_to=round_to)


# ---- binary (sign) quantization ------------------------------------------

class BinaryQuant:
    """1-bit-per-dimension sign quantization — the binary-code family the
    reference exposes as `quant=rabitq` (server/catalog/index.cpp:300-460).
    This is the uncorrected core: bit_i = v_i > mid_i with mid the per-dim
    midrange; query distance = Hamming.  (RaBitQ proper adds a random
    rotation and a scalar correction factor — documented deviation; the
    storage/bandwidth shape, 32× smaller than float32, is what matters at
    scale.)  Midrange (not mean) keeps training order-independent, hence
    bit-identical across engines."""

    def __init__(self, mids: list[float]):
        self.mids = mids

    @classmethod
    def train(cls, df: DataFrame, vec_col: str = "embedding") -> "BinaryQuant":
        rows = (
            df.select(F.posexplode(F.col(vec_col)).alias("i", "v"))
            .groupBy("i")
            .agg(F.min(F.col("v").cast("double")).alias("mn"),
                 F.max(F.col("v").cast("double")).alias("mx"))
            .orderBy("i")
            .collect()
        )
        return cls([(r.mn + r.mx) / 2.0 for r in rows])

    def bits_col(self, vec: Column) -> Column:
        mids = F.array(*[F.lit(m) for m in self.mids])
        return F.zip_with(
            vec, mids,
            lambda v, mid: F.when(v.cast("double") > mid, F.lit(1)).otherwise(F.lit(0)),
        )

    def query_bits(self, query_vec) -> list[int]:
        return [1 if float(q) > m else 0 for q, m in zip(query_vec, self.mids)]


def binary_encode(
    df: DataFrame, bq: BinaryQuant, vec_col: str, id_col: str = "vec_id"
) -> DataFrame:
    """Index-build step: (id, bits array<int>) — 32× smaller than float32
    at scale (persisted as packed bits; kept as an int array here for
    engine-portable exactness)."""
    return df.select(F.col(id_col), bq.bits_col(F.col(vec_col)).alias("bits"))


def binary_bits_knn(
    bits_df: DataFrame,
    bq: BinaryQuant,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Hamming top-k over PRE-ENCODED bits — per-query cost is a bit
    comparison fold, no corpus-wide quantization."""
    qb = F.array(*[F.lit(b) for b in bq.query_bits(query_vec)])
    hamming = F.aggregate(
        F.zip_with(F.col("bits"), qb,
                   lambda a, b: F.when(a != b, F.lit(1)).otherwise(F.lit(0))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        bits_df.select(id_col, hamming.alias("hamming"))
        .orderBy(F.col("hamming"), F.col(id_col))
        .limit(k)
    )


def binary_hamming_knn(
    df: DataFrame,
    bq: BinaryQuant,
    vec_col: str,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Binary-quantized top-k by Hamming distance (integer — exact parity;
    one-shot path, prefer binary_encode + binary_bits_knn)."""
    qb = F.array(*[F.lit(b) for b in bq.query_bits(query_vec)])
    hamming = F.aggregate(
        F.zip_with(bq.bits_col(F.col(vec_col)), qb,
                   lambda a, b: F.when(a != b, F.lit(1)).otherwise(F.lit(0))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        df.select(id_col, hamming.alias("hamming"))
        .orderBy(F.col("hamming"), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    k: int = 60,
    limit: int | None = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (the standard hybrid
    text+vector combiner): score = Σ 1/(k + rank_i); docs missing from a
    list contribute 0. Inputs must carry a ``rank`` column (1-based).

    Scale shape: both inputs are already top-N (small); the fusion is a
    broadcast-sized full-outer join + sort."""
    a = ranked_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    fused = (
        a.join(b, id_col, "full_outer")
        .select(
            id_col,
            F.round(
                F.coalesce(1.0 / (F.lit(k) + F.col("rank_a")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k) + F.col("rank_b")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
    )
    return fused.limit(limit) if limit is not None else fused


def ranked(df: DataFrame, order_col: str, id_col: str = "doc_id",
           ascending: bool = True) -> DataFrame:
    """Attach a deterministic 1-based ``rank`` ((order_col, id) ordering)."""
    from pyspark.sql import Window

    oc = F.col(order_col) if ascending else F.col(order_col).desc()
    w = Window.orderBy(oc, F.col(id_col))
    return df.withColumn("rank", F.row_number().over(w))


def hybrid_search(
    docs_with_vec: DataFrame,
    match_ids: DataFrame,
    vec_col: str,
    query_vec,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "doc_id",
    round_to: int | None = 6,
) -> DataFrame:
    """FTS filter ∧ ANN order (reference demo4 Q3 hybrid shape): semi-join
    the text-match doc ids, then exact top-k by vector distance."""
    filtered = docs_with_vec.join(match_ids, id_col, "left_semi")
    return knn_exact(
        filtered, vec_col, query_vec, k=k, metric=metric,
        id_col=id_col, round_to=round_to,
    )


# ---- RaBitQ binary quantization -------------------------------------------

class RaBitQ:
    """RaBitQ-style 1-bit quantization (the reference's `quant=rabitq`
    family, server/catalog/index.cpp:300-460; published algorithm: Gao &
    Long, SIGMOD 2024): residuals against a fixed centroid are passed
    through a SEEDED random orthogonal rotation, the sign bits of the
    rotated residual are stored together with two per-vector correction
    scalars (residual norm, <quantized-unit, unit>), and queries use the
    unbiased inner-product estimator

        <o, q̂> ≈ <ō, q̂> / <ō, ô>
        dist²(x, q) ≈ ||o||² + ||q-c||² - 2 ||o|| ||q-c|| <o, q̂>

    Engine-portability: every float is produced by the SAME left-fold
    summation order in Spark (zip_with + aggregate), DuckDB
    (list_transform + list_reduce) and driver-side Python, so the
    estimate — not just the bits — is bit-identical and the whole path
    stays oracle-gated. The centroid is the per-dim midrange (order-
    independent, unlike a float mean); the rotation is Q from the QR of a
    seeded Gaussian matrix, shipped as literals into both engines.
    """

    def __init__(self, centroid: list[float], rotation: list[list[float]]):
        self.centroid = centroid
        self.rotation = rotation          # row-major: rot[j] = output dim j
        self.dim = len(centroid)
        self._inv_sqrt_d = 1.0 / math.sqrt(self.dim)

    @staticmethod
    def rotation_matrix(dim: int, seed: int = 7) -> list[list[float]]:
        """Seeded random orthogonal matrix (Q of a Gaussian QR,
        sign-fixed) — data-INDEPENDENT, so oracles can regenerate it
        without training."""
        import numpy as np

        rng = np.random.default_rng(seed)
        q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
        q = q * np.sign(np.diag(r))
        return [[float(x) for x in row] for row in q]

    @classmethod
    def train(cls, df: DataFrame, vec_col: str = "embedding",
              seed: int = 7) -> "RaBitQ":
        rows = (
            df.select(F.posexplode(F.col(vec_col)).alias("i", "v"))
            .groupBy("i")
            .agg(F.min(F.col("v").cast("double")).alias("mn"),
                 F.max(F.col("v").cast("double")).alias("mx"))
            .orderBy("i")
            .collect()
        )
        centroid = [(r.mn + r.mx) / 2.0 for r in rows]
        return cls(centroid, cls.rotation_matrix(len(centroid), seed))

    # -- shared arithmetic, in all three representations --------------------

    def _rot_col(self, res: Column, j: int) -> Column:
        row = F.array(*[F.lit(x) for x in self.rotation[j]])
        return F.aggregate(
            F.zip_with(res, row, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x)

    def encode_col(self, vec: Column) -> tuple[Column, Column, Column]:
        """(bits array<int>, norm double, obar_dot_o double) for one data
        vector column."""
        cen = F.array(*[F.lit(c) for c in self.centroid])
        res = F.zip_with(vec, cen, lambda v, c: v.cast("double") - c)
        norm = F.sqrt(F.aggregate(
            F.transform(res, lambda x: x * x),
            F.lit(0.0), lambda acc, x: acc + x))
        rots = [self._rot_col(res, j) for j in range(self.dim)]
        bits = F.array(*[
            F.when(r > 0, F.lit(1)).otherwise(F.lit(0)) for r in rots])
        # <ō, o> = Σ ±(1/√D)·rot_j / ||res|| — left fold in dim order
        signed = [
            F.when(r > 0, F.lit(self._inv_sqrt_d))
            .otherwise(F.lit(-self._inv_sqrt_d)) * r
            for r in rots
        ]
        acc = signed[0]
        for t in signed[1:]:
            acc = acc + t
        obar_o = F.when(norm > 0, acc / norm).otherwise(F.lit(0.0))
        return bits, norm, obar_o

    def query_transform(self, query_vec,
                        fast: bool | None = None) -> tuple[list[float], float]:
        """Driver-side: (rotated normalized query residual, ||q - c||) —
        the same left-fold float order as the engine expressions. With
        ``fast`` (default above 64 dims, matching the encode path's
        method switch) the rotation is one numpy matvec instead of a
        dim² Python loop — last-ulp summation differences, scale path
        only."""
        if fast is None:
            fast = self.dim > 64
        if fast:
            import numpy as np

            res_a = (np.asarray([float(q) for q in query_vec])
                     - np.asarray(self.centroid))
            qnorm = float(np.sqrt((res_a * res_a).sum()))
            rot_a = np.asarray(self.rotation) @ res_a
            if qnorm > 0:
                rot_a = rot_a / qnorm
            else:
                rot_a = np.zeros_like(rot_a)
            return [float(x) for x in rot_a], qnorm
        res = [float(q) - c for q, c in zip(query_vec, self.centroid)]
        qnorm = 0.0
        for x in res:
            qnorm = qnorm + x * x
        qnorm = math.sqrt(qnorm)
        rot = []
        for j in range(self.dim):
            acc = 0.0
            for a, b in zip(res, self.rotation[j]):
                acc = acc + a * b
            rot.append(acc / qnorm if qnorm > 0 else 0.0)
        return rot, qnorm


def rabitq_encode(df: DataFrame, rq: RaBitQ, vec_col: str,
                  id_col: str = "vec_id", method: str = "auto") -> DataFrame:
    """Index-build step: (id, bits, norm, obar_o) — 1 bit/dim + two
    correction doubles per vector.

    Two physical paths behind one API:
      * ``expr``  — pure column expressions; the rotation is dim² literals
        in the plan, which whole-stage-codegens fine at oracle-gate dims
        but CANNOT compile at real embedding dims (1536² ≈ 2.4M literal
        nodes). Bit-identical to the DuckDB oracle — the gated path.
      * ``numpy`` — Arrow-batched mapInPandas; the rotation matrix ships
        ONCE as an sc.broadcast (float64, ~18 MB at 1536 dims), each
        batch is one BLAS matmul. Build-time only; numpy's pairwise
        summation may differ from the left-fold in the last ulp, so this
        path is for scale, not for the hash-matching oracle.
    ``auto`` picks expr at/below 64 dims (every gate query), numpy above.
    """
    if method == "auto":
        method = "expr" if rq.dim <= 64 else "numpy"
    if method == "expr":
        bits, norm, obar_o = rq.encode_col(F.col(vec_col))
        return df.select(F.col(id_col), bits.alias("bits"),
                         norm.alias("norm"), obar_o.alias("obar_o"))

    import numpy as np

    spark = df.sparkSession
    b_rot = spark.sparkContext.broadcast(
        np.asarray(rq.rotation, dtype=np.float64))
    cen = np.asarray(rq.centroid, dtype=np.float64)
    s = rq._inv_sqrt_d
    id_field = df.schema[id_col]

    def encode_batches(batches):
        rot_t = b_rot.value.T  # res @ R.T: rot[:, j] = res · rotation[j]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            res = vecs - cen
            norm = np.sqrt((res * res).sum(axis=1))
            rot = res @ rot_t
            bits = (rot > 0).astype(np.int32)
            signed = np.where(rot > 0, s, -s) * rot
            with np.errstate(divide="ignore", invalid="ignore"):
                obar = np.where(norm > 0, signed.sum(axis=1) / norm, 0.0)
            import pandas as pd

            yield pd.DataFrame({
                id_col: pdf[id_col],
                "bits": list(bits),
                "norm": norm,
                "obar_o": obar,
            })

    out_schema = (f"{id_col} {id_field.dataType.simpleString()},"
                  " bits array<int>, norm double, obar_o double")
    return df.select(id_col, vec_col).mapInPandas(
        encode_batches, schema=out_schema)


def rabitq_codes_knn(codes: DataFrame, rq: RaBitQ, query_vec,
                     k: int = 10, round_to: int = 6,
                     id_col: str = "vec_id") -> DataFrame:
    """Top-k by the RaBitQ estimated distance over PRE-ENCODED codes:
    per-row work is one ±1/√D dot with the rotated query + scalar
    algebra — no float vectors touched at query time."""
    qrot, qnorm = rq.query_transform(query_vec)
    qarr = F.array(*[F.lit(x) for x in qrot])
    s = F.lit(rq._inv_sqrt_d)
    obar_q = F.aggregate(
        F.zip_with(F.col("bits"), qarr,
                   lambda b, qv: (F.when(b == 1, s).otherwise(-s)) * qv),
        F.lit(0.0), lambda acc, x: acc + x)
    est_oq = F.when(F.col("obar_o") != 0.0,
                    obar_q / F.col("obar_o")).otherwise(F.lit(0.0))
    est_d2 = (F.col("norm") * F.col("norm") + F.lit(qnorm * qnorm)
              - F.lit(2.0) * F.col("norm") * F.lit(qnorm) * est_oq)
    # + 0.0 canonicalizes IEEE -0.0 (the gate hashes rendered strings)
    return (
        codes.select(id_col,
                     (F.round(est_d2, round_to) + F.lit(0.0))
                     .alias("est_d2"))
        .orderBy("est_d2", id_col)
        .limit(k)
    )


def duckdb_rabitq_sql(rq: RaBitQ, query_vec, table: str = "embeddings",
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      k: int = 10, round_to: int = 6) -> str:
    """The FULL RaBitQ pipeline (encode + estimate) as DuckDB SQL with
    the rotation/centroid as literals — the parity oracle."""
    d = rq.dim
    cen = "[" + ", ".join(repr(c) for c in rq.centroid) + "]"
    s = repr(rq._inv_sqrt_d)
    qrot, qnorm = rq.query_transform(query_vec)
    qarr = "[" + ", ".join(repr(x) for x in qrot) + "]"

    def dotrow(j: int) -> str:
        row = "[" + ", ".join(repr(x) for x in rq.rotation[j]) + "]"
        return (f"list_reduce(list_transform(range(1, {d} + 1),"
                f" i -> res[i] * ({row})[i]), (a, b) -> a + b)")

    rots = ", ".join(dotrow(j) + f" AS r{j}" for j in range(d))
    signed_sum = " + ".join(
        f"(CASE WHEN r{j} > 0 THEN {s} ELSE -{s} END) * r{j}"
        for j in range(d))
    bits_arr = ", ".join(
        f"CASE WHEN r{j} > 0 THEN 1 ELSE 0 END" for j in range(d))
    return f"""
WITH res_t AS (
  SELECT {id_col},
    list_transform(range(1, {d} + 1),
      i -> {vec_col}[i]::DOUBLE - ({cen})[i]) AS res
  FROM {table}),
rot_t AS (
  SELECT {id_col}, res,
    sqrt(list_reduce(list_transform(res, x -> x * x),
         (a, b) -> a + b)) AS norm,
    {rots}
  FROM res_t),
enc AS (
  SELECT {id_col}, norm, [{bits_arr}] AS bits,
    CASE WHEN norm > 0 THEN ({signed_sum}) / norm ELSE 0.0 END AS obar_o
  FROM rot_t),
est AS (
  SELECT {id_col}, norm, obar_o,
    list_reduce(list_transform(range(1, {d} + 1),
      i -> (CASE WHEN bits[i] = 1 THEN {s} ELSE -{s} END)
           * ({qarr})[i]), (a, b) -> a + b) AS obar_q
  FROM enc)
SELECT {id_col},
  round(norm * norm + {repr(qnorm * qnorm)}
        - 2.0 * norm * {repr(qnorm)}
          * (CASE WHEN obar_o <> 0.0 THEN obar_q / obar_o ELSE 0.0 END),
        {round_to}) + 0.0 AS est_d2
FROM est ORDER BY est_d2, {id_col} LIMIT {k}
"""


def rabitq_rerank_knn(codes: DataFrame, vectors: DataFrame, rq: RaBitQ,
                      query_vec, k: int = 10, shortlist: int = 100,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      round_to: int = 6) -> DataFrame:
    """RaBitQ as designed to be used: the 1-bit estimator shortlists
    `shortlist` candidates (bit fold only), then the exact L2 re-rank
    touches float vectors for just those rows — at 100 TB the float
    columns are read via a semi-join on the shortlist, 32× less scan
    bandwidth on the first pass."""
    cand = rabitq_codes_knn(codes, rq, query_vec, k=shortlist,
                            id_col=id_col).select(id_col)
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), qarr,
                   lambda a, b: (a.cast("double") - b)
                   * (a.cast("double") - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (
        vectors.join(cand, id_col, "left_semi")
        .select(id_col, (F.round(d2, round_to) + F.lit(0.0)).alias("d2"))
        .orderBy("d2", id_col)
        .limit(k)
    )
