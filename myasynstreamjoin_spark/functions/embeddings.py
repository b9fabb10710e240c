"""Embedding-column maintenance ops: L2 normalization and int8 scalar
quantization.

Beyond-reference surface (SURVEY.md §7 phase 5): the storage-side
counterparts of functions/similarity.py. A 100 TB embedding corpus is
dominated by vector bytes; normalizing once at ingest turns every
cosine into a dot product (similarity.py skips two norms per pair),
and symmetric int8 quantization cuts storage and scan I/O 4× at a
bounded recall cost.

All math is `F.transform` / `F.aggregate` lambda expressions over
ARRAY columns — JVM-side, no Python, map-only (no shuffle), with
float→double promotion before any arithmetic so the DuckDB oracle
reproduces results bit-for-bit (see similarity.py's float handling
note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.similarity import dot


def l2_normalize(
    embs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> DataFrame:
    """Unit-normalize each vector; zero vectors yield an all-null
    vector rather than a division error (ANSI mode: x/0.0 is NULL-safe
    for doubles but we make the intent explicit).

    Output: (id, norm, unit) — rounded for oracle hash stability.
    """
    v = F.col(vec_col)
    norm = F.sqrt(dot(v, v))
    # zip against array_repeat(norm) rather than capturing `norm` in a
    # transform lambda: higher-order lambdas re-evaluate captured outer
    # expressions per ELEMENT (no CSE in interpreted HOFs), turning the
    # O(d) norm into O(d²) per row — invisible at d=64, ruinous at
    # production embedding widths. array_repeat evaluates norm once.
    unit = F.zip_with(
        v,
        F.array_repeat(norm, F.size(v)),
        lambda x, nrm: F.round(x.cast("double") / nrm, decimals),
    )
    return embs.select(
        F.col(id_col),
        F.round(norm, decimals).alias("norm"),
        unit.alias("unit"),
    )


def quantize_int8(
    embs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127 / max|x|,
    q_i = round(x_i · scale) ∈ [-127, 127]. The per-vector scale rides
    along so a reader can dequantize (and so the error is bounded by
    max|x|/254 per element regardless of vector magnitude).

    Output: (id, scale, q).
    """
    v = F.col(vec_col)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = F.lit(127.0) / amax
    # zip, don't capture: see l2_normalize — a captured `scale` would
    # re-run the O(d) max-abs aggregate once per element.
    q = F.zip_with(
        v,
        F.array_repeat(scale, F.size(v)),
        lambda x, s: F.round(x.cast("double") * s).cast("int"),
    )
    return embs.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        q.alias("q"),
    )


def embedding_covariance(
    embs: DataFrame,
    vec_col: str = "embedding",
    unit: int = 1_000_000,
    decimals: int = 9,
) -> DataFrame:
    """Exact covariance matrix of the embedding dimensions — the
    data-profiling / PCA-input pass (which dimensions co-vary, where
    the mass sits before choosing projections or LSH planes).

    Distributed linear algebra done the 100 TB way: each Arrow batch
    computes its PARTIAL Gram matrix XᵀX with one numpy matmul (in
    integer ``unit``-ths — int64-exact per batch), emits the upper
    triangle as (i, j, partial) rows, and one groupBy reduces partials
    in DECIMAL(38,0). Python sees each row once inside a vectorized
    matmul; the shuffle is d(d+1)/2 rows per batch, independent of
    corpus size. First moments ride the same pass as the j = -1 rows.

    Covariance is then the exact integer cross-multiplication
    (n·S_ij − S_i·S_j) / (n² · unit²) — one correctly-rounded double
    division of exact integers, bit-identical on any engine and any
    row order.

    Output: (i, j, cov) for 0 ≤ i ≤ j < dim, rounded to ``decimals``.
    """
    import pandas as pd  # noqa: PLC0415 — Arrow path only

    u = int(unit)

    def gram(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            scaled = np.stack(pdf[vec_col].to_numpy()).astype("float64") * u
            # round HALF-AWAY-FROM-ZERO to match SQL round() in both
            # engines (np.rint is half-to-even and would diverge on
            # exact .5 quantization boundaries)
            x = np.copysign(np.floor(np.abs(scaled) + 0.5), scaled).astype(
                "int64"
            )
            g = x.T @ x  # int64-exact: |x| ≤ unit·|v|max, batch ≤ 10^4 rows
            s = x.sum(axis=0)
            d = x.shape[1]
            iu, ju = np.triu_indices(d)
            out = pd.DataFrame(
                {"i": iu.astype("int32"), "j": ju.astype("int32"),
                 "p": g[iu, ju]}
            )
            firsts = pd.DataFrame(
                {"i": np.arange(d, dtype="int32"),
                 "j": np.full(d, -1, dtype="int32"),
                 "p": s}
            )
            counts = pd.DataFrame({"i": [-1], "j": [-1], "p": [len(pdf)]})
            yield pd.concat([out, firsts, counts], ignore_index=True)

    partials = embs.select(vec_col).mapInPandas(
        gram, schema="i int, j int, p long"
    )
    sums = partials.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("s")
    )
    n_rows = sums.where((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    moments = sums.where(F.col("j") == -1).where(F.col("i") >= 0)
    second = sums.where(F.col("j") >= 0)
    m_i = moments.select(F.col("i").alias("i"), F.col("s").alias("si"))
    m_j = moments.select(F.col("i").alias("j"), F.col("s").alias("sj"))
    denom = F.col("n") * F.col("n") * F.lit(u).cast("decimal(38,0)") * F.lit(
        u
    ).cast("decimal(38,0)")
    return (
        second.join(F.broadcast(m_i), "i")
        .join(F.broadcast(m_j), "j")
        .crossJoin(F.broadcast(n_rows))
        .select(
            "i",
            "j",
            F.round(
                (F.col("n") * F.col("s") - F.col("si") * F.col("sj")).cast(
                    "double"
                )
                / denom.cast("double"),
                decimals,
            ).alias("cov"),
        )
    )


def pca_project(
    embs: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 6,
):
    """PCA: fit the top-``k`` principal components from the exact
    covariance matrix and project every (centered) vector — the
    dimensionality-reduction pass ANN pipelines run before LSH/IVF
    when 64 raw dims carry redundant mass.

    Control plane vs data plane, the engine's standing split: the
    d(d+1)/2 covariance rows and d means are a DRIVER-SIZED read (like
    k-means centroids), eigendecomposition is numpy on the driver (a
    64×64 symmetric eigh — microseconds), and the projection streams
    through an Arrow matmul with the component matrix captured in the
    closure — one `X @ W` per batch, no shuffle, corpus scanned once.

    Eigenvector sign is fixed (largest-|entry| coordinate positive) so
    the output is deterministic; eigen itself is LAPACK — this is the
    one operator family whose oracle is invariant-based pytest, not
    SQL replay (documented rows-only).

    Returns ``(projected, components, eigenvalues)``: the projected
    DataFrame (id, proj array<double>), the (k, d) component matrix,
    and the k eigenvalues (descending).
    """
    import numpy as np

    cov_rows = embedding_covariance(embs, vec_col=vec_col).collect()
    if not cov_rows:
        raise ValueError("pca_project: input has no embedding rows")
    d = max(r["j"] for r in cov_rows) + 1
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
    means = (
        embs.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    mu = np.zeros(d)
    for r in means:
        mu[r["i"]] = r["m"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    w = vecs[:, order].T  # (k, d)
    for row in w:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    eigenvalues = vals[order].copy()
    w_c = w.copy()
    mu_c = mu.copy()

    def project(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64") - mu_c
            p = np.round(x @ w_c.T, decimals)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "proj": list(map(list, p))}
            )

    projected = embs.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} long, proj array<double>"
    )
    return projected, w, eigenvalues


def pq_encode(
    embs: DataFrame,
    n_sub: int = 4,
    k: int = 16,
    n_iters: int = 4,
    tol: float = 1e-4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector into
    ``n_sub`` subvectors, learn a ``k``-word codebook per subspace by
    Lloyd iterations, and encode every vector as ``n_sub`` small codes
    — the compression layer that turns IVF into IVF-PQ (d·4 bytes →
    n_sub bytes per vector at k ≤ 256, here 64·4 → 4).

    All subspaces train in ONE joint loop: the (id, sub, subvec) table
    is built once (checkpointed; the explode is the only row
    amplification, ×n_sub); per iteration, assignment is a broadcast
    nested codebook literal + argmin (array expressions, no UDF) and
    re-centering is a single posexplode shuffle with only
    n_sub·k·(d/n_sub) = d·k groups — the same bounded-model-state
    discipline as ``kmeans_fit`` (k·d floats on the driver, never
    rows). Deterministic: seeds are the k lowest-id vectors' slices,
    argmin ties break toward the lower code.

    Output: (vec_id, codes ARRAY<INT>[n_sub], recon_err DOUBLE) —
    recon_err is the squared-L2 distance between the vector and its
    decoded (nearest-codeword-per-subspace) reconstruction, the
    quantization-quality audit.
    """
    codes, _ = pq_fit(embs, n_sub, k, n_iters, tol, vec_col, id_col)
    return codes


def pq_fit(
    embs: DataFrame,
    n_sub: int = 4,
    k: int = 16,
    n_iters: int = 4,
    tol: float = 1e-4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """``pq_encode``'s trainer, also returning the fitted codebook
    (``cents[sub][code] = centroid``, the driver-resident model state)
    so a consumer can run asymmetric-distance search (``pq_topk``)
    against the codes."""
    import math

    dim_row = embs.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not dim_row:
        empty = embs.sparkSession.createDataFrame(
            [], f"{id_col} long, codes array<int>, recon_err double"
        )
        return empty, []
    d = dim_row[0]["d"]
    if d % n_sub != 0:
        raise ValueError(f"dim {d} not divisible by n_sub {n_sub}")
    dsub = d // n_sub

    sub_structs = F.array(*[
        F.struct(
            F.lit(s).alias("sub"),
            F.transform(
                F.slice(vec_col, s * dsub + 1, dsub),
                lambda x: x.cast("double"),
            ).alias("sv"),
        )
        for s in range(n_sub)
    ])
    pts = (
        embs.select(id_col, F.explode(sub_structs).alias("p"))
        .select(id_col, "p.sub", "p.sv")
        .localCheckpoint(eager=True)
    )

    seed_rows = (
        pts.where(
            F.col(id_col).isin(
                [r[0] for r in embs.orderBy(F.asc(id_col)).limit(k).select(id_col).collect()]
            )
        )
        .orderBy(id_col, "sub")
        .collect()
    )
    # cents[sub][code] = list of dsub floats
    cents: list[list[list[float]]] = [[] for _ in range(n_sub)]
    for r in seed_rows:
        cents[r["sub"]].append(list(map(float, r["sv"])))

    def codebook_lit(cb):
        return F.array(*[
            F.array(*[F.array(*[F.lit(x) for x in w]) for w in sub])
            for sub in cb
        ])

    def assigned(cb) -> DataFrame:
        sub_words = F.element_at(codebook_lit(cb), F.col("sub") + 1)
        dists = F.transform(
            sub_words,
            lambda c: F.aggregate(
                F.zip_with(F.col("sv"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return pts.withColumn("__d", dists).select(
            id_col,
            "sub",
            "sv",
            (F.array_position("__d", F.array_min("__d")) - 1).cast("int").alias("code"),
            F.array_min("__d").alias("d2"),
        )

    for _ in range(n_iters):
        asg = assigned(cents)
        new_rows = (
            asg.select("sub", "code", F.posexplode("sv").alias("dim", "v"))
            .groupBy("sub", "code", "dim")
            .agg(F.avg("v").alias("m"))
            .groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("ms"))
            .select("sub", "code", F.col("ms.m").alias("w"))
            .collect()
        )
        new_cents = [list(sub) for sub in cents]
        for r in new_rows:
            new_cents[r["sub"]][r["code"]] = list(map(float, r["w"]))
        shift = max(
            math.sqrt(sum((a - b) ** 2 for a, b in zip(ow, nw)))
            for osub, nsub_ in zip(cents, new_cents)
            for ow, nw in zip(osub, nsub_)
        )
        cents = new_cents
        if shift < tol:
            break

    final = assigned(cents)
    codes = (
        final.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("codes"),
            F.round(F.sum("d2"), 6).alias("recon_err"),
        )
    )
    return codes, cents


def pq_topk(
    embs: DataFrame,
    n_queries: int = 3,
    k_neighbors: int = 10,
    n_sub: int = 4,
    k: int = 16,
    n_iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over PQ codes — the query
    path of IVF-PQ: approximate d²(q, x) = Σ_s d²(q_s, codeword(x, s))
    via a per-query lookup table, so search touches only the n_sub
    byte codes per corpus vector, never the vectors.

    The LUT (n_queries × n_sub × k doubles) is computed driver-side
    from the fitted codebook and broadcast as a literal — the corpus
    pass is a map-only projection (one nested element_at per subspace,
    no UDF, no join) followed by a per-query top-k window. Queries are
    the ``n_queries`` lowest-id vectors (the ``cosine_topk_multi``
    convention); self-matches are excluded.

    Output: (qid, vec_id, adc_d2, rn) — rn the per-query rank by
    (adc_d2, vec_id).
    """
    from pyspark.sql import Window

    codes, cents = pq_fit(
        embs, n_sub, k, n_iters, vec_col=vec_col, id_col=id_col
    )
    if not cents:
        return embs.sparkSession.createDataFrame(
            [], f"qid long, {id_col} long, adc_d2 double, rn int"
        )
    dsub = len(cents[0][0])
    qrows = (
        embs.orderBy(F.asc(id_col))
        .limit(n_queries)
        .select(id_col, vec_col)
        .collect()
    )
    entries = []
    for qr in qrows:
        qv = [float(x) for x in qr[vec_col]]
        lut = [
            [
                sum(
                    (qv[s * dsub + j] - w[j]) ** 2 for j in range(dsub)
                )
                for w in cents[s]
            ]
            for s in range(n_sub)
        ]
        entries.append(
            F.struct(
                F.lit(qr[id_col]).cast("long").alias("qid"),
                F.array(*[
                    F.array(*[F.lit(x) for x in sub]) for sub in lut
                ]).alias("lut"),
            )
        )
    q = F.explode(F.array(*entries)).alias("q")
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("q.lut"), s + 1),
            F.element_at(F.col("codes"), s + 1) + 1,
        ),
    )
    scored = (
        codes.select(id_col, "codes")
        .select(id_col, "codes", q)
        .where(F.col("q.qid") != F.col(id_col))
        .select(
            F.col("q.qid").alias("qid"), id_col, adc.alias("__d2")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.asc("__d2"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k_neighbors)
        .select("qid", id_col, F.round("__d2", 6).alias("adc_d2"), "rn")
    )
