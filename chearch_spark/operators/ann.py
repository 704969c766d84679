"""Approximate-nearest-neighbor search over an embedding column
(``array<float>``).

Two paths, per the scale playbook:

* :func:`cosine_topk` — exact brute-force top-k.  The *right* plan for
  a small query set against a huge corpus: the query vectors are
  broadcast (hash-join build side), the corpus stays partitioned and is
  scanned once, each task computes dot products JVM-side
  (``zip_with`` + sequential ``aggregate`` fold in double — the fold
  order is pinned, so scores are bit-identical at any parallelism),
  local top-k per partition, global ``TakeOrderedAndProject``.  No
  shuffle of the corpus, one gather of k rows per query.
* :func:`lsh_ann_topk` — random-hyperplane (SimHash-style) LSH with
  banded candidate generation, for when the query set itself is large:
  corpus and queries are bucketed by band signature and joined on the
  bucket key, so the join touches candidates only.  Hyperplanes are
  pinned constants derived from md5 (deterministic across runs and
  engines — no RNG state to ship).  Approximate (recall < 1 by
  design) yet fully deterministic, so it has an exact DuckDB mirror
  (:func:`lsh_ann_topk_sql`) and a recall gauge (:func:`lsh_recall`),
  both value-hash-verified by the driver gate.

The reference engine has no vector path at all (SURVEY.md §2.5); this
module is part of the training-data-pipeline extension surface.

Public-literature basis: random-hyperplane LSH is Charikar (STOC
2002); the IVF (inverted-file) coarse-quantizer layout follows
Sivic & Zisserman's Video Google / the IVF-Flat shape popularized by
FAISS (Johnson, Douze, Jégou, "Billion-scale similarity search with
GPUs", 2017) — re-expressed as Spark plans (cell-partitioned parquet +
partition-pruned probe joins) rather than an in-memory library.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from chearch_spark.functions.hashing import py_md5_long
from chearch_spark.operators.dedup import _dot, with_norm

# Pinned hyperplane grid for LSH: PLANES x DIM values in [-1, 1),
# derived from md5 so Spark, tests, and any re-implementation agree.
LSH_PLANES = 16
LSH_BANDS = 4
LSH_ROWS = LSH_PLANES // LSH_BANDS

# Product-quantization defaults, tuned on the synthetic 64-dim
# embeddings (BENCH-style sweep, r5): more subspaces beat more codes
# on near-random vectors — m=16 x 64 codes (96 bits/vector = 26x
# smaller than the float32 row), measured mean recall@10: seed
# 0.43-0.58, trained 0.52-0.63 across sf0.001/0.01/0.1.  Floors are
# pinned in spec.py; the operators live at the bottom of this module.
PQ_M = 16
PQ_CODES = 64


def _rank_topk(cand, k: int, vec_col: str = "embedding"):
    """Shared tail of EVERY ANN query path (exact, IVF one-shot, IVF
    persisted, IVF-flat, LSH): exact cosine over candidate rows
    carrying (query_id, vec_id, vec_col, norm, qv, qn), per-query rank
    with the pinned tie-break (cos desc, vec_id asc), 6-decimal
    rounding, int rank.  One place to change ranking semantics — a
    tweak applied to fewer than all paths would silently break their
    rank parity."""
    cos = _dot(F.col("qv"), F.col(vec_col)) / (F.col("qn") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("cos", 6).alias("cos"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _plane_value(p: int, d: int) -> float:
    return (py_md5_long(f"chearch-ann-plane-{p}-{d}") % 2001 - 1000) / 1000.0


def _plane_lit(p: int, dim: int) -> Column:
    return F.array(*[F.lit(_plane_value(p, d)) for d in range(dim)])


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine for each query id:
    (query_id, vec_id, cos, rank) — rank 1..k, ties (cos desc, vec_id
    asc), self-matches excluded."""
    from chearch_spark.functions.parallel import spread_small_scan

    e = with_norm(
        spread_small_scan(
            emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
        ),
        vec_col,
    )
    q = (
        e.filter(F.col("vec_id").isin(list(query_ids)))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col("norm").alias("qn"),
        )
    )
    cand = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    return _rank_topk(cand, k, vec_col)


def cosine_topk_sql(
    query_ids: list[int], k: int = 10, table: str = "embeddings"
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e
), q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qn
  FROM n WHERE vec_id IN ({ids})
), scored AS (
  SELECT q.query_id, n.vec_id,
         list_dot_product(q.qv, n.v) / (q.qn * n.norm) AS cos
  FROM n JOIN q ON n.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    sample: int = 512,
    iters: int = 8,
    vec_col: str = "embedding",
    sample_order: str = "hash",
):
    """Deterministic coarse quantizer for IVF: k-means on a driver-side
    sample, fixed iteration count, init = first k sampled vectors.
    The sample is tiny by design; at 100 TB you sample O(100k)
    vectors, not the corpus.

    ``sample_order="hash"`` (default) takes the ``sample`` vectors with
    the smallest md5-derived hash of vec_id — deterministic (no RNG
    state to ship) yet uniformly spread over the corpus, unlike the
    legacy ``"id"`` order whose lowest-id prefix can be a biased slice
    (ingestion order often correlates with content).  Both orders are
    a TakeOrdered plan — no full sort."""
    import numpy as np

    from chearch_spark.functions.hashing import md5_long

    key = (
        md5_long(F.col("vec_id")) if sample_order == "hash"
        else F.col("vec_id")
    )
    pdf = (
        emb.select("vec_id", vec_col)
        .orderBy(key, F.col("vec_id"))
        .limit(sample)
        .toPandas()
        .sort_values("vec_id")  # stable init order independent of tie
        .reset_index(drop=True)
    )
    x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    c = x[:n_centroids].copy()
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return c


def ivf_assign(
    emb: DataFrame, centroids, vec_col: str = "embedding",
    pq_codebooks=None, pq_residual: bool = False,
) -> DataFrame:
    """Adds a ``cell`` column: nearest centroid by cosine.  Arrow-batched
    numpy matmul (one pass over the corpus; in a real deployment the
    assignment is persisted with the index, not recomputed per query).
    ``pq_codebooks`` additionally emits the PQ ``codes`` column in the
    SAME pass (the IVF-PQ build — a separate encode pass would re-read
    and re-shuffle the corpus).  ``pq_residual`` encodes the coarse
    residual ``x̂ − c[cell]`` instead of ``x̂`` (pair with codebooks
    from :func:`pq_train_residual`; the IVFADC formulation)."""
    import numpy as np
    import pandas as pd

    c = centroids
    cb = (
        np.asarray(pq_codebooks, dtype=np.float64)
        if pq_codebooks is not None
        else None
    )
    if cb is not None:
        m, _k_codes, dsub = cb.shape
        half_c2 = 0.5 * _seq_dot(cb, cb)

    def _kernel(batches):
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(x):
                xn = x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-12
                )
                cell = (xn @ c.T).argmax(axis=1).astype("int32")
            else:
                xn = x
                cell = np.empty(0, dtype="int32")
            out = {
                "vec_id": pdf["vec_id"].astype("int64"),
                vec_col: pdf[vec_col],
                "cell": cell,
            }
            if cb is not None:
                if len(xn):
                    enc = (
                        xn - np.asarray(c)[cell.astype(np.int64)]
                        if pq_residual
                        else xn
                    )
                    codes = np.empty((len(xn), m), dtype=np.int32)
                    for mi in range(m):
                        xs = enc[:, mi * dsub:(mi + 1) * dsub]
                        s = _seq_dot(
                            xs[:, None, :], cb[mi][None, :, :]
                        )
                        codes[:, mi] = (
                            s - half_c2[mi][None, :]
                        ).argmax(axis=1)
                    out["codes"] = [list(map(int, r)) for r in codes]
                else:
                    out["codes"] = []
            yield pd.DataFrame(out)

    schema = f"vec_id long, {vec_col} array<float>, cell int"
    if cb is not None:
        schema += ", codes array<int>"
    return emb.select("vec_id", vec_col).mapInPandas(_kernel, schema)


def ivf_build(
    emb: DataFrame,
    out_dir: str,
    n_centroids: int = 16,
    sample: int = 512,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lookup_files: int | None = None,
    sample_order: str = "hash",
    pq_m: int | None = None,
    pq_codes: int = PQ_CODES,
    pq_residual: bool = True,
) -> dict:
    """Build and PERSIST an IVF index: k-means centroids (driver-side
    deterministic sample) + the full-corpus cell assignment, written as
    parquet partitioned by ``cell``.

    ``pq_m`` additionally trains per-subspace PQ codebooks and stores
    each vector's ``codes`` column alongside (computed in the SAME
    assignment pass) — the FAISS IVFADC layout: :func:`ivf_query`
    with ``adc=True`` then serves from the probed cells' CODES column
    only (parquet column pruning: ~m small ints per row instead of
    the float vector), the 100 TB scan shape for large query batches.  The one corpus pass happens here,
    at build time; :func:`ivf_query` then serves any number of queries
    from the persisted artifact with a partition-pruned scan of only
    the probed cells — recomputing the assignment per query (the old
    ``ivf_ann_topk`` convenience shape) turns every ANN query into a
    corpus scan at 100× scale.

    Also writes a ``vectors/`` LOOKUP sidecar: the same rows
    RANGE-partitioned and sorted by ``vec_id``, with each file's
    [min, max] id recorded in ``vec_bounds.json``.  The cell layout is
    right for the candidate scan but gives a vec_id probe nothing to
    prune on; the id-sorted sidecar makes the query-by-id vector fetch
    an O(1)-file driver read (same design as the dictionary's
    ``dict_bounds.json``).

    Compatibility note: the centroid sample order defaults to
    ``sample_order="hash"`` (uniform md5-derived spread) since round 3;
    earlier builds used the lowest-id prefix.  REBUILDING an index over
    the same corpus therefore yields a different (still deterministic)
    centroid set and cell layout than a pre-round-3 build — persisted
    indexes stay self-consistent, but recall numbers shift on rebuild.
    Pass ``sample_order="id"`` if the legacy layout must be
    reproduced."""
    import json
    import os

    base = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    c = kmeans_centroids(
        base, n_centroids, sample, iters, vec_col, sample_order
    )
    if pq_m and pq_residual:
        # IVFADC proper: codebooks quantize the coarse residual
        # x̂ − c[cell] (Jégou 2011 §III.C) — the recall lever; plain
        # code-the-vector PQ stays available via pq_residual=False
        # (and is what pre-round-6 persisted indexes contain)
        cb = pq_train_residual(
            base, c, pq_m, pq_codes, sample, iters, vec_col,
            "vec_id", sample_order,
        )
    elif pq_m:
        cb = pq_train(
            base, pq_m, pq_codes, sample, iters, vec_col, "vec_id",
            sample_order,
        )
    else:
        cb = None
    assigned = with_norm(
        ivf_assign(
            base, c, vec_col, pq_codebooks=cb,
            pq_residual=bool(pq_m and pq_residual),
        ),
        vec_col,
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(out_dir, "assigned")
    )
    spark = emb.sparkSession
    if lookup_files is None:
        lookup_files = max(spark.sparkContext.defaultParallelism, 1)
    vdir = os.path.join(out_dir, "vectors")
    (
        spark.read.parquet(os.path.join(out_dir, "assigned"))
        .repartitionByRange(lookup_files, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(vdir)
    )
    bounds = _vec_bounds(vdir)
    bp = os.path.join(out_dir, "vec_bounds.json")
    with open(bp + ".tmp", "w") as f:
        json.dump({"files": bounds}, f)
    os.replace(bp + ".tmp", bp)
    meta = {
        "n_centroids": int(n_centroids),
        "dim": int(len(c[0])),
        "vec_col": vec_col,
        "centroids": [[float(x) for x in row] for row in c],
    }
    if cb is not None:
        meta["pq"] = {
            "m": int(pq_m),
            "k_codes": int(pq_codes),
            # what the codes QUANTIZE: the coarse residual x̂ − c[cell]
            # (IVFADC) or the vector itself.  ivf_query(adc=True) reads
            # this to pick the scoring identity; absent (pre-r6 index)
            # means non-residual.
            "residual": bool(pq_residual),
            "codebooks": [
                [[float(x) for x in row] for row in book]
                for book in cb
            ],
        }
    tmp = os.path.join(out_dir, "ivf_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "ivf_meta.json"))
    return meta


def _vec_bounds(vdir: str) -> dict[str, list[int]]:
    """{part_file: [min_vec_id, max_vec_id]} from the lookup sidecar's
    parquet FOOTER row-group statistics — O(1) metadata per file, no
    row decode (the sidecar is corpus-sized; reading the vec_id column
    to min/max it would make ivf_build's bounds pass O(corpus) driver
    I/O)."""
    import os

    import pyarrow.parquet as pq

    bounds: dict[str, list[int]] = {}
    for fn in sorted(os.listdir(vdir)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(vdir, fn)).metadata
        lo = hi = None
        idx = None
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            if idx is None:
                idx = next(
                    i
                    for i in range(grp.num_columns)
                    if grp.column(i).path_in_schema == "vec_id"
                )
            st = grp.column(idx).statistics
            if st is None or not st.has_min_max:
                # stats missing (foreign writer): fall back to a read
                import pyarrow.compute as pc

                col = pq.read_table(
                    os.path.join(vdir, fn), columns=["vec_id"]
                ).column("vec_id")
                if len(col):
                    lo, hi = int(pc.min(col).as_py()), int(pc.max(col).as_py())
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            bounds[fn] = [int(lo), int(hi)]
    return bounds


def fetch_query_vectors(
    out_dir: str, query_ids: list[int], vec_col: str
) -> tuple["object", int]:
    """Driver-side fetch of (vec_id, vec, norm) for a FEW query ids
    from the id-sorted ``vectors/`` sidecar: the bounds file prunes to
    the O(|ids|) part files whose range can contain a query id, and
    row-group min/max on the sorted vec_id column prunes within them.
    Returns (pandas frame, number of files opened) — the file count is
    what `scripts/explain_audit.py` asserts stays O(ids), independent
    of corpus size."""
    import json
    import os

    import pandas as pd
    import pyarrow.dataset as ds

    vdir = os.path.join(out_dir, "vectors")
    bp = os.path.join(out_dir, "vec_bounds.json")
    with open(bp) as f:
        bounds = json.load(f)["files"]
    ids = sorted(int(q) for q in query_ids)
    files = [
        os.path.join(vdir, fn)
        for fn, (lo, hi) in sorted(bounds.items())
        if any(lo <= q <= hi for q in ids)
    ]
    if not files:
        return (
            pd.DataFrame({"vec_id": [], vec_col: [], "norm": []}),
            0,
        )
    t = ds.dataset(files, format="parquet").to_table(
        filter=ds.field("vec_id").isin(ids),
        columns=["vec_id", vec_col, "norm"],
    )
    return t.to_pandas(), len(files)


def ivf_query(
    spark,
    out_dir: str,
    query_ids: list[int] | None = None,
    k: int = 10,
    n_probe: int = 4,
    query_vectors=None,
    exclude_self: bool | None = None,
    adc: bool = False,
    rerank: int | None = None,
) -> DataFrame:
    """Query a persisted IVF index (:func:`ivf_build`).  No assignment
    job runs: centroids load from the tiny sidecar, probe cells are a
    driver-side numpy argsort over n_centroids, and the candidate scan
    is partition-pruned to the probed cells (``PartitionFilters`` on
    the cell directory layout) — ~n_probe/n_centroids of the corpus
    per query batch, no Python kernel anywhere in the plan.

    Query vectors come from (exactly one of):

    * ``query_vectors`` — a ``{query_id: vector}`` mapping or an
      iterable of ``(query_id, vector)`` pairs.  The serving-time
      reality: queries are usually EXTERNAL vectors that were never
      indexed.  Norms are computed with the same sequential fold as
      the stored ``norm`` column, so an external copy of an indexed
      vector scores identically.

    ``exclude_self`` drops candidates whose ``vec_id`` equals the
    query id.  Default (None): True on the ``query_ids`` path (an
    indexed vector trivially matches itself at cos=1 — noise), False
    on the ``query_vectors`` path — external ids are CALLER-chosen,
    and an accidental collision with an indexed vec_id must not
    silently drop that indexed vector from the top-k.  Pass
    ``exclude_self=True`` explicitly when external ids are known to
    be the indexed ids (e.g. re-querying with copies).
    * ``query_ids`` — indexed vectors, fetched by id from the
      id-sorted ``vectors/`` lookup sidecar via
      :func:`fetch_query_vectors` — O(|ids|) file opens; the
      cell-partitioned ``assigned`` table is NEVER scanned for this
      (a vec_id predicate prunes nothing on a cell layout, so that
      scan approaches a full corpus read at scale).  Legacy indexes
      without the sidecar fall back to the assigned scan.

    ``rerank=R`` (requires ``adc=True``) is IVFADC+R (Jégou et al.,
    TPAMI 2011 §V): the codes-only ADC scan produces a top-``R``
    shortlist per query, whose FLOAT vectors are then point-fetched
    from the id-sorted ``vectors/`` sidecar (``vec_id IN (...)``
    pushed into the parquet scan — row-group min/max on the sorted
    column prunes to O(R·|queries|) I/O, never a corpus re-scan) and
    re-ranked by exact cosine through the shared :func:`_rank_topk`
    tail.  Recall then tracks the shortlist's coverage (~0.91 at
    R=4k on the sf corpora, vs ~0.55 raw ADC) while the corpus-sized
    scan still reads codes only — the 100 TB byte win is untouched;
    the added cost is one bounded shortlist gather (R·|queries| ids,
    same order as the result itself) plus a point-lookup join."""
    import json
    import os

    import numpy as np

    import pandas as pd

    with open(os.path.join(out_dir, "ivf_meta.json")) as f:
        meta = json.load(f)
    c = np.array(meta["centroids"], dtype=np.float64)
    vec_col = meta["vec_col"]
    assigned = spark.read.parquet(os.path.join(out_dir, "assigned"))

    if (query_vectors is None) == (query_ids is None):
        raise ValueError(
            "pass exactly one of query_ids / query_vectors"
        )
    if rerank is not None:
        if not adc:
            raise ValueError("rerank= requires adc=True (IVFADC+R)")
        if rerank < k:
            raise ValueError(
                f"rerank={rerank} must be >= k={k} (the shortlist "
                "feeds the final top-k)"
            )
    if query_vectors is not None:
        pairs = (
            list(query_vectors.items())
            if isinstance(query_vectors, dict)
            else list(query_vectors)
        )
        # norm via the same sequential left fold as with_norm/_dot
        # (float32 -> double per element), bit-identical to the stored
        # norms for identical vectors
        def _fold_norm(vec) -> float:
            acc = 0.0
            for x in vec:
                xf = float(np.float32(x))
                acc += xf * xf
            return float(np.sqrt(acc))

        qpdf = pd.DataFrame(
            {
                "vec_id": [int(i) for i, _ in pairs],
                vec_col: [
                    [float(np.float32(x)) for x in v] for _, v in pairs
                ],
                "norm": [_fold_norm(v) for _, v in pairs],
            }
        )
    elif os.path.exists(os.path.join(out_dir, "vec_bounds.json")):
        qpdf, _ = fetch_query_vectors(
            out_dir, list(query_ids), vec_col
        )
    else:
        # legacy index (pre-sidecar layout): corpus-shaped fallback
        qpdf = (
            assigned.filter(F.col("vec_id").isin(list(query_ids)))
            .select("vec_id", vec_col, "norm")
            .toPandas()
        )
    if len(qpdf) == 0:
        # unknown query ids degrade to an empty result, like every
        # other query path — not a numpy shape crash
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cos double, rank int"
        )
    qx = np.array(qpdf[vec_col].tolist(), dtype=np.float64)
    qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qx @ c.T), axis=1)[:, :n_probe]
    probe_df = spark.createDataFrame(
        [
            (int(qid), int(cell))
            for qid, row in zip(qpdf["vec_id"], probes)
            for cell in row
        ],
        "query_id long, cell int",
    )
    q = spark.createDataFrame(
        [
            (int(v), [float(x) for x in vec], float(nm))
            for v, vec, nm in zip(qpdf["vec_id"], qpdf[vec_col], qpdf["norm"])
        ],
        "query_id long, qv array<float>, qn double",
    )
    probe_cells = sorted({int(cell) for row in probes for cell in row})
    if exclude_self is None:
        exclude_self = query_ids is not None
    if adc:
        # IVFADC (Jégou et al. 2011): score the probed cells' PQ CODES
        # via per-query lookup tables — the scan reads (vec_id, codes)
        # only (parquet column pruning), never the float vectors.
        # Approximate like any PQ score; rank/tie-break identical to
        # the exact path's shape.
        if "pq" not in meta:
            raise ValueError(
                "adc=True needs an index built with ivf_build(pq_m=...)"
            )
        pqm = meta["pq"]
        cb = np.array(pqm["codebooks"], dtype=np.float64)
        m, _k_codes, dsub = cb.shape
        luts = np.empty((len(qpdf), m, _k_codes), dtype=np.float64)
        for mi in range(m):
            qs = qx[:, mi * dsub:(mi + 1) * dsub]
            luts[:, mi, :] = _seq_dot(qs[:, None, :], cb[mi][None, :, :])
        lut_of = {
            int(v): luts[i] for i, v in enumerate(qpdf["vec_id"])
        }
        # residual codes decode as c[cell] + Σ cb[code], so the score
        # gains a per-(query, cell) offset q·c[cell] — an O(n_q ×
        # n_centroids) table computed once on the driver and captured
        # by the kernel closure (a few KB; the per-candidate work is
        # still one LUT gather + one offset gather).
        residual = bool(pqm.get("residual"))
        off_of = (
            {int(v): (qx @ c.T)[i] for i, v in enumerate(qpdf["vec_id"])}
            if residual
            else None
        )

        def _adc_kernel(batches):
            for pdf in batches:
                if not len(pdf):
                    yield pd.DataFrame(
                        {
                            "query_id": pd.Series(dtype="int64"),
                            "vec_id": pd.Series(dtype="int64"),
                            "score": pd.Series(dtype="float64"),
                        }
                    )
                    continue
                codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
                scores = np.empty(len(pdf), dtype=np.float64)
                qcol = pdf["query_id"].to_numpy(np.int64)
                cells = (
                    pdf["cell"].to_numpy(np.int64)
                    if off_of is not None
                    else None
                )
                for qid in np.unique(qcol):
                    sel = qcol == qid
                    lut = lut_of[int(qid)]
                    s = lut[0, codes[sel, 0]]
                    for mi in range(1, m):
                        s = s + lut[mi, codes[sel, mi]]
                    if off_of is not None:
                        s = s + off_of[int(qid)][cells[sel]]
                    scores[sel] = s
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].astype("int64"),
                        "vec_id": pdf["vec_id"].astype("int64"),
                        "score": scores,
                    }
                )

        cand = (
            assigned.filter(F.col("cell").isin(probe_cells))
            .select("vec_id", "cell", "codes")
            .join(F.broadcast(probe_df), "cell")
        )
        if exclude_self:
            cand = cand.filter(F.col("vec_id") != F.col("query_id"))
        kcols = ["query_id", "vec_id", "codes"] + (
            ["cell"] if residual else []
        )
        scored = cand.select(*kcols).mapInPandas(
            _adc_kernel, "query_id long, vec_id long, score double"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("vec_id")
        )
        if rerank is not None:
            # IVFADC+R: gather the bounded shortlist (R·|queries|
            # rows — same order as the result gather itself), then
            # exact-rerank those ids' float vectors.  The sidecar
            # read pushes vec_id IN (...) into the scan; vectors/ is
            # range-partitioned AND sorted by vec_id, so row-group
            # stats prune it to O(shortlist) I/O.
            short = (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= rerank)
                .select("query_id", "vec_id")
                .collect()
            )
            pair_df = spark.createDataFrame(
                [(int(r.query_id), int(r.vec_id)) for r in short]
                or spark.sparkContext.emptyRDD(),
                "query_id long, vec_id long",
            )
            ids = sorted({int(r.vec_id) for r in short})
            vdir = os.path.join(out_dir, "vectors")
            vsrc = (
                spark.read.parquet(vdir)
                if os.path.isdir(vdir)
                else assigned  # legacy index: full-scan fallback
            )
            cand2 = (
                vsrc.filter(F.col("vec_id").isin(ids))
                .select("vec_id", vec_col, "norm")
                .join(F.broadcast(pair_df), "vec_id")
                .join(F.broadcast(q), "query_id")
            )
            return _rank_topk(cand2, k, vec_col)
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "vec_id",
                F.round("score", 6).alias("cos"),
                F.col("rank").cast("int").alias("rank"),
            )
        )
    cand = (
        assigned.filter(F.col("cell").isin(probe_cells))
        .join(F.broadcast(probe_df), "cell")
        .join(F.broadcast(q), "query_id")
    )
    if exclude_self:
        cand = cand.filter(F.col("vec_id") != F.col("query_id"))
    return _rank_topk(cand, k, vec_col)


def ivf_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k in one call: corpus vectors bucketed by
    nearest centroid (coarse quantizer), each query scans only its
    ``n_probe`` nearest cells, ranked by exact cosine.  Approximate
    (recall < 1).  Convenience/test shape — it recomputes the k-means
    and the full-corpus assignment on EVERY call; production use is
    :func:`ivf_build` once + :func:`ivf_query` per batch, which is
    this exact plan minus the per-call corpus pass."""
    import numpy as np

    base = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    c = kmeans_centroids(base, n_centroids, vec_col=vec_col)
    assigned = with_norm(ivf_assign(base, c, vec_col), vec_col)

    qpdf = (
        base.filter(F.col("vec_id").isin(list(query_ids)))
        .select("vec_id", vec_col)
        .toPandas()
    )
    qx = np.array(qpdf[vec_col].tolist(), dtype=np.float64)
    qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qx @ c.T), axis=1)[:, :n_probe]
    spark = base.sparkSession
    probe_df = spark.createDataFrame(
        [
            (int(qid), int(cell))
            for qid, row in zip(qpdf["vec_id"], probes)
            for cell in row
        ],
        "query_id long, cell int",
    )
    q = assigned.join(
        F.broadcast(
            spark.createDataFrame(
                [(int(i),) for i in query_ids], "query_id long"
            )
        ),
        F.col("vec_id") == F.col("query_id"),
    ).select(
        "query_id",
        F.col(vec_col).alias("qv"),
        F.col("norm").alias("qn"),
    )
    cand = (
        assigned.join(F.broadcast(probe_df), "cell")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    return _rank_topk(cand, k, vec_col)


def ivf_flat_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k with a *deterministic seed quantizer*:
    centroids are the ``n_centroids`` lowest-id vectors (normalized
    implicitly by dividing by norms), assignment is argmax cosine, and
    each query probes its ``n_probe`` nearest cells.  The whole plan is
    Catalyst expressions (the sequential-fold ``_dot``), so it has an
    exact DuckDB mirror (:func:`ivf_flat_topk_sql`) and passes the
    driver's value-hash gate — the verifiable IVF.  The k-means
    quantizer (:func:`ivf_build` / :func:`ivf_ann_topk`) is the
    recall-tuned production path; its *plumbing* (probe join shape,
    cell-pruned candidate set) is identical to this one.

    Scale shape (r7, guide §2.3): the assignment window no longer
    carries the embeddings — the crossJoin projects down to
    (vec_id, cos_c, cell) BEFORE the per-vec_id argmax window, so the
    corpus x n_centroids exchange moves 24-byte rows instead of rows
    that also carry a float vector per side; the chosen (vec_id, cell)
    pairs then re-attach to the vectors by an id join (the guide §8
    decide-on-small-rows / move-big-rows-once discipline).  The cosine
    expressions and the ``row_number() over (cos desc, cell asc) = 1``
    pick are unchanged, so assignments are bit-identical; the probe
    join then touches ~n_probe/n_centroids of the corpus per query."""
    from pyspark.sql import Window

    from chearch_spark.functions.parallel import spread_small_scan

    base = spread_small_scan(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    )
    e = with_norm(base, vec_col)
    w_cent = Window.orderBy("vec_id")
    cent = (
        e.orderBy("vec_id")
        .limit(n_centroids)
        .select(
            (F.row_number().over(w_cent) - 1).alias("cell"),
            F.col(vec_col).alias("cv"),
            F.col("norm").alias("cn"),
        )
    )
    cos_cent = _dot(F.col(vec_col), F.col("cv")) / (
        F.col("norm") * F.col("cn")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_c"), F.asc("cell")
    )
    cells = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", cos_cent.alias("cos_c"), "cell")
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )
    assigned = e.join(cells, "vec_id").select(
        "vec_id", vec_col, "norm", "cell"
    )
    q = e.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("norm").alias("qn"),
    )
    cos_probe = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cos_p"), F.asc("cell")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", cos_probe.alias("cos_p"), "cell")
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell")
    )
    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    return _rank_topk(cand, k, vec_col)


def ivf_flat_topk_sql(
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of :func:`ivf_flat_topk` (same seed centroids,
    same argmax ties — cos desc, cell asc — same probe set)."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e
), cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         v AS cv, norm AS cn
  FROM n ORDER BY vec_id LIMIT {n_centroids}
), assigned AS (
  SELECT vec_id, v, norm, cell FROM (
    SELECT n.vec_id, n.v, n.norm, c.cell,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, c.cv) / (n.norm * c.cn) DESC,
                      c.cell ASC) AS rn
    FROM n CROSS JOIN cent c
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qn
  FROM n WHERE vec_id IN ({ids})
), probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC,
                      c.cell ASC) AS rn
    FROM q CROSS JOIN cent c
  ) WHERE rn <= {n_probe}
), cand AS (
  SELECT p.query_id, a.vec_id, a.v, a.norm
  FROM assigned a JOIN probes p ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id
), scored AS (
  SELECT c.query_id, c.vec_id,
         list_dot_product(q.qv, c.v) / (q.qn * c.norm) AS cos
  FROM cand c JOIN q ON q.query_id = c.query_id
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def _infer_dim(emb: DataFrame, vec_col: str) -> int:
    row = emb.select(F.size(vec_col).alias("d")).first()
    if row is None or row.d is None or row.d <= 0:
        raise ValueError(f"cannot infer embedding dimension from {vec_col!r}")
    return int(row.d)


def lsh_signature(
    emb: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Adds per-band bucket columns ``band0..band{B-1}``: each band is
    the sign-bit pattern of ROWS hyperplane projections.  JVM-side
    (zip_with/aggregate) — no Python, no shuffle."""
    # a wrong dim silently nulls every projection (zip_with pads with
    # nulls), collapsing every vector into one bucket — infer from data
    if dim is None:
        dim = _infer_dim(emb, vec_col)
    out = emb
    v = F.col(vec_col)
    for b in range(LSH_BANDS):
        bits = []
        for r in range(LSH_ROWS):
            p = b * LSH_ROWS + r
            proj = _dot(v, _plane_lit(p, dim))
            bits.append(
                F.when(proj >= 0, F.lit(1 << r)).otherwise(F.lit(0))
            )
        band = bits[0]
        for x in bits[1:]:
            band = band + x
        out = out.withColumn(f"band{b}", band.cast("int"))
    return out


def lsh_ann_topk_sql(
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of :func:`lsh_ann_topk`: the md5-pinned hyperplanes
    are emitted as SQL literals, band signatures recomputed from the
    same sign tests, candidates deduplicated on (query_id, vec_id) —
    equivalent to the Spark plan's distinct over rows that also carry
    the (functionally dependent) vectors."""
    ids = ", ".join(str(i) for i in query_ids)
    band_exprs = []
    for b in range(LSH_BANDS):
        cases = " + ".join(
            f"CASE WHEN list_dot_product(v, {_plane_sql(b * LSH_ROWS + r, dim)})"
            f" >= 0 THEN {1 << r} ELSE 0 END"
            for r in range(LSH_ROWS)
        )
        band_exprs.append(f"SELECT vec_id, {b} AS band, ({cases}) AS bv FROM n")
    bands = "\n  UNION ALL\n  ".join(band_exprs)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e
), bands AS (
  {bands}
), q AS (
  SELECT vec_id AS query_id, band AS qband, bv AS qbv
  FROM bands WHERE vec_id IN ({ids})
), cand AS (
  SELECT DISTINCT q.query_id, b.vec_id
  FROM bands b
  JOIN q ON b.band = q.qband AND b.bv = q.qbv AND b.vec_id <> q.query_id
), scored AS (
  SELECT c.query_id, c.vec_id,
         list_dot_product(nq.v, nv.v) / (nq.norm * nv.norm) AS cos
  FROM cand c
  JOIN n nq ON nq.vec_id = c.query_id
  JOIN n nv ON nv.vec_id = c.vec_id
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def _plane_sql(p: int, dim: int) -> str:
    return "[" + ", ".join(repr(_plane_value(p, d)) for d in range(dim)) + "]"


def lsh_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Recall instrumentation for the approximate path, computed
    in-plan: per query, how much of the EXACT top-k the LSH ANN
    recovered — (query_id, n_exact, n_hit, recall).  This is the
    quality gate a production ANN deployment monitors; both inputs are
    deterministic, so the whole measurement has an exact DuckDB mirror
    (:func:`lsh_recall_sql`)."""
    ex = cosine_topk(emb, query_ids, k, vec_col, id_col).select(
        "query_id", "vec_id"
    )
    ap = lsh_ann_topk(emb, query_ids, k, vec_col, id_col, dim).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    return (
        ex.join(ap, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("n_hit"),
        )
        .withColumn(
            "recall", F.round(F.col("n_hit") / F.col("n_exact"), 6)
        )
        .select("query_id", "n_exact", "n_hit", "recall")
    )


def lsh_recall_sql(
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of :func:`lsh_recall` — composes the exact and
    LSH mirrors as derived tables."""
    ex = cosine_topk_sql(query_ids, k, table)
    ap = lsh_ann_topk_sql(query_ids, k, dim, table)
    return f"""
WITH ex AS (SELECT query_id, vec_id FROM ({ex})),
ap AS (SELECT query_id, vec_id FROM ({ap}))
SELECT ex.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.vec_id) AS BIGINT) AS n_hit,
       round(CAST(count(ap.vec_id) AS DOUBLE) / count(*), 6) AS recall
FROM ex
LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.vec_id = ex.vec_id
GROUP BY ex.query_id
"""


def ivf_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall of the verifiable IVF path (:func:`ivf_flat_topk`) vs the
    exact top-k, computed in-plan: (query_id, n_exact, n_hit, recall).
    The IVF twin of :func:`lsh_recall` — the quality gauge a production
    deployment watches when tuning n_probe; deterministic, so it has
    an exact DuckDB mirror (:func:`ivf_recall_sql`)."""
    ex = cosine_topk(emb, query_ids, k, vec_col, id_col).select(
        "query_id", "vec_id"
    )
    ap = ivf_flat_topk(
        emb, query_ids, k, n_centroids, n_probe, vec_col, id_col
    ).select("query_id", "vec_id", F.lit(1).alias("hit"))
    return (
        ex.join(ap, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("n_hit"),
        )
        .withColumn(
            "recall", F.round(F.col("n_hit") / F.col("n_exact"), 6)
        )
        .select("query_id", "n_exact", "n_hit", "recall")
    )


def ivf_recall_sql(
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of :func:`ivf_recall` (composed mirrors)."""
    ex = cosine_topk_sql(query_ids, k, table)
    ap = ivf_flat_topk_sql(query_ids, k, n_centroids, n_probe, table)
    return f"""
WITH ex AS (SELECT query_id, vec_id FROM ({ex})),
ap AS (SELECT query_id, vec_id FROM ({ap}))
SELECT ex.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.vec_id) AS BIGINT) AS n_hit,
       round(CAST(count(ap.vec_id) AS DOUBLE) / count(*), 6) AS recall
FROM ex
LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.vec_id = ex.vec_id
GROUP BY ex.query_id
"""


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing ≥ 1 LSH band
    bucket with the query, ranked by exact cosine.  May return < k
    rows per query (recall < 1 by design; deterministic given the
    pinned planes, so :func:`lsh_ann_topk_sql` mirrors it exactly).

    r7 (guide §2.3 / §8): the candidate dedup runs on NARROW
    (query_id, vec_id) id pairs — the oracle's own ``SELECT DISTINCT
    q.query_id, b.vec_id`` shape — instead of rows that also carry
    both float vectors and norms; the (functionally dependent)
    vectors re-attach by id join after the distinct, so the widest
    exchange of the plan moves 16 bytes per candidate, not two
    embeddings."""
    from chearch_spark.functions.parallel import spread_small_scan

    base = spread_small_scan(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    )
    sig = lsh_signature(base, vec_col, dim)
    bands = sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"band{b}").alias("bv")
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.bv")
    q = bands.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col("band").alias("qband"),
        F.col("bv").alias("qbv"),
    )
    pairs = (
        bands.join(
            F.broadcast(q),
            (F.col("band") == F.col("qband"))
            & (F.col("bv") == F.col("qbv"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    e = with_norm(base, vec_col)
    qe = e.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("norm").alias("qn"),
    )
    cand = pairs.join(e, "vec_id").join(F.broadcast(qe), "query_id")
    return _rank_topk(cand, k, vec_col)


# ---------------------------------------------------------------------
# Product quantization (IVF-PQ's code path), Jégou, Douze, Schmid,
# "Product Quantization for Nearest Neighbor Search" (TPAMI 2011) —
# re-expressed as Spark plans.  PQ is the 100 TB memory/scan win: a
# D-dim float32 vector (4D bytes) compresses to M uint8 codes, and
# queries score candidates via ADC lookup tables without touching the
# original vectors.  Same verifiable/production split as IVF:
#
# * :func:`pq_flat_topk` — SEED codebooks (sub-slices of the k_codes
#   lowest-id vectors, normalized — derived in-plan from the data, no
#   training), so the whole path is deterministic and has an exact
#   DuckDB mirror (:func:`pq_flat_topk_sql`) + a recall gauge
#   (:func:`pq_recall`), both value-hash-gated in pytest.
# * :func:`pq_train` / :func:`pq_ann_topk` — per-subspace k-means
#   codebooks over the md5-ordered driver sample (deterministic, no
#   RNG state), recall-floored in pytest (spec.PQ_RECALL_FLOOR).
#
# Float parity: every dot/sum that must match DuckDB is computed as an
# explicit SEQUENTIAL fold (a d-loop of vectorized adds) — numpy's
# np.sum/np.dot use 8-way-unrolled pairwise summation whose grouping
# differs from DuckDB's sequential list_dot_product in the last ulp,
# which a value-hash gate cannot tolerate.

# (PQ_M / PQ_CODES are defined at the top of the module — ivf_build's
# signature references them.)


def _seq_dot(a, b):
    """Sequential-fold dot over the LAST axis (broadcasting allowed):
    bit-matches DuckDB's list_dot_product / Catalyst's aggregate fold,
    unlike np.sum/np.dot (pairwise summation)."""
    s = a[..., 0] * b[..., 0]
    for d in range(1, a.shape[-1]):
        s = s + a[..., d] * b[..., d]
    return s


def _normalize_rows(x):
    import numpy as np

    n = np.sqrt(_seq_dot(x, x))
    return x / np.maximum(n, 1e-12)[..., None]


def pq_seed_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    k_codes: int = PQ_CODES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """(m, k_codes, dim/m) float64 SEED codebooks: sub-slices of the
    ``k_codes`` lowest-id vectors, unit-normalized — the training-free
    quantizer that makes :func:`pq_flat_topk` exactly mirrorable (the
    SQL derives the identical codebooks from the table).  Driver cost:
    ``k_codes`` rows."""
    import numpy as np

    rows = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
        .orderBy("vec_id")
        .limit(k_codes)
        .collect()
    )
    if len(rows) < k_codes:
        raise ValueError(
            f"pq_seed_codebooks needs >= k_codes={k_codes} vectors, "
            f"got {len(rows)} — lower k_codes (and keep the SQL "
            "mirror's k_codes in sync) or use a larger corpus"
        )
    x = np.array([list(r[1]) for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    xn = _normalize_rows(x)
    return (
        xn.reshape(k_codes, m, dim // m).transpose(1, 0, 2).copy()
    )


def pq_train(
    emb: DataFrame,
    m: int = PQ_M,
    k_codes: int = PQ_CODES,
    sample: int = 512,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_order: str = "hash",
):
    """Per-subspace k-means codebooks over the md5-ordered driver
    sample (same determinism story as :func:`kmeans_centroids`: no RNG
    state, init = first ``k_codes`` sample sub-vectors, fixed
    iterations).  At 100 TB the sample is O(100k) vectors — the one
    driver-side step of a PQ deployment."""
    import numpy as np

    from chearch_spark.functions.hashing import md5_long

    key = (
        md5_long(F.col(id_col)) if sample_order == "hash"
        else F.col(id_col)
    )
    pdf = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
        .orderBy(key, F.col(id_col))
        .limit(sample)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if len(x) < k_codes:
        raise ValueError(
            f"pq_train needs >= k_codes={k_codes} sample vectors, got "
            f"{len(x)} — lower k_codes or raise sample"
        )
    xn = _normalize_rows(x)
    return _pq_kmeans(xn, m, k_codes, iters)


def _pq_kmeans(xv, m: int, k_codes: int, iters: int):
    """Per-subspace k-means over pre-prepared training vectors
    (normalized vectors for plain PQ, residuals for IVFADC) —
    deterministic: init = first ``k_codes`` sub-vectors, fixed
    iterations, no RNG state."""
    import numpy as np

    dim = xv.shape[1]
    dsub = dim // m
    out = np.empty((m, k_codes, dsub), dtype=np.float64)
    for mi in range(m):
        xs = xv[:, mi * dsub:(mi + 1) * dsub]
        c = xs[:k_codes].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k_codes):
                members = xs[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        out[mi] = c
    return out


def pq_train_residual(
    emb: DataFrame,
    centroids,
    m: int = PQ_M,
    k_codes: int = PQ_CODES,
    sample: int = 512,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_order: str = "hash",
):
    """Codebooks over coarse-quantization RESIDUALS — the actual
    IVFADC formulation (Jégou et al., TPAMI 2011 §III.C: quantize
    ``x − q_coarse(x)``, not ``x``): each sample vector is normalized,
    assigned to its nearest centroid, and the per-subspace k-means
    runs on ``x̂ − c[cell]``.  Residual magnitudes are a fraction of
    the vector's, so the same code budget spends its resolution on
    the within-cell detail the coarse quantizer lost — the recall
    lever over vanilla code-the-vector PQ.  Same determinism story as
    :func:`pq_train` (md5-ordered sample, seeded init, fixed
    iterations)."""
    import numpy as np

    from chearch_spark.functions.hashing import md5_long

    key = (
        md5_long(F.col(id_col)) if sample_order == "hash"
        else F.col(id_col)
    )
    pdf = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
        .orderBy(key, F.col(id_col))
        .limit(sample)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if len(x) < k_codes:
        raise ValueError(
            f"pq_train_residual needs >= k_codes={k_codes} sample "
            f"vectors, got {len(x)} — lower k_codes or raise sample"
        )
    c = np.asarray(centroids, dtype=np.float64)
    xn = _normalize_rows(x)
    cell = (xn @ c.T).argmax(axis=1)
    return _pq_kmeans(xn - c[cell], m, k_codes, iters)


def pq_encode(
    emb: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, codes array<int>) — each vector unit-normalized then
    quantized per subspace to argmax(dot(x_m, c_j) - 0.5*dot(c_j,c_j))
    (= argmin L2, in the exact float form the SQL mirror uses), ties
    to the lowest code.  Arrow-batched kernel; the corpus is never
    shuffled.  At scale the codes column (m small ints) is the
    persisted index payload — a ~4D/m-fold reduction over the raw
    vectors."""
    import numpy as np
    import pandas as pd

    cb = np.asarray(codebooks, dtype=np.float64)
    m, k_codes, dsub = cb.shape
    half_c2 = 0.5 * _seq_dot(cb, cb)  # (m, k)

    def _kernel(batches):
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(x):
                xn = _normalize_rows(x)
                codes = np.empty((len(x), m), dtype=np.int32)
                for mi in range(m):
                    xs = xn[:, mi * dsub:(mi + 1) * dsub]
                    s = _seq_dot(xs[:, None, :], cb[mi][None, :, :])
                    codes[:, mi] = (s - half_c2[mi][None, :]).argmax(
                        axis=1
                    )
                code_lists = list(codes)
            else:
                code_lists = []
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "codes": [list(map(int, c)) for c in code_lists],
                }
            )

    return emb.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        _kernel, "vec_id long, codes array<int>"
    )


def _pq_adc_topk(
    emb: DataFrame,
    codebooks,
    query_ids: list[int],
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Shared ADC scorer: encode the corpus, precompute per-query
    lookup tables driver-side (n_q × m × k_codes partial dots), score
    every code row inside an Arrow kernel (a LUT gather + sequential
    m-fold — the original vectors are never touched), emit each
    partition's per-query top-k, then one global rank.  Scale shape:
    no corpus shuffle, the exchange carries ≤ partitions × queries × k
    rows."""
    import numpy as np
    import pandas as pd

    cb = np.asarray(codebooks, dtype=np.float64)
    m, k_codes, dsub = cb.shape
    qrows = (
        emb.filter(F.col(id_col).isin([int(i) for i in query_ids]))
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col))
        .collect()
    )
    q_ids = np.array([int(r.vec_id) for r in qrows], dtype=np.int64)
    qx = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = _normalize_rows(qx) if len(qx) else qx
    # LUT[(query, m, j)] = seq-dot(q_m, c_j)
    luts = np.empty((len(q_ids), m, k_codes), dtype=np.float64)
    for mi in range(m):
        qs = qn[:, mi * dsub:(mi + 1) * dsub]
        luts[:, mi, :] = _seq_dot(qs[:, None, :], cb[mi][None, :, :])

    codes_df = pq_encode(emb, codebooks, vec_col, id_col)

    def _kernel(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(np.int64)
            if not len(ids) or not len(q_ids):
                yield pd.DataFrame(
                    {
                        "query_id": pd.Series(dtype="int64"),
                        "vec_id": pd.Series(dtype="int64"),
                        "score": pd.Series(dtype="float64"),
                    }
                )
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            # sequential m-fold of LUT gathers (order = SQL's explicit
            # left-assoc sum)
            s = luts[:, 0, codes[:, 0]]
            for mi in range(1, m):
                s = s + luts[:, mi, codes[:, mi]]
            out = {"query_id": [], "vec_id": [], "score": []}
            kk = min(k, len(ids))
            for qi in range(len(q_ids)):
                sq = s[qi]
                mask = ids != q_ids[qi]
                order = np.lexsort((ids[mask], -sq[mask]))[:kk]
                sel_ids = ids[mask][order]
                sel_s = sq[mask][order]
                out["query_id"].extend([int(q_ids[qi])] * len(order))
                out["vec_id"].extend(int(i) for i in sel_ids)
                out["score"].extend(float(v) for v in sel_s)
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out["query_id"], dtype="int64"),
                    "vec_id": pd.Series(out["vec_id"], dtype="int64"),
                    "score": pd.Series(out["score"], dtype="float64"),
                }
            )

    scored = codes_df.mapInPandas(
        _kernel, "query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_flat_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    k_codes: int = PQ_CODES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ/ADC approximate top-k with SEED codebooks — the verifiable
    PQ (exact DuckDB mirror :func:`pq_flat_topk_sql`).  Approximate by
    design (scores are quantized reconstructions), fully
    deterministic."""
    cb = pq_seed_codebooks(emb, m, k_codes, vec_col, id_col)
    return _pq_adc_topk(emb, cb, query_ids, k, vec_col, id_col)


def pq_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    k_codes: int = PQ_CODES,
    sample: int = 512,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks=None,
) -> DataFrame:
    """PQ/ADC approximate top-k with k-means-TRAINED codebooks (or
    caller-provided ones) — the recall-tuned production path;
    deterministic (md5-ordered sample) but not SQL-mirrorable, so it
    is gated by the :func:`pq_recall` floor in pytest instead."""
    if codebooks is None:
        codebooks = pq_train(
            emb, m, k_codes, sample, iters, vec_col, id_col
        )
    return _pq_adc_topk(emb, codebooks, query_ids, k, vec_col, id_col)


def pq_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    k_codes: int = PQ_CODES,
    trained: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall of the PQ path vs the exact top-k, computed in-plan:
    (query_id, n_exact, n_hit, recall).  ``trained=False`` (seed
    codebooks) has the exact DuckDB mirror (:func:`pq_recall_sql`);
    ``trained=True`` is the pytest-floored production gauge."""
    ex = cosine_topk(emb, query_ids, k, vec_col, id_col).select(
        "query_id", "vec_id"
    )
    ap = (
        pq_ann_topk(emb, query_ids, k, m, k_codes,
                    vec_col=vec_col, id_col=id_col)
        if trained
        else pq_flat_topk(emb, query_ids, k, m, k_codes, vec_col, id_col)
    ).select("query_id", "vec_id", F.lit(1).alias("hit"))
    return (
        ex.join(ap, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("n_hit"),
        )
        .withColumn(
            "recall", F.round(F.col("n_hit") / F.col("n_exact"), 6)
        )
        .select("query_id", "n_exact", "n_hit", "recall")
    )


def pq_flat_topk_sql(
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    k_codes: int = PQ_CODES,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of :func:`pq_flat_topk`: derives the identical
    seed codebooks from the table, encodes with the same
    argmax(dot - 0.5*c·c) form, and sums the ADC terms in the same
    explicit left-associative subspace order."""
    ids = ", ".join(str(i) for i in query_ids)
    dsub = dim // m
    slices = [(mi, mi * dsub + 1, (mi + 1) * dsub) for mi in range(m)]
    grid = ", ".join(f"({mi}, {a}, {b})" for mi, a, b in slices)
    code_cols = ", ".join(
        f"max(CASE WHEN m = {mi} THEN j END) AS j{mi}"
        for mi, _a, _b in slices
    )
    seed_joins = "\n".join(
        f"JOIN seed s{mi} ON s{mi}.j = p.j{mi}" for mi, _a, _b in slices
    )
    adc_terms = " + ".join(
        f"list_dot_product(list_slice(q.qn, {a}, {b}), "
        f"list_slice(s{mi}.c, {a}, {b}))"
        for mi, a, b in slices
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
), n AS (
  SELECT vec_id,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
  FROM e
), seed AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, vn AS c
  FROM (SELECT vec_id, vn FROM n ORDER BY vec_id LIMIT {k_codes})
), g(m, a, b) AS (VALUES {grid}),
enc AS (
  SELECT vec_id, m, j,
         row_number() OVER (
           PARTITION BY vec_id, m ORDER BY score DESC, j ASC
         ) AS rn
  FROM (
    SELECT n.vec_id, g.m, s.j,
           list_dot_product(list_slice(n.vn, g.a, g.b),
                            list_slice(s.c, g.a, g.b))
           - 0.5 * list_dot_product(list_slice(s.c, g.a, g.b),
                                    list_slice(s.c, g.a, g.b)) AS score
    FROM n, g, seed s
  )
), p AS (
  SELECT vec_id, {code_cols} FROM enc WHERE rn = 1 GROUP BY vec_id
), q AS (
  SELECT vec_id AS query_id, vn AS qn FROM n WHERE vec_id IN ({ids})
), adc AS (
  SELECT q.query_id, p.vec_id, {adc_terms} AS score
  FROM p
  {seed_joins}
  , q
  WHERE p.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rank
  FROM adc
)
SELECT query_id, vec_id, round(score, 6) AS score,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def pq_recall_sql(
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    k_codes: int = PQ_CODES,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of :func:`pq_recall` (seed variant; composed
    mirrors)."""
    ex = cosine_topk_sql(query_ids, k, table)
    ap = pq_flat_topk_sql(query_ids, k, m, k_codes, dim, table)
    return f"""
WITH ex AS (SELECT query_id, vec_id FROM ({ex})),
ap AS (SELECT query_id, vec_id FROM ({ap}))
SELECT ex.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.vec_id) AS BIGINT) AS n_hit,
       round(CAST(count(ap.vec_id) AS DOUBLE) / count(*), 6) AS recall
FROM ex
LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.vec_id = ex.vec_id
GROUP BY ex.query_id
"""


# --- scalar quantization (SQ8) -------------------------------------------
#
# FAISS-style per-dimension 8-bit scalar quantization: code_d =
# round((x_d - min_d) / scale_d) with scale_d = (max_d - min_d)/255 —
# 4x smaller than float32 rows, decoded on the fly at query time
# (asymmetric: raw query vector vs decoded corpus).  Unlike PQ's
# sampled k-means, the trained parameters here are EXACT per-dimension
# min/max aggregations — deterministic on any engine — so the whole
# path (train + encode + decode + score) has an exact DuckDB mirror
# and rides the hash gate, with no seed-vs-trained split needed.
# Complements PQ: SQ8 keeps per-dimension resolution (better recall,
# 4x shrink); PQ trades resolution for 26x shrink.

SQ_LEVELS = 255  # 8-bit code range 0..255


# above this dimensionality the 2*dim-agg-column plan stresses Janino
# codegen (wide projections compile quadratically); the posexplode
# path shuffles only (dim, min, max) partials — identical exact result
SQ_BOUNDS_JVM_MAX_DIM = 256


def sq_bounds(
    emb: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (min, scale) over the corpus, returned as a 1-row
    (mins, scales) DF to broadcast.  min/max are exact (no float
    summation), so both engines derive bit-identical bounds from the
    same data regardless of computation strategy.

    Two plans, same exact result: dim <= ``SQ_BOUNDS_JVM_MAX_DIM``
    uses ONE map-side-combined pass of 2*dim scalar aggs (no shuffle);
    real embedding dims (768-4096) would blow up whole-stage codegen
    with thousands of agg columns, so larger dims posexplode to
    (d, v) rows — map-side partial min/max per dimension, a
    dim-row shuffle (KBs), and an in-plan array rebuild."""
    if dim <= SQ_BOUNDS_JVM_MAX_DIM:
        v = F.col(vec_col)
        aggs = [
            F.min(F.element_at(v, i + 1).cast("double")).alias(f"_mn{i}")
            for i in range(dim)
        ] + [
            F.max(F.element_at(v, i + 1).cast("double")).alias(f"_mx{i}")
            for i in range(dim)
        ]
        return emb.agg(*aggs).select(
            F.array(*[F.col(f"_mn{i}") for i in range(dim)]).alias(
                "mins"
            ),
            F.array(
                *[
                    (F.col(f"_mx{i}") - F.col(f"_mn{i}"))
                    / F.lit(float(SQ_LEVELS))
                    for i in range(dim)
                ]
            ).alias("scales"),
        )
    ex = emb.select(F.posexplode(F.col(vec_col)).alias("d", "_v"))
    per_dim = ex.groupBy("d").agg(
        F.min(F.col("_v").cast("double")).alias("mn"),
        F.max(F.col("_v").cast("double")).alias("mx"),
    )
    packed = per_dim.select(
        F.struct("d", "mn", "mx").alias("s")
    ).agg(F.sort_array(F.collect_list("s")).alias("ss"))
    return packed.select(
        F.transform(F.col("ss"), lambda s: s["mn"]).alias("mins"),
        F.transform(
            F.col("ss"),
            lambda s: (s["mx"] - s["mn"]) / F.lit(float(SQ_LEVELS)),
        ).alias("scales"),
    )


def _sq_code(x, i):
    """Quantize one component given broadcast (mins, scales) columns:
    clip(floor((x - mn)/sc + 0.5), 0, 255); degenerate (constant)
    dimensions quantize to 0.  All-double arithmetic in the exact
    order the DuckDB mirror uses."""
    mn = F.element_at(F.col("mins"), i + F.lit(1))
    sc = F.element_at(F.col("scales"), i + F.lit(1))
    q = F.floor((x.cast("double") - mn) / sc + F.lit(0.5))
    return (
        F.when(sc == F.lit(0.0), F.lit(0.0))
        .otherwise(F.least(F.greatest(q, F.lit(0.0)), F.lit(255.0)))
        .cast("int")
    )


def sq_encode(
    emb: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, codes array<int> in 0..255) — int codes bit-pack to
    ~1 byte/component in parquet (values <= 255), the 4x scan-byte
    win.  Bounds ride a 1-row broadcast; encoding is a pure JVM
    projection (no kernel, no shuffle)."""
    b = sq_bounds(emb, dim, vec_col)
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col)
    ).crossJoin(F.broadcast(b))
    codes = F.transform(F.col(vec_col), lambda x, i: _sq_code(x, i))
    return base.select("vec_id", codes.alias("codes"))


def sq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric SQ8 top-k: raw query vectors against the decoded
    (quantized) corpus — (query_id, vec_id, cos, rank), same tie-break
    and rounding as every ANN path.  Approximate like any SQ score,
    yet fully deterministic: exact DuckDB mirror in
    :func:`sq_topk_sql`, recall gauge in :func:`sq_recall`.

    Plan shape: one agg pass for bounds (broadcast 1 row), one corpus
    projection encode+decode (JVM transform, codes materialized in a
    separate select — the Catalyst HOF-inlining trap), broadcast
    query side, per-partition partial top-k under the final window.
    The corpus is never shuffled."""
    b = sq_bounds(emb, dim, vec_col)
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col)
    ).crossJoin(F.broadcast(b))
    codes = F.transform(F.col(vec_col), lambda x, i: _sq_code(x, i))
    enc = base.select("vec_id", "mins", "scales", codes.alias("codes"))
    xhat = F.transform(
        F.col("codes"),
        lambda c, i: F.element_at(F.col("mins"), i + F.lit(1))
        + c.cast("double")
        * F.element_at(F.col("scales"), i + F.lit(1)),
    )
    dec = enc.select("vec_id", xhat.alias("xhat"))
    dec = dec.withColumn(
        "norm", F.sqrt(_dot(F.col("xhat"), F.col("xhat")))
    )
    q = (
        with_norm(
            emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col)),
            vec_col,
        )
        .filter(F.col("vec_id").isin(list(query_ids)))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col("norm").alias("qn"),
        )
    )
    cand = dec.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    return _rank_topk(cand, k, "xhat")


def sq_topk_sql(
    query_ids: list[int],
    k: int = 10,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of :func:`sq_topk`: identical bounds (exact
    min/max), identical quantize/decode expression order, the proven
    sequential-fold dot.  CAST(... AS DOUBLE) literals — bare DuckDB
    decimals would change the arithmetic."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
), comp AS (
  SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS d
  FROM e
), b AS (
  SELECT d, min(val) AS mn,
         (max(val) - min(val)) / CAST(255 AS DOUBLE) AS sc
  FROM comp GROUP BY d
), dec AS (
  SELECT comp.vec_id, comp.d,
         b.mn + (CASE WHEN b.sc = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
                 ELSE least(greatest(
                        floor((comp.val - b.mn) / b.sc + CAST(0.5 AS DOUBLE)),
                        CAST(0 AS DOUBLE)), CAST(255 AS DOUBLE)) END)
              * b.sc AS xh
  FROM comp JOIN b USING (d)
), xhat AS (
  SELECT vec_id, list(xh ORDER BY d) AS xh, 
         sqrt(list_dot_product(list(xh ORDER BY d),
                               list(xh ORDER BY d))) AS nrm
  FROM dec GROUP BY vec_id
), q AS (
  SELECT vec_id AS query_id, v AS qv,
         sqrt(list_dot_product(v, v)) AS qn
  FROM e WHERE vec_id IN ({ids})
), scored AS (
  SELECT q.query_id, h.vec_id,
         list_dot_product(q.qv, h.xh) / (q.qn * h.nrm) AS cos
  FROM xhat h JOIN q ON h.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos, 6) AS cos,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def sq_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall of SQ8 vs the exact top-k, in-plan:
    (query_id, n_exact, n_hit, recall) — exact DuckDB mirror
    (:func:`sq_recall_sql`)."""
    ex = cosine_topk(emb, query_ids, k, vec_col, id_col).select(
        "query_id", "vec_id"
    )
    ap = sq_topk(emb, query_ids, k, dim, vec_col, id_col).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    return (
        ex.join(ap, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("n_hit"),
        )
        .withColumn(
            "recall", F.round(F.col("n_hit") / F.col("n_exact"), 6)
        )
        .select("query_id", "n_exact", "n_hit", "recall")
    )


def sq_recall_sql(
    query_ids: list[int], k: int = 10, table: str = "embeddings"
) -> str:
    """DuckDB mirror of :func:`sq_recall` (composed mirrors)."""
    ex = cosine_topk_sql(query_ids, k, table)
    ap = sq_topk_sql(query_ids, k, table)
    return f"""
WITH ex AS (SELECT query_id, vec_id FROM ({ex})),
ap AS (SELECT query_id, vec_id FROM ({ap}))
SELECT ex.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.vec_id) AS BIGINT) AS n_hit,
       round(CAST(count(ap.vec_id) AS DOUBLE) / count(*), 6) AS recall
FROM ex
LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.vec_id = ex.vec_id
GROUP BY ex.query_id
"""
