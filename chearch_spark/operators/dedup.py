"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.

All content hashing goes through the engine-portable ``md5_long``
primitive (:mod:`chearch_spark.functions.hashing`), so every operator
here has a DuckDB-SQL mirror and passes the driver's value-hash gate —
the *same* bits from Spark's JVM expressions and an independent engine.

Scale design (100 TB / 10^12 docs):

* **exact**: ``groupBy(md5(text))`` — one shuffle on a 128-bit key,
  uniformly distributed by construction (no skew possible), map-side
  partial aggregation halves the shuffle.
* **MinHash+LSH**: shingle → 16 universal hashes → 8 bands × 2 rows →
  self-join on (band, band_hash).  The join key is a hash bucket, so
  only near-duplicate *clusters* co-locate; candidate verification
  (exact Jaccard) touches candidate pairs only — never O(n²).  Skew:
  a cluster of c identical docs makes c² candidate pairs in one
  bucket; that is inherent to the problem (those pairs ARE the
  output), and AQE skew-join splitting handles the bucket fan-out.
* **SimHash**: 48-bit signature, 4 × 12-bit bands.  Banding is
  pigeonhole-EXACT for hamming ≤ 3 (any pair within distance 3 agrees
  on ≥ 1 band), so the banded join returns exactly the same pairs as
  the O(n²) scan the oracle runs — an exact algorithm with a
  sub-quadratic plan.
* **n-gram Jaccard**: join on shared shingle (complete for any
  threshold > 0 because J ≥ τ > 0 implies ≥ 1 shared shingle).  Hot
  shingles (boilerplate) explode this join — that is precisely why
  the MinHash path exists; this operator is the exact verifier /
  small-scale tool.
* **embedding cosine**: all-pairs is the exact baseline (test scale);
  the scale path is the LSH-bucketed ANN in
  :mod:`chearch_spark.operators.ann`.

No Python runs per row anywhere — tokenize/shingle/hash/band are all
Catalyst expressions inside whole-stage codegen.

Algorithms are the public classics: MinHash resemblance sketching
(Broder, "On the resemblance and containment of documents", 1997) with
LSH banding (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets
ch. 3), and SimHash (Charikar, "Similarity estimation techniques from
rounding algorithms", STOC 2002; Manku et al., WWW 2007 for the
hamming-band dedup shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chearch_spark import spec
from chearch_spark.functions.hashing import (
    MINHASH_BANDS,
    MINHASH_ROWS,
    NUM_MINHASH,
    PM,
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    md5_long,
    md5_long_sql,
    minhash_col,
    minhash_sql,
)
from chearch_spark.functions.parallel import is_small_input, spread_small_scan
from chearch_spark.functions.text import TOKENS_SQL, tokens_col

SHINGLE_N = 3  # token 3-grams


# ======================================================================
# exact dedup
# ======================================================================

def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (content_md5, n_dups, min_doc_id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_duplicates_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"""
SELECT md5({text_col}) AS content_md5,
       count(*) AS n_dups,
       min(doc_id) AS min_doc_id
FROM {table}
GROUP BY md5({text_col})
HAVING count(*) > 1
"""


# ======================================================================
# shingles (shared by MinHash and Jaccard)
# ======================================================================

def shingles_col(toks: Column) -> Column:
    """Token 3-gram shingles as a JVM array expression (guarded so
    short docs yield an empty array, never a descending sequence)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (SHINGLE_N - 1))
    return F.when(
        F.size(toks) >= SHINGLE_N,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(SHINGLE_N)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, sh) shingle rows.

    The token array is materialized in its own projection BEFORE the
    shingle transform: `shingles_col` references its input ~5 times
    (size guard, sequence bound, 3 element_at per shingle), and
    Catalyst would inline the tokenizer into every reference — making
    shingling O(tokens²) per document.  A separate select keeps it a
    once-per-row column (CollapseProject declines to merge projections
    when the expression is non-trivial and multiply referenced, but
    being explicit here is what guarantees the linear plan)."""
    toks = spread_small_scan(df).select(
        "doc_id", tokens_col(F.col(text_col)).alias("toks")
    )
    return (
        toks.select(
            "doc_id", F.explode(shingles_col(F.col("toks"))).alias("sh")
        )
        .distinct()
    )


_SHINGLES_CTE = """
WITH tk AS (
  SELECT doc_id, {toks} AS toks FROM {table}
), sh0 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= {n}
                THEN list_transform(generate_series(1, len(toks) - {n1}),
                     i -> concat_ws(' ', {parts}))
                ELSE [] END) AS sh
  FROM tk
), sh AS (
  SELECT DISTINCT doc_id, sh FROM sh0
)"""


def _shingles_cte(table: str, text_col: str) -> str:
    parts = ", ".join(f"toks[i + {j}]" for j in range(SHINGLE_N))
    return _SHINGLES_CTE.format(
        toks=TOKENS_SQL.format(t=text_col),
        table=table,
        n=SHINGLE_N,
        n1=SHINGLE_N - 1,
        parts=parts,
    )


# ======================================================================
# MinHash signatures + LSH near-dup pairs
# ======================================================================

def doc_shingle_hashes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, hx) rows where hx = md5-derived 60-bit hash of
    the token 3-gram.  The MinHash path's working representation: every
    downstream exchange (signature groupBy, band self-join input,
    verification joins) shuffles an 8-byte long instead of a ~50-byte
    shingle string — the 100 TB shuffle-bytes lever.  Set identity via
    hx is pinned semantics: collisions are ~2^-60 per shingle pair
    (cryptographically negligible), and BOTH engines (Spark and the
    DuckDB oracle) compute the same hash, so results stay value-exact
    across engines by construction."""
    toks = spread_small_scan(df).select(
        "doc_id", tokens_col(F.col(text_col)).alias("toks")
    )
    ex = toks.select(
        "doc_id", F.explode(shingles_col(F.col("toks"))).alias("sh")
    )
    return ex.select(
        "doc_id", md5_long(F.col("sh")).alias("hx")
    ).distinct()


def minhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, m0..m15) MinHash signature per doc (docs with ≥ 1
    shingle).  One explode + one groupBy(doc_id) shuffle."""
    return minhash_signatures_from_shingles(doc_shingle_hashes(df, text_col))


def minhash_signatures_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    mins = ",\n         ".join(
        f"min({minhash_sql('xm', i)}) AS m{i}" for i in range(NUM_MINHASH)
    )
    return f"""{_shingles_cte(table, text_col)}
, x AS (
  SELECT doc_id, {md5_long_sql('sh')} % {PM} AS xm FROM sh
)
SELECT doc_id,
       {mins}
FROM x GROUP BY doc_id
"""


def _band_struct(sig_cols: list[str]) -> Column:
    """Array of (band, band_hash) structs from signature columns.  The
    band hash is md5-derived but carried as a LONG (not the 32-char
    md5 string): the band self-join is the operator's widest exchange,
    and 8-byte keys shuffle ~4x fewer bytes than hex strings."""
    bands = []
    for b in range(MINHASH_BANDS):
        cols = sig_cols[b * MINHASH_ROWS:(b + 1) * MINHASH_ROWS]
        bh = md5_long(F.concat_ws(",", *[F.col(c) for c in cols]))
        bands.append(F.struct(F.lit(b).alias("band"), bh.alias("bh")))
    return F.array(*bands)


def minhash_lsh_pairs(
    df: DataFrame, tau: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """LSH candidate pairs verified by exact Jaccard ≥ tau:
    (doc_a, doc_b, jaccard).  Semantics are pinned as
    "band-collision AND J ≥ tau" (deterministic, oracle-mirrorable);
    the probabilistic part is recall of the banding scheme only.
    Jaccard is computed over the md5-derived shingle-hash sets
    (:func:`doc_shingle_hashes`) — every exchange in the chain carries
    longs, never shingle strings."""
    # cached: sh feeds the signature build AND both verification joins
    # (three DIFFERENT shuffle shapes, so exchange reuse cannot help —
    # unlike ngram_jaccard, whose consumers share one join exchange and
    # therefore deliberately do NOT cache); cand feeds the intersection
    # join and the final left join.  Without these caches one count()
    # re-tokenizes the corpus up to three times inside a single action.
    # The trade-off: the cache is unowned (the caller gets a lazy plan
    # back, so there is no unpersist point).  Spark evicts under memory
    # pressure; long-lived sessions running many dedup passes over
    # DIFFERENT corpora should spark.catalog.clearCache() between them.
    sh = doc_shingle_hashes(df, text_col).cache()
    small = is_small_input(df)
    # sig cached too (r7): BOTH sides of the band self-join derive
    # from it, and the broadcast build side cannot reuse the stream
    # side's aggregation — without the cache the 16-min signature agg
    # over the shingle relation runs twice per action (the simhash
    # finding; ~(doc_id, 16 longs) per doc, the second-smallest
    # relation in the operator)
    sig = minhash_signatures_from_shingles(sh).cache()
    sig_cols = [f"m{i}" for i in range(NUM_MINHASH)]
    bands = sig.select(
        "doc_id", F.explode(_band_struct(sig_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bh")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .cache()
    )
    return _verify_jaccard(cand, sh, tau, small=small)


def minhash_signatures_from_shingles(sh: DataFrame) -> DataFrame:
    """Signatures from distinct (doc_id, hx) shingle-hash rows — the
    universal hashes permute the pre-reduced hx % PM value."""
    xm = (F.col("hx") % PM).alias("xm")
    return (
        sh.select("doc_id", xm)
        .groupBy("doc_id")
        .agg(
            *[
                F.min(minhash_col(F.col("xm"), i)).alias(f"m{i}")
                for i in range(NUM_MINHASH)
            ]
        )
    )


def _verify_jaccard(
    cand: DataFrame, sh: DataFrame, tau: float, small: bool = False
) -> DataFrame:
    # ``small``: the caller's INPUT corpus is under the spread/broadcast
    # size threshold, so the per-doc sizes aggregate (and the candidate
    # pair set) are safely broadcastable — r7 guide §3.1, same guard as
    # ngram_jaccard_pairs; False keeps the planner's scale-safe choice.
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("hx").alias("hx_a"))
    sb = sh.select(F.col("doc_id").alias("db"), F.col("hx").alias("hx_b"))
    inter = (
        cand.join(sa, "doc_a")
        .join(
            sb,
            (F.col("doc_b") == F.col("db"))
            & (F.col("hx_a") == F.col("hx_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    ca = sizes.select(F.col("doc_id").alias("doc_a"), F.col("c").alias("ca"))
    cb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("c").alias("cb"))
    if small:
        ca, cb = F.broadcast(ca), F.broadcast(cb)
    j = F.col("i").cast("double") / (F.col("ca") + F.col("cb") - F.col("i"))
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"i": 0})
        .join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_pairs_sql(
    tau: float = 0.5, table: str = "documents", text_col: str = "text"
) -> str:
    mins = ",\n         ".join(
        f"min({minhash_sql('xm', i)}) AS m{i}" for i in range(NUM_MINHASH)
    )
    band_rows = []
    for b in range(MINHASH_BANDS):
        cols = ", ".join(
            f"m{i}"
            for i in range(b * MINHASH_ROWS, (b + 1) * MINHASH_ROWS)
        )
        bh_sql = md5_long_sql(f"concat_ws(',', {cols})")
        band_rows.append(
            f"SELECT doc_id, {b} AS band, {bh_sql} AS bh FROM sig"
        )
    bands = "\n  UNION ALL\n  ".join(band_rows)
    return f"""{_shingles_cte(table, text_col)}
, shd AS (
  SELECT DISTINCT doc_id, {md5_long_sql('sh')} AS hx FROM sh
), x AS (
  SELECT doc_id, hx % {PM} AS xm FROM shd
), sig AS (
  SELECT doc_id, {mins} FROM x GROUP BY doc_id
), bands AS (
  {bands}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS c FROM shd GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN shd sa ON sa.doc_id = c.doc_a
  JOIN shd sb ON sb.doc_id = c.doc_b AND sb.hx = sa.hx
  GROUP BY c.doc_a, c.doc_b
), scored AS (
  SELECT c.doc_a, c.doc_b,
         CAST(coalesce(i.i, 0) AS DOUBLE)
           / (ca.c + cb.c - coalesce(i.i, 0)) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes ca ON ca.doc_id = c.doc_a
  JOIN sizes cb ON cb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
FROM scored WHERE jaccard >= {tau}
"""


def minhash_dedup_keep(
    df: DataFrame, tau: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Canonicalization: the documents KEPT after near-dup removal —
    for every verified pair (doc_a < doc_b, J ≥ tau) the larger id is
    dropped (greedy keep-smallest; deterministic, the standard
    MinHash-dedup policy for training corpora).  One anti-join over the
    pair set."""
    pairs = minhash_lsh_pairs(df, tau, text_col)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return df.select("doc_id").join(drop, "doc_id", "left_anti")


def minhash_dedup_keep_sql(
    tau: float = 0.5, table: str = "documents", text_col: str = "text"
) -> str:
    inner = minhash_lsh_pairs_sql(tau, table, text_col)
    return f"""
SELECT doc_id FROM {table}
WHERE doc_id NOT IN (SELECT doc_b FROM ({inner}))
"""


# ======================================================================
# exact n-gram Jaccard pairs (the verifier as a standalone operator)
# ======================================================================

def ngram_jaccard_pairs(
    df: DataFrame,
    tau: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = spec.NGRAM_MAX_SHINGLE_DF,
) -> DataFrame:
    """All pairs with shingle-Jaccard ≥ tau (tau > 0) over the shingle
    sets with document frequency ≤ ``max_shingle_df``: joins on shared
    shingles, so it is complete without an n² scan, and the pinned
    hot-shingle cap (`spec.NGRAM_MAX_SHINGLE_DF`) keeps a boilerplate
    shingle in f docs from contributing f² join rows — the cap is part
    of the semantics (mirrored in the oracle), not a lossy shortcut.
    Pass ``max_shingle_df=None`` for raw uncapped Jaccard (small
    corpora / verification only).

    r7 shuffle-bytes optimization (guide §2.3): every exchange in the
    chain — the per-doc distinct, the df-cap aggregation/join, BOTH
    sides of the shared-shingle self-join — carries the 8-byte
    md5-derived shingle hash (:func:`doc_shingle_hashes`, already the
    MinHash chain's working representation) instead of the ~30-byte
    shingle string.  Set identity via the 60-bit hash is the same
    pinned semantics the MinHash verifier relies on (collisions
    ~2^-60 per shingle pair, cryptographically negligible), so sdf
    counts, set sizes and the Jaccard values are value-identical to
    the string form the DuckDB oracle computes."""
    if tau <= 0.0:
        raise ValueError(
            "tau must be > 0 for the shared-shingle join to be complete"
        )
    # cached, the minhash_lsh_pairs precedent: sh feeds the df-cap
    # aggregation, the sizes aggregation, and BOTH sides of the
    # shared-shingle self-join.  r6 relied on exchange reuse instead
    # of a cache, but the consumers push DIFFERENT filters
    # (join-key isnotnull on some branches, none on others) below the
    # shared exchange, so the canonicalized subtrees stop matching and
    # the tokenize+shingle+distinct chain ran FOUR times per action
    # (verified in the r7 plan dump).  Same unowned-cache trade-off as
    # minhash: Spark evicts under memory pressure; long-lived sessions
    # deduping many different corpora should clearCache() between.
    sh = doc_shingle_hashes(df, text_col).cache()
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("hx")
            .agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") <= max_shingle_df)
            .select("hx")
        )
        sh = sh.join(keep, "hx")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("hx").alias("hx"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hx").alias("hx"))
    inter = (
        sa.join(sb, "hx")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    ca = sizes.select(F.col("doc_id").alias("doc_a"), F.col("c").alias("ca"))
    cb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("c").alias("cb"))
    if is_small_input(df):
        # r7 (guide §3.1): `sizes` sits behind the cap join, so
        # Catalyst's estimate for it drifts with the cap selectivity;
        # the explicit hint PINS the broadcast of this few-hundred-KB
        # per-doc relation against the 10^8-row pair stream so no
        # estimate drift can ever sort-merge it.  Guarded on the INPUT
        # estimate: a corpus too big to bound `sizes` gets no hint and
        # keeps the planner's scale-safe choice.
        ca, cb = F.broadcast(ca), F.broadcast(cb)
    j = F.col("i").cast("double") / (F.col("ca") + F.col("cb") - F.col("i"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs_sql(
    tau: float = 0.5,
    table: str = "documents",
    text_col: str = "text",
    max_shingle_df: int | None = spec.NGRAM_MAX_SHINGLE_DF,
) -> str:
    if max_shingle_df is not None:
        shf = f"""
, sdf AS (
  SELECT sh, count(*) AS sdf FROM sh GROUP BY sh
), shf AS (
  SELECT s.doc_id, s.sh
  FROM sh s JOIN sdf d ON d.sh = s.sh AND d.sdf <= {max_shingle_df}
)"""
    else:
        shf = """
, shf AS (SELECT doc_id, sh FROM sh)"""
    return f"""{_shingles_cte(table, text_col)}{shf}
, sizes AS (
  SELECT doc_id, count(*) AS c FROM shf GROUP BY doc_id
), inter AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS i
  FROM shf sa JOIN shf sb ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
), scored AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.i AS DOUBLE) / (ca.c + cb.c - i.i) AS jaccard
  FROM inter i
  JOIN sizes ca ON ca.doc_id = i.doc_a
  JOIN sizes cb ON cb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
FROM scored WHERE jaccard >= {tau}
"""


# ======================================================================
# SimHash
# ======================================================================

def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 48-bit tf-weighted SimHash (docs with ≥ 1
    token).  One explode + ONE groupBy(doc_id) shuffle; the 48
    bit-sums are codegen'd aggregate expressions.

    Terms are hashed to their 60-bit md5 value, and SimHash only ever
    consumes h, never the term string.  r7 shuffle removal (guide
    §2.4): the intermediate per-(doc_id, h) tf aggregation is gone —
    ``sum over terms of (bit ? tf : -tf)`` equals ``sum over token
    OCCURRENCES of (bit ? 1 : -1)`` (each occurrence contributes
    exactly 1 to its term's tf), so one groupBy(doc_id) over the
    exploded occurrences computes the identical integer bit-sums with
    one fewer full shuffle, and map-side partial aggregation reduces
    the remaining exchange to ~one row per (doc, map task)."""
    occ = (
        spread_small_scan(df)
        .select(
            "doc_id", F.explode(tokens_col(F.col(text_col))).alias("term")
        )
        .select("doc_id", md5_long(F.col("term")).alias("h"))
    )
    aggs = [
        F.sum(
            F.when((F.shiftright(F.col("h"), b) % 2) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    sig = occ.groupBy("doc_id").agg(*aggs)
    sim = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return sig.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_signatures_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    toks = TOKENS_SQL.format(t=text_col)
    h = md5_long_sql("term")
    sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) % 2 = 1 THEN tf ELSE -tf END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    bits = "\n       + ".join(
        f"CASE WHEN v{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS term FROM {table}
), tf AS (
  SELECT doc_id, {h} AS h, count(*) AS tf
  FROM tok GROUP BY doc_id, h
), sig AS (
  SELECT doc_id,
         {sums}
  FROM tf GROUP BY doc_id
)
SELECT doc_id,
       CAST({bits} AS BIGINT) AS simhash
FROM sig
"""


def simhash_pairs(
    df: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with hamming(simhash) ≤ max_hamming
    via a banded join.  With 4 bands and max_hamming ≤ 3 the band join
    is pigeonhole-EXACT — identical output to the O(n²) scan, at
    O(candidates) cost."""
    assert max_hamming < SIMHASH_BANDS, (
        "banded join is only exact for max_hamming < number of bands"
    )
    # r7: cached — BOTH sides of the band self-join consume sig, and
    # the broadcast build side cannot reuse the stream side's exchange,
    # so without the cache the whole tokenize+explode+48-bit-sum chain
    # ran twice per action (verified in the plan dump).  sig is 16
    # bytes per doc (doc_id, simhash) — the smallest relation in the
    # operator — so this is the cheap end of the minhash/ngram
    # unowned-cache trade-off (Spark evicts under pressure;
    # clearCache() between corpora in long-lived sessions).
    sig = simhash_signatures(df, text_col).cache()
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
                            % F.lit(mask + 1)
                        ).alias("bv"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bv")
    a, b = bands.alias("a"), bands.alias("b")
    # r7 (guide §2.3): hamming is a pure function of the pair, so the
    # ≤ max_hamming cut moves BEFORE the pair-dedup distinct — the
    # distinct exchange now carries only the (narrow) surviving pairs
    # instead of every band collision with both 8-byte signatures.
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_sql(
    max_hamming: int = 3, table: str = "documents", text_col: str = "text"
) -> str:
    """Oracle: exact O(n²) hamming scan over the same signatures (the
    banded Spark plan must return exactly this set)."""
    sig = simhash_signatures_sql(table, text_col).strip()
    return f"""
WITH s AS ({sig})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ======================================================================
# embedding-cosine near-dup (exact baseline; scale path = operators.ann)
# ======================================================================

def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a: Column, b: Column, na: Column, nb: Column) -> Column:
    return _dot(a, b) / (na * nb)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.col(vec_col)
    return df.withColumn("norm", F.sqrt(_dot(v, v)))


def embedding_topk_pairs(
    emb: DataFrame, k: int = 50, vec_col: str = "embedding"
) -> DataFrame:
    """Global top-k most-similar pairs by cosine: (vec_a, vec_b, cos).
    Exact all-pairs baseline — O(n²), for verification scale; use
    ann.lsh_ann for the bucketed scale path."""
    e = with_norm(emb.select("vec_id", vec_col), vec_col)
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"),
    )
    cos = cosine_col(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .orderBy(F.desc("cos"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(k)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )


def embedding_dedup_keep(
    emb: DataFrame, tau: float = 0.45, vec_col: str = "embedding"
) -> DataFrame:
    """Vector ids KEPT after embedding near-dup removal: for every
    pair (vec_a < vec_b) with cosine ≥ tau the larger id is dropped —
    the embedding analogue of :func:`minhash_dedup_keep` (greedy
    keep-smallest canonicalization).  Exact all-pairs at verification
    scale; the scale path applies the same keep rule to LSH/IVF
    candidate pairs from :mod:`chearch_spark.operators.ann`."""
    e = with_norm(emb.select("vec_id", vec_col), vec_col)
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"),
    )
    cos = cosine_col(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    drop = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= tau)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return emb.select("vec_id").join(drop, "vec_id", "left_anti")


def embedding_dedup_keep_sql(
    tau: float = 0.45, table: str = "embeddings"
) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e
), drop_ids AS (
  SELECT DISTINCT b.vec_id
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= {tau}
)
SELECT vec_id FROM {table}
WHERE vec_id NOT IN (SELECT vec_id FROM drop_ids)
"""


def embedding_topk_pairs_sql(k: int = 50, table: str = "embeddings") -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e
), p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(p.cos, 6) AS cos
FROM p ORDER BY p.cos DESC, vec_a ASC, vec_b ASC LIMIT {k}
"""


# ======================================================================
# exact-substring (token-window) dedup — Lee et al., "Deduplicating
# Training Data Makes Language Models Better" (ACL 2022): training
# corpora are contaminated by REPEATED SPANS (boilerplate, licenses,
# mirrored passages) that document-level dedup cannot see.  The paper
# dedupes 50-token substrings with suffix arrays; the Spark-native
# re-expression hashes fixed-length token windows (stride-1 by
# default = every substring boundary) and aggregates window-hash
# occurrence counts — one explode to O(total tokens / stride) rows of
# 8-byte md5-derived keys, one map-side-combined groupBy, one hash
# join.  No suffix array materializes anywhere; skew is impossible on
# the uniform hash key (hot WINDOWS are the output, not a hazard).
# ======================================================================

WINDOW_N = 50  # Lee et al.'s span length; synthetic tests use smaller


def _window_hashes(
    df: DataFrame, n: int, stride: int, text_col: str
) -> DataFrame:
    """(doc_id, wh) — md5-derived hash of every n-token window starting
    at 0, stride, 2*stride, ... (full windows only; docs shorter than n
    emit none)."""
    toks = spread_small_scan(df).select(
        "doc_id", tokens_col(F.col(text_col)).alias("toks")
    )
    idx = F.when(
        F.size("toks") >= n,
        F.sequence(F.lit(0), F.size("toks") - n, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    wins = F.transform(
        idx,
        lambda i: md5_long(
            F.concat_ws(" ", F.slice(F.col("toks"), i + 1, n))
        ),
    )
    return toks.select(
        "doc_id", F.explode(wins).alias("wh")
    )


def _window_hashes_sql(
    n: int, stride: int, table: str, text_col: str
) -> str:
    toks = TOKENS_SQL.format(t=text_col)
    wh = md5_long_sql(
        f"array_to_string(list_slice(toks, i + 1, i + {n}), ' ')"
    )
    return f"""
tok AS (
  SELECT doc_id, {toks} AS toks FROM {table}
), w AS (
  SELECT tok.doc_id, {wh} AS wh
  FROM tok, unnest(range(0, len(toks) - {n} + 1, {stride})) AS u(i)
)"""


def window_dup_groups(
    df: DataFrame,
    n: int = WINDOW_N,
    stride: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Duplicated-span directory: for every n-token window occurring
    more than once in the corpus — (wh, n_occurrences, n_docs,
    min_doc_id).  The corpus-level view of span contamination (which
    spans, how widespread)."""
    return (
        _window_hashes(df, n, stride, text_col)
        .groupBy("wh")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


def window_dup_groups_sql(
    n: int = WINDOW_N,
    stride: int = 1,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    return f"""
WITH {_window_hashes_sql(n, stride, table, text_col)}
SELECT wh,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       min(doc_id) AS min_doc_id
FROM w
GROUP BY wh
HAVING count(*) > 1
"""


def window_dup_fraction(
    df: DataFrame,
    n: int = WINDOW_N,
    stride: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Per-document span-contamination metric — (doc_id, n_windows,
    n_dup_windows, dup_fraction): the fraction of the doc's n-token
    windows whose hash occurs more than once corpus-wide (including
    within-doc repeats).  The per-doc score a cleaning pipeline
    thresholds on (Lee et al. drop or trim the duplicated spans; the
    repo's pipeline composes this with the quality filters).  Docs
    shorter than n score 0 over 0 windows."""
    w = _window_hashes(df, n, stride, text_col)
    counts = w.groupBy("wh").agg(F.count("*").alias("c"))
    per = (
        w.join(counts, "wh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
    )
    return (
        df.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias(
                "n_dup_windows"
            ),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.round(
                    F.col("n_dup_windows") / F.col("n_windows"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def window_dup_fraction_sql(
    n: int = WINDOW_N,
    stride: int = 1,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    return f"""
WITH {_window_hashes_sql(n, stride, table, text_col)},
counts AS (
  SELECT wh, count(*) AS c FROM w GROUP BY wh
), per AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN counts.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_windows
  FROM w JOIN counts ON counts.wh = w.wh
  GROUP BY w.doc_id
)
SELECT d.doc_id,
       coalesce(per.n_windows, 0) AS n_windows,
       coalesce(per.n_dup_windows, 0) AS n_dup_windows,
       CASE WHEN coalesce(per.n_windows, 0) > 0
            THEN round(CAST(per.n_dup_windows AS DOUBLE)
                       / per.n_windows, 6)
            ELSE 0.0 END AS dup_fraction
FROM {table} d LEFT JOIN per ON per.doc_id = d.doc_id
"""


# --- benchmark decontamination (Brown et al. 2020, Appendix C) -----------

DECONTAM_N = 13  # GPT-3's 13-gram rule; synthetic tests use smaller


def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    n: int = DECONTAM_N,
    stride: int = 1,
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 "13-gram" rule, Brown et
    al. 2020 Appendix C): flag training documents that share ANY
    n-token window with a held-out evaluation set — (doc_id,
    n_windows, n_hits, hit_fraction, contaminated).  The keep set is
    ``filter(~contaminated)``; ``n_hits``/``hit_fraction`` support the
    trim-instead-of-drop variant (Lee et al. 2022 §6.2).

    Scale shape (100 TB): eval sets are MB-sized while corpora are
    TB-sized, so the benchmark side reduces to DISTINCT window hashes
    and BROADCASTS; the corpus side is one token-window projection +
    broadcast left join + map-side-combined per-doc groupBy — the
    corpus text never shuffles, only (doc_id, count) pairs do.  Docs
    shorter than n windows score 0 over 0 (never contaminated)."""
    from pyspark.sql import functions as F

    bench = bench_df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col(bench_text_col).alias("text"),
    )
    # the BENCHMARK side always enumerates at stride 1 regardless of
    # the corpus stride: a strided bench would miss shared n-grams at
    # unaligned offsets (a corpus window must hit ANY bench position),
    # and the bench side is broadcast-small anyway
    bw = (
        _window_hashes(bench, n, 1, "text")
        .select("wh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    w = _window_hashes(df, n, stride, text_col)
    per = (
        w.join(F.broadcast(bw), "wh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_hits"),
        )
    )
    return (
        df.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.round(F.col("n_hits") / F.col("n_windows"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("hit_fraction"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(
    n: int = DECONTAM_N,
    stride: int = 1,
    table: str = "documents",
    text_col: str = "text",
    bench_where: str = "doc_id % 37 = 0",
) -> str:
    """DuckDB mirror of :func:`decontaminate` with the benchmark drawn
    from the same table by ``bench_where`` (the gate's deterministic
    eval set — guaranteed hits, both engines see identical rows)."""
    toks = TOKENS_SQL.format(t=text_col)
    wh = md5_long_sql(
        f"array_to_string(list_slice(toks, i + 1, i + {n}), ' ')"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {toks} AS toks FROM {table}
), w AS (
  SELECT tok.doc_id, {wh} AS wh
  FROM tok, unnest(range(0, len(toks) - {n} + 1, {stride})) AS u(i)
), bw AS (
  -- bench side at stride 1 ALWAYS (mirror of the engine rule)
  SELECT DISTINCT {wh} AS wh
  FROM tok, unnest(range(0, len(toks) - {n} + 1, 1)) AS u(i)
  WHERE tok.doc_id IN (
    SELECT doc_id FROM {table} WHERE {bench_where}
  )
), per AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN bw.wh IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM w LEFT JOIN bw ON bw.wh = w.wh
  GROUP BY w.doc_id
)
SELECT d.doc_id,
       coalesce(per.n_windows, 0) AS n_windows,
       coalesce(per.n_hits, 0) AS n_hits,
       CASE WHEN coalesce(per.n_windows, 0) > 0
            THEN round(CAST(per.n_hits AS DOUBLE) / per.n_windows, 6)
            ELSE 0.0 END AS hit_fraction,
       coalesce(per.n_hits, 0) > 0 AS contaminated
FROM {table} d LEFT JOIN per ON per.doc_id = d.doc_id
"""
