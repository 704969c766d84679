"""Text-analysis functions for large-scale training-data pipelines:
token counting, quality scoring, language-ID, and document
fingerprinting — all JVM-side Spark expressions (no Python in the hot
path; whole-stage codegen end to end) with DuckDB-SQL mirrors so every
operator passes the driver's value-hash gate.

These extend the reference's capability surface (briangu/chearch is
string-free — it has *no* tokenizer, `README.md:15,41-67`) with the
operations a 100 TB document pipeline needs before indexing: filter by
quality, route by language, count tokens for budgeting, fingerprint
for provenance.  Scale notes: every function here is a per-row
projection — no shuffle, no UDF, fully pushdown/pruning-friendly; a
quality filter composed onto a parquet scan keeps predicate pushdown
intact because it is a plain Catalyst expression tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chearch_spark import spec
from chearch_spark.functions.hashing import P_FP, md5_long, md5_long_sql

# --- pinned constants (shared by Spark exprs and SQL mirrors) -----------

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space
# symbols (ASCII classes only — identical semantics in Java regex and
# DuckDB's RE2).
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]"
WS_RE = "[ \t\n\r]+"

# Tiny pinned stopword lists for the language-ID heuristic (argmax of
# stopword hits; ties -> alphabetically first language; zero hits ->
# 'unknown').  Deliberately small: the heuristic is the pinned spec,
# not a model.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein",
           "eine", "von", "den", "sich"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that",
           "for", "on", "with"],
    "es": ["el", "los", "las", "y", "es", "en", "un", "una", "por",
           "con", "para", "se"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "qui",
           "pour", "pas", "sur"],
}
LANGS = sorted(LANG_STOPWORDS)  # check order == tie-break order

# Quality score: pinned linear combination of bounded ratios in [0, 1].
QUALITY_WEIGHTS = {"alpha_ratio": 0.4, "stopword_ratio": 0.3,
                   "len_score": 0.3}
QUALITY_LEN_CAP = 200  # tokens: len_score = min(n_tokens, cap) / cap


def tokens_col(text: Column) -> Column:
    """Pinned tokenizer as a JVM expression: lowercase, extract the
    maximal runs of [a-z0-9_] (same spec as ``spec.tokenize``; NULL
    text is pinned to the empty document so Spark NULL-propagation
    cannot diverge from the SQL mirrors).  Note the three engines'
    lower() differ on exotic non-ASCII case mappings — the pinned token
    alphabet is ASCII, so this cannot affect tokens, only which
    characters act as separators.

    r7 (guide §1/§4.1 "per-task work"): re-expressed from
    ``filter(split(lower, '[^a-z0-9_]+'), != '')`` to
    ``regexp_extract_all(lower, '[a-z0-9_]+')`` — the POSITIVE form of
    the same alphabet (``spec.TOKEN_RE``), which is definitionally the
    same token list (splitting on complement runs == extracting
    alphabet runs, with the boundary empties never produced instead of
    filtered).  Row-exact equality was verified over the full sf1.0
    corpus (0 differing rows incl. NULL/empty/punctuation edges), and
    the driver's DuckDB value-hash gates pin it per entry.  Why: this
    JVM's negated-char-class regex runs ~15x slower than the positive
    class (all hot paths tokenize, so this single expression was the
    engine's largest per-task cost), and the lambda-bearing ``filter``
    HOF also dropped the surrounding projection out of codegen CSE."""
    return F.regexp_extract_all(
        F.lower(F.coalesce(text, F.lit(""))), F.lit(spec.TOKEN_RE), 0
    )


TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower(coalesce({t}, '')),"
    " '[^a-z0-9_]+'), x -> x <> '')"
)


# --- token counting ------------------------------------------------------

def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, ws_tokens, bpe_tokens) per document."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        "doc_id",
        F.size(tokens_col(text)).cast("long").alias("n_tokens"),
        F.size(F.filter(F.split(text, WS_RE), lambda t: t != ""))
        .cast("long")
        .alias("ws_tokens"),
        F.regexp_count(F.lower(text), F.lit(BPE_RE))
        .cast("long")
        .alias("bpe_tokens"),
    )


def token_counts_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = TOKENS_SQL.format(t=text_col)
    return f"""
SELECT doc_id,
       CAST(len({toks}) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(regexp_split_to_array(coalesce({text_col}, ''), '{WS_RE}'),
                            x -> x <> '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(coalesce({text_col}, '')), '{BPE_RE}'))
            AS BIGINT) AS bpe_tokens
FROM {table}
"""


# --- quality scoring -----------------------------------------------------

def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, alpha_ratio,
    stopword_ratio, quality) — all ratios double, rounded to 6."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    # tokenize ONCE per row: lambda-bearing expressions are excluded
    # from codegen CSE, so the three token consumers below reference
    # an ALIASED column (CollapseProject keeps a non-cheap alias that
    # is referenced several times) — the percolate HOF-CSE discipline
    base = df.select(
        "doc_id",
        F.length(text).alias("__n_chars"),
        F.length(
            F.regexp_replace(F.lower(text), "[^a-z]", "")
        ).alias("__alpha_chars"),
        tokens_col(text).alias("__toks"),
    )
    toks = F.col("__toks")
    n_chars = F.col("__n_chars")
    n_tokens = F.size(toks)
    alpha_chars = F.col("__alpha_chars")
    stop = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    sum_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    d = F.lit(1.0)  # force double arithmetic
    alpha_ratio = F.when(n_chars > 0, d * alpha_chars / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, d * n_stop / n_tokens).otherwise(0.0)
    avg_len = F.when(n_tokens > 0, d * sum_tok_len / n_tokens).otherwise(0.0)
    len_score = F.least(n_tokens, F.lit(QUALITY_LEN_CAP)) * d / QUALITY_LEN_CAP
    w = QUALITY_WEIGHTS
    quality = (
        w["alpha_ratio"] * alpha_ratio
        + w["stopword_ratio"] * stop_ratio
        + w["len_score"] * len_score
    )
    return base.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def quality_scores_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = TOKENS_SQL.format(t=text_col)
    stop = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    w = QUALITY_WEIGHTS
    return f"""
WITH q AS (
  SELECT doc_id,
         CAST(length(coalesce({text_col}, '')) AS BIGINT) AS n_chars,
         CAST(len({toks}) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(lower(coalesce({text_col}, '')), '[^a-z]', '', 'g'))
              AS BIGINT) AS alpha_chars,
         CAST(len(list_filter({toks}, t -> list_contains([{stop}], t)))
              AS BIGINT) AS n_stop,
         CAST(coalesce(list_sum(list_transform({toks}, t -> length(t))), 0)
              AS BIGINT) AS sum_tok_len
  FROM {table}
), r AS (
  SELECT doc_id, n_chars, n_tokens,
         CASE WHEN n_tokens > 0
              THEN CAST(sum_tok_len AS DOUBLE) / n_tokens ELSE 0.0 END
           AS avg_token_len,
         CASE WHEN n_chars > 0
              THEN CAST(alpha_chars AS DOUBLE) / n_chars ELSE 0.0 END
           AS alpha_ratio,
         CASE WHEN n_tokens > 0
              THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END
           AS stopword_ratio,
         CAST(least(n_tokens, {QUALITY_LEN_CAP}) AS DOUBLE)
           / {QUALITY_LEN_CAP} AS len_score
  FROM q
)
SELECT doc_id, n_chars, n_tokens,
       round(avg_token_len, 6) AS avg_token_len,
       round(alpha_ratio, 6) AS alpha_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round({w["alpha_ratio"]} * alpha_ratio
             + {w["stopword_ratio"]} * stopword_ratio
             + {w["len_score"]} * len_score, 6) AS quality
FROM r
"""


# --- language identification ---------------------------------------------

def _langid_case_sql(counts: dict[str, str]) -> str:
    """Shared CASE expression: argmax of per-language stopword hits,
    alphabetical tie-break, 'unknown' on zero hits.  Plain SQL that
    parses identically in Spark SQL and DuckDB."""
    all_counts = ", ".join(counts[lang] for lang in LANGS)
    branches = "\n       ".join(
        f"WHEN {counts[lang]} >= greatest({all_counts}) THEN '{lang}'"
        for lang in LANGS
    )
    return (
        f"CASE WHEN greatest({all_counts}) = 0 THEN 'unknown'\n"
        f"       {branches} END"
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) via the pinned stopword-hit heuristic."""
    text = F.col(text_col)
    out = df.select("doc_id", tokens_col(text).alias("toks"))
    counts = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array([F.lit(w) for w in words])
        out = out.withColumn(
            f"c_{lang}",
            F.size(F.filter(F.col("toks"), lambda t: F.array_contains(arr, t))),
        )
        counts[lang] = f"c_{lang}"
    return out.select(
        "doc_id", F.expr(_langid_case_sql(counts)).alias("pred_lang")
    )


def lang_id_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = TOKENS_SQL.format(t=text_col)
    count_exprs = []
    counts = {}
    for lang in LANGS:
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        count_exprs.append(
            f"len(list_filter({toks}, t -> list_contains([{words}], t)))"
            f" AS c_{lang}"
        )
        counts[lang] = f"c_{lang}"
    cols = ",\n         ".join(count_exprs)
    return f"""
WITH c AS (
  SELECT doc_id,
         {cols}
  FROM {table}
)
SELECT doc_id, {_langid_case_sql(counts)} AS pred_lang
FROM c
"""


# --- document fingerprinting ---------------------------------------------

def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp): order-sensitive positional fingerprint
    ``sum_i (i+1) * (md5_long(tok_i) % P) mod P`` — a polynomial-style
    rolling hash with linear position weights so it stays exact-integer
    and O(1)-reducible on both engines (every per-element product is
    pre-reduced mod P, so the running fold never overflows int64 even
    for billion-token documents)."""
    toks = tokens_col(F.col(text_col))
    elems = F.transform(
        toks,
        lambda t, i: ((i.cast("long") + 1) % P_FP) * (md5_long(t) % P_FP) % P_FP,
    )
    fp = F.aggregate(
        elems, F.lit(0).cast("long"), lambda acc, e: (acc + e) % F.lit(P_FP)
    )
    return df.select("doc_id", fp.alias("fp"))


def fingerprints_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = TOKENS_SQL.format(t=text_col)
    h = md5_long_sql("tok")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS tok,
         generate_subscripts({toks}, 1) AS pos
  FROM {table}
), agg AS (
  SELECT doc_id,
         sum((CAST(pos AS BIGINT) % {P_FP}) * ({h} % {P_FP}) % {P_FP})
           % {P_FP} AS fp
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(a.fp, 0) AS BIGINT) AS fp
FROM {table} d LEFT JOIN agg a USING (doc_id)
"""


# --- repetition scoring ---------------------------------------------------

def repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, dup_word_frac, dup_2gram_frac,
    repetition) — the repetition family of training-data quality
    filters (the public Gopher/MassiveText rules: Rae et al. 2021
    filter documents by duplicate-line and repeated-n-gram fractions).
    Pinned variants, all O(doc) per row with NO shuffle:

    * dup_line_frac  = 1 - distinct_lines / lines ('\\n' split, raw);
    * dup_word_frac  = 1 - distinct_tokens / tokens;
    * dup_2gram_frac = 1 - distinct adjacent token 2-grams / 2-grams;
    * repetition     = greatest of the three (single filterable score).

    The token array is materialized in its own projection first — the
    2-gram transform references it several times and Catalyst would
    inline (recompute) the tokenizer per reference otherwise (the
    shingle lesson from operators/dedup).  The 2-gram array gets the
    same treatment: it feeds both size() and array_distinct(), so it
    lives in its own projection too (referencing the transform twice
    in one projection recomputes it per row)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        "doc_id",
        F.split(text, "\n").alias("lines"),
        tokens_col(text).alias("toks"),
    )
    two = F.when(
        F.size(F.col("toks")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("toks")) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("toks"), i),
                F.element_at(F.col("toks"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    with_two = base.select("doc_id", "lines", "toks", two.alias("two"))
    g = with_two.select(
        "doc_id",
        F.size("lines").alias("nl"),
        F.size(F.array_distinct("lines")).alias("dl"),
        F.size("toks").alias("nt"),
        F.size(F.array_distinct("toks")).alias("dt"),
        F.size("two").alias("n2"),
        F.size(F.array_distinct("two")).alias("d2"),
    )
    d = F.lit(1.0)
    line_f = F.when(
        F.col("nl") > 0, 1.0 - d * F.col("dl") / F.col("nl")
    ).otherwise(0.0)
    word_f = F.when(
        F.col("nt") > 0, 1.0 - d * F.col("dt") / F.col("nt")
    ).otherwise(0.0)
    gram_f = F.when(
        F.col("n2") > 0, 1.0 - d * F.col("d2") / F.col("n2")
    ).otherwise(0.0)
    return g.select(
        "doc_id",
        F.col("nl").cast("long").alias("n_lines"),
        F.round(line_f, 6).alias("dup_line_frac"),
        F.round(word_f, 6).alias("dup_word_frac"),
        F.round(gram_f, 6).alias("dup_2gram_frac"),
        F.round(F.greatest(line_f, word_f, gram_f), 6).alias("repetition"),
    )


def repetition_scores_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB mirror of :func:`repetition_scores` (same splits, same
    guards, same rounding)."""
    toks = TOKENS_SQL.format(t=text_col)
    return f"""
WITH base AS (
  SELECT doc_id,
         string_split(coalesce({text_col}, ''), chr(10)) AS lines,
         {toks} AS toks
  FROM {table}
), twog AS (
  SELECT doc_id, lines, toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                   i -> concat_ws(' ', toks[i], toks[i + 1]))
              ELSE [] END AS two
  FROM base
), g AS (
  SELECT doc_id,
         len(lines) AS nl, len(list_distinct(lines)) AS dl,
         len(toks) AS nt, len(list_distinct(toks)) AS dt,
         len(two) AS n2, len(list_distinct(two)) AS d2
  FROM twog
), fr AS (
  SELECT doc_id, CAST(nl AS BIGINT) AS n_lines,
         CASE WHEN nl > 0
              THEN 1.0 - CAST(dl AS DOUBLE) / nl ELSE 0.0 END AS lf,
         CASE WHEN nt > 0
              THEN 1.0 - CAST(dt AS DOUBLE) / nt ELSE 0.0 END AS wf,
         CASE WHEN n2 > 0
              THEN 1.0 - CAST(d2 AS DOUBLE) / n2 ELSE 0.0 END AS gf
  FROM g
)
SELECT doc_id, n_lines,
       round(lf, 6) AS dup_line_frac,
       round(wf, 6) AS dup_word_frac,
       round(gf, 6) AS dup_2gram_frac,
       round(greatest(lf, wf, gf), 6) AS repetition
FROM fr
"""


# --- snippet extraction (keyword-in-context) -----------------------------


def snippets(
    df: DataFrame,
    terms: list[str],
    width: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Search-result snippets: for each document containing >= 1 of
    ``terms``, the FIRST match position (0-based token index, min over
    all matching terms) and the surrounding ``2*width+1``-token window
    joined by single spaces — what a result page renders next to a
    hit.  (doc_id, pos int, snippet string); non-matching docs are
    dropped.  Window semantics: a window clamped at the document
    START extends RIGHT to keep the full 2*width+1 length (a hit on
    token 0 still yields a full-width snippet); at the document END
    the window simply truncates — no left-extension.

    The reference returns bare doc ids (`chearch_srv.chpl:44-69`);
    this completes the serving surface with the presentation layer a
    user switching engines needs.  Pure JVM expression tree — tokens
    materialized once per row (separate select: the Catalyst
    HOF-inlining trap), no UDF, and no shuffle at scale (r7: a
    size-guarded ``spread_small_scan`` round-robins ONLY a
    few-MB input across cores so the tokenize stage is not serialized
    by parquet split flooring; large inputs keep the pure scan->map
    shape).  Deterministic and DuckDB-mirrorable
    (:func:`snippets_sql`)."""
    tset = sorted({t.lower() for t in terms})
    from chearch_spark.functions.parallel import spread_small_scan

    toked = spread_small_scan(df).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    match_pos = F.filter(
        F.transform(
            F.col("_toks"),
            lambda t, i: F.when(t.isin(tset), i).otherwise(F.lit(-1)),
        ),
        lambda v: v >= 0,
    )
    first = toked.select(
        "doc_id", "_toks", F.array_min(match_pos).alias("pos")
    ).filter(F.col("pos").isNotNull())
    start = F.greatest(F.col("pos") - F.lit(width), F.lit(0)) + F.lit(1)
    return first.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.array_join(
            F.slice(F.col("_toks"), start, 2 * width + 1), " "
        ).alias("snippet"),
    )


def snippets_sql(
    terms: list[str],
    width: int = 3,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`snippets` — same tokenizer, 0-based
    first-match position via unnest+subscripts, list_slice with the
    same clamp semantics (clamp-left extends right; the document end
    truncates in both engines)."""
    tset = sorted({t.lower() for t in terms})
    in_list = ", ".join(f"'{t}'" for t in tset)
    toks = TOKENS_SQL.format(t=text_col)
    return f"""
WITH toked AS (
  SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
), pos AS (
  SELECT doc_id, min(p - 1) AS pos
  FROM (SELECT doc_id, unnest(t) AS tok,
               generate_subscripts(t, 1) AS p
        FROM toked)
  WHERE tok IN ({in_list})
  GROUP BY doc_id
)
SELECT toked.doc_id, CAST(pos.pos AS INTEGER) AS pos,
       array_to_string(
         list_slice(toked.t,
                    greatest(pos.pos - {width}, 0) + 1,
                    greatest(pos.pos - {width}, 0) + {2 * width + 1}),
         ' ') AS snippet
FROM toked JOIN pos ON pos.doc_id = toked.doc_id
"""


# --- collocations (statistical phrase detection) -------------------------

def collocations(
    df: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """PMI-ranked adjacent bigrams (collocation detection, Church &
    Hanks 1990) — (w1, w2, n_pair, n_w1, n_w2, pmi): the statistical
    phrases a tokenizer-level phrase list or an index-time shingle
    layer would be built from.  ``pmi = ln((n_pair·N_uni·N_uni) /
    (N_bi·n_w1·n_w2))`` computed as ONE double expression over exact
    integer counts (aggregation-order-independent — the cross-engine
    discipline), ranked (pmi desc, w1 asc, w2 asc), noise-floored by
    ``min_count``.

    Scale shape: two map-side-combined groupBys (bigrams, unigrams) —
    shuffle bounded by vocabulary and bigram-type cardinality, never
    corpus size; the unigram relation joins twice on single-term keys
    (broadcastable at realistic vocabularies)."""
    from chearch_spark.functions.parallel import spread_small_scan

    toks = spread_small_scan(df).select(
        tokens_col(F.col(text_col)).alias("toks")
    )
    bi = toks.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.struct(
                        a.alias("w1"), b.alias("w2")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    # cache the two SMALL aggregates (vocabulary- / bigram-type-sized)
    # so the corpus text tokenizes exactly twice (once per groupBy) —
    # the totals and the two unigram joins then read the caches
    # instead of re-deriving `toks` from scratch (was 4 corpus passes)
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("n_w"))
        .cache()
    )
    n_uni = uni.agg(F.sum("n_w")).collect()[0][0] or 0
    pair_all = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n_pair"))
        .cache()
    )
    n_bi = (
        pair_all.agg(F.sum("n_pair")).collect()[0][0] or 0
    )
    pair = pair_all.filter(F.col("n_pair") >= int(min_count))
    if n_uni == 0 or n_bi == 0:
        return pair.select(
            "w1", "w2", "n_pair",
            F.lit(0).cast("long").alias("n_w1"),
            F.lit(0).cast("long").alias("n_w2"),
            F.lit(0.0).alias("pmi"),
        ).limit(0)
    u1 = uni.select(
        F.col("w").alias("w1"), F.col("n_w").alias("n_w1")
    )
    u2 = uni.select(
        F.col("w").alias("w2"), F.col("n_w").alias("n_w2")
    )
    out = (
        pair.join(u1, "w1")
        .join(u2, "w2")
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (
                        F.col("n_pair").cast("double")
                        * F.lit(float(n_uni))
                        * F.lit(float(n_uni))
                    )
                    / (
                        F.lit(float(n_bi))
                        * F.col("n_w1").cast("double")
                        * F.col("n_w2").cast("double")
                    )
                ),
                6,
            ),
        )
    )
    return (
        out.select("w1", "w2", "n_pair", "n_w1", "n_w2", "pmi")
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(int(k))
    )


def collocations_sql(
    min_count: int = 5,
    k: int = 20,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`collocations` (identical double
    association and rounding)."""
    toks = TOKENS_SQL.format(t=text_col)
    return f"""
WITH tok AS (
  SELECT {toks} AS toks FROM {table}
), bi AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM tok, unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_w
  FROM (SELECT unnest(toks) AS w FROM tok)
  GROUP BY w
), totals AS (
  SELECT CAST((SELECT sum(n_w) FROM uni) AS DOUBLE) AS n_uni,
         CAST((SELECT count(*) FROM bi) AS DOUBLE) AS n_bi
), pair AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
  FROM bi GROUP BY w1, w2
  HAVING count(*) >= {int(min_count)}
)
SELECT p.w1, p.w2, p.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
       round(ln((CAST(p.n_pair AS DOUBLE) * t.n_uni * t.n_uni)
                / (t.n_bi * CAST(u1.n_w AS DOUBLE)
                   * CAST(u2.n_w AS DOUBLE))), 6) AS pmi
FROM pair p
JOIN uni u1 ON u1.w = p.w1
JOIN uni u2 ON u2.w = p.w2
CROSS JOIN totals t
ORDER BY pmi DESC, p.w1 ASC, p.w2 ASC
LIMIT {int(k)}
"""
