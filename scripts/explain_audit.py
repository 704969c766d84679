#!/usr/bin/env python
"""Physical-plan audit: captures .explain("formatted") for every key
operator and ASSERTS the plan properties the 100 TB design depends on
(predicate pushdown into parquet, broadcast for small sides, one
exchange where one is intended, whole-stage codegen on the hot
projections).  Writes PLANS.md.

Run after any engine change:  python scripts/explain_audit.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    """Formatted plan + simple plan (codegen stages appear as `*(N)`
    only in simple mode on Spark 4)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
        print("\n--- simple ---\n")
        df.explain()
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("chearch_explain_audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from chearch_spark.build import build_index
    from chearch_spark.functions import text as T
    from chearch_spark.operators import ann as A
    from chearch_spark.operators import dedup as D
    from chearch_spark.plans.query import Term
    from chearch_spark.search import Index

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = tempfile.mkdtemp(prefix="chearch_audit_ix_")
    build_index(spark, docs, out, num_segments=8, resume=False)
    ix = Index(spark, out)

    sections: list[tuple[str, str, list[tuple[str, str]]]] = []

    def audit(name, df, checks: list[tuple[str, str]]):
        p = plan_of(df)
        for label, needle in checks:
            alts = needle.split("|")
            assert any(a in p for a in alts), (
                f"{name}: missing {label!r} ({needle!r})"
            )
        sections.append((name, p, checks))
        print(f"OK  {name}: " + ", ".join(lbl for lbl, _ in checks))

    audit(
        "BM25 top-k search (nested boolean)",
        ix.search((Term("merge") & Term("sort")) | Term("dup"), k=10),
        [
            ("term pushdown into parquet", "PushedFilters: [In(term"),
            ("single global gather", "TakeOrderedAndProject"),
        ],
    )
    from chearch_spark.plans.query import DisMax, MinShould

    audit(
        "scoring combinators (MinShould / DisMax)",
        ix.search(
            DisMax(
                (
                    MinShould((Term("batch"), Term("dup"), Term("merge")), 2),
                    Term("sort"),
                ),
                0.3,
            ),
            k=10,
        ),
        [
            # the structural scorer changes NOTHING about the plan: the
            # same pruned scan feeds one kernel and one global gather
            ("clause-term pushdown into parquet", "PushedFilters: [In(term"),
            ("single global gather", "TakeOrderedAndProject"),
        ],
    )
    from chearch_spark.federation import MultiIndex

    fed_root = tempfile.mkdtemp(prefix="chearch_audit_fed_")
    for name, pred in (("a", "pmod(doc_id, 2) = 0"), ("b", "pmod(doc_id, 2) = 1")):
        build_index(
            spark, docs.filter(pred), f"{fed_root}/{name}", num_segments=4
        )
    fed = MultiIndex(spark, [f"{fed_root}/a", f"{fed_root}/b"])
    p = plan_of(fed.search((Term("merge") & Term("sort")) | Term("dup"), k=10))
    # count in the FORMATTED section only — plan_of appends the simple
    # plan, which repeats each scan's PushedFilters once more
    assert p.split("--- simple ---")[0].count(
        "PushedFilters: [In(term"
    ) == 2, "federation: a member scan lost its term pushdown"
    assert "Join" not in p, "federation: unexpected join"
    sections.append(
        (
            "federated search (MultiIndex, 2 members)",
            p,
            [
                ("per-member term pushdown (2 pruned scans)", "In(term"),
                ("plan-level union, single gather", "TakeOrderedAndProject"),
            ],
        )
    )
    print("OK  federated search (MultiIndex, 2 members): per-member pushdown, one gather")

    audit(
        "multi-query batch (search_many)",
        ix.search_many(
            {"a": Term("merge") & Term("sort"), "b": Term("dup")}, k=10
        ),
        [
            ("union-term pushdown", "PushedFilters: [In(term"),
            ("per-query top-k window", "Window"),
        ],
    )
    audit(
        "ANN cosine top-k",
        A.cosine_topk(emb, [0, 1, 2, 3], k=10),
        [
            ("query side broadcast", "BroadcastNestedLoopJoin"),
            ("partial top-k below the exchange", "WindowGroupLimit"),
        ],
    )
    audit(
        "MinHash signatures",
        D.minhash_signatures(docs),
        [
            ("map-side partial agg", "partial_min"),
        ],
    )
    audit(
        "SimHash near-dup banded join",
        D.simhash_pairs(docs, max_hamming=3),
        [
            ("band-bucket equi-join", "SortMergeJoin|HashJoin"),
        ],
    )
    audit(
        "exact dedup",
        D.exact_duplicates(docs),
        [
            ("map-side partial agg", "partial_count"),
        ],
    )
    # percolation: registry-of-queries projection — assert NO shuffle
    # and NO Python kernel (pure whole-stage-codegen matching)
    from chearch_spark.operators.percolate import percolate

    p = plan_of(
        percolate(
            docs,
            {"q1": Term("merge") & Term("sort"), "q2": Term("dup")},
        )
    )
    # r7: the size-guarded spread_small_scan may add ONE round-robin
    # exchange on few-MB inputs (parallelizing the tokenize stage);
    # any other exchange — i.e. any KEYED shuffle — is still a bug,
    # and at scale the spread is a no-op so the plan stays shuffle-free
    assert "hashpartitioning" not in p and "rangepartitioning" not in p, (
        "percolate: unexpected keyed shuffle"
    )
    assert "FlatMapGroupsInPandas" not in p, "percolate: unexpected kernel"
    # the HOF-CSE discipline: exactly ONE tokenizer evaluation per row
    # (any extra regexp_extract_all( in the simple plan means a
    # per-term re-tokenize crept in; r7 moved the tokenizer from
    # filter(split(..)) to regexp_extract_all — same alphabet,
    # positive-class form)
    simple = p.split("--- simple ---")[1]
    assert simple.count("regexp_extract_all(") == 1, (
        f"percolate: {simple.count('regexp_extract_all(')} tokenizer "
        "evaluations in the plan (expected 1 — the aliased-projection "
        "fix regressed)"
    )
    sections.append(
        (
            "percolation (reverse search, registry projection)",
            p,
            [
                ("no keyed Exchange / no kernel (verified absent; the "
                 "only allowed exchange is the size-guarded round-robin "
                 "spread on few-MB inputs)", "—"),
                ("generator emits per-hit rows", "Generate"),
            ],
        )
    )
    print("OK  percolation (reverse search): no keyed shuffle, no kernel, Generate")

    # decontamination: the benchmark window-hash side must broadcast
    from chearch_spark.operators.dedup import decontaminate

    p = plan_of(decontaminate(docs, docs.filter("doc_id % 37 = 0"), n=5))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoop" in p, (
        "decontaminate: benchmark side lost its broadcast"
    )
    sections.append(
        (
            "benchmark decontamination (n-gram window overlap)",
            p,
            [
                ("benchmark hashes broadcast", "Broadcast"),
                ("map-side partial per-doc counts", "partial_count"),
            ],
        )
    )
    print("OK  benchmark decontamination: broadcast bench side, partial counts")

    # quality_scores: per-row projection — assert NO shuffle at all
    p = plan_of(T.quality_scores(docs))
    assert "Exchange" not in p, "quality_scores: unexpected shuffle"
    sections.append(
        (
            "quality scores (pure projection)",
            p,
            [("no Exchange in plan (verified absent)", "—")],
        )
    )
    print("OK  quality scores (pure projection): no Exchange in plan")

    from chearch_spark.streaming.events import windowed_event_counts
    from chearch_spark.streaming.sessions import sessionize_batch

    events = spark.read.parquet(f"{SF}/events.parquet")
    audit(
        "windowed event aggregation",
        windowed_event_counts(events),
        [
            ("map-side partial agg", "partial_count"),
        ],
    )
    p = plan_of(sessionize_batch(events))
    simple = p.split("--- simple ---")[-1]
    n_ex = simple.count("Exchange")
    assert n_ex == 1, f"sessionize: expected ONE shuffle, saw {n_ex}"
    assert "Window" in simple
    sections.append(
        (
            "sessionization (batch form)",
            p,
            [("exactly ONE exchange, reused by both Windows and the "
              "aggregation (verified)", "—")],
        )
    )
    print("OK  sessionization (batch form): one exchange, Window")

    # dictionary merge plan (from the build path, reconstructed as
    # write_dictionary lays it out: range partitioning for the bounds
    # sidecar + file-level probe pruning)
    from pyspark.sql import functions as F

    seg_scan = spark.read.parquet(os.path.join(out, "segments")).filter(
        F.col("term") != ""
    )
    from chearch_spark.build import dictionary_agg

    dic = (
        dictionary_agg(seg_scan)
        .repartitionByRange(4, "term")
        .sortWithinPartitions("term")
    )
    audit(
        "dictionary merge (build phase 2, range layout + term directory)",
        dic,
        [
            ("map-side partial agg", "partial_sum"),
            ("map-side partial directory collection", "partial_collect_set"),
            ("meta-row pushdown", "PushedFilters: [IsNotNull(term), Not(EqualTo(term,))"),
            ("range partitioning for the bounds sidecar",
             "rangepartitioning|RangePartitioning"),
        ],
    )

    # top-k + metadata projection: the k doc ids must reach the docmap
    # scan as a pushed filter (broadcast-join keys alone do NOT push
    # into a parquet data column)
    audit(
        "search_with_meta (forward-map projection, distributed form)",
        ix.search_with_meta(Term("merge") & Term("sort"), k=10,
                            distributed=True),
        [
            ("top-k ids pushed into the docmap scan",
             "PushedFilters: [In(doc_id"),
            ("k-row side broadcast", "BroadcastHashJoin"),
        ],
    )
    # driver form (default for serving k): metadata comes from opening
    # exactly the hit segments' docmap files — assert the touched-file
    # bound rather than a Spark plan
    rows = ix.search_with_meta(Term("merge") & Term("sort"), k=10).collect()
    assert len(rows) == 10, "driver-form search_with_meta row count"
    sections.append(
        (
            "search_with_meta (driver form)",
            "driver path: scoring kernel reports each hit's seg_id; "
            "metadata fetched by opening exactly the <= k hit docmap "
            "files with a pushed doc_id filter (pytest "
            "test_search_with_meta_driver_path_touches_k_files asserts "
            "the file count).",
            [("<= k docmap file opens, independent of segment count "
              "(pytest-asserted)", "—")],
        )
    )
    print("OK  search_with_meta (driver form): k rows via O(k) file opens")

    audit(
        "NEAR proximity (match_near)",
        ix.match_near("merge", "sort", window=3),
        [
            ("term pushdown into parquet", "PushedFilters: [In(term"),
            ("positions column read (and nothing else posting-sized)",
             "positions"),
        ],
    )
    audit(
        "relational posting view (postings_df)",
        ix.postings_df(["merge", "sort"]),
        [
            ("term pushdown into parquet", "PushedFilters: [In(term"),
        ],
    )

    # persisted IVF query: partition-pruned candidate scan, no Python
    # kernel anywhere in the serving plan
    ivf_dir = tempfile.mkdtemp(prefix="chearch_audit_ivf_")
    A.ivf_build(emb, ivf_dir, n_centroids=16)
    ivf_q = A.ivf_query(spark, ivf_dir, [0, 1, 2], k=10, n_probe=4)
    p = plan_of(ivf_q)
    assert "PartitionFilters" in p and "cell" in p, "ivf_query: no partition pruning"
    assert "ArrowEvalPython" not in p and "MapInPandas" not in p, (
        "ivf_query: Python kernel in serving plan"
    )
    # query-vector fetch: O(|ids|) file opens against the id-sorted
    # vectors/ sidecar — never a scan of the corpus-sized cell layout
    qpdf, n_files = A.fetch_query_vectors(ivf_dir, [0, 1, 2], "embedding")
    n_sidecar_files = len(
        [f for f in os.listdir(os.path.join(ivf_dir, "vectors"))
         if f.endswith(".parquet")]
    )
    assert len(qpdf) == 3, "ivf query-vector fetch: wrong row count"
    assert n_files <= 3, (
        f"ivf query-vector fetch opened {n_files} files for 3 ids"
    )
    assert n_sidecar_files >= 4, (
        "audit needs a multi-file sidecar to prove pruning"
    )
    sections.append(
        (
            "IVF query over the persisted index",
            p,
            [("cell-partition-pruned candidate scan; no Python kernel "
              "in the plan (both verified)", "—"),
             (f"query-vector fetch opened {n_files}/{n_sidecar_files} "
              "sidecar files for 3 ids (bounds-pruned, no assigned "
              "scan — asserted)", "—")],
        )
    )
    print("OK  IVF query over the persisted index: partition-pruned, "
          f"kernel-free, vector fetch {n_files}/{n_sidecar_files} files")

    # Faceted search: the melted (facet, value) groupBy must carry a
    # map-side partial aggregation (partial_count below the exchange)
    # so the shuffle is facet-cardinality-bounded, not docset-sized
    docs_meta = spark.read.parquet(f"{SF}/documents.parquet")
    fc = ix.facet_counts(
        Term("merge") | Term("dup"), docs_meta, ["lang", "source"]
    )
    p = plan_of(fc)
    assert "partial_count" in p, "facets: no map-side partial agg"
    sections.append(
        (
            "Faceted search (facet_counts)",
            p,
            [("one semi-join + one melted groupBy for ALL facets; "
              "map-side partial_count asserted (shuffle bounded by "
              "facet cardinality)", "—")],
        )
    )
    print("OK  faceted search: melted groupBy with map-side partial agg")

    # Range facets: same semi-join front half; the bucket groupBy must
    # also carry a map-side partial aggregation (shuffle bounded by
    # bucket cardinality, never docset size)
    fr = ix.facet_range(
        Term("merge") | Term("dup"), docs_meta, "n_chars", 0, 100
    )
    p = plan_of(fr)
    assert "partial_count" in p, "facet_range: no map-side partial agg"
    sections.append(
        (
            "Range facets (facet_range)",
            p,
            [("one semi-join + one bucket groupBy; map-side "
              "partial_count asserted (shuffle bounded by bucket "
              "cardinality)", "—")],
        )
    )
    print("OK  range facets: bucket groupBy with map-side partial agg")

    # Significant terms: the main plan must be SINGLE-PASS over the
    # foreground (exactly one match kernel feeding the semi-join; the
    # scalar fg-n is a separate eager count job by design), the
    # foreground term counts must carry a map-side partial
    # aggregation (the shuffle is vocabulary-bounded, never
    # docset-sized), and the ranked cut must plan as
    # TakeOrderedAndProject
    st = ix.significant_terms(
        Term("merge") | Term("dup"), docs_meta, k=10
    )
    p = plan_of(st)
    assert "partial_count" in p, "sig_terms: no map-side partial agg"
    assert "TakeOrderedAndProject" in p, "sig_terms: no top-k plan"
    # count kernels in the simple-plan section only (the formatted
    # section names each op twice: tree row + detail header)
    simple = p.split("--- simple ---", 1)[1]
    n_kernels = simple.count("FlatMapGroupsInPandas") + simple.count(
        "MapInPandas"
    )
    assert n_kernels == 1, (
        "sig_terms: main plan runs the match kernel more than once "
        f"(saw {n_kernels}; r7's shuffle-free dispatch plans the "
        "kernel as MapInPandas on unsplittable segment layouts)"
    )
    sections.append(
        (
            "Significant terms (significant_terms)",
            p,
            [("one semi-join + one tokenize/groupBy over the "
              "foreground (single match kernel asserted; fg-n is one "
              "eager O(matches) count job); map-side partial_count; "
              "ranked cut is TakeOrderedAndProject", "—")],
        )
    )
    print("OK  significant terms: single foreground pass, partial agg, "
          "top-k plan")

    # Field collapsing: full scored emission joins the (doc_id, group)
    # projection via a FORCED shuffle-hash join (kernel output size is
    # only an estimate to Catalyst — a broadcast there would ride on
    # it), one per-group window, TakeOrderedAndProject on top
    sc_df = ix.search_collapsed(
        Term("merge") | Term("dup"), docs_meta, "lang", k=10
    )
    p = plan_of(sc_df)
    assert "ShuffledHashJoin" in p, "collapse: join not forced shuffle-hash"
    assert "Window" in p, "collapse: no per-group window"
    assert "TakeOrderedAndProject" in p, "collapse: no top-k plan"
    sections.append(
        (
            "Field collapsing (search_collapsed)",
            p,
            [("full scored emission -> forced shuffle-hash join with "
              "the (doc_id, group) projection -> per-group window -> "
              "TakeOrderedAndProject (all three asserted); shuffle "
              "bounded by the match count", "—")],
        )
    )
    print("OK  field collapsing: shuffle-hash join, group window, "
          "top-k plan")

    # Prefix autocomplete: a ranked LIMIT over the dictionary scan —
    # the prefix range must push into the parquet scan (part-file /
    # row-group pruning on the range-partitioned dictionary) and the
    # ranking must plan as TakeOrderedAndProject (per-partition top-k
    # below the gather), with only (term, df) in the ReadSchema
    sg = ix.suggest("s", k=8)
    p = plan_of(sg)
    assert "TakeOrderedAndProject" in p, "suggest: no top-k plan"
    assert "GreaterThanOrEqual(term" in p or "IsNotNull(term" in p, (
        "suggest: prefix range not pushed"
    )
    sg_scans = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert sg_scans and all(
        "term" in ln and "cf" not in ln and "segs" not in ln
        for ln in sg_scans
    ), "suggest: dictionary scan reads more than (term, df)"
    sections.append(
        (
            "Prefix autocomplete (suggest)",
            p,
            [("prefix range pushed into the dictionary scan; "
              "TakeOrderedAndProject top-k; (term, df)-only "
              "ReadSchema", "—")],
        )
    )
    print("OK  suggest: range-pruned dictionary scan + top-k plan")

    # Filtered search (Lucene fq semantics): the kernel path must plan
    # EXACTLY like plain search — pruned scan, no join anywhere (the
    # allowed-id set rides inside the scoring kernels) — and the join
    # path must carry one shuffle (never broadcast — the scored side
    # is a kernel output Catalyst can only estimate) left-semi join
    # below a TakeOrderedAndProject
    fq = Term("merge") | Term("dup")
    fk = ix.search_filtered(fq, docs_meta, "n_chars >= 400", mode="kernel")
    p = plan_of(fk)
    assert "Join" not in p, "filtered kernel path: unexpected join"
    assert "TakeOrderedAndProject" in p, "filtered kernel path: no top-k"
    assert "In(term" in p, "filtered kernel path: term pushdown lost"
    sections.append(
        (
            "Filtered search, kernel path (search_filtered mode=kernel)",
            p,
            [("no join — include set ships to the kernels; pruned "
              "scan + TakeOrderedAndProject, the plain-search shape",
              "—")],
        )
    )
    fj = ix.search_filtered(fq, docs_meta, "n_chars >= 400", mode="join")
    p = plan_of(fj)
    assert "LeftSemi" in p, "filtered join path: no semi-join"
    assert "BroadcastHashJoin" not in p, (
        "filtered join path: broad filter must never broadcast"
    )
    assert "TakeOrderedAndProject" in p, "filtered join path: no top-k"
    sections.append(
        (
            "Filtered search, join path (search_filtered mode=join)",
            p,
            [("one shuffle-hash left-semi join against the allowed-id "
              "relation; k rows past the final gather", "—")],
        )
    )
    print("OK  filtered search: kernel join-free; join path semi-join")

    # More-like-this: after the driver-side term selection (one pushed
    # single-row text fetch + one dictionary probe), retrieval must be
    # the PLAIN disjunctive search plan — term-pruned scan, no join,
    # top-k gather — i.e. MLT adds nothing that has to scale
    mq = ix.more_like_this(7, docs_meta, k=10, max_terms=5)
    p = plan_of(mq)
    assert "Join" not in p, "mlt: unexpected join in retrieval plan"
    assert "TakeOrderedAndProject" in p, "mlt: no top-k plan"
    assert "In(term" in p, "mlt: term pushdown lost"
    sections.append(
        (
            "More-like-this (more_like_this)",
            p,
            [("retrieval is the plain OR search plan over the selected "
              "terms: pruned scan + kernel + TakeOrderedAndProject, "
              "no join", "—")],
        )
    )
    print("OK  more-like-this: plain pruned OR retrieval plan")

    # Fuzzy dictionary probe: a pure filter+project over the
    # dictionary parquet — vocabulary-sized, ReadSchema carries only
    # (term, df), and there is NO exchange anywhere in the plan (the
    # deletion-variant candidate test and levenshtein verify are
    # row-local Catalyst expressions)
    fz = ix.fuzzy_terms("merg")
    p = plan_of(fz)
    assert "Exchange" not in p, "fuzzy: unexpected shuffle"
    fz_scans = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert fz_scans and all(
        "term" in ln and "cf" not in ln and "segs" not in ln
        for ln in fz_scans
    ), "fuzzy: dictionary scan reads more than (term, df)"
    sections.append(
        (
            "Fuzzy dictionary probe (deletion-variant + levenshtein)",
            p,
            [("zero exchanges; (term, df)-only ReadSchema over the "
              "dictionary — both asserted", "—")],
        )
    )
    print("OK  fuzzy probe: no shuffle, (term, df)-only dictionary scan")

    # Wildcard dictionary probe (r6): same zero-exchange
    # vocabulary-sized shape as fuzzy, PLUS the literal prefix pushed
    # as a term range so a prefix-anchored glob prunes the
    # range-partitioned dictionary's part files/row groups
    wc = ix.wildcard_terms("mer*e")
    p = plan_of(wc)
    assert "Exchange" not in p, "wildcard: unexpected shuffle"
    assert "GreaterThanOrEqual(term,mer" in p and "LessThan(term," in p, (
        "wildcard: literal prefix not pushed as a range predicate"
    )
    wc_scans = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert wc_scans and all(
        "term" in ln and "cf" not in ln and "segs" not in ln
        for ln in wc_scans
    ), "wildcard: dictionary scan reads more than (term, df)"
    sections.append(
        (
            "Wildcard dictionary probe (glob expansion)",
            p,
            [("zero exchanges; (term, df)-only ReadSchema; literal "
              "prefix pushed as a term range (all asserted) — a "
              "leading wildcard honestly scans the vocabulary, never "
              "the corpus", "—")],
        )
    )
    print("OK  wildcard probe: no shuffle, range-pruned dictionary scan")

    # Regexp probe: same shared machinery (_pattern_terms_df) — the
    # GUARANTEED literal prefix must survive a grouped alternation
    # ('s(or|ub).*' guarantees 's'; only a TOP-LEVEL '|' kills the
    # range), and the scan stays (term, df)-only with zero exchanges
    rxp = ix.regexp_terms("s(or|ub).*")
    p = plan_of(rxp)
    assert "Exchange" not in p, "regexp: unexpected shuffle"
    assert "GreaterThanOrEqual(term,s)" in p and "LessThan(term,t)" in p, (
        "regexp: grouped-alternation literal prefix not pushed as a "
        "range predicate"
    )
    rx_scans = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert rx_scans and all(
        "term" in ln and "cf" not in ln and "segs" not in ln
        for ln in rx_scans
    ), "regexp: dictionary scan reads more than (term, df)"
    sections.append(
        (
            "Regexp dictionary probe",
            p,
            [("zero exchanges; (term, df)-only ReadSchema; the "
              "guaranteed literal prefix pushes a term range even "
              "under a grouped alternation (all asserted)", "—")],
        )
    )
    print("OK  regexp probe: no shuffle, grouped-alternation range "
          "pruning")

    # SQ8 top-k: bounds (1 row) and query vectors broadcast; the
    # corpus is projected (encode+decode JVM transforms) but NEVER
    # shuffled — no hashpartitioning of corpus rows before the
    # partial top-k under the final window
    sq = A.sq_topk(emb, [0, 1, 2], k=10, dim=64)
    p = plan_of(sq)
    assert p.count("BroadcastExchange") >= 2, (
        "sq8: bounds / query side not broadcast"
    )
    assert not any(
        "embedding" in ln
        for ln in p.splitlines()
        if "hashpartitioning" in ln
    ), "sq8: corpus vectors shuffled"
    assert not any(
        "hashpartitioning" in ln and "xhat" in ln
        for ln in p.splitlines()
    ), "sq8: decoded corpus shuffled"
    sections.append(
        (
            "SQ8 scalar-quantized top-k",
            p,
            [("bounds row + query vectors broadcast; corpus projected "
              "in place (no corpus exchange) — asserted", "—")],
        )
    )
    print("OK  SQ8 top-k: broadcast bounds/queries, corpus unshuffled")

    # Hybrid RRF fusion: the lexical branch must keep its term-pruned
    # pushdown (ONE segments scan for all queries), the semantic
    # branch its broadcast-query shape, and the vec_id->name mapping
    # must broadcast — fusion adds no corpus scan or corpus shuffle
    from chearch_spark.operators.fusion import hybrid_rrf

    hyb = hybrid_rrf(
        ix,
        emb,
        {
            "h_and": (Term("merge") & Term("sort"), 0),
            "h_or": (Term("merge") | Term("dup"), 1),
        },
    )
    p = plan_of(hyb)
    # formatted half only — plan_of also appends the simple dump,
    # where the same scan would be counted a second time
    fmt = p.split("--- simple ---")[0]
    n_seg = sum(
        "segments" in ln for ln in fmt.splitlines() if "Location" in ln
    )
    assert "PushedFilters: [In(term" in p, "hybrid: lexical pushdown lost"
    assert n_seg == 1, f"hybrid: expected 1 segments scan, saw {n_seg}"
    assert p.count("BroadcastExchange") >= 2, (
        "hybrid: query-vector / mapping sides not broadcast"
    )
    sections.append(
        (
            "Hybrid RRF (BM25 search_many + cosine ANN fusion)",
            p,
            [
                ("ONE term-pruned segments scan feeds ALL lexical "
                 "queries; semantic query vectors and the vec_id->name "
                 "mapping broadcast; fusion joins two top-n-reduced "
                 "relations (no corpus shuffle) — all asserted", "—"),
            ],
        )
    )
    print("OK  hybrid RRF: 1 pruned segments scan, broadcast semantic sides")

    # IVFADC (pq_m build + adc=True query): the candidate scan must
    # read the codes column and NEVER the float vectors (the PQ byte
    # win), while the probed-cell partition pruning stays intact
    ivfpq_dir = tempfile.mkdtemp(prefix="chearch_audit_ivfpq_")
    A.ivf_build(emb, ivfpq_dir, n_centroids=16, pq_m=A.PQ_M)
    adc_q = A.ivf_query(
        spark, ivfpq_dir, [0, 1, 2], k=10, n_probe=4, adc=True
    )
    p = plan_of(adc_q)
    assert "PartitionFilters" in p and "cell" in p, (
        "ivfadc: no partition pruning"
    )
    scan_lines = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all(
        "embedding" not in ln for ln in scan_lines
    ), "ivfadc: scan reads the float vectors"
    assert any("codes" in ln for ln in scan_lines), (
        "ivfadc: scan does not read the codes column"
    )
    sections.append(
        (
            "IVFADC query (PQ codes) over the persisted index",
            p,
            [("probed-cell partition pruning intact; ReadSchema carries "
              "codes and never the float vectors (both asserted)", "—")],
        )
    )
    print("OK  IVFADC query: partition-pruned, codes-only ReadSchema")

    # IVFADC+R (r6): the rerank tail must be a POINT LOOKUP into the
    # id-sorted vectors/ sidecar (vec_id IN pushed into that scan),
    # with the shortlist pair relation and query vectors broadcast —
    # never a second corpus-shaped scan of the cell layout
    rr_q = A.ivf_query(
        spark, ivfpq_dir, [0, 1, 2], k=10, n_probe=4, adc=True,
        rerank=40,
    )
    p = plan_of(rr_q)
    assert "In(vec_id" in p, (
        "ivfadc+r: shortlist ids not pushed into the sidecar scan"
    )
    assert p.count("BroadcastExchange") >= 2, (
        "ivfadc+r: shortlist pairs / query vectors not broadcast"
    )
    fmt = p.split("--- simple ---")[0]
    n_asg = sum(
        "assigned" in ln for ln in fmt.splitlines() if "Location" in ln
    )
    assert n_asg == 0, (
        f"ivfadc+r: rerank plan re-scans the cell layout ({n_asg})"
    )
    sections.append(
        (
            "IVFADC+R exact rerank (shortlist point lookup)",
            p,
            [("vec_id IN pushed into the id-sorted vectors/ sidecar; "
              "shortlist pairs + query vectors broadcast; no cell-"
              "layout re-scan (all asserted)", "—")],
        )
    )
    print("OK  IVFADC+R rerank: sidecar point lookup, no corpus re-scan")
    import shutil as _sh

    _sh.rmtree(ivfpq_dir, ignore_errors=True)

    # search_with_snippets: the k hit ids must push into the corpus
    # scan (row-group pruning — no full corpus text scan), the k-row
    # score relation must broadcast, and the snippet expression is
    # pure JVM (no Python kernel anywhere in the plan)
    sws = ix.search_with_snippets(
        (Term("merge") & Term("sort")) | Term("dup"), docs, k=10
    )
    p = plan_of(sws)
    assert "PushedFilters: [In(doc_id" in p, (
        "snippets-search: hit ids not pushed into the documents scan"
    )
    assert "BroadcastExchange" in p, (
        "snippets-search: score relation not broadcast"
    )
    assert "FlatMapGroupsInPandas" not in p and "pythonUDF" not in p, (
        "snippets-search: unexpected Python kernel"
    )
    fmt = p.split("--- simple ---")[0]
    n_doc_scans = sum(
        "documents.parquet" in ln
        for ln in fmt.splitlines()
        if "Location" in ln
    )
    assert n_doc_scans == 1, (
        f"snippets-search: expected 1 documents scan, saw {n_doc_scans}"
    )
    sections.append(
        (
            "search_with_snippets (top-k + KWIC in one plan)",
            p,
            [("k hit ids pushed into the ONE documents scan; score "
              "relation broadcast; zero Python kernels — all asserted",
              "—")],
        )
    )
    print("OK  search_with_snippets: id-pushed single doc scan, no kernel")

    # positional (Phrase) search: the segment scan must read the
    # positions columns ONLY when the tree holds a Phrase/Near leaf —
    # plain BM25 keeps the narrow ReadSchema
    pp = plan_of(ix.search('"merge sort"', k=10))
    assert "PushedFilters: [In(term" in pp, "phrase: term pushdown lost"
    assert "TakeOrderedAndProject" in pp, "phrase: no single global gather"
    assert any(
        "positions" in ln for ln in pp.splitlines() if "ReadSchema" in ln
    ), "phrase: positions columns not in the segment scan"
    pb = plan_of(ix.search(Term("merge") & Term("sort"), k=10))
    assert not any(
        "positions" in ln for ln in pb.splitlines() if "ReadSchema" in ln
    ), "plain BM25: positions columns leaked into the segment scan"
    sections.append(
        (
            "Phrase search (string syntax -> positions kernel)",
            pp,
            [("term pushdown + single gather; positions columns read "
              "ONLY for positional trees (plain-BM25 narrow ReadSchema "
              "asserted as the control)", "—")],
        )
    )
    print("OK  phrase search: positional ReadSchema gated on the tree")

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(
            "# PLANS — audited physical plans\n\n"
            "Generated by `scripts/explain_audit.py`; every property "
            "listed is ASSERTED by the script (CI-able).  Regenerate "
            "after engine changes.\n\n"
        )
        for name, p, checks in sections:
            f.write(f"## {name}\n\n")
            f.write(
                "Asserted: "
                + "; ".join(lbl for lbl, _ in checks)
                + "\n\n```\n"
                + p.strip()
                + "\n```\n\n"
            )
    print("PLANS.md written")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
