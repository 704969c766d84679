"""Semantic tests for the training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) on corpora with
planted duplicates / neighbors.  Engine-vs-oracle parity for every
contract query is covered separately by test_entry_contract.py."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chearch_spark import spec
from chearch_spark.functions import text as T
from chearch_spark.functions.hashing import P_FP, py_md5_long
from chearch_spark.operators import ann as A
from chearch_spark.operators import dedup as D
from chearch_spark.sources import multimodal as M

BASE = "the quick brown fox jumps over the lazy dog near the river bank"
NEAR = "the quick brown fox jumps over the lazy cat near the river bank"
OTHER = "completely different content about spark shuffles and parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),        # exact dup of 0
        (2, NEAR),        # near dup of 0 (1 token changed)
        (3, OTHER),
        (4, OTHER + " with an extra tail of tokens"),
        (5, ""),          # empty doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(corpus):
    dups = D.exact_duplicates(corpus).collect()
    assert len(dups) == 1
    assert dups[0].n_dups == 2 and dups[0].min_doc_id == 0


def test_ngram_jaccard_planted(corpus):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(corpus, tau=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical docs
    # 1 token changed in a 13-token doc: 11 shingles, 3 containing the
    # changed token differ -> J = 8/14
    assert pairs[(0, 2)] == pytest.approx(8 / 14, abs=1e-6)
    assert (0, 3) not in pairs


def test_ngram_jaccard_hot_shingle_cap(spark):
    """A boilerplate shingle in ~50% of docs must not create pairs on
    its own (it is excluded by the pinned df cap), while genuinely
    near-duplicate docs still pair on their rare shingles — and the
    capped semantics match the capped oracle exactly."""
    boiler = "copyright acme corp all rights reserved"
    n = 40
    rows = []
    for i in range(n):
        # half the docs share the boilerplate header + unique bodies
        body = f"unique body {i} alpha{i} beta{i} gamma{i} delta{i}"
        rows.append((i, (boiler + " " + body) if i % 2 == 0 else body))
    # one planted near-dup pair sharing a rare 5-token run
    rows.append((100, "rare shared run of tokens one two three"))
    rows.append((101, "rare shared run of tokens one two four"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(df, tau=0.3, max_shingle_df=4).collect()
    }
    assert (100, 101) in pairs
    # boilerplate-only doc pairs are gone: every boilerplate shingle has
    # df = 20 > cap, and bodies share nothing
    assert not any(a < 100 and b < 100 for (a, b) in pairs)

    # capped Spark == capped DuckDB oracle (semantics, not heuristics)
    import duckdb

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = {
        (r[0], r[1]): r[2]
        for r in con.sql(
            D.ngram_jaccard_pairs_sql(tau=0.3, max_shingle_df=4)
        ).fetchall()
    }
    got = {k: round(v, 6) for k, v in pairs.items()}
    assert got == {k: round(v, 6) for k, v in want.items()}


def test_minhash_lsh_finds_planted_neardups(corpus):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_lsh_pairs(corpus, tau=0.3).collect()
    }
    # identical docs always collide in every band
    assert pairs[(0, 1)] == 1.0
    # near-dup J=0.571: 16 minhashes agree w.p. ~J each; with 4x4
    # banding the planted pair collides for this pinned hash family
    assert (0, 2) in pairs


def test_minhash_signature_identical_for_identical_docs(corpus):
    sigs = {r.doc_id: r for r in D.minhash_signatures(corpus).collect()}
    assert all(
        sigs[0][f"m{i}"] == sigs[1][f"m{i}"] for i in range(16)
    )
    assert 5 not in sigs  # empty doc has no shingles


def test_simhash_banded_equals_bruteforce(spark, corpus):
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in D.simhash_pairs(corpus, max_hamming=3).collect()
    }
    sig = {r.doc_id: r.simhash for r in D.simhash_signatures(corpus).collect()}
    brute = {
        (a, b, bin(sig[a] ^ sig[b]).count("1"))
        for a in sig
        for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    assert banded == brute
    assert (0, 1, 0) in banded  # identical docs: distance 0


def test_fingerprint_matches_python_spec(spark, corpus):
    got = {r.doc_id: r.fp for r in T.fingerprints(corpus).collect()}

    def py_fp(text):
        toks = spec.tokenize(text)
        return sum(
            (i + 1) * (py_md5_long(t) % P_FP) % P_FP
            for i, t in enumerate(toks)
        ) % P_FP

    for doc_id, text in [(0, BASE), (2, NEAR), (3, OTHER), (5, "")]:
        assert got[doc_id] == py_fp(text), doc_id
    assert got[0] == got[1] and got[0] != got[2]


def test_token_counts(spark, corpus):
    got = {r.doc_id: r for r in T.token_counts(corpus).collect()}
    assert got[0].n_tokens == len(spec.tokenize(BASE)) == 13
    assert got[0].ws_tokens == 13
    assert got[5].n_tokens == got[5].ws_tokens == got[5].bpe_tokens == 0


def test_lang_id_heuristic(spark):
    rows = [
        (0, "the cat is on the mat and it is happy"),
        (1, "der Hund ist nicht mit der Katze und das ist gut"),
        (2, "le chat est dans la maison et les oiseaux sont pour lui"),
        (3, "el perro es un animal y los gatos son para la casa"),
        (4, "zzz qqq xxx"),
    ]
    df = rows_df = None
    import pyspark.sql

    spark_s = pyspark.sql.SparkSession.getActiveSession()
    df = spark_s.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in T.lang_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "unknown"}


def test_quality_scores_bounds(corpus):
    rows = T.quality_scores(corpus).collect()
    for r in rows:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.alpha_ratio <= 1.0
    empty = next(r for r in rows if r.doc_id == 5)
    assert empty.quality == 0.0 and empty.n_tokens == 0


# --- similarity search ---------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 8)).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.normal(size=8).astype(np.float32)  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(vectors):
    got = A.cosine_topk(vectors, [0], k=3).collect()
    assert [r.rank for r in got] == [1, 2, 3]
    assert got[0].vec_id == 1 and got[0].cos > 0.99  # planted neighbor
    # verify against numpy
    pdf = vectors.toPandas().sort_values("vec_id")
    m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    cos = m @ m[0] / (np.linalg.norm(m, axis=1) * np.linalg.norm(m[0]))
    cos[0] = -np.inf
    order = np.lexsort((np.arange(len(cos)), -cos))[:3]
    assert [r.vec_id for r in got] == order.tolist()


def test_lsh_ann_finds_near_identical(vectors):
    got = A.lsh_ann_topk(vectors, [0], k=3, dim=8).collect()
    # a near-identical vector agrees on (almost) every hyperplane sign,
    # so it must appear in some band bucket and rank first
    assert got and got[0].vec_id == 1 and got[0].rank == 1


def test_embedding_topk_pairs(vectors):
    top = D.embedding_topk_pairs(vectors, k=1).collect()
    assert (top[0].vec_a, top[0].vec_b) == (0, 1)


# --- multimodal plumbing -------------------------------------------------


def test_media_plumbing(corpus):
    media = M.attach_media(corpus)
    meta = {r.doc_id: r for r in M.media_metadata(media).collect()}
    assert meta[0].n_bytes == len(BASE.encode())
    assert meta[0].kind == "image" and meta[1].kind == "audio"
    assert meta[0].sha256 == meta[1].sha256  # same payload bytes

    feats = {r.doc_id: r for r in M.extract_features(media).collect()}
    raw = BASE.encode()
    assert feats[0].byte_sum == sum(raw)
    assert feats[0].byte_min == min(raw) and feats[0].byte_max == max(raw)
    assert feats[5].n_bytes == 0 and feats[5].byte_sum == 0

    frames = M.frame_sample(media, frame_bytes=16, stride=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_frames_doc0 = len(BASE.encode()) // 16
    assert len(by_doc[0]) == (n_frames_doc0 + 1) // 2
    assert all(len(r.frame) == 16 for r in by_doc[0])
    assert 5 not in by_doc  # empty payload -> no frames


def test_resize_stub_raises(corpus):
    with pytest.raises(NotImplementedError):
        M.resize_stub(M.attach_media(corpus), 32, 32)


def _fake_real_decoder(payload: bytes, kind: str):
    """Stand-in for a REAL codec: produces different bytes than the
    raw payload (inverted and 2x upsampled), like a decode would."""
    a = np.frombuffer(payload or b"", dtype=np.uint8)
    return np.repeat(a ^ np.uint8(0xFF), 2)


def test_decoder_injection_seam(corpus):
    """The decode seam (round-3 verdict stretch task): injecting a
    real decoder changes the BYTES while the vectorized reduction
    stage and output schema stay identical; removing the injection
    restores the stub (= the contract-gated CI path) exactly."""
    media = M.attach_media(corpus)
    stub = {r.doc_id: r for r in M.extract_features(media).collect()}

    # explicit argument
    dec = {
        r.doc_id: r
        for r in M.extract_features(
            media, decoder=_fake_real_decoder
        ).collect()
    }
    raw = BASE.encode()
    want = np.repeat(
        np.frombuffer(raw, dtype=np.uint8) ^ np.uint8(0xFF), 2
    )
    assert dec[0].n_bytes == 2 * len(raw) != stub[0].n_bytes
    assert dec[0].byte_sum == int(want.sum(dtype=np.int64))
    assert dec[0].byte_min == int(want.min())
    assert dec[0].byte_max == int(want.max())
    assert dec[5].n_bytes == 0  # empty payload decodes to empty

    # frames slice the DECODED buffer
    fr = M.frame_sample(
        media, frame_bytes=16, stride=2, decoder=_fake_real_decoder
    ).collect()
    doc0 = sorted(
        (r for r in fr if r.doc_id == 0), key=lambda r: r.frame_idx
    )
    assert bytes(doc0[0].frame) == want[:16].tobytes()

    # process-wide injection + restore
    M.set_decoder(_fake_real_decoder)
    try:
        inj = {
            r.doc_id: r for r in M.extract_features(media).collect()
        }
        assert inj[0].byte_sum == dec[0].byte_sum
    finally:
        M.reset_decoder()
    back = {r.doc_id: r for r in M.extract_features(media).collect()}
    assert {k: tuple(v) for k, v in back.items()} == {
        k: tuple(v) for k, v in stub.items()
    }

    # env-gated resolution ("pkg.mod:attr"), checked at resolve time;
    # set_decoder(None) FORCES the stub even when the env names a
    # decoder (code demanding determinism beats ambient config)
    import os

    os.environ["CHEARCH_MEDIA_DECODER"] = (
        "tests.test_pipeline_ops:_fake_real_decoder"
    )
    try:
        assert M.resolve_decoder() is _fake_real_decoder
        M.set_decoder(None)
        assert M.resolve_decoder() is None
        M.reset_decoder()
        assert M.resolve_decoder() is _fake_real_decoder
    finally:
        M.reset_decoder()
        del os.environ["CHEARCH_MEDIA_DECODER"]
    assert M.resolve_decoder() is None
    with pytest.raises(ValueError):
        os.environ["CHEARCH_MEDIA_DECODER"] = "no_colon_here"
        try:
            M.resolve_decoder()
        finally:
            del os.environ["CHEARCH_MEDIA_DECODER"]


def test_ivf_ann_recall_on_clustered_vectors(spark):
    """IVF with a deterministic k-means quantizer: on clustered data
    (10 label groups in the testdata embeddings) probing 4/16 cells
    must recover most of the exact top-10."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2]
    exact = A.cosine_topk(emb, qids, 10).collect()
    ivf = A.ivf_ann_topk(emb, qids, 10, n_centroids=16, n_probe=4).collect()
    ex = {(r.query_id, r.vec_id) for r in exact}
    iv = {(r.query_id, r.vec_id) for r in ivf}
    assert len(ex & iv) / len(ex) >= 0.6
    # determinism: same call, same result
    again = A.ivf_ann_topk(emb, qids, 10, n_centroids=16, n_probe=4).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, again))


def test_ann_recall_floors(spark):
    """Pinned quality floors for BOTH approximate ANN paths
    (spec.LSH_RECALL_FLOOR / spec.IVF_RECALL_FLOOR): the contract gate
    verifies their VALUES are deterministic, but nothing else fails if
    a parameter change (planes, bands, n_probe, quantizer seed) drops
    recall to noise — this does."""
    from chearch_spark import spec

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(10))
    rec = A.lsh_recall(emb, qids, k=10, dim=64).collect()
    mean_lsh = sum(r.recall for r in rec) / len(rec)
    assert mean_lsh >= spec.LSH_RECALL_FLOOR, mean_lsh

    exact = {
        (r.query_id, r.vec_id)
        for r in A.cosine_topk(emb, qids, 10).collect()
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in A.ivf_ann_topk(
            emb, qids, 10, n_centroids=16, n_probe=4
        ).collect()
    }
    assert len(exact & ivf) / len(exact) >= spec.IVF_RECALL_FLOOR
    flat = {
        (r.query_id, r.vec_id)
        for r in A.ivf_flat_topk(emb, qids, 10).collect()
    }
    assert len(exact & flat) / len(exact) >= spec.IVF_RECALL_FLOOR


def test_ivf_build_query_persisted(spark, tmp_path_factory):
    """ivf_build persists centroids + cell assignment; ivf_query must
    (a) return exactly what the one-shot ivf_ann_topk computes with
    the same parameters, (b) run NO assignment job — no Python kernel
    in the plan, candidate scan partition-pruned to the probed cells."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2]
    out = str(tmp_path_factory.mktemp("ivf_ix"))
    meta = A.ivf_build(emb, out, n_centroids=16)
    assert meta["n_centroids"] == 16 and meta["dim"] == 64

    got = A.ivf_query(spark, out, qids, k=10, n_probe=4)
    want = A.ivf_ann_topk(emb, qids, 10, n_centroids=16, n_probe=4).collect()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "PartitionFilters" in plan and "cell" in plan
    # repeated queries reuse the artifact (still no kernel, same rows)
    again = A.ivf_query(spark, out, qids, k=10, n_probe=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, want))
    # unknown query ids degrade to empty, like every other query path
    empty = A.ivf_query(spark, out, [999_999], k=10, n_probe=4)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "vec_id", "cos", "rank"]

    # the query-by-id vector fetch must come from the id-sorted
    # vectors/ sidecar with O(|ids|) file opens — NEVER a scan of the
    # cell-partitioned assigned table (no pruning on vec_id there)
    qpdf, n_files = A.fetch_query_vectors(out, qids, "embedding")
    assert sorted(qpdf["vec_id"].tolist()) == qids
    assert n_files <= len(qids)

    # serving form: EXTERNAL query vectors (the common production
    # case) — passing copies of indexed vectors must score identically
    # to the by-id path, norms included (same sequential fold).
    # exclude_self=True opts into the by-id path's self-exclusion; the
    # external DEFAULT keeps self-matches (caller-chosen ids must not
    # silently drop a colliding indexed vector from the top-k)
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for _, r in qpdf.iterrows()
    }
    ext = A.ivf_query(
        spark, out, k=10, n_probe=4, query_vectors=vecs,
        exclude_self=True,
    ).collect()
    assert sorted(map(tuple, ext)) == sorted(map(tuple, want))
    ext_default = A.ivf_query(
        spark, out, k=10, n_probe=4, query_vectors=vecs
    ).collect()
    for qid in qids:
        top = [r for r in ext_default if r.query_id == qid and r.rank == 1]
        assert len(top) == 1 and top[0].vec_id == qid
        assert abs(top[0].cos - 1.0) < 1e-9
    with pytest.raises(ValueError):
        A.ivf_query(spark, out, qids, query_vectors=vecs)
    with pytest.raises(ValueError):
        A.ivf_query(spark, out)


def test_null_text_rows_are_empty_documents(spark):
    """NULL text is pinned to the empty document in every text function
    (review regression: Spark null-propagation vs oracle coalesce)."""
    df = spark.createDataFrame(
        [(0, None), (1, "one doc")], "doc_id long, text string"
    )
    tc = {r.doc_id: r for r in T.token_counts(df).collect()}
    assert tc[0].n_tokens == 0 and tc[0].ws_tokens == 0 and tc[0].bpe_tokens == 0
    fp = {r.doc_id: r.fp for r in T.fingerprints(df).collect()}
    assert fp[0] == 0
    q = {r.doc_id: r for r in T.quality_scores(df).collect()}
    assert q[0].n_chars == 0 and q[0].quality == 0.0
    lang = {r.doc_id: r.pred_lang for r in T.lang_id(df).collect()}
    assert lang[0] == "unknown"


def test_clean_keep_repetition_filter(spark):
    """Optional repetition stage in the cleaning pipeline: a highly
    repetitive doc passes the quality stage (decent length/alpha) but
    is dropped once max_repetition is set; the default pipeline is
    unchanged."""
    import pandas as pd

    from chearch_spark.operators.pipeline import clean_keep

    rows = [
        (0, "the quick brown fox jumps over the lazy dog in a field of "
            "green grass and the sun is warm today for everyone here"),
        (1, "spam spam spam spam spam spam spam spam spam spam spam "
            "spam spam spam spam spam spam spam spam spam spam spam"),
        (2, "another perfectly ordinary document with a variety of "
            "distinct and reasonable words in it for the test corpus"),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    base = {r.doc_id for r in clean_keep(docs, min_quality=0.2).collect()}
    assert base == {0, 1, 2}  # repetition alone doesn't fail quality
    kept = {
        r.doc_id
        for r in clean_keep(
            docs, min_quality=0.2, max_repetition=0.5
        ).collect()
    }
    assert kept == {0, 2}


def test_injected_decoder_owns_kind_support(spark):
    """The KINDS gate is stub-path only (r4 advisor): an injected
    decoder must RECEIVE kinds outside the builtin set (that's the
    seam's point — e.g. a 'pdf' codec) and raise for kinds IT rejects;
    the stub path still rejects unknown kinds, identically in
    extract_features and frame_sample."""
    media = spark.createDataFrame(
        [(1, "pdf", bytearray(b"\x01\x02\x03")), (2, "image", bytearray(b"\x04"))],
        "doc_id long, kind string, payload binary",
    )

    def pdf_decoder(payload: bytes, kind: str):
        if kind not in ("pdf", "image"):
            raise NotImplementedError(kind)
        return np.frombuffer(payload or b"", dtype=np.uint8)

    # the 'pdf' row decoding (n_bytes == 3) proves the injected
    # decoder received the non-builtin kind instead of a KINDS gate
    # rejecting it up front
    rows = {
        r.doc_id: r
        for r in M.extract_features(media, decoder=pdf_decoder).collect()
    }
    assert rows[1].n_bytes == 3 and rows[2].n_bytes == 1
    fr = M.frame_sample(
        media, frame_bytes=2, stride=1, decoder=pdf_decoder
    ).collect()
    assert any(r.doc_id == 1 for r in fr)

    # stub path: both entry points reject the unknown kind the same way
    for op in (
        lambda df: M.extract_features(df),
        lambda df: M.frame_sample(df, frame_bytes=2, stride=1),
    ):
        with pytest.raises(Exception) as ei:
            op(media).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )

    # an injected decoder's own rejection propagates
    with pytest.raises(Exception):
        M.extract_features(
            media.withColumn("kind", F.lit("video")), decoder=pdf_decoder
        ).collect()


def test_pq_recall_floors_and_determinism(spark):
    """Product-quantization quality floors (spec.PQ_SEED_RECALL_FLOOR /
    spec.PQ_RECALL_FLOOR) + determinism: the codebooks (seed and
    md5-sample-trained) carry no RNG state, so two independent runs
    must produce identical codes and scores."""
    from chearch_spark import spec

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    qids = list(range(10))
    seed = A.pq_recall(emb, qids, k=10).collect()
    assert sum(r.recall for r in seed) / len(seed) >= (
        spec.PQ_SEED_RECALL_FLOOR
    )
    trained = A.pq_recall(emb, qids, k=10, trained=True).collect()
    assert sum(r.recall for r in trained) / len(trained) >= (
        spec.PQ_RECALL_FLOOR
    )
    once = sorted(
        map(tuple, A.pq_ann_topk(emb, qids, k=10).collect())
    )
    again = sorted(
        map(tuple, A.pq_ann_topk(emb, qids, k=10).collect())
    )
    assert once == again


def test_pq_adc_score_is_reconstruction_dot(spark):
    """ADC semantics: the summed lookup-table score must equal the
    dot product of the normalized query with the vector's CODEBOOK
    RECONSTRUCTION (concatenated chosen sub-centroids) — the defining
    identity of product quantization (Jegou et al. 2011)."""
    import numpy as np

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    cb = A.pq_train(emb, m=A.PQ_M, k_codes=A.PQ_CODES)
    m, k_codes, dsub = cb.shape
    codes = {
        int(r.vec_id): list(r.codes)
        for r in A.pq_encode(emb, cb).collect()
    }
    rows = {int(r.vec_id): np.array(list(r.embedding), dtype=np.float64)
            for r in emb.select("vec_id", "embedding").limit(50).collect()}
    got = {
        (r.query_id, r.vec_id): r.score
        for r in A.pq_ann_topk(emb, [3], k=10, codebooks=cb).collect()
    }
    q = rows[3] / np.linalg.norm(rows[3])
    for (qid, vid), score in got.items():
        recon = np.concatenate(
            [cb[mi][codes[vid][mi]] for mi in range(m)]
        )
        assert score == pytest.approx(float(q @ recon), abs=1e-5), (
            qid, vid,
        )


def test_pq_codes_are_compact(spark):
    """The persisted payload story: m small ints per vector — the
    codes column must carry exactly PQ_M codes in [0, PQ_CODES)."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    cb = A.pq_seed_codebooks(emb)
    rows = A.pq_encode(emb, cb).collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r.codes) == A.PQ_M
        assert all(0 <= c < A.PQ_CODES for c in r.codes)


def test_pq_codebooks_need_k_codes_rows(spark):
    """A corpus (or sample) smaller than k_codes raises a descriptive
    error instead of an opaque numpy reshape failure (ADVICE r5)."""
    tiny = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(A.PQ_CODES - 1)
    with pytest.raises(ValueError, match="k_codes"):
        A.pq_seed_codebooks(tiny)
    with pytest.raises(ValueError, match="k_codes"):
        A.pq_train(tiny, sample=A.PQ_CODES - 1)


def test_window_dedup_planted_span(spark):
    """Exact-substring dedup semantics (Lee et al. 2022): a repeated
    SPAN inside otherwise-distinct documents must be found at window
    granularity (document-level exact dedup sees nothing here), and
    per-doc dup_fraction must reflect exactly the contaminated
    windows."""
    span = "shared license header tokens alpha beta gamma delta"
    rows = [
        (0, span + " unique zero body content here"),
        (1, "different opening words " + span + " tail one"),
        (2, "totally unrelated content with no overlap at all xyz"),
        (3, "tiny"),  # shorter than the window -> 0 windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 8  # the span is exactly 8 tokens

    groups = D.window_dup_groups(df, n=n).collect()
    # the full span window occurs in docs 0 and 1; doc-level exact
    # dedup finds nothing
    assert any(g.n_docs == 2 and g.min_doc_id == 0 for g in groups)
    assert D.exact_duplicates(df).count() == 0

    frac = {r.doc_id: r for r in D.window_dup_fraction(df, n=n).collect()}
    # doc 0: 13 tokens -> 6 windows, exactly ONE (the span itself,
    # start 0) duplicated; doc 1: span starts at token 3 of 13
    assert frac[0].n_windows == 6 and frac[0].n_dup_windows == 1
    assert frac[1].n_dup_windows == 1
    assert frac[2].n_dup_windows == 0
    assert frac[3].n_windows == 0 and frac[3].dup_fraction == 0.0
    assert frac[0].dup_fraction == pytest.approx(1 / 6, abs=1e-6)


def test_ivf_pq_adc_serving(spark, tmp_path_factory):
    """IVFADC (ivf_build(pq_m=...) + ivf_query(adc=True)): the probed
    cells are scored from the persisted PQ CODES — the scan must read
    the codes column and NOT the float vectors (the 100 TB byte win);
    results are deterministic, recall-floored vs the exact top-k, and
    an index built without PQ refuses adc."""
    from chearch_spark import spec

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    qids = [0, 1, 2, 5, 9]
    out = str(tmp_path_factory.mktemp("ivfpq_ix"))
    meta = A.ivf_build(emb, out, n_centroids=16, pq_m=A.PQ_M)
    assert meta["pq"]["m"] == A.PQ_M
    # r6: codes quantize the coarse residual by default (IVFADC
    # proper), and the persisted meta records it so query-time
    # scoring picks the matching identity
    assert meta["pq"]["residual"] is True

    got = A.ivf_query(spark, out, qids, k=10, n_probe=8, adc=True)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # column pruning: the ADC scan reads codes, never the vectors
    assert "codes" in plan
    scan_lines = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert scan_lines and all(
        "embedding" not in ln for ln in scan_lines
    ), scan_lines
    assert "PartitionFilters" in plan  # probed-cell pruning intact

    rows = got.collect()
    assert {r.query_id for r in rows} == set(qids)
    again = A.ivf_query(
        spark, out, qids, k=10, n_probe=8, adc=True
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    exact = {
        (r.query_id, r.vec_id)
        for r in A.cosine_topk(emb, qids, 10).collect()
    }
    hits = sum(
        1 for r in rows if (r.query_id, r.vec_id) in exact
    )
    assert hits / len(exact) >= spec.PQ_RECALL_FLOOR

    # an index without PQ codes refuses the adc path loudly
    out2 = str(tmp_path_factory.mktemp("ivf_nopq"))
    A.ivf_build(emb, out2, n_centroids=16)
    with pytest.raises(ValueError, match="pq_m"):
        A.ivf_query(spark, out2, qids, k=10, adc=True).collect()


def test_ivfadc_rerank(spark, tmp_path_factory):
    """IVFADC+R (r6): the ADC shortlist is exact-reranked from the
    id-sorted vectors/ sidecar — recall jumps to the probe ceiling
    (floor 0.80 vs raw ADC's 0.40), the rerank scan is a point lookup
    (vec_id IN pushed into the sidecar scan, never a corpus re-scan),
    results are deterministic, and parameter misuse fails loudly."""
    from chearch_spark import spec

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    qids = [0, 1, 2, 5, 9]
    out = str(tmp_path_factory.mktemp("ivfadcr_ix"))
    A.ivf_build(emb, out, n_centroids=16, pq_m=A.PQ_M)

    got = A.ivf_query(
        spark, out, qids, k=10, n_probe=8, adc=True, rerank=40
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the rerank tail reads the sidecar with the id set pushed down
    assert "PushedFilters" in plan and "In(vec_id" in plan, plan
    rows = got.collect()
    assert {r.query_id for r in rows} == set(qids)
    again = A.ivf_query(
        spark, out, qids, k=10, n_probe=8, adc=True, rerank=40
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    exact = {
        (r.query_id, r.vec_id)
        for r in A.cosine_topk(emb, qids, 10).collect()
    }
    hits = sum(1 for r in rows if (r.query_id, r.vec_id) in exact)
    assert hits / len(exact) >= spec.IVFADC_RERANK_RECALL_FLOOR
    # reranked scores are EXACT cosine: every hit that is also in the
    # exact top-10 must carry the identical rounded score
    exact_cos = {
        (r.query_id, r.vec_id): r.cos
        for r in A.cosine_topk(emb, qids, 10).collect()
    }
    for r in rows:
        if (r.query_id, r.vec_id) in exact_cos:
            assert r.cos == exact_cos[(r.query_id, r.vec_id)]

    with pytest.raises(ValueError, match="adc=True"):
        A.ivf_query(spark, out, qids, k=10, rerank=40)
    with pytest.raises(ValueError, match="must be >= k"):
        A.ivf_query(spark, out, qids, k=10, adc=True, rerank=5)


def test_ivfadc_nonresidual_and_legacy_meta(spark, tmp_path_factory):
    """pq_residual=False still builds/serves (plain code-the-vector
    PQ), and a pre-r6 meta WITHOUT the residual key scores with the
    non-residual identity — old persisted indexes keep answering
    correctly after the upgrade."""
    import json
    import os

    from chearch_spark import spec

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    qids = [0, 1, 2, 5, 9]
    out = str(tmp_path_factory.mktemp("ivfpq_plain"))
    meta = A.ivf_build(
        emb, out, n_centroids=16, pq_m=A.PQ_M, pq_residual=False
    )
    assert meta["pq"]["residual"] is False
    got = A.ivf_query(
        spark, out, qids, k=10, n_probe=8, adc=True
    ).collect()
    exact = {
        (r.query_id, r.vec_id)
        for r in A.cosine_topk(emb, qids, 10).collect()
    }
    hits = sum(1 for r in got if (r.query_id, r.vec_id) in exact)
    assert hits / len(exact) >= spec.PQ_RECALL_FLOOR

    # strip the residual key -> pre-r6 index shape; answers identical
    mp = os.path.join(out, "ivf_meta.json")
    with open(mp) as f:
        m = json.load(f)
    del m["pq"]["residual"]
    with open(mp, "w") as f:
        json.dump(m, f)
    legacy = A.ivf_query(
        spark, out, qids, k=10, n_probe=8, adc=True
    ).collect()
    assert sorted(map(tuple, legacy)) == sorted(map(tuple, got))


def test_rrf_fuse_semantics(spark):
    """RRF invariants on planted lists: a doc in BOTH lists outranks
    any single-list doc at comparable ranks; rank ties break on
    doc_id; k0 dampening keeps deep ranks positive."""
    from chearch_spark.operators.fusion import rrf_fuse

    lex = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2), ("q", 12, 3)],
        "query string, doc_id long, rank int",
    )
    sem = spark.createDataFrame(
        [("q", 11, 1), ("q", 20, 2), ("q", 21, 3)],
        "query string, doc_id long, rank int",
    )
    rows = rrf_fuse(lex, sem, k=10).orderBy("rank").collect()
    # doc 11 (rank 2 lex + rank 1 sem) beats every single-list doc
    assert rows[0].doc_id == 11
    assert rows[0].rrf == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    # union of both lists, nothing dropped below k
    assert {r.doc_id for r in rows} == {10, 11, 12, 20, 21}
    # single-list docs with the SAME rank tie on score -> doc_id asc
    tied = [r for r in rows if abs(r.rrf - 1 / 61) < 1e-6]
    assert [r.doc_id for r in tied] == [10]  # sem rank1 is doc 11
    # 1/62 bucket: lex rank-2 is doc 11 (fused higher), so only the
    # sem rank-2 doc remains
    r2 = [r for r in rows if abs(r.rrf - 1 / 62) < 1e-6]
    assert [r.doc_id for r in r2] == [20]
    # determinism
    again = rrf_fuse(lex, sem, k=10).orderBy("rank").collect()
    assert rows == again


def test_sq8_quantization(spark):
    """SQ8: codes are 0..255 ints (the 4x byte win), the recall floor
    holds (spec.SQ_RECALL_FLOOR; measured 0.96-1.0 across sfs), the
    path is deterministic, and a constant dimension quantizes to code
    0 without dividing by zero."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    codes = A.sq_encode(emb, dim=64).collect()
    assert all(
        0 <= c <= 255 for r in codes for c in r.codes
    ) and all(len(r.codes) == 64 for r in codes)

    rec = {
        r.query_id: r.recall
        for r in A.sq_recall(emb, [0, 1, 2, 3, 4], k=10, dim=64).collect()
    }
    assert sum(rec.values()) / len(rec) >= spec.SQ_RECALL_FLOOR, rec

    got = A.sq_topk(emb, [0, 1], k=5, dim=64).collect()
    again = A.sq_topk(emb, [0, 1], k=5, dim=64).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))

    # constant dimension: scale 0 -> code 0, decode back to the
    # constant, no NaN/crash
    const = spark.createDataFrame(
        [(i, [1.5, float(i)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    crows = {r.vec_id: r.codes for r in A.sq_encode(const, dim=2).collect()}
    assert all(cs[0] == 0 for cs in crows.values())
    t = A.sq_topk(const, [0], k=3, dim=2).collect()
    assert len(t) == 3 and all(r.cos is not None for r in t)


def test_snippets_semantics(spark, corpus):
    """KWIC snippets: first-match position is the min over matching
    terms, the window clamps at both document ends, and non-matching /
    empty docs are dropped."""
    rows = {
        r.doc_id: r
        for r in T.snippets(corpus, ["fox", "bank"], width=2).collect()
    }
    # BASE: 'the quick brown fox jumps over the lazy dog near the
    # river bank' -> first match 'fox' at 0-based pos 3
    assert rows[0].pos == 3
    assert rows[0].snippet == "quick brown fox jumps over"
    assert rows[1].snippet == rows[0].snippet  # exact dup doc
    assert 3 not in rows and 5 not in rows  # no match / empty doc

    # window clamps at the start
    head = {
        r.doc_id: r
        for r in T.snippets(corpus, ["the"], width=2).collect()
    }
    # left-clamped windows keep the full 2w+1 length (extend right)
    assert head[0].pos == 0
    assert head[0].snippet == "the quick brown fox jumps"
    # ... and at the end ('bank' is the last token)
    tail = T.snippets(corpus, ["bank"], width=2).collect()
    t0 = next(r for r in tail if r.doc_id == 0)
    assert t0.snippet == "the river bank"


def test_fuzzy_terms_semantics(spark):
    """Deletion-variant candidates + levenshtein verify equal the
    brute-force distance-1 definition on a vocabulary with planted
    neighbors of every edit kind (sub/ins/del/equal), and distance-2
    lookalikes ('ab' vs 'ba') are rejected by the verify step."""
    from chearch_spark.operators import fuzzy as FZ

    rows = [
        (0, "merge target"),
        (1, "merje sub"),        # substitution
        (2, "merg deletion"),    # term is missing a char
        (3, "mmerge insertion"), # term has an extra char
        (4, "marge sub2"),
        (5, "ab ba transposition lookalike"),
        (6, "unrelated tokens entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.term, r.dist) for r in FZ.fuzzy_terms(df, "merge").collect()}
    assert ("merge", 0) in got
    assert ("merje", 1) in got and ("merg", 1) in got
    assert ("mmerge", 1) in got and ("marge", 1) in got
    assert all(t not in {"sub", "unrelated"} for t, _ in got)

    # classic levenshtein: 'ab' <-> 'ba' is distance 2 (no
    # transposition edit) even though they share deletion variants
    got_ab = {r.term for r in FZ.fuzzy_terms(df, "ab").collect()}
    assert "ab" in got_ab and "ba" not in got_ab

    with pytest.raises(ValueError, match="max_edits=1"):
        FZ.fuzzy_terms(df, "merge", max_edits=2)


def test_index_fuzzy_probe_and_search(spark, tmp_path_factory):
    """Index.fuzzy_terms over the dictionary parquet matches the
    docs-level operator (same vocabulary invariant), and fuzzy_search
    equals search() over the OR-fold of the expansion terms."""
    from chearch_spark.build import build_index
    from chearch_spark.operators import fuzzy as FZ
    from chearch_spark.plans.query import Term
    from chearch_spark.search import Index

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out = str(tmp_path_factory.mktemp("fuzzy_ix"))
    build_index(spark, docs, out, num_segments=4, resume=False)
    ix = Index(spark, out)

    a = {(r.term, r.df, r.dist) for r in ix.fuzzy_terms("merg").collect()}
    b = {
        (r.term, r.df, r.dist)
        for r in FZ.fuzzy_terms(docs, "merg").collect()
    }
    assert a == b
    assert any(t == "merge" for t, _d, _x in a)

    fs = ix.fuzzy_search("merg", k=10).collect()
    exp = sorted(
        ix.fuzzy_terms("merg").collect(),
        key=lambda r: (r.dist, -r.df, r.term),
    )[:FZ.MAX_FUZZY_EXPANSIONS]
    node = Term(exp[0].term)
    for r in exp[1:]:
        node = node | Term(r.term)
    want = ix.search(node, k=10).collect()
    assert [(r.doc_id, r.score) for r in fs] == [
        (r.doc_id, r.score) for r in want
    ]
    # a query with no dictionary neighbors -> empty, no crash
    assert ix.fuzzy_search("zzqqxx", k=5).count() == 0


def test_fuzzy_leaf_composes_and_paths_agree(spark, tmp_path_factory):
    """The Fuzzy query leaf expands inside the algebra (AND/OR/Diff
    compose), the driver-side and distributed expansions are
    identical, and local_search answers Fuzzy queries too."""
    from chearch_spark.build import build_index
    from chearch_spark.operators.fuzzy import MAX_FUZZY_EXPANSIONS
    from chearch_spark.plans.query import Fuzzy, Term
    from chearch_spark.search import Index

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out = str(tmp_path_factory.mktemp("fuzzy_leaf_ix"))
    build_index(spark, docs, out, num_segments=4, resume=False)
    ix = Index(spark, out)

    # driver-path expansion == distributed probe, ranked identically
    drv = ix._fuzzy_expansion_terms("merg")
    dist = sorted(
        ix.fuzzy_terms("merg").collect(),
        key=lambda r: (r.dist, -r.df, r.term),
    )[:MAX_FUZZY_EXPANSIONS]
    assert drv == [r.term for r in dist] and "merge" in drv

    # Fuzzy(q) == OR-fold of the expansion; composes under AND
    a = ix.search(Fuzzy("merg"), k=10).collect()
    assert a == ix.fuzzy_search("merg", k=10).collect()
    comp = ix.search(Fuzzy("merg") & Term("sort"), k=10).collect()
    exp = ix.search(
        _or_fold([Term(t) for t in drv]) & Term("sort"), k=10
    ).collect()
    assert comp == exp

    # local path answers the same query shape
    loc = ix.local_search(Fuzzy("merg"), k=10)
    assert [(r[0], round(r[1], 9)) for r in loc] == [
        (r.doc_id, round(r.score, 9)) for r in a
    ]

    # MixedCase + non-token fuzzy input
    assert ix.search(Fuzzy("MERG"), k=5).collect() == ix.search(
        Fuzzy("merg"), k=5
    ).collect()
    with pytest.raises(ValueError, match="not a token"):
        ix.search(Fuzzy("two words"), k=5).collect()


def _or_fold(terms):
    node = terms[0]
    for t in terms[1:]:
        node = node | t
    return node


def test_sq_bounds_large_dim_path_identical(spark):
    """The posexplode bounds path (dim > SQ_BOUNDS_JVM_MAX_DIM) and
    the wide-agg JVM path produce IDENTICAL (mins, scales) on the same
    data, and sq_topk works end-to-end through the large-dim path."""
    rng = np.random.default_rng(11)
    dim = 300
    rows = [
        (i, [float(x) for x in rng.normal(size=dim).astype(np.float32)])
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    import chearch_spark.operators.ann as ann

    big = A.sq_bounds(df, dim=dim).collect()[0]  # explode path
    old = ann.SQ_BOUNDS_JVM_MAX_DIM
    try:
        ann.SQ_BOUNDS_JVM_MAX_DIM = 10_000  # force the JVM path
        jvm = A.sq_bounds(df, dim=dim).collect()[0]
    finally:
        ann.SQ_BOUNDS_JVM_MAX_DIM = old
    assert list(big.mins) == list(jvm.mins)
    assert list(big.scales) == list(jvm.scales)

    got = A.sq_topk(df, [0, 1], k=5, dim=dim).collect()
    assert len(got) == 10 and all(r.cos is not None for r in got)


def test_facet_counts_semantics(spark, tmp_path_factory):
    """Facet counts over a query's doc set: per-value totals,
    multi-facet melt in one pass, NULL facet values counted like SQL
    GROUP BY."""
    from chearch_spark.build import build_index
    from chearch_spark.plans.query import Term
    from chearch_spark.search import Index

    rows = [
        (0, "alpha beta", "en", "web"),
        (1, "alpha gamma", "en", None),
        (2, "alpha", "de", "web"),
        (3, "delta only", "fr", "books"),
    ]
    meta = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = str(tmp_path_factory.mktemp("facet_ix"))
    build_index(
        spark, meta.select("doc_id", "text"), out,
        num_segments=2, resume=False,
    )
    ix = Index(spark, out)
    got = {
        (r.facet, r.value): r.n_docs
        for r in ix.facet_counts(
            Term("alpha"), meta, ["lang", "source"]
        ).collect()
    }
    assert got == {
        ("lang", "en"): 2,
        ("lang", "de"): 1,
        ("source", "web"): 2,
        ("source", None): 1,
    }

    # size-adaptive semi-join (VERDICT r5 #1): above the threshold the
    # id relation must NOT broadcast (forced shuffle semi-join — the
    # kernel output's size is only an estimate to Catalyst), below it
    # it must; answers identical on both shapes
    bound = ix._match_upper_bound(Term("alpha"))
    assert bound >= 3  # df('alpha') — the true match count's ceiling
    shuffled = ix.facet_counts(
        Term("alpha"), meta, ["lang", "source"], broadcast_threshold=0
    )
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, "over-threshold id set broadcast"
    got_shuffled = {
        (r.facet, r.value): r.n_docs for r in shuffled.collect()
    }
    assert got_shuffled == got
    bcast = ix.facet_counts(
        Term("alpha"), meta, ["lang", "source"],
        broadcast_threshold=1_000_000,
    )
    bplan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in bplan, "under-threshold id set not broadcast"
    assert {
        (r.facet, r.value): r.n_docs for r in bcast.collect()
    } == got


def test_significant_terms_semantics(spark, tmp_path_factory):
    """Significant terms: a term private to the match set scores the
    full lift (N/fg_n at bg_df == fg_df), a corpus-wide term scores
    1.0, rank is (score desc, term asc), min_fg_df prunes, and a
    no-match query yields an empty frame."""
    from chearch_spark.build import build_index
    from chearch_spark.plans.query import Term
    from chearch_spark.search import Index

    rows = [
        (0, "alpha zeta kappa"),
        (1, "alpha zeta kappa"),
        (2, "alpha zeta kappa"),
        (3, "kappa other"),
        (4, "kappa misc"),
        (5, "kappa stray"),
    ]
    meta = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("sig_ix"))
    build_index(
        spark, meta.select("doc_id", "text"), out,
        num_segments=2, resume=False,
    )
    ix = Index(spark, out)
    got = [
        (r.term, r.fg_df, r.bg_df, r.score)
        for r in ix.significant_terms(Term("alpha"), meta, k=10).collect()
    ]
    # fg = docs {0,1,2}: alpha and zeta are private to it (lift
    # N/fg_n = 6/3 = 2.0), kappa is corpus-wide (lift 1.0)
    assert got == [
        ("alpha", 3, 3, 2.0),
        ("zeta", 3, 3, 2.0),
        ("kappa", 3, 6, 1.0),
    ]
    # k truncates AFTER the (score desc, term asc) total order
    assert [r.term for r in
            ix.significant_terms(Term("alpha"), meta, k=2).collect()
            ] == ["alpha", "zeta"]
    # min_fg_df prunes low-support terms (zeta kept at 3, not at 4)
    assert [r.term for r in
            ix.significant_terms(Term("alpha"), meta, k=10,
                                 min_fg_df=4).collect()] == []
    # no matches -> empty
    assert ix.significant_terms(
        Term("zz_missing_zz"), meta, k=10
    ).count() == 0


def test_significant_terms_impossible_sentinel(spark, tmp_path_factory):
    """A zero-expansion leaf (Wildcard with no dictionary matches)
    must yield an EMPTY frame even when the corpus contains the word
    'impossible' — regression for the _IMPOSSIBLE sentinel being
    re-normalized into a real term by a second _prep pass."""
    from chearch_spark.build import build_index
    from chearch_spark.plans.query import Wildcard
    from chearch_spark.search import Index

    rows = [(0, "impossible kappa"), (1, "kappa misc")]
    meta = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("sig_imp_ix"))
    build_index(
        spark, meta.select("doc_id", "text"), out,
        num_segments=1, resume=False,
    )
    ix = Index(spark, out)
    assert ix.significant_terms(Wildcard("zzqx*"), meta, k=10).count() == 0
    # _prep is idempotent on the sentinel itself
    assert ix._prep(ix._prep(Wildcard("zzqx*"))) == ix._prep(
        Wildcard("zzqx*")
    )


def test_facet_range_semantics(spark, tmp_path_factory):
    """Range facets: half-open [lo, hi) fixed-width buckets with floor
    semantics (below-start values land in negative buckets), NULLs
    group under a NULL bucket, empty buckets absent, width<=0
    raises."""
    import pytest

    from chearch_spark.build import build_index
    from chearch_spark.plans.query import Term
    from chearch_spark.search import Index

    rows = [
        (0, "alpha beta", 0),     # bucket [0, 50)
        (1, "alpha gamma", 49),   # bucket [0, 50)
        (2, "alpha", 50),         # bucket [50, 100)
        (3, "alpha", -3),         # bucket [-50, 0) — floor, not clip
        (4, "alpha", None),       # NULL bucket
        (5, "delta only", 10),    # non-matching: excluded
    ]
    meta = spark.createDataFrame(rows, "doc_id long, text string, n int")
    out = str(tmp_path_factory.mktemp("facet_range_ix"))
    build_index(
        spark, meta.select("doc_id", "text"), out,
        num_segments=2, resume=False,
    )
    ix = Index(spark, out)
    got = {
        (r.lo, r.hi): r.n_docs
        for r in ix.facet_range(Term("alpha"), meta, "n", 0, 50).collect()
    }
    assert got == {(0, 50): 2, (50, 100): 1, (-50, 0): 1, (None, None): 1}

    # shifted start moves the bucket grid, same floor discipline
    got = {
        (r.lo, r.hi): r.n_docs
        for r in ix.facet_range(Term("alpha"), meta, "n", 40, 10).collect()
    }
    assert got[(0, 10)] == 1 and got[(40, 50)] == 1 and got[(50, 60)] == 1

    with pytest.raises(ValueError, match="width"):
        ix.facet_range(Term("alpha"), meta, "n", 0, 0)


def test_suggest_ranking(spark, tmp_path_factory):
    """Prefix autocomplete: df-ranked (df desc, term asc), k-limited,
    case-folded input, non-token prefixes raise; the plan is a
    TakeOrderedAndProject over the range-pruned dictionary scan."""
    import pytest

    from chearch_spark.build import build_index
    from chearch_spark.search import Index

    rows = [
        (0, "apple apply ant"),
        (1, "apple apply"),
        (2, "apple banana"),
        (3, "ant banana"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("suggest_ix"))
    build_index(spark, docs, out, num_segments=2, resume=False)
    ix = Index(spark, out)

    # df: apple=3, apply=2, ant=2 — ties (apply/ant at 2) break term asc
    got = [(r.term, r.df) for r in ix.suggest("a", k=8).collect()]
    assert got == [("apple", 3), ("ant", 2), ("apply", 2)]
    # narrower prefix excludes ant; k truncates the ranked list
    assert [(r.term, r.df) for r in ix.suggest("ap", k=1).collect()] == [
        ("apple", 3)
    ]
    # case-folded like every query path; unknown prefix is empty
    assert [r.term for r in ix.suggest("APP", k=8).collect()] == [
        "apple", "apply"
    ]
    assert ix.suggest("zz", k=8).count() == 0
    with pytest.raises(ValueError):
        ix.suggest("two words")

    plan = (
        ix.suggest("a", k=8)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, "ranked limit not top-k planned"


def test_pack_sequences_semantics(spark):
    """Concat-and-chunk packing: exclusive prefix sum in doc_id order
    drives (seq_id, offset); docs straddle boundaries; zero-token docs
    occupy a position but advance nothing; output is identical at any
    bucket count (parallelism invariance of the two-pass scan)."""
    from chearch_spark.operators.packing import pack_sequences

    rows = [
        (0, "a b c"),            # 3 tokens: before 0  -> seq 0 off 0
        (1, "d e f g"),          # 4 tokens: before 3  -> seq 0 off 3
        (2, ""),                 # 0 tokens: before 7  -> seq 1 off 2
        (3, "h i j k l m"),      # 6 tokens: before 7  -> seq 1 off 2
        (4, "n"),                # 1 token:  before 13 -> seq 2 off 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = [
        (0, 3, 0, 0),
        (1, 4, 0, 3),
        (2, 0, 1, 2),
        (3, 6, 1, 2),
        (4, 1, 2, 3),
    ]

    def got(**kw):
        return sorted(
            (r.doc_id, r.n_tokens, r.seq_id, r.offset)
            for r in pack_sequences(df, 5, **kw).collect()
        )

    assert got() == want
    # bucket-count invariance: 1 bucket (serial) == 2 == 256
    assert got(num_buckets=1) == want
    assert got(num_buckets=2) == want
    # empty input
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty, 5).count() == 0
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, 0)


def test_sample_hash_semantics(spark, corpus):
    """Deterministic hash sampling: rate bounds enforced; keep set is
    run-deterministic; NESTED across rates under one salt; salts draw
    different sets; rate 0/1 are empty/identity; approximate rate
    holds on a larger key space."""
    from chearch_spark.operators.pipeline import sample_hash

    ids = lambda df: {r.doc_id for r in df.select("doc_id").collect()}
    with pytest.raises(ValueError, match="rate"):
        sample_hash(corpus, 1.5)
    assert ids(sample_hash(corpus, 0.0)) == set()
    assert ids(sample_hash(corpus, 1.0)) == ids(corpus)
    s3 = ids(sample_hash(corpus, 0.3))
    assert s3 == ids(sample_hash(corpus, 0.3))  # deterministic
    assert s3 <= ids(sample_hash(corpus, 0.7))  # nesting
    # larger key space: rate accuracy and salt independence
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = ids(sample_hash(big, 0.25))
    b = ids(sample_hash(big, 0.25, salt="v2"))
    assert 0.20 * 2000 <= len(a) <= 0.30 * 2000
    assert a != b  # different salts draw different sets
    assert a <= ids(sample_hash(big, 0.5))


def test_decontaminate_planted(spark):
    """GPT-3-style n-gram decontamination: a training doc sharing an
    exact 5-token window with the eval set is flagged; sharing only a
    4-token run is not; short docs (< n tokens) never flag; the keep
    set is the complement of the contaminated set."""
    from chearch_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares 'quick brown fox jumps over' (5 consecutive)
            (1, "intro words then quick brown fox jumps over and more"),
            # only 4 consecutive shared ('brown fox jumps over' split)
            (2, "quick brown fox jumps NOT over anything shared here"),
            (3, "completely unrelated text about sorting algorithms"),
            (4, "tiny doc"),  # < n tokens: 0 windows
            # the eval text verbatim: every window hits
            (5, "the quick brown fox jumps over the lazy dog tonight"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in decontaminate(train, bench, n=5).collect()
    }
    assert out[1].contaminated and out[1].n_hits >= 1
    assert not out[2].contaminated
    assert not out[3].contaminated
    assert out[4].n_windows == 0 and not out[4].contaminated
    assert out[5].contaminated and out[5].hit_fraction == 1.0
    keep = {d for d, r in out.items() if not r.contaminated}
    assert keep == {2, 3, 4}


def test_decontaminate_plan_broadcasts_bench(spark):
    """The benchmark window-hash side must BROADCAST (eval sets are
    tiny vs the corpus); the corpus text never shuffles — only the
    per-doc count pairs do."""
    from chearch_spark.operators.dedup import decontaminate

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    df = decontaminate(docs, docs.filter("doc_id % 37 = 0"), n=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_pii_scan_and_redact(spark):
    """Privacy pass: typed counts and tag substitution for planted
    emails / IPv4s / phones; clean docs untouched; NULL text pinned
    to empty; engine == DuckDB on the same rows (regex dialect
    parity for the pinned cross-engine pattern subset)."""
    import duckdb
    import pandas as pd

    from chearch_spark.operators.pipeline import (
        pii_scan,
        pii_scan_sql,
        redact_pii,
        redact_pii_sql,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "contact john.doe+x@example.co.uk or 192.168.1.10",
                "call 555-123-4567 or 555.987.6543 now",
                "clean text about merge sort",
                None,
                "a@b.io end",
                "v1.2.3 is a version, not an ip; 12-34-5678 not a phone",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = pii_scan(docs).orderBy("doc_id").toPandas()
    assert got.n_email.tolist() == [1, 0, 0, 0, 1, 0]
    assert got.n_ipv4.tolist() == [1, 0, 0, 0, 0, 0]
    assert got.n_phone.tolist() == [0, 2, 0, 0, 0, 0]
    assert got.has_pii.tolist() == [True, True, False, False, True, False]
    red = redact_pii(docs).orderBy("doc_id").toPandas()
    assert red.text[0] == "contact <EMAIL> or <IPV4>"
    assert red.text[1] == "call <PHONE> or <PHONE> now"
    assert red.text[2] == "clean text about merge sort"
    assert red.text[3] == ""  # NULL pinned to empty
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.sql(pii_scan_sql()).df().sort_values("doc_id")
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
    wantr = con.sql(redact_pii_sql()).df().sort_values("doc_id")
    assert (
        red[["doc_id", "text"]]
        .reset_index(drop=True)
        .equals(wantr.reset_index(drop=True))
    )


def test_collocations_planted(spark):
    """PMI collocations: an always-adjacent planted pair ranks above a
    frequent-but-independent pair; min_count floors noise; single-token
    docs contribute no bigrams."""
    import duckdb
    import pandas as pd

    from chearch_spark.functions.text import collocations, collocations_sql

    rows = []
    # 'neural network' always adjacent (10x); filler words appear often
    # but in varying contexts
    for i in range(10):
        rows.append((i, f"neural network filler{i % 3} the data the"))
    # filler words also occur OUTSIDE their post-'network' slot, so
    # (network, fillerX) is diluted while (neural, network) stays
    # perfectly adjacent
    for j in range(5):
        rows.append((50 + j, "filler0 data filler1 the filler2 data"))
    rows.append((100, "solo"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = collocations(
        spark.createDataFrame(pdf), min_count=3, k=10
    ).toPandas()
    assert out.iloc[0].w1 == "neural" and out.iloc[0].w2 == "network"
    assert (out.n_pair >= 3).all()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.sql(collocations_sql(min_count=3, k=10)).df()
    assert out.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_decontaminate_strided_corpus_full_bench(spark):
    """Corpus stride > 1 must still catch overlap at UNALIGNED bench
    offsets: the benchmark side always enumerates at stride 1."""
    import duckdb
    import pandas as pd

    from chearch_spark.operators.dedup import decontaminate, decontaminate_sql

    bench = spark.createDataFrame(
        [(0, "zero quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    # doc 1's only window at stride 2 starts at its token 0 and maps to
    # bench offset 1 (odd): a strided bench would never hash it
    train_pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "quick brown fox jumps over",
                "nothing shared here at all today",
            ],
        }
    )
    train = spark.createDataFrame(train_pdf)
    out = {
        r.doc_id: r
        for r in decontaminate(train, bench, n=5, stride=2).collect()
    }
    assert out[1].contaminated
    assert not out[2].contaminated
    # SQL mirror agrees under the same stride (bench CTE is stride 1)
    con = duckdb.connect()
    full = pd.concat(
        [
            pd.DataFrame(
                {"doc_id": [0], "text": [
                    "zero quick brown fox jumps over the lazy dog"
                ]}
            ),
            train_pdf,
        ]
    )
    con.register("documents", full)
    want = {
        r[0]: r
        for r in con.sql(
            decontaminate_sql(n=5, stride=2, bench_where="doc_id = 0")
        ).fetchall()
    }
    got = {
        r.doc_id: (r.doc_id, r.n_windows, r.n_hits, r.hit_fraction,
                   r.contaminated)
        for r in decontaminate(
            spark.createDataFrame(full),
            spark.createDataFrame(full).filter("doc_id = 0"),
            n=5,
            stride=2,
        ).collect()
    }
    assert got == want


def test_sample_mixture_semantics(spark):
    """Domain-mixture sampling: each group's slice equals sample_hash
    at that group's rate; raising one rate only adds that group's
    rows; unknown/NULL groups take the default; validation rejects
    out-of-range rates."""
    import pandas as pd
    import pytest as _pt

    from chearch_spark.operators.pipeline import sample_hash, sample_mixture

    pdf = pd.DataFrame(
        {
            "doc_id": range(400),
            "source": (["wiki", "web", "forum", None] * 100),
        }
    )
    docs = spark.createDataFrame(pdf)
    rates = {"wiki": 1.0, "web": 0.4}
    kept = sample_mixture(docs, rates, default_rate=0.2)
    by_src = {}
    for r in kept.collect():
        by_src.setdefault(r.source, set()).add(r.doc_id)
    # wiki: rate 1.0 keeps everything
    assert by_src["wiki"] == {
        r.doc_id for r in docs.filter("source = 'wiki'").collect()
    }
    # web slice == sample_hash at 0.4 over the web subset
    assert by_src.get("web", set()) == {
        r.doc_id
        for r in sample_hash(docs.filter("source = 'web'"), 0.4).collect()
    }
    # forum + NULL take the default rate
    assert by_src.get("forum", set()) == {
        r.doc_id
        for r in sample_hash(docs.filter("source = 'forum'"), 0.2).collect()
    }
    assert by_src.get(None, set()) == {
        r.doc_id
        for r in sample_hash(docs.filter("source IS NULL"), 0.2).collect()
    }
    # monotone: raising web's rate only ADDS web rows
    kept2 = {
        r.doc_id
        for r in sample_mixture(
            docs, {"wiki": 1.0, "web": 0.8}, default_rate=0.2
        ).collect()
    }
    assert {r.doc_id for r in kept.collect()} <= kept2
    with _pt.raises(ValueError):
        sample_mixture(docs, {"wiki": 1.5})
    with _pt.raises(ValueError):
        sample_mixture(docs, {"wiki": 1.0}, default_rate=-0.1)
