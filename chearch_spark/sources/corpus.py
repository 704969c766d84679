"""Corpus sources: testdata readers + the deterministic synthetic
generator (FIXTURES.md F1).

Two input shapes are supported:

* the driver's ``documents`` table ``(doc_id, text, lang, source,
  n_chars)`` (TESTDATA.md / FIXTURES F5), and
* the north-rule source-code corpus ``(repo, path, commit, lang,
  content)`` (BASELINE.json input_hint), which :func:`synth_code_corpus`
  synthesizes deterministically at small scale for tests — no external
  data.

Both normalize to the engine's canonical build input
``(doc_id: long, text: string)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# 2,000-word code vocabulary with Zipf(1.3) frequencies (FIXTURES F1).
_VOCAB_CORE = [
    "def", "class", "import", "return", "index", "query", "term", "the",
    "for", "while", "if", "else", "try", "except", "lambda", "yield",
    "self", "none", "true", "false", "spark", "merge", "sort", "scan",
    "join", "filter", "group", "agg", "partition", "shuffle", "segment",
    "posting", "score", "bm25", "token", "hash", "block", "doc", "data",
]


def _vocab(n: int = 2000) -> list[str]:
    out = list(_VOCAB_CORE)
    i = 0
    while len(out) < n:
        out.append(f"sym_{i:04d}")
        i += 1
    return out[:n]


def synth_code_corpus(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic F1 corpus: (repo, path, commit, lang, content).

    seed=42, numpy PCG64, Zipf(1.3) token draws; the hot term 'the'
    lands in ~50% of docs at every scale (the skew sub-fixture is
    always on).  Partition-known terms ``pterm_{p}_{s}``
    mirror `synthdataindexer.chpl:34-49` locale-known terms.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.array(_vocab(), dtype=object)
    langs = np.array(["py", "java", "scala", "c", "go", "chpl"], dtype=object)
    lang_w = np.array([0.35, 0.2, 0.15, 0.12, 0.1, 0.08])
    exts = {"py": "py", "java": "java", "scala": "scala", "c": "c",
            "go": "go", "chpl": "chpl"}

    lens = rng.integers(5, 201, size=n_docs)
    lang_pick = rng.choice(langs, size=n_docs, p=lang_w)
    hot = rng.random(n_docs) < 0.5  # hot-term sub-fixture
    rows = []
    n_parts = 8
    for i in range(n_docs):
        # Zipf(1.3) ranks clipped into vocab
        ranks = np.minimum(rng.zipf(1.3, size=int(lens[i])) - 1, len(vocab) - 1)
        toks = list(vocab[ranks])
        if hot[i] or i % 20 == 0:
            toks.insert(int(rng.integers(0, len(toks) + 1)), "the")
        rows.append(toks)
    # partition-known terms: pterm_{p}_{s} in exactly s docs of stripe p
    extra: dict[int, list[str]] = {}
    for p in range(n_parts):
        for s in range(1, 33):
            for j in range(s):
                target = (s * (s - 1) // 2 + j) * n_parts + p
                if target < n_docs:
                    extra.setdefault(target, []).append(f"pterm_{p}_{s}")
    seps = np.array([" ", "\n", " ", "  ", "\t", "; ", "("], dtype=object)
    contents = []
    for i, toks in enumerate(rows):
        toks = toks + extra.get(i, [])
        sep_pick = seps[rng.integers(0, len(seps), size=max(len(toks) - 1, 0))]
        parts = []
        for j, t in enumerate(toks):
            parts.append(t)
            if j < len(toks) - 1:
                parts.append(str(sep_pick[j]))
        contents.append("".join(parts))

    repo = [f"org{i % 7}/repo{i % 23}" for i in range(n_docs)]
    path = [
        f"src/d{i % 13}/f{i}.{exts[str(lang_pick[i])]}" for i in range(n_docs)
    ]
    commit = [
        hashlib.sha1(f"{repo[i]}/{path[i]}".encode()).hexdigest()
        for i in range(n_docs)
    ]
    return pd.DataFrame(
        {
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": [str(x) for x in lang_pick],
            "content": contents,
        }
    )


def load_documents(spark, sf_dir: str):
    """Driver testdata documents table -> canonical (doc_id, text) plus
    passthrough metadata columns."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def corpus_from_documents(df):
    """documents(doc_id, text, ...) -> build input (doc_id, text)."""
    return df.select("doc_id", "text")


def corpus_from_code(spark, pdf: pd.DataFrame):
    """F1 code corpus -> build input; doc_id = stable hash of
    (repo,path,commit) like the reference's caller-assigned external id.
    Uses the engine-portable md5-derived hash (non-negative, DuckDB-
    reproducible) per the repo hashing rule — xxhash64 differs across
    engines and is signed."""
    from pyspark.sql import functions as F

    from chearch_spark.functions.hashing import md5_long

    df = spark.createDataFrame(pdf)
    return df.select(
        md5_long(F.concat_ws("\x1f", "repo", "path", "commit")).alias(
            "doc_id"
        ),
        F.col("content").alias("text"),
    )
