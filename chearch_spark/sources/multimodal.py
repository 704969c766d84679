"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched kernels over ``mapInPandas``.

Third-party image/audio libraries are not available in this
environment, so the DEFAULT decode step is a deterministic stub —
but the seam is real, and since r6 so is one decoder: the
stdlib-only PNG codec (:mod:`chearch_spark.sources.decoders.png`,
zlib + numpy) plugs into ``set_decoder``/``CHEARCH_MEDIA_DECODER``
and backs :func:`resize_images`.  Everything Spark-side is shared by
stub and real paths alike: schema (binary + struct metadata),
partitioning behavior, Pandas-UDF signatures, and Arrow batch
shapes.  Swapping decoders changes one function body, not the plan.

Scale notes: binary payloads ride ordinary parquet columns; the
kernels are per-row projections inside ``mapInPandas`` (Arrow
batches, no shuffle), so the operators scale linearly with input
splits.  Keep ``spark.sql.files.maxPartitionBytes`` sized so one
batch of payloads fits executor memory (e.g. 64 MB splits for ~1 MB
media blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = (
    "doc_id long, kind string, payload binary, width int, height int, "
    "sample_rate int"
)
FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, byte_sum long, "
    "byte_min int, byte_max int"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from the documents table:
    payload = utf-8 bytes of the text (an opaque blob as far as the
    pipeline is concerned), kind/width/height/sample_rate derived from
    doc_id.  Stands in for a real (repo, path, blob) media source."""
    d = F.col("doc_id")
    # pmod, not %: Spark % keeps the dividend's sign, and callers like
    # corpus_from_code produce negative doc ids
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(k) for k in KINDS]),
            (F.pmod(d, F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        (F.pmod(d, F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(d, F.lit(48)) + 16).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """(doc_id, kind, n_bytes, sha256) — pure JVM projection over the
    binary column (no decode)."""
    return media.select(
        "doc_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


def media_metadata_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB mirror over the same derivation (encode = utf-8 blob)."""
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    return f"""
SELECT doc_id,
       [{kinds}][CAST(((doc_id % 3) + 3) % 3 + 1 AS INTEGER)] AS kind,
       CAST(octet_length(encode({text_col})) AS BIGINT) AS n_bytes,
       sha256({text_col}) AS sha256
FROM {table}
"""


def media_features_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB mirror of :func:`extract_features` over the derived fake
    payloads.  Uses codepoints as bytes — exact for the ASCII testdata
    (the payload is the text's utf-8 bytes); a non-ASCII corpus would
    need a blob-level byte iterator instead."""
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    t = f"coalesce({text_col}, '')"
    codes = f"list_transform(string_split({t}, ''), c -> ascii(c))"
    return f"""
SELECT doc_id,
       [{kinds}][CAST(((doc_id % 3) + 3) % 3 + 1 AS INTEGER)] AS kind,
       CAST(octet_length(encode({t})) AS BIGINT) AS n_bytes,
       CAST(CASE WHEN length({text_col}) > 0
            THEN list_sum({codes}) ELSE 0 END AS BIGINT) AS byte_sum,
       CAST(CASE WHEN length({text_col}) > 0
            THEN list_min({codes}) ELSE 0 END AS INTEGER) AS byte_min,
       CAST(CASE WHEN length({text_col}) > 0
            THEN list_max({codes}) ELSE 0 END AS INTEGER) AS byte_max
FROM {table}
"""


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """Decode stub.  A real deployment plugs Pillow / soundfile /
    ffmpeg here; this environment has none of them, so we use the
    deterministic fake: the raw bytes as a uint8 array.  Raises
    ``NotImplementedError`` for unknown kinds, as a real decoder
    would for unsupported codecs."""
    if kind not in KINDS:
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    return np.frombuffer(payload or b"", dtype=np.uint8)


# --- decoder injection seam ----------------------------------------------
# A REAL decoder is a callable (payload: bytes, kind: str) -> uint8
# ndarray.  Resolution order: explicit `decoder=` argument >
# set_decoder() injection (where set_decoder(None) FORCES the stub,
# overriding the env — code that demands the deterministic path must
# win over ambient configuration) > CHEARCH_MEDIA_DECODER env
# ("pkg.mod:attr") > None (the stub fast path, which skips per-row
# decode entirely and reduces over the raw payload buffer — the
# deterministic CI path the driver contract gates).
_UNSET = object()
_DECODER = _UNSET


def set_decoder(fn) -> None:
    """Inject a media decoder process-wide.  ``set_decoder(None)``
    FORCES the stub (overrides a CHEARCH_MEDIA_DECODER env setting);
    :func:`reset_decoder` returns to the default env-aware resolution.
    The decoder is resolved at PLAN BUILD time and captured in the
    kernel closure, so it must be picklable (a module-level function,
    not a lambda over live handles)."""
    global _DECODER
    _DECODER = fn


def reset_decoder() -> None:
    """Drop any :func:`set_decoder` injection or stub-forcing: the
    CHEARCH_MEDIA_DECODER env (or the stub) applies again."""
    global _DECODER
    _DECODER = _UNSET


def resolve_decoder(explicit=None):
    """The decoder the kernels will use (None = stub fast path)."""
    if explicit is not None:
        return explicit
    if _DECODER is not _UNSET:
        return _DECODER  # may be None: an explicitly forced stub
    import importlib
    import os

    spec = os.environ.get("CHEARCH_MEDIA_DECODER")
    if spec:
        mod, _, attr = spec.partition(":")
        if not attr:
            raise ValueError(
                "CHEARCH_MEDIA_DECODER must be 'pkg.mod:attr', got "
                f"{spec!r}"
            )
        return getattr(importlib.import_module(mod), attr)
    return None


def _check_kinds(pdf: pd.DataFrame, dec) -> None:
    """Vectorized unknown-kind rejection — STUB PATH ONLY.  An
    injected decoder owns its support matrix (it may handle kinds the
    builtin set does not, e.g. 'pdf'); gating on KINDS before calling
    it would make the injection seam pointless, so the decoder itself
    raises NotImplementedError for kinds it rejects.  Shared by every
    media kernel so the entry points cannot disagree."""
    if dec is not None:
        return
    bad = set(pdf["kind"].unique()) - set(KINDS)
    if bad:
        raise NotImplementedError(
            f"no decoder for media kind(s) {sorted(bad)!r}"
        )


def _decode_batch(pdf: pd.DataFrame, dec) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated uint8 buffer, per-row lengths) for one Arrow
    batch.  Stub path: zero-copy view over the joined raw payloads.
    Injected-decoder path: per-row decode (an opaque codec cannot be
    vectorized across rows), then ONE concatenate — the downstream
    reduceat reduction stage is identical either way, which is the
    point of the seam: a real decoder changes the bytes, never the
    vectorized plan around them."""
    if dec is None:
        payloads = [bytes(p or b"") for p in pdf["payload"]]
        lens = np.fromiter(
            (len(p) for p in payloads), dtype=np.int64,
            count=len(payloads),
        )
        buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        return buf, lens
    arrs = [
        np.asarray(dec(bytes(p or b""), k), dtype=np.uint8).ravel()
        for p, k in zip(pdf["payload"], pdf["kind"])
    ]
    lens = np.fromiter(
        (a.size for a in arrs), dtype=np.int64, count=len(arrs)
    )
    buf = (
        np.concatenate(arrs) if arrs else np.empty(0, dtype=np.uint8)
    )
    return buf, lens


def extract_features(media: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over the decoded payload:
    exact-integer byte statistics (stable across engines, unlike
    float image stats).  mapInPandas: one pandas batch in, one out.

    Vectorized within the batch: unknown kinds are rejected as a set
    (the per-kind check :func:`decode_media` performs row-wise), then
    the whole batch's decoded payloads are viewed as ONE uint8 buffer
    and each statistic is a single ``reduceat`` over per-row
    boundaries — no per-row Python in the reduction.  ``decoder``
    (or the :func:`set_decoder` / env injection) swaps the stub for a
    real codec; see :func:`_decode_batch` — the reduction stage is
    unchanged either way."""
    dec = resolve_decoder(decoder)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _check_kinds(pdf, dec)
            buf, lens = _decode_batch(pdf, dec)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            nonempty = lens > 0
            byte_sum = np.zeros(len(lens), dtype=np.int64)
            byte_min = np.zeros(len(lens), dtype=np.int64)
            byte_max = np.zeros(len(lens), dtype=np.int64)
            if nonempty.any():
                ne_starts = starts[nonempty]
                byte_sum[nonempty] = np.add.reduceat(
                    buf.astype(np.int64), ne_starts
                )
                byte_min[nonempty] = np.minimum.reduceat(buf, ne_starts)
                byte_max[nonempty] = np.maximum.reduceat(buf, ne_starts)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": lens,
                    "byte_sum": byte_sum,
                    "byte_min": byte_min.astype("int32"),
                    "byte_max": byte_max.astype("int32"),
                }
            )

    return media.select("doc_id", "kind", "payload").mapInPandas(
        _kernel, FEATURE_SCHEMA
    )


def frame_sample(
    media: DataFrame,
    frame_bytes: int = 64,
    stride: int = 4,
    decoder=None,
) -> DataFrame:
    """Frame sampler: splits each decoded payload into fixed-size
    "frames" and keeps every ``stride``-th one — the plumbing shape of
    video frame sampling.  ``decoder`` injection as in
    :func:`extract_features`; the stub path frames the raw bytes."""
    dec = resolve_decoder(decoder)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _check_kinds(pdf, dec)
            buf, lens = _decode_batch(pdf, dec)
            # frames kept per doc, then one repeat/arange expansion to
            # (doc row, frame_idx) pairs — no per-row Python loop; the
            # frame bytes are offset slices of ONE concatenated buffer
            n_kept = (lens // frame_bytes + stride - 1) // stride
            doc_rows = np.repeat(np.arange(len(lens)), n_kept)
            offsets = np.concatenate(([0], np.cumsum(n_kept)))[:-1]
            frame_idx = (
                np.arange(len(doc_rows)) - offsets[doc_rows]
            ) * stride
            doc_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            frame_starts = doc_starts[doc_rows] + frame_idx * frame_bytes
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64)[doc_rows],
                    "frame_idx": frame_idx.astype("int32"),
                    "frame": pd.Series(
                        [
                            buf[s: s + frame_bytes].tobytes()
                            for s in frame_starts.tolist()
                        ],
                        dtype=object,
                    ),
                }
            )

    return media.select("doc_id", "kind", "payload").mapInPandas(
        _kernel, FRAME_SCHEMA
    )


def frame_digests(
    media: DataFrame,
    frame_bytes: int = 64,
    stride: int = 4,
    decoder=None,
) -> DataFrame:
    """Oracle-checkable projection over :func:`frame_sample`:
    (doc_id, frame_idx, n_bytes, frame_sha256).  The frame blobs
    themselves are deterministic byte slices, so their sha256 digests
    are verifiable by an independent engine (the driver's DuckDB
    oracle, :func:`frame_digests_sql`) — digests travel through the
    value-hash gate where raw binary columns cannot (engines disagree
    on binary repr, not on hex strings)."""
    f = frame_sample(media, frame_bytes, stride, decoder)
    return f.select(
        "doc_id",
        "frame_idx",
        F.length("frame").cast("long").alias("n_bytes"),
        F.sha2(F.col("frame"), 256).alias("frame_sha256"),
    )


def frame_digests_sql(
    table: str = "documents",
    text_col: str = "text",
    frame_bytes: int = 64,
    stride: int = 4,
) -> str:
    """DuckDB mirror of :func:`frame_digests` over the derived fake
    payloads (payload = utf-8 bytes of the text): every ``stride``-th
    ``frame_bytes``-sized slice, digested.  Uses character slicing as
    byte slicing — exact for the ASCII testdata, same assumption as
    :func:`media_features_sql`."""
    return f"""
WITH f AS (
  SELECT doc_id, coalesce({text_col}, '') AS t,
         octet_length(encode(coalesce({text_col}, ''))) // {frame_bytes}
           AS n_frames
  FROM {table}
), idx AS (
  SELECT doc_id, t, unnest(range(0, n_frames, {stride})) AS fi
  FROM f WHERE n_frames > 0
)
SELECT doc_id,
       CAST(fi AS INTEGER) AS frame_idx,
       CAST({frame_bytes} AS BIGINT) AS n_bytes,
       sha256(substr(t, fi * {frame_bytes} + 1, {frame_bytes})) AS frame_sha256
FROM idx
"""


RESIZED_SCHEMA = "doc_id long, width int, height int, png binary"


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize (r6; closes the r5 'no real decoder' gap):
    nearest-neighbor resample of PNG payloads through the stdlib PNG
    codec (:mod:`chearch_spark.sources.decoders.png` — zlib + numpy,
    no Pillow needed), re-encoded as PNG.  (doc_id, width, height,
    png binary); non-PNG payloads raise ``NotImplementedError`` like
    any decoder facing an unsupported codec.

    Same scale shape as every media kernel: an Arrow-batched
    per-row projection inside ``mapInPandas`` — no shuffle, payloads
    never leave their input split.  Nearest-neighbor is one numpy
    fancy-index per image (deterministic, no resample kernel to
    disagree about across platforms)."""
    from chearch_spark.sources.decoders.png import decode_png, encode_png

    w_out, h_out = int(width), int(height)
    if w_out <= 0 or h_out <= 0:
        raise ValueError("resize_images: width/height must be positive")

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                img = decode_png(bytes(p or b""))
                h_in, w_in = img.shape[:2]
                ys = (np.arange(h_out) * h_in) // h_out
                xs = (np.arange(w_out) * w_in) // w_out
                out.append(encode_png(img[ys][:, xs]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": np.full(len(pdf), w_out, dtype="int32"),
                    "height": np.full(len(pdf), h_out, dtype="int32"),
                    "png": pd.Series(out, dtype=object),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        _kernel, RESIZED_SCHEMA
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Pre-r6 stub, kept for the no-decoder path: raises eagerly at
    *plan build*.  For PNG payloads the real implementation exists —
    :func:`resize_images`."""
    raise NotImplementedError(
        "resize_stub is the no-decoder path; for PNG payloads use "
        "resize_images() (stdlib codec), or plug a decoder into "
        "decode_media() for other formats"
    )
