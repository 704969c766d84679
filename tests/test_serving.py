"""Wire-protocol parity: the TCP server must be queryable with raw
bytes exactly as the reference's util/query_client.py sends them
(request `[count:u8][PUSH t:u32be][PUSH t:u32be][AND]`, response
13-byte big-endian records)."""

import socket
import struct

import pytest

from chearch_spark.build import build_index
from chearch_spark.plans import chasm_wire
from chearch_spark.plans.query import And, Or, Term, from_postfix, to_postfix
from chearch_spark.search import Index
from chearch_spark.serving import ChearchTCPServer


def test_wire_roundtrip():
    node = (Term("a") & Term("b")) | Term("c")
    ids = {"a": 7, "b": 9, "c": 300000}
    rev = {v: k for k, v in ids.items()}
    wire = chasm_wire.ast_to_wire(node, ids.__getitem__)
    assert wire[0] == len(wire) - 1  # leading count byte
    back = chasm_wire.wire_to_ast(wire, rev.__getitem__)
    assert to_postfix(back) == to_postfix(node)


def test_wire_matches_reference_client_example():
    """The reference client sends bytearray([5, 1, 0,0,0,2]) for
    `PUSH term=2` (util/query_client.py:11-12) — byte-for-byte."""
    wire = chasm_wire.encode_program([("PUSH", 2)])
    assert wire == bytes([5, 1, 0, 0, 0, 2])
    assert chasm_wire.decode_program(wire) == [("PUSH", 2)]


def test_record_codec():
    rows = [(2, 7, 10), (3, 255, 2**40)]
    data = chasm_wire.encode_records(rows)
    assert len(data) == 26
    assert chasm_wire.decode_records(data) == rows
    # truncation at 8 records (chearch_srv.chpl:40)
    data = chasm_wire.encode_records([(1, 1, 1)] * 20)
    assert len(data) == 8 * 13


@pytest.fixture(scope="module")
def served_index(spark, tmp_path_factory):
    rows = [
        (10, "alpha beta gamma"),
        (15, "beta delta"),
        (20, "alpha beta alpha"),
    ]
    out = str(tmp_path_factory.mktemp("srv_ix"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, df, out, num_segments=2, resume=False)
    srv = ChearchTCPServer(Index(spark, out))
    srv.start()
    yield srv
    srv.stop()


def _ask(port: int, wire: bytes) -> list[tuple[int, int, int]]:
    with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
        s.sendall(wire)
        s.shutdown(socket.SHUT_WR)
        data = b""
        while True:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
    return chasm_wire.decode_records(data)


def test_tcp_server_term_query(served_index):
    srv = served_index
    tid = srv.term_ids.id_of("alpha")
    wire = bytes([5, 1]) + struct.pack(">I", tid)  # raw client bytes
    recs = _ask(srv.port, wire)
    # alpha occurs at positions 0,2 in doc 20 and 0 in doc 10
    assert {(r[1], r[2]) for r in recs} == {(0, 20), (2, 20), (0, 10)}
    assert all(r[0] == tid for r in recs)


def test_tcp_server_and_dual_emit(served_index):
    """AND emits BOTH operands' occurrences per matching doc
    (reference semantics, README.md:122-124)."""
    srv = served_index
    a, b = srv.term_ids.id_of("alpha"), srv.term_ids.id_of("delta")
    node = from_postfix([("PUSH", "alpha"), ("PUSH", "beta"), ("AND",)])
    wire = chasm_wire.ast_to_wire(node, srv.term_ids.id_of)
    recs = _ask(srv.port, wire)
    docs = {r[2] for r in recs}
    assert docs == {10, 20}  # docs containing both
    terms = {r[0] for r in recs}
    assert terms == {srv.term_ids.id_of("alpha"), srv.term_ids.id_of("beta")}
    # missing term -> empty
    assert _ask(srv.port, bytes([5, 1]) + struct.pack(">I", 0xFFFFFFF0)) == []
    assert a != b


def test_tcp_server_truncates_at_8(served_index):
    srv = served_index
    wire = bytes([5, 1]) + struct.pack(">I", srv.term_ids.id_of("beta"))
    node_rows = srv.index.parity_search(Term("beta"))
    recs = _ask(srv.port, wire)
    assert len(recs) == min(len(node_rows), 8)


def test_tcp_server_over_streamed_compacted_index(spark, tmp_path_factory):
    """Full online lifecycle: micro-batch ingest → finalize → compact →
    serve over the reference wire protocol.  The server must answer raw
    reference-client bytes identically before and after compaction."""
    from chearch_spark.streaming.compact import compact_stream_segments
    from chearch_spark.streaming.ingest import finalize_index, ingest_batch

    rows = [
        (10, "alpha beta gamma"),
        (15, "beta delta"),
        (20, "alpha beta alpha"),
        (25, "gamma delta"),
    ]
    out = str(tmp_path_factory.mktemp("srv_stream_ix"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for b in range(2):
        ingest_batch(df.filter(f"doc_id % 2 = {b * 5 % 2}"), out,
                     batch_id=b, num_segments=2)
    finalize_index(spark, out)
    srv = ChearchTCPServer(Index(spark, out))
    srv.start()
    try:
        tid = srv.term_ids.id_of("alpha")
        wire = bytes([5, 1]) + struct.pack(">I", tid)
        before = _ask(srv.port, wire)
        assert {(r[1], r[2]) for r in before} == {(0, 20), (2, 20), (0, 10)}
    finally:
        srv.stop()
    compact_stream_segments(spark, out, num_segments=1)
    srv2 = ChearchTCPServer(Index(spark, out))
    srv2.start()
    try:
        tid = srv2.term_ids.id_of("alpha")
        wire = bytes([5, 1]) + struct.pack(">I", tid)
        after = _ask(srv2.port, wire)
        assert {(r[1], r[2]) for r in after} == {(0, 20), (2, 20), (0, 10)}
    finally:
        srv2.stop()


def test_local_parity_matches_spark_parity(served_index):
    from chearch_spark.plans.query import And, Or, Term

    ix = served_index.index
    for q in (Term("alpha"), And(Term("beta"), Term("alpha")),
              Or(Term("alpha"), Term("delta"))):
        assert ix.local_parity_search(q) == ix.parity_search(q), q


def test_parity_kernel_truncates_before_gather(served_index):
    """r7: the partition_limit cut happens inside the per-segment
    kernel, so the driver-side result (== what was collected) is
    bounded by limit x segments even for a hot term — never
    O(query postings) — while stripping the limit returns the full
    occurrence set in the same emission order."""
    ix = served_index.index
    n_segs = len(ix._all_seg_ids())
    full = ix.parity_search(Term("beta"))  # in every doc: hot term
    assert len(full) >= 3
    limited = ix.parity_search(Term("beta"), partition_limit=1)
    assert len(limited) <= 1 * n_segs < len(full)
    # the limited rows are each segment's FIRST protocol row — a
    # prefix of the unlimited per-segment emission, so every limited
    # row appears in the full set
    assert set(limited) <= set(full)
    # batched path: same bound per query, identical to per-query
    many = ix.parity_search_many(
        {"h": Term("beta"), "a": Term("alpha")}, partition_limit=1
    )
    assert many["h"] == limited
    assert many["a"] == ix.parity_search(Term("alpha"), partition_limit=1)


def test_distributed_serving_mode(spark, tmp_path_factory):
    """mode='distributed' — the index-exceeds-driver-RAM regime (r4
    verdict stretch): responses are byte-identical to local mode, the
    per-request path is the candidate-pruned Spark scan
    (parity_search), and the term table is resolved LAZILY through the
    bounds sidecar — the vocabulary is never materialized."""
    from chearch_spark.serving import LazyTermIdMap, TermIdMap

    # enough distinct terms to spread over several dictionary part
    # files (write_dictionary range-partitions by term)
    rows = [
        (i, f"alpha shared term{i:04d} zz{i % 5}") for i in range(64)
    ]
    out = str(tmp_path_factory.mktemp("srv_dist_ix"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, df, out, num_segments=4, resume=False)
    ix = Index(spark, out)

    # lazy map == eager map, id for id, with bounded file reads
    eager = TermIdMap(ix)
    lazy = LazyTermIdMap(ix, cache_files=2)
    assert len(lazy) == len(eager)
    for t in ("alpha", "term0000", "term0063", "zz3"):
        assert lazy.id_of(t) == eager.id_of(t), t
    for tid in (0, 1, len(eager) - 1):
        assert lazy.term_of(tid) == eager.term_of(tid), tid
    assert lazy.term_of(len(eager)) is None
    with pytest.raises(KeyError):
        lazy.id_of("zz_not_a_term_zz")
    # laziness pinned: resolving a handful of terms must not have read
    # every dictionary file, and the LRU held at most cache_files
    assert lazy.files_read <= len(lazy._files)
    assert len(lazy._cache) <= 2

    srv = ChearchTCPServer(ix, mode="distributed")
    calls = {"n": 0}
    orig = ix.parity_search

    def spying(node, *a, **k):
        calls["n"] += 1
        return orig(node, *a, **k)

    ix.parity_search = spying
    srv.start()
    try:
        assert isinstance(srv.term_ids, LazyTermIdMap)
        tid = srv.term_ids.id_of("alpha")
        wire = bytes([5, 1]) + struct.pack(">I", tid)
        got = _ask(srv.port, wire)
        assert calls["n"] == 1, "request did not take the Spark path"
    finally:
        srv.stop()
        ix.parity_search = orig

    # byte-identical to the local mode for the same request
    srv_l = ChearchTCPServer(ix, mode="local")
    srv_l.start()
    try:
        want = _ask(srv_l.port, wire)
    finally:
        srv_l.stop()
    assert got == want

    with pytest.raises(ValueError):
        ChearchTCPServer(ix, mode="nope")


def test_parity_search_many_matches_per_query(served_index):
    """parity_search_many == N x parity_search, row for row, on every
    operand shape and with the wire partition_limit."""
    ix = served_index.index
    qs = {
        "t": Term("alpha"),
        "and": And(Term("alpha"), Term("beta")),
        "or": Or(Term("alpha"), Term("delta")),
        "miss": Term("zz_not_a_term_zz"),
    }
    for pl in (None, chasm_wire.MAX_RECORDS):
        batched = ix.parity_search_many(qs, partition_limit=pl)
        for name, node in qs.items():
            assert batched[name] == ix.parity_search(
                node, partition_limit=pl
            ), (name, pl)


def test_serving_micro_batch(spark, tmp_path_factory):
    """batch_window_ms (r5 verdict #8): N concurrent wire requests
    within the window are served by ONE batched Spark job
    (parity_search_many called once, per-request parity_search never),
    with responses byte-identical to the unbatched distributed mode;
    the flag refuses local mode."""
    import threading

    rows = [
        (10, "alpha beta gamma"),
        (15, "beta delta"),
        (20, "alpha beta alpha"),
        (25, "gamma delta epsilon"),
    ]
    out = str(tmp_path_factory.mktemp("srv_batch_ix"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, df, out, num_segments=2, resume=False)
    ix = Index(spark, out)

    with pytest.raises(ValueError, match="distributed"):
        ChearchTCPServer(ix, mode="local", batch_window_ms=10)

    terms = ["alpha", "beta", "delta", "epsilon"]
    # reference: unbatched distributed responses
    ref_srv = ChearchTCPServer(ix, mode="distributed")
    ref_srv.start()
    try:
        wires = {
            t: bytes([5, 1]) + struct.pack(">I", ref_srv.term_ids.id_of(t))
            for t in terms
        }
        want = {t: _ask(ref_srv.port, w) for t, w in wires.items()}
    finally:
        ref_srv.stop()

    srv = ChearchTCPServer(ix, mode="distributed", batch_window_ms=1000)
    calls = {"many": 0, "single": 0}
    orig_many, orig_one = ix.parity_search_many, ix.parity_search

    def spy_many(qs, *a, **k):
        calls["many"] += 1
        return orig_many(qs, *a, **k)

    def spy_one(node, *a, **k):
        calls["single"] += 1
        return orig_one(node, *a, **k)

    ix.parity_search_many, ix.parity_search = spy_many, spy_one
    srv.start()
    try:
        got: dict[str, list] = {}
        barrier = threading.Barrier(len(terms))

        def client(t):
            barrier.wait()
            got[t] = _ask(srv.port, wires[t])

        threads = [
            threading.Thread(target=client, args=(t,)) for t in terms
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
    finally:
        srv.stop()
        ix.parity_search_many, ix.parity_search = orig_many, orig_one

    assert calls["many"] == 1, f"expected one batched job, got {calls}"
    assert calls["single"] == 0, "a request fell back to per-query"
    assert srv.batch_sizes == [len(terms)]
    assert got == want, "batched responses differ from per-request"
