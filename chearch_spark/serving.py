"""TCP query server speaking the reference wire protocol.

The reference serves queries over a libev TCP loop
(`chearch_srv.chpl:20-72`, C loop `tcp/tcp_server.c`): request =
``[count:u8][chasm bytes…]``, response = up to 8 records × 13 bytes
``(term:u32, textLocation:u8, externalDocId:u64)`` big-endian — its
own `util/query_client.py` parses exactly that.  This module is the
Spark-engine counterpart: a threaded TCP server over the driver-local
query path (:meth:`Index.local_parity_search`, per-term occurrence
cache), so a warm query is numpy work — no Spark job per request.  The reference leaves the term string table to the
caller (`README.md:15`); :class:`TermIdMap` materializes it from the
index dictionary (term_id = rank in term-sorted order, stable for a
given snapshot).

Scale notes: the serving layer is for the index-fits-in-RAM regime
(the reference's regime — one locale's segment in memory).  For
cluster-resident indexes, front this with the distributed
``search_many`` batch path instead; the wire protocol is unchanged.
"""

from __future__ import annotations

import socketserver
import threading

from chearch_spark.plans import chasm_wire
from chearch_spark.search import Index


class TermIdMap:
    """uint32 term id <-> term string (the external string table the
    reference assumes).  Ids are dense ranks over the sorted
    dictionary — deterministic per index snapshot."""

    def __init__(self, index: Index) -> None:
        import pyarrow.dataset as ds

        table = ds.dataset(index.dict_dir, format="parquet").to_table(
            columns=["term"]
        )
        terms = sorted(table.column("term").to_pylist())
        if len(terms) > 0xFFFFFFFF:
            raise ValueError("vocabulary exceeds uint32 id space")
        self._term_of = terms
        self._id_of = {t: i for i, t in enumerate(terms)}

    def id_of(self, term: str) -> int:
        return self._id_of[term]

    def term_of(self, tid: int):
        return self._term_of[tid] if 0 <= tid < len(self._term_of) else None

    def __len__(self) -> int:
        return len(self._term_of)


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:  # one request per connection, like the ref
        head = self.request.recv(1)
        if not head:
            return
        count = head[0]
        body = b""
        while len(body) < count:
            chunk = self.request.recv(count - len(body))
            if not chunk:
                break
            body += chunk
        server: ChearchTCPServer = self.server  # type: ignore[assignment]
        rows = server.answer(bytes([count]) + body)
        self.request.sendall(chasm_wire.encode_records(rows))


class ChearchTCPServer(socketserver.ThreadingTCPServer):
    """``with ChearchTCPServer(index) as srv: srv.start()`` — then any
    client speaking the reference protocol (e.g. the reference's own
    util/query_client.py) can query the Spark-built index."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, index: Index, host: str = "127.0.0.1",
                 port: int = 0) -> None:
        super().__init__((host, port), _Handler)
        self.index = index
        self.term_ids = TermIdMap(index)
        self._thread: threading.Thread | None = None

    # -- protocol ---------------------------------------------------------
    def answer(self, wire: bytes) -> list[tuple[int, int, int]]:
        """Wire request -> occurrence records (term_id, pos, doc_id).

        Unknown term ids resolve to a sentinel token that matches
        nothing — the reference returns the NullOperand for missing
        terms (`memorysegment.chpl:316`)."""
        def resolve(tid: int) -> str:
            return self.term_ids.term_of(tid) or f"zzxq{tid}zzxq"

        node = chasm_wire.wire_to_ast(wire, resolve)
        rows = self.index.local_parity_search(node)
        out = []
        for term, pos, doc_id in rows[:chasm_wire.MAX_RECORDS]:
            out.append((self.term_ids.id_of(term), int(pos), int(doc_id)))
        return out

    # -- lifecycle ---------------------------------------------------------
    @property
    def port(self) -> int:
        return self.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.server_close()
