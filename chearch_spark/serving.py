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

Scale notes: the DEFAULT mode serves the index-fits-in-RAM regime
(the reference's regime — one locale's segment in memory): answers
come from the driver-local parity path and the term string table is
materialized once.  ``mode="distributed"`` keeps the SAME wire
protocol but survives indexes that exceed the serving host's RAM:
each request runs the candidate-pruned Spark scan
(:meth:`Index.parity_search` — collected rows are O(query postings),
never O(index)), and term ids resolve through
:class:`LazyTermIdMap`, which routes through the range-partitioned
dictionary's bounds sidecar and holds at most a few part files —
never the whole vocabulary.  Trade: ~0.1-0.5 s Spark scheduling per
request instead of sub-ms — the right trade exactly when the index
cannot live on one machine anyway (same rule as the distributed
bloom probe).  ``batch_window_ms=N`` (distributed only, opt-in)
amortizes that: concurrent requests arriving within the window are
answered by ONE Spark job (:meth:`Index.parity_search_many` — a
union-of-terms scan + per-query operand replay), byte-identical to
per-request answering.
"""

from __future__ import annotations

import queue
import socketserver
import threading
import time
from concurrent.futures import Future

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


class LazyTermIdMap:
    """:class:`TermIdMap` for vocabularies that must NOT be
    materialized on the serving host.  Ids are the SAME dense ranks
    over the sorted global dictionary (byte-identical responses for a
    given snapshot), but resolution is O(1)-file:

    * the range-partitioned dictionary's ``dict_bounds.json`` sidecar
      orders the part files by term range (ranges are disjoint — the
      build's ``repartitionByRange`` + sortWithinPartitions);
    * per-file term COUNTS come from parquet footers (one metadata
      read per file at startup — O(files) ints, never term strings);
    * a term's global rank = its file's cumulative offset + its rank
      within that one file; ``term_of`` inverts via the offsets.

    A small per-file LRU (``cache_files``) keeps the hot ranges'
    sorted term lists; everything else stays on disk."""

    def __init__(self, index: Index, cache_files: int = 4) -> None:
        import json
        import os
        from bisect import bisect_right
        from collections import OrderedDict

        import pyarrow.parquet as pq

        self._bisect_right = bisect_right
        self.dict_dir = index.dict_dir
        sidecar = os.path.join(index.path, "dict_bounds.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                bounds = json.load(f)["files"]
        else:
            # pre-sidecar index: the same shared legacy fallback the
            # Index probe uses (one-time full read of the small
            # dictionary metadata, never the terms at scale... the
            # helper reads min/max per file)
            from chearch_spark.build import compute_dict_bounds

            bounds = compute_dict_bounds(self.dict_dir)
        self._files = sorted(bounds, key=lambda fn: bounds[fn][0])
        self._mins = [bounds[fn][0] for fn in self._files]
        self._offsets = [0]
        for fn in self._files:
            n = pq.ParquetFile(
                os.path.join(self.dict_dir, fn)
            ).metadata.num_rows
            self._offsets.append(self._offsets[-1] + n)
        if self._offsets[-1] > 0xFFFFFFFF:
            raise ValueError("vocabulary exceeds uint32 id space")
        self._cache: OrderedDict[str, list[str]] = OrderedDict()
        self._cache_files = int(cache_files)
        # the server is a ThreadingTCPServer: concurrent handler
        # threads share this map, and an unlocked get/move_to_end vs
        # popitem race raises KeyError and kills a request
        self._lock = threading.Lock()
        self.files_read = 0  # instrumentation (tests pin laziness)

    def _terms_of(self, fi: int) -> list[str]:
        import os

        import pyarrow.parquet as pq

        fn = self._files[fi]
        with self._lock:
            hit = self._cache.get(fn)
            if hit is not None:
                self._cache.move_to_end(fn)
                return hit
        terms = sorted(
            pq.read_table(
                os.path.join(self.dict_dir, fn), columns=["term"]
            )
            .column("term")
            .to_pylist()
        )
        with self._lock:
            self.files_read += 1
            self._cache[fn] = terms
            while len(self._cache) > self._cache_files:
                self._cache.popitem(last=False)
        return terms

    def id_of(self, term: str) -> int:
        from bisect import bisect_left

        fi = max(0, self._bisect_right(self._mins, term) - 1)
        terms = self._terms_of(fi)
        j = bisect_left(terms, term)
        if j >= len(terms) or terms[j] != term:
            raise KeyError(term)
        return self._offsets[fi] + j

    def term_of(self, tid: int):
        if not 0 <= tid < self._offsets[-1]:
            return None
        fi = self._bisect_right(self._offsets, tid) - 1
        return self._terms_of(fi)[tid - self._offsets[fi]]

    def __len__(self) -> int:
        return self._offsets[-1]


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
        rows = server.submit(bytes([count]) + body)
        self.request.sendall(chasm_wire.encode_records(rows))


class ChearchTCPServer(socketserver.ThreadingTCPServer):
    """``with ChearchTCPServer(index) as srv: srv.start()`` — then any
    client speaking the reference protocol (e.g. the reference's own
    util/query_client.py) can query the Spark-built index."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, index: Index, host: str = "127.0.0.1",
                 port: int = 0, mode: str = "local",
                 batch_window_ms: int | None = None) -> None:
        if mode not in ("local", "distributed"):
            raise ValueError(f"unknown serving mode {mode!r}")
        if batch_window_ms is not None and mode != "distributed":
            raise ValueError(
                "batch_window_ms applies to mode='distributed' only "
                "(the local path is sub-ms — there is no Spark job "
                "to amortize)"
            )
        super().__init__((host, port), _Handler)
        self.index = index
        self.mode = mode
        # distributed mode never materializes the vocabulary on the
        # serving host — the whole point of the mode (module docstring)
        self.term_ids = (
            LazyTermIdMap(index) if mode == "distributed"
            else TermIdMap(index)
        )
        self._thread: threading.Thread | None = None
        # opt-in micro-batching (distributed mode): concurrent wire
        # requests arriving within the window are answered by ONE
        # Spark job (Index.parity_search_many) instead of one each —
        # the ~0.1-0.5 s scheduling cost amortizes across the batch.
        # Responses stay byte-identical to per-request answering: the
        # batched replay runs the same operand protocol with the same
        # partition_limit over a union scan whose extra rows each
        # query's replay ignores.
        self.batch_window_ms = batch_window_ms
        self._queue: queue.Queue | None = (
            queue.Queue() if batch_window_ms is not None else None
        )
        self._dispatcher: threading.Thread | None = None
        self._stopping = False
        self.batch_sizes: list[int] = []  # instrumentation (tests)

    # -- protocol ---------------------------------------------------------
    def submit(self, wire: bytes) -> list[tuple[int, int, int]]:
        """Handler entry point: per-request :meth:`answer`, or (with
        ``batch_window_ms``) enqueue and block until the dispatcher's
        batched job resolves this request."""
        if self._queue is None:
            return self.answer(wire)
        if self._stopping:
            # the dispatcher may already have exited — an enqueued
            # Future would never resolve and the handler would hang
            # its client until the timeout
            raise RuntimeError("server is stopping")
        fut: Future = Future()
        self._queue.put((wire, fut))
        return fut.result(timeout=120)

    def _resolve(self, tid: int) -> str:
        # unknown term ids -> a sentinel token that matches nothing
        # (the reference's NullOperand, `memorysegment.chpl:316`)
        return self.term_ids.term_of(tid) or f"zzxq{tid}zzxq"

    def _dispatch_loop(self) -> None:
        assert self._queue is not None
        while not self._stopping:
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.batch_window_ms / 1000.0
            while True:
                rem = deadline - time.monotonic()
                if rem <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=rem))
                except queue.Empty:
                    break
            self._answer_batch(batch)

    def _answer_batch(self, batch) -> None:
        # a malformed wire must fail only ITS request, not the batch
        nodes, futs = {}, {}
        for i, (wire, fut) in enumerate(batch):
            try:
                nodes[i] = chasm_wire.wire_to_ast(wire, self._resolve)
                futs[i] = fut
            except Exception as exc:  # noqa: BLE001 — forwarded
                fut.set_exception(exc)
        if not nodes:
            return
        try:
            results = self.index.parity_search_many(
                nodes, partition_limit=chasm_wire.MAX_RECORDS
            )
            self.batch_sizes.append(len(nodes))
            for i, fut in futs.items():
                rows = results[i][:chasm_wire.MAX_RECORDS]
                fut.set_result(
                    [
                        (self.term_ids.id_of(t), int(p), int(d))
                        for t, p, d in rows
                    ]
                )
        except Exception as exc:  # noqa: BLE001 — forwarded
            for fut in futs.values():
                if not fut.done():
                    fut.set_exception(exc)

    def answer(self, wire: bytes) -> list[tuple[int, int, int]]:
        """Wire request -> occurrence records (term_id, pos, doc_id).

        Unknown term ids resolve to a sentinel token that matches
        nothing — the reference returns the NullOperand for missing
        terms (`memorysegment.chpl:316`)."""
        node = chasm_wire.wire_to_ast(wire, self._resolve)
        if self.mode == "distributed":
            # candidate-pruned Spark scan (the collected posting rows
            # are O(query posting bytes), never O(index)).
            # partition_limit mirrors the reference's per-segment
            # truncation: segments replay in ascending-id order and
            # each contributes its first rows, so the global first-8
            # (the whole wire response) is unchanged — while the
            # materialized occurrence tuples are bounded at
            # 8/segment instead of every occurrence of a common term
            rows = self.index.parity_search(
                node, partition_limit=chasm_wire.MAX_RECORDS
            )
        else:
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
        if self._queue is not None:
            self._dispatcher = threading.Thread(
                target=self._dispatch_loop, daemon=True
            )
            self._dispatcher.start()

    def stop(self) -> None:
        self._stopping = True
        self.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        if self._dispatcher:
            self._dispatcher.join(timeout=5)
        if self._queue is not None:
            # fail anything still queued AFTER the dispatcher exited —
            # an unresolved Future would block its handler (and its
            # client) for the full 120 s result timeout
            while True:
                try:
                    _wire, fut = self._queue.get_nowait()
                except queue.Empty:
                    break
                if not fut.done():
                    fut.set_exception(
                        RuntimeError("server stopped before answering")
                    )
        self.server_close()
