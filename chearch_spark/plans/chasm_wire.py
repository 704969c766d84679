"""CHASM binary wire format — byte-compatible with the reference.

Layout (request side, `chearch_srv.chpl:21-37` + `util/query_client.py:
11-12`): byte 0 is the instruction count, followed by that many opcode
bytes; ``PUSH`` (0x01) is followed by a 4-byte big-endian uint32 term
id (`chasm.chpl:108-123`, read back at `chasm.chpl:82-88`).  Opcodes
are numerically identical to `chasm.chpl:8-13` (HALT=0, PUSH=1, AND=2,
OR=3) — our :mod:`chearch_spark.plans.query` pins the same values.

The reference is string-free (terms are uint32 into an external string
table, `README.md:15`); our engine keys postings by term string, so the
wire layer carries integer ids and a resolver maps them to terms
(:class:`chearch_spark.serving.TermIdMap` is the string table the
reference leaves to the caller).
"""

from __future__ import annotations

import struct
from collections.abc import Callable

from chearch_spark.plans.query import (
    OP_AND,
    OP_HALT,
    OP_OR,
    OP_PUSH,
    Node,
    from_postfix,
    to_postfix,
)

MAX_INSTRUCTIONS = 255  # count must fit the leading u8


def encode_program(program: list[tuple]) -> bytes:
    """Postfix program with INTEGER term ids -> wire bytes
    ``[count:u8][ops...]``."""
    body = bytearray()
    for op in program:
        kind = op[0]
        if kind == "PUSH":
            tid = int(op[1])
            if not 0 <= tid <= 0xFFFFFFFF:
                raise ValueError(f"term id {tid} out of uint32 range")
            body.append(OP_PUSH)
            body += struct.pack(">I", tid)
        elif kind == "AND":
            body.append(OP_AND)
        elif kind == "OR":
            body.append(OP_OR)
        elif kind == "HALT":
            body.append(OP_HALT)
        else:
            raise ValueError(f"unknown op {kind!r}")
    if len(body) > MAX_INSTRUCTIONS:
        raise ValueError(f"program too long ({len(body)} bytes > 255)")
    return bytes([len(body)]) + bytes(body)


def decode_program(data: bytes) -> list[tuple]:
    """Wire bytes -> postfix program with integer term ids.  Mirrors
    the reference's read loop incl. the 4-byte big-endian term
    reassembly (`chasm.chpl:82-88,150-186`)."""
    if not data:
        return []
    count = data[0]
    buf = data[1:1 + count]
    out: list[tuple] = []
    i = 0
    while i < len(buf):
        op = buf[i]
        i += 1
        if op == OP_HALT:
            break
        if op == OP_PUSH:
            if i + 4 > len(buf):
                raise ValueError("truncated PUSH operand")
            (tid,) = struct.unpack(">I", buf[i:i + 4])
            i += 4
            out.append(("PUSH", tid))
        elif op == OP_AND:
            out.append(("AND",))
        elif op == OP_OR:
            out.append(("OR",))
        else:
            raise ValueError(f"unknown opcode {op}")
    return out


def wire_to_ast(data: bytes, resolve: Callable[[int], str]) -> Node:
    """Decode wire bytes and resolve integer ids to term strings."""
    program = [
        ("PUSH", resolve(op[1])) if op[0] == "PUSH" else op
        for op in decode_program(data)
    ]
    return from_postfix(program)


def ast_to_wire(node: Node, id_of: Callable[[str], int]) -> bytes:
    """AST with term strings -> wire bytes via an id mapping."""
    program = [
        ("PUSH", id_of(op[1])) if op[0] == "PUSH" else op
        for op in to_postfix(node)
    ]
    return encode_program(program)


RECORD_STRUCT = struct.Struct(">IBQ")  # term u32, textLocation u8, doc u64
RECORD_SIZE = RECORD_STRUCT.size  # 13 bytes (`chearch_srv.chpl:39`)
MAX_RECORDS = 8  # (`chearch_srv.chpl:40`)


def encode_records(rows: list[tuple[int, int, int]]) -> bytes:
    """(term_id, text_location, external_doc_id) rows -> response bytes
    (big-endian 13-byte records, ≤ 8, `chearch_srv.chpl:44-69`)."""
    out = bytearray()
    for term_id, pos, doc_id in rows[:MAX_RECORDS]:
        out += RECORD_STRUCT.pack(term_id, pos, doc_id)
    return bytes(out)


def decode_records(data: bytes) -> list[tuple[int, int, int]]:
    return [
        RECORD_STRUCT.unpack_from(data, o)
        for o in range(0, len(data) - RECORD_SIZE + 1, RECORD_SIZE)
    ]
