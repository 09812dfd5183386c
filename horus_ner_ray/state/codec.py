"""Delta + varint (Frame-of-Reference) posting-list codec.

Doc-id lists are sorted ascending per term; we store LEB128 varints of the
gaps relative to the shard's base doc_id (frame of reference), and plain
varints for tf values.  Both encode and decode are numpy-vectorized — the
per-byte loop runs at most 10 iterations (64/7), not per-value.  Cf.
PAPERS.md "Can Delta Compete with Frame-of-Reference for Lightweight
Integer Compression?" (VLDB 2024): gap + byte-aligned varint is the
baseline lightweight scheme; the format reserves room for a SIMD-friendly
bit-packed FoR upgrade without changing the index layout (codec id in the
shard manifest).

The reference keeps postings as SQLite rows with integer columns
(reference: horus0.1.5.db.sql:59-79); compression is ours alone.
"""

from __future__ import annotations

import numpy as np

CODEC_VERSION = "delta-varint-1"


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """uint64 array -> (LEB128 bytes, per-value byte counts).

    Vectorized over values; the byte-count array lets callers slice the
    stream per logical group (per-term posting blobs) without re-encoding.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nb = np.ones(len(v), dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():
        nb += (x > 0)
        x = x >> np.uint64(7)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nb.max())):
        m = nb > j
        byte = ((v[m] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        byte |= ((nb[m] - 1 > j).astype(np.uint8) << 7)
        out[starts[m] + j] = byte
    return out.tobytes(), nb


def varint_encode(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 bytes (vectorized over values)."""
    return varint_encode_with_lengths(values)[0]


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """LEB128 bytes -> uint64 array (vectorized over values)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for j in range(int(lengths.max())):
        m = lengths > j
        vals[m] |= (b[starts[m] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals


def encode_doc_ids(doc_ids: np.ndarray, base: int) -> bytes:
    """Sorted int64 doc ids -> FoR gap varints. First gap is vs ``base``."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if len(d) == 0:
        return b""
    gaps = np.empty(len(d), dtype=np.uint64)
    gaps[0] = np.uint64(d[0] - base)
    if len(d) > 1:
        gaps[1:] = np.diff(d).astype(np.uint64)
    return varint_encode(gaps)


def decode_doc_ids(buf: bytes | np.ndarray, base: int) -> np.ndarray:
    gaps = varint_decode(buf)
    if len(gaps) == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.cumsum(gaps.astype(np.int64))
    out += base
    return out


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.ascontiguousarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes | np.ndarray) -> np.ndarray:
    return varint_decode(buf).astype(np.int32)


def encode_positions(flat_pos: np.ndarray, tfs: np.ndarray) -> bytes:
    """Token-position lists for a run of postings (phrase queries).

    ``flat_pos`` concatenates each posting's ascending positions; posting i
    owns ``tfs[i]`` of them.  Within a posting: first position absolute,
    the rest delta-encoded; one varint stream for the whole run.
    """
    fp = np.ascontiguousarray(flat_pos, dtype=np.int64)
    if len(fp) == 0:
        return b""
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(np.asarray(tfs, dtype=np.int64)[:-1], out=starts[1:])
    gaps = np.empty(len(fp), dtype=np.uint64)
    gaps[1:] = np.diff(fp).astype(np.uint64)
    gaps[starts] = fp[starts].astype(np.uint64)
    return varint_encode(gaps)


def decode_positions(buf: bytes | np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions -> flat int32 positions (segment i has
    tfs[i] entries; split with cumsum(tfs) offsets)."""
    gaps = varint_decode(buf).astype(np.int64)
    if len(gaps) == 0:
        return np.zeros(0, dtype=np.int32)
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    c = np.cumsum(gaps)
    base = c[starts] - gaps[starts]
    return (c - np.repeat(base, tfs)).astype(np.int32)
