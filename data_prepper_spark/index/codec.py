"""Delta + varbyte posting-list codec — fully vectorized numpy.

Posting blocks store sorted doc ids as (first value, then deltas),
each varbyte-encoded (LEB128: 7 payload bits per byte, MSB =
continuation). No per-row Python loops: encode loops over the max 10
byte-slots, decode uses terminator masks + np.add.reduceat
(SURVEY.md §4 "custom work" item 1; varbyte layout per classic IR
practice, cf. PAPERS.md).

Doc ids are signed int64 (xxhash64); we map them order-preservingly to
uint64 by flipping the sign bit so deltas of the sorted sequence are
non-negative.
"""

from __future__ import annotations

import numpy as np

_SIGN = np.uint64(1) << np.uint64(63)


def to_unsigned(doc_ids: np.ndarray) -> np.ndarray:
    """Order-preserving int64 -> uint64 (flip sign bit)."""
    return doc_ids.astype(np.int64).view(np.uint64) ^ _SIGN


def to_signed(u: np.ndarray) -> np.ndarray:
    return (u ^ _SIGN).view(np.int64)


def varbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (uint64 array).

    uint64 throughout: this sandbox's numpy runs uint64 cumsum ~10x
    faster than int64 (pairwise-reduction path), and in-place ops avoid
    the fault-dominated fresh-allocation penalty profiling exposed."""
    v = values.astype(np.uint64, copy=False)
    n = len(v)
    nb = np.ones(n, dtype=np.uint64)
    t = np.empty(n, dtype=bool)
    for k in range(1, 10):
        np.greater_equal(v, np.uint64(1) << np.uint64(7 * k), out=t)
        nb += t
    return nb


def varbyte_encode(
    values: np.ndarray, lengths: np.ndarray | None = None
) -> bytes:
    """LEB128-encode a uint64 array (vectorized). Pass ``lengths``
    (from varbyte_lengths) to avoid recomputing byte counts."""
    v = values.astype(np.uint64, copy=False)
    n = len(v)
    if n == 0:
        return b""
    nb = varbyte_lengths(v) if lengths is None else lengths
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    # k = 0: every value writes its low 7 bits (no mask needed)
    cont = nb > np.uint64(1)
    b0 = (v & np.uint64(0x7F)).astype(np.uint8)
    b0 |= (cont.view(np.uint8) << np.uint8(7))
    out[starts] = b0
    for k in range(1, 10):
        sel = nb > np.uint64(k)
        if not sel.any():
            break
        vk = v[sel]
        vk >>= np.uint64(7 * k)
        vk &= np.uint64(0x7F)
        bk = vk.astype(np.uint8)
        bk |= ((nb[sel] - np.uint64(1) > np.uint64(k)).view(np.uint8) << np.uint8(7))
        out[starts[sel] + np.uint64(k)] = bk
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    term = (b & 0x80) == 0  # terminator byte of each value
    # group id per byte: 0-based index of the value the byte belongs to
    gid = np.zeros(len(b), dtype=np.int64)
    gid[1:] = np.cumsum(term[:-1])
    starts = np.flatnonzero(np.concatenate([[True], term[:-1]]))
    pos = np.arange(len(b), dtype=np.int64) - starts[gid]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts)


def encode_block_docs(doc_ids_sorted: np.ndarray) -> bytes:
    """Sorted signed int64 doc ids -> delta+varbyte bytes."""
    u = to_unsigned(doc_ids_sorted)
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1]
    return varbyte_encode(deltas)


def decode_block_docs(buf: bytes) -> np.ndarray:
    """Inverse of encode_block_docs -> signed int64 doc ids."""
    deltas = varbyte_decode(buf)
    if len(deltas) == 0:
        return np.empty(0, dtype=np.int64)
    return to_signed(np.cumsum(deltas, dtype=np.uint64))


def decode_many(bufs: "list[bytes] | np.ndarray", deltas: bool):
    """Decode a batch of blocks in ONE vectorized pass.

    Returns (values uint64 ndarray concatenated, lengths per block).
    If ``deltas``, applies segmented prefix-sum (per-block cumsum) —
    used for doc-id blocks; tf/dl blocks use deltas=False.
    """
    if len(bufs) == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    joined = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    if len(joined) == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(len(bufs), dtype=np.int64)
    vals = varbyte_decode(joined)
    # per-block value counts: terminators per buffer
    byte_lens = np.fromiter((len(x) for x in bufs), dtype=np.int64, count=len(bufs))
    term = (joined & 0x80) == 0
    cum_term = np.concatenate([[0], np.cumsum(term)])
    ends = np.cumsum(byte_lens)
    counts = np.diff(np.concatenate([[0], cum_term[ends]]))
    if deltas:
        # segmented cumsum: global cumsum minus offset of prior blocks
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        g = np.cumsum(vals, dtype=np.uint64)
        nonempty = counts > 0
        base = np.zeros(len(bufs), dtype=np.uint64)
        s_ne = starts[nonempty]
        base_ne = np.where(s_ne > 0, g[s_ne - 1], np.uint64(0))
        base[nonempty] = base_ne
        vals = g - np.repeat(base, counts)
    return vals, counts
