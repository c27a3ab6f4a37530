"""Delta + varbyte codec for posting-list blocks.

The reference serializes postings as raw fixed-width little-endian
integers (lib/structs.py:7-67, lib/posting.py:28-42 — 16 bytes per
posting, no compression, no positions).  The north rule extends this to
delta + varbyte compressed ``(term, docID, tf, positions)`` postings cut
into fixed-size blocks with skip pointers and per-block score maxima
(block-max WAND).  This module is the codec; it is pure Python over
``bytes`` so it runs identically inside Arrow-batched pandas UDFs on
executors and inside the single-node oracle.

Block payload layout (all integers varbyte, MSB-continuation encoding):

    n                       number of postings in the block
    docid_deltas[n]         docid[0], then docid[i] - docid[i-1]   (>=1)
    tf[n]
    npos[n]                 positions-list length per posting
    pos_deltas[sum(npos)]   per posting: pos[0], then pos[i]-pos[i-1]

Skip pointers are *columnar*: each block row carries (docid_first,
docid_last, max_weight) beside the payload, so readers skip whole blocks
without decoding — the DataFrame-native equivalent of an embedded skip
list, and parquet min/max stats prune blocks at scan time too.
"""

from __future__ import annotations


def vb_encode(values) -> bytes:
    """Varbyte-encode a sequence of non-negative ints.

    7 data bits per byte, most-significant-group first; high bit set on
    the final byte of each value (classic Manning/Raghavan/Schütze
    varbyte, public-domain scheme).
    """
    out = bytearray()
    for v in values:
        if v < 0:
            raise ValueError(f"varbyte requires non-negative ints, got {v}")
        chunk = [v & 0x7F]
        v >>= 7
        while v:
            chunk.append(v & 0x7F)
            v >>= 7
        chunk.reverse()
        chunk[-1] |= 0x80
        out.extend(chunk)
    return bytes(out)


def vb_decode(data: bytes, offset: int = 0, count: int | None = None):
    """Decode ``count`` ints (or all) starting at ``offset``.

    Returns ``(values, next_offset)``.
    """
    values = []
    acc = 0
    i = offset
    n = len(data)
    while i < n:
        b = data[i]
        i += 1
        if b & 0x80:
            values.append((acc << 7) | (b & 0x7F))
            acc = 0
            if count is not None and len(values) == count:
                break
        else:
            acc = (acc << 7) | b
    if count is not None and len(values) != count:
        raise ValueError(f"expected {count} values, decoded {len(values)}")
    return values, i


def encode_deltas(sorted_values) -> bytes:
    """Delta-encode a strictly increasing sequence, then varbyte."""
    deltas = []
    prev = 0
    for i, v in enumerate(sorted_values):
        if i == 0:
            deltas.append(v)
        else:
            d = v - prev
            if d <= 0:
                raise ValueError("sequence not strictly increasing")
            deltas.append(d)
        prev = v
    return vb_encode(deltas)


def decode_deltas(data: bytes, count: int, offset: int = 0):
    """Inverse of :func:`encode_deltas`; returns (values, next_offset)."""
    deltas, nxt = vb_decode(data, offset=offset, count=count)
    values = []
    acc = 0
    for d in deltas:
        acc += d
        values.append(acc)
    return values, nxt


def encode_block(docids, tfs, positions) -> bytes:
    """Encode one posting block (parallel lists, docids strictly asc).

    ``positions`` is a list of per-posting position lists (1-based,
    strictly ascending — posexplode order); empty lists allowed.
    """
    n = len(docids)
    if not (n == len(tfs) == len(positions)):
        raise ValueError("parallel lists must have equal length")
    out = bytearray()
    out += vb_encode([n])
    out += encode_deltas(docids)
    out += vb_encode(tfs)
    out += vb_encode([len(p) for p in positions])
    flat = []
    for plist in positions:
        prev = 0
        for i, p in enumerate(plist):
            flat.append(p if i == 0 else p - prev)
            prev = p
    out += vb_encode(flat)
    return bytes(out)


def decode_block(payload: bytes):
    """Inverse of :func:`encode_block` → (docids, tfs, positions)."""
    (nv, off) = vb_decode(payload, count=1)
    n = nv[0]
    docids, off = decode_deltas(payload, n, offset=off)
    tfs, off = vb_decode(payload, offset=off, count=n)
    npos, off = vb_decode(payload, offset=off, count=n)
    total = sum(npos)
    flat, off = vb_decode(payload, offset=off, count=total)
    positions = []
    i = 0
    for k in npos:
        acc = 0
        plist = []
        for d in flat[i : i + k]:
            acc += d
            plist.append(acc)
        positions.append(plist)
        i += k
    return docids, tfs, positions
