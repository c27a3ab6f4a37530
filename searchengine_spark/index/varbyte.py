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
    important[n]            OPT-IN (importance-payload indexes only,
                            mergeinfo flag): per-posting BM25F field
                            priority (params.IMPORTANCE index).
                            Readers that skip positions can ignore it
                            (sections decode front-to-back); readers
                            that want either tail section must know
                            the flag (with_importance=...)

Skip pointers are *columnar*: each block row carries (docid_first,
docid_last, max_weight) beside the payload, so readers skip whole blocks
without decoding — the DataFrame-native equivalent of an embedded skip
list, and parquet min/max stats prune blocks at scan time too.
"""

from __future__ import annotations

import numpy as np


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


def vb_decode_all(data: bytes) -> np.ndarray:
    """Decode every varbyte value in ``data`` in one vectorized pass.

    frombuffer → continuation-bit mask → per-byte place value from the
    distance to the value's terminator byte → add.reduceat per value.
    ~50× the byte-at-a-time loop; used by every hot decode path (the
    streaming :func:`vb_decode` remains for offset/count decoding and
    as the independently-implemented round-trip check).
    """
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.int64)
    is_end = (arr & 0x80) != 0
    data7 = (arr & np.uint8(0x7F)).astype(np.uint64)
    ends = np.flatnonzero(is_end)
    if ends.size == 0 or ends[-1] != arr.size - 1:
        raise ValueError("truncated varbyte stream")
    # value index of each byte = number of terminators strictly before it
    vidx = np.empty(arr.size, dtype=np.int64)
    vidx[0] = 0
    vidx[1:] = np.cumsum(is_end[:-1])
    place = (ends[vidx] - np.arange(arr.size)).astype(np.uint64)
    vals7 = data7 << (np.uint64(7) * place)
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    return np.add.reduceat(vals7, starts).astype(np.int64)


def decode_block_np(payload: bytes, want_positions: bool = True,
                    with_importance: bool = False):
    """Vectorized inverse of :func:`encode_block`.

    Returns ``(docids, tfs, npos, flat_positions)`` as int64 numpy
    arrays; ``flat_positions`` is the concatenation of the per-posting
    absolute position lists (split points = cumsum(npos)).  With
    ``want_positions=False`` the last two are None and the position
    section is never reconstructed (the WAND hot path skips it).
    ``with_importance=True`` (importance-payload indexes) appends the
    decoded important[n] array as a fifth element.
    """
    vals = vb_decode_all(payload)
    n = int(vals[0])
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        out = (z, z, (None if not want_positions else z),
               (None if not want_positions else z))
        return out + (z,) if with_importance else out
    docids = np.cumsum(vals[1 : 1 + n])
    tfs = vals[1 + n : 1 + 2 * n]
    imps = None
    if with_importance:
        npos_v = vals[1 + 2 * n : 1 + 3 * n]
        total = int(npos_v.sum())
        imps = vals[1 + 3 * n + total :]
        if imps.size != n:
            raise ValueError("importance section length mismatch")
    if not want_positions:
        return (
            (docids, tfs, None, None, imps)
            if with_importance else (docids, tfs, None, None)
        )
    npos = vals[1 + 2 * n : 1 + 3 * n]
    total = int(npos.sum())
    flat = vals[1 + 3 * n : 1 + 3 * n + total]
    if not with_importance and vals.size != 1 + 3 * n + total:
        raise ValueError("positions section length mismatch")
    if flat.size == 0:
        return (
            (docids, tfs, npos, flat, imps)
            if with_importance else (docids, tfs, npos, flat)
        )
    # segmented cumsum: global cumsum minus each segment's base offset
    cs = np.cumsum(flat)
    pstarts = np.empty(n, dtype=np.int64)
    pstarts[0] = 0
    np.cumsum(npos[:-1], out=pstarts[1:])
    base = np.where(pstarts > 0, cs[np.maximum(pstarts - 1, 0)], 0)
    abspos = cs - np.repeat(base, npos)
    return (
        (docids, tfs, npos, abspos, imps)
        if with_importance else (docids, tfs, npos, abspos)
    )


def _intra(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for a vector of segment lengths."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.empty(counts.size, dtype=np.int64)
    starts[0] = 0
    np.cumsum(counts[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _seg_cumsum(x: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum (cumsum that resets at each segment)."""
    if x.size == 0:
        return x.astype(np.int64)
    cs = np.cumsum(x)
    starts = np.empty(counts.size, dtype=np.int64)
    starts[0] = 0
    np.cumsum(counts[:-1], out=starts[1:])
    base = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0)
    return cs - np.repeat(base, counts)


def decode_payloads_np(payloads, want_positions: bool = True,
                       with_importance: bool = False):
    """Bulk-decode MANY block payloads in ONE vectorized pass.

    Varbyte values never span payload boundaries (every value ends with
    a terminator byte), so the concatenated byte stream decodes in a
    single frombuffer → mask → reduceat sweep; per-payload sections are
    then gathered with repeat/arange indexing — no per-payload Python.

    :param payloads: list of ``bytes`` block payloads (each n >= 1)
    :return: ``(n, docids, tfs, npos, abspos)`` — ``n`` is the
        per-payload posting count; the rest concatenate all payloads in
        order.  Because index blocks cover disjoint ascending docid
        ranges, the concatenated ``docids`` of one term's blocks stay
        globally sorted.  With ``want_positions=False`` npos/abspos are
        None and the position sections are never touched.
        ``with_importance=True`` (importance-payload indexes) appends
        the concatenated important values as a sixth element.
    """
    if not payloads:
        z = np.empty(0, dtype=np.int64)
        out = (z, z, z, (z if want_positions else None),
               (z if want_positions else None))
        return out + (z,) if with_importance else out
    lens = np.fromiter((len(p) for p in payloads), np.int64,
                       count=len(payloads))
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    is_end = (buf & 0x80) != 0
    ends = np.flatnonzero(is_end)
    if ends.size == 0 or ends[-1] != buf.size - 1:
        raise ValueError("truncated varbyte stream")
    vidx = np.empty(buf.size, dtype=np.int64)
    vidx[0] = 0
    np.cumsum(is_end[:-1], out=vidx[1:])
    place = (ends[vidx] - np.arange(buf.size)).astype(np.uint64)
    vals7 = (buf & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * place)
    vstarts_b = np.empty(ends.size, dtype=np.int64)
    vstarts_b[0] = 0
    vstarts_b[1:] = ends[:-1] + 1
    vals = np.add.reduceat(vals7, vstarts_b).astype(np.int64)

    # value index of each payload's first value = terminators before it
    cend = np.cumsum(is_end)
    bounds = np.cumsum(lens)
    vstart = np.empty(lens.size, dtype=np.int64)
    vstart[0] = 0
    vstart[1:] = cend[bounds[:-1] - 1]
    n = vals[vstart]
    if n.min() < 1:
        raise ValueError("bulk decode requires non-empty blocks")
    intra_n = _intra(n)
    docids = _seg_cumsum(vals[np.repeat(vstart + 1, n) + intra_n], n)
    tfs = vals[np.repeat(vstart + 1 + n, n) + intra_n]
    if not want_positions and not with_importance:
        return n, docids, tfs, None, None
    npos = vals[np.repeat(vstart + 1 + 2 * n, n) + intra_n]
    # per-payload position totals: sum npos within each payload segment
    nstarts = np.empty(n.size, dtype=np.int64)
    nstarts[0] = 0
    np.cumsum(n[:-1], out=nstarts[1:])
    total = np.add.reduceat(npos, nstarts) if npos.size else np.zeros(
        n.size, dtype=np.int64
    )
    vcounts = np.diff(np.concatenate([vstart, [vals.size]]))
    want_counts = 1 + 3 * n + total + (n if with_importance else 0)
    if not np.array_equal(vcounts, want_counts):
        raise ValueError("payload section length mismatch")
    imps = None
    if with_importance:
        imps = vals[
            np.repeat(vstart + 1 + 3 * n + total, n) + intra_n
        ]
    if not want_positions:
        return n, docids, tfs, None, None, imps
    pdeltas = vals[np.repeat(vstart + 1 + 3 * n, total) + _intra(total)]
    abspos = _seg_cumsum(pdeltas, npos)
    return (
        (n, docids, tfs, npos, abspos, imps)
        if with_importance else (n, docids, tfs, npos, abspos)
    )


def encode_block(docids, tfs, positions, importants=None) -> bytes:
    """Encode one posting block (parallel lists, docids strictly asc).

    ``positions`` is a list of per-posting position lists (1-based,
    strictly ascending — posexplode order); empty lists allowed.
    ``importants`` (opt-in) appends the per-posting BM25F field
    priorities as a trailing section.
    """
    n = len(docids)
    if not (n == len(tfs) == len(positions)):
        raise ValueError("parallel lists must have equal length")
    if importants is not None and len(importants) != n:
        raise ValueError("importants must parallel docids")
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
    if importants is not None:
        out += vb_encode(importants)
    return bytes(out)


def decode_block(payload: bytes):
    """Inverse of :func:`encode_block` → (docids, tfs, positions) as
    plain Python lists (vectorized internally; see decode_block_np)."""
    docids, tfs, npos, abspos = decode_block_np(payload)
    if docids.size == 0:
        return [], [], []
    splits = np.cumsum(npos[:-1]) if npos.size > 1 else []
    positions = [p.tolist() for p in np.split(abspos, splits)]
    return docids.tolist(), tfs.tolist(), positions


def decode_block_py(payload: bytes, with_importance: bool = False):
    """Byte-at-a-time reference decoder (kept as the independent
    implementation the round-trip tests cross-check against).
    ``with_importance=True`` additionally decodes the trailing
    important[n] section and returns a 4-tuple."""
    (nv, off) = vb_decode(payload, count=1)
    n = nv[0]
    docids, off = decode_deltas(payload, n, offset=off)
    tfs, off = vb_decode(payload, offset=off, count=n)
    npos, off = vb_decode(payload, offset=off, count=n)
    total = sum(npos)
    # count=0 must not consume anything (an importance payload may
    # carry a trailing section after an empty positions section)
    flat = []
    if total:
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
    if with_importance:
        imps, off = vb_decode(payload, offset=off, count=n)
        return docids, tfs, positions, imps
    return docids, tfs, positions


# -- vectorized encode (write-path hot kernel) ------------------------------
#
# The scalar vb_encode above stays as the independent reference the
# property tests cross-check against (the same contract as
# decode_block_py vs the numpy decoders).

_VB_THRESHOLDS = np.array(
    [1 << (7 * k) for k in range(1, 9)], dtype=np.uint64
)


def vb_encode_np(values: np.ndarray):
    """Vectorized varbyte encode of a non-negative int array.

    Returns ``(buf, ends)`` — ``buf`` a uint8 array of the concatenated
    encoding (byte-identical to ``vb_encode``), ``ends`` int64 array of
    each value's EXCLUSIVE end offset in ``buf`` (so value i occupies
    ``buf[ends[i-1]:ends[i]]``).  The ends let block writers slice one
    global encode into per-block sections instead of re-encoding.
    """
    v = np.asarray(values)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    if v.min() < 0:
        raise ValueError("varbyte requires non-negative ints")
    u = v.astype(np.uint64)
    # the threshold table covers 9 bytes = 63 payload bits; a uint64 in
    # [2^63, 2^64) would silently truncate — unreachable from the int64
    # call sites, but guard the contract rather than trust the caller
    if u.max() >= np.uint64(1) << np.uint64(63):
        raise ValueError("vb_encode_np supports values < 2^63")
    # bytes per value = number of 7-bit groups (>= 1)
    nb = 1 + np.searchsorted(
        _VB_THRESHOLDS, u, side="right"
    ).astype(np.int64)
    ends = np.cumsum(nb)
    total = int(ends[-1])
    out_idx = np.arange(total, dtype=np.int64)
    vidx = np.repeat(np.arange(u.size, dtype=np.int64), nb)
    # place = how many 7-bit groups remain AFTER this byte (0 == last)
    place = (ends[vidx] - 1 - out_idx).astype(np.uint64)
    buf = ((u[vidx] >> (np.uint64(7) * place)) & np.uint64(0x7F)).astype(
        np.uint8
    )
    buf[out_idx == ends[vidx] - 1] |= np.uint8(0x80)
    return buf, ends


def encode_row_positions_np(npos, flatpos):
    """Pre-shuffle position encoding: per-ROW varbyte delta sections.

    ``npos`` int64 per row, ``flatpos`` the row-major concatenation of
    the (1-based ascending) position lists.  Returns ``(buf,
    row_ends)`` — ``buf`` uint8 of every row's encoded
    [pos0, pos1-pos0, ...] section concatenated, ``row_ends`` int64
    EXCLUSIVE byte offsets per row.

    The per-row delta encoding is independent of how rows later cut
    into blocks (each row's first position is stored absolute), so a
    block's position section is exactly the concatenation of its rows'
    sections — write_index shuffles these small buffers instead of
    int arrays and the block writer slices them byte-for-byte
    (encode_payloads_pre), reproducing encode_block's output
    exactly (property-pinned)."""
    npos = np.asarray(npos, dtype=np.int64)
    flatpos = np.asarray(flatpos, dtype=np.int64)
    if flatpos.size:
        pd_ = flatpos.copy()
        pd_[1:] -= flatpos[:-1]
        row_off = np.concatenate(([0], np.cumsum(npos)[:-1]))
        row_starts_flat = np.zeros(flatpos.size, dtype=bool)
        row_starts_flat[row_off[npos > 0]] = True
        pd_[row_starts_flat] = flatpos[row_starts_flat]
    else:
        pd_ = flatpos
    buf, ends = vb_encode_np(pd_)
    # byte end per ROW = end of its last value (0-length rows inherit
    # the previous row's end)
    val_bounds = np.cumsum(npos)
    row_ends = np.where(
        val_bounds > 0,
        ends[np.maximum(val_bounds - 1, 0)] if ends.size else 0,
        0,
    ).astype(np.int64)
    # rows after the first with npos==0 must carry the running offset
    np.maximum.accumulate(row_ends, out=row_ends)
    return buf, row_ends


def encode_payloads_pre(docids, tfs, npos, pos_buf, pos_row_ends,
                        block_starts, imps=None):
    """encode_payloads_np with the position sections PRE-ENCODED
    (encode_row_positions_np): identical output bytes, but the
    position work per block is one buffer slice instead of a varbyte
    pass — the write path's shuffle-byte diet."""
    n_post = docids.size
    starts = np.asarray(block_starts, dtype=np.int64)
    bounds = np.append(starts, n_post)
    lens = np.diff(bounds)

    dd = docids.copy()
    dd[1:] -= docids[:-1]
    dd[starts] = docids[starts]
    if n_post > 1:
        inner = np.ones(n_post, dtype=bool)
        inner[starts] = False
        if (dd[inner] <= 0).any():
            raise ValueError("docids not strictly increasing in block")

    hdr_buf, hdr_ends = vb_encode_np(lens)
    did_buf, did_ends = vb_encode_np(dd)
    tf_buf, tf_ends = vb_encode_np(tfs)
    np_buf, np_ends = vb_encode_np(npos)
    if imps is not None:
        imp_buf, imp_ends = vb_encode_np(
            np.asarray(imps, dtype=np.int64)
        )

    def sec_bounds(ends, idx_bounds):
        if ends.size == 0:
            return np.zeros(idx_bounds.size, dtype=np.int64)
        return np.where(
            idx_bounds == 0, 0, ends[np.maximum(idx_bounds, 1) - 1]
        )

    did_b = sec_bounds(did_ends, bounds)
    tf_b = sec_bounds(tf_ends, bounds)
    np_b = sec_bounds(np_ends, bounds)
    # a block's position bytes = [end of the previous block's last
    # row, end of this block's last row)
    pos_b = sec_bounds(pos_row_ends, bounds)
    hdr_b = np.concatenate(([0], hdr_ends))

    hdr_m, did_m = memoryview(hdr_buf), memoryview(did_buf)
    tf_m, np_m = memoryview(tf_buf), memoryview(np_buf)
    pos_m = memoryview(pos_buf)
    out = []
    if imps is not None:
        imp_b = sec_bounds(imp_ends, bounds)
        imp_m = memoryview(imp_buf)
        for k in range(starts.size):
            out.append(
                bytes(hdr_m[hdr_b[k]:hdr_b[k + 1]])
                + bytes(did_m[did_b[k]:did_b[k + 1]])
                + bytes(tf_m[tf_b[k]:tf_b[k + 1]])
                + bytes(np_m[np_b[k]:np_b[k + 1]])
                + bytes(pos_m[pos_b[k]:pos_b[k + 1]])
                + bytes(imp_m[imp_b[k]:imp_b[k + 1]])
            )
        return out
    for k in range(starts.size):
        out.append(
            bytes(hdr_m[hdr_b[k]:hdr_b[k + 1]])
            + bytes(did_m[did_b[k]:did_b[k + 1]])
            + bytes(tf_m[tf_b[k]:tf_b[k + 1]])
            + bytes(np_m[np_b[k]:np_b[k + 1]])
            + bytes(pos_m[pos_b[k]:pos_b[k + 1]])
        )
    return out


def encode_payloads_np(docids, tfs, npos, flatpos, block_starts,
                       imps=None):
    """Per-block payloads, byte-identical to :func:`encode_block`.

    Inputs are the PARTITION-level parallel arrays (postings sorted so
    that each block is a contiguous slice): ``docids``/``tfs``/``npos``
    int64 per posting, ``flatpos`` the row-major concatenation of the
    position lists (int64), ``block_starts`` int64 start indices of
    each block (ascending, starting at 0).  ``imps`` (opt-in) appends
    the per-posting important[n] section.  Returns a list of bytes.

    One global varbyte pass per section + per-block slicing — the
    vectorized form of calling encode_block per block (whose layout
    [n][docid deltas][tfs][npos][pos deltas][important?] it reproduces
    exactly).
    """
    n_post = docids.size
    starts = np.asarray(block_starts, dtype=np.int64)
    bounds = np.append(starts, n_post)
    lens = np.diff(bounds)

    # docid deltas: absolute at each block start, strictly-positive
    # deltas inside the block
    dd = docids.copy()
    dd[1:] -= docids[:-1]
    dd[starts] = docids[starts]
    if n_post > 1:
        inner = np.ones(n_post, dtype=bool)
        inner[starts] = False
        if (dd[inner] <= 0).any():
            raise ValueError("docids not strictly increasing in block")

    # per-row position deltas: absolute first position per row
    if flatpos.size:
        pd_ = flatpos.copy()
        pd_[1:] -= flatpos[:-1]
        row_starts_flat = np.zeros(flatpos.size, dtype=bool)
        row_off = np.concatenate(([0], np.cumsum(npos)[:-1]))
        row_starts_flat[row_off[npos > 0]] = True
        pd_[row_starts_flat] = flatpos[row_starts_flat]
    else:
        pd_ = flatpos

    hdr_buf, hdr_ends = vb_encode_np(lens)
    did_buf, did_ends = vb_encode_np(dd)
    tf_buf, tf_ends = vb_encode_np(tfs)
    np_buf, np_ends = vb_encode_np(npos)
    pos_buf, pos_ends = vb_encode_np(pd_)
    if imps is not None:
        imp_buf, imp_ends = vb_encode_np(
            np.asarray(imps, dtype=np.int64)
        )

    def sec_bounds(ends, idx_bounds):
        """Byte offsets of each block's section given value ends and
        the blocks' value-index bounds (vectorized: offset 0 for the
        zeroth value, else the previous value's end)."""
        if ends.size == 0:
            return np.zeros(idx_bounds.size, dtype=np.int64)
        return np.where(
            idx_bounds == 0, 0, ends[np.maximum(idx_bounds, 1) - 1]
        )

    did_b = sec_bounds(did_ends, bounds)
    tf_b = sec_bounds(tf_ends, bounds)
    np_b = sec_bounds(np_ends, bounds)
    # positions: a block's flat-value range comes from the row offsets
    posval_off = np.concatenate(([0], np.cumsum(npos)))
    pos_bounds_vals = posval_off[bounds]
    pos_b = sec_bounds(pos_ends, pos_bounds_vals)
    hdr_b = np.concatenate(([0], hdr_ends))

    hdr_m, did_m = memoryview(hdr_buf), memoryview(did_buf)
    tf_m, np_m, pos_m = (
        memoryview(tf_buf), memoryview(np_buf), memoryview(pos_buf),
    )
    out = []
    if imps is not None:
        imp_b = sec_bounds(imp_ends, bounds)
        imp_m = memoryview(imp_buf)
        for k in range(starts.size):
            out.append(
                bytes(hdr_m[hdr_b[k]:hdr_b[k + 1]])
                + bytes(did_m[did_b[k]:did_b[k + 1]])
                + bytes(tf_m[tf_b[k]:tf_b[k + 1]])
                + bytes(np_m[np_b[k]:np_b[k + 1]])
                + bytes(pos_m[pos_b[k]:pos_b[k + 1]])
                + bytes(imp_m[imp_b[k]:imp_b[k + 1]])
            )
        return out
    for k in range(starts.size):
        out.append(
            bytes(hdr_m[hdr_b[k]:hdr_b[k + 1]])
            + bytes(did_m[did_b[k]:did_b[k + 1]])
            + bytes(tf_m[tf_b[k]:tf_b[k + 1]])
            + bytes(np_m[np_b[k]:np_b[k + 1]])
            + bytes(pos_m[pos_b[k]:pos_b[k + 1]])
        )
    return out
