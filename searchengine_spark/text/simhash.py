"""SimHash near-duplicate fingerprinting.

Semantics pinned to the reference (lib/duphash.py:97-141): 32-bit simhash
over the per-doc word-count map, each word hashed with CRC-64 (reversed
polynomial 0xc96c5795d7870f42 — the standard public CRC-64/XZ parameters)
reduced mod 2^32; two docs are near-duplicates iff Hamming distance <= 3.

Divergence from the reference, by design (SURVEY.md P11): the reference
compares only against a sliding window of the 200 most recent docs
(makeindex.py:72-78) — order-dependent and non-exhaustive.  The rebuild
does an exhaustive, deterministic banded self-join: the 32-bit fingerprint
splits into 4 bands of 8 bits; Hamming<=3 guarantees at least one equal
band (pigeonhole), so the band join finds every qualifying pair.  The kept
representative of each near-dup cluster is the lowest (repo, path, commit).
"""

import numpy as np

from ..params import SIMHASH_BITS, SIMHASH_HAMMING, SIMHASH_BANDS

_CRC64_POLY = np.uint64(0xC96C5795D7870F42)


def _build_table():
    table = np.zeros(256, dtype=np.uint64)
    for byte in range(256):
        acc = np.uint64(byte)
        for _ in range(8):
            low = acc & np.uint64(1)
            acc = acc >> np.uint64(1)
            if low:
                acc ^= _CRC64_POLY
        table[byte] = acc
    return table


_CRC64_TABLE = _build_table()
# plain-int table: python int bit-ops are ~10× faster than numpy scalars
_CRC64_TABLE_INT = [int(x) for x in _CRC64_TABLE]
_M64 = 0xFFFFFFFFFFFFFFFF


def crc64(data: bytes) -> int:
    """CRC-64 (reflected, init/xorout all-ones) of ``data``."""
    crc = _M64
    tbl = _CRC64_TABLE_INT
    for b in data:
        crc = (crc >> 8) ^ tbl[(crc ^ b) & 0xFF]
    return crc ^ _M64


_BIT_SHIFTS64 = np.arange(63, -1, -1, dtype=np.uint64)


def _simhash_from_arrays(hashes: np.ndarray, counts: np.ndarray,
                         nbits: int) -> int:
    """Vectorized sign-sum: (nwords,) uint64 hashes + int64 counts → fp.

    MSB-first bit order, matching the reference's binary-string loop
    (lib/duphash.py:124-132).
    """
    shifts = _BIT_SHIFTS64[64 - nbits :]
    bits = ((hashes[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
    v = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
    fp = 0
    for bit in v > 0:
        fp = (fp << 1) | (1 if bit else 0)
    return fp


def simhash32(wordcnts) -> int:
    """32-bit simhash of a ``{word: count}`` map.

    Bit i (MSB-first, as the reference's binary-string loop indexes,
    lib/duphash.py:124-132) is set iff the weighted sum at that position
    is strictly positive.
    """
    words = list(wordcnts)
    hashes = np.array(
        [crc64(w.encode("utf-8")) % (1 << SIMHASH_BITS) for w in words],
        dtype=np.uint64,
    )
    counts = np.array([wordcnts[w] for w in words], dtype=np.int64)
    return _simhash_from_arrays(hashes, counts, SIMHASH_BITS)


def simhash64(wordcnts) -> int:
    """64-bit simhash — the scale variant (params.py SIMHASH64_*).

    The reference's 32-bit space (quirk kept as the default for oracle
    parity) saturates at web scale: 10^12 docs over 2^32 fingerprints
    collide everywhere and its 8-bit LSH bands each have only 256
    buckets, making the band self-join O(n²/256).  64 bits with 4×16-bit
    bands keeps the pigeonhole guarantee for Hamming<=3 (3 flips leave
    >=1 of 4 bands intact) while the join key space grows to 65536 per
    band.
    """
    words = list(wordcnts)
    hashes = np.array(
        [crc64(w.encode("utf-8")) for w in words], dtype=np.uint64
    )
    counts = np.array([wordcnts[w] for w in words], dtype=np.int64)
    return _simhash_from_arrays(hashes, counts, 64)


def hamming32(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFF).count("1")


def is_similar(a: int, b: int) -> bool:
    """Reference threshold: Hamming distance <= 3 (lib/duphash.py:137-141)."""
    return hamming32(a, b) <= SIMHASH_HAMMING


def bands(fp: int):
    """Split the 32-bit fingerprint into SIMHASH_BANDS equal bit-bands.

    Used for the LSH band self-join: Hamming<=3 over 4 bands implies at
    least one band is bit-identical, so joining on (band_id, band_value)
    has no false negatives for the <=3 threshold.
    """
    width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << width) - 1
    return [
        (i, (fp >> (SIMHASH_BITS - width * (i + 1))) & mask)
        for i in range(SIMHASH_BANDS)
    ]
