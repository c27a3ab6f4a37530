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
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def crc64(data: bytes) -> int:
    """CRC-64 (reflected, init/xorout all-ones) of ``data``."""
    crc = _MASK64
    eight = np.uint64(8)
    mask = np.uint64(0xFF)
    for b in data:
        crc = (crc >> eight) ^ _CRC64_TABLE[int((crc ^ np.uint64(b)) & mask)]
    return int(crc ^ _MASK64)


def simhash32(wordcnts) -> int:
    """32-bit simhash of a ``{word: count}`` map.

    Bit i (MSB-first, as the reference's binary-string loop indexes,
    lib/duphash.py:124-132) is set iff the weighted sum at that position
    is strictly positive.
    """
    v = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for word, cnt in wordcnts.items():
        h = crc64(word.encode("utf-8")) % (1 << SIMHASH_BITS)
        for i in range(SIMHASH_BITS):
            bit = (h >> (SIMHASH_BITS - 1 - i)) & 1
            v[i] += cnt if bit else -cnt
    fp = 0
    for i in range(SIMHASH_BITS):
        fp = (fp << 1) | (1 if v[i] > 0 else 0)
    return fp


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
