"""Pure-Python BLAKE3 (default 32-byte hash mode).

Implements the public BLAKE3 specification (O'Connor, Aumasson,
Neves, Wilcox-O'Hearn — https://github.com/BLAKE3-team/BLAKE3-specs,
CC0) for the reference's ``blake3(text)`` scalar
(``expression/scalar/string/HashFunctions.java:43,61`` — Apache
Commons Codec Blake3, 32-byte output, hex-encoded).

This is the executor-side fallback used inside the Arrow-batched
pandas UDF (Python workers cannot reach the driver's JVM gateway).
tests/test_functions.py cross-validates it against the JVM's
commons-codec Blake3 over lengths spanning multi-block and
multi-chunk inputs, plus the reference's own test vectors.
"""

from __future__ import annotations

import struct

_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
_MSG_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)
_CHUNK_START, _CHUNK_END, _PARENT, _ROOT = 1, 2, 4, 8
_MASK = 0xFFFFFFFF
_CHUNK_LEN = 1024
_BLOCK_LEN = 64


def _g(s: list, a: int, b: int, c: int, d: int, mx: int, my: int) -> None:
    s[a] = (s[a] + s[b] + mx) & _MASK
    x = s[d] ^ s[a]
    s[d] = ((x >> 16) | (x << 16)) & _MASK
    s[c] = (s[c] + s[d]) & _MASK
    x = s[b] ^ s[c]
    s[b] = ((x >> 12) | (x << 20)) & _MASK
    s[a] = (s[a] + s[b] + my) & _MASK
    x = s[d] ^ s[a]
    s[d] = ((x >> 8) | (x << 24)) & _MASK
    s[c] = (s[c] + s[d]) & _MASK
    x = s[b] ^ s[c]
    s[b] = ((x >> 7) | (x << 25)) & _MASK


def _compress(cv, block_words, counter, block_len, flags):
    s = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        _IV[0], _IV[1], _IV[2], _IV[3],
        counter & _MASK, (counter >> 32) & _MASK, block_len, flags,
    ]
    m = list(block_words)
    for r in range(7):
        _g(s, 0, 4, 8, 12, m[0], m[1])
        _g(s, 1, 5, 9, 13, m[2], m[3])
        _g(s, 2, 6, 10, 14, m[4], m[5])
        _g(s, 3, 7, 11, 15, m[6], m[7])
        _g(s, 0, 5, 10, 15, m[8], m[9])
        _g(s, 1, 6, 11, 12, m[10], m[11])
        _g(s, 2, 7, 8, 13, m[12], m[13])
        _g(s, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[p] for p in _MSG_PERM]
    return [(s[i] ^ s[i + 8]) & _MASK for i in range(8)]


def _chunk_cv(chunk: bytes, counter: int, root: bool) -> list:
    """Chaining value of one ≤1024-byte chunk; ``root`` sets ROOT on
    the final block (single-chunk inputs only)."""
    cv = list(_IV)
    blocks = [chunk[i : i + _BLOCK_LEN] for i in range(0, len(chunk), _BLOCK_LEN)]
    if not blocks:
        blocks = [b""]
    last = len(blocks) - 1
    for i, blk in enumerate(blocks):
        words = struct.unpack("<16I", blk.ljust(_BLOCK_LEN, b"\0"))
        flags = 0
        if i == 0:
            flags |= _CHUNK_START
        if i == last:
            flags |= _CHUNK_END
            if root:
                flags |= _ROOT
        cv = _compress(cv, words, counter, len(blk), flags)
    return cv


def _subtree_cv(chunks: list, counter: int) -> list:
    """CV of a (non-root) subtree of chunks. The left subtree takes
    the largest power-of-two chunk count strictly less than n."""
    n = len(chunks)
    if n == 1:
        return _chunk_cv(chunks[0], counter, root=False)
    split = 1 << ((n - 1).bit_length() - 1)
    left = _subtree_cv(chunks[:split], counter)
    right = _subtree_cv(chunks[split:], counter + split)
    return _compress(_IV, left + right, 0, _BLOCK_LEN, _PARENT)


def blake3_digest(data: bytes) -> bytes:
    """32-byte BLAKE3 hash of ``data`` (hash mode, no key)."""
    chunks = [data[i : i + _CHUNK_LEN] for i in range(0, len(data), _CHUNK_LEN)]
    if len(chunks) <= 1:
        cv = _chunk_cv(chunks[0] if chunks else b"", 0, root=True)
    else:
        split = 1 << ((len(chunks) - 1).bit_length() - 1)
        left = _subtree_cv(chunks[:split], 0)
        right = _subtree_cv(chunks[split:], split)
        cv = _compress(_IV, left + right, 0, _BLOCK_LEN, _PARENT | _ROOT)
    return struct.pack("<8I", *cv)


def blake3_hex(data: bytes) -> str:
    return blake3_digest(data).hex()
