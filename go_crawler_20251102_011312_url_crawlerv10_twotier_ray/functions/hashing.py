"""Hashing kernels for dedup / fingerprinting — vectorized where possible.

All hashes are process-stable (blake2b/md5-seeded, never Python's salted
``hash``) so results are deterministic across runs and workers.
"""

from __future__ import annotations

import hashlib

import numpy as np

# 31-bit Mersenne prime: a,b,x < p keeps a*x+b within uint64 → fully
# vectorized exact modular arithmetic without bignum fallback
_MERSENNE = (1 << 31) - 1


def md5_hex(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def md5_hex_arrow(col) -> list[str]:
    """md5 hex per row straight off the Arrow string buffers (utf-8, same
    bytes ``str.encode()`` would produce) — no per-row Python str
    materialization / encode allocation. Nulls hash as the empty string."""
    import pyarrow as pa

    arr = col if isinstance(col, pa.ChunkedArray) else pa.chunked_array([col])
    out: list[str] = []
    for chunk in arr.chunks:
        if len(chunk) == 0:
            continue
        if chunk.null_count:
            chunk = chunk.fill_null("")
        width = np.int64 if pa.types.is_large_string(chunk.type) else np.int32
        bufs = chunk.buffers()
        offsets = np.frombuffer(
            bufs[1], dtype=width, count=len(chunk) + 1,
            offset=chunk.offset * np.dtype(width).itemsize,
        )
        data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
        out.extend(
            hashlib.md5(data[offsets[i]:offsets[i + 1]]).hexdigest()
            for i in range(len(chunk))
        )
    return out


def _perm_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


# splitmix-style odd mixing constants (stable across processes)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
_FNV = np.uint64(0xCBF29CE484222325)


def _pos_constants(k: int) -> np.ndarray:
    """One odd multiplier per shingle position (deterministic splitmix)."""
    out = np.empty(k, dtype=np.uint64)
    x = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):  # splitmix wraps mod 2^64 by design
        for j in range(k):
            x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(2**64 - 1)
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[j] = z | np.uint64(1)
    return out


_POS3 = _pos_constants(8)  # enough positions for any practical k

# per-process word-hash memo: corpora repeat words massively, so one
# blake2b per DISTINCT word per process replaces one per shingle
_WORD_CACHE: dict[str, int] = {}


def word_hash_array(words: list[str]) -> np.ndarray:
    cache = _WORD_CACHE
    if len(cache) > 2_000_000:
        cache.clear()
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
            )
            cache[w] = h
        out[i] = h
    return out


def shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingle hashes (uint64, stable): each word is blake2b-hashed
    once (memoized per process), shingle hashes combine the k word hashes
    with position-dependent odd multipliers — fully vectorized, no per-
    shingle digest calls."""
    if k > len(_POS3):
        raise ValueError(
            f"shingle k={k} exceeds the {len(_POS3)} precomputed position "
            "constants — extend _POS3 (_pos_constants) first"
        )
    words = text.split()
    n = len(words)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    wh = word_hash_array(words)
    if n < k:
        h = _FNV
        for v in wh:
            h = (h ^ v) * _MIX2
        return np.array([h], dtype=np.uint64)
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        acc ^= wh[j : j + m] * _POS3[j]
    acc *= _MIX2
    acc ^= acc >> np.uint64(29)
    return acc


def minhash_matrix(
    shingle_arrays: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures for a whole BATCH of docs at once: one
    (total_shingles × n_perm) modular-affine matrix + per-doc segment minima
    via ``np.minimum.reduceat`` — no per-doc Python work beyond the list
    bookkeeping. Empty docs get the max-sentinel signature."""
    n_docs, n_perm = len(shingle_arrays), len(a)
    out = np.full((n_docs, n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = [i for i, s in enumerate(shingle_arrays) if len(s)]
    if not nonempty:
        return out
    concat = np.concatenate([shingle_arrays[i] for i in nonempty])
    x = (concat % _MERSENNE).astype(np.uint64)
    vals = (x[:, None] * a[None, :] + b[None, :]) % _MERSENNE  # < 2^62: exact
    lens = np.array([len(shingle_arrays[i]) for i in nonempty])
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    out[nonempty] = np.minimum.reduceat(vals, starts, axis=0)
    return out


def band_keys_matrix(sig: np.ndarray, n_bands: int) -> np.ndarray:
    """LSH band keys as int64 (band index in the top byte, mixed band hash
    below): integer keys shuffle ~5× cheaper than the old hex strings, and
    the whole (n_docs × n_bands) grid is computed vectorized."""
    n_docs, n_perm = sig.shape
    rows = n_perm // n_bands
    v = sig[:, : n_bands * rows].reshape(n_docs, n_bands, rows)
    h = np.full((n_docs, n_bands), _FNV, dtype=np.uint64)
    for r in range(rows):
        h = (h ^ v[:, :, r]) * _MIX2
        h ^= h >> np.uint64(31)
    band_idx = np.arange(n_bands, dtype=np.uint64) << np.uint64(56)
    return ((h >> np.uint64(8)) | band_idx[None, :]).view(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (stable blake2b word hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
        )
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_matrix(texts: list[str]) -> np.ndarray:
    """SimHash signatures for a whole BATCH of docs: one memoized word-hash
    pass over the flattened words, a single ±1 bit matrix, and per-doc
    ``np.add.reduceat`` segment sums — bit-identical to ``simhash64`` (the
    per-doc reference used by the oracle/tests) with no per-word Python in
    the hot loop. Empty docs get signature 0, matching simhash64."""
    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.uint64)
    word_lists = [t.split() for t in texts]
    nonempty = [i for i, wl in enumerate(word_lists) if wl]
    if not nonempty:
        return out
    wh = word_hash_array([w for i in nonempty for w in word_lists[i]])
    bits = (
        (wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.int32)
    pm = bits * 2 - 1  # ±1 per bit, int32: safe up to 2^31 words per doc
    lens = np.array([len(word_lists[i]) for i in nonempty])
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    acc = np.add.reduceat(pm, starts, axis=0)  # (n_nonempty, 64)
    sigbits = (acc > 0).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out[nonempty] = (sigbits * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def hamming64_array(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between two uint64 arrays (vectorized
    XOR + byte-level popcount via np.unpackbits)."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    if not len(x):
        return np.zeros(0, dtype=np.int64)
    return (
        np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1)
        .astype(np.int64)
    )


def rolling_fingerprints(text: str, k: int = 8, w: int = 16) -> list[int]:
    """Winnowing fingerprints: Rabin-Karp rolling hash of k-grams, minimum
    per window of w (Schleimer et al., SIGMOD'03). Deterministic."""
    from numpy.lib.stride_tricks import sliding_window_view

    data = text.encode("utf-8", "replace")
    n = len(data)
    if n < k:
        return [int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")] if n else []
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        # closed form of the Rabin-Karp recurrence: h(i) = Σ_j byte[i+j] ·
        # base^(k-1-j) mod 2^64 — one strided multiply+sum, no byte loop
        pw = np.power(np.uint64(1000003),
                      np.arange(k - 1, -1, -1, dtype=np.uint64))
        win = sliding_window_view(arr, k)  # (n-k+1, k), zero-copy
        hashes = (win * pw[None, :]).sum(axis=1, dtype=np.uint64)
        m = len(hashes)
        if m <= w:
            return [int(hashes.min())]
        # windowed minima (stride trick)
        mins = sliding_window_view(hashes, w).min(axis=1)
    return sorted(set(int(x) for x in mins))
