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


def _perm_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles hashed to uint64 (stable)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
        )
    return out


def minhash_signature(
    sh: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """n_perm minima of (a*x + b) mod p over the shingle set (vectorized
    outer product: n_shingles × n_perm)."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = (sh % _MERSENNE).astype(np.uint64)
    vals = (np.outer(x, a) + b) % _MERSENNE  # < 2^62: exact in uint64
    return vals.min(axis=0)


def band_keys(sig: np.ndarray, n_bands: int) -> list[str]:
    """LSH band keys: hash of each band's rows."""
    rows = len(sig) // n_bands
    keys = []
    for b in range(n_bands):
        band = sig[b * rows : (b + 1) * rows].tobytes()
        keys.append(
            f"{b}:" + hashlib.blake2b(band, digest_size=8).hexdigest()
        )
    return keys


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


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprints(text: str, k: int = 8, w: int = 16) -> list[int]:
    """Winnowing fingerprints: Rabin-Karp rolling hash of k-grams, minimum
    per window of w (Schleimer et al., SIGMOD'03). Deterministic."""
    data = text.encode("utf-8", "replace")
    n = len(data)
    if n < k:
        return [int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")] if n else []
    base = np.uint64(1000003)
    mod = np.uint64(0xFFFFFFFFFFFFFFFF)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # rolling hash via cumulative powers (vectorized)
    pw = np.ones(k, dtype=np.uint64)
    for i in range(1, k):
        pw[i] = pw[i - 1] * base
    hashes = np.zeros(n - k + 1, dtype=np.uint64)
    h = np.uint64(0)
    for i in range(k):
        h = h * base + arr[i]
    hashes[0] = h
    top = pw[k - 1]
    for i in range(1, n - k + 1):
        h = (h - arr[i - 1] * top) * base + arr[i + k - 1]
        hashes[i] = h
    m = len(hashes)
    if m <= w:
        return [int(hashes.min())]
    # windowed minima (stride trick)
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(hashes, w).min(axis=1)
    return sorted(set(int(x) for x in mins))
