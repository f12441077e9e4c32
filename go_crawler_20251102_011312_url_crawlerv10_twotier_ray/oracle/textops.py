"""Pinned pure-Python reference implementations for the text/dedup
operators whose semantics are not SQL-expressible, plus a minting step
that materializes their expected outputs as parquet so the driver can
hash-check them via ``read_parquet`` — the same trick the crawl loop uses
(oracle/crawl_sim.py → oracle_* tables).

These are deliberately naive per-doc loops, independent of the engine's
vectorized kernels (pipelines/text.py, pipelines/dedup.py,
functions/hashing.py): same mathematical definition, different code path.
A divergence between engine and this module is a bug, not drift — do not
"sync" them mechanically.

(The ANN queries have the same treatment in oracle/annops.py — since
round 4 every registered query is hash-checked; LSH/IVF recall QUALITY
remains pytest-gated.)
"""

from __future__ import annotations

import hashlib
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

# frozen copies of the engine constants (pipelines/text.py, dedup.py) —
# the oracle must not move when the engine is edited
_LETTER = r"a-zA-ZäöüßéèêàçñÀ-ÿ"
_WORD_RE = re.compile(f"[{_LETTER}]+")
_STOPWORDS = {
    "en": {"the", "and", "is", "in", "to", "of", "a", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "für", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "que", "dans"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "por", "para"},
}
_SHINGLE_K = 3
_JACCARD_QUERY_THRESHOLD = 0.3  # dedup_ngram_jaccard default
_SIMHASH_MAX_HAMMING = 3
_WINNOW_K = 8
_WINNOW_W = 16
_WINNOW_PAIR_MAX_FREQ = 20   # dedup_winnow_pairs boilerplate-fp cap
_WINNOW_PAIR_MIN_SHARED = 3  # dedup_winnow_pairs pair threshold
# corpus_curation gates (pipelines/text.py defines the same values)
_CURATION_MIN_TOKENS = 20
_CURATION_TOK_LEN_MIN_C = 380
_CURATION_TOK_LEN_MAX_C = 520
_CURATION_MAX_TOP_WORD_BP = 2000
_CURATION_LANGS = "('de','en','es','fr')"

ORACLE_VERSION = "v2"  # bump to invalidate minted caches (v2: + minhash)


# ---------------------------------------------------------------------------
# reference kernels (per doc, plain loops)
# ---------------------------------------------------------------------------


def ref_lang_id(text: str) -> tuple[str, int]:
    """(lang_pred, hit_permille): maximal-letter-run decomposition +
    case-insensitive stopword membership. The engine's boundary-anchored
    alternation regex matches a stopword exactly when it is a complete
    letter run, so run-membership counting is the same definition."""
    runs = _WORD_RE.findall(text)
    n_words = len(runs)
    best_lang, best_hits = None, -1
    for lang in sorted(_STOPWORDS):  # tie-break: first alphabetical max
        sw = _STOPWORDS[lang]
        hits = sum(1 for r in runs if r.lower() in sw)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits == 0 or n_words == 0:
        return "und", 0
    return best_lang, best_hits * 1000 // max(n_words, 1)


def ref_winnowing(text: str, k: int = _WINNOW_K, w: int = _WINNOW_W) -> list[int]:
    """Winnowing fingerprints by direct (non-rolling) k-gram hashing:
    h(i) = sum(byte[i+j] * base^(k-1-j)) mod 2^64 — the closed form of the
    engine's Rabin-Karp recurrence — then plain-loop window minima."""
    data = text.encode("utf-8", "replace")
    n = len(data)
    if n == 0:
        return []
    if n < k:
        h = int.from_bytes(
            hashlib.blake2b(data, digest_size=8).digest(), "little")
        return [h & 0x7FFFFFFFFFFFFFFF]
    base = 1000003
    mask = (1 << 64) - 1
    powers = [pow(base, k - 1 - j, 1 << 64) for j in range(k)]
    hashes = []
    for i in range(n - k + 1):
        h = 0
        for j in range(k):
            h += data[i + j] * powers[j]
        hashes.append(h & mask)
    if len(hashes) <= w:
        fps = {min(hashes)}
    else:
        fps = set()
        for i in range(len(hashes) - w + 1):
            fps.add(min(hashes[i : i + w]))
    return sorted(f & 0x7FFFFFFFFFFFFFFF for f in fps)


def ref_simhash(text: str) -> int:
    """64-bit SimHash over word unigrams, plain per-bit loop."""
    acc = [0] * 64
    for word in text.split():
        h = int.from_bytes(
            hashlib.blake2b(word.encode(), digest_size=8).digest(), "little")
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def ref_word_shingle_set(text: str, k: int = _SHINGLE_K) -> frozenset:
    """Word k-shingles as TUPLES (the engine hashes them to uint64; sets of
    tuples give the same Jaccard barring 64-bit hash collisions)."""
    words = text.split()
    if not words:
        return frozenset()
    if len(words) < k:
        return frozenset([tuple(words)])
    return frozenset(tuple(words[i : i + k]) for i in range(len(words) - k + 1))


def _jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------------------
# expected-output tables for one documents.parquet
# ---------------------------------------------------------------------------


def expected_lang_id(docs: pa.Table) -> pa.Table:
    ids = docs["doc_id"].to_pylist()
    langs = docs["lang"].to_pylist()
    texts = docs["text"].to_pylist()
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    preds, scores = [], []
    for i in order:
        p, s = ref_lang_id(texts[i])
        preds.append(p)
        scores.append(s)
    return pa.table(
        {
            "doc_id": pa.array([ids[i] for i in order], pa.int64()),
            "lang": pa.array([langs[i] for i in order], pa.string()),
            "lang_pred": pa.array(preds, pa.string()),
            "hit_permille": pa.array(scores, pa.int64()),
        }
    )


def expected_winnowing(docs: pa.Table) -> pa.Table:
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    out_ids, out_fps = [], []
    for i in order:
        for f in ref_winnowing(texts[i]):
            out_ids.append(ids[i])
            out_fps.append(f)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "fp": pa.array(out_fps, pa.int64()),
        }
    )


def expected_simhash_pairs(docs: pa.Table) -> pa.Table:
    """ALL (a < b) pairs with Hamming ≤ 3 by brute force — independently
    verifies the engine's banded candidate generation (pigeonhole: 4×16-bit
    bands have recall 1 at Hamming ≤ 3, so equality must hold)."""
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    sigs = [(ids[i], ref_simhash(texts[i])) for i in order]
    rows = []
    for i in range(len(sigs)):
        a, sa = sigs[i]
        for j in range(i + 1, len(sigs)):
            b, sb = sigs[j]
            d = bin(sa ^ sb).count("1")
            if d <= _SIMHASH_MAX_HAMMING:
                rows.append((a, b, d))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def expected_ngram_jaccard(
    docs: pa.Table, threshold: float = _JACCARD_QUERY_THRESHOLD
) -> pa.Table:
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    sources = docs["source"].to_pylist()
    by_source: dict[str, list[int]] = {}
    for i in range(len(ids)):
        by_source.setdefault(sources[i], []).append(i)
    rows = []
    for grp in by_source.values():
        grp = sorted(grp, key=lambda i: ids[i])
        sh = [ref_word_shingle_set(texts[i]) for i in grp]
        for x in range(len(grp)):
            for y in range(x + 1, len(grp)):
                jac = _jaccard(sh[x], sh[y])
                if jac >= threshold:
                    rows.append(
                        (ids[grp[x]], ids[grp[y]], int(round(jac * 100))))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard_pct": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# MinHash+LSH pinned reference (plain-Python transcription of the hash
# SPEC — blake2b word hashes, splitmix position constants, Mersenne
# affine permutations, FNV band mixing — independent of the vectorized
# engine kernels in functions/hashing.py. The banded candidate set is
# deterministic GIVEN the spec, so the full banded+verified pair list is
# hash-checkable, same structure as the winnowing oracle.)
# ---------------------------------------------------------------------------

_MH_N_PERM = 128
_MH_N_BANDS = 32
_MH_K = 3
_MH_SEED = 12345
_MH_JACCARD = 0.5
_MH_BUCKET_CAP = 200   # engine skips degenerate giant buckets
_MH_M = (1 << 31) - 1  # Mersenne modulus of the affine permutations
_MASK64 = (1 << 64) - 1
_MH_MIX2 = 0xC2B2AE3D27D4EB4F
_MH_FNV = 0xCBF29CE484222325


def _mh_pos_constants(k: int) -> list[int]:
    out = []
    golden = 0x9E3779B97F4A7C15
    x = golden
    for _ in range(k):
        x = (x + golden) & _MASK64
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
        out.append(z | 1)
    return out


def _mh_shingles(text: str, k: int = _MH_K) -> list[int]:
    import hashlib as _hl

    words = text.split()
    wh = [int.from_bytes(_hl.blake2b(w.encode(), digest_size=8).digest(),
                         "little") for w in words]
    n = len(wh)
    if n == 0:
        return []
    if n < k:
        h = _MH_FNV
        for v in wh:
            h = ((h ^ v) * _MH_MIX2) & _MASK64
        return [h]
    pos = _mh_pos_constants(k)
    out = []
    for i in range(n - k + 1):
        acc = 0
        for j in range(k):
            acc ^= (wh[i + j] * pos[j]) & _MASK64
        acc = (acc * _MH_MIX2) & _MASK64
        acc ^= acc >> 29
        out.append(acc)
    return out


def expected_minhash_pairs(docs: pa.Table) -> pa.Table:
    import numpy as _np

    rng = _np.random.RandomState(_MH_SEED)
    a = [int(v) for v in rng.randint(1, _MH_M, size=_MH_N_PERM,
                                     dtype=_np.uint64)]
    b = [int(v) for v in rng.randint(0, _MH_M, size=_MH_N_PERM,
                                     dtype=_np.uint64)]
    rows_per_band = _MH_N_PERM // _MH_N_BANDS

    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    sh_sets: dict[int, set[int]] = {}
    buckets: dict[int, set[int]] = {}
    for doc_id, text in zip(ids, texts):
        shs = _mh_shingles(text)
        sh_sets[doc_id] = set(shs)
        if shs:
            xs = [s % _MH_M for s in shs]
            sig = [min((x * a[p] + b[p]) % _MH_M for x in xs)
                   for p in range(_MH_N_PERM)]
        else:
            sig = [_MASK64] * _MH_N_PERM
        for band in range(_MH_N_BANDS):
            h = _MH_FNV
            for r in range(rows_per_band):
                h = ((h ^ sig[band * rows_per_band + r]) * _MH_MIX2) & _MASK64
                h ^= h >> 31
            key = (h >> 8) | (band << 56)
            buckets.setdefault(key, set()).add(doc_id)

    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2 or len(members) > _MH_BUCKET_CAP:
            continue
        ms = sorted(members)
        for i, x in enumerate(ms):
            for y in ms[i + 1:]:
                cand.add((x, y))

    rows = []
    for x, y in sorted(cand):
        sa, sb = sh_sets[x], sh_sets[y]
        union = len(sa | sb)
        jac = (len(sa & sb) / union) if union else 1.0
        if jac >= _MH_JACCARD:
            rows.append((x, y, int(round(jac * 100))))
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard_pct": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# minting
# ---------------------------------------------------------------------------

_TABLES = {
    "oracle_lang_id": expected_lang_id,
    "oracle_winnowing": expected_winnowing,
    "oracle_simhash_pairs": expected_simhash_pairs,
    "oracle_ngram_jaccard": expected_ngram_jaccard,
    "oracle_minhash_pairs": expected_minhash_pairs,
}


def mint_text_oracles(sf_dir: str, base: str = "/tmp/graft_textoracle") -> str:
    """Compute + cache the expected-output parquet for one sf dir. Pure
    Python (no Ray) so oracle_sql() can call it. Returns the cache dir."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(base, f"{sf_name}-{ORACLE_VERSION}")
    stamp = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(stamp):
        return out_dir
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in _TABLES.items():
        pq.write_table(fn(docs), os.path.join(out_dir, f"{name}.parquet"))
    with open(stamp, "w") as f:
        f.write(ORACLE_VERSION)
    return out_dir


def oracle_sqls(sf_dir: str) -> dict[str, str]:
    """Mint (cached) and return the read_parquet oracle SQL per query key."""
    d = mint_text_oracles(sf_dir)
    # shared recursive-CTE prefix: min-reachable-id cluster labels over
    # exact-md5 star edges ∪ winnow pairs — consumed by both the
    # dedup_clusters and dedup_keep_best oracles below
    cluster_cte = f"""
WITH RECURSIVE
docs AS (SELECT doc_id, md5(text) AS h
         FROM read_parquet('{sf_dir}/documents.parquet')),
er AS (SELECT h, min(doc_id) AS root FROM docs GROUP BY h),
exact_edges AS (SELECT d.doc_id AS a, er.root AS b
                FROM docs d JOIN er USING (h) WHERE er.root < d.doc_id),
fp AS (SELECT doc_id, fp FROM read_parquet('{d}/oracle_winnowing.parquet')),
okf AS (SELECT fp FROM fp GROUP BY fp
        HAVING count(*) BETWEEN 2 AND {_WINNOW_PAIR_MAX_FREQ}),
wj AS (SELECT a.doc_id AS a, b.doc_id AS b
       FROM fp a JOIN fp b USING (fp)
       WHERE a.doc_id < b.doc_id AND a.fp IN (SELECT fp FROM okf)),
wpairs AS (SELECT a, b FROM wj GROUP BY a, b
           HAVING count(*) >= {_WINNOW_PAIR_MIN_SHARED}),
edges AS (SELECT a, b FROM exact_edges UNION SELECT a, b FROM wpairs),
bidir AS (SELECT a AS src, b AS dst FROM edges
          UNION SELECT b AS src, a AS dst FROM edges),
reach(doc_id, root) AS (
    SELECT doc_id, doc_id FROM docs
    UNION
    SELECT bi.dst, r.root FROM reach r JOIN bidir bi ON bi.src = r.doc_id
),
cl AS (SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id)"""
    return {
        "lang_id": (
            f"SELECT * FROM read_parquet('{d}/oracle_lang_id.parquet') "
            "ORDER BY doc_id"
        ),
        "doc_winnowing": (
            f"SELECT * FROM read_parquet('{d}/oracle_winnowing.parquet') "
            "ORDER BY doc_id, fp"
        ),
        "dedup_simhash": (
            f"SELECT * FROM read_parquet('{d}/oracle_simhash_pairs.parquet') "
            "ORDER BY doc_a, doc_b"
        ),
        "dedup_ngram_jaccard": (
            f"SELECT * FROM read_parquet('{d}/oracle_ngram_jaccard.parquet') "
            "ORDER BY doc_a, doc_b"
        ),
        # banded-LSH pairs are deterministic GIVEN the pinned hash spec —
        # the minted table transcribes that spec in plain Python
        "dedup_minhash_lsh": (
            f"SELECT * FROM read_parquet('{d}/oracle_minhash_pairs.parquet') "
            "ORDER BY doc_a, doc_b"
        ),
        # derived relationally from the SAME minted per-doc fingerprints the
        # doc_winnowing hash check pins — an independent code path for the
        # pair semantics (DuckDB join/groupby vs the engine's Dataset join)
        "dedup_winnow_pairs": f"""
WITH fp AS (SELECT doc_id, fp
            FROM read_parquet('{d}/oracle_winnowing.parquet')),
ok AS (SELECT fp FROM fp GROUP BY fp
       HAVING count(*) BETWEEN 2 AND {_WINNOW_PAIR_MAX_FREQ}),
j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM fp a JOIN fp b USING (fp)
      WHERE a.doc_id < b.doc_id AND a.fp IN (SELECT fp FROM ok))
SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS shared_fps
FROM j GROUP BY doc_a, doc_b
HAVING count(*) >= {_WINNOW_PAIR_MIN_SHARED}
ORDER BY doc_a, doc_b
""",
        # connected components over exact-md5 star edges + the SAME winnow
        # pair semantics, as a DuckDB recursive CTE (min-reachable-id
        # labels) — a fully independent implementation of the engine's
        # union-find / label-propagation tails
        "dedup_clusters": cluster_cte + """,
sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       FROM cl GROUP BY cluster_id)
SELECT cl.doc_id, cl.cluster_id, sz.cluster_size,
       (cl.doc_id = cl.cluster_id) AS keep
FROM cl JOIN sz USING (cluster_id)
ORDER BY cl.doc_id
""",
        # winner per cluster = max token count, ties -> min doc_id — the
        # same integer keys the engine's dedup_keep_best ranks on
        "dedup_keep_best": cluster_cte + rf""",
q AS (SELECT doc_id,
             CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
                 AS n_tokens
      FROM read_parquet('{sf_dir}/documents.parquet')),
r AS (SELECT cl.doc_id, cl.cluster_id, q.n_tokens,
             row_number() OVER (PARTITION BY cl.cluster_id
                                ORDER BY q.n_tokens DESC, cl.doc_id)
                 AS rn
      FROM cl JOIN q USING (doc_id))
SELECT doc_id, cluster_id, n_tokens, (rn = 1) AS keep
FROM r ORDER BY doc_id
""",
        # curation gates recomputed relationally over documents + the SAME
        # minted lang-oracle parquet the lang_id hash pins — independent of
        # the engine's fused-signal kernel and Dataset join
        "corpus_curation": rf"""
WITH docs AS (SELECT * FROM read_parquet('{sf_dir}/documents.parquet')),
sig AS (
  SELECT doc_id, md5(text) AS h,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) * 100
           // greatest(CAST(length(regexp_extract_all(text, '\S+'))
                            AS BIGINT), 1) AS mean_tok_len_c
  FROM docs),
wc AS (SELECT doc_id, w, count(*) AS c
       FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
             FROM docs)
       GROUP BY doc_id, w),
topw AS (SELECT doc_id, max(c) AS top FROM wc GROUP BY doc_id),
pred AS (SELECT doc_id, lang_pred
         FROM read_parquet('{d}/oracle_lang_id.parquet')),
win AS (SELECT h, min(doc_id) AS keeper FROM sig GROUP BY h),
f AS (SELECT sig.doc_id, sig.n_tokens, sig.mean_tok_len_c,
             CAST(coalesce(topw.top, 0) * 10000
                  // greatest(sig.n_tokens, 1) AS BIGINT)
               AS top_word_frac_bp,
             pred.lang_pred, win.keeper
      FROM sig LEFT JOIN topw USING (doc_id)
               JOIN pred USING (doc_id) JOIN win USING (h)),
r AS (SELECT *,
        CASE WHEN n_tokens < {_CURATION_MIN_TOKENS} THEN 'too_short'
             WHEN mean_tok_len_c NOT BETWEEN {_CURATION_TOK_LEN_MIN_C}
                  AND {_CURATION_TOK_LEN_MAX_C} THEN 'token_length'
             WHEN top_word_frac_bp > {_CURATION_MAX_TOP_WORD_BP}
                  THEN 'repetitive'
             WHEN lang_pred NOT IN {_CURATION_LANGS} THEN 'language'
             WHEN doc_id <> keeper THEN 'duplicate'
             ELSE 'kept' END AS reason
      FROM f)
SELECT doc_id, n_tokens, mean_tok_len_c, top_word_frac_bp, lang_pred,
       reason, (reason = 'kept') AS keep
FROM r ORDER BY doc_id
""",
    }
