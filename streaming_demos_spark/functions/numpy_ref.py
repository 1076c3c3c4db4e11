"""Pure-Python/numpy reference implementations of the eigendecomposition
pipelines (hashed TF-IDF -> truncated SVD, PPMI-SVD word vectors, ZCA
whitening) — the independent second implementation behind their DuckDB
oracles and numpy-parity tests.

Everything here is Spark-free and deterministic: an exact pure-Python
XXH64 (bit-compatible with Spark's ``F.xxhash64``, seed 42), exact
integer counting, and the same component-grid quantization the Spark
side applies driver-side (see ``tfidf.svd_components``), so both
engines eigendecompose the *identical* float matrix and produce
bit-identical projections.

Reference parity: the reference's sklearn-backed embedding step
(product-recommender/recsys-engine/src/preprocessor.py:94-97) is the
behavioral model for the TF-IDF->SVD half.
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np


def jvm_round(x: float, dp: int) -> float:
    """Replicate Spark's ``F.round`` on DoubleType: HALF_UP applied to
    the shortest decimal representation (JVM ``BigDecimal.valueOf``),
    NOT banker's rounding on the binary value (numpy). The two differ
    exactly at decimal midpoints — which an upstream coarse ``round``
    manufactures — so oracle-side rounding must use this."""
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP
        )
    )

_MASK = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    0x9E3779B185EBCA87,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x85EBCA77C2B2AE63,
    0x27D4EB2F165667C5,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _rnd(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge(acc: int, val: int) -> int:
    acc ^= _rnd(0, val)
    return ((acc * _P1) + _P4) & _MASK


def xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64 (signed 64-bit, seed 42) — bit-compatible with Spark's
    ``F.xxhash64`` on a string column (which hashes the UTF-8 bytes)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _rnd(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _rnd(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _rnd(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _rnd(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _rnd(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def slot_of(term: str, dim: int) -> int:
    """``pmod(xxhash64(term), dim)`` — the hashing-trick slot."""
    return xxhash64(term.encode("utf-8")) % dim


def tokenize_alnum(text: str) -> list[str]:
    """``split(lower(text), '[^a-z0-9]+')`` minus empties — mirrors
    ``tfidf.tokenize`` (TOKEN_PATTERN)."""
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t != ""]


def tokenize_ws(text: str) -> list[str]:
    """``split(lower(trim(text)), '\\s+')`` — mirrors ``text.tokens``.
    Note: NO empty-token filter (Spark's split keeps a leading empty
    string when the trimmed text is empty)."""
    return re.split(r"\s+", text.strip().lower())


def hashed_tfidf_vectors(
    ids: list, texts: list[str], dim: int = 256, min_df: int = 1
) -> dict:
    """Mirror of ``tfidf.hashed_tfidf_vectors``: id -> dense np vector.

    All counts are exact integers; the idf weight is the identical float
    expression, so vectors are bit-equal to the Spark side (measured:
    zero deviation across task layouts)."""
    tf: dict = {}
    for i, txt in zip(ids, texts):
        for t in tokenize_alnum(txt):
            s = slot_of(t, dim)
            tf[(i, s)] = tf.get((i, s), 0) + 1
    df: dict = {}
    for (_, s), _n in tf.items():
        df[s] = df.get(s, 0) + 1
    if min_df > 1:
        df = {s: d for s, d in df.items() if d >= min_df}
    n_docs = len(set(ids))
    vecs = {i: np.zeros(dim) for i in set(ids)}
    for (i, s), t in tf.items():
        if s in df:
            vecs[i][s] = t * (math.log((1.0 + n_docs) / (1.0 + df[s])) + 1.0)
    return vecs


def ppmi_vectors(
    texts: list[str], window: int = 3, min_count: int = 5, dim: int = 64
) -> dict:
    """Mirror of the co-occurrence/PPMI half of
    ``tfidf.ppmi_word_vectors``: term -> dense slot-hashed PPMI vector.

    Slot sums accumulate with ``math.fsum`` (exactly-rounded, order
    independent), matching the Spark side within the component grid."""
    bc: dict = {}
    for txt in texts:
        tk = tokenize_ws(txt)
        n = len(tk)
        for i in range(n):
            for j in range(i + 1, min(i + 1 + window, n)):
                bc[(tk[i], tk[j])] = bc.get((tk[i], tk[j]), 0) + 1
                bc[(tk[j], tk[i])] = bc.get((tk[j], tk[i]), 0) + 1
    marg: dict = {}
    for (w, _c), k in bc.items():
        marg[w] = marg.get(w, 0) + k
    total = float(sum(bc.values()))
    slot_cache: dict = {}
    by_slot: dict = {}
    for (w, c), k in bc.items():
        if marg[w] < min_count:
            continue
        p = math.log2((k * total) / (float(marg[w]) * marg[c]))
        if p <= 0:
            continue
        s = slot_cache.get(c)
        if s is None:
            s = slot_cache[c] = slot_of(c, dim)
        by_slot.setdefault((w, s), []).append(p)
    vecs: dict = {}
    for (w, s), ps in by_slot.items():
        v = vecs.get(w)
        if v is None:
            v = vecs[w] = np.zeros(dim)
        v[s] = math.fsum(ps)
    return vecs


def whitening_transform(
    X: np.ndarray, eps: float = 1e-6, grid_dp: int = 6
) -> tuple[np.ndarray, np.ndarray]:
    """Mirror of ``similarity.whiten_embeddings``'s driver stage:
    (mu, W) with the same component-grid snap (both engines round the
    tiny driver-side results to ``grid_dp`` dp so the map-only
    projection runs against bit-identical matrices)."""
    n = X.shape[0]
    mu = X.sum(axis=0) / n
    cov = (X.T @ X) / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    w = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, eps))) @ vecs.T
    return np.round(mu, grid_dp), np.round(w, grid_dp)
