"""Vectorized Levenshtein edit distance over PAIRS of strings.

The kernel for blocked fuzzy record linkage (queries.fuzzy_match_documents):
given P candidate pairs (a_i, b_i), compute all P distances in one numpy
DP sweep — the i-loop runs over string positions (bounded by the prefix
length, e.g. 40), every step is a (P, L) vectorized op, so per-pair cost
is O(L) numpy work instead of an O(L^2) Python loop per pair.

The usual row-DP recurrence curr[j] = min(prev[j]+1, curr[j-1]+1,
prev[j-1]+cost) has a sequential dependency on curr[j-1]; it is removed
with the running-minimum identity

    f[j] = min(seq[j], f[j-1] + 1)  ==  min_{k<=j} (seq[k] + (j-k))
         == minimum.accumulate(seq - arange)[j] + arange[j]

so each DP row is two vectorized minimums plus one accumulate.

Semantics match DuckDB's `levenshtein` (unit-cost insert/delete/replace
over UTF-8 BYTES — verified empirically: DuckDB counts 'é' as two units
and '字' as three), which is the SQL-oracle twin.
"""

from __future__ import annotations

import numpy as np


def _encode_pad(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte matrix (P, Lmax) padded with a sentinel, plus lengths."""
    enc = [s.encode("utf-8") for s in strs]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    lmax = int(lens.max()) if len(lens) else 0
    out = np.full((len(strs), max(lmax, 1)), 0x1FF, dtype=np.uint16)
    for i, e in enumerate(enc):
        if e:
            out[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    return out, lens


def levenshtein_pairs(xs: list[str], ys: list[str]) -> np.ndarray:
    """Levenshtein distance for each pair (xs[i], ys[i]) → int64 array."""
    if len(xs) != len(ys):
        raise ValueError("xs and ys must have equal length")
    p = len(xs)
    if p == 0:
        return np.zeros(0, dtype=np.int64)
    a, la = _encode_pad(list(xs))
    b, lb = _encode_pad(list(ys))
    lbmax = b.shape[1]
    ar = np.arange(lbmax + 1, dtype=np.int32)
    prev = np.broadcast_to(ar, (p, lbmax + 1)).copy()
    lamax = int(la.max())
    for i in range(1, lamax + 1):
        cost = (a[:, i - 1: i] != b).astype(np.int32)          # (p, lbmax)
        base = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        seq = np.concatenate(
            [np.full((p, 1), i, dtype=np.int32), base], axis=1)
        curr = np.minimum.accumulate(seq - ar, axis=1) + ar
        active = (i <= la)[:, None]
        prev = np.where(active, curr, prev)
    return prev[np.arange(p), lb].astype(np.int64)
