#!/usr/bin/env python
"""Prototype: batch-vectorized Jaro-Winkler over <=64-char strings.

The Jaro match loop (for each s1[i], claim the FIRST unmatched s2[j]
inside the window) is a lowest-set-bit pick over
Peq[s1[i]] & window_mask & ~matched2 — one uint64 per pair since the
matcher feature truncates to 64 chars. Transpositions compare the ordered
matched characters of both sides. Winkler boost applied per the pinned
pure-Python spec (boost_threshold 0.7, p 0.1, prefix<=4).
"""
from __future__ import annotations

import time

import numpy as np

U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
ONE = np.uint64(1)


def _mask_below(k: np.ndarray) -> np.ndarray:
    """(1 << k) - 1 with k in [0, 64] (k=64 -> all ones)."""
    kk = k.astype(np.uint64)
    return np.where(k >= 64, U64MAX, (ONE << np.minimum(kk, np.uint64(63) + ONE)) - ONE)


def jaro_winkler_batch(A: list[str], B: list[str], p: float = 0.1, boost_threshold: float = 0.7) -> np.ndarray:
    P = len(A)
    out = np.zeros(P, dtype=np.float64)
    if P == 0:
        return out
    la = np.fromiter((len(a) for a in A), dtype=np.int64, count=P)
    lb = np.fromiter((len(b) for b in B), dtype=np.int64, count=P)
    if la.max(initial=0) > 64 or lb.max(initial=0) > 64:
        raise ValueError("jaro_winkler_batch requires <=64-char inputs (truncate first)")

    same = np.fromiter((a == b for a, b in zip(A, B)), dtype=bool, count=P)
    out[same] = 1.0
    # jaro of empty-vs-anything is 0.0 (pure-python returns 0.0; winkler
    # boost never applies since j=0 <= 0.7)
    todo = np.nonzero(~same & (la > 0) & (lb > 0))[0]
    if len(todo) == 0:
        return out

    n = len(todo)
    a_sub = [A[i] for i in todo]
    b_sub = [B[i] for i in todo]
    n1 = la[todo]
    n2 = lb[todo]
    m1max = int(n1.max())
    m2max = int(n2.max())

    ac = np.zeros((n, m1max), dtype=np.int64)
    for i, s in enumerate(a_sub):
        ac[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 1
    bc = np.zeros((n, m2max), dtype=np.int64)
    for i, s in enumerate(b_sub):
        bc[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 1

    uniq, inv = np.unique(np.concatenate([ac.ravel(), bc.ravel()]), return_inverse=True)
    V = len(uniq)
    ac_c = inv[: ac.size].reshape(ac.shape)
    bc_c = inv[ac.size :].reshape(bc.shape)

    # Peq over s2: bitmask of positions j where b[j] == code v
    peq = np.zeros(n * V, dtype=np.uint64)
    pos2 = np.arange(m2max, dtype=np.int64)
    bit2 = ONE << pos2.astype(np.uint64)
    rows = np.arange(n, dtype=np.int64)[:, None]
    flat = rows * V + bc_c
    valid2 = pos2[None, :] < n2[:, None]
    np.bitwise_or.at(peq, flat[valid2], np.broadcast_to(bit2, (n, m2max))[valid2])
    peq = peq.reshape(n, V)
    if uniq[0] == 0:
        peq[:, 0] = 0

    window = np.maximum(np.maximum(n1, n2) // 2 - 1, 0)

    matched2 = np.zeros(n, dtype=np.uint64)
    matched1 = np.zeros(n, dtype=np.uint64)
    matches = np.zeros(n, dtype=np.int64)
    ar = np.arange(n)
    for i in range(m1max):
        act = i < n1
        lo = np.maximum(0, i - window)
        hi = np.minimum(n2, i + window + 1)
        wmask = _mask_below(hi) & ~_mask_below(lo)
        cand = peq[ar, ac_c[:, i]] & wmask & ~matched2
        cand = np.where(act, cand, np.uint64(0))
        pick = cand & (~cand + ONE)  # lowest set bit (0 if none)
        got = pick != 0
        matched2 |= pick
        matched1 |= np.where(got, ONE << np.uint64(i), np.uint64(0))
        matches += got

    # ordered matched chars: positions of set bits in matched1 (s1 order)
    # and matched2 (s2 order) — compare pairwise for transpositions
    b1 = np.unpackbits(matched1.view(np.uint8).reshape(n, 8), axis=1, bitorder="little").astype(bool)
    b2 = np.unpackbits(matched2.view(np.uint8).reshape(n, 8), axis=1, bitorder="little").astype(bool)
    b1 = b1[:, :m1max]
    b2 = b2[:, :m2max]
    # ranks: k-th matched position
    r1 = np.cumsum(b1, axis=1) - 1
    r2 = np.cumsum(b2, axis=1) - 1
    mmax = int(matches.max(initial=0))
    s1m = np.zeros((n, max(mmax, 1)), dtype=np.int64)
    s2m = np.zeros((n, max(mmax, 1)), dtype=np.int64)
    rr, cc = np.nonzero(b1)
    s1m[rr, r1[rr, cc]] = ac_c[rr, cc]
    rr, cc = np.nonzero(b2)
    s2m[rr, r2[rr, cc]] = bc_c[rr, cc]
    kidx = np.arange(max(mmax, 1))[None, :]
    diff = (s1m != s2m) & (kidx < matches[:, None])
    transp = diff.sum(axis=1) // 2

    mf = matches.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j = (mf / n1 + mf / n2 + (mf - transp) / mf) / 3.0
    j = np.where(matches == 0, 0.0, j)

    # winkler boost: common prefix up to 4, only when j > boost_threshold
    pl = np.minimum(np.minimum(n1, n2), 4)
    pmax = int(pl.max(initial=0))
    prefix = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    for i in range(pmax):
        ok = alive & (i < pl) & (ac_c[:, i] == bc_c[:, i] if i < min(m1max, m2max) else False)
        prefix += ok
        alive &= ok
    jw = np.where(j > boost_threshold, j + prefix * p * (1.0 - j), j)
    out[todo] = jw
    return out


def main():
    import random
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from ertransfer_spark.functions.similarity import jaro_winkler

    rng = random.Random(42)

    def rand_s(n, alpha="abcdef "):
        return "".join(rng.choice(alpha) for _ in range(n))

    A, B = [], []
    for _ in range(3000):
        A.append(rand_s(rng.randint(0, 64)))
        B.append(rand_s(rng.randint(0, 64)))
    for _ in range(300):
        A.append(rand_s(rng.randint(0, 64), alpha="aàé日🎉b "))
        B.append(rand_s(rng.randint(0, 64), alpha="aàé日🎉b "))
    A += ["", "", "x", "martha", "dwayne", "dixon", "abcdef", "ab",
          "prefix match long", "martha", "abcdxxxx", "same64" * 10 + "abcd"]
    B += ["", "y", "", "marhta", "duane", "dicksonx", "abcdef", "ba",
          "prefix match lung", "massey", "abyyzzzz", "same64" * 10 + "abdc"]
    got = jaro_winkler_batch(A, B)
    bad = 0
    for i, (a, b) in enumerate(zip(A, B)):
        want = jaro_winkler(a, b)
        if got[i] != want:
            bad += 1
            if bad < 10:
                print("MISMATCH", i, repr(a), repr(b), got[i], want)
    print(f"parity: {bad} mismatches / {len(A)}")
    assert bad == 0

    for P in (10000, 50000):
        A = [rand_s(64) for _ in range(P)]
        B = [rand_s(64) for _ in range(P)]
        t0 = time.time()
        jaro_winkler_batch(A, B)
        dt = time.time() - t0
        # pure-python comparison on a sample
        t0 = time.time()
        for x, y in zip(A[:2000], B[:2000]):
            jaro_winkler(x, y)
        dt_py = (time.time() - t0) / 2000
        print(f"P={P}: batch {dt/P*1e6:.1f} us/pair vs pure-python {dt_py*1e6:.1f} us/pair")


if __name__ == "__main__":
    main()
