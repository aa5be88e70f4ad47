#!/usr/bin/env python
"""Prototype: batch-vectorized Myers bit-parallel Levenshtein in numpy.

Exact codepoint-level Levenshtein (identical to Spark's F.levenshtein /
DP). Vectorization: per-pair Peq bitmask tables built once per batch
(np.bitwise_or.at scatter), then one vectorized multi-limb Myers step per
character of b across all still-active pairs. Pairs are sorted by b-length
descending so the per-step work shrinks to a contiguous slice of active
rows — no masking of state updates at all (inactive pairs' VP/VN are
simply never touched again, and score is final once a pair leaves the
active prefix).
"""
from __future__ import annotations

import time

import numpy as np

U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
ONE = np.uint64(1)
SIXTY3 = np.uint64(63)


def myers_lev_batch(A: list[str], B: list[str]) -> np.ndarray:
    P = len(A)
    out = np.zeros(P, dtype=np.int64)
    if P == 0:
        return out
    la = np.fromiter((len(a) for a in A), dtype=np.int64, count=P)
    lb = np.fromiter((len(b) for b in B), dtype=np.int64, count=P)
    triv = (la == 0) | (lb == 0)
    out[triv] = np.maximum(la, lb)[triv]
    idx = np.nonzero(~triv)[0]
    if len(idx) == 0:
        return out
    # sort by b-length DESC: at step j the active pairs are a prefix slice
    order = idx[np.argsort(-lb[idx], kind="stable")]
    A2 = [A[i] for i in order]
    B2 = [B[i] for i in order]
    n = len(order)
    m = la[order]
    nb = lb[order]
    mmax = int(m.max())
    bmax = int(nb[0])
    L = (mmax + 63) // 64

    ac = np.zeros((n, mmax), dtype=np.int64)
    for i, s in enumerate(A2):
        ac[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 1
    bc = np.zeros((n, bmax), dtype=np.int64)
    for i, s in enumerate(B2):
        bc[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) + 1

    # batch-local code compression → Peq is (n, V, L)
    uniq, inv = np.unique(np.concatenate([ac.ravel(), bc.ravel()]), return_inverse=True)
    V = len(uniq)
    ac_c = inv[: ac.size].reshape(ac.shape)
    bc_c = inv[ac.size :].reshape(bc.shape)

    peq = np.zeros(n * V * L, dtype=np.uint64)
    pos = np.arange(mmax, dtype=np.int64)
    limb = pos // 64
    bit = (ONE << (pos % 64).astype(np.uint64))
    rows = np.arange(n, dtype=np.int64)[:, None]
    flat_idx = (rows * V + ac_c) * L + limb[None, :]
    valid = pos[None, :] < m[:, None]
    np.bitwise_or.at(peq, flat_idx[valid], np.broadcast_to(bit, (n, mmax))[valid])
    peq = peq.reshape(n, V, L)
    if uniq[0] == 0:
        peq[:, 0, :] = 0  # padding code never matches

    full = np.zeros((n, L), dtype=np.uint64)
    for l in range(L):
        k = np.clip(m - l * 64, 0, 64).astype(np.uint64)
        full[:, l] = np.where(k >= 64, U64MAX, (ONE << k) - ONE)
    sl = ((m - 1) // 64).astype(np.int64)
    sbit = ONE << ((m - 1) % 64).astype(np.uint64)

    VP = full.copy()
    VN = np.zeros((n, L), dtype=np.uint64)
    score = m.copy()
    ar = np.arange(n)
    neg_nb = -nb  # ascending

    for j in range(bmax):
        k = int(np.searchsorted(neg_nb, -j, side="left"))  # count of nb > j
        if k == 0:
            break
        eq = peq[ar[:k], bc_c[:k, j], :]
        vp = VP[:k]
        vn = VN[:k]
        fu = full[:k]
        xv = eq | vn
        # (eq & vp) + vp with limb carries
        x = eq & vp
        res = np.empty_like(x)
        carry = np.zeros(k, dtype=np.uint64)
        for l in range(L):
            s1 = x[:, l] + vp[:, l]
            c1 = s1 < x[:, l]
            s2 = s1 + carry
            c2 = s2 < s1
            res[:, l] = s2
            carry = (c1 | c2).astype(np.uint64)
        xh = (res ^ vp) | eq
        hp = vn | (~(xh | vp) & fu)
        hn = vp & xh
        up = (hp[ar[:k], sl[:k]] & sbit[:k]) != 0
        dn = (hn[ar[:k], sl[:k]] & sbit[:k]) != 0
        score[:k] += up.astype(np.int64) - dn.astype(np.int64)
        # shift left by 1 across limbs
        hp_s = np.empty_like(hp)
        hn_s = np.empty_like(hn)
        cp = np.ones(k, dtype=np.uint64)
        cn = np.zeros(k, dtype=np.uint64)
        for l in range(L):
            hp_s[:, l] = (hp[:, l] << ONE) | cp
            cp = hp[:, l] >> SIXTY3
            hn_s[:, l] = (hn[:, l] << ONE) | cn
            cn = hn[:, l] >> SIXTY3
        VP[:k] = hn_s | (~(xv | hp_s) & fu)
        VN[:k] = hp_s & xv

    out[order] = score
    return out


def dp_lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def main():
    import random

    rng = random.Random(42)

    def rand_s(n, alpha="abcdefgh "):
        return "".join(rng.choice(alpha) for _ in range(n))

    cases_a, cases_b = [], []
    for _ in range(400):
        cases_a.append(rand_s(rng.randint(0, 90)))
        cases_b.append(rand_s(rng.randint(0, 90)))
    for _ in range(60):
        cases_a.append(rand_s(rng.randint(60, 200), alpha="aàéü日本語🎉 b"))
        cases_b.append(rand_s(rng.randint(0, 200), alpha="aàéü日本語🎉 b"))
    cases_a += ["", "", "x", rand_s(256), rand_s(64), rand_s(65), rand_s(128), rand_s(129), "same str"]
    cases_b += ["", "y", "", rand_s(256), rand_s(65), rand_s(64), rand_s(129), rand_s(128), "same str"]
    got = myers_lev_batch(cases_a, cases_b)
    for i, (a, b) in enumerate(zip(cases_a, cases_b)):
        want = dp_lev(a, b)
        assert got[i] == want, (i, a[:30], b[:30], got[i], want)
    print(f"parity ok on {len(cases_a)} cases")

    for P in (2000, 10000):
        A = [rand_s(256) for _ in range(P)]
        B = [rand_s(256) for _ in range(P)]
        t0 = time.time()
        myers_lev_batch(A, B)
        dt = time.time() - t0
        print(f"P={P} 256x256: {dt:.2f}s total, {dt/P*1e6:.0f} us/pair")
    A = [rand_s(rng.randint(30, 256)) for _ in range(10000)]
    B = [rand_s(rng.randint(30, 256)) for _ in range(10000)]
    t0 = time.time()
    myers_lev_batch(A, B)
    dt = time.time() - t0
    print(f"mixed P=10000: {dt:.2f}s total, {dt/10000*1e6:.0f} us/pair")


if __name__ == "__main__":
    main()
