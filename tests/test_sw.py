"""Banded SW kernel vs the host DP oracle."""

import numpy as np
import jax.numpy as jnp

from cellranger_tpu.align.sw import BAND, banded_sw, sw_traceback_host
from cellranger_tpu.ops import encode


def prep_case(read: bytes, win: bytes, L: int):
    rc, rv = encode.encode_str(read)
    wc, wv = encode.encode_str(win)
    W = L + BAND
    r = np.zeros(L, np.uint8); rm = np.zeros(L, bool)
    w = np.zeros(W, np.uint8); wm = np.zeros(W, bool)
    r[:len(rc)] = rc[:L]; rm[:len(rc)] = rv[:L]
    w[:len(wc)] = wc[:W]; wm[:len(wc)] = wv[:W]
    return r, rm, w, wm


def run_batch(cases, L):
    B = len(cases)
    W = L + BAND
    rs = np.zeros((B, L), np.uint8); rms = np.zeros((B, L), bool)
    ws = np.zeros((B, W), np.uint8); wms = np.zeros((B, W), bool)
    for i, (r, rm, w, wm) in enumerate(cases):
        rs[i], rms[i], ws[i], wms[i] = r, rm, w, wm
    s, ei, ed = banded_sw(jnp.asarray(rs), jnp.asarray(rms),
                          jnp.asarray(ws), jnp.asarray(wms))
    return np.asarray(s), np.asarray(ei), np.asarray(ed)


def test_exact_match():
    rng = np.random.default_rng(0)
    seq = bytes(rng.choice(list(b"ACGT"), 40).astype(np.uint8))
    win = b"AC" * (BAND // 4) + seq + b"GT" * 10
    c = prep_case(seq, win, 40)
    s, ei, ed = run_batch([c], 40)
    host_s, cig, ri, wi = sw_traceback_host(*c)
    assert s[0] == host_s == 40
    assert cig == [(40, "M")]


def test_kernel_matches_host_random():
    rng = np.random.default_rng(1)
    L = 48
    cases, expect = [], []
    for t in range(64):
        win = bytes(rng.choice(list(b"ACGT"), L + BAND).astype(np.uint8).astype(np.uint8))
        # embed a mutated fragment of the window as the read; keep the
        # diagonal mid-band so +/-1 indel shifts stay inside (callers center
        # windows at cand_pos - BAND//2)
        off = int(rng.integers(4, BAND - 4))
        frag = bytearray(win[off:off + L])
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(L))
            frag[p] = int(rng.choice(list(b"ACGT")))
        # sometimes insert or delete a base
        mode = t % 3
        if mode == 1 and L > 10:
            p = int(rng.integers(5, L - 5))
            del frag[p]; frag.append(ord("A"))
        elif mode == 2 and L > 10:
            p = int(rng.integers(5, L - 5))
            frag.insert(p, ord("C")); frag.pop()
        read = bytes(frag)
        c = prep_case(read, win, L)
        cases.append(c)
        expect.append(sw_traceback_host(*c)[0])
    s, _, _ = run_batch(cases, L)
    np.testing.assert_array_equal(s, np.asarray(expect))


def test_indel_read_scores_higher_with_gaps():
    rng = np.random.default_rng(5)
    g = bytes(rng.choice(list(b"ACGT"), 120).astype(np.uint8).astype(np.uint8))
    # read = window with a 2-base deletion in the middle
    win = g[:48 + BAND]
    read = g[BAND // 2:BAND // 2 + 20] + g[BAND // 2 + 22:BAND // 2 + 50]
    read = read[:48]
    c = prep_case(read, win, 48)
    s, ei, ed = run_batch([c], 48)
    host_s, cig, _, _ = sw_traceback_host(*c)
    assert s[0] == host_s
    ops = "".join(op for _, op in cig)
    assert "D" in ops
    # gapped score ~ 48 - deletion penalty; far better than ungapped (~20)
    assert s[0] >= 40
