"""Barcode whitelist + posterior correction tests.

The device kernel is validated against an independent float64 host
implementation of the published 10x algorithm (spec:
lib/rust/barcode/src/corrector.rs — posterior over 1-Hamming whitelist
neighbors, Laplace-smoothed counts, accept at ratio >= 0.975)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cellranger_tpu.io.whitelist import Whitelist
from cellranger_tpu.ops import barcode as bcops
from cellranger_tpu.ops import encode

BASES = "ACGT"


def host_correct(seq: str, quals: bytes, wl: dict[str, int]):
    """Spec implementation in plain python/f64: returns corrected seq or None."""
    best = None  # (likelihood, seq)
    total = 0.0
    for pos in range(len(seq)):
        qv = min(quals[pos], 66)
        for b in BASES:
            if b == seq[pos]:
                continue
            cand = seq[:pos] + b + seq[pos + 1:]
            if cand in wl:
                like = 10.0 ** (-(qv - 33) / 10.0) * (wl[cand] + 1)
                key = (like, cand)
                if best is None or key > best:
                    best = key
                total += like
    if best and best[0] / total >= 0.975:
        return best[1]
    return None


@pytest.fixture
def wl16():
    rng = np.random.default_rng(42)
    seqs = sorted({"".join(rng.choice(list(BASES), 16)) for _ in range(500)})
    return Whitelist.from_seqs(seqs, name="test"), seqs


def test_membership(wl16):
    wl, seqs = wl16
    packed = np.array([encode.pack_str(s) for s in seqs[:50]], dtype=np.uint32)
    hit, idx = bcops.whitelist_lookup(jnp.asarray(packed), jnp.asarray(wl.sorted_seqs))
    assert bool(np.all(np.asarray(hit)))
    np.testing.assert_array_equal(np.asarray(wl.sorted_seqs)[np.asarray(idx)], packed)
    # non-members miss
    miss = np.array([encode.pack_str("A" * 16)], dtype=np.uint32)
    if "A" * 16 not in seqs:
        hit2, idx2 = bcops.whitelist_lookup(jnp.asarray(miss), jnp.asarray(wl.sorted_seqs))
        assert not bool(hit2[0]) and int(idx2[0]) == -1


def mutate(seq, pos, base):
    return seq[:pos] + base + seq[pos + 1:]


def test_correction_matches_host_spec(wl16):
    wl, seqs = wl16
    rng = np.random.default_rng(7)
    counts = {s: int(rng.integers(0, 100)) for s in seqs}
    wl_counts = np.zeros(wl.size, np.int32)
    for s, c in counts.items():
        wl_counts[int(wl.index_of(np.uint32(encode.pack_str(s))))] = c

    # build observed barcodes: 1-mutant of whitelist entries + random junk
    observed, quals = [], []
    for i in range(200):
        s = seqs[int(rng.integers(len(seqs)))]
        pos = int(rng.integers(16))
        alt = BASES[int(rng.integers(4))]
        m = mutate(s, pos, alt)
        if m in counts:
            continue
        observed.append(m)
        quals.append(bytes(int(rng.integers(35, 70)) for _ in range(16)))
    for i in range(50):  # random junk, mostly uncorrectable
        observed.append("".join(rng.choice(list(BASES), 16)))
        quals.append(bytes([60] * 16))
    observed = [o for o in observed if o not in counts]

    packed = np.array([encode.pack_str(s) for s in observed], dtype=np.uint32)
    q = np.frombuffer(b"".join(quals[: len(observed)]), dtype=np.uint8).reshape(-1, 16)

    from cellranger_tpu.ops.bucket_table import BucketTable
    wl_table = BucketTable.build_exact(
        wl.sorted_seqs, np.arange(wl.size, dtype=np.uint32),
        entries=8, fields=3).with_counts(wl_counts)
    out_bc, out_idx, acc = bcops.correct_barcodes(
        jnp.asarray(packed), jnp.asarray(q), wl_table, 16)
    out_bc, out_idx, acc = map(np.asarray, (out_bc, out_idx, acc))

    n_checked = n_corrected = 0
    for i, s in enumerate(observed):
        expect = host_correct(s, quals[i], counts)
        n_checked += 1
        if expect is None:
            assert not acc[i], f"{s} should not correct"
        else:
            n_corrected += 1
            assert acc[i], f"{s} should correct to {expect}"
            assert encode.unpack_str(int(out_bc[i]), 16) == expect
            assert int(wl.sorted_seqs[out_idx[i]]) == int(out_bc[i])
    assert n_corrected > 20  # sanity: the fixture exercises both paths


def test_count_valid_barcodes():
    idx = jnp.asarray([0, 1, 1, -1, 3, 1], dtype=jnp.int32)
    valid = jnp.asarray([True, True, True, False, True, False])
    counts = np.asarray(bcops.count_valid_barcodes(idx, valid, 5))
    np.testing.assert_array_equal(counts, [1, 2, 0, 1, 0])


def test_translated_whitelist_output():
    """Whitelists with a translation column emit translated barcodes in
    outputs (whitelist.rs Plain vs WithTranslation)."""
    wl = Whitelist.from_seqs(["AAAACCCCGGGGTTTT", "ACGTACGTACGTACGT"],
                             translations=["TTTTGGGGCCCCAAAA", "TGCATGCATGCATGCA"])
    assert wl.translation is not None
    # order follows the sorted raw sequences; translation rides along
    import numpy as np
    from cellranger_tpu.ops import encode
    raw_sorted = [encode.unpack_str(int(s), 16) for s in wl.sorted_seqs]
    trans = [encode.unpack_str(int(s), 16) for s in wl.translation]
    pairs = dict(zip(raw_sorted, trans))
    assert pairs["AAAACCCCGGGGTTTT"] == "TTTTGGGGCCCCAAAA"
    assert pairs["ACGTACGTACGTACGT"] == "TGCATGCATGCATGCA"
