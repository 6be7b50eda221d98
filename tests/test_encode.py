import numpy as np
import jax.numpy as jnp

from cellranger_tpu.ops import encode


def test_roundtrip_str():
    s = "ACGTACGTACGTACGT"
    p = encode.pack_str(s)
    assert encode.unpack_str(p, 16) == s


def test_lexicographic_order_preserved():
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), 16)) for _ in range(200)]
    packed = [encode.pack_str(s) for s in seqs]
    order_str = np.argsort(seqs)
    order_packed = np.argsort(packed)
    np.testing.assert_array_equal(order_str, order_packed)


def test_n_mask():
    codes, valid = encode.encode_str("ACGNT")
    assert valid.tolist() == [True, True, True, False, True]
    assert codes.tolist() == [0, 1, 2, 0, 3]


def test_device_pack_matches_host():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(64, 16), dtype=np.uint8)
    host = encode.pack_codes_np(codes, 16)
    dev = np.asarray(encode.pack_codes(jnp.asarray(codes), 16))
    np.testing.assert_array_equal(host, dev.astype(np.uint32))
    back = np.asarray(encode.unpack_codes(jnp.asarray(host), 16))
    np.testing.assert_array_equal(back, codes)


def test_revcomp():
    codes, _ = encode.encode_str("AACGT")
    rc = encode.revcomp_codes_np(codes)
    assert encode.decode_codes(rc) == b"ACGTT"
    # packed revcomp matches host path
    p = jnp.asarray([encode.pack_str("AACGTAACGTAACGTA")], dtype=jnp.uint32)
    rcp = encode.revcomp_packed(p, 16)
    assert encode.unpack_str(int(rcp[0]), 16) == "TACGTTACGTTACGTT"
