"""Fast base conversion (ops/basis.py) vs an exact CRT oracle."""

import numpy as np
import pytest

from nested_hashing_psi_tpu.ops.basis import BasisExtension
from nested_hashing_psi_tpu.ops.primes import crt_reconstruct, ntt_primes


@pytest.fixture(scope="module")
def bases():
    src = ntt_primes(4, 31, 2 * 64)
    dst = ntt_primes(5, 31, 2 * 64, avoid=src)
    return src, dst


def _residues(values, primes):
    return np.stack(
        [np.array([v % p for v in values], np.uint32) for p in primes]
    )


def test_exact_conversion(bases):
    src, dst = bases
    be = BasisExtension(src, dst)
    rng = np.random.default_rng(0)
    q = be.q
    vals = [int(v) for v in rng.integers(0, 1 << 62, size=64)] + [0, 1, q - 1]
    vals = [v % q for v in vals][:64]
    x = _residues(vals, src)  # (L, N)
    out = np.asarray(be.convert(x))
    want = _residues(vals, dst)
    np.testing.assert_array_equal(out, want)


def test_batched_shapes(bases):
    src, dst = bases
    be = BasisExtension(src, dst)
    rng = np.random.default_rng(1)
    vals = (rng.integers(0, 1 << 62, size=(3, 64)).astype(object)) % be.q
    x = np.stack(
        [
            np.stack([(vals[b] % p).astype(np.uint32) for p in src])
            for b in range(3)
        ]
    )  # (3, L, N)
    out = np.asarray(be.convert(x))
    assert out.shape == (3, len(dst), 64)
    for b in range(3):
        want = _residues(list(vals[b]), dst)
        np.testing.assert_array_equal(out[b], want)


def test_lazy_conversion_overflow_bound(bases):
    """correction=False returns x + u*q for 0 <= u < L (HPS lazy variant)."""
    src, dst = bases
    be = BasisExtension(src, dst)
    rng = np.random.default_rng(2)
    vals = [int(v) % be.q for v in rng.integers(0, 1 << 62, size=64)]
    x = _residues(vals, src)
    out = np.asarray(be.convert(x, correction=False))
    L = len(src)
    for j, v in enumerate(vals):
        got = crt_reconstruct([int(out[i, j]) for i in range(len(dst))], list(dst))
        u, rem = divmod(got - v, be.q)
        assert rem == 0 and 0 <= u < L, (v, got, u, rem)


def test_roundtrip_through_aux_basis(bases):
    """q -> B -> q returns the original residues (values < q are exact)."""
    src, dst = bases
    fwd = BasisExtension(src, dst)
    bwd = BasisExtension(dst, src)
    rng = np.random.default_rng(3)
    vals = [int(v) % fwd.q for v in rng.integers(0, 1 << 62, size=64)]
    x = _residues(vals, src)
    back = np.asarray(bwd.convert(np.asarray(fwd.convert(x))))
    np.testing.assert_array_equal(back, x)


# ---------------------------------------------------------------------------
# BFVMulConverter: the textbook-HPS multiplication machinery
# ---------------------------------------------------------------------------

from nested_hashing_psi_tpu.ops.basis import BFVMulConverter


def _signed_residues(values, primes):
    return np.stack(
        [np.array([int(v) % p for v in values], np.uint32) for p in primes]
    )


@pytest.fixture(scope="module")
def mc():
    q_primes = ntt_primes(4, 31, 2 * 64)
    return BFVMulConverter(q_primes, 65537, 64)


def test_mulconv_base_sizing(mc):
    # B > 2 * 2|y| with |y| <= (9/4)*t*n*q (see BFVMulConverter docstring)
    q = np.prod([int(p) for p in mc.q_primes], dtype=object)
    assert mc.B > 9 * 65537 * 64 * int(q)
    assert len(set(mc.aux_primes) & set(mc.q_primes)) == 0


def test_mulconv_extend_centered(mc):
    """extend_q_to_aux reproduces the centered value's residues over aux."""
    rng = np.random.default_rng(3)
    q = np.prod([int(p) for p in mc.q_primes], dtype=object)
    mags = [int(v) for v in rng.integers(0, 1 << 60, size=64)]
    vals = [m if i % 2 else -m for i, m in enumerate(mags)]
    x = _signed_residues(vals, mc.q_primes)
    out = np.asarray(mc.extend_q_to_aux(x))
    want = _signed_residues(vals, mc.aux_primes)
    np.testing.assert_array_equal(out, want)


def test_mulconv_exact_to_q_full_range(mc):
    """Shenoy-Kumaresan aux -> q is integer-exact across the centered range,
    including values near +-B/2 where a float correction would miss."""
    rng = np.random.default_rng(4)
    B = mc.B
    nbytes = (B.bit_length() + 15) // 8
    vals = [
        int.from_bytes(rng.bytes(nbytes), "little") % B - B // 2
        for _ in range(61)
    ]
    vals += [-(B // 2) + 1, 0, B // 2 - 1]
    y = _signed_residues(vals, mc.aux_primes)
    out = np.asarray(mc.exact_to_q(y))
    want = _signed_residues(vals, mc.q_primes)
    np.testing.assert_array_equal(out, want)


def test_mulconv_scale_round_oracle(mc):
    """scale_round o exact_to_q == round(t*d/q) for random full-width d."""
    rng = np.random.default_rng(5)
    q = int(np.prod([int(p) for p in mc.q_primes], dtype=object))
    t, n = 65537, 64
    bound = n * q * q // 4  # |d| for worst-case tensor coefficients
    nbytes = (bound.bit_length() + 15) // 8
    ds = [
        int.from_bytes(rng.bytes(nbytes), "little") % (2 * bound) - bound
        for _ in range(64)
    ]
    d_q = _signed_residues(ds, mc.q_primes)
    d_aux = _signed_residues(ds, mc.aux_primes)
    y = np.asarray(mc.scale_round(d_q, d_aux))
    out = np.asarray(mc.exact_to_q(y))
    want = []
    for d in ds:
        r = (t * d) % q
        if r > q // 2:
            r -= q
        want.append((t * d - r) // q)
    # r's conversion is lazy (+u*q, u in [0, L)), shifting y by -u; plus the
    # documented +-1 rounding slack
    L = len(mc.q_primes)
    diff_ok = np.zeros(out.shape[-1], bool)
    for delta in range(-L, 2):
        cand = _signed_residues([w + delta for w in want], mc.q_primes)
        diff_ok |= (out == cand).all(axis=0)
    assert diff_ok.all()
