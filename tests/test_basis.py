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
