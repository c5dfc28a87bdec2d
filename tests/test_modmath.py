"""Unit tests: uint32 Montgomery arithmetic vs exact Python ints."""

import numpy as np
import jax.numpy as jnp

from nested_hashing_psi_tpu.ops import modmath, primes


def test_mulhi_u32_random():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**32, size=1000, dtype=np.uint64)
    b = rng.integers(0, 2**32, size=1000, dtype=np.uint64)
    hi = modmath.mulhi_u32(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32))
    expected = (a * b) >> np.uint64(32)  # exact: a,b < 2**32 so product < 2**64
    # numpy uint64 mul wraps mod 2**64 == exact low 64 bits here
    expected = ((a.astype(object) * b.astype(object)) >> 32).astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(hi, dtype=np.uint64), expected)


def test_mont_mul_matches_python():
    rng = np.random.default_rng(1)
    for p in primes.ntt_primes(3, 31, 2**15) + (65537,):
        pinv, r2 = modmath.mont_constants(p)
        a = rng.integers(0, p, size=500, dtype=np.uint64)
        b = rng.integers(0, p, size=500, dtype=np.uint64)
        b_m = (b.astype(object) << 32) % p  # Montgomery form of b
        got = modmath.mont_mul(
            jnp.asarray(a, jnp.uint32),
            jnp.asarray(b_m.astype(np.uint64), jnp.uint32),
            jnp.uint32(p),
            jnp.uint32(pinv),
        )
        expected = (a.astype(object) * b.astype(object)) % p
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.uint64), expected.astype(np.uint64)
        )


def test_mont_mul_edge_cases():
    p = primes.ntt_primes(1, 31, 2**15)[0]
    pinv, r2 = modmath.mont_constants(p)
    vals = [0, 1, 2, p - 1, p - 2]
    for a in vals:
        for b in vals:
            b_m = (b << 32) % p
            got = modmath.mont_mul(
                jnp.uint32(a), jnp.uint32(b_m), jnp.uint32(p), jnp.uint32(pinv)
            )
            assert int(got) == a * b % p, (a, b)


def test_add_sub_neg_mod():
    rng = np.random.default_rng(2)
    p = primes.ntt_primes(1, 30, 2**15)[0]
    a = rng.integers(0, p, size=300, dtype=np.uint64)
    b = rng.integers(0, p, size=300, dtype=np.uint64)
    aj, bj, pj = jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32), jnp.uint32(p)
    np.testing.assert_array_equal(
        np.asarray(modmath.add_mod(aj, bj, pj), np.uint64), (a + b) % p
    )
    np.testing.assert_array_equal(
        np.asarray(modmath.sub_mod(aj, bj, pj), np.uint64), (a + p - b) % p
    )
    np.testing.assert_array_equal(
        np.asarray(modmath.neg_mod(aj, pj), np.uint64), (p - a) % p
    )


def test_to_from_mont_roundtrip():
    rng = np.random.default_rng(3)
    p = primes.ntt_primes(1, 31, 2**15)[0]
    pinv, r2 = modmath.mont_constants(p)
    a = rng.integers(0, p, size=100, dtype=np.uint64)
    aj = jnp.asarray(a, jnp.uint32)
    m = modmath.to_mont(aj, jnp.uint32(p), jnp.uint32(pinv), jnp.uint32(r2))
    back = modmath.from_mont(m, jnp.uint32(p), jnp.uint32(pinv))
    np.testing.assert_array_equal(np.asarray(back, np.uint64), a)


def test_prime_generation():
    ps = primes.ntt_primes(6, 31, 2**15)
    assert len(set(ps)) == 6
    for p in ps:
        assert primes.is_prime(p)
        assert p % 2**15 == 1
        assert p < 2**31
    # stable order (descending)
    assert list(ps) == sorted(ps, reverse=True)


def test_primitive_root():
    p = 65537
    w = primes.primitive_root_of_unity(p, 32768)
    assert pow(w, 32768, p) == 1
    assert pow(w, 16384, p) == p - 1  # psi^n = -1: negacyclic


def test_shoup_mul_matches_bigint():
    """shoup_mul(x, w, wq, p) == x*w mod p for any x < 2**32 (lazy bound),
    w < p -- the NTT twiddle fast path."""
    rng = np.random.default_rng(11)
    for p in primes.ntt_primes(3, 31, 2**10):
        w = rng.integers(0, p, size=256, dtype=np.uint64)
        wq = np.array([modmath.shoup_host(int(v), p) for v in w], np.uint64)
        # full uint32 range for x, plus edge cases
        x = rng.integers(0, 1 << 32, size=256, dtype=np.uint64)
        x[:4] = [0, 1, (1 << 32) - 1, p]
        got = modmath.shoup_mul(
            jnp.asarray(x, jnp.uint32),
            jnp.asarray(w, jnp.uint32),
            jnp.asarray(wq, jnp.uint32),
            jnp.uint32(p),
        )
        np.testing.assert_array_equal(
            np.asarray(got, np.uint64), (x * w) % p
        )
