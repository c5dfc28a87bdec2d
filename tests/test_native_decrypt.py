"""Native __int128 big-t decrypt kernel vs exact Python-int CRT oracle."""

import numpy as np
import pytest

from nested_hashing_psi_tpu.ops import primes as primes_mod
from nested_hashing_psi_tpu.utils import native


def _oracle(phase, q_primes, t, scheme):
    """Exact python-int reference: x via CRT, then [x]_t (BGV) or
    [round(t*x/q)]_t (BFV)."""
    from nested_hashing_psi_tpu.ops.primes import crt_reconstruct

    q = 1
    for p in q_primes:
        q *= p
    L, n = phase.shape[-2:]
    flat = phase.reshape(-1, L, n)
    out = np.zeros((flat.shape[0], n), dtype=object)
    for b in range(flat.shape[0]):
        for j in range(n):
            x = crt_reconstruct(
                [int(flat[b, i, j]) for i in range(L)], list(q_primes)
            )
            if scheme == "bfv":
                out[b, j] = (x * t + q // 2) // q % t
            else:
                # BGV reduces the CENTERED representative of [x]_q mod t
                out[b, j] = (x if x < q // 2 else x - q) % t
    return out.reshape(phase.shape[:-2] + (n,))


@pytest.mark.parametrize("scheme", ["bgv", "bfv"])
@pytest.mark.parametrize(
    "t",
    [
        (1 << 32) + (1 << 20) + (1 << 19) + 1,  # 32-bit items
        (1 << 40) + (1 << 22) + (1 << 20) + 1,  # 40-bit items
        (1 << 48) + (1 << 22) + (1 << 20) + 1,  # 48-bit items
    ],
)
def test_native_phase_to_mt_matches_oracle(t, scheme):
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    n, L = 32, 7
    q_primes = primes_mod.ntt_primes(L, 31, 2 * 1024, avoid=(t,))
    rng = np.random.default_rng(42)
    # small-noise phases: x = noise-ish values around multiples of t so the
    # BFV rounding is well inside the margin (as the noise budget guarantees)
    q = 1
    for p in q_primes:
        q *= p
    xs = [
        (int(rng.integers(0, t)) * (q // t // 2) // max(1, 1)) % q
        for _ in range(2 * n)
    ]
    # BFV correctness needs x = Delta*m + small e; build such x directly
    delta = q // t
    xs = []
    for _ in range(2 * n):
        m = int(rng.integers(0, t))
        e = int(rng.integers(0, 1 << 20)) - (1 << 19)
        xs.append((delta * m + e) % q)
    phase = np.zeros((2, L, n), dtype=np.uint64)
    for idx, x in enumerate(xs):
        b, j = divmod(idx, n)
        for i, p in enumerate(q_primes):
            phase[b, i, j] = x % p

    got, dist = native.phase_to_mt(phase, q_primes, t, scheme)
    want = _oracle(phase, q_primes, t, scheme)
    assert 0.0 <= dist <= 0.5
    np.testing.assert_array_equal(got.astype(object), want)
