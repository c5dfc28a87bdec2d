"""uint32 modular arithmetic for TPU (VPU) execution.

TPU-native substrate replacing the reference's OpenFHE ``DCRTPoly`` limb
arithmetic (64-bit native words there). TPUs have no 64-bit integer path, so
RNS limbs here are <= 31-bit primes held in uint32 tensors; full 64-bit
products are assembled from 16-bit partial products on the VPU and reduced
with Montgomery's algorithm (REDC with R = 2**32).

Conventions:
 - All device values are ``jnp.uint32``; arithmetic wraps mod 2**32 (XLA
   semantics), which REDC exploits.
 - "Montgomery form" of x is x*R mod p. ``mont_mul(a, b_m)`` with one
   operand pre-scaled by R computes a*b mod p -- used for all
   multiplications by precomputed constants (twiddles, plaintexts, keys).
 - Every function broadcasts: moduli tensors (p, pinv, r2) typically have
   shape (L, 1) against data (..., L, N).

These functions are pure jnp and also trace inside Pallas kernels.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


def mulhi_u32(a, b):
    """High 32 bits of the 64-bit product of two uint32 tensors."""
    al = a & MASK16
    ah = a >> 16
    bl = b & MASK16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = (ll >> 16) + (lh & MASK16) + (hl & MASK16)  # <= 3*(2**16-1): no wrap
    return hh + (lh >> 16) + (hl >> 16) + (mid >> 16)


def _csub(x, p):
    """[x]_p for x < 2p: compare + subtract + select.

    (An unsigned-min formulation -- min(x, x - p) with wraparound -- would
    be 2 ops, but Mosaic cannot legalize vector arith.minui on TPU; the
    measured penalty of the select form is within noise even though the NTT
    kernel is VPU instruction-issue-bound -- see BENCH_NOTES.md.)"""
    return jnp.where(x >= p, x - p, x)


def mont_mul(a, b, p, pinv):
    """Montgomery product a*b*R^-1 mod p (R = 2**32).

    Requires a, b < p < 2**31 and pinv = -p^-1 mod 2**32. If b is in
    Montgomery form (b = x*R mod p) this returns a*x mod p.
    """
    lo = a * b                     # low 32 bits (wrapping)
    hi = mulhi_u32(a, b)
    m = lo * pinv                  # mod 2**32
    mp_hi = mulhi_u32(m, p)
    # T + m*p = 0 mod R; the low-word carry is 1 unless lo == 0.
    t = hi + mp_hi + (lo != 0).astype(U32)
    return _csub(t, p)


def shoup_mul(x, w, wq, p):
    """x*w mod p with Shoup's precomputed quotient wq = floor(w * 2**32 / p).

    The NTT twiddle fast path: when one operand is a compile-time constant,
    this costs one mulhi + two low multiplies (~19 VPU ops) vs Montgomery's
    two mulhi (~29). Valid for ANY x < 2**32 and w < p < 2**31; output < p.
    (q = mulhi(x, wq) underestimates floor(x*w/p) by at most 1, so the
    wrapped remainder r = x*w - q*p lies in [0, 2p).)
    """
    q = mulhi_u32(x, wq)
    r = x * w - q * p  # wraps mod 2**32; exact because r < 2p < 2**32
    return _csub(r, p)


def shoup_host(w: int, p: int) -> int:
    """Host-side Shoup companion of constant w for prime p."""
    return (w << 32) // p


def add_mod(a, b, p):
    s = a + b  # both < p < 2**31: no wrap
    return _csub(s, p)


def sub_mod(a, b, p):
    # (a - b) + p < 2p; _csub folds it back. 3 ops (sub, add, min).
    return _csub(a - b + p, p)


def neg_mod(a, p):
    return jnp.where(a == 0, a, p - a)


def cond_sub_mod(x, p):
    """[x]_p for x < 2p: one subtract + unsigned min.

    Replaces the generic `%` (an expensive integer division on the VPU) for
    cross-prime re-reduction of residues: every RNS prime here is 31 bits
    (ops.primes.ntt_primes scans down from 2**31, so p > 2**30), hence any
    residue x < 2**31 of any other prime satisfies x < 2p.
    """
    return _csub(x, p)


def modsum(x, p, axis=0):
    """Sum mod p along `axis` via pairwise tree reduction (no 64-bit needed).

    p must broadcast against x with `axis` removed (e.g. p = (L,1) against
    x = (..., K, L, N) reduced over K). Unrolled into slice adds (static
    axis sizes are small here: limbs/digits/positions); no concatenates, so
    XLA fuses the whole tree into the producers.
    """
    x = jnp.moveaxis(x, axis, 0)
    parts = [x[i] for i in range(x.shape[0])]
    while len(parts) > 1:
        odd = parts.pop() if len(parts) % 2 else None
        parts = [
            add_mod(parts[i], parts[i + 1], p) for i in range(0, len(parts), 2)
        ]
        if odd is not None:
            parts[-1] = add_mod(parts[-1], odd, p)
    return parts[0]


def to_mont(a, p, pinv, r2):
    """a -> a*R mod p, with r2 = R**2 mod p."""
    return mont_mul(a, r2, p, pinv)


def from_mont(a, p, pinv):
    """a*R mod p -> a."""
    return mont_mul(a, jnp.ones((), U32), p, pinv)


def mul_mod(a, b, p, pinv, r2):
    """Generic a*b mod p (two REDC passes). Prefer mont_mul with a
    pre-scaled constant operand in hot paths."""
    return mont_mul(a, to_mont(b, p, pinv, r2), p, pinv)


# ---------------------------------------------------------------------------
# Host-side precomputation of per-prime Montgomery constants.
# ---------------------------------------------------------------------------

def mont_constants(p: int) -> tuple[int, int]:
    """(pinv, r2) for prime p < 2**31: pinv = -p^-1 mod 2**32, r2 = 2**64 mod p."""
    assert p < 2**31
    pinv = (-pow(p, -1, 1 << 32)) % (1 << 32)
    r2 = pow(2, 64, p)
    return pinv, r2


def to_mont_host(x: int, p: int) -> int:
    return (x << 32) % p
