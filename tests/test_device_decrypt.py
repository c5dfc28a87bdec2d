"""On-device decrypt oracle tests: DeviceDecryptor vs BGVContext.decrypt.

The device path (fixed-point CRT + two-plane Shoup-64 decode NTT,
fhe.device_decrypt) must reproduce the host decrypt bit-exactly for every
tabled plaintext modulus width and on the rescaled ship basis the batched
PIE actually ships."""

import numpy as np
import pytest

from nested_hashing_psi_tpu.fhe.bfv import make_context
from nested_hashing_psi_tpu.fhe.device_decrypt import DeviceDecryptor
from nested_hashing_psi_tpu.fhe.params import PLAINTEXT_MODULI, SchemeParams
from nested_hashing_psi_tpu.ops import mod64


@pytest.mark.parametrize("bits", [16, 32, 40, 48])
def test_device_slots_match_host_decrypt(bits):
    t = PLAINTEXT_MODULI[bits]
    ctx = make_context(
        SchemeParams(ring_dim=256, plaintext_modulus=t, num_limbs=5, scheme="bfv"),
        seed=11,
    )
    sk, _ = ctx.keygen()
    rng = np.random.default_rng(bits)
    vals = rng.integers(0, min(t, 1 << 60), size=(3, 256)).astype(object) % t
    vals[0, :7] = 0  # exercise the zero mask
    ct = ctx.encrypt_sk(ctx.make_plaintext_rns(vals), sk)

    host_slots, _ = ctx.decrypt(ct, sk)
    dec = DeviceDecryptor(ctx)
    lo, hi = dec.slots(ct.data, sk.s_mont)
    dev_slots = mod64.u64_from_planes_np(np.asarray(lo), np.asarray(hi))
    assert np.array_equal(
        dev_slots.astype(object), np.asarray(host_slots, dtype=object)
    )

    mask = np.asarray(dec.zero_mask(ct.data, sk.s_mont))
    assert np.array_equal(mask, np.asarray(host_slots, dtype=object) == 0)


def test_device_decrypt_on_rescaled_pie_output():
    """The flagship path: batched PIE result on the ship basis, decrypted on
    device in the matching child context."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _build_small_pie

    t = (1 << 32) + (1 << 20) + (1 << 19) + 1
    ctx, sk, rlk, pie, ops, idx_ct, minus_ct = _build_small_pie(
        ring=512, limbs=7, H=2, P=8, D=4, simple=64, t=t, scheme="bfv"
    )
    out = pie.run(idx_ct, minus_ct)
    L_ship = out.data.shape[-2]
    host_slots, _ = ctx.decrypt(out, sk, length=pie.batch_slots)

    sctx = ctx.context_for_limbs(L_ship) if L_ship < ctx.L else ctx
    ssk = ctx.shrink_key_to(sk, L_ship)
    dec = DeviceDecryptor(sctx)
    mask = np.asarray(
        dec.zero_mask(out.data, ssk.s_mont, length=pie.batch_slots)
    )
    assert np.array_equal(mask, np.asarray(host_slots, dtype=object) == 0)
    inter = ops.extract_intersection(~mask * 1)  # zeros where mask is True
    vals = sorted(int(v) for v, _ in inter)
    assert vals == [105, 131]


def test_mod64_primitives_random():
    """Randomized oracle for the two-plane Shoup-64 arithmetic."""
    t = PLAINTEXT_MODULI[48]
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 63, size=64, dtype=np.uint64)
    w = int(rng.integers(1, t))
    import jax.numpy as jnp

    x2 = mod64.planes_from_u64_np(x)
    w2 = tuple(jnp.uint32(v) for v in mod64.split_u64(w))
    wq2 = tuple(jnp.uint32(v) for v in mod64.shoup64_host(w, t))
    t2 = tuple(jnp.uint32(v) for v in mod64.split_u64(t))
    got = mod64.shoup_mul2(
        (jnp.asarray(x2[0]), jnp.asarray(x2[1])), w2, wq2, t2
    )
    want = (x.astype(object) * w) % t
    got64 = mod64.u64_from_planes_np(np.asarray(got[0]), np.asarray(got[1]))
    assert np.array_equal(got64.astype(object), want)

    a = rng.integers(0, t, size=64).astype(np.uint64)
    b = rng.integers(0, t, size=64).astype(np.uint64)
    a2 = tuple(jnp.asarray(v) for v in mod64.planes_from_u64_np(a))
    b2 = tuple(jnp.asarray(v) for v in mod64.planes_from_u64_np(b))
    s = mod64.u64_from_planes_np(*[np.asarray(v) for v in mod64.add2_mod(a2, b2, t2)])
    d = mod64.u64_from_planes_np(*[np.asarray(v) for v in mod64.sub2_mod(a2, b2, t2)])
    assert np.array_equal(s.astype(object), (a.astype(object) + b) % t)
    assert np.array_equal(d.astype(object), (a.astype(object) - b) % t)
