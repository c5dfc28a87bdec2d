"""Pallas TPU kernels for the PIE hot loops.

The batched PIE's dominant op is the position-summed ct x pt product

    ip[h, d, c, l, :] = sum_p idx[h, p, c, l, :] * pt[h, d, p, l, :]  (mod q_l)

A naive jnp formulation materializes the (H, D, P, 2, L, N) product tensor in
HBM before reducing; this kernel keeps a (2, TN) accumulator in VMEM and
streams the packed-table blocks through double-buffered pipeline stages, so
the table tensor is read exactly once -- the HBM speed-of-light for this op.

Kernel-internal layout puts the RNS limb axis in front (grid dimension);
TPU block specs require the last two block dims to be full-size or aligned,
so the trailing axes are (ciphertext-component | position, N-tile).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nested_hashing_psi_tpu.ops.modmath import add_mod, modsum, mont_mul

DEFAULT_TILE_N = 2048


def _ip_kernel(p_ref, pinv_ref, idx_ref, pt_ref, out_ref):
    """Grid step (l, h, nt): the index block (P, k, T) is read ONCE and
    reused across all D depths (the table block is the dominant traffic, so
    the kernel is table-read-bound -- its HBM speed of light). The position
    products are computed fully vectorized -- (P, k, T) elementwise -- so
    the VPU sees full (8, 128) tiles instead of a (k, T) accumulator with
    2/8 sublane utilization, then tree-reduced over P."""
    D = pt_ref.shape[2]
    l = pl.program_id(0)
    p = p_ref[l, 0]
    pinv = pinv_ref[l, 0]
    idx = idx_ref[0, 0]                       # (P, k, T)

    for d in range(D):                        # static unroll: D is small
        ptd = pt_ref[0, 0, d]                 # (P, T)
        prod = mont_mul(idx, ptd[:, None, :], p, pinv)
        out_ref[0, 0, d] = modsum(prod, p, axis=0)   # (k, T)


def indexed_inner_product(
    idx: jnp.ndarray,      # (H, P, 2, L, N) uint32 ciphertext tensor
    pt: jnp.ndarray,       # (H, D, P, L, N) uint32 Montgomery plaintexts
    p: jnp.ndarray,        # (L, 1) uint32 primes
    pinv: jnp.ndarray,     # (L, 1) uint32 Montgomery constants
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """-> (H, D, 2, L, N): the per-depth, per-hash inner products."""
    H, P, k, L, N = idx.shape
    D = pt.shape[1]
    assert pt.shape == (H, D, P, L, N)
    tile_n = min(tile_n, N)
    # keep the kernel's TOTAL scoped VMEM under the 16 MB limit: all three
    # blocks are double-buffered and the k = 2 minor dim of the index/output
    # blocks pads to 8 sublanes (a D = P = 40 sweep row measured 16.08 MB
    # with the old table-block-only budget and failed to compile)
    while 2 * (D * P + 8 * P + 8 * D) * tile_n * 4 > (14 << 20) and tile_n > 256:
        tile_n //= 2
    assert N % tile_n == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    idx_t = idx.transpose(3, 0, 1, 2, 4)   # (L, H, P, 2, N)
    pt_t = pt.transpose(3, 0, 1, 2, 4)     # (L, H, D, P, N)

    grid = (L, H, N // tile_n)
    out = pl.pallas_call(
        _ip_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, P, k, tile_n), lambda l, h, nt: (l, h, 0, 0, nt)
            ),
            pl.BlockSpec(
                (1, 1, D, P, tile_n), lambda l, h, nt: (l, h, 0, 0, nt)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, D, k, tile_n), lambda l, h, nt: (l, h, 0, 0, nt)
        ),
        out_shape=jax.ShapeDtypeStruct((L, H, D, k, N), jnp.uint32),
        interpret=interpret,
    )(p, pinv, idx_t, pt_t)
    return out.transpose(1, 2, 3, 0, 4)    # (H, D, 2, L, N)


def indexed_inner_product_jnp(idx, pt, p, pinv):
    """Reference jnp formulation (materializes the product tensor)."""
    from nested_hashing_psi_tpu.ops.modmath import modsum

    prod = mont_mul(idx[:, None], pt[..., None, :, :], p, pinv)
    return modsum(prod, p, axis=2)
