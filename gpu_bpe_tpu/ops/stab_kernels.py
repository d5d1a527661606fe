"""Pallas TPU kernels for the tokenizer's interval-stabbing join.

``overlay_fit`` replaces the XLA Hillis-Steele paren-overlay scan +
deepest-fit extraction of ``ops.tokenize`` (_paren_overlay/_deepest_fit)
with ONE streaming pass over the sorted open/position/close stream.

The XLA doubling scan materializes [depths, m] payload arrays across
log2(m) rounds — measured 57.7 ms of a 169 ms 16 MB pass (the single
biggest stage, docs/ROADMAP.md round-5 profile). The scan is sequential
in nature: the active-open state per depth is a tiny stack (one payload
per depth, <= 10 depths), so a per-block in-VMEM scan with a VMEM carry
across the sequential TPU grid does the same work in one O(m) pass:
read 4 B/row, write 12 B/row, ~10 K vector ops per 16 K-row block.

All scan arithmetic is int32: Mosaic does not legalize unsigned max
(`arith.maxui`), so the per-depth op words are built to fit in i31 —
scan blocks are 2^14 rows, making (slot << 17) | pay17 <= 0x7FFFFFFF.

Semantics (bitwise-identical to the XLA path, tested both ways):
  - per depth d, the running state is the payload of the latest open at d,
    killed by the matching close (nested intervals of equal depth cannot
    interleave, so "latest op at d wins" is exact);
  - positions read the state; deepest open with an in-chunk fit wins, ties
    at a depth resolve to the LAST open in sort order = max vocab id (the
    reference's duplicate-entry rule, trie.js:56);
  - group rows (exact-equality intervals at ``group_depth``) yield the
    position's prefix-group id for the chained levels.

Reference kernels replaced (behavioral spec only): the per-thread trie
walk's longest-match resolution, tokenize.wgsl:123-166.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _LANES

_U32 = jnp.uint32
_I32 = jnp.int32
# scan block: 2^14 rows so the op word (slot << 17 | pay17) stays in i31
SBLK = 1 << 14
_SROWS = SBLK // _LANES  # 128
# per-depth running state encoding, packed with the flat slot index so an
# inclusive MAX-scan is "latest op wins": x = (slot << 17) | pay17 where
# pay17 = payload+1 for opens (1..0x10000), _CLOSED for closes, 0 = no op
_CLOSED = 0x1FFFF
_NO_GROUP = 0xFFFF


def _scan_latest(x, lane, row1):
    """Inclusive flat-order max-scan of i32 op words over one [R, 128]
    block. Hierarchical: 7 lane-roll rounds build per-row inclusive
    maxima, a doubling pass over the [R, 1] row maxima adds the cross-row
    prefix. Max is exact "latest op" because the flat slot index rides
    the high bits of ``x`` (all values >= 0)."""
    inc = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        inc = jnp.maximum(inc, jnp.where(lane >= s, pltpu.roll(inc, s, axis=1), 0))
    row_tot = inc[:, _LANES - 1 :]  # [R, 1] inclusive row maxima
    rows = x.shape[0]
    row_exc = jnp.where(row1 >= 1, pltpu.roll(row_tot, 1, axis=0), 0)
    s = 1
    while s < rows:
        row_exc = jnp.maximum(
            row_exc, jnp.where(row1 >= s + 1, pltpu.roll(row_exc, s, axis=0), 0)
        )
        s <<= 1
    full = jnp.maximum(inc, row_exc)
    # block max = the inclusive scan's last element (never a reduction —
    # Mosaic legalizes neither unsigned max nor unsigned reductions)
    return full, full[rows - 1 :, _LANES - 1 :]


def _make_overlay_fit_kernel(depths, base_len, max_depth, group_depth,
                             chunk_size, blocks_per_seg):
    cs = int(chunk_size)

    def kernel(len_ref, kp_ref, packed_ref, key2_ref, gid_ref, carry_ref):
        j = pl.program_id(0)

        @pl.when(j % blocks_per_seg == 0)
        def _reset():
            carry_ref[:, :] = jnp.zeros((16, _LANES), _I32)

        kp = kp_ref[:, :]
        sflag = (kp >> _U32(30)).astype(_I32)
        sln = ((kp >> _U32(25)) & _U32(0x1F)).astype(_I32)
        spay_u = kp & _U32(0x1FFFFFF)
        spay = spay_u.astype(_I32)  # < 2^25, exact
        is_pos = sflag == 1

        r = lax.broadcasted_iota(_I32, (_SROWS, _LANES), 0)
        lane = lax.broadcasted_iota(_I32, (_SROWS, _LANES), 1)
        fi = r * _LANES + lane  # flat slot, 0..SBLK-1 (14 bits)
        row1 = lax.broadcasted_iota(_I32, (_SROWS, 1), 0)

        cend = jnp.minimum((spay // cs + 1) * cs, len_ref[0])
        limit = cend - spay

        packed = jnp.zeros((_SROWS, _LANES), _I32)
        gid = jnp.full((_SROWS, _LANES), _NO_GROUP, _I32)
        for d in range(1, depths):
            if d > max_depth and d != group_depth:
                continue
            is_op = (sln == d) & ~is_pos
            pay17 = jnp.where(sflag == 0, spay + 1, _CLOSED)
            x = jnp.where(is_op, (fi << 17) | pay17, 0)
            comb, blk_max = _scan_latest(x, lane, row1)  # blk_max: [1, 1]
            carry_row = carry_ref[d - 1 : d, :]  # [1, 128], lanes identical
            state = jnp.where(
                comb > 0, comb & _CLOSED, jnp.broadcast_to(carry_row, comb.shape)
            )
            carry_ref[d - 1 : d, :] = jnp.where(
                blk_max > 0,
                jnp.broadcast_to(blk_max & _CLOSED, (1, _LANES)),
                carry_row,
            )
            open_d = (state > 0) & (state < _CLOSED)
            val_d = state - 1
            if d == group_depth:
                gid = jnp.where(open_d & is_pos, val_d, gid)
            else:
                ok = open_d & (base_len + d <= limit)
                # ascending-depth overwrite = deepest fitting open wins
                packed = jnp.where(ok, ((base_len + d) << 16) | val_d, packed)

        packed_ref[:, :] = jnp.where(
            is_pos & (packed > 0), packed.astype(_U32), _U32(0)
        )
        key2_ref[:, :] = jnp.where(is_pos, spay_u, _U32(0xFFFFFFFF))
        gid_ref[:, :] = gid.astype(_U32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_size", "depths", "base_len", "max_depth", "group_depth", "interpret"
    ),
)
def overlay_fit(
    skp,
    input_len,
    *,
    chunk_size: int,
    depths: int,
    base_len: int = 0,
    max_depth: int = 8,
    group_depth: int = -1,
    interpret: bool = False,
):
    """Paren-overlay + deepest-fit over a sorted [nseg, m] stream.

    Returns (packed, key2, gid), each [nseg, m] u32 — exactly the XLA
    path's (_deepest_fit result, restore key, group id) triple. ``m`` must
    be an SBLK multiple (the segmented join always pads to a power of two
    >= 2^16; callers fall back to XLA otherwise).
    """
    nseg, m = skp.shape
    assert m % SBLK == 0, m
    blocks_per_seg = m // SBLK
    grid = nseg * blocks_per_seg
    kp2 = skp.reshape(grid * _SROWS, _LANES)
    kernel = _make_overlay_fit_kernel(
        depths, base_len, max_depth, group_depth, chunk_size, blocks_per_seg
    )
    packed, key2, gid = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec((_SROWS, _LANES), lambda i, s: (i, 0))],
            out_specs=[pl.BlockSpec((_SROWS, _LANES), lambda i, s: (i, 0))] * 3,
            scratch_shapes=[pltpu.VMEM((16, _LANES), _I32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((grid * _SROWS, _LANES), _U32)] * 3,
        interpret=interpret,
    )(jnp.asarray(input_len, jnp.int32).reshape(1), kp2)
    return (
        packed.reshape(nseg, m),
        key2.reshape(nseg, m),
        gid.reshape(nseg, m),
    )
