"""Row-pair-packed bf16 entity tables: full-speed sparse updates at half HBM.

The reference's flagship capacity recipe stores fp16 entity weights
(``/root/reference/notebooks/3_wikikg2_fp16.ipynb`` cells 14-24, README
capacity tables). On TPU the analogous bf16 table hits a Mosaic limitation:
16-bit HBM memrefs carry packed (2, 1) sublane tiling, so the in-place
Pallas row-scatter (:mod:`besskge_tpu.ops.pallas_scatter`) cannot slice a
single bf16 row, and XLA's fallback scatter copies the whole table — the
capacity story would train at crippled speed.

The fix is a *storage transform*, not a new kernel: a logical bf16 table of
shape ``(N, D)`` (``D % 128 == 0``) is stored as an int32 array of shape
``(ceil(N/2), D)`` where packed row ``p`` holds logical rows ``2p`` and
``2p + 1`` back to back (each int32 word is a little-endian pair of
consecutive bf16 values, exactly a numpy ``.view(int32)`` of the two
concatenated rows). Properties:

- the packed minor width equals the logical width ``D``, so every shape
  downstream of a gather is unchanged;
- the table is 32-bit with 128-aligned rows → the existing in-place DMA
  scatter kernel applies as-is;
- HBM footprint is exactly half of an fp32 table; a logical-row gather
  reads ``2 D`` bf16 = the same bytes as an fp32 row.

Writes land at packed-row granularity, so when BOTH logical rows of a pair
are touched in one step their halves must be merged before the scatter —
and all duplicate occurrences of a packed row must carry byte-identical
content (racing DMAs are only safe when they write the same bytes). The
merge in :func:`merge_packed_row_writes` is exact and bitwise: each
occurrence contributes its own half (other half zeroed), a segmented
bitwise-OR over occurrences of the same packed row combines the halves
(OR with zero is the identity on IEEE bit patterns, and duplicates of one
logical row are identical by the optimizer's dedup contract), and halves
nobody wrote fall back to the current table bytes.

No reference equivalent — this subsystem exists because of the TPU memory
model (reference IPUs keep fp16 tables in SRAM and update them densely).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "is_packed",
    "pack_table",
    "unpack_table",
    "pack_table_host",
    "unpack_table_host",
    "take_rows",
    "logical_rows",
    "merge_packed_row_writes",
]


def is_packed(table: jnp.ndarray) -> bool:
    """True when ``table`` is a row-pair-packed bf16 table (int32 storage).

    Entity tables are floating-point in every other configuration, so the
    storage dtype is the discriminator.
    """
    return jnp.issubdtype(table.dtype, jnp.integer)


def logical_rows(table: jnp.ndarray, n_logical: int) -> int:
    """Validate and return the logical row count backed by ``table``."""
    if is_packed(table):
        assert table.shape[0] == (n_logical + 1) // 2
    return n_logical


def _flat(table: jnp.ndarray) -> jnp.ndarray:
    """Strip the optional leading unit (device) axis."""
    return table[0] if table.ndim == 3 else table


def _pair_words(x16: jnp.ndarray) -> jnp.ndarray:
    """(…, 2W) bf16 → (…, W) int32, word w = (elem 2w | elem 2w+1 << 16).

    Uses uint16 lane shuffles + integer math instead of a
    ``bitcast(reshape(…, W, 2))``: on TPU that reshape materializes a
    minor-dim-2 intermediate whose (8, 128) tiling pads 2 → 128 — a 64×
    memory blow-up (an 82 GB temp at wikikg2 scale). Little-endian order
    matches numpy's ``.view(int32)`` exactly.
    """
    u = jax.lax.bitcast_convert_type(
        x16.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        u[..., 0::2] | (u[..., 1::2] << 16), jnp.int32
    )


def _unpair_words(words: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_pair_words`: (…, W) int32 → (…, 2W) bf16."""
    u = jax.lax.bitcast_convert_type(words, jnp.uint32)
    lo = (u & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    hi = (u >> 16).astype(jnp.uint16)
    out = jnp.zeros((*words.shape[:-1], 2 * words.shape[-1]), jnp.uint16)
    out = out.at[..., 0::2].set(lo).at[..., 1::2].set(hi)
    return jax.lax.bitcast_convert_type(out, jnp.bfloat16)


def pack_table(table: jnp.ndarray) -> jnp.ndarray:
    """Pack a logical ``(N, D)`` float table into int32 ``(ceil(N/2), D)``.

    ``D`` must be even (it is 128-aligned in practice). An odd ``N`` gets
    one bf16 row of zero padding (never addressed by logical indices).
    """
    n, d = table.shape
    x = table.astype(jnp.bfloat16)
    if n % 2:
        x = jnp.concatenate([x, jnp.zeros((1, d), jnp.bfloat16)])
    return _pair_words(x.reshape(-1, 2 * d))


def unpack_table(packed: jnp.ndarray, n_logical: int) -> jnp.ndarray:
    """Inverse of :func:`pack_table` → bf16 ``(n_logical, D)``."""
    p = _flat(packed)
    d = p.shape[-1]
    return _unpair_words(p).reshape(-1, d)[:n_logical]


def pack_table_host(table: np.ndarray) -> np.ndarray:
    """Host-side (numpy) :func:`pack_table`; bit-identical to the device
    transform (verified against XLA's bitcast convention in tests)."""
    import ml_dtypes

    n, d = table.shape
    x = np.ascontiguousarray(table.astype(ml_dtypes.bfloat16))
    if n % 2:
        x = np.concatenate([x, np.zeros((1, d), ml_dtypes.bfloat16)])
    return x.reshape(-1, 2 * d).view(np.int32)


def unpack_table_host(packed: np.ndarray, n_logical: int) -> np.ndarray:
    """Host-side inverse of :func:`pack_table_host` → bf16 ``(N, D)``."""
    import ml_dtypes

    d = packed.shape[-1]
    return (
        np.ascontiguousarray(packed)
        .view(ml_dtypes.bfloat16)
        .reshape(-1, d)[:n_logical]
    )


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Logical-row gather that is ``jnp.take(table, idx, axis=0)`` for plain
    tables and an unpack-and-select-half gather for packed ones.

    ``idx`` may have any shape; the result appends the row axis ``(…, D)``
    (bf16 for packed tables). Every entity-table gather in the framework
    routes through here so packed storage is transparent to the BESS
    programs.
    """
    t = _flat(table)
    if not is_packed(t):
        return jnp.take(table, idx, axis=0)
    d = t.shape[-1]
    shape = idx.shape
    flat = idx.reshape(-1)
    pair = jnp.take(t, flat >> 1, axis=0)  # (R, D) int32 = 2 rows
    both = _unpair_words(pair).reshape(-1, 2, d)
    rows = jnp.take_along_axis(
        both, (flat & 1).astype(jnp.int32)[:, None, None], axis=1
    )[:, 0]
    return rows.reshape(*shape, d)


def merge_packed_row_writes(
    packed: jnp.ndarray, idx: jnp.ndarray, rows: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Turn logical-row writes into duplicate-safe packed-row writes.

    :param packed: the int32 packed table (optionally with a leading unit
        device axis), read for the halves nobody writes.
    :param idx: (R,) logical row indices; occurrences of the SAME logical
        row must carry identical ``rows`` content (the optimizer dedup
        contract) — occurrences of the sibling row may differ.
    :param rows: (R, D) new logical rows (any float dtype; cast to bf16).
    :return: ``(packed_idx, packed_rows)`` — (R,) int32 packed-row indices
        and (R, D) int32 packed rows where all occurrences of one packed row
        are byte-identical, ready for
        :func:`besskge_tpu.ops.pallas_scatter.scatter_rows`.
    """
    t = _flat(packed)
    d = t.shape[-1]
    r = idx.shape[0]
    half = d // 2
    p = (idx >> 1).astype(jnp.int32)
    h = (idx & 1).astype(jnp.int32)

    # Each occurrence's owned half, as int32 words in packed-row position;
    # the other half is zero. Word k of a packed row covers logical elements
    # [2k, 2k+1] of the flattened row pair: words [0, D/2) are row 2p,
    # words [D/2, D) are row 2p+1.
    words = _pair_words(rows)  # (R, D/2) int32 words of the new logical row
    lane = jnp.arange(d, dtype=jnp.int32)[None, :]
    owned = (lane >= h[:, None] * half) & (lane < (h[:, None] + 1) * half)
    src = jnp.clip(lane - h[:, None] * half, 0, half - 1)
    placed = jnp.where(owned, jnp.take_along_axis(words, src, axis=1), 0)
    mask = jnp.where(owned, jnp.int32(-1), jnp.int32(0))

    # Segmented bitwise-OR over occurrences of the same packed row: sort by
    # packed index, prefix-OR with resets at segment starts, then read each
    # segment's total at its last element (searchsorted on the sorted keys).
    order = jnp.argsort(p)
    sp = jnp.take(p, order)
    sv = jnp.take(placed, order, axis=0)
    sm = jnp.take(mask, order, axis=0)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sp[1:] != sp[:-1]]
    )

    def seg_or(a, b):
        av, am, af = a
        bv, bm, bf = b
        keep = bf[..., None] if av.ndim > bf.ndim else bf
        return (
            jnp.where(keep, bv, av | bv),
            jnp.where(keep, bm, am | bm),
            af | bf,
        )

    pv, pm, _ = jax.lax.associative_scan(seg_or, (sv, sm, first), axis=0)
    seg_end = jnp.searchsorted(sp, sp, side="right") - 1
    tot_v = jnp.take(pv, seg_end, axis=0)
    tot_m = jnp.take(pm, seg_end, axis=0)
    cur = jnp.take(t, sp, axis=0)
    merged = (tot_v & tot_m) | (cur & ~tot_m)
    return sp, merged
