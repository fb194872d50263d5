"""Row-pair-packed bf16 entity tables: full-speed sparse updates at half HBM.

The reference's flagship capacity recipe stores fp16 entity weights
(``/root/reference/notebooks/3_wikikg2_fp16.ipynb`` cells 14-24, README
capacity tables). On TPU the analogous bf16 table hits a Mosaic limitation:
16-bit HBM memrefs carry packed (2, 1) sublane tiling, so the in-place
Pallas row-scatter (:mod:`besskge_tpu.ops.pallas_scatter`) cannot slice a
single bf16 row, and XLA's fallback scatter copies the whole table — the
capacity story would train at crippled speed.

The fix is a *storage transform*, not a new kernel: a logical bf16 table of
shape ``(N, D)`` is stored as an int32 array of shape ``(ceil(N/2), D)``
in a **planar halfword layout** — word ``w`` of packed row ``p`` is

    ``(bits of row 2p elem w)  |  (bits of row 2p+1 elem w) << 16``

i.e. the low halfword plane holds the even logical row and the high plane
the odd one, element-aligned. Properties:

- the packed minor width equals the logical width ``D``, so every shape
  downstream of a gather is unchanged;
- the table is 32-bit with row-granular slices → the existing in-place DMA
  scatter kernel applies as-is;
- HBM footprint is exactly half of an fp32 table; a logical-row gather
  reads ``2 D`` bf16 = the same bytes as an fp32 row;
- **every hot transform is elementwise**: extracting a logical row from a
  gathered packed row is ``(word >> 16h) & 0xFFFF`` + one select — no
  interleave shuffles, no minor-dim-2 intermediates (an interleaved layout
  needs strided lane shuffles that XLA lowers to scatters, and a
  ``bitcast(reshape(…, D, 2))`` materializes a minor-dim-2 temp whose
  (8, 128) tiling pads 2 → 128: a 64× memory blow-up at wikikg2 scale).

Writes land at packed-row granularity, so when BOTH logical rows of a pair
are touched in one step their planes must be merged before the scatter —
and all duplicate occurrences of a packed row must carry byte-identical
content (racing DMAs are only safe when they write the same bytes). The
merge in :func:`merge_packed_row_writes` is exact and bitwise: each
occurrence contributes its own plane (other plane zeroed), a segmented
bitwise-OR over occurrences of the same packed row combines the planes
(OR with zero is the identity on IEEE bit patterns, and duplicates of one
logical row are identical by the optimizer's dedup contract), and planes
nobody wrote fall back to the current table bytes.

No reference equivalent — this subsystem exists because of the TPU memory
model (reference IPUs keep fp16 tables in SRAM and update them densely).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "is_packed",
    "is_paired",
    "is_trebled",
    "is_tripled",
    "half_dtype",
    "pack_table",
    "unpack_table",
    "pack_table_host",
    "unpack_table_host",
    "take_rows",
    "take_contiguous_rows",
    "logical_rows",
    "merge_packed_row_writes",
    "merge_packed_triplet_writes",
    "merge_packed_block_writes",
    "interleave_packed_momentum",
    "interleave_packed_adamw",
    "interleave_packed_state",
    "split_packed_interleaved",
    "split_packed_adamw",
    "split_packed_state",
    "is_quintupled",
]

_LO = jnp.uint32(0x0000FFFF)
_HI = jnp.uint32(0xFFFF0000)


def is_packed(table: jnp.ndarray) -> bool:
    """True when ``table`` is a row-pair-packed 16-bit table (32-bit int
    storage: **int32 = packed bf16, uint32 = packed fp16**).

    Entity tables are floating-point in every other configuration, so the
    storage dtype is the discriminator — and its signedness encodes the
    halfword float type, so no side-channel dtype needs threading through
    the gather/update call sites.
    """
    return jnp.issubdtype(table.dtype, jnp.integer)


def half_dtype(store) -> Any:
    """The 16-bit float type packed into a storage (or logical) dtype."""
    dt = store.dtype if hasattr(store, "dtype") else jnp.dtype(store)
    if dt == jnp.dtype(jnp.uint32) or dt == jnp.dtype(jnp.float16):
        return jnp.float16
    return jnp.bfloat16


def _store_dtype(half) -> Any:
    """uint32 stores packed fp16 pairs; int32 packed bf16 pairs."""
    return jnp.uint32 if jnp.dtype(half) == jnp.dtype(jnp.float16) else jnp.int32


def logical_rows(table: jnp.ndarray, n_logical: int) -> int:
    """Validate and return the logical row count backed by ``table``."""
    if is_packed(table):
        p = (n_logical + 1) // 2
        # plain, triplet-major (SGDM) or quintuplet-major (AdamW) store
        assert table.shape[0] in (p, 3 * p, 5 * p)
    return n_logical


def _flat(table: jnp.ndarray) -> jnp.ndarray:
    """Strip the optional leading unit (device) axis."""
    return table[0] if table.ndim == 3 else table


def _bits16(x: jnp.ndarray, half=jnp.bfloat16) -> jnp.ndarray:
    """16-bit float values → their bit patterns as uint32 (elementwise)."""
    return jax.lax.bitcast_convert_type(
        x.astype(half), jnp.uint16
    ).astype(jnp.uint32)


def _from_bits16(u: jnp.ndarray, half=jnp.bfloat16) -> jnp.ndarray:
    """Low 16 bits of uint32 words → 16-bit float values (elementwise)."""
    return jax.lax.bitcast_convert_type(u.astype(jnp.uint16), half)


def pack_table(table: jnp.ndarray) -> jnp.ndarray:
    """Pack a logical ``(N, D)`` float table into 32-bit ``(ceil(N/2), D)``
    storage: int32 when packing to bf16 (the default), uint32 when the
    logical table is fp16 (the reference capacity recipe's own dtype —
    4x finer mantissa ulp than bf16).

    An odd ``N`` gets one zero row of padding (never addressed by logical
    indices).
    """
    n, d = table.shape
    half = half_dtype(table)
    x = table.astype(half)
    if n % 2:
        x = jnp.concatenate([x, jnp.zeros((1, d), half)])
    even = _bits16(x[0::2], half)
    odd = _bits16(x[1::2], half)
    return jax.lax.bitcast_convert_type(even | (odd << 16), _store_dtype(half))


def unpack_table(packed: jnp.ndarray, n_logical: int) -> jnp.ndarray:
    """Inverse of :func:`pack_table` → bf16 ``(n_logical, D)``."""
    p = _flat(packed)
    d = p.shape[-1]
    half = half_dtype(p)
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    even = _from_bits16(u & _LO, half)
    odd = _from_bits16(u >> 16, half)
    # Row interleave via a (P, 2, D) stack: the size-2 dim is a sublane of
    # the (2, D) tile — a transient 4x pad acceptable for this rare
    # (checkpoint/eval-export) full-table op; the hot paths never call it.
    return jnp.stack([even, odd], axis=1).reshape(-1, d)[:n_logical]


def pack_table_host(table: np.ndarray) -> np.ndarray:
    """Host-side (numpy) :func:`pack_table`; bit-identical to the device
    transform (verified in tests)."""
    import ml_dtypes

    n, d = table.shape
    fp16 = table.dtype == np.float16
    hd = np.float16 if fp16 else ml_dtypes.bfloat16
    x = np.ascontiguousarray(table.astype(hd))
    if n % 2:
        x = np.concatenate([x, np.zeros((1, d), hd)])
    even = x[0::2].view(np.uint16).astype(np.uint32)
    odd = x[1::2].view(np.uint16).astype(np.uint32)
    return (even | (odd << 16)).view(np.uint32 if fp16 else np.int32)


def unpack_table_host(packed: np.ndarray, n_logical: int) -> np.ndarray:
    """Host-side inverse of :func:`pack_table_host` → 16-bit ``(N, D)``."""
    import ml_dtypes

    hd = np.float16 if packed.dtype == np.uint32 else ml_dtypes.bfloat16
    u = np.ascontiguousarray(packed).view(np.uint32)
    even = (u & 0xFFFF).astype(np.uint16).view(hd)
    odd = (u >> 16).astype(np.uint16).view(hd)
    out = np.empty((2 * u.shape[0], u.shape[1]), hd)
    out[0::2] = even
    out[1::2] = odd
    return out[:n_logical]


def is_paired(table: jnp.ndarray, n_logical: int | None) -> bool:
    """True when ``table`` is a pair-major fp32 ``(2·n_logical, D)`` buffer
    holding ``[param row 2i | momentum row 2i+1]`` — the storage layout of
    :class:`besskge_tpu.optim.RowSGDM` ``interleaved=True``. Detection is
    by the STATIC row count: entity tables otherwise have exactly
    ``n_logical`` (plain) or ``ceil(n_logical/2)`` (packed) rows, so
    ``2·n_logical`` is unambiguous at trace time.

    CONTRACT: ``n_logical`` must be the logical entity-row count of the
    EXACT shard passed (``sharding.max_entity_per_shard`` for a per-device
    block, the global count for a whole unsharded table) — a plain table
    paired with somebody else's ``n_logical`` (e.g. a global 2-shard table
    with the per-shard count) would be silently mis-read as pair-major.
    Callers that know the layout out-of-band should pass ``paired=`` to
    :func:`take_rows` / :func:`take_contiguous_rows` instead of relying on
    the shape inference.
    """
    t = _flat(table)
    return (
        n_logical is not None
        and not is_packed(t)
        and t.shape[0] == 2 * n_logical
    )


def is_tripled(table: jnp.ndarray, n_logical: int | None) -> bool:
    """True when ``table`` is a triplet-major packed store
    ``(3·ceil(n_logical/2), D)`` holding, per packed row ``p``,

        ``[packed 16-bit param pair | fp32 momentum row 2p | momentum 2p+1]``

    (momentum rows are fp32 bit patterns in the 32-bit storage dtype) — the
    storage layout of :class:`besskge_tpu.optim.RowSGDM`
    ``interleaved=True`` on a packed table. A touched packed row's params
    AND both its logical rows' momenta then live in one contiguous
    (3, D) block, so the sparse update writes all three with ONE scatter
    DMA instead of three (the scatter is scalar-core issue-bound).

    Detection is by the STATIC row count, same contract as
    :func:`is_paired`: a plain packed table has exactly
    ``ceil(n_logical/2)`` rows, so ``3·ceil(n_logical/2)`` is unambiguous
    for the exact shard passed. Callers that know the layout out-of-band
    should pass ``tripled=`` to :func:`take_rows` /
    :func:`take_contiguous_rows`.
    """
    t = _flat(table)
    return (
        n_logical is not None
        and is_packed(t)
        and t.shape[0] == 3 * ((n_logical + 1) // 2)
        # a degenerate shard could make ceil(N/2) == 3*ceil(N/2) only at
        # N == 0, which no real table has
        and n_logical > 0
    )


def is_quintupled(table: jnp.ndarray, n_logical: int | None) -> bool:
    """True when ``table`` is a quintuplet-major packed store
    ``(5·ceil(n_logical/2), D)`` holding, per packed row ``p``,

        ``[packed param pair | Adam mu 2p | mu 2p+1 | nu 2p | nu 2p+1]``

    — the storage layout of :class:`besskge_tpu.optim.RowAdamW`
    ``interleaved=True`` on a packed table. Same static-row-count
    detection contract as :func:`is_tripled`."""
    t = _flat(table)
    return (
        n_logical is not None
        and is_packed(t)
        and n_logical > 0
        and t.shape[0] == 5 * ((n_logical + 1) // 2)
    )


def interleave_packed_state(
    packed: jnp.ndarray,
    states: "list[jnp.ndarray | None] | tuple",
) -> jnp.ndarray:
    """Widen a packed ``(P, D)`` table into the block-major
    ``((1+2k)·P, D)`` store (``k = len(states)``; ``k=1`` =
    :func:`is_tripled`, ``k=2`` = :func:`is_quintupled`), interleaving
    each fp32 logical-major ``(2P, D)`` state buffer (zeros when
    ``None``). Per packed row ``p`` the block is
    ``[packed | s0 2p | s0 2p+1 | s1 2p | ...]``. Leading unit (device)
    axes are preserved. The transient ``(P, 1+2k, D)`` stack pads
    sublanes — a construction/checkpoint-time op, never in the train
    step."""
    t = _flat(packed)
    if not is_packed(t):
        raise ValueError(
            "interleave_packed_state requires a row-pair-packed table; "
            "plain fp32 tables use optim.interleave_momentum/_adamw"
        )
    p, d = t.shape
    blocks = [t]
    for s in states:
        if s is None:
            sb = jnp.zeros((2 * p, d), t.dtype)
        else:
            if s.shape != (2 * p, d):
                raise ValueError(
                    f"state must be logical-major (2·{p}, {d}) fp32 — got "
                    f"{tuple(s.shape)}"
                )
            sb = jax.lax.bitcast_convert_type(
                s.astype(jnp.float32), jnp.uint32
            ).astype(t.dtype)
        blocks.extend([sb[0::2], sb[1::2]])
    stride = 1 + 2 * len(states)
    out = jnp.stack(blocks, axis=1).reshape(stride * p, d)
    return out[None] if packed.ndim == 3 else out


def split_packed_state(
    table: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, "list[jnp.ndarray]"]:
    """Inverse of :func:`interleave_packed_state`:
    ``((1+2k)·P, D) → ((P, D) packed params, k × (2P, D) fp32 states)``
    — states in the logical-major shape of a NON-interleaved run's
    moment buffers, so checkpoints stay byte-compatible across layouts.
    Use before standalone evaluation as well (eval over a block store
    works — reads are stride-aware — but contiguous window slices read
    ``1+2k`` times the bytes)."""
    t = _flat(table)
    stride = 1 + 2 * k
    if not is_packed(t) or t.shape[0] % stride:
        raise ValueError(
            f"expected a block-major packed ({stride}P, D) store; got "
            f"{t.dtype} {tuple(t.shape)}"
        )
    trio = t.reshape(t.shape[0] // stride, stride, t.shape[-1])
    packed = trio[:, 0]
    states = [
        jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                trio[:, 1 + 2 * j: 3 + 2 * j].reshape(-1, t.shape[-1]),
                jnp.uint32,
            ),
            jnp.float32,
        )
        for j in range(k)
    ]
    if table.ndim == 3:
        return packed[None], states
    return packed, states


def interleave_packed_momentum(
    packed: jnp.ndarray, momentum: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Widen a packed table into the triplet-major ``(3P, D)`` store of
    :func:`is_tripled` (the ``k=1`` case of
    :func:`interleave_packed_state`)."""
    return interleave_packed_state(packed, [momentum])


def split_packed_interleaved(
    table: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`interleave_packed_momentum`:
    ``(3P, D) → ((P, D) packed params, (2P, D) fp32 momentum)``."""
    try:
        packed, (mom,) = split_packed_state(table, 1)
    except ValueError:
        t = _flat(table)
        raise ValueError(
            f"expected a triplet-major packed (3P, D) store; got "
            f"{t.dtype} {tuple(t.shape)}"
        ) from None
    return packed, mom


def interleave_packed_adamw(
    packed: jnp.ndarray,
    mu: jnp.ndarray | None = None,
    nu: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Widen a packed table into the quintuplet-major ``(5P, D)`` store of
    :func:`is_quintupled` — ``[packed | mu 2p | mu 2p+1 | nu 2p |
    nu 2p+1]`` per packed row — the storage layout of
    :class:`besskge_tpu.optim.RowAdamW` ``interleaved=True`` on packed
    tables (the reference capacity tables' fp16 + Adam recipe,
    ``/root/reference/README.md:121-144``)."""
    return interleave_packed_state(packed, [mu, nu])


def split_packed_adamw(
    table: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`interleave_packed_adamw`:
    ``(5P, D) → ((P, D) packed params, (2P, D) mu, (2P, D) nu)``."""
    packed, (mu, nu) = split_packed_state(table, 2)
    return packed, mu, nu


def _resolve_paired(t, n_logical, paired):
    """Explicit ``paired`` override with shape validation, else inference."""
    if paired is None:
        return is_paired(t, n_logical)
    if paired and (is_packed(t) or t.shape[0] % 2):
        raise ValueError(
            f"paired=True requires a plain fp32 pair-major (2N, D) table; "
            f"got {'packed' if is_packed(t) else 'odd-height'} "
            f"{tuple(t.shape)}"
        )
    return paired


def _resolve_trebled(t, n_logical, trebled):
    """Explicit ``trebled`` override with shape validation, else inference."""
    if trebled is None:
        return is_trebled(t, n_logical)
    if trebled and (is_packed(t) or t.shape[0] % 3):
        raise ValueError(
            f"trebled=True requires a plain fp32 treble-major (3N, D) "
            f"table; got {'packed' if is_packed(t) else 'bad-height'} "
            f"{tuple(t.shape)}"
        )
    return trebled


def is_trebled(table: jnp.ndarray, n_logical: int | None) -> bool:
    """True when ``table`` is a treble-major fp32 ``(3·n_logical, D)``
    buffer holding ``[param row 3i | Adam mu 3i+1 | Adam nu 3i+2]`` — the
    storage layout of :class:`besskge_tpu.optim.RowAdamW`
    ``interleaved=True``: a touched row's param AND both Adam moments move
    with ONE (3, D) block DMA instead of three row DMAs (the sparse
    scatter is scalar-core issue-bound). Same static-row-count detection
    contract as :func:`is_paired`."""
    t = _flat(table)
    return (
        n_logical is not None
        and not is_packed(t)
        and n_logical > 0
        and t.shape[0] == 3 * n_logical
    )


def _resolve_tripled(t, n_logical, tripled):
    """Explicit ``tripled`` override with shape validation, else inference."""
    if tripled is None:
        return is_tripled(t, n_logical)
    if tripled and (not is_packed(t) or t.shape[0] % 3):
        raise ValueError(
            f"tripled=True requires a triplet-major packed (3P, D) store; "
            f"got {t.dtype} {tuple(t.shape)}"
        )
    return tripled


def take_rows(
    table: jnp.ndarray, idx: jnp.ndarray, n_logical: int | None = None,
    paired: bool | None = None,
    tripled: bool | None = None,
    trebled: bool | None = None,
) -> jnp.ndarray:
    """Logical-row gather that is ``jnp.take(table, idx, axis=0)`` for plain
    tables and a gather + elementwise plane-select for packed ones.

    ``idx`` may have any shape; the result appends the row axis ``(…, D)``
    (bf16 for packed tables). Every entity-table gather in the framework
    routes through here so packed storage is transparent to the BESS
    programs.

    ``n_logical`` (optional) is the logical entity-row count of the EXACT
    shard passed (``sharding.max_entity_per_shard`` for a per-device
    block); it enables pair-major interleaved-momentum tables (see
    :func:`is_paired`), whose param row for logical id ``i`` lives at
    physical row ``2i`` — the momentum rows are simply never addressed, so
    forward/eval reads cost the same DMAs as a plain table. ``paired``
    overrides the shape inference when the caller knows the layout.
    """
    t = _flat(table)

    def row_take(tab, rows):
        # Flatten the index tensor: XLA lowers a flat-index row gather
        # ~5x faster per row than the high-rank batched form the sampler
        # layouts would otherwise produce ((bps, S, B, pad) indices on the
        # 500-candidate eval block measured 21 ns/row vs 4.5 ns flat).
        if rows.ndim <= 1:
            return jnp.take(tab, rows, axis=0)
        out = jnp.take(tab, rows.reshape(-1), axis=0)
        return out.reshape(*rows.shape, tab.shape[-1])

    paired = _resolve_paired(t, n_logical, paired)
    if not is_packed(t):
        if tripled:
            _resolve_tripled(t, n_logical, tripled)  # raises: not packed
        if paired:
            return row_take(t, 2 * idx)
        if _resolve_trebled(t, n_logical, trebled):
            return row_take(t, 3 * idx)
        return row_take(t, idx)
    tripled = _resolve_tripled(t, n_logical, tripled)
    stride = (
        3 if tripled else 5 if is_quintupled(t, n_logical) else 1
    )
    pair = row_take(t, stride * (idx >> 1))  # (…, D) 32-bit = both planes
    u = jax.lax.bitcast_convert_type(pair, jnp.uint32)
    odd = (idx & 1).astype(bool)[..., None]
    return _from_bits16(jnp.where(odd, u >> 16, u & _LO), half_dtype(t))


def take_contiguous_rows(
    table: jnp.ndarray, start: jnp.ndarray, w: int,
    n_logical: int | None = None,
    paired: bool | None = None,
    tripled: bool | None = None,
    trebled: bool | None = None,
) -> jnp.ndarray:
    """Rows ``[start, start + w)`` of a (possibly packed) table as ``(w, D)``.

    One contiguous ``dynamic_slice`` DMA instead of ``w`` row gathers — an
    XLA row gather is HBM-latency-bound (~10 GB/s effective), so sliding
    windows over local entities (TopK / AllScores) should never gather.
    ``start`` must be even for packed tables (callers align window starts);
    out-of-range starts are clamped by ``dynamic_slice`` semantics.
    For pair-major interleaved tables (see :func:`is_paired`) the window is
    one ``(2w, D)`` slice de-interleaved on-core — it reads 2x the bytes,
    so standalone evaluation should split the table first
    (:func:`besskge_tpu.optim.split_interleaved`).
    """
    t = _flat(table)
    paired = _resolve_paired(t, n_logical, paired)
    if not is_packed(t):
        if tripled:
            _resolve_tripled(t, n_logical, tripled)  # raises: not packed
        if paired:
            pair = jax.lax.dynamic_slice_in_dim(t, 2 * start, 2 * w, axis=0)
            return pair.reshape(w, 2, -1)[:, 0]
        if _resolve_trebled(t, n_logical, trebled):
            treb = jax.lax.dynamic_slice_in_dim(t, 3 * start, 3 * w, axis=0)
            return treb.reshape(w, 3, -1)[:, 0]
        return jax.lax.dynamic_slice_in_dim(t, start, w, axis=0)
    tripled = _resolve_tripled(t, n_logical, tripled)
    stride = (
        3 if tripled else 5 if is_quintupled(t, n_logical) else 1
    )
    if stride > 1:
        # one (stride·w/2, D) slice; state rows are discarded on-core — it
        # reads stride-x the bytes, so standalone evaluation should split
        # the table first (:func:`split_packed_state`)
        blk = jax.lax.dynamic_slice_in_dim(
            t, stride * (start >> 1), stride * (w // 2), axis=0
        )
        pair = blk.reshape(w // 2, stride, -1)[:, 0]
    else:
        pair = jax.lax.dynamic_slice_in_dim(t, start >> 1, w // 2, axis=0)
    half = half_dtype(t)
    u = jax.lax.bitcast_convert_type(pair, jnp.uint32)
    even = _from_bits16(u & _LO, half)
    odd = _from_bits16(u >> 16, half)
    # transient (w/2, 2, D) sublane pad is tiny at window sizes
    return jnp.stack([even, odd], axis=1).reshape(w, -1)


def merge_packed_row_writes(
    packed: jnp.ndarray, idx: jnp.ndarray, rows: jnp.ndarray,
    sorted_idx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Turn logical-row writes into duplicate-safe packed-row writes.

    :param packed: the int32 packed table (optionally with a leading unit
        device axis), read for the planes nobody writes.
    :param idx: (R,) logical row indices; occurrences of the SAME logical
        row must carry identical ``rows`` content (the optimizer dedup
        contract) — occurrences of the sibling row may differ.
    :param rows: (R, D) new logical rows (any float dtype; cast to bf16).
    :param sorted_idx: ``idx`` is SORTED ascending (the
        :func:`besskge_tpu.optim._dedup_row_grads` contract). Enables the
        adjacency merge below — no sort, no associative scan.
    :return: ``(packed_idx, packed_rows)`` — (R,) int32 packed-row indices
        and (R, D) int32 packed rows where all occurrences of one packed row
        are byte-identical, ready for
        :func:`besskge_tpu.ops.pallas_scatter.scatter_rows`.
    """
    t = _flat(packed)
    p = (idx >> 1).astype(jnp.int32)
    odd = (idx & 1).astype(bool)

    if sorted_idx:
        # Sorted-adjacency merge (round-5; wall-clock decomposition showed
        # the general segmented scan below at ~1.2 ms/step = a third of
        # the whole packed train step at wikikg2 shapes). With ``idx``
        # sorted, all occurrences of a logical row are one contiguous run,
        # and a row's SIBLING plane (logical id ^ 1) — if written at all —
        # is exactly the adjacent run: right after this run for even ids,
        # right before it for odd ids. Two vectorized binary searches give
        # every slot its run boundary; one (R, D) gather fetches the
        # sibling's halfword plane; absent siblings keep the current
        # table's plane. All occurrences of one packed row still produce
        # byte-identical output (run boundaries are per-run constants and
        # duplicate contributions are identical by contract), so the
        # skip-duplicates scatter contract holds unchanged.
        bits = _bits16(rows, half_dtype(t))  # (R, D) uint32, low halfword
        placed = jnp.where(odd[:, None], bits << 16, bits)
        r = idx.shape[0]
        # Run boundaries WITHOUT searchsorted: jnp.searchsorted lowers to a
        # sequential log(R)-iteration while loop (~0.8 ms each at R=8448,
        # measured in the round-5 trace); a 1-D cummax/cummin over run
        # flags is a single vectorized pass.
        iota = jnp.arange(r, dtype=jnp.int32)
        starts = jnp.concatenate(
            [jnp.ones((1,), bool), idx[1:] != idx[:-1]]
        )
        ends = jnp.concatenate([idx[1:] != idx[:-1], jnp.ones((1,), bool)])
        left = jax.lax.cummax(jnp.where(starts, iota, -1))  # run start pos
        last = jax.lax.cummin(  # run end pos
            jnp.where(ends, iota, r), reverse=True
        )
        sib_pos = jnp.where(odd, left - 1, last + 1)
        in_range = (sib_pos >= 0) & (sib_pos < r)
        sib_pos_c = jnp.clip(sib_pos, 0, r - 1)
        sibling = jnp.where(odd, idx - 1, idx + 1)
        present = in_range & (jnp.take(idx, sib_pos_c) == sibling)
        sib_placed = jnp.take(placed, sib_pos_c, axis=0)
        cur = jax.lax.bitcast_convert_type(
            jnp.take(t, p, axis=0), jnp.uint32
        )
        other_mask = jnp.where(odd, _LO, _HI)[:, None]  # sibling's plane
        other = jnp.where(present[:, None], sib_placed, cur & other_mask)
        merged = placed | other
        return p, jax.lax.bitcast_convert_type(merged, t.dtype)

    # Each occurrence's owned plane (elementwise; the other plane is zero).
    # (general unsorted path continues below)
    # The write mask is UNIFORM across a row's lanes in the planar layout —
    # a per-row scalar, so the segmented reduction below scans (R, D) words
    # plus an (R,) mask, not two (R, D) arrays. Row gathers (not scan
    # passes) dominate this function on TPU: keep them to three — sorted
    # values in, segment totals out, current table rows. (A
    # searchsorted-based first-occurrence variant with 4 gathers measured
    # ~20% slower end-to-end.)
    bits = _bits16(rows, half_dtype(t))  # (R, D) uint32, low halfword
    placed = jnp.where(odd[:, None], bits << 16, bits)

    # Segmented bitwise-OR over occurrences of the same packed row: sort by
    # packed index, prefix-OR with resets at segment starts, then read each
    # segment's total at its last element (searchsorted on the sorted keys).
    # One variadic sort returns the sorted keys AND the permutation (an
    # argsort + jnp.take(p, order) would add a serial 1-D gather; see the
    # same pattern in optim._dedup_row_grads).
    sp, order = jax.lax.sort(
        (p, jnp.arange(p.shape[0], dtype=jnp.int32)), num_keys=1
    )
    sv = jnp.take(placed, order, axis=0)
    sm = jnp.where(jnp.take(odd, order), _HI, _LO)  # (R,) scalar masks
    first = jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])

    def seg_or(a, b):
        av, am, af = a
        bv, bm, bf = b
        return (
            jnp.where(bf[:, None], bv, av | bv),
            jnp.where(bf, bm, am | bm),
            af | bf,
        )

    pv, pm, _ = jax.lax.associative_scan(seg_or, (sv, sm, first), axis=0)
    seg_end = jnp.searchsorted(sp, sp, side="right") - 1
    tot_v = jnp.take(pv, seg_end, axis=0)
    tot_m = jnp.take(pm, seg_end)[:, None]
    cur = jax.lax.bitcast_convert_type(jnp.take(t, sp, axis=0), jnp.uint32)
    merged = (tot_v & tot_m) | (cur & ~tot_m)
    return sp, jax.lax.bitcast_convert_type(merged, t.dtype)


def merge_packed_block_writes(
    store: jnp.ndarray,
    idx: jnp.ndarray,
    rows: jnp.ndarray,
    mom_list: "list[jnp.ndarray] | tuple[jnp.ndarray, ...]",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Turn logical-row (param, k fp32 state rows) writes into
    duplicate-safe ``(1+2k, D)``-block writes on a block-major packed
    store (``k=1``: the triplet store of :func:`is_tripled`; ``k=2``: the
    quintuplet store of :func:`is_quintupled`).

    :param store: the ``((1+2k)·P, D)`` store (optionally with a leading
        unit device axis), read for the planes/rows nobody writes.
    :param idx: (R,) logical row indices, SORTED ascending with
        duplicate-identical ``rows``/``mom_list`` content (the
        :func:`besskge_tpu.optim._dedup_row_grads` contract — this path
        is only reachable from the sorted sparse update).
    :param rows: (R, D) new logical param rows (cast to the 16-bit half
        dtype of the store).
    :param mom_list: k arrays of (R, D) new fp32 state rows (momentum /
        Adam mu, nu) for the same logical indices.
    :return: ``(phys, out_rows)`` — (R,) int32 physical block starts
        (``(1+2k)·(idx>>1)``, sorted, duplicates = equal runs) and
        ((1+2k)·R, D) storage-dtype rows where slot ``i`` carries the
        block ``[merged packed params | state0 row 2p | state0 row 2p+1 |
        state1 row 2p | ...]``, byte-identical across occurrences of one
        packed row — ready for
        ``scatter_rows(..., slice_rows=1+2k, skip_dups=True)``.

    The sibling resolution reuses the sorted-adjacency argument of
    :func:`merge_packed_row_writes`: a logical row's sibling run — if
    written at all — is exactly the adjacent run, so one vectorized
    boundary pass locates it for the param plane AND every sibling state
    row; absent siblings keep the store's current bytes.
    """
    t = _flat(store)
    half = half_dtype(t)
    k = len(mom_list)
    stride = 1 + 2 * k
    p = (idx >> 1).astype(jnp.int32)
    odd = (idx & 1).astype(bool)
    r = idx.shape[0]
    d = rows.shape[-1]

    bits = _bits16(rows, half)  # (R, D) uint32, low halfword
    placed = jnp.where(odd[:, None], bits << 16, bits)

    iota = jnp.arange(r, dtype=jnp.int32)
    starts = jnp.concatenate([jnp.ones((1,), bool), idx[1:] != idx[:-1]])
    ends = jnp.concatenate([idx[1:] != idx[:-1], jnp.ones((1,), bool)])
    left = jax.lax.cummax(jnp.where(starts, iota, -1))  # run start pos
    last = jax.lax.cummin(jnp.where(ends, iota, r), reverse=True)  # run end
    sib_pos = jnp.where(odd, left - 1, last + 1)
    in_range = (sib_pos >= 0) & (sib_pos < r)
    sib_pos_c = jnp.clip(sib_pos, 0, r - 1)
    sibling = jnp.where(odd, idx - 1, idx + 1)
    present = in_range & (jnp.take(idx, sib_pos_c) == sibling)

    # --- packed param word: own plane | sibling's plane or current bytes
    sib_placed = jnp.take(placed, sib_pos_c, axis=0)
    cur = jax.lax.bitcast_convert_type(
        jnp.take(t, stride * p, axis=0), jnp.uint32
    )
    other_mask = jnp.where(odd, _LO, _HI)[:, None]  # sibling's plane
    other = jnp.where(present[:, None], sib_placed, cur & other_mask)
    blocks = [placed | other]

    # --- state rows: own new value; sibling's new value when written,
    # else its current row from the store
    sib_off = jnp.where(odd, 0, 1).astype(jnp.int32)  # sibling's parity
    for j, mom_rows in enumerate(mom_list):
        mbits = jax.lax.bitcast_convert_type(
            mom_rows.astype(jnp.float32), jnp.uint32
        )
        sib_m = jnp.take(mbits, sib_pos_c, axis=0)
        cur_m_sib = jax.lax.bitcast_convert_type(
            jnp.take(t, stride * p + 1 + 2 * j + sib_off, axis=0),
            jnp.uint32,
        )
        m_sib = jnp.where(present[:, None], sib_m, cur_m_sib)
        blocks.append(jnp.where(odd[:, None], m_sib, mbits))  # row 2p
        blocks.append(jnp.where(odd[:, None], mbits, m_sib))  # row 2p+1
    out = jnp.stack(blocks, axis=1).reshape(stride * r, d)
    return stride * p, jax.lax.bitcast_convert_type(out, t.dtype)


def merge_packed_triplet_writes(
    store: jnp.ndarray,
    idx: jnp.ndarray,
    rows: jnp.ndarray,
    mom_rows: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(3, D)-block writes on a triplet-major store — the ``k=1`` case of
    :func:`merge_packed_block_writes` (see there for the contract)."""
    return merge_packed_block_writes(store, idx, rows, [mom_rows])
