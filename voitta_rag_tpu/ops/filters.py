"""Filters compiled to in-kernel score masks.

The reference builds Qdrant payload filters — folder include/exclude,
index-folder exclude, epoch time ranges (services/vector_store.py:462-530) —
evaluated by the external engine. Here filters are *data*: every chunk carries
int32 filter columns in a ``[NUM_COLS, N]`` device array, and a query carries a
static-shaped :class:`FilterSpec`. The mask is evaluated on the VPU inside the
scan kernels (score := -inf for masked rows) so filtering costs no extra memory
pass and no host round-trip.

Folder paths are interned to dense int ids by the host
(:mod:`voitta_rag_tpu.index.registry`); include/exclude sets become padded id
lists compared against the folder-id column. This matches the reference's
exact-match semantics (``folder_path`` MatchAny / MatchValue,
vector_store.py:485-510) — subfolder expansion happens on the host exactly as
the reference does it (mcp_server.py:433-441).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Column layout of the [NUM_COLS, N] int32 filter-column array. Rows are
# sublanes (8 = one f32 tile sublane group); N is the lane dimension.
COL_VALID = 0          # 1 = live row, 0 = tombstone / padding
COL_FOLDER = 1         # interned folder_path id
COL_INDEX_FOLDER = 2   # interned index_folder id
COL_CREATED = 3        # source_created_at epoch secs (MISSING_TS if unknown)
COL_MODIFIED = 4       # source_modified_at epoch secs (MISSING_TS if unknown)
COL_DOC = 5            # interned file_path id (delete-by-file, dedupe)
COL_ACL = 6            # ACL group id (reserved; search does not filter on it,
                       # matching the reference where _build_filter has no ACL
                       # condition, vector_store.py:462-530)
COL_CHUNK_INDEX = 7    # chunk_index within the file (chunk-range reads)
NUM_COLS = 8

# Sentinel for absent timestamps: when a time filter is enabled, rows missing
# the field are excluded (Qdrant range-condition semantics).
MISSING_TS = -(2**31) + 1

# Id lists are padded with NO_FOLDER, which never matches an interned id (>=0).
NO_FOLDER = -1

# Static capacities for query-side filter id lists. If a query's expanded
# include set exceeds INC_MAX, the engine falls back to a host-precomputed
# mask column (see index/store.py).
INC_MAX = 256
EXC_MAX = 64

# params vector layout (int32 [1, 8], lives in SMEM inside kernels)
P_INC_EN = 0
P_TIME_EN = 1
P_TIME_FIELD = 2   # 0 = modified, 1 = created
P_TIME_LO = 3
P_TIME_HI = 4


class FilterSpec(NamedTuple):
    """Static-shaped query filter operands (a jax pytree)."""

    params: jax.Array      # int32 [1, 8]
    inc_ids: jax.Array     # int32 [1, INC_MAX], NO_FOLDER padded
    exc_ids: jax.Array     # int32 [1, EXC_MAX]
    exc_if_ids: jax.Array  # int32 [1, EXC_MAX]


#: Padded id-list size buckets. The mask compares EVERY row against EVERY
#: padded slot (a [T, cap] compare + any-reduce on the VPU), so always
#: padding to the max cap made the mask cost ~1.1 ms/dispatch at 1M rows
#: (384 compares/row); bucketing to the smallest sufficient cap cuts the
#: common ≤8-folder query to 24 compares/row. Each distinct bucket shape
#: compiles its own kernel specialization — a handful, not a blowup.
_ID_BUCKETS = (8, 32, 256)


def _pad_ids(ids: list[int], cap: int) -> jnp.ndarray:
    ids = list(ids)[:cap]
    bucket = next((b for b in _ID_BUCKETS if b >= max(len(ids), 1)), cap)
    bucket = min(bucket, cap)
    out = ids + [NO_FOLDER] * (bucket - len(ids))
    return jnp.asarray([out], dtype=jnp.int32)


def make_filter_spec(
    include_folder_ids: list[int] | None = None,
    exclude_folder_ids: list[int] | None = None,
    exclude_index_folder_ids: list[int] | None = None,
    date_start: int | None = None,
    date_end: int | None = None,
    date_field: str | None = None,
) -> FilterSpec:
    """Build a FilterSpec from host-side filter state.

    Mirrors VectorStoreService._build_filter (vector_store.py:462-530):
    include folders = OR over exact ids; excludes = must_not; time range on
    created/modified (default modified).
    """
    inc = include_folder_ids or []
    if len(inc) > INC_MAX:
        raise ValueError(
            f"include set of {len(inc)} exceeds INC_MAX={INC_MAX}; "
            "use the precomputed-mask path"
        )
    time_en = int(date_start is not None or date_end is not None)
    lo = int(date_start) if date_start is not None else -(2**31) + 2
    hi = int(date_end) if date_end is not None else 2**31 - 1
    params = jnp.asarray(
        [[
            int(include_folder_ids is not None),
            time_en,
            1 if date_field == "created" else 0,
            lo,
            hi,
            0, 0, 0,
        ]],
        dtype=jnp.int32,
    )
    return FilterSpec(
        params=params,
        inc_ids=_pad_ids(inc, INC_MAX),
        exc_ids=_pad_ids(exclude_folder_ids or [], EXC_MAX),
        exc_if_ids=_pad_ids(exclude_index_folder_ids or [], EXC_MAX),
    )


#: A FilterSpec that passes every live row.
def pass_spec() -> FilterSpec:
    return make_filter_spec()


PASS = pass_spec  # alias


def _in_id_list(values: jax.Array, ids_row: jax.Array) -> jax.Array:
    """values [T] int32, ids_row [1, CAP] int32 → bool [T] membership."""
    return jnp.any(values[:, None] == ids_row[0][None, :], axis=1)


def eval_mask(
    params: jax.Array,
    inc_ids: jax.Array,
    exc_ids: jax.Array,
    exc_if_ids: jax.Array,
    cols: jax.Array,
) -> jax.Array:
    """Evaluate the filter mask for a tile of filter columns.

    Pure jnp — runs identically on the VPU inside Pallas kernels and in the
    XLA fallback path. ``cols`` is int32 [NUM_COLS, T]; returns bool [T].
    """
    valid = cols[COL_VALID] > 0
    fid = cols[COL_FOLDER]
    ifid = cols[COL_INDEX_FOLDER]

    # Boolean algebra only (no select-on-bool: Mosaic does not legalize
    # arith.select over i1 vectors on all TPU targets).
    inc_off = params[0, P_INC_EN] == 0
    m = valid & (_in_id_list(fid, inc_ids) | inc_off)
    m &= ~_in_id_list(fid, exc_ids)
    m &= ~_in_id_list(ifid, exc_if_ids)

    time_off = params[0, P_TIME_EN] == 0
    use_created = params[0, P_TIME_FIELD] == 1
    created_ok = _time_ok(cols[COL_CREATED], params)
    modified_ok = _time_ok(cols[COL_MODIFIED], params)
    time_ok = (created_ok & use_created) | (modified_ok & ~use_created)
    m &= time_ok | time_off
    return m


def _time_ok(tcol: jax.Array, params: jax.Array) -> jax.Array:
    return (
        (tcol != MISSING_TS)
        & (tcol >= params[0, P_TIME_LO])
        & (tcol <= params[0, P_TIME_HI])
    )


def eval_mask_spec(spec: FilterSpec, cols: jax.Array) -> jax.Array:
    return eval_mask(spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids, cols)


def eval_mask_host(spec: FilterSpec, cols) -> "np.ndarray":
    """NumPy twin of :func:`eval_mask` for host-side (cold tier) scoring.

    ``cols`` is int32 [NUM_COLS, T] in host memory; returns bool [T].
    Exists so cold-segment paths never bounce filter columns through the
    device just to evaluate a mask. Kept in lockstep with eval_mask by
    tests/test_bq_cold.py.
    """
    import numpy as np

    params = np.asarray(spec.params)
    inc_ids = np.asarray(spec.inc_ids)[0]
    exc_ids = np.asarray(spec.exc_ids)[0]
    exc_if_ids = np.asarray(spec.exc_if_ids)[0]
    cols = np.asarray(cols)

    valid = cols[COL_VALID] > 0
    fid = cols[COL_FOLDER]
    ifid = cols[COL_INDEX_FOLDER]

    m = valid
    if params[0, P_INC_EN] != 0:
        m = m & np.isin(fid, inc_ids[inc_ids != NO_FOLDER])
    m &= ~np.isin(fid, exc_ids[exc_ids != NO_FOLDER])
    m &= ~np.isin(ifid, exc_if_ids[exc_if_ids != NO_FOLDER])

    if params[0, P_TIME_EN] != 0:
        tcol = cols[COL_CREATED if params[0, P_TIME_FIELD] == 1
                    else COL_MODIFIED]
        m &= ((tcol != MISSING_TS)
              & (tcol >= params[0, P_TIME_LO])
              & (tcol <= params[0, P_TIME_HI]))
    return m
