"""Dimension selection + coordinate expansion math.

Reimplements the *semantics* of the reference's CoordinateProcessor
(coordinate_processor.py:101-349) with the behavior pinned down in
SURVEY.md §2.3:

* selection is **positional** (int / slice / list[int]);
* an **int selection drops the dimension** (and its output column);
* unknown selector types silently select-all;
* a missing/unreadable coordinate array falls back to integer indices
  ``0..n-1``;
* output row order is the C-order flat index of the selected array.

The window form (:func:`coords_for_flat_range`) is the 100 TB-safe
primitive: every Spark partition derives its own coordinate columns
from ``(start, end)`` div/mod arithmetic — nothing global is ever
materialized (reference coordinate_processor.py:279-349).
"""

from __future__ import annotations

from typing import Any

import numpy as np

Selection = int | slice | list[int] | np.ndarray


def resolve_dims(attrs: dict, ndim: int) -> list[str]:
    """Dimension names from the xarray ``_ARRAY_DIMENSIONS`` attribute,
    falling back to ``dim_0..dim_{n-1}`` (reference zarr_reader.py:302-305)."""
    dims = attrs.get("_ARRAY_DIMENSIONS")
    if isinstance(dims, (list, tuple)) and len(dims) == ndim:
        return [str(d) for d in dims]
    return [f"dim_{i}" for i in range(ndim)]


def extract_coordinate_arrays(group, dims: list[str]) -> dict[str, np.ndarray | None]:
    """Load the 1-D sibling coordinate array for each dimension;
    ``None`` when absent or unreadable (reference
    coordinate_processor.py:101-145)."""
    coords: dict[str, np.ndarray | None] = {}
    for dim in dims:
        try:
            arr = group.get_array(dim)
            coords[dim] = np.asarray(arr[slice(None)])
        except Exception:
            coords[dim] = None
    return coords


def process_dimension_selection(
    dims: list[str],
    coord_arrays: dict[str, np.ndarray | None],
    select_dims: dict[str, Selection] | None,
) -> tuple[list[Any], list[str], dict[str, np.ndarray | None]]:
    """Translate ``select_dims`` into a positional index tuple.

    Returns ``(selection, selected_dims, selected_coords)`` where
    ``selection`` has one entry per *input* dim and ``selected_dims``
    lists only surviving (non-int-selected) dims, in order.
    Semantics per reference coordinate_processor.py:147-218.
    """
    selection: list[Any] = []
    selected_dims: list[str] = []
    selected_coords: dict[str, np.ndarray | None] = {}
    select_dims = select_dims or {}
    for dim in dims:
        sel = select_dims.get(dim)
        coord = coord_arrays.get(dim)
        if isinstance(sel, (int, np.integer)):
            # int selection drops the dimension entirely
            selection.append(int(sel))
            continue
        if isinstance(sel, slice):
            selection.append(sel)
            sub = None
            if coord is not None:
                try:
                    sub = coord[sel]
                except Exception:
                    sub = None
            selected_coords[dim] = sub
        elif isinstance(sel, (list, tuple, np.ndarray)):
            idx = list(int(i) for i in sel)
            selection.append(idx)
            sub = None
            if coord is not None:
                try:
                    sub = coord[idx]
                except Exception:
                    sub = None
            selected_coords[dim] = sub
        else:
            # None or unknown selector type → select-all (reference
            # coordinate_processor.py:209-211 silently falls back)
            selection.append(slice(None))
            selected_coords[dim] = coord
        selected_dims.append(dim)
    return selection, selected_dims, selected_coords


def _cast_label(value: Any, coord: np.ndarray, dim: str) -> np.ndarray:
    """Cast a user label to the coordinate's dtype (``"2020-01-01"`` →
    datetime64, ``30`` → float32, …); 0-d array out."""
    try:
        return np.asarray(value).astype(coord.dtype)
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"select_ranges[{dim!r}]: label {value!r} is not castable "
            f"to the coordinate dtype {coord.dtype}"
        ) from e


def _label_slice_positions(dim: str, coord: np.ndarray, sel: slice) -> slice:
    """Positional slice for a VALUE slice, inclusive on both ends,
    following the coordinate's own order (ascending or descending) —
    xarray's label-slicing convention: on a descending axis
    ``slice(60, 30)`` selects 60 down to 30 and ``slice(30, 60)`` is
    empty."""
    if sel.step is not None:
        raise ValueError(
            f"select_ranges[{dim!r}]: value slices take no step "
            "(apply a positional step via select_dims instead)"
        )
    n = len(coord)
    if n > 1:
        # elementwise pairwise compare, not np.diff: diff of
        # datetime64 yields timedelta64, which cannot compare to 0
        asc = bool((coord[1:] >= coord[:-1]).all())
        desc = bool((coord[1:] <= coord[:-1]).all())
        if not (asc or desc):
            raise ValueError(
                f"select_ranges[{dim!r}]: coordinate array is not "
                "monotonic; value slices need a sorted axis"
            )
    else:
        asc = True
    mask = np.ones(n, dtype=bool)
    if sel.start is not None:
        lo = _cast_label(sel.start, coord, dim)
        mask &= (coord >= lo) if asc else (coord <= lo)
    if sel.stop is not None:
        hi = _cast_label(sel.stop, coord, dim)
        mask &= (coord <= hi) if asc else (coord >= hi)
    pos = np.flatnonzero(mask)
    if len(pos) == 0:
        return slice(0, 0)
    return slice(int(pos[0]), int(pos[-1]) + 1)


def resolve_value_selection(
    dims: list[str],
    coord_arrays: dict[str, np.ndarray | None],
    select_ranges: dict[str, Any] | None,
) -> dict[str, Selection]:
    """VALUE-based (label) selection → the equivalent POSITIONAL
    ``select_dims``, resolved on the driver against the 1-D coordinate
    arrays — the surface the reference's docs promise
    (reference zarr_scanner.py:41-44, docs/user_guide/reading_data.md:80-88:
    ``{"time": slice("2020-01-01", "2020-12-31"), "lat": slice(30, 60)}``)
    while its code only ever indexes positionally (SURVEY §2.3.1).

    Semantics (xarray ``.sel``-style):

    * ``slice(lo, hi)`` — inclusive on BOTH ends, following the axis's
      own sort order; no step;
    * scalar — exact match, returns an ``int`` position (drops the
      dimension, consistent with positional int selection); no match
      raises;
    * list/tuple/array — exact match per element, order preserved;
      any missing label raises.

    Labels are cast to the coordinate dtype, so date strings resolve
    against datetime axes and ints against float axes. Dims absent
    from the array are ignored (mirrors positional selection); a dim
    whose coordinate array is missing or executor-deferred (oversized)
    cannot resolve values and raises."""
    out: dict[str, Selection] = {}
    for dim, sel in (select_ranges or {}).items():
        if dim not in dims:
            continue
        coord = coord_arrays.get(dim)
        if coord is None:
            raise ValueError(
                f"select_ranges[{dim!r}]: no driver-readable coordinate "
                "array to resolve labels against (missing, unreadable, "
                "or over the embed limit) — use positional select_dims"
            )
        coord = np.asarray(coord)
        if isinstance(sel, slice):
            out[dim] = _label_slice_positions(dim, coord, sel)
        elif isinstance(sel, (list, tuple, np.ndarray)):
            positions: list[int] = []
            for v in sel:
                hit = np.flatnonzero(coord == _cast_label(v, coord, dim))
                if len(hit) == 0:
                    raise ValueError(
                        f"select_ranges[{dim!r}]: label {v!r} not found"
                    )
                positions.append(int(hit[0]))
            out[dim] = positions
        else:
            hit = np.flatnonzero(coord == _cast_label(sel, coord, dim))
            if len(hit) == 0:
                raise ValueError(
                    f"select_ranges[{dim!r}]: label {sel!r} not found"
                )
            out[dim] = int(hit[0])
    return out


def _coord_or_index(
    coord: np.ndarray | None, n: int
) -> np.ndarray:
    if coord is None or len(coord) != n:
        return np.arange(n, dtype=np.int64)
    return np.asarray(coord)


def expand_coordinates(
    data_shape: tuple[int, ...],
    dim_names: list[str],
    coord_arrays: dict[str, np.ndarray | None],
) -> dict[str, np.ndarray]:
    """Meshgrid-free full expansion: for dim i the flat C-order column is
    ``tile(repeat(coord_i, prod(shape[i+1:])), prod(shape[:i]))``
    (reference coordinate_processor.py:220-277). Only used for small
    single-partition arrays; partitions use the windowed form."""
    out: dict[str, np.ndarray] = {}
    for i, dim in enumerate(dim_names):
        coord = _coord_or_index(coord_arrays.get(dim), data_shape[i])
        inner = int(np.prod(data_shape[i + 1:])) if i + 1 < len(data_shape) else 1
        outer = int(np.prod(data_shape[:i])) if i > 0 else 1
        out[dim] = np.tile(np.repeat(coord, inner), outer)
    return out


def coords_for_flat_range(
    data_shape: tuple[int, ...],
    dim_names: list[str],
    coord_arrays: dict[str, np.ndarray | None],
    start: int,
    end: int,
) -> dict[str, np.ndarray]:
    """Coordinate columns for flat C-order indices ``[start, end)`` via
    div/mod arithmetic (reference coordinate_processor.py:279-349):
    last dim ``idx % shape[-1]``; dim i ``(idx // stride_i) % shape[i]``;
    first dim ``idx // stride_0``. O(end-start) memory, no global state."""
    idx = np.arange(start, end, dtype=np.int64)
    out: dict[str, np.ndarray] = {}
    stride = 1
    pos: list[np.ndarray] = [np.empty(0)] * len(data_shape)
    for i in range(len(data_shape) - 1, -1, -1):
        n = data_shape[i]
        if i == 0:
            pos[i] = idx // stride
        else:
            pos[i] = (idx // stride) % n
        stride *= n
    for i, dim in enumerate(dim_names):
        coord = _coord_or_index(coord_arrays.get(dim), data_shape[i])
        out[dim] = coord[pos[i]]
    return out
