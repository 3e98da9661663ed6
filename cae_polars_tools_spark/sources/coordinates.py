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
