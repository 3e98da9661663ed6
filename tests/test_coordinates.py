"""Property tests for the coordinate expansion math (no Spark) —
the windowed div/mod form must agree with the full tile/repeat form
on arbitrary shapes and windows (reference equivalence:
test_coordinate_processor.py:199-204 exact patterns)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cae_polars_tools_spark.sources.coordinates import (
    coords_for_flat_range,
    expand_coordinates,
    process_dimension_selection,
)


@given(
    shape=st.lists(st.integers(1, 7), min_size=1, max_size=4),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_windowed_equals_full_expansion(shape, data):
    shape = tuple(shape)
    dims = [f"d{i}" for i in range(len(shape))]
    coords = {
        d: np.arange(n, dtype=np.float64) * 2.5 + 1 for d, n in zip(dims, shape)
    }
    total = int(np.prod(shape))
    start = data.draw(st.integers(0, total))
    end = data.draw(st.integers(start, total))
    full = expand_coordinates(shape, dims, coords)
    win = coords_for_flat_range(shape, dims, coords, start, end)
    for d in dims:
        assert np.array_equal(win[d], full[d][start:end])


def test_exact_tile_repeat_pattern():
    """test_coordinate_processor.py:199-204: flat time == repeat over
    inner size, flat lon == tile."""
    shape = (2, 3, 4)
    dims = ["time", "lat", "lon"]
    coords = {
        "time": np.array([100, 200]),
        "lat": np.array([1.0, 2.0, 3.0]),
        "lon": np.array([7, 8, 9, 10]),
    }
    out = expand_coordinates(shape, dims, coords)
    assert np.array_equal(out["time"], np.repeat([100, 200], 12))
    assert np.array_equal(out["lat"], np.tile(np.repeat([1.0, 2.0, 3.0], 4), 2))
    assert np.array_equal(out["lon"], np.tile([7, 8, 9, 10], 6))


def test_int_selection_semantics():
    """int drops dim; slice/list subset coords; unknown → select-all."""
    dims = ["a", "b", "c", "d"]
    coords = {
        "a": np.array([1, 2, 3]),
        "b": np.array([10, 20, 30, 40]),
        "c": None,
        "d": np.array([5.0, 6.0]),
    }
    selection, sel_dims, sel_coords = process_dimension_selection(
        dims, coords, {"a": 1, "b": slice(1, 3), "c": [0, 2], "d": object()}
    )
    assert selection[0] == 1
    assert sel_dims == ["b", "c", "d"]
    assert np.array_equal(sel_coords["b"], [20, 30])
    assert sel_coords["c"] is None  # no coord → stays None → indices
    assert np.array_equal(sel_coords["d"], [5.0, 6.0])  # select-all fallback


def test_resolve_value_selection_semantics():
    """Label slices are inclusive both ends and follow the axis's own
    order; scalars exact-match to an int (dropping the dim); lists
    exact-match per element; casting covers int labels on float axes
    and date strings on datetime axes."""
    import pytest

    from cae_polars_tools_spark.sources.coordinates import (
        resolve_value_selection,
    )

    dims = ["time", "lat", "lon", "date"]
    coords = {
        "time": np.array([10, 20, 30, 40, 50, 60], dtype=np.int32),
        "lat": np.array([60.0, 50.0, 40.0, 30.0], dtype=np.float32),  # desc
        "lon": np.array([-120.0, -119.75, -119.5], dtype=np.float32),
        "date": np.arange("2020-01", "2020-07", dtype="datetime64[M]"),
    }
    out = resolve_value_selection(
        dims,
        coords,
        {
            "time": slice(20, 45),        # inclusive: 20,30,40
            "lat": slice(55, 35),         # descending axis: 50,40
            "lon": -119.5,                # scalar exact → int, drops dim
            "date": slice("2020-02", "2020-04"),  # cast from strings
        },
    )
    assert out["time"] == slice(1, 4)
    assert out["lat"] == slice(1, 3)
    assert out["lon"] == 2 and isinstance(out["lon"], int)
    assert out["date"] == slice(1, 4)

    # list labels, order preserved
    assert resolve_value_selection(
        dims, coords, {"time": [30, 10]}
    )["time"] == [2, 0]
    # open endpoints
    assert resolve_value_selection(
        dims, coords, {"time": slice(None, 30)}
    )["time"] == slice(0, 3)
    # empty result stays a valid empty slice
    assert resolve_value_selection(
        dims, coords, {"lat": slice(30, 60)}  # wrong order on desc axis
    )["lat"] == slice(0, 0)
    # unknown dim ignored (mirrors positional selection)
    assert resolve_value_selection(dims, coords, {"nope": 1}) == {}

    with pytest.raises(ValueError, match="not found"):
        resolve_value_selection(dims, coords, {"lon": -100.0})
    with pytest.raises(ValueError, match="no step"):
        resolve_value_selection(dims, coords, {"time": slice(10, 60, 2)})
    with pytest.raises(ValueError, match="no driver-readable"):
        resolve_value_selection(["x"], {"x": None}, {"x": slice(1, 2)})
    with pytest.raises(ValueError, match="not monotonic"):
        resolve_value_selection(
            ["x"], {"x": np.array([1, 3, 2])}, {"x": slice(1, 2)}
        )
