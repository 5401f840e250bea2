"""Type converters (SURVEY.md §2 #17).

Reference: ``dataframe_column_to_str`` / ``series_to_str``
[ref: py_stringsimjoin/utils/converter.py:~10 †U] — int/float columns to
string, preserving NaN/null; floats that are integral print without ``.0``
(reference converts via int when the column has no fractional part).
Here: pandas paths for API parity plus a Dataset path used by pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def series_to_str(series: pd.Series, inplace: bool = False) -> pd.Series:
    if series.dtype == object or pd.api.types.is_string_dtype(series):
        out = series
    elif pd.api.types.is_integer_dtype(series):
        out = series.astype(str)
    elif pd.api.types.is_float_dtype(series):
        mask = series.notna()
        out = pd.Series(np.nan, index=series.index, dtype=object)
        vals = series[mask]
        integral = (vals % 1 == 0)
        out[mask] = np.where(integral, vals.astype("int64").astype(str), vals.astype(str))
    else:
        out = series.astype(str)
    return out


def dataframe_column_to_str(dataframe: pd.DataFrame, col_name: str,
                            inplace: bool = False, return_col: bool = False):
    if col_name not in dataframe.columns:
        raise AssertionError(f"column '{col_name}' not found in dataframe")
    col = series_to_str(dataframe[col_name])
    if return_col:
        return col
    if inplace:
        dataframe[col_name] = col
        return True
    out = dataframe.copy()
    out[col_name] = col
    return out


def dataset_column_to_str(ds, col_name: str):
    """Dataset path: cast a numeric column to string (null-preserving)."""

    def conv(batch: pa.Table) -> pa.Table:
        col = batch[col_name]
        typ = col.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return batch
        if pa.types.is_floating(typ):
            as_int = pc.cast(col, pa.int64(), safe=False)
            integral = pc.equal(pc.cast(as_int, typ, safe=False), col)
            s = pc.if_else(integral, pc.cast(as_int, pa.string()), pc.cast(col, pa.string()))
        else:
            s = pc.cast(col, pa.string())
        i = batch.schema.get_field_index(col_name)
        return batch.set_column(i, col_name, s)

    return ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)


def add_dense_id(ds, col: str = "_id"):
    """Prepend a dense int64 row id (0..n-1) to a Dataset — the reference's
    candset output leads with ``_id``
    [ref: utils/generic_helper.py:get_output_header_from_tables ~L60 †U].

    Distributed zip-with-index: materialize, read per-block row counts from
    metadata, and prepend ``offset + arange`` per block in parallel tasks.
    The driver handles only block refs and counts; ids follow block order,
    which is deterministic for a deterministic upstream pipeline.
    """
    import ray
    import ray.data as rd

    m = ds.materialize()
    refs, offsets, off = [], [], 0
    for bundle in m.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            refs.append(ref)
            offsets.append(off)
            off += meta.num_rows
    if not refs:
        return m

    @ray.remote
    def with_id(block, offset: int) -> pa.Table:
        if isinstance(block, pd.DataFrame):  # pandas-backed blocks
            block = pa.Table.from_pandas(block, preserve_index=False)
        ids = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.int64))
        return block.add_column(0, col, ids)

    out_refs = [with_id.remote(r, o) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)
