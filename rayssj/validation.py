"""Input validation, reference-equivalent error surface.

Mirrors the checks of the reference's ``utils/validation.py``
[ref: py_stringsimjoin/utils/validation.py:~10-150 †U]: attrs exist, join attr
string-typed, key unique & non-null, threshold/comp_op domains, tokenizer type.
Raises AssertionError with reference-style messages. Works on
``ray.data.Dataset`` schemas (cheap) and defers data-dependent key checks
(uniqueness, nulls) to a distributed aggregate.
"""

from __future__ import annotations

import pyarrow as pa

from rayssj.filter_utils import COMP_OP_MAP, EDIT_DISTANCE, OVERLAP, SET_SIM_MEASURES


def _schema_of(table):
    import pandas as pd
    import ray.data

    if isinstance(table, ray.data.Dataset):
        s = table.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        # pandas-backed blocks report python classes / dtype('O'); object
        # columns are what the reference treats as string columns
        py_map = {str: pa.string(), int: pa.int64(), float: pa.float64(),
                  bytes: pa.binary(), bool: pa.bool_(), object: pa.string()}
        fields = []
        for n, t in zip(s.names, s.types):
            if not isinstance(t, pa.DataType):
                if t in py_map:
                    t = py_map[t]
                elif hasattr(t, "kind"):
                    t = pa.from_numpy_dtype(t)
                else:
                    t = pa.null()
            fields.append(pa.field(n, t))
        return pa.schema(fields)
    if isinstance(table, pd.DataFrame):
        return pa.Schema.from_pandas(table, preserve_index=False)
    if isinstance(table, pa.Table):
        return table.schema
    raise AssertionError("input table must be a ray.data.Dataset, pandas DataFrame or pyarrow Table")


def validate_input_table(table, table_label: str = "input table"):
    _schema_of(table)
    return True


def validate_attr(attr, schema_names, attr_type: str, table_label: str):
    if attr not in schema_names:
        raise AssertionError(f"{attr_type} attribute '{attr}' not found in {table_label}")
    return True


def validate_attr_type(attr, dtype: pa.DataType, attr_type: str, table_label: str):
    if not (pa.types.is_string(dtype) or pa.types.is_large_string(dtype)):
        raise AssertionError(
            f"{attr_type} attribute '{attr}' in {table_label} is not of string type "
            f"(found {dtype}); convert with dataframe_column_to_str")
    return True


def validate_threshold(threshold, sim_measure_type):
    if sim_measure_type == EDIT_DISTANCE:
        if threshold < 0:
            raise AssertionError(f"threshold for {sim_measure_type} should be greater than or equal to 0")
    elif sim_measure_type == OVERLAP:
        if threshold <= 0:
            raise AssertionError(f"threshold for {sim_measure_type} should be greater than 0")
    else:
        if threshold <= 0 or threshold > 1:
            raise AssertionError(f"threshold for {sim_measure_type} should be in (0, 1]")
    return True


def validate_comp_op(comp_op):
    if comp_op not in COMP_OP_MAP:
        raise AssertionError(f"invalid comparison operator: {comp_op}")
    return True


def validate_comp_op_for_sim_measure(comp_op, sim_measure_type):
    validate_comp_op(comp_op)
    if sim_measure_type == EDIT_DISTANCE:
        if comp_op not in ("<=", "<", "="):
            raise AssertionError(f"comp_op for {sim_measure_type} should be one of <=, < or =")
    else:
        if comp_op not in (">=", ">", "="):
            raise AssertionError(f"comp_op for {sim_measure_type} should be one of >=, > or =")
    return True


def validate_tokenizer(tokenizer):
    for meth in ("tokenize", "get_return_set", "set_return_set"):
        if not hasattr(tokenizer, meth):
            raise AssertionError("invalid tokenizer: must expose tokenize/get_return_set/set_return_set")
    return True


def validate_tokenizer_for_sim_measure(tokenizer, sim_measure_type):
    validate_tokenizer(tokenizer)
    if sim_measure_type == EDIT_DISTANCE:
        from rayssj.tokenizers import QgramTokenizer

        if not isinstance(tokenizer, QgramTokenizer):
            raise AssertionError("edit distance join requires a qgram tokenizer")
    return True


def validate_output_attrs(l_out_attrs, l_names, r_out_attrs, r_names):
    if l_out_attrs:
        for attr in l_out_attrs:
            if attr not in l_names:
                raise AssertionError(f"output attribute '{attr}' not found in left table")
    if r_out_attrs:
        for attr in r_out_attrs:
            if attr not in r_names:
                raise AssertionError(f"output attribute '{attr}' not found in right table")
    return True


def validate_key_attr_distributed(ds, key_attr: str, table_label: str):
    """Distributed key check: non-null and unique. One small aggregate pass."""
    import pyarrow.compute as pc

    def check(batch: pa.Table) -> pa.Table:
        col = batch[key_attr]
        return pa.table({
            "n": pa.array([len(col)], type=pa.int64()),
            "nulls": pa.array([col.null_count], type=pa.int64()),
        })

    stats = ds.map_batches(check, batch_format="pyarrow").to_pandas().sum()
    if stats["nulls"] > 0:
        raise AssertionError(f"key attribute '{key_attr}' in {table_label} contains null values")
    n_unique = ds.unique(key_attr)
    if len(n_unique) != int(stats["n"]):
        raise AssertionError(f"key attribute '{key_attr}' in {table_label} is not a key (duplicates)")
    return True


def validate_join_inputs(l_ds, r_ds, l_key_attr, r_key_attr, l_join_attr, r_join_attr,
                         tokenizer, threshold, comp_op, sim_measure_type,
                         l_out_attrs=None, r_out_attrs=None):
    """Schema-level validation for all joins (data-dependent key checks are
    opt-in via validate_key_attr_distributed — too expensive per call at scale)."""
    l_schema, r_schema = _schema_of(l_ds), _schema_of(r_ds)
    validate_attr(l_key_attr, l_schema.names, "key", "left table")
    validate_attr(r_key_attr, r_schema.names, "key", "right table")
    validate_attr(l_join_attr, l_schema.names, "join", "left table")
    validate_attr(r_join_attr, r_schema.names, "join", "right table")
    validate_attr_type(l_join_attr, l_schema.field(l_join_attr).type, "join", "left table")
    validate_attr_type(r_join_attr, r_schema.field(r_join_attr).type, "join", "right table")
    validate_tokenizer_for_sim_measure(tokenizer, sim_measure_type)
    validate_threshold(threshold, sim_measure_type)
    validate_comp_op_for_sim_measure(comp_op, sim_measure_type)
    validate_output_attrs(l_out_attrs, l_schema.names, r_out_attrs, r_schema.names)
    return True
