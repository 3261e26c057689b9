"""Column mapping: flat, nested-struct, and array-of-struct renames.

Reference semantics (service/bigquery/query_helper.py:87-156): a mapping of
``old -> new`` column names where dotted paths rename fields inside RECORDs
and inside REPEATED RECORDs, applied to every result row in Python.

Spark-first mapping: renames are *plan* transformations —
``withColumnRenamed`` for top-level columns, struct rebuild for nested
fields, and ``transform()`` over arrays of structs — all resolved by
Catalyst at compile time with zero per-row cost.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def apply_column_mapping(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    flat = {k: v for k, v in mapping.items() if "." not in k}
    nested = {k: v for k, v in mapping.items() if "." in k}

    if flat:
        df = df.withColumnsRenamed(dict(flat))

    for old_path, new_name in nested.items():
        root, rest = old_path.split(".", 1)
        if "." in rest:
            raise ValueError(
                f"only one nesting level supported (reference shape), got {old_path!r}"
            )
        field = df.schema[root].dataType
        if isinstance(field, T.StructType):
            df = df.withColumn(root, _rename_struct_field(F.col(root), field, rest, new_name))
        elif isinstance(field, T.ArrayType) and isinstance(field.elementType, T.StructType):
            df = df.withColumn(
                root,
                F.transform(
                    F.col(root),
                    _array_element_renamer(field.elementType, rest, new_name),
                ),
            )
        else:
            raise ValueError(f"{root!r} is not a struct or array<struct>: {field}")
    return df


def _array_element_renamer(elem_type: T.StructType, old: str, new: str):
    """Unary lambda factory (F.transform requires arity 1-3)."""

    def rename(x):
        return _rename_struct_field(x, elem_type, old, new)

    return rename


def _rename_struct_field(col, struct_type: T.StructType, old: str, new: str):
    fields = []
    for f in struct_type.fields:
        fields.append(col.getField(f.name).alias(new if f.name == old else f.name))
    return F.struct(*fields)
