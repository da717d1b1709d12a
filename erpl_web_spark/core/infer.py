"""Typed schema inference from sampled JSON objects.

Shared by the GraphQL and generic-REST connectors. A typed upgrade over
the reference's all-VARCHAR first-row inference
(odata_read_functions.cpp:107-121): field order = first appearance,
null-only fields -> string, type conflicts widen (long+double -> double,
struct/array merge recursively, anything else -> string).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def infer_type(v) -> DataType:
    if isinstance(v, bool):
        return BooleanType()
    if isinstance(v, int):
        return LongType()
    if isinstance(v, float):
        return DoubleType()
    if isinstance(v, dict):
        return infer_struct([v])
    if isinstance(v, list):
        elem = next((x for x in v if x is not None), None)
        return ArrayType(infer_type(elem) if elem is not None else StringType(), True)
    return StringType()


def merge_types(a: DataType, b: DataType) -> DataType:
    if a == b:
        return a
    nums = (LongType(), DoubleType())
    if a in nums and b in nums:
        return DoubleType()
    if isinstance(a, StructType) and isinstance(b, StructType):
        names = list(dict.fromkeys([f.name for f in a.fields] + [f.name for f in b.fields]))
        af = {f.name: f.dataType for f in a.fields}
        bf = {f.name: f.dataType for f in b.fields}
        return StructType(
            [
                StructField(
                    n,
                    merge_types(af.get(n, bf.get(n)), bf.get(n, af.get(n))),
                    True,
                )
                for n in names
            ]
        )
    if isinstance(a, ArrayType) and isinstance(b, ArrayType):
        return ArrayType(merge_types(a.elementType, b.elementType), True)
    return StringType()


def infer_struct(rows: list[dict]) -> StructType:
    order: list[str] = []
    types: dict[str, DataType] = {}
    for r in rows:
        for k, v in r.items():
            if k not in order:
                order.append(k)
            if v is None:
                continue
            t = infer_type(v)
            types[k] = merge_types(types[k], t) if k in types else t
    return StructType([StructField(k, types.get(k, StringType()), True) for k in order])
