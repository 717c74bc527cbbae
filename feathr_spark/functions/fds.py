"""Quince-FDS (Featurized Dataset) output encoding.

The reference materializes joined feature DataFrames in "FDS" tensor
format before handing them to downstream trainers: every feature column
is rewritten from its raw Spark type into a canonical tensor column
(`offline/util/FeaturizedDatasetUtils.scala:19-34` defines the 1-D
sparse layout `struct<indices0: array<string>, values: array<float>>`;
`offline/transformation/FDSConversionUtils.scala:34-60` is the per-value
conversion; `offline/swa/SlidingWindowFeatureUtils.scala:261-296`
applies it to SWA join output).

This module re-expresses that conversion as pure Catalyst expressions —
no UDFs, zero shuffle, fully whole-stage-codegen — so converting a
100 TB join output to FDS adds a projection, not a job.

Type inference (FeaturizedDatasetUtils.inferFeatureTypeFromColumnDataType,
`FeaturizedDatasetUtils.scala:209-221`):

==========================  ==================  ==========================
raw column type             FeatureTypes        FDS column type
==========================  ==================  ==========================
boolean                     BOOLEAN             boolean (rank-0 tensor)
numeric                     NUMERIC             float (rank-0 tensor)
string                      CATEGORICAL         1-D sparse: ([term],[1.0])
array<numeric>              DENSE_VECTOR        array<float> (dense 1-D)
array<string>               CATEGORICAL_SET     1-D sparse: (terms,[1.0..])
map<string,numeric>         TERM_VECTOR         1-D sparse: (terms,values)
array<struct<term,value>>   TERM_VECTOR         1-D sparse (grouped SWA
                                                output, SlidingWindowJoin
                                                .scala:91-101)
array<struct<d0..dk-1,v>>   SPARSE_TENSOR_kD    rank-k sparse: k parallel
                                                indices arrays + values
map<..depth k.., numeric>   SPARSE_TENSOR_kD    same (nested term maps)
array^k<numeric>            DENSE_TENSOR_kD     rank-k dense: k-nested
                                                float arrays
==========================  ==================  ==========================

Rank-k (k >= 2) follows FeaturizedDatasetUtils.tensorTypeToDataFrameSchema
(`FeaturizedDatasetUtils.scala:364-390`) — the general multi-dimensional
case, any rank, not just the rank-2 shortcut (new in r5).

Sparse-tensor term ordering follows FDSConversionUtils.scala:405-427:
if EVERY term parses as a float the entries sort by the numeric value of
the term, otherwise lexically (the reference sorts by
``java.lang.Float.valueOf(term)`` and falls back to string sort on the
first parse failure — an all-or-nothing rule, replicated here with a
``forall`` guard). Null raw values stay null (FDSConversionUtils
rawToFDSRow short-circuit, line 35).
"""

from __future__ import annotations

import re
from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# FeatureTypes vocabulary (common/FeatureTypes.java via
# FeaturizedDatasetUtils.inferFeatureTypeFromColumnDataType)
BOOLEAN = "BOOLEAN"
NUMERIC = "NUMERIC"
CATEGORICAL = "CATEGORICAL"
CATEGORICAL_SET = "CATEGORICAL_SET"
DENSE_VECTOR = "DENSE_VECTOR"
TERM_VECTOR = "TERM_VECTOR"
# rank-2 tensors (FeaturizedDatasetUtils.tensorTypeToDataFrameSchema,
# `FeaturizedDatasetUtils.scala:364-390`: SPARSE rank-k = parallel
# coordinate arrays indices0..indices{k-1} + values; DENSE rank-k =
# k-nested arrays). The reference reaches these through declared
# TensorType configs / the FDSExtract multi-dim UDF
# (`SQLConfigurableAnchorExtractor.scala:83-87`,
# `FeatureTransformation.scala:87,1365-1372`).
SPARSE_TENSOR_2D = "SPARSE_TENSOR_2D"
DENSE_TENSOR_2D = "DENSE_TENSOR_2D"


def sparse_tensor_type(rank: int) -> str:
    """FeatureTypes name for a rank-k sparse tensor (k >= 2): the
    general FDSConversionUtils case, not just the rank-2 shortcut."""
    return f"SPARSE_TENSOR_{rank}D"


def dense_tensor_type(rank: int) -> str:
    return f"DENSE_TENSOR_{rank}D"


def sparse_ddl(rank: int) -> str:
    """Rank-k sparse FDS layout: k parallel coordinate arrays + values
    (tensorTypeToDataFrameSchema, FeaturizedDatasetUtils.scala:364-390 —
    one indices{i} array per dimension, any rank)."""
    idx = ", ".join(f"indices{i}: array<string>" for i in range(rank))
    return f"struct<{idx}, values: array<float>>"


def dense_ddl(rank: int) -> str:
    """Rank-k dense FDS layout: k-nested float arrays (getNestArrays,
    FeaturizedDatasetUtils.scala:364-373)."""
    return "array<" * rank + "float" + ">" * rank


# FeaturizedDatasetUtils.TERM_VECTOR_FDS_DATA_TYPE
FDS_SPARSE_DDL = "struct<indices0: array<string>, values: array<float>>"
# rank-2 sparse COO layout per tensorTypeToDataFrameSchema
FDS_SPARSE_2D_DDL = sparse_ddl(2)


def infer_feature_type(dtype: T.DataType) -> str:
    """FeaturizedDatasetUtils.inferFeatureTypeFromColumnDataType
    (`FeaturizedDatasetUtils.scala:209-221`), extended with the grouped
    SWA ``array<struct>`` shape that convertSWADFToFDS receives.
    Since r4, 3-field ``array<struct>`` columns whose third field is
    NUMERIC infer as SPARSE_TENSOR_2D; all other 3-field structs keep
    the original CATEGORICAL_SET inference."""
    if isinstance(dtype, T.BooleanType):
        return BOOLEAN
    if isinstance(dtype, T.NumericType):
        return NUMERIC
    if isinstance(dtype, T.StringType):
        return CATEGORICAL
    if isinstance(dtype, T.ArrayType):
        if isinstance(dtype.elementType, T.NumericType):
            return DENSE_VECTOR
        # rank-k dense: k-nested numeric arrays
        depth, el = 1, dtype.elementType
        while isinstance(el, T.ArrayType):
            depth, el = depth + 1, el.elementType
        if depth >= 2 and isinstance(el, T.NumericType):
            return dense_tensor_type(depth)
        if isinstance(dtype.elementType, T.StructType) and len(
                dtype.elementType.fields) == 2:
            return TERM_VECTOR  # grouped SWA output: array<struct<term,value>>
        if (isinstance(dtype.elementType, T.StructType)
                and len(dtype.elementType.fields) >= 3
                and isinstance(dtype.elementType.fields[-1].dataType,
                               T.NumericType)):
            # COO rows: array<struct<d0..d{k-1},value>> of any rank —
            # only when the LAST field is numeric (a non-numeric value
            # field would cast to all-null tensor values; such structs
            # stay CATEGORICAL_SET, the pre-rank-2 inference)
            return sparse_tensor_type(len(dtype.elementType.fields) - 1)
        return CATEGORICAL_SET
    if isinstance(dtype, T.MapType) and isinstance(dtype.valueType, T.MapType):
        # nested term map: map<d0, map<d1, ... numeric>> of any depth
        depth, vt = 2, dtype.valueType.valueType
        while isinstance(vt, T.MapType):
            depth, vt = depth + 1, vt.valueType
        return sparse_tensor_type(depth)
    return TERM_VECTOR  # map / anything else — the reference's default


def _sorted_sparse(entries: Column) -> Column:
    """Order term/value entries by the reference rule
    (FDSConversionUtils.scala:405-427): float order when every term is
    float-parseable, else lexical — then split into the two FDS arrays."""
    all_numeric = F.forall(entries,
                           lambda e: e["k"].try_cast("float").isNotNull())

    def cmp_float(a, b):
        fa, fb = a["k"].try_cast("float"), b["k"].try_cast("float")
        return F.when(fa < fb, F.lit(-1)).when(fa > fb, F.lit(1)).otherwise(F.lit(0))

    def cmp_str(a, b):
        return (F.when(a["k"] < b["k"], F.lit(-1))
                 .when(a["k"] > b["k"], F.lit(1)).otherwise(F.lit(0)))

    ordered = (F.when(all_numeric, F.array_sort(entries, cmp_float))
                .otherwise(F.array_sort(entries, cmp_str)))
    return F.struct(
        F.transform(ordered, lambda e: e["k"]).alias("indices0"),
        F.transform(ordered, lambda e: e["v"]).alias("values"),
    )


def _sorted_sparse_nd(entries: Column, rank: int) -> Column:
    """Rank-k COO ordering (general FDSConversionUtils case): entries
    (structs ``k0..k{rank-1}, v``) sort lexicographically by
    (dim0, ..., dim{k-1}), each dimension independently applying the
    reference's all-or-nothing term rule (FDSConversionUtils.scala:
    405-427 — float order when EVERY term of that dimension parses as a
    float, else lexical), then split into the k+1 parallel FDS arrays
    (tensorTypeToDataFrameSchema, FeaturizedDatasetUtils.scala:377-384)."""
    def _all_numeric(i: int) -> Column:
        # factory closure: a default-arg lambda would read as a 2-arg
        # higher-order function to PySpark's arity inspection
        return F.forall(entries,
                        lambda e: e[f"k{i}"].try_cast("float").isNotNull())

    nums = [_all_numeric(i) for i in range(rank)]

    def cmp_term(a: Column, b: Column, numeric: Column) -> Column:
        fa, fb = a.try_cast("float"), b.try_cast("float")
        as_num = (F.when(fa < fb, F.lit(-1))
                   .when(fa > fb, F.lit(1)).otherwise(F.lit(0)))
        as_str = (F.when(a < b, F.lit(-1))
                   .when(a > b, F.lit(1)).otherwise(F.lit(0)))
        return F.when(numeric, as_num).otherwise(as_str)

    def cmp(a, b):
        expr = cmp_term(a[f"k{rank-1}"], b[f"k{rank-1}"], nums[rank - 1])
        for i in range(rank - 2, -1, -1):
            ci = cmp_term(a[f"k{i}"], b[f"k{i}"], nums[i])
            expr = F.when(ci != 0, ci).otherwise(expr)
        return expr

    ordered = F.array_sort(entries, cmp)

    def _dim(i: int) -> Column:
        return F.transform(ordered, lambda e: e[f"k{i}"]).alias(f"indices{i}")

    return F.struct(
        *[_dim(i) for i in range(rank)],
        F.transform(ordered, lambda e: e["v"]).alias("values"),
    )


def _sorted_sparse_2d(entries: Column) -> Column:
    """Rank-2 shortcut over :func:`_sorted_sparse_nd` (kept for the
    pre-r5 call sites and the 2-D docs pointer)."""
    return _sorted_sparse_nd(entries, 2)


def _nested_map_entries(col: Column, rank: int) -> Column:
    """Flatten a depth-``rank`` nested term map into COO entry structs
    ``k0..k{rank-1}, v`` (pure Catalyst, recursive flatten/transform)."""
    if rank == 1:
        return F.transform(
            F.map_entries(col),
            lambda e: F.struct(e["key"].cast("string").alias("k0"),
                               e["value"].cast("float").alias("v")))
    return F.flatten(F.transform(
        F.map_entries(col),
        lambda o: F.transform(
            _nested_map_entries(o["value"], rank - 1),
            lambda i: F.struct(
                o["key"].cast("string").alias("k0"),
                *[i[f"k{j}"].alias(f"k{j + 1}") for j in range(rank - 1)],
                i["v"].alias("v")))))


def fds_column(col: Column, dtype: T.DataType,
               feature_type: Optional[str] = None) -> Column:
    """The FDS expression for one raw feature column (rawToFDSRow,
    `FDSConversionUtils.scala:34-60`, as a Catalyst projection)."""
    ftype = feature_type or infer_feature_type(dtype)
    if ftype == BOOLEAN:
        return col.cast("boolean")
    if ftype == NUMERIC:
        return col.cast("float")
    if ftype == DENSE_VECTOR:
        return col.cast("array<float>")
    m_dense = re.match(r"DENSE_TENSOR_(\d+)D$", ftype)
    if m_dense:
        # rank-k dense = k-nested arrays (getNestArrays,
        # FeaturizedDatasetUtils.scala:364-373,384-387)
        return col.cast(dense_ddl(int(m_dense.group(1))))
    m_sparse = re.match(r"SPARSE_TENSOR_(\d+)D$", ftype)
    if m_sparse:
        rank = int(m_sparse.group(1))
        if isinstance(dtype, T.MapType) and isinstance(dtype.valueType,
                                                       T.MapType):
            entries = _nested_map_entries(col, rank)
        elif isinstance(dtype, T.ArrayType) and isinstance(
                dtype.elementType, T.StructType) and len(
                dtype.elementType.fields) == rank + 1:
            names = [f.name for f in dtype.elementType.fields]
            entries = F.transform(
                col, lambda e: F.struct(
                    *[e[names[i]].cast("string").alias(f"k{i}")
                      for i in range(rank)],
                    e[names[rank]].cast("float").alias("v")))
        else:
            raise ValueError(
                f"cannot encode {dtype.simpleString()} as "
                f"SPARSE_TENSOR_{rank}D (expected a depth-{rank} nested "
                f"map or array<struct<d0..d{rank-1},v>>)")
        converted = _sorted_sparse_nd(entries, rank)
        return F.when(col.isNull(),
                      F.lit(None).cast(sparse_ddl(rank))).otherwise(converted)
    if ftype == CATEGORICAL:
        # single-term vector ([value], [1.0f]) — FDSConversionUtils.scala:340-342
        converted = F.struct(
            F.array(col.cast("string")).alias("indices0"),
            F.array(F.lit(1.0).cast("float")).alias("values"),
        )
    elif ftype == CATEGORICAL_SET:
        # every term weight 1.0f — convertRawArrayToFDS1dTensor
        entries = F.transform(
            col, lambda t: F.struct(t.cast("string").alias("k"),
                                    F.lit(1.0).cast("float").alias("v")))
        converted = _sorted_sparse(entries)
    elif ftype == TERM_VECTOR:
        if isinstance(dtype, T.MapType):
            entries = F.transform(
                F.map_entries(col),
                lambda e: F.struct(e["key"].cast("string").alias("k"),
                                   e["value"].cast("float").alias("v")))
        elif isinstance(dtype, T.ArrayType) and isinstance(
                dtype.elementType, T.StructType):
            f0, f1 = (f.name for f in dtype.elementType.fields)
            entries = F.transform(
                col, lambda e: F.struct(e[f0].cast("string").alias("k"),
                                        e[f1].cast("float").alias("v")))
        else:
            raise ValueError(
                f"cannot encode {dtype.simpleString()} as TERM_VECTOR")
        converted = _sorted_sparse(entries)
    else:
        raise ValueError(f"unknown FDS feature type {feature_type!r}")
    # null raw value -> null tensor (rawToFDSRow line 35)
    return F.when(col.isNull(), F.lit(None).cast(FDS_SPARSE_DDL)).otherwise(converted)


def to_fds(
    df: DataFrame,
    feature_cols: Sequence[str],
    feature_types: Optional[Mapping[str, str]] = None,
    already_fds: Sequence[str] = (),
) -> tuple[DataFrame, dict[str, str]]:
    """Convert the feature columns of a joined/generated DataFrame to FDS
    format, leaving key/timestamp/passthrough columns untouched
    (convertSWADFToFDS, `SlidingWindowFeatureUtils.scala:261-296`).

    ``feature_types`` overrides inference per feature (the reference's
    user-specified FeatureTypeConfig); ``already_fds`` columns pass
    through unchanged (FeatureColumnFormat.FDS_TENSOR, e.g. a custom SQL
    extractor that emitted FDS directly). Returns the converted frame
    plus the inferred ``{feature: FeatureTypes}`` map (the reference's
    FeatureDataFrame header).

    Scale: one projection over the input — no shuffle, no UDF; Catalyst
    folds it into the parent stage.
    """
    overrides = dict(feature_types or {})
    skip = set(already_fds)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    inferred: dict[str, str] = {}
    out = []
    for f in df.schema.fields:
        if f.name not in feature_cols:
            out.append(F.col(f.name))
            continue
        if f.name in skip:
            out.append(F.col(f.name))
            inferred[f.name] = overrides.get(f.name, TERM_VECTOR)
            continue
        ftype = overrides.get(f.name) or infer_feature_type(f.dataType)
        inferred[f.name] = ftype
        out.append(fds_column(F.col(f.name), by_name[f.name], ftype).alias(f.name))
    missing = [c for c in feature_cols if c not in by_name]
    if missing:
        raise ValueError(f"feature columns not in DataFrame: {missing}")
    return df.select(*out), inferred
