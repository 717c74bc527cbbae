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
==========================  ==================  ==========================

Sparse-tensor term ordering follows FDSConversionUtils.scala:405-427:
if EVERY term parses as a float the entries sort by the numeric value of
the term, otherwise lexically (the reference sorts by
``java.lang.Float.valueOf(term)`` and falls back to string sort on the
first parse failure — an all-or-nothing rule, replicated here with a
``forall`` guard). Null raw values stay null (FDSConversionUtils
rawToFDSRow short-circuit, line 35).
"""

from __future__ import annotations

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

# FeaturizedDatasetUtils.TERM_VECTOR_FDS_DATA_TYPE
FDS_SPARSE_DDL = "struct<indices0: array<string>, values: array<float>>"
# rank-2 sparse COO layout per tensorTypeToDataFrameSchema
FDS_SPARSE_2D_DDL = ("struct<indices0: array<string>, "
                     "indices1: array<string>, values: array<float>>")


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
        if isinstance(dtype.elementType, T.ArrayType) and isinstance(
                dtype.elementType.elementType, T.NumericType):
            return DENSE_TENSOR_2D  # rank-2 dense: nested numeric arrays
        if isinstance(dtype.elementType, T.StructType) and len(
                dtype.elementType.fields) == 2:
            return TERM_VECTOR  # grouped SWA output: array<struct<term,value>>
        if (isinstance(dtype.elementType, T.StructType)
                and len(dtype.elementType.fields) == 3
                and isinstance(dtype.elementType.fields[2].dataType,
                               T.NumericType)):
            # COO rows: array<struct<d0,d1,value>> — only when the third
            # field is numeric (a non-numeric value field would cast to
            # all-null tensor values; such structs stay CATEGORICAL_SET,
            # the pre-rank-2 inference)
            return SPARSE_TENSOR_2D
        return CATEGORICAL_SET
    if isinstance(dtype, T.MapType) and isinstance(dtype.valueType, T.MapType):
        return SPARSE_TENSOR_2D  # nested term map: map<d0, map<d1, value>>
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


def _sorted_sparse_2d(entries: Column) -> Column:
    """Rank-2 COO ordering: entries sort lexicographically by
    (dim0, dim1), each dimension independently applying the reference's
    all-or-nothing term rule (FDSConversionUtils.scala:405-427 — float
    order when EVERY term of that dimension parses as a float, else
    lexical), then split into the three parallel FDS arrays
    (tensorTypeToDataFrameSchema, FeaturizedDatasetUtils.scala:377-384)."""
    num0 = F.forall(entries, lambda e: e["k0"].try_cast("float").isNotNull())
    num1 = F.forall(entries, lambda e: e["k1"].try_cast("float").isNotNull())

    def cmp_term(a: Column, b: Column, numeric: Column) -> Column:
        fa, fb = a.try_cast("float"), b.try_cast("float")
        as_num = (F.when(fa < fb, F.lit(-1))
                   .when(fa > fb, F.lit(1)).otherwise(F.lit(0)))
        as_str = (F.when(a < b, F.lit(-1))
                   .when(a > b, F.lit(1)).otherwise(F.lit(0)))
        return F.when(numeric, as_num).otherwise(as_str)

    def cmp(a, b):
        c0 = cmp_term(a["k0"], b["k0"], num0)
        return F.when(c0 != 0, c0).otherwise(
            cmp_term(a["k1"], b["k1"], num1))

    ordered = F.array_sort(entries, cmp)
    return F.struct(
        F.transform(ordered, lambda e: e["k0"]).alias("indices0"),
        F.transform(ordered, lambda e: e["k1"]).alias("indices1"),
        F.transform(ordered, lambda e: e["v"]).alias("values"),
    )


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
    if ftype == DENSE_TENSOR_2D:
        # rank-2 dense = nested arrays (getNestArrays,
        # FeaturizedDatasetUtils.scala:364-373,384-387)
        return col.cast("array<array<float>>")
    if ftype == SPARSE_TENSOR_2D:
        if isinstance(dtype, T.MapType) and isinstance(dtype.valueType,
                                                       T.MapType):
            entries = F.flatten(F.transform(
                F.map_entries(col),
                lambda o: F.transform(
                    F.map_entries(o["value"]),
                    lambda i: F.struct(
                        o["key"].cast("string").alias("k0"),
                        i["key"].cast("string").alias("k1"),
                        i["value"].cast("float").alias("v")))))
        elif isinstance(dtype, T.ArrayType) and isinstance(
                dtype.elementType, T.StructType) and len(
                dtype.elementType.fields) == 3:
            f0, f1, f2 = (f.name for f in dtype.elementType.fields)
            entries = F.transform(
                col, lambda e: F.struct(e[f0].cast("string").alias("k0"),
                                        e[f1].cast("string").alias("k1"),
                                        e[f2].cast("float").alias("v")))
        else:
            raise ValueError(
                f"cannot encode {dtype.simpleString()} as SPARSE_TENSOR_2D "
                f"(expected map<_,map<_,numeric>> or array<struct<d0,d1,v>>)")
        converted = _sorted_sparse_2d(entries)
        return F.when(col.isNull(),
                      F.lit(None).cast(FDS_SPARSE_2D_DDL)).otherwise(converted)
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
