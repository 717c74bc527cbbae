"""FDS tensor output encoding (FeaturizedDatasetUtils/FDSConversionUtils)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feathr_spark.functions import fds


def test_infer_feature_type(spark):
    df = spark.createDataFrame(
        [(1, 1.5, "a", True, [1.0, 2.0], ["x"], {"t": 1.0})],
        "i int, d double, s string, b boolean, dv array<double>, "
        "cs array<string>, tv map<string,double>")
    by = {f.name: fds.infer_feature_type(f.dataType) for f in df.schema.fields}
    assert by == {
        "i": fds.NUMERIC, "d": fds.NUMERIC, "s": fds.CATEGORICAL,
        "b": fds.BOOLEAN, "dv": fds.DENSE_VECTOR, "cs": fds.CATEGORICAL_SET,
        "tv": fds.TERM_VECTOR,
    }


def test_infer_3field_struct_guard(spark):
    # ADVICE r4: only a NUMERIC third field infers SPARSE_TENSOR_2D;
    # other 3-field structs keep the original CATEGORICAL_SET inference
    from pyspark.sql import types as T
    num = T.ArrayType(T.StructType([
        T.StructField("d0", T.StringType()),
        T.StructField("d1", T.StringType()),
        T.StructField("v", T.DoubleType())]))
    nonnum = T.ArrayType(T.StructType([
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.StringType())]))
    assert fds.infer_feature_type(num) == fds.SPARSE_TENSOR_2D
    assert fds.infer_feature_type(nonnum) == fds.CATEGORICAL_SET


def test_scalar_and_dense(spark):
    df = spark.createDataFrame(
        [(3, 2.25, True, [1.0, 2.5]), (None, None, None, None)],
        "i int, d double, b boolean, dv array<double>")
    out, types = fds.to_fds(df, ["i", "d", "b", "dv"])
    assert dict(out.dtypes) == {
        "i": "float", "d": "float", "b": "boolean", "dv": "array<float>"}
    rows = out.collect()
    assert rows[0].i == 3.0 and rows[0].d == 2.25 and rows[0].b is True
    assert rows[0].dv == [1.0, 2.5]
    assert rows[1] == (None, None, None, None)  # null raw -> null tensor
    assert types == {"i": fds.NUMERIC, "d": fds.NUMERIC,
                     "b": fds.BOOLEAN, "dv": fds.DENSE_VECTOR}


def test_categorical_single_term(spark):
    df = spark.createDataFrame([("BUILDING",), (None,)], "seg string")
    out, types = fds.to_fds(df, ["seg"])
    assert out.schema["seg"].dataType.simpleString() == \
        "struct<indices0:array<string>,values:array<float>>"
    r = out.collect()
    assert r[0].seg.indices0 == ["BUILDING"] and r[0].seg.values == [1.0]
    assert r[1].seg is None
    assert types["seg"] == fds.CATEGORICAL


def test_term_sort_lexical_vs_float(spark):
    # all-numeric terms sort by float value ("10" after "2"); any
    # non-parseable term flips the WHOLE array to lexical sort
    # (FDSConversionUtils.scala:405-427 catches the first parse failure).
    df = spark.createDataFrame(
        [({"10": 1.0, "2": 2.0, "1": 3.0},),
         ({"10": 1.0, "2": 2.0, "x": 3.0},)],
        "tv map<string,double>")
    out, _ = fds.to_fds(df, ["tv"])
    r = out.collect()
    assert r[0].tv.indices0 == ["1", "2", "10"]
    assert r[0].tv.values == [3.0, 2.0, 1.0]
    assert r[1].tv.indices0 == ["10", "2", "x"]  # lexical fallback
    assert r[1].tv.values == [1.0, 2.0, 3.0]


def test_categorical_set_and_grouped_swa_shape(spark):
    df = spark.createDataFrame(
        [(["b", "a"], [("t2", 4.0), ("t1", 3.0)])],
        "cs array<string>, grp array<struct<term:string,value:double>>")
    out, types = fds.to_fds(df, ["cs", "grp"])
    r = out.collect()[0]
    assert r.cs.indices0 == ["a", "b"] and r.cs.values == [1.0, 1.0]
    # grouped SWA array<struct> treated as a term vector
    assert r.grp.indices0 == ["t1", "t2"] and r.grp.values == [3.0, 4.0]
    assert types == {"cs": fds.CATEGORICAL_SET, "grp": fds.TERM_VECTOR}


def test_already_fds_passthrough_and_overrides(spark):
    df = spark.createDataFrame(
        [ (1, (["a"], [2.0]), "5") ],
        "k int, pre struct<indices0:array<string>,values:array<float>>, s string")
    out, types = fds.to_fds(df, ["pre", "s"], feature_types={"s": fds.NUMERIC},
                            already_fds=["pre"])
    r = out.collect()[0]
    assert r.k == 1                      # non-feature column untouched
    assert r.pre.indices0 == ["a"]       # FDS_TENSOR passthrough
    assert r.s == 5.0                    # override beats inference
    assert types["s"] == fds.NUMERIC


def test_missing_feature_raises(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="nope"):
        fds.to_fds(df, ["nope"])


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([({"a": 1.0},)], "tv map<string,double>")
    out, _ = fds.to_fds(df, ["tv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection


def test_rank2_sparse_nested_map_numeric_sort(spark):
    # both dims all-float-parseable -> numeric (dim0, dim1) COO order
    # (per-dimension all-or-nothing rule, FDSConversionUtils.scala:405-427;
    # layout tensorTypeToDataFrameSchema, FeaturizedDatasetUtils.scala:377-384)
    df = spark.createDataFrame(
        [({"2": {"10": 1.5, "3": 2.0}, "10": {"1": 3.0}},), (None,)],
        "tv map<string,map<string,double>>")
    out, types = fds.to_fds(df, ["tv"])
    assert types["tv"] == fds.SPARSE_TENSOR_2D
    rows = out.collect()
    got = rows[0].tv
    assert got.indices0 == ["2", "2", "10"]   # 2 < 10 numerically
    assert got.indices1 == ["3", "10", "1"]   # within dim0=2: 3 < 10
    assert got["values"] == [2.0, 1.5, 3.0]
    assert rows[1].tv is None                 # null raw -> null tensor


def test_rank2_sparse_coo_lexical_dim(spark):
    # dim0 has a non-parseable term -> lexical; dim1 all numeric
    df = spark.createDataFrame(
        [([("b", "10", 1.0), ("b", "2", 2.0), ("a", "5", 3.0)],)],
        "coo array<struct<d0:string,d1:string,v:double>>")
    out, types = fds.to_fds(df, ["coo"])
    assert types["coo"] == fds.SPARSE_TENSOR_2D
    got = out.collect()[0].coo
    assert got.indices0 == ["a", "b", "b"]
    assert got.indices1 == ["5", "2", "10"]   # numeric: 2 < 10 within b
    assert got["values"] == [3.0, 2.0, 1.0]


def test_rank2_dense_nested_arrays(spark):
    df = spark.createDataFrame([([[1.0, 2.0], [3.0, 4.0]],), (None,)],
                               "d array<array<double>>")
    out, types = fds.to_fds(df, ["d"])
    assert types["d"] == fds.DENSE_TENSOR_2D
    rows = out.collect()
    assert rows[0].d == [[1.0, 2.0], [3.0, 4.0]]
    assert rows[1].d is None
    assert dict(out.dtypes)["d"] == "array<array<float>>"


def test_rank2_bad_type_raises(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="SPARSE_TENSOR_2D"):
        fds.to_fds(df, ["x"], feature_types={"x": fds.SPARSE_TENSOR_2D})


def test_rank2_zero_shuffle_plan(spark):
    df = spark.createDataFrame([({"a": {"b": 1.0}},)],
                               "tv map<string,map<string,double>>")
    out, _ = fds.to_fds(df, ["tv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # rank-2 is still a pure projection


def test_rank3_sparse_and_dense(spark):
    """Rank>=3 tensors (general FDSConversionUtils case, r5): COO
    array<struct<d0,d1,d2,v>>, depth-3 nested term maps, and 3-nested
    dense arrays — per-dimension all-or-nothing term ordering,
    hierarchical (d0, d1, d2) sort, null -> null."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (2,)], "id int").select(
        "id",
        F.when(F.col("id") == 1, F.array(
            F.struct(F.lit("b").alias("d0"), F.lit("10").alias("d1"),
                     F.lit("x").alias("d2"), F.lit(3.0).alias("v")),
            F.struct(F.lit("b").alias("d0"), F.lit("2").alias("d1"),
                     F.lit("y").alias("d2"), F.lit(1.0).alias("v")),
            F.struct(F.lit("a").alias("d0"), F.lit("5").alias("d1"),
                     F.lit("z").alias("d2"), F.lit(2.0).alias("v")),
        )).alias("coo3"),
        F.create_map(
            F.lit("2"), F.create_map(F.lit("1"),
                                     F.create_map(F.lit("9"), F.lit(1.5))),
            F.lit("10"), F.create_map(F.lit("1"),
                                      F.create_map(F.lit("3"), F.lit(2.5))),
        ).alias("map3"),
        F.array(F.array(F.array(F.lit(1.0)), F.array(F.lit(2.0)))).alias("d3"),
    )
    out, types = fds.to_fds(df, ["coo3", "map3", "d3"])
    assert types == {"coo3": fds.SPARSE_TENSOR_3D if hasattr(fds, "SPARSE_TENSOR_3D") else "SPARSE_TENSOR_3D",
                     "map3": "SPARSE_TENSOR_3D", "d3": "DENSE_TENSOR_3D"}
    rows = {r["id"]: r for r in out.collect()}
    c = rows[1]["coo3"]
    # dim0 lexical (a < b), then dim1 NUMERIC within b (2 < 10)
    assert c["indices0"] == ["a", "b", "b"]
    assert c["indices1"] == ["5", "2", "10"]
    assert c["indices2"] == ["z", "y", "x"]
    assert c["values"] == [2.0, 1.0, 3.0]
    assert rows[2]["coo3"] is None  # null raw -> null tensor
    m = rows[1]["map3"]
    # outer keys both float-parseable -> numeric order: 2 < 10
    assert m["indices0"] == ["2", "10"]
    assert m["indices2"] == ["9", "3"]
    assert m["values"] == [1.5, 2.5]
    assert rows[1]["d3"] == [[[1.0], [2.0]]]


def test_rank4_sparse_roundtrip(spark):
    """Arbitrary rank: a rank-4 COO column converts with 4 coordinate
    arrays (no special-casing beyond the rank regex)."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.array(F.struct(
        F.lit("1").alias("a"), F.lit("2").alias("b"),
        F.lit("3").alias("c"), F.lit("4").alias("d"),
        F.lit(7.0).alias("v"))).alias("t4"))
    out, types = fds.to_fds(df, ["t4"])
    assert types == {"t4": "SPARSE_TENSOR_4D"}
    r = out.collect()[0]["t4"]
    assert r["indices3"] == ["4"] and r["values"] == [7.0]
