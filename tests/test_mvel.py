"""MVEL-subset translator: the expression shapes observed in the
reference's configs (feathr-impl test .conf files + MvelContextUDFs)
must translate to Spark SQL and evaluate to the Java-semantics result.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from feathr_spark.functions.mvel import (
    MvelAnchorExtractor,
    MvelTranslationError,
    mvel_column,
    mvel_feature,
    mvel_to_sql,
)


def _eval(spark, expr, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(mvel_column(expr).alias("out")).collect()]


# --- translation shapes (pure, no Spark needed) ---------------------------

@pytest.mark.parametrize("mvel,sql", [
    ("a", "a"),
    ("features.feature1", "features.feature1"),
    ("(Float) value", "CAST(value AS FLOAT)"),
    ("toNumeric(fromValue)", "CAST(fromValue AS DOUBLE)"),
    ("isPresent(f)", "(f IS NOT NULL)"),
    ("x == null", "(x IS NULL)"),
    ("x != null", "(x IS NOT NULL)"),
    # null equality is symmetric in MVEL; 'NULL = x' would be SQL-null
    ("null == x", "(x IS NULL)"),
    ("null != x", "(x IS NOT NULL)"),
    ("null == null", "TRUE"),
    ("null != null", "FALSE"),
    ("Math.log(toNumeric(omega))", "LN(CAST(omega AS DOUBLE))"),
    ("if_else(c, a, b)", "IF(c, a, b)"),
])
def test_translations(mvel, sql):
    assert mvel_to_sql(mvel) == sql


def test_unsupported_raises():
    # projections and inline collection literals became SUPPORTED in r5
    # (see test_projection_* below); imports, unknown functions/methods,
    # and nested projections still raise
    for bad in [
        "import java.util.*; foo()",
        "unknownFn(x)",
        "x.unknownMethod()",
        "(($ in $.ys) in xs)",
    ]:
        with pytest.raises(MvelTranslationError):
            mvel_to_sql(bad)


# --- evaluation semantics -------------------------------------------------

def test_reference_config_shapes(spark):
    rows = [(2.0, 3.0, "abc", None), (None, 5.0, "XY", 0.0)]
    schema = "aa double, bb double, s string, z double"
    assert _eval(spark, "toNumeric(aa) * toNumeric(bb)", rows, schema) == [6.0, None]
    assert _eval(spark, "isPresent(aa) ? Math.log(aa) : null", rows, schema) == \
        [math.log(2.0), None]
    assert _eval(spark, "isNonZero(z) ? z : -1.0", rows, schema) == [-1.0, -1.0]
    assert _eval(spark, "(isPresent(aa) && isPresent(bb)) ? aa * bb : null",
                 rows, schema) == [6.0, None]
    assert _eval(spark, "(Float) bb", rows, schema) == [3.0, 5.0]


def test_string_methods(spark):
    rows = [("Hello World",)]
    schema = "s string"
    assert _eval(spark, "s.toLowerCase()", rows, schema) == ["hello world"]
    assert _eval(spark, "s.substring(6)", rows, schema) == ["World"]
    assert _eval(spark, "s.substring(0, 5)", rows, schema) == ["Hello"]
    assert _eval(spark, "s.contains('World')", rows, schema) == [True]
    assert _eval(spark, "s.indexOf('World')", rows, schema) == [6]
    assert _eval(spark, "s.charAt(1)", rows, schema) == ["e"]
    assert _eval(spark, "s.length()", rows, schema) == [11]
    assert _eval(spark, "s.replaceAll('o', '0')", rows, schema) == ["Hell0 W0rld"]
    assert _eval(spark, "s.split(' ')[1]", rows, schema) == ["World"]
    assert _eval(spark, "s.equalsIgnoreCase('HELLO WORLD')", rows, schema) == [True]


def test_ternary_precedence_and_arith(spark):
    rows = [(7.0, 2.0)]
    schema = "x double, y double"
    assert _eval(spark, "x > 5 ? x - 5 : x + 5", rows, schema) == [2.0]
    assert _eval(spark, "x % y == 1.0 ? 'odd' : 'even'", rows, schema) == ["odd"]
    assert _eval(spark, "x > 1 ? x > 6 ? 'big' : 'mid' : 'small'",
                 rows, schema) == ["big"]
    assert _eval(spark, "-x + 10", rows, schema) == [3.0]
    assert _eval(spark, "!(x > 5)", rows, schema) == [False]
    assert _eval(spark, "Math.pow(x, y)", rows, schema) == [49.0]
    assert _eval(spark, "Math.max(x, y)", rows, schema) == [7.0]


def test_term_vector_udfs(spark):
    df = spark.createDataFrame(
        [({"a": 1.0, "b": 3.0, "c": 2.0},)], "tv map<string,double>")
    top2 = df.select(mvel_column("getTopKTerms(tv, 2)").alias("out")).first()["out"]
    assert top2 == ["b", "c"]
    top = df.select(mvel_column("getTopTerm(tv)").alias("out")).first()["out"]
    assert top == "b"
    terms = df.select(F.array_sort(mvel_column("getTerms(tv)")).alias("out")) \
        .first()["out"]
    assert terms == ["a", "b", "c"]


def test_cosine_similarity_udf(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
                               "u array<double>, v array<double>")
    out = [r["out"] for r in
           df.select(mvel_column("cosineSimilarity(u, v)").alias("out")).collect()]
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(0.0)


def test_extractor_and_feature(spark):
    df = spark.createDataFrame([(4.0, "x")], "omega double, tag string")
    ex = MvelAnchorExtractor({
        "anchoredF1": "toNumeric(omega)",
        "a_omega_logA": "Math.log(toNumeric(omega))",
        "tag_up": "tag.toUpperCase()",
    })
    out = ex.apply(df).first()
    assert out["anchoredF1"] == 4.0
    assert out["a_omega_logA"] == pytest.approx(math.log(4.0))
    assert out["tag_up"] == "X"
    f = mvel_feature("f1", "isPresent(omega) ? omega : 0.0")
    assert f.name == "f1" and "IS NOT NULL" in f.expr


def test_struct_navigation(spark):
    df = spark.createDataFrame([((1.0, "k"),)], "features struct<feature1:double,name:string>")
    out = df.select(mvel_column("features.feature1 + 1").alias("out")).first()["out"]
    assert out == 2.0


def test_projection_reference_loop_exp(spark):
    """The reference's testMVELLoopExpFeature.conf expression verbatim:
    ([$.a_id : $.v2] in as if !($.v)) — map projection with filter over
    an array-of-structs column named with a SQL keyword (`as`)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1,), (2,)], "id int").select(
        "id",
        F.array(
            F.struct(F.lit("k1").alias("a_id"), F.lit(10.0).alias("v2"),
                     F.lit(False).alias("v")),
            F.struct(F.lit("k2").alias("a_id"), F.lit(20.0).alias("v2"),
                     F.lit(True).alias("v")),
            F.struct(F.lit("k3").alias("a_id"), F.lit(30.0).alias("v2"),
                     F.lit(False).alias("v")),
        ).alias("as"))
    sql = mvel_to_sql("([$.a_id : $.v2] in as if !($.v))")
    out = df.select("id", F.expr(sql).alias("aMap")).collect()
    assert out[0]["aMap"] == {"k1": 10.0, "k3": 30.0}  # v=True filtered


def test_projection_plain_and_identity(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([([1, 2, 3],)], "xs array<int>")
    got = df.select(
        F.expr(mvel_to_sql("($ * 2 in xs)")).alias("a"),
        F.expr(mvel_to_sql("($ in xs if $ > 1)")).alias("b")).collect()[0]
    assert got["a"] == [2, 4, 6]
    assert got["b"] == [2, 3]


def test_inline_collection_literals(spark):
    from pyspark.sql import functions as F

    df = spark.range(1)
    got = df.select(
        F.expr(mvel_to_sql("[1, 2, 3]")).alias("l"),
        F.expr(mvel_to_sql("['a' : 1, 'b' : 2]")).alias("m")).collect()[0]
    assert got["l"] == [1, 2, 3] and got["m"] == {"a": 1, "b": 2}


def test_projection_errors():
    import pytest as _pt
    with _pt.raises(MvelTranslationError, match="nested"):
        mvel_to_sql("(($ in $.ys) in xs)")
    with _pt.raises(MvelTranslationError, match="only valid inside"):
        mvel_to_sql("$.x + 1")
