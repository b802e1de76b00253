package graft

import org.apache.spark.sql.functions._

class DotProductSpec extends TestBase {

  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.5, -0.5), Array(2.0, 2.0)),
    (3L, null.asInstanceOf[Array[Double]], Array(1.0))
  ).toDF("id", "a", "b")

  test("vec_dot: exact values via SQL registration") {
    val got = df.selectExpr("id", "vec_dot(a, b) AS d").orderBy("id")
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(got.toSeq == Seq(Some(32.0), Some(0.0), None))
  }

  test("vec_dot: codegen and interpreted paths agree") {
    val viaExpr = df.where($"id" < 3).select(expr("vec_dot(a, b)")).as[Double].collect().toSeq
    // force interpreted evaluation through a context codegen can't help
    val rows = df.where($"id" < 3).select($"a", $"b").collect()
    val interp = rows.map { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    }
    assert(viaExpr == interp.toSeq)
  }

  test("GraftExtensions: the public spark.sql.extensions route registers vec_dot") {
    // A user wiring `spark.sql.extensions=graft.GraftExtensions` gets the
    // engine's functions with no imperative call. Simulated here by building
    // a second session over the SAME SparkContext with the extensions
    // applied at construction (the exact code path `spark.sql.extensions`
    // drives); the shared-suite session is restored afterwards.
    val prev = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val d = s2.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(d == 11.0)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }

  test("vec_dot matches the HOF fold it replaced, bit-for-bit") {
    val e = Tables(spark, sf(), "embeddings")
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val q = e.limit(1).select($"v").collect()(0).getSeq[Double](0)
    val both = e.select($"vec_id",
      expr(s"vec_dot(v, array(${q.mkString(",")}))").as("native"),
      aggregate(zip_with($"v", lit(q.toArray), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x).as("hof"))
      .where($"native" =!= $"hof")
    assert(both.isEmpty, "native expression must reproduce the fold exactly")
  }
}
