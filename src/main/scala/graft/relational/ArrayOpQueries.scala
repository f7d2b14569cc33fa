package graft.relational

import graft.core.DeisaArray
import graft.functions.FFT
import graft.linalg.Linalg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Conformance queries for the array-operator surface (SURVEY §2.C rows
  * C1-C16): each builds a chunked DeisaArray from `lineitem` in a
  * deterministic element order (via [[ArrayHarness]]), applies ONE array
  * operator, and reduces to a small relational result a DuckDB oracle can
  * reproduce exactly.
  *
  * Determinism rules: quantities/linenumbers are integer-valued, so plain
  * double sums are exact; anything genuinely fractional goes through
  * decimal partials (`sumScalarExact`) or is rounded far above the
  * float-error floor.
  */
object ArrayOpQueries {
  import ArrayHarness.oracleIndexedCte

  private def qty(s: SparkSession, d: String): DeisaArray =
    ArrayHarness.array1D(s, d, col("l_quantity"))

  /** Half-up decimal rounding, matching SQL ROUND (math.rint would be
    * half-even and diverge from the oracle on exact ties). */
  private def r(v: Double, digits: Int): Double =
    BigDecimal(v).setScale(digits, BigDecimal.RoundingMode.HALF_UP).toDouble

  val all: Seq[CatalogQuery] = Seq(

    // C1: global mean
    CatalogQuery("qc01_arr_mean", (s, d) =>
      qty(s, d).meanScalar().df.withColumnRenamed("value", "mean_qty"),
      Some("SELECT avg(l_quantity) AS mean_qty FROM lineitem")),

    // C2: global sum
    CatalogQuery("qc02_arr_sum", (s, d) =>
      qty(s, d).sumScalar().df.withColumnRenamed("value", "sum_qty"),
      Some("SELECT sum(l_quantity) AS sum_qty FROM lineitem")),

    // C3: min / max
    CatalogQuery("qc03_arr_minmax", (s, d) => {
      val a = qty(s, d)
      a.minScalar().df.withColumnRenamed("value", "min_qty")
        .crossJoin(a.maxScalar().df.withColumnRenamed("value", "max_qty"))
    }, Some("SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty FROM lineitem")),

    // C4: population std (ddof=0, numpy semantics)
    CatalogQuery("qc04_arr_std", (s, d) =>
      qty(s, d).stdScalar().df
        .select(round(col("value"), 6).as("std_qty")),
      Some("""SELECT round(sqrt(sum(l_quantity*l_quantity)/count(*)
             - (sum(l_quantity)/count(*))*(sum(l_quantity)/count(*))), 6) AS std_qty
             FROM lineitem""")),

    // C5: scalar arithmetic
    CatalogQuery("qc05_arr_scale", (s, d) =>
      ((qty(s, d) * 2.0) + 1.0).sumScalar().df.withColumnRenamed("value", "s"),
      Some("SELECT sum(l_quantity * 2 + 1) AS s FROM lineitem")),

    // C6: elementwise array x array (position equi-join) — integer-valued
    CatalogQuery("qc06_arr_elementwise_mul", (s, d) => {
      val a = ArrayHarness.array1D(s, d, col("l_quantity"))
      val b = ArrayHarness.array1D(s, d, col("l_linenumber"))
      (a * b).sumScalar().df.withColumnRenamed("value", "s")
    }, Some("SELECT sum(l_quantity * l_linenumber) AS s FROM lineitem")),

    // C7: slicing
    CatalogQuery("qc07_arr_slice", (s, d) => {
      val a = qty(s, d)
      val hi = math.min(30000, a.globalShape(0))
      a.slice(Seq((1000, hi))).sumScalar().df.withColumnRenamed("value", "s")
    }, Some(oracleIndexedCte("l_quantity") +
      " SELECT sum(v) AS s FROM e WHERE idx >= 1000 AND idx < least(30000, (SELECT count(*) FROM e))")),

    // C8: transpose — row 0 of the transpose = column 0 of the original
    CatalogQuery("qc08_arr_transpose", (s, d) => {
      val m = ArrayHarness.reshape2D(s, d, col("l_quantity"), width = 50)
      m.T.slice(Seq((0, 1), (0, m.globalShape(0))))
        .sumScalar().df.withColumnRenamed("value", "s")
    }, Some(oracleIndexedCte("l_quantity") +
      " SELECT sum(v) AS s FROM e WHERE idx % 50 = 0 AND idx < (SELECT (count(*)//50)*50 FROM e)")),

    // C9: matmul — Gram matrix of the (quantity, linenumber) column pair;
    // all entries are integer sums, hence exact
    CatalogQuery("qc09_arr_matmul", (s, d) => {
      val a = ArrayHarness.matrix(s, d, Seq(col("l_quantity"), col("l_linenumber")))
      val g = Linalg.matmul(a.T, a)
      import s.implicits._
      val nd = g.compute()
      Seq((nd(0, 0), nd(0, 1), nd(1, 0), nd(1, 1)))
        .toDF("qq", "ql", "lq", "ll")
    }, Some("""SELECT sum(l_quantity*l_quantity) AS qq, sum(l_quantity*l_linenumber) AS ql,
              sum(l_quantity*l_linenumber) AS lq, sum(l_linenumber*l_linenumber) AS ll
              FROM lineitem""")),

    // C10: clip
    CatalogQuery("qc10_arr_clip", (s, d) =>
      qty(s, d).clip(10, 40).sumScalar().df.withColumnRenamed("value", "s"),
      Some("SELECT sum(least(greatest(l_quantity, 10), 40)) AS s FROM lineitem")),

    // C11: where mask
    CatalogQuery("qc11_arr_where", (s, d) =>
      qty(s, d).whereGt(25, 0.0).sumScalar().df.withColumnRenamed("value", "s"),
      Some("SELECT sum(CASE WHEN l_quantity > 25 THEN l_quantity ELSE 0 END) AS s FROM lineitem")),

    // C12: sqrt + astype — fractional, so decimal-exact summation
    CatalogQuery("qc12_arr_sqrt", (s, d) =>
      qty(s, d).astype("float64").sqrtElems().sumScalarExact().df
        .withColumnRenamed("value", "s"),
      Some("SELECT CAST(sum(CAST(sqrt(l_quantity) AS DECIMAL(38,12))) AS DOUBLE) AS s FROM lineitem")),

    // C13: concatenate + slice across the seam
    CatalogQuery("qc13_arr_concat", (s, d) => {
      val a = qty(s, d)
      val n = a.globalShape(0)
      a.concatenate(Seq(a * 2.0), axis = 0)
        .slice(Seq((n - 10, n + 10)))
        .sumScalar().df.withColumnRenamed("value", "s")
    }, Some(oracleIndexedCte("l_quantity") +
      """ SELECT (SELECT sum(v) FROM e WHERE idx >= (SELECT count(*) FROM e) - 10)
         + (SELECT sum(2*v) FROM e WHERE idx < 10) AS s""")),

    // C14: axis reduction — column means of the (n/50) x 50 reshape
    CatalogQuery("qc14_arr_axis_mean", (s, d) => {
      val m = ArrayHarness.reshape2D(s, d, col("l_quantity"), width = 50)
      m.reduceAxis(0, "mean").df
        .select(posexplode(col("data")).as(Seq("colidx", "mean_v")))
        .select(col("colidx"), col("mean_v"))
        .orderBy(col("colidx"))
    }, Some(oracleIndexedCte("l_quantity") +
      """ SELECT CAST(idx % 50 AS INT) AS colidx, sum(v)/count(*) AS mean_v
         FROM e WHERE idx < (SELECT (count(*)//50)*50 FROM e)
         GROUP BY 1 ORDER BY colidx""")),

    // C15: SVD singular values of the mean-centered 2-column matrix
    CatalogQuery("qc15_arr_svd", (s, d) => {
      val a = ArrayHarness.matrix(s, d, Seq(col("l_quantity"), col("l_linenumber")))
      val centered = a.minusBroadcast(a.reduceAxis(0, "mean"), axis = 0)
      val sv = Linalg.singularValues(centered)
      import s.implicits._
      Seq((r(sv(0), 4), r(sv(1), 4))).toDF("sigma1", "sigma2")
    }, Some("""
      WITH g AS (
        SELECT sum(l_quantity*l_quantity) - sum(l_quantity)*sum(l_quantity)/count(*) AS a,
               sum(l_quantity*l_linenumber) - sum(l_quantity)*sum(l_linenumber)/count(*) AS b,
               sum(l_linenumber*l_linenumber) - sum(l_linenumber)*sum(l_linenumber)/count(*) AS c
        FROM lineitem)
      SELECT round(sqrt((a + c + sqrt((a - c)*(a - c) + 4*b*b)) / 2), 4) AS sigma1,
             round(sqrt(greatest((a + c - sqrt((a - c)*(a - c) + 4*b*b)) / 2, 0)), 4) AS sigma2
      FROM g""")),

    // C12b: astype VALUE semantics — sqrt gives fractional values, the
    // int32 cast truncates them toward zero (numpy astype), and the sum of
    // the truncated integers is exact in double. Oracle uses trunc()
    // explicitly: DuckDB's CAST(DOUBLE AS INT) rounds where Spark/numpy
    // truncate.
    CatalogQuery("qc17_arr_astype", (s, d) =>
      qty(s, d).sqrtElems().astype("int32").sumScalar().df
        .withColumnRenamed("value", "s"),
      Some("SELECT CAST(sum(CAST(trunc(sqrt(l_quantity)) AS BIGINT)) AS DOUBLE) AS s FROM lineitem")),

    // C16: FFT of the first 8 elements (single chunk; DFT closed form)
    CatalogQuery("qc16_arr_fft", (s, d) => {
      val a = qty(s, d).slice(Seq((0, 8)))
      val (re, im) = FFT.fft(a.rechunk(Seq(8)), axis = 0)
      val reN = re.compute(); val imN = im.compute()
      import s.implicits._
      (0 until 8).map(k => (k, r(reN.data(k), 6), r(imN.data(k), 6)))
        .toDF("k", "re", "im")
    }, Some(oracleIndexedCte("l_quantity") + """
      , f AS (SELECT * FROM e WHERE idx < 8)
      SELECT k, round(sum(v * cos(-2*pi()*k*idx/8)), 6) + 0 AS re,
             round(sum(v * sin(-2*pi()*k*idx/8)), 6) + 0 AS im
      FROM f CROSS JOIN (SELECT unnest(range(8)) AS k) ks
      GROUP BY k ORDER BY k"""))
  )
}
