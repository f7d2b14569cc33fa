package graft.relational

import graft.core.DeisaArray
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Builds chunked [[DeisaArray]]s out of relational parquet tables so the
  * array-operator surface (SURVEY §2.C) can be conformance-checked against
  * a SQL oracle: elements are table values in a deterministic total order,
  * chunked into fixed-size blocks.
  *
  * Ranking is the qp11/qp15 two-phase bucketed form — fixed-width
  * l_orderkey-range buckets (monotone in the primary sort key, so bucket
  * order IS global order), per-bucket counts folded into base offsets
  * (bounded B-row driver collect, broadcast back), then an in-bucket
  * row_number PARTITIONED BY bucket. Never an unpartitioned global window:
  * even though production arrays arrive pre-chunked through the ingest
  * plane, the conformance harness itself must hold the scale shape it
  * checks everywhere else (`PlanQualitySpec` pins it).
  */
object ArrayHarness {

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")

  private val orderCols = Seq(col("l_orderkey"), col("l_linenumber"))
  private val RankBuckets = 32

  /** Two-phase dense 0-based rank of (l_orderkey, l_linenumber) over
    * `df`, carrying `value` as column `name`: (name, idx). */
  private def rankedBy(spark: SparkSession, df: DataFrame, value: Column,
      name: String): DataFrame = {
    import spark.implicits._
    val stats = df.agg(min(col("l_orderkey")).as("lo"), max(col("l_orderkey")).as("hi")).head()
    if (stats.isNullAt(0))
      return df.select(value.as(name), lit(0L).as("idx")).limit(0)
    val lo = stats.getLong(0)
    val width = math.max(1L, (stats.getLong(1) - lo) / RankBuckets + 1)
    val keyed = df.select(value.as(name) +: orderCols: _*)
      .withColumn("bucket", expr(s"(l_orderkey - ${lo}L) div ${width}L"))
    // phase 1: per-bucket counts -> exclusive base offsets (<= B rows)
    var acc = 0L
    val bases = keyed.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .orderBy(col("bucket")).collect()
      .map { r => val b = r.getLong(0); val base = acc; acc += r.getLong(1); (b, base) }
      .toSeq
    // phase 2: in-bucket rank + broadcast base offset
    val w = Window.partitionBy(col("bucket")).orderBy(orderCols: _*)
    keyed.join(broadcast(bases.toDF("bucket", "base")), Seq("bucket"))
      .withColumn("idx", col("base") + row_number().over(w) - 1)
      .select(col(name), col("idx"))
  }

  /** Indexed element stream: (idx, v) with idx = dense 0-based rank of
    * (l_orderkey, l_linenumber). Persisted so the count() the builders
    * need doesn't re-run the ranking a second time when the blocks
    * materialize (Verify/Bench clear the cache between queries). */
  def indexed(spark: SparkSession, dir: String, value: Column): DataFrame =
    rankedBy(spark, lineitem(spark, dir), value.cast("double"), "v").persist()

  /** 1-D array of `value` over all lineitem rows, chunk size `chunk`. */
  def array1D(spark: SparkSession, dir: String, value: Column,
      chunk: Int = 8192): DeisaArray = {
    val idx = indexed(spark, dir, value)
    val n = idx.count().toInt
    val blocks = idx
      .groupBy((col("idx") / chunk).cast("int").as("cid"))
      .agg(array_sort(collect_list(struct(col("idx"), col("v")))).as("pairs"))
      .select(
        array(col("cid") * chunk).as("pos"),
        array(size(col("pairs"))).as("shape"),
        transform(col("pairs"), p => p.getField("v")).as("data"))
    DeisaArray(blocks, Seq(n), 0L, "lineitem1d")
  }

  /** 2-D (rows × `cols.length`) matrix: row i holds `cols` of the i-th
    * element in the total order; chunked into `chunkRows`-row blocks.
    * Row count is truncated to a multiple of nothing (every row kept). */
  def matrix(spark: SparkSession, dir: String, cols: Seq[Column],
      chunkRows: Int = 8192): DeisaArray = {
    val k = cols.length
    val idx = rankedBy(spark, lineitem(spark, dir),
      array(cols.map(_.cast("double")): _*), "row").persist()
    val n = idx.count().toInt
    val blocks = idx
      .groupBy((col("idx") / chunkRows).cast("int").as("cid"))
      .agg(array_sort(collect_list(struct(col("idx"), col("row")))).as("pairs"))
      .select(
        array(col("cid") * chunkRows, lit(0)).as("pos"),
        array(size(col("pairs")), lit(k)).as("shape"),
        flatten(transform(col("pairs"), p => p.getField("row"))).as("data"))
    DeisaArray(blocks, Seq(n, k), 0L, "lineitem2d")
  }

  /** 2-D reshape of a single column to (n/width) × width (trailing partial
    * row dropped), chunked into blocks of `chunkRows` rows. */
  def reshape2D(spark: SparkSession, dir: String, value: Column, width: Int,
      chunkRows: Int = 256): DeisaArray = {
    val idx = indexed(spark, dir, value)
    val n = idx.count().toInt
    val rows = n / width
    val keep = idx.filter(col("idx") < rows * width)
    val blocks = keep
      .groupBy((col("idx") / (chunkRows.toLong * width)).cast("int").as("cid"))
      .agg(array_sort(collect_list(struct(col("idx"), col("v")))).as("pairs"))
      .select(
        array(col("cid") * chunkRows, lit(0)).as("pos"),
        array((size(col("pairs")) / width).cast("int"), lit(width)).as("shape"),
        transform(col("pairs"), p => p.getField("v")).as("data"))
    DeisaArray(blocks, Seq(rows, width), 0L, "lineitem2d")
  }

  /** The shared oracle CTE: same total order, same indexing. */
  def oracleIndexedCte(value: String): String =
    s"WITH e AS (SELECT CAST($value AS DOUBLE) v, " +
      "row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS idx FROM lineitem)"
}
