package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared query: the Spark plan builder and (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same tables. */
final case class CatalogQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object QueryHelpers {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events-shaped `ts` column to a microsecond
    * TimestampType, whatever encoding the parquet reader produced.
    * The testdata's `ts` has been written both as TIMESTAMP(NANOS)
    * (earlier rounds — Spark reads it as a raw nano long under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (current — Spark infers
    * TIMESTAMP_NTZ). Branching on the resolved type rather than assuming
    * one encoding keeps every consumer working across regenerations;
    * all three paths land on identical micros (verified bit-exact
    * against DuckDB's floor(epoch_ns/1000) view, which is what every
    * oracle computes). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: `/` would go through double and lose sub-µs
        // bits for epoch-nano values beyond 2^53
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ wall-clock micros == epoch micros under the UTC session zone
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already TimestampType
    }

  /** The events table with `ts` normalized to microsecond timestamps —
    * DuckDB's TIMESTAMP is microseconds too, so semantics line up. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(table(spark, dir, "events"))

  /** Order-independent exact sum of a float expression: per-row cast to
    * Decimal(38,6) then decimal-sum — bit-identical across engines and
    * partitionings (float sums would differ in the last ulps depending on
    * reduce order). Final cast back to double for a stable output type. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")

  /** Oracle-side twin of [[dsum]]. */
  def oSum(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE)"

  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
  def oDateStr(expr: String): String = s"strftime($expr, '%Y-%m-%d')"
}

/** Relational surface: scans/filters/projections, joins of every flavor the
  * checklist asks for (broadcast/shuffle equi, semi, anti, as-of), hash
  * aggregation, rollup, distinct, window functions, top-k, set ops, and
  * event-time bucketing. The reference has none of these (SURVEY §2.C
  * "deliberately absent" table) — they're the relational surface our engine
  * adds, and every one is a plain Catalyst plan so pushdown/AQE/broadcast
  * come from the optimizer, not hand-scheduling.
  */
object RelationalQueries {
  import QueryHelpers._

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery("q01_pricing_summary", (s, d) => {
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${oSum("l_quantity")} AS sum_qty,
        ${oSum("l_extendedprice")} AS sum_base_price,
        ${oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        ${oSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        ${oSum("l_quantity")} / count(*) AS avg_qty,
        count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""), headline = true),

    CatalogQuery("q02_revenue_by_nation", (s, d) => {
      val li = table(s, d, "lineitem")
      val o = table(s, d, "orders")
      val c = table(s, d, "customer")
      val n = table(s, d, "nation")
      val r = table(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }, Some(s"""
      SELECT r_name, n_name,
        ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""), headline = true),

    CatalogQuery("q03_topk_orders", (s, d) => {
      val li = table(s, d, "lineitem")
      val o = table(s, d, "orders")
      // top-k FIRST (TakeOrderedAndProject over the aggregate), then join
      // the 10 surviving keys against orders — the join touches 10 rows
      // instead of every order
      val top = li.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
      broadcast(top).join(o, col("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey"), col("revenue"), dateStr(col("o_orderdate")).as("orderdate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
    }, Some(s"""
      SELECT o_orderkey, revenue, ${oDateStr("o_orderdate")} AS orderdate
      FROM (SELECT l_orderkey, ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
            FROM lineitem GROUP BY l_orderkey) r
      JOIN orders ON l_orderkey = o_orderkey
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""), headline = true),

    CatalogQuery("q04_priority_semijoin", (s, d) => {
      val o = table(s, d, "orders")
      val li = table(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      val oo = o.join(li,
        o("o_orderkey") === li("l_orderkey") && li("l_shipdate") > o("o_orderdate"),
        "left_semi")
      oo.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    CatalogQuery("q05_filter_project", (s, d) => {
      table(s, d, "lineitem")
        .filter(col("l_quantity") >= 48 && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      FROM lineitem WHERE l_quantity >= 48 AND l_discount > 0.05
      ORDER BY l_orderkey, l_linenumber""")),

    CatalogQuery("q06_selective_revenue", (s, d) => {
      table(s, d, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }, Some(s"""
      SELECT ${oSum("l_extendedprice * l_discount")} AS revenue, count(*) AS n
      FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
      headline = true),

    CatalogQuery("q07_window_rank", (s, d) => {
      val o = table(s, d, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }, Some("""
      SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
        FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"""), headline = true),

    CatalogQuery("q08_anti_join", (s, d) => {
      val c = table(s, d, "customer")
      val o = table(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")),

    CatalogQuery("q09_distinct_agg", (s, d) => {
      table(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
        count(lit(1)).as("n_rows"))
    }, Some("""
      SELECT count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
             count(*) AS n_rows
      FROM lineitem""")),

    CatalogQuery("q10_rollup", (s, d) => {
      table(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }, Some(s"""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        ${oSum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    CatalogQuery("q11_events_hourly", (s, d) => {
      events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    }, Some(s"""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        count(*) AS n, ${oSum("value")} AS total_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""), headline = true),

    CatalogQuery("q12_asof_join", (s, d) => {
      // as-of: for each event, the latest order of that user at-or-before
      // ts. Union-merge formulation: both streams union into one per-user
      // timeline and the as-of match is last_value(ignore nulls) over the
      // ordered prefix frame — intermediate is O(|events| + |orders|) per
      // user, where the equi-join + row_number plan materializes
      // |events(u)| × |orders(u)| rows (a hot user at 100× explodes it).
      // At equal instants order rows sort before event rows (kind 0 < 1),
      // matching the join's `<=`; among equal-date orders the largest
      // o_orderkey sorts last, matching the DESC tie-break.
      val e = events(s, d)
      val o = table(s, d, "orders")
      val oRows = o.select(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("t"), lit(0).as("kind"),
        col("o_orderkey").as("okey"), lit(null).cast("long").as("event_id"))
      val eRows = e.select(col("user_id"),
        col("ts").as("t"), lit(1).as("kind"),
        lit(null).cast("long").as("okey"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("kind"), col("okey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      oRows.union(eRows)
        .withColumn("asof_orderkey", last(col("okey"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("asof_orderkey"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, asof_orderkey FROM (
        SELECT event_id, o_orderkey AS asof_orderkey,
          row_number() OVER (PARTITION BY event_id
            ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC NULLS LAST) rn
        FROM events LEFT JOIN orders
          ON user_id = o_custkey AND o_orderdate <= ts) t
      WHERE rn = 1 ORDER BY event_id"""), headline = true),

    CatalogQuery("q14_cube", (s, d) => {
      table(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_discount")).as("sum_disc"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }, Some(s"""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        ${oSum("l_discount")} AS sum_disc
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    CatalogQuery("q15_date_functions", (s, d) => {
      table(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total"),
          countDistinct(dayofmonth(col("o_orderdate"))).as("active_days"))
        .orderBy(col("yr"), col("mo"))
    }, Some(s"""
      SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        count(*) AS n_orders, ${oSum("o_totalprice")} AS total,
        count(DISTINCT day(o_orderdate)) AS active_days
      FROM orders GROUP BY 1, 2 ORDER BY yr, mo""")),

    CatalogQuery("q16_correlated_subquery", (s, d) => {
      // orders strictly above their customer's average order value
      val o = table(s, d, "orders")
      val avgPer = o.groupBy(col("o_custkey").as("ck"))
        .agg((sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          / count(lit(1))).as("avg_price"))
      o.join(avgPer, col("o_custkey") === col("ck"))
        .filter(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey FROM orders o1
      WHERE o_totalprice > (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)
      ORDER BY o_orderkey""")),

    CatalogQuery("q17_approx_distinct", (s, d) => {
      // HLL sketch + exact control. The sketch VALUE is engine-specific, so
      // the checkable output is (exact count, bounded-error boolean): Spark's
      // HLL++ is deterministic per dataset and its relative error at the
      // default rsd=0.05 stays within 5%; the oracle emits the exact count
      // and literal TRUE, making the row hash-checkable without pinning the
      // sketch internals.
      table(s, d, "lineitem")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(
          col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double")
            / col("exact_parts") <= 0.05).as("within_5pct"))
    }, Some("""
      SELECT count(DISTINCT l_partkey) AS exact_parts, TRUE AS within_5pct
      FROM lineitem""")),

    CatalogQuery("q18_sessionize", (s, d) => {
      // session windows via gaps-and-islands: a new session starts after
      // >30 min of inactivity per user; Structured Streaming's
      // session_window gives the same semantics online, this is the
      // batch/replay formulation with an exact SQL oracle
      val e = events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sessions = e
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(byUser))
      sessions.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .orderBy(col("user_id"), col("session_id"))
    }, Some(s"""
      WITH marked AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        -- CAST: DuckDB widens windowed integer sum() to HUGEINT, Spark emits
        -- BIGINT, and the driver's hash is type-sensitive — values are
        -- identical, only the declared type differed
        SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM marked)
      SELECT user_id, session_id, count(*) AS n_events,
        ${oSum("value")} AS session_value,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
      FROM sessions GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""), headline = true),

    CatalogQuery("q19_quantiles", (s, d) => {
      // exact interpolated percentiles + a sketch with a bounded-error
      // contract, q17-style: the sketch VALUE is engine-specific, the bound
      // is checkable. Scale note: exact percentile materializes each
      // group's value multiset in the aggregation buffer — this query is
      // the GATE-SF CONTROL only; q19b below is the 100 TB quantile path
      // (bounded-memory sketch, contract checked without ever computing
      // the exact percentile).
      // round(…, 4) absorbs last-ulp interpolation differences between
      // engines (values ~1e5, ulp ~1e-11).
      table(s, d, "lineitem")
        .agg(
          round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
          round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90"),
          percentile(col("l_extendedprice"), lit(0.5)).as("exact50"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx50"))
        .select(col("p50"), col("p90"),
          (abs(col("approx50") - col("exact50")) / col("exact50") <= 0.01)
            .as("approx_within_1pct"))
    }, Some("""
      SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             TRUE AS approx_within_1pct
      FROM lineitem""")),

    CatalogQuery("q19b_grouped_quantiles", (s, d) => {
      // The 100 TB quantile path: GROUPED percentile_approx — a mergeable
      // bounded-memory sketch (Greenwald-Khanna-style summary of at most
      // `accuracy` tuples per group) with map-side partials, where q19's
      // exact percentile holds each group's whole value multiset in one
      // aggregation buffer (one hot group over 100 TB OOMs the executor).
      // The contract is checked WITHOUT ever computing the exact
      // percentile: percentile_approx(accuracy=10000) guarantees the
      // returned value's rank is within n/10000 of the n/2 target, so a
      // second distributive aggregation counts values strictly below /
      // at-or-below the sketch's answer and asserts the target rank lies
      // inside that window (±0.5% slack ≫ the 0.01% guarantee). Every
      // aggregation buffer in the plan is O(accuracy) or O(1); the oracle
      // emits the exact group geometry + literal TRUE (q17 pattern).
      val Eps = 0.005
      val li = table(s, d, "lineitem").select(col("l_returnflag"), col("l_extendedprice"))
      val sketch = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a50"),
          count(lit(1)).as("n"))
      li.join(broadcast(sketch), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(first(col("n")).as("n_rows"),
          sum(when(col("l_extendedprice") < col("a50"), 1L).otherwise(0L)).as("n_lt"),
          sum(when(col("l_extendedprice") <= col("a50"), 1L).otherwise(0L)).as("n_le"))
        .select(col("l_returnflag"), col("n_rows"),
          (col("n_lt") <= (lit(0.5) + Eps) * col("n_rows") &&
            col("n_le") >= (lit(0.5) - Eps) * col("n_rows")).as("p50_rank_within_eps"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag, count(*) AS n_rows, TRUE AS p50_rank_within_eps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    CatalogQuery("q20_grouping_sets", (s, d) => {
      // GROUPING SETS — the general form rollup/cube specialize; exercised
      // through the SQL surface (same Catalyst Expand operator underneath)
      table(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(s"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }, Some(s"""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        ${oSum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    CatalogQuery("q21_range_join", (s, d) => {
      // pure range join (no equi key): events × events on
      // |ts_a - ts_b| <= 5 min — "how many other events landed near mine".
      // Naive is O(n²); the scale plan BINS the range dimension: each right
      // row posts to the 3 band-width bins its window can touch, left rows
      // join their own bin (an EQUI-join), the exact predicate filters
      // inside the bin. Shuffle is keyed; data touched is 4|events|, and
      // bin width tracks band width so bins stay small. DuckDB's IEJoin
      // computes the same predicate natively for the oracle.
      val BandUs = 300000000L // 5 minutes
      val e = events(s, d).select(col("event_id"), unix_micros(col("ts")).as("eus"))
      val a = e.withColumn("bin", floor(col("eus") / BandUs))
      val b = e.select(col("event_id").as("other_id"), col("eus").as("ous"))
        .withColumn("obin", floor(col("ous") / BandUs))
        .withColumn("bin", explode(array(col("obin") - 1, col("obin"), col("obin") + 1)))
        .drop("obin")
      a.join(b, Seq("bin"))
        .filter(col("event_id") =!= col("other_id") &&
          abs(col("eus") - col("ous")) <= BandUs)
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_neighbors"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT a.event_id, count(*) AS n_neighbors
      FROM events a JOIN events b
        ON a.event_id <> b.event_id
        AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
      GROUP BY a.event_id ORDER BY a.event_id""")),

    CatalogQuery("q22_pivot", (s, d) => {
      // PIVOT — wide reshaping with an EXPLICIT value list: with the pivot
      // values declared, Spark plans a single hash aggregation whose
      // buffer holds one slot per (value × agg) — no second pass to
      // discover values (the two-phase `pivot(col)` overload would scan
      // once just to enumerate them — never acceptable over 100 TB) and
      // no Expand blow-up. Decimal partials keep the float sums
      // engine-exact; the oracle mirrors the pivot as CASE aggregation
      // (semantically identical, column names aligned).
      table(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum(col("l_quantity")))
        .select(col("l_linestatus"), col("A").as("qty_a"),
          col("N").as("qty_n"), col("R").as("qty_r"))
        .orderBy(col("l_linestatus"))
    }, Some(s"""
      SELECT l_linestatus,
        ${oSum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_a,
        ${oSum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_n,
        ${oSum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_r
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    CatalogQuery("q13_set_ops", (s, d) => {
      val c = table(s, d, "customer").select(col("c_nationkey").as("k"))
      val sup = table(s, d, "supplier").select(col("s_nationkey").as("k"))
      c.except(sup)
        .withColumnRenamed("k", "nationkey")
        .orderBy(col("nationkey"))
    }, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey""")),

    CatalogQuery("q23_moving_window", (s, d) => {
      // Event-time RANGE-frame moving aggregates — "each event's trailing
      // one-hour activity per user", the feature-engineering window shape
      // (distinct from q07's row-frame rank and q18's gaps-and-islands).
      // RANGE frames include ALL tie peers, so the result is deterministic
      // under duplicate timestamps. Scale: the window partitions by
      // user_id (bounded per-user task, never a global sort) and the sum
      // runs in Decimal(38,6) so the frame's float additions are exact on
      // both engines whatever the evaluation order.
      val e = events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rangeBetween(-3600000000L, 0L)
      e.select(col("event_id"), col("user_id"), col("tus"),
          count(lit(1)).over(w).as("n_hour"),
          sum(col("value").cast(DecimalType(38, 6))).over(w)
            .cast("double").as("sum_hour"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, user_id, tus,
        CAST(count(*) OVER win AS BIGINT) AS n_hour,
        CAST(sum(CAST(value AS DECIMAL(38,6))) OVER win AS DOUBLE) AS sum_hour
      FROM (SELECT event_id, user_id, epoch_us(ts) AS tus, value FROM events) e
      WINDOW win AS (PARTITION BY user_id ORDER BY tus
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))
  )
}
