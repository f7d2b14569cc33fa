package graft.functions

import graft.functions.expressions.{BloomMightContain, LocalBloomBits, MinHashSig, NfcNormalize, PqAdc, ShingleHash60, SignSketch, SimHashPack, SortedLongIntersectCount, VecDot, VecDotLong, VecL2Sq}
import graft.pipeline.TextOps
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Expression, ExpressionInfo, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizations that exploit the CONTRACTS of graft's custom
  * expressions — knowledge the built-in optimizer cannot have:
  *
  *  - [[ShingleHash60]] output is sorted and duplicate-free, so a user's
  *    defensive `array_distinct` over it is a no-op (each elision removes a
  *    full interpreted hash-set pass per row);
  *  - `SortedLongIntersectCount(a, a)` is `size(a)` for any deterministic
  *    `a` (self-intersection of a set).
  *
  * This is SURVEY §7.1 preference-order case (c): whole-plan semantics via
  * `Rule[LogicalPlan]`, registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) or, on a live
  * session, `spark.experimental.extraOptimizations`.
  */
object GraftOptimizations extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayDistinct(s: ShingleHash60) => s
    case SortedLongIntersectCount(a, b) if a.deterministic && a.semanticEquals(b) =>
      Size(a)
  }
}

/** Session-extension entry point: register the graft optimizer rules AND
  * the custom expressions as SQL functions at session build time
  * (`.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `builder.withExtensions`) — a SQL-only user gets the same codegen'd
  * expressions the Scala API uses:
  *
  * {{{
  *   SELECT doc_id, shingle_hash60(text, 4)          -- sorted 60-bit shingle set
  *   SELECT minhash_sig(hs, 8)                       -- affine-perm minhash signature
  *   SELECT sorted_intersect_count(a, b)             -- O(n+m) set intersection size
  *   SELECT nfc_normalize(s)                         -- Unicode NFC (ASCII fast path)
  *   SELECT bloom_might_contain(h, bits, 4)          -- Bloom probe (bits: constant array)
  *   SELECT sign_sketch(v, 0, 32)                    -- sign-bit half-sketch (binary ANN)
  *   SELECT vec_dot(x, y)                            -- fused dot product (ANN hot kernel)
  *   SELECT vec_dot_long(x, y)                       -- integer twin (int8-quantized ANN)
  *   SELECT vec_l2sq(x, y)                           -- fused squared L2 (cell assignment)
  *   SELECT simhash_pack(hs, 16)                     -- one-pass simhash bit vote
  *   SELECT pq_adc(codes, tbl)                       -- PQ asymmetric-distance lookup
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => GraftOptimizations)
    GraftExtensions.sqlFunctions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  /** The SQL function surface, one descriptor per custom expression —
    * shared by the extension injection and by live-session registration
    * (`spark.sessionState.functionRegistry.registerFunction`), so tests
    * exercise exactly what a configured session gets. */
  val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("shingle_hash60"),
      info(classOf[ShingleHash60].getName, "shingle_hash60"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hash60(text, n) takes 2 arguments")
        ShingleHash60(args.head, intLiteral(args(1), "shingle_hash60 n"))
      }),
    (FunctionIdentifier("minhash_sig"),
      info(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(hashes, num_perms) takes 2 arguments")
        val p = intLiteral(args(1), "minhash_sig num_perms")
        MinHashSig(args.head, (0 until p).map(TextOps.minhashA).toArray,
          (0 until p).map(TextOps.minhashB).toArray, TextOps.MinhashP)
      }),
    (FunctionIdentifier("sorted_intersect_count"),
      info(classOf[SortedLongIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count(a, b) takes 2 arguments")
        SortedLongIntersectCount(args.head, args(1))
      }),
    (FunctionIdentifier("nfc_normalize"),
      info(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(s) takes 1 argument")
        NfcNormalize(args.head)
      }),
    (FunctionIdentifier("bloom_might_contain"),
      info(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bloom_might_contain(h, bits, k) takes 3 arguments")
        // the filter is a constant of the query (built once, then probed
        // per row) — a non-foldable bits argument would re-evaluate the
        // whole array every row
        require(args(1).foldable,
          "bloom_might_contain bits must be a constant array<bigint>")
        val bits = args(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
        val mBits = bits.length * 64
        require(bits.nonEmpty && (mBits & (mBits - 1)) == 0,
          s"bloom filter word count must be a power of two, got ${bits.length}")
        BloomMightContain(args.head, LocalBloomBits(bits),
          intLiteral(args(2), "bloom_might_contain k"))
      }),
    (FunctionIdentifier("sign_sketch"),
      info(classOf[SignSketch].getName, "sign_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "sign_sketch(v, start, len) takes 3 arguments")
        SignSketch(args.head, intLiteral(args(1), "sign_sketch start"),
          intLiteral(args(2), "sign_sketch len"))
      }),
    (FunctionIdentifier("vec_dot"),
      info(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(x, y) takes 2 arguments")
        VecDot(args.head, args(1))
      }),
    (FunctionIdentifier("vec_dot_long"),
      info(classOf[VecDotLong].getName, "vec_dot_long"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot_long(x, y) takes 2 arguments")
        VecDotLong(args.head, args(1))
      }),
    (FunctionIdentifier("vec_l2sq"),
      info(classOf[VecL2Sq].getName, "vec_l2sq"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_l2sq(x, y) takes 2 arguments")
        VecL2Sq(args.head, args(1))
      }),
    (FunctionIdentifier("simhash_pack"),
      info(classOf[SimHashPack].getName, "simhash_pack"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "simhash_pack(hashes, bits) takes 2 arguments")
        SimHashPack(args.head, intLiteral(args(1), "simhash_pack bits"))
      }),
    (FunctionIdentifier("pq_adc"),
      info(classOf[PqAdc].getName, "pq_adc"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "pq_adc(codes, table) takes 2 arguments")
        PqAdc(args.head, args(1))
      }))

  private def info(className: String, name: String) =
    new ExpressionInfo(className, name)

  /** The arity-style parameters (shingle width, permutation count) must be
    * literals — they size codegen'd loops, not per-row data. */
  private def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
