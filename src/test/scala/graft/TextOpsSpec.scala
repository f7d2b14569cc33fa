package graft

import graft.pipeline.TextOps
import graft.streaming.FeedbackService
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the text operators on inputs the synthetic corpus
  * never produces (non-English markers, ties, empties), plus feedback
  * thread-safety. */
class TextOpsSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark
  import spark.implicits._

  private def predict(texts: String*): Seq[String] =
    texts.toDF("text").select(TextOps.langId(col("text"))).collect()
      .map(_.getString(0)).toSeq

  test("langId picks each language from its markers") {
    assert(predict(
      "the cat and the dog of the house",
      "le chat et la maison et le chien",
      "der hund und die katze und der mann",
      "el perro que los gatos el dia",
      "no markers whatsoever here") ==
      Seq("en", "fr", "de", "es", "und"))
  }

  test("langId ties break by language code ascending") {
    // one 'en' marker (' the ') and one 'de' marker (' der '): de < en
    assert(predict("x the y der z") == Seq("de"))
  }

  test("occurrences counts non-overlapping matches incl. regex metachars") {
    val n = Seq("a.b a.b a.b").toDF("t")
      .select(TextOps.occurrences(col("t"), "a.b")).first().getLong(0)
    assert(n == 3)
    // the dot must be literal, not a regex wildcard
    val m = Seq("axb ayb").toDF("t")
      .select(TextOps.occurrences(col("t"), "a.b")).first().getLong(0)
    assert(m == 0)
  }

  test("simhash is deterministic and token-order independent") {
    val h = Seq("alpha beta gamma", "gamma beta  alpha").toDF("t")
      .select(TextOps.simhash(col("t"), 16)).collect().map(_.getLong(0))
    assert(h(0) == h(1), "distinct-token simhash must ignore order/multiplicity")
  }

  test("feedback service is thread-safe under concurrent writers") {
    val fb = new FeedbackService(1000)
    val threads = (0 until 8).map { tid =>
      new Thread(() => {
        for (t <- 0 until 100)
          fb.set(s"key-$tid", s"v$t", t.toLong)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    (0 until 8).foreach { tid =>
      assert(fb.getAll(s"key-$tid").size == 100)
      assert(fb.get(s"key-$tid", 57).contains("v57"))
    }
  }
}
