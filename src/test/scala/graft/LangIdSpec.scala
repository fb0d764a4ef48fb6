package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** LID correctness on planted multilingual texts — the driver documents
  * table's lang labels are synthetic (all rows are English-vocabulary
  * prose regardless of label; verified in round 2), so the oracle rows
  * only prove engine parity. This spec proves the operator: each planted
  * language must be recovered, including char-level zh.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val planted = Seq(
    ("en1", "en", "the cat sat on the mat and it was happy with the result"),
    ("de1", "de", "der hund und die katze sind nicht mit der maus auf ein dach"),
    ("fr1", "fr", "le chat est dans la maison avec les amis pour une fête"),
    ("es1", "es", "el perro y la casa son un lugar para los amigos en madrid"),
    ("zh1", "zh", "这是一个中文文档 我们在这里写了很多汉字 他说这是真的 不是假的"),
    ("zh2", "zh", "机器学习模型需要大量的训练数据 数据质量是关键因素"))

  test("langId recovers each planted language incl. char-level zh") {
    val docs = planted.map { case (id, _, text) => (id, text) }.toDF("doc_id", "text")
    val preds = TextOps.langId(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    planted.foreach { case (id, lang, _) =>
      assert(preds(id) == lang, s"$id expected $lang got ${preds(id)}")
    }
  }

  test("zh OOV runs per CJK char; latin per token") {
    val docs = planted.map { case (id, _, text) => (id, text) }.toDF("doc_id", "text")
    val rows = TextOps.commonTokens(docs).collect()
      .map(r => r.getAs[String]("doc_id") ->
        (r.getAs[String]("lang_pred"), r.getAs[Double]("oov_rate"))).toMap
    assert(rows("zh1")._1 == "zh")
    assert(rows("zh1")._2 < 1.0, "zh common function chars must register")
    assert(rows("en1")._1 == "en" && rows("en1")._2 < 1.0)
  }

  test("confusion matrix totals match the table") {
    val docs = planted.map { case (id, lang, text) => (id, text, lang) }
      .toDF("doc_id", "text", "lang")
    val m = TextOps.langIdConfusion(docs).collect()
    assert(m.map(_.getAs[Long]("n")).sum == planted.size)
    // diagonal only: every planted row classified correctly
    assert(m.forall(r => r.getAs[String]("lang") == r.getAs[String]("lang_pred")))
  }
}
