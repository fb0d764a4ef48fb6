package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{LangProfiles, LangScorer, TextOps}

/** LID correctness on planted multilingual texts — the driver documents
  * table's lang labels are synthetic (all rows are English-vocabulary
  * prose regardless of label; verified in round 2), so the oracle rows
  * only prove engine parity. This spec proves the operator itself: the
  * round-3 n-gram scorer must recover ≥ 12 real languages, including
  * non-Latin scripts, replacing the round-2 5-language stopword cap.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val planted = Seq(
    ("en1", "en", "the cat sat on the mat and it was happy with the result of the game"),
    ("de1", "de", "der hund und die katze sind nicht mit der maus auf dem dach des hauses"),
    ("fr1", "fr", "le chat est dans la maison avec les amis pour une fête ce soir à paris"),
    ("es1", "es", "el perro y la casa son un lugar para los amigos en madrid durante el verano"),
    ("pt1", "pt", "o cachorro está na casa com os amigos para uma festa em são paulo hoje"),
    ("it1", "it", "il gatto è nella casa con gli amici per una festa della città questa sera"),
    ("nl1", "nl", "de hond en de kat zijn niet met de muis op het dak van het huis vandaag"),
    ("sv1", "sv", "hunden och katten är inte med musen på taket av huset i dag och i morgon"),
    ("pl1", "pl", "pies i kot nie są z myszą na dachu domu w tym tygodniu ale będą jutro"),
    ("tr1", "tr", "kedi ve köpek bugün evin çatısında değil ama yarın orada olacaklar birlikte"),
    ("ru1", "ru", "это очень хорошо что мы знаем об этом потому что собака и кошка были в которых комнатах этого дома"),
    ("el1", "el", "ο σκύλος και η γάτα δεν είναι στη στέγη του σπιτιού σήμερα αλλά αύριο θα είναι"),
    ("ar1", "ar", "الكلب والقطة ليسا على سطح المنزل اليوم ولكنهما سيكونان هناك غدا معا"),
    ("he1", "he", "הכלב והחתול לא נמצאים על גג הבית היום אבל מחר הם יהיו שם יחד"),
    ("ja1", "ja", "犬と猫は今日家の屋根にいませんが明日はそこに一緒にいるでしょう これは日本語の文章です"),
    ("ko1", "ko", "개와 고양이는 오늘 집 지붕에 없지만 내일 그들은 함께 거기에 있을 것입니다"),
    ("th1", "th", "สุนัขและแมวไม่ได้อยู่บนหลังคาบ้านวันนี้ แต่พรุ่งนี้พวกเขาจะอยู่ที่นั่นด้วยกัน"),
    ("zh1", "zh", "这是一个中文文档 我们在这里写了很多汉字 他说这是真的 不是假的"),
    ("zh2", "zh", "机器学习模型需要大量的训练数据 数据质量是关键因素"),
    ("vi1", "vi", "con chó và con mèo không ở trên mái nhà hôm nay nhưng ngày mai chúng sẽ ở đó"),
    ("fi1", "fi", "koira ja kissa eivät ole talon katolla tänään mutta huomenna ne ovat siellä yhdessä"),
    ("hi1", "hi", "कुत्ता और बिल्ली आज घर की छत पर नहीं हैं लेकिन कल वे वहाँ एक साथ होंगे"))

  test("n-gram scorer recovers 22 planted languages incl. non-Latin scripts") {
    planted.foreach { case (id, lang, text) =>
      val (pred, nGrams, _) = LangScorer.score(text)
      assert(nGrams > 0, id)
      assert(pred == lang, s"$id expected $lang got $pred")
    }
  }

  test("langId DataFrame op matches the partition-local scorer") {
    val docs = planted.zipWithIndex
      .map { case ((_, _, text), i) => (i.toLong, text) }.toDF("doc_id", "text")
    val preds = TextOps.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    planted.zipWithIndex.foreach { case ((id, lang, _), i) =>
      assert(preds(i.toLong) == lang, s"$id expected $lang got ${preds(i.toLong)}")
    }
  }

  test("zh OOV runs per CJK char; latin per token; all langs have word lists") {
    val docs = planted.zipWithIndex
      .map { case ((_, _, text), i) => (i.toLong, text) }.toDF("doc_id", "text")
    val byIdx = TextOps.commonTokens(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang_pred"), r.getAs[Double]("oov_rate"))).toMap
    val zhIdx = planted.indexWhere(_._1 == "zh1").toLong
    val enIdx = planted.indexWhere(_._1 == "en1").toLong
    assert(byIdx(zhIdx)._1 == "zh")
    assert(byIdx(zhIdx)._2 < 1.0, "zh common function chars must register")
    assert(byIdx(enIdx)._1 == "en" && byIdx(enIdx)._2 < 1.0)
    assert(LangProfiles.Langs.forall(LangProfiles.CommonWords.contains))
    assert(LangProfiles.Langs.length >= 30)
  }

  test("confusion matrix totals match the table") {
    val docs = planted.zipWithIndex
      .map { case ((_, lang, text), i) => (i.toLong, text, lang) }
      .toDF("doc_id", "text", "lang")
    val m = TextOps.langIdConfusion(docs).collect()
    assert(m.map(_.getAs[Long]("n")).sum == planted.size)
    // diagonal only: every planted row classified correctly
    assert(m.forall(r => r.getAs[String]("lang") == r.getAs[String]("lang_pred")))
  }
}
