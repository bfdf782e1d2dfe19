package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Round-10 operator specs that need synthetic corpora the oracle tables
  * can't provide — starting with char-n-gram language identification on a
  * REAL multilingual corpus with known labels (the testdata `lang` column
  * is synthetic, so q162's oracle checks the arithmetic; identification
  * itself is proven here).
  */
class Round10OpsSpec extends SparkTestBase {

  test("char-n-gram langid identifies real sentences in all five profiled languages") {
    import spark.implicits._
    val corpus = Seq(
      ("en", "the quick brown fox is jumping over the lazy dog and the cat"),
      ("en", "a thing of beauty is a joy forever and the meaning endures"),
      ("de", "der hund und die katze schlafen und ich singe ein schönes lied"),
      ("de", "ich habe einen schönen tag und der wind weht durch das schilf"),
      ("es", "la casa de los abuelos que está en la colina de la aldea"),
      ("es", "los libros que me diste son de la biblioteca de la escuela"),
      ("fr", "le chat aux yeux verts regardait les oiseaux qui chantaient leur chanson"),
      ("fr", "les fleurs aux couleurs vives poussaient le long du chemin ailleurs"),
      ("zh", "我在家的时候是很高兴的因为我了解了很多"),
      ("zh", "他是我的朋友我们在学校的图书馆里"),
      ("und", "qqq www kkk ppp zzz xxx"))
      .toDF("expected", "text")
    val pred = TextAnalysis.withCharLangPred(corpus)
      .select("expected", "lang_pred").collect()
    pred.foreach { r =>
      assert(r.getString(1) == r.getString(0),
        s"expected ${r.getString(0)}, predicted ${r.getString(1)}")
    }
  }

  test("langid argmax tie-break is the lexicographically smallest language") {
    import spark.implicits._
    // exactly one marker hit for en ('the') and one for es (' la'):
    // tie at score 1 must resolve to 'en' (en < es)
    val df = Seq(("x", "the bbb la")).toDF("id", "text")
    val out = TextAnalysis.withCharLangPred(df).select("lang_pred").head().getString(0)
    assert(out == "en", s"tie must resolve lexicographically, got $out")
  }

  test("langid adds no shuffle: the scored plan has no exchange") {
    import spark.implicits._
    val df = Seq(("a", "der hund")).toDF("id", "text")
    val plan = TextAnalysis.withCharLangPred(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"per-row langid must not shuffle:\n$plan")
  }
}
