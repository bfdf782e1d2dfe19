package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables.Warehouse

/** Round-11 operator specs. The headline: char-n-gram langid measured on
  * a larger REAL multilingual fixture with an explicit accuracy floor —
  * the round-10 verdict's ask that identification QUALITY be proven, not
  * just the scorer's determinism (the testdata `lang` labels are
  * synthetic; q162's oracle checks arithmetic only). Sentences are
  * ordinary public-domain prose/expository fragments in the five
  * profiled languages, varied register and length.
  */
class Round11OpsSpec extends SparkTestBase {

  private val fixture: Seq[(String, String)] = Seq(
    // English
    ("en", "the sun was setting behind the hills and the air grew cold"),
    ("en", "it is a truth universally acknowledged that a single man must be in want of a wife"),
    ("en", "call me ishmael some years ago never mind how long precisely"),
    ("en", "the history of science is the history of ideas tested against the world"),
    ("en", "she opened the window and listened to the sound of the rain"),
    ("en", "nothing in biology makes sense except in the light of evolution"),
    ("en", "we hold these truths to be self evident that all men are created equal"),
    ("en", "the old man looked at the sea and thought of the fish"),
    ("en", "there is nothing more deceptive than an obvious fact"),
    ("en", "in the beginning the universe was created and this made a lot of people angry"),
    // German
    ("de", "der alte mann sah auf das meer und dachte an die fische"),
    ("de", "ich weiß nicht was soll es bedeuten dass ich so traurig bin"),
    ("de", "die sonne ging hinter den hügeln unter und die luft wurde kühl"),
    ("de", "ein gespenst geht um in europa schrieb der philosoph"),
    ("de", "und der wind trug die blätter durch die leeren straßen der stadt"),
    ("de", "wer reitet so spät durch nacht und wind es ist der vater mit seinem kind"),
    ("de", "die wissenschaft ist ein schönes geschenk an die menschheit"),
    ("de", "ich habe das buch gelesen und es hat mir sehr gut gefallen"),
    ("de", "der zug fährt jeden morgen um sechs uhr durch das schmale tal"),
    ("de", "man sieht nur mit dem herzen gut das wesentliche ist unsichtbar"),
    // Spanish
    ("es", "en un lugar de la mancha de cuyo nombre no quiero acordarme"),
    ("es", "la casa de los abuelos estaba en la colina junto al río"),
    ("es", "muchos años después frente al pelotón de fusilamiento había de recordar aquella tarde"),
    ("es", "los libros de la biblioteca estaban ordenados por el color de sus lomos"),
    ("es", "el sol se ponía detrás de las montañas y el aire era frío"),
    ("es", "la educación es el arma más poderosa que puedes usar para cambiar el mundo"),
    ("es", "caminante no hay camino se hace camino al andar"),
    ("es", "la historia de la ciencia es la historia de las ideas"),
    ("es", "los niños jugaban en la plaza hasta que caía la noche"),
    ("es", "que los sueños parecen reales mientras duran no es una casualidad"),
    // French
    ("fr", "le soleil se couchait derrière les collines et le vent était froid"),
    ("fr", "les fleurs du jardin avaient les couleurs les plus vives du printemps"),
    ("fr", "il était une fois dans une ville au bord de la mer un vieux pêcheur"),
    ("fr", "la science est la poésie du réel disait le professeur aux étudiants"),
    ("fr", "je pense donc je suis écrivait le philosophe dans son discours"),
    ("fr", "les enfants jouaient sur la place jusqu'à la tombée de la nuit"),
    ("fr", "on ne voit bien qu'avec le coeur l'essentiel est invisible pour les yeux"),
    ("fr", "le train traversait chaque matin les étroites vallées du massif"),
    ("fr", "la liberté consiste à pouvoir faire tout ce qui ne nuit pas à autrui"),
    ("fr", "il pleurait dans mon coeur comme il pleut sur la ville"),
    // Chinese
    ("zh", "我在家的时候常常想起小时候的朋友"),
    ("zh", "他是我的老师也是我的朋友我们常常一起讨论问题"),
    ("zh", "学而时习之不亦说乎有朋自远方来不亦乐乎"),
    ("zh", "科学是人类了解世界的一种方式"),
    ("zh", "太阳落在山的后面天气变得很冷了"),
    ("zh", "我们在图书馆里看书一直到天黑了才回家"),
    ("zh", "历史是过去的事情但是它影响着我们的现在"),
    ("zh", "孩子们在广场上玩到了晚上才肯回家"),
    ("zh", "他说的话我都记在心里了因为那是真的"),
    ("zh", "自由就是做法律许可的一切事情的权利"))

  test("langid accuracy floor on a 50-sentence real multilingual fixture (5 languages)") {
    import spark.implicits._
    val corpus = fixture.toDF("expected", "text")
    val scored = TextAnalysis.withCharLangPred(corpus)
      .withColumn("hit", (col("lang_pred") === col("expected")).cast("int"))
    val perLang = scored.groupBy("expected")
      .agg(sum("hit").as("hits"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = perLang.map(_._2).sum.toDouble / perLang.map(_._3).sum
    val misses = scored.filter(col("hit") === 0)
      .select("expected", "lang_pred", "text").collect()
      .map(r => s"${r.getString(0)}->${r.getString(1)}: ${r.getString(2).take(40)}")
    // floor, not equality: a 5-marker-per-language profile is a deliberate
    // minimum viable model; the measured value is reported for SCALE.md
    assert(total >= 0.9,
      f"overall accuracy $total%.2f below 0.9 floor; misses:\n${misses.mkString("\n")}")
    perLang.foreach { case (l, hits, n) =>
      assert(hits.toDouble / n >= 0.8,
        s"$l accuracy ${hits}/$n below 0.8 floor; misses:\n${misses.mkString("\n")}")
    }
    info(f"langid fixture accuracy: overall $total%.2f; " +
      perLang.map { case (l, h, n) => s"$l $h/$n" }.mkString(", "))
  }

  test("publication stamps: unpublished stages are never served; feed hops over gaps; markers survive compaction") {
    import spark.implicits._
    import graft.plans.{Maintenance, MirrorChangelog}
    val wh = Warehouse(tmpDir("pub-stamp"), retain = 6)
    wh.overwrite(Seq((1L, "a")).toDF("id", "name"), "m") // v1
    assert(MirrorChangelog.emitPending(spark, wh, "m", "feed", "id").isEmpty)
    wh.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), "m") // v2
    // a rival's half-written stage occupies v3 — no publication stamp
    val stage = Paths.get(s"${wh.tablePath("m")}.v3")
    Files.createDirectories(stage)
    // real allocations carry a sibling `.stage` marker (protocol contract)
    Files.writeString(graft.sources.Tables.stageMarkerPath(stage), "")
    Files.writeString(stage.resolve("part-half.parquet"), "half")
    wh.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), "m") // v4
    assert(wh.listVersions("m") == Seq(1L, 2L, 4L),
      "an unpublished stage must never be listed as a snapshot")
    intercept[NoSuchElementException] { wh.readVersion(spark, "m", 3L) }
    // the incremental feed hops between adjacent PUBLISHED snapshots —
    // iterating raw numbers would read the half-written stage
    val hops = MirrorChangelog.emitPending(spark, wh, "m", "feed", "id")
    assert(hops == Seq((1L, 2L), (2L, 4L)), s"got $hops")
    // in-version marker files (the IVM cursor contract) survive a
    // maintenance rewrite
    Files.writeString(Paths.get(wh.snapshotPath("m"), "_ivm_batch_id"), "7")
    Maintenance.compact(spark, wh, "m", targetFiles = 1)
    val after = Paths.get(wh.snapshotPath("m"), "_ivm_batch_id")
    assert(Files.exists(after) && Files.readString(after) == "7",
      "markers must be carried through compaction")
  }

  test("feed-driven IVM: maintained aggregate == recompute across hops, restart, and a crashed emit") {
    import spark.implicits._
    import graft.plans.{IncrementalAgg, MirrorChangelog}
    val root = tmpDir("feed-ivm")
    val wh = Warehouse(root, retain = 6)
    val spec = IncrementalAgg.Spec(col("cat"), col("v"))
    def commit(rows: (Long, String, Double)*): Unit =
      wh.overwrite(rows.toDF("id", "cat", "v").localCheckpoint(true), "m")
    def maintained: Set[(String, Long, Double)] =
      wh.read(spark, "agg").collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).doubleValue)).toSet
    def recompute: Set[(String, Long, Double)] =
      IncrementalAgg.full(wh.read(spark, "m"), spec).collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).doubleValue)).toSet

    commit((1L, "a", 1.0), (2L, "b", 2.0))
    assert(MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg",
      "id", spec).isEmpty) // bootstrap emits nothing
    assert(maintained == recompute)
    // two hops absorbed in ONE call (the additive-delta property)
    commit((1L, "a", 1.0), (2L, "b", 5.0), (3L, "a", 3.0))
    commit((2L, "b", 5.0), (3L, "a", 3.0), (4L, "c", 1.5)) // key 1 deleted
    assert(MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg",
      "id", spec) == Seq((1L, 2L), (2L, 3L)))
    assert(maintained == recompute,
      "feed-maintained aggregate must equal a full recompute")
    // restart: a NEW warehouse instance (fresh process) resumes from the
    // durable cursor
    val wh2 = Warehouse(root, retain = 6)
    commit((2L, "b", 7.0), (4L, "c", 1.5))
    assert(MirrorChangelog.maintainAggregate(spark, wh2, "m", "feed", "agg",
      "id", spec) == Seq((3L, 4L)))
    assert(maintained == recompute)
    // crash between feed emit and agg commit: the hops are materialized,
    // the consumer cursor is NOT advanced — the next maintain applies
    // them exactly once
    commit((5L, "c", 9.0), (2L, "b", 7.0), (4L, "c", 1.5))
    MirrorChangelog.emitPending(spark, wh2, "m", "feed", "id")
    assert(MirrorChangelog.maintainAggregate(spark, wh2, "m", "feed", "agg",
      "id", spec) == Seq((4L, 5L)))
    assert(maintained == recompute, "a crashed emit must not double-apply")
    // idempotent when nothing changed
    assert(MirrorChangelog.maintainAggregate(spark, wh2, "m", "feed", "agg",
      "id", spec).isEmpty)
    assert(maintained == recompute)
  }

  test("q179 (Q6 shape) pushes all three predicates into the scan; q181 (Q10) takes ordered") {
    val dir = "/root/testdata/sf0.001"
    val p179 = graft.operators.Queries.q179RevenueChange(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p179.contains("PushedFilters"), p179)
    val pushed = p179.linesIterator.filter(_.contains("PushedFilters")).mkString
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(pushed.contains(c), s"$c must reach the parquet scan:\n$pushed"))
    assert(!p179.contains("SortMergeJoin") && !p179.contains("BroadcastHashJoin"),
      "Q6 is a pure scan+agg — no join may appear")
    val p181 = graft.operators.Queries.q181ReturnedRevenue(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p181.contains("TakeOrderedAndProject"),
      s"the top-20 must be a TakeOrderedAndProject, not a global sort:\n$p181")
  }

  test("multi_substr_count == the replace formulation on random text (and rejects self-overlap)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val markers = TextAnalysis.CharLangMarkers.flatMap(_._2)
    val rng = new scala.util.Random(7)
    val alphabet = "abcdefghi thedran的是了 loquesichun"
    val docs = (1 to 200).map { i =>
      (i.toLong, (1 to 400).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("id", "text")
    val mc = call_function("multi_substr_count", col("text"),
      array(markers.map(lit): _*))
    val viaReplace = markers.zipWithIndex.map { case (m, i) =>
      val esc = m.replace("\\", "\\\\").replace("'", "\\'")
      expr(s"(length(text) - length(replace(text, '$esc', ''))) div ${m.length}")
        .cast("long").as(s"r$i")
    }
    val rows = docs.withColumn("_mc", mc).select(col("_mc") +: viaReplace: _*).collect()
    rows.foreach { r =>
      val ac = r.getSeq[Long](0)
      markers.indices.foreach { i =>
        assert(ac(i) == r.getLong(i + 1),
          s"AC count diverged from replace count for marker '${markers(i)}'")
      }
    }
    // the semantics guard: a self-overlapping pattern must be refused
    intercept[IllegalArgumentException] {
      graft.functions.MultiSubstrCount(
        org.apache.spark.sql.catalyst.expressions.Literal("xxx"), Seq("aa"))
    }
  }

  test("pred-lang pipeline variants run and are consistent with the kernel") {
    // smoke the pipeline wiring on real testdata (the oracle gate checks
    // exact values at the driver's SF): every selected doc's lang_pred
    // must be one the kernel can emit, and the temperature weights must
    // sum to ~1 over the emitted groups
    val dir = "/root/testdata/sf0.001"
    val sel = graft.operators.Curation.q175BudgetPredLang(spark, dir)
    val langs = sel.select("lang_pred").distinct().collect().map(_.getString(0)).toSet
    val legal = TextAnalysis.CharLangMarkers.map(_._1).toSet + "und"
    assert(langs.nonEmpty && langs.subsetOf(legal), s"illegal lang_pred values: $langs")
    val mix = graft.operators.Curation.q176TemperaturePredLang(spark, dir)
    val sums = mix.agg(sum("w_prop"), sum("w_temp")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-4)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-4)
  }
}
