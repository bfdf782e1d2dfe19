package graft

import scala.collection.mutable
import scala.util.Random

/** Seeded Scala port of the reference's sample-data generator
  * (generate_sample_dms_parquet.py) — the de-facto correctness oracle:
  * it emits changelog batches AND maintains the expected final table state
  * in lockstep (reference :16-55, final state printed at :68-70).
  *
  * Differences from the reference, both deliberate:
  *  - seeded RNG (the reference uses unseeded `random.choice`, :30,:44);
  *  - a strictly increasing integer `ts` stands in for `datetime.now()
  *    .isoformat()` so latest-wins ordering is unambiguous in tests that
  *    need it, while a constant-`ts` variant exercises tie-breaking.
  */
object DmsGenerator {

  final case class Row(id: Long, name: String, modificationDate: String)
  final case class Log(id: Long, name: String, modificationDate: String,
                       table: String, op: String, ts: String)

  final case class Generated(batches: Seq[Seq[Log]], expectedFinal: Seq[Row])

  /** Replicates the reference's loop: batch 0 = full insert of `nRows`
    * (:16-25), every batch gets 5 random updates (:27-40) then 3 random
    * deletes (:42-55).
    */
  def generate(seed: Long, nRows: Int = 100, nBatches: Int = 5,
               updatesPerBatch: Int = 5, deletesPerBatch: Int = 3): Generated = {
    val rnd = new Random(seed)
    var clock = 0L
    def ts(): String = { clock += 1; f"2024-01-01T00:00:00.$clock%06d" }

    // insertion-ordered live table, like the pandas index
    val table = mutable.LinkedHashMap.empty[Long, Row]
    (1 to nRows).foreach { i =>
      table(i.toLong) = Row(i.toLong, s"name$i", ts())
    }

    val batches = (0 until nBatches).map { i =>
      val logs = mutable.ArrayBuffer.empty[Log]
      if (i == 0) table.values.foreach { r =>
        logs += Log(r.id, r.name, r.modificationDate, "test_table", "I", ts())
      }
      (1 to updatesPerBatch).foreach { _ =>
        if (table.nonEmpty) {
          val keys = table.keys.toIndexedSeq
          val id = keys(rnd.nextInt(keys.size))
          val updated = Row(id, s"updated_name$id", ts())
          table(id) = updated
          logs += Log(updated.id, updated.name, updated.modificationDate,
            "test_table", "U", ts())
        }
      }
      (1 to deletesPerBatch).foreach { _ =>
        if (table.nonEmpty) {
          val keys = table.keys.toIndexedSeq
          val id = keys(rnd.nextInt(keys.size))
          val r = table.remove(id).get
          logs += Log(r.id, r.name, r.modificationDate, "test_table", "D", ts())
        }
      }
      logs.toSeq
    }
    Generated(batches, table.values.toSeq)
  }
}
