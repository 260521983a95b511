package graft

import graft.functions.SuffixDedup

/** One-question measurement main (the ScaleProbe pattern) backing
  * SCALING.md's suffix-array footnote: the prefix-doubling round count
  * is ⌈log₂ win⌉ — FIXED by the window length, independent of corpus
  * size — so moving from the gate's win=8 (3 rounds) to the ExactSubstr
  * paper's production threshold win=50 (6 rounds) must cost a constant
  * factor ≤ 2 in rounds, not a new asymptote. This times
  * [[SuffixDedup.duplicateWindows]] at both windows across the given
  * scale dirs and prints one JSON line per (sf, win) with the
  * min-of-reps wall, so the round-count claim is measured off the toy
  * window (r11 verdict item 7).
  *
  * Usage: runMain graft.SuffixProbe <sfDir>...
  */
object SuffixProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SuffixProbe <sfDir>...")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    args.foreach { d =>
      Seq(8, 50).foreach { win =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          SuffixDedup.duplicateWindows(Tables.documents(spark, d),
              "doc_id", "text", win)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          System.gc() // the Bench measurement-independence rule
          dt
        }
        val rounds = math.ceil(math.log(win.toDouble) / math.log(2.0)).toInt
        println(f"""{"probe":"suffix_win","sf":"$d","win":$win,"rounds":$rounds,"wall_sec":${times.min}%.3f}""")
      }
    }
    spark.stop()
  }
}
