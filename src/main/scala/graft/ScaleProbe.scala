package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** One-question measurement main backing SCALING.md's q108 footnote:
  * the IVF-PQ build's n·k assignment term is n^1.5 under the default
  * k = √n cell heuristic, and linear under the FIXED k a production
  * deployment picks from memory/recall targets. This times the same
  * ivfPqTopK call (q108's exact parameters) across the ScaleUp corpus
  * sizes under both regimes — k = √n (cells and nprobe growing with
  * the corpus) vs k and nprobe frozen at their sf0.1 values — and
  * prints one JSON line per (sf, regime) with the min-of-reps wall.
  *
  * Usage: runMain graft.ScaleProbe <sfDir>... (3 reps each; codebooks
  * retrained per rep — build cost is the thing under test, so no
  * sharedCodebook cache).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <sfDir>...")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // frozen regime: the sf0.1 values (n=2000 -> c=45, nprobe=11)
    val fixedC = Similarity.codebookSize(2000L)
    val fixedNprobe = math.max(2, fixedC / 4)
    args.foreach { d =>
      val vecs = Tables.embeddings(spark, d)
      val n = vecs.count()
      val dim = vecs.select(size(col("embedding"))).head().getInt(0)
      Seq(
        ("sqrt_n", Similarity.codebookSize(n),
          math.max(2, Similarity.codebookSize(n) / 4)),
        ("fixed_k", fixedC, fixedNprobe)
      ).foreach { case (regime, c, nprobe) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val cents = Similarity.kmeansCentroids(vecs, c, iters = 2, dim = dim)
          Similarity.ivfPqTopK(vecs, cents, vecs.filter(col("vec_id") < 5),
              k = 10, nprobe = nprobe, m = 32, c = 64, dim = dim, iters = 2)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          dt
        }
        println(f"""{"probe":"ivfpq","sf":"$d","regime":"$regime","n":$n,"cells":$c,"nprobe":$nprobe,"wall_sec":${times.min}%.3f}""")
      }
    }
    spark.stop()
  }
}
