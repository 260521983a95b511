package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.AtomicTable

/** Persisted, incrementally-maintained IVF vector index — q101's
  * incremental-artifact discipline applied to the embedding side.
  *
  * [[Similarity.sharedCodebook]] caches a trained codebook per JVM; a
  * production embedding pipeline needs the index to be a DURABLE
  * artifact: train once, freeze, then assign each arriving shard
  * against the frozen codebook without retraining or rescanning the
  * corpus. Layout: two [[AtomicTable]]s under one root —
  *
  *   dir/codebook   (centroid_id, c_emb)            — FROZEN after build
  *   dir/assigned   (vec_id, embedding, v_norm, centroid_id) — the
  *                  inverted lists, one committed version per shard
  *
  * Invariants (pinned in VectorIndexSpec):
  *  - [[addShard]] never writes `dir/codebook`: the codebook version
  *    before and after a shard arrival is IDENTICAL — assignment uses
  *    the frozen artifact, so old vectors can never be re-assigned.
  *  - incremental ≡ full: because nearest-centroid assignment is
  *    per-row against a fixed codebook, `assigned` after build(base) +
  *    addShard(s₁) + … + addShard(sₙ) equals one `ivfAssign(base ∪ s₁
  *    ∪ … ∪ sₙ, codebook)` — and therefore probe(index) ≡ probe of the
  *    full recompute. This is the exact analogue of q101's
  *    "corpus pairs ∪ shard pairs ≡ full recompute" for ANN.
  *
  * Scale shape: build scans the base corpus once (the q52 assign pass);
  * addShard scans ONLY the shard (|shard|·c scored rows, map-side
  * combined). The artifact merge commits through [[AtomicTable.upsert]]
  * — simple-and-correct rewrite at gate scale; a 100 TB deployment
  * partitions `assigned` by centroid_id (or arrival shard) and merges
  * only touched partitions, exactly the caveat documented on `upsert`
  * itself. Probing reads the committed snapshot, so probes running
  * concurrently with a shard arrival see a consistent version (the
  * AtomicTable reader contract).
  *
  * Reference point: /root/reference has no vector indexing at all; this
  * extends the engine's ANN family (q23/q24/q52) with the index
  * LIFECYCLE a training-data pipeline needs.
  */
object VectorIndex {

  private def codebookDir(dir: String) = s"$dir/codebook"
  private def assignedDir(dir: String) = s"$dir/assigned"

  /** Train (or deterministically sample) a codebook from the base
    * corpus, freeze it, and assign the base — the index bootstrap.
    * `trained = false` uses the id-sample codebook (c smallest ids,
    * c = √n — SQL-expressible, the q52 oracle discipline);
    * `trained = true` runs the bounded-sample Lloyd refinement
    * ([[Similarity.trainedCodebook]], the production setting). */
  def build(vectors: DataFrame, dir: String, trained: Boolean = false): Unit = {
    val spark = vectors.sparkSession
    val n = vectors.count()
    val cents =
      if (trained) Similarity.trainedCodebook(vectors, n)
      else Similarity.centroids(vectors, Similarity.codebookSize(n))
    AtomicTable.replace(cents, codebookDir(dir))
    // assign against the PERSISTED codebook (not the in-memory plan):
    // the artifact is the source of truth from the first write on
    AtomicTable.replace(Similarity.ivfAssign(vectors, codebook(spark, dir)),
      assignedDir(dir))
  }

  /** The frozen codebook artifact. */
  def codebook(spark: SparkSession, dir: String): DataFrame =
    AtomicTable.read(spark, codebookDir(dir))

  /** Version string of the frozen codebook — spec hook for the
    * "addShard never retrains" invariant. */
  def codebookVersion(spark: SparkSession, dir: String): Option[String] =
    AtomicTable.currentVersion(spark, codebookDir(dir))

  /** The committed inverted lists (vec_id, embedding, v_norm,
    * centroid_id). */
  def assigned(spark: SparkSession, dir: String): DataFrame =
    AtomicTable.read(spark, assignedDir(dir))

  /** Shard arrival: score ONLY the shard against the frozen codebook
    * and merge its assignments in as a new committed version. Replaced
    * vec_ids update (re-embedded documents), new ids insert — the
    * upsert MERGE semantics. The codebook is read, never written. */
  def addShard(shard: DataFrame, dir: String): String = {
    val spark = shard.sparkSession
    val delta = Similarity.ivfAssign(shard, codebook(spark, dir))
    AtomicTable.upsert(delta, assignedDir(dir), "vec_id")
  }

  /** Probe the persisted index — [[Similarity.ivfTopK]] over the
    * committed snapshot (small query set; the batch scorer for a
    * corpus-sized query side is [[Similarity.ivfBatchTopK]] over
    * [[assigned]]). */
  def topK(spark: SparkSession, dir: String, queries: DataFrame,
           k: Int, nprobe: Int): DataFrame =
    Similarity.ivfTopK(assigned(spark, dir), codebook(spark, dir),
      queries, k, nprobe)
}
