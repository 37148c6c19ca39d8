package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search. Cosine is computed as a LEFT-TO-RIGHT double
  * accumulation over the element products: sequential IEEE operations are
  * bit-deterministic, so results are reproducible across engines and
  * partitionings — unlike a parallel float reduction. The accumulation runs
  * in the codegen'd [[graft.functions.DotProduct]] expression (a tight JVM
  * loop); [[foldDot]] is the equivalent built-in-functions form, kept for
  * cross-checking in tests.
  */
object Similarity {
  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Interpreted reference implementation: aggregate-over-zip_with fold. */
  def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column = call_function("dot_product", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: the exact baseline. The (small) query set is
    * broadcast against the corpus — cost O(|queries|·N), one pass, no
    * shuffle beyond the per-query top-k aggregation.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val scored = corpus.crossJoin(q)
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** Deterministic random-hyperplane LSH: 16 sign bits → bucket id. At scale
    * the corpus is bucketed once (one narrow pass), queries probe only their
    * bucket — the IVF-style scale path for ANN. */
  def hyperplanes(nPlanes: Int = 16, dim: Int = 64, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(emb, typedLit(p.toSeq)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style ANN: a deterministic coarse quantizer (one representative
    * vector per `label` cell — the min-id member, a medoid stand-in for a
    * trained centroid) partitions the corpus into inverted lists; a query
    * probes only its nearest cell and re-ranks exactly inside it. At scale:
    * representatives broadcast everywhere, the corpus is assigned in ONE
    * narrow pass, and a probe touches ~N/cells vectors.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // representatives: the min-vec_id member of each label cell
    val w = Window.partitionBy("label").orderBy("vec_id")
    val reps = broadcast(
      corpus.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("label").as("cell"), col("embedding").as("rep")))
    // nearest-cell assignment (cosine to each representative; ties → lower cell)
    def assign(df: DataFrame, emb: String, out: String): DataFrame = {
      val aw = Window.partitionBy("_aid").orderBy(col("_sim").desc, col("cell"))
      df.withColumn("_aid", col("vec_id"))
        .crossJoin(reps)
        .withColumn("_sim", cosine(col(emb), col("rep")))
        .withColumn("_rn", row_number().over(aw))
        .filter(col("_rn") === 1)
        .withColumnRenamed("cell", out)
        .drop("rep", "_sim", "_rn", "_aid")
    }
    val bucketed = assign(corpus, "embedding", "ivf_cell")
    val q = assign(queries, "embedding", "ivf_cell")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("ivf_cell"))
    val scored = bucketed.join(broadcast(q), "ivf_cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val rw = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }

  /** ANN via LSH buckets: exact re-rank restricted to the query's bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Array[Array[Double]]): DataFrame = {
    val bucketed = corpus.withColumn("bucket", lshBucket(col("embedding"), planes))
    val q = broadcast(queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", lshBucket(col("q_emb"), planes)))
    val scored = bucketed.join(q, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "sim")
  }
}
