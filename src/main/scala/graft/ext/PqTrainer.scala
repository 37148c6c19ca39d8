package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampled k-means trainer for the PQ codebook — the
  * production replacement for the medoid stand-in the oracle-checked keys
  * use (their DuckDB twins pin the medoid codebook; a trained codebook is
  * a drop-in via the `codebook` parameter of the PQ operators).
  *
  * Determinism is engineered the same way as everything else here: a
  * FIXED sample (lowest `sampleN` vec_ids, collected in id order — a
  * bounded index-construction collect), FIRST-ksub initialization, a fixed
  * iteration count, first-min tie-breaks, and sequential accumulation in
  * sample order — so the same corpus always trains the same codebook on
  * any cluster layout. Empty clusters retain their previous centroid
  * (k-means' standard degenerate case, handled without RNG restarts).
  */
object PqTrainer {
  def trainCodebook(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
      sampleN: Int = 256, iters: Int = 10): Array[Array[Array[Double]]] = {
    val sample = corpus.filter(col("vec_id") < sampleN)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.length >= ksub, s"need ≥ $ksub sample vectors, got ${sample.length}")
    val d = sample.head.length / m
    Array.tabulate(m) { s =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, s * d, (s + 1) * d))
      var cents = subs.take(ksub).map(_.clone)
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ksub, d)(0.0)
        val counts = new Array[Int](ksub)
        subs.foreach { x =>
          var best = Double.MaxValue
          var bj = 0
          var j = 0
          while (j < ksub) {
            var acc = 0.0
            var i = 0
            while (i < d) { val t = x(i) - cents(j)(i); acc += t * t; i += 1 }
            if (acc < best) { best = acc; bj = j }
            j += 1
          }
          counts(bj) += 1
          var i = 0
          while (i < d) { sums(bj)(i) += x(i); i += 1 }
        }
        cents = Array.tabulate(ksub)(j =>
          if (counts(j) == 0) cents(j)
          else Array.tabulate(d)(i => sums(j)(i) / counts(j)))
        it += 1
      }
      cents
    }
  }

  /** Mean squared quantization error of `codebook` over the sample — the
    * quality metric a trainer is judged by (lower = tighter ADC). */
  def distortion(corpus: DataFrame, codebook: Array[Array[Array[Double]]],
      sampleN: Int = 256): Double = {
    val m = codebook.length
    val ksub = codebook.head.length
    val d = codebook.head.head.length
    val sample = corpus.filter(col("vec_id") < sampleN)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    var total = 0.0
    sample.foreach { v =>
      var s = 0
      while (s < m) {
        var best = Double.MaxValue
        var j = 0
        while (j < ksub) {
          var acc = 0.0
          var i = 0
          while (i < d) { val t = v(s * d + i) - codebook(s)(j)(i); acc += t * t; i += 1 }
          if (acc < best) best = acc
          j += 1
        }
        total += best
        s += 1
      }
    }
    total / sample.length
  }
}
