package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column operators a large-scale training pipeline needs beyond
  * similarity search: unit-normalization and int8 quantization (the standard
  * storage/compute compression for ANN indexes and retrieval corpora).
  *
  * Both are narrow single-pass projections — no shuffle, whole-stage
  * codegen'd, linear at any corpus size — and both are engineered for exact
  * cross-engine determinism: per-element IEEE arithmetic in a pinned
  * evaluation order ((x / s) * k, then floor), never order-sensitive
  * accumulation. The only reduction (the norm) runs through the sequential
  * left-fold `dot_product` expression, bit-equal to the DuckDB list_reduce
  * twin.
  */
object Embeddings {
  private def asDouble(emb: Column): Column = transform(emb, x => x.cast("double"))

  /** Comma-joined rendering of an integer vector. The quantized vector goes
    * out as ONE sortable string column, not array<long>: downstream harnesses
    * (and most tabular sinks) can sort/hash scalars but not arrays, and the
    * CSV form is lossless for integers. */
  private def csv(e: Column): Column = concat_ws(",", transform(e, _.cast("string")))

  /** max(|x_i|) — exact (comparisons only, no accumulation). */
  private def absMax(e: Column): Column = array_max(transform(e, x => abs(x)))

  /** Symmetric int8 quantization: scale = max(|x_i|), q_i = floor(x_i /
    * scale * 127) in [-127, 127] (floor, not round: round-half modes differ
    * across engines, floor is IEEE-pinned). All-zero vectors quantize to
    * zeros with scale 0 rather than dividing by it. */
  def quantizeInt8(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    // e and scale materialize as ATTRIBUTES before the quantize lambda: the
    // lambda captures scale, and a captured non-attribute subtree
    // re-evaluates per element in interpreted HOF eval — absMax would
    // otherwise re-run O(d) per element, O(d²) per row (PLANS.md r4 note)
    emb.select(col("vec_id"), asDouble(col(vecCol)).as("e"))
      .select(col("vec_id"), col("e"), absMax(col("e")).as("scale"))
      .select(col("vec_id"), col("scale"),
        csv(when(col("scale") === 0d, transform(col("e"), _ => lit(0L)))
          .otherwise(transform(col("e"),
            x => floor(x / col("scale") * lit(127d)).cast("long"))))
          .as("q"))

  /** Johnson-Lindenstrauss random projection to `k` dimensions — the cheap
    * dimensionality reduction a pipeline runs before ANN indexing or
    * clustering when 64 dims is still too wide at corpus scale. The
    * projection matrix is seeded-deterministic Gaussian (same generator as
    * the LSH hyperplanes); each output component is ONE sequential-fold
    * `dot_product` (bit-deterministic), scaled to integers
    * (floor(dot · 10⁶)) and CSV-joined so the result is a sortable scalar.
    * Narrow single pass, no shuffle; at 100 TB the matrix rides along as
    * k·d plan constants. */
  def randomProjection(emb: DataFrame, k: Int = 16, dim: Int = 64,
      seed: Long = 7L, vecCol: String = "embedding"): DataFrame = {
    val planes = projectionPlanes(k, dim, seed)
    val comps = planes.map { p =>
      floor(call_function("dot_product", col(vecCol), typedLit(p.toSeq))
        * lit(1000000d)).cast("long").cast("string")
    }
    emb.select(col("vec_id"), concat_ws(",", comps: _*).as("proj_x1e6"))
  }

  /** The seeded projection matrix, exposed so oracles/tests can embed the
    * same literals. */
  def projectionPlanes(k: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k, dim)(rnd.nextGaussian())
  }

  /** Quantized per-element copy of the embedding: q_i = floor(x_i · scaleQ)
    * as longs — the integer domain in which corpus-wide moments accumulate
    * EXACTLY (long addition is associative-commutative; float sums would be
    * partitioning-dependent). */
  private[ext] def quantized(vecCol: Column, scaleQ: Long): Column =
    transform(asDouble(vecCol), x => floor(x * lit(scaleQ.toDouble)).cast("long"))

  /** Full-corpus second-moment (Gram) matrix over quantized embeddings:
    * G[j][l] = Σ_rows q_j · q_l, emitted as (j, l, g) rows — the
    * distributed statistic under PCA/whitening/covariance estimation.
    *
    * Scale shape: ONE global [[graft.functions.VectorSumLong]] aggregation —
    * each input partition reduces map-side to a single d² long vector, so
    * the shuffle carries `partitions` rows TOTAL at any corpus size, and
    * integer addition makes the result bit-identical under any partitioning
    * or re-execution (the property that lets a 1000-executor run be checked
    * against a single-node oracle). d=64 → 4096 multiply-adds per row, all
    * inside one codegen'd projection + imperative aggregate.
    *
    * Overflow: |q| ≤ scaleQ, so each product ≤ scaleQ²; headroom is
    * 2^63/scaleQ² ≈ 9.2e18/1e8 ≈ 9e10 rows at the default scale — size
    * scaleQ down for corpora beyond that. */
  def gramMatrix(emb: DataFrame, dim: Int = 64, scaleQ: Long = 10000L,
      vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    emb
      // attribute discipline: q materializes before the product lambda
      .select(quantized(col(vecCol), scaleQ).as("q"))
      .select(flatten(transform(col("q"),
        xj => transform(col("q"), xl => xj * xl))).as("p"))
      .agg(call_function("vector_sum_long", col("p")).as("g"))
      .select(posexplode(col("g")))
      .select((col("pos") / dim).cast("long").as("j"),
        (col("pos") % dim).cast("long").as("l"), col("col").as("g"))
  }

  /** Unit-normalization, reported as scaled integers (floor(x / ‖v‖ · 10⁶))
    * so the output is integer-exact across engines; the norm itself (one
    * scalar double per vector) rides along. Zero vectors pass through as
    * zeros with norm 0. */
  def normalizeScaled(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    // same attribute discipline as [[quantizeInt8]]: the scaling lambda
    // captures the norm — inlined, the dot_product fold would re-run per
    // element (O(d²) per row)
    emb.select(col("vec_id"), asDouble(col(vecCol)).as("e"))
      .select(col("vec_id"), col("e"),
        sqrt(call_function("dot_product", col("e"), col("e"))).as("norm"))
      .select(col("vec_id"), col("norm"),
        csv(when(col("norm") === 0d, transform(col("e"), _ => lit(0L)))
          .otherwise(transform(col("e"),
            x => floor(x / col("norm") * lit(1000000d)).cast("long"))))
          .as("unit_x1e6"))
}
