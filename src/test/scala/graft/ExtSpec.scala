package graft

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the training-data-pipeline extensions: do the dedup
  * operators actually FIND planted duplicates, does LSH bucket near vectors
  * together, does the multimodal stub preserve the batch contract.
  */
class ExtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today " +
      "while the patient heron waits beside the quiet river watching silver " +
      "fish drift slowly between the smooth stones under the morning light"),
    (1L, "spark engines shuffle partitions across executors with hash exchanges"),
    (2L, "completely different content about databases and query optimizers"),
    (3L, "rain in spain falls mainly on the plain every single year"))
  // near-dup of 0 (appended tail → high shingle overlap), exact dup of 1
  private val corpus = (base ++ Seq(
    (100L, base.head._2 + " with a small tail"),
    (101L, "spark engines shuffle partitions across executors with hash exchanges")))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(corpus).orderBy("keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((1L, 2L)))            // doc 1 + exact copy 101
    assert(out.count(_._2 == 1L) == 4)        // the rest unique
  }

  test("minhash LSH finds the planted near-dup and exact-dup pairs") {
    // 8 bands × 4 rows: higher recall for short test docs (the query key
    // uses the precision-leaning 4×8 over longer documents)
    val pairs = Dedup.minhashLshPairs(corpus, bands = 8, thresholdX10000 = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)), "near-dup pair missed")
    assert(pairs.contains((1L, 101L)), "exact-dup pair missed")
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(0L, 2L) })
  }

  test("minhash LSH pre-collapse: identical-doc groups expand to exact pairs") {
    import spark.implicits._
    // 3 byte-identical docs (the degenerate hot-bucket shape) + a near-dup
    // of them + an unrelated doc: the LSH stage only ever sees ONE
    // representative of the trio, yet the output carries every member pair
    val eps = "the quick brown fox jumps over the lazy dog again and again"
    val corpus2 = Seq(
      (1L, eps), (2L, eps), (3L, eps),
      (4L, eps + " tonight"),
      (9L, "completely unrelated content about catalyst optimizer rules")).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(corpus2, bands = 8, thresholdX10000 = 5000L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // within-group: all three pairs at exactly 10000
    assert(pairs.get((1L, 2L)).contains(10000L))
    assert(pairs.get((1L, 3L)).contains(10000L))
    assert(pairs.get((2L, 3L)).contains(10000L))
    // cross-group: the near-dup pairs with EVERY member, same score each
    val cross = List((1L, 4L), (2L, 4L), (3L, 4L)).map(pairs.get)
    assert(cross.forall(_.isDefined), s"missing cross-group pairs in $pairs")
    assert(cross.distinct.size == 1, "member pairs must share the representative's score")
    assert(!pairs.keySet.exists { case (a, b) => a == 9L || b == 9L })
  }

  test("minhash LSH maxBucket cap drops oversized buckets, keeps identical pairs") {
    import spark.implicits._
    // 4 distinct near-identical docs → every bucket holds all 4 reps;
    // cap at 3 → cross-doc candidates all dropped, but the identical pair
    // (5,6) survives via the pre-collapse path
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus3 = Seq(
      (1L, base + " one"), (2L, base + " two"), (3L, base + " three"),
      (4L, base + " four"), (5L, base), (6L, base)).toDF("doc_id", "text")
    val capped = Dedup.minhashLshPairs(corpus3, bands = 8,
      thresholdX10000 = 5000L, maxBucket = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((5L, 6L)), s"got $capped")
  }

  test("connected components cluster transitive near-dup chains") {
    import spark.implicits._
    // chain 1-2-3 plus isolated pair 10-11: min-label propagation must
    // reach across the chain (1 and 3 share no direct edge)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("ida", "idb")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("embedding cosine dedup: bucketed plan finds planted copies, no cartesian") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val planes = Similarity.hyperplanes(nPlanes = 6, dim = 4)
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.5f, 0.5f, 0.7f, 0f)), (3L, Array(-1f, 0.5f, 3f, 0f)))
      .toDF("vec_id", "embedding")
    val probes = Seq((1000L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Dedup.embeddingCosinePairs(corpus, probes, planes, 0.999)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"expected a bucket equi-join, got:\n$plan")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1000L, 0L)))
  }

  test("connected components throw when maxIter is below the diameter") {
    // a 5-hop path needs 5 min-label rounds; maxIter=2 must fail loudly,
    // never return partially-propagated labels
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("ida", "idb")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(path, maxIter = 2)
    }
  }

  test("simhash: near-dups at small hamming distance, unrelated docs far") {
    val sh = Dedup.simhashSignatures(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(101L)) == 0)        // identical text → identical simhash
    assert(ham(sh(0L), sh(100L)) <= 4)        // one-token change → near
    assert(ham(sh(0L), sh(2L)) >= 3)          // unrelated → far
  }

  test("jaccard scaled-integer scores") {
    val j = corpus.filter($"doc_id" === 0L)
      .crossJoin(corpus.filter($"doc_id" === 100L).select($"text".as("t2")))
      .select(Dedup.jaccardX10000(
        TextAnalysis.tokens($"text"), TextAnalysis.tokens($"t2")).as("j"))
      .head().getLong(0)
    assert(j > 7000 && j < 10000) // one token of ~11 distinct changed
  }

  test("codegen poly_hash16 equals the interpreted fold") {
    val toks = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.explode(
        TextAnalysis.tokens($"text")).as("tok")).limit(5000)
    val diff = toks.select(
      TextAnalysis.polyHash16($"tok").as("fast"),
      TextAnalysis.polyHash16Fold($"tok").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0L)
  }

  test("codegen dot_product is bit-identical to the interpreted fold") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = e.limit(50).crossJoin(
      e.limit(7).select($"embedding".as("b")))
    val diff = pairs.select(
      Similarity.dot($"embedding", $"b").as("fast"),
      Similarity.foldDot($"embedding", $"b").as("ref"))
      .filter($"fast" =!= $"ref") // bitwise-equal doubles compare equal
      .count()
    assert(diff == 0L)
  }

  test("dot_product: dimension mismatch yields NULL (zip_with parity), not truncation") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val out = df.select(
      Similarity.dot($"a", $"b").as("fast"),
      Similarity.foldDot($"a", $"b").as("ref")).head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("cosine: identical vectors ≈ 1, orthogonal = 0") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f))).toDF("a", "b")
    val sims = df.select(Similarity.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(sims(1) == 0.0)
  }

  test("brute-force top-k ranks the planted nearest neighbor first") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.1f, 0f, 0f)), // closest to 0
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("n_id") == 1L)
  }

  test("LSH buckets put identical vectors together; topK recalls them") {
    val planes = Similarity.hyperplanes(nPlanes = 4, dim = 4)
    val vecs = Seq(
      (0L, Array(1f, 0.2f, 0f, 0f)),
      (1L, Array(0.98f, 0.21f, 0.01f, 0f)),
      (2L, Array(-1f, 0.5f, 3f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0L), 3, planes)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(out.contains(1L))
  }

  test("multi-probe LSH recalls a neighbor one sign bit away") {
    // plant a near neighbor that flips exactly one hyperplane sign so the
    // single-probe bucket join misses it and the Hamming-1 probe finds it
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val planes = Similarity.hyperplanes(nPlanes = 4, dim = 4)
    def bucketOf(v: Array[Float]): Long =
      planes.zipWithIndex.map { case (p, j) =>
        val d = v.zip(p).map { case (x, y) => x * y }.sum
        if (d > 0) 1L << j else 0L
      }.sum
    val qv = Array(1f, 0.2f, 0f, 0f)
    // push qv just across ONE hyperplane (projection along that plane's
    // normal) and keep the candidate only if exactly one bucket bit flips
    val near = (0 until 4).view.flatMap { j =>
      Seq(1e-3, 1e-2).map { eps =>
        val p = planes(j)
        val d = qv.zip(p).map { case (x, y) => x * y }.sum
        val coef = (d + math.signum(d) * eps) / p.map(x => x * x).sum
        qv.zipWithIndex.map { case (x, i) => (x - coef * p(i)).toFloat }
      }
    }.find { c =>
      java.lang.Long.bitCount(bucketOf(c) ^ bucketOf(qv)) == 1
    }
    assert(near.isDefined, "plane reflection must yield a 1-bit neighbor")
    val vecs = Seq((0L, qv), (1L, near.get), (2L, Array(-1f, 0.5f, 3f, 0f)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    val single = Similarity.lshTopK(vecs, q, 3, planes)
      .collect().map(_.getAs[Long]("n_id")).toSet
    val multi = Similarity.lshMultiProbeTopK(vecs, q, 3, planes)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(!single.contains(1L), "planted neighbor must be OUT of the base bucket")
    assert(multi.contains(1L), "Hamming-1 probe must recall it")
  }

  test("PQ ANN: identical vector encodes to the same codes and wins re-rank") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // 16 deterministic codebook/corpus vectors + an exact copy of vec 0
    val rnd = new scala.util.Random(7)
    val base = (0 until 16).map(j => (j.toLong, Array.fill(64)(rnd.nextFloat())))
    val vecs = (base :+ (100L, base.head._2.clone())).toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(vecs, vecs.filter($"vec_id" === 0L), 3)
      .orderBy("rank").collect()
    // the byte-identical copy has identical codes → adist 0 → survives the
    // candidate cut and wins the exact re-rank at sim ≈ 1
    assert(top(0).getAs[Long]("n_id") == 100L, top.mkString(","))
    assert(math.abs(top(0).getAs[Double]("sim") - 1.0) < 1e-12)
  }

  test("IVF+PQ: cell pruning keeps the identical copy reachable and ranked first") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    val base = (0 until 16).map(j => (j.toLong, Array.fill(64)(rnd.nextFloat()), j % 4))
    val vecs = (base :+ ((100L, base.head._2.clone(), 0)))
      .toDF("vec_id", "embedding", "label")
    val top = Similarity.ivfPqTopK(vecs, vecs.filter($"vec_id" === 0L), 3)
      .orderBy("rank").collect()
    // identical copy → same cell assignment, identical codes, adist 0,
    // wins the exact re-rank
    assert(top(0).getAs[Long]("n_id") == 100L, top.mkString(","))
    assert(math.abs(top(0).getAs[Double]("sim") - 1.0) < 1e-12)
  }

  test("k-means PQ trainer: lower distortion than the medoid codebook, deterministic") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(17)
    val vecs = (0 until 64).map(j => (j.toLong, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val trained = graft.ext.PqTrainer.trainCodebook(vecs, sampleN = 64)
    val trained2 = graft.ext.PqTrainer.trainCodebook(vecs, sampleN = 64)
    // deterministic: identical codebooks across invocations
    assert(trained.flatten.flatten.toSeq == trained2.flatten.flatten.toSeq)
    // medoid codebook = first-16 subvectors (what Similarity.codebook picks)
    val medoid = Array.tabulate(8, 16, 8)((s, j, i) => {
      val row = vecs.filter($"vec_id" === j.toLong)
        .select($"embedding").head().getSeq[Float](0)
      row(s * 8 + i).toDouble
    })
    val dTrained = graft.ext.PqTrainer.distortion(vecs, trained, sampleN = 64)
    val dMedoid = graft.ext.PqTrainer.distortion(vecs, medoid, sampleN = 64)
    assert(dTrained <= dMedoid, s"trained $dTrained should beat medoid $dMedoid")
    // a trained codebook drops into the same operator: identical copy wins
    val withCopy = ((0 until 16).map(j =>
      (j.toLong, (0 until 64).map(i => (j * 64 + i) % 97 / 97.0f).toArray))
      :+ (100L, (0 until 64).map(i => i % 97 / 97.0f).toArray))
      .toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(withCopy, withCopy.filter($"vec_id" === 0L), 3,
      trained = Some(graft.ext.PqTrainer.trainCodebook(withCopy, sampleN = 17)))
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("n_id") == 100L)
  }

  test("trained IVF: k-means cells keep the identical copy reachable and ranked first") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(19)
    val base = (0 until 32).map(j => (j.toLong, Array.fill(64)(rnd.nextFloat())))
    val vecs = (base :+ ((100L, base.head._2.clone())))
      .toDF("vec_id", "embedding")
    val cents = graft.ext.PqTrainer.trainCodebook(vecs, m = 1, ksub = 4, sampleN = 32)(0)
    assert(cents.length == 4 && cents.head.length == 64)
    val top = Similarity.ivfTrainedTopK(vecs, vecs.filter($"vec_id" === 0L), 3, cents)
      .orderBy("rank").collect()
    // the identical copy lands in the same trained cell and wins the probe
    assert(top(0).getAs[Long]("n_id") == 100L, top.mkString(","))
    assert(math.abs(top(0).getAs[Double]("sim") - 1.0) < 1e-12)
  }

  test("fully-trained IVF+PQ: trained cells + codewords keep the copy on top") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(23)
    val base = (0 until 32).map(j => (j.toLong, Array.fill(64)(rnd.nextFloat())))
    val vecs = (base :+ ((100L, base.head._2.clone())))
      .toDF("vec_id", "embedding")
    val coarse = graft.ext.PqTrainer.trainCodebook(vecs, m = 1, ksub = 4, sampleN = 32)(0)
    val cw = graft.ext.PqTrainer.trainCodebook(vecs, sampleN = 32)
    val top = Similarity.ivfPqTrainedTopK(vecs, vecs.filter($"vec_id" === 0L), 3,
      coarse, cw).orderBy("rank").collect()
    // identical copy: same trained cell, identical codes, adist 0, wins
    assert(top(0).getAs[Long]("n_id") == 100L, top.mkString(","))
    assert(math.abs(top(0).getAs[Double]("sim") - 1.0) < 1e-12)
  }

  test("residual-trained IVF+PQ: trained cells + residual codewords keep the copy on top") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(29)
    val base = (0 until 32).map(j => (j.toLong, Array.fill(64)(rnd.nextFloat())))
    val vecs = (base :+ ((100L, base.head._2.clone())))
      .toDF("vec_id", "embedding")
    val coarse = graft.ext.PqTrainer.trainCodebook(vecs, m = 1, ksub = 4, sampleN = 32)(0)
    val top = Similarity.ivfPqResidualTrainedTopK(vecs, vecs.filter($"vec_id" === 0L),
      3, coarse, sampleN = 32).orderBy("rank").collect()
    assert(top(0).getAs[Long]("n_id") == 100L, top.mkString(","))
    assert(math.abs(top(0).getAs[Double]("sim") - 1.0) < 1e-12)
  }

  test("residual IVF+PQ: identical copy shares cell and residual codes, wins re-rank") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(13)
    val base = (0 until 16).map(j => (j.toLong, Array.fill(64)(rnd.nextFloat()), j % 4))
    val vecs = (base :+ ((100L, base.head._2.clone(), 0)))
      .toDF("vec_id", "embedding", "label")
    val top = Similarity.ivfPqResidualTopK(vecs, vecs.filter($"vec_id" === 0L), 3)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("n_id") == 100L, top.mkString(","))
    assert(math.abs(top(0).getAs[Double]("sim") - 1.0) < 1e-12)
  }

  test("MP4 decode: mvhd walk, synth round-trip, hostile inputs safe") {
    val metas = Multimodal.decodeVideo(Multimodal.synthVideoBlobs(
        Seq((0L, "short clip"), (1L, "another"), (2L, "third one"))
          .toDF("doc_id", "text")))
      .collect().map(m => m.doc_id -> m).toMap
    // closed-form params round-trip through the structural parse
    assert(metas(0L).timescale == 600L && metas(0L).duration == 600L &&
      metas(0L).duration_ms == 1000L && metas(0L).format == "mp4")
    assert(metas(1L).timescale == 1000L && metas(1L).duration_ms == 2000L)
    assert(metas(2L).timescale == 90000L && metas(2L).duration_ms == 3000L)
    assert(metas(0L).bytes == 144L + 10L, "ftyp+moov+mdat header = 144 bytes")
    // non-video and hostile payloads degrade to raw, never crash/loop
    assert(Multimodal.parseMp4Header("just text".getBytes) == ((0L, 0L)))
    assert(Multimodal.parseMp4Header(Array.emptyByteArray) == ((0L, 0L)))
    val hostile = "....ftyp".getBytes ++ Array.fill[Byte](20)(0x7f)
    assert(Multimodal.parseMp4Header(hostile) == ((0L, 0L)))
  }

  test("REAL pixel decode: ImageIO round-trip, deterministic NN resize, hostile fallback") {
    val docs = Seq((5L, "x"), (9L, "y"), (20L, "z")).toDF("doc_id", "text")
    val metas = Multimodal.decodeResize(Multimodal.synthRealImages(docs))
      .collect().map(m => m.doc_id -> m).toMap
    // closed-form dims survive the REAL PNG encode→decode round trip
    assert(metas(5L).width == 9L && metas(5L).height == 9L) // 5%13+4, 5%11+4
    assert(metas(20L).width == 11L && metas(20L).height == 13L)
    assert(metas.values.forall(_.decodable))
    // resize caps the longer side at 8, floor-scaled aspect: 11x13 → 6x8
    assert(metas(20L).out_w == 6L && metas(20L).out_h == 8L)
    assert(metas(5L).out_w == 8L && metas(5L).out_h == 8L)
    // the pixel hash is the REAL raster: recompute doc 5's expected md5
    // from the pattern directly (no ImageIO on the reference side)
    val md = java.security.MessageDigest.getInstance("MD5")
    val (w, h, ow, oh, id) = (9, 9, 8, 8, 5L)
    for (y <- 0 until oh; x <- 0 until ow) {
      val (sx, sy) = (x * w / ow, y * h / oh)
      md.update(Array(
        ((sx * 31 + id) % 256).toByte,
        ((sy * 17 + id * 3) % 256).toByte,
        ((sx * sy + id * 7) % 256).toByte))
    }
    assert(metas(5L).pixel_md5 == md.digest().map("%02x".format(_)).mkString,
      "decoded+resized pixels must equal the generating pattern sampled directly")
    // hostile / non-image payloads degrade to decodable=false, never throw
    val junk = Multimodal.decodeResize(
      Multimodal.asBlobs(Seq((1L, "not an image")).toDF("doc_id", "text")))
      .collect().head
    assert(!junk.decodable && junk.pixel_md5.isEmpty)
    // the STRUCTURAL synthetic container (valid header, text payload) is
    // also correctly refused by the real decoder
    val synthetic = Multimodal.decodeResize(
      Multimodal.synthBlobs(Seq((0L, "text payload")).toDF("doc_id", "text")))
      .collect().head
    assert(!synthetic.decodable)
  }

  test("WAV decode parses REAL javax.sound-encoded audio; synth round-trips") {
    // capability proof: a WAV produced by the JDK's own audio writer (not
    // our synthesizer) must yield its true format parameters
    val fmt = new javax.sound.sampled.AudioFormat(22050f, 16, 2, true, false)
    val pcm = new Array[Byte](22050 * 4 / 10) // 0.1 s of stereo 16-bit
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 4)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val (rate, ch, bits, dataLen) = Multimodal.parseWavHeader(out.toByteArray)
    assert((rate, ch, bits, dataLen) == ((22050L, 2L, 16L, pcm.length.toLong)),
      s"real JDK WAV must parse: ($rate, $ch, $bits, $dataLen)")
    // and OUR synthesized container is readable by the EXTERNAL decoder
    val blob = Multimodal.synthAudioBlobs(
      Seq((2L, "abcdefgh")).toDF("doc_id", "text")).collect().head.data
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(blob))
    assert(aff.getFormat.getSampleRate == 44100f &&
      aff.getFormat.getChannels == 1 &&
      aff.getFormat.getSampleSizeInBits == 16,
      s"javax.sound must read the synthesized header: ${aff.getFormat}")
    // non-audio payloads are 'raw', no NaZ/garbage
    assert(Multimodal.parseWavHeader("not audio at all".getBytes) ==
      ((0L, 0L, 0L, 0L)))
  }

  test("audio features reduce the REAL PCM words, odd trailing byte dropped") {
    import spark.implicits._
    // "ab" → one word 97 + 256·98 = 25185; "abc" → same word, 'c' dropped
    val feats = Multimodal.decodeAudioFeatures(Multimodal.synthAudioBlobs(
        Seq((1L, "ab"), (2L, "abc"), (3L, "aa")).toDF("doc_id", "text")))
      .collect().map(f => f.doc_id -> f).toMap
    val w = 97L + 256L * 98L
    assert(feats(1L) == Multimodal.AudioFeatures(1L, 1L, w * w, w))
    assert(feats(2L) == Multimodal.AudioFeatures(2L, 1L, w * w, w))
    val wa = 97L + 256L * 97L
    assert(feats(3L) == Multimodal.AudioFeatures(3L, 1L, wa * wa, wa))
    // non-WAV payload degrades to zeros, never throws
    assert(Multimodal.audioFeatures(Multimodal.Blob(9L, "junk".getBytes)) ==
      Multimodal.AudioFeatures(9L, 0L, 0L, 0L))
  }

  test("multimodal decode parses REAL ImageIO-encoded PNG and JPEG headers") {
    // the capability proof: files produced by the JDK's own encoders (not
    // our synthesizer) must yield their true dimensions
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x336699)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt encoder")
      out.toByteArray
    }
    assert(Multimodal.parseImageHeader(encode("png", 123, 45)) ==
      ((123L, 45L, "png")))
    assert(Multimodal.parseImageHeader(encode("jpg", 320, 200)) ==
      ((320L, 200L, "jpeg")))
    assert(Multimodal.parseImageHeader(encode("gif", 77, 31)) ==
      ((77L, 31L, "gif")))
    assert(Multimodal.parseImageHeader("plain text".getBytes) ==
      ((0L, 0L, "raw")))
    assert(Multimodal.parseImageHeader(Array.emptyByteArray) ==
      ((0L, 0L, "raw")))
  }

  test("synthesized multimodal corpus: valid headers, true dims, payload intact") {
    val docs = Seq((0L, "png doc"), (1L, "jpeg doc"), (2L, "raw doc"))
      .toDF("doc_id", "text")
    val metas = Multimodal.decode(Multimodal.synthBlobs(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(0L).format == "png" && metas(0L).width == 1L &&
      metas(0L).height == 1L && metas(0L).bytes == 33L + 7L)
    assert(metas(1L).format == "jpeg" && metas(1L).width == 2L &&
      metas(1L).height == 8L && metas(1L).bytes == 39L + 8L)
    assert(metas(2L).format == "raw" && metas(2L).width == 0L &&
      metas(2L).bytes == 7L)
    // payload digest = md5 of the original text for every container
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString
    assert(metas(0L).payload_md5 == md5("png doc"))
    assert(metas(1L).payload_md5 == md5("jpeg doc"))
    assert(metas(2L).payload_md5 == md5("raw doc"))
    // and the synthesized PNG is decodable by an EXTERNAL decoder: ImageIO
    // reads our header far enough to expose dimensions via ImageReader
    val png = Multimodal.synthBlobs(Seq((30L, "x")).toDF("doc_id", "text"))
      .collect().head.data
    val it = javax.imageio.ImageIO.getImageReaders(
      javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(png)))
    assert(it.hasNext, "ImageIO must recognize the synthesized PNG signature")
    val rd = it.next()
    rd.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(png)))
    assert(rd.getWidth(0) == 31 && rd.getHeight(0) == (30 * 7 % 1080) + 1)
  }

  test("PII redaction: per-category counts + redacted digest, row-local") {
    val docs = Seq(
      (1L, "mail a@b.io and c.d+x@e-f.org call 555-123-4567 ssn 123-45-6789 ip 10.0.0.1"),
      (2L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("emails") == 2L)
    assert(r1.getAs[Long]("phones") == 1L)
    assert(r1.getAs[Long]("ssns") == 1L)
    assert(r1.getAs[Long]("ips") == 1L)
    val expected = "mail <EMAIL> and <EMAIL> call <PHONE> ssn <SSN> ip <IP>"
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes).map("%02x".format(_)).mkString
    assert(r1.getAs[String]("redacted_md5") == md5)
    val r2 = out(2L)
    assert(Seq("emails", "phones", "ssns", "ips").forall(r2.getAs[Long](_) == 0L))
  }

  test("chunking: 64-token windows at stride 48, trailing partial kept") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "just three tokens")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // starts 0, 48, 96 → lengths 64, 52, 4
    assert(out == Map((1L, 0L) -> 64L, (1L, 1L) -> 52L, (1L, 2L) -> 4L,
      (2L, 0L) -> 3L))
    // a chunk digest equals the md5 of the joined token window
    val first = TextAnalysis.chunkDocs(docs)
      .filter(col("doc_id") === 1 && col("chunk_id") === 2)
      .head().getAs[String]("chunk_md5")
    val tail = (97 to 100).map(i => s"t$i").mkString(" ")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(tail.getBytes).map("%02x".format(_)).mkString
    assert(first == md5)
  }

  test("redaction and chunking plans are exchange-free (narrow, ingest-safe)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    Seq(TextAnalysis.redactPii(docs), TextAnalysis.chunkDocs(docs)).foreach { df =>
      val ex = df.queryExecution.executedPlan.collect {
        case x: org.apache.spark.sql.execution.exchange.Exchange => x
      }
      assert(ex.isEmpty, s"row-local operator must not exchange:\n${df.queryExecution}")
    }
  }

  test("text quality: integer-scaled stats") {
    val r = Seq((1L, "the cat sat")).toDF("doc_id", "text")
      .select(TextAnalysis.qualityCols($"text"): _*).head()
    assert(r.getAs[Long]("words") == 3L)
    assert(r.getAs[Long]("avg_wlen_x100") == 300L)  // 9 chars / 3 words
    assert(r.getAs[Long]("stop_x10000") == 3333L)   // "the" of 3
  }

  test("fingerprint: stable under identical content, differs across docs") {
    val fps = corpus.select($"doc_id",
      TextAnalysis.fingerprint(TextAnalysis.tokens($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(101L))
    assert(fps(0L) != fps(2L))
  }

  test("keepCanonical drops every non-canonical member, keeps the rest") {
    // corpus: 0~100 near-dups, 1=101 exact dups, 2 and 3 unique
    val kept = Dedup.keepCanonical(corpus,
      Dedup.minhashLshPairs(corpus, bands = 8, thresholdX10000 = 5000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.keySet == Set(0L, 1L, 2L, 3L), s"got ${kept.keySet}")
    assert(kept(0L) == 0L && kept(2L) == 2L) // cluster label = min member id
  }

  test("keepCanonicalLsh matches keepCanonical-over-expanded-pairs row for row") {
    // same corpus, but the fused path feeds connected components only the
    // REPRESENTATIVE pairs (one node per distinct content) and attaches
    // members through the group map — the member-expanded O(group²) edge
    // set never exists
    val viaPairs = Dedup.keepCanonical(corpus,
      Dedup.minhashLshPairs(corpus, bands = 8, thresholdX10000 = 5000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fused = Dedup.keepCanonicalLsh(corpus, bands = 8, thresholdX10000 = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused == viaPairs, s"fused=$fused viaPairs=$viaPairs")
  }

  test("decontamination flags docs sharing an 8-gram with the probe set") {
    val benchQ = "what is the capital city of france and when was it founded exactly"
    val docs = Seq(
      (100L, benchQ),                                     // probe (id % 100 == 0)
      (1L, "some training text containing " + benchQ + " verbatim inside it"),
      (2L, "completely clean document with no overlap at all in any window " +
        "of eight tokens from the benchmark probes whatsoever here"),
      (3L, "short doc")                                   // < 8 tokens → no grams
    ).toDF("doc_id", "text")
    val out = graft.ext.Contamination
      .contaminatedDocs(docs, docs.filter($"doc_id" % 100 === 0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L), s"got $out")
    // the 13-token probe has 6 8-grams; all 6 appear verbatim in doc 1
    assert(out(1L) == 6L)
    // probe docs never flag themselves
    assert(!out.contains(100L))
  }

  test("stratified sample: per-language rates over the content-hash bucket") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "de", "eins zwei drei vier"),
      (3L, "en", "alpha beta gamma delta")) // same content as 1 → same decision
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.stratifiedSample(docs, Map("en" -> 20), defaultRate = 50)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // byte-identical docs share the bucket, so 1 and 3 are kept or dropped
    // together regardless of ids
    assert(out.count(_._2 == "en") % 2 == 0)
    // every surviving row honors its stratum's rate
    assert(out.forall { case (_, lang, b) => b < (if (lang == "en") 20 else 50) })
  }

  test("pointer doubling converges on a chain far longer than maxIter") {
    // a 40-hop path needs 40 plain propagation rounds — far over
    // maxIter=15 — but O(log 40) with the shortcut pass. r15: the DEFAULT
    // now self-escalates to doubling after 4 plain rounds, so the long
    // chain converges without the explicit flag; capping maxIter below
    // the escalation point still fails loudly (no silent partial labels).
    val chain = (1L to 40L).map(i => (i, i + 1)).toDF("ida", "idb")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 4)
    }
    val escalated = Dedup.connectedComponents(chain, maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(escalated.size == 41 && escalated.values.forall(_ == 1L))
    val comps = Dedup.connectedComponents(chain, maxIter = 15, pointerDoubling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 41 && comps.values.forall(_ == 1L))
  }

  test("connectedComponents reliable-checkpoint path labels identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("ida", "idb")
    val comps = Dedup.connectedComponents(pairs, reliableCheckpoint = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("quality filter assigns the FIRST failing rule as the reason") {
    val docs = Seq(
      (1L, "en", "the quantum computing architecture requires the careful " +
        "analysis of the distributed systems and the persistent storage " +
        "layers while a comprehensive monitoring framework observes the " +
        "throughput metrics in the production cluster environment today"),
      (2L, "en", "tiny doc"),                            // too_short
      (3L, "fr", "le developpement des architectures distribuees necessite " +
        "une analyse approfondie des systemes persistants et des " +
        "plateformes infonuagiques modernes the of and to in is " +
        "the of and to in is"),
      (4L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
        "plus more filler words here now")               // no stopwords
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.qualityFilter(docs).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("reason"))).toMap
    assert(out(1L).isEmpty)                        // kept
    assert(out(2L).contains("too_short"))          // short beats low_stopword
    assert(out(3L).contains("non_english"))        // passes stats, fails lang
    assert(out(4L).contains("low_stopword"))
  }

  test("int8 quantization: scale is max |x|, floor semantics, zero-safe") {
    val rows = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = graft.ext.Embeddings.quantizeInt8(rows).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(out(1L)._1 == 1.0)
    // CSV-joined so the column is a sortable scalar (driver harnesses and
    // tabular sinks can't sort arrays): floor(0.5*127)=63, floor(0.25*127)=31
    assert(out(1L)._2 == "63,-127,31")
    assert(out(2L)._1 == 0.0 && out(2L)._2 == "0,0,0")
  }

  test("resize stub: strided subsample, ≤64 bytes out, digest of the samples") {
    val short = "abc"                      // len<64 → stride 1, out=len
    val long = ("x" * 100) + ("y" * 100)   // len=200 → stride 3, out=64
    val out = Multimodal.resize(Multimodal.asBlobs(
      Seq((1L, short), (2L, long)).toDF("doc_id", "text"))).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(1L).stride == 1L && out(1L).out_bytes == 3L)
    assert(out(1L).digest == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(out(2L).stride == 3L && out(2L).out_bytes == 64L)
    // samples: positions 0,3,..,99 are 'x' (34 of them), then 'y' ×30
    val expected = "x" * 34 + "y" * 30
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(out(2L).digest ==
      md.digest(expected.getBytes).map("%02x".format(_)).mkString)
  }

  test("corpus pipeline: stage order and one disposition per document") {
    // doc 2 fails quality; 10=11 exact dups; 20~21 near-dups; 30 clean
    val en = "the quantum computing architecture requires the careful " +
      "analysis of the distributed systems and the persistent storage " +
      "layers while a comprehensive monitoring framework observes the " +
      "throughput metrics in the production cluster environment today"
    val docs = Seq(
      (2L, "tiny doc", "en"),
      (10L, en, "en"), (11L, en, "en"),
      (20L, en + " plus an extra distinguishing sentence near the end", "en"),
      (30L, "completely different the of and to in is content about " +
        "catalyst optimizer rules and physical planning strategies with " +
        "broadcast exchanges shuffling partitions across the executors " +
        "while the adaptive engine rewrites the running query plans", "en")
    ).toDF("doc_id", "text", "lang")
    val out = graft.ext.CorpusPipeline.run(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2))))).toMap
    assert(out.size == 5, s"one row per doc: $out")
    assert(out(2L)._1 == "quality:too_short" && out(2L)._2.isEmpty)
    assert(out(10L)._1 == "kept" && out(10L)._2.isDefined)
    assert(out(11L)._1 == "exact_dup")
    // 20 is a near-dup of 10 (suffix) → dropped in the LSH/CC stage OR kept
    // if banding misses; with these texts it collides: canonical 10 wins
    assert(out(20L)._1 == "near_dup", s"got ${out(20L)}")
    assert(out(30L)._1 == "kept")
  }

  test("corpus pipeline plan: one derivation chain, no union of drop sets") {
    // The dispositions must assemble via a left-join chain, not a union
    // that re-derives the quality/exact subtrees per status branch. Over a
    // parquet input the corpus scan count exposes re-derivation directly:
    // the disposition join + the exact-dedup subtree + the LSH rep-state's
    // two consumers (rep pairs, member attachment) = 4 scans; the r3 union
    // formulation produced ~6.
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val docs = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "text", "lang")
      val plan = graft.ext.CorpusPipeline.run(docs).queryExecution.executedPlan
      val unions = plan.collect { case u: org.apache.spark.sql.execution.UnionExec => u }
      assert(unions.isEmpty, s"disposition assembly must not union drop sets:\n$unions")
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size <= 4,
        s"corpus must be derived at most 4× (join chain + exact + LSH×2), got ${scans.size}")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sequence packing: shard-local start-offset bins, straddle stays put") {
    val docs = Seq(
      (0L, "a b c"),         // shard 0, start 0 → bin 0
      (2L, "d e f g"),       // shard 0, start 3, straddles the 5-boundary → bin 0
      (4L, "h i"),           // shard 0, start 7 → bin 1
      (1L, "x x x x x x")    // shard 1 packs independently: start 0 → bin 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.packBins(docs, budgetTokens = 5, shards = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(out(0L) == ((0L, 0L)))
    assert(out(2L) == ((0L, 0L)))
    assert(out(4L) == ((0L, 1L)))
    assert(out(1L) == ((1L, 0L)))
  }

  test("sequence packing plan: window partitions by shard, never global") {
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val docs = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
      val plan = TextAnalysis.packBins(docs, 2048, shards = 8)
        .queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, "packing is order-dependent: a window is expected")
      // a GLOBAL cumsum (empty partition spec) would funnel the corpus
      // into one task — the spec must carry the shard key
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"pack window must partition by shard:\n${windows.mkString("\n")}")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("hash split: content-addressed — identical text lands in one split") {
    val docs = Seq((1L, "same content here"), (2L, "same content here"),
      (3L, "different content")).toDF("doc_id", "text")
    val out = TextAnalysis.hashSplit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == out(2L), "duplicate text must share bucket AND split")
    assert(out.values.forall { case (b, s) =>
      (b < 80 && s == "train") || (b >= 80 && b < 90 && s == "val") ||
        (b >= 90 && s == "test") })
  }

  test("vocab top-k: frequency order with deterministic token tie-break") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a c d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabTopK(docs, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("repetition stats: self-repeating doc maxes dup3, unique doc zeroes") {
    val docs = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "all tokens here are completely unique words"),
      (3L, "xy")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: 7 3-grams (abc×3 bca×2 cab×2), every occurrence duplicated;
    // top 2-gram "a b" takes 3 of 8 occurrences
    assert(out(1L) == ((7L, 10000L, 3750L)))
    // doc 2: 7 tokens, all grams unique; top 2-gram 1 of 6
    assert(out(2L) == ((5L, 0L, 1666L)))
    // doc 3: one token — no grams, but the row survives zeroed
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("span dedup: shared 8-token window found across docs, clean doc zero") {
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, shared + " tail1 a b c"),
      (2L, shared + " other tail here now"),
      (3L, "totally different words with no overlap at all present here")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 1,2: 12 tokens → spans at starts 0 and 4; start-0 span is the
    // shared window, start-4 spans diverge
    assert(out(1L) == ((2L, 1L)))
    assert(out(2L) == ((2L, 1L)))
    assert(out(3L)._2 == 0L)
  }

  test("mixture rebalance: over-target stratum caps at 100%, rest downsamples") {
    val docs = (0 until 40).map(i => (i.toLong, if (i < 30) "en" else "zh",
      (0 until 10).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "lang", "text")
    // en: 300 tokens, zh: 100; budget 300 at 50/50 → en quota 150 (rate
    // 50%), zh quota 150 > 100 (rate caps at 100%)
    val out = TextAnalysis.mixToTargets(docs, Map("en" -> 50, "zh" -> 50), 300L)
      .collect()
    val zh = out.filter(_.getString(1) == "zh")
    val en = out.filter(_.getString(1) == "en")
    assert(zh.length == 10, "capped stratum keeps everything")
    assert(zh.forall(_.getLong(4) == 10000L))
    assert(en.forall(_.getLong(4) == 5000L))
    assert(en.length < 30, "under-target stratum must downsample")
  }

  test("unigram LM score: common-token docs score low, rare-token docs high") {
    val docs = Seq((1L, "a a a a"), (2L, "a a b")).toDF("doc_id", "text")
    // vocab: a×6 b×1, total 7 → ilog2(7)=2, ilog2(6)=2, ilog2(1)=0 →
    // bits(a)=0, bits(b)=2
    val out = TextAnalysis.unigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((4L, 0L)))
    assert(out(2L) == ((3L, 66L)))
  }

  test("gram matrix: exact integer second moments") {
    val vecs = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val g = graft.ext.Embeddings.gramMatrix(vecs, dim = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // q = (10000,20000), (30000,40000)
    assert(g((0L, 0L)) == 1000000000L)
    assert(g((0L, 1L)) == 1400000000L)
    assert(g((1L, 0L)) == 1400000000L)
    assert(g((1L, 1L)) == 2000000000L)
  }

  test("PCA: dominant axis recovered, training deterministic, opposite projections") {
    val vecs = Seq(
      (0L, Array(0.5f, 0.01f, 0.0f, 0.0f)),
      (1L, Array(-0.5f, 0.0f, 0.01f, 0.0f)),
      (2L, Array(0.45f, 0.0f, 0.0f, 0.01f)),
      (3L, Array(-0.45f, 0.01f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val (n, s, g) = graft.ext.PcaTrainer.moments(vecs, dim = 4)
    assert(n == 4L)
    val comps = graft.ext.PcaTrainer.trainPca(n, s, g, k = 2)
    val again = graft.ext.PcaTrainer.trainPca(n, s, g, k = 2)
    assert(comps.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "training must be bit-deterministic")
    assert(math.abs(comps(0)(0)) > 0.99, "axis 0 carries the variance")
    val proj = graft.ext.PcaTrainer
      .project(vecs, comps, graft.ext.PcaTrainer.meanOf(n, s))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val p0 = proj(0L).split(",")(0).toLong
    val p1 = proj(1L).split(",")(0).toLong
    assert(p0.sign == -p1.sign && math.abs(p0) > 3000,
      s"opposite points must project to opposite signs, got $p0 / $p1")
  }

  test("CM sketch: estimates dominate exact counts, hot token surfaces") {
    val docs = Seq((1L, ("hot " * 50) + "cold rare"), (2L, "hot cold"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.cmsHeavyHitters(docs, topN = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, exact, est) => est >= exact },
      "a Count-Min estimate can only over-count")
    assert(out.find(_._1 == "hot").exists(_._2 == 51L))
  }

  test("TF-IDF top-k: integer idf bits, rare terms outrank ubiquitous ones") {
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "cherry shared shared"),
      (3L, "shared")).toDF("doc_id", "text")
    // N=3 → ilog2(3)=1; unique terms idf_bits=1, 'shared' (df=3) = 0
    val out = TextAnalysis.tfidfTopK(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    assert(out((1L, 1L)) == (("apple", 2L)))   // tf 2 × idf 1
    assert(out((1L, 2L)) == (("banana", 1L)))
    assert(out((1L, 3L)) == (("shared", 0L)))
    assert(out((2L, 1L)) == (("cherry", 1L)))
    assert(out((3L, 1L)) == (("shared", 0L)))
  }

  test("persisted IVF: on-disk cell partitions, probe equals the in-memory plan") {
    val sf = "/root/testdata/sf0.001"
    val e = graft.queries.Synth.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    val out = Similarity.ivfPersistedTopK(e, q, 5, path)
      .orderBy("q_id", "rank").collect().toSeq
    val base = Similarity.ivfTopK(e, q, 5).orderBy("q_id", "rank").collect().toSeq
    assert(out == base, "persisted probe must reproduce the in-memory result")
    val parts = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("ivf_cell="))
    assert(parts.nonEmpty, "the directory layout IS the inverted index")
  }

  test("persisted IVF x SQ8: on-disk int8 code partitions, probe equals in-memory") {
    val sf = "/root/testdata/sf0.001"
    val e = graft.queries.Synth.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfsq8-spec").toString
    val out = Similarity.ivfSq8PersistedTopK(e, q, 5, path)
      .orderBy("q_id", "rank").collect().toSeq
    val base = Similarity.ivfSq8TopK(e, q, 5).orderBy("q_id", "rank").collect().toSeq
    assert(out == base, "persisted SQ8 probe must reproduce the in-memory result")
    val parts = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("ivf_cell="))
    assert(parts.nonEmpty, "the directory layout IS the inverted code index")
    // stored representation is codes only — no raw embeddings on disk
    val stored = spark.read.parquet(path)
    assert(stored.columns.sorted.toSeq == Seq("codes", "ivf_cell", "n_id"))
  }

  test("persisted IVF+PQ: on-disk code partitions, probe equals in-memory") {
    val sf = "/root/testdata/sf0.001"
    val e = graft.queries.Synth.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-spec").toString
    val out = Similarity.ivfPqPersistedTopK(e, q, 5, path)
      .orderBy("q_id", "rank").collect().toSeq
    val base = Similarity.ivfPqTopK(e, q, 5).orderBy("q_id", "rank").collect().toSeq
    assert(out == base, "persisted code probe must reproduce the in-memory result")
    val parts = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("ivf_cell="))
    assert(parts.nonEmpty, "the directory layout IS the inverted code index")
    // the stored representation is the COMPRESSED one: codes, no embeddings
    val stored = spark.read.parquet(path)
    assert(stored.columns.sorted.toSeq == Seq("codes", "ivf_cell", "n_id"))
  }

  test("BPE training: greedy merges, overlap counting, lexicographic ties") {
    val docs = Seq((1L, "aaa aaa ab"), (2L, "aaa ab ab")).toDF("doc_id", "text")
    // vocab: aaa×3, ab×3. Round 1: (a,a) counts 2 per 'aaa' (overlap) = 6
    // beats (a,b) = 3; merge → aaa = [aa, a] (greedy leftmost).
    // Round 2: (aa,a) = 3 ties (a,b) = 3 → lexicographic min (a,b) wins.
    // Round 3: (aa,a) = 3.
    val m = graft.ext.BpeTrainer.train(docs, merges = 3)
    assert(m == Seq(("a", "a", 6L), ("a", "b", 3L), ("aa", "a", 3L)))
  }

  test("BPE token counts: vocabulary fold + token-stream join") {
    val docs = Seq((1L, "aaa aaa ab"), (2L, "aaa ab ab")).toDF("doc_id", "text")
    val m = graft.ext.BpeTrainer.train(docs, merges = 2)
    // after (a,a) and (a,b): aaa = [aa, a] (2 tokens), ab = [ab] (1)
    val out = graft.ext.BpeTrainer.tokenCounts(docs, m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 5L)))
    assert(out(2L) == ((3L, 4L)))
  }

  test("nprobe=2 IVF+PQ candidates dominate single-cell, results stay exact-ranked") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(e, q, 5).select("q_id", "n_id")
    def hits(m: org.apache.spark.sql.DataFrame): Long =
      bf.join(m.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val single = hits(Similarity.ivfPqTopK(e, q, 5))
    val multi = hits(Similarity.ivfPqNprobeTopK(e, q, 5, 2))
    assert(multi >= single,
      s"2-cell code probing must never lose recall: nprobe=$multi single=$single")
    // exactly k unique rows per query — the multi-cell query fan-out must
    // not duplicate result rows
    val rows = Similarity.ivfPqNprobeTopK(e, q, 5, 2)
      .groupBy("q_id").count().collect()
    assert(rows.forall(_.getLong(1) == 5L), "5 unique ranked rows per query")
  }

  test("nprobe=2 IVF x SQ8 dominates single-cell, no dup rows") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(e, q, 5).select("q_id", "n_id")
    def hits(m: org.apache.spark.sql.DataFrame): Long =
      bf.join(m.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val single = hits(Similarity.ivfSq8TopK(e, q, 5))
    val multi = hits(Similarity.ivfSq8NprobeTopK(e, q, 5, 2))
    assert(multi >= single,
      s"2-cell SQ8 probing must never lose recall: nprobe=$multi single=$single")
    val rows = Similarity.ivfSq8NprobeTopK(e, q, 5, 2)
      .groupBy("q_id").count().collect()
    assert(rows.forall(_.getLong(1) == 5L), "5 unique ranked rows per query")
  }

  test("residual nprobe=2: per-cell LUTs, recall dominance, no dup rows") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(e, q, 5).select("q_id", "n_id")
    def hits(m: org.apache.spark.sql.DataFrame): Long =
      bf.join(m.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val single = hits(Similarity.ivfPqResidualTopK(e, q, 5))
    val multi = hits(Similarity.ivfPqResidualNprobeTopK(e, q, 5, 2))
    assert(multi >= single,
      s"2-cell residual probing must never lose recall: nprobe=$multi single=$single")
    val rows = Similarity.ivfPqResidualNprobeTopK(e, q, 5, 2)
      .groupBy("q_id").count().collect()
    assert(rows.forall(_.getLong(1) == 5L), "5 unique ranked rows per query")
    // nprobe=1 must degenerate EXACTLY to the single-cell plan: the
    // per-probed-cell LUT of the top-1 cell is the own-cell LUT
    val a = Similarity.ivfPqResidualNprobeTopK(e, q, 5, 1)
      .collect().map(_.toSeq).toSet
    val b = Similarity.ivfPqResidualTopK(e, q, 5).collect().map(_.toSeq).toSet
    assert(a == b, "nprobe=1 residual must equal the single-cell residual path")
  }

  test("full production index: persistence + probe fan-out are result-neutral") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    val coarse = graft.ext.PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0)
    val cw = graft.ext.PqTrainer.trainCodebook(e)
    val path = java.nio.file.Files.createTempDirectory("graft-full-ix").toString
    // nprobe=1 through the persisted index == the in-memory trained plan
    val a = Similarity.ivfPqFullTopK(e, q, 5, coarse, cw, path, nprobe = 1)
      .collect().map(_.toSeq).toSet
    val b = Similarity.ivfPqTrainedTopK(e, q, 5, coarse, cw)
      .collect().map(_.toSeq).toSet
    assert(a == b, "persisted nprobe=1 must equal the in-memory trained index")
    // the persisted layout is the compressed inverted index: partitioned
    // by cell, codes only (no embeddings)
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("ivf_cell="))
    assert(parts.nonEmpty, "index must persist partitioned by cell")
    val stored = spark.read.parquet(path)
    assert(stored.columns.sorted.toSeq == Seq("codes", "ivf_cell", "n_id"))
    // nprobe=2 recall dominates
    val bf = Similarity.bruteForceTopK(e, q, 5).select("q_id", "n_id")
    def hits(m: org.apache.spark.sql.DataFrame): Long =
      bf.join(m.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val multi = hits(Similarity.ivfPqFullTopK(e, q, 5, coarse, cw, path, nprobe = 2))
    assert(multi >= hits(Similarity.ivfPqTrainedTopK(e, q, 5, coarse, cw)),
      "nprobe=2 through the full index must never lose recall")
  }

  test("bigram LM: repeated context scores less surprising; short docs drop") {
    // 'a' precedes b 5× in doc 1 but c/d/e/f/g once each in doc 2:
    // p(b|a)=5/10 (1 bit) vs p(c|a)=1/10 (3 bits) — doc 2 is the
    // surprising one UNDER THE SHARED corpus LM
    val docs = Seq(
      (1L, "a b a b a b a b a b"),
      (2L, "a c a d a e a f a g"),
      (3L, "solo"))              // <2 tokens → no bigrams → no row
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.contains(3L), "a 1-token doc has no bigram row")
    assert(out(1L)._1 == 9L && out(2L)._1 == 9L, "9 adjacent pairs each")
    assert(out(1L)._2 < out(2L)._2,
      s"the diverse-successor doc must be more surprising: $out")
    // self-consistency: a bigram that always follows its left token has
    // c1 == c2 → 0 bits (perfectly predicted)
    val pure = Seq((9L, "x y x y x y")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramLmScore(pure).collect().head.getLong(2) <= 100L,
      "near-deterministic transitions ≈ 0-1 bits")
  }

  test("top-quality selection: exact histogram quantile, boundary-inclusive") {
    // 6 docs with strictly distinct surprisal: doc k repeats its own token
    // 2^k times next to one shared token — rarer vocab => higher surprisal
    val docs = (0 until 6).map { k =>
      (k.toLong, (Seq.fill(1 << (5 - k))(s"tok$k") :+ "shared").mkString(" "))
    }.toDF("doc_id", "text")
    val scores = TextAnalysis.unigramLmScore(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores.values.toSeq.distinct.size == 6, s"need distinct scores: $scores")
    // pct=34 of 6 docs → ceil = 3 kept (no ties ⇒ exactly 3)
    val kept = TextAnalysis.selectTopQuality(docs, pct = 34)
      .collect().map(_.getLong(0)).toSet
    assert(kept.size == 3, s"expected exactly 3 kept: $kept")
    val bestThree = scores.toSeq.sortBy(_._2).take(3).map(_._1).toSet
    assert(kept == bestThree, s"kept $kept != lowest-surprisal $bestThree")
    // boundary bucket keeps WHOLE: two score-identical docs straddling the
    // cut both stay (threshold-inclusive contract)
    val tied = Seq((10L, "x x y"), (11L, "x x y"), (12L, "z z z z z z q"))
      .toDF("doc_id", "text")
    val keptTied = TextAnalysis.selectTopQuality(tied, pct = 34)
      .collect().map(_.getLong(0)).toSet
    assert(keptTied.intersect(Set(10L, 11L)).size % 2 == 0,
      s"score ties must keep or drop together: $keptTied")
  }

  test("dedup detection dominance: minhash unconditionally finds exact copies") {
    // byte-identical docs are Jaccard 10000 and always bucket-collide, so
    // every exact-planted id (2M+) MUST appear in the minhash pair output —
    // the guarantee behind dedup_recall's exact ⊆ minhash relationship
    val c = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words entirely here now today folks"),
      (2000001L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(c).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2000001L)),
      s"exact copy must be unconditionally paired: $pairs")
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L },
      "unrelated doc must not pair")
  }

  test("chunk dedup: identical docs' chunks collapse to one canonical") {
    val docs = corpus.toDF("doc_id", "text")
    val res = Dedup.chunkDedup(docs, window = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getBoolean(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // doc 101 is byte-identical to doc 1 → every chunk of 101 is a dup
    // whose canonical is the same chunk_id in doc 1
    res.keys.filter(_._1 == 101L).foreach { case (d, c) =>
      val (kept, cd, cc, n) = res((d, c))
      assert(!kept && cd == 1L && cc == c && n >= 2,
        s"chunk ($d,$c) must defer to doc 1's chunk $c")
    }
    // canonicals are kept and count themselves
    res.keys.filter(_._1 == 1L).foreach { case (d, c) =>
      assert(res((d, c))._1, s"doc 1 chunk $c is the canonical — kept")
    }
    // disposition covers every chunk exactly once
    assert(res.keys.count(_._1 == 101L) == res.keys.count(_._1 == 1L))
  }

  test("SemDeDup: planted copies dropped, keeper rule, no cartesian") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val copies = e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val cents = graft.ext.PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0)
    val res = Dedup.semanticDedup(e.unionByName(copies), cents, 0.99)
    val out = res.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    (0L until 500L by 50L).foreach { id =>
      assert(out(id)._2, s"original $id must be kept (tie -> lower id)")
      assert(!out(id + 1000000)._2, s"copy of $id must be dropped")
      assert(out(id)._1 == out(id + 1000000)._1,
        "an identical copy must land in its original's cluster")
    }
    // nothing else dropped at tau=0.99: max natural pairwise cosine ~0.48
    assert(out.count(!_._2._2) == 10, "exactly the 10 planted copies drop")
    // bucketed, never all-pairs: the executed plan has no cartesian
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no cartesian in SemDeDup plan")
  }

  test("SQ8: codes bounded, near-exact recall, 5 unique rows per query") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    // scales: one double per dim, every |x_i| <= s_i by construction
    val scales = Similarity.sq8Train(e)
    assert(scales.length == 64 && scales.forall(s => s >= 0 && !s.isNaN))
    val res = Similarity.sq8TopK(e, q, 5)
    val perQ = res.groupBy("q_id").count().collect()
    assert(perQ.length == 10 && perQ.forall(_.getLong(1) == 5L),
      "5 unique ranked rows per query")
    // 8-bit per-dim fidelity: recall@5 should be near-exact (>= 80% here;
    // PQ at the same corpus sits lower — the capacity-ladder ordering)
    val bf = Similarity.bruteForceTopK(e, q, 5).select("q_id", "n_id")
    val hits = bf.join(res.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    assert(hits >= 40, s"SQ8 recall@5 too low: $hits/50")
  }

  test("incremental index append == full rebuild (frozen quantizers)") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    val coarse = graft.ext.PqTrainer.trainCodebook(e, m = 1, ksub = 16)(0)
    val cw = graft.ext.PqTrainer.trainCodebook(e)
    val full = java.nio.file.Files.createTempDirectory("graft-ix-full").toString
    val incr = java.nio.file.Files.createTempDirectory("graft-ix-incr").toString
    Similarity.ivfPqBuildIndex(e, coarse, cw, full)
    // epoch 1: first half; epoch 2: append the rest — never re-encoding
    Similarity.ivfPqBuildIndex(e.filter(col("vec_id") < 250), coarse, cw, incr)
    Similarity.ivfPqAppendToIndex(e.filter(col("vec_id") >= 250), coarse, cw, incr)
    val a = Similarity.ivfPqProbeIndex(e, q, 5, coarse, cw, incr, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val b = Similarity.ivfPqProbeIndex(e, q, 5, coarse, cw, full, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(a == b, "append-built index must answer identically to a rebuild")
  }

  test("SQ8 edge: all-zero dimension codes to 0, identical vectors tie exactly") {
    val vs = Seq(
      (0L, Seq.tabulate(64)(i => if (i == 7) 0.0f else (i + 1).toFloat)),
      (1L, Seq.tabulate(64)(i => if (i == 7) 0.0f else (i + 1).toFloat)),
      (2L, Seq.tabulate(64)(i => if (i == 7) 0.0f else (64 - i).toFloat)))
      .toDF("vec_id", "embedding")
    // dim 7 is zero across the corpus → scale 0 → code 0 → decode 0 (no NaN)
    val scales = Similarity.sq8Train(vs)
    assert(scales(7) == 0.0)
    val res = Similarity.sq8TopK(vs, vs.filter(col("vec_id") === 0L), 2)
      .orderBy("rank").collect()
    // identical vector 1 must rank first at cosine ~1 (FP round-off only)
    assert(res.head.getLong(2) == 1L && res.head.getDouble(3) > 0.9999999,
      s"identical vector must be the top hit: ${res.toSeq}")
    assert(res.forall(r => !r.getDouble(3).isNaN), "zero-scale dim must not NaN")
  }

  test("nprobe=2 IVF recall dominates single-cell probing") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(e, q, 5).select("q_id", "n_id")
    def hits(m: org.apache.spark.sql.DataFrame): Long =
      bf.join(m.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val single = hits(Similarity.ivfTopK(e, q, 5))
    val multi = hits(Similarity.ivfNprobeTopK(e, q, 5, 2))
    assert(multi >= single,
      s"probing 2 cells must never lose recall: nprobe=$multi single=$single")
    // every single-cell candidate set is a subset of the 2-cell one, so on
    // this corpus the planted near-boundary neighbors should ADD recall
    assert(multi > single || single == 50L,
      s"expected strict recall gain (or already-perfect recall): $multi vs $single")
  }

  test("BPE vocab-size stopping: alphabet + merges, exhaustion-safe") {
    val docs = Seq((1L, "aaa aaa ab"), (2L, "aaa ab ab")).toDF("doc_id", "text")
    // alphabet {a, b} = 2 → vocab 5 means exactly 3 merges
    assert(graft.ext.BpeTrainer.trainToVocab(docs, 5).size == 3)
    // already at/below the alphabet → nothing to learn
    assert(graft.ext.BpeTrainer.trainToVocab(docs, 2).isEmpty)
    // unreachable target → stops at pair exhaustion, not the budget
    val all = graft.ext.BpeTrainer.trainToVocab(docs, 1000)
    assert(all.size < 998, s"must exhaust, got ${all.size}")
    // exhausted state: every word is one symbol
    val m = all
    val out = graft.ext.BpeTrainer.tokenCounts(docs, m).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L), "fully merged: 1 bpe token per word")
  }

  test("BPE pruned histogram agrees with unpruned on the planted corpus") {
    // "ba" is a count-1 straggler whose single pair (b,a) can never win a
    // round against the frequent a/b pairs — exactly the long-tail mass the
    // production frequency floor/top-N cap exists to shed. (It reuses the
    // {a,b} alphabet so pruning doesn't change trainToVocab's merge budget.)
    val docs = Seq((1L, "aaa aaa aab"), (2L, "aaa aab ab"), (3L, "ba"))
      .toDF("doc_id", "text")
    val full = graft.ext.BpeTrainer.train(docs, merges = 3)
    assert(full.nonEmpty)
    // frequency floor drops zq; merge table unchanged
    assert(graft.ext.BpeTrainer.train(docs, merges = 3, minCount = 2L) == full)
    // top-N cap (3 distinct surviving words: aaa, aab, ab) likewise
    assert(graft.ext.BpeTrainer.train(docs, merges = 3, maxVocabRows = 3) == full)
    // and the vocab-targeted entry point honors the same bound
    assert(graft.ext.BpeTrainer.trainToVocab(docs, 5, minCount = 2L) ==
      graft.ext.BpeTrainer.trainToVocab(docs, 5))
    // the cap is a real bound: capping to ONE word trains only on "aaa"
    val capped = graft.ext.BpeTrainer.train(docs, merges = 2, maxVocabRows = 1)
    assert(capped.map(m => (m._1, m._2)) == Seq(("a", "a"), ("aa", "a")))
  }

  test("BPE driver-local training equals the distributed round loop") {
    val docs = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
      .limit(40)
    val local = graft.ext.BpeTrainer.train(docs, merges = 6)
    val dist = graft.ext.BpeTrainer.trainDistributed(docs, merges = 6)
    assert(local == dist,
      "one-histogram-job driver loop must learn the identical merge table")
  }

  test("ivf_assign / bpe_apply edge contracts: NULLs, dims, empty input") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cents = typedLit(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val rows = Seq(
      (1L, Some(Seq(0.9f, 0.1f))), // nearest cell 0
      (2L, Some(Seq(0.1f, 0.9f))), // nearest cell 1
      (3L, None),                  // NULL embedding -> NULL
      (4L, Some(Seq(1.0f, 2.0f, 3.0f)))) // dim mismatch -> NULL
      .toDF("id", "emb")
    val got = rows.select(col("id"),
        call_function("ivf_assign", col("emb"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(got == Map(1L -> Some(0), 2L -> Some(1), 3L -> None, 4L -> None))
    val mLit = typedLit(Seq(Seq("a", "b")))
    val wgot = Seq((1L, Some("aab")), (2L, Some("")), (3L, Option.empty[String]))
      .toDF("id", "w")
      .select(col("id"), call_function("bpe_apply", col("w"), mLit).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
    assert(wgot(1L) == List("a", "ab"))
    assert(wgot(2L) == Nil)
    assert(wgot(3L) == null)
  }

  test("bpe_apply expression equals the foldMerge HOF chain") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = Seq((1L, "aaa aaa ab"), (2L, "aaa ab ab"), (3L, "baéab b"))
      .toDF("doc_id", "text")
    val m = graft.ext.BpeTrainer.train(docs, merges = 3)
    val mLit = typedLit(m.map { case (p1, p2, _) => Seq(p1, p2) })
    val vocab = graft.ext.BpeTrainer.charVocab(docs)
    val viaExpr = vocab
      .select(col("w"), call_function("bpe_apply", col("w"), mLit).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val viaFold = m.foldLeft(vocab.select(col("w"), col("syms"))) {
        case (df, (p1, p2, _)) =>
          df.select(col("w"), graft.ext.BpeTrainer.foldMerge(col("syms"), p1, p2).as("syms"))
      }.collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(viaExpr == viaFold,
      "codegen'd merge loop must match the per-merge HOF fold chain")
  }

  test("property: nfc_normalize equals java.text.Normalizer on adversarial strings") {
    import org.scalacheck.Gen
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // decomposed sequences, precomposed chars, non-BMP (surrogate pairs),
    // combining marks without a base, plain ASCII
    val atomGen = Gen.oneOf(
      "é", "é", "Å", "Å" /* ANGSTROM SIGN → Å */,
      "😀" /* non-BMP emoji */, "́" /* lone combining */,
      "abc", " ", "ḍ̇" /* d-dot-above + dot-below: reorders */)
    val strGen = for {
      n <- Gen.choose(0, 6)
      parts <- Gen.listOfN(n, atomGen)
    } yield parts.mkString
    var seed = org.scalacheck.rng.Seed(11L)
    val cases = (1 to 300).map { i =>
      val s = strGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      (i.toLong, s)
    }
    val got = cases.toDF("id", "s")
      .select(col("id"), call_function("nfc_normalize", col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, s) =>
      val exp = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got(id) == exp, s"id $id input ${s.codePoints().toArray.toSeq}")
    }
  }

  test("property: BPE greedy-leftmost fold matches the reference implementation") {
    import org.scalacheck.Gen
    def ref(syms: Seq[String], p1: String, p2: String): List[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == p1 && x == p2) acc.init :+ (p1 + p2)
        else acc :+ x
      }.toList
    val symGen = Gen.oneOf("a", "b", "ab", "c")
    val caseGen = for {
      n <- Gen.choose(0, 8)
      syms <- Gen.listOfN(n, symGen)
      p1 <- symGen
      p2 <- symGen
    } yield (syms, p1, p2)
    var seed = org.scalacheck.rng.Seed(7L)
    val samples = (1 to 200).map { i =>
      val c = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      (i.toLong, c._1, c._2, c._3)
    }
    // one Spark job per distinct pair (the pair is a plan literal)
    samples.groupBy(c => (c._3, c._4)).foreach { case ((p1, p2), group) =>
      val df = group.map(g => (g._1, g._2)).toDF("id", "syms")
      val out = df.select(col("id"),
          graft.ext.BpeTrainer.foldMerge(col("syms"), p1, p2).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      group.foreach { g =>
        assert(out(g._1) == ref(g._2, p1, p2),
          s"fold mismatch for ${g._2} with ($p1,$p2)")
      }
    }
  }

  test("property: inline repetition equals relational repetition on random docs") {
    import org.scalacheck.Gen
    val docGen = for {
      n <- Gen.choose(0, 12)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield ts.mkString(" ")
    var seed = org.scalacheck.rng.Seed(11L)
    val docs = (1 to 60).map { i =>
      val t = docGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val rel = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val inl = TextAnalysis.repetitionInline(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rel == inl)
  }

  test("property: span-dup stats match a naive reference on random corpora") {
    import org.scalacheck.Gen
    val docGen = for {
      n <- Gen.choose(0, 20)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield ts
    var seed = org.scalacheck.rng.Seed(13L)
    val docs = (1 to 30).map { i =>
      val t = docGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      (i.toLong, t)
    }
    // naive reference: window-8/stride-4 spans, dup = span text shared by
    // more than one distinct doc
    def spansOf(ts: Seq[String]): Seq[String] =
      if (ts.length < 8) Nil
      else (0 to (ts.length - 8) / 4).map(s => ts.slice(s * 4, s * 4 + 8).mkString(" "))
    val all = docs.flatMap { case (id, ts) => spansOf(ts).map(sp => (id, sp)) }
    val dupSet = all.groupBy(_._2).filter(_._2.map(_._1).distinct.size > 1).keySet
    val expected = docs.flatMap { case (id, ts) =>
      val sp = spansOf(ts)
      if (sp.isEmpty) None
      else {
        val dup = sp.count(dupSet)
        Some(id -> ((sp.size.toLong, dup.toLong,
          (10000L * dup / sp.size).toLong)))
      }
    }.toMap
    val out = Dedup.spanDupStats(
      docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == expected, s"span stats diverged from the naive reference")
  }

  test("property: CM estimates dominate exact counts on random corpora") {
    import org.scalacheck.Gen
    val docGen = for {
      n <- Gen.choose(1, 15)
      ts <- Gen.listOfN(n, Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6", "w7"))
    } yield ts.mkString(" ")
    var seed = org.scalacheck.rng.Seed(17L)
    val docs = (1 to 40).map { i =>
      val t = docGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val out = TextAnalysis.cmsHeavyHitters(docs, topN = 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (_, exact, est) => est >= exact },
      s"Count-Min must never under-count: $out")
  }

  test("repetitionInline: row-local twin matches relational stats, zero shuffle") {
    val docs = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "all tokens here are completely unique words"),
      (3L, "xy"),
      (4L, "x y x y x y x y z")).toDF("doc_id", "text")
    val rel = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val inl = TextAnalysis.repetitionInline(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rel == inl, s"inline twin diverged: $rel vs $inl")
    // streaming-admission contract: a pure row-local projection
    val plan = TextAnalysis.repetitionInline(docs).queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"),
      "repetitionInline must not shuffle (ingest-time row-local gate)")
  }

  test("r5 signal plans: no window funnels, no cartesian products") {
    // every round-5 signal reduces via high-cardinality aggregations —
    // a WindowExec or cartesian anywhere in these plans would be a
    // per-group funnel / all-pairs regression
    val sf = "/root/testdata/sf0.001"
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try Seq("text_repetition", "text_unigram_lm", "dedup_span_exact",
      "corpus_mix_domains", "corpus_curation_report", "emb_gram", "emb_pca",
      "text_tfidf_topk", "ann_range_search")
      .foreach { k =>
        val plan = SparkEntry.queries(k)(spark, sf).queryExecution.executedPlan
        val windows = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w }
        assert(windows.isEmpty, s"$k must not contain WindowExec")
        val cart = plan.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
          case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
              // the one legitimate NLJ: broadcasting a single-row total
              // (unigram-LM corpus size) is a constant, not a corpus
              if b.left.schema.length > 2 && b.right.schema.length > 2 => b
        }
        assert(cart.isEmpty, s"$k must not contain cartesian/NLJ over data:\n$cart")
      }
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("LSQ quality classifier: weights solve the normal equations, planted domain learned") {
    import graft.ext.Selection
    val docs = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id",
        "CASE WHEN doc_id % 5 = 0 THEN text || ' the of and to in is the of and to in is' ELSE text END AS text",
        "CAST(doc_id % 5 = 0 AS BIGINT) AS y")
    val w = Selection.trainQualityLsq(docs)
    // residual check: recompute A, b from the features and assert A·w = b
    // (the ridge system is square nonsingular — the solve must be exact
    // up to fp rounding)
    val f = Selection.classifierFeatures(docs)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val xs = f.map { case (x1, x2, x3, _) => Array(1.0, x1, x2, x3) }
    val ys = f.map(_._4.toDouble)
    val a = Array.ofDim[Double](4, 4)
    val b = Array.ofDim[Double](4)
    for ((x, y) <- xs.zip(ys); i <- 0 until 4) {
      b(i) += x(i) * y
      for (j <- 0 until 4) a(i)(j) += x(i) * x(j)
    }
    for (i <- 1 until 4) a(i)(i) += 1.0 // ridge
    for (i <- 0 until 4) {
      val lhs = (0 until 4).map(j => a(i)(j) * w(j)).sum
      assert(math.abs(lhs - b(i)) <= 1e-6 * math.max(1.0, math.abs(b(i))),
        s"normal-equation residual row $i: $lhs vs ${b(i)} (w=${w.toSeq})")
    }
    // and the planted domain is actually learned
    val scored = Selection.scoreQuality(docs, w)
    val acc = scored.filter(col("pred") === (col("label") === 1L)).count().toDouble /
      scored.count()
    assert(acc >= 0.95, s"classifier accuracy $acc on the planted domain")
  }

  test("temperature sampling: smallest domain keeps all, rates flatten toward sqrt") {
    val docs = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = graft.ext.TextAnalysis.temperatureSample(docs)
      .select("lang", "rate_x10000").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minDomain = counts.minBy(_._2)._1
    assert(rates(minDomain) == 10000L, "smallest domain must keep everything")
    // rates anti-monotone in domain size: bigger domain → lower keep rate
    val sorted = counts.toSeq.sortBy(_._2).map(_._1)
    sorted.sliding(2).foreach { case Seq(small, big) =>
      assert(rates(small) >= rates(big),
        s"rate($small)=${rates(small)} must be >= rate($big)=${rates(big)}")
    }
    // kept counts land near sqrt-flattening: kept_d ~ sqrt(c_min * c_d)
    val kept = graft.ext.TextAnalysis.temperatureSample(docs)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cmin = counts.values.min
    counts.foreach { case (d, c) =>
      val expect = math.sqrt((cmin * c).toDouble)
      assert(math.abs(kept(d) - expect) <= 0.35 * expect + 10,
        s"$d kept ${kept(d)} vs sqrt-flattened target $expect")
    }
  }

  test("Bloom prefilter: no false negatives, only hits reach the exact join") {
    val d = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val epoch = d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" almost identical suffix tokens")).as("text"))
      .unionAll(d.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
    val out = Dedup.bloomPrefilter(epoch, d).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    // Bloom's contract: every true duplicate hits
    assert(out.filter(_._3).forall(_._2), "a true duplicate missed the Bloom")
    // every planted exact copy (2M ids) is a dup; suffixed docs are not
    assert(out.filter(_._1 >= 2000000).forall(_._3))
    assert(out.filter(t => t._1 >= 1000000 && t._1 < 2000000).forall(!_._3))
  }

  test("PCA whitening: each component lands at ~unit variance (x1000)") {
    val e = graft.queries.Synth.embeddings(spark, "/root/testdata/sf0.001")
    val wh = graft.ext.PcaTrainer.whitenProjection(e)
      .select(col("vec_id"), split(col("whitened"), ",").as("w"))
      .select((0 until 4).map(i =>
        element_at(col("w"), i + 1).cast("double").as(s"w$i")): _*)
    val stats = wh.agg(
      variance(col("w0")), variance(col("w1")),
      variance(col("w2")), variance(col("w3"))).head()
    (0 until 4).foreach { i =>
      val v = stats.getDouble(i)
      // whitened variance = 1.0 in the scaled domain → 1e6 after x1000
      // (floor rounding + power-iteration convergence give a few % slack)
      assert(v > 0.8e6 && v < 1.2e6,
        s"component $i whitened variance $v not ~1e6")
    }
  }

  test("DSIR bits separate the planted target domain") {
    import graft.ext.Selection
    val docs = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id",
        "CASE WHEN doc_id % 5 = 0 THEN text || ' wikipedia encyclopedia citation reference verifiable notable' ELSE text END AS text",
        "CAST(doc_id % 5 = 0 AS BIGINT) AS y")
    val m = Selection.dsirBits(docs)
      .withColumn("target", col("doc_id") % 5 === 0)
      .groupBy("target").agg(avg("dsir_bits").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"target docs must score higher: target=${m(true)} raw=${m(false)}")
  }

  test("frame sample: full frames only, every 4th, stable digests") {
    val text = "ab" * 160                  // 320 bytes → 5 full frames → idx 0, 4
    val frames = Multimodal.frameSample(Multimodal.asBlobs(
      Seq((9L, text)).toDF("doc_id", "text"))).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 4L))
    assert(frames(0).frame_md5 == frames(1).frame_md5) // identical content
    val none = Multimodal.frameSample(Multimodal.asBlobs(
      Seq((1L, "short")).toDF("doc_id", "text"))).collect()
    assert(none.isEmpty)                   // <64 bytes → zero full frames
  }
}
