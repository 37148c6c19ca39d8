package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Registration of graft's custom Catalyst expressions.
  *
  * Preferred wiring is `spark.sql.extensions=graft.GraftExtensions` (see
  * [[graft.GraftExtensions]]); `ensureRegistered` covers sessions created
  * without the extension (e.g. a harness-provided session).
  */
object GraftFunctions {
  private val descriptors = Seq(
    JsonDeepMerge.descriptor, JsonMergeIn.descriptor, Opaque.descriptor,
    DotProduct.descriptor, BpeApply.descriptor, IvfAssign.descriptor,
    NfcNormalize.descriptor, HtmlEscape.descriptor,
    PolyHash16.descriptor, CdcChunks.descriptor, PqEncode.descriptor, PqLut.descriptor,
    StrictPow.descriptor, MinhashSig.descriptor, WinnowFps.descriptor,
    Md5PrefixLong.descriptor,
    TopKPairs.descriptor, TopKPairsDistinct.descriptor,
    VectorSumLong.descriptor,
    graft.syslog.ParseSyslog.descriptor,
    JmesPathEval.queryDescriptor, JmesPathEval.valueDescriptor,
    JmesPathQV.descriptor)

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    }
  }

  /** `json_deep_merge(target, fragment)` as a Column (session must be
    * registered — all graft entry points do this). */
  def jsonDeepMerge(target: Column, fragment: Column): Column =
    call_function("json_deep_merge", target, fragment)

  /** `md5_prefix_long(str, start, len)` as a Column — drop-in for
    * `conv(substring(md5(str), start, len), 16, 10).cast("long")`
    * (bit-equal; see [[Md5PrefixLong]]). Session must be registered —
    * all graft entry points do this. */
  def md5PrefixLong(str: Column, start: Int, len: Int): Column =
    call_function("md5_prefix_long", str,
      org.apache.spark.sql.functions.lit(start),
      org.apache.spark.sql.functions.lit(len))

  private[graft] def inject(ext: SparkSessionExtensions): Unit =
    descriptors.foreach(ext.injectFunction)
}
