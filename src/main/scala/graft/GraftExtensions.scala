package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharBigrams, DotProduct, HyperplaneBucket, MinHashSig, PolyHash64, SimHash64}

/** SparkSessionExtensions registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT poly_hash64(text) ...")` works and the
  * engine surface is reachable from pure SQL:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("poly_hash64"),
      info("poly_hash64", "poly_hash64(str) - 61-bit polynomial rolling hash"),
      (args: Seq[Expression]) => PolyHash64(args.head)))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double-array dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit simhash of long-array"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(hashes, k) - k-permutation minhash signature"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case e if e.foldable => e.eval() match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"minhash_sig: k must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "minhash_sig: k must be a literal, not a column")
        }
        MinHashSig(args(0), k)
      }))
    ext.injectFunction((FunctionIdentifier("char_bigrams"),
      info("char_bigrams", "char_bigrams(str) - int-coded char bigrams"),
      (args: Seq[Expression]) => CharBigrams(args.head)))
    ext.injectFunction((FunctionIdentifier("hyperplane_bucket"),
      info("hyperplane_bucket",
        "hyperplane_bucket(vec, planes) - random-hyperplane LSH bucket id"),
      (args: Seq[Expression]) => {
        val p = args(1) match {
          case e if e.foldable => e.eval() match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"hyperplane_bucket: planes must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "hyperplane_bucket: planes must be a literal, not a column")
        }
        HyperplaneBucket(args(0), p)
      }))
  }
}
