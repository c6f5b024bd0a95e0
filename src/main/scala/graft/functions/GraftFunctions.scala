package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL-function bindings for the library's custom codegen expressions,
  * so `spark.sql("SELECT shingle_set(text, 3) ...")` works the same as
  * the Scala `Column` API — a user of the reference switching to this
  * library keeps both surfaces.
  *
  * Two registration paths share this list:
  *  - [[graft.plans.GraftExtensions]] injects at session BUILD time
  *    (`--conf spark.sql.extensions=graft.plans.GraftExtensions`);
  *  - [[install]] registers on a LIVE session (the notebook /
  *    `getOrCreate`-after-the-fact case).
  *
  * Shape parameters (k, table counts, …) are SQL integer literals,
  * resolved once at analysis time into the expression constructor —
  * the same contract as the Scala API's `Int` parameters.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _)   => v
    case Literal(v: Long, _)  => v.toInt
    case Literal(v: Short, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def checked(fn: String, n: Int)(build: Seq[Expression] => Expression): Builder =
    args => {
      require(args.length == n, s"$fn expects $n arguments, got ${args.length}")
      build(args)
    }

  /** (identifier, info, builder) for every exposed function. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    ("shingle_set", "shingle_set(text, k) - distinct k-gram word shingles",
      checked("shingle_set", 2)(a => ShingleSet(a(0), intArg(a(1), "shingle_set", 1)))),
    ("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array",
      checked("simhash64", 1)(a => SimHash64(a(0)))),
    ("minhash_sig", "minhash_sig(shingles, n) - n md5-minhash signature values",
      checked("minhash_sig", 2)(a => MinHashSig(a(0), intArg(a(1), "minhash_sig", 1)))),
    ("dot_product", "dot_product(a, b) - sequential-fold dot product",
      checked("dot_product", 2)(a => DotProduct(a(0), a(1)))),
    ("l2_normalize", "l2_normalize(v) - unit-norm vector (null for zero vectors)",
      checked("l2_normalize", 1)(a => L2Normalize(a(0)))),
    ("lsh_buckets", "lsh_buckets(nv, tables, bits) - SRP-LSH bucket keys",
      checked("lsh_buckets", 3)(a => LshBuckets(a(0),
        intArg(a(1), "lsh_buckets", 1), intArg(a(2), "lsh_buckets", 2)))),
    ("winnow", "winnow(text, k, w) - winnowing fingerprint hashes",
      checked("winnow", 3)(a => Winnow(a(0),
        intArg(a(1), "winnow", 1), intArg(a(2), "winnow", 2)))),
    ("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity (p=0.1, boost>0.7)",
      checked("jaro_winkler", 2)(a => JaroWinkler(a(0), a(1)))),
    ("decode_html_entities",
      "decode_html_entities(s) - single-pass HTML entity decode (numeric + 30 named, no cascade)",
      checked("decode_html_entities", 1)(a => DecodeHtmlEntities(a(0)))),
    ("cdc_cuts",
      "cdc_cuts(text, window, modulus, divisor) - content-defined-chunking cut positions (rolling polynomial hash)",
      checked("cdc_cuts", 4)(a => CdcCuts(a(0), intArg(a(1), "cdc_cuts", 1),
        intArg(a(2), "cdc_cuts", 2).toLong, intArg(a(3), "cdc_cuts", 3).toLong)))
  ).map { case (name, usage, b) =>
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", null, name, usage, ""), b)
  }

  /** Register every function on an already-built session. Idempotent
    * (re-registration replaces the same binding).
    */
  def install(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      ColumnBridge.registerFunction(spark, id, info, b)
    }
}
