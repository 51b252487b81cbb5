package graft

import graft.functions.native
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for graft's kernels: registers `graft_*` functions so
  * `spark.sql("SELECT graft_simhash64(text) ...")` works anywhere a
  * DataFrame isn't convenient (BI tools, SQL notebooks, views).
  *
  * Two entry points:
  *  - spark-submit: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard SparkSessionExtensions hook);
  *  - live session: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(i: Int, _) => i
    case Literal(l: Long, _) => l.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(d: Double, _) => d
    case Literal(f: Float, _) => f.toDouble
    case Literal(i: Int, _) => i.toDouble
    case other => throw new IllegalArgumentException(s"$what must be a numeric literal, got $other")
  }

  /** (name, info, builder) triples for every SQL-exposed kernel. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_poly_hash",
      new ExpressionInfo(classOf[native.PolyHashExpr].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => native.PolyHashExpr(args.head)),
    ("graft_content_hash60",
      new ExpressionInfo(classOf[native.ContentHash60Expr].getName, "graft_content_hash60"),
      (args: Seq[Expression]) => native.ContentHash60Expr(args.head)),
    ("graft_simhash64",
      new ExpressionInfo(classOf[native.SimHash64Expr].getName, "graft_simhash64"),
      (args: Seq[Expression]) => native.SimHash64Expr(args.head)),
    ("graft_shingle_hashes",
      new ExpressionInfo(classOf[native.ShingleHashesExpr].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => native.ShingleHashesExpr(args.head, litInt(args(1), "n"))),
    ("graft_minhash_sig",
      new ExpressionInfo(classOf[native.MinHashSigExpr].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => native.MinHashSigExpr(args.head, litInt(args(1), "k"))),
    ("graft_hash_embed",
      new ExpressionInfo(classOf[native.HashEmbedExpr].getName, "graft_hash_embed"),
      (args: Seq[Expression]) => native.HashEmbedExpr(args.head, litInt(args(1), "dim"))),
    ("graft_cosine",
      new ExpressionInfo(classOf[native.CosineExpr].getName, "graft_cosine"),
      (args: Seq[Expression]) => native.CosineExpr(args.head, args(1))),
    ("graft_token_count",
      new ExpressionInfo(classOf[native.TokenCountExpr].getName, "graft_token_count"),
      (args: Seq[Expression]) => native.TokenCountExpr(args.head)),
    ("graft_hyperplane_bucket",
      new ExpressionInfo(classOf[native.HyperplaneBucketExpr].getName, "graft_hyperplane_bucket"),
      (args: Seq[Expression]) => native.HyperplaneBucketExpr(args.head, litInt(args(1), "nPlanes"))),
    ("graft_window_hashes",
      new ExpressionInfo(classOf[native.PositionalWindowHashesExpr].getName, "graft_window_hashes"),
      (args: Seq[Expression]) => native.PositionalWindowHashesExpr(args.head, litInt(args(1), "n"))),
    ("graft_nearest_centroids",
      new ExpressionInfo(classOf[native.NearestCentroidsExpr].getName, "graft_nearest_centroids"),
      (args: Seq[Expression]) => native.NearestCentroidsExpr(args.head, args(1), litInt(args(2), "probes"))),
    ("graft_piece_count",
      new ExpressionInfo(classOf[native.PieceCountExpr].getName, "graft_piece_count"),
      (args: Seq[Expression]) => native.PieceCountExpr(args.head)),
    ("graft_char_entropy",
      new ExpressionInfo(classOf[native.CharEntropyExpr].getName, "graft_char_entropy"),
      (args: Seq[Expression]) => native.CharEntropyExpr(args.head)),
    // merges as 'a b' pairs joined by ',' — SQL has no Seq[(String,
    // String)] literal; rank = position in the list
    ("graft_bpe_encode",
      new ExpressionInfo(classOf[native.BpeEncodeExpr].getName, "graft_bpe_encode"),
      (args: Seq[Expression]) => native.BpeEncodeExpr(args.head,
        litString(args(1), "merges").split(',').toSeq.map { p =>
          val Array(a, b) = p.split(' '); (a, b)
        })),
    ("graft_mmr_select",
      new ExpressionInfo(classOf[native.MmrSelectExpr].getName, "graft_mmr_select"),
      (args: Seq[Expression]) => native.MmrSelectExpr(args.head,
        litInt(args(1), "k"), litDouble(args(2), "lambda"))),
    ("graft_avg_hash64",
      new ExpressionInfo(classOf[native.AvgHash64Expr].getName, "graft_avg_hash64"),
      (args: Seq[Expression]) => native.AvgHash64Expr(args.head)),
    // aggregate: Misra–Gries heavy-hitter candidate sweep (k counters
    // per task; see MisraGriesAgg — candidates need an exact verify)
    ("graft_misra_gries",
      new ExpressionInfo(classOf[graft.functions.MisraGriesAgg].getName, "graft_misra_gries"),
      (args: Seq[Expression]) =>
        graft.functions.MisraGriesAgg(args.head, litInt(args(1), "k"))
          .toAggregateExpression())
  )

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.FunctionBridge
        .register(spark, name, info, builder)
    }
}
