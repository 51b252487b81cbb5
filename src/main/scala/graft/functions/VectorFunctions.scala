package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` columns, built
  * from higher-order functions so no UDF or driver round-trip is
  * involved — every op is a narrow per-row expression.
  *
  * The reference embeds chunk content via an external
  * IEmbeddingGenerator (Writers/VectorStoreWriter.cs); graft ships a
  * deterministic feature-hashing embedder so the whole pipeline runs
  * hermetically — swap `hashEmbed` for a real model UDF at deploy time.
  */
object VectorFunctions {

  /** Dot product of two equal-length numeric arrays (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = l2norm(a) * l2norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Deterministic feature-hashing embedding: each token lands in
    * bucket portableHash(token) mod dim with weight 1; the result is
    * L2-normalized. O(dim) per row via a histogram built from an
    * exploded-free aggregate.
    */
  def hashEmbed(text: Column, dim: Int): Column = {
    val bucketed = transform(
      TextFunctions.tokens(text),
      t => pmod(TextFunctions.portableHash(t), lit(dim.toLong)).cast("int")
    )
    val counts = transform(
      sequence(lit(0), lit(dim - 1)),
      i => size(filter(bucketed, b => b === i)).cast("double")
    )
    val norm = sqrt(
      aggregate(counts, lit(0.0), (acc, v) => acc + v * v)
    )
    transform(
      counts,
      v => when(norm === 0.0, lit(0.0f)).otherwise((v / norm).cast("float"))
    )
  }

  /** Random-hyperplane LSH bucket id for a vector: the sign pattern of
    * `nPlanes` deterministic pseudo-random hyperplanes, packed into a
    * long. Vectors with the same bucket are ANN candidates.
    * Hyperplane components are derived from (plane, coordinate) via a
    * cheap integer mix so the planes are reproducible cluster-wide
    * with no broadcast state.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      // pseudo-random ±1 weights: parity of a mixed integer
      val proj = (0 until dim).map { i =>
        val mixed = (p * 1315423911L + i * 2654435761L) % 1000003L
        val sign = if ((mixed & 1L) == 0L) 1.0 else -1.0
        element_at(vec, i + 1).cast("double") * sign
      }.reduce(_ + _)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
