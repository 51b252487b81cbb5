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

  /** Cosine similarity; 0.0 when either vector is all-zero. Fused
    * one-pass native expression (same fold order as the HOF form, so
    * DuckDB oracle float math matches bit-for-bit).
    */
  def cosine(a: Column, b: Column): Column = native.cosine(a, b)

  /** Deterministic feature-hashing embedding: each token lands in
    * bucket portableHash(token) mod dim with weight 1; the result is
    * L2-normalized. O(dim) per row via a histogram built from an
    * exploded-free aggregate.
    */
  def hashEmbed(text: Column, dim: Int): Column = native.hashEmbed(text, dim)

  /** Random-hyperplane LSH bucket id for a vector: the sign pattern of
    * `nPlanes` deterministic pseudo-random hyperplanes, packed into a
    * long. Vectors with the same bucket are ANN candidates.
    * Hyperplane components are derived from (plane, coordinate) via a
    * cheap integer mix so the planes are reproducible cluster-wide
    * with no broadcast state.
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int, seed: Int = 0): Column =
    native.hyperplaneBucket(vec, nPlanes, seed)

  /** The `probes` nearest centroids of `vec` (cosine desc, list_id asc)
    * out of `cents`, an `array<struct<list_id, centroid>>` column —
    * IVF list assignment as one scan-stage expression over a broadcast
    * centroid set, replacing a crossJoin + window argmax.
    */
  def nearestCentroids(vec: Column, cents: Column, probes: Int): Column =
    native.nearestCentroids(vec, cents, probes)
}
