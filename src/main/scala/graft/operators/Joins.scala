package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, re-expressed for scale.
  *
  * Scale posture: `asOfJoin` is the MERGE-style formulation — one
  * shuffle on the key, one sort, zero range fan-out — instead of the
  * naive `l.ord >= r.ord` theta-join whose intermediate is O(n·m) per
  * key. `saltedJoin` is the standard skew-mitigation construction:
  * explode the small side S ways so one hot key spreads over S
  * reducers (results identical to the plain join by construction).
  */
object Joins {

  /** As-of (backward) join: for each left row, attach the payload of
    * the single latest right row with the same key and `ord` ≤ the
    * left row's `ord` (nulls when no such row exists).
    *
    * `ord` must be a totally-ordered long, unique within a key on the
    * right side (callers encode time+id composites to break ties).
    *
    * Implementation: tag both sides, union, and run one window per key
    * ordered by (ord, side) — right rows sort before left rows at equal
    * ord, so "at or before" is exact — carrying the last non-null
    * payload forward. One hash shuffle + one sort; no range explosion,
    * so a key with 10M left rows and 10M right rows costs a merge, not
    * 100T comparisons.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ord: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"
  ): DataFrame = {
    val pay = struct(payloadCols.map(col): _*)
    val r = right
      // equi-join semantics: a null key or null ord on the right never
      // matches anything (the window would otherwise group null keys
      // together and sort null ords first, attaching bogus payloads)
      .where(col(key).isNotNull && col(ord).isNotNull)
      .select(
        col(key).as("__key"), col(ord).cast("long").as("__ord"),
        lit(0).as("__side"), pay.as("__pay"))
    val payType = r.schema("__pay").dataType
    val lrow = struct(left.columns.map(col): _*)
    val l = left.select(
      col(key).as("__key"), col(ord).cast("long").as("__ord"),
      lit(1).as("__side"), lrow.as("__lrow"))
    val lrowType = l.schema("__lrow").dataType

    val unioned =
      l.withColumn("__pay", lit(null).cast(payType))
        .unionByName(r.withColumn("__lrow", lit(null).cast(lrowType)))

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ord"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val outCols = left.columns.map(c => col(s"__lrow.$c").as(c)) ++
      payloadCols.map(c => col(s"__match.$c").as(s"$prefix$c"))
    matched.select(outCols: _*)
  }

  /** Inequality (band/range) join: each fact row joins to the bands
    * row whose [lo, hi) interval contains `value`. The bands table is
    * dimension-sized (a handful of rows), so it broadcasts and the
    * inequality is evaluated map-side (BroadcastNestedLoopJoin) — the
    * fact side never shuffles.
    */
  def bandJoin(facts: DataFrame, bands: DataFrame, valueCol: String,
               loCol: String = "lo", hiCol: String = "hi"): DataFrame =
    facts.join(broadcast(bands),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))

  /** Salted shuffle join for skewed keys. The probe side gets a
    * deterministic salt in [0, nSalts); the build side is exploded
    * nSalts ways so every (key, salt) pair exists; the join runs on
    * (key, salt) and one hot key spreads over nSalts reducers.
    * Output rows are identical to `probe.join(build, key)` — salting
    * only changes the partitioning.
    *
    * `saltExpr` must be deterministic (never rand(): a retried task
    * would re-salt differently and drop/duplicate rows) — hash a
    * stable column, e.g. `pmod(hash(col("l_linenumber")), nSalts)`.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltExpr: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0)
    // null salt → bucket 0, not a dropped row (a null __salt would
    // never match the exploded build side and silently lose the row)
    val salted = probe.withColumn("__salt",
      coalesce(pmod(saltExpr.cast("int"), lit(nSalts)), lit(0)))
    val exploded = build.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-aware refinement of [[saltedJoin]]: only keys whose probe
    * frequency exceeds `hotThreshold` get salted — the build side is
    * exploded nSalts ways ONLY for those keys, and every other key
    * takes a plain single-copy join. Output rows are identical to
    * `probe.join(build, key)` (and to [[saltedJoin]]); what changes is
    * the work: full salting replicates the ENTIRE build side ×nSalts
    * through the shuffle, which at 100 TB is nSalts× the dominant
    * exchange, while the skew that motivated salting lives in a
    * handful of keys. Cost of finding them: one map-side-combined
    * count over the probe's key column (≤|keys| rows), joined back as
    * a hot-key flag — AQE realizes both flag joins as broadcasts
    * whenever the hot set is small, which is the premise of skew.
    *
    * This is the manual-control twin of AQE's OptimizeSkewedJoin
    * (which splits oversized post-shuffle partitions on its own):
    * use AQE's when runtime stats suffice, this one when the salt
    * must be deterministic and explicit (e.g. reproducible layouts).
    */
  def skewSaltedJoin(probe: DataFrame, build: DataFrame, key: String,
                     saltExpr: Column, nSalts: Int,
                     hotThreshold: Long): DataFrame = {
    require(nSalts > 0 && hotThreshold > 0)
    val hot = probe.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .where(col("__n") > hotThreshold)
      .select(col(key))
    val probeHot = probe.join(hot, Seq(key), "left_semi")
    val probeCold = probe.join(hot, Seq(key), "left_anti")
    val buildHot = build.join(hot, Seq(key), "left_semi")
    val cold = probeCold.join(build, Seq(key))
    val salted = saltedJoin(probeHot, buildHot, key, saltExpr, nSalts)
    cold.unionByName(salted.select(cold.columns.map(col): _*))
  }

  /** Interval-overlap join WITHOUT an equi-key: all (left, right)
    * pairs whose half-open intervals [start, end) intersect — the
    * genomics/observability "which incidents overlap which deploys"
    * join. Spark's only native plan for a pure inequality predicate
    * is a nested-loop join (O(n·m) comparisons); this is the standard
    * tiling rewrite that turns it into an equi-join.
    *
    * Each interval is exploded to the fixed-width time tiles it
    * intersects (fan-out ≤ ⌈len/tile⌉+1, a small constant when `tile`
    * is sized near the typical interval length), the join is a plain
    * hash equi-join on tile, and each qualifying pair is emitted
    * EXACTLY ONCE — by the tile containing max(l_start, r_start),
    * which both sides are guaranteed to have listed — so there is no
    * post-join dedup shuffle at all. One exchange per side, keyed on
    * tile; a pathologically hot tile (everything overlapping one
    * moment) is the usual AQE-skew/salting territory.
    *
    * Inputs must carry (l_id, l_start, l_end) / (r_id, r_start,
    * r_end) as longs; payload columns ride along untouched. Tile
    * arithmetic is floor(x / tile) in DOUBLE (exact for |x| < 2^53,
    * floor-consistent for negative starts across engines).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          tile: Long): DataFrame = {
    require(tile > 0)
    def tileOf(c: Column) = floor(c.cast("double") / tile).cast("long")
    def tiled(df: DataFrame, s: String, e: String) =
      df.withColumn("__tile",
        explode(sequence(tileOf(col(s)), tileOf(col(e) - 1))))
    tiled(left, "l_start", "l_end")
      .join(tiled(right, "r_start", "r_end"), Seq("__tile"))
      .where(col("l_start") < col("r_end") && col("r_start") < col("l_end")
        && col("__tile") === tileOf(greatest(col("l_start"), col("r_start"))))
      .drop("__tile")
  }
}
