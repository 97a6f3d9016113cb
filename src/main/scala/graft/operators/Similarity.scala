package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Similarity search over an embedding column (`array<float>`).
  *
  * Two paths (north star in BASELINE.json):
  *  - brute-force cosine top-k — the exact baseline. One codegen'd projection
  *    computing the dot product (`zip_with` + `aggregate`, no UDF) and a
  *    TakeOrderedAndProject for the top-k: per-partition heaps, driver merges
  *    k rows. Linear scan — correct at any scale, bandwidth-bound;
  *  - LSH-bucketed ANN — the scale path: random-hyperplane signatures (seeded,
  *    deterministic) assign each vector to a bucket; queries probe only their
  *    own bucket (optionally multi-probe), turning a 100 TB scan into a
  *    bucket-local one. An IVF variant would swap the hash for k-means
  *    centroid assignment; the bucketing/probing plumbing is identical.
  */
object Similarity {

  /** cosine similarity of two float/double array columns, computed in double.
    * Production path: the native codegen'd [[graft.functions.CosineSimilarityExpr]]
    * — one fused loop, no per-row intermediate array. Accumulation order is
    * left-to-right, bit-identical to [[cosineFns]] (proven in CosineExprSpec). */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType => DT}
    GraftSqlBridge.column(graft.functions.CosineSimilarityExpr(
      Cast(GraftSqlBridge.expression(a), ArrayType(DT)),
      Cast(GraftSqlBridge.expression(b), ArrayType(DT))))
  }

  /** reference formulation from org.apache.spark.sql.functions only —
    * kept for cross-checking the native kernel. */
  def cosineFns(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** brute-force top-k by cosine against one literal query vector.
    * Plan: scan → project(cosine) → TakeOrderedAndProject(k). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol), round(cosine(col(vecCol), q), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol)).limit(k)
  }

  /** all-pairs top-k neighbors for a (small, broadcastable) query set against
    * a large corpus: broadcast the queries, per-corpus-partition compute, then
    * per-query top-k via window. The corpus never shuffles. */
  def topKPerQuery(corpus: DataFrame, queries: DataFrame,
                   corpusId: String, queryId: String, vecCol: String,
                   k: Int): DataFrame = {
    val joined = corpus.as("c").join(
      broadcast(queries.select(col(queryId), col(vecCol).as("__qv"))).as("q"),
      col(s"c.$corpusId") =!= col(s"q.$queryId"))
    val scored = joined.select(
      col(s"q.$queryId").as("query_id"),
      col(s"c.$corpusId").as("neighbor_id"),
      round(cosine(col(s"c.$vecCol"), col("__qv")), 6).as("cos"))
    Relational.topNPerGroup(scored, Seq("query_id"),
      Seq(desc("cos"), asc("neighbor_id")), k)
  }

  // deterministic random hyperplanes (seeded driver-side, shipped as literals)
  private def hyperplanes(dim: Int, nBits: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** random-hyperplane LSH signature: one bit per plane = sign(v·plane).
    * Vectors with equal signatures land in the same ANN bucket. */
  def lshSignature(vecCol: Column, dim: Int, nBits: Int = 16,
                   seed: Long = 42L): Column = {
    val bits = hyperplanes(dim, nBits, seed).zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dotProduct(vecCol, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k for one query vector: probe only the query's
    * bucket (hamming-0 probe; callers widen with multi-probe by flipping
    * signature bits), exact cosine rerank inside the bucket. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, dim: Int, nBits: Int = 8,
              seed: Long = 42L): DataFrame = {
    val bucketed = df.withColumn("__sig", lshSignature(col(vecCol), dim, nBits, seed))
    val qSig = lshSignature(array(query.map(lit): _*), dim, nBits, seed)
    val q = array(query.map(lit): _*)
    bucketed.filter(col("__sig") === qSig)
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol)).limit(k)
  }

  /** IVF (inverted-file) ANN — the k-means scale path beside the LSH one.
    *
    * Build: one MLlib KMeans fit assigns every corpus vector to its nearest
    * of `k` centroids (offline at 100 TB — the fit runs on a sample, the
    * assignment is a pure map). Query: rank centroids against the query
    * DRIVER-side (k ≪ corpus, a few KB of centers), probe only the `nprobe`
    * nearest clusters' rows, exact cosine rerank inside — the scan touches
    * ~corpus·nprobe/k rows instead of everything. Deterministic via fixed
    * seed.
    */
  def ivfBuild(df: DataFrame, vecCol: String, k: Int = 16,
               seed: Long = 42L): (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = df.withColumn("__vec", array_to_vector(col(vecCol)))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed)
      .setFeaturesCol("__vec").setPredictionCol("__cluster")
      .fit(withVec)
    (model, model.transform(withVec).drop("__vec"))
  }

  /** probe the `nprobe` clusters nearest the query, exact rerank inside. */
  def ivfTopK(assigned: DataFrame, model: org.apache.spark.ml.clustering.KMeansModel,
              idCol: String, vecCol: String, query: Seq[Double], topK: Int,
              nprobe: Int = 4): DataFrame = {
    val qArr = query.toArray
    val probes = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      val d = c.toArray.zip(qArr).map { case (a, b) => val t = a - b; t * t }.sum
      (i, d)
    }.sortBy(_._2).take(nprobe).map(_._1)
    val q = array(query.map(lit): _*)
    assigned.filter(col("__cluster").isin(probes.map(Int.box): _*))
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol)).limit(topK)
  }

  /** IVF-style bucket stats: how balanced are the ANN buckets (diagnostic —
    * at scale you want bucket sizes ≪ partition size). */
  def bucketStats(df: DataFrame, vecCol: String, dim: Int, nBits: Int = 8,
                  seed: Long = 42L): DataFrame =
    df.select(lshSignature(col(vecCol), dim, nBits, seed).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bucket"))
}
