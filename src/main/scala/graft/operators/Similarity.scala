package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * The dot product / norms are sequential folds over the array
  * (zip_with + aggregate in doubles), which the DuckDB oracle reproduces
  * with list comprehensions + list_reduce in the identical order — results
  * are bit-for-bit comparable.
  *
  *  - brute-force top-k: corpus × queries join + per-query window. The join
  *    broadcasts the (small) query side; the corpus is never shuffled.
  *  - IVF: coarse quantization against `nlist` deterministic seed centroids;
  *    queries probe `nprobe` nearest cells and re-rank exactly. At 100 TB
  *    the cell assignment is a broadcast join + one shuffle on cell id, and
  *    probing reads only nprobe/nlist of the corpus.
  */
object Similarity {

  /** Sequential-fold dot product in doubles (oracle-reproducible order),
    * evaluated by the native codegen'd expression
    * [[graft.functions.NativeExpressions.FloatVecDot]].
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeExpressions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * (it is broadcast); the corpus side streams. Ties are broken by vec_id
    * for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms are computed once per row below the join, not once per pair
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"), norm(col(vecCol)).as("nv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"), norm(col(vecCol)).as("nq"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("nq") * col("nv"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN: centroids = the `nlist` lowest-id vectors (deterministic
    * seeds — a stand-in for k-means, which would just refine the same
    * structure); every vector is assigned to its nearest centroid; each
    * query probes the `nprobe` nearest cells and re-ranks exactly.
    * Approximate by design: recall depends on nprobe/nlist.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val centroids = c.orderBy("vec_id").limit(nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))

    // cell assignment: argmax cosine over the broadcast centroid set
    val wAssign = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = c.join(broadcast(centroids), lit(true))
      .select(col("vec_id"), col("v"), col("cent_id"), cosine(col("v"), col("cv")).as("csim"))
      .withColumn("r", row_number().over(wAssign)).filter(col("r") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))

    // query → nprobe cells
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cent_id").asc)
    val probes = q.join(broadcast(centroids), lit(true))
      .select(col("query_id"), col("qv"), col("cent_id"), cosine(col("qv"), col("cv")).as("csim"))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
      .select(col("query_id"), col("qv"), col("cent_id").as("cell"))

    // candidates = vectors in probed cells; exact re-rank
    val wRank = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    assigned.join(probes, "cell")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Embedding near-dup pairs: all pairs with cosine ≥ threshold. Quadratic
    * baseline (oracle duty); blocked/LSH variants route through the same
    * cosine.
    */
  def cosineNearDups(
      corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms precomputed per row: each pair costs ONE native dot
    val a = corpus.select(col(idCol).as("a_id"), col(vecCol).as("va"), norm(col(vecCol)).as("na"))
    val b = corpus.select(col(idCol).as("b_id"), col(vecCol).as("vb"), norm(col(vecCol)).as("nb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
