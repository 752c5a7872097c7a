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

  /** Deterministic seed centroids: the `k` lowest-id vectors. */
  def seedCentroids(
      corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))

  /** Lloyd (k-means) refinement of the seed centroids: `iters` rounds of
    * assign-to-nearest-by-cosine + per-cell mean. Per-dimension sums run in
    * DECIMAL, so the mean is independent of partitioning and summation
    * order — centroids are bit-deterministic across runs and cluster
    * layouts (double sums would drift). Empty cells keep their previous
    * centroid. Cost per round: one broadcast argmax assignment + one
    * (cell, dim) shuffle of n·dim rows + a |cells|·dim re-assembly —
    * the standard distributed-Lloyd shape, linear in corpus size.
    */
  /** Deterministic map-side argmax: the id whose `score` is greatest, ties
    * broken by SMALLEST id — as one `min(struct(−score, id))` partial
    * aggregate. Type-agnostic in the id: no arithmetic ever touches it, so
    * caller-supplied string/date centroid ids work (a `−1·id` tie-break
    * would throw a runtime cast under ANSI mode for non-numeric ids, and
    * struct ordering handles any orderable type).
    */
  private[operators] def argmaxById(score: Column, id: Column): Column =
    min(struct((-score).as("s"), id.as("i"))).getField("i")

  /** Per-metric assignment score (argmax picks the nearest centroid):
    * cosine similarity, or for L2 the order-equivalent `v·c − ‖c‖²/2`
    * (argmin ‖v−c‖² with the constant ‖v‖² dropped — no sqrt, no
    * per-pair subtraction loop).
    */
  private def assignScore(metric: String, v: Column, cv: Column): Column = metric match {
    case "cosine" => cosine(v, cv)
    case "l2" => dot(v, cv) - lit(0.5) * dot(cv, cv)
    case other => throw new IllegalArgumentException(s"unknown kmeans metric: $other")
  }

  def kmeansCentroids(
      corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      metric: String = "cosine"): DataFrame =
    kmeansCentroidsGrouped(
      corpus.select(lit(0).as("g"), col(idCol).as("vec_id"), col(vecCol).as("v")),
      seedCentroids(corpus, k, idCol, vecCol)
        .select(lit(0).as("g"), col("cent_id"), col("cv")),
      iters, metric).drop("g")

  /** One-pass grouped Lloyd: refine per-group centroids `(g, cent_id, cv)`
    * over grouped vectors `(g, vec_id, v)`. Every group trains in the SAME
    * jobs — one data scan per iteration regardless of group count, which is
    * what lets PQ's `m` subspaces train together instead of serially.
    * Assignment is a broadcast join + map-side argmax partial aggregation:
    * the n·k scored candidates collapse to n rows inside each scan task
    * before any shuffle (a per-row window would shuffle all n·k rows, each
    * carrying its vector). Per-dimension sums run in DECIMAL so the means
    * are independent of partitioning and summation order — centroids are
    * bit-deterministic across runs and cluster layouts. Empty cells keep
    * their previous centroid. Centroids are localCheckpoint'd every round
    * (they are tiny) so lineage stays flat and downstream reuse of the
    * returned frame never re-trains.
    */
  def kmeansCentroidsGrouped(
      data: DataFrame, seeds: DataFrame, iters: Int, metric: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    var cents = seeds.localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = data.join(broadcast(cents), "g")
        .select(col("g"), col("vec_id"), col("v"), col("cent_id"),
          assignScore(metric, col("v"), col("cv")).as("csim"))
        .groupBy("g", "vec_id")
        .agg(argmaxById(col("csim"), col("cent_id"))
          .as("cent_id"), first(col("v")).as("v")) // v is constant per (g, vec_id)
      val means = assigned
        .select(col("g"), col("cent_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("g", "cent_id", "pos")
        .agg((sum(col("x").cast(DecimalType(30, 12))) / count(lit(1)))
          .cast("float").as("m"))
        .groupBy("g", "cent_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv2"))
      cents = cents.join(means, Seq("g", "cent_id"), "left")
        .select(col("g"), col("cent_id"), coalesce(col("cv2"), col("cv")).as("cv"))
        .localCheckpoint()
    }
    cents
  }

  /** IVF-style ANN: coarse-quantize against `nlist` centroids (the
    * deterministic seeds by default; pass [[kmeansCentroids]] output via
    * `centroids` for refined cells on clustered corpora); every vector is
    * assigned to its nearest centroid; each query probes the `nprobe`
    * nearest cells and re-ranks exactly.
    * Approximate by design: recall depends on nprobe/nlist.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[DataFrame] = None): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val cents = centroids.getOrElse(seedCentroids(corpus, nlist, idCol, vecCol))

    // cell assignment: argmax cosine over the broadcast centroid set —
    // map-side max_by collapses the n·k scored rows to n inside the scan
    val assigned = c.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("cent_id"), cosine(col("v"), col("cv")).as("csim"))
      .groupBy("vec_id")
      .agg(argmaxById(col("csim"), col("cent_id"))
        .as("cell"), first(col("v")).as("v")) // v is constant per vec_id

    // query → nprobe cells
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cent_id").asc)
    val probes = q.join(broadcast(cents), lit(true))
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

  /** Cluster-balanced (diversity-preserving) downsampling: assign every
    * vector to its nearest seed centroid and keep at most `k` per cell in
    * portable-hash order — a corpus downsample that preserves cluster
    * coverage instead of letting dense regions dominate (the embedding-space
    * analogue of stratified sampling x29; the coverage-first cousin of
    * SemDeDup-style pruning). Assignment is the broadcast + map-side max_by
    * shape (nothing vector-sized shuffles); the exact-k pick costs one
    * shuffle on the cell id, same as every exact-quota sampler here.
    */
  def clusterBalancedSample(
      corpus: DataFrame, k: Int, nlist: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val cents = seedCentroids(corpus, nlist, idCol, vecCol)
    val assigned = c.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cent_id"), cosine(col("v"), col("cv")).as("csim"))
      .groupBy("vec_id")
      .agg(argmaxById(col("csim"), col("cent_id")).as("cell"))
    val w = Window.partitionBy("cell")
      .orderBy(graft.functions.Portable.hash60(col("vec_id").cast("string")).asc,
        col("vec_id").asc)
    assigned.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("cell"), col("vec_id"))
  }

  // ------------------------------------------------------------------- PQ

  /** Product-quantization codebooks (FAISS-style PQ, Jégou et al. 2011):
    * the corpus splits into `m` subvectors of dim/m dims; each subspace
    * learns its own `codebookSize` centroids with L2 Lloyd (the metric PQ
    * theory assumes — deterministic here via [[kmeansCentroids]]' decimal
    * means). Returns (s, cent_id, cv), |rows| = m·codebookSize — always
    * broadcastable.
    */
  def pqCodebooks(
      corpus: DataFrame, dim: Int, m: Int, codebookSize: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val d = dim / m
    def subvecs(df: DataFrame, idAs: String, vecAs: String) = df.select(
      posexplode(array((0 until m).map(s => slice(col(vecCol), s * d + 1, d)): _*))
        .as(Seq("g", vecAs)), col(idCol).as(idAs))
    // all m subspaces train in the same grouped-Lloyd jobs: one corpus scan
    // per iteration instead of m serial per-subspace trainings
    kmeansCentroidsGrouped(
      subvecs(corpus, "vec_id", "v").select(col("g"), col("vec_id"), col("v")),
      subvecs(corpus.orderBy(idCol).limit(codebookSize), "cent_id", "cv")
        .select(col("g"), col("cent_id"), col("cv")),
      iters, metric = "l2")
      .withColumnRenamed("g", "s")
  }

  /** Encode every vector as `m` codes — the 100 TB move: a 64-float
    * embedding becomes m small ints, and ALL downstream scoring works on
    * codes + the broadcast codebook; full vectors never shuffle. One
    * posexplode + broadcast codebook join + per-(vector, subspace) argmax
    * window. Returns (vec_id, s, code).
    */
  def pqEncode(
      corpus: DataFrame, codebooks: DataFrame, dim: Int, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val d = dim / m
    val subs = corpus.select(col(idCol).as("vec_id"),
      posexplode(array((0 until m).map(s => slice(col(vecCol), s * d + 1, d)): _*))
        .as(Seq("s", "sub")))
    // map-side max_by argmax: n·m·k scored candidates collapse to n·m rows
    // inside the scan tasks; nothing vector-sized ever shuffles
    subs.join(broadcast(codebooks), "s")
      .select(col("vec_id"), col("s"), col("cent_id"),
        assignScore("l2", col("sub"), col("cv")).as("score"))
      .groupBy("vec_id", "s")
      .agg(argmaxById(col("score"), col("cent_id"))
        .as("code"))
  }

  /** PQ-ADC top-k with exact re-rank: per query, the (s, code) → partial
    * dot lookup table (m·codebookSize rows) broadcasts with the plan, so
    * scoring the corpus is a codes-scan + LUT join + one (query, vec) sum
    * — approximate cosine = Σ q_s·ĉ_s / (‖q‖·√Σ‖ĉ_s‖²). The top
    * `k·shortlist` ADC candidates per query are then re-ranked with exact
    * cosine over just those vectors (a bounded semi-join pulls them), the
    * standard shortlist-refine shape: ADC cheapness at scan time, exact
    * order where it matters.
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, m: Int = 8, codebookSize: Int = 16, iters: Int = 2,
      shortlist: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      codebooks: Option[DataFrame] = None): DataFrame = {
    val d = dim / m
    // trained codebooks come back localCheckpoint'd (m·codebookSize rows):
    // both uses below read the materialized rows, never re-train. Passing
    // `codebooks` (e.g. [[PqIndex]]'s stored ones) skips training entirely.
    val cb = codebooks.getOrElse(
      pqCodebooks(corpus, dim, m, codebookSize, iters, idCol, vecCol))
    val codes = pqEncode(corpus, cb, dim, m, idCol, vecCol)

    val qsubs = queries.select(col(idCol).as("query_id"),
        norm(col(vecCol)).as("qnorm"),
        posexplode(array((0 until m).map(s => slice(col(vecCol), s * d + 1, d)): _*))
          .as(Seq("s", "qsub")))
    val lut = qsubs.join(cb, "s")
      .select(col("query_id"), col("qnorm"), col("s"), col("cent_id").as("code"),
        dot(col("qsub"), col("cv")).as("pdot"), dot(col("cv"), col("cv")).as("cn2"))

    val wShort = Window.partitionBy("query_id").orderBy(col("adc_sim").desc, col("vec_id").asc)
    val short = codes.join(broadcast(lut), Seq("s", "code"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("pdot")).as("num"), sum(col("cn2")).as("den2"), max(col("qnorm")).as("qn"))
      .withColumn("adc_sim", col("num") / (col("qn") * sqrt(col("den2"))))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("r", row_number().over(wShort)).filter(col("r") <= k * shortlist)
      .select(col("query_id"), col("vec_id"))

    // exact re-rank over the bounded shortlist only
    val cand = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(broadcast(short.select("vec_id").distinct()), Seq("vec_id"), "left_semi")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wRank = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    val out = short.join(cand, "vec_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
    out
  }

  /** Embedding near-dup pairs: EXACT all pairs with cosine ≥ threshold,
    * executed as a blocked pair-enumeration equi-join (the distributed
    * block-matrix-product shape). Vectors hash into `G ≈ n/rowsPerBlock`
    * blocks; the G·(G+1)/2 block pairs are enumerated as a tiny broadcast
    * relation, so every pair of rows meets in exactly one shuffle-partitioned
    * task and the n²/2 cosines spread uniformly over the cluster with
    * bounded per-task memory. No BroadcastNestedLoop/CartesianProduct node
    * — the previous `a_id < b_id` non-equi join was a cartesian that
    * funneled through nested-loop tasks.
    *
    * Exact all-pairs is intrinsically O(n²) compute: measured on the
    * `embeddings` fixtures, qualifying pairs at threshold 0.4 sit on a
    * continuum with near-misses (min qualifying sim 1e-5 above the cut), so
    * any candidate filter with total recall — hyperplane LSH bands or
    * IVF-cell multi-probe at any setting — emits ≥86% of all pairs and just
    * adds band-duplication overhead. When the corpus clusters (real
    * embedding corpora), use [[cosineNearDupsCells]] for the sub-quadratic
    * approximate path — oracle-gated by x46's subset + recall bar against
    * this exact pair set.
    */
  def cosineNearDups(
      corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rowsPerBlock: Int = 512): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // one cheap count job sizes the block grid (parquet count = metadata)
    val n = corpus.count()
    val g = math.max(1L, (n + rowsPerBlock - 1) / rowsPerBlock).toInt
    val blockPairs = broadcast(
      (for { i <- 0 until g; j <- i until g } yield (i, j)).toDF("ga", "gb"))

    // norms precomputed per row below the join: each pair costs ONE native dot
    def side(id: String, v: String, nm: String, blk: String) = corpus.select(
      col(idCol).as(id), col(vecCol).as(v), norm(col(vecCol)).as(nm),
      pmod(xxhash64(col(idCol)), lit(g)).cast("int").as(blk))

    // A replicates over its row of the block grid (broadcast join, no
    // shuffle); the B join shuffles both sides on the block id only
    val pairs = side("id_a", "va", "na", "ga")
      .join(blockPairs, "ga")
      .join(side("id_b", "vb", "nb", "gb"), "gb")
      // same-block pairs appear in both orientations — keep one; cross-block
      // pairs appear exactly once (ga < gb) in arbitrary id order
      .filter(col("ga") =!= col("gb") || col("id_a") < col("id_b"))
    // cosine is orientation-independent bit-for-bit: IEEE multiply is
    // commutative and the fold order over elements is fixed
    pairs.select(
        least(col("id_a"), col("id_b")).as("a_id"),
        greatest(col("id_a"), col("id_b")).as("b_id"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Approximate near-dup pairs via IVF-cell blocking (SemDeDup-style):
    * vectors multi-assign to their `nprobe` nearest of `nlist` centroid
    * cells; only same-cell pairs are compared (exact cosine), deduplicated
    * across cells. Sub-quadratic when the corpus clusters — candidate volume
    * is Σ|cell|², and recall covers exactly the pairs some probed cell
    * captures. On the deliberately uniform test fixture this measures ~0.8
    * recall at 42% of the pair volume (see OperatorsSpec); on clustered real
    * corpora both numbers improve together.
    */
  def cosineNearDupsCells(
      corpus: DataFrame, threshold: Double,
      nlist: Int = 32, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val centroids = c.orderBy("vec_id").limit(nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = c.join(broadcast(centroids), lit(true))
      .select(col("vec_id"), col("v"), col("cent_id"), cosine(col("v"), col("cv")).as("csim"))
      .withColumn("r", row_number().over(wAssign)).filter(col("r") <= nprobe)
      .select(col("vec_id"), col("v"), col("cent_id").as("cell"))

    val a = assigned.select(col("vec_id").as("a_id"), col("v").as("va"),
      norm(col("v")).as("na"), col("cell"))
    val b = assigned.select(col("vec_id").as("b_id"), col("v").as("vb"),
      norm(col("v")).as("nb"), col("cell"))
    a.join(b, Seq("cell")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= threshold)
      .dropDuplicates("a_id", "b_id")
  }

  /** Scalar (per-vector min/max) int8 quantization — the 4×-compression
    * first step of any large ANN index (float32 → one code byte per
    * dimension). Emits the code array, the (offset, scale) dequant params,
    * and the max absolute dequantization error per vector. Pure row-local
    * expressions in one scan; every arithmetic step (cast, subtract,
    * divide, ×255, +0.5, floor) is mirrored by the oracle in the same
    * order, so codes and errors verify bit-for-bit. A constant vector
    * (max == min) quantizes to all-zero codes by contract.
    */
  def scalarQuantize(
      df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val mn = array_min(col(vecCol)).cast("double")
    val mx = array_max(col(vecCol)).cast("double")
    df.select(col(idCol), col(vecCol), mn.as("offset"), (mx - mn).as("range"))
      .select(col(idCol), col("offset"),
        (col("range") / 255.0).as("scale"),
        transform(col(vecCol), v =>
          when(col("range") === 0.0, 0L)
            .otherwise(floor((v.cast("double") - col("offset")) / col("range") * 255.0 + 0.5)
              .cast("long"))).as("codes"),
        transform(col(vecCol), v =>
          abs(col("offset") +
            when(col("range") === 0.0, 0.0)
              .otherwise(floor((v.cast("double") - col("offset")) / col("range") * 255.0 + 0.5)) /
              255.0 * col("range") -
            v.cast("double"))).as("__errs"))
      .withColumn("max_err", array_max(col("__errs")))
      .drop("__errs")
  }
}
