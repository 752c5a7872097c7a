package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

import graft.model.TableType
import graft.table.KeyedTable

/** Standing PQ (product-quantization) index AS a keyed graft table — the
  * compressed twin of [[AnnIndex]]: where AnnIndex persists coarse cells
  * for probe locality, PqIndex persists x44's trained codebooks and every
  * vector's m-code encoding, so ADC search runs against STORAGE with no
  * Lloyd training and no corpus re-encode per batch.
  *
  * After one [[build]]:
  *  1. [[probe]] scores the stored codes against a per-query lookup table
  *     (broadcast, m·codebookSize rows) — the ADC scan touches only small
  *     ints, full vectors never shuffle — then re-ranks the bounded
  *     shortlist exactly against the stored vector rows;
  *  2. [[append]] encodes a new batch against the STORED codebooks (one
  *     broadcast argmax over the batch) and lands codes + vectors as one
  *     keyed upsert — no retraining, O(batch) cost.
  *
  * The table stack is inherited: `asOf` probes reproduce a historical
  * search bit-for-bit, CDC streams index growth, OCC serializes concurrent
  * appenders. Probe results are bit-identical to [[Similarity.pqTopK]]
  * over the same codebooks (PqIndexSpec pins it), and x64 oracle-gates
  * recall@10 like x44.
  *
  * Layout — one table, hive-partitioned by `kind`:
  *  - `kind='codebook'`: (s, id = cent_id, code = null, v = sub-centroid);
  *    m·codebookSize rows, the broadcast side of every probe and append.
  *  - `kind='code'`: (s, id = vec_id, code, v = null); n·m rows of three
  *    scalars — the compressed corpus the ADC scan reads.
  *  - `kind='vector'`: (s = 0, id = vec_id, code = null, v = embedding);
  *    only the shortlist's rows are ever pulled (broadcast semi-join), so
  *    the full-precision column prices re-rank exactness, not scan cost.
  */
object PqIndex {

  val KindCol = "kind"
  val CodebookKind = "codebook"
  val CodeKind = "code"
  val VectorKind = "vector"
  val CentroidKind = "centroid" // coarse IVF cells (present when nlist > 0)

  /** Table property stamping how the stored codes were produced
    * ("residual" | "raw") — a build-time constant for the table's life, so
    * probes (including `asOf` ones) read it as one tiny JSON get instead
    * of running a Spark action against the centroid partition per probe.
    */
  val EncodingProp = "pq.encoding"

  private def codebookRows(cb: DataFrame): DataFrame =
    cb.select(lit(CodebookKind).as(KindCol), col("s").cast("int").as("s"),
      col("cent_id").cast(LongType).as("id"), lit(null).cast(LongType).as("code"),
      lit(null).cast(LongType).as("cell"), col("cv").as("v"))

  private def centroidRows(coarse: DataFrame): DataFrame =
    coarse.select(lit(CentroidKind).as(KindCol), lit(0).as("s"),
      col("cent_id").cast(LongType).as("id"), lit(null).cast(LongType).as("code"),
      col("cent_id").cast(LongType).as("cell"), col("cv").as("v"))

  // codes/vecs arrive with a (possibly null) `cell` column already attached
  private def codeRows(codes: DataFrame): DataFrame =
    codes.select(lit(CodeKind).as(KindCol), col("s").cast("int").as("s"),
      col("vec_id").cast(LongType).as("id"), col("code").cast(LongType).as("code"),
      col("cell").cast(LongType).as("cell"), lit(null).cast(ArrayType(FloatType)).as("v"))

  private def vectorRows(vecs: DataFrame): DataFrame =
    vecs.select(lit(VectorKind).as(KindCol), lit(0).as("s"),
      col("vec_id").cast(LongType).as("id"), lit(null).cast(LongType).as("code"),
      col("cell").cast(LongType).as("cell"), col("v"))

  /** Residual frame `(vec_id, rv = v − c_cell, cell)` of cell-stamped
    * vectors against their coarse centroids — what residual PQ trains on
    * and encodes (broadcast centroid join + one zip_with, no shuffle).
    */
  private def residualize(vecs: DataFrame, coarse: DataFrame): DataFrame =
    vecs.join(broadcast(coarse), col("cell") === col("cent_id"))
      .select(col("vec_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("rv"), col("cell"))

  /** Nearest coarse cell per vector (broadcast + map-side argmax), or a
    * null cell column when no coarse centroids exist (flat-PQ mode).
    */
  private def withCell(vecs: DataFrame, coarse: Option[DataFrame]): DataFrame =
    coarse match {
      case None => vecs.withColumn("cell", lit(null).cast(LongType))
      case Some(c) =>
        vecs.join(broadcast(c), lit(true))
          .select(col("vec_id"), col("v"), col("cent_id"),
            Similarity.cosine(col("v"), col("cv")).as("csim"))
          .groupBy("vec_id")
          .agg(Similarity.argmaxById(col("csim"), col("cent_id")).as("cell"),
            first(col("v")).as("v"))
    }

  /** Train ONCE and persist: grouped Lloyd over the m subspaces (decimal-
    * deterministic, one corpus scan per iteration for all subspaces), one
    * encode pass, one table create — the only place training ever runs.
    * `nlist > 0` additionally trains COARSE IVF centroids, stamps every
    * code/vector row with its cell, and — the FAISS IVFPQ quantization
    * scheme, not just its table layout — trains the PQ codebooks on
    * RESIDUALS (vector − its coarse centroid) and encodes residuals: the
    * residual distribution is far tighter than the raw one, so the same
    * (m, codebookSize) budget spends its precision where vectors actually
    * differ from their cell, and recall under cell restriction rises.
    * Probes with `nprobe > 0` scan only the probed cells' codes (ADC cost
    * tracks nprobe/nlist of the corpus); the probe reconstitutes the
    * absolute score from the broadcast per-(cell, s, code) cross terms.
    * Flat builds (`nlist = 0`) encode raw vectors and stay bit-identical
    * to [[Similarity.pqTopK]] over the same codebooks.
    */
  /** Train the model over `vecs0` = (vec_id, v) and encode it: raw or
    * residual per `residualEnc` (residual needs coarse cells; raw may still
    * be cell-stamped — the pre-residual layout [[retrain]] must PRESERVE so
    * historical `asOf` probes keep scoring against the encoding their codes
    * were written under). Returns (codebooks, cell-stamped codes,
    * cell-stamped vectors) — shared by [[build]] and [[retrain]] so the two
    * cannot drift.
    */
  private def trainEncode(
      vecs0: DataFrame, coarse: Option[DataFrame], residualEnc: Boolean,
      dim: Int, m: Int, codebookSize: Int, iters: Int): (DataFrame, DataFrame, DataFrame) = {
    val vecs = withCell(vecs0, coarse)
    coarse match {
      case Some(c) if residualEnc =>
        // FAISS residual PQ: codebooks train on (v − c_cell), codes encode it
        val resid = residualize(vecs, c)
        val cb = Similarity.pqCodebooks(resid, dim, m, codebookSize, iters, "vec_id", "rv")
        (cb, Similarity.pqEncode(resid, cb, dim, m, "vec_id", "rv")
          .join(vecs.select(col("vec_id"), col("cell")), "vec_id"), vecs)
      case _ =>
        val cb = Similarity.pqCodebooks(vecs0, dim, m, codebookSize, iters, "vec_id", "v")
        (cb, Similarity.pqEncode(vecs0, cb, dim, m, "vec_id", "v")
          .join(vecs.select(col("vec_id"), col("cell")), "vec_id"), vecs)
    }
  }

  def build(
      spark: SparkSession, tablePath: String, corpus: DataFrame,
      dim: Int, m: Int = 8, codebookSize: Int = 16, iters: Int = 2,
      nlist: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val vecs0 = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val coarse =
      if (nlist <= 0) None
      else Some(Similarity.kmeansCentroids(corpus, nlist, iters, idCol, vecCol))
    val (cb, codes, vecs) =
      trainEncode(vecs0, coarse, residualEnc = coarse.isDefined, dim, m, codebookSize, iters)
    val rows = (Seq(codebookRows(cb)) ++ coarse.map(centroidRows) ++
      Seq(codeRows(codes), vectorRows(vecs))).reduce(_ unionByName _)
    // born with compact.auto (a standing index LIVES on streamed appends —
    // the unbounded-delta-chain shape the policy hook exists for) and the
    // encoding stamp probes read instead of probing the centroid partition —
    // both atomic with the create (no crash window without the stamps)
    KeyedTable.create(spark, tablePath, rows,
      tableName = "graft_pq_index",
      keyFields = Seq(KindCol, "s", "id"), precombineField = "id",
      partitionFields = Seq(KindCol), tableType = TableType.MergeOnRead,
      properties = Map(
        graft.table.TableProperties.CompactAuto -> "true",
        EncodingProp -> (if (nlist > 0) "residual" else "raw")))
    ()
  }

  /** The stored coarse IVF centroids (empty in flat-PQ mode). */
  def coarseCentroids(
      spark: SparkSession, tablePath: String,
      asOf: Option[String] = None): DataFrame =
    readIndex(spark, tablePath, asOf)
      .filter(col(KindCol) === CentroidKind)
      .select(col("id").as("cent_id"), col("v").as("cv"))

  /** The stored model's (dim, m), read from the codebook partition (m =
    * subspace count, dim = m · sub-centroid length; m·K rows, one bounded
    * agg). The geometry an append MUST encode under — callers that hold a
    * configured (dim, m) drift the moment a reshaping retrain lands, so
    * sync paths derive it from storage instead ([[IndexSync]]).
    */
  def storedGeometry(spark: SparkSession, tablePath: String): (Int, Int) = {
    val r = codebooks(spark, tablePath)
      .agg(countDistinct(col("s")).as("m"), max(size(col("cv")))
        .as("d")).collect()(0)
    require(!r.isNullAt(1), s"no codebooks stored at $tablePath")
    val m = r.getLong(0).toInt
    (m * r.getInt(1), m)
  }

  /** The stored codebooks `(s, cent_id, cv)` at the live tip (or `asOf`). */
  def codebooks(
      spark: SparkSession, tablePath: String,
      asOf: Option[String] = None): DataFrame =
    readIndex(spark, tablePath, asOf)
      .filter(col(KindCol) === CodebookKind)
      .select(col("s"), col("id").as("cent_id"), col("v").as("cv"))

  private def readIndex(
      spark: SparkSession, tablePath: String, asOf: Option[String]): DataFrame =
    asOf.map(KeyedTable.readAsOf(spark, tablePath, _))
      .getOrElse(KeyedTable.read(spark, tablePath))

  /** True when the stored codes are residual-encoded. The build-time stamp
    * answers without a Spark action; an ABSENT stamp means the table
    * predates the residual scheme, whose cell-stamped builds encoded RAW —
    * so absence reads as raw (never as "centroids present ⇒ residual":
    * that fallback silently mis-scored exactly those older tables).
    * Caveat for tables built in the narrow pre-stamp window where residual
    * encoding already existed: storage cannot distinguish raw from residual
    * codes (both are small ints), so the ONLY safe remedy is the operator
    * declaring the vintage once via [[stampEncoding]] — the raw default is
    * the older, larger population.
    */
  private def encodingOf(spark: SparkSession, tablePath: String): Boolean =
    graft.table.TableProperties.get(spark, tablePath)
      .get(EncodingProp).contains("residual")

  /** One-time migration for a PRE-STAMP index table: declare how its stored
    * codes were produced. Unstamped tables default to raw everywhere
    * ([[encodingOf]]); a table built by a binary that residual-encoded but
    * did not yet stamp would then be ADC-scored as raw and extended with
    * raw-encoded appends — both silently wrong, and a later retrain would
    * permanently stamp it 'raw'. The codes themselves cannot reveal the
    * scheme (raw and residual codes are the same small ints), so the
    * operator states the build vintage once and every probe / append /
    * retrain after it is self-describing. Refuses to FLIP an existing
    * stamp: that is a declaration mismatch, not a migration — rebuild
    * instead.
    */
  def stampEncoding(
      spark: SparkSession, tablePath: String, residual: Boolean): Unit = {
    val want = if (residual) "residual" else "raw"
    graft.table.TableProperties.get(spark, tablePath).get(EncodingProp) match {
      case Some(cur) if cur != want => throw graft.model.GraftException.config(
        s"index at $tablePath is already stamped pq.encoding=$cur; " +
          s"stamping '$want' would mis-describe its stored codes — rebuild " +
          "under the desired scheme instead.")
      case Some(_) => () // already declared — idempotent
      case None =>
        // raw is always declarable; residual additionally needs cells
        if (residual && KeyedTable.read(spark, tablePath)
            .filter(col(KindCol) === CentroidKind).limit(1).isEmpty)
          throw graft.model.GraftException.config(
            s"index at $tablePath has no coarse centroids - residual codes " +
              "are impossible without cells; refusing the 'residual' stamp.")
        graft.table.TableProperties.set(spark, tablePath, Map(EncodingProp -> want))
    }
  }

  /** Encode a new batch against the STORED codebooks (no retraining) and
    * upsert its code + vector rows — one MOR delta commit, O(batch) cost;
    * re-delivered ids fold to one entry per (kind, s, id).
    */
  def append(
      spark: SparkSession, tablePath: String, batch: DataFrame,
      dim: Int, m: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cb = codebooks(spark, tablePath)
    val coarseDf = coarseCentroids(spark, tablePath)
    val coarse = if (coarseDf.isEmpty) None else Some(coarseDf)
    val vecs = withCell(
      batch.select(col(idCol).as("vec_id"), col(vecCol).as("v")), coarse)
    // encode MATCHING the stored codes' scheme: the build-time stamp says
    // residual or raw; an absent stamp means a pre-residual-scheme table,
    // whose codes are RAW even when cell-stamped — residualizing a new
    // batch against raw codebooks would corrupt its ADC scores silently
    val codes = (coarse match {
      case Some(c) if encodingOf(spark, tablePath) => // residual
        Similarity.pqEncode(residualize(vecs, c), cb, dim, m, "vec_id", "rv")
      case _ => Similarity.pqEncode(batch, cb, dim, m, idCol, vecCol)
    }).join(vecs.select(col("vec_id"), col("cell")), "vec_id")
    KeyedTable.upsert(spark, tablePath,
      codeRows(codes).unionByName(vectorRows(vecs)))
  }

  /** Re-fit the quantization model IN PLACE from the STORED vectors —
    * [[AnnIndex.retrain]]'s compressed twin: appends encode against FROZEN
    * codebooks (and coarse centroids), so a drifting corpus degrades ADC
    * fidelity cell by cell; retrain re-runs coarse Lloyd (cell-stamped
    * indexes; `nlist = 0` keeps the current list count, larger SPLITS) and
    * the grouped subspace Lloyd over the stored vector partition,
    * re-encodes every vector, and lands new centroids + codebooks + codes
    * (+ tombstones for every stale (kind, s, id) key — so `m`,
    * `codebookSize`, and `nlist` may all change) as ONE commit
    * ([[KeyedTable.mergeRows]], images beat same-key tombstones). No read
    * ever sees a half-retrained index; `asOf` probes reproduce the old
    * model; rollback restores it wholesale. MODE-PRESERVING by design:
    * flat stays flat, cell-stamped stays cell-stamped — the encoding stamp
    * is a build-time constant that historical probes rely on, so switching
    * layouts is a rebuild, not a retrain (the FAISS posture too: the index
    * type is fixed, training refits it).
    */
  def retrain(
      spark: SparkSession, tablePath: String,
      dim: Int, m: Int = 8, codebookSize: Int = 16, iters: Int = 2,
      nlist: Int = 0): Unit = {
    val t = KeyedTable.read(spark, tablePath)
    // MODE (cell-stamped vs flat) and ENCODING (residual vs raw) are
    // separate build-time facts: post-stamp builds tie them together
    // (nlist > 0 ⟺ residual), but a table built before the residual scheme
    // can be cell-stamped with RAW codes — its retrain must re-encode RAW
    // (probes score under the stamped/absent encoding, and historical asOf
    // probes keep doing so, so flipping the encoding here would silently
    // mis-score them all)
    val residualEnc = graft.table.TableProperties.get(spark, tablePath)
      .get(EncodingProp).contains("residual")
    val cellStamped =
      residualEnc || !t.filter(col(KindCol) === CentroidKind).limit(1).isEmpty
    require(!(nlist > 0 && !cellStamped),
      "retrain cannot convert a flat index to IVF-PQ — the encoding is a " +
        "build-time layout historical probes rely on; rebuild with nlist > 0 instead")
    val vecs0 = t.filter(col(KindCol) === VectorKind)
      .select(col("id").as("vec_id"), col("v"))
    val coarse =
      if (!cellStamped) None
      else {
        val n = if (nlist > 0) nlist
          else t.filter(col(KindCol) === CentroidKind).count().toInt
        Some(Similarity.kmeansCentroids(vecs0, n, iters, "vec_id", "v"))
      }
    val (cb, codes, vecs) =
      trainEncode(vecs0, coarse, residualEnc, dim, m, codebookSize, iters)
    val images = (Seq(codebookRows(cb)) ++ coarse.map(centroidRows) ++
      Seq(codeRows(codes), vectorRows(vecs))).reduce(_ unionByName _)
    val dels = t.filter(col(KindCol).isin(CodebookKind, CentroidKind, CodeKind))
      .select(col(KindCol), col("s"), col("id"))
    KeyedTable.mergeRows(spark, tablePath, dels, images)
    // stamp the (preserved) encoding alongside the merge, mirroring build:
    // a pre-stamp table leaves retrain self-describing instead of
    // fallback-dependent forever
    graft.table.TableProperties.set(spark, tablePath,
      Map(EncodingProp -> (if (residualEnc) "residual" else "raw")))
    ()
  }

  /** Takedown leg: drop `ids`' CODE and VECTOR rows from the standing
    * index — one keyed tombstone delta of (kind, s, id) keys, O(|ids|·m)
    * three-scalar rows, so a corpus deletion propagates: the removed
    * vector's codes never enter an ADC scan again and its full-precision
    * row never re-ranks. Codebooks and coarse centroids are untouched —
    * trained state, not corpus rows (the FAISS posture). History is
    * retained, not rewritten: an `asOf` probe BEFORE the removal still
    * reproduces the historical search; pair with `cleanArchive` when the
    * bytes themselves must go. Re-appending the id re-serves it.
    */
  def remove(
      spark: SparkSession, tablePath: String, ids: DataFrame,
      idCol: String = "vec_id"): Unit = {
    val idsN = ids.select(col(idCol).cast(LongType).as("id")).distinct()
    // one code row per (subspace, id): the stored codebook partition knows m
    val ss = readIndex(spark, tablePath, None)
      .filter(col(KindCol) === CodebookKind).select("s").distinct()
    val codeKeys = idsN.crossJoin(broadcast(ss))
      .select(lit(CodeKind).as(KindCol), col("s"), col("id"))
    val vecKeys = idsN.select(lit(VectorKind).as(KindCol), lit(0).as("s"), col("id"))
    KeyedTable.delete(spark, tablePath, codeKeys.unionByName(vecKeys))
  }

  /** PQ-ADC top-k against the STORED index ([[Similarity.pqTopK]]'s exact
    * plan shape, with codebooks/codes/vectors served from storage): per
    * query the (s, code) → partial-dot LUT broadcasts, the code scan sums
    * it per (query, vector), and the `k·shortlist` ADC winners re-rank
    * exactly against the stored vector rows (bounded broadcast semi-join).
    * Zero training, zero encode, zero table writes at query time.
    *
    * Cell-stamped indexes store RESIDUAL codes, so their ADC score
    * reconstitutes cos(q, c + r̂) from three broadcast-sized tables:
    * per-(query, s, code) residual partial dots (the ordinary LUT over the
    * residual codebooks), per-(query, cell) coarse dots, and the
    * per-(cell, s, code) cross terms ⟨c_s, cv⟩ + ‖cv‖² (nlist·m·K rows)
    * that complete ‖c + r̂‖² = ‖c‖² + 2Σ⟨c_s, cv_s⟩ + Σ‖cv_s‖² — still a
    * codes-scan + broadcast joins + one (query, vec) sum, nothing
    * vector-sized shuffles. Flat indexes keep the raw two-term form.
    */
  def probe(
      spark: SparkSession, tablePath: String, queries: DataFrame, k: Int,
      dim: Int, m: Int = 8, shortlist: Int = 5, nprobe: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      asOf: Option[String] = None): DataFrame = {
    val d = dim / m
    val t = readIndex(spark, tablePath, asOf)
    val cb = t.filter(col(KindCol) === CodebookKind)
      .select(col("s"), col("id").as("cent_id"), col("v").as("cv"))
    val allCodes = t.filter(col(KindCol) === CodeKind)
      .select(col("id").as("vec_id"), col("s"), col("code"), col("cell"))
    val vectors = t.filter(col(KindCol) === VectorKind)
      .select(col("id").as("vec_id"), col("v"))
    val coarse = t.filter(col(KindCol) === CentroidKind)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    // the build-time stamp answers the ENCODING question without a Spark
    // action (constant for the table's life, so asOf probes read it too);
    // an absent stamp = pre-residual-scheme table = raw codes, even when
    // cell-stamped — those cells still serve the IVF restriction below
    val residual = encodingOf(spark, tablePath)

    // IVF leg (nprobe > 0 on a cell-stamped index): each query picks its
    // nprobe nearest COARSE cells against the tiny broadcast centroid set,
    // and the ADC scan below reads only those cells' codes — cost tracks
    // nprobe/nlist of the corpus, the FAISS IVF-PQ shape
    val codes =
      if (nprobe <= 0) allCodes
      else {
        // fail FAST on the silent-empty misconfiguration: nprobe > 0 against
        // an index built flat (nlist = 0) would match no cell anywhere and
        // read as "no neighbors" instead of an error. Residual-stamped
        // tables have cells by construction (no action); raw/unstamped ones
        // probe the centroid partition (one limit(1) off the hot path —
        // every post-stamp IVF table is residual)
        if (!residual && coarse.limit(1).isEmpty)
          throw new IllegalArgumentException(
            s"probe(nprobe=$nprobe) needs coarse IVF cells, but the index at " +
              s"$tablePath was built flat (nlist = 0). Rebuild with nlist > 0 " +
              "or probe with nprobe = 0 (full ADC scan).")
        val wProbe = Window.partitionBy("query_id")
          .orderBy(col("csim").desc, col("cent_id").asc)
        val cellProbes = queries
          .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
          .join(broadcast(coarse), lit(true))
          .select(col("query_id"), col("cent_id"),
            Similarity.cosine(col("qv"), col("cv")).as("csim"))
          .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
          .select(col("query_id").as("probe_query"), col("cent_id").as("cell"))
        allCodes.join(broadcast(cellProbes), "cell")
          .select(col("probe_query"), col("vec_id"), col("s"), col("code"), col("cell"))
      }

    val qsubs = queries.select(col(idCol).as("query_id"),
      Similarity.norm(col(vecCol)).as("qnorm"),
      posexplode(array((0 until m).map(s => slice(col(vecCol), s * d + 1, d)): _*))
        .as(Seq("s", "qsub")))
    val lut = qsubs.join(cb, "s")
      .select(col("query_id"), col("qnorm"), col("s"), col("cent_id").as("code"),
        Similarity.dot(col("qsub"), col("cv")).as("pdot"),
        Similarity.dot(col("cv"), col("cv")).as("cn2"))

    val wShort = Window.partitionBy("query_id").orderBy(col("adc_sim").desc, col("vec_id").asc)
    val scored =
      if (nprobe <= 0) codes.join(broadcast(lut), Seq("s", "code"))
      else codes.join(broadcast(lut),
        codes("probe_query") === lut("query_id") &&
          codes("s") === lut("s") && codes("code") === lut("code"))
        .drop("probe_query").drop(codes("s")).drop(codes("code"))
    val grouped =
      if (!residual)
        scored.groupBy("query_id", "vec_id")
          .agg(sum(col("pdot")).as("num"), sum(col("cn2")).as("den2"),
            max(col("qnorm")).as("qn"))
          .withColumn("adc_sim", col("num") / (col("qn") * sqrt(col("den2"))))
      else {
        // residual reconstruction: the cross-term table is nlist·m·K rows
        // (e.g. 16·16·16 = 4k) and the per-(query, cell) coarse dots are
        // |queries|·nlist rows — both broadcast with the plan
        val csubs = coarse.select(col("cent_id").as("cell"),
          posexplode(array((0 until m).map(s => slice(col("cv"), s * d + 1, d)): _*))
            .as(Seq("s", "csub")))
        val crossT = csubs.join(cb, "s")
          .select(col("cell"), col("s"), col("cent_id").as("code"),
            Similarity.dot(col("csub"), col("cv")).as("ccross"))
        val cnorm = coarse.select(col("cent_id").as("cell"),
          Similarity.dot(col("cv"), col("cv")).as("cn2c"))
        val qcell = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
          .join(broadcast(coarse), lit(true))
          .select(col("query_id"), col("cent_id").as("cell"),
            Similarity.dot(col("qv"), col("cv")).as("qdotc"))
        scored.join(broadcast(crossT), Seq("cell", "s", "code"))
          .groupBy("query_id", "vec_id")
          .agg(sum(col("pdot")).as("pnum"),
            sum(col("ccross") * lit(2.0) + col("cn2")).as("rden"),
            max(col("qnorm")).as("qn"), max(col("cell")).as("cell"))
          .join(broadcast(qcell), Seq("query_id", "cell"))
          .join(broadcast(cnorm), Seq("cell"))
          .withColumn("adc_sim", (col("qdotc") + col("pnum")) /
            (col("qn") * sqrt(col("cn2c") + col("rden"))))
      }
    val short = grouped
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("r", row_number().over(wShort)).filter(col("r") <= k * shortlist)
      .select(col("query_id"), col("vec_id"))

    val cand = vectors
      .join(broadcast(short.select("vec_id").distinct()), Seq("vec_id"), "left_semi")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wRank = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    short.join(cand, "vec_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        Similarity.cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
  }
}
