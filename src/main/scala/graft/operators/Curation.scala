package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Corpus-curation operators a training-data pipeline runs after dedup:
  * deterministic sampling, per-group quotas, PII redaction. All pure Column
  * expressions over one scan — no UDFs, no shuffles except where the
  * semantics demand a per-group window.
  */
object Curation {

  /** Deterministic hash sampling: keep a row iff
    * `md5-hash(key) mod 100 < percent`. Unlike `df.sample`, the decision is
    * a pure function of the key — stable across runs, cluster layouts, and
    * engines (the DuckDB oracle reproduces it bit-for-bit), and a re-run
    * over grown data keeps every previously-sampled row. This is how large
    * pipelines carve eval slices. Zero shuffles: the predicate evaluates
    * inside the scan.
    */
  def hashSample(df: DataFrame, keyCol: Column, percent: Int): DataFrame =
    df.filter(pmod(Portable.hash60(keyCol), lit(100)) < percent)

  /** The matching DuckDB predicate fragment for oracle builders. */
  def hashSampleSql(keyExpr: String, percent: Int): String =
    s"(${Portable.sqlHash60(keyExpr)} % 100) < $percent"

  /** Per-group quota: keep at most `quota` rows per `groupCol`, picking by
    * `orderCols` (e.g. best-quality-first). One window shuffle on the group
    * key — the balanced-corpus primitive ("at most N docs per domain").
    * Group skew is the window partition's problem, not a join's: a hot group
    * costs one task sorting its rows, bounded by maxRecordsPerBatch spill.
    */
  def groupQuota(
      df: DataFrame, groupCol: Column, quota: Int, orderCols: Column*): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCols: _*)
    df.withColumn("__qrn", row_number().over(w))
      .filter(col("__qrn") <= quota)
      .drop("__qrn")
  }

  /** PII patterns shared by the Spark and DuckDB sides — RE2/Java-compatible
    * subset (no lookaround), so both engines match identically.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Count + redact emails and phone numbers in one projection: the
    * detect-and-scrub pass every public-text corpus runs before training.
    * Pure regexp expressions, evaluated inside the scan.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  def piiCounts(text: Column): (Column, Column) = (
    regexp_count(text, lit(EmailPattern)),
    regexp_count(text, lit(PhonePattern)))

  /** Split documents into token chunks of `chunkSize` with stride
    * `stride` (overlap = chunkSize − stride) — the pre-tokenization pass
    * that turns long documents into training windows. One row-local explode
    * over computed chunk starts: no shuffle, chunk count proportional to
    * document length. Emits (chunk_idx, chunk_tokens, chunk) per input row.
    */
  def chunk(df: DataFrame, textCol: Column, chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride, "need 0 < stride <= chunkSize")
    // tokenize ONCE per document, below the Generate boundary — inlining the
    // split into the per-chunk slice would re-run the regex for every chunk
    // row, O(tokens²/stride) per doc (projection collapse does not cross
    // the explode, so the alias is safe here)
    df.withColumn("__toks", split(textCol, "\\s+"))
      .withColumn("__start",
        explode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(stride))))
      .withColumn("chunk_idx", (col("__start") / stride).cast("long"))
      .withColumn("__ctoks", slice(col("__toks"), col("__start") + 1, lit(chunkSize)))
      .withColumn("chunk_tokens", size(col("__ctoks")).cast("long"))
      .withColumn("chunk", concat_ws(" ", col("__ctoks")))
      .drop("__toks", "__start", "__ctoks")
  }

  /** Sequential context-window packing: assign each doc (in doc-id order,
    * per group) to the bin where its tokens start, with `budget` tokens per
    * bin — the deterministic packing pass that batches documents into
    * fixed-size training windows. One window shuffle on the group key;
    * within-group cumulative sum does the rest in-partition. (A global
    * packing would be an unpartitioned window — per-group packing is both
    * the realistic semantics and the scalable plan.)
    */
  /** Benchmark-contamination screen: count, per doc, how many of the probe
    * n-grams (distinct word n-grams lifted from an eval/benchmark set)
    * appear verbatim in the doc — the standard decontamination step before
    * training. For a bounded probe set the whole test is one codegen'd
    * array intersection inside the scan (probes ship as a literal with the
    * plan): zero shuffles, O(corpus) work regardless of corpus size. For
    * probe sets too large to inline, [[contaminationJoin]] is the
    * shuffle-based twin.
    */
  def contaminationScan(
      df: DataFrame, textCol: Column, probes: Seq[String], n: Int): DataFrame =
    df.withColumn("matched_ngrams",
      size(array_intersect(
        Dedup.shingles(split(textCol, "\\s+"), n),
        lit(probes.distinct.toArray))).cast("long"))

  /** [[contaminationScan]] for probe sets that cannot ship as a literal
    * (full benchmark suites): explode doc n-grams once, inner-join the
    * probe table on the n-gram, count matches per doc. One shuffle on the
    * n-gram; Spark broadcasts the probe side automatically when it is
    * small enough.
    */
  def contaminationJoin(
      df: DataFrame, idCol: Column, textCol: Column,
      probes: DataFrame, probeCol: String, n: Int): DataFrame = {
    val grams = df.select(idCol.as("__id"),
        explode(Dedup.shingles(split(textCol, "\\s+"), n)).as("__g"))
      .join(probes.select(col(probeCol).as("__g")).distinct(), "__g")
      .groupBy("__id").agg(count(lit(1)).as("matched_ngrams"))
    df.join(grams, idCol === col("__id"), "left")
      .withColumn("matched_ngrams", coalesce(col("matched_ngrams"), lit(0L)))
      .drop("__id")
  }

  /** Drop contaminated docs (any probe n-gram present), keep the rest. */
  def decontaminate(
      df: DataFrame, textCol: Column, probes: Seq[String], n: Int): DataFrame =
    contaminationScan(df, textCol, probes, n)
      .filter(col("matched_ngrams") === 0L).drop("matched_ngrams")

  def packSequential(
      df: DataFrame, groupCol: Column, orderCol: Column,
      nTokens: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__before", coalesce(sum(nTokens).over(w), lit(0L)))
      .withColumn("bin", (col("__before") / budget).cast("long"))
      .drop("__before")
  }
}
