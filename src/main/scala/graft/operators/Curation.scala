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

  /** Gopher/Dolma-style repetition signals per document: the fraction of the
    * n-gram MULTISET covered by its single most frequent member
    * (`top_ngram_frac`) and the fraction that are repeats of an earlier
    * occurrence (`dup_ngram_frac` = 1 − distinct/total) — the two standard
    * boilerplate/SEO-spam filters a corpus pipeline applies after dedup.
    * Shape: explode the multiset, count per (doc, gram), re-aggregate per
    * doc. Both shuffles key on doc_id(+gram), so work is proportional to
    * corpus token count and skew is bounded by the longest document, not
    * corpus size. All ratios are integer divisions in double — bit-identical
    * across engines.
    */
  def repetitionStats(
      df: DataFrame, idCol: Column, textCol: Column, n: Int): DataFrame = {
    val grams = df.select(idCol.as("__id"),
      explode(graft.functions.NativeExpressions.word_ngrams(
        split(textCol, "\\s+"), n)).as("__g"))
    grams.groupBy("__id", "__g").agg(count(lit(1)).as("__cnt"))
      .groupBy("__id").agg(
        max(col("__cnt")).as("__top"),
        sum(col("__cnt")).as("__total"),
        count(lit(1)).as("__distinct"))
      .select(col("__id"),
        (col("__top").cast("double") / col("__total").cast("double"))
          .as("top_ngram_frac"),
        (lit(1.0) - col("__distinct").cast("double") / col("__total").cast("double"))
          .as("dup_ngram_frac"))
  }

  /** Alphabetic-character fraction — the third standard quality gate (a
    * page of markup/digits scores near 0). Pure expression in the scan.
    */
  def alphaFrac(text: Column): Column =
    // empty doc → 0.0, not 0/0: Spark's double division yields NULL while
    // DuckDB yields NaN, so an unguarded empty doc breaks cross-engine checks
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
        length(text).cast("double"))

  /** Keyword extraction: top-`k` terms per document by tf·idf. `idf` here is
    * the RATIONAL form N/df (one IEEE division — bit-identical in every
    * engine) rather than ln(N/df): Java's Math.log and libm disagree by
    * 1 ulp on ~0.05% of inputs, which would make cross-engine verification
    * flaky, and for RANKING terms within a fixed corpus the two are
    * order-equivalent wherever tf ties break the same way (ln is monotone in
    * df for fixed tf; across different tf values the rankings can differ —
    * this variant is the contract). Ties break by term asc.
    *
    * Shape: explode terms → tf per (doc, term) [shuffle on doc+term] → df
    * per term [shuffle on term, map-side combined] → broadcast the doc count
    * → per-doc top-k window [shuffle on doc]. The df table is |vocab| rows —
    * Spark broadcasts it back onto the tf side automatically.
    */
  def tfidfKeywords(
      df: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame = {
    val terms = df.select(idCol.as("__id"),
      explode(split(textCol, "\\s+")).as("term"))
    val tf = terms.groupBy("__id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.select(countDistinct(idCol).as("__n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") * (col("__n").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
  }

  // ------------------------------------------------------------------ URLs

  /** URL dissection with plain regexes — RE2-safe, no lookaround, mirrored
    * verbatim by the DuckDB oracle. Spark's `parse_url` is JVM-URI
    * semantics no other engine reproduces bit-for-bit, so portability wins
    * over the built-in here. Registrable-domain is the last two labels
    * (no public-suffix list in a zero-egress build — documented
    * approximation; co.uk-style suffixes group at the suffix).
    */
  val UrlHostPattern = "^[a-z]+://([^/?#]+)"
  val UrlPathPattern = "^[a-z]+://[^/?#]+(/[^?#]*)"
  val RegistrableDomainPattern = "([^.]+\\.[^.]+)$"

  def urlHost(url: Column): Column =
    lower(regexp_extract(url, UrlHostPattern, 1))

  def urlRegistrableDomain(url: Column): Column =
    regexp_extract(urlHost(url), RegistrableDomainPattern, 1)

  /** Path-segment count: `/docs/en/5` → 3, `/p/` → 1 (trailing slashes are
    * not a segment), no path or bare `/` → 0.
    */
  def urlPathDepth(url: Column): Column = {
    val path = regexp_replace(regexp_extract(url, UrlPathPattern, 1), "/+$", "")
    when(length(path) === 0, lit(0L))
      .otherwise((size(split(path, "/")) - 1).cast("long"))
  }

  /** Domain blocklist filter — the spam/adult/SEO-farm drop every public
    * web corpus applies first. The blocklist ships as a literal IN-list
    * (bounded set, evaluates inside the scan); list too large → broadcast
    * left_anti join on [[urlRegistrableDomain]] instead.
    */
  def domainBlocklistFilter(df: DataFrame, urlCol: Column, blocked: Seq[String]): DataFrame =
    df.filter(!urlRegistrableDomain(urlCol).isin(blocked: _*))

  // -------------------------------------------------------- quality gating

  /** Stopword set for the quality gate — presence of common function words
    * is the classic natural-language-vs-gibberish discriminator (Gopher
    * rule 8). Bounded literal, shared with the oracle.
    */
  val QualityStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Gopher-style composite quality gate: per-document signals, the list of
    * failed rules (`reasons`, sorted and comma-joined so the verdict is one
    * driver-comparable string), and the final `keep`. All signals are pure
    * expressions over one tokenization inside the scan — no shuffle, no UDF;
    * the corpus-scale cost is exactly one pass.
    *
    * Rules (names are the reason labels):
    *   too_few_words     word count < minWords
    *   too_many_words    word count > maxWords
    *   mean_word_len     mean word length outside [minMeanLen, maxMeanLen]
    *   low_alpha         alphabetic-char fraction < minAlpha
    *   few_stopwords     distinct stopwords present < minStopHits
    */
  def qualityGate(
      df: DataFrame, textCol: Column,
      minWords: Int = 40, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlpha: Double = 0.8, minStopHits: Int = 2): DataFrame = {
    val toks = split(textCol, "\\s+")
    val wc = size(toks).cast("long")
    val nonspace = length(regexp_replace(textCol, "\\s+", "")).cast("double")
    val meanLen = when(wc === 0, lit(0.0)).otherwise(nonspace / wc.cast("double"))
    val stopHits = QualityStopwords
      .map(w => when(array_contains(toks, w), 1L).otherwise(0L))
      .reduce(_ + _)
    val out = df
      .withColumn("wc", wc)
      .withColumn("mean_wlen", meanLen)
      .withColumn("alpha_frac", alphaFrac(textCol))
      .withColumn("stop_hits", stopHits)
    val rules: Seq[(String, Column)] = Seq(
      "few_stopwords" -> (col("stop_hits") < minStopHits),
      "low_alpha" -> (col("alpha_frac") < minAlpha),
      "mean_word_len" -> (col("mean_wlen") < minMeanLen || col("mean_wlen") > maxMeanLen),
      "too_few_words" -> (col("wc") < minWords),
      "too_many_words" -> (col("wc") > maxWords))
    // rule names are pre-sorted above, so concat_ws of the fired subset is
    // already in sorted order — same construction as the oracle's
    val reasons = concat_ws(",",
      rules.map { case (name, fired) => when(fired, name) }: _*)
    out.withColumn("reasons", reasons)
      .withColumn("keep", col("reasons") === "")
  }

  // ----------------------------------------------- line-level boilerplate

  /** C4/RefinedWeb-style line-level boilerplate removal: a line occurring
    * in more than `maxDfFrac` of documents is boilerplate (nav bars, cookie
    * banners, legal footers) and is dropped from EVERY document; surviving
    * lines reassemble in original order. Returns (`__id`, `cleaned`,
    * `n_lines`) for every input doc — a fully-boilerplate doc comes back
    * with an empty string, not silently dropped.
    *
    * Shape: one posexplode, a line-df hash aggregation (map-side combined;
    * the df table is |distinct lines| rows), broadcast doc count, and a
    * per-doc `sort_array(collect_list(struct))` re-assembly — work is
    * proportional to corpus line count, skew bounded by the longest doc.
    */
  def lineDedup(
      df: DataFrame, idCol: Column, textCol: Column, maxDfFrac: Double): DataFrame = {
    // duplicate ids collapse to one output row (their line multisets merge):
    // distinct here keeps the ids→rebuilt left join from multiplying rows,
    // and the line document-frequency below already counts DISTINCT docs —
    // same unique-id contract as dedupAgainst, made explicit
    val ids = df.select(idCol.as("__id")).distinct()
    val lines = df.select(idCol.as("__id"),
      posexplode(split(textCol, "\n")).as(Seq("__idx", "__line")))
    val nDocs = df.select(countDistinct(idCol).as("__n"))
    val lineDf = lines.groupBy("__line").agg(countDistinct(col("__id")).as("__df"))
    val kept = lines.join(lineDf, "__line").crossJoin(broadcast(nDocs))
      .filter(col("__df").cast("double") / col("__n").cast("double") <= maxDfFrac)
    val rebuilt = kept.groupBy("__id").agg(
      concat_ws("\n",
        transform(array_sort(collect_list(struct(col("__idx"), col("__line")))),
          s => s.getField("__line"))).as("cleaned"),
      count(lit(1)).as("n_lines"))
    ids.join(rebuilt, Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("cleaned"), lit("")).as("cleaned"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"))
  }

  // ------------------------------------------------------ mixture sampling

  /** Domain-mixture sampling: per-source keep percentages (the "reweight
    * the training mixture" primitive — upsample curated sources, downsample
    * noisy ones). The decision composes [[hashSample]]'s deterministic
    * per-key hash with a per-source rate from a literal map — stable across
    * runs and engines, zero shuffles, evaluates inside the scan.
    */
  def mixtureSample(
      df: DataFrame, sourceCol: Column, keyCol: Column,
      rates: Map[String, Int], defaultRate: Int): DataFrame =
    df.filter(pmod(Portable.hash60(keyCol), lit(100)) <
      coalesce(element_at(typedLit(rates), sourceCol), lit(defaultRate)))

  // ----------------------------------------------------------- data splits

  /** Deterministic train/val/test assignment: the portable per-key hash
    * lands each row in a named split by percentage ranges — stable across
    * runs, engines, and corpus growth (a doc keeps its split forever, so
    * val/test never leak into training after a re-run over grown data).
    * Zero shuffles: the whole decision is one expression in the scan.
    */
  def assignSplits(
      df: DataFrame, keyCol: Column, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split weights must sum to 100, got $splits")
    val h = pmod(Portable.hash60(keyCol), lit(100))
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(bounds).init.foldRight(lit(splits.last._1)) {
      case (((name, _), bound), rest) => when(h < bound, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  // ------------------------------------------------------------ vocabulary

  /** Corpus vocabulary: the `k` most frequent whitespace tokens with term
    * frequency and document frequency. One explode + one hash aggregation
    * (map-side combined on the token); the top-k is TakeOrderedAndProject —
    * per-partition heaps of k, never a global sort. Ties break by term asc
    * so the cut is deterministic across engines.
    */
  def vocabulary(df: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame =
    df.select(idCol.as("__id"), explode(split(textCol, "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("tf"), countDistinct(col("__id")).as("df"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(k)

  /** CCNet-style n-gram language-model quality score: train an add-one-
    * smoothed bigram LM on the corpus itself and score every document by its
    * average per-bigram negative log-likelihood (low = fluent/typical,
    * high = garbled/outlier — the signal CCNet thresholds with a KenLM).
    *
    * Shape: token explode (corpus tokens) → bigram + unigram count
    * aggregations (map-side combined) → two equi-joins scoring each pair →
    * per-doc reassembly. Everything is linear in corpus tokens; the vocab
    * count is a broadcast 1-row aggregate.
    *
    * Engine portability (the hashed surface is PURE INTEGER): alongside the
    * double-precision `avg_nll` (for library callers; NOT oracle-hashed —
    * libm ln() differs across engines/builds by enough to flip any decimal
    * render, which hash-failed a driver round), each bigram's surprisal
    * −log2 P = log2(d/m) (d = c1+v, m = c2+1, d ≥ m) is quantized to
    * quarter-bits with EXACT integer arithmetic and no libm anywhere:
    * floor(4·log2(d/m)) = floor(log2(d⁴/m⁴)), found via a broadcast
    * 127-row powers-of-two table with COMPARISONS only: kd = floor(log2 d⁴)
    * and km = floor(log2 m⁴) from one range join, then kd−km vs kd−km−1
    * decided by a single multiplication whose value is ≤ 2·d⁴ — no decimal
    * division (whose capped result scale would overflow inside the
    * envelope) and no unbounded product. d⁴ is computed in DECIMAL(38,0)
    * (exact for d < 10⁹ unigram occurrences; HUGEINT on the DuckDB side),
    * so no decimal rounding mode is ever exercised. The per-doc render
    * `avg_nll_qbits_e4 = (10000·Σqb) div (4·n)` is BIGINT floor division in
    * both engines — identical by construction, no float, no decimal, no
    * rounding-mode semantics left to diverge. Documents with fewer than two
    * tokens carry no bigram evidence and are excluded.
    *
    * Skew: both count aggregations are two-level (Spark's partial
    * HashAggregate map-side combines per task, so a Zipf-head token's final
    * task receives ≤ #map-tasks rows, never corpus-proportional rows). The
    * only corpus-proportional shuffle on a token key is the pairs⨝score
    * join; its build side is DISTINCT bigrams (scored once each), and AQE
    * skew-join splits a head bigram's instance partition at runtime.
    */
  def ngramLmScore(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = df.sparkSession
    val docs = df.select(idCol.as("doc_id"), split(textCol, "\\s+").as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = docs.select(col("doc_id"),
      posexplode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1))).as(Seq("pos", "p")))
      .select(col("doc_id"), col("pos"),
        col("p").getField("0").as("w1"), col("p").getField("1").as("w2"))
    val unigrams = docs.select(explode(col("ws")).as("w"))
    val uc = unigrams.groupBy("w").agg(count(lit(1)).as("c1"))
    val bc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val vocab = unigrams.agg(countDistinct(col("w")).as("v"))

    // 2^k for k = 0..126 as exact DECIMAL(38,0) (2^126 ≈ 8.5e37 exceeds any
    // t = d⁴ div m⁴ with d < 1e9, so qb never silently caps; built
    // driver-side from BigInt, NOT pow(2,k), whose double result is inexact
    // past 2^53).
    val pow2 = {
      import spark.implicits._
      broadcast((0 to 126).map(k => (k.toLong, (BigInt(1) << k).toString))
        .toDF("k", "p2s")
        .select(col("k"), col("p2s").cast(DecimalType(38, 0)).as("p2")))
    }

    // Score each DISTINCT bigram once (|vocab²|-bounded, far smaller than
    // the instance stream): double lp for avg_nll, exact integer qb for the
    // portable render. qb = floor(log2(d⁴/m⁴)) computed WITHOUT division
    // (a decimal Divide's (38,6) result caps at ~1e32 and would overflow
    // to null/error inside the d < 1e9 envelope): first kd = floor(log2 d⁴)
    // and km = floor(log2 m⁴) from one broadcast range join against pow2
    // (pure comparisons), then the answer is kd−km or kd−km−1, decided by
    // ONE multiplication m⁴·2^(kd−km) ≤ d⁴ whose value is ≤ 2·d⁴ < 1e38 —
    // provably inside DECIMAL(38,0) for the whole envelope.
    val pre = bc
      .join(uc.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        log((col("c2") + 1).cast("double") / (col("c1") + col("v"))).as("lp"),
        (col("c2") + lit(1L)).cast(DecimalType(9, 0)).as("m"),
        // the exact-log2 envelope is d < 1e9 (d⁴ must fit DECIMAL(38,0));
        // past it the non-ANSI cast would null out and the pow2 join would
        // SILENTLY drop the bigram, corrupting n_bigrams and both scores —
        // fail loudly instead (shard the corpus or rescale counts to
        // continue; m ≤ d always, so one check bounds both)
        when(col("c1") + col("v") >= lit(1000000000L),
          raise_error(concat(
            lit("ngramLmScore: unigram count + vocab >= 1e9 for token '"),
            col("w1"),
            lit("' — outside the exact quarter-bit log2 envelope (d^4 must " +
              "fit DECIMAL(38,0)); shard the corpus or downscale counts."))))
          .otherwise((col("c1") + col("v")).cast(DecimalType(9, 0))).as("d"))
      .withColumn("m4", col("m") * col("m") * col("m") * col("m"))
      .withColumn("d4", col("d") * col("d") * col("d") * col("d"))
    val score = pre
      .join(pow2, col("p2") <= col("d4")) // d⁴ ≥ m⁴, so one join bounds both
      .groupBy("w1", "w2", "lp", "m4", "d4")
      .agg(max(col("k")).as("kd"),
        max(when(col("p2") <= col("m4"), col("k"))).as("km"))
      .withColumn("kdiff", col("kd") - col("km"))
      .join(pow2.withColumnRenamed("k", "kdiff").withColumnRenamed("p2", "p2diff"),
        Seq("kdiff"))
      .select(col("w1"), col("w2"), col("lp"),
        when(col("m4") * col("p2diff") <= col("d4"), col("kdiff"))
          .otherwise(col("kdiff") - 1).as("qb"))

    pairs
      .join(score, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("qb")).as("s_qb"),
        // document-order fold keeps the double reproducible run-to-run on
        // THIS engine; it is not part of the hashed oracle surface
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("lp")))),
            s => s.getField("lp")),
          lit(0.0), (acc, x) => acc + x).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        (-col("s") / col("n_bigrams")).as("avg_nll"),
        expr("(10000 * s_qb) div (4 * n_bigrams)").as("avg_nll_qbits_e4"))
  }

  /** Domain drift between corpus slices: Jensen–Shannon divergence of the
    * whitespace-token distributions for every pair of `groupCol` values —
    * the monitoring signal that tells a pipeline one source shifted (new
    * crawl, new template, silent corruption) before a model sees it.
    *
    * Shape: one token explode → (group, token) counts (map-side combined) →
    * per-group totals (broadcast |groups| rows) → self-join of the count
    * table on token over group pairs → per-pair aggregation. Work is linear
    * in |vocab|·|group pairs| with |groups| typically tiny.
    *
    * Engine portability (the hashed surface is PURE INTEGER): the JS
    * divergence needs libm ln(), whose value can differ across
    * engines/builds by enough to flip ANY fixed-point render (a per-term
    * DECIMAL(20,8) round hash-failed a driver round), so `js_divergence` is
    * emitted as a plain DOUBLE for library callers and is NOT the oracle
    * surface. The portable drift measure emitted beside it is the L1
    * distance of the two token distributions quantized to parts-per-billion
    * with exact integer floor division:
    * `l1_ppb = Σ_w |（10⁹·c_a) div n_a − (10⁹·c_b) div n_b|` — BIGINT maths
    * identical by construction in every engine (L1/2 = total-variation
    * distance, as standard a drift signal as JS). Exact while per-source
    * token counts stay below 9.2·10⁹ (10⁹·c must fit a 64-bit long);
    * beyond that, drop the resolution a digit.
    *
    * Skew: the only raw-token shuffle is the (g, w) count, which Spark
    * executes as a two-level aggregation (partial map-side combine), so a
    * Zipf-head token's final task receives ≤ #map-tasks rows. The pair join
    * operates on per-(pair, token) DISTINCT count rows — one row per side
    * per token — so no instance-level hotspot exists there at any scale.
    */
  def domainDrift(df: DataFrame, groupCol: Column, textCol: Column): DataFrame = {
    val tokens = df.select(groupCol.as("g"), explode(split(textCol, "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = tokens.groupBy("g", "w").agg(count(lit(1)).as("c"))
    val totals = tokens.groupBy("g").agg(count(lit(1)).as("n"))
    val withP = counts.join(broadcast(totals), "g")
      .select(col("g"), col("w"), (col("c").cast("double") / col("n")).as("p"),
        expr("(1000000000 * c) div n").as("p_ppb"))

    // (pair, token) relation via two broadcast pair-joins + one full outer on
    // (pair, token): a token absent from one side arrives with a null p
    val pairs = broadcast(totals.select(col("g").as("src_a"))
      .crossJoin(totals.select(col("g").as("src_b")))
      .filter(col("src_a") < col("src_b")))
    val left = withP.join(pairs, col("g") === col("src_a"))
      .select(col("src_a"), col("src_b"), col("w"),
        col("p").as("pa"), col("p_ppb").as("pa_ppb"))
    val right = withP.join(pairs, col("g") === col("src_b"))
      .select(col("src_a"), col("src_b"), col("w"),
        col("p").as("pb"), col("p_ppb").as("pb_ppb"))
    val m = (coalesce(col("pa"), lit(0.0)) + coalesce(col("pb"), lit(0.0))) / 2
    val term =
      when(col("pa").isNotNull, col("pa") * log(col("pa") / m) / 2).otherwise(0.0) +
        when(col("pb").isNotNull, col("pb") * log(col("pb") / m) / 2).otherwise(0.0)
    left.join(right, Seq("src_a", "src_b", "w"), "full_outer")
      .select(col("src_a"), col("src_b"), term.as("t"),
        abs(coalesce(col("pa_ppb"), lit(0L)) - coalesce(col("pb_ppb"), lit(0L)))
          .as("l1_term"),
        when(col("pa").isNotNull && col("pb").isNotNull, 1L).otherwise(0L).as("shared"))
      .groupBy("src_a", "src_b")
      .agg(sum(col("t")).as("js_divergence"),
        sum(col("l1_term")).as("l1_ppb"),
        count(lit(1)).as("n_tokens"), sum(col("shared")).as("n_shared"))
  }

  /** Cross-source duplicate overlap matrix: for every pair of `groupCol`
    * values, how many DISTINCT document texts appear in both — the
    * contamination-triage view that tells a pipeline which sources mirror
    * each other (and therefore which dedup pass pays for itself). Reported
    * with per-source distinct counts and the overlap Jaccard.
    *
    * Shape: md5 fingerprint in the scan → (group, fp) distinct (one
    * shuffle) → self-equi-join on fp (a fingerprint in k sources meets
    * k(k-1)/2 times — bounded by |sources|², never corpus size) → broadcast
    * pair enumeration fills in zero-overlap pairs. The Jaccard renders as
    * `overlap_ppm = (10⁶·n_shared) div (n_a + n_b − n_shared)` — BIGINT
    * floor division of integer inputs, identical by construction in every
    * engine (a DOUBLE-division→DECIMAL cast of the same ratio hash-failed a
    * driver round despite provably terminating values, so the hashed
    * surface carries no float and no decimal at all).
    */
  def overlapMatrix(df: DataFrame, groupCol: Column, textCol: Column): DataFrame = {
    val fps = df.select(groupCol.as("g"), md5(textCol).as("fp")).distinct()
    val totals = fps.groupBy("g").agg(count(lit(1)).as("n"))
    val shared = fps.select(col("g").as("src_a"), col("fp"))
      .join(fps.select(col("g").as("src_b"), col("fp")), "fp")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    broadcast(totals.select(col("g").as("src_a"), col("n").as("n_a")))
      .crossJoin(broadcast(totals.select(col("g").as("src_b"), col("n").as("n_b"))))
      .filter(col("src_a") < col("src_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_shared"),
        expr("(1000000 * n_shared) div (n_a + n_b - n_shared)").as("overlap_ppm"))
  }

  /** Token-budget corpus selection: keep the highest-quality documents whose
    * whitespace-token counts fit a global `budget` — the data-selection
    * primitive ("the best N tokens") behind quality-pruned training mixes.
    *
    * An exact greedy-by-quality selection needs a global quality order with
    * a running token sum — a single-partition window over the corpus.
    * Instead quality quantizes into 1000 buckets: per-bucket token totals
    * aggregate map-side and collect (≤1001 rows at ANY scale), the driver
    * finds the cutoff bucket, every doc above the cutoff is kept by a scan
    * filter, and only the CUTOFF bucket's docs pay an ordered window (by
    * the portable hash, for determinism) to fill the remaining budget
    * exactly. The budget bound is exact; quantization only blurs which
    * quality-ties fill the last bucket. Selection is the strict
    * quality-ordered prefix: buckets below the first overflow are excluded
    * even if a smaller one would still fit.
    *
    * The cutoff bucket itself re-quantizes a second level before paying the
    * window: its docs split into 1024 slices by the TOP BITS of the same
    * hash the fill order uses (`hash60 div 2^50` — slice order IS hash
    * order, so the selected prefix is bit-identical), per-slice totals
    * collect (≤1025 rows), full slices keep by scan filter, and the ordered
    * single-partition window runs over only the one cutoff SLICE —
    * ~1/10⁶ of the corpus instead of ~1/10³, so no task ever materializes a
    * bucket-sized partition at 100 TB.
    */
  def tokenBudgetSelect(
      df: DataFrame, idCol: Column, textCol: Column, budget: Long): DataFrame =
    tokenBudgetSelect(df, idCol, textCol, budget,
      t => size(split(t, "\\s+")).cast("long"))

  /** Variant taking the per-doc token counter as a function of the text
    * column — the hook that lets a REAL tokenizer drive the budget (e.g.
    * a broadcast-joined [[Bpe.tokenCounts]] segmentation, or any learned
    * counter) instead of the whitespace default. Same algorithm, same
    * determinism.
    */
  def tokenBudgetSelect(
      df: DataFrame, idCol: Column, textCol: Column, budget: Long,
      tokenCountOf: Column => Column): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val scored = df.select(idCol.as("doc_id"), textCol.as("text"))
      .withColumn("n_tokens", tokenCountOf(col("text")))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket",
        floor(graft.functions.TextFunctions.qualityScore(col("text")) * 1000).cast("long"))
      .select("doc_id", "n_tokens", "bucket")

    val totals = scored.groupBy("bucket").agg(sum(col("n_tokens")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    var cum = 0L
    var cutoff = Option.empty[Long]
    totals.foreach { case (b, t) =>
      if (cutoff.isEmpty) {
        if (cum + t <= budget) cum += t
        else cutoff = Some(b)
      }
    }
    cutoff match {
      case None => scored // everything fits
      case Some(cb) =>
        val remaining = budget - cum
        // second quantization level: slice the cutoff bucket by the hash's
        // top bits (slice order == hash order, so the fill prefix is
        // unchanged), collect ≤1025 slice totals, window only the cutoff
        // slice
        val cut = scored.filter(col("bucket") === cb)
          .withColumn("__h", Portable.hash60(col("doc_id").cast("string")))
          .withColumn("__sub", expr(s"__h div ${1L << 50}"))
        val subTotals = cut.groupBy("__sub").agg(sum(col("n_tokens")).as("toks"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
        var cum2 = 0L
        var subCut = Option.empty[Long]
        subTotals.foreach { case (sb, t) =>
          if (subCut.isEmpty) {
            if (cum2 + t <= remaining) cum2 += t
            else subCut = Some(sb)
          }
        }
        val kept = subCut match {
          case None => cut // the whole cutoff bucket fits (budget boundary)
          case Some(scb) =>
            val rem2 = remaining - cum2
            val w = Window.partitionBy(lit(1))
              .orderBy(col("__h").asc, col("doc_id").asc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            val inSub = cut.filter(col("__sub") === scb)
              .withColumn("__cum", sum(col("n_tokens")).over(w))
              .filter(col("__cum") <= rem2).drop("__cum")
            cut.filter(col("__sub") < scb).unionByName(inSub)
        }
        scored.filter(col("bucket") > cb).unionByName(kept.drop("__h", "__sub"))
    }
  }

  /** Stratified deterministic sample: EXACTLY `perStratum` rows from every
    * stratum (fewer iff the stratum is smaller), picked by md5-hash order of
    * the key — the "balanced eval slice" primitive. Unlike [[hashSample]]
    * (Bernoulli per row, binomial stratum sizes) the count per stratum is
    * exact; unlike `df.sample`, re-runs and engines agree bit-for-bit. One
    * window shuffle on the stratum key.
    */
  /** Model-based quality classifier (x56) — the trained leg next to the
    * rule-based Gopher gate: a fastText-shaped LINEAR bag-of-words
    * classifier whose per-token weights train in CLOSED FORM from a labeled
    * column (multinomial naive-Bayes log-odds with add-one smoothing — the
    * NB half of NBSVM, one aggregation pass instead of SGD epochs, so a
    * DuckDB oracle reproduces training AND inference cell-for-cell).
    *
    * All arithmetic is the x49 exact quarter-bit integer log2 (floor(4·
    * log2 x) = floor(log2 x⁴) via a broadcast 127-row powers-of-two
    * comparison table — no libm, nothing to drift): per-token weight
    * w_qb = qb4(c_pos+1) − qb4(c_neg+1); per-doc score = Σ_occurrences w_qb
    * + n_toks·[qb4(T_neg+V) − qb4(T_pos+V)] + [qb4(D_pos) − qb4(D_neg)]
    * (the class-total normalization and the class prior, exact scalar
    * integers computed driver-side from BigInt bit length). Verdict:
    * score_qb > 0.
    *
    * Scale: two map-combined token-count aggregations + one distinct-token
    * weight table joined back against the token stream (the x49 posture:
    * build side is |vocab|-bounded, AQE splits a Zipf head at runtime);
    * nothing corpus-sized iterates — training IS the aggregation.
    */
  def nbQualityClassifier(
      df: DataFrame, idCol: Column, textCol: Column, labelCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = df.sparkSession
    val toks = df.select(idCol.as("doc_id"), labelCol.cast("boolean").as("y"),
      explode(split(textCol, "\\s+")).as("w"))
    val counts = toks.groupBy("w").agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("cpos"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("cneg"))
      .select(col("w"),
        // same exact-log2 envelope as ngramLmScore: counts must stay < 1e9
        // or the fourth power leaves DECIMAL(38,0) — fail loudly, never drop
        when(col("cpos") + 1 >= lit(1000000000L) || col("cneg") + 1 >= lit(1000000000L),
          raise_error(concat(lit("nbQualityClassifier: token count + 1 >= 1e9 for '"),
            col("w"), lit("' — outside the exact quarter-bit log2 envelope."))))
          .otherwise((col("cpos") + 1).cast(DecimalType(9, 0))).as("mp"),
        (col("cneg") + 1).cast(DecimalType(9, 0)).as("mn"))
      .withColumn("mp4", col("mp") * col("mp") * col("mp") * col("mp"))
      .withColumn("mn4", col("mn") * col("mn") * col("mn") * col("mn"))
    val pow2 = {
      import spark.implicits._
      broadcast((0 to 126).map(k => (k.toLong, (BigInt(1) << k).toString))
        .toDF("k", "p2s")
        .select(col("k"), col("p2s").cast(DecimalType(38, 0)).as("p2")))
    }
    val weights = counts
      .join(pow2, col("p2") <= greatest(col("mp4"), col("mn4")))
      .groupBy("w")
      .agg((max(when(col("p2") <= col("mp4"), col("k"))) -
        max(when(col("p2") <= col("mn4"), col("k")))).as("wqb"))

    // exact scalar constants (bounded collects): class totals, vocab size,
    // doc priors — qb4 via BigInt bit length (floor(log2 n) = bitLength-1)
    def qb4(n: Long): Long = {
      require(n > 0, s"qb4 needs a positive count, got $n")
      (BigInt(n).pow(4).bitLength - 1).toLong
    }
    val t = toks.agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("tn"),
      countDistinct(col("w")).as("v")).head()
    val d = df.agg(
      sum(when(labelCol.cast("boolean"), 1L).otherwise(0L)).as("dp"),
      sum(when(!labelCol.cast("boolean"), 1L).otherwise(0L)).as("dn")).head()
    val biasQb = qb4(t.getLong(1) + t.getLong(2)) - qb4(t.getLong(0) + t.getLong(2))
    val priorQb = qb4(d.getLong(0)) - qb4(d.getLong(1))

    toks.join(weights, Seq("w"))
      .groupBy(col("doc_id"), col("y").as("label"))
      .agg(count(lit(1)).as("n_toks"), sum(col("wqb")).as("swqb"))
      .select(col("doc_id"), col("label"), col("n_toks"),
        (col("swqb") + col("n_toks") * lit(biasQb) + lit(priorQb)).as("score_qb"))
      .withColumn("pred_pos", col("score_qb") > 0)
  }

  /** Epoch-weighted dataset mixing (x58): materialize the training-recipe
    * repeat plan — per-source epoch weights like `src0 → 2.3` mean every
    * src0 doc appears twice and a deterministic 30% of them a third time
    * (the Llama-style data recipe: up-weight small high-quality sources by
    * fractional epochs). Fully deterministic: the fractional pick is the
    * portable 60-bit hash of (seed, doc id) against a parts-per-million
    * threshold, and every emitted copy carries a `shuffle_key` — the hash
    * of (seed, id, copy) — so a range-partition/sort on it IS the epoch's
    * reproducible global training order, with copies of the same document
    * scattered apart instead of adjacent. Pure scan work: a per-row repeat
    * count from a literal CASE over the source column + one bounded
    * sequence explode; zero shuffles — ordering is the CONSUMER's
    * range-partition on shuffle_key, never a global sort here.
    */
  def epochMix(
      df: DataFrame, sourceCol: Column, idCol: Column,
      weights: Seq[(String, Double)], defaultWeight: Double = 1.0,
      seed: String = "epoch0"): DataFrame = {
    (weights.map(_._2) :+ defaultWeight).foreach(w =>
      require(w >= 0 && w < 1000, s"epoch weight must be in [0, 1000), got $w"))
    def floorOf(w: Double): Long = math.floor(w).toLong
    def fracPpm(w: Double): Long = math.round((w - math.floor(w)) * 1000000)
    val wFloor = weights.foldLeft(lit(floorOf(defaultWeight))) {
      case (acc, (s, w)) => when(sourceCol === s, lit(floorOf(w))).otherwise(acc)
    }
    val wFrac = weights.foldLeft(lit(fracPpm(defaultWeight))) {
      case (acc, (s, w)) => when(sourceCol === s, lit(fracPpm(w))).otherwise(acc)
    }
    val pick = pmod(
      Portable.hash60(concat(lit(seed), lit(":"), idCol.cast("string"))), lit(1000000L))
    df.withColumn("__n", wFloor + when(pick < wFrac, 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .select(idCol.as("doc_id"), sourceCol.as("source"),
        explode(sequence(lit(0L), col("__n") - 1)).as("copy"))
      .withColumn("shuffle_key",
        Portable.hash60(concat(lit(seed), lit("|"), col("doc_id").cast("string"),
          lit("#"), col("copy").cast("string"))))
  }

  def stratifiedSample(
      df: DataFrame, strataCol: Column, keyCol: Column, perStratum: Int): DataFrame =
    groupQuota(df, strataCol, perStratum,
      Portable.hash60(keyCol).asc, keyCol.asc)
}
