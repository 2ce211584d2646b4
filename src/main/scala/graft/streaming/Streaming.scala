package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming duals of the reference's live surface
  * (SURVEY §2-I):
  *
  *  - subscriptions pushing SegmentStatus (`pkg/api/messages.go:23-49`,
  *    snapshot-then-live) → an `update`-mode stateful aggregation whose
  *    state IS the latest SegmentStatus per segment;
  *  - space watermarks (`pkg/server/space_watermarks.go`) → event-time
  *    watermark + windowed aggregation;
  *  - eskit incremental replay → `flatMapGroupsWithState` folding
  *    per-aggregate state across micro-batches.
  *
  * At scale these run against a partitioned log with checkpointing; state
  * is keyed by (space, segment) so it shards across executors with the
  * state store. */
object Streaming {

  /** Per-thread digest (the WinnowedAnchors posture) — closure-side md5
    * draws must not allocate a MessageDigest per row. */
  private val Md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Load a frozen serving artifact destined for a closure-broadcast
    * stream dual, with the bound ENFORCED (r13 verdict #1: every one of
    * these artifacts is bounded by construction — df-banded vocab,
    * TEST-split anchors, strata-sized plans — but an unenforced bound
    * means a mis-built artifact OOMs the driver instead of failing a
    * named require). Counts first — one cheap job over a model-sized
    * table — then collects; past the bound the error names the
    * stream-static probe alternative. */
  private def boundedCollect(d: DataFrame, what: String, maxRows: Long,
      alt: String): Array[org.apache.spark.sql.Row] = {
    val n = d.count()
    require(n <= maxRows,
      s"frozen artifact $what has $n rows > $maxRows — too large for a " +
        s"driver-collected closure constant; $alt")
    d.collect()
  }

  /** File-source stream of the canonical entry columns (no sequence —
    * sequence assignment in a live pipeline happens at produce time).
    * The stream schema is probed from a batch read of the same directory
    * (file streams require an explicit schema): the driver's `ts` has
    * shipped as both TIMESTAMP(NANOS)→long-under-nanosAsLong and
    * TIMESTAMP(MICROS)→TIMESTAMP_NTZ, and `EventLog.tsUs` normalizes
    * either to epoch micros — one definition with the batch adapter, so
    * stream==batch convergence specs stay meaningful. */
  def readEntryStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val probe = spark.read.parquet(dir)
    spark.readStream
      .schema(probe.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .select(
        col("event_type").as("space"),
        col("user_id").cast("string").as("segment"),
        graft.sources.EventLog.tsUs(probe.schema("ts").dataType).as("ts_us"),
        col("event_id"),
        col("value"),
        col("props").as("payload"))
  }

  /** Schema of the produced layout (EventLogWriter.write): sequence is
    * materialized at produce time; `space` is the partition directory
    * column, which the file stream source discovers when it appears in
    * the schema. */
  val producedSchema: StructType = StructType(Seq(
    StructField("segment", StringType),
    StructField("ts_us", LongType),
    StructField("event_id", LongType),
    StructField("value", DoubleType),
    StructField("payload", StringType),
    StructField("sequence", LongType),
    StructField("space", StringType)))

  /** File-source stream over the produced layout — the live form of
    * EventLogWriter.readProduced, sequences included. */
  def readProducedStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(producedSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .select(col("space"), col("segment"), col("sequence"), col("ts_us"),
        col("event_id"), col("value"), col("payload"))

  /** Streaming ConsumeSpace-from-offset (`pkg/api/messages.go:146-159`):
    * resume a live space subscription strictly after its
    * `(ts_us, segment, sequence)` cursor — `Entry.GetSpaceOffset`
    * (`messages.go:113-116`). The cursor is a pure row predicate applied
    * per micro-batch before any stateful op, so resumption is stateless:
    * no replayed state store, no reprocessing of pre-cursor history
    * beyond the scan (and on the produced layout the ts/sequence bounds
    * prune parquet row groups). */
  def consumeSpaceFromOffsetStream(entryStream: DataFrame, space: String,
      cursorTsUs: Long, cursorSegment: String,
      cursorSequence: Long): DataFrame =
    entryStream
      .filter(col("space") === space)
      .filter(struct(col("ts_us"), col("segment"), col("sequence")) >
        struct(lit(cursorTsUs), lit(cursorSegment), lit(cursorSequence)))

  /** Streaming Consume (multi-space merge, `pkg/api/messages.go:130-144`):
    * the live dual of StreamOps.consumeMulti. `cursors` maps each
    * subscribed space to an optional resolved space-offset tuple
    * (ts_us, segment, sequence) — the form a live client actually holds
    * (`Entry.GetSpaceOffset`, `messages.go:113-116`); `None` = no cursor,
    * read the space from the start. Routing is a stream-static inner
    * join against the broadcast O(#spaces) cursor table (only subscribed
    * spaces pass — the server's space-offsets routing), and the cursor
    * itself is a pure per-row tuple predicate evaluated per micro-batch
    * BEFORE any stateful op, so resumption replays no state store. */
  def consumeMultiStream(entryStream: DataFrame,
      cursors: Map[String, Option[(Long, String, Long)]]): DataFrame = {
    val spark = entryStream.sparkSession
    import spark.implicits._
    val anchors = cursors.toSeq.map { case (sp, c) =>
      (sp, c.map(_._1), c.map(_._2), c.map(_._3))
    }.toDF("a_space", "a_ts_us", "a_segment", "a_sequence")
    entryStream
      .join(broadcast(anchors), col("space") === col("a_space"))
      .filter(col("a_ts_us").isNull ||
        struct(col("ts_us"), col("segment"), col("sequence")) >
          struct(col("a_ts_us"), col("a_segment"), col("a_sequence")))
      .select(col("space"), col("segment"), col("sequence"), col("ts_us"),
        col("value"), col("payload"))
  }

  /** Live Peek (`pkg/api/messages.go:72-81`): the latest entry of every
    * segment in a space, maintained incrementally over the produce feed —
    * the same one-pass max_by state as the batch StreamOps.peek, sharded
    * by (space, segment) with the state store. outputMode("update")
    * emits exactly the segments whose head moved each micro-batch. */
  def peekStream(producedStream: DataFrame, space: String): DataFrame =
    producedStream
      .filter(col("space") === space)
      .groupBy(col("space"), col("segment"))
      .agg(
        max(col("sequence")).as("sequence"),
        max_by(col("ts_us"), col("sequence")).as("ts_us"),
        max_by(col("value"), col("sequence")).as("value"),
        max_by(col("payload"), col("sequence")).as("payload"))

  /** Live SegmentStatus feed: per-(space, segment) aggregate whose update
    * stream mirrors subscription notifications. Use outputMode("update")
    * so each micro-batch emits exactly the segments whose status changed —
    * the dual of SegmentNotification fan-out. */
  def segmentStatusStream(entryStream: DataFrame): DataFrame =
    entryStream
      .groupBy(col("space"), col("segment"))
      .agg(
        count(lit(1)).as("n_entries"),
        min(col("ts_us")).as("first_ts_us"),
        max(col("ts_us")).as("last_ts_us"))

  /** Watermarked tumbling window per space (event time = ts_us). */
  def windowedCounts(entryStream: DataFrame, window: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    entryStream
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .groupBy(col("space"),
        org.apache.spark.sql.functions.window(col("event_time"), window))
      .agg(count(lit(1)).as("n"), graft.sources.EventLog.sumValueExact.as("sum_value"))
      .select(col("space"), unix_micros(col("window.start")).as("window_start_us"),
        col("n"), col("sum_value"))

  /** Gap-based session windows per (space, segment) — the streaming dual
    * of Windows.sessionize via the built-in merging session_window
    * operator. */
  def sessionCounts(entryStream: DataFrame, gap: String = "30 minutes",
      watermark: String = "40 days"): DataFrame =
    entryStream
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .groupBy(col("space"), col("segment"),
        session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"),
        graft.sources.EventLog.sumValueExact.as("sum_value"))
      .select(col("space"), col("segment"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), col("sum_value"))

  /** Live TRX recovery monitor (`internal/txn` recovery loop as a
    * stream): per-transaction completeness over a produce feed, state
    * keyed by (space, segment, trx_id) so it shards with the state
    * store. An incomplete transaction visible after its segment has
    * moved on is exactly what the reference's recovery scan looks for. */
  def trxAuditStream(producedStream: DataFrame,
      batchSize: Int): DataFrame = {
    // the batch stamping + audit are pure DataFrame transforms, so the
    // stream reuses them verbatim — one definition of trx identity and
    // completeness, which is what makes the stream==batch convergence
    // spec meaningful
    import graft.sources.EventLogWriter
    EventLogWriter.trxAudit(
      EventLogWriter.assignTrx(producedStream, batchSize), batchSize)
  }

  /** Streaming exact dedup: keep the first arrival of each content
    * digest across micro-batches (state = seen digests, sharded by
    * digest hash). The streaming dual of Dedup.exact for a live
    * ingestion pipeline. */
  def streamingDedup(docStream: DataFrame): DataFrame =
    docStream
      .withColumn("digest", md5(lower(trim(col("text")))))
      .dropDuplicates("digest")

  /** Live char-class entropy gate — the ingest-time face of
    * `char_entropy`: [[graft.text.TextProfile.charEntropy]] is a PURE
    * per-row expression map (exact class counts, micro-snapped ln,
    * integer junk predicate — zero state, zero aggregation), so the
    * batch definition applies to the stream VERBATIM and per-row
    * semantics are exact by construction: any replay partition emits
    * the batch row for each doc, byte for byte. This is the cheapest
    * gate in the ingest chain — it runs BEFORE tokenization and drops
    * binary junk / encoding damage before any stateful stage pays for
    * it (the stream-side ordering mirror of the batch pipeline, where
    * char_entropy is the cheapest full-corpus pass). */
  def charEntropyStream(docStream: DataFrame,
      tauMicroNats: Long = 800000L): DataFrame =
    graft.text.TextProfile.charEntropy(docStream, tauMicroNats)

  /** Live curation stage — the streaming front of the batch curation
    * chain for an INGESTION pipeline: score each arriving document with
    * the batch quality definition (TextOps.qualityScored is a pure
    * per-row transform, reused verbatim — one definition of quality is
    * what makes the stream==batch convergence spec meaningful), gate on
    * the score, and keep only the FIRST arrival of each content digest
    * across micro-batches (state = seen digests, sharded by digest hash
    * exactly like [[streamingDedup]]). The near-dup / decontamination
    * stages stay batch jobs over the curated log — candidate joins need
    * corpus-wide indexes — so this stage's output IS their input feed. */
  def streamingCurate(docStream: DataFrame,
      minQuality: Double = 0.5): DataFrame =
    graft.text.TextOps.qualityScored(docStream)
      .filter(col("quality_score") >= minQuality)
      .withColumn("digest", md5(lower(trim(col("text")))))
      .dropDuplicates("digest")
      .select("doc_id", "lang", "source", "quality_score", "digest")

  /** Live anomaly monitor — the streaming dual of
    * [[graft.operators.Windows.anomaly]] in the lambda shape a
    * monitoring pipeline actually runs: watermarked tumbling counts per
    * space, scored against a STATIC offline baseline
    * ([[graft.operators.Windows.activityStats]], refreshed by a batch
    * job) with the identical integer-moment z expression and the same
    * rounded-z threshold. The stats side is one row per space, so
    * scoring is a broadcast join — no stateful operator beyond the
    * windowed count itself, and the state shards by (space, window)
    * exactly like [[windowedCounts]]. */
  def anomalyStream(entryStream: DataFrame, stats: DataFrame,
      widthUs: Long, tau: Double,
      watermark: String = "30 minutes"): DataFrame =
    entryStream
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .groupBy(col("space"),
        org.apache.spark.sql.functions.window(col("event_time"),
          s"$widthUs microseconds"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(stats), "space")
      .filter(col("n") * col("ss") - col("s") * col("s") > 0)
      .withColumn("z",
        round((col("n") * col("c") - col("s")).cast("double") /
          sqrt((col("n") * col("ss") - col("s") * col("s"))
            .cast("double")), 4))
      .filter(abs(col("z")) >= tau)
      .select(col("space"),
        unix_micros(col("window.start")).as("window_start_us"),
        col("c").as("n_events"), col("z"))

  /** Live multimodal ingest — the media front of the curation chain:
    * container headers decoded per arriving blob with the SAME batch
    * kernel (`Multimodal.extractFeatures` is a stateless mapPartitions,
    * so it applies to a stream unchanged — the streamingCurate
    * one-definition argument), then the shared per-format rollup
    * maintained incrementally. Undecodable blobs surface as `unknown`
    * rows exactly like batch: corrupt members are data, not stream
    * failures. State is one row per format — bounded by the codec set,
    * not the corpus. */
  def mediaFeaturesStream(mediaStream: DataFrame): DataFrame =
    graft.multimodal.Multimodal.featureRollup(
      graft.multimodal.Multimodal.extractFeatures(mediaStream).toDF())

  /** File-source embedding stream with the batch [[graft.similarity
    * .Knn.emb]] column contract (vec_id, label, v as array<double>). */
  def readEmbeddingStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  // Seq[Byte] (not Array[Byte]): the encoder must map qv to
  // ARRAY<TINYINT>, the quantize kernel's type — Array[Byte] means BINARY
  case class EmbEvent(vec_id: Long, label: Int, qv: Seq[Byte])
  case class DriftState(sums: Array[Long], n: Long)
  case class DriftRow(label: Long, n_vecs: Long, centroid_cos: Double)

  /** Live embedding-drift monitor — the streaming dual of
    * [[graft.similarity.Knn.embDriftQuantized]] in the shape a crawl
    * monitor actually runs: arriving embeddings are quantized with the
    * SAME [[graft.functions.QuantizeInt8]] kernel (stateless — the
    * one-definition convergence argument of streamingCurate /
    * mediaFeaturesStream), per-label integer code sums fold
    * incrementally (state = one dims-length long array per label —
    * bounded by labels·dims, never the corpus), and every update
    * re-scores the label's running centroid against a STATIC offline
    * corpus-centroid sum (`corpusSums`, the batch job's per-dim code
    * sums — the anomalyStream broadcast-baseline posture, here a
    * dims-length closure constant). The cosine is the IDENTICAL
    * integer-exact floor-half-up expression as batch (JVM
    * floor/sqrt/× over the same exact integers = the same IEEE ops
    * Spark SQL runs), and the s2 > 0 / c2 > 0 fences carry over — so
    * when the stream has consumed the corpus that produced
    * `corpusSums`, the last emit per label is bit-identical to the
    * batch row (StreamingSpec). */
  def embDriftStream(spark: SparkSession, embStream: DataFrame,
      corpusSums: Array[Long]): Dataset[DriftRow] = {
    import spark.implicits._
    val dims = corpusSums.length
    var c2 = 0L
    corpusSums.foreach(c => c2 += c * c)
    graft.similarity.Knn.quantize(embStream)
      .select(col("vec_id"), col("label"), col("qv")).as[EmbEvent]
      .groupByKey(_.label)
      .flatMapGroupsWithState[DriftState, DriftRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (label, events, state: GroupState[DriftState]) =>
          val prev = state.getOption
            .getOrElse(DriftState(new Array[Long](dims), 0L))
          val sums = prev.sums.clone()
          var n = prev.n
          events.foreach { e =>
            // a null embedding quantizes to a null code vector and the
            // batch posexplode drops it — it must not count here either
            if (e.qv != null) {
              val m = math.min(e.qv.length, dims)
              var i = 0
              while (i < m) { sums(i) += e.qv(i).toLong; i += 1 }
              n += 1L
            }
          }
          state.update(DriftState(sums, n))
          var dot = 0L
          var s2 = 0L
          var i = 0
          while (i < dims) {
            dot += sums(i) * corpusSums(i)
            s2 += sums(i) * sums(i)
            i += 1
          }
          if (s2 > 0L && c2 > 0L)
            Iterator.single(DriftRow(label.toLong, n,
              math.floor(dot.toDouble * 10000.0 /
                (math.sqrt(s2.toDouble) * math.sqrt(c2.toDouble))
                + 0.5) / 10000.0))
          else Iterator.empty
      }
  }

  /** Streaming MORE-LIKE-THIS — the incremental dual of
    * [[graft.text.TextOps.docSimilar]] in the shape a serving pipeline
    * actually runs: each ARRIVING document is vectorized against the
    * FROZEN df-banded vocabulary and scored against the PERSISTED
    * corpus vectors only ([[graft.text.TextOps.writeDocVectorIndex]]),
    * emitting its above-τ neighbors. Entirely STATELESS — per-row
    * vectorization + a stream-static lang equijoin — so it runs in
    * append mode with no state store; the corpus index is the state,
    * refreshed by the batch build exactly like anomalyStream's offline
    * baseline.
    *
    * Convergence (StreamingSpec): the frozen vocabulary ships as a
    * closure constant (the embDriftStream corpusSums posture — the
    * banded vocab IS the bounded serving model, the persisted-BPE
    * argument), per-doc tf folds in the closure over the SAME
    * lowercased tokenization expression as batch (one definition:
    * TextOps.lowerToks), weights/norms are exact integers (order-free
    * sums), keys and their canonical sort are the IDENTICAL
    * xxhash64(lang, term) + sort_array expressions, and the score is
    * the same kernel + floor-half-up chain — so when the stream has
    * replayed the corpus the index was built from, the emitted pair set
    * equals the batch doc_similar rows exactly (each undirected pair
    * served to both endpoints, scores bit-identical).
    *
    * The closure constant is bounded by construction (the df band caps
    * the vocab) and the bound is ENFORCED (`maxArtifactRows`, counted
    * before collect — r13 verdict #1); a corpus whose banded vocabulary
    * outgrows it runs [[runDocSimilarProbe]], the stream-static probe
    * with no driver-resident artifact at all. */
  def docSimilarStream(spark: SparkSession, docStream: DataFrame,
      vecTable: String, vocabTable: String, tau: Double = 0.9,
      maxArtifactRows: Long = 1L << 22): DataFrame = {
    import spark.implicits._
    require(tau > 0.0, s"bad tau=$tau")
    val vocab: Map[(String, String), Long] = boundedCollect(
        graft.sources.Staged.liveTable(spark, vocabTable)
          .select(col("lang"), col("term"), col("idf_milli")),
        vocabTable, maxArtifactRows,
        "re-band the vocabulary or run the stream-static probe " +
          "(Streaming.runDocSimilarProbe) instead")
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bc = spark.sparkContext.broadcast(vocab)
    val entries = graft.text.TextOps.lowerToks(
        docStream.select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"), col("toks"))
      .as[(Long, String, Seq[String])]
      .map { case (id, lang, toks) =>
        // per-doc tf over the doc's OWN tokens (bounded per row, no
        // streaming aggregation), gated by the frozen in-band vocab;
        // integer weights and n2 are order-free sums. A null-text doc
        // arrives with toks == null (split(null) is null, and batch
        // explode drops it) — treat as tokenless so the n2 > 0 fence
        // drops it here too, matching batch row-for-row
        val m = bc.value
        val ts = if (toks == null) Seq.empty[String] else toks
        val tf = scala.collection.mutable.HashMap.empty[String, Long]
        ts.foreach(t => tf.update(t, tf.getOrElse(t, 0L) + 1L))
        val terms = Seq.newBuilder[String]
        val tws = Seq.newBuilder[Long]
        var n2 = 0L
        tf.foreach { case (t, c) =>
          m.get((lang, t)).foreach { idf =>
            val w = c * idf
            terms += t; tws += w; n2 += w * w
          }
        }
        (id, lang, terms.result(), tws.result(), n2)
      }.toDF("doc_id", "lang", "terms", "tws", "n2")
      .filter(col("n2") > lit(0L)) // the batch NaN fence, verbatim
      // keys + canonical sort with the EXACT batch expressions
      .withColumn("kw", sort_array(expr(
        "transform(arrays_zip(terms, tws), p -> " +
          "named_struct('k', xxhash64(lang, p.terms), 'w', p.tws))")))
      .select(col("doc_id"), col("lang"), col("n2"),
        expr("transform(kw, s -> s.k)").as("ks"),
        expr("transform(kw, s -> s.w)").as("ws"))
    val corpus = graft.sources.Staged.liveTable(spark, vecTable)
      .select(col("doc_id").as("similar_id"), col("lang"),
        col("n2").as("cn2"), col("ks").as("cks"), col("ws").as("cws"))
    entries.join(corpus, Seq("lang"))
      .filter(col("doc_id") =!= col("similar_id"))
      .withColumn("dc", graft.functions.SparseDotCounts(
        col("ks"), col("ws"), col("cks"), col("cws")))
      .withColumn("score", graft.text.TextOps.quantizedCosine(
        col("dc").getItem(0), col("n2"), col("cn2")))
      .filter(col("score") >= tau)
      .select(col("lang"), col("doc_id"), col("similar_id"), col("score"))
  }

  /** Streaming DECONTAMINATION — the live hygiene gate of a training
    * pipeline: every ARRIVING train document is checked against the
    * FROZEN test-set anchor index before it is admitted, emitting
    * (train_doc, test_doc, n_anchors) evidence rows exactly like batch
    * [[graft.dedup.Dedup.contaminationSubstring]]. A release pipeline
    * runs the batch check once per cut; the ingest path runs THIS —
    * contaminated shards are flagged on arrival, not at release time.
    *
    * Entirely STATELESS (append mode, no state store): the df-capped
    * test-side index ([[graft.dedup.Dedup.writeAnchorIndex]] over the
    * test split) ships as a bounded broadcast closure constant — the
    * test split is the SMALL side by construction (3/16 here, a few
    * eval suites at 100 TB), the same bounded-serving-model argument as
    * docSimilarStream's frozen vocabulary and embDriftStream's corpus
    * sums. The per-doc anchor walk calls the SAME
    * [[graft.functions.WinnowedAnchors]] kernel helper the batch
    * expression compiles to (one definition), anchors are per-doc
    * DISTINCT, and per-pair counts fold over the doc's OWN anchors —
    * order-free, so the emitted rows are a pure function of the doc,
    * independent of micro-batching. Convergence (StreamingSpec): stream
    * over the train split == batch contaminationSubstring rows exactly.
    * The test-split bound is ENFORCED (`maxArtifactRows`, counted before
    * collect — r13 verdict #1); an eval suite that outgrows it runs
    * [[runContaminationProbe]], the stream-static probe against the
    * bucketed index with no driver-resident artifact at all.
    *
    * The length gate reproduces the batch `length(text) >= k` filter in
    * CODEPOINTS (Spark `length` counts codepoints; Java String.length
    * counts UTF-16 units — a surrogate pair would drift the gate). */
  def contaminationStream(spark: SparkSession, docStream: DataFrame,
      anchorTable: String, k: Int = 40, w: Int = 25,
      maxArtifactRows: Long = 1L << 22): DataFrame = {
    import spark.implicits._
    require(k >= 1 && w >= 1, s"bad params k=$k w=$w")
    val idx: Map[String, Array[Long]] = boundedCollect(
        graft.sources.Staged.liveTable(spark, anchorTable).select(col("h"), col("doc_id")),
        anchorTable, maxArtifactRows,
        "scope the test split or run the stream-static probe " +
          "(Streaming.runContaminationProbe) instead")
      .groupBy(_.getString(0))
      .map { case (h, rows) => h -> rows.map(_.getLong(1)).sorted }
    val bc = spark.sparkContext.broadcast(idx)
    docStream.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null ||
            text.codePointCount(0, text.length) < k) Iterator.empty
        else {
          val m = bc.value
          val hs = graft.functions.WinnowedAnchors.anchors(
            org.apache.spark.unsafe.types.UTF8String.fromString(text),
            k, w)
          val counts = scala.collection.mutable.LongMap.empty[Long]
          var i = 0
          while (i < hs.numElements()) {
            m.get(hs.getUTF8String(i).toString).foreach(_.foreach { t =>
              counts.update(t, counts.getOrElse(t, 0L) + 1L)
            })
            i += 1
          }
          counts.iterator.map { case (t, n) => (id, t, n) }
        }
      }
      .toDF("train_doc", "test_doc", "n_anchors")
  }

  /** The SCALE shape of [[docSimilarStream]] — the stream-static PROBE
    * (r13 verdict #1, removing the driver-memory ceiling entirely):
    * every micro-batch runs the BATCH persisted-index probe
    * ([[graft.text.TextOps.docSimilarPersisted]] — one definition with
    * the registered `doc_similar_persisted` operator) as true
    * stream-static equijoins against the persisted vocab and
    * corpus-vector TABLES. Nothing is ever collected to the driver and
    * no state store exists: a document is ONE row, so its vectorization
    * (tf agg + broadcast vocab join) and its pair emission complete
    * within its own micro-batch — per-batch batch semantics are EXACT
    * here, not an approximation, which is why the emitted rows equal
    * [[docSimilarStream]]'s and the spec proves convergence to batch
    * doc_similar over a replayed corpus. `sink` receives each
    * micro-batch's finished probe result (append semantics — rows for
    * the batch's docs only). */
  def runDocSimilarProbe(spark: SparkSession, docStream: DataFrame,
      vecTable: String, vocabTable: String, tau: Double = 0.9)(
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(tau > 0.0, s"bad tau=$tau")
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.text.TextOps.docSimilarPersisted(
        spark, batch.toDF(), vecTable, vocabTable, lit(true), tau))
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** The SCALE shape of [[contaminationStream]] — the stream-static
    * PROBE against the persisted BUCKETED anchor index (the
    * runDocSimilarProbe posture): every micro-batch runs
    * [[graft.dedup.Dedup.anchorProbe]] — one winnowing kernel pass over
    * the batch, one `h` equijoin where the index side arrives
    * pre-bucketed (zero corpus-side Exchange — StreamingSpec asserts
    * the bucketed scan), one count rollup. A doc's anchors all live in
    * its own row, so the per-batch rollup is exact and the emitted
    * (train_doc, test_doc, n_anchors) rows equal the batch
    * contaminationSubstring check over a replayed corpus
    * (spec-proven). */
  def runContaminationProbe(spark: SparkSession, docStream: DataFrame,
      anchorTable: String, k: Int = 40, w: Int = 25)(
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(k >= 1 && w >= 1, s"bad params k=$k w=$w")
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.dedup.Dedup.anchorProbe(
        spark, anchorTable, batch.toDF(), k, w))
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Live OOV monitoring against the PERSISTED df-banded vocabulary
    * ([[graft.text.TextOps.writeVocabIndex]]) — the ingest-drift
    * monitor in its serving shape (the runDocSimilarProbe posture):
    * every micro-batch runs the batch per-doc tagger
    * [[graft.text.TextOps.oovTag]] verbatim — the probe compresses the
    * batch to per-doc (word, cnt) rows, equijoins the bucketed vocab
    * with zero index-side Exchange, and emits one (doc_id, source,
    * tokens_total, tokens_oov) row per arriving document. A doc's
    * tokens all live in its own row and token masses are ADDITIVE
    * across docs, so per-micro-batch semantics are EXACT: the emitted
    * rows over any replay partition sum per source to the batch
    * [[graft.text.TextOps.vocabCoverageIndexed]] totals
    * (StreamingSpec proves convergence). An OOV-mass spike on arrival
    * is the earliest signal of a new domain, language, or extractor
    * regression — upstream of every quality gate that assumes a known
    * vocabulary. */
  def runOovProbe(spark: SparkSession, docStream: DataFrame,
      vocabTable: String)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.text.TextOps.oovTag(
        spark, vocabTable, batch.toDF()))
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** LIVE standing-query routing (the runDocSimilarProbe posture):
    * every arriving document is scored against the standing query with
    * collection statistics FROZEN from the persisted postings index —
    * [[graft.text.TextOps.standingQueryScore]] VERBATIM per
    * micro-batch (df from a bucketed term-pruned index scan, n_docs/
    * sum_dl from the stats table, the doc's own tf/dl from its own
    * row). A doc's score is a pure function of its row against the
    * frozen artifacts, so per-batch semantics are EXACT and routing
    * thresholds are stable across the index generation — the alerting
    * shape ("page me when a crawl batch matches this query") a
    * serving layer runs during ingest. No state store, no driver
    * residency. */
  def runStandingQueryProbe(spark: SparkSession, docStream: DataFrame,
      indexTable: String, terms: Seq[String])(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.text.TextOps.standingQueryScore(
        spark, indexTable, batch.toDF(), terms))
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** LIVE hybrid retrieval — RRF serving during ingest (the
    * runDocSimilarProbe posture): every arriving query document (text +
    * embedding in one row) probes the persisted doc-vector index for
    * its lexical member ([[graft.text.TextOps.docSimilarPersisted]]
    * verbatim — the score equals the batch pair formulation by the
    * doc_similar_persisted equivalence) and the frozen embedding table
    * for its semantic member ([[graft.similarity.Hybrid.semMemberFor]]
    * — one definition with batch), then fuses with
    * [[graft.similarity.Hybrid.fuse]]/[[graft.similarity.Hybrid.topK]]
    * VERBATIM. A query's fused list is a pure function of its own row
    * against the two frozen artifacts (queries never interact), so
    * per-micro-batch semantics are EXACT and a replay of the batch
    * query slice emits exactly the batch `hybrid_search_rrf` rows
    * (HybridSpec proves set equality). No state store, no driver
    * residency — the ceiling-free serving shape. */
  def runHybridSearchProbe(spark: SparkSession, docStream: DataFrame,
      vecTable: String, vocabTable: String, corpusEmb: DataFrame,
      k: Int = 10, tauLex: Double = 0.9, tauSem: Double = 0.3)(
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        val b = batch.toDF()
        val lex = graft.text.TextOps.docSimilarPersisted(
            spark, b, vecTable, vocabTable, lit(true), tauLex)
          .select(col("doc_id"), col("similar_id").as("cand_id"),
            col("score"))
        val q = graft.similarity.Knn.embOf(b.select(
          col("doc_id").as("vec_id"), lit(0).cast("int").as("label"),
          col("embedding")))
        val sem = graft.similarity.Hybrid.semMemberFor(q, corpusEmb,
          tauSem)
        sink(graft.similarity.Hybrid.topK(
          graft.similarity.Hybrid.fuse(lex, sem), k))
      }
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** [[runHybridSearchProbe]] with an INDEX-BACKED semantic member —
    * the 100 TB serving shape (r16 verdict #1: the brute probe's
    * semantic member scans the whole frozen embedding table per
    * micro-batch, the only streaming dual whose per-batch cost grew
    * with corpus size): the arriving batch's vectors probe the
    * PERSISTED bucketed IVF index via [[graft.similarity.Knn
    * .searchIvfIndex]] — the exact member `hybrid_search_ivf` fuses in
    * batch — ranking the frozen centroid table
    * (`${ivfTable}_centroids`, committed by
    * [[graft.similarity.Knn.writeIvfIndex]] with persistCentroids and
    * healed on read by Staged.liveTable) and meeting only the nprobe
    * nearest lists in a c_id equijoin with zero index-side Exchange.
    * The lexical member and the fusion are UNCHANGED
    * ([[graft.text.TextOps.docSimilarPersisted]] /
    * [[graft.similarity.Hybrid.fuse]] verbatim — the member-source-swap
    * argument). Per-batch semantics stay EXACT (a query's fused list is
    * a pure function of its row against frozen artifacts); the IVF
    * member is the nprobe-reached subset of the brute member, and at
    * nprobe = nlist with kSem past every τ-reachable candidate the
    * live rows equal batch `hybrid_search_rrf` row-for-row
    * (StreamingSpec pins it — the HybridSpec nprobe=nlist argument
    * lifted to the stream). kSem's bounded member depth carries the
    * same accounting row as batch (`hybrid_cap_audit`). */
  def runHybridSearchProbeIvf(spark: SparkSession, docStream: DataFrame,
      vecTable: String, vocabTable: String, ivfTable: String,
      k: Int = 10, tauLex: Double = 0.9, tauSem: Double = 0.3,
      kSem: Int = 50, nprobe: Int = 2)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(kSem >= k, s"semantic member depth kSem=$kSem below k=$k")
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        val b = batch.toDF()
        val lex = graft.text.TextOps.docSimilarPersisted(
            spark, b, vecTable, vocabTable, lit(true), tauLex)
          .select(col("doc_id"), col("similar_id").as("cand_id"),
            col("score"))
        val q = graft.similarity.Knn.embOf(b.select(
          col("doc_id").as("vec_id"), lit(0).cast("int").as("label"),
          col("embedding")))
        val centroids = graft.sources.Staged.liveTable(spark,
          s"${ivfTable}_centroids")
        // the two staged artifacts promote independently — verify the
        // index's c_id space IS the one this centroid generation
        // describes (memoized; a mid-swap probe would otherwise emit
        // a silently EMPTY semantic member). The fence RETURNS the
        // index resolution it verified and the probe reads exactly
        // that frame — a promote landing between the check and the
        // probe can no longer swap an unverified index in (r17 ADVICE
        // TOCTOU).
        val index = graft.similarity.Knn.requireCentroidAlignment(spark,
          ivfTable, centroids)
        val sem = graft.similarity.Knn.searchIvfIndexOn(index,
            centroids, q, kSem, nprobe)
          .filter(col("score") >= tauSem)
          .select(col("query_id").as("doc_id"),
            col("neighbor_id").as("cand_id"), col("score"))
        sink(graft.similarity.Hybrid.topK(
          graft.similarity.Hybrid.fuse(lex, sem), k))
      }
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** LIVE index ingest — the write-side streaming dual of the delta
    * family (r23, closing the loop the r17 verdict #1 opened): each
    * arriving micro-batch of documents APPENDS to the serving postings
    * index as a delta generation
    * ([[graft.text.TextOps.appendTextIndexDelta]] verbatim — the batch
    * append IS the micro-batch append: a doc's postings are a pure
    * function of its own row, so per-batch semantics are exact), and
    * queries running concurrently through
    * [[graft.text.TextOps.searchIndexDelta]] see base ∪ everything
    * ingested so far — result-identical to a full rebuild over the
    * corpus-to-date (the spec replays a split corpus batch-by-batch
    * and pins the converged search ≡ the ad-hoc BM25 over everything).
    * Tokenize cost per batch ∝ the batch; the delta REWRITE cost grows
    * with the accumulated delta until [[graft.text.TextOps
    * .mergeTextIndex]] compacts it — the merge cadence bounds it, and
    * `textIndexDeltaAudit` is the number an operator schedules the
    * merge on. The doc-disjointness fences hold per batch (a
    * re-crawled doc raises, never double-serves). */
  def runTextIndexDeltaIngest(spark: SparkSession, docStream: DataFrame,
      tableName: String, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        val b = batch.toDF().localCheckpoint(true)
        // an empty trigger must not rewrite the delta generation
        if (b.limit(1).count() > 0L)
          graft.text.TextOps.appendTextIndexDelta(b, tableName, path)
      }
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** [[runTextIndexDeltaIngest]] for the DOC-VECTOR index (r24): each
    * arriving micro-batch is vectorized against the FROZEN base
    * vocabulary and appended as the delta generation
    * ([[graft.text.TextOps.appendDocVectorIndexDelta]] verbatim — a
    * doc's vector is a pure function of its own row and the frozen
    * vocab, so per-batch semantics are exact); concurrent
    * more-like-this probes ([[graft.text.TextOps
    * .docSimilarPersistedDelta]]) see base ∪ everything ingested so
    * far under the frozen-vocab serving semantic.
    * `docVectorDeltaAudit` is the merge-scheduling + OOV number an
    * operator watches while this runs. */
  def runDocVectorDeltaIngest(spark: SparkSession, docStream: DataFrame,
      tableName: String, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        val b = batch.toDF().localCheckpoint(true)
        if (b.limit(1).count() > 0L)
          graft.text.TextOps.appendDocVectorIndexDelta(b, tableName, path)
      }
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** [[runTextIndexDeltaIngest]] for the float IVF index (r24, the
    * ANN-delta write side): each arriving micro-batch of vectors is
    * assigned to the FROZEN centroids of the live index
    * ([[graft.similarity.Knn.appendIvfIndexDelta]] verbatim — the
    * alignment fence runs per batch, so a centroid/index generation
    * mismatch raises instead of landing orphan lists) and appended as
    * the delta generation; concurrent probes
    * ([[graft.similarity.Knn.searchIvfIndexDelta]]) see base ∪
    * everything ingested so far. The raw (vec_id, label, embedding)
    * stream normalizes through [[graft.similarity.Knn.embOf]] — one
    * definition with the batch reader. */
  def runIvfIndexDeltaIngest(spark: SparkSession, vecStream: DataFrame,
      tableName: String, path: String, centroidsTable: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        val b = graft.similarity.Knn.embOf(batch.toDF())
          .localCheckpoint(true)
        if (b.limit(1).count() > 0L)
          graft.similarity.Knn.appendIvfIndexDelta(b, tableName, path,
            graft.sources.Staged.liveTable(spark, centroidsTable))
      }
    vecStream.writeStream.foreachBatch(perBatch).start()
  }

  /** LIVE passage-granular hybrid retrieval — the streaming dual of
    * `chunk_hybrid_serve` (r17 verdict #4, composing the
    * runStandingQueryProbe and runHybridSearchProbeIvf machinery at
    * chunk granularity): arriving QUERY STRINGS are fused against the
    * frozen chunk artifacts — passage BM25 from the persisted
    * chunk-postings index, passage cosine from the frozen chunk
    * vocabulary + vector index — with
    * [[graft.text.Chunks.chunkHybridServe]] replayed VERBATIM per
    * query (both members are index probes: ZERO corpus passes, so
    * per-batch cost is independent of corpus size — the
    * runHybridSearchProbeIvf property, here for the passage tier). A
    * query's fused list is a pure function of its own text against the
    * frozen artifacts (queries never interact), so per-micro-batch
    * semantics are EXACT and each live row set equals the batch row
    * set for the same query string (StreamingSpec pins it).
    *
    * Queries arrive at interactive cadence, not data cadence: the
    * micro-batch's (query_id, text) rows are boundedCollect-ed under a
    * named require and served one fused list per query. Queries whose
    * text holds no tokens emit nothing (the batch face requires
    * non-empty terms; an all-whitespace query has no retrieval
    * semantics). Duplicate terms within a query are collapsed —
    * the batch face's distinct-terms contract. */
  def runChunkHybridProbe(spark: SparkSession, queryStream: DataFrame,
      postingsTable: String, vecTable: String, vocabTable: String,
      tauSem: Double = 0.05, kLex: Int = 50, kSem: Int = 50, k: Int = 10,
      maxQueriesPerBatch: Long = 64L)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        val qs = boundedCollect(
          batch.toDF().select(col("query_id"), col("text")),
          "chunk-hybrid query micro-batch", maxQueriesPerBatch,
          "shrink the trigger interval or shard the query stream")
        qs.foreach { row =>
          // term derivation MUST match the engine's one-definition
          // tokenizer (lower() + literal-space split — toksExpr): Spark's
          // lower IS UTF8String.toLowerCase, and a locale-default Java
          // toLowerCase or a \s+ split would drift for tab-separated or
          // locale-sensitive query text (r18 ADVICE — the domainScore
          // stream's driver-side tokenizer precedent)
          val terms = org.apache.spark.unsafe.types.UTF8String
            .fromString(Option(row.getString(1)).getOrElse(""))
            .toLowerCase.toString.split(" ", -1)
            .toSeq.filter(_.nonEmpty).distinct
          if (terms.nonEmpty)
            sink(graft.text.Chunks.chunkHybridServe(spark, postingsTable,
                vecTable, vocabTable, terms, tauSem, kLex, kSem, k)
              .withColumn("query_id", lit(row.get(0))))
        }
      }
    queryStream.writeStream.foreachBatch(perBatch).start()
  }

  /** LIVE hard-triplet mining — contrastive curation running DURING
    * embedding ingest (the runDocSimilarProbe posture): every arriving
    * labeled vector is an anchor; each micro-batch replays the batch
    * probe [[graft.similarity.Knn.tripletProbe]] VERBATIM against the
    * frozen quantized IVF index, the frozen float centroid table, and
    * the frozen label map, emitting the same per-anchor (hardest
    * positive, hardest negative, margin, is_hard) row the batch miner
    * produces. An anchor's triplet is a pure function of its own row
    * against the frozen artifacts (anchors never interact), so
    * per-micro-batch semantics are EXACT and any replay partition
    * emits the batch row set (StreamingSpec proves set equality). The
    * is_hard emits are what feed a curriculum buffer while the crawl
    * is still running. */
  def runTripletProbe(spark: SparkSession, vecStream: DataFrame,
      indexTable: String, centroidsTable: String, labelsTable: String,
      marginE4: Long = 500L, nprobe: Int = 2)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.similarity.Knn.tripletProbe(spark,
        indexTable, graft.sources.Staged.liveTable(spark, centroidsTable),
        graft.sources.Staged.liveTable(spark, labelsTable), batch.toDF(), marginE4, nprobe))
    vecStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Live quality-filter scoring in its SCALE shape — the stream-static
    * sibling of [[domainScoreStream]] (the runDocSimilarProbe posture;
    * r14 verdict #3): every micro-batch runs the batch scorer
    * [[graft.text.TextOps.domainScorePersisted]] verbatim — per-doc tf
    * agg + a bucketed-model term equijoin — against the persisted
    * model TABLE. A doc's score folds over its own tokens only, so
    * per-batch semantics are EXACT and the emitted rows equal the
    * closure variant's; no driver-resident model exists at any model
    * size. */
  def runDomainScoreProbe(spark: SparkSession, docStream: DataFrame,
      modelTable: String)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.text.TextOps.domainScorePersisted(
        spark, batch.toDF(), modelTable))
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Live mixture application in its SCALE shape — the stream-static
    * sibling of [[mixApplyStream]]: every micro-batch runs the batch
    * decision [[graft.text.TextOps.mixApplyWith]] verbatim against the
    * frozen plan TABLE (broadcast equijoin — the plan is strata-sized,
    * but nothing is ever collected to the driver). The copy decision
    * is a pure per-doc function, so per-batch semantics are EXACT. */
  def runMixApplyProbe(spark: SparkSession, docStream: DataFrame,
      planTable: String, seed: Long = 42L)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.text.TextOps.mixApplyWith(batch.toDF(),
        graft.sources.Staged.liveTable(spark, planTable)
          .select("lang", "source", "tokens_kept", "target_tokens"),
        seed))
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Live media near-dup checking in its SCALE shape — the
    * stream-static sibling of [[mediaNearDupStream]], closing that
    * operator's scale-honesty note in code: every micro-batch runs
    * [[graft.multimodal.Multimodal.mediaBucketProbe]] — one
    * header-decode/band-key pass over the batch, one (tbl, bucket)
    * equijoin against the persisted capped index, one pair re-agg. A
    * blob's keys live in its own row, so per-batch semantics are
    * EXACT and a full-crawl index serves with no driver residency. */
  def runMediaNearDupProbe(spark: SparkSession, mediaStream: DataFrame,
      indexTable: String)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.multimodal.Multimodal.mediaBucketProbe(
        spark, indexTable, batch.toDF()))
    mediaStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Live embedding-outlier gating in its SCALE shape — the
    * stream-static sibling of [[embOutlierStream]]: every micro-batch
    * runs [[graft.similarity.Knn.embOutlierProbe]] — the batch's codes
    * meet the frozen (label, pos, s) centroid table in a broadcast
    * equijoin and the dot < 0 integer predicate flags the tail. A
    * vector's dot folds over its own codes, so per-batch semantics are
    * EXACT and the emitted rows equal the closure variant's. */
  def runEmbOutlierProbe(spark: SparkSession, embStream: DataFrame,
      centroidTable: String)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.similarity.Knn.embOutlierProbe(
        spark, centroidTable,
        graft.similarity.Knn.embOf(batch.toDF())))
    embStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Live label propagation in its SCALE shape — the stream-static
    * sibling of [[labelPropStream]], closing that operator's
    * scale-honesty note in code: every micro-batch runs
    * [[graft.similarity.Knn.labelPropProbe]] — the probe-only half of
    * labelPropagationIvf — against the persisted quantized IVF index
    * of the labeled slice, the frozen float centroid table, and the
    * frozen label map. A vector's vote tally is a pure function of its
    * own row against the frozen artifacts, so per-batch semantics are
    * EXACT; predictions differ from the closure variant only where the
    * probe pruned a voter (the nprobe recall trade the IVF family
    * documents). */
  def runLabelPropProbe(spark: SparkSession, embStream: DataFrame,
      indexTable: String, centroidsTable: String, labelsTable: String,
      labeledSixteenths: Int = 12, tau: Double = 0.3, nprobe: Int = 2)(
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.similarity.Knn.labelPropProbe(spark,
        indexTable,
        graft.sources.Staged.liveTable(spark, centroidsTable),
        graft.sources.Staged.liveTable(spark, labelsTable),
        graft.similarity.Knn.embOf(batch.toDF()),
        labeledSixteenths, tau, nprobe))
    embStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Live ANN retrieval over the persisted IVF-PQ index (the
    * runDocSimilarProbe posture for the memory-scale vector index):
    * every micro-batch treats its arriving vectors as queries and runs
    * [[graft.similarity.Knn.searchIvfPq]] VERBATIM — rank the frozen
    * coarse centroids, build the per-query ADC lookup tables against
    * the frozen codebook, meet the bucketed code lists in a c_id
    * equijoin, score with the O(m) PqAdcScore kernel. A query's top-k
    * is a pure function of its own row against the frozen artifacts,
    * so per-batch semantics are EXACT: the emitted rows over any
    * replay partition equal the batch search over the same query set
    * (StreamingSpec proves convergence). Nothing is collected to the
    * driver and no state store exists — the ceiling-free shape. */
  def runKnnPqProbe(spark: SparkSession, embStream: DataFrame,
      indexTable: String, coarseTable: String, codebookTable: String,
      k: Int = 10, nprobe: Int = 2)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.similarity.Knn.searchIvfPq(spark,
        indexTable,
        graft.sources.Staged.liveTable(spark, coarseTable),
        graft.sources.Staged.liveTable(spark, codebookTable),
        graft.similarity.Knn.embOf(batch.toDF()), k, nprobe))
    embStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Live exact-k sampling in its SCALE shape — the stream-static
    * sibling of [[sampleExactKStream]] (that one's state store is
    * already hard-bounded at k per stratum; THIS one moves the state
    * out of the stream entirely, into a persisted TABLE that any
    * consumer can read and any restart resumes from): each micro-batch
    * unions the frozen pick table with the arriving docs, re-runs the
    * batch [[graft.text.TextOps.sampleExactK]] aggregate (min-k over
    * (key, id) is associative: bottom-k(S₁∪S₂) =
    * bottom-k(bottom-k(S₁)∪S₂), the exact invariant the stream's
    * eviction loop maintains), carries per-stratum n_seen forward as
    * exact integer adds, and promotes the new state via
    * [[graft.sources.Staged]] — crash-safe generations, like every
    * other persisted serving artifact. `sink` receives the strata the
    * batch TOUCHED (update-mode semantics, the stream's emit rule). */
  def runSampleExactKProbe(spark: SparkSession, docStream: DataFrame,
      stateTable: String, statePath: String, k: Int = 5,
      salt: String = "strat")(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(k >= 1, s"k must be >= 1, got $k")
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        val b = batch.toDF()
          .select(col("doc_id"), col("lang"), col("source"))
          .localCheckpoint(true) // 3 consumers: union, counts, touch set
        val havePrev = spark.catalog.tableExists(stateTable) ||
          spark.catalog.tableExists(s"${stateTable}__stage")
        val prev =
          if (havePrev) graft.sources.Staged.liveTable(spark, stateTable)
            .select(col("lang"), col("source"), col("doc_id"),
              col("n_seen"))
          else b.limit(0).withColumn("n_seen", lit(0L))
            .select(col("lang"), col("source"), col("doc_id"),
              col("n_seen"))
        // picks over (frozen picks ∪ batch) — the associative merge
        val picks = graft.text.TextOps.sampleExactK(
          prev.select(col("doc_id"), col("lang"), col("source"))
            .union(b.select(col("doc_id"), col("lang"), col("source"))),
          k, salt)
        val seen = prev.groupBy(col("lang"), col("source"))
          .agg(max(col("n_seen")).as("seen_prev"))
          .join(b.groupBy(col("lang"), col("source"))
            .agg(count(lit(1)).as("seen_new")),
            Seq("lang", "source"), "full_outer")
          .select(col("lang"), col("source"),
            (coalesce(col("seen_prev"), lit(0L)) +
              coalesce(col("seen_new"), lit(0L))).as("n_seen"))
        val next = picks.join(seen, Seq("lang", "source"))
          .select(col("lang"), col("source"), col("doc_id"),
            col("sample_rank"), col("n_seen"))
          .localCheckpoint(true) // consumed by the write AND the sink
        graft.sources.Staged.commit(spark, stateTable, statePath) {
          (tbl, p) =>
            next.write.option("path", p)
              .mode(org.apache.spark.sql.SaveMode.Overwrite)
              .saveAsTable(tbl)
        }
        sink(next.join(
          b.select(col("lang"), col("source")).distinct(),
          Seq("lang", "source"), "left_semi"))
      }
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Streaming quality-filter scoring — the apply side of the trained
    * NB domain classifier ([[graft.text.TextOps.writeDomainModel]]) in
    * the shape a crawl-filtering fleet runs it: every ARRIVING document
    * is scored against the FROZEN per-term log-odds and emits the same
    * (doc_id, n_scored_tokens, logodds_milli_sum, pred_ref) row as
    * batch [[graft.text.TextOps.domainClassifier]]. Stateless append
    * mode; the banded model ships as a bounded broadcast closure
    * constant (the model IS the banded vocabulary — the
    * docSimilarStream frozen-vocab argument). Scores are exact integer
    * sums over the doc's OWN tokens (order-free), the class decision is
    * the integer sum > 0 predicate, and tokenization goes through
    * Spark's own UTF8String lowercase (locale-free, identical to the
    * batch `lower` expression) — so emits are a pure function of the
    * doc and the spec's stream==batch row equality is exact. */
  def domainScoreStream(spark: SparkSession, docStream: DataFrame,
      modelTable: String, maxArtifactRows: Long = 1L << 22): DataFrame = {
    import spark.implicits._
    val model: Map[String, Long] = boundedCollect(
        graft.sources.Staged.liveTable(spark, modelTable).select(col("term"), col("logodds_milli")),
        modelTable, maxArtifactRows,
        "the df band bounds the model — re-band it or run the " +
          "stream-static probe (Streaming.runDomainScoreProbe) instead")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(model)
    docStream.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else {
          val m = bc.value
          val toks = org.apache.spark.unsafe.types.UTF8String
            .fromString(text).toLowerCase.toString.split(" ", -1)
          var n = 0L
          var s = 0L
          toks.foreach { t =>
            if (t.nonEmpty) m.get(t).foreach { lo => n += 1L; s += lo }
          }
          if (n > 0L) Iterator.single((id, n, s, if (s > 0L) 1L else 0L))
          else Iterator.empty
        }
      }
      .toDF("doc_id", "n_scored_tokens", "logodds_milli_sum", "pred_ref")
  }

  /** Streaming mixture application — ingest-time data mixing: every
    * ARRIVING document draws its copy count against the FROZEN mixture
    * plan ([[graft.text.TextOps.mixPlan]] materialized to a table),
    * emitting the identical (doc_id, lang, source, n_copies) row as
    * batch [[graft.text.TextOps.mixApply]]. Stateless append mode; the
    * strata-sized plan ships as a closure constant. The copy decision
    * is a pure per-doc function (md5 over the same doc_id:lang:source:
    * seed string, the same floor/subtract/multiply IEEE chain on the
    * stratum ratio), so emits are independent of micro-batching and
    * the spec's stream==batch row equality is exact. Docs from strata
    * outside the plan (zero kept tokens) and zero-copy draws drop, the
    * batch integer-membership rule. */
  def mixApplyStream(spark: SparkSession, docStream: DataFrame,
      planTable: String, seed: Long = 42L,
      maxArtifactRows: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    // (lang, source) -> (base copies, 16-bit fractional threshold),
    // precomputed once from the frozen plan with the batch expressions
    val plan: Map[(String, String), (Long, Long)] = boundedCollect(
        graft.sources.Staged.liveTable(spark, planTable)
          .select(col("lang"), col("source"), col("tokens_kept"),
            col("target_tokens")),
        planTable, maxArtifactRows,
        "a mixture plan is strata-sized by construction — a plan past " +
          "this bound is a mis-built artifact, not a scale problem; " +
          "the stream-static probe (Streaming.runMixApplyProbe) has " +
          "no driver residency at all")
      .map { r =>
        val ratio = r.getLong(3).toDouble / r.getLong(2).toDouble
        val whole = math.floor(ratio)
        (r.getString(0), r.getString(1)) ->
          (whole.toLong, math.floor((ratio - whole) * 65536.0).toLong)
      }.toMap
    val bc = spark.sparkContext.broadcast(plan)
    docStream.select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)]
      .flatMap { case (id, lang, source) =>
        bc.value.get((lang, source)) match {
          case None => Iterator.empty
          case Some((whole, thresh)) =>
            val hex = Streaming.Md5.get()
              .digest(s"$id:$lang:$source:$seed"
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              .map("%02x".format(_)).mkString.take(4)
            val frac = if (hex < "%04x".format(thresh)) 1L else 0L
            val n = whole + frac
            if (n > 0L) Iterator.single((id, lang, source, n))
            else Iterator.empty
        }
      }
      .toDF("doc_id", "lang", "source", "n_copies")
  }

  /** Streaming media near-dup check — live ingest dedup for binary
    * assets: every ARRIVING media blob is header-decoded (the same
    * extractFeatures pass as batch), its two offset-band bucket keys
    * are computed by the SAME band arithmetic
    * ([[graft.multimodal.Multimodal.bucketKeyArray]] — one definition),
    * and it is checked against the FROZEN occupancy-capped corpus
    * bucket index ([[graft.multimodal.Multimodal.writeMediaBucketIndex]]),
    * emitting (doc_id, corpus_doc, n_tables) candidate evidence exactly
    * like batch `mm_dedup_near_candidates` — re-encoded copies of known
    * assets are flagged on arrival, before the crawl lands. Stateless
    * append mode; per-pair table multiplicity folds over the arriving
    * doc's OWN two keys — order-free, a pure function of the blob.
    * Downstream, the byte-gram verify runs on the flagged pairs only,
    * the batch posture.
    *
    * Scale honesty (unlike the test-split/vocab/model closures, this
    * index is NOT intrinsically small — it is 2 rows per indexed
    * asset): the closure constant fits when the index covers a CURATED
    * known-asset set (licensed/watermarked/eval media — the realistic
    * always-on use, bounded by curation, and what the cap's
    * ≤ maxOccupancy-per-bucket keeps join-safe); checking against a
    * full 100 TB crawl's index instead is the stream-static bucket
    * equijoin + per-micro-batch pair re-agg, the same swap
    * dedup_incremental makes in batch. */
  def mediaNearDupStream(spark: SparkSession, mediaStream: DataFrame,
      indexTable: String, maxArtifactRows: Long = 1L << 22): DataFrame = {
    import spark.implicits._
    val idx: Map[(Int, String), Array[Long]] = boundedCollect(
        graft.sources.Staged.liveTable(spark, indexTable)
          .select(col("tbl"), col("bucket"), col("doc_id")),
        indexTable, maxArtifactRows,
        "a full-crawl index checks as the stream-static probe " +
          "(Streaming.runMediaNearDupProbe), not a closure constant")
      .groupBy(r => (r.getInt(0), r.getString(1)))
      .map { case (k, rows) => k -> rows.map(_.getLong(2)).sorted }
    val bc = spark.sparkContext.broadcast(idx)
    graft.multimodal.Multimodal.bucketKeyArray(mediaStream)
      .select(col("doc_id"), col("keys.tbl").as("tbls"),
        col("keys.bucket").as("buckets"))
      .as[(Long, Seq[Int], Seq[String])]
      .flatMap { case (id, tbls, buckets) =>
        val m = bc.value
        val counts = scala.collection.mutable.LongMap.empty[Long]
        tbls.zip(buckets).foreach { case (t, b) =>
          m.get((t, b)).foreach(_.foreach { c =>
            if (c != id) counts.update(c, counts.getOrElse(c, 0L) + 1L)
          })
        }
        counts.iterator.map { case (c, n) => (id, c, n) }
      }
      .toDF("doc_id", "corpus_doc", "n_tables")
  }

  /** Streaming curriculum assignment — the data-loader serving shape:
    * every ARRIVING document is scored (the stateless qualityScored
    * expressions apply to a stream unchanged) and assigned its phase
    * against the FROZEN corpus distribution (the grid-sized
    * `curriculumBoundaries` table, the batch artifact) via the SAME
    * all-integer broadcast-equijoin decision
    * ([[graft.text.TextOps.assignPhases]], one definition). Stateless
    * append mode, no flatMap closure at all — the whole dual is
    * expressions + a stream-static broadcast join, so emits are a pure
    * function of the doc and the spec's stream==batch row equality is
    * exact. An arriving doc whose quarter score never occurred in the
    * frozen corpus has no grid row and no phase (inner-join membership
    * — the distribution must be rebuilt, the monitoring signal). */
  def curriculumStream(spark: SparkSession, docStream: DataFrame,
      boundariesTable: String, nPhases: Int = 4,
      salt: String = "curr"): DataFrame =
    graft.text.TextOps.assignPhases(
      graft.text.TextOps.scoredQ4(docStream),
      graft.sources.Staged.liveTable(spark, boundariesTable), nPhases, salt)

  /** Streaming BUDGET GATE — the ingest-time face of
    * [[graft.text.TextOps.budgetCut]]: each arriving doc is scored by
    * the stateless budgetScored expressions (quality quarters + the
    * md5 draw — streams unchanged) and admitted/declined against the
    * FROZEN per-(source, q4, hex4) decision table
    * ([[graft.text.TextOps.budgetDecisions]], grid-bounded at any
    * corpus size, broadcast here) via the SAME applyBudget equijoin —
    * one definition, so the emitted (doc_id, source, q4, n_tok, kept)
    * row is identical to batch. Entirely STATELESS (append mode, pure
    * expressions + a stream-static join); a doc whose (q4, hex4) group
    * never occurred in the frozen corpus gets no row (inner-join
    * membership — the rebuild-the-decisions monitoring signal, the
    * curriculumStream convention). Spec proves stream == batch row
    * equality EXACTLY over the replayed corpus. */
  def budgetGateStream(spark: SparkSession, docStream: DataFrame,
      decisionsTable: String, salt: String = "budget"): DataFrame =
    graft.text.TextOps.applyBudget(
      graft.text.TextOps.budgetScored(docStream, salt),
      broadcast(graft.sources.Staged.liveTable(spark, decisionsTable)))

  /** Streaming QUALITY GATE — the live front of
    * [[graft.text.TextOps.qualityCut]] (the budgetGateStream posture):
    * each arriving doc is scored (the SAME stateless qualityCutScored
    * pass) and admitted against the FROZEN per-source decision grid
    * via the SAME applyQualityGate join — kept is a pure integer
    * function of (doc_id, source, q4) and the frozen grid, so the
    * emitted rows over any replay partition equal the batch cut
    * row-for-row (spec-proven). The grid is ≤ 5·|sources| rows
    * (corpus-independent), broadcast per the one-definition
    * discipline; stateless append mode. */
  def qualityGateStream(spark: SparkSession, docStream: DataFrame,
      decisionsTable: String): DataFrame =
    graft.text.TextOps.applyQualityGate(
      graft.text.TextOps.qualityCutScored(docStream),
      broadcast(graft.sources.Staged.liveTable(spark, decisionsTable)))

  /** Live PERPLEXITY scoring against the persisted bigram LM
    * ([[graft.text.TextOps.writeLmIndex]]) — the ingest-time gibberish
    * monitor (the runDocSimilarProbe foreachBatch posture): every
    * micro-batch runs the batch [[graft.text.TextOps.lmScoreIndexed]]
    * VERBATIM against the frozen model table, emitting the identical
    * (doc_id, n_transitions, avg_logp, perplexity) row per arriving
    * doc. A doc's transitions all live in its own row, so
    * per-micro-batch semantics are EXACT (StreamingSpec proves
    * convergence). A perplexity spike on arrival flags machine
    * gibberish, encoding damage, or an unfamiliar domain before any
    * quality gate trained on in-distribution text sees it. */
  def runLmScoreProbe(spark: SparkSession, docStream: DataFrame,
      modelTable: String)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.text.TextOps.lmScoreIndexed(
        spark, modelTable, batch.toDF()))
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Live boilerplate tagging against the FROZEN template dictionary
    * ([[graft.text.Boilerplate.boilerplateSpans]]) — the ingest-time
    * face of the template-mass monitor (the runDocSimilarProbe
    * foreachBatch posture): every micro-batch runs the batch
    * [[graft.text.Boilerplate.boilerplateTag]] VERBATIM with the
    * frozen dictionary, emitting the identical (doc_id, n_grams,
    * bp_grams, bp_milli) row per arriving doc. A doc's gram positions
    * all live in its own row, so per-micro-batch semantics are EXACT
    * and any replay partition emits the batch tag row-for-row
    * (StreamingSpec proves convergence). A template-mass spike on
    * arrival flags a new mirror or extractor regression before the
    * near-dup pass pays for it. */
  def runBoilerplateTag(spark: SparkSession, docStream: DataFrame,
      dictTable: String, k: Int = graft.text.Boilerplate.DefaultK)(
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.text.Boilerplate.boilerplateTag(
        batch.toDF(), k, dict = Some(graft.sources.Staged.liveTable(spark, dictTable))))
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** LIVE hashed-feature drift monitor — the streaming face of
    * [[graft.text.Dsir.featureDrift]]: arriving docs explode into
    * hashed features and feed a COMPLETE-mode streaming aggregation
    * whose state is the per-bucket count table — BOUNDED at 16³ rows
    * at any corpus size (the DSIR model-size argument: this is a
    * stateful stream whose state cannot grow), so complete mode is
    * safe by construction. Every trigger delivers the full updated
    * count table; the per-trigger foreachBatch then runs the SAME
    * [[graft.text.Dsir.driftFrom]] decision VERBATIM against the
    * FROZEN old-era profile (≤ 4096 rows) — the monitor re-evaluates
    * ALL buckets each trigger because the flag depends on the global
    * totals, which one bucket's arrival shifts for every other bucket
    * (why this dual cannot be per-row stateless). After full replay
    * the emitted flag table equals the batch featureDrift exactly
    * (StreamingSpec proves it). */
  def runFeatureDriftMonitor(spark: SparkSession, docStream: DataFrame,
      oldProfileTable: String, tauMicro: Long = 500L)(
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val newCounts = graft.text.Dsir.featBuckets(docStream)
      .groupBy(col("b")).agg(count(lit(1)).as("n_new"))
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.text.Dsir.driftFrom(
        graft.sources.Staged.liveTable(spark, oldProfileTable), batch.toDF(), tauMicro))
    newCounts.writeStream.outputMode("complete")
      .foreachBatch(perBatch).start()
  }

  /** Live DSIR importance gate — the ingest-time face of
    * [[graft.text.Dsir.dsirSelect]] (the runDocSimilarProbe posture,
    * not a stateless expression join: the per-doc weight needs the
    * doc's feature explode + one per-doc agg, which foreachBatch runs
    * as a BATCH per micro-batch): every arriving doc is scored by the
    * batch [[graft.text.Dsir.dsirWeights]] VERBATIM against the FROZEN
    * ≤ 4096-row bucket model, then admitted/declined by the SAME
    * applyDsirGate when-chain against the FROZEN decision grid. A
    * doc's features all live in its own row, so per-micro-batch
    * semantics are EXACT and the emitted (doc_id, g, kept) rows over
    * any replay partition equal the batch selection row-for-row
    * (StreamingSpec proves convergence). Both frozen artifacts are
    * corpus-independent-bounded (model ≤ 4096 rows by construction;
    * grid < 2·10⁵ rows by the λ range) and broadcast per batch. */
  def runDsirGate(spark: SparkSession, docStream: DataFrame,
      modelTable: String, decisionsTable: String)(
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val perBatch: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => sink(graft.text.Dsir.applyDsirGate(
        graft.text.Dsir.dsirWeights(batch.toDF(),
            model = Some(graft.sources.Staged.liveTable(spark, modelTable)))
          .withColumn("hex4", graft.text.Dsir.hex4Col),
        broadcast(graft.sources.Staged.liveTable(spark, decisionsTable))))
    docStream.writeStream.foreachBatch(perBatch).start()
  }

  /** Streaming PHRASE-DENSITY tagger — the live dual of
    * [[graft.text.TextOps.phraseDensity]]: each arriving doc is scored
    * against the FROZEN collocation dictionary the moment it lands,
    * emitting the identical (doc_id, n_bigrams, n_phrase, phrase_milli)
    * row as batch. The whole tally is a pure function of ONE arriving
    * row against the frozen artifact (a doc's bigrams never cross
    * rows), so no state store exists: the dictionary ships as a
    * closure-broadcast hash set keyed on the STRUCTURED (lang, w1, w2)
    * triple — the batch tagger's exact equijoin key, so no separator
    * ambiguity exists at all (a ':'-joined string key was the r13
    * ADVICE find: whitespace-split tokens can themselves contain ':',
    * letting distinct triples collide) — and membership is one O(1)
    * set probe per bigram (the joined-array `array_contains` it
    * replaces scanned the whole dictionary per bigram). Tokenization is
    * the SAME lowerToks pass as batch (one definition); the milli is
    * the identical integer half-up. Bounded artifact (the wordAssoc
    * scale argument: the support threshold scales with corpus mass),
    * bound ENFORCED. Stateless append mode; docs with < 2 tokens emit
    * no row, as in batch. */
  def phraseDensityStream(spark: SparkSession, docStream: DataFrame,
      dictTable: String, maxArtifactRows: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    val dict: Set[(String, String, String)] = boundedCollect(
        graft.sources.Staged.liveTable(spark, dictTable).select(col("lang"), col("w1"), col("w2")),
        dictTable, maxArtifactRows,
        "raise the collocation support threshold — it is what bounds " +
          "the dictionary at any corpus size")
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val bc = spark.sparkContext.broadcast(dict)
    graft.text.TextOps.lowerToks(
        docStream.select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"), col("toks"))
      .as[(Long, String, Seq[String])]
      .flatMap { case (id, lang, toks) =>
        // null toks = null-text doc (the docSimilarStream note): no
        // bigram distribution, no row — the batch integer membership
        if (toks == null || toks.size < 2) Iterator.empty
        else {
          val d = bc.value
          val ts = toks.toIndexedSeq
          var np = 0L
          var i = 1
          while (i < ts.size) {
            if (d.contains((lang, ts(i - 1), ts(i)))) np += 1L
            i += 1
          }
          val nb = (ts.size - 1).toLong
          // the batch integer half-up milli, verbatim (operands > 0, so
          // JVM / == SQL div)
          Iterator.single((id, nb, np, (2L * np * 1000L + nb) / (2L * nb)))
        }
      }
      .toDF("doc_id", "n_bigrams", "n_phrase", "phrase_milli")
  }

  case class MgState(words: Seq[String], counts: Seq[Long], n_seen: Long)
  case class MgRow(shard: Int, word: String, mg_count: Long, n_seen: Long)

  /** Streaming heavy hitters — the always-on vocabulary monitor with
    * HARD-BOUNDED state: per-shard Misra–Gries summaries of capacity
    * `k` over the live token stream (terms hash-shard across `shards`
    * independent groups, so state ≤ shards·k counters TOTAL and the
    * summaries update in parallel — a billion-term vocabulary never
    * materializes anywhere).
    *
    * Guarantee (order-independent, unlike the counter values): every
    * term with GLOBAL count > n/k survives in its shard's summary —
    * all of a term's occurrences land in one shard, the shard stream
    * is a sub-stream of length n_s ≤ n, and MG at capacity k on that
    * sub-stream retains anything with shard count > n_s/k; a global
    * count > n/k implies a shard count > n/k ≥ n_s/k. So the union of
    * shard summaries is a SUPERSET of the true > n/k hitters at every
    * point in the stream — exactly the candidate-feed role the per-partition MG
    * pass plays inside batch [[graft.text.TextOps.heavyHitters]]; a
    * consumer exact-counts the emitted candidates the same way
    * (broadcast recount), and the batch spec's superset assertion
    * holds against the live summary too (StreamingSpec).
    *
    * Emits the full summary of each updated shard per trigger (update
    * mode, `n_seen` monotone per shard — the sampleExactKStream
    * last-emit convention). */
  def heavyHittersStream(spark: SparkSession, docStream: DataFrame,
      k: Int = 100, shards: Int = 32): Dataset[MgRow] = {
    import spark.implicits._
    require(k >= 2 && shards >= 1, s"bad params k=$k shards=$shards")
    graft.text.TextOps.lowerToks(
        docStream.select(col("doc_id"), col("text")))
      .select(explode(col("toks")).as("word"))
      .as[String]
      .groupByKey(w => math.floorMod(w.hashCode, shards))
      .flatMapGroupsWithState[MgState, MgRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, words, state: GroupState[MgState]) =>
          val prev = state.getOption.getOrElse(MgState(Nil, Nil, 0L))
          val counts = scala.collection.mutable.HashMap.empty[String, Long]
          prev.words.zip(prev.counts).foreach { case (w, c) => counts(w) = c }
          var n = prev.n_seen
          words.foreach { w =>
            n += 1L
            if (counts.contains(w)) counts(w) += 1L
            else if (counts.size < k) counts(w) = 1L
            else {
              // canonical MG step (the batch phase-1 loop verbatim)
              val dead = List.newBuilder[String]
              counts.keysIterator.toArray.foreach { key =>
                val c = counts(key) - 1L
                if (c == 0L) dead += key else counts(key) = c
              }
              dead.result().foreach(counts.remove)
            }
          }
          val snap = counts.toSeq.sortBy(_._1)
          state.update(MgState(snap.map(_._1), snap.map(_._2), n))
          snap.iterator.map { case (w, c) => MgRow(shard, w, c, n) }
      }
  }

  case class EntryEvent(space: String, segment: String, ts_us: Long,
      event_id: Long, value: Double)
  case class AggState(n_events: Long, cents: Long, last_ts_us: Long)
  case class AggSnapshot(space: String, segment: String, n_events: Long,
      balance: Double, last_ts_us: Long)

  /** Incremental eskit replay: fold per-aggregate state across
    * micro-batches, emitting the updated snapshot each time — the
    * streaming dual of EventSourcing.replayState. */
  case class FunnelState(step: Int, t: Long)
  case class FunnelReach(segment: String, step: Long, space: String,
      ts_us: Long)

  /** Streaming FUNNEL — the live dual of
    * [[graft.operators.Windows.funnel]]: each segment's progress
    * through the ordered step list is tracked as ONE small state row
    * (current step + the qualifying timestamp), and the moment an
    * arriving entry advances a segment it emits a (segment, step)
    * reach event — the live conversion dashboard fills DURING the
    * campaign instead of at the nightly batch. Under in-order arrival
    * (the ConsumeSegment contract, the eventTransitionsStream
    * argument) the greedy forward fold equals the batch strictly-after
    * min chain: the first qualifying arrival IS the minimum, so the
    * per-step reach counts converge exactly to batch `event_funnel`
    * (spec replays ts-ordered chunks and proves it). State is bounded
    * by the segment population; a segment that completes the funnel
    * stops updating. */
  def funnelStream(spark: SparkSession, entryStream: DataFrame,
      steps: Seq[String]): Dataset[FunnelReach] = {
    import spark.implicits._
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    entryStream
      .select(col("space"), col("segment"), col("ts_us"), col("event_id"))
      .as[TransEvent]
      .groupByKey(_.segment)
      .flatMapGroupsWithState[FunnelState, FunnelReach](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (segment, events, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelReach]
          events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (st.step < steps.length && e.space == steps(st.step) &&
                (st.step == 0 || e.ts_us > st.t)) {
              st = FunnelState(st.step + 1, e.ts_us)
              out += FunnelReach(segment, st.step.toLong, e.space, e.ts_us)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class FunnelGap(segment: String, step: Long, space: String,
      gap_us: Long)

  /** Live CONVERSION-LATENCY emitter — the gap view of [[funnelStream]]
    * (one fold, same achievement semantics, so live latency and live
    * conversion can never disagree about who converted): the moment a
    * segment achieves step k ≥ 2, emit (segment, step, space,
    * t_k − t_{k−1}) — the product-path latency feed an alerting layer
    * thresholds directly, visible DURING the journey instead of at the
    * nightly rollup. State is the same one (step, t) row per segment as
    * the funnel (bounded by segment population); step-1 achievements
    * emit nothing (no previous step to gap against). Under ordered
    * arrival the emitted gap multiset per step equals the batch
    * [[graft.operators.Windows.conversionLatency]] distribution exactly
    * (spec replays ts-ordered chunks through the shared
    * orderedReplayDir harness and proves exact rollup equality). */
  def funnelLatencyStream(spark: SparkSession, entryStream: DataFrame,
      steps: Seq[String]): Dataset[FunnelGap] = {
    import spark.implicits._
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    entryStream
      .select(col("space"), col("segment"), col("ts_us"), col("event_id"))
      .as[TransEvent]
      .groupByKey(_.segment)
      .flatMapGroupsWithState[FunnelState, FunnelGap](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (segment, events, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelGap]
          events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (st.step < steps.length && e.space == steps(st.step) &&
                (st.step == 0 || e.ts_us > st.t)) {
              if (st.step >= 1) {
                out += FunnelGap(segment, (st.step + 1).toLong, e.space,
                  e.ts_us - st.t)
              }
              st = FunnelState(st.step + 1, e.ts_us)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class TransEvent(space: String, segment: String, ts_us: Long,
      event_id: Long)
  case class TransState(last_space: String, last_ts_us: Long,
      last_event_id: Long)
  case class TransEdge(segment: String, from_space: String,
      to_space: String, ts_us: Long, event_id: Long)

  /** Streaming JOURNEY-STEP emitter — the live front of
    * [[graft.operators.Windows.eventTransitions]]: every arriving entry
    * is paired with its segment's PREVIOUS entry the moment it lands,
    * emitting one (segment, from_space, to_space) edge event — the
    * next-event-model feature stream / live funnel-step feed whose
    * downstream (from, to) count rollup equals the batch matrix's `n`
    * exactly once the log has replayed. State is ONE small row per
    * segment (the last entry's space/ts/id — the es_fold posture,
    * bounded by the segment population, never the event count).
    *
    * Ordering contract: within a micro-batch a segment's arrivals are
    * folded in (ts_us, event_id) order (sorted in the closure); ACROSS
    * batches the stream is consumed in produce order — in the streamkit
    * model a segment's entries ARRIVE in sequence order (the
    * ConsumeSegment contract), so adjacency is arrival adjacency. A
    * late cross-batch straggler would mis-edge exactly as it would in
    * any log-ordered consumer; the batch matrix over the settled log is
    * the reconciliation pass (spec replays ts-ordered chunks and proves
    * edge-multiset equality with batch). */
  def eventTransitionsStream(spark: SparkSession, entryStream: DataFrame)
      : Dataset[TransEdge] = {
    import spark.implicits._
    entryStream
      .select(col("space"), col("segment"), col("ts_us"), col("event_id"))
      .as[TransEvent]
      .groupByKey(_.segment)
      .flatMapGroupsWithState[TransState, TransEdge](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (segment, events, state: GroupState[TransState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[TransEdge]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach { p =>
              out += TransEdge(segment, p.last_space, e.space,
                e.ts_us, e.event_id)
            }
            prev = Some(TransState(e.space, e.ts_us, e.event_id))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  case class GapState(last_ts: Long, last_id: Long)
  case class GapRow(space: String, segment: String, ts_us: Long, gap_us: Long)

  /** Streaming INTER-ARRIVAL gaps — the live front of
    * [[graft.operators.Windows.interarrivalStats]]: each arriving entry
    * emits its gap to the segment's previous entry the moment it lands
    * (the raw heartbeat feed an alerting layer thresholds directly —
    * one oversized gap is visible immediately, not at the nightly
    * rollup). State is one (ts, id) pair per (space, segment) — the
    * eventTransitionsStream posture, bounded by the segment population.
    * Under in-order arrival (the ConsumeSegment contract; within-batch
    * arrivals sorted in the closure) the emitted gap multiset equals
    * the batch lag exactly, so the per-space count/sum/max rollup
    * converges to `interarrival_stats` (spec-proven over ts-ordered
    * replay). */
  def interarrivalStream(spark: SparkSession, entryStream: DataFrame)
      : Dataset[GapRow] = {
    import spark.implicits._
    entryStream
      .select(col("space"), col("segment"), col("ts_us"), col("event_id"))
      .as[TransEvent]
      .groupByKey(e => (e.space, e.segment))
      .flatMapGroupsWithState[GapState, GapRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((space, segment), events, state: GroupState[GapState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[GapRow]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach { p =>
              out += GapRow(space, segment, e.ts_us, e.ts_us - p.last_ts)
            }
            prev = Some(GapState(e.ts_us, e.event_id))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  def esFold(spark: SparkSession, entryStream: DataFrame)
      : Dataset[AggSnapshot] = {
    import spark.implicits._
    entryStream
      .select(col("space"), col("segment"), col("ts_us"), col("event_id"),
        col("value"))
      .as[EntryEvent]
      .groupByKey(e => (e.space, e.segment))
      .flatMapGroupsWithState[AggState, AggSnapshot](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((space, segment), events, state: GroupState[AggState]) =>
          val prev = state.getOption.getOrElse(AggState(0L, 0L, Long.MinValue))
          var n = prev.n_events
          var cents = prev.cents
          var last = prev.last_ts_us
          events.foreach { e =>
            n += 1
            // exact integer cents (the EventLog.valueCents recipe in
            // closure form, with the same lossless-conversion fence):
            // the carried state is an integer fold, so the emitted
            // balance is bit-identical to the batch dual's exact sum
            // regardless of micro-batch boundaries
            val c = math.floor(e.value * 100.0 + 0.5).toLong
            require(c.toDouble / 100.0 == e.value,
              s"event value ${e.value} is not an exact centile — the " +
                "exact-integer money conversion would be lossy")
            cents += c
            if (e.ts_us > last) last = e.ts_us
          }
          val next = AggState(n, cents, last)
          state.update(next)
          Iterator.single(
            AggSnapshot(space, segment, n, cents.toDouble / 100.0, last))
      }
  }

  case class SampleEvent(doc_id: Long, lang: String, source: String)
  case class SampleState(keys: Seq[String], ids: Seq[Long], n_seen: Long)
  case class SampleRow(lang: String, source: String, doc_id: Long,
      sample_rank: Long, n_seen: Long)

  /** Streaming EXACT-k stratified sample — the live dual of
    * [[graft.text.TextOps.sampleExactK]]: each (lang, source) stratum
    * keeps the k smallest md5(doc_id:salt) keys seen so far (a
    * deterministic bottom-k "reservoir"), emitting its current pick
    * list each touched micro-batch. State is HARD-BOUNDED at k
    * (key, id) pairs per stratum — the same ≤ k-per-group invariant
    * [[graft.functions.MinKByKey]]'s map-side combine enforces in
    * batch, so an always-on sampler over an unbounded crawl holds a
    * fixed-size state store regardless of corpus size.
    *
    * Convergence (StreamingSpec): min-k over (key, id) is
    * order-insensitive and associative — the pick set is a pure
    * function of the id SET seen, however it was micro-batched — and
    * the closure md5 (UTF-8 of "id:salt") is the same function as the
    * batch/oracle `md5(concat_ws(':', ...))`, so once the stream has
    * replayed a corpus the last emit per stratum equals the batch
    * operator's rows exactly. */
  def sampleExactKStream(spark: SparkSession, docStream: DataFrame,
      k: Int = 5, salt: String = "strat"): Dataset[SampleRow] = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    docStream.select(col("doc_id"), col("lang"), col("source"))
      .as[SampleEvent]
      .groupByKey(e => (e.lang, e.source))
      .flatMapGroupsWithState[SampleState, SampleRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((lang, source), events, state: GroupState[SampleState]) =>
          val prev = state.getOption.getOrElse(SampleState(Nil, Nil, 0L))
          val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          buf ++= prev.keys.zip(prev.ids)
          var n = prev.n_seen
          val md = java.security.MessageDigest.getInstance("MD5")
          events.foreach { e =>
            md.reset()
            val hex = md.digest(s"${e.doc_id}:$salt".getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            buf += ((hex, e.doc_id))
            if (buf.length > k) {
              // evict the largest (key, id) — LastKEntries' linear scan
              var mi = 0
              var i = 1
              while (i < buf.length) {
                val c = buf(i)._1.compareTo(buf(mi)._1)
                if (c > 0 || (c == 0 && buf(i)._2 > buf(mi)._2)) mi = i
                i += 1
              }
              buf.remove(mi)
            }
            n += 1L
          }
          val sorted = buf.sortBy(identity).toSeq
          state.update(SampleState(sorted.map(_._1), sorted.map(_._2), n))
          sorted.iterator.zipWithIndex.map { case ((_, id), i) =>
            SampleRow(lang, source, id, i + 1L, n)
          }
      }
  }

  /** Streaming CRAWL DIFF — the live front of
    * [[graft.text.CrawlDiff.diff]]: every ARRIVING current-crawl
    * document is classified against the FROZEN previous snapshot
    * (`added` / `changed` / `unchanged`) the moment it lands, so the
    * re-process queue (added ∪ changed) fills during the crawl instead
    * of after it. Entirely STATELESS (append mode): digest is the same
    * md5(text) expression as batch, classification is a stream-static
    * LEFT join against the previous snapshot's (doc_id, digest) table —
    * broadcast here; at 100 TB the static side is the bucketed snapshot
    * and the join is the same key equijoin the batch diff runs.
    * `removed` is structurally unobservable live (it's the absence of
    * an arrival — only the end-of-crawl batch diff can emit it), which
    * is exactly how the spec frames convergence: stream rows == batch
    * diff minus its removed rows. */
  def crawlDiffStream(spark: SparkSession, docStream: DataFrame,
      oldSnapshotTable: String): DataFrame = {
    val old = graft.sources.Staged.liveTable(spark, oldSnapshotTable)
      .select(col("doc_id"), col("digest").as("o_digest"))
    docStream.select(col("doc_id"), col("lang"),
        md5(col("text")).as("n_digest"))
      .join(broadcast(old), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("o_digest").isNull, "added")
          .when(col("o_digest") =!= col("n_digest"), "changed")
          .otherwise("unchanged").as("status"),
        col("lang"))
  }

  /** Streaming RECRAWL PRIORITY — the live front of
    * [[graft.text.CrawlDiff.recrawlPriority]]: every arriving
    * current-crawl doc is classified against the FROZEN previous
    * snapshot AND quality-scored the moment it lands, so the
    * re-process queue fills DURING the crawl already ranked (the
    * crawlDiffStream classification + the one-definition
    * [[graft.text.TextOps.q4Expr]] quarter score + the identical
    * integer priority — all stateless expressions over ONE arriving
    * row plus a broadcast stream-static snapshot join; append mode, no
    * state store). `removed` is structurally unobservable live (the
    * crawlDiffStream argument); spec proves the emitted rows equal the
    * batch queue exactly over the replayed crawl. */
  def recrawlPriorityStream(spark: SparkSession, docStream: DataFrame,
      oldSnapshotTable: String): DataFrame = {
    val old = graft.sources.Staged.liveTable(spark, oldSnapshotTable)
      .select(col("doc_id"), col("digest").as("o_digest"))
    graft.text.TextOps.qualityScored(docStream)
      .withColumn("q4", graft.text.TextOps.q4Expr)
      .withColumn("n_digest", md5(col("text")))
      .join(broadcast(old), Seq("doc_id"), "left_outer")
      .withColumn("status",
        when(col("o_digest").isNull, "added")
          .when(col("o_digest") =!= col("n_digest"), "changed")
          .otherwise("unchanged"))
      .filter(col("status").isin("added", "changed"))
      .withColumn("priority", col("q4") * lit(2L) +
        when(col("status") === "added", 1L).otherwise(0L))
      .select("doc_id", "lang", "status", "q4", "priority")
  }

  /** Streaming LABEL PROPAGATION — the live dual of
    * [[graft.similarity.Knn.labelPropagation]] in the shape an ingest
    * fleet runs it: every ARRIVING unlabeled vector is scored against
    * the FROZEN labeled code set and emits the IDENTICAL
    * (vec_id, true_label, pred_label, n_votes, n_neighbors) row as the
    * batch operator. Entirely STATELESS (append mode, no state store):
    * a vector's entire vote tally is a pure function of that one
    * vector against the frozen labeled slice, so the rollup needs no
    * cross-batch state — unlike doc_similar's pair emission this dual
    * emits the FINISHED per-vector decision. One-definition argument:
    * the closure calls the SAME kernel entry points the batch
    * expressions compile to ([[graft.functions.QuantizeInt8.encode]],
    * [[graft.functions.ByteDot.dot]]), the score is the identical
    * floor-half-up IEEE chain, labeled-slice membership is MD5 of the
    * same `id:lbl` string, and the winner is the same (count desc,
    * label asc) integer order — so emits are independent of
    * micro-batching and the spec's stream==batch row equality is
    * exact. SCALE HONESTY (the mediaNearDupStream framing): the
    * labeled codes ship as a bounded broadcast closure constant, which
    * fits the CURATED labeled sets label propagation actually serves
    * (human-labeled seed corpora — small by construction); a
    * corpus-scale labeled side swaps to the persisted IVF probe
    * ([[graft.similarity.Knn.labelPropagationIvf]]) as a batch job. */
  def labelPropStream(spark: SparkSession, embStream: DataFrame,
      labeledCodesTable: String, labeledSixteenths: Int = 12,
      tau: Double = 0.3): DataFrame = {
    import spark.implicits._
    require(labeledSixteenths >= 1 && labeledSixteenths <= 15,
      s"labeledSixteenths must be in [1, 15], got $labeledSixteenths")
    require(tau > 0.0, s"bad tau=$tau")
    val boundary = labeledSixteenths.toHexString.charAt(0)
    val labeled: Array[(Long, Int, Array[Byte], Double)] =
      boundedCollect(
        graft.sources.Staged.liveTable(spark, labeledCodesTable)
          .select(col("vec_id"), col("label"), col("qv"), col("qnrm")),
        labeledCodesTable, 1L << 20,
        "a corpus-scale labeled side runs the stream-static probe " +
          "(Streaming.runLabelPropProbe), not a closure constant")
        .map(r => (r.getLong(0), r.getInt(1),
          r.getSeq[Byte](2).toArray, r.getDouble(3)))
    val bc = spark.sparkContext.broadcast(labeled)
    embStream.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .as[(Long, Int, Seq[Double])]
      .flatMap { case (id, trueLabel, v) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$id:lbl".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (hex.charAt(0) < boundary || v == null) Iterator.empty
        else {
          val qv = graft.functions.QuantizeInt8.encode(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              v.toArray))
          val q2 = graft.functions.ByteDot.dot(qv, qv)
          if (q2 <= 0L) Iterator.empty
          else {
            val unrm = math.sqrt(q2.toDouble)
            // (label, votes) tally over the frozen labeled set
            val votes = scala.collection.mutable.LongMap.empty[Long]
            var neighbors = 0L
            bc.value.foreach { case (_, lab, lqvBytes, lnrm) =>
              val dot = graft.functions.ByteDot.dot(
                new org.apache.spark.sql.catalyst.util.GenericArrayData(
                  lqvBytes), qv)
              val score =
                math.floor(dot.toDouble * 10000.0 / (lnrm * unrm) + 0.5) /
                  10000.0
              if (score >= tau) {
                neighbors += 1L
                votes.update(lab.toLong, votes.getOrElse(lab.toLong, 0L) + 1L)
              }
            }
            if (neighbors == 0L) Iterator.empty
            else {
              // winner = (count desc, label asc) — the batch max_by order
              val (predLabel, nVotes) = votes.iterator.reduce[(Long, Long)] {
                case (a @ (la, ca), b @ (lb, cb)) =>
                  if (cb > ca || (cb == ca && lb < la)) b else a
              }
              Iterator.single(
                (id, trueLabel, predLabel.toInt, nVotes, neighbors))
            }
          }
        }
      }
      .toDF("vec_id", "true_label", "pred_label", "n_votes", "n_neighbors")
  }

  /** Streaming CONSUMER-LAG monitor — the live dual of
    * [[graft.operators.StreamOps.consumerLag]]: arriving entries fold
    * into a running per-(group, space) behind-count against the FROZEN
    * committed-cursor table ([[graft.operators.StreamOps
    * .consumerCursors]] or a real committed-offset feed), the number an
    * operations dashboard polls between cursor refreshes. The cursor
    * side is a broadcast stream-static equijoin (tiny — groups ×
    * spaces); the running count is ONE streaming aggregation whose
    * state is one row per (group, space) — bounded by the cursor table,
    * never the log (update mode re-emits moved counters, the peek
    * convention); the conditional sum is the IDENTICAL integer
    * expression as batch, so the last emit per key converges to the
    * batch operator exactly (StreamingSpec). */
  def consumerLagStream(spark: SparkSession, entryStream: DataFrame,
      cursorTable: String): DataFrame =
    entryStream.select(col("space"), col("ts_us"))
      .join(broadcast(graft.sources.Staged.liveTable(spark, cursorTable)), Seq("space"))
      .groupBy(col("grp"), col("space"), col("cursor_ts_us"), col("tmax"))
      .agg(sum(when(col("ts_us") > col("cursor_ts_us"), 1L).otherwise(0L))
        .as("n_behind"))
      .select(col("grp"), col("space"), col("cursor_ts_us"),
        col("n_behind"),
        (col("tmax") - col("cursor_ts_us")).as("time_lag_us"))

  /** Streaming EMBEDDING-OUTLIER gate — the live dual of
    * [[graft.similarity.Knn.embOutliers]]: every ARRIVING labeled
    * vector is scored against the FROZEN per-label centroid code sums
    * ([[graft.similarity.Knn.centroidSums]] materialized to a table)
    * and flagged THE MOMENT it lands if it points away from its own
    * label's centroid (dot < 0 — the batch integer membership
    * predicate), emitting the identical (vec_id, label, dot, score)
    * row. Stateless append mode; the artifact is labels × dims exact
    * BIGINT rows — bounded by the label set at ANY corpus size (the
    * anomalyStream broadcast-baseline posture, with the batch affinity
    * pass as the artifact refresh). One-definition argument: codes via
    * [[graft.functions.QuantizeInt8.encode]], q2 via
    * [[graft.functions.ByteDot.dot]], the centroid dot an exact
    * integer sum (order-free ⟹ the closure's ascending loop ≡ the
    * batch hash agg), the score the identical floor-half-up IEEE
    * chain — so emits are a pure function of the vector and the spec's
    * stream==batch row equality is exact. Vectors with zero-norm codes
    * or an unknown/degenerate label pass silently (no row — the batch
    * integer fences). */
  def embOutlierStream(spark: SparkSession, embStream: DataFrame,
      centroidTable: String, maxArtifactRows: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    val sums: Map[Int, Array[Long]] = boundedCollect(
        graft.sources.Staged.liveTable(spark, centroidTable).select(col("label"), col("pos"),
          col("s")),
        centroidTable, maxArtifactRows,
        "the centroid artifact is labels×dims at ANY corpus size — a " +
          "table past this bound is a mis-built artifact; the " +
          "stream-static probe (Streaming.runEmbOutlierProbe) has no " +
          "driver residency at all")
      .groupBy(_.getInt(0))
      .map { case (lab, rows) =>
        val dims = rows.map(_.getInt(1)).max + 1
        val a = new Array[Long](dims)
        rows.foreach(r => a(r.getInt(1)) = r.getLong(2))
        lab -> a
      }
    val bc = spark.sparkContext.broadcast(
      sums.map { case (lab, a) =>
        // exact arithmetic (the Knn.momentGuard posture, driver-side):
        // a centroid artifact refreshed from an over-bound batch must
        // fail loudly here, not wrap into a silently wrong s2
        val s2 =
          try a.foldLeft(0L)((acc, x) =>
            Math.addExact(acc, Math.multiplyExact(x, x)))
          catch {
            case _: ArithmeticException => throw new IllegalArgumentException(
              s"embedding-moment overflow fence: centroid s2 for label " +
                s"$lab exceeds BIGINT — rebuild the artifact from a " +
                s"scoped batch (n ≲ 3e6 vectors per label)")
          }
        lab -> ((a, s2))
      })
    embStream.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .as[(Long, Int, Seq[Double])]
      .flatMap { case (id, label, v) =>
        val entry = if (v == null) None else bc.value.get(label)
        entry match {
          case Some((s, s2)) if s2 > 0L =>
            val qv = graft.functions.QuantizeInt8.encode(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(
                v.toArray))
            val q2 = graft.functions.ByteDot.dot(qv, qv)
            if (q2 <= 0L || qv.numElements() != s.length) Iterator.empty
            else {
              var dot = 0L
              var i = 0
              while (i < s.length) {
                dot += qv.getByte(i).toLong * s(i); i += 1
              }
              if (dot >= 0L) Iterator.empty
              else {
                val score =
                  math.floor(dot.toDouble * 10000.0 /
                    (math.sqrt(q2.toDouble) * math.sqrt(s2.toDouble)) +
                    0.5) / 10000.0
                Iterator.single((id, label, dot, score))
              }
            }
          case _ => Iterator.empty
        }
      }
      .toDF("vec_id", "label", "dot", "score")
  }
}
