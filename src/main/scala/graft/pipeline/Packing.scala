package graft.pipeline

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents head-to-tail and cut every `seqLen`
  * tokens — the concat-then-chunk packing an LLM pretraining loader
  * runs to turn a ragged corpus into fixed-length training sequences
  * with no padding waste.
  *
  * Documents are routed to `numGroups` independent streams
  * (deterministically, by id) and packed within each stream. The
  * prefix sum over a stream's token tape is
  * [[graft.operators.TwoPhase.prefixSum]] — range slices + broadcast
  * subtotal offsets — so no task ever holds more than one range-slice
  * of one stream: parallelism is bounded by the shuffle partition
  * count, not `numGroups`; a 100 TB stream is processed as thousands
  * of bounded slices instead of funnelling through one task. The
  * layout itself (all integer arithmetic) is unchanged from the
  * single-window formulation and replays bit-identically in the
  * DuckDB oracle (q91).
  */
object Packing {

  /** Per-document placement in the packed layout:
    *
    *   - `grp`: the document's stream (id mod `numGroups`);
    *   - `n_tok`: its token count (docs with zero tokens are dropped —
    *     they occupy no space in the packed output);
    *   - `start_tok`: its first token's offset in the stream's infinite
    *     token tape;
    *   - `seq_first`: the training sequence its first token lands in;
    *   - `seq_off`: offset within that sequence;
    *   - `n_seqs`: how many sequences the document straddles.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int = 2048, numGroups: Int = 8): DataFrame = {
    val id = col(idCol)
    val L = lit(seqLen.toLong)
    val counted = docs
      .select(id, (id % numGroups).as("grp"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
    graft.operators.TwoPhase
      .prefixSum(counted, Seq("grp"), Seq(idCol), col("n_tok"), "cum")
      .withColumn("start_tok", col("cum") - col("n_tok"))
      .select(id, col("grp"), col("n_tok"),
        col("start_tok"),
        expr(s"start_tok div ${seqLen}L").as("seq_first"),
        (col("start_tok") % L).as("seq_off"),
        (expr(s"(cum - 1) div ${seqLen}L") -
          expr(s"start_tok div ${seqLen}L") + 1L).as("n_seqs"))
  }

  /** TOKEN-BALANCED shard assignment: deal documents to `numShards`
    * output shards so every shard carries ~total/numShards TOKENS
    * (balanced to within one document), not merely ~equal row counts —
    * the writer-sharding a training-data export needs when document
    * lengths are heavy-tailed (round-robin by row leaves shards 2-3x
    * apart on tokens; a loader is throttled by its fattest shard).
    *
    * Mechanism: order docs by a salted hash (deterministic shuffle so
    * long docs spread), take the inclusive token prefix sum with the
    * two-phase operator (range partition + slice windows — no global
    * sort), and cut the token tape into `numShards` contiguous spans:
    * `shard = (start_tok * numShards) div total_tok`. All exact
    * integer arithmetic; layout-independent; replays in DuckDB (q148).
    *
    * @return input id + `n_tok` + `shard` (0-based)
    */
  def tokenShards(docs: DataFrame, idCol: String, textCol: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val id = col(idCol)
    val counted = docs
      .select(id,
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"),
        graft.functions.PortableHash.hash60Base(
          concat_ws(":", lit("shard"), id.cast("string"))).as("__h"))
      .filter(col("n_tok") > 0)
    val ranked = graft.operators.TwoPhase
      .prefixSum(counted, Nil, Seq("__h", idCol), col("n_tok"), "__cum")
    val total = counted.agg(sum(col("n_tok")).as("__total"))
    ranked.crossJoin(broadcast(total))
      .withColumn("shard",
        expr(s"((__cum - n_tok) * $numShards) div __total"))
      .select(id, col("n_tok"), col("shard"))
  }

  /** LENGTH-BUCKETED batch manifest — the padding-minimization layout
    * for fine-tuning/inference loaders that pad each batch to its
    * longest member (unlike the packed-pretraining path, q91, which
    * concatenates): grouping similar lengths bounds per-batch waste to
    * `batchSize · (bucketWidth - 1)` tokens, where naive random
    * batching wastes proportionally to the length spread.
    *
    *   - `bucket = (n_tok - 1) div bucketWidth` — the length class;
    *   - within each bucket, docs are shuffled deterministically
    *     (salted-md5 order, the q103 key — batches stay i.i.d. WITHIN
    *     a length class) and dealt into `batchSize`-row batches by the
    *     per-bucket two-phase rank (range slices + broadcast offsets —
    *     no bucket-sized window funnel);
    *   - `pos` is the row's slot in its batch; only each bucket's last
    *     batch may be short.
    *
    * All exact integer arithmetic; layout-independent; replays in
    * DuckDB (q162).
    *
    * @return (id, n_tok, bucket, batch, pos); `batch` is dense per
    *   bucket from 0, `pos` dense within each batch from 0
    */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
      bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      "bucketWidth and batchSize must be positive")
    val id = col(idCol)
    val counted = docs
      .select(id,
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"),
        graft.functions.PortableHash.hash60Base(
          concat_ws(":", lit("lenbatch"), id.cast("string"))).as("__h"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", expr(s"(n_tok - 1) div ${bucketWidth}L"))
    graft.operators.TwoPhase
      .prefixSum(counted, Seq("bucket"), Seq("__h", idCol), lit(1L), "__rk")
      .withColumn("batch", expr(s"(__rk - 1) div ${batchSize}L"))
      .withColumn("pos", (col("__rk") - 1L) % batchSize)
      .select(id, col("n_tok"), col("bucket"), col("batch"), col("pos"))
  }

  /** Sliding-window CHUNK manifest — the long-document splitter for
    * context-bounded consumers (fine-tuning on capped windows,
    * retrieval/eval chunking): each document with `n_tok` tokens emits
    * chunks of `window` tokens every `stride` tokens (overlap =
    * `window − stride` tokens preserves cross-boundary context), the
    * last chunk clamped to the document end. Complementary to [[
    * packSequences]] (which concatenates SHORT docs; this splits LONG
    * ones).
    *
    * Pure per-doc integer arithmetic — one scan, a per-doc
    * `sequence`/`explode` (chunk counts are bounded by doc length),
    * zero shuffles; replays in DuckDB (q165).
    *
    * @return (id, n_tok, chunk, tok_from, tok_to): token span
    *   [tok_from, tok_to) of chunk number `chunk` (0-based); spans
    *   tile the document with the configured overlap and every token
    *   is covered.
    */
  def chunkManifest(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val id = col(idCol)
    docs
      .select(id,
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      // chunks = 1 + ceil(max(0, n_tok - window) / stride); the +stride-1
      // trick keeps it integral (all terms nonnegative)
      .withColumn("__nc",
        lit(1L) + expr(
          s"(greatest(0L, n_tok - ${window}L) + ${stride - 1}L) div ${stride}L"))
      .withColumn("chunk", explode(sequence(lit(0L), col("__nc") - 1L)))
      .withColumn("tok_from", col("chunk") * stride)
      .withColumn("tok_to",
        least(col("tok_from") + window, col("n_tok")))
      .select(id, col("n_tok"), col("chunk"), col("tok_from"),
        col("tok_to"))
  }

  /** Portable 31-bit token id: md5-derived ([[graft.functions
    * .PortableHash.hash60Base]] reduced below 2^31 so it fits an int32
    * cell of the binary artifact) — the id scheme both engines replay,
    * which is what lets a read-back of the BINARY export be verified
    * against a DuckDB oracle that recomputes ids from raw text (q171).
    * A production export would substitute a real BPE vocabulary (q113's
    * trained merges feed one); the artifact shape is id-scheme-agnostic.
    */
  def tokenId(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (graft.functions.PortableHash.hash60Base(tok) % 2147483648L).cast("int")

  /** DuckDB SQL computing exactly [[tokenId]] of `expr`. */
  def tokenIdSql(expr: String): String =
    s"(${graft.functions.PortableHash.hash60BaseSql(expr)} % 2147483648)"

  /** MATERIALIZE the packed layout as a consumable BINARY loader
    * artifact — the gap between a manifest that DESCRIBES placements
    * (q91/q106) and an artifact a training loader can map: per
    * training sequence, one fixed-width little-endian int32 token
    * buffer (the Megatron-LM `.bin` record shape), plus the span index
    * (`.idx`) naming which document tokens back each sequence region.
    *
    * Two tables publish through [[graft.catalog.ParquetCatalog]]'s
    * atomic versioned pointer swap (readers never see a partial
    * export; a crashed export leaves the previous release live):
    *
    *   - `<name>_bin`: (grp, seq, n_tok, tokens binary) — hive-
    *     partitioned BY `grp`, so each of the `numGroups` loader
    *     streams is its own directory and a rank reading its stream
    *     prunes all others before any I/O;
    *   - `<name>_idx`: the [[sequenceManifest]] relation verbatim
    *     (grp, seq, id, doc_from, doc_to, seq_from) — provenance from
    *     every sequence region back to its source document.
    *
    * Assembly shape: one tokenize scan, one data-sized equi-join of
    * the token relation with the placement (both keyed by id), one
    * (grp, seq)-keyed aggregation whose per-group state is bounded by
    * `seqLen` — collect_list here is a bounded per-SEQUENCE buffer,
    * never a per-stream one. Within every non-final sequence the blob
    * is exactly `seqLen × 4` bytes by the tiling invariant.
    */
  def exportShards(docs: DataFrame, idCol: String, textCol: String,
      catalog: graft.catalog.ParquetCatalog, name: String,
      seqLen: Int = 2048, numGroups: Int = 8): Unit =
    exportShardsOf(idCol,
      docs.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "tok"))),
      catalog, name, seqLen, numGroups)

  /** [[exportShards]] under an ARBITRARY tokenizer: `toks` is the
    * token-stream relation `(idCol, pos, tok)` with `pos` 0-based and
    * contiguous per document — e.g. the whitespace stream (the
    * [[exportShards]] default) or the trained-BPE symbol stream
    * ([[graft.text.Bpe.symbolStream]], the real-tokenizer loader
    * path). The placement is the q91 arithmetic with `n_tok` counted
    * FROM the stream, so placement and payload cannot disagree by
    * construction.
    */
  /** @param vocabIds optional `(token, id)` relation assigning REAL
    *   vocabulary ids (e.g. [[graft.text.Bpe.vocab]]) instead of the
    *   portable hash ids — the production id scheme; tokens absent
    *   from the vocab encode as −1 (the loader's `<unk>` slot), so a
    *   frozen vocab applied to later batches degrades loudly rather
    *   than silently renumbering.
    * @param unkId when set (with `vocabIds`), out-of-vocab tokens
    *   encode as this NON-NEGATIVE reserved id instead of −1 — the
    *   unk-free artifact contract a loader can actually embed (id −1
    *   has no embedding row; real tokenizers guarantee coverage via a
    *   reserved `<unk>` or byte fallback). Pair with [[reserveUnk]],
    *   which builds the id space with slot 0 held for `<unk>`. The
    *   scheme marker records the unk id, so appends cannot mix
    *   unk-free and −1 tapes.
    */
  def exportShardsOf(idCol: String, toks: DataFrame,
      catalog: graft.catalog.ParquetCatalog, name: String,
      seqLen: Int = 2048, numGroups: Int = 8,
      vocabIds: Option[DataFrame] = None,
      unkId: Option[Int] = None): Unit = {
    val id = col(idCol)
    val stream = toks.localCheckpoint() // two consumers: counts + payload
    val counted = stream.groupBy(id)
      .agg(count(lit(1)).as("n_tok"))
      .select(id, (id % numGroups).as("grp"), col("n_tok"))
    val placed = graft.operators.TwoPhase
      .prefixSum(counted, Seq("grp"), Seq(idCol), col("n_tok"), "cum")
      .withColumn("start_tok", col("cum") - col("n_tok"))
      .withColumn("seq_first", expr(s"start_tok div ${seqLen}L"))
      .withColumn("seq_off", col("start_tok") % lit(seqLen.toLong))
      .withColumn("n_seqs",
        expr(s"(cum - 1) div ${seqLen}L") - col("seq_first") + lit(1L))
    val idx = sequenceManifest(placed, idCol, seqLen)
    val tids = tokenIdsOf(stream, idCol, vocabIds, unkId)
    val bin = placed.select(id, col("grp"), col("start_tok"))
      .join(tids, Seq(idCol))
      .withColumn("tape", col("start_tok") + col("pos"))
      .select(col("grp"), expr(s"tape div ${seqLen}L").as("seq"),
        (col("tape") % seqLen).cast("int").as("off"), col("tid"))
      .groupBy(col("grp"), col("seq"))
      .agg(sort_array(collect_list(struct(col("off"), col("tid"))))
        .as("ot"))
      .select(col("grp"), col("seq"),
        size(col("ot")).cast("long").as("n_tok"),
        graft.functions.TokenBinary.packCol(
          transform(col("ot"), s => s.getField("tid"))).as("tokens"))
    publish(catalog, s"${name}_bin", bin, partitionBy = Seq("grp"))
    publish(catalog, s"${name}_idx", idx)
    publishScheme(catalog, name, toks.sparkSession, vocabIds, unkId)
  }

  /** A frozen vocabulary re-based for UNK-FREE encoding: every id
    * shifts up by one and slot 0 becomes the reserved `<unk>` row —
    * pass the result as `vocabIds` with `unkId = Some(0)` and no
    * token (in or out of vocab) can encode below 0. The published
    * vocab artifact then carries the `<unk>` row a loader needs to
    * size its embedding table. Input/output shape: `(token, id, n)`.
    */
  def reserveUnk(vocab: DataFrame,
      unkToken: String = "<unk>"): DataFrame = {
    val shifted = vocab.select(col("token"),
      (col("id").cast("int") + 1).as("id"), col("n"))
    val spark = vocab.sparkSession
    import spark.implicits._
    Seq((unkToken, 0, 0L)).toDF("token", "id", "n")
      .unionByName(shifted)
  }

  /** BYTE-FALLBACK re-basing of a frozen vocabulary — the OTHER
    * unk-free artifact contract (SentencePiece's `byte_fallback` id
    * layout, vs [[reserveUnk]]'s single `<unk>` slot): ids 0–255 are
    * the 256 reserved byte pieces `<0x00>`…`<0xFF>` and every trained
    * id shifts up by 256. An OOV token then DECOMPOSES into byte
    * pieces instead of collapsing onto one lossy unk id — the tape
    * stays non-negative AND information-preserving (a loader can
    * reconstruct the exact text). Pair with [[byteFallbackStream]],
    * which rewrites the token stream so every emitted token is in
    * this vocabulary by construction. Input/output shape:
    * `(token, id, n)`.
    */
  def reserveBytes(vocab: DataFrame): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    (0 until 256).map(b => (f"<0x$b%02X>", b, 0L))
      .toDF("token", "id", "n")
      .unionByName(vocab.select(col("token"),
        (col("id").cast("int") + 256).as("id"), col("n")))
  }

  /** The stream rewrite that makes byte fallback REAL: tokens present
    * in the FROZEN (pre-[[reserveBytes]]) vocabulary pass through
    * unchanged; an out-of-vocab token explodes into the `<0xNN>` byte
    * pieces of its UTF-8 ENCODING — the actual SentencePiece
    * byte-fallback contract, so a multilingual token decomposes into
    * 1–4 reserved bytes per codepoint (é → `<0xC3><0xA9>`) instead of
    * either collapsing onto one lossy unk or failing — and per-doc
    * positions recompute densely over the mixed stream, so the result
    * feeds [[exportShardsOf]] with
    * `vocabIds = Some(reserveBytes(vocab))` and NO unk id, yet can
    * never emit −1 and a loader can reconstruct the exact text.
    * The byte expansion is `hex(encode(tok))` split into 2-char
    * chunks (plain regex split + per-row string ops, codegen'd — no
    * higher-order functions on the corpus-sized path; round-14's
    * hex-truncation hazard is structurally gone because the hex is
    * computed per BYTE, never per codepoint); the position renumber
    * is a per-doc window, doc-bounded like the segmenter's own.
    * Input strings are valid UTF-8 by construction (parquet's string
    * contract), so every token byte-encodes.
    *
    * @param stream `(idCol, pos, tok)` as [[graft.text.Bpe
    *   .symbolStream]] emits
    * @return `(idCol, pos, tok)` with dense positions
    */
  def byteFallbackStream(stream: DataFrame, idCol: String,
      vocab: DataFrame): DataFrame = {
    val id = col(idCol)
    val inv = vocab.select(col("token").as("tok")).distinct()
      .withColumn("__inv", lit(true))
    val pieces = stream.join(inv, Seq("tok"), "left")
      .select(id, col("pos"), col("__inv"),
        posexplode(when(col("__inv"), array(col("tok")))
          // \G-anchored lookbehind splits the hex string after every
          // 2nd char — one piece per UTF-8 byte, in byte order
          .otherwise(split(hex(encode(col("tok"), "UTF-8")),
            "(?<=\\G..)")))
          .as(Seq("__cpos", "__p")))
      // Spark split's default limit -1 keeps the zero-width match at
      // end-of-string → one trailing "" piece per OOV symbol; a plain
      // row filter drops it — codegen'd, not a lambda HOF
      .filter(col("__p") =!= "")
      .select(id, col("pos"), col("__cpos"),
        when(col("__inv"), col("__p"))
          .otherwise(concat(lit("<0x"), col("__p"), lit(">")))
          .as("tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(id).orderBy(col("pos"), col("__cpos"))
    pieces.select(id,
      (row_number().over(w) - 1).cast("long").as("pos"), col("tok"))
  }

  /** Token-id column for a stream under the artifact's id scheme:
    * the portable hash (default) or a frozen `(token, id)` vocabulary
    * with −1 — or the reserved `unkId` — for out-of-vocab tokens. ONE
    * implementation shared by [[exportShardsOf]] and [[appendShards]]
    * — the two paths cannot diverge on the id scheme.
    */
  private def tokenIdsOf(stream: DataFrame, idCol: String,
      vocabIds: Option[DataFrame],
      unkId: Option[Int] = None): DataFrame = vocabIds match {
    case Some(v) =>
      unkId.foreach(u => require(u >= 0,
        s"unkId must be a non-negative reserved id; got $u"))
      stream
        .join(v.select(col("token").as("tok"),
          col("id").cast("int").as("__vid")), Seq("tok"), "left")
        .select(col(idCol), col("pos"),
          coalesce(col("__vid"), lit(unkId.getOrElse(-1))).as("tid"))
    case None => stream.select(col(idCol), col("pos"),
      tokenId(col("tok")).as("tid"))
  }

  private def schemeName(vocabIds: Option[DataFrame],
      unkId: Option[Int]): String =
    (vocabIds, unkId) match {
      case (Some(_), Some(u)) => s"vocab_unk$u"
      case (Some(_), None) => "vocab"
      case _ => "hash"
    }

  /** Publish the artifact's id-scheme MARKER (`<name>_scheme`, one
    * row): [[appendShards]] asserts against it, so appending with the
    * wrong scheme to a published tape fails loudly instead of silently
    * writing mixed hash/vocab ids.
    */
  private def publishScheme(catalog: graft.catalog.ParquetCatalog,
      name: String, spark: org.apache.spark.sql.SparkSession,
      vocabIds: Option[DataFrame], unkId: Option[Int]): Unit =
    publish(catalog, s"${name}_scheme",
      spark.createDataFrame(Seq(Tuple1(schemeName(vocabIds, unkId))))
        .toDF("scheme"))

  /** INCREMENTAL export: append a new batch's token stream to a
    * published [[exportShardsOf]] artifact — the log-structured ingest
    * shape (each crawl drop extends the training tape; nothing already
    * written moves). New documents place AFTER the stored tape of
    * their group: every COMPLETE stored sequence is carried verbatim
    * (never decoded, never rewritten — at 100 TB the append touches
    * per group only ONE partial sequence plus the new data), each
    * group's trailing partial sequence is completed by the new tokens,
    * and the new manifest rows append to the stored `.idx`. Publishes
    * both tables as new catalog versions (readers keep their
    * snapshot); a missing table degrades to a fresh
    * [[exportShardsOf]].
    *
    * Contract: appending batches b1, b2, … equals the one-shot export
    * over their union IFF ids are monotone across batches within each
    * group (batch order = id order — true for log-structured ids);
    * within a batch, placement order is by id, as in the one-shot
    * (q179's oracle is the one-shot replay over the union).
    */
  def appendShards(idCol: String, toks: DataFrame,
      catalog: graft.catalog.ParquetCatalog, name: String,
      seqLen: Int = 2048, numGroups: Int = 8,
      vocabIds: Option[DataFrame] = None,
      unkId: Option[Int] = None): Unit = {
    if (!catalog.exists(s"${name}_bin"))
      return exportShardsOf(idCol, toks, catalog, name, seqLen,
        numGroups, vocabIds, unkId)
    // the stored tape's id scheme must match the append's: vocab ids
    // appended to a hash-id tape (or vice versa) would be silent
    // corruption. Artifacts published before the marker existed carry
    // no `_scheme` table and skip the check.
    if (catalog.exists(s"${name}_scheme")) {
      val stored = catalog.table(s"${name}_scheme").head().getString(0)
      require(stored == schemeName(vocabIds, unkId),
        s"appendShards id scheme '${schemeName(vocabIds, unkId)}' " +
          s"does not match artifact '$name' (exported as '$stored')")
    }
    val id = col(idCol)
    val (bin, idx) = readShards(catalog, name)
    val stream = toks.localCheckpoint()
    val counted = stream.groupBy(id)
      .agg(count(lit(1)).as("n_tok"))
      .select(id, (id % numGroups).as("grp"), col("n_tok"))
    // stored per-group tape length + the first incomplete seq index
    val totals = bin.groupBy(col("grp"))
      .agg(sum(col("n_tok")).as("__gbase"))
      .withColumn("__bseq", expr(s"__gbase div ${seqLen}L"))
      .localCheckpoint()
    val placed = graft.operators.TwoPhase
      .prefixSum(counted, Seq("grp"), Seq(idCol), col("n_tok"), "cum")
      .join(broadcast(totals), Seq("grp"), "left")
      .withColumn("__gbase", coalesce(col("__gbase"), lit(0L)))
      .withColumn("cum", col("cum") + col("__gbase"))
      .withColumn("start_tok", col("cum") - col("n_tok"))
      .withColumn("seq_first", expr(s"start_tok div ${seqLen}L"))
      .withColumn("seq_off", col("start_tok") % lit(seqLen.toLong))
      .withColumn("n_seqs",
        expr(s"(cum - 1) div ${seqLen}L") - col("seq_first") + lit(1L))
    val newIdx = sequenceManifest(
      placed.drop("__gbase", "__bseq"), idCol, seqLen)
    // complete stored sequences carry verbatim; each group's partial
    // (seq == __bseq, if any) decodes into (off, tid) rows and is
    // re-packed together with the new tokens
    val keepBin = bin.join(broadcast(totals.select(col("grp"),
        col("__bseq"))), Seq("grp"))
      .filter(col("seq") < col("__bseq"))
      .select(col("grp"), col("seq"), col("n_tok"), col("tokens"))
    val partialRows = bin.join(broadcast(totals.select(col("grp"),
        col("__bseq"))), Seq("grp"))
      .filter(col("seq") === col("__bseq"))
      .select(col("grp"), col("seq"),
        posexplode(graft.functions.TokenBinary.unpackCol(col("tokens")))
          .as(Seq("off", "tid")))
      .select(col("grp"), col("seq"), col("off").cast("int").as("off"),
        col("tid"))
    val newRows = placed.select(id, col("grp"), col("start_tok"))
      .join(tokenIdsOf(stream, idCol, vocabIds, unkId), Seq(idCol))
      .withColumn("tape", col("start_tok") + col("pos"))
      .select(col("grp"), expr(s"tape div ${seqLen}L").as("seq"),
        (col("tape") % seqLen).cast("int").as("off"), col("tid"))
    val rebuilt = partialRows.unionByName(newRows)
      .groupBy(col("grp"), col("seq"))
      .agg(sort_array(collect_list(struct(col("off"), col("tid"))))
        .as("ot"))
      .select(col("grp"), col("seq"),
        size(col("ot")).cast("long").as("n_tok"),
        graft.functions.TokenBinary.packCol(
          transform(col("ot"), s => s.getField("tid"))).as("tokens"))
    publish(catalog, s"${name}_bin",
      keepBin.unionByName(rebuilt), partitionBy = Seq("grp"))
    publish(catalog, s"${name}_idx", idx.unionByName(newIdx))
    // (re)publish the marker: a pre-marker artifact becomes checked
    // from its first append on
    publishScheme(catalog, name, toks.sparkSession, vocabIds, unkId)
  }

  /** Read back an [[exportShards]] artifact: `(bin, idx)` as published
    * (bin's `grp` re-cast to long — hive partition discovery infers
    * int). `binDecoded` additionally surfaces the token ids as an
    * `array<int>` column for consumers that want rows, not buffers.
    */
  def readShards(catalog: graft.catalog.ParquetCatalog, name: String)
      : (DataFrame, DataFrame) = {
    val bin = catalog.table(s"${name}_bin")
      .withColumn("grp", col("grp").cast("long"))
      .select(col("grp"), col("seq"), col("n_tok"), col("tokens"))
    (bin, catalog.table(s"${name}_idx"))
  }

  /** [[readShards]]' bin side with the buffer decoded to token ids. */
  def binDecoded(bin: DataFrame): DataFrame =
    bin.withColumn("tids",
      graft.functions.TokenBinary.unpackCol(col("tokens")))

  private def publish(catalog: graft.catalog.ParquetCatalog,
      table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    if (!catalog.exists(table)) catalog.create(table, df.schema)
    catalog.overwrite(table, df, partitionBy)
  }

  /** The epoch-sharded loader manifest — the one artifact a
    * distributed training loader actually maps: for each epoch, a
    * seeded global permutation of the corpus
    * ([[graft.operators.Ranking.globalRowNumber]] over
    * (epoch, md5-key, id) — the q103 shuffle, never a single-partition
    * sort), documents dealt round-robin to `nShards` writer shards in
    * permuted order, each (epoch, shard) stream packed head-to-tail
    * into `seqLen`-token sequences, expanded to one row per
    * (sequence, document) span.
    *
    * Composes the three verified layers verbatim: the rank is q103's,
    * the per-stream prefix sum is q91's ([[graft.operators.TwoPhase]]
    * with `grp = epoch * nShards + shard` as the stream key), the span
    * expansion is q106's [[sequenceManifest]]. All integer arithmetic;
    * replays bit-identically in DuckDB (q112).
    *
    * @return (epoch, shard, seq, id, doc_from, doc_to, seq_from):
    *   document tokens [doc_from, doc_to) land at offset seq_from of
    *   sequence seq of the (epoch, shard) stream; within each stream,
    *   spans tile every sequence exactly (final partial excepted)
    */
  def epochShardManifest(docs: DataFrame, idCol: String, textCol: String,
      epochs: Int, nShards: Int, seqLen: Int = 2048): DataFrame = {
    val id = col(idCol)
    val eps = broadcast(docs.sparkSession.range(epochs)
      .select(col("id").cast("int").as("epoch")))
    val counted = docs
      .select(id, TextAnalysis.tokenCount(col(textCol)).cast("long")
        .as("n_tok"))
      .filter(col("n_tok") > 0)
      .crossJoin(eps)
      .withColumn("k", graft.functions.PortableHash.hash60Base(
        concat_ws(":", col("epoch"), id)))
    val ranked = graft.operators.Ranking
      .globalRowNumber(counted, Seq("epoch", "k", idCol), "ord")
      .withColumn("shard", ((col("ord") - 1L) % nShards).cast("int"))
      .withColumn("grp", col("epoch").cast("long") * nShards + col("shard"))
    val placed = graft.operators.TwoPhase
      .prefixSum(ranked, Seq("grp"), Seq("ord"), col("n_tok"), "cum")
      .withColumn("start_tok", col("cum") - col("n_tok"))
      .withColumn("seq_first", expr(s"start_tok div ${seqLen}L"))
      .withColumn("seq_off", col("start_tok") % lit(seqLen.toLong))
      .withColumn("n_seqs",
        expr(s"(cum - 1) div ${seqLen}L") - col("seq_first") + lit(1L))
    sequenceManifest(placed, idCol, seqLen)
      .select(expr(s"grp div $nShards").cast("int").as("epoch"),
        (col("grp") % nShards).cast("int").as("shard"),
        col("seq"), id, col("doc_from"), col("doc_to"), col("seq_from"))
  }

  /** Expand a [[packSequences]] placement into the per-sequence
    * manifest a training loader consumes: one row per (sequence,
    * document) span — which token range of the document lands at which
    * offset of which sequence. A document straddling `n_seqs`
    * sequences contributes that many rows (a row-local `explode` of an
    * integer range — no shuffle at all; the manifest inherits the
    * placement's partitioning).
    *
    * Within each `(grp, seq)`, spans tile the sequence exactly:
    * contiguous `seq_from`, summing to `seqLen` tokens (the stream's
    * final partial sequence excepted). All integer arithmetic —
    * replays bit-identically in DuckDB (q106).
    *
    * @return (grp, seq, doc column, doc_from, doc_to, seq_from): doc
    *   tokens [doc_from, doc_to) placed at sequence offset seq_from
    */
  def sequenceManifest(placement: DataFrame, idCol: String,
      seqLen: Int = 2048): DataFrame = {
    val L = lit(seqLen.toLong)
    placement
      .withColumn("seq",
        explode(sequence(col("seq_first"),
          col("seq_first") + col("n_seqs") - 1L)))
      .select(col("grp"), col("seq"), col(idCol),
        when(col("seq") === col("seq_first"), lit(0L))
          .otherwise(col("seq") * L - col("start_tok")).as("doc_from"),
        least(col("n_tok"), (col("seq") + 1L) * L - col("start_tok"))
          .as("doc_to"),
        when(col("seq") === col("seq_first"), col("seq_off"))
          .otherwise(lit(0L)).as("seq_from"))
  }
}
