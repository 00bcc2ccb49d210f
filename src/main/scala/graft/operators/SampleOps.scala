package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling (reference: generic.py:4383 sample(weights=)).
  *
  * pandas draws from the normalized weight vector in one process; the
  * distributed equivalent is Efraimidis–Spirakis A-Res: give every row
  * the key u^(1/w) (u ~ U(0,1) seeded per row) and keep the n largest —
  * a weighted reservoir that needs ONE pass and a distributed top-k
  * (TakeOrderedAndProject), never a global sort or a driver-side cdf.
  * Deterministic for a fixed seed: u comes from xxhash64(id, seed).
  */
object SampleOps {

  /** Cross-engine deterministic uniform in [0, 2^32) from a key: the
    * first 8 hex chars of md5(key || ':' || salt). Unlike xxhash64 this
    * is reproducible in any engine (DuckDB, Trino, pandas) — the basis
    * for oracle-checkable sampling and stable train/val/test splits
    * that survive reprocessing (a training-data-pipeline requirement:
    * the split of a document must never depend on cluster layout). */
  def hashU32(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long")

  /** Deterministic shard id for a row key: hashU32 mod nShards — a pure
    * function of the KEY, so shard membership survives reprocessing,
    * repartitioning, and file-layout changes (the property that lets a
    * resumed training run read the same shards it left off at). */
  def shardCol(key: Column, nShards: Int, salt: String = "shard"): Column =
    pmod(hashU32(key, salt), lit(nShards.toLong))

  /** Sharded training-corpus materialization — the output step at the
    * end of the curation pipeline: rows land in hive-layout
    * `shard=<k>/` parquet directories by deterministic hash shard.
    * One repartition on the shard id co-locates each shard before the
    * write (≈1 file per shard; AQE splits a skewed one), and readers
    * get planning-time partition pruning per shard — a training job
    * reading shard 3 lists and scans ONLY shard 3. The md5-based hash
    * is uniform, so shards balance at any corpus size; size nShards to
    * the downstream reader fleet, not the writer cluster. */
  def writeTrainingShards(df: DataFrame, idCol: String, outDir: String,
      nShards: Int, salt: String = "shard"): Unit = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — writeTrainingShards would " +
        "silently overwrite it; rename or drop it first")
    df.withColumn("shard", shardCol(col(idCol), nShards, salt))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** Deterministic frac-sample: keep rows whose hash-uniform < frac.
    * Per-row independent ⇒ already stratified under any grouping;
    * reproducible and oracle-exact (unlike rand()-based sample). */
  def hashSample(df: DataFrame, keyCol: Column, frac: Double,
      salt: String = "graft"): DataFrame =
    df.filter(hashU32(keyCol, salt) < (frac * 4294967296.0).toLong)

  /** Deterministic dataset split: label each row train/val/test by
    * cumulative fraction thresholds over the hash-uniform. */
  def hashSplit(keyCol: Column, fracs: Seq[(String, Double)],
      salt: String = "graft"): Column = {
    val u = hashU32(keyCol, salt).cast("double") / 4294967296.0
    val cum = fracs.scanLeft(0.0)(_ + _._2).tail
    val pairs = fracs.map(_._1).zip(cum)
    pairs.init.foldRight(lit(pairs.last._1): Column) {
      case ((name, hi), acc) => when(u < hi, name).otherwise(acc)
    }
  }

  /** Deterministic corpus mixing: per-source hash-sampled subsets at the
    * given keep-fractions, unioned — the "dataset mixture" step of a
    * pretraining pipeline (e.g. upsample wiki, downsample crawl).
    * Reproducible under reprocessing and layout changes like hashSample;
    * per-source salts keep the draws independent. */
  def mixCorpora(sources: Seq[(DataFrame, Double)], keyCol: String,
      salt: String = "mix"): DataFrame =
    sources.zipWithIndex.map { case ((df, frac), i) =>
      hashSample(df, df(keyCol), frac, s"$salt:$i")
    }.reduce(_ unionByName _)

  /** Deterministic token-budget corpus draw — the pretraining "fill N
    * tokens" step: documents are taken in hash-uniform order (hashU32 of
    * the id, ties broken by id) and the kept set is the maximal prefix
    * whose inclusive token total stays ≤ `budget`. Hash order makes the
    * draw uniform over the corpus AND reproducible under reprocessing,
    * file relayout, or corpus growth (a document already inside the
    * budget only leaves if new documents hash ahead of it — never
    * because partitioning changed). md5-derived hash + exact integer
    * cumsum keep it engine-checkable (sample_token_budget gate).
    *
    * Scale shape (100 TB): DistScan.withRunningSums range-buckets by the
    * hash, runs per-bucket windows, and closes with a ≤buckets-row
    * prefix-offset pass — one range shuffle, no single-partition window,
    * no driver-side data loop. */
  def sampleTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, salt: String = "budget", buckets: Int = 32): DataFrame = {
    val withH = df.withColumn("__h", hashU32(col(idCol), salt))
    DistScan.withRunningSums(withH, col("__h"),
        Seq(col("__h").asc, col(idCol).asc),
        Seq("__cum" -> col(tokensCol).cast("long")), buckets)
      .filter(col("__cum") <= budget)
      .drop("__h", "__cum", DistScan.PidCol)
  }

  /** PER-GROUP deterministic token-budget draw — domain mixing by token
    * QUOTA rather than keep-fraction ("fill 30 B tokens of code, 70 B
    * of web" — the budgeted form of [[mixCorpora]]): within each group,
    * documents fill in the same hash order as [[sampleTokenBudget]],
    * independently per group, and a group keeps the maximal prefix
    * whose inclusive token total stays ≤ its budget. Groups absent from
    * `budgets` are DROPPED (budget 0) — state every group you want.
    *
    * Scale shape: DistScan.withGroupedRunningSum — range buckets on the
    * hash (a group holding half the corpus still splits across every
    * bucket; a window partitioned by group alone would single-task it),
    * per-(bucket, group) cumsums, tiny broadcast offset join. Budgets
    * ride the plan as a map literal. */
  def sampleTokenBudgetPerGroup(df: DataFrame, groupCol: String,
      idCol: String, tokensCol: String, budgets: Map[String, Long],
      salt: String = "budget", buckets: Int = 32): DataFrame = {
    val withH = df.withColumn("__h", hashU32(col(idCol), salt))
    val bLit = typedLit(budgets)
    DistScan.withGroupedRunningSum(withH, Seq(groupCol), col("__h"),
        Seq(col("__h").asc, col(idCol).asc), "__cum",
        col(tokensCol).cast("long"), buckets)
      .filter(col("__cum") <= element_at(bLit, col(groupCol)))
      .drop("__h", "__cum", DistScan.PidCol)
  }

  /** Data-constrained upsampling (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models"): when the curated corpus holds
    * fewer tokens than the training budget, REPEAT it — full epochs of
    * every document plus one hash-order partial epoch that fills the
    * remainder, with `maxEpochs` capping repetition where the paper's
    * value-of-repeated-data decay makes further epochs worthless
    * (their fitted ~4-epoch knee is the default). Emits one row per
    * (document × epoch) with `epoch` 0-based, so the downstream
    * packer/shard writer sees repeats as ordinary rows and a resumed
    * run regenerates the identical schedule.
    *
    * Scale shape: ONE scalar total-tokens aggregate (collected — a
    * 1-row driver read), the full epochs as a row-local
    * explode(sequence) whose fan-out is the epoch count, and the
    * partial epoch as [[sampleTokenBudget]]'s single-range-exchange
    * cumsum. If the budget exceeds maxEpochs full epochs, the cap
    * wins (no partial epoch — the caller asked for more data than
    * repetition usefully provides, and silently looping further would
    * betray the paper's premise). */
  def repeatToBudget(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, maxEpochs: Int = 4, salt: String = "budget",
      buckets: Int = 32): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    val totRow = df.agg(sum(col(tokensCol).cast("long"))).collect()(0)
    require(!totRow.isNullAt(0) && totRow.getLong(0) > 0,
      "corpus has no tokens to repeat")
    val total = totRow.getLong(0)
    val k = math.min(budget / total, maxEpochs.toLong)
    val full =
      if (k == 0) df.limit(0).withColumn("epoch", lit(0L))
      else df.withColumn("epoch",
        explode(sequence(lit(0L), lit(k - 1))))
    val rem = if (k >= maxEpochs) 0L else budget - k * total
    val partial = sampleTokenBudget(df, idCol, tokensCol, rem, salt,
      buckets).withColumn("epoch", lit(k))
    // rem == 0 ⇒ NO partial epoch at all — including zero-token
    // documents a cum ≤ 0 prefix draw would admit (the oracle's part
    // CTE guards rem > 0 to match)
    if (rem == 0) full else full.unionByName(partial)
  }

  /** Length-bucketed PADDED packing — the NO-SPLIT packing tier for
    * SFT / encoder training, where a document must land whole inside
    * one training sequence (GPT-style boundary-crossing packing is
    * [[packSequences]]): each document rounds up to its power-of-two
    * slot class, a sequence of `seqLen` tokens holds `seqLen/slot`
    * same-slot documents, and the padding cost is `slot − n_tok` per
    * document — bounded below 2× by construction, vs the unbounded
    * waste of one-document-per-sequence padding. Emits
    * (id, tokens, slot, seq_id, seq_pos, pad) with `(slot, seq_id)`
    * naming the training sequence and `seq_pos` the document's slot
    * index inside it; deterministic hash order, so the batch schedule
    * is a pure function of (corpus, salt, seqLen).
    *
    * Scale shape: slot classes are log2(seqLen)-many, position within
    * a class rides [[DistScan.withGroupedRunningSum]] (range buckets
    * on the hash — one dominant length class still spreads across
    * every bucket), and the window index is exact integer division.
    * Zero-token documents occupy no slot and are dropped; documents
    * LONGER than seqLen fail loudly (they cannot pack whole — filter
    * or truncate upstream, silently dropping them would bias the
    * corpus toward short text). */
  def packPaddedByLength(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long, salt: String = "pack", buckets: Int = 32): DataFrame = {
    require(seqLen > 0 && (seqLen & (seqLen - 1)) == 0,
      s"seqLen must be a power of two: $seqLen")
    val t = col(tokensCol).cast("long")
    val guarded = when(t > seqLen,
        raise_error(concat(lit("packPaddedByLength: document exceeds " +
          s"seqLen=$seqLen: id="), col(idCol).cast("string"))))
      .otherwise(t)
    val classes = Iterator.iterate(1L)(_ * 2).takeWhile(_ <= seqLen).toSeq
    val slot = classes.reverse.foldLeft(lit(seqLen): Column)((acc, s) =>
      when(guarded <= s, lit(s)).otherwise(acc))
    val staged = df.filter(t > 0)
      .withColumn("__slot", slot)
      .withColumn("__h", hashU32(col(idCol), salt))
    val ranked = DistScan.withGroupedRunningSum(staged, Seq("__slot"),
      col("__h"), Seq(col("__h").asc, col(idCol).asc),
      "__rn", lit(1L), buckets)
    ranked // capacity seqLen/slot is exact: both are powers of two
      .withColumn("__cap", expr(s"${seqLen}L div __slot"))
      .withColumn("seq_id", expr("(__rn - 1) div __cap"))
      .withColumn("seq_pos", pmod(col("__rn") - 1, col("__cap")))
      .withColumn("pad", col("__slot") - t)
      .withColumnRenamed("__slot", "slot")
      // withGroupedRunningSum's offset join fronts its key columns —
      // restore a stable caller-columns-first order
      .select((df.columns.toSeq ++
        Seq("slot", "seq_id", "seq_pos", "pad")).map(col): _*)
  }

  /** Sequence packing — the pretraining step after the corpus draw:
    * concatenate every document's tokens into one global stream
    * (deterministic hash order, same convention as sampleTokenBudget)
    * and cut it into fixed `seqLen`-token training windows. Emits one
    * row per (document × window it overlaps):
    *   seq_id     window index in the global stream
    *   frag_start first token of the document inside this window
    *   frag_len   number of its tokens in this window
    *   seq_off    where the fragment lands inside the window
    * so a downstream tokenizer pass can materialize window seq_id by
    * concatenating its fragments ordered by seq_off — documents cross
    * window boundaries (GPT-style packing), nothing is padded except
    * the final partial window. Zero-token documents occupy no span and
    * are dropped.
    *
    * Determinism/reproducibility: hash order makes the packing a pure
    * function of (corpus, salt, seqLen) — independent of partitioning
    * or file layout, so a re-run resumes training on identical batches.
    *
    * Scale shape (100 TB): DistScan.withRunningSums range-buckets by
    * the hash — ONE range shuffle, per-bucket windows, ≤buckets-row
    * offset pass; the window arithmetic is a row-local explode whose
    * fan-out is ⌈n_tok/seqLen⌉+1 per document. Exact long arithmetic
    * throughout (`div`, not double floor). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long, salt: String = "pack", buckets: Int = 32): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val toks = col(tokensCol).cast("long")
    val withH = df.filter(toks > 0L)
      .withColumn("__n", toks)
      .withColumn("__h", hashU32(col(idCol), salt))
    val cum = DistScan.withRunningSums(withH, col("__h"),
      Seq(col("__h").asc, col(idCol).asc), Seq("__cum" -> col("__n")),
      buckets)
    cum.withColumn("__st", col("__cum") - col("__n"))
      .withColumn("seq_id", explode(sequence(
        expr(s"__st div ${seqLen}L"), expr(s"(__cum - 1) div ${seqLen}L"))))
      .withColumn("frag_start",
        greatest(lit(0L), col("seq_id") * seqLen - col("__st")))
      .withColumn("frag_len",
        least(col("__n"), (col("seq_id") + 1) * seqLen - col("__st")) -
          col("frag_start"))
      .withColumn("seq_off",
        greatest(lit(0L), col("__st") - col("seq_id") * seqLen))
      .select(col(idCol), col("seq_id").cast("long").as("seq_id"),
        col("frag_start"), col("frag_len"), col("seq_off"))
  }

  /** Weighted sample WITHOUT replacement of n rows. `idCol` must be
    * unique and non-null; rows with weight <= 0 or null are excluded
    * (pandas semantics). */
  def weightedSample(df: DataFrame, n: Int, weightCol: String, idCol: String,
      seed: Long = 42L): DataFrame = {
    // u in (0,1): 64-bit hash → positive fraction; key = ln(u)/w is the
    // log-space form of u^(1/w) (monotone ⇒ same top-k, no underflow).
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1000000007L))
      .cast("double") + 1.0) / 1000000009.0
    val key = log(u) / col(weightCol)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__k", key)
      .orderBy(col("__k").desc)
      .limit(n)
      .drop("__k")
  }

  /** Seeded deterministic EPOCH shuffle: the global reshuffle a
    * training run performs between epochs, as a layout operation. Each
    * row gets position `pos` (1-based) in a pseudo-random total order
    * keyed by md5(seed || '-' || id) — a different seed yields an
    * unrelated permutation, the same seed yields the identical one on
    * any cluster layout (md5 of the KEY, never a partition-dependent
    * rand()) — and `shard` splits that order into `numShards`
    * EXACTLY-equal contiguous slices (SQL ntile arithmetic), so every
    * data-parallel worker reads the same-sized contiguous range and a
    * resumed run can seek to (shard, pos).
    *
    * Scale: the ranking is DistScan's distributed row number — ONE
    * range exchange on the hash key plus a bounded ≤buckets-row
    * offset collect; no single-partition window anywhere. Writing the
    * result partitioned by `shard`, sorted by `pos`, is the epoch's
    * on-disk layout. */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
      numShards: Int, buckets: Int = 32): DataFrame = {
    require(numShards >= 1, s"epochShuffle: numShards must be >= 1")
    val keyed = df.withColumn("__hk",
      md5(concat_ws("-", lit(seed.toString), col(idCol).cast("string"))
        .cast("binary")))
    val (ranked, total) = DistScan.withGlobalRowNumber(
      keyed, Seq(col("__hk"), col(idCol)), "pos", buckets)
    // ntile(numShards) as arithmetic on pos (first N mod n shards get
    // the extra row — the SQL definition, exact vs DuckDB's ntile)
    val k = total / numShards; val m = total % numShards
    val shard =
      if (k == 0L) col("pos")
      else when(col("pos") <= m * (k + 1),
          floor((col("pos") - 1) / (k + 1)) + 1)
        .otherwise(lit(m) + floor((col("pos") - 1 - m * (k + 1)) / k) + 1)
    ranked.withColumn("shard", shard.cast("int")).drop("__hk")
  }
}
