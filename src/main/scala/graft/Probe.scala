package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("weather")) { weatherDrive(); return }
    if (args.headOption.contains("pipeline")) { pipelineDrive(); return }
    if (args.headOption.contains("streamgold")) { streamGoldDrive(); return }
    if (args.headOption.contains("plans")) { plansDump(); return }
    if (args.headOption.contains("pagerank")) { pageRankVariants(); return }
    if (args.headOption.contains("hotgroup")) {
      hotGroupVariants(sys.env.getOrElse("SPARK_GRAFT_HOTGROUP_MULT", "10").toInt)
      return
    }
    if (args.headOption.contains("baskets")) {
      basketScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(2); case ms => ms
      })
      return
    }
    if (args.headOption.contains("corpus")) {
      corpusScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(20); case ms => ms
      })
      return
    }
    if (args.headOption.contains("bucketq3")) { bucketQ3(); return }
    if (args.headOption.contains("forget")) {
      forgetScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(4); case ms => ms
      })
      return
    }
    if (args.headOption.contains("pqappend")) {
      pqAppendScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(10); case ms => ms
      })
      return
    }
    if (args.headOption.contains("graph")) {
      graphScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(1, 2, 3); case ms => ms
      })
      return
    }
    if (args.headOption.contains("entity")) {
      entityScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(7); case ms => ms
      })
      return
    }
    if (args.headOption.contains("entityappend")) {
      entityAppendScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(1, 5, 20); case ms => ms
      })
      return
    }
    if (args.headOption.contains("frontier")) {
      frontierScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(1, 8, 64); case ms => ms
      })
      return
    }
    if (args.headOption.contains("jw")) {
      jwScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(1, 4, 16); case ms => ms
      })
      return
    }
    if (args.headOption.contains("packrewrite")) {
      packRewriteScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(1, 4); case ms => ms
      })
      return
    }
    if (args.headOption.contains("modelrebuild")) {
      modelRebuildScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(1, 4, 16); case ms => ms
      })
      return
    }
    if (args.headOption.contains("hitsscale")) {
      hitsScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(4, 16); case ms => ms
      })
      return
    }
    if (args.headOption.contains("ungroupedscale")) {
      ungroupedScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(8, 64); case ms => ms
      })
      return
    }
    if (args.headOption.contains("lengthbatch")) {
      lengthBatchScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(64); case ms => ms
      })
      return
    }
    if (args.headOption.contains("dialcost")) {
      dialCost(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(1, 8, 64); case ms => ms
      })
      return
    }
    if (args.headOption.contains("distinctscale")) {
      distinctScale(args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(1, 8, 64); case ms => ms
      })
      return
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    import graft.functions.TextFns
    val sh = docs.select(col("doc_id"), TextFns.words(col("text")).as("ws"))
      .select(col("doc_id"), TextFns.shinglesFromWords(col("ws")).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    val wsOnly = docs.select(col("doc_id"), TextFns.words(col("text")).as("ws"))
    time("words explode")(println(wsOnly.select(explode(col("ws"))).count()))
    val noDistinct = wsOnly.select(col("doc_id"),
      transform(sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2),
          element_at(col("ws"), i + 3))).as("shingles"))
    time("shingles no-distinct explode")(println(noDistinct.select(explode_outer(col("shingles"))).count()))
    val ex = sh.select(col("doc_id"), col("n_sh"), explode_outer(col("shingles")).as("sh"))
    println(ex.queryExecution.executedPlan.toString.take(2000))
    time("explode count")(println(ex.count()))
    time("distinct shingles")(println(ex.select("sh").distinct().count()))
    val a = ex.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"), col("sh"))
    val b = ex.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"), col("sh"))
    val joined = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
    time("candidate pair rows")(println(joined.count()))
    val grouped = joined.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"), first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
    time("distinct pairs")(println(grouped.count()))
    val res = grouped
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= 0.8)
    time("final pairs")(println(res.count()))
    spark.stop()
  }

  /** Corpus-scale probe: inflate the 5k-doc sf0.1 corpus by `mult` and
    * measure (a) candidate-pair counts per blocking scheme and (b) wall
    * times for the operator families, at each size — the empirical
    * backing for SCALE.md's "colliding pairs, not n²" claims.
    *
    * Replication salts a per-replica token BETWEEN EVERY WORD (not a
    * suffix): replica shingle sets are disjoint, so organic near-dup
    * pairs replicate linearly with corpus size and replicas never
    * near-dup each other — near-dup DENSITY stays constant while n
    * grows, which is what makes "pairs vs n" a fair superlinearity
    * probe. (A suffix salt leaves replicas ~identical: every group of
    * `mult` copies becomes a near-dup clique and pair counts grow
    * quadratically BY CONSTRUCTION, measuring the fixture, not the
    * operator.)
    *
    * `sbt "runMain graft.Probe corpus 20 63 200"` = 100k / 315k / 1M
    * docs. One measured run per op per size (cold-ish JIT at the first
    * size; sizes are compared for SCALING, not absolute speed). */
  def corpusScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Curation, Dedup, TextAnalysis}
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    mults.foreach { mult =>
      val docs = base
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("doc_id") * mult + col("rep")).as("doc_id"),
          regexp_replace(col("text"), lit(" "),
            concat(lit(" r"), col("rep").cast("string"), lit(" "))).as("text"),
          col("lang"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = docs.count()
      def time(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[corpus] $label @ $n docs: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // the raw-shingle candidate legs (count + jaccard/contamination/
      // clusters over the whole corpus) are measured only below ~500k
      // docs: their candidate volume is linear in n but ~2k pairs/doc on
      // this dup-dense fixture, and the 1M-tier distinct/aggregate
      // shuffle exceeded this host's disk (measured — the empirical
      // argument for the LSH schemes past that size). curate() still
      // runs them at every tier: its quality funnel shrinks the corpus
      // ~6x before its cluster-dedup leg.
      val shingleOps = n <= 500000
      // optional comma-separated op filter for resuming a tier after a
      // resource-bound abort without re-measuring what already landed
      val only = sys.env.get("SPARK_GRAFT_CORPUS_OPS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      def want(op: String): Boolean = only.forall(_(op))
      if (want("counts")) time("candidate counts (shingle/band/block)") {
        println(s"[corpus] pairs @ $n docs: " +
          s"${Dedup.candidateCounts(docs, includeShingle = shingleOps)}")
      }
      if (want("maponly")) time("split+langid+stats (map-only)") {
        drain(TextAnalysis.withSplit(docs)
          .select(col("doc_id"), col("split"),
            graft.functions.TextFns.wordCount(col("text")).as("wc")))
      }
      if (want("ngrams")) time("top_ngrams") { drain(TextAnalysis.topNgrams(docs)) }
      if (want("simhash")) time("simhash pairs (paired blocks)") {
        drain(Dedup.simhashPairs(docs))
      }
      // the (14,8) dial explodes C(14,8)=3003 rows/doc: ~3e9 rows at 1M
      // docs need ~150 GB of merge-join scratch — beyond one node's disk
      // (measured); its n² savings pay off on a cluster, so the probe
      // measures it on the ≤500k tiers only
      if (shingleOps && want("simhash14")) time("simhash pairs (14,8 corpus dial)") {
        drain(Dedup.simhashPairsBlocked(docs, 6, nBlocks = 14, keep = 8))
      }
      if (want("minhash")) time("minhash LSH pairs") {
        drain(Dedup.minhashLshPairs(docs, 0.8))
      }
      if (shingleOps) {
        if (want("jaccard")) time("ngram jaccard pairs") {
          drain(Dedup.shingleJaccardPairs(docs, 0.8))
        }
        if (want("contamination")) time("contamination") {
          drain(TextAnalysis.contamination(docs))
        }
        if (want("clusters")) time("dup clusters (label propagation)") {
          drain(Dedup.dupClusters(Dedup.shingleJaccardPairs(docs, 0.8)))
        }
        if (want("dupweights")) time("dup weights (clusters + size window)") {
          drain(graft.operators.DupWeights.dupWeights(docs))
        }
        if (want("dedupcurve") && n <= 150000) time("dedup threshold curve (count-verified candidates)") {
          // same co-occurrence candidate shape as `jaccard` plus the
          // 5-threshold grading — the r11 histogram rewrite's claim is
          // "one candidate pass", so its tier time must track jaccard's
          // (measured: 119 s vs 312 s at 100k docs). The 315k tier blew
          // the host's shuffle scratch (the legs carry two extra longs —
          // nh per side — over jaccard's, on ~630M co-occurrence rows);
          // disk-bounded like simhash14, not compute-bounded.
          drain(graft.operators.DedupCurve.thresholdCurve(docs))
        }
      } else println(s"[corpus] raw-shingle ops skipped @ $n docs (disk-bounded; see SCALE.md)")
      if (want("codec")) time("multimodal codec round trip (PNG+WAV, map-only)") {
        drain(graft.operators.Multimodal.decodeRoundTrip(docs))
      }
      if (want("passages")) time("passage dedup (linear, no pair join)") {
        drain(graft.operators.Passages.passageDedup(docs))
      }
      if (want("spans")) time("substring span dedup (stride-1 windows)") {
        drain(graft.operators.Spans.substringSpanDedup(docs))
      }
      if (want("cdcchunks")) time("content-defined chunks + first occurrence") {
        drain(graft.operators.CdcChunks.cdcChunks(docs))
      }
      if (want("ahashgroups")) time("image hash groups + near-hash pairs (no expansion)") {
        // the scalable legs only: decode+hash, distinct hashes, banded
        // near-hash verify. Member EXPANSION is excluded on purpose: the
        // replicated corpus is ~99.5% duplicate images (468 distinct
        // hashes regardless of size), so expanded pairs grow with the
        // SQUARE of corpus size because the true answer does — at that
        // dup density production reports groups, not pairs (SCALE.md)
        val h = graft.operators.Multimodal.ahashes(docs)
        val groups = h
          .groupBy(col("ahash_lo"), col("ahash_hi"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("rep"))
        drain(groups)
      }
      if (want("chunks")) time("chunks (map-only sliding windows)") {
        drain(graft.operators.Passages.chunks(docs))
      }
      if (want("lmscore")) time("lm bucket score (bounded-vocab broadcast)") {
        drain(TextAnalysis.lmBucketScore(docs))
      }
      if (want("tokenize")) time("bpe tokenize (trained model, map-only)") {
        // train once on the base corpus (the amortized index-build cost);
        // the measured leg is the apply scan over the replicated corpus
        drain(graft.operators.Tokenize.tokenizeSummary(docs,
          graft.operators.Tokenize.modelFor(spark, "/root/testdata/sf0.1")))
      }
      if (want("heavyhitters")) time("heavy hitters (MG candidates + recount)") {
        drain(TextAnalysis.heavyHitters(docs))
      }
      if (want("incremental")) time("incremental dedup (batch vs corpus bands)") {
        val tagged = TextAnalysis.withSplit(docs)
        drain(graft.operators.IncrementalDedup.incrementalDedup(
          tagged.filter(col("split") === "train"),
          tagged.filter(col("split") =!= "train")))
      }
      if (want("quantize")) time("int8 reconstruct + quantized topk (vectors)") {
        // replicate the 5k-vector embeddings table to the same multiple
        // (1M vectors at the 200 tier); reconstruct is map-only, the
        // top-k is the broadcast-queries corpus scan
        val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
          .crossJoin(spark.range(mult).toDF("rep"))
          .select((col("vec_id") * mult + col("rep")).as("vec_id"),
            col("embedding"), col("label"))
        drain(graft.operators.Quant.quantizedTopK(emb, k = 5, nQueries = 50))
      }
      if (want("dsir")) {
        // no source column on the replicated corpus → synthetic 20-way
        val sourced = docs.withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
        time("dsir select (hashed weights + global rank)") {
          drain(graft.operators.Dsir.dsirSelect(sourced, "src0"))
        }
      }
      if (want("curate")) time("curate() end-to-end") {
        val out = java.nio.file.Files.createTempDirectory(s"graft-curate-$mult").toString
        println(s"[corpus] curate @ $n docs: ${Curation.curate(docs, out)}")
      }
      // the mixture/cap/budget family: all linear (one window on source
      // / one range-partitioned prefix sum); the replicated corpus has
      // no source column, so derive a 20-way synthetic one
      if (want("mixture")) {
        val sourced = docs.withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
        time("source cap (rank window)") {
          drain(Curation.sourceCap(sourced, 10000))
        }
        time("token mixture (control-plane caps + running window)") {
          drain(Curation.sourceMixTokens(sourced,
            Map("src0" -> 3000, "src1" -> 3000, "src2" -> 4000)))
        }
        time("budget select (distributed prefix sum)") {
          drain(Curation.budgetSelect(sourced, length(col("text")),
            budgetTokens = n * 50L, nPartitions = 32))
        }
      }
      docs.unpersist()
    }
    spark.stop()
  }

  /** Measures TPC-H Q3 plain vs over the bucketed fact layout at sf0.1
    * with size-based broadcast off (the fact-scale join shape) — the
    * build cost and the per-query delta are reported separately because
    * the layout amortizes over every orderkey join that follows it. */
  /** Entity signature-index maintenance probe (VERDICT r12 item 5): is
    * `Entity.appendEdit2Index`'s cost ∝ the BATCH while a full index
    * build is ∝ the corpus? Corpus = sf0.1 customers replicated mult×
    * (fresh ids, replica tag fused into the name so key volume scales
    * with rows, not duplicate collisions); the appended batch stays a
    * constant 500 rows at every tier. Claimed shape: append flat across
    * tiers, build growing mult× — the [[pqAppendScale]] contract for
    * the FastSS-2 postings. */
  def entityAppendScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Entity
    val base = Tables.customer(spark, "/root/testdata/sf0.1")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val batch = base.limit(500)
      .select((col("c_custkey") + lit(1000000000L)).as("c_custkey"),
        concat(col("c_name"), lit(" b")).as("c_name"), col("c_nationkey"))
    mults.foreach { mult =>
      val corpus = base.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("c_custkey") * mult + col("rep")).as("c_custkey"),
          concat(col("c_name"), lit(" r"), col("rep")).as("c_name"),
          col("c_nationkey"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft-entapp")
      try {
        def time(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          println(f"[entityappend] $label @ $n rows: " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        val idx = tmp.resolve("edit2_index").toString
        time("index build (corpus)") {
          Entity.writeEdit2Index(corpus, "c_custkey", "c_name",
            Some("c_nationkey"), idx)
        }
        time("index append (500-row batch)") {
          Entity.appendEdit2Index(batch, "c_custkey", "c_name",
            Some("c_nationkey"), idx)
        }
      } finally {
        corpus.unpersist()
        import scala.sys.process._
        Seq("rm", "-rf", tmp.toString).!
        ()
      }
    }
    spark.stop()
  }

  /** PQ maintenance probe: is `Pq.appendCodes`' cost ∝ the BATCH while
    * a full rebuild is ∝ the corpus? The corpus is the sf0.1 embeddings
    * replicated mult× (codebooks trained once on the base and frozen —
    * the maintenance contract); the appended batch stays a constant
    * 500 vectors at every tier. Claimed shape: the append leg flat
    * across tiers, the rebuild leg growing mult×; the growing gap is
    * the measured value of incremental maintenance (VERDICT r11 #5's
    * "work ∝ batch" made a number). IVFPQ's cell-partitioned layout is
    * probed the same way. */
  def pqAppendScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ivf, Pq}
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val books = Pq.trainCodebooks(base, 64)
    val cents = Ivf.trainCentroids(base)
    val batch = base.limit(500)
      .select((col("vec_id") + lit(1000000000L)).as("vec_id"),
        col("embedding"), col("label"))
    mults.foreach { mult =>
      val corpus = base.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("vec_id") * mult + col("rep")).as("vec_id"),
          col("embedding"), col("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft-pqapp")
      try {
        def time(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          println(f"[pqappend] $label @ $n vectors: " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        val flat = tmp.resolve("pq_codes").toString
        time("flat build (corpus)") {
          Pq.appendCodes(corpus, flat, books)
        }
        time("flat append (500-vector batch)") {
          Pq.appendCodes(batch, flat, books)
        }
        val clustered = tmp.resolve("ivfpq_codes").toString
        time("ivfpq build (corpus)") {
          Pq.writeCodesClustered(corpus, clustered, cents, books)
        }
        time("ivfpq append (500-vector batch)") {
          Pq.appendCodesClustered(batch, clustered, cents, books)
        }
      } finally {
        corpus.unpersist()
        import scala.sys.process._
        Seq("rm", "-rf", tmp.toString).!
        ()
      }
    }
    spark.stop()
  }

  /** Erasure-cost probe: does `forgetKeysTable`'s cost follow the
    * SUBJECT'S partitions or the corpus? Corpus scales OUT in
    * partitions (every tier replicates the sf0.1 documents into
    * 20×mult sources) while the clustered-subject backlog stays pinned
    * to ONE partition of constant size — so the claimed shape is
    * near-flat clustered-erasure time as rows and partitions grow
    * mult×, against a scattered backlog (one subject per partition →
    * the majority dispatch) whose one-parallel-full-rewrite cost grows
    * with the corpus. The gap between the two legs at each tier is the
    * measured value of partition pruning. */
  def forgetScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Forget
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    mults.foreach { mult =>
      val corpus = base.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("doc_id") * mult + col("rep")).as("doc_id"),
          col("text"), col("lang"),
          concat(col("source"), lit("_r"), col("rep").cast("string"))
            .as("source"),
          col("n_chars"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-forget-probe")
      try {
        val tbl = tmp.resolve("documents").toString
        corpus.write.mode("overwrite").partitionBy("source").parquet(tbl)
        val rows = spark.read.option("basePath", tbl).parquet(tbl).count()
        val parts = 20 * mult
        def time(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          println(f"[forget] $label @ $rows rows / $parts partitions: " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        // clustered: the whole backlog lives in src0_r0 — constant size
        // at every tier
        val clustered = base.filter(col("source") === "src0")
          .select((col("doc_id") * mult).as("doc_id"))
        time("clustered (1 partition)") {
          Forget.forgetKeysTable(spark, tbl, Seq("source"), "doc_id",
            clustered).collect()
        }
        // scattered: one subject in every partition → majority dispatch
        // (runs second, over the already-clustered-erased table: its
        // subjects are disjoint from the clustered backlog's partitions'
        // loss except src0_r0, and the dispatch only needs >half hit)
        val scattered = base.groupBy("source")
          .agg(max(col("doc_id")).as("doc_id")).select(col("doc_id"))
          .crossJoin(spark.range(mult).toDF("rep"))
          .select((col("doc_id") * mult + col("rep")).as("doc_id"))
        time("scattered (every partition)") {
          Forget.forgetKeysTable(spark, tbl, Seq("source"), "doc_id",
            scattered).collect()
        }
      } finally {
        import scala.sys.process._
        Seq("rm", "-rf", tmp.toString).!
        ()
      }
    }
    spark.stop()
  }

  def bucketQ3(): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-bucketq3-wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[bucketq3] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (round <- 1 to 3) {
      timed(s"plain q3 (r$round)")(
        graft.operators.Tpch.q3ShippingPriority(spark, dir).collect())
      var q: org.apache.spark.sql.DataFrame = null
      timed(s"layout build + q3 (r$round)") {
        q = graft.operators.Scale.q3Bucketed(spark, dir); q.collect()
      }
      timed(s"bucketed q3, layout amortized (r$round)")(
        graft.operators.Tpch.q3On(spark.table("b3_lineitem"),
          spark.table("b3_orders"),
          Tables.customer(spark, dir)).collect())
    }
    spark.stop()
  }

  /** Entity-resolution scale probe: replicate sf0.1's 15k customers
    * `mult`× with the replica folded into the BLOCK (replicas never
    * block together, so true pairs grow linearly by the same argument
    * as corpusScale's salted shingles — growth beyond linear would be
    * the deletion-neighborhood key machinery, not the fixture). The
    * empirical backing for entity_edit2_pairs' "linear in rows with a
    * ~len²/2 keys-per-row constant" claim (VERDICT r10 watch item).
    * `sbt "runMain graft.Probe entity 7 21 67"` ≈ 105k / 315k / 1M
    * rows. */
  def entityScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val base = Tables.customer(spark, "/root/testdata/sf0.1")
    mults.foreach { mult =>
      val cust = base
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("c_custkey") * mult + col("rep")).as("c_custkey"),
          col("c_name"),
          concat(col("c_nationkey").cast("string"), lit("_"),
            col("rep").cast("string")).as("blk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = cust.count()
      for (maxEdit <- Seq(1, 2)) {
        val t0 = System.nanoTime()
        drain(graft.operators.Entity.editPairs(cust, "c_custkey", "c_name",
          maxEdit = maxEdit, blockCol = Some("blk")))
        println(f"[entity] edit$maxEdit pairs @ $n rows: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      cust.unpersist()
    }
    spark.stop()
  }

  /** Graph-family probe (VERDICT r12 item 3): measure, not argue, the
    * scaling of `triangleCounts` / `pageRank` / `bfsHops` by growing
    * the graph and fitting ln(time) vs ln(m).
    *
    * Two growth modes, matched to each claim's stress case:
    * - **Triangles**: replicate CUSTOMERS inside each (part, supplier)
    *   co-purchase group — group sizes grow `mult`×, so the projected
    *   edge count grows ~mult² and the groups densify toward cliques,
    *   exactly the regime where naive wedge enumeration blows up
    *   quadratically on hubs and the degree-ordered bound O(m^1.5) is
    *   tight (a disjoint-copy replication would only ever measure
    *   linear machinery). Expected fit: exponent ≤ 1.5 in m.
    * - **PageRank / BFS**: replicate customers of the bipartite
    *   purchase graph — m grows mult× while supplier hubs' degrees grow
    *   mult× (hub-skew stress). Both are rounds × (join + partial agg),
    *   so the expected fit is ~linear in m.
    *
    * `sbt "runMain graft.Probe graph 1 2 3"`; one measured run per op
    * per tier (tiers are compared for SCALING, not absolute speed). */
  def graphScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def fit(pts: Seq[(Long, Double)]): Double = {
      // least-squares slope of ln t on ln m
      val xs = pts.map(p => math.log(p._1.toDouble))
      val ys = pts.map(p => math.log(p._2))
      val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val den = xs.map(x => (x - mx) * (x - mx)).sum
      num / den
    }
    val dir = "/root/testdata/sf0.1"
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val cp0 = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"),
        col("l_suppkey").as("s"))
      .distinct()
    val tri = mults.map { mult =>
      val cp = cp0.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("c") * mult + col("rep")).as("c"), col("p"), col("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cp.count()
      val edges = cp.as("a").join(cp.as("b"),
          col("a.p") === col("b.p") && col("a.s") === col("b.s")
            && col("a.c") < col("b.c"))
        .select(col("a.c").as("u"), col("b.c").as("v")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = edges.count()
      val t0 = System.nanoTime()
      drain(graft.operators.Graph.triangleCounts(edges))
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[graph] triangles @ mult=$mult m=$m edges: $t%.2f s")
      edges.unpersist(); cp.unpersist()
      (m, t)
    }
    println(f"[graph] triangles fitted exponent vs m: ${fit(tri)}%.2f (claim <= 1.5)")
    val pe0 = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    val (pr, bf) = mults.map { mult =>
      val pairs = pe0.crossJoin(spark.range(mult).toDF("rep"))
        .select(((col("c") * mult + col("rep")) * 2).as("cust"),
          (col("s") * 2 + 1).as("supp"))
      val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
        .union(pairs.select(col("supp").as("src"), col("cust").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = edges.count()
      var t0 = System.nanoTime()
      drain(graft.operators.Graph.pageRank(edges))
      val tp = (System.nanoTime() - t0) / 1e9
      println(f"[graph] pagerank @ mult=$mult m=$m edges: $tp%.2f s")
      val sources = Tables.supplier(spark, dir)
        .filter(col("s_nationkey") === graft.operators.Graph.BfsSourceNation)
        .select((col("s_suppkey") * 2 + 1).as("node"))
        .join(edges.select(col("src").as("node")).distinct(), Seq("node"),
          "left_semi")
      t0 = System.nanoTime()
      drain(graft.operators.Graph.bfsHops(edges, sources,
        graft.operators.Graph.BfsMaxHops))
      val tb = (System.nanoTime() - t0) / 1e9
      println(f"[graph] bfs @ mult=$mult m=$m edges: $tb%.2f s")
      edges.unpersist()
      ((m, tp), (m, tb))
    }.unzip
    println(f"[graph] pagerank fitted exponent vs m: ${fit(pr)}%.2f (claim ~1)")
    println(f"[graph] bfs fitted exponent vs m: ${fit(bf)}%.2f (claim ~1)")
    spark.stop()
  }

  /** Times the hot-group window family both ways at `mult`× sf0.1 —
    * the empirical side of the Scale.fewGroups dial (VERDICT r9):
    * weighted quartiles partition on a THREE-value key and boxplot on a
    * five-value key, so the plain window path degenerates to 3–5 giant
    * single-task sorts while the grouped prefix-sum path stays bounded
    * by range partitions. */
  def hotGroupVariants(mult: Int): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.lineitem(spark, dir)
      .crossJoin(spark.range(mult).toDF("rep"))
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"),
        (col("l_orderkey") * mult + col("rep")).as("l_orderkey"),
        col("l_linenumber"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[hotgroup] lineitem rows: ${li.count()} (3 groups)")
    val ev = Tables.events(spark, dir)
      .crossJoin(spark.range(mult).toDF("rep"))
      .select(col("event_type"), col("value"),
        (col("event_id") * mult + col("rep")).as("event_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[hotgroup] events rows: ${ev.count()}")
    for (round <- 1 to 2; grouped <- Seq(true, false)) {
      val label = if (grouped) "grouped-prefix-sum" else "plain-window"
      var t0 = System.nanoTime()
      drain(graft.operators.WeightedMedian.weightedQuartiles(li, Some(grouped)))
      println(f"[hotgroup] weighted_quartiles $label (r$round): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      drain(graft.operators.Mining.boxplot(ev, Some(grouped)))
      println(f"[hotgroup] boxplot $label (r$round): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  /** Basket-scale probe for item-to-item similarity: replicate sf0.1's
    * order BASKETS `mult`× (items fixed — co-occurrence pairs must then
    * grow linearly with basket count, never baskets²). The empirical
    * backing for mining_item_similarity's "scales with baskets" claim
    * (VERDICT r9 next-round item 4).
    * `sbt "runMain graft.Probe baskets 2 6 20"` ≈ 0.3M/0.95M/3M baskets. */
  def basketScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val base = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
    mults.foreach { mult =>
      val li = base
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("l_orderkey") * mult + col("rep")).as("l_orderkey"),
          col("l_partkey"), col("l_linenumber"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nBaskets = li.select(col("l_orderkey")).distinct().count()
      val t0 = System.nanoTime()
      drain(graft.operators.Reco.itemSimilarity(li))
      println(f"[baskets] item_similarity @ $nBaskets baskets (${li.count()} lines): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      li.unpersist()
    }
    spark.stop()
  }

  /** Regenerate PLANS.md: formatted physical plans of the headline
    * queries against sf0.1. */
  /** Times forced-broadcast vs forced-shuffle PageRank at sf0.1 — the
    * empirical side of the Graph.BroadcastNodeCap dial (SCALE.md r9). */
  def pageRankVariants(): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val edges = graft.operators.Graph.purchaseEdges(
      Tables.orders(spark, dir), Tables.lineitem(spark, dir)).cache()
    edges.count() // materialize once so both variants time the rounds only
    for (mode <- Seq(true, false, true, false)) {
      val t0 = System.nanoTime()
      val n = graft.operators.Graph.pageRank(edges,
        broadcastRanks = Some(mode)).count()
      println(f"[probe] pagerank broadcast=$mode: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n nodes)")
    }
    spark.stop()
  }

  def plansDump(): Unit = {
    sys.props("graft.explain.lineage") = "true"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val sections = Seq(
      "q1_pricing_summary" -> "scan-heavy aggregate",
      "q5_local_supplier" -> "5-way join, all dims broadcast",
      "q4_order_priority" -> "semi join, equi + theta condition",
      "topk_orders" -> "global top-k",
      "silver_clean" -> "pushdown + min_by dedup",
      "range_join_followups" -> "binned interval join",
      "dedup_minhash_lsh" -> "band join candidates",
      "text_winnowing_overlap" -> "row-form winnowing + hot-fp guard",
      "dedup_contamination" -> "split-tagged shingle equi-join, cached sketch",
      "text_top_ngrams" -> "partial-agg count + top-k",
      "text_top_terms" -> "broadcast df join + windowed rank",
      "corpus_split" -> "map-only hash bucketing",
      "curation_seq_pack" -> "single shard-window shuffle packing",
      "curation_filter_funnel" -> "scan-fused multi-signal quality funnel",
      "q18_large_orders" -> "single-scan HAVING: qualifying agg reused as the output measure",
      // NB: lineage mode shows these UNCACHED (withCached's cache is
      // released before explain) — execution materializes the shared
      // leg once; the dump is for join-shape inspection only
      "q21_waiting_suppliers" -> "EXISTS/NOT-EXISTS hash semi/anti (lineage view; shared leg cached at execution)",
      "q11_important_stock" -> "scalar-fraction HAVING via 1-row broadcast (lineage view; per-part agg cached at execution)",
      "dedup_passages" -> "linear passage dedup: segment window + doc reassembly, no pair joins",
      "bm25_topk" -> "term-filtered tf + broadcast df + 1-row corpus scalar + top-k",
      "scd2_apply" -> "incremental SCD2 merge: closed rows pass through, batch keys re-collapse",
      "bloom_semi_join" -> "bloom might_contain pushed to the big-side scan before the shuffle",
      "dedup_incremental" -> "batch-vs-corpus band candidates (lineage view; shingled legs cached at execution)",
      "sim_ivfpq_topk" -> "IVF cell-pruned PQ sweep: codes+cell from ONE encode scan (no self-join), per-query ADC lookup table, exact re-rank",
      "sim_ivf_adaptive_topk" -> "score-gap adaptive probe breadth over the IVF cells",
      "curation_chunks" -> "map-only sliding-window chunking: sequence+slice behind projection boundaries, zero shuffles",
      "sim_quantized_topk" -> "int8-reconstructed cosine top-k: map-only dequantize, broadcast queries, per-query window",
      "sim_int8_topk" -> "code-domain serving top-k: binary int8 codes + precomputed norms, exact integer dots, no float vectors in the scan",
      "curation_source_cap" -> "per-source quota: one shuffle on source, rank-limited window (salted two-phase twin for hot domains)",
      "curation_budget_select" -> "distributed prefix sum: range partition on priority, broadcast per-partition offsets, per-partition running window — no global single-task sort",
      "curation_source_mix" -> "mixture rebalance: control-plane count collect → broadcast caps join → per-source rank window, exact floor(T×share) per source",
      "curation_source_mix_tokens" -> "token-weighted mixture: cached token projection → control-plane totals → per-source running-sum window against broadcast token caps",
      "multimodal_decode" -> "real-codec round trip: map-only mapPartitions scan (PNG+WAV decode per row), zero shuffles before the presentation sort",
      "classify_lang_nb" -> "broadcast-model NB prediction: explode → broadcast joins → per-doc integer hash-agg → one window on doc_id",
      "sim_pq_serving_topk" -> "persisted-code PQ serving: 32×-compressed code scan + broadcast ADC LUT, no vector data read",
      "sim_ivfpq_serving_topk" -> "persisted IVFPQ serving: probe-cell IN filter partition-prunes the cell-laid code table, ADC only probed cells",
      "tokenize_bpe" -> "trained-BPE tokenize: map-only native expression (model as plan reference object), zero shuffles before the presentation sort",
      "cdc_apply_state" -> "incremental CDC merge: broadcast-semi batch-key restriction + anti pass-through, merge window over batch-sized input",
      "bm25_serving_topk" -> "inverted-index serving: term filter PUSHED to the postings scan (range-laid-out files skip on min/max), no document text read",
      "quality_expectations" -> "one-pass contract: every rule metric in a single partial+final aggregate over one scan, exploded to the report",
      "curation_weighted_sample" -> "weighted Bernoulli sample: integer hash compare in the scan projection, map-only, zero shuffles",
      "monitor_value_drift" -> "drift histogram: conditional partial agg to ≤10 groups, dense spine left join, 1-row totals broadcast",
      "text_html_extract" -> "crawl text extraction: zone-drop + tag-flatten + entity-decode regex pipeline fused into the scan projection, map-only",
      "curation_domain_reputation" -> "two-level admission: funnel signals once per doc, #sources control-plane agg, broadcast reputation rejoin",
      "graph_pagerank" -> "fixed-point PageRank: cached bidirectional edges, broadcast ranks per round, dst-keyed partial-agg inflow (lineage view; rounds checkpoint at execution)",
      "entity_golden_record" -> "golden records: block-keyed FastSS candidates -> per-block union-find (one shuffle, no fixpoint) -> survivorship hash agg",
      "graph_triangles" -> "degree-ordered wedge join + closure semi-join on the sparse co-purchase projection",
      "plan_join_cardinality" -> "optimizer stats: per-key count aggregates, 1-row scalar crossJoins, top-H heavy-hitter probe — the join itself never materializes",
      "graph_bfs_reach" -> "bounded BFS: broadcast frontier joins + anti-join vs settled, per-level checkpoints (lineage view)",
      "embed_covariance" -> "int8-code covariance: ONE partial+final aggregate (153 moments), driver-composed pair melt, zero data shuffles",
      "cluster_kmeans" -> "k-means assignment: fused argmax kernel in the scan, ≤16-row sizes broadcast back",
      "dedup_substring_spans" -> "suffix-dedup granularity: stride-1 window first-occurrence + covered-position left join + doc reassembly, linear, no pair joins",
      "stats_moments_merge" -> "mergeable moments: shard partial agg → addition merge → one fixed-order finalize expression",
      "serving_rfm" -> "RFM quintiles: one custkey agg + three ntile windows (scale twin rfmScalable: distributed rank + closed-form ntile, spec-pinned equal)",
      "retrieval_phrase" -> "positional phrase search: per-term-filtered postings equi-joined on (doc, pos−i) start",
      "scd2_pit_join" -> "PIT join via union-ordering: dims+facts in ONE key shuffle, running last(ignoreNulls) — no inequality join",
      "sim_rp_topk" -> "JL random projection: 16 plane dots in the scan, coarse top-20 window, exact cosine re-rank sharing the query partitioning",
      "embed_pca_project" -> "trained PCA apply: 8 ordered-fold dots against literal components, map-only, zero shuffles",
      "text_rake_keywords" -> "RAKE: run-assembly windows, vocabulary partial-agg broadcast back, phrase reassembly, TakeOrdered(25)",
      "agg_quantiles_scalable" -> "exact quantiles, no global sort: range partition + broadcast offsets + per-partition rank + target-rank broadcast join",
      "curation_cdc_chunks" -> "content-defined chunking: two reused (doc,pos) windows + one chunk-text first-occurrence shuffle",
      "multimodal_ahash_pairs" -> "banded image near-dup: 4×16-bit band self-join on the hash table + exact popcount verify (payloads never join)",
      "mining_assoc_rules" -> "market basket: basket dedup FIRST, then basket-key self-join (≤|types|² fan-out per basket) + broadcast type counts",
      "serving_user_growth" -> "running distinct for free: user-grain min-agg → day-grain news → ≤#days cumulative window",
      "quality_referential" -> "FK audit: per-relation left-anti orphan scans, dimension parents broadcast, 1-row partials unioned",
      "curation_dataset_card" -> "dataset card: one corpus fold + fingerprint dup scan, control-plane combine to a single row",
      "curation_dsir_select" -> "DSIR selection: hashed-bucket counts → ≤512-row broadcast weight join, doc-keyed partial agg, distributed global rank",
      "stats_corr_regression" -> "paired sufficient statistics: one scan to 3 groups × 6 exact longs, fixed-order finalize",
      "agg_pivot_priority" -> "pinned pivot: partial+final hash agg to the year×priority grid, no discovery pass",
      "anomaly_cusum_hourly" -> "CUSUM: corpus → per-(type,hour) partial-agg counts, calendar-bounded sequential fold per series",
      "regress_order_total" -> "trained OLS apply: order-level agg + three integer multiplies, model as literals",
      "serving_dpp_revenue" -> "dynamic partition pruning: runtime subquery on the partition column feeds the fact scan; only qualifying year partitions read",
      "retrieval_hybrid_rrf" -> "RRF fusion: two ≤k-row leg pools, constant-size rank windows, pool×pool full-outer fuse",
      "asof_forward_next_order" -> "forward as-of: one key shuffle, reversed union-ordering window, no inequality join",
      "agg_weighted_median" -> "weighted quartiles: running integer weight window + crossing-row conditional agg, no division",
      "sim_mmr_rerank" -> "MMR: declarative pool + pair-cosine joins, bounded per-query greedy in mapGroups",
      "sketch_stats" -> "oracle-able sketches: KMV bottom-k distinct + mergeable equi-width histogram quantiles, every leg bounded-memory",
      "agg_grouped_quantiles" -> "grouped exact percentiles: deterministic leading-column buckets, partial-agg offsets, ONE full shuffle + per-cell scan (globalRankGrouped)",
      "entity_edit2_pairs" -> "distance-2 FastSS: k=2 deletion-neighborhood keys (~len^2/2 per name), nation-blocked candidates, exact levenshtein verify",
      "stats_gini_by_nation" -> "per-nation Gini: decimal-cents agg, hotGroups-dialed ranks, one integer finalize",
      "curation_dedup_curve" -> "threshold sweep: ONE counted candidate pass, provable hot-bound pre-filter, suffix-histogram grading (no threshold fan-out)",
      "curation_exact_split" -> "exact-proportion split: hash-ranked per source, integer cross-multiplied boundaries, audit-grain agg",
      "classify_pr_curve" -> "PR operating points: domain-bounded score tallies x broadcast thresholds, conditional partial agg",
      "stats_trimmed_mean" -> "trimmed mean: groupRanks dial + integer tail trim + hash agg",
      "stats_mad_by_flag" -> "MAD: cached pass-1 ranks feed both the median and the deviation pass — one scan, two rank passes",
      "sketch_kmv_rolling_distinct" -> "rolling distinct from sketches: range join over signature rows only, never events",
      "serving_topk_with_other" -> "leaderboard + OTHER: one cached spend agg feeds rank-limited top and residual hash agg",
      "plan_group_skew" -> "group-skew report: one partial agg per candidate key, 1-row unions",
      "sim_sparse_topk" -> "sparse lexical top-k: one checkpointed postings projection, integer sh_id join keys, decimal dots, legs carry norms, rank-limited window",
      "sim_sparse_serving_topk" -> "persisted inverted-index serving: broadcast query postings vs the index scan — no re-shingle, no re-weight per query",
      "corpus_split_leakage_safe" -> "cluster-keyed split: label propagation over near-dup pairs, corpus LEFT join, map-only rep hash",
      "text_novelty_vs_train" -> "novelty vs train vocabulary: one left-anti shingle join + per-doc count, settled index side",
      "forget_audit" -> "erasure sweep audit: registry-driven derived-artifact rewrites, partition-surgical or one parallel full rewrite by subject spread",
      "tpch_q18_bucketed" -> "Q18 on the shared bucketed facts: per-order agg rides HashPartitioning(orderkey) from the scan — zero orderkey exchange",
      "curation_mix_temperature" -> "alpha=1/2 temperature rebalance: control-plane isqrt quotas broadcast back, groupRanks-dialed hash-rank selection",
      "curation_cluster_balance" -> "topic balance: fused cell-argmax in the scan, per-cell cap via groupRanks dial, sizes carried as group totals",
      "text_fertility_by_lang" -> "fertility table: codegen'd token/word counts fused into one scan, languages-sized partial agg, integer ratio surrogates",
      "curation_mix_temperature_tokens" -> "token-space temperature mix: cached token projection, control-plane isqrt quotas, running sums on the hotGroups dial, greedy boundary",
      "curation_quality_curve" -> "lm-score keep-curve: one trigram pass, 25-milli band histogram, single suffix-sum window — no per-threshold fan-out",
      "multimodal_frame_sample" -> "animated-GIF frame sampling: map-only mapPartitions flatMap, real multi-frame codec, zero shuffles before the presentation sort",
      "dedup_semantic_contamination" -> "cross-split LSH probe join (train x eval only), fused cosine kernel, best-neighbor window bounded by block collisions",
      "quality_k_anonymity" -> "QI equivalence classes: one partial+final hash agg at QI-tuple grain, broadcast dim join",
      "quality_fd_check" -> "FD audit: per-candidate determinant-grain aggregate, 1-row summaries unioned",
      "quality_dup_rate_daily" -> "dup-rate series: tuple-grain partial agg (map-side reduction) then day rollup",
      "text_source_divergence" -> "TV divergence: one cached word stream, vocab-keyed inner join, absent-word mass in closed form, decimal(38,0) products",
      "text_vocab_overlap" -> "vocab Jaccard map: word-keyed self-join on distinct (source, word), sparse pair table, broadcast sizes",
      "anomaly_burstiness" -> "Fano factor: day-grain partial agg then #types rollup, exact integer moments",
      "stats_user_concentration" -> "whale share: per-user counts reduce BEFORE the rank, 1-row totals broadcast")
    val sb = new StringBuilder
    sb.append("# PLANS - formatted physical plans of headline queries (sf0.1, local[32])\n\n")
    sb.append("Generated by `sbt \"runMain graft.Probe plans\"` against HEAD; regenerate after plan-shape changes.\n")
    sb.append("What to look for: `PushedFilters`/`ReadSchema` on scans (pushdown + pruning),\n")
    sb.append("`BroadcastHashJoin` on dim legs, partial+final `HashAggregate` pairs,\n")
    sb.append("`TakeOrderedAndProject` for top-k, `WholeStageCodegen` spans covering the hot path.\n")
    sections.foreach { case (name, desc) =>
      val df = SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name ($desc)\n\n```\n")
      // serialized-sketch literals (bloom bits) are hundreds of KB of hex
      // — elide them; the plan SHAPE is what this file documents
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).trim
        .replaceAll("0x[0-9A-F]{256,}", "0x<sketch-bits elided>"))
      sb.append("\n```\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/root/repo/PLANS.md"),
      sb.toString.getBytes("UTF-8"))
    println("PLANS.md written")
    spark.stop()
  }

  /** Drive the streaming→JDBC gold leg with a replay. */
  def streamGoldDrive(): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("sg-landing").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val url = s"jdbc:derby:memory:sg${System.nanoTime()};create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      """CREATE TABLE gold_events ("event_id" BIGINT, "ts" TIMESTAMP,
        |"user_id" BIGINT, "event_type" VARCHAR(32), "value" DOUBLE,
        |"props" VARCHAR(256))""".stripMargin)
    c.close()
    def run(ck: String): Unit = {
      val q = graft.streaming.StreamingOps.streamToGold(
        Tables.eventsStream(spark, dir), url, "gold_events",
        Seq("user_id", "ts"), Files.createTempDirectory(ck).toString)
      q.awaitTermination()
      println("GOLD_ROWS=" + graft.sinks.JdbcSink
        .readTable(spark, url, "gold_events").count())
    }
    run("ck1"); run("ck2") // second run = replay from a fresh checkpoint
    spark.stop()
  }

  /** Drive Pipeline.run end-to-end into a temp warehouse + Derby. */
  def pipelineDrive(): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val wh = Files.createTempDirectory("graft-drive").toString
    Files.createDirectories(Paths.get(s"$wh/landing"))
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$wh/landing/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val url = s"jdbc:derby:memory:drive${System.nanoTime()};create=true"
    val r = Pipeline.run(spark, Pipeline.Config(sf, wh, Some(url)))
    println(s"REPORT=$r")
    spark.stop()
  }

  /** Drive the weather Silver stage end-to-end on ad-hoc bronze rows. */
  def weatherDrive(): Unit = {
    import org.apache.spark.sql.Row
    import graft.operators.WeatherSilver
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Seq(
      Row("Paris", "FR", "2024-01-06T12:00:00", 20.0, 19.0, 18.0, 22.0,
        1013: Integer, 65: Integer, 10000: Integer, 5.5, 180: Integer, 20: Integer,
        "Clear", "clear sky", "2024-01-06T07:00:00", "2024-01-06T17:00:00",
        "2024-01-06T12:00:00", 0: Integer, 123L: java.lang.Long, "2024-01-06T12:00:00"),
      Row("Oslo", "NO", "2024-01-06T23:00:00", -120.0, null, null, null,
        null, null, null, null, null, null, null, null,
        "2024-01-06T09:00:00", "2024-01-06T15:00:00",
        "2024-01-06T23:00:00", 0: Integer, 125L: java.lang.Long, "2024-01-06T23:00:00"))
    val bronze = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), WeatherSilver.bronzeSchema)
    val out = WeatherSilver.hourlyAgg(WeatherSilver.enrich(WeatherSilver.clean(bronze)))
    out.show(5, truncate = false)
    println("WEATHER_ROWS=" + out.count())
    spark.stop()
  }

  /** Skyline tiers: rows AND cost levels scale with mult (prices get a
    * per-replica epsilon, so the level table grows too — the prefix
    * machinery's actual operand). Pins the claim that the frontier is
    * one hash agg + one range shuffle of LEVELS + partition-local
    * windows: fitted exponent ~1 in rows. */
  def frontierScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.part(spark, "/root/testdata/sf0.1")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    mults.foreach { mult =>
      val pts = base.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("p_partkey") * mult + col("rep")).as("p_partkey"),
          (col("p_retailprice") + col("rep") * 0.001).as("p_retailprice"),
          col("p_size"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = pts.count()
      val t0 = System.nanoTime()
      val f = graft.operators.Skyline
        .frontier2d(pts, "p_partkey", "p_retailprice", "p_size").count()
      println(f"[frontier] $n%d rows (x$mult): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, frontier=$f%d")
      pts.unpersist()
    }
    spark.stop()
  }

  /** Jaro-Winkler tiers along BOTH cost axes of the two-level design:
    * vocab tier (names get per-replica suffixes -> distinct-name count
    * scales, scoring work ~ vocab^2 per block) and row tier (same 64
    * names, rows scale -> scoring constant, expansion ~ output). */
  def jwScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Entity
    val base = Tables.part(spark, "/root/testdata/sf0.1")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
    mults.foreach { mult =>
      // vocab axis: distinct names x mult, rows x mult
      val vocab = base.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("p_partkey") * mult + col("rep")).as("p_partkey"),
          concat(col("p_name"), lit(" r"), col("rep")).as("p_name"),
          col("p_brand"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nv = vocab.count()
      var t0 = System.nanoTime()
      val pv = Entity.jaroWinklerPairs(vocab, "p_partkey", "p_name", "p_brand")
        .count()
      println(f"[jw] vocab axis: $nv%d rows, ~${64 * mult}%d names (x$mult): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, pairs=$pv%d")
      vocab.unpersist()
      // row axis: same names, rows x mult (output-dominated)
      val rows = base.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("p_partkey") * mult + col("rep")).as("p_partkey"),
          col("p_name"), col("p_brand"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nr = rows.count()
      t0 = System.nanoTime()
      val pr = Entity.jaroWinklerPairs(rows, "p_partkey", "p_name", "p_brand")
        .count()
      println(f"[jw] row axis:   $nr%d rows, 64 names (x$mult): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, pairs=$pr%d")
      rows.unpersist()
    }
    spark.stop()
  }

  /** Cost attribution for the layout-preserving whole-dir packed
    * rewrite (VERDICT r14: forget_audit grew 1.48x without a written
    * justification). Builds a writePacked layout, scatters subjects so
    * >half the files are affected (forcing the whole-dir branch), and
    * times the sweep with the range-partition+sort writer (the ADVICE
    * r13 correctness fix) vs the unconstrained writer it replaced.
    * Each timing rebuilds the layout fresh — the sweep mutates it. */
  def packRewriteScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Curation, Forget}
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    mults.foreach { mult =>
      val corpus = base.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("doc_id") * mult + col("rep")).as("doc_id"),
          col("text"), col("source"))
      // every 20th doc is a subject: uniformly scattered across packs,
      // so the affected-file majority dispatch takes the whole-dir path
      val subjects = corpus.select(col("doc_id"))
        .filter(col("doc_id") % 20 === 0)
      val tmp = java.nio.file.Files.createTempDirectory("graft-packrw-probe")
      try {
        val path = tmp.resolve("packed").toString
        def build(): Long = {
          Curation.writePacked(corpus, capacity = 2048, nShards = 8, path)
          spark.read.parquet(path).count()
        }
        def time(label: String, unconstrained: Boolean): Unit = {
          val rows = build()
          val t0 = System.nanoTime()
          val (_, _, removed) = Forget.forgetPackedTotalsProbe(spark, path,
            subjects, unconstrainedWrite = unconstrained)
          println(f"[packrw] $label @ $rows%d rows (x$mult): " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s, removed=$removed%d")
        }
        time("unconstrained write  ", unconstrained = true)
        time("layout-preserving    ", unconstrained = false)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    spark.stop()
  }

  /** All-distinct worst case for the level-table operators (VERDICT r14
    * item 8): skyline and KS collapse input to DISTINCT-value levels
    * assuming levels ≪ rows; with every value unique (continuous
    * measures) levels = rows and the range shuffle carries the full
    * table. Still partition-parallel by design — these tiers pin that
    * the exponent stays ~linear when the level table is data-sized.
    * Skyline gains are hashed (staircase frontier ~ log n) so output
    * size never masks the level-path cost. */
  def distinctScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val BaseRows = 500000L
    mults.foreach { mult =>
      val n = BaseRows * mult
      val rows = spark.range(n).select(col("id"),
          col("id").cast("double").as("v"),
          (col("id") * 2654435761L % 1000003L).as("gain"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rows.count()
      var t0 = System.nanoTime()
      val ks = graft.operators.Ks
        .ksDistance(rows, "v", col("id") % 2 === 0, nPartitions = 32)
        .collect()
      println(f"[distinct] ks      @ $n%d unique levels (x$mult): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, d_num=${ks.head.getLong(2)}%d")
      t0 = System.nanoTime()
      val fr = graft.operators.Skyline
        .frontier2d(rows, "id", "v", "gain", nPartitions = 32).count()
      println(f"[distinct] skyline @ $n%d unique levels (x$mult): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, frontier=$fr%d")
      rows.unpersist()
    }
    spark.stop()
  }

  /** Layout win for the HITS half-steps (VERDICT r14 item 4): time the
    * same hitsOn core over (a) the plain parquet edge artifact and (b)
    * the dual src/dst-bucketed twins, at replicated-edge tiers. At
    * fixture scale the query is checkpoint-overhead-bound; these tiers
    * show where the exchange elimination starts paying. */
  /** Does the ungrouped dial's HOT path actually WIN where it engages
    * (r16 follow-through on the [[graft.operators.Scale.ungroupedDial]]
    * wiring — forced-switch specs prove result identity; this probe
    * measures the crossover the 8M-row threshold encodes)? Inflate the
    * sf0.1 orders fact giving every replicated order a UNIQUE custkey
    * (orderkey-derived — custkey-derived shifting would scale entities
    * by only the 15k distinct custkeys, ~10× under the claim; review
    * r16), so the CUSTOMER ENTITY COUNT equals the order count and
    * scales with mult (×64 = 9.6M entities — past the dial threshold).
    * Then time [[graft.operators.Rfm]]'s plain three-ntile-window form
    * (three single-task sorts of the whole rollup) against the forced
    * distributed form on the same rollup. One measured run per form
    * per tier after a warm run — tiers are compared for the CROSSOVER,
    * not absolute speed. */
  def ungroupedScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Rfm
    val base = Tables.orders(spark, "/root/testdata/sf0.1")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    mults.foreach { mult =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-rfm-probe")
      try {
        base.crossJoin(spark.range(mult).toDF("rep"))
          .select((col("o_orderkey") * mult + col("rep")).as("o_custkey"),
            col("o_orderdate"), col("o_totalprice"))
          .write.mode("overwrite").parquet(tmp.toString)
        val orders = spark.read.parquet(tmp.toString)
        val entities = orders.select(col("o_custkey")).distinct().count()
        def time(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          println(f"[rfm] $label @ $entities%d entities (x$mult): " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        Rfm.rfm(orders, Some(false)).write.format("noop")
          .mode("overwrite").save()
        time("plain 3x ntile  ") {
          Rfm.rfm(orders, Some(false)).write.format("noop")
            .mode("overwrite").save()
        }
        Rfm.rfm(orders, Some(true)).write.format("noop")
          .mode("overwrite").save()
        time("distributed rank") {
          Rfm.rfm(orders, Some(true)).write.format("noop")
            .mode("overwrite").save()
        }
        time("dial (None)     ") {
          Rfm.rfm(orders).write.format("noop").mode("overwrite").save()
        }
      } finally {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    spark.stop()
  }

  /** Degenerate-tier probe for `curation_length_batching` (VERDICT r16
    * #6): real web corpora are NOT uniform across ⌊log₂ tokens⌋
    * buckets — one 2^k bucket holds most documents. Two planted
    * distributions per tier, each written to parquet and re-read so
    * the dial sees a scan: (a) `hot90` — 90% of docs in the [1024,2048)
    * bucket, the rest spread over ~10 buckets; (b) `samelen` — every
    * doc exactly 1500 tokens, the fully-degenerate single-(bucket,
    * token-value) cell where range-bucketing on the leading order
    * column cannot split ties. Measures forced plain vs forced hot vs
    * the dial's own choice on [[graft.operators.Batching.batchesOn]].
    * Tiers are compared for the crossover and for whether the
    * degenerate cell collapses the hot path to one task. */
  def lengthBatchScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Batching
    import graft.functions.TextFns
    mults.foreach { mult =>
      val n = 150000L * mult
      val tmp = java.nio.file.Files.createTempDirectory("graft-lb-probe")
      try {
        for ((shape, tokensExpr) <- Seq(
          "hot90" -> when(pmod(col("id"), lit(10)) < 9,
            lit(1024L) + pmod(col("id"), lit(1024)))
            .otherwise(lit(1L) + pmod(col("id"), lit(1000))),
          "samelen" -> lit(1500L))) {
          val dir = s"$tmp/$shape"
          spark.range(n).select(
              concat(lit("d"), col("id")).as("doc_id"),
              tokensExpr.cast("long").as("tokens"))
            .withColumn("bucket",
              TextFns.log2Floor(greatest(col("tokens"), lit(1L))).cast("long"))
            .write.mode("overwrite").parquet(dir)
          val base = spark.read.parquet(dir)
          def time(label: String)(f: => Unit): Unit = {
            val t0 = System.nanoTime(); f
            println(f"[lengthbatch] $shape/$label @ $n%d docs (x$mult): " +
              f"${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
          for ((label, ov) <- Seq("plain window" -> Some(false),
              "grouped hot  " -> Some(true), "dial (None)  " -> None)) {
            Batching.batchesOn(base, ov).write.format("noop")
              .mode("overwrite").save()
            time(label) {
              Batching.batchesOn(base, ov).write.format("noop")
                .mode("overwrite").save()
            }
          }
        }
      } finally {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    spark.stop()
  }

  /** Cost of the size-aware dial's pre-checks vs input size (VERDICT
    * r15 item 6): ~20 operators now ride [[graft.operators.Scale
    * .hotGroups]], whose 1% sampled pre-check is itself a real job at
    * corpus scale — this tier measures, per input size, (a) the bare
    * count() a scan-only input answers from parquet footer metadata,
    * (b) the 1% sampled pre-check, (c) the exact group-max confirm,
    * and (d) the full dial — the empirical basis for the r16 rule:
    * scan-only inputs take the footer count FIRST (wired into
    * hotGroups itself), derived inputs keep the caller-provided bound
    * (the Profile.shipLatency pattern) or the sample. */
  def dialCost(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Scale => Sc}
    val src = Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("event_id"), col("event_type"), col("value"))
    mults.foreach { mult =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-dial-probe")
      try {
        src.crossJoin(spark.range(mult).toDF("rep"))
          .select(col("event_id"), col("event_type"), col("value"))
          .write.mode("overwrite").parquet(tmp.toString)
        val df = spark.read.parquet(tmp.toString)
          .select(col("event_id"), col("event_type"), col("value"))
        val n = df.count() // warm file listing + footer cache
        def time(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          println(f"[dial] $label @ $n%d rows (x$mult): " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        time("footer count      ")(df.count())
        time("1pct sample check ") {
          df.sample(withReplacement = false, 0.01, seed = 42)
            .groupBy(col("event_type")).count()
            .agg(max(col("count"))).head()
        }
        time("exact group max   ") {
          df.groupBy(col("event_type")).count()
            .agg(count(lit(1)), max(col("count"))).head()
        }
        time("hotGroups dial    ") {
          println(s"[dial]   -> hot=${Sc.hotGroups(df, Seq("event_type"))}")
        }
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    spark.stop()
  }

  def hitsScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Graph, Scale => Sc}
    val base = spark.read.parquet(
      Graph.directedEdgesArtifactFor(spark, "/root/testdata/sf0.1"))
    mults.foreach { mult =>
      // shift both endpoints so nodes AND edges scale by mult (disjoint
      // replicas: the graph structure per replica is unchanged)
      val edges = base.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("src") * mult + col("rep")).as("src"),
          (col("dst") * mult + col("rep")).as("dst"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-hits-probe")
      try {
        val plainPath = tmp.resolve("plain").toString
        edges.write.mode("overwrite").parquet(plainPath)
        val plain = spark.read.parquet(plainPath)
        // footer-cheap count of the just-written parquet — counting
        // `edges` would re-execute the crossJoin inflation (review r16)
        val n = plain.count()
        // bucket count is a CAPACITY parameter: 8 buckets cap the scan
        // at 8 parallel tasks, which loses past ~10M edges on 32 cores
        // (measured below), while over-bucketing a small table costs
        // pure scheduling overhead. Default mirrors production
        // (bucketedDirectedEdgesFor: ~1M edges/bucket, floor
        // EdgeBuckets, ceiling shuffle.partitions) so the probe runs
        // the SERVING configuration; override to probe other points
        val buckets = sys.env.get("SPARK_GRAFT_HITS_BUCKETS").map(_.toInt)
          .getOrElse(math.max(Graph.EdgeBuckets.toLong, math.min(
            math.max(Graph.EdgeBuckets,
              spark.sessionState.conf.numShufflePartitions).toLong,
            n / 1000000L + 1L)).toInt)
        Sc.writeBucketed(plain, "probe_hits_src", "src", buckets)
        Sc.writeBucketed(plain, "probe_hits_dst", "dst", buckets)
        // the serving query end-to-end (VERDICT r15 item 4): the same
        // broadcast dial qHitsServing takes, plus the top-10 ranking —
        // not just the raw half-step recurrence
        val nNodes = plain.agg(greatest(countDistinct(col("src")),
          countDistinct(col("dst")))).head().getLong(0)
        val bc = nNodes <= Graph.BroadcastNodeCap
        def time(label: String)(f: => Unit): Unit = {
          val t0 = System.nanoTime(); f
          println(f"[hits] $label @ $n%d edges (x$mult, buckets=$buckets, " +
            f"broadcast=$bc): ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        // warm both paths once, then measure
        Graph.hitsTop(Graph.hitsOn(plain, plain, 3, bc)).count()
        time("plain serving   ") {
          Graph.hitsTop(Graph.hitsOn(plain, plain, 3, bc)).count()
        }
        val eS = spark.table("probe_hits_src")
        val eD = spark.table("probe_hits_dst")
        Graph.hitsTop(Graph.hitsOn(eS, eD, 3, bc)).count()
        time("bucketed serving") {
          Graph.hitsTop(Graph.hitsOn(eS, eD, 3, bc)).count()
        }
      } finally {
        spark.sql("DROP TABLE IF EXISTS probe_hits_src")
        spark.sql("DROP TABLE IF EXISTS probe_hits_dst")
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    spark.stop()
  }

  /** Cost of the IVF/PQ rebuild a tripped retrain flag schedules
    * (VERDICT r14 item 3: flag-only is acceptable for the codebooks IF
    * the rebuild path is documented + measured). Both trainers sample
    * a FIXED TrainSample of vectors via a distributed TakeOrdered on
    * xxhash64(embedding), so the k-means itself is constant-cost and
    * the corpus axis should contribute only the hash-order scan —
    * near-flat growth is the claim these tiers pin. Post-erasure input
    * (subject source removed) to match the retrain scenario. */
  def modelRebuildScale(mults: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ivf, Pq}
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val post = emb.join(
      docs.filter(col("source") =!= "src0")
        .select(col("doc_id").as("vec_id")), Seq("vec_id"))
    mults.foreach { mult =>
      val corpus = post.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("vec_id") * mult + col("rep")).as("vec_id"),
          col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      var t0 = System.nanoTime()
      val cents = Ivf.trainCentroids(corpus)
      println(f"[rebuild] ivf centroids  @ $n%d vectors (x$mult): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (${cents.length}%d cells)")
      t0 = System.nanoTime()
      val books = Pq.trainCodebooks(corpus, 64)
      println(f"[rebuild] pq codebooks   @ $n%d vectors (x$mult): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (${books.length}%d subq)")
      corpus.unpersist()
    }
    spark.stop()
  }
}
