package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for operator sub-stages (not part of the
  * harness surface). Usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    if (args.length > 1) spark.conf.set("spark.sql.optimizer.excludedRules", args(1))
    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    time("scan+count")(docs.count())
    time("toks")(docs.select(graft.text.Text.toks(col("text")).as("t"))
      .agg(sum(size(col("t")))).head().getLong(0))
    time("shingleSets")(graft.dedup.Dedup.shingleSets(docs)
      .agg(sum(size(col("shs")))).head().getLong(0))
    time("shingleSets2x")(graft.dedup.Dedup.shingleSets(docs)
      .agg(sum(size(col("shs")))).head().getLong(0))
    val entries = graft.dedup.Dedup.shingleSets(docs)
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle"))
    time("entries")(entries.count())
    time("explode only")(graft.dedup.Dedup.shingleSets(docs)
      .select(col("doc_id"), explode(col("shs")).as("shingle")).count())
    val ckpt = graft.dedup.Dedup.shingleSets(docs).localCheckpoint(true)
    time("entries from ckpt")(ckpt
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle")).count())
    time("entries via repartition")(graft.dedup.Dedup.shingleSets(docs)
      .repartition(32)
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle")).count())
    graft.dedup.Dedup.shingleSets(docs)
      .repartition(32)
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle"))
      .explain("formatted")
    val buckets = entries.groupBy("shingle")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    time("buckets")(buckets.count())
    time("ngram full")(graft.dedup.Dedup.ngramJaccardPairs(docs).count())
    time("minhash full")(graft.dedup.Dedup.minhashLshPairs(docs).count())

    // minhash internals (constants shared with Dedup — no drift)
    import graft.gfunctions._
    val P = graft.dedup.Dedup.P
    val hashA = graft.dedup.Dedup.HashA
    val hashB = graft.dedup.Dedup.HashB
    val ds2 = graft.dedup.Dedup.shingleSets(docs).filter(size(col("shs")) > 0)
      .withColumn("hs", transform(col("shs"), s => polyHash(s)))
    time("mh: ds build")(ds2.count())
    val base = graft.dedup.Dedup.shingleSets(docs).localCheckpoint(true)
    time("mh: hs from ckpt")(base.filter(size(col("shs")) > 0)
      .withColumn("hs", transform(col("shs"), s => polyHash(s)))
      .agg(sum(size(col("hs")))).head().getLong(0))
    time("mh: hs no filter")(graft.dedup.Dedup.shingleSets(docs)
      .withColumn("hs", transform(col("shs"), s => polyHash(s)))
      .agg(sum(size(col("hs")))).head().getLong(0))
    val dsC = ds2.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("mh: cache fill")(dsC.count())
    val mhCols = hashA.zip(hashB).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % P)).as(s"mh$i")
    }
    val sig = dsC.select(col("doc_id") +: mhCols: _*)
    time("mh: sig")(sig.agg(sum(col("mh0"))).head().getLong(0))
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map(b => concat_ws(",",
        (0 until 4).map(k => col(s"mh${b * 4 + k}").cast("string")): _*)): _*))
        .as(Seq("band", "bsig")))
    time("mh: bands")(bands.count())
    val cand = bands.groupBy("band", "bsig")
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    time("mh: cand buckets")(cand.count())
    dsC.unpersist()

    // ---- skewed-join microbench: gfunctions.saltedJoin vs plain ----
    //
    // One hot key holding 90% of a 20M-row fact side, joined to a
    // 200k-key dim too large to broadcast (threshold dropped to force
    // SMJ — the 100 TB shape). Variants: plain SMJ with AQE skew
    // handling off (the unmitigated baseline), plain with AQE on
    // (Spark's own mitigation), salted 16-way (ours — works even where
    // AQE can't, e.g. when the skewed side's partitioning feeds a
    // downstream stateful op). Measured (local[32], two runs):
    //   plain no-AQE 19.0s / 10.0s, plain AQE 10.2s / 7.8s,
    //   salted16 no-AQE 6.2s / 4.4s, salted16 AQE 7.3s / 2.8s —
    // salting beats both the baseline (~3×) and AQE's skew split
    // (~1.6-2×), because the salt spreads the hot key BEFORE the
    // exchange instead of re-splitting one oversized reduce partition.
    {
      import graft.gfunctions._
      val fact = spark.range(0, 20000000L).select(
        when(col("id") % 10 =!= 0, 0L).otherwise(pmod(col("id"), lit(200000L))).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 200000L).select(col("id").as("k"), (col("id") * 7).as("dv"))
      def run(name: String, aqe: Boolean)(body: => Long): Unit = {
        // restore the session's OWN pre-benchmark values, not hardcoded
        // defaults — this main shares the session with later sections.
        val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
        try {
          spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          time(name)(body)
        } finally {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
          spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        }
      }
      def agg(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum(col("dv"))).head().getLong(0)
      run("skew: plain, no AQE", aqe = false)(agg(fact.join(dim, "k")))
      run("skew: plain, AQE", aqe = true)(agg(fact.join(dim, "k")))
      run("skew: salted16, no AQE", aqe = false)(
        agg(saltedJoin(fact, dim, "k", 16, Seq("v"))))
      run("skew: salted16, AQE", aqe = true)(
        agg(saltedJoin(fact, dim, "k", 16, Seq("v"))))
    }
    spark.stop()
  }
}

/** Dev-only sub-stage profile of d_semantic_dedup at a given sfDir. */
object ProfileSem {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import graft.gfunctions.{dotProduct, safeDiv}
    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    time("ivfIndex build")(graft.sim.Sim.ivfIndex(spark, dir, k = 8, iters = 3)
      .assigned.count())
    val a = graft.sim.Sim.ivfIndex(spark, dir, k = 8, iters = 3).assigned
      .select(col("cid"), col("vec_id"), col("v"),
        sqrt(dotProduct(col("v"), col("v"))).as("nrm"))
    time("assigned reuse")(a.count())
    time("cell histogram")(a.groupBy("cid").count().collect().toSeq.sortBy(_.getLong(1)))
    val T = 8
    val x = a.select(col("cid"), col("vec_id"), col("v"), col("nrm"),
      pmod(col("vec_id"), lit(T)).as("tile"))
    val y = a.withColumn("tile", explode(sequence(lit(0), lit(T - 1)).cast("array<bigint>")))
    val pairs = x.as("x").join(y.as("y"),
        col("x.cid") === col("y.cid") && col("x.tile") === col("y.tile") &&
          col("x.vec_id") < col("y.vec_id"))
    time("pair count")(pairs.count())
    time("pair cosine + filter")(pairs
      .select(round(safeDiv(dotProduct(col("x.v"), col("y.v")),
        col("x.nrm") * col("y.nrm")), 4).as("cs"))
      .filter(col("cs") >= 0.45).count())
    time("full query")(graft.dedup.Dedup.semanticDedup.run(spark, dir).count())
    spark.stop()
  }
}
