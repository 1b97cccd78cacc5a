package graft

import org.apache.spark.sql.DataFrame

/** t_domain_rank: integer-fixed-point PageRank over the shared-shingle
  * source graph — determinism, hub dominance on a hand-built graph,
  * and the df-cap isolation guarantee.
  */
class DomainRankSpec extends SparkSpec {

  import spark.implicits._

  private def ranks(df: DataFrame): Seq[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  /** One doc per (source, phrase); each 3-word phrase contributes
    * exactly one shingle, so edge weights are countable by hand.
    */
  private def corpus(rows: Seq[(String, String)]): DataFrame =
    rows.zipWithIndex
      .map { case ((src, text), i) => (i.toLong, text, src) }
      .toDF("doc_id", "text", "source")

  test("deterministic on sf0.001 documents; positive bounded fixed-point ranks") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = ranks(graft.text.Text.domainRankOf(docs))
    val b = ranks(graft.text.Text.domainRankOf(docs))
    assert(a === b)
    assert(a.nonEmpty)
    assert(a.forall(_._3 > 0L))
    // total damped mass can only shrink below the initial RankScale
    assert(a.map(_._3).sum <= 1000000000000L)
    // output is sorted rank-desc
    assert(a.map(_._3) === a.map(_._3).sortBy(-_))
  }

  test("hub source with the heaviest shared-content edges ranks first") {
    // H shares 3 distinct shingles with each of A, B, C; A-B share 1.
    val share = for {
      (other, tag) <- Seq(("srcA", "ha"), ("srcB", "hb"), ("srcC", "hc"))
      k <- 1 to 3
      row <- Seq(("srcH", s"$tag${k}x $tag${k}y $tag${k}z"),
                 (other,  s"$tag${k}x $tag${k}y $tag${k}z"))
    } yield row
    val ab = Seq(("srcA", "ab1 ab2 ab3"), ("srcB", "ab1 ab2 ab3"))
    val out = ranks(graft.text.Text.domainRankOf(corpus(share ++ ab)))
    assert(out.map(_._1).toSet === Set("srcH", "srcA", "srcB", "srcC"))
    assert(out.head._1 === "srcH")
    // out_weight is the symmetric adjacency row sum: H has 3+3+3
    assert(out.find(_._1 == "srcH").get._2 === 9L)
    assert(out.find(_._1 == "srcC").get._2 === 3L)
  }

  test("empty edge graph returns an empty frame, matching the oracle") {
    // a single source can never form an edge; docs shorter than 3
    // tokens yield no shingles. Both must give zero rows (the oracle's
    // SQL yields an empty result), not a divide-by-zero on the driver.
    val single = graft.text.Text.domainRankOf(
      corpus(Seq(("only", "a1 a2 a3"), ("only", "b1 b2 b3"))))
    assert(single.count() === 0L)
    assert(single.columns.toSeq === Seq("source", "out_weight", "rank_fp"))
    val short = graft.text.Text.domainRankOf(
      corpus(Seq(("s1", "one two"), ("s2", "one two"))))
    assert(short.count() === 0L)
  }

  test("a shingle above the source-df cap produces no edges at all") {
    // 16 sources > SrcDfCap = 15 share one phrase; 12 of them have
    // nothing else, so they must be isolated (absent from the output),
    // and the capped shingle must not inflate the H-A edge either.
    val capped = (1 to 12).map(i => (s"only$i", "cap1 cap2 cap3")) ++
      Seq("srcH", "srcA", "srcB", "srcC").map(s => (s, "cap1 cap2 cap3"))
    val real = Seq(
      ("srcH", "e1 e2 e3"), ("srcA", "e1 e2 e3"),
      ("srcB", "f1 f2 f3"), ("srcC", "f1 f2 f3"))
    val out = ranks(graft.text.Text.domainRankOf(corpus(capped ++ real)))
    assert(out.map(_._1).toSet === Set("srcH", "srcA", "srcB", "srcC"))
    assert(out.forall(_._2 === 1L)) // each real edge has weight 1, cap shingle excluded
  }
}
