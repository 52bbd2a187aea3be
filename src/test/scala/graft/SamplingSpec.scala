package graft

import graft.ops.Sampling

/** The prefiltered exact-k sampler's equality with the plain windowed form,
  * INCLUDING the adversarial branch the md5-hashed registry fixture cannot
  * reach: a stratum whose hashes all sit above the prefilter threshold
  * (zero survivors) must fall back to a full re-rank and still emit
  * exactly min(k, n) rows — the injectable hash column exists for this.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val space = 1L << 60

  test("prefiltered ≡ plain, including a zero-survivor stratum and a keep-all tiny stratum") {
    val rows =
      // "good": spread hashes — prefilter keeps ~half, fast path serves it
      (0L to 99L).map(i => (i, "good", i * (space / 128))) ++
      // "evil": every hash in the top of the space — ZERO survivors under
      // the 4k/n threshold, the branch that silently dropped the stratum
      // before the review fix
      (100L to 199L).map(i => (i, "evil", space - 200L + i)) ++
      // "tiny": n ≤ 4k — threshold pins to the full space (keep-all)
      (200L to 204L).map(i => (i, "tiny", i * (space / 4096)))
    val d = rows.toDF("doc_id", "src", "h")
    val k = 10L
    // joins reorder columns (the stratum key moves first) — canonicalize
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "src", "h", "rk")
        .orderBy("src", "rk").collect().map(_.toString).toSeq
    val plain = Sampling.topKByHash(d, "src", "h", k, Seq("doc_id"))
    val pre = Sampling.topKByHashPrefiltered(d, "src", "h", k,
      tiebreak = Seq("doc_id"))
    assert(canon(pre) == canon(plain),
      "prefiltered form must equal the plain windowed form row-for-row")
    val bySrc = pre.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("good" -> k, "evil" -> k, "tiny" -> 5L),
      s"exact min(k, n) per stratum, got $bySrc")
    // the adversarial stratum really did have zero survivors: its smallest
    // hash sits above the threshold (space/n)*4k = 0.4*space
    assert(space - 200L + 100L > (space / 100L) * (4L * k),
      "fixture must defeat the prefilter for the fallback to be exercised")
  }
}
