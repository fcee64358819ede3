package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[PreferencePairs]] against hostile records: a violation planted in
  * every rule position, malformed JSON, prompt-dedup keep-first order,
  * invalid records never shielding valid ones, and hash-family agreement.
  */
class PreferencePairsSpec extends SparkTestBase {
  import spark.implicits._

  private def judge(json: String): (Boolean, String, String) = {
    val r = Seq(Tuple1(json)).toDF("j")
      .select(PreferencePairs.parsePair(col("j")).as("rec"))
      .select(PreferencePairs.validPair(col("rec")).as("valid"),
        PreferencePairs.flattenBranch(col("rec"), "chosen").as("fc"),
        PreferencePairs.flattenBranch(col("rec"), "rejected").as("fr"))
      .head()
    assert(!r.isNullAt(0), "valid must never be NULL")
    (r.getBoolean(0), r.getString(1), r.getString(2))
  }

  private def pair(p: String, c: String, r: String): String =
    s"""{"prompt":"$p","chosen":"$c","rejected":"$r"}"""

  test("a well-formed pair is valid and flattens both branches") {
    val (v, fc, fr) = judge(pair("sum this", "good answer", "weak answer"))
    assert(v)
    assert(fc == "<|user|>sum this<|assistant|>good answer")
    assert(fr == "<|user|>sum this<|assistant|>weak answer")
  }

  test("violations in every position are invalid (false, never NULL)") {
    assert(!judge(pair("", "c", "r"))._1)                    // empty prompt
    assert(!judge(pair("p", "", "r"))._1)                    // empty chosen
    assert(!judge(pair("p", "c", ""))._1)                    // empty rejected
    assert(!judge(pair("p", "same", "same"))._1)             // chosen == rejected
    assert(!judge(pair("p", "c" * 41, "r" * 10))._1)         // ratio 4.1 > 4
    assert(judge(pair("p", "c" * 40, "r" * 10))._1)          // ratio 4.0 passes
    assert(!judge("""{"prompt":"p","chosen":"c"}""")._1)     // missing field
    assert(!judge("""not json at all""")._1)                 // malformed
    assert(!judge("""{"prompt":"p","chosen":"c","rejec""")._1) // truncated
  }

  test("malformed records flatten to '' so digests are total") {
    val (_, fc, fr) = judge("broken {")
    assert(fc == "" && fr == "")
  }

  test("prompt dedup keeps the first VALID record; invalid ones never flag or shield") {
    // ids 1,4,7 share a prompt: 1 is INVALID (equal branches), so the
    // keeper must be 4 — an invalid record must not shield later valid
    // ones — and 7 is the duplicate. id 9 is a lone valid record.
    val df = Seq(
      (1L, pair("shared", "x", "x"), 0),
      (4L, pair("shared", "good", "bad"), 1),
      (7L, pair("shared", "fine", "poor"), 1),
      (9L, pair("lone", "aa", "bb"), 1)
    ).toDF("id", "j", "expect_valid")
      .select(col("id"), col("expect_valid"),
        PreferencePairs.parsePair(col("j")).as("rec"))
      .select(col("id"), col("expect_valid"),
        PreferencePairs.validPair(col("rec")).cast("int").as("valid"),
        coalesce(col("rec.prompt"), lit("")).as("prompt"))
    val out = PreferencePairs.withPromptDup(df, "id", "valid", "prompt")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("valid"), r.getAs[Int]("prompt_dup"), r.getAs[Int]("kept"))))
      .toMap
    assert(out(1L) == ((0, 0, 0)))
    assert(out(4L) == ((1, 0, 1)))
    assert(out(7L) == ((1, 1, 0)))
    assert(out(9L) == ((1, 0, 1)))
  }

  test("invalid-row salting: a malformed-record flood never changes flags (ADVICE r10 #2)") {
    // 200 malformed records (all coalescing to prompt '') + valid dups:
    // pre-fix they all shared ONE (hash(''), valid=0) window partition;
    // the salted key must leave every flag identical to first principles —
    // invalid rows (0,0), first valid per prompt (0,1), later dups (1,0)
    val rows =
      (0L until 200L).map(i => (i, "{not json", 0)) ++
        (200L until 260L).map(i => (i, pair(s"p${i % 20}", "g", "b"), 1))
    val df = rows.toDF("id", "j", "expect_valid")
      .select(col("id"),
        PreferencePairs.parsePair(col("j")).as("rec"))
      .select(col("id"),
        PreferencePairs.validPair(col("rec")).cast("int").as("valid"),
        coalesce(col("rec.prompt"), lit("")).as("prompt"))
    val out = PreferencePairs.withPromptDup(df, "id", "valid", "prompt")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("valid"),
        r.getAs[Int]("prompt_dup"), r.getAs[Int]("kept")))
    assert(out.length == 260)
    out.foreach { case (id, valid, dup, kept) =>
      if (id < 200) assert((valid, dup, kept) == ((0, 0, 0)), s"invalid id=$id")
      else if (id < 220) assert((valid, dup, kept) == ((1, 0, 1)), s"first id=$id")
      else assert((valid, dup, kept) == ((1, 1, 0)), s"dup id=$id")
    }
  }

  test("pairsFromRanking: C(K,2) minus ties, lower rank chosen, margins exact, row-local") {
    val json = """{"prompt":"p","responses":[
      {"text":"gold","rank":0},{"text":"ok","rank":1},
      {"text":"meh","rank":1},{"text":"bad","rank":3}]}""".replace("\n", "")
    val df = Seq((1L, json)).toDF("id", "j")
      .select(col("id"), PreferencePairs.parseRanking(col("j")).as("rec"))
      .select(explode(PreferencePairs.pairsFromRanking(col("rec.responses"))).as("p"))
      .select("p.chosen", "p.rejected", "p.margin")
    val pairs = df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // 4 responses -> 6 combos, minus the ok/meh TIE -> 5 pairs; gold beats
    // everything, ok and meh each beat only bad; margins are rank gaps
    assert(pairs == Set(
      ("gold", "ok", 1), ("gold", "meh", 1), ("gold", "bad", 3),
      ("ok", "bad", 2), ("meh", "bad", 2)))
    // derivation is row-local: no exchange in the plan
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    // malformed record derives nothing (null responses -> no rows)
    val none = Seq((2L, "{not json")).toDF("id", "j")
      .select(PreferencePairs.parseRanking(col("j")).as("rec"))
      .select(explode(PreferencePairs.pairsFromRanking(col("rec.responses"))))
      .count()
    assert(none == 0L)
  }

  test("annotatorAgreement: hand-computed kappa, degenerate group takes the zero branch") {
    // 10 records: 4 agree-on-1, 3 agree-on-0, 3 disagree
    //   n=10, n11=4, n00=3, n01=2, n10=1
    //   p_o = 0.7; p_e = (5*6 + 5*4)/100 = 0.5; kappa = 0.4 exactly
    val rows =
      (1 to 4).map(i => ("g", 1, 1)) ++ (1 to 3).map(i => ("g", 0, 0)) ++
        Seq(("g", 0, 1), ("g", 0, 1), ("g", 1, 0)) ++
        (1 to 5).map(i => ("const", 1, 1)) // degenerate: p_e = 1
    val out = PreferencePairs.annotatorAgreement(
        rows.toDF("grp", "a", "b"), "grp", "a", "b")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n00"), r.getAs[Long]("n01"),
          r.getAs[Long]("n10"), r.getAs[Long]("n11"),
          r.getAs[Double]("p_o"), r.getAs[Double]("kappa")))).toMap
    assert(out("g") == ((10L, 3L, 2L, 1L, 4L, 0.7, 0.4)))
    assert(out("const") == ((5L, 0L, 0L, 0L, 5L, 1.0, 0.0)))
  }

  test("md5 and xx64 dedup key families agree on the shipped corpus") {
    val docs = (0L until 200L).map(i => (i, ("w" + i + " ") * 30))
      .toDF("doc_id", "text")
    val a = ConversationQueries.prefPairsQuery(docs, "md5")
      .select("doc_id", "valid", "prompt_dup", "kept").collect().toSet
    val b = ConversationQueries.prefPairsQuery(docs, "xx64")
      .select("doc_id", "valid", "prompt_dup", "kept").collect().toSet
    assert(a == b)
  }

  test("bradleyTerry: 2-model ratio recovers odds; zero-game models report 0; partition-invariant") {
    import spark.implicits._
    // A beats B 30:10 → BT fixed point p_A/p_B = 3 exactly; with the
    // 2-model Σ-normalization to 2e6 that is (1.5e6, 0.5e6)
    val ab = (Seq.fill(30)(("A", "B")) ++ Seq.fill(10)(("B", "A")))
      .toDF("winner", "loser")
    val r = PreferencePairs.bradleyTerryIntegerRatings(ab, "winner", "loser",
        iterations = 30)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(math.abs(r("A") - 1500000L) <= 2 && math.abs(r("B") - 500000L) <= 2,
      s"2-model fixed point off: $r")
    // a model with zero games reports rating 0, never divides
    val withGhost = ab.unionByName(Seq(("A", "B")).toDF("winner", "loser").limit(0))
    assert(!PreferencePairs.bradleyTerryIntegerRatings(withGhost, "winner", "loser")
      .collect().exists(_.getString(0) == "C"))
    // bit-identical under adversarial partitioning (the count groupBy is
    // the only distributed step; iterations are driver-side integers)
    val skew = ab.repartition(13, col("loser"))
    val a = PreferencePairs.bradleyTerryIntegerRatings(ab, "winner", "loser")
      .orderBy("model").collect().toSeq
    val b = PreferencePairs.bradleyTerryIntegerRatings(skew, "winner", "loser")
      .orderBy("model").collect().toSeq
    assert(a == b)
    // null outcomes (unjudged rows) are dropped, never NPE the driver;
    // and the degenerate scale=1 fixed point terminates (floor guards)
    val withNulls = ab.unionByName(
      Seq((null.asInstanceOf[String], "B"), ("A", null.asInstanceOf[String]))
        .toDF("winner", "loser"))
    val rn = PreferencePairs.bradleyTerryIntegerRatings(withNulls,
      "winner", "loser").collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(math.abs(rn("A") - 1500000L) <= 2 && rn.size == 2)
    val tiny = PreferencePairs.bradleyTerryIntegerRatings(
      Seq(("A", "B")).toDF("winner", "loser"), "winner", "loser",
      iterations = 5, scale = 1L)
    assert(tiny.count() == 2) // must not divide by zero
    // transitive 3-model chain fits monotone ratings
    val chain = (Seq.fill(20)(("C", "B")) ++ Seq.fill(5)(("B", "C")) ++
      Seq.fill(20)(("B", "A")) ++ Seq.fill(5)(("A", "B")))
      .toDF("winner", "loser")
    val c = PreferencePairs.bradleyTerryIntegerRatings(chain, "winner", "loser")
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(c("C") > c("B") && c("B") > c("A"), c.toString)
  }

  test("curate: accounting partitions exactly, prompts never straddle splits, rerun is identical") {
    val records = (0L until 400L).map { i =>
      val p = if (i % 7 == 0) "please summarize" else s"question $i about topic ${i % 13}"
      val json = i % 5 match {
        case 1 => pair(p, "same", "same")          // invalid: equal branches
        case 4 => "broken {"                        // invalid: malformed
        case _ => pair(p, s"good answer $i", s"weak answer ${i % 11}")
      }
      (i, json)
    }.toDF("rid", "j")
    val (shipped, r) = PreferencePairs.curate(records, "rid", "j", seed = "pp-1")
    assert(r.nInput == 400L)
    assert(r.nValid == r.nPromptDups + r.nKept, "valid = dups + kept partition")
    assert(r.nPromptDups > 0, "the shared prompt must produce dups")
    assert(r.splitCounts.values.sum == r.nKept)
    val rows = shipped.collect()
    assert(rows.length == r.nKept)
    // leak-safety: a prompt appears in exactly one split
    rows.groupBy(_.getAs[String]("prompt")).foreach { case (p, rs) =>
      assert(rs.map(_.getAs[String]("split")).distinct.length == 1,
        s"prompt '$p' straddles splits")
    }
    // shipped branches are fully flattened, never empty
    assert(rows.forall(_.getAs[String]("chosen_text").startsWith("<|user|>")))
    // determinism: rerun ships the identical corpus and report
    val (shipped2, r2) = PreferencePairs.curate(records, "rid", "j", seed = "pp-1")
    assert(r2 == r)
    assert(shipped2.collect().map(_.toString).sorted.toSeq ==
      rows.map(_.toString).sorted.toSeq)
  }

  test("the construction plants dups and data-dependent validity (not a degenerate battery)") {
    val docs = (0L until 500L).map(i => (i, ("word word word " * 7).trim))
      .toDF("doc_id", "text")
    val card = ConversationQueries.prefPairsQuery(docs, "md5")
      .agg(sum("valid").as("v"), sum("prompt_dup").as("d"), sum("kept").as("k"))
      .head()
    assert(card.getLong(0) > 0, "some records must be valid")
    assert(card.getLong(1) > 0, "the fixed prompt must produce dup flags")
    assert(card.getLong(0) == card.getLong(1) + card.getLong(2),
      "valid = dups + kept partition")
  }
}
