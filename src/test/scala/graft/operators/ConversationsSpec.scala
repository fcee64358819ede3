package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Conversation-prep against hostile records: malformed JSON, protocol
  * violations in every position, JSON escapes, and hand-computed masking
  * arithmetic.
  */
class ConversationsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(json: String) = {
    val r = Seq(Tuple1(json)).toDF("j")
      .select(Conversations.parseTurns(col("j")).as("tv"))
      .select(
        coalesce(size(col("tv")), lit(0)).as("n_turns"),
        Conversations.validTurns(col("tv")).as("valid"),
        Conversations.roleChars(col("tv"), "assistant").as("a_chars"),
        Conversations.roleChars(col("tv"), "user").as("u_chars"),
        Conversations.flattenTurns(col("tv")).as("flat"))
      .head()
    (r.getInt(0), r.getBoolean(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("valid 2-turn and 4-turn conversations: flags, masses, template") {
    val (n2, v2, a2, u2, f2) = run(
      """[{"role":"user","content":"hi there"},
        |{"role":"assistant","content":"hello"}]""".stripMargin)
    assert(n2 == 2 && v2)
    assert(u2 == 8L && a2 == 5L)
    assert(f2 == "<|user|>hi there<|assistant|>hello")

    val (n4, v4, a4, u4, _) = run(
      """[{"role":"user","content":"a"},{"role":"assistant","content":"bb"},
        |{"role":"user","content":"ccc"},{"role":"assistant","content":"dddd"}]"""
        .stripMargin)
    assert(n4 == 4 && v4)
    assert(u4 == 4L && a4 == 6L)
  }

  test("protocol violations are invalid but still countable") {
    // opens with assistant
    assert(!run("""[{"role":"assistant","content":"x"},{"role":"user","content":"y"}]""")._2)
    // odd turn count (dangling user)
    assert(!run("""[{"role":"user","content":"x"},{"role":"assistant","content":"y"},{"role":"user","content":"z"}]""")._2)
    // role repeat
    assert(!run("""[{"role":"user","content":"x"},{"role":"user","content":"y"}]""")._2)
    // case-sensitive role protocol
    assert(!run("""[{"role":"User","content":"x"},{"role":"assistant","content":"y"}]""")._2)
    // empty / null content
    assert(!run("""[{"role":"user","content":""},{"role":"assistant","content":"y"}]""")._2)
    assert(!run("""[{"role":"user","content":"x"},{"role":"assistant"}]""")._2)
    // single turn
    assert(!run("""[{"role":"user","content":"x"}]""")._2)
    // the violations still report their turn and mass accounting
    val (n, _, a, u, _) =
      run("""[{"role":"user","content":"xx"},{"role":"user","content":"yyy"}]""")
    assert(n == 2 && u == 5L && a == 0L)
  }

  test("missing/null role is INVALID (false), never NULL") {
    // role === 'user' on a null role yields NULL; un-coalesced, forall
    // would propagate it and valid.cast('int') sums would silently drop
    val df = Seq(Tuple1("""[{"content":"x"},{"role":"assistant","content":"y"}]"""))
      .toDF("j")
      .select(Conversations.validTurns(Conversations.parseTurns(col("j"))).as("valid"))
    val r = df.head()
    assert(!r.isNullAt(0) && !r.getBoolean(0))
    assert(df.select(col("valid").cast("int")).head().getInt(0) == 0)
  }

  test("malformed JSON flows through as an invalid, empty record") {
    for (bad <- Seq("not json", "{\"role\":\"user\"}", "[{", "", "[1,2]")) {
      val (n, v, a, u, f) = run(bad)
      assert(!v, s"'$bad' must be invalid")
      assert(a == 0L && u == 0L, s"'$bad' must carry no role mass")
      assert(n == 0 || f.nonEmpty || f.isEmpty) // countable, never a crash
    }
  }

  test("JSON escapes survive into the flattened template") {
    val (_, v, a, _, f) = run(
      """[{"role":"user","content":"say \"hi\""},{"role":"assistant","content":"\"hi\""}]""")
    assert(v)
    assert(a == 4L)
    assert(f == "<|user|>say \"hi\"<|assistant|>\"hi\"")
  }

  test("q_f3/q_f4 construction replay on a miniature corpus") {
    // one doc long enough for all four pieces, one too short for t4
    val longText = ("w" * 125)
    val shortText = "w" * 80
    val df = Seq((1L, longText), (5L, shortText)).toDF("doc_id", "text")
    val out = ConversationQueries.sftFlattenQuery(df).orderBy("doc_id").collect()
    // doc 1 (v=1): 4 valid turns, 30+25 user chars, 40+30 assistant chars
    assert(out(0).getInt(1) == 4 && out(0).getInt(2) == 1)
    assert(out(0).getLong(3) == 70L && out(0).getLong(4) == 55L)
    // doc 5 (v=1): t4 empty (len 80 < 96) -> invalid, masses still counted
    // (t2 = chars 31-70 = 40, t4 = '' -> assistant 40; t1 = 30,
    //  t3 = chars 71-80 = 10 -> user 40)
    assert(out(1).getInt(1) == 4 && out(1).getInt(2) == 0)
    assert(out(1).getLong(3) == 40L && out(1).getLong(4) == 40L)
  }
}
