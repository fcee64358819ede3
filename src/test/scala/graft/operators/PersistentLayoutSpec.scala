package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** r15 VERDICT #6: every persistent /tmp artifact key folds the global
  * [[PersistentLayout.Fmt]] constant, so a layout/schema migration is a
  * one-line bump that makes every old-layout artifact unreachable —
  * never reinterpreted. These tests pin the derivation and replay the
  * UPGRADE path: an artifact at the LEGACY key (the pre-gl1 derivation,
  * without the fmt constant) must be ignored by the new code even when
  * it carries a valid-looking ready marker.
  */
class PersistentLayoutSpec extends SparkTestBase {

  test("a fmt bump moves both the table name and the on-disk path") {
    val (t1, p1) = PipelineQueries.indexLocation("graft_d6idx", "/data/x", "v2",
      fmt = "glA")
    val (t2, p2) = PipelineQueries.indexLocation("graft_d6idx", "/data/x", "v2",
      fmt = "glB")
    assert(t1 != t2, "table name must carry the fmt")
    assert(p1 != p2, "path must carry the fmt")
    // and the default derivation uses the live constant
    assert(PipelineQueries.indexLocation("graft_d6idx", "/data/x", "v2") ==
      PipelineQueries.indexLocation("graft_d6idx", "/data/x", "v2",
        fmt = PersistentLayout.Fmt))
  }

  test("an old-layout IVF dir at the legacy key is never reused (upgrade)") {
    val dir = sfDir("0.001")
    // reconstruct the LEGACY (r15) key: content fingerprint WITHOUT the
    // fmt constant — exactly what a previous round's code wrote under
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val entries = (if (src.isDirectory) src.listFiles().sortBy(_.getName).toSeq
                   else Seq(src))
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
    val legacyKey = java.security.MessageDigest.getInstance("MD5")
      .digest((dir +: entries).mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val legacyPath = s"/tmp/graft_ivf/$legacyKey-nlist8-v2"
    // poison the legacy location: a ready marker over NO index files — if
    // the new derivation still resolved here, ivfRead would throw on the
    // empty dir (the pre-fix failure shape: old layout trusted blindly)
    Files.createDirectories(Paths.get(legacyPath))
    Files.write(Paths.get(legacyPath, "_graft_index_ready"),
      Array.emptyByteArray)
    val idx = DedupQueries.ivfCached(spark, dir, nlist = 8)
    assert(idx != null, "fresh build under the fmt-keyed path must succeed")
  }
}
