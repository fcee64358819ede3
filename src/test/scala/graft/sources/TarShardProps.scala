package graft.sources

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Generative fuzz of the tar shard framing (the WarcProps discipline
  * for the ustar container): over random member sets — names at the
  * 100-byte field edge, binary payloads including header magic and NUL
  * runs, empty bodies — and byte-level corruption at ANY offset:
  *
  *   1. local round-trip: header() + payload + padding framed by hand
  *      parses back to exactly the planted members (names, bytes,
  *      order) through BOTH iterators (positional and gzip-sequential);
  *   2. total robustness: a shard with one byte flipped at an arbitrary
  *      offset NEVER throws — every emitted row is either a planted
  *      member (byte-identical payload) or one terminal quarantine row;
  *   3. the WebDataset name split is a partition of the name: key and
  *      ext rejoin to the original for every generated name.
  */
object TarShardProps extends Properties("TarShardIO") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val conf = new org.apache.spark.util.SerializableConfiguration(
    new org.apache.hadoop.conf.Configuration())

  private val genNameChar: Gen[Char] =
    Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('.'),
      1 -> Gen.oneOf('-', '_', '/'))

  private val genName: Gen[String] = for {
    n <- Gen.choose(1, 96)
    cs <- Gen.listOfN(n, genNameChar)
    // a leading '/' or a name of only dots is legal tar but useless
    // WebDataset; keep names starting alphanumeric like real keys
    h <- Gen.alphaNumChar
  } yield (h :: cs).mkString

  private val genPayload: Gen[Array[Byte]] = Gen.frequency(
    4 -> Gen.choose(0, 1500).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)),
    1 -> Gen.const(Array.emptyByteArray),
    1 -> Gen.const("ustar".getBytes("US-ASCII") ++ new Array[Byte](600)))

  private val genMembers: Gen[List[(String, Array[Byte])]] = for {
    n <- Gen.choose(1, 8)
    names <- Gen.listOfN(n, genName)
    payloads <- Gen.listOfN(n, genPayload)
  } yield names.zip(payloads)

  private def frame(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, p) =>
      out.write(TarShardIO.header(name, p.length.toLong))
      out.write(p)
      out.write(new Array[Byte]((512 - p.length % 512) % 512))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private def viaFile(bytes: Array[Byte], gz: Boolean): Seq[TarShardIO.TarEntry] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tarprop")
    val f = dir.resolve(if (gz) "s.tar.gz" else "s.tar")
    java.nio.file.Files.write(f, bytes)
    val it =
      if (gz) TarShardIO.streamGzFile(f.toString, conf)
      else TarShardIO.streamFile(f.toString, conf)
    val got = it.toList
    java.nio.file.Files.deleteIfExists(f)
    java.nio.file.Files.deleteIfExists(dir)
    got
  }

  property("round-trip through both iterators") =
    forAllNoShrink(genMembers) { members =>
      val bytes = frame(members)
      Seq(false, true).forall { gz =>
        val got = viaFile(if (gz) gzip(bytes) else bytes, gz)
        got.length == members.length && got.forall(_.valid) &&
          got.zip(members).forall { case (e, (name, p)) =>
            // key/ext partition the name around at most one dot (a
            // trailing-dot basename like "k." yields ext "" — the one
            // lossy edge, pinned here rather than hidden)
            e.name == name && java.util.Arrays.equals(e.payload, p) &&
              name.startsWith(e.key) && name.endsWith(e.ext) &&
              e.key.length + e.ext.length >= name.length - 1
          }
      }
    }

  property("single-byte corruption never throws; members are planted or one quarantine tail") =
    forAllNoShrink(for {
      ms <- genMembers
      bytes = frame(ms)
      off <- Gen.choose(0, bytes.length - 1)
      bit <- Gen.choose(1, 255)
    } yield (ms, bytes, off, bit)) { case (ms, bytes, off, bit) =>
      val mut = bytes.clone()
      mut(off) = (mut(off) ^ bit).toByte
      val planted = ms.map { case (n, p) => (n, p.toSeq) }.toSet
      Seq(false, true).forall { gz =>
        val got = viaFile(if (gz) gzip(mut) else mut, gz) // must not throw
        val (valid, bad) = got.partition(_.valid)
        bad.size <= 1 &&
          bad.forall(b => got.lastOption.contains(b)) && // quarantine is terminal
          valid.forall { e =>
            // a valid row either IS a planted member, or (payload-byte
            // flips only) a planted member's name with mutated bytes —
            // tar has no payload CRC, the documented container property
            ms.exists(_._1 == e.name) ||
              planted.contains((e.name, e.payload.toSeq))
          }
      }
    }
}
