package graft.kinesis

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.Check
import AggRecordCodec._

/** Wire-format + size-accounting invariants (SURVEY §5.2.3). */
class CodecSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A])(f: A => Boolean): Unit =
    Check.ok(Prop.forAll(g)(f))

  private val genPk: Gen[String] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val genData: Gen[Array[Byte]] =
    Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
  private val genEhk: Gen[Option[String]] = Gen.option(
    Gen.chooseNum(0L, Long.MaxValue).map(v => BigInteger.valueOf(v).toString))
  private val genRecord: Gen[(String, Option[String], Array[Byte])] =
    for { pk <- genPk; e <- genEhk; d <- genData } yield (pk, e, d)

  test("varintSize matches an actual varint encoding") {
    forAll(Gen.chooseNum(0L, Long.MaxValue)) { v =>
      var x = v; var n = 1
      while ((x & ~0x7FL) != 0L) { n += 1; x >>>= 7 }
      varintSize(v) == n
    }
    assert(varintSize(0L) == 1 && varintSize(127L) == 1 && varintSize(128L) == 2)
  }

  test("incremental size accounting is byte-exact vs real serialization") {
    forAll(Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, genRecord))) { records =>
      val b = new Builder
      val added = records.takeWhile { case (pk, e, d) => b.add(pk, e, d) }
      if (added.isEmpty) true
      else {
        val claimed = b.sizeBytes
        val agg = b.clearAndGet().get
        agg.toRecordBytes.length == claimed && agg.sizeBytes == claimed
      }
    }
  }

  test("encode/decode round trip preserves payloads, keys, order") {
    forAll(Gen.nonEmptyListOf(genRecord)) { records =>
      val b = new Builder
      val added = records.takeWhile { case (pk, e, d) => b.add(pk, e, d) }
      if (added.isEmpty) true
      else {
        val agg = b.clearAndGet().get
        val decoded = decode(agg.toRecordBytes)
        decoded.numUserRecords == added.length &&
          decoded.partitionKeyTable == agg.partitionKeyTable &&
          decoded.explicitHashKeyTable == agg.explicitHashKeyTable &&
          decoded.records.zip(added).forall { case (r, (pk, ehkOpt, data)) =>
            decoded.partitionKeyTable(r.pkIndex) == pk &&
              ehkOpt.forall(e => decoded.explicitHashKeyTable(r.ehkIndex) == e) &&
              r.data.toSeq == data.toSeq
          }
      }
    }
  }

  test("wire format: magic prefix, md5 suffix") {
    val b = new Builder
    assert(b.add("pk", None, Array[Byte](1, 2, 3)))
    val bytes = b.clearAndGet().get.toRecordBytes
    assert(bytes.take(4).toSeq == Seq(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte))
    val body = bytes.slice(4, bytes.length - 16)
    assert(md5(body).toSeq == bytes.takeRight(16).toSeq)
  }

  test("dictionary encoding: repeated keys stored once, insertion order") {
    val b = new Builder
    assert(b.add("k1", Some("1"), Array[Byte](1)))
    assert(b.add("k2", Some("2"), Array[Byte](2)))
    assert(b.add("k1", Some("1"), Array[Byte](3)))
    val agg = b.clearAndGet().get
    assert(agg.partitionKeyTable == IndexedSeq("k1", "k2"))
    assert(agg.explicitHashKeyTable == IndexedSeq("1", "2"))
    assert(agg.records.map(_.pkIndex) == IndexedSeq(0, 1, 0))
  }

  test("uint128 EHK derivation matches the reference's byte-fold formula") {
    // reference formula (AggRecord.java:231-243): Σ (digest[i]&255) << (15-i)*8
    forAll(genPk) { pk =>
      val digest = md5(pk.getBytes(StandardCharsets.UTF_8))
      var expected = BigInteger.ZERO
      for (i <- 0 until 16) {
        expected = expected.add(
          BigInteger.valueOf(digest(i) & 0xFF).shiftLeft((16 - i - 1) * 8))
      }
      val got = createExplicitHashKey(pk)
      val v = new BigInteger(got)
      got == expected.toString(10) && v.signum() >= 0 && v.compareTo(Uint128Max) <= 0
    }
  }

  test("validators enforce reference bounds") {
    intercept[IllegalArgumentException](validatePartitionKey(""))
    intercept[IllegalArgumentException](validatePartitionKey("x" * 257))
    validatePartitionKey("x" * 256)
    intercept[IllegalArgumentException](validateExplicitHashKey("-1"))
    intercept[IllegalArgumentException](validateExplicitHashKey("not-a-number"))
    intercept[IllegalArgumentException](
      validateExplicitHashKey(Uint128Max.add(BigInteger.ONE).toString))
    validateExplicitHashKey(Uint128Max.toString)
    intercept[IllegalArgumentException](
      validateData(new Array[Byte](MaxBytesPerRecord - 4 - 16 + 1)))
  }
}
