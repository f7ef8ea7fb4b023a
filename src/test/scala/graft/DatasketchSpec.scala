package graft

import graft.functions.{DatasketchMinHash, DatasketchMinHashImpl, DatasketchPerms}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-exactness pins for the datasketch-parity MinHash, cross-checked
  * against an independent numpy implementation of the documented scheme
  * (sha1_hash32 + RandomState(1) universal hashes mod 2^61−1). */
class DatasketchSpec extends SparkSpec {
  import spark.implicits._

  test("permutation table matches numpy RandomState(1) draw") {
    assert(DatasketchPerms.A.length == 256 && DatasketchPerms.B.length == 256)
    assert(DatasketchPerms.A(0) == 775169054918279404L)
    assert(DatasketchPerms.A(1) == 2109959069025162L)
    assert(DatasketchPerms.A(2) == 401325382989534145L)
    assert(DatasketchPerms.B(0) == 1758426461858698312L)
  }

  test("sha1_hash32 is little-endian first 4 bytes") {
    assert(DatasketchMinHashImpl.sha1Hash32("the q".getBytes("UTF-8"))
      == 2493936651L)
  }

  test("signature pins: normal text and shorter-than-k text") {
    // Expected values from tools/dev_datasketch.py — an independent
    // hashlib-based transcription of check_duplicate/utils.py:22-30
    // (shingleset of unique substrings lengths 1..k).
    val s1 = DatasketchMinHashImpl
      .signature(UTF8String.fromString("the quick brown fox"), 5)
      .toLongArray()
    assert(s1.take(6).toSeq ==
      Seq(1834065L, 24867887L, 10519186L, 46097298L, 25910147L, 40851567L))
    assert(s1.sum == 12820242529L)
    assert(s1.takeRight(2).toSeq == Seq(91912866L, 4583821L))
    val s2 = DatasketchMinHashImpl.signature(UTF8String.fromString("ab"), 5)
      .toLongArray()
    assert(s2.take(6).toSeq ==
      Seq(297616339L, 270893072L, 2013617805L, 1399200590L, 943679155L,
        113437101L))
    assert(s2.sum == 265608083734L)
    val s3 = DatasketchMinHashImpl
      .signature(UTF8String.fromString("regulatory document body text"), 5)
      .toLongArray()
    assert(s3.take(6).toSeq ==
      Seq(8437856L, 24867887L, 2507878L, 15121445L, 711517L, 11221577L))
    assert(s3.sum == 9149889279L)
  }

  test("column expression evaluates through codegen over a frame") {
    val sigs = Seq("the quick brown fox", "the quick brown fox", "other text")
      .toDF("t")
      .select(DatasketchMinHash.datasketch_minhash($"t").as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).length == 256)
    assert(sigs(0).head == 1834065L)
  }
}
