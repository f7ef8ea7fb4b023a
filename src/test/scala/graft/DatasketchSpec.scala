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
    val s1 = DatasketchMinHashImpl
      .signature(UTF8String.fromString("the quick brown fox"), 5)
    assert(s1.toLongArray().take(6).toSeq ==
      Seq(84766837L, 34383241L, 44059036L, 1117560327L, 100917092L,
        238204920L))
    val s2 = DatasketchMinHashImpl.signature(UTF8String.fromString("ab"), 5)
    assert(s2.toLongArray().take(6).toSeq ==
      Seq(3651936582L, 270893072L, 3267495394L, 1399200590L, 2351754044L,
        190500018L))
  }

  test("column expression evaluates through codegen over a frame") {
    val sigs = Seq("the quick brown fox", "the quick brown fox", "other text")
      .toDF("t")
      .select(DatasketchMinHash.datasketch_minhash($"t").as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).length == 256)
    assert(sigs(0).head == 84766837L)
  }
}
