package graft

import graft.functions.{JsonWalk, JsonWalkImpl}
import org.apache.spark.unsafe.types.UTF8String

/** Reference-semantics pins for the recursive JSON walks
  * (govuk_extraction.py:7-22): document-order DFS, key's own value
  * yielded before descending, lists walked only one level and only into
  * object elements. */
class JsonWalkSpec extends SparkSpec {
  import spark.implicits._

  private def find(json: String, key: String): Seq[String] =
    JsonWalkImpl.findKey(UTF8String.fromString(json), UTF8String.fromString(key))
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq

  test("find_key: document-order DFS, own key first, then nested") {
    val j =
      """{"body": "top", "meta": {"body": "inner"},
        |"items": [{"body": "a"}, {"x": 1}, "plain", [{"body": "not-walked"}]],
        |"tail": {"deep": {"body": "deepest"}}}""".stripMargin
    // top-level body first; then meta.body; list: only OBJECT elements at
    // depth 1 (the nested list's dict is NOT walked — mirrors reference);
    // then tail.deep.body.
    assert(find(j, "body") == Seq("top", "inner", "a", "deepest"))
  }

  test("find_key: a dict-valued hit is yielded as JSON and then descended") {
    val j = """{"body": {"body": "nested"}}"""
    assert(find(j, "body") == Seq("""{"body":"nested"}""", "nested"))
  }

  test("find_key: malformed json or non-object root yields empty") {
    assert(find("""[1,2]""", "k").isEmpty)
    assert(find("""{"k": """, "k").isEmpty)
  }

  test("flatten: dotted object paths, [i] array indices, scalars only") {
    val flat = JsonWalkImpl
      .flatten(UTF8String.fromString(
        """{"a": {"b": "x", "c": [1, {"d": "y"}]}, "e": true}"""))
    val rows = (0 until flat.numElements()).map { i =>
      val r = flat.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
    assert(rows == Seq(
      ("a.b", "x"), ("a.c[0]", "1"), ("a.c[1].d", "y"), ("e", "true")))
  }

  test("column expressions evaluate through codegen") {
    val out = Seq("""{"k": "v", "n": {"k": "w"}}""").toDF("j")
      .selectExpr("j")
      .select(JsonWalk.json_find_key($"j",
        org.apache.spark.sql.functions.lit("k")).as("hits"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("v", "w"))
  }
}
