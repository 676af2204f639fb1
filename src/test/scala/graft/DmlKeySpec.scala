package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop}
import graft.ops.CoreOps
import graft.streaming.Pipelines

/** ScalaCheck port of the reference's only property tests
  * (core_test.clj:17-31) against our dmlKey:
  *  - key = JSON array of the id map's entries sorted by key name,
  *    flattened [k1,v1,k2,v2,...];
  *  - value = byte-identical passthrough of the input payload.
  * Generator mirrors gen-dml-map (test_generators.clj:10-23): heterogeneous
  * scalar id values (string | int | bool), insert/update/delete, arbitrary
  * data map.
  */
class DmlKeySpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Timestamp-string scalars mirror the reference generator's timestamp id
    * values (test_generators.clj:17,22 — serialized as strings in JSON). */
  private val genTimestamp: Gen[String] =
    Gen.chooseNum(0L, 4102444800000L).map(ms => new java.sql.Timestamp(ms).toString)

  /** Heterogeneous scalars per the reference generator (test_generators.clj
    * :12-17 incl. gen-rand-time :17): string | int | bool | timestamp.
    * Timestamps appear both as their string form and as epoch-millis longs
    * (how a numeric timestamp column lands in a JSON envelope), plus
    * doubles — pinning jackson's scalar formatting for every JSON number
    * shape (int, long beyond int range, fractional). */
  private val genScalar: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(s => s: Any),
    Gen.chooseNum(Int.MinValue, Int.MaxValue).map(i => i: Any),
    Gen.oneOf(true, false).map(b => b: Any),
    genTimestamp.map(t => t: Any),
    Gen.chooseNum(0L, 4102444800000L).map(ms => ms: Any),
    Gen.chooseNum(-1e12, 1e12).map(d => d: Any))

  private val genKey: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  private val genIdMap: Gen[Map[String, Any]] =
    Gen.nonEmptyMap(Gen.zip(genKey, genScalar))

  private def addScalar(node: ObjectNode, k: String, v: Any): Unit = v match {
    case s: String  => node.put(k, s); ()
    case i: Int     => node.put(k, i); ()
    case l: Long    => node.put(k, l); ()
    case d: Double  => node.put(k, d); ()
    case b: Boolean => node.put(k, b); ()
    case other      => throw new IllegalArgumentException(other.toString)
  }

  private def dmlJson(id: Map[String, Any], typ: String, table: String,
                      data: Map[String, Any]): String = {
    val root = mapper.createObjectNode()
    val idNode = root.putObject("id")
    id.foreach { case (k, v) => addScalar(idNode, k, v) }
    root.put("type", typ)
    root.put("table", table)
    val dataNode = root.putObject("data")
    data.foreach { case (k, v) => addScalar(dataNode, k, v) }
    mapper.writeValueAsString(root)
  }

  /** Independent expected-key computation (flatten sorted id entries). */
  private def expectedKey(id: Map[String, Any]): String = {
    val arr = mapper.createArrayNode()
    id.toSeq.sortBy(_._1).foreach { case (k, v) =>
      arr.add(k)
      v match {
        case s: String  => arr.add(s); ()
        case i: Int     => arr.add(i); ()
        case l: Long    => arr.add(l); ()
        case d: Double  => arr.add(d); ()
        case b: Boolean => arr.add(b); ()
        case other      => throw new IllegalArgumentException(other.toString)
      }
    }
    mapper.writeValueAsString(arr)
  }

  private val genDml: Gen[(Map[String, Any], String)] = for {
    id    <- genIdMap
    typ   <- Gen.oneOf("insert", "update", "delete")
    table <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    data  <- Gen.mapOf(Gen.zip(genKey, genScalar))
  } yield (id, dmlJson(id, typ, table, data))

  test("dml->msg key = sorted flattened id map as compact JSON array (core_test.clj:17-24)") {
    checkProp(Prop.forAll(genDml) { case (id, dml) =>
      CoreOps.dmlKeyJvm(dml) == expectedKey(id)
    })
  }

  test("dml->msg value passes the payload through unchanged (core_test.clj:26-31)") {
    val sparkS = spark
    import sparkS.implicits._
    val samples = Gen.listOfN(25, genDml).sample.get.map(_._2)
    val out = Pipelines.dmlTransform(samples.toDF("value"), "value")
      .select(col("value")).collect().map(_.getString(0))
    assert(out.toSeq == samples)
  }

  test("native dml_key expression agrees with the UDF form on generated DMLs") {
    graft.plans.GraftExtensions.register(spark)
    val sparkS = spark
    import sparkS.implicits._
    val samples = Gen.listOfN(50, genDml).sample.get.map(_._2) ++
      Seq("not json", """{"type":"u"}""", """{"id":[1]}""")
    val out = samples.toDF("value")
      .select(CoreOps.dmlKey(col("value")).as("udf"),
        org.apache.spark.sql.functions.call_function("dml_key", col("value")).as("native"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getString(0) == r.getString(1))
    }
  }

  test("malformed or id-less payloads derive a null key (O13 routing)") {
    assert(CoreOps.dmlKeyJvm("""{"id": """) == null)
    assert(CoreOps.dmlKeyJvm("""{"type":"insert"}""") == null)
    assert(CoreOps.dmlKeyJvm("""{"id": 7}""") == null)
    assert(CoreOps.dmlKeyJvm(null) == null)
  }

  test("key derivation is deterministic and type-preserving") {
    val dml = """{"id":{"b":2,"a":"x","c":true},"type":"insert","table":"t","data":{}}"""
    assert(CoreOps.dmlKeyJvm(dml) == """["a","x","b",2,"c",true]""")
  }
}
