package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink round-trips beyond parquet: CSV (header + compression),
  * JSON lines, and ORC. The reference's only format is line-oriented
  * text in directories (SURVEY §1.1) — handled by the MR path and
  * `spark.read.text`; a complete engine must also ingest/emit the
  * standard columnar and interchange formats with schema fidelity.
  *
  * Scale notes: all three writers shard by partition (the directory is
  * the dataset, same as the reference's model); compressed CSV/JSON are
  * splittable at file granularity, ORC/parquet at stripe/row-group
  * granularity. Schema is supplied on read — never inferred twice — so
  * a 100 TB read does not pay an inference scan.
  */
class SourcesSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = Engine.session("test")

  private def sample() =
    Engine
      .table(spark, dir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity"),
        col("l_returnflag"),
        col("l_shipdate")
      )

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("csv round-trip with header and gzip preserves rows and schema") {
    val out = Files.createTempDirectory("graft-csv-").toString
    val src = sample()
    src.write.mode("overwrite").option("header", "true").option("compression", "gzip").csv(out)
    val back = spark.read
      .schema(src.schema) // explicit schema: no inference pass at scale
      .option("header", "true")
      .csv(out)
    assert(back.schema == src.schema)
    assert(sortedRows(back) == sortedRows(src))
  }

  test("json-lines round-trip preserves rows under an explicit schema") {
    val out = Files.createTempDirectory("graft-json-").toString
    val src = sample()
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(sortedRows(back) == sortedRows(src))
  }

  test("orc round-trip preserves rows and pushes filters on read") {
    val out = Files.createTempDirectory("graft-orc-").toString
    val src = sample()
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(sortedRows(back) == sortedRows(src))
    val filtered = back.filter(col("l_returnflag") === "R")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"), plan.take(800))
  }

  test("text sink/source handles the reference's line-oriented model on a table") {
    val out = Files.createTempDirectory("graft-text-").toString
    val src = Engine
      .table(spark, dir, "documents")
      .select(concat_ws("\t", col("doc_id"), col("lang")).as("value"))
    src.write.mode("overwrite").text(out)
    val back = spark.read.text(out)
    assert(sortedRows(back) == sortedRows(src))
  }

  test("malformed JSON: PERMISSIVE quarantines, DROPMALFORMED drops, FAILFAST fails") {
    // the schema-drift contract a 100 TB ingest needs: bad records must
    // be quarantinable (audited via _corrupt_record), droppable, or
    // fatal — chosen per pipeline, never silently coerced
    val in = Files.createTempDirectory("graft-badjson-")
    Files.writeString(
      in.resolve("part0.json"),
      """{"id": 1, "v": "a"}
        |{"id": 2, "v": "b"}
        |{broken json
        |{"id": "not-a-number", "v": "c"}
        |{"id": 5, "v": "e"}
        |""".stripMargin
    )
    val schema = "id LONG, v STRING, _corrupt_record STRING"
    val permissive = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(in.toString)
      .cache() // required: the corrupt-record column is unstable across re-parses
    assert(permissive.count() == 5)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 2)
    assert(permissive.filter(col("id").isNotNull).count() == 3)
    permissive.unpersist(blocking = false)
    // DROPMALFORMED is a production trap, pinned here deliberately:
    // count() runs a column-pruned, structure-only parse and counts 4
    // (the type-mismatched record parses as an object), while actually
    // materializing the columns drops it and yields 3 rows — count()
    // and collect() DISAGREE under this mode. One more reason the
    // engine's recommended ingest contract is PERMISSIVE + corrupt
    // column (audited), never silent dropping.
    val dropped = spark.read
      .schema("id LONG, v STRING")
      .option("mode", "DROPMALFORMED")
      .json(in.toString)
    assert(dropped.count() == 4)
    assert(dropped.collect().length == 3)
    val failfast = spark.read
      .schema("id LONG, v STRING")
      .option("mode", "FAILFAST")
      .json(in.toString)
    assertThrows[org.apache.spark.SparkException](failfast.count())
  }
}
