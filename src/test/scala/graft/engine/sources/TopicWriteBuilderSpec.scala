package graft.engine.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.topics.FileTopicStore

/** Unit guard on [[TopicWriteBuilder.build]]'s schema validation — the
  * defense-in-depth layer for callers that bypass Spark's analyzer
  * store-assignment (which casts/validates on the normal
  * `df.write.format(...)` path, see TopicWriteSpec): a LongType
  * `partition` column reaching TopicDataWriter would read 4 of the
  * long's 8 UnsafeRow bytes — silent misrouting, not an error. */
class TopicWriteBuilderSpec extends AnyFunSuite {
  test("build() rejects right names with wrong types (LongType partition)") {
    val bad = StructType(FileTopicStore.schema.fields.map {
      case f if f.name == "partition" => f.copy(dataType = LongType)
      case f => f
    })
    val ex = intercept[IllegalArgumentException] {
      new TopicWriteBuilder("/tmp/graft-none", bad, None).build()
    }
    assert(ex.getMessage.contains("must be IntegerType"),
      s"wrong-type rejection must name the expected type: ${ex.getMessage}")
  }

  test("build() rejects wrong column names before looking at types") {
    intercept[IllegalArgumentException] {
      new TopicWriteBuilder("/tmp/graft-none",
        StructType(Seq(StructField("x", StringType))), None).build()
    }
  }

  test("build() accepts the exact topic schema") {
    new TopicWriteBuilder("/tmp/graft-none", FileTopicStore.schema, None).build()
  }
}
