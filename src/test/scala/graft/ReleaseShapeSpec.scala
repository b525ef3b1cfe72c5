package graft

import org.apache.spark.sql.types._

/** Registry release-shape lint: every registered query must release FLAT
  * SCALAR columns — no ArrayType / MapType / StructType / UDT anywhere in
  * the top-level schema. The oracle harness canonicalizes releases with a
  * pandas lexsort over all columns, which throws
  * `unhashable type: numpy.ndarray` on any nested column: in round 11
  * q174/q212 shipped array-typed releases whose values matched the oracle
  * but whose SHAPE was uncheckable, turning two green queries red. This
  * spec makes that whole failure class an `sbt test` red instead of a
  * round-close surprise.
  *
  * Cost note: for batch queries, `.schema` forces analysis only (no
  * execution). A handful of registrations do eager driver work while
  * BUILDING the frame (streaming AvailableNow harnesses, broadcast
  * reference aggregates) — those run here at sf0.001, the same size the
  * Bench warmup already exercises them at.
  */
class ReleaseShapeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("every registered release schema is flat scalar columns") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val schema =
        try fn(spark, sfDir).schema
        catch {
          case e: Throwable =>
            fail(s"$name failed to build at $sfDir: ${e.getMessage}", e)
        }
      schema.fields.foreach { f =>
        f.dataType match {
          case _: ArrayType | _: MapType | _: StructType =>
            bad += s"$name.${f.name}: ${f.dataType.simpleString}"
          case _ => ()
        }
      }
    }
    assert(bad.isEmpty,
      s"nested-typed release columns (driver cannot canonicalize them; " +
        s"explode to scalar rows like q174/q212 do):\n  " +
        bad.mkString("\n  "))
  }
}
