package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The JSONL/CSV source round-trip contract (`jsonl_scan`/`csv_scan`):
  * exact value fidelity through each format codec, and — what the
  * oracle can't see because the landed corpus is well-formed —
  * PERMISSIVE corrupt-record ACCOUNTING when it isn't.
  */
class SourceScanSpec extends SparkSpec {

  private val schema = Queries.SourceReadSchema

  test("jsonl round-trip is value-exact incl. quotes, backslashes, newlines, non-ascii") {
    val dir = java.nio.file.Files.createTempDirectory("graft_srcspec_j").toString + "/d"
    val decorated = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        concat(col("text"), lit(Queries.SourceDecoration)).as("text"))
    decorated.write.option("compression", "gzip").json(dir)
    val back = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .cache()
    assert(back.filter(col("_corrupt").isNotNull).count() === 0)
    // anti-join both directions on every value column = exact multiset equality
    val a = decorated.select("doc_id", "lang", "source", "text")
    val b = back.select("doc_id", "lang", "source", "text")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("csv multiLine round-trip is value-exact with embedded newlines and quotes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_srcspec_c").toString + "/d"
    val decorated = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        concat(col("text"), lit(Queries.SourceDecoration)).as("text"))
    decorated.write.option("header", "true").option("escape", "\"").csv(dir)
    val back = spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true").option("escape", "\"")
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
      .csv(dir)
      .cache()
    assert(back.filter(col("_corrupt").isNotNull).count() === 0)
    val a = decorated.select("doc_id", "lang", "source", "text")
    val b = back.select("doc_id", "lang", "source", "text")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("astral-plane unicode (surrogate pairs) survives both format round-trips") {
    // beyond the BMP decoration: emoji, Gothic hwair, a musical symbol —
    // JSON escapes these as 😀-style surrogate pairs, CSV
    // carries raw UTF-8; either path mangling them breaks exceptAll
    import spark.implicits._
    val rows = Seq(
      (1L, "en", "s1", "emoji 😀🎉 mixed"),
      (2L, "en", "s1", "gothic 𐍈 hwair"),
      (3L, "en", "s2", "clef 𝄞 and text"),
      (4L, "en", "s2", "zwj family 👨‍👩‍👦")
    ).toDF("doc_id", "lang", "source", "text")
    for ((fmt, write, read) <- Seq[(String,
        (org.apache.spark.sql.DataFrame, String) => Unit,
        String => org.apache.spark.sql.DataFrame)](
      ("json",
        (df, p) => df.write.option("compression", "gzip").json(p),
        p => spark.read.schema(schema)
          .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
          .json(p)),
      ("csv",
        (df, p) => df.write.option("header", "true").option("escape", "\"").csv(p),
        p => spark.read.schema(schema)
          .option("header", "true").option("multiLine", "true").option("escape", "\"")
          .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
          .csv(p)))) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_srcspec_u_$fmt").toString + "/d"
      write(rows, dir)
      val back = read(dir).cache()
      assert(back.filter(col("_corrupt").isNotNull).count() === 0, s"$fmt corrupt")
      val a = rows.select("doc_id", "lang", "source", "text")
      val b = back.select("doc_id", "lang", "source", "text")
      assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0, s"$fmt mangled")
    }
  }

  test("xml round-trip is value-exact incl. entity-escaped chars and the decoration") {
    import spark.implicits._
    val rows = Seq(
      (1L, "en", "s1", "markup chars & < > \" ' in text"),
      (2L, "en", "s1", "entity lookalikes &amp; &lt; stay literal"),
      (3L, "en", "s2", "cdata trap ]]> inside text"),
      (4L, "en", "s2", "decoration " + Queries.SourceDecoration)
    ).toDF("doc_id", "lang", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_srcspec_x").toString + "/d"
    rows.write.format("xml").option("rootTag", "docs").option("rowTag", "doc").save(dir)
    val back = spark.read.schema(schema)
      .format("xml").option("rowTag", "doc")
      .option("ignoreSurroundingSpaces", "false")
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
      .load(dir)
      .cache()
    assert(back.filter(col("_corrupt").isNotNull).count() === 0)
    val a = rows.select("doc_id", "lang", "source", "text")
    val b = back.select("doc_id", "lang", "source", "text")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
      "xml entity escaping must be lossless")
  }

  test("malformed jsonl lines are counted in _corrupt, not dropped or fatal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_srcspec_m").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-bad.json"),
      ("""{"doc_id": 1, "lang": "en", "source": "s", "text": "ok"}""" + "\n" +
        """{"doc_id": "NOT_A_NUMBER_", "lang": "en"""" + "\n" + // truncated line
        """not json at all""" + "\n" +
        """{"doc_id": 2, "lang": "en", "source": "s", "text": "also ok"}""" + "\n")
        .getBytes("UTF-8"))
    val back = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .cache()
    assert(back.count() === 4, "every line yields a row")
    assert(back.filter(col("_corrupt").isNotNull).count() === 2)
    assert(back.filter(col("_corrupt").isNull).count() === 2)
    // good rows parsed with full values
    assert(back.filter(col("_corrupt").isNull).agg(sum("doc_id")).head().getLong(0) === 3L)
  }
}
