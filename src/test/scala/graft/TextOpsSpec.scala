package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize lowercases, splits on non-alphanumerics and drops empties") {
    val out = Seq(Tuple1("  Hello, World!  x2 ")).toDF("text")
      .select(TextOps.tokenize(col("text"))).as[Seq[String]].head()
    assert(out == Seq("hello", "world", "x2"))
  }

  test("shingles yields n-k+1 hashes and empty below k") {
    val df = Seq(Tuple1("a b c d")).toDF("text")
    val sh = df.select(TextOps.shingles(TextOps.tokenize(col("text")), 3)).as[Seq[String]].head()
    assert(sh.length == 2) // abc, bcd
    val short = Seq(Tuple1("a b")).toDF("text")
      .select(TextOps.shingles(TextOps.tokenize(col("text")), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("extractTitle takes the first markdown heading, strips #, caps at 200") {
    val cases = Seq(
      ("## My Title\nbody text", "src/path/doc.md", "My Title"),
      ("no heading here\njust text", "dir/sub/file.txt", "file.txt"),
      ("   #   Padded Heading   \nrest", "x", "Padded Heading"),
      ("#" + ("T" * 300), "y", "T" * 200)
    ).toDF("text", "source", "expected")
    val out = cases.withColumn("got", TextOps.extractTitle(col("text"), col("source")))
      .filter(col("got") =!= col("expected"))
    assert(out.count() == 0, out.select("got", "expected").collect().mkString("; "))
  }

  test("extractTitle falls back to windows-style basename") {
    val out = Seq(Tuple1(("plain text", "C:\\docs\\file.pdf"))).toDF("pair")
      .select(TextOps.extractTitle(col("pair._1"), col("pair._2"))).as[String].head()
    assert(out == "file.pdf")
  }

  test("hashedBowDim is stable and within [0, 64)") {
    val terms = Seq("spark", "filter", "join", "stream", "spark").toDF("term")
    val dims = terms.select(TextOps.hashedBowDim(col("term")).as("d")).as[Long].collect()
    assert(dims.forall(d => d >= 0 && d < 64))
    assert(dims(0) == dims(4), "same term must hash to the same dim")
  }

  test("minHash is order-insensitive over the shingle set") {
    val a = Seq(Tuple1(Seq("s1", "s2", "s3"))).toDF("sh")
    val b = Seq(Tuple1(Seq("s3", "s1", "s2"))).toDF("sh")
    val ha = a.select(TextOps.minHash(col("sh"), 0)).as[String].head()
    val hb = b.select(TextOps.minHash(col("sh"), 0)).as[String].head()
    assert(ha == hb)
  }
}
