package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The native token kernel must be bit-identical to the HOF formulation it
  * replaced (which is what the DuckDB oracle mirrors), on every input shape
  * including ones no fixture currently produces. */
class TokenSeqSpec extends SparkSpec {
  import graft.queries.Queries

  private val A = 2654435761L
  private val B = 40503L
  private val V = graft.feed.ChangeFeed.VOCAB

  private def hof(eid: org.apache.spark.sql.Column, nTok: org.apache.spark.sql.Column) =
    transform(sequence(lit(1), nTok),
      x => (((eid % V) * A + x.cast(LongType) * B) % V).cast("int"))

  test("token_seq == transform/sequence HOF on adversarial inputs") {
    import spark.implicits._
    val rows = Seq[(java.lang.Long, java.lang.Integer)](
      (0L, 1), (1L, 8), (12345L, 64), (3470000000L, 57), // past the eid*A overflow line
      (Long.MaxValue, 3), (-7L, 4), // negative eid: Java % sign semantics
      (42L, 0), (42L, -2), // sequence(1, n<1) descends — never hit, still equal
      (null, 5), (9L, null)) // null propagation
      .toDF("eid", "n")
    val both = rows.select(
      Queries.tokensExpr(col("eid"), col("n")).as("native"),
      hof(col("eid"), col("n")).as("hof"))
    both.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(r.getSeq[Int](0) == r.getSeq[Int](1), s"value mismatch: $r")
    }
    // and through codegen'd paths over a real range (not just a local relation)
    val wide = spark.range(10000).select(
      (col("id") * 37).as("eid"), (lit(8) + col("id") % 57).cast("int").as("n"))
    val diff = wide.select(
        Queries.tokensExpr(col("eid"), col("n")).as("a"),
        hof(col("eid"), col("n")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }
}
