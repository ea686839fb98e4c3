package graft

import org.apache.spark.sql.functions._

/** The training-data ops CLI surface (`JobMain --op …`): a data engineer
  * drives dedup/ANN/text ops from JSON config + parquet paths, no Scala —
  * the same no-code contract the CDC side has via settings.json. */
class OpsMainSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001/documents.parquet"
  private val embs = "/root/testdata/sf0.001/embeddings.parquet"

  private def writeConfig(json: String): String = {
    val p = java.nio.file.Files.createTempFile("graft-opconf", ".json")
    java.nio.file.Files.writeString(p, json)
    p.toString
  }

  test("dedup_minhash from JSON config == direct API call") {
    val conf = writeConfig("""{"threshold": 0.7, "text_col": "text", "id_col": "doc_id"}""")
    val viaCli = JobMain.runOp(spark,
        Seq("--op", "dedup_minhash", "--in", docs, "--config", conf))
      .orderBy("id_a", "id_b").collect().map(_.toString)
    val direct = graft.ops.Dedup.minhashNearDups(
        spark.read.parquet(docs), threshold = 0.7)
      .orderBy("id_a", "id_b").collect().map(_.toString)
    assert(viaCli.nonEmpty && viaCli.sameElements(direct))
  }

  test("ann_ivf from JSON config == direct API call; defaults fill unset keys") {
    val conf = writeConfig("""{"k": 5, "cells": 8, "id_col": "vec_id"}""")
    val viaCli = JobMain.runOp(spark,
        Seq("--op", "ann_ivf", "--in", embs, "--config", conf))
      .orderBy("q_id", "rank").collect().map(_.toString)
    val direct = graft.ops.Similarity.ivfTopK(
        spark.read.parquet(embs), spark.read.parquet(embs), k = 5, cells = 8)
      .orderBy("q_id", "rank").collect().map(_.toString)
    assert(viaCli.nonEmpty && viaCli.sameElements(direct))
  }

  test("text_stats without config uses defaults; unknown op fails loudly") {
    val st = JobMain.runOp(spark, Seq("--op", "text_stats", "--in", docs))
    assert(st.count() == spark.read.parquet(docs).count())
    assert(st.columns.contains("ws_tokens"))
    val e = intercept[IllegalArgumentException](
      JobMain.runOp(spark, Seq("--op", "frobnicate", "--in", docs)))
    assert(e.getMessage.contains("unknown --op"))
    intercept[IllegalArgumentException](JobMain.runOp(spark, Seq("--op", "text_stats")))
  }

  test("dedup_embedding honors vec_col/id_col overrides") {
    val renamed = spark.read.parquet(embs)
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val tmp = tmpDir("graft-opsmain") + "/renamed"
    renamed.write.parquet(tmp)
    val conf = writeConfig("""{"threshold": 0.9, "vec_col": "emb", "id_col": "vid"}""")
    val viaCli = JobMain.runOp(spark,
        Seq("--op", "dedup_embedding", "--in", tmp, "--config", conf))
      .orderBy("id_a", "id_b").collect().map(_.toString)
    val direct = graft.ops.Dedup.embeddingNearDups(
        spark.read.parquet(embs), threshold = 0.9)
      .orderBy("id_a", "id_b").collect().map(_.toString)
    assert(viaCli.sameElements(direct))
  }
}
