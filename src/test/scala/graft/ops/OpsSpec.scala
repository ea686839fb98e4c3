package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.RollingHash.rolling_hash

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash: native expression matches a plain Scala fold; codegen path") {
    val df = Seq("hello world", "the quick brown fox", "").toDF("t")
    def oracle(s: String): Long = {
      var h = 0L; s.toLowerCase.trim.foreach(c => h = (h * 31 + c) % 1000000007L); h
    }
    val got = df.select(col("t"), graft.ops.TextAnalysis.rollingFingerprint(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (s, h) => assert(h == oracle(s), s"hash mismatch for '$s'") }
    // expression participates in codegen (LocalTableScan never codegens; use range)
    val plan = spark.range(10).select(rolling_hash(col("id")))
      .queryExecution.executedPlan.toString
    // "*(n)" marks WholeStageCodegen stages in the abbreviated plan string
    assert(plan.contains("*(1) Project [rolling_hash"), "hot path stays codegen'd")
    // null flows through
    val n = Seq[(String)](null).toDF("t").select(rolling_hash(col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("stats tokenize the NORMALIZED text: caps match stopwords, doubled " +
    "spaces mint no empty tokens, null text stays null (never quality 1.0)") {
    val df = Seq(
      ("d1", "THE CAT AND THE DOG IS HERE"),        // caps: 5 stopword hits
      ("d2", "the  cat   and  the dog"),            // runs collapse: 5 tokens
      ("d3", null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.stats(df, "text", "doc_id").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("d1").getAs[Int]("stopwords") == 4, got("d1").toString)
    assert(got("d2").getAs[Int]("ws_tokens") == 5, got("d2").toString)
    assert(got("d2").getAs[Int]("stopwords") == 3)
    // null text: size(split(null)) is -1 under legacy sizeOfNull — before the
    // fix stopwordRatio was (-1)/(-1) = 1.0 and a null doc scored 0.4 quality
    assert(got("d3").isNullAt(1) && got("d3").isNullAt(4), got("d3").toString)
    assert(got("d3").getAs[Double]("quality") == 0.0)
    // caps doc now language-IDs as English, not the alphabetical 'de' default
    assert(got("d1").getAs[String]("lang_guess") == "en")
  }

  test("rolling_hash rejects (prime, mod) that overflow the Long fold") {
    val e = intercept[IllegalArgumentException](
      graft.functions.RollingHash(
        org.apache.spark.sql.catalyst.expressions.Literal("x"),
        prime = 31L, mod = 1000000000000000003L))
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }

  test("bpe-ish token count: letter runs, digit runs, single marks") {
    val got = Seq("hello world42!", "a-b c_d", "").toDF("t")
      .select(TextAnalysis.bpeTokenCount(col("t"))).collect().map(_.getInt(0))
    // "hello","world","42","!" = 4 ; "a","-","b","c","_","d" = 6 ; "" = 0
    assert(got.toSeq == Seq(4, 6, 0))
  }

  test("text stats: counts/ratios/quality/lang on documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val st = TextAnalysis.stats(docs).collect()
    assert(st.length == docs.count())
    st.foreach { r =>
      assert(r.getAs[Int]("ws_tokens") > 0)
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[String]("fingerprint").length == 32)
      assert(TextAnalysis.langMarkers.keySet.contains(r.getAs[String]("lang_guess")))
    }
    // deterministic across runs
    val st2 = TextAnalysis.stats(docs).collect()
    assert(st.map(_.toString).sorted.sameElements(st2.map(_.toString).sorted))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank now"), // near-dup of 1
    (3L, "completely different content about spark shuffles and catalyst plans here"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "unrelated text mentioning tokens embeddings and training data pipelines")
  ).toDF("doc_id", "text")

  test("exact dedup: hash-groupBy keeps min id with duplicate count") {
    val d = Dedup.exact(corpus).collect()
    assert(d.length == 4) // 1&4 collapse
    val dup = d.find(_.getAs[Long]("n_dups") == 2L).get
    assert(dup.getAs[Long]("keeper_id") == 1L)
  }

  test("minhash LSH finds the near-dup pair and not the distinct pair") {
    val pairs = Dedup.minhashNearDups(corpus, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)), s"expected near-dups, got $pairs")
    assert(pairs.contains((1L, 4L)) || pairs.contains((2L, 4L)), "exact dup pair found via LSH")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "distinct doc not paired")
  }

  test("ngram jaccard: exact dup == 1.0; near-dup high; verified against Scala") {
    val cand = Seq((1L, 2L), (1L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(corpus, cand).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(j((1L, 4L)) == 1.0)
    assert(j((1L, 2L)) > 0.5 && j((1L, 2L)) < 1.0)
    assert(j((1L, 3L)) < 0.1)
    // Scala oracle for (1,2)
    def sh(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (a, b) = (sh(corpus.collect()(0).getString(1)), sh(corpus.collect()(1).getString(1)))
    val expected = a.intersect(b).size.toDouble / a.union(b).size
    assert(math.abs(j((1L, 2L)) - expected) < 1e-12)
  }

  test("simhash banding requires bands | bits (silent truncation would skew " +
    "the collision probability)") {
    val df = spark.range(1).selectExpr("'x' as text", "id as doc_id")
    val e = intercept[IllegalArgumentException](
      Dedup.simhashNearDups(df, bits = 32, bands = 5))
    assert(e.getMessage.contains("divide"), e.getMessage)
    // bits > 64 wraps Long shifts into garbage signatures — rejected loudly
    val e2 = intercept[IllegalArgumentException](
      Dedup.simhashNearDups(df, bits = 128, bands = 4))
    assert(e2.getMessage.contains("[1,64]"), e2.getMessage)
  }

  test("simhash bands=1 bits=64: the full-width band mask is all-ones, not " +
    "the shift-wrapped 0 that would bucket every doc together") {
    // (1L << 64) - 1 == 0 under Java's mod-64 shift: before the fix every
    // doc landed in bucket 0 (an all-pairs join) AND distinct sigs collided
    val found = Dedup.simhashNearDups(corpus, maxHamming = 0, bits = 64, bands = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // only the identical pair (1,4) shares a full 64-bit signature
    assert(found.sameElements(Array((1L, 4L))), found.mkString(","))
  }

  test("simhash: identical text → identical sig; near-dup within hamming bound") {
    val sigs = corpus.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(4L))
    val found = Dedup.simhashNearDups(corpus, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 4L)))
    assert(!found.exists(p => Set(p._1, p._2) == Set(1L, 3L)))
  }

  test("embedding near-dup: planted duplicate vector found") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val all = emb.unionAll(planted)
    val exact = Dedup.embeddingNearDupsExact(all, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((0L, 10000L)))
    val lsh = Dedup.embeddingNearDups(all, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((0L, 10000L)), "identical vectors share every LSH bucket")
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("degenerate embeddings never poison results: a zero-norm (NaN cosine) " +
    "vector can't take rank 1, a null element / dim mismatch yields null") {
    val base = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f))) // zero-norm: cosine NaN against everything
      .toDF("vec_id", "embedding")
    val q = base.filter(col("vec_id") === 0)
    val got = Similarity.bruteForceTopK(q, base, k = 3)
      .orderBy("rank").collect().map(_.getAs[Long]("c_id"))
    // zero-norm → null cosine (nullif denominator): under ANSI the bare
    // division would CRASH the whole job; non-ANSI it's NaN, which Spark
    // sorts ABOVE all reals — rank 1 for every query. Both are excluded.
    assert(got.sameElements(Array(1L, 2L)), got.mkString(","))
    // null element → null cosine (kernel contract), excluded the same way
    val withNull = Seq((4L, Array[java.lang.Float](1.0f, null)))
      .toDF("vec_id", "embedding")
    val d = base.filter(col("vec_id") === 0).unionAll(withNull)
      .select(graft.functions.VectorOps.vec_cosine(
        col("embedding"), array(lit(1.0f), lit(0.0f))).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(d(0).contains(1.0) && d(1).isEmpty, d.mkString(","))
    // dimension mismatch → null, not a silently truncated dot product
    val mism = Seq((0L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
      .select(graft.functions.VectorOps.vec_dot(
        col("embedding"), array(lit(1.0f), lit(1.0f))).as("d")).head()
    assert(mism.isNullAt(0), "3-dim · 2-dim must be null")
    // and the zero-norm vector can't sneak through the near-dup threshold
    // either (NaN >= t is TRUE in Spark without the isnan guard)
    val pairs = Dedup.embeddingNearDupsExact(
      Seq((0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 0.0f)),
        (2L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 0.0f)))
        .toDF("vec_id", "embedding"), threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.sameElements(Array((2L, 3L))), pairs.mkString(","))
  }

  test("brute-force top-k matches a Scala oracle; LSH retrieves planted duplicate") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 3)
    val got = Similarity.bruteForceTopK(queries, emb, k = 5)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("c_id")).toList).toMap
    // Scala oracle
    val vecs = emb.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    (0L to 2L).foreach { q =>
      val expected = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toList
      assert(got(q) == expected, s"query $q: got ${got(q)} expected $expected")
    }
    // LSH: planted duplicate of vec 0 must be rank 1 (identical signature bucket)
    val base = emb.select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val lsh = Similarity.lshTopK(base.filter(col("vec_id") === 0),
      base.unionAll(planted), k = 3)
    val top = lsh.filter(col("rank") === 1).head()
    assert(top.getAs[Long]("c_id") == 10000L)
  }

  test("IVF ANN: planted twin is rank-1; decent recall vs brute force; codegen agrees") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
    val planted = queries.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val corpus = emb.unionAll(planted)
    val ivf = Similarity.ivfTopK(queries, corpus, k = 5, cells = 8, probes = 2)
      .collect().groupBy(_.getAs[Long]("q_id"))
    (0L until 5L).foreach { q =>
      val top = ivf(q).minBy(_.getAs[Int]("rank"))
      assert(top.getAs[Long]("c_id") == q + 10000,
        s"identical twin shares the cell and ranks first for query $q")
    }
    // recall@5 vs exact brute force (excluding the planted twins)
    val bf = Similarity.bruteForceTopK(queries, emb, k = 5)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    val got = ivf.view.mapValues(_.map(_.getAs[Long]("c_id")).filter(_ < 10000).toSet).toMap
    val recall = (0L until 5L).map(q => (bf(q) intersect got(q)).size.toDouble / 5).sum / 5
    assert(recall >= 0.4, s"multi-probe IVF recall@5 = $recall")

    // NearestCells: generated code == interpreted eval
    val cents = Similarity.trainCentroids(emb, cells = 8)
    val expr = graft.functions.VectorOps.nearest_cells(col("embedding"), cents, 3)
    def cellsOf(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try emb.select(col("vec_id"), expr.as("cells")).collect()
        .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]](1).toList).toMap
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(cellsOf("CODEGEN_ONLY") == cellsOf("NO_CODEGEN"))
  }

  test("nearest_cells: a poisoned (NaN) centroid cannot hijack probe " +
    "selection — real cells win on both eval paths") {
    import spark.implicits._
    // centroid 0 is NaN-poisoned (e.g. a NaN corpus embedding averaged into
    // its cell); centroid 1 points along +z, centroid 2 along -z. Once NaN
    // seeds bestScore, `x > NaN` is false forever without the displace clause
    val cents = Array(
      Array(Double.NaN, 0.0, 0.0), Array(0.0, 0.0, 1.0), Array(0.0, 0.0, -1.0))
    val df = Seq((1L, Seq(0.1f, 0.2f, 0.9f))).toDF("vec_id", "embedding")
    val expr = graft.functions.VectorOps.nearest_cells(col("embedding"), cents, 2)
    def cellsOf(mode: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(expr.as("cells")).head().getAs[scala.collection.Seq[Int]](0).toList
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // +z wins probe 1, -z probe 2; the NaN cell is never picked over real ones
    assert(cellsOf("NO_CODEGEN") == List(1, 2), cellsOf("NO_CODEGEN").toString)
    assert(cellsOf("CODEGEN_ONLY") == List(1, 2))
  }

  test("IVF on a tiny corpus: probes clamp to the trained centroids; empty " +
    "corpus fails with the problem named") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val one = emb.filter(col("vec_id") === 0)
    // 1-row corpus trains 1 centroid < probes=2 — must clamp, not die on the
    // kernel's bare require
    val r = Similarity.ivfTopK(one, one, k = 1, cells = 16, probes = 2,
      excludeSelf = false).collect()
    assert(r.length == 1 && r.head.getAs[Long]("c_id") == 0L)
    val e = intercept[IllegalArgumentException](
      Similarity.ivfTopK(one, one.filter(col("vec_id") < 0), k = 1))
    assert(e.getMessage.contains("empty"), e.getMessage)
  }

  test("trainCentroids accepts any numeric array element type (not just float)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val asDouble = emb.withColumn("embedding", col("embedding").cast("array<double>"))
    val cf = Similarity.trainCentroids(emb, cells = 4, iters = 1)
    val cd = Similarity.trainCentroids(asDouble, cells = 4, iters = 1)
    assert(cf.length == 4 && cd.length == 4)
    // float→double widening is exact, so the codebooks agree
    assert(cf.flatten.toSeq == cd.flatten.toSeq)
  }

  test("hyperplane signature: codegen and interpreted paths agree") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), Similarity.hyperplaneSignature(col("embedding"), 16).as("sig"))
    def sigs(mode: String): Map[Long, Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try emb.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val gen = sigs("CODEGEN_ONLY")
    val interp = sigs("NO_CODEGEN")
    assert(gen == interp, "generated code must match interpreted eval")
    assert(gen.values.toSet.size > 1, "signatures spread across buckets")
  }

  test("kernel input contract fails at ANALYSIS, not mid-job: numeric-but-" +
    "unsupported element types (decimal literals) are named before launch") {
    import spark.implicits._
    val df = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    // array(0.1, 0.2) is array<decimal(1,1)> — pre-contract this passed
    // analysis and killed the job at execution with a misleading error
    val e = intercept[org.apache.spark.sql.AnalysisException](
      df.select(graft.functions.VectorOps.vec_dot(
        col("embedding"),
        array(lit(BigDecimal(0.1)), lit(BigDecimal(0.2)))).as("d")).collect())
    assert(e.getMessage.contains("vec_dot"), e.getMessage)
  }

  test("nearest_cells: a dimension mismatch (wrong codebook) yields NULL " +
    "probes like vec_dot — never a silently truncated prefix score") {
    import spark.implicits._
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val rows = Seq(
      (0L, Array(0.9f, 0.1f)),          // matched dims → real probes
      (1L, Array(0.9f, 0.1f, 0.5f)))    // 3-dim vector vs 2-dim codebook
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), graft.functions.VectorOps.nearest_cells(
        col("embedding"), cents, probes = 1).as("cells"))
      .orderBy("vec_id").collect()
    assert(rows(0).getSeq[Int](1).toList == List(0), rows(0).toString)
    assert(rows(1).isNullAt(1), "mismatched dims must yield null probes")
    intercept[IllegalArgumentException](graft.functions.VectorOps.nearest_cells(
      col("embedding"), Array(Array(1.0), Array(0.0, 1.0)), probes = 1))
  }

  test("nearest_cells on a NON-NULLABLE containsNull=false child: the " +
    "mismatch null is data-dependent, so nullable must not be derived from " +
    "the child (a constant-false isNull would break the generated code)") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // array(lit...) is non-nullable with containsNull=false — toDF columns
    // are nullable and would mask the bug
    val out = spark.range(1).select(
      graft.functions.VectorOps.nearest_cells(
        array(lit(0.9), lit(0.1)), cents, probes = 1).as("ok"),
      graft.functions.VectorOps.nearest_cells(
        array(lit(0.9), lit(0.1), lit(0.5)), cents, probes = 1).as("bad"))
    assert(out.schema("ok").nullable && out.schema("bad").nullable)
    val r = out.head()
    assert(r.getSeq[Int](0).toList == List(0), r.toString)
    assert(r.isNullAt(1), "3-dim vector vs 2-dim codebook must yield null")
  }

  test("hyperplane_sig per-dimension hash cache grows correctly: a short " +
    "vector first must not truncate or corrupt a longer vector's signature") {
    import spark.implicits._
    def sig(v: Array[Float]): Long =
      Seq(Tuple1(v)).toDF("e")
        .select(graft.functions.VectorOps.hyperplane_sig(col("e"), 16).as("s"))
        .head().getLong(0)
    val short = Array.tabulate(4)(i => (i + 1).toFloat)
    val long = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val s1 = sig(short) // primes the cache at 4 dims
    val l1 = sig(long)  // forces a grow to 64
    assert(sig(short) == s1 && sig(long) == l1, "cache-grow must be stable")
    // ground truth recomputed directly from the XXH64 plane definition
    val expected = {
      val acc = new Array[Double](16)
      long.zipWithIndex.foreach { case (v, i) =>
        val hv = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.toLong, 42L)
        (0 until 16).foreach(h =>
          acc(h) += (if (((hv >>> h) & 1L) == 0L) v.toDouble else -v.toDouble))
      }
      (0 until 16).foldLeft(0L)((s, h) => if (acc(h) > 0) s | (1L << h) else s)
    }
    assert(l1 == expected, s"sig $l1 != direct recompute $expected")
  }
}

class MultimodalSpec extends SparkSpec {

  test("binary media plumbing: deterministic decode-stub features, balanced partitioning") {
    val media = Multimodal.synthetic(spark, 200)
    assert(media.schema("bytes").dataType == org.apache.spark.sql.types.BinaryType)
    val f1 = Multimodal.decodeFeatures(media, frameCount = 4).collect()
    val f2 = Multimodal.decodeFeatures(media, frameCount = 4).collect()
    assert(f1.map(_.toString).sorted.sameElements(f2.map(_.toString).sorted), "deterministic")
    f1.foreach { r =>
      val nb = r.getAs[Int]("n_bytes")
      val hist = r.getAs[scala.collection.Seq[Long]]("histogram")
      assert(hist.sum == nb, "histogram covers every byte")
      assert(r.getAs[Int]("frames_sampled") <= 4)
    }
    // resize keeps aspect bound
    val resized = Multimodal.resizeMeta(media, 640, 360).select("meta.width", "meta.height")
    resized.collect().foreach { r =>
      assert(r.getInt(0) <= 640 && r.getInt(1) <= 360)
    }
  }

  test("decodeFeatures tolerates null meta (the schema declares it nullable)") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.synthetic(spark, 20)
      .withColumn("meta", when(col("media_id") % 3 === 0, lit(null)).otherwise(col("meta")))
    val f = Multimodal.decodeFeatures(media, frameCount = 4).collect()
    assert(f.length == 20, "rows with null meta decode too (meta is unused by the codec)")
  }

  test("codec is pluggable: a second MediaCodec runs through the same pipeline " +
    "(stub is just the default impl)") {
    // toy alternative "decoder": counts only even bytes, fixed frame count —
    // deliberately different outputs so a silent fallback to the stub would fail
    object EvenByteCodec extends Multimodal.MediaCodec {
      def decodeAndExtract(row: Multimodal.MediaRow, frameCount: Int): Multimodal.MediaFeatures = {
        val bytes = if (row.bytes == null) Array.empty[Byte] else row.bytes
        val hist = new Array[Long](16)
        var even = 0L
        bytes.foreach { b => if ((b & 1) == 0) { even += 1; hist((b & 0xff) % 16) += 1 } }
        Multimodal.MediaFeatures(row.media_id, row.kind, bytes.length, even, hist, frameCount)
      }
    }
    val media = Multimodal.synthetic(spark, 60)
    val alt = Multimodal.decodeFeatures(media, frameCount = 4, codec = EvenByteCodec)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("content_hash")).toMap
    val stub = Multimodal.decodeFeatures(media, frameCount = 4)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("content_hash")).toMap
    assert(alt.keySet == stub.keySet, "same rows through the same plumbing")
    assert(alt != stub, "the alternative codec's features actually differ")
    // per-row: the alt hash is the even-byte count — recompute one row locally
    val one = media.filter(org.apache.spark.sql.functions.col("media_id") === 7L)
      .select("bytes").head().getAs[Array[Byte]](0)
    assert(alt(7L) == one.count(b => (b & 1) == 0).toLong)
  }

  test("NULL inputs degrade to NULL outputs, never to confident fakes: " +
    "lang_guess, simhash column form, resizeMeta null field, IVF training") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // lang_guess(NULL) was "de" (the fold seed); simhash(NULL) was 0L (a
    // signature that hamming-collides with any true all-zero signature)
    val nulls = spark.range(1).select(lit(null).cast("string").as("text"))
    val r = nulls.select(
      TextAnalysis.langGuess(col("text")).as("lang"),
      Dedup.simhash(col("text")).as("sig")).head()
    assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
    // resizeMeta: a null WIDTH inside a non-null meta stayed null — Spark's
    // greatest/least skip nulls, so the unguarded rewrite minted width=1
    val mSchema = StructType(Seq(StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("duration_ms", LongType), StructField("codec", StringType))))))
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row(null, 500, 0L, "x"))), 1), mSchema)
    val rm = Multimodal.resizeMeta(m, 640, 640).select("meta.width", "meta.height").head()
    assert(rm.isNullAt(0), s"null width must stay null: $rm")
    assert(rm.isNullAt(1), s"null scale (from null width) must null height " +
      s"too, not corrupt it: $rm")
    // trainCentroids: a NULL embedding and a dimension-mismatched one among
    // the corpus rows must degrade (skip), not NPE the whole job
    val vSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val vecs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Seq(1.0, 0.0)), Row(2L, Seq(0.0, 1.0)),
      Row(3L, null), Row(4L, Seq(9.9)) // null + wrong-dimension rows
    ), 2), vSchema)
    val cents = Similarity.trainCentroids(vecs, cells = 2, iters = 2)
    assert(cents.length == 2 && cents.forall(_.length == 2))
  }
}
