package graft

import graft.operators.ml._
import org.apache.spark.sql.functions._

/** Gates on the trained embedding encoder: the frozen projection must
  * keep near-duplicate payloads close and unrelated payloads apart on a
  * freshly generated corpus, and the full embed→near-dup chain must run
  * config-driven end to end. */
class EmbeddingModelSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("near-dup payloads embed close; unrelated ones far (held-out corpus)") {
    val texts = EmbeddingTrainer.textCorpus(60, seed = 99L) // NOT the training seed
    val embOf = (b: Array[Byte]) =>
      TrainedEmbedding.projection.embed(EmbeddingFeatures.fromAny(b))
    // near-dup pairs: one word substituted near the front
    val nearDupCos = texts.take(30).map { t =>
      val s = new String(t, "UTF-8")
      val mutated = s.replaceFirst("\\w+", "changed")
      cos(embOf(t), embOf(mutated.getBytes("UTF-8")))
    }
    // unrelated pairs: disjoint docs
    val unrelatedCos = texts.take(30).zip(texts.drop(30).take(30)).map {
      case (a, b) => cos(embOf(a), embOf(b))
    }
    val nearAvg = nearDupCos.sum / nearDupCos.size
    val farAvg = unrelatedCos.sum / unrelatedCos.size
    assert(nearAvg > 0.98, f"near-dup cosine $nearAvg%.4f")
    assert(nearAvg - farAvg > 0.05,
      f"separation: near $nearAvg%.4f vs unrelated $farAvg%.4f")
    // distinct content classes (image vs text) land apart
    val img = EmbeddingTrainer.corpus(5, seed = 99L).head // a rendered BMP
    assert(cos(embOf(img), embOf(texts.head)) < nearAvg - 0.05)
  }

  test("embeddings are unit-norm float32 through the batch slot") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("image", col("text").cast("binary"))
    val emb = TrainedEmbedding(docs)
    assert(emb.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val rows = emb.select("embedding").as[Array[Float]].take(50)
    assert(rows.forall(_.length == TrainedEmbedding.embeddingDim))
    assert(rows.forall(e => math.abs(math.sqrt(e.map(x => x.toDouble * x).sum) - 1.0) < 1e-4))
  }

  test("config chain: trained embedding feeds near-dup suppression e2e") {
    val dir = java.nio.file.Files.createTempDirectory("graft_embchain").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (3L, "a completely different technical report about distributed sql engines"))
      .toDF("doc_id", "text")
      .withColumn("image", col("text").cast("binary"))
      .write.parquet(s"$dir/in")
    val yaml =
      s"""data_loader: {type: ParquetLoader, params: {path: $dir/in}}
         |operators:
         |  - name: image_trained_embedding_refiner
         |  - name: embedding_near_dup_deduplicator
         |    params: {threshold: 0.999, dim: 8, vec_field: embedding}
         |data_writer: {type: ParquetDataWriter, params: {path: $dir/out}}
         |""".stripMargin
    val job = graft.pipeline.PipelineConfig.parseJob(yaml)
    job.run(spark)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.columns.contains("embedding"))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // identical doc 2 suppressed by its embedding
  }

  test("config chain: semantic_deduplicator clusters then collapses near-dups") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semchain").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (3L, "a completely different technical report about distributed sql engines"))
      .toDF("doc_id", "text")
      .withColumn("image", col("text").cast("binary"))
      .write.parquet(s"$dir/in")
    val yaml =
      s"""data_loader: {type: ParquetLoader, params: {path: $dir/in}}
         |operators:
         |  - name: image_trained_embedding_refiner
         |  - name: semantic_deduplicator
         |    params: {threshold: 0.999, k: 2, vec_field: embedding}
         |data_writer: {type: ParquetDataWriter, params: {path: $dir/out}}
         |""".stripMargin
    val job = graft.pipeline.PipelineConfig.parseJob(yaml)
    job.run(spark)
    val out = spark.read.parquet(s"$dir/out")
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // identical doc 2 collapses inside its cluster
    assert(out.columns.contains("text")) // survivors keep all columns
  }

  test("weights-file seam: the exported default head serves BIT-IDENTICAL " +
      "embeddings through the batched pass, file-driven via YAML too") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_weights").toString
    val wp = s"$tmp/clip_head.weights"
    // export the in-repo PCA to the LocalWeights format -- the format
    // provably covers the default model...
    LocalWeights.write(spark, wp,
      LocalWeights.fromProjection(TrainedEmbedding.projection))
    // ...and round-trips losslessly (Double.toString; render = the
    // canonical structural form, the case classes hold Arrays)
    assert(LocalWeights.render(LocalWeights.load(spark, wp)) ==
      LocalWeights.render(
        LocalWeights.fromProjection(TrainedEmbedding.projection)))
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("image", col("text").cast("binary")).limit(40)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => (id, e.toSeq) }.toMap
    // Standardize is a distinct layer kind, so the file-served forward
    // repeats the in-repo arithmetic exactly -- bit-for-bit equality
    assert(rows(TrainedEmbedding.fromWeightsFile(docs, wp)) ==
      rows(TrainedEmbedding(docs)))
    // the registry op serves the file when weights_path is set
    val viaRegistry = graft.pipeline.OperatorRegistry.build(
      "image_trained_embedding_refiner",
      Map[String, Any]("weights_path" -> wp)) match {
      case graft.pipeline.RefineOp(_, f) => f(docs)
      case other => fail(s"unexpected op $other")
    }
    assert(rows(viaRegistry.select("doc_id", "embedding")) ==
      rows(TrainedEmbedding(docs)))
  }

  test("weights-file seam: a NON-default generated head (relu hidden layer) " +
      "loads and serves; malformed files fail loudly") {
    import LocalWeights._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_weights2").toString
    // a hand-generated 12 -> 4(relu) -> 3 head with l2norm -- what a
    // user-trained replacement looks like
    val gen = Mlp(12, Seq(
      Dense(Array.tabulate(4, 12)((i, j) => ((i * 12 + j) % 7 - 3) * 0.25),
        Array(0.1, -0.2, 0.3, 0.0), "relu"),
      Dense(Array.tabulate(3, 4)((i, j) => (i - j) * 0.5),
        Array(0.0, 0.0, 0.0), "linear")), l2 = true)
    val wp = s"$tmp/gen.weights"
    write(spark, wp, gen)
    assert(render(load(spark, wp)) == render(gen))
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("image", col("text").cast("binary")).limit(10)
    val out = TrainedEmbedding.fromWeightsFile(docs, wp)
      .as[(Long, Array[Float])].collect()
    assert(out.length == 10)
    assert(out.forall(_._2.length == 3))
    // served vectors are l2-normalized
    assert(out.forall { case (_, e) =>
      math.abs(e.map(x => x.toDouble * x).sum - 1.0) < 1e-5 ||
        e.forall(_ == 0.0f)
    })
    // loud failures: bad header, width mismatch, unknown directive
    assertThrows[IllegalArgumentException](parse("not-a-header", "t"))
    assertThrows[IllegalArgumentException](parse(
      "graft-weights 1\ninput 2\ndense 1 linear\nw 1.0 2.0 3.0\nb 0.0", "t"))
    assertThrows[IllegalArgumentException](parse(
      "graft-weights 1\ninput 2\nconv 3", "t"))
  }

  test("trained embedding feeds LSH ANN on model output") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("image", col("text").cast("binary"))
    val emb = TrainedEmbedding(docs).withColumnRenamed("doc_id", "vec_id")
    val ann = graft.operators.vector.LshAnn(dim = 8, nbits = 4,
      idCol = "vec_id", vecCol = "embedding")
    val res = ann.topK(emb, k = 5, col("vec_id") < 3)
    assert(res.count() > 0) // vector suite runs on model output end to end
  }
}
