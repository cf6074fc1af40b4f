package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class LayerIOSpec extends SparkSpec {
  import spark.implicits._

  val claimsSchema: StructType = StructType(Seq(
    StructField("claim_id", StringType),
    StructField("amount", DoubleType),
    StructField("service_date", DateType)))

  test("PERMISSIVE csv read captures corrupt rows instead of failing") {
    val dir = Files.createTempDirectory("csv_in")
    Files.writeString(dir.resolve("claims.csv"),
      "claim_id,amount,service_date\nC1,10.5,2024-01-02\nC2,notanumber,2024-01-03\nC3,7.25,2024-01-04\n")
    // cache first: Spark disallows querying only _corrupt_record on raw CSV
    val df = LayerIO.readCsv(spark, dir.toString, claimsSchema).cache()
    assert(df.count() == 3)
    assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
    assert(df.filter($"_corrupt_record".isNull).count() == 2)
  }

  test("inferSchema csv read types clean columns and nulls bad cells") {
    val dir = Files.createTempDirectory("csv_inf")
    Files.writeString(dir.resolve("claims.csv"),
      "claim_id,amount,service_date\nC1,10.5,2024-01-02\nC2,notanumber,2024-01-03\nC3,7.25,2024-01-04\n")
    val df = LayerIO.readCsvInferred(spark, dir.toString).cache()
    // a non-numeric cell forces `amount` to string under inference —
    // exactly the silent-widening failure mode readCsv's declared
    // schema exists to prevent; the reference's inferSchema ingest
    // accepts it, so this entry point must too
    assert(df.count() == 3)
    assert(df.schema("claim_id").dataType == StringType)
    assert(df.schema("amount").dataType == StringType)
    // a clean numeric column infers to a numeric type on its own file
    val dir2 = Files.createTempDirectory("csv_inf2")
    Files.writeString(dir2.resolve("claims.csv"),
      "claim_id,amount\nC1,10.5\nC3,7.25\n")
    val df2 = LayerIO.readCsvInferred(spark, dir2.toString)
    assert(df2.schema("amount").dataType == DoubleType)
    assert(df2.as[(String, Double)].collect().toSet ==
      Set(("C1", 10.5), ("C3", 7.25)))
  }

  test("PERMISSIVE jsonl read captures corrupt lines; writeJsonl round-trips") {
    val dir = Files.createTempDirectory("jsonl_in")
    Files.writeString(dir.resolve("claims.json"),
      """{"claim_id":"C1","amount":10.5}
        |{"claim_id":"C2","amount":"notanumber"}
        |not json at all
        |{"claim_id":"C3","amount":7.25}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("claim_id", StringType), StructField("amount", DoubleType)))
    val df = LayerIO.readJsonl(spark, dir.toString, schema).cache()
    assert(df.count() == 4)
    assert(df.filter($"_corrupt_record".isNotNull).count() == 2)
    val good = df.filter($"_corrupt_record".isNull)
      .select("claim_id", "amount").as[(String, Double)].collect().toSet
    assert(good == Set(("C1", 10.5), ("C3", 7.25)))
    // sink round trip
    val out = Files.createTempDirectory("jsonl_out").resolve("t").toString
    LayerIO.writeJsonl(good.toSeq.toDF("claim_id", "amount"), out)
    val back = LayerIO.readJsonl(spark, out, schema)
      .select("claim_id", "amount").as[(String, Double)].collect().toSet
    assert(back == good)
    df.unpersist()
  }

  test("ORC round trip preserves rows and pushes filters to the scan") {
    val out = Files.createTempDirectory("orc_out").resolve("t").toString
    val src = (1L to 1000L).map(i => (i, s"n$i", i * 1.5)).toDF("k", "name", "v")
    LayerIO.writeOrc(src, out)
    val back = LayerIO.readOrc(spark, out)
    assert(back.count() == 1000)
    val filtered = back.filter($"k" > 900).select("k", "v")
    assert(filtered.count() == 100)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,900)"),
      s"ORC scan must receive the pushed filter:\n$scan")
  }

  test("compact merges a fragmented layout into few files, same rows") {
    val path = Files.createTempDirectory("compact").resolve("t").toString
    val frag = spark.range(10000).select($"id", ($"id" % 7).as("v"))
      .repartition(64) // 64 tiny input partitions
    LayerIO.compact(frag, path)
    val back = spark.read.parquet(path)
    assert(back.count() == 10000)
    assert(back.agg(sum($"v")).as[Long].collect()(0) ==
      frag.agg(sum($"v")).as[Long].collect()(0))
    val files = new java.io.File(path).listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(files < 8, s"AQE rebalance should merge 64 fragments, wrote $files")
  }

  test("appendOrCreate: partitioned create, then append; partition pruning works") {
    val path = Files.createTempDirectory("layer").resolve("bronze").toString
    val day1 = Seq(("C1", 10.0, "2024-01-01"), ("C2", 20.0, "2024-01-02"))
      .toDF("claim_id", "amount", "d").withColumn("ingestion_date", to_date($"d")).drop("d")
    assert(!LayerIO.layerExists(spark, path))
    LayerIO.appendOrCreate(day1, spark, path, "ingestion_date")
    assert(LayerIO.layerExists(spark, path))
    val day2 = Seq(("C3", 30.0, "2024-01-03")).toDF("claim_id", "amount", "d")
      .withColumn("ingestion_date", to_date($"d")).drop("d")
    LayerIO.appendOrCreate(day2, spark, path, "ingestion_date")
    val back = LayerIO.readLayer(spark, path)
    assert(back.count() == 3)
    // partition pruning: filter on the partition column reads one directory
    val pruned = back.filter($"ingestion_date" === to_date(lit("2024-01-03")))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 1)
    assert(!scan.contains("2024-01-01") || scan.contains("PartitionFilters"),
      "partition filter must be pushed to the scan")
  }

  test("appendEvolved: widened batch appends; merge-on-read surfaces old rows with NULLs") {
    val path = Files.createTempDirectory("layer").resolve("evolved").toString
    LayerIO.appendEvolved(spark,
      Seq(("C1", 10.0)).toDF("claim_id", "amount"), path)
    // the feed widens: a new source starts shipping `channel`
    LayerIO.appendEvolved(spark,
      Seq(("C2", 20.0, "web")).toDF("claim_id", "amount", "channel"), path)
    val back = LayerIO.readLayerEvolved(spark, path)
    assert(back.columns.sorted.toSeq == Seq("amount", "channel", "claim_id"))
    val rows = back.orderBy("claim_id")
      .select("claim_id", "channel").as[(String, Option[String])].collect().toSeq
    assert(rows == Seq(("C1", None), ("C2", Some("web"))),
      "pre-widening rows must read back with NULL for the new column")
  }

  test("appendEvolved rejects type changes (evolution adds columns, never retypes)") {
    val path = Files.createTempDirectory("layer").resolve("retype").toString
    LayerIO.appendEvolved(spark, Seq(("C1", 10.0)).toDF("claim_id", "amount"), path)
    val err = intercept[IllegalArgumentException] {
      LayerIO.appendEvolved(spark,
        Seq(("C2", "twenty")).toDF("claim_id", "amount"), path)
    }
    assert(err.getMessage.contains("amount"))
  }

  test("overwriteViaStaging replaces a table the new plan reads from") {
    val path = Files.createTempDirectory("layer").resolve("swap").toString
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").write.parquet(path)
    // the replacement plan READS the current table — the in-place
    // overwrite hazard this API exists to remove
    val doubled = LayerIO.readLayer(spark, path).withColumn("v", $"v" * 2)
    LayerIO.overwriteViaStaging(spark, doubled, path)
    val back = LayerIO.readLayer(spark, path).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(back == Seq((1L, 2.0), (2L, 4.0)))
    // no staging/old residue left beside the table
    val parent = new java.io.File(path).getParentFile.list().toSeq
    assert(parent == Seq("swap"), s"residue: $parent")
  }

  test("registerTable makes the layer SQL-addressable") {
    val path = Files.createTempDirectory("layer").resolve("gold").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(path)
    LayerIO.registerTable(spark, "gold_test", path)
    assert(spark.sql("SELECT count(*) FROM gold_test").as[Long].collect()(0) == 1L)
  }
}
