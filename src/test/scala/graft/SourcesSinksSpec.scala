package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{SourcesSinks, Tables}

/** §2.A file-format surface: round-trips and output shapes. */
class SourcesSinksSpec extends AnyFunSuite with SparkFixture {

  test("CSV round-trip preserves rows, schema, and null sentinel") {
    val out = tmpDir("csv_rt")
    val nation = Tables.nation(spark, sfDir)
    SourcesSinks.writeCsv(nation, s"$out/nation")
    val back = SourcesSinks.readCsv(spark, s"$out/nation",
      Tables.nationSchema)
    assert(back.schema == nation.schema)
    assert(back.exceptAll(nation).count() == 0)
    assert(nation.exceptAll(back).count() == 0)
    // sentinel handling: -1 and empty both land as null
    val sentinelCsv = s"$out/sent"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(sentinelCsv))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$sentinelCsv/part.csv"),
      "n_nationkey,n_name,n_regionkey\n7,,(-skip-)\n-1,X,3\n"
        .replace("(-skip-)", "-1"))
    val sent = SourcesSinks.readCsv(spark, sentinelCsv, Tables.nationSchema)
      .orderBy("n_name")
    val rows = sent.collect()
    assert(rows.length == 2)
    assert(rows.exists(r => r.isNullAt(0) && r.getString(1) == "X"))
    assert(rows.exists(r => r.getInt(0) == 7 && r.isNullAt(1) && r.isNullAt(2)))
  }

  test("PERMISSIVE csv captures corrupt rows; clean rows parse normally") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("corrupt_csv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      "id,score\n1,2.5\nnot_a_number,oops\n3,4.0\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    val df = SourcesSinks.readCsvPermissive(spark, dir, schema).cache()
    try {
      val good = df.where(col("_corrupt_record").isNull)
      val bad = df.where(col("_corrupt_record").isNotNull)
      assert(good.count() == 2 && bad.count() == 1)
      // the quarantine row carries the raw line for replay/debugging
      assert(bad.select("_corrupt_record").head().getString(0)
        == "not_a_number,oops")
      assert(good.agg(sum("score")).head().getDouble(0) == 6.5)
    } finally df.unpersist()
  }

  test("JSONL round-trip with explicit schema") {
    val out = tmpDir("jsonl_rt")
    val region = Tables.region(spark, sfDir)
    SourcesSinks.writeJsonl(region, s"$out/region")
    val back = SourcesSinks.readJsonl(spark, s"$out/region",
      Tables.regionSchema)
    assert(back.exceptAll(region).count() == 0 &&
      region.exceptAll(back).count() == 0)
  }

  test("partitioned CSV sink writes one directory per key") {
    val out = tmpDir("csv_part")
    SourcesSinks.writeCsvPartitioned(
      Tables.customer(spark, sfDir), s"$out/cust", "c_mktsegment")
    val dirs = new java.io.File(s"$out/cust").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.length == 5 && dirs.forall(_.startsWith("c_mktsegment=")))
  }

  test("feature NDJSON sink -> readFeatureRows source round-trips values") {
    import org.apache.spark.sql.types._
    val out = tmpDir("geojson_src")
    val df = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_acctbal").as("x"),
        (col("s_nationkey") * 1.0).as("y"), col("s_name"))
    SourcesSinks.writeFeatureRows(
      SourcesSinks.toFeatureRows(df, "s_suppkey", "x", "y", Seq("s_name")),
      s"$out/feat")
    val back = SourcesSinks.readFeatureRows(spark, s"$out/feat", LongType,
      StructType(Seq(StructField("s_name", StringType))))
      .select(col("id").as("s_suppkey"), col("x"), col("y"), col("s_name"))
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("polygon feature NDJSON round-trips rings, holes, and properties") {
    import org.apache.spark.sql.types._
    val out = tmpDir("polygon_rt")
    val s = spark
    import s.implicits._
    // two features: a 2-ring polygon (square + hole) and a 1-ring triangle
    // — exact binary-fraction coords so JSON text is value-exact
    val df = Seq(
      (1L, "sq", Seq(
        Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(4.0, 4.0), Seq(0.0, 4.0),
          Seq(0.0, 0.0)),
        Seq(Seq(1.0, 1.0), Seq(2.0, 1.0), Seq(2.0, 2.0), Seq(1.0, 2.0),
          Seq(1.0, 1.0)))),
      (2L, "tri", Seq(
        Seq(Seq(0.5, 0.25), Seq(1.5, 0.25), Seq(1.0, 1.75), Seq(0.5, 0.25)))))
      .toDF("fid", "name", "rings")
    SourcesSinks.writeFeatureRows(
      SourcesSinks.toPolygonFeatureRows(df, "fid", "rings", Seq("name")),
      s"$out/feat")
    val back = SourcesSinks.parsePolygonFeatureRows(
      spark.read.text(s"$out/feat"), "value", LongType,
      StructType(Seq(StructField("name", StringType))))
      .select(col("id").as("fid"), col("name"), col("rings"))
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // the emitted JSON is a valid GeoJSON Polygon Feature
    val feat = SourcesSinks.toPolygonFeatureRows(df, "fid", "rings",
      Seq("name")).orderBy("feature").head().getString(0)
    assert(feat.contains("\"type\":\"Polygon\""))
    assert(feat.contains("\"coordinates\":[["))
  }

  test("shoelace: known shapes, winding sign, hole subtraction") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // unit square CCW -> +1
      ("sq_ccw", Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(1.0, 1.0),
        Seq(0.0, 1.0), Seq(0.0, 0.0))),
      // same square CW -> -1
      ("sq_cw", Seq(Seq(0.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 1.0),
        Seq(1.0, 0.0), Seq(0.0, 0.0))),
      // 3-4-5 right triangle CCW -> +6
      ("tri", Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(0.0, 3.0),
        Seq(0.0, 0.0))))
      .toDF("name", "ring")
      .withColumn("a", SourcesSinks.ringSignedArea("ring"))
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("sq_ccw" -> 1.0, "sq_cw" -> -1.0, "tri" -> 6.0))
  }

  test("t2 polygon area query: net area is exactly 3*w^2 per feature") {
    val rows = SourcesSinks.qGeoPolygonArea.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every per-feature area is 3w^2 for w in {0.25,0.5,0.75,1.0} -> min
      // and max must be members of that set, exactly (binary fractions)
      val allowed = Set(0.1875, 0.75, 1.6875, 3.0)
      assert(allowed.contains(r.getAs[Double]("min_area")), r.toString)
      assert(allowed.contains(r.getAs[Double]("max_area")), r.toString)
    }
  }

  test("multipolygon round-trips islands; t2 area query sums 5*w^2") {
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    // one feature: two disjoint unit squares -> total area 2
    val df = Seq((1L, "twin", Seq(
      Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(1.0, 1.0), Seq(0.0, 1.0),
        Seq(0.0, 0.0))),
      Seq(Seq(Seq(5.0, 0.0), Seq(6.0, 0.0), Seq(6.0, 1.0), Seq(5.0, 1.0),
        Seq(5.0, 0.0))))))
      .toDF("fid", "name", "polys")
    val feat = SourcesSinks.toMultiPolygonFeatureRows(df, "fid", "polys",
      Seq("name"))
    assert(feat.head().getString(0).contains("\"type\":\"MultiPolygon\""))
    val back = SourcesSinks.parseMultiPolygonFeatureRows(feat, "feature",
      LongType, StructType(Seq(StructField("name", StringType))))
      .select(col("id").as("fid"), col("name"), col("polys"))
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // t2 query: every per-feature area is 5w^2, w in {0.25,0.5,0.75,1.0}
    val allowed = Set(0.3125, 1.25, 2.8125, 5.0)
    SourcesSinks.qGeoMultipolygonArea.fn(spark, sfDir).collect().foreach { r =>
      assert(allowed.contains(r.getAs[Double]("min_area")), r.toString)
      assert(allowed.contains(r.getAs[Double]("max_area")), r.toString)
      assert(r.getAs[Long]("n_polys") == 2 * r.getAs[Long]("n_feat"))
    }
  }

  test("dynamic partition overwrite refreshes only the touched partitions") {
    val s = spark
    import s.implicits._
    val out = tmpDir("dyn_overwrite") + "/t"
    SourcesSinks.overwritePartitions(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "k"), out, "k")
    // rewrite ONLY partition k=b with new content
    SourcesSinks.overwritePartitions(
      Seq((20L, "b")).toDF("id", "k"), out, "k")
    val rows = spark.read.parquet(out).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // a and c survive; b is replaced, not appended
    assert(rows == Seq((1L, "a"), (3L, "c"), (20L, "b")).sortBy(_._1))
  }

  test("t2 polygon bbox query: hole rings counted, bbox from exterior") {
    val rows = SourcesSinks.qGeoPolygonBbox.fn(spark, sfDir).collect()
    assert(rows.length == Tables.region(spark, sfDir).count())
    rows.foreach { r =>
      // 10 positions per feature (5-pt exterior + 5-pt hole)
      assert(r.getAs[Long]("n_pt") == 10 * r.getAs[Long]("n_feat"))
      // exterior half-width 0.25 → bbox spans at least 0.5 on each axis
      assert(r.getAs[Double]("max_x") - r.getAs[Double]("min_x") >= 0.5)
      assert(r.getAs[Double]("max_y") - r.getAs[Double]("min_y") >= 0.5)
    }
  }

  test("t2 geo bbox query: one bbox row per region") {
    val rows = SourcesSinks.qGeoBboxRoundtrip.fn(spark, sfDir).collect()
    assert(rows.length == Tables.region(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("min_x") <= r.getAs[Double]("max_x"))
      assert(r.getAs[Double]("min_y") <= r.getAs[Double]("max_y"))
    }
  }

  test("schema evolution: superset schema reads old+new shards, nulls absent cols") {
    // the lake reality at 100 TB: shards written before a column existed
    // must stay readable after the schema grows — explicit superset schema
    // fills the missing column with nulls, no mergeSchema scan needed
    import org.apache.spark.sql.types._
    val dir = tmpDir("evolve")
    val s = spark
    import s.implicits._
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/old")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$dir/new")
    val superset = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("score", DoubleType)))
    val all = spark.read.schema(superset).parquet(s"$dir/old", s"$dir/new")
    val rows = all.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(2), "old shard must read with null score")
    assert(rows(1).getDouble(2) == 9.5)
  }

  test("ORC round trip is row-identical, schema included") {
    val out = tmpDir("orc") + "/orders"
    val slim = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    SourcesSinks.writeOrc(slim, out)
    val back = SourcesSinks.readOrc(spark, out, slim.schema)
    assert(back.schema == slim.schema)
    assert(back.exceptAll(slim).count() == 0)
    assert(slim.exceptAll(back).count() == 0)
  }

  test("GeoJSON-ish NDJSON rows are valid Feature objects") {
    val out = tmpDir("geojson")
    val df = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_acctbal").as("x"),
        (col("s_nationkey") * 1.0).as("y"), col("s_name"))
    val feats = SourcesSinks.toFeatureRows(df, "s_suppkey", "x", "y",
      Seq("s_name"))
    SourcesSinks.writeFeatureRows(feats, s"$out/feat")
    val lines = spark.read.textFile(s"$out/feat")
    assert(lines.count() == df.count())
    val parsed = spark.read.json(lines)
    assert(parsed.columns.sorted.toSeq ==
      Seq("geometry", "id", "properties", "type"))
    assert(parsed.where(col("type") === "Feature").count() == df.count())
    assert(parsed.select(col("geometry.type")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("Point"))
  }
}
