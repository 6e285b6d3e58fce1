package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline tests mirroring the reference's integration suite
  * (tests/basic_integration.rs): an arbitrary SQL query — with projection,
  * arithmetic, cast and alias like :28/:130/:150/:169 — loaded into a
  * Delta/Iceberg table and read back.
  */
class EngineSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def tmp(): String = Files.createTempDirectory("graft-engine").toString

  test("sql: projection + arithmetic + cast + alias + order by (the -q contract)") {
    // mirrors basic_integration.rs:130 (`cint8 + 1 cint8`) and :150
    // (`cint8::text cint8_casted`) over the corpus schema
    val df = Engine.sql(spark, dir,
      """SELECT o_orderkey + 1 AS okey_next,
        |       CAST(o_orderkey AS STRING) AS okey_str,
        |       o_totalprice
        |FROM orders ORDER BY o_orderkey LIMIT 10""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows(0).getLong(0) == rows(0).getString(1).toLong + 1)
  }

  test("sql-to-delta: query result lands as a two-commit Delta table and reads back") {
    val table = tmp()
    assert(Engine.sqlToDelta(spark, dir,
      "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45", table))
    val back = sinks.DeltaSink.read(spark, table)
    val direct = Engine.sql(spark, dir,
      "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45")
    assert(back.count() == direct.count() && back.count() > 0)
    // refuse without overwrite, like the reference
    assert(!Engine.sqlToDelta(spark, dir, "SELECT 1 AS one", table))
    assert(Engine.sqlToDelta(spark, dir, "SELECT 1 AS one", table, overwrite = true))
    assert(sinks.DeltaSink.read(spark, table).count() == 1)
  }

  test("parquet-to-iceberg: create then append doubles the row count") {
    val table = tmp()
    val src = s"$dir/region.parquet"
    Engine.parquetToIceberg(spark, src, table)
    assert(Files.exists(Paths.get(table, "metadata", "version-hint.text")))
    val n = sinks.IcebergSink.read(spark, table).count()
    assert(n == spark.read.parquet(src).count())
    Engine.parquetToIceberg(spark, src, table, append = true)
    assert(sinks.IcebergSink.read(spark, table).count() == 2 * n)
  }

  test("sql-to-iceberg with partition-by lands a partitioned table that reads back") {
    val table = tmp()
    Engine.sqlToIceberg(spark, dir,
      "SELECT n_nationkey, n_name, n_regionkey FROM nation", table,
      partitionBy = Seq("n_regionkey"))
    val back = sinks.IcebergSink.read(spark, table)
    assert(back.count() == 25)
    assert(back.columns.contains("n_regionkey"))
    assert(back.groupBy("n_regionkey").count().count() == 5)
  }

  test("sql-to-iceberg: overwrite replaces visible data") {
    val table = tmp()
    Engine.sqlToIceberg(spark, dir, "SELECT n_nationkey, n_name FROM nation", table)
    Engine.sqlToIceberg(spark, dir,
      "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5", table,
      overwrite = true)
    assert(sinks.IcebergSink.read(spark, table).count() == 5)
  }

  test("graft_dot is callable from the SQL surface") {
    val df = Engine.sql(spark, dir,
      """SELECT vec_id, CAST(graft_dot(embedding, embedding) AS DECIMAL(18,4)) AS nrm2
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getDecimal(1).doubleValue > 0.0))
  }

  test("csv and json files load into Delta tables with inferred schemas") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-src").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name,v\n1,a,1.5\n2,b,2.5\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"id":3,"name":"c","v":3.5}""" + "\n" + """{"id":4,"name":"d","v":4.5}""" + "\n")
    val csvTable = java.nio.file.Files.createTempDirectory("graft-csv-delta").toString
    val jsonTable = java.nio.file.Files.createTempDirectory("graft-json-delta").toString
    assert(Engine.csvToDelta(spark, s"$dir/in.csv", csvTable, overwrite = true))
    assert(Engine.jsonToDelta(spark, s"$dir/in.json", jsonTable, overwrite = true))
    val csvBack = graft.sinks.DeltaSink.read(spark, csvTable)
    assert(csvBack.schema("id").dataType.typeName == "integer") // inferred
    assert(csvBack.count() == 2)
    assert(graft.sinks.DeltaSink.read(spark, jsonTable).count() == 2)

    // the same paths through the CLI verbs
    val cliCsvTable = java.nio.file.Files.createTempDirectory("graft-csv-cli").toString
    Cli.main(Array("csv-to-delta", s"$dir/in.csv", cliCsvTable, "--overwrite"))
    assert(graft.sinks.DeltaSink.read(spark, cliCsvTable).count() == 2)
  }

  test("export-jsonl: query results land as JSON-lines shards (r8)") {
    val spark = TestSpark.spark
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val n = Engine.exportJsonl(spark, "/root/testdata/sf0.001",
      "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 20", out)
    assert(n == 20)
    val back = spark.read.json(out)
    assert(back.count() == 20)
    assert(back.columns.sorted.toSeq == Seq("doc_id", "lang", "n_chars"))
    // shards are plain .json part files a non-Spark loader can stream
    val parts = new java.io.File(out).listFiles().filter(_.getName.endsWith(".json"))
    assert(parts.nonEmpty)
  }

  test("sql-append-to-delta adds a version on top of an existing table") {
    val spark = TestSpark.spark
    val table = java.nio.file.Files.createTempDirectory("graft-app-delta").toString
    val dir = "/root/testdata/sf0.001"
    assert(Engine.sqlToDelta(spark, dir, "SELECT r_regionkey, r_name FROM region", table))
    val v = Engine.sqlAppendToDelta(spark, dir,
      "SELECT n_nationkey AS r_regionkey, n_name AS r_name FROM nation", table)
    assert(v == 2L)
    assert(graft.sinks.DeltaSink.read(spark, table).count() == 30) // 5 + 25
  }

  test("pg-to-delta: the live verb streams COPY BINARY over TCP into a Delta table (r8)") {
    val s = spark
    import s.implicits._
    // tiny 2-column stream: (id int8, name text), 3 rows
    def be64(v: Long) = java.nio.ByteBuffer.allocate(8).putLong(v).array()
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.write(graft.sources.CopyBinary.Signature)
    dos.writeInt(0); dos.writeInt(0)
    Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma").foreach { case (id, name) =>
      dos.writeShort(2)
      dos.writeInt(8); dos.write(be64(id))
      val nb = name.getBytes("UTF-8"); dos.writeInt(nb.length); dos.write(nb)
    }
    dos.writeShort(-1); dos.flush()
    val wrapped = "COPY (SELECT id, name FROM src) TO STDOUT (FORMAT BINARY)"
    val server = new FakePgServer("loader", "appdb", None,
      sql => if (sql == wrapped) Some(bos.toByteArray) else None)
    try {
      val table = tmp()
      Cli.main(Array("pg-to-delta", s"127.0.0.1:${server.port}", "appdb", "loader",
        "id:int8,name:text", "SELECT id, name FROM src", table, "--overwrite"))
      val back = sinks.DeltaSink.read(spark, table)
      assert(back.as[(Long, String)].collect().toSet ==
        Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    } finally server.close()
  }

  test("pg-to-iceberg: the live verb lands the COPY stream as an Iceberg V2 table, append doubles (r8)") {
    val s = spark
    import s.implicits._
    def be64(v: Long) = java.nio.ByteBuffer.allocate(8).putLong(v).array()
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.write(graft.sources.CopyBinary.Signature)
    dos.writeInt(0); dos.writeInt(0)
    Seq(10L, 20L).foreach { id =>
      dos.writeShort(1); dos.writeInt(8); dos.write(be64(id))
    }
    dos.writeShort(-1); dos.flush()
    val wrapped = "COPY (SELECT id FROM src) TO STDOUT (FORMAT BINARY)"
    val server = new FakePgServer("loader", "appdb", None,
      sql => if (sql == wrapped) Some(bos.toByteArray) else None)
    try {
      val table = tmp()
      val cliArgs = Array("pg-to-iceberg", s"127.0.0.1:${server.port}", "appdb",
        "loader", "id:int8", "SELECT id FROM src", table)
      Cli.main(cliArgs)
      assert(Files.exists(Paths.get(table, "metadata", "version-hint.text")))
      assert(sinks.IcebergSink.read(spark, table).as[Long].collect().toSet == Set(10L, 20L))
      Cli.main(cliArgs :+ "--append")
      assert(sinks.IcebergSink.read(spark, table).count() == 4)
    } finally server.close()
  }

  test("r14 CLI verbs drive maintenance, history and partition evolution end-to-end") {
    val s = TestSpark.spark
    import s.implicits._
    val dt = java.nio.file.Files.createTempDirectory("graft-cli-r14d").toString
    graft.sinks.DeltaSink.write((1L to 40L).map(i => (i, i.toDouble)).toDF("id", "v"), dt)
    graft.sinks.DeltaSink.append((41L to 50L).map(i => (i, i.toDouble)).toDF("id", "v"), dt)
    graft.sinks.DeltaSink.deleteWhereDV(s, dt, "id <= 25") // 50% masked
    Cli.main(Array("maintain-delta", dt, "1", "0.1")) // purge + compact + vacuum
    assert(graft.sinks.DeltaSink.reorgPurge(s, dt) == ((0, 0L))) // DV-free
    assert(graft.sinks.DeltaSink.read(s, dt).count() == 25)
    Cli.main(Array("history-delta", dt)) // prints; must not throw
    val it = java.nio.file.Files.createTempDirectory("graft-cli-r14i").toString + "/tbl"
    graft.sinks.IcebergSink.write(
      Seq((1L, "a", java.sql.Timestamp.valueOf("2024-03-01 09:00:00")))
        .toDF("id", "g", "ts"), it, graft.sinks.IcebergSink.CreateExclusive,
      partitionBy = Seq("g"))
    Cli.main(Array("evolve-partition-iceberg", it, "--partition-by", "day(ts)"))
    graft.sinks.IcebergSink.write(
      Seq((2L, "b", java.sql.Timestamp.valueOf("2024-03-02 09:00:00")))
        .toDF("id", "g", "ts"), it, graft.sinks.IcebergSink.Append)
    Cli.main(Array("maintain-iceberg", it, "1", "1"))
    assert(graft.sinks.IcebergSink.metaTable(s, it, "manifests")
      .filter(org.apache.spark.sql.functions.col("content") === 0).count() >= 1)
    assert(graft.sinks.IcebergSink.read(s, it).count() == 2)
  }

  test("r16 CLI verbs: enable-row-lineage-iceberg and write-stats-iceberg end-to-end") {
    val s = TestSpark.spark
    import s.implicits._
    val it = java.nio.file.Files.createTempDirectory("graft-cli-r16i").toString + "/tbl"
    graft.sinks.IcebergSink.write((1L to 30L).map(i => (i, s"g${i % 3}"))
      .toDF("id", "g"), it, graft.sinks.IcebergSink.CreateExclusive)
    Cli.main(Array("enable-row-lineage-iceberg", it))
    assert(graft.sinks.IcebergSink.readWithLineage(s, it)
      .select("_row_id").distinct().count() == 30)
    Cli.main(Array("write-stats-iceberg", it, "id,g"))
    assert(graft.sinks.IcebergStats.ndv(it, "id").contains(30L))
    assert(graft.sinks.IcebergStats.ndv(it, "g").contains(3L))
  }

  test("r17 CLI verbs: write-stats-delta, cluster-by-delta, write-partition-stats-iceberg") {
    val s = TestSpark.spark
    import s.implicits._
    val dt = java.nio.file.Files.createTempDirectory("graft-cli-r17d").toString
    graft.sinks.DeltaSink.write((1L to 40L).map(i => (i, i % 4))
      .toDF("id", "bucket"), dt)
    Cli.main(Array("write-stats-delta", dt, "bucket"))
    assert(graft.sinks.DeltaSink.statsNdv(s, dt, "bucket").contains(4L))
    Cli.main(Array("cluster-by-delta", dt, "bucket,id"))
    assert(graft.sinks.DeltaSink.clusteringColumns(s, dt) == Seq("bucket", "id"))
    val it = java.nio.file.Files.createTempDirectory("graft-cli-r17i").toString + "/tbl"
    graft.sinks.IcebergSink.write((1L to 30L).map(i => (i, s"g${i % 3}"))
      .toDF("id", "g"), it, graft.sinks.IcebergSink.CreateExclusive,
      partitionBy = Seq("g"))
    Cli.main(Array("write-partition-stats-iceberg", it))
    assert(graft.sinks.IcebergStats.partitionStats(s, it).get.count() == 3)
  }

  test("both flags set rejects like the reference flag matrix") {
    intercept[IllegalArgumentException] {
      Engine.sqlToIceberg(spark, dir, "SELECT 1 AS one", tmp(),
        overwrite = true, append = true)
    }
  }

  test("GraftExtensions injects SQL functions at session build, not via temp registration") {
    // newSession() shares the extensions applied at build time but NOT temp
    // functions registered on the parent — so resolving graft functions here
    // proves the spark.sql.extensions path works on its own.
    val fresh = spark.newSession()
    val out = fresh.sql(
      "SELECT graft_simhash(graft_token_hashes(array('a','b','a'))) AS sig, " +
        "graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot").head()
    assert(!out.isNullAt(0))
    assert(out.getDouble(1) == 11.0)
  }
}
